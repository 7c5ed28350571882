"""W1 repeat-visit semantics (LogEntrySolrItem.java:444-474).

The anchor only advances on NON-repeat rows; bounds are strict:
repeat ⇔ anchor < t < anchor + (interval+1 s).  t == anchor re-anchors
(flag false).  Only events in events_to_check touch the state at all.
"""

from __future__ import annotations

import datetime as dt

import numpy as np

from d1_log_aggregation_spark.operators.repeat_visit import (
    anchor_scan,
    flag_repeat_visits,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _mk(spark, rows):
    # rows: (event_id, event, ip, pid, offset_seconds)
    data = [
        (eid, ev, ip, pid, "c1", i, T0 + dt.timedelta(seconds=off))
        for i, (eid, ev, ip, pid, off) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id string, event string, ip string, pid string, "
        "conv_id string, turn_idx int, ts timestamp",
    )


def test_anchor_scan_reference_vectors():
    # interval 30 s → +1 s exclusive end = 31 s
    us = 31 * 1_000_000
    offs = [0, 5, 15, 29, 31, 35, 61, 62, 62]
    ts = np.array([o * 1_000_000 for o in offs], dtype=np.int64)
    got = anchor_scan(ts, us).tolist()
    # 0: anchor=0 false | 5,15,29: repeat | 31: 31<31 false → re-anchor
    # 35: 31<35<62 repeat | 61: repeat | 62: 62<62 false → re-anchor
    # 62 again: t == anchor → NOT after → re-anchor, false
    assert got == [False, True, True, True, False, True, True, False, False]


def test_scan_vectorized_matches_scalar_property():
    """The anchor-jump vectorized scan must equal the per-row reference
    scan on randomized multi-key inputs, across arbitrary Arrow-batch
    split points (state carried between batches)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from d1_log_aggregation_spark.operators.repeat_visit import (
        scan_flags_scalar,
        scan_flags_vectorized,
    )

    interval_us = 31 * 1_000_000

    @st.composite
    def batch_case(draw):
        n_keys = draw(st.integers(1, 4))
        rn_l, chk_l, ts_l = [], [], []
        for _ in range(n_keys):
            n = draw(st.integers(0, 25))
            t = 0
            for i in range(n):
                # gap mix: ties, sub-interval, exactly-interval, big
                t += draw(
                    st.sampled_from(
                        [0, 1, 5_000_000, 30_000_000, 31_000_000, 90_000_000]
                    )
                )
                rn_l.append(1 if i == 0 else i + 1)
                chk_l.append(draw(st.booleans()))
                ts_l.append(t)
        cuts = draw(
            st.lists(st.integers(0, max(len(rn_l), 1)), max_size=3)
        )
        return rn_l, chk_l, ts_l, sorted(cuts)

    @given(batch_case())
    @settings(max_examples=300, deadline=None)
    def run(case):
        rn_l, chk_l, ts_l, cuts = case
        rn = np.array(rn_l, dtype=np.int64)
        chk = np.array(chk_l, dtype=bool)
        ts = np.array(ts_l, dtype=np.int64)
        splits = [0, *[c for c in cuts if c <= len(rn)], len(rn)]
        st_s = st_v = (0, False, 0)
        for a, b in zip(splits, splits[1:]):
            f_s, st_s = scan_flags_scalar(
                rn[a:b], chk[a:b], ts[a:b], interval_us, st_s
            )
            f_v, st_v = scan_flags_vectorized(
                rn[a:b], chk[a:b], ts[a:b], interval_us, st_v
            )
            assert f_s.tolist() == f_v.tolist(), (
                rn_l, chk_l, ts_l, splits, f_s.tolist(), f_v.tolist()
            )
            # states must agree behaviorally (anchor only matters when set)
            if st_s[1] or st_v[1]:
                assert st_s == st_v

    run()


def test_flag_repeat_visits_df(spark):
    rows = [
        ("e0", "read", "1.1.1.1", "d1", 0),
        ("e1", "read", "1.1.1.1", "d1", 5),
        ("e2", "read", "1.1.1.1", "d1", 29),
        ("e3", "read", "1.1.1.1", "d1", 31),   # re-anchor
        ("e4", "read", "1.1.1.1", "d1", 35),   # repeat vs 31
        ("e5", "create", "1.1.1.1", "d1", 36), # not checked → false, no state
        ("e6", "read", "1.1.1.1", "d2", 3),    # other pid → own anchor
        ("e7", "read", "2.2.2.2", "d1", 4),    # other ip → own anchor
    ]
    out = flag_repeat_visits(_mk(spark, rows), interval_seconds=30)
    got = {r["event_id"]: r["is_repeat_visit"] for r in out.collect()}
    assert got == {
        "e0": False, "e1": True, "e2": True, "e3": False, "e4": True,
        "e5": False, "e6": False, "e7": False,
    }


def test_narrow_scan_equals_wide_scan(spark):
    """The narrow_scan (skew) configuration must be payload-identical to
    the pass-through scan — same flags, same rows — on (a) the crafted
    semantics vectors and (b) a hot-key burst where one (ip, pid) holds
    most rows with sub-interval gaps (the skew shape narrow_scan
    exists for)."""
    rows = [
        ("e0", "read", "1.1.1.1", "d1", 0),
        ("e1", "read", "1.1.1.1", "d1", 5),
        ("e2", "read", "1.1.1.1", "d1", 29),
        ("e3", "read", "1.1.1.1", "d1", 31),
        ("e4", "read", "1.1.1.1", "d1", 35),
        ("e5", "create", "1.1.1.1", "d1", 36),
        ("e6", "read", "1.1.1.1", "d2", 3),
        ("e7", "read", "2.2.2.2", "d1", 4),
    ] + [
        # hot key: 200 reads 7 s apart → anchor advances every 5th row
        (f"h{i}", "read", "9.9.9.9", "hot", 1000 + 7 * i)
        for i in range(200)
    ]
    df = _mk(spark, rows)
    wide = {
        r["event_id"]: r["is_repeat_visit"]
        for r in flag_repeat_visits(df, interval_seconds=30).collect()
    }
    narrow = {
        r["event_id"]: r["is_repeat_visit"]
        for r in flag_repeat_visits(
            df, interval_seconds=30, narrow_scan=True
        ).collect()
    }
    assert narrow == wide
    # spot-check the anchor-advance pattern on the hot burst: with 7 s
    # spacing and a 31 s window, every 5th row re-anchors
    assert narrow["h0"] is False and narrow["h5"] is False
    assert all(narrow[f"h{i}"] for i in (1, 2, 3, 4, 6, 7, 8, 9))


def test_non_checked_events_do_not_touch_state(spark):
    # a create between two reads must not re-anchor or count
    rows = [
        ("e0", "read", "1.1.1.1", "d1", 0),
        ("e1", "create", "1.1.1.1", "d1", 10),
        ("e2", "read", "1.1.1.1", "d1", 20),  # repeat vs anchor 0
    ]
    out = flag_repeat_visits(_mk(spark, rows), interval_seconds=30)
    got = {r["event_id"]: r["is_repeat_visit"] for r in out.collect()}
    assert got == {"e0": False, "e1": False, "e2": True}


def test_narrow_scan_null_event_id_raises_not_drops(spark):
    """ADVICE r6: the old inner join-back silently DROPPED null-event_id
    rows from the narrow configuration while the wide path kept them.
    Now the narrow path keeps every row (left join) and the flag guard
    raises the documented precondition error instead of silently
    diverging from the wide scan."""
    import pytest

    rows = [
        ("e0", "read", "1.1.1.1", "d1", 0),
        (None, "read", "1.1.1.1", "d1", 5),
    ]
    df = _mk(spark, rows)
    # wide path: keyless rows are fine (the scan never touches event_id)
    wide = flag_repeat_visits(df, interval_seconds=30)
    assert wide.count() == 2
    narrow = flag_repeat_visits(df, interval_seconds=30, narrow_scan=True)
    with pytest.raises(Exception) as ei:
        narrow.collect()
    assert "non-null unique event_id" in str(ei.value)


def test_choose_narrow_scan_selector(spark):
    """VERDICT r6 item 5: the scan-shape selector picks narrow on a
    hot-key fixture (one (ip,pid) holding ~35% of rows) and wide on
    uniform traffic — and respects the small-sample floor."""
    from d1_log_aggregation_spark.operators.repeat_visit import (
        choose_narrow_scan,
    )

    def mk(rows):
        return spark.createDataFrame(
            [
                (f"c{i}", i, ip, pid)
                for i, (ip, pid) in enumerate(rows)
            ],
            "conv_id string, turn_idx int, ip string, pid string",
        )

    uniform = mk([(f"10.0.{i//250}.{i%250}", f"d{i}") for i in range(2000)])
    hot = mk(
        [("9.9.9.9", "hot")] * 700
        + [(f"10.0.{i//250}.{i%250}", f"d{i}") for i in range(1300)]
    )
    # sample_mod=1 → the "sample" is the whole fixture (deterministic)
    assert choose_narrow_scan(uniform, sample_mod=1,
                              min_sample_rows=100) is False
    assert choose_narrow_scan(hot, sample_mod=1,
                              min_sample_rows=100) is True
    # below the sample floor the estimate is noise → wide default
    assert choose_narrow_scan(hot, sample_mod=1,
                              min_sample_rows=10_000) is False
