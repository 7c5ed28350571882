"""Ingest sources (sources.py): schema-enforced JSONL/CSV readers with
corrupt-record DLQ routing.  The oracle gate covers the JSONL good-side
round trip; these tests pin the routing semantics on hand-built files."""

from __future__ import annotations

import datetime as dt

from d1_log_aggregation_spark import sources


def test_jsonl_corrupt_and_missing_identity_route_to_dlq(spark, tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    good = (
        '{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi",'
        '"tool":null,"ts":"2024-01-01T12:00:00.000000"}'
    )
    no_ts = '{"conv_id":"c2","turn_idx":1,"role":"user","text":"x"}'
    not_json = '{"conv_id": BROKEN'
    bad_type = (
        '{"conv_id":"c3","turn_idx":"NaN","role":"user","text":"y",'
        '"ts":"2024-01-01T12:00:00.000000"}'
    )
    (p / "a.jsonl").write_text(
        "\n".join([good, no_ts, not_json, bad_type]) + "\n"
    )
    gooddf, dlq = sources.read_transcripts_jsonl(spark, str(p))
    grows = gooddf.collect()
    assert len(grows) == 1
    r = grows[0]
    assert (r["conv_id"], r["turn_idx"], r["tool"]) == ("c1", 0, None)
    assert r["ts"] == dt.datetime(2024, 1, 1, 12, 0, 0)
    drows = dlq.collect()
    assert len(drows) == 3
    # the unparsable line carries its raw text; structurally-valid rows
    # missing identity fields are captured as their JSON re-encoding
    raw = {d["raw_record"]: d["schema_corrupt"] for d in drows}
    assert raw[not_json] is True
    assert sum(1 for v in raw.values() if not v) >= 1


def test_csv_round_trip_and_dlq(spark, tmp_path):
    p = tmp_path / "in"
    p.mkdir()
    (p / "a.csv").write_text(
        "conv_id,turn_idx,role,text,tool,ts\n"
        'c1,0,user,"multi\nline, with comma",search,'
        "2024-01-01T12:00:00.000000\n"
        "c2,zz,user,badidx,,2024-01-01T12:00:00.000000\n"
        ",3,user,noconv,,2024-01-01T12:00:00.000000\n"
    )
    good, dlq = sources.read_transcripts_csv(spark, str(p))
    grows = good.collect()
    assert len(grows) == 1
    assert grows[0]["text"] == "multi\nline, with comma"
    assert grows[0]["tool"] == "search"
    assert dlq.count() == 2


def test_xml_corrupt_and_missing_identity_route_to_dlq(spark, tmp_path):
    """The reference's native interchange is XML <logEntry> documents
    (logEntry-valid.xml; v1/NodeCommunication.java:146-149): same DLQ
    contract as JSONL — unparsable/ill-typed elements carry the raw
    element, identity-less rows route by the blank-docid analog."""
    p = tmp_path / "in"
    p.mkdir()
    (p / "a.xml").write_text(
        "<log>\n"
        "<logEntry><conv_id>c1</conv_id><turn_idx>0</turn_idx>"
        "<role>user</role><text>hi</text>"
        "<ts>2024-01-01T12:00:00.000000</ts></logEntry>\n"
        # type violation: turn_idx not an int
        "<logEntry><conv_id>c2</conv_id><turn_idx>NaN</turn_idx>"
        "<role>user</role><text>y</text>"
        "<ts>2024-01-01T12:00:00.000000</ts></logEntry>\n"
        # structurally valid, missing identity (no ts)
        "<logEntry><conv_id>c3</conv_id><turn_idx>1</turn_idx>"
        "<role>user</role><text>x</text></logEntry>\n"
        "</log>\n"
    )
    from d1_log_aggregation_spark import sources as s

    good, dlq = s.read_transcripts_xml(spark, str(p))
    grows = good.collect()
    assert len(grows) == 1
    r = grows[0]
    assert (r["conv_id"], r["turn_idx"], r["tool"]) == ("c1", 0, None)
    assert r["ts"] == dt.datetime(2024, 1, 1, 12, 0, 0)
    drows = dlq.collect()
    assert len(drows) == 2
    assert sum(1 for d in drows if d["schema_corrupt"]) >= 1


def test_xml_round_trip_preserves_transcripts(spark, tmp_path):
    """Full-table XML round trip at sf0.001 (the gate does sf0.01):
    good side reproduces every row byte-for-byte, DLQ side is empty."""
    from d1_log_aggregation_spark.transcripts import load_transcripts

    src = load_transcripts(spark, "/root/testdata/sf0.001")
    out = str(tmp_path / "xm")
    sources.write_transcripts_xml(src, out)
    good, dlq = sources.read_transcripts_xml(spark, out)
    assert dlq.count() == 0
    key = lambda r: tuple(r)  # noqa: E731
    a = sorted(map(key, src.collect()))
    b = sorted(
        map(
            key,
            good.select(
                "conv_id", "turn_idx", "role", "text", "tool", "ts"
            ).collect(),
        )
    )
    assert a == b


def test_xml_round_trip_preserves_surrounding_whitespace(spark, tmp_path):
    """ADVICE r6: Spark 4's XML source defaults
    ignoreSurroundingSpaces=true, silently trimming padded values (and
    nulling whitespace-only text) — invisible to the generated corpus,
    which has no padded values.  Pin the byte-equal contract on rows the
    generator never produces: leading/trailing spaces, whitespace-only
    text, and tab/newline padding."""
    rows = [
        ("c1", 0, "user", "  leading and trailing  ", " padded_tool ",
         dt.datetime(2024, 1, 1, 12, 0, 0, 123456)),
        ("c1", 1, "assistant", "   ", None,
         dt.datetime(2024, 1, 1, 12, 0, 1, 1)),
        ("c1", 2, "user", "\tტაბ and newline\n", None,
         dt.datetime(2024, 1, 1, 12, 0, 2, 0)),
    ]
    src = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp"
    )
    out = str(tmp_path / "xmws")
    sources.write_transcripts_xml(src, out)
    good, dlq = sources.read_transcripts_xml(spark, out)
    assert dlq.count() == 0
    got = sorted(
        tuple(r)
        for r in good.select(
            "conv_id", "turn_idx", "role", "text", "tool", "ts"
        ).collect()
    )
    assert got == sorted(rows)


def test_jsonl_round_trip_preserves_transcripts(spark, tmp_path):
    """Full-table round trip at sf0.001 (the gate does sf0.01): good
    side reproduces every row, DLQ side is empty."""
    from d1_log_aggregation_spark.transcripts import load_transcripts

    src = load_transcripts(spark, "/root/testdata/sf0.001")
    out = str(tmp_path / "jl")
    sources.write_transcripts_jsonl(src, out)
    good, dlq = sources.read_transcripts_jsonl(spark, out)
    assert dlq.count() == 0
    key = lambda r: tuple(r)  # noqa: E731
    a = sorted(map(key, src.collect()))
    b = sorted(
        map(
            key,
            good.select(
                "conv_id", "turn_idx", "role", "text", "tool", "ts"
            ).collect(),
        )
    )
    assert a == b
