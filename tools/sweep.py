#!/usr/bin/env python
"""Full-registry correctness sweep → committed artifact.

The external driver's gate only checks the first 50 registry entries per
round; this tool runs EVERY queries() entry against its oracle_sql() twin
at the driver's scale factor (sf0.01) and writes a JSON artifact in the
driver's CORRECTNESS schema, so out-of-window coverage is a verifiable
file, not a prose claim (VERDICT r4 item 7).

Usage:  python tools/sweep.py [SF_DIR] [OUT.json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "SWEEP.json"


def main() -> None:
    import __spark_entry__ as entrymod
    from d1_log_aggregation_spark.session import get_spark
    from tests.oracle_harness import compare, duck_connection, normalize

    spark = get_spark(
        app_name="sweep", master="local[32]", shuffle_partitions=32
    )
    con = duck_connection(SF_DIR)
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    results: dict[str, dict] = {}
    for name, fn in qs.items():
        print(f"# start {name}", file=sys.stderr, flush=True)
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            sdf = fn(spark, SF_DIR)
            spd = normalize(sdf.toPandas())
            rec["spark_rows"] = len(spd)
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"spark: {exc}"[:300]
            results[name] = rec
            print(json.dumps({name: rec}), flush=True)
            continue
        if name not in osql:
            rec["err"] = "no_oracle"
            results[name] = rec
            print(json.dumps({name: rec}), flush=True)
            continue
        try:
            dpd = normalize(con.execute(osql[name]).df())
            rec["oracle_rows"] = len(dpd)
        except Exception as exc:  # noqa: BLE001
            rec["err"] = f"oracle: {exc}"[:300]
            results[name] = rec
            print(json.dumps({name: rec}), flush=True)
            continue
        rec["rows_match"] = len(spd) == len(dpd)
        rec["schema_match"] = list(spd.columns) == list(dpd.columns)
        # value equality via the same normalize+compare the pytest gate
        # uses (order-insensitive, float atol 1e-6) — the driver's
        # "hash_match" analog

        class _W:
            def __init__(self, df):
                self._df = df

            def toPandas(self):
                return self._df

        problems = compare(name, _W(spd.copy()), dpd.copy())
        rec["hash_match"] = not problems
        if problems:
            rec["err"] = "; ".join(problems)[:300]
        results[name] = rec
        print(json.dumps({name: rec}), flush=True)
    spark.stop()
    # value-verified green vs executed-but-oracle-less (ADVICE r5: do
    # not fold rows-only entries into the headline green count)
    n_ok = sum(1 for r in results.values() if r["hash_match"])
    n_rows_only = sum(
        1
        for r in results.values()
        if not r["hash_match"]
        and r["err"] == "no_oracle"
        and r["spark_rows"] is not None
    )
    payload = {
        "sf_dir": SF_DIR,
        "n_queries": len(results),
        "n_green": n_ok,
        "n_rows_only": n_rows_only,
        "queries": results,
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(
        f"wrote {OUT}: {n_ok}/{len(results)} green"
        + (f" + {n_rows_only} rows-only" if n_rows_only else "")
    )


if __name__ == "__main__":
    main()
