"""Local reproduction of the driver's correctness gate: run each
queries()[name] in Spark and the matching oracle_sql()[name] in DuckDB over
the same sf dir, compare row count, schema shape, and order-insensitive
values."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # duckdb 1.0.0's parallel task scheduler nondeterministically spins
    # forever on this box (observed repeatedly on the enrich_geo_range
    # range-join/IEJoin oracle: N worker threads at 100% CPU, no
    # progress, in otherwise-healthy fresh processes).  Single-threading
    # removes the scheduler from the picture entirely and costs nothing
    # at oracle scale factors (sf ≤ 0.01).
    con.execute("SET threads TO 1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(name: str, spark_df, duck_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    s = normalize(spark_df.toPandas())
    d = normalize(duck_df)
    if len(s) != len(d):
        problems.append(f"{name}: row count spark={len(s)} duck={len(d)}")
    if list(s.columns) != list(d.columns):
        problems.append(
            f"{name}: columns spark={list(s.columns)} duck={list(d.columns)}"
        )
    if not problems:
        for c in s.columns:
            sc, dc = s[c], d[c]
            if pd.api.types.is_float_dtype(sc):
                ok = np.allclose(
                    sc.fillna(-9e99), dc.fillna(-9e99), rtol=0, atol=1e-6
                )
            else:
                ok = sc.fillna("\0N").equals(dc.fillna("\0N")) if (
                    sc.dtype == object
                ) else sc.equals(dc)
            if not ok:
                mism = (
                    sc.fillna("\0N") != dc.fillna("\0N")
                    if sc.dtype == object
                    else sc != dc
                )
                idx = list(np.where(mism)[0][:3])
                problems.append(
                    f"{name}: column {c} mismatch at rows {idx}; "
                    f"spark={sc.iloc[idx].tolist()} duck={dc.iloc[idx].tolist()}"
                )
    return problems


def run_gate(sf_dir: str, spark, only: list[str] | None = None) -> dict:
    import sys
    import time

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    con = duck_connection(sf_dir)
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # progress heartbeat so a hung query is identifiable even when
        # pytest captures stderr (flushed BEFORE the query runs); the
        # side-channel file survives a killed run
        import os

        hb = os.environ.get("GATE_HEARTBEAT_FILE")
        line = f"[gate {time.strftime('%H:%M:%S')}] {name}"
        print(line, file=sys.stderr, flush=True)
        if hb:
            with open(hb, "a") as f:
                f.write(line + "\n")
        if name not in osql:
            # rows-only: no value oracle, but the Spark query must still
            # EXECUTE (a crash here must fail the gate, not pass it)
            try:
                out = fn(spark, sf_dir)
                n = out.count()
                _ = out.schema
            except Exception as exc:  # noqa: BLE001
                results[name] = [f"spark error: {exc}"]
                continue
            results[name] = [f"(rows-only: {n} rows)"]
            continue
        try:
            duck_df = con.execute(osql[name]).df()
        except Exception as exc:  # noqa: BLE001
            results[name] = [f"oracle error: {exc}"]
            continue
        try:
            problems = compare(name, fn(spark, sf_dir), duck_df)
        except Exception as exc:  # noqa: BLE001
            problems = [f"spark error: {exc}"]
        results[name] = problems or ["OK"]
    con.close()
    return results
