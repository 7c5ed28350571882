"""Per-sink table writer with idempotent snapshot-commit semantics.

Reference sink: Solr ``addBeans`` in 500-doc batches under a global commit
lock, retried ≤5 times, idempotent because the doc key overwrites
(SolrClientManager.java:41-58, LogHarvesterTask.java:442-489).

Spark-first replacement: ONE write job for all sinks —
``partitionBy("sink")`` — landing each run's delta in an isolated
``run=<run_id>`` directory, then an atomic pointer-file commit.  This is
the parquet stand-in for an Iceberg snapshot commit (the Iceberg runtime
jar is not available in this sandbox; on a real cluster the same call
sites become ``df.writeTo(tbl).append()`` and the commit files become the
Iceberg metadata pointer — the abstraction is deliberately thin).

Commit protocol (lock-free, concurrent-safe):
- each run writes ONE new file ``_commits/<nanos>-<run_id>.json`` with
  O_CREAT|O_EXCL — two concurrent runs touch two different files, so
  neither can drop the other's commit (the failure mode of a shared
  read-modify-write commit log);
- a run directory is referenced only after its commit file lands, so a
  killed run leaves garbage that is never read (atomic visibility);
- readers list the directory and order commits by (committed_at_unix_ns,
  run_id) — a total order that every reader derives identically.

Idempotency + last-write-wins contract (north_rule):
- rows carry the deterministic identity event_id = conv_id "." turn_idx;
- re-harvest overlaps are removed on read (and by ``compact``) with a
  rank-1 window ordered by commit sequence DESCENDING first — the exact
  analog of Solr's unique-key overwrite, where the LAST committed write
  of a key wins (stale re-commits can never shadow refreshed rows);
  value columns are only a deterministic tiebreak WITHIN one commit.

NEVER a per-sink filter+write loop over the full input: that would scan
the routed frame once per sink.  partitionBy scans once.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

COMMITS_DIR = "_commits"


def iceberg_runtime_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath.

    The north-star deployment writes per-sink Iceberg tables; this
    sandbox ships no Iceberg jar, so the writer detects the runtime and
    routes through ``df.writeTo(table).append()`` only when it is
    actually loadable — the parquet + O_EXCL commit protocol below is
    the documented fallback, and tests/test_resume.py records which
    path the environment exercised."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:  # noqa: BLE001  (Py4J wraps ClassNotFound)
        return False


def _commits_dir(base_dir: str) -> str:
    return os.path.join(base_dir, COMMITS_DIR)


def read_commits(base_dir: str) -> list[dict]:
    """All committed snapshots in commit order (oldest first)."""
    cdir = _commits_dir(base_dir)
    if not os.path.isdir(cdir):
        return []
    entries = []
    for name in os.listdir(cdir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(cdir, name)) as fh:
            entries.append(json.load(fh))
    entries.sort(key=lambda e: (e["committed_at_unix_ns"], e["run_id"]))
    return entries


def _write_commit(base_dir: str, entry: dict) -> dict:
    """Create the run's own commit file with O_EXCL — never a shared
    read-modify-write, so concurrent runs cannot lose each other's
    commits."""
    cdir = _commits_dir(base_dir)
    os.makedirs(cdir, exist_ok=True)
    while True:
        entry["committed_at_unix_ns"] = time.time_ns()
        path = os.path.join(
            cdir, f"{entry['committed_at_unix_ns']}-{entry['run_id']}.json"
        )
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:  # same run_id in the same nanosecond
            continue
        with os.fdopen(fd, "w") as fh:
            json.dump(entry, fh, indent=1)
        return entry


def retire_commits(base_dir: str, entries: list[dict]) -> None:
    """Remove the commit files of snapshots replaced by a compaction."""
    cdir = _commits_dir(base_dir)
    for e in entries:
        path = os.path.join(
            cdir, f"{e['committed_at_unix_ns']}-{e['run_id']}.json"
        )
        if os.path.exists(path):
            os.remove(path)


def write_snapshot(
    routed: DataFrame,
    base_dir: str,
    run_id: str,
    source_snapshot_id: str = "",
    extra: dict | None = None,
    iceberg_table: str | None = None,
    allow_fallback: bool = False,
) -> dict:
    """Write one run's routed delta as a snapshot; returns the commit entry.

    ``iceberg_table``: when set AND the Iceberg runtime is present, the
    write is a real ``df.writeTo(table).append()`` — an Iceberg snapshot
    commit, with the entry recording ``engine='iceberg'`` and the table
    identity instead of a run directory.  When the runtime is absent the
    call raises (a production config asking for Iceberg must not degrade
    silently) unless ``allow_fallback=True``, which takes the parquet
    path and records that the request was downgraded."""
    os.makedirs(base_dir, exist_ok=True)
    engine_extra: dict = {}
    if iceberg_table is not None:
        if iceberg_runtime_available(routed.sparkSession):
            routed.writeTo(iceberg_table).append()
            entry = {
                "run_id": run_id,
                "engine": "iceberg",
                "table": iceberg_table,
                "path": "",
                "source_snapshot_id": source_snapshot_id,
                "committed_at_unix": int(time.time()),
                **(extra or {}),
            }
            return _write_commit(base_dir, entry)
        if not allow_fallback:
            raise RuntimeError(
                f"iceberg_table={iceberg_table!r} requested but the "
                "Iceberg Spark runtime is not on the classpath; pass "
                "allow_fallback=True for the parquet commit protocol"
            )
        engine_extra = {"iceberg_requested": iceberg_table}
    run_dir = os.path.join(base_dir, f"run={run_id}")
    (
        routed.write.mode("overwrite")
        .partitionBy("sink")
        .parquet(run_dir)
    )
    entry = {
        "run_id": run_id,
        "engine": "parquet",
        "path": run_dir,
        "source_snapshot_id": source_snapshot_id,
        "committed_at_unix": int(time.time()),
        **engine_extra,
        **(extra or {}),
    }
    return _write_commit(base_dir, entry)


DEDUP_KEY = ["conv_id", "turn_idx"]
DEDUP_TIEBREAK = ["text", "ts", "role", "tool"]


def snapshots(spark: SparkSession, base_dir: str) -> DataFrame:
    """The commit log as a DataFrame — the Iceberg ``<table>.snapshots``
    metadata-table analog: (seq, run_id, committed_at_unix_ns, path,
    source_snapshot_id, compacted).  Drives time-travel: pass any ``seq``
    to ``read_sinks(as_of_seq=...)``."""
    rows = [
        (
            seq,
            c["run_id"],
            c["committed_at_unix_ns"],
            c["path"],
            c.get("source_snapshot_id", ""),
            bool(c.get("compacted", False)),
        )
        for seq, c in enumerate(read_commits(base_dir))
    ]
    return spark.createDataFrame(
        rows,
        "seq long, run_id string, committed_at_unix_ns long, path string,"
        " source_snapshot_id string, compacted boolean",
    )


def read_sinks(
    spark: SparkSession,
    base_dir: str,
    as_of_seq: int | None = None,
    as_of_unix_ns: int | None = None,
) -> DataFrame:
    """Union of all COMMITTED snapshots, overlap-deduped on the natural key
    with LAST-WRITE-WINS across commits (Solr unique-key semantics).

    Uncommitted (killed-run) directories are invisible: only paths with a
    commit file are read.  Each snapshot is tagged with its commit
    sequence; the dedup window keeps the row from the HIGHEST sequence,
    falling back to value columns only for ties within one commit.

    Time travel (Iceberg ``VERSION AS OF`` / ``TIMESTAMP AS OF`` analog):
    ``as_of_seq`` reads the table as of commit #seq (inclusive, from
    ``snapshots()``); ``as_of_unix_ns`` reads as of a wall-clock instant.
    Commits after the bound are invisible — the result is exactly what a
    reader at that moment saw.  History survives until ``compact`` retires
    the merged commit files (the expire_snapshots analog), after which
    earlier versions are gone — same contract as Iceberg snapshot expiry.
    """
    commits = read_commits(base_dir)
    # seq slice FIRST (seq is an index into the FULL snapshots() order —
    # slicing after the time filter would renumber and leak later commits
    # when both bounds are passed)
    if as_of_seq is not None:
        commits = commits[: as_of_seq + 1]
    if as_of_unix_ns is not None:
        commits = [
            c for c in commits if c["committed_at_unix_ns"] <= as_of_unix_ns
        ]
    if not commits:
        raise FileNotFoundError(
            f"no committed snapshots under {base_dir} (within as_of bound)"
        )
    df = None
    for seq, c in enumerate(commits):
        if c.get("engine") == "iceberg":
            raise NotImplementedError(
                f"commit {c['run_id']} is an Iceberg table snapshot "
                f"({c['table']}); read it via spark.table() — Iceberg "
                "handles dedup/time-travel natively"
            )
        nxt = (
            spark.read.option("basePath", c["path"])
            .parquet(c["path"])
            .withColumn("_commit_seq", F.lit(seq))
        )
        df = nxt if df is None else df.unionByName(
            nxt, allowMissingColumns=True
        )
    tiebreak = [c for c in DEDUP_TIEBREAK if c in df.columns]
    w = Window.partitionBy(*DEDUP_KEY).orderBy(
        F.col("_commit_seq").desc(),
        *[F.col(c).asc_nulls_first() for c in tiebreak],
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "_commit_seq")
    )


def compact(spark: SparkSession, base_dir: str, run_id: str) -> dict:
    """Rewrite all committed snapshots as one deduped snapshot and retire
    the merged commit files (Iceberg rewrite_data_files analog).

    Ordering: the compacted commit file lands BEFORE the merged ones are
    removed, so a concurrent READER sees either (old commits), (old + new)
    — deduped to the same rows — or (new only); never a gap.  Like Iceberg
    rewrite_data_files, compaction assumes no concurrent WRITER (a commit
    racing the compaction could be shadowed for overlapping keys)."""
    old = read_commits(base_dir)
    merged = read_sinks(spark, base_dir)
    run_dir = os.path.join(base_dir, f"run={run_id}")
    merged.write.mode("overwrite").partitionBy("sink").parquet(run_dir)
    entry = _write_commit(
        base_dir,
        {
            "run_id": run_id,
            "path": run_dir,
            "compacted": True,
            "committed_at_unix": int(time.time()),
        },
    )
    retire_commits(base_dir, old)
    return entry
