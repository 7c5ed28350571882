"""SparkSession factory tuned for this pipeline.

Scale posture (100 TB target): AQE on (skew-join splitting + partition
coalescing replace the reference's hand-rolled median date-range splitting,
v1/NodeCommunication.java:92-112), Arrow enabled for the pandas-UDF stages,
shuffle partitions sized to the local core count for tests (on a real
cluster leave it to AQE's coalescing from a high initial value).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "d1-log-aggregation-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else "32"
        shuffle_partitions = max(int(n), 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing + skew-join splitting (replaces the
        # reference's manual query_total_limit range splits).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas UDF / applyInPandas stages (input_hint mandates
        # vectorized, never per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # large batches amortize per-batch Arrow/pandas overhead in the
        # mapInArrow/pandas-UDF stages (measured lower variance + ~15%
        # faster at 64k than the 10k default)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Broadcast threshold: our dims (registry, robot lists, sysmeta at
        # test SF) are tiny; at 100 TB sysmeta may exceed this and AQE will
        # fall back to shuffle hash join, which is the right call.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # shuffle/spill on tmpfs: this box's ext4 vdisk halves shuffle-heavy
        # stage times; on a real cluster this is the executors' local NVMe
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"),
        )
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
