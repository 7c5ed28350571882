"""End-to-end pipeline assembly: parse → dedup → classify → enrich → route.

The declarative analog of LogHarvesterTask.harvest()'s per-record loop
(LogHarvesterTask.java:129-525).  Stage order differs from the reference
deliberately: dedup runs FIRST (the reference gets idempotency from Solr's
unique-key overwrite at the sink; we get it from a rank-1 window before any
stateful computation so repeat-visit flags are identical across re-runs).

Plan shape at scale (local[32] test → 1000-executor reasoning):
- scan: parquet/Iceberg with column pruning; parse is codegen'd regex.
- dedup: 1 shuffle on (conv_id, turn_idx) — high-cardinality uniform key.
- enrich: broadcast joins (no shuffle, pure map-side) — runs before the
  scan so the one Python stage can fuse the geohash encode.
- repeat-visit: 1 shuffle on (ip, pid) feeding a window row_number (key
  boundaries) + a single mapInArrow pass (flags + geohash); Python touches
  only int/bool/float buffers zero-copy, payload columns pass through as
  raw Arrow.  This is the ONLY Python stage in the pipeline.
- classify/route/stamps: codegen'd expressions (no shuffle).
- per-sink write: ONE partitionBy(sink) job; aggregates: 1 partial+final
  hash agg.
Total: 2 data shuffles + broadcasts + 1 Arrow round trip, independent of
cluster size.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dims
from .operators.aggregate import harvest_metrics, sink_counts
from .operators.classify import classify_robots
from .operators.dedup import dedup_turns
from .operators.enrich import (
    enrich_geo_range,
    enrich_registry,
    enrich_sysmeta,
)
from .operators.parse import parse_events
from .operators.repeat_visit import flag_repeat_visits
from .operators.route import route


@dataclass
class PipelineConfig:
    """Analog of logAggregation.properties (reference test cfg §7)."""

    repeat_visit_interval_seconds: int = 30
    events_to_check: tuple[str, ...] = ("read",)
    do_robot_ip_check: bool = True
    # ip membership via broadcast range join instead of the folded
    # expression — the path for CIDR dims too large to fold (J5 scale path)
    robot_ip_via_join: bool = False
    # geo enrichment via the range-keyed dim (J3's true GeoIP shape:
    # ip_long BETWEEN geo_lo AND geo_hi) instead of the derived equi key;
    # payload-identical on the synthetic ip space
    geo_via_range_join: bool = False
    with_geohash: bool = True
    # fixed run stamp so outputs are deterministic/testable (the reference
    # stamps dateAggregated=now, LogHarvesterTask.java:346,355)
    date_aggregated: str = "2026-01-01 00:00:00"
    salt_buckets: int = 0  # >0 → salted repartition of hot conversations
    # hot (ip, pid) keys: scan only the ~30 B/row scan columns in the
    # single-task-per-key sorted window and hash-join the flag back on
    # the uniform event_id (narrow_scan in operators/repeat_visit.py);
    # costs an extra wide shuffle, so OFF for uniform traffic.
    # "auto" (VERDICT r6 item 5): a deterministic ~1% hash-sample
    # pre-pass measures the hottest (ip, pid) fraction and picks narrow
    # past choose_narrow_scan's threshold — see operators/repeat_visit.
    repeat_scan_narrow: bool | str = False


# Routed-row output schema (the LogEntrySolrItem analog, §1.2/§1.3).
ROUTED_COLUMNS = [
    "event_id", "conv_id", "turn_idx", "role", "tool", "ts", "text",
    "event", "pid", "ip", "ua", "subj", "schema_version",
    "node_id", "country", "region", "city", "lat", "lon", "location",
    "format_id", "format_type", "size", "rights_holder",
    "subj_norm", "read_subjects", "read_subjects_str",
    "in_partial_robot_list", "in_full_robot_list", "is_repeat_visit",
    "date_aggregated", "date_updated", "sink", "tool_sink",
]


def run_pipeline(
    transcripts: DataFrame,
    registry: DataFrame,
    sysmeta: DataFrame,
    config: PipelineConfig | None = None,
) -> DataFrame:
    """transcripts → routed rows (all sinks in one frame, `sink` column).

    Callers write it with ``write.partitionBy("sink")`` or slice per sink.
    """
    cfg = config or PipelineConfig()

    df = parse_events(transcripts)
    if cfg.salt_buckets > 0:
        # Hot-conversation skew: spread each conv over salt buckets for the
        # parse/classify map stages; the dedup window below re-shuffles on
        # its own key anyway, so salting costs nothing extra there.  The
        # salt is a deterministic hash of turn_idx (NOT rand(): salting
        # must never make the run non-reproducible).
        df = df.repartition(
            F.col("conv_id"),
            F.pmod(F.xxhash64(F.col("turn_idx")), F.lit(cfg.salt_buckets)),
        )
    df = dedup_turns(df)
    # enrichment (broadcast joins, pure map-side) runs BEFORE the
    # repeat-visit scan so the scan's single Arrow round trip can also
    # carry the geohash encode (fuse_geohash) — one Python stage total
    df = enrich_sysmeta(df, sysmeta)
    if cfg.geo_via_range_join:
        df = enrich_geo_range(
            df, dims.geo_ranges_from_registry(registry)
        )
    else:
        df = enrich_registry(df, registry)
    narrow = cfg.repeat_scan_narrow
    if narrow == "auto":
        # one tiny sampled pre-pass job (deterministic hash sample; two
        # pruned columns) decides the scan shape from the data's actual
        # hot-key fraction instead of a manual config
        from .operators.repeat_visit import choose_narrow_scan

        narrow = choose_narrow_scan(df)
    df = flag_repeat_visits(
        df,
        interval_seconds=cfg.repeat_visit_interval_seconds,
        events_to_check=cfg.events_to_check,
        fuse_geohash=cfg.with_geohash,
        narrow_scan=bool(narrow),
    )
    robot_ranges = None
    if cfg.do_robot_ip_check and cfg.robot_ip_via_join:
        robot_ranges = dims.robot_ip_host_ranges_df(
            transcripts.sparkSession
        )
    df = classify_robots(
        df,
        events_to_check=cfg.events_to_check,
        do_robot_ip_check=cfg.do_robot_ip_check,
        robot_ranges=robot_ranges,
    )
    if cfg.with_geohash:
        for p in range(1, 9):
            df = df.withColumn(
                f"geohash_{p}", F.substring(F.col("geohash_9"), 1, p)
            )
    df = df.withColumns(
        {
            # P5 field stamps (LogHarvesterTask.java:352-356)
            "date_aggregated": F.lit(cfg.date_aggregated).cast("timestamp"),
            "date_updated": F.lit("1900-01-01 00:00:00").cast("timestamp"),
        }
    )
    df = route(df)
    keep = [c for c in ROUTED_COLUMNS if c in df.columns]
    extra = [f"geohash_{p}" for p in range(1, 10) if f"geohash_{p}" in df.columns]
    return df.select(*keep, *extra)


def run_from_dir(
    spark: SparkSession, sf_dir: str, config: PipelineConfig | None = None
) -> DataFrame:
    from .transcripts import load_transcripts

    return run_pipeline(
        load_transcripts(spark, sf_dir),
        dims.registry_df(spark, sf_dir),
        dims.sysmeta_df(spark, sf_dir),
        config,
    )


def pipeline_outputs(routed: DataFrame) -> dict[str, DataFrame]:
    return {
        "routed": routed,
        "sink_counts": sink_counts(routed),
        "metrics": harvest_metrics(routed),
    }
