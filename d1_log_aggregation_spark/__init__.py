"""d1_log_aggregation_spark — a PySpark-native parse → enrich → route →
aggregate pipeline with the query/data-processing capabilities of
DataONEorg/d1_log_aggregation (reference: /root/reference, Java CN service).

This is NOT a port.  The reference harvests event-log records from member
nodes over paged REST, enriches them (sysmeta join, GeoIP, COUNTER robot /
repeat-visit classification), assigns idempotent identities, and loads Solr
in batches (see SURVEY.md).  Here the same computation is re-expressed as an
idiomatic Spark batch pipeline over a table of multi-turn agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)``:

  parse (vectorized regex)  →  enrich (broadcast joins)  →
  classify (COUNTER robot + repeat-visit)  →  dedup (window rank)  →
  route (per-role / per-tool / DLQ sinks)  →  aggregate (per-sink counts)
  + per-partition checkpoints & metrics.
"""

__version__ = "0.1.0"
