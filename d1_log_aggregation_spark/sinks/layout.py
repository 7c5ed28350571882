"""Sink layout optimization: range-cluster + sort the routed table.

The reference's Solr index is its own access structure; a parquet/Iceberg
sink's access structure IS the file/row-group layout.  Routed rows land
in ingestion order (conv_ids interleaved across every file), so a
point-lookup ``conv_id = X`` scans every row group of every file.  This
compaction job rewrites a sink range-partitioned and sorted by
``(conv_id, turn_idx)``: each output file covers a disjoint conv_id
range and each row group's min/max stats are tight, so the same lookup
prunes to ~one file and ~one row group from FOOTER METADATA alone — at
100 TB the difference between touching gigabytes and touching terabytes.
(The Iceberg equivalent is a sorted rewrite_data_files compaction; the
mechanism — file/row-group pruning on sorted min/max stats — is
identical for any parquet reader.)

Plan shape: ONE range shuffle (repartitionByRange samples key quantiles,
so output files are size-balanced even under skewed conv_ids) + an
in-partition sort — no global sort, no driver collection.  Row content
is untouched: the layout job is a pure rewrite, checked by the
row-equality pytest and measurable via ``clustering_stats``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def optimize_layout(
    df: DataFrame,
    dest_path: str,
    cluster_col: str = "conv_id",
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    n_files: int = 16,
) -> None:
    """Rewrite ``df`` to ``dest_path`` clustered for point lookups on
    ``cluster_col``: range-partition into ``n_files`` key ranges (one
    output file each; sampled quantile bounds keep them balanced), sort
    within each, write.  In production ``n_files`` derives from table
    size / target file size (e.g. 512 MB Iceberg targets)."""
    (
        df.repartitionByRange(n_files, cluster_col)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(dest_path)
    )


def clustering_stats(
    spark: SparkSession, path: str, cluster_col: str = "conv_id"
) -> dict:
    """Footer-metadata clustering audit (no data read): per row group,
    the ``cluster_col`` min/max stats; returns how many row groups a
    single-key lookup must read ON AVERAGE (the pruning figure of merit)
    plus the overlap structure.  Uses pyarrow on the driver — the footer
    walk is metadata-proportional (KB per file), not data-proportional;
    a 100 TB deployment reads the same stats from the Iceberg manifest
    instead."""
    import glob as _glob

    import pyarrow.parquet as pq

    spans = []
    n_no_stats = 0
    for f in sorted(_glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(cluster_col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            # stats can be absent (writer disabled them, or the physical
            # type doesn't support min/max); string min/max may also be
            # writer-truncated — count such groups separately instead of
            # crashing or reporting misleading spans
            if st is None or not st.has_min_max:
                n_no_stats += 1
                continue
            spans.append((st.min, st.max))
    spans.sort()
    n = len(spans)
    # average #row-groups overlapping a random present key ≈ for each
    # span, how many other spans overlap it (exact on the span set)
    overlaps = 0
    for i, (lo, hi) in enumerate(spans):
        for lo2, hi2 in spans:
            if lo2 <= hi and hi2 >= lo:
                overlaps += 1
    return {
        "n_row_groups": n,
        "n_row_groups_without_stats": n_no_stats,
        "avg_overlapping_row_groups": overlaps / n if n else 0.0,
        "disjoint": all(
            spans[i][1] < spans[i + 1][0] for i in range(n - 1)
        ),
    }
