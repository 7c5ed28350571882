"""Raw-log ingestion sources: JSONL / CSV transcript readers with
corrupt-record DLQ routing.

The reference pulls pages of typed POJOs over REST (paged scan,
LogHarvesterTask.java:286-341) and routes malformed entries aside (blank
docid check, lines 338-341).  The Spark-native ingest boundary is a
schema-enforced file read in PERMISSIVE mode: rows that fail the schema
land in a corrupt-record column instead of killing the job, and the
router splits them to a DLQ relation — the file-source twin of the
pipeline's blank-pid DLQ routing (operators/route.py).

Scale shape: schema enforcement and corrupt capture happen INSIDE the
scan (no second pass); both relations come from one read with a
scan-local filter, and Catalyst prunes whichever side a consumer drops.
JSON/CSV text sources are the landing-zone format — production compacts
them into the Iceberg transcripts table this repo's pipeline reads; these
readers are that compaction job's input stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"

# input_hint schema + the corrupt capture column; ts parsed from ISO-8601
TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
_READ_DDL = TRANSCRIPT_DDL + f", {CORRUPT_COL} string"

TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def _split(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, dlq): rows whose whole line failed the schema carry the
    raw line in CORRUPT_COL and null data columns; good rows drop the
    capture column.  A structurally-valid row missing required identity
    fields (conv_id/turn_idx/ts) is ALSO malformed — the blank-docid
    analog."""
    bad = F.col(CORRUPT_COL).isNotNull() | F.col("conv_id").isNull() | (
        F.col("turn_idx").isNull() | F.col("ts").isNull()
    )
    good = raw.filter(~bad).drop(CORRUPT_COL)
    dlq = raw.filter(bad).select(
        F.coalesce(
            F.col(CORRUPT_COL),
            F.to_json(F.struct(*[c for c in raw.columns if c != CORRUPT_COL])),
        ).alias("raw_record"),
        F.col(CORRUPT_COL).isNotNull().alias("schema_corrupt"),
    )
    return good, dlq


def read_transcripts_jsonl(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(good, dlq) from line-delimited JSON.  PERMISSIVE mode: malformed
    lines survive into the corrupt column (FAILFAST would kill a 100 TB
    ingest on one bad line; DROPMALFORMED would hide it)."""
    raw = (
        spark.read.schema(_READ_DDL)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("timestampFormat", TS_FORMAT)
        .json(path)
    )
    return _split(raw)


def read_transcripts_csv(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(good, dlq) from headered CSV (the reference's robot/fixture lists
    are CSV; a transcript landing zone often is too).  Same PERMISSIVE +
    corrupt-column contract as the JSONL reader; multiline quoted fields
    supported so embedded newlines in turn text survive."""
    raw = (
        spark.read.schema(_READ_DDL)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", "true")
        .option("multiLine", "true")
        .option("escape", '"')
        .option("timestampFormat", TS_FORMAT)
        .csv(path)
    )
    return _split(raw)


XML_ROW_TAG = "logEntry"
XML_ROOT_TAG = "log"


def read_transcripts_xml(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(good, dlq) from XML (Spark 4's built-in XML source; one
    ``rowTag`` element per turn under a ``rootTag`` document element) —
    the reference's native interchange format: its log records travel
    as <logEntry> documents (d1_common test fixture logEntry-valid.xml;
    deserialized in v1/NodeCommunication.java:146-149), so a landing
    zone of XML exports is the closest analog of the reference's wire
    input.  Same PERMISSIVE + corrupt-column + identity-field DLQ
    contract as the JSONL/CSV readers: a malformed element survives
    into CORRUPT_COL inside the scan (no second pass), and Catalyst
    prunes whichever side a consumer drops."""
    raw = (
        spark.read.format("xml")
        .schema(_READ_DDL)
        .option("rowTag", XML_ROW_TAG)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("timestampFormat", TS_FORMAT)
        # Spark 4's XML source defaults ignoreSurroundingSpaces=true,
        # which would silently trim leading/trailing whitespace (and
        # null out whitespace-only values) on read — breaking the
        # byte-equal round-trip contract with the parquet transcripts
        # (ADVICE r6).  Landing-zone text is payload, not markup.
        .option("ignoreSurroundingSpaces", "false")
        .load(path)
    )
    return _split(raw)


def write_transcripts_xml(df: DataFrame, path: str) -> None:
    """XML landing-zone writer twin (test scaffolding + export): one
    <logEntry> element per turn, ISO-µs timestamps so the read side
    reparses bit-identically.  Null fields are omitted elements — the
    XML idiom — and read back as nulls."""
    df.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.date_format("ts", TS_FORMAT).alias("ts"),
    ).write.mode("overwrite").format("xml").option(
        "rowTag", XML_ROW_TAG
    ).option("rootTag", XML_ROOT_TAG).save(path)


def write_transcripts_jsonl(df: DataFrame, path: str) -> None:
    """Landing-zone writer twin (test scaffolding + the export side of
    the compaction job): ISO-µs timestamps so the read side reparses
    bit-identically."""
    df.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.date_format("ts", TS_FORMAT).alias("ts"),
    ).write.mode("overwrite").json(path)
