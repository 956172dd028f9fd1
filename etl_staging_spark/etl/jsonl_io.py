"""JSONL corpus IO — the interchange format training-data pipelines
actually exchange (one JSON object per line, usually gzipped shards).

Same contract as the CSV source (`csv_io`): schemas are DECLARED, never
inferred (inference is a full extra pass over 100 TB and can silently
widen types between drops), and malformed lines land in the shared
``_corrupt_record`` channel instead of failing the job — at scale the
failure channel must be a dataset, not an exception. On top of the raw
scan, `validate_documents` turns the documents-table ingest rules
(non-NULL unique doc_id) into a (valid, rejected-with-reason) split,
the M1 pattern applied to corpus drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .csv_io import CORRUPT_COL


def _scan_plan(schema: StructType) -> tuple[StructType, str]:
    """THE corrupt-channel schema rule, shared by the batch and stream
    readers: (scan schema, corrupt column name to hand the parser).

    Fresh read: append ``_corrupt_record`` and parse into it. Re-read
    of a staged reject dataset (the declared schema ALREADY carries
    ``_corrupt_record``): the staged field must parse as plain data —
    Spark excludes whatever column ``columnNameOfCorruptRecord`` names
    from the parsed data schema, so pointing the parser at the staged
    column reads it back NULL on every well-formed line (silent payload
    loss). Instead the parser gets a fresh sentinel column appended to
    the schema; `_fold_sentinel` coalesces it back into the staged
    column after the scan, so a line that is ITSELF malformed in the
    staged dataset still lands in the channel."""
    names = {f.name for f in schema.fields}
    if CORRUPT_COL not in names:
        return (
            StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())]),
            CORRUPT_COL,
        )
    sentinel = CORRUPT_COL + "_reread"
    while sentinel in names:  # staged-of-staged: keep the name fresh
        sentinel += "_"
    return (
        StructType(list(schema.fields) + [StructField(sentinel, StringType())]),
        sentinel,
    )


def _fold_sentinel(df: DataFrame, corrupt_name: str) -> DataFrame:
    """Collapse a re-read's sentinel corrupt column into the staged
    ``_corrupt_record`` (staged payload wins; a malformed STAGED line
    has the staged column NULL, so the sentinel fills it). No-op on a
    fresh read."""
    if corrupt_name == CORRUPT_COL:
        return df
    return df.withColumn(
        CORRUPT_COL, F.coalesce(F.col(CORRUPT_COL), F.col(corrupt_name))
    ).drop(corrupt_name)


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """Schema-declared JSONL scan; malformed lines keep their raw text
    in the corrupt-record column (PERMISSIVE mode). Handles .gz/.zst
    shards transparently (Hadoop codec by extension). A schema that
    already declares the corrupt column (re-reading a staged reject
    dataset) parses the staged field as DATA via a sentinel corrupt
    column folded back after the scan (`_scan_plan`/`_fold_sentinel`)
    — pointing the parser at the staged column itself would silently
    read the payload back NULL."""
    scan_schema, corrupt_name = _scan_plan(schema)
    df = spark.read.json(
        path,
        schema=scan_schema,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=corrupt_name,
    )
    return _fold_sentinel(df, corrupt_name)


def write_jsonl(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    compression: str | None = None,
    mode: str = "error",
) -> None:
    """Write a frame as JSONL shards. ``shards`` repartitions for a
    target shard count (round-robin — size-balanced, no key skew);
    ``compression`` is any Hadoop codec name ('gzip', 'zstd', ...).
    Columns are written as-is: export the exact projection you mean to
    publish."""
    out = df.repartition(shards) if shards is not None else df
    w = out.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def validate_documents(
    df: DataFrame, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """The documents-ingest gate as data: (valid, rejected) where a row
    is rejected for a NULL id (``null_id``) or a duplicated id
    (``dup_id`` — ALL copies are rejected, because no deterministic
    rule can bless one of two conflicting payloads; the upsert path is
    `etl.upsert` if last-write-wins is actually wanted). The corrupt
    channel, if present from `read_jsonl`, is a third reject reason
    (``corrupt``).

    Scale shape: one aggregate on the id (map-side combinable) and one
    id-keyed join back — the same shuffle family as the exact-dedup
    operator; no window over the corpus. Like `split_corrupt`, callers
    that consume BOTH sides of a raw scan should cache the staged batch
    first (Spark refuses plans whose only referenced file column is the
    corrupt-record column)."""
    has_corrupt = CORRUPT_COL in df.columns
    base = df
    reasons = []
    if has_corrupt:
        corrupt = base.where(F.col(CORRUPT_COL).isNotNull()).withColumn(
            "reject_reason", F.lit("corrupt")
        )
        base = base.where(F.col(CORRUPT_COL).isNull())
        reasons.append(corrupt)
    null_id = base.where(F.col(id_col).isNull()).withColumn(
        "reject_reason", F.lit("null_id")
    )
    keyed = base.where(F.col(id_col).isNotNull())
    dup_keys = (
        keyed.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 1)
        .select(id_col)
    )
    dups = keyed.join(dup_keys, id_col, "left_semi").withColumn(
        "reject_reason", F.lit("dup_id")
    )
    valid = keyed.join(dup_keys, id_col, "left_anti")
    rejected = null_id
    for r in (*reasons, dups):
        rejected = rejected.unionByName(r)
    if has_corrupt:
        valid = valid.drop(CORRUPT_COL)
    return valid, rejected


def jsonl_doc_stream(
    spark: SparkSession, docs_dir: str, schema: StructType
) -> DataFrame:
    """File stream over a JSONL drop directory (declared schema —
    streaming sources never infer), with the SAME corrupt-record
    channel as `read_jsonl`: a malformed line arrives as a row whose
    ``_corrupt_record`` holds the raw text (without the channel it
    would arrive as an all-NULL row and silently inflate every
    downstream count). Callers split it per batch before the doc-shaped
    consumers:

        stream.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)

    (route the other side to a reject sink); after the split every
    foreachBatch consumer (dedup ingest, gated ingest, the additive
    card streams) composes unchanged. A schema already declaring the
    corrupt column takes the same sentinel-and-fold path as
    `read_jsonl` (`_scan_plan`/`_fold_sentinel`), so staged payloads
    survive a streaming re-read too."""
    scan_schema, corrupt_name = _scan_plan(schema)
    stream = (
        spark.readStream.schema(scan_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_name)
        .json(docs_dir)
    )
    return _fold_sentinel(stream, corrupt_name)
