"""Sequence packing: concat-then-chunk assignment of documents into
fixed-length training sequences.

The GPT-style packing pipeline concatenates a shard's documents in a
deterministic order and slices the token stream into ``seq_len``-sized
chunks. The assignment of a document is therefore a pure function of
the running token count before it:

    seq_index    = floor(cumulative_tokens_before / seq_len)
    token_offset = cumulative_tokens_before % seq_len

Spark shape: one window cumulative sum PARTITIONED BY the shard —
shards are the parallelism unit, so there is no global sort and no
single-partition exchange; at 100 TB you pick the shard granularity
(source file, crawl segment, ...) so each shard's window state stays
executor-sized. Token counts reuse the BPE-ish regex tokenizer from
textstats (JVM-side, codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .textstats import TOKEN_RE


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    shard_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document packing assignment: (shard, seq_index, token_offset,
    n_tokens) under concat-then-chunk with ``seq_len`` tokens per
    sequence. Documents longer than ``seq_len`` simply span several
    chunks (n_chunks counts how many this doc touches)."""
    n_tokens = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    )
    base = docs.select(
        F.col(order_col),
        F.col(shard_col).alias("shard"),
        n_tokens.cast("int").alias("n_tokens"),
    )
    w = (
        W.partitionBy("shard")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    base = base.withColumn(
        "cum_excl", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    # integer DIV end to end: token totals per shard can exceed double
    # precision at corpus scale. GREATEST(n, 1) keeps a (degenerate)
    # empty doc inside one chunk instead of floor(-1 / seq_len).
    return base.selectExpr(
        order_col,
        "shard",
        "n_tokens",
        f"cum_excl DIV {seq_len} AS seq_index",
        f"CAST(cum_excl % {seq_len} AS INT) AS token_offset",
        f"CAST((cum_excl + GREATEST(n_tokens, 1) - 1) DIV {seq_len}"
        f" - cum_excl DIV {seq_len} + 1 AS INT) AS n_chunks",
    )


def o_pack_sequences(seq_len: int = 2048) -> str:
    """DuckDB oracle twin over the ``documents`` view."""
    n = f"len(regexp_extract_all(lower(text), '{TOKEN_RE}'))"
    cum = (
        f"(SUM({n}) OVER (PARTITION BY source ORDER BY doc_id "
        f"ROWS UNBOUNDED PRECEDING) - {n})"
    )
    return f"""
    SELECT doc_id, source AS shard,
           CAST({n} AS INT) AS n_tokens,
           CAST({cum} // {seq_len} AS BIGINT) AS seq_index,
           CAST({cum} % {seq_len} AS INT) AS token_offset,
           CAST(({cum} + GREATEST({n}, 1) - 1) // {seq_len}
                - {cum} // {seq_len} + 1 AS INT) AS n_chunks
    FROM documents
    """
