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


def pack_greedy_docs(
    docs: DataFrame,
    seq_len: int = 2048,
    shard_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boundary-preserving greedy packing: documents are NEVER split —
    each shard's docs are taken in order and a doc opens a new chunk
    whenever it would overflow the current one (an over-long doc gets a
    chunk to itself). This is the packing mode used when examples must
    stay contiguous (instruction tuning, document-attention masking);
    `pack_sequences` above is the split-anywhere GPT mode.

    The assignment is a sequential fold with state (used, chunk) that
    RESETS on overflow — not expressible as a prefix sum. It runs as a
    per-shard JVM array fold: collect_list the (ordered) doc lengths
    per shard, aggregate() the chunk ids in one pass, explode back.
    Shards are the parallelism unit and each shard's array lives on one
    executor — the same executor-sized-shard premise as the window
    packing; for shards beyond that, the same fold streams through
    applyInPandas unchanged.

    Output: (doc_id, shard, n_tokens, chunk_id)."""
    n_tokens = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    )
    base = docs.select(
        F.col(order_col).alias("doc_id"),
        F.col(shard_col).alias("shard"),
        n_tokens.cast("int").alias("n"),
    )
    per_shard = base.groupBy("shard").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "n"))).alias("ds")
    )
    fold = f"""
    aggregate(
      ds,
      struct(
        CAST(array() AS ARRAY<STRUCT<doc_id: BIGINT, n: INT, chunk: INT>>) AS out,
        CAST(0 AS INT) AS used,
        CAST(0 AS INT) AS chunk),
      (acc, x) -> CASE
        WHEN acc.used > 0 AND acc.used + x.n > {seq_len} THEN struct(
          array_append(acc.out, struct(x.doc_id AS doc_id, x.n AS n,
                                       acc.chunk + 1 AS chunk)),
          x.n AS used, acc.chunk + 1 AS chunk)
        ELSE struct(
          array_append(acc.out, struct(x.doc_id AS doc_id, x.n AS n,
                                       acc.chunk AS chunk)),
          acc.used + x.n AS used, acc.chunk AS chunk) END,
      acc -> acc.out)
    """
    return (
        per_shard.select("shard", F.explode(F.expr(fold)).alias("e"))
        .select(
            F.col("e.doc_id").alias("doc_id"),
            "shard",
            F.col("e.n").alias("n_tokens"),
            F.col("e.chunk").alias("chunk_id"),
        )
    )


def o_pack_greedy_docs(seq_len: int = 2048) -> str:
    """DuckDB oracle twin: the same greedy fold as a recursive CTE
    stepping one ordered document per shard per iteration (depth =
    max docs per shard — bounded at test scale)."""
    n = f"len(regexp_extract_all(lower(text), '{TOKEN_RE}'))"
    return f"""
    pg_ordered AS (
      SELECT source AS shard, doc_id, CAST({n} AS INT) AS n,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS pos
      FROM documents
    ),
    pg_fold AS (
      SELECT shard, doc_id, n, pos, 0 AS chunk, n AS used
      FROM pg_ordered WHERE pos = 1
      UNION ALL
      SELECT o.shard, o.doc_id, o.n, o.pos,
             -- used > 0 mirrors the Spark fold: an EMPTY current chunk
             -- accepts the next doc regardless of size (a zero-token
             -- doc must not push its successor into a fresh chunk)
             CASE WHEN f.used > 0 AND f.used + o.n > {seq_len}
                  THEN f.chunk + 1 ELSE f.chunk END,
             CASE WHEN f.used > 0 AND f.used + o.n > {seq_len}
                  THEN o.n ELSE f.used + o.n END
      FROM pg_fold f JOIN pg_ordered o
        ON o.shard = f.shard AND o.pos = f.pos + 1
    )
    SELECT doc_id, shard, n AS n_tokens, CAST(chunk AS INT) AS chunk_id
    FROM pg_fold"""
