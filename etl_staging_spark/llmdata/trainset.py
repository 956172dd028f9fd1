"""The training-set back end, composed: gated corpus -> shard + training
order -> boundary-preserving packing -> shard=K parquet -> manifest.

`corpus_assembly_full` composes the FRONT of the training-data story
(dedup -> decontaminate -> gates -> cap -> split); this module owns the
back: given the surviving corpus, produce the files a dataloader mounts
and the reproducibility manifest that proves they are the right files.

Scale shape (every stage reuses a certified operator):

- shard + order: salted-hash projection, ONE shuffle on shard, ranks
  from per-shard windows only — `sampling.shard_training_order`;
- packing: per-shard JVM array fold over the training order (chunk =
  training sequence, docs never split) — `packing.pack_greedy_docs`;
- write: `repartition(n_shards, shard)` then `sortWithinPartitions`
  leading with the partition column (V1Writes keeps exactly this sort,
  see `sampling.write_training_shards`), so each shard directory is
  written by one task in position order, byte-stable across re-runs.
  NO global sort anywhere — the plan audit asserts no range exchange;
- manifest: count / token total / order-free XOR of content hashes per
  shard (`sampling.shard_manifest`) — and :func:`verify_training_set`
  recomputes the same manifest FROM THE WRITTEN FILES, closing the
  loop: assembly output and on-disk bytes agree or the diff says where.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import packing, sampling


def training_set_rows(
    docs: DataFrame,
    n_shards: int,
    seq_len: int,
    salt: str = "shard-v1",
) -> DataFrame:
    """The packed training set as rows: (doc_id, shard, position,
    n_tokens, chunk_id, text). Shard = salted hash of doc_id; position
    = training order within shard (hash order — content-independent
    pseudo-shuffle); chunk_id = greedy boundary-preserving pack of the
    docs in that order (all docs of one chunk form one training
    sequence)."""
    assigned = sampling.shard_training_order(docs, n_shards, salt=salt)
    with_pos = docs.join(assigned, "doc_id")
    packed = packing.pack_greedy_docs(
        with_pos, seq_len=seq_len, shard_col="shard", order_col="position"
    ).select(
        F.col("doc_id").cast("int").alias("position"),
        "shard",
        "n_tokens",
        "chunk_id",
    )
    return with_pos.join(packed, ["shard", "position"]).select(
        "doc_id", "shard", "position", "n_tokens", "chunk_id", "text"
    )


def curriculum_training_set_rows(
    docs: DataFrame,
    scores: DataFrame,
    n_shards: int,
    seq_len: int,
    stages: int = 4,
    salt: str = "shard-v1",
) -> DataFrame:
    """:func:`training_set_rows` with `sampling.curriculum_order`'s
    schedule: within every shard the greedy boundary-preserving pack
    consumes docs in quality-curriculum order (stage DESC — cleanest
    data first, unscored last), so EARLY chunk ids are the clean
    warm-up sequences and late ones the tail. ``docs`` is the corpus;
    ``scores`` carries (doc_id, quality) — kept as a SEPARATE narrow
    input so the quality column never rides the wide corpus join: the
    assignment branch is (doc_id, quality) end to end, and the corpus
    joins only the skinny (doc_id, shard, stage, position) frame,
    giving the hash variant's exact join count. Output: (doc_id,
    shard, stage, position, n_tokens, chunk_id, text)."""
    assigned = sampling.curriculum_order(
        scores.select("doc_id", "quality"), n_shards, stages=stages,
        salt=salt,
    )
    with_pos = docs.join(assigned, "doc_id")
    packed = packing.pack_greedy_docs(
        with_pos, seq_len=seq_len, shard_col="shard", order_col="position"
    ).select(
        F.col("doc_id").cast("int").alias("position"),
        "shard",
        "n_tokens",
        "chunk_id",
    )
    return with_pos.join(packed, ["shard", "position"]).select(
        "doc_id", "shard", "stage", "position", "n_tokens", "chunk_id",
        "text",
    )


def o_curriculum_training_set_rows(
    n_shards: int,
    seq_len: int,
    stages: int = 4,
    salt: str = "shard-v1",
    qual_rel: str = "qual",
) -> str:
    """DuckDB oracle twin of :func:`curriculum_training_set_rows`
    (minus the text payload): the curriculum stage/order CTEs (the
    caller supplies the quality chain as ``qual_rel``), then the same
    greedy recursive fold as the hash variant stepping one ordered doc
    per shard per iteration. Callers must prefix WITH RECURSIVE."""
    from .hashing import o_hash56
    from .textstats import TOKEN_RE

    h = o_hash56(f"'{salt}:' || CAST(d.doc_id AS VARCHAR)")
    n = f"len(regexp_extract_all(lower(d.text), '{TOKEN_RE}'))"
    return f"""
    cts_base AS (
      SELECT d.doc_id, CAST({n} AS INT) AS n, {h} AS __h,
             ({h}) % {n_shards} AS shard,
             CASE WHEN q.quality IS NULL THEN -1
                  ELSE LEAST({stages - 1},
                             CAST(FLOOR(q.quality * {stages}) AS BIGINT))
             END AS stage
      FROM documents d LEFT JOIN {qual_rel} q ON q.doc_id = d.doc_id
    ),
    cts_ordered AS (
      SELECT doc_id, shard, stage, n,
             CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                     ORDER BY stage DESC, __h, doc_id)
                  AS INT) AS pos
      FROM cts_base
    ),
    cts_fold AS (
      SELECT shard, doc_id, stage, n, pos, 0 AS chunk, n AS used
      FROM cts_ordered WHERE pos = 1
      UNION ALL
      SELECT o.shard, o.doc_id, o.stage, o.n, o.pos,
             CASE WHEN f.used > 0 AND f.used + o.n > {seq_len}
                  THEN f.chunk + 1 ELSE f.chunk END,
             CASE WHEN f.used > 0 AND f.used + o.n > {seq_len}
                  THEN o.n ELSE f.used + o.n END
      FROM cts_fold f JOIN cts_ordered o
        ON o.shard = f.shard AND o.pos = f.pos + 1
    )
    SELECT doc_id, CAST(shard AS INT) AS shard, CAST(stage AS INT) AS stage,
           pos AS position, n AS n_tokens, CAST(chunk AS INT) AS chunk_id
    FROM cts_fold"""


def write_training_set(
    docs: DataFrame,
    path: str,
    n_shards: int,
    seq_len: int,
    salt: str = "shard-v1",
) -> DataFrame:
    """Materialize the packed training set as ``path/shard=K/`` parquet
    in (position) order and return the shard manifest computed from the
    INPUT corpus. Pair with :func:`verify_training_set` to prove the
    written bytes match."""
    rows = training_set_rows(docs, n_shards, seq_len, salt=salt)
    (
        rows.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "position")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return sampling.shard_manifest(docs, n_shards, salt=salt)


def write_curriculum_training_set(
    docs: DataFrame,
    scores: DataFrame,
    path: str,
    n_shards: int,
    seq_len: int,
    stages: int = 4,
    salt: str = "shard-v1",
) -> DataFrame:
    """:func:`write_training_set` under the curriculum schedule:
    materialize :func:`curriculum_training_set_rows` as
    ``path/shard=K/`` parquet in (position) order — each shard reads
    cleanest-first — and return the shard manifest computed from the
    input corpus. The manifest is ORDER-FREE (count / token total /
    XOR of content hashes), so the unchanged
    :func:`verify_training_set` proves the written bytes match
    regardless of which schedule ordered them."""
    rows = curriculum_training_set_rows(
        docs, scores, n_shards, seq_len, stages=stages, salt=salt
    )
    (
        rows.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "position")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return sampling.shard_manifest(docs, n_shards, salt=salt)


def verify_training_set(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    n_shards: int,
    salt: str = "shard-v1",
) -> DataFrame:
    """Recompute the manifest FROM THE WRITTEN FILES and diff it against
    the job's manifest. Output one row per shard:
    (shard, n_docs, n_tokens, content_xor, ok) — ``ok`` is true iff all
    three recomputed values match; a missing/extra/changed document in
    any shard flips its XOR. Also re-derives each written row's shard
    from its doc_id, so a row written under the wrong directory fails
    its OWN shard's checksum rather than hiding."""
    written = spark.read.parquet(path).select("doc_id", "text")
    recomputed = sampling.shard_manifest(written, n_shards, salt=salt)
    m = manifest.select(
        "shard",
        F.col("n_docs").alias("m_docs"),
        F.col("n_tokens").alias("m_tokens"),
        F.col("content_xor").alias("m_xor"),
    )
    return (
        recomputed.join(m, "shard", "full")
        .select(
            "shard",
            "n_docs",
            "n_tokens",
            "content_xor",
            # coalesce: a shard wholly missing from one side of the full
            # outer join yields NULL comparisons — that is a failure, not
            # an unknown, so consumers filtering `ok = false` catch it.
            F.coalesce(
                (F.col("n_docs") == F.col("m_docs"))
                & (F.col("n_tokens") == F.col("m_tokens"))
                & (F.col("content_xor") == F.col("m_xor")),
                F.lit(False),
            ).alias("ok"),
        )
    )


def o_training_set_rows(
    n_shards: int,
    seq_len: int,
    salt: str = "shard-v1",
    source_sql: str = "documents",
) -> str:
    """DuckDB oracle twin of :func:`training_set_rows` (minus the text
    payload): shard + hash-order positions, then the greedy pack as a
    recursive CTE stepping one ordered doc per shard per iteration.
    Callers must prefix WITH RECURSIVE."""
    from .hashing import o_hash56
    from .textstats import TOKEN_RE

    h = o_hash56(f"'{salt}:' || CAST(doc_id AS VARCHAR)")
    n = f"len(regexp_extract_all(lower(text), '{TOKEN_RE}'))"
    return f"""
    ts_ordered AS (
      SELECT doc_id, shard, CAST({n} AS INT) AS n,
             CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                     ORDER BY __h, doc_id) AS INT) AS pos
      FROM (SELECT doc_id, text, {h} AS __h, ({h}) % {n_shards} AS shard
            FROM {source_sql})
    ),
    ts_fold AS (
      SELECT shard, doc_id, n, pos, 0 AS chunk, n AS used
      FROM ts_ordered WHERE pos = 1
      UNION ALL
      SELECT o.shard, o.doc_id, o.n, o.pos,
             CASE WHEN f.used > 0 AND f.used + o.n > {seq_len}
                  THEN f.chunk + 1 ELSE f.chunk END,
             CASE WHEN f.used > 0 AND f.used + o.n > {seq_len}
                  THEN o.n ELSE f.used + o.n END
      FROM ts_fold f JOIN ts_ordered o
        ON o.shard = f.shard AND o.pos = f.pos + 1
    )
    SELECT doc_id, CAST(shard AS INT) AS shard, pos AS position,
           n AS n_tokens, CAST(chunk AS INT) AS chunk_id
    FROM ts_fold"""
