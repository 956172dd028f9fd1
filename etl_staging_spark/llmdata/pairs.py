"""Contrastive training-pair mining for embedding-model training.

An embedder's training set needs POSITIVE pairs (texts that mean the
same thing) and NEGATIVE pairs (texts that don't). At corpus scale the
standard recipe mines positives from near-duplicate discovery (the
same banded MinHash-LSH machinery dedup uses — a near-dup IS a natural
paraphrase pair) and draws negatives pseudo-randomly. This module
implements both with fully deterministic, oracle-checkable mechanics:

- positives: `dedup.minhash_lsh_pairs` (banded candidates, exact
  Jaccard verify) — label 1, similarity carried;
- negatives: HASH CO-BUCKETING — every doc lands in one of ``B``
  salted-hash buckets, and each doc pairs with its bucket's minimum
  other doc_id. The salt decorrelates the bucketing from content, so
  co-bucketed docs are a uniform pseudo-random draw; any pair that
  near-dup discovery also found is anti-joined away (a "negative"
  that's actually a near-dup is a label error). No RNG state, no
  global sort or rank — one shuffle on the bucket id, bucket size
  ~N/B.

Scale shape: positives inherit the LSH story (never all-pairs);
negatives are one bucketed aggregate + a broadcast-sized anti-join of
the positive set. Output is reproducible on any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import o_hash56, portable_hash56

NEG_BUCKETS = 64
NEG_SALT = "negpair-v1"


def negative_pairs(
    docs: DataFrame, n_buckets: int = NEG_BUCKETS, salt: str = NEG_SALT
) -> DataFrame:
    """(d1, d2) pseudo-random pairs via hash co-bucketing: each doc
    pairs with the minimum other doc_id of its salted-hash bucket
    (docs that ARE the bucket minimum pair with the bucket's second
    minimum, so every multi-doc bucket contributes every member once).
    Deterministic, content-independent, d1 != d2, d1 < d2 normalized."""
    b = portable_hash56(
        F.concat(F.lit(f"{salt}:"), F.col("doc_id").cast("string"))
    ) % n_buckets
    ids = docs.select(F.col("doc_id"), b.alias("bkt"))
    mins = ids.groupBy("bkt").agg(
        F.min("doc_id").alias("m1"),
    )
    second = (
        ids.join(mins, "bkt")
        .where(F.col("doc_id") != F.col("m1"))
        .groupBy("bkt")
        .agg(F.min("doc_id").alias("m2"))
    )
    anchors = mins.join(second, "bkt")
    paired = ids.join(F.broadcast(anchors), "bkt").select(
        "doc_id",
        F.when(F.col("doc_id") == F.col("m1"), F.col("m2"))
        .otherwise(F.col("m1"))
        .alias("partner"),
    )
    return (
        paired.where(F.col("partner").isNotNull())
        .where(F.col("doc_id") != F.col("partner"))
        .select(
            F.least("doc_id", "partner").alias("d1"),
            F.greatest("doc_id", "partner").alias("d2"),
        )
        .distinct()
    )


def contrastive_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n_buckets: int = NEG_BUCKETS,
    salt: str = NEG_SALT,
) -> DataFrame:
    """Labelled training pairs: near-dup positives (label 1, verified
    Jaccard carried) + hash-co-bucket negatives (label 0, any pair the
    near-dup pass also surfaced is removed). Output:
    (d1, d2, label, jaccard)."""
    from . import dedup

    pos = dedup.minhash_lsh_pairs(docs, threshold=threshold).select(
        "d1", "d2", F.lit(1).alias("label"), "jaccard"
    )
    neg = (
        negative_pairs(docs, n_buckets=n_buckets, salt=salt)
        .join(pos.select("d1", "d2"), ["d1", "d2"], "left_anti")
        .select(
            "d1",
            "d2",
            F.lit(0).alias("label"),
            F.lit(None).cast("double").alias("jaccard"),
        )
    )
    return pos.unionByName(neg)


def o_negative_pairs(
    n_buckets: int = NEG_BUCKETS, salt: str = NEG_SALT, source_sql: str = "documents"
) -> str:
    """DuckDB oracle twin of :func:`negative_pairs` (CTE ``negp``)."""
    h = o_hash56(f"'{salt}:' || CAST(doc_id AS VARCHAR)")
    return f"""
    npids AS (SELECT doc_id, ({h}) % {n_buckets} AS bkt FROM {source_sql}),
    npm1 AS (SELECT bkt, MIN(doc_id) AS m1 FROM npids GROUP BY bkt),
    npm2 AS (
      SELECT i.bkt, MIN(i.doc_id) AS m2
      FROM npids i JOIN npm1 USING (bkt)
      WHERE i.doc_id <> npm1.m1 GROUP BY i.bkt
    ),
    negp AS (
      SELECT DISTINCT LEAST(i.doc_id, CASE WHEN i.doc_id = a.m1 THEN a.m2
                                           ELSE a.m1 END) AS d1,
             GREATEST(i.doc_id, CASE WHEN i.doc_id = a.m1 THEN a.m2
                                     ELSE a.m1 END) AS d2
      FROM npids i
      JOIN (SELECT npm1.bkt, m1, m2 FROM npm1 JOIN npm2 USING (bkt)) a
        USING (bkt)
      WHERE CASE WHEN i.doc_id = a.m1 THEN a.m2 ELSE a.m1 END IS NOT NULL
        AND i.doc_id <> CASE WHEN i.doc_id = a.m1 THEN a.m2 ELSE a.m1 END
    )"""
