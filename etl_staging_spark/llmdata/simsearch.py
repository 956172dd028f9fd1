"""Similarity search over an embedding column (array<float>).

- ``cosine_topk`` — brute-force baseline: broadcast the (small) query
  set against all candidates; dot products via ``zip_with`` +
  ``aggregate`` entirely in the JVM. Exact; cost O(|Q| * N). The
  per-query top-k is a window over qid — each query's candidates hash
  to one partition, so the shuffle is on |Q| keys (fine for dashboard-
  sized Q; for huge Q, range-partition by qid).
- ``lsh_bucketed_topk`` — the scale path: 8 deterministic random
  hyperplanes give a 8-bit sign bucket per vector; queries only score
  candidates in THEIR bucket (expected N/256 of the data per query).
  An inner equi-join on the bucket key — shuffles once, no cross join.

Numeric determinism: every dot product/norm is an exact DECIMAL(30,15)
sum of per-element double products, cast back to double — identical in
Spark and DuckDB regardless of summation order (registry.py
convention, applied element-wise).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from .hashing import hyperplanes

DEC = "decimal(30,15)"


def _dot(a: Column, b: Column) -> Column:
    """Exact-decimal dot product of two array<float> columns, as double."""
    prods = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DEC))
    return F.aggregate(
        prods, F.lit(0).cast(DEC), lambda acc, x: (acc + x).cast(DEC)
    ).cast("double")


def with_norm(df: DataFrame, vec_col: str = "embedding", out: str = "nrm") -> DataFrame:
    return df.withColumn(out, F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def cosine_topk(
    emb: DataFrame,
    query_pred: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbours for every vector matching ``query_pred``."""
    normed = with_norm(emb, vec_col)
    q = normed.where(query_pred).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        F.col("nrm").alias("qn"),
    )
    c = normed.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cv"),
        F.col("nrm").alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("cid") != F.col("qid"))
        .withColumn("cos_raw", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos_raw"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("qid", "cid", F.round("cos_raw", 6).alias("cosine"), F.col("rnk").alias("rank"))
    )


N_PLANES = 8


def _bucket(vec_col: Column, dim: int) -> Column:
    """8-char '0'/'1' sign-LSH bucket key (deterministic hyperplanes)."""
    planes = hyperplanes(N_PLANES, dim)
    bits = []
    for w_p in planes:
        lits = F.array(*[F.lit(w) for w in w_p])
        bits.append(F.when(_dot(lits, vec_col) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_bucketed_topk(
    emb: DataFrame,
    query_pred: Column,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: top-k by cosine *within the query's sign-LSH bucket*."""
    normed = with_norm(emb, vec_col).withColumn("bkt", _bucket(F.col(vec_col), dim))
    q = normed.where(query_pred).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"),
        F.col("nrm").alias("qn"), "bkt",
    )
    c = normed.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"),
        F.col("nrm").alias("cn"), "bkt",
    )
    scored = (
        c.join(q, "bkt")
        .where(F.col("cid") != F.col("qid"))
        .withColumn("cos_raw", _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos_raw"), F.asc("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("qid", "cid", F.round("cos_raw", 6).alias("cosine"), F.col("rnk").alias("rank"))
    )
