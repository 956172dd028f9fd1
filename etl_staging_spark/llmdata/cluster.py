"""Near-dup cluster assignment: connected components over candidate
pairs, the step between pair discovery (:mod:`.dedup`) and corpus
pruning — docs in one component keep a single canonical representative.

Scale design: the alternating **large-star / small-star** scheme of the
MapReduce connected-components literature (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — the published
O(log n)-round algorithm for graphs that don't fit one machine:

- each round is a constant number of groupBy/join shuffles on the edge
  list; neighborhoods are NEVER collected into arrays (a hub's degree
  is unbounded at 100 TB), the per-node minimum comes from an
  aggregate and joins back;
- large-star hangs every bigger neighbor under the neighborhood
  minimum (cuts long chains in half each round), small-star flattens
  the smaller neighbors onto it — together they converge to star
  graphs where every node points at its component minimum;
- convergence is detected by an order-insensitive edge-set fingerprint
  (count + sum of xxhash64), one tiny aggregate per round, bounded by
  ``max_iter`` as a safety net.

The driver loop holds only the fingerprint — O(1) — never edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) -> for every node u, hang each LARGER neighbor v under
    m = min(N(u) + {u})."""
    both = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    m = (
        both.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", "u").alias("m"))
    )
    return (
        both.where(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges big->small, then point every smaller neighbor (and
    u itself) at m = min(N(u) + {u})."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        oriented.join(m, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edges = m.select("u", F.col("m").alias("v"))
    return moved.union(self_edges).distinct()


def _fingerprint(edges: DataFrame) -> tuple:
    row = edges.agg(
        F.count("*").alias("n"),
        # decimal accumulator: a long SUM of 64-bit hashes overflows
        # under ANSI mode on any non-trivial edge count
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    pairs: DataFrame, max_iter: int = 15
) -> DataFrame:
    """(d1, d2) undirected pair list -> (doc_id, cluster_id) where
    cluster_id is the minimum doc_id of the connected component. Only
    nodes appearing in at least one pair are labeled (singletons are
    their own trivial cluster and never shuffle here).

    Each round ends in ``localCheckpoint`` — the iterative-algorithm
    necessity, not a convenience: a round references its predecessor
    several times, so the unrolled lineage branches exponentially and
    even the PLAN (analysis + codegen per job) grows without bound.
    Checkpointing pins the round to its materialized blocks and keeps
    every plan one round deep. The checkpointed frame is the edge
    list — O(near-dup pairs), orders of magnitude below the corpus —
    which is the same per-iteration truncation GraphFrames' connected
    components applies."""
    edges = pairs.select(
        F.col("d1").alias("u"), F.col("d2").alias("v")
    ).distinct().localCheckpoint()
    prev = _fingerprint(edges)
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint()
        cur = _fingerprint(edges)
        if cur == prev:
            break
        prev = cur
    return (
        edges.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
        .union(edges.select(F.col("v").alias("doc_id"), F.col("v").alias("cluster_id")))
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )


def near_dup_clusters(pairs: DataFrame) -> DataFrame:
    """Cluster assignment + canonical selection over near-dup pairs:
    (doc_id, cluster_id, cluster_size, is_canonical) — keep rows where
    ``is_canonical`` (the component minimum) to dedup the corpus."""
    labels = connected_components(pairs)
    sizes = labels.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        labels.join(sizes, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
        )
    )
