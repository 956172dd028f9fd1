"""Hybrid retrieval: reciprocal-rank fusion of sparse (BM25) and dense
(embedding-cosine) rankings.

Production retrieval for training-data curation (and RAG serving) runs
BOTH a lexical and a semantic ranker and fuses them; reciprocal rank
fusion (Cormack et al., SIGIR 2009) is the standard score-free fusion:

    rrf(d) = Σ_r 1 / (K + rank_r(d))        (K = 60 in the paper)

Rank-based fusion needs no score calibration between the two systems,
which is exactly why it survives at scale — BM25 scores and cosines
live on incomparable scales.

Scale shape: each input ranking is already a bounded top-k frame (the
expensive corpus-wide work happened inside the rankers, with their own
scale stories — per-partition heaps for BM25, two-phase salted top-k /
IVF for dense). Fusion itself is a full-outer join of two ≤k-row
frames plus one window over ≤2k rows — driver-trivial at any corpus
size. Determinism: ranks are total orders (ties break by doc id), the
fused score is one pround(·, 6) over an identically-shaped double
expression in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..numeric import o_pround, pround

RRF_K = 60


def rrf_fuse(lex_topk: DataFrame, sem_topk: DataFrame) -> DataFrame:
    """Fuse a lexical top-k (``doc_id``, ``score``) with a semantic
    top-k (``cid``, ``rank``) into the RRF ranking over the union of
    candidates.

    Output: (doc_id, lex_rank, sem_rank, rrf_score, final_rank) — a
    candidate missing from one ranking simply contributes no term for
    it (the standard RRF treatment). Both inputs are bounded top-k
    frames, so the unpartitioned windows here order ≤2k rows — bounded
    by construction, never corpus-sized."""
    lexr = lex_topk.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("lex_rank"),
    )
    semr = sem_topk.select(
        F.col("cid").alias("doc_id"), F.col("rank").cast("int").alias("sem_rank")
    )
    fused = lexr.join(semr, "doc_id", "full_outer")
    contrib = F.coalesce(
        F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("sem_rank")), F.lit(0.0))
    scored = fused.select(
        "doc_id", "lex_rank", "sem_rank", pround(contrib, 6).alias("rrf_score")
    )
    return scored.withColumn(
        "final_rank",
        F.row_number()
        .over(Window.orderBy(F.desc("rrf_score"), F.asc("doc_id")))
        .cast("int"),
    )


def o_rrf_fuse(lex_cte: str, sem_cte: str) -> str:
    """DuckDB oracle twin of :func:`rrf_fuse`. ``lex_cte`` must yield
    (doc_id, score); ``sem_cte`` must yield (cid, rank)."""
    return f"""
    WITH {lex_cte},
    {sem_cte},
    lexr AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INT)
               AS lex_rank
      FROM lex
    ),
    semr AS (SELECT cid AS doc_id, CAST(rank AS INT) AS sem_rank FROM sem),
    fused AS (
      SELECT COALESCE(lexr.doc_id, semr.doc_id) AS doc_id,
             lex_rank, sem_rank
      FROM lexr FULL OUTER JOIN semr ON lexr.doc_id = semr.doc_id
    ),
    scored AS (
      SELECT doc_id, lex_rank, sem_rank,
             {o_pround(f"COALESCE(1.0 / ({RRF_K} + lex_rank), 0.0)"
                       f" + COALESCE(1.0 / ({RRF_K} + sem_rank), 0.0)", 6)}
               AS rrf_score
      FROM fused
    )
    SELECT doc_id, lex_rank, sem_rank, rrf_score,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id) AS INT)
             AS final_rank
    FROM scored
    """
