"""Approximate corpus statistics: the planning inputs a 100 TB pipeline
computes before committing to parameters.

- **cardinality** (`approx_count_distinct`, HyperLogLog++): how many
  distinct shingles/urls/doc-keys exist — sizes the MinHash band count,
  decides exact-vs-approximate dedup, budgets the shuffle. One pass,
  O(1) sketch per partition, mergeable.
- **quantiles** (`percentile_approx`, Greenwald-Khanna): token-count
  distribution — picks the sequence-packing length, flags outlier docs.
  Same one-pass mergeable-sketch shape.

Both are approximate by construction, so they carry no DuckDB oracle
(different engines ship different sketches); the tests pin the error
bound against exact answers instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F

from .textstats import TOKEN_RE


def corpus_cardinality(
    docs: DataFrame, rsd: float = 0.02, text_col: str = "text"
) -> Row:
    """Approximate distinct counts of docs and of word trigram shingles
    in ONE aggregate (no exact distinct — at corpus scale an exact
    count of shingles is itself a giant shuffle)."""
    from .shingles import ngram_array, with_tokens

    toks = with_tokens(docs, text_col)
    exploded = toks.select(
        "doc_id", F.explode_outer(ngram_array(3)).alias("shingle")
    )
    return exploded.agg(
        F.approx_count_distinct("doc_id", rsd).alias("n_docs_approx"),
        F.approx_count_distinct("shingle", rsd).alias("n_shingles_approx"),
    ).head()


def token_length_quantiles(
    docs: DataFrame,
    probabilities: list[float] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
    text_col: str = "text",
) -> list[int]:
    """Approximate quantiles of per-doc token counts (one pass,
    mergeable sketch). Drives the sequence-length / truncation choice:
    seq_len below p99 wastes compute on splits, far above it wastes
    padding."""
    n_tokens = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    )
    row = docs.select(n_tokens.alias("n")).agg(
        F.percentile_approx("n", list(probabilities), accuracy).alias("qs")
    ).head()
    return [int(q) for q in row.qs]


def exact_corpus_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """EXACT corpus planning stats, cross-engine verifiable (the oracle
    twin of the sketches above): doc count, distinct-text count, and
    discrete token-count quantiles (p50/p90 as the smallest value whose
    cumulative frequency reaches rank floor((n-1)*p)+1 — pure integer
    logic, no interpolation, so engines cannot disagree).

    Scale shape: the quantiles come from a VALUE HISTOGRAM, not a sort —
    per-doc token counts live in a tiny bounded domain, so the histogram
    is a map-side-combinable groupBy of #distinct-lengths rows, which
    COLLECTS (the bounded-collect convention of the mixture sampler) and
    resolves the rank elements driver-side: no window anywhere, let
    alone a corpus-sized one. Distinct texts hash-aggregate in one
    shuffle. This is the exact path; the HLL/GK sketches stay the
    one-pass answer when even one shuffle is too expensive."""
    from .textstats import TOKEN_RE

    n_tokens = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
    )
    base = docs.select(F.sha2(F.col(text_col), 256).alias("h"), n_tokens.alias("n"))
    # two-level: a COUNT(*)+COUNT(DISTINCT) mix would plan an Expand
    # that duplicates every row; grouping by the text hash first makes
    # both totals plain aggregates of the grouped frame
    totals = (
        base.groupBy("h")
        .agg(F.count("*").alias("ch"))
        .agg(
            F.sum("ch").alias("n_docs"),
            F.count("*").alias("n_distinct_texts"),
        )
    )
    hist = sorted(
        (r[0], r[1])
        for r in base.groupBy("n").agg(F.count("*").alias("c")).collect()
    )  # bounded: #distinct token lengths
    n_docs = sum(c for _, c in hist)

    def rank_element(p: float) -> int:
        import math

        rank = math.floor((n_docs - 1) * p) + 1
        cum = 0
        for v, c in hist:
            cum += c
            if cum >= rank:
                return v
        return hist[-1][0] if hist else 0

    # NB: the histogram collects at CALL time while the totals evaluate
    # lazily — callers over mutable sources should snapshot first. The
    # isNotNull guard makes the empty corpus yield ZERO rows (an
    # ungrouped Spark agg otherwise emits one NULL row where the
    # oracle's GROUP BY emits none).
    return totals.where(F.col("n_docs").isNotNull()).select(
        "n_docs",
        "n_distinct_texts",
        F.lit(rank_element(0.5)).cast("bigint").alias("p50_tokens"),
        F.lit(rank_element(0.9)).cast("bigint").alias("p90_tokens"),
    )


def o_exact_corpus_stats(text_col: str = "text") -> str:
    """DuckDB oracle twin of :func:`exact_corpus_stats` (same discrete
    quantile definition, same histogram shape)."""
    return f"""
    ecs_base AS (
      SELECT sha256({text_col}) AS h,
             len(regexp_extract_all(lower({text_col}), '[a-z0-9]+|[^a-z0-9 ]')) AS n
      FROM documents
    ),
    ecs_tot AS (
      SELECT COUNT(*) AS n_docs, COUNT(DISTINCT h) AS n_distinct_texts
      FROM ecs_base
    ),
    ecs_hist AS (SELECT n, COUNT(*) AS c FROM ecs_base GROUP BY n),
    ecs_cum AS (
      SELECT n, SUM(c) OVER (ORDER BY n
                             ROWS UNBOUNDED PRECEDING) AS cum
      FROM ecs_hist
    )
    SELECT t.n_docs, t.n_distinct_texts,
           MIN(CASE WHEN cum >= FLOOR((t.n_docs - 1) * 0.5) + 1 THEN n END) AS p50_tokens,
           MIN(CASE WHEN cum >= FLOOR((t.n_docs - 1) * 0.9) + 1 THEN n END) AS p90_tokens
    FROM ecs_cum CROSS JOIN ecs_tot t
    GROUP BY t.n_docs, t.n_distinct_texts"""
