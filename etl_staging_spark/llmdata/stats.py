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
