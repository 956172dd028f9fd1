"""Tokenization and shingling, fully JVM-side (no Python UDFs).

Canonical tokenization for the whole llmdata family: lowercase, split
on single spaces (the documents fixture is single-spaced prose). Word
n-gram shingles are built with array higher-order functions inside one
projection — the (doc, shingle) exploded form only materializes where
an operator genuinely needs the inverted index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKS = "__toks"


def with_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(TOKS, F.split(F.lower(F.col(text_col)), " "))


def _gram_transform_sql(n: int) -> str:
    """The gram-window transform over the ``__toks`` column — THE one
    copy of the token-window convention (0-based sequence over
    size-n+1 starts, space-joined), shared by the distinct shingles,
    the multiset cards and the repetition stats so a bounds fix can
    never desynchronize them (or their DuckDB twins)."""
    concat = ", ' ', ".join(f"{TOKS}[i+{k}]" for k in range(n))
    return f"transform(sequence(0, size({TOKS})-{n}), i -> concat({concat}))"


def ngram_multiset_sql(n: int) -> str:
    """ALL n-gram occurrences (the multiset, NOT the dedup path's
    per-doc-distinct shingles) as a SQL expression string; docs with
    fewer than n tokens yield an empty array."""
    return (
        f"CASE WHEN size({TOKS}) >= {n} THEN {_gram_transform_sql(n)} "
        f"ELSE array() END"
    )


def ngram_multiset_array(n: int = 3) -> Column:
    """`ngram_multiset_sql` as a Column — for the frequency-spectrum /
    duplicated-coverage cards that count occurrences."""
    return F.expr(ngram_multiset_sql(n))


def ngram_array(n: int = 3) -> Column:
    """Array of distinct word n-gram shingles from the ``__toks`` column."""
    return F.expr(
        f"CASE WHEN size({TOKS}) >= {n} THEN "
        f"array_distinct({_gram_transform_sql(n)}) ELSE array() END"
    )


def shingle_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Inverted-index form: one row per (id, distinct shingle)."""
    return (
        with_tokens(df, text_col)
        .select(id_col, F.explode(ngram_array(n)).alias("shingle"))
    )


# DuckDB oracle twin: distinct word n-gram shingles per doc via window
# lead()s over the exploded token list (same set as ngram_array).
O_TOKS = """
toks AS (
  SELECT doc_id,
         generate_subscripts(string_split(lower(text), ' '), 1) AS ord,
         unnest(string_split(lower(text), ' ')) AS tok
  FROM documents
)"""

O_TRI = """
tri AS (
  SELECT DISTINCT doc_id, tok || ' ' || l1 || ' ' || l2 AS shingle FROM (
    SELECT doc_id, tok, lead(tok, 1) OVER w AS l1, lead(tok, 2) OVER w AS l2
    FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY ord)
  ) WHERE l2 IS NOT NULL
)"""
