"""Lexical (keyword) retrieval over the document corpus: BM25 top-k.

The similarity-search family (`.simsearch`) covers the dense/embedding
side; this module is its sparse twin — the BM25 ranking function over
the shared llmdata tokenization (`.shingles.with_tokens`), the shape a
training pipeline uses for targeted corpus probes ("every doc about X")
and for building retrieval eval sets.

Scale design: the per-document term frequencies come from array
higher-order functions inside ONE projection over the scan — for a
bounded query (a handful of terms) there is no need to materialize the
exploded inverted index at all. The corpus statistics the score needs
(N, avgdl, per-term document frequencies) reduce to a SINGLE map-side-
combinable aggregate producing one row, which joins back by broadcast
(one row can never be the big side). Ranking is a global top-k —
Spark's TakeOrderedAndProject, a per-partition heap + driver merge of
k-row buffers, never a single-partition sort. Total cost: TWO passes
over the corpus (the stats aggregate, then scoring) — a production
service snapshots the stats at index-write time and pays one
(`bm25_topk_indexed` reads only the query terms' index buckets).

For a *persistent* search service the right structure is the exploded
(term, doc) inverted index bucketed by term (`etl.bucketed`) so query
joins touch only the query terms' buckets; this module is the
query-side ranking math, which is identical over either layout.

Numeric determinism (the oracle hash-matches bit-for-bit):

- The classic BM25 idf is ``ln((N - df + .5)/(df + .5) + 1)`` — but
  ``ln`` is a libm transcendental with no cross-engine bit guarantee
  (JVM StrictMath vs DuckDB's C library may differ in the last ulp).
  The idf here keeps the same Robertson-Sparck-Jones odds-ratio CORE
  without the log: ``(N - df + .5)/(df + .5)``. IEEE +,-,*,/ are
  exactly rounded, so identical expression trees give identical bits
  in both engines; the log is monotone, so rankings for single-term
  queries are identical and multi-term rankings differ only in how
  terms blend — acceptable for a verified-by-hash operator, and a
  one-line swap back where cross-engine verification isn't needed.
- Per-term scores round portably (``numeric.pround``) to 9 decimals,
  then blend in a FIXED left-to-right sum (an expression over named
  columns, not a SUM aggregate), so float addition order cannot vary.
- Ties in the final score break on doc_id: the top-k cut is a total
  order and both engines select the same k rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..numeric import o_pround, pround
from .shingles import TOKS, with_tokens

K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 50,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-``k`` documents by BM25 (rational-idf variant, module doc)
    for the bounded query ``terms``.

    Output: (doc_id, dl, tf_<term>..., score) — score > 0 only rows
    (a doc with no query term can never rank).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    if len(set(terms)) != len(terms):
        # the tf columns are keyed by term; a duplicate would silently
        # collapse (and BM25 duplicate-term weighting is better served
        # by the caller weighting its query)
        raise ValueError("terms must be unique")
    d = with_tokens(docs)

    def _eq(term):
        # NB: a two-parameter lambda would be treated by PySpark's HOF
        # binding as (element, index) — close over the term instead
        return lambda x: x == F.lit(term)

    tf_cols = {t: F.size(F.filter(F.col(TOKS), _eq(t))) for t in terms}
    per_doc = d.select(
        "doc_id",
        F.size(F.col(TOKS)).alias("dl"),
        *[c.alias(f"tf_{i}") for i, (t, c) in enumerate(tf_cols.items())],
    )
    # one 1-row frame: N, avgdl, df per term — broadcast-joined back
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.join(F.broadcast(stats))
    term_scores = []
    for i in range(len(terms)):
        tf = F.col(f"tf_{i}").cast("double")
        idf = (F.col("n_docs") - F.col(f"df_{i}") + F.lit(0.5)) / (
            F.col(f"df_{i}") + F.lit(0.5)
        )
        tf_part = (tf * (k1 + 1.0)) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
        term_scores.append(pround(idf * tf_part, 9))
    # blend in EXACT decimal (scale 9 holds the pround-ed values
    # losslessly... up to double representation, which both engines and
    # the indexed path share), so the sum is order-free and the scan
    # path, the oracle and the index-side SUM aggregate all agree
    total = term_scores[0].cast("decimal(20,9)")
    for ts in term_scores[1:]:
        total = total + ts.cast("decimal(20,9)")
    out = scored.select(
        "doc_id",
        "dl",
        *[F.col(f"tf_{i}").alias(f"tf_{i}") for i in range(len(terms))],
        pround(total.cast("double"), 6).alias("score"),
    )
    return (
        out.where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def o_bm25_topk(
    terms: list[str], k: int = 50, k1: float = K1, b: float = B
) -> str:
    """DuckDB oracle twin of :func:`bm25_topk` (same expression trees)."""
    tf_exprs = ",\n             ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(terms)
    )
    df_aggs = ", ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(terms))
    )
    term_sum = " + ".join(
        "CAST(" + o_pround(
            f"((n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
            f" * ((CAST(tf_{i} AS DOUBLE) * {k1 + 1.0!r})"
            f" / (CAST(tf_{i} AS DOUBLE) + {k1!r} * ({1.0 - b!r} + {b!r}"
            f" * CAST(dl AS DOUBLE) / avgdl)))",
            9,
        ) + " AS DECIMAL(20,9))"
        for i in range(len(terms))
    )
    tf_out = ", ".join(f"tf_{i}" for i in range(len(terms)))
    return f"""
    bmtok AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    bmdoc AS (
      SELECT doc_id, len(toks) AS dl,
             {tf_exprs}
      FROM bmtok
    ),
    bmstats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             {df_aggs}
      FROM bmdoc
    ),
    bmscored AS (
      SELECT doc_id, dl, {tf_out},
             {o_pround(f'CAST(({term_sum}) AS DOUBLE)', 6)} AS score
      FROM bmdoc CROSS JOIN bmstats
    )
    SELECT doc_id, dl, {tf_out}, score
    FROM bmscored WHERE score > 0
    ORDER BY score DESC, doc_id LIMIT {k}"""


def write_term_index(
    docs: DataFrame,
    table: str,
    n_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Persist the corpus as a BM25-ready inverted index — the
    write-once-shuffle half of a lexical search service, the retrieval
    twin of `dedup.write_signature_index`:

    - ``{table}_postings``: (term, doc_id, tf, dl) bucketed by term —
      a query's term list joins matching buckets with NO Exchange on
      the corpus side, and bucket pruning means only the query terms'
      buckets are read at all;
    Corpus stats (n_docs, avgdl) and per-term document frequencies
    derive from the postings at query time — bounded aggregates a
    production service would snapshot at index-write time.

    Production appends new partitions per ingest batch; the bucket
    layout is unchanged by appends."""
    from ..etl.bucketed import write_bucketed

    d = with_tokens(docs, text_col)
    postings = (
        d.select(
            id_col,
            F.size(F.col(TOKS)).alias("dl"),
            F.explode(F.col(TOKS)).alias("term"),
        )
        .groupBy("term", id_col)
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    write_bucketed(postings, f"{table}_postings", ["term"], n_buckets)


def bm25_topk_indexed(
    spark,
    table: str,
    terms: list[str],
    k: int = 50,
    k1: float = K1,
    b: float = B,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k against the persisted inverted index: the query terms
    filter the bucketed postings (bucket pruning — only the terms'
    buckets are scanned, no corpus-wide pass), per-term postings come
    back already (term, doc)-keyed, and scoring proceeds exactly as
    :func:`bm25_topk`. Corpus stats (N, avgdl) fold from the distinct
    (doc, dl) pairs of... the FULL postings table — the one aggregate
    that still sees every doc; a production service snapshots it at
    index-write time instead. Scores equal the scan-time operator's
    whenever every document contains at least one indexed term."""
    if not terms:
        raise ValueError("terms must be non-empty")
    terms = sorted(set(terms))
    postings = spark.table(f"{table}_postings")
    q = postings.where(F.col("term").isin(*terms))
    stats = (
        postings.select(F.col(id_col).alias("doc_id"), "dl").distinct().agg(
            F.count("*").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        )
    )
    # postings are (term, doc_id)-unique by construction of the index
    # write, so df is a plain COUNT — no distinct machinery (Expand)
    dfs = q.groupBy("term").agg(F.count("*").alias("df"))
    per_doc = (
        q.withColumnRenamed(id_col, "doc_id")
        .join(F.broadcast(dfs), "term")
        .join(F.broadcast(stats))
    )
    tf = F.col("tf").cast("double")
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    tf_part = (tf * (k1 + 1.0)) / (
        tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = per_doc.withColumn(
        "tscore", pround(idf * tf_part, 9).cast("decimal(20,9)")
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            pround(F.sum("tscore").cast("double"), 6).alias("score"),
            F.first("dl").alias("dl"),
        )
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


__all__ = [
    "K1", "B", "bm25_topk", "o_bm25_topk",
    "write_term_index", "bm25_topk_indexed",
]
