"""Text analysis: quality scoring, language ID, token counts,
document fingerprints. All native ``F.*`` — zero Python in the path.

Every ratio is rounded to 6 decimals *before* entering a composite
score, so scores are reproducible bit-for-bit in the DuckDB oracle
(identical operation order, integer inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..numeric import pround

from .hashing import portable_hash56
from .shingles import TOKS, ngram_multiset_sql, with_tokens

# Tiny per-language character-bigram profiles for the n-gram language-ID
# heuristic. With real corpora these would be learned; the operator's
# mechanism (profile intersection scoring, deterministic argmax) is the
# deliverable.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["ch", "ei", "de", "en", "er", "un", "sc", "ge"],
    "en": ["th", "he", "in", "er", "an", "re", "on", "at"],
    "es": ["de", "la", "os", "el", "en", "ar", "es", "ue"],
    "fr": ["le", "es", "en", "ou", "qu", "re", "on", "ai"],
    "zh": ["zh", "sh", "ng", "ia", "ua", "ji", "xi", "wa"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "for", "on", "with"]

# BPE-ish token pattern: runs of alphanumerics, or single non-space symbols.
TOKEN_RE = "[a-z0-9]+|[^a-z0-9 ]"


def quality_scores(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Length / diversity / stopword-density quality score per doc.
    ``keep`` columns pass through untouched (e.g. the source/domain for
    stratified downstream selection) so callers never re-join the scan."""
    d = with_tokens(df)
    n_tokens = F.size(F.col(TOKS))
    n_distinct = F.size(F.array_distinct(F.col(TOKS)))
    tot_len = F.aggregate(
        F.transform(F.col(TOKS), lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    stop_cnt = F.size(F.filter(F.col(TOKS), lambda t: t.isin(*STOPWORDS)))
    d = d.select(
        "doc_id",
        *keep,
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        pround(tot_len / n_tokens, 6).alias("avg_tok_len"),
        pround(n_distinct / n_tokens, 6).alias("distinct_ratio"),
        pround(stop_cnt / n_tokens, 6).alias("stop_ratio"),
    )
    len_score = F.least(F.lit(1.0), F.col("n_tokens") / F.lit(50.0))
    shape_score = F.least(F.lit(1.0), F.col("avg_tok_len") / F.lit(6.0))
    quality = (
        F.lit(0.3) * len_score
        + F.lit(0.4) * F.col("distinct_ratio")
        + F.lit(0.15) * (F.lit(1.0) - F.col("stop_ratio"))
        + F.lit(0.15) * shape_score
    )
    return d.withColumn("quality", pround(quality, 6))


def lang_id(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Char-bigram profile language ID; deterministic alphabetical
    tie-break on equal scores. ZERO evidence is NOT a language: a doc
    whose bigrams hit no profile at all (empty/whitespace/digit-only
    text) gets a NULL ``pred_lang`` rather than the alphabetical
    tie-break's arbitrary first label — downstream language gates must
    treat it as unidentified, not misroute it. NULL text is NULL
    throughout. ``keep`` carries extra columns (e.g. ``source``)
    through the projection so group-by consumers
    (`stats.lang_source_matrix`) need no doc_id re-join."""
    d = df.select("doc_id", *keep, F.lower(F.col("text")).alias("lt"))
    # Profile scoring by substring containment: for a 2-char bigram b,
    # contains(lt, b) <=> b appears at some window position <=> b is in
    # the distinct-bigram array the original formulation materialized —
    # including every edge (NULL lt -> NULL score; empty/1-char lt ->
    # no full window -> 0). 40 JVM substring probes per row replace an
    # O(len) array of 2-char strings + distinct + 5 intersects; same
    # integer scores bit for bit (the DuckDB twins keep replaying the
    # array formulation, and the certified lang_id_ngram hash is
    # unchanged). Measured 2.5s -> sub-1s on the sf0.1 lang cards.
    score_cols = {}
    for lang, prof in LANG_PROFILES.items():
        terms = [F.contains(F.col("lt"), F.lit(b)).cast("int") for b in prof]
        s = terms[0]
        for t in terms[1:]:
            s = s + t
        score_cols[lang] = s
    d = d.select(
        "doc_id", *keep, *[c.alias(f"s_{lang}") for lang, c in score_cols.items()]
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in LANG_PROFILES])
    pred = F.lit(None).cast("string")
    for lang in sorted(LANG_PROFILES, reverse=True):
        pred = F.when(F.col(f"s_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred)  # zero evidence -> NULL, not 'de'
    return d.select(
        "doc_id", *keep, pred.alias("pred_lang"), best.alias("best_score")
    )


def token_counts(df: DataFrame) -> DataFrame:
    """Whitespace tokens vs BPE-ish regex tokens + chars/token."""
    lt = F.lower(F.col("text"))
    n_ws = F.size(F.split(lt, " "))
    n_bpe = F.size(F.regexp_extract_all(lt, F.lit(TOKEN_RE), 0))
    return df.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        pround(F.length(lt) / n_bpe, 6).alias("chars_per_token"),
    )


def fingerprints(df: DataFrame, k: int = 4) -> DataFrame:
    """Document fingerprint: the k smallest distinct shingle hashes
    (a bottom-k sketch — the winnowing idea with a global window),
    rendered as a comma-joined string key."""
    from .dedup import hashed_shingles

    sh = hashed_shingles(df)
    return (
        sh.groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("h")).alias("hs"))
        .select(
            "doc_id",
            F.size("hs").alias("n_shingles"),
            F.concat_ws(",", F.transform(F.slice("hs", 1, k), lambda x: x.cast("string"))).alias(
                "fingerprint"
            ),
        )
    )




def _ngram_all(n: int):
    """NON-distinct word n-grams (repetition analysis needs the
    multiset, unlike the dedup shingles)."""
    return F.expr(ngram_multiset_sql(n))


# Modal-count of an array without exploding it: longest equal-run of the
# SORTED array, folded with the aggregate() higher-order function — one
# JVM-side pass per row, so the per-doc mode costs no shuffle at all.
_MODAL_RUN_SQL = """
aggregate(
  sort_array({arr}),
  struct(CAST(NULL AS STRING) AS prev, CAST(0 AS BIGINT) AS run,
         CAST(0 AS BIGINT) AS best),
  (acc, x) -> struct(
      x AS prev,
      IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1,
         CAST(1 AS BIGINT)) AS run,
      GREATEST(acc.best,
               IF(acc.prev IS NOT NULL AND x = acc.prev, acc.run + 1,
                  CAST(1 AS BIGINT))) AS best),
  acc -> acc.best)
"""


# Repetition gates in the spirit of the Gopher/MassiveText quality
# rules (Rae et al. 2021, table A1): heavily repeated n-grams mark
# boilerplate/spam. Thresholds are the published ones for the two
# ratios implemented here.
TOP_BIGRAM_MAX = 0.18
DUP_TRIGRAM_MAX = 0.30


def repetition_stats(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Per-doc repetition ratios + keep/drop flag:

    - ``top_bigram_frac``: occurrences of the modal word bigram over
      total bigrams;
    - ``dup_trigram_frac``: fraction of trigram occurrences beyond the
      first of each distinct trigram (1 - distinct/total);
    - ``repetitive``: either ratio over its threshold.

    Shape: ONE projection over the scan — the modal bigram count is the
    longest run of the sorted bigram array (aggregate() HOF, per-row
    JVM pass), so no explode, no shuffle, no join; at any corpus size
    this is scan-bound. (The previous shape exploded the multiset
    through two keyed aggregations — two shuffles of corpus x n-grams
    rows.)

    CALLER NOTE: do not `.where()` on the returned flag columns
    directly — Catalyst collapses the filter into this projection and
    higher-order functions are CodegenFallback, so the inlined
    predicate re-evaluates the n-gram fold interpreted per row
    (measured ~100x the projection). Materialize first
    (``.persist()``/write) and filter the materialized frame — the
    production shape anyway.

    ``keep`` carries extra columns through the projection (e.g. the
    source/quality a profile card computed upstream) so chained
    callers (`corpus_source_profile`) need no doc_id re-join."""
    stats = with_tokens(df).select(
        "doc_id",
        *keep,
        F.expr(_MODAL_RUN_SQL.format(arr=ngram_multiset_sql(2))).alias("top_c"),
        F.size(_ngram_all(2)).alias("n_bigrams"),
        F.size(_ngram_all(3)).alias("n_trigrams"),
        F.size(F.array_distinct(_ngram_all(3))).alias("n_distinct_tri"),
    )
    # guarded: ANSI mode makes 0/0 an error; <2/<3-token docs have
    # zero bigrams/trigrams (size() of the empty CASE arm is 0)
    top_frac = F.when(
        F.col("n_bigrams") > 0,
        pround(F.col("top_c") / F.col("n_bigrams"), 6),
    ).otherwise(F.lit(0.0))
    dup_frac = F.when(
        F.col("n_trigrams") > 0,
        pround(
            (F.col("n_trigrams") - F.col("n_distinct_tri")) / F.col("n_trigrams"), 6
        ),
    ).otherwise(F.lit(0.0))
    return stats.select(
        "doc_id",
        *keep,
        F.col("n_bigrams").cast("bigint").alias("n_bigrams"),
        top_frac.alias("top_bigram_frac"),
        dup_frac.alias("dup_trigram_frac"),
        (
            (top_frac > TOP_BIGRAM_MAX) | (dup_frac > DUP_TRIGRAM_MAX)
        ).alias("repetitive"),
    )


__all__ = [
    "LANG_PROFILES", "STOPWORDS", "TOKEN_RE",
    "TOP_BIGRAM_MAX", "DUP_TRIGRAM_MAX",
    "quality_scores", "lang_id", "token_counts", "fingerprints",
    "repetition_stats", "portable_hash56",
]
