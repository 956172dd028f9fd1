"""Benchmark decontamination: flag corpus documents sharing word
n-grams with an evaluation/benchmark set — the standard pre-training
hygiene step (the GPT-3/PaLM papers' 13-gram collision rule, here
parameterized; the driver fixture's short docs use n=5).

Scale design: the benchmark side reduces to its DISTINCT shingle set —
eval suites are tiny next to a 100 TB corpus, so the join is a classic
large-fact x small-dim shape that AQE broadcasts; the corpus side is
the one-shuffle shingle explosion shared with the dedup family
(:mod:`.shingles`), and the overlap count is a map-side-combinable
groupBy. Nothing is ever all-pairs and the corpus is scanned once.

The join runs on RAW shingle strings, not the portable 56-bit hash:
collision detection only needs equality, so hashing would add a
md5+hex-slice+conv expression chain per corpus shingle for nothing
(string equality is also exact where a hash join is
collision-approximate). The dedup family keeps the hash because
MinHash/SimHash need numeric hash values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .shingles import shingle_index


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """(doc_id, n_overlap, contaminated) for every corpus doc: how many
    of its distinct word n-grams appear anywhere in the benchmark, and
    whether that count reaches ``min_hits``. Zero-overlap docs are kept
    (n_overlap = 0) so the output is the full keep/drop decision."""
    bench_set = shingle_index(benchmark, n=n).select("shingle").distinct()
    hits = (
        shingle_index(corpus, n=n)
        .join(bench_set, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0).cast("bigint")).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )
