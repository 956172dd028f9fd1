"""The r16 double-prefilter argmax (`_probe_cells_fast_sql` /
`_pq_best_cid_fast_sql`) must be output-identical to the exact-decimal
expressions it fronts: the plain-double ranking is trusted only when
every adjacent margin exceeds the proven error envelope, and
knife-edge rows (exact ties included — the ties-toward-lower-cid rule
cannot be certified by doubles) must fall back to the decimal path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import etl_staging_spark.llmdata.simsearch as ss


@pytest.fixture(scope="module")
def adv(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], "a"),
        (1, [0.0, 1.0, 0.0, 0.0], "a"),
        (2, [1.0, 0.0, 0.0, 0.0], "a"),        # exact dup of vec 0
        # knife-edge: equidistant (to double precision) from two cells
        (3, [0.7071067811865476, 0.7071067811865475, 0.0, 0.0], "b"),
        (5, [0.5, 0.5, None, 0.0], "n"),       # NULL element
        (6, [-1.0, 0.0, 0.0, 0.0], "a"),
        (7, [0.5, 0.5, 0.5, 0.5], "b"),
        (8, [1.0, 1e-17, 0.0, 0.0], "k"),      # sub-envelope perturbation
        (9, [0.6, 0.6, 0.0, 0.0], "t"),
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label string"
    )


def _cmp_probe(df, cent_arrs, cent_norms, probe):
    na = ss.with_norm(df, "embedding")
    exact = na.select(
        "vec_id",
        ss._probe_cells_expr(
            cent_arrs, "embedding", probe, cent_norms, "nrm"
        ).alias("p"),
    ).collect()
    fast = na.select(
        "vec_id",
        ss._probe_cells_expr(
            cent_arrs, "embedding", probe, cent_norms, "nrm", fast=True
        ).alias("p"),
    ).collect()
    de = {r[0]: (list(r[1]) if r[1] is not None else None) for r in exact}
    df_ = {r[0]: (list(r[1]) if r[1] is not None else None) for r in fast}
    assert de == df_


def test_probe_cells_fast_matches_exact_on_ties_and_nulls(adv):
    cent_arrs, cent_norms = ss._resolve_centroids(
        adv, None, 4, "vec_id", "embedding"
    )
    for probe in (1, 2, 3):
        _cmp_probe(adv, cent_arrs, cent_norms, probe)


def test_probe_cells_fast_matches_exact_on_real_embeddings(spark):
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cent_arrs, cent_norms = ss._resolve_centroids(
        emb, None, 8, "vec_id", "embedding"
    )
    for probe in (1, 2):
        _cmp_probe(emb, cent_arrs, cent_norms, probe)


def test_pq_code_fast_matches_exact(adv, spark):
    for df, n_codes, m in ((adv, 4, 2), (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"), 8, 4
    )):
        d, books = ss.pq_codebooks(df, m, n_codes, "vec_id", "embedding")
        na = ss.with_norm(df, "embedding")
        for j in range(m):
            sub = f"slice(embedding, {j * d + 1}, {d})"
            exact = na.select(
                "vec_id", F.expr(ss._pq_best_sql(books[j], sub) + ".cid").alias("c")
            ).collect()
            fast = na.select(
                "vec_id", F.expr(ss._pq_best_cid_fast_sql(books[j], sub)).alias("c")
            ).collect()
            assert {r[0]: r[1] for r in exact} == {r[0]: r[1] for r in fast}


def test_fast_path_declines_unsupported_configs():
    # probe covering every cell leaves no certifying margin below the
    # cut; missing cent_norms means the inline decimal norm folds
    # dominate either way — both must decline, not emit a wrong plan
    ca = {0: [1.0, 0.0], 1: [0.0, 1.0]}
    cn = {0: 1.0, 1: 1.0}
    assert ss._probe_cells_fast_sql(ca, "embedding", 2, cn, "nrm") is None
    assert ss._probe_cells_fast_sql(ca, "embedding", 1, None, "nrm") is None
    assert ss._pq_best_cid_fast_sql({0: [1.0]}, "embedding") is None
