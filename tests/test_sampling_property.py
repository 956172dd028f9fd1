"""Property-based checks of the pure mixture-planning helpers — the
driver-side arithmetic every mixture/temperature sampler and its DuckDB
oracle replay. Fixed fixtures pin specific mixes; these pin the LAWS:
threshold bounds, quota caps, temperature monotonicity/flattening, and
the exact integer quantization the cross-engine chain depends on. No
Spark — pure functions, so hypothesis can run hundreds of cases."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_staging_spark.llmdata.sampling import (
    BUCKETS,
    mixture_rates,
    temperature_thresholds,
    temperature_weights,
)

domains = st.dictionaries(
    st.sampled_from([f"src{i}" for i in range(8)]),
    st.integers(min_value=0, max_value=10_000_000),
    min_size=1,
    max_size=8,
)


@given(domains, st.floats(0.01, 1.0), st.integers(0, 10_000_000))
def test_mixture_rates_threshold_bounds_and_caps(counts, w0, target):
    weights = {d: w0 * (i + 1) for i, d in enumerate(sorted(counts))}
    thr = mixture_rates(counts, weights, target)
    assert set(thr) == set(counts)
    for d, t in thr.items():
        assert 0 <= t <= BUCKETS
        n = counts[d]
        # no-upsampling cap: a domain never owes more than it has, so
        # quota >= population must saturate the threshold
        wsum = sum(weights.values())
        quota = target * weights[d] / wsum if wsum else 0.0
        if n and quota >= n:
            assert t == BUCKETS
        if n == 0 or quota == 0:
            assert t == 0


@given(domains, st.floats(0.01, 1.0))
def test_temperature_weights_quantized_and_bounded(counts, alpha):
    w = temperature_weights(counts, alpha)
    assert set(w) == set(counts)
    total = sum(counts.values())
    for d, v in w.items():
        assert isinstance(v, int) and 0 <= v <= 1_000_000_000
        if total:
            # exact quantization law the SQL oracle replays
            assert v == int(
                math.floor((counts[d] / total) ** alpha * 1e9 + 0.5)
            )


multi_domains = st.lists(
    st.tuples(
        st.sampled_from([f"src{i}" for i in range(8)]),
        st.integers(min_value=1, max_value=10_000_000),
    ),
    min_size=2,
    max_size=8,
    unique_by=lambda p: p[0],
).map(dict)


@given(multi_domains)
def test_temperature_flattens_toward_uniform(counts):
    """Lower alpha compresses the weight ratio between the largest and
    smallest domain — the whole point of temperature sampling. Compare
    the RATIO at alpha=1 (natural) vs alpha=0.3: flatter or equal,
    never more skewed."""
    hot = temperature_weights(counts, 1.0)
    cool = temperature_weights(counts, 0.3)
    hi, lo = max(counts, key=counts.get), min(counts, key=counts.get)
    if cool[lo] and hot[lo]:
        assert cool[hi] / cool[lo] <= hot[hi] / hot[lo] + 1e-9


@given(domains, st.integers(0, 1_000_000))
def test_temperature_thresholds_monotone_in_target(counts, target):
    """A bigger target never LOWERS any domain's keep threshold."""
    lo = temperature_thresholds(counts, 0.5, target)
    hi = temperature_thresholds(counts, 0.5, target * 2)
    assert all(hi[d] >= lo[d] for d in counts)


@given(
    st.integers(min_value=0, max_value=1000),
    st.integers(min_value=0, max_value=999999),
)
def test_bucket_edge_membership_law(bucket_milli, raw_micro):
    """The half-quantum edge is EXACTLY the bucket-membership boundary
    for 6-decimal scores: pround(x, 3) >= bucket iff x >= edge(bucket)
    — the law that lets every calibrated threshold be applied as a raw
    `quality >= t` filter with zero IEEE boundary leakage."""
    from etl_staging_spark.llmdata.stats import _bucket_edge
    from etl_staging_spark.numeric import py_pround

    bucket = py_pround(bucket_milli / 1000, 3)
    x = py_pround(raw_micro / 1_000_000, 6)  # any 6-decimal score
    edge = _bucket_edge(bucket, 3)
    assert edge < bucket
    assert (py_pround(x, 3) >= bucket) == (x >= edge), (bucket, x, edge)


# avg_cell_share values are pround-6 doubles in (0, 1]; model them as
# integer micro-units to generate EXACTLY the representable inputs
src_stats = st.dictionaries(
    st.sampled_from([f"src{i}" for i in range(8)]),
    st.tuples(
        st.integers(min_value=1, max_value=10_000_000),       # n_docs
        st.integers(min_value=1, max_value=1_000_000),        # share*1e6
    ),
    min_size=1,
    max_size=8,
).map(lambda d: {s: (n, m / 1_000_000) for s, (n, m) in d.items()})


@settings(deadline=None)  # first call pays the simsearch import
@given(src_stats, st.integers(0, 10_000_000))
def test_share_mixture_thresholds_bounds_and_caps(stats_, target):
    """cluster_share_mixture's driver chain: every threshold lies in
    [0, BUCKETS] (the 1.0 rate cap == never upsample), a zero target
    keeps nothing, and weights are the pround-6 integer micro-units
    the oracle replays (Σw exact — no float accumulation)."""
    from etl_staging_spark.llmdata.simsearch import share_mixture_thresholds

    thr = share_mixture_thresholds(stats_, target)
    assert set(thr) == set(stats_)
    for s, t in thr.items():
        assert 0 <= t <= BUCKETS
    if target == 0:
        assert all(t == 0 for t in thr.values())


@given(
    st.integers(min_value=1, max_value=1_000_000),
    st.integers(min_value=1, max_value=999_999),
    st.integers(min_value=1, max_value=10_000_000),
)
@settings(deadline=None)
def test_share_mixture_rarer_topics_keep_no_less(n, share_micro_lo, target):
    """With equal populations, the source living in RARER cells (lower
    avg share) never gets a lower keep threshold — the monotonicity
    that makes the reweight a reweight."""
    from etl_staging_spark.llmdata.simsearch import share_mixture_thresholds

    lo = share_micro_lo / 1_000_000
    hi = min(1.0, (share_micro_lo + 1) / 1_000_000 * 2)
    thr = share_mixture_thresholds(
        {"rare": (n, lo), "common": (n, hi)}, target
    )
    assert thr["rare"] >= thr["common"]


@given(
    st.integers(min_value=0, max_value=2_000_000),  # pround-6 quality*1e6
    st.integers(min_value=2, max_value=16),
)
@settings(deadline=None)
def test_curriculum_stage_cut_matches_exact_arithmetic(q_micro, stages):
    """The curriculum stage cut — min(stages-1, floor(q * stages)) on a
    pround-6 double — must agree with EXACT rational arithmetic for
    every representable score: the guarantee that the one-multiply
    IEEE expression both engines evaluate can never straddle a bucket
    boundary differently from the mathematical definition."""
    import math
    from fractions import Fraction

    q = q_micro / 1_000_000  # any pround-6 score (incl. > 1 headroom)
    ieee = min(stages - 1, math.floor(q * stages))
    # q*stages in IEEE vs exact: q_micro/1e6*stages. The IEEE product
    # can land on either side of an integer ONLY if the exact value is
    # within 1 ulp of it; for 6-decimal scores and stages <= 16 the
    # exact product q_micro*stages/1e6 is never that close to an
    # integer unless it IS one (denominator 1e6 bounds the gap away
    # from the ulp scale) — so the floor agrees exactly.
    exact = min(stages - 1, Fraction(q_micro, 1_000_000) * stages)
    assert ieee == min(stages - 1, math.floor(exact))
