"""Property triangulation of the r10-queue card ORACLES.

The planted and parity tests pin Spark == DuckDB; these pin
DuckDB == an INDEPENDENT pure-python reference on hundreds of random
tiny corpora, so a shared twin bug (the same wrong math implemented on
both engines) cannot hide. No Spark session — each example is a
millisecond DuckDB run, which is what lets hypothesis explore the
degenerate corners (empty sides, NULL sources, all-NULL groups,
empty-string docs, NULL-element vectors) the fixed fixtures sample
only once."""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_staging_spark.llmdata.simsearch import _py_decimal_norm
from etl_staging_spark.numeric import py_pround
from etl_staging_spark.queries.catalog_llm import (
    o_embedding_stats_card,
    o_source_novelty_card,
    o_token_drift_card,
)

token_st = st.sampled_from(["x", "y", "z", "w", "qq"])
text_st = st.one_of(
    st.none(), st.lists(token_st, max_size=8).map(" ".join)
)
source_st = st.sampled_from(["a", "b", "c"])


def _docs_con(rows, with_ids=False):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR)"
    )
    if rows:
        con.executemany(
            "INSERT INTO documents VALUES (?, ?, ?)",
            [(i, t, s) for i, (t, s) in enumerate(rows)],
        )
    return con


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(text_st, source_st), max_size=12), st.integers(1, 5))
def test_token_drift_oracle_matches_python_reference(rows, top_n):
    counts = {"a": defaultdict(int), "b": defaultdict(int)}
    for text, src in rows:
        if text is None or src not in ("a", "b"):
            continue
        for tok in text.lower().split(" "):
            counts[src][tok] += 1
    ta = sum(counts["a"].values())
    tb = sum(counts["b"].values())
    ref = []
    for tok in set(counts["a"]) | set(counts["b"]):
        ca, cb = counts["a"][tok], counts["b"][tok]
        ra = py_pround(ca / ta, 6) if ta else None
        rb = py_pround(cb / tb, 6) if tb else None
        d = py_pround(ca / ta - cb / tb, 6) if ta and tb else None
        ref.append((tok, ca, cb, ra, rb, d))
    # |delta| DESC NULLS LAST, token ASC — the card's total order
    ref.sort(key=lambda r: (r[5] is None, -abs(r[5] or 0.0), r[0]))
    ref = ref[:top_n]
    con = _docs_con(rows)
    got = [
        tuple(r)
        for r in con.sql(o_token_drift_card("a", "b", top_n)).fetchall()
    ]
    assert got == ref


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.tuples(text_st, st.one_of(st.none(), source_st)), max_size=12
    ),
    st.integers(1, 3),
)
def test_source_novelty_oracle_matches_python_reference(rows, n):
    member: dict[str, set] = defaultdict(set)
    per_source: dict = defaultdict(set)
    sentinel = object()  # NULL source distinct from every real name
    for text, src in rows:
        if text is None:
            continue
        toks = text.lower().split(" ")
        if len(toks) < n:
            continue
        key = sentinel if src is None else src
        for i in range(len(toks) - n + 1):
            g = " ".join(toks[i : i + n])
            member[g].add(key)
            per_source[key].add(g)
    ref = []
    for key, grams in per_source.items():
        uniq = sum(1 for g in grams if len(member[g]) == 1)
        ref.append(
            (
                None if key is sentinel else key,
                len(grams),
                uniq,
                py_pround(uniq / len(grams), 6),
            )
        )
    ref.sort(key=lambda r: (r[0] is None, r[0] or ""))
    con = _docs_con(rows)
    got = [tuple(r) for r in con.sql(o_source_novelty_card(n)).fetchall()]
    assert got == ref


elem_st = st.one_of(
    st.none(),
    st.floats(
        width=32, allow_nan=False, allow_infinity=False,
        min_value=-100, max_value=100,
    ),
)
vec_st = st.one_of(st.none(), st.lists(elem_st, max_size=4))
label_st = st.one_of(st.none(), st.sampled_from(["g1", "g2"]))


def _n9(vec):
    """The cross-engine per-row norm: NULL vec or NULL element -> None;
    else exact-decimal norm prounded to 9 (empty vec folds to 0.0)."""
    if vec is None or any(x is None for x in vec):
        return None
    return py_pround(_py_decimal_norm(vec), 9)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(vec_st, label_st), max_size=12))
def test_embedding_stats_oracle_matches_python_reference(rows):
    groups: dict = defaultdict(list)
    for vec, label in rows:
        groups[label].append(vec)
    q9 = Decimal(1).scaleb(-9)
    ref = []
    for label, vecs in groups.items():
        n9s = [_n9(v) for v in vecs]
        live = [x for x in n9s if x is not None]
        dims = [len(v) for v in vecs if v is not None]
        # DECIMAL(38,9) sum of the 9-dp norms: exact, order-free
        mean = None
        if live:
            acc = sum(
                Decimal(repr(x)).quantize(q9, rounding=ROUND_HALF_UP)
                for x in live
            )
            mean = py_pround(float(acc) / len(live), 6)
        ref.append(
            (
                label,
                len(vecs),
                sum(1 for v in vecs if v is None),
                sum(
                    1
                    for v in vecs
                    if v is not None and any(x is None for x in v)
                ),
                sum(1 for x in live if x == 0),
                min(dims) if dims else None,
                max(dims) if dims else None,
                py_pround(min(live), 6) if live else None,
                py_pround(max(live), 6) if live else None,
                mean,
            )
        )
    ref.sort(key=lambda r: (r[0] is None, r[0] or ""))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[],"
        " label VARCHAR)"
    )
    if rows:
        con.executemany(
            "INSERT INTO embeddings VALUES (?, CAST(? AS FLOAT[]), ?)",
            [(i, v, s) for i, (v, s) in enumerate(rows)],
        )
    got = [tuple(r) for r in con.sql(o_embedding_stats_card()).fetchall()]
    assert got == ref


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(text_st, source_st), max_size=12), st.integers(1, 3))
def test_ngram_freq_spectrum_oracle_matches_python_reference(rows, n):
    from collections import Counter

    grams: Counter = Counter()
    for text, _src in rows:
        if text is None:
            continue
        toks = text.lower().split(" ")
        for i in range(len(toks) - n + 1):
            grams[" ".join(toks[i : i + n])] += 1  # TOTAL counts (Zipf)
    spectrum: Counter = Counter(grams.values())
    ref = sorted(spectrum.items())
    from etl_staging_spark.queries.catalog_llm import o_ngram_freq_spectrum

    con = _docs_con(rows)
    got = sorted(
        tuple(r) for r in con.sql(o_ngram_freq_spectrum(n)).fetchall()
    )
    assert got == ref


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.tuples(text_st, st.one_of(st.none(), source_st)), max_size=12
    )
)
def test_dup_rate_by_source_oracle_matches_python_reference(rows):
    from etl_staging_spark.queries.catalog_llm import o_dup_rate_by_source

    per: dict = {}
    for text, src in rows:
        per.setdefault(src, []).append(text)
    ref = []
    for src, texts in per.items():
        with_text = [t for t in texts if t is not None]
        n_texts = len(set(with_text))
        dup = len(with_text) - n_texts
        rate = py_pround(dup / len(with_text), 6) if with_text else None
        ref.append((src, len(texts), len(with_text), n_texts, dup, rate))
    ref.sort(key=lambda r: (r[0] is None, r[0] or ""))
    con = _docs_con(rows)
    got = sorted(
        (tuple(r) for r in con.sql(o_dup_rate_by_source()).fetchall()),
        key=lambda r: (r[0] is None, r[0] or ""),
    )
    assert got == ref


@settings(max_examples=120, deadline=None)
@given(
    st.integers(1, 20),
    st.lists(
        st.tuples(
            st.sampled_from(["train", "val", "o'ddly named"]),
            st.floats(0.01, 0.33),
        ),
        min_size=1,
        max_size=3,
        unique_by=lambda t: t[0],
    ),
)
def test_hash_split_oracle_matches_python_reference(n_docs, parts):
    """o_hash_split == the documented python hash chain on random
    fraction maps — including quoted split names and a quoted salt
    (the newly escaped free-form strings)."""
    from etl_staging_spark.llmdata.hashing import py_hash56
    from etl_staging_spark.llmdata.sampling import BUCKETS, o_hash_split

    fractions = dict(parts)
    salt = "v1'quoted"
    names = list(fractions)

    def ref_split(doc_id: int) -> str:
        b = py_hash56(f"{salt}:{doc_id}")
        acc = 0.0
        for name in names[:-1]:
            acc += fractions[name]
            if b % BUCKETS < int(round(acc * BUCKETS)):
                return name
        return names[-1]

    rows = [(None, "s") for _ in range(n_docs)]
    con = _docs_con(rows)
    got = dict(
        con.sql(
            f"SELECT doc_id, {o_hash_split(fractions, salt=salt)} AS split"
            " FROM documents"
        ).fetchall()
    )
    assert got == {i: ref_split(i) for i in range(n_docs)}


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=20),
    st.floats(0.1, 1.0),
    st.integers(0, 30),
)
def test_mixture_temperature_oracle_matches_python_chain(srcs, alpha, target):
    """o_mixture_sample_temperature's SQL replay of the quantized
    weight chain (pow -> 1e9 floor-quantize -> BIGINT sum -> IEEE rate
    -> FLOOR threshold) selects exactly the rows the python driver
    chain (temperature_thresholds + py_hash56 buckets) selects."""
    from etl_staging_spark.llmdata.hashing import py_hash56
    from etl_staging_spark.llmdata.sampling import (
        BUCKETS,
        o_mixture_sample_temperature,
        temperature_thresholds,
    )

    rows = [(f"t{i}", s) for i, s in enumerate(srcs)]
    counts: dict = {}
    for _t, s in rows:
        counts[s] = counts.get(s, 0) + 1
    thr = temperature_thresholds(counts, alpha, target)
    ref = sorted(
        i
        for i, (_t, s) in enumerate(rows)
        if py_hash56(f"mixT-v1:{i}") % BUCKETS < thr.get(s, 0)
    )
    con = _docs_con(rows)
    got = sorted(
        r[0]
        for r in con.sql(
            "SELECT doc_id FROM ("
            + o_mixture_sample_temperature(alpha, target)
            + ")"
        ).fetchall()
    )
    assert got == ref


@settings(max_examples=200, deadline=None)
@given(
    payloads=st.lists(
        st.one_of(st.none(), st.binary(max_size=40)), min_size=1, max_size=12
    ),
    dim=st.sampled_from([2, 16, 64]),
)
def test_feature_batches_matches_naive_reference(payloads, dim):
    """The row-offset-bincount byte-histogram kernel
    (`multimodal.feature_batches`) equals a naive per-row reference on
    random payload batches including None and empty bytes — the
    single-pass vectorization cannot silently mix rows or mis-handle
    the degenerate classes."""
    import pandas as pd

    from etl_staging_spark.llmdata.multimodal import feature_batches

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(payloads)),
            "payload": payloads,
            "fmt": ["img"] * len(payloads),
        }
    )
    (out,) = list(feature_batches(dim)([pdf]))
    for i, p in enumerate(payloads):
        got = out["embedding"][i]
        if p is None:
            assert got is None
            continue
        ref = [0.0] * dim
        for b in p:
            ref[b % dim] += 1.0
        if p:
            ref = [c / len(p) for c in ref]
        assert got == ref, (i, p)


def test_feature_batches_zero_row_batch():
    """A zero-row Arrow batch yields a zero-row frame instead of the
    float64 np.repeat cast crash (r11 ADVICE fix): Spark's mapInPandas
    never sends one today, but plain-python callers and future Arrow
    slicing behavior can."""
    import pandas as pd

    from etl_staging_spark.llmdata.multimodal import feature_batches

    empty = pd.DataFrame({"doc_id": [], "payload": [], "fmt": []})
    (out,) = list(feature_batches(16)([empty]))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "fmt", "embedding"]


text_payload_st = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
        max_size=24,
    ),
)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(text_payload_st, min_size=1, max_size=10),
    st.sampled_from([2, 16, 64]),
)
def test_feature_table_oracle_matches_python_reference(texts, dim):
    """The DuckDB `o_feature_table` twin equals an independent pure-
    python byte-histogram reference on random corpora incl. NULL text,
    empty strings, and multi-byte UTF-8 — the hex-substr byte
    extraction and the dense-grid zero bins cannot silently diverge
    from the kernel's semantics (same guarantee the other card oracles
    carry)."""
    from etl_staging_spark.queries.catalog_llm import o_feature_table

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(texts))
    )
    got = {
        r[0]: (r[1], None if r[2] is None else list(r[2]))
        for r in con.sql(o_feature_table(dim)).fetchall()
    }
    for i, t in enumerate(texts):
        if t is None:
            assert got[i] == ("video", None)
            continue
        raw = t.encode("utf-8")
        fmt = ["img", "audio", "video"][len(raw) % 3]
        ref = [0.0] * dim
        for b in raw:
            ref[b % dim] += 1.0
        if raw:
            ref = [c / len(raw) for c in ref]
        assert got[i] == (fmt, ref), (i, t)


from tests.conftest import nsafe_sorted as _nsafe  # noqa: E402


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.tuples(text_st, st.one_of(st.none(), source_st)), max_size=12)
)
def test_ttr_oracle_matches_python_reference(rows):
    from etl_staging_spark.queries.catalog_llm import o_ttr_card

    sentinel = object()
    counts: dict = defaultdict(lambda: defaultdict(int))
    for text, src in rows:
        if text is None:
            continue
        key = sentinel if src is None else src
        for tok in text.lower().split(" "):
            counts[key][tok] += 1
    ref = []
    for key, toks in counts.items():
        n_tokens = sum(toks.values())
        n_types = len(toks)
        n_hapax = sum(1 for c in toks.values() if c == 1)
        ref.append(
            (
                None if key is sentinel else key,
                n_tokens,
                n_types,
                n_hapax,
                py_pround(n_types / n_tokens, 6),
                py_pround(n_hapax / n_types, 6),
            )
        )
    con = _docs_con(rows)
    got = [tuple(r) for r in con.sql(o_ttr_card()).fetchall()]
    assert _nsafe(got) == _nsafe(ref)


# texts with TOKEN_RE-relevant shapes: alnum runs, punctuation symbols,
# empty strings (zero tokens), repeated words
lh_text_st = st.one_of(
    st.none(),
    st.lists(
        st.sampled_from(["x", "yy", "z9", ".", "!", "longword"]), max_size=20
    ).map(" ".join),
)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.tuples(lh_text_st, st.one_of(st.none(), source_st)),
             max_size=12)
)
def test_length_histogram_oracle_matches_python_reference(rows):
    import re

    from etl_staging_spark.llmdata.stats import LENGTH_BUCKET_MAX_POW
    from etl_staging_spark.llmdata.textstats import TOKEN_RE
    from etl_staging_spark.queries.catalog_llm import o_length_histogram_card

    sentinel = object()
    hist: dict = defaultdict(int)
    totals: dict = defaultdict(int)
    for text, src in rows:
        if text is None:
            continue
        n = len(re.findall(TOKEN_RE, text.lower()))
        lo = 0
        if n > 0:
            lo = 2 ** LENGTH_BUCKET_MAX_POW
            for k in range(LENGTH_BUCKET_MAX_POW):
                if n < 2 ** (k + 1):
                    lo = 2 ** k
                    break
        key = sentinel if src is None else src
        hist[(key, lo)] += 1
        totals[key] += 1
    ref = []
    for (key, lo), n_docs in hist.items():
        hi = (
            0 if lo == 0
            else None if lo == 2 ** LENGTH_BUCKET_MAX_POW
            else lo * 2 - 1
        )
        ref.append(
            (
                None if key is sentinel else key,
                lo,
                hi,
                n_docs,
                py_pround(n_docs / totals[key], 6),
            )
        )
    con = _docs_con(rows)
    got = [tuple(r) for r in con.sql(o_length_histogram_card()).fetchall()]
    assert _nsafe(got) == _nsafe(ref)


lang_text_st = st.one_of(
    st.none(),
    st.lists(
        st.sampled_from(
            ["that", "there", "schein", "unter", "12345", "", "le", "ng"]
        ),
        max_size=6,
    ).map(" ".join),
)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.tuples(lang_text_st, st.one_of(st.none(), source_st)),
             max_size=12)
)
def test_lang_source_matrix_oracle_matches_python_reference(rows):
    from etl_staging_spark.llmdata.textstats import LANG_PROFILES
    from etl_staging_spark.queries.catalog_llm import o_lang_source_matrix

    def pred_lang(text):
        if text is None:
            return None
        lt = text.lower()
        bg = {lt[i : i + 2] for i in range(len(lt) - 1)}
        scores = {
            lang: len(bg & set(prof)) for lang, prof in LANG_PROFILES.items()
        }
        best = max(scores.values()) if scores else 0
        if best <= 0:
            return None
        return min(lang for lang, s in scores.items() if s == best)

    sentinel = object()
    m: dict = defaultdict(int)
    totals: dict = defaultdict(int)
    for text, src in rows:
        key = sentinel if src is None else src
        m[(key, pred_lang(text))] += 1
        totals[key] += 1
    ref = [
        (
            None if key is sentinel else key,
            lang,
            n,
            py_pround(n / totals[key], 6),
        )
        for (key, lang), n in m.items()
    ]
    con = _docs_con(rows)
    got = [tuple(r) for r in con.sql(o_lang_source_matrix()).fetchall()]
    assert _nsafe(got) == _nsafe(ref)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.tuples(text_st, st.one_of(st.none(), source_st)),
             max_size=12),
    st.integers(1, 4),
)
def test_vocab_coverage_by_source_oracle_matches_python_reference(rows, k):
    from etl_staging_spark.llmdata.vocab import o_vocab_coverage_by_source

    sentinel = object()
    per: dict = defaultdict(lambda: defaultdict(int))
    glob: dict = defaultdict(int)
    for text, src in rows:
        if text is None:
            continue
        key = sentinel if src is None else src
        for tok in text.lower().split(" "):
            per[key][tok] += 1
            glob[tok] += 1
    top = {
        t for t, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    }
    ref = []
    for key, toks in per.items():
        total = sum(toks.values())
        covered = sum(c for t, c in toks.items() if t in top)
        ref.append(
            (
                None if key is sentinel else key,
                total,
                covered,
                py_pround(covered / total, 6),
                py_pround((total - covered) / total, 6),
            )
        )
    con = _docs_con(rows)
    got = [
        tuple(r) for r in con.sql(o_vocab_coverage_by_source(k)).fetchall()
    ]
    assert _nsafe(got) == _nsafe(ref)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.tuples(lang_text_st, st.one_of(st.none(), st.sampled_from(
            ["en", "de", "xx"]
        ))),
        max_size=12,
    )
)
def test_lang_confusion_oracle_matches_python_reference(rows):
    from etl_staging_spark.llmdata.textstats import LANG_PROFILES
    from etl_staging_spark.queries.catalog_llm import o_lang_confusion_card

    def pred_lang(text):
        if text is None:
            return None
        lt = text.lower()
        bg = {lt[i : i + 2] for i in range(len(lt) - 1)}
        scores = {
            lang: len(bg & set(prof)) for lang, prof in LANG_PROFILES.items()
        }
        best = max(scores.values()) if scores else 0
        if best <= 0:
            return None
        return min(lang for lang, s in scores.items() if s == best)

    sentinel = object()
    m: dict = defaultdict(int)
    totals: dict = defaultdict(int)
    for text, label in rows:
        key = sentinel if label is None else label
        m[(key, pred_lang(text))] += 1
        totals[key] += 1
    ref = [
        (
            None if key is sentinel else key,
            lang,
            n,
            py_pround(n / totals[key], 6),
        )
        for (key, lang), n in m.items()
    ]
    # the confusion card reads the documents.lang column as the label
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR)"
    )
    if rows:
        con.executemany(
            "INSERT INTO documents VALUES (?, ?, ?)",
            [(i, t, g) for i, (t, g) in enumerate(rows)],
        )
    got = [tuple(r) for r in con.sql(o_lang_confusion_card()).fetchall()]
    assert _nsafe(got) == _nsafe(ref)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.tuples(text_st, st.one_of(st.none(), source_st)),
             max_size=14)
)
def test_dup_rate_oracle_matches_python_reference(rows):
    from etl_staging_spark.queries.catalog_llm import o_dup_rate_by_source

    sentinel = object()
    per: dict = defaultdict(lambda: {"docs": 0, "texts": []})
    for text, src in rows:
        key = sentinel if src is None else src
        per[key]["docs"] += 1
        if text is not None:
            per[key]["texts"].append(text)
    ref = []
    for key, d in per.items():
        wt = len(d["texts"])
        nt = len(set(d["texts"]))
        ref.append(
            (
                None if key is sentinel else key,
                d["docs"],
                wt,
                nt,
                wt - nt,
                py_pround((wt - nt) / wt, 6) if wt > 0 else None,
            )
        )
    con = _docs_con(rows)
    got = [tuple(r) for r in con.sql(o_dup_rate_by_source()).fetchall()]
    assert _nsafe(got) == _nsafe(ref)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.tuples(text_st, source_st), max_size=14),
    st.integers(1, 3),
)
def test_ngram_spectrum_oracle_matches_python_reference(rows, n):
    from etl_staging_spark.queries.catalog_llm import o_ngram_freq_spectrum

    freq: dict = defaultdict(int)
    for text, _ in rows:
        if text is None:
            continue
        toks = text.lower().split(" ")
        if len(toks) < n:
            continue
        for i in range(len(toks) - n + 1):
            freq[" ".join(toks[i : i + n])] += 1
    spectrum: dict = defaultdict(int)
    for f in freq.values():
        spectrum[f] += 1
    ref = sorted(spectrum.items())
    con = _docs_con(rows)
    got = sorted(
        tuple(r) for r in con.sql(o_ngram_freq_spectrum(n)).fetchall()
    )
    assert got == ref


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(text_st, source_st), max_size=14))
def test_exact_corpus_stats_oracle_matches_python_reference(rows):
    """The discrete-quantile oracle: p50/p90 = the smallest token count
    whose CUMULATIVE frequency (over non-NULL-text docs, NULLs sorted
    last) reaches rank floor((n_docs-1)*p)+1 where n_docs counts ALL
    docs — a NULL-text-heavy corpus can leave a rank unreachable and
    the quantile NULL. The python reference implements exactly that
    spec; the hypothesis sweep covers the NULL-heavy corner the
    certified entry's real data never exercises."""
    import re as _re

    from etl_staging_spark.llmdata.stats import o_exact_corpus_stats
    from etl_staging_spark.llmdata.textstats import TOKEN_RE

    n_docs = len(rows)
    texts = [t for t, _ in rows if t is not None]
    counts = sorted(len(_re.findall(TOKEN_RE, t.lower())) for t in texts)

    def quantile(p):
        rank = (n_docs - 1) * p // 1 + 1  # floor((n-1)p)+1
        for cum, c in enumerate(counts, start=1):
            if cum >= rank:
                return c
        return None

    ref = (
        (n_docs, len(set(texts)), quantile(0.5), quantile(0.9))
        if n_docs else None
    )
    con = _docs_con(rows)
    got = con.sql("WITH " + o_exact_corpus_stats()).fetchall()
    if n_docs == 0:
        assert got == [] or got == [(0, 0, None, None)]
    else:
        assert [tuple(r) for r in got] == [ref]


# ---------------------------------------------------------------------------
# r13 wave-2 queue cards: DuckDB oracle vs pure-python reference
# ---------------------------------------------------------------------------

import re as _re

from etl_staging_spark.llmdata.textstats import (
    LANG_PROFILES,
    STOPWORDS,
    TOKEN_RE,
)
from etl_staging_spark.queries.catalog_llm import (
    o_dup_ngram_coverage,
    o_length_quality_joint_card,
    o_source_signature_terms,
    o_source_vocab_cosine_matrix,
    o_token_fertility_by_lang,
    o_truncation_loss_card,
)

# words that exercise the profile bigrams, stopwords, digits, punct
word_st = st.sampled_from(
    ["that", "there", "schein", "unter", "la", "qu", "123", "x!", "the", "zz"]
)
rich_text_st = st.one_of(
    st.none(), st.lists(word_st, max_size=6).map(" ".join)
)
nullable_source_st = st.one_of(st.none(), source_st)


def _bpe_count(text):
    return len(_re.findall(TOKEN_RE, text.lower()))


def _nsort(rows):
    return sorted(
        rows,
        key=lambda t: tuple((v is not None, "" if v is None else v) for v in t),
    )


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(rich_text_st, nullable_source_st), max_size=12))
def test_token_fertility_oracle_matches_python_reference(rows):
    groups: dict = defaultdict(lambda: [0, 0, 0])  # docs, chars, toks
    for text, _src in rows:
        if text is None:
            pred = None
            nc = tok = 0
        else:
            lt = text.lower()
            scores = {
                lang: sum(1 for b in prof if b in lt)
                for lang, prof in LANG_PROFILES.items()
            }
            best = max(scores.values())
            pred = (
                min(l for l, s in scores.items() if s == best)
                if best > 0
                else None
            )
            nc, tok = len(text), _bpe_count(text)
        g = groups[pred]
        g[0] += 1
        g[1] += nc
        g[2] += tok
    ref = []
    for pred, (nd, nc, tok) in groups.items():
        ref.append(
            (
                pred,
                nd,
                nc,
                tok,
                py_pround(nc / tok, 6) if tok > 0 else None,
            )
        )
    con = _docs_con([(t, s) for t, s in rows])
    got = [
        tuple(r) for r in con.sql(o_token_fertility_by_lang()).fetchall()
    ]
    assert _nsort(got) == _nsort(ref)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.tuples(rich_text_st, nullable_source_st), max_size=12),
    st.integers(0, 6),
)
def test_truncation_loss_oracle_matches_python_reference(rows, max_len):
    groups: dict = defaultdict(lambda: [0, 0, 0, 0])
    for text, src in rows:
        if text is None:
            continue
        tok = _bpe_count(text)
        g = groups[src]
        g[0] += 1
        g[1] += tok
        g[2] += 1 if tok > max_len else 0
        g[3] += max(tok - max_len, 0)
    ref = [
        (
            src,
            nd,
            tok,
            tr,
            lost,
            py_pround(tr / nd, 6),
            py_pround(lost / tok, 6) if tok > 0 else None,
        )
        for src, (nd, tok, tr, lost) in groups.items()
    ]
    con = _docs_con(rows)
    got = [
        tuple(r) for r in con.sql(o_truncation_loss_card(max_len)).fetchall()
    ]
    assert _nsort(got) == _nsort(ref)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.tuples(rich_text_st, nullable_source_st), max_size=10),
    st.integers(1, 3),
)
def test_dup_ngram_coverage_oracle_matches_python_reference(rows, n):
    gram_docs: dict = defaultdict(set)
    per_doc: list = []  # (source, {gram: occ})
    for i, (text, src) in enumerate(rows):
        if text is None:
            continue
        toks = text.lower().split(" ")
        if len(toks) < n:
            continue
        occ: dict = defaultdict(int)
        for j in range(len(toks) - n + 1):
            g = " ".join(toks[j : j + n])
            occ[g] += 1
            gram_docs[g].add(i)
        per_doc.append((src, occ))
    groups: dict = defaultdict(lambda: [0, 0])
    for src, occ in per_doc:
        g = groups[src]
        for gram, c in occ.items():
            g[0] += c
            if len(gram_docs[gram]) > 1:
                g[1] += c
    ref = [
        (src, tot, dup, py_pround(dup / tot, 6))
        for src, (tot, dup) in groups.items()
    ]
    con = _docs_con(rows)
    got = [tuple(r) for r in con.sql(o_dup_ngram_coverage(n)).fetchall()]
    assert _nsort(got) == _nsort(ref)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(rich_text_st, nullable_source_st), max_size=12))
def test_vocab_cosine_oracle_matches_python_reference(rows):
    counts: dict = defaultdict(lambda: defaultdict(int))
    for text, src in rows:
        if text is None or src is None:
            continue
        for tok in text.lower().split(" "):
            counts[src][tok] += 1
    norms = {
        s: math.sqrt(float(sum(c * c for c in toks.values())))
        for s, toks in counts.items()
    }
    ref = []
    srcs = sorted(counts)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = set(counts[a]) & set(counts[b])
            if not shared:
                continue
            dot = sum(counts[a][t] * counts[b][t] for t in shared)
            ref.append(
                (
                    a,
                    b,
                    len(shared),
                    py_pround(float(dot) / (norms[a] * norms[b]), 6),
                )
            )
    con = _docs_con(rows)
    got = [
        tuple(r)
        for r in con.sql(o_source_vocab_cosine_matrix()).fetchall()
    ]
    assert _nsort(got) == _nsort(ref)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.tuples(rich_text_st, nullable_source_st), max_size=12),
    st.integers(1, 3),
    st.integers(1, 2),
)
def test_signature_terms_oracle_matches_python_reference(rows, k, min_cnt):
    counts: dict = defaultdict(lambda: defaultdict(int))
    for text, src in rows:
        if text is None or src is None:
            continue
        for tok in text.lower().split(" "):
            counts[src][tok] += 1
    n_total = sum(sum(t.values()) for t in counts.values())
    cnt_t: dict = defaultdict(int)
    for toks in counts.values():
        for t, c in toks.items():
            cnt_t[t] += c
    ref = []
    for src, toks in counts.items():
        n_s = sum(toks.values())
        scored = [
            (
                (float(c) * n_total) / (float(n_s) * cnt_t[t]),
                t,
                c,
            )
            for t, c in toks.items()
            if c >= min_cnt
        ]
        scored.sort(key=lambda x: (-x[0], x[1]))
        for rank, (lift, t, c) in enumerate(scored[:k], 1):
            ref.append((src, rank, t, c, py_pround(lift, 6)))
    con = _docs_con(rows)
    got = [
        tuple(r)
        for r in con.sql(o_source_signature_terms(k, min_cnt)).fetchall()
    ]
    assert _nsort(got) == _nsort(ref)


def _py_quality(text):
    """Python replica of the shared quality CTEs (space tokens,
    prounded ratios, the weighted sum's left-assoc double adds)."""
    if text is None:
        return None
    toks = text.lower().split(" ")
    n = len(toks)
    nd = len(set(toks))
    tot = sum(len(t) for t in toks)
    sc = sum(1 for t in toks if t in STOPWORDS)
    atl = py_pround(tot / n, 6)
    dr = py_pround(nd / n, 6)
    sr = py_pround(sc / n, 6)
    return py_pround(
        0.3 * min(1.0, n / 50.0)
        + 0.4 * dr
        + 0.15 * (1.0 - sr)
        + 0.15 * min(1.0, atl / 6.0),
        6,
    )


def _py_len_bucket(n):
    if n == 0:
        return 0
    for kk in range(24):
        if n < 2 ** (kk + 1):
            return 2**kk
    return 2**24


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(rich_text_st, nullable_source_st), max_size=12))
def test_length_quality_joint_oracle_matches_python_reference(rows):
    cells: dict = defaultdict(int)
    for text, _src in rows:
        q = _py_quality(text)
        if q is None:
            continue
        lo = _py_len_bucket(_bpe_count(text))
        qe6 = int(math.floor(q * 1000000 + 0.5))
        cells[(lo, qe6 // 100000)] += 1
    total = sum(cells.values())
    ref = [
        (lo, qb, float(qb) / 10.0, c, py_pround(c / total, 6))
        for (lo, qb), c in cells.items()
    ]
    con = _docs_con(rows)
    got = [
        tuple(r)
        for r in con.sql(o_length_quality_joint_card()).fetchall()
    ]
    assert _nsort(got) == _nsort(ref)


# ---------------------------------------------------------------------------
# r14 queue trio + sentence card: DuckDB oracle vs pure-python reference
# ---------------------------------------------------------------------------

from etl_staging_spark.llmdata.pii import EMAIL_RE, LONG_ID_RE, PHONE_RE
from etl_staging_spark.queries.catalog_llm import (
    o_charclass_profile_card,
    o_dup_token_rate_by_source,
    o_pii_rate_by_source,
    o_sentence_stats_card,
)

pii_word_st = st.sampled_from(
    ["a@b.co", "555-123-4567", "123456789", "clean", "12", "x.y", "!"]
)
pii_text_st = st.one_of(
    st.none(), st.lists(pii_word_st, max_size=5).map(" ".join)
)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(pii_text_st, nullable_source_st), max_size=12))
def test_pii_rate_oracle_matches_python_reference(rows):
    # e/p/i stay None for a source whose docs are ALL NULL-text (SUM
    # over no non-NULL rows is NULL on both engines; the doc counts
    # and the rate still report)
    groups: dict = defaultdict(lambda: [0, None, None, None, 0])
    for text, src in rows:
        g = groups[src]
        g[0] += 1
        if text is None:
            continue
        e = len(_re.findall(EMAIL_RE, text))
        p = len(_re.findall(PHONE_RE, text))
        i = len(_re.findall(LONG_ID_RE, text))
        g[1] = (g[1] or 0) + e
        g[2] = (g[2] or 0) + p
        g[3] = (g[3] or 0) + i
        g[4] += 1 if e + p + i > 0 else 0
    ref = [
        (src, nd, e, p, i, pd, py_pround(pd / nd, 6))
        for src, (nd, e, p, i, pd) in groups.items()
    ]
    con = _docs_con(rows)
    got = [tuple(r) for r in con.sql(o_pii_rate_by_source()).fetchall()]
    assert _nsort(got) == _nsort(ref)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(rich_text_st, nullable_source_st), max_size=12))
def test_dup_token_rate_oracle_matches_python_reference(rows):
    groups: dict = defaultdict(lambda: defaultdict(list))
    for text, src in rows:
        if text is None:
            continue
        groups[src][text].append(_bpe_count(text))
    ref = []
    for src, by_text in groups.items():
        nwt = sum(len(v) for v in by_text.values())
        total = sum(sum(v) for v in by_text.values())
        dup = sum((len(v) - 1) * v[0] for v in by_text.values())
        ref.append(
            (
                src,
                nwt,
                total,
                dup,
                py_pround(dup / total, 6) if total > 0 else None,
            )
        )
    con = _docs_con(rows)
    got = [
        tuple(r) for r in con.sql(o_dup_token_rate_by_source()).fetchall()
    ]
    assert _nsort(got) == _nsort(ref)


cc_text_st = st.one_of(
    st.none(),
    st.text(
        alphabet="aB3 !\t\n\ré.", max_size=12
    ),
)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(cc_text_st, nullable_source_st), max_size=12))
def test_charclass_oracle_matches_python_reference(rows):
    groups: dict = defaultdict(lambda: [0, 0, 0, 0, 0])
    for text, src in rows:
        if text is None:
            continue
        g = groups[src]
        g[0] += 1
        g[1] += len(text)
        g[2] += sum(1 for ch in text if ("a" <= ch <= "z") or ("A" <= ch <= "Z"))
        g[3] += sum(1 for ch in text if "0" <= ch <= "9")
        g[4] += sum(1 for ch in text if ch in " \t\n\r")
    ref = []
    for src, (nd, n, al, dg, sp) in groups.items():
        fr = lambda x: py_pround(float(x) / n, 6) if n > 0 else None  # noqa: E731
        ref.append(
            (src, nd, n, fr(al), fr(dg), fr(sp), fr(n - al - dg - sp))
        )
    con = _docs_con(rows)
    got = [
        tuple(r) for r in con.sql(o_charclass_profile_card()).fetchall()
    ]
    assert _nsort(got) == _nsort(ref)


sent_word_st = st.sampled_from(["that.", "x!", "y?", "...", "zz", "\n", "w.w"])
sent_text_st = st.one_of(
    st.none(), st.lists(sent_word_st, max_size=6).map(" ".join)
)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(sent_text_st, nullable_source_st), max_size=12))
def test_sentence_stats_oracle_matches_python_reference(rows):
    groups: dict = defaultdict(lambda: [0, None, 0])  # docs, ns, toks
    for text, src in rows:
        g = groups[src]
        g[0] += 1
        if text is None:
            continue
        ns = sum(
            1
            for seg in _re.split(r"[.!?]+", text)
            if _re.search(r"[^ \t\n\r]", seg)
        )
        g[1] = (g[1] or 0) + ns
        g[2] += _bpe_count(text)
    ref = []
    for src, (nd, ns, tok) in groups.items():
        ns0 = ns or 0
        ref.append(
            (
                src,
                nd,
                ns0,
                py_pround(float(ns0) / nd, 6),
                py_pround(float(tok) / ns, 6) if ns and ns > 0 else None,
            )
        )
    con = _docs_con(rows)
    got = [tuple(r) for r in con.sql(o_sentence_stats_card()).fetchall()]
    assert _nsort(got) == _nsort(ref)


# ---------------------------------------------------------------------------
# cluster_profile oracle vs python reference (decimal-dot assignment,
# modal ties, exact-decimal mean)
# ---------------------------------------------------------------------------

from etl_staging_spark.llmdata.simsearch import (
    _py_decimal_dot,
    _py_decimal_norm as _pdn,
)
from etl_staging_spark.queries.catalog_llm import o_cluster_profile

# float32-exact, nonzero elements: the DOUBLE the oracle unnests equals
# the float the python reference multiplies
f32_elem_st = st.sampled_from([0.5, -0.5, 1.0, 0.25, -0.75, 1.5, 2.0])
cl_vec_st = st.lists(f32_elem_st, min_size=3, max_size=3)
cl_label_st = st.one_of(st.none(), st.integers(0, 2))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(cl_vec_st, cl_label_st), min_size=1, max_size=10),
    st.integers(1, 3),
)
def test_cluster_profile_oracle_matches_python_reference(rows, k):
    cents = {i: v for i, (v, _) in enumerate(rows) if i < k}
    norms = {i: _pdn(v) for i, (v, _) in enumerate(rows)}
    assign = []
    for i, (v, label) in enumerate(rows):
        cands = [
            (
                _py_decimal_dot(v, cv) / (norms[i] * norms[cid]),
                cid,
            )
            for cid, cv in cents.items()
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        c, cell = cands[0]
        assign.append((cell, py_pround(c, 6), label))
    total = len(assign)
    q6 = Decimal(1).scaleb(-6)
    ref = []
    for cell in sorted({a[0] for a in assign}):
        members = [a for a in assign if a[0] == cell]
        n = len(members)
        acc = sum(
            Decimal(repr(cr)).quantize(q6, rounding=ROUND_HALF_UP)
            for _, cr, _ in members
        )
        lab_counts: dict = defaultdict(int)
        for _, _, label in members:
            lab_counts[label] += 1
        modal, n_lab = sorted(
            lab_counts.items(),
            key=lambda t: (-t[1], t[0] is None, t[0] if t[0] is not None else 0),
        )[0]
        ref.append(
            (
                cell,
                n,
                py_pround(n / total, 6),
                py_pround(float(acc) / n, 6),
                modal,
                py_pround(n_lab / n, 6),
            )
        )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[],"
        " label INTEGER)"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?, CAST(? AS FLOAT[]), ?)",
        [(i, v, s) for i, (v, s) in enumerate(rows)],
    )
    got = [tuple(r) for r in con.sql(o_cluster_profile(k)).fetchall()]
    assert sorted(got) == ref


# ---------------------------------------------------------------------------
# r16 queue: mm usability + events volume oracles vs python references
# ---------------------------------------------------------------------------

from etl_staging_spark.operators.events import o_volume_card
from etl_staging_spark.queries.catalog_llm import o_mm_usability_card

mm_text_st = st.one_of(
    st.none(), st.text(alphabet="abcé ", max_size=7)
)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(mm_text_st, source_st), max_size=10))
def test_mm_usability_oracle_matches_python_reference(rows):
    groups: dict = defaultdict(lambda: [0, 0, 0, 0])
    for text, _src in rows:
        if text is None:
            nb = None
        else:
            nb = len(text.encode("utf-8"))
        fmt = (
            "video"
            if nb is None
            else ("img", "audio", "video")[nb % 3]
        )
        g = groups[fmt]
        g[0] += 1
        if nb is None:
            g[1] += 1      # NULL payload -> NULL vector
        elif nb == 0:
            g[2] += 1      # empty payload -> zero vector
        else:
            g[3] += 1
    ref = [
        (fmt, nd, nl, zz, ok, py_pround(ok / nd, 6))
        for fmt, (nd, nl, zz, ok) in groups.items()
    ]
    con = _docs_con(rows)
    got = [tuple(r) for r in con.sql(o_mm_usability_card(16)).fetchall()]
    assert _nsort(got) == _nsort(ref)


ev_value_st = st.one_of(
    st.none(),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-100, max_value=100),
    # the unaccountable populations the sane-value policy excludes
    st.sampled_from([float("nan"), 1e16, -3e17]),
)
ev_type_st = st.one_of(st.none(), st.sampled_from(["view", "click"]))


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(ev_type_st, ev_value_st), max_size=12))
def test_events_volume_oracle_matches_python_reference(rows):
    q2 = Decimal(1).scaleb(-2)
    groups: dict = defaultdict(lambda: [0, 0, 0])
    for etype, value in rows:
        g = groups[etype]
        g[0] += 1
        # the sane-value policy: NaN / |v| >= 1e15 are unaccountable —
        # excluded from BOTH n_value and the cents mass
        if value is None or math.isnan(value) or abs(value) >= 1e15:
            continue
        g[1] += 1
        # DECIMAL(18,2) cast: shortest-repr parse + HALF_UP (the
        # BigDecimal convention both engines implement)
        g[2] += int(
            Decimal(repr(value)).quantize(q2, rounding=ROUND_HALF_UP) * 100
        )
    ref = [
        (etype, nd, nv, float(cents) / 100)
        for etype, (nd, nv, cents) in groups.items()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    if rows:
        con.executemany(
            "INSERT INTO events VALUES (?, NULL, 1, ?, ?, NULL)",
            [(i, t, v) for i, (t, v) in enumerate(rows)],
        )
    got = [tuple(r) for r in con.sql(o_volume_card()).fetchall()]
    assert _nsort(got) == _nsort(ref)


# ---------------------------------------------------------------------------
# dup_similarity_histogram oracle vs python reference (the exact-jaccard
# pair chain incl. the stop-shingle df cutoff, plus the micro binning)
# ---------------------------------------------------------------------------

from etl_staging_spark.llmdata.dedup import MAX_SHINGLE_DF
from etl_staging_spark.queries.catalog_llm import o_dup_similarity_histogram

ds_word_st = st.sampled_from(["x", "y", "z", "w"])
ds_text_st = st.one_of(
    st.none(), st.lists(ds_word_st, max_size=6).map(" ".join)
)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.tuples(ds_text_st, source_st), max_size=10),
    st.sampled_from([0.2, 0.5]),
    st.booleans(),
)
def test_dup_similarity_histogram_oracle_matches_python_reference(
    rows, threshold, flood
):
    if flood:
        # a shingle in > MAX_SHINGLE_DF docs must be STOP-FILTERED: the
        # flooded docs then carry zero shingles and form no pairs —
        # without the cutoff they would add C(67,2) bin-10 pairs
        rows = rows + [("c1 c2 c3", "z")] * (MAX_SHINGLE_DF + 3)
    shingles: dict = {}
    for i, (text, _src) in enumerate(rows):
        if text is None:
            continue
        toks = text.lower().split(" ")
        if len(toks) < 3:
            continue
        shingles[i] = {
            " ".join(toks[j : j + 3]) for j in range(len(toks) - 2)
        }
    df_count: dict = defaultdict(int)
    for sh in shingles.values():
        for g in sh:
            df_count[g] += 1
    kept = {
        i: {g for g in sh if df_count[g] <= MAX_SHINGLE_DF}
        for i, sh in shingles.items()
    }
    sizes = {i: len(sh) for i, sh in kept.items() if sh}
    bins: dict = defaultdict(int)
    ids = sorted(sizes)
    for a_i, d1 in enumerate(ids):
        for d2 in ids[a_i + 1 :]:
            common = len(kept[d1] & kept[d2])
            if common == 0:
                continue
            j = float(common) / (sizes[d1] + sizes[d2] - common)
            if j >= threshold:
                je6 = int(math.floor(j * 1000000 + 0.5))
                bins[je6 // 100000] += 1
    ref = [
        (b, float(b) / 10.0, n) for b, n in bins.items()
    ]
    con = _docs_con(rows)
    got = [
        tuple(r)
        for r in con.sql(o_dup_similarity_histogram(threshold)).fetchall()
    ]
    assert _nsort(got) == _nsort(ref)


# ---------------------------------------------------------------------------
# r14 new builds: concentration / boilerplate-topk / decontam-rate oracles
# vs pure-python references
# ---------------------------------------------------------------------------

from etl_staging_spark.llmdata.hashing import (  # noqa: E402
    BAND_ROWS,
    MERSENNE31,
    MINHASH_SEEDS,
    N_BANDS,
    py_hash56,
)
from etl_staging_spark.queries.catalog_llm import (  # noqa: E402
    o_boilerplate_ngrams_topk,
    o_decontam_rate_by_source,
    o_source_concentration_card,
)


@settings(max_examples=120, deadline=None)
@given(st.lists(st.tuples(rich_text_st, nullable_source_st), max_size=12))
def test_source_concentration_oracle_matches_python_reference(rows):
    groups: dict = defaultdict(lambda: [0, 0])
    for text, src in rows:
        g = groups[src]
        g[0] += 1
        if text is not None:
            g[1] += _bpe_count(text)
    con = _docs_con(rows)
    got = [
        tuple(r) for r in con.sql(o_source_concentration_card()).fetchall()
    ]
    if not rows:
        assert got == []
        return
    n_docs = sum(g[0] for g in groups.values())
    n_tok = sum(g[1] for g in groups.values())
    d2 = sum(g[0] * g[0] for g in groups.values())
    t2 = sum(g[1] * g[1] for g in groups.values())
    # dominant source: tokens desc, docs desc, source ASC NULLS LAST
    top_src = sorted(
        groups.items(),
        key=lambda kv: (
            -kv[1][1], -kv[1][0], kv[0] is None, kv[0] or ""
        ),
    )[0]
    ref = [(
        len(groups), n_docs, n_tok,
        py_pround(float(d2) / (float(n_docs) * float(n_docs)), 6),
        py_pround(float(t2) / (float(n_tok) * float(n_tok)), 6)
        if n_tok > 0 else None,
        top_src[0],
        py_pround(float(top_src[1][0]) / float(n_docs), 6),
        py_pround(float(top_src[1][1]) / float(n_tok), 6)
        if n_tok > 0 else None,
    )]
    assert _nsort(got) == _nsort(ref)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.tuples(rich_text_st, nullable_source_st), max_size=12),
    st.integers(1, 5),
    st.integers(2, 3),
)
def test_boilerplate_topk_oracle_matches_python_reference(rows, k, n):
    per: dict = defaultdict(int)
    for i, (text, _src) in enumerate(rows):
        if text is None:
            continue
        toks = text.lower().split(" ")
        for j in range(len(toks) - n + 1):
            per[(i, " ".join(toks[j:j + n]))] += 1
    grams: dict = defaultdict(lambda: [0, 0])
    for (_doc, gram), occ in per.items():
        grams[gram][0] += 1
        grams[gram][1] += occ
    ranked = sorted(
        grams.items(), key=lambda kv: (-kv[1][0], -kv[1][1], kv[0])
    )[:k]
    ref = [
        (r + 1, gram, nd, occ)
        for r, (gram, (nd, occ)) in enumerate(ranked)
    ]
    con = _docs_con(rows)
    got = [
        tuple(r)
        for r in con.sql(o_boilerplate_ngrams_topk(k, n)).fetchall()
    ]
    assert _nsort(got) == _nsort(ref)


def _py_shingle_hashes(text, n=3):
    toks = text.lower().split(" ")
    return {
        py_hash56(" ".join(toks[j:j + n]))
        for j in range(len(toks) - n + 1)
    }


def _py_bands(hs):
    mins = [
        min((a * (h % MERSENNE31) + b) % MERSENNE31 for h in hs)
        for a, b in MINHASH_SEEDS
    ]
    return [
        (band, ",".join(str(mins[band * BAND_ROWS + r])
                        for r in range(BAND_ROWS)))
        for band in range(N_BANDS)
    ]


# word pool small enough that near-dups of the eval doc actually occur
decon_word_st = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
decon_text_st = st.one_of(
    st.none(), st.lists(decon_word_st, min_size=0, max_size=8).map(" ".join)
)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(decon_text_st, nullable_source_st), max_size=12))
def test_decontam_rate_oracle_matches_python_reference(rows):
    """Full-ladder python reference: exact 5-gram set collision AND the
    real MinHash-LSH candidate gate + exact 3-gram-Jaccard >= 0.8
    verify (an LSH miss must count as clean in the reference too),
    rolled up per source at the %20 split."""
    bench5: set = set()
    bench_sh: dict = {}
    for i, (text, _src) in enumerate(rows):
        if i % 20 == 0 and text is not None:
            toks = text.lower().split(" ")
            bench5 |= {
                " ".join(toks[j:j + 5]) for j in range(len(toks) - 4)
            }
            sh = _py_shingle_hashes(text)
            if sh:
                bench_sh[i] = (sh, set(_py_bands(sh)))
    groups: dict = defaultdict(lambda: [0, 0, 0, 0])
    for i, (text, src) in enumerate(rows):
        if i % 20 == 0:
            continue
        g = groups[src]
        g[0] += 1
        ex = fz = False
        if text is not None:
            toks = text.lower().split(" ")
            ex = any(
                " ".join(toks[j:j + 5]) in bench5
                for j in range(len(toks) - 4)
            )
            sh = _py_shingle_hashes(text)
            if sh:
                bands = set(_py_bands(sh))
                for bsh, bbands in bench_sh.values():
                    if not (bands & bbands):
                        continue  # LSH gate: no band collision, no pair
                    inter = len(sh & bsh)
                    if inter / (len(sh) + len(bsh) - inter) >= 0.8:
                        fz = True
                        break
        g[1] += 1 if ex else 0
        g[2] += 1 if fz else 0
        g[3] += 1 if (ex or fz) else 0
    ref = [
        (src, nd, ex, fz, fl, py_pround(fl / nd, 6))
        for src, (nd, ex, fz, fl) in groups.items()
    ]
    con = _docs_con(rows)
    got = [
        tuple(r) for r in con.sql(o_decontam_rate_by_source()).fetchall()
    ]
    assert _nsort(got) == _nsort(ref)


# ---------------------------------------------------------------------------
# embedding_dim_stats oracle vs python reference (decimal-quantized mean,
# NULL-vector / NULL-element exclusion, ragged dims)
# ---------------------------------------------------------------------------

from decimal import ROUND_HALF_UP, Decimal  # noqa: E402

from etl_staging_spark.queries.catalog_llm import (  # noqa: E402
    o_embedding_dim_stats,
)

f32_exact_st = st.sampled_from(
    [-3.0, -1.5, -0.75, -0.25, 0.0, 0.25, 0.5, 1.0, 2.5]
)
# NOT vec_st: that name is the embedding_stats strategy above
dim_vec_st = st.one_of(
    st.none(),
    st.lists(st.one_of(st.none(), f32_exact_st), min_size=0, max_size=4),
)


@settings(max_examples=100, deadline=None)
@given(st.lists(dim_vec_st, max_size=10))
def test_embedding_dim_stats_oracle_matches_python_reference(vecs):
    import duckdb

    dims: dict = defaultdict(list)
    for v in vecs:
        if v is None or any(x is None for x in v):
            continue
        for d, x in enumerate(v):
            dims[d].append(x)
    ref = []
    for d, xs in dims.items():
        q = sum(
            Decimal(str(x)).quantize(Decimal("1e-15"), ROUND_HALF_UP)
            for x in xs
        )
        mean = py_pround(float(q) / len(xs), 6)
        lo, hi = min(xs), max(xs)
        ref.append(
            (d, len(xs), lo, hi, mean,
             py_pround(max(abs(lo), abs(hi)) / 127.0, 6))
        )
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding DOUBLE[],"
        " label INTEGER)"
    )
    if vecs:
        con.executemany(
            "INSERT INTO embeddings VALUES (?, ?, ?)",
            [(i, v, 0) for i, v in enumerate(vecs)],
        )
    got = [tuple(r) for r in con.sql(o_embedding_dim_stats()).fetchall()]
    assert _nsort(got) == _nsort(ref)


# ---------------------------------------------------------------------------
# decontam_matrix oracle vs python reference (exact rung, %40 split,
# zero cells reported, NULL-source audit row)
# ---------------------------------------------------------------------------

from etl_staging_spark.queries.catalog_llm import o_decontam_matrix  # noqa: E402

dm_word_st = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"])
dm_text_st = st.one_of(
    st.none(), st.lists(dm_word_st, min_size=0, max_size=8).map(" ".join)
)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.tuples(dm_text_st, nullable_source_st), max_size=25)
)
def test_decontam_matrix_oracle_matches_python_reference(rows):
    def fives(text):
        toks = text.lower().split(" ")
        return {
            " ".join(toks[j:j + 5]) for j in range(len(toks) - 4)
        }

    bench_sets: dict = {}
    for i, (text, _src) in enumerate(rows):
        m = i % 40
        if m in (0, 20):
            label = "holdout_a" if m == 0 else "holdout_b"
            if text is not None:
                bench_sets.setdefault(label, set()).update(fives(text))
            else:
                bench_sets.setdefault(label, set())
    srcs: dict = defaultdict(lambda: [0, defaultdict(int)])
    for i, (text, src) in enumerate(rows):
        if i % 40 in (0, 20):
            continue
        g = srcs[src]
        g[0] += 1
        if text is not None:
            sh = fives(text)
            for label, bs in bench_sets.items():
                if sh & bs:
                    g[1][label] += 1
    ref = [
        (src, label, nd, fl.get(label, 0),
         py_pround(fl.get(label, 0) / nd, 6))
        for src, (nd, fl) in srcs.items()
        for label in bench_sets
    ]
    con = _docs_con(rows)
    got = [tuple(r) for r in con.sql(o_decontam_matrix()).fetchall()]
    assert _nsort(got) == _nsort(ref)


# ---------------------------------------------------------------------------
# snapshot_drift_card oracle vs python reference (even/odd split, NULL
# quality for NULL text, appearing/disappearing sources, NULL bucket)
# ---------------------------------------------------------------------------

from etl_staging_spark.queries.catalog_llm import (  # noqa: E402
    o_snapshot_drift_card,
)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(rich_text_st, nullable_source_st), max_size=14))
def test_snapshot_drift_oracle_matches_python_reference(rows):
    sides: dict = {0: defaultdict(lambda: [0, 0, 0, [], 0]), 1: defaultdict(lambda: [0, 0, 0, [], 0])}
    for i, (text, src) in enumerate(rows):
        g = sides[i % 2][src]
        g[0] += 1
        if text is None:
            g[1] += 1
        else:
            g[2] += _bpe_count(text)
            g[3].append(_py_quality(text))
    def stats_of(g):
        if g is None:
            return (None,) * 5
        nd, nulls, tok, qs, _ = g
        rate = py_pround(nulls / nd, 6) if nd > 0 else None
        ml = py_pround(tok / (nd - nulls), 6) if nd - nulls > 0 else None
        mq = None
        if qs:
            q6 = Decimal("1e-6")
            acc = sum(Decimal(repr(q)).quantize(q6, ROUND_HALF_UP) for q in qs)
            mq = py_pround(float(acc) / len(qs), 6)
        return (nd, rate, ml, mq, len(qs))
    def delta(a, b):
        return py_pround(b - a, 6) if a is not None and b is not None else None
    ref = []
    for src in set(sides[0]) | set(sides[1]):
        od, orate, oml, omq, _ = stats_of(sides[0].get(src))
        nd, nrate, nml, nmq, _ = stats_of(sides[1].get(src))
        ref.append((
            src, od, nd, orate, nrate, delta(orate, nrate),
            oml, nml, delta(oml, nml), omq, nmq, delta(omq, nmq),
        ))
    con = _docs_con(rows)
    got = [tuple(r) for r in con.sql(o_snapshot_drift_card()).fetchall()]
    assert _nsort(got) == _nsort(ref)


# ---------------------------------------------------------------------------
# quality_by_lang oracle vs python reference (lang-ID + quality join,
# NULL-lang row carries NULL-text docs without quality mass)
# ---------------------------------------------------------------------------

from etl_staging_spark.llmdata.textstats import LANG_PROFILES  # noqa: E402
from etl_staging_spark.queries.catalog_llm import o_quality_by_lang  # noqa: E402


def _py_lang(text):
    if text is None:
        return None
    lt = text.lower()
    bg = {lt[i:i + 2] for i in range(len(lt) - 1)}
    scores = {
        lang: len(bg & set(prof)) for lang, prof in LANG_PROFILES.items()
    }
    best = max(scores.values(), default=0)
    if best == 0:
        return None
    return min(l for l, s in scores.items() if s == best)


ql_word_st = st.sampled_from(
    ["the", "der", "und", "and", "le", "la", "99", "x"]
)
ql_text_st = st.one_of(
    st.none(), st.lists(ql_word_st, max_size=6).map(" ".join)
)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(ql_text_st, source_st), max_size=12))
def test_quality_by_lang_oracle_matches_python_reference(rows):
    groups: dict = defaultdict(lambda: [0, [], 0])
    for text, _src in rows:
        lang = _py_lang(text)
        g = groups[lang]
        g[0] += 1
        if text is not None:
            q = _py_quality(text)
            g[1].append(q)
            g[2] += 1 if q < 0.5 else 0
    q6 = Decimal("1e-6")
    ref = []
    for lang, (nd, qs, low) in groups.items():
        mq = lowr = None
        if qs:
            acc = sum(Decimal(repr(q)).quantize(q6, ROUND_HALF_UP) for q in qs)
            mq = py_pround(float(acc) / len(qs), 6)
            lowr = py_pround(low / len(qs), 6)
        ref.append((lang, nd, mq, low, lowr))
    con = _docs_con(rows)
    got = [tuple(r) for r in con.sql(o_quality_by_lang(0.5)).fetchall()]
    assert _nsort(got) == _nsort(ref)


# ---------------------------------------------------------------------------
# cluster_balanced_sample oracle vs python reference (assignment chain +
# uniform mixture_rates integer chain + md5 bucket keep rule)
# ---------------------------------------------------------------------------

from etl_staging_spark.queries.catalog_llm import o_cluster_balanced_sample


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.tuples(cl_vec_st, cl_label_st), min_size=1, max_size=12),
    st.integers(1, 3),
    st.integers(1, 8),
)
def test_cluster_balanced_sample_oracle_matches_python_reference(
    rows, k, target
):
    """Replays the full keep decision in python: decimal-dot cell
    assignment (ties to the lower centroid id), per-cell counts, the
    uniform mixture_rates chain ((target * 1) / n_cells quota,
    min-capped rate, int-truncated bucket threshold), and the salted
    md5 bucket rule — per-cell kept counts must equal the DuckDB
    oracle's."""
    from etl_staging_spark.llmdata.hashing import py_hash56
    from etl_staging_spark.llmdata.sampling import BUCKETS, mixture_rates

    cents = {i: v for i, (v, _) in enumerate(rows) if i < k}
    norms = {i: _pdn(v) for i, (v, _) in enumerate(rows)}
    assign = {}
    for i, (v, _label) in enumerate(rows):
        cands = [
            (_py_decimal_dot(v, cv) / (norms[i] * norms[cid]), cid)
            for cid, cv in cents.items()
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        assign[i] = cands[0][1]
    counts: dict = defaultdict(int)
    for cell in assign.values():
        counts[cell] += 1
    thr = mixture_rates(dict(counts), {c: 1 for c in counts}, target)
    kept: dict = defaultdict(int)
    for i, cell in assign.items():
        if py_hash56(f"cellmix-v1:{i}") % BUCKETS < thr[cell]:
            kept[cell] += 1
    ref = sorted((cell, n) for cell, n in kept.items())
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[],"
        " label INTEGER)"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?, CAST(? AS FLOAT[]), ?)",
        [(i, v, s) for i, (v, s) in enumerate(rows)],
    )
    got = sorted(
        tuple(r) for r in con.sql(o_cluster_balanced_sample(k, target)).fetchall()
    )
    assert got == ref
