"""All-reports x all-export-formats generation smoke — the analog of
the reference's `test_all_reports_generation.py` (116 LoC: render every
report variant in every export format, assert no crash). Every
assembled-report catalog entry runs at sf0.001 and exports as styled
xlsx, report HTML, CSV and (where 1-key-1-value shaped) the dashboard
JSON sink; each artifact must exist and be structurally non-trivial."""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR as SF_DIR_SMOKE

REPORT_ENTRIES = [
    "gl_report",
    "gl_report_detail",
    "tb_report",
    "pl_report",
    "aged_report",
    "jr_report",
    "mc_report",
    "es_report",
    "br_report",
    "analytic_report",
    "hier_rollup",
    "hg_column_groups",
    "fy_period_shift",
    "mc_company_scope",
    "tax_closing",
    "sr_sales_register",
    "pr_purchase_register",
    "hsn_summary",
    "sa_stock_ageing",
    "pp_production_planning",
]


def _lines_from_df(df):
    cols = df.columns
    out = []
    for i, row in enumerate(df.limit(200).collect()):
        cells = []
        name = None
        for c in cols:
            v = row[c]
            if name is None and isinstance(v, str):
                name = v
                continue
            cells.append({"no_format": v if v is not None else ""})
        out.append(
            {"id": f"l{i}", "name": name or f"row {i}", "level": 1,
             "columns": cells}
        )
    return cols, out


@pytest.mark.parametrize("name", REPORT_ENTRIES)
def test_report_exports_all_formats(name, spark, tmp_path):
    from etl_staging_spark.etl.sinks import write_csv
    from etl_staging_spark.etl.xlsx import write_register_xlsx
    from etl_staging_spark.reports.html import write_report_html

    qs = entrymod.queries()
    assert name in qs, f"{name} missing from registry"
    df = qs[name](spark, SF_DIR_SMOKE)
    assert df.columns, name

    xlsx = str(tmp_path / f"{name}.xlsx")
    summary = write_register_xlsx(df.limit(200), xlsx, title=name)
    assert os.path.getsize(xlsx) > 500
    assert isinstance(summary.get("totals"), dict)

    cols, lines = _lines_from_df(df)
    html = str(tmp_path / f"{name}.html")
    write_report_html(html, name, cols, lines, figure_type="monetary")
    text = open(html, encoding="utf-8").read()
    assert "<table" in text and name in text
    assert os.path.getsize(html) > 300

    csv_dir = str(tmp_path / f"{name}_csv")
    write_csv(df.limit(200), csv_dir)
    produced = []
    for root, _, files in os.walk(csv_dir):
        produced += [f for f in files if f.endswith(".csv")]
    assert produced, name

    # PDF leg (r13): every report also exports as a real PDF through
    # the dependency-free writer — structurally valid (header/EOF) and
    # carrying the title in its uncompressed stream
    from etl_staging_spark.reports.html import export_pdf

    pdf_path = str(tmp_path / f"{name}.pdf")
    export_pdf(pdf_path, name, cols, lines, figure_type="monetary")
    pdf = open(pdf_path, "rb").read()
    assert pdf.startswith(b"%PDF-1.4") and pdf.rstrip().endswith(b"%%EOF")
    assert f"({name}".encode() in pdf, name
    # the DATA made it, not just the chrome: strictly more text ops
    # than the PER-PAGE title+header chrome plus one name op per row —
    # i.e. at least one VALUE cell rendered. Guards the r13 review's
    # empty-PDF regression (apply_colspans used to merge away
    # no_format-only cells); the chrome term is page-aware because the
    # writer re-draws title and headers on every page, which would
    # otherwise inflate a value-less multi-page PDF past a flat
    # single-page threshold.
    n_value_cells = sum(len(l.get("columns") or []) for l in lines)
    if n_value_cells:
        n_pages = pdf.count(b"/Type /Page ")
        chrome = n_pages * (1 + len(cols))
        assert pdf.count(b" Tj ET") > chrome + len(lines), name


def test_dataset_card_assembles_and_exports(spark, tmp_path):
    """The assembled DATASET CARD: every section present, the corpus
    totals equal the concentration card's certified numbers, the
    per-source doc counts sum to the corpus, and both HTML and PDF
    exports render non-trivially (the PDF through the dependency-free
    writer)."""
    import os

    from etl_staging_spark.llmdata import stats
    from etl_staging_spark.reports.dataset_card import (
        HEADERS,
        dataset_card_lines,
        export_dataset_card,
    )

    sf = "/root/testdata/sf0.001"
    lines = dataset_card_lines(spark, sf)
    sections = [l["name"] for l in lines if l["level"] == 0]
    assert sections[0] == "Corpus"
    for want in ("Sources", "Duplication", "PII incidence",
                 "Boilerplate (most widespread 3-grams)",
                 "Topic cells (IVF)"):
        assert want in sections, sections
    assert any(s.startswith("Quality") for s in sections)
    assert any(s.startswith("Truncation loss") for s in sections)

    # topic cells mirror the certified cluster_profile numbers
    from etl_staging_spark.llmdata import simsearch

    prof = sorted(
        simsearch.cluster_profile(
            spark.read.parquet(f"{sf}/embeddings.parquet")
        ).collect(),
        key=lambda r: r.cell,
    )
    def _section_rows(title_prefix):
        tops = [j for j, l in enumerate(lines) if l["level"] == 0]
        (ti,) = [
            k for k, j in enumerate(tops)
            if lines[j]["name"].startswith(title_prefix)
        ]
        lo = tops[ti] + 1
        hi = tops[ti + 1] if ti + 1 < len(tops) else len(lines)
        return [l for l in lines[lo:hi] if l["level"] == 1]

    cells = _section_rows("Topic cells (IVF)")
    assert len(cells) == len(prof)
    for line, r in zip(cells, prof):
        assert line["name"] == f"cell {r.cell}"
        assert line["columns"][0]["no_format"] == r.n_members
        assert line["columns"][2]["no_format"] == r.share

    # the suggested-reweight section mirrors the certified
    # cluster-share mixture card at the half-corpus target
    n_docs_total = lines[0]["columns"][0]["no_format"]
    mix = sorted(
        simsearch.cluster_share_mixture(
            spark.read.parquet(f"{sf}/documents.parquet").select(
                "doc_id", "source"
            ),
            spark.read.parquet(f"{sf}/embeddings.parquet"),
            max(1, n_docs_total // 2),
        ).collect(),
        key=lambda r: (r.source is None, r.source or ""),
    )
    rew = _section_rows("Suggested reweight")
    assert len(rew) == len(mix) and rew
    for line, r in zip(rew, mix):
        assert line["columns"][0]["no_format"] == r.n_docs
        assert line["columns"][1]["no_format"] == r.n_kept
        assert line["columns"][2]["no_format"] == r.avg_cell_share

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    conc = stats.source_concentration_card(docs).collect()[0]
    corpus_line = lines[0]
    assert corpus_line["columns"][0]["no_format"] == conc.n_docs
    assert corpus_line["columns"][1]["no_format"] == conc.n_tokens
    # per-source docs sum to the corpus
    i = sections.index("Sources")
    start = [j for j, l in enumerate(lines) if l["level"] == 0][i] + 1
    src_docs = 0
    for l in lines[start:]:
        if l["level"] == 0:
            break
        src_docs += l["columns"][0]["no_format"]
    assert src_docs == conc.n_docs

    out = export_dataset_card(spark, sf, str(tmp_path / "card"))
    html = open(out["html"], encoding="utf-8").read()
    assert "Dataset card" in html and "Duplication" in html
    for h in HEADERS:
        assert h in html
    assert os.path.getsize(out["pdf"]) > 2000
    assert open(out["pdf"], "rb").read(5) == b"%PDF-"


def test_dataset_card_empty_corpus_placeholder(spark, tmp_path):
    """An empty documents drop renders a placeholder card, not an
    IndexError from the report entry point (review finding)."""
    import os

    from etl_staging_spark.reports.dataset_card import export_dataset_card

    empty_dir = tmp_path / "sfempty"
    empty_dir.mkdir()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.limit(0).write.parquet(str(empty_dir / "documents.parquet"))
    out = export_dataset_card(spark, str(empty_dir), str(tmp_path / "card"))
    html = open(out["html"], encoding="utf-8").read()
    assert "EMPTY CORPUS" in html
    assert os.path.getsize(out["pdf"]) > 500


def test_dataset_card_embeddings_optional_but_not_swallowed(spark, tmp_path):
    """A release WITHOUT an embeddings table renders the card minus the
    topic section (optional table), but a PRESENT-but-unreadable
    embeddings table must surface its real error — the missing-table
    fallback catches only PATH_NOT_FOUND (review finding)."""
    import pytest as _pytest

    from etl_staging_spark.reports.dataset_card import dataset_card_lines
    from etl_staging_spark.tables import _FRAME_CACHE

    sf_dir = tmp_path / "sfdocsonly"
    sf_dir.mkdir()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.parquet(str(sf_dir / "documents.parquet"))
    lines = dataset_card_lines(spark, str(sf_dir))
    names = [ln["name"] for ln in lines]
    assert len(lines) > 5                       # the card did assemble
    assert not any("Topic cells" in n for n in names)

    # now plant a corrupt embeddings table: the error must PROPAGATE
    emb_dir = sf_dir / "embeddings.parquet"
    emb_dir.mkdir()
    (emb_dir / "part-00000.parquet").write_bytes(b"this is not parquet")
    _FRAME_CACHE.clear()                        # drop the memoized miss
    with _pytest.raises(Exception) as excinfo:
        dataset_card_lines(spark, str(sf_dir))
    assert "PATH_NOT_FOUND" not in str(excinfo.value)
    _FRAME_CACHE.clear()


def test_dataset_card_all_null_source_corpus(spark, tmp_path):
    """A corpus whose source column is entirely NULL still assembles:
    createDataFrame over the collected per-source rows needs the
    explicit schema or type inference fails on the all-None source
    (review finding). The NULL bucket renders under its card label."""
    from pyspark.sql import functions as F

    from etl_staging_spark.reports.dataset_card import dataset_card_lines

    null_dir = tmp_path / "sfnull"
    null_dir.mkdir()
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.limit(50).withColumn("source", F.lit(None).cast("string")).write.parquet(
        str(null_dir / "documents.parquet")
    )
    lines = dataset_card_lines(spark, str(null_dir))
    corpus = [ln for ln in lines if ln["name"] == "Corpus"]
    assert corpus and corpus[0]["columns"][0]["no_format"] == 50
