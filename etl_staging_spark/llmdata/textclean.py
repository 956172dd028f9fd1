"""Corpus text normalization: the cleaning pass every web-scale
pipeline runs BEFORE dedup and quality scoring (the CCNet/RefinedWeb
convention) — strip invisible characters, normalize exotic whitespace,
collapse runs — so that two visually-identical documents hash
identically and length/ratio features measure content, not encoding
noise.

Scale design: the whole pass is a chain of ``regexp_replace`` /
``translate`` expressions — JVM-side, whole-stage-codegen'd, one
projection over the corpus scan with zero shuffles and zero Python.
Every pattern is written with EXPLICIT code points (no ``\\p{..}``
property classes), so the Java regex engine and DuckDB's RE2 agree
byte-for-byte and the pass is oracle-checkable cross-engine; the
pattern constants below are importable so an oracle twin interpolates
the SAME class strings instead of retyping them.

What it deliberately does NOT do: full Unicode NFC/NFKC normalization
(needs ICU — neither a Spark SQL builtin nor deterministic across
engines) and lossy case/accent folding, which belongs in
:func:`fold_key` for hash keys only, never in the stored text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The classes below are ASCII-only pattern TEXT using the \x{hhhh}
# escape, which Java regex and DuckDB RE2 parse identically — no raw
# control bytes travel through py4j or SQL literals, and an oracle
# twin interpolates the same constants verbatim.
# Invisible characters with no rendering width: zero-width space /
# non-joiner / joiner (U+200B..200D), word joiner (U+2060), BOM /
# ZWNBSP (U+FEFF). Deleted outright.
ZERO_WIDTH_CLASS = r"[\x{200b}-\x{200d}\x{2060}\x{feff}]"
# C0 control characters except \t (09), \n (0A) and \r (0D — handled
# first so CRLF becomes a plain newline, not a deleted char), plus DEL.
CONTROL_CLASS = r"[\x{0000}-\x{0008}\x{000b}\x{000c}\x{000e}-\x{001f}\x{007f}]"
# Exotic horizontal whitespace -> ASCII space: NBSP (U+00A0), ogham
# mark (U+1680), the en/em family (U+2000..200A), narrow NBSP (U+202F),
# math space (U+205F), ideographic space (U+3000), plus tab.
UNI_SPACE_CLASS = r"[\x{00a0}\x{1680}\x{2000}-\x{200a}\x{202f}\x{205f}\x{3000}\t]"

# Latin-1 accent fold map for hash keys (lossy, hence key-only).
ACCENT_SRC = (
    "\u00e0\u00e1\u00e2\u00e3\u00e4\u00e5"  # a-grave..a-ring
    "\u00e7"                                  # c-cedilla
    "\u00e8\u00e9\u00ea\u00eb"                  # e family
    "\u00ec\u00ed\u00ee\u00ef"                  # i family
    "\u00f1"                                  # n-tilde
    "\u00f2\u00f3\u00f4\u00f5\u00f6"              # o family
    "\u00f9\u00fa\u00fb\u00fc"                  # u family
    "\u00fd\u00ff"                              # y family
)
ACCENT_DST = "aaaaaaceeeeiiiinooooouuuuyy"


# The full chain as ONE importable (pattern, replacement) table — the
# Spark fold and the DuckDB oracle twin both interpolate it, so a chain
# edit can never silently diverge the engines. Patterns are ASCII
# regex TEXT (escape sequences like \r, \n, \x{hhhh} parsed identically
# by Java regex and RE2); replacements are ACTUAL characters (Java and
# RE2 disagree on replacement-string escapes, so none are used).
CLEAN_STEPS: tuple[tuple[str, str], ...] = (
    (r"\r\n?", "\n"),                  # 1. CRLF / lone CR -> LF
    (ZERO_WIDTH_CLASS, ""),            # 2. zero-width deleted
    (CONTROL_CLASS, ""),               # 3. control chars deleted
    (UNI_SPACE_CLASS, " "),            # 4. unicode spaces/tabs -> space
    ("  +", " "),                      # 5. space runs collapsed
    (r" *\n *", "\n"),                 # 6. newline-hugging spaces out
    (r"\n\n\n+", "\n\n"),              # 7. 3+ newlines -> paragraph
    (r"^[ \n]+|[ \n]+$", ""),          # 8. ends trimmed
)


def clean_text(col: Column) -> Column:
    """The normalization chain (:data:`CLEAN_STEPS`, in order) over one
    string column: CRLF/CR -> LF, zero-width and control characters
    deleted, exotic unicode spaces and tabs -> ASCII space, space runs
    collapsed, newline-hugging spaces trimmed, 3+ newlines squeezed to
    a paragraph break, ends trimmed. NULL propagates (a NULL doc stays
    NULL, the textstats convention)."""
    c = col
    for pat, rep in CLEAN_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return c


def o_clean_sql(expr: str) -> str:
    """DuckDB spelling of the SAME chain: nested ``regexp_replace(...,
    'g')`` built from :data:`CLEAN_STEPS`, replacement characters
    rendered as e-string escapes — an oracle twin interpolates this
    instead of retyping the eight steps."""
    sql = expr
    for pat, rep in CLEAN_STEPS:
        rep_sql = "e'" + rep.replace("\\", "\\\\").replace("\n", "\\n") + "'"
        sql = f"regexp_replace({sql}, '{pat}', {rep_sql}, 'g')"
    return sql


def fold_key(col: Column, pre_cleaned: bool = False) -> Column:
    """Lossy fold for EXACT-DEDUP HASH KEYS: :func:`clean_text`, then
    lowercase and a fixed Latin-1 accent translation — so "Caf\u00e9 X"
    and "cafe x" land in the same hash group. Key-derivation only; the
    stored text keeps its case and accents. ``pre_cleaned`` skips the
    8-regex normalization when the caller already ran it (clean_text
    is idempotent — the fixed-point test — so this changes cost, never
    the key)."""
    base = col if pre_cleaned else clean_text(col)
    return F.translate(F.lower(base), ACCENT_SRC, ACCENT_DST)


def with_clean_text(
    df: DataFrame, text_col: str = "text", out: str = "text"
) -> DataFrame:
    """Replace (or add, with ``out``) the normalized text column ---
    the projection a pipeline runs before hashing/scoring stages."""
    return df.withColumn(out, clean_text(F.col(text_col)))


def clean_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc cleaning report card: (doc_id, n_raw_chars,
    n_clean_chars, n_removed, changed) — the audit frame a pipeline
    owner reads to see how much encoding noise each source carries
    before committing to the cleaned corpus. NULL-text docs report
    NULL lengths and ``changed = false`` (nothing to clean). One
    codegen'd projection, no shuffle."""
    raw = F.col(text_col)
    cleaned = clean_text(raw)
    n_raw = F.length(raw)
    n_clean = F.length(cleaned)
    return docs.select(
        "doc_id",
        n_raw.cast("bigint").alias("n_raw_chars"),
        n_clean.cast("bigint").alias("n_clean_chars"),
        (n_raw - n_clean).cast("bigint").alias("n_removed"),
        F.coalesce(raw != cleaned, F.lit(False)).alias("changed"),
    )
