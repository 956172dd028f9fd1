"""The ledger fact: account_move_line mapped onto the driver tables.

The reference's single central fact is ``account_move_line`` (SURVEY
§1.2). The driver ships TPC-H-ish tables, so the engine layer derives a
move-line-shaped fact from lineitem ⋈ orders:

| ledger column    | derivation                                        |
|------------------|---------------------------------------------------|
| id               | l_orderkey * 8 + l_linenumber (linenumber <= 7)   |
| move_id          | l_orderkey                                        |
| date             | o_orderdate                                       |
| partner_id       | o_custkey                                         |
| company_id       | l_suppkey % 3                                     |
| account_code     | (1 + l_partkey % 8) || lpad(l_partkey % 100, 2)   |
| balance          | ±l_extendedprice * (1 - l_discount), negative on  |
|                  | returned lines (l_returnflag = 'R')               |
| tag_name         | o_orderpriority                                   |
| tag_sign         | '+' on even line numbers, '-' on odd              |
| tax_tag_invert   | l_returnflag = 'R'                                |

Account classes: first code digit 1..8; classes 1-5 are balance-sheet
(include_initial_balance = true), 6-8 are P&L — mirroring the
reference's account_type split used by date-scope 'normal' and the
unaffected-earnings fold.

``conv`` is the currency-converted per-row amount
SUM-able exactly: ROUND(CAST(balance AS DECIMAL(18,6)) * rate, 2),
the reference's "round per row before summing" convention
(`account_report.py:2563`). Rates come from a 3-row company rate
table — broadcast in every plan.

The DuckDB oracle twin of this mapping is ``O_LEDGER`` — every engine
oracle builds on it, so engine results are hash-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load

RATES = [(0, "1.00"), (1, "1.10"), (2, "1.25")]


def rate_table(spark: SparkSession) -> DataFrame:
    rows = [(cid, r) for cid, r in RATES]
    return spark.createDataFrame(rows, "company_id int, rate_str string").select(
        "company_id", F.col("rate_str").cast("decimal(6,2)").alias("rate")
    )


_LEDGER_CACHE: dict = {}

# Parallelism posture of heavy SINGLE-PASS fact aggregates (r16, guide
# §2.5 "input skew — one huge unsplittable file"): the test parquet
# files are ONE row group, so a scan-stage map side runs on one core no
# matter the cluster width. Spreading the scan rows helps ONLY when the
# per-row map work dominates the extra full-width exchange — measured
# true for a1_hash_agg's 4-decimal-sum pass (−27%), and measured FALSE
# for the move_lines consumers (tools/ab_respread.py interleaved A/B:
# +19% net — their partial aggregates already collapse rows before any
# exchange, and the engine reports re-pay the respread shuffle on every
# per-scope collect job). So the flag gates the few single-pass heavy
# consumers (a1), NOT the shared ledger frame. Module flag (not a conf)
# so tools/ab_respread.py can interleave both arms in one session.
SPREAD_FACT = True


def move_lines(
    spark: SparkSession, sf_dir: str, spread: bool = False
) -> DataFrame:
    """The ledger fact. Filters applied by engines push down through
    this projection into both parquet scans (verified via .explain).
    Memoized per (session, dir) like tables.load — the frame is lazy and
    immutable, and every engine entry starts from it.

    ``spread=True`` (opt-in per consumer): keyed respread of the
    lineitem side BELOW the broadcast join, so the join + decimal conv
    + the consumer's predicate/aggregate map side run cluster-wide
    instead of on the single task a one-row-group scan yields. Keys are
    two columns every consumer already scans, so the spread widens
    nothing; no-op at real scale (respread_narrow's split guard). Only
    for SINGLE-JOB heavy-map consumers — multi-collect engines re-pay
    the exchange per job and measured slower (tools/ab_respread.py)."""
    # The built plan depends on the EFFECTIVE spread (spread and
    # SPREAD_FACT), not the argument alone — keying on the argument let a
    # cached spread frame be returned after SPREAD_FACT was flipped off
    # (tools/ab_respread.py's arms timed the same plan; ADVICE r16).
    key = (spark, sf_dir, spread and SPREAD_FACT)
    cached = _LEDGER_CACHE.get(key)
    if cached is not None:
        return cached
    li = load(spark, sf_dir, "lineitem")
    if spread and SPREAD_FACT:
        from ..tables import respread_narrow

        li = respread_narrow(li, ("l_orderkey", "l_partkey"))
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_custkey", "o_orderpriority"
    )
    sign = F.when(F.col("l_returnflag") == "R", F.lit(-1)).otherwise(F.lit(1))
    led = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("id"),
            F.col("l_orderkey").alias("move_id"),
            F.col("o_orderdate").alias("date"),
            F.col("o_custkey").alias("partner_id"),
            (F.col("l_suppkey") % 3).alias("company_id"),
            F.concat(
                (1 + F.col("l_partkey") % 8).cast("string"),
                F.lpad((F.col("l_partkey") % 100).cast("string"), 2, "0"),
            ).alias("account_code"),
            (sign * F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("balance"),
            F.col("o_orderpriority").alias("tag_name"),
            F.when(F.col("l_linenumber") % 2 == 0, "+").otherwise("-").alias("tag_sign"),
            (F.col("l_returnflag") == "R").alias("tax_tag_invert"),
        )
    )
    conv = F.round(F.col("balance").cast("decimal(18,6)") * F.col("rate"), 2)
    out = led.join(F.broadcast(rate_table(spark)), "company_id").withColumn("conv", conv)
    _LEDGER_CACHE[key] = out
    return out


def is_balance_sheet(code_col=None) -> F.Column:
    c = code_col if code_col is not None else F.col("account_code")
    return F.substring(c, 1, 1).cast("int") <= 5


_RATE_ROWS = ", ".join(f"({cid}, CAST({r} AS DECIMAL(6,2)))" for cid, r in RATES)

# DuckDB oracle twin. `led` has the same columns as move_lines(),
# including the exact-decimal `conv`.
O_LEDGER = f"""
ledger AS (
  SELECT l.l_orderkey * 8 + l.l_linenumber AS id,
         l.l_orderkey AS move_id,
         o.o_orderdate AS date,
         o.o_custkey AS partner_id,
         l.l_suppkey % 3 AS company_id,
         CAST(1 + l.l_partkey % 8 AS VARCHAR)
           || lpad(CAST(l.l_partkey % 100 AS VARCHAR), 2, '0') AS account_code,
         (CASE WHEN l.l_returnflag = 'R' THEN -1 ELSE 1 END)
           * l.l_extendedprice * (1 - l.l_discount) AS balance,
         o.o_orderpriority AS tag_name,
         CASE WHEN l.l_linenumber % 2 = 0 THEN '+' ELSE '-' END AS tag_sign,
         (l.l_returnflag = 'R') AS tax_tag_invert
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
rates AS (SELECT * FROM (VALUES {_RATE_ROWS}) AS r(company_id, rate)),
led AS (
  SELECT ledger.*,
         ROUND(CAST(balance AS DECIMAL(18,6)) * rate, 2) AS conv
  FROM ledger JOIN rates USING (company_id)
)"""
