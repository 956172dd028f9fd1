"""Remaining §2 operators: F2 composite report filter, F5 search-bar
ilike, M4 serial-ledger rebuild.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..domain import and_join
from ..tables import load
from .registry import dsum, o_dsum, query


# ---------------------------------------------------------------------------
# F2: composite report filter — the conjunction of independent filter
# domains (journal/date/partner/posted pipeline,
# account_report.py:1458-1480) composed via and_join.
# ---------------------------------------------------------------------------


@query(
    "f2_composite_filter",
    oracle=f"""
    SELECT o_orderstatus, COUNT(*) AS n, {o_dsum('o_totalprice')} AS amount
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <= TIMESTAMP '1997-12-31 23:59:59'
      AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice > 50000
    GROUP BY o_orderstatus
    """,
)
def f2_composite_filter(spark, sf_dir):
    """Each report filter contributes its own domain; the query applies
    their conjunction — one pushed-down predicate."""
    date_domain = [
        ("o_orderdate", ">=", "1996-01-01"),
        ("o_orderdate", "<=", "1997-12-31 23:59:59"),
    ]
    priority_domain = [("o_orderpriority", "in", ["1-URGENT", "2-HIGH"])]
    amount_domain = [("o_totalprice", ">", 50000)]
    o = load(spark, sf_dir, "orders").where(
        and_join(date_domain, priority_domain, amount_domain)
    )
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("amount")
    )


# ---------------------------------------------------------------------------
# F5: search-bar ilike filter pushed into the sums query
# (account_general_ledger.py:233-234).
# ---------------------------------------------------------------------------


@query(
    "f5_searchbar",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS n, {o_dsum('p_retailprice')} AS total_price
    FROM part
    WHERE lower(p_name) LIKE '%red%'
    GROUP BY p_brand
    """,
)
def f5_searchbar(spark, sf_dir):
    # 'red' occurs in the synthetic part names ('red widget', ...), so the
    # ilike path is actually exercised (the previous 'green' matched 0 rows,
    # making the hash check vacuous).
    dom = [("p_name", "ilike", "red")]
    p = load(spark, sf_dir, "part").where(and_join(dom))
    return p.groupBy("p_brand").agg(
        F.count("*").alias("n"), dsum("p_retailprice").alias("total_price")
    )


# ---------------------------------------------------------------------------
# M4: serial-ledger rebuild — reconstruct each serial's current state
# from its movement history (etl_sale/models/serial.py:708-1026
# action_correct_outs*): the LAST movement decides the state.
# ---------------------------------------------------------------------------


@query(
    "m4_serial_rebuild",
    oracle="""
    WITH tagged AS (
      SELECT l_partkey, l_suppkey,
             strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') || '|' || l_returnflag
                 AS move_tag
      FROM lineitem
    )
    SELECT l_partkey, l_suppkey, COUNT(*) AS n_moves,
           substr(MAX(move_tag), 1, 10) AS last_move_date,
           CASE WHEN substr(MAX(move_tag), 21, 1) = 'R'
                THEN 'returned' ELSE 'in_stock' END AS state
    FROM tagged GROUP BY l_partkey, l_suppkey
    """,
)
def m4_serial_rebuild(spark, sf_dir):
    """Last-movement state per serial (part x supplier): the movement
    history collapses to MAX of a fixed-width (date|flag) tag — a single
    aggregate, deterministic under equal-timestamp ties (lexicographic
    on the flag), instead of the reference's per-serial Python replay."""
    li = load(spark, sf_dir, "lineitem")
    tag = F.concat(
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss"), F.lit("|"), F.col("l_returnflag")
    )
    agg = li.groupBy("l_partkey", "l_suppkey").agg(
        F.count("*").alias("n_moves"), F.max(tag).alias("mt")
    )
    return agg.select(
        "l_partkey",
        "l_suppkey",
        "n_moves",
        F.substring("mt", 1, 10).alias("last_move_date"),
        F.when(F.substring("mt", 21, 1) == "R", "returned")
        .otherwise("in_stock")
        .alias("state"),
    )
