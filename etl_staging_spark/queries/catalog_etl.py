"""ETL/source/sink entries: master upsert (S3), validated ingest (M1),
dedup purge (M3), SQL view source (S7), row-level security (F4), and
the register pivot pipeline (S4/3.3).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..etl.csv_io import validate_against_master
from ..etl.registers import sales_register
from ..etl.upsert import dedup_purge, scd0_upsert
from ..tables import load, register_views
from .registry import dsum, o_dsum, query


# ---------------------------------------------------------------------------
# S3: SCD-0 master upsert — incoming batch keyed on code; existing rows
# never change, new keys append (etl_stock/models/company.py:1262-1371).
# ---------------------------------------------------------------------------

_O_INCOMING = """
incoming AS (
  SELECT s_suppkey + 2000000 AS c_custkey, s_name AS c_name,
         'NEW_SEG' AS c_mktsegment
  FROM supplier WHERE s_suppkey % 2 = 0
  UNION ALL
  SELECT s_suppkey, s_name, 'CLOBBER_SEG'
  FROM supplier WHERE s_suppkey % 2 = 1
)"""


@query(
    "s3_master_upsert",
    oracle=f"""
    WITH {_O_INCOMING}
    SELECT c_custkey, c_name, c_mktsegment, FALSE AS is_new FROM customer
    UNION ALL
    SELECT i.c_custkey, i.c_name, i.c_mktsegment, TRUE
    FROM incoming i
    WHERE i.c_custkey NOT IN (SELECT c_custkey FROM customer)
    """,
)
def s3_master_upsert(spark, sf_dir):
    master = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    sup = load(spark, sf_dir, "supplier")
    incoming = (
        sup.where(F.col("s_suppkey") % 2 == 0)
        .select(
            (F.col("s_suppkey") + 2000000).alias("c_custkey"),
            F.col("s_name").alias("c_name"),
            F.lit("NEW_SEG").alias("c_mktsegment"),
        )
        .unionByName(
            sup.where(F.col("s_suppkey") % 2 == 1).select(
                F.col("s_suppkey").alias("c_custkey"),
                F.col("s_name").alias("c_name"),
                F.lit("CLOBBER_SEG").alias("c_mktsegment"),
            )
        )
    )
    return scd0_upsert(master, incoming, "c_custkey")


# ---------------------------------------------------------------------------
# M1: validated ingest — staged rows split into valid/rejected by a
# master-key check, then aggregated (etl_stock/models/company.py:970-1074).
# ---------------------------------------------------------------------------


@query(
    "m1_validated_ingest",
    oracle=f"""
    WITH staged AS (
      SELECT l_partkey + CASE WHEN l_orderkey % 97 = 0 THEN 3000000 ELSE 0 END
                 AS part_key,
             l_quantity
      FROM lineitem
    ),
    valid AS (SELECT * FROM staged
              WHERE part_key IN (SELECT p_partkey FROM part)),
    rejected AS (SELECT * FROM staged
                 WHERE part_key NOT IN (SELECT p_partkey FROM part))
    SELECT 'valid' AS status, part_key, {o_dsum('l_quantity')} AS total_qty,
           COUNT(*) AS n_rows
    FROM valid GROUP BY part_key
    UNION ALL
    SELECT 'rejected', part_key, {o_dsum('l_quantity')}, COUNT(*)
    FROM rejected GROUP BY part_key
    """,
)
def m1_validated_ingest(spark, sf_dir):
    staged = load(spark, sf_dir, "lineitem").select(
        (
            F.col("l_partkey")
            + F.when(F.col("l_orderkey") % 97 == 0, 3000000).otherwise(0)
        ).alias("part_key"),
        "l_quantity",
    )
    part = load(spark, sf_dir, "part")
    valid, rejected = validate_against_master(staged, part, "part_key", "p_partkey")

    def summarize(df, status):
        return df.groupBy("part_key").agg(
            dsum("l_quantity").alias("total_qty"), F.count("*").alias("n_rows")
        ).select(F.lit(status).alias("status"), "part_key", "total_qty", "n_rows")

    return summarize(valid, "valid").unionByName(summarize(rejected, "rejected"))


# ---------------------------------------------------------------------------
# M3: dedup/purge — one deterministic survivor per natural key
# (etl_stock/models/company.py:1186-1195).
# ---------------------------------------------------------------------------


@query(
    "m3_dedup_purge",
    oracle="""
    SELECT l_orderkey, l_linenumber, COUNT(*) AS n_dups,
           MIN(l_extendedprice) AS kept_l_extendedprice
    FROM lineitem GROUP BY l_orderkey, l_linenumber
    """,
)
def m3_dedup_purge(spark, sf_dir):
    return dedup_purge(
        load(spark, sf_dir, "lineitem"), ["l_orderkey", "l_linenumber"], "l_extendedprice"
    )


# ---------------------------------------------------------------------------
# S7: SQL view source — a temp view extended with derived columns,
# queried through the SQL API (etl_account/models/account_move.py:2058-2070).
# ---------------------------------------------------------------------------


@query(
    "s7_sql_view",
    oracle="""
    WITH invoice_report AS (
      SELECT o.*,
             CASE WHEN o_totalprice >= 200000 THEN 'large'
                  WHEN o_totalprice >= 50000 THEN 'mid'
                  ELSE 'small' END AS size_bucket
      FROM orders o
    )
    SELECT size_bucket, o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS amount
    FROM invoice_report
    GROUP BY size_bucket, o_orderstatus
    """,
)
def s7_sql_view(spark, sf_dir):
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW invoice_report AS
        SELECT o.*,
               CASE WHEN o_totalprice >= 200000 THEN 'large'
                    WHEN o_totalprice >= 50000 THEN 'mid'
                    ELSE 'small' END AS size_bucket
        FROM orders o
        """
    )
    return spark.sql(
        """
        SELECT size_bucket, o_orderstatus, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS amount
        FROM invoice_report
        GROUP BY size_bucket, o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# F4: branch row-level security — the mandatory predicate injected at
# the view layer reaches every query, SQL or DataFrame
# (branch_accounting/models/account_reports.py:32-56).
# ---------------------------------------------------------------------------

RLS_NATIONS = (1, 2, 3)


@query(
    "f4_rls",
    oracle=f"""
    SELECT c_nationkey, COUNT(*) AS n_customers,
           {o_dsum('c_acctbal')} AS balance
    FROM customer
    WHERE c_nationkey IN {RLS_NATIONS}
    GROUP BY c_nationkey
    """,
)
def f4_rls(spark, sf_dir):
    register_views(
        spark, sf_dir, rls_filter={"customer": F.col("c_nationkey").isin(*RLS_NATIONS)}
    )
    out = spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS balance
        FROM customer
        GROUP BY c_nationkey
        """
    )
    # re-register the unfiltered views so later entries in the same
    # session see the full tables
    register_views(spark, sf_dir)
    return out


# ---------------------------------------------------------------------------
# S4/3.3: the sales-register pivot pipeline with a grand-total row.
# ---------------------------------------------------------------------------


@query(
    "sr_sales_register",
    oracle="""
    WITH inv AS (
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <= TIMESTAMP '1997-12-31 23:59:59'
    ),
    li AS (
      SELECT l_orderkey, l_quantity, l_returnflag,
             ROUND(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)), 2)
                 AS net
      FROM lineitem
    ),
    pi AS (
      SELECT o_orderkey, o_custkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec,
             SUM(net) AS net_dec,
             SUM(CASE WHEN l_returnflag = 'A' THEN net
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS a_a,
             SUM(CASE WHEN l_returnflag = 'N' THEN net
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS a_n,
             SUM(CASE WHEN l_returnflag = 'R' THEN net
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS a_r
      FROM inv JOIN li ON o_orderkey = l_orderkey
      GROUP BY o_orderkey, o_custkey
    )
    SELECT CAST(o_orderkey AS VARCHAR) AS invoice,
           CAST(o_custkey AS VARCHAR) AS partner,
           CAST(qty_dec AS DOUBLE) AS total_qty,
           CAST(net_dec AS DOUBLE) AS net_total,
           CAST(a_a AS DOUBLE) AS amount_A, CAST(a_n AS DOUBLE) AS amount_N,
           CAST(a_r AS DOUBLE) AS amount_R
    FROM pi
    UNION ALL
    SELECT '__TOTAL__', NULL,
           CAST(SUM(qty_dec) AS DOUBLE), CAST(SUM(net_dec) AS DOUBLE),
           CAST(SUM(a_a) AS DOUBLE), CAST(SUM(a_n) AS DOUBLE),
           CAST(SUM(a_r) AS DOUBLE)
    FROM pi
    """,
)
def sr_sales_register(spark, sf_dir):
    return sales_register(
        load(spark, sf_dir, "orders"),
        load(spark, sf_dir, "lineitem"),
        "1997-01-01",
        "1997-12-31",
    )
