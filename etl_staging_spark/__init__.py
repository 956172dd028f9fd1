"""etl_staging_spark — a PySpark-native analytics engine.

Rebuilds the query and data-processing capabilities of the reference
(`arunalexgeorge/etl-staging`, an Odoo 16 ERP analytics suite) as an
idiomatic Spark DataFrame / Spark SQL engine:

- a declarative financial-report engine (six formula engines: domain,
  tax_tags, account_codes, external, custom, aggregation-DSL) — see
  ``etl_staging_spark.engines`` and ``etl_staging_spark.reports``;
- the batch ETL jobs (CSV ingest + master upsert, stock-ledger netting,
  as-of valuation costing, ageing, registers) — ``etl_staging_spark.etl``;
- the audit/CDC layer (change capture, retention vacuum, as-of time
  travel) — ``etl_staging_spark.audit``;
- large-scale training-data operators (dedup, similarity search, text
  analysis, multimodal plumbing) — ``etl_staging_spark.llmdata``;
- reusable physical operators (as-of joins, bucketization, ledger
  netting) — ``etl_staging_spark.operators``;
- the query/oracle catalog behind ``__spark_entry__`` —
  ``etl_staging_spark.queries``.

Everything is pure DataFrame/Spark-SQL (no row-at-a-time Python UDFs in
hot paths) so plans stay inside Catalyst/Tungsten codegen and scale to
cluster-sized inputs.
"""

__version__ = "0.1.0"
