"""Write-side ETL: CSV ingestion, master upserts, validation channels,
dedup/purge jobs, register pipelines and sinks (SURVEY §2.1, §2.11).

The reference's jobs are imperative loops over the ORM
(`etl_stock/models/company.py`); here each is a declarative batch
pipeline: read → validate/join → aggregate → write-new-version.
"Raw UPDATE" maps to overwrite/merge semantics on immutable snapshots.
"""
