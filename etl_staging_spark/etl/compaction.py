"""Small-file compaction — the table-maintenance job every long-lived
parquet corpus needs: streaming ingest, partition-scoped corrections
and per-batch delta writes each leave a trickle of small files, and at
100 TB the resulting scan overhead (one task + one footer read per
tiny file) quietly dominates job time long before storage does.

`compact_partitions` rewrites a partitioned snapshot's SCOPED slice to
a target file count per partition with partition-overwrite semantics
(`etl.sinks.write_partitioned_snapshot`): untouched partitions keep
their bytes, the rewrite is idempotent (re-running converges to the
same layout), and the read-then-overwrite hazard — the rewrite deletes
the very files its lazy plan still references — is cut with the same
eager localCheckpoint barrier `streaming.ingest.compact_card_state`
uses.

Scale posture: compaction is embarrassingly partition-parallel; scope
it with a predicate on the partition keys (a date range, one company)
and run it as a rolling maintenance window instead of one full-table
rewrite — the same correction-scoping argument as the sink it rides.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sinks import write_partitioned_snapshot


def _leaf_files(path: str) -> list[str]:
    """Data files under a snapshot root (driver-side listing — bounded
    by the scoped partition count x files per partition, the same
    O(files) the parquet footer phase already pays)."""
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f)
            for f in files
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
    return out


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    scope: str | None = None,
    files_per_partition: int = 1,
) -> dict[str, int]:
    """Rewrite the ``scope``-selected partitions of the snapshot at
    ``path`` to ``files_per_partition`` files each. ``scope`` is a SQL
    predicate over the PARTITION columns (partition-pruned read — the
    unscoped data is never touched, read, or rewritten); ``None``
    compacts the whole table. Returns {files_before, files_after,
    rows} for the maintenance log.

    The rewrite repartitions on (partition cols + a bounded salt) so
    each partition lands in exactly ``files_per_partition`` writer
    tasks — a plain repartition(partition_cols) would put EVERY row of
    a partition through one task (the hot-partition straggler), while
    coalesce would merge across partitions and break the
    one-directory-one-task write. Content is byte-stable: the same
    rows land in the same partition directories, only file boundaries
    change."""
    if files_per_partition < 1:
        raise ValueError("files_per_partition must be >= 1")
    before = len(_leaf_files(path))
    df = spark.read.parquet(path)
    if scope is not None:
        df = df.where(scope)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]),
        F.lit(files_per_partition),
    )
    out = df.repartition(
        *[F.col(c) for c in partition_cols], salt.alias("__salt")
    )
    # the overwrite deletes files the lazy plan still references:
    # materialize the scoped slice and cut lineage BEFORE the delete
    out = out.localCheckpoint(eager=True)
    rows = out.count()
    write_partitioned_snapshot(out, path, partition_cols, mode="dynamic")
    return {
        "files_before": before,
        "files_after": len(_leaf_files(path)),
        "rows": rows,
    }
