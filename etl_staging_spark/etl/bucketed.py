"""Bucketed managed tables: shuffle-free co-located joins.

The big-join story at 100 TB: when two fact tables are repeatedly
joined on the same key (move lines ⋈ moves, lineitem ⋈ orders), pay the
shuffle ONCE at write time — `bucketBy(N, key)` hash-partitions every
file into N buckets — and every subsequent equi-join on that key reads
matching buckets side by side with NO Exchange in the plan. `sortBy`
inside buckets additionally removes the Sort under a sort-merge join.

Both sides must agree on the bucket count (or be multiples, with
`spark.sql.bucketing.coalesceBucketsInJoin.enabled`). Bucket pruning
also serves point lookups: an equality filter on the bucket key scans
1/N of the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def drop_managed_table(spark: SparkSession, table: str) -> None:
    """Drop a managed table AND its leftover warehouse directory: a
    previous JVM session's write leaves the directory behind while the
    fresh session's in-memory catalog doesn't list the table, so a bare
    DROP TABLE IF EXISTS is a no-op and the next saveAsTable fails with
    'associated location already exists'.

    Resolves the table's real location from the catalog when the table
    exists (so a database-qualified name never maps to the wrong
    directory); the leftover-directory fallback only fires for plain
    unqualified names, where <warehouse>/<name> is the managed layout
    by construction. An EXTERNAL table's data survives DROP TABLE by
    contract, so the rmtree only fires when the catalog says MANAGED
    (or when there is no catalog entry at all and the path is the
    managed warehouse layout)."""
    location = None
    table_type = None
    try:
        existed = spark.catalog.tableExists(table)
    except Exception:
        existed = None  # catalog unreachable: treat as unknown, never guess
    if existed:
        try:
            for row in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect():
                if row[0] == "Location":
                    location = row[1]
                elif row[0] == "Type":
                    table_type = row[1]
        except Exception:
            location = None
            table_type = None
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if table_type is not None and table_type.upper() != "MANAGED":
        # External (or view-like) entry: DROP TABLE intentionally leaves
        # the data in place — never delete it out from under the caller.
        return
    if location is None:
        if existed is not False:
            # A catalog entry existed (or existence is unknown) but its
            # type/location could not be resolved — it may be EXTERNAL
            # with data parked at the managed layout. Never guess a path.
            return
        if "." in table or "/" in table or "`" in table:
            # qualified or exotic name with no catalog entry: nothing to
            # clean up that we can locate safely — do NOT guess a path
            return
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if not warehouse:
            return
        location = f"{warehouse.rstrip('/')}/{table.lower()}"
    if location.startswith("file:"):
        location = location[len("file:"):]
    import shutil

    shutil.rmtree(location, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and
    optionally sorted) by the join key. Overwrites the table, including
    a leftover warehouse directory from a previous session whose
    (in-memory) catalog no longer lists the table."""
    spark = df.sparkSession
    drop_managed_table(spark, table)
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed tables on their bucket key. When both were
    written by :func:`write_bucketed` with the same key and bucket
    count, the plan contains no Exchange — the buckets ARE the shuffle
    output, amortized across every query that joins on this key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def append_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Append to an EXISTING bucketed table under the same bucket spec —
    the growth path of every persisted index here (day-2 batches join
    the corpus by appending; Spark rejects a mismatched spec, so the
    exchange-free join property survives every append)."""
    writer = (
        df.write.format("parquet")
        .mode("append")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
