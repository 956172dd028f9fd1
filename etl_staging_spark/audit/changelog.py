"""CDC over the events table: capture, diff, retention, time travel.

All ordering is pinned to (ts, event_id) — the reference's event-order
risk (same-field updates inside one transaction, SURVEY §7.4.8) is
resolved by the monotonically-assigned event id, exactly like the
reference's log id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

# event_type -> CRUD op, mirroring the reference's auditlog modes
OP_MAP = {
    "signup": "create",
    "click": "write",
    "view": "write",
    "purchase": "write",
    "error": "unlink",
}


def op_col():
    c = F
    expr = None
    for k, v in OP_MAP.items():
        expr = (
            c.when(F.col("event_type") == k, v)
            if expr is None
            else expr.when(F.col("event_type") == k, v)
        )
    return expr.otherwise("write")


def capture(events: DataFrame) -> DataFrame:
    """C1: the changelog — one row per event with the tracked field's
    old/new pair. old_value is the previous value of the same entity
    (lag window over (ts, event_id)); the reference stores it
    explicitly at write time, an append-only log derives it."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        F.col("event_id").alias("log_id"),
        "ts",
        F.col("user_id").alias("res_id"),
        op_col().alias("op"),
        F.lit("value").alias("field"),
        F.lag("value").over(w).alias("old_value"),
        F.col("value").alias("new_value"),
    )


def as_of(events: DataFrame, t: str) -> DataFrame:
    """C4: each entity's state at time t — the latest row with ts <= t,
    ties broken by event_id (latest wins). Entities created after t
    simply produce no row (the reference's replay leaves them out)."""
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.where(F.col("ts") <= t)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def snapshot_diff(events: DataFrame, t1: str, t2: str) -> DataFrame:
    """C2: DictDiffer between the entity states at t1 and t2:
    added / removed / changed / unchanged."""
    s1 = as_of(events, t1).select(
        F.col("user_id").alias("res_id"),
        F.col("value").alias("value_t1"),
    )
    s2 = as_of(events, t2).select(
        F.col("user_id").alias("res_id"),
        F.col("value").alias("value_t2"),
    )
    joined = s1.join(s2, "res_id", "full_outer")
    status = (
        F.when(F.col("value_t1").isNull(), "added")
        .when(F.col("value_t2").isNull(), "removed")
        .when(F.col("value_t1") != F.col("value_t2"), "changed")
        .otherwise("unchanged")
    )
    return joined.select("res_id", "value_t1", "value_t2", status.alias("status"))


def retention_vacuum(events: DataFrame, deadline: str) -> DataFrame:
    """C3: the kept set after a retention run — a predicate rewrite, the
    scalable form of the reference's chunked DELETE."""
    return events.where(F.col("ts") >= deadline)
