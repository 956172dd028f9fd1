"""Audit/CDC entries (C1-C5) over the events table."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..audit import changelog
from ..tables import load
from .registry import query

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_O_TS = "strftime(ts, '%Y-%m-%d %H:%M:%S.%f')"

_O_OP = """CASE event_type
    WHEN 'signup' THEN 'create'
    WHEN 'error' THEN 'unlink'
    ELSE 'write' END"""


@query(
    "c1_changelog_capture",
    oracle=f"""
    SELECT event_id AS log_id, {_O_TS} AS ts_str, user_id AS res_id,
           {_O_OP} AS op, 'value' AS field,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS old_value,
           value AS new_value
    FROM events
    """,
)
def c1_changelog_capture(spark, sf_dir):
    """C1: per-field old/new changelog rows (auditlog capture shape)."""
    out = changelog.capture(load(spark, sf_dir, "events"))
    return out.select(
        "log_id",
        F.date_format("ts", _TS_FMT).alias("ts_str"),
        "res_id", "op", "field", "old_value", "new_value",
    )


@query(
    "c2_snapshot_diff",
    oracle="""
    WITH s1 AS (
      SELECT user_id AS res_id, value AS value_t1 FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '2024-01-05 00:00:00'
      ) WHERE rn = 1
    ),
    s2 AS (
      SELECT user_id AS res_id, value AS value_t2 FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '2024-01-12 00:00:00'
      ) WHERE rn = 1
    )
    SELECT COALESCE(s1.res_id, s2.res_id) AS res_id, value_t1, value_t2,
           CASE WHEN value_t1 IS NULL THEN 'added'
                WHEN value_t2 IS NULL THEN 'removed'
                WHEN value_t1 <> value_t2 THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM s1 FULL OUTER JOIN s2 ON s1.res_id = s2.res_id
    """,
)
def c2_snapshot_diff(spark, sf_dir):
    """C2: DictDiffer between entity states at two timestamps."""
    return changelog.snapshot_diff(
        load(spark, sf_dir, "events"), "2024-01-05 00:00:00", "2024-01-12 00:00:00"
    )


@query(
    "c3_retention_vacuum",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_kept,
           MIN({_O_TS}) AS min_kept_ts
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
    GROUP BY event_type
    """,
)
def c3_retention_vacuum(spark, sf_dir):
    """C3: retention as a predicate rewrite; summarized per type so the
    kept set is hash-checkable."""
    kept = changelog.retention_vacuum(
        load(spark, sf_dir, "events"), "2024-01-10 00:00:00"
    )
    return kept.groupBy("event_type").agg(
        F.count("*").alias("n_kept"),
        F.min(F.date_format("ts", _TS_FMT)).alias("min_kept_ts"),
    )


@query(
    "c4_asof_reconstruction",
    oracle=f"""
    SELECT user_id, event_id, {_O_TS} AS ts_str, event_type, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts <= TIMESTAMP '2024-01-08 12:00:00'
    ) WHERE rn = 1
    """,
)
def c4_asof_reconstruction(spark, sf_dir):
    """C4: time travel — every entity's state at t, deterministic
    (ts, event_id) ordering (smile_audit history replay)."""
    out = changelog.as_of(load(spark, sf_dir, "events"), "2024-01-08 12:00:00")
    return out.select(
        "user_id", "event_id",
        F.date_format("ts", _TS_FMT).alias("ts_str"),
        "event_type", "value",
    )


@query(
    "c5_request_log",
    oracle=f"""
    SELECT event_id, user_id, {_O_TS} AS ts_str,
           json_extract_string(props, '$.k') AS k_param,
           value
    FROM events WHERE event_type IN ('view', 'click')
    """,
)
def c5_request_log(spark, sf_dir):
    """C5: request/session log rows with JSON payload access (the
    reference's http_request logging + the §2.8 JSON operator)."""
    ev = load(spark, sf_dir, "events").where(F.col("event_type").isin("view", "click"))
    return ev.select(
        "event_id", "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_str"),
        F.get_json_object("props", "$.k").alias("k_param"),
        "value",
    )
