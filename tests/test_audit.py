"""CDC layer unit tests on a tiny synthetic changelog (the reference's
test_auditlog/test_audit strategy: assert capture rows per op and the
as-of replay, including same-timestamp tie determinism)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_staging_spark.audit import changelog


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # event_id, ts, user_id, event_type, value
        (1, "2024-01-01 10:00:00", 1, "signup", 0.0),
        (2, "2024-01-02 10:00:00", 1, "purchase", 5.0),
        (3, "2024-01-02 10:00:00", 1, "purchase", 7.0),  # same ts as #2
        (4, "2024-01-05 10:00:00", 1, "error", 9.0),
        (5, "2024-01-03 10:00:00", 2, "signup", 1.0),
        (6, "2024-01-09 10:00:00", 3, "signup", 2.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value")


def test_capture_old_new_pairs(events):
    rows = {r.log_id: r for r in changelog.capture(events).collect()}
    assert rows[1].op == "create" and rows[1].old_value is None
    assert rows[2].old_value == 0.0 and rows[2].new_value == 5.0
    # tie on ts: event_id orders the lag chain
    assert rows[3].old_value == 5.0
    assert rows[4].op == "unlink" and rows[4].old_value == 7.0


def test_as_of_tie_break_latest_event_wins(events):
    state = {r.user_id: r for r in changelog.as_of(events, "2024-01-02 10:00:00").collect()}
    assert state[1].value == 7.0  # event 3 beats event 2 at equal ts
    assert 3 not in state         # created after t


def test_snapshot_diff_statuses(events):
    diff = {r.res_id: r.status for r in
            changelog.snapshot_diff(events, "2024-01-02 10:00:00", "2024-01-10 00:00:00").collect()}
    assert diff[1] == "changed"   # 7.0 -> 9.0
    assert diff[2] == "added"
    assert diff[3] == "added"


def test_retention_vacuum(events):
    kept = changelog.retention_vacuum(events, "2024-01-03 00:00:00")
    assert {r.event_id for r in kept.collect()} == {4, 5, 6}
