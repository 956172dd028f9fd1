"""Streaming tests: drive the streams end-to-end with availableNow
triggers into memory sinks and assert parity with batch equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_staging_spark.streaming.events import (
    run_available_now,
    stateful_user_totals,
    stream_source,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_stream(spark):
    return stream_source(spark, SF_DIR, glob="events.parquet")


def test_windowed_counts_match_batch(spark, events_stream):
    run_available_now(windowed_counts(events_stream), "win_counts")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    from etl_staging_spark.tables import load

    batch = (
        load(spark, SF_DIR, "events")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("tv"),
        )
        .collect()
    )
    assert got
    for r in batch:
        assert got[(r.win.start, r.event_type)] == (r.n, r.tv)


def test_stateful_user_totals_match_batch(spark, events_stream):
    run_available_now(stateful_user_totals(events_stream), "user_totals", "update")
    # update-mode memory sink: keep the LAST emitted row per user
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM user_totals").collect()
    }
    from etl_staging_spark.tables import load

    batch = (
        load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .collect()
    )
    assert got
    for r in batch:
        n, tv = got[r.user_id]
        assert n == r.n
        assert tv == pytest.approx(r.tv, abs=0.05)
