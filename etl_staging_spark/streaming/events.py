"""Streaming transforms over the events feed.

Scale notes: the windowed aggregate shuffles on (window, event_type)
with partial aggregation map-side and state bounded by the watermark
horizon; the stateful per-user operator keys state by user_id — state
store size is O(active entities), and the timeout-free design means
state lives for the feed's lifetime (add a timeout for unbounded key
spaces in production).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _event_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


# Canonical schema: ts is a wall-clock timestamp. TIMESTAMP(MICROS)
# parquet files read into this natively.
EVENT_SCHEMA = _event_schema(TimestampNTZType())
# Raw-nanos variant: TIMESTAMP(NANOS) parquet has no native Spark type
# and surfaces as int64 under spark.sql.legacy.parquet.nanosAsLong —
# the same convention as tables.load (tables.py:41-54).
EVENT_SCHEMA_NANOS = _event_schema(LongType())


def stream_source(
    spark: SparkSession, events_dir: str, glob: str | None = None
) -> DataFrame:
    """File-based stream over an events directory (schema declared —
    streaming sources never infer). ``glob`` narrows the directory to
    the event files when the feed shares a directory with other tables
    (the driver's sf dirs hold one parquet per table).

    The feed's physical ts encoding is probed with a batch schema read
    (footer-only, no data scan): TIMESTAMP(MICROS) files stream through
    the canonical timestamp schema untouched; TIMESTAMP(NANOS) files
    surface as int64 (nanosAsLong) and get the nanos→micros truncation —
    exactly the branch tables.load takes for the batch side, so batch
    and stream can never disagree on the unit."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    probe = spark.read
    if glob:
        probe = probe.option("pathGlobFilter", glob)
    ts_is_long = dict(probe.parquet(events_dir).dtypes).get("ts") == "bigint"
    schema = EVENT_SCHEMA_NANOS if ts_is_long else EVENT_SCHEMA
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.parquet(events_dir)
    if ts_is_long:
        # integer DIV: nanos exceed double precision, float division drifts
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        # Watermarks require TIMESTAMP (LTZ), not TIMESTAMP_NTZ; the cast
        # interprets the wall clock in the session timezone (UTC in this
        # engine's sessions), matching timestamp_micros on the nanos branch.
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregate per event type. Late rows
    beyond the watermark drop; state for closed windows is evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_events(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exactly-once ingestion: drop duplicate event_ids within
    the watermark horizon (`dropDuplicatesWithinWatermark`) — the
    streaming twin of the batch exact-dedup operator, and the shape an
    at-least-once feed (Kafka redeliveries, retried uploads) needs
    before any downstream aggregate. State is keyed by event_id and
    EVICTED once the watermark passes — bounded by the horizon's event
    volume, not the stream's lifetime (plain dropDuplicates on a stream
    would grow state forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


STATE_SCHEMA = "n long, total double"
OUT_SCHEMA = (
    "user_id long, n_events long, total_value double"
)


def _track_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful worker: cumulative per-user event count + value total,
    updated per micro-batch (applyInPandasWithState contract)."""
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 2)))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running totals per user via
    Arrow-batched state updates (the reference has no analog — this is
    the Structured Streaming capability the brief requires)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _track_user_totals,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain everything currently in the source into a memory sink —
    the batch-parity harness used by the tests. The output mode is an
    explicit parameter (stateful applyInPandasWithState queries need
    'update'); inferring it from the query name would silently change
    the sink contents for an unluckily-named query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session aggregation: a session extends while events
    arrive within ``gap`` of the previous one (dynamic-length windows —
    `F.session_window`). State per open session closes once the
    watermark passes the session end, so state size is bounded by the
    number of concurrently-active users, not the stream's lifetime."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def purchase_attribution(
    events: DataFrame, events2: DataFrame, horizon: str = "1 hour"
) -> DataFrame:
    """Watermarked stream-stream inner join: attribute each purchase to
    the same user's clicks in the preceding ``horizon``. Both sides are
    watermarked and the join condition carries the time-range bound, so
    each side's buffered state evicts once the watermark clears the
    window — the canonical bounded-state stream-stream join shape
    (without the range condition Spark must buffer both streams
    forever). ``events2`` must be a SECOND readStream over the same
    source: stream-stream self-joins on one DataFrame re-use one source
    and miss pairs."""
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", horizon)
    )
    purchases = (
        events2.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("amount"),
        )
        .withWatermark("purchase_ts", horizon)
    )
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {horizon}")),
    ).select(
        "purchase_id", F.col("p_user").alias("user_id"), "purchase_ts",
        "click_id", "click_ts", "amount",
    )


# Inter-arrival state: the boundary problem additive deltas cannot
# solve (a batch's first gap depends on the PREVIOUS batch's last
# event) is exactly what keyed state is for — last-seen second plus
# cumulative gap sums per (user_id, event_type).
IA_STATE_SCHEMA = (
    "last_secs long, n_events long, n_gaps long, sg long, sg2 long,"
    " mx long"
)
IA_OUT_SCHEMA = (
    "user_id long, event_type string, n_events long, n_gaps long,"
    " sg long, sg2 long, max_gap_s long"
)


def _track_interarrival(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful worker: per (user, type), fold this batch's epoch
    seconds into cumulative gap sums, bridging the batch boundary
    through the stored last-seen second. The group can arrive as
    SEVERAL Arrow chunks in arbitrary order (maxRecordsPerBatch
    splits), so the whole batch is concatenated BEFORE the one sort by
    (ts, event_id) — sorting chunks independently would fold gaps
    across an unordered chunk boundary. The no-previous-event sentinel
    is None, never a magic epoch value: a pre-1970 timestamp (negative
    seconds — zero-default clocks are exactly what a burstiness card
    surfaces) is a real predecessor and its gap counts, matching the
    batch card. Assumes batches arrive in event-time order across
    triggers (a file-drop feed; an out-of-order source needs a
    watermarked reorder upstream). Sums are int64: exact while
    Σg² < 2^63 (~3e9 same-type events at day-long gaps) — the batch
    card's DECIMAL(38,0) is the unbounded-scale audit."""
    user_id, event_type = key
    if state.exists:
        last, ne, ng, sg, sg2, mx = state.get
    else:
        last, ne, ng, sg, sg2, mx = None, 0, 0, 0, 0, 0
    chunks = list(pdfs)
    batch = pd.concat(chunks).sort_values(["ts", "event_id"]) if chunks else None
    if batch is not None and len(batch):
        # vectorized gap fold: numpy.diff over the sorted epoch array
        # with the stored last-seen prepended bridges the batch
        # boundary without a per-row Python loop. Python-int (object)
        # accumulation for the sums — int64 intermediates could wrap
        # on adversarial gap magnitudes the scalar loop handled via
        # Python's unbounded ints.
        secs = (batch["ts"].to_numpy("datetime64[ns]").astype("int64")
                // 1_000_000_000)
        prior = secs if last is None else np.concatenate(([last], secs))
        gaps = [int(g) for g in np.diff(prior)]
        if gaps:
            ng += len(gaps)
            sg += sum(gaps)
            sg2 += sum(g * g for g in gaps)
            mx = max(mx, max(gaps))
        last = int(secs[-1])
        ne += len(secs)
    state.update((last, ne, ng, sg, sg2, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "event_type": [event_type],
            "n_events": [ne],
            "n_gaps": [ng],
            "sg": [sg],
            "sg2": [sg2],
            "max_gap_s": [mx if ng > 0 else None],
        }
    )


def interarrival_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch inter-arrival card's group stats
    (`operators.events.interarrival_group_stats`): cumulative per
    (user_id, event_type) gap sums maintained via Arrow-batched keyed
    state, updated rows emitted per micro-batch. Feed the LATEST row
    per group to `operators.events.finish_interarrival_card` for the
    per-type burstiness card — the same presentation the batch card
    uses, so live and batch provably converge (pytest parity).

    Scale shape: state is O(active (user, type) pairs) — the
    `stateful_user_totals` posture; add a timeout for unbounded key
    spaces in production."""
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _track_interarrival,
        outputStructType=IA_OUT_SCHEMA,
        stateStructType=IA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
