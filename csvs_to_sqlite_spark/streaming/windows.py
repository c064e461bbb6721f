"""Structured Streaming over the events table.

The reference has no streaming surface (SURVEY §2.H); this is extension
work for the pipeline posture: file-source streams, event-time tumbling
windows with watermarks for late data, and a stateful sessionizer.

``windowed_event_counts`` can run in two modes with identical semantics:
- streaming=True: readStream → withWatermark → window agg → memory sink,
  driven to completion with processAllAvailable (the local-test idiom);
  on a cluster this same plan runs continuously against kafka/files.
- streaming=False: the batch equivalent (window() works in batch too),
  used for oracle comparison.
"""

from __future__ import annotations

import itertools
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_counter = itertools.count()

# The events parquet has shipped with ts as TIMESTAMP(NANOS) in some
# generations and TIMESTAMP(MICROS) in others. Batch reads without a schema
# surface a proper timestamp either way; the streaming source needs an
# explicit schema, and requesting `ts long` yields the raw epoch count in
# the file's native unit (nanos or micros depending on generation).
EVENTS_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)

# Epoch longs ≥ 1e17 can only be nanoseconds (1e17 µs ≈ year 5138, while
# 1e17 ns ≈ 1973) — so a magnitude test cleanly separates the two
# generations for any plausible event time.
_NANOS_CUTOFF = 10**17


def _ts_from_nanos(df: DataFrame) -> DataFrame:
    """Normalize a raw epoch-long ts column to a microsecond timestamp,
    whichever unit the parquet generation stored."""
    if dict(df.dtypes).get("ts") == "bigint":
        micros = F.when(
            F.abs(F.col("ts")) >= F.lit(_NANOS_CUTOFF), F.expr("ts div 1000")
        ).otherwise(F.col("ts"))
        df = df.withColumn("ts", F.timestamp_micros(micros))
    return df


def load_events(spark: SparkSession, events_path: str) -> DataFrame:
    """Batch read of the events table with nanos→micros normalization.

    Deliberately NOT scan_fanout-wrapped (optimization r11): an A/B of
    the events consumers (sessionize 0.69s → 1.16s with a fan-out)
    showed the round-robin shuffle of raw event rows costs more than
    the single-core parse it parallelizes — the heavy events operators
    shuffle on their own keys anyway."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _ts_from_nanos(spark.read.parquet(events_path))


def _agg(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        # value is 2-dp: sum exact integer cents (order-free — bit-stable
        # across micro-batch orders and partitionings), one double division
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0, 4
            ).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@contextmanager
def _no_idle_batches(spark: SparkSession):
    """Disable no-data micro-batches for the bounded drive-to-completion
    runs (optimization r11): after the data batch drains, Spark schedules
    one more ZERO-row batch purely to advance the watermark and evict
    state — and that batch reloads and recommits every state store
    partition, costing as much as the data batch itself (measured:
    interval join 57s data batch + 49s empty batch; dedup 10s + 7.3s,
    contended host). Every streaming operator here emits its results in
    the data batch (complete-mode aggregations re-emit the full result
    each batch; the interval join is INNER, so matches are emitted
    eagerly), so the eviction-only batch never changes the output —
    dropping it is a pure fixed-cost removal, oracle-checked identical.
    Scoped (previous value restored on exit) because an APPEND-mode
    aggregation — e.g. the watermark test-bed streams — needs no-data
    batches for watermark-gated emission."""
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def windowed_event_counts(
    spark: SparkSession, events_path: str, streaming: bool = True
) -> DataFrame:
    if not streaming:
        return _agg(load_events(spark, events_path))
    stream = _read_stream(spark, events_path)
    name = f"windowed_events_{next(_counter)}"
    with _no_idle_batches(spark):
        q = (
            _agg(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a session breaks when the gap from the previous
    event of the same user exceeds ``gap_minutes``. lag + running sum —
    one shuffle on user_id, windows stay within partitions."""
    from pyspark.sql.window import Window

    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_timestamp, not cast("long"): the parquet generation may surface
    # ts as TIMESTAMP_NTZ, which Spark refuses to cast to a numeric
    epoch = F.unix_timestamp(F.col("ts"))
    gap = epoch - F.lag(epoch).over(w_user)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    with_sess = (
        F.sum(is_new).over(w_user.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        events.withColumn("session_id", with_sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        )
    )


def _read_stream(spark: SparkSession, events_path: str) -> DataFrame:
    """File-source stream over the events table. ``events_path`` may be
    a single parquet FILE (the driver-generated testdata shape — the
    file source wants a directory, so stream the parent with a glob
    filter) or a DIRECTORY of part files (any Spark-written table, e.g.
    the sf1 stress set — streamed directly; a glob on the directory
    name would match zero part files and silently emit an empty stream,
    the bug the sf1 certification caught)."""
    import os

    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if os.path.isdir(events_path):
        raw = reader.parquet(events_path)
    else:
        d = os.path.dirname(events_path)
        raw = reader.option("pathGlobFilter", os.path.basename(events_path)).parquet(d)
    return _ts_from_nanos(raw)


def streaming_sessionize(spark: SparkSession, events_path: str, gap_minutes: int = 30) -> DataFrame:
    """Streaming counterpart using session_window (native stateful op)."""
    stream = _read_stream(spark, events_path)
    name = f"sessions_{next(_counter)}"
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    with _no_idle_batches(spark):
        q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


def streaming_enrich_counts(
    spark: SparkSession, events_path: str, customer_path: str
) -> DataFrame:
    """Stream-static enrichment: join the event stream to a static
    customer dimension and aggregate per market segment.

    The static side is read once per micro-batch and explicitly
    ``F.broadcast()``-ed, so the join is stateless and map-side — no
    streaming state, no shuffle of the stream beyond the final
    aggregation's (segment) keys. This is the canonical "enrich events
    with a dim table" pipeline shape; at cluster scale the same plan
    serves a kafka source with the dim refreshing per batch.
    """
    stream = _read_stream(spark, events_path)
    cust = spark.read.parquet(customer_path).select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    name = f"enrich_{next(_counter)}"
    agg = (
        stream.join(F.broadcast(cust), "user_id")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0, 4
            ).alias("total_value"),
        )
    )
    with _no_idle_batches(spark):
        q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


def streaming_dedup_counts(spark: SparkSession, events_path: str) -> DataFrame:
    """Streaming exact dedup: collapse repeated (user, event_type) actions
    inside the same minute — the training-pipeline "emit each fact once"
    shape — then count surviving events per type.

    ``dropDuplicates`` after ``withWatermark`` bounds the dedup state to
    the watermark horizon (keys older than 1 hour of event time are
    evicted), so state stays O(active keys) per executor at any corpus
    size. Keep-first vs keep-any doesn't matter downstream because only
    key survival is counted — which is also what makes the batch/DuckDB
    twin (count of DISTINCT keys) an exact oracle.
    """
    stream = _read_stream(spark, events_path)
    name = f"dedup_{next(_counter)}"
    deduped = (
        stream.withColumn("minute", F.date_trunc("minute", F.col("ts")))
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["user_id", "event_type", "minute"])
    )
    agg = deduped.groupBy("event_type").agg(F.count("*").alias("n_unique"))
    with _no_idle_batches(spark):
        q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return spark.table(name)


def streaming_interval_join(
    spark: SparkSession,
    events_path: str,
    left_type: str = "view",
    right_type: str = "purchase",
    horizon_hours: int = 24,
) -> DataFrame:
    """Stream-stream event-time interval join: attribute each purchase to
    the same user's preceding views within ``horizon_hours`` — the
    classic attribution shape, and the one streaming-join family the
    tumbling/session/stream-static operators don't cover.

    Both sides are the SAME file-source stream (self-join), watermarked
    so Spark can bound join state: the range condition
    ``r_ts in (l_ts, l_ts + horizon]`` plus the watermark lets the
    engine evict a buffered left row once event time passes
    l_ts + horizon + delay, so state is O(events inside the horizon)
    per user — independent of stream length. Inner joins emit matches
    eagerly (no watermark wait), so a bounded file stream drains fully
    under processAllAvailable.

    Matched pairs land in the sink append-mode; the per-user rollup
    (n_pairs, sum_gap_s — exact integers, no order-dependent float
    accumulation) happens batch-side on the materialized result, which
    keeps the streaming graph single-stateful-operator and
    version-portable.
    """
    stream = _read_stream(spark, events_path)
    left = (
        stream.where(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", f"{horizon_hours + 1} hours")
    )
    right = (
        stream.where(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", f"{horizon_hours + 1} hours")
    )
    pairs = left.join(
        right,
        F.expr(
            "l_user = r_user AND r_ts > l_ts "
            f"AND r_ts <= l_ts + interval {horizon_hours} hours"
        ),
    ).select(
        F.col("l_user").alias("user_id"),
        (F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")).alias("gap_s"),
    )
    name = f"interval_join_{next(_counter)}"
    with _no_idle_batches(spark):
        q = pairs.writeStream.outputMode("append").format("memory").queryName(name).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"), F.sum("gap_s").alias("sum_gap_s"))
    )
