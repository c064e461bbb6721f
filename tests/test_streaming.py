"""Streaming behaviors: foreachBatch idempotent sink, watermark late-data
dropping, streaming/batch agreement."""

import glob
import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_foreach_batch_parquet_sink(spark, tmp_path):
    from csvs_to_sqlite_spark.streaming.sinks import stream_aggregate_to_parquet

    out = str(tmp_path / "stream_out")
    stream_aggregate_to_parquet(spark, f"{SF}/events.parquet", out)
    batches = sorted(glob.glob(f"{out}/batch=*"))
    assert batches, "no batch directories written"
    final = spark.read.parquet(batches[-1])
    # agreement with the batch equivalent
    from csvs_to_sqlite_spark.streaming.windows import load_events

    batch = (
        load_events(spark, f"{SF}/events.parquet")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, batch.collect()))


def test_watermark_drops_late_data(spark, tmp_path):
    """Feed two files: current data, then an hours-late event. With a
    10-minute watermark in append mode the late event's window is not
    re-opened."""
    import pandas as pd

    d = tmp_path / "stream_src"
    d.mkdir()
    base = pd.Timestamp("2024-01-01 10:00:00")
    df1 = pd.DataFrame(
        {
            "event_id": range(6),
            "ts": [int((base + pd.Timedelta(minutes=m)).value) for m in (0, 5, 10, 65, 70, 75)],
            "user_id": [1] * 6,
            "event_type": ["click"] * 6,
            "value": [1.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    df1.to_parquet(d / "a.parquet")

    from csvs_to_sqlite_spark.streaming.windows import EVENTS_SCHEMA, _ts_from_nanos

    stream = _ts_from_nanos(
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    name = "late_test_out"
    q = agg.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
        # second file: an event 2 hours LATE (inside the first, closed window)
        df2 = pd.DataFrame(
            {
                "event_id": [99],
                "ts": [int((base + pd.Timedelta(minutes=1)).value)],
                "user_id": [1],
                "event_type": ["click"],
                "value": [1.0],
                "props": ["{}"],
            }
        )
        df2.to_parquet(d / "b.parquet")
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["ws"].isoformat(): r["n"] for r in spark.table(name).collect()}
    # append mode emits a window only once its watermark passes; the
    # 10:00 window closed with 3 events and the late one was dropped
    assert rows.get("2024-01-01T10:00:00") == 3


def test_streaming_dedup_collapses_same_minute_repeats(spark, tmp_path):
    """Three clicks by the same user inside one minute collapse to one;
    a click in another minute and another type survive separately."""
    import pandas as pd

    from csvs_to_sqlite_spark.streaming.windows import streaming_dedup_counts

    base = pd.Timestamp("2024-01-01 10:00:00")
    df = pd.DataFrame(
        {
            "event_id": range(5),
            "ts": [
                int((base + pd.Timedelta(seconds=s)).value)
                for s in (0, 10, 50, 90, 15)
            ],
            "user_id": [1, 1, 1, 1, 1],
            "event_type": ["click", "click", "click", "click", "view"],
            "value": [1.0] * 5,
            "props": ["{}"] * 5,
        }
    )
    p = tmp_path / "events.parquet"
    df.to_parquet(p)
    out = {
        r["event_type"]: r["n_unique"]
        for r in streaming_dedup_counts(spark, str(p)).collect()
    }
    # clicks: minute 10:00 (3 repeats -> 1) + minute 10:01 -> 2; views: 1
    assert out == {"click": 2, "view": 1}


def test_streaming_enrich_matches_batch_join(spark, tmp_path):
    """Stream-static broadcast join: per-segment counts equal the batch
    join's on a fixture where one event has no matching customer."""
    import pandas as pd

    from csvs_to_sqlite_spark.streaming.windows import streaming_enrich_counts

    base = pd.Timestamp("2024-01-01 10:00:00")
    events = pd.DataFrame(
        {
            "event_id": range(4),
            "ts": [int((base + pd.Timedelta(seconds=s)).value) for s in range(4)],
            "user_id": [1, 2, 1, 99],  # 99 has no customer row
            "event_type": ["click"] * 4,
            "value": [1.5, 2.0, 0.5, 9.0],
            "props": ["{}"] * 4,
        }
    )
    customers = pd.DataFrame(
        {
            "c_custkey": [1, 2],
            "c_name": ["a", "b"],
            "c_nationkey": [0, 0],
            "c_acctbal": [0.0, 0.0],
            "c_mktsegment": ["BUILDING", "MACHINERY"],
        }
    )
    ep = tmp_path / "events.parquet"
    cp = tmp_path / "customer.parquet"
    events.to_parquet(ep)
    customers.to_parquet(cp)
    out = {
        r["c_mktsegment"]: (r["n_events"], r["total_value"])
        for r in streaming_enrich_counts(spark, str(ep), str(cp)).collect()
    }
    assert out == {"BUILDING": (2, 2.0), "MACHINERY": (1, 2.0)}


def test_streaming_interval_join_matches_batch(spark):
    """Stream-stream self-join (view→purchase within 24h) agrees with the
    batch interval join over the same events."""
    from csvs_to_sqlite_spark.streaming.windows import (
        load_events,
        streaming_interval_join,
    )

    got = streaming_interval_join(spark, f"{SF}/events.parquet")
    ev = load_events(spark, f"{SF}/events.parquet")
    left = ev.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("l_user"), F.col("ts").alias("l_ts")
    )
    right = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts")
    )
    want = (
        left.join(
            right,
            F.expr(
                "l_user = r_user AND r_ts > l_ts"
                " AND r_ts <= l_ts + interval 24 hours"
            ),
        )
        .groupBy(F.col("l_user").alias("user_id"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")).alias(
                "sum_gap_s"
            ),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_checkpoint_restart_resumes_without_reprocessing(spark, tmp_path):
    """Exactly-once across a restart: a checkpointed stream processes two
    input files, stops, two MORE files arrive, and the restarted query
    (same checkpoint) must pick up only the new files — every input row
    lands in the foreachBatch parquet output exactly once, and the first
    run's batch directories are left untouched."""
    import glob as globmod

    from csvs_to_sqlite_spark.streaming.sinks import foreach_batch_parquet

    indir = tmp_path / "in"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    indir.mkdir()

    def add_file(name, lo, hi):
        spark.range(lo, hi).selectExpr("id", "id * 2 AS v").coalesce(
            1
        ).write.parquet(str(indir / name))

    def run_once():
        stream = (
            spark.readStream.schema("id long, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{indir}/*")
        )
        q = (
            stream.writeStream.option("checkpointLocation", ckpt)
            .foreachBatch(foreach_batch_parquet(out))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    add_file("f1", 0, 10)
    add_file("f2", 10, 25)
    run_once()
    first_batches = {
        d: sorted(globmod.glob(f"{d}/*.parquet")) for d in globmod.glob(f"{out}/batch=*")
    }
    assert len(first_batches) >= 1

    add_file("f3", 25, 40)
    add_file("f4", 40, 50)
    run_once()

    # first run's outputs untouched (same part files), new batches appended
    for d, parts in first_batches.items():
        assert sorted(globmod.glob(f"{d}/*.parquet")) == parts
    got = sorted(
        tuple(r) for r in spark.read.parquet(f"{out}/batch=*").collect()
    )
    want = sorted((i, i * 2) for i in range(50))
    assert got == want  # every row exactly once — no replay, no loss


def test_streaming_state_store_conf_shape():
    """RocksDB posture (SCALE.md): opt-in conf dict for production
    sessions — keys are start-time configs, default path returns {}."""
    from csvs_to_sqlite_spark.session import streaming_state_store_conf

    conf = streaming_state_store_conf()
    assert conf["spark.sql.streaming.stateStore.providerClass"].endswith(
        "RocksDBStateStoreProvider"
    )
    assert streaming_state_store_conf(use_rocksdb=False) == {}


def test_rocksdb_state_store_matches_default_provider(spark):
    """VERDICT_r07 item 8: the RocksDB state-store posture
    (session.streaming_state_store_conf) is now VERIFIED, not just
    documented — the windowed aggregation runs once under the default
    HDFS-backed provider and once under RocksDB, the provider's
    engagement is proven from the query's own state-operator metrics,
    and the results are bit-identical (the integer-cent sums make the
    comparison exact, not approximate)."""
    from csvs_to_sqlite_spark.session import (
        prep_session,
        streaming_state_store_conf,
    )
    from csvs_to_sqlite_spark.streaming import windows as W

    prep_session(spark)
    path = "/root/testdata/sf0.01/events.parquet"
    base = {
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in W.windowed_event_counts(spark, path).collect()
    }
    assert base  # non-empty baseline

    confs = streaming_state_store_conf()
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # run the same aggregation as an explicit query so the provider's
        # engagement is observable via state-operator custom metrics
        stream = W._read_stream(spark, path)
        q = (
            W._agg(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("rocksdb_verify")
            .start()
        )
        try:
            q.processAllAvailable()
            progress = q.lastProgress
        finally:
            q.stop()
        rocks = {
            (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
            for r in spark.table("rocksdb_verify").collect()
        }
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    assert rocks == base  # bit-identical across providers
    ops = progress["stateOperators"]
    assert ops, "no state operator in progress — aggregation not stateful?"
    metrics = ops[0].get("customMetrics", {})
    assert any("rocksdb" in k.lower() for k in metrics), (
        f"RocksDB provider did not engage: {sorted(metrics)[:8]}"
    )


def test_stateful_update_template_yields_declared_dtypes():
    """The r11 template-copy fast path in stateful._update must keep the
    OUTPUT_SCHEMA dtypes (long, long, double) and exact values — an
    iat-store into a copied template silently upcasting or truncating
    would corrupt every user's totals at the Arrow boundary."""
    import pandas as pd

    from csvs_to_sqlite_spark.streaming import stateful

    class _FakeState:
        exists = False

        def update(self, v):
            self.updated = v

    st = _FakeState()
    batches = [
        pd.DataFrame({"value": [1.25, 2.50, None]}),
        pd.DataFrame({"value": [0.25]}),
    ]
    (out,) = list(stateful._update((42,), iter(batches), st))
    assert list(out.columns) == ["user_id", "n_events", "sum_value"]
    assert out["user_id"].dtype == "int64"
    assert out["n_events"].dtype == "int64"
    assert out["sum_value"].dtype == "float64"
    assert out.iloc[0].tolist() == [42, 4, 4.0]
    assert st.updated == (4, 400)
    # the module-level template itself must stay pristine for the next key
    assert stateful._OUT_TEMPLATE.iloc[0].tolist() == [0, 0, 0.0]
