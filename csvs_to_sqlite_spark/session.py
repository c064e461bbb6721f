"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]`` (default 32), but every
config here is chosen to also hold on a multi-executor cluster: AQE for
runtime re-planning (skew joins, partition coalescing), Arrow for the few
Pandas-UDF paths, UTC session timezone so results are reproducible against
external oracles (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "csvs-to-sqlite-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local[32] reads smallish files: split aggressively so a single
        # 50-100MB CSV parses on many cores (cluster default 128m is tuned
        # for HDFS-scale files; override via env for cluster runs)
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # PySpark's DataFrame-debugging call-site capture (default ON)
        # taxes EVERY DataFrame/functions call with getActiveSession + a
        # conf.get py4j round trip + PySparkCurrentOrigin.set + a Python
        # stack walk (pyspark/errors/utils.py _with_origin) — pure
        # driver-side plan-construction latency, no effect on plans or
        # results, only on error-message call-site enrichment. Measured
        # interleaved at sf0.1: ingest 12.2→10.0 s, six heavy bench
        # entries end-to-end 9.8→8.0 s (tools/ab_dataframe_debugging.py).
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _disable_dataframe_debugging(spark)
    return spark


def _disable_dataframe_debugging(spark: SparkSession) -> None:
    """Make the dataFrameDebugging=false conf actually stick.

    pyspark caches the gate in a module global at the FIRST decorated
    call (pyspark/errors/utils.py:is_debugging_enabled) — under a
    host-provided session that call has usually happened long before
    prep_session runs, so setting the conf alone would be a no-op. Align
    the cache with the conf we just set; wrapped defensively because the
    cache is a pyspark-internal attribute (absent = nothing to fix)."""
    try:
        spark.conf.set("spark.python.sql.dataFrameDebugging.enabled", "false")
    except Exception:
        pass
    try:
        import pyspark.errors.utils as _perr

        if getattr(_perr, "_enable_debugging_cache", None) is not False:
            _perr._enable_debugging_cache = False
    except Exception:
        pass


def prep_session(spark: SparkSession) -> SparkSession:
    """Normalize runtime confs on a session we did not create.

    The verification driver hands us its own SparkSession; pin the runtime
    configs our query semantics rely on (UTC for timestamp formatting,
    permissive arithmetic to match the reference's pandas semantics, AQE).
    All of these are runtime-settable.
    """
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        # permissive arithmetic to match the reference's pandas semantics
        ("spark.sql.ansi.enabled", "false"),
        # the host session may default to 200 shuffle partitions — wrong for
        # the sf0.01/sf0.1 scales these queries run at. Scale-adaptive
        # (optimization r11): derive from the session's actual core count
        # instead of a constant, so a 4-core bench run gets 4 partitions
        # and a cluster session keeps its own sizing; AQE coalescing owns
        # the per-query right-sizing above this floor.
        ("spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    # driver-side plan-construction latency (see _disable_dataframe_debugging)
    _disable_dataframe_debugging(spark)
    return spark


def streaming_state_store_conf(use_rocksdb: bool = True) -> dict[str, str]:
    """Production state-store posture for the streaming operators
    (SCALE.md §streaming state store). The default
    HDFSBackedStateStoreProvider keeps every keyed state entry ON-HEAP
    per executor — correct and fast at local/test scale, an OOM class at
    100 TB once distinct keys inside the watermark horizon approach
    executor heap. RocksDB spills state to executor-local disk with
    changelog checkpointing, bounding heap by the block cache instead of
    the key count.

    These must be set on the SparkSession BEFORE a streaming query
    starts (the provider is fixed per query at start) — hence a conf
    dict for the session builder / spark-submit rather than a runtime
    mutation in prep_session: locally the default provider remains the
    right choice (RocksDB JNI startup dominates sub-second test
    streams), so this is opt-in by construction.
    """
    if not use_rocksdb:
        return {}
    return {
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        # replay only the changelog on recovery instead of re-uploading
        # full RocksDB snapshots per batch
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
    }
