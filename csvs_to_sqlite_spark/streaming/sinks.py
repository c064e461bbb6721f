"""Streaming sinks: idempotent foreachBatch landing.

``foreach_batch_parquet`` gives exactly-once file output for a streaming
aggregation: each micro-batch overwrites a batch-id-named directory, so a
replayed batch (failure/restart) lands in the same place instead of
duplicating. The same pattern with a transactional target (JDBC upsert
keyed on batch_id) is the standard exactly-once recipe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def foreach_batch_parquet(out_dir: str):
    """Returns a foreachBatch function writing each micro-batch to
    ``{out_dir}/batch={id}`` idempotently."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"batch={batch_id}")
        )

    return write


def stream_aggregate_to_parquet(spark, events_path: str, out_dir: str) -> None:
    """Watermarked windowed aggregate → idempotent parquet batches."""
    from pyspark.sql import functions as F

    from csvs_to_sqlite_spark.streaming.windows import _read_stream

    stream = _read_stream(spark, events_path)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(foreach_batch_parquet(out_dir))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
