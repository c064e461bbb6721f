"""Finer phase split of the bench ingest path than profile_ingest.py:
additionally separates the typed-spill parquet write, the build_dims
fused job (eager localCheckpoint), and the dim prefetch collect from the
'unaccounted' bucket — the inputs to the §2.6 overlap question (can the
spill write and the dim build share wall-clock on two driver threads?).

Usage: python tools/profile_ingest_phases.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

from bench import _cpu_stat, _single_core_probe
from csvs_to_sqlite_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

TIMES: dict[str, float] = {}


def timed(name):
    def deco(fn):
        def wrap(*a, **kw):
            t0 = time.time()
            try:
                return fn(*a, **kw)
            finally:
                TIMES[name] = TIMES.get(name, 0.0) + (time.time() - t0)
        return wrap
    return deco


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("profile_ingest_phases")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import readwriter

    from csvs_to_sqlite_spark import engine
    from csvs_to_sqlite_spark.operators import dims as dims_mod
    from csvs_to_sqlite_spark.sinks import sqlite_sink

    engine.load_csv = timed("load_csv")(engine.load_csv)
    sqlite_sink.SQLiteSink.write_dim = timed("write_dim")(
        sqlite_sink.SQLiteSink.write_dim
    )
    sqlite_sink.SQLiteSink.write_table = timed("write_table")(
        sqlite_sink.SQLiteSink.write_table
    )
    # the engine's typed-spill write is the only DataFrameWriter.parquet
    # call between load_csv and build_dims on this path
    readwriter.DataFrameWriter.parquet = timed("parquet_writes")(
        readwriter.DataFrameWriter.parquet
    )
    engine.build_dims = timed("build_dims")(engine.build_dims)
    # the dim prefetch is `tree_union(parts).collect()` — time every
    # DataFrame.collect; collects inside load_csv/write_dim are double-
    # counted there, so report this bucket alongside, not summed
    from pyspark.sql import dataframe as df_mod

    df_mod.DataFrame.collect = timed("all_collects")(df_mod.DataFrame.collect)

    pdf = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    stat0 = _cpu_stat()
    probe0 = min(_single_core_probe() for _ in range(3))
    for _ in range(runs):
        TIMES.clear()
        tmp = tempfile.mkdtemp(prefix="profile_ingest_phases_")
        csv_path = os.path.join(tmp, "lineitem.csv")
        pdf.to_csv(csv_path, index=False)
        db_path = os.path.join(tmp, "out.db")
        t0 = time.time()
        engine.import_csvs(
            spark, [csv_path], db_path,
            extract_column=["l_returnflag", "l_linestatus"],
        )
        total = time.time() - t0
        rec = dict(TIMES)
        rec["TOTAL"] = total
        rec["unaccounted"] = total - sum(
            v for k, v in TIMES.items()
            if k in (
                "load_csv", "write_dim", "write_table",
                "parquet_writes", "build_dims",
            )  # all_collects overlaps these buckets; excluded from the sum
        )
        print({k: round(v, 2) for k, v in sorted(rec.items())}, flush=True)
    stat1 = _cpu_stat()
    probe1 = min(_single_core_probe() for _ in range(3))
    steal = None
    if stat0 and stat1 and stat1[1] > stat0[1]:
        steal = round(100.0 * (stat1[0] - stat0[0]) / (stat1[1] - stat0[1]), 2)
    print({"steal_pct": steal, "probe_s": round(max(probe0, probe1), 3)})


if __name__ == "__main__":
    main()
