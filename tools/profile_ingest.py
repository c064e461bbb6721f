"""Phase-level profile of the bench ingest path (VERDICT r11 item 3):
where do the ~7 settled seconds of bench_ingest_sqlite go?

Phases timed by monkeypatch-wrapping the interesting boundaries:
- load_csv (inference aggregate + trigger scan + typed frame build)
- spill write (typed parquet spill)
- dims (build + write)
- landing (insert_parquet_dir: parquet read + python conversion vs
  sqlite executemany, split via inner timers)

Usage: python tools/profile_ingest.py [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sqlite3
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
    spark = get_spark("profile_ingest")
    spark.sparkContext.setLogLevel("ERROR")

    from csvs_to_sqlite_spark import engine
    from csvs_to_sqlite_spark.sinks import sqlite_sink
    from csvs_to_sqlite_spark.sources import csv_source

    # wrap phase boundaries
    engine.load_csv = timed("load_csv")(engine.load_csv)
    sqlite_sink.SQLiteSink.write_dim = timed("write_dim")(sqlite_sink.SQLiteSink.write_dim)
    sqlite_sink.SQLiteSink.write_table = timed("write_table")(sqlite_sink.SQLiteSink.write_table)
    sqlite_sink.SQLiteSink.create_fact_fts = timed("fts")(sqlite_sink.SQLiteSink.create_fact_fts)

    # split the landing: conversion (parquet->pandas->pylists) vs executemany
    orig_insert = sqlite_sink.SQLiteSink.insert_parquet_dir

    real_executemany = sqlite3.Connection.executemany

    def landing(self, name, parquet_dir, out_cols, fk_maps=None):
        t0 = time.time()
        em_time = [0.0]
        conn = self.conn

        class TimedConn:
            def __getattr__(self, a):
                return getattr(conn, a)

            def executemany(self, sql, rows):
                # rows is a lazy zip: materialize first so conversion cost
                # stays out of the executemany bucket
                rows = list(rows)
                t = time.time()
                r = real_executemany(conn, sql, rows)
                em_time[0] += time.time() - t
                return r

        self.conn = TimedConn()
        try:
            orig_insert(self, name, parquet_dir, out_cols, fk_maps)
        finally:
            self.conn = conn
        TIMES["landing_total"] = TIMES.get("landing_total", 0.0) + (time.time() - t0)
        TIMES["landing_executemany"] = TIMES.get("landing_executemany", 0.0) + em_time[0]

    sqlite_sink.SQLiteSink.insert_parquet_dir = landing

    # the bench's own ingest body (bench.py:bench_ingest_sqlite), phase-run
    pdf = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    stat0 = _cpu_stat(); probe0 = min(_single_core_probe() for _ in range(3))
    per_run = []
    for i in range(runs):
        TIMES.clear()
        tmp = tempfile.mkdtemp(prefix="profile_ingest_")
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
            if k in ("load_csv", "write_dim", "write_table", "fts")
        )
        per_run.append(rec)
        print({k: round(v, 2) for k, v in sorted(rec.items())}, flush=True)
    stat1 = _cpu_stat(); probe1 = min(_single_core_probe() for _ in range(3))
    steal = None
    if stat0 and stat1 and stat1[1] > stat0[1]:
        steal = round(100.0 * (stat1[0] - stat0[0]) / (stat1[1] - stat0[1]), 2)
    print({"steal_pct": steal, "probe_s": round(max(probe0, probe1), 3)})


if __name__ == "__main__":
    main()
