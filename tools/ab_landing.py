"""Interleaved A/B of the r12 pipelined insert_parquet_dir (producer
thread converts batch N+1 while executemany binds batch N) vs the r11
sequential loop, on the real bench table (lineitem sf0.1 spilled to
parquet). Also asserts the landed rows (incl. rowids) are identical.

Usage: python tools/ab_landing.py [runs]
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import sqlite3
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_stat, _single_core_probe
from csvs_to_sqlite_spark.session import get_spark
from csvs_to_sqlite_spark.sinks import sqlite_sink
from csvs_to_sqlite_spark.sinks.sqlite_sink import SQLiteSink, _register_np_adapters, _to_py

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_insert_parquet_dir(self, name, parquet_dir, out_cols, fk_maps=None):
    """r11 sequential form (pre-pipeline), verbatim."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    _register_np_adapters()
    types_mapper = {
        pa.int64(): pd.Int64Dtype(),
        pa.int32(): pd.Int32Dtype(),
        pa.uint64(): pd.UInt64Dtype(),
    }.get
    placeholders = ", ".join("?" for _ in out_cols)
    collist = ", ".join(f'"{c}"' for c in out_cols)
    sql = f"INSERT INTO [{name}] ({collist}) VALUES ({placeholders})"
    for path in sorted(glob.glob(f"{parquet_dir}/part-*.parquet")):
        pf = pq.ParquetFile(path)
        slow_fix = {
            f.name
            for f in pf.schema_arrow
            if pat.is_temporal(f.type) or pat.is_boolean(f.type) or pat.is_binary(f.type)
        }
        for batch in pf.iter_batches(self.BATCH, columns=out_cols):
            pdf = batch.to_pandas(types_mapper=types_mapper)
            if len(pdf) == 0:
                continue
            if list(pdf.columns) != out_cols:
                pdf = pdf[out_cols]
            col_lists = []
            for c in pdf.columns:
                s = pdf[c]
                if fk_maps and c in fk_maps:
                    fkm_get = fk_maps[c].get
                    col_lists.append([fkm_get(v) for v in s.tolist()])
                elif c in slow_fix:
                    col_lists.append(
                        [None if v is None or v != v else _to_py(v) for v in s.tolist()]
                    )
                elif s.isna().values.any():
                    import pandas as pd2
                    col_lists.append(
                        [None if v is None or v is pd2.NA or v != v else v for v in s.tolist()]
                    )
                else:
                    col_lists.append(s.tolist())
            self.conn.executemany(sql, zip(*col_lists))
    self.conn.commit()


def land(variant, spill, schema_sql, out_cols):
    tmp = tempfile.mktemp(suffix=".db")
    sink = SQLiteSink(tmp)
    sink.conn.execute(schema_sql)
    t0 = time.time()
    if variant == "old":
        old_insert_parquet_dir(sink, "t", spill, out_cols)
    else:
        sink.insert_parquet_dir("t", spill, out_cols)
    dt = time.time() - t0
    h = hashlib.md5()
    for row in sink.conn.execute("select rowid, * from t order by rowid"):
        h.update(repr(row).encode())
    sink.close()
    os.unlink(tmp)
    return dt, h.hexdigest()


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_landing")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    spill = tempfile.mkdtemp(prefix="ab_landing_")
    df.coalesce(4).write.mode("overwrite").parquet(spill)
    out_cols = df.columns
    cols_sql = ", ".join(f'"{c}"' for c in out_cols)
    schema_sql = f'CREATE TABLE "t" ({cols_sql})'

    stat0 = _cpu_stat(); probe0 = min(_single_core_probe() for _ in range(3))
    land("new", spill, schema_sql, out_cols)  # warm (page cache, JIT)
    news, olds, hashes = [], [], set()
    for _ in range(runs):
        dt, h = land("new", spill, schema_sql, out_cols); news.append(dt); hashes.add(h)
        dt, h = land("old", spill, schema_sql, out_cols); olds.append(dt); hashes.add(h)
    news.sort(); olds.sort()
    stat1 = _cpu_stat(); probe1 = min(_single_core_probe() for _ in range(3))
    steal = None
    if stat0 and stat1 and stat1[1] > stat0[1]:
        steal = round(100.0 * (stat1[0] - stat0[0]) / (stat1[1] - stat0[1]), 2)
    print(json.dumps({
        "new_median_s": round(news[len(news) // 2], 3),
        "old_median_s": round(olds[len(olds) // 2], 3),
        "new_all": [round(x, 3) for x in news],
        "old_all": [round(x, 3) for x in olds],
        "rows_identical": len(hashes) == 1,
        "steal_pct": steal, "probe_s": round(max(probe0, probe1), 3),
    }))


if __name__ == "__main__":
    main()
