"""Interleaved same-process A/B of the inference SQL-string constructor
(optimization r12, SPARK_GRAFT_INFER_SQL gate) vs the Column constructor
on the full bench-shaped import_csvs.

Usage: python tools/ab_infer_sql_fast.py [pairs]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_stat, _single_core_probe
from csvs_to_sqlite_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_infer_sql_fast")
    spark.sparkContext.setLogLevel("ERROR")
    from csvs_to_sqlite_spark import engine

    pdf = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()

    def one_import():
        tmp = tempfile.mkdtemp(prefix="ab_infer_sql_")
        csv_path = os.path.join(tmp, "lineitem.csv")
        pdf.to_csv(csv_path, index=False)
        db_path = os.path.join(tmp, "out.db")
        t0 = time.time()
        engine.import_csvs(
            spark, [csv_path], db_path,
            extract_column=["l_returnflag", "l_linestatus"],
        )
        return time.time() - t0

    os.environ["SPARK_GRAFT_INFER_SQL"] = "1"; one_import()  # warm
    os.environ["SPARK_GRAFT_INFER_SQL"] = "0"; one_import()
    res = {"sql": [], "columns": []}
    stat0 = _cpu_stat(); probe0 = min(_single_core_probe() for _ in range(3))
    for _ in range(pairs):
        os.environ["SPARK_GRAFT_INFER_SQL"] = "1"
        res["sql"].append(one_import())
        os.environ["SPARK_GRAFT_INFER_SQL"] = "0"
        res["columns"].append(one_import())
    os.environ.pop("SPARK_GRAFT_INFER_SQL", None)
    stat1 = _cpu_stat(); probe1 = min(_single_core_probe() for _ in range(3))
    steal = None
    if stat0 and stat1 and stat1[1] > stat0[1]:
        steal = round(100.0 * (stat1[0] - stat0[0]) / (stat1[1] - stat0[1]), 2)

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    for k, v in res.items():
        print(f"{k}: median {med(v):.3f}  samples {[round(x, 3) for x in v]}")
    print({"steal_pct": steal, "probe_s": round(max(probe0, probe1), 3)})


if __name__ == "__main__":
    main()
