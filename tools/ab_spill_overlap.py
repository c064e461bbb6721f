"""Interleaved same-process A/B of the §2.6 typed-spill/dim-build
overlap (optimization r12): import_csvs as shipped (spill write on a
second driver thread) vs a serial emulation (an inline executor whose
submit() runs on the calling thread — byte-identical work, no overlap).

Usage: python tools/ab_spill_overlap.py [pairs]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from concurrent import futures as futmod

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_stat, _single_core_probe
from csvs_to_sqlite_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_REAL_POOL = futmod.ThreadPoolExecutor


class _InlinePool:
    def __init__(self, max_workers=None):
        pass

    def submit(self, fn, *a, **kw):
        f = futmod.Future()
        try:
            f.set_result(fn(*a, **kw))
        except BaseException as e:
            f.set_exception(e)
        return f

    def shutdown(self, wait=True):
        pass


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_spill_overlap")
    spark.sparkContext.setLogLevel("ERROR")
    from csvs_to_sqlite_spark import engine

    pdf = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()

    def one_import():
        tmp = tempfile.mkdtemp(prefix="ab_overlap_")
        csv_path = os.path.join(tmp, "lineitem.csv")
        pdf.to_csv(csv_path, index=False)
        db_path = os.path.join(tmp, "out.db")
        t0 = time.time()
        engine.import_csvs(
            spark, [csv_path], db_path,
            extract_column=["l_returnflag", "l_linestatus"],
        )
        return time.time() - t0

    def serial():
        futmod.ThreadPoolExecutor = _InlinePool
        try:
            return one_import()
        finally:
            futmod.ThreadPoolExecutor = _REAL_POOL

    one_import(); serial()  # warm both
    res = {"overlap": [], "serial": []}
    stat0 = _cpu_stat(); probe0 = min(_single_core_probe() for _ in range(3))
    for _ in range(pairs):
        res["overlap"].append(one_import())
        res["serial"].append(serial())
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
