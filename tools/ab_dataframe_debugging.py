"""Interleaved same-process A/B of the PySpark DataFrame-debugging
call-site capture (spark.python.sql.dataFrameDebugging.enabled, default
TRUE): with it on, every decorated DataFrame/functions call pays
getActiveSession + a conf.get py4j round trip + PySparkCurrentOrigin.set
+ a Python stack walk (pyspark/errors/utils.py:290) — pure driver-side
plan-construction overhead, zero effect on executed plans or results.

The A/B flips pyspark.errors.utils._enable_debugging_cache in-process
(the exact gate the wrapper checks) so both variants run interleaved in
one session. Measures (a) pure plan CONSTRUCTION of the heaviest
query-builder entries, (b) one full bench-shaped noop execution per
entry, (c) one full import_csvs.

Usage: python tools/ab_dataframe_debugging.py [pairs]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.errors.utils as perr

from bench import _cpu_stat, _single_core_probe
from csvs_to_sqlite_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

ENTRIES = [
    "simhash_fingerprints",
    "dedup_jaccard_pairs",
    "minhash_lsh_pairs",
    "knn_lsh",
    "windowed_event_counts",
    "agg_pricing_summary",
]


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab_dataframe_debugging")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod
    from csvs_to_sqlite_spark import engine

    qs = entrymod.queries()
    pdf = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()

    def set_debug(on: bool):
        perr._enable_debugging_cache = on

    def build_all():
        t0 = time.time()
        for name in ENTRIES:
            qs[name](spark, SF)
        return time.time() - t0

    def run_all():
        t0 = time.time()
        for name in ENTRIES:
            qs[name](spark, SF).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def one_import():
        tmp = tempfile.mkdtemp(prefix="ab_dfdbg_")
        csv_path = os.path.join(tmp, "lineitem.csv")
        pdf.to_csv(csv_path, index=False)
        db_path = os.path.join(tmp, "out.db")
        t0 = time.time()
        engine.import_csvs(
            spark, [csv_path], db_path,
            extract_column=["l_returnflag", "l_linestatus"],
        )
        return time.time() - t0

    # warm-up both paths
    set_debug(True); build_all(); one_import()
    set_debug(False); build_all(); one_import()

    res = {"build_on": [], "build_off": [], "run_on": [], "run_off": [],
           "ing_on": [], "ing_off": []}
    stat0 = _cpu_stat(); probe0 = min(_single_core_probe() for _ in range(3))
    for _ in range(pairs):
        set_debug(True); res["build_on"].append(build_all())
        set_debug(False); res["build_off"].append(build_all())
        set_debug(True); res["run_on"].append(run_all())
        set_debug(False); res["run_off"].append(run_all())
        set_debug(True); res["ing_on"].append(one_import())
        set_debug(False); res["ing_off"].append(one_import())
    stat1 = _cpu_stat(); probe1 = min(_single_core_probe() for _ in range(3))
    steal = None
    if stat0 and stat1 and stat1[1] > stat0[1]:
        steal = round(100.0 * (stat1[0] - stat0[0]) / (stat1[1] - stat0[1]), 2)

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    for k, v in res.items():
        print(f"{k}: median {med(v):.3f}  samples {[round(x,3) for x in v]}")
    print({"steal_pct": steal, "probe_s": round(max(probe0, probe1), 3)})
    set_debug(None)


if __name__ == "__main__":
    main()
