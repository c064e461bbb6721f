"""Isolated measure of knn_ivfpq_residual (+ siblings): wall medians and
statusTracker job/stage counts per run (VERDICT r11 item 4's 'Done'
metric). Usage: python tools/measure_ivfpq.py [runs] [query ...]"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_stat, _single_core_probe
from csvs_to_sqlite_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT = ["knn_ivfpq_residual", "knn_ivfpq", "knn_ivf", "pq_encode", "ann_recall_matrix"]


def main():
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or DEFAULT
    import __spark_entry__ as E

    spark = get_spark("measure_ivfpq")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    st = spark.sparkContext.statusTracker()

    stat0 = _cpu_stat(); probe0 = min(_single_core_probe() for _ in range(3))
    out = {}
    for name in names:
        # warm-up run off the record
        df = qs[name](spark, SF)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        samples, jobs = [], []
        for i in range(runs):
            j0 = len(st.getJobIdsForGroup(None) or [])
            spark.sparkContext.setJobDescription(f"measure:{name}:{i}")
            t0 = time.time()
            df = qs[name](spark, SF)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            j1 = len(st.getJobIdsForGroup(None) or [])
            jobs.append(j1 - j0)
            spark.catalog.clearCache()
        samples.sort()
        out[name] = {
            "median_s": round(samples[len(samples) // 2], 3),
            "all_s": [round(x, 3) for x in samples],
            "jobs_per_run": jobs,
        }
        print(name, json.dumps(out[name]), flush=True)
    stat1 = _cpu_stat(); probe1 = min(_single_core_probe() for _ in range(3))
    steal = None
    if stat0 and stat1 and stat1[1] > stat0[1]:
        steal = round(100.0 * (stat1[0] - stat0[0]) / (stat1[1] - stat0[1]), 2)
    out["_host"] = {"steal_pct": steal, "probe_s": round(max(probe0, probe1), 3), "runs": runs, "sf": SF}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
