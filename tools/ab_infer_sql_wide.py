"""Wide-file (100-column) variant of ab_infer_sql_fast: construction
cost scales with columns x files while job time scales with bytes, so a
wide import isolates the constructor's scale behavior.

Usage: python tools/ab_infer_sql_wide.py [pairs] [ncols] [nrows]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_stat, _single_core_probe
from csvs_to_sqlite_spark.session import get_spark


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    ncols = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    nrows = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    spark = get_spark("ab_infer_sql_wide")
    spark.sparkContext.setLogLevel("ERROR")
    from csvs_to_sqlite_spark import engine

    tmp = tempfile.mkdtemp(prefix="ab_wide_src_")
    csv_path = os.path.join(tmp, "wide.csv")
    with open(csv_path, "w") as f:
        f.write(",".join(f"c{i}" for i in range(ncols)) + "\n")
        for r in range(nrows):
            f.write(
                ",".join(
                    str(r * 31 + i) if i % 3 == 0
                    else (f"{(r + i) / 7:.4f}" if i % 3 == 1 else f"t{r}_{i}")
                    for i in range(ncols)
                )
                + "\n"
            )

    def one_import():
        d = tempfile.mkdtemp(prefix="ab_wide_")
        t0 = time.time()
        engine.import_csvs(spark, [csv_path], os.path.join(d, "out.db"))
        return time.time() - t0

    os.environ["SPARK_GRAFT_INFER_SQL"] = "1"; one_import()
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
