"""Per-query wall-clock sweep over every __spark_entry__.queries() entry.

Optimization-round measurement harness (guide §1): each query is
materialized with the noop sink so we time computation, not a collect.
Two phases are reported per query:

- build_s: the queries() callable itself (captures driver-side work and
  any EAGER jobs — localCheckpoint(eager=True), collect()-based
  metadata passes — that run before the returned DataFrame's action)
- exec_s:  the noop write of the returned frame

Usage:
  python tools/time_queries.py [name ...] [--runs=N] [--json=PATH]

Median of --runs (default 1) per query. Results print sorted by total
descending and optionally land as JSON for before/after diffing.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = 1
    out_json = None
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a.startswith("--json="):
            out_json = a.split("=", 1)[1]
        else:
            names.append(a)

    import __spark_entry__ as entrymod
    from csvs_to_sqlite_spark.session import get_spark

    spark = get_spark("time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    selected = names or list(qs)

    results: dict[str, dict] = {}
    for name in selected:
        fn = qs[name]
        samples = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"time_queries: {name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            spark.catalog.clearCache()
            samples.append((t1 - t0, t2 - t1, t2 - t0))
        samples.sort(key=lambda s: s[2])
        b, e, t = samples[len(samples) // 2]
        results[name] = {
            "build_s": round(b, 3),
            "exec_s": round(e, 3),
            "total_s": round(t, 3),
        }
        print(
            f"{name:35s} total {t:7.3f}  build {b:7.3f}  exec {e:7.3f}",
            flush=True,
        )

    order = sorted(results, key=lambda n: -results[n]["total_s"])
    print("\n=== sorted by total desc ===")
    for n in order:
        r = results[n]
        print(f"{n:35s} total {r['total_s']:7.3f}  build {r['build_s']:7.3f}  exec {r['exec_s']:7.3f}")
    total = sum(r["total_s"] for r in results.values())
    print(f"\nsum over {len(results)} queries: {total:.1f}s at {sf_dir}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"sf_dir": sf_dir, "runs": runs, "queries": results}, f, indent=1)
        print(f"wrote {out_json}")


if __name__ == "__main__":
    main()
