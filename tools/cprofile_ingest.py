"""cProfile of one warm bench-shaped import, focused on load_csv's
driver-side split: trigger scan vs py4j plan construction vs Spark job
wait (socket recv). Warm-up import first so JIT/classloading noise is
out; the profiled import is the second.

Usage: python tools/cprofile_ingest.py [sort] [nlines]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from csvs_to_sqlite_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    sort = sys.argv[1] if len(sys.argv) > 1 else "cumulative"
    nlines = int(sys.argv[2]) if len(sys.argv) > 2 else 45
    spark = get_spark("cprofile_ingest")
    spark.sparkContext.setLogLevel("ERROR")

    from csvs_to_sqlite_spark import engine

    pdf = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()

    def one_import():
        tmp = tempfile.mkdtemp(prefix="cprofile_ingest_")
        csv_path = os.path.join(tmp, "lineitem.csv")
        pdf.to_csv(csv_path, index=False)
        db_path = os.path.join(tmp, "out.db")
        engine.import_csvs(
            spark, [csv_path], db_path,
            extract_column=["l_returnflag", "l_linestatus"],
        )

    one_import()  # warm-up
    prof = cProfile.Profile()
    prof.enable()
    one_import()
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats(sort).print_stats(nlines)


if __name__ == "__main__":
    main()
