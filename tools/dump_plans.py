"""Dump the formatted physical plan of every queries() entry to PLANS.md —
reviewable evidence that each operator compiles to the intended plan
(broadcasts, pushdowns, partial aggs, single shuffles).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from csvs_to_sqlite_spark.session import get_spark


def explain(df, mode="formatted"):
    jmode = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — formatted physical plans at " + sf_dir,
        "",
        "Note: a `Scan ExistingRDD` leaf marks a pinned localCheckpoint "
        "(rowid.global_rank / global_cumsum / dim numbering pin their "
        "range partitioning so the two-phase metadata jobs and the final "
        "pass read identical boundaries — see SCALE.md). The work upstream "
        "of the pin (TakeOrdered heads, distinct aggregates, anti-joins) is "
        "plan-asserted in tests/test_plans.py via pre-pin spies.",
        "",
    ]
    skip = {"windowed_event_counts", "streaming_sessions", "stateful_user_totals"}
    for name, fn in entrymod.queries().items():
        if name in skip:
            out.append(f"## {name}\n\n(streaming query — plan materializes at runtime)\n")
            continue
        try:
            df = fn(spark, sf_dir)
            plan = explain(df)
        except Exception as e:  # pragma: no cover
            plan = f"ERROR: {e}"
        out.append(f"## {name}\n\n```\n{plan.strip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
