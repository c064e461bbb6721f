"""Local stand-in for the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01, runs its
oracle_sql() twin in DuckDB over the same parquet tables, and compares
row count + sorted-column-name value hash (order-insensitive). Queries
without an oracle get a rows-only check (runs, returns a schema, >= 0
rows).

Usage: python tools/check_correctness.py [query_name ...] [--sf=DIR]
       python tools/check_correctness.py --matrix   # full sweep at
                                                    # sf0.001 + sf0.01 + sf0.1
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "∅"
    if isinstance(v, float):
        # STRICT (driver-parity): bit-exact repr, no rounding, no
        # int-collapse, -0.0 stays distinct from 0.0. Queries must make
        # their float outputs bit-stable by construction (quantize to
        # integer fixed-point before aggregating, or emit DECIMAL).
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


_SPARK_FAMILY = {
    "bigint": "int", "int": "int", "smallint": "int", "tinyint": "int",
    "double": "float", "float": "float",
    "string": "str", "boolean": "bool", "date": "date",
    "timestamp": "ts", "timestamp_ntz": "ts", "binary": "bin",
}
_DUCK_FAMILY = {
    # HUGEINT is deliberately NOT collapsed into "int": a raw DuckDB
    # sum(INTEGER) output is HUGEINT, which survives as a non-int64 type
    # through Arrow in the driver's stricter gate (the tpch_q12 class).
    # Oracles must CAST such sums to BIGINT explicitly.
    "BIGINT": "int", "INTEGER": "int", "HUGEINT": "hugeint", "SMALLINT": "int",
    "TINYINT": "int", "UBIGINT": "int", "UINTEGER": "int",
    "DOUBLE": "float", "FLOAT": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts", "TIMESTAMP WITH TIME ZONE": "ts",
    "BLOB": "bin",
}


def _family(name: str, table: dict) -> str:
    base = name.split("(")[0].strip()
    if base.upper().startswith("DECIMAL") or base.lower().startswith("decimal"):
        return "decimal"
    return table.get(base, table.get(base.upper(), "other:" + base))


def type_mismatches(sdf_schema, ocols, odesc) -> list[str]:
    """Column-name → type-FAMILY comparison (int vs float vs decimal vs
    str…). Value hashes can't catch a type drift on empty results, and a
    decimal-vs-double drift (e.g. a `100.0` literal silently switching
    Spark SQL to decimal arithmetic) deserves a static red flag."""
    sfam = {f.name: _family(f.dataType.simpleString(), _SPARK_FAMILY) for f in sdf_schema}
    out = []
    for col, typ in zip(ocols, odesc):
        ofam = _family(str(typ), _DUCK_FAMILY)
        got = sfam.get(col)
        if got is None or got.startswith("other") or ofam.startswith("other"):
            continue  # complex/unmapped types: value hash still covers them
        if got != ofam and {got, ofam} != {"int", "bool"}:
            out.append(f"{col}: spark {got} vs oracle {ofam}")
    return out


def frame_hash(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x01".join(norm_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def run_sweep(spark, sf_dir: str, selected=None) -> list[str]:
    """Run the oracle comparison for ``selected`` (default: all queries)
    at ``sf_dir``; returns the failing query names."""
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    selected = selected or list(qs)
    failures = []
    for name in selected:
        fn = qs[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {str(e)[:300]}")
            continue
        finally:
            # operators that persist() shared stages (postings,
            # signatures) have no post-return unpersist hook — release
            # them per query so a 140-entry sweep doesn't accumulate
            # cached corpora until eviction
            spark.catalog.clearCache()
        dt = time.time() - t0
        if name not in oracles:
            print(f"OK?  {name}: rows-only, {len(srows)} rows, {dt:.1f}s")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {str(e)[:300]}")
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns {sorted(scols)} != {sorted(ocols)}")
        else:
            try:
                desc = con.execute(
                    f"DESCRIBE ({oracles[name].strip().rstrip(';')})"
                ).fetchall()
                otypes = {r[0]: r[1] for r in desc}
                tm = type_mismatches(
                    sdf.schema, list(otypes), [otypes[c] for c in otypes]
                )
            except Exception:
                tm = []
            if tm:
                problems.append("type families: " + "; ".join(tm))
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            sh, oh = frame_hash(scols, srows), frame_hash(ocols, orows)
            if sh != oh:
                problems.append(f"value hash {sh} != {oh}")
                # show a sample diff
                sset = {
                    "\x01".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for r in srows
                }
                oset = {
                    "\x01".join(
                        norm_cell(r[i])
                        for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                    )
                    for r in orows
                }
                only_s = list(sset - oset)[:3]
                only_o = list(oset - sset)[:3]
                if only_s:
                    problems.append(f"spark-only: {only_s}")
                if only_o:
                    problems.append(f"oracle-only: {only_o}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"OK   {name}: {len(srows)} rows match, {dt:.1f}s")

    print(f"\n{len(selected) - len(failures)}/{len(selected)} passed")
    return failures


MATRIX_SFS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    matrix = "--matrix" in sys.argv[1:]
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    from csvs_to_sqlite_spark.session import get_spark

    spark = get_spark("correctness-check")
    if not matrix:
        return 1 if run_sweep(spark, sf_dir, args or None) else 0

    # the round-certification gate: one command proves N/N at every SF
    results = {}
    for d in MATRIX_SFS:
        if not os.path.isdir(d):
            print(f"SKIP {d}: not present")
            continue
        print(f"\n===== {d} =====")
        t0 = time.time()
        results[d] = run_sweep(spark, d, args or None)
        print(f"===== {d}: {time.time() - t0:.0f}s =====")
    print("\n===== MATRIX SUMMARY =====")
    any_fail = False
    for d, fails in results.items():
        status = "PASS" if not fails else f"FAIL ({len(fails)}: {fails[:5]})"
        any_fail = any_fail or bool(fails)
        print(f"{d}: {status}")
    return 1 if any_fail else 0


if __name__ == "__main__":
    sys.exit(main())
