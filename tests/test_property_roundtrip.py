"""Property-based CSV → engine → SQLite round-trip (the reference has no
property tests — SURVEY §5c). Hypothesis generates small tables over the
type domain the reference supports (ints with blanks, floats, strings
with quotes/commas/unicode); the engine must land them in SQLite with
pandas-equivalent types and exact values.
"""

import csv
import sqlite3

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csvs_to_sqlite_spark.engine import import_csvs

# printable text without CR/LF oddities beyond what csv quoting handles
TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Cs", "Cc"), max_codepoint=0x2FFF
    ),
    min_size=0,
    max_size=12,
)

INT = st.integers(min_value=-(2**40), max_value=2**40)
FLT = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9, width=64
)


@st.composite
def tables(draw):
    n_rows = draw(st.integers(min_value=1, max_value=8))
    col_kinds = draw(
        st.lists(st.sampled_from(["int", "float", "str"]), min_size=1, max_size=4)
    )
    cols = []
    for idx, kind in enumerate(col_kinds):
        base = {"int": INT, "float": FLT, "str": TEXT}[kind]
        vals = draw(
            st.lists(st.one_of(st.none(), base), min_size=n_rows, max_size=n_rows)
        )
        cols.append((f"c{idx}", kind, vals))
    return n_rows, cols


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=tables())
def test_roundtrip(spark, tmp_path_factory, data):
    n_rows, cols = data
    tmp = tmp_path_factory.mktemp("prop")
    path = tmp / "t.csv"
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.writer(f)
        w.writerow([name for name, _, _ in cols])
        for r in range(n_rows):
            w.writerow(
                ["" if c[2][r] is None else c[2][r] for c in cols]
            )
    db = str(tmp / "t.db")
    import_csvs(spark, [str(path)], db)
    conn = sqlite3.connect(db)
    got = conn.execute('select * from t order by rowid').fetchall()
    conn.close()
    assert len(got) == n_rows
    for ci, (name, kind, vals) in enumerate(cols):
        non_null = [v for v in vals if v is not None]
        for r in range(n_rows):
            want = vals[r]
            have = got[r][ci]
            if want is None:
                # blank CSV cell → NULL, unless the column inferred as
                # string AND the blank came from an empty string (indistinct
                # in CSV; pandas also reads both as NaN)
                assert have is None
                continue
            if kind == "int" and all(isinstance(v, int) for v in non_null):
                assert have == want
            elif kind == "float":
                assert have == pytest.approx(float(want), rel=1e-12)
            else:
                # strings: numeric-looking strings may legitimately be
                # inferred as numbers (pandas does the same)
                if isinstance(have, str):
                    assert have == str(want)


def test_parquet_sink_roundtrip(spark, tmp_path):
    from csvs_to_sqlite_spark.operators.rowid import with_row_id
    from csvs_to_sqlite_spark.sinks import parquet_sink

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    df = with_row_id(df)
    out = str(tmp_path / "orders_pq")
    parquet_sink.write_fact(df, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    assert "__row_id__" not in back.columns
    # partition pruning works on the partition column: the equality
    # predicate must land in the scan's PartitionFilters (directory
    # pruning — 100 TB of other partitions are never opened), not in a
    # post-scan Filter
    plan = back.where(back.o_orderstatus == "O")._jdf.queryExecution().toString()
    assert "PartitionFilters" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters", 1)[1][:200]


def test_write_compacted_sizes_files_by_bytes(spark, tmp_path):
    """The compaction writer picks ceil(est/target) files — file count
    follows DATA size, not upstream task count (small-files guard)."""
    import glob

    from csvs_to_sqlite_spark.sinks import parquet_sink

    df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").repartition(32)
    est = parquet_sink.estimated_bytes(df)
    assert est > 0
    # huge target -> exactly one file despite 32 upstream partitions
    out1 = str(tmp_path / "one")
    n1 = parquet_sink.write_compacted(df, out1, target_bytes=10 * est)
    assert n1 == 1
    assert len(glob.glob(out1 + "/part-*")) == 1
    # quarter-sized target -> more, still far fewer than 32
    out2 = str(tmp_path / "few")
    n2 = parquet_sink.write_compacted(df, out2, target_bytes=max(est // 4, 1))
    assert 2 <= n2 <= 8
    assert len(glob.glob(out2 + "/part-*")) == n2
    back = spark.read.parquet(out2)
    assert back.count() == df.count()


def test_schema_evolution_merge_read(spark, tmp_path):
    """Appending batches that GAIN columns must stay readable: mergeSchema
    unions the schemas and backfills nulls — the contract an evolving
    100 TB dataset directory relies on."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, x string").write.parquet(p + "/batch=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, x string, score double"
    ).write.parquet(p + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "x", "score", "batch"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None
    assert rows[2]["score"] == 9.5
