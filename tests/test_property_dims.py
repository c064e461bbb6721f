"""Property test: first-appearance dim numbering (E1-E3) against a pure
Python reimplementation of the reference's sequential loop semantics
(column-outer, table-inner, row order; %g float canonicalization; nulls
skipped)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from csvs_to_sqlite_spark.operators.dims import build_dims
from csvs_to_sqlite_spark.operators.rowid import ROW_ID
from csvs_to_sqlite_spark.plans.specs import DimSpec, Table

VALUES = st.one_of(
    st.none(),
    st.integers(min_value=0, max_value=5).map(lambda i: f"v{i}"),
    st.sampled_from([0.5, 7.0, 2.25, 1200000.0]),
)


def py_canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        return f"{v:g}"
    return str(v)


def py_first_appearance(tables_cols):
    """tables_cols: per column-spec, per table, list of row values (the
    reference's nesting order). Returns [(id, value)] in id order."""
    seen = {}
    for col_values_per_table in tables_cols:
        for rows in col_values_per_table:
            for v in rows:
                c = py_canon(v)
                if c is not None and c not in seen:
                    seen[c] = len(seen) + 1
    return sorted(((i, v) for v, i in seen.items()))


@st.composite
def dim_scenarios(draw):
    n_tables = draw(st.integers(min_value=1, max_value=2))
    n_cols = draw(st.integers(min_value=1, max_value=2))
    tables = []
    for _ in range(n_tables):
        n_rows = draw(st.integers(min_value=1, max_value=6))
        cols = [
            draw(st.lists(VALUES, min_size=n_rows, max_size=n_rows))
            for _ in range(n_cols)
        ]
        tables.append(cols)
    return n_cols, tables


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=dim_scenarios())
def test_first_appearance_matches_python_oracle(spark, data):
    n_cols, raw_tables = data
    tables = []
    for t_idx, cols in enumerate(raw_tables):
        n_rows = len(cols[0])
        rows = [
            tuple([r + 1] + [str(cols[c][r]) if cols[c][r] is not None and not isinstance(cols[c][r], float) else cols[c][r] for c in range(n_cols)])
            for r in range(n_rows)
        ]
        schema_cols = ", ".join(
            f"c{c} {'double' if any(isinstance(col_v, float) for col_v in cols[c]) else 'string'}"
            for c in range(n_cols)
        )
        # mixed str/float columns in one hypothesis draw: coerce whole
        # column to float-or-none if any float present, else strings
        coerced = []
        for r in range(n_rows):
            vals = []
            for c in range(n_cols):
                col_has_float = any(isinstance(x, float) for x in cols[c])
                v = cols[c][r]
                if col_has_float:
                    vals.append(float(v) if isinstance(v, float) else None)
                    cols[c][r] = vals[-1]
                else:
                    vals.append(v)
            coerced.append(tuple([r + 1] + vals))
        df = spark.createDataFrame(coerced, f"{ROW_ID} long, {schema_cols}")
        tables.append(Table(f"t{t_idx}", df))

    specs = [DimSpec(f"c{c}", "shared_dim") for c in range(n_cols)]
    _, dims = build_dims(tables, specs)
    got = [(r["id"], r["value"]) for r in dims["shared_dim"].orderBy("id").collect()]

    # python oracle with the same nesting: column-outer, table-inner
    nested = [
        [raw_tables[t][c] for t in range(len(raw_tables))] for c in range(n_cols)
    ]
    want = py_first_appearance(nested)
    assert got == want


def test_fmt_g_infinities_and_python_parity(spark):
    """fmt_g must render ±inf the CPython way ("inf"/"-inf", not Java's
    "Infinity"), and agree with CPython %g on representative finite
    values from every regime."""
    from csvs_to_sqlite_spark.operators.dims import fmt_g
    from pyspark.sql import functions as F

    vals = [
        float("inf"),
        float("-inf"),
        1.0, 17.0, 0.5, 100000.0, 123456.0, 1200000.0, 0.004, 2.5e-7, -42.0,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["v"]: r["g"] for r in df.select("v", fmt_g(F.col("v")).alias("g")).collect()}
    for v in vals:
        assert got[v] == "{0:g}".format(v), (v, got[v])
