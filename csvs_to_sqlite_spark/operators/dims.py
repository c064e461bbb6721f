"""Dimension ("lookup table") extraction — SURVEY §2 E1-E4, D1, E2-E3.

Reference semantics (utils.py:192-254) we reproduce, Spark-first:

- E1 ids are assigned 1,2,3… in order of FIRST APPEARANCE. The reference
  gets this for free from a sequential ``Series.apply`` + SQLite
  autoincrement; we synthesize it with one distinct-aggregate + a
  row_number window over ``min(order_key)``. The order key is the
  composite (column_idx, table_idx, row_id): the reference's loop nests
  column-outer (-c option order), file-inner (CLI file order), rows in
  file order (SURVEY §7.5.2).
- E2 value canonicalization before insert (utils.py:193-200): NULL → no
  dim row + NULL fk; float → ``"{0:g}"`` (7.0→"7", 0.5→"0.5"); any other
  non-string → str(value).
- E3 one dim shared by many columns/tables: dim built from the UNION of
  all referencing columns before numbering (utils.py:239-252).
- E4 incremental growth across runs: existing ids are preserved; only
  misses are appended, numbered from max(id)+1 (utils.py:205-223).
- D1 the value→id rewrite is a broadcast hash LEFT join (the reference's
  memoized point-lookup loop, utils.py:201-235, is an index-nested-loop
  join in disguise). Dims are small by construction (distinct values of
  low-cardinality columns), so broadcast is the right physical plan at
  any fact-table scale; no shuffle of the fact side, fk rewrite is a
  map-side operation.

Scale: the fact side shuffles once for the groupBy(value) distinct-
aggregate (map-side partial aggregation shrinks it to |dim| rows).
Numbering is a two-phase distributed rank — range-partition the distinct
set by first_seen, sort within partitions, per-partition offset ids — so
even a high-cardinality extraction never funnels through one partition;
facts never pass through a window at all.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.functions.cols import qcol
from pyspark.sql.types import BooleanType, DoubleType, FloatType, StringType
from csvs_to_sqlite_spark.operators.rowid import ROW_ID, global_rank, with_row_id
from csvs_to_sqlite_spark.plans.specs import DimSpec, Table


# smallest normal double; below it Java's %g diverges from CPython's
_MIN_NORMAL = 2.2250738585072014e-308
_GFMT_PY = None


def _gfmt_py():
    """Arrow-batched CPython '%g' — the subnormal fallback. Java's
    Formatter renders %g from the SHORTEST decimal repr of the double
    (Double.toString), which for subnormals has fewer than 6 significant
    digits: 1e-320 (exact value 9.99988867182683e-321) prints
    "1.00000e-320" in Java but "9.99989e-321" in CPython/C, which format
    the exact value (caught by differential fuzz seed 12001). Cached
    module-wide; only attached when the caller asks for exact subnormal
    parity, so the JVM-only fast path stays Python-free."""
    global _GFMT_PY
    if _GFMT_PY is None:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def gfmt(s: pd.Series) -> pd.Series:
            return s.map(lambda v: None if v is None or v != v else "%g" % v)

        _GFMT_PY = gfmt
    return _GFMT_PY


def fmt_g(col: F.Column, exact_subnormals: bool = True) -> F.Column:
    """CPython ``"{0:g}"`` / C printf %g. Java's %g keeps trailing zeros
    (17.0 → "17.0000"), so strip them: in the mantissa of exponent form,
    and at the end of plain form. Zeros are only stripped AFTER a decimal
    point — Java renders integral doubles in [1e5, 1e6) with no fraction
    at all ("100000"), and an unanchored ``\\.?0+$`` would eat its real
    trailing zeros ("100000" → "1"). Java also renders infinities as
    "Infinity"/"-Infinity" where CPython %g gives "inf"/"-inf".

    ``exact_subnormals``: route |x| < MIN_NORMAL through the CPython
    fallback (see _gfmt_py). Default ON (dim builds run over dim-sized
    distinct sets where the Arrow hop is free); the engine's fact-sized
    spill canonicalization turns it off when the inference pass counted
    zero subnormals in the column — the overwhelmingly common case —
    so the scan stage stays wholly JVM-side."""
    s = F.format_string("%g", col)
    s = F.regexp_replace(s, r"(\.\d*?)0+e", r"$1e")  # 1.20000e+06 → 1.2e+06
    s = F.regexp_replace(s, r"\.e", "e")  # 1.e+06 → 1e+06
    s = F.regexp_replace(s, r"(\.\d*?)0+$", r"$1")  # 17.0000 → 17., 0.500000 → 0.5
    s = F.regexp_replace(s, r"\.$", "")  # 17. → 17
    out = (
        F.when(col == F.lit(float("inf")), F.lit("inf"))
        .when(col == F.lit(float("-inf")), F.lit("-inf"))
        .otherwise(s)
    )
    if exact_subnormals:
        out = F.when(
            (F.abs(col) < F.lit(_MIN_NORMAL)) & (col != F.lit(0.0)),
            _gfmt_py()(col),
        ).otherwise(out)
    return out


def canonical_value(col: F.Column, dtype, exact_subnormals: bool = True) -> F.Column:
    """E2 (reference utils.py:193-200): the string form a value takes in a
    lookup table (golden: extracted float district renders "7", scores
    "0.5"/"0.8")."""
    if isinstance(dtype, (DoubleType, FloatType)):
        return F.when(
            col.isNotNull() & ~F.isnan(col), fmt_g(col, exact_subnormals)
        )
    if isinstance(dtype, StringType):
        return col
    if isinstance(dtype, BooleanType):
        # reference id_for_value (utils.py:146-151): a non-string,
        # non-float value renders via six.text_type — str(True) = 'True'
        return F.when(col.isNull(), F.lit(None).cast("string")).when(
            col, F.lit("True")
        ).otherwise(F.lit("False"))
    return col.cast("string")


def _dtype_of(df: DataFrame, column: str):
    return df.schema[column].dataType


def build_dims(
    tables: list[Table],
    specs: list[DimSpec],
    existing: dict[str, DataFrame] | None = None,
    no_broadcast: set[str] | None = None,
) -> tuple[list[Table], dict[str, DataFrame]]:
    """Extract all dims, rewrite fact columns to integer fks.

    ``tables`` DataFrames must carry ROW_ID. Returns rewritten tables and
    {dim_table_name: DataFrame(id long, <value_column> string)} ordered by id.

    ``no_broadcast`` names existing dims too big to broadcast (the engine's
    ``dim_collect_max`` guardrail): their E4 anti-join runs as a shuffle
    join so neither side funnels through one executor or the driver.
    """
    existing = existing or {}
    no_broadcast = no_broadcast or set()
    specs = [s.resolved() for s in specs]
    by_dim: dict[str, list[tuple[int, DimSpec]]] = {}
    for c_idx, spec in enumerate(specs):
        by_dim.setdefault(spec.table, []).append((c_idx, spec))

    dim_frames: dict[str, DataFrame] = {}
    # ALL dims' distinct-with-first-seen in ONE fused job: tag each
    # extracted column's values with its dim, union, and aggregate keyed
    # (dim, value) — one scan of the fact spill(s) no matter how many -c
    # columns, instead of one scan per dim.
    all_pieces = []
    dims_with_pieces: set[str] = set()
    for dim_name, members in by_dim.items():
        for c_idx, spec in members:
            for t_idx, table in enumerate(tables):
                if spec.column not in table.df.columns:
                    continue
                dtype = _dtype_of(table.df, spec.column)
                dims_with_pieces.add(dim_name)
                all_pieces.append(
                    table.df.select(
                        F.lit(dim_name).alias("__dim__"),
                        canonical_value(qcol(spec.column), dtype).alias("value"),
                        F.struct(
                            F.lit(c_idx).alias("c"),
                            F.lit(t_idx).alias("t"),
                            F.col(ROW_ID).alias("r"),
                        ).alias("ord"),
                    ).where(F.col("value").isNotNull())
                )
    fused = None
    if all_pieces:
        union = all_pieces[0]
        for p in all_pieces[1:]:
            union = union.unionByName(p)
        # Materialize the dim-sized distinct ONCE (localCheckpoint): the
        # rank's per-partition counting job, the id-numbering pass, and
        # the engine's dim prefetch + write all reuse these blocks instead
        # of re-running the fact-wide distinct (blocks are
        # ContextCleaner-released when the frame is GC'd).
        fused = (
            union.groupBy("__dim__", "value")
            .agg(F.min("ord").alias("first_seen"))
            .localCheckpoint(eager=True)
        )
    for dim_name, members in by_dim.items():
        value_col = members[0][1].value_column
        if dim_name not in dims_with_pieces:
            continue  # column absent from every table: no dim (reference)
        firsts = fused.where(F.col("__dim__") == dim_name).drop("__dim__")

        prior = existing.get(dim_name)
        if prior is not None:
            # E4: number only genuinely-new values, starting at max(id)+1.
            start = (prior.agg(F.max("id")).collect()[0][0] or 0) + 1
            prior_values = prior.select(F.col(value_col).alias("value"))
            if dim_name in no_broadcast:
                # prior exceeded the collect guardrail: pin the anti-join
                # to sort-merge so neither stats drift nor AQE ever puts
                # the huge dim on a broadcast
                prior_values = prior_values.hint("merge")
            else:
                prior_values = F.broadcast(prior_values)
            firsts = firsts.join(prior_values, "value", "left_anti")
        else:
            start = 1
        # Global dense rank over first_seen WITHOUT a single-partition
        # window: rowid.global_rank (range-partition pinned by
        # localCheckpoint + per-partition offset ids). Two cheap extra
        # jobs, scales to dims of any cardinality.
        ranked = global_rank(firsts, ["first_seen"], ROW_ID, start=start)
        new_rows = ranked.select(
            F.col(ROW_ID).alias("id"), F.col("value").alias(value_col)
        )
        if prior is not None:
            dim = prior.select(F.col("id").cast("long"), F.col(value_col)).unionByName(new_rows)
        else:
            dim = new_rows
        dim_frames[dim_name] = dim

    # D1: rewrite each referencing fact column via broadcast hash left join.
    out_tables = []
    for table in tables:
        df = table.df
        for spec in specs:
            if spec.column not in df.columns:
                continue
            dim = dim_frames[spec.table]
            df = rewrite_fk(df, spec.column, dim, spec.value_column)
        out_tables.append(Table(table.name, df, overrides=table.overrides))
    return out_tables, dim_frames


def rewrite_fk(
    df: DataFrame,
    column: str,
    dim: DataFrame,
    value_column: str = "value",
    broadcast: bool = True,
) -> DataFrame:
    """Replace ``column``'s values with dim ids (broadcast left join).
    NULL values stay NULL (no dim row) — reference utils.py:193-194.

    ``broadcast=False`` for dims too large to ship to every task (the
    near-unique-column case): the join falls back to a plain equi-join,
    letting AQE pick shuffle-hash vs sort-merge from runtime sizes."""
    dtype = _dtype_of(df, column)
    probe = canonical_value(qcol(column), dtype)
    dim_side = dim.select(
        F.col("id").alias("__dim_id__"), F.col(value_column).alias("__probe__")
    )
    if broadcast:
        dim_side = F.broadcast(dim_side)
    joined = df.withColumn("__probe__", probe).join(dim_side, "__probe__", "left")
    cols = [F.col("__dim_id__").alias(column) if c == column else qcol(c) for c in df.columns]
    return joined.select(*cols)
