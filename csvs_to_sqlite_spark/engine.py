"""End-to-end import pipeline (reference cli.py:150-298, re-architected).

Flow: discover sources → per-file load/transform (lazy DataFrames) →
dimension build (first-appearance ids) → dims written before facts
(reference ordering, SURVEY §3.2) → fact writes with FK DDL → user
indexes → FTS. All relational work is Spark; only DDL + row landing
touch SQLite on the driver.

Known divergence (SURVEY B9): the reference mutates the --shape string
in-place when --filename-column/--fixed-column are used, breaking the
load of every SUBSEQUENT file. Our shape is immutable per-file, so later
files load fine; this is documented, deliberate, and covered by a test.
"""

from __future__ import annotations

import os
import shutil
import sqlite3
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from csvs_to_sqlite_spark.functions.cols import qcol
from pyspark.sql import types as T

from csvs_to_sqlite_spark.operators.dates import apply_dates_and_datetimes
from csvs_to_sqlite_spark.operators.dims import build_dims, canonical_value, rewrite_fk
from csvs_to_sqlite_spark.operators.rowid import ROW_ID, with_row_id
from csvs_to_sqlite_spark.operators.shapes import apply_shape, parse_shape
from csvs_to_sqlite_spark.plans.specs import DimSpec, Table
from csvs_to_sqlite_spark.sinks.sqlite_sink import SQLiteSink, best_fts_version
from csvs_to_sqlite_spark.sources.csv_source import (
    LoadCsvError,
    cleanup_decompressed_temps,
    csvs_from_paths,
    load_csv,
)


class BadParameter(ValueError):
    pass


@dataclass
class ImportResult:
    dbname: str
    db_existed: bool
    n_csvs: int = 0
    messages: list[str] = field(default_factory=list)

    @property
    def summary(self) -> str:
        # reference cli.py:285-298 (strings are asserted by golden tests)
        plural = "" if self.n_csvs == 1 else "s"
        if self.db_existed:
            return f"Added {self.n_csvs} CSV file{plural} to {self.dbname}"
        return f"Created {self.dbname} from {self.n_csvs} CSV file{plural}"


def tree_union(parts: list):
    """Union a list of same-schema DataFrames as a BALANCED tree, not a
    left-deep ``unionAll`` chain: analyzer/lineage depth is O(log n)
    instead of O(n), so callers with hundreds of parts (e.g. the dim
    prefetch below at hundreds of extracted dims) keep a flat plan —
    Catalyst's CombineUnions then collapses the tree into one n-ary
    Union node (VERDICT_r10 #7)."""
    if not parts:
        raise ValueError("tree_union needs at least one DataFrame")
    while len(parts) > 1:
        parts = [
            parts[i].unionAll(parts[i + 1]) if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    return parts[0]


def parse_extract_columns(extract_columns) -> tuple[list[DimSpec], dict[str, tuple[str, str]]]:
    """``col[:table[:label]]`` → DimSpecs + {column: (table, label)}
    (reference cli.py:230-238)."""
    specs: list[DimSpec] = []
    fks: dict[str, tuple[str, str]] = {}
    for item in extract_columns or ():
        bits = item.split(":")
        if len(bits) == 3:
            spec = DimSpec(bits[0], bits[1], bits[2])
        elif len(bits) == 2:
            spec = DimSpec(bits[0], bits[1], "value")
        else:
            spec = DimSpec(bits[0], bits[0], "value")
        specs.append(spec)
        r = spec.resolved()
        fks[r.column] = (r.table, r.value_column)
    return specs, fks


def _existing_dims(
    spark: SparkSession,
    db_path: str,
    specs: list[DimSpec],
    collect_max: int | None = None,
    spill_dirs: list[str] | None = None,
):
    """E4: read already-present lookup tables from the output db so ids are
    preserved and only misses get new numbers (reference utils.py:205-223).

    Guardrail (mirrors write_dim's ``collect_max``): a dim whose row count
    exceeds ``collect_max`` is NOT fetchall()'d through the driver — its
    rows page through the cursor into a parquet spill (one page of driver
    memory at a time) and come back as a parquet-backed DataFrame, so the
    E4 anti-join in build_dims stays fully distributed. Returns
    ``(dims, big_names)`` where ``big_names`` are the spilled (too big to
    broadcast) dims."""
    out: dict = {}
    big: set[str] = set()
    if not os.path.exists(db_path):
        return out, big
    conn = sqlite3.connect(db_path)
    try:
        for spec in (s.resolved() for s in specs):
            try:
                n = conn.execute(f"select count(*) from [{spec.table}]").fetchone()[0]
            except sqlite3.OperationalError:
                continue
            if collect_max is not None and n > collect_max:
                out[spec.table] = _page_dim_to_parquet(
                    spark, conn, spec.table, spec.value_column, spill_dirs
                )
                big.add(spec.table)
                continue
            rows = conn.execute(
                f'select id, "{spec.value_column}" from [{spec.table}]'
            ).fetchall()
            out[spec.table] = spark.createDataFrame(
                [(int(r[0]), r[1]) for r in rows], f"id long, {spec.value_column} string"
            )
    finally:
        conn.close()
    return out, big


def _page_dim_to_parquet(
    spark: SparkSession,
    conn: sqlite3.Connection,
    table: str,
    value_column: str,
    spill_dirs: list[str] | None,
    page_rows: int = 200_000,
):
    """Stream a big existing dim into a parquet spill, one fetchmany page at
    a time — the driver never holds more than one page."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="engine_dim_read_")
    if spill_dirs is not None:
        spill_dirs.append(d)
    cur = conn.execute(f'select id, "{value_column}" from [{table}] order by id')
    i = 0
    while True:
        rows = cur.fetchmany(page_rows)
        if not rows:
            break
        pq.write_table(
            pa.table(
                {
                    "id": pa.array((int(r[0]) for r in rows), pa.int64()),
                    value_column: pa.array((r[1] for r in rows), pa.string()),
                }
            ),
            os.path.join(d, f"part-{i:05d}.parquet"),
        )
        i += 1
    return spark.read.parquet(d)


def import_csvs(
    spark: SparkSession,
    paths,
    dbname: str,
    separator: str = ",",
    quoting: int = 0,
    skip_errors: bool = False,
    replace_tables: bool = False,
    table: str | None = None,
    extract_column=(),
    date=(),
    datetime=(),
    datetime_format=(),
    primary_key=(),
    fts=(),
    index=(),
    shape: str | None = None,
    filename_column: str | None = None,
    fixed_columns=(),
    fixed_columns_int=(),
    fixed_columns_float=(),
    no_index_fks: bool = False,
    no_fulltext_fks: bool = False,
    just_strings: bool = False,
) -> ImportResult:
    # G7 db naming rules (reference cli.py:184-187)
    if dbname.endswith(".csv"):
        raise BadParameter("dbname must not end with .csv")
    if "." not in dbname:
        dbname += ".db"
    result = ImportResult(dbname=dbname, db_existed=os.path.exists(dbname))

    # ingest-scoped session confs, restored on exit so analytic queries
    # keep the host session's defaults:
    # - 2m scan splits: CSV parse + the inference aggregate are CPU-bound
    #   per task and typical single-file imports are tens of MB — small
    #   splits keep all cores busy (measured: inference 3.4s → 2.1s at
    #   sf0.1). Cluster runs tune via SPARK_GRAFT_INGEST_SPLIT.
    # - codegen.maxFields 1000: the fused inference projection+aggregate
    #   carries ~10 expressions per CSV column, and wide files blow past
    #   the default 100-field WholeStageCodegen cutoff, silently dropping
    #   the hottest ingest operator to interpreted mode (measured:
    #   inference 3.6s → 2.0s at sf0.1 on 17 columns).
    _ingest_confs = {
        "spark.sql.files.maxPartitionBytes": os.environ.get(
            "SPARK_GRAFT_INGEST_SPLIT", "2m"
        ),
        "spark.sql.codegen.maxFields": "1000",
        # the string-parse cache is written once and read once (inference
        # fill → spill write) — dictionary/RLE-compressing every batch is
        # pure CPU overhead at that lifecycle
        "spark.sql.inMemoryColumnarStorage.compressed": "false",
    }
    _saved_confs = {}
    for k, v in _ingest_confs.items():
        if v:
            _saved_confs[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)

    def _restore_confs():
        for k, old in _saved_confs.items():
            try:
                if old is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, old)
            except Exception:
                pass

    # one spill write in flight at a time (guide §2.6: enough to fill the
    # tail, not enough to fight the foreground jobs for executors)
    from concurrent.futures import ThreadPoolExecutor

    spill_pool = ThreadPoolExecutor(max_workers=1)
    spill_futures: list = []
    _spills_joined = [False]

    def _join_spills(swallow: bool = False):
        """Wait for every in-flight typed-spill write and release the
        string-parse caches (the dim build reads them until here).
        Idempotent; ``swallow`` is for cleanup paths already unwinding."""
        if _spills_joined[0]:
            return
        _spills_joined[0] = True
        err = None
        for fut, c in spill_futures:
            try:
                fut.result()
            except BaseException as e:  # keep joining; re-raise after
                if err is None:
                    err = e
            finally:
                if c is not None:
                    try:
                        c.unpersist()
                    except Exception:
                        pass
        spill_pool.shutdown(wait=True)
        if err is not None and not swallow:
            raise err

    try:
        csvs = csvs_from_paths(paths)
        result.n_csvs = len(csvs)
        # C2 overrides scoping (reference cli.py:221 + utils.py:285-305): with
        # no --shape the reference passes None and every created table gets a
        # FRESH dict of its own C1 downcasts — two files whose same-named
        # column infers differently must NOT cross-contaminate DDL. With
        # --shape, apply_shape's returned dict is shared across all writes and
        # get_create_table_sql mutates it in place, so shape-derived entries
        # are global and write-time downcasts accumulate (and overwrite shape
        # entries, utils.py:303) across created tables in write order.
        shape_overrides: dict[str, str] = {}
        shape_renames = (
            {c.csv_name: c.db_name for c in parse_shape(shape)} if shape else {}
        )
        dim_specs, foreign_keys = parse_extract_columns(extract_column)
        extract_cols = {s.resolved().column for s in dim_specs}
        tables: list[Table] = []
        table_nonnulls: list[dict[str, int]] = []
        table_rowcounts: list[int] = []
        spill_dirs: list[str] = []
        for name, path in csvs.items():
            try:
                df, partition_counts, inferred_overrides, nonnull_counts, subnormal_cols = load_csv(
                    spark,
                    path,
                    separator,
                    skip_errors,
                    quoting,
                    shape,
                    just_strings,
                    _with_counts=True,
                )
                # string-parse cache (csv_source persists it so inference and
                # the spill write share ONE CSV tokenization) — released after
                # the spill lands
                src_cache = getattr(df, "__source_cache__", None)
                if shape:
                    # C1 downcasts are keyed by the write-time (db) column name
                    inferred_overrides = {
                        shape_renames[k]: v
                        for k, v in inferred_overrides.items()
                        if k in shape_renames
                    }
                    nonnull_counts = {
                        shape_renames[k]: v
                        for k, v in nonnull_counts.items()
                        if k in shape_renames
                    }
                    subnormal_cols = {
                        shape_renames[k] for k in subnormal_cols if k in shape_renames
                    }
                df, overrides = apply_shape(df, shape)
                shape_overrides.update(overrides)
                # B5-B8 constant columns (reference cli.py:202-220)
                if filename_column:
                    df = df.withColumn(filename_column, F.lit(name))
                for colname, value in fixed_columns or ():
                    df = df.withColumn(colname, F.lit(str(value)))
                for colname, value in fixed_columns_int or ():
                    df = df.withColumn(colname, F.lit(int(value)).cast("long"))
                for colname, value in fixed_columns_float or ():
                    df = df.withColumn(colname, F.lit(float(value)).cast("double"))
                    # an integral fixed float is a float64 column of one
                    # integer value, so the reference's C1 check downcasts it
                    if float(value).is_integer():
                        inferred_overrides[colname] = "INTEGER"
                df = apply_dates_and_datetimes(
                    df,
                    tuple(date),
                    tuple(datetime),
                    tuple(datetime_format),
                    nonnull_counts=nonnull_counts,
                )
                df = with_row_id(df, partition_counts=partition_counts)
                # Spill the typed frame to parquet ONCE and treat that as the
                # pipeline cache: every later action (dim extraction with
                # column pruning, the driver-side row landing) reads the
                # columnar spill instead of re-parsing the CSV or filling a
                # separate memory cache, and the fact write needs no second
                # Spark job. Columns being dimension-extracted are spilled as
                # their CANONICAL string form (fmt_g for floats) so the
                # driver-side {canonical: id} substitution hits exactly the
                # keys the Spark-built dims carry — value canonicalization
                # happens in one engine only, never twice.
                # exact-%g subnormal handling only where the inference pass saw
                # subnormals — the fact-sized canonicalization stays JVM-only in
                # the overwhelmingly common case
                n_file_rows = sum(partition_counts.values())

                def _canon(c):
                    dtype = df.schema[c].dataType
                    col = qcol(c)
                    # pandas float64-ness parity for dim labels: an int-string
                    # column WITH NA siblings is float64 in pandas (int64 can't
                    # hold NaN), so the reference's id_for_value renders its
                    # labels through %g ('9223372036854775807' + an NA sibling
                    # -> '9.22337e+18'). Our typed frame keeps long-with-nulls
                    # for exact fact values; the CANONICAL form must follow the
                    # pandas dtype (differential fuzz seed 99002 trial 32).
                    if isinstance(dtype, T.LongType) and (
                        nonnull_counts.get(c, n_file_rows) < n_file_rows
                    ):
                        col, dtype = col.cast("double"), T.DoubleType()
                    return canonical_value(
                        col, dtype, exact_subnormals=(c in subnormal_cols)
                    ).alias(c)

                proj = [
                    _canon(c) if c in extract_cols else qcol(c) for c in df.columns
                ]
                pre = df.select(*proj)
                spill = tempfile.mkdtemp(prefix="engine_spill_")
                # §2.6 overlap (optimization r12): the typed-spill write
                # runs on a second driver thread while the main thread
                # loads the next file and builds the dims — both consume
                # the SAME persisted string cache (materialized by the
                # inference aggregate inside load_csv), so nothing is
                # recomputed, and the dim build no longer waits for the
                # spill. Table.df is the PRE-SPILL frame (same schema,
                # same values — narrow transforms over the cache); only
                # the row landing and the big-dim fk re-spill read the
                # parquet files, and both run after _join_spills(). The
                # ROW_ID recomputation this adds is the documented
                # guarded with_row_id boundary (NONDETERMINISM.md): the
                # id projection raises on any partition-layout drift.
                spill_futures.append(
                    (
                        spill_pool.submit(
                            lambda p=pre, s=spill: p.write.mode(
                                "overwrite"
                            ).parquet(s)
                        ),
                        src_cache,
                    )
                )
                spill_dirs.append(spill)
                tables.append(Table(table or name, pre, overrides=inferred_overrides))
                table_nonnulls.append(nonnull_counts)
                table_rowcounts.append(sum(partition_counts.values()))
            except LoadCsvError as e:
                # A13 per-file isolation (reference cli.py:224-225)
                result.messages.append(f"Could not load {path}: {e}")

    except BaseException:
        # a non-LoadCsvError failure mid-load (Py4J/IO) must not
        # leave the host session at 2m scan splits or leak spills/temps;
        # in-flight spill writes are joined BEFORE their dirs are removed
        _join_spills(swallow=True)
        cleanup_decompressed_temps()
        for d in spill_dirs:
            shutil.rmtree(d, ignore_errors=True)
        _restore_confs()
        raise
    sink = SQLiteSink(dbname)
    try:
        dim_frames = {}
        dim_maps: dict[str, dict] = {}
        if dim_specs:
            # guardrail: above this cardinality a dim neither collects into
            # a driver map (write side, write_dim) nor fetchall()s through
            # the driver (read side, _existing_dims) — a near-unique -c
            # column would otherwise make the driver hold O(cardinality)
            dim_collect_max = int(
                os.environ.get("SPARK_GRAFT_DIM_COLLECT_MAX", "500000")
            )
            existing, existing_big = _existing_dims(
                spark,
                dbname,
                dim_specs,
                collect_max=dim_collect_max,
                spill_dirs=spill_dirs,
            )
            # an extracted column with NO non-null values stays TEXT in the
            # reference: apply(id_for_value) over all-NaN yields an object
            # column of Nones, so to_sql derives TEXT, not INTEGER
            # (utils.py:253 + 146-147); counts come free from the load's
            # fused inference aggregate (just-strings files fall back to a
            # single limit-1 probe)
            for t, nn in zip(tables, table_nonnulls):
                for c in extract_cols:
                    if c in t.df.columns:
                        n = nn.get(c)
                        if n is None:
                            n = t.df.where(qcol(c).isNotNull()).limit(1).count()
                        if n == 0:
                            t.overrides[c] = "TEXT"
                        else:
                            # the fk column's DDL follows the FK dtype
                            # (int64 → INTEGER; with nulls the reference's
                            # write-time C1 makes the float64 id column
                            # INTEGER too) — the SOURCE column's inference
                            # override must not leak onto it (a bool column
                            # whose first row is null carries TEXT, which
                            # rendered fk ids as '1.0'; differential fuzz
                            # seed 12003)
                            t.overrides.pop(c, None)
            tables, dim_frames = build_dims(
                tables, dim_specs, existing, no_broadcast=existing_big
            )
            # dims are written BEFORE facts (reference utils.py:238-254)
            label_by_dim = {s.resolved().table: s.resolved().value_column for s in dim_specs}
            # fetch every dim's rows in ONE Spark job: tag + union + a
            # per-dim limit guards each dim independently (a job round
            # trip per dim was ~0.3s each at bench scale)
            prefetched: dict[str, list] = {}
            if len(dim_frames) > 1:
                parts = [
                    dim_df.orderBy("id")
                    .limit(dim_collect_max + 1)
                    .select(
                        F.lit(dim_name).alias("__dim__"),
                        F.col("id"),
                        F.col(label_by_dim[dim_name]).cast("string").alias("__v__"),
                    )
                    for dim_name, dim_df in dim_frames.items()
                ]
                for r in tree_union(parts).collect():
                    prefetched.setdefault(r[0], []).append((r[1], r[2]))
                for rows in prefetched.values():
                    rows.sort(key=lambda t: t[0])
            for dim_name, dim_df in dim_frames.items():
                dim_maps[dim_name] = sink.write_dim(
                    dim_name,
                    dim_df,
                    label_by_dim[dim_name],
                    fts=not no_fulltext_fks,
                    collect_max=dim_collect_max,
                    prefetched_rows=prefetched.get(dim_name),
                )

        # the landing (and the big-dim fk re-spill) reads the typed spill
        # files — wait for the overlapped writes here, after the dim
        # build/prefetch they were overlapping with
        _join_spills()

        created_tables: list[str] = []
        seen_created: set[str] = set()
        shared_overrides = dict(shape_overrides) if shape else None
        for t, spill, t_nn, t_rows in zip(
            tables, spill_dirs, table_nonnulls, table_rowcounts
        ):
            if shared_overrides is not None:
                will_create = (
                    replace_tables and t.name not in seen_created
                ) or not sink.table_exists(t.name)
                if will_create:
                    # only the write-time C1 downcasts (INTEGER on a column
                    # still float in the final frame) mutate the shared
                    # dict (utils.py:290-303); appends never reach
                    # get_create_table_sql so they add nothing
                    float_cols = {
                        f.name
                        for f in t.df.schema.fields
                        if isinstance(f.dataType, (T.DoubleType, T.FloatType))
                    }
                    shared_overrides.update(
                        {
                            c: v
                            for c, v in t.overrides.items()
                            if v == "INTEGER" and c in float_cols
                        }
                    )
                    # pandas-float64 parity for columns Spark types
                    # differently: a non-extracted ALL-null column is all-NaN
                    # float64 in pandas, and an extracted fk column whose
                    # source mixed nulls with values is ids+NaN float64 —
                    # both integral, so the reference's write-time C1
                    # overwrites any shape entry with INTEGER
                    # (utils.py:290-303). Extracted columns with no nulls
                    # stay int64 (no overwrite: a shape REAL survives), and
                    # all-null EXTRACTED columns are object (no overwrite).
                    long_cols = {
                        f.name
                        for f in t.df.schema.fields
                        if isinstance(f.dataType, T.LongType)
                    }
                    for c in t.df.columns:
                        nn_c = t_nn.get(c)
                        if nn_c is None:
                            continue
                        if c in extract_cols:
                            if 0 < nn_c < t_rows:
                                shared_overrides[c] = "INTEGER"
                        elif nn_c == 0:
                            shared_overrides[c] = "INTEGER"
                        elif c in long_cols and nn_c < t_rows:
                            # int-strings + NA siblings: pandas float64 of
                            # integral values, so the reference's write-time
                            # C1 overwrites a shape REAL with INTEGER; our
                            # typed frame keeps long-with-nulls (fuzz seed
                            # 303 trial 39)
                            shared_overrides[c] = "INTEGER"
                # per-table dtype-mapping entries (uint64 INTEGER, bool-null
                # TEXT) yield to shape/C1 entries like pandas' dtype= arg
                # beats its dtype-derived DDL
                overrides = {**t.overrides, **shared_overrides}
            else:
                # no shape → the reference's dict is fresh per table
                # (utils.py:285 ``None or {}``): same-named columns in other
                # files never contaminate this table's DDL
                overrides = t.overrides
            # columns whose dim exceeded the collect guardrail have no
            # driver map: rewrite their fks with the Spark-side join
            # (non-broadcast — the dim is big by definition) and re-spill
            # in ROW_ID order so the landing keeps reference row order
            big_cols = {
                col: (dim_table, dim_maps.get(dim_table))
                for col, (dim_table, _label) in foreign_keys.items()
                if col in t.df.columns
                and dim_table in dim_frames
                and dim_maps.get(dim_table) is None
            }
            landing = spill
            if big_cols:
                land_df = spark.read.parquet(spill)
                for col, (dim_table, _none) in big_cols.items():
                    land_df = rewrite_fk(
                        land_df,
                        col,
                        dim_frames[dim_table],
                        value_column=label_by_dim[dim_table],
                        broadcast=False,
                    )
                landing = tempfile.mkdtemp(prefix="engine_spill_fk_")
                spill_dirs.append(landing)
                (
                    land_df.repartitionByRange(F.col(ROW_ID))
                    .sortWithinPartitions(ROW_ID)
                    .write.mode("overwrite")
                    .parquet(landing)
                )
            created = sink.write_table(
                t.name,
                t.df,
                sql_type_overrides=overrides,
                foreign_keys=foreign_keys,
                primary_keys=tuple(primary_key),
                replace=replace_tables and t.name not in seen_created,
                index_fks=not no_index_fks,
                # rows land straight from the typed spill (already in
                # ROW_ID order — scan-order part files, narrow transforms
                # only); extracted columns substitute their dim id through
                # the driver-side canonical→id map, so the broadcast-join
                # rewrite plan (t.df, used for DDL schema) never executes
                data_parquet_dir=landing,
                fk_maps={
                    col: dim_maps[dim_table]
                    for col, (dim_table, _label) in foreign_keys.items()
                    if col in t.df.columns and dim_maps.get(dim_table) is not None
                },
            )
            if created:
                created_tables.append(t.name)
                seen_created.add(t.name)
            for index_defn in index or ():
                sink.add_index(t.name, index_defn)

        if fts:
            if not best_fts_version():
                raise BadParameter("Your SQLite version does not support any variant of FTS")
            by_name = {t.name: t for t in tables}
            for name in created_tables:
                for fts_column in fts:
                    if fts_column not in by_name[name].df.columns:
                        raise BadParameter(f'FTS column "{fts_column}" does not exist')
            sink.create_fact_fts(created_tables, list(fts), foreign_keys)
    finally:
        _join_spills(swallow=True)  # idempotent; real errors already raised
        sink.close()
        cleanup_decompressed_temps()
        for d in spill_dirs:
            shutil.rmtree(d, ignore_errors=True)
        _restore_confs()
    return result
