"""Driver-side SQLite sink — SURVEY §2 C2-C3, F1-F5, G1-G9.

SQLite is single-writer and in-process, so the sink runs on the driver:
all distributed computation happens in Spark, then sorted partitions
stream to the driver (``toLocalIterator``) into batched ``executemany``
inserts inside one transaction (SURVEY §4.4). The engine's native
large-scale sink is partitioned Parquet (parquet_sink.py); SQLite exists
for reference parity — it is never the 100 TB path.

DDL derivation replaces the reference's in-memory-SQLite type oracle
(reference utils.py:271-318) with a deterministic StructType → affinity
mapping. FTS and index DDL reproduce the reference's sink-side SQL
semantics (utils.py:362-438, 490-502) without copying its generator.
"""

from __future__ import annotations

import datetime
import hashlib
import sqlite3

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csvs_to_sqlite_spark.operators.rowid import ROW_ID

_AFFINITY = [
    ((T.LongType, T.IntegerType, T.ShortType, T.ByteType, T.BooleanType), "INTEGER"),
    ((T.DoubleType, T.FloatType, T.DecimalType), "REAL"),
    ((T.BinaryType,), "BLOB"),
]


def sqlite_type(dtype: T.DataType) -> str:
    for klasses, affinity in _AFFINITY:
        if isinstance(dtype, klasses):
            return affinity
    # strings, dates/timestamps (ISO text, SURVEY §1.2), everything else
    return "TEXT"


def create_table_sql(
    table_name: str,
    schema: T.StructType,
    sql_type_overrides: dict[str, str] | None = None,
    foreign_keys: dict[str, tuple[str, str]] | None = None,
    primary_keys: tuple[str, ...] = (),
    index: bool = False,
) -> tuple[str, list[str]]:
    """C2/C3/G1: CREATE TABLE with optional FK clauses and composite PK
    (reference utils.py:271-343). Layout mirrors the pandas-generated DDL
    the reference harvests (tests/test_utils.py:21-31)."""
    overrides = {k.lower(): v for k, v in (sql_type_overrides or {}).items()}
    lines = []
    columns = []
    if index:
        lines.append('"index" INTEGER')
        columns.append("index")
    for field in schema.fields:
        if field.name == ROW_ID:
            continue
        affinity = overrides.get(field.name.lower(), sqlite_type(field.dataType))
        lines.append(f'  "{field.name}" {affinity}')
        columns.append(field.name)
    if lines and not index:
        lines[0] = lines[0].lstrip()
    body = ",\n".join(lines)
    for col, (other_table, _label) in (foreign_keys or {}).items():
        if col in columns:  # FK only for columns actually present (utils.py:339-341)
            body += f',\n  FOREIGN KEY ("{col}") REFERENCES [{other_table}](id)'
    if primary_keys:
        pk_cols = ", ".join(f"[{c}]" for c in primary_keys)
        body += f",\n  PRIMARY KEY ({pk_cols})"
    return f'CREATE TABLE "{table_name}" (\n{body}\n)', columns


def best_fts_version() -> str | None:
    """F1: probe FTS support with trial CREATE VIRTUAL TABLE
    (reference utils.py:362-371)."""
    conn = sqlite3.connect(":memory:")
    try:
        for version in ("FTS5", "FTS4", "FTS3"):
            try:
                conn.execute(f"CREATE VIRTUAL TABLE probe USING {version} (c);")
                return version
            except sqlite3.OperationalError:
                continue
        return None
    finally:
        conn.close()


_NP_ADAPTERS_DONE = False


def _register_np_adapters() -> None:
    """Let sqlite3 bind numpy scalars directly (module-global, idempotent).
    np.float64 already subclasses float; the integer/bool types don't
    subclass int and would raise InterfaceError without an adapter."""
    global _NP_ADAPTERS_DONE
    if _NP_ADAPTERS_DONE:
        return
    import numpy as np

    for t in (np.int64, np.int32, np.int16, np.int8, np.uint64, np.uint32):
        sqlite3.register_adapter(t, int)
    sqlite3.register_adapter(np.float64, float)
    sqlite3.register_adapter(np.float32, float)
    sqlite3.register_adapter(np.bool_, int)
    _NP_ADAPTERS_DONE = True


def _to_py(value):
    if isinstance(value, bool):
        return int(value)
    if isinstance(value, datetime.datetime):
        return value.isoformat(sep=" ")
    if isinstance(value, datetime.date):
        return value.isoformat()
    if isinstance(value, (bytearray,)):
        return bytes(value)
    if isinstance(value, float) and value != value:  # NaN → NULL
        return None
    return value


class SQLiteSink:
    """One output database; multiple runs accumulate tables (G4-G6)."""

    BATCH = 100_000

    def __init__(self, db_path: str):
        self.db_path = db_path
        self.conn = sqlite3.connect(db_path)
        self.conn.execute("PRAGMA synchronous=OFF")
        self.conn.execute("PRAGMA journal_mode=MEMORY")

    def close(self):
        self.conn.commit()
        self.conn.close()

    # -- catalog ops (G4) --------------------------------------------------
    def table_exists(self, name: str) -> bool:
        row = self.conn.execute(
            "select count(*) from sqlite_master where type='table' and name=?", [name]
        ).fetchone()
        return bool(row[0])

    def drop_table(self, name: str) -> None:
        self.conn.execute(f'DROP TABLE "{name}"')

    # -- fact write (G1, G2, G5, G9) ----------------------------------------
    def write_table(
        self,
        name: str,
        df: DataFrame,
        sql_type_overrides: dict[str, str] | None = None,
        foreign_keys: dict[str, tuple[str, str]] | None = None,
        primary_keys: tuple[str, ...] = (),
        replace: bool = False,
        index_fks: bool = True,
        presorted: bool = False,
        data_parquet_dir: str | None = None,
        fk_maps: dict[str, dict] | None = None,
    ) -> bool:
        """Returns True if the table was created this call (vs appended).

        ``presorted``: the DataFrame is already in ROW_ID order across its
        partitions (true straight off a scan with narrow transforms) — the
        sink then skips the global sort before spilling.

        ``data_parquet_dir``: land rows from an ALREADY-MATERIALIZED
        sorted parquet spill instead of executing ``df`` (which then only
        supplies the DDL schema); ``fk_maps`` substitutes dim ids for the
        spilled canonical values (see ``insert_parquet_dir``)."""
        if self.table_exists(name) and replace:
            self.drop_table(name)
        created = not self.table_exists(name)
        out_cols = [c for c in df.columns if c != ROW_ID]
        if created:
            ddl, _cols = create_table_sql(
                name, df.schema, sql_type_overrides, foreign_keys, primary_keys
            )
            self.conn.execute(ddl)
        if data_parquet_dir is not None:
            self.insert_parquet_dir(name, data_parquet_dir, out_cols, fk_maps)
        else:
            self._insert_rows(name, df, out_cols, presorted)
        if created and index_fks:
            # G2 (reference utils.py:344-350). The reference issues these
            # CREATE INDEX statements before its to_sql insert; we build
            # them AFTER the bulk landing — the final database is
            # identical (same catalog, same index content), but a bulk
            # b-tree build beats per-row index maintenance during the
            # 100k-row executemany batches (~0.5s at bench scale).
            for col in foreign_keys or {}:
                if col in out_cols:
                    self.conn.execute(
                        f'CREATE INDEX ["{name}_{col}"] ON [{name}]("{col}")'
                    )
        return created

    def _insert_rows(
        self, name: str, df: DataFrame, out_cols: list[str], presorted: bool = False
    ) -> None:
        """Land rows on the driver via a sorted temp-parquet spill + Arrow.

        ``toLocalIterator`` pickles row-by-row (Python-side, slow);
        spilling to parquet keeps the executor→driver hop vectorized.
        Sorted part files preserve ROW_ID order across files (range
        partitioner → lexically ordered file names).
        """
        import glob
        import shutil
        import tempfile

        if ROW_ID in df.columns and not presorted:
            df = df.orderBy(ROW_ID)  # rowid alignment (SURVEY §4.3)
        df = df.select(*out_cols)

        tmp = tempfile.mkdtemp(prefix="sqlite_sink_")
        try:
            df.write.mode("overwrite").parquet(tmp)
            self.insert_parquet_dir(name, tmp, out_cols)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    def insert_parquet_dir(
        self,
        name: str,
        parquet_dir: str,
        out_cols: list[str],
        fk_maps: dict[str, dict] | None = None,
    ) -> None:
        """Stream a directory of sorted parquet part files into the table.

        Conversion to Python tuples goes through pandas ``itertuples``
        (C-vectorized; ~2.7× faster than per-column ``to_pylist``) with
        three exactness guards:
        - int64/uint64 columns map to pandas' NULLABLE extension dtypes,
          never float64 — ints ≥ 2^53 with NULL siblings stay exact;
        - any column containing nulls is object-cast so NaN/NaT/NA land
          as None;
        - temporal/bool/binary columns go through ``_to_py`` per value
          (ISO strings for dates, 0/1 for bools).
        numpy scalars bind through module-level sqlite3 adapters.

        ``fk_maps``: {column: {canonical_value: id}} — dimension-id
        substitution applied per batch, vectorized via pandas ``map``.
        This lets the engine land facts straight from its typed spill
        (extracted columns spilled as canonical strings) without a second
        Spark job for the broadcast fk rewrite.
        """
        import glob

        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        import pyarrow.types as pat

        _register_np_adapters()
        types_mapper = {
            pa.int64(): pd.Int64Dtype(),
            pa.int32(): pd.Int32Dtype(),
            pa.uint64(): pd.UInt64Dtype(),
        }.get
        placeholders = ", ".join("?" for _ in out_cols)
        collist = ", ".join(f'"{c}"' for c in out_cols)
        sql = f"INSERT INTO [{name}] ({collist}) VALUES ({placeholders})"
        for path in sorted(glob.glob(f"{parquet_dir}/part-*.parquet")):
            pf = pq.ParquetFile(path)
            slow_fix = {
                f.name
                for f in pf.schema_arrow
                if pat.is_temporal(f.type) or pat.is_boolean(f.type) or pat.is_binary(f.type)
            }
            for batch in pf.iter_batches(self.BATCH, columns=out_cols):
                pdf = batch.to_pandas(types_mapper=types_mapper)
                if len(pdf) == 0:
                    continue
                if list(pdf.columns) != out_cols:
                    pdf = pdf[out_cols]  # iter_batches follows file order
                # materialize each column as a list of PURE-Python scalars
                # (tolist is C-vectorized and yields int/float/str directly,
                # so executemany binds without per-value numpy adapter
                # calls — ~25% faster than itertuples of numpy scalars)
                col_lists = []
                for c in pdf.columns:
                    s = pdf[c]
                    if fk_maps and c in fk_maps:
                        # canonical string → dim id in ONE C-speed pass:
                        # dict.get returns None for both missing keys and
                        # the None key, so nulls stay NULL without a second
                        # NaN-scrub loop (was pandas map + listcomp)
                        fkm_get = fk_maps[c].get
                        col_lists.append([fkm_get(v) for v in s.tolist()])
                    elif c in slow_fix:
                        # explicit per-value conversion: a bool column with
                        # nulls ([None, True] → [None, 1]) must not coerce
                        # to float64, or TEXT affinity would store '1.0'
                        # where the reference stores '1' (differential fuzz
                        # seed 12002)
                        col_lists.append(
                            [
                                None if v is None or v != v else _to_py(v)
                                for v in s.tolist()
                            ]
                        )
                    elif s.isna().values.any():
                        # NaN/NaT/NA → None explicitly (never rely on the
                        # driver's NaN handling). ``v is pd.NA`` must be
                        # checked before ``v != v``: NA != NA returns NA,
                        # which raises on truth-testing.
                        col_lists.append(
                            [
                                None
                                if v is None or v is pd.NA or v != v
                                else v
                                for v in s.tolist()
                            ]
                        )
                    else:
                        # null-free: tolist yields exact Python ints/floats
                        # (incl. Int64/UInt64 extension columns ≥ 2^53)
                        col_lists.append(s.tolist())
                # executemany consumes the zip iterator directly — no
                # intermediate 100k-tuple list allocation per batch
                self.conn.executemany(sql, zip(*col_lists))
        self.conn.commit()

    # -- dimension write (E1/E4/F4) ------------------------------------------
    def write_dim(
        self,
        name: str,
        dim: DataFrame,
        value_column: str = "value",
        fts: bool = True,
        collect_max: int | None = None,
        prefetched_rows: list | None = None,
    ) -> dict | None:
        """Write/extend a lookup table ``(id INTEGER PRIMARY KEY, value TEXT)``
        (reference utils.py:151-182). Only ids not already present are
        inserted (E4 incremental growth). ``fts`` adds/extends the per-dim
        FTS index (F4, on by default, --no-fulltext-fks to disable).

        Returns the FULL ``{value: id}`` map (existing + new rows) — the
        dim is dim-sized and collected here anyway, and the engine reuses
        the map for driver-side fk substitution in the fact write.

        ``collect_max`` is the guardrail for near-unique extracted columns:
        when the dim exceeds it, rows stream through ``toLocalIterator``
        (one partition held at a time, driver memory stays bounded) and the
        return value is None — the engine must then rewrite fact fks with
        the Spark-side broadcast/shuffle join (operators/dims.rewrite_fk)
        instead of a driver-held map."""
        fts_version = best_fts_version() if fts else None
        if not self.table_exists(name):
            self.conn.execute(
                f'CREATE TABLE "{name}" (\n"id" INTEGER PRIMARY KEY,\n  "{value_column}" TEXT\n)'
            )
            if fts_version:
                self.conn.execute(
                    f'CREATE VIRTUAL TABLE "{name}_{value_column}_fts" '
                    f'USING {fts_version} ("{value_column}", content="{name}")'
                )
        max_id = self.conn.execute(f"select max(id) from [{name}]").fetchone()[0] or 0
        insert_sql = f'INSERT INTO [{name}] (id, "{value_column}") VALUES (?, ?)'
        fts_sql = (
            f'INSERT INTO "{name}_{value_column}_fts" (rowid, "{value_column}") VALUES (?, ?)'
        )
        fts_live = fts_version and self._fts_table_exists(f"{name}_{value_column}_fts")
        if prefetched_rows is not None:
            # the engine already fetched this dim's rows (one batched job
            # across all dims); same guardrail contract as the probe below
            probe = prefetched_rows
            collect_max = collect_max if collect_max is not None else len(probe)
        if collect_max is not None:
            # probe size and fetch in ONE job: limit(max+1) — if the extra
            # row comes back the dim is over the guardrail
            if prefetched_rows is None:
                probe = dim.orderBy("id").limit(collect_max + 1).collect()
            if len(probe) > collect_max:
                chunk: list[tuple] = []
                for r in dim.orderBy("id").toLocalIterator():
                    if r[0] > max_id:
                        chunk.append((r[0], r[1]))
                    if len(chunk) >= self.BATCH:
                        self.conn.executemany(insert_sql, chunk)
                        if fts_live:
                            self.conn.executemany(fts_sql, chunk)
                        chunk = []
                if chunk:
                    self.conn.executemany(insert_sql, chunk)
                    if fts_live:
                        self.conn.executemany(fts_sql, chunk)
                self.conn.commit()
                return None
            all_rows = probe
        else:
            all_rows = dim.orderBy("id").collect()
        rows = [(r[0], r[1]) for r in all_rows if r[0] > max_id]
        self.conn.executemany(insert_sql, rows)
        if fts_live:
            self.conn.executemany(fts_sql, rows)
        self.conn.commit()
        return {r[1]: r[0] for r in all_rows}

    def _fts_table_exists(self, name: str) -> bool:
        row = self.conn.execute(
            "select count(*) from sqlite_master where name=?", [name]
        ).fetchone()
        return bool(row[0])

    # -- user indexes (G3) ----------------------------------------------------
    def add_index(self, table: str, spec: str) -> None:
        """Compound index from 'col1,col2'; SILENTLY skipped when any column
        is missing (reference utils.py:490-502, guard at :495)."""
        cols = [c.strip() for c in spec.split(",")]
        existing = {
            r[1]
            for r in self.conn.execute(f"PRAGMA table_info([{table}])").fetchall()
        }
        if not set(cols).issubset(existing):
            return
        index_name = "{}_{}".format(table, "_".join(cols))
        collist = ", ".join(f'"{c}"' for c in cols)
        # IF NOT EXISTS: the reference re-issues CREATE INDEX on append runs
        # and crashes (utils.py:502); idempotent re-runs are strictly better
        self.conn.execute(
            f'CREATE INDEX IF NOT EXISTS ["{index_name}"] ON [{table}]({collist})'
        )
        self.conn.commit()

    # -- fact FTS (F2/F3, D2/D3 executed sink-side for bit parity) -------------
    def create_fact_fts(
        self,
        tables: list[str],
        columns: list[str],
        foreign_keys: dict[str, tuple[str, str]] | None = None,
    ) -> None:
        """FTS virtual table over fact columns; extracted (fk) columns index
        the dimension LABEL, not the id (reference utils.py:374-438,
        CHANGELOG.md:61-75). The denormalizing multi-way left join runs
        inside SQLite — the reference's one pushdown — which we keep for
        bit-parity; the Spark-side equivalent is operators/joins.denormalize.
        """
        fts_version = best_fts_version()
        if fts_version is None:
            raise RuntimeError("no FTS support in this SQLite build")
        fks = foreign_keys or {}
        quoted = ", ".join(f'"{c}"' for c in columns)
        script: list[str] = []
        for table in tables:
            script.append(
                f'CREATE VIRTUAL TABLE "{table}_fts" USING {fts_version} '
                f'({quoted}, content="{table}")'
            )
            if not fks:
                select = f"SELECT rowid, {quoted} FROM [{table}]"
            else:
                select_cols, joins = [], []
                uses_per_dim: dict[str, int] = {}
                for col in columns:
                    if col in fks:
                        dim_table, label_col = fks[col]
                        n = uses_per_dim.get(dim_table, 0) + 1
                        uses_per_dim[dim_table] = n
                        # D3: a dim joined twice needs an alias; naming matches
                        # reference utils.py:406-413 byte-for-byte
                        # (table_alias_{md5(dim)}_{n}).
                        alias = (
                            "table_alias_{}_{}".format(
                                hashlib.md5(dim_table.encode("utf8")).hexdigest(), n
                            )
                            if n > 1
                            else ""
                        )
                        ref = alias or dim_table
                        select_cols.append(f'[{ref}]."{label_col}"')
                        joins.append(
                            f'left join [{dim_table}] {alias} on [{table}]."{col}" = [{ref}].id'
                        )
                    else:
                        select_cols.append(f'"{col}"')
                select = (
                    f"SELECT [{table}].rowid, {', '.join(select_cols)} "
                    f"FROM [{table}] " + " ".join(joins)
                )
            script.append(
                f'INSERT INTO "{table}_fts" (rowid, {quoted}) {select}'
            )
        self.conn.executescript(";\n".join(script))
        self.conn.commit()
