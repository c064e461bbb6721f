"""CSV sources with the reference's semantics (SURVEY.md §2.A).

Parity targets (citations into /root/reference):
- A1 scan + type inference            csvs_to_sqlite/utils.py:22-55
- A2 separator, A3 quoting, A4 bad-line policy, A5 encoding fallback
- A7 just-strings, A9-A11 path discovery/naming  utils.py:58-90
- A12 URL source                      utils.py:93-136

Spark-first design: the file is read once with ``inferSchema=False``
(everything string — exactly what the pandas C parser sees pre-inference),
then a SINGLE aggregate pass computes per-column castability and we apply
``try_cast`` projections. This reproduces pandas' int64/float64/object
outcome (including "int column with blanks is float64, later downcast to
INTEGER", reference utils.py:279-303) while remaining one distributed scan
+ one narrow projection — no row-at-a-time Python anywhere.
"""

from __future__ import annotations

import codecs
import fnmatch
import logging
import os
import tempfile
import urllib.parse
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from csvs_to_sqlite_spark.functions.cols import qcol

logger = logging.getLogger("csvs_to_sqlite_spark.csv_source")


class LoadCsvError(Exception):
    """Per-file load failure (reference utils.py:18-19); callers isolate it
    per source file (reference cli.py:224-225)."""


def _is_url(value: str) -> bool:
    # reference utils.py:80-81
    return value.lower().startswith(("http://", "https://"))


def _detect_encoding(
    filepath: str,
    encodings_to_try=("utf-8", "latin-1"),
    probe_bytes: int | None = None,
) -> str:
    """Reference utils.py:36-49 retries the whole pandas parse per encoding.

    We instead validate the byte stream incrementally on the driver
    (chunked, constant memory). ``probe_bytes`` caps how much of the file
    is validated: files up to 256 MB get the faithful full check; larger
    files AUTO-SAMPLE a 256 MB prefix (logged) so a multi-GB input never
    costs O(file) driver IO by default. Override either way with
    SPARK_GRAFT_ENCODING_PROBE_BYTES (0 = always validate everything).
    """
    if probe_bytes is None:
        env = os.environ.get("SPARK_GRAFT_ENCODING_PROBE_BYTES")
        if env is not None:
            probe_bytes = int(env) or None  # 0 = full validation
        else:
            cap = 256 << 20
            try:
                size = os.path.getsize(filepath)
            except OSError:
                size = 0
            if size > cap:
                probe_bytes = cap
                logger.warning(
                    "encoding probe: sampling first %d of %d bytes of %s "
                    "(set SPARK_GRAFT_ENCODING_PROBE_BYTES=0 to validate all)",
                    cap,
                    size,
                    filepath,
                )
    last_err: Exception | None = None
    for enc in encodings_to_try:
        decoder = codecs.getincrementaldecoder(enc)()
        try:
            remaining = probe_bytes
            with open(filepath, "rb") as f:
                while True:
                    take = 1 << 20 if remaining is None else min(1 << 20, remaining)
                    chunk = f.read(take) if take else b""
                    if not chunk:
                        # only finalize on true EOF; a sampled prefix may
                        # end mid-codepoint, which is not evidence of a
                        # bad encoding
                        if remaining is None or remaining > 0:
                            decoder.decode(b"", final=True)
                        break
                    decoder.decode(chunk)
                    if remaining is not None:
                        remaining -= len(chunk)
                        if remaining <= 0:
                            break
            return enc
        except (UnicodeDecodeError, ValueError) as e:
            last_err = e
            continue
    raise LoadCsvError(str(last_err))


# Mirrors pandas csv.QUOTE_* read-relevant behavior (reference cli.py:28-33).
_QUOTE_NONNUMERIC = 2
_QUOTE_NONE = 3
_EXTRA = "__extra_fields__"


def _pandas_header_names(fields: list[str]) -> list[str]:
    """pandas' C-parser header naming: empty cells become 'Unnamed: N';
    a duplicate gets the smallest 'name.k' (k counting up per base name)
    that collides with NEITHER the whole original header (lookahead:
    ['a', 'a', 'a.1'] → ['a', 'a.2', 'a.1']) nor an already-assigned
    name. Unit-tested cell-for-cell against pandas.read_csv."""
    base = [
        f"Unnamed: {i}" if (c is None or c == "") else c
        for i, c in enumerate(fields)
    ]
    taken = set(base)
    next_k: dict[str, int] = {}
    seen: set[str] = set()
    out: list[str] = []
    for col in base:
        if col not in seen:
            out.append(col)
            seen.add(col)
            continue
        k = next_k.get(col, 1)
        while f"{col}.{k}" in taken:
            k += 1
        cand = f"{col}.{k}"
        next_k[col] = k + 1
        taken.add(cand)
        seen.add(cand)
        out.append(cand)
    return out


def _read_header(
    local_path: str, separator: str, quoting: int, encoding: str
) -> tuple[list[str], int] | tuple[None, int]:
    """(header fields mangled pandas-style, n_index) via the csv module
    (same dialect the data read uses). ``n_index`` is pandas' implicit-
    index inference: when the FIRST data row is k fields WIDER than the
    header, the C parser treats the first k fields of every row as a
    (multi-)index — which to_sql(index=False) then drops, so the data
    shifts left and later rows wider than header+k are the actual bad
    lines (probed: 'a,b\\n1,2,3\\n' → index 1, a=2, b=3; a LATER wide row
    errors). (None, 0) = caller falls back to Spark's naming (multi-char
    separator, which the csv module can't parse)."""
    import csv as _csv

    if len(separator) != 1:
        return None, 0
    py_enc = {"ISO-8859-1": "latin-1"}.get(encoding, "utf-8-sig")
    with open(local_path, newline="", encoding=py_enc) as f:
        r = _csv.reader(
            f,
            delimiter=separator,
            quoting=_csv.QUOTE_NONE if quoting == _QUOTE_NONE else _csv.QUOTE_MINIMAL,
        )
        first = next(r, None)
        # pandas skip_blank_lines=True: empty LINES before the header are
        # skipped, the first non-empty row is the header (review finding:
        # rejecting them regressed vs the reference)
        while first == []:
            first = next(r, None)
        if not first:
            raise LoadCsvError("No columns to parse from file")
        # first non-empty DATA row decides the implicit-index width
        data = next(r, None)
        while data == []:
            data = next(r, None)
    n_index = max(0, len(data) - len(first)) if data else 0
    return _pandas_header_names(first), n_index

# pandas read_csv's default na_values (keep_default_na=True): all of these
# become NaN → SQL NULL. Spark's reader only nulls the empty string, so we
# map the rest explicitly after the all-string read.
_PANDAS_NA_TOKENS = (
    # '' is a first-class NA token: load_csv reads with a NUL nullValue
    # sentinel so QUOTED empty fields ("") survive as '' strings — the
    # uint64-conflict rawtext path keeps them literal like pandas, and
    # every other column masks them to NULL here. (Unquoted empty fields
    # are nulled inside Spark's univocity tokenizer before any option
    # applies, so an empty trailing field still can't flag a bad line —
    # the documented trailing-comma divergence stands.)
    "",
    "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
    "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN", "None",
    "n/a", "nan", "null",
)

# uint64 max as an exact decimal literal — the boundary of pandas' uint64
# tier (decimal(20,0) alone is too wide: 20-digit ints up to 10^20-1 fit it
# but overflow uint64)
import decimal as _decimal

_U64_MAX = _decimal.Decimal(18446744073709551615)

# full-size plaintext copies of compressed inputs; the engine releases
# them once the typed spill has landed (standalone load_csv callers are
# covered by the atexit backstop)
_DECOMPRESSED_TEMPS: list[str] = []


def cleanup_decompressed_temps() -> None:
    """Delete the decompressed temp copies of compressed CSV inputs.
    Safe to call any time no live Spark plan still scans them (the
    engine calls it after spilling each source to typed parquet)."""
    import contextlib

    while _DECOMPRESSED_TEMPS:
        with contextlib.suppress(OSError):
            os.unlink(_DECOMPRESSED_TEMPS.pop())


import atexit

atexit.register(cleanup_decompressed_temps)


def load_csv(
    spark: SparkSession,
    filepath: str,
    separator: str = ",",
    skip_errors: bool = False,
    quoting: int = 0,
    shape: str | None = None,
    just_strings: bool = False,
    float_parity: bool | None = None,
    _with_counts: bool = False,
) -> DataFrame:
    """A1-A8: one CSV file → typed DataFrame (reference utils.py:22-55).

    With ``_with_counts`` (engine fast path) returns
    ``(df, {partition_id: rows})`` — the counts come from the SAME
    aggregate pass as type inference, so row-id assignment needs no second
    scan."""
    from csvs_to_sqlite_spark.operators.shapes import parse_shape

    local_path = filepath
    if _is_url(filepath):
        # A12 (reference utils.py:93-136): fetch to a driver-local temp file.
        try:
            fd, local_path = tempfile.mkstemp(suffix=".csv")
            with urllib.request.urlopen(filepath) as resp, os.fdopen(fd, "wb") as out:
                while True:
                    chunk = resp.read(1 << 20)
                    if not chunk:
                        break
                    out.write(chunk)
        except Exception as e:
            raise LoadCsvError(str(e)) from e

    if not os.path.exists(local_path):
        raise LoadCsvError(f"no such file: {filepath}")
    # pandas compression='infer' parity (reference utils.py:38 —
    # pd.read_csv decompresses by EXTENSION, so the reference accepts
    # foo.csv.gz/.bz2/.xz/.zip transparently): decompress driver-side to
    # a temp file so the header/encoding probes and the Spark scan all
    # see plain bytes. Scale note: these containers are unsplittable
    # anyway (one stream), and the reference is single-process through
    # pandas on the same bytes — parity costs nothing extra.
    comp = {".gz": "gzip", ".bz2": "bz2", ".xz": "xz", ".zip": "zip"}.get(
        os.path.splitext(local_path)[1].lower()
    )
    if comp:
        import shutil

        zf = None
        try:
            if comp == "gzip":
                import gzip

                src = gzip.open(local_path, "rb")
            elif comp == "bz2":
                import bz2

                src = bz2.open(local_path, "rb")
            elif comp == "xz":
                import lzma

                src = lzma.open(local_path, "rb")
            else:
                import zipfile

                zf = zipfile.ZipFile(local_path)
                members = zf.namelist()
                if len(members) != 1:
                    zf.close()
                    raise LoadCsvError(
                        f"Multiple files found in ZIP file. Only one file per "
                        f"ZIP: {members}"
                    )
                src = zf.open(members[0])
            fd, plain = tempfile.mkstemp(suffix=".csv")
            try:
                with src, os.fdopen(fd, "wb") as out:
                    shutil.copyfileobj(src, out)
            finally:
                if zf is not None:
                    zf.close()
            _DECOMPRESSED_TEMPS.append(plain)
            local_path = plain
        except LoadCsvError:
            raise
        except Exception as e:
            raise LoadCsvError(str(e)) from e
    # Spark charset naming differs from Python's aliases
    encoding = {"latin-1": "ISO-8859-1", "utf-8": "UTF-8"}.get(
        _detect_encoding(local_path), "UTF-8"
    )

    reader = (
        spark.read.option("header", True)
        .option("sep", separator)
        .option("encoding", encoding)
        .option("inferSchema", False)
        # RFC-4180 doubled-quote escaping, the csv-module/pandas convention
        # (Spark's default escape is backslash, which pandas doesn't use)
        .option("escape", '"')
        # NUL nullValue (can't appear in a CSV cell): QUOTED empty
        # fields then survive as '' strings for the rawtext quirk; the
        # NA mask in infer_reference_types turns '' into SQL NULL
        # everywhere else. Unquoted empties are nulled by the univocity
        # tokenizer itself regardless of options.
        .option("nullValue", "\u0000")
    )
    if quoting == _QUOTE_NONE:
        # csv.QUOTE_NONE: quotes are ordinary characters.
        reader = reader.option("quote", "\u0000")
    try:
        # pandas' header semantics, computed driver-side from the first
        # line: duplicate names mangle to a, a.1, a.2… and empty cells to
        # 'Unnamed: N' (Spark's own dedup renames BOTH duplicates to a0,
        # a1, which diverges). Data columns map by POSITION via the
        # enforced schema, so only the NAMES come from this parse.
        columns, n_index = _read_header(local_path, separator, quoting, encoding)
        if columns is None:  # multi-char separator: csv module can't parse
            columns = reader.csv(local_path).columns
        # A4: pandas treats a row with more fields than the FIRST DATA ROW
        # as a bad line — an error, or dropped under --skip-errors
        # (reference utils.py:42, cli.py:34-38). A first data row k fields
        # wider than the header instead triggers pandas' implicit-index
        # inference: the first k fields of EVERY row become the index,
        # which to_sql(index=False) drops (see _read_header). Spark
        # silently truncates extras, so read with k leading index slots
        # (dropped below) plus one sentinel column beyond: a non-null
        # sentinel marks a bad line.
        idx_cols = [f"__pdindex_{j}__" for j in range(n_index)]
        probe_schema = T.StructType(
            [T.StructField(c, T.StringType()) for c in idx_cols]
            + [T.StructField(c, T.StringType()) for c in columns]
            + [T.StructField(_EXTRA, T.StringType())]
        )
        df = reader.schema(probe_schema).option("enforceSchema", True).csv(local_path)
        # pandas skip_blank_lines: a line that tokenizes to ONE whitespace-
        # only field is skipped in ANY width file (probed: an 'a,b' file
        # with a lone ' ' line keeps 2 rows; holds in implicit-index mode
        # too). Spark instead yields a row with the first slot ' ' and
        # everything else null — drop exactly that shape. Null checks
        # lead the conjunction so the regex only runs on rows whose other
        # slots are all null (never on normal data).
        all_slots = idx_cols + list(columns)
        ws_line = F.col(_EXTRA).isNull()
        for c in all_slots[1:]:
            ws_line = ws_line & qcol(c).isNull()
        first_slot = qcol(all_slots[0])
        ws_line = ws_line & first_slot.isNotNull() & first_slot.rlike(r"^\s+$")
        df = df.where(~ws_line)
        if idx_cols:
            df = df.drop(*idx_cols)
        # pandas NA semantics (default na_values → NULL) are applied by
        # infer_reference_types per-column rather than here: the uint64
        # conflict quirk (probed; see _decide_types) keeps NA tokens as
        # LITERAL text, so the raw strings must survive until the column
        # kind is known. just_strings applies the mask below.
        if skip_errors:
            df = df.where(F.col(_EXTRA).isNull()).drop(_EXTRA)
            bad_lines_pending = False
        else:
            bad_lines_pending = True  # verified during the inference pass
    except Exception as e:  # pragma: no cover - spark analysis errors
        raise LoadCsvError(str(e)) from e

    if shape:
        # A6 (reference utils.py:32-34): usecols projection at scan; a shape
        # column missing from the file is a whole-file error
        # (utils.py:54-55, [verified-run] in SURVEY A6).
        wanted = [c.csv_name for c in parse_shape(shape)]
        missing = [c for c in wanted if c not in columns]
        if missing:
            raise LoadCsvError(
                f"Usecols do not match columns, columns expected but not found: {missing}"
            )
        df = df.select(*[qcol(c) for c in wanted],
                       *([F.col(_EXTRA)] if bad_lines_pending else []))

    if just_strings:
        if bad_lines_pending:
            if df.where(F.col(_EXTRA).isNotNull()).limit(1).count():
                raise LoadCsvError("Error tokenizing data: too many fields")
            df = df.drop(_EXTRA)
        # A7 keeps pandas' NA semantics (dtype=str still na-filters)
        df = df.select(
            *[
                F.when(qcol(c).isin(*_PANDAS_NA_TOKENS), None)
                .otherwise(qcol(c))
                .alias(c)
                for c in df.columns
            ]
        )
        if _with_counts:
            counts = {
                r["__pid__"]: r["__rows__"]
                for r in df.groupBy(F.spark_partition_id().alias("__pid__"))
                .agg(F.count(F.lit(1)).alias("__rows__"))
                .collect()
            }
            return df, counts, {}, {}, set()
        return df  # A7: everything stays StringType (reference utils.py:31)
    return infer_reference_types(
        df,
        check_bad_lines=bad_lines_pending,
        return_partition_counts=_with_counts,
        quoting=quoting,
        na_masked=False,
        float_parity=float_parity,
    )


def _decide_types(
    data_cols: list[str],
    row,
    quoting: int,
    bool_ok: dict[str, bool],
    bool_first_null: dict[str, bool],
    float_parity: bool = False,
) -> tuple[dict[str, str], dict[str, str]]:
    """The pandas dtype decision table, shared by the persist-cache path
    and the single-pass spill path (pandas → SQLite affinity,
    differential-tested against the reference):

    - all-null           → float64 of NaN → C1 → INTEGER column, NULLs
    - all int-strings,
        all fit int64    → int64 → INTEGER (with NULLs: float64 upcast
                           from the EXACT int64 values; float_parity also
                           makes the stored values doubles)
        some beyond u64  → object → TEXT  (order-dependent: a POSITIVE
                           beyond-uint64 int only blocks when no float-
                           notation value precedes it; huge negatives
                           never block — probed, they ride float mode)
        int64 < v ≤ u64  → uint64 → INTEGER affinity, values as doubles
                           (the reference CRASHES in to_sql here —
                           OverflowError binding ints > int64; staying
                           graceful is a documented divergence)…
                           …UNLESS NULLs or negative ints sit alongside:
                           pandas' uint64-conflict ValueError falls back
                           to object WITHOUT NA masking, so the column is
                           TEXT with NA tokens kept as literal strings
                           (kind ``rawtext``; probed exhaustively in
                           tests/test_uint64_quirks.py)
    - all float-castable → float64; C1 all-integral keeps DOUBLE values
                           but emits INTEGER affinity (SQLite coerces per
                           value, exactly like to_sql)
    - all True/False, no NULLs → bool → INTEGER 0/1; with NULLs, affinity
                           from the reference's first-row sample
    - else               → object → TEXT

    Returns ({column: kind}, {column: DDL override}) with kind one of
    ``allnull | long | longfloat | double | pdouble | rawtext | bool |
    text`` (``longfloat``/``pdouble`` only under float_parity)."""
    kinds: dict[str, str] = {}
    overrides: dict[str, str] = {}
    total_rows = row["__rows__"]
    # pdouble = parity-parsed double values (precise_xstrtod); plain
    # 'double' keeps Spark's exact cast — the uint64-clean tier must stay
    # exact (pandas holds those as exact uint64, not parsed floats)
    dbl_kind = "pdouble" if float_parity else "double"
    for i, c in enumerate(data_cols):
        n = row[f"c{i}_n"]
        first_big = row[f"c{i}_firstbig"]
        first_float = row[f"c{i}_firstfloat"]
        big_blocks = first_big is not None and (
            first_float is None or first_float > first_big
        )
        if n == 0:
            kinds[c] = "allnull"
        elif (
            quoting == _QUOTE_NONNUMERIC
            and (row[f"c{i}_re"] == n or row[f"c{i}_dbl"] == n)
            and row[f"c{i}_ovf"] == 0
        ):
            # QUOTE_NONNUMERIC: any numeric column is float64 — int64,
            # uint64 and beyond-uint64 tiers all collapse into this branch
            # (probed: quoting=2 values match precise_xstrtod, including
            # pure-int columns)
            kinds[c] = dbl_kind
            if row[f"c{i}_nonint"] == 0:
                overrides[c] = "INTEGER"
        elif big_blocks:
            kinds[c] = "text"
        elif row[f"c{i}_re"] == n:
            if row[f"c{i}_long"] == n:
                if float_parity and n < total_rows:
                    # pandas upcasts int64-with-NaN to float64 from the
                    # exact int64 values; ≥2^53 they drift from the ints
                    kinds[c] = "longfloat"
                    overrides[c] = "INTEGER"
                else:
                    kinds[c] = "long"
            elif (row[f"c{i}_bits"] or 0) & 1:  # uint64-tier int present
                if n < total_rows or ((row[f"c{i}_bits"] or 0) & 2):
                    # uint64 conflict (NULL or negative alongside a
                    # uint64-tier int): object WITHOUT NA masking
                    kinds[c] = "rawtext"
                else:
                    # uint64-clean: INTEGER affinity, values as doubles
                    kinds[c] = "double"
                    overrides[c] = "INTEGER"
            else:
                # negative ints overflowing int64 (no uint64 candidate):
                # pandas falls back to plain (masked) object
                kinds[c] = "text"
        elif row[f"c{i}_dbl"] == n and row[f"c{i}_ovf"] == 0:
            kinds[c] = dbl_kind
            if row[f"c{i}_nonint"] == 0:
                overrides[c] = "INTEGER"  # C1 affinity-only downcast
        elif bool_ok.get(c):
            # keep BooleanType: the sink writes 0/1 (INTEGER affinity),
            # dim extraction renders 'True'/'False' like six.text_type
            kinds[c] = "bool"
            if bool_first_null.get(c):
                overrides[c] = "TEXT"
        else:
            kinds[c] = "text"
    return kinds, overrides


def infer_reference_types(
    df: DataFrame,
    check_bad_lines: bool = False,
    return_partition_counts: bool = False,
    quoting: int = 0,
    na_masked: bool = True,
    float_parity: bool | None = None,
):
    """Reproduce pandas read_csv dtype inference over an all-string frame.

    pandas outcome per column: int64 if every non-null parses as int,
    float64 if every non-null parses as float, bool if every non-null is
    True/False, else object. One aggregate job computes all columns'
    verdicts at once (scales: single scan, partial aggregation map-side).

    ``quoting=2`` (csv.QUOTE_NONNUMERIC, reference utils.py:41 passing it
    to pandas): the C parser converts numeric fields to float at parse
    time, so every column that would infer int64 — including all-quoted
    digit strings and ints beyond int64/uint64, probed on pandas 2.2 —
    lands as float64 instead; bool and object inference are unchanged,
    and the order-dependent big-int overflow rule never applies.
    ``quoting=1`` (QUOTE_ALL) changes nothing on the read side — the csv
    module only distinguishes it when WRITING — so it takes the default
    path (differential-tested).

    With ``return_partition_counts`` the same pass also yields per-scan-
    partition row counts (grouped by spark_partition_id) for row-id
    assignment, and the return value is ``(typed_df, {pid: rows})``.

    ``na_masked=False`` means ``df`` still holds the RAW cell strings and
    the pandas NA-token mask is applied here, per column — required for the
    uint64-conflict quirk (kind ``rawtext``), where pandas keeps NA tokens
    as literal text. ``float_parity`` (default: the
    SPARK_GRAFT_PANDAS_FLOAT_PARITY env toggle) parses float-column VALUES
    with the pandas precise_xstrtod port instead of Spark's correctly
    rounded cast — see functions/pandasfloat.py.
    """
    from csvs_to_sqlite_spark.functions.pandasfloat import (
        parity_double,
        parity_enabled,
    )

    if float_parity is None:
        float_parity = parity_enabled()
    data_cols = [c for c in df.columns if c != _EXTRA]
    if not data_cols:
        return (df, {}, {}, {}, set()) if return_partition_counts else df

    if na_masked:
        def m(c):
            return qcol(c)
    else:
        def m(c):
            return (
                F.when(qcol(c).isin(*_PANDAS_NA_TOKENS), None)
                .otherwise(qcol(c))
            )
    # integer-ness via regex, not try_cast("long"): Spark's string→long cast
    # rejects non-integers through an exception path (~5× slower on columns
    # with decimal values). The regex matches exactly what pandas parses as
    # int64 (optional sign/whitespace, digits only).
    int_re = r"^\s*[+-]?[0-9]+\s*$"
    # scan-order position for order-sensitive rules (pandas' conversion
    # state machine); mid = pid<<33|seq is globally ordered for file scans.
    # Materialized as a column first: Spark rejects nondeterministic
    # expressions inside aggregate functions.
    df = df.withColumn("__pos__", F.monotonically_increasing_id())
    # Stage 0: evaluate the NA mask ONCE per cell. The p-flag expressions
    # below reference each cell ~8 times; inlining the 18-token isin CASE
    # into every use doubled the sf0.1 ingest wall (13.3s vs 6.7s) —
    # Catalyst's CollapseProject keeps a non-cheap alias shared instead of
    # re-inlining it, so a separate narrow select restores the floor.
    # Partition ids and scan order are unchanged (narrow transform).
    mask_stage = df.select(
        F.col("__pos__"),
        *([F.col(_EXTRA)] if check_bad_lines else []),
        *[m(c).alias(f"__m{i}") for i, c in enumerate(data_cols)],
    )
    source_cache = None
    if return_partition_counts:
        # engine fast path: the same parse feeds the inference aggregate AND
        # the engine's canonical spill write — cache the MASKED strings so
        # the CSV is tokenized and na-masked exactly once (MEMORY_AND_DISK:
        # spills, never fails). The engine unpersists via the
        # __source_cache__ handle after its spill write. The raw frame `df`
        # stays uncached: only the uint64-conflict rawtext path reads it,
        # and that re-parse is paid solely when such a column exists.
        from pyspark import StorageLevel

        source_cache = mask_stage.persist(StorageLevel.MEMORY_AND_DISK)
        mask_stage = source_cache
    # Pre-project every shared per-row expression ONCE (regex matches and
    # numeric casts are the expensive ops; referenced directly inside ~9
    # aggregate expressions per column Spark re-evaluates them per
    # aggregate — measured 3.0s vs 1.1s for the whole pass at sf0.1).
    # The projection is a narrow transform, so partition ids and scan
    # order are unchanged.
    proj = [F.col("__pos__")]
    if check_bad_lines:
        proj.append(F.col(_EXTRA))
    for i, c in enumerate(data_cols):
        q = F.col(f"__m{i}")
        d = q.try_cast("double")
        # the int regex only ever matches double-castable strings (digits,
        # optional sign/whitespace — Spark's toDouble trims and accepts all
        # of them, saturating huge ones to ±inf), so gating on d short-
        # circuits the regex away for date/text columns (CASE WHEN skips
        # the branch; measured ~15% off the whole inference pass at sf0.1)
        re_b = F.when(d.isNotNull(), q.rlike(int_re)).otherwise(F.lit(False))
        # ≤18 digits always fits int64; the cast only runs on longer
        # matches (same trick for the beyond-uint64 decimal(20,0) probe:
        # ≤19 digits always fits uint64)
        ntrim = F.length(F.trim(q))
        proj.append(q.isNotNull().alias(f"p{i}_nn"))
        proj.append(re_b.alias(f"p{i}_re"))
        proj.append(d.alias(f"p{i}_d"))
        # int-looking strings that actually fit in int64 (pandas keeps a
        # column with overflowing ints as object → TEXT)
        fits_long = F.when(
            re_b,
            (ntrim <= 18) | q.try_cast("long").isNotNull(),
        ).otherwise(F.lit(False))
        proj.append(fits_long.alias(f"p{i}_long"))
        # pandas' int ladder classes (probed end-to-end, see
        # tests/test_uint64_quirks.py):
        #   B (p_big):  POSITIVE int strings beyond uint64 max — these
        #               abort the uint64 attempt (order-dependent float
        #               blocker). Negatives are never uint64 candidates
        #               and take the seen-sint path instead, so a huge
        #               negative must NOT block float mode (probed:
        #               ['-9.9e24-ish int', '0.5'] is float64).
        #   U (p_u64):  positive, > int64 max, ≤ uint64 max — the uint64
        #               tier; with NULLs or negative ints alongside,
        #               pandas raises the uint64-conflict and the column
        #               falls back to object WITHOUT NA masking.
        #   G (p_neg):  any negative int string (seen_sint).
        # negativity via the double cast already in hand (d < 0), never a
        # per-cell regex. ("-0" casts to -0.0 which is not < 0, but it
        # fits int64 and never reaches the uint64 ladder anyway.)
        # These two expressions (and _ovf below) are built as ONE parsed
        # SQL string each instead of ~30 Column ops: plan-construction
        # py4j chatter is real wall time on the ingest path (+0.65s per
        # 16-column import measured for the op-by-op variant). Runtime
        # subexpression elimination dedupes the repeated casts/regex.
        mc = f"`__m{i}`"
        sql_d = f"try_cast({mc} as double)"
        sql_re = (
            f"({sql_d} is not null and"
            f" {mc} rlike '^\\\\s*[+-]?[0-9]+\\\\s*$')"
        )
        sql_dec = f"try_cast({mc} as decimal(20,0))"
        sql_beyond = (
            f"case when {sql_re} and {sql_d} > 0.0d"
            f" and length(trim({mc})) > 19"
            f" then ({sql_dec} is null or {sql_dec} > 18446744073709551615bd)"
            f" else false end"
        )
        proj.append(F.expr(sql_beyond).alias(f"p{i}_big"))
        # the three remaining ladder inputs are mutually exclusive by sign
        # (negative int / zero-with-exponent / positive uint64-tier), so
        # ONE small-int class column + ONE bit_or aggregate carries all
        # their presence bits — 1/3 the plan nodes and agg buffers of
        # separate boolean columns
        sql_long = (
            f"case when {sql_re} then (length(trim({mc})) <= 18"
            f" or try_cast({mc} as bigint) is not null) else false end"
        )
        proj.append(
            F.expr(
                f"case when {sql_re} and {sql_d} < 0.0d then 2"
                f" when {sql_d} = 0.0d and"
                f" (contains({mc}, 'e') or contains({mc}, 'E')) then 4"
                f" when {sql_re} and {sql_d} > 0.0d"
                f" and not {sql_long} and not {sql_beyond} then 1"
                f" else 0 end"
            ).alias(f"p{i}_bits")
        )
        # overflow-notation floats ('1e309'): pandas' C parser sets ERANGE
        # and falls back to object (TEXT column), while Spark's cast
        # saturates to ±Infinity. Digit-bearing strings that cast to inf
        # are parse FAILURES; bare inf KEYWORDS are accepted only in
        # pandas' exact raw forms (inf/infinity, optional sign, case-
        # insensitive, NO surrounding whitespace — probed: ' inf' and
        # 'inf ' make the column object while Spark's cast trims them).
        # Applies to QUOTE_NONNUMERIC too — probed: pandas 2.2 quoting=2
        # also objects the whole column on an overflow literal. (CASE
        # short-circuits: the regexes only run on ±inf rows.)
        proj.append(
            F.expr(
                f"case when abs({sql_d}) = cast('Infinity' as double) then"
                f" ({mc} rlike '[0-9]' or"
                f" not {mc} rlike '^[+-]?(?i)(inf|infinity)$')"
                f" else false end"
            ).alias(f"p{i}_ovf")
        )
        # bool candidacy rides the SAME pass (one lower+IN per cell is far
        # cheaper than the second full scan the deferred probe used to
        # cost — lineitem-shaped files make EVERY text/date column
        # "undecided", so the probe re-read the whole file)
        proj.append(
            F.lower(q).isin("true", "false").alias(f"p{i}_bool")
        )
        if float_parity:
            # pandas-parity float values ride the same scan so the C1
            # integrality/affinity decision sees the values pandas would
            # produce (e.g. '0.000000000000000000001' collapses to 0.0,
            # flipping the column to INTEGER affinity)
            proj.append(parity_double(q).alias(f"p{i}_pd"))
    base = mask_stage.select(*proj)
    mid = F.col("__pos__")
    aggs = [F.count(F.lit(1)).alias("__rows__")]
    for i, c in enumerate(data_cols):
        nn = F.col(f"p{i}_nn")
        re_b = F.col(f"p{i}_re")
        d = F.col(f"p{i}_d")
        aggs.append(F.count(F.when(nn, 1)).alias(f"c{i}_n"))
        aggs.append(F.count(F.when(F.col(f"p{i}_bool"), 1)).alias(f"c{i}_bool"))
        aggs.append(F.count(F.when(re_b, 1)).alias(f"c{i}_re"))
        aggs.append(F.count(F.when(F.col(f"p{i}_long"), 1)).alias(f"c{i}_long"))
        # pandas' order-dependent overflow rule: an int-string beyond even
        # uint64 makes the column object UNLESS a float-notation value
        # occurred before it (then the parser is already in float mode)
        is_floatish = d.isNotNull() & ~re_b
        aggs.append(F.min(F.when(F.col(f"p{i}_big"), mid)).alias(f"c{i}_firstbig"))
        aggs.append(F.min(F.when(is_floatish, mid)).alias(f"c{i}_firstfloat"))
        # presence bits: 1 = uint64-tier int, 2 = negative int,
        # 4 = zero-valued exponent-bearing cell (the uint64-conflict and
        # '0e309' phase-2 inputs)
        aggs.append(F.bit_or(F.col(f"p{i}_bits")).alias(f"c{i}_bits"))
        aggs.append(F.count(d).alias(f"c{i}_dbl"))
        aggs.append(F.count(F.when(F.col(f"p{i}_ovf"), 1)).alias(f"c{i}_ovf"))
        # the C1/%g decisions must see the values the typed projection
        # will produce: the parity parse where enabled, Spark's correctly
        # rounded cast otherwise
        dv = F.col(f"p{i}_pd") if float_parity else d
        # subnormal doubles (|x| < 2^-1022): Java's %g formats these from
        # the shortest decimal repr and diverges from CPython — the engine
        # only pays the exact-%g Arrow fallback in its fact-sized spill
        # canonicalization when this count is nonzero (it almost never is)
        aggs.append(
            F.count(
                F.when((F.abs(dv) < 2.2250738585072014e-308) & (dv != 0.0), 1)
            ).alias(f"c{i}_subn")
        )
        # C1 (reference utils.py:290-303): `not np.isnan(v) and not
        # v.is_integer()` — NaN is SKIPPED (it's pandas-missing), inf is
        # non-integral. Integrality via `% 1.0` (stays in double): floor()
        # returns BIGINT and silently overflows for values like 1e25,
        # which would misclassify huge integral floats as non-integral
        # (caught by differential fuzz seed 9501).
        aggs.append(
            F.count(
                F.when(
                    dv.isNotNull()
                    & ~F.isnan(dv)
                    & (((dv % F.lit(1.0)) != 0.0) | (F.abs(dv) == float("inf"))),
                    1,
                )
            ).alias(f"c{i}_nonint")
        )
    if check_bad_lines:
        aggs.append(F.count(F.col(_EXTRA)).alias("__n_bad__"))
    if return_partition_counts:
        prows = (
            base.groupBy(F.spark_partition_id().alias("__pid__")).agg(*aggs).collect()
        )
        counts = {r["__pid__"]: r["__rows__"] for r in prows}

        def _combine(name):
            vals = [r[name] for r in prows]
            if name.endswith(("_firstbig", "_firstfloat")):
                nn = [v for v in vals if v is not None]
                return min(nn) if nn else None
            if name.endswith("_bits"):
                out = 0
                for v in vals:
                    out |= v or 0
                return out
            return sum(vals)

        row = (
            {name: _combine(name) for name in prows[0].asDict() if name != "__pid__"}
            if prows
            else {}
        )
    else:
        counts = None
        row = base.agg(*aggs).collect()[0].asDict()
    if check_bad_lines and row and row["__n_bad__"]:
        if source_cache is not None:
            source_cache.unpersist()
        raise LoadCsvError("Error tokenizing data: too many fields")
    if not row:  # empty file: keep all-string schema
        out = df.drop(_EXTRA, "__pos__")
        if return_partition_counts:
            out.__source_cache__ = source_cache
            return out, counts or {}, {}, {}, set()
        return out

    # '0e309'-class phase 2: zero-valued cells whose decimal exponent
    # exceeds 308 are ERANGE rejects in pandas (precise_xstrtod caps
    # significant digits at 17 BEFORE applying the exponent) though Spark
    # folds them to 0.0. Such cells are vanishingly rare, so the main
    # aggregate carries only the cheap contains('e') probe and this
    # column-pruned second aggregate pays the regex arithmetic when the
    # probe fired (reads the masked cache; no re-parse).
    zcands = [
        (i, c)
        for i, c in enumerate(data_cols)
        if ((row[f"c{i}_bits"] or 0) & 4) and row[f"c{i}_ovf"] == 0
    ]
    if zcands:
        aggs2 = []
        for i, c in zcands:
            zq = F.col(f"__m{i}")
            zd = zq.try_cast("double")
            ztrim = F.trim(zq)
            exp_lit = F.regexp_extract(
                ztrim, r"[eE]([+-]?[0-9]+)$", 1
            ).try_cast("long")
            int_digits = F.length(F.regexp_extract(ztrim, r"^[+-]?([0-9]*)", 1))
            frac_digits = F.length(
                F.regexp_extract(ztrim, r"^[+-]?[0-9]*\.([0-9]*)", 1)
            )
            pd_exp = (
                exp_lit
                + F.greatest(int_digits - 17, F.lit(0))
                - F.least(
                    frac_digits, F.greatest(F.lit(17) - int_digits, F.lit(0))
                )
            )
            aggs2.append(
                F.count(
                    F.when(
                        (zd == 0.0) & exp_lit.isNotNull() & (pd_exp > 308), 1
                    )
                ).alias(f"z{i}")
            )
        row2 = mask_stage.agg(*aggs2).collect()[0]
        for i, c in zcands:
            row[f"c{i}_ovf"] += row2[f"z{i}"]

    # bool detection for columns that are neither int nor float: the
    # candidacy count now rides the MAIN aggregate (c{i}_bool) — no
    # second scan (lineitem-shaped files made every text/date column
    # "undecided", so the deferred probe used to re-read the whole file)
    total_rows = row["__rows__"]
    undecided = [
        (i, c)
        for i, c in enumerate(data_cols)
        if row[f"c{i}_n"] > 0
        and row[f"c{i}_re"] < row[f"c{i}_n"]
        and row[f"c{i}_dbl"] < row[f"c{i}_n"]
    ]
    idx = {c: i for i, c in enumerate(data_cols)}
    bool_ok: dict[str, bool] = {}
    bool_first_null: dict[str, bool] = {}
    if undecided:
        for i, c in undecided:
            bool_ok[c] = row[f"c{i}_bool"] == row[f"c{i}_n"]
        # bool-with-NULL columns are object in pandas; the reference derives
        # the DDL from the FIRST row only (df[:1].to_sql, utils.py:305), so
        # affinity is INTEGER when row 1 holds a bool, TEXT when it is NULL
        with_null_bools = [
            c for i, c in undecided if bool_ok[c] and row[f"c{i}_n"] < total_rows
        ]
        if with_null_bools:
            first = (
                mask_stage.select(
                    *[F.col(f"__m{idx[c]}").alias(c) for c in with_null_bools]
                )
                .limit(1)
                .collect()
            )
            for c in with_null_bools:
                bool_first_null[c] = (not first) or first[0][c] is None

    kinds, overrides = _decide_types(
        data_cols, row, quoting, bool_ok, bool_first_null, float_parity
    )
    # The typed projection normally reads the CACHED masked strings (one
    # tokenize + one mask pass total). Only when a rawtext column exists
    # (the uint64-conflict quirk) does it fall back to the RAW frame —
    # re-parsing the file once more but preserving NA tokens as literals;
    # the file-split scan layout is deterministic, so partition counts
    # from the cached pass still apply.
    has_raw = any(k == "rawtext" for k in kinds.values())
    src = df if has_raw else mask_stage
    projections = []
    for c in data_cols:
        q = m(c) if has_raw else F.col(f"__m{idx[c]}")
        kind = kinds[c]
        if kind == "allnull" or kind == "long":
            projections.append(q.try_cast("long").alias(c))
        elif kind == "longfloat":
            # pandas int64→float64 upcast: EXACT int values as doubles
            projections.append(q.try_cast("long").cast("double").alias(c))
        elif kind == "double":
            projections.append(q.try_cast("double").alias(c))
        elif kind == "pdouble":
            projections.append(parity_double(q).alias(c))
        elif kind == "bool":
            projections.append((F.lower(q) == "true").alias(c))
        elif kind == "rawtext":
            # uint64-conflict quirk: RAW strings, NA tokens kept literal
            projections.append(qcol(c))
        else:  # text
            projections.append(q.alias(c))
    typed = src.select(*projections)
    if return_partition_counts:
        # per-column non-null counts ride along from the same aggregate —
        # the engine needs "is this column ALL null" for extract DDL
        # parity without a second job; ditto the subnormal-presence set
        # that gates the exact-%g spill fallback
        nonnull = {c: row[f"c{i}_n"] for i, c in enumerate(data_cols)}
        subnormal = {c for i, c in enumerate(data_cols) if row[f"c{i}_subn"]}
        typed.__source_cache__ = source_cache  # engine unpersists post-spill
        return typed, counts, overrides, nonnull, subnormal
    return typed


def _add_item(filename: str, lookup: dict[str, str], path: str) -> None:
    """A10 dedup naming: base, base-1, base-2… (reference utils.py:61-75)."""
    name = os.path.splitext(os.path.basename(filename))[0]
    if name not in lookup:
        lookup[name] = path
        return
    suffix = 1
    while f"{name}-{suffix}" in lookup:
        suffix += 1
    lookup[f"{name}-{suffix}"] = path


def csvs_from_paths(paths) -> dict[str, str]:
    """A9-A12: ordered {table_name: path} (reference utils.py:58-90).

    Files: basename sans .csv with -N dedup. Directories: os.walk, names are
    relpath/basename (may contain '/', including leading './'); NOTE the
    reference does NOT dedup on the directory path (utils.py:88) — collisions
    silently overwrite, which we replicate for parity.
    """
    csvs: dict[str, str] = {}
    for path in paths:
        if _is_url(path):
            name = os.path.splitext(os.path.basename(urllib.parse.urlparse(path).path))[0]
            _add_item(name + ".csv", csvs, path)
        elif os.path.isfile(path):
            _add_item(path, csvs, path)
        elif os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                for filename in files:
                    if fnmatch.fnmatch(filename, "*.csv"):
                        relpath = os.path.relpath(root, path)
                        namepath = os.path.join(relpath, os.path.splitext(filename)[0])
                        csvs[namepath] = os.path.join(root, filename)
        else:
            raise LoadCsvError(f"no such file or directory: {path}")
    return csvs
