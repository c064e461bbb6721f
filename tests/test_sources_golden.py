"""Golden tests for source-layer behaviors (SURVEY §2.A) and the CLI
surface, ported from the reference suite. CLI invocations use Click's
CliRunner exactly like the reference's tests."""

import sqlite3

import pytest
from click.testing import CliRunner

from csvs_to_sqlite_spark.engine import import_csvs
from csvs_to_sqlite_spark.sources.csv_source import LoadCsvError, csvs_from_paths, load_csv

CSV = """county,precinct,office,district,party,candidate,votes
Yolo,100001,President,,LIB,Gary Johnson,41
Yolo,100001,President,,PAF,Gloria Estela La Riva,8
Yolo,100001,Proposition 51,,,Yes,2802
Yolo,100001,Proposition 51,,,No,2051
Yolo,100001,State Assembly,7,DEM,Kevin McCarty,3920
Yolo,100001,State Assembly,7,REP,Ryan K Brown,1793"""

FILMS = """film,actor_1,actor_2
The Rock,Sean Connery,Nicolas Cage
National Treasure,Nicolas Cage,Diane Kruger
Troy,Diane Kruger,Orlando Bloom"""


def test_directory_naming(tmp_path):
    """A11: relpath/basename names, including the './' prefix
    (reference utils.py:86-88, golden tests:328-339)."""
    d = tmp_path / "d"
    (d / "sub").mkdir(parents=True)
    (d / "a.csv").write_text(CSV)
    (d / "sub" / "a.csv").write_text(CSV)
    names = set(csvs_from_paths([str(d)]))
    assert names == {"./a", "sub/a"}


def test_file_dedup_naming(tmp_path):
    (tmp_path / "x").mkdir()
    (tmp_path / "y").mkdir()
    f1 = tmp_path / "x" / "test.csv"
    f2 = tmp_path / "y" / "test.csv"
    f1.write_text(CSV)
    f2.write_text(CSV)
    assert list(csvs_from_paths([str(f1), str(f2)])) == ["test", "test-1"]


def test_url_naming():
    names = csvs_from_paths(["https://example.com/data/mytable.csv?x=1"])
    assert list(names) == ["mytable"]


def test_url_source_end_to_end(spark, tmp_path):
    """A12: load a CSV over HTTP (local server) through the engine."""
    import http.server
    import threading

    (tmp_path / "remote.csv").write_text(CSV)
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(tmp_path), **kw
    )
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        db = str(tmp_path / "url.db")
        result = import_csvs(spark, [f"http://127.0.0.1:{port}/remote.csv"], db)
        assert result.messages == []
        conn = sqlite3.connect(db)
        assert conn.execute("select count(*) from remote").fetchone()[0] == 6
        info = {c[1]: c[2] for c in conn.execute("PRAGMA table_info(remote)")}
        assert info["votes"] == "INTEGER"
        conn.close()
    finally:
        server.shutdown()


def test_shared_dim_across_files_ordering(spark, tmp_path):
    """E3: with one dim referenced from two FILES, ids number file-inner
    (CLI file order) — every file-1 value before any new file-2 value."""
    f1 = tmp_path / "f1.csv"
    f2 = tmp_path / "f2.csv"
    f1.write_text("name,score\nZed,1\nAmy,2")
    f2.write_text("name,score\nBob,3\nZed,4\nCal,5")
    db = str(tmp_path / "shared.db")
    import_csvs(spark, [str(f1), str(f2)], db, extract_column=["name:people:who"])
    conn = sqlite3.connect(db)
    assert conn.execute("select id, who from people order by id").fetchall() == [
        (1, "Zed"),
        (2, "Amy"),
        (3, "Bob"),
        (4, "Cal"),
    ]
    conn.close()


def test_separator_tsv(spark, tmp_path):
    p = tmp_path / "t.tsv"
    p.write_text("a\tb\n1\tx\n2\ty\n")
    df = load_csv(spark, str(p), separator="\t")
    assert df.columns == ["a", "b"]
    assert df.count() == 2
    assert dict(df.dtypes)["a"] == "bigint"


def test_quote_none(spark, tmp_path):
    """A3: csv.QUOTE_NONE treats quotes as data."""
    p = tmp_path / "q.csv"
    p.write_text('a,b\n"x,1\n')
    df = load_csv(spark, str(p), quoting=3)
    assert df.collect()[0][0] == '"x'


def test_skip_errors(spark, tmp_path):
    """A4: malformed rows dropped with --skip-errors, fatal without."""
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,x\n2,y,EXTRA,FIELDS\n3,z\n")
    df = load_csv(spark, str(p), skip_errors=True)
    assert df.count() == 2
    with pytest.raises(Exception):
        load_csv(spark, str(p), skip_errors=False).collect()


def test_encoding_fallback_latin1(spark, tmp_path):
    """A5: utf-8 fails → latin-1 retry (reference utils.py:36-49)."""
    p = tmp_path / "enc.csv"
    p.write_bytes(b"name,city\nJos\xe9,S\xe3o Paulo\n")  # latin-1 bytes
    df = load_csv(spark, str(p))
    row = df.collect()[0]
    assert row["name"] == "José"
    assert row["city"] == "São Paulo"


def test_encoding_probe_sampling(tmp_path):
    """probe_bytes samples a prefix; a sample boundary mid-codepoint must
    not misclassify a valid utf-8 file."""
    from csvs_to_sqlite_spark.sources.csv_source import _detect_encoding

    p = tmp_path / "u.csv"
    p.write_bytes("a,b\n".encode() + ("é" * 100).encode("utf-8"))
    # 5 bytes ends inside the 2-byte é sequence
    assert _detect_encoding(str(p), probe_bytes=5) == "utf-8"
    assert _detect_encoding(str(p)) == "utf-8"
    latin = tmp_path / "l.csv"
    latin.write_bytes(b"a\n" + b"\xe9" * 64)
    assert _detect_encoding(str(latin), probe_bytes=16) == "latin-1"


def test_shape_missing_column_is_load_error(spark, tmp_path):
    """A6: shape naming a column not in the file fails the whole file."""
    p = tmp_path / "s.csv"
    p.write_text("a,b\n1,2\n")
    with pytest.raises(LoadCsvError, match="Usecols"):
        load_csv(spark, str(p), shape="a:A,nope:N")


def test_shape_mutation_divergence(spark, tmp_path):
    """B9: the reference's shape-string mutation breaks loading of every
    file after the first when --shape is combined with --filename-column
    ([verified-run] in SURVEY). Our per-file immutable specs load BOTH
    files — deliberate, documented divergence."""
    f1 = tmp_path / "one.csv"
    f2 = tmp_path / "two.csv"
    f1.write_text(CSV)
    f2.write_text(CSV)
    db = str(tmp_path / "out.db")
    result = import_csvs(
        spark,
        [str(f1), str(f2)],
        db,
        shape="county:Cty,votes:Vts",
        filename_column="src",
    )
    assert result.messages == []  # no per-file failures
    conn = sqlite3.connect(db)
    assert conn.execute("select count(*) from one").fetchone()[0] == 6
    assert conn.execute("select count(*) from two").fetchone()[0] == 6
    assert conn.execute("select distinct src from two").fetchall() == [("two",)]
    conn.close()


def test_no_index_fks_and_no_fulltext_fks(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(CSV)
    db = str(tmp_path / "t.db")
    import_csvs(
        spark,
        [str(p)],
        db,
        extract_column=["office"],
        no_index_fks=True,
        no_fulltext_fks=True,
    )
    conn = sqlite3.connect(db)
    master = [r[0] for r in conn.execute("select name from sqlite_master")]
    assert not any("office_value_fts" in m for m in master)
    assert not any('"t_office"' in m for m in master)
    conn.close()


def test_fts_shared_dim_self_join_aliases(spark, tmp_path):
    """F3/D3 golden (reference tests:232-281): one actors dim through two
    columns; FTS must index actor NAMES from both; match 'kruger' finds
    both films via the rowid semi-join idiom."""
    p = tmp_path / "films.csv"
    p.write_text(FILMS)
    db = str(tmp_path / "films.db")
    import_csvs(
        spark,
        [str(p)],
        db,
        extract_column=["actor_1:actors:name", "actor_2:actors:name"],
        fts=["film", "actor_1", "actor_2"],
    )
    conn = sqlite3.connect(db)
    rows = conn.execute(
        "select film from films where rowid in "
        "(select rowid from films_fts where films_fts match 'kruger') order by rowid"
    ).fetchall()
    assert rows == [("National Treasure",), ("Troy",)]
    rows = conn.execute(
        "select film from films where rowid in "
        "(select rowid from films_fts where films_fts match 'cage connery')"
    ).fetchall()
    assert rows == [("The Rock",)]
    conn.close()


def test_cli_end_to_end(tmp_path):
    from csvs_to_sqlite_spark.cli import cli

    runner = CliRunner()
    p = tmp_path / "test.csv"
    p.write_text(CSV)
    db = str(tmp_path / "test.db")
    result = runner.invoke(cli, [str(p), db])
    assert result.exit_code == 0, result.output
    assert f"Created {db} from 1 CSV file" in result.output
    conn = sqlite3.connect(db)
    assert conn.execute("select count(*) from test").fetchone()[0] == 6
    conn.close()


def test_cli_dbname_csv_rejected(tmp_path):
    from csvs_to_sqlite_spark.cli import cli

    p = tmp_path / "test.csv"
    p.write_text(CSV)
    result = CliRunner().invoke(cli, [str(p), str(tmp_path / "out.csv")])
    assert result.exit_code != 0
    assert "must not end with .csv" in result.output


def test_cli_missing_path_rejected(tmp_path):
    from csvs_to_sqlite_spark.cli import cli

    result = CliRunner().invoke(cli, [str(tmp_path / "nope.csv"), str(tmp_path / "o.db")])
    assert result.exit_code != 0
    assert "does not exist" in result.output


# ---------------------------------------------------------------------------
# JSONL source (extension; sources/jsonl_source.py)
# ---------------------------------------------------------------------------

JSONL = '{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\nnot json at all\n{"a": 3, "b": "z"}\n'


def test_jsonl_dropmalformed_skips_bad_lines(spark, tmp_path):
    from csvs_to_sqlite_spark.sources.jsonl_source import load_jsonl

    p = tmp_path / "d.jsonl"
    p.write_text(JSONL)
    df = load_jsonl(spark, str(p), mode="DROPMALFORMED", schema="a long, b string")
    rows = sorted((r["a"], r["b"]) for r in df.collect())
    assert rows == [(1, "x"), (2, "y"), (3, "z")]


def test_jsonl_failfast_raises(spark, tmp_path):
    from csvs_to_sqlite_spark.sources.jsonl_source import load_jsonl

    p = tmp_path / "d.jsonl"
    p.write_text(JSONL)
    df = load_jsonl(spark, str(p), mode="FAILFAST", schema="a long, b string")
    with pytest.raises(Exception, match="[Mm]alformed"):
        df.collect()


def test_jsonl_permissive_captures_corrupt_line(spark, tmp_path):
    from csvs_to_sqlite_spark.sources.jsonl_source import load_jsonl

    p = tmp_path / "d.jsonl"
    p.write_text(JSONL)
    df = load_jsonl(
        spark,
        str(p),
        schema="a long, b string, _bad string",
        corrupt_column="_bad",
    )
    bad = [r["_bad"] for r in df.collect() if r["_bad"] is not None]
    assert bad == ["not json at all"]


def test_jsonl_missing_projection_column_errors(spark, tmp_path):
    from csvs_to_sqlite_spark.sources.jsonl_source import load_jsonl

    p = tmp_path / "d.jsonl"
    p.write_text('{"a": 1}\n')
    with pytest.raises(ValueError, match="no column nope"):
        load_jsonl(spark, str(p), columns=["a", "nope"])


def test_encoding_probe_cap_semantics(tmp_path):
    from csvs_to_sqlite_spark.sources.csv_source import _detect_encoding

    p = tmp_path / "mixed.csv"
    # valid UTF-8 prefix, a latin-1 byte (0xE9) beyond the probe window
    p.write_bytes(b"a,b\n" + b"x," * 1000 + b"\xe9\n")
    # full validation sees the bad byte -> falls back to latin-1
    assert _detect_encoding(str(p)) == "latin-1"
    # capped probe stops before it -> utf-8 accepted (documented trade-off)
    assert _detect_encoding(str(p), probe_bytes=100) == "utf-8"
    # a cap ending mid-codepoint must NOT reject utf-8
    q = tmp_path / "split.csv"
    q.write_bytes(b"abc" + "é".encode("utf-8") * 10)
    assert _detect_encoding(str(q), probe_bytes=4) == "utf-8"


def test_pandas_header_names_matches_pandas():
    """_pandas_header_names must replicate pandas.read_csv's header
    mangling (dup → name.N cascade, empty → Unnamed: N) exactly."""
    import io

    import pandas as pd

    from csvs_to_sqlite_spark.sources.csv_source import _pandas_header_names

    cases = [
        ["a", "a"],
        ["a", "a", "a"],
        ["a", "a", "a.1"],  # lookahead: second a skips to a.2
        ["a", "a.1", "a"],
        ["", "a", ""],
        ["a", "b", "a", "b", "a"],
        ["x.1", "x", "x"],
        ["a", "a", "a.1", "a"],
        ["a", "a.1", "a.1"],  # mangled-name dup cascades to a.1.1
        ["a", "a", "a.2"],
        ["a.1", "a.1"],
        ["", "", ""],
        ["a", "a.1", "a.2", "a", "a"],
    ]
    for header in cases:
        csv = ",".join(header) + "\n" + ",".join("1" * len(header)) + "\n"
        want = list(pd.read_csv(io.StringIO(csv)).columns)
        assert _pandas_header_names(header) == want, header


def test_compressed_temp_copies_released_after_import(spark, tmp_path):
    """Importing a compressed CSV must not leak the decompressed
    plaintext temp copy (review finding: unbounded $TMPDIR growth)."""
    import gzip

    from csvs_to_sqlite_spark.engine import import_csvs
    from csvs_to_sqlite_spark.sources import csv_source

    with gzip.open(tmp_path / "t.csv.gz", "wb") as f:
        f.write(b"a,b\n1,x\n2,y\n")
    import_csvs(spark, [str(tmp_path / "t.csv.gz")], str(tmp_path / "o.db"))
    assert csv_source._DECOMPRESSED_TEMPS == []


def test_rewrite_streaming_bounded_rss(tmp_path):
    """VERDICT_r09 #3: the dirty-file rewrite streams in 8 MiB windows —
    driver memory stays bounded by the window (plus one quoted field /
    line run), never the file. A ~1 GiB flagged CSV is rewritten in a
    fresh subprocess whose peak RSS must stay far below the file size
    (the old whole-file-str path needed 2-3 GiB here)."""
    import subprocess
    import sys

    code = r"""
import resource
import sys

sys.path.insert(0, "/root/repo")
from csvs_to_sqlite_spark.sources.csv_source import _rewrite_file

p = sys.argv[1]
block = "aaaa,bbbb,cccc\n" * 1024
with open(p, "w") as f:
    f.write("a,b,c\n")
    f.write('"x\ny",2,3\n')  # in-quote newline -> quote pass fires
    f.write(" \n")            # ws-only line -> blank pass fires
    for _ in range(1 << 16):  # ~1 GiB of clean rows
        f.write(block)
out, r_nl, r_protect, r_empty, n_cr, sent = _rewrite_file(
    p, ",", "UTF-8", True, True, False, False, False, None,
    frozenset(b"abc,\n\"xy 123"),
)
assert out is not None and r_nl, (out, r_nl)
with open(out, encoding="utf-8") as f:
    head = f.read(64)
assert sent["lf"] in head and " \n" not in head
print(resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)
"""
    big = tmp_path / "big.csv"
    res = subprocess.run(
        [sys.executable, "-c", code, str(big)],
        capture_output=True, text=True, timeout=600, check=True,
    )
    peak_kb = int(res.stdout.strip().splitlines()[-1])
    size = big.stat().st_size
    assert size > 900 << 20, size  # really ~1 GiB (0.94 GiB of rows)
    # window 8 MiB + interpreter + pattern machinery; the old path held
    # the whole 1 GiB text plus regex output copies
    assert peak_kb * 1024 < 512 << 20, f"peak RSS {peak_kb} KiB"


def test_rewrite_window_boundaries_equivalent(tmp_path):
    """The streaming rewrite must be byte-identical at ANY window size:
    window cuts at out-of-quote newlines + the resumable quote-state scan
    (r10 review fix: no re-walk of the carry) cannot change semantics.
    Randomized dirty texts (quotes spanning windows, lone CRs, blank
    lines, empties) processed with tiny vs large windows."""
    import random

    from csvs_to_sqlite_spark.sources.csv_source import (
        LoadCsvError,
        _rewrite_file,
    )

    rng = random.Random(777)
    alpha = ['a', '1', ',', '\n', '\r\n', ' ', '\t', '"ws\nx"', '",\r,"',
             '""', '\x0c', ',,', '"q""z"', '\r']
    for trial in range(40):
        body = "".join(rng.choice(alpha) for _ in range(rng.randint(5, 80)))
        text = "a,b\n" + body
        p = tmp_path / f"w{trial}.csv"
        p.write_text(text, newline="")
        outs = []
        for w in (7, 1 << 20):
            try:
                out, *_rest = _rewrite_file(
                    str(p), ",", "UTF-8", True, True, True, True, True,
                    None, frozenset(text.encode("utf-8", "ignore")),
                    _window=w,
                )
                outs.append(
                    open(out, encoding="utf-8", newline="").read()
                    if out else text
                )
            except LoadCsvError as e:
                outs.append(("REFUSED", "pandas tokenizer buffer" in str(e)))
        assert outs[0] == outs[1], (trial, repr(text), outs)


def test_byte_presence_reflects_only_real_file_bytes(tmp_path):
    """ADVICE_r10: the trigger probe's byte-presence set must come from
    the file's actual bytes — the virtual b'\\n\\n' BOF carry used for
    boundary classification must not mark 0x0A present in newline-free
    files (any future consumer of `present` would otherwise see a
    phantom newline)."""
    from csvs_to_sqlite_spark.sources.csv_source import _scan_rewrite_triggers

    # newline-free single-line file: no 0x0A, no 0x0D anywhere
    f = tmp_path / "oneline.csv"
    f.write_bytes(b"a,b")
    *_, present = _scan_rewrite_triggers(str(f), ",", 0, 2)
    assert 0x0A not in present and 0x0D not in present
    assert present == frozenset(b"a,b")

    # multi-chunk boundary: carried prev2 bytes are real file bytes and
    # must be counted exactly once (presence, not counts — but the set
    # must still be exactly the file's byte set)
    f2 = tmp_path / "real.csv"
    f2.write_bytes(b"a,b\n1,2\n")
    *_, present2 = _scan_rewrite_triggers(str(f2), ",", 0, 2)
    assert present2 == frozenset(b"a,b\n1,2")


def test_multibyte_sentinel_fallback_properties(tmp_path):
    """VERDICT_r10 #2 unit: when every single-byte candidate occurs in
    the file, _choose_sentinels returns equal-length multi-byte
    sentinels that (a) are absent from the file, (b) share one lead char
    with no lead char in any tail position (the no-false-match shape),
    (c) give the protect sentinel a >0x20 char, and (d) never contain
    separator/quote/CR/LF/NUL."""
    from csvs_to_sqlite_spark.sources.csv_source import (
        _CTRL_POOL,
        _PROTECT_POOL,
        _SENT_KEYS,
        _choose_sentinels,
    )

    pool_bytes = "".join(_CTRL_POOL + _PROTECT_POOL).encode("latin-1")
    f = tmp_path / "x.csv"
    f.write_bytes(b'a,b\n"' + pool_bytes + b'",1\n"p\nq",2\n')
    present = frozenset(f.read_bytes())
    chosen = _choose_sentinels(present, ",", str(f))
    vals = [chosen[k] for k in _SENT_KEYS]
    assert len(set(vals)) == 5
    lengths = {len(v) for v in vals}
    assert lengths == {2} or lengths == {3}
    raw = f.read_bytes()
    leads = {v[0] for v in vals}
    assert len(leads) == 1  # shared lead
    lead = leads.pop()
    for v in vals:
        assert v.encode("latin-1") not in raw  # absent as a substring
        assert all(ch != lead for ch in v[1:])  # no lead in tails
        assert not (set(v) & {",", '"', "\r", "\n", "\x00", "\t", " "})
    assert any(ord(ch) > 0x20 for ch in chosen["protect"])
    # a clean file keeps the single-byte defaults (fast path untouched)
    clean = _choose_sentinels(frozenset(b"ab,1\n"), ",", str(f))
    assert all(len(v) == 1 for v in clean.values())


def test_infer_sql_fast_path_equivalence(spark):
    """The SQL-string constructors (_infer_flag_exprs/_infer_agg_exprs,
    optimization r12) must stay expression-for-expression in lockstep
    with the Column constructor (_infer_flag_agg_columns): same flag
    projection rows, same aggregate row, on a quirk-dense value mix
    (uint64 tier, beyond-uint64, negative overflow, '0e309', '1e309',
    inf keywords vs padded inf, '-0.0', subnormal, non-integral, bools,
    NA-adjacent text), under every (float_parity, py_engine) combination
    the fast path serves."""
    from pyspark.sql import functions as F

    from csvs_to_sqlite_spark.sources.csv_source import (
        _infer_agg_exprs,
        _infer_flag_agg_columns,
        _infer_flag_exprs,
    )

    vals = [
        "1", "-1", " 42 ", "1.5", "-0.0", "0.000001", "2.5e-3",
        "9223372036854775807", "9223372036854775808",
        "18446744073709551615", "18446744073709551616",
        "-9223372036854775809", "0e309", "1e309", "-1e309",
        "inf", "-infinity", " inf", "inf ", "1e-310",
        "true", "False", "abc", "nan", None, "0.3", "123456789012345678",
    ]
    n = 3  # three columns with rotated value orders (order-dependent mins)
    rows = []
    for j, v in enumerate(vals):
        rows.append(tuple(vals[(j + k) % len(vals)] for k in range(n)))
    df = spark.createDataFrame(
        rows, ", ".join(f"__m{i} string" for i in range(n))
    )
    mask = df.select(
        F.monotonically_increasing_id().alias("__pos__"),
        F.lit(None).cast("string").alias("__extra_fields__"),
        *[F.col(f"__m{i}") for i in range(n)],
    )
    cols = [f"c{i}" for i in range(n)]  # names are only used for count
    for float_parity, py_engine in ((None, False), (False, False),
                                    (None, True), (False, True)):
        fast_base = mask.selectExpr(
            *_infer_flag_exprs(cols, True, float_parity, py_engine)
        )
        slow_base, slow_aggs = _infer_flag_agg_columns(
            mask, cols, True, float_parity, py_engine, ctrl_risk=False
        )
        def norm(rows):
            # repr-normalize so NaN == NaN and -0.0 != 0.0 stay visible
            return sorted(tuple(repr(v) for v in r) for r in rows)

        f_rows = norm(fast_base.drop("__extra_fields__").collect())
        s_rows = norm(slow_base.drop("__extra_fields__").collect())
        assert f_rows == s_rows, (float_parity, py_engine)
        fast_agg = fast_base.agg(
            *[F.expr(s) for s in _infer_agg_exprs(cols, True)]
        ).collect()[0].asDict()
        slow_agg = slow_base.agg(*slow_aggs).collect()[0].asDict()
        assert fast_agg == slow_agg, (float_parity, py_engine)
