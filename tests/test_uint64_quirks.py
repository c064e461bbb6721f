"""Differential tests vs the REAL reference for pandas' int-ladder edge
classes (uint64 tier, huge negatives, inf acceptance, out-of-range zero
exponents) and for the opt-in pandas-float-parity mode.

Every scenario runs the actual reference tool (via tests/ref_shims) and
our engine on the same CSV and asserts identical SQLite snapshots.
The quirk rules were pinned by direct pandas probes — notably:

- a uint64-tier int (int64max < v ≤ uint64max) alongside NULLs or negative
  ints triggers pandas' uint64-conflict fallback: object dtype WITHOUT NA
  masking, so the column lands as TEXT with NA tokens kept as literal
  strings (reference utils.py:22-47 inherits this from pd.read_csv);
- a POSITIVE int beyond uint64 anywhere makes it a plain masked object
  column; huge NEGATIVES never block float mode;
- pandas accepts inf keywords only as the exact raw word (± inf/infinity,
  case-insensitive): whitespace-padded forms make the column object;
- '0e309' is an ERANGE reject (precise_xstrtod) though Spark casts it 0.0.

With SPARK_GRAFT_PANDAS_FLOAT_PARITY=1, float-column VALUES are parsed
with the precise_xstrtod port and int64-with-NULL columns are upcast to
doubles from the exact ints — closing the documented "xstrtod family"
divergence (the parity scenarios at the bottom were the known-failing
fuzz classes).
"""

import os

import pytest

from test_reference_differential import run_reference, snapshot

U64 = "18446744073709551614"  # uint64 tier
BEYOND = "9" * 25  # beyond uint64, positive
BEYOND20 = "99999999999999999999"  # 20 digits, fits decimal(20,0), > u64max
NEG_OVF = "-9223372036854775809"  # below int64 min
NEG_BEYOND = "-" + BEYOND


def _col(rows):
    return "c0,c1\n" + "\n".join(r + ",x" for r in rows) + "\n"


QUIRK_SCENARIOS = [
    # uint64-conflict → rawtext (NA tokens preserved as literal strings)
    ("u64_null", [U64, "NA"]),
    ("u64_null_none", [U64, "None", "nan"]),
    ("u64_neg", [U64, "-5"]),
    ("u64_neg_null", [U64, "-5", "NA"]),
    ("null_u64", ["NA", U64]),
    ("negovf_u64_null", [NEG_OVF, U64, "NA"]),
    ("negbeyond_u64_null", [NEG_BEYOND, U64, "NA"]),
    # positive beyond-u64 present → plain masked object
    ("u64_beyond_null", [U64, BEYOND, "NA"]),
    ("beyond20_null", [BEYOND20, "NA"]),
    ("beyond20_u64_null", [BEYOND20, U64, "NA"]),
    # negative overflows without a uint64 candidate → masked object
    ("negovf_null", [NEG_OVF, "NA"]),
    ("negbeyond_float", [NEG_BEYOND, "0.5"]),  # negatives don't block floats
    # inf acceptance
    ("ws_inf", [" inf", "1.5"]),
    ("inf_ws", ["inf ", "1.5"]),
    ("infinity_ok", ["Infinity", "-INFINITY", "1.5"]),
    # zero value, out-of-range exponent
    ("zero_e309", ["0e309", "1.5"]),
    ("zero_e308_ok", ["0e308", "1.5"]),
    # r11: the uint64-NEGATIVE ladder in FLOAT territory (70-sequence
    # probe table): float ONLY if a positive float-notation value exists
    # anywhere, or a negative one occurs BEFORE the first uint64-tier
    # int; otherwise u64 + any negative (by NOTATION — '-0.0' counts) →
    # object without NA masking
    ("u64_negfloat", [U64, "-.5"]),
    ("u64_negfloat_posfloat", [U64, "-0.5", "0.5"]),
    ("u64_posfloat_negint", [U64, "0.5", "-7"]),
    ("negfloat_then_u64", ["-.5", U64]),
    ("u64_negfloat_negint", [U64, "-0.5", "-7"]),
    ("u64_negint_posfloat", [U64, "-7", "0.5"]),
    ("u64_negzero", [U64, "-0.0"]),
    ("u64_negfloat_null", [U64, "-.5", "NA"]),
    ("u64_int_negfloat", [U64, "7", "-0.5"]),
    ("spaced_negfloat_u64", [" -0.5", U64]),
    # r11b: the same conflict for the NEGATIVE-overflow family (probed
    # 168-sequence table): trigger = int-notation negative below int64
    # min; NA tokens are MASKED here (text), unlike the u64 conflict
    # (rawtext) — and a u64 value anywhere flips the column to rawtext
    ("negovf_negfloat", [NEG_OVF, "-.5"]),
    ("negovf_negfloat_posfloat", [NEG_OVF, "-.5", "0.5"]),
    ("negfloat_then_negovf", ["-.5", NEG_OVF]),
    ("negovf_na_negfloat", [NEG_OVF, "NA", "-.5"]),
    ("negbeyond_negfloat", [NEG_BEYOND, "-.5"]),
    ("negbeyond_na_negfloat", [NEG_BEYOND, "-.5", "nan"]),
    ("u64_negovf_negfloat_na", [U64, NEG_OVF, "-.5", "NA"]),
    ("negovf_u64_negfloat_na", [NEG_OVF, U64, "-.5", "NA"]),
    ("posbeyond_negfloat_posfloat", [BEYOND20, "-.5", "0.5"]),
]


@pytest.mark.parametrize("flag", ["-d", "-dt"])
def test_all_null_date_column_stays_integer(spark, tmp_path, flag):
    """An ALL-NULL -d/-dt target column must keep the INTEGER affinity of
    the all-NaN float64 the reference derives (its parse loop skips NaN) —
    fuzz seed 82002 caught us stringifying it to TEXT."""
    from csvs_to_sqlite_spark.engine import import_csvs

    (tmp_path / "t.csv").write_text("c0,dt\n1,NA\n2,\n")
    run_reference(str(tmp_path), "t.csv", "ref.db", [flag, "dt"])
    kwargs = {"datetime" if flag == "-dt" else "date": ["dt"]}
    import_csvs(spark, [str(tmp_path / "t.csv")], str(tmp_path / "ours.db"), **kwargs)
    assert snapshot(str(tmp_path / "ref.db")) == snapshot(str(tmp_path / "ours.db"))


@pytest.mark.parametrize("name,rows", QUIRK_SCENARIOS, ids=[s[0] for s in QUIRK_SCENARIOS])
def test_int_ladder_quirks_identical(spark, tmp_path, name, rows):
    from csvs_to_sqlite_spark.engine import import_csvs

    (tmp_path / "t.csv").write_text(_col(rows))
    run_reference(str(tmp_path), "t.csv", "ref.db", [])
    import_csvs(spark, [str(tmp_path / "t.csv")], str(tmp_path / "ours.db"))
    ref = snapshot(str(tmp_path / "ref.db"))
    ours = snapshot(str(tmp_path / "ours.db"))
    assert ref == ours


PARITY_SCENARIOS = [
    # the three documented xstrtod fuzz classes + the int64-with-NULL class
    ("long_mantissa", ["123456789.123456789", "1.5"], []),
    ("tiny_decimal_c1_flip", ["0.000000000000000000001"], []),
    ("huge_int_float_mode", ["9223372036854775807", "0.5"], []),
    # value drift is the xstrtod family, so the negative-overflow-into-
    # float-mode case needs parity for bit-identity (acceptance itself —
    # float64, not object — is asserted either way)
    ("negovf_float_mode", [NEG_OVF, "0.5"], []),
    ("int64_with_null", ["9223372036854775807", "NA"], []),
    ("quote2_int", ["9223372036854775807", "7"], ["--quoting", "2"]),
    ("subnormal", ["9.80025680261439e-301", "1e-320", "0.5"], []),
    ("extract_dim_floats", ["123456789.123456789", "0.5"], ["-c", "c0"]),
]


@pytest.mark.parametrize(
    "name,rows,extra", PARITY_SCENARIOS, ids=[s[0] for s in PARITY_SCENARIOS]
)
def test_float_parity_mode_identical(spark, tmp_path, name, rows, extra):
    from csvs_to_sqlite_spark.engine import import_csvs

    (tmp_path / "t.csv").write_text(_col(rows))
    run_reference(str(tmp_path), "t.csv", "ref.db", extra)
    kwargs = {}
    if "--quoting" in extra:
        kwargs["quoting"] = int(extra[extra.index("--quoting") + 1])
    if "-c" in extra:
        kwargs["extract_column"] = [extra[extra.index("-c") + 1]]
    os.environ["SPARK_GRAFT_PANDAS_FLOAT_PARITY"] = "1"
    try:
        import_csvs(
            spark, [str(tmp_path / "t.csv")], str(tmp_path / "ours.db"), **kwargs
        )
    finally:
        del os.environ["SPARK_GRAFT_PANDAS_FLOAT_PARITY"]
    ref = snapshot(str(tmp_path / "ref.db"))
    ours = snapshot(str(tmp_path / "ours.db"))
    assert ref == ours


def test_parity_default_auto_and_forced_off(spark, tmp_path):
    """Round 9: the DEFAULT is AUTO value parity — a risk-flagged column
    stores pandas' precise_xstrtod value; SPARK_GRAFT_PANDAS_FLOAT_PARITY=0
    restores the correctly rounded double (the pre-round-9 posture)."""
    import sqlite3

    from csvs_to_sqlite_spark.engine import import_csvs

    (tmp_path / "t.csv").write_text(_col(["123456789.123456789", "1.5"]))
    import_csvs(spark, [str(tmp_path / "t.csv")], str(tmp_path / "ours.db"))
    conn = sqlite3.connect(str(tmp_path / "ours.db"))
    v = conn.execute("select c0 from t order by rowid limit 1").fetchone()[0]
    conn.close()
    assert v == 123456789.12345678  # pandas' value, by default

    os.environ["SPARK_GRAFT_PANDAS_FLOAT_PARITY"] = "0"
    try:
        import_csvs(spark, [str(tmp_path / "t.csv")], str(tmp_path / "off.db"))
    finally:
        del os.environ["SPARK_GRAFT_PANDAS_FLOAT_PARITY"]
    conn = sqlite3.connect(str(tmp_path / "off.db"))
    v = conn.execute("select c0 from t order by rowid limit 1").fetchone()[0]
    conn.close()
    assert v == float("123456789.123456789")  # ...679, correctly rounded


def test_rawtext_column_through_extract_identical(spark, tmp_path):
    """-c on a uint64-conflict column: the literal 'NA' becomes a DIM
    LABEL on both sides (first-appearance ids over raw strings)."""
    from csvs_to_sqlite_spark.engine import import_csvs

    (tmp_path / "t.csv").write_text(f"c0,c1\n{U64},x\nNA,y\n{U64},z\n")
    run_reference(str(tmp_path), "t.csv", "ref.db", ["-c", "c0"])
    import_csvs(
        spark, [str(tmp_path / "t.csv")], str(tmp_path / "ours.db"),
        extract_column=["c0"],
    )
    assert snapshot(str(tmp_path / "ref.db")) == snapshot(str(tmp_path / "ours.db"))


def test_rawtext_then_append_identical(spark, tmp_path):
    """Append run after a uint64-conflict import: the second file's plain
    int-with-NULL column lands against the TEXT table like the reference."""
    from csvs_to_sqlite_spark.engine import import_csvs

    (tmp_path / "t.csv").write_text(f"c0,c1\n{U64},x\nNA,y\n")
    (tmp_path / "t2.csv").write_text("c0,c1\n5,q\nNA,r\n")
    run_reference(str(tmp_path), "t.csv", "ref.db", [])
    run_reference(str(tmp_path), "t2.csv", "ref.db", [])
    import_csvs(spark, [str(tmp_path / "t.csv")], str(tmp_path / "ours.db"))
    import_csvs(spark, [str(tmp_path / "t2.csv")], str(tmp_path / "ours.db"))
    assert snapshot(str(tmp_path / "ref.db")) == snapshot(str(tmp_path / "ours.db"))


def test_ladder_random_permutations_parity_identical(spark, tmp_path):
    """Seeded random order-permutations over the full ladder alphabet
    (the tools/ladder_sweep.py harness in miniature): under float parity
    every comparable sequence must be snapshot-identical to the real
    reference. The empirically fitted conflict/overflow rules are
    order-sensitive, so this guards against a mis-fitted rule that the
    named scenarios above happen to miss."""
    import random

    from csvs_to_sqlite_spark.engine import import_csvs

    alphabet = [
        U64, "9223372036854775808", "18446744073709551615",
        "18446744073709551616", BEYOND20, BEYOND, NEG_OVF, NEG_BEYOND,
        "-5", "0", "7", "9223372036854775807", "NA", "None", "nan",
        "0.5", "1e5",
    ]
    rng = random.Random(20260816)
    os.environ["SPARK_GRAFT_PANDAS_FLOAT_PARITY"] = "1"
    try:
        done = 0
        t = 0
        while done < 10:
            t += 1
            rows = [rng.choice(alphabet) for _ in range(rng.randint(1, 6))]
            d = tmp_path / f"t{t}"
            d.mkdir()
            (d / "t.csv").write_text(_col(rows))
            try:
                run_reference(str(d), "t.csv", "ref.db", [])
            except Exception:
                continue  # reference crash (uint64-clean to_sql overflow)
            import_csvs(spark, [str(d / "t.csv")], str(d / "ours.db"))
            assert snapshot(str(d / "ref.db")) == snapshot(str(d / "ours.db")), rows
            done += 1
    finally:
        del os.environ["SPARK_GRAFT_PANDAS_FLOAT_PARITY"]


IDX_SCENARIOS = [
    # pandas' implicit-index inference: first data row k fields wider than
    # the header → first k fields of EVERY row become the (dropped) index,
    # data shifts left, short rows NaN-pad (probed; reference inherits it
    # from pd.read_csv via utils.py:38-47)
    ("trailing_comma_first", "a,b\n1,2,\n"),
    ("extra_field_first", "a,b\n1,2,3\n"),
    ("wide_first_then_normal", "a,b\n1,2,\n3,4\n"),
    ("wide_first_then_short", "a,b\n1,2,3\n4\n"),
    ("two_extra_multiindex", "a,b\n1,2,3,4\n"),
    ("wide_first_text", "a,b\nfoo,bar,baz\nq,w,e\n"),
]


@pytest.mark.parametrize("name,csv", IDX_SCENARIOS, ids=[s[0] for s in IDX_SCENARIOS])
def test_implicit_index_inference_identical(spark, tmp_path, name, csv):
    from csvs_to_sqlite_spark.engine import import_csvs

    (tmp_path / "t.csv").write_text(csv)
    run_reference(str(tmp_path), "t.csv", "ref.db", [])
    import_csvs(spark, [str(tmp_path / "t.csv")], str(tmp_path / "ours.db"))
    assert snapshot(str(tmp_path / "ref.db")) == snapshot(str(tmp_path / "ours.db"))


def test_implicit_index_mode_bad_lines(spark, tmp_path):
    """In index mode the bad-line bar moves to header+k: a LATER row wider
    than the first data row errors (reference: ParserError caught per-file
    → no table) or is dropped under skip-errors, keeping the shifted
    parse."""
    import sqlite3

    from csvs_to_sqlite_spark.engine import import_csvs
    from csvs_to_sqlite_spark.sources.csv_source import LoadCsvError, load_csv

    (tmp_path / "t.csv").write_text("a,b\n1,2,3\n4,5,6,7\n")
    with pytest.raises(LoadCsvError):
        load_csv(spark, str(tmp_path / "t.csv")).collect()
    import_csvs(
        spark, [str(tmp_path / "t.csv")], str(tmp_path / "ours.db"),
        skip_errors=True,
    )
    conn = sqlite3.connect(str(tmp_path / "ours.db"))
    assert conn.execute("select * from t").fetchall() == [(2, 3)]
    conn.close()


WS_SCENARIOS = [
    # a line that tokenizes to ONE whitespace-only field is skipped in ANY
    # width file (pandas skip_blank_lines; previously we only handled the
    # single-column case — fuzz seed 88002 caught the index-mode shape)
    ("ws_line_2col", "a,b\n1,2\n \n3,4\n"),
    ("ws_line_1col", "a\n1\n \n2\n"),
    ("ws_line_index_mode", "a\n1,2\n \n3,4\n"),
    ("ws_field_sep_fuzz", "c0\n123456789.1| \n5.\n0e308\n"),
    ("ws_plus_extra_is_bad", "a\n1\n ,x,y\n"),  # NOT a blank line: 3 fields
]


@pytest.mark.parametrize("name,csv", WS_SCENARIOS, ids=[s[0] for s in WS_SCENARIOS])
def test_whitespace_line_skip_identical(spark, tmp_path, name, csv):
    from csvs_to_sqlite_spark.engine import import_csvs

    sep = "|" if "|" in csv else ","
    (tmp_path / "t.csv").write_text(csv)
    run_reference(
        str(tmp_path), "t.csv", "ref.db", ["-s", sep] if sep != "," else []
    )
    import_csvs(
        spark, [str(tmp_path / "t.csv")], str(tmp_path / "ours.db"),
        separator=sep,
    )
    assert snapshot(str(tmp_path / "ref.db")) == snapshot(str(tmp_path / "ours.db"))


def test_rawtext_quoted_empty_preserved(spark, tmp_path):
    """A QUOTED empty field in a uint64-conflict column stays a literal ''
    like pandas (the NUL nullValue sentinel keeps it as a string; unquoted
    empties are nulled inside Spark's tokenizer — documented limit)."""
    from csvs_to_sqlite_spark.engine import import_csvs

    (tmp_path / "t.csv").write_text(f'a,b\n{U64},x\n"",y\n')
    run_reference(str(tmp_path), "t.csv", "ref.db", [])
    import_csvs(spark, [str(tmp_path / "t.csv")], str(tmp_path / "ours.db"))
    assert snapshot(str(tmp_path / "ref.db")) == snapshot(str(tmp_path / "ours.db"))
