"""Differential fuzz runner: random adversarial CSVs through BOTH the
reference tool (via tests/ref_shims) and our engine; prints any snapshot
mismatch. Usage: python tools/differential_fuzz.py [seed ...]

Known accepted divergences (see NOTES.md): pandas' lossy xstrtod parse of
>int64 ints, and float64 precision loss for ints >= 2^53 in nullable
columns — we produce the exact/correctly-rounded values. The round-3
vocabulary wave surfaced two more instances of the same xstrtod family:
decimals with >15 fraction digits collapse toward 0 in pandas
('0.000000000000000000001' -> 0.0, which also flips the C1 affinity to
INTEGER), and long mantissas drift in the last digit
('123456789.123456789' -> ...678 vs the correctly rounded ...679).

Round 8: running with SPARK_GRAFT_PANDAS_FLOAT_PARITY=1 removes the whole
xstrtod family (float values parsed with the precise_xstrtod port —
functions/pandasfloat.py) and a clean run should report fails=0.
"""

import csv as csvmod
import os
import random
import subprocess
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
from csvs_to_sqlite_spark.session import get_spark
from csvs_to_sqlite_spark.engine import import_csvs
from test_reference_differential import snapshot, SHIMS, REF

spark = get_spark("fuzz7")
spark.sparkContext.setLogLevel("ERROR")
tricky = [
    "x9y", "zz",
    "NA", "NULL", "None", "nan", "NaN", "n/a", "<NA>", "#N/A", "-NaN",
    "007", "+5", " 7", "1e5", "-0", "0x1f", "1_000", "Inf", "-inf", "INF",
    'quote"inside', "a,b", "line1", "e-z", "True", "FALSE", "true",
    "3.14", "-2.5e-3", "9" * 25, "0.1", "-.5", "5.", "1E+3", "0", "-1",
    "2147483648", "9223372036854775807", ".inf", " ",
    # second vocabulary wave (round 3): overflow/underflow notation,
    # padded numerics, malformed numerics, unicode digits
    "1e309", "-1e309", "1e-320", " 7.5 ", "+3.5", "123456789.123456789",
    "１２３", "0b101", "--5", "5-", "1.0.0", "00.5", "1e", "e5",
    ".", "-", "+", "1 000", "0.000000000000000000001",
    # third vocabulary wave (round 8): the uint64 ladder (conflict quirk,
    # 20-digit beyond-u64, negative overflows), whitespace-padded inf
    # forms, Infinity keywords, zero-value out-of-range exponents
    "18446744073709551614", "99999999999999999999", "-9223372036854775809",
    " inf", "inf ", "Infinity", "-INFINITY", "0e309", "0e308",
    # fourth vocabulary wave (round 9): in-quote newlines (csv.writer
    # quotes these — LF/CRLF/CR and a newline-only cell), a formfeed
    # cell (a lone '\x0c' line is a KEPT pandas row, unlike ' '), and a
    # quote+newline mix
    "li\nne", "x\r\ny", "c\rr", "\n", 'q"\nz', "\x0c",
    # unquoted-empty field (csv.writer emits nothing): trailing position
    # = pandas bad line; mid-row = NA everywhere but LITERAL '' in the
    # uint64-conflict rawtext class — both closed by the r9 _EMPTY_SENT
    # rewrite
    "",
    # fifth vocabulary wave (round 10): non-isspace control bytes around
    # numerics (Spark's cast trims them, pandas' parsers reject — the
    # ctrl_risk acceptance guard), isspace-class padding pandas ACCEPTS
    # ('1\x0c' is int64), former sentinel bytes as data, and a value that
    # is ONLY a control byte
    "1\x01", "\x051", "1\x0c", "2\x0b", "\x1f", "7\x01 ", "\x7f9",
    # sixth vocabulary wave (round 11): NUL truncation (pandas cuts every
    # cell VALUE at the first NUL while tokenizing to the true delimiter;
    # the do_nul rewrite replicates it) — mid-cell, leading (truncates to
    # '' -> NA / rawtext ''), inside a quoted+escaped context (csv.writer
    # quotes these), after a numeric, and NUL-only
    "n\x00l", "\x00xy", "1\x002", "\x00", "q\"t\x00u", "x\x00",
]

# date-column vocabulary: every fuzzy class the vendored parser supports,
# plus unparseable junk (which must pass through unchanged on both sides)
datey = [
    "3rd May 2017", "10pm on April 4 1938", "5:45 10 December 2009",
    "04/30/2005", "2017-05-03", "2017-05-03 10:11:12", "May 3 2017",
    "3 de mayo de 2017", "10 dezember 2009", "1 gennaio 2020",
    "15 outubro 1999", "3-May-2017", "May/3/2017",
    "May 3 2017 10:00 UTC", "May 3 2017 10:00 EST",
    "May 3 2017 10:00 +02:00", "May 3 2017 10:00 -0500",
    "noon 3 May 2017", "midnight 3 May 2017", "4th July 1976 8:30pm",
    "31/12/99", "1/2/03", "", "NA", "not a date", "32 May 2017",
    "0/0/0", "May", "2017",
    # round-9 locales: uk (genitive + р. suffix), bn (Bengali digits),
    # fa (Persian digits, Gregorian months); Jalali stays unparseable
    "3 травня 2017", "1 січня 1999 р.", "৩ মে ২০১৭",
    "۳ مه ۲۰۱۷", "15 اکتبر 2020", "۱۵ فروردین ۱۴۰۲",
]


def run_ref(workdir, argv):
    code = (
        "import sys\n"
        "sys.argv = ['csvs-to-sqlite'] + " + repr(argv) + "\n"
        "from csvs_to_sqlite.cli import cli\n"
        "try:\n    cli(standalone_mode=False)\nexcept SystemExit:\n    pass\n"
    )
    env = dict(os.environ, PYTHONPATH=SHIMS + ":" + REF)
    subprocess.run(
        [sys.executable, "-c", code], cwd=workdir, env=env, check=True,
        capture_output=True, timeout=120,
    )



def write_csv(path, sep, header, rows):
    """csv.writer for single-char seps; multi-char seps (python-engine
    axis) are plain joins — pandas treats quotes as literal there, so
    quoting machinery must NOT kick in. Values containing the sep or
    newlines make structurally messy files BOTH tools read identically."""
    with open(path, "w", newline="", encoding="utf-8") as f:
        if len(sep) == 1:
            w = csvmod.writer(f, delimiter=sep)
            w.writerow(header)
            w.writerows(rows)
        else:
            for r in [header] + rows:
                f.write(sep.join(r) + "\n")


fails = tried = 0
seeds = [int(a) for a in sys.argv[1:]] or [991, 42424]
for seed in seeds:
    rng = random.Random(seed)
    for trial in range(40):
        d = tempfile.mkdtemp()
        n_cols = rng.randint(1, 3)
        n_rows = rng.randint(1, 8)
        # quoting mixes into the fuzz (QUOTE_MINIMAL-weighted): the
        # QUOTE_NONNUMERIC read path floats every unquoted field, a
        # whole separate inference branch worth fuzzing
        quoting = rng.choice([0, 0, 0, 1, 2])
        # separator axis: TSV/semicolon/pipe files go through the same
        # parse+inference path but a different csv dialect on both sides;
        # '::' (round 9) routes BOTH tools through the pandas python
        # engine / _load_python_engine (regex split, quotes literal)
        sep = rng.choice([",", ",", ",", "\t", ";", "|", "::"])
        rows = [[rng.choice(tricky) for _ in range(n_cols)] for _ in range(n_rows)]
        # header axis (~1/4 of trials): duplicate names (pandas mangles to
        # a, a.1…), dots (F.col hazard), empty cells ('Unnamed: N') —
        # plain c0… otherwise so -c/--shape keep a stable column to target
        header_fuzz = rng.random() < 0.25
        # ~1/3 of trials also extract c0 into a lookup table: fuzzes the
        # dim path end-to-end (fmt_g %g canonicalization of adversarial
        # floats, first-appearance ids, FK rewrite)
        extract = rng.random() < 0.34
        # ~1/5 of trials shape-rename every column and force c0 to REAL:
        # exercises B1-B4 (shape parse, rename, cast) under adversarial
        # values (uncastable ones crash the reference too -> trial skipped)
        # date axis (~1/5 of trials): an extra column of fuzzy-date
        # values run through -dt on both sides (relative phrases
        # excluded: now()-anchored)
        date_col = rng.random() < 0.2
        # -d (force_date: .date().isoformat()) vs -dt, 50/50
        date_flag = rng.choice(["-d", "-dt"])
        shape = None
        if rng.random() < 0.2:
            shape = ",".join(
                ["c0:r0(REAL)"] + [f"c{i}:r{i}" for i in range(1, n_cols)]
            )
        # header fuzz only when -c/--shape don't need a stable c0 target
        header = (
            [rng.choice(["a", "a", "a.1", "p.x", "", "b"]) for _ in range(n_cols)]
            if header_fuzz and not extract and not shape
            else ["c%d" % i for i in range(n_cols)]
        )
        if date_col:
            header = header + ["dt"]
            rows = [r + [rng.choice(datey)] for r in rows]
        # implicit-index axis (~1/8 of plain/shape trials): widen the
        # FIRST data row by 1-2 fields — pandas treats the extra leading
        # fields as a dropped (multi-)index and shifts the data left; a
        # LATER widened row is then a genuine bad line (reference errors
        # per-file). Under --shape/usecols pandas instead TRUNCATES wide
        # rows silently — no shift, no bad lines (round-9 advice case).
        if not extract and not date_col and rng.random() < 0.125:
            rows[0] = rows[0] + [
                rng.choice(tricky) for _ in range(rng.randint(1, 2))
            ]
            if rng.random() < 0.3 and len(rows) > 1:
                rows[-1] = rows[-1] + [rng.choice(tricky)]
        write_csv(os.path.join(d, "t.csv"), sep, header, rows)
        ref_args = (
            ["t.csv", "ref.db"]
            + (["-s", sep] if sep != "," else [])
            + (["--quoting", str(quoting)] if quoting else [])
            + (["-c", "r0" if shape else "c0"] if extract else [])
            + (["--shape", shape] if shape else [])
            + ([date_flag, "dt"] if date_col and not shape else [])
        )
        # append axis (~1/4 of extract trials, no shape): a SECOND file
        # lands in the same db — fuzzes incremental dim growth (E4: new
        # values get ids after max(id), existing ids immutable) and
        # multi-table accumulation, which single-run trials never touch
        second = None
        if extract and not shape and rng.random() < 0.25:
            second = [
                [rng.choice(tricky) for _ in range(n_cols)]
                for _ in range(rng.randint(1, 6))
            ]
            write_csv(
                os.path.join(d, "t2.csv"), sep,
                ["c%d" % i for i in range(n_cols)], second,
            )
        # compression axis (~1/6 of single-file trials): the same CSV
        # bytes land gzip/bz2-compressed — pandas compression='infer'
        # on the reference side, our driver-side decompress on ours
        fname = "t.csv"
        if second is None and rng.random() < 0.17:
            import bz2 as bz2mod
            import gzip as gzipmod

            ext = rng.choice([".gz", ".bz2"])
            raw = open(os.path.join(d, "t.csv"), "rb").read()
            opener = gzipmod.open if ext == ".gz" else bz2mod.open
            with opener(os.path.join(d, "t.csv" + ext), "wb") as f:
                f.write(raw)
            os.remove(os.path.join(d, "t.csv"))
            fname = "t.csv" + ext
            ref_args[0] = fname
        try:
            run_ref(d, ref_args)
            if second is not None:
                run_ref(d, ["t2.csv", "ref.db"] + ref_args[2:])
        except subprocess.CalledProcessError:
            continue
        tried += 1
        our_kwargs = dict(
            separator=sep,
            quoting=quoting,
            extract_column=(["r0" if shape else "c0"] if extract else ()),
            shape=shape,
            datetime=(
                ["dt"] if date_col and date_flag == "-dt" and not shape else ()
            ),
            date=(["dt"] if date_col and date_flag == "-d" and not shape else ()),
        )
        import_csvs(
            spark,
            [os.path.join(d, fname)],
            os.path.join(d, "ours.db"),
            **our_kwargs,
        )
        if second is not None:
            import_csvs(
                spark,
                [os.path.join(d, "t2.csv")],
                os.path.join(d, "ours.db"),
                **our_kwargs,
            )
        a = snapshot(os.path.join(d, "ref.db"))
        b = snapshot(os.path.join(d, "ours.db"))
        if a != b:
            fails += 1
            if set(a) != set(b):
                print(
                    "seed", seed, "trial", trial,
                    ": TABLE SET ref:", sorted(a), "ours:", sorted(b),
                )
            for k in set(a) | set(b):
                if a.get(k) != b.get(k):
                    print("seed", seed, "trial", trial, ": ref =", str(a.get(k))[:170])
                    print("                 ours=", str(b.get(k))[:170])
print(tried, "trials, fails=", fails)
