"""Randomized uint64-ladder differential sweep: random value sequences
from the ladder alphabet (uint64 tier / beyond-u64 / negative overflows /
plain ints / NA tokens / floats) through BOTH the real reference (via
tests/ref_shims) and our engine, comparing SQLite snapshots.

Usage: python tools/ladder_sweep.py [seed] [n_trials]
       SPARK_GRAFT_PANDAS_FLOAT_PARITY=1 for the bit-exact mode.

Round-8 record (seed 424242, 120 trials → 115 comparable, 5 reference
crashes on uint64-clean to_sql): default mode 20 fails, every one the
documented xstrtod value family; PARITY MODE 0 fails — the empirically
fitted conflict/overflow rules in _decide_types hold under random order
permutations, and parity values are bit-exact in the >2^53 regime."""
import os, random, sys, tempfile
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))));
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from test_reference_differential import run_reference, snapshot
from csvs_to_sqlite_spark.session import get_spark
from csvs_to_sqlite_spark.engine import import_csvs
spark = get_spark("ladder"); spark.sparkContext.setLogLevel("ERROR")

ALPHabet = [
    "18446744073709551614",       # u64 tier
    "9223372036854775808",        # u64 tier lower edge
    "18446744073709551615",      # u64 max exactly
    "18446744073709551616",      # u64 max + 1 (20 digits, beyond)
    "99999999999999999999",      # 20-digit beyond
    "9" * 25,                     # far beyond
    "-9223372036854775809",      # negative overflow
    "-" + "9" * 25,               # negative far beyond
    "-5", "0", "7", "9223372036854775807",  # plain ints
    "NA", "None", "nan",          # NA tokens
    "0.5", "1e5",                 # floats (order rule interplay)
    # r11: negative-NOTATION floats — the uint64-negative ladder rule
    # (float only if a positive float exists anywhere or a negative one
    # precedes the first u64; '-0.0' counts as negative by notation)
    "-.5", "-0.5", "-0.0", "-1e-5",
]
rng = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 424242)
n_trials = int(sys.argv[2]) if len(sys.argv) > 2 else 120
fails = tried = 0
parity = os.environ.get("SPARK_GRAFT_PANDAS_FLOAT_PARITY")
for t in range(n_trials):
    rows = [rng.choice(ALPHabet) for _ in range(rng.randint(1, 6))]
    d = tempfile.mkdtemp()
    open(os.path.join(d, "t.csv"), "w").write(
        "c0,c1\n" + "\n".join(r + ",x" for r in rows) + "\n")
    try:
        run_reference(d, "t.csv", "ref.db", [])
    except Exception:
        continue  # reference crash (uint64-clean to_sql overflow etc.)
    tried += 1
    import_csvs(spark, [os.path.join(d, "t.csv")], os.path.join(d, "ours.db"))
    a, b = snapshot(os.path.join(d, "ref.db")), snapshot(os.path.join(d, "ours.db"))
    if a != b:
        fails += 1
        print("trial", t, rows)
        print("  ref ", a.get("t"))
        print("  ours", b.get("t"))
print(f"{tried} trials (of {n_trials}), fails={fails}, parity={bool(parity)}")
