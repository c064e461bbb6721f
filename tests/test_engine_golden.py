"""Golden behavior-parity tests, ported from the reference's E2E suite
(/root/reference/tests/test_csvs_to_sqlite.py). Fixture CSVs are fresh
transcriptions of FIXTURES.md; assertions target the SQLite file our
engine produces — same schemas, rows, types, lookup-table id order,
index/FTS inventory as the reference's goldens.
"""

import sqlite3

import pytest

from csvs_to_sqlite_spark.engine import import_csvs

CSV = """county,precinct,office,district,party,candidate,votes
Yolo,100001,President,,LIB,Gary Johnson,41
Yolo,100001,President,,PAF,Gloria Estela La Riva,8
Yolo,100001,Proposition 51,,,Yes,2802
Yolo,100001,Proposition 51,,,No,2051
Yolo,100001,State Assembly,7,DEM,Kevin McCarty,3920
Yolo,100001,State Assembly,7,REP,Ryan K Brown,1793"""

CSV_MULTI = """film,actor_1,actor_2
The Rock,Sean Connery,Nicolas Cage
National Treasure,Nicolas Cage,Diane Kruger
Troy,Diane Kruger,Orlando Bloom"""


@pytest.fixture
def election_csv(tmp_path):
    p = tmp_path / "test.csv"
    p.write_text(CSV)
    return str(p)


def test_flat_import(spark, tmp_path, election_csv):
    db = str(tmp_path / "test.db")
    result = import_csvs(spark, [election_csv], db)
    assert result.summary == f"Created {db} from 1 CSV file"
    conn = sqlite3.connect(db)
    # reference tests:49-57 — exact inferred schema
    info = conn.execute("PRAGMA table_info(test)").fetchall()
    assert [(c[1], c[2]) for c in info] == [
        ("county", "TEXT"),
        ("precinct", "INTEGER"),
        ("office", "TEXT"),
        ("district", "INTEGER"),  # int-with-blank is INTEGER, not REAL (C1)
        ("party", "TEXT"),
        ("candidate", "TEXT"),
        ("votes", "INTEGER"),
    ]
    rows = conn.execute("select * from test").fetchall()
    assert len(rows) == 6
    # blanks → NULL (reference tests:60-63)
    assert rows[0] == ("Yolo", 100001, "President", None, "LIB", "Gary Johnson", 41)
    assert rows[4] == ("Yolo", 100001, "State Assembly", 7, "DEM", "Kevin McCarty", 3920)
    # value types (reference tests:67-71)
    assert isinstance(rows[4][3], int)
    conn.close()


def test_extract_columns_first_appearance_ids(spark, tmp_path, election_csv):
    db = str(tmp_path / "test.db")
    import_csvs(
        spark,
        [election_csv],
        db,
        extract_column=["office", "district", "party", "candidate"],
    )
    conn = sqlite3.connect(db)
    # reference tests:130-146: ids in first-appearance order
    assert conn.execute("select id, value from office order by id").fetchall() == [
        (1, "President"),
        (2, "Proposition 51"),
        (3, "State Assembly"),
    ]
    assert conn.execute("select id, value from candidate order by id").fetchall() == [
        (1, "Gary Johnson"),
        (2, "Gloria Estela La Riva"),
        (3, "Yes"),
        (4, "No"),
        (5, "Kevin McCarty"),
        (6, "Ryan K Brown"),
    ]
    # float district extracted via %g → "7" (reference tests:112-113)
    assert conn.execute("select id, value from district").fetchall() == [(1, "7")]
    # NULL party → NULL fk, no lookup row (reference tests:110-111,136-138)
    assert conn.execute("select id, value from party order by id").fetchall() == [
        (1, "LIB"),
        (2, "PAF"),
        (3, "DEM"),
        (4, "REP"),
    ]
    rows = conn.execute("select * from test order by rowid").fetchall()
    assert rows[2] == ("Yolo", 100001, 2, None, None, 3, 2802)
    # FK auto-indexes exist (G2)
    idx = {r[0] for r in conn.execute("select name from sqlite_master where type='index'")}
    assert '"test_office"' in str(idx) or "test_office" in idx
    conn.close()


def test_shared_dim_across_columns(spark, tmp_path):
    p = tmp_path / "films.csv"
    p.write_text(CSV_MULTI)
    db = str(tmp_path / "films.db")
    import_csvs(
        spark,
        [str(p)],
        db,
        extract_column=["actor_1:actors:name", "actor_2:actors:name"],
    )
    conn = sqlite3.connect(db)
    # column-outer ordering: all actor_1 values numbered before actor_2's
    # (reference utils.py:240-253; SURVEY §7.5.2)
    assert conn.execute("select id, name from actors order by id").fetchall() == [
        (1, "Sean Connery"),
        (2, "Nicolas Cage"),
        (3, "Diane Kruger"),
        (4, "Orlando Bloom"),
    ]
    rows = conn.execute("select * from films order by rowid").fetchall()
    assert rows == [("The Rock", 1, 2), ("National Treasure", 2, 3), ("Troy", 3, 4)]
    conn.close()


def test_fts(spark, tmp_path, election_csv):
    db = str(tmp_path / "test.db")
    import_csvs(
        spark,
        [election_csv],
        db,
        extract_column=["candidate"],
        fts=["candidate"],
    )
    conn = sqlite3.connect(db)
    # FTS indexes the extracted LABEL, not the id (F3)
    rows = conn.execute(
        "select * from test where rowid in "
        "(select rowid from test_fts where test_fts match 'gloria')"
    ).fetchall()
    assert len(rows) == 1
    assert rows[0][6] == 8
    conn.close()


def test_append_mode(spark, tmp_path, election_csv):
    db = str(tmp_path / "test.db")
    import_csvs(spark, [election_csv], db)
    result = import_csvs(spark, [election_csv], db)
    assert result.summary == f"Added 1 CSV file to {db}"
    conn = sqlite3.connect(db)
    assert conn.execute("select count(*) from test").fetchone()[0] == 12
    conn.close()


def test_replace_tables(spark, tmp_path, election_csv):
    db = str(tmp_path / "test.db")
    import_csvs(spark, [election_csv], db)
    import_csvs(spark, [election_csv], db, replace_tables=True)
    conn = sqlite3.connect(db)
    assert conn.execute("select count(*) from test").fetchone()[0] == 6
    conn.close()


def test_replace_tables_with_single_table_option(spark, tmp_path):
    """--replace-tables + -t: the drop applies once per run, not once per
    file — both files of the run land in the fresh table."""
    f1 = tmp_path / "a.csv"
    f2 = tmp_path / "b.csv"
    f1.write_text(CSV)
    f2.write_text(CSV)
    db = str(tmp_path / "c.db")
    import_csvs(spark, [str(f1), str(f2)], db, table="combined")
    conn = sqlite3.connect(db)
    assert conn.execute("select count(*) from combined").fetchone()[0] == 12
    conn.close()
    import_csvs(spark, [str(f1), str(f2)], db, table="combined", replace_tables=True)
    conn = sqlite3.connect(db)
    assert conn.execute("select count(*) from combined").fetchone()[0] == 12
    conn.close()


def test_shape_and_compound_index(spark, tmp_path, election_csv):
    db = str(tmp_path / "test.db")
    import_csvs(
        spark,
        [election_csv],
        db,
        shape="county:Cty,votes:Vts(REAL)",
        index=["Cty,Vts"],
    )
    conn = sqlite3.connect(db)
    info = conn.execute("PRAGMA table_info(test)").fetchall()
    assert [(c[1], c[2]) for c in info] == [("Cty", "TEXT"), ("Vts", "REAL")]
    assert conn.execute("select Vts from test order by rowid limit 1").fetchone()[0] == 41.0
    names = {r[0] for r in conn.execute("select name from sqlite_master where type='index'")}
    assert any("test_Cty_Vts" in n for n in names)
    conn.close()


def test_just_strings(spark, tmp_path, election_csv):
    db = str(tmp_path / "test.db")
    import_csvs(spark, [election_csv], db, just_strings=True)
    conn = sqlite3.connect(db)
    info = conn.execute("PRAGMA table_info(test)").fetchall()
    assert all(c[2] == "TEXT" for c in info)
    assert conn.execute("select votes from test order by rowid limit 1").fetchone()[0] == "41"
    conn.close()


def test_just_strings_with_shape_real_cast(spark, tmp_path):
    # reference tests:714-732: --just-strings + shape REAL casts strings
    p = tmp_path / "m.csv"
    p.write_text("name,gross\nFilm A,22.5\nFilm B,10")
    db = str(tmp_path / "m.db")
    import_csvs(spark, [str(p)], db, just_strings=True, shape="name:name,gross:gross(REAL)")
    conn = sqlite3.connect(db)
    info = {c[1]: c[2] for c in conn.execute("PRAGMA table_info(m)")}
    assert info == {"name": "TEXT", "gross": "REAL"}
    rows = conn.execute("select gross from m order by rowid").fetchall()
    assert rows == [(22.5,), (10.0,)]
    conn.close()


def test_composite_primary_key(spark, tmp_path):
    p = tmp_path / "pk.csv"
    p.write_text("pk1,pk2,name\none,one,11\none,two,12\ntwo,one,21")
    db = str(tmp_path / "pk.db")
    import_csvs(spark, [str(p)], db, primary_key=["pk1", "pk2"])
    conn = sqlite3.connect(db)
    ddl = conn.execute("select sql from sqlite_master where name='pk'").fetchone()[0]
    assert "PRIMARY KEY ([pk1], [pk2])" in ddl
    conn.close()


def test_fixed_and_filename_columns(spark, tmp_path, election_csv):
    db = str(tmp_path / "test.db")
    import_csvs(
        spark,
        [election_csv],
        db,
        filename_column="source",
        fixed_columns=[("category", "elections")],
        fixed_columns_int=[("year", 2016)],
        fixed_columns_float=[("weight", 1.5)],
    )
    conn = sqlite3.connect(db)
    row = conn.execute(
        "select source, category, year, weight from test limit 1"
    ).fetchone()
    assert row == ("test", "elections", 2016, 1.5)
    info = {c[1]: c[2] for c in conn.execute("PRAGMA table_info(test)")}
    assert info["year"] == "INTEGER" and info["weight"] == "REAL" and info["category"] == "TEXT"
    conn.close()


def test_table_naming_dedup(spark, tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    f1 = tmp_path / "a" / "test.csv"
    f2 = tmp_path / "b" / "test.csv"
    f1.write_text(CSV)
    f2.write_text(CSV)
    db = str(tmp_path / "out.db")
    import_csvs(spark, [str(f1), str(f2)], db)
    conn = sqlite3.connect(db)
    names = {
        r[0]
        for r in conn.execute("select name from sqlite_master where type='table'")
    }
    assert {"test", "test-1"}.issubset(names)
    conn.close()


def test_dates_and_datetimes(spark, tmp_path):
    p = tmp_path / "dates.csv"
    p.write_text(
        "headline,date,datetime\n"
        "First,3rd May 2017,10pm on April 4 1938\n"
        "Second,04/30/2005,5:45 10 December 2009"
    )
    db = str(tmp_path / "dates.db")
    import_csvs(spark, [str(p)], db, date=["date"], datetime=["datetime"])
    conn = sqlite3.connect(db)
    rows = conn.execute("select date, datetime from dates order by rowid").fetchall()
    # reference tests:584-587
    assert rows == [
        ("2017-05-03", "1938-04-04T22:00:00"),
        ("2005-04-30", "2009-12-10T05:45:00"),
    ]
    conn.close()


def test_custom_datetime_format(spark, tmp_path):
    p = tmp_path / "c.csv"
    p.write_text("headline,date\nCustom format,03/02/01")
    db = str(tmp_path / "c.db")
    import_csvs(spark, [str(p)], db, date=["date"], datetime_format=["%y/%d/%m"])
    conn = sqlite3.connect(db)
    assert conn.execute("select date from c").fetchone()[0] == "2003-01-02"
    conn.close()


def test_float_dim_canonicalization(spark, tmp_path):
    # reference tests/test_utils.py:34-54: float scores extract as %g strings
    p = tmp_path / "scores.csv"
    p.write_text("name,score\nTerry,0.5\nTerry,0.8\nOwen,0.7\nZed,7.0\nBig,1200000.0")
    db = str(tmp_path / "scores.db")
    import_csvs(spark, [str(p)], db, extract_column=["score"], just_strings=False)
    conn = sqlite3.connect(db)
    vals = [r[0] for r in conn.execute("select value from score order by id")]
    assert vals == ["0.5", "0.8", "0.7", "7", "1.2e+06"]
    conn.close()


def test_incremental_dim_growth(spark, tmp_path):
    p1 = tmp_path / "r1.csv"
    p1.write_text("name,score\nTerry,0.5\nTerry,0.8\nOwen,0.7")
    p2 = tmp_path / "r2.csv"
    p2.write_text("name,score\nOwen,0.9\nZoe,0.1")
    db = str(tmp_path / "inc.db")
    import_csvs(spark, [str(p1)], db, table="people_facts", extract_column=["name:People:first_name"])
    import_csvs(spark, [str(p2)], db, table="people_facts", extract_column=["name:People:first_name"])
    conn = sqlite3.connect(db)
    # E4: Terry/Owen keep ids, Zoe appended as 3
    assert conn.execute("select id, first_name from People order by id").fetchall() == [
        (1, "Terry"),
        (2, "Owen"),
        (3, "Zoe"),
    ]
    assert conn.execute("select name from people_facts order by rowid").fetchall() == [
        (1,),
        (1,),
        (2,),
        (2,),
        (3,),
    ]
    conn.close()


def test_readme_help_in_sync():
    """Docs-sync guarantee, porting the reference's cog check
    (reference tests/test_csvs_to_sqlite.py:769-778): the --help text
    embedded in README.md must match the live CLI's output."""
    import pathlib

    from tools.sync_readme_help import sync

    readme = pathlib.Path(__file__).resolve().parent.parent / "README.md"
    assert sync(readme, write=False), (
        "Run 'python tools/sync_readme_help.py' to update --help in README.md"
    )


def test_high_cardinality_dim_streams_without_collect(spark, tmp_path, monkeypatch):
    """Guardrail: a near-unique extracted column must not collect the dim
    into a driver map. Force the threshold below the dim size and assert
    the streamed + Spark-join-rewritten output is byte-identical to the
    default (collected-map) path."""
    import csv as _csv

    p = tmp_path / "hc.csv"
    with open(p, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["k", "label", "v"])
        for i in range(500):
            # repeat a few values so ids are reused, rest near-unique
            w.writerow([i, f"label_{i % 7 if i < 20 else i}", i * 2])

    def rows(db):
        conn = sqlite3.connect(db)
        try:
            t = conn.execute("select * from hc order by rowid").fetchall()
            d = conn.execute("select * from label order by id").fetchall()
            schema = conn.execute(
                "select name, sql from sqlite_master where type='table' order by name"
            ).fetchall()
            return t, d, schema
        finally:
            conn.close()

    db_default = str(tmp_path / "default.db")
    import_csvs(spark, [str(p)], db_default, extract_column=["label"])

    monkeypatch.setenv("SPARK_GRAFT_DIM_COLLECT_MAX", "10")
    db_streamed = str(tmp_path / "streamed.db")
    import_csvs(spark, [str(p)], db_streamed, extract_column=["label"])

    assert rows(db_streamed) == rows(db_default)
    # sanity: the dim really is above the forced threshold
    assert len(rows(db_default)[1]) > 10


def test_incremental_growth_across_big_dim_pages_not_fetchall(
    spark, tmp_path, monkeypatch
):
    """E4 against a database whose dim exceeds the collect guardrail: the
    existing dim must page into a parquet spill (never fetchall() through
    the driver), the anti-join stays distributed, and ids/facts are
    byte-identical to the driver-map path (reference utils.py:205-223)."""
    import csv as _csv

    import csvs_to_sqlite_spark.engine as eng

    def write_csv(p, labels):
        with open(p, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["k", "label"])
            for i, lab in enumerate(labels):
                w.writerow([i, lab])

    p1 = tmp_path / "r1.csv"
    write_csv(p1, [f"v{i:03d}" for i in range(25)])
    p2 = tmp_path / "r2.csv"
    write_csv(p2, ["v003", "new_a", "v017", "new_b", "new_c"])

    def run(dbname, threshold):
        if threshold:
            monkeypatch.setenv("SPARK_GRAFT_DIM_COLLECT_MAX", threshold)
        else:
            monkeypatch.delenv("SPARK_GRAFT_DIM_COLLECT_MAX", raising=False)
        db = str(tmp_path / dbname)
        import_csvs(spark, [str(p1)], db, table="facts", extract_column=["label"])
        import_csvs(spark, [str(p2)], db, table="facts", extract_column=["label"])
        conn = sqlite3.connect(db)
        try:
            return (
                conn.execute("select id, value from label order by id").fetchall(),
                conn.execute("select k, label from facts order by rowid").fetchall(),
            )
        finally:
            conn.close()

    expected = run("default.db", None)
    assert len(expected[0]) == 28  # 25 + 3 genuinely-new values

    paged = []
    real_page = eng._page_dim_to_parquet

    def spy(*a, **k):
        paged.append(a[2])
        # tiny pages so the loop really iterates
        k.setdefault("page_rows", 7)
        return real_page(*a, **k)

    monkeypatch.setattr(eng, "_page_dim_to_parquet", spy)
    assert run("big.db", "10") == expected
    assert paged == ["label"], "existing big dim must take the paged-parquet path"


def test_scan_split_conf_restored_on_load_failure(spark, tmp_path, monkeypatch):
    """A non-LoadCsvError failure mid-load must not leave the host
    session at the ingest-scoped 2m scan splits (review finding)."""
    import csvs_to_sqlite_spark.engine as eng

    (tmp_path / "t.csv").write_text("a,b\n1,x\n")
    before = spark.conf.get("spark.sql.files.maxPartitionBytes", None)

    def boom(*a, **k):
        raise RuntimeError("simulated executor failure")

    monkeypatch.setattr(eng, "load_csv", boom)
    with pytest.raises(RuntimeError):
        eng.import_csvs(spark, [str(tmp_path / "t.csv")], str(tmp_path / "o.db"))
    assert spark.conf.get("spark.sql.files.maxPartitionBytes", None) == before


def test_big_dim_fallback_end_to_end_equals_driver_map_path(
    spark, tmp_path, monkeypatch
):
    """VERDICT r5 item 4: the least-tested ingest branch — a near-unique
    -c column driving big_cols → rewrite_fk(broadcast=False) + the
    repartitionByRange landing — must produce a byte-identical database
    to the driver-map path, across BOTH the initial import and an
    incremental append (which additionally exercises the paged
    _existing_dims read and the merge-pinned E4 anti-join)."""
    import csv as _csv

    def write_csv(p, start, n, dup_every=40):
        with open(p, "w", newline="") as f:
            w = _csv.writer(f)
            w.writerow(["k", "label", "v"])
            for i in range(start, start + n):
                # near-unique: a duplicate only every ``dup_every`` rows
                lab = f"lab_{i}" if i % dup_every else "lab_dup"
                w.writerow([i, lab, round(i * 0.25, 2)])

    p1 = tmp_path / "r1.csv"
    write_csv(p1, 0, 30_000)
    p2 = tmp_path / "r2.csv"
    write_csv(p2, 28_000, 4_000)

    def run(dbname, threshold):
        if threshold:
            monkeypatch.setenv("SPARK_GRAFT_DIM_COLLECT_MAX", threshold)
        else:
            monkeypatch.delenv("SPARK_GRAFT_DIM_COLLECT_MAX", raising=False)
        db = str(tmp_path / dbname)
        import_csvs(spark, [str(p1)], db, table="facts", extract_column=["label"])
        import_csvs(spark, [str(p2)], db, table="facts", extract_column=["label"])
        conn = sqlite3.connect(db)
        try:
            return (
                conn.execute("select id, value from label order by id").fetchall(),
                conn.execute("select k, label, v from facts order by rowid").fetchall(),
                conn.execute(
                    "select name, sql from sqlite_master where type='table' order by name"
                ).fetchall(),
            )
        finally:
            conn.close()

    expected = run("default.db", None)
    got = run("streamed.db", "1000")
    assert got[0] == expected[0]
    assert got[1] == expected[1]
    assert got[2] == expected[2]
    # sanity: the dim really exceeded the forced guardrail on BOTH runs
    assert len(expected[0]) > 1000


def test_rewrite_fk_nonbroadcast_is_shuffle_join_for_big_dim(spark):
    """The big-dim fk rewrite must not broadcast the huge dim: with
    broadcast=False and a dim whose size estimate exceeds the broadcast
    threshold, the static plan is a shuffle join (SortMergeJoin /
    ShuffledHashJoin), never BroadcastHashJoin with the dim on the build
    side."""
    from pyspark.sql import functions as F

    from csvs_to_sqlite_spark.operators.dims import rewrite_fk
    from csvs_to_sqlite_spark.operators.rowid import ROW_ID

    dim = spark.range(1, 1_000_001).select(
        F.col("id"), F.concat(F.lit("value_"), F.col("id")).alias("value")
    )
    fact = spark.range(5_000).select(
        F.col("id").alias(ROW_ID),
        F.concat(F.lit("value_"), F.col("id") + 1).alias("label"),
    )
    out = rewrite_fk(fact, "label", dim, value_column="value", broadcast=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:1500]


def test_tree_union_flat_plan_50_parts(spark):
    """VERDICT_r10 #7: the dim-prefetch union is a balanced tree, not a
    left-deep unionAll chain — at 50 parts the optimized plan is ONE
    n-ary Union (CombineUnions collapses the tree) and analysis stays
    fast."""
    import time

    from pyspark.sql import functions as F

    from csvs_to_sqlite_spark.engine import tree_union

    parts = [
        spark.range(1).select(
            F.lit(f"dim{i}").alias("__dim__"),
            F.lit(i).alias("id"),
            F.lit(f"v{i}").alias("__v__"),
        )
        for i in range(50)
    ]
    t0 = time.time()
    tagged = tree_union(parts)
    plan = tagged._jdf.queryExecution().optimizedPlan().toString()
    elapsed = time.time() - t0
    # one flat n-ary Union node, not 49 nested binary ones
    assert plan.count("Union") == 1
    # analysis of the 50-part tree is O(n log n)-cheap; a pathological
    # chain blowup would push this far beyond the bound
    assert elapsed < 20.0
    rows = tagged.collect()
    assert len(rows) == 50
    assert {r["__dim__"] for r in rows} == {f"dim{i}" for i in range(50)}
    # single-part and empty-edge behavior
    assert tree_union([parts[0]]) is parts[0]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tree_union([])


def test_fifty_dim_prefetch_end_to_end(spark, tmp_path):
    """50 extracted dims flow through the single prefetch job (tagged
    tree union) with correct per-dim first-appearance ids."""
    cols = [f"c{i:02d}" for i in range(50)]
    lines = [",".join(cols)]
    # two rows; every column has two distinct values in first-appearance
    # order ("b" then "a") so id assignment is observable
    lines.append(",".join(f"b{i}" for i in range(50)))
    lines.append(",".join(f"a{i}" for i in range(50)))
    csv = tmp_path / "wide.csv"
    csv.write_text("\n".join(lines) + "\n")
    db = str(tmp_path / "wide.db")
    import_csvs(spark, [str(csv)], db, extract_column=cols)
    conn = sqlite3.connect(db)
    try:
        for i, c in enumerate(cols):
            got = conn.execute(f"select id, value from {c} order by id").fetchall()
            assert got == [(1, f"b{i}"), (2, f"a{i}")], c
        # fact table carries ids 1,2 in row order for every fk column
        first, second = conn.execute(
            "select * from wide order by rowid"
        ).fetchall()
        assert first == tuple([1] * 50)
        assert second == tuple([2] * 50)
    finally:
        conn.close()


def test_import_leaves_no_pinned_caches_and_joins_spills(spark, tmp_path):
    """The r12 spill/dims overlap defers the string-cache unpersist to
    _join_spills: after import_csvs returns there must be NO newly
    pinned blocks (the bench host session is long-lived), and the
    overlapped spill write must be fully landed — the db's facts and
    dims agree with a multi-file import's first-appearance contract."""
    sc = spark.sparkContext._jsc.sc()

    def pinned_ids():
        ids, it = set(), sc.getPersistentRDDs().iterator()
        while it.hasNext():
            ids.add(it.next()._1())
        return ids

    a = tmp_path / "a.csv"
    a.write_text("k,v\nx,1\ny,2\n")
    b = tmp_path / "b.csv"
    b.write_text("k,v\nz,3\nx,4\n")
    db = str(tmp_path / "out.db")
    # zero-pin check on a dim-free import: the only persisted frames on
    # that path are the two string caches, which _join_spills must
    # release. (A dim import also leaves its build_dims localCheckpoints
    # registered until the JVM-side ContextCleaner runs — pre-existing
    # lifecycle, released on JVM GC, not assertable in a fast test.)
    before = pinned_ids()
    import_csvs(spark, [str(a)], str(tmp_path / "nodim.db"))
    import_csvs(spark, [str(b)], str(tmp_path / "nodim2.db"))
    assert pinned_ids() - before == set()
    import_csvs(spark, [str(a), str(b)], db, extract_column=["k"])
    conn = sqlite3.connect(db)
    try:
        assert conn.execute("select id, value from k order by id").fetchall() == [
            (1, "x"), (2, "y"), (3, "z"),
        ]
        assert conn.execute("select * from a order by rowid").fetchall() == [
            (1, 1), (2, 2),
        ]
        assert conn.execute("select * from b order by rowid").fetchall() == [
            (3, 3), (1, 4),
        ]
    finally:
        conn.close()
