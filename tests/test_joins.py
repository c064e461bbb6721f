"""Unit tests for the join operators (D2-D5) composed with dim build."""

from pyspark.sql import functions as F

from csvs_to_sqlite_spark.operators.dims import build_dims
from csvs_to_sqlite_spark.operators.joins import asof_join, denormalize, semi_join_row_ids
from csvs_to_sqlite_spark.operators.rowid import ROW_ID
from csvs_to_sqlite_spark.plans.specs import DimSpec, Table


def test_denormalize_with_shared_dim(spark):
    rows = [
        (1, "The Rock", "Sean Connery", "Nicolas Cage"),
        (2, "National Treasure", "Nicolas Cage", "Diane Kruger"),
    ]
    df = spark.createDataFrame(rows, f"{ROW_ID} long, film string, actor_1 string, actor_2 string")
    tables, dims = build_dims(
        [Table("films", df)],
        [DimSpec("actor_1", "actors", "name"), DimSpec("actor_2", "actors", "name")],
    )
    fact = tables[0].df
    out = denormalize(
        fact,
        ["film", "actor_1", "actor_2"],
        {
            "actor_1": (dims["actors"], "name"),
            "actor_2": (dims["actors"], "name"),
        },
    )
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        ("National Treasure", "Nicolas Cage", "Diane Kruger"),
        ("The Rock", "Sean Connery", "Nicolas Cage"),
    ]


def test_semi_join_row_ids(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], f"{ROW_ID} long, v string"
    )
    matches = spark.createDataFrame([(1,), (3,), (3,)], f"{ROW_ID} long")
    got = sorted(r["v"] for r in semi_join_row_ids(fact, matches, ROW_ID).collect())
    assert got == ["a", "c"]


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, 10), (1, 200, 20), (2, 150, 30)], "k long, ts long, lv long"
    )
    right = spark.createDataFrame(
        [(1, 100, 5.0), (1, 150, 6.0), (2, 200, 7.0)], "k long, ts long, rv double"
    )
    out = {
        (r["k"], r["ts"]): r["asof_rv"]
        for r in asof_join(left, right, "k", "ts", "ts", ["rv"]).collect()
    }
    assert out[(1, 100)] == 5.0  # inclusive at equal ts
    assert out[(1, 200)] == 6.0  # latest at-or-before
    assert out[(2, 150)] is None  # no prior right row
