"""Construction-cost A/B for infer_reference_types' plan building:
the per-column flag projection (~10 exprs/col) and ~13 aggregates/col
built as PySpark Column operations (status quo) vs as SQL strings
passed through ONE selectExpr + per-aggregate F.expr. Times CONSTRUCTION
only (no job), interleaved, on a 17-column frame — the bench shape.

Usage: python tools/ab_infer_construction.py [pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from csvs_to_sqlite_spark.session import get_spark

NCOLS = 17


def build_columns(mask_stage):
    int_re = r"^\s*[+-]?[0-9]+\s*$"
    proj = [F.col("__pos__")]
    for i in range(NCOLS):
        q = F.col(f"__m{i}")
        d = q.try_cast("double")
        re_b = F.when(d.isNotNull(), q.rlike(int_re)).otherwise(F.lit(False))
        ntrim = F.length(F.trim(q))
        proj.append(q.isNotNull().alias(f"p{i}_nn"))
        proj.append(re_b.alias(f"p{i}_re"))
        proj.append(d.alias(f"p{i}_d"))
        fits_long = F.when(
            re_b, (ntrim <= 18) | q.try_cast("long").isNotNull()
        ).otherwise(F.lit(False))
        proj.append(fits_long.alias(f"p{i}_long"))
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
        sql_long = (
            f"case when {sql_re} then (length(trim({mc})) <= 18"
            f" or try_cast({mc} as bigint) is not null) else false end"
        )
        sql_bits = (
            f"case when {sql_re} and {sql_d} < 0.0d then 2"
            f" when {sql_d} = 0.0d and"
            f" (contains({mc}, 'e') or contains({mc}, 'E')) then 4"
            f" when {sql_re} and {sql_d} > 0.0d"
            f" and not {sql_long} and not {sql_beyond} then 1"
            f" else 0 end"
        )
        proj.append(F.expr(sql_bits).alias(f"p{i}_bits"))
        proj.append(
            F.expr(
                f"case when {sql_d} is not null and not {sql_re}"
                f" then startswith(ltrim({mc}), '-') else null end"
            ).alias(f"p{i}_negf")
        )
        proj.append(
            F.expr(
                f"case when abs({sql_d}) = cast('Infinity' as double) then"
                f" ({mc} rlike '[0-9]' or"
                f" not {mc} rlike '^[+-]?(?i)(inf|infinity)$')"
                f" else false end"
            ).alias(f"p{i}_ovf")
        )
        proj.append(F.lower(q).isin("true", "false").alias(f"p{i}_bool"))
    base = mask_stage.select(*proj)
    mid = F.col("__pos__")
    aggs = [F.count(F.lit(1)).alias("__rows__")]
    for i in range(NCOLS):
        nn = F.col(f"p{i}_nn")
        re_b = F.col(f"p{i}_re")
        d = F.col(f"p{i}_d")
        aggs.append(F.count(F.when(nn, 1)).alias(f"c{i}_n"))
        aggs.append(F.count(F.when(F.col(f"p{i}_bool"), 1)).alias(f"c{i}_bool"))
        aggs.append(F.count(F.when(re_b, 1)).alias(f"c{i}_re"))
        aggs.append(F.count(F.when(F.col(f"p{i}_long"), 1)).alias(f"c{i}_long"))
        is_floatish = d.isNotNull() & ~re_b
        aggs.append(F.min(F.when(F.col(f"p{i}_big"), mid)).alias(f"c{i}_firstbig"))
        aggs.append(F.min(F.when(is_floatish, mid)).alias(f"c{i}_firstfloat"))
        negf = F.col(f"p{i}_negf")
        aggs.append(F.min(F.when(negf, mid)).alias(f"c{i}_firstnegf"))
        aggs.append(F.min(F.when(~negf, mid)).alias(f"c{i}_firstposf"))
        aggs.append(
            F.min(
                F.when(F.col(f"p{i}_bits").bitwiseAND(1) == 1, mid)
            ).alias(f"c{i}_firstu64")
        )
        aggs.append(
            F.min(
                F.when(re_b & (d < 0) & ~F.col(f"p{i}_long"), mid)
            ).alias(f"c{i}_firstnegovf")
        )
        aggs.append(F.bit_or(F.col(f"p{i}_bits")).alias(f"c{i}_bits"))
        aggs.append(F.count(d).alias(f"c{i}_dbl"))
        aggs.append(F.count(F.when(F.col(f"p{i}_ovf"), 1)).alias(f"c{i}_ovf"))
        aggs.append(
            F.count(
                F.when((F.abs(d) < 2.2250738585072014e-308) & (d != 0.0), 1)
            ).alias(f"c{i}_subn")
        )
        aggs.append(
            F.count(
                F.when(
                    d.isNotNull()
                    & ~F.isnan(d)
                    & (((d % F.lit(1.0)) != 0.0) | (F.abs(d) == float("inf"))),
                    1,
                )
            ).alias(f"c{i}_nonint")
        )
    return base.groupBy(F.spark_partition_id().alias("__pid__")).agg(*aggs)


def build_strings(mask_stage):
    proj = ["`__pos__`"]
    for i in range(NCOLS):
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
        sql_long = (
            f"case when {sql_re} then (length(trim({mc})) <= 18"
            f" or try_cast({mc} as bigint) is not null) else false end"
        )
        sql_bits = (
            f"case when {sql_re} and {sql_d} < 0.0d then 2"
            f" when {sql_d} = 0.0d and"
            f" (contains({mc}, 'e') or contains({mc}, 'E')) then 4"
            f" when {sql_re} and {sql_d} > 0.0d"
            f" and not {sql_long} and not {sql_beyond} then 1"
            f" else 0 end"
        )
        proj.append(f"{mc} is not null as `p{i}_nn`")
        proj.append(
            f"case when {sql_d} is not null then"
            f" {mc} rlike '^\\\\s*[+-]?[0-9]+\\\\s*$'"
            f" else false end as `p{i}_re`"
        )
        proj.append(f"{sql_d} as `p{i}_d`")
        proj.append(f"{sql_long} as `p{i}_long`")
        proj.append(f"{sql_beyond} as `p{i}_big`")
        proj.append(f"{sql_bits} as `p{i}_bits`")
        proj.append(
            f"case when {sql_d} is not null and not {sql_re}"
            f" then startswith(ltrim({mc}), '-') else null end as `p{i}_negf`"
        )
        proj.append(
            f"case when abs({sql_d}) = cast('Infinity' as double) then"
            f" ({mc} rlike '[0-9]' or"
            f" not {mc} rlike '^[+-]?(?i)(inf|infinity)$')"
            f" else false end as `p{i}_ovf`"
        )
        proj.append(f"lower({mc}) in ('true', 'false') as `p{i}_bool`")
    base = mask_stage.selectExpr(*proj)
    aggs = ["count(1) as `__rows__`"]
    for i in range(NCOLS):
        aggs.append(f"count(case when `p{i}_nn` then 1 end) as `c{i}_n`")
        aggs.append(f"count(case when `p{i}_bool` then 1 end) as `c{i}_bool`")
        aggs.append(f"count(case when `p{i}_re` then 1 end) as `c{i}_re`")
        aggs.append(f"count(case when `p{i}_long` then 1 end) as `c{i}_long`")
        aggs.append(
            f"min(case when `p{i}_big` then `__pos__` end) as `c{i}_firstbig`"
        )
        aggs.append(
            f"min(case when `p{i}_d` is not null and not `p{i}_re`"
            f" then `__pos__` end) as `c{i}_firstfloat`"
        )
        aggs.append(
            f"min(case when `p{i}_negf` then `__pos__` end) as `c{i}_firstnegf`"
        )
        aggs.append(
            f"min(case when not `p{i}_negf` then `__pos__` end)"
            f" as `c{i}_firstposf`"
        )
        aggs.append(
            f"min(case when (`p{i}_bits` & 1) = 1 then `__pos__` end)"
            f" as `c{i}_firstu64`"
        )
        aggs.append(
            f"min(case when `p{i}_re` and `p{i}_d` < 0 and not `p{i}_long`"
            f" then `__pos__` end) as `c{i}_firstnegovf`"
        )
        aggs.append(f"bit_or(`p{i}_bits`) as `c{i}_bits`")
        aggs.append(f"count(`p{i}_d`) as `c{i}_dbl`")
        aggs.append(f"count(case when `p{i}_ovf` then 1 end) as `c{i}_ovf`")
        aggs.append(
            f"count(case when abs(`p{i}_d`) < 2.2250738585072014E-308D"
            f" and `p{i}_d` != 0.0D then 1 end) as `c{i}_subn`"
        )
        aggs.append(
            f"count(case when `p{i}_d` is not null and not isnan(`p{i}_d`)"
            f" and ((`p{i}_d` % 1.0D) != 0.0D or"
            f" abs(`p{i}_d`) = double('Infinity')) then 1 end)"
            f" as `c{i}_nonint`"
        )
    return base.groupBy(F.spark_partition_id().alias("__pid__")).agg(
        *[F.expr(s) for s in aggs]
    )


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    spark = get_spark("ab_infer_construction")
    spark.sparkContext.setLogLevel("ERROR")
    mask = spark.range(10).selectExpr(
        "id as __pos__",
        *[f"cast(id as string) as __m{i}" for i in range(NCOLS)],
    )
    # warm both
    build_columns(mask)
    build_strings(mask)
    cols_t, strs_t = [], []
    for _ in range(pairs):
        t0 = time.time(); build_columns(mask); cols_t.append(time.time() - t0)
        t0 = time.time(); build_strings(mask); strs_t.append(time.time() - t0)

    def med(xs):
        return sorted(xs)[len(xs) // 2]

    print(f"columns: median {med(cols_t):.3f}  {[round(x,3) for x in cols_t]}")
    print(f"strings: median {med(strs_t):.3f}  {[round(x,3) for x in strs_t]}")

    # value-parity spot check on a quirk-mix frame: both constructions,
    # same single-partition input, identical aggregate rows
    data = [
        ("1", "1.5", "true", "x", "18446744073709551616", "-9223372036854775809",
         " 42 ", "0e309", "1e309", "inf", " inf", "-0.0", "0.000001",
         "9223372036854775807", "nan", "", "abc"),
    ]
    quirk = spark.createDataFrame(
        data, ", ".join(f"__m{i} string" for i in range(NCOLS))
    ).selectExpr("monotonically_increasing_id() as __pos__", "*")
    a = build_columns(quirk).collect()
    b = build_strings(quirk).collect()
    same = sorted(r.asDict().items() for r in a) == sorted(
        r.asDict().items() for r in b
    )
    print("value parity on quirk row:", same)
    if not same:
        da = {k: v for k, v in a[0].asDict().items()}
        db = {k: v for k, v in b[0].asDict().items()}
        for k in da:
            if da[k] != db[k]:
                print("DIFF", k, da[k], db[k])


if __name__ == "__main__":
    main()
