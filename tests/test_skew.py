"""Salted-join equivalence: the skew-mitigation plan returns exactly the
plain join's rows, while spreading each hot key over num_salts tasks."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_engine_spark import load_table
from vector_search_engine_spark.operators.skew import salted_join


def test_salted_join_equals_plain_join(spark, sf_dir):
    # lineitem is the big (skewable) side, orders-derived dim the small side
    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    plain = lineitem.join(dim, "l_orderkey").groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("qty")
    )
    salted = salted_join(
        lineitem, dim, key="l_orderkey", salt_cols=["l_orderkey", "l_linenumber"]
    ).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("qty")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_actually_spreads_hot_key(spark):
    # one key carrying 10k rows: salts must split it into >1 group
    big = spark.range(10_000).select(
        F.lit(7).alias("k"), F.col("id").alias("row_id")
    )
    small = spark.createDataFrame([(7, "hot")], "k long, tag string")
    out = salted_join(big, small, key="k", salt_cols=["row_id"], num_salts=8)
    assert out.count() == 10_000
    salt_spread = (
        big.withColumn("_salt", F.pmod(F.xxhash64("row_id"), F.lit(8)))
        .select("_salt")
        .distinct()
        .count()
    )
    assert salt_spread == 8


def test_salted_join_rejects_outer_joins(spark, sf_dir):
    import pytest

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(orders, customer, "o_custkey", ["o_orderkey"], how="right")
