"""Bucketed co-located join: pre-bucketing both fact tables on the join
key removes the per-query shuffle entirely — the pattern for repeated
large-fact joins at 100 TB (SURVEY.md §7 scale posture).

Proof is in the physical plan: with broadcast disabled, the bucketed join
must contain NO Exchange (shuffle) while the unbucketed twin does.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_engine_spark import load_table

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed_wh")
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            load_table(spark, sf_dir, name)
            .write.mode("overwrite")
            .format("parquet")
            .option("path", str(root / name))
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .saveAsTable(f"b_{name}")
        )
    yield
    for name in ("orders", "lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS b_{name}")


def _join(spark, left, right):
    return left.join(
        right, left["o_orderkey"] == right["l_orderkey"]
    ).groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("qty")
    )


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        b = _join(spark, spark.table("b_orders"), spark.table("b_lineitem"))
        plan_b = b._jdf.queryExecution().executedPlan().toString()
        # join itself is shuffle-free: the only Exchange allowed is the
        # one for the final groupBy aggregation
        assert plan_b.count("Exchange hashpartitioning(o_orderkey") == 0
        assert plan_b.count("Exchange hashpartitioning(l_orderkey") == 0

        u = _join(
            spark,
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
        )
        plan_u = u._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan_u  # unbucketed twin must shuffle

        # and the results are identical
        key = lambda r: (r.o_orderpriority,)  # noqa: E731
        got = sorted(((r.o_orderpriority, r.n, round(r.qty, 4)) for r in b.collect()))
        want = sorted(((r.o_orderpriority, r.n, round(r.qty, 4)) for r in u.collect()))
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
