"""Relational surface (categories absent from the reference - SURVEY.md par.2.7).

Registry family module - mechanically split from the monolithic
registry.py (r10 verdict item 4); registration order is preserved by
the import order in registry/__init__.py, so the grading window and
the sweep see an unchanged QUERIES/ORACLES surface."""

from __future__ import annotations

from vector_search_engine_spark.registry._base import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# Relational surface (categories absent from the reference — SURVEY.md §2.7)
# ---------------------------------------------------------------------------


@register("tpch_pricing_summary", oracle=rel_ops.PRICING_SUMMARY_ORACLE)
def tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style scan+agg (decimal-exact sums; see relational.py)."""
    return rel_ops.pricing_summary(load_table(spark, sf_dir, "lineitem"))


@register("tpch_top_unshipped_orders", oracle=rel_ops.TOP_UNSHIPPED_ORACLE)
def tpch_top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style 3-way join + top-k (broadcast dim, shuffled facts)."""
    return rel_ops.top_unshipped_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


@register("tpch_regional_revenue", oracle=rel_ops.REGIONAL_REVENUE_ORACLE)
def tpch_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-table join, revenue by region/nation."""
    return rel_ops.regional_revenue(
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


@register("orders_rollup", oracle=rel_ops.ORDER_PRIORITY_ROLLUP_ORACLE)
def orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over orders."""
    return rel_ops.order_priority_rollup(load_table(spark, sf_dir, "orders"))


@register("top_orders_per_customer", oracle=rel_ops.TOP_ORDERS_PER_CUSTOMER_ORACLE)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group."""
    return rel_ops.top_orders_per_customer(load_table(spark, sf_dir, "orders"))


@register("customers_without_orders", oracle=rel_ops.CUSTOMERS_WITHOUT_ORDERS_ORACLE)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join + agg."""
    return rel_ops.customers_without_orders(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@register("brand_distinct_suppliers", oracle=rel_ops.PART_TYPE_DISTINCT_SUPPLIERS_ORACLE)
def brand_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregation through a broadcast join."""
    return rel_ops.part_type_distinct_suppliers(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register("quantity_quantiles", oracle=rel_ops.QUANTITY_QUANTILES_ORACLE)
def quantity_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (p50/p90/p99) per return flag."""
    return rel_ops.quantity_quantiles(load_table(spark, sf_dir, "lineitem"))


@register("orders_above_customer_avg", oracle=rel_ops.ORDERS_ABOVE_CUSTOMER_AVG_ORACLE)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape, decorrelated as agg + self-join."""
    return rel_ops.orders_above_customer_avg(load_table(spark, sf_dir, "orders"))


@register("sql_revenue_by_nation", oracle=None)
def sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front-end surface: same engine, declared via spark.sql over
    temp views (proves the full ANSI path works, not just the DataFrame
    API).  Oracle: identical SQL text runs on DuckDB (set below)."""
    for t in ("nation", "customer", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(SQL_REVENUE_BY_NATION)


SQL_REVENUE_BY_NATION = """
SELECT n_name,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
           AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

ORACLES["sql_revenue_by_nation"] = SQL_REVENUE_BY_NATION


@register("orders_cube", oracle=rel_ops.ORDER_STATUS_CUBE_ORACLE)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combos in one shuffle)."""
    return rel_ops.order_status_cube(load_table(spark, sf_dir, "orders"))


@register("lineitem_grouping_sets", oracle=rel_ops.LINEITEM_GROUPING_SETS_ORACLE)
def lineitem_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + grouping_id in one shuffle."""
    return rel_ops.lineitem_grouping_sets(load_table(spark, sf_dir, "lineitem"))


@register("brand_price_unpivot", oracle=rel_ops.BRAND_PRICE_UNPIVOT_ORACLE)
def brand_price_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT wide per-brand stats to (brand, metric, price) rows."""
    return rel_ops.brand_price_unpivot(load_table(spark, sf_dir, "part"))


@register("shipdate_set_ops", oracle=rel_ops.SHIPDATE_SET_OPS_ORACLE)
def shipdate_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION (distinct semantics) on part-key sets."""
    return rel_ops.shipdate_set_ops(load_table(spark, sf_dir, "lineitem"))


@register("orderdate_functions", oracle=rel_ops.ORDERDATE_FUNCTIONS_ORACLE)
def orderdate_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date scalar-function surface as a projection."""
    return rel_ops.orderdate_functions(load_table(spark, sf_dir, "orders"))


