"""Relational operator surface (joins, aggregations, windows, rollup,
semi/anti joins) over the TPC-H-ish fixture tables.

The reference has NONE of these (SURVEY.md §2.7) — Spark provides them
natively; these plans exist to pin the engine's relational semantics
against the DuckDB oracle and to exercise Catalyst's join selection
(broadcast for dims, sort-merge for facts) at scale.

Float-parity convention: monetary/metric sums are computed over
``decimal`` casts (exact, order-independent — a double sum is neither)
and only the final value is cast back to double and rounded.  This is
also the right call at 100 TB: a sum that depends on reduction order is
not reproducible across retries/partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _money(c) -> F.Column:
    return F.col(c).cast("decimal(18,2)")


def _metric(c) -> F.Column:
    return F.col(c).cast("decimal(18,6)")


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-style pricing summary report."""
    disc_price = _money("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _money("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _money("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_metric("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_money("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price).cast("double"), 4).alias("sum_disc_price"),
            F.round(F.sum(charge).cast("double"), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


PRICING_SUMMARY_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
           AS sum_disc_price,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE), 4)
           AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def top_unshipped_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q3-style: top-10 revenue among BUILDING-segment orders placed
    before / shipped after a date.  Dims broadcast; fact joins shuffle on key."""
    revenue = F.sum(
        _money("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _money("l_discount"))
    ).cast("double")
    return (
        lineitem.filter(F.col("l_shipdate") > "1997-01-01")
        .join(
            orders.filter(F.col("o_orderdate") < "1997-01-01"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


TOP_UNSHIPPED_ORACLE = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
           AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5-style: revenue by nation where customer and supplier share
    the nation.  5-way join; all dims broadcast, facts shuffle once."""
    revenue = F.sum(
        _money("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _money("l_discount"))
    ).cast("double")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.round(revenue, 4).alias("revenue"), F.count("*").cast("long").alias("n_items"))
    )


REGIONAL_REVENUE_ORACLE = """
SELECT r_name, n_name,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 4)
           AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def order_priority_rollup(orders: DataFrame) -> DataFrame:
    """ROLLUP aggregation (grand total + per-priority subtotals)."""
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(_money("o_totalprice")).cast("double").alias("total_price"),
    )


ORDER_PRIORITY_ROLLUP_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window top-k: each customer's k largest orders."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


TOP_ORDERS_PER_CUSTOMER_ORACLE = """
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice, rn
FROM r WHERE rn <= 3
"""


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti-join: customers with no URGENT orders, counted per nation.
    (The fixture gives every customer at least one order, so the anti-join
    runs against the urgent subset to exercise non-vacuous semantics at
    every scale factor: 18 customers at sf0.001, 203 at sf0.01.)"""
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(
            urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy("c_nationkey")
        .agg(F.count("*").cast("long").alias("n_customers"))
    )


CUSTOMERS_WITHOUT_ORDERS_ORACLE = """
SELECT c_nationkey, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


def part_type_distinct_suppliers(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Distinct aggregation through a join: suppliers per part brand."""
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("n_suppliers"),
            F.countDistinct("l_partkey").cast("long").alias("n_parts"),
            F.count("*").cast("long").alias("n_lineitems"),
        )
    )


PART_TYPE_DISTINCT_SUPPLIERS_ORACLE = """
SELECT p_brand,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def order_status_cube(orders: DataFrame) -> DataFrame:
    """CUBE grouping sets over orders — all 4 grouping combinations of
    (priority, status) in one pass (Spark expands to a single shuffle with
    grouping-id; no reference analog, SURVEY.md §2.7)."""
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(_money("o_totalprice")).cast("double").alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
    )


ORDER_STATUS_CUBE_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       round(avg(o_totalprice), 4) AS avg_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def lineitem_grouping_sets(lineitem: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS — the general form cube/rollup specialize
    (SURVEY.md §2.7: absent from the reference): (flag, status), (flag),
    and grand total in ONE shuffle, distinguished by grouping_id."""
    return lineitem.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.count("*").cast("long").alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.round(
            F.sum(_money("l_extendedprice")).cast("double") / F.count("*"), 4
        ).alias("avg_price"),
    )


LINEITEM_GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(*), 4) AS avg_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def brand_price_unpivot(part: DataFrame) -> DataFrame:
    """UNPIVOT (wide -> long): per-brand price stats melted to
    (brand, metric, price) rows — one narrow shuffle then a zero-shuffle
    unpivot generator, vs the oracle's 3-way UNION ALL re-scan."""
    agg = part.groupBy("p_brand").agg(
        F.round(F.min("p_retailprice"), 2).alias("min_price"),
        F.round(
            F.sum(_money("p_retailprice")).cast("double") / F.count("*"), 4
        ).alias("avg_price"),
        F.round(F.max("p_retailprice"), 2).alias("max_price"),
    )
    return agg.unpivot(
        "p_brand", ["min_price", "avg_price", "max_price"], "metric", "price"
    )


BRAND_PRICE_UNPIVOT_ORACLE = """
WITH s AS (
  SELECT p_brand,
         round(min(p_retailprice), 2) AS min_price,
         round(CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
               / count(*), 4) AS avg_price,
         round(max(p_retailprice), 2) AS max_price
  FROM part GROUP BY p_brand
)
SELECT p_brand, 'min_price' AS metric, min_price AS price FROM s
UNION ALL
SELECT p_brand, 'avg_price', avg_price FROM s
UNION ALL
SELECT p_brand, 'max_price', max_price FROM s
"""


def shipdate_set_ops(lineitem: DataFrame) -> DataFrame:
    """Set operations (INTERSECT / EXCEPT / UNION, distinct semantics) on
    the part-key sets shipped in two adjacent years."""
    y95 = lineitem.filter(F.year("l_shipdate") == 1995).select("l_partkey")
    y96 = lineitem.filter(F.year("l_shipdate") == 1996).select("l_partkey")
    both = y95.intersect(y96).select(F.lit("both_years").alias("op"), "l_partkey")
    # subtract == SQL EXCEPT (distinct semantics); exceptAll is bag except
    only95 = y95.subtract(y96).select(F.lit("only_1995").alias("op"), "l_partkey")
    only96 = y96.subtract(y95).select(F.lit("only_1996").alias("op"), "l_partkey")
    either = y95.union(y96).distinct().select(
        F.lit("either_year").alias("op"), "l_partkey"
    )
    return (
        both.unionByName(only95)
        .unionByName(only96)
        .unionByName(either)
        .groupBy("op")
        .agg(F.count("*").cast("long").alias("n_parts"))
    )


SHIPDATE_SET_OPS_ORACLE = """
WITH y95 AS (SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1995),
y96 AS (SELECT l_partkey FROM lineitem WHERE year(l_shipdate) = 1996),
tagged AS (
  SELECT 'both_years' AS op, l_partkey FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)
  UNION ALL
  SELECT 'only_1995', l_partkey FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)
  UNION ALL
  SELECT 'only_1996', l_partkey FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95)
  UNION ALL
  SELECT 'either_year', l_partkey FROM (SELECT * FROM y95 UNION SELECT * FROM y96)
)
SELECT op, count(*) AS n_parts FROM tagged GROUP BY op
"""


def orderdate_functions(orders: DataFrame) -> DataFrame:
    """String/date scalar-function surface as a projection: date parts,
    truncation, arithmetic, formatting, string ops (SURVEY.md §2.7 — the
    reference has no scalar functions beyond squared L2)."""
    d = F.col("o_orderdate")
    return orders.select(
        "o_orderkey",
        F.year(d).cast("int").alias("yr"),
        F.month(d).cast("int").alias("mo"),
        F.dayofmonth(d).cast("int").alias("dom"),
        F.quarter(d).cast("int").alias("qtr"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_add(d.cast("date"), 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_eoy"),
        F.upper("o_orderstatus").alias("status_u"),
        F.concat_ws("-", F.upper("o_orderpriority"), F.col("o_orderstatus")).alias(
            "prio_tag"
        ),
        F.length("o_orderpriority").cast("int").alias("prio_len"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
    )


ORDERDATE_FUNCTIONS_ORACLE = """
SELECT o_orderkey,
       year(o_orderdate)::INT AS yr,
       month(o_orderdate)::INT AS mo,
       day(o_orderdate)::INT AS dom,
       quarter(o_orderdate)::INT AS qtr,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
       datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31')::BIGINT AS days_to_eoy,
       upper(o_orderstatus) AS status_u,
       upper(o_orderpriority) || '-' || o_orderstatus AS prio_tag,
       len(o_orderpriority)::INT AS prio_len,
       substr(o_orderpriority, 1, 1) AS prio_code
FROM orders
"""


def quantity_quantiles(lineitem: DataFrame) -> DataFrame:
    """Exact percentile aggregation (interpolated) per return flag."""
    q = lambda p: F.round(  # noqa: E731
        F.percentile(F.col("l_quantity"), F.lit(p)), 4
    )
    return lineitem.groupBy("l_returnflag").agg(
        q(0.5).alias("p50"),
        q(0.9).alias("p90"),
        q(0.99).alias("p99"),
        F.round(F.avg("l_quantity"), 4).alias("mean_qty"),
        F.count("*").cast("long").alias("n"),
    )


QUANTITY_QUANTILES_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 4) AS p50,
       round(quantile_cont(l_quantity, 0.9), 4) AS p90,
       round(quantile_cont(l_quantity, 0.99), 4) AS p99,
       round(avg(l_quantity), 4) AS mean_qty,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


def orders_above_customer_avg(orders: DataFrame) -> DataFrame:
    """Correlated-subquery shape: orders priced above their customer's own
    average — decorrelated as an aggregate + self-join (what Catalyst does
    to the subquery form)."""
    avgs = orders.groupBy("o_custkey").agg(
        F.avg("o_totalprice").alias("cust_avg")
    )
    return (
        orders.join(avgs, "o_custkey")
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_above_avg"),
            F.round(F.avg(F.col("o_totalprice") - F.col("cust_avg")), 4).alias(
                "avg_excess"
            ),
        )
    )


ORDERS_ABOVE_CUSTOMER_AVG_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n_above_avg,
       round(avg(o_totalprice - cust_avg), 4) AS avg_excess
FROM (
  SELECT o.*, avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
  FROM orders o
)
WHERE o_totalprice > cust_avg
GROUP BY o_orderpriority
"""


def customer_order_window_zoo(orders: DataFrame) -> DataFrame:
    """The window-function zoo in one pass per customer order history:
    running totals, moving average, lag/lead, rank family, ntile —
    all over a single (partition, order) spec = one shuffle."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wrows = w.rowsBetween(Window.unboundedPreceding, 0)
    wmov = w.rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(_money("o_totalprice")).over(wrows).cast("double"), 2).alias(
            "running_total"
        ),
        F.round(F.avg("o_totalprice").over(wmov), 4).alias("moving_avg3"),
        F.round(F.lag("o_totalprice", 1).over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice", 1).over(w), 2).alias("next_price"),
        F.row_number().over(w).cast("long").alias("order_seq"),
        F.rank()
        .over(Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc()))
        .cast("long")
        .alias("price_rank"),
        F.ntile(4)
        .over(
            # o_orderkey tiebreak: ntile assigns by position, so an
            # order-by with ties is engine-nondeterministic
            Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
        )
        .cast("int")
        .alias("price_quartile"),
    )


CUSTOMER_ORDER_WINDOW_ZOO_ORACLE = """
SELECT o_custkey, o_orderkey,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS running_total,
       round(avg(o_totalprice)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3,
       round(lag(o_totalprice, 1)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
           AS prev_price,
       round(lead(o_totalprice, 1)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2)
           AS next_price,
       row_number()
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS order_seq,
       rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC)
           AS price_rank,
       ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)::INT
           AS price_quartile
FROM orders
"""


def column_profile(df, numeric_cols: tuple[str, ...]):
    """Data-profiling pass — the hygiene step every training-data
    pipeline runs before ingesting a new table: one row per column with
    count / null count / exact distinct / min / max / mean.

    One aggregation pass computes every column's stats (map-side
    partial, no per-column scans), then a constant-width unpivot emits
    the row form.  Exact countDistinct keeps the oracle engine-portable;
    at 100 TB swap in approx_count_distinct and accept the sketch's
    engine-specific estimates (documented trade, like the HLL ops)."""
    aggs = []
    for c in numeric_cols:
        aggs += [
            F.count(F.col(c)).cast("long").alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls"),
            F.countDistinct(F.col(c)).cast("long").alias(f"{c}__dist"),
            F.round(F.min(F.col(c)).cast("double"), 4).alias(f"{c}__min"),
            F.round(F.max(F.col(c)).cast("double"), 4).alias(f"{c}__max"),
            F.round(F.avg(F.col(c)), 4).alias(f"{c}__avg"),
        ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__dist, {c}__min, {c}__max, {c}__avg"
        for c in numeric_cols
    )
    return wide.selectExpr(
        f"stack({len(numeric_cols)}, {stack_expr}) AS "
        "(column_name, n_values, n_nulls, n_distinct, min_value, "
        "max_value, avg_value)"
    )


LINEITEM_PROFILE_ORACLE = """
WITH w AS (
  SELECT
    count(l_quantity)::BIGINT qn, sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::BIGINT qz,
    count(DISTINCT l_quantity)::BIGINT qd, round(CAST(min(l_quantity) AS DOUBLE),4) qmin,
    round(CAST(max(l_quantity) AS DOUBLE),4) qmax, round(avg(l_quantity),4) qavg,
    count(l_extendedprice)::BIGINT en, sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)::BIGINT ez,
    count(DISTINCT l_extendedprice)::BIGINT ed, round(CAST(min(l_extendedprice) AS DOUBLE),4) emin,
    round(CAST(max(l_extendedprice) AS DOUBLE),4) emax, round(avg(l_extendedprice),4) eavg,
    count(l_discount)::BIGINT dn, sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)::BIGINT dz,
    count(DISTINCT l_discount)::BIGINT dd, round(CAST(min(l_discount) AS DOUBLE),4) dmin,
    round(CAST(max(l_discount) AS DOUBLE),4) dmax, round(avg(l_discount),4) davg,
    count(l_tax)::BIGINT tn, sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END)::BIGINT tz,
    count(DISTINCT l_tax)::BIGINT td, round(CAST(min(l_tax) AS DOUBLE),4) tmin,
    round(CAST(max(l_tax) AS DOUBLE),4) tmax, round(avg(l_tax),4) tavg
  FROM lineitem
)
SELECT 'l_quantity' AS column_name, qn AS n_values, qz AS n_nulls, qd AS n_distinct,
       qmin AS min_value, qmax AS max_value, qavg AS avg_value FROM w
UNION ALL
SELECT 'l_extendedprice', en, ez, ed, emin, emax, eavg FROM w
UNION ALL
SELECT 'l_discount', dn, dz, dd, dmin, dmax, davg FROM w
UNION ALL
SELECT 'l_tax', tn, tz, td, tmin, tmax, tavg FROM w
"""
