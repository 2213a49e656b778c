"""Smoke + semantics tests for the cube / set-op / date-fn / sliding-window
/ corpus-stats operators (full value parity is oracle-gated in
scripts/compare_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_engine_spark import load_table
from vector_search_engine_spark.operators import dedup, events, relational


def test_cube_has_all_grouping_combos(spark, sf_dir):
    out = relational.order_status_cube(load_table(spark, sf_dir, "orders"))
    rows = out.collect()
    combos = {(r.o_orderpriority is None, r.o_orderstatus is None) for r in rows}
    assert combos == {(False, False), (False, True), (True, False), (True, True)}
    grand = [r for r in rows if r.o_orderpriority is None and r.o_orderstatus is None]
    assert len(grand) == 1
    assert grand[0].n_orders == load_table(spark, sf_dir, "orders").count()


def test_set_ops_partition_the_union(spark, sf_dir):
    got = {
        r.op: r.n_parts
        for r in relational.shipdate_set_ops(
            load_table(spark, sf_dir, "lineitem")
        ).collect()
    }
    assert got["both_years"] + got["only_1995"] + got["only_1996"] == got["either_year"]


def test_sliding_window_double_counts_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = events.sliding_window_stats(ev)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    assert total == 2 * ev.count()  # every event in exactly 2 windows


def test_corpus_dedup_stats_invariants(spark, sf_dir):
    out = dedup.corpus_dedup_stats(load_table(spark, sf_dir, "documents")).collect()
    assert len(out) == 20  # src0..src19
    for r in out:
        assert 0 <= r.n_dup_docs <= r.n_docs
        assert r.n_distinct + r.n_dup_docs == r.n_docs


def test_grouping_sets_levels_are_consistent(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = relational.lineitem_grouping_sets(li).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    # gid bitmask: 0 = (flag,status), 1 = (flag), 3 = grand total
    assert set(by_gid) == {0, 1, 3}
    assert len(by_gid[3]) == 1
    total = li.count()
    assert by_gid[3][0].n_items == total
    assert sum(r.n_items for r in by_gid[1]) == total
    assert sum(r.n_items for r in by_gid[0]) == total
    # the (flag) level re-aggregates the (flag,status) level exactly
    per_flag = {}
    for r in by_gid[0]:
        per_flag[r.l_returnflag] = per_flag.get(r.l_returnflag, 0) + r.n_items
    assert per_flag == {r.l_returnflag: r.n_items for r in by_gid[1]}


def test_unpivot_is_wide_to_long(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    rows = relational.brand_price_unpivot(part).collect()
    n_brands = part.select("p_brand").distinct().count()
    assert len(rows) == 3 * n_brands
    by_brand = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, {})[r.metric] = r.price
    for stats in by_brand.values():
        assert set(stats) == {"min_price", "avg_price", "max_price"}
        assert stats["min_price"] <= stats["avg_price"] <= stats["max_price"]


def test_pivot_row_sums_match_daily_counts(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    out = events.daily_event_type_pivot(ev)
    assert out.columns == ["day"] + events.EVENT_TYPES
    pivot_total = out.select(
        sum(F.col(t) for t in events.EVENT_TYPES).alias("s")
    ).agg(F.sum("s")).collect()[0][0]
    assert pivot_total == ev.count()
