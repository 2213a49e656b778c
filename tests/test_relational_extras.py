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
