"""As-of + range join tests (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from vector_search_engine_spark import load_table
from vector_search_engine_spark.operators import temporal


def _ts(s: float):
    return dt.datetime.fromtimestamp(s, dt.timezone.utc).replace(tzinfo=None)


@pytest.fixture(scope="module")
def toy_events(spark):
    rows = [
        # user 1: view@10, view@20, purchase@20 (tie→match), purchase@25
        (1, _ts(10), 1, "view", 1.0, "{}"),
        (2, _ts(20), 1, "view", 2.0, "{}"),
        (3, _ts(20), 1, "purchase", 9.0, "{}"),
        (4, _ts(25), 1, "purchase", 8.0, "{}"),
        # user 2: purchase with no prior view → left-outer null match
        (5, _ts(5), 2, "purchase", 7.0, "{}"),
        (6, _ts(50), 2, "view", 1.5, "{}"),
        # user 2: two views at the SAME ts → dedup keeps max event_id
        (7, _ts(60), 2, "view", 3.0, "{}"),
        (8, _ts(60), 2, "view", 4.0, "{}"),
        (9, _ts(61), 2, "purchase", 6.0, "{}"),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


@pytest.mark.parametrize("method", ["window", "pandas"])
def test_asof_semantics_on_toy(toy_events, method):
    got = {
        r.event_id: r
        for r in temporal.purchase_attribution(toy_events, method=method).collect()
    }
    assert len(got) == 4
    assert got[3].right_event_id == 2  # equal-ts view matches (>= semantics)
    assert got[3].lag_us == 0
    assert got[4].right_event_id == 2 and got[4].lag_us == 5_000_000
    assert got[5].right_event_id is None and got[5].lag_us is None  # no prior view
    assert got[9].right_event_id == 8  # same-ts right dedup → max event_id
    assert got[9].right_value == 4.0


def test_asof_methods_agree_on_fixture(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    w = temporal.purchase_attribution(events, method="window")
    p = temporal.purchase_attribution(events, method="pandas")
    key = ["user_id", "event_id", "ts", "purchase_value", "right_ts",
           "right_event_id", "right_value", "lag_us"]
    assert sorted(map(tuple, w.select(key).collect())) == sorted(
        map(tuple, p.select(key).collect())
    )


def test_range_join_on_toy(spark):
    rows = [
        (1, _ts(0), 1, "click", 0.0, "{}"),
        (2, _ts(899), 1, "purchase", 1.0, "{}"),   # inside window
        (3, _ts(900), 1, "purchase", 1.0, "{}"),   # exactly at horizon → out
        (4, _ts(950), 1, "click", 0.0, "{}"),
        (5, _ts(1000), 1, "purchase", 1.0, "{}"),  # pairs with click 4
        (6, _ts(100), 2, "purchase", 1.0, "{}"),   # other user — never pairs
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = sorted(
        (r.left_event_id, r.right_event_id, r.delta_us)
        for r in temporal.range_join_within(events).collect()
    )
    assert got == [(1, 2, 899_000_000), (4, 5, 50_000_000)]


def test_range_join_matches_theta_join(spark, sf_dir):
    """Bucketed plan == naive theta-join on the real fixture."""
    events = load_table(spark, sf_dir, "events")
    bucketed = temporal.range_join_within(events)
    c = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("l"), F.unix_micros("ts").alias("lu")
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("r"), F.unix_micros("ts").alias("ru")
    )
    naive = c.join(p, "user_id").filter(
        (F.col("ru") >= F.col("lu"))
        & (F.col("ru") < F.col("lu") + temporal.ATTRIBUTION_WINDOW_S * 1_000_000)
    )
    assert sorted(
        (r.left_event_id, r.right_event_id) for r in bucketed.collect()
    ) == sorted((r.l, r.r) for r in naive.collect())
