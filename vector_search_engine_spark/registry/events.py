"""Event-time / semi-structured surface (events table).

Registry family module - mechanically split from the monolithic
registry.py (r10 verdict item 4); registration order is preserved by
the import order in registry/__init__.py, so the grading window and
the sweep see an unchanged QUERIES/ORACLES surface."""

from __future__ import annotations

from vector_search_engine_spark.registry._base import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# Event-time / semi-structured surface (events table)
# ---------------------------------------------------------------------------


@register("events_hourly_stats", oracle=ev_ops.HOURLY_EVENT_STATS_ORACLE)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time window aggregation."""
    return ev_ops.hourly_event_stats(load_table(spark, sf_dir, "events"))


@register("events_sessionize", oracle=ev_ops.SESSIONIZE_ORACLE)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min inactivity)."""
    return ev_ops.sessionize(load_table(spark, sf_dir, "events"))


@register("events_json_stats", oracle=ev_ops.JSON_PROPS_STATS_ORACLE)
def events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the props payload column."""
    return ev_ops.json_props_stats(load_table(spark, sf_dir, "events"))


@register("events_cohort_retention", oracle=ev_ops.USER_COHORT_RETENTION_ORACLE)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle (first-seen day × day offset)."""
    return ev_ops.user_cohort_retention(load_table(spark, sf_dir, "events"))


@register("events_hourly_gapfill", oracle=ev_ops.HOURLY_GAPFILL_ORACLE)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly grid with zero-filled gaps (time_bucket_gapfill)."""
    return ev_ops.hourly_gapfill(load_table(spark, sf_dir, "events"))


@register("events_daily_pivot", oracle=ev_ops.DAILY_EVENT_TYPE_PIVOT_ORACLE)
def events_daily_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational PIVOT: one column per event type, one row per day."""
    return ev_ops.daily_event_type_pivot(load_table(spark, sf_dir, "events"))


@register("events_sliding_window", oracle=ev_ops.SLIDING_WINDOW_STATS_ORACLE)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (1 h wide, every 30 min)."""
    return ev_ops.sliding_window_stats(load_table(spark, sf_dir, "events"))


@register("events_asof_attribution", oracle=None)
def events_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (pure-Catalyst union+window strategy): each purchase
    attributed to the user's latest prior view.  Oracle: DuckDB native
    ASOF LEFT JOIN (set below after import)."""
    from vector_search_engine_spark.operators import temporal

    return temporal.purchase_attribution(
        load_table(spark, sf_dir, "events"), method="window"
    )


@register("events_asof_attribution_pandas", oracle=None)
def events_asof_attribution_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics through the applyInPandas merge_asof strategy
    (the escape-hatch shape for tolerance/nearest variants)."""
    from vector_search_engine_spark.operators import temporal

    return temporal.purchase_attribution(
        load_table(spark, sf_dir, "events"), method="pandas"
    )


@register("events_range_join", oracle=None)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded time-range join: click→purchase pairs within 15 min via
    time-bucketed equi-join (fan-out ≤ 2, no per-key cartesian)."""
    from vector_search_engine_spark.operators import temporal

    return temporal.range_join_within(load_table(spark, sf_dir, "events"))


def _set_temporal_oracles() -> None:
    from vector_search_engine_spark.operators import temporal

    ORACLES["events_asof_attribution"] = temporal.PURCHASE_ATTRIBUTION_ORACLE
    ORACLES["events_asof_attribution_pandas"] = temporal.PURCHASE_ATTRIBUTION_ORACLE
    ORACLES["events_range_join"] = temporal.CLICK_PURCHASE_RANGE_ORACLE


_set_temporal_oracles()


@register("events_user_funnel", oracle=ev_ops.USER_FUNNEL_PIVOT_ORACLE)
def events_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional pivot per user, top-50 most active."""
    return ev_ops.user_funnel_pivot(load_table(spark, sf_dir, "events"))


