"""Temporal joins Spark lacks as built-ins: as-of join and bounded
time-range join (SURVEY.md §2.7 — the reference has no join surface at
all; these are first-class for event/feature pipelines).

As-of join — two physical strategies, one semantics:

* ``method='window'`` (default): tag left/right rows, union, one shuffle
  on the key, then ``last(right_cols, ignorenulls=True)`` over
  ``(ts, is_left)``-ordered rows — entirely JVM/whole-stage-codegen, no
  Python.  The sort order puts a right row with equal ts *before* the
  left row, giving inclusive ``l.ts >= r.ts`` match semantics.
* ``method='pandas'``: per-key ``applyInPandas`` running
  ``pd.merge_asof`` — the escape hatch shape for semantics the window
  trick can't express (tolerance, nearest-direction).

Both match DuckDB's native ``ASOF LEFT JOIN`` oracle.  Right rows are
pre-deduplicated to one per (key, ts) via ``max_by`` (oracle:
``arg_max``), making tie-breaks deterministic on both sides.

Range join: bounded-interval pairing (click → purchase within N seconds).
The scalable plan avoids the per-key cartesian of a raw inequality join by
bucketing time into window-sized buckets and exploding the left side into
(bucket, bucket+1): join fan-out is bounded at 2× and the equi-join keys
``(user_id, bucket)`` shuffle-partition evenly; the exact range predicate
filters after the equi-join.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW_S = 900  # click → purchase attribution horizon


def _dedup_right(right: DataFrame, key: str, ts: str) -> DataFrame:
    """One row per (key, ts): keep the max-event_id row (deterministic)."""
    return right.groupBy(key, ts).agg(
        F.max("event_id").alias("right_event_id"),
        F.max_by("value", "event_id").alias("right_value"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    method: str = "window",
) -> DataFrame:
    """For each left row, the latest right row with ``r.ts <= l.ts`` on the
    same key (left-outer).  Output: left columns + right_ts/right_event_id/
    right_value (+ lag_us)."""
    r = _dedup_right(right, key, ts)
    if method == "window":
        rs = r.select(
            F.col(key),
            F.col(ts),
            F.lit(0).alias("is_left"),
            F.struct(
                F.col(ts).alias("right_ts"), "right_event_id", "right_value"
            ).alias("_r"),
            F.lit(None).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
        )
        ls = left.select(
            F.col(key),
            F.col(ts),
            F.lit(1).alias("is_left"),
            F.lit(None)
            .cast("struct<right_ts:timestamp,right_event_id:long,right_value:double>")
            .alias("_r"),
            "event_id",
            "value",
        )
        w = (
            Window.partitionBy(key)
            .orderBy(ts, "is_left")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = (
            rs.unionByName(ls)
            .withColumn("_match", F.last("_r", ignorenulls=True).over(w))
            .filter(F.col("is_left") == 1)
        )
        out = carried
    elif method == "pandas":
        lcols = [key, ts, "event_id", "value"]

        def merge(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in pdfs:
                lp = (
                    pdf[pdf["_side"] == 1][lcols]
                    .sort_values([ts, "event_id"])
                    .reset_index(drop=True)
                )
                rp = (
                    pdf[pdf["_side"] == 0][
                        [key, ts, "right_event_id", "right_value"]
                    ]
                    .rename(columns={ts: "right_ts"})
                    .sort_values("right_ts")
                    .reset_index(drop=True)
                )
                if len(lp) == 0:
                    continue
                m = pd.merge_asof(
                    lp,
                    rp.drop(columns=[key]),
                    left_on=ts,
                    right_on="right_ts",
                    direction="backward",
                )
                m["_match"] = m.apply(
                    lambda x: None
                    if pd.isna(x["right_ts"])
                    else {
                        "right_ts": x["right_ts"],
                        "right_event_id": int(x["right_event_id"]),
                        "right_value": float(x["right_value"]),
                    },
                    axis=1,
                )
                yield m[lcols + ["_match"]]

        tagged = left.select(
            *lcols,
            F.lit(1).alias("_side"),
            F.lit(None).cast("long").alias("right_event_id"),
            F.lit(None).cast("double").alias("right_value"),
        ).unionByName(
            r.select(
                key,
                ts,
                F.lit(None).cast("long").alias("event_id"),
                F.lit(None).cast("double").alias("value"),
                F.lit(0).alias("_side"),
                "right_event_id",
                "right_value",
            )
        )
        out = tagged.groupBy(key).applyInPandas(
            merge,
            schema=(
                f"{key} long, {ts} timestamp, event_id long, value double, "
                "_match struct<right_ts:timestamp,right_event_id:long,"
                "right_value:double>"
            ),
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    return out.select(
        key,
        "event_id",
        ts,
        "value",
        F.col("_match.right_ts").alias("right_ts"),
        F.col("_match.right_event_id").alias("right_event_id"),
        F.col("_match.right_value").alias("right_value"),
        F.when(
            F.col("_match").isNotNull(),
            F.unix_micros(F.col(ts)) - F.unix_micros(F.col("_match.right_ts")),
        )
        .cast("long")
        .alias("lag_us"),
    )


def purchase_attribution(events: DataFrame, method: str = "window") -> DataFrame:
    """Each purchase attributed to the user's latest prior (or same-instant)
    view — the canonical as-of workload."""
    return asof_join(
        events.filter(F.col("event_type") == "purchase"),
        events.filter(F.col("event_type") == "view"),
        method=method,
    ).withColumnRenamed("value", "purchase_value")


PURCHASE_ATTRIBUTION_ORACLE = """
WITH v AS (
  SELECT user_id, ts,
         max(event_id) AS right_event_id,
         arg_max(value, event_id) AS right_value
  FROM events WHERE event_type = 'view'
  GROUP BY user_id, ts
),
p AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT p.user_id, p.event_id, p.ts, p.value AS purchase_value,
       v.ts AS right_ts, v.right_event_id, v.right_value,
       CASE WHEN v.ts IS NULL THEN NULL
            ELSE epoch_us(p.ts) - epoch_us(v.ts) END AS lag_us
FROM p ASOF LEFT JOIN v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def range_join_within(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    window_s: int = ATTRIBUTION_WINDOW_S,
) -> DataFrame:
    """All (left, right) same-user pairs with
    ``l.ts <= r.ts < l.ts + window_s`` — via time-bucketed equi-join
    (fan-out bounded at 2 buckets per left row), not a raw theta-join."""
    lw = F.unix_micros("ts")
    bucket_us = window_s * 1_000_000
    lefts = (
        events.filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("left_event_id"),
            lw.alias("left_us"),
        )
        .withColumn(
            "bucket",
            F.explode(
                F.array(
                    (F.col("left_us") / bucket_us).cast("long"),
                    (F.col("left_us") / bucket_us).cast("long") + 1,
                )
            ),
        )
    )
    rights = events.filter(F.col("event_type") == right_type).select(
        F.col("user_id"),
        F.col("event_id").alias("right_event_id"),
        F.unix_micros("ts").alias("right_us"),
        (F.unix_micros("ts") / bucket_us).cast("long").alias("bucket"),
    )
    return (
        lefts.join(rights, ["user_id", "bucket"])
        .filter(
            (F.col("right_us") >= F.col("left_us"))
            & (F.col("right_us") < F.col("left_us") + bucket_us)
        )
        .select(
            "user_id",
            "left_event_id",
            "right_event_id",
            (F.col("right_us") - F.col("left_us")).alias("delta_us"),
        )
        # no dedup needed: a right row lives in exactly one bucket, so each
        # qualifying pair joins exactly once — no extra shuffle
    )


CLICK_PURCHASE_RANGE_ORACLE = f"""
SELECT c.user_id,
       c.event_id AS left_event_id,
       p.event_id AS right_event_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND p.ts >= c.ts
 AND epoch_us(p.ts) < epoch_us(c.ts) + {ATTRIBUTION_WINDOW_S} * 1000000
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
"""
