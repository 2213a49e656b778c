"""Skew mitigation: salted equi-join.

AQE's skew-join split handles sort-merge skew automatically (enabled in
session.py), but a pathologically hot key inside a single task still
serializes.  The manual pattern: add a salt in [0, S) to the big side's
key, replicate the small side S× (one row per salt), join on
(key, salt) — the hot key's rows spread across S tasks.

Deterministic salt: ``pmod(xxhash64(row-unique-col), S)`` — reproducible
across retries (a random salt breaks task re-execution idempotency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_cols: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted by a
    deterministic hash of ``salt_cols`` (any columns unique-ish per row).
    Result is identical to ``big.join(small, key, how)`` for ``inner`` and
    ``left`` joins.  Right/full-outer are rejected: an unmatched small-side
    row exists once per replica, so the join would emit it ``num_salts``
    times."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join preserves semantics only for inner/left joins, got {how!r}"
        )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(num_salts))
    )
    replicated_small = small.select(
        "*",
        F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(num_salts)])).alias(
            "_salt"
        ),
    )
    return salted_big.join(replicated_small, [key, "_salt"], how).drop("_salt")
