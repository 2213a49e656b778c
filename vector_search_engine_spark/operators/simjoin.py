"""Similarity threshold joins over embedding columns.

Capability upgrade over the reference (it has no joins — SURVEY.md §2.7);
foundation for embedding-based near-duplicate detection.

Physical strategies, chosen by the caller by data shape:

* ``similarity_pairs`` (default here): one side broadcast as a dense
  NumPy matrix, the other streamed through ``mapInPandas``; each Arrow
  batch does a single GEMM and emits only pairs above threshold.  Right
  when one side fits in executor memory (catalogs up to ~10M x 64 floats
  = 2.5 GB).  Self-join emits ``id_a < id_b`` once.
* LSH blocking (``operators.dedup.embedding_lsh_pairs``): both sides
  huge — bucket by random hyperplane signs, join within buckets, verify
  exactly.  Approximate recall, exact precision.

The naive ``crossJoin`` + SQL-expression cosine is deliberately not used:
at sf0.1 it is ~100x slower than the GEMM path and at 100 TB it is a
full O(N^2) shuffle with per-row lambda evaluation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def similarity_pairs(
    vectors: DataFrame,
    threshold: float,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    max_broadcast_rows: int = 2_000_000,
    allow_lsh_fallback: bool = True,
) -> DataFrame:
    """All pairs (id_a < id_b) with similarity >= threshold (cosine) or
    squared distance <= threshold (l2_sq).  Broadcast-GEMM self-join.

    The broadcast contract is ENFORCED, not assumed: the collect is capped
    at ``max_broadcast_rows + 1`` rows, and when the table exceeds the
    bound the call auto-dispatches to the both-sides-huge tier
    (``operators.dedup.embedding_lsh_pairs``, cosine only — same
    ``(id_a, id_b, sim)`` schema, approximate recall / exact precision)
    instead of OOMing the driver.  The dispatch is a CONTRACT CHANGE —
    exact recall degrades to the LSH probability curve — so it is never
    silent: it emits a ``RuntimeWarning`` naming both tiers, and callers
    that require exactness can pass ``allow_lsh_fallback=False`` to get a
    ``ValueError`` at the boundary instead.  ``l2_sq`` has no LSH tier;
    an oversize l2_sq input raises with guidance rather than collecting
    anyway.
    """
    if metric not in ("cosine", "l2_sq"):
        raise ValueError(metric)
    spark = vectors.sparkSession
    # Bounded probe: never pulls more than the declared broadcast budget
    # into the driver, even when the table is 100 TB.
    rows = (
        vectors.select(id_col, vec_col).limit(max_broadcast_rows + 1).collect()
    )
    if len(rows) > max_broadcast_rows:
        if metric == "cosine" and round_to == 4 and allow_lsh_fallback:
            import warnings

            warnings.warn(
                "similarity_pairs: input exceeds max_broadcast_rows="
                f"{max_broadcast_rows}; dispatching to the approximate-"
                "recall LSH tier (embedding_lsh_pairs). Precision stays "
                "exact (pairs are verified); recall follows the LSH "
                "probability curve. Pass allow_lsh_fallback=False to "
                "raise instead, or raise max_broadcast_rows explicitly.",
                RuntimeWarning,
                stacklevel=2,
            )
            from vector_search_engine_spark.operators.dedup import (
                embedding_lsh_pairs,
            )

            return embedding_lsh_pairs(
                vectors, threshold=threshold, id_col=id_col, vec_col=vec_col
            )
        raise ValueError(
            f"similarity_pairs: input exceeds max_broadcast_rows="
            f"{max_broadcast_rows} and "
            + (
                "allow_lsh_fallback=False forbids the approximate tier"
                if metric == "cosine" and round_to == 4
                else f"metric={metric!r}/round_to={round_to} has no LSH "
                "fallback"
            )
            + "; use metric='cosine' (routes to embedding_lsh_pairs) or "
            "raise max_broadcast_rows explicitly."
        )
    out_schema = "id_a long, id_b long, " + (
        "sim double" if metric == "cosine" else "dist_sq double"
    )
    if not rows:
        return spark.createDataFrame([], out_schema)
    ids_b = np.array([r[0] for r in rows], dtype=np.int64)
    B = np.array([r[1] for r in rows], dtype=np.float64)
    # norms kept separate: sim = dot / (na*nb), dot FIRST — dividing the
    # vectors first perturbs exact-zero dots off the threshold boundary
    # (the oracle computes dot-then-divide; arithmetic order is contract)
    nb = np.linalg.norm(B, axis=1)
    bc = spark.sparkContext.broadcast((ids_b, B, nb))
    val_col = "sim" if metric == "cosine" else "dist_sq"

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b_, B_, nb_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_a = pdf[id_col].to_numpy(dtype=np.int64)
            A = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if metric == "cosine":
                na = np.linalg.norm(A, axis=1)
                denom = na[:, None] * nb_[None, :]
                denom[denom == 0.0] = 1.0  # zero-norm pair -> sim 0 (dot is 0)
                S = (A @ B_.T) / denom
                ii, jj = np.nonzero(
                    (S >= threshold) & (ids_a[:, None] < ids_b_[None, :])
                )
            else:
                S = (
                    (A * A).sum(axis=1)[:, None]
                    - 2.0 * (A @ B_.T)
                    + (B_ * B_).sum(axis=1)[None, :]
                )
                np.maximum(S, 0.0, out=S)
                ii, jj = np.nonzero(
                    (S <= threshold) & (ids_a[:, None] < ids_b_[None, :])
                )
            yield pd.DataFrame(
                {
                    "id_a": ids_a[ii],
                    "id_b": ids_b_[jj],
                    val_col: S[ii, jj],
                }
            )

    out = vectors.select(id_col, vec_col).mapInPandas(block, schema=out_schema)
    return out.select("id_a", "id_b", F.round(F.col(val_col), round_to).alias(val_col))
