"""Vector distance/similarity kernels.

Reference semantics: **squared** L2, no sqrt — ordering-equivalent and
cheaper (reference ``src/distance.cpp:6-13`` scalar, ``:15-40`` AVX2/FMA).
The reference ships two physical implementations of one logical function;
so do we:

* a Catalyst **expression** built from SQL higher-order functions
  (``zip_with`` + ``aggregate``) — stays JVM-side, whole-stage-codegen'd,
  usable in any filter/projection and by the DuckDB oracle twin;
* a NumPy **batch kernel** (``functions.vector.l2_sq_matrix``) used by the
  ``mapInPandas`` search path — NumPy's vectorized loops play the role of
  the reference's hand-written AVX2 (SURVEY.md §2.2 F2).

All accumulation is float64 (elements are float32; the cast is exact) so
both implementations and the oracle agree to ~1e-13, far below the 1e-4
rounding the query outputs pin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: Column) -> Column:
    return x.cast("double")


def l2_sq(a: Column, b: Column) -> Column:
    """Squared Euclidean distance between two array<float|double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (_d(x) - _d(y)) * (_d(x) - _d(y))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot(a: Column, b: Column) -> Column:
    """Inner product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either side has zero norm."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def normalize(a: Column) -> Column:
    """L2-normalize an array column (zero vectors pass through unchanged)."""
    n = norm(a)
    return F.when(n == 0.0, a.cast("array<double>")).otherwise(
        F.transform(a, lambda x: _d(x) / n)
    )


# ---------------------------------------------------------------------------
# NumPy batch kernels (the pandas-UDF fast path)
# ---------------------------------------------------------------------------


def l2_sq_matrix(V: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """All-pairs squared L2: V (n,d) x Q (m,d) -> (n,m), float64.

    Uses the GEMM expansion ||v||^2 - 2 v.q + ||q||^2 so the O(n*m*d) work
    is a single BLAS call rather than a broadcasted subtract.
    """
    V = np.asarray(V, dtype=np.float64)
    Q = np.asarray(Q, dtype=np.float64)
    # accumulate in place on the GEMM result: the naive broadcast
    # expression allocates two (n, m) float64 intermediates and was
    # measured memory-bound at ~7× the GEMM cost (50k×256); the in-place
    # form is bit-identical (x − 2p ≡ (−2p) + x in IEEE — addition is
    # commutative, negation/×2 exact), so oracle hashes are unchanged
    d2 = V @ Q.T
    d2 *= -2.0
    d2 += (V * V).sum(axis=1)[:, None]
    d2 += (Q * Q).sum(axis=1)[None, :]
    # GEMM form can go slightly negative for near-identical vectors
    np.maximum(d2, 0.0, out=d2)
    return d2


def cosine_sim_pairs_udf():
    """Row-aligned cosine similarity of two array columns as an
    Arrow-batched pandas UDF — the verify-stage fast path when a join has
    already paired up the vectors (interpreted HOF cosine costs
    ~40 µs/element; this is one GEMM-shaped reduction per batch).
    Matches ``cosine_sim``: 0.0 when either side has zero norm."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pair_cosine(va: pd.Series, vb: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype="float64")
        A = np.array(va.tolist(), dtype=np.float64)
        B = np.array(vb.tolist(), dtype=np.float64)
        denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        safe = np.where(denom == 0.0, 1.0, denom)
        return pd.Series(np.where(denom == 0.0, 0.0, (A * B).sum(axis=1) / safe))

    return pair_cosine


def ip_matrix(V: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """All-pairs inner product: V (n,d) x Q (m,d) -> (n,m), float64."""
    return np.asarray(V, dtype=np.float64) @ np.asarray(Q, dtype=np.float64).T


def cosine_sim_matrix(V: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """All-pairs cosine similarity: V (n,d) x Q (m,d) -> (n,m), float64."""
    V = np.asarray(V, dtype=np.float64)
    Q = np.asarray(Q, dtype=np.float64)
    vn = np.linalg.norm(V, axis=1, keepdims=True)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    vn[vn == 0.0] = 1.0
    qn[qn == 0.0] = 1.0
    return (V / vn) @ (Q / qn).T


def label_centroid_components(
    vectors, group_col: str = "label", vec_col: str = "embedding"
):
    """Per-group vector centroid via a GROUPED-AGG pandas UDF (the one
    Arrow UDF shape the engine didn't exercise elsewhere): mean over the
    group's stacked vectors in one NumPy reduction, exploded to
    (group, dim_idx, component) scalars for oracle hashing."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType

    # explicit GROUPED_AGG: type-hint inference has no spelling for an
    # array-returning grouped aggregate
    @F.pandas_udf("array<double>", PandasUDFType.GROUPED_AGG)
    def centroid(vs):
        return np.stack(vs.to_numpy()).astype(np.float64).mean(axis=0).tolist()

    # a grouped-agg pandas UDF cannot share an agg() with JVM aggregates
    # (INVALID_PANDAS_UDF_PLACEMENT) — two aggs, joined on the tiny key
    cents = vectors.groupBy(group_col).agg(centroid(F.col(vec_col)).alias("c"))
    counts = vectors.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_vectors")
    )
    agg = cents.join(counts, group_col)
    return agg.select(
        group_col,
        "n_vectors",
        F.posexplode("c").alias("dim_idx", "component"),
    ).select(
        group_col,
        "n_vectors",
        F.col("dim_idx").cast("int").alias("dim_idx"),
        F.round("component", 4).alias("component"),
    )
