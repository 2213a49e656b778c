"""PCA rotation for the prefix-bound serving tier.

Why this exists (SCALING.md finding 11 / 15): the prefix-dimension cut
(``IVFIndex.search_prefix``) lower-bounds full L2 by the distance over
the first d′ dims — provably lossless, but its PRUNING POWER depends on
how much of the corpus's energy those dims carry.  On spectrally flat
data (the synthetic SIFT fixture) the first 16 of 128 dims carry ~12.5%
of the energy and the cut keeps everything (measured survivor fraction
1.0).  An orthogonal, energy-compacting rotation fixes exactly that:
rotate by the PCA eigenbasis and the leading dims carry the spectrum's
mass, so the same lossless bound prunes hard on ANY correlated data —
while rotation preserves L2 (``‖xR − qR‖ = ‖x − q‖``), so the bound
stays a true lower bound of the ORIGINAL distance and survivors get the
exact original-space rescore (hash-identical results).

This is the same rotate-then-truncate idea OPQ applies to PQ codes
(``pq.opq_train``) and the practical form of "matryoshka-fying" an
embedding column after the fact.

Reference anchor: the reference engine has no quantization/rotation
surface at all (`hnsw_index.h` serves raw float32); this module is part
of the north-star serving-tier ladder.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_rotation(
    vectors: DataFrame,
    vec_col: str = "embedding",
    sample_size: int = 65536,
    seed: int = 7,
) -> np.ndarray:
    """Train a full-rank orthogonal PCA rotation on a bounded driver
    sample (same contract as ``pq.pq_train`` / the IVF coarse-quantizer
    sample: ≤ sample_size·dim floats on the driver, deterministic for a
    fixed seed).

    The sample is LAYOUT-INDEPENDENT: rows are ranked by a salted
    murmur3 hash of the vector itself (tie-broken by the vector, so the
    selected multiset is a pure function of the data multiset and the
    seed — never of file/partition layout), and the global top
    ``sample_size`` is taken via ``orderBy(...).limit(...)`` — Spark's
    bounded per-partition-heap ``TakeOrderedAndProject``, no full sort.
    The previous ``.sample(frac).limit(n)`` path made the trained
    rotation depend on partition layout once the corpus exceeded
    ``sample_size``, which narrowed the sidecar byte-identical-rebuild
    contract to unchanged file layouts (ADVICE r11).

    Returns R (d × d, float64, columns = eigenvectors of the sample
    covariance in DESCENDING eigenvalue order) applied as ``x @ R``.
    Deterministic sign convention: each column's largest-|entry|
    component is made positive (eigenvectors are sign-ambiguous;
    rebuilds must be byte-identical for the sidecar carry-forward
    byte-identity contract)."""
    return rotation_from_sample(
        collect_pca_sample(vectors, vec_col, sample_size, seed)
    )


def collect_pca_sample(
    vectors: DataFrame,
    vec_col: str = "embedding",
    sample_size: int = 65536,
    seed: int = 7,
) -> np.ndarray:
    """The bounded, layout-independent, canonically-ordered training
    sample (float64 ndarray) — shared by rotation training and the
    staleness energy recompute so both see the same selection rule."""
    sample = (
        vectors.select(vec_col)
        .orderBy(F.hash(F.lit(int(seed)), F.col(vec_col)), F.col(vec_col))
        .limit(sample_size)
    )
    X = np.array([r[0] for r in sample.collect()], dtype=np.float64)
    if X.ndim != 2 or len(X) == 0:
        raise ValueError("pca_rotation needs a non-empty vector sample")
    # canonical row order before any float reduction: collect() order
    # varies with input partitioning, and fp summation is not
    # commutative in the last ulp — lexsorting the sample makes the
    # rotation a pure function of the sample SET (the property the
    # sidecar carry-forward byte-identity contract rests on; pytest
    # test_prefix_pca_rotation_deterministic caught the gap live)
    return X[np.lexsort(X.T[::-1])]


def rotation_from_sample(X: np.ndarray) -> np.ndarray:
    """Train the sign-pinned eigenbasis from an already-collected sample
    (see ``pca_rotation`` for the contract)."""
    Xc = X - X.mean(axis=0)
    # covariance eigenbasis; eigh is exact for the symmetric d×d matrix
    # (d is the embedding width — tiny)
    w, V = np.linalg.eigh(Xc.T @ Xc)
    R = V[:, np.argsort(w)[::-1]]
    for j in range(R.shape[1]):
        i = int(np.argmax(np.abs(R[:, j])))
        if R[i, j] < 0:
            R[:, j] = -R[:, j]
    return np.ascontiguousarray(R)


def energy_curve(X: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Cumulative fraction of (centered) sample variance carried by the
    first 1..d ROTATED dims — ``curve[dp-1]`` is
    ``explained_prefix_energy(X, R, dp)`` for every dp at once.  This is
    the monitored quantity behind the rotation-staleness diagnostic:
    under corpus drift a carried-forward rotation's curve flattens
    toward the identity's (pruning power decays toward the plain-prefix
    degenerate regime) while correctness is unaffected (any orthogonal
    R keeps the prefix bound lossless)."""
    Xc = X - X.mean(axis=0)
    Z = Xc @ R
    per_dim = (Z * Z).sum(axis=0)
    tot = max(float(per_dim.sum()), 1e-300)
    return np.cumsum(per_dim) / tot


def explained_prefix_energy(X: np.ndarray, R: np.ndarray, dp: int) -> float:
    """Diagnostic: fraction of (centered) sample variance the first
    ``dp`` ROTATED dims carry — the quantity that predicts the prefix
    cut's survivor fraction (1/d′ per dim on flat spectra; ≫ that after
    an energy-compacting rotation on correlated data)."""
    Xc = X - X.mean(axis=0)
    Z = Xc @ R
    tot = float((Z * Z).sum())
    return float((Z[:, :dp] * Z[:, :dp]).sum() / max(tot, 1e-300))
