"""Kernel tests: SQL-expression kernels vs NumPy ground truth
(reference distance semantics: squared L2, ``distance.cpp:6-13``)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_engine_spark.functions.vector import (
    cosine_sim,
    cosine_sim_matrix,
    dot,
    l2_sq,
    l2_sq_matrix,
    norm,
    normalize,
)


@pytest.fixture(scope="module")
def pairs_df(spark):
    rng = np.random.default_rng(42)
    rows = []
    for i in range(50):
        a = rng.normal(0, 1, 16).astype(np.float32)
        b = rng.normal(0, 1, 16).astype(np.float32)
        rows.append((i, a.tolist(), b.tolist()))
    rows.append((50, [0.0] * 16, [1.0] + [0.0] * 15))  # zero vector edge
    return spark.createDataFrame(rows, "id long, a array<float>, b array<float>")


def test_l2_sq_matches_numpy(pairs_df):
    got = {
        r.id: r.d
        for r in pairs_df.select("id", l2_sq(F.col("a"), F.col("b")).alias("d")).collect()
    }
    for r in pairs_df.collect():
        a = np.asarray(r.a, dtype=np.float64)
        b = np.asarray(r.b, dtype=np.float64)
        assert got[r.id] == pytest.approx(((a - b) ** 2).sum(), rel=1e-12)


def test_dot_and_norm(pairs_df):
    rows = pairs_df.select(
        "id",
        dot(F.col("a"), F.col("b")).alias("dp"),
        norm(F.col("a")).alias("na"),
    ).collect()
    ref = {r.id: r for r in pairs_df.collect()}
    for r in rows:
        a = np.asarray(ref[r.id].a, dtype=np.float64)
        b = np.asarray(ref[r.id].b, dtype=np.float64)
        assert r.dp == pytest.approx(float(a @ b), rel=1e-12)
        assert r.na == pytest.approx(float(np.linalg.norm(a)), rel=1e-12)


def test_cosine_zero_norm_guard(pairs_df):
    row = (
        pairs_df.filter(F.col("id") == 50)
        .select(cosine_sim(F.col("a"), F.col("b")).alias("c"))
        .collect()[0]
    )
    assert row.c == 0.0


def test_normalize(pairs_df):
    rows = pairs_df.filter(F.col("id") < 50).select(
        norm(normalize(F.col("a"))).alias("n")
    ).collect()
    for r in rows:
        assert math.isclose(r.n, 1.0, rel_tol=1e-9)


def test_matrix_kernels_match_elementwise():
    rng = np.random.default_rng(7)
    V = rng.normal(0, 1, (40, 8)).astype(np.float32)
    Q = rng.normal(0, 1, (5, 8)).astype(np.float32)
    D = l2_sq_matrix(V, Q)
    C = cosine_sim_matrix(V, Q)
    for i in range(40):
        for j in range(5):
            v = V[i].astype(np.float64)
            q = Q[j].astype(np.float64)
            assert D[i, j] == pytest.approx(((v - q) ** 2).sum(), abs=1e-9)
            assert C[i, j] == pytest.approx(
                float(v @ q) / (np.linalg.norm(v) * np.linalg.norm(q)), abs=1e-12
            )
