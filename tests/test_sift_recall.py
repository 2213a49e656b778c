"""SIFT-shaped end-to-end recall run (reference M1–M3,
``recall_bench.cpp:28-107``): dim-128 vectors round-tripped through the
REAL ``.fvecs``/``.ivecs`` binary format — base + query sets written and
re-scanned via ``sources/fvecs.py`` — then IVF build → probed search →
``recall_at_k`` against the ``.ivecs`` ground truth, exactly the
reference's measurement loop (load_fvecs → build → search → recall@10).

Scale: 100k × 128 base vectors (the reference's SIFT dimensionality; its
bench uses SIFT1M slices).  Clustered data, because recall-at-moderate-
nprobe on an isotropic cloud measures nothing (see
tests/test_ivf.py::test_recall_on_clustered_data_at_small_nprobe).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from vector_search_engine_spark.operators import knn as knn_ops
from vector_search_engine_spark.operators.ivf import IVFIndex
from vector_search_engine_spark.sources import fvecs as fv

N_BASE = 100_000
N_QUERIES = 100
DIM = 128
N_CLUSTERS = 64
K = 10
N_CENTROIDS = 64
NPROBE = 16  # C/4 — the "moderate nprobe" contract


@pytest.fixture(scope="module")
def sift_dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sift_shaped")
    rng = np.random.default_rng(42)
    centers = rng.normal(0.0, 12.0, (N_CLUSTERS, DIM))
    assign = rng.integers(0, N_CLUSTERS, N_BASE)
    base = (centers[assign] + rng.normal(0.0, 1.0, (N_BASE, DIM))).astype(
        np.float32
    )
    q_assign = rng.integers(0, N_CLUSTERS, N_QUERIES)
    queries = (
        centers[q_assign] + rng.normal(0.0, 1.0, (N_QUERIES, DIM))
    ).astype(np.float32)

    # exact ground truth: top-K by (dist, id), the repo-wide tie-break
    gt = np.empty((N_QUERIES, K), dtype=np.int32)
    b64 = base.astype(np.float64)
    sq = (b64 * b64).sum(axis=1)
    for i in range(N_QUERIES):
        q = queries[i].astype(np.float64)
        d = sq - 2.0 * (b64 @ q) + float(q @ q)
        order = np.lexsort((np.arange(N_BASE), d))
        gt[i] = order[:K].astype(np.int32)

    # write through the engine's own binary writers (sharded, positional)
    def to_df(mat, id_col, vec_col, elem):
        py = float if elem == "float" else int
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    id_col: np.arange(len(mat), dtype=np.int64),
                    vec_col: [[py(x) for x in row] for row in mat],
                }
            )
        )
        return df.withColumn(vec_col, F.col(vec_col).cast(f"array<{elem}>"))

    fv.write_fvecs(
        to_df(base, "vec_id", "embedding", "float"), str(root / "base")
    )
    fv.write_fvecs(
        to_df(queries, "vec_id", "embedding", "float"), str(root / "queries")
    )
    fv.write_ivecs(
        to_df(gt, "qid", "neighbor_ids", "int"), str(root / "gt")
    )
    return root


def test_sift_shaped_recall_at_10(spark, sift_dirs, tmp_path):
    base = fv.scan_fvecs(spark, str(sift_dirs / "base"))
    assert base.count() == N_BASE
    index = IVFIndex.build(
        base, str(tmp_path / "sift_index"), n_centroids=N_CENTROIDS
    )
    queries = fv.scan_fvecs(spark, str(sift_dirs / "queries")).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("query")
    )
    results = index.search(queries, k=K, nprobe=NPROBE)
    gt = fv.scan_ivecs(spark, str(sift_dirs / "gt")).select(
        "qid", F.col("neighbor_ids").cast("array<long>").alias("neighbor_ids")
    )
    row = knn_ops.recall_at_k(results, gt, k=K).collect()[0]
    assert row["n_queries"] == N_QUERIES
    # reference contract: recall@10 >= 0.9 at moderate nprobe (C/4)
    assert row["recall_at_k"] >= 0.9, row["recall_at_k"]
    # and full probe is EXACT against the binary-format ground truth
    full = index.search(queries, k=K, nprobe=N_CENTROIDS)
    row_full = knn_ops.recall_at_k(full, gt, k=K).collect()[0]
    assert row_full["recall_at_k"] == 1.0, row_full["recall_at_k"]
