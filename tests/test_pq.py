"""Product-quantization tests: the ADC bound cut must be provably lossless
(bit-identical to the exact/float paths at every nprobe), codes must be
m-byte-packed, and the stored residual must equal the true reconstruction
error (the constant the triangle-inequality cut relies on)."""

from __future__ import annotations

import numpy as np
import pytest

from vector_search_engine_spark.operators import knn as knn_ops
from vector_search_engine_spark.operators import pq
from vector_search_engine_spark.operators.ivf import IVFIndex

M = 8


@pytest.fixture(scope="module")
def index(spark, embeddings, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ivf_pq") / "index")
    return IVFIndex.build(embeddings, d, n_centroids=8, extra_cols=("label",))


@pytest.fixture(scope="module")
def codebooks(embeddings):
    return pq.pq_train(embeddings, m=M)


def test_codes_are_m_bytes(spark, embeddings, codebooks):
    codes = pq.pq_encode(embeddings, codebooks)
    row = codes.first()
    assert len(bytes(row.code)) == M  # 32x under float32 at dim 64
    assert row.resid >= 0.0


def test_resid_is_reconstruction_error(spark, embeddings, codebooks):
    """resid must equal ‖x − c(x)‖ exactly (float32 storage slop aside):
    decode each vector's codeword from the codebooks and re-measure."""
    rows = pq.pq_encode(embeddings, codebooks).collect()
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in embeddings.select("vec_id", "embedding").collect()
    }
    m, _, dsub = codebooks.shape
    for r in rows[:100]:
        code = np.frombuffer(bytes(r.code), dtype=np.uint8)
        recon = np.concatenate([codebooks[j, code[j]] for j in range(m)])
        true = float(np.linalg.norm(vecs[r.vec_id] - recon))
        assert abs(true - float(r.resid)) <= 1e-5 * (1.0 + true)


def test_train_deterministic_and_rectangular(embeddings):
    b1 = pq.pq_train(embeddings, m=M, seed=7)
    b2 = pq.pq_train(embeddings, m=M, seed=7)
    assert b1.shape == b2.shape
    assert np.array_equal(b1, b2)
    assert b1.shape[0] == M
    assert b1.shape[1] <= 256


def test_train_collapses_on_degenerate_input(spark):
    """Fewer distinct subvectors than ksub: the codebook shrinks to the
    distinct rows (padded rows are +inf and can never win an argmin) and
    encoding round-trips with zero residual."""
    import pandas as pd

    base = [[float(i % 4)] * 8 for i in range(64)]
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(64), "embedding": base})
    )
    books = pq.pq_train(df, m=2, vec_col="embedding")
    assert books.shape[1] == 4  # 4 distinct subvectors per subspace
    rows = pq.pq_encode(df, books).collect()
    assert all(r.resid == 0.0 for r in rows)


def test_flat_pq_equals_exact(spark, embeddings):
    q = knn_ops.make_queries(embeddings, n=20)
    exact = knn_ops.knn_exact(embeddings, q, k=10).orderBy("qid", "rank")
    got = pq.knn_pq_adc(embeddings, q, k=10, m=M).orderBy("qid", "rank")
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in exact.collect()]


def test_search_pq_identical_to_search_at_any_nprobe(spark, embeddings, index):
    """The bound cut keeps a provable superset of the true top-k, so the
    PQ probe must match the float probe bit-for-bit at the SAME nprobe."""
    q = knn_ops.make_queries(embeddings, n=10)
    for nprobe in (2, 8):
        fl = index.search(q, k=10, nprobe=nprobe).orderBy("qid", "rank")
        pz = index.search_pq(q, k=10, nprobe=nprobe, m=M).orderBy("qid", "rank")
        assert [tuple(r) for r in pz.collect()] == [tuple(r) for r in fl.collect()]


def test_ensure_pq_idempotent_and_rebalance_invalidates(spark, embeddings, index):
    import os

    d1, b1 = index.ensure_pq(m=M)
    mtime = os.path.getmtime(os.path.join(d1, "_SUCCESS"))
    d2, b2 = index.ensure_pq(m=M)
    assert d1 == d2 and np.array_equal(b1, b2)
    assert os.path.getmtime(os.path.join(d2, "_SUCCESS")) == mtime  # no rewrite


def test_search_pq_topc_mode_recall_and_exact_distances(spark, embeddings, index):
    """Top-C ADC mode: approximate recall (gated), but every returned row
    carries the EXACT re-scored distance."""
    q = knn_ops.make_queries(embeddings, n=10)
    exact = {
        (r.qid, r.neighbor_id): r.dist_sq
        for r in index.search(q, k=10, nprobe=8).collect()
    }
    got = {
        (r.qid, r.neighbor_id): r.dist_sq
        for r in index.search_pq(
            q, k=10, nprobe=8, m=M, candidates_per_partition=40
        ).collect()
    }
    recall = len(set(got) & set(exact)) / len(exact)
    assert recall >= 0.95
    for key in set(got) & set(exact):
        assert got[key] == exact[key]


def test_pq_codes_scan_partition_pruned(spark, embeddings, index):
    """The PQ sidecar is partitioned by centroid_id like the float cells;
    probing must prune its scan the same way (PartitionFilters in the
    executed plan), or the 32x scan-byte cut evaporates at 100 TB."""
    import pyspark.sql.functions as F

    codes_dir, _ = index.ensure_pq(m=M)
    probed = spark.read.parquet(codes_dir).filter(
        F.col("centroid_id").isin([0, 1])
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan


def test_train_rejects_indivisible_dim(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [1, 2], "embedding": [[1.0] * 10, [2.0] * 10]})
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_train(df, m=3, vec_col="embedding")


def test_ragged_codebooks_encode_without_nan(spark):
    """One constant subspace (1 distinct subvector) + one rich subspace
    (many): the rectangular-padding rows must never be selected by the
    encoder argmin nor poison distances with inf/NaN (regression: +inf
    padding produced NaN GEMM columns and argmin returned their index)."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)
    vecs = np.hstack(
        [np.ones((300, 4)), rng.normal(0, 1, (300, 4))]
    )
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(300), "embedding": [v.tolist() for v in vecs]}
        )
    )
    books = pq.pq_train(df, m=2, ksub=16, vec_col="embedding")
    assert books.shape[0] == 2 and books.shape[1] == 16  # ragged: book0 has 1 real row
    rows = pq.pq_encode(df, books).collect()
    codes = np.stack(
        [np.frombuffer(bytes(r.code), dtype=np.uint8) for r in rows]
    )
    assert (codes[:, 0] == 0).all()  # constant subspace -> the single real row
    assert np.isfinite([r.resid for r in rows]).all()
    # search end-to-end stays exact
    q = df.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("query")).limit(5)
    from vector_search_engine_spark.operators import knn as knn_ops

    exact = [tuple(r) for r in knn_ops.knn_exact(df, q, k=5).orderBy("qid", "rank").collect()]
    got = [
        tuple(r)
        for r in pq.knn_pq_adc(df, q, k=5, codebooks=books).orderBy("qid", "rank").collect()
    ]
    assert got == exact
