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


def test_residual_bound_cut_prunes_on_tight_clusters(spark, tmp_path):
    """The lossless cut's regime claim, pinned with numbers: when cluster
    noise is small relative to cluster separation (near-dup / embedding
    geometry), residual (IVFADC) codes make sd ± resid tight and the cut
    must discard most of each probed cell.  (On sigma-75 SIFT noise it
    keeps 100% — SCALING.md finding 8; both behaviors are by design.)"""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    # 64 near-dup groups of 31 members; 8 coarse cells => each cell holds
    # ~8 DISTANT groups, so per-query distances are bimodal (own group
    # ~0.05, other groups ~100) — the gap the bound cut exploits.  One
    # Gaussian blob per cell would concentrate distances and the cut
    # could not (and should not) prune.
    centers = rng.normal(0, 10.0, (64, 32))
    rows = centers[np.repeat(np.arange(64), 31)] + rng.normal(
        0, 0.01, (1984, 32)
    )
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": range(len(rows)),
                "embedding": [r.astype(np.float32).tolist() for r in rows],
            }
        )
    )
    d = str(tmp_path / "tight")
    idx = IVFIndex.build(df, d, n_centroids=8, extra_cols=())
    q = df.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("query")
    ).limit(20)

    from vector_search_engine_spark.operators.pq import pq_bound_cut

    qrows = q.collect()
    qids = np.array([r.qid for r in qrows], dtype=np.int64)
    Q = np.array([r.query for r in qrows], dtype=np.float64)
    pairs = idx.probe_pairs(qids, Q.astype(np.float32), nprobe=1)
    pairs_df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["qid", "centroid_id"]).astype(
            {"qid": "int64", "centroid_id": "int32"}
        )
    )
    codes_dir, books = idx.ensure_pq(m=8)
    codes = spark.read.parquet(codes_dir)
    tagged = codes.join(F.broadcast(pairs_df), "centroid_id").select(
        "qid", "vec_id", "code", "resid", "centroid_id"
    )
    scanned = tagged.count()
    qmap_bc = spark.sparkContext.broadcast(
        {int(qid): Q[i] for i, qid in enumerate(qids)}
    )
    books_bc = spark.sparkContext.broadcast(books)
    cm_bc = spark.sparkContext.broadcast(idx.center_map())
    survivors = pq_bound_cut(
        tagged, qmap_bc, books_bc, 10, "vec_id", center_map_bc=cm_bc
    ).count()
    assert scanned > 0
    # each probed cell holds ~250 vectors; a working cut keeps well under
    # half (loose threshold: the claim is "prunes", not an exact rate)
    assert survivors / scanned < 0.5, (survivors, scanned)
    # and the search built on it stays exact vs the float probe
    fl = idx.search(q, k=10, nprobe=1).orderBy("qid", "rank")
    pz = idx.search_pq(q, k=10, nprobe=1, m=8).orderBy("qid", "rank")
    assert [tuple(r) for r in pz.collect()] == [tuple(r) for r in fl.collect()]


def test_ensure_pq_concurrent_callers_single_build(spark, embeddings, tmp_path):
    """Two callers missing _SUCCESS must not both train/write into the
    same sidecar dir (interleaved writes could publish _SUCCESS over
    mixed part files) — builds serialize behind the module lock and the
    loser reuses the winner's codes."""
    import threading

    from vector_search_engine_spark.operators import pq as pq_mod

    d = str(tmp_path / "index")
    idx = IVFIndex.build(embeddings, d, n_centroids=8, extra_cols=("label",))
    calls: list[int] = []
    real_train = pq_mod.pq_train

    def counting_train(*a, **kw):
        calls.append(1)
        return real_train(*a, **kw)

    pq_mod.pq_train = counting_train
    try:
        out: list = [None] * 3
        errs: list = []

        def run(i):
            try:
                out[i] = idx.ensure_pq(m=M)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        ts = [threading.Thread(target=run, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        assert len(calls) == 1
        dirs = {o[0] for o in out}
        assert len(dirs) == 1
        for o in out:
            assert np.array_equal(o[1], out[0][1])
    finally:
        pq_mod.pq_train = real_train


def test_sidecar_dirs_are_generation_keyed(spark, embeddings, tmp_path):
    """The sidecar dir name must carry the snapshot generation it was
    built from — the EBR retention rule for derived codes hangs off it."""
    import os

    d = str(tmp_path / "index")
    idx = IVFIndex.build(embeddings, d, n_centroids=8, extra_cols=("label",))
    codes_dir, _ = idx.ensure_pq(m=M)
    sq_dir = idx.ensure_sq8()
    sid = str(int(idx._read_manifest()["latest_gen"]))
    assert f"_gen{sid}" in os.path.dirname(codes_dir)
    assert sq_dir.endswith(f"_gen{sid}")


def test_search_pq_with_predicate_equals_filtered_float(spark, embeddings, index):
    """Filtered search at the PQ tier: the predicate must apply BEFORE
    the bound cut (a disqualified vector's small ub could evict a
    legitimate survivor), so the PQ output equals the float filtered
    probe bit-for-bit at every nprobe."""
    import pyspark.sql.functions as F

    q = knn_ops.make_queries(embeddings, n=10)
    pred = F.col("label") < 5
    for nprobe in (2, 8):
        fl = index.search(q, k=10, nprobe=nprobe, predicate=pred).orderBy(
            "qid", "rank"
        )
        pz = index.search_pq(
            q, k=10, nprobe=nprobe, m=M, predicate=pred
        ).orderBy("qid", "rank")
        assert [tuple(r) for r in pz.collect()] == [tuple(r) for r in fl.collect()]
    # predicate composes with exclude_ids (both pre-cut)
    excl = embeddings.filter(F.col("vec_id") < 3).select("vec_id")
    fl = index.search(q, k=10, nprobe=8, predicate=pred, exclude_ids=excl)
    pz = index.search_pq(
        q, k=10, nprobe=8, m=M, predicate=pred, exclude_ids=excl
    )
    assert sorted(map(tuple, pz.collect())) == sorted(map(tuple, fl.collect()))


def test_opq_rotation_orthogonal_and_exact(spark, embeddings):
    """OPQ: R is orthogonal (distance-preserving), and the rotated-space
    scan + lossless cut + exact rescore equals knn_exact bit-for-bit."""
    from vector_search_engine_spark.operators import knn as knn_ops
    from vector_search_engine_spark.operators import pq as pq_ops

    R, books = pq_ops.opq_train(embeddings, m=8)
    assert np.allclose(R.T @ R, np.eye(R.shape[0]), atol=1e-10)
    q = knn_ops.make_queries(embeddings)
    exact = [
        tuple(r)
        for r in knn_ops.knn_exact(embeddings, q, k=10)
        .orderBy("qid", "rank")
        .collect()
    ]
    got = [
        tuple(r)
        for r in pq_ops.knn_pq_adc(
            embeddings, q, k=10, m=8, codebooks=books, rotation=R
        )
        .orderBy("qid", "rank")
        .collect()
    ]
    assert got == exact


def test_opq_reduces_reconstruction_error_on_correlated_data(spark):
    """The point of OPQ: on dimension-correlated data (one random mixing
    matrix applied to an anisotropic source) the learned rotation must
    cut mean reconstruction error vs plain PQ's identity rotation."""
    import pandas as pd

    from vector_search_engine_spark.operators import pq as pq_ops

    rng = np.random.default_rng(5)
    d = 32
    A = rng.normal(0, 1, (d, d))
    scales = np.exp(-np.arange(d) / 4.0)
    X = (rng.normal(0, 1, (4000, d)) * scales) @ A
    df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(4000, dtype=np.int64),
             "embedding": list(X.astype(np.float32))}
        )
    )

    def mean_resid(books, R):
        Xr = X @ R
        m, _, dsub = books.shape
        err = np.zeros(len(X))
        for j in range(m):
            sl = slice(j * dsub, (j + 1) * dsub)
            D = pq_ops.l2_sq_matrix(Xr[:, sl], books[j])
            err += D.min(axis=1)
        return float(np.sqrt(err).mean())

    books_pq = pq_ops.pq_train(df, m=8)
    R, books_opq = pq_ops.opq_train(df, m=8)
    e_pq = mean_resid(books_pq, np.eye(d))
    e_opq = mean_resid(books_opq, R)
    assert e_opq < 0.9 * e_pq, (e_opq, e_pq)


def test_ivf_search_pq_opq_exact_at_full_probe(spark, sf_dir, embeddings):
    """IVFADC-OPQ: rotation learned over residuals, codes scanned in
    rotated space — at full probe the lossless cut + exact rescore make
    the output identical to the float probe (and the plain PQ tier)."""
    from vector_search_engine_spark.operators import ivf as ivf_mod
    from vector_search_engine_spark.operators import knn as knn_ops

    idx = ivf_mod.build_or_load(spark, sf_dir)
    q = knn_ops.make_queries(embeddings)
    nc = idx.meta["n_centroids"]
    want = [
        tuple(r)
        for r in idx.search(q, k=10, nprobe=nc).orderBy("qid", "rank").collect()
    ]
    got = [
        tuple(r)
        for r in idx.search_pq(q, k=10, nprobe=nc, opq=True)
        .orderBy("qid", "rank")
        .collect()
    ]
    assert got == want
    # the sidecar is mode-keyed: opq and plain dirs coexist
    import glob as _glob
    import os as _os

    opq_dirs = _glob.glob(_os.path.join(idx.index_dir, "pq_m*_opq_gen*"))
    assert opq_dirs and _os.path.exists(
        _os.path.join(opq_dirs[0], "rotation.npy")
    )
