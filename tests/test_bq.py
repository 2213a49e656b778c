"""Binary-quantization tier: packed-code integrity, Hamming kernel, and
the recall/exact-rescore contract of the two-stage search."""

from __future__ import annotations

import numpy as np
import pytest

from vector_search_engine_spark.operators import bq as bq_ops
from vector_search_engine_spark.operators import knn as knn_ops


def test_bq_encode_roundtrip_bits(spark, embeddings):
    rows = bq_ops.bq_encode(embeddings).collect()
    orig = {
        r.vec_id: np.array(r.embedding, dtype=np.float32)
        for r in embeddings.collect()
    }
    assert len(rows) == len(orig)
    for r in rows[:50]:
        v = orig[r.vec_id]
        assert r.dim == len(v)
        bits = np.unpackbits(
            np.frombuffer(r.code, dtype=np.uint8)
        )[: len(v)]
        assert (bits == (v > 0.0)).all()


def test_hamming_pairs_matches_numpy():
    rng = np.random.default_rng(3)
    A = rng.integers(0, 256, (20, 8), dtype=np.uint8)
    B = rng.integers(0, 256, (15, 8), dtype=np.uint8)
    got = bq_ops.hamming_pairs(A, B)
    bits_a = np.unpackbits(A, axis=1)
    bits_b = np.unpackbits(B, axis=1)
    want = (bits_a[:, None, :] != bits_b[None, :, :]).sum(axis=2)
    assert (got == want).all()


def test_bq_rescore_reports_true_distances_and_recall(spark, embeddings):
    """Returned rows always carry the exact float distance (the rescore
    contract); recall@10 at C=16k is gated at the measured-minus-margin
    level for the isotropic fixture (BQ's worst-case geometry — the
    sign code's recall is a measured property, not a bound)."""
    q = knn_ops.make_queries(embeddings)
    exact = {
        (r.qid, r.neighbor_id): r.dist_sq
        for r in knn_ops.knn_exact(embeddings, q, k=10).collect()
    }
    got = bq_ops.knn_bq_rescore(
        embeddings, q, k=10, candidates_per_partition=160
    ).collect()
    all_dists = {
        (r.qid, r.neighbor_id): r.dist_sq
        for r in knn_ops.knn_exact(embeddings, q, k=500).collect()
    }
    hits = 0
    for r in got:
        # every reported distance is the true exact distance
        assert all_dists[(r.qid, r.neighbor_id)] == r.dist_sq
        if (r.qid, r.neighbor_id) in exact:
            hits += 1
    assert hits / len(exact) >= 0.85
