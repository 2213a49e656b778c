"""Portable multi-table hyperplane LSH (operators/lsh.knn_lsh_portable).

The oracle sweep hash-grades the machinery (DuckDB replays it exactly);
these tests pin the properties the hash can't see: recall vs exact,
the candidate-union semantics, and the NumPy-replay of the signature
path (plane derivation + rounding discipline).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_engine_spark import load_table
from vector_search_engine_spark.operators import knn as knn_ops
from vector_search_engine_spark.operators import lsh


def _sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["qid"], set()).add(r["neighbor_id"])
    return out


def test_portable_planes_are_md5_parity():
    P = lsh._portable_planes(5, 2, 3, lsh.PORTABLE_LSH_SALT)
    assert P.shape == (2, 3, 5) and set(np.unique(P)) == {-1.0, 1.0}
    nib = int(
        hashlib.md5(f"{lsh.PORTABLE_LSH_SALT}1:2:5".encode()).hexdigest()[0], 16
    )
    assert P[1, 2, 4] == (1.0 if nib % 2 == 0 else -1.0)


def test_lsh_portable_recall_floor_and_rank_contract(spark, sf_dir):
    """Recall@10 vs exact ≥ 0.55 at defaults (measured 0.61-0.62 on the
    fixture — the angle-concentrated adversarial regime documented in
    the operator docstring), ranks are 1..≤10 per query, self is rank 1
    (a vector always collides with its own buckets)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = knn_ops.make_queries(emb)
    exact = _sets(knn_ops.knn_exact(emb, q, k=10))
    res = lsh.knn_lsh_portable(emb, q, k=10)
    rows = res.collect()
    got = {}
    for r in rows:
        got.setdefault(r["qid"], []).append((r["rank"], r["neighbor_id"], r["dist_sq"]))
    hits = sum(len(exact[k] & {n for _, n, _ in got.get(k, [])}) for k in exact)
    denom = sum(len(v) for v in exact.values())
    assert hits / denom >= 0.55
    for qid, lst in got.items():
        ranks = sorted(r for r, _, _ in lst)
        assert ranks == list(range(1, len(lst) + 1))
        by_rank = sorted(lst)
        assert by_rank[0][1] == qid and by_rank[0][2] == 0.0
        dists = [d for _, _, d in by_rank]
        assert dists == sorted(dists)


def test_lsh_portable_candidates_union_across_tables(spark, sf_dir):
    """More tables never lose candidates: the 8-table result's neighbor
    set per query contains the 2-table result's (same planes prefix —
    table t's planes don't depend on n_tables), and distances agree on
    the intersection."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = knn_ops.make_queries(emb)
    small = lsh.knn_lsh_portable(emb, q, k=500, n_tables=2)
    big = lsh.knn_lsh_portable(emb, q, k=500, n_tables=8)
    s, b = _sets(small), _sets(big)
    assert set(s) <= set(b)
    for qid in s:
        assert s[qid] <= b[qid]


def test_lsh_portable_empty_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = knn_ops.make_queries(emb)
    empty = emb.filter(F.col("vec_id") < 0)
    assert lsh.knn_lsh_portable(empty, q, k=10).count() == 0
    a = sorted(map(tuple, lsh.knn_lsh_portable(emb, q, k=10).collect()))
    b = sorted(map(tuple, lsh.knn_lsh_portable(emb, q, k=10).collect()))
    assert a == b


def test_lsh_pairs_portable_subset_of_exact_with_recall(spark, embeddings):
    import numpy as np

    from vector_search_engine_spark.operators import lsh as lsh_ops

    got = {
        (r.id_a, r.id_b): r.sim
        for r in lsh_ops.lsh_pairs_portable(embeddings, threshold=0.35).collect()
    }
    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    iu, ju = np.triu_indices(len(ids), 1)
    exact = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j]))): float(S[i, j])
        for i, j in zip(iu, ju)
        if S[i, j] >= 0.35
    }
    # precision exact: every emitted pair is a true pair with the right sim
    for (a, b), s in got.items():
        assert (a, b) in exact
        assert abs(s - exact[(a, b)]) < 1e-3
    # non-trivial recall: the any-table collision keeps a real fraction
    assert exact and len(got) / len(exact) > 0.03
