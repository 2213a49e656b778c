"""Multi-vector (parent/child) retrieval: closest-child parent search and
ColBERT-style MaxSim.

Strategy (SURVEY.md §5 model): every operator is checked against a
from-first-principles NumPy computation on the fixture table — not just
self-consistency — plus structural edge cases (empty query set, single
parent, tie-breaking) and the composed-tier exactness contract
(IVF-composed form at full probe == flat form bit-for-bit).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_engine_spark import load_table
from vector_search_engine_spark.operators import ivf
from vector_search_engine_spark.operators import knn as knn_ops
from vector_search_engine_spark.operators import multivec


@pytest.fixture(scope="module")
def emb_arrays(embeddings):
    rows = embeddings.select("vec_id", "embedding", "label").collect()
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    V = np.array([r.embedding for r in rows], dtype=np.float32).astype(np.float64)
    labels = np.array([r.label for r in rows], dtype=np.int64)
    return ids, V, labels


def _np_parent_closest(ids, V, labels, qids, Q, k=5):
    out = {}
    for qi, qid in enumerate(qids):
        d = ((V - Q[qi]) ** 2).sum(axis=1)
        per_parent = {}
        for p in np.unique(labels):
            per_parent[int(p)] = d[labels == p].min()
        ranked = sorted(per_parent.items(), key=lambda kv: (kv[1], kv[0]))[:k]
        out[int(qid)] = [(p, round(dist, 4)) for p, dist in ranked]
    return out


def test_parent_closest_matches_numpy(spark, embeddings, emb_arrays):
    ids, V, labels, = emb_arrays
    q = knn_ops.make_queries(embeddings)
    qids = ids[ids < 20]
    Q = V[ids < 20]
    expect = _np_parent_closest(ids, V, labels, qids, Q, k=5)
    got = {}
    for r in multivec.parent_closest(embeddings, q, k=5).collect():
        got.setdefault(r.qid, []).append((r.parent, r.dist_sq))
    # collect() order within a qid follows rank because we sort below
    got = {
        qid: [pr for pr in rows]
        for qid, rows in (
            (qid, sorted(rows, key=lambda pr: expect[qid].index(pr)))
            for qid, rows in got.items()
        )
    }
    assert set(got) == set(expect)
    for qid in expect:
        assert sorted(got[qid]) == sorted(expect[qid])


def test_parent_closest_rank_order(spark, embeddings):
    q = knn_ops.make_queries(embeddings)
    df = multivec.parent_closest(embeddings, q, k=5)
    rows = df.filter(F.col("qid") == 0).orderBy("rank").collect()
    dists = [r.dist_sq for r in rows]
    assert dists == sorted(dists)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    # qid 0 IS vector 0, so its own parent has dist 0 at rank 1
    assert rows[0].dist_sq == 0.0


def test_parent_closest_empty_queries(spark, embeddings):
    q = knn_ops.make_queries(embeddings).filter(F.col("qid") < 0)
    assert multivec.parent_closest(embeddings, q, k=5).count() == 0


def test_parent_closest_single_parent(spark):
    vecs = spark.createDataFrame(
        [(i, [float(i), 0.0], 7) for i in range(10)],
        "vec_id long, embedding array<float>, label int",
    )
    q = spark.createDataFrame(
        [(0, [2.2, 0.0])], "qid long, query array<float>"
    )
    rows = multivec.parent_closest(vecs, q, k=5).collect()
    assert len(rows) == 1
    assert rows[0].parent == 7
    # closest child is vec 2 at dist 0.2^2
    assert rows[0].dist_sq == pytest.approx(0.04, abs=1e-4)


def test_ann_ivf_parent_closest_exact_at_full_probe(spark, sf_dir, embeddings):
    index = ivf.build_or_load(spark, sf_dir)
    q = knn_ops.make_queries(embeddings)
    flat = multivec.parent_closest(embeddings, q, k=5)
    composed = multivec.ann_ivf_parent_closest(
        index, q, k=5, nprobe=index.meta["n_centroids"]
    )
    a = sorted(map(tuple, flat.collect()))
    b = sorted(map(tuple, composed.collect()))
    assert a == b


def test_ann_ivf_parent_closest_prunes_partitions(spark, sf_dir, embeddings):
    """nprobe=1 probes one cell per query → the scan must not read every
    centroid partition (the pruning contract of the composed tier)."""
    index = ivf.build_or_load(spark, sf_dir)
    q = knn_ops.make_queries(embeddings).limit(1)
    df = multivec.ann_ivf_parent_closest(index, q, k=5, nprobe=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "centroid_id" in plan  # partition filter is present
    rows = df.collect()
    assert len(rows) <= 5


def _np_maxsim(labels, V, qvec_ids, Q, group=5, k=5):
    qids = np.unique(qvec_ids // group)
    out = {}
    S = V @ Q.T  # (n, m)
    for qid in qids:
        sel = (qvec_ids // group) == qid
        per_parent = {}
        for p in np.unique(labels):
            # sum over this query's subvectors of max over the parent's rows
            sub = S[np.ix_(labels == p, sel)]
            per_parent[int(p)] = sub.max(axis=0).sum()
        ranked = sorted(per_parent.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[int(qid)] = [(p, round(s, 4)) for p, s in ranked]
    return out


def test_maxsim_matches_numpy(spark, embeddings, emb_arrays):
    ids, V, labels = emb_arrays
    mq = multivec.make_multivec_queries(embeddings)
    qvec_ids = ids[ids < 20]
    Q = V[ids < 20]
    expect = _np_maxsim(labels, V, qvec_ids, Q, k=5)
    got = {}
    for r in multivec.maxsim_topk(embeddings, mq, k=5).collect():
        got.setdefault(r.qid, []).append((r.parent, r.maxsim))
    assert set(got) == set(expect)
    for qid in expect:
        assert sorted(got[qid]) == pytest.approx(sorted(expect[qid]), abs=2e-4)


def test_maxsim_rank_is_descending(spark, embeddings):
    mq = multivec.make_multivec_queries(embeddings)
    df = multivec.maxsim_topk(embeddings, mq, k=5)
    for qid in (0, 3):
        rows = df.filter(F.col("qid") == qid).orderBy("rank").collect()
        sims = [r.maxsim for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_maxsim_single_subvector_equals_parent_max_dot(spark, embeddings, emb_arrays):
    """With group=1 the sum over subvectors degenerates: maxsim(parent) =
    max child dot — pin the degenerate case against NumPy."""
    ids, V, labels = emb_arrays
    mq = multivec.make_multivec_queries(embeddings, n=2, group=1)
    out = {
        (r.qid, r.parent): r.maxsim
        for r in multivec.maxsim_topk(embeddings, mq, k=3).collect()
    }
    S = V @ V[ids < 2].T
    for qi in (0, 1):
        per_parent = {
            int(p): S[labels == p, qi].max() for p in np.unique(labels)
        }
        top = sorted(per_parent.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for p, s in top:
            assert out[(qi, p)] == pytest.approx(round(s, 4), abs=2e-4)


def test_maxsim_empty_queries(spark, embeddings):
    mq = multivec.make_multivec_queries(embeddings).filter(F.col("qid") < 0)
    assert multivec.maxsim_topk(embeddings, mq, k=5).count() == 0
