"""Per-cell HNSW graph tier tests (operators/hnsw.py + IVFIndex.ensure_graph
/ search_graph): the reference's actual Q2/Q3 algorithm
(``hnsw_index.h:223-262``), distributed as per-cell accelerator sidecars.

Gates, in the order SURVEY.md §5 models them:
  * algorithm-level (NumPy, no Spark): deterministic levels, level-0
    connectivity-by-construction, exhaustive-beam == brute force;
  * engine-level: full probe + unbounded ef is hash-identical to exact kNN
    (the oracle's construction), finite-ef recall, filtered/excluded
    composition, sidecar generation keying + GC, streaming tier="graph".
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_engine_spark.operators import hnsw
from vector_search_engine_spark.operators import knn as knn_ops
from vector_search_engine_spark.operators.ivf import IVFIndex


# ---------------------------------------------------------------------------
# algorithm level (pure NumPy)
# ---------------------------------------------------------------------------


def _random_cell(n: int, dim: int = 8, seed: int = 7):
    rng = np.random.default_rng(seed)
    ids = np.arange(100, 100 + n, dtype=np.int64)
    V = rng.normal(size=(n, dim)).astype(np.float32)
    return ids, V


def test_det_level_is_deterministic_and_distributed():
    """md5-derived levels: reproducible across calls, and the level
    distribution is geometric-ish (most nodes at 0, a few above)."""
    mult = 1.0 / np.log(16)
    levels = [hnsw.det_level(i, mult) for i in range(2000)]
    assert levels == [hnsw.det_level(i, mult) for i in range(2000)]
    assert levels.count(0) > 1500  # P(level=0) = 1 - 1/M = 15/16
    assert max(levels) >= 1


def test_level0_graph_is_connected():
    """Every insert links bidirectionally to >= 1 existing node and links
    are never pruned, so level 0 is connected by induction — the premise
    of the exhaustive-beam exactness bound."""
    ids, V = _random_cell(300)
    levels, layers = hnsw.build_cell_graph(ids, V)
    n = len(ids)
    seen = {0}
    frontier = [0]
    while frontier:
        nxt = []
        for c in frontier:
            for nb in layers[0][c]:
                if nb not in seen:
                    seen.add(nb)
                    nxt.append(nb)
        frontier = nxt
    assert len(seen) == n


def test_exhaustive_beam_equals_brute_force():
    """ef >= |cell| makes the beam visit every node (it can never
    early-terminate on a full result heap), so the walk degenerates to
    exhaustive scan through the graph code path."""
    ids, V = _random_cell(200, seed=11)
    levels, layers = hnsw.build_cell_graph(ids, V)
    lv = np.array(levels, dtype=np.int64)
    V64 = V.astype(np.float64)
    rng = np.random.default_rng(3)
    for _ in range(5):
        q = rng.normal(size=V.shape[1])
        got = hnsw.search_cell_graph(ids, V64, lv, layers, q, ef=len(ids))
        assert len(got) == len(ids)
        d = ((V64 - q) ** 2).sum(axis=1)
        want = sorted(zip(d, range(len(ids))))
        got_idx = [i for _, i in got]
        assert got_idx == [i for _, i in want]


def test_build_is_rebuild_deterministic():
    """Same ids + vectors → byte-identical graph (md5 levels, id-ascending
    inserts) — what generation-keyed sidecar rebuilds require."""
    ids, V = _random_cell(150, seed=5)
    a = hnsw.build_cell_graph(ids, V)
    b = hnsw.build_cell_graph(ids, V)
    assert a[0] == b[0]
    assert a[1] == b[1]


def test_graph_rows_roundtrip():
    """graph_rows → layers_from_rows reconstructs the exact adjacency."""
    ids, V = _random_cell(80, seed=13)
    levels, layers = hnsw.build_cell_graph(ids, V)
    rows = hnsw.graph_rows(0, ids, levels, layers)
    nbrs_col = [r[3] for r in rows]
    lv = np.array([r[2] for r in rows], dtype=np.int64)
    rebuilt = hnsw.layers_from_rows(ids, lv, nbrs_col)
    for l in range(len(layers)):
        for i in range(len(ids)):
            a, b = layers[l][i], rebuilt[l][i]
            if a is None:
                assert b is None
            else:
                assert b is not None and list(a) == list(b)


# ---------------------------------------------------------------------------
# engine level (Spark)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def index(spark, embeddings, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hnsw") / "index")
    return IVFIndex.build(embeddings, d, n_centroids=8, extra_cols=("label",))


def test_graph_full_probe_unbounded_ef_equals_exact(spark, embeddings, index):
    """The graded exactness construction: full probe + ef >= |cell| is
    hash-identical to exact kNN (same rows, same rounded distances, same
    (dist, id) tie-break)."""
    q = knn_ops.make_queries(embeddings, n=10)
    got = index.search_graph(q, k=10, nprobe=8, ef=10**9)
    want = knn_ops.knn_exact(embeddings, q, k=10)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_graph_finite_ef_recall(spark, embeddings, index):
    """Finite ef is the recall knob (ef_search twin): a modest beam at
    full probe already recalls most of the exact top-k, and widening the
    beam can only help on aggregate."""
    q = knn_ops.make_queries(embeddings, n=10)
    exact = knn_ops.knn_exact(embeddings, q, k=10)
    want = {(r.qid, r.neighbor_id) for r in exact.collect()}

    def recall(ef: int) -> float:
        got = index.search_graph(q, k=10, nprobe=8, ef=ef)
        g = {(r.qid, r.neighbor_id) for r in got.collect()}
        return len(g & want) / len(want)

    assert recall(16) >= 0.6
    assert recall(64) >= 0.9


def test_graph_filtered_and_excluded(spark, embeddings, index):
    """predicate + exclude_ids compose post-walk: with the exhaustive
    beam the post-filter equals exact kNN over the filtered base."""
    q = knn_ops.make_queries(embeddings, n=5)
    pred = F.col("label") < 5
    excl = embeddings.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    got = index.search_graph(
        q, k=10, nprobe=8, ef=10**9, predicate=pred, exclude_ids=excl
    )
    base = embeddings.filter(pred).filter(~(F.col("vec_id") % 7 == 0))
    want = knn_ops.knn_exact(base, q, k=10)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_graph_sidecar_is_generation_keyed_and_gced(spark, embeddings, index):
    """ensure_graph writes one dir per (m, efc, generation); a second call
    returns the cached dir without rebuilding; invalidate_sidecars GCs
    dirs whose generation is no longer retained."""
    d1 = index.ensure_graph()
    assert os.path.exists(os.path.join(d1, "_SUCCESS"))
    assert d1 == index.ensure_graph()
    mtime = os.path.getmtime(os.path.join(d1, "_SUCCESS"))
    index.ensure_graph()
    assert os.path.getmtime(os.path.join(d1, "_SUCCESS")) == mtime
    # knob-keyed: a different M never aliases
    d2 = index.ensure_graph(m=8)
    assert d2 != d1
    # fake a stale generation and GC it
    stale = os.path.join(index.index_dir, "graph_m16_efc100_gen999")
    os.makedirs(stale, exist_ok=True)
    index.invalidate_sidecars()
    assert not os.path.exists(stale)
    retained = glob.glob(os.path.join(index.index_dir, "graph_m*"))
    assert d1 in retained


def test_graph_sidecar_partition_pruning_plan(spark, embeddings, index):
    """The sidecar scan must prune to the probed cells: the parquet read
    of a centroid_id-filtered graph dir shows a partition filter, not a
    full scan (the Catalyst twin of HNSW's candidate pruning role)."""
    d = index.ensure_graph()
    g = spark.read.parquet(d).filter(F.col("centroid_id").isin([0, 1]))
    plan = g._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan


def test_tune_ef_meets_target_and_reports_ceiling(spark, embeddings, index):
    """tune_ef finds an ef meeting the target at a full-probe nprobe
    (reachable: the exhaustive ceiling is exact there), and reports the
    nprobe ceiling honestly when the target is unreachable at nprobe=1."""
    q = knn_ops.make_queries(embeddings, n=10)
    out = index.tune_ef(q, target_recall=0.9, k=10, nprobe=8)
    assert out["recall"] >= 0.9
    assert out["ladder"][0]["ef"] == 10  # ladder starts at k
    # unreachable target at nprobe=1 → ceiling reported, ef = max cell
    low = index.tune_ef(q, target_recall=1.01, k=10, nprobe=1)
    assert "nprobe_ceiling" in low
    max_cell = max(int(r.n_vectors) for r in index.stats().collect())
    assert low["ef"] == max_cell


def test_streaming_merged_search_graph_tier(spark, embeddings, tmp_path):
    """tier="graph" through the merged Q4 contract: indexed side walks the
    per-cell graphs with shadowed ids excluded post-walk, delta side
    scans floats — equals exact search over the logical union at the
    exhaustive settings."""
    from vector_search_engine_spark.streaming.engine import VectorEngine

    eng = VectorEngine.create(
        embeddings.filter(F.col("vec_id") < 400),
        str(tmp_path / "engine"),
        n_centroids=8,
    )
    eng.insert(embeddings.filter(F.col("vec_id") >= 400))
    q = knn_ops.make_queries(embeddings, n=10)
    merged = eng.search(
        q,
        k=10,
        nprobe=eng.index.meta["n_centroids"],
        tier="graph",
        candidates_per_cell=10**9,
    )
    exact = knn_ops.knn_exact(embeddings, q, k=10)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, exact.collect())
    )
