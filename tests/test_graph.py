"""Connected-components / cluster-assignment tests (operators/graph.py):
star-round convergence on adversarial topologies, singleton handling, and
pair↔cluster consistency on the documents fixture."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from vector_search_engine_spark import load_table
from vector_search_engine_spark.operators import dedup as dedup_ops
from vector_search_engine_spark.operators import graph as graph_ops


def _cc(spark, edges):
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["u", "v"]), "u long, v long"
    )
    return {
        r["node"]: r["component"]
        for r in graph_ops.connected_components(df).collect()
    }


def test_path_graph_single_component(spark):
    # a 20-node path is the worst case for naive label propagation —
    # star rounds contract it in O(log n) rounds
    comp = _cc(spark, [(i, i + 1) for i in range(20)])
    assert set(comp.values()) == {0}
    assert len(comp) == 21


def test_disjoint_components_and_ordering(spark):
    comp = _cc(spark, [(5, 3), (3, 9), (20, 21), (42, 40)])
    assert comp == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 40: 40, 42: 40}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "u long, v long")
    assert graph_ops.connected_components(df).count() == 0


def test_dedup_clusters_consistent_with_pairs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_ops.ngram_jaccard_pairs(docs).collect()
    clusters = {
        r["doc_id"]: r
        for r in graph_ops.dedup_clusters(
            docs, dedup_ops.ngram_jaccard_pairs(docs)
        ).collect()
    }
    # every document labeled exactly once
    assert len(clusters) == docs.count()
    # paired docs share a cluster
    for p in pairs:
        assert clusters[p["doc_a"]]["cluster_id"] == clusters[p["doc_b"]]["cluster_id"]
    # canonical = min id of the cluster, exactly one per cluster
    by_cluster: dict = {}
    for r in clusters.values():
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m["doc_id"] for m in members)
        assert sum(m["is_canonical"] for m in members) == 1
        assert all(m["cluster_size"] == len(members) for m in members)
    # transitivity sanity: a multi-member cluster exists in the fixture
    assert any(len(m) > 1 for m in by_cluster.values())


# ---------------------------------------------------------------------------
# PageRank (fixed-iteration power method)
# ---------------------------------------------------------------------------


def _pr_reference(edges, iterations=8, damping=0.85):
    """Driver-side power iteration (pure Python) — the semantics pin."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    n = len(nodes)
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for u, v in edges:
            contrib[v] += pr[u] / outdeg[u]
        pr = {
            v: (1.0 - damping) / n + damping * contrib[v] for v in nodes
        }
    return pr


def _pr(spark, edges, **kw):
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["src", "dst"]), "src long, dst long"
    )
    return {
        r["node"]: r["pr"] for r in graph_ops.pagerank(df, **kw).collect()
    }


def test_pagerank_matches_power_iteration(spark):
    # ring + chords + a dangling sink (node 9 has no out-edges): exercises
    # the left-join floor path and the mass-leak convention
    edges = [(i, (i + 1) % 8) for i in range(8)] + [
        (0, 4), (2, 6), (3, 9), (7, 9),
    ]
    got = _pr(spark, edges)
    want = _pr_reference(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])


def test_pagerank_uniform_on_symmetric_cycle(spark):
    # a pure cycle is doubly stochastic: PageRank stays exactly uniform
    got = _pr(spark, [(i, (i + 1) % 6) for i in range(6)], iterations=3)
    for v, p in got.items():
        assert abs(p - 1.0 / 6.0) < 1e-15


def test_pagerank_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert graph_ops.pagerank(df).count() == 0


def test_pagerank_sink_gets_floor_only_mass_from_inedges(spark):
    # star into a sink: sink accumulates, spokes keep the floor
    edges = [(i, 99) for i in range(1, 5)]
    got = _pr(spark, edges, iterations=4)
    want = _pr_reference(edges, iterations=4)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    assert got[99] > got[1]
