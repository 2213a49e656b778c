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
