"""VectorEngine (LSM analog) tests: merged search equals exact over the
logical union, upsert shadows indexed versions, structured-streaming ingest
lands searchable rows, compaction preserves results exactly
(reference engine.h contracts, with the documented divergences fixed)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_engine_spark.operators import knn as knn_ops
from vector_search_engine_spark.streaming.engine import VectorEngine


@pytest.fixture()
def engine(spark, embeddings, tmp_path):
    base = embeddings.filter(F.col("vec_id") < 400)
    return VectorEngine.create(base, str(tmp_path / "engine"), n_centroids=8)


def _sorted(df):
    return [tuple(r) for r in df.orderBy("qid", "rank").collect()]


def test_merged_search_equals_exact_over_union(spark, embeddings, engine):
    tail = embeddings.filter(F.col("vec_id") >= 400)
    engine.insert(tail)
    q = knn_ops.make_queries(embeddings, n=10)
    merged = engine.search(q, k=10, nprobe=engine.index.meta["n_centroids"])
    exact = knn_exact_all = knn_ops.knn_exact(embeddings, q, k=10)
    assert _sorted(merged) == _sorted(exact)


def test_upsert_shadows_indexed_version(spark, embeddings, engine):
    # re-insert vec_id 0..4 moved far away; they must vanish from their own
    # top-1 (old versions shadowed) and appear at the new location
    moved = (
        embeddings.filter(F.col("vec_id") < 5)
        .withColumn(
            "embedding",
            F.transform(F.col("embedding"), lambda x: x + F.lit(10.0)).cast(
                "array<float>"
            ),
        )
    )
    engine.insert(moved)
    q = knn_ops.make_queries(embeddings, n=5)
    res = engine.search(q, k=3, nprobe=engine.index.meta["n_centroids"])
    rows = {(r.qid, r.rank): r for r in res.collect()}
    for qid in range(5):
        top1 = rows[(qid, 1)]
        assert top1.neighbor_id != qid or top1.dist_sq > 0.0
    # and the moved vectors are findable near their new location
    far_q = (
        embeddings.filter(F.col("vec_id") < 1)
        .select(
            F.col("vec_id").alias("qid"),
            F.transform(F.col("embedding"), lambda x: x + F.lit(10.0)).alias("query"),
        )
    )
    far_res = engine.search(far_q, k=1, nprobe=engine.index.meta["n_centroids"])
    assert far_res.collect()[0].neighbor_id == 0


def test_reinsert_latest_wins_within_delta(spark, embeddings, engine):
    v1 = embeddings.filter(F.col("vec_id") == 450)
    moved = v1.withColumn(
        "embedding",
        F.transform(F.col("embedding"), lambda x: x + F.lit(5.0)).cast("array<float>"),
    )
    engine.insert(moved)   # _seq=0
    engine.insert(v1)      # _seq=1: back to original position
    q = v1.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("query"))
    res = engine.search(q, k=1, nprobe=engine.index.meta["n_centroids"])
    top = res.collect()[0]
    assert top.neighbor_id == 450 and top.dist_sq == 0.0


def test_streaming_ingest_then_search(spark, embeddings, engine, tmp_path):
    stage = tmp_path / "stage"
    stage.mkdir()
    tail = embeddings.filter(F.col("vec_id") >= 400).select("vec_id", "embedding")
    tail.write.mode("overwrite").parquet(str(stage / "batch"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .parquet(str(stage / "batch"))
    )
    qh = engine.ingest_stream(stream)
    qh.awaitTermination(120)
    q = knn_ops.make_queries(embeddings, n=5)
    merged = engine.search(q, k=10, nprobe=engine.index.meta["n_centroids"])
    exact = knn_ops.knn_exact(embeddings, q, k=10)
    assert _sorted(merged) == _sorted(exact)


def test_compaction_preserves_results(spark, embeddings, engine):
    tail = embeddings.filter(F.col("vec_id") >= 400)
    moved = (
        embeddings.filter(F.col("vec_id") < 5)
        .withColumn(
            "embedding",
            F.transform(F.col("embedding"), lambda x: x + F.lit(10.0)).cast(
                "array<float>"
            ),
        )
    )
    engine.insert(tail)
    engine.insert(moved)
    q = knn_ops.make_queries(embeddings, n=10)
    np_full = engine.index.meta["n_centroids"]
    before = _sorted(engine.search(q, k=10, nprobe=np_full))
    n = engine.compact()
    assert n == 105  # 100 tail + 5 moved
    after = _sorted(engine.search(q, k=10, nprobe=np_full))
    assert before == after
    assert engine.delta().count() == 0
    # table has exactly one row per id
    ids = engine.index.vectors().groupBy("vec_id").count()
    assert ids.filter(F.col("count") > 1).count() == 0


def test_compaction_empty_delta_noop(engine):
    assert engine.compact() == 0


def test_maybe_compact_threshold_policy(spark, embeddings, tmp_path):
    """maybe_compact folds only past the delta-fraction threshold
    (reference W3 soft/hard-limit analog)."""
    from pyspark.sql import functions as F

    from vector_search_engine_spark.streaming.engine import VectorEngine

    eng = VectorEngine.create(
        embeddings.filter(F.col("vec_id") < 400), str(tmp_path / "eng"), n_centroids=4
    )
    # 50 delta rows on 400 indexed = 12.5% < 25% -> no compaction
    eng.insert(embeddings.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 450)))
    assert eng.maybe_compact(max_delta_fraction=0.25) == 0
    assert eng.delta().count() == 50
    # 100 rows = 25% -> compacts everything
    eng.insert(embeddings.filter(F.col("vec_id") >= 450))
    assert eng.maybe_compact(max_delta_fraction=0.25) == 100
    assert eng.delta().count() == 0
