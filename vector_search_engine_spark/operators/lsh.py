"""LSH-based ANN search — the second index family (SURVEY.md §1.3 names
MLlib ``BucketedRandomProjectionLSH`` as the alternative to IVF for L2).

Where IVF prunes by learned Voronoi cells, BRP-LSH prunes by random
projections: ``h(v) = floor(v·w / bucketLength)`` per hash table; the
bucket join only compares vectors sharing a hash bucket in at least one
table.  No training pass (vs KMeans), at the cost of less adaptive
pruning — the classic trade.

``knn_lsh``: distributed bucket join (queries × vectors restricted to
matching buckets), exact re-score of candidates, window top-k.  Same
output schema as ``knn_exact`` / ``IVFIndex.search``; recall gated in
pytest against the exact result (approximate by nature → rows-only in
the driver's oracle check).

Scale posture: both sides stay DataFrames (the MLlib join is itself an
explode-on-hash + equi-join under the hood); candidates per query are
bounded by bucket occupancy × numHashTables; re-scoring uses the same
squared-L2 convention as everything else (dist is squared, tie-break
``(dist, id)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_engine_spark.operators.knn import _finalize_topk


def knn_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bucket_length: float = 1.0,
    num_hash_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via BRP-LSH bucket join + exact re-score.

    ``bucket_length`` tunes recall like ``nprobe`` does for IVF: wider
    buckets → more candidates → higher recall (≈2× the typical NN
    distance is the usual starting point).
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    feat = vectors.select(
        F.col(id_col), array_to_vector(F.col(vec_col)).alias("_v")
    )
    qfeat = queries.select(
        F.col("qid"), array_to_vector(F.col("query")).alias("_v")
    )
    model = BucketedRandomProjectionLSH(
        inputCol="_v",
        outputCol="_h",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(feat)
    # threshold inf: candidate generation is purely bucket membership;
    # ranking happens below under the engine's own (dist, id) convention
    joined = model.approxSimilarityJoin(
        feat, qfeat, threshold=float("inf"), distCol="_euclid"
    )
    cand = joined.select(
        F.col(f"datasetB.qid").alias("qid"),
        F.col(f"datasetA.{id_col}").alias("neighbor_id"),
        (F.col("_euclid") * F.col("_euclid")).alias("dist"),
    )
    return _finalize_topk(cand, k, "l2_sq")
