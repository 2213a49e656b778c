"""Vector search core (reference Q1/Q3/Q4 exact semantics).

Registry family module - mechanically split from the monolithic
registry.py (r10 verdict item 4); registration order is preserved by
the import order in registry/__init__.py, so the grading window and
the sweep see an unchanged QUERIES/ORACLES surface."""

from __future__ import annotations

from vector_search_engine_spark.registry._base import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# Vector search (reference Q1/Q3/Q4 exact semantics)
# ---------------------------------------------------------------------------


@register(
    "knn_exact_l2",
    oracle=f"""
WITH q AS ({_DD_QUERIES}),
d AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         {_DD_L2SQ.format(a="e.embedding", b="q.query")} AS dist
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT qid, neighbor_id, dist,
         row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS "rank"
  FROM d
)
SELECT qid, neighbor_id, "rank", round(dist, 4) AS dist_sq
FROM r WHERE "rank" <= 10
""",
)
def knn_exact_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: bulk exact top-10 under squared L2 (reference Search RPC at
    nprobe=∞; ``engine.h:100-144`` + ``write_buffer.h:54-70``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.knn_exact(emb, knn_ops.make_queries(emb), k=10, metric="l2_sq")


@register(
    "knn_exact_l2_sql",
    oracle=ORACLES["knn_exact_l2"],
)
def knn_exact_l2_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query through the pure-Catalyst plan (higher-order-function
    distance, broadcast join, window top-k) — plan-audit twin."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.knn_exact(
        emb, knn_ops.make_queries(emb), k=10, metric="l2_sq", method="sql"
    )


@register(
    "knn_exact_distributed",
    oracle=ORACLES["knn_exact_l2"],
)
def knn_exact_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query through the block nested-loop kNN join — the large-|Q|
    tier where the query set is itself a dataset and never visits the
    driver (closes the exact path's collect contract, ``knn.py:106``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.knn_exact_distributed(
        emb, knn_ops.make_queries(emb), k=10, metric="l2_sq"
    )


RADIUS_SQ = 1.5  # in a gap of the fixture's pair-distance distribution
_RADIUS_ORACLE = f"""
WITH q AS ({_DD_QUERIES})
SELECT q.qid, e.vec_id AS neighbor_id,
       round({_DD_L2SQ.format(a="e.embedding", b="q.query")}, 4) AS dist_sq
FROM embeddings e CROSS JOIN q
WHERE {_DD_L2SQ.format(a="e.embedding", b="q.query")} <= {RADIUS_SQ}
"""


@register("knn_radius_search", oracle=_RADIUS_ORACLE)
def knn_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact range search (all neighbors within squared-L2 radius)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.radius_search(emb, knn_ops.make_queries(emb), RADIUS_SQ)


@register("ann_ivf_radius", oracle=_RADIUS_ORACLE)
def ann_ivf_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-pruned range search — triangle-inequality cell pruning keeps
    it EXACT (same oracle as the brute-force form gates that claim)."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = ivf.build_or_load(spark, sf_dir)
    return idx.radius_search(knn_ops.make_queries(emb), RADIUS_SQ)


@register(
    "knn_exact_cosine",
    oracle=f"""
WITH q AS ({_DD_QUERIES}),
d AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         CASE WHEN sqrt({_DD_DOT.format(a="e.embedding", b="e.embedding")})
                   * sqrt({_DD_DOT.format(a="q.query", b="q.query")}) = 0 THEN 0.0
              ELSE {_DD_DOT.format(a="e.embedding", b="q.query")}
                   / (sqrt({_DD_DOT.format(a="e.embedding", b="e.embedding")})
                      * sqrt({_DD_DOT.format(a="q.query", b="q.query")}))
         END AS dist
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT qid, neighbor_id, dist,
         row_number() OVER (PARTITION BY qid ORDER BY dist DESC, neighbor_id) AS "rank"
  FROM d
)
SELECT qid, neighbor_id, "rank", round(dist, 4) AS sim
FROM r WHERE "rank" <= 10
""",
)
def knn_exact_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine top-10 (embeddings are L2-normalized so ordering matches L2,
    but the metric surface is first-class)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.knn_exact(emb, knn_ops.make_queries(emb), k=10, metric="cosine")


@register(
    "knn_exact_ip",
    oracle=f"""
WITH q AS ({_DD_QUERIES}),
d AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         {_DD_DOT.format(a="e.embedding", b="q.query")} AS dist
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT qid, neighbor_id, dist,
         row_number() OVER (PARTITION BY qid ORDER BY dist DESC, neighbor_id) AS "rank"
  FROM d
)
SELECT qid, neighbor_id, "rank", round(dist, 4) AS sim
FROM r WHERE "rank" <= 10
""",
)
def knn_exact_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner-product top-10 — the MIPS ranking recommender / retrieval
    scorers use; third first-class metric beside L2 and cosine."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.knn_exact(emb, knn_ops.make_queries(emb), k=10, metric="ip")


@register(
    "knn_filtered",
    oracle=f"""
WITH q AS ({_DD_QUERIES}),
d AS (
  SELECT q.qid, e.vec_id AS neighbor_id,
         {_DD_L2SQ.format(a="e.embedding", b="q.query")} AS dist
  FROM embeddings e CROSS JOIN q
  WHERE e.label < 5
),
r AS (
  SELECT qid, neighbor_id, dist,
         row_number() OVER (PARTITION BY qid ORDER BY dist, neighbor_id) AS "rank"
  FROM d
)
SELECT qid, neighbor_id, "rank", round(dist, 4) AS dist_sq
FROM r WHERE "rank" <= 10
""",
)
def knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered vector search: predicate + kNN, pre-filter pushed to the scan
    (capability the reference lacks — SURVEY.md §2.7)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.knn_filtered(
        emb, knn_ops.make_queries(emb), F.col("label") < 5, k=10
    )


@register(
    "knn_grouped_by_label",
    oracle=f"""
WITH q AS ({_DD_QUERIES}),
d AS (
  SELECT q.qid, e.label, e.vec_id AS neighbor_id,
         {_DD_L2SQ.format(a="e.embedding", b="q.query")} AS dist
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT qid, label, neighbor_id, dist,
         row_number() OVER (PARTITION BY qid, label ORDER BY dist, neighbor_id) AS "rank"
  FROM d
)
SELECT qid, label, neighbor_id, "rank", round(dist, 4) AS dist_sq
FROM r WHERE "rank" <= 3
""",
)
def knn_grouped_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise search: top-3 nearest exemplars of EVERY label per query
    (window over (qid, label) — diversity retrieval, SURVEY.md §2.7)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.knn_grouped(emb, knn_ops.make_queries(emb), "label", k=3)


@register(
    "vector_norms",
    oracle=f"""
SELECT vec_id,
       round(sqrt({_DD_DOT.format(a="embedding", b="embedding")}), 4) AS l2_norm,
       round({_DD_DOT.format(a="embedding", b="embedding")}, 4) AS self_dot,
       CAST(len(embedding) AS INTEGER) AS dim,
       label
FROM embeddings
""",
)
def vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar kernel surface (reference F1/F2) as a projection."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.round(norm(e), 4).alias("l2_norm"),
        F.round(dot(e, e), 4).alias("self_dot"),
        F.size(e).alias("dim"),
        "label",
    )


@register(
    "label_centroids",
    oracle="""
WITH u AS (
  SELECT label,
         generate_subscripts(embedding, 1) - 1 AS dim_idx,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
n AS (SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY label)
SELECT u.label, n.n_vectors, u.dim_idx::INT AS dim_idx,
       round(avg(u.x), 4) AS component
FROM u JOIN n USING (label)
GROUP BY u.label, n.n_vectors, u.dim_idx
""",
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector centroids via a grouped-agg pandas UDF (one NumPy
    mean per group), exploded to scalar components for the oracle."""
    from vector_search_engine_spark.functions.vector import (
        label_centroid_components,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    return label_centroid_components(emb)


@register("window_function_zoo", oracle=rel_ops.CUSTOMER_ORDER_WINDOW_ZOO_ORACLE)
def window_function_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals, moving average, lag/lead, rank family, ntile —
    the full window-function surface in one pass."""
    return rel_ops.customer_order_window_zoo(load_table(spark, sf_dir, "orders"))


@register(
    "knn_self_similarity_pairs",
    oracle=f"""
WITH d AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         CASE WHEN sqrt({_DD_DOT.format(a="a.embedding", b="a.embedding")})
                   * sqrt({_DD_DOT.format(a="b.embedding", b="b.embedding")}) = 0 THEN 0.0
              ELSE {_DD_DOT.format(a="a.embedding", b="b.embedding")}
                   / (sqrt({_DD_DOT.format(a="a.embedding", b="a.embedding")})
                      * sqrt({_DD_DOT.format(a="b.embedding", b="b.embedding")}))
         END AS sim
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(sim, 4) AS sim
FROM d WHERE sim >= 0.35
""",
)
def knn_self_similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similarity threshold self-join (embedding near-duplicate candidates):
    all pairs with cosine >= 0.35 via the broadcast-GEMM strategy
    (operators/simjoin.py); exact baseline for the LSH scale path."""
    emb = load_table(spark, sf_dir, "embeddings")
    return simjoin.similarity_pairs(emb, threshold=0.35, metric="cosine")


@register(
    "simjoin_edit_distance",
    oracle="""
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS key_a, b.p_name AS key_b,
       levenshtein(a.p_name, b.p_name)::BIGINT AS dist
FROM names a JOIN names b ON a.p_name < b.p_name
WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
  AND levenshtein(a.p_name, b.p_name) <= 2
""",
)
def simjoin_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity join (catalog-confusability pairs):
    distinct part names within Levenshtein distance 2, via Ed-Join-style
    positional q-gram prefix filtering + exact JVM verify
    (simjoin.edit_distance_pairs) — never the O(N^2) crossJoin the
    oracle runs."""
    names = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("key"), F.col("p_name").alias("s"))
        .distinct()
    )
    return simjoin.edit_distance_pairs(names, k=2, q=2)


@register(
    "simjoin_edit_distance_stats",
    oracle="""
WITH names AS (SELECT DISTINCT p_name FROM part),
v AS (
  SELECT count(*)::BIGINT AS verified_pairs
  FROM names a JOIN names b ON a.p_name < b.p_name
  WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
    AND levenshtein(a.p_name, b.p_name) <= 2
)
SELECT (SELECT count(*)::BIGINT FROM names) AS n_strings,
       v.verified_pairs,
       TRUE AS candidates_cover_verified,
       TRUE AS prefix_filter_prunes
FROM v
""",
)
def simjoin_edit_distance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ed-Join planning report — the boilerplate signal
    ``edit_distance_pairs``'s docstring promises (SCALING finding 16):
    candidate vs verified pair accounting for the catalog-confusability
    join, so a pipeline can GATE on cand/verified before paying the
    verify at scale.  r16 conversion from rows-only: ``n_strings`` and
    ``verified_pairs`` replay in SQL (the same crossJoin+levenshtein
    oracle as ``simjoin_edit_distance``), and the prefix filter's two
    structural contracts grade as expected-literal booleans — the
    candidate set must COVER every verified pair (a filter that drops a
    true pair breaks completeness) and must PRUNE strictly below
    all-pairs (a vacuous filter is an O(N²) join in disguise).  The raw
    candidate count and ratios (Ed-Join internals, not SQL-replayable)
    remain available via ``edit_distance_pairs(stats_out=...)``."""
    names = (
        load_table(spark, sf_dir, "part")
        .select(F.col("p_name").alias("key"), F.col("p_name").alias("s"))
        .distinct()
    )
    st: dict = {}
    verified = simjoin.edit_distance_pairs(
        names, k=2, q=2, stats_out=st
    ).count()
    n = names.count()
    cand = int(st["candidate_pairs"])
    all_pairs = n * (n - 1) // 2
    return spark.createDataFrame(
        [
            (
                n,
                verified,
                cand >= verified,
                cand < all_pairs,
            )
        ],
        "n_strings long, verified_pairs long, "
        "candidates_cover_verified boolean, prefix_filter_prunes boolean",
    )


