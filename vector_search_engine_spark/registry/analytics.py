"""r10 wave: kNN-graph analytics, epsilon/density family, radius serving, corpus statistics.

Registry family module - mechanically split from the monolithic
registry.py (r10 verdict item 4); registration order is preserved by
the import order in registry/__init__.py, so the grading window and
the sweep see an unchanged QUERIES/ORACLES surface."""

from __future__ import annotations

from vector_search_engine_spark.registry._base import *  # noqa: F401,F403
from vector_search_engine_spark.registry.streaming import _fresh_engine_root  # noqa: F401
from vector_search_engine_spark.registry.vectors import RADIUS_SQ, _RADIUS_ORACLE  # noqa: F401

_PR_K = 5
_PR_ITERS = 8
_PR_DAMPING = 0.85


def _knn_pagerank_oracle() -> str:
    d = _PR_DAMPING
    head = f"""
WITH dmat AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         {_DD_L2SQ.format(a="a.embedding", b="b.embedding")} AS dist
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
e AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
    FROM dmat) WHERE rn <= {_PR_K}
),
deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM e GROUP BY src),
nn AS (SELECT count(*)::DOUBLE AS n FROM embeddings),
r0 AS (SELECT vec_id AS node, 1.0 / (SELECT n FROM nn) AS pr FROM embeddings)"""
    parts = [head]
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        parts.append(f""",
r{i} AS (
  SELECT nd.node,
         (1.0 - {d}) / (SELECT n FROM nn)
         + {d} * coalesce(s.c, 0.0) AS pr
  FROM (SELECT vec_id AS node FROM embeddings) nd
  LEFT JOIN (
    SELECT e.dst AS node, sum(p.pr / deg.outdeg) AS c
    FROM e JOIN {prev} p ON e.src = p.node
           JOIN deg ON e.src = deg.src
    GROUP BY e.dst) s USING (node)
)""")
        prev = f"r{i}"
    parts.append(
        f"\nSELECT node AS vec_id, round(pr, 6) AS pagerank FROM {prev}"
    )
    return "".join(parts)


@register("embeddings_knn_pagerank", oracle=_knn_pagerank_oracle())
def embeddings_knn_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the exact k=5 kNN graph of the embeddings table —
    node centrality as a representativeness / coreset-selection score
    (operators/graph.pagerank, fixed 8 iterations, d=0.85).  Edges here
    come from the exact kNN kernel so the unrolled-CTE oracle sees the
    identical graph (r14: via ``_knn_edges`` — the shared block-cogroup
    build all kNN-graph rows ride; see its docstring for the measured
    12× build win over the broadcast form at |Q| = N)."""
    from vector_search_engine_spark.operators.graph import pagerank

    pr = pagerank(
        _knn_edges(spark, sf_dir),
        iterations=_PR_ITERS,
        damping=_PR_DAMPING,
    )
    return pr.select(
        F.col("node").cast("long").alias("vec_id"),
        F.round("pr", 6).alias("pagerank"),
    )


# Epsilon-graph family: the radius SELF-join (every within-eps pair of
# the whole table), and the two classic analytics built on the distance
# structure — DBSCAN density clustering and k-distance outlier scoring.
# Shared eps/min_pts pinned here so plans and oracles can't drift.
_EPS_SQ = 1.35  # sits in a >=1.2e-5 gap of the fixture pair-distance dist.
_DBSCAN_MIN_PTS = 4
_OUTLIER_K = 5
_OUTLIER_TOP_N = 100


_RADIUS_PAIRS_ORACLE = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_DD_L2SQ.format(a="a.embedding", b="b.embedding")}, 4) AS dist_sq
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_DD_L2SQ.format(a="a.embedding", b="b.embedding")} <= {_EPS_SQ}
"""


@register("knn_radius_pairs", oracle=_RADIUS_PAIRS_ORACLE)
def knn_radius_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table epsilon pairs via the block nested-loop radius
    self-join (``knn.radius_pairs_distributed``) — each unordered pair
    evaluated exactly once, shuffle N*blocks rows, never N^2."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.radius_pairs_distributed(emb, _EPS_SQ)


@register(
    "knn_label_classify",
    oracle=f"""
WITH q AS ({_DD_QUERIES}),
d AS (
  SELECT q.qid, e.vec_id AS nid, e.label,
         {_DD_L2SQ.format(a="e.embedding", b="q.query")} AS dist
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.qid
),
r AS (
  SELECT qid, label,
         row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rn
  FROM d
),
v AS (
  SELECT qid, label, count(*) AS votes FROM r WHERE rn <= 10
  GROUP BY qid, label
),
p AS (
  SELECT qid, label, votes,
         row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label) AS rn
  FROM v
)
SELECT qid, CAST(label AS BIGINT) AS predicted_label,
       CAST(votes AS BIGINT) AS votes
FROM p WHERE rn = 1
""",
)
def knn_label_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote classification over the label column
    (leave-one-out: self excluded, k refilled): the nearest-neighbor
    analytics sibling every labeled vector store serves — and the
    weak-labeling pass of a training-data pipeline (propagate labels
    from a seed set to the unlabeled pool).  Ties pin to the smaller
    label (``knn.knn_classify``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.knn_classify(emb, knn_ops.make_queries(emb), k=10)


@register(
    "embeddings_knn_outliers",
    oracle=f"""
WITH d AS (
  SELECT a.vec_id AS vid, b.vec_id AS nid,
         {_DD_L2SQ.format(a="a.embedding", b="b.embedding")} AS dist
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT vid, dist,
         row_number() OVER (PARTITION BY vid ORDER BY dist, nid) AS rn
  FROM d
),
kd AS (SELECT vid, dist FROM r WHERE rn = {_OUTLIER_K}),
t AS (
  SELECT vid, dist, row_number() OVER (ORDER BY dist DESC, vid) AS rn
  FROM kd
)
SELECT vid AS vec_id, round(dist, 4) AS kdist_sq
FROM t WHERE rn <= {_OUTLIER_TOP_N}
""",
)
def embeddings_knn_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-distance outlier scores (Ramaswamy et al. SIGMOD'00), top-100:
    the embedding-space cleaning pass that drops encoder failures before
    training.  All-points query set routes through the block nested-loop
    kNN join; the global cut is one TakeOrderedAndProject
    (``knn.knn_outlier_scores``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.knn_outlier_scores(
        emb, k=_OUTLIER_K, top_n=_OUTLIER_TOP_N
    )


@register(
    "embeddings_dbscan",
    oracle=f"""
WITH RECURSIVE d AS (
  SELECT a.vec_id AS sa, b.vec_id AS sb
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE {_DD_L2SQ.format(a="a.embedding", b="b.embedding")} <= {_EPS_SQ}
),
deg AS (SELECT sa, count(*) AS c FROM d GROUP BY sa),
core AS (SELECT sa AS node FROM deg WHERE c + 1 >= {_DBSCAN_MIN_PTS}),
ce AS (
  SELECT d.sa AS u, d.sb AS v FROM d
  JOIN core c1 ON d.sa = c1.node JOIN core c2 ON d.sb = c2.node
),
cc(node, lbl) AS (
  SELECT node, node FROM core
  UNION
  SELECT ce.v, cc.lbl FROM ce JOIN cc ON cc.node = ce.u
),
corelab AS (SELECT node, min(lbl) AS cluster_id FROM cc GROUP BY node),
borderlab AS (
  SELECT d.sa AS node, min(cl.cluster_id) AS cluster_id
  FROM d JOIN corelab cl ON d.sb = cl.node
  WHERE d.sa NOT IN (SELECT node FROM core)
  GROUP BY d.sa
)
SELECT e.vec_id,
       CAST(coalesce(c.cluster_id, b.cluster_id, -1) AS BIGINT) AS cluster_id,
       CASE WHEN c.node IS NOT NULL THEN 'core'
            WHEN b.node IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role
FROM embeddings e
LEFT JOIN corelab c ON e.vec_id = c.node
LEFT JOIN borderlab b ON e.vec_id = b.node
""",
)
def embeddings_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN (Ester et al. KDD'96) over the embeddings table — density
    clustering as an epsilon-graph composition: block-GEMM radius
    self-join -> min_pts degree gate -> connected components over
    CORE-CORE edges -> deterministic (min-cluster) border assignment
    (``graph.dbscan``).  At the graded params the fixture splits into
    all three roles (164 core / 197 border / 139 noise at sf0.01)."""
    from vector_search_engine_spark.operators.graph import dbscan

    emb = load_table(spark, sf_dir, "embeddings")
    return dbscan(emb, eps_sq=_EPS_SQ, min_pts=_DBSCAN_MIN_PTS)


@register("streaming_radius_search", oracle=_RADIUS_ORACLE)
def streaming_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merged-search contract's RANGE sibling: indexed side via the
    triangle-inequality pruned scan with shadowed ids anti-joined out,
    delta side exact, plain union (no ranking — id sets disjoint by the
    exclusion).  The delta overlaps the indexed base by 50 ids
    (same-payload upserts), so a broken shadowing exclusion would emit
    duplicate pairs and fail the row-count gate — the oracle is the
    same brute-force radius SQL as the flat forms."""
    from vector_search_engine_spark.streaming.engine import VectorEngine

    emb = load_table(spark, sf_dir, "embeddings")
    eng = VectorEngine.create(
        emb.filter(F.col("vec_id") < 400), _fresh_engine_root(), n_centroids=8
    )
    eng.insert(emb.filter(F.col("vec_id") >= 350))
    return eng.radius_search(knn_ops.make_queries(emb), RADIUS_SQ)


@register(
    "embeddings_lof",
    oracle=f"""
WITH d AS (
  SELECT a.vec_id AS p, b.vec_id AS o,
         {_DD_L2SQ.format(a="a.embedding", b="b.embedding")} AS dist
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT p, o, dist,
         row_number() OVER (PARTITION BY p ORDER BY dist, o) AS rn
  FROM d
),
nb AS (SELECT p, o, dist FROM r WHERE rn <= {_OUTLIER_K}),
kd AS (SELECT p, max(dist) AS kdist FROM nb GROUP BY p),
reach AS (
  SELECT nb.p, nb.o, greatest(nb.dist, kd.kdist) AS reach
  FROM nb JOIN kd ON nb.o = kd.p
),
lrd AS (SELECT p, {_OUTLIER_K} / sum(reach) AS lrd FROM reach GROUP BY p),
s AS (
  SELECT nb.p, sum(l2.lrd) AS snl FROM nb JOIN lrd l2 ON nb.o = l2.p
  GROUP BY nb.p
)
SELECT s.p AS vec_id, round(s.snl / ({_OUTLIER_K} * lrd.lrd), 4) AS lof
FROM s JOIN lrd ON s.p = lrd.p
""",
)
def embeddings_lof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Outlier Factor (Breunig et al. SIGMOD'00): density-RELATIVE
    outlier scores for every embedding — catches the sparse-region point
    next to a dense cluster that absolute k-distance misses.  Exactly-k
    neighborhoods under the (dist, id) tie order (the deviation
    ``knn.knn_lof_scores`` documents); assumes no exact-duplicate
    vectors (lrd degenerates there — dedup first, which this repo's
    dedup family is for)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.knn_lof_scores(emb, k=_OUTLIER_K)


@register("ann_ivf_classify", oracle=ORACLES["knn_label_classify"])
def ann_ivf_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classification through the INDEX serving path: candidate
    generation via the IVF probe (full probe here — exact by
    construction, hence the same oracle as the flat path), then the
    shared broadcast-label majority vote (``knn.majority_vote``).  The
    classification cell of the serving-tier matrix."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = ivf.build_or_load(spark, sf_dir)
    from pyspark.sql import Window as W

    q = knn_ops.make_queries(emb)
    raw = idx.search(
        q, k=11, nprobe=idx.meta["n_centroids"], round_output=False
    )
    w = W.partitionBy("qid").orderBy("dist_sq", "neighbor_id")
    nbrs = (
        raw.filter(F.col("qid") != F.col("neighbor_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
    )
    return knn_ops.majority_vote(nbrs, emb)


# kNN-graph analytics beyond PageRank: triangle structure and label-
# propagation communities, over the same exact k=5 graph the PageRank
# row uses (shared head CTE so the graphs can never drift).
_KNN_GRAPH_HEAD = f"""
dmat AS (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         {_DD_L2SQ.format(a="a.embedding", b="b.embedding")} AS dist
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
e AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           row_number() OVER (PARTITION BY src ORDER BY dist, dst) AS rn
    FROM dmat) WHERE rn <= {_PR_K}
),
und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v FROM e)"""


def _knn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k=5 kNN edges (directed), the Spark twin of _KNN_GRAPH_HEAD's
    ``e`` CTE — the shared edge build for every kNN-graph analytics row.

    r14: builds through ``knn_exact_distributed`` (block cogroup — the
    dataset-sized-|Q| tier, hash-identical to ``knn_exact``; measured
    12× faster than the collect-and-broadcast form when |Q| = N at
    sf0.1: 0.47 s vs 5.7 s — the broadcast kernel's per-partition
    Python loop over ALL N queries dominates, while the block form
    amortizes one GEMM per (qblock, vblock) tile).  At serving scale
    with a clustered geometry the build routes through
    ``IVFIndex.search_exact_bounded_distributed`` (lossless seed+verify
    prune); identical output contract, same oracle — proven
    edge-set-identical at 300k and NumPy-gated at 1M (SCALING findings
    30/40: bounded wins 4.9× at 100k, 15.8× at 300k, builds the full
    6M-edge exact graph at 1M in 364 s where the block form's
    two-point-measured N² law sits at ~3.9 h).  The block form stays
    the BENCH-sf default: at 2k vectors its whole wall (0.47 s) is
    under the bounded tier's IVF build alone (~2 s); crossover is in
    the tens-of-thousands on clustered corpora."""
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("query")
    )
    nbrs = knn_ops.knn_exact_distributed(
        emb, q, k=_PR_K + 1, round_output=False
    )
    w = Window.partitionBy("qid").orderBy("dist_sq", "neighbor_id")
    return (
        nbrs.filter(F.col("qid") != F.col("neighbor_id"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PR_K)
        .select(F.col("qid").alias("src"), F.col("neighbor_id").alias("dst"))
    )


@register(
    "embeddings_knn_triangles",
    oracle=f"""
WITH {_KNN_GRAPH_HEAD},
t AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM und e1
  JOIN und e2 ON e2.u = e1.v
  JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v
),
pn AS (
  SELECT node, count(*) AS triangles FROM (
    SELECT a AS node FROM t
    UNION ALL SELECT b FROM t
    UNION ALL SELECT c FROM t
  ) GROUP BY node
)
SELECT emb.vec_id, CAST(coalesce(pn.triangles, 0) AS BIGINT) AS triangles
FROM embeddings emb LEFT JOIN pn ON emb.vec_id = pn.node
""",
)
def embeddings_knn_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the undirected k=5 kNN graph —
    local clustering structure (a manifold-density / hubness signal
    over embeddings).  Degree-oriented compact-forward: wedge fan-out
    bounded O(sqrt(E)) per node regardless of skew
    (``graph.triangle_counts``); oracle enumerates ordered triples
    against the identical graph."""
    from vector_search_engine_spark.operators.graph import triangle_counts

    out = triangle_counts(_knn_edges(spark, sf_dir))
    return out.select(F.col("node").alias("vec_id"), "triangles")


def _lpa_oracle(iters: int) -> str:
    parts = [f"WITH {_KNN_GRAPH_HEAD},"]
    parts.append("""
sym AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM sym)""")
    for i in range(1, iters + 1):
        parts.append(f""",
l{i} AS (
  SELECT node, lbl FROM (
    SELECT s.u AS node, p.lbl AS lbl, count(*) AS c,
           row_number() OVER (
             PARTITION BY s.u ORDER BY count(*) DESC, p.lbl) AS rn
    FROM sym s JOIN l{i - 1} p ON p.node = s.v
    GROUP BY s.u, p.lbl) WHERE rn = 1
)""")
    parts.append(
        f"\nSELECT node AS vec_id, CAST(lbl AS BIGINT) AS community "
        f"FROM l{iters}"
    )
    return "".join(parts)


_LPA_ITERS = 4


@register("embeddings_knn_communities", oracle=_lpa_oracle(_LPA_ITERS))
def embeddings_knn_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous min-tie label propagation (Raghavan et al. 2007,
    determinized) over the undirected k=5 kNN graph, exactly 4 rounds —
    embedding-space community assignment without a parametric cluster
    count (``graph.label_propagation``); oracle = 4 unrolled
    histogram-argmax CTEs over the identical graph."""
    from vector_search_engine_spark.operators.graph import label_propagation

    out = label_propagation(_knn_edges(spark, sf_dir), iterations=_LPA_ITERS)
    return out.select(F.col("node").alias("vec_id"), "community")


_RADIUS_FILTERED_ORACLE = f"""
WITH q AS ({_DD_QUERIES})
SELECT q.qid, e.vec_id AS neighbor_id,
       round({_DD_L2SQ.format(a="e.embedding", b="q.query")}, 4) AS dist_sq
FROM embeddings e CROSS JOIN q
WHERE {_DD_L2SQ.format(a="e.embedding", b="q.query")} <= {RADIUS_SQ}
  AND e.label < 5
"""


@register("ann_ivf_radius_filtered", oracle=_RADIUS_FILTERED_ORACLE)
def ann_ivf_radius_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered × radius cell of the capability matrix: the metadata
    predicate narrows the triangle-inequality pruned scan — trivially
    lossless for range search (the radius is absolute, no k-th-bound
    interplay), so the brute-force filtered SQL gates it exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = ivf.build_or_load(spark, sf_dir)  # carries label (extra_cols)
    return idx.radius_search(
        knn_ops.make_queries(emb), RADIUS_SQ, predicate=F.col("label") < 5
    )


@register("streaming_radius_search_filtered", oracle=_RADIUS_FILTERED_ORACLE)
def streaming_radius_search_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered × radius × streaming: the merged range search with a
    metadata predicate applied to each row's latest version on both
    sides (pruned indexed scan + live delta scan) — completing the
    predicate column of the serving matrix for range queries."""
    from vector_search_engine_spark.streaming.engine import VectorEngine

    emb = load_table(spark, sf_dir, "embeddings")
    eng = VectorEngine.create(
        emb.filter(F.col("vec_id") < 400),
        _fresh_engine_root(),
        n_centroids=8,
        extra_cols=("label",),
    )
    eng.insert(emb.filter(F.col("vec_id") >= 350))
    return eng.radius_search(
        knn_ops.make_queries(emb), RADIUS_SQ, predicate=F.col("label") < 5
    )


@register("embeddings_dbscan_ivf", oracle=ORACLES["embeddings_dbscan"])
def embeddings_dbscan_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN served THROUGH the index: epsilon pairs from
    ``IVFIndex.radius_search`` (triangle-inequality cell pruning —
    lossless, so the same recursive-CTE oracle gates it) instead of the
    quadratic block self-join; the graph steps are identical
    (``graph.dbscan(pairs=...)``).  The swap demonstrates the documented
    scale path: pair generation cost goes from N²/blocks GEMM to the
    pruned probed fraction."""
    from vector_search_engine_spark.operators.graph import dbscan

    emb = load_table(spark, sf_dir, "embeddings")
    idx = ivf.build_or_load(spark, sf_dir)
    q = emb.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("query"))
    hits = idx.radius_search(q, _EPS_SQ, round_output=False)
    pairs = hits.filter(F.col("qid") < F.col("neighbor_id")).select(
        F.col("qid").alias("id_a"), F.col("neighbor_id").alias("id_b"), "dist_sq"
    )
    return dbscan(emb, eps_sq=_EPS_SQ, min_pts=_DBSCAN_MIN_PTS, pairs=pairs)


_KDIST_PS = [0.5, 0.75, 0.9, 0.95, 0.99]


@register(
    "dbscan_kdist_report",
    oracle=f"""
WITH d AS (
  SELECT a.vec_id AS vid, b.vec_id AS nid,
         {_DD_L2SQ.format(a="a.embedding", b="b.embedding")} AS dist
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT vid, dist,
         row_number() OVER (PARTITION BY vid ORDER BY dist, nid) AS rn
  FROM d
),
kd AS (SELECT dist FROM r WHERE rn = {_DBSCAN_MIN_PTS - 1}),
qp AS (
  SELECT unnest({_KDIST_PS}) AS p,
         unnest(quantile_cont(dist, {_KDIST_PS})) AS kdist
  FROM kd
)
SELECT p, round(kdist, 4) AS kdist FROM qp
""",
)
def dbscan_kdist_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DBSCAN eps elbow (Ester et al. 1996 §4.2) as a graded
    calibration row: percentiles of the sorted (min_pts-1)-distance
    curve — the standard way to pick eps, sibling of the
    ivf_tune_{nprobe,candidates,ef} reports.  Oracle-comparable because
    Spark's exact ``percentile`` and DuckDB's ``quantile_cont`` share
    type-7 linear interpolation."""
    emb = load_table(spark, sf_dir, "embeddings")
    kd = knn_ops.knn_kth_distances(emb, k=_DBSCAN_MIN_PTS - 1)
    ps = ",".join(str(p) for p in _KDIST_PS)
    return (
        kd.agg(
            F.expr(f"percentile(kdist, array({ps}))").alias("q")
        )
        .select(
            F.posexplode("q").alias("pos", "kdist"),
        )
        .select(
            F.element_at(
                F.array(*[F.lit(p) for p in _KDIST_PS]), F.col("pos") + 1
            ).alias("p"),
            F.round("kdist", 4).alias("kdist"),
        )
    )


@register("doc_bigram_logprob", oracle=txt_ops.BIGRAM_LOGPROB_ORACLE)
def doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score per document — the perplexity filter of
    web-corpus pipelines (CCNet shape), with the model trained on the
    corpus itself so in-corpus support removes the smoothing question
    entirely (``text_ops.bigram_logprob``): gibberish and boilerplate
    soup surface as high mean -ln P(w2|w1)."""
    return txt_ops.bigram_logprob(load_table(spark, sf_dir, "documents"))


@register("corpus_source_kl", oracle=txt_ops.SOURCE_KL_ORACLE)
def corpus_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source unigram KL(P_source || P_corpus) — the data-mixture
    drift diagnostic (``text_ops.source_kl_divergence``); unsmoothed
    and exactly well-defined because support(P_s) ⊆ support(Q) by
    construction."""
    return txt_ops.source_kl_divergence(load_table(spark, sf_dir, "documents"))




def _kcore_oracle(k: int, rounds: int) -> str:
    parts = [f"""WITH p AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE {_DD_L2SQ.format(a="a.embedding", b="b.embedding")} <= {_EPS_SQ}
),
s0 AS MATERIALIZED (SELECT u, v FROM p UNION ALL SELECT v AS u, u AS v FROM p)"""]
    # each round references the previous one THREE times (degree count +
    # two endpoint joins): MATERIALIZED stops DuckDB's default CTE
    # inlining from expanding the chain into 3^rounds base scans
    for i in range(1, rounds + 1):
        parts.append(f""",
k{i} AS MATERIALIZED (
  SELECT u AS node FROM s{i - 1} GROUP BY u HAVING count(*) >= {k}),
s{i} AS MATERIALIZED (
  SELECT s.u, s.v FROM s{i - 1} s
  JOIN k{i} a ON a.node = s.u JOIN k{i} b ON b.node = s.v
)""")
    parts.append(
        f"\nSELECT u AS vec_id, CAST(count(*) AS BIGINT) AS degree "
        f"FROM s{rounds} GROUP BY u"
    )
    return "".join(parts)


_KCORE_K = 2
_KCORE_ROUNDS = 12  # fixture converges at 10 (pytest pins the fixpoint)


@register(
    "embeddings_epsilon_kcore",
    oracle=_kcore_oracle(_KCORE_K, _KCORE_ROUNDS),
)
def embeddings_epsilon_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core of the EPSILON graph (Seidman 1983; ``graph.k_core``):
    the density skeleton of the near-duplicate neighborhood graph —
    2-core membership separates cyclic dense regions (redundant content
    worth downsampling) from the tree-like sparse frontier the outlier
    family flags from the other side.  Synchronous fixed-round peeling
    (monotone, so a no-op round certifies the true fixpoint —
    convergence pytest-pinned at 10 rounds on the fixture, 12 graded
    for margin); oracle = 12 unrolled degree-filter CTEs over the
    identical epsilon graph.  The pair generator is the block-GEMM
    radius self-join — shuffle N·blocks rows, never N²."""
    from vector_search_engine_spark.operators.graph import k_core

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = knn_ops.radius_pairs_distributed(emb, _EPS_SQ)
    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    out = k_core(e, k=_KCORE_K, rounds=_KCORE_ROUNDS)
    return out.select(F.col("node").alias("vec_id"), "degree")


# ---------------------------------------------------------------------------
# Greedy k-center coreset (r13) — diversity sampling with a spread
# guarantee; oracle = unrolled selection CTEs replaying the identical
# argmax-of-min-distance greedy step
# ---------------------------------------------------------------------------

_KCENTER_K = 8


def _kcenter_oracle(k: int = _KCENTER_K) -> str:
    dist = _DD_L2SQ.format(a="e.embedding", b="s.embedding")
    ctes = [
        'all0 AS (SELECT vec_id, embedding, 0.0::DOUBLE AS md, '
        '1::BIGINT AS "rank" FROM embeddings ORDER BY vec_id LIMIT 1)'
    ]
    for i in range(1, k):
        ctes.append(f"""pick{i} AS (
  SELECT e.vec_id, e.embedding,
         (SELECT min({dist}) FROM all{i - 1} s) AS md,
         {i + 1}::BIGINT AS "rank"
  FROM embeddings e
  WHERE e.vec_id NOT IN (SELECT vec_id FROM all{i - 1})
  ORDER BY md DESC, e.vec_id LIMIT 1
)""")
        ctes.append(
            f"all{i} AS (SELECT * FROM all{i - 1} "
            f"UNION ALL SELECT * FROM pick{i})"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f'\nSELECT "rank", vec_id, round(md, 4) AS dist_sq FROM all{k - 1}'
    )


@register("embeddings_kcenter_coreset", oracle=_kcenter_oracle())
def embeddings_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (r13, Gonzalez 1985): k=8
    maximally-spread exemplars, anchor = smallest id, each step adds the
    argmax of min-distance-to-selected (ties by id) — the
    diversity-sampling / labeling-budget primitive, dual to the density
    family.  Iterative by nature; each step is one distributed scan +
    TakeOrdered(1) with a k-row driver state.  Oracle: the identical
    greedy unrolled as 8 selection CTEs."""
    return knn_ops.kcenter_select(
        load_table(spark, sf_dir, "embeddings"), k=_KCENTER_K
    )


@register("ann_ivf_radius_distributed", oracle=_RADIUS_ORACLE)
def ann_ivf_radius_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE search on the BULK-QUERY path (r13): the triangle-inequality
    cell prune runs inside the query table's partitions (centroids +
    per-cell radii in the closure), probe hits shuffle-join the pruned
    float cells — zero recall loss, bit-identical to the per-query form
    and the brute-force oracle; no per-query data visits the driver."""
    emb = load_table(spark, sf_dir, "embeddings")
    idx = ivf.build_or_load(spark, sf_dir)
    return idx.radius_search_distributed(knn_ops.make_queries(emb), RADIUS_SQ)


@register("streaming_radius_search_distributed", oracle=_RADIUS_ORACLE)
def streaming_radius_search_distributed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The merged RANGE contract for dataset-sized query tables (r13):
    indexed side = in-partition pruned distributed radius scan with
    shadowed ids anti-joined out; delta side = broadcast JVM l2_sq
    filter (delta small by the compaction contract); union is the merge.
    Same 50-id upsert overlap trap as streaming_radius_search — broken
    shadowing emits duplicates and fails the row-count gate."""
    from vector_search_engine_spark.streaming.engine import VectorEngine

    emb = load_table(spark, sf_dir, "embeddings")
    eng = VectorEngine.create(
        emb.filter(F.col("vec_id") < 400), _fresh_engine_root(), n_centroids=8
    )
    eng.insert(emb.filter(F.col("vec_id") >= 350))
    return eng.radius_search_distributed(knn_ops.make_queries(emb), RADIUS_SQ)


@register(
    "embeddings_knn_hubness",
    oracle=f"""
WITH {_KNN_GRAPH_HEAD}
SELECT n.vec_id, coalesce(o.c, 0) AS k_occurrence
FROM embeddings n
LEFT JOIN (SELECT dst, count(*)::BIGINT AS c FROM e GROUP BY dst) o
       ON n.vec_id = o.dst
""",
)
def embeddings_knn_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-occurrence (hubness) over the exact k=5 kNN graph — the
    in-degree of the kNN digraph, the standard high-dimensional
    curation diagnostic (hubs dominate neighbor lists; anti-hubs with
    k_occurrence = 0 are unreachable in retrieval).  Rides the shared
    block-cogroup edge build; the count agg is map-side combined
    (graph.hubness_scores)."""
    from vector_search_engine_spark.operators.graph import hubness_scores

    emb = load_table(spark, sf_dir, "embeddings")
    return hubness_scores(
        _knn_edges(spark, sf_dir), emb.select("vec_id")
    ).select(F.col("node").alias("vec_id"), "k_occurrence")


@register(
    "embeddings_mutual_knn",
    oracle=f"""
WITH {_KNN_GRAPH_HEAD}
SELECT a.src AS id_a, a.dst AS id_b
FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src
WHERE a.src < a.dst
""",
)
def embeddings_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual (reciprocal) kNN pairs of the exact k=5 kNN graph — the
    hub-resistant edge filter matching/entity-resolution pipelines
    build on.  One shuffle on the canonical pair key (the oracle's
    self-join form is the SQL spec; the Spark plan counts distinct
    directions per canonical pair instead — same set, half the edge
    shuffles)."""
    from vector_search_engine_spark.operators.graph import mutual_pairs

    return mutual_pairs(_knn_edges(spark, sf_dir))


@register(
    "embeddings_intrinsic_dim",
    oracle=f"""
WITH dmat AS (
  SELECT a.vec_id AS qid, b.vec_id AS nid,
         {_DD_L2SQ.format(a="a.embedding", b="b.embedding")} AS dist
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT qid, dist,
         row_number() OVER (PARTITION BY qid ORDER BY dist, nid) AS rn
  FROM dmat
),
two AS (
  SELECT qid,
         min(CASE WHEN rn = 1 THEN round(dist, 4) END) AS d1,
         min(CASE WHEN rn = 2 THEN round(dist, 4) END) AS d2
  FROM r WHERE rn <= 2 GROUP BY qid
)
SELECT count(*)::BIGINT AS n_points,
       count(CASE WHEN d1 > 0 THEN 1 END)::BIGINT AS n_used,
       count(CASE WHEN d1 <= 0 THEN 1 END)::BIGINT AS n_dup_dropped,
       round(count(CASE WHEN d1 > 0 THEN 1 END)
             / sum(CASE WHEN d1 > 0 THEN 0.5 * (ln(d2) - ln(d1)) END),
             4) AS intrinsic_dim
FROM two
""",
)
def embeddings_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate of the embedding space (Facco
    2017): MLE d = n / sum(ln(d2/d1)) over every point's two exact
    nearest neighbors — tells a curation pipeline how many of the
    ambient dims carry signal (quantizer/index budget planning).
    Exact 2-NN rides the block-cogroup kNN join; duplicate points
    (d1 = 0) excluded per the standard treatment and counted
    (knn.intrinsic_dim_twonn)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.intrinsic_dim_twonn(emb)


@register(
    "embeddings_hard_negatives",
    oracle=f"""
WITH dmat AS (
  SELECT a.vec_id AS qid, a.label AS qlabel, b.vec_id AS neighbor_id,
         b.label AS neighbor_label,
         {_DD_L2SQ.format(a="a.embedding", b="b.embedding")} AS dist
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
),
r AS (
  SELECT qid, qlabel, neighbor_id, neighbor_label, dist,
         row_number() OVER (
           PARTITION BY qid, (neighbor_label = qlabel)
           ORDER BY dist, neighbor_id) AS grp_rank
  FROM dmat
),
pos AS (
  SELECT qid, dist AS pos_radius FROM r
  WHERE neighbor_label = qlabel AND grp_rank = 3
)
SELECT r.qid, r.neighbor_id, r.neighbor_label,
       r.grp_rank::BIGINT AS "rank",
       round(r.dist, 4) AS dist_sq,
       round(p.pos_radius, 4) AS pos_radius_sq
FROM r JOIN pos p ON r.qid = p.qid
WHERE r.neighbor_label <> r.qlabel
  AND r.dist <= 4.0 * p.pos_radius
  AND r.grp_rank <= 5
""",
)
def embeddings_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining over the labeled embedding table: every
    vector anchors, negatives are the top-5 different-label neighbors
    within 4x the anchor's 3rd same-label squared distance
    (knn.hard_negatives — the contrastive-training curation op; one
    broadcast candidate pass + two windows on one (qid) shuffle)."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("query"),
        F.col("label").alias("qlabel"),
    )
    return knn_ops.hard_negatives(
        emb, anchors, k_pos=3, margin=4.0, k_neg=5
    )


@register(
    "embeddings_anisotropy",
    oracle=f"""
WITH n AS (
  SELECT vec_id, embedding,
         sqrt({_DD_DOT.format(a="embedding", b="embedding")}) AS nrm
  FROM embeddings
),
u AS (
  SELECT generate_subscripts(embedding, 1) AS dim_idx,
         CAST(unnest(embedding) AS DOUBLE) / nrm AS x
  FROM n
),
per_dim AS (SELECT dim_idx, sum(x) AS s FROM u GROUP BY dim_idx),
geom AS (SELECT sum(s * s) AS s2 FROM per_dim),
ns AS (
  SELECT count(*)::BIGINT AS n_vectors, avg(nrm) AS mean_norm,
         stddev_pop(nrm) AS std_norm
  FROM n
)
SELECT n_vectors, round(mean_norm, 6) AS mean_norm,
       round(std_norm, 6) AS std_norm,
       round((s2 - n_vectors) / (n_vectors * (n_vectors - 1.0)), 6)
         AS mean_pairwise_cosine,
       round(sqrt(s2) / n_vectors, 6) AS resultant_len
FROM ns, geom
""",
)
def embeddings_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact anisotropy diagnostic of the embedding space: mean pairwise
    cosine over all N(N-1) ordered pairs via the resultant-vector
    identity (no pair ever materialized), plus norm mean/std and the
    mean resultant length (knn.anisotropy_stats; one posexplode scan
    partial-aggregated to d per-dim sums)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.anisotropy_stats(emb)


@register(
    "embeddings_class_scatter",
    oracle="""
WITH u AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS dim_idx,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
per_ld AS (
  SELECT label, dim_idx, sum(x) AS s, sum(x * x) AS ss,
         count(*)::BIGINT AS n
  FROM u GROUP BY label, dim_idx
),
per_d AS (SELECT dim_idx, sum(s) / sum(n) AS gmu FROM per_ld GROUP BY dim_idx),
per_l AS (
  SELECT p.label, min(p.n) AS n_vectors, sum(p.ss) AS sumsq,
         sum((p.s / p.n) * (p.s / p.n)) AS mu_sq,
         sum((p.s / p.n - d.gmu) * (p.s / p.n - d.gmu)) AS between_sq
  FROM per_ld p JOIN per_d d USING (dim_idx)
  GROUP BY p.label
)
SELECT label, n_vectors,
       round(sumsq / n_vectors - mu_sq, 6) AS within_ms,
       round(between_sq, 6) AS between_sq,
       round(between_sq / (sumsq / n_vectors - mu_sq), 6) AS fisher_ratio
FROM per_l
""",
)
def embeddings_class_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class Fisher-style scatter report: exact within-class mean
    squared distance to centroid, between-class centroid displacement,
    and their ratio — the label-separability audit of embedding
    quality, one posexplode scan via the variance identity
    (knn.class_scatter)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.class_scatter(emb)


@register("embeddings_cluster_quality", oracle=knn_ops.CLUSTER_QUALITY_ORACLE)
def embeddings_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin cluster-quality report over the labeled embedding
    space: per-label mean-Euclidean scatter, the worst-separated
    neighbor label, and the DB component (s_i+s_j)/d_ij it attains —
    the merge-candidate audit complementing class_scatter's
    moment-identity Fisher ratios (knn.cluster_quality; one posexplode
    scan + broadcast centroid join, label-pair math only)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.cluster_quality(emb)


@register("embeddings_effective_rank", oracle=knn_ops.EFFECTIVE_RANK_ORACLE)
def embeddings_effective_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Participation-ratio effective rank of the embedding space —
    the dimensional-collapse diagnostic (tr(C)^2 / tr(C^2), no
    eigendecomposition): one mapInPandas Gram scan (d^2 partials per
    Arrow batch), an element-wise d^2-row reduce, one final aggregate
    (knn.effective_rank).  Resolves anisotropy into an actual dimension
    count: PR ~= d isotropic, PR << d collapsed."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.effective_rank(emb)


@register("embeddings_whitened_rank")  # eigh has no SQL twin -> rows-only
def embeddings_whitened_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCA whitening composed with the effective-rank diagnostic: the
    whitened space's participation ratio must sit at ~dim by
    construction (covariance -> identity), demonstrating the
    anisotropy fix end-to-end (knn.whiten -> knn.effective_rank; the
    ~=dim contract is pytest-pinned, the row grades rows+schema)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.effective_rank(knn_ops.whiten(emb))


@register(
    "embeddings_effective_rank_by_label",
    oracle=knn_ops.EFFECTIVE_RANK_BY_LABEL_ORACLE,
)
def embeddings_effective_rank_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label participation-ratio effective rank: each label slice's
    own covariance — the WHICH-slice-collapsed refinement of the
    corpus diagnostic (knn.effective_rank_by; one group key through
    the shared Gram reduce, (labels x d^2)-row algebra)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.effective_rank_by(emb, group_col="label")
