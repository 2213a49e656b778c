"""r8/r9 wave: prefix/BQ/cascade/graph tiers, lexical + hybrid retrieval, semantic dedup, engine metrics.

Registry family module - mechanically split from the monolithic
registry.py (r10 verdict item 4); registration order is preserved by
the import order in registry/__init__.py, so the grading window and
the sweep see an unchanged QUERIES/ORACLES surface."""

from __future__ import annotations

from vector_search_engine_spark.registry._base import *  # noqa: F401,F403
from vector_search_engine_spark.registry.streaming import _fresh_engine_root  # noqa: F401

# ---------------------------------------------------------------------------
# r8: exact prefix-bound search, lexical/hybrid retrieval, semantic dedup
# ---------------------------------------------------------------------------


@register("knn_truncated_rescore", oracle=ORACLES["knn_exact_l2"])
def knn_truncated_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 through the Matryoshka prefix-dimension bound cut
    (prefix L2 lower-bounds full L2, so the cut is provably lossless) —
    the FLOPs-side sibling of the SQ8/PQ byte-side tiers.  Same oracle as
    knn_exact_l2: the tier changes arithmetic done, never results."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_ops.knn_prefix_rescore(
        emb, knn_ops.make_queries(emb), k=10, prefix_dims=16
    )


@register("doc_bm25_topk", oracle=retrieval.BM25_TOPK_ORACLE)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 per fixture term-query — the lexical ranker of
    the hybrid-search surface (postings filtered to the broadcast query
    terms before the tf aggregation; stats are tiny broadcast aggs)."""
    docs = load_table(spark, sf_dir, "documents")
    return retrieval.bm25_topk(docs, retrieval.make_term_queries(spark), k=10)


@register("doc_bm25_topk_capped", oracle=retrieval.BM25_TOPK_CAPPED_ORACLE)
def doc_bm25_topk_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with the max_df_fraction common-term guard (classic stopword
    pruning): terms with df > 0.5·N are dropped BEFORE the postings
    aggregation, bounding the shuffle that otherwise degenerates to
    O(corpus) on stopword-common query terms (SCALING finding 11).  The
    fixture mixes the corpus's one rare term with common ones, so the
    guard visibly prunes and the ranking runs on the discriminative
    term — oracle mirrors the identical df <= fraction·N predicate."""
    docs = load_table(spark, sf_dir, "documents")
    return retrieval.bm25_topk(
        docs,
        retrieval.make_capped_term_queries(spark),
        k=10,
        max_df_fraction=retrieval.BM25_MAX_DF_FRACTION,
    )


@register("hybrid_search_rrf", oracle=retrieval.HYBRID_RRF_ORACLE)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical ranking fused with exact vector
    kNN by reciprocal-rank fusion (1/(60+rank), SIGIR'09) — doc_id and
    vec_id align in the fixture corpus, the production shape of a
    documents-plus-embeddings store."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    nq = len(retrieval.QUERY_TERMS_FIXTURE)
    lex = retrieval.bm25_topk(
        docs, retrieval.make_term_queries(spark), k=retrieval.HYBRID_DEPTH
    )
    vec = knn_ops.knn_exact(
        emb, knn_ops.make_queries(emb, n=nq), k=retrieval.HYBRID_DEPTH
    )
    return retrieval.hybrid_rrf(lex, vec, k=10)


@register("hybrid_search_combsum", oracle=retrieval.HYBRID_COMBSUM_ORACLE)
def hybrid_search_combsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval under CombSUM (Fox & Shaw, TREC-2): each list's
    scores min-max normalized per query within its top-depth window,
    then summed — the magnitude-preserving alternative to RRF, over the
    same two top-depth lists."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    nq = len(retrieval.QUERY_TERMS_FIXTURE)
    lex = retrieval.bm25_topk(
        docs, retrieval.make_term_queries(spark), k=retrieval.HYBRID_DEPTH
    )
    vec = knn_ops.knn_exact(
        emb, knn_ops.make_queries(emb, n=nq), k=retrieval.HYBRID_DEPTH
    )
    return retrieval.hybrid_combsum(lex, vec, k=10)


@register("ann_ivf_prefix", oracle=ORACLES["knn_exact_l2"])
def ann_ivf_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-dimension lossless cut composed inside IVF cells: probed
    partitions → prefix-distance bound cut → full-dim rescore of
    survivors only.  Exact at every nprobe (the cut is provably
    lossless); graded at full probe against the exact oracle.  FLOPs
    fall ~d/d' on the pruned share with zero extra storage — the
    compute-side rung of the tier ladder, riding the same partition
    pruning as SQ8/PQ/BQ."""
    from vector_search_engine_spark.operators import ivf as ivf_mod

    emb = load_table(spark, sf_dir, "embeddings")
    idx = ivf_mod.build_or_load(spark, sf_dir)
    return idx.search_prefix(
        knn_ops.make_queries(emb),
        k=10,
        nprobe=idx.meta["n_centroids"],
        prefix_dims=16,
    )


@register("ann_ivf_bq", oracle=ORACLES["knn_exact_l2"])
def ann_ivf_bq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQ composed inside IVF cells: probed partitions → packed sign-bit
    scan (generation-keyed sidecar, 32× fewer candidate bytes) →
    asymmetric top-C → exact rescore.  Graded at full probe with an
    unbounded candidate cut, where the output is hash-identical to exact
    (the correctness gate); the serving shape (finite C) is recall-gated
    in tests/test_bq.py — unlike SQ8/PQ, sign codes admit no lossless
    bound, so BQ's exactness claim is conditional and documented."""
    from vector_search_engine_spark.operators import ivf as ivf_mod

    emb = load_table(spark, sf_dir, "embeddings")
    idx = ivf_mod.build_or_load(spark, sf_dir)
    return idx.search_bq(
        knn_ops.make_queries(emb),
        k=10,
        nprobe=idx.meta["n_centroids"],
        candidates_per_cell=10**9,
    )


@register("ann_ivf_cascade", oracle=ORACLES["knn_exact_l2"])
def ann_ivf_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The staged serving tier: BQ sign-code candidates (32× scan cut) →
    lossless SQ8 bound cut over the survivors (4× cut, candidates only)
    → exact float rescore — the whole compression ladder composed into
    one search.  Graded at full probe with an unbounded stage-1 cut,
    where stage 2's lossless bound makes the output hash-identical to
    exact kNN by construction; the finite-C serving shape is
    recall-measured on SIFT1M (scripts/sift_scale.py)."""
    from vector_search_engine_spark.operators import ivf as ivf_mod

    emb = load_table(spark, sf_dir, "embeddings")
    idx = ivf_mod.build_or_load(spark, sf_dir)
    return idx.search_cascade(
        knn_ops.make_queries(emb),
        k=10,
        nprobe=idx.meta["n_centroids"],
        candidates_per_cell=10**9,
    )


@register("ann_ivf_cascade_filtered", oracle=ORACLES["knn_filtered"])
def ann_ivf_cascade_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered × cascade cell of the capability matrix: the metadata
    predicate applies BEFORE the stage-1 sign-code cut (column-pruned
    semi-join, same discipline as the other filtered tiers) and the
    SQ8 stage's lossless bound therefore ranks only qualified
    candidates; graded at full probe with an unbounded stage-1 cut,
    hash-identical to the exact filtered oracle."""
    from vector_search_engine_spark.operators import ivf as ivf_mod

    index = ivf_mod.build_or_load(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    return index.search_cascade(
        knn_ops.make_queries(emb),
        k=10,
        nprobe=index.meta["n_centroids"],
        candidates_per_cell=10**9,
        predicate=F.col("label") < 5,
    )


@register("ann_ivf_graph", oracle=ORACLES["knn_exact_l2"])
def ann_ivf_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GRAPH serving tier — the reference's actual search algorithm
    (Malkov–Yashunin HNSW: greedy upper-layer descent + level-0 beam,
    ``hnsw_index.h:223-262``) run per probed IVF cell from a
    generation-keyed graph sidecar (``IVFIndex.ensure_graph``), with an
    exact GEMM rescore of the beam's candidates.  Graded at full probe
    with an unbounded beam (``ef >= |cell|``), where every cell graph's
    connectivity-by-construction makes the walk provably exhaustive —
    hash-identical to exact kNN; finite ``ef`` is the recall/latency
    knob (pytest-gated, tests/test_hnsw.py; SIFT1M rung in
    scripts/sift_scale.py)."""
    from vector_search_engine_spark.operators import ivf as ivf_mod

    index = ivf_mod.build_or_load(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    return index.search_graph(
        knn_ops.make_queries(emb),
        k=10,
        nprobe=index.meta["n_centroids"],
        ef=10**9,
    )


@register("ann_ivf_graph_filtered", oracle=ORACLES["knn_filtered"])
def ann_ivf_graph_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered × graph cell of the capability matrix: the metadata
    predicate applies AFTER the per-cell beam (removing nodes before the
    walk would disconnect the graph) — with the graded exhaustive beam
    the post-filter is exact, hash-identical to the exact filtered
    oracle; at finite ``ef`` it is the standard post-filter recall
    trade, which is exactly why the pre/post-filter PLANNER
    (``search_filtered``) exists for selective predicates."""
    from vector_search_engine_spark.operators import ivf as ivf_mod

    index = ivf_mod.build_or_load(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    return index.search_graph(
        knn_ops.make_queries(emb),
        k=10,
        nprobe=index.meta["n_centroids"],
        ef=10**9,
        predicate=F.col("label") < 5,
    )


@register("knn_bq_rescore")  # 1-bit codes: recall is measured, not bounded — rows-only
def knn_bq_rescore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization tier: packed sign-bit scan (32× fewer scan
    bytes than float32), asymmetric q·sign(v) candidate ranking, exact
    float rescore — the extreme-compression point of the SQ8/PQ ladder.
    Recall is pytest-gated (tests/test_bq.py); every returned row carries
    the true exact distance."""
    emb = load_table(spark, sf_dir, "embeddings")
    from vector_search_engine_spark.operators import bq as bq_ops

    return bq_ops.knn_bq_rescore(
        emb, knn_ops.make_queries(emb), k=10, candidates_per_partition=160
    )


@register(
    "hybrid_search_rrf_weighted", oracle=retrieval.HYBRID_RRF_WEIGHTED_ORACLE
)
def hybrid_search_rrf_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reciprocal-rank fusion (w_lex=2, w_vec=1) — the
    modality-bias knob every hybrid API exposes, over the same two
    ranked lists as hybrid_search_rrf."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    nq = len(retrieval.QUERY_TERMS_FIXTURE)
    lex = retrieval.bm25_topk(
        docs, retrieval.make_term_queries(spark), k=retrieval.HYBRID_DEPTH
    )
    vec = knn_ops.knn_exact(
        emb, knn_ops.make_queries(emb, n=nq), k=retrieval.HYBRID_DEPTH
    )
    return retrieval.hybrid_rrf(
        lex, vec, k=10,
        w_lex=retrieval.HYBRID_W_LEX, w_vec=retrieval.HYBRID_W_VEC,
    )


@register("lineitem_column_profile", oracle=rel_ops.LINEITEM_PROFILE_ORACLE)
def lineitem_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling hygiene pass (count/nulls/distinct/min/max/mean
    per column in one aggregation + constant-width unpivot) over the
    lineitem measures — the first thing a pipeline runs on a new table."""
    return rel_ops.column_profile(
        load_table(spark, sf_dir, "lineitem"),
        ("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
    )


@register("doc_tfidf_vectors", oracle=retrieval.DOC_TFIDF_ORACLE)
def doc_tfidf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick TF-IDF document vectors in sparse row form — the
    model-free text→vector featurizer (md5 buckets, ln(1+N/df) weights,
    per-doc L2 norm); bit-identical across engines by construction."""
    return retrieval.doc_tfidf_vectors(load_table(spark, sf_dir, "documents"))


@register("hybrid_retrieval_eval", oracle=retrieval.RETRIEVAL_EVAL_ORACLE)
def hybrid_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-quality eval (precision/recall@10, MRR, NDCG@10 — TREC
    conventions) of the hybrid run against vector-exact top-10 qrels:
    the harness every retrieval deployment runs, as two bounded joins +
    one aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    nq = len(retrieval.QUERY_TERMS_FIXTURE)
    lex = retrieval.bm25_topk(
        docs, retrieval.make_term_queries(spark), k=retrieval.HYBRID_DEPTH
    )
    vec = knn_ops.knn_exact(
        emb, knn_ops.make_queries(emb, n=nq), k=retrieval.HYBRID_DEPTH
    )
    run = retrieval.hybrid_rrf(lex, vec, k=10)
    qrels = vec.filter(F.col("rank") <= 10).select(
        F.col("qid").alias("query_id"), F.col("neighbor_id").alias("doc_id")
    )
    return retrieval.retrieval_eval(run, qrels, k=10)


@register("hybrid_search_mmr", oracle=retrieval.MMR_ORACLE)
def hybrid_search_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification over the hybrid shortlist (SIGIR'98): the
    standard near-duplicate-suppression pass a retrieval API runs after
    fusion.  Oracle mode since r14: the greedy argmax walk rounds its
    selection value to 6 decimals each step (the hybrid_rrf rounded-
    ranking discipline), so the DuckDB twin replays it exactly as a
    k-step unrolled CTE chain (retrieval._mmr_oracle — the PageRank
    unroll precedent); the from-scratch NumPy reference in
    tests/test_retrieval.py stays on top."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    nq = len(retrieval.QUERY_TERMS_FIXTURE)
    lex = retrieval.bm25_topk(
        docs, retrieval.make_term_queries(spark), k=retrieval.HYBRID_DEPTH
    )
    vec = knn_ops.knn_exact(
        emb, knn_ops.make_queries(emb, n=nq), k=retrieval.HYBRID_DEPTH
    )
    fused = retrieval.hybrid_rrf(lex, vec, k=retrieval.HYBRID_DEPTH)
    return retrieval.mmr_diversify(fused, emb, k=10, lam=0.7)


@register("dedup_semantic", oracle=dedup_ops.SEMANTIC_DEDUP_ORACLE)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic deduplication: within-cluster cosine near-dups
    dropped to a lowest-id representative, per-cluster GEMM — pairs never
    materialize as rows.  Fixture clusters = the label column; at scale
    the IVF cell id plays that role."""
    return dedup_ops.semantic_dedup(load_table(spark, sf_dir, "embeddings"))


@register("multimodal_frame_dedup")  # embedding stub is non-SQL — rows-only
def multimodal_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-media frame-level near-dup: frame sampling → per-frame
    embedding (stubbed encoder, real Arrow plumbing) → the SAME
    random-hyperplane LSH pair machinery as text embeddings.  Five media
    payloads are replayed under shifted ids, so their frames MUST pair
    with the originals at cosine ≈ 1 (pytest pins exactness; rows here)."""
    from vector_search_engine_spark.multimodal import (
        attach_payload,
        frame_embeddings,
        frame_sample,
    )

    media = attach_payload(load_table(spark, sf_dir, "documents"))
    dup = media.filter(F.col("doc_id") < 5).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    frames = frame_sample(media.unionByName(dup))
    fe = frame_embeddings(frames)
    return dedup_ops.embedding_lsh_pairs(
        fe,
        threshold=0.999,
        n_tables=8,
        n_planes=4,
        id_col="frame_id",
        vec_col="embedding",
    )


@register("streaming_engine_metrics")  # driver-side latency sink — rows-only
def streaming_engine_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 metrics sink (reference bvar LatencyRecorder, server.cpp):
    exercise insert + search + compact on a small engine and return the
    per-op count/avg/p50/p99/p999 latency table.

    Lifecycle sized for signal-per-second (r16 verdict task 5: this was
    the sweep's single most expensive row at 53.9 s): every phase the
    sink must record — insert, search, compact — still runs, but on 4
    cells with 2 searches and a 50-row delta; the full-scale LSM
    lifecycle is measured where scale is the point (bench.py mixed_rw,
    MIXED_RW_SF1.json), not in a correctness row."""
    from vector_search_engine_spark.streaming.engine import VectorEngine

    emb = load_table(spark, sf_dir, "embeddings")
    eng = VectorEngine.create(
        emb.filter(F.col("vec_id") < 450), _fresh_engine_root(), n_centroids=4
    )
    eng.insert(emb.filter(F.col("vec_id") >= 450))
    q = knn_ops.make_queries(emb)
    for _ in range(2):
        eng.search_timed(q, k=10, nprobe=eng.index.meta["n_centroids"])
    eng.compact()
    return eng.metrics()


@register("corpus_frequent_ngrams", oracle=txt_ops.FREQUENT_NGRAMS_ORACLE)
def corpus_frequent_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent 3-gram mining (boilerplate / repeated-template
    detection): Misra–Gries bounded-memory candidate pass + broadcast-
    verified exact recount (operators/text_ops.frequent_ngrams).  The
    sketch is candidate-generation ONLY — the recount makes the result
    match the plain group-count oracle exactly."""
    return txt_ops.frequent_ngrams(load_table(spark, sf_dir, "documents"))


# kNN-graph PageRank: fixed iteration count + damping pinned here so the
# Spark plan and the unrolled-CTE oracle can never drift apart.


@register("ann_ivf_prefix_pca", oracle=ORACLES["knn_exact_l2"])
def ann_ivf_prefix_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-bound cut in the PCA-rotated basis (r11): the fix for the
    plain prefix tier's flat-spectrum degenerate regime (SCALING finding
    11 — survivor fraction 1.0 on isotropic data).  Rotation preserves
    L2 so the bound stays provably lossless; float32 sidecar storage is
    absorbed by a per-row norm-scaled error budget (the SQ8 discipline);
    survivors rescore on the ORIGINAL floats.  Exact at every nprobe;
    graded at full probe against the exact oracle."""
    from vector_search_engine_spark.operators import ivf as ivf_mod

    emb = load_table(spark, sf_dir, "embeddings")
    idx = ivf_mod.build_or_load(spark, sf_dir)
    return idx.search_prefix_pca(
        knn_ops.make_queries(emb),
        k=10,
        nprobe=idx.meta["n_centroids"],
        prefix_dims=16,
    )


@register("doc_tfidf_knn", oracle=retrieval.DOC_TFIDF_KNN_ORACLE)
def doc_tfidf_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free document similarity search: top-5 neighbors per doc
    by cosine over the hashed TF-IDF vectors (inverted-index bucket
    join, rounded-weight dot products so both engines rank identical
    bits; retrieval.doc_tfidf_knn) — the text-to-vector bridge's
    retrieval consumer."""
    return retrieval.doc_tfidf_knn(load_table(spark, sf_dir, "documents"))
