#!/usr/bin/env python3
"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect).  Headline set mirrors the reference's benchmarks
(BASELINE.md M1-M5): bulk exact search (read-only bench), ANN search,
index build, plus the heaviest relational/dedup operators.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline workloads mirroring BASELINE.md M1-M5 plus the heaviest
# relational / dedup / event operators:
#   ivf_build                 -> M1 batch index build (fresh dir every run)
#   knn_exact_* / ann_ivf_*   -> M2/M3 bulk search (exact + ANN)
#   streaming_merged_search   -> M4/M5 merged indexed+delta search
BENCH_QUERIES = [
    "ivf_build",
    "knn_exact_l2",
    "knn_exact_l2_sql",
    "knn_exact_cosine",
    "knn_self_similarity_pairs",
    "ann_ivf_probe",
    "ann_ivf_pq_serving",
    "streaming_merged_search",
    "tpch_pricing_summary",
    "tpch_regional_revenue",
    "events_sessionize",
    "events_asof_attribution",
    "doc_fingerprints",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    # r8 surface: lexical + hybrid retrieval and semantic dedup
    "doc_bm25_topk",
    "hybrid_search_rrf",
    "dedup_semantic",
    # r8 third wave: SQ4 serving rung and multi-vector retrieval
    "ann_ivf_sq4",
    "knn_maxsim",
    # r9: staged BQ→SQ8→float serving and the df-capped BM25 guard.
    # NOTE: at sf0.1 the fixture's query terms all sit BELOW the df cap,
    # so doc_bm25_topk_capped measures overhead PARITY with the uncapped
    # row (expect ~equal walls, not a speedup); the guard's win — 38.9 s
    # → 2.9 s on a 100k common-term corpus — is pinned in SCALING.md
    # finding 13 / scripts/scale_stress.py (bm25_topk vs bm25_topk_capped).
    "ann_ivf_cascade",
    "doc_bm25_topk_capped",
    # r10: the per-cell HNSW walk tier (the reference's own algorithm) at
    # its graded exhaustive configuration — ensure_graph build cost is
    # charged to the first call like the other sidecar rows
    "ann_ivf_graph",
    # r10 second wave: bounded-shuffle frequent-ngram mining and the
    # kNN-graph PageRank composition (8 power iterations, per-iteration
    # lineage cuts — wall is dominated by fixed per-job overhead at this
    # sf, not data volume; the 100k composition is SCALING finding 18)
    "corpus_frequent_ngrams",
    "embeddings_knn_pagerank",
    # r10 third wave: the epsilon-graph family — DBSCAN composes the
    # block-GEMM radius self-join, the min_pts density gate, and
    # connected components over core-core edges in one row
    "embeddings_dbscan",
    # r10 fourth wave: kNN-graph triangle structure (degree-oriented
    # compact-forward) and the per-source unigram KL-drift diagnostic
    "embeddings_knn_triangles",
    "corpus_source_kl",
    # r11: the cross-source contamination matrix (distinct shingle
    # postings + shingle-keyed self-join) and the real-codec multimodal
    # decode plan (PPM encode → sniff → parse → features, all
    # mapInPandas; measures the binary-column Arrow round-trip)
    "corpus_source_overlap",
    "multimodal_real_decode",
    # r13: the merged Q4 contract on the bulk-query path (engine built
    # per call — ingest + distributed sq8 serve in one row), the
    # cluster-keyed leakage-safe split (near-dup CC + salted bucketing),
    # and the greedy k-center diversity coreset (8 scan+TakeOrdered(1)
    # rounds — per-job overhead dominated at this sf)
    "streaming_search_sq8_distributed",
    "corpus_split_leakage_safe",
    "embeddings_kcenter_coreset",
    # r14: hard-negative mining (one broadcast candidate pass + two
    # windows on a single (qid) shuffle, dataset-sized anchor set), the
    # cross-table curation pipeline (quality gate ∘ embedding near-dup
    # CC, doc-level), and the per-source Zipf rank-frequency fit
    # (vocabulary-bounded aggregation + top-200 OLS)
    "embeddings_hard_negatives",
    "pipeline_embedding_curation",
    "corpus_zipf_fit",
    # r14 third wave: DSIR importance resampling (hashed-feature models
    # + Gumbel-top-k — one pinned corpus scan, broadcast scoring join)
    # and the asymmetric containment dedup (single-scan inverted index,
    # unblocked on length by design)
    "corpus_dsir_sample",
    "dedup_containment",
    "embeddings_effective_rank",
    # r15: the composed text-side curation pipeline — dedup CC ∘
    # keep-best ∘ cluster-keyed split ∘ token-budget sample ∘ curriculum
    # order in ONE plan (the north-star workload end-to-end; the CC pair
    # stage is the same machinery corpus_split_leakage_safe already
    # times, so the delta over that row is the composition's own cost)
    "pipeline_text_curation",
]


def _setup_merged_search(spark, sf_dir: str):
    """M4/M5 analog: returns a timed callable doing INGEST + MERGED SEARCH
    against an engine built here, untimed (index build is M1's metric,
    measured separately as ivf_build)."""
    import tempfile

    from pyspark.sql import functions as F

    from vector_search_engine_spark.operators import knn as knn_ops
    from vector_search_engine_spark.streaming.engine import VectorEngine

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    eng = VectorEngine.create(
        emb.filter(F.col("vec_id") < 400),
        tempfile.mkdtemp(prefix="vse_bench_eng_"),
        n_centroids=8,
    )
    # queries live in client RAM across searches (reference serving shape,
    # recall_bench.cpp:67) — collected once in untimed setup
    q = knn_ops._query_arrays(knn_ops.make_queries(emb))

    def timed(spark_, sf_dir_):
        eng.insert(emb.filter(F.col("vec_id") >= 400))
        return eng.search(q, k=10, nprobe=eng.index.meta["n_centroids"])

    return timed


def _bench_mixed_rw(spark, sf_dir: str) -> dict:
    """Mixed read/write serving bench (reference M4-M6,
    client_bench.cpp:39-49,135-160): merged searches issued CONCURRENTLY
    with a streaming ingest that triggers W3 compactions mid-run, plus a
    mid-ingest tombstone-delete wave and a post-ingest PQ-tier serving
    phase.  Emits search/insert/delete throughput and p50/p99 latency —
    the reference's isolation-under-load measurement, which single-query
    wall times can't capture.  Recall is measured against the SURVIVOR
    universe (final rows minus deleted ids): early searches may return
    not-yet-deleted ids and score below 1.0; the final search must hit
    1.0 exactly by the merged-search + tombstone contract."""
    import shutil
    import tempfile

    import numpy as np
    from pyspark.sql import functions as F

    from vector_search_engine_spark.operators import knn as knn_ops
    from vector_search_engine_spark.streaming.engine import VectorEngine

    root = tempfile.mkdtemp(prefix="vse_bench_mixed_")
    # r14 (verdict task 1): every phase is wall-stamped and every raw
    # latency list is exported under "raw" in BENCH_DETAILS.json — the
    # queries_runs discipline extended to the serving phase, so a
    # cross-round drift in any mixed_rw aggregate can be adjudicated
    # (noise vs regression, and WHICH phase moved) from committed data.
    ph_t0 = time.time()
    phase_walls: dict[str, float] = {}

    def _phase(name: str) -> None:
        nonlocal ph_t0
        now = time.time()
        phase_walls[name] = round(now - ph_t0, 3)
        ph_t0 = now

    try:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        ids = emb.select(F.expr("percentile(vec_id, 0.8)").alias("c")).collect()
        cut = int(ids[0]["c"])
        eng = VectorEngine.create(
            emb.filter(F.col("vec_id") < cut),
            os.path.join(root, "engine"),
            n_centroids=8,
        )
        stage = os.path.join(root, "stage")
        emb.filter(F.col("vec_id") >= cut).select(
            "vec_id", "embedding"
        ).repartition(6).write.mode("overwrite").parquet(stage)
        # client-RAM query set (reference M4 serving shape): collect once,
        # search many — no per-search collect job
        q = knn_ops._query_arrays(knn_ops.make_queries(emb))
        nprobe = eng.index.meta["n_centroids"]
        # tombstone wave: delete a deterministic slice of INDEXED ids
        # mid-ingest (disjoint from the ingested id range, so a racing
        # insert batch sharing a _seq can never contend on an id)
        del_ids = [
            int(r["vec_id"])
            for r in emb.filter(
                (F.col("vec_id") < cut) & (F.col("vec_id") % 17 == 3)
            )
            .select("vec_id")
            .orderBy("vec_id")
            .limit(60)
            .collect()
        ]
        del_batches = [del_ids[i::3] for i in range(3)]
        # ground truth over the FINAL SURVIVOR universe (reference M5
        # measures recall against full GT while inserts land): concurrent
        # searches climb toward 1.0 as the delta fills and tombstones land
        survivors = emb.filter(~F.col("vec_id").isin(del_ids))
        gt = {
            r["qid"]: set(r["ids"])
            for r in knn_ops.knn_exact(survivors, q, k=10)
            .groupBy("qid")
            .agg(F.collect_set("neighbor_id").alias("ids"))
            .collect()
        }
        recalls = []

        def one_search(tier: str = "float") -> float:
            s0 = time.time()
            res = eng.search(q, k=10, nprobe=nprobe, tier=tier).collect()
            dt = time.time() - s0
            eng.recorder.record("search", dt)
            got: dict = {}
            for r in res:
                got.setdefault(r["qid"], set()).add(r["neighbor_id"])
            recalls.append(
                sum(len(got.get(k_, set()) & v) for k_, v in gt.items())
                / sum(len(v) for v in gt.values())
            )
            return dt

        _phase("setup")
        stream = (
            spark.readStream.schema("vec_id long, embedding array<float>")
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        t0 = time.time()
        qh = eng.ingest_stream(stream, max_delta_fraction=0.1)
        latencies = []
        # searches overlap the micro-batch ingest + compactions; the
        # streaming query runs its own jobs on the shared scheduler.
        # One tombstone batch lands after each of the first 3 searches
        # (the M4 shape with the write mix the reference lacks: deletes).
        while qh.isActive and len(latencies) < 40:
            latencies.append(one_search())
            if len(latencies) <= len(del_batches):
                eng.delete(del_batches[len(latencies) - 1])
        qh.awaitTermination(300)
        ingest_wall = time.time() - t0
        _phase("ingest_with_concurrent_searches")
        concurrent_searches = len(latencies)
        for b in del_batches[len(latencies):]:  # if ingest beat the searches
            eng.delete(b)
        while len(latencies) < 12:  # floor the percentile sample size
            latencies.append(one_search())
        _phase("float_floor_searches")
        rows_ingested = n - emb.filter(F.col("vec_id") < cut).count()
        lat_ms = np.sort(np.array(latencies) * 1000.0)
        # Snapshot float-tier recalls BEFORE the PQ phase: one_search
        # appends into the shared recalls list, so recall_at_10_mean/final
        # must be computed from this snapshot or they'd silently mix
        # float- and PQ-tier searches.
        float_recalls = list(recalls)
        _phase("survivor_gt_and_bookkeeping")
        # PQ serving tier over the same engine state: first call builds
        # the generation-keyed sidecar (reported separately), then warm
        # ADC-scan searches — same survivor recall contract at full probe
        pq_build0 = time.time()
        pq_latencies = [one_search(tier="pq")]
        pq_build_sec = time.time() - pq_build0
        for _ in range(4):
            pq_latencies.append(one_search(tier="pq"))
        pq_recalls = recalls[len(float_recalls):]
        pq_ms = np.sort(np.array(pq_latencies[1:]) * 1000.0)
        _phase("pq_phase")
        # BQ serving tier (r8): first call builds the sign-code sidecar;
        # recall vs survivors is a measured property at this C (no
        # lossless bound for sign codes), reported separately
        n_before_bq = len(recalls)
        bq_build0 = time.time()
        bq_latencies = [one_search(tier="bq")]
        bq_build_sec = time.time() - bq_build0
        for _ in range(4):
            bq_latencies.append(one_search(tier="bq"))
        bq_recalls = recalls[n_before_bq:]
        bq_ms = np.sort(np.array(bq_latencies[1:]) * 1000.0)
        _phase("bq_phase")
        # cascade serving tier (r9): BQ candidates → lossless SQ8 bound
        # cut → float rescore, reusing the sidecars the BQ phase built
        # plus a fresh SQ8 one on the first call
        n_before_casc = len(recalls)
        casc_build0 = time.time()
        casc_latencies = [one_search(tier="cascade")]
        casc_build_sec = time.time() - casc_build0
        for _ in range(4):
            casc_latencies.append(one_search(tier="cascade"))
        casc_recalls = recalls[n_before_casc:]
        casc_ms = np.sort(np.array(casc_latencies[1:]) * 1000.0)
        _phase("cascade_phase")
        # graph serving tier (r10): per-cell HNSW walk at the default
        # beam (ef=64 via candidates_per_cell); first call builds the
        # generation-keyed graph sidecar (reported separately).  Finite
        # beam → recall is a measured property like BQ's.
        n_before_graph = len(recalls)
        graph_build0 = time.time()
        graph_latencies = [one_search(tier="graph")]
        graph_build_sec = time.time() - graph_build0
        for _ in range(4):
            graph_latencies.append(one_search(tier="graph"))
        graph_recalls = recalls[n_before_graph:]
        graph_ms = np.sort(np.array(graph_latencies[1:]) * 1000.0)
        _phase("graph_phase")
        # radius serving phase (r10): the merged RANGE search over the
        # same post-ingest post-delete engine state — the workload class
        # that exposed the delta-GC race this round (plan-time listing vs
        # rmtree).  Exactness is a SET equality against brute radius over
        # the survivor universe, not a recall: range search has no k to
        # be approximate about.
        rad_expected = {
            (r["qid"], r["neighbor_id"])
            for r in knn_ops.radius_search(survivors, q, 1.5).collect()
        }
        rad_latencies = []
        rad_exact = True
        for _ in range(5):
            s0 = time.time()
            rad_rows = eng.radius_search(q, 1.5).collect()
            rad_latencies.append(time.time() - s0)
            rad_exact = rad_exact and (
                {(r["qid"], r["neighbor_id"]) for r in rad_rows}
                == rad_expected
            )
        rad_ms = np.sort(np.array(rad_latencies) * 1000.0)
        _phase("radius_phase")
        # per-op percentiles from the engine's own S6 metrics sink
        ops = {m["op"]: m for m in eng.recorder.snapshot()}
        ins = ops.get("insert", {})
        dels = ops.get("delete", {})
        return {
            "rows_ingested": int(rows_ingested),
            "ingest_wall_sec": round(ingest_wall, 3),
            "insert_rows_per_sec": round(rows_ingested / ingest_wall, 1),
            "insert_batches": ins.get("count", 0),
            "insert_p50_ms": ins.get("p50_ms"),
            "insert_p99_ms": ins.get("p99_ms"),
            "rows_deleted": len(del_ids),
            "delete_batches": dels.get("count", 0),
            "delete_p50_ms": dels.get("p50_ms"),
            "delete_p99_ms": dels.get("p99_ms"),
            "compactions": ops.get("compact", {}).get("count", 0),
            "n_searches": len(latencies),
            "n_searches_during_ingest": concurrent_searches,
            "search_qps": round(len(latencies) / float(np.sum(lat_ms) / 1000.0), 3),
            "search_p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "search_p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
            "search_pq_build_sec": round(pq_build_sec, 3),
            "search_pq_p50_ms": round(float(np.percentile(pq_ms, 50)), 1),
            "search_pq_p99_ms": round(float(np.percentile(pq_ms, 99)), 1),
            "search_pq_recall_at_10": round(float(np.mean(pq_recalls)), 4),
            "search_bq_build_sec": round(bq_build_sec, 3),
            "search_bq_p50_ms": round(float(np.percentile(bq_ms, 50)), 1),
            "search_bq_p99_ms": round(float(np.percentile(bq_ms, 99)), 1),
            "search_bq_recall_at_10": round(float(np.mean(bq_recalls)), 4),
            "search_cascade_build_sec": round(casc_build_sec, 3),
            "search_cascade_p50_ms": round(float(np.percentile(casc_ms, 50)), 1),
            "search_cascade_p99_ms": round(float(np.percentile(casc_ms, 99)), 1),
            "search_cascade_recall_at_10": round(
                float(np.mean(casc_recalls)), 4
            ),
            "search_graph_build_sec": round(graph_build_sec, 3),
            "search_graph_p50_ms": round(float(np.percentile(graph_ms, 50)), 1),
            "search_graph_p99_ms": round(float(np.percentile(graph_ms, 99)), 1),
            "search_graph_recall_at_10": round(
                float(np.mean(graph_recalls)), 4
            ),
            "search_radius_p50_ms": round(float(np.percentile(rad_ms, 50)), 1),
            "search_radius_p99_ms": round(float(np.percentile(rad_ms, 99)), 1),
            "search_radius_hits": len(rad_expected),
            "search_radius_exact": bool(rad_exact),
            "recall_at_10_mean": round(float(np.mean(float_recalls)), 4),
            "recall_at_10_final": round(float(float_recalls[-1]), 4),
            # raw per-run data (r14): aggregates above derive from these
            "raw": {
                "phase_walls_sec": phase_walls,
                "float_search_sec": [round(x, 3) for x in latencies],
                "pq_search_sec": [round(x, 3) for x in pq_latencies],
                "bq_search_sec": [round(x, 3) for x in bq_latencies],
                "cascade_search_sec": [round(x, 3) for x in casc_latencies],
                "graph_search_sec": [round(x, 3) for x in graph_latencies],
                "radius_search_sec": [round(x, 3) for x in rad_latencies],
                "recall_trajectory": [round(r, 4) for r in recalls],
            },
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _bench_ivf_build(spark, sf_dir: str):
    """Fresh KMeans IVF build (reference M1 bulk load) — never cache-hit."""
    import shutil
    import tempfile

    from vector_search_engine_spark.operators.ivf import IVFIndex

    out = tempfile.mkdtemp(prefix="vse_bench_ivf_")
    try:
        vectors = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        idx = IVFIndex.build(vectors, f"{out}/index")
        rows = idx.stats().collect()  # force the whole build + readback
        return spark.createDataFrame(rows, "centroid_id int, n_vectors long")
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _bench_mixed_rw_sf1(spark) -> dict:
    """The finding-41 sf1 serving rung as a first-class bench mode (r15
    verdict task 9): ``_bench_mixed_rw`` VERBATIM on a synthesized
    20k × 64d 16-cluster corpus — 10× bench sf0.1 and the clustered
    geometry that exposed the sign-tier stage-1 budget collapse.  Same
    JSON schema as ``mixed_rw`` (it IS the same function on a bigger
    corpus), so every aggregate stays column-for-column comparable with
    the BENCH_DETAILS.json history.  Run via ``bench.py --mixed-sf1``."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n, dim, n_clusters = 20_000, 64, 16
    rng = np.random.default_rng(41)
    centers = rng.normal(0, 6.0, (n_clusters, dim))
    which = rng.integers(0, n_clusters, n)
    W = (centers[which] + rng.normal(0, 0.25, (n, dim))).astype(np.float32)
    root = tempfile.mkdtemp(prefix="vse_mixed_sf1_")
    try:
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array(
                        list(W), type=pa.list_(pa.float32())
                    ),
                }
            ),
            f"{root}/embeddings.parquet",
        )
        t0 = time.time()
        res = _bench_mixed_rw(spark, root)
        res["total_wall_sec"] = round(time.time() - t0, 2)
        res["n_vectors"] = n
        return res
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from vector_search_engine_spark import registry
    from vector_search_engine_spark.session import get_spark

    spark = get_spark("vse-bench")

    # --mixed-sf1: run ONLY the finding-41 sf1 serving rung and write
    # the artifact from json.dump (r15 verdict task 4: rung JSONs must
    # be machine-readable — tee'd stdout interleaves JVM GC warnings).
    if "--mixed-sf1" in sys.argv:
        res = _bench_mixed_rw_sf1(spark)
        out = {
            "metric": "mixed_rw_sf1_wall",
            "value": res.get("total_wall_sec"),
            "unit": "sec",
            "results": {"mixed_rw_sf1": res},
            "sf": 1.0,
        }
        out_path = "MIXED_RW_SF1.json"
        if "--out" in sys.argv:
            out_path = sys.argv[sys.argv.index("--out") + 1]
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out, separators=(",", ":")))
        return

    # --mixed-only: run ONLY the sf-dir mixed_rw serving section —
    # the finding-29 adjudication tool (N clean same-HEAD runs with
    # raw per-search lists, no headline-query noise in between).
    if "--mixed-only" in sys.argv:
        n_runs = 1
        if "--runs" in sys.argv:
            n_runs = int(sys.argv[sys.argv.index("--runs") + 1])
        runs_out = []
        for _ in range(n_runs):
            t0 = time.time()
            r = _bench_mixed_rw(spark, sf_dir)
            r["total_wall_sec"] = round(time.time() - t0, 2)
            runs_out.append(r)
        out = {"metric": "mixed_rw_only", "runs": runs_out, "sf": sf}
        if "--out" in sys.argv:
            with open(sys.argv[sys.argv.index("--out") + 1], "w") as f:
                json.dump(out, f, indent=1)
        print(json.dumps(out, separators=(",", ":")))
        return

    # Warm the JVM/Arrow paths so per-query numbers measure the engine,
    # not classloading (reference benches also exclude setup), and warm the
    # IVF cache so ann_ivf_probe times the probe, not the build (the build
    # is measured separately as ivf_build).  Warmup failures are non-fatal:
    # a cold first query inflates one number; a crashed bench loses all.
    try:
        registry.QUERIES["knn_exact_l2"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        from vector_search_engine_spark.operators import ivf as _ivf

        _ivf.build_or_load(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        print(f"warmup failed (continuing): {exc!r}", file=sys.stderr)

    # Two timed runs per query, keep the min: steady-state throughput with
    # plan-compilation and GC noise excluded (the reference's benches also
    # measure warm in-memory serving, recall_bench.cpp:67-106).
    # name -> per-run untimed setup returning the timed callable
    special_setup = {
        "ivf_build": lambda spark, sf: (lambda s, d: _bench_ivf_build(s, d)),
        "streaming_merged_search": _setup_merged_search,
    }

    # Failure isolation: one red query must never zero out the whole
    # performance record — it gets `null` + an entry in "errors" and the
    # run continues (round-4 lesson: a single AnalysisException made the
    # entire bench rc=1 with no numbers at all).
    timings: dict[str, float | None] = {}
    runs: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for name in BENCH_QUERIES:
        setup = special_setup.get(name)
        if setup is None and registry.QUERIES.get(name) is None:
            continue
        runs[name] = []
        try:
            for _ in range(2):
                spark.catalog.clearCache()
                fn = setup(spark, sf_dir) if setup else registry.QUERIES[name]
                t0 = time.time()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs[name].append(round(time.time() - t0, 3))
            timings[name] = min(runs[name])
        except Exception as exc:  # noqa: BLE001
            timings[name] = None
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench query {name} failed: {exc!r}", file=sys.stderr)

    try:
        mixed = _bench_mixed_rw(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        mixed = {"error": f"{type(exc).__name__}: {exc}"[:500]}
        print(f"mixed_rw bench failed: {exc!r}", file=sys.stderr)

    # A partial total (some queries red) must never masquerade as a full
    # one in cross-round comparisons: value goes null when any query
    # failed, with the sum of the surviving queries under value_partial.
    total = round(sum(v for v in timings.values() if v is not None), 3)
    out = {
        "metric": "headline_queries_total",
        "value": None if errors else total,
        "unit": "sec",
        "queries": timings,
        "mixed_rw": mixed,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
        out["value_partial"] = total
    # The verbose artifact (all raw run timings — min is what "queries"
    # reports — so cross-round drift can be adjudicated as noise vs
    # regression; full mixed_rw including per-search lists) goes to a
    # FILE; stdout's LAST line is a COMPACT headline sized to survive
    # the driver's 2,000-char tail-capture window (r16 verdict task 2:
    # the old full line front-truncated every round → "parsed": null in
    # BENCH_r{N}.json).  Compact = per-query mins rounded to 2 decimals
    # + a scalar subset of mixed_rw — measured ~1.5 KB at 40 queries.
    try:
        details_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAILS.json"
        )
        with open(details_path, "w") as f:
            json.dump({**out, "queries_runs": runs}, f, indent=1)
    except Exception as exc:  # noqa: BLE001
        print(f"bench details write failed: {exc!r}", file=sys.stderr)
    mix_keys = (
        "search_qps", "search_p50_ms", "search_p99_ms",
        "search_cascade_p50_ms", "search_bq_recall_at_10",
        "search_cascade_recall_at_10", "recall_at_10_mean",
        "recall_at_10_final", "compactions", "search_radius_exact",
        "insert_rows_per_sec", "error",
    )
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": "sec",
        "queries": {
            k: (round(v, 2) if v is not None else None)
            for k, v in timings.items()
        },
        "mixed_rw": {k: mixed[k] for k in mix_keys if k in mixed},
        "sf": sf,
        "details": "BENCH_DETAILS.json",
    }
    if errors:
        compact["errors_n"] = len(errors)
        compact["value_partial"] = total
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
