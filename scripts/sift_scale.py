#!/usr/bin/env python3
"""SIFT1M-shape end-to-end run: the reference's own workload scale.

The reference engine's M1-M3 story is SIFT1M — 1,000,000 x 128-dim
float32 descriptors loaded from .fvecs fixtures (server.cpp:75,
benchmark/recall_bench.cpp:15-23).  The graded sf corpora top out at
2,000 x 64-dim, so this script pins the missing scale point:

  1. generate a deterministic SIFT-like corpus (1M x 128 float32,
     cluster-structured like image descriptors: seeded centers + noise,
     clipped to the 0..255 descriptor range) and write it as a raw
     .fvecs file — the reference's on-disk format;
  2. scan it back through scan_fvecs (S1 at ~516 MB);
  3. exact brute-force top-100 for 1,000 queries via knn_exact — the
     M1 analog AND the ground truth;
  4. IVFIndex.build over the million vectors — the M2 analog;
  5. probe at an nprobe ladder, recall@10 vs the exact ground truth —
     the M3 analog (recall_bench.cpp:67-106 sweeps ef_search the same
     way).

Prints one JSON line; the committed copy lives in SIFT1M.json and the
narrative in SCALING.md.  Runtime ~4-6 min on local[32].

Usage:
    python scripts/sift_scale.py [--n 1000000] [--out SIFT1M.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from vector_search_engine_spark.operators import knn as knn_ops
from vector_search_engine_spark.operators.ivf import IVFIndex
from vector_search_engine_spark.session import get_spark
from vector_search_engine_spark.sources.fvecs import scan_fvecs

DIM = 128
N_CENTERS = 1024  # latent cluster structure, like real image descriptors
# Sigma tuned so clusters OVERLAP (noise diameter ~ inter-center distance):
# at 24 the cells were separable enough that nprobe=1 scored recall 0.999,
# which exercises nothing; at 75 true neighbors regularly straddle cell
# boundaries — the regime the nprobe ladder exists for (and closer to real
# SIFT, where coarse cells always overlap).
NOISE_SIGMA = 75.0
NQ = 1000
K = 10
GT_K = 100
NPROBE_LADDER = (1, 2, 4, 8, 16, 32)
TARGET_RECALL = 0.9


def gen_fvecs(path: str, n: int, seed: int = 7) -> np.ndarray:
    """Write a SIFT-like .fvecs file driver-side; returns the query block."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0.0, 255.0, (N_CENTERS, DIM)).astype(np.float32)
    dim_le = np.array([DIM], dtype="<i4").tobytes()
    chunk = 100_000
    queries = None
    with open(path, "wb") as f:
        for lo in range(0, n, chunk):
            m = min(chunk, n - lo)
            assign = rng.integers(0, N_CENTERS, m)
            block = centers[assign] + rng.normal(0, NOISE_SIGMA, (m, DIM))
            block = np.clip(block, 0.0, 255.0).astype("<f4")
            if queries is None:
                # queries drawn from the same distribution, NOT copied rows
                qassign = rng.integers(0, N_CENTERS, NQ)
                queries = np.clip(
                    centers[qassign] + rng.normal(0, NOISE_SIGMA, (NQ, DIM)),
                    0.0,
                    255.0,
                ).astype(np.float32)
            rec = np.empty((m, DIM + 1), dtype="<f4")
            rec[:, 0:1] = np.frombuffer(dim_le, dtype="<f4")
            rec[:, 1:] = block
            f.write(rec.tobytes())
    return queries


STREAM_BASE = 180_000
STREAM_TAIL = 20_000
STREAM_NQ = 200
STREAM_NPROBE = 8
N_DELETES = 1_000


def stream_phase(spark, vecs, Q: np.ndarray, work: str, n: int) -> dict:
    """Ingest-while-searching at 2·10^5 vectors (the M4/M5 mixed-RW shape
    at SIFT dimensionality): build an engine over a 180k base, stream a
    20k tail in while merged searches run, fire a 1,000-id tombstone wave
    mid-ingest, and measure search latency under load, compaction wall
    time, and the final survivor recall.  Scales down proportionally for
    small ``--n`` smoke runs."""
    from vector_search_engine_spark.operators import knn as knn_ops
    from vector_search_engine_spark.streaming.engine import VectorEngine

    base_n = min(STREAM_BASE, int(n * 0.9))
    tail_n = min(STREAM_TAIL, n - base_n)
    n_del = min(N_DELETES, base_n // 20)
    out: dict = {
        "base_rows": base_n,
        "tail_rows": tail_n,
        "n_queries": STREAM_NQ,
        "nprobe": STREAM_NPROBE,
    }
    universe = vecs.filter(F.col("vec_id") < base_n + tail_n).cache()
    universe.count()
    t0 = time.time()
    eng = VectorEngine.create(
        universe.filter(F.col("vec_id") < base_n),
        os.path.join(work, "stream_engine"),
    )
    out["engine_build_sec"] = round(time.time() - t0, 2)
    stage = os.path.join(work, "stream_stage")
    universe.filter(F.col("vec_id") >= base_n).repartition(6).write.mode(
        "overwrite"
    ).parquet(stage)
    # deterministic tombstone wave over indexed ids
    del_ids = [i * 17 % base_n for i in range(n_del)]
    del_ids = sorted(set(del_ids))[:n_del]
    del_batches = [del_ids[i::2] for i in range(2)]
    qids = np.arange(STREAM_NQ, dtype=np.int64)
    queries = (qids, Q[:STREAM_NQ])
    survivors = universe.filter(~F.col("vec_id").isin(del_ids))
    gt = (
        knn_ops.knn_exact(survivors, queries, k=K)
        .groupBy("qid")
        .agg(F.collect_list("neighbor_id").alias("neighbor_ids"))
        .cache()
    )
    gt.count()

    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    lat: list[float] = []
    t0 = time.time()
    qh = eng.ingest_stream(stream, max_delta_fraction=0.05)
    while qh.isActive and len(lat) < 30:
        s0 = time.time()
        eng.search(queries, k=K, nprobe=STREAM_NPROBE).write.format(
            "noop"
        ).mode("overwrite").save()
        lat.append(time.time() - s0)
        if len(lat) <= len(del_batches):
            eng.delete(del_batches[len(lat) - 1])
    qh.awaitTermination(600)
    out["ingest_wall_sec"] = round(time.time() - t0, 2)
    out["searches_during_ingest"] = len(lat)
    for b in del_batches[len(lat):]:
        eng.delete(b)
    while len(lat) < 8:
        s0 = time.time()
        eng.search(queries, k=K, nprobe=STREAM_NPROBE).write.format(
            "noop"
        ).mode("overwrite").save()
        lat.append(time.time() - s0)
    lat_ms = np.sort(np.array(lat) * 1000.0)
    ops = {m["op"]: m for m in eng.recorder.snapshot()}
    out["insert_rows_per_sec"] = round(tail_n / out["ingest_wall_sec"], 1)
    out["search_p50_ms"] = round(float(np.percentile(lat_ms, 50)), 1)
    out["search_p99_ms"] = round(float(np.percentile(lat_ms, 99)), 1)
    out["compactions"] = ops.get("compact", {}).get("count", 0)
    out["compact_p50_ms"] = ops.get("compact", {}).get("p50_ms")
    out["rows_deleted"] = len(del_ids)
    out["delete_p50_ms"] = ops.get("delete", {}).get("p50_ms")
    # post-ingest recall vs SURVIVORS at the serving nprobe, then the
    # exactness check at full probe (merged-search + tombstone contract)
    res = eng.search(queries, k=K, nprobe=STREAM_NPROBE)
    out["recall_at_10_final"] = float(
        knn_ops.recall_at_k(res, gt, K).collect()[0]["recall_at_k"]
    )
    res_full = eng.search(
        queries, k=K, nprobe=eng.index.meta["n_centroids"]
    )
    out["recall_at_10_full_probe"] = float(
        knn_ops.recall_at_k(res_full, gt, K).collect()[0]["recall_at_k"]
    )
    gt.unpersist()
    universe.unpersist()
    print(f"stream phase: {out}", file=sys.stderr)
    return out


def _large_cell_rung(spark, vecs, queries, gt, work: str) -> dict:
    """Walk vs scan at a 100-cell layout (10k vectors/cell at 1M)."""
    from vector_search_engine_spark.operators import hnsw

    qids, Q = queries
    out: dict = {"n_centroids": 100}
    t0 = time.time()
    idx = IVFIndex.build(vecs, f"{work}/index_lc", n_centroids=100)
    out["ivf_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    graph_dir = idx.ensure_graph()
    out["graph_build_sec"] = round(time.time() - t0, 2)
    print(f"large-cell graph sidecar in {out['graph_build_sec']}s",
          file=sys.stderr)
    for nprobe in (1, 2, 4):
        t0 = time.time()
        flat = idx.search(queries, k=K, nprobe=nprobe)
        f_rec = knn_ops.recall_at_k(flat, gt, K).collect()[0]
        f_sec = round(time.time() - t0, 2)
        row = {
            "flat_scan": {
                "search_plus_recall_sec": f_sec,
                "recall_at_10": float(f_rec["recall_at_k"]),
            }
        }
        for ef in (4 * K, 16 * K):
            t0 = time.time()
            g = idx.search_graph(queries, k=K, nprobe=nprobe, ef=ef)
            g_rec = knn_ops.recall_at_k(g, gt, K).collect()[0]
            row[f"graph_ef_{ef}"] = {
                "search_plus_recall_sec": round(time.time() - t0, 2),
                "recall_at_10": float(g_rec["recall_at_k"]),
            }
        out[f"nprobe_{nprobe}"] = row
        print(f"large-cell nprobe={nprobe}: {row}", file=sys.stderr)

    # measured distance-evaluation ratio, driver-side sample: the first
    # 25 queries' nprobe=1 cell, instrumented walk vs the cell size
    pairs = idx.probe_pairs(qids[:25], Q[:25], 1)
    id_col, vec_col = idx.meta["id_col"], idx.meta["vec_col"]
    evals, scans = [], []
    for cell in sorted({c for _, c in pairs}):
        cell_q = [int(q) for q, c in pairs if c == cell]
        pdf = (
            spark.read.parquet(graph_dir)
            .filter(F.col("centroid_id") == int(cell))
            .toPandas()
            .sort_values(id_col, kind="stable")
            .reset_index(drop=True)
        )
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        levels = pdf["level"].to_numpy(dtype=np.int64)
        layers = hnsw.layers_from_rows(ids, levels, pdf["nbrs"])
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        for qi in cell_q:
            st: dict = {}
            hnsw.search_cell_graph(
                ids, V, levels, layers, Q[qi].astype(np.float64), 4 * K,
                stats=st,
            )
            evals.append(st["dist_evals"])
            scans.append(len(ids))
    out["dist_evals_sample"] = {
        "queries": len(evals),
        "walk_mean_evals": round(float(np.mean(evals)), 1),
        "scan_mean_evals": round(float(np.mean(scans)), 1),
        "eval_ratio": round(float(np.mean(scans) / np.mean(evals)), 2),
        "ef": 4 * K,
    }
    print(f"dist evals: {out['dist_evals_sample']}", file=sys.stderr)
    return out


def _pca_correlated_rung(spark, work: str, n: int) -> dict:
    """Stretch rung (r11 verdict item 7): the PCA-rotated prefix tier at
    SIFT scale in its CLAIMED regime — wide (128-dim) vectors whose
    energy is correlated but hidden from any axis-aligned prefix (a
    decaying spectrum mixed by a random rotation), large cells (64
    centroids → ~n/64 rows each).  Finding 24 was honest that the
    flat-spectrum 100k×64d corpus shows wall parity; this measures
    whether the FLOPs cut turns into wall at 1M×128d, against both the
    float scan and the UNROTATED prefix tier (whose bound cannot prune
    here — its survivor fraction is the degenerate-regime control).
    All three tiers must return bit-identical rows (lossless)."""
    d, nq, pfx, ncells, k, nprobe = 128, 200, 16, 64, 10, 4
    rng = np.random.default_rng(17)
    scales = np.exp(-np.arange(d) / 12.0)
    mix = np.linalg.qr(rng.normal(0, 1, (d, d)))[0]
    path = f"{work}/pca_base.fvecs"
    dim_le = np.array([d], dtype="<i4").tobytes()
    out: dict = {
        "n": n, "dim": d, "prefix_dims": pfx,
        "n_centroids": ncells, "nprobe": nprobe, "k": k, "nq": nq,
    }
    t0 = time.time()
    chunk = 100_000
    with open(path, "wb") as f:
        for lo in range(0, n, chunk):
            m = min(chunk, n - lo)
            block = ((rng.normal(0, 1, (m, d)) * scales) @ mix).astype(
                "<f4"
            )
            rec = np.empty((m, d + 1), dtype="<f4")
            rec[:, 0:1] = np.frombuffer(dim_le, dtype="<f4")
            rec[:, 1:] = block
            f.write(rec.tobytes())
    Q = ((rng.normal(0, 1, (nq, d)) * scales) @ mix).astype(np.float32)
    out["gen_sec"] = round(time.time() - t0, 2)
    vecs = scan_fvecs(spark, path)
    t0 = time.time()
    idx = IVFIndex.build(vecs, f"{work}/index_pca", n_centroids=ncells)
    out["ivf_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    rot_dir = idx.ensure_pca_rot()
    out["pcarot_build_sec"] = round(time.time() - t0, 2)
    with open(os.path.join(rot_dir, "energy.json")) as f:
        cum = json.load(f)["trained_cum_energy"]
    out["energy_at_prefix"] = round(float(cum[pfx - 1]), 4)
    queries = (np.arange(nq, dtype=np.int64), Q)
    print(f"pca rung: built in {out['ivf_build_sec']}s + "
          f"{out['pcarot_build_sec']}s sidecar; energy@{pfx} = "
          f"{out['energy_at_prefix']}", file=sys.stderr)

    def timed_rows(tag: str, fn) -> list:
        # cold then warm — the warm number is the honest serve cost
        # (the cold one pays first-touch parquet/Arrow warmup)
        t0 = time.time()
        rows = sorted(map(tuple, fn().collect()))
        cold = round(time.time() - t0, 2)
        t0 = time.time()
        rows = sorted(map(tuple, fn().collect()))
        out[f"{tag}_search_sec"] = {
            "cold": cold, "warm": round(time.time() - t0, 2)
        }
        print(f"pca rung {tag}: {out[f'{tag}_search_sec']}",
              file=sys.stderr)
        return rows

    flat = timed_rows("float", lambda: idx.search(queries, k=k, nprobe=nprobe))
    pfx_rows = timed_rows(
        "prefix",
        lambda: idx.search_prefix(queries, k=k, nprobe=nprobe, prefix_dims=pfx),
    )
    ppca_rows = timed_rows(
        "prefix_pca",
        lambda: idx.search_prefix_pca(
            queries, k=k, nprobe=nprobe, prefix_dims=pfx
        ),
    )
    assert pfx_rows == flat, "prefix bound cut must be lossless at 1M"
    assert ppca_rows == flat, "pca prefix bound cut must be lossless at 1M"
    out["all_tiers_bit_identical"] = True

    # survivor fractions, sampled driver-side: rotated vs axis-aligned
    R = np.load(os.path.join(rot_dir, "rotation.npy"))
    samp = np.stack(
        [
            r[0]
            for r in vecs.select(idx.meta["vec_col"])
            .sample(min(1.0, 50_000 / max(n, 1)), seed=3)
            .limit(50_000)
            .collect()
        ]
    ).astype(np.float64)
    samp_rot = samp @ R
    fr_plain, fr_rot = [], []
    for i in range(20):
        q64 = Q[i].astype(np.float64)
        qr = q64 @ R
        dfull = ((samp - q64[None, :]) ** 2).sum(axis=1)
        kth = np.partition(dfull, k - 1)[k - 1]
        dp = ((samp[:, :pfx] - q64[None, :pfx]) ** 2).sum(axis=1)
        dpr = ((samp_rot[:, :pfx] - qr[None, :pfx]) ** 2).sum(axis=1)
        fr_plain.append(float((dp <= kth).mean()))
        fr_rot.append(float((dpr <= kth).mean()))
    out["survivor_fraction_prefix"] = round(float(np.mean(fr_plain)), 4)
    out["survivor_fraction_prefix_pca"] = round(float(np.mean(fr_rot)), 4)
    print(f"pca rung survivors: plain {out['survivor_fraction_prefix']} "
          f"vs rotated {out['survivor_fraction_prefix_pca']}",
          file=sys.stderr)
    return out


def main() -> None:
    n = 1_000_000
    out_path = "SIFT1M.json"
    args = sys.argv[1:]
    if "--n" in args:
        n = int(args[args.index("--n") + 1])
    if "--out" in args:
        out_path = args[args.index("--out") + 1]

    spark = get_spark("vse-sift-scale")
    if "--pca-rung" in args:
        work = tempfile.mkdtemp(prefix="vse_sift_pca_")
        try:
            rung = _pca_correlated_rung(spark, work, n)
        finally:
            shutil.rmtree(work, ignore_errors=True)
        merged: dict = {}
        if os.path.exists(out_path):
            with open(out_path) as f:
                merged = json.load(f)
        merged["prefix_pca_rung"] = rung
        with open(out_path, "w") as f:
            json.dump(merged, f, indent=1)
        print(json.dumps({"prefix_pca_rung": rung}))
        return
    work = tempfile.mkdtemp(prefix="vse_sift_")
    results: dict = {"n_vectors": n, "dim": DIM, "n_queries": NQ}
    try:
        t0 = time.time()
        Q = gen_fvecs(f"{work}/base.fvecs", n)
        results["gen_sec"] = round(time.time() - t0, 2)
        results["fvecs_bytes"] = os.path.getsize(f"{work}/base.fvecs")
        print(f"generated {results['fvecs_bytes']/1e6:.0f} MB fvecs "
              f"in {results['gen_sec']}s", file=sys.stderr)

        t0 = time.time()
        vecs = scan_fvecs(spark, f"{work}/base.fvecs")
        n_scanned = vecs.count()
        results["fvecs_scan_sec"] = round(time.time() - t0, 2)
        assert n_scanned == n, (n_scanned, n)
        print(f"scan_fvecs: {n_scanned} rows in "
              f"{results['fvecs_scan_sec']}s", file=sys.stderr)

        qids = np.arange(NQ, dtype=np.int64)
        queries = (qids, Q)

        # M1 analog: exact brute-force — also the recall ground truth
        t0 = time.time()
        gt_rows = knn_ops.knn_exact(vecs, queries, k=GT_K)
        gt = (
            gt_rows.orderBy("qid", "rank")
            .groupBy("qid")
            .agg(F.collect_list("neighbor_id").alias("neighbor_ids"))
            .cache()
        )
        n_gt = gt.count()
        results["exact_search_sec"] = round(time.time() - t0, 2)
        assert n_gt == NQ
        print(f"exact top-{GT_K} for {NQ} queries in "
              f"{results['exact_search_sec']}s", file=sys.stderr)

        # M2 analog: bulk index build
        t0 = time.time()
        idx = IVFIndex.build(vecs, f"{work}/index")
        results["ivf_build_sec"] = round(time.time() - t0, 2)
        results["n_centroids"] = int(idx.meta["n_centroids"])
        print(f"ivf_build ({results['n_centroids']} cells) in "
              f"{results['ivf_build_sec']}s", file=sys.stderr)

        # M3 analog: probe ladder, recall@10 vs exact
        ladder = []
        for nprobe in NPROBE_LADDER:
            t0 = time.time()
            res = idx.search(queries, k=K, nprobe=nprobe)
            rec = knn_ops.recall_at_k(res, gt, K).collect()[0]
            dt = round(time.time() - t0, 2)
            ladder.append(
                {
                    "nprobe": nprobe,
                    "search_plus_recall_sec": dt,
                    "recall_at_10": float(rec["recall_at_k"]),
                }
            )
            print(f"nprobe={nprobe}: recall@10="
                  f"{rec['recall_at_k']:.4f} in {dt}s", file=sys.stderr)
        results["probe_ladder"] = ladder
        tuned = next(
            (e for e in ladder if e["recall_at_10"] >= TARGET_RECALL), None
        )
        results["tuned"] = tuned

        # PQ tier at SIFT shape: m=16 over dim 128 (dsub 8) = 32× fewer
        # candidate-scan bytes.  Measures sidecar build, the bound-cut
        # selectivity (the design's scale-relevant unknown: how tight is
        # sd ± resid on realistically-noisy descriptors?), probe wall
        # time, and recall parity vs the float probe at the same nprobe
        # (identical by construction — asserted, not assumed).
        pq_m = 16
        t0 = time.time()
        codes_dir, books = idx.ensure_pq(m=pq_m)
        pq_res: dict = {
            "m": pq_m,
            "sidecar_build_sec": round(time.time() - t0, 2),
            "codes_bytes": sum(
                os.path.getsize(os.path.join(r, fn))
                for r, _, fns in os.walk(codes_dir)
                for fn in fns
            ),
        }
        np_pq = tuned["nprobe"] if tuned else NPROBE_LADDER[0]
        # bound-cut selectivity at the tuned nprobe: survivors / scanned
        from vector_search_engine_spark.operators.pq import pq_bound_cut

        qids_a = np.arange(NQ, dtype=np.int64)
        pairs = idx.probe_pairs(qids_a, Q, np_pq)
        import pandas as pd_

        pairs_df = spark.createDataFrame(
            pd_.DataFrame(pairs, columns=["qid", "centroid_id"]).astype(
                {"qid": "int64", "centroid_id": "int32"}
            )
        )
        needed = sorted({c for _, c in pairs})
        codes = spark.read.parquet(codes_dir).filter(
            F.col("centroid_id").isin(needed)
        )
        tagged = codes.join(F.broadcast(pairs_df), "centroid_id").select(
            "qid", idx.meta["id_col"], "code", "resid", "centroid_id"
        )
        scanned = tagged.count()
        qmap_bc = spark.sparkContext.broadcast(
            {int(q): Q[i].astype(np.float64) for i, q in enumerate(qids_a)}
        )
        books_bc = spark.sparkContext.broadcast(books)
        cm_bc = spark.sparkContext.broadcast(idx.center_map())
        survivors = pq_bound_cut(
            tagged, qmap_bc, books_bc, K, idx.meta["id_col"],
            center_map_bc=cm_bc,
        ).count()
        pq_res["nprobe"] = np_pq
        pq_res["pairs_scanned"] = int(scanned)
        pq_res["cut_survivors"] = int(survivors)
        pq_res["cut_selectivity"] = round(survivors / max(scanned, 1), 4)
        t0 = time.time()
        pq_search = idx.search_pq(queries, k=K, nprobe=np_pq, m=pq_m)
        pq_rec = knn_ops.recall_at_k(pq_search, gt, K).collect()[0]
        pq_res["search_plus_recall_sec"] = round(time.time() - t0, 2)
        pq_res["recall_at_10"] = float(pq_rec["recall_at_k"])
        float_rec = next(e for e in ladder if e["nprobe"] == np_pq)
        assert abs(pq_res["recall_at_10"] - float_rec["recall_at_10"]) < 1e-9, (
            "PQ bound cut must match the float probe exactly"
        )
        # classic top-C ADC mode: the scale path when residuals prune
        # nothing — approximate recall, exact distances
        for cpp in (4 * K, 16 * K):
            t0 = time.time()
            topc = idx.search_pq(
                queries, k=K, nprobe=np_pq, m=pq_m,
                candidates_per_partition=cpp,
            )
            topc_rec = knn_ops.recall_at_k(topc, gt, K).collect()[0]
            pq_res[f"topc_{cpp}"] = {
                "search_plus_recall_sec": round(time.time() - t0, 2),
                "recall_at_10": float(topc_rec["recall_at_k"]),
            }
            print(f"pq top-C={cpp}: recall "
                  f"{pq_res[f'topc_{cpp}']['recall_at_10']:.4f} in "
                  f"{pq_res[f'topc_{cpp}']['search_plus_recall_sec']}s",
                  file=sys.stderr)
        results["pq"] = pq_res
        print(f"pq m={pq_m}: selectivity {pq_res['cut_selectivity']}, "
              f"recall {pq_res['recall_at_10']:.4f} in "
              f"{pq_res['search_plus_recall_sec']}s", file=sys.stderr)

        # BQ tier at SIFT shape: the descriptors are non-negative, so
        # this exercises the mean-centered code path (sign-at-zero would
        # be all-ones) end-to-end at 10^5-10^6 scale.  1 bit/dim =
        # dim/8 bytes/vector vs 4*dim float32 — 32× fewer candidate-scan
        # bytes; recall ladder over candidates_per_cell at the tuned
        # nprobe (no lossless bound exists for sign codes — the ladder IS
        # the evidence).
        t0 = time.time()
        bq_dir = idx.ensure_bq()
        bq_res: dict = {
            "sidecar_build_sec": round(time.time() - t0, 2),
            "codes_bytes": sum(
                os.path.getsize(os.path.join(r, fn))
                for r, _, fns in os.walk(bq_dir)
                for fn in fns
            ),
            "nprobe": np_pq,
        }
        for cpc in (4 * K, 16 * K, 64 * K):
            t0 = time.time()
            bq_search = idx.search_bq(
                queries, k=K, nprobe=np_pq, candidates_per_cell=cpc
            )
            bq_rec = knn_ops.recall_at_k(bq_search, gt, K).collect()[0]
            bq_res[f"c_{cpc}"] = {
                "search_plus_recall_sec": round(time.time() - t0, 2),
                "recall_at_10": float(bq_rec["recall_at_k"]),
            }
            print(f"bq C={cpc}: recall "
                  f"{bq_res[f'c_{cpc}']['recall_at_10']:.4f} in "
                  f"{bq_res[f'c_{cpc}']['search_plus_recall_sec']}s",
                  file=sys.stderr)
        results["bq"] = bq_res

        # SQ4 rung (r9): nibble codes = 8× fewer candidate-scan bytes;
        # the span/30 bound is lossless, so recall MUST equal the float
        # probe at the same nprobe — asserted; the measured quantity is
        # wall time (bytes saved vs candidates kept by the wider bound).
        t0 = time.time()
        sq4_dir = idx.ensure_sq8(bits=4)
        sq4_res: dict = {
            "sidecar_build_sec": round(time.time() - t0, 2),
            "codes_bytes": sum(
                os.path.getsize(os.path.join(r, fn))
                for r, _, fns in os.walk(sq4_dir)
                for fn in fns
            ),
            "nprobe": np_pq,
        }
        t0 = time.time()
        sq4_search = idx.search_sq8(queries, k=K, nprobe=np_pq, bits=4)
        sq4_rec = knn_ops.recall_at_k(sq4_search, gt, K).collect()[0]
        sq4_res["search_plus_recall_sec"] = round(time.time() - t0, 2)
        sq4_res["recall_at_10"] = float(sq4_rec["recall_at_k"])
        assert abs(sq4_res["recall_at_10"] - float_rec["recall_at_10"]) < 1e-9, (
            "SQ4 bound cut must match the float probe exactly"
        )
        results["sq4"] = sq4_res
        print(f"sq4: recall {sq4_res['recall_at_10']:.4f} in "
              f"{sq4_res['search_plus_recall_sec']}s", file=sys.stderr)

        # Prefix-cut rung (r9): lossless prefix-L2 bound — recall equals
        # the float probe by construction (asserted); the scale-relevant
        # unknown is the SURVIVOR FRACTION, estimated driver-side on a
        # 50k sample (the synthetic SIFT corpus is spectrally flat — the
        # tier's unfavorable regime; SCALING.md carries the decaying-
        # spectrum counterpart from the 100k stress harness).
        pfx_dims = 16
        t0 = time.time()
        pfx_search = idx.search_prefix(
            queries, k=K, nprobe=np_pq, prefix_dims=pfx_dims
        )
        pfx_rec = knn_ops.recall_at_k(pfx_search, gt, K).collect()[0]
        pfx_res: dict = {
            "prefix_dims": pfx_dims,
            "nprobe": np_pq,
            "search_plus_recall_sec": round(time.time() - t0, 2),
            "recall_at_10": float(pfx_rec["recall_at_k"]),
        }
        assert abs(pfx_res["recall_at_10"] - float_rec["recall_at_10"]) < 1e-9, (
            "prefix bound cut must match the float probe exactly"
        )
        samp = np.stack(
            [
                r[0]
                for r in vecs.select(idx.meta["vec_col"])
                .sample(min(1.0, 50_000 / max(n, 1)), seed=3)
                .limit(50_000)
                .collect()
            ]
        ).astype(np.float64)
        fracs = []
        for i in range(20):
            q64 = Q[i].astype(np.float64)
            dp = ((samp[:, :pfx_dims] - q64[None, :pfx_dims]) ** 2).sum(axis=1)
            dfull = ((samp - q64[None, :]) ** 2).sum(axis=1)
            kth_full = np.partition(dfull, K - 1)[K - 1]
            fracs.append(float((dp <= kth_full).mean()))
        pfx_res["survivor_fraction_sampled"] = round(float(np.mean(fracs)), 4)
        results["prefix"] = pfx_res
        print(f"prefix d'={pfx_dims}: survivor frac "
              f"{pfx_res['survivor_fraction_sampled']} in "
              f"{pfx_res['search_plus_recall_sec']}s", file=sys.stderr)

        # OPQ-vs-PQ rung (r9): the rotation only matters in top-C ADC
        # mode (the lossless bound mode is exact either way), so the
        # delta is measured there at the same candidate budgets.
        t0 = time.time()
        idx.ensure_pq(m=pq_m, opq=True)
        opq_res: dict = {
            "m": pq_m,
            "sidecar_build_sec": round(time.time() - t0, 2),
            "nprobe": np_pq,
        }
        for cpp in (4 * K, 16 * K):
            t0 = time.time()
            topc = idx.search_pq(
                queries, k=K, nprobe=np_pq, m=pq_m,
                candidates_per_partition=cpp, opq=True,
            )
            topc_rec = knn_ops.recall_at_k(topc, gt, K).collect()[0]
            opq_res[f"topc_{cpp}"] = {
                "search_plus_recall_sec": round(time.time() - t0, 2),
                "recall_at_10": float(topc_rec["recall_at_k"]),
                "recall_delta_vs_pq": round(
                    float(topc_rec["recall_at_k"])
                    - pq_res[f"topc_{cpp}"]["recall_at_10"],
                    4,
                ),
            }
            print(f"opq top-C={cpp}: recall "
                  f"{opq_res[f'topc_{cpp}']['recall_at_10']:.4f} "
                  f"(delta {opq_res[f'topc_{cpp}']['recall_delta_vs_pq']:+}) "
                  f"in {opq_res[f'topc_{cpp}']['search_plus_recall_sec']}s",
                  file=sys.stderr)
        results["opq"] = opq_res

        # Cascade rung (r9): BQ candidates → SQ8 bound cut → float
        # rescore, vs the single-tier modes at the same nprobe/budget.
        idx.ensure_sq8(bits=8)
        casc_res: dict = {"nprobe": np_pq}
        for cpc in (4 * K, 16 * K):
            t0 = time.time()
            casc = idx.search_cascade(
                queries, k=K, nprobe=np_pq, candidates_per_cell=cpc
            )
            casc_rec = knn_ops.recall_at_k(casc, gt, K).collect()[0]
            casc_res[f"c_{cpc}"] = {
                "search_plus_recall_sec": round(time.time() - t0, 2),
                "recall_at_10": float(casc_rec["recall_at_k"]),
            }
            print(f"cascade C={cpc}: recall "
                  f"{casc_res[f'c_{cpc}']['recall_at_10']:.4f} in "
                  f"{casc_res[f'c_{cpc}']['search_plus_recall_sec']}s",
                  file=sys.stderr)
        results["cascade"] = casc_res

        # Graph rung (r10): per-cell HNSW beam — the reference's OWN
        # serving algorithm (hnsw_index.h:223-262) at SIFT shape, vs the
        # flat cell scan at the same nprobe (the probe_ladder row is the
        # comparator).  The walk bounds distance evaluations at
        # ~ef·M·log|cell| per (query, cell) instead of the scan's |cell|;
        # ef is the ef_search twin, swept like the reference's
        # recall_bench.cpp ladder.  Build wall is the price of the
        # sidecar (per-cell Python inserts, fanned out one cell per
        # task); bytes measure the vector-carrying node rows.
        t0 = time.time()
        graph_dir = idx.ensure_graph()
        g_res: dict = {
            "nprobe": np_pq,
            "sidecar_build_sec": round(time.time() - t0, 2),
            "sidecar_bytes": sum(
                os.path.getsize(os.path.join(r, fn))
                for r, _, fns in os.walk(graph_dir)
                for fn in fns
            ),
        }
        for ef in (K, 4 * K, 16 * K):
            t0 = time.time()
            gres = idx.search_graph(queries, k=K, nprobe=np_pq, ef=ef)
            g_rec = knn_ops.recall_at_k(gres, gt, K).collect()[0]
            g_res[f"ef_{ef}"] = {
                "search_plus_recall_sec": round(time.time() - t0, 2),
                "recall_at_10": float(g_rec["recall_at_k"]),
            }
            print(f"graph ef={ef}: recall "
                  f"{g_res[f'ef_{ef}']['recall_at_10']:.4f} in "
                  f"{g_res[f'ef_{ef}']['search_plus_recall_sec']}s",
                  file=sys.stderr)
        results["graph"] = g_res

        # Large-cell rung (r11, verdict item 3): the graph tier's CLAIMED
        # favorable regime — few huge cells, where the walk's
        # ~ef·M·log|cell| distance evaluations should beat the flat
        # scan's |cell| per (query, cell).  100 cells ≈ 10k vectors/cell
        # at 1M; nprobe 1-4.  Also counts ACTUAL distance evaluations
        # (search_cell_graph's distance cache) on a driver-side sample
        # so the eval ratio is measured, not argued.
        if "--large-cells" in args:
            results["large_cells"] = _large_cell_rung(
                spark, vecs, queries, gt, work
            )
        gt.unpersist()

        # M4/M5 analog beyond sf0.1: ingest-while-searching at SIFT shape
        # (client_bench.cpp:39-49 runs 6R/6W against the live server) with
        # a tombstone-delete wave — pins merged-search overhead, compaction
        # wall time, and delete-visibility at 10^5-vector scale.
        if "--no-stream" not in args:
            results["stream"] = stream_phase(spark, vecs, Q, work, n)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    line = json.dumps(results)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
