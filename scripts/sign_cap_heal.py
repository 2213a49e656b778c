#!/usr/bin/env python3
"""Finding 46 rung: measure the sign-tier AUTO_SIGN_BUDGET_CAP recall
hit at the REAL cap, then heal it with heal_sign_budget_cap().

r16 closed finding 41 by auto-deriving the sign-tier (BQ/cascade)
stage-1 budget per probed cell from that cell's actual population — but
cells ABOVE ``AUTO_SIGN_BUDGET_CAP`` (65,536) keep the cap with only a
RuntimeWarning, and the recall consequence was never measured (the r16
verdict's "What's missing #1": a 70k-row hot cell silently-but-for-a-
warning re-enters the finding-41 regime).  This rung:

  1. builds a CLUSTERED corpus whose layout puts one IVF cell well past
     the cap: one tight gaussian cluster of ``--hot`` rows (default
     90,000 — 1.37x the cap) plus a ring of small far-apart clusters.
     The layout is PINNED with a pretrained coarse quantizer (the
     build's FAISS-style ``centroids=`` path: one centroid per true
     cluster center) — sample-trained Lloyd seeds proportionally to
     mass, so on a 73%-hot corpus it splits the hot cluster across
     several cells and the cap never engages; real ingest reaches this
     state the other way (compaction pouring rows into a fixed coarse
     layout, which no amount of init luck prevents).  The hot-cell
     population is verified from stats(), not assumed;
  2. measures default-budget BQ + cascade (per-query AND bulk) recall
     AND wall IN the capped state for queries drawn from the hot
     cluster — the adversarial workload.  MEASURED RESULT (finding 46):
     recall stays 1.0 — the stage-1 cut unit is min(budget, Arrow
     batch slice), and default 10k-row batches never reach the 65,536
     cap, so the cap cannot cut at default batching; what the >cap
     cell DOES cost is wall — one 90k-row straggler task and an
     unbounded exact-rescore set (capped BQ 44.6 s vs healed 13.3 s);
  3. heals via ``index.heal_sign_budget_cap()`` (iterated rebalance of
     the offenders — the exact call the cap warning names) and
     re-measures at the SAME default budget: post-heal every cell fits
     the cap, the auto-budget covers full populations with no warning,
     recall stays 1.0, and the straggler wall is bought back;
  4. re-checks full-probe exactness after the heal (rebalance must not
     have changed the answer set, only the partitioning).

Writes the artifact via json.dump (r15 lesson: tee'd stdout interleaves
JVM noise — artifacts must not depend on stdout capture).

Usage:
    python scripts/sign_cap_heal.py [--hot 90000] [--out SIGN_CAP_HEAL.json]

Runtime ~3-5 min on local[32].
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import warnings

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from vector_search_engine_spark.operators import ivf as ivf_mod  # noqa: E402
from vector_search_engine_spark.operators import knn as knn_ops  # noqa: E402
from vector_search_engine_spark.operators.ivf import IVFIndex  # noqa: E402
from vector_search_engine_spark.session import get_spark  # noqa: E402

DIM = 32
N_COLD_CLUSTERS = 8
COLD_PER_CLUSTER = 4_000
# 48 queries, not 200: the per-query sign tiers replicate the probed
# cell per query (|Q|·90k rows through ONE hot-cell task — at 200
# queries that single task runs ~360k tiny per-(batch,query) Python
# groups and takes minutes; the bulk-|Q| workload belongs to the
# *_distributed tiers, which the rung also measures via the cascade).
# 48·k = 480 neighbor checks keeps recall resolution at 0.2%.
NQ = 48
K = 10


def _recall(got_rows, gt: dict[int, set[int]]) -> float:
    hits = sum(1 for r in got_rows if r.neighbor_id in gt.get(r.qid, set()))
    return hits / max(1, sum(len(s) for s in gt.values()))


def main() -> None:
    hot_n = 90_000
    out_path = "SIGN_CAP_HEAL.json"
    if "--hot" in sys.argv:
        hot_n = int(sys.argv[sys.argv.index("--hot") + 1])
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    cap = ivf_mod.AUTO_SIGN_BUDGET_CAP
    assert hot_n > cap, f"--hot {hot_n} must exceed the cap {cap}"

    spark = get_spark("sign-cap-heal")
    rng = np.random.default_rng(46)

    # hot cluster: tight (sigma 0.2) — the finding-41 geometry where
    # sign codes carry no within-cluster ordering information
    hot = rng.normal(0, 0.2, (hot_n, DIM)) + 10.0
    cold_centers = rng.normal(0, 1, (N_COLD_CLUSTERS, DIM)) * 8.0 - 10.0
    cold = np.concatenate(
        [
            c + rng.normal(0, 0.2, (COLD_PER_CLUSTER, DIM))
            for c in cold_centers
        ]
    )
    V = np.vstack([hot, cold]).astype(np.float32)
    n = len(V)
    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(V)}
        )
    ).repartition(32)

    # queries FROM the hot cluster — their true top-k all live in the
    # capped cell, the workload the cap actually endangers
    q_idx = rng.choice(hot_n, NQ, replace=False)
    q = spark.createDataFrame(
        pd.DataFrame(
            {
                "qid": np.arange(NQ, dtype=np.int64),
                "query": list(V[q_idx]),
            }
        )
    )

    root = tempfile.mkdtemp(prefix="vse_sign_cap_")
    res: dict = {
        "metric": "sign_cap_heal",
        "cap": cap,
        "hot_rows": hot_n,
        "n_vectors": n,
        "dim": DIM,
        "n_queries": NQ,
        "k": K,
    }
    try:
        t0 = time.time()
        C0 = np.vstack(
            [np.full((1, DIM), 10.0), cold_centers]
        )  # one centroid per TRUE cluster center — layout pinned
        idx = IVFIndex.build(emb, os.path.join(root, "i"), centroids=C0)
        res["build_sec"] = round(time.time() - t0, 2)
        pops = {
            int(r["centroid_id"]): int(r["n_vectors"])
            for r in idx.stats().collect()
        }
        hot_cell = max(pops, key=pops.get)
        res["hot_cell_pop"] = pops[hot_cell]
        assert pops[hot_cell] > cap, (
            f"layout failed: hottest cell {pops[hot_cell]} <= cap {cap}"
        )

        t0 = time.time()
        gt_rows = knn_ops.knn_exact(emb, q, k=K).collect()
        res["ground_truth_sec"] = round(time.time() - t0, 2)
        gt: dict[int, set[int]] = {}
        for r in gt_rows:
            gt.setdefault(r.qid, set()).add(r.neighbor_id)

        full = idx.meta["n_centroids"]
        # ---- capped state: default budget, full probe
        for tier, fn in (
            ("bq", idx.search_bq),
            ("cascade", idx.search_cascade),
            ("cascade_distributed", idx.search_cascade_distributed),
        ):
            with warnings.catch_warnings(record=True) as w:
                warnings.simplefilter("always")
                t0 = time.time()
                rows = fn(q, k=K, nprobe=full).collect()
                wall = time.time() - t0
            res[f"capped_{tier}_recall_at_{K}"] = round(_recall(rows, gt), 4)
            res[f"capped_{tier}_wall_sec"] = round(wall, 2)
            res[f"capped_{tier}_warned"] = any(
                "capped" in str(x.message) for x in w
            )

        # ---- heal: the exact call the warning names
        t0 = time.time()
        mapping = idx.heal_sign_budget_cap()
        res["heal_sec"] = round(time.time() - t0, 2)
        res["heal_split_cells"] = {
            str(p): kids for p, kids in mapping.items()
        }
        pops2 = {
            int(r["centroid_id"]): int(r["n_vectors"])
            for r in idx.stats().collect()
        }
        res["post_heal_max_cell_pop"] = max(pops2.values())
        res["post_heal_n_cells"] = len(pops2)
        assert max(pops2.values()) <= cap, "heal left a cell above the cap"

        # ---- healed state: same default budget, full probe
        full2 = idx.meta["n_centroids"]
        for tier, fn in (
            ("bq", idx.search_bq),
            ("cascade", idx.search_cascade),
            ("cascade_distributed", idx.search_cascade_distributed),
        ):
            with warnings.catch_warnings(record=True) as w:
                warnings.simplefilter("always")
                t0 = time.time()
                rows = fn(q, k=K, nprobe=full2).collect()
                wall = time.time() - t0
            res[f"healed_{tier}_recall_at_{K}"] = round(_recall(rows, gt), 4)
            res[f"healed_{tier}_wall_sec"] = round(wall, 2)
            res[f"healed_{tier}_warned"] = any(
                "capped" in str(x.message) for x in w
            )

        # ---- exactness invariant: rebalance changed partitioning only
        ex = sorted(
            (r.qid, r.rank, r.neighbor_id)
            for r in idx.search(q, k=K, nprobe=full2).collect()
        )
        res["post_heal_full_probe_exact"] = ex == sorted(
            (r.qid, r.rank, r.neighbor_id) for r in gt_rows
        )
        # MEASURED adjudication of the r16 fear (finding 46): the
        # stage-1 cut applies per (query, cell, ARROW-BATCH) slice, and
        # default 10k-row batches never reach a 65,536 budget — so a
        # >cap hot cell loses NO recall at default batching; what it
        # costs is serving wall (the 90k-row cell is one straggler
        # task and an unbounded exact-rescore set).  The gates pin
        # exactly that shape: capped recall STAYS 1.0, the heal removes
        # the warning AND buys back the straggler wall.
        res["semantics_note"] = (
            "stage-1 cut unit = min(budget, arrow batch slice); at the "
            "default 10k-row batches the 65,536 cap never cuts, so the "
            "capped state is recall-exact and the cap's real cost is "
            "the hot-cell straggler wall the heal removes"
        )
        res["gates"] = {
            "capped_recall_exact_at_default_batching": (
                res[f"capped_bq_recall_at_{K}"] >= 0.999
                and res[f"capped_cascade_recall_at_{K}"] >= 0.999
                and res[f"capped_cascade_distributed_recall_at_{K}"]
                >= 0.999
            ),
            "capped_warned": bool(
                res["capped_bq_warned"] and res["capped_cascade_warned"]
            ),
            "healed_recall_one": (
                res[f"healed_bq_recall_at_{K}"] >= 0.999
                and res[f"healed_cascade_recall_at_{K}"] >= 0.999
            ),
            "healed_no_warning": not (
                res["healed_bq_warned"] or res["healed_cascade_warned"]
            ),
            "heal_speedup_bq_over_1p5x": (
                res["capped_bq_wall_sec"]
                >= 1.5 * res["healed_bq_wall_sec"]
            ),
            "post_heal_full_probe_exact": bool(
                res["post_heal_full_probe_exact"]
            ),
        }
        res["all_gates_pass"] = all(res["gates"].values())
    finally:
        shutil.rmtree(root, ignore_errors=True)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: v for k, v in res.items() if k != "heal_split_cells"}))


if __name__ == "__main__":
    main()
