"""Per-cell HNSW graphs: the reference's ACTUAL Q2/Q3 algorithm
(Malkov & Yashunin 2016), distributed.

The reference is a single-node HNSW engine (``hnsw_index.h``): one global
graph, sequential lock-guarded inserts, greedy upper-layer descent plus a
level-0 beam search (``hnsw_index.h:223-262``).  A single global graph
does not distribute — every beam hop chases an edge that may live on
another executor.  The Spark-native form keeps the IVF layout as the
DISTRIBUTION layer (cells = partitions, probe = the coarse routing the
reference's upper layers perform) and builds one INDEPENDENT in-cell HNSW
graph per partition as an ACCELERATOR sidecar: candidate generation
inside a probed cell walks the cell's graph in O(ef·M·log n) distance
evaluations instead of scanning the whole cell.

Parity with ``hnsw_index.h`` (same knobs, same algorithm, per cell):
  * ``M`` = 16, ``ef_construction`` = 100 defaults  (``hnsw_index.h:25``);
  * ``level_mult = 1/ln(M)``                        (``hnsw_index.h:33``);
  * insert: greedy descent above the node's level, per-layer
    ``search_layer(ef_construction)``, bidirectional closest-M links
    with NO pruning heuristic                       (``hnsw_index.h:100-119``);
  * search: greedy descent to layer 1, level-0 beam with ``ef``,
    top-k of the beam                               (``hnsw_index.h:223-262``).

Two deliberate deviations, both strengthening determinism:
  * node levels come from the md5 of the vector id instead of an RNG
    (``get_random_level`` twin) — rebuilding a cell yields byte-identical
    graphs, which snapshot-keyed sidecars require;
  * insert order is ascending id (the reference inserts in arrival
    order) — again for rebuild determinism.

Integration: ``IVFIndex.ensure_graph`` builds the per-cell sidecars via
``applyInPandas`` (generation-keyed, EBR-GCed like the SQ/PQ/BQ codes);
``IVFIndex.search_graph`` serves them (registry ``ann_ivf_graph`` /
``ann_ivf_graph_filtered``); ``VectorEngine.search(tier="graph")`` runs
the walk inside the merged streaming contract
(``streaming_merged_search_graph``).  Gates: tests/test_hnsw.py.

EXACTNESS BOUND (what the oracle gates): because every insert links the
new node bidirectionally to >= 1 existing node and links are never
pruned, each cell's level-0 graph is CONNECTED by induction.  A beam
with ``ef >= |cell|`` therefore never early-terminates and visits every
node — search degenerates to exhaustive scan THROUGH THE GRAPH WALK
code path, so full-probe + unbounded-ef search is exactly the flat kNN
oracle.  Finite ``ef`` is the recall/latency knob (recall pytest-gated,
like nprobe).
"""

from __future__ import annotations

import hashlib
import heapq
import math

import numpy as np

DEFAULT_M = 16  # hnsw_index.h:25
DEFAULT_EF_CONSTRUCTION = 100  # hnsw_index.h:25


def det_level(vid: int, level_mult: float) -> int:
    """Deterministic twin of ``get_random_level`` (hnsw_index.h:33):
    floor(-ln(u) * level_mult) with u drawn from md5(vid) — identical
    distribution, reproducible across rebuilds."""
    h = hashlib.md5(str(int(vid)).encode()).digest()
    u = (int.from_bytes(h[:8], "big") + 1) / float(1 << 64)  # (0, 1]
    return int(-math.log(u) * level_mult)


def _search_layer(
    q: np.ndarray,
    V: np.ndarray,
    adj: list,
    entry: int,
    ef: int,
    dist_cache: dict,
) -> list[tuple[float, int]]:
    """Beam search within one layer (``search_layer``,
    hnsw_index.h:180-220 twin): returns up to ``ef`` (dist, idx) pairs,
    ascending.  Distance evals are vectorized per popped node's
    unvisited neighbor batch."""

    def d(i: int) -> float:
        v = dist_cache.get(i)
        if v is None:
            diff = q - V[i]
            v = float(diff @ diff)
            dist_cache[i] = v
        return v

    d0 = d(entry)
    visited = {entry}
    cand = [(d0, entry)]  # min-heap of frontier
    res = [(-d0, entry)]  # max-heap of best ef
    while cand:
        dc, c = heapq.heappop(cand)
        if dc > -res[0][0] and len(res) >= ef:
            break
        nbrs = [n for n in adj[c] if n not in visited]
        if not nbrs:
            continue
        visited.update(nbrs)
        diffs = V[nbrs] - q
        ds = np.einsum("ij,ij->i", diffs, diffs)
        for n, dn in zip(nbrs, ds):
            dn = float(dn)
            dist_cache[n] = dn
            if len(res) < ef or dn < -res[0][0]:
                heapq.heappush(cand, (dn, n))
                heapq.heappush(res, (-dn, n))
                if len(res) > ef:
                    heapq.heappop(res)
    return sorted((-nd, i) for nd, i in res)


def _greedy_descend(
    q: np.ndarray, V: np.ndarray, adj_at, entry: int, dist_cache: dict
) -> int:
    """One layer of the reference's changed-loop greedy walk
    (hnsw_index.h:79-97)."""

    def d(i: int) -> float:
        v = dist_cache.get(i)
        if v is None:
            diff = q - V[i]
            v = float(diff @ diff)
            dist_cache[i] = v
        return v

    curr, curr_d = entry, d(entry)
    improved = True
    while improved:
        improved = False
        for n in adj_at(curr):
            dn = d(n)
            if dn < curr_d:
                curr, curr_d = n, dn
                improved = True
    return curr


def build_cell_graph(
    ids: np.ndarray,
    V: np.ndarray,
    m: int = DEFAULT_M,
    ef_construction: int = DEFAULT_EF_CONSTRUCTION,
):
    """Build one cell's HNSW graph (insert loop of hnsw_index.h:51-131,
    id-ascending order).  Returns ``(levels, layers)`` where
    ``levels[i]`` is node i's level and ``layers[l][i]`` is node i's
    neighbor list (row indices) at layer ``l``."""
    order = np.argsort(ids, kind="stable")
    assert (order == np.arange(len(ids))).all(), "ids must be pre-sorted"
    n = len(ids)
    level_mult = 1.0 / math.log(m)
    levels = [det_level(int(v), level_mult) for v in ids]
    max_l = max(levels) if n else 0
    layers = [[None] * n for _ in range(max_l + 1)]
    V64 = V.astype(np.float64, copy=False)
    entry, ent_level = -1, -1
    for i in range(n):
        li = levels[i]
        for l in range(li + 1):
            layers[l][i] = []
        if entry < 0:
            entry, ent_level = i, li
            continue
        cache: dict = {}
        curr = entry
        for l in range(ent_level, li, -1):
            curr = _greedy_descend(
                V64[i], V64, lambda c, _l=l: layers[_l][c] or (), curr, cache
            )
        for l in range(min(ent_level, li), -1, -1):
            top = _search_layer(V64[i], V64, layers[l], curr, ef_construction, cache)
            for _, nb in top[:m]:
                layers[l][i].append(nb)
                layers[l][nb].append(i)
            if top:
                curr = top[0][1]
        if li > ent_level:
            entry, ent_level = i, li
    return levels, layers


def search_cell_graph(
    ids: np.ndarray,
    V: np.ndarray,
    levels: np.ndarray,
    layers: list,
    q: np.ndarray,
    ef: int,
    stats: dict | None = None,
) -> list[tuple[float, int]]:
    """Query one cell's graph (hnsw_index.h:223-262 twin): greedy descent
    from the entry point through the upper layers, level-0 beam with
    ``ef``.  Returns (dist, row_idx) ascending; caller takes global
    top-k.  ``ef >= len(ids)`` is provably exhaustive (module
    docstring).  ``stats``, when given, records ``dist_evals`` — the
    number of DISTINCT nodes whose distance the walk computed (the
    distance cache's size), i.e. the quantity the graph tier exists to
    bound vs the flat scan's |cell| (measured in scripts/sift_scale.py
    --large-cells)."""
    n = len(ids)
    if n == 0:
        return []
    max_l = int(levels.max())
    # entry = first inserted node holding the final max level == min idx
    entry = int(np.nonzero(levels == max_l)[0][0])
    q64 = q.astype(np.float64, copy=False)
    cache: dict = {}
    curr = entry
    for l in range(max_l, 0, -1):
        curr = _greedy_descend(
            q64, V, lambda c, _l=l: layers[_l][c] if layers[_l][c] is not None else (), curr, cache
        )
    out = _search_layer(q64, V, layers[0], curr, max(ef, 1), cache)
    if stats is not None:
        stats["dist_evals"] = len(cache)
    return out


def graph_rows(cell_id: int, ids: np.ndarray, levels, layers):
    """Flatten a built graph into sidecar rows:
    (centroid_id, vec_id, level, nbrs: list[list[vec_id]])."""
    out = []
    for i, vid in enumerate(ids):
        nbrs = [
            [int(ids[j]) for j in layers[l][i]]
            for l in range(levels[i] + 1)
        ]
        out.append((int(cell_id), int(vid), int(levels[i]), nbrs))
    return out


def layers_from_rows(ids: np.ndarray, levels: np.ndarray, nbrs_col) -> list:
    """Rebuild the row-index adjacency from sidecar rows (ids sorted
    ascending; nbrs_col[i] = list of per-layer vec-id lists)."""
    idx = {int(v): i for i, v in enumerate(ids)}
    max_l = int(levels.max()) if len(ids) else 0
    layers = [[None] * len(ids) for _ in range(max_l + 1)]
    for i, per_layer in enumerate(nbrs_col):
        for l, lst in enumerate(per_layer):
            layers[l][i] = [idx[int(v)] for v in lst]
    return layers
