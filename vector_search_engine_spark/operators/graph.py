"""Distributed connected components — near-dup CLUSTER assignment.

The dedup family (operators/dedup.py) emits *pairs*; a training-data
pipeline needs *clusters*: every document labeled with a canonical id so
one representative per near-dup group survives.  Pairs → clusters is
transitive closure, an inherently iterative computation no single
DataFrame expression covers — the missing altitude between the pair
operators and `pipeline_clean_corpus`.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the canonical
shuffle-based CC algorithm:

  large-star: for each node u, connect every *larger* neighbor to
              m = min(Γ(u) ∪ {u});
  small-star: connect every not-larger neighbor (and u) to m.

Each round is one symmetrize + one groupBy + one projection; the edge
set only shrinks toward a union of stars whose centers are the component
minima.  Convergence in O(log² n) rounds w.h.p. (near-dup graphs: 2-3
rounds), checked by an order-insensitive edge-set fingerprint
(count + xor of xxhash64) rather than a driver-side collect — at 100 TB each
round is a bounded shuffle on (node, neighbor) longs and nothing else.

No reference analog (the reference has no dedup surface at all); DuckDB
oracle = recursive-CTE min-label propagation over the same pair edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_engine_spark.operators.dedup import NGRAM_JACCARD_ORACLE


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large- or small-star round over an undirected edge list
    ``(u, v)`` kept as canonical pairs (u != v, both directions implied)."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nbrs = sym.groupBy("u").agg(
        F.collect_set("v").alias("vs"), F.min("v").alias("min_v")
    )
    m = F.least(F.col("u"), F.col("min_v"))
    out = nbrs.select(
        F.col("u"), m.alias("m"), F.explode("vs").alias("v")
    )
    if large:
        out = out.filter(F.col("v") > F.col("u"))
    else:
        out = out.filter(F.col("v") <= F.col("u")).union(
            nbrs.select("u", m.alias("m"), F.col("u").alias("v"))
        )
    return (
        out.select(
            F.least("v", "m").alias("u"), F.greatest("v", "m").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


# Deduped edge sets at or below this count take the single-pass driver
# union-find instead of the iterative star rounds: each star round costs
# two shuffles + an eager checkpoint + a fingerprint job, so at small
# edge counts the loop is pure fixed overhead (measured: 5.6 s for a 4k-
# edge graph that union-find labels in milliseconds — the dominant cost
# of pipeline_embedding_curation at bench sf).  1M canonical edges
# collect to ~16 MB — the simjoin max_broadcast_rows discipline applied
# to the CC input; above the bound the star rounds remain the only path
# (at 100 TB a dedup pair graph can be billions of edges).
CC_DRIVER_EDGE_BOUND = 1_000_000


def connected_components(
    edges: DataFrame,
    max_rounds: int = 20,
    stats_out: dict | None = None,
    max_driver_edges: int = CC_DRIVER_EDGE_BOUND,
) -> DataFrame:
    """Component label per node: ``(node long, component long)`` where
    component = min node id reachable.  ``edges`` needs columns (u, v).

    Two tiers, identical output BY CONSTRUCTION (both produce min-id
    labels over the same edge set; tier-identity pytest-pinned):

    * ``|E| <= max_driver_edges``: one collect of the deduped canonical
      edge list + driver union-find with min-id roots — zero iterative
      rounds.  The edge count is known before choosing (the dedup
      ``distinct`` is materialized once either way via the checkpoint).
    * above the bound: alternating large/small star rounds until the
      edge-set fingerprint is stable; the driver sees only
      (count, hash-sum) per round, never edges.

    ``stats_out``: optional dict that receives ``{"rounds": N, "tier":
    ...}`` — the scale-stress harness pins convergence round counts
    with it (``rounds`` is 0 on the union-find tier)."""
    cur = (
        edges.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = cur.count()
    if n_edges <= max_driver_edges:
        if stats_out is not None:
            stats_out["rounds"] = 0
            stats_out["tier"] = "driver_unionfind"
        spark = cur.sparkSession
        if n_edges == 0:
            return spark.createDataFrame([], "node long, component long")
        # Arrow transfer (two int64 columns, ~16 B/edge), not collect():
        # a Row list at the 1M bound would cost hundreds of MB of driver
        # objects for the same 16 MB of data
        pdf_edges = cur.toPandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for u, v in zip(
            pdf_edges["u"].to_numpy(), pdf_edges["v"].to_numpy()
        ):
            u, v = int(u), int(v)
            if u not in parent:
                parent[u] = u
            if v not in parent:
                parent[v] = v
            ru, rv = find(u), find(v)
            if ru != rv:
                # min-id root wins, so the root IS the component label
                if ru < rv:
                    parent[rv] = ru
                else:
                    parent[ru] = rv
        import numpy as np
        import pandas as pd

        nodes = np.fromiter(parent, dtype=np.int64, count=len(parent))
        comps = np.fromiter(
            (find(int(n)) for n in nodes), dtype=np.int64, count=len(nodes)
        )
        return spark.createDataFrame(
            pd.DataFrame({"node": nodes, "component": comps})
        )
    prev_fp = None
    rounds = 0
    for _ in range(max_rounds):
        rounds += 1
        cur = _star_round(cur, large=True)
        cur = _star_round(cur, large=False).localCheckpoint(eager=True)
        fp = _edge_fingerprint(cur)
        if fp == prev_fp:
            break
        prev_fp = fp
    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["tier"] = "star_rounds"
    # converged: stars centered at component minima — every non-center
    # node appears exactly once as v with u = its component min
    members = cur.select(F.col("v").alias("node"), F.col("u").alias("component"))
    centers = cur.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return members.union(centers).groupBy("node").agg(
        F.min("component").alias("component")
    )


def dedup_clusters(documents: DataFrame, pairs: DataFrame) -> DataFrame:
    """Cluster assignment for EVERY document: transitive closure of the
    near-dup ``pairs`` (doc_a, doc_b), canonical id = min doc_id in the
    cluster, singletons canonical by themselves — the exact shape a
    keep-one-per-cluster filter consumes."""
    comp = connected_components(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    labeled = (
        documents.select("doc_id")
        .join(comp, documents["doc_id"] == comp["node"], "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster_id"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id")
    return (
        labeled.withColumn("cluster_size", F.count("*").over(w).cast("long"))
        .withColumn(
            "is_canonical", (F.col("doc_id") == F.col("cluster_id")).cast("boolean")
        )
        .select("doc_id", "cluster_id", "cluster_size", "is_canonical")
    )


# Transitive closure as a recursive CTE: min-label propagation — every
# (node, reachable-label) pair enumerates once (UNION dedup terminates it),
# then min per node.  Fine at oracle scale; the Spark side is the scalable
# path.
DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE jp AS ({NGRAM_JACCARD_ORACLE}),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM jp
  UNION ALL SELECT doc_b, doc_a FROM jp
),
cc(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.u, cc.lbl FROM edges e JOIN cc ON cc.node = e.v
),
lab AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM cc GROUP BY node)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       doc_id = cluster_id AS is_canonical
FROM lab
"""


# ---------------------------------------------------------------------------
# PageRank (fixed-iteration power method) — node centrality over derived
# graphs (kNN graphs for coreset/representativeness scoring, near-dup
# graphs, click graphs)
# ---------------------------------------------------------------------------


def pagerank(
    edges: DataFrame,
    iterations: int = 8,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 2,
) -> DataFrame:
    """Fixed-iteration PageRank (Page et al. 1999) as repeated
    join-and-aggregate — the power-method step expressed relationally:

        pr'(v) = (1-d)/N + d * sum_{u -> v} pr(u) / outdeg(u)

    Returns ``(node long, pr double)`` after exactly ``iterations``
    steps from the uniform vector (a FIXED iteration count, not a
    convergence test, so the result is deterministic and
    oracle-expressible as an unrolled CTE chain).

    Scale shape (per iteration, nothing else):
      * one shuffle joining ranks to edges on ``src`` (edges carry their
        out-degree from a one-time join, persisted across iterations);
      * one map-side-partial aggregation of contributions by ``dst``;
      * one left join back onto the node set (nodes with no in-edges
        keep the (1-d)/N floor).
    Lineage is cut with an eager ``localCheckpoint`` every
    ``checkpoint_every`` iterations (and always on the last) so the plan
    stays O(checkpoint_every)-deep regardless of ``iterations``; on a
    real cluster the checkpoint also stops recomputation cascades under
    executor loss.  Default 2 (r14): per-iteration cuts paid a fixed
    job each round for nothing at small scale — 3.3 s → 2.8 s for 8
    iterations at sf0.1, bit-identical output — while a 2-deep lineage
    (one join + one agg + one join) is still a trivially re-computable
    plan; set 1 to restore per-iteration cuts on flaky clusters.

    Dangling nodes (appear only as ``dst``) contribute no mass — the
    usual out-regular-graph convention; kNN graphs (every node emits
    exactly k edges) have none, so total mass is conserved there up to
    the damping leak.  ``N`` (node count) is a driver scalar — one
    count of the distinct node set, unavoidable and cheap.

    The edge input is materialized FIRST: nodes, out-degrees and the
    degree-annotated edge set each derive from ``edges``, and when the
    caller hands over a lazy expensive plan (a kNN join, say) every
    derivation would re-run it — measured as a 4× wall blowup on the
    100k kNN-graph composition before this checkpoint existed
    (SCALING.md finding 18).
    """
    edges = edges.select(src_col, dst_col).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .union(edges.select(F.col(dst_col).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)  # read every iteration
    )
    deg = edges.groupBy(src_col).agg(
        F.count("*").cast("double").alias("outdeg")
    )
    # edges ⋈ outdeg once; reused every iteration
    ed = edges.join(deg, src_col).localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return edges.sparkSession.createDataFrame([], "node long, pr double")
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    cp = max(1, int(checkpoint_every))
    for i in range(iterations):
        contribs = (
            ed.join(
                ranks.select(F.col("node").alias(src_col), "pr"), src_col
            )
            .groupBy(F.col(dst_col).alias("node"))
            .agg(F.sum(F.col("pr") / F.col("outdeg")).alias("c"))
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))
            ).alias("pr"),
        )
        if (i + 1) % cp == 0 or i == iterations - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


# ---------------------------------------------------------------------------
# DBSCAN (Ester et al. KDD'96) — density clustering as an epsilon-graph
# composition: radius self-join -> degree gate -> connected components
# ---------------------------------------------------------------------------


def dbscan(
    vectors: DataFrame,
    eps_sq: float,
    min_pts: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: DataFrame | None = None,
    q_blocks: int = 4,
    v_blocks: int = 4,
) -> DataFrame:
    """Deterministic DBSCAN over an embedding column: ``(id, cluster_id,
    role)`` with role in {core, border, noise}.

    * **core** — at least ``min_pts`` points (self included) within
      squared-L2 ``eps_sq``;
    * **border** — non-core with a core point in range, assigned the
      SMALLEST cluster id among its core neighbors (classic DBSCAN
      leaves border assignment scan-order-dependent; min is the
      deterministic pin, same role id plays everywhere here);
    * **noise** — ``cluster_id = -1``.

    Cluster id = min core id in the density-connected component, from
    the same large-star/small-star ``connected_components`` the near-dup
    pipeline uses.  A core with no core neighbor is its own cluster.

    Plan shape: the epsilon graph comes from
    ``knn.radius_pairs_distributed`` (block GEMM self-join — shuffle is
    ``N * blocks`` rows, each unordered pair evaluated exactly once);
    degrees are one map-side-partial count over the symmetrized edge
    list; the component step only sees CORE-CORE edges (the density gate
    shrinks the graph before the iterative part); border assignment is
    one join + min-agg.  ``pairs`` accepts a precomputed
    ``(id_a, id_b, ...)`` within-eps pair set (e.g. from
    ``IVFIndex.radius_search``'s triangle-inequality pruned scan) so the
    quadratic exact generator is swappable at scale.
    """
    if pairs is None:
        from vector_search_engine_spark.operators.knn import (
            radius_pairs_distributed,
        )

        pairs = radius_pairs_distributed(
            vectors, eps_sq, q_blocks=q_blocks, v_blocks=v_blocks,
            id_col=id_col, vec_col=vec_col,
        )
    sym = pairs.select(
        F.col("id_a").alias("node"), F.col("id_b").alias("nbr")
    ).union(pairs.select(F.col("id_b").alias("node"), F.col("id_a").alias("nbr")))
    sym = sym.localCheckpoint(eager=True)  # pairs plan is expensive; 4 consumers
    deg = sym.groupBy("node").agg(F.count("*").alias("_deg"))
    core = deg.filter(F.col("_deg") + 1 >= min_pts).select("node")
    core_edges = (
        sym.join(core, "node")
        .join(core.select(F.col("node").alias("nbr")), "nbr")
        .select(F.col("node").alias("u"), F.col("nbr").alias("v"))
    )
    comp = connected_components(core_edges)
    core_lab = core.join(comp, "node", "left").select(
        "node", F.coalesce("component", "node").alias("cluster_id")
    )
    border_lab = (
        sym.join(core_lab.select(F.col("node").alias("nbr"), "cluster_id"), "nbr")
        .join(core, "node", "left_anti")
        .groupBy("node")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    base = vectors.select(F.col(id_col).cast("long").alias("node"))
    out = (
        base.join(core_lab.withColumnRenamed("cluster_id", "_c"), "node", "left")
        .join(border_lab.withColumnRenamed("cluster_id", "_b"), "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("_c", "_b", F.lit(-1)).cast("long").alias("cluster_id"),
            F.when(F.col("_c").isNotNull(), "core")
            .when(F.col("_b").isNotNull(), "border")
            .otherwise("noise")
            .alias("role"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Triangle counting (degree-oriented compact-forward) — local clustering
# structure over derived graphs (kNN graphs, near-dup graphs)
# ---------------------------------------------------------------------------


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts: ``(node long, triangles
    long)`` for every node of the undirected support of ``edges`` (u, v).

    Degree-oriented compact-forward (Latapy 2008 / the standard
    MapReduce formulation): orient every undirected edge from the
    endpoint with the smaller ``(degree, id)`` to the larger, making the
    orientation acyclic with out-degrees bounded by O(sqrt(E)) on any
    graph — so the wedge join below generates O(E^1.5) candidate rows
    worst case instead of the O(sum deg^2) a naive node-iterator pays on
    skewed graphs (the hub node's wedges land on the HIGH side of the
    orientation and never fan out).  Each triangle {a,b,c} is counted
    exactly once: with rank(a) < rank(b) < rank(c) it appears only as
    the wedge (b←a→c) closed by the oriented edge b→c.

    Plan: two key-partitioned hash joins (wedge build on the low
    endpoint, closure probe on the (b, c) pair) + one union-explode
    count with map-side partials.  No driver structures; the orientation
    is one degree agg + one broadcast-free struct comparison."""
    und = (
        edges.select(
            F.least(F.col(edges.columns[0]), F.col(edges.columns[1])).alias("u"),
            F.greatest(F.col(edges.columns[0]), F.col(edges.columns[1])).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        # pin the (possibly expensive — kNN join) edge input ONCE:
        # degrees, orientation, wedges and closure all derive from it
        # (SCALING.md finding 18's lesson)
        .localCheckpoint(eager=True)
    )
    sym = und.select("u", "v").union(
        und.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count("*").cast("long").alias("deg")
    )
    # rank = (deg, id) struct; orient low -> high
    ranked = (
        sym.join(deg.withColumnRenamed("node", "u"), "u")
        .withColumnRenamed("deg", "du")
        .join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v"
        )
        .select(
            "u", "v",
            F.struct(F.col("du"), F.col("u")).alias("ru"),
            F.struct(F.col("dv"), F.col("v")).alias("rv"),
        )
    )
    oriented = ranked.filter(F.col("ru") < F.col("rv")).select(
        F.col("u").alias("src"), F.col("v").alias("dst"),
        F.col("rv").alias("rdst"),
    )
    # wedges centered at the LOW-rank node a: (a -> b, a -> c), b<c by rank
    e1 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("b"),
        F.col("rdst").alias("rb"),
    )
    e2 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("c"),
        F.col("rdst").alias("rc"),
    )
    wedges = e1.join(e2, "a").filter(F.col("rb") < F.col("rc")).select(
        "a", "b", "c"
    )
    # closure: the (b, c) edge is oriented b -> c (rank(b) < rank(c))
    tri = wedges.join(
        oriented.select(
            F.col("src").alias("b"), F.col("dst").alias("c")
        ),
        ["b", "c"],
    )
    per_node = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("b").alias("node")))
        .union(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    nodes = sym.select(F.col("u").alias("node")).distinct()
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )


# ---------------------------------------------------------------------------
# Label propagation (synchronous, fixed-iteration) — community detection
# over derived graphs
# ---------------------------------------------------------------------------


def label_propagation(
    edges: DataFrame,
    iterations: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007), made
    deterministic and oracle-expressible: ``(node long, community
    long)`` after exactly ``iterations`` parallel update rounds over the
    undirected support of ``edges``.

    Each round, EVERY node simultaneously takes the most frequent label
    among its neighbors' previous-round labels, ties broken toward the
    SMALLER label (classic LPA resolves ties randomly and updates
    asynchronously in a random node order — both unpinnable across
    engines; the synchronous min-tie variant is deterministic, and the
    fixed iteration count sidesteps synchronous LPA's known 2-cycle
    oscillation non-termination).  Labels start as node ids.

    Scale shape per round: one shuffle joining labels onto the edge
    list's neighbor column, one (node, label) map-side-partial count,
    one row_number over each node's label histogram; lineage cut per
    round with an eager localCheckpoint (the CC / PageRank discipline).
    """
    from pyspark.sql import Window

    sym = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    sym = (
        sym.select("u", "v")
        .union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=True)  # pin before the iterative fan-out
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
    )
    w = Window.partitionBy("node").orderBy(
        F.col("c").desc(), F.col("lbl").asc()
    )
    for _ in range(iterations):
        hist = (
            sym.join(
                labels.select(F.col("node").alias("v"), "lbl"), "v"
            )
            .groupBy(F.col("u").alias("node"), "lbl")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            hist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
            .localCheckpoint(eager=True)
        )
    return labels.select("node", F.col("lbl").alias("community"))


def k_core(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
    certify: bool = False,
) -> DataFrame:
    """k-core of the undirected support of ``edges`` (Seidman 1983):
    the maximal subgraph in which every node has degree >= k — the
    density skeleton of a kNN/near-dup graph (training-data curation:
    k-core membership separates redundant dense regions from the
    informative sparse frontier; the complement of the outlier view).

    Synchronous peeling, determinized the LPA way: exactly ``rounds``
    parallel rounds of "drop every node whose CURRENT degree < k",
    which is oracle-expressible as unrolled CTEs.  Peeling is monotone
    (the surviving set only shrinks), so once a round removes nothing
    the result IS the true k-core fixpoint — callers pin ``rounds`` at
    a fixture-verified convergence count (pytest asserts round R ==
    round R+1), and at scale the round count needed is the peeling
    depth, typically O(log n) on kNN graphs.

    ``certify=True`` enforces that argument AT RUN TIME instead of
    trusting the caller's pin: one extra peeling round runs after the
    ``rounds`` loop, and if it still removes anything the function
    raises (the fixed-round result would be a silent superset of the
    true core — exactly the failure a deeper-than-fixture peeling
    order produces at 100 TB).  Cost: one more degree agg + two
    semi-joins + two counts — the certificate round's survivor set is
    already computed, so a converged run pays only the counts.

    Returns ``(node long, degree long)`` — survivors with their degree
    INSIDE the core subgraph.  Scale shape per round: one map-side
    partial degree count + two semi-joins (u and v endpoints) against
    the (degree >= k) survivor set; per-round lineage cut with an eager
    localCheckpoint (the CC / PageRank / LPA discipline)."""
    sym = (
        edges.select(
            F.least(src_col, dst_col).alias("u"),
            F.greatest(src_col, dst_col).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    cur = (
        sym.select("u", "v")
        .union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .localCheckpoint(eager=True)  # pin before the iterative fan-out
    )
    for _ in range(rounds):
        keep = (
            cur.groupBy("u")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("u")
        )
        cur = (
            cur.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    if certify:
        keep = (
            cur.groupBy("u")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("u")
        )
        nxt = cur.join(keep, "u", "left_semi").join(
            keep.select(F.col("u").alias("v")), "v", "left_semi"
        )
        before, after = cur.count(), nxt.count()
        if after < before:
            raise RuntimeError(
                f"k_core(rounds={rounds}, k={k}) did not reach the "
                f"fixpoint: a certification round still removed "
                f"{before - after} directed edges — the fixed-round "
                "result is a superset of the true k-core; increase "
                "`rounds` (peeling depth exceeds the pinned count)"
            )
    return (
        cur.groupBy("u")
        .agg(F.count("*").cast("long").alias("degree"))
        .select(F.col("u").alias("node"), "degree")
    )


# ---------------------------------------------------------------------------
# kNN-graph diagnostics: hubness (k-occurrence) and mutual-kNN pairs
# ---------------------------------------------------------------------------


def hubness_scores(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Per-node k-occurrence over a DIRECTED kNN edge set: ``(node long,
    k_occurrence long)`` — how many other points list this node among
    their k nearest neighbors (in-degree of the kNN digraph).

    The standard hubness diagnostic for embedding-space curation
    (Radovanovic et al., JMLR 2010): in high dimensions the
    k-occurrence distribution grows a heavy right tail — "hub" points
    that appear in a large fraction of neighbor lists dominate
    retrieval and near-dup candidate generation, while "anti-hubs"
    (k_occurrence = 0) are unreachable.  Both tails are emitted (the
    anti-hubs via the left join against the full node set), so a
    curation pipeline can downweight hubs / flag anti-hubs directly.

    Plan: one map-side-combined count aggregation on ``dst`` + one
    key-partitioned left join against ``nodes`` — no driver structures;
    at 100 TB the shuffle carries (node, count) longs only.  No
    reference analog (the reference never inverts its neighbor lists).

    ``edges``: directed (src, dst) — first two columns are used.
    ``nodes``: one row per node id — first column is used.
    """
    src_c, dst_c = edges.columns[0], edges.columns[1]
    node_c = nodes.columns[0]
    occ = (
        edges.select(F.col(dst_c).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("k_occurrence"))
    )
    return (
        nodes.select(F.col(node_c).cast("long").alias("node"))
        .join(occ, "node", "left")
        .select(
            "node",
            F.coalesce("k_occurrence", F.lit(0)).cast("long").alias("k_occurrence"),
        )
    )


def mutual_pairs(edges: DataFrame) -> DataFrame:
    """Mutual (reciprocal) kNN pairs of a DIRECTED kNN edge set:
    ``(id_a long, id_b long)`` with ``id_a < id_b``, one row per pair
    where BOTH directions are present (a lists b among its k nearest
    AND b lists a).

    Mutual-kNN is the classic robust edge filter: the mutual subgraph
    drops hub-induced asymmetric edges, which is why agglomerative /
    matching pipelines (entity resolution, near-dup verification,
    Chinese-whispers clustering) build on reciprocal pairs rather than
    the raw digraph.  Composes with connected_components / dedup_clusters
    for a hub-resistant clustering.

    Plan: canonicalize each directed edge to (least, greatest) plus a
    direction tag, then ONE count-distinct-direction aggregation per
    canonical pair — a single shuffle on the pair key (no self-join;
    the naive edges-join-edges form shuffles the edge set twice and
    doubles the skew exposure on hub keys)."""
    src_c, dst_c = edges.columns[0], edges.columns[1]
    canon = edges.select(
        F.least(F.col(src_c), F.col(dst_c)).cast("long").alias("id_a"),
        F.greatest(F.col(src_c), F.col(dst_c)).cast("long").alias("id_b"),
        (F.col(src_c) < F.col(dst_c)).alias("fwd"),
    ).filter(F.col("id_a") != F.col("id_b"))
    return (
        canon.groupBy("id_a", "id_b")
        .agg(F.count_distinct("fwd").alias("ndir"))
        .filter(F.col("ndir") == 2)
        .select("id_a", "id_b")
    )
