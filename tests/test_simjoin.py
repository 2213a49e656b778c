"""similarity_pairs broadcast-contract dispatch (VERDICT r2 item 6).

The broadcastable-side strategy must be a checked bound, not a docstring
promise: over ``max_broadcast_rows`` the cosine path routes to the
both-sides-huge LSH tier (same output schema), and l2_sq — which has no
LSH tier — raises with guidance instead of collecting an unbounded table
to the driver.
"""

from __future__ import annotations

import pytest

from vector_search_engine_spark.operators.dedup import embedding_lsh_pairs
from vector_search_engine_spark.operators.simjoin import similarity_pairs


def test_cosine_over_bound_routes_to_lsh_tier(embeddings):
    from pyspark.sql import functions as F

    base = embeddings.select("vec_id", "embedding")
    # plant exact duplicates (sim=1.0) so both tiers must emit pairs
    vdf = base.union(
        base.filter(F.col("vec_id") < 50).withColumn(
            "vec_id", F.col("vec_id") + 100_000
        )
    )
    direct = {
        (r.id_a, r.id_b, r.sim)
        for r in embedding_lsh_pairs(vdf, threshold=0.9).collect()
    }
    routed = {
        (r.id_a, r.id_b, r.sim)
        for r in similarity_pairs(
            vdf, threshold=0.9, metric="cosine", max_broadcast_rows=10
        ).collect()
    }
    assert routed == direct and len(routed) > 0


def test_under_bound_stays_on_broadcast_path(embeddings):
    vdf = embeddings.select("vec_id", "embedding")
    n = vdf.count()
    exact = {
        (r.id_a, r.id_b, r.sim)
        for r in similarity_pairs(
            vdf, threshold=0.9, metric="cosine", max_broadcast_rows=n
        ).collect()
    }
    default = {
        (r.id_a, r.id_b, r.sim)
        for r in similarity_pairs(vdf, threshold=0.9, metric="cosine").collect()
    }
    assert exact == default
    # LSH tier is a recall<=1 subset of the exact pair set
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_lsh_pairs(vdf, threshold=0.9).collect()
    }
    assert lsh <= {(a, b) for a, b, _ in exact}


def test_l2_over_bound_raises_with_guidance(embeddings):
    vdf = embeddings.select("vec_id", "embedding")
    with pytest.raises(ValueError, match="max_broadcast_rows"):
        similarity_pairs(
            vdf, threshold=1.0, metric="l2_sq", max_broadcast_rows=10
        )


def test_over_bound_fallback_warns_and_optout_raises(embeddings):
    """The exact→LSH dispatch is a recall-contract change, so it must be
    observable: RuntimeWarning on auto-fallback, ValueError when the
    caller forbids the approximate tier (ADVICE r3 item 1)."""
    import warnings

    vdf = embeddings.select("vec_id", "embedding")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        similarity_pairs(
            vdf, threshold=0.9, metric="cosine", max_broadcast_rows=10
        )
    assert any(
        "LSH" in str(x.message)
        for x in w
        if issubclass(x.category, RuntimeWarning)
    )
    with pytest.raises(ValueError, match="allow_lsh_fallback"):
        similarity_pairs(
            vdf,
            threshold=0.9,
            metric="cosine",
            max_broadcast_rows=10,
            allow_lsh_fallback=False,
        )


# ---------------------------------------------------------------------------
# Edit-distance join (Ed-Join-style q-gram prefix filtering)
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


def test_edit_distance_pairs_planted(spark):
    from vector_search_engine_spark.operators.simjoin import edit_distance_pairs

    rows = [
        (1, "widget"),
        (2, "widgets"),     # dist 1 to widget
        (3, "gadget"),      # dist 2 to widget and midget, 3 to widgets
        (4, "midget"),      # dist 1 to widget, 2 to widgets
        (5, "bolt"),
        (6, "boat"),        # dist 1 to bolt
    ]
    df = spark.createDataFrame(rows, "key long, s string")
    got = {(r.key_a, r.key_b): r.dist for r in edit_distance_pairs(df, k=2).collect()}
    assert got == {(1, 2): 1, (1, 3): 2, (1, 4): 1, (2, 4): 2, (3, 4): 2, (5, 6): 1}


def test_edit_distance_pairs_dup_heavy_and_dedupe_equivalence(spark):
    """Duplicate-heavy corpus: the distinct-universe plan (dedupe_exact,
    default) and the direct plan agree with brute force — including the
    ED=0 identical-string pairs — and the dedupe plan's candidate join
    sees only the distinct universe (measured via stats_out)."""
    import itertools
    import random

    from vector_search_engine_spark.operators.simjoin import edit_distance_pairs

    random.seed(23)
    distinct = ["".join(random.choices("abc", k=random.randint(0, 8))) for _ in range(15)]
    rows = [(i, random.choice(distinct)) for i in range(120)]
    df = spark.createDataFrame(rows, "key long, s string")
    want = {
        (a, b, _lev(sa, sb))
        for (a, sa), (b, sb) in itertools.combinations(rows, 2)
        if _lev(sa, sb) <= 2
    }
    st_on, st_off = {}, {}
    got_on = {
        (r.key_a, r.key_b, r.dist)
        for r in edit_distance_pairs(df, k=2, stats_out=st_on).collect()
    }
    got_off = {
        (r.key_a, r.key_b, r.dist)
        for r in edit_distance_pairs(
            df, k=2, stats_out=st_off, dedupe_exact=False
        ).collect()
    }
    assert got_on == want
    assert got_off == want
    # the dedupe plan's candidate join runs over <= C(15,2) distinct
    # pairs; the direct plan pairs all 120 keys through the grams
    assert st_on["candidate_pairs"] <= 15 * 14 // 2
    assert st_off["candidate_pairs"] > st_on["candidate_pairs"]


def test_edit_distance_pairs_matches_bruteforce(spark):
    """Exactness gate: blocked plan == O(N^2) brute force, including the
    both-short channel (strings below the prefix-filter guarantee) and
    empty strings."""
    import itertools
    import random

    from vector_search_engine_spark.operators.simjoin import edit_distance_pairs

    for seed, alpha, k in [(7, "abc", 2), (11, "abcd", 1), (13, "ab", 3)]:
        random.seed(seed)
        strs = list(
            {"".join(random.choices(alpha, k=random.randint(0, 10))) for _ in range(70)}
        )
        df = spark.createDataFrame([(s, s) for s in strs], "key string, s string")
        got = {
            (r.key_a, r.key_b, r.dist)
            for r in edit_distance_pairs(df, k=k, q=2).collect()
        }
        want = {
            (a, b, _lev(a, b))
            for a, b in itertools.combinations(sorted(strs), 2)
            if _lev(a, b) <= k
        }
        assert got == want, f"seed={seed} k={k}: {len(got)} vs {len(want)}"


def test_edit_distance_stats_report_invariants(spark, sf_dir):
    """The Ed-Join planning report's accounting must be internally
    consistent (r16 oracle-graded shape): the coverage and pruning
    contracts hold, and verified matches the join's own row count."""
    from vector_search_engine_spark.registry import QUERIES

    row = QUERIES["simjoin_edit_distance_stats"](spark, sf_dir).collect()[0]
    assert row.n_strings > 0 and row.verified_pairs >= 0
    assert row.candidates_cover_verified is True
    assert row.prefix_filter_prunes is True
    joined = QUERIES["simjoin_edit_distance"](spark, sf_dir).count()
    # the report's verified count is the same join's output volume
    assert joined == row.verified_pairs
