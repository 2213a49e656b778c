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
