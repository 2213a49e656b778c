"""Similarity threshold joins over embedding columns.

Capability upgrade over the reference (it has no joins — SURVEY.md §2.7);
foundation for embedding-based near-duplicate detection.

Physical strategies, chosen by the caller by data shape:

* ``similarity_pairs`` (default here): one side broadcast as a dense
  NumPy matrix, the other streamed through ``mapInPandas``; each Arrow
  batch does a single GEMM and emits only pairs above threshold.  Right
  when one side fits in executor memory (catalogs up to ~10M x 64 floats
  = 2.5 GB).  Self-join emits ``id_a < id_b`` once.
* LSH blocking (``operators.dedup.embedding_lsh_pairs``): both sides
  huge — bucket by random hyperplane signs, join within buckets, verify
  exactly.  Approximate recall, exact precision.

The naive ``crossJoin`` + SQL-expression cosine is deliberately not used:
at sf0.1 it is ~100x slower than the GEMM path and at 100 TB it is a
full O(N^2) shuffle with per-row lambda evaluation.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def similarity_pairs(
    vectors: DataFrame,
    threshold: float,
    metric: str = "cosine",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    max_broadcast_rows: int = 2_000_000,
    allow_lsh_fallback: bool = True,
) -> DataFrame:
    """All pairs (id_a < id_b) with similarity >= threshold (cosine) or
    squared distance <= threshold (l2_sq).  Broadcast-GEMM self-join.

    The broadcast contract is ENFORCED, not assumed: the collect is capped
    at ``max_broadcast_rows + 1`` rows, and when the table exceeds the
    bound the call auto-dispatches to the both-sides-huge tier
    (``operators.dedup.embedding_lsh_pairs``, cosine only — same
    ``(id_a, id_b, sim)`` schema, approximate recall / exact precision)
    instead of OOMing the driver.  The dispatch is a CONTRACT CHANGE —
    exact recall degrades to the LSH probability curve — so it is never
    silent: it emits a ``RuntimeWarning`` naming both tiers, and callers
    that require exactness can pass ``allow_lsh_fallback=False`` to get a
    ``ValueError`` at the boundary instead.  ``l2_sq`` has no LSH tier;
    an oversize l2_sq input raises with guidance rather than collecting
    anyway.
    """
    if metric not in ("cosine", "l2_sq"):
        raise ValueError(metric)
    spark = vectors.sparkSession
    # Bounded probe: never pulls more than the declared broadcast budget
    # into the driver, even when the table is 100 TB.
    rows = (
        vectors.select(id_col, vec_col).limit(max_broadcast_rows + 1).collect()
    )
    if len(rows) > max_broadcast_rows:
        if metric == "cosine" and round_to == 4 and allow_lsh_fallback:
            import warnings

            warnings.warn(
                "similarity_pairs: input exceeds max_broadcast_rows="
                f"{max_broadcast_rows}; dispatching to the approximate-"
                "recall LSH tier (embedding_lsh_pairs). Precision stays "
                "exact (pairs are verified); recall follows the LSH "
                "probability curve. Pass allow_lsh_fallback=False to "
                "raise instead, or raise max_broadcast_rows explicitly.",
                RuntimeWarning,
                stacklevel=2,
            )
            from vector_search_engine_spark.operators.dedup import (
                embedding_lsh_pairs,
            )

            return embedding_lsh_pairs(
                vectors, threshold=threshold, id_col=id_col, vec_col=vec_col
            )
        raise ValueError(
            f"similarity_pairs: input exceeds max_broadcast_rows="
            f"{max_broadcast_rows} and "
            + (
                "allow_lsh_fallback=False forbids the approximate tier"
                if metric == "cosine" and round_to == 4
                else f"metric={metric!r}/round_to={round_to} has no LSH "
                "fallback"
            )
            + "; use metric='cosine' (routes to embedding_lsh_pairs) or "
            "raise max_broadcast_rows explicitly."
        )
    out_schema = "id_a long, id_b long, " + (
        "sim double" if metric == "cosine" else "dist_sq double"
    )
    if not rows:
        return spark.createDataFrame([], out_schema)
    ids_b = np.array([r[0] for r in rows], dtype=np.int64)
    B = np.array([r[1] for r in rows], dtype=np.float64)
    # norms kept separate: sim = dot / (na*nb), dot FIRST — dividing the
    # vectors first perturbs exact-zero dots off the threshold boundary
    # (the oracle computes dot-then-divide; arithmetic order is contract)
    nb = np.linalg.norm(B, axis=1)
    bc = spark.sparkContext.broadcast((ids_b, B, nb))
    val_col = "sim" if metric == "cosine" else "dist_sq"

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b_, B_, nb_ = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_a = pdf[id_col].to_numpy(dtype=np.int64)
            A = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if metric == "cosine":
                na = np.linalg.norm(A, axis=1)
                denom = na[:, None] * nb_[None, :]
                denom[denom == 0.0] = 1.0  # zero-norm pair -> sim 0 (dot is 0)
                S = (A @ B_.T) / denom
                ii, jj = np.nonzero(
                    (S >= threshold) & (ids_a[:, None] < ids_b_[None, :])
                )
            else:
                S = (
                    (A * A).sum(axis=1)[:, None]
                    - 2.0 * (A @ B_.T)
                    + (B_ * B_).sum(axis=1)[None, :]
                )
                np.maximum(S, 0.0, out=S)
                ii, jj = np.nonzero(
                    (S <= threshold) & (ids_a[:, None] < ids_b_[None, :])
                )
            yield pd.DataFrame(
                {
                    "id_a": ids_a[ii],
                    "id_b": ids_b_[jj],
                    val_col: S[ii, jj],
                }
            )

    out = vectors.select(id_col, vec_col).mapInPandas(block, schema=out_schema)
    return out.select("id_a", "id_b", F.round(F.col(val_col), round_to).alias(val_col))


# ---------------------------------------------------------------------------
# Edit-distance similarity join (Ed-Join-style q-gram prefix filtering)
# ---------------------------------------------------------------------------

_ED_PAD = "\x01"  # sentinel for q-gram padding; harmless if it appears in
# data (it only changes gram identities, which can add candidates, never
# drop a true pair — the final levenshtein verify keeps precision exact)


def edit_distance_pairs(
    strings: DataFrame,
    k: int = 2,
    q: int = 2,
    key_col: str = "key",
    str_col: str = "s",
    stats_out: dict | None = None,
    dedupe_exact: bool = True,
) -> DataFrame:
    """All pairs ``(key_a < key_b)`` with ``levenshtein(s_a, s_b) <= k``.

    Ed-Join-style plan (Xiao, Wang & Lin, VLDB 2008 — public): pad each
    string with ``q-1`` sentinels on both ends, extract positional
    q-grams, keep only the first ``k*q + 1`` grams per string under a
    global (document-frequency asc, gram, pos) order — the prefix-filter
    guarantee that any pair within edit distance ``k`` shares at least
    one prefix gram whose positions differ by at most ``k`` — then join
    prefixes on the gram, length-band + position filter, and verify the
    surviving candidates with the exact JVM ``levenshtein``.

    No false negatives: an edit destroys at most ``q`` positional
    q-grams, so ED <= k leaves a matching of size >= max(|Ga|,|Gb|) -
    k*q between the padded gram multisets, and prefixes of length
    ``k*q+1`` under one global total order must contain a matched pair;
    matched occurrences shift position by at most ``k``.  That bound is
    vacuous when the LONGER string has <= k*q grams (max_len <=
    q*(k-1)+1) — such both-short pairs go through a second channel that
    joins the short-string set on an exploded length band instead of
    grams (hash join on length, never a cartesian).  No false
    positives: every candidate from either channel is re-verified
    exactly.

    Plan shape at 100 TB: the gram-frequency table is bounded by the
    charset (``|alphabet|^q`` keys — broadcast); each string contributes
    at most ``k*q+1`` prefix postings, so the candidate join shuffles
    O(k*q*N) rows on the gram key, with the df-ascending order steering
    prefixes toward RARE grams (small join groups — the skew guard);
    verification is one JVM levenshtein per surviving candidate.  The
    naive O(N^2) crossJoin never appears.

    Regime note (measured, SCALING.md finding 16): the POSTING volume is
    O(k*q*N) unconditionally, but the CANDIDATE count is
    sum-over-prefix-grams of the gram's pairing volume — bounded by the
    corpus's prefix-group structure, not by N.  On a template-heavy
    corpus (many strings sharing their rare prefix grams) candidates
    grow with the squared group sizes; df-ascending steering cannot
    rescue data that genuinely repeats.  ``dedupe_exact`` (default on)
    folds the standard mitigation for the worst offender — byte-identical
    strings — INTO the join: the gram/candidate/verify pipeline runs over
    the DISTINCT string universe (one md5-keyed group rep per distinct
    value; rep = min key), identical-string pairs are emitted directly as
    ED=0 through one hash self-join on the 16-byte signature, and each
    verified distinct pair expands to its key cross-product through two
    signature-keyed hash joins.  Results are identical (pytest-gated
    against brute force with heavy duplicates); the candidate join's
    input shrinks from N strings to N_distinct, which is quadratic
    leverage on dup-heavy corpora (SCALING finding 16's measured win).
    Residual templates that differ by a few bytes still pair
    quadratically — that normalization belongs upstream; a high
    candidates/verified ratio in ``stats_out`` is the signal.
    """
    src = strings.select(
        F.col(key_col).alias("_key"), F.col(str_col).alias("_s")
    )
    if dedupe_exact:
        sig = src.select(
            "_key", "_s", F.md5(F.col("_s")).alias("_sig")
        )
        # rep per distinct string = min key; text shuffles once (the
        # groupBy) and the membership map carries only (key, 16-byte sig)
        reps = sig.groupBy("_sig").agg(F.min("_key").alias("_rep"))
        work = (
            sig.join(reps, "_sig")
            .filter(F.col("_key") == F.col("_rep"))
            .select("_key", "_s")
        )
    else:
        work = src
    prefix_len = k * q + 1
    padded = F.concat(
        F.lit(_ED_PAD * (q - 1)), F.col("_s"), F.lit(_ED_PAD * (q - 1))
    )
    base = work.select(
        "_key",
        "_s",
        F.length("_s").alias("_len"),
        padded.alias("_p"),
    )
    # substring with a column start index needs expr()
    grams = base.select(
        "_key",
        "_len",
        F.posexplode(
            F.expr(f"transform(sequence(1, length(_p) - {q - 1}), i -> substring(_p, i, {q}))")
        ).alias("_i0", "g"),
    ).select("_key", "_len", "g", (F.col("_i0") + 1).alias("pos"))
    dfs = grams.groupBy("g").agg(F.count("*").alias("_df"))
    pref = (
        grams.join(F.broadcast(dfs), "g")
        .groupBy("_key", "_len")
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("_df", "g", "pos"))),
                1,
                prefix_len,
            ).alias("_pr")
        )
        .select(
            "_key",
            "_len",
            F.explode("_pr").alias("_t"),
        )
        .select("_key", "_len", F.col("_t.g").alias("g"), F.col("_t.pos").alias("pos"))
    )
    a = pref.select(
        F.col("_key").alias("key_a"), F.col("_len").alias("_la"), "g",
        F.col("pos").alias("_pa"),
    )
    b = pref.select(
        F.col("_key").alias("key_b"), F.col("_len").alias("_lb"), "g",
        F.col("pos").alias("_pb"),
    )
    cand = (
        a.join(b, "g")
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= k)
            & (F.abs(F.col("_pa") - F.col("_pb")) <= k)
        )
        .select("key_a", "key_b")
    )
    # both-short channel: pairs where even the longer string has <= k*q
    # grams carry no prefix-filter guarantee; join shorts on a length
    # band (lb in [la-k, la+k]).  Population bounded by the short-string
    # universe (|alphabet|^(q*(k-1)+1) distinct values — run the join
    # over distinct strings when short keys repeat heavily).
    short_max = q * (k - 1) + 1
    shorts = base.filter(F.col("_len") <= short_max)
    cand_short = (
        shorts.select(
            F.col("_key").alias("key_a"),
            F.explode(
                F.sequence(
                    F.greatest(F.col("_len") - k, F.lit(0)), F.col("_len") + k
                )
            ).alias("_lb"),
        )
        .join(
            shorts.select(
                F.col("_key").alias("key_b"), F.col("_len").alias("_lb")
            ),
            "_lb",
        )
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
    )
    cand = cand.union(cand_short).distinct()
    if stats_out is not None:
        # diagnostic-only extra job: the pre-verification candidate count
        # (the prefix filter's selectivity — what scale_stress.py pins
        # against the O(k·q·N·group) bound vs the N² cross product).
        # The candidate set is PERSISTED first so the count job and the
        # verify join share one execution of the gram/candidate pipeline
        # — an unpersisted count would silently double the dominant cost
        # inside any timed caller.  The cache lives until evicted or the
        # session clears it; stats_out is a diagnostic path, not serving.
        from pyspark import StorageLevel

        cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
        stats_out["candidate_pairs"] = cand.count()
    sa = base.select(F.col("_key").alias("key_a"), F.col("_s").alias("_sa"))
    sb = base.select(F.col("_key").alias("key_b"), F.col("_s").alias("_sb"))
    verified = (
        cand.join(sa, "key_a")
        .join(sb, "key_b")
        .withColumn("dist", F.levenshtein("_sa", "_sb"))
        .filter(F.col("dist") <= k)
        .select("key_a", "key_b", F.col("dist").cast("long").alias("dist"))
    )
    if not dedupe_exact:
        return verified
    # expand rep-level matches back to the full key universe:
    #   * identical strings (same sig) pair at ED=0 via one hash
    #     self-join on the 16-byte signature — never through the grams;
    #   * each verified distinct pair (rep_a < rep_b, groups disjoint)
    #     crosses its two membership sets via two sig-keyed hash joins;
    #     least/greatest restores the key_a < key_b contract.
    m = sig.select("_key", "_sig")
    within = (
        m.select(F.col("_key").alias("key_a"), "_sig")
        .join(m.select(F.col("_key").alias("key_b"), "_sig"), "_sig")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", F.lit(0).cast("long").alias("dist"))
    )
    ra = reps.select(F.col("_rep").alias("key_a"), F.col("_sig").alias("_siga"))
    rb = reps.select(F.col("_rep").alias("key_b"), F.col("_sig").alias("_sigb"))
    cross = (
        verified.join(ra, "key_a")
        .join(rb, "key_b")
        .join(
            m.select(F.col("_key").alias("_ka"), F.col("_sig").alias("_siga")),
            "_siga",
        )
        .join(
            m.select(F.col("_key").alias("_kb"), F.col("_sig").alias("_sigb")),
            "_sigb",
        )
        .select(
            F.least("_ka", "_kb").alias("key_a"),
            F.greatest("_ka", "_kb").alias("key_b"),
            "dist",
        )
    )
    return within.unionByName(cross)
