"""Text-analysis + dedup operator tests: Python-oracle parity for the
kernels, recall/precision gates for the approximate (LSH) families using
planted duplicates."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_engine_spark import load_table
from vector_search_engine_spark.operators import dedup as dedup_ops
from vector_search_engine_spark.operators import text_ops


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def _py_tokens(text: str) -> list[str]:
    return [t for t in text.strip().split(" ") if t]


def _py_shingles(toks: list[str], n: int = 3) -> set[str]:
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_doc_stats_against_python(documents):
    rows = {r.doc_id: r for r in text_ops.doc_stats(documents).collect()}
    for r in documents.limit(50).collect():
        toks = _py_tokens(r.text)
        got = rows[r.doc_id]
        assert got.n_tokens == len(toks)
        assert got.n_uniq_tokens == len(set(toks))
        if toks:
            # abs=1e-4: engine output is rounded HALF_UP at 4 decimals
            # (matching DuckDB); Python round() is banker's, so compare raw
            assert got.avg_token_len == pytest.approx(
                sum(map(len, toks)) / len(toks), abs=1e-4
            )


def test_incremental_dedup_signature_table_path(spark, documents):
    """The seen side may be a pre-hashed signature table (text_md5
    column only — the artifact a rolling pipeline keeps); results must
    be identical to hashing the seen corpus's text directly, and keep
    semantics must match a full exact_dedup of the union."""
    batch = documents.filter(F.col("doc_id") % 3 == 0)
    seen = documents.filter(F.col("doc_id") % 3 != 0)
    from_text = dedup_ops.incremental_dedup(batch, seen)
    sigs = dedup_ops.exact_dedup(seen).select("text_md5").distinct()
    from_sigs = dedup_ops.incremental_dedup(batch, sigs)
    assert sorted(map(tuple, from_text.collect())) == sorted(
        map(tuple, from_sigs.collect())
    )
    # cross-check keep against full-corpus exact dedup: a batch doc is
    # kept iff it is its hash group's canonical doc in the UNION (seen
    # ids are all != 0 mod 3; canonical = min doc_id — but seen docs
    # always outrank batch docs here only when their id is smaller, so
    # compare via group membership instead: kept <=> no seen doc shares
    # the hash AND it's the batch's min for that hash)
    full = dedup_ops.exact_dedup(documents).collect()
    by_hash: dict[str, list[int]] = {}
    for r in full:
        by_hash.setdefault(r.text_md5, []).append(r.doc_id)
    for r in from_text.collect():
        ids = by_hash[r.text_md5]
        seen_ids = [i for i in ids if i % 3 != 0]
        batch_ids = [i for i in ids if i % 3 == 0]
        assert r.seen_before == bool(seen_ids)
        assert r.first_in_batch == (r.doc_id == min(batch_ids))
        assert r.keep == (not seen_ids and r.doc_id == min(batch_ids))


def test_jaccard_pairs_against_python(documents):
    docs = {r.doc_id: r for r in documents.collect()}
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ops.ngram_jaccard_pairs(documents).collect()
    }
    # recompute expected pairs in pure Python
    expected = {}
    items = sorted(docs.values(), key=lambda r: r.doc_id)
    for i, a in enumerate(items):
        for b in items[i + 1 :]:
            if abs(a.n_chars - b.n_chars) > dedup_ops.LENGTH_BAND:
                continue
            sa, sb = _py_shingles(_py_tokens(a.text)), _py_shingles(_py_tokens(b.text))
            uni = len(sa | sb)
            if uni == 0:
                continue
            j = len(sa & sb) / uni
            if j >= dedup_ops.JACCARD_THRESHOLD:
                expected[(a.doc_id, b.doc_id)] = round(j, 4)
    assert got == expected
    assert len(expected) > 0  # fixture has planted near-dups


def test_minhash_lsh_recall_and_precision(documents):
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup_ops.ngram_jaccard_pairs(documents).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ops.minhash_lsh_pairs(documents).collect()
    }
    # precision is exact by construction (verified pairs)
    # note: LSH has no length-blocking, so it may legitimately find
    # high-jaccard pairs outside the length band; check containment the
    # other way with jaccard recomputation
    docs = {r.doc_id: r for r in documents.collect()}
    for (a, b), j in lsh.items():
        sa = _py_shingles(_py_tokens(docs[a].text))
        sb = _py_shingles(_py_tokens(docs[b].text))
        assert round(len(sa & sb) / len(sa | sb), 4) == j
        assert j >= dedup_ops.JACCARD_THRESHOLD
    # recall vs exact pairs
    found = sum(1 for p in exact if p in lsh)
    assert found / len(exact) >= 0.8


def test_simhash_pairs_are_verified(documents):
    pairs = dedup_ops.simhash_pairs(documents).collect()
    sigs = {
        r.doc_id: r.simhash
        for r in dedup_ops.simhash_signatures(documents).collect()
    }
    for r in pairs[:50]:
        ham = bin((sigs[r.doc_a] ^ sigs[r.doc_b]) & (2**64 - 1)).count("1")
        assert ham == r.hamming
        assert ham <= dedup_ops.SIMHASH_MAX_HAMMING


def test_exact_dedup_with_planted_dups(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "  alpha   beta gamma "),  # whitespace-normalized dup of 1
        (3, "ALPHA BETA GAMMA"),  # case-normalized dup of 1
        (4, "something else entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_ops.exact_dedup(df).collect()}
    assert out[1].canonical_id == 1 and not out[1].is_duplicate
    assert out[2].canonical_id == 1 and out[2].is_duplicate
    assert out[3].canonical_id == 1 and out[3].is_duplicate
    assert out[4].canonical_id == 4 and out[4].group_size == 1


def test_embedding_lsh_recall_on_planted_neardups(spark):
    rng = np.random.default_rng(123)
    base = rng.normal(0, 1, (100, 32)).astype(np.float64)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    # plant 10 near-dups: id 1000+i ~= id i (cosine ~0.995)
    planted = []
    for i in range(10):
        v = base[i] + rng.normal(0, 0.05, 32)
        v /= np.linalg.norm(v)
        rows.append((1000 + i, [float(x) for x in v]))
        planted.append((i, 1000 + i))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b)
        for r in dedup_ops.embedding_lsh_pairs(df, threshold=0.9).collect()
    }
    found = sum(1 for p in planted if p in got)
    assert found >= 9  # ~0.998 theoretical recall per pair
    # precision: every returned pair verified >= threshold by construction
    vecs = {r[0]: np.array(r[1]) for r in rows}
    for a, b in got:
        va, vb = vecs[a], vecs[b]
        assert va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)) >= 0.9 - 1e-9


def test_lang_id_deterministic(documents):
    out = text_ops.lang_id(documents)
    assert out.count() == documents.count()
    preds = {r.predicted_lang for r in out.collect()}
    assert preds <= {"en", "de", "es", "fr", "zh"}


def test_token_budget_sample_prefix_and_deterministic(spark, documents):
    """Kept set is the exact hash-order prefix whose running token sum
    fits the budget, per source; pure function of (doc_id, salt,
    budget) — identical on a repartitioned input."""
    out = text_ops.token_budget_sample(documents, budget=300).collect()
    assert out, "budget=300 must keep at least one doc per fixture source"
    by_src: dict[str, list] = {}
    for r in out:
        assert r.cum_tokens <= 300
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r.rn)
        # contiguous prefix of the hash walk: rn = 1..m
        assert [r.rn for r in rows] == list(range(1, len(rows) + 1))
        # running sum is consistent with the per-doc counts
        cum = 0
        for r in rows:
            cum += r.n_tokens
            assert r.cum_tokens == cum
    got1 = {(r.source, r.doc_id) for r in out}
    got2 = {
        (r.source, r.doc_id)
        for r in text_ops.token_budget_sample(
            documents.repartition(13), budget=300
        ).collect()
    }
    assert got1 == got2


def test_dedup_keep_best_one_per_cluster_quality_ordered(spark, documents):
    """dedup_keep_best emits exactly one doc per near-dup cluster, and
    it is the (keep DESC, n_words DESC, doc_id ASC) argmax of the
    cluster — the quality-aware representative."""
    from vector_search_engine_spark.operators import dedup as dedup_ops
    from vector_search_engine_spark.operators import graph as graph_ops

    clusters = graph_ops.dedup_clusters(
        documents, dedup_ops.ngram_jaccard_pairs(documents)
    )
    q = text_ops.quality_filter(documents).select("doc_id", "n_words", "keep")
    full = {
        r.doc_id: r
        for r in clusters.join(q, "doc_id").collect()
    }
    by_cluster: dict[int, list] = {}
    for r in full.values():
        by_cluster.setdefault(r.cluster_id, []).append(r)

    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.col("keep").desc(), F.col("n_words").desc(), F.col("doc_id")
    )
    kept = (
        clusters.join(q, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "cluster_id", "cluster_size", "n_words", "keep")
        .collect()
    )
    assert len(kept) == len(by_cluster)
    for r in kept:
        best = min(
            by_cluster[r.cluster_id],
            key=lambda x: (not x.keep, -x.n_words, x.doc_id),
        )
        assert r.doc_id == best.doc_id


def test_capped_sample_is_exact_and_deterministic(spark, documents):
    out1 = text_ops.capped_source_sample(documents, cap=7)
    counts = {r.source: r.n for r in out1.groupBy("source").agg(F.count("*").alias("n")).collect()}
    per_source = {
        r.source: r.n
        for r in documents.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, n in per_source.items():
        assert counts[src] == min(7, n)
    # pure function of (doc_id, salt, cap): identical on a repartitioned input
    got1 = {(r.source, r.doc_id) for r in out1.collect()}
    got2 = {
        (r.source, r.doc_id)
        for r in text_ops.capped_source_sample(documents.repartition(13), cap=7).collect()
    }
    assert got1 == got2


def test_simhash_batch_matches_scalar_reference():
    import pandas as pd

    texts = [
        "",
        None,
        "alpha",
        "alpha beta gamma alpha",
        "  padded   tokens  here ",
        "the quick brown fox jumps over the lazy dog " * 20,
        "unicode tøkens émoji ☃ mixed",
    ]
    got = dedup_ops._simhash64_batch(pd.Series(texts))
    for txt, sig in zip(texts, got):
        toks = [t for t in (txt or "").strip().split(" ") if t]
        assert sig == dedup_ops._simhash64(toks), txt


def test_simhash_jvm_signatures_match_scalar_reference(spark):
    """The zero-Python signature path (md5 via F.md5 + conv, bit-vote
    sums) must stay in lockstep with the scalar Python reference."""
    import pandas as pd

    texts = [
        "",
        None,
        "alpha",
        "alpha beta gamma alpha",
        "  padded   tokens  here ",
        "tab\tinside and trailing newline\n",
        "the quick brown fox jumps over the lazy dog " * 20,
        "unicode tøkens émoji ☃ mixed",
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )
    got = {
        r.doc_id: r.simhash
        for r in dedup_ops.simhash_signatures_jvm(df).collect()
    }
    for i, txt in enumerate(texts):
        toks = [t for t in (txt or "").strip().split(" ") if t]
        assert got[i] == dedup_ops._simhash64(toks), repr(txt)


def test_ppjoin_identical_to_single_scan_tier(documents):
    """Prefix filtering is exactness-preserving: the PPJoin plan must emit
    byte-identical pairs to the single-scan postings tier."""
    base = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ops.ngram_jaccard_pairs(documents).collect()
    }
    pp = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ops.ngram_jaccard_pairs_ppjoin(documents).collect()
    }
    assert pp == base


def test_train_val_split_stable_under_corpus_growth(documents):
    """Per-doc hash split: dropping half the corpus must not flip any
    surviving doc's assignment (the failure mode of randomSplit)."""
    full = {
        r["doc_id"]: r["split"]
        for r in text_ops.train_val_split(documents).collect()
    }
    half = {
        r["doc_id"]: r["split"]
        for r in text_ops.train_val_split(
            documents.filter(F.col("doc_id") % 2 == 0)
        ).collect()
    }
    assert half == {d: s for d, s in full.items() if d % 2 == 0}
    n_val = sum(1 for s in full.values() if s == "val")
    assert 0.03 < n_val / len(full) < 0.25  # ~10% nominal


def test_pack_sequences_bin_invariants(documents):
    rows = text_ops.pack_sequences(documents, capacity=512).collect()
    by_source: dict = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    assert sum(len(v) for v in by_source.values()) == documents.count()
    for docs in by_source.values():
        docs.sort(key=lambda r: r["doc_id"])
        bins: dict = {}
        last_bin = 0
        for r in docs:
            assert r["bin_id"] >= last_bin  # monotone in doc order
            last_bin = r["bin_id"]
            bins.setdefault(r["bin_id"], []).append(r)
        max_doc = max(r["n_tokens"] for r in docs)
        for b, members in bins.items():
            total = sum(r["n_tokens"] for r in members)
            # overflow bounded by one doc; bins never split a doc
            assert total <= 512 + max_doc


def _await_warning(records, needle: str, timeout_s: float = 5.0) -> bool:
    """The truncation warning fires from the observation watcher thread
    once the caller's first action completes — poll briefly for it."""
    import time as _time

    deadline = _time.time() + timeout_s
    while _time.time() < deadline:
        if any(needle in str(x.message) for x in records):
            return True
        _time.sleep(0.05)
    return False


def test_minhash_bucket_cap_truncates_and_warns(spark):
    """Degenerate LSH keys (identical boilerplate) must not become an
    unbounded single-task pair explosion: buckets over max_bucket keep the
    max_bucket smallest ids, and the truncation is observable (attached
    Observation) + warned, never silent."""
    import warnings

    rows = [
        (i, "identical boilerplate text that repeats verbatim in every doc")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = dedup_ops.minhash_lsh_pairs(df, max_bucket=4)
        pairs = {(r.doc_a, r.doc_b) for r in out.collect()}
        m = out.lsh_bucket_observation.get
        assert m["n_truncated"] and m["n_truncated"] > 0
        assert _await_warning(w, "truncated")
    # deterministic survivors: the 4 smallest doc_ids, all C(4,2) pairs
    assert pairs == {(a, b) for a in range(4) for b in range(4) if a < b}
    # the default cap leaves ordinary buckets alone — all pairs, no truncation
    out2 = dedup_ops.minhash_lsh_pairs(df)
    assert len(out2.collect()) == 20 * 19 // 2
    m2 = out2.lsh_bucket_observation.get
    assert not m2["n_truncated"]


def test_simhash_bucket_cap_truncates_and_warns(spark):
    import warnings

    rows = [
        (i, "identical boilerplate text that repeats verbatim in every doc")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = dedup_ops.simhash_pairs(df, max_bucket=4)
        pairs = {(r.doc_a, r.doc_b) for r in out.collect()}
        assert out.lsh_bucket_observation.get["n_truncated"] > 0
        assert _await_warning(w, "truncated")
    assert pairs == {(a, b) for a in range(4) for b in range(4) if a < b}


def test_bucket_watch_thread_bounded_on_abandoned_plan(spark):
    """A plan that is built but never executed must release its watcher
    thread after the poll deadline instead of leaking it blocked forever."""
    import threading
    import time as _time

    from pyspark.sql.observation import Observation

    def watchers() -> int:
        return sum(
            1 for t in threading.enumerate() if "bucket-watch" in t.name
        )

    base = watchers()
    df = spark.createDataFrame([(1, "abandoned plan")], "doc_id long, text string")
    for _ in range(3):
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("n_buckets"),
                   F.count(F.lit(1)).alias("n_truncated"))  # never executed
        dedup_ops._watch_truncated_buckets(obs, "test-op", 4, timeout=1.0)
    assert watchers() >= base + 1  # they do start
    deadline = _time.time() + 10.0
    while _time.time() < deadline and watchers() > base:
        _time.sleep(0.2)
    assert watchers() == base  # and they all exit once the window closes


def test_minhash_optin_postings_cache_same_output(spark, documents):
    """postings_storage opts into the persist + eager-finalize path for
    expensive-scan storage; pair output must be identical to the default
    recompute path, and the cache must not outlive the call."""
    from pyspark import StorageLevel

    default = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_ops.minhash_lsh_pairs(documents).collect()
    }
    n_cached_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    cached = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_ops.minhash_lsh_pairs(
            documents, postings_storage=StorageLevel.MEMORY_AND_DISK
        ).collect()
    }
    assert cached == default and len(default) > 0
    # the postings cache must not outlive the call (no per-call leak)
    n_cached_after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert n_cached_after <= n_cached_before + 1  # localCheckpoint RDD only


def test_repetition_stats_flags_planted_repetition(spark):
    rows = [
        (1, "a", "unique words only here now today friend"),
        (2, "a", "spam spam spam spam spam spam spam spam"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in text_ops.repetition_stats(df).collect()}
    assert not out[1].is_repetitive and out[1].gram2_rep_ratio == 0.0
    # 8 tokens -> 7 2-grams, all "spam spam": ratio 1 - 1/7
    assert out[2].is_repetitive
    assert out[2].gram2_rep_ratio == pytest.approx(1 - 1 / 7, abs=1e-4)
    assert out[2].n_uniq_2grams == 1 and out[2].n_2grams == 7


def test_decontaminate_planted_overlap(spark):
    # doc 7 (7 % 10 == 7) plays the eval set; doc 1 lifts a phrase from it
    rows = [
        (7, "the quick brown fox jumps over the lazy dog"),
        (1, "note that the quick brown fox jumps high"),  # 3 shared 3-grams
        (2, "completely different content with no shared trigrams at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text_ops.decontaminate(df).collect()}
    assert 7 not in out  # eval docs are not scored as training docs
    assert out[1].n_overlap == 3 and out[1].contaminated
    assert out[2].n_overlap == 0 and not out[2].contaminated


def test_decontaminate_external_eval_table(spark):
    # a real benchmark table supplied as eval_docs: the whole corpus is
    # scored (no modulo carve), including doc_ids that would have been
    # carved out by the fixture default
    corpus_rows = [
        (7, "note that the quick brown fox jumps high"),  # 3 shared 3-grams
        (2, "completely different content with no shared trigrams at all"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    eval_docs = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string"
    )
    out = {
        r.doc_id: r
        for r in text_ops.decontaminate(corpus, eval_docs=eval_docs).collect()
    }
    # doc 7 is scored as TRAINING data now (7 % 10 == 7 must not carve it)
    assert out[7].n_overlap == 3 and out[7].contaminated
    assert out[2].n_overlap == 0 and not out[2].contaminated


def test_pii_scrub_redacts_planted_pii(spark):
    rows = [
        (1, "mail alice.smith+x@corp.example.org now"),
        (2, "server at 10.0.255.3 rebooted"),
        (3, "call +1 555 0123 456 or 555-867-5309 today"),
        (4, "clean text with no identifiers at all"),
        (5, "both bob@x.io and 192.168.1.1 and 555 123 4567"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text_ops.pii_scrub(df).collect()}
    assert out[1].n_emails == 1 and out[1].scrubbed_text == "mail <EMAIL> now"
    assert out[2].n_ips == 1 and out[2].scrubbed_text == "server at <IP> rebooted"
    assert out[3].n_phones == 2
    assert "<PHONE>" in out[3].scrubbed_text and "555" not in out[3].scrubbed_text
    assert not out[4].had_pii and out[4].scrubbed_text == rows[3][1]
    assert (out[5].n_emails, out[5].n_ips, out[5].n_phones) == (1, 1, 1)
    assert out[5].had_pii


def test_pii_scrub_email_not_double_counted_as_phone(spark):
    # digit-heavy local part: must scrub as ONE email, zero phones
    df = spark.createDataFrame(
        [(1, "reach 12345678@digits.example.com ok")], "doc_id long, text string"
    )
    r = text_ops.pii_scrub(df).collect()[0]
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 0, 0)
    assert r.scrubbed_text == "reach <EMAIL> ok"


def test_quality_filter_rules_fire_individually(spark):
    long_good = "the quality of this corpus is rather good and wordy " * 6
    rows = [
        (1, "a", long_good.strip()),                     # passes everything
        (2, "a", "the of short text is that"),           # too few words
        (3, "a", ("xx " * 60 + "the of is").strip()),    # no stopword fail, short words
        (4, "a", ("99 " * 60 + "the of and is that it for a in to").strip()),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: r for r in text_ops.quality_filter(df).collect()}
    assert out[1].keep and out[1].reject_reasons == ""
    assert not out[2].keep and "n_words" in out[2].reject_reasons
    assert not out[3].keep and "mean_word_len" in out[3].reject_reasons
    # doc 4: 60 of 70 words are pure digits -> alpha fraction 10/70 < 0.8
    assert not out[4].keep and "alpha_frac" in out[4].reject_reasons
    assert out[4].stopword_hits >= 2  # stopword rule alone does NOT fire


def test_quality_filter_empty_text(spark):
    df = spark.createDataFrame([(1, "a", "")], "doc_id long, source string, text string")
    r = text_ops.quality_filter(df).collect()[0]
    assert not r.keep
    assert r.n_words == 0 and r.mean_word_len == 0.0 and r.alpha_word_frac == 0.0


def test_ngram_stats_surfaces_planted_boilerplate(spark):
    boiler = "subscribe to our newsletter"
    rows = [(i, "web", f"{boiler} article {i} body text") for i in range(10)]
    rows += [(100, "web", "completely unrelated words here"),
             (200, "books", "a quiet chapter about nothing much")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = text_ops.ngram_stats(df, top_k=3)
    rows_out = out.collect()
    web = sorted(
        (r for r in rows_out if r.source == "web"), key=lambda r: r.rank
    )
    # all rank-1..3 bigrams are the 10-occurrence template grams, ordered
    # by the deterministic (count desc, ngram asc) tie-break
    assert [r.ngram for r in web] == [
        "body text", "newsletter article", "our newsletter"
    ]
    assert all(r.n_occurrences == 10 and r.n_docs == 10 for r in web)
    # per-source partitioning: books ranks independently of web
    assert any(r.source == "books" and r.rank == 1 for r in rows_out)


def test_dup_span_stats_planted_copy(spark):
    base = "one two three four five six seven eight nine ten"
    rows = [
        (1, base),                                   # fully copied by 2
        (2, base + " eleven twelve thirteen fourteen fifteen"),
        (3, "totally different words with no overlap at all here"),
        (4, "tiny"),                                 # < n tokens: zero spans
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text_ops.dup_span_stats(df, n=5).collect()}
    # doc 1: all 6 of its 5-gram spans appear in doc 2
    assert out[1].n_spans == 6 and out[1].n_dup_spans == 6
    assert out[1].dup_span_frac == 1.0 and out[1].mostly_duplicated
    # doc 2: 11 spans, the 6 copied ones are dup
    assert out[2].n_spans == 11 and out[2].n_dup_spans == 6
    assert not out[3].mostly_duplicated and out[3].n_dup_spans == 0
    assert out[4].n_spans == 0 and out[4].dup_span_frac == 0.0


def test_unigram_stats_flags_rare_token_docs(spark):
    common = "the cat sat on the mat and the dog ran off today " * 3
    rows = [
        (1, common.strip()),
        (2, common.strip()),
        (3, "zqxj vvkw pplm qqrs ttuv"),  # all tokens unique corpus-wide
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text_ops.unigram_stats(df).collect()}
    assert out[3].rare_frac == 1.0  # every token appears once
    assert out[1].rare_frac < 0.2   # common docs share all their tokens
    assert out[1].mean_token_freq_ppm > out[3].mean_token_freq_ppm
    assert out[4].n_tokens == 0 and out[4].rare_frac == 0.0
    # identical docs get identical stats
    assert tuple(out[1])[1:] == tuple(out[2])[1:]


def test_mixture_sample_quotas_and_determinism(spark, documents):
    out = text_ops.mixture_sample(documents)
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    # quota = weight * B, exactly filled, weight from the source suffix
    bs = {s: rs[0].quota // rs[0].weight for s, rs in by_src.items()}
    assert len(set(bs.values())) == 1  # one global batch multiplier
    for s, rs in by_src.items():
        w = 1 + int(s[3:]) % 4
        assert rs[0].weight == w
        assert len(rs) == rs[0].quota == w * next(iter(bs.values()))
        assert max(r.sample_rank for r in rs) == len(rs)
    # deterministic under repartitioning
    again = {
        (r.source, r.doc_id)
        for r in text_ops.mixture_sample(documents.repartition(13)).collect()
    }
    assert {(r.source, r.doc_id) for r in rows} == again


def test_chunk_documents_windows_and_edges(spark):
    text40 = " ".join(f"w{i}" for i in range(1, 101))  # 100 tokens
    rows = [(1, text40), (2, "a b c"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_ops.chunk_documents(df, chunk_tokens=40, overlap=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    # starts advance by 32: 1, 33, 65 — the last window clips to 100
    assert [(r.start_tok, r.end_tok) for r in c1] == [(1, 40), (33, 72), (65, 100)]
    assert c1[0].chunk_text.startswith("w1 w2 ") and c1[0].n_chunk_tokens == 40
    assert c1[2].n_chunk_tokens == 36
    # consecutive chunks overlap by exactly `overlap` tokens
    assert c1[0].chunk_text.split()[-8:] == c1[1].chunk_text.split()[:8]
    # short doc -> one clipped chunk; empty doc -> no rows
    assert [(r.start_tok, r.end_tok, r.chunk_text) for r in by_doc[2]] == [
        (1, 3, "a b c")
    ]
    assert 3 not in by_doc
    with pytest.raises(ValueError, match="overlap"):
        text_ops.chunk_documents(df, chunk_tokens=8, overlap=8)


def test_mixture_sample_non_numeric_source_defaults_weight_one(spark):
    rows = [(i, "web", f"doc {i} text") for i in range(4)]
    rows += [(10 + i, "src1", f"doc {10+i} text") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = text_ops.mixture_sample(df)
    weights = {r.source: r.weight for r in out.collect()}
    assert weights["web"] == 1  # non-numeric suffix -> default weight
    assert weights["src1"] == 2

def test_mixture_sample_explicit_weight_table(spark, documents):
    """The production path: a (source, weight) config DataFrame overrides
    the fixture's suffix derivation; omitted sources default to weight 1;
    the sample stays deterministic and exactly quota-filled."""
    srcs = sorted(r.source for r in documents.select("source").distinct().collect())
    named = srcs[:2]
    wtab = spark.createDataFrame(
        [(named[0], 3), (named[1], 1)], "source string, weight long"
    )
    out = text_ops.mixture_sample(documents, weights=wtab).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert by_src[named[0]][0].weight == 3
    assert by_src[named[1]][0].weight == 1
    for s in srcs[2:]:
        assert by_src[s][0].weight == 1  # omitted -> default
    bs = {s: rs[0].quota // rs[0].weight for s, rs in by_src.items()}
    assert len(set(bs.values())) == 1
    for s, rs in by_src.items():
        assert len(rs) == rs[0].quota == rs[0].weight * next(iter(bs.values()))
    # passing the derived weights explicitly reproduces the default output
    derived = spark.createDataFrame(
        [(s, 1 + int(s[3:]) % 4) for s in srcs], "source string, weight long"
    )
    a = {(r.source, r.doc_id) for r in text_ops.mixture_sample(documents).collect()}
    b = {
        (r.source, r.doc_id)
        for r in text_ops.mixture_sample(documents, weights=derived).collect()
    }
    assert a == b

def test_mixture_sample_duplicate_and_invalid_weight_rows(spark, documents):
    """A sloppy config with duplicate source rows must not fan out the
    per-source stats row (resolved as max(weight), matching the oracle),
    and weight <= 0 must clamp to 1 instead of producing a null/negative
    batch multiplier."""
    srcs = sorted(r.source for r in documents.select("source").distinct().collect())
    dup = spark.createDataFrame(
        [(srcs[0], 2), (srcs[0], 3), (srcs[1], 0), (srcs[1], -5)],
        "source string, weight long",
    )
    out = text_ops.mixture_sample(documents, weights=dup).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    # duplicates resolved to max, not fanned out
    assert by_src[srcs[0]][0].weight == 3
    assert len(by_src[srcs[0]]) == by_src[srcs[0]][0].quota
    assert len({r.doc_id for r in by_src[srcs[0]]}) == len(by_src[srcs[0]])
    # invalid weights clamped to 1
    assert by_src[srcs[1]][0].weight == 1
    # equivalent clean config produces the identical sample
    clean = spark.createDataFrame(
        [(srcs[0], 3), (srcs[1], 1)], "source string, weight long"
    )
    a = {(r.source, r.doc_id) for r in out}
    b = {
        (r.source, r.doc_id)
        for r in text_ops.mixture_sample(documents, weights=clean).collect()
    }
    assert a == b

def test_unigram_stats_long_doc_exact_and_bounded(spark):
    """Aggregation state per doc is a handful of counters, not a
    per-token array — a long document must stream through, and its mean
    token frequency must equal the exact rational value (sum of corpus
    counts over total*n, computed here with Python ints)."""
    from collections import Counter

    long_tokens = [f"t{i % 997}" for i in range(200_000)]  # 200k-token doc
    rows = [(1, " ".join(long_tokens)), (2, "alpha beta alpha"), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text_ops.unigram_stats(df).collect()}

    corpus = long_tokens + ["alpha", "beta", "alpha"]
    cnt = Counter(corpus)
    total = sum(cnt.values())
    for doc_id, toks in ((1, long_tokens), (2, ["alpha", "beta", "alpha"])):
        n = len(toks)
        sum_cnt = sum(cnt[t] for t in toks)
        expected = round(sum_cnt / total / n * 1_000_000.0, 4)
        assert out[doc_id].n_tokens == n
        assert out[doc_id].mean_token_freq_ppm == expected
    assert out[3].n_tokens == 0 and out[3].mean_token_freq_ppm == 0.0


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------


def test_semantic_dedup_hand_built_clusters(spark):
    """Known geometry: v1 duplicates v0 (same cluster), v2 is orthogonal;
    in cluster 1, v4 near-duplicates v3; v5 duplicates v0's direction but
    sits in ANOTHER cluster so blocking must keep it."""
    from vector_search_engine_spark.operators import dedup as dedup_ops

    rows = [
        (0, 0, [1.0, 0.0, 0.0]),
        (1, 0, [0.999, 0.01, 0.0]),   # cos ~0.9999 with v0 -> dup_of 0
        (2, 0, [0.0, 1.0, 0.0]),      # orthogonal -> keep
        (3, 1, [0.0, 0.0, 1.0]),
        (4, 1, [0.0, 0.02, 0.998]),   # near-dup of v3 -> dup_of 3
        (5, 1, [1.0, 0.0, 0.0]),      # = v0 but other cluster -> keep
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    out = {
        r.vec_id: (r.keep, r.dup_of)
        for r in dedup_ops.semantic_dedup(df, threshold=0.95).collect()
    }
    assert out == {
        0: (True, None),
        1: (False, 0),
        2: (True, None),
        3: (True, None),
        4: (False, 3),
        5: (True, None),
    }


def test_semantic_dedup_chain_semantics_and_determinism(spark):
    """SemDeDup neighborhood (not transitive-closure) semantics: v2 is
    near v1 but not near v0; it is still dropped (lower-id neighbor v1
    matches) with dup_of = 1 even though v1 itself was dropped.  Output
    is stable under repartitioning."""
    import math

    from vector_search_engine_spark.operators import dedup as dedup_ops

    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0]

    # angles 0, 18, 36 deg; cos(18deg)=0.951 > tau=0.94, cos(36deg)=0.809 < tau
    rows = [(i, 0, unit(math.radians(18 * i))) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<float>")
    out = {
        r.vec_id: (r.keep, r.dup_of)
        for r in dedup_ops.semantic_dedup(df, threshold=0.94).collect()
    }
    assert out == {0: (True, None), 1: (False, 0), 2: (False, 1)}
    again = {
        r.vec_id: (r.keep, r.dup_of)
        for r in dedup_ops.semantic_dedup(
            df.repartition(5), threshold=0.94
        ).collect()
    }
    assert again == out


def test_semantic_dedup_fixture_has_work_and_row_parity(spark, embeddings):
    """At the fixture threshold the corpus contains real dups (the
    constant was gap-chosen, not vacuous), every input row appears
    exactly once, and keepers never cite a dup_of."""
    from vector_search_engine_spark.operators import dedup as dedup_ops

    out = dedup_ops.semantic_dedup(embeddings).collect()
    assert len(out) == embeddings.count()
    assert len({r.vec_id for r in out}) == len(out)
    dropped = [r for r in out if not r.keep]
    assert dropped, "fixture threshold should produce some dups"
    for r in out:
        assert r.keep == (r.dup_of is None)
        if r.dup_of is not None:
            assert r.dup_of < r.vec_id


def test_weighted_sample_es_biases_toward_heavy_docs(spark):
    """A-ES semantics: with weight ratios of ~10^6, every heavy doc is
    selected ahead of the light ones (P(miss) is astronomically small,
    and the draw is deterministic given the salt — so this asserts the
    fixed outcome, not a flaky statistic).  Also pins the plan: global
    top-k must be TakeOrderedAndProject (partial per-partition top-k),
    not a full sort shuffle."""
    rows = [(i, "src0", "x", 3) for i in range(100)] + [
        (1000 + i, "src1", "y" * 100, 3_000_000) for i in range(5)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string, n_chars long"
    )
    out = text_ops.weighted_sample_es(docs, k=20)
    got = out.collect()
    assert len(got) == 20
    heavy = {r.doc_id for r in got if r.doc_id >= 1000}
    assert heavy == {1000, 1001, 1002, 1003, 1004}
    # ranks are 1..20, dense, aligned with the key order
    assert sorted(r.rank for r in got) == list(range(1, 21))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_substring_spans_planted_cross_doc_copy(spark):
    shared = "alpha beta gamma delta epsilon zeta eta"        # 7 tokens
    rows = [
        (1, "intro words here " + shared + " trailing bits"),  # shared at 4..10
        (2, shared + " unrelated suffix tokens go on"),        # shared at 1..7
        (3, "completely different text with no overlap in any window at all"),
        (4, "rho sigma tau upsilon phi " * 2),                  # self-repeat only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_ops.substring_spans(df, n=5).collect()
    spans = {(r.doc_id): r for r in out}
    # docs 1 and 2 each surface exactly one maximal span covering the
    # shared 7 tokens (3 overlapping 5-gram windows merged)
    assert set(spans) == {1, 2}
    assert (spans[1].span_start, spans[1].span_end) == (4, 10)
    assert (spans[2].span_start, spans[2].span_end) == (1, 7)
    for d in (1, 2):
        assert spans[d].n_shingles == 3 and spans[d].span_tokens == 7
        assert spans[d].span_text == shared
    # doc 4's repetition is intra-document only -> not cross-doc dup


def test_substring_spans_merges_adjacent_not_distant(spark):
    a = "p1 p2 p3 p4 p5"
    b = "q1 q2 q3 q4 q5"
    gap = " x1 x2 x3 x4 x5 x6 "  # 6 tokens between the two shared runs
    rows = [
        (1, a + gap + b),
        (2, a + " filler one two three four five six seven " + b),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text_ops.substring_spans(df, n=5).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    # 6-token gap > n=5 -> two separate spans per doc
    assert sorted(per_doc[1]) == [(1, 5), (12, 16)]


def test_substring_dedup_clean_cuts_exactly_the_spans(spark):
    shared = "alpha beta gamma delta epsilon zeta eta"
    rows = [
        (1, "intro words here " + shared + " trailing bits"),
        (2, shared + " unrelated suffix tokens go on"),
        (3, "survives untouched because nothing here repeats elsewhere"),
        (4, shared),                                          # fully removed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in text_ops.substring_dedup_clean(df, n=5).collect()}
    assert out[1].clean_text == "intro words here trailing bits"
    assert out[1].removed_tokens == 7 and out[1].n_tokens == 12
    assert out[2].clean_text == "unrelated suffix tokens go on"
    assert out[3].clean_text == rows[2][1] and out[3].removed_tokens == 0
    assert out[4].clean_text == "" and out[4].removed_tokens == 7


# ---------------------------------------------------------------------------
# Frequent n-gram mining (Misra–Gries candidates + exact recount)
# ---------------------------------------------------------------------------


def _py_ngram_counts(texts: list[str], n: int = 3) -> dict[str, int]:
    counts: dict[str, int] = {}
    for t in texts:
        toks = _py_tokens(t)
        for i in range(max(len(toks) - n + 1, 0)):
            g = " ".join(toks[i : i + n])
            counts[g] = counts.get(g, 0) + 1
    return counts


def _fn(spark, texts, **kw):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    # multiple partitions so the merge across summaries is exercised
    return {
        r["gram"]: r["cnt"]
        for r in text_ops.frequent_ngrams(df.repartition(7), **kw).collect()
    }


def test_frequent_ngrams_exact_at_default_capacity(spark):
    texts = (
        ["subscribe to our newsletter today"] * 9
        + ["all rights reserved worldwide"] * 4
        + [f"unique filler text number {i} here" for i in range(30)]
    )
    want = {
        g: c
        for g, c in _py_ngram_counts(texts).items()
        if c >= 4
    }
    got = _fn(spark, texts, threshold=4)
    assert got == want


def test_frequent_ngrams_exact_under_tiny_forced_capacity(spark):
    # capacity far below vocabulary: the MG prune path runs for real,
    # yet the recount keeps the output exact — the operator's core claim
    texts = (
        ["the quick brown fox jumps"] * 12
        + ["lorem ipsum dolor sit amet"] * 7
        + [f"one off doc {i} a b c d e f g" for i in range(40)]
    )
    exact = _py_ngram_counts(texts)
    n_total = sum(exact.values())
    threshold = 7
    # guarantee needs threshold > N/(cap+1)  =>  cap >= N/threshold
    cap = n_total // threshold + 1
    st: dict = {}
    got = _fn(spark, texts, threshold=threshold, capacity=cap, stats_out=st)
    want = {g: c for g, c in exact.items() if c >= threshold}
    assert got == want
    # candidate set is a superset of the answer, bounded by the summary
    assert st["n_candidates"] >= len(want)
    assert st["summary_rows"] <= st["capacity"] * 32 + 32  # cap+1 per part
    assert st["capacity"] == cap


def test_frequent_ngrams_fixture_matches_groupby(documents):
    got = {
        r["gram"]: r["cnt"]
        for r in text_ops.frequent_ngrams(documents, threshold=5).collect()
    }
    brute = (
        documents.select(
            F.explode(
                text_ops.word_shingles(
                    text_ops.tokens(F.col("text")), 3
                )
            ).alias("g")
        )
        .groupBy("g")
        .count()
        .filter(F.col("count") >= 5)
        .collect()
    )
    want = {r["g"]: r["count"] for r in brute}
    assert got == want
    assert len(got) > 0  # fixture genuinely has boilerplate


def test_frequent_ngrams_guard_rejects_undersized_capacity(spark):
    # threshold <= N/(capacity+1) voids the superset guarantee; the
    # operator must refuse (with the minimum viable capacity named)
    # rather than silently drop qualifying grams
    texts = ["a b c d e f g h i j"] * 30  # N = 240 grams
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="need capacity >="):
        text_ops.frequent_ngrams(df, threshold=2, capacity=3).count()


def test_frequent_ngrams_no_hitters(spark):
    got = _fn(
        spark,
        [f"w{3 * i} w{3 * i + 1} w{3 * i + 2} w{3 * i}" for i in range(5)],
        threshold=3,
    )
    assert got == {}


def test_source_kl_matches_python_reference(spark, sf_dir):
    import math

    from vector_search_engine_spark import load_table
    from vector_search_engine_spark.operators import text_ops

    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select("source", "text").collect()
    st, ns, tt, n = {}, {}, {}, 0
    for r in rows:
        for t in r.text.strip().split(" "):
            if not t:
                continue
            st[(r.source, t)] = st.get((r.source, t), 0) + 1
            ns[r.source] = ns.get(r.source, 0) + 1
            tt[t] = tt.get(t, 0) + 1
            n += 1
    exp = {}
    for (s, t), c in st.items():
        p = c / ns[s]
        q = tt[t] / n
        exp[s] = exp.get(s, 0.0) + p * math.log(p / q)
    exp = {s: round(v, 6) for s, v in exp.items()}
    got = {
        r.source: r.kl_divergence
        for r in text_ops.source_kl_divergence(docs).collect()
    }
    assert got == exp
    assert all(v >= 0 for v in got.values())  # KL >= 0 (Gibbs)


def test_bigram_logprob_matches_python_reference(spark, sf_dir):
    import math

    from vector_search_engine_spark import load_table
    from vector_search_engine_spark.operators import text_ops

    docs = load_table(spark, sf_dir, "documents")
    rows = docs.select("doc_id", "text").collect()
    doc_bgs, c12, c1 = {}, {}, {}
    for r in rows:
        t = [x for x in r.text.strip().split(" ") if x]
        bgs = [(t[i], t[i + 1]) for i in range(len(t) - 1)]
        if bgs:
            doc_bgs[r.doc_id] = bgs
        for b in bgs:
            c12[b] = c12.get(b, 0) + 1
            c1[b[0]] = c1.get(b[0], 0) + 1
    exp = {}
    for d, bgs in doc_bgs.items():
        s = sum(math.log(c1[b[0]]) - math.log(c12[b]) for b in bgs)
        exp[d] = (len(bgs), round(s / len(bgs), 6))
    got = {
        r.doc_id: (r.n_bigrams, r.avg_neg_logprob)
        for r in text_ops.bigram_logprob(docs).collect()
    }
    assert got == exp


def test_bigram_logprob_flags_scrambled_doc(spark):
    """A document whose transitions never repeat scores strictly higher
    than one made of the corpus's dominant pattern."""
    from vector_search_engine_spark.operators import text_ops

    rep = "a b " * 40  # dominant transition a->b, b->a
    docs = [(1, rep), (2, rep), (3, "a q b r a s b t a u b v")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.avg_neg_logprob
           for r in text_ops.bigram_logprob(df).collect()}
    assert got[3] > got[1]
    # two identical docs score identically
    assert got[1] == got[2]


def test_source_overlap_minhash_tracks_exact(spark, sf_dir):
    """The bottom-k sketch's Jaccard estimates must track the exact
    overlap matrix (Broder estimator, k=256 → std err ~1/√k ≈ 0.06;
    measured mean abs err on the fixture is ~0.007)."""
    from vector_search_engine_spark import load_table
    from vector_search_engine_spark.operators import text_ops as t

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.source_a, r.source_b): r.jaccard
        for r in t.source_overlap(docs).collect()
    }
    est = {
        (r.source_a, r.source_b): r.jaccard_est
        for r in t.source_overlap_minhash(docs).collect()
    }
    assert set(est) >= set(exact)  # sketch emits every pair
    errs = [abs(exact.get(k, 0.0) - v) for k, v in est.items()]
    assert max(errs) <= 0.12
    assert sum(errs) / len(errs) <= 0.05


def test_source_psi_matches_python_reference(spark):
    """PSI over corpus-decile bins vs a direct python computation with
    the identical bucket rule (1 + #boundaries strictly below)."""
    import math

    import numpy as np

    from vector_search_engine_spark.operators import text_ops as t

    rng = np.random.default_rng(2)
    rows = [
        (int(i), "x", f"src{i % 4}", int(v))
        for i, v in enumerate(
            np.concatenate(
                [rng.integers(10, 100, 300), rng.integers(500, 900, 100)]
            )
        )
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars long"
    )
    got = {r.source: r.psi for r in t.source_psi(docs).collect()}

    vals = np.array([r[3] for r in rows], dtype=float)
    bounds = [np.percentile(vals, 10 * i) for i in range(1, 10)]
    def bucket(v): return 1 + sum(v > b for b in bounds)
    from collections import Counter
    per = {}
    corpus = Counter(bucket(v) for v in vals)
    n = len(vals)
    for s in {r[2] for r in rows}:
        sv = [r[3] for r in rows if r[2] == s]
        cs = Counter(bucket(v) for v in sv)
        psi = sum(
            (c / len(sv) - corpus[b] / n)
            * math.log((c / len(sv)) / (corpus[b] / n))
            for b, c in cs.items()
        )
        assert abs(got[s] - psi) < 1e-5, (s, got[s], psi)


def test_leakage_safe_split_properties(spark, documents):
    """r13: the split key is the near-dup cluster — so (1) no cluster
    straddles splits (THE leakage guard), (2) assignment is a pure
    function of cluster id (re-running or re-partitioning changes
    nothing), (3) every doc appears exactly once, (4) the bucket ratios
    roughly honor 80/10/10 at cluster granularity."""
    from vector_search_engine_spark.operators import graph as graph_ops

    pairs = dedup_ops.ngram_jaccard_pairs(documents)
    clusters = graph_ops.dedup_clusters(documents, pairs)
    split = text_ops.leakage_safe_split(documents, clusters).cache()
    n_docs = documents.count()
    assert split.count() == n_docs
    assert split.select("doc_id").distinct().count() == n_docs
    # (1) one split per cluster
    per_cluster = split.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_cluster.filter(F.col("n_splits") > 1).count() == 0
    # near-dup pairs specifically never straddle
    straddle = (
        pairs.join(
            split.select(F.col("doc_id").alias("doc_a"),
                         F.col("split").alias("sa")), "doc_a")
        .join(split.select(F.col("doc_id").alias("doc_b"),
                           F.col("split").alias("sb")), "doc_b")
        .filter(F.col("sa") != F.col("sb"))
    )
    assert straddle.count() == 0
    # (2) determinism under repartitioning
    again = text_ops.leakage_safe_split(
        documents.repartition(7), clusters.repartition(5)
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, split.collect())
    )
    # (4) ratios at cluster granularity (binomial tolerance)
    frac = (
        split.select("cluster_id", "split").distinct()
        .groupBy("split").count().collect()
    )
    tot = sum(r["count"] for r in frac)
    by = {r["split"]: r["count"] / tot for r in frac}
    assert 0.65 < by.get("train", 0) < 0.93
    assert 0.02 < by.get("val", 0) < 0.25
    assert 0.02 < by.get("test", 0) < 0.25
    split.unpersist()


def test_mixture_temperature_weights_invariants(spark, documents):
    """Weights sum to 1; alpha=0.5 compresses the distribution toward
    uniform (tail sources upsample, head sources downsample); exact
    counts match a direct agg."""
    out = text_ops.mixture_temperature_weights(documents).collect()
    assert abs(sum(r.weight for r in out) - 1.0) < 1e-3
    assert abs(sum(r.nat_share for r in out) - 1.0) < 1e-3
    for r in out:
        if r.nat_share < 1.0 / len(out):
            assert r.upsample_factor >= 1.0, r
        elif r.nat_share > 1.0 / len(out):
            assert r.upsample_factor <= 1.0, r
    direct = {
        r.source: (r.n, r.c)
        for r in documents.groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("c"))
        .collect()
    }
    for r in out:
        assert (r.n_docs, r.n_chars) == direct[r.source]


def test_minhash_portable_verified_and_recalls(documents):
    """The portable (salted-md5 family) variant: precision exact by
    construction (every emitted pair's jaccard recomputed in Python),
    recall vs the exact pair set in the same band as the xxhash64 row
    — a different hash family draws different band buckets, but the
    planted near-dups sit far above the 1-(1-j^4)^4 curve's knee."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in dedup_ops.ngram_jaccard_pairs(documents).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ops.minhash_lsh_pairs_portable(documents).collect()
    }
    docs = {r.doc_id: r for r in documents.collect()}
    for (a, b), j in lsh.items():
        sa = _py_shingles(_py_tokens(docs[a].text))
        sb = _py_shingles(_py_tokens(docs[b].text))
        assert round(len(sa & sb) / len(sa | sb), 4) == j
        assert j >= dedup_ops.JACCARD_THRESHOLD
    found = sum(1 for p in exact if p in lsh)
    assert found / len(exact) >= 0.8


def test_zipf_fit_against_python(documents):
    import math

    toks = {}
    for r in documents.select("source", "text").collect():
        for t in r.text.strip().split(" "):
            if t:
                toks.setdefault(r.source, {}).setdefault(t, 0)
                toks[r.source][t] += 1
    got = {r.source: r for r in text_ops.zipf_fit(documents).collect()}
    assert set(got) == set(toks)
    for src, counts in toks.items():
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
        lx = [math.log(i + 1) for i in range(len(top))]
        ly = [math.log(c) for _, c in top]
        n = len(lx)
        mx, my = sum(lx) / n, sum(ly) / n
        cov = sum((a - mx) * (b - my) for a, b in zip(lx, ly)) / n
        var = sum((a - mx) ** 2 for a in lx) / n
        slope = cov / var
        r = got[src]
        assert r.n_ranks == n
        assert abs(r.zipf_slope - slope) < 1e-4
        assert abs(r.zipf_intercept - (my - slope * mx)) < 1e-4


def test_quality_buckets_tile_properties(documents):
    out = text_ops.quality_buckets(documents).collect()
    scores = {
        r.doc_id: r.avg_neg_logprob
        for r in text_ops.bigram_logprob(documents).collect()
    }
    assert len(out) == len(scores)  # every scored doc bucketed
    by_src = {}
    for r in out:
        assert 1 <= r.quality_bucket <= 4
        assert r.avg_neg_logprob == scores[r.doc_id]
        by_src.setdefault(r.source, {}).setdefault(r.quality_bucket, []).append(
            (r.avg_neg_logprob, r.doc_id)
        )
    for src, tiles in by_src.items():
        sizes = [len(tiles[b]) for b in sorted(tiles)]
        assert max(sizes) - min(sizes) <= 1  # ntile balance
        for b in sorted(tiles)[:-1]:
            if b + 1 in tiles:
                assert max(tiles[b]) <= min(tiles[b + 1])  # ordered tiles


def test_pipeline_embedding_curation_structure(spark, sf_dir):
    from vector_search_engine_spark.registry import QUERIES

    out = QUERIES["pipeline_embedding_curation"](spark, sf_dir).collect()
    assert out  # quality gate keeps most of the fixture
    by_cluster = {}
    for r in out:
        assert r.quality_score >= 0.5
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, rows in by_cluster.items():
        assert len(rows) == rows[0].cluster_size
        canon = [r for r in rows if r.is_canonical]
        assert len(canon) == 1  # exactly one canonical per cluster
        assert canon[0].doc_id == min(r.doc_id for r in rows) == cid


# ---------------------------------------------------------------------------
# DSIR importance resampling (r14 third wave)
# ---------------------------------------------------------------------------


def _py_dsir_weights(rows, n_buckets=128, target_lang="en", alpha=1.0):
    """Python replay of text_ops.dsir_weights (md5 bucketing included)."""
    import hashlib
    import math
    from collections import Counter

    def bucket(g):
        h = int(hashlib.md5(
            (text_ops.DSIR_BUCKET_SALT + g).encode()
        ).hexdigest()[:15], 16)
        return h % n_buckets

    per_doc, q, p = {}, Counter(), Counter()
    for r in rows:
        toks = _py_tokens(r.text)
        grams = toks + [" ".join(toks[i:i+2]) for i in range(len(toks)-1)]
        c = Counter(bucket(g) for g in grams)
        per_doc[r.doc_id] = (r.lang, r.source, c)
        q.update(c)
        if r.lang == target_lang:
            p.update(c)
    tq, tp, d = sum(q.values()), sum(p.values()), alpha * n_buckets
    ratio = {
        b: math.log((p.get(b, 0) + alpha) / (tp + d))
        - math.log((q[b] + alpha) / (tq + d))
        for b in q
    }
    return {
        doc_id: (lang, src, sum(c.values()),
                 sum(n * ratio[b] for b, n in c.items()))
        for doc_id, (lang, src, c) in per_doc.items()
    }


def test_dsir_weights_match_python(documents):
    got = {r.doc_id: r for r in text_ops.dsir_weights(documents).collect()}
    want = _py_dsir_weights(documents.collect())
    assert set(got) == set(want)
    for doc_id, (lang, src, n_grams, lr) in want.items():
        g = got[doc_id]
        assert (g.lang, g.source, g.n_grams) == (lang, src, n_grams)
        assert g.log_ratio == pytest.approx(lr, abs=1e-5)


def test_dsir_weights_favor_target_language(documents):
    """The point of DSIR: target-language docs should score higher on
    average than off-target docs (their n-gram buckets are exactly the
    ones the target model upweights)."""
    rows = text_ops.dsir_weights(documents).collect()
    en = [r.log_ratio for r in rows if r.lang == "en"]
    rest = [r.log_ratio for r in rows if r.lang != "en"]
    assert sum(en) / len(en) > sum(rest) / len(rest) + 0.5


def test_dsir_sample_is_gumbel_topk_of_weights(documents):
    import hashlib
    import math

    k = text_ops.DSIR_SAMPLE_K
    sel = text_ops.dsir_sample(documents, k=k).collect()
    assert len(sel) == k
    want = _py_dsir_weights(documents.collect())

    def key(doc_id):
        h = int(hashlib.md5(
            (text_ops.DSIR_GUMBEL_SALT + str(doc_id)).encode()
        ).hexdigest()[:15], 16)
        u = (h + 1) / float(1 << 60)
        # the engine keys on the ROUNDED log_ratio (the emitted value)
        return round(want[doc_id][3], 6) - math.log(-math.log(u))

    expect = sorted(want, key=lambda d: (-key(d), d))[:k]
    assert [r.doc_id for r in sorted(sel, key=lambda r: r.rank)] == expect


# ---------------------------------------------------------------------------
# Containment dedup (r14 third wave)
# ---------------------------------------------------------------------------


def test_containment_matches_python_bruteforce(documents):
    got = {
        (r.doc_a, r.doc_b): (r.cont_ab, r.cont_ba)
        for r in dedup_ops.containment_pairs(documents).collect()
    }
    docs = [(r.doc_id, _py_shingles(_py_tokens(r.text))) for r in documents.collect()]
    want = {}
    for i, (ida, sa) in enumerate(docs):
        for idb, sb in docs[i + 1:]:
            inter = len(sa & sb)
            if not inter:
                continue
            ca, cb = inter / len(sa), inter / len(sb)
            lo, hi = (ida, idb) if ida < idb else (idb, ida)
            if ida > idb:
                ca, cb = cb, ca
            if max(ca, cb) >= dedup_ops.CONTAINMENT_THRESHOLD:
                want[(lo, hi)] = (ca, cb)
    assert set(got) == set(want)
    for pair, (ca, cb) in want.items():
        assert got[pair][0] == pytest.approx(ca, abs=1e-4)
        assert got[pair][1] == pytest.approx(cb, abs=1e-4)


def test_containment_catches_subset_pair_jaccard_misses(spark):
    """A short doc fully embedded in a long one: containment = 1.0 but
    Jaccard tiny AND outside the Jaccard tier's length band — the case
    this operator exists for."""
    base = "alpha beta gamma delta epsilon zeta"
    long_text = base + " " + " ".join(f"tok{i} tok{i+1} filler{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base, "en", "web", len(base)),
         (2, long_text, "en", "web", len(long_text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = dedup_ops.containment_pairs(df).collect()
    assert len(rows) == 1 and rows[0].doc_a == 1 and rows[0].doc_b == 2
    assert rows[0].cont_ab == pytest.approx(1.0)
    assert rows[0].cont_ba < 0.1
    assert dedup_ops.ngram_jaccard_pairs(df).count() == 0


def test_curriculum_order_interleaves_and_is_deterministic(documents):
    """The composite key (phase, rank, source) must round-robin
    sources: within a phase, every source's rank-r doc precedes every
    source's rank-(r+1) doc; ranks are dense per (phase, source); and
    the whole assignment is a pure function of the corpus."""
    rows = text_ops.curriculum_order(documents).collect()
    again = text_ops.curriculum_order(documents).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    from collections import defaultdict

    per_ps = defaultdict(list)
    for r in rows:
        assert 1 <= r.phase <= text_ops.QUALITY_N_BUCKETS
        per_ps[(r.phase, r.source)].append(r.rank)
    for ranks in per_ps.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # docs with bigrams only (quality_buckets contract)
    assert len(rows) == text_ops.bigram_logprob(documents).count()


def test_containment_prefix_tier_output_identical(documents):
    """The one-sided prefix-filter tier must emit exactly the
    single-scan tier's pairs (exactness is the contract; the filter is
    a candidate-generation optimization only)."""
    a = sorted(map(tuple, dedup_ops.containment_pairs(documents).collect()))
    b = sorted(
        map(tuple, dedup_ops.containment_pairs_prefix(documents).collect())
    )
    assert a == b


def test_containment_prefix_tier_on_planted_subset(spark):
    base = "alpha beta gamma delta epsilon zeta"
    long_text = base + " " + " ".join(f"tok{i} tok{i+1} filler{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base, "en", "w", len(base)), (2, long_text, "en", "w", len(long_text)),
         (3, "unrelated words only here now", "en", "w", 29)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = dedup_ops.containment_pairs_prefix(df).collect()
    assert len(rows) == 1 and (rows[0].doc_a, rows[0].doc_b) == (1, 2)
    assert rows[0].cont_ab == 1.0


def test_text_curation_pipeline_minhash_tier_matches_exact(spark):
    """r17: the composed pipeline's ``pair_tier='minhash'`` (the
    finding-44 scale dispatch surfaced at the composition level) must
    reproduce the exact tier's output row-for-row on a corpus whose
    duplicate clusters sit far above the threshold (J≈0.99 — where the
    band curve's hit rate is ~1, so the two tiers find the SAME pair
    set and every downstream stage is a pure function of it); an
    unknown tier name raises."""
    import pytest

    from vector_search_engine_spark.operators import text_ops

    rows = []
    for b in range(12):
        salted = " ".join(f"w{i}b{b}" for i in range(60))
        for v in range(3):
            did = b * 3 + v
            text = f"{salted} variant{v}"
            rows.append((did, text, "en", f"s{b % 2}", len(text)))
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    exact = sorted(
        tuple(r)
        for r in text_ops.text_curation_pipeline(docs).collect()
    )
    lsh = sorted(
        tuple(r)
        for r in text_ops.text_curation_pipeline(
            docs, pair_tier="minhash"
        ).collect()
    )
    assert exact == lsh and len(exact) > 0
    with pytest.raises(ValueError, match="pair_tier"):
        text_ops.text_curation_pipeline(docs, pair_tier="simhash")


def test_text_curation_pipeline_composition_contracts(spark, documents):
    """r15 composed pipeline: the properties only the COMPOSITION can
    violate — (a) every emitted doc is a keep-best SURVIVOR in the
    train split (split-before-sample: no val/test doc is ever emitted,
    and no two emitted docs share a near-dup cluster); (b) the
    per-source token walk is a PREFIX (cum_tokens reproduces the
    running sum under the stage's own salted order and never exceeds
    the budget); (c) phases/ranks are the curriculum contract over the
    kept set (ranks contiguous per (phase, source))."""
    import collections

    from vector_search_engine_spark.operators import graph as graph_ops
    from vector_search_engine_spark.operators import text_ops

    out = text_ops.text_curation_pipeline(documents).collect()
    assert out, "pipeline emitted nothing"

    # (a) survivor + split discipline
    clusters = graph_ops.dedup_clusters(
        documents, dedup_ops.ngram_jaccard_pairs(documents)
    )
    survivors = {
        r.doc_id: r.cluster_id
        for r in dedup_ops.keep_best(documents, clusters).collect()
    }
    split = {
        r.doc_id: r.split
        for r in text_ops.leakage_safe_split(documents, clusters).collect()
    }
    seen_clusters = set()
    for r in out:
        assert r.doc_id in survivors and survivors[r.doc_id] == r.cluster_id
        assert split[r.doc_id] == "train"
        assert r.cluster_id not in seen_clusters  # one survivor per cluster
        seen_clusters.add(r.cluster_id)

    # (b) budget prefix property per source
    per_src = collections.defaultdict(list)
    for r in out:
        per_src[r.source].append(r)
    for rs in per_src.values():
        rs.sort(key=lambda r: r.cum_tokens)
        running = 0
        for r in rs:
            running += r.n_tokens
            assert r.cum_tokens == running
            assert r.cum_tokens <= text_ops.TOKEN_BUDGET

    # (c) curriculum contract
    per_ps = collections.defaultdict(list)
    for r in out:
        assert 1 <= r.phase <= text_ops.QUALITY_N_BUCKETS
        per_ps[(r.phase, r.source)].append(r.rank)
    for ranks in per_ps.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
