"""Text analysis + dedup (LLM-pipeline surface over documents).

Registry family module - mechanically split from the monolithic
registry.py (r10 verdict item 4); registration order is preserved by
the import order in registry/__init__.py, so the grading window and
the sweep see an unchanged QUERIES/ORACLES surface."""

from __future__ import annotations

from vector_search_engine_spark.registry._base import *  # noqa: F401,F403

# ---------------------------------------------------------------------------
# Text analysis + dedup (LLM-pipeline surface over documents)
# ---------------------------------------------------------------------------


@register("doc_stats", oracle=txt_ops.DOC_STATS_ORACLE)
def doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality statistics + composite score."""
    return txt_ops.doc_stats(load_table(spark, sf_dir, "documents"))


@register("doc_lang_id", oracle=txt_ops.LANG_ID_ORACLE)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-overlap language-ID heuristic (formula parity is the gate)."""
    return txt_ops.lang_id(load_table(spark, sf_dir, "documents"))


@register("doc_token_counts", oracle=txt_ops.TOKEN_COUNTS_ORACLE)
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-estimate token counting."""
    return txt_ops.token_counts(load_table(spark, sf_dir, "documents"))


@register("doc_fingerprints", oracle=txt_ops.FINGERPRINTS_ORACLE)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 + min-shingle document fingerprints."""
    return txt_ops.fingerprints(load_table(spark, sf_dir, "documents"))


@register("doc_repetition_stats", oracle=txt_ops.REPETITION_STATS_ORACLE)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition ratios (C4/Gopher-style quality filter)."""
    return txt_ops.repetition_stats(load_table(spark, sf_dir, "documents"))


@register("doc_chunks", oracle=txt_ops.CHUNK_DOCUMENTS_ORACLE)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size overlapping token-window chunking — the pass every
    pretraining / retrieval pipeline runs before embedding or packing."""
    return txt_ops.chunk_documents(load_table(spark, sf_dir, "documents"))


@register("doc_unigram_stats", oracle=txt_ops.UNIGRAM_STATS_ORACLE)
def doc_unigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative unigram stats per doc (rare-token fraction, mean
    token frequency) — the LM-free perplexity-filter stand-in."""
    return txt_ops.unigram_stats(load_table(spark, sf_dir, "documents"))


@register("doc_dup_span_stats", oracle=txt_ops.DUP_SPAN_STATS_ORACLE)
def doc_dup_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of 5-gram spans shared with other documents —
    the exact-substring-dedup signal at span granularity."""
    return txt_ops.dup_span_stats(load_table(spark, sf_dir, "documents"))


@register("dedup_substring_spans", oracle=txt_ops.SUBSTRING_SPANS_ORACLE)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document duplicated token spans (1-based inclusive
    ranges + span text) — the span-EXTRACTION step of exact-substring
    dedup (Lee et al. 2022); doc_dup_span_stats is the score, this is
    the cut list."""
    return txt_ops.substring_spans(load_table(spark, sf_dir, "documents"))


@register("dedup_substring_clean", oracle=txt_ops.SUBSTRING_DEDUP_CLEAN_ORACLE)
def dedup_substring_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaning pass over dedup_substring_spans: duplicated-span
    tokens dropped, remainder re-joined — clean_text + removed-token
    accounting per document."""
    return txt_ops.substring_dedup_clean(load_table(spark, sf_dir, "documents"))


@register("corpus_ngram_stats", oracle=txt_ops.NGRAM_STATS_ORACLE)
def corpus_ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k bigrams per source (occurrence + doc counts) — the corpus
    statistics behind boilerplate/template detection."""
    return txt_ops.ngram_stats(load_table(spark, sf_dir, "documents"))


@register("doc_pii_scrub", oracle=txt_ops.PII_SCRUB_ORACLE)
def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction (emails / IPv4 / phone runs → typed tags).
    The fixture corpus carries no PII, so the graded query plants
    deterministic doc_id-derived PII identically on both sides first —
    the scrub itself then does real, checkable work."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.expr(txt_ops.PII_PLANT_SPARK)
    )
    return txt_ops.pii_scrub(docs)


@register("doc_quality_filter", oracle=txt_ops.QUALITY_FILTER_ORACLE)
def doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality filter: metrics + keep verdict +
    deterministic reject-reason string per document."""
    return txt_ops.quality_filter(load_table(spark, sf_dir, "documents"))


@register("corpus_decontaminate", oracle=txt_ops.DECONTAMINATE_ORACLE)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval n-gram overlap check: eval shingle set broadcast against
    the corpus postings — the pre-training decontamination pass."""
    return txt_ops.decontaminate(load_table(spark, sf_dir, "documents"))


@register("corpus_mixture_sample", oracle=txt_ops.MIXTURE_SAMPLE_ORACLE)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional per-source sampling (the pretraining data-
    mixture step), deterministic by salted-md5 rank."""
    return txt_ops.mixture_sample(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_mixture_sample_weighted",
    oracle=txt_ops.MIXTURE_SAMPLE_WEIGHTED_ORACLE,
)
def corpus_mixture_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mixture_sample through the EXPLICIT (source, weight) config path
    (r7): a broadcast weight table overrides the suffix derivation, with
    omitted sources defaulting to weight 1 — the production mixing-config
    shape, oracle-mirrored via a VALUES CTE."""
    wtab = spark.createDataFrame(
        list(txt_ops.MIXTURE_WEIGHTS_FIXTURE), "source string, weight long"
    )
    return txt_ops.mixture_sample(
        load_table(spark, sf_dir, "documents"), weights=wtab
    )


@register(
    "corpus_capped_sample", oracle=txt_ops.CAPPED_SOURCE_SAMPLE_ORACLE
)
def corpus_capped_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-ranked sampling: exactly cap docs per source."""
    return txt_ops.capped_source_sample(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_token_budget_sample", oracle=txt_ops.TOKEN_BUDGET_SAMPLE_ORACLE
)
def corpus_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted per-source sampling (r14): keep each source's docs
    in salted-md5 order while the running whitespace-token total stays
    within the budget — the unit LLM data mixtures are actually
    specified in, where corpus_capped_sample counts documents.  One
    window per source partition; kept set is a pure function of
    (doc_id, salt, budget)."""
    return txt_ops.token_budget_sample(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_weighted_sample_es", oracle=txt_ops.WEIGHTED_SAMPLE_ES_ORACLE
)
def corpus_weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement in one pass (Efraimidis-
    Spirakis A-ES keys ln(u)/w, u from a salted 60-bit md5, w =
    n_chars): the importance-sampling curation primitive; plan is pure
    column expressions + TakeOrderedAndProject partial top-k — no
    global sort shuffle."""
    return txt_ops.weighted_sample_es(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_approx_distinct", oracle=dedup_ops.CORPUS_APPROX_DISTINCT_ORACLE
)
def corpus_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch distinct counts, accuracy-gated against exact."""
    return dedup_ops.corpus_approx_distinct(load_table(spark, sf_dir, "documents"))


@register("corpus_dedup_stats", oracle=dedup_ops.CORPUS_DEDUP_STATS_ORACLE)
def corpus_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup accounting (docs, exact-distinct, dup ratio)."""
    return dedup_ops.corpus_dedup_stats(load_table(spark, sf_dir, "documents"))


from vector_search_engine_spark.functions.text import DD_NORMALIZED as _DD_NORM

_CLEAN_CORPUS_ORACLE = f"""
WITH stats AS ({txt_ops.DOC_STATS_ORACLE.strip()}),
dd AS (
  SELECT doc_id,
         doc_id != min(doc_id) OVER (
             PARTITION BY md5({_DD_NORM.format(t="text")})
         ) AS is_duplicate
  FROM documents
)
SELECT s.lang,
       count(*) AS n_docs_kept,
       CAST(sum(s.n_tokens) AS BIGINT) AS total_tokens,
       round(avg(s.quality_score), 4) AS avg_quality
FROM stats s JOIN dd USING (doc_id)
WHERE s.quality_score >= 0.5 AND NOT dd.is_duplicate
GROUP BY s.lang
"""


@register("pipeline_clean_corpus", oracle=_CLEAN_CORPUS_ORACLE)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus cleaning: quality filter (score ≥ 0.5) ∘ exact
    dedup (keep canonicals) → per-language token budget — the composed
    shape of a real training-data pipeline, one plan, oracle-backed."""
    docs = load_table(spark, sf_dir, "documents")
    stats = txt_ops.doc_stats(docs)
    dd = dedup_ops.exact_dedup(docs).select("doc_id", "is_duplicate")
    kept = stats.join(dd, "doc_id").filter(
        (F.col("quality_score") >= 0.5) & ~F.col("is_duplicate")
    )
    return kept.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("quality_score"), 4).alias("avg_quality"),
    )


@register("pipeline_neardup_corpus", oracle=None)  # oracle set below (graph CTE)
def pipeline_neardup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cleaning with NEAR-dup clustering: keep only cluster
    canonicals (transitive closure of the Jaccard pairs), quality ≥ 0.5,
    per-language token budget — the iterative CC operator composed into
    the end-to-end pipeline shape."""
    from vector_search_engine_spark.operators import graph as graph_ops

    docs = load_table(spark, sf_dir, "documents")
    stats = txt_ops.doc_stats(docs)
    clusters = graph_ops.dedup_clusters(
        docs, dedup_ops.ngram_jaccard_pairs(docs)
    )
    kept = stats.join(
        clusters.filter(F.col("is_canonical")).select("doc_id"), "doc_id"
    ).filter(F.col("quality_score") >= 0.5)
    return kept.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.round(F.avg("quality_score"), 4).alias("avg_quality"),
    )


@register("dedup_exact", oracle=dedup_ops.EXACT_DEDUP_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by normalized-text hash."""
    return dedup_ops.exact_dedup(load_table(spark, sf_dir, "documents"))


@register("dedup_incremental", oracle=dedup_ops.INCREMENTAL_DEDUP_ORACLE)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arriving-batch exact dedup against the seen corpus's signature
    table (doc_id % 3 splits seen/batch): the O(batch)-per-arrival shape
    a continuously-fed pipeline runs instead of full re-dedups."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_ops.incremental_dedup(
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter(F.col("doc_id") % 3 != 0),
    )


@register("dedup_ngram_jaccard", oracle=dedup_ops.NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard near-dup pairs (length-blocked)."""
    return dedup_ops.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


@register("dedup_ngram_jaccard_ppjoin", oracle=dedup_ops.NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin prefix-filtered exact Jaccard (web-scale tier): identical
    output to dedup_ngram_jaccard, hot shingles excluded from candidate
    generation by the prefix bound."""
    return dedup_ops.ngram_jaccard_pairs_ppjoin(
        load_table(spark, sf_dir, "documents")
    )


@register("dedup_clusters", oracle=None)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER assignment: transitive closure of the Jaccard
    pair graph via alternating large-star/small-star rounds (Kiveris et
    al., SoCC'14) — canonical id per document, singletons included.  The
    iterative-algorithm surface; oracle = recursive-CTE min-label
    propagation over the same edges."""
    from vector_search_engine_spark.operators import graph as graph_ops

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup_ops.ngram_jaccard_pairs(docs)
    return graph_ops.dedup_clusters(docs, pairs)


@register("corpus_split_leakage_safe", oracle=None)  # oracle set below
def corpus_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (r13): the split key is the
    near-dup CLUSTER (transitive closure of the Jaccard pairs), so a
    test document's near-duplicate twin can never train — the
    eval-contamination guard applied BEFORE the split.  Deterministic
    salted-md5 bucketing of the cluster id; oracle replays the identical
    assignment over the recursive-CTE clusters."""
    from vector_search_engine_spark.operators import graph as graph_ops

    docs = load_table(spark, sf_dir, "documents")
    clusters = graph_ops.dedup_clusters(
        docs, dedup_ops.ngram_jaccard_pairs(docs)
    )
    return txt_ops.leakage_safe_split(docs, clusters)


@register("dedup_keep_best", oracle=None)  # oracle set below (graph CTE)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup collapse (r14): per transitive-closure
    cluster keep the BEST document — Gopher `keep` verdict first, then
    word count, doc_id as the final tie-break — instead of
    dedup_clusters' min-id canonical.  Thin wrapper over
    ``operators.dedup.keep_best`` (library home since r15); the pair
    graph and CC are the bucketed machinery dedup_clusters already
    grades."""
    from vector_search_engine_spark.operators import graph as graph_ops

    docs = load_table(spark, sf_dir, "documents")
    clusters = graph_ops.dedup_clusters(
        docs, dedup_ops.ngram_jaccard_pairs(docs)
    )
    return dedup_ops.keep_best(docs, clusters)


@register("pipeline_text_curation", oracle=None)  # oracle set below (graph CTE)
def pipeline_text_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The text-side composed pipeline (r15): near-dup clusters →
    keep-best collapse → leakage-safe cluster-keyed split →
    token-budget sampling within train → curriculum order, as ONE
    plan with a doc-level oracle.  Grades the COMPOSITION (stage
    ordering, survivor handoff, split-before-sample) that the six
    individually-graded stage rows cannot see.  Twin of
    pipeline_embedding_curation for the documents table — the
    engine's north-star workload end-to-end."""
    return txt_ops.text_curation_pipeline(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "corpus_mixture_temperature", oracle=txt_ops.MIXTURE_TEMPERATURE_ORACLE
)
def corpus_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed source mixture weights (r13): per-source
    alpha=0.5 smoothed sampling weights from exact char counts — the
    data-mixture rule that upsamples tail sources; one agg + scalar
    normalization, no second corpus scan."""
    return txt_ops.mixture_temperature_weights(
        load_table(spark, sf_dir, "documents")
    )


def _set_graph_oracles() -> None:
    from vector_search_engine_spark.operators import graph as graph_ops

    ORACLES["dedup_clusters"] = graph_ops.DEDUP_CLUSTERS_ORACLE
    ORACLES["corpus_split_leakage_safe"] = f"""
WITH cl AS ({graph_ops.DEDUP_CLUSTERS_ORACLE})
{txt_ops.LEAKAGE_SPLIT_ORACLE_BODY}
"""
    ORACLES["dedup_keep_best"] = f"""
WITH cl AS ({graph_ops.DEDUP_CLUSTERS_ORACLE}),
q AS ({txt_ops.QUALITY_FILTER_ORACLE.strip()}),
j AS (
  SELECT cl.doc_id, cl.cluster_id, cl.cluster_size, q.n_words, q.keep,
         row_number() OVER (
           PARTITION BY cl.cluster_id
           ORDER BY q.keep DESC, q.n_words DESC, cl.doc_id
         ) AS rn
  FROM cl JOIN q ON cl.doc_id = q.doc_id
)
SELECT doc_id, cluster_id, cluster_size, n_words, keep FROM j WHERE rn = 1
"""
    ORACLES["pipeline_text_curation"] = txt_ops.text_curation_oracle(
        graph_ops.DEDUP_CLUSTERS_ORACLE
    )
    ORACLES["pipeline_neardup_corpus"] = f"""
WITH cl AS ({graph_ops.DEDUP_CLUSTERS_ORACLE}),
stats AS ({txt_ops.DOC_STATS_ORACLE.strip()})
SELECT s.lang,
       count(*) AS n_docs_kept,
       CAST(sum(s.n_tokens) AS BIGINT) AS total_tokens,
       round(avg(s.quality_score), 4) AS avg_quality
FROM stats s JOIN cl ON s.doc_id = cl.doc_id
WHERE cl.is_canonical AND s.quality_score >= 0.5
GROUP BY s.lang
"""


_set_graph_oracles()


@register("dedup_minhash_lsh")  # LSH recall is probabilistic → rows-only
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates, exact-verified.

    Uses the operator default (no cache): with the r6 compact shape the
    three consumers are column-pruned thin scans, and persist + eager
    finalization measured slower at BOTH 5k (sf0.1) and 100k docs —
    the r5-era cache opt-in no longer pays even at bench scale."""
    return dedup_ops.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
    )


@register(
    "dedup_minhash_lsh_portable",
    oracle=dedup_ops.MINHASH_LSH_PORTABLE_ORACLE,
)
def dedup_minhash_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH with the salted-md5 portable hash family (r14): same
    banding/truncation/exact-verify machinery as the serving row, but
    every hash is a pure cross-engine function of the content, so the
    DuckDB oracle replays signatures → bands → buckets → candidate
    pairs → Jaccard verify EXACTLY — the family's end-to-end machinery
    is hash-graded, not just recall-pytest-gated."""
    return dedup_ops.minhash_lsh_pairs_portable(
        load_table(spark, sf_dir, "documents")
    )


@register("dedup_simhash")  # banded Hamming recall is heuristic → rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 8."""
    return dedup_ops.simhash_pairs(load_table(spark, sf_dir, "documents"))


@register("dedup_embedding_lsh")  # hyperplane-bucket recall heuristic → rows-only
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via multi-table random-hyperplane LSH.
    Fixture has no true near-dups (max cos ≈ 0.51), so the demo threshold
    is 0.3 with a wide table budget; production near-dup defaults (0.9)
    get ~0.998 recall — see embedding_lsh_pairs docstring."""
    return dedup_ops.embedding_lsh_pairs(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.3,
        n_tables=16,
        n_planes=3,
    )




@register("corpus_source_overlap", oracle=txt_ops.SOURCE_OVERLAP_ORACLE)
def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination/provenance matrix (r11): exact pairwise
    Jaccard of distinct trigram-shingle sets per source — which sources
    re-host each other's content / which eval split leaked into which
    train source.  One (source, shingle) distinct + a shingle-keyed
    self-join; pair volume per shingle is bounded by the source count,
    never corpus rows (txt_ops.source_overlap)."""
    return txt_ops.source_overlap(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_source_overlap_minhash",
    oracle=txt_ops.SOURCE_OVERLAP_MINHASH_ORACLE,
)
def corpus_source_overlap_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch path of the overlap matrix for very large source counts:
    per-source bottom-k MinHash signatures (Broder 1997), matrix step
    shuffles S·k rows independent of content diversity.  Oracle mode
    since r14: the hash is a salted 60-bit md5 (pure function of the
    shingle), so DuckDB replays hash → bottom-k → merged-bottom-k
    estimator EXACTLY; estimator agreement with the exact operator
    stays pytest-gated on top."""
    return txt_ops.source_overlap_minhash(
        load_table(spark, sf_dir, "documents")
    )


@register("corpus_source_psi", oracle=txt_ops.SOURCE_PSI_ORACLE)
def corpus_source_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Population Stability Index over corpus-decile bins of
    n_chars (r11) — the standard numeric-feature drift monitor, sibling
    of the token-distribution KL row: flags a source whose length
    profile diverges from the blend (txt_ops.source_psi; exact corpus
    percentile boundaries shared with the DuckDB twin via type-7
    interpolation, the dbscan_kdist_report precedent)."""
    return txt_ops.source_psi(load_table(spark, sf_dir, "documents"))


@register("corpus_zipf_fit", oracle=txt_ops.ZIPF_FIT_ORACLE)
def corpus_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf rank-frequency OLS fit over the top-200 tokens
    (txt_ops.zipf_fit) - the corpus-health slope (natural text ~ -1;
    template/log/OCR sources bend it); ranking deterministic via
    (count desc, token) ties, fit replayed exactly by DuckDB
    covar_pop/var_pop/corr."""
    return txt_ops.zipf_fit(load_table(spark, sf_dir, "documents"))


@register("doc_quality_buckets", oracle=txt_ops.QUALITY_BUCKETS_ORACLE)
def doc_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style per-source quality quartiles via ntile over the
    in-corpus bigram-LM score (txt_ops.quality_buckets) - the
    head/middle/tail split of web-corpus curation recipes; tile order
    pinned on (rounded score, doc_id) so both engines tile
    identically."""
    return txt_ops.quality_buckets(load_table(spark, sf_dir, "documents"))


_EMB_CURATION_THR = 0.35
_DD_COS = (
    f"({_DD_DOT.format(a='a.embedding', b='b.embedding')}"
    f" / (sqrt({_DD_DOT.format(a='a.embedding', b='a.embedding')})"
    f" * sqrt({_DD_DOT.format(a='b.embedding', b='b.embedding')})))"
)


@register(
    "pipeline_embedding_curation",
    oracle=f"""
WITH RECURSIVE stats AS ({txt_ops.DOC_STATS_ORACLE.strip()}),
kept AS (
  SELECT doc_id, source, n_tokens, quality_score
  FROM stats WHERE quality_score >= 0.5
),
ke AS (
  SELECT e.vec_id AS doc_id, e.embedding
  FROM embeddings e JOIN kept k ON e.vec_id = k.doc_id
),
p AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM ke a JOIN ke b ON a.doc_id < b.doc_id
  WHERE {_DD_COS} >= {_EMB_CURATION_THR}
),
edges AS (SELECT u, v FROM p UNION ALL SELECT v, u FROM p),
cc(node, lbl) AS (
  SELECT doc_id, doc_id FROM ke
  UNION
  SELECT e.u, cc.lbl FROM edges e JOIN cc ON cc.node = e.v
),
lab AS (SELECT node AS doc_id, min(lbl) AS cluster_id FROM cc GROUP BY node)
SELECT k.doc_id, k.source, k.n_tokens, k.quality_score,
       l.cluster_id,
       count(*) OVER (PARTITION BY l.cluster_id) AS cluster_size,
       (k.doc_id = l.cluster_id) AS is_canonical
FROM kept k JOIN lab l ON k.doc_id = l.doc_id
""",
)
def pipeline_embedding_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table curation pipeline (r14): the documents table decides
    QUALITY, the embeddings table decides REDUNDANCY — quality gate
    (score >= 0.5) -> align each survivor's embedding row (vec_id =
    doc_id, the corpus's text<->vector linkage) -> exact cosine>=0.35
    near-dup pairs among survivors ONLY (dedup never wastes distance
    evaluations on docs the quality gate already dropped) -> iterative
    transitive closure -> every kept doc labeled with its semantic
    cluster and a min-id canonical flag.  The composed shape real
    multimodal training pipelines run, end-to-end in ONE plan and
    oracle-graded doc-level (not aggregate-level).  Scale: the pair
    stage auto-dispatches to the LSH tier past the broadcast bound
    (simjoin.similarity_pairs contract); CC shuffles edges, never
    pairs x dims."""
    from pyspark.sql import Window

    from vector_search_engine_spark.operators import graph as graph_ops

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    kept = (
        txt_ops.doc_stats(docs)
        .filter(F.col("quality_score") >= 0.5)
        .select("doc_id", "source", "n_tokens", "quality_score")
    )
    kept_emb = emb.join(
        kept.select(F.col("doc_id").alias("vec_id")), "vec_id"
    ).select("vec_id", "embedding")
    pairs = simjoin.similarity_pairs(
        kept_emb, threshold=_EMB_CURATION_THR, metric="cosine"
    )
    comp = graph_ops.connected_components(
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    )
    labeled = kept.join(
        comp, kept["doc_id"] == comp["node"], "left"
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        "quality_score",
        F.coalesce("component", "doc_id").alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id")
    return (
        labeled.withColumn("cluster_size", F.count("*").over(w).cast("long"))
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
        .select(
            "doc_id", "source", "n_tokens", "quality_score",
            "cluster_id", "cluster_size", "is_canonical",
        )
    )


def _lsh_pairs_portable_oracle() -> str:
    from vector_search_engine_spark.operators.lsh import (
        PORTABLE_DOT_DECIMALS,
        PORTABLE_LSH_PLANES,
        PORTABLE_LSH_SALT,
        PORTABLE_LSH_TABLES,
    )

    np_ = PORTABLE_LSH_PLANES
    nt = PORTABLE_LSH_TABLES
    cos = (
        f"CASE WHEN sqrt({_DD_DOT.format(a='a.embedding', b='a.embedding')})"
        f" * sqrt({_DD_DOT.format(a='b.embedding', b='b.embedding')}) = 0"
        f" THEN 0.0"
        f" ELSE {_DD_DOT.format(a='a.embedding', b='b.embedding')}"
        f" / (sqrt({_DD_DOT.format(a='a.embedding', b='a.embedding')})"
        f" * sqrt({_DD_DOT.format(a='b.embedding', b='b.embedding')})) END"
    )
    return f"""
WITH dims AS (SELECT len(embedding) AS d FROM embeddings LIMIT 1),
planes AS (
  SELECT g0.t, g1.p, j.j,
         CASE WHEN CAST(('0x' || substr(
                md5('{PORTABLE_LSH_SALT}' || g0.t || ':' || g1.p || ':' || j.j),
                1, 1)) AS INT) % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
  FROM generate_series(0, {nt - 1}) g0(t)
  CROSS JOIN generate_series(0, {np_ - 1}) g1(p)
  CROSS JOIN (SELECT unnest(generate_series(1, (SELECT d FROM dims))) AS j) j
),
dots AS (
  SELECT e.vec_id, pl.t, pl.p,
         round(sum(pl.s * CAST(e.embedding[pl.j] AS DOUBLE)),
               {PORTABLE_DOT_DECIMALS}) AS dot
  FROM embeddings e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.t, pl.p
),
sigs AS (
  SELECT vec_id, t,
         sum(CASE WHEN dot >= 0
                  THEN (1::BIGINT << ({np_ - 1} - p)) ELSE 0 END)::BIGINT AS sig
  FROM dots GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT sa.vec_id AS id_a, sb.vec_id AS id_b
  FROM sigs sa JOIN sigs sb
    ON sa.t = sb.t AND sa.sig = sb.sig AND sa.vec_id < sb.vec_id
),
v AS (
  SELECT c.id_a, c.id_b, {cos} AS sim
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.id_a
  JOIN embeddings b ON b.vec_id = c.id_b
)
SELECT id_a, id_b, round(sim, 4) AS sim FROM v WHERE sim >= 0.35
"""


@register("dedup_embedding_lsh_portable", oracle=_lsh_pairs_portable_oracle())
def dedup_embedding_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via PORTABLE multi-table hyperplane LSH
    (r14): the third member of the salted-md5 portable family (MinHash
    banding, hyperplane ANN, now embedding dedup) — planes are md5
    parities, projections round before the sign test, candidates are
    any-table exact-bucket collisions, verify is exact cosine >= 0.35 —
    so DuckDB replays the whole pipeline hash-exactly; the
    xxhash64-seeded dedup_embedding_lsh stays the CPU-fast serving
    default (lsh.lsh_pairs_portable)."""
    from vector_search_engine_spark.operators import lsh as lsh_ops

    return lsh_ops.lsh_pairs_portable(
        load_table(spark, sf_dir, "embeddings"), threshold=0.35
    )


@register("corpus_dsir_weights", oracle=txt_ops.DSIR_WEIGHTS_ORACLE)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023): per-document
    log likelihood-ratio of hashed unigram+bigram features under a
    target (lang='en') vs raw bag-of-words model — the data-selection
    scorer of domain-targeted pretraining mixes.  One corpus scan to
    (doc, bucket) counts; both models derive from that aggregate; the
    B-row log-ratio table broadcast-joins back (txt_ops.dsir_weights)."""
    return txt_ops.dsir_weights(load_table(spark, sf_dir, "documents"))


@register("corpus_dsir_sample", oracle=txt_ops.DSIR_SAMPLE_ORACLE)
def corpus_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection step: Gumbel-top-k over the importance weights —
    samples without replacement with probability proportional to w(d)
    (the Gumbel-max trick), noise drawn from a salted md5 of doc_id so
    the draw replays exactly cross-engine; TakeOrderedAndProject keeps
    only k rows per partition in flight (txt_ops.dsir_sample)."""
    return txt_ops.dsir_sample(load_table(spark, sf_dir, "documents"))


@register("dedup_containment", oracle=dedup_ops.CONTAINMENT_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-subset dedup: word-3-gram set containment in
    both directions over the single-scan inverted-index plan (postings
    grouped once, pairs sharing zero shingles never materialize).
    Catches short-doc-inside-long-doc duplication that Jaccard's
    symmetric union denominator (and its length-band blocking)
    structurally misses (dedup_ops.containment_pairs)."""
    return dedup_ops.containment_pairs(load_table(spark, sf_dir, "documents"))


@register("dedup_simhash_signatures", oracle=dedup_ops.SIMHASH_SIGNATURES_ORACLE)
def dedup_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SimHash SIGNATURE table graded end-to-end: md5 token hashes
    make every doc's 64-bit signature a pure function of its text, so
    DuckDB replays the map-only pandas kernel exactly (two md5 halves,
    64 vote sums, HUGEINT bit assembly with a two's-complement wrap).
    Converts the simhash family's foundation from rows-only to oracle
    mode — the banded PAIR row (dedup_simhash) stays rows-only by
    nature (Hamming-8 banding recall is heuristic; at <=3 the chunk
    pigeonhole is exact but the fixture has no such pairs to grade)."""
    return dedup_ops.simhash_signatures(load_table(spark, sf_dir, "documents"))


@register("corpus_curriculum_order", oracle=txt_ops.CURRICULUM_ORDER_ORACLE)
def corpus_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-annealed curriculum training order: CCNet quality tiles
    become phases (head quality trains first), salted-md5 shuffle
    within (phase, source), and the (phase, rank, source) composite key
    round-robin-interleaves sources at every step — the corpus-to-
    training-sequence emission step (txt_ops.curriculum_order;
    phase x source parallel windows, no global sort)."""
    return txt_ops.curriculum_order(load_table(spark, sf_dir, "documents"))


@register("dedup_containment_ppjoin", oracle=dedup_ops.CONTAINMENT_ORACLE)
def dedup_containment_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output-identical containment pairs through the ONE-SIDED prefix
    filter (C(A->B) >= t forces A's df-ordered prefix to hit B's full
    set): hot boilerplate shingles fall out of every prefix, so the
    single-scan tier's quadratic in-group ceiling disappears — skew
    insurance, same oracle (dedup_ops.containment_pairs_prefix)."""
    return dedup_ops.containment_pairs_prefix(
        load_table(spark, sf_dir, "documents")
    )
