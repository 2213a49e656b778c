"""Text-analysis operators over the ``documents`` table — the LLM-pipeline
surface (BASELINE.json north star): quality scoring, language-ID heuristic,
token counting, document fingerprinting.

Every operator here is a pure column-expression plan (JVM-side, codegen'd,
no Python in the hot path) with a DuckDB oracle twin.  At 100 TB these are
embarrassingly parallel scans — no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_engine_spark.functions.hashing import (
    salted_md5_long,
    salted_md5_unit,
)
from vector_search_engine_spark.functions.text import (
    DD_NORMALIZED,
    DD_SHINGLES2,
    DD_SHINGLES3,
    DD_TOKENS,
    normalized,
    tokens,
    with_shingles,
    word_shingles,
)

# language-ID stoplists (tiny, deterministic; accuracy is a property of the
# heuristic, parity of the formula is what the oracle checks)
STOPWORDS = {
    "en": ["the", "a", "of", "to", "in", "and", "is", "that", "it", "for"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den"],
    "es": ["el", "la", "que", "y", "en", "un", "los", "se", "no", "por"],
    "fr": ["le", "la", "les", "et", "des", "un", "une", "du", "est", "dans"],
}
LANG_PRIORITY = ["en", "de", "es", "fr"]  # deterministic argmax tie-break


def doc_stats(documents: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Per-document quality statistics + a composite quality score.

    Pure column expressions (no shuffle, no state) — safe on a streaming
    DataFrame too; ``keep`` passes extra input columns through (e.g. a
    content hash computed upstream).

    Tokens are materialized once per row (see ``with_shingles`` note in
    functions/text.py — lambda-captured expressions re-evaluate per
    element)."""
    documents = documents.withColumn("_t", tokens(F.col("text")))
    t = F.col("_t")
    n_tok = F.size(t).cast("long")
    n_uniq = F.size(F.array_distinct(t)).cast("long")
    tok_chars = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    avg_tok_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        tok_chars.cast("double") / n_tok.cast("double")
    )
    stop_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.size(
            F.filter(t, lambda x: x.isin(*STOPWORDS["en"]))
        ).cast("double")
        / n_tok.cast("double")
    )
    alpha_ratio = F.when(F.length("text") == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(F.col("text"), "[^a-z]", "")).cast("double")
        / F.length("text").cast("double")
    )
    uniq_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        n_uniq.cast("double") / n_tok.cast("double")
    )
    quality = (
        F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + uniq_ratio * 0.3
        + alpha_ratio * 0.3
    )
    return documents.select(
        "doc_id",
        "lang",
        "source",
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_uniq_tokens"),
        F.round(avg_tok_len, 4).alias("avg_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(quality, 4).alias("quality_score"),
        *keep,
    )


def _dd_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


DOC_STATS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang, source, text,
         {DD_TOKENS.format(t="text")} AS t
  FROM documents
),
m AS (
  SELECT doc_id, lang, source, text, t,
         len(t)::BIGINT AS n_tokens,
         len(list_distinct(t))::BIGINT AS n_uniq_tokens,
         CASE WHEN len(t) = 0 THEN 0.0
              ELSE CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
                   / CAST(len(t) AS DOUBLE) END AS avg_token_len,
         CASE WHEN len(t) = 0 THEN 0.0
              ELSE CAST(len(list_filter(t,
                       x -> list_contains({_dd_list(STOPWORDS["en"])}, x))) AS DOUBLE)
                   / CAST(len(t) AS DOUBLE) END AS stopword_ratio,
         CASE WHEN len(text) = 0 THEN 0.0
              ELSE CAST(len(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE)
                   / CAST(len(text) AS DOUBLE) END AS alpha_ratio,
         CASE WHEN len(t) = 0 THEN 0.0
              ELSE CAST(len(list_distinct(t)) AS DOUBLE)
                   / CAST(len(t) AS DOUBLE) END AS uniq_ratio
  FROM tok
)
SELECT doc_id, lang, source, n_tokens, n_uniq_tokens,
       round(avg_token_len, 4) AS avg_token_len,
       round(stopword_ratio, 4) AS stopword_ratio,
       round(alpha_ratio, 4) AS alpha_ratio,
       round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
             + uniq_ratio * 0.3 + alpha_ratio * 0.3, 4) AS quality_score
FROM m
"""


def lang_id(documents: DataFrame) -> DataFrame:
    """N-gram/stopword language-ID heuristic: score = count of distinct
    stopwords present per language; argmax with fixed priority tie-break;
    no latin hits at all → 'zh'."""
    documents = documents.withColumn(
        "_t", F.array_distinct(tokens(F.lower(F.col("text"))))
    )
    t = F.col("_t")
    scores = {
        lang: F.size(F.array_intersect(t, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, F.lit("zh"))
    for lang in LANG_PRIORITY:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    out = documents.select(
        "doc_id",
        "lang",
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in LANG_PRIORITY],
        pred.alias("predicted_lang"),
    )
    return out.withColumn(
        "is_match", (F.col("predicted_lang") == F.col("lang")).cast("boolean")
    )


LANG_ID_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, lang,
         list_distinct({DD_TOKENS.format(t="lower(text)")}) AS t
  FROM documents
),
s AS (
  SELECT doc_id, lang,
         {" , ".join(
             f"len(list_intersect(t, {_dd_list(words)}))::BIGINT AS score_{lang}"
             for lang, words in STOPWORDS.items()
         )}
  FROM tok
),
p AS (
  SELECT *, greatest(score_en, score_de, score_es, score_fr) AS best FROM s
)
SELECT doc_id, lang, score_en, score_de, score_es, score_fr,
       CASE WHEN best = 0 THEN 'zh'
            WHEN score_en = best THEN 'en'
            WHEN score_de = best THEN 'de'
            WHEN score_es = best THEN 'es'
            ELSE 'fr' END AS predicted_lang,
       (CASE WHEN best = 0 THEN 'zh'
             WHEN score_en = best THEN 'en'
             WHEN score_de = best THEN 'de'
             WHEN score_es = best THEN 'es'
             ELSE 'fr' END) = lang AS is_match
FROM p
"""


# GPT-2-style pre-tokenizer, restricted to lookahead-free constructs so
# RE2 (DuckDB) and java.util.regex (Spark) match it identically: a word,
# a number run, a punctuation run (each with optional leading space), or
# a whitespace run = one token
BPE_SPLIT_REGEX = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_counts(documents: DataFrame) -> DataFrame:
    """Token counting three ways: whitespace tokens, a BPE-style
    pre-tokenizer regex count (the real unit LLM corpus budgets are
    written in), and the ~4-chars/token estimate as the sanity column."""
    t = tokens(F.col("text"))
    return documents.select(
        "doc_id",
        "source",
        F.size(t).cast("long").alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(BPE_SPLIT_REGEX), F.lit(0))
        ).cast("long").alias("n_bpe_tokens"),
        F.ceil(F.length("text") / F.lit(4.0)).cast("long").alias("est_bpe_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )


TOKEN_COUNTS_ORACLE = f"""
SELECT doc_id, source,
       len({DD_TOKENS.format(t="text")})::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'))::BIGINT
           AS n_bpe_tokens,
       ceil(len(text) / 4.0)::BIGINT AS est_bpe_tokens,
       n_chars::BIGINT AS n_chars
FROM documents
"""


def fingerprints(documents: DataFrame) -> DataFrame:
    """Document fingerprinting: full-text hash of the normalized text plus a
    min-shingle hash (winnowing-style, order-independent).  Shingles are
    materialized once per row, not per lambda element."""
    from vector_search_engine_spark.functions.text import with_shingles

    # explode + groupBy instead of transform(sh, md5): the HOF lambda
    # evaluates interpreted (~3.5× slower); exploded md5 is codegen'd and
    # the min/count aggregate is one cheap shuffle on doc_id
    base = with_shingles(documents, "_sh").select(
        "doc_id", F.md5(normalized(F.col("text"))).alias("text_md5"), "_sh"
    )
    ex = base.select("doc_id", "text_md5", F.explode_outer("_sh").alias("s"))
    return ex.groupBy("doc_id", "text_md5").agg(
        F.coalesce(F.min(F.md5("s")), F.lit("")).alias("min_shingle_md5"),
        F.count("s").cast("long").alias("n_shingles"),
    )


FINGERPRINTS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, text, {DD_TOKENS.format(t="text")} AS t FROM documents
),
sh AS (
  SELECT doc_id, text,
         list_distinct({DD_SHINGLES3.format(t="t")}) AS s
  FROM tok
)
SELECT doc_id,
       md5({DD_NORMALIZED.format(t="text")}) AS text_md5,
       coalesce(list_min(list_transform(s, x -> md5(x))), '') AS min_shingle_md5,
       len(s)::BIGINT AS n_shingles
FROM sh
"""


SAMPLE_SALT = "vse-sample:"
SAMPLE_CAP = 10  # < docs-per-source at every SF, so the cap always bites


def capped_source_sample(documents: DataFrame, cap: int = SAMPLE_CAP) -> DataFrame:
    """Deterministic capped-per-source sampling: keep exactly
    ``min(cap, |source|)`` docs per source, chosen by rank of a salted
    md5 hash of the doc id.  The pipeline op for rebalancing a corpus
    whose sources are wildly skewed — and, unlike ``sample()``/RNG
    sampling, the kept set is a pure function of (doc_id, salt, cap):
    reproducible across runs, engines, partitionings and cluster sizes
    (the oracle replays the identical selection in SQL).  One shuffle on
    source; the hash ranking is a window, so Spark's partial top-k
    (rank <= cap pushes a per-partition limit under AQE) bounds memory.

    15 hex chars of the md5 = 60 bits, so the rank key fits a BIGINT in
    both engines."""
    from pyspark.sql import Window

    h = salted_md5_long(F.col("doc_id").cast("string"), SAMPLE_SALT)
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        documents.select("source", "doc_id", h.alias("h"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select("source", "doc_id", F.col("rn").cast("long").alias("rn"))
    )


TOKEN_BUDGET = 800  # whitespace tokens per source — bites at every SF
# (per-source totals: ~1.2k at sf0.001/0.01, ~13k at sf0.1)


def token_budget_sample(
    documents: DataFrame,
    budget: int = TOKEN_BUDGET,
    tokens_col: str | None = None,
) -> DataFrame:
    """Token-budgeted per-source sampling (r14): walk each source's docs
    in salted-md5 order and keep them while the RUNNING token total
    stays within ``budget`` — the unit real LLM data mixtures are
    specified in ("20B tokens of web, 2B of code"), where
    ``capped_source_sample`` counts documents.  A doc is kept iff the
    cumulative whitespace-token count INCLUDING it is ≤ budget, so the
    kept set is a pure function of (doc_id, salt, budget): reproducible
    across runs, engines and partitionings, and the oracle replays the
    identical walk in SQL.

    Scale posture: one shuffle on source; the running sum is a window
    over (hash, doc_id) within the source partition — no driver state,
    no iteration.  At 100 TB the source cardinality is small (10s–100s)
    while each source's docs are huge; if one source's partition skews,
    pre-aggregate by (source, hash-bucket) coarse ranges first — the
    budget cut only needs the prefix of the hash order, so a
    ``budget``-bounded early prune per bucket composes losslessly."""
    from pyspark.sql import Window

    h = salted_md5_long(F.col("doc_id").cast("string"), SAMPLE_SALT)
    n_tok = F.size(
        tokens(F.col("text")) if tokens_col is None else F.col(tokens_col)
    ).cast("long")
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    cum = F.sum("n_tokens").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        documents.select(
            "source", "doc_id", h.alias("h"), n_tok.alias("n_tokens")
        )
        .withColumn("cum_tokens", cum.cast("long"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
        .select("source", "doc_id", "rn", "n_tokens", "cum_tokens")
    )


TOKEN_BUDGET_SAMPLE_ORACLE = f"""
WITH h AS (
  SELECT source, doc_id,
         CAST(('0x' || substr(md5('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h,
         len({DD_TOKENS.format(t="text")})::BIGINT AS n_tokens
  FROM documents
),
r AS (
  SELECT source, doc_id, n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn,
         sum(n_tokens) OVER (
           PARTITION BY source ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         )::BIGINT AS cum_tokens
  FROM h
)
SELECT source, doc_id, rn, n_tokens, cum_tokens
FROM r WHERE cum_tokens <= {TOKEN_BUDGET}
"""


WEIGHTED_SAMPLE_SALT = "vse-wsample:"
WEIGHTED_SAMPLE_K = 50


def weighted_sample_es(
    documents: DataFrame, k: int = WEIGHTED_SAMPLE_K
) -> DataFrame:
    """Weighted sampling WITHOUT replacement in one distributed pass —
    Efraimidis & Spirakis (IPL 2006) A-ES: each item draws a uniform
    ``u`` and is ranked by ``key = ln(u)/w`` (equivalently ``u^(1/w)``);
    the global top-k by key is EXACTLY a weighted sample without
    replacement.  The importance-sampling primitive a curation pipeline
    uses to upweight long/high-quality documents without quota tables.

    ``u`` derives from a salted 60-bit md5 of the doc id — like the
    quota samplers, the kept set is a pure function of (doc_id, salt,
    k): reproducible across runs, engines and partitionings, and the
    oracle replays the identical draw in SQL.  Weight = ``n_chars``
    (clamped ≥ 1) — length-proportional sampling, the common
    token-budget-aware choice.

    Plan: pure column expressions + ``orderBy().limit(k)`` — Spark
    plans TakeOrderedAndProject (per-partition partial top-k, only k
    rows per partition reach the driver-side merge), NOT a global sort
    shuffle; the final rank window runs over k rows."""
    from pyspark.sql import Window

    u = salted_md5_unit(F.col("doc_id").cast("string"), WEIGHTED_SAMPLE_SALT)
    w = F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    key = F.log(u) / w
    topk = (
        documents.select(
            "doc_id",
            "source",
            w.cast("long").alias("weight"),
            key.alias("key"),
        )
        .orderBy(F.col("key").desc(), "doc_id")
        .limit(k)
    )
    rw = Window.orderBy(F.col("key").desc(), "doc_id")
    return (
        topk.withColumn("rank", F.row_number().over(rw))
        .select(
            "doc_id",
            "source",
            "weight",
            F.col("rank").cast("long").alias("rank"),
        )
    )


WEIGHTED_SAMPLE_ES_ORACLE = f"""
WITH h AS (
  SELECT doc_id, source, greatest(n_chars, 1)::DOUBLE AS w,
         CAST(('0x' || substr(md5('{WEIGHTED_SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM documents
),
keyed AS (
  SELECT doc_id, source, w,
         ln((h + 1) / {float(1 << 60)!r}) / w AS key
  FROM h
),
r AS (
  SELECT doc_id, source, w,
         row_number() OVER (ORDER BY key DESC, doc_id) AS "rank"
  FROM keyed
)
SELECT doc_id, source, CAST(w AS BIGINT) AS weight, "rank"
FROM r WHERE "rank" <= {WEIGHTED_SAMPLE_K}
"""


CAPPED_SOURCE_SAMPLE_ORACLE = f"""
WITH h AS (
  SELECT source, doc_id,
         CAST(('0x' || substr(md5('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM documents
),
r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
  FROM h
)
SELECT source, doc_id, rn FROM r WHERE rn <= {SAMPLE_CAP}
"""


VAL_PERMILLE = 100  # 10% validation split
SPLIT_SALT = "vse-split-v1"


def train_val_split(documents: DataFrame, val_permille: int = VAL_PERMILLE) -> DataFrame:
    """Deterministic train/validation split: assignment is a pure
    function of (doc_id, salt) — reproducible across runs, engines and
    partitionings, and immune to corpus growth (a doc never flips split
    when other docs arrive, unlike fraction-based ``randomSplit``).
    Per-row decision, zero shuffle."""
    h = salted_md5_long(F.col("doc_id").cast("string"), SPLIT_SALT)
    return documents.select(
        "doc_id",
        "source",
        F.when(h % 1000 < val_permille, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


TRAIN_VAL_SPLIT_ORACLE = f"""
SELECT doc_id, source,
       CASE WHEN CAST(('0x' || substr(md5('{SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 1000 < {VAL_PERMILLE}
            THEN 'val' ELSE 'train' END AS split
FROM documents
"""


PACK_CAPACITY = 2048  # tokens per packed training sequence


def pack_sequences(documents: DataFrame, capacity: int = PACK_CAPACITY) -> DataFrame:
    """Sequence packing (token-budget binning): assign docs to contiguous
    bins of ~``capacity`` tokens in deterministic (source, doc_id) order —
    the shard-local greedy packing a training-data pipeline runs before
    tokenized-example serialization.  Bin id = exclusive-prefix-sum of
    token counts ÷ capacity (a doc straddling a boundary stays in the bin
    it started in — bins overflow by < one doc rather than splitting
    docs), one window per source, one shuffle.

    Whitespace token counts (``doc_stats`` convention) keep the Spark and
    DuckDB sides in exact agreement."""
    from pyspark.sql import Window

    toks = F.size(F.filter(F.split(F.trim(F.col("text")), " "), lambda x: x != ""))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = documents.select(
        "doc_id", "source", toks.cast("long").alias("n_tokens")
    ).withColumn("prev_tokens", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return d.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(F.col("prev_tokens") / capacity).cast("long").alias("bin_id"),
    )


PACK_SEQUENCES_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         len(list_filter(string_split(trim(text), ' '), x -> x != '')) AS n_tokens
  FROM documents
),
p AS (
  SELECT doc_id, source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS prev_tokens
  FROM t
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(floor(CAST(prev_tokens AS DOUBLE) / {PACK_CAPACITY}) AS BIGINT) AS bin_id
FROM p
"""


# ---------------------------------------------------------------------------
# Within-document repetition (C4/Gopher-style quality signal)
# ---------------------------------------------------------------------------

REPETITION_THRESHOLD = 0.2  # rounded 2-gram repetition ratio above -> flag


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Within-document repetition ratios — the C4/Gopher-family quality
    filter that catches keyword-stuffed / template / looping generations
    exact dedup can't (the repetition is INSIDE one document).

    ``token_rep_ratio``  = 1 − distinct/total over words;
    ``gram2_rep_ratio``  = 1 − distinct/total over word 2-grams (ALL
    occurrences, not the distinct shingle sets the dedup family uses);
    ``is_repetitive``    = rounded 2-gram ratio > REPETITION_THRESHOLD.

    Pure column expressions over per-row arrays (NGram is a JVM sliding
    window): zero shuffle, embarrassingly parallel at any corpus size."""
    from pyspark.ml.feature import NGram

    df = documents.withColumn("_t", tokens(F.col("text")))
    df = NGram(n=2, inputCol="_t", outputCol="_g2").transform(df)
    n_tok = F.size("_t").cast("long")
    u_tok = F.size(F.array_distinct("_t")).cast("long")
    n_g2 = F.size("_g2").cast("long")
    u_g2 = F.size(F.array_distinct("_g2")).cast("long")
    tok_rep = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - u_tok.cast("double") / n_tok.cast("double")
    )
    g2_rep = F.round(
        F.when(n_g2 == 0, F.lit(0.0)).otherwise(
            F.lit(1.0) - u_g2.cast("double") / n_g2.cast("double")
        ),
        4,
    )
    return df.select(
        "doc_id",
        "source",
        n_tok.alias("n_tokens"),
        u_tok.alias("n_uniq_tokens"),
        n_g2.alias("n_2grams"),
        u_g2.alias("n_uniq_2grams"),
        F.round(tok_rep, 4).alias("token_rep_ratio"),
        g2_rep.alias("gram2_rep_ratio"),
        (g2_rep > REPETITION_THRESHOLD).alias("is_repetitive"),
    )


REPETITION_STATS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, {DD_TOKENS.format(t="text")} AS t FROM documents
),
g AS (
  SELECT doc_id, source, t, {DD_SHINGLES2.format(t="t")} AS g2 FROM tok
),
m AS (
  SELECT doc_id, source,
         len(t)::BIGINT AS n_tokens,
         len(list_distinct(t))::BIGINT AS n_uniq_tokens,
         len(g2)::BIGINT AS n_2grams,
         len(list_distinct(g2))::BIGINT AS n_uniq_2grams,
         CASE WHEN len(t) = 0 THEN 0.0
              ELSE 1.0 - CAST(len(list_distinct(t)) AS DOUBLE)
                         / CAST(len(t) AS DOUBLE) END AS tok_rep,
         round(CASE WHEN len(g2) = 0 THEN 0.0
               ELSE 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE)
                          / CAST(len(g2) AS DOUBLE) END, 4) AS g2_rep
  FROM g
)
SELECT doc_id, source, n_tokens, n_uniq_tokens, n_2grams, n_uniq_2grams,
       round(tok_rep, 4) AS token_rep_ratio,
       g2_rep AS gram2_rep_ratio,
       g2_rep > {REPETITION_THRESHOLD} AS is_repetitive
FROM m
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (train/eval n-gram overlap)
# ---------------------------------------------------------------------------

DECON_EVAL_MOD = 10
DECON_EVAL_REM = 7  # doc_id % 10 == 7 plays the held-out eval set
DECON_MIN_OVERLAP = 3


def decontaminate(
    documents: DataFrame,
    eval_docs: DataFrame | None = None,
    eval_mod: int = DECON_EVAL_MOD,
    eval_rem: int = DECON_EVAL_REM,
    min_overlap: int = DECON_MIN_OVERLAP,
    n: int = 3,
) -> DataFrame:
    """Train/eval contamination check: for every training document, the
    count of distinct word n-grams it shares with the held-out eval set,
    and a ``contaminated`` flag at ``min_overlap`` — the decontamination
    pass every LLM training pipeline runs before training (production uses
    n≈13; n=3 here so the DuckDB oracle reuses the shared shingle twin).

    Pass the held-out benchmark as ``eval_docs`` (any DataFrame with a
    ``text`` column); then ALL of ``documents`` is treated as the training
    corpus.  When ``eval_docs`` is None the eval set is carved
    deterministically from the corpus (``doc_id % eval_mod == eval_rem``)
    so the operator stays self-contained on the fixture tables.

    Scale shape: the eval side (benchmarks are small by contract) reduces
    to a distinct shingle-hash set and BROADCASTS; the corpus explodes
    once and map-side joins it — no corpus self-join, one shuffle total
    (the per-doc overlap count).  100 TB posture: corpus-side rows carry
    only (doc_id, shingle) until the count."""
    sh = with_shingles(documents.select("doc_id", "text"), "_sh", n=n)
    if eval_docs is not None:
        eval_sh = (
            with_shingles(eval_docs.select("text"), "_sh", n=n)
            .select(F.explode("_sh").alias("s"))
            .distinct()
        )
        corpus = sh
    else:
        eval_sh = (
            sh.filter(F.col("doc_id") % eval_mod == eval_rem)
            .select(F.explode("_sh").alias("s"))
            .distinct()
        )
        corpus = sh.filter(F.col("doc_id") % eval_mod != eval_rem)
    overlap = (
        corpus.select("doc_id", F.explode("_sh").alias("s"))
        .join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_overlap"))
    )
    return (
        corpus.select("doc_id")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_overlap).alias(
                "contaminated"
            ),
        )
    )


DECONTAMINATE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {DD_TOKENS.format(t="text")} AS t FROM documents
),
sh AS (
  SELECT doc_id, list_distinct({DD_SHINGLES3.format(t="t")}) AS sh FROM tok
),
eval_sh AS (
  SELECT DISTINCT s FROM (
    SELECT unnest(sh) AS s FROM sh
    WHERE doc_id % {DECON_EVAL_MOD} = {DECON_EVAL_REM}
  )
),
corpus AS (
  SELECT doc_id, sh FROM sh WHERE doc_id % {DECON_EVAL_MOD} != {DECON_EVAL_REM}
),
posts AS (SELECT doc_id, unnest(sh) AS s FROM corpus),
ov AS (
  SELECT p.doc_id, count(*)::BIGINT AS n_overlap
  FROM posts p JOIN eval_sh e USING (s)
  GROUP BY p.doc_id
)
SELECT c.doc_id,
       coalesce(o.n_overlap, 0)::BIGINT AS n_overlap,
       coalesce(o.n_overlap, 0) >= {DECON_MIN_OVERLAP} AS contaminated
FROM corpus c LEFT JOIN ov o USING (doc_id)
"""


# ---------------------------------------------------------------------------
# PII scrubbing (regex redaction — the mandatory pre-training scrub pass)
# ---------------------------------------------------------------------------

# Lookahead-free patterns so java.util.regex (Spark) and RE2 (DuckDB)
# match byte-identically; scrub order is fixed (emails, then IPv4, then
# phone-shaped digit runs) so the counts compose deterministically.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d\- ]{6,}\d"


def pii_scrub(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / phone-shaped digit runs to typed tags.

    Pure column expressions (regexp_count + three regexp_replace passes)
    — zero shuffle, embarrassingly parallel at 100 TB like every scan in
    this module.  Counts are measured BEFORE each replacement on the
    partially-scrubbed text so email local-parts never double-count as
    phones, and the fixed order makes Spark and the oracle agree
    byte-for-byte."""
    t0 = F.col(text_col)
    n_emails = F.regexp_count(t0, F.lit(PII_EMAIL))
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    n_ips = F.regexp_count(t1, F.lit(PII_IPV4))
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    n_phones = F.regexp_count(t2, F.lit(PII_PHONE))
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return documents.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
        (n_emails + n_ips + n_phones > 0).alias("had_pii"),
        t3.alias("scrubbed_text"),
    )


# The fixture corpus is synthetic lowercase prose with no PII, so the
# graded query plants deterministic PII derived from doc_id — identically
# on both sides — before scrubbing; the operator itself takes any corpus.
PII_PLANT_SPARK = (
    "concat(text, ' contact user', cast(doc_id as string), '@example.com or ',"
    " cast(doc_id % 256 as string), '.12.13.14 tel +1 555 01', "
    "cast(doc_id % 100 as string), '99')"
)
PII_PLANT_DD = (
    "text || ' contact user' || doc_id || '@example.com or ' || "
    "(doc_id % 256) || '.12.13.14 tel +1 555 01' || (doc_id % 100) || '99'"
)

PII_SCRUB_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, {PII_PLANT_DD} AS text FROM documents
),
e AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{PII_EMAIL}'))::BIGINT AS n_emails,
         regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1
  FROM planted
),
i AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1, '{PII_IPV4}'))::BIGINT AS n_ips,
         regexp_replace(t1, '{PII_IPV4}', '<IP>', 'g') AS t2
  FROM e
),
p AS (
  SELECT doc_id, n_emails, n_ips,
         len(regexp_extract_all(t2, '{PII_PHONE}'))::BIGINT AS n_phones,
         regexp_replace(t2, '{PII_PHONE}', '<PHONE>', 'g') AS scrubbed_text
  FROM i
)
SELECT doc_id, n_emails, n_ips, n_phones,
       (n_emails + n_ips + n_phones) > 0 AS had_pii,
       scrubbed_text
FROM p
"""


# ---------------------------------------------------------------------------
# Gopher-style rule-based quality filter
# ---------------------------------------------------------------------------

QF_MIN_WORDS = 50
QF_MAX_WORDS = 100_000
QF_MIN_MEAN_WORD_LEN = 3.0
QF_MAX_MEAN_WORD_LEN = 10.0
QF_MIN_ALPHA_WORD_FRAC = 0.80
QF_MIN_STOPWORD_HITS = 2


def quality_filter(
    documents: DataFrame, tokens_col: str | None = None
) -> DataFrame:
    """Rule-based document quality filter in the Gopher style (Rae et al.
    2021 §A1.1): word-count window, mean-word-length window, minimum
    fraction of words containing an alphabetic character, and a minimum
    number of distinct English stopwords.  Emits the metrics, a ``keep``
    verdict, and a deterministic comma-joined ``reject_reasons`` string
    (stable across engines — arrays of strings hash differently).

    Pure column expressions over one materialized token array — zero
    shuffle; the 100 TB plan is a single scan.  ``tokens_col`` consumes
    a pre-tokenized array column (the pipeline's one-scan handoff)."""
    if tokens_col is None:
        documents = documents.withColumn("_t", tokens(F.col("text")))
        tokens_col = "_t"
    t = F.col(tokens_col)
    n_words = F.size(t).cast("long")
    mean_wl = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            F.transform(t, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
        / n_words.cast("double")
    )
    alpha_frac = F.when(n_words == 0, F.lit(0.0)).otherwise(
        F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]"))).cast("double")
        / n_words.cast("double")
    )
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(t), F.array(*[F.lit(w) for w in STOPWORDS["en"]])
        )
    ).cast("long")
    r_nwords = (n_words < QF_MIN_WORDS) | (n_words > QF_MAX_WORDS)
    r_wordlen = (F.round(mean_wl, 4) < QF_MIN_MEAN_WORD_LEN) | (
        F.round(mean_wl, 4) > QF_MAX_MEAN_WORD_LEN
    )
    r_alpha = F.round(alpha_frac, 4) < QF_MIN_ALPHA_WORD_FRAC
    r_stop = stop_hits < QF_MIN_STOPWORD_HITS
    reasons = F.concat_ws(
        ",",
        F.when(r_nwords, F.lit("n_words")),
        F.when(r_wordlen, F.lit("mean_word_len")),
        F.when(r_alpha, F.lit("alpha_frac")),
        F.when(r_stop, F.lit("stopwords")),
    )
    return documents.select(
        "doc_id",
        "source",
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(alpha_frac, 4).alias("alpha_word_frac"),
        stop_hits.alias("stopword_hits"),
        (~(r_nwords | r_wordlen | r_alpha | r_stop)).alias("keep"),
        reasons.alias("reject_reasons"),
    )


QUALITY_FILTER_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, {DD_TOKENS.format(t="text")} AS t FROM documents
),
m AS (
  SELECT doc_id, source,
         len(t)::BIGINT AS n_words,
         CASE WHEN len(t) = 0 THEN 0.0
              ELSE round(CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
                   / CAST(len(t) AS DOUBLE), 4) END AS mean_word_len,
         CASE WHEN len(t) = 0 THEN 0.0
              ELSE round(CAST(len(list_filter(t,
                       x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                   / CAST(len(t) AS DOUBLE), 4) END AS alpha_word_frac,
         len(list_intersect(list_distinct(t),
             {_dd_list(STOPWORDS["en"])}))::BIGINT AS stopword_hits
  FROM tok
),
r AS (
  SELECT *,
         (n_words < {QF_MIN_WORDS} OR n_words > {QF_MAX_WORDS}) AS r_nwords,
         (mean_word_len < {QF_MIN_MEAN_WORD_LEN}
          OR mean_word_len > {QF_MAX_MEAN_WORD_LEN}) AS r_wordlen,
         (alpha_word_frac < {QF_MIN_ALPHA_WORD_FRAC}) AS r_alpha,
         (stopword_hits < {QF_MIN_STOPWORD_HITS}) AS r_stop
  FROM m
)
SELECT doc_id, source, n_words, mean_word_len, alpha_word_frac, stopword_hits,
       NOT (r_nwords OR r_wordlen OR r_alpha OR r_stop) AS keep,
       concat_ws(',',
         CASE WHEN r_nwords THEN 'n_words' END,
         CASE WHEN r_wordlen THEN 'mean_word_len' END,
         CASE WHEN r_alpha THEN 'alpha_frac' END,
         CASE WHEN r_stop THEN 'stopwords' END) AS reject_reasons
FROM r
"""


# ---------------------------------------------------------------------------
# Corpus n-gram statistics (boilerplate / template detection)
# ---------------------------------------------------------------------------

NGRAM_TOP_K = 20


def ngram_stats(documents: DataFrame, top_k: int = NGRAM_TOP_K) -> DataFrame:
    """Top-k word bigrams per source with occurrence and document counts —
    the corpus-statistics pass behind boilerplate detection (a 2-gram that
    appears in most of a source's documents is template text, not prose).

    Plan shape at 100 TB: NGram runs JVM-side per row, the explode feeds
    ONE partial-aggregated shuffle on (source, ngram) — both counts
    (occurrences via count(*), documents via count(distinct doc_id))
    resolve in the same aggregation; the per-source top-k window then
    operates on the already-tiny aggregate.  Deterministic tie-break
    (count desc, ngram asc) keeps the cut stable across engines."""
    from pyspark.ml.feature import NGram
    from pyspark.sql import Window

    df = documents.withColumn("_t", tokens(F.col("text")))
    df = NGram(n=2, inputCol="_t", outputCol="_g2").transform(df)
    pairs = df.select("doc_id", "source", F.explode("_g2").alias("ngram"))
    agg = pairs.groupBy("source", "ngram").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_occurrences").desc(), F.col("ngram").asc()
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            "source",
            F.col("rank").cast("long").alias("rank"),
            "ngram",
            "n_occurrences",
            "n_docs",
        )
    )


NGRAM_STATS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, {DD_TOKENS.format(t="text")} AS t FROM documents
),
grams AS (
  SELECT doc_id, source, unnest({DD_SHINGLES2.format(t="t")}) AS ngram
  FROM tok
),
agg AS (
  SELECT source, ngram,
         count(*)::BIGINT AS n_occurrences,
         count(DISTINCT doc_id)::BIGINT AS n_docs
  FROM grams GROUP BY source, ngram
),
ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY source ORDER BY n_occurrences DESC, ngram ASC
         )::BIGINT AS rank
  FROM agg
)
SELECT source, rank, ngram, n_occurrences, n_docs
FROM ranked WHERE rank <= {NGRAM_TOP_K}
"""


# ---------------------------------------------------------------------------
# Cross-document duplicated-span statistics (exact-substring dedup signal)
# ---------------------------------------------------------------------------

DUP_SPAN_N = 5
DUP_SPAN_THRESHOLD = 0.5


def dup_span_stats(
    documents: DataFrame, n: int = DUP_SPAN_N, threshold: float = DUP_SPAN_THRESHOLD
) -> DataFrame:
    """Per-document fraction of word n-gram spans that also appear in at
    least one OTHER document — the span-granularity approximation of
    exact-substring dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", 2022): a document made mostly of
    spans seen elsewhere is boilerplate or a partial copy even when no
    whole-document dup exists.

    Plan shape at 100 TB: one shingle pass (JVM NGram), postings carry
    a 32-hex md5 key (never the span text) through the two shuffles —
    the doc-frequency aggregation and the postings⋈dup-keys join; both
    partial-aggregate map-side.  Docs shorter than n words surface with
    zero spans, not dropped."""
    sh = with_shingles(documents.select("doc_id", "text"), out_col="_sh", n=n)
    posts = sh.select("doc_id", F.explode("_sh").alias("_s")).select(
        "doc_id", F.md5("_s").alias("h")
    )
    freq = posts.groupBy("h").agg(F.count("*").cast("long").alias("df"))
    dup = freq.filter(F.col("df") >= 2).select("h", F.lit(1).alias("is_dup"))
    per_doc = (
        posts.join(dup, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0)))
            .cast("long")
            .alias("n_dup_spans"),
        )
    )
    out = (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .na.fill({"n_spans": 0, "n_dup_spans": 0})
    )
    frac = F.when(F.col("n_spans") == 0, F.lit(0.0)).otherwise(
        F.round(
            F.col("n_dup_spans").cast("double") / F.col("n_spans").cast("double"),
            4,
        )
    )
    return out.select(
        "doc_id",
        "n_spans",
        "n_dup_spans",
        frac.alias("dup_span_frac"),
        (frac >= F.lit(threshold)).alias("mostly_duplicated"),
    )


# word 5-grams over a token-array column {t} (all occurrences; the Spark
# side dedups per doc via array_distinct inside with_shingles)
DD_SHINGLES5 = (
    "list_transform(range(1, greatest(len({t})-4, 0)+1), "
    "i -> {t}[i] || ' ' || {t}[i+1] || ' ' || {t}[i+2] || ' ' || {t}[i+3]"
    " || ' ' || {t}[i+4])"
)

DUP_SPAN_STATS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {DD_TOKENS.format(t="text")} AS t FROM documents
),
sh AS (
  SELECT doc_id, list_distinct({DD_SHINGLES5.format(t="t")}) AS spans FROM tok
),
posts AS (
  SELECT doc_id, md5(unnest(spans)) AS h FROM sh
),
freq AS (
  SELECT h, count(*)::BIGINT AS df FROM posts GROUP BY h
),
per_doc AS (
  SELECT p.doc_id,
         count(*)::BIGINT AS n_spans,
         sum(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans
  FROM posts p JOIN freq f USING (h)
  GROUP BY p.doc_id
)
SELECT d.doc_id,
       coalesce(pd.n_spans, 0)::BIGINT AS n_spans,
       coalesce(pd.n_dup_spans, 0)::BIGINT AS n_dup_spans,
       CASE WHEN coalesce(pd.n_spans, 0) = 0 THEN 0.0
            ELSE round(CAST(pd.n_dup_spans AS DOUBLE)
                 / CAST(pd.n_spans AS DOUBLE), 4) END AS dup_span_frac,
       (CASE WHEN coalesce(pd.n_spans, 0) = 0 THEN 0.0
             ELSE round(CAST(pd.n_dup_spans AS DOUBLE)
                  / CAST(pd.n_spans AS DOUBLE), 4) END)
           >= {DUP_SPAN_THRESHOLD} AS mostly_duplicated
FROM documents d LEFT JOIN per_doc pd USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Corpus-relative unigram statistics (LM-free quality proxy)
# ---------------------------------------------------------------------------

RARE_MAX_COUNT = 2  # a token seen <= this many times corpus-wide is "rare"


def unigram_stats(documents: DataFrame, rare_max_count: int = RARE_MAX_COUNT) -> DataFrame:
    """Per-document statistics against the corpus unigram distribution:
    mean token frequency (ppm) and the fraction of rare tokens — the
    language-model-free stand-in for perplexity filtering (docs full of
    corpus-rare tokens are OCR junk, codes, or noise).

    Determinism discipline for the oracle hash: the per-doc mean token
    frequency is ``Σ_t cnt_t / (total · n_tokens)`` — the numerator is
    an INTEGER sum (order-insensitive by construction), so the whole
    metric reduces to exact integer aggregation plus two final IEEE
    divisions in a fixed order; no float accumulation anywhere, hence
    nothing for aggregation order or libm to diverge on.  This also
    bounds per-group aggregation state to a few counters regardless of
    document length (an earlier formulation buffered one float per
    token per doc — an ~80 MB cell for a pathological 10M-token doc).
    Plan: one token-count aggregation, one posting⋈counts shuffle join,
    one per-doc aggregation — all partial-aggregated."""
    posts = documents.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    counts = posts.groupBy("tok").agg(F.count("*").cast("long").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("long").alias("total"))
    freqs = (
        posts.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "cnt",
            "total",
            (F.col("cnt") <= rare_max_count).cast("long").alias("is_rare"),
        )
    )
    per_doc = freqs.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum("is_rare").cast("long").alias("n_rare"),
        F.sum("cnt").cast("long").alias("sum_cnt"),
        F.max("total").cast("long").alias("total"),  # constant per group
    )
    mean_ppm = F.round(
        F.col("sum_cnt").cast("double")
        / F.col("total").cast("double")
        / F.col("n_tokens").cast("double")
        * 1_000_000.0,
        4,
    )
    out = documents.select("doc_id").join(per_doc, "doc_id", "left")
    return out.select(
        "doc_id",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_rare"), F.lit(0)).cast("long").alias("n_rare"),
        F.coalesce(
            F.when(F.col("n_tokens") > 0,
                   F.round(F.col("n_rare").cast("double")
                           / F.col("n_tokens").cast("double"), 4)),
            F.lit(0.0),
        ).alias("rare_frac"),
        F.coalesce(F.when(F.col("n_tokens") > 0, mean_ppm), F.lit(0.0)).alias(
            "mean_token_freq_ppm"
        ),
    )


UNIGRAM_STATS_ORACLE = f"""
WITH posts AS (
  SELECT doc_id, unnest({DD_TOKENS.format(t="text")}) AS tok FROM documents
),
counts AS (
  SELECT tok, count(*)::BIGINT AS cnt FROM posts GROUP BY tok
),
tot AS (SELECT sum(cnt)::BIGINT AS total FROM counts),
freqs AS (
  SELECT p.doc_id, c.cnt, t.total,
         CASE WHEN c.cnt <= {RARE_MAX_COUNT} THEN 1 ELSE 0 END AS is_rare
  FROM posts p JOIN counts c USING (tok) CROSS JOIN tot t
),
per_doc AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_tokens,
         sum(is_rare)::BIGINT AS n_rare,
         sum(cnt)::BIGINT AS sum_cnt,
         max(total)::BIGINT AS total
  FROM freqs GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(pd.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(pd.n_rare, 0)::BIGINT AS n_rare,
       CASE WHEN coalesce(pd.n_tokens, 0) = 0 THEN 0.0
            ELSE round(CAST(pd.n_rare AS DOUBLE)
                 / CAST(pd.n_tokens AS DOUBLE), 4) END AS rare_frac,
       CASE WHEN coalesce(pd.n_tokens, 0) = 0 THEN 0.0
            ELSE round(CAST(pd.sum_cnt AS DOUBLE) / CAST(pd.total AS DOUBLE)
                 / CAST(pd.n_tokens AS DOUBLE) * 1000000.0, 4)
       END AS mean_token_freq_ppm
FROM documents d LEFT JOIN per_doc pd USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Data-mixture sampling (per-source target weights)
# ---------------------------------------------------------------------------


def mixture_sample(
    documents: DataFrame, weights: DataFrame | None = None
) -> DataFrame:
    """Deterministic data-mixture sampling — the pretraining mixing step:
    each source gets a quota proportional to its target weight, scaled to
    the largest batch multiplier every source can actually satisfy
    (``B = min_s floor(n_s / w_s)``, quota_s = ``w_s · B``), and fills it
    with the top-``quota`` docs by the same salted-md5 rank
    ``capped_source_sample`` uses — reproducible across runs, engines and
    partitionings.

    ``weights``: an optional ``(source, weight)`` DataFrame — the
    production path: a mixture config joins in as a tiny broadcast
    table; sources it omits default to weight 1 (and sources it names
    but the corpus lacks contribute nothing).  When absent, weights
    derive from the source name (1 + numeric-suffix mod 4) so the
    fixture oracle can recompute them without a side table.  Plan: one
    tiny per-source aggregate (broadcast), one window rank — the corpus
    never shuffles on anything except the rank's source partitioning."""
    from pyspark.sql import Window

    stats = documents.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    if weights is not None:
        # Aggregate the config first: duplicate source rows must not fan
        # out the per-source stats row (the oracle resolves duplicates the
        # same way — COALESCE(max(w.weight), 1)); weight < 1 would make a
        # null/negative batch multiplier, so clamp to >= 1.
        stats = stats.join(
            F.broadcast(
                weights.select(
                    "source", F.col("weight").cast("long").alias("weight")
                )
                .groupBy("source")
                .agg(F.max("weight").alias("weight"))
            ),
            "source",
            "left",
        ).withColumn(
            "weight",
            F.greatest(
                F.coalesce(F.col("weight"), F.lit(1).cast("long")),
                F.lit(1).cast("long"),
            ),
        )
    else:
        # non-numeric suffixes weight 1 (try_cast: ANSI cast would throw
        # on them — coalescing keeps the fixture-default derivation
        # total; the oracle mirrors this with DuckDB's TRY_CAST)
        stats = stats.withColumn(
            "weight",
            F.coalesce(
                (
                    1 + F.substring(F.col("source"), 4, 10).try_cast("int") % 4
                ).cast("long"),
                F.lit(1).cast("long"),
            ),
        )
    b = stats.agg(
        F.min(F.floor(F.col("n_docs") / F.col("weight")))
        .cast("long")
        .alias("b")
    )
    plan = stats.crossJoin(F.broadcast(b)).select(
        "source",
        "weight",
        (F.col("weight") * F.col("b")).cast("long").alias("quota"),
    )
    h = salted_md5_long(F.col("doc_id").cast("string"), SAMPLE_SALT)
    win = Window.partitionBy("source").orderBy("h", "doc_id")
    ranked = (
        documents.select("source", "doc_id", h.alias("h"))
        .withColumn("rn", F.row_number().over(win))
    )
    return (
        ranked.join(F.broadcast(plan), "source")
        .filter(F.col("rn") <= F.col("quota"))
        .select(
            "source",
            "doc_id",
            F.col("rn").cast("long").alias("sample_rank"),
            "weight",
            "quota",
        )
    )


MIXTURE_SAMPLE_ORACLE = f"""
WITH stats AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         COALESCE(1 + TRY_CAST(substr(source, 4) AS INTEGER) % 4, 1)::BIGINT
           AS weight
  FROM documents GROUP BY source
),
b AS (SELECT min(n_docs // weight)::BIGINT AS b FROM stats),
plan AS (
  SELECT source, weight, (weight * b.b)::BIGINT AS quota
  FROM stats CROSS JOIN b
),
h AS (
  SELECT source, doc_id,
         CAST(('0x' || substr(md5('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM documents
),
r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
  FROM h
)
SELECT r.source, r.doc_id, r.rn AS sample_rank, p.weight, p.quota
FROM r JOIN plan p USING (source)
WHERE r.rn <= p.quota
"""


# Fixture weight table for the explicit-weights path (registry
# corpus_mixture_sample_weighted): named sources override, the rest
# default to 1 — mirrored verbatim in the oracle's VALUES CTE.
MIXTURE_WEIGHTS_FIXTURE: tuple[tuple[str, int], ...] = (
    ("src0", 5),
    ("src1", 3),
    ("src2", 2),
)

MIXTURE_SAMPLE_WEIGHTED_ORACLE = f"""
WITH wt(source, weight) AS (
  VALUES {", ".join(f"('{s}', {w})" for s, w in MIXTURE_WEIGHTS_FIXTURE)}
),
stats AS (
  -- GREATEST mirrors the engine's weight >= 1 clamp (text_ops.mixture_sample):
  -- a config weight of 0 or negative would zero/negate the batch multiplier.
  SELECT d.source, count(*)::BIGINT AS n_docs,
         GREATEST(COALESCE(max(w.weight), 1), 1)::BIGINT AS weight
  FROM documents d LEFT JOIN wt w ON d.source = w.source
  GROUP BY d.source
),
b AS (SELECT min(n_docs // weight)::BIGINT AS b FROM stats),
plan AS (
  SELECT source, weight, (weight * b.b)::BIGINT AS quota
  FROM stats CROSS JOIN b
),
h AS (
  SELECT source, doc_id,
         CAST(('0x' || substr(md5('{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM documents
),
r AS (
  SELECT source, doc_id,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
  FROM h
)
SELECT r.source, r.doc_id, r.rn AS sample_rank, p.weight, p.quota
FROM r JOIN plan p USING (source)
WHERE r.rn <= p.quota
"""


# ---------------------------------------------------------------------------
# Document chunking (fixed-size token windows with overlap)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 40
CHUNK_OVERLAP = 8


def chunk_documents(
    documents: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the chunking pass every pretraining / retrieval pipeline runs before
    embedding or packing.  Chunk starts advance by ``chunk_tokens −
    overlap``; the final window is clipped to the document end; docs
    with zero tokens emit no rows.

    Pure per-row array expressions (sequence → posexplode → slice):
    zero shuffle, and chunk identity (doc_id, chunk_id, start/end token
    offsets) is deterministic — two runs or two engines produce the
    identical chunk table."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    df = documents.withColumn("_t", tokens(F.col("text")))
    n = F.size("_t")
    starts = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(
            F.lit(1), F.greatest(n - F.lit(overlap), F.lit(1)), F.lit(step)
        )
    )
    df = df.select(
        "doc_id", "_t", n.alias("_n"), F.posexplode(starts).alias("pos", "start")
    )
    end = F.least(F.col("start") + F.lit(chunk_tokens - 1), F.col("_n"))
    return df.select(
        "doc_id",
        (F.col("pos") + 1).cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start_tok"),
        end.cast("long").alias("end_tok"),
        (end - F.col("start") + 1).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice(F.col("_t"), F.col("start"), end - F.col("start") + 1)
        ).alias("chunk_text"),
    )


CHUNK_DOCUMENTS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {DD_TOKENS.format(t="text")} AS t FROM documents
),
starts AS (
  SELECT doc_id, t, len(t) AS n,
         unnest(range(1, greatest(len(t) - {CHUNK_OVERLAP}, 1) + 1,
                      {CHUNK_TOKENS - CHUNK_OVERLAP})) AS start
  FROM tok WHERE len(t) > 0
)
SELECT doc_id,
       ((start - 1) / {CHUNK_TOKENS - CHUNK_OVERLAP} + 1)::BIGINT AS chunk_id,
       start::BIGINT AS start_tok,
       least(start + {CHUNK_TOKENS - 1}, n)::BIGINT AS end_tok,
       (least(start + {CHUNK_TOKENS - 1}, n) - start + 1)::BIGINT
           AS n_chunk_tokens,
       array_to_string(
           list_slice(t, start, least(start + {CHUNK_TOKENS - 1}, n)),
           ' ') AS chunk_text
FROM starts
"""


# ---------------------------------------------------------------------------
# Cross-document duplicated-substring spans (exact-substring dedup)
# ---------------------------------------------------------------------------


def substring_spans(documents: DataFrame, n: int = DUP_SPAN_N) -> DataFrame:
    """Maximal per-document token spans whose every length-``n`` window also
    appears in at least one OTHER document — the span-EXTRACTION step of
    exact-substring dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better", 2022).  ``dup_span_stats`` scores documents by
    how much of them is duplicated; this operator returns the actual
    ``[span_start, span_end]`` token ranges (1-based, inclusive) plus the
    span text, i.e. exactly what a cleaning pass would cut out.

    The dup criterion is **cross-document** (``n`` -gram seen in >= 2
    distinct docs), so a document that merely repeats itself internally
    emits nothing — that case is ``repetition_stats``'s claim.

    Plan shape at 100 TB (all JVM, zero Python):
      * one NGram pass + posexplode — postings carry (doc_id, pos, md5);
        span text never rides the postings, only the 32-hex key;
      * dup keys via one hash aggregation (count distinct doc_id,
        map-side partial);
      * left-semi postings⋈dup — co-partitioned on the hash key;
      * gaps-and-islands merge is a per-document window (lag + running
        sum), i.e. one shuffle by doc_id — overlapping/adjacent windows
        (gap <= n tokens) coalesce into maximal spans;
      * span text via one co-partitioned join back to the tokenized doc
        (slice of the token array, not a regex over raw text).
    """
    from pyspark.ml.feature import NGram
    from pyspark.sql import Window

    toks = documents.select("doc_id", tokens(F.col("text")).alias("t"))
    sh = NGram(n=n, inputCol="t", outputCol="_ng").transform(toks)
    posts = sh.select(
        "doc_id", F.posexplode("_ng").alias("pos0", "_g")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), F.md5("_g").alias("h"))
    dup = (
        posts.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("ddf"))
        .filter(F.col("ddf") >= 2)
        .select("h")
    )
    dp = posts.join(dup, "h", "leftsemi").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.lag("pos").over(w).isNull()
        | (F.col("pos") > F.lag("pos").over(w) + n),
        F.lit(1),
    ).otherwise(F.lit(0))
    grp = dp.withColumn("_b", brk).withColumn(
        "gid", F.sum("_b").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = grp.groupBy("doc_id", "gid").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + (n - 1)).cast("long").alias("span_end"),
        (F.max("pos") + (n - 1) - F.min("pos") + 1).cast("long").alias("span_tokens"),
        F.count("*").cast("long").alias("n_shingles"),
    )
    return spans.join(toks, "doc_id").select(
        "doc_id",
        "span_start",
        "span_end",
        "span_tokens",
        "n_shingles",
        F.concat_ws(
            " ", F.slice(F.col("t"), F.col("span_start"), F.col("span_tokens"))
        ).alias("span_text"),
    )


SUBSTRING_SPANS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {DD_TOKENS.format(t="text")} AS t FROM documents
),
sh AS (
  SELECT doc_id, {DD_SHINGLES5.format(t="t")} AS gs FROM tok
),
posts AS (
  SELECT doc_id, unnest(range(1, len(gs)+1))::BIGINT AS pos,
         md5(unnest(gs)) AS h
  FROM sh
),
dup AS (
  SELECT h FROM posts GROUP BY h HAVING count(DISTINCT doc_id) >= 2
),
dp AS (SELECT p.doc_id, p.pos FROM posts p JOIN dup USING (h)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {DUP_SPAN_N}
              THEN 1 ELSE 0 END AS b
  FROM dp WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
grp AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS UNBOUNDED PRECEDING) AS gid
  FROM brk
),
sp AS (
  SELECT doc_id,
         min(pos)::BIGINT AS span_start,
         (max(pos)+{DUP_SPAN_N - 1})::BIGINT AS span_end,
         (max(pos)+{DUP_SPAN_N - 1}-min(pos)+1)::BIGINT AS span_tokens,
         count(*)::BIGINT AS n_shingles
  FROM grp GROUP BY doc_id, gid
)
SELECT s.doc_id, s.span_start, s.span_end, s.span_tokens, s.n_shingles,
       array_to_string(list_slice(tok.t, s.span_start, s.span_end), ' ')
           AS span_text
FROM sp s JOIN tok USING (doc_id)
"""


def substring_dedup_clean(documents: DataFrame, n: int = DUP_SPAN_N) -> DataFrame:
    """The cleaning pass composed over ``substring_spans``: every token
    covered by a cross-document duplicated span is dropped and the
    remainder re-joined — the output a training-data pipeline would
    actually feed downstream (Lee et al. 2022 cut the spans from the
    text; docs with nothing duplicated pass through verbatim).

    Plan shape: spans aggregated to one ``[start, end]`` interval list
    per doc (tiny — bounded by doc length / n), then ONE co-partitioned
    left join onto the tokenized corpus and a JVM ``filter`` lambda over
    token positions.  No Python, no second scan of the text.
    """
    toks = documents.select("doc_id", tokens(F.col("text")).alias("t"))
    iv = (
        substring_spans(documents, n=n)
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("_iv"),
            F.sum("span_tokens").cast("long").alias("removed_tokens"),
        )
    )
    joined = toks.join(iv, "doc_id", "left")
    covered = lambda i: F.exists(  # noqa: E731
        F.col("_iv"),
        lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
    )
    kept = F.when(F.col("_iv").isNull(), F.col("t")).otherwise(
        F.filter(F.col("t"), lambda x, i: ~covered(i + 1))
    )
    return joined.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.coalesce(F.col("removed_tokens"), F.lit(0)).cast("long").alias(
            "removed_tokens"
        ),
        F.concat_ws(" ", kept).alias("clean_text"),
    )


SUBSTRING_DEDUP_CLEAN_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {DD_TOKENS.format(t="text")} AS t FROM documents
),
sp AS ({SUBSTRING_SPANS_ORACLE.strip()}),
iv AS (
  SELECT doc_id,
         list({{'span_start': span_start, 'span_end': span_end}}) AS iv,
         sum(span_tokens)::BIGINT AS removed_tokens
  FROM sp GROUP BY doc_id
)
SELECT tok.doc_id,
       len(tok.t)::BIGINT AS n_tokens,
       coalesce(iv.removed_tokens, 0)::BIGINT AS removed_tokens,
       coalesce(array_to_string(
         list_transform(
           list_filter(range(1, len(tok.t)+1),
             i -> iv.iv IS NULL OR
                  len(list_filter(iv.iv,
                      s -> i >= s.span_start AND i <= s.span_end)) = 0),
           i -> tok.t[i]),
         ' '), '') AS clean_text
FROM tok LEFT JOIN iv USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Frequent n-gram mining — exact heavy hitters with a bounded-memory
# candidate pass (boilerplate / repeated-template detection)
# ---------------------------------------------------------------------------

FREQUENT_NGRAM_THRESHOLD = 5
FREQUENT_NGRAM_N = 3


def frequent_ngrams(
    documents: DataFrame,
    threshold: int = FREQUENT_NGRAM_THRESHOLD,
    n: int = FREQUENT_NGRAM_N,
    capacity: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Every word ``n``-gram occurring at least ``threshold`` times across
    the corpus, with its EXACT count — the frequent-phrase / boilerplate
    detector (the C4 / RefinedWeb-style repeated-template signal), computed
    WITHOUT ever shuffling the full posting list.

    Two passes (Misra–Gries 1982 summaries, merged per the mergeable-
    summaries bound of Agarwal et al., PODS 2012):

      1. **Candidate pass** (``mapInPandas``, bounded memory): each input
         partition folds its Arrow batches into one Misra–Gries summary of
         at most ``capacity`` counters.  Merge step = add the batch's
         counts, then, if over capacity, subtract the (capacity+1)-th
         largest count ``delta`` from every counter and drop the
         non-positive ones; ``delta`` accumulates into the partition's
         error bound ``err``.  Invariant per partition p, for every gram
         g:  ``true_p(g) - err_p <= kept_p(g) <= true_p(g)``, and a gram
         ABSENT from the summary has ``true_p(g) <= err_p``.  The entire
         pass-1 shuffle is <= capacity+1 rows per partition (the
         counters plus one NULL-gram accounting row carrying ``err_p``)
         — no posting explode, no full-vocabulary aggregation.
      2. **Prune + exact recount**: summing kept counts gives a lower
         bound and ``lower(g) + TOTAL_ERR`` (TOTAL_ERR = sum of err_p) an
         upper bound for every gram; grams with upper < threshold cannot
         qualify and are dropped BEFORE anything reaches the driver.  Any
         gram with true count >= threshold > N/(capacity+1) must survive
         at least one partition summary (averaging argument), so the
         survivors are a SUPERSET of the answer, numbering at most
         N/(threshold - N/(capacity+1)) (~2N/threshold at the default
         capacity) — small enough to broadcast.  A second scan joins the
         exploded grams against the broadcast candidate set and counts
         EXACTLY (map-side partial aggregation keeps that shuffle at
         <= |candidates| rows per partition).  The output is therefore
         precise and deterministic no matter how summary tie-breaking or
         partitioning went — which is what lets a probabilistic-looking
         sketch carry a plain ``HAVING count(*) >= t`` oracle.

    ``capacity`` defaults to ``2N/threshold + 1`` (N = corpus gram count
    from a one-aggregate pre-scan): the guarantee then has slack
    ``N/(capacity+1) <= threshold/2`` and the candidate set is bounded by
    ``2N/threshold``.  At the graded sf the capacity exceeds per-partition
    vocabulary, so pass 1 degenerates to exact partial counts; the 100k
    stress pin runs capacity BELOW vocabulary to exercise real pruning
    (SCALING.md finding 18).  No reference analog (the reference has no
    text surface); the oracle is the direct group-count.

    An explicit ``capacity`` below ``N/threshold`` breaks the superset
    guarantee (a qualifying gram can then vanish from every summary and
    the answer silently loses rows — observed live at 100k during the
    finding-18 stress run).  The accounting rows therefore carry each
    partition's processed-gram count; the operator sums them and RAISES
    ``ValueError`` with the minimum viable capacity instead of returning
    an incomplete result.

    ``stats_out``: optional dict receiving ``{"capacity", "total_err",
    "n_grams", "n_candidates", "summary_rows"}`` — the scale-stress
    harness pins the candidate-bound claim with it (same convention as
    ``graph.connected_components``).
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.ml.feature import NGram

    spark = documents.sparkSession
    # MLlib NGram (JVM sliding window, space-joined — byte-identical to
    # word_shingles, ~10x faster; see functions/text.with_shingles note)
    grammed = NGram(n=n, inputCol="_toks", outputCol="_g").transform(
        documents.withColumn("_toks", tokens(F.col("text")))
    )
    if capacity is None:
        # gram count without building gram strings: a doc with t tokens
        # has max(t - n + 1, 0) n-grams — the pre-scan only tokenizes
        # (r17; the NGram transform ran here for nothing but a size())
        total = (
            documents.select(
                F.greatest(
                    F.size(tokens(F.col("text"))) - (n - 1), F.lit(0)
                ).alias("m")
            )
            .agg(F.coalesce(F.sum("m"), F.lit(0)).cast("long").alias("n"))
            .collect()[0]["n"]
        )
        capacity = int(2 * total // max(threshold, 1)) + 1
    cap = max(int(capacity), 1)

    def mg_summaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kept: dict[str, int] = {}
        err = 0
        nproc = 0
        any_rows = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            any_rows = True
            flat = [g for lst in pdf["_g"] for g in lst]
            if not flat:
                continue
            nproc += len(flat)
            for g, c in pd.Series(flat).value_counts().items():
                kept[g] = kept.get(g, 0) + int(c)
            if len(kept) > cap:
                counts = np.fromiter(kept.values(), dtype=np.int64)
                # (cap+1)-th largest count = the MG merge's subtrahend
                delta = int(
                    np.partition(counts, len(counts) - cap - 1)[
                        len(counts) - cap - 1
                    ]
                )
                kept = {g: c - delta for g, c in kept.items() if c > delta}
                err += delta
        if not any_rows:
            return
        out = pd.DataFrame(
            {
                "gram": list(kept.keys()) + [None],
                "cnt": list(kept.values()) + [0],
                "err": [0] * len(kept) + [err],
                "nproc": [0] * len(kept) + [nproc],
            }
        )
        yield out

    summaries = (
        grammed.select("_g")
        .mapInPandas(
            mg_summaries, schema="gram string, cnt long, err long, nproc long"
        )
        .persist()  # two consumers below; <= (capacity+1) rows/partition
    )
    acct = summaries.agg(
        F.coalesce(F.sum("err"), F.lit(0)).cast("long").alias("e"),
        F.coalesce(F.sum("nproc"), F.lit(0)).cast("long").alias("n"),
        F.count("*").cast("long").alias("rows"),
    ).collect()[0]
    total_err, n_total = int(acct["e"]), int(acct["n"])
    if n_total > 0 and threshold <= n_total / (cap + 1):
        # the superset guarantee needs threshold > N/(capacity+1); below
        # that, grams above threshold can vanish from every summary and
        # the answer would be silently incomplete (caught live by the
        # 100k stress run that motivated this guard) — refuse instead
        summaries.unpersist()
        raise ValueError(
            f"frequent_ngrams: capacity {cap} cannot guarantee threshold "
            f"{threshold} over {n_total} grams (N/(capacity+1) = "
            f"{n_total / (cap + 1):.1f} >= threshold); need capacity >= "
            f"{n_total // threshold + 1}"
        )
    cand_rows = (
        summaries.filter(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.sum("cnt").cast("long").alias("lb"))
        .filter(F.col("lb") + F.lit(total_err) >= threshold)
        .select("gram")
        .collect()
    )
    if stats_out is not None:
        stats_out["capacity"] = cap
        stats_out["n_candidates"] = len(cand_rows)
        stats_out["total_err"] = total_err
        stats_out["n_grams"] = n_total
        stats_out["summary_rows"] = int(acct["rows"])
    summaries.unpersist()
    if not cand_rows:
        return spark.createDataFrame([], "gram string, cnt long")
    cand_df = spark.createDataFrame(
        [(r["gram"],) for r in cand_rows], "gram string"
    )
    posts = grammed.select(F.explode("_g").alias("gram"))
    return (
        posts.join(F.broadcast(cand_df), "gram")
        .groupBy("gram")
        .agg(F.count("*").cast("long").alias("cnt"))
        .filter(F.col("cnt") >= threshold)
    )


FREQUENT_NGRAMS_ORACLE = f"""
WITH t AS (
  SELECT {DD_TOKENS.format(t="text")} AS t FROM documents
),
sh AS (
  SELECT unnest({DD_SHINGLES3.format(t="t")}) AS gram FROM t
)
SELECT gram, count(*)::BIGINT AS cnt
FROM sh GROUP BY gram HAVING count(*) >= {FREQUENT_NGRAM_THRESHOLD}
"""


def source_kl_divergence(documents: DataFrame) -> DataFrame:
    """Per-source distribution drift: KL(P_source || P_corpus) over
    unigram token distributions — the data-mixture diagnostic that
    flags a source whose language diverges from the blend it feeds
    (mirrors the domain-weighting signals of mixture-tuning pipelines).

    Unsmoothed and exactly well-defined: every term a source emits is by
    construction in the corpus (support(P_s) ⊆ support(Q)), so

        KL(s) = Σ_{t: c_s(t)>0}  p_s(t) · ln(p_s(t) / q(t)),
        p_s(t) = c_s(t)/n_s,  q(t) = c(t)/n,

    needs no absent-term corrections — the classic smoothing-bug
    surface is simply not present.

    Plan shape: one explode + (source, term) partial-agg count; the
    corpus term totals DERIVE from that same aggregate (one more
    partial agg keyed on term — the corpus is never re-scanned); the
    per-source/global totals are a tiny agg broadcast back; the final
    KL is one map-side-partial weighted sum per source.  At 100 TB the
    only wide shuffles are the two hash aggs on (source, term) and
    (term)."""
    tok = documents.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    st = tok.groupBy("source", "term").agg(
        F.count("*").cast("double").alias("c_st")
    )
    tt = st.groupBy("term").agg(F.sum("c_st").alias("c_t"))
    ns = st.groupBy("source").agg(F.sum("c_st").alias("n_s"))
    n_total = float(
        ns.agg(F.sum("n_s").alias("n")).collect()[0]["n"]
    )  # one scalar; |sources| rows visited, not the corpus
    joined = (
        st.join(tt, "term")
        .join(F.broadcast(ns), "source")
        .select(
            "source",
            (
                (F.col("c_st") / F.col("n_s"))
                * F.log(
                    (F.col("c_st") / F.col("n_s"))
                    / (F.col("c_t") / F.lit(n_total))
                )
            ).alias("contrib"),
        )
    )
    return (
        joined.groupBy("source")
        .agg(F.round(F.sum("contrib"), 6).alias("kl_divergence"))
        .select("source", "kl_divergence")
    )


SOURCE_KL_ORACLE = f"""
WITH tok AS (
  SELECT source, unnest({DD_TOKENS.format(t="text")}) AS term FROM documents
),
st AS (SELECT source, term, count(*)::DOUBLE AS c_st FROM tok GROUP BY source, term),
tt AS (SELECT term, sum(c_st) AS c_t FROM st GROUP BY term),
ns AS (SELECT source, sum(c_st) AS n_s FROM st GROUP BY source),
n AS (SELECT sum(n_s) AS n FROM ns)
SELECT st.source,
       round(sum((c_st / n_s) * ln((c_st / n_s) / (c_t / (SELECT n FROM n)))), 6)
         AS kl_divergence
FROM st JOIN tt USING (term) JOIN ns USING (source)
GROUP BY st.source
"""


def bigram_logprob(
    documents: DataFrame, tokens_col: str | None = None
) -> DataFrame:
    """Per-document bigram language-model score — the perplexity-style
    quality filter (the CCNet/KenLM pass of web-corpus pipelines,
    LM-trained-on-the-corpus-itself variant): documents whose token
    transitions are improbable under the corpus's own bigram statistics
    (gibberish, boilerplate soup, wrong-language fragments) score high.

        score(d) = mean over bigrams (w1,w2) of d of  -ln P(w2|w1),
        P(w2|w1) = c(w1 w2) / c(w1 ·)

    In-corpus support makes this exactly well-defined with NO smoothing:
    every bigram a document contains was counted into the model, so
    c(w1 w2) >= 1 — the same argument as ``source_kl_divergence``.
    Documents with fewer than 2 tokens have no bigrams and are absent
    from the output (both sides).

    Plan shape: one explode + (bigram) partial-agg count for the model;
    prefix totals derive from the MODEL aggregate (one more partial agg
    on w1 — the corpus's bigram occurrences are never re-aggregated);
    scoring is one hash join of doc bigrams against the model on the
    bigram key + one per-doc map-side-partial average.  ``tokens_col``
    consumes a pre-tokenized array column (pipeline one-scan handoff)."""
    toks = documents.select(
        "doc_id",
        (
            tokens(F.col("text"))
            if tokens_col is None
            else F.col(tokens_col)
        ).alias("t"),
    )
    bg = toks.select(
        "doc_id", F.explode(word_shingles(F.col("t"), 2)).alias("bg")
    )
    # materialize the MODEL aggregate once: both the prefix totals and
    # the scoring join derive from c12, and Catalyst does not dedupe
    # common subplans — without the pin the full corpus is scanned and
    # re-aggregated twice (seen in the executed plan as 3 FileScans).
    # c12 is |distinct bigrams| rows — vocabulary-bounded, always far
    # smaller than the corpus it summarizes.
    c12 = (
        bg.groupBy("bg")
        .agg(F.count("*").cast("double").alias("c12"))
        .localCheckpoint(eager=True)
    )
    c1 = (
        c12.withColumn("w1", F.split(F.col("bg"), " ")[0])
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    model = c12.withColumn("w1", F.split(F.col("bg"), " ")[0]).join(c1, "w1")
    return (
        bg.join(model.select("bg", "c12", "c1"), "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                F.avg(F.log("c1") - F.log("c12")), 6
            ).alias("avg_neg_logprob"),
        )
    )


ZIPF_TOP_N = 200


def zipf_fit(documents: DataFrame, top_n: int = ZIPF_TOP_N) -> DataFrame:
    """Per-source Zipf rank–frequency fit — the corpus-health diagnostic
    of web-scale curation (natural language tracks slope ≈ −1; template
    farms, logs, and OCR noise bend it): OLS of ln(count) on ln(rank)
    over each source's ``top_n`` most frequent tokens, rank ties broken
    by token string so the ranking is deterministic on both sides.

        slope = covar_pop(lx, ly) / var_pop(lx),
        intercept = avg(ly) − slope·avg(lx),  r² = corr(lx, ly)².

    Plan shape at 100 TB: one explode partial-aggregated to per-source
    token counts (vocabulary-bounded, never corpus-bounded), one window
    rank per source over that aggregate, and a ``top_n``-row-per-source
    final agg — the raw corpus is scanned once and only counts shuffle.
    Sources with fewer than 2 distinct tokens have no variance to fit
    and are absent (both sides agree)."""
    from pyspark.sql import Window

    counts = (
        documents.select(
            "source", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .groupBy("source", "tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("cnt").desc(), F.col("tok").asc()
    )
    ranked = (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select(
            "source",
            F.log(F.col("rank").cast("double")).alias("lx"),
            F.log(F.col("cnt").cast("double")).alias("ly"),
        )
    )
    slope = F.covar_pop("lx", "ly") / F.var_pop("lx")
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_ranks"),
            slope.alias("_slope"),
            F.avg("ly").alias("_my"),
            F.avg("lx").alias("_mx"),
            F.corr("lx", "ly").alias("_r"),
        )
        .filter(F.col("_slope").isNotNull())
        .select(
            "source",
            "n_ranks",
            F.round("_slope", 6).alias("zipf_slope"),
            F.round(
                F.col("_my") - F.col("_slope") * F.col("_mx"), 6
            ).alias("zipf_intercept"),
            F.round(F.col("_r") * F.col("_r"), 6).alias("r2"),
        )
    )


ZIPF_FIT_ORACLE = f"""
WITH counts AS (
  SELECT source, unnest({DD_TOKENS.format(t="text")}) AS tok
  FROM documents
),
c AS (SELECT source, tok, count(*)::BIGINT AS cnt FROM counts GROUP BY 1, 2),
r AS (
  SELECT source,
         ln(row_number() OVER (PARTITION BY source
                               ORDER BY cnt DESC, tok ASC)::DOUBLE) AS lx,
         ln(cnt::DOUBLE) AS ly
  FROM c
  QUALIFY row_number() OVER (PARTITION BY source
                             ORDER BY cnt DESC, tok ASC) <= {ZIPF_TOP_N}
)
SELECT source, count(*)::BIGINT AS n_ranks,
       round(covar_pop(lx, ly) / var_pop(lx), 6) AS zipf_slope,
       round(avg(ly) - (covar_pop(lx, ly) / var_pop(lx)) * avg(lx), 6)
         AS zipf_intercept,
       round(corr(lx, ly) * corr(lx, ly), 6) AS r2
FROM r
GROUP BY source
HAVING covar_pop(lx, ly) / var_pop(lx) IS NOT NULL
"""


QUALITY_N_BUCKETS = 4


def quality_buckets(
    documents: DataFrame,
    n_buckets: int = QUALITY_N_BUCKETS,
    tokens_col: str | None = None,
) -> DataFrame:
    """CCNet-style quality bucketing: per-source ``ntile`` quartiles over
    the in-corpus bigram-LM score (``bigram_logprob`` — low avg −ln P =
    head-quality text, high = tail/gibberish), the standard shape for
    "train on head, sample middle, drop tail" curation recipes.  Order
    is pinned on the ROUNDED score then doc_id, so tiles are
    deterministic and oracle-replayable; docs with no bigrams are
    absent (as in ``bigram_logprob``).

    Plan shape: the bigram-LM pass (one explode + vocabulary-bounded
    model aggregate + one scoring join), a broadcast-sized join back to
    (doc_id, source), and one per-source window over doc-count rows."""
    from pyspark.sql import Window

    scores = bigram_logprob(documents, tokens_col=tokens_col)
    w = Window.partitionBy("source").orderBy(
        F.col("avg_neg_logprob").asc(), F.col("doc_id").asc()
    )
    return (
        documents.select("doc_id", "source")
        .join(scores, "doc_id")
        .select(
            "doc_id",
            "source",
            "avg_neg_logprob",
            F.ntile(n_buckets).over(w).cast("long").alias("quality_bucket"),
        )
    )


BIGRAM_LOGPROB_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, {DD_TOKENS.format(t="text")} AS t FROM documents
),
bg AS (
  SELECT doc_id, unnest({DD_SHINGLES2.format(t="t")}) AS bg FROM tok
),
c12 AS (SELECT bg, count(*)::DOUBLE AS c12 FROM bg GROUP BY bg),
c1 AS (
  SELECT string_split(bg, ' ')[1] AS w1, sum(c12) AS c1 FROM c12 GROUP BY 1
),
model AS (
  SELECT c12.bg, c12.c12, c1.c1
  FROM c12 JOIN c1 ON string_split(c12.bg, ' ')[1] = c1.w1
)
SELECT doc_id, count(*)::BIGINT AS n_bigrams,
       round(avg(ln(c1) - ln(c12)), 6) AS avg_neg_logprob
FROM bg JOIN model USING (bg)
GROUP BY doc_id
"""


QUALITY_BUCKETS_ORACLE = f"""
WITH s AS ({BIGRAM_LOGPROB_ORACLE})
SELECT d.doc_id, d.source, s.avg_neg_logprob,
       ntile({QUALITY_N_BUCKETS}) OVER (
         PARTITION BY d.source
         ORDER BY s.avg_neg_logprob ASC, d.doc_id ASC
       )::BIGINT AS quality_bucket
FROM documents d JOIN s ON d.doc_id = s.doc_id
"""


def source_overlap(
    documents: DataFrame, n: int = 3, pin_postings: bool = False
) -> DataFrame:
    """Pairwise cross-source shingle overlap — the contamination /
    provenance matrix of corpus curation (which sources re-host each
    other's content; which eval source leaked into which train source):
    for every source pair, the exact Jaccard similarity of their
    DISTINCT word n-gram (default trigram) sets, plus the raw common
    count.  Pairs sharing nothing are absent (inner semantics — both
    sides of the oracle agree).

    Plan shape at 100 TB (r17 optimization — guide §2.3/§2.4): ONE
    corpus scan builds per-doc distinct shingles via the MLlib ``NGram``
    kernel (the interpreted ``word_shingles`` higher-order path is
    O(tokens²) per row — ``with_shingles`` audit note), then ONE wide
    shuffle groups the exploded postings by shingle with a map-side
    ``collect_set(source)`` partial aggregate.  Everything downstream
    derives from that per-shingle source-set table: the C(S,2)-bounded
    pair counts come from exploding in-array source combinations (no
    self-join — the r16 shape shuffled the postings table into BOTH
    sides of a shingle-keyed join, i.e. twice more), and the per-source
    distinct-shingle sizes come from re-exploding the same grouped
    table (its exchange is reused, not recomputed).  Pair volume per
    shingle stays bounded by C(S, 2) with S = source count (hundreds in
    practice), never by corpus rows; a shingle present in every source
    carries an S-element array — still tiny.  For very large S,
    ``source_overlap_minhash`` trades exactness for a fixed-size
    per-source sketch.

    ``pin_postings``: the grouped per-shingle table has three consumer
    branches (pairs + the two sizes sides), and the executed plan
    recomputes its scan+group subtree per branch (measured: AQE does
    NOT reuse the exchange across them).  Default False recomputes —
    at tested scales the re-scan is as cheap as re-reading a pinned
    2M-row string table (finding 3's resolution, re-measured for this
    shape at sf0.1: 2.1–3.5 s either way).  ``True`` pins the grouped
    table with an eager localCheckpoint, collapsing to ONE corpus scan
    — set it when the input scan dominates (cold object storage, very
    wide rows, true 100 TB inputs)."""
    grouped = (
        with_shingles(documents.select("source", "text"), out_col="_sh", n=n)
        .select("source", F.explode("_sh").alias("shingle"))
        .groupBy("shingle")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
    )
    if pin_postings:
        grouped = grouped.localCheckpoint(eager=True)
    sizes = (
        grouped.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )
    # ordered in-array pairs: srcs is sorted, so (srcs[i], srcs[j]) with
    # i < j reproduces the a.source < b.source join condition exactly
    pair_expr = F.expr(
        "flatten(transform(srcs, (x, i) -> "
        "transform(slice(srcs, i + 2, size(srcs) - i - 1), "
        "y -> struct(x AS source_a, y AS source_b))))"
    )
    inter = (
        grouped.select(F.explode(pair_expr).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_a"), F.col("n").alias("_na")
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_b"), F.col("n").alias("_nb")
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("_na") + F.col("_nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


SOURCE_OVERLAP_ORACLE = f"""
WITH tok AS (
  SELECT source, {DD_TOKENS.format(t="text")} AS t FROM documents
),
sh AS (
  SELECT DISTINCT source, unnest({DD_SHINGLES3.format(t="t")}) AS shingle
  FROM tok
),
sz AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
i AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b,
       CAST(i.n_common AS BIGINT) AS n_common,
       round(i.n_common / (sa.n + sb.n - i.n_common), 6) AS jaccard
FROM i
JOIN sz sa ON sa.source = i.source_a
JOIN sz sb ON sb.source = i.source_b
"""


MINHASH_OVERLAP_SALT = "vse-overlap:"


def source_overlap_minhash(
    documents: DataFrame, n: int = 3, k: int = 256
) -> DataFrame:
    """Sketch variant of ``source_overlap`` for very large source
    counts: each source is summarized by its k smallest shingle hashes
    (one bottom-k MinHash signature per source — a few KB regardless of
    source size), and the pairwise Jaccard is estimated from the merged
    bottom-k (Broder 1997: |bottom_k(A ∪ B) ∩ bottom_k(A) ∩ bottom_k(B)|
    / k).  The shuffle carries S·k rows total instead of the exact
    join's per-shingle postings — the matrix step becomes independent of
    content diversity.  Estimates converge to the exact Jaccard (pytest
    gates agreement on the fixture); output schema mirrors the exact
    operator with ``jaccard_est``.

    The shingle hash is a salted 60-bit md5 (the ``weighted_sample_es``
    discipline, r14 — previously xxhash64): the sketch is a pure
    function of (shingle, salt, k), reproducible across runs, engines
    and partitionings, so the DuckDB oracle replays the ENTIRE
    computation exactly (``SOURCE_OVERLAP_MINHASH_ORACLE``) — the row
    graduated from rows-only to oracle mode.  Hashes are deduped per
    source before ranking (bottom-k over the hashed SET — Broder's
    formulation; 60-bit collisions are ~S·D²/2⁶¹, vanishing)."""
    # r17: NGram shingle kernel (the interpreted word_shingles path is
    # O(tokens²) per row) and ONE distinct on the 60-bit hash instead of
    # a string-level distinct followed by a hash-level one — the dedup
    # shuffle carries 8-byte keys, not shingle strings (guide §2.3).
    sh = (
        with_shingles(documents.select("source", "text"), out_col="_sh", n=n)
        .select("source", F.explode("_sh").alias("shingle"))
        .select(
            "source",
            salted_md5_long(F.col("shingle"), MINHASH_OVERLAP_SALT)
            .alias("h"),
        )
        .distinct()
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("h")
    bottomk = (
        sh.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
    sigs = bottomk.groupBy("source").agg(
        F.sort_array(F.collect_list("h")).alias("sig"),
        F.count("*").alias("sig_len"),
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    pairs = a.crossJoin(F.broadcast(b)).filter(
        F.col("a.source") < F.col("b.source")
    )  # sigs is S rows (one per source) — a broadcast matrix, never corpus-sized
    # merged bottom-k: smallest k of the union of both signatures; the
    # estimator counts merged elements present in BOTH signatures
    kk = F.least(
        F.lit(k), F.greatest(F.col("a.sig_len"), F.col("b.sig_len"))
    ).cast("int")
    merged = F.slice(
        F.array_sort(
            F.array_union(F.col("a.sig"), F.col("b.sig"))
        ),
        1,
        kk,
    )
    inter_in_merged = F.size(
        F.array_intersect(
            F.array_intersect(merged, F.col("a.sig")), F.col("b.sig")
        )
    )
    return pairs.select(
        F.col("a.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.round(inter_in_merged / kk, 6).alias("jaccard_est"),
    )


# DuckDB replay of the ENTIRE sketch — hash, bottom-k ranking, merged
# bottom-k estimator — exact because the hash is a pure salted-md5
# function of the shingle (r14; graduates the row from rows-only).
SOURCE_OVERLAP_MINHASH_ORACLE = f"""
WITH tok AS (
  SELECT source, {DD_TOKENS.format(t="text")} AS t FROM documents
),
sh AS (
  SELECT DISTINCT source, unnest({DD_SHINGLES3.format(t="t")}) AS shingle
  FROM tok
),
hs AS (
  SELECT DISTINCT source,
         CAST(('0x' || substr(md5('{{salt}}' || shingle), 1, 15)) AS BIGINT) AS h
  FROM sh
),
bk AS (
  SELECT source, h,
         row_number() OVER (PARTITION BY source ORDER BY h) AS r
  FROM hs
),
sig AS (
  SELECT source, list(h ORDER BY h) AS sig, count(*) AS sig_len
  FROM bk WHERE r <= {{k}} GROUP BY source
),
p AS (
  SELECT a.source AS source_a, b.source AS source_b,
         a.sig AS sa, b.sig AS sb,
         least({{k}}, greatest(a.sig_len, b.sig_len)) AS kk
  FROM sig a JOIN sig b ON a.source < b.source
)
SELECT source_a, source_b,
       round(len(list_filter(
                list_slice(list_sort(list_distinct(list_concat(sa, sb))), 1, kk),
                x -> list_contains(sa, x) AND list_contains(sb, x)))
             / kk, 6) AS jaccard_est
FROM p
""".replace("{salt}", MINHASH_OVERLAP_SALT).replace("{k}", "256")


def source_psi(documents: DataFrame, n_bins: int = 10) -> DataFrame:
    """Per-source Population Stability Index over corpus-decile bins of
    ``n_chars`` — the standard production drift monitor for a numeric
    feature (credit-scoring lineage, now the data-pipeline check that a
    source's length profile diverges from the blend it feeds; the
    numeric-column sibling of ``source_kl_divergence``'s token form).

        PSI(s) = Σ_{b: p_s(b)>0} (p_s(b) − q(b)) · ln(p_s(b) / q(b))

    over corpus-quantile bins b (boundaries = exact corpus percentiles
    at i/n_bins; bucket = 1 + #{boundaries strictly below the value} —
    duplicate boundaries collapse naturally).  Zero-occupancy source
    bins are EXCLUDED rather than epsilon-smoothed (the same in-support
    convention as the KL row — exactly well-defined, no smoothing
    constant to disagree about), documented as a variant of textbook
    PSI.  q(b) > 0 always holds: corpus quantile bins are nonempty by
    construction.

    Plan shape: one exact-percentile agg for the boundary row (tiny),
    boundaries folded into the plan as literals, then one (source, bin)
    partial-agg count; corpus bin totals derive from that aggregate —
    the corpus is never re-scanned."""
    ps = [i / n_bins for i in range(1, n_bins)]
    row = documents.agg(
        F.expr(
            "percentile(n_chars, array("
            + ",".join(str(p) for p in ps)
            + "))"
        ).alias("b")
    ).collect()[0]["b"]
    bounds = [float(x) for x in row]
    bucket = sum(
        (F.col("n_chars") > F.lit(b)).cast("int") for b in bounds
    ) + F.lit(1)
    sb = documents.select(
        "source", bucket.alias("bin")
    ).groupBy("source", "bin").agg(F.count("*").cast("double").alias("c_sb"))
    tb = sb.groupBy("bin").agg(F.sum("c_sb").alias("c_b"))
    ns = sb.groupBy("source").agg(F.sum("c_sb").alias("n_s"))
    n_total = float(ns.agg(F.sum("n_s")).collect()[0][0])
    return (
        sb.join(tb, "bin")
        .join(F.broadcast(ns), "source")
        .select(
            "source",
            (
                (F.col("c_sb") / F.col("n_s") - F.col("c_b") / F.lit(n_total))
                * F.log(
                    (F.col("c_sb") / F.col("n_s"))
                    / (F.col("c_b") / F.lit(n_total))
                )
            ).alias("term"),
        )
        .groupBy("source")
        .agg(F.round(F.sum("term"), 6).alias("psi"))
    )


SOURCE_PSI_ORACLE = """
WITH b AS (
  SELECT quantile_cont(n_chars, [{plist}]) AS bs FROM documents
),
binned AS (
  SELECT source,
         1 + (SELECT count(*) FROM unnest((SELECT bs FROM b)) AS t(x)
              WHERE n_chars > x) AS bin
  FROM documents
),
sb AS (SELECT source, bin, count(*)::DOUBLE AS c_sb FROM binned GROUP BY 1, 2),
tb AS (SELECT bin, sum(c_sb) AS c_b FROM sb GROUP BY bin),
ns AS (SELECT source, sum(c_sb) AS n_s FROM sb GROUP BY source),
n AS (SELECT sum(n_s) AS n FROM ns)
SELECT sb.source,
       round(sum((c_sb / n_s - c_b / (SELECT n FROM n))
                 * ln((c_sb / n_s) / (c_b / (SELECT n FROM n)))), 6) AS psi
FROM sb JOIN tb USING (bin) JOIN ns USING (source)
GROUP BY sb.source
""".format(plist=",".join(str(i / 10) for i in range(1, 10)))


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split (r13) — the assignment key is the
# near-dup CLUSTER, not the document, so near-duplicates can never
# straddle splits (the eval-contamination guard a training pipeline
# needs BEFORE the split, not after)
# ---------------------------------------------------------------------------

# NOTE: distinct from SPLIT_SALT above — that one belongs to the
# doc-keyed train_val_split; this one keys the CLUSTER-level bucket.
# (r13 post-sweep fix: the first version of this block reused the name
# SPLIT_SALT, silently re-binding the module global the older op's
# default argument resolves at call time — Spark then hashed with the
# new salt while TRAIN_VAL_SPLIT_ORACLE kept the old one baked in, and
# the full-registry sweep caught corpus_train_val_split mismatching.)
CLUSTER_SPLIT_SALT = "vse-cluster-split:"


def leakage_safe_split(
    documents: DataFrame,
    clusters: DataFrame,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = CLUSTER_SPLIT_SALT,
) -> DataFrame:
    """Group-aware train/val/test split: every document inherits its
    near-dup cluster's bucket — a salted 60-bit md5 of the CLUSTER id
    mod 100 — so two near-duplicate documents land in the same split BY
    CONSTRUCTION (a doc-keyed hash split leaks: a test doc's near-dup
    twin trains, and the eval score silently inflates).  Deterministic
    pure function of (cluster_id, salt, ratios): reproducible across
    runs, engines and partitionings, same discipline as the salted-md5
    samplers above.

    ``clusters``: ``(doc_id, cluster_id)`` from
    ``graph.dedup_clusters`` (transitive closure of near-dup pairs;
    singletons are their own cluster).  Cost at scale: one broadcast-or
    -shuffle equi-join on doc_id plus pure column expressions — the
    clustering itself is the pipeline's existing dedup pass, reused.

    Output: ``(doc_id, cluster_id, bucket, split)``."""
    b = F.pmod(
        salted_md5_long(F.col("cluster_id").cast("string"), salt),
        F.lit(100),
    )
    return (
        documents.select("doc_id")
        .join(clusters.select("doc_id", "cluster_id"), "doc_id")
        .withColumn("bucket", b.cast("long"))
        .select(
            "doc_id",
            "cluster_id",
            "bucket",
            F.when(F.col("bucket") < train_pct, F.lit("train"))
            .when(F.col("bucket") < train_pct + val_pct, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


# oracle fragment: needs the cluster CTE prepended by the caller (the
# registry composes it with graph.DEDUP_CLUSTERS_ORACLE, which lives
# with the CC operator)
LEAKAGE_SPLIT_ORACLE_BODY = f"""
SELECT doc_id, cluster_id,
       CAST(('0x' || substr(md5('{CLUSTER_SPLIT_SALT}' || CAST(cluster_id AS VARCHAR)), 1, 15))
            AS BIGINT) % 100 AS bucket,
       CASE WHEN CAST(('0x' || substr(md5('{CLUSTER_SPLIT_SALT}' || CAST(cluster_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 100 < 80 THEN 'train'
            WHEN CAST(('0x' || substr(md5('{CLUSTER_SPLIT_SALT}' || CAST(cluster_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM cl
"""


def mixture_temperature_weights(
    documents: DataFrame, alpha: float = 0.5
) -> DataFrame:
    """Temperature-smoothed source mixture weights — the multilingual /
    multi-source sampling rule (p_i ∝ share_i^alpha, alpha<1 upsamples
    the tail; Lample & Conneau 2019's smoothing, used by every
    data-mixture recipe since): from exact per-source token (char)
    counts, compute the natural share, the alpha-smoothed normalized
    weight, and the implied upsample factor.  One groupBy agg over the
    corpus + one broadcast scalar normalization — no second corpus
    scan; float math happens on exact LONG sums only, rounded once at
    output (cross-engine hash discipline)."""
    stats = documents.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    tot = stats.agg(
        F.sum("n_chars").cast("double").alias("_tot")
    )
    raw = F.pow(F.col("n_chars").cast("double") / F.col("_tot"), F.lit(alpha))
    scored = stats.crossJoin(F.broadcast(tot)).withColumn("_raw", raw)
    denom = scored.agg(F.sum("_raw").alias("_denom"))
    return (
        scored.crossJoin(F.broadcast(denom))
        .select(
            "source",
            "n_docs",
            "n_chars",
            F.round(F.col("n_chars") / F.col("_tot"), 6).alias("nat_share"),
            F.round(F.col("_raw") / F.col("_denom"), 6).alias("weight"),
            F.round(
                (F.col("_raw") / F.col("_denom"))
                / (F.col("n_chars") / F.col("_tot")),
                4,
            ).alias("upsample_factor"),
        )
    )


MIXTURE_TEMPERATURE_ORACLE = """
WITH stats AS (
  SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS n_chars
  FROM documents GROUP BY source
),
tot AS (SELECT sum(n_chars)::DOUBLE AS t FROM stats),
raw AS (
  SELECT s.*, pow(s.n_chars / tot.t, 0.5) AS r, tot.t AS t
  FROM stats s CROSS JOIN tot
),
d AS (SELECT sum(r) AS denom FROM raw)
SELECT source, n_docs, n_chars,
       round(n_chars / t, 6) AS nat_share,
       round(r / d.denom, 6) AS weight,
       round((r / d.denom) / (n_chars / t), 4) AS upsample_factor
FROM raw CROSS JOIN d
"""


CURRICULUM_SALT = "vse-curriculum:"


def curriculum_order(
    documents: DataFrame, tokens_col: str | None = None
) -> DataFrame:
    """Quality-annealed curriculum emission order — the final step that
    turns a curated corpus into a TRAINING SEQUENCE: documents are
    phased by their CCNet-style quality tile (``quality_buckets`` —
    phase 1 = head quality, trained first; the anneal-from-clean recipe)
    and, within each (phase, source), shuffled deterministically by a
    salted 60-bit md5 of the doc id.  The global training order is the
    composite sort key

        (phase ASC, rank ASC, source ASC)

    which ROUND-ROBIN-INTERLEAVES sources at every training step inside
    a phase (rank r of every source precedes rank r+1 of any source) —
    the mixing discipline that keeps per-batch source composition
    stable instead of emitting sources in blocks.

    Scale shape: the ranking windows partition by (phase, source) —
    phases × sources independent tasks, no global window; materializing
    the physical order at 100 TB is one
    ``repartitionByRange("phase", "rank", "source")`` + sorted write.
    Deterministic pure function of (text, doc_id, salt) — reproducible
    across runs, engines, partitionings (oracle replays it exactly)."""
    from pyspark.sql import Window

    b = quality_buckets(documents, tokens_col=tokens_col)
    h = salted_md5_long(F.col("doc_id").cast("string"), CURRICULUM_SALT)
    w = Window.partitionBy("phase", "source").orderBy("h", "doc_id")
    return (
        b.select(
            "doc_id",
            "source",
            F.col("quality_bucket").alias("phase"),
            h.alias("h"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .select("doc_id", "source", "phase", "rank")
    )


CURRICULUM_ORDER_ORACLE = f"""
WITH b AS ({QUALITY_BUCKETS_ORACLE}),
k AS (
  SELECT doc_id, source, quality_bucket AS phase,
         CAST(('0x' || substr(md5('{CURRICULUM_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM b
)
SELECT doc_id, source, phase,
       row_number() OVER (PARTITION BY phase, source ORDER BY h, doc_id)
         AS "rank"
FROM k
"""


def text_curation_pipeline(
    documents: DataFrame,
    budget: int = TOKEN_BUDGET,
    train_pct: int = 80,
    val_pct: int = 10,
    pair_tier: str = "exact",
) -> DataFrame:
    """The engine's north-star workload composed END-TO-END (r15): the
    full text-side curation chain a production LLM data pipeline runs
    on a raw corpus, as ONE graded plan —

        near-dup pairs (exact word-3-gram Jaccard, length-blocked)
          → transitive-closure clusters (large/small-star CC)
          → keep-best collapse (Gopher verdict, n_words, doc_id argmax)
          → leakage-safe split on the CLUSTER key
          → token-budget mixture sampling WITHIN the train split
          → curriculum order (quality-tile phases, salted interleave)

    Every stage is individually oracle-graded elsewhere
    (``dedup_clusters`` / ``dedup_keep_best`` / ``corpus_split_leakage_safe``
    / ``corpus_token_budget_sample`` / ``corpus_curriculum_order``);
    this operator grades the COMPOSITION — stage ordering, survivor
    handoff, and the split-before-sample discipline (sampling after
    splitting keeps val/test untouched by the budget cut; a
    sample-first pipeline silently changes eval composition whenever
    the budget moves).  Quality phases are computed ON THE FINAL
    TRAINING SET (the bigram LM is fit to what will actually be
    trained on, the CCNet convention), so docs with no bigrams are
    absent, as in ``curriculum_order``.

    Output: one row per training-sequence document —
    ``(doc_id, source, cluster_id, n_tokens, cum_tokens, phase,
    rank)``; the training order is the composite key (phase ASC,
    rank ASC, source ASC), deliberately emitted as SORT KEYS rather
    than one global row_number (an unpartitioned window is the 100 TB
    anti-pattern; materializing the physical order is one
    ``repartitionByRange`` + sorted write).

    Scale posture (r16, one-tokenization revision): TOKENIZATION runs
    ONCE — the corpus is tokenized into a pinned ``(doc_id, source,
    n_chars, _toks)`` frame (eager localCheckpoint, text column
    dropped), and the shingle-pair, quality, budget-walk, and
    curriculum-LM stage families all consume that frame through their
    ``tokens_col`` hook instead of re-splitting text per stage.  At
    the 100 TB posture tokenization is the dominant scan cost, so this
    removes two full-corpus split passes for one materialization
    (smaller than the raw corpus: the text column is dropped).  The
    stages remain inherently multi-pass, but every pass is a full
    map-side-combined aggregate or a bucketed join; the dedup pair
    stage is the bucketed machinery ``dedup_clusters`` grades (no
    all-pairs anywhere), CC checkpoints per round, and the handoff
    frames between stages are id-keyed and tiny relative to the
    corpus.  Reference anchor: the analog of the reference's single
    end-to-end path (server.cpp:72-112) for the curation workload."""
    from vector_search_engine_spark.operators import dedup as dedup_ops
    from vector_search_engine_spark.operators import graph as graph_ops

    # pair_tier (r17): the finding-44 dispatch surfaced at the
    # composition level.  "exact" (default, the oracle-graded twin) is
    # the postings-join Jaccard — right while Σ_s df_s² stays sane;
    # "minhash" is the banded-LSH tier for dense-duplicate corpora
    # where the exact tier's intermediate explodes (finding 44: at 1M
    # docs × 20-variant clusters every in-cluster shingle has df=20 and
    # the postings join is the disk-exhaustion class, while LSH buckets
    # ARE the clusters — 9.5M candidates, precision exact by verify,
    # recall 0.998 measured).  Output contract identical either way.
    if pair_tier not in ("exact", "minhash"):
        raise ValueError(
            f"text_curation_pipeline: unknown pair_tier {pair_tier!r} "
            "(expected 'exact' or 'minhash')"
        )
    toked = documents.select(
        "doc_id",
        "source",
        "n_chars",
        tokens(F.col("text")).alias("_toks"),
    ).localCheckpoint(eager=True)
    pairs = (
        dedup_ops.ngram_jaccard_pairs(toked, tokens_col="_toks")
        if pair_tier == "exact"
        else dedup_ops.minhash_lsh_pairs(toked, tokens_col="_toks")
    )
    clusters = graph_ops.dedup_clusters(toked, pairs)
    survivors = dedup_ops.keep_best(
        toked,
        clusters,
        quality=quality_filter(toked, tokens_col="_toks").select(
            "doc_id", "n_words", "keep"
        ),
    )
    split = leakage_safe_split(
        survivors.select("doc_id"), survivors, train_pct, val_pct
    )
    train_ids = split.filter(F.col("split") == "train").select(
        "doc_id", "cluster_id"
    )
    train_docs = toked.join(train_ids.select("doc_id"), "doc_id")
    budgeted = token_budget_sample(train_docs, budget, tokens_col="_toks")
    kept_docs = toked.join(budgeted.select("doc_id"), "doc_id")
    order = curriculum_order(kept_docs, tokens_col="_toks")
    return (
        order.join(
            budgeted.select("doc_id", "n_tokens", "cum_tokens"), "doc_id"
        )
        .join(train_ids, "doc_id")
        .select(
            "doc_id",
            "source",
            "cluster_id",
            "n_tokens",
            "cum_tokens",
            "phase",
            "rank",
        )
    )


def text_curation_oracle(
    clusters_oracle: str,
    train_pct: int = 80,
    budget: int = TOKEN_BUDGET,
) -> str:
    """DuckDB replay of the COMPOSED pipeline, doc-level: takes the
    cluster-assignment statement (``graph.DEDUP_CLUSTERS_ORACLE`` — it
    lives with the CC operator) and chains keep-best → cluster-keyed
    split → per-source token-budget walk → curriculum phases/ranks
    fit ON the final kept set, mirroring each stage's own oracle.  All
    CTEs join on doc_id (stable keys — no row_number-over-nothing rid
    hazard), so DuckDB's CTE inlining cannot mispair rows.
    ``train_pct``/``budget`` mirror ``text_curation_pipeline``'s
    parameters (r16 advisor fix: the r15 oracle hardcoded the defaults,
    so a non-default pipeline invocation graded against it would
    silently diverge at the split and budget stages)."""
    return f"""
WITH cl AS ({clusters_oracle}),
qf AS ({QUALITY_FILTER_ORACLE.strip()}),
kb AS (
  SELECT doc_id, cluster_id FROM (
    SELECT cl.doc_id, cl.cluster_id,
           row_number() OVER (
             PARTITION BY cl.cluster_id
             ORDER BY qf.keep DESC, qf.n_words DESC, cl.doc_id
           ) AS rn
    FROM cl JOIN qf USING (doc_id)
  ) WHERE rn = 1
),
tr AS (
  SELECT d.doc_id, d.source, d.text, kb.cluster_id
  FROM documents d JOIN kb USING (doc_id)
  WHERE CAST(('0x' || substr(md5('{CLUSTER_SPLIT_SALT}'
          || CAST(kb.cluster_id AS VARCHAR)), 1, 15)) AS BIGINT)
        % 100 < {train_pct}
),
tbh AS (
  SELECT source, doc_id, cluster_id,
         CAST(('0x' || substr(md5('{SAMPLE_SALT}'
             || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h,
         len({DD_TOKENS.format(t="text")})::BIGINT AS n_tokens
  FROM tr
),
kept AS (
  SELECT * FROM (
    SELECT source, doc_id, cluster_id, n_tokens,
           sum(n_tokens) OVER (
             PARTITION BY source ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           )::BIGINT AS cum_tokens
    FROM tbh
  ) WHERE cum_tokens <= {budget}
),
kd AS (
  SELECT d.doc_id, d.source, d.text
  FROM documents d JOIN kept USING (doc_id)
),
ktok AS (SELECT doc_id, {DD_TOKENS.format(t="text")} AS t FROM kd),
kbg AS (
  SELECT doc_id, unnest({DD_SHINGLES2.format(t="t")}) AS bg FROM ktok
),
kc12 AS (SELECT bg, count(*)::DOUBLE AS c12 FROM kbg GROUP BY bg),
kc1 AS (
  SELECT string_split(bg, ' ')[1] AS w1, sum(c12) AS c1 FROM kc12 GROUP BY 1
),
kmodel AS (
  SELECT kc12.bg, kc12.c12, kc1.c1
  FROM kc12 JOIN kc1 ON string_split(kc12.bg, ' ')[1] = kc1.w1
),
ks AS (
  SELECT doc_id, round(avg(ln(c1) - ln(c12)), 6) AS avg_neg_logprob
  FROM kbg JOIN kmodel USING (bg)
  GROUP BY doc_id
),
kph AS (
  SELECT kd.doc_id, kd.source,
         ntile({QUALITY_N_BUCKETS}) OVER (
           PARTITION BY kd.source
           ORDER BY ks.avg_neg_logprob ASC, kd.doc_id ASC
         )::BIGINT AS phase,
         CAST(('0x' || substr(md5('{CURRICULUM_SALT}'
             || CAST(kd.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM kd JOIN ks USING (doc_id)
)
SELECT kph.doc_id, kph.source, kept.cluster_id, kept.n_tokens,
       kept.cum_tokens, kph.phase,
       row_number() OVER (
         PARTITION BY kph.phase, kph.source ORDER BY kph.h, kph.doc_id
       ) AS "rank"
FROM kph JOIN kept ON kph.doc_id = kept.doc_id
"""


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------

DSIR_N_BUCKETS = 128      # hashed feature dimension (the paper uses 10k at web scale)
DSIR_ALPHA = 1.0          # Laplace smoothing per bucket
DSIR_TARGET_LANG = "en"   # target-distribution proxy: English documents
DSIR_SAMPLE_K = 40
DSIR_BUCKET_SALT = "vse-dsir-bucket:"
DSIR_GUMBEL_SALT = "vse-dsir-gumbel:"


def _dsir_ratios(documents: DataFrame, n_buckets: int, target_lang: str):
    """Shared DSIR core: (doc-bucket counts, broadcastable B-row
    log-ratio table).  Grams = unigrams + word bigrams, ALL occurrences
    (the paper's hashed n-gram features); bucket = salted 60-bit md5
    mod ``n_buckets`` — the portable cross-engine hash family (same
    discipline as the salted-md5 samplers above), so the oracle replays
    bucketing exactly."""
    # tokens materialized to a real column, bigrams via MLlib NGram —
    # a lambda-captured ``word_shingles(tokens(text), 2)`` re-evaluates
    # the whole split per element (the with_shingles O(tokens²) pitfall),
    # and NGram's JVM sliding window is byte-identical output
    from pyspark.ml.feature import NGram

    documents = documents.withColumn("_toks", tokens(F.col("text")))
    documents = NGram(n=2, inputCol="_toks", outputCol="_bg").transform(
        documents
    )
    grams = F.concat(F.col("_toks"), F.col("_bg"))
    bucket = F.pmod(
        salted_md5_long(F.col("g"), DSIR_BUCKET_SALT), F.lit(n_buckets)
    ).alias("bucket")
    # materialize the doc-bucket aggregate once: the MODEL branch and
    # the scoring join both derive from it and Catalyst does not dedupe
    # common subplans — without the pin the corpus is re-scanned and
    # re-exploded per branch (the bigram_logprob lesson).  Pinned via
    # eager localCheckpoint, NOT .cache(): nothing here ever unpersists
    # (the consumers return lazy frames, so there is no action to hang
    # cleanup on), and a .cache() pin would outlive the query in a
    # long-lived session — checkpoint blocks are ContextCleaner-tracked
    # and reclaimed when the frame is GC'd (the _cov_cells discipline).
    doc_bucket = (
        documents.select(
            "doc_id", "lang", "source", F.explode(grams).alias("g")
        )
        .select("doc_id", "lang", "source", bucket)
        .groupBy("doc_id", "lang", "source", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    # BOTH bag-of-words models come out of ONE B-row aggregation —
    # target counts are a conditional sum, so the pinned aggregate is
    # scanned once, not once per model.  Every doc bucket appears in
    # the raw (q) side by construction, so these ARE the full observed
    # domain; absent target buckets smooth to alpha mass.  Totals ride
    # along as 1-row broadcast cross joins off the B-row frame.
    models = doc_bucket.groupBy("bucket").agg(
        F.sum("c").alias("cq"),
        F.sum(
            F.when(F.col("lang") == target_lang, F.col("c")).otherwise(F.lit(0))
        ).alias("cp"),
    )
    tot = models.agg(
        F.sum("cq").cast("double").alias("_tq"),
        F.sum("cp").cast("double").alias("_tp"),
    )
    denom = float(DSIR_ALPHA * n_buckets)
    ratios = models.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log(
                (F.col("cp").cast("double") + F.lit(DSIR_ALPHA))
                / (F.col("_tp") + F.lit(denom))
            )
            - F.log(
                (F.col("cq").cast("double") + F.lit(DSIR_ALPHA))
                / (F.col("_tq") + F.lit(denom))
            )
        ).alias("ratio"),
    )
    return doc_bucket, ratios


def dsir_weights(
    documents: DataFrame,
    n_buckets: int = DSIR_N_BUCKETS,
    target_lang: str = DSIR_TARGET_LANG,
) -> DataFrame:
    """DSIR importance weights (Xie et al., NeurIPS 2023 — the
    importance-resampling data-selection recipe behind domain-targeted
    pretraining mixes): score every document by how much more likely its
    hashed-n-gram bag is under a TARGET bag-of-words model than under
    the RAW corpus model,

        log w(d) = Σ_b c_db · ( ln p̂_target(b) − ln p̂_raw(b) ),

    with Laplace-smoothed bucket models over ``n_buckets`` hashed
    unigram+bigram features.  Here the target distribution is the
    corpus's own ``lang == target_lang`` slice — the in-repo stand-in
    for "quality/domain exemplar set" (Wikipedia-like in the paper).

    Plan shape at 100 TB: ONE corpus scan exploded to gram rows,
    partial-aggregated to (doc, bucket) counts; both models are B-row
    aggregates DERIVED from that same aggregate (the corpus is never
    re-scanned); the log-ratio table (B rows) broadcast-joins back onto
    the doc-bucket counts and one more doc-keyed partial agg yields the
    weight.  Two shuffles total (doc-bucket agg, per-doc sum), nothing
    driver-side.  No reference analog (the reference serves queries; it
    does not curate corpora)."""
    doc_bucket, ratios = _dsir_ratios(documents, n_buckets, target_lang)
    return (
        doc_bucket.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id", "lang", "source")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.round(F.sum(F.col("c") * F.col("ratio")), 6).alias("log_ratio"),
        )
        .select("doc_id", "lang", "source", "n_grams", "log_ratio")
    )


def dsir_sample(
    documents: DataFrame,
    k: int = DSIR_SAMPLE_K,
    n_buckets: int = DSIR_N_BUCKETS,
    target_lang: str = DSIR_TARGET_LANG,
) -> DataFrame:
    """DSIR selection step — Gumbel-top-k resampling: add standard
    Gumbel noise to each document's log importance weight and keep the
    global top-k,

        key(d) = log w(d) + G_d,   G_d = −ln(−ln u_d),

    which samples WITHOUT replacement with probability ∝ w(d) (the
    Gumbel-max trick; the exact counterpart of the paper's resampling
    step).  ``u_d`` derives from a salted 60-bit md5 of the doc id —
    reproducible across runs/engines/partitionings, and the oracle
    replays the identical draw (A-ES sampler discipline).

    Plan: the ``dsir_weights`` plan + pure column expressions +
    ``orderBy().limit(k)`` — TakeOrderedAndProject, per-partition
    partial top-k; only k rows reach the driver-side merge."""
    from pyspark.sql import Window

    w = dsir_weights(documents, n_buckets, target_lang)
    u = salted_md5_unit(F.col("doc_id").cast("string"), DSIR_GUMBEL_SALT)
    key = F.col("log_ratio") + (-F.log(-F.log(u)))
    topk = (
        w.withColumn("key", key)
        .orderBy(F.col("key").desc(), "doc_id")
        .limit(k)
    )
    rw = Window.orderBy(F.col("key").desc(), "doc_id")
    return topk.withColumn(
        "rank", F.row_number().over(rw).cast("long")
    ).select("doc_id", "lang", "source", "log_ratio", "rank")


def _dsir_oracle_core(n_buckets: int = DSIR_N_BUCKETS) -> str:
    """DuckDB replay of the DSIR feature/model/weight pipeline (CTEs up
    through per-doc ``log_ratio``; callers append the final SELECT)."""
    denom = float(DSIR_ALPHA * n_buckets)
    return f"""
tok AS (
  SELECT doc_id, lang, source, {DD_TOKENS.format(t="text")} AS t FROM documents
),
grams AS (
  SELECT doc_id, lang, source,
         unnest(list_concat(t, {DD_SHINGLES2.format(t="t")})) AS g
  FROM tok
),
db AS (
  SELECT doc_id, lang, source,
         CAST(('0x' || substr(md5('{DSIR_BUCKET_SALT}' || g), 1, 15)) AS BIGINT)
           % {n_buckets} AS bucket,
         count(*)::BIGINT AS c
  FROM grams GROUP BY ALL
),
qc AS (SELECT bucket, sum(c) AS cq FROM db GROUP BY bucket),
pc AS (SELECT bucket, sum(c) AS cp FROM db
       WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bucket),
tq AS (SELECT sum(cq)::DOUBLE AS tq FROM qc),
tp AS (SELECT sum(cp)::DOUBLE AS tp FROM pc),
ratios AS (
  SELECT qc.bucket,
         ln((coalesce(pc.cp, 0)::DOUBLE + {DSIR_ALPHA!r}) / (tp.tp + {denom!r}))
         - ln((qc.cq::DOUBLE + {DSIR_ALPHA!r}) / (tq.tq + {denom!r})) AS ratio
  FROM qc LEFT JOIN pc USING (bucket) CROSS JOIN tq CROSS JOIN tp
),
wts AS (
  SELECT db.doc_id, db.lang, db.source,
         sum(db.c)::BIGINT AS n_grams,
         round(sum(db.c * r.ratio), 6) AS log_ratio
  FROM db JOIN ratios r USING (bucket)
  GROUP BY db.doc_id, db.lang, db.source
)"""


DSIR_WEIGHTS_ORACLE = f"""
WITH {_dsir_oracle_core()}
SELECT doc_id, lang, source, n_grams, log_ratio FROM wts
"""


DSIR_SAMPLE_ORACLE = f"""
WITH {_dsir_oracle_core()},
keyed AS (
  SELECT doc_id, lang, source, log_ratio,
         log_ratio + (-ln(-ln(
           (CAST(('0x' || substr(md5('{DSIR_GUMBEL_SALT}' || CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) + 1) / {float(1 << 60)!r}))) AS key
  FROM wts
),
r AS (
  SELECT doc_id, lang, source, log_ratio,
         row_number() OVER (ORDER BY key DESC, doc_id) AS "rank"
  FROM keyed
)
SELECT doc_id, lang, source, log_ratio, "rank"
FROM r WHERE "rank" <= {DSIR_SAMPLE_K}
"""
