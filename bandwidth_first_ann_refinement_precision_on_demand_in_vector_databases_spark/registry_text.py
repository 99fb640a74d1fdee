"""Text-analysis query suite over ``documents`` (SURVEY §7-M5;
north-star LLM-pipeline ops: token counting, quality scoring,
language-ID, fingerprinting). Each query is a Column-expression plan
with an exact DuckDB oracle twin; the shared hash/marker constants are
imported from ``functions.text`` and interpolated into the SQL so the
two sides cannot drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions import text as T
from .sources.fixtures import load_table


# --------------------------------------------------------------------------
# Shared SQL fragments (DuckDB dialect) mirroring functions/text.py
# --------------------------------------------------------------------------

SQL_TOKS = "string_split(lower(text), ' ')"
SQL_RE_TOKS = "regexp_extract_all(lower(text), '[a-z]+|[0-9]+')"


def _sql_poly_hash(s: str) -> str:
    # H('') = seed pinned on both engines (they fabricate different
    # codepoints for the empty string — see functions/text.poly_hash)
    return (
        f"(CASE WHEN length({s}) = 0 THEN CAST({T.HASH_SEED} AS BIGINT) ELSE "
        f"list_reduce(list_prepend(CAST({T.HASH_SEED} AS BIGINT), "
        f"list_transform(string_split({s}, ''), c -> CAST(unicode(c) AS BIGINT))), "
        f"(h, c) -> (h * {T.HASH_BASE} + c) % {T.HASH_P}) END)"
    )


def _sql_list_lit(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def _sql_ratio(hits: str, denom: str = "greatest(len(toks), 1)") -> str:
    return f"CAST({hits} AS DOUBLE) / CAST({denom} AS DOUBLE)"


SQL_STOP_RATIO = _sql_ratio(
    f"len(list_filter(toks, t -> list_contains({_sql_list_lit(T.STOPWORDS)}, t)))"
)
SQL_DISTINCT_RATIO = _sql_ratio("len(list_distinct(toks))")
SQL_ALPHA_RATIO = (
    "CAST(length(regexp_replace(lower(text), '[^a-z ]', '', 'g')) AS DOUBLE)"
    " / CAST(greatest(length(lower(text)), 1) AS DOUBLE)"
)


# --------------------------------------------------------------------------
# Queries
# --------------------------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + basic per-document text statistics."""
    d = load_table(spark, sf_dir, "documents")
    toks = T.tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        F.size(toks).alias("n_tokens"),
        T.token_count("text").alias("n_regex_tokens"),
        F.round(T.mean_token_len(toks), 6).alias("mean_token_len"),
        F.round(T.stopword_ratio(toks), 6).alias("stop_ratio"),
        F.round(T.distinct_token_ratio(toks), 6).alias("distinct_ratio"),
    )


SQL_TEXT_STATS = f"""
WITH t AS (SELECT doc_id, text, {SQL_TOKS} AS toks FROM documents)
SELECT doc_id,
  CAST(length(text) AS INT) AS n_chars_calc,
  CAST(len(toks) AS INT) AS n_tokens,
  CAST(len({SQL_RE_TOKS}) AS INT) AS n_regex_tokens,
  round({_sql_ratio("list_sum(list_transform(toks, t -> CAST(length(t) AS BIGINT)))")}, 6) AS mean_token_len,
  round({SQL_STOP_RATIO}, 6) AS stop_ratio,
  round({SQL_DISTINCT_RATIO}, 6) AS distinct_ratio
FROM t
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score + keep/borderline/drop bucketing — the
    filter stage of a training-data pipeline."""
    d = load_table(spark, sf_dir, "documents")
    score = T.quality_score(F.col("text"))
    return d.select(
        "doc_id",
        F.round(score, 6).alias("quality"),
        F.when(score >= 0.8, "keep")
        .when(score >= 0.5, "borderline")
        .otherwise("drop")
        .alias("bucket"),
    )


_SQL_QUALITY = (
    f"(CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END"
    f" + {SQL_ALPHA_RATIO}"
    f" + {SQL_DISTINCT_RATIO}"
    f" + least({SQL_STOP_RATIO} * 4.0, 1.0)) / 4.0"
)

SQL_TEXT_QUALITY = f"""
WITH t AS (SELECT doc_id, text, {SQL_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, {_SQL_QUALITY} AS q FROM t)
SELECT doc_id, round(q, 6) AS quality,
  CASE WHEN q >= 0.8 THEN 'keep' WHEN q >= 0.5 THEN 'borderline' ELSE 'drop' END AS bucket
FROM s
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic: per-language hit ratios and
    the deterministic argmax."""
    d = load_table(spark, sf_dir, "documents")
    scores = T.lang_scores(F.col("text"))
    return d.select(
        "doc_id",
        *[F.round(scores[lang], 6).alias(f"score_{lang}") for lang in sorted(scores)],
        T.predicted_lang(F.col("text")).alias("pred_lang"),
    )


def _sql_lang_score(lang: str) -> str:
    markers = _sql_list_lit(T.LANG_MARKERS[lang])
    return _sql_ratio(f"len(list_filter(toks, t -> list_contains({markers}, t)))")


_langs = sorted(T.LANG_MARKERS)
_score_cols = ",\n  ".join(f"{_sql_lang_score(lg)} AS s_{lg}" for lg in _langs)
_mx = "greatest(" + ", ".join(f"s_{lg}" for lg in _langs) + ")"
_case = " ".join(f"WHEN s_{lg} = {_mx} THEN '{lg}'" for lg in _langs)

SQL_LANG_ID = f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, {_score_cols} FROM t)
SELECT doc_id,
  {", ".join(f"round(s_{lg}, 6) AS score_{lg}" for lg in _langs)},
  CASE WHEN {_mx} > 0 THEN (CASE {_case} END) ELSE 'und' END AS pred_lang
FROM s
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints: whole-text hash (exact-dup
    key) and min-token hash (reorder-robust)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.fingerprint(F.col("text")).alias("fp_text"),
        T.min_token_fingerprint(F.col("text")).alias("fp_min_token"),
    )


SQL_FINGERPRINT = f"""
WITH t AS (SELECT doc_id, lower(text) AS lt, {SQL_TOKS} AS toks FROM documents)
SELECT doc_id,
  {_sql_poly_hash("lt")} AS fp_text,
  list_min(list_transform(toks, tok -> {_sql_poly_hash("tok")})) AS fp_min_token
FROM t
"""


VOCAB_TOP_N = 100
#: per-bucket sampling rates (percent) for the stratified sampler
SAMPLE_RATES = {"keep": 100, "borderline": 50, "drop": 0}
SAMPLE_SALT = "bfann-sample:"


def q_vocab_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-building pass: the ``VOCAB_TOP_N`` most frequent
    regex tokens with term and document frequencies. The global
    order-by + limit plans as TakeOrdered (per-partition top-N, then a
    driver merge of N rows) — no full-vocabulary sort materializes at
    scale. Ties break on the token string."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", F.explode(T.regex_tokens(F.col("text"))).alias("token"))
    return (
        toked.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(VOCAB_TOP_N)
    )


SQL_VOCAB_TOPN = f"""
SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM (SELECT doc_id, unnest({SQL_RE_TOKS}) AS token FROM documents)
GROUP BY token
ORDER BY tf DESC, token ASC
LIMIT {VOCAB_TOP_N}
"""


def q_corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampler — the data-mixing stage of a
    training pipeline. Each document hashes (engine-portable rolling
    hash of a salted id string) into [0, 100); it is kept iff the
    draw falls under its quality bucket's rate. ``weight`` is the
    inverse sampling rate for unbiased reweighting downstream. No
    RNG: the sample is a pure function of (doc_id, salt), so reruns
    and the DuckDB twin agree row-for-row."""
    d = load_table(spark, sf_dir, "documents")
    score = T.quality_score(F.col("text"))
    bucket = (
        F.when(score >= 0.8, "keep").when(score >= 0.5, "borderline").otherwise("drop")
    )
    draw = T.poly_hash(
        F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string"))
    ) % 100
    rate = (
        F.when(bucket == "keep", F.lit(SAMPLE_RATES["keep"]))
        .when(bucket == "borderline", F.lit(SAMPLE_RATES["borderline"]))
        .otherwise(F.lit(SAMPLE_RATES["drop"]))
    )
    return (
        d.select(
            "doc_id",
            bucket.alias("bucket"),
            draw.alias("draw"),
            rate.alias("rate"),
        )
        .where(F.col("draw") < F.col("rate"))
        .select(
            "doc_id",
            "bucket",
            F.round(F.lit(100.0) / F.col("rate"), 6).alias("weight"),
        )
    )


_SQL_DRAW = _sql_poly_hash(f"'{SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)") + " % 100"

SQL_CORPUS_SAMPLE = f"""
WITH t AS (SELECT doc_id, text, {SQL_TOKS} AS toks FROM documents),
s AS (
  SELECT doc_id,
    CASE WHEN {_SQL_QUALITY} >= 0.8 THEN 'keep'
         WHEN {_SQL_QUALITY} >= 0.5 THEN 'borderline'
         ELSE 'drop' END AS bucket,
    {_SQL_DRAW} AS draw
  FROM t
),
r AS (
  SELECT doc_id, bucket, draw,
    CASE bucket WHEN 'keep' THEN {SAMPLE_RATES["keep"]}
                WHEN 'borderline' THEN {SAMPLE_RATES["borderline"]}
                ELSE {SAMPLE_RATES["drop"]} END AS rate
  FROM s
)
SELECT doc_id, bucket, round(100.0 / rate, 6) AS weight
FROM r WHERE draw < rate
"""


TEXT_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_stats": q_text_stats,
    "text_quality": q_text_quality,
    "lang_id": q_lang_id,
    "fingerprint": q_fingerprint,
    "vocab_topn": q_vocab_topn,
    "corpus_sample": q_corpus_sample,
}

TEXT_ORACLES: dict[str, str] = {
    "text_stats": SQL_TEXT_STATS,
    "text_quality": SQL_TEXT_QUALITY,
    "lang_id": SQL_LANG_ID,
    "fingerprint": SQL_FINGERPRINT,
    "vocab_topn": SQL_VOCAB_TOPN,
    "corpus_sample": SQL_CORPUS_SAMPLE,
}


# ---------------------------------------------------------------------------
# Gopher-style repetition signals (Rae et al. 2021, arXiv:2112.11446 §A1.1 —
# public method): documents dominated by a few repeated words/n-grams are
# low-quality for LM training. All signals are per-document.
# ---------------------------------------------------------------------------

#: repetition gate thresholds (Gopher Table A1 analogs, adapted to the
#: whitespace tokenizer): drop a doc when the most frequent word covers
#: more than 20% of it or the most frequent bigram more than 18%.
TOP_WORD_FRAC_MAX = 0.20
TOP_BIGRAM_FRAC_MAX = 0.18


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals: duplicate-word fraction
    (map-side array expression — no shuffle), most-frequent-word and
    most-frequent-bigram coverage (explode → (doc, gram) count →
    per-doc argmax; the shuffle is keyed by (doc_id, gram) with
    map-side combine, the word-count shape that scales), and the
    composed Gopher-style keep/drop gate.

    Ties on gram frequency break to the lexicographically smallest
    gram, so both engines pick the same winner."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    # project the token array ONCE: an inline split expression inside a
    # transform lambda is re-evaluated per element (O(n²) regex splits
    # per doc — measured 5.4s just building bigrams at sf0.1, vs 0.2s
    # for this form); the bigram build is then an O(n) zip of the two
    # shifted slices, no per-index element_at at all
    tokd = d.select("doc_id", T.tokens(F.col("text")).alias("__toks"))
    toks = F.col("__toks")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    base = tokd.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.round(
            (F.size(toks) - F.size(F.array_distinct(toks)))
            / F.size(toks).cast("double"),
            6,
        ).alias("dup_word_frac"),
        toks.alias("__toks"),
        bigrams.alias("__bgs"),
    )

    def _top(col: str, out_gram: str, out_n: str) -> DataFrame:
        counts = (
            base.select("doc_id", F.explode(col).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count("*").alias("c"))
        )
        w = Window.partitionBy("doc_id").orderBy(
            F.col("c").desc(), F.col("g").asc()
        )
        return (
            counts.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") == 1)
            .select("doc_id", F.col("g").alias(out_gram), F.col("c").alias(out_n))
        )

    topw = _top("__toks", "top_word", "__wn")
    topb = _top("__bgs", "top_bigram", "__bn")
    out = (
        base.drop("__toks", "__bgs")
        .join(topw, "doc_id")
        .join(topb, "doc_id", "left")
    )
    top_word_frac = F.round(F.col("__wn") / F.col("n_words").cast("double"), 6)
    top_bigram_frac = F.round(
        F.coalesce(F.col("__bn") / (F.col("n_words") - 1).cast("double"), F.lit(0.0)),
        6,
    )
    return out.select(
        "doc_id",
        "n_words",
        "dup_word_frac",
        "top_word",
        top_word_frac.alias("top_word_frac"),
        F.coalesce("top_bigram", F.lit("")).alias("top_bigram"),
        top_bigram_frac.alias("top_bigram_frac"),
        (
            (top_word_frac <= TOP_WORD_FRAC_MAX)
            & (top_bigram_frac <= TOP_BIGRAM_FRAC_MAX)
        )
        .cast("int")
        .alias("passes_repetition"),
    )


SQL_TEXT_REPETITION = f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
base AS (
  SELECT doc_id,
    CAST(len(toks) AS INT) AS n_words,
    round((len(toks) - len(list_distinct(toks))) / CAST(len(toks) AS DOUBLE), 6)
      AS dup_word_frac,
    toks,
    CASE WHEN len(toks) >= 2
      THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
      ELSE CAST([] AS VARCHAR[]) END AS bgs
  FROM t
),
wc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS g FROM base) GROUP BY doc_id, g
),
topw AS (
  SELECT doc_id, g AS top_word, c AS wn FROM (
    SELECT doc_id, g, c,
      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS r
    FROM wc
  ) WHERE r = 1
),
bc AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest(bgs) AS g FROM base) GROUP BY doc_id, g
),
topb AS (
  SELECT doc_id, g AS top_bigram, c AS bn FROM (
    SELECT doc_id, g, c,
      row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g ASC) AS r
    FROM bc
  ) WHERE r = 1
)
SELECT b.doc_id, b.n_words, b.dup_word_frac,
  w.top_word,
  round(w.wn / CAST(b.n_words AS DOUBLE), 6) AS top_word_frac,
  coalesce(p.top_bigram, '') AS top_bigram,
  round(coalesce(p.bn / CAST(b.n_words - 1 AS DOUBLE), 0.0), 6) AS top_bigram_frac,
  CAST(round(w.wn / CAST(b.n_words AS DOUBLE), 6) <= {TOP_WORD_FRAC_MAX}
    AND round(coalesce(p.bn / CAST(b.n_words - 1 AS DOUBLE), 0.0), 6) <= {TOP_BIGRAM_FRAC_MAX}
    AS INT) AS passes_repetition
FROM base b
JOIN topw w ON w.doc_id = b.doc_id
LEFT JOIN topb p ON p.doc_id = b.doc_id
"""

TEXT_QUERIES["text_repetition"] = q_text_repetition
TEXT_ORACLES["text_repetition"] = SQL_TEXT_REPETITION


# ---------------------------------------------------------------------------
# Statistical LM quality proxy (CCNet/KenLM-style filtering, Wenzek et
# al. 2019, arXiv:1911.00359 — public method): score each document by
# the average log-probability of its word bigrams under an add-one-
# smoothed bigram model trained on the corpus itself. Low scores =
# improbable word sequences = gibberish/boilerplate candidates.
# ---------------------------------------------------------------------------

LM_SCALE = 1_000_000  # ln() quantization (the BM25 fixed-point rule)


def q_text_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM score. The "training" is two corpus
    aggregations (bigram counts + unigram-prefix counts, shuffled on
    the gram with map-side combine — wordcount shape); the model is
    broadcast back and scoring is one per-doc aggregation.
    Cross-engine: ln() differs at the last ULP between engines, so
    each bigram's log-prob is floor-quantized to micro-units
    immediately (the ``bm25_topn`` rule) and summed as BIGINT."""
    d = load_table(spark, sf_dir, "documents")
    tokd = d.select("doc_id", T.tokens(F.col("text")).alias("__toks"))
    toks = F.col("__toks")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    doc_bgs = tokd.select("doc_id", F.explode(bigrams).alias("bg"))
    bg_counts = doc_bgs.groupBy("bg").agg(F.count("*").alias("c_bg"))
    prefix = F.split(F.col("bg"), " ").getItem(0)
    w1_counts = bg_counts.groupBy(prefix.alias("w1")).agg(
        F.sum("c_bg").alias("c_w1")
    )
    vocab_n = (
        tokd.select(F.explode(toks).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    model = (
        bg_counts.join(w1_counts, prefix == F.col("w1"))
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "bg",
            F.floor(
                F.log(
                    (F.col("c_bg") + 1.0)
                    / (F.col("c_w1") + F.col("v").cast("double"))
                )
                * LM_SCALE
            )
            .cast("bigint")
            .alias("lp_micro"),
        )
    )
    scored = (
        doc_bgs.join(F.broadcast(model), "bg")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("lp_micro").alias("__s"),
        )
    )
    return (
        tokd.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias("n_bigrams"),
            F.round(
                F.coalesce(
                    F.col("__s").cast("double")
                    / F.col("n_bigrams")
                    / F.lit(float(LM_SCALE)),
                    F.lit(0.0),
                ),
                6,
            ).alias("avg_logp"),
        )
    )


SQL_TEXT_LM_QUALITY = f"""
WITH t AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
bg AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) >= 2
      THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
      ELSE CAST([] AS VARCHAR[]) END
  ) AS bg
  FROM t
),
bgc AS (SELECT bg, count(*) AS c_bg FROM bg GROUP BY bg),
w1c AS (
  SELECT string_split(bg, ' ')[1] AS w1, sum(c_bg) AS c_w1
  FROM bgc GROUP BY string_split(bg, ' ')[1]
),
vocab AS (
  SELECT count(DISTINCT w) AS v FROM (SELECT unnest(toks) AS w FROM t)
),
model AS (
  SELECT bgc.bg,
    CAST(floor(ln((bgc.c_bg + 1.0) / (w.c_w1 + CAST(vb.v AS DOUBLE)))
               * {LM_SCALE}) AS BIGINT) AS lp_micro
  FROM bgc
  JOIN w1c w ON w.w1 = string_split(bgc.bg, ' ')[1]
  CROSS JOIN vocab vb
),
scored AS (
  SELECT b.doc_id, count(*) AS n_bigrams, sum(m.lp_micro) AS s
  FROM bg b JOIN model m ON m.bg = b.bg GROUP BY b.doc_id
)
SELECT t.doc_id,
  coalesce(s.n_bigrams, 0) AS n_bigrams,
  round(coalesce(CAST(s.s AS DOUBLE) / s.n_bigrams / {LM_SCALE}.0, 0.0), 6)
    AS avg_logp
FROM t LEFT JOIN scored s ON s.doc_id = t.doc_id
"""

TEXT_QUERIES["text_lm_quality"] = q_text_lm_quality
TEXT_ORACLES["text_lm_quality"] = SQL_TEXT_LM_QUALITY


#: LM-score floor for the composed gate (fixture range ≈ [−3.61, −3.26])
LM_KEEP_MIN = -3.5


def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed filter stack a production corpus pipeline runs:
    heuristic quality score (C4-style), Gopher repetition gate, and
    the statistical LM floor, joined on doc_id into one keep/drop
    decision. Each signal is the registered query's own plan; the
    composition is three doc_id equi-joins — at scale each side is a
    per-doc scalar frame, orders of magnitude narrower than the
    corpus."""
    qual = q_text_quality(spark, sf_dir).select("doc_id", "quality", "bucket")
    rep = q_text_repetition(spark, sf_dir).select("doc_id", "passes_repetition")
    lm = q_text_lm_quality(spark, sf_dir).select("doc_id", "avg_logp")
    return (
        qual.join(rep, "doc_id")
        .join(lm, "doc_id")
        .select(
            "doc_id",
            "quality",
            "passes_repetition",
            "avg_logp",
            (
                (F.col("bucket") != "drop")
                & (F.col("passes_repetition") == 1)
                & (F.col("avg_logp") >= F.lit(LM_KEEP_MIN))
            )
            .cast("int")
            .alias("keep"),
        )
    )


SQL_QUALITY_GATE = f"""
WITH qual AS ({SQL_TEXT_QUALITY}),
rep AS ({SQL_TEXT_REPETITION}),
lm AS ({SQL_TEXT_LM_QUALITY})
SELECT q.doc_id, q.quality, r.passes_repetition, l.avg_logp,
  CAST(q.bucket != 'drop' AND r.passes_repetition = 1
       AND l.avg_logp >= {LM_KEEP_MIN} AS INT) AS keep
FROM qual q
JOIN rep r ON r.doc_id = q.doc_id
JOIN lm l ON l.doc_id = q.doc_id
"""

TEXT_QUERIES["quality_gate"] = q_quality_gate
TEXT_ORACLES["quality_gate"] = SQL_QUALITY_GATE


# ---------------------------------------------------------------------------
# Source-mixture sampler: resample the corpus toward a declared
# per-source target mix (the "data mixing" stage of a training run —
# up/down-weighting sources is how pretraining corpora are composed).
# ---------------------------------------------------------------------------

#: declared target mix: source srcN gets relative weight (N % 4) + 1 —
#: a deterministic non-uniform target over however many sources exist.
MIX_BUDGET_FRAC = 0.6  #: sampled corpus size as a fraction of N
MIX_SALT = "bfann-mix:"


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixture sampler. Per-source sampling
    rates are derived from the declared target weights and the
    observed source counts (one tiny aggregate, broadcast back);
    documents are kept by the same salted rolling-hash draw as
    ``corpus_sample`` — RNG-free, so reruns and the DuckDB twin agree
    row-for-row. Rates are integer percent (the draw is mod-100), so
    the keep predicate is integral on both engines; ``weight`` is the
    inverse rate for unbiased downstream reweighting."""
    d = load_table(spark, sf_dir, "documents")
    widx = F.substring("source", 4, 10).cast("int")
    w = (widx % 4 + 1).cast("double")
    counts = d.groupBy("source").agg(F.count("*").alias("n_s"))
    tot = counts.agg(
        F.sum("n_s").alias("n_total"),
        F.sum((F.substring("source", 4, 10).cast("int") % 4 + 1).cast("double")).alias(
            "w_total"
        ),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(100),
            F.floor(
                F.lit(100.0 * MIX_BUDGET_FRAC)
                * F.col("n_total")
                * ((F.substring("source", 4, 10).cast("int") % 4 + 1).cast("double") / F.col("w_total"))
                / F.col("n_s")
            ).cast("int"),
        ).alias("rate_pct"),
    )
    draw = T.poly_hash(
        F.concat(F.lit(MIX_SALT), F.col("doc_id").cast("string"))
    ) % 100
    return (
        d.select("doc_id", "source", draw.alias("__draw"))
        .join(F.broadcast(rates), "source")
        .where(F.col("__draw") < F.col("rate_pct"))
        .select(
            "doc_id",
            "source",
            "rate_pct",
            F.round(F.lit(100.0) / F.col("rate_pct"), 6).alias("weight"),
        )
    )


_SQL_MIX_DRAW = _sql_poly_hash(f"'{MIX_SALT}' || CAST(doc_id AS VARCHAR)") + " % 100"

SQL_CORPUS_MIXTURE = f"""
WITH counts AS (
  SELECT source, count(*) AS n_s FROM documents GROUP BY source
),
tot AS (
  SELECT sum(n_s) AS n_total,
         sum(CAST(CAST(substr(source, 4) AS INT) % 4 + 1 AS DOUBLE)) AS w_total
  FROM counts
),
rates AS (
  SELECT source,
    least(100, CAST(floor(
      100.0 * {MIX_BUDGET_FRAC} * t.n_total
      * (CAST(CAST(substr(c.source, 4) AS INT) % 4 + 1 AS DOUBLE) / t.w_total)
      / c.n_s
    ) AS INT)) AS rate_pct
  FROM counts c CROSS JOIN tot t
)
SELECT d.doc_id, d.source, r.rate_pct,
  round(100.0 / r.rate_pct, 6) AS weight
FROM documents d JOIN rates r ON r.source = d.source
WHERE {_SQL_MIX_DRAW} < r.rate_pct
"""

TEXT_QUERIES["corpus_mixture"] = q_corpus_mixture
TEXT_ORACLES["corpus_mixture"] = SQL_CORPUS_MIXTURE


# ---------------------------------------------------------------------------
# DSIR-style importance weighting (Xie et al. 2023, arXiv:2302.03169 —
# public method): score each raw document by how much more likely its
# hashed n-gram features are under a target distribution than under
# the raw pool. The weights are the resampling input of the
# data-selection stage ("pick raw web text that looks like the
# target corpus") every pretraining pipeline runs at scale.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256          #: hashed feature space (uni+bigram buckets)
DSIR_TARGET_LANG = "en"     #: target distribution = the English slice
_DSIR_SCALE = 1_000_000     #: ln() micro-unit quantization (bm25 rule)


def _dsir_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_feats, __s): per-document feature count and total
    log-likelihood-ratio in BIGINT micro-units — the shared core of
    the weights query and the Gumbel-top-k selector.

    Plan shape: one pass builds the exploded (doc, feature-bucket)
    frame; the two feature models are wordcount-shape aggregates over
    it (map-side combine, 256-row outputs); the log-ratio table
    broadcasts back and scoring is one per-doc aggregation — the
    whole thing is three aggregates over one exploded frame, no UDFs.
    Cross-engine: each ln() is floor-quantized to micro-units
    immediately (Spark Math.log vs DuckDB libm differ at the last
    ULP), and the per-doc sum runs in BIGINT micro-units."""
    d = load_table(spark, sf_dir, "documents")
    tokd = d.select("doc_id", "lang", T.tokens(F.col("text")).alias("__toks"))
    toks = F.col("__toks")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = tokd.select(
        "doc_id", "lang", F.explode(F.concat(toks, bigrams)).alias("g")
    )
    feat = grams.select(
        "doc_id", "lang", (T.poly_hash(F.col("g")) % DSIR_BUCKETS).alias("f")
    )
    raw_c = feat.groupBy("f").agg(F.count("*").alias("c_r"))
    tgt_c = (
        feat.where(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("f")
        .agg(F.count("*").alias("c_t"))
    )
    totals = feat.agg(
        F.count("*").alias("n_r"),
        F.count(F.when(F.col("lang") == DSIR_TARGET_LANG, 1)).alias("n_t"),
    )
    lp = lambda c, n: F.floor(  # noqa: E731 — ln quantized at birth
        F.log((c + 1.0) / (F.col(n) + F.lit(float(DSIR_BUCKETS))))
        * _DSIR_SCALE
    ).cast("bigint")
    model = (
        raw_c.join(tgt_c, "f", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "f",
            (lp(F.coalesce("c_t", F.lit(0)), "n_t") - lp(F.col("c_r"), "n_r")).alias(
                "lw_micro"
            ),
        )
    )
    scored = (
        feat.join(F.broadcast(model), "f")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_feats"), F.sum("lw_micro").alias("__s"))
    )
    return tokd.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0).cast("long")).alias("n_feats"),
        F.coalesce("__s", F.lit(0).cast("long")).alias("__s"),
    )


def q_corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document importance weight log(p_target/p_raw): the scored
    frame's micro-unit total, length-normalized per feature (see
    :func:`_dsir_scored` for the plan shape and the ln discipline)."""
    return _dsir_scored(spark, sf_dir).select(
        "doc_id",
        "n_feats",
        F.round(
            F.when(
                F.col("n_feats") > 0,
                F.col("__s").cast("double")
                / F.col("n_feats")
                / F.lit(float(_DSIR_SCALE)),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dsir_weight"),
    )


#: Gumbel-top-k selection (the paper's resampling mechanism, made
#: deterministic): key = total log-weight + Gumbel noise, noise drawn
#: from the salted rolling hash instead of an RNG. Fraction kept:
DSIR_KEEP_FRAC = 0.4
_DSIR_GUMBEL_SALT = "dsir-gumbel:"


#: number of range buckets the parallel exact-rank decomposes into —
#: sized to the shuffle parallelism, NOT to N (each bucket holds ~N/B
#: rows, ranked independently).
DSIR_RANK_BUCKETS = 32


def q_corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(sel_rank, doc_id, key_micro, w_micro): the documents DSIR
    actually keeps — Gumbel-top-k over exp(weight), i.e. top
    ⌊frac·N⌋ by (w + g) where g = −ln(−ln u) and u is the salted
    rolling-hash draw (RNG-free, like every sampler here). Both ln's
    floor-quantize to micro-units at birth, so the key is an exact
    BIGINT on both engines.

    The global rank is computed WITHOUT a single-partition window
    (the r05 plan's one scale-killer): ``approx_percentile`` split
    points on ``key_micro`` define range buckets that are strictly
    monotone in the sort key (bucket(k) = #splits > k, so bucket a <
    bucket b ⟹ every key in a > every key in b — exact cross-bucket
    order regardless of percentile error, which only skews bucket
    SIZES). Ranks are then per-bucket ``row_number`` windows (parallel
    across buckets), stitched into the exact global rank by a
    broadcast B-row offset frame (B=``DSIR_RANK_BUCKETS``, built with
    a B×B broadcast triangular sum — no SinglePartition exchange
    anywhere in the plan). Keeps exactly ⌊frac·N⌋ rows, identical to
    the DuckDB full-window twin."""
    scored = _dsir_scored(spark, sf_dir)
    h = (
        T.poly_hash(
            F.concat(F.lit(_DSIR_GUMBEL_SALT), F.col("doc_id").cast("string"))
        )
        % 1_000_000
    )
    u = (h * 2 + 1).cast("double") / F.lit(2_000_000.0)
    ln1 = F.floor(F.log(u) * _DSIR_SCALE).cast("bigint")
    inner = (-ln1).cast("double") / F.lit(float(_DSIR_SCALE))
    g_micro = -F.floor(F.log(inner) * _DSIR_SCALE).cast("bigint")
    from .session import cached_persist

    # three consumers: total agg, bucket counts, final rank — persisted
    # ONCE per (session, fixture dir): cached_persist bounds repeated
    # invocations to one cached relation (r07 cache-lifecycle guard)
    keyed = cached_persist(
        spark,
        "dsir_keyed",
        sf_dir,
        lambda: scored.select(
            "doc_id",
            F.col("__s").alias("w_micro"),
            (F.col("__s") + g_micro).alias("key_micro"),
        ),
    )
    from .operators.relational import parallel_global_rank

    total = keyed.agg(F.count("*").alias("n_total"))
    ranked = parallel_global_rank(
        keyed, "key_micro", "doc_id", "sel_rank", DSIR_RANK_BUCKETS
    )
    return (
        ranked.crossJoin(F.broadcast(total))
        .where(F.col("sel_rank") <= F.floor(F.lit(DSIR_KEEP_FRAC) * F.col("n_total")))
        .select("sel_rank", "doc_id", "key_micro", "w_micro")
    )


_SQL_DSIR_CTES = f"""t AS (SELECT doc_id, lang, {SQL_TOKS} AS toks FROM documents),
grams AS (
  SELECT doc_id, lang, unnest(
    list_concat(toks,
      CASE WHEN len(toks) >= 2
        THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        ELSE CAST([] AS VARCHAR[]) END)
  ) AS g
  FROM t
),
feat AS (SELECT doc_id, lang, {_sql_poly_hash('g')} % {DSIR_BUCKETS} AS f FROM grams),
rawc AS (SELECT f, count(*) AS c_r FROM feat GROUP BY f),
tgtc AS (
  SELECT f, count(*) AS c_t FROM feat
  WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY f
),
tot AS (
  SELECT count(*) AS n_r,
         count(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 END) AS n_t
  FROM feat
),
model AS (
  SELECT r.f,
    CAST(floor(ln((coalesce(g.c_t, 0) + 1.0) / (tt.n_t + {DSIR_BUCKETS}.0))
               * {_DSIR_SCALE}) AS BIGINT)
  - CAST(floor(ln((r.c_r + 1.0) / (tt.n_r + {DSIR_BUCKETS}.0))
               * {_DSIR_SCALE}) AS BIGINT) AS lw_micro
  FROM rawc r LEFT JOIN tgtc g ON g.f = r.f CROSS JOIN tot tt
),
scored AS (
  SELECT feat.doc_id, count(*) AS n_feats,
         CAST(sum(m.lw_micro) AS BIGINT) AS s
  FROM feat JOIN model m ON m.f = feat.f GROUP BY feat.doc_id
)"""

SQL_CORPUS_DSIR_WEIGHTS = f"""
WITH {_SQL_DSIR_CTES}
SELECT t.doc_id,
  coalesce(s.n_feats, 0) AS n_feats,
  round(coalesce(CAST(s.s AS DOUBLE) / s.n_feats / {_DSIR_SCALE}.0, 0.0), 6)
    AS dsir_weight
FROM t LEFT JOIN scored s ON s.doc_id = t.doc_id
"""

_SQL_GUMBEL_DRAW = (
    _sql_poly_hash(f"'{_DSIR_GUMBEL_SALT}' || CAST(doc_id AS VARCHAR)")
    + " % 1000000"
)

SQL_CORPUS_DSIR_SELECT = f"""
WITH {_SQL_DSIR_CTES},
base AS (
  SELECT t.doc_id, coalesce(CAST(s.s AS BIGINT), 0) AS w_micro
  FROM t LEFT JOIN scored s ON s.doc_id = t.doc_id
),
keyed AS (
  SELECT doc_id, w_micro,
    w_micro + (
      - CAST(floor(ln(
          CAST(- CAST(floor(ln(
            CAST(({_SQL_GUMBEL_DRAW}) * 2 + 1 AS DOUBLE) / 2000000.0
          ) * {_DSIR_SCALE}) AS BIGINT) AS DOUBLE) / {_DSIR_SCALE}.0
        ) * {_DSIR_SCALE}) AS BIGINT)
    ) AS key_micro
  FROM base
),
sel AS (
  SELECT doc_id, w_micro, key_micro,
    CAST(row_number() OVER (ORDER BY key_micro DESC, doc_id ASC) AS INT)
      AS sel_rank,
    count(*) OVER () AS n_total
  FROM keyed
)
SELECT sel_rank, doc_id, key_micro, w_micro FROM sel
WHERE sel_rank <= floor({DSIR_KEEP_FRAC} * n_total)
"""

TEXT_QUERIES["corpus_dsir_weights"] = q_corpus_dsir_weights
TEXT_QUERIES["corpus_dsir_select"] = q_corpus_dsir_select
TEXT_ORACLES["corpus_dsir_weights"] = SQL_CORPUS_DSIR_WEIGHTS
TEXT_ORACLES["corpus_dsir_select"] = SQL_CORPUS_DSIR_SELECT


# ---------------------------------------------------------------------------
# BPE merge training (Sennrich et al. 2016, arXiv:1508.07909 — public
# method): learn the first R byte-pair merges from the corpus. The
# production shape matters more than the toy size: BPE trainers run on
# the WORD-FREQUENCY table (one wordcount aggregate over the corpus —
# the only corpus-sized stage), and every merge round then operates on
# that broadcast-sized vocabulary, so the loop costs O(R·|vocab|)
# regardless of corpus bytes.
# ---------------------------------------------------------------------------

BPE_ROUNDS = 6
BPE_END = "_"  #: end-of-word marker symbol

#: greedy left-to-right pair merge as a string fold over the
#: space-joined symbol sequence: when the accumulated tail symbol is
#: `lsym` and the incoming symbol is `rsym`, splice them — the merged
#: symbol then cannot re-merge with the NEXT occurrence in the same
#: pass ([a,a,a] + (a,a) → [aa, a]), which is exactly BPE's
#: non-overlapping scan. Verified character-identical to the DuckDB
#: list_reduce twin.
_BPE_MERGE_EXPR = """
aggregate(split(syms, ' '), '', (acc, s) -> CASE
  WHEN regexp_extract(acc, '[^ ]+$', 0) = lsym AND s = rsym
    THEN substring(acc, 1, length(acc) - length(regexp_extract(acc, '[^ ]+$', 0))) || lsym || rsym
  WHEN acc = '' THEN s
  ELSE acc || ' ' || s END)
"""


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(merge_round, left_sym, right_sym, merged_sym, pair_count):
    the first ``BPE_ROUNDS`` learned merges. Per round: adjacent
    symbol pairs explode from the vocab (weighted by word frequency),
    one TakeOrdered picks the argmax (count desc, pair asc — the
    deterministic tie-break), and the winning pair broadcast-joins
    back into the fold that rewrites every word's symbol sequence.
    Each round's 31-row vocab frame is eagerly checkpointed (the
    k-means / beam-walk iterative idiom) so lineage stays flat."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    vocab = words.select(
        "w",
        "cnt",
        F.expr(f"concat_ws(' ', split(w, '')) || ' {BPE_END}'").alias("syms"),
    ).localCheckpoint(eager=False)
    bests = []
    for rnd in range(BPE_ROUNDS):
        sy = F.split("syms", " ")
        pairs = vocab.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice(sy, 1, F.size(sy) - 1),
                    F.slice(sy, 2, F.size(sy) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("pair"),
        )
        counts = pairs.groupBy("pair").agg(F.sum("cnt").alias("c"))
        best = (
            counts.orderBy(F.col("c").desc(), F.col("pair").asc())
            .limit(1)
            .select(
                F.lit(rnd).alias("merge_round"),
                F.split("pair", " ").getItem(0).alias("left_sym"),
                F.split("pair", " ").getItem(1).alias("right_sym"),
                F.col("c").alias("pair_count"),
            )
            .localCheckpoint(eager=False)
        )
        bests.append(best)
        vocab = (
            vocab.crossJoin(
                F.broadcast(
                    best.select(
                        F.col("left_sym").alias("lsym"),
                        F.col("right_sym").alias("rsym"),
                    )
                )
            )
            .select("w", "cnt", F.expr(_BPE_MERGE_EXPR).alias("syms"))
            .localCheckpoint(eager=False)
        )
    res = bests[0]
    for b in bests[1:]:
        res = res.unionByName(b)
    return res.select(
        "merge_round",
        "left_sym",
        "right_sym",
        F.concat("left_sym", "right_sym").alias("merged_sym"),
        "pair_count",
    )


def _sql_bpe_merges() -> str:
    """Unrolled DuckDB twin: v{r}/b{r} CTE per round, MATERIALIZED
    (round r is referenced by both round r+1's pair counts and its
    merge — default inlining is exponential in R, the SemDeDup
    lesson)."""
    parts = [f"""
WITH tok AS (SELECT unnest({SQL_TOKS}) AS w FROM documents),
wc AS (SELECT w, count(*) AS cnt FROM tok WHERE w <> '' GROUP BY w),
v0 AS MATERIALIZED (
  SELECT w, cnt, array_to_string(string_split(w, ''), ' ') || ' {BPE_END}' AS syms
  FROM wc
)"""]
    for rnd in range(BPE_ROUNDS):
        parts.append(f""",
c{rnd} AS (
  SELECT pr AS pair, CAST(sum(cnt) AS BIGINT) AS c FROM (
    SELECT cnt, unnest(list_transform(range(1, len(sy)),
                                      i -> sy[i] || ' ' || sy[i+1])) AS pr
    FROM (SELECT cnt, string_split(syms, ' ') AS sy FROM v{rnd})
  ) GROUP BY pr
),
b{rnd} AS MATERIALIZED (
  SELECT {rnd} AS merge_round,
         string_split(pair, ' ')[1] AS lsym,
         string_split(pair, ' ')[2] AS rsym,
         c AS pair_count
  FROM c{rnd} ORDER BY c DESC, pair ASC LIMIT 1
),
v{rnd + 1} AS MATERIALIZED (
  SELECT v.w, v.cnt,
    list_reduce(list_prepend('', string_split(v.syms, ' ')), (acc, s) -> CASE
      WHEN regexp_extract(acc, '[^ ]+$') = b.lsym AND s = b.rsym
        THEN substr(acc, 1, length(acc) - length(regexp_extract(acc, '[^ ]+$'))) || b.lsym || b.rsym
      WHEN acc = '' THEN s
      ELSE acc || ' ' || s END) AS syms
  FROM v{rnd} v CROSS JOIN b{rnd} b
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT merge_round, lsym AS left_sym, rsym AS right_sym, "
        f"lsym || rsym AS merged_sym, pair_count FROM b{rnd}"
        for rnd in range(BPE_ROUNDS)
    )
    parts.append(f"\n{union}\n")
    return "".join(parts)


SQL_BPE_MERGES = _sql_bpe_merges()

TEXT_QUERIES["bpe_merges"] = q_bpe_merges
TEXT_ORACLES["bpe_merges"] = SQL_BPE_MERGES


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens): apply the learned merge table
    — tokenization under the trained tokenizer. The trainer's final
    vocabulary frame ALREADY holds every word's merged symbol sequence, so
    applying BPE to the corpus is one broadcast join of (word →
    symbol count) onto the exploded document words and a per-doc sum:
    the segmenter never re-runs the merge loop per document, exactly
    as production tokenizers apply a frozen merge table."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    vocab = words.select(
        "w",
        "cnt",
        F.expr(f"concat_ws(' ', split(w, '')) || ' {BPE_END}'").alias("syms"),
    ).localCheckpoint(eager=False)
    for rnd in range(BPE_ROUNDS):
        sy = F.split("syms", " ")
        pairs = vocab.select(
            "cnt",
            F.explode(
                F.zip_with(
                    F.slice(sy, 1, F.size(sy) - 1),
                    F.slice(sy, 2, F.size(sy) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("pair"),
        )
        counts = pairs.groupBy("pair").agg(F.sum("cnt").alias("c"))
        best = (
            counts.orderBy(F.col("c").desc(), F.col("pair").asc())
            .limit(1)
            .select(
                F.split("pair", " ").getItem(0).alias("lsym"),
                F.split("pair", " ").getItem(1).alias("rsym"),
            )
            .localCheckpoint(eager=False)
        )
        vocab = (
            vocab.crossJoin(F.broadcast(best))
            .select("w", "cnt", F.expr(_BPE_MERGE_EXPR).alias("syms"))
            .localCheckpoint(eager=False)
        )
    per_word = vocab.select(
        "w", F.size(F.split("syms", " ")).alias("n_syms")
    )
    doc_words = d.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("w")
    ).where(F.col("w") != "")
    return (
        doc_words.join(F.broadcast(per_word), "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
    )


def _sql_bpe_token_counts() -> str:
    """Reuses the trainer's unrolled CTE chain up to the final vocab,
    then joins symbol counts back onto the exploded document words."""
    body = SQL_BPE_MERGES
    # the trainer SQL ends with the merge-table UNION; keep only its
    # CTE chain (everything up to the first top-level SELECT) and
    # project from the final vocab instead
    cut = body.index("SELECT merge_round,")
    ctes = body[:cut].rstrip().rstrip("\n")
    return f"""{ctes}
, per_word AS (
  SELECT w, len(string_split(syms, ' ')) AS n_syms FROM v{BPE_ROUNDS}
),
doc_words AS (
  SELECT doc_id, unnest({SQL_TOKS}) AS w FROM documents
)
SELECT d.doc_id, count(*) AS n_words,
       CAST(sum(p.n_syms) AS BIGINT) AS n_bpe_tokens
FROM doc_words d JOIN per_word p ON p.w = d.w
WHERE d.w <> ''
GROUP BY d.doc_id
"""


SQL_BPE_TOKEN_COUNTS = _sql_bpe_token_counts()

TEXT_QUERIES["bpe_token_counts"] = q_bpe_token_counts
TEXT_ORACLES["bpe_token_counts"] = SQL_BPE_TOKEN_COUNTS


# ---------------------------------------------------------------------------
# PII redaction (curation-stage scrubbing). The fixture text is
# synthetic word-salad with no PII, so the query first APPENDS
# deterministic PII-shaped tokens derived from doc_id (identical
# derivation on both engines — the same idiom as the embedding-derived
# query sets) and then exercises the real scrubbing machinery
# (``functions.text.PII_RULES``) on the augmented column: per-pattern
# match counts + the md5 of the redacted text. Plan: one map-side
# projection, regexes inside whole-stage codegen — no shuffle, scales
# as a pure scan at any corpus size.
# ---------------------------------------------------------------------------


def _pii_aug_col() -> "F.Column":
    did = F.col("doc_id")
    email = F.concat(
        F.lit(" contact doc"), did.cast("string"), F.lit("@example.com")
    )
    phone = F.concat(
        F.lit(" tel 555-"), F.lpad((did % 10000).cast("string"), 4, "0")
    )
    ip1 = F.concat(
        F.lit(" from 10."),
        (did % 256).cast("string"),
        F.lit(".0."),
        ((did * 7) % 256).cast("string"),
    )
    ip2 = F.concat(
        F.lit(" via 192.168."), ((did * 3) % 256).cast("string"), F.lit(".1")
    )
    return F.concat(
        F.col("text"),
        F.when(did % 3 > 0, email).otherwise(F.lit("")),
        F.when(did % 2 == 0, phone).otherwise(F.lit("")),
        ip1,
        F.when(did % 5 == 0, ip2).otherwise(F.lit("")),
    )


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_emails, n_ips, n_phones, red_md5, n_chars_red):
    per-document PII match counts on the augmented text and the md5 +
    length of the fully redacted output (the value a downstream
    pipeline would store). Counts are measured on the pre-redaction
    text; redaction applies ``PII_RULES`` in declared order."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", _pii_aug_col().alias("aug"))
    red = T.pii_redact(F.col("aug"))
    return t.select(
        "doc_id",
        F.regexp_count("aug", F.lit(T.PII_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count("aug", F.lit(T.PII_IPV4_RE)).cast("int").alias("n_ips"),
        F.regexp_count("aug", F.lit(T.PII_PHONE_RE)).cast("int").alias("n_phones"),
        F.md5(red).alias("red_md5"),
        F.length(red).cast("int").alias("n_chars_red"),
    )


def _sql_pii_redact() -> str:
    aug = (
        "text"
        " || CASE WHEN doc_id % 3 > 0 THEN ' contact doc' || CAST(doc_id AS VARCHAR)"
        " || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 2 = 0 THEN ' tel 555-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
        " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'"
        " || CAST((doc_id * 7) % 256 AS VARCHAR)"
        " || CASE WHEN doc_id % 5 = 0 THEN ' via 192.168.'"
        " || CAST((doc_id * 3) % 256 AS VARCHAR) || '.1' ELSE '' END"
    )
    red = "aug"
    for pat, marker in T.PII_RULES:
        red = f"regexp_replace({red}, '{pat}', '{marker}', 'g')"
    counts = {
        "n_emails": T.PII_EMAIL_RE,
        "n_ips": T.PII_IPV4_RE,
        "n_phones": T.PII_PHONE_RE,
    }
    count_cols = ",\n  ".join(
        f"CAST(len(regexp_extract_all(aug, '{pat}')) AS INT) AS {name}"
        for name, pat in counts.items()
    )
    return f"""
WITH aug AS (SELECT doc_id, {aug} AS aug FROM documents)
SELECT doc_id,
  {count_cols},
  md5({red}) AS red_md5,
  CAST(length({red}) AS INT) AS n_chars_red
FROM aug
"""


SQL_PII_REDACT = _sql_pii_redact()

TEXT_QUERIES["pii_redact"] = q_pii_redact
TEXT_ORACLES["pii_redact"] = SQL_PII_REDACT


# ---------------------------------------------------------------------------
# Token-budget report: tokens surviving the quality gates, by source —
# the capacity-planning aggregate a training-data pipeline computes
# before every mixing decision ("how many keep-grade tokens does each
# source actually contribute?"). One groupBy over per-doc scalars +
# a broadcast total; the share division is BIGINT/BIGINT → double,
# deterministic on both engines.
# ---------------------------------------------------------------------------


def q_corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, bucket, n_docs, n_tokens, token_share): document and
    whitespace-token counts per (source × quality bucket), with each
    cell's share of the whole corpus's tokens. Buckets are
    ``text_quality``'s keep/borderline/drop thresholds."""
    d = load_table(spark, sf_dir, "documents")
    score = T.quality_score(F.col("text"))
    per_doc = d.select(
        "source",
        F.when(score >= 0.8, "keep")
        .when(score >= 0.5, "borderline")
        .otherwise("drop")
        .alias("bucket"),
        F.size(T.tokens(F.col("text"))).cast("bigint").alias("ntoks"),
    )
    per = per_doc.groupBy("source", "bucket").agg(
        F.count("*").alias("n_docs"), F.sum("ntoks").alias("n_tokens")
    )
    tot = per.agg(F.sum("n_tokens").alias("__tot"))
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "bucket",
        "n_docs",
        "n_tokens",
        (
            F.round(F.col("n_tokens").cast("double") / F.col("__tot"), 6)
            + F.lit(0.0)
        ).alias("token_share"),
    )


SQL_CORPUS_TOKEN_BUDGET = f"""
WITH t AS (SELECT source, text, {SQL_TOKS} AS toks FROM documents),
pd AS (
  SELECT source,
    CASE WHEN {_SQL_QUALITY} >= 0.8 THEN 'keep'
         WHEN {_SQL_QUALITY} >= 0.5 THEN 'borderline'
         ELSE 'drop' END AS bucket,
    CAST(len(toks) AS BIGINT) AS ntoks
  FROM t
),
per AS (
  SELECT source, bucket, count(*) AS n_docs,
         CAST(sum(ntoks) AS BIGINT) AS n_tokens
  FROM pd GROUP BY source, bucket
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM per)
SELECT source, bucket, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / tt, 6) + 0.0 AS token_share
FROM per CROSS JOIN tot
"""

TEXT_QUERIES["corpus_token_budget"] = q_corpus_token_budget
TEXT_ORACLES["corpus_token_budget"] = SQL_CORPUS_TOKEN_BUDGET


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters — bounded-memory frequency estimation
# ---------------------------------------------------------------------------

#: CMS geometry: DEPTH independent affine rows over the shared
#: polynomial token hash, W counters each — 2048 BIGINT counters total
#: regardless of corpus size, which is the whole point: at 100 TB the
#: sketch build is one map-side-combining aggregate into a
#: fixed-width table, where the exact vocabulary count would shuffle
#: a corpus-scale token table. The affine family is the MinHash
#: permutation trick (operators/dedup.MINHASH_A/B) with its own
#: constants.
CMS_W = 512
CMS_DEPTH = 4
CMS_A = (37, 101, 193, 389)
CMS_B = (11, 29, 59, 97)
CMS_TOPN = 20


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tok, exact_count, cms_est) for the exact top-N tokens: the
    count-min estimate beside the truth, demonstrating the sketch's
    one-sided guarantee (est ≥ exact; overestimate = bucket
    collisions). Integer end-to-end — hash, buckets, counters — so
    the DuckDB twin is bit-identical with no float discipline needed.

    Plan shape: ONE token explode feeds both the sketch build
    (DEPTH·occurrences rows → 2048-group aggregate, pure map-side
    combine) and the exact counts; the top-N selection is a bounded-K
    ``TakeOrderedAndProject`` (never a global window); estimates join
    the broadcast-sized per-depth sketch rows."""
    from .session import cached_persist

    docs = load_table(spark, sf_dir, "documents")
    hashed = cached_persist(
        spark,
        "cms_hashed",
        sf_dir,
        lambda: docs.select(
            F.explode(F.split(F.col("text"), " ")).alias("tok")
        ).select("tok", T.poly_hash(F.col("tok")).alias("h")),
    )
    bucket_rows = hashed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            (F.lit(CMS_A[d]) * F.col("h") + F.lit(CMS_B[d]))
                            % F.lit(T.HASH_P)
                            % F.lit(CMS_W)
                        ).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("db")
    ).select("db.d", "db.bucket")
    sketch = bucket_rows.groupBy("d", "bucket").agg(F.count("*").alias("c"))
    top = (
        hashed.groupBy("tok", "h")
        .agg(F.count("*").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("tok"))
        .limit(CMS_TOPN)
    )
    for d in range(CMS_DEPTH):
        sd = sketch.where(F.col("d") == d).select(
            F.col("bucket").alias(f"b{d}"), F.col("c").alias(f"c{d}")
        )
        top = top.withColumn(
            f"b{d}",
            (F.lit(CMS_A[d]) * F.col("h") + F.lit(CMS_B[d]))
            % F.lit(T.HASH_P)
            % F.lit(CMS_W),
        ).join(F.broadcast(sd), f"b{d}")
    return top.select(
        "tok",
        "exact_count",
        F.least(*[F.col(f"c{d}") for d in range(CMS_DEPTH)]).alias("cms_est"),
    )


_CMS_BUCKET_UNION = "\nUNION ALL\n".join(
    f"SELECT {d} AS d, (({CMS_A[d]} * h + {CMS_B[d]}) % {T.HASH_P}) % {CMS_W} AS bucket FROM th"
    for d in range(CMS_DEPTH)
)
_CMS_EST_JOINS = "\n".join(
    f"JOIN sketch s{d} ON s{d}.d = {d} AND s{d}.bucket = "
    f"(({CMS_A[d]} * t.h + {CMS_B[d]}) % {T.HASH_P}) % {CMS_W}"
    for d in range(CMS_DEPTH)
)

SQL_CMS_HEAVY_HITTERS = f"""
WITH ex AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
th AS (SELECT tok, {_sql_poly_hash('tok')} AS h FROM ex),
buckets AS ({_CMS_BUCKET_UNION}),
sketch AS (
  SELECT d, bucket, count(*) AS c FROM buckets GROUP BY d, bucket
),
top AS (
  SELECT tok, h, count(*) AS exact_count FROM th GROUP BY tok, h
  ORDER BY exact_count DESC, tok LIMIT {CMS_TOPN}
)
SELECT t.tok, t.exact_count,
       least({", ".join(f"s{d}.c" for d in range(CMS_DEPTH))}) AS cms_est
FROM top t
{_CMS_EST_JOINS}
"""

TEXT_QUERIES["cms_heavy_hitters"] = q_cms_heavy_hitters
TEXT_ORACLES["cms_heavy_hitters"] = SQL_CMS_HEAVY_HITTERS


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count — the oracled sketch twin of
# approx_count_distinct (which is engine-specific and rows-only)
# ---------------------------------------------------------------------------

#: HLL geometry: the polynomial hash is finalized by a 32-bit
#: xorshift-multiply mix (lowbias32 family, constants kept < 2³¹ so
#: every product stays ≤ 63 bits — BIGINT-safe in both engines). The
#: raw polynomial hash is too structured for register bucketing
#: (sequential tokens underestimated 2× at n=500 — measured before
#: the finalizer landed); after the mix, measured rel-err ≤ 0.17
#: across n = 31..200k over three token patterns. b=8 → m=256
#: registers; the mixed hash is 32 bits, so the rest field is 24 bits
#: and rank ρ = 25 − bit_length(rest) ∈ [1, 25]. The harmonic sum
#: Σ 2^(−M_j) is computed as the INTEGER Σ 2^(25−M_j) — order-free
#: and bit-identical cross-engine; the only float ops are the final
#: α·m²·2²⁵ / Σv division — IEEE-identical everywhere.
HLL_M = 256
HLL_RHO_MAX = 25
HLL_MASK = 0xFFFFFFFF
HLL_C1 = 0x7FEB352D
HLL_C2 = 0x6935FA69
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
#: α·m²·2²⁵ folded into ONE double in Python so both engines divide
#: the identical numerator (DuckDB parses bare decimal literals as
#: DECIMAL, not DOUBLE — a pure-literal product overflows DECIMAL(18))
HLL_NUM = HLL_ALPHA * float(HLL_M * HLL_M) * float(1 << HLL_RHO_MAX)


def hll_registers(values: DataFrame) -> DataFrame:
    """(bucket, m): the 256-register HLL table of a ``v``-column frame
    (``v`` = raw poly hash). ONE copy of the mix + register arithmetic
    — shared by the batch token query, the accuracy test, and the
    streaming form (``streaming/windows.hll_user_registers``); the
    register build is an incremental-friendly max-aggregate (register
    max is idempotent and monotone, so the same plan runs unchanged as
    a Structured Streaming stateful aggregate with O(m) state)."""
    # chained selects keep each mix step a single column reference —
    # inlining would double the poly-hash subtree at every xor
    mixed = (
        values.select(F.col("v").bitwiseAND(F.lit(HLL_MASK)).alias("v"))
        .select(F.col("v").bitwiseXOR(F.shiftright(F.col("v"), 16)).alias("v"))
        .select((F.col("v") * F.lit(HLL_C1)).bitwiseAND(F.lit(HLL_MASK)).alias("v"))
        .select(F.col("v").bitwiseXOR(F.shiftright(F.col("v"), 15)).alias("v"))
        .select((F.col("v") * F.lit(HLL_C2)).bitwiseAND(F.lit(HLL_MASK)).alias("v"))
        .select(F.col("v").bitwiseXOR(F.shiftright(F.col("v"), 16)).alias("h"))
    )
    hashed = mixed.select(
        (F.col("h") % F.lit(HLL_M)).alias("bucket"),
        F.shiftright(F.col("h"), 8).alias("rest"),
    )
    rho = F.when(F.col("rest") == 0, F.lit(HLL_RHO_MAX)).otherwise(
        F.lit(HLL_RHO_MAX) - F.length(F.bin(F.col("rest")))
    )
    return hashed.select("bucket", rho.alias("rho")).groupBy("bucket").agg(
        F.max("rho").alias("m")
    )


def hll_distinct_estimate(docs: DataFrame) -> DataFrame:
    """The HLL pipeline over any (text) frame — shared by the
    registered fixture query and the cross-cardinality accuracy test
    (``tests/test_sketches.py``), so there is exactly ONE copy of the
    sketch arithmetic."""
    from .session import cached_persist

    toks = cached_persist(
        docs.sparkSession,
        "hll_toks",
        id(docs),
        lambda: docs.select(F.explode(F.split(F.col("text"), " ")).alias("tok")),
        pin=docs,
    )
    regs = hll_registers(toks.select(T.poly_hash(F.col("tok")).alias("v")))
    zs = regs.agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - m)")
        ).alias("sv"),
        F.count("*").alias("nb"),
    )
    exact = toks.agg(F.countDistinct("tok").alias("n_exact"))
    zint = (
        F.col("sv")
        + (F.lit(HLL_M) - F.col("nb")) * F.lit(1 << HLL_RHO_MAX).cast("bigint")
    ).cast("double")
    raw = F.lit(HLL_NUM) / zint
    # small-range (linear-counting) correction — the standard HLL
    # branch for E ≤ 2.5m with empty registers, and the regime the
    # 31-word fixture vocabulary actually sits in. ln() is the one
    # cross-engine ULP hazard → floor-quantized to micro-units (the
    # bm25 rule); m/V is a ratio of small ints, exact in double.
    v = (F.lit(HLL_M) - F.col("nb")).cast("double")
    lin = F.lit(float(HLL_M)) * (
        F.floor(F.log(F.lit(float(HLL_M)) / v) * F.lit(1000000.0))
        / F.lit(1000000.0)
    )
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (v > 0), lin).otherwise(raw)
    return exact.crossJoin(F.broadcast(zs)).select(
        "n_exact",
        F.round(est, 6).alias("hll_est"),
        F.round((est - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_err"),
    )


def q_hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_exact, hll_est, rel_err): the 256-register HyperLogLog
    estimate of the distinct-token count beside the exact count. The
    sketch build is one map-side-combining max-aggregate into ≤256
    rows — bounded memory regardless of corpus size, like
    ``cms_heavy_hitters`` (the two classic sketches, both oracled).
    Duplicates need no pre-distinct: register max is idempotent."""
    return hll_distinct_estimate(load_table(spark, sf_dir, "documents"))


SQL_HLL_DISTINCT_TOKENS = f"""
WITH ex AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
th AS (SELECT {_sql_poly_hash('tok')} AS v FROM ex),
m1 AS (SELECT xor(v & {HLL_MASK}, (v & {HLL_MASK}) >> 16) AS v FROM th),
m2 AS (SELECT (v * {HLL_C1}) & {HLL_MASK} AS v FROM m1),
m3 AS (SELECT xor(v, v >> 15) AS v FROM m2),
m4 AS (SELECT (v * {HLL_C2}) & {HLL_MASK} AS v FROM m3),
mx AS (SELECT xor(v, v >> 16) AS h FROM m4),
hb AS (SELECT h % {HLL_M} AS bucket, h >> 8 AS rest FROM mx),
regs AS (
  SELECT bucket,
    max(CASE WHEN rest = 0 THEN {HLL_RHO_MAX}
             ELSE {HLL_RHO_MAX} - length(bin(rest)) END) AS m
  FROM hb GROUP BY bucket
),
zs AS (
  SELECT CAST(sum(CAST(1 AS BIGINT) << ({HLL_RHO_MAX} - m)) AS BIGINT) AS sv,
         count(*) AS nb
  FROM regs
),
exact AS (SELECT count(DISTINCT tok) AS n_exact FROM ex),
est AS (
  SELECT
    CAST({HLL_NUM!r} AS DOUBLE)
      / CAST(sv + ({HLL_M} - nb) * CAST({1 << HLL_RHO_MAX} AS BIGINT) AS DOUBLE)
      AS raw,
    CAST({HLL_M} - nb AS DOUBLE) AS v
  FROM zs
),
corrected AS (
  SELECT CASE WHEN raw <= CAST({int(2.5 * HLL_M)} AS DOUBLE) AND v > 0
              THEN CAST({HLL_M} AS DOUBLE)
                   * (floor(ln(CAST({HLL_M} AS DOUBLE) / v) * 1000000) / 1000000)
              ELSE raw END AS e
  FROM est
)
SELECT n_exact,
  round(e, 6) AS hll_est,
  round((e - n_exact) / n_exact, 6) AS rel_err
FROM exact CROSS JOIN corrected
"""

TEXT_QUERIES["hll_distinct_tokens"] = q_hll_distinct_tokens
TEXT_ORACLES["hll_distinct_tokens"] = SQL_HLL_DISTINCT_TOKENS
