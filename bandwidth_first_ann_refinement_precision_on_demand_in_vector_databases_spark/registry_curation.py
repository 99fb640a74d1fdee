"""The composed corpus-curation pipeline as one oracle-checked query
(SURVEY §7-M5 capstone): quality gate → language ID → exact dedup →
MinHash-LSH near-dup removal → per-document stats, in a single
declarative plan (``operators/curation.py``). The DuckDB twin replays
the identical chain by reusing the same SQL fragments the per-stage
oracles already interpolate (quality formula, marker-language scores,
shingle/signature/banding CTEs) — the two sides cannot drift apart
stage by stage.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .operators import dedup as D
from .operators.curation import QUALITY_MIN, curate_corpus
from .registry_dedup import (
    _SQL_JAC,
    MINHASH_TAU,
    SHINGLE_N,
    _sql_band_rows,
    _sql_cc_rounds,
    sql_minhash_ctes,
)
from .registry_text import (
    _SQL_QUALITY,
    SQL_RE_TOKS,
    SQL_TOKS,
    _case,
    _mx,
    _score_cols,
)
from .sources.fixtures import load_table


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curate_corpus(
        load_table(spark, sf_dir, "documents"),
        q_min=QUALITY_MIN,
        jaccard_tau=MINHASH_TAU,
        shingle_n=SHINGLE_N,
    )


SQL_CORPUS_CURATION = f"""
WITH tq AS (SELECT doc_id, text, {SQL_TOKS} AS toks FROM documents),
scored AS MATERIALIZED (
  SELECT doc_id, text, toks,
    {_SQL_QUALITY} AS q,
    {_score_cols},
    CAST(len({SQL_RE_TOKS}) AS INT) AS n_tokens
  FROM tq
),
good AS MATERIALIZED (
  SELECT *, CASE WHEN {_mx} > 0 THEN (CASE {_case} END) ELSE 'und' END AS pred_lang
  FROM scored WHERE q >= {QUALITY_MIN}
),
grp AS (
  SELECT min(doc_id) AS doc_id, count(*) AS n_copies
  FROM good GROUP BY lower(text)
),
canon AS MATERIALIZED (SELECT g.*, grp.n_copies FROM good g JOIN grp USING (doc_id)),
{sql_minhash_ctes("canon")},
bands AS MATERIALIZED ({_sql_band_rows()}),
cand AS (
  SELECT DISTINCT x.id AS id_a, y.id AS id_b
  FROM bands x JOIN bands y ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id
),
pairs AS (
  SELECT c.id_a, c.id_b, {_SQL_JAC} AS jaccard
  FROM cand c JOIN sh a ON a.id = c.id_a JOIN sh b ON b.id = c.id_b
),
dup AS (SELECT id_a, id_b FROM pairs WHERE jaccard >= {MINHASH_TAU}),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM dup
  UNION
  SELECT id_b AS src, id_a AS dst FROM dup
),
{_sql_cc_rounds(D.CC_ITERS)},
dropped AS (SELECT id FROM l{D.CC_ITERS} WHERE id != label)
SELECT doc_id, n_tokens, round(q, 6) AS quality, pred_lang, n_copies
FROM canon WHERE doc_id NOT IN (SELECT id FROM dropped)
"""


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token chunking of every document — the RAG
    ingestion front end (chunk → embed → index). Map-side generator,
    no shuffle; the oracle replays the identical window arithmetic."""
    from .operators.curation import chunk_documents

    return chunk_documents(load_table(spark, sf_dir, "documents"))


def _sql_doc_chunks() -> str:
    from .operators.curation import CHUNK_OVERLAP, CHUNK_TOKENS

    step = CHUNK_TOKENS - CHUNK_OVERLAP
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(len(toks) - 1, 0) + 1, {step})) AS start_tok
  FROM t
)
SELECT doc_id,
       CAST(start_tok // {step} AS INT) AS chunk_id,
       CAST(start_tok AS INT) AS start_tok,
       CAST(least({CHUNK_TOKENS}, len(toks) - start_tok) AS INT) AS n_chunk_tokens,
       array_to_string(list_slice(toks, start_tok + 1, start_tok + {CHUNK_TOKENS}), ' ') AS chunk_text
FROM s
"""


DECON_MOD = 10  #: doc_id % 10 == 1 plays the benchmark/holdout set


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per non-holdout doc, the fraction of
    its distinct 3-gram shingles found anywhere in the holdout set."""
    from pyspark.sql import functions as F

    from .operators.curation import decontaminate

    return decontaminate(
        load_table(spark, sf_dir, "documents"),
        F.col("doc_id") % DECON_MOD == 1,
        n=SHINGLE_N,
    )


def _sql_decontamination() -> str:
    from .registry_dedup import sql_shingle_ctes

    return f"""
WITH corp AS (SELECT doc_id, text FROM documents WHERE doc_id % {DECON_MOD} != 1),
hold AS (SELECT doc_id, text FROM documents WHERE doc_id % {DECON_MOD} = 1),
{sql_shingle_ctes("corp")},
{sql_shingle_ctes("hold", prefix="h")},
ex AS (SELECT id, unnest(shs) AS s FROM sh),
bench AS (SELECT DISTINCT unnest(shs) AS s FROM hsh),
tot AS (SELECT id, count(*) AS n_shingles FROM ex GROUP BY id),
hits AS (
  SELECT ex.id, count(*) AS n_contaminated
  FROM ex JOIN bench ON bench.s = ex.s GROUP BY ex.id
)
SELECT c.doc_id,
       coalesce(t.n_shingles, 0) AS n_shingles,
       coalesce(h.n_contaminated, 0) AS n_contaminated,
       round(CASE WHEN coalesce(t.n_shingles, 0) > 0
                  THEN CAST(coalesce(h.n_contaminated, 0) AS DOUBLE) / t.n_shingles
                  ELSE 0.0 END, 6) AS contamination
FROM corp c
LEFT JOIN tot t ON t.id = c.doc_id
LEFT JOIN hits h ON h.id = c.doc_id
"""


CURATION_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "corpus_curation": q_corpus_curation,
    "doc_chunks": q_doc_chunks,
    "decontamination": q_decontamination,
}

CURATION_ORACLES: dict[str, str] = {
    "corpus_curation": SQL_CORPUS_CURATION,
    "doc_chunks": _sql_doc_chunks(),
    "decontamination": _sql_decontamination(),
}


def q_doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: per document, its placement
    (stream shard, cumulative token offset, training-sequence bin)
    when the corpus is concatenated in id order and cut into fixed
    PACK_CTX-token sequences. Integer window arithmetic — exact."""
    from .operators.curation import pack_documents

    return pack_documents(load_table(spark, sf_dir, "documents"))


def _sql_doc_packing() -> str:
    from .operators.curation import PACK_CTX, PACK_SHARDS

    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(doc_id % {PACK_SHARDS} AS INT) AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM base
)
SELECT doc_id, shard, n_tokens,
       cum - n_tokens AS start_offset,
       CAST((cum - n_tokens) // {PACK_CTX} AS INT) AS bin_id,
       ((cum - 1) // {PACK_CTX}) > ((cum - n_tokens) // {PACK_CTX}) AS crosses_boundary
FROM c
"""


def q_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level (paragraph-style) exact dedup: duplicate groups of
    non-overlapping 16-token windows — boilerplate repeated across
    otherwise-distinct documents, which document-level dedup misses."""
    from .operators.curation import dedup_chunks

    return dedup_chunks(load_table(spark, sf_dir, "documents"))


def _sql_dedup_chunks() -> str:
    from .operators.curation import _CHUNK_RADIX, DEDUP_CHUNK_TOKENS

    step = DEDUP_CHUNK_TOKENS
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, toks,
         unnest(range(0, greatest(len(toks) - 1, 0) + 1, {step})) AS start_tok
  FROM t
),
ch AS (
  SELECT doc_id * {_CHUNK_RADIX} + (start_tok // {step}) AS cid,
         array_to_string(list_slice(toks, start_tok + 1, start_tok + {step}), ' ') AS chunk_text
  FROM s
),
grp AS (
  SELECT min(cid) AS canonical_id, count(*) AS n_copies
  FROM ch GROUP BY lower(chunk_text)
)
SELECT CAST(canonical_id // {_CHUNK_RADIX} AS BIGINT) AS doc_id,
       CAST(canonical_id % {_CHUNK_RADIX} AS INT) AS chunk_id,
       n_copies
FROM grp
"""


CURATION_QUERIES["doc_packing"] = q_doc_packing
CURATION_QUERIES["dedup_chunks"] = q_dedup_chunks
CURATION_ORACLES["doc_packing"] = _sql_doc_packing()
CURATION_ORACLES["dedup_chunks"] = _sql_dedup_chunks()


# ---------------------------------------------------------------------------
# Bloom-filter decontamination pre-filter (operators/curation.
# bloom_decontaminate — broadcast bitmap probe beside the exact truth)
# ---------------------------------------------------------------------------

def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .operators.curation import bloom_decontaminate

    return bloom_decontaminate(
        load_table(spark, sf_dir, "documents"),
        F.col("doc_id") % DECON_MOD == 1,
        n=SHINGLE_N,
    )


def _sql_bloom_decontaminate() -> str:
    from .operators.curation import BLOOM_A, BLOOM_B, BLOOM_BITS, BLOOM_WORD
    from .registry_dedup import sql_shingle_ctes
    from .registry_text import _sql_poly_hash
    from .functions.text import HASH_P

    pos_union = "\nUNION ALL\n".join(
        f"SELECT (({BLOOM_A[k]} * h + {BLOOM_B[k]}) % {HASH_P}) % {BLOOM_BITS} AS p FROM bhash"
        for k in range(len(BLOOM_A))
    )
    joins, tests = [], []
    for k in range(len(BLOOM_A)):
        pk = f"(({BLOOM_A[k]} * pr.h + {BLOOM_B[k]}) % {HASH_P}) % {BLOOM_BITS}"
        joins.append(
            f"LEFT JOIN bitmap b{k} ON b{k}.word = CAST(({pk}) // {BLOOM_WORD} AS INT)"
        )
        tests.append(
            f"(coalesce(b{k}.wbits, 0) & (CAST(1 AS BIGINT) << CAST(({pk}) % {BLOOM_WORD} AS INT)))"
            f" = (CAST(1 AS BIGINT) << CAST(({pk}) % {BLOOM_WORD} AS INT))"
        )
    return f"""
WITH corp AS (SELECT doc_id, text FROM documents WHERE doc_id % {DECON_MOD} != 1),
hold AS (SELECT doc_id, text FROM documents WHERE doc_id % {DECON_MOD} = 1),
{sql_shingle_ctes("corp")},
{sql_shingle_ctes("hold", prefix="h")},
ex AS (SELECT id, unnest(shs) AS s FROM sh),
bench AS (SELECT DISTINCT unnest(shs) AS s FROM hsh),
bhash AS (SELECT {_sql_poly_hash('s')} AS h FROM bench),
pos AS ({pos_union}),
bitmap AS (
  SELECT CAST(p // {BLOOM_WORD} AS INT) AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(p % {BLOOM_WORD} AS INT)) AS wbits
  FROM pos GROUP BY 1
),
pr AS (SELECT id, s, {_sql_poly_hash('s')} AS h FROM ex),
marked AS (
  SELECT pr.id,
    CASE WHEN {" AND ".join(tests)} THEN 1 ELSE 0 END AS is_cand,
    CASE WHEN bench.s IS NOT NULL THEN 1 ELSE 0 END AS is_true
  FROM pr
  {chr(10).join(joins)}
  LEFT JOIN bench ON bench.s = pr.s
),
per_doc AS (
  SELECT id, count(*) AS n_shingles,
         CAST(sum(is_cand) AS BIGINT) AS n_bloom_hits,
         CAST(sum(is_true) AS BIGINT) AS n_true_hits
  FROM marked GROUP BY id
)
SELECT c.doc_id,
  coalesce(p.n_shingles, 0) AS n_shingles,
  coalesce(p.n_bloom_hits, 0) AS n_bloom_hits,
  coalesce(p.n_true_hits, 0) AS n_true_hits,
  coalesce(p.n_bloom_hits, 0) - coalesce(p.n_true_hits, 0) AS n_false_pos
FROM corp c LEFT JOIN per_doc p ON p.id = c.doc_id
"""


CURATION_QUERIES["bloom_decontaminate"] = q_bloom_decontaminate
CURATION_ORACLES["bloom_decontaminate"] = _sql_bloom_decontaminate()
