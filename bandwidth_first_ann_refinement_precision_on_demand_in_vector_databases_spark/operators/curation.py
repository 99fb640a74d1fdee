"""End-to-end corpus curation — the LLM-training-data pipeline the
individual operators exist for, composed as ONE declarative plan:

    quality gate → language ID → exact dedup (hash-first, keep the
    minimum-id representative) → MinHash-LSH near-dup removal →
    per-document stats

Every stage is an already-oracle-checked operator (``functions/text``,
``operators/dedup``); composing them declaratively means Catalyst
sees the whole pipeline — the quality filter pushes below every
downstream join, column pruning drops ``text`` the moment the last
text-derived signal is computed, and the only shuffles are the ones
the dedup stages already pay (8-byte hash keys, shingle index, band
keys — never document bodies).

Near-dup policy: near-dup pairs (Jaccard ≥ τ via MinHash banding) are
clustered into connected components (``dedup.duplicate_components`` —
BSP min-label propagation, fixed rounds) and exactly ONE canonical
survives per component: the smallest doc id. A pair-greedy "drop
every id_b" policy keeps every *local* minimum — a chain A~B~C with
A < C < B would keep both A and C even though they sit in one
near-dup cluster; the component policy keeps only A. Deterministic
and SQL-replayable (the oracle unrolls the same propagation rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql import Column

from ..functions.text import predicted_lang, quality_score, token_count
from .dedup import duplicate_components, exact_dedup, minhash_lsh_pairs, shingle_index

QUALITY_MIN = 0.5  #: keep + borderline buckets (registry_text thresholds)

CHUNK_TOKENS = 32   #: tokens per chunk (RAG-ingestion default shape)
CHUNK_OVERLAP = 8   #: tokens shared between consecutive chunks


def decontaminate(
    docs: DataFrame,
    holdout: Column,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_shingles, n_contaminated, contamination): benchmark
    decontamination — for every NON-holdout document, the fraction of
    its distinct word n-gram shingles that appear anywhere in the
    holdout (benchmark) set. The standard pre-training hygiene pass
    (C4/Pile-style n-gram overlap): a downstream filter drops docs
    above a contamination threshold before training.

    Scale shape: the corpus side is the same inverted shingle index
    the dedup operators build (one scan, explode, shuffle on the
    shingle key); the holdout side is DISTINCT benchmark shingles —
    benchmarks are MBs against a corpus of TBs, so it broadcasts and
    the containment check is a map-side semi join. Docs too short to
    shingle report contamination 0 over 0 shingles."""
    corp = docs.where(~holdout)
    sh = shingle_index(corp, n, text_col, id_col)
    bench = (
        shingle_index(docs.where(holdout), n, text_col, id_col)
        .select("shingle")
        .distinct()
    )
    totals = sh.groupBy("id").agg(F.count("*").alias("n_shingles"))
    hits = (
        sh.join(F.broadcast(bench), "shingle", "semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    base = corp.select(F.col(id_col).alias("id"))
    n_sh = F.coalesce("n_shingles", F.lit(0))
    n_hit = F.coalesce("n_contaminated", F.lit(0))
    return (
        base.join(totals, "id", "left")
        .join(hits, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            n_sh.alias("n_shingles"),
            n_hit.alias("n_contaminated"),
            F.round(
                F.when(n_sh > 0, n_hit.cast("double") / n_sh).otherwise(F.lit(0.0)),
                6,
            ).alias("contamination"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk: int = CHUNK_TOKENS,
    overlap: int = CHUNK_OVERLAP,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_text):
    overlapping fixed-token windows over each document — the
    embedding-ingestion shape of a RAG pipeline (chunk → embed →
    index). Chunk starts advance by ``chunk − overlap`` tokens; the
    last chunk may be short; every document yields at least one chunk
    (even the empty text).

    Pure Column expressions — ``sequence`` generates the starts,
    ``posexplode`` fans them out, ``slice``/``array_join`` cut the
    windows — so chunking is a map-side generator over the corpus
    scan: no shuffle, no UDF, and at 100 TB it pipelines straight
    into the downstream embed/index stages."""
    if overlap >= chunk:
        raise ValueError("overlap must be smaller than chunk")
    step = chunk - overlap
    toks = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(step)
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("__t"), starts.alias("__s"))
        .select(
            "doc_id",
            F.posexplode("__s").alias("chunk_id", "start_tok"),
            F.col("__t"),
        )
        .select(
            "doc_id",
            "chunk_id",
            "start_tok",
            F.least(F.lit(chunk), F.size("__t") - F.col("start_tok")).alias(
                "n_chunk_tokens"
            ),
            F.array_join(
                F.slice("__t", F.col("start_tok") + 1, chunk), " "
            ).alias("chunk_text"),
        )
    )


def curate_corpus(
    docs: DataFrame,
    q_min: float = QUALITY_MIN,
    jaccard_tau: float = 0.5,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Returns the curated per-document table
    ``(doc_id, n_tokens, quality, pred_lang, n_copies)`` — the
    documents that survive all gates, with the signals a downstream
    sampler needs. ``n_copies`` is the exact-duplicate multiplicity
    the survivor represents."""
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        quality_score(text_col).alias("__q"),
        predicted_lang(text_col).alias("pred_lang"),
        token_count(text_col).alias("n_tokens"),
    )
    good = scored.where(F.col("__q") >= q_min)

    # exact dedup over survivors: copies share identical text, hence
    # identical quality — filtering before grouping keeps/drops whole
    # groups, so the group set equals dedup-then-filter
    groups = exact_dedup(good, text_col="text", id_col="doc_id")
    # the canonical set feeds four consumers (signature build, shingle
    # index, pair verification, final anti-join); without a persist the
    # quality/lang scoring and the dedup join rerun per consumer
    # (measured 2x the whole query at bench scale)
    canon = good.join(
        groups.withColumnRenamed("canonical_id", "doc_id"), "doc_id"
    ).persist()

    # near-dup removal among canonicals only (exact copies are gone,
    # so banding never wastes candidates on identical texts): cluster
    # the pairs into components and drop every non-minimum member
    pairs = minhash_lsh_pairs(
        canon, n=shingle_n, threshold=jaccard_tau, text_col="text", id_col="doc_id"
    )
    comps = duplicate_components(pairs)
    drop = comps.where(F.col("doc_id") != F.col("component_id")).select("doc_id")
    kept = canon.join(drop, "doc_id", "left_anti")
    return kept.select(
        "doc_id",
        "n_tokens",
        F.round("__q", 6).alias("quality"),
        "pred_lang",
        "n_copies",
    )


# ---------------------------------------------------------------------------
# Training-sequence packing (concat-and-chunk) and chunk-level dedup
# ---------------------------------------------------------------------------

PACK_CTX = 128     #: tokens per packed training sequence
PACK_SHARDS = 8    #: independent packing streams (the parallelism unit)

#: chunk-level dedup runs on non-overlapping windows of this size —
#: the C4-style "drop repeated paragraphs" granularity
DEDUP_CHUNK_TOKENS = 16

#: composite (doc_id, chunk_id) -> single id encoding for chunk rows;
#: chunk counts are bounded by tokens/doc, far below this radix
_CHUNK_RADIX = 100_000


def pack_documents(
    docs: DataFrame,
    ctx: int = PACK_CTX,
    shards: int = PACK_SHARDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, shard, n_tokens, start_offset, bin_id,
    crosses_boundary): GPT-style concat-and-chunk packing — documents
    are concatenated in id order and cut into fixed ``ctx``-token
    training sequences; each document's placement is its cumulative
    token offset within its stream.

    Scale shape: a single global concatenation would serialize on one
    window partition, so packing runs as ``shards`` independent
    streams (``doc_id % shards`` — deterministic, no RNG), each a
    partition-local running sum. At 100 TB the shard count is the
    write parallelism of the packed-sequence store; within a shard
    the window is a single sort-free running total (rows already
    arrive sorted by the shuffle's range partitioning). All integer
    arithmetic — the DuckDB twin is exact, not float-fold-sensitive.

    ``crosses_boundary`` marks documents straddling a sequence cut —
    the fraction a curriculum would care about when choosing ``ctx``
    vs document length."""
    from pyspark.sql.window import Window

    n_tok = F.size(F.split(F.col(text_col), " "))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % shards).cast("int").alias("shard"),
        n_tok.cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_offset")
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        start,
        F.floor((cum - F.col("n_tokens")) / ctx).cast("int").alias("bin_id"),
        (
            F.floor((cum - F.lit(1)) / ctx)
            > F.floor((cum - F.col("n_tokens")) / ctx)
        ).alias("crosses_boundary"),
    )


def dedup_chunks(
    docs: DataFrame,
    chunk: int = DEDUP_CHUNK_TOKENS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, chunk_id, n_copies): exact duplicate groups at the
    CHUNK level — the C4-style paragraph dedup a document-level pass
    misses (boilerplate repeated across otherwise-distinct documents).
    Non-overlapping ``chunk``-token windows feed the same hash-first
    exact-dedup aggregate as the document pass (``dedup.exact_dedup``:
    xxhash64 shuffle keys, bodies never shuffle, collision re-check),
    so the scale properties are identical; the composite
    (doc_id, chunk_id) key rides through it encoded in one long."""
    ch = chunk_documents(docs, chunk=chunk, overlap=0, text_col=text_col, id_col=id_col)
    enc = ch.select(
        (F.col("doc_id") * _CHUNK_RADIX + F.col("chunk_id")).alias("cid"),
        "chunk_text",
    )
    out = exact_dedup(enc, text_col="chunk_text", id_col="cid")
    return out.select(
        F.floor(F.col("canonical_id") / _CHUNK_RADIX).cast("long").alias("doc_id"),
        (F.col("canonical_id") % _CHUNK_RADIX).cast("int").alias("chunk_id"),
        "n_copies",
    )
