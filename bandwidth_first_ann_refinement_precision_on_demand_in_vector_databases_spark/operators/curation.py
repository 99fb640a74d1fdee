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


#: Bloom-filter geometry for the decontamination pre-filter: 2¹⁸
#: bits as 8192 words × 32 bits (shifts ≤ 31 — the cross-engine-safe
#: width, same rule as operators/bq; the bitmap broadcasts at 64 KiB),
#: K = 3 affine rows over the shared polynomial hash (the MinHash
#: permutation trick with its own constants). Sized at ≥13 bits per
#: element for the sf0.1 holdout (~20k distinct shingles) → expected
#: FPR < 1%; a first cut at 4096 bits saturated (measured 64% FPR) —
#: size M to the benchmark, always.
BLOOM_BITS = 262144
BLOOM_WORD = 32
BLOOM_K = 3
BLOOM_A = (131, 257, 521)
BLOOM_B = (17, 43, 89)


def bloom_decontaminate(
    docs: DataFrame,
    holdout: Column,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_shingles, n_bloom_hits, n_true_hits, n_false_pos):
    the Bloom-filter PRE-FILTER for benchmark decontamination, beside
    the exact truth. ``decontaminate`` ships every corpus shingle into
    a string semi join; here the holdout set is folded ONCE into a
    (BLOOM_BITS // BLOOM_WORD)-word broadcast bitmap (8192 words at
    the registered 2^18-bit geometry) and every corpus shingle is tested
    map-side with 3 integer hashes — the join-pruning shape Spark's
    own runtime Bloom filters apply, made explicit and measurable
    (no false negatives by construction; ``n_false_pos`` quantifies
    the one-sided error). At 100 TB the bitmap is O(M) bytes
    regardless of benchmark count and the probe never shuffles.

    The exact membership join is kept IN the query as the accounting
    ground truth (the ``*_recall`` convention); a production filter
    would drop it and keep only the bitmap test."""
    from ..functions.text import HASH_P, poly_hash

    corp = docs.where(~holdout)
    sh = shingle_index(corp, n, text_col, id_col).select(
        "id", "shingle", poly_hash(F.col("shingle")).alias("h")
    )
    bench = (
        shingle_index(docs.where(holdout), n, text_col, id_col)
        .select("shingle")
        .distinct()
        .persist()
    )
    pos = bench.select(
        poly_hash(F.col("shingle")).alias("h")
    ).select(
        F.explode(
            F.array(
                *[
                    (
                        (F.lit(BLOOM_A[k]) * F.col("h") + F.lit(BLOOM_B[k]))
                        % F.lit(HASH_P)
                        % F.lit(BLOOM_BITS)
                    )
                    for k in range(BLOOM_K)
                ]
            )
        ).alias("p")
    )
    bitmap = (
        pos.select(
            F.expr(f"CAST(p DIV {BLOOM_WORD} AS INT)").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BLOOM_WORD} AS INT))"
            ).alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("wbits"))
    )
    probe = sh
    cand = None
    for k in range(BLOOM_K):
        pk = f"(({BLOOM_A[k]} * h + {BLOOM_B[k]}) % {HASH_P}) % {BLOOM_BITS}"
        probe = probe.withColumn(
            f"w{k}", F.expr(f"CAST(({pk}) DIV {BLOOM_WORD} AS INT)")
        ).withColumn(
            f"m{k}",
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(({pk}) % {BLOOM_WORD} AS INT))"
            ),
        )
        bm = bitmap.select(
            F.col("word").alias(f"w{k}"), F.col("wbits").alias(f"wb{k}")
        )
        probe = probe.join(F.broadcast(bm), f"w{k}", "left")
        bit_set = (
            F.coalesce(F.col(f"wb{k}"), F.lit(0)).bitwiseAND(F.col(f"m{k}"))
            == F.col(f"m{k}")
        )
        cand = bit_set if cand is None else (cand & bit_set)
    marked = probe.join(
        F.broadcast(bench.withColumn("is_true", F.lit(1))), "shingle", "left"
    ).select(
        "id",
        cand.cast("int").alias("is_cand"),
        F.coalesce("is_true", F.lit(0)).alias("is_true"),
    )
    per_doc = marked.groupBy("id").agg(
        F.count("*").alias("n_shingles"),
        F.sum("is_cand").alias("n_bloom_hits"),
        F.sum("is_true").alias("n_true_hits"),
    )
    base = corp.select(F.col(id_col).alias("id"))
    return (
        base.join(per_doc, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
            F.coalesce("n_true_hits", F.lit(0)).alias("n_true_hits"),
            (
                F.coalesce("n_bloom_hits", F.lit(0))
                - F.coalesce("n_true_hits", F.lit(0))
            ).alias("n_false_pos"),
        )
    )
