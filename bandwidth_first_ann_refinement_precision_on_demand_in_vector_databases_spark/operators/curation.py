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

Near-dup policy: a canonical document is dropped iff it near-matches
(Jaccard ≥ τ via MinHash banding) some *smaller-id* canonical
document. Pair emission already guarantees ``id_a < id_b``, so the
policy is one distinct + left-anti join — deterministic,
SQL-replayable, no transitive-closure iteration (greedy chain
collapse is a separate offline pass at production scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import predicted_lang, quality_score, token_count
from .dedup import exact_dedup, minhash_lsh_pairs

QUALITY_MIN = 0.5  #: keep + borderline buckets (registry_text thresholds)


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
    # so banding never wastes candidates on identical texts)
    pairs = minhash_lsh_pairs(
        canon, n=shingle_n, threshold=jaccard_tau, text_col="text", id_col="doc_id"
    )
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = canon.join(drop, "doc_id", "left_anti")
    return kept.select(
        "doc_id",
        "n_tokens",
        F.round("__q", 6).alias("quality"),
        "pred_lang",
        "n_copies",
    )
