"""Multimodal query suite (SURVEY §7-M5). ``media_metadata`` is the
SQL-expressible face (metadata-only scan — payload column pruned, the
point of the layout); ``media_features`` exercises the Arrow-batched
decode plumbing and is declared rows-only (deterministic fake decode
is not SQL-expressible)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.multimodal import (
    decode_media,
    extract_features,
    media_binary_table,
    media_table,
    resize_plan,
)
from .sources.fixtures import load_table


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata + resize plan over the derived media table.
    The payload column never reaches the projection — Catalyst prunes
    it out of the scan."""
    media = media_table(load_table(spark, sf_dir, "documents"))
    # single-projection plan: resize arithmetic inlined, no self-join
    scale = F.least(
        F.lit(1.0), F.lit(128.0) / F.greatest("width", "height").cast("double")
    )
    return media.select(
        "doc_id",
        "media_type",
        F.length("payload").alias("n_bytes"),
        "duration_s",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("out_width"),
        F.floor(F.col("height") * scale).cast("int").alias("out_height"),
    )


SQL_MEDIA_METADATA = """
WITH m AS (
  SELECT doc_id,
    ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
    CAST(length(text) AS INT) AS n_bytes,
    CAST((doc_id % 30 + 1) AS DOUBLE) / 2.0 AS duration_s,
    CAST((doc_id % 8 + 1) * 64 AS INT) AS width,
    CAST((doc_id % 4 + 1) * 64 AS INT) AS height
  FROM documents
)
SELECT doc_id, media_type, n_bytes, duration_s, width, height,
  CAST(floor(width  * least(1.0, 128.0 / greatest(width, height))) AS INT) AS out_width,
  CAST(floor(height * least(1.0, 128.0 / greatest(width, height))) AS INT) AS out_height
FROM m
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode → feature pipeline (rows-only check: the
    byte-fold fake decoder has no SQL form). Emitted in long scalar
    form — one row per (doc, feature position) — because the driver's
    value canonicalizer cannot hash ARRAY cells."""
    media = media_table(load_table(spark, sf_dir, "documents"))
    out = extract_features(media)
    return out.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "frames_sampled",
        F.posexplode("feature").alias("pos", "feature_value"),
    ).select(
        "doc_id",
        "media_type",
        "n_bytes",
        "frames_sampled",
        "pos",
        F.round("feature_value", 6).alias("feature_value"),
    )


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-codec pipeline: synthesize genuine BMP/WAV/FSEQ payloads,
    decode them with the pure-stdlib parsers, and emit exact integer
    invariants of the decoded content. The oracle reproduces the
    invariants in closed form from doc_id — any header mis-parse,
    row-order flip, padding slip or sample truncation in the codecs
    breaks the hash match."""
    media = media_binary_table(load_table(spark, sf_dir, "documents"))
    return decode_media(media, frame_every=2)


# Mirrors _synth_payload + decode_media (operators/multimodal.py):
# payload content is a closed-form function of doc_id, so the decoded
# invariants are SQL-predictable. fd = number of frames sampled at
# every-2nd = (nf - 1) // 2 + 1; video pixel value of frame j is
# base + j, so the sampled-frame pixel sum telescopes to
# 768 * (fd*base + fd*(fd-1)).
SQL_MEDIA_DECODE = """
SELECT doc_id,
  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
  CAST(CASE doc_id % 3 WHEN 0 THEN (doc_id % 8 + 1) * 8
                       WHEN 1 THEN 0 ELSE 16 END AS INT) AS dec_width,
  CAST(CASE doc_id % 3 WHEN 0 THEN (doc_id % 4 + 1) * 8
                       WHEN 1 THEN 0 ELSE 16 END AS INT) AS dec_height,
  CAST(CASE doc_id % 3 WHEN 1 THEN (doc_id % 10 + 1) * 800
                       ELSE 0 END AS BIGINT) AS n_samples,
  CAST(CASE doc_id % 3 WHEN 1 THEN 8000 ELSE 0 END AS INT) AS sample_rate,
  CAST(CASE doc_id % 3 WHEN 0 THEN 1
                       WHEN 1 THEN 0
                       ELSE ((doc_id % 8) + 1) // 2 + 1 END AS INT)
    AS frames_decoded,
  CAST(CASE doc_id % 3
    WHEN 0 THEN ((doc_id % 256) + ((doc_id * 7) % 256) + ((doc_id * 13) % 256))
                * (doc_id % 8 + 1) * 8 * (doc_id % 4 + 1) * 8
    WHEN 1 THEN 0
    ELSE 768 * ((((doc_id % 8) + 1) // 2 + 1) * (doc_id % 200)
                + (((doc_id % 8) + 1) // 2 + 1) * ((((doc_id % 8) + 1) // 2 + 1) - 1))
    END AS BIGINT) AS px_sum,
  CAST(CASE doc_id % 3 WHEN 1 THEN (doc_id % 1000) * 16 ELSE 0 END AS INT) AS amp
FROM documents
"""


MULTIMODAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "media_metadata": q_media_metadata,
    "media_features": q_media_features,
    "media_decode": q_media_decode,
}

MULTIMODAL_ORACLES: dict[str, str] = {
    "media_metadata": SQL_MEDIA_METADATA,
    # media_features: mapInPandas fake decode → rows-only
    "media_decode": SQL_MEDIA_DECODE,
}
