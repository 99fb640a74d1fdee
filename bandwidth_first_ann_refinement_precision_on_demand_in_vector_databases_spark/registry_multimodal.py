"""Multimodal query suite (SURVEY §7-M5). ``media_metadata`` is the
SQL-expressible face (metadata-only scan — payload column pruned, the
point of the layout); ``media_features`` exercises the Arrow-batched
decode plumbing and is declared rows-only (deterministic fake decode
is not SQL-expressible)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.multimodal import extract_features, media_table, resize_plan
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
    byte-fold fake decoder has no SQL form)."""
    media = media_table(load_table(spark, sf_dir, "documents"))
    out = extract_features(media)
    return out.select(
        "doc_id",
        "media_type",
        "n_bytes",
        F.transform("feature", lambda v: F.round(v, 6)).alias("feature"),
        "frames_sampled",
    )


MULTIMODAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "media_metadata": q_media_metadata,
    "media_features": q_media_features,
}

MULTIMODAL_ORACLES: dict[str, str] = {
    "media_metadata": SQL_MEDIA_METADATA,
    # media_features: mapInPandas fake decode → rows-only
}
