"""Multimodal query suite (SURVEY §7-M5). ``media_metadata`` is the
metadata-only scan (payload column pruned, the point of the layout);
``media_decode`` and ``media_features`` exercise the Arrow-batched
real-codec pipeline — both decode genuine BMP/WAV/FSEQ containers with
the pure-stdlib parsers, and both have exact DuckDB oracles because
the synthesized payload content is a closed-form function of doc_id."""

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
    """Arrow-batched real-decode → feature pipeline: synthesize
    genuine BMP/WAV/FSEQ payloads, decode them with the pure-stdlib
    parsers, and featurize the decoded pixels / samples (channel
    moments + gray histogram; per-band amplitude stats). Emitted in
    long scalar form — one row per (doc, feature position) — because
    the driver's value canonicalizer cannot hash ARRAY cells. The
    oracle replays the feature statistics in closed form from doc_id
    with the same formula shape (exact integer sums, correctly-rounded
    IEEE division, float32 quantization replayed via CAST(.. AS
    REAL)), so the hash match is bit-exact."""
    media = media_binary_table(load_table(spark, sf_dir, "documents"))
    out = extract_features(media, frame_every=2)
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
        F.round(F.col("feature_value").cast("double"), 6).alias("feature_value"),
    )


# Mirrors _synth_payload + feature_vector (operators/multimodal.py):
# payload content is closed-form in doc_id — image channels are
# constant (r, g, b), audio is a constant-amplitude block, video frame
# j is the constant base+j and the every-2nd sampler sees v_j = base+2j
# for j < fd. Feature layout: pixels → [meanRGB, stdRGB, min, max,
# hist8 of (R+G+B)//3 // 32]; audio → [8×band mean-abs, 8×band rms].
# Constant-channel images make the stds 0 and the histogram one-hot;
# the video mean telescopes to base+fd-1 and E[x²] is replayed per
# sampled frame. The kernel's float32 output is replayed via
# CAST(.. AS REAL) before the shared round(…, 6).
SQL_MEDIA_FEATURES = """
WITH d AS (
  SELECT doc_id, CAST(doc_id % 3 AS INT) AS kind,
         doc_id % 200 AS base,
         (doc_id % 8) + 2 AS nf,
         ((doc_id % 8) + 1) // 2 + 1 AS fd,
         doc_id % 256 AS r, (doc_id * 7) % 256 AS g, (doc_id * 13) % 256 AS b,
         (doc_id % 1000) * 16 AS amp,
         (doc_id % 10 + 1) * 800 AS nsamp,
         (doc_id % 8 + 1) * 8 AS w, (doc_id % 4 + 1) * 8 AS h
  FROM documents
),
vframes AS (
  SELECT d.doc_id, d.base + 2 * j.j AS v, d.fd
  FROM d, (SELECT unnest(generate_series(0, 4)) AS j) j
  WHERE d.kind = 2 AND j.j < d.fd
),
vstat AS (
  SELECT doc_id, avg(CAST(v * v AS DOUBLE)) AS e2 FROM vframes GROUP BY doc_id
),
vhist AS (
  SELECT doc_id, v // 32 AS bin, count(*) AS c FROM vframes GROUP BY doc_id, bin
),
p AS (SELECT CAST(unnest(generate_series(0, 15)) AS INT) AS pos)
SELECT d.doc_id,
  ['image', 'audio', 'video'][d.kind + 1] AS media_type,
  CAST(CASE d.kind WHEN 0 THEN 54 + 3 * d.w * d.h
                   WHEN 1 THEN 44 + 2 * d.nsamp
                   ELSE 8 + 826 * d.nf END AS INT) AS n_bytes,
  CAST(CASE d.kind WHEN 0 THEN 1 WHEN 1 THEN 0 ELSE d.fd END AS INT)
    AS frames_sampled,
  p.pos,
  round(CAST(CAST(CASE d.kind
    WHEN 0 THEN CASE
      WHEN p.pos = 0 THEN d.r / 255.0
      WHEN p.pos = 1 THEN d.g / 255.0
      WHEN p.pos = 2 THEN d.b / 255.0
      WHEN p.pos <= 5 THEN 0.0
      WHEN p.pos = 6 THEN least(d.r, d.g, d.b) / 255.0
      WHEN p.pos = 7 THEN greatest(d.r, d.g, d.b) / 255.0
      ELSE CASE WHEN (d.r + d.g + d.b) // 3 // 32 = p.pos - 8
                THEN 1.0 ELSE 0.0 END END
    WHEN 1 THEN d.amp / 32768.0
    ELSE CASE
      WHEN p.pos <= 2 THEN (d.base + d.fd - 1) / 255.0
      WHEN p.pos <= 5 THEN sqrt(greatest(
          vstat.e2 - CAST((d.base + d.fd - 1) * (d.base + d.fd - 1) AS DOUBLE),
          0.0)) / 255.0
      WHEN p.pos = 6 THEN d.base / 255.0
      WHEN p.pos = 7 THEN (d.base + 2 * (d.fd - 1)) / 255.0
      ELSE CAST(coalesce(vhist.c, 0) AS DOUBLE) / d.fd END
    END AS REAL) AS DOUBLE), 6) AS feature_value
FROM d
CROSS JOIN p
LEFT JOIN vstat ON vstat.doc_id = d.doc_id
LEFT JOIN vhist ON vhist.doc_id = d.doc_id AND vhist.bin = p.pos - 8
"""


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
    "media_features": SQL_MEDIA_FEATURES,
    "media_decode": SQL_MEDIA_DECODE,
}
