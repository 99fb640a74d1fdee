"""Multimodal column handling (SURVEY §7-M5; north-star LLM-pipeline
ops). The reference is numeric-only; this module adds the Spark-side
plumbing a 100 TB multimodal pipeline needs: opaque ``binary`` payload
columns with typed metadata, and Arrow-batched ``mapInPandas``
decode / feature-extract / resize / frame-sample stages.

The container has no image/audio codecs, so the *decode kernels* are
deliberately split from the *plumbing*:

* plumbing (REAL, tested): schemas, media-type routing, Arrow batch
  iteration, deterministic feature extraction from raw bytes,
  partition-preserving output shapes;
* codecs (STUBBED): ``decode_image``/``decode_audio`` raise
  ``NotImplementedError`` with the library that would back them —
  swap-in points for PIL/ffmpeg — while ``fake_decode`` provides the
  deterministic stand-in the tests pin.

The media fixture is derived from ``documents`` (payload = UTF-8
bytes of the text; type/width/height/duration seeded from doc_id), so
every engine at every scale factor sees identical media rows without
a binary fixture file.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_TYPES = ("image", "audio", "video")
FEATURE_DIM = 16

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "width int, height int, duration_s double"
)
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, "
    "feature array<float>, frames_sampled int"
)


def media_table(docs: DataFrame) -> DataFrame:
    """Derive the synthetic media table: payload is the document text
    as bytes; metadata is a deterministic function of doc_id. At scale
    this column layout (metadata columns + one fat binary column) is
    what Parquet needs for metadata-only scans to skip payload I/O —
    the multimodal analog of the reference's two-phase fetch."""
    mt = F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        ((F.col("doc_id") % 8 + 1) * 64).cast("int").alias("width"),
        ((F.col("doc_id") % 4 + 1) * 64).cast("int").alias("height"),
        ((F.col("doc_id") % 30 + 1).cast("double") / 2.0).alias("duration_s"),
    )


# ---------------------------------------------------------------------------
# Decode kernels
# ---------------------------------------------------------------------------

def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode — requires an imaging library not present in
    this container. Swap-in point for ``PIL.Image.open``."""
    raise NotImplementedError("image decode requires PIL/opencv; use fake_decode")


def decode_audio(payload: bytes) -> np.ndarray:
    """Real audio decode — swap-in point for ``soundfile``/ffmpeg."""
    raise NotImplementedError("audio decode requires soundfile/ffmpeg; use fake_decode")


def fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in decoder: folds the payload bytes into a
    ``dim``-length float32 vector (mean of each byte stripe, scaled to
    [0, 1]). Pure function of the bytes — reproducible everywhere."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    pad = (-arr.size) % dim
    arr = np.pad(arr, (0, pad)).reshape(-1, dim)
    return (arr.mean(axis=0) / 255.0).astype(np.float32)


def sample_frames(duration_s: float, fps: float = 0.5) -> int:
    """Frame-sampling plan for video: how many frames a decode at
    ``fps`` would pull. Deterministic metadata-only arithmetic."""
    return max(1, int(duration_s * fps))


# ---------------------------------------------------------------------------
# Pipeline stages (mapInPandas)
# ---------------------------------------------------------------------------

def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.
    Partition-preserving (no shuffle): each executor decodes its own
    partitions; at 100 TB this is the dominant compute stage and
    scales linearly with partitions. Videos also record the frame
    sample count their decode would use."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [fake_decode(p, dim) for p in pdf["payload"]]
            frames = [
                sample_frames(d) if t == "video" else 1
                for t, d in zip(pdf["media_type"], pdf["duration_s"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feature": feats,
                    "frames_sampled": frames,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_plan(media: DataFrame, max_side: int = 128) -> DataFrame:
    """Resize stage, metadata part: target dimensions preserving
    aspect ratio with the long side clamped to ``max_side``. Pure
    Column arithmetic — the pixel resample itself would live in the
    (stubbed) decode kernel."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest("width", "height").cast("double"),
    )
    return media.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("out_width"),
        F.floor(F.col("height") * scale).cast("int").alias("out_height"),
    )
