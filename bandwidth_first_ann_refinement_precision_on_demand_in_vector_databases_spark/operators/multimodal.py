"""Multimodal column handling (SURVEY §7-M5; north-star LLM-pipeline
ops). The reference is numeric-only; this module adds the Spark-side
plumbing a 100 TB multimodal pipeline needs: opaque ``binary`` payload
columns with typed metadata, and Arrow-batched ``mapInPandas``
decode / feature-extract / resize / frame-sample stages.

Two payload families coexist:

* ``media_table`` — payload is the document text as UTF-8 bytes with
  typed metadata; drives the metadata-only scan query
  (``media_metadata``);
* ``media_binary_table`` — payload is a *real container format*
  synthesized per row (24-bit BMP for images, PCM16 WAV for audio, an
  FSEQ frame sequence for video; see ``functions/codecs.py``), and
  ``decode_media`` / ``extract_features`` route on the payload magic
  bytes and run the real parsers. Payload content is a closed-form
  function of ``doc_id``, so both the decoded invariants (dimensions,
  sample counts, integer pixel sums, peak amplitude) and the decoded
  feature statistics have an exact DuckDB oracle.

Both fixture families derive from ``documents`` — every engine at
every scale factor sees identical media rows without a binary fixture
file.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.codecs import (
    BMP_MAGIC,
    FSEQ_MAGIC,
    RIFF_MAGIC,
    WAV_SAMPLE_RATE,
    decode_bmp,
    decode_fseq,
    decode_wav,
    encode_bmp,
    encode_fseq,
    encode_wav,
)

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
    """Real image decode: 24-bit uncompressed BMP → (H, W, 3) uint8
    RGB. Pure numpy/struct parser (``functions/codecs.py``); swap in
    ``PIL.Image.open`` here for broader format coverage."""
    return decode_bmp(payload)


def decode_audio(payload: bytes) -> np.ndarray:
    """Real audio decode: PCM16 mono WAV → int16 sample array via the
    stdlib ``wave`` parser. Swap in ``soundfile``/ffmpeg here for
    compressed formats."""
    samples, _rate = decode_wav(payload)
    return samples


def sample_frames(duration_s: float, fps: float = 0.5) -> int:
    """Frame-sampling plan for video: how many frames a decode at
    ``fps`` would pull. Deterministic metadata-only arithmetic."""
    return max(1, int(duration_s * fps))


# ---------------------------------------------------------------------------
# Feature kernels over DECODED content
# ---------------------------------------------------------------------------

def pixel_features(px: np.ndarray) -> np.ndarray:
    """16-dim feature vector of an ``(..., 3)`` uint8 pixel array, all
    components scaled to [0, 1]:

    ``[mean_R, mean_G, mean_B, std_R, std_G, std_B, min, max,
    hist_0..hist_7]`` where the histogram buckets the per-pixel
    integer gray level ``(R+G+B)//3`` into 8 bins of width 32.

    Moments use the ``sqrt(E[x^2] - E[x]^2)`` population form with
    exact integer sums so the DuckDB oracle (same formula shape over
    the closed-form fixture content) is bit-identical."""
    ch = px.reshape(-1, 3).astype(np.int64)
    n = ch.shape[0]
    if n == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    mean = ch.sum(axis=0) / n
    e2 = (ch * ch).sum(axis=0) / n
    std = np.sqrt(np.maximum(e2 - mean * mean, 0.0))
    gray = ch.sum(axis=1) // 3
    hist = np.bincount(gray >> 5, minlength=8).astype(np.float64) / n
    out = np.concatenate(
        [mean / 255.0, std / 255.0,
         [ch.min() / 255.0, ch.max() / 255.0], hist]
    )
    return out.astype(np.float32)


def audio_features(samples: np.ndarray, bands: int = 8) -> np.ndarray:
    """16-dim feature vector of an int16 sample array: per-band mean
    absolute amplitude (``bands`` equal time slices) followed by
    per-band RMS, all scaled by 1/32768 into [0, 1]."""
    x = np.asarray(samples, dtype=np.int64)
    if x.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    mean_abs, rms = [], []
    for band in np.array_split(x, bands):
        if band.size == 0:
            mean_abs.append(0.0)
            rms.append(0.0)
            continue
        a = np.abs(band)
        mean_abs.append(a.sum() / band.size / 32768.0)
        rms.append(np.sqrt((band * band).sum() / band.size) / 32768.0)
    return np.asarray(mean_abs + rms, dtype=np.float32)


def feature_vector(payload: bytes, frame_every: int = 2) -> tuple[np.ndarray, int]:
    """Decode a payload with the real parser its magic bytes select
    and featurize the decoded content. Returns ``(features,
    frames_sampled)`` where frames_sampled is 1 for images, 0 for
    audio, and the number of actually-decoded frames for video
    (every ``frame_every``-th frame; skipped frames are never
    decoded)."""
    head = bytes(payload[:4])
    if head[:2] == BMP_MAGIC:
        return pixel_features(decode_bmp(payload)), 1
    if head == RIFF_MAGIC:
        samples, _rate = decode_wav(payload)
        return audio_features(samples), 0
    if head == FSEQ_MAGIC:
        frames = decode_fseq(payload, every=frame_every)
        return pixel_features(np.stack(frames)), len(frames)
    raise ValueError(f"unknown payload magic {head!r}")


# ---------------------------------------------------------------------------
# Pipeline stages (mapInPandas)
# ---------------------------------------------------------------------------

def extract_features(media: DataFrame, frame_every: int = 2) -> DataFrame:
    """Arrow-batched feature extraction over the payload column: route
    each payload on its magic bytes to the real BMP / WAV / FSEQ
    parser and featurize the DECODED pixels / samples (per-channel
    moments + gray histogram for images and sampled video frames,
    per-band amplitude stats for audio — see ``pixel_features`` /
    ``audio_features``). Partition-preserving (no shuffle): each
    executor decodes its own partitions; at 100 TB this is the
    dominant compute stage and scales linearly with partitions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            decoded = [feature_vector(p, frame_every) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feature": [d[0] for d in decoded],
                    "frames_sampled": [d[1] for d in decoded],
                }
            )

    return media.select(
        "doc_id", "media_type", "payload"
    ).mapInPandas(run, schema=FEATURE_SCHEMA)


BINARY_MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, "
    "width int, height int, n_frames int, n_samples bigint"
)
DECODED_SCHEMA = (
    "doc_id bigint, media_type string, dec_width int, dec_height int, "
    "n_samples bigint, sample_rate int, frames_decoded int, "
    "px_sum bigint, amp int"
)

#: video fixtures use fixed 16x16 frames
_FRAME_SIDE = 16


def _synth_payload(doc_id: int) -> tuple[str, bytes, int, int, int, int]:
    """Synthesize one real-format payload, a closed-form function of
    doc_id. Returns (media_type, payload, width, height, n_frames,
    n_samples). Content formulas are mirrored by the ``media_decode``
    DuckDB oracle — keep the two in sync."""
    kind = doc_id % 3
    if kind == 0:  # image: constant-channel BMP
        w, h = (doc_id % 8 + 1) * 8, (doc_id % 4 + 1) * 8
        px = np.empty((h, w, 3), dtype=np.uint8)
        px[:, :, 0] = doc_id % 256
        px[:, :, 1] = (doc_id * 7) % 256
        px[:, :, 2] = (doc_id * 13) % 256
        return "image", encode_bmp(px), w, h, 1, 0
    if kind == 1:  # audio: constant-amplitude PCM16 WAV
        n = (doc_id % 10 + 1) * 800
        amp = (doc_id % 1000) * 16
        samples = np.full(n, amp, dtype=np.int16)
        return "audio", encode_wav(samples), 0, 0, 0, n
    # video: FSEQ of constant-value frames (value = base + frame idx)
    nf = (doc_id % 8) + 2
    base = doc_id % 200
    frames = [
        np.full((_FRAME_SIDE, _FRAME_SIDE, 3), base + j, dtype=np.uint8)
        for j in range(nf)
    ]
    return "video", encode_fseq(frames), _FRAME_SIDE, _FRAME_SIDE, nf, 0


def media_binary_table(docs: DataFrame) -> DataFrame:
    """Derive the real-format media table: each row's payload is a
    genuine BMP / WAV / FSEQ container synthesized from doc_id alone.
    Arrow-batched and partition-preserving — at scale the encode (like
    the decode) runs where the rows live, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = [_synth_payload(int(d)) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": [r[0] for r in rows],
                    "payload": [r[1] for r in rows],
                    "width": [r[2] for r in rows],
                    "height": [r[3] for r in rows],
                    "n_frames": [r[4] for r in rows],
                    "n_samples": [r[5] for r in rows],
                }
            )

    return docs.select("doc_id").mapInPandas(run, schema=BINARY_MEDIA_SCHEMA)


def decode_media(media: DataFrame, frame_every: int = 2) -> DataFrame:
    """Real decode stage: route each payload on its magic bytes to the
    matching parser (BMP / WAV / FSEQ), then emit exact integer
    invariants of the decoded content — dimensions, sample count and
    rate, frames decoded (video samples every ``frame_every``-th frame
    without decoding the skipped ones), total pixel sum, and peak
    amplitude. Integer outputs make the stage oracle-checkable with no
    float-rounding hazards. Partition-preserving mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {k: [] for k in (
                "doc_id", "media_type", "dec_width", "dec_height",
                "n_samples", "sample_rate", "frames_decoded", "px_sum", "amp",
            )}
            for doc_id, mt, payload in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                head = bytes(payload[:4])
                if head[:2] == BMP_MAGIC:
                    img = decode_bmp(payload)
                    h, w = img.shape[:2]
                    vals = (w, h, 0, 0, 1, int(img.sum(dtype=np.int64)), 0)
                elif head == RIFF_MAGIC:
                    samples, rate = decode_wav(payload)
                    vals = (
                        0, 0, len(samples), rate, 0, 0,
                        int(np.abs(samples.astype(np.int32)).max(initial=0)),
                    )
                elif head == FSEQ_MAGIC:
                    frames = decode_fseq(payload, every=frame_every)
                    h, w = frames[0].shape[:2]
                    vals = (
                        w, h, 0, 0, len(frames),
                        int(sum(f.sum(dtype=np.int64) for f in frames)), 0,
                    )
                else:
                    raise ValueError(f"unknown payload magic {head!r}")
                for k, v in zip(
                    ("dec_width", "dec_height", "n_samples", "sample_rate",
                     "frames_decoded", "px_sum", "amp"),
                    vals,
                ):
                    out[k].append(v)
                out["doc_id"].append(int(doc_id))
                out["media_type"].append(mt)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


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
