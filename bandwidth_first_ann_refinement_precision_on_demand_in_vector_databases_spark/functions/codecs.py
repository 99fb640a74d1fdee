"""Pure-stdlib media codecs: real BMP image and WAV audio encode /
decode with no external libraries (numpy + ``struct`` + ``wave``).

These back the multimodal pipeline's decode stage (SURVEY §7-M5) so
the decode kernels are *real* parsers of *real* container formats —
not the deterministic byte-fold stand-in — while staying runnable in
a codec-less container. The formats:

* image: BMP, 24-bit uncompressed (BITMAPINFOHEADER), bottom-up rows
  with 4-byte row padding — the classic baseline bitmap every imaging
  library reads;
* audio: WAV, PCM16 mono (RIFF/WAVE ``fmt `` + ``data`` chunks) via
  the stdlib ``wave`` module;
* video: an ``FSEQ`` micro-container (magic + frame count + length-
  prefixed BMP frames) standing in for a real video container, so the
  frame-sampling stage demuxes and decodes actual per-frame images.

Encoders exist only to synthesize deterministic fixtures; the decode
direction is what the pipeline exercises. Everything is a pure
function of its inputs — identical bytes on every executor, every
scale factor, every run.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

BMP_MAGIC = b"BM"
RIFF_MAGIC = b"RIFF"
FSEQ_MAGIC = b"FSEQ"

WAV_SAMPLE_RATE = 8000


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an ``(H, W, 3)`` uint8 RGB array as a 24-bit BMP.

    Rows are written bottom-up in BGR order with rows padded to a
    multiple of 4 bytes, per the format spec."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8, got {px.shape}")
    h, w, _ = px.shape
    row_stride = (w * 3 + 3) & ~3
    img_size = row_stride * h
    # BGR, bottom-up, padded
    bgr = px[::-1, :, ::-1]
    rows = np.zeros((h, row_stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    header = struct.pack(
        "<2sIHHI", BMP_MAGIC, 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Parse a 24-bit uncompressed BMP into an ``(H, W, 3)`` uint8 RGB
    array. Validates magic, header size, bit depth and compression."""
    if payload[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    (hdr_size, w, h, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (hdr={hdr_size} bpp={bpp} comp={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * h, offset=data_offset
    ).reshape(h, row_stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


# ---------------------------------------------------------------------------
# WAV (PCM16 mono, stdlib `wave`)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Encode an int16 sample array as a mono PCM16 WAV file."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM16 WAV payload into ``(samples int16, sample_rate)``."""
    if payload[:4] != RIFF_MAGIC:
        raise ValueError("not a WAV payload (missing RIFF magic)")
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise ValueError("only PCM16 mono WAV is supported")
        rate = wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    return np.frombuffer(raw, dtype=np.int16).copy(), rate


# ---------------------------------------------------------------------------
# FSEQ frame-sequence micro-container (video stand-in)
# ---------------------------------------------------------------------------

def encode_fseq(frames: list[np.ndarray]) -> bytes:
    """Pack BMP-encoded frames into the FSEQ container:
    ``FSEQ | u32 n_frames | (u32 len | bmp bytes) * n``."""
    parts = [FSEQ_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        enc = encode_bmp(fr)
        parts.append(struct.pack("<I", len(enc)))
        parts.append(enc)
    return b"".join(parts)


def decode_fseq(payload: bytes, every: int = 1) -> list[np.ndarray]:
    """Demux FSEQ and decode every ``every``-th frame (frame sampling:
    the decoder *skips* non-sampled frames without decoding them, the
    property that makes frame-sampled video decode cheap)."""
    if payload[:4] != FSEQ_MAGIC:
        raise ValueError("not an FSEQ payload")
    n = struct.unpack_from("<I", payload, 4)[0]
    out: list[np.ndarray] = []
    off = 8
    for i in range(n):
        (ln,) = struct.unpack_from("<I", payload, off)
        off += 4
        if i % every == 0:
            out.append(decode_bmp(payload[off : off + ln]))
        off += ln
    return out


def fseq_frame_count(payload: bytes) -> int:
    """Header-only frame count — no frame decode."""
    if payload[:4] != FSEQ_MAGIC:
        raise ValueError("not an FSEQ payload")
    return struct.unpack_from("<I", payload, 4)[0]
