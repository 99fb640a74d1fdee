"""Pure-stdlib media codecs: encode/decode round-trips, frame
sampling, and the decode invariants the ``media_decode`` oracle pins."""

from __future__ import annotations

import numpy as np
import pytest

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.functions.codecs import (
    decode_bmp,
    decode_fseq,
    decode_wav,
    encode_bmp,
    encode_fseq,
    encode_wav,
    fseq_frame_count,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.multimodal import (
    _synth_payload,
    decode_audio,
    decode_image,
)


@pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (8, 5), (64, 32)])
def test_bmp_roundtrip(w, h):
    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = decode_bmp(encode_bmp(px))
    np.testing.assert_array_equal(out, px)


def test_bmp_row_padding_is_real():
    # w=3 -> 9-byte rows padded to 12; a decoder ignoring padding
    # would shear the image
    px = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    np.testing.assert_array_equal(decode_bmp(encode_bmp(px)), px)


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        decode_bmp(b"PNG\x00garbage")


def test_wav_roundtrip():
    samples = (np.sin(np.linspace(0, 20, 1600)) * 12000).astype(np.int16)
    out, rate = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000
    np.testing.assert_array_equal(out, samples)


def test_fseq_frame_sampling_skips_decode():
    frames = [
        np.full((4, 4, 3), j, dtype=np.uint8) for j in range(7)
    ]
    payload = encode_fseq(frames)
    assert fseq_frame_count(payload) == 7
    sampled = decode_fseq(payload, every=2)
    assert [int(f[0, 0, 0]) for f in sampled] == [0, 2, 4, 6]
    every3 = decode_fseq(payload, every=3)
    assert [int(f[0, 0, 0]) for f in every3] == [0, 3, 6]


def test_decode_image_audio_are_real():
    """The swap-point kernels parse real container bytes now."""
    px = np.full((2, 2, 3), 9, dtype=np.uint8)
    np.testing.assert_array_equal(decode_image(encode_bmp(px)), px)
    s = np.array([1, -2, 3], dtype=np.int16)
    np.testing.assert_array_equal(decode_audio(encode_wav(s)), s)


@pytest.mark.parametrize("doc_id", [0, 1, 2, 7, 100, 255, 4999])
def test_synth_payload_invariants(doc_id):
    mt, payload, w, h, nf, ns = _synth_payload(doc_id)
    if mt == "image":
        img = decode_bmp(payload)
        assert img.shape == (h, w, 3)
        expect = (
            (doc_id % 256) + (doc_id * 7) % 256 + (doc_id * 13) % 256
        ) * w * h
        assert int(img.sum(dtype=np.int64)) == expect
    elif mt == "audio":
        samples, rate = decode_wav(payload)
        assert rate == 8000 and len(samples) == ns
        assert int(np.abs(samples.astype(np.int32)).max()) == (doc_id % 1000) * 16
    else:
        assert fseq_frame_count(payload) == nf
        fd = (nf - 1) // 2 + 1
        frames = decode_fseq(payload, every=2)
        assert len(frames) == fd
        base = doc_id % 200
        total = sum(int(f.sum(dtype=np.int64)) for f in frames)
        assert total == 768 * (fd * base + fd * (fd - 1))
