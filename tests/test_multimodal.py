"""Multimodal plumbing (SURVEY §7-M5): schema, routing, Arrow batch
shapes, and the real-codec pipeline (payload synthesis, magic-byte
routing, decode invariants, features of DECODED content)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.functions.codecs import (
    encode_bmp,
    encode_fseq,
    encode_wav,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.multimodal import (
    FEATURE_DIM,
    audio_features,
    decode_audio,
    decode_image,
    extract_features,
    feature_vector,
    media_binary_table,
    media_table,
    pixel_features,
    resize_plan,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
)


def test_codec_kernels_reject_unknown_formats():
    """The real parsers fail loudly on formats they don't speak
    instead of producing garbage features."""
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n garbage")
    with pytest.raises(ValueError):
        decode_audio(b"OggS not a wav")


def test_pixel_features_of_known_gradient_bmp():
    """Features of a NON-constant image match an independent NumPy
    computation: a 4x8 horizontal gradient with distinct channels."""
    rng = np.arange(32, dtype=np.uint8).reshape(4, 8)
    px = np.stack([rng * 3, rng * 5, rng * 7], axis=-1).astype(np.uint8)
    got = feature_vector(encode_bmp(px))[0]
    flat = px.reshape(-1, 3).astype(np.float64)
    exp_mean = flat.mean(axis=0) / 255.0
    exp_std = flat.std(axis=0) / 255.0  # population std, independent form
    gray = flat.astype(np.int64).sum(axis=1) // 3
    hist = np.bincount(gray // 32, minlength=8) / flat.shape[0]
    expected = np.concatenate(
        [exp_mean, exp_std, [flat.min() / 255.0, flat.max() / 255.0], hist]
    )
    assert got.shape == (FEATURE_DIM,) and got.dtype == np.float32
    assert np.allclose(got, expected, atol=1e-6)


def test_audio_features_of_known_ramp_wav():
    """Features of a NON-constant waveform match an independent NumPy
    computation: a signed ramp crossing zero, 160 samples = 8 bands
    of 20."""
    samples = (np.arange(160, dtype=np.int64) * 37 - 2000).astype(np.int16)
    got = feature_vector(encode_wav(samples))[0]
    bands = samples.astype(np.float64).reshape(8, 20)
    exp = np.concatenate(
        [np.abs(bands).mean(axis=1) / 32768.0,
         np.sqrt((bands**2).mean(axis=1)) / 32768.0]
    )
    assert got.shape == (FEATURE_DIM,) and got.dtype == np.float32
    assert np.allclose(got, exp, atol=1e-6)


def test_video_features_sample_every_second_frame():
    """FSEQ features cover only the sampled frames (every 2nd) and
    equal the pixel features of those frames stacked."""
    frames = [
        np.full((4, 4, 3), 10 * (j + 1), dtype=np.uint8) for j in range(5)
    ]
    feats, n_sampled = feature_vector(encode_fseq(frames), frame_every=2)
    assert n_sampled == 3  # frames 0, 2, 4
    stacked = np.stack([frames[0], frames[2], frames[4]])
    assert np.array_equal(feats, pixel_features(stacked))
    # mean of {10, 30, 50} = 30 → 30/255 in every channel
    assert np.allclose(feats[:3], 30.0 / 255.0, atol=1e-6)


def test_feature_kernels_edge_cases():
    assert pixel_features(np.zeros((0, 3), dtype=np.uint8)).tolist() == [0.0] * FEATURE_DIM
    assert audio_features(np.array([], dtype=np.int16)).tolist() == [0.0] * FEATURE_DIM
    with pytest.raises(ValueError):
        feature_vector(b"\x89PNG\r\n\x1a\n not a payload")


def test_media_table_schema_and_routing(spark, sf_small):
    media = media_table(load_table(spark, sf_small, "documents"))
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "media_type": "string",
        "payload": "binary",
        "width": "int",
        "height": "int",
        "duration_s": "double",
    }
    rows = media.select("doc_id", "media_type").collect()
    assert rows and all(
        r.media_type == ("image", "audio", "video")[r.doc_id % 3] for r in rows
    )


def test_extract_features_matches_local_decode(spark, sf_small):
    """The distributed stage reproduces the local kernel exactly: for
    each row, decode the same payload locally and compare features,
    byte counts and frame-sample counts."""
    docs = load_table(spark, sf_small, "documents").limit(20)
    media = media_binary_table(docs)
    src = {r.doc_id: r.payload for r in media.collect()}
    out = extract_features(media, frame_every=2).collect()
    assert len(out) == len(src)
    for r in out:
        payload = bytes(src[r.doc_id])
        assert r.n_bytes == len(payload)
        expected, exp_frames = feature_vector(payload, frame_every=2)
        assert np.array_equal(np.array(r.feature, dtype=np.float32), expected)
        assert r.frames_sampled == exp_frames
        if r.media_type == "image":
            assert exp_frames == 1
        elif r.media_type == "audio":
            assert exp_frames == 0
        else:
            assert exp_frames >= 1


def test_resize_plan_clamps_long_side(spark, sf_small):
    media = media_table(load_table(spark, sf_small, "documents"))
    import math

    for r in resize_plan(media, max_side=128).collect():
        assert max(r.out_width, r.out_height) <= 128
        scale = min(1.0, 128.0 / max(r.width, r.height))
        assert (r.out_width, r.out_height) == (
            math.floor(r.width * scale),
            math.floor(r.height * scale),
        )


def test_payload_pruned_from_metadata_scan(spark, sf_small):
    """The metadata projection must not read the payload column —
    the multimodal analog of the two-phase bandwidth saving."""
    media = media_table(load_table(spark, sf_small, "documents"))
    df = media.select("doc_id", "media_type", "width")
    phys = df._jdf.queryExecution().executedPlan().toString()
    read_schema = phys.split("ReadSchema:")[-1].splitlines()[0]
    assert "text" not in read_schema, read_schema
