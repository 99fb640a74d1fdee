"""Multimodal plumbing (SURVEY §7-M5): schema, routing, Arrow batch
shapes, the deterministic fake decoder, and the real-codec pipeline
(payload synthesis, magic-byte routing, decode invariants)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_audio,
    decode_image,
    extract_features,
    fake_decode,
    media_table,
    resize_plan,
    sample_frames,
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


def test_fake_decode_deterministic_and_shaped():
    a = fake_decode(b"hello world payload bytes")
    b = fake_decode(b"hello world payload bytes")
    assert a.shape == (FEATURE_DIM,) and a.dtype == np.float32
    assert np.array_equal(a, b)
    assert fake_decode(b"").tolist() == [0.0] * FEATURE_DIM
    assert (a >= 0).all() and (a <= 1).all()


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
    docs = load_table(spark, sf_small, "documents").limit(20)
    media = media_table(docs)
    out = extract_features(media).collect()
    src = {r.doc_id: r for r in docs.collect()}
    assert len(out) == len(src)
    for r in out:
        payload = src[r.doc_id].text.encode("utf-8")
        assert r.n_bytes == len(payload)
        expected = fake_decode(payload)
        assert np.allclose(np.array(r.feature, dtype=np.float32), expected)
        if r.media_type == "video":
            dur = (r.doc_id % 30 + 1) / 2.0
            assert r.frames_sampled == sample_frames(dur)
        else:
            assert r.frames_sampled == 1


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
