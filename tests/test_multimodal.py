"""Multimodal plumbing: schema/batch shape, determinism, codec stub."""

from __future__ import annotations

import pytest

from disco_spark import registry
from disco_spark.multimodal.binary_ops import (
    decode_media,
    extract_features,
    fake_decode,
    frame_sample,
    make_media_table,
    real_decode,
    resize,
)
from disco_spark.testing import compare_query
from tests.conftest import SF_SMOKE

registry.load_all()


def test_pixel_stats_oracle(spark):
    compare_query(spark, "multimodal_pixel_stats", SF_SMOKE)


def test_frame_sample_oracle(spark):
    compare_query(spark, "multimodal_frame_sample", SF_SMOKE)


@pytest.fixture()
def media(spark):
    docs = spark.createDataFrame([(1, "hello world"), (2, "spark engine")], "doc_id bigint, text string")
    return make_media_table(docs)


def test_media_schema(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,media_type:string,payload:binary,"
        "meta:struct<width:int,height:int,format:string>>"
    )
    rows = media.collect()
    assert all(len(r.payload) == 16 for r in rows)  # md5 digest bytes


def test_decode_deterministic(media):
    a = {r.media_id: r.pixels for r in decode_media(media).collect()}
    b = {r.media_id: r.pixels for r in decode_media(media).collect()}
    assert a == b
    assert all(len(v) == 16 and all(0 <= x <= 255 for x in v) for v in a.values())


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="codecs"):
        real_decode(b"\x00" * 16, "png")


def test_custom_decode_injected_end_to_end(media):
    """The codec seam contract: swapping in a different decoder is ONE
    callable — the whole downstream pipeline (Arrow pass, schema,
    feature extraction) works unchanged. This custom decoder inverts
    every byte, so features must match numpy over the inverted bytes."""
    import numpy as np

    def invert_decode(payload: bytes, fmt: str) -> np.ndarray:
        assert fmt == "fake8"  # metadata reaches the decoder intact
        return 255 - np.frombuffer(payload, dtype=np.uint8)

    feats = {
        r.media_id: r
        for r in extract_features(decode_media(media, decode=invert_decode)).collect()
    }
    raw = {r.media_id: r.payload for r in media.collect()}
    for mid, payload in raw.items():
        px = 255 - np.frombuffer(payload, dtype=np.uint8)
        f = feats[mid]
        assert f.n_px == 16
        assert f.min_px == int(px.min()) and f.max_px == int(px.max())
        assert abs(f.mean_px - round(float(px.astype("float64").mean()), 6)) < 1e-9


def test_resize_halves(media):
    decoded = decode_media(media)
    half = resize(decoded, 2).collect()
    assert all(len(r.pixels) == 8 for r in half)
    assert all(r.width == 2 for r in half)


def test_frame_sample_explodes(media):
    frames = frame_sample(media, frame_bytes=4, every=2).collect()
    # 16 bytes -> 4 frames -> every 2nd -> 2 frames per media, 2 medias
    assert len(frames) == 4
    assert {r.frame_idx for r in frames} == {0, 2}
    assert all(len(r.frame) == 4 for r in frames)


def test_feature_extraction_matches_numpy(media):
    import numpy as np

    feats = {r.media_id: r for r in extract_features(decode_media(media)).collect()}
    raw = {r.media_id: fake_decode(r.payload, "fake8") for r in media.collect()}
    for mid, px in raw.items():
        f = feats[mid]
        assert f.n_px == 16
        assert f.min_px == int(px.min()) and f.max_px == int(px.max())
        assert abs(f.mean_px - round(float(px.astype("float64").mean()), 6)) < 1e-9
