"""Multimodal binary-column plumbing: schema, Arrow batch shape, fake
decoder determinism, frame fan-out; the real decoder is an explicit stub."""

from __future__ import annotations

import pytest

from catalog_pii_scanner_spark.operators.multimodal import (
    N_FEATURES, decode_image, extract_features, frame_sample, media_assets)


@pytest.fixture(scope="module")
def assets(spark, sf_dir):
    return media_assets(spark, sf_dir)


def test_assets_schema(assets):
    schema = {f.name: f.dataType.simpleString() for f in assets.schema}
    assert schema["media"] == "binary"
    assert schema["meta"].startswith("map<string,string")
    assert assets.count() > 0


def test_fake_feature_extraction_deterministic(assets):
    f1 = {r.asset_id: r.features
          for r in extract_features(assets).collect()}
    f2 = {r.asset_id: r.features
          for r in extract_features(assets).collect()}
    assert f1 == f2
    any_vec = next(iter(f1.values()))
    assert len(any_vec) == N_FEATURES
    assert all(0.0 <= v <= 1.0 for v in any_vec)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_frame_sample_fanout(assets):
    frames = frame_sample(assets, every=100, frame_bytes=32)
    rows = frames.collect()
    assert rows
    by_asset: dict[int, list] = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    one = next(iter(by_asset.values()))
    assert [r.frame_no for r in sorted(one, key=lambda r: r.frame_no)] == \
        list(range(len(one)))
    assert all(r.frame_size <= 32 for r in rows)


def test_resize_media_byte_exact(assets):
    """The stride-subsample fake codec is byte-exact: resized ==
    media[::ceil(n/target)] whenever n > target, identity otherwise, and
    never exceeds the target size."""
    from catalog_pii_scanner_spark.operators.multimodal import resize_media
    target = 16
    rows = resize_media(assets, target_bytes=target).collect()
    originals = {r.asset_id: bytes(r.media) for r in assets.collect()}
    assert rows
    for r in rows:
        b = originals[r.asset_id]
        if len(b) <= target:
            expect = b
        else:
            stride = -(-len(b) // target)
            expect = b[::stride]
        assert bytes(r.resized) == expect, r.asset_id
        assert r.resized_bytes == len(expect) <= target or len(b) <= target
