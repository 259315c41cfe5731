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


def test_audio_window_energy_hand_check(spark):
    """Framing and energy match a hand computation on a crafted payload;
    only audio assets are framed."""
    from catalog_pii_scanner_spark.operators.multimodal import (
        audio_window_energy)
    # asset 1 -> audio (id % 3 == 1): 10 bytes, window 4 -> lens 4,4,2
    payload = bytes([0, 255, 10, 20, 30, 40, 50, 60, 70, 80])
    assets = spark.createDataFrame(
        [(1, payload, "audio/wav", len(payload)),
         (2, payload, "video/mp4", len(payload))],
        "asset_id bigint, media binary, media_type string, n_bytes bigint")
    rows = sorted(audio_window_energy(assets, window=4).collect(),
                  key=lambda r: r.window_no)
    assert [r.asset_id for r in rows] == [1, 1, 1]   # video not framed
    assert [r.win_len for r in rows] == [4, 4, 2]
    assert [r.byte_sum for r in rows] == [285, 180, 150]
    import math
    for r, (s, n) in zip(rows, [(285, 4), (180, 4), (150, 2)]):
        assert r.energy == math.floor(s / (n * 255.0) * 1e6 + 0.5) / 1e6
