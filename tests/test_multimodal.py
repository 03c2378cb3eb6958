"""Multimodal plumbing tests (decode stubbed; Ray-side shape real)."""

from __future__ import annotations

import numpy as np
import pytest

from chronoxtract_ray.stages.multimodal import MediaDecoder, decode_media, frame_sample


@pytest.fixture(scope="module")
def media_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    items = [
        {
            "media_id": f"img-{i:03d}",
            "kind": "image",
            "payload": rng.integers(0, 256, rng.integers(200, 4000), dtype=np.uint8).tobytes(),
            "meta": '{"codec": "fake"}',
        }
        for i in range(20)
    ]
    return rd.from_items(items)


def test_decode_features_deterministic(media_ds):
    a = decode_media(media_ds, n_features=8).to_pandas().sort_values("media_id")
    b = decode_media(media_ds, n_features=8).to_pandas().sort_values("media_id")
    assert len(a) == 20
    assert all(len(f) == 8 for f in a["features"])
    for fa, fb in zip(a["features"], b["features"]):
        assert np.allclose(fa, fb)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        MediaDecoder(decoder="none")


def test_frame_sampling(media_ds):
    frames = frame_sample(media_ds, every_n_bytes=512, frame_bytes=32).to_pandas()
    assert (frames.groupby("media_id")["frame_idx"].min() == 0).all()
    assert frames["frame"].map(len).max() <= 32
