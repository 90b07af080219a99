import json

import numpy as np
import pytest

from geoflow.stages import multimodal as mm


def test_fake_codec_roundtrip():
    codec = mm.Codec()
    img = codec.decode_image(mm.encode_fake_image(40, 30, seed=1))
    assert img.shape == (30, 40, 3) and img.dtype == np.uint8
    sr, x = codec.decode_audio(mm.encode_fake_audio(16000, 1000, seed=2))
    assert sr == 16000 and x.shape == (1000,) and x.dtype == np.float32
    # deterministic
    assert np.array_equal(img, codec.decode_image(mm.encode_fake_image(40, 30, 1)))


def test_codec_rejects_real_formats():
    codec = mm.Codec()
    with pytest.raises(NotImplementedError):
        codec.decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")
    with pytest.raises(NotImplementedError):
        codec.decode_audio(b"RIFF....WAVE")


def test_image_feature_stage(ray_session):
    import ray.data as rd
    table = mm.make_media_table(n_images=24, n_audio=8)
    ds = rd.from_arrow(table)
    out = mm.image_features(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 24
    assert "payload" not in out.columns         # binary projected away
    assert (out["height"] == 64).all()          # resized
    for e in out["embedding"]:
        v = np.asarray(e)
        assert v.shape == (64,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    assert out["mean_intensity"].between(100, 160).all()  # uniform noise ~127


def test_audio_feature_stage(ray_session):
    import ray.data as rd
    table = mm.make_media_table(n_images=4, n_audio=12)
    ds = rd.from_arrow(table)
    out = mm.audio_features(ds, concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 12
    metas = {json.loads(m)["n_samples"]
             for m in table.column("meta").to_pylist()[4:]}
    assert set((out["duration_s"] * 16000).round().astype(int)) == metas
    assert (out["rms"] > 0).all()
    assert all(len(f) >= 1 for f in out["frame_energy"])


def test_media_pipeline_deterministic(ray_session):
    import ray.data as rd
    t1 = mm.make_media_table(8, 4)
    t2 = mm.make_media_table(8, 4)
    o1 = mm.image_features(rd.from_arrow(t1), concurrency=2).to_pandas()
    o2 = mm.image_features(rd.from_arrow(t2), concurrency=2).to_pandas()
    o1 = o1.sort_values("media_id").reset_index(drop=True)
    o2 = o2.sort_values("media_id").reset_index(drop=True)
    assert (o1["mean_intensity"] == o2["mean_intensity"]).all()
