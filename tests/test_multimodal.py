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


def test_codec_rejects_unsupported_formats():
    import wave

    codec = mm.Codec()
    with pytest.raises(ValueError):            # JPEG magic routes to the
        codec.decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")  # real decoder,
        # which rejects a truncated/garbage stream loudly
    with pytest.raises(NotImplementedError):   # unknown magic entirely
        codec.decode_image(b"GIF89a not supported")
    with pytest.raises(wave.Error):            # RIFF routes to the real
        codec.decode_audio(b"RIFF....WAVE")    # WAV codec, which rejects
        # truncated/garbage containers loudly


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


def test_png_roundtrip_all_filters():
    """encode_png -> decode_png round-trips; decoder reconstructs
    filter types 1/2/3/4 from hand-filtered scanlines."""
    import struct
    import zlib

    rng = np.random.default_rng(7)
    for c in (1, 3, 4):
        img = rng.integers(0, 256, size=(13, 9, c), dtype=np.uint8)
        back = mm.decode_png(mm.encode_png(img))
        assert (back == img).all(), c
    # build a PNG whose rows use each filter type explicitly
    img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    h, w, ch = img.shape
    bpp = ch

    def filt(y, ft):
        row = img[y].reshape(-1).astype(np.int64)
        prev = (img[y - 1].reshape(-1).astype(np.int64)
                if y > 0 else np.zeros_like(row))
        out = np.empty_like(row)
        for i in range(len(row)):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            cc = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa_ <= pb and pa_ <= pc) else (
                    b if pb <= pc else cc)
            out[i] = (row[i] - pred) & 0xFF
        return bytes([ft]) + bytes(out.astype(np.uint8))

    raw = b"".join(filt(y, y % 5) for y in range(h))

    def chunk(typ, payload):
        return (len(payload).to_bytes(4, "big") + typ + payload
                + zlib.crc32(typ + payload).to_bytes(4, "big"))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert (mm.decode_png(data) == img).all()


def test_wav_roundtrip():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(4000) * 0.3).clip(-1, 1).astype(np.float32)
    sr, back = mm.decode_wav(mm.encode_wav(16000, x))
    assert sr == 16000
    assert len(back) == len(x)
    assert np.abs(back - x).max() < 2.0 / 32768  # PCM16 quantization


def test_real_codecs_through_actor_stages(ray_session):
    """Real PNG + WAV payloads through the actor-pool feature stages."""
    import ray.data as rd

    rng = np.random.default_rng(11)
    rows = []
    for i in range(6):
        img = rng.integers(0, 256, size=(40 + i, 30, 3), dtype=np.uint8)
        rows.append({"media_id": i, "kind": "image",
                     "payload": mm.encode_png(img),
                     "meta": json.dumps({"width": 30, "height": 40 + i,
                                         "channels": 3})})
    for j in range(4):
        x = (rng.standard_normal(8000 + 500 * j) * 0.2).astype(np.float32)
        rows.append({"media_id": 100 + j, "kind": "audio",
                     "payload": mm.encode_wav(8000, x),
                     "meta": json.dumps({"sample_rate": 8000,
                                         "n_samples": len(x)})})
    ds = rd.from_items(rows)
    imgs = mm.image_features(ds, concurrency=2, batch_size=4).to_pandas()
    assert len(imgs) == 6
    assert (imgs["height"] == 64).all()      # resize stage ran
    auds = mm.audio_features(ds, concurrency=2, batch_size=4).to_pandas()
    assert len(auds) == 4
    assert np.allclose(auds["duration_s"], [(8000 + 500 * j) / 8000
                                            for j in range(4)], atol=1e-6)
    assert (auds["rms"] > 0.1).all()


def test_video_container_header_spans():
    from geoflow.stages.multimodal import (decode_png, decode_video_header,
                                           encode_video)

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, size=(5, 12, 9, 3), dtype=np.uint8)
    payload = encode_video(frames, fps=10)
    fps, n, spans = decode_video_header(payload)
    assert (fps, n) == (10, 5)
    # every indexed span decodes back to its exact frame
    for i, (o, ln) in enumerate(spans):
        assert np.array_equal(decode_png(payload[o:o + ln]), frames[i])


def test_video_frame_sample_stage(ray_session):
    import ray.data as rd
    from geoflow.stages.multimodal import (ImageFeatures, decode_png,
                                           decode_video_header,
                                           make_video_table,
                                           video_frame_samples)

    tbl = make_video_table(n_videos=6, seed=7)
    out = video_frame_samples(rd.from_arrow(tbl), stride=3,
                              max_frames=4).to_pandas()
    # per video: frames 0, 3, 6, ... capped at 4 samples
    metas = {int(m): __import__("json").loads(s) for m, s in
             zip(tbl.column("media_id").to_pylist(),
                 tbl.column("meta").to_pylist())}
    for mid, g in out.groupby("media_id"):
        n = metas[mid]["n_frames"]
        exp = list(range(0, n, 3))[:4]
        assert sorted(g["frame_idx"].tolist()) == exp, mid
        assert np.allclose(g["ts_s"], np.array(sorted(g["frame_idx"])) / 10)
    # embeddings match a direct decode of the same frames
    payload = tbl.column("payload").to_pylist()[0]
    _, _, spans = decode_video_header(payload)
    o, ln = spans[3]
    img = decode_png(payload[o:o + ln])
    gray = img.astype(np.float32).mean(axis=2)
    emb = ImageFeatures._resize_nn(gray, 8, 8).ravel()
    emb = emb / np.linalg.norm(emb)
    got = out[(out["media_id"] == 0) & (out["frame_idx"] == 3)
              ]["embedding"].iloc[0]
    assert np.allclose(np.asarray(got, dtype=np.float32),
                       emb.astype(np.float32), atol=1e-6)


def test_ahash_bits_and_roundtrip():
    from geoflow.stages.multimodal import (ahash64, decode_png, encode_png,
                                           render_lcg_image)
    img = render_lcg_image(123)
    # real-codec roundtrip preserves the hash input exactly
    assert np.array_equal(decode_png(encode_png(img)).reshape(8, 8), img)
    # bit semantics: bit k set iff pixel k (row-major) * 64 > sum
    flat = img.astype(np.int64).ravel()
    expect = 0
    for k, p in enumerate(flat.tolist()):
        if p * 64 > flat.sum():
            expect |= 1 << (63 - k)
    expect = expect - (1 << 64) if expect >= (1 << 63) else expect
    assert ahash64(img) == expect


def test_image_ahash_dup_groups(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from geoflow.stages.multimodal import (encode_png,
                                           image_ahash_dup_groups,
                                           render_lcg_image)
    # 40 images; ids 10..13 clone image 0, id 25 clones 24
    seeds = list(range(40))
    for i in (10, 11, 12, 13):
        seeds[i] = 0
    seeds[25] = 24
    tbl = pa.table({
        "media_id": pa.array(np.arange(40, dtype=np.int64)),
        "payload": pa.array([encode_png(render_lcg_image(s))
                             for s in seeds], pa.binary()),
    })
    out = (image_ahash_dup_groups(rd.from_arrow(tbl), concurrency=2)
           .to_pandas().sort_values("rep_id").reset_index(drop=True))
    assert out["rep_id"].tolist() == [0, 24]
    assert out["n_images"].tolist() == [5, 2]


def test_image_ahash_near_dup_bruteforce(ray_session):
    import itertools
    import pyarrow as pa
    import ray.data as rd
    from geoflow.stages.multimodal import (ahash64, decode_png, encode_png,
                                           image_ahash_near_dup, popcount64,
                                           render_lcg_image)
    # base images + hand-flipped near variants (1-3 pixel sign flips)
    imgs = {i: render_lcg_image(i) for i in range(30)}
    for src, dst, nflip in [(0, 30, 1), (5, 31, 3), (9, 32, 2)]:
        v = imgs[src].copy().astype(np.int64)
        flat = v.ravel()
        mean_ok = flat.sum()
        for k in range(nflip):           # push pixel across the threshold
            flat[k * 7] = 255 if flat[k * 7] * 64 <= mean_ok else 0
        imgs[dst] = np.clip(flat.reshape(8, 8), 0, 255).astype(np.uint8)
    tbl = pa.table({
        "media_id": pa.array(sorted(imgs), pa.int64()),
        "payload": pa.array([encode_png(imgs[i]) for i in sorted(imgs)],
                            pa.binary()),
    })
    out = (image_ahash_near_dup(rd.from_arrow(tbl), max_hamming=3,
                                num_bands=4, concurrency=2)
           .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True))
    # brute force over decoded hashes
    hashes = {i: ahash64(decode_png(encode_png(imgs[i])).reshape(8, 8))
              for i in sorted(imgs)}
    exp = []
    for a, b in itertools.combinations(sorted(imgs), 2):
        d = int(popcount64(np.array([hashes[a] ^ hashes[b]], np.int64))[0])
        if d <= 3:
            exp.append((a, b, d))
    got = list(out.itertuples(index=False, name=None))
    assert got == sorted(exp)
    assert any(d > 0 for _, _, d in exp)      # some true NEAR (not exact) dups


def test_audio_fingerprint_dup_groups(ray_session):
    import pyarrow as pa
    import ray.data as rd
    from geoflow.stages.multimodal import (audio_fingerprint16,
                                           audio_fingerprint_dup_groups,
                                           decode_wav, encode_wav,
                                           render_lcg_pcm)
    # int16 WAV roundtrip is lossless (power-of-two scaling)
    pcm = render_lcg_pcm(3)
    _sr, x = decode_wav(encode_wav(8000, pcm))
    assert np.array_equal(np.round(x * 32768.0).astype(np.int64),
                          pcm.astype(np.int64))

    seeds = list(range(30))
    for i in (12, 13, 14):
        seeds[i] = 2
    seeds[21] = 20
    tbl = pa.table({
        "media_id": pa.array(np.arange(30, dtype=np.int64)),
        "payload": pa.array([encode_wav(8000, render_lcg_pcm(s))
                             for s in seeds], pa.binary()),
    })
    out = (audio_fingerprint_dup_groups(rd.from_arrow(tbl), concurrency=2)
           .to_pandas().sort_values("rep_id").reset_index(drop=True))
    # group of seed 2 = {2, 12, 13, 14}; group of seed 20 = {20, 21};
    # plus any accidental 16-bit contour collisions — check supersets
    by_rep = {r: n for r, n in zip(out["rep_id"], out["n_clips"])}
    assert by_rep.get(2, 0) >= 4
    assert by_rep.get(20, 0) >= 2
    # every reported group really shares one fingerprint
    fps = {i: audio_fingerprint16(render_lcg_pcm(s).astype(np.int64))
           for i, s in enumerate(seeds)}
    import collections as _c
    cnt = _c.Counter(fps.values())
    exp = sorted((min(i for i in fps if fps[i] == v), c)
                 for v, c in cnt.items() if c > 1)
    assert sorted(zip(out["rep_id"], out["n_clips"])) == exp


def test_decode_audit_per_row_accounting(ray_session):
    """Mixed baseline/progressive/corrupt fixture: the audit stage
    classifies per ROW (no task failure), statuses land exactly where
    injected, and media_decode_stats rolls them up."""
    import struct

    import pyarrow as pa
    import ray.data as rd

    from geoflow.stages.jpeg import encode_jpeg
    from geoflow.stages.multimodal import (DecodeAudit, encode_wav,
                                           media_decode_stats)

    img = (np.arange(64, dtype=np.uint8).reshape(8, 8)[..., None]
           .repeat(3, axis=2))
    good_jpg = encode_jpeg(img, quality=90)
    at = good_jpg.find(b"\xff\xc0")
    prog_jpg = good_jpg[:at] + b"\xff\xc2" + good_jpg[at + 2:]
    corrupt = b"\xff\xd8\xff\xdb\x00\x03\x01"
    good_wav = encode_wav(16000, np.arange(32, dtype=np.int16))
    bad_wav = good_wav[:32] + struct.pack("<HH", 1, 8) + good_wav[36:]

    t = pa.table({
        "media_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "kind": pa.array(["image", "image", "image", "audio", "audio"]),
        "payload": pa.array([good_jpg, prog_jpg, corrupt,
                             good_wav, bad_wav], pa.binary()),
    })
    rows = DecodeAudit()(t).to_pydict()
    assert rows["decode_status"] == ["ok", "unsupported", "corrupt",
                                     "ok", "unsupported"]
    assert "baseline" in rows["decode_error"][1]      # names the boundary
    assert rows["decode_error"][0] == ""
    assert "PCM16" in rows["decode_error"][4]

    stats = media_decode_stats(rd.from_arrow(t)).to_pandas()
    got = {(r.kind, r.decode_status): r.n_media
           for r in stats.itertuples()}
    assert got == {("image", "ok"): 1, ("image", "unsupported"): 1,
                   ("image", "corrupt"): 1, ("audio", "ok"): 1,
                   ("audio", "unsupported"): 1}
