"""Bloom filter: FPR bound, exact semi-join output, edge cases."""

import numpy as np
import ray.data as rd

from geoflow.functions.bloom import (
    build_bloom, bloom_semi_join, optimal_params, _probe_positions,
    _set_bits, _test_bits,
)


def test_no_false_negatives_and_fpr_bound():
    rng = np.random.default_rng(7)
    keys = rng.choice(10_000_000, size=20_000, replace=False).astype(np.int64)
    num_bits, k = optimal_params(len(keys), fpr=0.01)
    words = np.zeros(num_bits // 64, dtype=np.uint64)
    _set_bits(words, _probe_positions(keys, num_bits, k))
    # zero false negatives
    assert _test_bits(words, _probe_positions(keys, num_bits, k)).all()
    # false positives near the design rate (allow 3x slack)
    probe = np.setdiff1d(
        rng.choice(50_000_000, size=50_000, replace=False).astype(np.int64),
        keys)
    fp = _test_bits(words, _probe_positions(probe, num_bits, k)).mean()
    assert fp < 0.03, fp


def test_bloom_semi_join_exact(ray_session):
    rng = np.random.default_rng(11)
    big_keys = rng.integers(0, 5000, size=30_000).astype(np.int64)
    key_set = rng.choice(5000, size=400, replace=False).astype(np.int64)
    big = rd.from_arrow(
        __import__("pyarrow").table({"k": big_keys,
                                     "v": np.arange(30_000)}))
    keys = rd.from_arrow(
        __import__("pyarrow").table({"kk": np.concatenate(
            [key_set, key_set[:50]])}))     # duplicates must not fan out
    out, stats = bloom_semi_join(big, "k", keys, "kk", fpr=0.01)
    df = out.to_pandas()
    want = np.isin(big_keys, key_set)
    assert len(df) == int(want.sum())
    assert sorted(df["v"]) == sorted(np.arange(30_000)[want].tolist())
    assert stats["bitmap_bytes"] * 8 == stats["num_bits"]
    # the bitmap is an order of magnitude smaller than the key array
    assert stats["bitmap_bytes"] < 8 * len(key_set)


def test_bloom_build_distributed_or(ray_session):
    keys = np.arange(1000, dtype=np.int64)
    ds = rd.from_arrow(
        __import__("pyarrow").table({"k": keys})).repartition(8)
    num_bits, k = optimal_params(1000, 0.01)
    bits = build_bloom(ds, "k", num_bits, k)
    assert _test_bits(bits, _probe_positions(keys, num_bits, k)).all()
