"""Count-Min sketch: partial-merge invariance, bounds, distributed build."""
import numpy as np
import pandas as pd
import pyarrow as pa

from geoflow.functions.sketch import (_cms_token_hashes, cms_build,
                                      cms_estimate, cms_partial)


def test_cms_partials_merge_by_sum():
    a = ["x", "y", "x", "z"] * 5
    b = ["y", "q"] * 7
    whole = cms_partial(_cms_token_hashes(a + b), 4, 256)
    merged = (cms_partial(_cms_token_hashes(a), 4, 256)
              + cms_partial(_cms_token_hashes(b), 4, 256))
    assert np.array_equal(whole, merged)


def test_cms_never_underestimates_and_bounds():
    rng = np.random.default_rng(3)
    items = [f"t{int(i)}" for i in rng.zipf(1.5, 5000) if i < 10_000]
    cms = cms_partial(_cms_token_hashes(items), 4, 1024)
    import collections
    true = collections.Counter(items)
    keys = list(true)
    est = cms_estimate(cms, keys)
    tv = np.array([true[k] for k in keys])
    assert np.all(est >= tv)
    assert np.all(est <= tv + np.e * len(items) / 1024 + 1)


def test_cms_build_distributed(ray_session):
    import ray.data as rd

    docs = pd.DataFrame({"text": ["a b a", "b c", "a", ""] * 25})
    ds = rd.from_pandas(docs).repartition(8)

    def _tokens(b: pa.Table):
        out = []
        for t in b.column("text").to_pylist():
            out.extend((t or "").split())
        return out

    cms, n = cms_build(ds, _tokens, depth=4, width=128)
    assert n == 150  # (3 + 2 + 1 + 0) * 25
    est = cms_estimate(cms, ["a", "b", "c", "zz"])
    assert list(est[:3] >= np.array([75, 50, 25])) == [True] * 3
    assert est[3] <= np.e * n / 128


def test_cms_tree_merge_identical_to_flat(ray_session):
    """Forcing the multi-level tree-merge path (fanin 2 over a 16-block
    hint -> 3 intermediate levels) yields a bit-identical sketch and
    count: integer elementwise sums commute across levels."""
    import ray.data as rd

    docs = pd.DataFrame({"text": [f"w{i % 37} w{i % 11}" for i in range(400)]})
    ds = rd.from_pandas(docs).repartition(16)

    def _tokens(b: pa.Table):
        out = []
        for t in b.column("text").to_pylist():
            out.extend(t.split())
        return out

    flat, n_flat = cms_build(ds, _tokens, depth=4, width=256,
                             num_blocks_hint=1)     # no tree levels
    tree, n_tree = cms_build(ds, _tokens, depth=4, width=256,
                             tree_fanin=2, num_blocks_hint=16)
    assert n_flat == n_tree == 800
    assert np.array_equal(flat, tree)
