"""Robots longest-prefix-match decisions: semantics + vectorized path."""

import numpy as np
import pandas as pd

from geoflow.stages.robots import RobotsIndex, robots_filter, split_host_path


def mk(rules):
    return RobotsIndex(pd.DataFrame(rules,
                                    columns=["host", "prefix", "allow"]))


def test_longest_prefix_wins():
    idx = mk([("a.ex", "/", True), ("a.ex", "/s1/", False),
              ("a.ex", "/s1/page1", True)])
    got = idx.decide(np.array([
        "https://a.ex/s1/page123",   # re-allowed by the longest rule
        "https://a.ex/s1/page234",   # denied by /s1/
        "https://a.ex/s2/x",         # allowed by /
    ]))
    assert got.tolist() == [True, False, True]


def test_allow_wins_equal_length_tie():
    idx = mk([("t.ex", "/ab", False), ("t.ex", "/ab", True)])
    assert idx.decide(np.array(["https://t.ex/abc"])).tolist() == [True]
    # and deny-only at that length still denies
    idx2 = mk([("t.ex", "/ab", False)])
    assert idx2.decide(np.array(["https://t.ex/abc"])).tolist() == [False]


def test_unknown_host_and_no_match_default():
    idx = mk([("a.ex", "/x", False)])
    got = idx.decide(np.array(["https://b.ex/x", "https://a.ex/y"]))
    assert got.tolist() == [True, True]
    got = idx.decide(np.array(["https://b.ex/x", "https://a.ex/y"]),
                     default_allow=False)
    assert got.tolist() == [False, False]


def test_matches_reference_scan():
    """Vectorized argmax == per-url reference loop on random data."""
    rng = np.random.default_rng(3)
    hosts = [f"h{i}.ex" for i in range(20)]
    rules = []
    for h in hosts:
        for _ in range(rng.integers(0, 5)):
            depth = int(rng.integers(1, 4))
            prefix = "/" + "/".join(
                f"p{int(rng.integers(0, 3))}" for _ in range(depth))
            rules.append((h, prefix, bool(rng.integers(0, 2))))
        rules.append((h, "/", bool(rng.integers(0, 2))))
    df = pd.DataFrame(rules, columns=["host", "prefix", "allow"])
    urls = np.array([
        f"https://h{int(rng.integers(0, 25))}.ex/"
        + "/".join(f"p{int(rng.integers(0, 3))}"
                   for _ in range(int(rng.integers(1, 4))))
        for _ in range(500)])
    got = RobotsIndex(df).decide(urls)

    def ref(u):
        host, path = split_host_path(np.array([u]))
        host, path = host[0], path[0]
        best_len, best_allow = -1, True
        for _, r in df.iterrows():
            if r["host"] == host and path.startswith(r["prefix"]):
                ln = len(r["prefix"])
                if ln > best_len or (ln == best_len and r["allow"]):
                    best_len, best_allow = ln, bool(r["allow"])
        return best_allow

    want = np.array([ref(u) for u in urls])
    assert (got == want).all()


def test_robots_filter_dataset(ray_session):
    import ray.data as rd

    df = pd.DataFrame([("a.ex", "/", True), ("a.ex", "/no/", False)],
                      columns=["host", "prefix", "allow"])
    ds = rd.from_items([{"url": "https://a.ex/no/thing"},
                        {"url": "https://a.ex/ok"}])
    out = robots_filter(ds, "url", df).to_pandas()
    assert out["allowed"].tolist() == [False, True]
