"""Fuzzy vocabulary join: edit-distance-1 semantics + deletion-blocking
completeness vs brute-force Levenshtein."""

import itertools

import numpy as np
import pandas as pd
import ray.data as rd

from geoflow.stages.textstats import _edit1, fuzzy_token_pairs


def lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit1_matches_levenshtein():
    rng = np.random.default_rng(4)
    words = ["".join(rng.choice(list("abcd"), rng.integers(1, 6)))
             for _ in range(60)]
    for a, b in itertools.combinations(set(words), 2):
        if abs(len(a) - len(b)) <= 1:
            assert _edit1(a, b) == (lev(a, b) == 1), (a, b)


def test_blocking_complete():
    vocab = ["cat", "cta", "cast", "cats", "bat", "at", "dog", "dig",
             "dogs", "xyz", "cat"]
    docs = pd.DataFrame({
        "doc_id": np.arange(len(vocab), dtype=np.int64),
        "text": vocab})
    got = fuzzy_token_pairs(rd.from_pandas(docs).repartition(3),
                            min_df=1, max_len=10)
    got_pairs = set(map(tuple, got[["t1", "t2"]].values))
    want = set()
    for a, b in itertools.combinations(sorted(set(vocab)), 2):
        if lev(a, b) == 1:
            want.add((a, b))
    assert got_pairs == want
    # df carried correctly: 'cat' appears in two docs
    row = got[(got.t1 == "cat") | (got.t2 == "cat")].iloc[0]
    df_cat = row.df1 if row.t1 == "cat" else row.df2
    assert df_cat == 2


def test_min_df_and_max_len_filters():
    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["rare raree", "common commn", "common commn",
                 "toolongword" + "x" * 20]})
    got = fuzzy_token_pairs(rd.from_pandas(docs), min_df=2, max_len=15)
    pairs = set(map(tuple, got[["t1", "t2"]].values))
    assert ("commn", "common") in pairs
    assert ("rare", "raree") not in pairs   # df 1 < min_df
