"""BM25 ranking: engine vs an independent pure-Python reference, plus
edge cases (empty docs, DF ties at the query-term boundary)."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from geoflow.stages.search import B, K1, bm25_topk


def brute_bm25(docs: dict[int, str], n_queries=3, tpq=2, k=10):
    toks = {d: t.split() for d, t in docs.items()}
    n = len(docs)
    total = sum(len(t) for t in toks.values())
    avgdl = total * 1.0 / n
    df = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    qterms = sorted(df, key=lambda w: (-df[w], w))[:n_queries * tpq]
    rows = []
    for qi in range(n_queries):
        scores = {}
        for w in qterms[qi * tpq:(qi + 1) * tpq]:
            idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
            for d, t in toks.items():
                tf = t.count(w)
                if tf:
                    wgt = idf * tf * (K1 + 1.0) / \
                        (tf + K1 * ((1.0 - B) + (B * len(t)) / avgdl))
                    scores[d] = scores.get(d, 0.0) + wgt
        ranked = sorted(scores.items(),
                        key=lambda it: (-round(it[1], 6), it[0]))[:k]
        for rk, (d, s) in enumerate(ranked, 1):
            rows.append((qi, d, round(s, 6), rk))
    return pd.DataFrame(rows, columns=["q_id", "doc_id", "score", "rk"])


def run_engine(docs: dict[int, str], **kw):
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    return bm25_topk(rd.from_pandas(df).repartition(4), "doc_id", "text",
                     **kw)


def test_matches_brute_force():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    docs = {i: " ".join(rng.choice(vocab, size=rng.integers(3, 60)))
            for i in range(200)}
    got = run_engine(docs, n_queries=3, terms_per_query=2, k=10)
    want = brute_bm25(docs)
    pd.testing.assert_frame_equal(
        got.sort_values(["q_id", "rk"]).reset_index(drop=True),
        want.sort_values(["q_id", "rk"]).reset_index(drop=True),
        check_dtype=False)


def test_empty_docs_and_ties():
    # empty docs count toward N and avgdl; identical docs tie exactly
    # and must break on doc_id ascending
    docs = {1: "a b c", 2: "a b c", 3: "", 4: "a a a a", 5: "b",
            6: "", 7: "c c b a"}
    got = run_engine(docs, n_queries=2, terms_per_query=2, k=5)
    want = brute_bm25(docs, n_queries=2, tpq=2, k=5)
    pd.testing.assert_frame_equal(
        got.sort_values(["q_id", "rk"]).reset_index(drop=True),
        want.sort_values(["q_id", "rk"]).reset_index(drop=True),
        check_dtype=False)
    # identical docs 1 and 2 rank adjacently with equal score
    q0 = got[got.q_id == 0].set_index("doc_id")
    assert q0.loc[1, "score"] == q0.loc[2, "score"]
    assert abs(int(q0.loc[1, "rk"]) - int(q0.loc[2, "rk"])) == 1


def test_more_addends_rejected():
    with pytest.raises(AssertionError):
        run_engine({1: "a b"}, terms_per_query=3)


def test_phrase_search_counts(ray_session):
    """Occurrence counts vs a brute sliding-window reference,
    including overlapping matches, repeated terms, and empty text."""
    import pandas as pd
    import ray.data as rd

    from geoflow.stages.search import phrase_search

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "lang": ["en", "en", "de", "de", "en"],
        "text": ["sort merge sort merge part", "merge sort",
                 "sort merge", "", "a a a a"],
    })
    phrases = ["sort merge", "sort merge part", "a a"]
    out = phrase_search(rd.from_pandas(docs), phrases)

    def brute(t, p):
        tk, pk = t.split(" "), p.split(" ")
        return sum(1 for i in range(len(tk) - len(pk) + 1)
                   if tk[i:i + len(pk)] == pk)

    want = {}
    for p in phrases:
        for _, r in docs.iterrows():
            n = brute(r["text"], p)
            if n:
                k = (p, r["lang"])
                d, m, c = want.get(k, (0, 0, 0))
                want[k] = (d + 1, m + n, c + r["doc_id"] * n)
    got = {(r["phrase"], r["lang"]):
           (r["n_docs"], r["n_matches"], r["doc_checksum"])
           for _, r in out.iterrows()}
    assert got == want
    # overlapping "a a" in "a a a a" = 3 matches
    assert got[("a a", "en")] == (1, 3, 12)
