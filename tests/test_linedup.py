"""Corpus-wide line-level boilerplate dedup + duplicated-window
coverage (webquality.line_dedup / dup_window_stats) vs brute force."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from geoflow.stages.webquality import (
    dedup_windows,
    doc_lines,
    doc_windows,
    dup_window_stats,
    line_dedup,
)


def _corpus(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string()),
    }))


def _brute_line_dedup(texts, min_df, tpl, bp):
    ids = np.arange(len(texts), dtype=np.int64)
    lid, lno, lines = doc_lines(ids, texts, tpl, bp)
    df = {}
    for d, li in set(zip(lid, lines)):
        if li:
            df[li] = df.get(li, 0) + 1
    out = {}
    for d, no, li in zip(lid, lno, lines):
        tot, kept = out.setdefault(d, [0, []])
        out[d][0] += 1
        if not (li and df.get(li, 0) >= min_df):
            kept.append((no, li))
    return {
        d: (tot, tot - len(kept),
            "\n".join(li for _, li in sorted(kept)))
        for d, (tot, kept) in out.items()
    }


def test_line_dedup_vs_brute(ray_session):
    # 3-token lines; docs 0/1/2 share the boilerplate line "x y z";
    # doc 3 is entirely boilerplate (clean_text must be ""); doc 4
    # repeats the boilerplate line TWICE (both copies removed, but its
    # df counts doc 4 once).
    texts = [
        "a b c x y z",
        "d e f x y z g h i",
        "x y z j k l",
        "x y z",
        "x y z m n o x y z",
    ]
    got = (line_dedup(_corpus(texts), min_df=3, tokens_per_line=3)
           .to_pandas().set_index("doc_id").sort_index())
    exp = _brute_line_dedup(texts, 3, 3, None)
    assert set(got.index) == set(exp)
    for d, (nl, nr, ct) in exp.items():
        assert got.loc[d, "n_lines"] == nl
        assert got.loc[d, "n_removed"] == nr
        assert got.loc[d, "clean_text"] == ct
    assert got.loc[3, "clean_text"] == ""
    assert got.loc[3, "n_removed"] == 1
    assert got.loc[4, "n_removed"] == 2


def test_line_dedup_below_threshold_kept(ray_session):
    # df=2 < min_df=3: nothing removed
    texts = ["a b c", "a b c", "d e f"]
    got = (line_dedup(_corpus(texts), min_df=3, tokens_per_line=3)
           .to_pandas())
    assert (got["n_removed"] == 0).all()


def test_line_dedup_boilerplate_injection(ray_session):
    # injected line on doc_id % 2 == 0 hits docs 0,2,4 -> df 3 >= 3,
    # removed everywhere; organic lines unique, kept
    bp = [(2, 0, "cookie banner text")]
    texts = ["a b c", "d e f", "g h i", "j k l", "m n o"]
    got = (line_dedup(_corpus(texts), min_df=3, tokens_per_line=3,
                      boilerplate=bp)
           .to_pandas().set_index("doc_id").sort_index())
    exp = _brute_line_dedup(texts, 3, 3, bp)
    for d, (nl, nr, ct) in exp.items():
        assert got.loc[d].tolist() == [nl, nr, ct]
    assert got.loc[0, "n_lines"] == 2 and got.loc[0, "n_removed"] == 1
    assert got.loc[1, "n_lines"] == 1 and got.loc[1, "n_removed"] == 0


def test_dup_window_stats_vs_brute(ray_session):
    # doc 1 duplicates doc 0's middle span; doc 2 unrelated; doc 3 too
    # short to emit windows
    texts = [
        "a b c d e f g h",
        "zz a b c d e f g h yy",
        "p q r s t u v w",
        "one two",
    ]
    w = 4
    got = (dup_window_stats(_corpus(texts), window=w)
           .to_pandas().set_index("doc_id").sort_index())
    ids = np.arange(len(texts), dtype=np.int64)
    wid, _, ws = doc_windows(ids, texts, w)
    df = {}
    for d, s in set(zip(wid, ws)):
        df[s] = df.get(s, 0) + 1
    exp = {}
    for d, s in zip(wid, ws):
        n, nd = exp.setdefault(d, [0, 0])
        exp[d][0] += 1
        if df[s] >= 2:
            exp[d][1] += 1
    assert set(got.index) == set(exp)          # doc 3 absent both sides
    for d, (n, nd) in exp.items():
        assert got.loc[d].tolist() == [n, nd]
    assert 3 not in got.index
    assert got.loc[0, "n_dup_windows"] == got.loc[0, "n_windows"]
    assert got.loc[2, "n_dup_windows"] == 0


def test_dedup_windows_vs_brute(ray_session):
    # doc 1 duplicates doc 0's span; doc 2 unrelated; doc 3 shorter
    # than the window (passes through untouched)
    texts = [
        "a b c d e f g h tail0",
        "zz a b c d e f g h yy",
        "p q r s t u v w x",
        "one two three",
    ]
    w = 4
    got = (dedup_windows(_corpus(texts), window=w)
           .to_pandas().set_index("doc_id").sort_index())
    ids = np.arange(len(texts), dtype=np.int64)
    wid, wpos, ws = doc_windows(ids, texts, w)
    df = {}
    for d, s in set(zip(wid, ws)):
        df[s] = df.get(s, 0) + 1
    exp = {}
    for d, text in zip(ids.tolist(), texts):
        toks = text.split()
        covered = [False] * len(toks)
        for i in range(len(toks) - w + 1):
            if df.get(" ".join(toks[i:i + w]), 0) >= 2:
                for k in range(i, i + w):
                    covered[k] = True
        kept = [t for t, c in zip(toks, covered) if not c]
        exp[d] = (len(toks), sum(covered), " ".join(kept))
    assert set(got.index) == set(exp)
    for d, (nt, nr, ct) in exp.items():
        assert got.loc[d].tolist() == [nt, nr, ct], d
    # doc 3 untouched; shared span excised from both 0 and 1
    assert got.loc[3, "n_removed"] == 0
    assert got.loc[3, "clean_text"] == texts[3]
    assert got.loc[0, "n_removed"] == 8
    assert got.loc[0, "clean_text"] == "tail0"
    assert got.loc[1, "clean_text"] == "zz yy"


def test_semijoin_paths_equal_broadcast(ray_session, monkeypatch):
    # LINESET_BROADCAST_LIMIT = 0 forces all three ops down the bucketed
    # semi-join scale route; results must be identical to the broadcast
    # path (same fixtures as the brute-force tests above)
    import geoflow.stages.webquality as wq

    line_texts = [
        "a b c x y z",
        "d e f x y z g h i",
        "x y z j k l",
        "x y z",
        "x y z m n o x y z",
    ]
    win_texts = [
        "a b c d e f g h tail0",
        "zz a b c d e f g h yy",
        "p q r s t u v w x",
        "one two three",
    ]
    bp = [(2, 0, "cookie banner text")]

    def _norm(df, key="doc_id"):
        return (df.sort_values(key).reset_index(drop=True)
                [sorted(df.columns)])

    ref_line = line_dedup(_corpus(line_texts), min_df=3,
                          tokens_per_line=3, boilerplate=bp).to_pandas()
    ref_stats = dup_window_stats(_corpus(win_texts), window=4).to_pandas()
    ref_rw = dedup_windows(_corpus(win_texts), window=4).to_pandas()

    monkeypatch.setattr(wq, "LINESET_BROADCAST_LIMIT", 0)
    got_line = line_dedup(_corpus(line_texts), min_df=3,
                          tokens_per_line=3, boilerplate=bp).to_pandas()
    got_stats = dup_window_stats(_corpus(win_texts), window=4).to_pandas()
    got_rw = dedup_windows(_corpus(win_texts), window=4).to_pandas()

    for ref, got in [(ref_line, got_line), (ref_stats, got_stats),
                     (ref_rw, got_rw)]:
        a, b = _norm(ref), _norm(got)
        assert list(a.columns) == list(b.columns)
        assert a.astype(str).values.tolist() == b.astype(str).values.tolist()


def test_build_vocab_encode_vs_brute(ray_session):
    import collections

    from geoflow.stages.webquality import build_vocab_encode

    texts = ["b a a c", "a b d", "e e e c c b", "f"]
    k = 3
    got = (build_vocab_encode(_corpus(texts), k=k)
           .to_pandas().sort_values(["doc_id", "pos"])
           .reset_index(drop=True))
    cnt = collections.Counter(w for t in texts for w in t.split())
    vocab = sorted(cnt, key=lambda t: (-cnt[t], t))[:k]
    vid = {t: i + 1 for i, t in enumerate(vocab)}
    exp = [(d, p + 1, vid[w])
           for d, t in enumerate(texts)
           for p, w in enumerate(t.split()) if w in vid]
    assert list(map(tuple, got.to_numpy())) == exp
    # ranking determinism: ties (a=b=c=e=3) break on token asc
    assert vocab == ["a", "b", "c"]
