"""Text analysis over document tables: tokens, ratios, language ID,
quality scoring, fingerprints.

Training-data-pipeline operators (task brief "Text analysis") with no
reference counterpart; all hot paths are vectorized Arrow compute
kernels (RE2 under the hood) — no Python loop over rows except the
rolling-hash fingerprint, which is per-row by nature but O(len) with a
small constant.

Conventions chosen to be replayable in ANSI SQL (DuckDB oracle):
- token = maximal run of non-whitespace (``\\S+``),
- alpha/digit/space counts are ASCII-class regex counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language identifier (public common stopwords).
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
    "ru": {"и", "в", "не", "на", "что", "это", "с", "как", "по", "его"},
    "zh": set(),  # CJK handled by the script heuristic below
}


def token_count(text_col) -> pa.Array:
    """Whitespace tokenization count (== len(s.split()) for ASCII text)."""
    return pc.count_substring_regex(text_col, pattern=r"\S+")


def add_text_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_tokens / n_alpha / n_digit / n_space / text_len columns."""
    t = batch.column(text_col)
    batch = batch.append_column("n_tokens", token_count(t))
    batch = batch.append_column(
        "n_alpha", pc.count_substring_regex(t, pattern=r"[a-zA-Z]"))
    batch = batch.append_column(
        "n_digit", pc.count_substring_regex(t, pattern=r"[0-9]"))
    batch = batch.append_column(
        "n_space", pc.count_substring_regex(t, pattern=r" "))
    batch = batch.append_column("text_len", pc.utf8_length(t))
    return batch


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Heuristic quality features + a composite score per row.

    Features: alpha_ratio, digit_ratio, mean token length, tokens-per-
    char. Composite = alpha_ratio * (1 - digit_ratio) clipped; crude but
    deterministic and monotone in "looks like prose".
    """
    batch = add_text_stats(batch, text_col)
    ln = np.maximum(batch.column("text_len").to_numpy(), 1).astype(np.float64)
    alpha = batch.column("n_alpha").to_numpy() / ln
    digit = batch.column("n_digit").to_numpy() / ln
    ntok = np.maximum(batch.column("n_tokens").to_numpy(), 1)
    mean_tok_len = (ln - batch.column("n_space").to_numpy()) / ntok
    score = np.clip(alpha * (1.0 - digit), 0.0, 1.0)
    batch = batch.append_column("alpha_ratio", pa.array(alpha))
    batch = batch.append_column("digit_ratio", pa.array(digit))
    batch = batch.append_column("mean_token_len", pa.array(mean_tok_len))
    batch = batch.append_column("quality", pa.array(score))
    return batch


class LangId:
    """Stopword/script-heuristic language identifier (actor-pool stage).

    Callable-class form for ``map_batches(LangId, concurrency=N)``: the
    per-language token sets and compiled regexes are built once per
    actor in ``__init__`` (reference pattern: stateful setup amortized
    across batches), scoring is per batch.
    """

    def __init__(self):
        import re
        self.word_re = re.compile(r"[^\W\d_]+", re.UNICODE)
        self.cjk_re = re.compile(r"[一-鿿]")
        self.cyr_re = re.compile(r"[Ѐ-ӿ]")
        self.stop = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def predict_one(self, text: str) -> str:
        if not text:
            return "und"
        if self.cjk_re.search(text):
            return "zh"
        if self.cyr_re.search(text):
            return "ru"
        toks = [w.lower() for w in self.word_re.findall(text)]
        if not toks:
            return "und"
        best, best_hits = "en", -1
        for lang in ("en", "de", "fr", "es"):
            hits = sum(1 for w in toks if w in self.stop[lang])
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        pred = pa.array([self.predict_one(t) for t in texts], pa.string())
        return batch.append_column("lang_pred", pred)


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      window: int = 8) -> pa.Table:
    """Document fingerprint: min of rolling Rabin-Karp hashes over token
    windows (winnowing-style min-sampling, deterministic)."""
    B = 1000003
    MASK = (1 << 64) - 1
    texts = batch.column(text_col).to_pylist()
    fps = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if not toks:
            fps[i] = 0
            continue
        hs = np.fromiter((hash_token(w) for w in toks), dtype=np.uint64)
        if len(hs) < window:
            acc = np.uint64(0)
            for h in hs:
                acc = np.uint64((int(acc) * B + int(h)) & MASK)
            fps[i] = acc
        else:
            # rolling polynomial hash over each window, take the min
            bw = pow(B, window - 1, 1 << 64)
            acc = 0
            for h in hs[:window].tolist():
                acc = (acc * B + int(h)) & MASK
            best = acc
            for j in range(window, len(hs)):
                acc = ((acc - int(hs[j - window]) * bw) * B + int(hs[j])) & MASK
                if acc < best:
                    best = acc
            fps[i] = best
    return batch.append_column("fingerprint", pa.array(fps, pa.uint64()))


def hash_token(tok: str) -> int:
    import hashlib
    return int.from_bytes(
        hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big")


# --- SQL-replayable polynomial fingerprint (winnowing min over token
# windows, like fingerprint_batch, but with pure integer arithmetic the
# DuckDB oracle replays exactly; blake2 variant above is the
# stronger-hash alternative) ---

_FP_P = 2147483647        # 2^31 - 1: keeps every fold step inside int64
_FP_B_CHAR = 31
_FP_B_TOK = 1000003


def poly_token_hash(tok: str) -> int:
    acc = 0
    for ch in tok:
        acc = (acc * _FP_B_CHAR + ord(ch)) % _FP_P
    return acc


def fingerprint_poly_batch(batch: pa.Table, text_col: str = "text",
                           window: int = 8) -> pa.Table:
    """min over ``window``-token folds of per-token char-polynomial
    hashes; docs shorter than the window fold all tokens; empty -> 0."""
    texts = batch.column(text_col).to_pylist()
    pw = np.array([pow(_FP_B_TOK, window - 1 - k, _FP_P)
                   for k in range(window)], dtype=np.int64)
    fps = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if not toks:
            continue
        hs = np.fromiter((poly_token_hash(w) for w in toks),
                         dtype=np.int64, count=len(toks))
        if len(hs) < window:
            acc = 0
            for h in hs.tolist():
                acc = (acc * _FP_B_TOK + h) % _FP_P
            fps[i] = acc
        else:
            wins = np.lib.stride_tricks.sliding_window_view(hs, window)
            acc = np.zeros(len(wins), dtype=np.int64)
            for k in range(window):          # products < p^2 < 2^62
                acc = (acc + wins[:, k] * pw[k]) % _FP_P
            fps[i] = int(acc.min())
    return batch.append_column("fingerprint_poly",
                               pa.array(fps, pa.int64()))
