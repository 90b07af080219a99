"""Distributed BPE tokenizer training + subword encoding.

Byte-pair-encoding merge learning (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public
algorithm) re-shaped for Ray Data:

- The CORPUS is touched exactly once: a combiner-pattern word-frequency
  pass (Arrow hash-aggregate partials per batch, ONE shuffle whose rows
  are word TYPES, not word occurrences) collapses the text into the
  word-type table. Type counts grow sublinearly in corpus size (Heaps'
  law), so the type table is vocabulary-scaled even at 100 TB.
- Merge ROUNDS run over the type table only. Below ``driver_limit``
  types the rounds run driver-local (the table is vocab-sized by
  nature); above it every round is one ``map_batches`` pair-count
  partial pass whose driver-visible state is the PAIR-count table
  (again vocab-sized), followed by a broadcast merge-application pass —
  nothing corpus-sized ever lands on the driver. Both paths are
  bit-identical (same counting, same tie-break) and a unit test forces
  the distributed path at toy scale to prove it.
- Merge application is first-occurrence replace-to-fixpoint over the
  space-separated symbol string: repeatedly ``str.replace`` all
  non-overlapping ``" A B "`` occurrences until none remain. Each pass
  consumes every left-to-right non-conflicting match, so the fixpoint
  equals BPE's canonical left-to-right greedy merge scan, and a chain
  of P plain ``replace`` calls reaches it for any word of <= 2P
  symbols. Words are truncated to ``MAX_WORD_CHARS`` symbols on both
  sides, which makes the whole training chain replayable in DuckDB
  with ``REPLACE_PASSES`` nested ``replace`` calls per round — the
  ``bpe_merges`` query hash-matches that replay.

Merge selection tie-break is (count desc, pair string asc). Pair
strings compare by code point in Python and by binary collation in
DuckDB — identical orders for UTF-8 text.

No reference counterpart (the reference is a raster-correction
plugin); this extends the tokenizer-prep family (webquality.
build_vocab_encode) per the task brief's training-data operator list.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from geoflow.functions.agg import (nonempty_arrow_blocks, nonempty_batches,
                                   skip_empty)

_SYM_SCHEMA = pa.schema([("s", pa.string()), ("f", pa.int64())])
_PAIR_SCHEMA = pa.schema([("pr", pa.string()), ("n", pa.int64())])

# Words are truncated to this many characters (= max initial symbols
# per type). REPLACE_PASSES = MAX_WORD_CHARS // 2 chained replaces
# reach the merge fixpoint for any such word (a conflict chain
# "A B A B ..." resolves one link per pass and has <= symbols/2 links).
MAX_WORD_CHARS = 16
REPLACE_PASSES = 8

# Above this many word TYPES the merge rounds switch from the
# driver-local loop to distributed pair-count partials. Natural-corpus
# type tables sit far below this even at web scale relative to corpus
# rows, but the guard keeps the driver honest regardless.
TYPES_DRIVER_LIMIT = 2_000_000


def _pad(word: str) -> str:
    """Space-separated, space-padded symbol string for one word."""
    return " " + " ".join(word[:MAX_WORD_CHARS]) + " "


def word_types(ds, text_col: str = "text"):
    """(s, f) word-type Dataset: padded symbol string + corpus
    frequency. Combiner pattern — Arrow hash-aggregate partials per
    batch, one type-table-sized shuffle."""
    from ray.data.aggregate import Sum

    def _partial(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        flat = [w for t in texts for w in (t or "").split()]
        t = pa.table({"w": pa.array(flat, pa.string())})
        g = pa.TableGroupBy(t, ["w"]).aggregate([([], "count_all")])
        return pa.table({"w": g.column("w"),
                         "_f": g.column("count_all")})

    types = (ds.map_batches(_partial, batch_format="pyarrow")
             .groupby("w").aggregate(Sum("_f", alias_name="f")))

    def _to_sym(b: pa.Table) -> pa.Table:
        words = b.column("w").to_pylist()
        return pa.table({
            "s": pa.array([_pad(w) for w in words], pa.string()),
            "f": pa.array(b.column("f").to_numpy().astype(np.int64)),
        })

    # _to_sym consumes groupby-shuffle output, which can include
    # zero-row EMPTY-SCHEMA blocks — skip_empty both survives them and
    # pins the output schema
    return types.map_batches(skip_empty(_to_sym, _SYM_SCHEMA),
                             batch_format="pyarrow")


def _pair_counter(strings, freqs) -> Counter:
    """Weighted adjacent-pair counts over padded symbol strings.
    Every adjacent position counts (overlaps included), matching the
    canonical BPE statistic and the SQL replay's position expansion."""
    c: Counter = Counter()
    for s, f in zip(strings, freqs):
        sym = s.split()
        f = int(f)
        for a, b in zip(sym, sym[1:]):
            c[a + " " + b] += f
    return c


def apply_merge(s: str, pair: str) -> str:
    """Replace-to-fixpoint application of one merge to a padded symbol
    string (== BPE's left-to-right greedy scan; see module docstring).
    Terminates in <= REPLACE_PASSES passes for truncated words."""
    src = " " + pair + " "
    dst = " " + pair.replace(" ", "") + " "
    while src in s:
        s = s.replace(src, dst)
    return s


def _best_pair(counts: Counter):
    if not counts:
        return None
    return min(counts.items(), key=lambda kv: (-kv[1], kv[0]))


def train_bpe(ds, num_merges: int = 10, text_col: str = "text",
              driver_limit: int = TYPES_DRIVER_LIMIT) -> pa.Table:
    """Learn ``num_merges`` BPE merges from a document Dataset.

    Returns the merge table (merge_rank, pair, n) — rank is 1-based
    learning order, pair the space-separated symbol pair merged that
    round, n its weighted count at selection time. Stops early if the
    type table runs out of adjacent pairs."""
    types = word_types(ds, text_col=text_col).materialize()
    merges: list[tuple[int, str, int]] = []

    if types.count() <= driver_limit:
        blocks = nonempty_arrow_blocks(types)
        strings = [s for b in blocks for s in b.column("s").to_pylist()]
        freqs = np.concatenate(
            [b.column("f").to_numpy() for b in blocks]) if blocks else \
            np.array([], np.int64)
        for r in range(1, num_merges + 1):
            best = _best_pair(_pair_counter(strings, freqs))
            if best is None:
                break
            merges.append((r, best[0], int(best[1])))
            strings = [apply_merge(s, best[0]) for s in strings]
    else:
        for r in range(1, num_merges + 1):
            def _partial(b: pa.Table) -> pa.Table:
                c = _pair_counter(b.column("s").to_pylist(),
                                  b.column("f").to_numpy())
                return pa.table({
                    "pr": pa.array(list(c.keys()), pa.string()),
                    "n": pa.array(list(c.values()), pa.int64()),
                })

            # partials are pair-vocab-sized per block; the driver folds
            # only that, never the type table itself
            total: Counter = Counter()
            for part in nonempty_batches(types.map_batches(
                    skip_empty(_partial, _PAIR_SCHEMA),
                    batch_format="pyarrow")):
                for pr, n in zip(part.column("pr").to_pylist(),
                                 part.column("n").to_numpy()):
                    total[pr] += int(n)
            best = _best_pair(total)
            if best is None:
                break
            merges.append((r, best[0], int(best[1])))
            pair = best[0]

            def _apply(b: pa.Table, _pair=pair) -> pa.Table:
                return pa.table({
                    "s": pa.array([apply_merge(s, _pair)
                                   for s in b.column("s").to_pylist()],
                                  pa.string()),
                    "f": b.column("f"),
                })

            types = types.map_batches(
                skip_empty(_apply, _SYM_SCHEMA),
                batch_format="pyarrow").materialize()

    return pa.table({
        "merge_rank": pa.array([m[0] for m in merges], pa.int64()),
        "pair": pa.array([m[1] for m in merges], pa.string()),
        "n": pa.array([m[2] for m in merges], pa.int64()),
    })


def encode_word(word: str, merges: list[str]) -> list[str]:
    """Segment one word with a learned merge list (applied in learning
    order — the standard BPE inference rule)."""
    s = _pad(word)
    for pair in merges:
        s = apply_merge(s, pair)
    return s.split()


class BpeEncoder:
    """Actor-pool encode stage: merges list broadcast once via the
    object store, per-word segmentations memoised per actor.

    Emits (id, pos, piece) rows — pos is the 1-based subword position
    within the document."""

    def __init__(self, merges_ref, id_col: str = "doc_id",
                 text_col: str = "text"):
        import ray
        self._merges = (ray.get(merges_ref)
                        if not isinstance(merges_ref, list) else merges_ref)
        self._memo: dict[str, list[str]] = {}
        self._id, self._text = id_col, text_col

    def _pieces(self, word: str) -> list[str]:
        got = self._memo.get(word)
        if got is None:
            got = self._memo[word] = encode_word(word, self._merges)
        return got

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b.column(self._id).to_pylist()
        texts = b.column(self._text).to_pylist()
        out_id, out_pos, out_piece = [], [], []
        for i, t in zip(ids, texts):
            pos = 0
            for w in (t or "").split():
                for p in self._pieces(w):
                    pos += 1
                    out_id.append(i)
                    out_pos.append(pos)
                    out_piece.append(p)
        return pa.table({
            self._id: pa.array(out_id, pa.int64()),
            "pos": pa.array(out_pos, pa.int64()),
            "piece": pa.array(out_piece, pa.string()),
        })


def encode_bpe(ds, merges: list[str], id_col: str = "doc_id",
               text_col: str = "text", concurrency: int = 4):
    """Encode a document Dataset into (id, pos, piece) subword rows
    using a learned merge list (see ``train_bpe``)."""
    import ray

    ref = ray.put(list(merges))
    return ds.map_batches(
        BpeEncoder, fn_constructor_args=(ref, id_col, text_col),
        batch_format="pyarrow", concurrency=concurrency)
