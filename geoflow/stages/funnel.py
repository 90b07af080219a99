"""Ordered-sequence funnel matching (MATCH_RECOGNIZE-lite).

First-touch funnel over an ordered step list (e.g. view -> click ->
purchase): per key, anchor at the FIRST step-0 event, then each later
step matches the first event of its type STRICTLY after the previous
step's timestamp; the chain completes if the last step lands within
``window_s`` of the anchor. Deterministic greedy semantics — exactly
replayable in SQL as a chain of min-over-later-events aggregates.

Scale shape: one hash-bucket shuffle on the key (same plan as the
window/session family), then each step is ONE ``pd.merge_asof``
(direction='forward', allow_exact_matches=False) inside the bucket —
vectorized C search over ts-sorted frames, no per-user Python. State
never leaves the bucket; buckets bound reducer memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def funnel_first_completion(events_ds, steps: list[str],
                            window_s: int | None,
                            key_col: str = "user_id",
                            ts_col: str = "ts",
                            type_col: str = "event_type",
                            num_buckets: int = 32):
    """Rows (key, step0_ts, step1_ts, ...) — completed chains only,
    timestamps as int64 epoch microseconds."""
    from ..functions.joins import _mix64

    def _bucket(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_numpy().astype(np.int64)
        return b.append_column(
            "_b", pa.array((_mix64(keys) % np.uint64(num_buckets))
                           .astype(np.int32)))

    names = [f"step{i}_ts" for i in range(len(steps))]

    def _match(g: pd.DataFrame) -> pd.DataFrame:
        ts_us = g[ts_col].to_numpy().astype("datetime64[us]") \
            .view("int64")
        g = pd.DataFrame({key_col: g[key_col].to_numpy(),
                          "_t": ts_us,
                          type_col: g[type_col].to_numpy()})
        cur = (g[g[type_col] == steps[0]]
               .groupby(key_col, as_index=False)
               .agg(**{names[0]: ("_t", "min")}))
        for i, st in enumerate(steps[1:], start=1):
            nxt = (g[g[type_col] == st][[key_col, "_t"]]
                   .sort_values("_t", kind="stable"))
            cur = pd.merge_asof(
                cur.sort_values(names[i - 1], kind="stable"),
                nxt.rename(columns={"_t": names[i]}),
                left_on=names[i - 1], right_on=names[i],
                by=key_col, direction="forward",
                allow_exact_matches=False)
            cur = cur[cur[names[i]].notna()]
            cur[names[i]] = cur[names[i]].astype(np.int64)
        if window_s is not None and len(cur):
            cur = cur[cur[names[-1]] - cur[names[0]]
                      <= window_s * 1_000_000]
        out = cur[[key_col] + names].reset_index(drop=True)
        return out.astype(np.int64)

    return (events_ds.map_batches(_bucket, batch_format="pyarrow")
            .groupby("_b").map_groups(_match, batch_format="pandas"))
