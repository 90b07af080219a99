"""Event-time windows over the ordered-log model (events table).

Ray Data has no native event-time windowing (ray_guide "Streaming-shaped
workloads"); windows are expressed as groupbys over derived window keys
(tumbling/sliding — pure column arithmetic, perfectly parallel) or as
per-key ``map_groups`` over ts-sorted groups (session windows, which
need gap detection and therefore ordering within the key).

All three are deterministic: ties on ts are broken by event_id, and the
SQL-oracle formulations in the query suite replay the same semantics
with window functions (gaps-and-islands for sessions).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _ts_us(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype("datetime64[us]").view("int64")


def tumbling_window_key(batch: pa.Table, ts_col: str = "ts",
                        width_s: int = 3600,
                        out_col: str = "window_start") -> pa.Table:
    us = _ts_us(batch.column(ts_col))
    key = us // (width_s * 1_000_000)
    return batch.append_column(out_col, pa.array(key, pa.int64()))


def sliding_window_explode(batch: pa.Table, ts_col: str = "ts",
                           width_s: int = 3600, step_s: int = 900) -> pa.Table:
    """Each event joins every window containing it (width/step copies)."""
    if width_s % step_s:
        raise ValueError("width must be a multiple of step")
    k = width_s // step_s
    us = _ts_us(batch.column(ts_col))
    base = us // (step_s * 1_000_000)
    parts = []
    for j in range(k):
        t = batch.append_column("window_id",
                                pa.array(base - j, pa.int64()))
        parts.append(t)
    return pa.concat_tables(parts)


def session_windows(events_ds, gap_s: int = 1800,
                    key_col: str = "user_id", ts_col: str = "ts",
                    value_col: str = "value"):
    """Per-key session windows (gap > gap_s starts a new session).

    -> rows (key, session_id (1-based in ts order), n_events,
    session_start, session_end, value_sum). groupby(key).map_groups over
    ts-sorted groups; user counts are bounded, so groups stay small.
    """
    gap_us = gap_s * 1_000_000

    def _sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, "event_id"])
        us = g[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        new_session = np.ones(len(g), dtype=np.int64)
        new_session[1:] = (np.diff(us) > gap_us).astype(np.int64)
        sid = np.cumsum(new_session)
        g = g.assign(session_id=sid)
        out = g.groupby("session_id").agg(
            n_events=("event_id", "size"),
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            value_sum=(value_col, "sum"),
        ).reset_index()
        out.insert(0, key_col, g[key_col].iloc[0])
        return out

    return events_ds.groupby(key_col).map_groups(
        _sessions, batch_format="pandas")
