"""Incremental streaming state: actor-held session windows.

Ray Data has no watermarks; the ordered-log pattern (ray_guide
"Streaming-shaped workloads") is: treat the events table as a log
ordered by ts, shard state by key-hash bucket across ``@ray.remote``
actors, and feed each actor its bucket's rows in ts order. The actor
keeps the OPEN session per key (incremental state), emits a session the
moment the gap closes it, and a final ``flush`` drains what's still
open. This is the raw-actor escape hatch the Dataset API can't express
(the batch equivalent — per-key ``map_groups`` over the whole log — is
geoflow.stages.windows.session_windows; both produce identical rows,
tested against each other).

Ordering contract: the caller must deliver each bucket's rows in
non-decreasing (ts, event_id) order. ``streaming_sessionize`` satisfies
it by sorting the Dataset by (ts, event_id) and routing batches from the
sorted stream; in a true ingestion setting the upstream log supplies the
order per partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray


@ray.remote
class SessionActor:
    """Holds open sessions for the keys of one hash bucket."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        self.open: dict[int, dict] = {}
        self.closed: list[dict] = []

    def ingest(self, keys: np.ndarray, ts_us: np.ndarray,
               values: np.ndarray) -> int:
        for k, t, v in zip(keys.tolist(), ts_us.tolist(), values.tolist()):
            cur = self.open.get(k)
            if cur is not None and t - cur["end"] > self.gap_us:
                self.closed.append(cur)
                cur = None
            if cur is None:
                self.open[k] = {"key": k, "start": t, "end": t,
                                "n": 1, "value_sum": v}
            else:
                cur["end"] = t
                cur["n"] += 1
                cur["value_sum"] += v
        return len(self.closed)

    def flush(self) -> list[dict]:
        out = self.closed + sorted(self.open.values(),
                                   key=lambda s: (s["key"], s["start"]))
        self.open = {}
        self.closed = []
        return out


def streaming_sessionize(events_ds, gap_s: int = 1800, n_buckets: int = 4,
                         key_col: str = "user_id", ts_col: str = "ts",
                         value_col: str = "value") -> pd.DataFrame:
    """Sessionize via incremental actor state; rows match
    geoflow.stages.windows.session_windows (see module docstring).

    Returns (user_id, session_id, n_events, session_start_us,
    session_end_us, value_sum) with session_id numbered per key in ts
    order.
    """
    gap_us = gap_s * 1_000_000
    actors = [SessionActor.remote(gap_us) for _ in range(n_buckets)]
    ordered = events_ds.sort([ts_col, "event_id"])
    pending = []
    for batch in ordered.iter_batches(batch_size=8192,
                                      batch_format="pandas"):
        keys = batch[key_col].to_numpy().astype(np.int64)
        ts_us = batch[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        vals = batch[value_col].to_numpy().astype(np.float64)
        bucket = (keys % n_buckets).astype(np.int64)
        for bi in range(n_buckets):
            m = bucket == bi
            if m.any():
                # sequential per actor (ordering), pipelined across actors
                pending.append(actors[bi].ingest.remote(
                    keys[m], ts_us[m], vals[m]))
        if len(pending) > n_buckets * 4:
            ray.get(pending)
            pending = []
    ray.get(pending)
    rows: list[dict] = []
    for sessions in ray.get([a.flush.remote() for a in actors]):
        rows.extend(sessions)
    for a in actors:
        ray.kill(a)
    if not rows:
        return pd.DataFrame(columns=["user_id", "session_id", "n_events",
                                     "session_start_us", "session_end_us",
                                     "value_sum"])
    df = pd.DataFrame(rows).sort_values(["key", "start"])
    df["session_id"] = df.groupby("key").cumcount() + 1
    return pd.DataFrame({
        "user_id": df["key"].to_numpy(),
        "session_id": df["session_id"].to_numpy(np.int64),
        "n_events": df["n"].to_numpy(np.int64),
        "session_start_us": df["start"].to_numpy(np.int64),
        "session_end_us": df["end"].to_numpy(np.int64),
        "value_sum": df["value_sum"].to_numpy(np.float64),
    }).reset_index(drop=True)


@ray.remote
class WindowActor:
    """Watermarked tumbling-window aggregation for one hash bucket.

    Accepts out-of-order events up to ``lateness_us``: the watermark is
    ``max_ts_seen - lateness_us``; a window is finalized (emitted, state
    freed) the moment its end falls behind the watermark, and events
    older than the watermark are counted as dropped instead of mutating
    already-emitted results — the standard streaming contract Ray Data
    has no primitive for. State per actor is O(open windows), not
    O(events), so a day-long log holds ~lateness/width windows per key.
    """

    def __init__(self, width_us: int, lateness_us: int):
        self.width_us = width_us
        self.lateness_us = lateness_us
        self.watermark = None
        self.open: dict[tuple, list] = {}     # (key, win) -> [n, vsum]
        self.emitted: list[tuple] = []
        self.dropped = 0

    def ingest(self, keys: list, ts_us: np.ndarray,
               values: np.ndarray) -> None:
        if not (len(keys) == len(ts_us) == len(values)):
            raise ValueError("keys/ts/values length mismatch")
        wins = (ts_us // self.width_us).tolist()
        for k, w, t, v in zip(keys, wins, ts_us.tolist(), values.tolist()):
            if (self.watermark is not None
                    and (w + 1) * self.width_us <= self.watermark):
                self.dropped += 1
                continue
            st = self.open.get((k, w))
            if st is None:
                self.open[(k, w)] = [1, v]
            else:
                st[0] += 1
                st[1] += v
        wm = int(ts_us.max()) - self.lateness_us
        if self.watermark is None or wm > self.watermark:
            self.watermark = wm
            for (k, w) in [kw for kw in self.open
                           if (kw[1] + 1) * self.width_us <= wm]:
                n, s = self.open.pop((k, w))
                self.emitted.append((k, w, n, s))

    def flush(self) -> tuple[list[tuple], int]:
        out = self.emitted + [(k, w, n, s)
                              for (k, w), (n, s) in self.open.items()]
        self.open = {}
        self.emitted = []
        return out, self.dropped


def streaming_window_aggregate(events_ds, width_s: int = 3600,
                               key_col: str = "event_type",
                               ts_col: str = "ts", value_col: str = "value",
                               allowed_lateness_s: int = 0,
                               n_buckets: int = 4):
    """Tumbling-window count/sum with watermark semantics.

    Same ordered-log shape as ``streaming_sessionize`` (per-bucket
    actors, ts-sorted feed); with in-order delivery nothing drops and
    the result equals the batch groupby (DuckDB-verified as
    ``events_hourly_streaming``); under disorder the watermark contract
    applies (tested with shuffled feeds in tests/test_streaming.py).

    Returns (DataFrame[key, window_id, n_events, value_sum],
    dropped_count).
    """
    width_us = width_s * 1_000_000
    late_us = allowed_lateness_s * 1_000_000
    actors = [WindowActor.remote(width_us, late_us)
              for _ in range(n_buckets)]
    ordered = events_ds.sort([ts_col, "event_id"])
    pending = []
    for batch in ordered.iter_batches(batch_size=8192,
                                      batch_format="pandas"):
        keys = batch[key_col].to_numpy()
        ts_us = batch[ts_col].to_numpy().astype("datetime64[us]").view("int64")
        vals = batch[value_col].to_numpy().astype(np.float64)
        bucket = pd.util.hash_array(keys) % n_buckets
        for bi in range(n_buckets):
            m = bucket == bi
            if m.any():
                pending.append(actors[bi].ingest.remote(
                    keys[m].tolist(), ts_us[m], vals[m]))
        if len(pending) > n_buckets * 4:
            ray.get(pending)
            pending = []
    ray.get(pending)
    rows, dropped = [], 0
    for out, d in ray.get([a.flush.remote() for a in actors]):
        rows.extend(out)
        dropped += d
    df = pd.DataFrame(rows, columns=[key_col, "window_id", "n_events",
                                     "value_sum"])
    df["window_id"] = df["window_id"].astype(np.int64)
    df["n_events"] = df["n_events"].astype(np.int64)
    return df.sort_values([key_col, "window_id"]).reset_index(drop=True), \
        dropped
