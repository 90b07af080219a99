import numpy as np
import pandas as pd
import pytest

from geoflow.stages.streaming import streaming_sessionize
from geoflow.stages.windows import session_windows


def test_streaming_matches_batch_sessionizer(ray_session):
    import ray.data as rd
    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["user_id", "event_id", "ts", "value"])
    got = streaming_sessionize(ds, gap_s=1800, n_buckets=3)

    batch = session_windows(ds, gap_s=1800).to_pandas()
    batch["session_start_us"] = batch["session_start"].to_numpy(
    ).astype("datetime64[us]").view("int64")
    batch["session_end_us"] = batch["session_end"].to_numpy(
    ).astype("datetime64[us]").view("int64")
    exp = batch[["user_id", "session_id", "n_events", "session_start_us",
                 "session_end_us", "value_sum"]].sort_values(
        ["user_id", "session_id"]).reset_index(drop=True)
    got = got.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert len(got) == len(exp)
    for c in ("user_id", "session_id", "n_events",
              "session_start_us", "session_end_us"):
        assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
    np.testing.assert_allclose(got["value_sum"], exp["value_sum"], rtol=1e-9)


def test_streaming_empty(ray_session):
    import ray.data as rd
    empty = rd.from_pandas(pd.DataFrame(
        {"user_id": pd.Series(dtype=np.int64),
         "event_id": pd.Series(dtype=np.int64),
         "ts": pd.Series(dtype="datetime64[us]"),
         "value": pd.Series(dtype=np.float64)}))
    out = streaming_sessionize(empty, n_buckets=2)
    assert len(out) == 0


def test_watermark_window_matches_batch(ray_session):
    import ray.data as rd
    from geoflow.stages.streaming import streaming_window_aggregate

    ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["event_id", "event_type", "ts", "value"])
    ev = ds.to_pandas()
    got, dropped = streaming_window_aggregate(
        ds, width_s=3600, key_col="event_type",
        allowed_lateness_s=0, n_buckets=3)
    assert dropped == 0
    exp = (ev.assign(window_id=ev["ts"].astype("datetime64[us]")
                     .astype(np.int64) // 3_600_000_000)
             .groupby(["event_type", "window_id"])
             .agg(n_events=("value", "size"), value_sum=("value", "sum"))
             .reset_index())
    gs = got.sort_values(["event_type", "window_id"]).reset_index(drop=True)
    es = exp.sort_values(["event_type", "window_id"]).reset_index(drop=True)
    assert (gs["n_events"].to_numpy() == es["n_events"].to_numpy()).all()
    assert np.allclose(gs["value_sum"], es["value_sum"])


def test_replay_watermark_drops_late_events_dataset_path(ray_session):
    """Disordered feed through the DISTRIBUTED replay (arrival_col):
    same late-drop contract as the actor."""
    import ray.data as rd
    from geoflow.stages.streaming import streaming_window_aggregate

    h = 3_600_000_000
    base = np.datetime64("2024-01-01", "us")
    ev = pd.DataFrame({
        "event_id": [0, 1, 2, 3],
        "arrival": [0, 1, 2, 3],
        "event_type": ["x"] * 4,
        "ts": base + np.array([10, 20, 2 * h + 5, 30]).astype(
            "timedelta64[us]"),
        "value": [1.0, 2.0, 4.0, 8.0],
    })
    got, dropped = streaming_window_aggregate(
        rd.from_pandas(ev), width_s=3600, key_col="event_type",
        allowed_lateness_s=0, n_buckets=2, arrival_col="arrival")
    assert dropped == 1            # the ts=30 row arrives behind watermark
    rows = {(r.event_type, r.window_id): (r.n_events, r.value_sum)
            for r in got.itertuples(index=False)}
    w0 = int((base.astype(np.int64)) // h)
    assert rows[("x", w0)] == (2, 3.0)
    assert rows[("x", w0 + 2)] == (1, 4.0)
    # within-lateness disorder is absorbed
    got2, dropped2 = streaming_window_aggregate(
        rd.from_pandas(ev), width_s=3600, key_col="event_type",
        allowed_lateness_s=7200, n_buckets=2, arrival_col="arrival")
    assert dropped2 == 0
    rows2 = {(r.event_type, r.window_id): (r.n_events, r.value_sum)
             for r in got2.itertuples(index=False)}
    assert rows2[("x", w0)] == (3, 11.0)


def test_watermark_drops_late_events(ray_session):
    import ray
    from geoflow.stages.streaming import WindowActor

    a = WindowActor.remote(3_600_000_000, 0)   # 1h windows, no lateness
    h = 3_600_000_000
    # window 0 data, then window 2 (watermark jumps to 2h -> closes 0,1)
    ray.get(a.ingest.remote(["x", "x"], np.array([10, 20], dtype=np.int64),
                            np.array([1.0, 2.0])))
    ray.get(a.ingest.remote(["x"], np.array([2 * h + 5]), np.array([4.0])))
    # late arrival for window 0: must be dropped, not merged
    ray.get(a.ingest.remote(["x"], np.array([30]), np.array([8.0])))
    out, dropped = ray.get(a.flush.remote())
    assert dropped == 1
    rows = {(k, w): (n, s) for k, w, n, s in out}
    assert rows[("x", 0)] == (2, 3.0)          # late 8.0 not included
    assert rows[("x", 2)] == (1, 4.0)


def test_watermark_accepts_disorder_within_lateness(ray_session):
    import ray
    from geoflow.stages.streaming import WindowActor

    h = 3_600_000_000
    a = WindowActor.remote(h, 2 * h)           # lateness 2 windows
    ray.get(a.ingest.remote(["x"], np.array([2 * h + 5]), np.array([4.0])))
    ray.get(a.ingest.remote(["x"], np.array([30]), np.array([8.0])))
    out, dropped = ray.get(a.flush.remote())
    assert dropped == 0
    rows = {(k, w): (n, s) for k, w, n, s in out}
    assert rows[("x", 0)] == (1, 8.0)          # disorder absorbed
