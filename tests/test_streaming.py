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
