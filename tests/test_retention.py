"""Retention cohorts: pandas brute parity, bucket-count invariance,
multi-day users counted once per (cohort, offset)."""

import numpy as np
import pandas as pd
import pytest


def brute(df: pd.DataFrame) -> pd.DataFrame:
    d = df.copy()
    d["day"] = d["ts"].astype("int64") // 86_400_000_000
    d = d.drop_duplicates(["user_id", "day"])
    d["cohort_day"] = d.groupby("user_id")["day"].transform("min")
    d["offset_days"] = d["day"] - d["cohort_day"]
    out = (d.groupby(["cohort_day", "offset_days"]).agg(
        n_users=("user_id", "nunique")).reset_index())
    return out.astype(np.int64)


def canon(df: pd.DataFrame) -> list:
    return sorted(map(tuple, df[["cohort_day", "offset_days",
                                 "n_users"]].to_numpy().tolist()))


@pytest.mark.parametrize("num_buckets", [1, 8])
def test_matches_brute(ray_session, num_buckets):
    import ray.data as rd

    from geoflow.stages.windows import retention_cohorts

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 150, n),
        "ts": pd.to_datetime(
            rng.integers(1_700_000_000, 1_700_000_000 + 40 * 86400, n),
            unit="s").astype("datetime64[us]"),
    })
    got = retention_cohorts(rd.from_pandas(df),
                            num_buckets=num_buckets).to_pandas()
    assert canon(got) == canon(brute(df))
    # offset-0 rows partition all users: cohort sizes sum to n users
    sizes = got[got["offset_days"] == 0]["n_users"].sum()
    assert sizes == df["user_id"].nunique()


def test_same_day_duplicates_counted_once(ray_session):
    import ray.data as rd

    from geoflow.stages.windows import retention_cohorts

    ts0 = pd.Timestamp("2024-01-01 03:00:00")
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "ts": pd.Series([ts0, ts0 + pd.Timedelta("1h"),
                         ts0 + pd.Timedelta("3D"), ts0]
                        ).astype("datetime64[us]"),
    })
    got = retention_cohorts(rd.from_pandas(df), num_buckets=2).to_pandas()
    assert canon(got) == canon(brute(df))
    d0 = got[(got["offset_days"] == 0)]["n_users"].sum()
    assert d0 == 2
