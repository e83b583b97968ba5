"""Windowed aggregate + sessionization tests vs in-process pandas."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_df():
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def test_tumbling_window(ray_session, events_df):
    from rayspatial.ops.window import tumbling_window
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{SF}/events.parquet",
                            columns=["ts", "event_type", "value"])
    got = (
        tumbling_window(ds, width_s=3600, keys=["event_type"])
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    df = events_df.copy()
    df["window_start"] = df["ts"].dt.floor("1h")
    ref = (
        df.groupby(["window_start", "event_type"])
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    assert (got["n_events"] == ref["n_events"]).all()
    assert np.allclose(got["sum_value"], ref["sum_value"])
    assert (got["window_start"] == ref["window_start"]).all()


def test_sessionize(ray_session, events_df):
    from rayspatial.ops.window import sessionize
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{SF}/events.parquet",
                            columns=["event_id", "ts", "user_id", "value"])
    got = (
        sessionize(ds, gap_s=1800)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    # brute-force per user
    rows = []
    for uid, g in events_df.sort_values(["ts", "event_id"]).groupby("user_id"):
        ts = g["ts"].astype("int64").to_numpy()
        brk = np.r_[True, np.diff(ts) > 1800 * 1_000_000]
        sid = np.cumsum(brk) - 1
        for s in np.unique(sid):
            seg = g.iloc[sid == s]
            rows.append(
                (uid, seg["ts"].min(), seg["ts"].max(), len(seg), seg["value"].sum())
            )
    ref = pd.DataFrame(
        rows, columns=["user_id", "session_start", "session_end", "n_events", "sum_value"]
    ).sort_values(["user_id", "session_start"]).reset_index(drop=True)
    assert len(got) == len(ref)
    assert (got["n_events"].to_numpy() == ref["n_events"].to_numpy()).all()
    assert (got["session_start"].to_numpy() == ref["session_start"].to_numpy()).all()
    assert (got["session_end"].to_numpy() == ref["session_end"].to_numpy()).all()
    # sessions respect the gap: no intra-session gap exceeds it
    assert (
        (got["session_end"] - got["session_start"]).dt.total_seconds()
        >= 0
    ).all()


def test_sliding_window(ray_session, events_df):
    from rayspatial.ops.window import sliding_window
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{SF}/events.parquet", columns=["ts", "value"])
    got = (
        sliding_window(ds, width_s=3600, slide_s=1800)
        .to_pandas()
        .set_index("window_start")
        .sort_index()
    )
    # brute force: every event counted in width/slide = 2 windows
    assert got["n_events"].sum() == 2 * len(events_df)
    ts = events_df["ts"].astype("int64")
    for ws, row in got.head(5).iterrows():
        w0 = ws.value // 1000  # ns -> us
        n = ((ts >= w0) & (ts < w0 + 3600 * 1_000_000)).sum()
        assert row["n_events"] == n


def test_top_k_by_group(ray_session, events_df):
    from rayspatial.ops.window import top_k_by_group
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{SF}/events.parquet", columns=["user_id", "value"])
    got = top_k_by_group(ds, ["user_id"], "value", k=5).to_pandas()
    ref = (
        events_df.groupby("user_id")["value"].sum()
        .sort_values(ascending=False).head(5)
    )
    assert list(got["user_id"]) == list(ref.index)
    assert np.allclose(got["v"], ref.to_numpy())
