"""resample_ffill (ops/resample.py): serial-reference equality,
chunking invariance, sentinel semantics, equal-timestamp tie-break."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _serial(df, steps, sentinel=-1):
    rows = []
    for u in np.unique(df["user_id"]):
        g = df[df["user_id"] == u]
        for t in steps:
            m = g[g["us"] <= t]
            if len(m):
                m = m.sort_values(["us", "event_id"]).iloc[-1]
                rows.append((u, t, m["event_id"], m["value_cents"]))
            else:
                rows.append((u, t, sentinel, sentinel))
    out = pd.DataFrame(rows, columns=["user_id", "grid_us", "event_id",
                                      "value_cents"])
    return out.sort_values(["user_id", "grid_us"]).reset_index(drop=True)


def _events_table(df):
    return pa.table({
        "user_id": pa.array(df["user_id"].to_numpy()),
        "ts": pa.array(df["us"].to_numpy()).cast(pa.timestamp("us")),
        "event_id": pa.array(df["event_id"].to_numpy()),
        "value_cents": pa.array(df["value_cents"].to_numpy()),
    })


def test_resample_matches_serial_reference(ray_session):
    import ray.data as rd

    from rayspatial.ops.resample import resample_ffill

    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "us": rng.integers(0, 1_000_000, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "value_cents": rng.integers(-500, 500, n).astype(np.int64),
    })
    # duplicate-timestamp pairs to exercise the greatest-id tie rule
    df.loc[1, ["user_id", "us"]] = df.loc[0, ["user_id", "us"]]
    steps = np.arange(0, 1_200_000, 100_000, dtype=np.int64)
    exp = _serial(df, steps)
    for parts in (1, 9):
        ds = rd.from_arrow(_events_table(df)).repartition(parts)
        got = resample_ffill(
            ds, by="user_id", ts_col="ts", id_col="event_id",
            value_col="value_cents", start_us=0, end_us=1_200_000,
            step_us=100_000,
        ).to_pandas().sort_values(["user_id", "grid_us"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[exp.columns].astype(np.int64), exp.astype(np.int64)),


def test_resample_sentinel_and_validation(ray_session):
    import ray.data as rd

    from rayspatial.ops.resample import resample_ffill

    df = pd.DataFrame({
        "user_id": np.array([7], dtype=np.int64),
        "us": np.array([500], dtype=np.int64),
        "event_id": np.array([1], dtype=np.int64),
        "value_cents": np.array([42], dtype=np.int64),
    })
    ds = rd.from_arrow(_events_table(df))
    out = resample_ffill(ds, by="user_id", ts_col="ts",
                         id_col="event_id", value_col="value_cents",
                         start_us=0, end_us=1500, step_us=500,
                         sentinel=-9).to_pandas()
    assert list(out["grid_us"]) == [0, 500, 1000]
    assert list(out["event_id"]) == [-9, 1, 1]       # tick 0 pre-first-event
    assert list(out["value_cents"]) == [-9, 42, 42]  # exact-match fills
    with pytest.raises(ValueError):
        resample_ffill(ds, by="user_id", ts_col="ts", id_col="event_id",
                       value_col="value_cents", start_us=0, end_us=0,
                       step_us=500)
