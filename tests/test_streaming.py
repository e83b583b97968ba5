"""Watermarked out-of-order windowing (ops/streaming.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayspatial.ops.streaming import WatermarkWindower


def brute(ts, vals, width_us, lateness_us):
    """Reference semantics: per-event running-max watermark; aggregate
    only events not late at arrival."""
    out = {}
    wm = -(2**62)
    for t, v in zip(ts, vals):
        if t >= wm:
            w = (t // width_us) * width_us
            n, s = out.get(w, (0, 0))
            out[w] = (n + 1, s + v)
        wm = max(wm, t - lateness_us)
    return out


def test_windower_matches_brute_and_counts_late():
    rng = np.random.default_rng(3)
    n = 5000
    base = np.arange(n, dtype=np.int64) * 1_000_000  # 1 event/sec
    jitter = rng.integers(-1200, 1200, n) * 1_000_000  # +-20 min disorder
    ts = base + jitter
    vals = rng.integers(1, 100, n)
    wd = WatermarkWindower(width_s=3600, lateness_s=600)
    got = {}
    for w, cnt, s in wd.process(ts, vals) + wd.flush():
        got[w] = (cnt, s)
    ref = brute(ts, vals, 3600 * 1_000_000, 600 * 1_000_000)
    assert got == ref
    total_kept = sum(c for c, _ in ref.values())
    assert wd.late_dropped == n - total_kept
    assert wd.late_dropped > 0  # disorder actually exercised lateness


def test_windower_chunking_invariant():
    rng = np.random.default_rng(9)
    n = 3000
    ts = (np.arange(n, dtype=np.int64) * 900_000
          + rng.integers(-900, 900, n) * 1_000_000)
    vals = rng.integers(1, 10, n)

    def run(chunk):
        wd = WatermarkWindower(width_s=600, lateness_s=120)
        rows = []
        for s in range(0, n, chunk):
            rows.extend(wd.process(ts[s : s + chunk], vals[s : s + chunk]))
        rows.extend(wd.flush())
        return sorted(rows)

    assert run(1) == run(64) == run(n)


def test_windower_emits_on_watermark():
    """A window emits as soon as the watermark passes its end, not only
    at flush."""
    wd = WatermarkWindower(width_s=10, lateness_s=0)
    us = 1_000_000
    out1 = wd.process(np.array([1 * us, 5 * us]), np.array([1, 1]))
    assert out1 == []  # window [0,10) still open
    out2 = wd.process(np.array([11 * us]), np.array([1]))
    assert out2 == [(0, 2, 2)]  # closed by the watermark
    assert wd.flush() == [(10 * us, 1, 1)]


def test_streaming_tumbling_window_distributed(ray_session):
    import ray.data as rd

    from rayspatial.ops.streaming import streaming_tumbling_window

    rng = np.random.default_rng(5)
    n = 20_000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 50, n),
        "ts": pd.to_datetime(
            (np.arange(n, dtype=np.int64) * 500_000
             + rng.integers(-600, 600, n) * 1_000_000)
            .clip(min=0),
            unit="us",
        ),
        "value": rng.integers(1, 100, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(8)
    got = (
        streaming_tumbling_window(ds, width_s=600, lateness_s=120,
                                  num_partitions=4)
        .to_pandas()
        .sort_values(["part", "window_start"])
        .reset_index(drop=True)
    )
    # per-partition brute force
    rows = []
    for part in range(4):
        g = df[df.user_id % 4 == part].sort_values("event_id")
        ref = brute(
            g["ts"].astype("int64").to_numpy(), g["value"].to_numpy(),
            600 * 1_000_000, 120 * 1_000_000,
        )
        for w, (cnt, s) in sorted(ref.items()):
            rows.append((part, w, cnt, s))
    ref_df = pd.DataFrame(rows, columns=["part", "window_start", "n_events", "sum_value"])
    ref_df["window_start"] = ref_df["window_start"].astype("datetime64[us]")
    assert len(got) == len(ref_df)
    assert (got["n_events"].to_numpy() == ref_df["n_events"].to_numpy()).all()
    assert (got["sum_value"].to_numpy() == ref_df["sum_value"].to_numpy()).all()
    assert (got["window_start"].to_numpy() == ref_df["window_start"].to_numpy()).all()
