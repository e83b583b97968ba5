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


def _ssj_brute(l: pd.DataFrame, r: pd.DataFrame, P, before_us, after_us,
               lateness_us):
    """Python reference: per-stream per-partition watermark drop, then
    an O(n^2) interval join over survivors."""
    def survivors(df):
        keep, late = [], 0
        for part in range(P):
            g = df[df.user_id % P == part].sort_values("event_id")
            wm = -(2 ** 62)
            for _, row in g.iterrows():
                t = int(row.ts)
                if t < wm - lateness_us:
                    late += 1
                else:
                    keep.append(row)
                wm = max(wm, t)
        return pd.DataFrame(keep), late

    lk, n_l = survivors(l)
    rk, n_r = survivors(r)
    pairs = []
    for _, lrow in lk.iterrows():
        m = rk[(rk.user_id == lrow.user_id)
               & (rk.ts >= lrow.ts - before_us)
               & (rk.ts <= lrow.ts + after_us)]
        for _, rrow in m.iterrows():
            pairs.append((int(lrow.user_id) % P, int(lrow.user_id),
                          int(lrow.event_id), int(rrow.event_id),
                          int(lrow.ts), int(rrow.ts)))
    ref = pd.DataFrame(pairs, columns=["part", "key", "l_id", "r_id",
                                       "l_ts", "r_ts"])
    return ref.sort_values(["l_id", "r_id"]).reset_index(drop=True), n_l, n_r


def test_streaming_interval_join_vs_brute(ray_session):
    """Stream-stream watermarked join == Python per-event-watermark +
    O(n^2) interval-join reference, including late-drop accounting."""
    import ray.data as rd

    from rayspatial.ops.streaming import streaming_interval_join

    def mk(n, seed):
        rng = np.random.default_rng(seed)
        return pd.DataFrame({
            "event_id": np.arange(n, dtype=np.int64),
            "ts": rng.integers(0, 6 * 3600, n) * 1_000_000,
            "user_id": rng.integers(0, 12, n).astype(np.int64),
        })

    l, r = mk(600, 1), mk(600, 2)
    P, b, a, lat = 4, 900, 300, 600
    ref, n_l, n_r = _ssj_brute(l, r, P, b * 1_000_000, a * 1_000_000,
                               lat * 1_000_000)
    lds, rds = rd.from_pandas(l).repartition(5), rd.from_pandas(r).repartition(3)
    got = streaming_interval_join(
        lds, rds, before_s=b, after_s=a, lateness_s=lat, num_partitions=P
    ).to_pandas().sort_values(["l_id", "r_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)
    late = streaming_interval_join(
        lds, rds, before_s=b, after_s=a, lateness_s=lat, num_partitions=P,
        output="late").to_pandas()
    assert int(late[late.side == 0]["n_late"].sum()) == n_l
    assert int(late[late.side == 1]["n_late"].sum()) == n_r


def test_streaming_interval_join_chunking_invariant(ray_session):
    """Input block boundaries must not change results (per-event
    watermark contract)."""
    import ray.data as rd

    from rayspatial.ops.streaming import streaming_interval_join

    rng = np.random.default_rng(9)
    n = 2000
    mk = lambda s: pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": np.random.default_rng(s).integers(0, 86_400, n) * 1_000_000,
        "user_id": np.random.default_rng(s + 7).integers(0, 30, n).astype(np.int64),
    })
    l, r = mk(1), mk(2)
    outs = []
    for pl, pr in [(1, 1), (17, 3), (4, 29)]:
        outs.append(streaming_interval_join(
            rd.from_pandas(l).repartition(pl),
            rd.from_pandas(r).repartition(pr),
            before_s=1800, after_s=0, lateness_s=300, num_partitions=8
        ).to_pandas().sort_values(["l_id", "r_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_interval_joiner_actor_matches_batch_operator(ray_session):
    """The live per-partition IntervalJoiner (symmetric hash join with
    watermark eviction) must emit exactly the batch operator's pairs
    for any chunking of the interleaved arrival stream, and its buffer
    must stay bounded (eviction horizon, not the stream)."""
    import ray.data as rd

    from rayspatial.ops.streaming import (IntervalJoiner,
                                          streaming_interval_join)

    rng = np.random.default_rng(12)
    n = 4000
    mk = lambda s: pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": np.sort(np.random.default_rng(s).integers(
            0, 10 * 86_400, n)) * 1_000_000
        + np.random.default_rng(s + 1).integers(-900, 900, n) * 1_000_000,
        "user_id": np.random.default_rng(s + 2).integers(0, 6, n).astype(np.int64),
    })
    l, r = mk(1), mk(2)
    P, b, a, lat = 1, 600, 120, 300   # one partition: feed ALL keys
    ref = streaming_interval_join(
        rd.from_pandas(l), rd.from_pandas(r),
        before_s=b, after_s=a, lateness_s=lat, num_partitions=P
    ).to_pandas().sort_values(["l_id", "r_id"]).reset_index(drop=True)

    # interleave the two streams in (event_id) arrival order, as the
    # partition router would deliver them, then feed uneven chunks
    both = pd.concat([l.assign(_side=0), r.assign(_side=1)],
                     ignore_index=True).sort_values(
        ["event_id", "_side"], kind="stable").reset_index(drop=True)
    ij = IntervalJoiner(before_s=b, after_s=a, lateness_s=lat)
    pairs = []
    i = 0
    sizes = [1, 7, 64, 3, 128]
    while i < len(both):
        c = both.iloc[i:i + sizes[i % len(sizes)]]
        pairs += ij.process(c["_side"].to_numpy(), c["user_id"].to_numpy(),
                            c["ts"].astype("int64").to_numpy(),
                            c["event_id"].to_numpy())
        i += len(c)
    pairs += ij.flush()
    got = pd.DataFrame(pairs, columns=["key", "l_id", "r_id", "l_ts", "r_ts"]
                       ).sort_values(["l_id", "r_id"]).reset_index(drop=True)
    assert len(got) == len(ref)
    for c in ("key", "l_id", "r_id", "l_ts", "r_ts"):
        assert (got[c].to_numpy() == ref[c].to_numpy()).all(), c
    # bounded state: with a ~12-minute horizon over 10 days of events,
    # the buffer must hold a small fraction of the 8000-event stream
    assert ij.max_buffered < 600, ij.max_buffered


def test_streaming_interval_join_salted_equals_plain(ray_session):
    """Salted two-exchange plan == plain operator row-for-row,
    including a hot key holding most of both streams."""
    import ray.data as rd

    from rayspatial.ops.streaming import (streaming_interval_join,
                                          streaming_interval_join_salted)

    rng = np.random.default_rng(17)
    n = 5000
    mk = lambda s: pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": np.random.default_rng(s).integers(0, 3 * 86_400, n)
        * 1_000_000,
        "user_id": np.where(np.random.default_rng(s + 3).random(n) < 0.8,
                            0, np.random.default_rng(s + 5).integers(
                                1, 25, n)).astype(np.int64),
    })
    l, r = mk(1), mk(2)
    lds = rd.from_pandas(l).repartition(6)
    rds = rd.from_pandas(r).repartition(4)
    kw = dict(before_s=1200, after_s=300, lateness_s=600,
              num_partitions=4)
    plain = streaming_interval_join(lds, rds, **kw).to_pandas(
    ).sort_values(["l_id", "r_id"]).reset_index(drop=True)
    for bucket_s in (None, 900, 7200):
        salted = streaming_interval_join_salted(
            lds, rds, bucket_s=bucket_s, salt=8, **kw
        ).to_pandas().sort_values(["l_id", "r_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(plain, salted, check_like=True)
    # late accounting agrees too
    pl = streaming_interval_join(lds, rds, output="late", **kw
                                 ).to_pandas().groupby("side")["n_late"].sum()
    sl = streaming_interval_join_salted(lds, rds, output="late", **kw
                                        ).to_pandas().groupby("side")["n_late"].sum()
    assert (pl == sl).all()


# ------------------------------------------------------- TTL dedup


def _dedup_serial(keys, ts, lateness_us, ttl_us):
    """Arrival-order reference of the StreamingDeduper contract."""
    wm = -np.inf
    key_max = {}
    emit, late_n, supp_n = [], 0, 0
    for k, t in zip(keys, ts):
        if t < wm:
            emit.append(False)
            late_n += 1
        else:
            prior = key_max.get(k)
            e = prior is None or prior < t - ttl_us
            emit.append(e)
            supp_n += 0 if e else 1
            key_max[k] = t if prior is None else max(prior, t)
        wm = max(wm, t - lateness_us)
    return np.array(emit), late_n, supp_n


def test_streaming_deduper_chunking_invariant_and_counts():
    from rayspatial.ops.streaming import StreamingDeduper

    rng = np.random.default_rng(21)
    n = 3000
    keys = rng.integers(0, 25, n).astype(str)
    # mostly increasing event time with out-of-order jitter -> real
    # late drops and real suppressions
    ts = (np.arange(n) * 1000 + rng.integers(-40_000, 40_000, n)
          ).astype(np.int64)
    exp, late_n, supp_n = _dedup_serial(keys, ts, 5_000, 120_000)
    for chunk in (1, 97, n):
        dd = StreamingDeduper(ttl_s=0, lateness_s=0)
        dd.ttl_us, dd.lateness_us = 120_000, 5_000   # sub-second grid
        got = np.zeros(n, dtype=bool)
        for s in range(0, n, chunk):
            got[s:s + chunk] = dd.process(
                keys[s:s + chunk], ts[s:s + chunk],
                np.arange(s, min(s + chunk, n)))
        assert (got == exp).all(), chunk
        assert dd.late_dropped == late_n and dd.suppressed == supp_n
    assert late_n > 0 and supp_n > 0  # the fixture exercises both paths


def test_streaming_deduper_state_bounded():
    from rayspatial.ops.streaming import StreamingDeduper

    dd = StreamingDeduper(ttl_s=1, lateness_s=0)
    n = 50_000
    keys = np.arange(n).astype(str)          # every key unique
    ts = (np.arange(n) * 1_000_000).astype(np.int64)  # 1s apart
    for s in range(0, n, 1000):
        dd.process(keys[s:s + 1000], ts[s:s + 1000],
                   np.arange(s, s + 1000))
    # ttl horizon = 1s at 1 event/s -> state holds O(horizon), not O(n)
    assert len(dd.key_max) <= 4, len(dd.key_max)


def test_streaming_dedup_dataset_matches_serial(ray_session):
    import ray.data as rd

    from rayspatial.ops.streaming import streaming_dedup

    rng = np.random.default_rng(4)
    n = 4000
    user = rng.integers(0, 30, n).astype(np.int64)
    etype = np.array(["a", "b"])[rng.integers(0, 2, n)]
    us = (np.arange(n) * 50_000 + rng.integers(-2_000_000, 2_000_000, n)
          ).astype(np.int64)
    t = pa.table({
        "user_id": pa.array(user),
        "event_type": pa.array(etype),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(us).cast(pa.timestamp("us")),
    })
    P, lat, ttl = 4, 1, 30
    # serial expectation per partition scope
    exp_ids = []
    import pandas as pd
    df = pd.DataFrame({"user_id": user, "event_type": etype,
                       "event_id": np.arange(n), "us": us,
                       "part": user % P})
    for _, g in df.groupby("part"):
        g = g.sort_values("event_id")
        k = (g["user_id"].astype(str) + "\x1f" + g["event_type"]).to_numpy()
        m, _, _ = _dedup_serial(k, g["us"].to_numpy(),
                                lat * 1_000_000, ttl * 1_000_000)
        exp_ids.extend(g["event_id"].to_numpy()[m].tolist())
    for parts in (1, 6):
        out = streaming_dedup(
            rd.from_arrow(t).repartition(parts), ttl_s=ttl,
            lateness_s=lat, num_partitions=P, chunk=111,
            part_col="user_id", key_cols=["user_id", "event_type"],
        ).to_pandas()
        assert sorted(out["event_id"]) == sorted(exp_ids), parts


# -------------------------------------------------- session windows


def test_streaming_sessionizer_merges_and_matches_batch():
    """Closed+flushed sessions equal batch gap-sessionization of the
    non-late subset, chunk-size invariant, including an out-of-order
    event that MERGES two open sessions."""
    from rayspatial.ops.streaming import StreamingSessionizer

    def batch_sessions(keys, ts, vals):
        df = pd.DataFrame({"k": keys, "t": ts, "v": vals}).sort_values(
            ["k", "t"], kind="stable")
        out = []
        for k, g in df.groupby("k"):
            t = g["t"].to_numpy()
            v = g["v"].to_numpy()
            brk = np.ones(len(t), bool)
            brk[1:] = np.diff(t) > GAP_US
            sid = np.cumsum(brk) - 1
            for s in range(sid[-1] + 1):
                m = sid == s
                out.append((k, int(t[m].min()), int(t[m].max()),
                            int(m.sum()), int(v[m].sum())))
        return sorted(out)

    GAP_US = 100
    rng = np.random.default_rng(17)
    n = 2500
    keys = rng.integers(0, 10, n)
    ts = (np.arange(n) * 7 + rng.integers(-60, 60, n)).astype(np.int64)
    vals = rng.integers(0, 9, n).astype(np.int64)
    # explicit merge case: two bursts 150 apart for key 99, then a
    # bridging event between them arriving later (within lateness)
    keys = np.concatenate([keys, [99, 99, 99]])
    ts = np.concatenate([ts, [ts.max() + 1000, ts.max() + 1150,
                              ts.max() + 1075]])
    vals = np.concatenate([vals, [1, 1, 1]])

    # serial: which events are late at arrival (per full stream)?
    wm = -np.inf
    keep = []
    lateness = 50 * 1_000_000 // 1_000_000  # 50 us horizon
    for t in ts:
        keep.append(t >= wm)
        wm = max(wm, t - 50)
    keep = np.array(keep)
    exp = batch_sessions(keys[keep], ts[keep], vals[keep])
    n_late = int((~keep).sum())

    for chunk in (1, 173, len(ts)):
        ss = StreamingSessionizer(gap_s=0, lateness_s=0)
        ss.gap_us, ss.lateness_us = 100, 50        # sub-second grid
        rows = []
        for s in range(0, len(ts), chunk):
            rows.extend(ss.process(keys[s:s + chunk], ts[s:s + chunk],
                                   vals[s:s + chunk]))
        closed_early = len(rows)
        rows.extend(ss.flush())
        assert sorted(rows) == exp, chunk
        assert ss.late_dropped == n_late
        if chunk == 1:
            assert closed_early > 0    # sessions DO close mid-stream


def test_streaming_sessions_dataset_oracle_shape(ray_session):
    import ray.data as rd

    from rayspatial.ops.streaming import streaming_sessions

    rng = np.random.default_rng(3)
    n = 1500
    t = pa.table({
        "user_id": pa.array(rng.integers(0, 20, n).astype(np.int64)),
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array((np.arange(n) * 1_000_000
                        + rng.integers(-5_000_000, 5_000_000, n)
                        ).astype(np.int64)).cast(pa.timestamp("us")),
        "value_cents": pa.array(rng.integers(0, 100, n).astype(np.int64)),
    })
    outs = []
    for parts in (1, 5):
        out = streaming_sessions(
            rd.from_arrow(t).repartition(parts), gap_s=3, lateness_s=2,
            num_partitions=4, chunk=97,
        ).to_pandas().sort_values(
            ["user_id", "session_start_us"]).reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert (outs[0]["session_end_us"] >= outs[0]["session_start_us"]).all()
    assert outs[0]["n_events"].sum() <= n  # late events dropped
