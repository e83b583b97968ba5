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


def test_top_k_many_distinct_keys(ray_session):
    """10^6 rows, ~10^5 distinct keys: the combine input stays bounded
    (per-partition top-k means the final gather sees <= k*P rows) and
    totals are exact even when a key's rows span many blocks."""
    import ray.data as rd

    from rayspatial.ops.window import top_k_by_group

    rng = np.random.default_rng(7)
    n = 1_000_000
    keys = rng.integers(0, 100_000, n)
    vals = rng.integers(0, 1000, n)
    df = pd.DataFrame({"user_id": keys, "value": vals})
    ds = rd.from_pandas(df).repartition(16)
    got = top_k_by_group(ds, ["user_id"], "value", k=10).to_pandas()
    ref = (
        df.groupby("user_id")["value"].sum()
        .reset_index(name="v")
        .sort_values(["v", "user_id"], ascending=[False, True])
        .head(10)
    )
    assert list(got["user_id"]) == list(ref["user_id"])
    assert list(got["v"]) == list(ref["v"])


def test_top_k_rejects_nondecomposable_agg(ray_session):
    import ray.data as rd

    from rayspatial.ops.window import top_k_by_group

    ds = rd.from_pandas(pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]}))
    with pytest.raises(ValueError, match="decomposable"):
        top_k_by_group(ds, ["k"], "v", k=1, agg="mean")


def test_to_cents_rounding_matches_duckdb():
    """pc.round(half_towards_infinity) must equal DuckDB round() on
    exact .5-cent boundaries (half-to-even would give 0 for 0.005)."""
    import duckdb
    import pyarrow as pa
    import pyarrow.compute as pc

    vals = [0.005, 0.015, 0.025, -0.005, -0.015, 1.115, 2.675]
    mine = pc.cast(
        pc.round(pc.multiply(pa.array(vals), 100.0),
                 round_mode="half_towards_infinity"),
        pa.int64(),
    ).to_pylist()
    ref = [
        r[0]
        for r in duckdb.sql(
            "SELECT CAST(round(x * 100.0) AS BIGINT) FROM (SELECT unnest(?::DOUBLE[]) AS x)",
            params=[vals],
        ).fetchall()
    ]
    assert mine == ref


def test_asof_join(ray_session, events_df):
    """as-of join vs a brute-force pandas reference (greatest ts <=,
    ties by greatest event_id)."""
    import ray.data as rd

    from rayspatial.ops.asof import asof_join

    err = events_df[events_df.event_type == "error"]
    clk = events_df[events_df.event_type == "click"]
    got = (
        asof_join(
            rd.from_pandas(err[["event_id", "ts", "user_id"]]).repartition(4),
            rd.from_pandas(clk[["event_id", "ts", "user_id"]]).repartition(4),
            by="user_id", on="ts", id_col="event_id",
        )
        .to_pandas()
        .set_index("event_id")["event_id_right"]
        .sort_index()
    )
    # brute force
    ref = {}
    for _, e in err.iterrows():
        c = clk[(clk.user_id == e.user_id) & (clk.ts <= e.ts)]
        if len(c):
            c = c.sort_values(["ts", "event_id"])
            ref[e.event_id] = int(c.iloc[-1].event_id)
    assert len(got) == len(ref)
    for eid, prior in ref.items():
        assert got[eid] == prior


def test_keyed_window_high_cardinality_bounded_combine(ray_session):
    """Round-2 verdict item 5: keyed windows must go through the
    hash-partitioned bounded combine — 1e5 distinct keys, verified
    exact against pandas, with no repartition(1) gather in the plan."""
    import pyarrow as pa
    import ray.data as rd

    from rayspatial.ops.window import tumbling_window

    n = 200_000
    rng = np.random.default_rng(3)
    ts = np.sort(rng.integers(0, 86_400, n)) * 1_000_000  # one day, us
    key = rng.integers(0, 100_000, n)  # ~1e5 distinct int keys
    val = rng.integers(1, 100, n)
    tab = pa.table({
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "k": pa.array(key.astype(np.int64)),
        "value": pa.array(val.astype(np.int64)),
    })
    ds = rd.from_arrow(tab).repartition(16)
    res = tumbling_window(ds, width_s=3600, keys=["k"])

    # the keyed COMBINE (everything above the groupby Sort) must not
    # contain the repartition(1) gather; the input repartition below
    # the Sort is the test's own block split
    def ops_above_sort(op):
        if type(op).__name__ == "Sort":
            return
        yield type(op).__name__
        for c in op.input_dependencies:
            yield from ops_above_sort(c)

    combine_ops = set(ops_above_sort(res._logical_plan.dag))
    assert "Sort" not in combine_ops  # sanity: we stopped at the Sort
    assert "Repartition" not in combine_ops
    got = res.to_pandas()
    exp = (
        pd.DataFrame({"w": (ts // 3_600_000_000) * 3_600_000_000,
                      "k": key, "value": val})
        .groupby(["w", "k"])
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
    )
    assert len(got) == len(exp)
    got = got.sort_values(["window_start", "k"]).reset_index(drop=True)
    exp = exp.sort_values(["w", "k"]).reset_index(drop=True)
    assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    assert (got["sum_value"].to_numpy() == exp["sum_value"].to_numpy()).all()
    assert (got["window_start"].astype("int64").to_numpy()
            == exp["w"].to_numpy()).all()


def test_sessionize_salted_equals_plain(ray_session, events_df):
    """The bucket-salted sessionizer must reproduce the plain result
    exactly (sessions crossing bucket boundaries stitched)."""
    from rayspatial.ops.window import sessionize, sessionize_salted
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{SF}/events.parquet")
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    plain = (
        sessionize(ds, gap_s=1800).to_pandas()[cols]
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    )
    # small bucket (1h) forces many cross-bucket stitches
    salted = (
        sessionize_salted(ds, gap_s=1800, bucket_s=3600).to_pandas()[cols]
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted)


def test_sessionize_salted_hot_user(ray_session):
    """One bot user with most of the events: the salted operator spreads
    it over buckets and still returns exact sessions."""
    import pyarrow as pa
    import ray.data as rd

    from rayspatial.ops.window import sessionize, sessionize_salted

    rng = np.random.default_rng(9)
    n_hot, n_cold = 40_000, 2_000
    ts_hot = np.sort(rng.integers(0, 5 * 86_400, n_hot)) * 1_000_000
    ts_cold = np.sort(rng.integers(0, 5 * 86_400, n_cold)) * 1_000_000
    tab = pa.table({
        "event_id": pa.array(np.arange(n_hot + n_cold, dtype=np.int64)),
        "ts": pa.array(np.concatenate([ts_hot, ts_cold])).cast(pa.timestamp("us")),
        "user_id": pa.array(np.concatenate([
            np.zeros(n_hot, dtype=np.int64),
            rng.integers(1, 50, n_cold),
        ])),
        "value": pa.array(np.ones(n_hot + n_cold, dtype=np.int64)),
    })
    ds = rd.from_arrow(tab).repartition(8)
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    plain = (
        sessionize(ds, gap_s=600).to_pandas()[cols]
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    )
    salted = (
        sessionize_salted(ds, gap_s=600, bucket_s=6 * 3600).to_pandas()[cols]
        .sort_values(["user_id", "session_start"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted)


def test_asof_join_salted_equals_plain(ray_session, events_df):
    """Bucket-salted as-of join must reproduce the plain result exactly
    (cross-bucket backward matches resolved via bucket summaries)."""
    import ray.data as rd

    from rayspatial.ops.asof import asof_join, asof_join_salted

    err = events_df[events_df.event_type == "error"]
    clk = events_df[events_df.event_type == "click"]
    l = rd.from_pandas(err[["event_id", "ts", "user_id"]]).repartition(4)
    r = rd.from_pandas(clk[["event_id", "ts", "user_id"]]).repartition(4)
    plain = (
        asof_join(l, r, by="user_id", on="ts", id_col="event_id")
        .to_pandas()[["event_id", "event_id_right"]]
        .sort_values("event_id").reset_index(drop=True)
    )
    # small bucket (1h) forces many cross-bucket matches through pass 2
    salted = (
        asof_join_salted(l, r, by="user_id", on="ts", id_col="event_id",
                         bucket_s=3600)
        .to_pandas()[["event_id", "event_id_right"]]
        .sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted)


def test_asof_join_salted_hot_key(ray_session):
    """A hot user holding most rows on both sides stays correct through
    the salted two-pass plan."""
    import pyarrow as pa
    import ray.data as rd

    from rayspatial.ops.asof import asof_join, asof_join_salted

    rng = np.random.default_rng(31)
    nl, nr = 20_000, 20_000
    lts = np.sort(rng.integers(0, 3 * 86_400, nl)) * 1_000_000
    rts = np.sort(rng.integers(0, 3 * 86_400, nr)) * 1_000_000
    left = pa.table({
        "event_id": pa.array(np.arange(nl, dtype=np.int64)),
        "ts": pa.array(lts).cast(pa.timestamp("us")),
        "user_id": pa.array(np.where(rng.random(nl) < 0.9, 0,
                                     rng.integers(1, 20, nl)).astype(np.int64)),
    })
    right = pa.table({
        "event_id": pa.array(np.arange(nr, 2 * nr, dtype=np.int64)),
        "ts": pa.array(rts).cast(pa.timestamp("us")),
        "user_id": pa.array(np.where(rng.random(nr) < 0.9, 0,
                                     rng.integers(1, 20, nr)).astype(np.int64)),
    })
    l = rd.from_arrow(left).repartition(8)
    r = rd.from_arrow(right).repartition(8)
    plain = (
        asof_join(l, r, by="user_id", on="ts", id_col="event_id")
        .to_pandas()[["event_id", "event_id_right"]]
        .sort_values("event_id").reset_index(drop=True)
    )
    salted = (
        asof_join_salted(l, r, by="user_id", on="ts", id_col="event_id",
                         bucket_s=6 * 3600)
        .to_pandas()[["event_id", "event_id_right"]]
        .sort_values("event_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, salted)


def test_asof_join_salted_extra_left_keep_dtype(ray_session):
    """Non-default left_keep columns must come out with their INPUT
    Arrow type and exact values — pass 1's concat of matched/unmatched/
    summary rows used to NaN-fill extra keep columns, widening int64 to
    float64 for every row (values > 2^53 silently corrupted)."""
    import pyarrow as pa
    import ray.data as rd

    from rayspatial.ops.asof import asof_join, asof_join_salted

    rng = np.random.default_rng(7)
    nl, nr = 400, 400
    lts = np.sort(rng.integers(0, 3 * 86_400, nl)) * 1_000_000
    rts = np.sort(rng.integers(0, 3 * 86_400, nr)) * 1_000_000
    # payload beyond 2^53: a float64 round-trip cannot represent it
    big = (1 << 60) + np.arange(nl, dtype=np.int64) * 7 + 1
    left = pa.table({
        "event_id": pa.array(np.arange(nl, dtype=np.int64)),
        "ts": pa.array(lts),
        "user_id": pa.array(rng.integers(0, 5, nl).astype(np.int64)),
        "payload": pa.array(big),
    })
    right = pa.table({
        "event_id": pa.array(np.arange(nr, 2 * nr, dtype=np.int64)),
        "ts": pa.array(rts),
        "user_id": pa.array(rng.integers(0, 5, nr).astype(np.int64)),
    })
    l = rd.from_arrow(left).repartition(4)
    r = rd.from_arrow(right).repartition(4)
    kw = dict(by="user_id", on="ts", id_col="event_id",
              left_keep=["event_id", "payload"])
    plain = asof_join(l, r, **kw).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    salted = asof_join_salted(l, r, bucket_s=3600, **kw).to_pandas(
    ).sort_values("event_id").reset_index(drop=True)
    assert str(plain["payload"].dtype) == "int64"
    assert str(salted["payload"].dtype) == "int64"
    # exact payload values survive (would be off by rounding after a
    # float64 widening)
    expect = {i: v for i, v in zip(np.arange(nl), big)}
    assert all(expect[e] == p for e, p in
               zip(salted["event_id"], salted["payload"]))
    pd.testing.assert_frame_equal(
        plain[["event_id", "payload", "event_id_right"]],
        salted[["event_id", "payload", "event_id_right"]])


def test_extreme_row_by_group_matches_serial(ray_session):
    import ray.data as rd

    from rayspatial.ops.window import extreme_row_by_group

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({
        "g": rng.integers(0, 80, n).astype(np.int64),
        "v": rng.integers(0, 50, n).astype(np.int64),   # heavy ties
        "uid": np.arange(n, dtype=np.int64),
        "payload": rng.integers(-9, 9, n).astype(np.int64),
    })
    exp = (df.sort_values(["v", "uid"], ascending=[False, False],
                          kind="stable")
           .groupby("g", sort=False).head(1)
           .sort_values("g").reset_index(drop=True))
    for parts in (1, 8):
        got = extreme_row_by_group(
            rd.from_pandas(df).repartition(parts), ["g"],
            ["v", "uid"], ascending=[False, False],
        ).to_pandas().sort_values("g").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_pivot_counts_matches_crosstab(ray_session):
    import ray.data as rd

    from rayspatial.ops.window import pivot_counts

    rng = np.random.default_rng(5)
    n = 4000
    cats = np.array(["a", "b", "c"])
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n).astype(np.int64),
        "cat": cats[rng.integers(0, 3, n)],
    })
    # some rows outside the declared domain must be ignored
    df.loc[df.index[:100], "cat"] = "zzz"
    exp = (pd.crosstab(df["k"], df["cat"])
           .reindex(columns=["a", "b"], fill_value=0)
           .astype(np.int64).reset_index()
           .rename(columns={"a": "n_a", "b": "n_b"})
           .rename_axis(columns=None))
    for parts in (1, 6):
        got = pivot_counts(
            rd.from_pandas(df).repartition(parts), ["k"], "cat",
            domain=["a", "b"],
        ).to_pandas().sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["k", "n_a", "n_b"]], exp)
