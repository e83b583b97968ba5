"""Analytic window functions (ops/analytic.py) vs DuckDB window SQL."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayspatial.ops.analytic import analytic_window

SF = "/root/testdata/sf0.001"


def _frame_with_ties(seed: int = 7, n: int = 500) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, 20, n),          # partition key (some skew)
        "o": rng.integers(0, 30, n),          # order key WITH ties
        "id": np.arange(n, dtype=np.int64),   # unique tie-break
        "v": rng.integers(-100, 100, n),
    })


def _run(ds_df: pd.DataFrame, specs, order_cols, out_cols):
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(ds_df, preserve_index=False))
    out = analytic_window(ds, ["k"], order_cols, specs, out_cols=out_cols,
                          num_partitions=5)
    return out.to_pandas().sort_values("id").reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_analytic_matches_duckdb_with_ties():
    df = _frame_with_ties()
    got = _run(
        df,
        specs=[
            {"fn": "lag", "col": "v", "as": "lag1"},
            {"fn": "lag", "col": "v", "as": "lag3", "offset": 3},
            {"fn": "lead", "col": "v", "as": "lead2", "offset": 2},
            {"fn": "row_number", "as": "rn"},
            {"fn": "cumsum", "col": "v", "as": "run"},
            {"fn": "rank", "as": "rnk", "order_cols": ["o"]},
            {"fn": "dense_rank", "as": "drnk", "order_cols": ["o"]},
        ],
        order_cols=["o", "id"],
        out_cols=["id", "k"],
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT id, k,
          LAG(v) OVER w AS lag1,
          LAG(v, 3) OVER w AS lag3,
          LEAD(v, 2) OVER w AS lead2,
          ROW_NUMBER() OVER w AS rn,
          SUM(v) OVER (PARTITION BY k ORDER BY o, id
                       ROWS UNBOUNDED PRECEDING) AS run,
          RANK() OVER (PARTITION BY k ORDER BY o) AS rnk,
          DENSE_RANK() OVER (PARTITION BY k ORDER BY o) AS drnk
        FROM t WINDOW w AS (PARTITION BY k ORDER BY o, id)
        ORDER BY id
    """).df()
    got = got[want.columns.tolist()]
    for c in want.columns:
        a = got[c].astype("float64")
        b = want[c].astype("float64")
        assert a.isna().equals(b.isna()), c
        assert (a.dropna().to_numpy() == b.dropna().to_numpy()).all(), c


@pytest.mark.usefixtures("ray_session")
def test_analytic_single_row_groups_and_offsets_past_group():
    df = pd.DataFrame({
        "k": [1, 2, 3, 3],
        "o": [0, 0, 0, 1],
        "id": [0, 1, 2, 3],
        "v": [10, 20, 30, 40],
    })
    got = _run(
        df,
        specs=[
            {"fn": "lag", "col": "v", "as": "lag5", "offset": 5},
            {"fn": "lead", "col": "v", "as": "lead1"},
            {"fn": "row_number", "as": "rn"},
        ],
        order_cols=["o", "id"],
        out_cols=["id", "k"],
    )
    assert got["lag5"].isna().all()
    assert got.loc[got.id == 2, "lead1"].iloc[0] == 40
    assert got.loc[got.id.isin([0, 1, 3]), "lead1"].isna().all()
    assert got["rn"].tolist() == [1, 1, 1, 2]


@pytest.mark.usefixtures("ray_session")
def test_analytic_rank_requires_order_prefix():
    import ray.data as rd

    df = _frame_with_ties(n=10)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = analytic_window(
        ds, ["k"], ["o", "id"],
        [{"fn": "rank", "as": "r", "order_cols": ["id"]}],  # not a prefix
        out_cols=["id"],
    )
    with pytest.raises(Exception):
        out.materialize()


@pytest.mark.usefixtures("ray_session")
def test_analytic_dtype_preserved_int64_nullable():
    """lag over int64 must stay int64 (nullable) end-to-end, not decay
    to float64 through a pandas round-trip."""
    df = pd.DataFrame({"k": [1, 1], "o": [0, 1], "id": [0, 1],
                       "v": np.array([5, 6], dtype=np.int64)})
    import ray.data as rd

    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = analytic_window(ds, ["k"], ["o", "id"],
                          [{"fn": "lag", "col": "v", "as": "p"}],
                          out_cols=["id"])
    schema = out.schema()
    assert schema.base_schema.field("p").type == pa.int64()


def test_rolling_time_window_vs_pandas(ray_session):
    """rolling_time_window == pandas per-user brute force with RANGE
    (equal-ts peers included); partitioning-independent."""
    import ray.data as rd

    from rayspatial.ops.analytic import rolling_time_window

    rng = np.random.RandomState(3)
    n = 800
    base = np.int64(1_700_000_000_000_000)
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 12, n).astype(np.int64),
        "tsu": base + rng.randint(0, 3_600_000_000 * 5, n).astype(np.int64),
        "cents": rng.randint(-500, 500, n).astype(np.int64),
    })
    # force equal-ts peers within a user
    df.loc[1, ["user_id", "tsu"]] = df.loc[0, ["user_id", "tsu"]]
    df["ts"] = df["tsu"].astype("datetime64[us]")
    W = 3_600_000_000

    got = rolling_time_window(
        rd.from_pandas(df[["event_id", "user_id", "ts", "cents"]])
        .repartition(5),
        "user_id", "ts", "cents", window_us=W, id_cols=["event_id"],
    ).to_pandas().set_index("event_id")

    for r in df.itertuples():
        m = (df.user_id == r.user_id) & (df.tsu >= r.tsu - W) & (df.tsu <= r.tsu)
        assert got.loc[r.event_id, "sum_w"] == df.cents[m].sum(), r.event_id
        assert got.loc[r.event_id, "n_w"] == int(m.sum())


def test_funnel_vs_brute(ray_session):
    """funnel == per-user Python chain walk, including stall-at-step-1,
    equal timestamps (strict > required) and block independence."""
    import ray.data as rd

    from rayspatial.ops.analytic import funnel

    rng = np.random.RandomState(17)
    n = 1200
    base = np.int64(1_700_000_000_000_000)
    df = pd.DataFrame({
        "user_id": rng.randint(0, 40, n).astype(np.int64),
        "tsu": base + rng.randint(0, 10_000_000, n).astype(np.int64),
        "event_type": rng.choice(["a", "b", "c", "x"], n),
    })
    # force an equal-timestamp a->b pair for one user (must NOT chain)
    df.loc[0, ["user_id", "tsu", "event_type"]] = [999, base, "a"]
    df.loc[1, ["user_id", "tsu", "event_type"]] = [999, base, "b"]
    df["ts"] = df["tsu"].astype("datetime64[us]")

    got = funnel(
        rd.from_pandas(df[["user_id", "ts", "event_type"]]).repartition(4),
        ["a", "b", "c"],
    ).to_pandas().set_index("user_id")

    for u, g in df.groupby("user_id"):
        prev = -1 << 62
        ts_exp = []
        for step in ("a", "b", "c"):
            cand = g[(g.event_type == step) & (g.tsu > prev)]
            if len(cand):
                prev = int(cand.tsu.min())
                ts_exp.append(prev)
            else:
                prev = 1 << 62
                ts_exp.append(-1)
        done = sum(1 for _ in __import__("itertools").takewhile(
            lambda t: t != -1, ts_exp))
        row = got.loc[u]
        assert int(row.steps_completed) == done, u
        assert [int(row.t0), int(row.t1), int(row.t2)] == ts_exp, u
    assert int(got.loc[999].steps_completed) == 1  # equal-ts b not after a


def test_rolling_time_window_salted_equals_plain(ray_session):
    """Salted (time-bucket + boundary replica) rolling window ==
    plain rolling window, on a dataset dominated by ONE hot user whose
    rows span many buckets."""
    import ray.data as rd

    from rayspatial.ops.analytic import (
        rolling_time_window,
        rolling_time_window_salted,
    )

    rng = np.random.RandomState(23)
    n = 2000
    base = np.int64(1_700_000_000_000_000)
    user = np.where(rng.rand(n) < 0.9, 7, rng.randint(0, 5, n))
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": user.astype(np.int64),
        "tsu": base + rng.randint(0, 3_600_000_000 * 50, n).astype(np.int64),
        "cents": rng.randint(-100, 100, n).astype(np.int64),
    })
    df["ts"] = df["tsu"].astype("datetime64[us]")
    W = 3_600_000_000
    src = rd.from_pandas(df[["event_id", "user_id", "ts", "cents"]])

    plain = rolling_time_window(
        src, "user_id", "ts", "cents", window_us=W, id_cols=["event_id"]
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    salted = rolling_time_window_salted(
        src.repartition(6), "user_id", "ts", "cents", window_us=W,
        bucket_us=2 * W, id_cols=["event_id"],
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    assert len(salted) == len(plain) == n
    for c in ("sum_w", "n_w"):
        assert (salted[c].to_numpy() == plain[c].to_numpy()).all(), c

    with pytest.raises(ValueError):
        rolling_time_window_salted(src, "user_id", "ts", "cents",
                                   window_us=W, bucket_us=W // 2)


def test_retention_cohorts_vs_brute(ray_session):
    """retention_cohorts == Python reference on crafted multi-cohort
    activity; block-layout independent."""
    import ray.data as rd

    from rayspatial.ops.analytic import retention_cohorts

    W = 7 * 86_400_000_000
    base = np.int64(1_700_000_000_000_000)
    rows = []
    rng = np.random.RandomState(31)
    for u in range(25):
        first = rng.randint(0, 4)
        weeks = {first} | {first + int(w)
                           for w in rng.randint(0, 6, rng.randint(1, 5))}
        for w in weeks:
            for _ in range(rng.randint(1, 3)):   # repeat events same week
                rows.append((u, base + w * W + rng.randint(0, W)))
    df = pd.DataFrame(rows, columns=["user_id", "tsu"])
    df["ts"] = df["tsu"].astype("datetime64[us]")

    from collections import Counter
    wk = {(u, t // W) for u, t in zip(df.user_id, df.tsu)}
    first = {}
    for u, w in sorted(wk):
        first.setdefault(u, w)
    want = Counter((first[u], w - first[u]) for u, w in wk)

    got = retention_cohorts(
        rd.from_pandas(df[["user_id", "ts"]]).repartition(4)
    ).to_pandas()
    gm = {(int(r.cohort_week), int(r.week_offset)): int(r.n_users)
          for r in got.itertuples()}
    assert gm == dict(want)


def test_rolling_distinct_matches_brute_force(ray_session):
    import ray.data as rd

    from rayspatial.ops.analytic import rolling_distinct

    rng = np.random.default_rng(9)
    n = 5000
    day_us = 86_400_000_000
    # sparse activity with gaps bigger than the window to exercise the
    # interval-union split
    us = (rng.integers(0, 90, n) * day_us
          + rng.integers(0, day_us, n)).astype(np.int64)
    users = rng.integers(0, 60, n).astype(np.int64)
    t = pa.table({"user_id": pa.array(users),
                  "ts": pa.array(us).cast(pa.timestamp("us"))})
    days = us // day_us
    observed = np.unique(days)
    exp = {
        int(d): len({int(u) for u, dd in zip(users, days)
                     if d - 6 <= dd <= d})
        for d in observed
    }
    for parts, w in ((1, 7), (8, 7), (8, 1)):
        if w == 1:
            exp_w = {int(d): len({int(u) for u, dd in zip(users, days)
                                  if dd == d}) for d in observed}
        else:
            exp_w = exp
        got = rolling_distinct(
            rd.from_arrow(t).repartition(parts), "user_id", "ts",
            window=w,
        ).to_pandas()
        assert dict(zip(got["unit"].astype(int),
                        got["n_users"].astype(int))) == exp_w, (parts, w)


def test_rolling_distinct_validation(ray_session):
    import ray.data as rd

    from rayspatial.ops.analytic import rolling_distinct

    t = pa.table({"user_id": pa.array([1], type=pa.int64()),
                  "ts": pa.array([0], type=pa.int64()
                                 ).cast(pa.timestamp("us"))})
    with pytest.raises(ValueError):
        rolling_distinct(rd.from_arrow(t), "user_id", "ts", window=0)


def test_rolling_rows_median_vs_pandas(ray_session):
    """rolling_rows_median == pandas groupby.rolling(k).median()*2;
    partitioning-independent, short head frames included."""
    import ray.data as rd

    from rayspatial.ops.analytic import rolling_rows_median

    rng = np.random.RandomState(11)
    n = 900
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.randint(0, 15, n).astype(np.int64),
        "cents": rng.randint(-500, 500, n).astype(np.int64),
    })
    for k in (1, 4, 5):
        got = rolling_rows_median(
            rd.from_pandas(df).repartition(6),
            "user_id", ["event_id"], "cents", k=k, id_cols=["event_id"],
        ).to_pandas().sort_values("event_id", ignore_index=True)

        srt = df.sort_values(["user_id", "event_id"])
        want = (srt.groupby("user_id")["cents"]
                .rolling(k, min_periods=1).median() * 2)
        want = want.reset_index(level=0, drop=True).sort_index()
        nw = (srt.groupby("user_id")["cents"]
              .rolling(k, min_periods=1).count()
              .reset_index(level=0, drop=True).sort_index())
        assert np.array_equal(got["med2"].to_numpy(),
                              want.to_numpy().astype(np.int64)), k
        assert np.array_equal(got["n_w"].to_numpy(),
                              nw.to_numpy().astype(np.int64)), k

    with pytest.raises(ValueError):
        rolling_rows_median(rd.from_pandas(df), "user_id", ["event_id"],
                            "cents", k=0)


def test_longest_streak(ray_session):
    """longest_streak == brute-force consecutive-day runs per user."""
    import ray.data as rd

    from rayspatial.ops.analytic import longest_streak

    rng = np.random.RandomState(21)
    n = 3000
    df = pd.DataFrame({
        "user_id": rng.randint(0, 40, n).astype(np.int64),
        "day": rng.randint(0, 60, n).astype(np.int64),
    })
    got = (longest_streak(rd.from_pandas(df).repartition(7),
                          "user_id", "day")
           .to_pandas().sort_values("user_id", ignore_index=True))

    want_rows = []
    for u, sub in df.groupby("user_id"):
        days = np.unique(sub["day"].to_numpy())
        best = cur = 1
        for a, b in zip(days[:-1], days[1:]):
            cur = cur + 1 if b == a + 1 else 1
            best = max(best, cur)
        want_rows.append((u, best))
    want = pd.DataFrame(want_rows, columns=["user_id", "streak_days"])
    want["streak_days"] = want["streak_days"].astype(np.int64)
    pd.testing.assert_frame_equal(
        got.astype({"user_id": np.int64}), want)


def test_rolling_distinct_negative_units(ray_session):
    """Pre-1970 timestamps give negative day ordinals; run ends must be
    taken from the data, not a zero-initialized maximum accumulator
    (which would turn every all-negative run's end into window-1)."""
    import ray.data as rd

    from rayspatial.ops.analytic import rolling_distinct

    day_us = 86_400_000_000
    # users active only on negative days (1969 and earlier)
    days = np.array([-40, -39, -35, -3, -2, -40, -2], dtype=np.int64)
    users = np.array([1, 1, 1, 1, 1, 2, 2], dtype=np.int64)
    us = days * day_us + 1000
    t = pa.table({"user_id": pa.array(users),
                  "ts": pa.array(us).cast(pa.timestamp("us"))})
    observed = np.unique(us // day_us)
    exp = {int(d): len({int(u) for u, dd in zip(users, us // day_us)
                        if d - 6 <= dd <= d})
           for d in observed}
    for parts in (1, 4):
        got = rolling_distinct(rd.from_arrow(t).repartition(parts),
                               "user_id", "ts", window=7).to_pandas()
        assert dict(zip(got["unit"].astype(int),
                        got["n_users"].astype(int))) == exp, parts
