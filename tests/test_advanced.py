"""Skyline / max-concurrency / mode / transitions / cube / moments vs
brute-force in-process oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _brute_skyline(vals: np.ndarray) -> np.ndarray:
    """O(n^2) reference: indices of non-dominated rows (all minimized)."""
    n = len(vals)
    le = (vals[:, None, :] <= vals[None, :, :]).all(axis=2)
    lt = (vals[:, None, :] < vals[None, :, :]).any(axis=2)
    dom = le & lt
    return np.flatnonzero(~dom.any(axis=0))


def test_local_skyline_matches_brute():
    from rayspatial.ops.advanced import _local_skyline

    rng = np.random.default_rng(7)
    for n, d in [(1, 2), (50, 2), (500, 3), (3000, 2), (1200, 4)]:
        # duplicates + discrete grid to exercise ties
        vals = rng.integers(0, 12, size=(n, d)).astype(np.float64)
        got = np.sort(_local_skyline(vals, chunk=256))
        want = np.sort(_brute_skyline(vals))
        assert np.array_equal(got, want), (n, d)


def test_skyline_distributed(ray_session):
    from rayspatial.ops.advanced import skyline

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "a": rng.integers(0, 1000, n).astype(np.int64),
        "b": rng.integers(0, 1000, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(8)
    got = skyline(ds, ["a", "b"], maximize=[False, True]).to_pandas()
    # brute: minimize a, maximize b  ->  minimize (a, -b)
    vals = np.column_stack([df["a"], -df["b"]]).astype(np.float64)
    want = (df.iloc[_brute_skyline(vals)]
            .sort_values(["a", "b"]).reset_index(drop=True))
    got = got[["id", "a", "b"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values(["a", "b", "id"], ignore_index=True),
        want[["id", "a", "b"]].sort_values(["a", "b", "id"],
                                           ignore_index=True))


def test_max_concurrency(ray_session):
    from rayspatial.ops.advanced import max_concurrency

    rng = np.random.default_rng(11)
    n = 4000
    s = rng.integers(0, 100_000, n).astype(np.int64)
    e = s + rng.integers(1, 5_000, n)
    ds = rd.from_arrow(pa.table({"s": s, "e": e})).repartition(7)
    got = max_concurrency(ds, "s", "e")

    # brute sweep
    t = np.concatenate([s, e])
    d = np.concatenate([np.ones(n, np.int64), -np.ones(n, np.int64)])
    o = np.lexsort((d, t))
    run = np.cumsum(d[o])
    i = int(np.argmax(run))
    assert got["max_concurrent"] == int(run[i])
    assert got["at_ts"] == int(t[o][i])


def test_max_concurrency_empty(ray_session):
    from rayspatial.ops.advanced import max_concurrency

    ds = rd.from_arrow(pa.table({
        "s": pa.array([], pa.int64()), "e": pa.array([], pa.int64())}))
    got = max_concurrency(ds, "s", "e")
    assert got["max_concurrent"] == 0 and got["at_ts"] is None


def test_mode_by_group(ray_session):
    from rayspatial.ops.advanced import mode_by_group

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    ds = rd.from_pandas(ev).repartition(6)
    got = (mode_by_group(ds, ["user_id"], "event_type").to_pandas()
           .sort_values("user_id", ignore_index=True))

    cnt = (ev.groupby(["user_id", "event_type"]).size().rename("n")
           .reset_index()
           .sort_values(["user_id", "n", "event_type"],
                        ascending=[True, False, True], kind="stable"))
    want = (cnt.groupby("user_id").head(1)
            .rename(columns={"event_type": "mode_value", "n": "mode_count"})
            .sort_values("user_id", ignore_index=True))
    pd.testing.assert_frame_equal(
        got[["user_id", "mode_value", "mode_count"]],
        want[["user_id", "mode_value", "mode_count"]])


def test_transition_counts(ray_session):
    from rayspatial.ops.advanced import transition_counts

    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"]).to_pandas()
    ds = rd.from_pandas(ev).repartition(6)
    got = transition_counts(ds, "user_id", ["ts", "event_id"],
                            "event_type").to_pandas()

    sv = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    prev = sv.groupby("user_id")["event_type"].shift(1)
    pairs = pd.DataFrame({"prev": prev, "next": sv["event_type"]}).dropna()
    want = (pairs.groupby(["prev", "next"]).size().rename("n")
            .reset_index().sort_values(["prev", "next"],
                                       ignore_index=True))
    want["n"] = want["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_cube_agg(ray_session):
    from rayspatial.ops.advanced import cube_agg

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.choice(["p", "q"], n),
        "v": rng.integers(-50, 50, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(5)
    got = (cube_agg(ds, ["a", "b"], "v").to_pandas()
           .sort_values(["a", "b"], ignore_index=True))

    outs = []
    for mask in range(4):
        g = df.copy()
        if mask & 1:
            g["a"] = "ALL"
        if mask & 2:
            g["b"] = "ALL"
        outs.append(g.groupby(["a", "b"])["v"]
                    .agg([("sum_v", "sum"), ("n_rows", "size")])
                    .reset_index())
    want = (pd.concat(outs, ignore_index=True)
            .sort_values(["a", "b"], ignore_index=True))
    want["sum_v"] = want["sum_v"].astype(np.int64)
    want["n_rows"] = want["n_rows"].astype(np.int64)
    pd.testing.assert_frame_equal(got[["a", "b", "sum_v", "n_rows"]], want)


def test_grouping_sets_agg(ray_session):
    from rayspatial.ops.advanced import grouping_sets_agg

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "ALL"], n),   # marker collision on purpose
        "b": rng.choice(["p", "q"], n),
        "v": rng.integers(-50, 50, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(5)
    sets = [["a"], ["b"], []]
    got = (grouping_sets_agg(ds, ["a", "b"], "v", sets).to_pandas()
           .sort_values(["a", "b", "sum_v"], ignore_index=True))

    outs = []
    for keep in sets:
        g = df.copy()
        for c in ("a", "b"):
            if c not in keep:
                g[c] = "ALL"
        outs.append(g.groupby(["a", "b"])["v"]
                    .agg([("sum_v", "sum"), ("n_rows", "size")])
                    .reset_index())
    want = (pd.concat(outs, ignore_index=True)
            .sort_values(["a", "b", "sum_v"], ignore_index=True))
    want["sum_v"] = want["sum_v"].astype(np.int64)
    want["n_rows"] = want["n_rows"].astype(np.int64)
    pd.testing.assert_frame_equal(got[["a", "b", "sum_v", "n_rows"]], want)

    # a genuine 'ALL' value in column a must NOT merge with rollup totals:
    # the ({a},.) level keeps it as a leaf row, distinct from the ({b},.)
    # level's rolled-up 'ALL' rows — counts must cover all three sets.
    assert got["n_rows"].sum() == 3 * n

    with pytest.raises(ValueError, match="duplicate"):
        grouping_sets_agg(ds, ["a", "b"], "v", [["a"], ["a"]])
    with pytest.raises(ValueError, match="not in group_cols"):
        grouping_sets_agg(ds, ["a", "b"], "v", [["zz"]])


def test_grouped_moments(ray_session):
    from rayspatial.ops.advanced import grouped_moments

    rng = np.random.default_rng(9)
    n = 5000
    df = pd.DataFrame({
        "g": rng.choice(["u", "v", "w"], n),
        "x": rng.integers(0, 10_000, n).astype(np.int64),
        "y": rng.integers(0, 24, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(6)
    got = (grouped_moments(ds, ["g"], "x", "y").to_pandas()
           .sort_values("g", ignore_index=True))

    agg = df.groupby("g").apply(
        lambda t: pd.Series({
            "n": len(t), "sum_x": t.x.sum(), "sum_y": t.y.sum(),
            "sum_xy": (t.x * t.y).sum()}), include_groups=False
    ).reset_index()
    agg["cov_num"] = agg["n"] * agg["sum_xy"] - agg["sum_x"] * agg["sum_y"]
    for c in ("n", "sum_x", "sum_y", "sum_xy", "cov_num"):
        agg[c] = agg[c].astype(np.int64)
    pd.testing.assert_frame_equal(
        got[["g", "n", "sum_x", "sum_y", "sum_xy", "cov_num"]], agg)


def test_cooccurrence_pairs(ray_session):
    from rayspatial.ops.advanced import cooccurrence_pairs

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    ds = rd.from_pandas(ev).repartition(6)
    got = cooccurrence_pairs(ds, "user_id", "event_type").to_pandas()

    d = ev.drop_duplicates()
    m = d.merge(d, on="user_id", suffixes=("_a", "_b"))
    m = m[m["event_type_a"] < m["event_type_b"]]
    want = (m.groupby(["event_type_a", "event_type_b"]).size()
            .rename("n_entities").reset_index()
            .rename(columns={"event_type_a": "item_a",
                             "event_type_b": "item_b"})
            .sort_values(["item_a", "item_b"], ignore_index=True))
    want["n_entities"] = want["n_entities"].astype(np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_histogram_fixed(ray_session):
    from rayspatial.ops.advanced import histogram_fixed

    rng = np.random.default_rng(21)
    v = rng.integers(-5000, 5000, 20_000).astype(np.int64)
    ds = rd.from_arrow(pa.table({"v": v})).repartition(5)
    got = histogram_fixed(ds, "v", 700).to_pandas()

    b = np.floor_divide(v, 700)
    want = (pd.DataFrame({"bin": b, "v": v}).groupby("bin")
            .agg(n=("v", "size"), sum_v=("v", "sum")).reset_index())
    want["bin_lo"] = want["bin"] * 700
    want = want[["bin", "bin_lo", "n", "sum_v"]]
    for c in want.columns:
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True))


@pytest.mark.parametrize("n,k", [(1, 4), (7, 4), (100, 4), (100, 7),
                                 (3, 8), (1000, 3)])
def test_ntile(ray_session, n, k):
    from rayspatial.ops.quantile import ntile

    rng = np.random.default_rng(n * 31 + k)
    key = rng.integers(0, max(2, n // 3), n).astype(np.int64)  # dup keys
    tie = np.arange(n, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"key": key, "tie": tie})).repartition(4)
    got = (ntile(ds, "key", "tie", k=k, num_parts=5).to_pandas()
           .sort_values(["key", "tie"], ignore_index=True))

    df = pd.DataFrame({"key": key, "tie": tie}).sort_values(
        ["key", "tie"], ignore_index=True)
    q, m = divmod(n, k)
    r = np.arange(n)
    if q == 0:
        want_bucket = r + 1
    else:
        cut = m * (q + 1)
        want_bucket = np.where(r < cut, r // (q + 1) + 1,
                               m + (r - cut) // q + 1)
    assert np.array_equal(got["bucket"].to_numpy(), want_bucket)
    assert np.array_equal(got["rank"].to_numpy(), r)


def test_empty_inputs(ray_session):
    """Empty datasets keep the documented output schemas."""
    from rayspatial.ops.advanced import (cooccurrence_pairs,
                                         histogram_fixed, mode_by_group,
                                         skyline, transition_counts)

    empty_iv = rd.from_arrow(pa.table({
        "g": pa.array([], pa.string()), "v": pa.array([], pa.int64()),
        "t": pa.array([], pa.int64())}))

    h = histogram_fixed(empty_iv, "v", 10).to_pandas()
    # Ray collapses an all-empty dataset to zero columns in to_pandas;
    # when columns survive they must be the documented output schema
    assert h.empty
    assert list(h.columns) in ([], ["bin", "bin_lo", "n", "sum_v"])

    s = skyline(empty_iv, ["v", "t"]).to_pandas()
    assert s.empty

    m = mode_by_group(empty_iv, ["g"], "v").to_pandas()
    assert m.empty

    tc = transition_counts(empty_iv, "g", ["t"], "v").to_pandas()
    assert tc.empty

    co = cooccurrence_pairs(empty_iv, "g", "v").to_pandas()
    assert co.empty


def test_grouped_concat(ray_session):
    from rayspatial.ops.advanced import grouped_concat

    rng = np.random.default_rng(17)
    n = 2000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        "v": rng.choice(["x", "y", "z", "w"], n),
        "o": rng.permutation(n).astype(np.int64),
    })
    got = (grouped_concat(rd.from_pandas(df).repartition(5),
                          "g", "v", ["o"], sep="|")
           .to_pandas().sort_values("g", ignore_index=True))
    want = (df.sort_values(["g", "o"]).groupby("g")["v"]
            .agg(lambda s: "|".join(s)).rename("concat_v").reset_index())
    want["n"] = df.groupby("g").size().sort_index().to_numpy()
    want["n"] = want["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


def test_ohlc_agg(ray_session):
    from rayspatial.ops.advanced import ohlc_agg

    rng = np.random.default_rng(23)
    n = 3000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c"], n),
        "t": rng.permutation(n).astype(np.int64),   # unique order key
        "v": rng.integers(-500, 500, n).astype(np.int64),
    })
    got = (ohlc_agg(rd.from_pandas(df).repartition(6), ["g"], ["t"], "v")
           .to_pandas().sort_values("g", ignore_index=True))

    rows = []
    for g, sub in df.groupby("g"):
        s = sub.sort_values("t")
        rows.append((g, s["v"].iloc[0], s["v"].max(), s["v"].min(),
                     s["v"].iloc[-1], len(s)))
    want = pd.DataFrame(rows, columns=["g", "open_v", "high_v", "low_v",
                                       "close_v", "n"])
    for c in ("open_v", "high_v", "low_v", "close_v", "n"):
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.parametrize("nparts", [1, 3, 11])
def test_new_ops_partitioning_invariant(ray_session, nparts):
    """ohlc_agg / grouped_concat results must not depend on the input
    block layout (groups are co-located by the hash shuffle)."""
    from rayspatial.ops.advanced import grouped_concat, ohlc_agg

    rng = np.random.default_rng(31)
    n = 1500
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", "d"], n),
        "t": rng.permutation(n).astype(np.int64),
        "v": rng.integers(-99, 99, n).astype(np.int64),
    })
    ds = rd.from_pandas(df).repartition(nparts)
    o = (ohlc_agg(ds, ["g"], ["t"], "v").to_pandas()
         .sort_values("g", ignore_index=True))
    c = (grouped_concat(ds, "g", "v", ["t"]).to_pandas()
         .sort_values("g", ignore_index=True))
    # reference from a single partition
    ds1 = rd.from_pandas(df).repartition(2)
    o1 = (ohlc_agg(ds1, ["g"], ["t"], "v").to_pandas()
          .sort_values("g", ignore_index=True))
    c1 = (grouped_concat(ds1, "g", "v", ["t"]).to_pandas()
          .sort_values("g", ignore_index=True))
    pd.testing.assert_frame_equal(o, o1)
    pd.testing.assert_frame_equal(c, c1)


def test_new_ops_empty_inputs(ray_session):
    """Empty datasets flow through the session's new operators."""
    from rayspatial.ops.advanced import grouped_concat, ohlc_agg
    from rayspatial.ops.analytic import longest_streak
    from rayspatial.ops.quantile import grouped_weighted_median
    from rayspatial.ops.zorder import zorder_layout

    empty = rd.from_arrow(pa.table({
        "g": pa.array([], pa.string()), "t": pa.array([], pa.int64()),
        "v": pa.array([], pa.int64()), "w": pa.array([], pa.int64())}))

    assert ohlc_agg(empty, ["g"], ["t"], "v").to_pandas().empty
    assert grouped_concat(empty, "g", "v", ["t"]).to_pandas().empty
    assert longest_streak(empty, "g", "t").to_pandas().empty
    assert grouped_weighted_median(empty, "g", "v", "w").to_pandas().empty
    z = zorder_layout(rd.from_arrow(pa.table({
        "qx": pa.array([], pa.int64()), "qy": pa.array([], pa.int64())})),
        "qx", "qy").to_pandas()
    assert z.empty
