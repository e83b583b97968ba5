"""Exact distributed quantiles (ops/quantile.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayspatial.ops.quantile import exact_quantiles


def _check(vals, pcts, **kw):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"value": pa.array(vals)})).repartition(5)
    out = exact_quantiles(ds, "value", pcts, **kw).to_pandas()
    sv = np.sort(np.asarray(vals))
    n = len(vals)
    for p, v in zip(out["pct"], out["value"]):
        k = -(-p * n // 100)
        assert v == sv[k - 1], (p, v, sv[k - 1])


@pytest.mark.usefixtures("ray_session")
def test_exact_on_random_doubles():
    rng = np.random.default_rng(5)
    _check(rng.normal(100, 25, 20_001), [25, 50, 90, 99])


@pytest.mark.usefixtures("ray_session")
def test_recursive_refinement_with_heavy_ties():
    # 90% of mass in one histogram bin forces recursion; exact ties
    rng = np.random.default_rng(6)
    vals = np.concatenate([
        np.full(9000, 42.0),
        rng.uniform(41.999, 42.001, 5000),
        rng.uniform(-1e6, 1e6, 1000),
    ])
    _check(vals, [10, 50, 95], leaf_limit=2000)


@pytest.mark.usefixtures("ray_session")
def test_all_equal_column():
    _check(np.full(500, 7.25), [50, 99], leaf_limit=100)


@pytest.mark.usefixtures("ray_session")
def test_grouped_quantiles_exact():
    import ray.data as rd

    from rayspatial.ops.quantile import grouped_quantiles

    rng = np.random.default_rng(8)
    g = rng.choice(["a", "b", "c"], 3000)
    v = rng.normal(0, 10, 3000)
    ds = rd.from_arrow(pa.table({"g": pa.array(g), "value": pa.array(v)})) \
        .repartition(6)
    out = grouped_quantiles(ds, "g", "value", [50, 99]).to_pandas()
    for (grp, p), row in out.set_index(["g", "pct"]).iterrows():
        sv = np.sort(v[g == grp])
        k = -(-p * len(sv) // 100)
        assert row["value"] == sv[k - 1]


def test_quantile_band_filter_exact(ray_session):
    """[p10, p90] band filter keeps exactly the rows between the exact
    rank-based thresholds (ties at a threshold included)."""
    import ray.data as rd

    from rayspatial.ops.quantile import quantile_band_filter

    rng = np.random.RandomState(3)
    v = np.concatenate([rng.randint(0, 1000, 900),
                        np.full(50, 7), np.full(50, 993)]).astype(np.int64)
    ds = rd.from_arrow(pa.table({"id": pa.array(np.arange(len(v))),
                                 "v": pa.array(v)})).repartition(6)
    got = quantile_band_filter(ds, "v", 10, 90).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    n = len(v)
    sv = np.sort(v)
    lo = sv[-(-10 * n // 100) - 1]
    hi = sv[-(-90 * n // 100) - 1]
    want = np.flatnonzero((v >= lo) & (v <= hi))
    assert got["id"].to_numpy().tolist() == want.tolist()


def test_range_partitioned_rank_exact(ray_session):
    """Global rank == argsort reference, under heavy key ties and
    multiple block layouts (ties must never straddle a range split)."""
    import ray.data as rd

    from rayspatial.ops.quantile import range_partitioned_rank

    rng = np.random.RandomState(9)
    n = 3000
    df = pd.DataFrame({
        "doc_id": rng.permutation(n).astype(np.int64),
        "n_chars": rng.randint(0, 40, n).astype(np.int64),  # heavy ties
    })
    order = np.lexsort((df.doc_id.to_numpy(), df.n_chars.to_numpy()))
    want = {int(df.doc_id.iloc[i]): r for r, i in enumerate(order)}
    for nblocks, parts in ((3, 8), (11, 16)):
        got = range_partitioned_rank(
            rd.from_pandas(df).repartition(nblocks),
            "n_chars", "doc_id", num_parts=parts,
        ).to_pandas()
        assert len(got) == n
        for r in got.itertuples():
            assert want[int(r.doc_id)] == int(r.rank)


def test_exact_quantiles_rejects_p0(ray_session):
    """ADVICE r3: p=0 computes k=0 and the -1 wraparound would return
    the bin MAXIMUM — must raise instead."""
    import ray.data as rd

    from rayspatial.ops.quantile import exact_quantiles, grouped_quantiles

    ds = rd.from_pandas(pd.DataFrame({"value": np.arange(100.0),
                                      "g": ["a"] * 100}))
    with pytest.raises(ValueError, match="percentile"):
        exact_quantiles(ds, "value", [0, 50])
    with pytest.raises(ValueError, match="percentile"):
        grouped_quantiles(ds, "g", "value", [0])
    with pytest.raises(ValueError, match="percentile"):
        exact_quantiles(ds, "value", [101])


def test_quantile_sketch_error_bound_and_merge(ray_session):
    """MRL sketch: one streaming pass, rank error < 1% at k=256 on 1M
    uniform + lognormal rows, merge associativity (split sketches merge
    to the same estimates as one sketch within the bound), and the
    distributed approx_quantiles stays within 1% rank error of exact."""
    import ray.data as rd

    from rayspatial.ops.quantile import QuantileSketch, approx_quantiles

    rng = np.random.default_rng(1)
    for data in (rng.random(1_000_000), rng.lognormal(0, 2, 1_000_000)):
        s = QuantileSketch(256)
        for c in np.array_split(data, 41):
            s.update_batch(c)
        for p in (1, 10, 50, 90, 99):
            est = s.quantile(p)
            rank = (data <= est).mean() * 100
            assert abs(rank - p) < 1.0, (p, rank)
        # merge of disjoint halves obeys the same bound
        a, b = QuantileSketch(256), QuantileSketch(256)
        a.update_batch(data[:500_000])
        b.update_batch(data[500_000:])
        a.merge(b)
        assert a.n == 1_000_000
        for p in (10, 50, 90):
            rank = (data <= a.quantile(p)).mean() * 100
            assert abs(rank - p) < 1.0, (p, rank)
    # distributed: one pass over a Dataset
    df = pd.DataFrame({"v": rng.random(300_000)})
    out = approx_quantiles(rd.from_pandas(df).repartition(16), "v",
                           [5, 50, 95]).to_pandas()
    for p, v in zip(out["pct"], out["value"]):
        rank = (df["v"] <= v).mean() * 100
        assert abs(rank - p) < 1.0, (p, rank)
    with pytest.raises(ValueError, match="percentile"):
        approx_quantiles(rd.from_pandas(df), "v", [0])


def test_mad_outliers_matches_serial(ray_session):
    import ray.data as rd

    from rayspatial.ops.quantile import mad_outliers

    rng = np.random.default_rng(31)
    n = 4000
    df = pd.DataFrame({
        "g": rng.integers(0, 50, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
        "v": rng.integers(-100, 100, n).astype(np.int64),
    })
    # inject obvious outliers + one constant group (MAD 0)
    df.loc[df.index[:20], "v"] = 100000
    df.loc[df["g"] == 49, "v"] = 7

    def serial(sub):
        v = sub["v"].to_numpy()
        kth = (50 * len(v) + 99) // 100
        med = int(np.sort(v)[kth - 1])
        dev = np.abs(v - med)
        mad = int(np.sort(dev)[kth - 1])
        return sub[dev > 3 * mad]

    exp = sorted(pd.concat([serial(s) for _, s in df.groupby("g")])["id"])
    for parts in (1, 6):
        got = mad_outliers(rd.from_pandas(df).repartition(parts),
                           "g", "id", "v").to_pandas()
        assert sorted(got["id"]) == exp, parts
        assert (np.abs(got["v"] - got["med"]) > 3 * got["mad"]).all()
    # constant group flags nothing
    assert not (np.array(exp) // 1 < 0).any()
    assert 49 not in set(got["g"])


def test_grouped_weighted_median(ray_session):
    import ray.data as rd

    from rayspatial.ops.quantile import grouped_weighted_median

    rng = np.random.default_rng(13)
    n = 4000
    df = pd.DataFrame({
        "g": rng.choice(["a", "b", "c", "d"], n),
        "v": rng.integers(-1000, 1000, n).astype(np.int64),
        "w": rng.integers(1, 20, n).astype(np.int64),
    })
    got = (grouped_weighted_median(
        rd.from_pandas(df).repartition(6), "g", "v", "w")
        .to_pandas().sort_values("g", ignore_index=True))

    want_rows = []
    for g, sub in df.groupby("g"):
        s = sub.sort_values("v")
        cw = s["w"].cumsum().to_numpy()
        tot = cw[-1]
        want_rows.append((g, int(s["v"].to_numpy()[2 * cw >= tot][0])))
    want = pd.DataFrame(want_rows, columns=["g", "wmedian"])
    want["wmedian"] = want["wmedian"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want)

    # single-row group and weight-1 degenerate
    tiny = pd.DataFrame({"g": ["x"], "v": [7], "w": [1]})
    out = grouped_weighted_median(rd.from_pandas(tiny), "g", "v", "w"
                                  ).to_pandas()
    assert out.iloc[0]["wmedian"] == 7

    with pytest.raises(Exception):
        bad = pd.DataFrame({"g": ["x"], "v": [1], "w": [0]})
        grouped_weighted_median(rd.from_pandas(bad), "g", "v", "w"
                                ).to_pandas()
