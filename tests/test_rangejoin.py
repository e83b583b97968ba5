"""interval_agg_join vs a brute-force O(n^2) reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _brute(left: pd.DataFrame, right: pd.DataFrame, delta: int) -> pd.DataFrame:
    rows = []
    for _, l in left.iterrows():
        m = right[(right.k == l.k) & (right.t > l.t) & (right.t <= l.t + delta)]
        if len(m):
            rows.append((int(l.lid), len(m), int(m.v.sum())))
    return (
        pd.DataFrame(rows, columns=["lid", "n_right", "sum_right"])
        .sort_values("lid")
        .reset_index(drop=True)
    )


def _run(left, right, delta, **kw):
    import ray.data as rd

    from rayspatial.ops.rangejoin import interval_agg_join

    out = interval_agg_join(
        rd.from_pandas(left), rd.from_pandas(right),
        by="k", on="t", delta=delta, left_id="lid", right_value="v", **kw
    ).to_pandas()
    return out.sort_values("lid").reset_index(drop=True)


@pytest.mark.parametrize("seed,delta", [(0, 100), (1, 7), (2, 1000)])
def test_matches_bruteforce(ray_session, seed, delta):
    rng = np.random.default_rng(seed)
    n_l, n_r = 300, 500
    left = pd.DataFrame({
        "lid": np.arange(n_l, dtype=np.int64),
        "k": rng.integers(0, 12, n_l).astype(np.int64),
        "t": rng.integers(0, 3000, n_l).astype(np.int64),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 12, n_r).astype(np.int64),
        "t": rng.integers(0, 3000, n_r).astype(np.int64),
        "v": rng.integers(-50, 50, n_r).astype(np.int64),
    })
    got = _run(left, right, delta)
    want = _brute(left, right, delta)
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64), check_dtype=False
    )


def test_boundary_semantics(ray_session):
    # (t, t+delta]: exact-left excluded, exact-right included
    left = pd.DataFrame({"lid": [1], "k": [5], "t": [100]})
    right = pd.DataFrame({
        "k": [5, 5, 5, 5, 4],
        "t": [100, 101, 110, 111, 105],  # 100 out, 110 in, 111 out, wrong key out
        "v": [1000, 1, 2, 4000, 7000],
    }).astype(np.int64)
    got = _run(left.astype(np.int64), right, delta=10)
    assert got.to_dict("records") == [
        {"lid": 1, "n_right": 2, "sum_right": 3}
    ]


def test_bucket_edges_exhaustive(ray_session):
    # every (left t, right t) offset combination around bucket borders
    delta = 10
    ts = np.arange(0, 45, dtype=np.int64)  # spans 5 buckets
    left = pd.DataFrame({
        "lid": np.arange(len(ts), dtype=np.int64),
        "k": np.zeros(len(ts), dtype=np.int64),
        "t": ts,
    })
    right = pd.DataFrame({
        "k": np.zeros(len(ts), dtype=np.int64),
        "t": ts,
        "v": (ts * 3 + 1).astype(np.int64),
    })
    got = _run(left, right, delta, salt=3, num_partitions=5)
    want = _brute(left, right, delta)
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64), check_dtype=False
    )


def test_semi_anti_join(ray_session):
    import ray.data as rd

    from rayspatial.ops.relational import anti_join, semi_join

    left = pd.DataFrame({
        "doc_id": np.arange(20, dtype=np.int64),
        "n_chars": (np.arange(20) * 7).astype(np.int64),
    })
    right = pd.DataFrame({"doc_id": np.array([3, 5, 5, 11, 40], dtype=np.int64)})
    l_ds, r_ds = rd.from_pandas(left), rd.from_pandas(right)

    semi = semi_join(l_ds, r_ds, "doc_id", ["doc_id", "n_chars"]).to_pandas()
    anti = anti_join(l_ds, r_ds, "doc_id", ["doc_id", "n_chars"]).to_pandas()
    assert sorted(semi.doc_id) == [3, 5, 11]
    assert sorted(anti.doc_id) == [i for i in range(20) if i not in (3, 5, 11)]
    # payload column survives the shuffle intact
    assert dict(zip(anti.doc_id, anti.n_chars))[7] == 49
    # empty right side: anti keeps everything, semi keeps nothing
    empty = rd.from_pandas(right[right.doc_id < 0].reset_index(drop=True))
    assert len(anti_join(l_ds, empty, "doc_id", ["doc_id", "n_chars"]).to_pandas()) == 20
    assert len(semi_join(l_ds, empty, "doc_id", ["doc_id", "n_chars"]).to_pandas()) == 0


def test_hash_join_modes_agree(ray_session):
    import ray.data as rd

    from rayspatial.ops.equijoin import hash_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "k": rng.integers(0, 40, 500).astype(np.int64),
        "lv": np.arange(500, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": np.arange(0, 50, 2, dtype=np.int64),   # some keys absent
        "rv": (np.arange(25) * 11).astype(np.int64),
    })
    l_ds, r_ds = rd.from_pandas(left), rd.from_pandas(right)
    a = hash_join(l_ds, r_ds, "k", ["k", "lv"], ["rv"],
                  mode="broadcast").to_pandas()
    b = hash_join(l_ds, r_ds, "k", ["k", "lv"], ["rv"],
                  mode="shuffle").to_pandas()
    want = left.merge(right, on="k", how="inner")
    for got in (a, b):
        pd.testing.assert_frame_equal(
            got.sort_values(["k", "lv"]).reset_index(drop=True)[["k", "lv", "rv"]],
            want.sort_values(["k", "lv"]).reset_index(drop=True)[["k", "lv", "rv"]],
            check_dtype=False,
        )


def test_hash_join_bloom_prefilter_exact_and_reduces(ray_session):
    import ray.data as rd

    from rayspatial.ops.equijoin import _bloom_prefilter, hash_join

    rng = np.random.default_rng(13)
    left = pd.DataFrame({
        "k": rng.integers(0, 10_000, 4000).astype(np.int64),
        "lv": np.arange(4000, dtype=np.int64),
    })
    right = pd.DataFrame({
        "k": np.arange(0, 100, dtype=np.int64),    # 1% of key space
        "rv": np.arange(100, dtype=np.int64),
    })
    l_ds, r_ds = rd.from_pandas(left).repartition(4), rd.from_pandas(right)
    plain = hash_join(l_ds, r_ds, "k", ["k", "lv"], ["rv"],
                      mode="shuffle").to_pandas()
    bloomed = hash_join(l_ds, r_ds, "k", ["k", "lv"], ["rv"],
                        mode="shuffle", bloom_bits=1 << 16).to_pandas()
    key = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        bloomed.sort_values(key).reset_index(drop=True)[key],
        plain.sort_values(key).reset_index(drop=True)[key],
        check_dtype=False)
    # the prefilter must actually drop most non-joining probe rows
    survivors = _bloom_prefilter(l_ds, r_ds, "k", 1 << 16).count()
    truly = left["k"].isin(right["k"]).sum()
    assert truly <= survivors < len(left) * 0.2


def test_left_outer_join_both_modes(ray_session):
    """how='left' keeps unmatched left rows with NULL right columns and
    the output schema stays typed (no float64 NaN leak) in every
    partition, matched or not."""
    import ray.data as rd

    from rayspatial.ops.equijoin import hash_join

    rng = np.random.RandomState(5)
    L = pd.DataFrame({"k": rng.randint(0, 40, 200),
                      "lv": np.arange(200, dtype=np.int64)})
    R = pd.DataFrame({"k": rng.randint(20, 60, 80),
                      "rv": np.arange(80, dtype=np.int64) * 10,
                      "rs": [f"s{i}" for i in range(80)]})
    lds = rd.from_arrow(pa.Table.from_pandas(L, preserve_index=False)) \
        .repartition(3)
    rds = rd.from_arrow(pa.Table.from_pandas(R, preserve_index=False)) \
        .repartition(2)
    for how in ("inner", "left"):
        want = L.merge(R, on="k", how=how, sort=False) \
            .sort_values(["k", "lv", "rv"]).reset_index(drop=True)
        for mode in ("broadcast", "shuffle"):
            out = hash_join(lds, rds, on="k", left_cols=["k", "lv"],
                            right_cols=["rv", "rs"], mode=mode, how=how)
            # schema check: right value column stays int64 (nullable)
            assert out.schema().types[2] == pa.int64(), (how, mode)
            got = out.to_pandas().sort_values(["k", "lv", "rv"]) \
                .reset_index(drop=True)
            assert len(got) == len(want), (how, mode)
            assert got["k"].tolist() == want["k"].tolist()
            assert got["lv"].tolist() == want["lv"].tolist()
            wrv = want["rv"].astype("float64")
            grv = got["rv"].astype("float64")
            assert ((wrv == grv) | (wrv.isna() & grv.isna())).all(), \
                (how, mode)
            if how == "left":
                assert got["rv"].isna().sum() > 0  # unmatched rows exist


def test_right_and_full_outer_join(ray_session):
    """how='right'/'full' (shuffle mode) match pandas merge; broadcast
    mode rejects them."""
    import ray.data as rd

    from rayspatial.ops.equijoin import hash_join

    rng = np.random.RandomState(11)
    L = pd.DataFrame({"k": rng.randint(0, 30, 150).astype(np.int64),
                      "lv": np.arange(150, dtype=np.int64)})
    R = pd.DataFrame({"k": rng.randint(15, 45, 60).astype(np.int64),
                      "rv": np.arange(60, dtype=np.int64) * 3})
    lds = rd.from_pandas(L).repartition(3)
    rds = rd.from_pandas(R).repartition(2)

    for how, pandas_how in (("right", "right"), ("full", "outer")):
        got = hash_join(lds, rds, "k", ["k", "lv"], ["rv"],
                        mode="shuffle", how=how).to_pandas()
        want = L.merge(R, on="k", how=pandas_how, sort=False)
        key = ["k", "lv", "rv"]
        gs = got.sort_values(key).reset_index(drop=True)[key]
        ws = want.sort_values(key).reset_index(drop=True)[key]
        assert len(gs) == len(ws)
        for c in key:
            gv = gs[c].fillna(-1).astype(np.int64)
            wv = ws[c].fillna(-1).astype(np.int64)
            assert (gv == wv).all(), (how, c)
        # typed nulls, not NaN-coerced floats
        assert got["lv"].dtype.kind in "if"
        if how == "full":
            assert got["rv"].isna().any() and got["lv"].isna().any()

    with pytest.raises(ValueError):
        hash_join(lds, rds, "k", ["k", "lv"], ["rv"],
                  mode="broadcast", how="full")


def test_broadcast_join_size_gate_routes_to_shuffle(ray_session):
    """VERDICT r3: an over-budget right side must NOT be silently
    materialized on the driver — the byte gate falls back to shuffle
    mode with identical results."""
    import ray.data as rd

    from rayspatial.ops.equijoin import hash_join

    rng = np.random.default_rng(11)
    l = pd.DataFrame({"k": rng.integers(0, 50, 500),
                      "lv": np.arange(500, dtype=np.int64)})
    r = pd.DataFrame({"k": np.arange(50, dtype=np.int64),
                      "rv": rng.integers(0, 9, 50).astype(np.int64)})
    l_ds, r_ds = rd.from_pandas(l).repartition(4), rd.from_pandas(r)
    normal = hash_join(l_ds, r_ds, "k", ["k", "lv"], ["rv"]
                       ).to_pandas().sort_values(["lv"]).reset_index(drop=True)
    # 1-byte budget: every right block overflows -> shuffle path
    gated = hash_join(l_ds, r_ds, "k", ["k", "lv"], ["rv"],
                      broadcast_byte_budget=1
                      ).to_pandas().sort_values(["lv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(normal, gated)
    assert len(normal) == 500


def test_hash_join_composite_key(ray_session):
    """Composite (multi-column) join keys in both modes, including an
    outer join with typed nulls and a bloom-prefiltered inner join."""
    import ray.data as rd

    from rayspatial.ops.equijoin import hash_join

    rng = np.random.default_rng(21)
    l = pd.DataFrame({
        "k1": rng.integers(0, 10, 400),
        "k2": rng.choice(["a", "b", "c"], 400),
        "lv": np.arange(400, dtype=np.int64)})
    r = pd.DataFrame({
        "k1": np.repeat(np.arange(10), 3),
        "k2": np.tile(["a", "b", "c"], 10),
        "rv": np.arange(30, dtype=np.int64) * 7})
    r = r[rng.random(30) < 0.7]  # drop some keys -> unmatched lefts
    ref = l.merge(r, on=["k1", "k2"], how="inner").sort_values(
        ["lv"]).reset_index(drop=True)
    lds = rd.from_pandas(l).repartition(4)
    rds = rd.from_pandas(r).repartition(2)
    for kw in (dict(mode="broadcast"), dict(mode="shuffle"),
               dict(mode="shuffle", bloom_bits=1 << 14)):
        got = hash_join(lds, rds, ["k1", "k2"], ["k1", "k2", "lv"],
                        ["rv"], **kw).to_pandas().sort_values(
            ["lv"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["k1", "k2", "lv", "rv"]], ref[["k1", "k2", "lv", "rv"]],
            check_dtype=False)
    # left outer: unmatched keep typed-null rv
    lo = hash_join(lds, rds, ["k1", "k2"], ["k1", "k2", "lv"], ["rv"],
                   mode="shuffle", how="left").to_pandas()
    assert len(lo) == 400 + (len(ref) - len(l[l.merge(
        r, on=["k1", "k2"], how="left", indicator=True)["_merge"]
        .eq("both").to_numpy()]))  # every left row at least once
    assert lo["rv"].isna().sum() == (400 - ref["lv"].nunique())


def test_broadcast_join_empty_right_string_key(ray_session):
    """Empty right side with string keys: inner join -> 0 rows, no
    Acero key-type clash (the empty placeholder takes the left's
    types)."""
    import ray.data as rd

    from rayspatial.ops.equijoin import hash_join

    l = pd.DataFrame({"k": ["a", "b"], "lv": np.array([1, 2], np.int64)})
    r = pd.DataFrame({"k": pd.Series([], dtype=str),
                      "rv": pd.Series([], dtype=np.int64)})
    got = hash_join(rd.from_pandas(l), rd.from_pandas(r), "k",
                    ["k", "lv"], ["rv"]).to_pandas()
    assert len(got) == 0


def test_presence_join_modes_agree(ray_session):
    """Broadcast (default) and forced-shuffle presence joins return
    identical rows AND dtypes — int64 and string keys, dup right keys,
    multi-block inputs."""
    import ray.data as rd

    from rayspatial.ops.relational import anti_join, semi_join

    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "doc_id": np.arange(500, dtype=np.int64),
        "n_chars": rng.integers(0, 2**40, 500).astype(np.int64),
        "lang": rng.choice(["en", "de", "fr"], 500),
    })
    right = pd.DataFrame({
        "doc_id": rng.choice(600, 120, replace=True).astype(np.int64)})
    l_ds = rd.from_pandas(left).repartition(7)
    r_ds = rd.from_pandas(right).repartition(3)

    for fn in (semi_join, anti_join):
        a = fn(l_ds, r_ds, "doc_id", ["doc_id", "n_chars", "lang"]) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = fn(l_ds, r_ds, "doc_id", ["doc_id", "n_chars", "lang"],
               broadcast_byte_budget=0) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert str(a["n_chars"].dtype) == "int64"  # no float64 upcast

    # string keys through both modes
    sl = pd.DataFrame({"url": [f"u{i}" for i in range(50)],
                       "score": np.arange(50, dtype=np.int64)})
    sr = pd.DataFrame({"url": ["u3", "u7", "u7", "zz"]})
    sl_ds, sr_ds = rd.from_pandas(sl), rd.from_pandas(sr)
    sa = semi_join(sl_ds, sr_ds, "url", ["url", "score"]).to_pandas()
    sb = semi_join(sl_ds, sr_ds, "url", ["url", "score"],
                   broadcast_byte_budget=0).to_pandas()
    assert sorted(sa.url) == sorted(sb.url) == ["u3", "u7"]
