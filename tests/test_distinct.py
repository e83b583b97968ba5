"""Grouped count-distinct: exact path vs DuckDB, HLL path error bound
and merge associativity (ops/distinct.py)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayspatial.ops.distinct import (
    _HLL_P,
    _hll_partial,
    approx_count_distinct,
    count_distinct,
    hll_estimate,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_count_distinct_exact_matches_duckdb():
    import ray.data as rd

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "g": rng.integers(0, 7, 4000),
        "v": rng.integers(0, 300, 4000),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)) \
        .repartition(6)
    got = count_distinct(ds, ["g"], "v", out_name="n") \
        .to_pandas().sort_values("g").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT g, COUNT(DISTINCT v) AS n FROM t GROUP BY g ORDER BY g"
    ).df()
    assert got["g"].tolist() == want["g"].tolist()
    assert got["n"].tolist() == want["n"].tolist()


@pytest.mark.usefixtures("ray_session")
def test_count_distinct_string_values():
    import ray.data as rd

    df = pd.DataFrame({
        "g": [1, 1, 1, 2, 2],
        "v": ["a", "a", "b", "a", "c"],
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = count_distinct(ds, ["g"], "v", out_name="n") \
        .to_pandas().sort_values("g")
    assert got["n"].tolist() == [2, 2]


def test_hll_estimate_error_bound_across_cardinalities():
    rng = np.random.default_rng(11)
    for true_n in (100, 5_000, 200_000):
        vals = rng.integers(0, 2**62, true_n, dtype=np.int64)
        from rayspatial.textops.hashing import hash_int64

        h = hash_int64(vals.view(np.uint64))
        _, regs = _hll_partial([], h, _HLL_P)
        est = hll_estimate(regs[0])
        # 4096 registers -> ~1.6% sigma; allow 5 sigma
        assert abs(est - true_n) / true_n < 0.08, (true_n, est)


def test_hll_merge_associativity():
    """max-merge of two half-sketches == sketch of the union."""
    rng = np.random.default_rng(5)
    a = rng.integers(0, 2**62, 10_000, dtype=np.int64)
    b = rng.integers(0, 2**62, 10_000, dtype=np.int64)
    from rayspatial.textops.hashing import hash_int64

    ha = hash_int64(a.view(np.uint64))
    hb = hash_int64(b.view(np.uint64))
    hu = hash_int64(np.concatenate([a, b]).view(np.uint64))
    _, ra = _hll_partial([], ha, _HLL_P)
    _, rb = _hll_partial([], hb, _HLL_P)
    _, ru = _hll_partial([], hu, _HLL_P)
    assert (np.maximum(ra[0], rb[0]) == ru[0]).all()


@pytest.mark.usefixtures("ray_session")
def test_approx_vs_exact_on_events():
    import ray.data as rd

    tbl = pa.parquet_read = __import__("pyarrow.parquet", fromlist=["pq"]) \
        .read_table(f"{SF}/events.parquet", columns=["user_id"])
    ds = rd.from_arrow(tbl).repartition(4)
    ds = ds.map_batches(
        lambda b: b.append_column("g", pa.array(np.zeros(len(b), np.int64))),
        batch_format="pyarrow",
    )
    exact = count_distinct(ds, ["g"], "user_id", out_name="n").to_pandas()
    approx = approx_count_distinct(ds, ["g"], "user_id",
                                   out_name="n").to_pandas()
    n, a = int(exact["n"][0]), int(approx["n"][0])
    assert abs(a - n) / n < 0.05, (n, a)
