"""Count-Min sketch (ops/cmsketch.py): one-sided error contract,
eps*N bound, merge associativity == single-pass, distributed pass ==
serial sketch."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayspatial.ops.cmsketch import CountMinSketch, cm_sketch


def _zipf_hashes(rng, n, n_keys):
    keys = rng.zipf(1.3, n).astype(np.int64) % n_keys
    return keys, keys.view(np.uint64)


def test_cm_one_sided_and_bounded():
    rng = np.random.default_rng(5)
    keys, h = _zipf_hashes(rng, 50_000, 2_000)
    sk = CountMinSketch(width=2048, depth=5)
    sk.add(h)
    uniq, true = np.unique(keys, return_counts=True)
    est = sk.estimate(uniq.view(np.uint64))
    assert (est >= true).all()                       # never undercounts
    # eps = e/width; allow 3x slack on the probabilistic bound
    eps_n = 3 * np.e / 2048 * len(keys)
    assert float(np.mean(est - true)) <= eps_n
    assert (est - true <= 10 * eps_n).all()


def test_cm_merge_equals_single_pass():
    rng = np.random.default_rng(8)
    _, h = _zipf_hashes(rng, 30_000, 500)
    whole = CountMinSketch(width=512, depth=4)
    whole.add(h)
    parts = [CountMinSketch(width=512, depth=4) for _ in range(3)]
    for i, p in enumerate(parts):
        p.add(h[i::3])
    merged = parts[0].merge(parts[1]).merge(parts[2])
    assert (merged.table == whole.table).all()
    with pytest.raises(AssertionError):
        whole.merge(CountMinSketch(width=256, depth=4))


def test_cm_sketch_distributed_matches_serial(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    keys, h = _zipf_hashes(rng, 20_000, 300)
    serial = CountMinSketch(width=1024, depth=4)
    serial.add(h)
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(7)
    dist = cm_sketch(ds, "k", width=1024, depth=4)
    assert (dist.table == serial.table).all()
    # string keys route through hash_strings
    sds = rd.from_arrow(pa.table({"k": pa.array(
        [f"key{x}" for x in keys])})).repartition(4)
    dist_s = cm_sketch(sds, "k", width=1024, depth=4)
    uniq, true = np.unique(keys, return_counts=True)
    from rayspatial.textops.hashing import hash_strings

    hs = hash_strings(pa.array([f"key{x}" for x in uniq]))
    assert (dist_s.estimate(hs) >= true).all()


def test_cm_sketch_driver_gather_is_one_row(ray_session, monkeypatch):
    """The reduce must merge per-block grids inside a task — the driver
    pulls exactly ONE final row (verdict r4 #4: no iter_rows over one
    multi-MB grid per input block on the driver)."""
    import ray.data as rd

    rng = np.random.default_rng(13)
    keys, _ = _zipf_hashes(rng, 10_000, 200)
    ds = rd.from_pandas(pd.DataFrame({"k": keys})).repartition(9)

    gathered = {"rows": None}
    orig_take_all = rd.Dataset.take_all

    def counting_take_all(self, *a, **kw):
        out = orig_take_all(self, *a, **kw)
        gathered["rows"] = len(out)
        return out

    monkeypatch.setattr(rd.Dataset, "take_all", counting_take_all)
    sk = cm_sketch(ds, "k", width=512, depth=4)
    assert gathered["rows"] == 1
    serial = CountMinSketch(width=512, depth=4)
    serial.add(keys.view(np.uint64))
    assert (sk.table == serial.table).all()
