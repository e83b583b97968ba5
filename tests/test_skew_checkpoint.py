"""Skew salting + checkpoint manifest/resume tests."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _skewed_points(n=20000):
    """80% of points in one tiny hot spot (one cell), rest uniform."""
    rng = np.random.RandomState(3)
    hot = int(n * 0.8)
    lon = np.concatenate([rng.uniform(10.0, 10.5, hot), rng.uniform(-170, 170, n - hot)])
    lat = np.concatenate([rng.uniform(20.0, 20.5, hot), rng.uniform(-80, 80, n - hot)])
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lon": pa.array(lon),
            "lat": pa.array(lat),
        }
    )


def test_histogram_and_salt_plan(ray_session):
    import ray.data as rd

    from rayspatial.ops import skew

    ds = rd.from_arrow(_skewed_points())
    hist = pa.concat_tables(
        list(skew.cell_histogram(ds, 4).iter_batches(batch_format="pyarrow"))
    )
    assert int(pa.compute.sum(hist.column("n")).as_py()) == 20000
    salt_map = skew.plan_salts(hist, target_rows=1000)
    # the hot cell must be detected and split into ~16 shards
    assert len(salt_map) >= 1
    assert max(salt_map.values()) >= 10


def test_salted_keys_deterministic_and_bounded():
    from rayspatial.ops import skew

    cell = np.array([7, 7, 7, 9], dtype=np.int64)
    rid = np.array([0, 1, 2, 3], dtype=np.int64)
    m = {7: 2}
    s1 = skew.salt_values(cell, rid, m)
    s2 = skew.salt_values(cell, rid, m)
    assert np.array_equal(s1, s2)
    assert s1[3] == 0  # cold cell unsalted
    assert len(set(s1[:3])) == 2  # hot cell split in 2


def test_salted_join_matches_broadcast(ray_session):
    import ray.data as rd

    from rayspatial.ops.join import (
        join_points_polygons,
        join_points_polygons_shuffled,
    )
    from rayspatial.pipeline.polygons import polygon_geoms

    pts = _skewed_points(5000)
    ref = (
        join_points_polygons(rd.from_arrow(pts), polygon_geoms(), predicate="covers")
        .to_pandas()[["doc_id", "poly_id"]]
        .sort_values(["doc_id", "poly_id"])
        .reset_index(drop=True)
    )
    got = (
        join_points_polygons_shuffled(
            rd.from_arrow(pts), polygon_geoms(), predicate="covers",
            salt_target=500,
        )
        .to_pandas()[["doc_id", "poly_id"]]
        .sort_values(["doc_id", "poly_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)


def test_checkpointed_write_and_resume(ray_session, tmp_path):
    import ray.data as rd

    from rayspatial.state.checkpoint import (
        CheckpointManifest,
        checkpointed_write,
        read_checkpointed,
    )

    out = str(tmp_path / "ckpt")
    tab = pa.table(
        {
            "k": pa.array(np.arange(1000, dtype=np.int64) % 37),
            "v": pa.array(np.arange(1000, dtype=np.int64)),
        }
    )
    m1, rep1 = checkpointed_write(rd.from_arrow(tab), out, key_col="k",
                                  stage="t", num_partitions=8)
    assert not rep1["skipped"].any()
    assert len(m1.completed()) == 8
    ents = m1.entries()
    assert sum(e["rows"] for e in ents) == 1000
    assert all(e["bytes"] > 0 and "content_hash" in e for e in ents)

    before = read_checkpointed(out, "t").to_pandas().sort_values("v").reset_index(drop=True)

    # simulate mid-job failure: one partition lost
    lost = sorted(m1.completed())[3]
    os.remove(m1.data_path(lost))
    os.remove(m1.entry_path(lost))

    m2, rep2 = checkpointed_write(rd.from_arrow(tab), out, key_col="k",
                                  stage="t", num_partitions=8)
    rep2 = rep2.sort_values("pid")
    assert rep2["skipped"].sum() == 7  # only the lost partition rewritten
    assert not rep2[rep2["pid"] == lost]["skipped"].iloc[0]

    after = read_checkpointed(out, "t").to_pandas().sort_values("v").reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)

    # reruns are pure skips
    _, rep3 = checkpointed_write(rd.from_arrow(tab), out, key_col="k",
                                 stage="t", num_partitions=8)
    assert rep3["skipped"].all()


def test_checkpointed_flagship_pairs(ray_session, tmp_path):
    """End-to-end: flagship join pairs written resumable + manifest."""
    from rayspatial.ops.join import join_points_polygons
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms
    from rayspatial.state.checkpoint import checkpointed_write, read_checkpointed

    out = str(tmp_path / "pairs")
    pairs = join_points_polygons(
        points_dataset(SF), polygon_geoms(), predicate="covers"
    ).select_columns(["doc_id", "poly_id"])
    manifest, rep = checkpointed_write(pairs, out, key_col="doc_id",
                                       stage="pairs", num_partitions=4)
    assert len(manifest.completed()) == 4
    back = read_checkpointed(out, "pairs").to_pandas()
    direct = join_points_polygons(
        points_dataset(SF), polygon_geoms(), predicate="covers"
    ).to_pandas()[["doc_id", "poly_id"]]
    assert set(map(tuple, back.to_numpy())) == set(map(tuple, direct.to_numpy()))


def test_checkpoint_stale_input_rewrites(ray_session, tmp_path):
    """A rerun whose upstream input CHANGED must rewrite the partition
    (input_fingerprint mismatch), not skip it as complete."""
    import ray.data as rd

    from rayspatial.state.checkpoint import checkpointed_write, read_checkpointed

    out = str(tmp_path / "ckpt")
    df1 = pd.DataFrame({"k": np.arange(40), "v": np.arange(40) * 2})
    ds1 = rd.from_pandas(df1)
    _, rep1 = checkpointed_write(ds1, out, key_col="k", num_partitions=4)
    assert not rep1["skipped"].any()

    # identical rerun: every partition skips
    _, rep2 = checkpointed_write(rd.from_pandas(df1), out, key_col="k",
                                 num_partitions=4)
    assert rep2["skipped"].all()

    # changed input (one extra key): affected partition rewrites
    df3 = pd.DataFrame({"k": np.arange(41), "v": np.arange(41) * 2})
    _, rep3 = checkpointed_write(rd.from_pandas(df3), out, key_col="k",
                                 num_partitions=4)
    assert (~rep3["skipped"]).sum() >= 1
    got = read_checkpointed(out).to_pandas().sort_values("k").reset_index(drop=True)
    assert len(got) == 41
    assert (got["v"].to_numpy() == got["k"].to_numpy() * 2).all()


def test_checkpoint_value_change_rewrites(ray_session, tmp_path):
    """ADVICE round 2: same keys, changed VALUES must invalidate every
    partition — the skip fingerprint covers all columns, not just the
    key column."""
    import ray.data as rd

    from rayspatial.state.checkpoint import checkpointed_write, read_checkpointed

    out = str(tmp_path / "ckpt")
    df1 = pd.DataFrame({"k": np.arange(40), "v": np.arange(40) * 2})
    _, rep1 = checkpointed_write(rd.from_pandas(df1), out, key_col="k",
                                 num_partitions=4)
    assert not rep1["skipped"].any()

    df2 = pd.DataFrame({"k": np.arange(40), "v": np.arange(40) * 100})
    _, rep2 = checkpointed_write(rd.from_pandas(df2), out, key_col="k",
                                 num_partitions=4)
    assert not rep2["skipped"].any()  # every partition rewritten
    got = read_checkpointed(out).to_pandas().sort_values("k").reset_index(drop=True)
    assert (got["v"].to_numpy() == got["k"].to_numpy() * 100).all()
