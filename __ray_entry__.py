"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial-join + tiling pipeline on
sf0.001; ``queries()`` exposes each implemented operator/pipeline from
SURVEY.md §2; ``oracle_sql()`` gives the DuckDB-equivalent SQL per
query (tables region nation customer supplier part orders lineitem
events documents embeddings are pre-registered views).

Ray is initialised by the driver BEFORE this module is imported — no
ray.init()/ray.shutdown() here or in the library code.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def _tune_data_context() -> None:
    """Process-global Ray Data tuning, applied at import time (the
    driver inits Ray BEFORE importing this module, and each Dataset
    snapshots a copy of the context at creation — so this must run
    before any query builds a Dataset).

    Hash-partitioned shuffle is OPT-IN via RAYSPATIAL_SHUFFLE=hash (a
    no-op otherwise).  On a raw 8M-row groupby(part 0..63).map_groups
    micro the hash exchange wins big (15.4s sort -> 2.0s hash at 32
    cpus), but Ray 2.49.2's implementation stalls <=8-cpu sessions
    (aggregator actors reserve CPUs up-front) and its finalize crashes
    on empty key-less blocks — see util.enable_hash_shuffle for the
    full write-up.  The default stays the sort exchange.
    """
    from rayspatial.util import enable_hash_shuffle

    enable_hash_shuffle()


_tune_data_context()

# shared SQL fragments ------------------------------------------------------

_PTS_CTE = """
pts AS (
  SELECT doc_id,
         'https://site-' || CAST(doc_id % 97 AS VARCHAR) || '.example.com/page/'
             || CAST(doc_id AS VARCHAR) AS url,
         ((doc_id * 2654435761) % 360000000) / 1000000.0 - 180.0 AS lon,
         ((doc_id * 2246822519) % 170000000) / 1000000.0 - 85.0 AS lat
  FROM documents
)
""".strip()

# Morton bit-interleave as plain SQL arithmetic (bit i of qx -> 2i,
# bit i of qy -> 2i+1) — mirrors ops/zorder.morton2d exactly.
_Z_EXPR = " + ".join(
    [f"(((qx >> {i}) & 1) << {2 * i})" for i in range(16)]
    + [f"(((qy >> {i}) & 1) << {2 * i + 1})" for i in range(16)])

_NGRAM_PAIRS_CTE = (
    r"w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents), idx AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM w), ng AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g FROM idx), sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM ng GROUP BY doc_id), inter AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter FROM ng a JOIN ng b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2), pairsq AS (SELECT i.a, i.b FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b WHERE 100 * i.inter >= 50 * (sa.nsh + sb.nsh - i.inter))"
)

_POLYS_CTE = """
polys AS (
  SELECT CAST(range AS BIGINT) AS poly_id,
         CAST((range * 7919)   % 340 - 180 AS DOUBLE) AS xmin,
         CAST((range * 104729) % 150 - 85  AS DOUBLE) AS ymin,
         CAST((range * 7919)   % 340 - 180 + 6 + (range % 19) AS DOUBLE) AS xmax,
         CAST((range * 104729) % 150 - 85  + 4 + (range % 13) AS DOUBLE) AS ymax
  FROM range(240)
)
""".strip()


def _minhash_oracle_sql() -> str:
    """SQL reproduction of minhash_lsh_candidates (textops/dedup.py):
    FNV-1a shingle hashes, 64 splitmix64 permutations (the 64x64-bit
    multiply done mod 2^64 via 32-bit split — HUGEINT holds at most
    2^127), per-band polynomial keys, docs sharing any (band, key).
    Generated here because the splitmix constants repeat per stage."""
    M = "CAST(18446744073709551616 AS HUGEINT)"
    P32 = "CAST(4294967296 AS HUGEINT)"
    FNV_P = "CAST(1099511628211 AS HUGEINT)"

    def mul64(x: str, c: int) -> str:
        C = f"CAST({c} AS HUGEINT)"
        return (f"(((({x}) // {P32}) * {C} % {P32}) * {P32} "
                f"+ (({x}) % {P32}) * {C}) % {M}")

    def sm_stage(prev: str, shift: int, mulc: int | None) -> str:
        x = f"xor({prev}, ({prev}) // CAST({2 ** shift} AS HUGEINT))"
        return mul64(x, mulc) if mulc else x

    seed_vals = ", ".join(
        f"({p}, CAST({(0x9E3779B97F4A7C15 * (p + 1)) % 2 ** 64} AS HUGEINT))"
        for p in range(64)
    )
    band_vals = ", ".join(
        f"({b}, CAST({(0x9E3779B97F4A7C15 * (b + 1)) % 2 ** 64} AS HUGEINT))"
        for b in range(16)
    )
    return rf"""
WITH RECURSIVE
w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
idx AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 2)) AS i FROM w),
ng AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g FROM idx),
gs AS (SELECT DISTINCT g FROM ng),
f(g, pos, h) AS (
  SELECT g, 1, CAST(14695981039346656037 AS HUGEINT) FROM gs
  UNION ALL
  SELECT f.g, f.pos + 1,
    (xor(f.h, CAST(ord(substr(f.g, f.pos, 1)) AS HUGEINT)) * {FNV_P}) % {M}
  FROM f WHERE f.pos <= length(f.g)),
gh AS (SELECT g, h FROM f WHERE pos = length(g) + 1),
seeds(p, a) AS (VALUES {seed_vals}),
x0 AS (SELECT g, p, (h + a) % {M} AS x FROM gh CROSS JOIN seeds),
x1 AS (SELECT g, p, {sm_stage('x', 30, 0xBF58476D1CE4E5B9)} AS x FROM x0),
x2 AS (SELECT g, p, {sm_stage('x', 27, 0x94D049BB133111EB)} AS x FROM x1),
ph AS (SELECT g, p, {sm_stage('x', 31, None)} AS x FROM x2),
sig0 AS (SELECT ng.doc_id, ph.p, MIN(ph.x) AS s
         FROM ng JOIN ph USING (g) GROUP BY ng.doc_id, ph.p),
sig AS (SELECT d.doc_id, sd.p,
        COALESCE(s0.s, CAST(18446744073709551615 AS HUGEINT)) AS s
        FROM documents d CROSS JOIN seeds sd
        LEFT JOIN sig0 s0 ON s0.doc_id = d.doc_id AND s0.p = sd.p),
bl AS (SELECT doc_id, p // 4 AS band, list(s ORDER BY p) AS l
       FROM sig GROUP BY doc_id, p // 4),
k1 AS (SELECT doc_id, band, ((l[1] * {FNV_P}) % {M} + l[2]) % {M} AS k, l FROM bl),
k2 AS (SELECT doc_id, band, ((k * {FNV_P}) % {M} + l[3]) % {M} AS k, l FROM k1),
k3 AS (SELECT doc_id, band, ((k * {FNV_P}) % {M} + l[4]) % {M} AS k FROM k2),
bk0 AS (SELECT doc_id, band, (k + b.a) % {M} AS x FROM k3
        JOIN (VALUES {band_vals}) AS b(bb, a) ON b.bb = band),
bk1 AS (SELECT doc_id, band, {sm_stage('x', 30, 0xBF58476D1CE4E5B9)} AS x FROM bk0),
bk2 AS (SELECT doc_id, band, {sm_stage('x', 27, 0x94D049BB133111EB)} AS x FROM bk1),
bk AS (SELECT doc_id, band, {sm_stage('x', 31, None)} AS key FROM bk2)
SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
""".strip()


def _cell_expr(col: str, lo: float, span: float, n: int) -> str:
    return (
        f"CAST(GREATEST(LEAST(FLOOR(({col} + {lo}) / {span} * {n}), {n - 1}), 0) AS BIGINT)"
    )


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    from rayspatial.pipeline.flagship import flagship

    return flagship(SF0001)


# ---------------------------------------------------------------------------


def _q_extract_points(sf_dir: str):
    from rayspatial.pipeline.flagship import points_dataset

    return points_dataset(sf_dir)


def _q_tile_counts(sf_dir: str):
    from rayspatial.ops.tiles import tile_counts
    from rayspatial.pipeline.flagship import points_dataset

    return tile_counts(points_dataset(sf_dir), res=6)


def _q_tile_pyramid(sf_dir: str):
    """Multi-resolution tile pyramid (ops/tiles.tile_pyramid): counts
    at res 6..2 from one raw pass — coarser levels roll up the
    previous level's bounded aggregate by quad-parent halving."""
    from rayspatial.ops.tiles import tile_pyramid
    from rayspatial.pipeline.flagship import points_dataset

    return tile_pyramid(points_dataset(sf_dir), res_hi=6, res_lo=2)


def _q_pip_join(sf_dir: str):
    from rayspatial.ops.join import join_points_polygons
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    pairs = join_points_polygons(points_dataset(sf_dir), polygon_geoms(), predicate="covers")
    return pairs.select_columns(["doc_id", "poly_id"])


def _q_pip_join_shuffled(sf_dir: str):
    from rayspatial.ops.join import join_points_polygons_shuffled
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    pairs = join_points_polygons_shuffled(
        points_dataset(sf_dir), polygon_geoms(), predicate="covers"
    )
    return pairs.select_columns(["doc_id", "poly_id"])


def _q_pip_join_subdivided(sf_dir: str):
    """Shuffle PIP join over the SUBDIVIDED layer (ST_Subdivide path):
    the task for cell c holds clip(polygon, cell_rect(c)) only — the
    scale shape for continent-sized polygons."""
    from rayspatial.ops.join import join_points_polygons_subdivided
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    pairs = join_points_polygons_subdivided(
        points_dataset(sf_dir), polygon_geoms(), predicate="covers"
    )
    return pairs.select_columns(["doc_id", "poly_id"])


def _q_flagship(sf_dir: str):
    from rayspatial.pipeline.flagship import flagship

    return flagship(sf_dir)


def _q_total_bounds(sf_dir: str):
    """Global AGG: total_bounds of the extracted points (reference
    measurement.py:106-148 as partial+final min/max)."""
    import pyarrow as pa

    from rayspatial.pipeline.flagship import points_dataset

    ds = points_dataset(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        return pa.table(
            {
                "xmin": [float(np.min(lon))],
                "ymin": [float(np.min(lat))],
                "xmax": [float(np.max(lon))],
                "ymax": [float(np.max(lat))],
            }
        )

    from ray.data.aggregate import Max, Min

    part = ds.map_batches(partial, batch_format="pyarrow")
    row = part.aggregate(
        Min("xmin", alias_name="xmin"),
        Min("ymin", alias_name="ymin"),
        Max("xmax", alias_name="xmax"),
        Max("ymax", alias_name="ymax"),
    )
    return pa.table({k: [v] for k, v in row.items()})


def _q_pages_by_lang(sf_dir: str):
    """Pages per language (smoke for the pages synthesizer)."""
    from ray.data.aggregate import Count

    from rayspatial.pipeline.pages import read_pages

    ds = read_pages(sf_dir).select_columns(["lang"])
    return ds.groupby("lang").aggregate(Count(alias_name="n_pages"))


def _q_knn_join(sf_dir: str):
    from rayspatial.ops.knn import knn_join
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    out = knn_join(points_dataset(sf_dir), polygon_geoms(), k=3)
    return out.select_columns(["doc_id", "poly_id", "rank"])


def _q_nearest_poly(sf_dir: str):
    from rayspatial.ops.knn import knn_join
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    out = knn_join(points_dataset(sf_dir), polygon_geoms(), k=1)
    return out.select_columns(["doc_id", "poly_id"])


def _q_poly_area_perimeter(sf_dir: str):
    """Measurement kernels (area/length) over the polygon layer as a
    map_batches stage on WKB (reference measurement.py:23-47,152-178)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rayspatial.geom.constructive import boundary
    from rayspatial.geom.measures import area, length
    from rayspatial.geom.wkb import parse_wkb, to_wkb
    from rayspatial.pipeline.polygons import polygon_geoms

    ga = polygon_geoms()
    tab = pa.table(
        {
            "poly_id": pa.array(np.arange(len(ga), dtype=np.int64)),
            "wkb": pa.array(to_wkb(ga), type=pa.binary()),
        }
    )

    def measures(batch: pa.Table) -> pa.Table:
        g = parse_wkb(batch.column("wkb"))
        return pa.table(
            {
                "poly_id": batch.column("poly_id"),
                "area": pa.array(area(g)),
                "perimeter": pa.array(length(boundary(g))),
            }
        )

    return rd.from_arrow(tab).map_batches(measures, batch_format="pyarrow")


def _q_tile_vectorize(sf_dir: str):
    """Raster->vector tile materialization: per-tile count grids ->
    maximal-rectangle vector boxes (north_star raster<->vector).

    For the DuckDB oracle the output boxes are EXPLODED back into the
    fine cells they cover (parse box WKB -> bounds -> integer subcell
    ranges): if the rectangle cover is exact AND disjoint, the exploded
    rows equal exactly the distinct occupied fine cells — any cover
    bug (missed cell, overlap, spurious box) breaks row count or hash
    (round-2 verdict item 4)."""
    import numpy as np
    import pyarrow as pa

    from rayspatial import cell as cellmod
    from rayspatial.ops.tiles import rasterize_tiles, vectorize_tiles
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.textops.hashing import _ragged_arange

    RES, TILE_RES = 3, 6
    nsub = 1 << (TILE_RES - RES)
    raster = rasterize_tiles(points_dataset(sf_dir), res=RES, tile_res=TILE_RES)
    vec = vectorize_tiles(raster, res=RES, tile_res=TILE_RES, threshold=1)

    def explode(batch: pa.Table) -> pa.Table:
        from rayspatial.geom.wkb import parse_wkb

        empty = pa.table({
            "cell_x": pa.array([], type=pa.int64()),
            "cell_y": pa.array([], type=pa.int64()),
            "fx": pa.array([], type=pa.int64()),
            "fy": pa.array([], type=pa.int64()),
        })
        if not len(batch):
            return empty
        ga = parse_wkb(batch.column("wkb").to_numpy(zero_copy_only=False))
        b = ga.bounds()
        cell_x = batch.column("cell_x").to_numpy()
        cell_y = batch.column("cell_y").to_numpy()
        cid = cellmod.encode_xy(cell_x, cell_y, RES)
        txmin, tymin, txmax, tymax = cellmod.cell_bounds(cid)
        w = (txmax - txmin) / nsub
        h = (tymax - tymin) / nsub
        i0 = np.rint((b[:, 0] - txmin) / w).astype(np.int64)
        i1 = np.rint((b[:, 2] - txmin) / w).astype(np.int64)
        j0 = np.rint((b[:, 1] - tymin) / h).astype(np.int64)
        j1 = np.rint((b[:, 3] - tymin) / h).astype(np.int64)
        nx = i1 - i0
        cnt = nx * (j1 - j0)
        rep = np.repeat(np.arange(len(b)), cnt)
        k = _ragged_arange(cnt)
        di = k % nx[rep]
        dj = k // nx[rep]
        return pa.table({
            "cell_x": pa.array(cell_x[rep]),
            "cell_y": pa.array(cell_y[rep]),
            "fx": pa.array(cell_x[rep] * nsub + i0[rep] + di),
            "fy": pa.array(cell_y[rep] * nsub + j0[rep] + dj),
        })

    return vec.map_batches(explode, batch_format="pyarrow")


def _q_dwithin_join(sf_dir: str):
    """All (point, polygon) pairs within 3 degrees (broadcast layer,
    ring expansion bounded by the distance; exact for the box layer)."""
    from rayspatial.ops.knn import dwithin_join
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    out = dwithin_join(points_dataset(sf_dir), polygon_geoms(), distance=3.0)
    return out.select_columns(["doc_id", "poly_id"])


def _q_dup_groups(sf_dir: str):
    """Near-duplicate GROUPS: n-gram Jaccard pairs -> distributed
    min-label connected components -> (doc_id, rep)."""
    import pyarrow as pa

    from rayspatial.textops.components import connected_components_distributed
    from rayspatial.textops.dedup import ngram_jaccard_dup_pairs

    pairs = ngram_jaccard_dup_pairs(
        _docs(sf_dir, rows_per_block=512), k=3, threshold_pct=50
    ).map_batches(
        lambda b: b.select(["a", "b"]), batch_format="pyarrow"
    )
    return connected_components_distributed(pairs)


def _q_events_sliding(sf_dir: str):
    """Sliding 1-hour windows advancing every 30 minutes (value summed
    in integer cents)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.window import sliding_window
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "value"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("value"), 100.0),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return batch.set_column(
            batch.column_names.index("value"), "value", cents
        )

    return sliding_window(ds.map_batches(to_cents, batch_format="pyarrow"),
                          width_s=3600, slide_s=1800)


def _q_buffer_area(sf_dir: str):
    """Styled buffer over the polygon layer as a distributed map stage:
    mitre-join radius-2 buffer of each box is the exact rectangle
    expansion, so buf_area has an exact SQL oracle."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rayspatial import geom as g
    from rayspatial.pipeline.polygons import polygon_geoms

    ga = polygon_geoms()
    tab = pa.table({
        "poly_id": pa.array(np.arange(len(ga), dtype=np.int64)),
        "wkb": pa.array(g.to_wkb(ga), type=pa.binary()),
    })

    def buf_area(batch: pa.Table) -> pa.Table:
        geoms = g.from_wkb(batch.column("wkb"))
        buf = g.buffer(geoms, 2.0, join_style="mitre")
        # true areas are integers; x1000+round absorbs the 1e-13-relative
        # noise the overlay's 1e-9 snap grid leaves on large coordinates
        a_milli = np.round(g.area(buf) * 1000.0).astype(np.int64)
        return pa.table({
            "poly_id": batch.column("poly_id"),
            "buf_area_milli": pa.array(a_milli),
        })

    return rd.from_arrow(tab).repartition(8).map_batches(
        buf_area, batch_format="pyarrow"
    )


def _q_line_clip(sf_dir: str):
    """Clip slope-1/2 integer-coordinate segments (one per extracted
    point) against the broadcast polygon layer via the exact lineal
    intersection kernel; emit the integer squared-length metric
    (ops/lineclip.py doc: half-integer clip coords make len2 exact)."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.lineclip import clip_lines_to_polygons
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    def to_segs(batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy()
        lat = batch.column("lat").to_numpy()
        x1 = np.floor(lon)
        y1 = np.floor(lat)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "x1": pa.array(x1),
            "y1": pa.array(y1),
            "x2": pa.array(x1 + 2.0),
            "y2": pa.array(y1 + 1.0),
        })

    segs = points_dataset(sf_dir).map_batches(to_segs, batch_format="pyarrow")
    return clip_lines_to_polygons(segs, polygon_geoms())


def _q_events_windowed(sf_dir: str):
    """Tumbling 1-hour windows per event_type (custom windowed-agg
    operator; value summed in integer cents so the oracle compare is
    exact)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.window import tumbling_window
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("value"), 100.0),
                     round_mode="half_towards_infinity"),  # DuckDB round()
            pa.int64(),
        )
        return batch.set_column(
            batch.column_names.index("value"), "value", cents
        )

    return tumbling_window(ds.map_batches(to_cents, batch_format="pyarrow"),
                           width_s=3600, keys=["event_type"])


def _q_top_users(sf_dir: str):
    """Top-10 users by total event value (integer cents; partial-agg ->
    bounded combine -> head)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.window import top_k_by_group
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("value"), 100.0),
                     round_mode="half_towards_infinity"),  # DuckDB round()
            pa.int64(),
        )
        return batch.set_column(batch.column_names.index("value"), "value", cents)

    out = top_k_by_group(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        ["user_id"], "value", k=10,
    )
    return out.map_batches(
        lambda b: b.rename_columns(["user_id", "total_cents"]),
        batch_format="pyarrow",
    )


def _q_events_streaming(sf_dir: str):
    """Out-of-order event-time tumbling windows with a 10-minute
    watermark lateness (ops/streaming.py): aggregates only events that
    were not late at their arrival (arrival order = event_id per
    user_id%8 partition), so the result is deterministic and
    SQL-reproducible via a running-max window function."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.streaming import streaming_tumbling_window
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("value"), 100.0),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return batch.set_column(
            batch.column_names.index("value"), "value", cents
        )

    return streaming_tumbling_window(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        width_s=3600, lateness_s=600, num_partitions=8,
    )


def _q_stream_stream_join(sf_dir: str):
    """Stream-stream watermarked interval join (ops/streaming.py,
    SURVEY 8.8.5): every surviving purchase paired with every surviving
    click of the same user within [-30 min, +5 min]; each stream drops
    events late against its own per-event watermark (running max per
    user_id%8 partition in event_id arrival order, 10-min lateness) —
    reproducible in SQL by one window function per stream."""
    import pyarrow.compute as pc

    from rayspatial.ops.streaming import streaming_interval_join
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def only(kind):
        def fn(batch):
            return batch.filter(pc.equal(batch.column("event_type"), kind))
        return fn

    pur = ds.map_batches(only("purchase"), batch_format="pyarrow")
    clk = ds.map_batches(only("click"), batch_format="pyarrow")
    return streaming_interval_join(
        pur, clk, before_s=1800, after_s=300, lateness_s=600,
        num_partitions=8)


def _q_stream_stream_join_salted(sf_dir: str):
    """Hot-key-safe stream-stream interval join (two exchanges: cheap
    per-part survivor replay, then a (time-bucket, key-salt) pair-join
    shuffle with <=3x right replication) — equals the plain operator
    row-for-row, so it shares its SQL oracle."""
    import pyarrow.compute as pc

    from rayspatial.ops.streaming import streaming_interval_join_salted
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def only(kind):
        def fn(batch):
            return batch.filter(pc.equal(batch.column("event_type"), kind))
        return fn

    pur = ds.map_batches(only("purchase"), batch_format="pyarrow")
    clk = ds.map_batches(only("click"), batch_format="pyarrow")
    return streaming_interval_join_salted(
        pur, clk, before_s=1800, after_s=300, lateness_s=600,
        num_partitions=8, salt=8)


def _q_asof_prior_click(sf_dir: str):
    """As-of join: each 'error' event matched to the most recent
    'click' (ts <= error ts) by the same user — one hash shuffle,
    per-partition vectorized merge_asof (ops/asof.py)."""
    import pyarrow.compute as pc

    from rayspatial.ops.asof import asof_join
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    def only(kind):
        def fn(batch):
            return batch.filter(pc.equal(batch.column("event_type"), kind))
        return fn

    err = ds.map_batches(only("error"), batch_format="pyarrow")
    clk = ds.map_batches(only("click"), batch_format="pyarrow")
    out = asof_join(err, clk, by="user_id", on="ts", id_col="event_id")
    return out.select_columns(["event_id", "event_id_right"])


def _q_asof_salted(sf_dir: str):
    """Hot-key-safe as-of join: (user, 6h-bucket)-salted first pass +
    bounded summary pass (ops/asof.asof_join_salted) — same result as
    `asof_prior_click`, same SQL oracle."""
    import pyarrow.compute as pc

    from rayspatial.ops.asof import asof_join_salted
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )

    def only(kind):
        def fn(batch):
            return batch.filter(pc.equal(batch.column("event_type"), kind))
        return fn

    err = ds.map_batches(only("error"), batch_format="pyarrow")
    clk = ds.map_batches(only("click"), batch_format="pyarrow")
    out = asof_join_salted(err, clk, by="user_id", on="ts",
                           id_col="event_id", bucket_s=6 * 3600)
    return out.select_columns(["event_id", "event_id_right"])


def _q_range_join_views(sf_dir: str):
    """Time-interval range join: per 'click', COUNT and exact cent-SUM
    of the same user's 'view' events in (ts, ts + 6 h] — the right
    side replicated to adjacent 6-hour buckets, one salted hash
    shuffle, per-partition searchsorted + prefix-sum kernel
    (ops/rangejoin.py)."""
    import pyarrow.compute as pc

    from rayspatial.ops.rangejoin import interval_agg_join
    from rayspatial.util import read_parquet_sized

    import pyarrow as pa

    delta_us = 6 * 3600 * 1_000_000
    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def prep(kind):
        def fn(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.equal(batch.column("event_type"), kind))
            cents = pc.cast(
                pc.round(pc.multiply(t.column("value"), 100.0),
                         round_mode="half_towards_infinity"),
                pa.int64(),
            )
            return pa.table({
                "event_id": t.column("event_id"),
                "user_id": t.column("user_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
                "cents": cents,
            })
        return fn

    clk = ds.map_batches(prep("click"), batch_format="pyarrow")
    vw = ds.map_batches(prep("view"), batch_format="pyarrow")
    out = interval_agg_join(
        clk, vw, by="user_id", on="ts_us", delta=delta_us,
        left_id="event_id", right_value="cents",
        out_count="n_views", out_sum="sum_view_cents",
    )
    return out.select_columns(["event_id", "n_views", "sum_view_cents"])


def _q_sessions_salted(sf_dir: str):
    """Hot-user-safe sessionization: shuffle key salted with a 6-hour
    time bucket, sessions stitched across bucket boundaries in a
    bounded second pass over SESSION rows (ops/window.sessionize_salted)
    — same result as `sessions`, same SQL oracle."""
    from rayspatial.ops.window import sessionize_salted
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    out = sessionize_salted(ds, gap_s=1800, bucket_s=6 * 3600)
    return out.select_columns(
        ["user_id", "session_start", "session_end", "n_events"]
    )


def _q_sessions(sf_dir: str):
    """Gap-based sessionization (30-min gap) per user."""
    from rayspatial.ops.window import sessionize
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )
    out = sessionize(ds, gap_s=1800)
    return out.select_columns(
        ["user_id", "session_start", "session_end", "n_events"]
    )


# --- training-data operators (dedup / similarity / text analysis) ---------


def _docs(sf_dir: str, rows_per_block: int | None = None):
    from rayspatial.util import read_parquet_sized

    return read_parquet_sized(
        f"{sf_dir}/documents.parquet", rows_per_block=rows_per_block
    )


def _embs(sf_dir: str):
    from rayspatial.util import read_parquet_sized

    return read_parquet_sized(f"{sf_dir}/embeddings.parquet")


def _q_exact_dedup(sf_dir: str):
    from rayspatial.textops.dedup import exact_dedup_groups

    # split the content-hash map stage across workers (a single block
    # would serialize the hashing into one task)
    return exact_dedup_groups(_docs(sf_dir, rows_per_block=512))


def _q_token_counts(sf_dir: str):
    from rayspatial.textops.analysis import token_counts

    return token_counts(_docs(sf_dir, rows_per_block=512))


def _q_text_stats(sf_dir: str):
    from rayspatial.textops.analysis import text_stats

    return text_stats(_docs(sf_dir, rows_per_block=512))


def _q_orders_by_segment(sf_dir: str):
    """Dimension equi-join + aggregate: orders x customer (broadcast
    hash join, ops/equijoin.py) -> per-market-segment order count and
    exact cent revenue (per-batch partial sums before the tiny
    groupby)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.util import read_parquet_sized

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: pa.table({
            "custkey": b.column("o_custkey"),
            "cents": pc.cast(
                pc.round(pc.multiply(b.column("o_totalprice"), 100.0),
                         round_mode="half_towards_infinity"),
                pa.int64()),
        }),
        batch_format="pyarrow",
    )
    customer = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: pa.table({
            "custkey": b.column("c_custkey"),
            "c_mktsegment": b.column("c_mktsegment"),
        }),
        batch_format="pyarrow",
    )
    joined = hash_join(orders, customer, on="custkey",
                       left_cols=["cents"], right_cols=["c_mktsegment"],
                       mode="broadcast")

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        g = df.groupby("c_mktsegment", sort=False).agg(
            n_orders=("cents", "size"), sum_price_cents=("cents", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("sum_price_cents", alias_name="sum_price_cents"))
    )


def _q_user_event_windows(sf_dir: str):
    """Partitioned analytic window functions (ops/analytic.py): per
    user ordered by (ts, event_id) — lag/lead of the cent value,
    row_number, running sum, and rank over ts alone (real ties share a
    rank).  ONE hash-partition shuffle; all kernels are group-boundary
    numpy over each sorted partition."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.analytic import analytic_window
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "value"],
    )

    def to_cents(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("value"), "value",
            pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0),
                             round_mode="half_towards_infinity"),
                    pa.int64()))

    out = analytic_window(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        part_cols=["user_id"], order_cols=["ts", "event_id"],
        specs=[
            {"fn": "lag", "col": "value", "as": "prev_cents"},
            {"fn": "lead", "col": "value", "as": "next_cents"},
            {"fn": "row_number", "as": "rn"},
            {"fn": "cumsum", "col": "value", "as": "run_cents"},
            {"fn": "rank", "as": "ts_rank", "order_cols": ["ts"]},
        ],
        out_cols=["event_id", "user_id"],
    )
    return out


def _q_distinct_users_daily(sf_dir: str):
    """Exact per-day COUNT(DISTINCT user_id) (ops/distinct.py): per-
    block (day, user) Arrow dedup combiner -> one hash-partition
    shuffle of distinct pairs -> vectorized nunique."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.distinct import count_distinct
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    DAY_US = 86_400_000_000

    def add_day(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64())
        day = pc.cast(pc.multiply(pc.divide(us, DAY_US), DAY_US),
                      pa.timestamp("us"))
        return pa.table({"day": day, "user_id": batch.column("user_id")})

    return count_distinct(
        ds.map_batches(add_day, batch_format="pyarrow"),
        group_cols=["day"], value_col="user_id", out_name="n_users",
    )


def _q_distinct_users_daily_hll(sf_dir: str):
    """Same distinct count through the HyperLogLog sketch path — the
    100-TB shape (shuffle volume = #groups x 4 KiB regardless of rows).
    Model-defined estimate: no SQL oracle; pytest asserts <5% relative
    error vs the exact path and sketch merge associativity."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.distinct import approx_count_distinct
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )
    DAY_US = 86_400_000_000

    def add_day(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64())
        day = pc.cast(pc.multiply(pc.divide(us, DAY_US), DAY_US),
                      pa.timestamp("us"))
        return pa.table({"day": day, "user_id": batch.column("user_id")})

    return approx_count_distinct(
        ds.map_batches(add_day, batch_format="pyarrow"),
        group_cols=["day"], value_col="user_id", out_name="n_users_approx",
    )


def _q_area_interp(sf_dir: str):
    """Areal interpolation (ops/interp.py): transfer the source
    layer's integer attribute onto the 200-box target layer weighted
    by exact intersection area over source area, in scaled integer
    arithmetic (order-independent distributed sum)."""
    from rayspatial.ops.interp import areal_interpolate
    from rayspatial.pipeline.polygons import (
        polygon_geoms,
        source_values,
        target_boxes_dataset,
    )

    return areal_interpolate(
        target_boxes_dataset(), polygon_geoms(), source_values())



def _splitmix64_cte_sql(key_expr: str, src_table: str, carry_cols: str,
                        seed: int = 0) -> str:
    """CTE chain computing splitmix64(key + GOLDEN*(seed+1)) mod 2^64
    (textops/hashing.py hash_int64) in HUGEINT; final stage exposes the
    mixed value as column ``x`` alongside ``carry_cols``."""
    M = "CAST(18446744073709551616 AS HUGEINT)"
    P32 = "CAST(4294967296 AS HUGEINT)"

    def mul64(x: str, c: int) -> str:
        C = f"CAST({c} AS HUGEINT)"
        return (f"(((({x}) // {P32}) * {C} % {P32}) * {P32} "
                f"+ (({x}) % {P32}) * {C}) % {M}")

    add = (0x9E3779B97F4A7C15 * (seed + 1)) % 2 ** 64
    x1 = mul64(f"xor(x, x // CAST({2 ** 30} AS HUGEINT))",
               0xBF58476D1CE4E5B9)
    x2 = mul64(f"xor(x, x // CAST({2 ** 27} AS HUGEINT))",
               0x94D049BB133111EB)
    return (
        f"sm0 AS (SELECT {carry_cols}, "
        f"(CAST({key_expr} AS HUGEINT) + CAST({add} AS HUGEINT)) % {M} "
        f"AS x FROM {src_table}), "
        f"sm1 AS (SELECT {carry_cols}, {x1} AS x FROM sm0), "
        f"sm2 AS (SELECT {carry_cols}, {x2} AS x FROM sm1), "
        f"sm3 AS (SELECT {carry_cols}, "
        f"xor(x, x // CAST({2 ** 31} AS HUGEINT)) AS x FROM sm2)"
    )


def _q_stratified_sample(sf_dir: str):
    """Deterministic hash-based stratified sampling
    (textops/sampling.py): downsample dominant languages (en 25%,
    zh 80%), keep the tail at 100% — reproducible, shuffle-free,
    partitioning-independent."""
    from rayspatial.textops.sampling import stratified_sample

    sampled = stratified_sample(
        _docs(sf_dir), rates={"en": 0.25, "zh": 0.8})
    import pyarrow as pa

    return sampled.map_batches(
        lambda b: b.select(["doc_id", "lang"]), batch_format="pyarrow")


def _q_tfidf_topk(sf_dir: str):
    """Per-document top-3 TF-IDF terms (textops/tfidf.py): tokenize ->
    one shuffle by term (df attached in place) -> one shuffle by doc
    (top-k select); integer micro-nat scores for exact comparison."""
    from rayspatial.textops.tfidf import tfidf_topk

    docs = _docs(sf_dir, rows_per_block=512)
    return tfidf_topk(docs, n_docs=docs.count(), k=3)


def _q_inverted_index(sf_dir: str):
    """Inverted index over the corpus (textops/index.py): one shuffle
    by term; postings = ','-joined ascending doc ids (df >= 2)."""
    from rayspatial.textops.index import inverted_index

    return inverted_index(_docs(sf_dir, rows_per_block=512), min_df=2)


def _q_pagerank(sf_dir: str):
    """Integer fixed-point PageRank (ops/pagerank.py) over the
    deterministic 3-out-degree link graph i -> (7i+1, 13i+2, 31i+5)
    mod N; 5 iterations, damping 85/100, exact int64 sums."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.pagerank import pagerank
    from rayspatial.util import read_parquet_sized

    import pyarrow.parquet as pq

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
        rows_per_block=512)
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def links(batch: pa.Table) -> pa.Table:
        i = batch.column("doc_id").to_numpy().astype(np.int64)
        return pa.table({
            "src": pa.array(np.tile(i, 3)),
            "dst": pa.array(np.concatenate([
                (i * 7 + 1) % n, (i * 13 + 2) % n, (i * 31 + 5) % n,
            ])),
        })

    edges = docs.map_batches(links, batch_format="pyarrow")
    return pagerank(edges, n, iterations=5)


def _q_value_quantiles(sf_dir: str):
    """Exact event-value quantiles by distributed histogram
    refinement (ops/quantile.py) — selection, never a global sort."""
    from rayspatial.ops.quantile import exact_quantiles
    from rayspatial.util import read_parquet_sized

    ev = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["value"])
    return exact_quantiles(ev, "value", [25, 50, 90, 99])


def _q_host_stats(sf_dir: str):
    """Per-host aggregates over the extracted pages: host parsed from
    the url with a vectorized Arrow regex, per-batch integer partials,
    one result-bounded gather (hosts << pages at any scale)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.pipeline.flagship import points_dataset

    pts = points_dataset(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        host = pc.extract_regex(
            batch.column("url"), r"^https?://(?P<h>[^/]+)/")
        if isinstance(host, pa.ChunkedArray):
            host = host.combine_chunks()
        df = pd.DataFrame({
            "host": host.field("h").to_pandas(),
            "doc_id": batch.column("doc_id").to_numpy(),
        })
        g = df.groupby("host", sort=False)["doc_id"]
        out = g.agg(n_pages="size", min_doc="min", max_doc="max")             .reset_index()
        out["n_pages"] = out["n_pages"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = pts.map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        out = df.groupby("host", sort=False).agg(
            n_pages=("n_pages", "sum"), min_doc=("min_doc", "min"),
            max_doc=("max_doc", "max")).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    return parts.repartition(1).map_batches(
        merge, batch_size=None, batch_format="pyarrow")


def _q_dissolve_groups(sf_dir: str):
    """Dissolve-by-attribute: polygons hash-partitioned by group key,
    each group's members unioned with the n-ary overlay
    (geom/setops.union_all), exact integer areas out.  Groups are
    aggregation units, so the per-group union inside a partition is
    the combiner granularity — no cross-partition motion of geometry
    beyond the one shuffle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from rayspatial import geom as g
    from rayspatial.pipeline.polygons import polygon_geoms
    from rayspatial.util import hash_partitioned_agg

    ga = polygon_geoms()
    ids = np.arange(len(ga), dtype=np.int64)
    tab = pa.table({
        "grp": pa.array(ids % 12),
        "wkb": pa.array(g.to_wkb(ga), type=pa.binary()),
    })
    ds = rd.from_arrow(tab).repartition(6)

    def dissolve(pdf: pd.DataFrame) -> pd.DataFrame:
        from rayspatial.geom.measures import area as g_area
        from rayspatial.geom.setops import union_all
        from rayspatial.geom.wkb import parse_wkb

        rows = []
        for grp, sub in pdf.groupby("grp", sort=False):
            u = union_all(parse_wkb(sub["wkb"].tolist()))
            rows.append((int(grp), int(round(float(g_area(u)[0])))))
        return pd.DataFrame(rows, columns=["grp", "union_area"])

    return hash_partitioned_agg(ds, ["grp"], dissolve)


def _q_grouped_quantiles(sf_dir: str):
    """Per-event-type exact quantiles (ops/quantile.grouped_quantiles):
    one shuffle co-locates each group, vectorized selection inside."""
    from rayspatial.ops.quantile import grouped_quantiles
    from rayspatial.util import read_parquet_sized

    ev = read_parquet_sized(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])
    return grouped_quantiles(ev, "event_type", "value", [50, 90])


def _q_emb_centroids(sf_dir: str):
    """Per-label embedding centroid numerators in exact scaled-integer
    arithmetic: sum over vectors of round(v*1e6) per dimension plus
    member count (a distributed k-means E-step whose reduction is
    order-independent, unlike a float sum)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        lab = batch.column("label").to_numpy(zero_copy_only=False)             .astype(np.int64)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        d = len(emb[0])
        flat = emb.flatten().to_numpy(zero_copy_only=False)             .astype(np.float64)
        m = np.round(flat * 1e6).astype(np.int64).reshape(len(lab), d)
        u, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(u), d), dtype=np.int64)
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(u, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(u))),
            "sum_micro": pa.array(sums.reshape(-1)),
            "n": pa.array(np.repeat(cnt, d)),
        })

    parts = _embs(sf_dir).map_batches(partial, batch_format="pyarrow")

    def merge(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = df.groupby(["label", "dim"], sort=False)             .agg(sum_micro=("sum_micro", "sum"), n=("n", "sum"))             .reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    return parts.repartition(1).map_batches(
        merge, batch_size=None, batch_format="pyarrow")


def _q_kmeans_labels(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings table
    (textops/kmeans.py): one streaming pass per iteration,
    micro-quantized integer M-step (partitioning-independent,
    bit-reproducible vs the serial reference in tests).  No SQL
    oracle: the iterative float E-step is model-defined; rows-only
    driver check + exactness pytest."""
    from rayspatial.textops.kmeans import kmeans_labels

    out, _ = kmeans_labels(_embs(sf_dir), k=8, iterations=4)
    return out


def _q_zonal_stats(sf_dir: str):
    """Zonal statistics (ops/agg.py zonal_stats): per-polygon exact
    integer aggregates (count, micro-degree coordinate sums, id
    min/max) over the covered points — the raster zonal-stats
    primitive on top of the broadcast spatial join."""
    from rayspatial.ops.agg import zonal_stats
    from rayspatial.ops.join import join_points_polygons
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    pairs = join_points_polygons(
        points_dataset(sf_dir), polygon_geoms(), predicate="covers")
    return zonal_stats(pairs)


def _q_spatial_clusters(sf_dir: str):
    """DBSCAN-style eps-connectivity clustering of the extracted page
    points (ops/cluster.py): cell-grid ghost replication -> per-cell
    vectorized pair tests -> distributed min-label components; cluster
    label = min member doc_id, singletons kept."""
    from rayspatial.ops.cluster import eps_clusters
    from rayspatial.pipeline.flagship import points_dataset

    return eps_clusters(points_dataset(sf_dir), eps=8.0)


def _q_span_dedup(sf_dir: str):
    """Corpus-wide span dedup (C4 / Lee-et-al style,
    textops/spandedup.py): every repeated 3-word span keeps only its
    first occurrence by (doc_id, span_idx); docs rebuilt from the
    survivors.  Only 28 B (hash, id, idx) rows cross the first shuffle;
    text moves once in the rebuild shuffle."""
    from rayspatial.textops.spandedup import span_dedup
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        rows_per_block=512,
    )
    return span_dedup(ds, span_w=3)


def _q_line_dedup(sf_dir: str):
    """C4 newline rule (textops/spandedup.line_dedup): the corpus has
    no newlines, so each doc's words are first regrouped into 5-word
    LINES (deterministic, SQL-reproducible — _span_units(5) joined by
    newline), then every repeated non-empty line keeps only its first
    occurrence by (doc_id, line_idx) and docs are rebuilt with
    newline.  Broadcast drop-set rebuild: text never enters a
    shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.textops.spandedup import _span_units, line_dedup
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        rows_per_block=512,
    )

    def to_lines(batch: pa.Table) -> pa.Table:
        spans, off = _span_units(batch.column("text"), 5)
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        lst = pa.LargeListArray.from_arrays(
            pa.array(off, type=pa.int64()), spans)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pc.binary_join(
                lst, pa.scalar("\n", type=pa.large_string())
            ).cast(pa.string()),
        })

    return line_dedup(ds.map_batches(to_lines, batch_format="pyarrow"))


def _q_canonical_docs(sf_dir: str):
    """Near-dup RESOLUTION: duplicate groups (n-gram Jaccard pairs ->
    distributed components) -> keep only each group's canonical (min
    doc_id) member plus all unpaired docs, via a hash-partitioned
    anti-join (ops/relational.anti_join — the labeled drop set is never
    broadcast)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.relational import anti_join
    from rayspatial.textops.components import connected_components_distributed
    from rayspatial.textops.dedup import ngram_jaccard_dup_pairs
    from rayspatial.util import read_parquet_sized

    pairs = ngram_jaccard_dup_pairs(
        _docs(sf_dir, rows_per_block=512), k=3, threshold_pct=50
    ).map_batches(lambda b: b.select(["a", "b"]), batch_format="pyarrow")
    labels = connected_components_distributed(pairs)
    drops = labels.map_batches(
        lambda b: pa.table(
            {"doc_id": b.filter(
                pc.less(b.column("rep"), b.column("doc_id"))
            ).column("doc_id")}
        ),
        batch_format="pyarrow",
    )
    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return anti_join(docs, drops, on="doc_id",
                     left_cols=["doc_id", "n_chars"])


def _q_top_terms(sf_dir: str):
    """Corpus-wide heavy hitters (textops/analysis.top_terms): top-25
    whitespace tokens by exact count — per-batch partial counts (the
    combiner), ONE hash-partition of (term, cnt) partials, per-
    partition exact top-k, final head over k x P rows only."""
    from rayspatial.textops.analysis import top_terms

    return top_terms(_docs(sf_dir), k=25)


def _q_customer_orders_left(sf_dir: str):
    """LEFT outer hash equi-join (ops/equijoin.py, shuffle mode):
    every customer row kept, order keys where they exist; unmatched
    rows surface as sentinel -1 (coalesced on both sides so the
    compare stays integer-exact).  Exercises the typed-null output
    path — partitions with and without unmatched rows must emit the
    same Arrow schema."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.util import read_parquet_sized

    customer = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(
        lambda b: pa.table({"custkey": b.column("c_custkey")}),
        batch_format="pyarrow",
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderkey"]
    ).map_batches(
        lambda b: pa.table({"custkey": b.column("o_custkey"),
                            "o_orderkey": b.column("o_orderkey")}),
        batch_format="pyarrow",
    )
    joined = hash_join(customer, orders, on="custkey",
                       left_cols=["custkey"], right_cols=["o_orderkey"],
                       mode="shuffle", how="left")
    return joined.map_batches(
        lambda b: pa.table({
            "custkey": b.column("custkey"),
            "o_orderkey": pc.fill_null(b.column("o_orderkey"), -1),
        }),
        batch_format="pyarrow",
    )


def _q_docs_quality_band(sf_dir: str):
    """Percentile-threshold curation (ops/quantile.quantile_band_filter):
    drop the n_chars tails, keeping the exact [p10, p90] band — the
    thresholds come from the shared-pass exact quantile operator (two
    scalars to the driver) and apply in ONE streaming filter."""
    import pyarrow as pa

    from rayspatial.ops.quantile import quantile_band_filter
    from rayspatial.util import read_parquet_sized

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return quantile_band_filter(docs, "n_chars", 10, 90).map_batches(
        lambda b: b.select(["doc_id", "n_chars"]), batch_format="pyarrow"
    )


def _q_repetition_stats(sf_dir: str):
    """Gopher-style repetition/quality scoring: per-doc word, unique
    word, top-word and top-bigram counts + an all-integer keep flag
    (textops/analysis.repetition_stats — one dictionary-encode +
    np.unique/reduceat group kernels per batch)."""
    from rayspatial.textops.analysis import repetition_stats
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
        rows_per_block=512,
    )
    return repetition_stats(ds)


def _q_ngram_dup_pairs(sf_dir: str):
    from rayspatial.textops.dedup import ngram_jaccard_dup_pairs

    return ngram_jaccard_dup_pairs(_docs(sf_dir, rows_per_block=512), k=3, threshold_pct=50)


def _q_minhash_candidates(sf_dir: str):
    from rayspatial.textops.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(_docs(sf_dir, rows_per_block=512))


def _q_simhash_pairs(sf_dir: str):
    from rayspatial.textops.dedup import simhash_dup_pairs

    return simhash_dup_pairs(_docs(sf_dir, rows_per_block=512), hamming_k=3)


def _q_ivf_topk_indexed(sf_dir: str):
    """IVF ANN over the MATERIALIZED list-partitioned index (the
    100-TB read-skipping shape): the index is built once per input
    under /tmp, then each run reads only the queries' probed
    partitions (rows-only check; indexed==in-stream equality and the
    read-set bound are asserted in pytest)."""
    import hashlib
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from rayspatial.textops.ann import (
        _emb_matrix,
        ivf_build_index,
        ivf_topk_indexed,
    )
    from rayspatial.util import read_parquet_sized

    st = os.stat(f"{sf_dir}/embeddings.parquet")
    idx = "/tmp/rayspatial_ivf_" + hashlib.md5(
        f"{sf_dir}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]
    if not os.path.exists(os.path.join(idx, "centroids.npy")):
        ivf_build_index(
            read_parquet_sized(f"{sf_dir}/embeddings.parquet"), idx, nlist=16
        )
    tab = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vec_ids = tab.column("vec_id").to_numpy()
    qids = vec_ids[vec_ids % 100 == 0]
    pos = {v: i for i, v in enumerate(vec_ids)}
    qmat = _emb_matrix(tab)[np.asarray([pos[q] for q in qids])]
    return ivf_topk_indexed(idx, qids, qmat, k=5, nprobe=4)


def _q_emb_dup_pairs(sf_dir: str):
    from rayspatial.textops.ann import embedding_dup_pairs

    return embedding_dup_pairs(_embs(sf_dir), threshold=0.4)


def _q_ann_topk(sf_dir: str):
    import pyarrow.parquet as pq

    from rayspatial.textops.ann import ann_topk

    vec_ids = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).column("vec_id").to_numpy()
    qids = vec_ids[vec_ids % 100 == 0]
    return ann_topk(_embs(sf_dir), qids, k=5)


def _q_ivf_topk(sf_dir: str):
    """IVF approximate top-k (k-means coarse quantizer, nprobe probe
    lists) — the brief's IVF scale path; rows-only checked (approx),
    recall + exactness-at-full-probe verified in pytest."""
    import pyarrow.parquet as pq

    from rayspatial.textops.ann import ivf_topk

    vec_ids = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).column("vec_id").to_numpy()
    qids = vec_ids[vec_ids % 100 == 0]
    return ivf_topk(_embs(sf_dir), qids, k=5, nlist=16, nprobe=4)


def _q_srp_candidates(sf_dir: str):
    from rayspatial.textops.ann import srp_bucket_candidates

    return srp_bucket_candidates(_embs(sf_dir))


def _q_pq_rerank_topk(sf_dir: str):
    """Product-quantization ANN with exact rerank (textops/ann.py
    pq_train/pq_encode/pq_topk_rerank — the FAISS IVFPQ+refine shape):
    the corpus compresses to m bytes/vector, the ADC scan nominates a
    shortlist per query, one streaming full-precision pass rescores
    only the shortlist.  Rows-only checked (k-means is not
    SQL-expressible); recall + block-invariance verified in pytest."""
    import numpy as np
    import pyarrow.parquet as pq

    from rayspatial.textops.ann import pq_encode, pq_topk_rerank, pq_train

    tab = pq.read_table(f"{sf_dir}/embeddings.parquet")
    vec_ids = tab.column("vec_id").to_numpy()
    qsel = vec_ids % 100 == 0
    qmat = np.stack(
        tab.column("embedding").to_pandas()[qsel].to_numpy())
    ds = _embs(sf_dir)
    books = pq_train(ds, m_subspaces=8, k_codes=32)
    codes = pq_encode(ds, books)
    return pq_topk_rerank(ds, codes, books, vec_ids[qsel], qmat,
                          k=5, shortlist=50)


def _q_lang_id(sf_dir: str):
    import pyarrow.parquet as pq

    from rayspatial.textops.analysis import lang_id

    sample = (
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
        .to_pandas()
    )
    sample = sample[sample.doc_id < 200]
    return lang_id(_docs(sf_dir, rows_per_block=512), sample)


def _q_fingerprints(sf_dir: str):
    from rayspatial.textops.analysis import fingerprints

    return fingerprints(_docs(sf_dir, rows_per_block=512))


def _q_binary_features(sf_dir: str):
    from rayspatial.pipeline.pages import read_pages
    from rayspatial.textops.multimodal import binary_features

    out = binary_features(read_pages(sf_dir), binary_col="html", id_col="doc_id",
                          concurrency=(1, 4))
    return out.select_columns(["doc_id", "payload_bytes"])


def _q_bmp_features(sf_dir: str):
    """REAL multimodal decode end-to-end (round-3 verdict item 9): a
    16x16 24-bit BMP is synthesized per document (pixel j =
    (doc_id*31 + j) % 256 — closed form, so SQL recomputes the decoded
    statistics without touching bytes), shipped as a binary column
    through the actor-pool feature stage with the pure-numpy BMP
    parser (textops/multimodal.decode_bmp), and the decoded per-channel
    sums / min / max come out as columns."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.textops.multimodal import (FEATURE_DIM, binary_features,
                                               encode_bmp_batch)
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"], rows_per_block=2048)
    W = H = 16
    NB = W * H * 3

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        vals = ((ids[:, None] * 31 + np.arange(NB)[None, :]) % 256
                ).astype(np.uint8)
        payloads = encode_bmp_batch(vals.reshape(-1, H, W, 3))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "img": pa.array(payloads, type=pa.binary())})

    feats = binary_features(ds.map_batches(synth, batch_format="pyarrow"),
                            binary_col="img", id_col="doc_id",
                            decoder="bmp", batch_size=512,
                            concurrency=(1, 4))

    def unpack(batch: pa.Table) -> pa.Table:
        f = (batch.column("features").combine_chunks().flatten()
             .to_numpy().reshape(-1, FEATURE_DIM))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "width": pa.array(f[:, 0]), "height": pa.array(f[:, 1]),
            "sum_r": pa.array(f[:, 2]), "sum_g": pa.array(f[:, 3]),
            "sum_b": pa.array(f[:, 4]), "min_v": pa.array(f[:, 5]),
            "max_v": pa.array(f[:, 6]), "sum_all": pa.array(f[:, 7]),
        })

    return feats.map_batches(unpack, batch_format="pyarrow")


def _q_wav_features(sf_dir: str):
    """REAL audio decode end-to-end: a 256-sample PCM16 mono WAV is
    synthesized per document (sample j = ((doc_id*17 + j*31) % 65536)
    - 32768 — closed form, so SQL recomputes the decoded statistics),
    shipped as binary through the actor-pool stage with the pure-numpy
    RIFF parser (textops/multimodal.decode_wav)."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.textops.multimodal import (FEATURE_DIM, binary_features,
                                               encode_wav)
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"], rows_per_block=2048)
    N = 256

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        s = (((ids[:, None] * 17 + np.arange(N)[None, :] * 31) % 65536)
             - 32768).astype(np.int16)
        payloads = [encode_wav(row, 8000) for row in s]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "wav": pa.array(payloads, type=pa.binary())})

    feats = binary_features(ds.map_batches(synth, batch_format="pyarrow"),
                            binary_col="wav", id_col="doc_id",
                            decoder="wav", batch_size=512,
                            concurrency=(1, 4))

    def unpack(batch: pa.Table) -> pa.Table:
        f = (batch.column("features").combine_chunks().flatten()
             .to_numpy().reshape(-1, FEATURE_DIM))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "rate": pa.array(f[:, 0]), "channels": pa.array(f[:, 1]),
            "n_samples": pa.array(f[:, 2]), "sum_s": pa.array(f[:, 3]),
            "min_s": pa.array(f[:, 4]), "max_s": pa.array(f[:, 5]),
            "sum_abs": pa.array(f[:, 6]), "zero_cross": pa.array(f[:, 7]),
        })

    return feats.map_batches(unpack, batch_format="pyarrow")


def _q_poly_union_area(sf_dir: str):
    """Distributed n-ary polygon union (general overlay) of the 240
    overlapping boxes: per-block partial unions -> final union; output
    the exact union area (oracle: coordinate-compression in SQL)."""
    import pyarrow as pa
    import ray.data as rd

    from rayspatial import geom as g
    from rayspatial.ops.agg import union_all_distributed
    from rayspatial.pipeline.polygons import polygon_geoms

    ga = polygon_geoms()
    tab = pa.table({"wkb": pa.array(g.to_wkb(ga), type=pa.binary())})
    out = union_all_distributed(rd.from_arrow(tab).repartition(8))

    def to_area(batch: pa.Table) -> pa.Table:
        u = g.from_wkb(batch.column("wkb"))
        return pa.table({"union_area": pa.array(g.area(u))})

    return out.map_batches(to_area, batch_format="pyarrow")


def _q_curated_docs(sf_dir: str):
    """End-to-end curation: quality filter + exact dedup (the per-epoch
    training-data chain), one streaming pass + one hash shuffle."""
    from rayspatial.textops.curation import curate

    return curate(_docs(sf_dir, rows_per_block=512), min_tokens=20,
                  max_tokens=400, min_uniq_tokens=10)


def _q_decontaminated_docs(sf_dir: str):
    """Benchmark decontamination: docs sharing any word-4-gram with
    the benchmark subset (doc_id % 23 == 0) are dropped.  Benchmark
    n-gram hashes broadcast once (ray.put, bounded by the eval-set
    vocabulary); one streaming searchsorted filter over the corpus."""
    from rayspatial.textops.decontam import decontaminate

    import numpy as np
    import pyarrow as pa

    def split(want_bench: bool):
        def f(batch: pa.Table) -> pa.Table:
            is_bench = batch.column("doc_id").to_numpy() % 23 == 0
            return batch.filter(pa.array(is_bench if want_bench else ~is_bench))

        return f

    docs = _docs(sf_dir, rows_per_block=512)
    bench = docs.map_batches(split(True), batch_format="pyarrow")
    train = docs.map_batches(split(False), batch_format="pyarrow")
    return decontaminate(train, bench, k=4)


def _q_packed_sequences(sf_dir: str):
    """Sequence packing: greedy first-fit of docs into 256-token
    training sequences within (lang, doc_id//64) units — one token-count
    map_batches pass + one hash shuffle; bins assigned by a rounds loop
    vectorized across every unit in the partition."""
    from rayspatial.textops.packing import pack_sequences

    return pack_sequences(
        _docs(sf_dir, rows_per_block=512), budget=256, window=64
    )


def _q_lm_scores(sf_dir: str):
    """CCNet-style bigram-LM scoring: corpus bigram/unigram counts
    (one hash shuffle, broadcast model) -> per-doc add-one-smoothed
    log-likelihood in integer micro-nats (one streaming pass)."""
    from rayspatial.textops.lm import bigram_lm_scores

    return bigram_lm_scores(_docs(sf_dir, rows_per_block=512))


def _q_customer_orders_full(sf_dir: str):
    """FULL outer hash equi-join (shuffle mode): even-keyed customers
    x per-customer order counts — unmatched rows on BOTH sides
    (odd customers with orders appear right-only; even customers
    without orders left-only), sentinel-coalesced for the compare."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    customer = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(
        lambda b: pa.table(
            {"custkey": b.column("c_custkey")}
        ).filter(pa.array(b.column("c_custkey").to_numpy() % 2 == 0)),
        batch_format="pyarrow",
    )
    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).map_batches(
        lambda b: pa.table({"custkey": b.column("o_custkey")}),
        batch_format="pyarrow",
    )

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("custkey", sort=False).size().rename("n_orders")
        return out.reset_index().astype(np.int64)

    per_cust = hash_partitioned_agg(orders, ["custkey"], cnt)
    joined = hash_join(per_cust, customer.map_batches(
        lambda b: b.append_column(
            "is_cust", pa.array(np.ones(len(b), dtype=np.int64))),
        batch_format="pyarrow",
    ), on="custkey", left_cols=["custkey", "n_orders"],
        right_cols=["is_cust"], mode="shuffle", how="full")
    import pyarrow.compute as pc

    return joined.map_batches(
        lambda b: pa.table({
            "custkey": b.column("custkey"),
            "n_orders": pc.fill_null(b.column("n_orders"), 0),
            "is_cust": pc.fill_null(b.column("is_cust"), 0),
        }),
        batch_format="pyarrow",
    )


def _q_host_capped_docs(sf_dir: str):
    """Domain-contribution cap: at most 4 pages per host (host parsed
    from the url with a vectorized Arrow regex), first-by-doc_id kept —
    one hash shuffle, exact per-group head."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.textops.sampling import cap_per_group

    pts = points_dataset(sf_dir)

    def parse_host(batch: pa.Table) -> pa.Table:
        host = pc.extract_regex(batch.column("url"), r"^https?://(?P<h>[^/]+)/")
        if isinstance(host, pa.ChunkedArray):
            host = host.combine_chunks()
        return pa.table({"host": host.field("h"),
                         "doc_id": batch.column("doc_id")})

    hosted = pts.map_batches(parse_host, batch_format="pyarrow")
    return cap_per_group(hosted, "host", 4, order_col="doc_id")


def _q_vocab(sf_dir: str):
    """Tokenizer-vocabulary build: exact corpus term counts (bounded
    combine), min-count filter, contiguous token ids by rank."""
    from rayspatial.textops.analysis import build_vocab

    return build_vocab(_docs(sf_dir, rows_per_block=512), min_count=3)


def _q_rolling_user_value(sf_dir: str):
    """Time-RANGE rolling window: per event, SUM(value_cents)/COUNT
    over the same user's trailing hour (equal-ts peers included, SQL
    RANGE semantics) — one hash shuffle, per-partition offset-shifted
    searchsorted (no per-user Python loop)."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.analytic import rolling_time_window
    from rayspatial.util import read_parquet_sized

    events = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    ).map_batches(
        lambda b: pa.table({
            "event_id": b.column("event_id"),
            "ts": b.column("ts"),
            "user_id": b.column("user_id"),
            "cents": pa.array(
                np.round(b.column("value").to_numpy() * 100).astype(np.int64)
            ),
        }),
        batch_format="pyarrow",
    )
    return rolling_time_window(
        events, "user_id", "ts", "cents",
        window_us=3_600_000_000, id_cols=["event_id"],
    )


def _q_rolling_user_median(sf_dir: str):
    """ROWS-frame rolling median (ops/analytic.rolling_rows_median):
    per event, 2x the median of the user's last 5 values (ROWS BETWEEN
    4 PRECEDING AND CURRENT ROW) — one user-keyed shuffle, vectorized
    (rows x k) order-statistic gather, integer-exact med2 output."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.analytic import rolling_rows_median
    from rayspatial.util import read_parquet_sized

    events = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    ).map_batches(
        lambda b: pa.table({
            "event_id": b.column("event_id"),
            "tsu": pa.array(b.column("ts").to_numpy()
                            .astype("datetime64[us]").astype(np.int64)),
            "user_id": b.column("user_id"),
            "cents": pa.array(
                np.round(b.column("value").to_numpy() * 100).astype(np.int64)
            ),
        }),
        batch_format="pyarrow",
    )
    return rolling_rows_median(events, "user_id", ["tsu", "event_id"],
                               "cents", k=5, id_cols=["event_id"])


def _q_rolling_user_value_salted(sf_dir: str):
    """Hot-key-safe rolling window: shuffle key (user, ts // bucket)
    with boundary replicas, so one mega-user still parallelizes.
    Shares the rolling_user_value oracle (outputs are identical)."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.analytic import rolling_time_window_salted
    from rayspatial.util import read_parquet_sized

    events = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "value"]
    ).map_batches(
        lambda b: pa.table({
            "event_id": b.column("event_id"),
            "ts": b.column("ts"),
            "user_id": b.column("user_id"),
            "cents": pa.array(
                np.round(b.column("value").to_numpy() * 100).astype(np.int64)
            ),
        }),
        batch_format="pyarrow",
    )
    return rolling_time_window_salted(
        events, "user_id", "ts", "cents",
        window_us=3_600_000_000, bucket_us=4 * 3_600_000_000,
        id_cols=["event_id"],
    )


def _q_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: multi-aggregate groupby over lineitem with a
    date filter — per-batch integer partials (cents / scaled products)
    -> one small hash combine.  All money terms are exact integers."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"],
    )
    cutoff = np.datetime64("1998-09-02")

    def partial(batch: pa.Table) -> pa.Table:
        ship = batch.column("l_shipdate").to_numpy()
        keep = ship <= cutoff
        qty = batch.column("l_quantity").to_numpy()[keep].astype(np.int64)
        price_c = np.round(
            batch.column("l_extendedprice").to_numpy()[keep] * 100
        ).astype(np.int64)
        disc_pct = np.round(
            batch.column("l_discount").to_numpy()[keep] * 100
        ).astype(np.int64)
        # disc price in 1e-4 units: price_c * (100 - disc_pct)
        disc_price = price_c * (100 - disc_pct)
        df = pd.DataFrame({
            "l_returnflag": batch.column("l_returnflag").to_numpy(
                zero_copy_only=False)[keep],
            "l_linestatus": batch.column("l_linestatus").to_numpy(
                zero_copy_only=False)[keep],
            "sum_qty": qty,
            "sum_price_cents": price_c,
            "sum_disc_price_e4": disc_price,
            "n_rows": np.ones(len(qty), dtype=np.int64),
        })
        out = df.groupby(["l_returnflag", "l_linestatus"], sort=False
                         ).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = li.map_batches(partial, batch_format="pyarrow")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["l_returnflag", "l_linestatus"], sort=False
                          ).sum().reset_index()

    return hash_partitioned_agg(
        parts, ["l_returnflag", "l_linestatus"], combine)


def _q_approx_quantiles(sf_dir: str):
    """ONE-pass mergeable quantile sketch (ops/quantile.approx_quantiles,
    MRL deterministic compaction): order-value estimates whose partials
    are a few KB per block — the streaming complement of the 3-pass
    exact operator.  Rows-only checked (approximate by construction;
    the <1% rank-error bound and merge associativity are pytest)."""
    from rayspatial.ops.quantile import approx_quantiles
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/lineitem.parquet",
                            columns=["l_extendedprice"])
    return approx_quantiles(ds, "l_extendedprice", [1, 25, 50, 75, 99])


def _q_weighted_sample(sf_dir: str):
    """Deterministic weight-proportional sampling without replacement
    (textops/sampling.weighted_sample, Efraimidis-Spirakis): top-100
    documents by hash-seeded priority u^(1/n_chars) — length-biased
    curation sampling as one streaming pass + bounded merge."""
    from rayspatial.textops.sampling import weighted_sample
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "n_chars"])
    return weighted_sample(ds, k=100)


def _q_lineitem_group_attach(sf_dir: str):
    """COMPOSITE-KEY equi-join (ops/equijoin.py, on=[flag, status]):
    per-(l_returnflag, l_linestatus) totals computed by one
    hash-partitioned combine, then attached to every lineitem row via
    a composite-key broadcast join (the grouped side is tiny; the fact
    stream never shuffles) — the window-function 'group total attach'
    shape."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_returnflag",
                 "l_linestatus", "l_extendedprice"],
    ).map_batches(
        lambda b: pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_linenumber": b.column("l_linenumber"),
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "cents": pa.array(np.round(
                b.column("l_extendedprice").to_numpy() * 100
            ).astype(np.int64)),
        }),
        batch_format="pyarrow",
    )

    def totals(df):
        out = (df.groupby(["l_returnflag", "l_linestatus"], sort=False)
               ["cents"].agg([("group_cents", "sum"),
                              ("group_n", "size")]).reset_index())
        out["group_cents"] = out["group_cents"].astype(np.int64)
        out["group_n"] = out["group_n"].astype(np.int64)
        return out

    grouped = hash_partitioned_agg(
        li.map_batches(lambda b: b.select(
            ["l_returnflag", "l_linestatus", "cents"]),
            batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"], totals)
    return hash_join(
        li, grouped, on=["l_returnflag", "l_linestatus"],
        left_cols=["l_returnflag", "l_linestatus", "l_orderkey",
                   "l_linenumber"],
        right_cols=["group_n", "group_cents"], mode="broadcast")


def _q_orders_by_region(sf_dir: str):
    """Multi-hop dimension enrichment: orders -> customer -> nation ->
    region via CHAINED broadcast hash joins (each dimension ray.put
    once), then a small groupby — the star-schema pattern where no
    fact-table shuffle ever happens."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: pa.table({
            "custkey": b.column("o_custkey"),
            "price_cents": pa.array(np.round(
                b.column("o_totalprice").to_numpy() * 100).astype(np.int64)),
        }),
        batch_format="pyarrow",
    )
    customer = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b: pa.table({"custkey": b.column("c_custkey"),
                            "nationkey": b.column("c_nationkey")}),
        batch_format="pyarrow",
    )
    nation = read_parquet_sized(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).map_batches(
        lambda b: pa.table({"nationkey": b.column("n_nationkey"),
                            "regionkey": b.column("n_regionkey")}),
        batch_format="pyarrow",
    )
    region = read_parquet_sized(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).map_batches(
        lambda b: pa.table({"regionkey": b.column("r_regionkey"),
                            "r_name": b.column("r_name")}),
        batch_format="pyarrow",
    )
    j1 = hash_join(orders, customer, on="custkey",
                   left_cols=["custkey", "price_cents"],
                   right_cols=["nationkey"], mode="broadcast")
    j2 = hash_join(j1, nation, on="nationkey",
                   left_cols=["nationkey", "price_cents"],
                   right_cols=["regionkey"], mode="broadcast")
    j3 = hash_join(j2, region, on="regionkey",
                   left_cols=["regionkey", "price_cents"],
                   right_cols=["r_name"], mode="broadcast")

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("r_name", sort=False)["price_cents"].agg(
            [("n_orders", "size"), ("sum_price_cents", "sum")]
        ).reset_index()
        out["n_orders"] = out["n_orders"].astype(np.int64)
        return out

    return hash_partitioned_agg(
        j3.map_batches(
            lambda b: b.select(["r_name", "price_cents"]),
            batch_format="pyarrow"),
        ["r_name"], agg)


def _q_pmi_collocations(sf_dir: str):
    """Top-25 bigram collocations by PMI (min_count 5): bounded
    partials, exact totals, two attach shuffles, integer micro-nat
    scores."""
    from rayspatial.textops.lm import pmi_collocations

    return pmi_collocations(_docs(sf_dir, rows_per_block=512),
                            k=25, min_count=5)


def _q_emb_pca(sf_dir: str):
    """Distributed PCA: integer-exact moment sums (order-independent),
    driver eigen on the (d, d) covariance, broadcast projection to 8
    components in integer 1e-6 units.  Rows-only driver check
    (eigenbasis not SQL-expressible); bit-equality vs a single-process
    reference is asserted in pytest."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.textops.pca import pca_fit, pca_project

    embs = _embs(sf_dir)
    mean_q, comps, _ = pca_fit(embs, n_components=8)
    proj = pca_project(_embs(sf_dir), mean_q, comps)

    def explode(batch: pa.Table) -> pa.Table:
        # scalar rows (vec_id, component, value_q): driver hashers
        # don't take list columns
        pc = batch.column("pc")
        if isinstance(pc, pa.ChunkedArray):
            pc = pc.combine_chunks()
        flat = pc.flatten().to_numpy(zero_copy_only=False)
        n = len(batch)
        q = len(flat) // max(n, 1) if n else 0
        return pa.table({
            "vec_id": pa.array(np.repeat(
                batch.column("vec_id").to_numpy(), q)),
            "component": pa.array(np.tile(
                np.arange(q, dtype=np.int64), n)),
            "value_q": pa.array(flat),
        })

    return proj.map_batches(explode, batch_format="pyarrow")


def _q_heavy_hitters(sf_dir: str):
    """EXACT top-25 terms via Misra-Gries sketch-then-verify: <= m
    summary rows leave each block (vs every distinct term in
    top_terms), then one exact re-count restricted to the provably
    sufficient candidate set.  Shares the top_terms oracle."""
    from rayspatial.textops.analysis import heavy_hitters_topk

    return heavy_hitters_topk(
        _docs(sf_dir, rows_per_block=512), k=25, m=512)


def _q_incremental_dedup(sf_dir: str):
    """Incremental curation: the 'old corpus' (doc_id % 3 != 0) is
    materialized ONCE as a bucket-partitioned content-hash index under
    /tmp; the 'new shard' (doc_id % 3 == 0) dedups against it reading
    only its buckets — no old-corpus re-scan."""
    import hashlib
    import os

    import numpy as np
    import pyarrow as pa

    from rayspatial.textops.dedup import build_hash_index, dedup_against_index

    def split(rem_keep: bool):
        def f(batch: pa.Table) -> pa.Table:
            old = batch.column("doc_id").to_numpy() % 3 != 0
            return batch.filter(pa.array(old if rem_keep else ~old))

        return f

    docs = _docs(sf_dir, rows_per_block=512)
    st = os.stat(f"{sf_dir}/documents.parquet")
    idx = "/tmp/rayspatial_hidx_" + hashlib.md5(
        f"{sf_dir}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]
    if not os.path.isdir(idx):
        build_hash_index(
            docs.map_batches(split(True), batch_format="pyarrow"), idx)
    shard = docs.map_batches(split(False), batch_format="pyarrow")
    return dedup_against_index(shard, idx)


def _q_global_rank(sf_dir: str):
    """Distributed global rank (TeraSort shape): exact-quantile range
    splits -> range shuffle -> per-part sort + offset arange.  No
    global sort, no driver gather beyond one int per part."""
    from rayspatial.ops.quantile import range_partitioned_rank
    from rayspatial.util import read_parquet_sized

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    )
    return range_partitioned_rank(docs, "n_chars", "doc_id", num_parts=16)


def _q_emb_int8(sf_dir: str):
    """Per-dimension int8 scalar quantization of the embedding table —
    all-integer math (1e-6 lattice, integer min/max, floor division)
    so the SQL oracle reproduces every byte."""
    from rayspatial.textops.pca import quantize_int8

    return quantize_int8(_embs(sf_dir))


def _q_funnel(sf_dir: str):
    """Conversion funnel signup -> click -> purchase: per user the
    earliest strictly ordered chain (one hash shuffle, per-step masked
    vectorized groupby-min)."""
    from rayspatial.ops.analytic import funnel
    from rayspatial.util import read_parquet_sized

    events = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"],
    )
    return funnel(events, ["signup", "click", "purchase"])


def _q_zonal_majority(sf_dir: str):
    """Zonal majority: dominant page language per polygon — PIP join
    pairs + broadcast lang attach + one bounded (poly, lang) count
    shuffle + per-poly argmax (count desc, lang asc)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.ops.join import join_points_polygons
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms
    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    pairs = join_points_polygons(
        points_dataset(sf_dir), polygon_geoms(), predicate="covers"
    ).map_batches(
        lambda b: b.select(["doc_id", "poly_id"]), batch_format="pyarrow")
    langs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    withlang = hash_join(pairs, langs, on="doc_id",
                         left_cols=["doc_id", "poly_id"],
                         right_cols=["lang"], mode="broadcast")

    def majority(df: pd.DataFrame) -> pd.DataFrame:
        cnt = (df.groupby(["poly_id", "lang"], sort=False)
               .size().reset_index(name="n"))
        cnt["n"] = cnt["n"].astype(np.int64)
        cnt = cnt.sort_values(["poly_id", "n", "lang"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return cnt.groupby("poly_id", sort=False).head(1)

    return hash_partitioned_agg(
        withlang.map_batches(
            lambda b: b.select(["poly_id", "lang"]),
            batch_format="pyarrow"),
        ["poly_id"], majority)


def _q_exact_dedup_normalized(sf_dir: str):
    """Exact dedup over NORMALIZED text (Unicode lowercase + collapsed
    whitespace, one Arrow kernel chain): catches case/spacing variants
    plain hashing misses; same 24-byte shuffle rows."""
    from rayspatial.textops.dedup import exact_dedup_groups_normalized

    return exact_dedup_groups_normalized(_docs(sf_dir, rows_per_block=512))


def _q_snapshot_diff(sf_dir: str):
    """Corpus-snapshot diff: old = docs with doc_id % 5 != 0 (as-is);
    new = docs with doc_id % 7 != 0, content suffixed ' v2' where
    doc_id % 11 == 0.  One 24-byte-row hash exchange classifies
    added/removed/changed/same."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.textops.dedup import snapshot_diff

    docs = _docs(sf_dir, rows_per_block=512)

    def old_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return batch.select(["doc_id", "text"]).filter(pa.array(ids % 5 != 0))

    def new_side(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        sub = batch.select(["doc_id", "text"]).filter(pa.array(ids % 7 != 0))
        sid = sub.column("doc_id").to_numpy()
        changed = pa.array(sid % 11 == 0)
        text = pc.if_else(
            changed,
            pc.binary_join_element_wise(
                sub.column("text"), pa.scalar("v2"), " "),
            sub.column("text"))
        return pa.table({"doc_id": sub.column("doc_id"), "text": text})

    return snapshot_diff(
        docs.map_batches(old_side, batch_format="pyarrow"),
        docs.map_batches(new_side, batch_format="pyarrow"))


def _q_doc_chunks(sf_dir: str):
    """Overlapping token-window chunking (window 64, stride 48): the
    RAG/shard splitter, pure streaming map_batches with Arrow-list
    chunk reassembly (no per-chunk Python)."""
    from rayspatial.textops.chunking import chunk_documents

    return chunk_documents(_docs(sf_dir, rows_per_block=512),
                           window=64, stride=48)


def _q_dataset_split(sf_dir: str):
    """Deterministic hash-based train/val/test split (5%/5%): fixed by
    doc_id, disjoint, stable under repartition/append; no shuffle."""
    import pyarrow as pa

    from rayspatial.textops.sampling import train_val_test_split

    docs = _docs(sf_dir, rows_per_block=512).map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow")
    return train_val_test_split(docs)


def _q_curation_pipeline(sf_dir: str):
    """The full modern curation chain in ONE streaming composition:
    benchmark decontamination (broadcast eval n-grams) -> quality
    filter + exact dedup (one pass + one hash shuffle) -> per-host
    contribution cap (one hash shuffle).  Three operators, two
    exchanges, content never shuffles."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rayspatial.textops.curation import curate
    from rayspatial.textops.decontam import decontaminate
    from rayspatial.textops.sampling import cap_per_group

    def split(want_bench: bool):
        def f(batch: pa.Table) -> pa.Table:
            is_bench = batch.column("doc_id").to_numpy() % 23 == 0
            return batch.filter(pa.array(is_bench if want_bench else ~is_bench))

        return f

    docs = _docs(sf_dir, rows_per_block=512)
    bench = docs.map_batches(split(True), batch_format="pyarrow")
    train = docs.map_batches(split(False), batch_format="pyarrow")
    clean = decontaminate(train, bench, k=4, keep_cols=("text",))
    kept = curate(clean, min_tokens=20, max_tokens=400, min_uniq_tokens=10)

    def add_host(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        return batch.append_column("host", pa.array(ids % 97))

    return cap_per_group(
        kept.map_batches(add_host, batch_format="pyarrow"),
        "host", 4, order_col="doc_id",
    ).map_batches(lambda b: b.select(["doc_id"]), batch_format="pyarrow")


def _q_url_dedup(sf_dir: str):
    """Crawl-frontier URL dedup: canonicalize (strip query/fragment/
    default port/trailing slash, lowercase scheme+host) and keep the
    min-id page per canonical URL.  Pages get deterministic messy
    variants (case, :443, ?utm, trailing /) so the canonicalizer has
    real work; both sides derive the same variants."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.textops.curation import canonical_urls

    pts = points_dataset(sf_dir)

    def messy(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        base_id = ids // 2  # adjacent ids share a base page -> real dups
        u = pc.binary_join_element_wise(
            pa.scalar("https://site-"),
            pc.cast(pa.array(base_id % 97), pa.string()),
            pa.scalar(".example.com/page/"),
            pc.cast(pa.array(base_id), pa.string()),
            "")
        m0 = pc.replace_substring_regex(u, r"^https", "HTTPS")
        m1 = pc.replace_substring_regex(
            u, r"^(https://[^/]*)/", r"\1:443/")
        m2 = pc.binary_join_element_wise(u, pa.scalar("?utm_source=x"), "")
        m3 = pc.binary_join_element_wise(u, pa.scalar("/"), "")
        variant = np.mod(ids, 4)
        out = pc.case_when(
            pc.make_struct(
                pa.array(variant == 0), pa.array(variant == 1),
                pa.array(variant == 2)),
            m0, m1, m2)
        out = pc.if_else(pa.array(variant == 3), m3, out)
        return pa.table({"doc_id": batch.column("doc_id"), "url": out})

    return canonical_urls(pts.map_batches(messy, batch_format="pyarrow"))


def _q_points_uncovered(sf_dir: str):
    """Spatial anti-join: points covered by NO polygon (broadcast PIP
    join pairs -> hash anti-join on doc_id)."""
    import pyarrow as pa

    from rayspatial.ops.join import join_points_polygons
    from rayspatial.ops.relational import anti_join
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.polygons import polygon_geoms

    pts = points_dataset(sf_dir).map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow")
    pairs = join_points_polygons(
        points_dataset(sf_dir), polygon_geoms(), predicate="covers"
    ).map_batches(lambda b: b.select(["doc_id"]), batch_format="pyarrow")
    return anti_join(pts, pairs, "doc_id", ["doc_id"])


def _q_retention(sf_dir: str):
    """Weekly retention cohorts over events: first-seen week x week
    offset -> active-user counts (one user-keyed shuffle computing
    cohort + activity together, result-bounded combine)."""
    from rayspatial.ops.analytic import retention_cohorts
    from rayspatial.util import read_parquet_sized

    events = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return retention_cohorts(events)


def _q_orders_rollup(sf_dir: str):
    """ROLLUP(l_returnflag, l_linestatus) revenue totals: every prefix
    level + grand total in one pass, cents-exact."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.mapops import rollup_agg
    from rayspatial.util import read_parquet_sized

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_extendedprice"],
    ).map_batches(
        lambda b: pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "l_linestatus": b.column("l_linestatus"),
            "cents": pa.array(np.round(
                b.column("l_extendedprice").to_numpy() * 100
            ).astype(np.int64)),
        }),
        batch_format="pyarrow",
    )
    return rollup_agg(li, ["l_returnflag", "l_linestatus"], "cents")


def _q_top_unshipped_orders(sf_dir: str):
    """TPC-H Q3 shape: segment-filtered customers -> date-filtered
    orders (broadcast semi-join; the dimension is ray.put once) ->
    LARGE x LARGE shuffle equi-join with lineitem on orderkey, with a
    Bloom prefilter of the orders keys so the all-to-all only moves
    lineitem rows that can join -> per-order revenue combine -> global
    top-10 with bounded per-partition heads.  Revenue in exact 1e-4
    cents units (price_cents * (100 - disc_pct))."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.ops.window import top_k_by_group
    from rayspatial.util import read_parquet_sized

    cutoff = np.datetime64("1998-06-01")
    customer = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: pa.table({"custkey": b.column("c_custkey").filter(
            pc.equal(b.column("c_mktsegment"), "BUILDING"))}),
        batch_format="pyarrow",
    )
    def o_prep(b: pa.Table) -> pa.Table:
        b = b.filter(pa.array(b.column("o_orderdate").to_numpy() < cutoff))
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "custkey": b.column("o_custkey"),
            "o_orderdate": pc.strftime(b.column("o_orderdate"), "%Y-%m-%d"),
            "o_orderpriority": b.column("o_orderpriority"),
        })

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(o_prep, batch_format="pyarrow")
    # materialize the filtered+joined orders side ONCE: it is consumed
    # twice downstream (Bloom-filter build pass + the shuffle join
    # union) and a lazy plan would re-run the scan + broadcast probe
    # per consumer.  Post-filter it is the small side (spillable).
    orders = hash_join(
        orders, customer, on="custkey",
        left_cols=["o_orderkey", "o_orderdate", "o_orderpriority"],
        right_cols=[], mode="broadcast").materialize()

    def li_prep(b: pa.Table) -> pa.Table:
        keep = b.column("l_shipdate").to_numpy() > cutoff
        price_c = np.round(
            b.column("l_extendedprice").to_numpy()[keep] * 100
        ).astype(np.int64)
        disc_pct = np.round(
            b.column("l_discount").to_numpy()[keep] * 100).astype(np.int64)
        return pa.table({
            "o_orderkey": b.column("l_orderkey").filter(pa.array(keep)),
            "rev_e4": pa.array(price_c * (100 - disc_pct)),
        })

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_prep, batch_format="pyarrow")
    joined = hash_join(
        li, orders, on="o_orderkey",
        left_cols=["o_orderkey", "rev_e4"],
        right_cols=["o_orderdate", "o_orderpriority"],
        mode="shuffle", bloom_bits=1 << 22)
    out = top_k_by_group(
        joined, ["o_orderdate", "o_orderkey", "o_orderpriority"],
        "rev_e4", k=10, agg="sum")
    return out.map_batches(
        lambda b: pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "revenue_e4": b.column("v"),
            "o_orderdate": b.column("o_orderdate"),
            "o_orderpriority": b.column("o_orderpriority"),
        }),
        batch_format="pyarrow",
    )


def _q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: one-year lineitem slice x part on partkey via
    the size-gated BROADCAST equi-join (dimension ray.put once, probed
    streaming — the fact table never shuffles), then a two-integer
    global reduce: promo vs total revenue in exact 1e-4 cent units."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.util import read_parquet_sized

    lo, hi = np.datetime64("1998-01-01"), np.datetime64("1999-01-01")
    part = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda b: pa.table({
            "partkey": b.column("p_partkey"),
            "is_promo": pa.array(
                b.column("p_type").to_pandas().to_numpy() == "PROMO"),
        }),
        batch_format="pyarrow",
    )

    def li_prep(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy()
        keep = (ship >= lo) & (ship < hi)
        price_c = np.round(
            b.column("l_extendedprice").to_numpy()[keep] * 100
        ).astype(np.int64)
        disc_pct = np.round(
            b.column("l_discount").to_numpy()[keep] * 100).astype(np.int64)
        return pa.table({
            "partkey": b.column("l_partkey").filter(pa.array(keep)),
            "rev_e4": pa.array(price_c * (100 - disc_pct)),
        })

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_prep, batch_format="pyarrow")
    joined = hash_join(li, part, on="partkey",
                       left_cols=["partkey", "rev_e4"],
                       right_cols=["is_promo"], mode="broadcast")

    def partial(b: pa.Table) -> pa.Table:
        rev = b.column("rev_e4").to_numpy()
        promo = b.column("is_promo").to_numpy(zero_copy_only=False)
        return pa.table({
            "promo_revenue_e4": pa.array([int(rev[promo].sum())], pa.int64()),
            "total_revenue_e4": pa.array([int(rev.sum())], pa.int64()),
        })

    def final(b: pa.Table) -> pa.Table:
        return pa.table({
            "promo_revenue_e4": pa.array(
                [int(b.column("promo_revenue_e4").to_numpy().sum())]),
            "total_revenue_e4": pa.array(
                [int(b.column("total_revenue_e4").to_numpy().sum())]),
        })

    return (joined.map_batches(partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(final, batch_size=None, batch_format="pyarrow"))


_GRID_START_US = 1_704_067_200_000_000   # 2024-01-01T00:00:00Z
_GRID_END_US = 1_706_659_200_000_000     # 2024-01-31T00:00:00Z
_GRID_STEP_US = 21_600_000_000           # 6 h


def _q_user_value_resampled(sf_dir: str):
    """Gap-fill resample (ops/resample.py): every user's latest event
    (id + cents value) forward-filled onto a fixed 6-hour tick grid —
    one key exchange, grid synthesized inside partitions, int64-exact
    sentinel rows for ticks before a user's first event."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.resample import resample_ffill
    from rayspatial.util import read_parquet_sized

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    ).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "ts": b.column("ts"),
            "event_id": b.column("event_id"),
            "value_cents": pc.cast(pc.round(
                pc.multiply(b.column("value"), 100.0),
                round_mode="half_towards_infinity"), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    return resample_ffill(
        ev, by="user_id", ts_col="ts", id_col="event_id",
        value_col="value_cents", start_us=_GRID_START_US,
        end_us=_GRID_END_US, step_us=_GRID_STEP_US)


def _q_streaming_dedup(sf_dir: str):
    """Streaming TTL dedup / throttle (ops/streaming.StreamingDeduper):
    first (user, event_type) event per trailing 1-day event-time
    horizon survives; watermark-late arrivals drop; state bounded by
    watermark eviction.  Partition = user_id % 8, arrival = event_id —
    the SQL-reproducible scope used by all streaming oracles here."""
    from rayspatial.ops.streaming import streaming_dedup
    from rayspatial.util import read_parquet_sized

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "event_id", "ts"])
    return streaming_dedup(
        ev, ttl_s=86_400, lateness_s=3_600, num_partitions=8,
        part_col="user_id", key_cols=["user_id", "event_type"])


def _q_stream_knn_join(sf_dir: str):
    """Distributed STREAM kNN join (the Stream-KNN-Join shape, PAPERS
    SIGMOD'21): for every surviving purchase, the k=3 clicks of the
    same user inside [-30 min, +30 min] whose cents value is nearest —
    composition of the watermarked interval join (candidate pairs),
    size-gated broadcast value attach, and a per-left bounded top-k
    (head(k) per group, one exchange).  No stage ever ranks more than
    one window's candidates."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.ops.streaming import streaming_interval_join
    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def only(kind):
        def fn(batch):
            return batch.filter(pc.equal(batch.column("event_type"), kind))
        return fn

    pur = ds.map_batches(only("purchase"), batch_format="pyarrow")
    clk = ds.map_batches(only("click"), batch_format="pyarrow")
    pairs = streaming_interval_join(
        pur, clk, before_s=1800, after_s=1800, lateness_s=600,
        num_partitions=8)
    cents = ds.map_batches(
        lambda b: pa.table({
            "eid": b.column("event_id"),
            "cents": pc.cast(pc.round(
                pc.multiply(b.column("value"), 100.0),
                round_mode="half_towards_infinity"), pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()  # consumed twice (left + right attach)
    pairs = pairs.map_batches(
        lambda b: pa.table({"l_id": b.column("l_id"),
                            "r_id": b.column("r_id")}),
        batch_format="pyarrow")
    withr = hash_join(
        pairs, cents.map_batches(
            lambda b: b.rename_columns(["r_id", "r_cents"]),
            batch_format="pyarrow"),
        on="r_id", left_cols=["l_id", "r_id"], right_cols=["r_cents"],
        mode="broadcast")
    both = hash_join(
        withr, cents.map_batches(
            lambda b: b.rename_columns(["l_id", "l_cents"]),
            batch_format="pyarrow"),
        on="l_id", left_cols=["l_id", "r_id", "r_cents"],
        right_cols=["l_cents"], mode="broadcast")

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["dist"] = np.abs(df["l_cents"].to_numpy()
                            - df["r_cents"].to_numpy()).astype(np.int64)
        df = df.sort_values(["l_id", "dist", "r_id"], kind="stable")
        out = df.groupby("l_id", sort=False).head(3)
        return out[["l_id", "r_id", "dist"]]

    return hash_partitioned_agg(both, ["l_id"], topk)


def _q_user_twap(sf_dir: str):
    """Time-weighted average (TWAP) per user, integer-exact: each
    event's cents value weighted by its holding interval (next event's
    ts minus its own); emits the (numerator, denominator) pair so no
    float division exists anywhere.  ONE hash exchange; lead/diff and
    the group sums happen together in the co-located pass."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "value"],
    ).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "us": b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()),
            "cents": pc.cast(pc.round(
                pc.multiply(b.column("value"), 100.0),
                round_mode="half_towards_infinity"), pa.int64()),
        }),
        batch_format="pyarrow",
    )

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "us", "event_id"], kind="stable")
        u = df["user_id"].to_numpy()
        t = df["us"].to_numpy()
        v = df["cents"].to_numpy()
        same = np.zeros(len(df), dtype=bool)
        if len(df) > 1:
            same[:-1] = u[:-1] == u[1:]
        dt = np.zeros(len(df), dtype=np.int64)
        dt[:-1] = t[1:] - t[:-1]
        contrib = np.where(same, v * dt, 0)
        out = (pd.DataFrame({"user_id": u, "num": contrib, "t": t})
               .groupby("user_id", sort=True)
               .agg(twap_num_e6=("num", "sum"), tmin=("t", "min"),
                    tmax=("t", "max")).reset_index())
        out["twap_num_e6"] = out["twap_num_e6"].astype(np.int64)
        out["twap_den_us"] = (out["tmax"] - out["tmin"]).astype(np.int64)
        return out[["user_id", "twap_num_e6", "twap_den_us"]]

    return hash_partitioned_agg(ev, ["user_id"], per_partition)


def _q_cm_term_counts(sf_dir: str):
    """Count-Min sketch term-frequency estimates (ops/cmsketch.py):
    one streaming pass over tokenized docs emits fixed dense grids per
    block (keys never shuffle); estimates for a fixed probe-term list.
    Rows-only check (the estimate depends on the sketch's hash layout,
    not SQL-expressible); the one-sided >= contract is pytest."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.cmsketch import cm_sketch
    from rayspatial.textops.hashing import hash_strings, split_words

    def terms(batch: pa.Table) -> pa.Table:
        words, _ = split_words(batch.column("text"))
        return pa.table({"term": words})

    ds = _docs(sf_dir, rows_per_block=512).map_batches(
        terms, batch_format="pyarrow")
    sk = cm_sketch(ds, "term", width=4096, depth=5)
    probes = ["join", "hash", "merge", "sort", "window",
              "scan", "filter", "nosuchterm"]
    est = sk.estimate(hash_strings(pa.array(probes)))
    return pa.table({"term": pa.array(probes),
                     "est_count": pa.array(est.astype(np.int64))})


def _q_streaming_sessions(sf_dir: str):
    """Streaming SESSION windows (ops/streaming.StreamingSessionizer):
    gap-closed sessions emitted when the watermark passes end + gap;
    out-of-order events may extend or MERGE open sessions (interval
    single-linkage, insertion-order independent), so the closed set
    equals batch sessionization of the non-late events — which is the
    DuckDB oracle.  Partition = user_id % 8, arrival = event_id."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.streaming import streaming_sessions
    from rayspatial.util import read_parquet_sized

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "value"],
    ).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "ts": b.column("ts"),
            "value_cents": pc.cast(pc.round(
                pc.multiply(b.column("value"), 100.0),
                round_mode="half_towards_infinity"), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    return streaming_sessions(ev, gap_s=3600, lateness_s=1800,
                              num_partitions=8)


def _q_value_outliers(sf_dir: str):
    """Robust per-user anomaly detection (ops/quantile.mad_outliers):
    events whose cents value deviates from the user's exact median by
    more than 3x the user's MAD — one exchange, stats + filter in a
    single co-located pass."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.quantile import mad_outliers
    from rayspatial.util import read_parquet_sized

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "value"],
    ).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "event_id": b.column("event_id"),
            "cents": pc.cast(pc.round(
                pc.multiply(b.column("value"), 100.0),
                round_mode="half_towards_infinity"), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    return mad_outliers(ev, "user_id", "event_id", "cents", k_mad=3)


def _q_png_features(sf_dir: str):
    """COMPRESSED-format multimodal decode end-to-end: a 12x10 RGB PNG
    is synthesized per document (pixel j = (doc_id*17 + j) % 256 —
    closed form for the SQL oracle), zlib-deflated into a real PNG
    payload, shipped through the actor-pool feature stage, and decoded
    back with the stdlib-zlib + numpy-unfilter parser
    (textops/multimodal.decode_png)."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.textops.multimodal import (FEATURE_DIM, binary_features,
                                               encode_png)
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"], rows_per_block=2048)
    H, W = 12, 10
    NB = H * W * 3

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        vals = ((ids[:, None] * 17 + np.arange(NB)[None, :]) % 256
                ).astype(np.uint8).reshape(-1, H, W, 3)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "img": pa.array([encode_png(v) for v in vals],
                            type=pa.binary()),
        })

    feats = binary_features(ds.map_batches(synth, batch_format="pyarrow"),
                            binary_col="img", id_col="doc_id",
                            decoder="png", batch_size=512,
                            concurrency=(1, 4))

    def unpack(batch: pa.Table) -> pa.Table:
        f = (batch.column("features").combine_chunks().flatten()
             .to_numpy().reshape(-1, FEATURE_DIM))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "width": pa.array(f[:, 0]), "height": pa.array(f[:, 1]),
            "channels": pa.array(f[:, 2]), "sum_c0": pa.array(f[:, 3]),
            "sum_all": pa.array(f[:, 4]), "min_v": pa.array(f[:, 5]),
            "max_v": pa.array(f[:, 6]), "n_pixels": pa.array(f[:, 7]),
        })

    return feats.map_batches(unpack, batch_format="pyarrow")


def _q_jpeg_features(sf_dir: str):
    """ENTROPY-CODED multimodal decode end-to-end: a 16x16
    constant-color JPEG (quality 90, 4:4:4) is synthesized per document
    — color (r,g,b) = (doc_id*13 % 256, (doc_id*29+7) % 256,
    (doc_id*53+3) % 256) — shipped through the actor-pool feature stage
    and decoded back with the pure-numpy baseline codec
    (textops/multimodal.decode_jpeg: huffman + dequant + IDCT + YCbCr).
    JPEG is lossy, but for a constant block the whole chain collapses
    to closed-form arithmetic (DC-only path), so the oracle reproduces
    the DECODED pixels exactly while the payload still exercises the
    full entropy-coded format."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.textops.multimodal import (FEATURE_DIM,
                                               binary_features,
                                               encode_jpeg)
    from rayspatial.util import read_parquet_sized

    # ~1.2ms of codec work per row: small blocks so the synth+decode
    # chain fans out across the pool (2048-row blocks made sf0.1 run
    # ~3-wide: 5.25s -> small blocks ~1s)
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"], rows_per_block=256)

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        payloads = []
        for i in ids:
            rgb = np.array([(i * 13) % 256, (i * 29 + 7) % 256,
                            (i * 53 + 3) % 256], dtype=np.uint8)
            img = np.broadcast_to(rgb, (16, 16, 3))
            payloads.append(encode_jpeg(img, quality=90))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "img": pa.array(payloads, type=pa.binary()),
        })

    feats = binary_features(ds.map_batches(synth, batch_format="pyarrow"),
                            binary_col="img", id_col="doc_id",
                            decoder="jpeg", batch_size=64,
                            concurrency=(1, 16))

    def unpack(batch: pa.Table) -> pa.Table:
        f = (batch.column("features").combine_chunks().flatten()
             .to_numpy().reshape(-1, FEATURE_DIM))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "width": pa.array(f[:, 0]), "height": pa.array(f[:, 1]),
            "channels": pa.array(f[:, 2]), "sum_c0": pa.array(f[:, 3]),
            "sum_all": pa.array(f[:, 4]), "min_v": pa.array(f[:, 5]),
            "max_v": pa.array(f[:, 6]), "n_pixels": pa.array(f[:, 7]),
        })

    return feats.map_batches(unpack, batch_format="pyarrow")


def _jpeg_oracle_sql() -> str:
    """SQL reproduction of the jpeg_features decode chain for
    constant-color blocks: color convert -> DC quantize -> dequantize
    -> IDCT -> inverse color convert, every rounding floor(x + 0.5 +
    1e-9) exactly as textops/multimodal._jround.  Constants are
    e-notation so DuckDB computes in DOUBLE (decimal literals would
    change the rounding); the two DC quantizer steps inline the
    quality-90 Annex-K q[0,0] values."""
    from rayspatial.textops.multimodal import _jpeg_qtables

    qlum, qchr = _jpeg_qtables(90)
    ql, qc = f"{float(qlum[0, 0])!r}e0", f"{float(qchr[0, 0])!r}e0"
    EPS = "5e-1 + 1e-9"

    def rnd(expr: str) -> str:
        return f"greatest(0e0, least(2.55e2, floor({expr} + {EPS})))"

    def chan(v: str, q: str) -> str:
        return rnd(f"floor(8e0*({v}-1.28e2)/{q} + {EPS})*{q}/8e0 + 1.28e2")

    return (
        "WITH cc AS (SELECT doc_id, "
        "CAST((doc_id*13)%256 AS DOUBLE) AS r, "
        "CAST((doc_id*29+7)%256 AS DOUBLE) AS g, "
        "CAST((doc_id*53+3)%256 AS DOUBLE) AS b FROM documents), "
        "ycc AS (SELECT doc_id, "
        f"{rnd('2.99e-1*r + 5.87e-1*g + 1.14e-1*b')} AS y, "
        f"{rnd('-1.68736e-1*r - 3.31264e-1*g + 5e-1*b + 1.28e2')} AS cb, "
        f"{rnd('5e-1*r - 4.18688e-1*g - 8.1312e-2*b + 1.28e2')} AS cr "
        "FROM cc), rec AS (SELECT doc_id, "
        f"{chan('y', ql)} AS y2, {chan('cb', qc)} AS cb2, "
        f"{chan('cr', qc)} AS cr2 FROM ycc), "
        "rgb2 AS (SELECT doc_id, "
        f"{rnd('y2 + 1.402e0*(cr2-1.28e2)')} AS r2, "
        f"{rnd('y2 - 3.44136e-1*(cb2-1.28e2) - 7.14136e-1*(cr2-1.28e2)')}"
        " AS g2, "
        f"{rnd('y2 + 1.772e0*(cb2-1.28e2)')} AS b2 FROM rec) "
        "SELECT doc_id, CAST(16 AS BIGINT) AS width, "
        "CAST(16 AS BIGINT) AS height, CAST(3 AS BIGINT) AS channels, "
        "CAST(256*r2 AS BIGINT) AS sum_c0, "
        "CAST(256*(r2+g2+b2) AS BIGINT) AS sum_all, "
        "CAST(least(r2, g2, b2) AS BIGINT) AS min_v, "
        "CAST(greatest(r2, g2, b2) AS BIGINT) AS max_v, "
        "CAST(256 AS BIGINT) AS n_pixels FROM rgb2"
    )


def _q_triangle_count(sf_dir: str):
    """Exact distributed triangle count (ops/graph.py) over the
    deterministic ring-lattice + chord graph i -> (i+1, i+2, 7i+3)
    mod N (every consecutive triple {i, i+1, i+2} closes, chords add
    irregular ones): canonical dedup -> min-endpoint wedge generation
    -> packed-key semi-join closure, all hash exchanges, no broadcast
    of the edge set."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayspatial.ops.graph import triangle_count
    from rayspatial.util import read_parquet_sized

    docs = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
        rows_per_block=512)
    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def links(batch: pa.Table) -> pa.Table:
        i = batch.column("doc_id").to_numpy().astype(np.int64)
        return pa.table({
            "src": pa.array(np.tile(i, 3)),
            "dst": pa.array(np.concatenate([
                (i + 1) % n, (i + 2) % n, (i * 7 + 3) % n,
            ])),
        })

    return triangle_count(docs.map_batches(links, batch_format="pyarrow"))


def _q_redacted_docs(sf_dir: str):
    """PII-style regex scrub (textops/curation.redact_pattern): every
    whole-word 'hash' replaced by '[T]'; emits per-doc redaction count
    + post-scrub byte length (Arrow regex, no per-row Python)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.textops.curation import redact_pattern

    out = redact_pattern(_docs(sf_dir, rows_per_block=512),
                         r"\bhash\b", "[T]")
    return out.map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "n_redacted": b.column("n_redacted"),
            "new_len": pc.cast(pc.utf8_length(b.column("text")),
                               pa.int64()),
        }),
        batch_format="pyarrow",
    )


def _q_phrase_docs(sf_dir: str):
    """Corpus grep (textops/curation.phrase_docs): ids of documents
    containing the literal phrase 'hash join' — streaming
    match_substring filter, no shuffle."""
    from rayspatial.textops.curation import phrase_docs

    return phrase_docs(_docs(sf_dir, rows_per_block=512), "hash join")


def _q_customers_above_nation_avg(sf_dir: str):
    """Correlated-subquery shape, integer-exact: customers whose
    account balance exceeds their nation's average — per-nation
    (sum_cents, n) partials combine to a TINY broadcast table, then
    one streaming filter compares bal_cents * n > sum_cents (cross-
    multiplied so no float average ever exists).  The fact stream
    never shuffles."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from rayspatial.util import read_parquet_sized

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "nation": b.column("c_nationkey"),
            "bal_cents": pc.cast(pc.round(
                pc.multiply(b.column("c_acctbal"), 100.0),
                round_mode="half_towards_infinity"), pa.int64()),
        })

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(prep, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"nation": b.column("nation").to_numpy(),
                           "s": b.column("bal_cents").to_numpy(),
                           "n": np.ones(len(b), np.int64)})
        out = df.groupby("nation", sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    stats = (cust.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby("nation").sum().reset_index())
    ref = ray.put({int(r.nation): (int(r.s), int(r.n))
                   for r in stats.itertuples()})

    def flt(b: pa.Table) -> pa.Table:
        m = ray.get(ref)
        # dense int-keyed lookup (nation ids are small): one fancy-index
        # gather per batch, no per-row Python
        hi = max(m) + 1
        arr_s = np.zeros(hi, dtype=np.int64)
        arr_n = np.ones(hi, dtype=np.int64)
        for k, (s, n) in m.items():
            arr_s[k], arr_n[k] = s, n
        nat = b.column("nation").to_numpy()
        bal = b.column("bal_cents").to_numpy()
        keep = bal * arr_n[nat] > arr_s[nat]
        return b.filter(pa.array(keep)).select(["c_custkey", "bal_cents"])

    return cust.map_batches(flt, batch_format="pyarrow")


def _q_props_k_stats(sf_dir: str):
    """Flat-JSON field extraction (textops/jsonops.extract_json_int,
    Arrow regex — no per-row parser) -> per-event-type stats of the
    props.k integer: partial aggregates per batch, tiny key combine."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rayspatial.textops.jsonops import extract_json_int
    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"])

    HI, LO = np.int64(2 ** 62), np.int64(-(2 ** 62))

    def partial(b: pa.Table) -> pa.Table:
        ks = extract_json_int(b.column("props"), "k").to_pandas()
        pres = ~pd.isna(ks)
        df = pd.DataFrame({
            "event_type": b.column("event_type").to_pandas(),
            # sentinels keep absent-field rows out of min/max/sum while
            # staying int64 (resolved to 0 after the final combine)
            "k": ks.fillna(0).astype(np.int64),
            "kmin": ks.fillna(HI).astype(np.int64),
            "kmax": ks.fillna(LO).astype(np.int64),
            "has_k": pres.astype(np.int64),
        })
        out = df.groupby("event_type", sort=False).agg(
            n=("has_k", "size"), n_k=("has_k", "sum"), sum_k=("k", "sum"),
            min_k=("kmin", "min"), max_k=("kmax", "max")).reset_index()
        for c in ("n", "n_k", "sum_k", "min_k", "max_k"):
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", sort=True).agg(
            n=("n", "sum"), n_k=("n_k", "sum"), sum_k=("sum_k", "sum"),
            min_k=("min_k", "min"), max_k=("max_k", "max")).reset_index()
        none = out["n_k"] == 0
        out.loc[none, ["min_k", "max_k"]] = 0
        return out

    return hash_partitioned_agg(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], combine)


def _q_rolling_distinct_users(sf_dir: str):
    """Exact 7-day sliding distinct users per observed day
    (ops/analytic.rolling_distinct): linear interval-union plan — no
    per-window re-count, no per-window user sets; one user-keyed
    exchange of per-block-deduped (user, day) rows."""
    from rayspatial.ops.analytic import rolling_distinct
    from rayspatial.util import read_parquet_sized

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return rolling_distinct(ev, "user_id", "ts", window=7)


def _q_latest_order_per_customer(sf_dir: str):
    """Greatest-row-per-group (ops/window.extreme_row_by_group): each
    customer's most recent order ROW (date desc, orderkey desc total
    order) — per-batch head(1) partials, one hash exchange of
    one-row-per-(group, block) survivors."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.window import extreme_row_by_group
    from rayspatial.util import read_parquet_sized

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
    ).map_batches(
        lambda b: pa.table({
            "o_custkey": b.column("o_custkey"),
            "o_orderkey": b.column("o_orderkey"),
            "o_orderdate": pc.strftime(b.column("o_orderdate"), "%Y-%m-%d"),
            "total_cents": pc.cast(pc.round(
                pc.multiply(b.column("o_totalprice"), 100.0),
                round_mode="half_towards_infinity"), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    return extreme_row_by_group(
        orders, group_cols=["o_custkey"],
        order_cols=["o_orderdate", "o_orderkey"],
        ascending=[False, False])


def _q_events_pivot_daily(sf_dir: str):
    """Categorical pivot (ops/window.pivot_counts): per-day wide
    event-type counts over a fixed domain — per-batch crosstab
    partials, one exchange of wide rows, column-sum combine."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.window import pivot_counts
    from rayspatial.util import read_parquet_sized

    ev = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).map_batches(
        lambda b: pa.table({
            "day": pc.strftime(b.column("ts"), "%Y-%m-%d"),
            "event_type": b.column("event_type"),
        }),
        batch_format="pyarrow",
    )
    return pivot_counts(
        ev, row_cols=["day"], col_col="event_type",
        domain=["click", "error", "purchase", "signup", "view"])


def _q_bm25_topk(sf_dir: str):
    """BM25 ranked retrieval (textops/bm25.py): top-20 documents for a
    fixed query-term set, integer-exact Okapi scoring (rationalized
    saturation + micro-nat idf), one tokenize pass, bounded gathers."""
    from rayspatial.textops.bm25 import bm25_topk

    return bm25_topk(
        _docs(sf_dir, rows_per_block=512),
        ["join", "hash", "merge", "sort", "window"], k=20)


def _events_us(sf_dir: str, extra: list[str] | None = None):
    """events with ts as epoch-us int64 + exact cent-quantized value —
    the shared prep for the round-4 analytic queries."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.util import read_parquet_sized

    cols = ["event_id", "ts", "user_id", "event_type", "value"]

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": b.column("event_id"),
            "user_id": b.column("user_id"),
            "event_type": b.column("event_type"),
            "ts_us": pc.cast(b.column("ts"), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(b.column("value"), 100.0),
                                      round_mode="half_towards_infinity"),
                             pa.int64()),
        })

    return read_parquet_sized(f"{sf_dir}/events.parquet",
                              columns=cols).map_batches(
        prep, batch_format="pyarrow")


def _q_part_skyline(sf_dir: str):
    """Distributed Pareto frontier (ops/advanced.skyline): parts where
    no other part is both cheaper and larger — per-block vectorized
    frontier prune, one tiny final exchange of the survivors."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.advanced import skyline
    from rayspatial.util import read_parquet_sized

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": b.column("p_partkey"),
            "price_cents": pc.cast(
                pc.round(pc.multiply(b.column("p_retailprice"), 100.0),
                         round_mode="half_towards_infinity"), pa.int64()),
            "p_size": pc.cast(b.column("p_size"), pa.int64()),
        })

    ds = read_parquet_sized(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_retailprice", "p_size"],
    ).map_batches(prep, batch_format="pyarrow")
    return skyline(ds, ["price_cents", "p_size"],
                   maximize=[False, True], tie_cols=["p_partkey"])


def _q_peak_concurrency(sf_dir: str):
    """Interval max-concurrency sweep (ops/advanced.max_concurrency):
    each event opens a [ts, ts + (cents % 7200 + 60) s) interval; the
    exact distributed +-1 sweep (range-partitioned on quantile splits,
    bounded one-triple-per-partition gather) reports the peak and the
    first instant it is reached."""
    import pyarrow as pa

    from rayspatial.ops.advanced import max_concurrency

    def iv(b: pa.Table) -> pa.Table:
        s = b.column("ts_us").to_numpy()
        dur = (b.column("cents").to_numpy() % 7200 + 60) * 1_000_000
        return pa.table({"s": pa.array(s), "e": pa.array(s + dur)})

    ds = _events_us(sf_dir).map_batches(iv, batch_format="pyarrow")
    r = max_concurrency(ds, "s", "e")
    return pa.table({
        "max_concurrent": pa.array([r["max_concurrent"]], pa.int64()),
        "at_ts_us": pa.array([r["at_ts"]], pa.int64()),
    })


def _q_user_mode_event(sf_dir: str):
    """Per-user MODE event type (ops/advanced.mode_by_group): map-side
    (user, type) pre-counts shrink the exchange to the key domain, one
    hash shuffle finishes the deterministic argmax (ties -> smallest)."""
    from rayspatial.ops.advanced import mode_by_group

    return mode_by_group(
        _events_us(sf_dir), ["user_id"], "event_type").sort("user_id")


def _q_event_transitions(sf_dir: str):
    """First-order Markov transition counts over each user's ordered
    event stream (ops/advanced.transition_counts): one hash shuffle
    co-locates users, lag + pair-count vectorized per partition, tiny
    (5x5 here) state-pair partials fold in one final task."""
    import pyarrow as pa

    from rayspatial.ops.advanced import transition_counts

    out = transition_counts(_events_us(sf_dir), "user_id",
                            ["ts_us", "event_id"], "event_type")
    return out.map_batches(
        lambda b: b.rename_columns(["prev_type", "next_type", "n"]),
        batch_format="pyarrow")


def _q_orders_cube(sf_dir: str):
    """GROUP BY CUBE(status, priority) over orders in one pass
    (ops/advanced.cube_agg): the map side emits all 2^k subset partials,
    one level-tagged hash shuffle finishes every cube cell together."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.advanced import cube_agg
    from rayspatial.util import read_parquet_sized

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderstatus": b.column("o_orderstatus"),
            "o_orderpriority": b.column("o_orderpriority"),
            "cents": pc.cast(
                pc.round(pc.multiply(b.column("o_totalprice"), 100.0),
                         round_mode="half_towards_infinity"), pa.int64()),
        })

    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    ).map_batches(prep, batch_format="pyarrow")
    out = cube_agg(ds, ["o_orderstatus", "o_orderpriority"], "cents")
    return out.sort(["o_orderstatus", "o_orderpriority"])


def _q_typo_pairs(sf_dir: str):
    """Fuzzy vocabulary join: all term pairs within Levenshtein
    distance 2 via SymSpell deletion-neighborhood blocking
    (textops/fuzzy.edit_distance_pairs) — one corpus-sized shuffle for
    the distinct vocab, then vocab-sized key expansion + candidate
    verification with a pair-vectorized DP kernel."""
    from rayspatial.textops.fuzzy import edit_distance_pairs

    return edit_distance_pairs(_docs(sf_dir, rows_per_block=512),
                               "text", max_dist=2, min_len=3)


def _q_tpch_q13(sf_dir: str):
    """TPC-H Q13 shape: distribution of orders-per-customer INCLUDING
    zero-order customers, without materializing the left join — map-side
    partial counts by custkey, ONE hash shuffle, per-partition
    count-of-counts partials, one tiny final fold; the zero bucket is
    total customers minus distinct custkeys seen with orders (a parquet
    metadata count, no second shuffle)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    def partial(b: pa.Table) -> pa.Table:
        v, c = np.unique(b.column("o_custkey").to_numpy(),
                         return_counts=True)
        return pa.table({"custkey": pa.array(v.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    partials = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
    ).map_batches(partial, batch_format="pyarrow")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby("custkey", sort=False)["n"].sum()
        h = cnt.value_counts()
        return pd.DataFrame({
            "c_count": h.index.to_numpy().astype(np.int64),
            "custdist": h.to_numpy().astype(np.int64)})

    hist = hash_partitioned_agg(partials, ["custkey"], per_part)

    n_customers = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]).count()

    def fold(b: pa.Table) -> pa.Table:
        if not len(b):
            return pa.table({"c_count": pa.array([], pa.int64()),
                             "custdist": pa.array([], pa.int64())})
        df = (b.to_pandas().groupby("c_count", sort=False)["custdist"]
              .sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold_zero(b: pa.Table) -> pa.Table:
        df = fold(b).to_pandas()
        zero = n_customers - int(df["custdist"].sum())
        if zero > 0:
            df = pd.concat([df, pd.DataFrame({"c_count": [0],
                                              "custdist": [zero]})],
                           ignore_index=True)
        df = df.sort_values("c_count", ignore_index=True)
        df["c_count"] = df["c_count"].astype(np.int64)
        df["custdist"] = df["custdist"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (hist.map_batches(fold, batch_format="pyarrow")
            .repartition(1)
            .map_batches(fold_zero, batch_size=None, batch_format="pyarrow"))


def _q_tpch_q18(sf_dir: str):
    """TPC-H Q18 shape (large-volume customers): groupby-HAVING on the
    fact table (map-side quantity partials by orderkey, one hash
    shuffle, filter sum > 150) -> the surviving hot-order set joins
    back to orders via the size-gated hash_join -> customer name via a
    second equi-join -> bounded per-partition top-100 heads, one final
    head.  Quantities exact int64; price in cents."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    THRESH = 150

    def li_partial(b: pa.Table) -> pa.Table:
        ok = b.column("l_orderkey").to_numpy()
        q = np.round(b.column("l_quantity").to_numpy()).astype(np.int64)
        v, inv = np.unique(ok, return_inverse=True)
        s = np.zeros(len(v), np.int64)
        np.add.at(s, inv, q)
        return pa.table({"o_orderkey": pa.array(v.astype(np.int64)),
                         "q": pa.array(s)})

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"],
    ).map_batches(li_partial, batch_format="pyarrow")

    def hot(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("o_orderkey", sort=False)["q"].sum()
        s = s[s > THRESH]
        return pd.DataFrame({"o_orderkey": s.index.to_numpy(),
                             "qty_sum": s.to_numpy().astype(np.int64)})

    hot_orders = hash_partitioned_agg(li, ["o_orderkey"], hot)

    def o_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "c_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
            "o_orderdate": pc.strftime(b.column("o_orderdate"), "%Y-%m-%d"),
            "total_cents": pc.cast(
                pc.round(pc.multiply(b.column("o_totalprice"), 100.0),
                         round_mode="half_towards_infinity"), pa.int64()),
        })

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(o_prep, batch_format="pyarrow")

    j = hash_join(orders, hot_orders, on="o_orderkey",
                  left_cols=["o_orderkey", "c_custkey", "o_orderdate",
                             "total_cents"],
                  right_cols=["qty_sum"])

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"],
    ).map_batches(
        lambda b: pa.table({"c_custkey": pc.cast(b.column("c_custkey"),
                                                 pa.int64()),
                            "c_name": b.column("c_name")}),
        batch_format="pyarrow")

    j = hash_join(j, cust, on="c_custkey",
                  left_cols=["o_orderkey", "c_custkey", "o_orderdate",
                             "total_cents", "qty_sum"],
                  right_cols=["c_name"])

    COLS = ["c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "total_cents", "qty_sum"]

    def head100(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(
            ["total_cents", "o_orderdate", "o_orderkey"],
            ascending=[False, True, True]).head(100)
        return pa.Table.from_pandas(df[COLS], preserve_index=False)

    return (j.map_batches(head100, batch_format="pyarrow")
            .repartition(1)
            .map_batches(head100, batch_size=None, batch_format="pyarrow"))


def _q_partitioned_roundtrip(sf_dir: str):
    """Partitioned-sink + pruned-source roundtrip: events written as
    hive-partitioned Parquet (one directory per event_type — the
    resumable layout the jobs/ entrypoints use), then ONE partition
    read back with directory pruning (only that directory's files are
    scanned) and aggregated per day.  Verifies the sink/source path
    under the same oracle gate as every compute operator."""
    import hashlib
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import ray.data  # noqa: F401

    from rayspatial.util import read_parquet_sized

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    out_dir = f"/tmp/rayspatial_roundtrip_{tag}"
    shutil.rmtree(out_dir, ignore_errors=True)

    events = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
    ).map_batches(
        lambda b: pa.table({
            "event_type": b.column("event_type"),
            "day": pa.array(b.column("ts").to_numpy()
                            .astype("datetime64[D]").astype(np.int64)),
            "cents": pa.array(np.round(
                b.column("value").to_numpy() * 100).astype(np.int64)),
        }),
        batch_format="pyarrow")
    events.write_parquet(out_dir, partition_cols=["event_type"])

    # pruned read: ONLY the 'click' partition directory is listed
    # (plain read_parquet — multi-file dirs get one read task per file)
    part_dir = os.path.join(out_dir, "event_type=click")
    one = ray.data.read_parquet(part_dir, columns=["day", "cents"])

    def agg(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = (b.to_pandas().groupby("day", sort=False)["cents"]
              .agg([("sum_c", "sum"), ("n", "size")]).reset_index())
        for c in ("sum_c", "n"):
            df[c] = df[c].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    def fold(b: pa.Table) -> pa.Table:
        import pandas as pd
        if not len(b):
            return pa.table({"day": pa.array([], pa.int64()),
                             "sum_c": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        df = (b.to_pandas().groupby("day", sort=False)[["sum_c", "n"]]
              .sum().reset_index().sort_values("day", ignore_index=True))
        return pa.Table.from_pandas(df, preserve_index=False)

    return (one.map_batches(agg, batch_format="pyarrow")
            .repartition(1)
            .map_batches(fold, batch_size=None, batch_format="pyarrow"))


def _q_tpch_q4(sf_dir: str):
    """TPC-H Q4 shape (order priority checking): one-quarter orders
    with EXISTS(a lineitem shipped > 45 days after the order date),
    counted by priority.  The EXISTS predicate needs both sides, so
    the quarter-filtered orders join lineitem via the size-gated
    hash_join carrying (date, priority); per-batch lateness filter +
    (orderkey, priority) dedup partials, one orderkey-keyed shuffle
    finishes the distinct, and the priority counts fold tiny."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    lo, hi = np.datetime64("1997-07-01"), np.datetime64("1997-10-01")
    GRACE = np.timedelta64(45, "D")

    def o_prep(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy()
        keep = pa.array((d >= lo) & (d < hi))
        t = b.filter(keep)
        return pa.table({"okey": t.column("o_orderkey"),
                         "odate": t.column("o_orderdate"),
                         "prio": t.column("o_orderpriority")})

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(o_prep, batch_format="pyarrow")

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"],
    ).map_batches(
        lambda b: pa.table({"okey": b.column("l_orderkey"),
                            "ship": b.column("l_shipdate")}),
        batch_format="pyarrow")

    j = hash_join(li, orders, on="okey",
                  left_cols=["okey", "ship"], right_cols=["odate", "prio"])

    def late_pairs(b: pa.Table) -> pa.Table:
        ship = b.column("ship").to_numpy()
        odate = b.column("odate").to_numpy()
        t = b.filter(pa.array(ship > odate + GRACE))
        df = pd.DataFrame({
            "okey": t.column("okey").to_numpy().astype(np.int64),
            "prio": t.column("prio").to_pandas(),
        }).drop_duplicates(ignore_index=True)
        return pa.Table.from_pandas(df, preserve_index=False)

    pairs = j.map_batches(late_pairs, batch_format="pyarrow")

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        out = (d.groupby("prio", sort=False).size().rename("order_count")
               .reset_index())
        out["order_count"] = out["order_count"].astype(np.int64)
        return out

    partial = hash_partitioned_agg(pairs, ["okey"], per_part)

    def fold(b: pa.Table) -> pa.Table:
        if not len(b):
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "order_count": pa.array([], pa.int64())})
        df = (b.to_pandas().groupby("prio", sort=False)["order_count"]
              .sum().reset_index()
              .rename(columns={"prio": "o_orderpriority"})
              .sort_values("o_orderpriority", ignore_index=True))
        df["order_count"] = df["order_count"].astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (partial.repartition(1)
            .map_batches(fold, batch_size=None, batch_format="pyarrow"))


def _q_tpch_q22(sf_dir: str):
    """TPC-H Q22 shape (global sales opportunity): above-average-
    balance customers with NO large order, grouped by nation — a
    scalar-broadcast threshold (integer-exact partial sum/count
    gather) composed with the shuffle anti-join
    (ops/relational.anti_join) and a tiny final group-aggregate."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.relational import anti_join
    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    THRESH_CENTS = 40_000_000  # o_totalprice > 400k

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"],
    ).map_batches(
        lambda b: pa.table({
            "c_custkey": b.column("c_custkey"),
            "c_nationkey": b.column("c_nationkey"),
            "bal_c": pa.array(np.round(
                b.column("c_acctbal").to_numpy() * 100).astype(np.int64)),
        }),
        batch_format="pyarrow")

    # integer-exact mean of POSITIVE balances: tiny (sum, n) gather
    def _sum_n(b: pa.Table) -> pa.Table:
        v = b.column("bal_c").to_numpy()
        v = v[v > 0]
        return pa.table({"s": pa.array([v.sum()], pa.int64()),
                         "n": pa.array([np.int64(len(v))], pa.int64())})

    parts = cust.map_batches(_sum_n, batch_format="pyarrow").to_pandas()
    T = int(parts["s"].sum() // max(int(parts["n"].sum()), 1))

    rich = cust.map_batches(
        lambda b: b.filter(pa.compute.greater(b.column("bal_c"), T)),
        batch_format="pyarrow")

    hot = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"],
    ).map_batches(
        lambda b: pa.table({"c_custkey": b.column("o_custkey").filter(
            pa.array(np.round(b.column("o_totalprice").to_numpy() * 100)
                     .astype(np.int64) > THRESH_CENTS))}),
        batch_format="pyarrow")

    quiet = anti_join(rich, hot, on="c_custkey",
                      left_cols=["c_custkey", "c_nationkey", "bal_c"])

    def agg(df):
        import pandas as pd
        out = (df.groupby("c_nationkey", sort=False)["bal_c"]
               .agg([("totbal_c", "sum"), ("numcust", "size")])
               .reset_index())
        out["totbal_c"] = out["totbal_c"].astype(np.int64)
        out["numcust"] = out["numcust"].astype(np.int64)
        return out[["c_nationkey", "numcust", "totbal_c"]]

    return hash_partitioned_agg(quiet, ["c_nationkey"], agg
                                ).sort("c_nationkey")


def _q_value_ohlc_daily(sf_dir: str):
    """Daily OHLC value candles per event type
    (ops/advanced.ohlc_agg): mergeable first/last/min/max partials —
    open/close ride the shuffle with their order keys so merging two
    partials is again an argmin/argmax; one exchange."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.advanced import ohlc_agg
    from rayspatial.util import read_parquet_sized

    events = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "event_id", "value"],
    ).map_batches(
        lambda b: pa.table({
            "event_type": b.column("event_type"),
            "day": pa.array(b.column("ts").to_numpy()
                            .astype("datetime64[D]").astype(np.int64)),
            "tsu": pa.array(b.column("ts").to_numpy()
                            .astype("datetime64[us]").astype(np.int64)),
            "event_id": b.column("event_id"),
            "cents": pa.array(np.round(
                b.column("value").to_numpy() * 100).astype(np.int64)),
        }),
        batch_format="pyarrow")
    out = ohlc_agg(events, ["event_type", "day"], ["tsu", "event_id"],
                   "cents")
    return out.sort(["event_type", "day"])


def _q_user_sequences(sf_dir: str):
    """Ordered per-user event-type sequence strings
    (ops/advanced.grouped_concat) — SQL string_agg ORDER BY shape, the
    training-sequence building aggregate; one user-keyed shuffle."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.advanced import grouped_concat
    from rayspatial.util import read_parquet_sized

    events = read_parquet_sized(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "tsu": pa.array(b.column("ts").to_numpy()
                            .astype("datetime64[us]").astype(np.int64)),
            "event_id": b.column("event_id"),
            "event_type": b.column("event_type"),
        }),
        batch_format="pyarrow")
    out = grouped_concat(events, "user_id", "event_type",
                         ["tsu", "event_id"], sep=",",
                         out_col="seq")
    return out.sort("user_id")


def _q_user_streaks(sf_dir: str):
    """Longest consecutive-active-day streak per user
    (ops/analytic.longest_streak): map-side (user, day) dedup, one
    user-keyed shuffle, vectorized day-minus-rank islands + segmented
    max — the gaps-and-islands shape with no per-user loop."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.analytic import longest_streak
    from rayspatial.util import read_parquet_sized

    events = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"],
    ).map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "day": pa.array(b.column("ts").to_numpy()
                            .astype("datetime64[D]").astype(np.int64)),
        }),
        batch_format="pyarrow")
    return longest_streak(events, "user_id", "day").sort("user_id")


def _q_orders_profile(sf_dir: str):
    """Single-pass table profiling (ops/profile.profile_table): per
    column n / nulls / exact distinct / min / max for three orders
    columns in ONE (column, value)-keyed shuffle — the exchange carries
    the distinct-value domain, not rows."""
    from rayspatial.ops.profile import profile_table
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderstatus", "o_orderpriority"])
    return profile_table(ds, ["o_custkey"],
                         ["o_orderstatus", "o_orderpriority"])


def _q_points_zorder(sf_dir: str):
    """Z-order (Morton) layout key over the extracted web-page points
    (ops/zorder.zorder_layout): lon/lat recovered to exact integer
    microdegrees, quantized to a 2^16 grid in integer math, bit-
    interleaved per batch, then ONE range sort gives the
    multidimensional-locality layout.  Output (doc_id, qx, qy, zkey)
    in layout order."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.zorder import zorder_layout
    from rayspatial.pipeline.flagship import points_dataset
    from rayspatial.pipeline.pages import LAT_MOD, LON_MOD

    def quantize(b: pa.Table) -> pa.Table:
        # floats carry exact integer microdegrees (pages.py synthesis)
        lon_num = np.round((b.column("lon").to_numpy() + 180.0) * 1e6
                           ).astype(np.int64)
        lat_num = np.round((b.column("lat").to_numpy() + 85.0) * 1e6
                           ).astype(np.int64)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "qx": pa.array(lon_num * 65536 // LON_MOD),
            "qy": pa.array(lat_num * 65536 // LAT_MOD),
        })

    pts = points_dataset(sf_dir).map_batches(quantize,
                                             batch_format="pyarrow")
    return zorder_layout(pts, "qx", "qy", bits=16, tie_cols=["doc_id"])


def _q_price_wmedian(sf_dir: str):
    """Per-returnflag quantity-WEIGHTED median price
    (ops/quantile.grouped_weighted_median): map-side weight partials
    per (flag, price) shrink the one shuffle to the distinct-value
    domain; segmented-cumsum pick, no per-group loop."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.quantile import grouped_weighted_median
    from rayspatial.util import read_parquet_sized

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    ).map_batches(
        lambda b: pa.table({
            "l_returnflag": b.column("l_returnflag"),
            "cents": pa.array(np.round(
                b.column("l_extendedprice").to_numpy() * 100
            ).astype(np.int64)),
            "qty": pa.array(np.round(
                b.column("l_quantity").to_numpy()).astype(np.int64)),
        }),
        batch_format="pyarrow")
    out = grouped_weighted_median(li, "l_returnflag", "cents", "qty")
    return out.sort("l_returnflag")


def _q_tpch_q21(sf_dir: str):
    """TPC-H Q21 shape (sole late shipper): per multi-supplier order,
    flag the supplier who is the ONLY one shipping > 60 days after the
    order date — a within-group multi-condition analysis.  lineitem
    gains o_orderdate via the size-gated hash_join, lateness is decided
    per row and pre-reduced per (order, supplier) BEFORE the one
    order-keyed shuffle; per-partition pandas group logic emits partial
    per-supplier counts, a second tiny supplier-keyed fold + bounded
    top-50 heads finish."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    GRACE = np.timedelta64(60, "D")

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    ).map_batches(
        lambda b: pa.table({"okey": b.column("l_orderkey"),
                            "skey": b.column("l_suppkey"),
                            "ship": b.column("l_shipdate")}),
        batch_format="pyarrow")

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"],
    ).map_batches(
        lambda b: pa.table({"okey": b.column("o_orderkey"),
                            "odate": b.column("o_orderdate")}),
        batch_format="pyarrow")

    j = hash_join(li, orders, on="okey",
                  left_cols=["okey", "skey", "ship"],
                  right_cols=["odate"])

    def late_partial(b: pa.Table) -> pa.Table:
        ship = b.column("ship").to_numpy()
        odate = b.column("odate").to_numpy()
        df = pd.DataFrame({
            "okey": b.column("okey").to_numpy().astype(np.int64),
            "skey": b.column("skey").to_numpy().astype(np.int64),
            "late": (ship > odate + GRACE).astype(np.int8),
        })
        out = (df.groupby(["okey", "skey"], sort=False)["late"].max()
               .reset_index())
        return pa.Table.from_pandas(out, preserve_index=False)

    pairs = j.map_batches(late_partial, batch_format="pyarrow")

    def solo_late(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["okey", "skey"], sort=False)["late"].max()
             .reset_index())
        o = (g.groupby("okey", sort=False)["late"]
             .agg([("nlate", "sum"), ("nsupp", "size")]))
        g = g.merge(o, on="okey")
        g = g[(g["late"] == 1) & (g["nlate"] == 1) & (g["nsupp"] >= 2)]
        out = (g.groupby("skey", sort=False).size().rename("numwait")
               .reset_index())
        out["numwait"] = out["numwait"].astype(np.int64)
        return out

    per_supp = hash_partitioned_agg(pairs, ["okey"], solo_late)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("skey", sort=False)["numwait"].sum()
               .reset_index().rename(columns={"skey": "s_suppkey"}))
        out["numwait"] = out["numwait"].astype(np.int64)
        return out

    counts = hash_partitioned_agg(per_supp, ["skey"], fold)

    def head50(b: pa.Table) -> pa.Table:
        df = b.to_pandas().sort_values(["numwait", "s_suppkey"],
                                       ascending=[False, True]).head(50)
        return pa.Table.from_pandas(df[["s_suppkey", "numwait"]],
                                    preserve_index=False)

    return (counts.map_batches(head50, batch_format="pyarrow")
            .repartition(1)
            .map_batches(head50, batch_size=None, batch_format="pyarrow"))


def _q_orders_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((status),(priority),()) over orders in
    one pass (ops/advanced.grouping_sets_agg): the map side emits one
    partial per requested set, a single level-tagged hash shuffle
    finishes all three margins together — no per-set rescan."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.advanced import grouping_sets_agg
    from rayspatial.util import read_parquet_sized

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderstatus": b.column("o_orderstatus"),
            "o_orderpriority": b.column("o_orderpriority"),
            "cents": pc.cast(
                pc.round(pc.multiply(b.column("o_totalprice"), 100.0),
                         round_mode="half_towards_infinity"), pa.int64()),
        })

    ds = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"],
    ).map_batches(prep, batch_format="pyarrow")
    out = grouping_sets_agg(
        ds, ["o_orderstatus", "o_orderpriority"], "cents",
        sets=[["o_orderstatus"], ["o_orderpriority"], []])
    return out.sort(["o_orderstatus", "o_orderpriority"])


def _q_value_hour_moments(sf_dir: str):
    """Mergeable bivariate moments per event type
    (ops/advanced.grouped_moments): integer-exact n / sum(x) / sum(y) /
    sum(xy) + covariance numerator for (value cents, hour-of-day) —
    map-side partials, one tiny exchange."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.ops.advanced import grouped_moments

    def xy(b: pa.Table) -> pa.Table:
        us = b.column("ts_us").to_numpy()
        hour = (us // 3_600_000_000) % 24
        return pa.table({
            "event_type": b.column("event_type"),
            "x": b.column("cents"),
            "y": pa.array(hour.astype(np.int64)),
        })

    ds = _events_us(sf_dir).map_batches(xy, batch_format="pyarrow")
    return grouped_moments(ds, ["event_type"], "x", "y").sort("event_type")


def _q_tpch_q10(sf_dir: str):
    """TPC-H Q10 shape: returned-item revenue per customer for one
    order quarter, top 20.  The quarter's orders broadcast via the
    size-gated hash_join; lineitem (l_returnflag='R') probes streaming
    and pre-aggregates per (custkey) inside each batch; one
    hash-partitioned combine; per-partition top-20 heads merge on the
    driver (bounded 20*P gather); the 20 winners are enriched by a
    streaming pc.is_in probe of customer+nation — no shuffle ever
    touches a fact table.  Revenue in exact 1e-4-cent units."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1996-04-01")

    def ord_prep(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy()
        t = b.filter(pa.array((d >= lo) & (d < hi)))
        return pa.table({"orderkey": t.column("o_orderkey"),
                         "custkey": pc.cast(t.column("o_custkey"),
                                            pa.int64())})

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(ord_prep, batch_format="pyarrow")

    def li_prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        price_c = np.round(
            t.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        disc_pct = np.round(
            t.column("l_discount").to_numpy() * 100).astype(np.int64)
        return pa.table({
            "orderkey": t.column("l_orderkey"),
            "rev_e4": pa.array(price_c * (100 - disc_pct)),
        })

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")

    joined = hash_join(li, orders, on="orderkey",
                       left_cols=["rev_e4"], right_cols=["custkey"])

    def partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"custkey": b.column("custkey").to_numpy(),
                           "revenue_e4": b.column("rev_e4").to_numpy()})
        return pa.Table.from_pandas(
            df.groupby("custkey", sort=False).sum().reset_index(),
            preserve_index=False)

    def head20(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("custkey", sort=False).sum().reset_index()
        return agg.sort_values(
            ["revenue_e4", "custkey"], ascending=[False, True]).head(20)

    heads = hash_partitioned_agg(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["custkey"], head20).to_pandas()
    top = heads.sort_values(["revenue_e4", "custkey"],
                            ascending=[False, True]).head(20)
    want = pa.array(sorted(int(k) for k in top.custkey), pa.int64())

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    ).map_batches(
        lambda b: b.filter(pc.is_in(pc.cast(b.column("c_custkey"),
                                            pa.int64()),
                                    value_set=want)),
        batch_format="pyarrow").to_pandas()
    nat = read_parquet_sized(f"{sf_dir}/nation.parquet").to_pandas()
    cust["n_name"] = cust["c_nationkey"].map(
        dict(zip(nat.n_nationkey, nat.n_name)))
    out = top.merge(cust, left_on="custkey", right_on="c_custkey")
    out = out.sort_values(["revenue_e4", "custkey"],
                          ascending=[False, True], ignore_index=True)
    return pa.table({
        "c_custkey": pa.array(out["custkey"].astype(np.int64)),
        "c_name": pa.array(out["c_name"], pa.string()),
        "revenue_e4": pa.array(out["revenue_e4"].astype(np.int64)),
        "acctbal_cents": pa.array(
            np.round(out["c_acctbal"].to_numpy() * 100).astype(np.int64)),
        "n_name": pa.array(out["n_name"], pa.string()),
    })


def _q_tpch_q14(sf_dir: str):
    """TPC-H Q14 shape: promo-part revenue share for one ship month.
    The part dimension broadcasts as a partkey -> is-promo bitmap
    (ray.put once); lineitem streams, classifies and pre-reduces each
    batch to TWO integers; the driver folds #blocks pairs.  Exact
    integer 1e-4-cent revenue — the ratio stays a (numerator,
    denominator) pair instead of a lossy float."""
    import numpy as np
    import pyarrow as pa
    import ray

    from rayspatial.util import read_parquet_sized

    lo, hi = np.datetime64("1995-09-01"), np.datetime64("1995-10-01")

    part = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"],
    ).to_pandas()
    promo = set(part.loc[part.p_type == "PROMO",
                         "p_partkey"].astype(np.int64))
    promo_ref = ray.put(np.sort(np.fromiter(promo, np.int64, len(promo))))

    def partial(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy()
        t = b.filter(pa.array((ship >= lo) & (ship < hi)))
        price_c = np.round(
            t.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        disc_pct = np.round(
            t.column("l_discount").to_numpy() * 100).astype(np.int64)
        rev = price_c * (100 - disc_pct)
        pk = t.column("l_partkey").to_numpy().astype(np.int64)
        pr = ray.get(promo_ref)
        pos = np.searchsorted(pr, pk)
        pos[pos >= len(pr)] = 0
        is_promo = (pr[pos] == pk) if len(pr) else np.zeros(len(pk), bool)
        return pa.table({
            "promo_rev_e4": pa.array([int(rev[is_promo].sum())]),
            "total_rev_e4": pa.array([int(rev.sum())]),
        })

    parts = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    ).map_batches(partial, batch_format="pyarrow").to_pandas()
    return pa.table({
        "promo_rev_e4": pa.array([int(parts.promo_rev_e4.sum())]),
        "total_rev_e4": pa.array([int(parts.total_rev_e4.sum())]),
    })


def _q_tpch_q6(sf_dir: str):
    """TPC-H Q6 shape: forecast-revenue-change filter-sum — one
    streaming pass, each batch reduces to a single integer (revenue =
    extendedprice * discount in exact 1e-4-cent units), driver folds
    #blocks scalars.  The canonical 'pruned read + vectorized filter +
    scalar combine' smoke of a columnar engine."""
    import numpy as np
    import pyarrow as pa

    from rayspatial.util import read_parquet_sized

    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1997-01-01")

    def partial(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy()
        qty = b.column("l_quantity").to_numpy()
        disc_pct = np.round(
            b.column("l_discount").to_numpy() * 100).astype(np.int64)
        keep = ((ship >= lo) & (ship < hi) & (qty < 24)
                & (disc_pct >= 5) & (disc_pct <= 7))
        price_c = np.round(
            b.column("l_extendedprice").to_numpy()[keep] * 100
        ).astype(np.int64)
        rev = price_c * disc_pct[keep]
        return pa.table({"revenue_e4": pa.array([int(rev.sum())])})

    parts = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_quantity", "l_discount",
                 "l_extendedprice"],
    ).map_batches(partial, batch_format="pyarrow").to_pandas()
    return pa.table({"revenue_e4": pa.array([int(parts.revenue_e4.sum())])})


def _q_tpch_q15(sf_dir: str):
    """TPC-H Q15 shape: top supplier(s) by quarter revenue (ties all
    kept, like the spec's view + max subquery).  Per-batch partial
    groupby(suppkey) -> one hash-partitioned combine -> the driver
    folds only #suppliers rows and applies the max filter; supplier
    names attach to the winners by streaming is_in probe."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1996-04-01")

    def partial(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy()
        t = b.filter(pa.array((ship >= lo) & (ship < hi)))
        price_c = np.round(
            t.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        disc_pct = np.round(
            t.column("l_discount").to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame({
            "suppkey": t.column("l_suppkey").to_numpy().astype(np.int64),
            "total_rev_e4": price_c * (100 - disc_pct)})
        return pa.Table.from_pandas(
            df.groupby("suppkey", sort=False).sum().reset_index(),
            preserve_index=False)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("suppkey", sort=False).sum().reset_index()

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    ).map_batches(partial, batch_format="pyarrow")
    rev = hash_partitioned_agg(li, ["suppkey"], combine).to_pandas()
    if rev.empty:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_rev_e4": pa.array([], pa.int64())})
    best = int(rev.total_rev_e4.max())
    top = rev[rev.total_rev_e4 == best].sort_values("suppkey")
    want = pa.array(sorted(int(k) for k in top.suppkey), pa.int64())
    sup = read_parquet_sized(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"],
    ).map_batches(
        lambda b: b.filter(pc.is_in(pc.cast(b.column("s_suppkey"),
                                            pa.int64()), value_set=want)),
        batch_format="pyarrow").to_pandas()
    out = top.merge(sup, left_on="suppkey", right_on="s_suppkey") \
        .sort_values("suppkey", ignore_index=True)
    return pa.table({
        "s_suppkey": pa.array(out.suppkey.astype(np.int64)),
        "s_name": pa.array(out.s_name, pa.string()),
        "total_rev_e4": pa.array(out.total_rev_e4.astype(np.int64)),
    })


def _q_tpch_q17(sf_dir: str):
    """TPC-H Q17 shape: small-quantity-order revenue for one brand.
    Phase A: lineitems of the brand's parts (broadcast key set)
    pre-reduce per part to (sum_qty, n) — the per-part average exists
    only as that integer pair, so the 'quantity < 0.2 * avg' test is
    the EXACT integer cross-multiplication 5 * qty * n < sum_qty.
    Phase B: a second streaming pass keeps qualifying rows and sums
    their price in cents.  Two reads, zero shuffles of lineitem."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    BRAND = "Brand#13"
    part = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"],
    ).to_pandas()
    pk = np.sort(part.loc[part.p_brand == BRAND,
                          "p_partkey"].to_numpy().astype(np.int64))
    pk_ref = ray.put(pk)

    def stats_partial(b: pa.Table) -> pa.Table:
        keys = ray.get(pk_ref)
        p = b.column("l_partkey").to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, p)
        pos[pos >= len(keys)] = 0
        keep = (keys[pos] == p) if len(keys) else np.zeros(len(p), bool)
        df = pd.DataFrame({
            "partkey": p[keep],
            "sum_qty": b.column("l_quantity").to_numpy()[keep]
            .astype(np.int64),
            "n": np.ones(int(keep.sum()), dtype=np.int64)})
        return pa.Table.from_pandas(
            df.groupby("partkey", sort=False).sum().reset_index(),
            preserve_index=False)

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    stats = hash_partitioned_agg(
        read_parquet_sized(f"{sf_dir}/lineitem.parquet", columns=li_cols)
        .map_batches(stats_partial, batch_format="pyarrow"),
        ["partkey"],
        lambda df: df.groupby("partkey", sort=False).sum().reset_index(),
    ).to_pandas()
    if stats.empty:
        return pa.table({"total_cents": pa.array([0], pa.int64())})
    s_keys = np.sort(stats.partkey.to_numpy().astype(np.int64))
    order = np.argsort(stats.partkey.to_numpy())
    stats_ref = ray.put((s_keys,
                         stats.sum_qty.to_numpy()[order].astype(np.int64),
                         stats.n.to_numpy()[order].astype(np.int64)))

    def keep_small(b: pa.Table) -> pa.Table:
        keys, sq, n = ray.get(stats_ref)
        p = b.column("l_partkey").to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, p)
        pos[pos >= len(keys)] = 0
        hit = keys[pos] == p
        qty = b.column("l_quantity").to_numpy().astype(np.int64)
        small = hit & (5 * qty * n[pos] < sq[pos])
        price_c = np.round(
            b.column("l_extendedprice").to_numpy()[small] * 100
        ).astype(np.int64)
        return pa.table({"total_cents": pa.array([int(price_c.sum())])})

    parts = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=li_cols,
    ).map_batches(keep_small, batch_format="pyarrow").to_pandas()
    return pa.table({"total_cents": pa.array([int(parts.total_cents.sum())])})


def _q_tpch_q7(sf_dir: str):
    """TPC-H Q7 shape: shipping volume between two nations per ship
    year.  supplier->nation and customer->nation broadcast as int
    maps (ray.put once); lineitem (2-year ship window) joins orders
    via the size-gated broadcast hash_join, then each batch classifies
    both endpoints against the broadcast maps, keeps the two directed
    pairs and pre-reduces to (supp_nation, cust_nation, year) partials
    — at most 4 rows leave each batch.  Exact 1e-4-cent revenue."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.util import read_parquet_sized

    N1, N2 = "NATION_1", "NATION_2"
    lo, hi = np.datetime64("1996-01-01"), np.datetime64("1998-01-01")

    nat = read_parquet_sized(f"{sf_dir}/nation.parquet").to_pandas()
    keys = {str(n): int(k) for k, n in zip(nat.n_nationkey, nat.n_name)}
    k1, k2 = keys[N1], keys[N2]

    sup = read_parquet_sized(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup[sup.s_nationkey.isin((k1, k2))]
    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"]).to_pandas()
    cust = cust[cust.c_nationkey.isin((k1, k2))]

    def _sorted_map(keys_, vals_):
        ks = np.asarray(keys_, dtype=np.int64)
        vs = np.asarray(vals_, dtype=np.int64)
        o = np.argsort(ks)
        return ks[o], vs[o]

    sup_ref = ray.put(_sorted_map(sup.s_suppkey, sup.s_nationkey))
    cust_ref = ray.put(_sorted_map(cust.c_custkey, cust.c_nationkey))

    def _probe(ref, keys_):
        ks, vs = ray.get(ref)
        if not len(ks):
            return np.full(len(keys_), -1, np.int64)
        pos = np.searchsorted(ks, keys_)
        pos[pos >= len(ks)] = 0
        return np.where(ks[pos] == keys_, vs[pos], -1).astype(np.int64)

    def li_prep(b: pa.Table) -> pa.Table:
        ship = b.column("l_shipdate").to_numpy()
        t = b.filter(pa.array((ship >= lo) & (ship < hi)))
        price_c = np.round(
            t.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        disc_pct = np.round(
            t.column("l_discount").to_numpy() * 100).astype(np.int64)
        year = t.column("l_shipdate").to_numpy() \
            .astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "orderkey": t.column("l_orderkey"),
            "suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
            "l_year": pa.array(year),
            "rev_e4": pa.array(price_c * (100 - disc_pct)),
        })

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
    ).map_batches(li_prep, batch_format="pyarrow")

    def ord_prep(b: pa.Table) -> pa.Table:
        return pa.table({"orderkey": b.column("o_orderkey"),
                         "custkey": pc.cast(b.column("o_custkey"),
                                            pa.int64())})

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"],
    ).map_batches(ord_prep, batch_format="pyarrow")

    joined = hash_join(li, orders, on="orderkey",
                       left_cols=["suppkey", "l_year", "rev_e4"],
                       right_cols=["custkey"])

    def partial(b: pa.Table) -> pa.Table:
        s_nat = _probe(sup_ref, b.column("suppkey").to_numpy())
        c_nat = _probe(cust_ref, b.column("custkey").to_numpy())
        keep = ((s_nat == k1) & (c_nat == k2)) | \
               ((s_nat == k2) & (c_nat == k1))
        df = pd.DataFrame({
            "s_nat": s_nat[keep], "c_nat": c_nat[keep],
            "l_year": b.column("l_year").to_numpy()[keep],
            "revenue_e4": b.column("rev_e4").to_numpy()[keep]})
        return pa.Table.from_pandas(
            df.groupby(["s_nat", "c_nat", "l_year"], sort=False)
            .sum().reset_index(), preserve_index=False)

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    names = {k1: N1, k2: N2}
    if parts.empty:
        return pa.table({"supp_nation": pa.array([], pa.string()),
                         "cust_nation": pa.array([], pa.string()),
                         "l_year": pa.array([], pa.int64()),
                         "revenue_e4": pa.array([], pa.int64())})
    agg = parts.groupby(["s_nat", "c_nat", "l_year"]).sum().reset_index()
    agg = agg.sort_values(["s_nat", "c_nat", "l_year"], ignore_index=True)
    return pa.table({
        "supp_nation": pa.array([names[int(v)] for v in agg.s_nat]),
        "cust_nation": pa.array([names[int(v)] for v in agg.c_nat]),
        "l_year": pa.array(agg.l_year.astype(np.int64)),
        "revenue_e4": pa.array(agg.revenue_e4.astype(np.int64)),
    })


def _q_tpch_q5(sf_dir: str):
    """TPC-H Q5 shape: local-supplier revenue per ASIA nation for one
    order year.  Dimension chain (region -> nation -> supplier /
    customer) broadcast once; orders x customer via the size-gated
    broadcast hash_join; lineitem never shuffles — it probes the
    orders map and the supplier map streaming, then two-level partial
    aggregation by nation.  Exact 1e-4-cent revenue units."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.util import read_parquet_sized

    lo, hi = np.datetime64("1997-01-01"), np.datetime64("1998-01-01")

    nat = read_parquet_sized(f"{sf_dir}/nation.parquet").to_pandas()
    reg = read_parquet_sized(f"{sf_dir}/region.parquet").to_pandas()
    asia = set(reg.loc[reg.r_name == "ASIA", "r_regionkey"])
    nat = nat[nat.n_regionkey.isin(asia)]
    names = {int(k): str(v) for k, v in zip(nat.n_nationkey, nat.n_name)}

    sup = read_parquet_sized(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sup = sup[sup.s_nationkey.isin(names)]
    sup_ref = ray.put(dict(zip(sup.s_suppkey.astype(np.int64),
                               sup.s_nationkey.astype(np.int64))))

    def cust_prep(b: pa.Table) -> pa.Table:
        keep = pc.is_in(b.column("c_nationkey"),
                        value_set=pa.array(sorted(names), pa.int32()))
        t = b.filter(keep)
        return pa.table({
            "custkey": t.column("c_custkey"),
            "c_nat": pc.cast(t.column("c_nationkey"), pa.int64()),
        })

    cust = read_parquet_sized(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
    ).map_batches(cust_prep, batch_format="pyarrow")

    def ord_prep(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate").to_numpy()
        t = b.filter(pa.array((d >= lo) & (d < hi)))
        return pa.table({"orderkey": t.column("o_orderkey"),
                         "custkey": t.column("o_custkey")})

    orders = read_parquet_sized(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(ord_prep, batch_format="pyarrow")

    ord_nat = hash_join(orders, cust, on="custkey",
                        left_cols=["orderkey", "custkey"],
                        right_cols=["c_nat"])

    def li_prep(b: pa.Table) -> pa.Table:
        price_c = np.round(
            b.column("l_extendedprice").to_numpy() * 100).astype(np.int64)
        disc_pct = np.round(
            b.column("l_discount").to_numpy() * 100).astype(np.int64)
        return pa.table({
            "orderkey": b.column("l_orderkey"),
            "suppkey": b.column("l_suppkey"),
            "rev_e4": pa.array(price_c * (100 - disc_pct)),
        })

    li = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")

    joined = hash_join(li, ord_nat, on="orderkey",
                       left_cols=["orderkey", "suppkey", "rev_e4"],
                       right_cols=["c_nat"])

    def _gather_map(m: dict, keys: np.ndarray) -> np.ndarray:
        # vectorized dict probe: sorted-key searchsorted, miss -> -1
        if not m:
            return np.full(len(keys), -1, np.int64)
        ks = np.fromiter(m.keys(), np.int64, len(m))
        vs = np.fromiter(m.values(), np.int64, len(m))
        o = np.argsort(ks)
        ks, vs = ks[o], vs[o]
        pos = np.searchsorted(ks, keys)
        pos[pos >= len(ks)] = 0
        return np.where(ks[pos] == keys, vs[pos], -1).astype(np.int64)

    def local_nat(b: pa.Table) -> pa.Table:
        sm = ray.get(sup_ref)
        sk = b.column("suppkey").to_numpy()
        s_nat = _gather_map(sm, sk)
        keep = s_nat == b.column("c_nat").to_numpy()
        df = pd.DataFrame({"nat": s_nat[keep],
                           "revenue_e4": b.column("rev_e4").to_numpy()[keep]})
        out = df.groupby("nat", sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = joined.map_batches(local_nat, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pa.table({"n_name": pa.array([], pa.string()),
                         "revenue_e4": pa.array([], pa.int64())})
    agg = parts.groupby("nat").sum().reset_index()
    agg["n_name"] = agg["nat"].map(names)
    agg = agg.sort_values("n_name", ignore_index=True)
    out = pa.table({
        "n_name": pa.array(agg["n_name"], pa.string()),
        "revenue_e4": pa.array(agg["revenue_e4"].astype(np.int64)),
    })
    return out


def _q_supplier_cnt(sf_dir: str):
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per (brand, size) via
    lineitem — map-side (partkey, suppkey) pair dedup shrinks the
    exchange, part attributes attach through the size-gated broadcast
    join, one hash shuffle by (brand, size) finishes the exact
    distinct count."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from rayspatial.ops.equijoin import hash_join
    from rayspatial.util import hash_partitioned_agg, read_parquet_sized

    def pair_dedup(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"partkey": b.column("l_partkey").to_numpy(),
                           "suppkey": b.column("l_suppkey").to_numpy()})
        return pa.Table.from_pandas(df.drop_duplicates(),
                                    preserve_index=False)

    pairs = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"],
    ).map_batches(pair_dedup, batch_format="pyarrow")

    def part_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "partkey": b.column("p_partkey"),
            "p_brand": b.column("p_brand"),
            "p_size": pc.cast(b.column("p_size"), pa.int64()),
        })

    part = read_parquet_sized(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"],
    ).map_batches(part_prep, batch_format="pyarrow")

    attached = hash_join(pairs, part, on="partkey",
                         left_cols=["suppkey"],
                         right_cols=["p_brand", "p_size"])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["p_brand", "p_size"], sort=False)["suppkey"]
               .nunique().rename("supplier_cnt").reset_index())
        out["supplier_cnt"] = out["supplier_cnt"].astype(np.int64)
        return out

    return hash_partitioned_agg(attached, ["p_brand", "p_size"],
                                finish).sort(["p_brand", "p_size"])


def _q_value_ntile(sf_dir: str):
    """Exact global NTILE(4) (ops/quantile.ntile: quantile range splits
    -> range shuffle -> offset arange -> bucket formula), folded to
    per-bucket count + exact cent sums — no global sort, the only
    gathers are one int per partition."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rayspatial.ops.quantile import ntile

    bucketed = ntile(
        _events_us(sf_dir).map_batches(
            lambda b: b.select(["event_id", "cents"]),
            batch_format="pyarrow"),
        "cents", "event_id", k=4, num_parts=16)

    def _partial(b: pa.Table) -> pa.Table:
        df = pd.DataFrame({"bucket": b.column("bucket").to_numpy(),
                           "n": np.ones(len(b), np.int64),
                           "sum_cents": b.column("cents").to_numpy()})
        out = df.groupby("bucket", sort=False).sum().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    def _fold(b: pa.Table) -> pa.Table:
        if not len(b):
            return b
        df = b.to_pandas()
        out = (df.groupby("bucket", sort=False)[["n", "sum_cents"]].sum()
               .reset_index().sort_values("bucket", ignore_index=True))
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (bucketed.map_batches(_partial, batch_format="pyarrow")
            .repartition(1)
            .map_batches(_fold, batch_size=None, batch_format="pyarrow"))


def _q_type_cooccurrence(sf_dir: str):
    """Market-basket pair counts over each user's distinct event-type
    set (ops/advanced.cooccurrence_pairs): one hash shuffle co-locates
    users, per-partition distinct-set self-merge, tiny pair-domain
    fold."""
    from rayspatial.ops.advanced import cooccurrence_pairs

    return cooccurrence_pairs(_events_us(sf_dir), "user_id", "event_type")


def _q_value_histogram(sf_dir: str):
    """Fixed-width histogram of event value cents (width 10.00):
    map-side occupied-bin partials, one-task fold — the exchange
    carries bin summaries, never rows (ops/advanced.histogram_fixed)."""
    from rayspatial.ops.advanced import histogram_fixed

    return histogram_fixed(_events_us(sf_dir), "cents", width=1000)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_points": _q_extract_points,
        "tile_counts": _q_tile_counts,
        "pip_join": _q_pip_join,
        "pip_join_shuffled": _q_pip_join_shuffled,
        "pip_join_subdivided": _q_pip_join_subdivided,
        "flagship_join_tiles": _q_flagship,
        "knn_join": _q_knn_join,
        "nearest_poly": _q_nearest_poly,
        "poly_area_perimeter": _q_poly_area_perimeter,
        "tile_vectorize": _q_tile_vectorize,
        "line_clip": _q_line_clip,
        "dwithin_join": _q_dwithin_join,
        "dup_groups": _q_dup_groups,
        "events_sliding": _q_events_sliding,
        "buffer_area": _q_buffer_area,
        "events_windowed": _q_events_windowed,
        "top_users": _q_top_users,
        "events_streaming": _q_events_streaming,
        "stream_stream_join": _q_stream_stream_join,
        "stream_stream_join_salted": _q_stream_stream_join_salted,
        "asof_prior_click": _q_asof_prior_click,
        "asof_salted": _q_asof_salted,
        "range_join_views": _q_range_join_views,
        "sessions": _q_sessions,
        "sessions_salted": _q_sessions_salted,
        "total_bounds": _q_total_bounds,
        "pages_by_lang": _q_pages_by_lang,
        # training-data ops
        "exact_dedup": _q_exact_dedup,
        "exact_dedup_normalized": _q_exact_dedup_normalized,
        "snapshot_diff": _q_snapshot_diff,
        "doc_chunks": _q_doc_chunks,
        "dataset_split": _q_dataset_split,
        "curation_pipeline": _q_curation_pipeline,
        "url_dedup": _q_url_dedup,
        "points_uncovered": _q_points_uncovered,
        "retention": _q_retention,
        "orders_rollup": _q_orders_rollup,
        "token_counts": _q_token_counts,
        "text_stats": _q_text_stats,
        "repetition_stats": _q_repetition_stats,
        "canonical_docs": _q_canonical_docs,
        "orders_by_segment": _q_orders_by_segment,
        "user_event_windows": _q_user_event_windows,
        "distinct_users_daily": _q_distinct_users_daily,
        "span_dedup": _q_span_dedup,
        "line_dedup": _q_line_dedup,
        "spatial_clusters": _q_spatial_clusters,
        "zonal_stats": _q_zonal_stats,
        "area_interp": _q_area_interp,
        "stratified_sample": _q_stratified_sample,
        "tfidf_topk": _q_tfidf_topk,
        "inverted_index": _q_inverted_index,
        "pagerank": _q_pagerank,
        "value_quantiles": _q_value_quantiles,
        "host_stats": _q_host_stats,
        "dissolve_groups": _q_dissolve_groups,
        "grouped_quantiles": _q_grouped_quantiles,
        "emb_centroids": _q_emb_centroids,
        "kmeans_labels": _q_kmeans_labels,
        "distinct_users_daily_hll": _q_distinct_users_daily_hll,
        "ngram_dup_pairs": _q_ngram_dup_pairs,
        "minhash_candidates": _q_minhash_candidates,
        "simhash_pairs": _q_simhash_pairs,
        "emb_dup_pairs": _q_emb_dup_pairs,
        "ann_topk": _q_ann_topk,
        "srp_candidates": _q_srp_candidates,
        "ivf_topk": _q_ivf_topk,
        "pq_rerank_topk": _q_pq_rerank_topk,
        "ivf_topk_indexed": _q_ivf_topk_indexed,
        "lang_id": _q_lang_id,
        "fingerprints": _q_fingerprints,
        "binary_features": _q_binary_features,
        "bmp_features": _q_bmp_features,
        "wav_features": _q_wav_features,
        "curated_docs": _q_curated_docs,
        "decontaminated_docs": _q_decontaminated_docs,
        "packed_sequences": _q_packed_sequences,
        "lm_scores": _q_lm_scores,
        "host_capped_docs": _q_host_capped_docs,
        "vocab": _q_vocab,
        "rolling_user_value": _q_rolling_user_value,
        "rolling_user_median": _q_rolling_user_median,
        "rolling_user_value_salted": _q_rolling_user_value_salted,
        "pricing_summary": _q_pricing_summary,
        "pmi_collocations": _q_pmi_collocations,
        "emb_pca": _q_emb_pca,
        "heavy_hitters": _q_heavy_hitters,
        "incremental_dedup": _q_incremental_dedup,
        "global_rank": _q_global_rank,
        "emb_int8": _q_emb_int8,
        "funnel": _q_funnel,
        "zonal_majority": _q_zonal_majority,
        "orders_by_region": _q_orders_by_region,
        "lineitem_group_attach": _q_lineitem_group_attach,
        "weighted_sample": _q_weighted_sample,
        "approx_quantiles": _q_approx_quantiles,
        "poly_union_area": _q_poly_union_area,
        "top_terms": _q_top_terms,
        "customer_orders_left": _q_customer_orders_left,
        "customer_orders_full": _q_customer_orders_full,
        "docs_quality_band": _q_docs_quality_band,
        "top_unshipped_orders": _q_top_unshipped_orders,
        "promo_revenue": _q_promo_revenue,
        "bm25_topk": _q_bm25_topk,
        "user_value_resampled": _q_user_value_resampled,
        "latest_order_per_customer": _q_latest_order_per_customer,
        "events_pivot_daily": _q_events_pivot_daily,
        "rolling_distinct_users": _q_rolling_distinct_users,
        "streaming_dedup": _q_streaming_dedup,
        "tile_pyramid": _q_tile_pyramid,
        "props_k_stats": _q_props_k_stats,
        "customers_above_nation_avg": _q_customers_above_nation_avg,
        "redacted_docs": _q_redacted_docs,
        "phrase_docs": _q_phrase_docs,
        "triangle_count": _q_triangle_count,
        "png_features": _q_png_features,
        "jpeg_features": _q_jpeg_features,
        "value_outliers": _q_value_outliers,
        "streaming_sessions": _q_streaming_sessions,
        "cm_term_counts": _q_cm_term_counts,
        "user_twap": _q_user_twap,
        "stream_knn_join": _q_stream_knn_join,
        "part_skyline": _q_part_skyline,
        "peak_concurrency": _q_peak_concurrency,
        "user_mode_event": _q_user_mode_event,
        "event_transitions": _q_event_transitions,
        "orders_cube": _q_orders_cube,
        "orders_grouping_sets": _q_orders_grouping_sets,
        "tpch_q13": _q_tpch_q13,
        "typo_pairs": _q_typo_pairs,
        "tpch_q18": _q_tpch_q18,
        "tpch_q21": _q_tpch_q21,
        "price_wmedian": _q_price_wmedian,
        "points_zorder": _q_points_zorder,
        "orders_profile": _q_orders_profile,
        "user_streaks": _q_user_streaks,
        "user_sequences": _q_user_sequences,
        "value_ohlc_daily": _q_value_ohlc_daily,
        "tpch_q22": _q_tpch_q22,
        "tpch_q4": _q_tpch_q4,
        "partitioned_roundtrip": _q_partitioned_roundtrip,
        "value_hour_moments": _q_value_hour_moments,
        "tpch_q5": _q_tpch_q5,
        "tpch_q10": _q_tpch_q10,
        "tpch_q14": _q_tpch_q14,
        "tpch_q7": _q_tpch_q7,
        "tpch_q6": _q_tpch_q6,
        "tpch_q15": _q_tpch_q15,
        "tpch_q17": _q_tpch_q17,
        "supplier_cnt": _q_supplier_cnt,
        "value_ntile": _q_value_ntile,
        "type_cooccurrence": _q_type_cooccurrence,
        "value_histogram": _q_value_histogram,
    }


def oracle_sql() -> dict[str, str]:
    cx = _cell_expr("lon", 180.0, 360.0, 64)
    cy = _cell_expr("lat", 90.0, 180.0, 64)
    join_cond = "lon >= xmin AND lon <= xmax AND lat >= ymin AND lat <= ymax"
    return {
        "extract_points": f"WITH {_PTS_CTE} SELECT url, doc_id, lon, lat FROM pts",
        "tile_counts": (
            f"WITH {_PTS_CTE} SELECT {cx} AS cell_x, {cy} AS cell_y, "
            "COUNT(*) AS n_points FROM pts GROUP BY 1, 2"
        ),
        # payload_bytes = octet_length(html) where html is the
        # deterministic page scaffold (pages.py make_pages_batch):
        # 60-byte prefix + str(lat_num) + ',' + str(lon_num) + 18-byte
        # mid + text + 18-byte suffix; texts are ASCII so
        # length(text) == octet_length
        "binary_features": (
            "SELECT doc_id, CAST(60 + "
            "length(CAST((doc_id * 2246822519) % 170000000 AS VARCHAR)) "
            "+ 1 + "
            "length(CAST((doc_id * 2654435761) % 360000000 AS VARCHAR)) "
            "+ 18 + length(text) + 18 AS BIGINT) AS payload_bytes "
            "FROM documents"
        ),
        # the synthesized 16x16 BMP's pixel j = (doc_id*31 + j) % 256 is
        # a closed form, so SQL reproduces the DECODED statistics the
        # Ray side computes from the actual BMP bytes
        "bmp_features": (
            "SELECT d.doc_id, CAST(16 AS BIGINT) AS width, "
            "CAST(16 AS BIGINT) AS height, "
            "CAST(SUM(CASE WHEN t.j % 3 = 0 THEN (d.doc_id * 31 + t.j) % 256 "
            "END) AS BIGINT) AS sum_r, "
            "CAST(SUM(CASE WHEN t.j % 3 = 1 THEN (d.doc_id * 31 + t.j) % 256 "
            "END) AS BIGINT) AS sum_g, "
            "CAST(SUM(CASE WHEN t.j % 3 = 2 THEN (d.doc_id * 31 + t.j) % 256 "
            "END) AS BIGINT) AS sum_b, "
            "CAST(MIN((d.doc_id * 31 + t.j) % 256) AS BIGINT) AS min_v, "
            "CAST(MAX((d.doc_id * 31 + t.j) % 256) AS BIGINT) AS max_v, "
            "CAST(SUM((d.doc_id * 31 + t.j) % 256) AS BIGINT) AS sum_all "
            "FROM documents d CROSS JOIN generate_series(0, 767) AS t(j) "
            "GROUP BY d.doc_id"
        ),
        # constant-color JPEG: the lossy chain collapses to closed-form
        # arithmetic for a DC-only block — the SQL recomputes the
        # DECODED pixels the Ray side gets back through the full
        # huffman + dequant + IDCT + YCbCr baseline decode
        "jpeg_features": _jpeg_oracle_sql(),
        # pixel j of the synthesized 12x10 RGB PNG is
        # (doc_id*17 + j) % 256 — SQL recomputes the DECODED statistics
        # the Ray side gets back through zlib inflate + unfilter
        "png_features": (
            "SELECT d.doc_id, CAST(10 AS BIGINT) AS width, "
            "CAST(12 AS BIGINT) AS height, CAST(3 AS BIGINT) AS channels, "
            "CAST(SUM(CASE WHEN t.j % 3 = 0 THEN (d.doc_id * 17 + t.j) "
            "% 256 END) AS BIGINT) AS sum_c0, "
            "CAST(SUM((d.doc_id * 17 + t.j) % 256) AS BIGINT) AS sum_all, "
            "CAST(MIN((d.doc_id * 17 + t.j) % 256) AS BIGINT) AS min_v, "
            "CAST(MAX((d.doc_id * 17 + t.j) % 256) AS BIGINT) AS max_v, "
            "CAST(120 AS BIGINT) AS n_pixels "
            "FROM documents d CROSS JOIN generate_series(0, 359) AS t(j) "
            "GROUP BY d.doc_id"
        ),
        # sample j of the synthesized WAV is ((doc_id*17 + j*31) %
        # 65536) - 32768 — SQL recomputes the DECODED statistics
        "wav_features": (
            "WITH s AS (SELECT d.doc_id, t.j, "
            "(d.doc_id * 17 + t.j * 31) % 65536 - 32768 AS v "
            "FROM documents d CROSS JOIN generate_series(0, 255) AS t(j)) "
            "SELECT doc_id, CAST(8000 AS BIGINT) AS rate, "
            "CAST(1 AS BIGINT) AS channels, "
            "CAST(256 AS BIGINT) AS n_samples, "
            "CAST(SUM(v) AS BIGINT) AS sum_s, "
            "CAST(MIN(v) AS BIGINT) AS min_s, "
            "CAST(MAX(v) AS BIGINT) AS max_s, "
            "CAST(SUM(ABS(v)) AS BIGINT) AS sum_abs, "
            "CAST(SUM(CASE WHEN j >= 1 AND v * "
            "((doc_id * 17 + (j - 1) * 31) % 65536 - 32768) < 0 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS zero_cross "
            "FROM s GROUP BY doc_id"
        ),
        # Horner recurrence h = (h*B + byte) mod 2^64 reproduced in a
        # recursive CTE; 128-bit-safe via 32-bit split of h (HUGEINT
        # holds every intermediate).  Texts are ASCII so ord == byte.
        "fingerprints": (
            "WITH RECURSIVE "
            "chars AS (SELECT doc_id, i, CAST(ord(substr(text, "
            "CAST(i AS INTEGER), 1)) AS HUGEINT) AS c FROM documents, "
            "LATERAL unnest(generate_series(1, length(text))) AS t(i)), "
            "lens AS (SELECT doc_id, length(text) AS L FROM documents), "
            "r AS (SELECT doc_id, 1 AS pos, CAST(0 AS HUGEINT) AS h "
            "FROM lens UNION ALL SELECT r.doc_id, r.pos + 1, "
            "((((r.h // CAST(4294967296 AS HUGEINT)) * "
            "CAST(11400714819323198485 AS HUGEINT)) % "
            "CAST(4294967296 AS HUGEINT)) * CAST(4294967296 AS HUGEINT) "
            "+ (r.h % CAST(4294967296 AS HUGEINT)) * "
            "CAST(11400714819323198485 AS HUGEINT) + c.c) % "
            "CAST(18446744073709551616 AS HUGEINT) "
            "FROM r JOIN chars c ON c.doc_id = r.doc_id AND c.i = r.pos), "
            "fin AS (SELECT r.doc_id, r.h FROM r JOIN lens "
            "ON lens.doc_id = r.doc_id WHERE r.pos = lens.L + 1) "
            "SELECT doc_id, CAST(CASE WHEN h < "
            "CAST(9223372036854775808 AS HUGEINT) THEN h ELSE h - "
            "CAST(18446744073709551616 AS HUGEINT) END AS BIGINT) AS fp "
            "FROM fin"
        ),
        # the query explodes its vector boxes back into covered fine
        # cells; an exact disjoint rectangle cover equals exactly the
        # distinct occupied res-6 cells (tile = fine cell // 8)
        "tile_vectorize": (
            f"WITH {_PTS_CTE}, f AS (SELECT DISTINCT {cx} AS fx, {cy} AS fy "
            "FROM pts) "
            "SELECT fx // 8 AS cell_x, fy // 8 AS cell_y, fx, fy FROM f"
        ),
        "pip_join": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE} "
            f"SELECT doc_id, poly_id FROM pts JOIN polys ON {join_cond}"
        ),
        "pip_join_shuffled": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE} "
            f"SELECT doc_id, poly_id FROM pts JOIN polys ON {join_cond}"
        ),
        "pip_join_subdivided": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE} "
            f"SELECT doc_id, poly_id FROM pts JOIN polys ON {join_cond}"
        ),
        "flagship_join_tiles": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE} "
            f"SELECT {cx} AS cell_x, {cy} AS cell_y, poly_id, COUNT(*) AS n_points "
            f"FROM pts JOIN polys ON {join_cond} GROUP BY 1, 2, 3"
        ),
        "total_bounds": (
            f"WITH {_PTS_CTE} SELECT MIN(lon) AS xmin, MIN(lat) AS ymin, "
            "MAX(lon) AS xmax, MAX(lat) AS ymax FROM pts"
        ),
        "pages_by_lang": "SELECT lang, COUNT(*) AS n_pages FROM documents GROUP BY lang",
        "dwithin_join": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE}, "
            "d AS (SELECT doc_id, poly_id, "
            "GREATEST(xmin - lon, lon - xmax, 0) * GREATEST(xmin - lon, lon - xmax, 0) "
            "+ GREATEST(ymin - lat, lat - ymax, 0) * GREATEST(ymin - lat, lat - ymax, 0) AS d2 "
            "FROM pts CROSS JOIN polys) "
            "SELECT doc_id, poly_id FROM d WHERE d2 <= 9.0"
        ),
        "dup_groups": (
            "WITH RECURSIVE " + _NGRAM_PAIRS_CTE + ", "
            "edges AS (SELECT a, b FROM pairsq UNION SELECT b, a FROM pairsq), "
            "reach(node, r) AS ("
            "SELECT a AS node, a AS r FROM edges "
            "UNION "
            "SELECT e.a, rr.r FROM edges e JOIN reach rr ON rr.node = e.b) "
            "SELECT node AS doc_id, MIN(r) AS rep FROM reach GROUP BY node"
        ),
        "events_sliding": (
            "SELECT make_timestamp(((epoch_us(ts) // 1800000000) - s.i) * 1800000000) "
            "AS window_start, COUNT(*) AS n_events, "
            "CAST(SUM(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_value "
            "FROM events CROSS JOIN (SELECT unnest([0, 1]) AS i) s "
            "GROUP BY 1"
        ),
        "buffer_area": (
            f"WITH {_POLYS_CTE} "
            "SELECT poly_id, CAST(round((xmax - xmin + 4.0) * (ymax - ymin + 4.0) * 1000) AS BIGINT) "
            "AS buf_area_milli FROM polys"
        ),
        "line_clip": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE}, "
            "seg AS (SELECT doc_id, FLOOR(lon) AS x1, FLOOR(lat) AS y1 FROM pts), "
            "c AS (SELECT s.doc_id, p.poly_id, "
            "GREATEST((p.xmin - s.x1) / 2.0, p.ymin - s.y1, 0.0) AS tin, "
            "LEAST((p.xmax - s.x1) / 2.0, p.ymax - s.y1, 1.0) AS tout "
            "FROM seg s JOIN polys p ON s.x1 + 2 >= p.xmin AND s.x1 <= p.xmax "
            "AND s.y1 + 1 >= p.ymin AND s.y1 <= p.ymax) "
            "SELECT doc_id, poly_id, "
            "CAST(round(20 * (tout - tin) * (tout - tin)) AS BIGINT) AS len2 "
            "FROM c WHERE tout > tin"
        ),
        "events_windowed": (
            "SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) "
            "AS window_start, event_type, COUNT(*) AS n_events, "
            "CAST(SUM(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "top_users": (
            "SELECT user_id, CAST(SUM(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS total_cents "
            "FROM events GROUP BY user_id "
            "ORDER BY total_cents DESC, user_id LIMIT 10"
        ),
        "distinct_users_daily": (
            "SELECT make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) "
            "AS day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users "
            "FROM events GROUP BY 1"
        ),
        "grouped_quantiles": (
            "WITH r AS (SELECT event_type, value, "
            "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) "
            "AS rn, COUNT(*) OVER (PARTITION BY event_type) AS c "
            "FROM events) "
            "SELECT event_type, CAST(p AS BIGINT) AS pct, value "
            "FROM (VALUES (50), (90)) q(p) JOIN r "
            "ON r.rn = (p * r.c + 99) // 100"
        ),
        "emb_centroids": (
            "WITH f AS (SELECT label, "
            "unnest(embedding) AS v, "
            "generate_subscripts(embedding, 1) - 1 AS dim "
            "FROM embeddings) "
            "SELECT CAST(label AS BIGINT) AS label, "
            "CAST(dim AS BIGINT) AS dim, "
            "CAST(SUM(CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) "
            "AS BIGINT) AS sum_micro, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM f GROUP BY label, dim"
        ),
        "dissolve_groups": (
            f"WITH {_POLYS_CTE}, "
            "pg AS (SELECT poly_id % 12 AS grp, xmin, ymin, xmax, ymax "
            "FROM polys), "
            "xs AS (SELECT DISTINCT grp, x FROM "
            "(SELECT grp, xmin AS x FROM pg UNION SELECT grp, xmax FROM pg)), "
            "ys AS (SELECT DISTINCT grp, y FROM "
            "(SELECT grp, ymin AS y FROM pg UNION SELECT grp, ymax FROM pg)), "
            "xi AS (SELECT grp, x, LEAD(x) OVER (PARTITION BY grp ORDER BY x) "
            "AS x2 FROM xs), "
            "yi AS (SELECT grp, y, LEAD(y) OVER (PARTITION BY grp ORDER BY y) "
            "AS y2 FROM ys), "
            "cells AS (SELECT xi.grp, x, x2, y, y2 FROM xi JOIN yi "
            "ON xi.grp = yi.grp WHERE x2 IS NOT NULL AND y2 IS NOT NULL), "
            "covered AS (SELECT c.grp, c.x, c.x2, c.y, c.y2 FROM cells c "
            "WHERE EXISTS (SELECT 1 FROM pg p WHERE p.grp = c.grp "
            "AND p.xmin <= c.x AND p.xmax >= c.x2 "
            "AND p.ymin <= c.y AND p.ymax >= c.y2)) "
            "SELECT grp, CAST(SUM((x2 - x) * (y2 - y)) AS BIGINT) "
            "AS union_area FROM covered GROUP BY grp"
        ),
        "host_stats": (
            f"WITH {_PTS_CTE} "
            "SELECT regexp_extract(url, 'https?://([^/]+)/', 1) AS host, "
            "CAST(COUNT(*) AS BIGINT) AS n_pages, "
            "CAST(MIN(doc_id) AS BIGINT) AS min_doc, "
            "CAST(MAX(doc_id) AS BIGINT) AS max_doc "
            "FROM pts GROUP BY 1"
        ),
        "value_quantiles": (
            "WITH n AS (SELECT COUNT(*) AS c FROM events), "
            "r AS (SELECT value, ROW_NUMBER() OVER (ORDER BY value) "
            "AS rn FROM events) "
            "SELECT CAST(p AS BIGINT) AS pct, value "
            "FROM (VALUES (25), (50), (90), (99)) q(p) "
            "JOIN n ON true JOIN r ON r.rn = (p * n.c + 99) // 100"
        ),
        "pagerank": (
            """WITH nn AS (SELECT COUNT(*) AS n FROM documents), links AS (SELECT doc_id AS node, (doc_id*7+1) % n AS dst FROM documents CROSS JOIN nn UNION ALL SELECT doc_id, (doc_id*13+2) % n FROM documents CROSS JOIN nn UNION ALL SELECT doc_id, (doc_id*31+5) % n FROM documents CROSS JOIN nn), pr0 AS (SELECT doc_id AS node, (1000000000000 // n) AS r FROM documents CROSS JOIN nn), c1 AS (SELECT l.dst AS node, SUM(p.r // 3) AS s FROM links l JOIN pr0 p ON p.node = l.node GROUP BY l.dst), pr1 AS (SELECT d.doc_id AS node, ((15 * 1000000000000) // (100 * n)) + (85 * COALESCE(c.s, 0)) // 100 AS r FROM documents d CROSS JOIN nn LEFT JOIN c1 c ON c.node = d.doc_id), c2 AS (SELECT l.dst AS node, SUM(p.r // 3) AS s FROM links l JOIN pr1 p ON p.node = l.node GROUP BY l.dst), pr2 AS (SELECT d.doc_id AS node, ((15 * 1000000000000) // (100 * n)) + (85 * COALESCE(c.s, 0)) // 100 AS r FROM documents d CROSS JOIN nn LEFT JOIN c2 c ON c.node = d.doc_id), c3 AS (SELECT l.dst AS node, SUM(p.r // 3) AS s FROM links l JOIN pr2 p ON p.node = l.node GROUP BY l.dst), pr3 AS (SELECT d.doc_id AS node, ((15 * 1000000000000) // (100 * n)) + (85 * COALESCE(c.s, 0)) // 100 AS r FROM documents d CROSS JOIN nn LEFT JOIN c3 c ON c.node = d.doc_id), c4 AS (SELECT l.dst AS node, SUM(p.r // 3) AS s FROM links l JOIN pr3 p ON p.node = l.node GROUP BY l.dst), pr4 AS (SELECT d.doc_id AS node, ((15 * 1000000000000) // (100 * n)) + (85 * COALESCE(c.s, 0)) // 100 AS r FROM documents d CROSS JOIN nn LEFT JOIN c4 c ON c.node = d.doc_id), c5 AS (SELECT l.dst AS node, SUM(p.r // 3) AS s FROM links l JOIN pr4 p ON p.node = l.node GROUP BY l.dst), pr5 AS (SELECT d.doc_id AS node, ((15 * 1000000000000) // (100 * n)) + (85 * COALESCE(c.s, 0)) // 100 AS r FROM documents d CROSS JOIN nn LEFT JOIN c5 c ON c.node = d.doc_id) SELECT node, CAST(r AS BIGINT) AS rank_scaled FROM pr5"""
        ),
        "inverted_index": (
            r"WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') "
            "AS ws FROM documents WHERE trim(text) <> ''), "
            "t AS (SELECT DISTINCT doc_id, term FROM "
            "(SELECT doc_id, unnest(ws) AS term FROM w)) "
            "SELECT term, CAST(COUNT(*) AS BIGINT) AS df, "
            "string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) "
            "AS postings FROM t GROUP BY term HAVING COUNT(*) >= 2"
        ),
        "tfidf_topk": (
            r"WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') "
            "AS ws FROM documents WHERE trim(text) <> ''), "
            "t AS (SELECT doc_id, unnest(ws) AS term FROM w), "
            "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf "
            "FROM t GROUP BY 1, 2), "
            "dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df "
            "FROM tf GROUP BY 1), "
            "n AS (SELECT COUNT(*) AS nd FROM documents), "
            "scored AS (SELECT doc_id, term, tf, df, tf * "
            "CAST(round(ln(CAST(nd AS DOUBLE) / df) * 1000000) AS BIGINT) "
            "AS score_micro FROM tf JOIN dfq USING(term) CROSS JOIN n), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY score_micro DESC, term ASC) AS rn FROM scored) "
            "SELECT doc_id, term, tf, df, score_micro FROM r WHERE rn <= 3"
        ),
        "stratified_sample": (
            "WITH " + _splitmix64_cte_sql("doc_id", "documents",
                                          "doc_id, lang") + ", "
            "rates(lang, thr) AS (VALUES ('en', 250000), ('zh', 800000)) "
            "SELECT doc_id, s.lang FROM sm3 s LEFT JOIN rates r "
            "ON r.lang = s.lang "
            "WHERE x % 1000000 < COALESCE(r.thr, 1000000)"
        ),
        "area_interp": (
            f"WITH {_POLYS_CTE}, tgts AS (SELECT CAST(range AS BIGINT) AS tgt_id, CAST((range * 6211) % 330 - 175 AS BIGINT) AS txmin, CAST((range * 9973) % 140 - 80 AS BIGINT) AS tymin, CAST((range * 6211) % 330 - 175 + 8 + (range % 17) AS BIGINT) AS txmax, CAST((range * 9973) % 140 - 80 + 5 + (range % 11) AS BIGINT) AS tymax FROM range(200)), "
            "pairs AS (SELECT t.tgt_id, "
            "(100 + (p.poly_id * 37) % 1000) AS pop, "
            "CAST(p.xmax - p.xmin AS BIGINT) * CAST(p.ymax - p.ymin AS BIGINT) AS sarea, "
            "GREATEST(0, LEAST(CAST(p.xmax AS BIGINT), t.txmax) - GREATEST(CAST(p.xmin AS BIGINT), t.txmin)) * "
            "GREATEST(0, LEAST(CAST(p.ymax AS BIGINT), t.tymax) - GREATEST(CAST(p.ymin AS BIGINT), t.tymin)) AS iarea "
            "FROM tgts t JOIN polys p ON t.txmax >= p.xmin AND t.txmin <= p.xmax "
            "AND t.tymax >= p.ymin AND t.tymin <= p.ymax) "
            "SELECT tgt_id, CAST(COALESCE(SUM(pop * 1000000 * iarea // sarea), 0) AS BIGINT) "
            "AS est_scaled FROM tgts LEFT JOIN pairs USING(tgt_id) GROUP BY tgt_id"
        ),
        "zonal_stats": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE} "
            "SELECT poly_id, CAST(COUNT(*) AS BIGINT) AS n_points, "
            "CAST(SUM(CAST(round(lon * 1000000.0) AS BIGINT)) AS BIGINT) "
            "AS sum_lon_micro, "
            "CAST(SUM(CAST(round(lat * 1000000.0) AS BIGINT)) AS BIGINT) "
            "AS sum_lat_micro, "
            "CAST(MIN(doc_id) AS BIGINT) AS min_id, "
            "CAST(MAX(doc_id) AS BIGINT) AS max_id "
            f"FROM pts JOIN polys ON {join_cond} GROUP BY poly_id"
        ),
        "spatial_clusters": (
            f"WITH RECURSIVE {_PTS_CTE}, "
            "cpairs AS (SELECT a.doc_id AS a, b.doc_id AS b FROM pts a "
            "JOIN pts b ON a.doc_id < b.doc_id AND "
            "(a.lon-b.lon)*(a.lon-b.lon)+(a.lat-b.lat)*(a.lat-b.lat) "
            "<= 64.0), "
            "edges AS (SELECT a, b FROM cpairs UNION "
            "SELECT b, a FROM cpairs), "
            "reach(node, r) AS (SELECT doc_id AS node, doc_id AS r "
            "FROM pts UNION "
            "SELECT e.b, rr.r FROM edges e JOIN reach rr ON rr.node = e.a) "
            "SELECT node AS doc_id, MIN(r) AS cluster "
            "FROM reach GROUP BY node"
        ),
        "span_dedup": (
            r"WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') "
            "AS ws FROM documents), "
            "wi AS (SELECT doc_id, ws, "
            "unnest(generate_series(1, len(ws))) AS i FROM w), "
            "spans AS (SELECT doc_id, (i-1)//3 AS span_idx, "
            "string_agg(ws[i], ' ' ORDER BY i) AS span "
            "FROM wi GROUP BY doc_id, (i-1)//3), "
            "ranked AS (SELECT doc_id, span_idx, span, "
            "ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, span_idx) "
            "AS rn FROM spans), "
            "agg AS (SELECT doc_id, string_agg(span, ' ' ORDER BY span_idx) "
            "AS text FROM ranked WHERE rn = 1 GROUP BY doc_id), "
            "drops AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM ranked WHERE rn > 1 GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(a.text, '') AS text, "
            "COALESCE(dr.n, 0) AS n_spans_dropped "
            "FROM documents d LEFT JOIN agg a USING(doc_id) "
            "LEFT JOIN drops dr USING(doc_id)"
        ),
        "line_dedup": (
            r"WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') "
            "AS ws FROM documents), "
            "wi AS (SELECT doc_id, ws, "
            "unnest(generate_series(1, len(ws))) AS i FROM w), "
            "lines AS (SELECT doc_id, (i-1)//5 AS line_idx, "
            "string_agg(ws[i], ' ' ORDER BY i) AS line "
            "FROM wi GROUP BY doc_id, (i-1)//5), "
            "ranked AS (SELECT doc_id, line_idx, line, "
            "ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, line_idx) "
            "AS rn FROM lines), "
            "agg AS (SELECT doc_id, string_agg(line, chr(10) "
            "ORDER BY line_idx) AS text FROM ranked WHERE rn = 1 "
            "GROUP BY doc_id), "
            "drops AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM ranked WHERE rn > 1 GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(a.text, '') AS text, "
            "COALESCE(dr.n, 0) AS n_lines_dropped "
            "FROM documents d LEFT JOIN agg a USING(doc_id) "
            "LEFT JOIN drops dr USING(doc_id)"
        ),
        "user_event_windows": (
            "WITH e AS (SELECT event_id, ts, user_id, "
            "CAST(round(value * 100.0) AS BIGINT) AS cents FROM events) "
            "SELECT event_id, user_id, "
            "LAG(cents) OVER w AS prev_cents, "
            "LEAD(cents) OVER w AS next_cents, "
            "ROW_NUMBER() OVER w AS rn, "
            "CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents, "
            "RANK() OVER (PARTITION BY user_id ORDER BY ts) AS ts_rank "
            "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"
        ),
        "asof_prior_click": (
            "WITH err AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'error'), "
            "clk AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'click'), "
            "j AS (SELECT e.event_id, c.event_id AS cid, "
            "ROW_NUMBER() OVER (PARTITION BY e.event_id "
            "ORDER BY c.ts DESC, c.event_id DESC) AS rn "
            "FROM err e JOIN clk c ON c.user_id = e.user_id AND c.ts <= e.ts) "
            "SELECT event_id, cid AS event_id_right FROM j WHERE rn = 1"
        ),
        "range_join_views": (
            "WITH clk AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'click'), "
            "vw AS (SELECT user_id, ts, "
            "CAST(round(value * 100.0) AS BIGINT) AS cents FROM events "
            "WHERE event_type = 'view') "
            "SELECT c.event_id, COUNT(*) AS n_views, "
            "CAST(SUM(v.cents) AS BIGINT) AS sum_view_cents "
            "FROM clk c JOIN vw v ON v.user_id = c.user_id "
            "AND v.ts > c.ts AND v.ts <= c.ts + INTERVAL 6 HOUR "
            "GROUP BY c.event_id"
        ),
        "asof_salted": (
            "WITH err AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'error'), "
            "clk AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'click'), "
            "j AS (SELECT e.event_id, c.event_id AS cid, "
            "ROW_NUMBER() OVER (PARTITION BY e.event_id "
            "ORDER BY c.ts DESC, c.event_id DESC) AS rn "
            "FROM err e JOIN clk c ON c.user_id = e.user_id AND c.ts <= e.ts) "
            "SELECT event_id, cid AS event_id_right FROM j WHERE rn = 1"
        ),
        "events_streaming": (
            "WITH o AS (SELECT user_id % 8 AS part, event_id, epoch_us(ts) AS tus, "
            "CAST(round(value * 100.0) AS BIGINT) AS cents FROM events), "
            "w AS (SELECT part, tus, cents, MAX(tus) OVER (PARTITION BY part "
            "ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "AS prior_max FROM o), "
            "k AS (SELECT part, tus, cents FROM w "
            "WHERE prior_max IS NULL OR tus >= prior_max - 600000000) "
            "SELECT part, make_timestamp((tus // 3600000000) * 3600000000) "
            "AS window_start, COUNT(*) AS n_events, "
            "CAST(SUM(cents) AS BIGINT) AS sum_value "
            "FROM k GROUP BY 1, 2"
        ),
        "stream_stream_join": (
            "WITH lw AS (SELECT user_id % 8 AS part, user_id, event_id, "
            "epoch_us(ts) AS t, MAX(epoch_us(ts)) OVER (PARTITION BY "
            "user_id % 8 ORDER BY event_id ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING) AS pm FROM events "
            "WHERE event_type = 'purchase'), "
            "lk AS (SELECT * FROM lw WHERE pm IS NULL OR t >= pm - 600000000), "
            "rw AS (SELECT user_id % 8 AS part, user_id, event_id, "
            "epoch_us(ts) AS t, MAX(epoch_us(ts)) OVER (PARTITION BY "
            "user_id % 8 ORDER BY event_id ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING) AS pm FROM events "
            "WHERE event_type = 'click'), "
            "rk AS (SELECT * FROM rw WHERE pm IS NULL OR t >= pm - 600000000) "
            "SELECT lk.part AS part, lk.user_id AS key, "
            "lk.event_id AS l_id, rk.event_id AS r_id, "
            "lk.t AS l_ts, rk.t AS r_ts "
            "FROM lk JOIN rk ON lk.user_id = rk.user_id "
            "AND rk.t BETWEEN lk.t - 1800000000 AND lk.t + 300000000"
        ),
"stream_stream_join_salted": (
            "WITH lw AS (SELECT user_id % 8 AS part, user_id, event_id, "
            "epoch_us(ts) AS t, MAX(epoch_us(ts)) OVER (PARTITION BY "
            "user_id % 8 ORDER BY event_id ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING) AS pm FROM events "
            "WHERE event_type = 'purchase'), "
            "lk AS (SELECT * FROM lw WHERE pm IS NULL OR t >= pm - 600000000), "
            "rw AS (SELECT user_id % 8 AS part, user_id, event_id, "
            "epoch_us(ts) AS t, MAX(epoch_us(ts)) OVER (PARTITION BY "
            "user_id % 8 ORDER BY event_id ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING) AS pm FROM events "
            "WHERE event_type = 'click'), "
            "rk AS (SELECT * FROM rw WHERE pm IS NULL OR t >= pm - 600000000) "
            "SELECT lk.part AS part, lk.user_id AS key, "
            "lk.event_id AS l_id, rk.event_id AS r_id, "
            "lk.t AS l_ts, rk.t AS r_ts "
            "FROM lk JOIN rk ON lk.user_id = rk.user_id "
            "AND rk.t BETWEEN lk.t - 1800000000 AND lk.t + 300000000"
        ),
        "sessions": (
            "WITH l AS (SELECT user_id, ts, event_id, "
            "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts "
            "FROM events), "
            "b AS (SELECT *, CASE WHEN pts IS NULL OR "
            "epoch_us(ts) - epoch_us(pts) > 1800000000 THEN 1 ELSE 0 END AS brk FROM l), "
            "s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM b) "
            "SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, "
            "COUNT(*) AS n_events FROM s GROUP BY user_id, sid"
        ),
        "sessions_salted": (
            "WITH l AS (SELECT user_id, ts, event_id, "
            "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts "
            "FROM events), "
            "b AS (SELECT *, CASE WHEN pts IS NULL OR "
            "epoch_us(ts) - epoch_us(pts) > 1800000000 THEN 1 ELSE 0 END AS brk FROM l), "
            "s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM b) "
            "SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end, "
            "COUNT(*) AS n_events FROM s GROUP BY user_id, sid"
        ),
        "poly_area_perimeter": (
            f"WITH {_POLYS_CTE} "
            "SELECT poly_id, (xmax - xmin) * (ymax - ymin) AS area, "
            "2 * ((xmax - xmin) + (ymax - ymin)) AS perimeter FROM polys"
        ),
        "knn_join": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE}, "
            "d AS (SELECT doc_id, poly_id, "
            "GREATEST(xmin - lon, lon - xmax, 0) * GREATEST(xmin - lon, lon - xmax, 0) "
            "+ GREATEST(ymin - lat, lat - ymax, 0) * GREATEST(ymin - lat, lat - ymax, 0) AS d2 "
            "FROM pts CROSS JOIN polys), "
            "r AS (SELECT doc_id, poly_id, ROW_NUMBER() OVER "
            "(PARTITION BY doc_id ORDER BY d2, poly_id) AS rank FROM d) "
            "SELECT doc_id, poly_id, rank FROM r WHERE rank <= 3"
        ),
        "nearest_poly": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE}, "
            "d AS (SELECT doc_id, poly_id, "
            "GREATEST(xmin - lon, lon - xmax, 0) * GREATEST(xmin - lon, lon - xmax, 0) "
            "+ GREATEST(ymin - lat, lat - ymax, 0) * GREATEST(ymin - lat, lat - ymax, 0) AS d2 "
            "FROM pts CROSS JOIN polys), "
            "r AS (SELECT doc_id, poly_id, ROW_NUMBER() OVER "
            "(PARTITION BY doc_id ORDER BY d2, poly_id) AS rank FROM d) "
            "SELECT doc_id, poly_id FROM r WHERE rank = 1"
        ),
        # training-data ops.  Even the hash-family ops get exact SQL
        # oracles where the hash is corpus-reproducible: fingerprints
        # (rolling hash recurrence), simhash_pairs (FNV-1a per token +
        # bit-majority + pairwise bit_count below), minhash_candidates
        # (FNV shingle hash + splitmix64 permutations).  Only the
        # model/random-projection family (srp, ivf, lang_id) stays
        # rows-only + pytest-verified.
        # simhash: FNV-1a(token) reproduced in HUGEINT (the multiply
        # fits: h < 2^64, prime ~ 2^40 => product < 2^104 < 2^127),
        # count-weighted bit majority (strict 2*ones > n rule as in
        # dedup.simhash_batch), pairwise hamming via bit_count(xor).
        "minhash_candidates": _minhash_oracle_sql(),
        "simhash_pairs": (
            r"WITH RECURSIVE "
            r"toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w FROM documents), "
            "t AS (SELECT doc_id, w FROM toks WHERE w <> ''), "
            "tc AS (SELECT doc_id, w, COUNT(*) AS c FROM t GROUP BY doc_id, w), "
            "words AS (SELECT DISTINCT w FROM tc), "
            "f(w, pos, h) AS ("
            "SELECT w, 1, CAST(14695981039346656037 AS HUGEINT) FROM words "
            "UNION ALL "
            "SELECT f.w, f.pos + 1, "
            "(xor(f.h, CAST(ord(substr(f.w, f.pos, 1)) AS HUGEINT)) "
            "* CAST(1099511628211 AS HUGEINT)) % CAST(18446744073709551616 AS HUGEINT) "
            "FROM f WHERE f.pos <= length(f.w)), "
            "wh AS (SELECT w, h FROM f WHERE pos = length(w) + 1), "
            "pw(bit, p) AS (SELECT 0, CAST(1 AS HUGEINT) "
            "UNION ALL SELECT bit + 1, p * 2 FROM pw WHERE bit < 63), "
            "simb AS (SELECT tc.doc_id, b.bit, b.p, "
            "CASE WHEN 2 * SUM(tc.c * CAST((wh.h // b.p) % 2 AS HUGEINT)) "
            "> SUM(tc.c) THEN 1 ELSE 0 END AS sbit "
            "FROM tc JOIN wh USING (w) CROSS JOIN pw b "
            "GROUP BY tc.doc_id, b.bit, b.p), "
            "sim0 AS (SELECT doc_id, SUM(p * sbit) AS sh FROM simb GROUP BY doc_id), "
            "sim AS (SELECT d.doc_id, "
            "CAST(CASE WHEN COALESCE(s.sh, CAST(0 AS HUGEINT)) "
            "< CAST(9223372036854775808 AS HUGEINT) "
            "THEN COALESCE(s.sh, CAST(0 AS HUGEINT)) "
            "ELSE COALESCE(s.sh, CAST(0 AS HUGEINT)) "
            "- CAST(18446744073709551616 AS HUGEINT) END AS BIGINT) AS sh "
            "FROM documents d LEFT JOIN sim0 s USING (doc_id)) "
            "SELECT a.doc_id AS a, b.doc_id AS b, "
            "CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming "
            "FROM sim a JOIN sim b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.sh, b.sh)) <= 3"
        ),
        "exact_dedup": (
            "SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies "
            "FROM documents GROUP BY text"
        ),
        "weighted_sample": (
            "SELECT doc_id, n_chars, "
            "CAST(FLOOR(1000000 * POW("
            "((doc_id * 2654435761 + 12345) % 4294967296 + 1) "
            "/ 4294967297.0, 1.0 / n_chars)) AS BIGINT) AS key_micro "
            "FROM documents WHERE n_chars > 0 "
            "ORDER BY key_micro DESC, doc_id LIMIT 100"
        ),
        "lineitem_group_attach": (
            "SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, "
            "CAST(COUNT(*) OVER w AS BIGINT) AS group_n, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "OVER w AS BIGINT) AS group_cents "
            "FROM lineitem "
            "WINDOW w AS (PARTITION BY l_returnflag, l_linestatus)"
        ),
        "orders_rollup": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_v, CAST(COUNT(*) AS BIGINT) AS n_rows "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "retention": (
            "WITH wk AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 604800000000 AS week FROM events), "
            "first AS (SELECT user_id, MIN(week) AS cohort_week "
            "FROM wk GROUP BY user_id) "
            "SELECT f.cohort_week, w.week - f.cohort_week AS week_offset, "
            "CAST(COUNT(*) AS BIGINT) AS n_users "
            "FROM wk w JOIN first f ON f.user_id = w.user_id "
            "GROUP BY f.cohort_week, w.week - f.cohort_week"
        ),
        "points_uncovered": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE} "
            "SELECT doc_id FROM pts WHERE NOT EXISTS "
            "(SELECT 1 FROM polys WHERE lon >= xmin AND lon <= xmax "
            "AND lat >= ymin AND lat <= ymax)"
        ),
        "url_dedup": (
            f"WITH {_PTS_CTE}, "
            "m AS (SELECT doc_id, "
            "'https://site-' || CAST((doc_id // 2) % 97 AS VARCHAR) "
            "|| '.example.com/page/' || CAST(doc_id // 2 AS VARCHAR) AS b, "
            "doc_id % 4 AS v FROM pts), "
            "mu AS (SELECT doc_id, CASE v "
            "WHEN 0 THEN regexp_replace(b, '^https', 'HTTPS') "
            r"WHEN 1 THEN regexp_replace(b, '^(https://[^/]*)/', '\1:443/') "
            "WHEN 2 THEN b || '?utm_source=x' "
            "ELSE b || '/' END AS url FROM m), "
            r"c0 AS (SELECT doc_id, regexp_replace(url, '[#?].*$', '') AS u FROM mu), "
            r"c1 AS (SELECT doc_id, regexp_replace(u, "
            r"'(?i)^(https?://[^/:]*):(?:80|443)(/|$)', '\1\2') AS u FROM c0), "
            r"c2 AS (SELECT doc_id, "
            r"lower(regexp_extract(u, '(?i)^(https?://[^/]*)', 1)) || "
            r"regexp_replace(regexp_replace(u, '(?i)^https?://[^/]*', ''), "
            r"'/$', '') AS canon_url FROM c1) "
            "SELECT MIN(doc_id) AS doc_id, canon_url FROM c2 "
            "GROUP BY canon_url"
        ),
        "curation_pipeline": (
            r"WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws "
            "FROM documents), "
            "idx AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 3)) AS i FROM w), "
            "ng AS (SELECT DISTINCT doc_id, "
            "ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS g FROM idx), "
            "bench AS (SELECT DISTINCT g FROM ng WHERE doc_id % 23 = 0), "
            "hits AS (SELECT DISTINCT n.doc_id FROM ng n JOIN bench b ON n.g = b.g "
            "WHERE n.doc_id % 23 <> 0), "
            "clean AS (SELECT d.doc_id, d.text FROM documents d "
            "WHERE d.doc_id % 23 <> 0 "
            "AND d.doc_id NOT IN (SELECT doc_id FROM hits)), "
            "kept AS (SELECT MIN(doc_id) AS doc_id FROM clean "
            r"WHERE (CASE WHEN length(trim(text)) = 0 THEN 0 "
            r"ELSE len(string_split_regex(trim(text), '\s+')) END) BETWEEN 20 AND 400 "
            r"AND (CASE WHEN length(trim(text)) = 0 THEN 0 "
            r"ELSE len(list_distinct(string_split_regex(trim(text), '\s+'))) END) >= 10 "
            "GROUP BY text), "
            "capped AS (SELECT doc_id, ROW_NUMBER() OVER "
            "(PARTITION BY doc_id % 97 ORDER BY doc_id) AS rn FROM kept) "
            "SELECT doc_id FROM capped WHERE rn <= 4"
        ),
        "dataset_split": (
            "WITH " + _splitmix64_cte_sql("doc_id", "documents", "doc_id")
            + " SELECT doc_id, CASE WHEN x % 1000000 < 50000 THEN 'val' "
            "WHEN x % 1000000 < 100000 THEN 'test' ELSE 'train' END "
            "AS split FROM sm3"
        ),
        "doc_chunks": (
            r"WITH w AS (SELECT doc_id, ws, "
            r"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(ws) END AS n "
            r"FROM (SELECT doc_id, text, "
            r"string_split_regex(trim(text), '\s+') AS ws FROM documents)), "
            "c AS (SELECT doc_id, ws, n, unnest(generate_series(0, "
            "CASE WHEN n > 64 THEN (n - 17) // 48 ELSE 0 END)) AS chunk_id "
            "FROM w WHERE n > 0) "
            "SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, "
            "CAST(LEAST(chunk_id * 48 + 64, n) - chunk_id * 48 AS BIGINT) "
            "AS n_tokens, "
            "array_to_string(ws[chunk_id * 48 + 1 : "
            "LEAST(chunk_id * 48 + 64, n)], ' ') AS chunk "
            "FROM c"
        ),
        "snapshot_diff": (
            "WITH old AS (SELECT doc_id, text FROM documents "
            "WHERE doc_id % 5 <> 0), "
            "new AS (SELECT doc_id, "
            "CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END "
            "AS text FROM documents WHERE doc_id % 7 <> 0) "
            "SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, "
            "CASE WHEN o.doc_id IS NULL THEN 'added' "
            "WHEN n.doc_id IS NULL THEN 'removed' "
            "WHEN o.text = n.text THEN 'same' ELSE 'changed' END AS status "
            "FROM old o FULL OUTER JOIN new n ON n.doc_id = o.doc_id"
        ),
        "exact_dedup_normalized": (
            r"SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies "
            r"FROM documents "
            r"GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
        ),
        "token_counts": (
            r"SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN 0 "
            r"ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens "
            "FROM documents"
        ),
        "text_stats": (
            r"SELECT doc_id, length(text) AS n_chars, "
            r"CASE WHEN length(trim(text)) = 0 THEN 0 "
            r"ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens, "
            r"CASE WHEN length(trim(text)) = 0 THEN 0 "
            r"ELSE len(list_distinct(string_split_regex(trim(text), '\s+'))) END AS n_uniq_tokens, "
            "length(text) - length(replace(text, ' ', '')) AS n_spaces "
            "FROM documents"
        ),
        "orders_by_segment": (
            "SELECT c.c_mktsegment, COUNT(*) AS n_orders, "
            "CAST(SUM(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) "
            "AS sum_price_cents "
            "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
            "GROUP BY c.c_mktsegment"
        ),
        "canonical_docs": (
            "WITH RECURSIVE " + _NGRAM_PAIRS_CTE + ", "
            "edges AS (SELECT a, b FROM pairsq UNION SELECT b, a FROM pairsq), "
            "reach(node, r) AS ("
            "SELECT a AS node, a AS r FROM edges "
            "UNION "
            "SELECT e.a, rr.r FROM edges e JOIN reach rr ON rr.node = e.b), "
            "grp AS (SELECT node, MIN(r) AS rep FROM reach GROUP BY node) "
            "SELECT d.doc_id, d.n_chars FROM documents d "
            "LEFT JOIN grp g ON g.node = d.doc_id "
            "WHERE g.rep IS NULL OR g.rep = d.doc_id"
        ),
        "repetition_stats": (
            r"WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS w, "
            r"generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS ord "
            "FROM documents), "
            "t AS (SELECT * FROM toks WHERE w <> ''), "
            "wc AS (SELECT doc_id, w, COUNT(*) AS c FROM t GROUP BY doc_id, w), "
            "ws AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words, "
            "CAST(COUNT(*) AS BIGINT) AS n_uniq_words, "
            "CAST(MAX(c) AS BIGINT) AS top_word_n FROM wc GROUP BY doc_id), "
            "bg AS (SELECT doc_id, w || ' ' || lead(w) OVER "
            "(PARTITION BY doc_id ORDER BY ord) AS g FROM t), "
            "bs AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_n FROM "
            "(SELECT doc_id, g, COUNT(*) AS c FROM bg WHERE g IS NOT NULL "
            "GROUP BY doc_id, g) GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(ws.n_words, 0) AS n_words, "
            "COALESCE(ws.n_uniq_words, 0) AS n_uniq_words, "
            "COALESCE(ws.top_word_n, 0) AS top_word_n, "
            "COALESCE(bs.top_bigram_n, 0) AS top_bigram_n, "
            "CAST(COALESCE(ws.n_words, 0) >= 20 "
            "AND COALESCE(ws.top_word_n, 0) * 8 <= COALESCE(ws.n_words, 0) "
            "AND COALESCE(ws.n_uniq_words, 0) * 5 >= COALESCE(ws.n_words, 0) * 2 "
            "AS BIGINT) AS keep "
            "FROM documents d LEFT JOIN ws ON ws.doc_id = d.doc_id "
            "LEFT JOIN bs ON bs.doc_id = d.doc_id"
        ),
        "ngram_dup_pairs": (
            "WITH " + _NGRAM_PAIRS_CTE + ", "
            "withcnt AS (SELECT p.a, p.b, i.inter FROM pairsq p "
            "JOIN inter i ON i.a = p.a AND i.b = p.b) "
            "SELECT a, b, inter FROM withcnt"
        ),
        "poly_union_area": (
            f"WITH {_POLYS_CTE}, "
            "xs AS (SELECT DISTINCT x FROM (SELECT xmin AS x FROM polys UNION SELECT xmax FROM polys)), "
            "ys AS (SELECT DISTINCT y FROM (SELECT ymin AS y FROM polys UNION SELECT ymax FROM polys)), "
            "xi AS (SELECT x, LEAD(x) OVER (ORDER BY x) AS x2 FROM xs), "
            "yi AS (SELECT y, LEAD(y) OVER (ORDER BY y) AS y2 FROM ys), "
            "cells AS (SELECT x, x2, y, y2 FROM xi, yi WHERE x2 IS NOT NULL AND y2 IS NOT NULL), "
            "covered AS (SELECT c.x, c.x2, c.y, c.y2 FROM cells c WHERE EXISTS "
            "(SELECT 1 FROM polys p WHERE p.xmin <= c.x AND p.xmax >= c.x2 "
            "AND p.ymin <= c.y AND p.ymax >= c.y2)) "
            "SELECT SUM((x2 - x) * (y2 - y)) AS union_area FROM covered"
        ),
        "pmi_collocations": (
            r"WITH toks AS (SELECT doc_id, "
            r"unnest(string_split_regex(trim(text), '\s+')) AS w, "
            r"generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS ord "
            "FROM documents), "
            "t AS (SELECT * FROM toks WHERE w <> ''), "
            "uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY w), "
            "n1 AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni), "
            "bg AS (SELECT doc_id, w AS w1, "
            "lead(w) OVER (PARTITION BY doc_id ORDER BY ord) AS w2 FROM t), "
            "bgn AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL), "
            "n12 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM bgn), "
            "bgc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 "
            "FROM bgn GROUP BY w1, w2 HAVING COUNT(*) >= 5), "
            "scored AS (SELECT b.w1, b.w2, b.c12, "
            "CAST(round(ln((b.c12 * n1.n * n1.n) / (n12.n * u1.c * u2.c)) "
            "* 1000000) AS BIGINT) AS pmi_micro "
            "FROM bgc b JOIN uni u1 ON u1.w = b.w1 "
            "JOIN uni u2 ON u2.w = b.w2 CROSS JOIN n1 CROSS JOIN n12) "
            "SELECT w1, w2, c12, pmi_micro FROM scored "
            "ORDER BY pmi_micro DESC, w1, w2 LIMIT 25"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_price_cents, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS sum_disc_price_e4, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows "
            "FROM lineitem WHERE l_shipdate <= DATE '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "orders_by_region": (
            "SELECT r.r_name, CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_price_cents "
            "FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey "
            "JOIN region r ON r.r_regionkey = n.n_regionkey "
            "GROUP BY r.r_name"
        ),
        "rolling_user_median": (
            "SELECT event_id, user_id, "
            "CAST(round(2 * median(CAST(round(value * 100) AS BIGINT)) "
            "OVER w) AS BIGINT) AS med2, "
            "CAST(COUNT(*) OVER w AS BIGINT) AS n_w "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)"
        ),
        "rolling_user_value": (
            "SELECT event_id, user_id, "
            "CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) "
            "AS sum_w, "
            "CAST(COUNT(*) OVER w AS BIGINT) AS n_w "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ),
        "rolling_user_value_salted": (
            "SELECT event_id, user_id, "
            "CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) "
            "AS sum_w, "
            "CAST(COUNT(*) OVER w AS BIGINT) AS n_w "
            "FROM events "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
        ),
        "vocab": (
            r"WITH t AS (SELECT unnest(string_split_regex(trim(text), '\s+')) "
            "AS term FROM documents), "
            "c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM t "
            "WHERE term <> '' GROUP BY term HAVING COUNT(*) >= 3) "
            "SELECT term, cnt, "
            "CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term) - 1 AS BIGINT) "
            "AS token_id FROM c"
        ),
        "zonal_majority": (
            f"WITH {_PTS_CTE}, {_POLYS_CTE}, "
            "cnt AS (SELECT poly_id, d.lang, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM pts JOIN polys ON lon >= xmin AND lon <= xmax "
            "AND lat >= ymin AND lat <= ymax "
            "JOIN documents d ON d.doc_id = pts.doc_id "
            "GROUP BY poly_id, d.lang), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY poly_id "
            "ORDER BY n DESC, lang) AS rn FROM cnt) "
            "SELECT poly_id, lang, n FROM r WHERE rn = 1"
        ),
        "funnel": (
            "WITH u AS (SELECT DISTINCT user_id FROM events), "
            "s0 AS (SELECT user_id, MIN(ts) AS t FROM events "
            "WHERE event_type = 'signup' GROUP BY user_id), "
            "s1 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            "JOIN s0 ON s0.user_id = e.user_id AND e.ts > s0.t "
            "WHERE e.event_type = 'click' GROUP BY e.user_id), "
            "s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            "JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t "
            "WHERE e.event_type = 'purchase' GROUP BY e.user_id) "
            "SELECT u.user_id, "
            "CAST(CAST(s0.user_id IS NOT NULL AS INT) "
            "+ CAST(s1.user_id IS NOT NULL AS INT) "
            "+ CAST(s2.user_id IS NOT NULL AS INT) AS BIGINT) "
            "AS steps_completed, "
            "COALESCE(CAST(epoch_us(s0.t) AS BIGINT), -1) AS t0, "
            "COALESCE(CAST(epoch_us(s1.t) AS BIGINT), -1) AS t1, "
            "COALESCE(CAST(epoch_us(s2.t) AS BIGINT), -1) AS t2 "
            "FROM u LEFT JOIN s0 ON s0.user_id = u.user_id "
            "LEFT JOIN s1 ON s1.user_id = u.user_id "
            "LEFT JOIN s2 ON s2.user_id = u.user_id"
        ),
        "emb_int8": (
            "WITH e AS (SELECT vec_id, unnest(embedding) AS x, "
            "generate_subscripts(embedding, 1) - 1 AS dim FROM embeddings), "
            "xq AS (SELECT vec_id, CAST(dim AS BIGINT) AS dim, "
            "CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS v FROM e), "
            "mm AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM xq GROUP BY dim) "
            "SELECT xq.vec_id, xq.dim, "
            "CAST(CASE WHEN mm.mx = mm.mn THEN 0 "
            "ELSE (xq.v - mm.mn) * 255 // (mm.mx - mm.mn) END AS BIGINT) AS q "
            "FROM xq JOIN mm ON mm.dim = xq.dim"
        ),
        "global_rank": (
            "SELECT doc_id, n_chars, "
            "CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS BIGINT) "
            "AS rank FROM documents"
        ),
        "incremental_dedup": (
            "WITH shard AS (SELECT doc_id, text FROM documents "
            "WHERE doc_id % 3 = 0), "
            "old AS (SELECT DISTINCT text FROM documents WHERE doc_id % 3 <> 0), "
            "dedup AS (SELECT MIN(doc_id) AS doc_id, text FROM shard "
            "GROUP BY text) "
            "SELECT d.doc_id FROM dedup d "
            "LEFT JOIN old o ON o.text = d.text WHERE o.text IS NULL"
        ),
        "host_capped_docs": (
            "WITH h AS (SELECT 'site-' || CAST(doc_id % 97 AS VARCHAR) "
            "|| '.example.com' AS host, doc_id, "
            "ROW_NUMBER() OVER (PARTITION BY doc_id % 97 ORDER BY doc_id) "
            "AS rn FROM documents) "
            "SELECT host, doc_id FROM h WHERE rn <= 4"
        ),
        "lm_scores": (
            r"WITH toks AS (SELECT doc_id, "
            r"unnest(string_split_regex(trim(text), '\s+')) AS w, "
            r"generate_subscripts(string_split_regex(trim(text), '\s+'), 1) AS ord "
            "FROM documents), "
            "t AS (SELECT * FROM toks WHERE w <> ''), "
            "uni AS (SELECT w, COUNT(*) AS c1 FROM t GROUP BY w), "
            "v AS (SELECT COUNT(*) AS v FROM uni), "
            "bg AS (SELECT doc_id, w AS w1, "
            "lead(w) OVER (PARTITION BY doc_id ORDER BY ord) AS w2 FROM t), "
            "bgn AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL), "
            "bgc AS (SELECT w1, w2, COUNT(*) AS c12 FROM bgn GROUP BY w1, w2), "
            "terms AS (SELECT n.doc_id, "
            "CAST(round(ln((c.c12 + 1.0) / (u.c1 + v.v)) * 1000000) AS BIGINT) AS s "
            "FROM bgn n JOIN bgc c ON c.w1 = n.w1 AND c.w2 = n.w2 "
            "JOIN uni u ON u.w = n.w1 CROSS JOIN v), "
            "agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, "
            "CAST(SUM(s) AS BIGINT) AS lm_score_micro FROM terms GROUP BY doc_id) "
            "SELECT d.doc_id, COALESCE(a.n_bigrams, 0) AS n_bigrams, "
            "COALESCE(a.lm_score_micro, 0) AS lm_score_micro "
            "FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id"
        ),
        "packed_sequences": (
            r"WITH RECURSIVE t AS (SELECT doc_id, lang, doc_id // 64 AS win, "
            r"CAST(CASE WHEN length(trim(text)) = 0 THEN 0 "
            r"ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) "
            "AS n_tokens FROM documents), "
            "ord AS (SELECT *, ROW_NUMBER() OVER "
            "(PARTITION BY lang, win ORDER BY doc_id) AS rn FROM t), "
            "st AS ("
            "SELECT lang, win, rn, doc_id, n_tokens, "
            "CAST(0 AS BIGINT) AS bin, n_tokens AS run FROM ord WHERE rn = 1 "
            "UNION ALL "
            "SELECT o.lang, o.win, o.rn, o.doc_id, o.n_tokens, "
            "CASE WHEN s.run + o.n_tokens > 256 THEN s.bin + 1 ELSE s.bin END, "
            "CASE WHEN s.run + o.n_tokens > 256 THEN o.n_tokens "
            "ELSE s.run + o.n_tokens END "
            "FROM ord o JOIN st s ON s.lang = o.lang AND s.win = o.win "
            "AND o.rn = s.rn + 1) "
            "SELECT doc_id, lang, win, bin, n_tokens FROM st"
        ),
        "decontaminated_docs": (
            r"WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws "
            "FROM documents), "
            "idx AS (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 3)) AS i FROM w), "
            "ng AS (SELECT DISTINCT doc_id, "
            "ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS g FROM idx), "
            "bench AS (SELECT DISTINCT g FROM ng WHERE doc_id % 23 = 0), "
            "hits AS (SELECT DISTINCT n.doc_id FROM ng n JOIN bench b ON n.g = b.g "
            "WHERE n.doc_id % 23 <> 0) "
            "SELECT d.doc_id, d.n_chars FROM documents d "
            "WHERE d.doc_id % 23 <> 0 "
            "AND d.doc_id NOT IN (SELECT doc_id FROM hits)"
        ),
        "curated_docs": (
            r"SELECT MIN(doc_id) AS doc_id FROM documents "
            r"WHERE (CASE WHEN length(trim(text)) = 0 THEN 0 "
            r"ELSE len(string_split_regex(trim(text), '\s+')) END) BETWEEN 20 AND 400 "
            r"AND (CASE WHEN length(trim(text)) = 0 THEN 0 "
            r"ELSE len(list_distinct(string_split_regex(trim(text), '\s+'))) END) >= 10 "
            "GROUP BY text"
        ),
        "emb_dup_pairs": (
            "SELECT a.vec_id AS a, b.vec_id AS b "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4"
        ),
        "ann_topk": (
            "WITH q AS (SELECT * FROM embeddings WHERE vec_id % 100 = 0), "
            "s AS (SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) AS sim "
            "FROM q JOIN embeddings e ON e.vec_id <> q.vec_id), "
            "r AS (SELECT query_id, neighbor_id, ROW_NUMBER() OVER "
            "(PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank FROM s) "
            "SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 5"
        ),
        "top_terms": (
            r"SELECT term, COUNT(*)::BIGINT AS cnt FROM ("
            r"SELECT unnest(string_split_regex(trim(text), '\s+')) AS term "
            r"FROM documents) WHERE term <> '' "
            r"GROUP BY term ORDER BY cnt DESC, term ASC LIMIT 25"
        ),
        "heavy_hitters": (
            r"SELECT term, COUNT(*)::BIGINT AS cnt FROM ("
            r"SELECT unnest(string_split_regex(trim(text), '\s+')) AS term "
            r"FROM documents) WHERE term <> '' "
            r"GROUP BY term ORDER BY cnt DESC, term ASC LIMIT 25"
        ),
        "customer_orders_left": (
            "SELECT c_custkey AS custkey, "
            "COALESCE(o_orderkey, -1) AS o_orderkey "
            "FROM customer LEFT JOIN orders ON o_custkey = c_custkey"
        ),
        "customer_orders_full": (
            "WITH oc AS (SELECT o_custkey AS custkey, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1), "
            "cu AS (SELECT c_custkey AS custkey, CAST(1 AS BIGINT) AS is_cust "
            "FROM customer WHERE c_custkey % 2 = 0) "
            "SELECT COALESCE(oc.custkey, cu.custkey) AS custkey, "
            "COALESCE(oc.n_orders, 0) AS n_orders, "
            "COALESCE(cu.is_cust, 0) AS is_cust "
            "FROM oc FULL OUTER JOIN cu ON cu.custkey = oc.custkey"
        ),
        "docs_quality_band": (
            "WITH n AS (SELECT COUNT(*) AS c FROM documents), "
            "r AS (SELECT n_chars, ROW_NUMBER() OVER (ORDER BY n_chars) "
            "AS rn FROM documents), "
            "t AS (SELECT "
            "(SELECT n_chars FROM r JOIN n ON true "
            "WHERE rn = (10 * c + 99) // 100) AS lo, "
            "(SELECT n_chars FROM r JOIN n ON true "
            "WHERE rn = (90 * c + 99) // 100) AS hi) "
            "SELECT doc_id, n_chars FROM documents, t "
            "WHERE n_chars BETWEEN t.lo AND t.hi"
        ),
        "top_unshipped_orders": (
            "WITH l AS (SELECT l_orderkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev "
            "FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01'), "
            "o AS (SELECT o_orderkey, "
            "strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, "
            "o_orderpriority FROM orders JOIN customer "
            "ON c_custkey = o_custkey "
            "WHERE o_orderdate < TIMESTAMP '1998-06-01' "
            "AND c_mktsegment = 'BUILDING') "
            "SELECT o.o_orderkey, CAST(SUM(l.rev) AS BIGINT) AS revenue_e4, "
            "o.o_orderdate, o.o_orderpriority "
            "FROM l JOIN o ON l.l_orderkey = o.o_orderkey "
            "GROUP BY 1, 3, 4 "
            "ORDER BY revenue_e4 DESC, o_orderdate, o_orderkey LIMIT 10"
        ),
        "promo_revenue": (
            "SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev "
            "ELSE 0 END) AS BIGINT) AS promo_revenue_e4, "
            "CAST(SUM(rev) AS BIGINT) AS total_revenue_e4 "
            "FROM (SELECT l_partkey, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01' "
            "AND l_shipdate < TIMESTAMP '1999-01-01') l "
            "JOIN part ON p_partkey = l_partkey"
        ),
        "bm25_topk": (
            r"WITH w AS (SELECT doc_id, string_split_regex(trim(text), "
            r"'\s+') AS ws FROM documents WHERE trim(text) <> ''), "
            "t AS (SELECT doc_id, unnest(ws) AS term FROM w), "
            "dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl "
            "FROM t GROUP BY 1), "
            "stats AS (SELECT (SELECT COUNT(*) FROM documents) AS n, "
            "(SELECT COALESCE(SUM(dl), 0) FROM dl) AS tt), "
            "q(term) AS (VALUES ('join'), ('hash'), ('merge'), "
            "('sort'), ('window')), "
            "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf "
            "FROM t JOIN q USING(term) GROUP BY 1, 2), "
            "dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df "
            "FROM tf GROUP BY 1), "
            "idf AS (SELECT term, CAST(round(ln((n - df + 0.5) / "
            "(df + 0.5) + 1.0) * 1000000) AS BIGINT) AS idf_micro "
            "FROM dfq CROSS JOIN stats), "
            "contrib AS (SELECT tf.doc_id, idf.idf_micro * "
            "((tf.tf * 22000 * s.tt) // "
            "(10 * s.tt * tf.tf + 3 * s.tt + 9 * d.dl * s.n)) AS c "
            "FROM tf JOIN idf USING(term) JOIN dl d USING(doc_id) "
            "CROSS JOIN stats s) "
            "SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score_scaled "
            "FROM contrib GROUP BY 1 "
            "ORDER BY score_scaled DESC, doc_id LIMIT 20"
        ),
        "user_value_resampled": (
            f"WITH g AS (SELECT u.user_id, r.range AS grid_us "
            "FROM (SELECT DISTINCT user_id FROM events) u "
            f"CROSS JOIN range({_GRID_START_US}, {_GRID_END_US}, "
            f"{_GRID_STEP_US}) r), "
            "e AS (SELECT user_id, epoch_us(ts) AS us, event_id, "
            "CAST(round(value * 100) AS BIGINT) AS value_cents "
            "FROM events), "
            "sel AS (SELECT g.user_id, g.grid_us, e.event_id, "
            "e.value_cents, ROW_NUMBER() OVER (PARTITION BY g.user_id, "
            "g.grid_us ORDER BY e.us DESC, e.event_id DESC) AS rn "
            "FROM g LEFT JOIN e ON e.user_id = g.user_id "
            "AND e.us <= g.grid_us) "
            "SELECT user_id, grid_us, "
            "COALESCE(event_id, -1) AS event_id, "
            "COALESCE(value_cents, -1) AS value_cents "
            "FROM sel WHERE rn = 1"
        ),
        "latest_order_per_customer": (
            "SELECT o_custkey, o_orderkey, o_orderdate, total_cents "
            "FROM (SELECT o_custkey, o_orderkey, "
            "strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents, "
            "ROW_NUMBER() OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn "
            "FROM orders) WHERE rn = 1"
        ),
        "events_pivot_daily": (
            "SELECT strftime(ts, '%Y-%m-%d') AS day, "
            "CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_click, "
            "CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_error, "
            "CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_purchase, "
            "CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_signup, "
            "CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_view "
            "FROM events GROUP BY 1"
        ),
        "rolling_distinct_users": (
            "WITH e AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 86400000000 AS unit FROM events), "
            "days AS (SELECT DISTINCT unit FROM e) "
            "SELECT d.unit AS unit, "
            "CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users "
            "FROM days d JOIN e "
            "ON e.unit BETWEEN d.unit - 6 AND d.unit GROUP BY 1"
        ),
        "streaming_dedup": (
            "WITH base AS (SELECT user_id % 8 AS part, user_id, "
            "event_type, event_id, epoch_us(ts) AS us FROM events), "
            "l AS (SELECT *, MAX(us) OVER (PARTITION BY part "
            "ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING) AS prior_max FROM base), "
            "f AS (SELECT *, (prior_max IS NOT NULL AND "
            "us < prior_max - 3600000000) AS late FROM l), "
            "m AS (SELECT *, MAX(CASE WHEN NOT late THEN us END) OVER "
            "(PARTITION BY part, user_id, event_type ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "AS key_max FROM f) "
            "SELECT user_id, event_type, event_id, us AS ts_us FROM m "
            "WHERE NOT late AND (key_max IS NULL "
            "OR key_max < us - 86400000000)"
        ),
        "tile_pyramid": (
            f"WITH {_PTS_CTE} "
            + " UNION ALL ".join(
                f"SELECT CAST({r} AS BIGINT) AS res, "
                f"{_cell_expr('lon', 180.0, 360.0, 1 << r)} AS cell_x, "
                f"{_cell_expr('lat', 90.0, 180.0, 1 << r)} AS cell_y, "
                "CAST(COUNT(*) AS BIGINT) AS n_points "
                "FROM pts GROUP BY 2, 3"
                for r in (6, 5, 4, 3, 2))
        ),
        "props_k_stats": (
            "WITH e AS (SELECT event_type, TRY_CAST(regexp_extract("
            r"props, '\"k\"\s*:\s*(-?\d+)', 1) AS BIGINT) AS k "
            "FROM events) "
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(COUNT(k) AS BIGINT) AS n_k, "
            "CAST(COALESCE(SUM(k), 0) AS BIGINT) AS sum_k, "
            "CAST(COALESCE(MIN(k), 0) AS BIGINT) AS min_k, "
            "CAST(COALESCE(MAX(k), 0) AS BIGINT) AS max_k "
            "FROM e GROUP BY 1"
        ),
        "customers_above_nation_avg": (
            "WITH c AS (SELECT c_custkey, c_nationkey, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents "
            "FROM customer), "
            "g AS (SELECT c_nationkey, CAST(SUM(bal_cents) AS BIGINT) "
            "AS s, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY 1) "
            "SELECT c_custkey, bal_cents FROM c JOIN g USING(c_nationkey) "
            "WHERE bal_cents * n > s"
        ),
        "redacted_docs": (
            "SELECT doc_id, "
            r"CAST(len(regexp_extract_all(text, '\bhash\b')) AS BIGINT) "
            "AS n_redacted, "
            r"CAST(length(regexp_replace(text, '\bhash\b', '[T]', 'g')) "
            "AS BIGINT) AS new_len FROM documents"
        ),
        "phrase_docs": (
            "SELECT doc_id FROM documents "
            "WHERE strpos(text, 'hash join') > 0"
        ),
        "triangle_count": (
            "WITH nn AS (SELECT COUNT(*) AS n FROM documents), "
            "raw AS (SELECT doc_id AS s, (doc_id+1) % n AS d "
            "FROM documents CROSS JOIN nn UNION ALL "
            "SELECT doc_id, (doc_id+2) % n FROM documents "
            "CROSS JOIN nn UNION ALL "
            "SELECT doc_id, (doc_id*7+3) % n FROM documents "
            "CROSS JOIN nn), "
            "e AS (SELECT DISTINCT LEAST(s, d) AS a, "
            "GREATEST(s, d) AS b FROM raw WHERE s != d) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles "
            "FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b "
            "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b"
        ),
        "value_outliers": (
            "WITH e AS (SELECT user_id, event_id, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
            "m AS (SELECT user_id, cents AS med FROM "
            "(SELECT user_id, cents, ROW_NUMBER() OVER (PARTITION BY "
            "user_id ORDER BY cents) AS rn, COUNT(*) OVER (PARTITION BY "
            "user_id) AS n FROM e) WHERE rn = (50 * n + 99) // 100), "
            "d AS (SELECT e.user_id, e.event_id, e.cents, m.med, "
            "ABS(e.cents - m.med) AS dev FROM e JOIN m USING(user_id)), "
            "md AS (SELECT user_id, dev AS mad FROM "
            "(SELECT user_id, dev, ROW_NUMBER() OVER (PARTITION BY "
            "user_id ORDER BY dev) AS rn, COUNT(*) OVER (PARTITION BY "
            "user_id) AS n FROM d) WHERE rn = (50 * n + 99) // 100) "
            "SELECT d.user_id, d.event_id, d.cents, d.med, md.mad "
            "FROM d JOIN md USING(user_id) WHERE d.dev > 3 * md.mad"
        ),
        "streaming_sessions": (
            "WITH base AS (SELECT user_id % 8 AS part, user_id, "
            "event_id, epoch_us(ts) AS us, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
            "l AS (SELECT *, MAX(us) OVER (PARTITION BY part "
            "ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING) AS prior_max FROM base), "
            "f AS (SELECT * FROM l WHERE prior_max IS NULL "
            "OR us >= prior_max - 1800000000), "
            "s AS (SELECT *, CASE WHEN us - LAG(us) OVER (PARTITION BY "
            "user_id ORDER BY us, event_id) > 3600000000 THEN 1 "
            "ELSE 0 END AS brk FROM f), "
            "sid AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess "
            "FROM s) "
            "SELECT user_id, CAST(MIN(us) AS BIGINT) AS session_start_us, "
            "CAST(MAX(us) AS BIGINT) AS session_end_us, "
            "CAST(COUNT(*) AS BIGINT) AS n_events, "
            "CAST(SUM(cents) AS BIGINT) AS sum_value "
            "FROM sid GROUP BY user_id, sess"
        ),
        "stream_knn_join": (
            "WITH lw AS (SELECT user_id % 8 AS part, user_id, event_id, "
            "epoch_us(ts) AS t, CAST(round(value * 100) AS BIGINT) AS c, "
            "MAX(epoch_us(ts)) OVER (PARTITION BY "
            "user_id % 8 ORDER BY event_id ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING) AS pm FROM events "
            "WHERE event_type = 'purchase'), "
            "lk AS (SELECT * FROM lw WHERE pm IS NULL OR t >= pm - 600000000), "
            "rw AS (SELECT user_id % 8 AS part, user_id, event_id, "
            "epoch_us(ts) AS t, CAST(round(value * 100) AS BIGINT) AS c, "
            "MAX(epoch_us(ts)) OVER (PARTITION BY "
            "user_id % 8 ORDER BY event_id ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND 1 PRECEDING) AS pm FROM events "
            "WHERE event_type = 'click'), "
            "rk AS (SELECT * FROM rw WHERE pm IS NULL OR t >= pm - 600000000), "
            "p AS (SELECT lk.event_id AS l_id, rk.event_id AS r_id, "
            "ABS(lk.c - rk.c) AS dist "
            "FROM lk JOIN rk ON lk.user_id = rk.user_id "
            "AND rk.t BETWEEN lk.t - 1800000000 AND lk.t + 1800000000), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_id "
            "ORDER BY dist, r_id) AS rn FROM p) "
            "SELECT l_id, r_id, CAST(dist AS BIGINT) AS dist "
            "FROM r WHERE rn <= 3"
        ),
        "user_twap": (
            "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
            "w AS (SELECT *, LEAD(us) OVER (PARTITION BY user_id "
            "ORDER BY us, event_id) AS nxt FROM e) "
            "SELECT user_id, "
            "CAST(COALESCE(SUM(cents * (nxt - us)), 0) AS BIGINT) "
            "AS twap_num_e6, "
            "CAST(MAX(us) - MIN(us) AS BIGINT) AS twap_den_us "
            "FROM w GROUP BY 1"
        ),
        "part_skyline": (
            "WITH p AS (SELECT p_partkey, "
            "CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents, "
            "CAST(p_size AS BIGINT) AS p_size FROM part) "
            "SELECT p_partkey, price_cents, p_size FROM p a "
            "WHERE NOT EXISTS (SELECT 1 FROM p b "
            "WHERE b.price_cents <= a.price_cents "
            "AND b.p_size >= a.p_size "
            "AND (b.price_cents < a.price_cents OR b.p_size > a.p_size)) "
            "ORDER BY price_cents, p_size, p_partkey"
        ),
        "peak_concurrency": (
            "WITH iv AS (SELECT epoch_us(ts) AS s, epoch_us(ts) + "
            "((CAST(round(value * 100) AS BIGINT) % 7200) + 60) * 1000000 "
            "AS e FROM events), "
            "d AS (SELECT s AS t, 1 AS dd FROM iv "
            "UNION ALL SELECT e, -1 FROM iv), "
            "r AS (SELECT t, SUM(dd) OVER (ORDER BY t, dd "
            "ROWS UNBOUNDED PRECEDING) AS run FROM d) "
            "SELECT CAST(run AS BIGINT) AS max_concurrent, "
            "CAST(t AS BIGINT) AS at_ts_us FROM r "
            "ORDER BY run DESC, t ASC LIMIT 1"
        ),
        "user_mode_event": (
            "WITH c AS (SELECT user_id, event_type, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY n DESC, event_type ASC) AS rn FROM c) "
            "SELECT user_id, event_type AS mode_value, n AS mode_count "
            "FROM r WHERE rn = 1 ORDER BY user_id"
        ),
        "event_transitions": (
            "WITH s AS (SELECT user_id, event_type, "
            "LAG(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS prev FROM events) "
            "SELECT prev AS prev_type, event_type AS next_type, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM s "
            "WHERE prev IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "orders_cube": (
            "SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' "
            "ELSE o_orderstatus END AS o_orderstatus, "
            "CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' "
            "ELSE o_orderpriority END AS o_orderpriority, "
            "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS sum_v, CAST(COUNT(*) AS BIGINT) AS n_rows "
            "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) "
            "ORDER BY 1, 2"
        ),
        "orders_grouping_sets": (
            "SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' "
            "ELSE o_orderstatus END AS o_orderstatus, "
            "CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' "
            "ELSE o_orderpriority END AS o_orderpriority, "
            "CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS sum_v, CAST(COUNT(*) AS BIGINT) AS n_rows "
            "FROM orders GROUP BY GROUPING SETS "
            "((o_orderstatus), (o_orderpriority), ()) ORDER BY 1, 2"
        ),
        "typo_pairs": (
            r"WITH t AS (SELECT unnest(string_split_regex(trim(text), "
            r"'\s+')) AS term FROM documents), "
            "v AS (SELECT DISTINCT term FROM t WHERE length(term) >= 3) "
            "SELECT a.term AS term_a, b.term AS term_b, "
            "CAST(levenshtein(a.term, b.term) AS BIGINT) AS dist "
            "FROM v a JOIN v b ON a.term < b.term "
            "AND abs(length(a.term) - length(b.term)) <= 2 "
            "WHERE levenshtein(a.term, b.term) <= 2 ORDER BY 1, 2"
        ),
        "partitioned_roundtrip": (
            "SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) "
            "AS day, "
            "CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) "
            "AS sum_c, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events WHERE event_type = 'click' "
            "GROUP BY 1 ORDER BY 1"
        ),
        "tpch_q4": (
            "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) "
            "AS order_count FROM orders "
            "WHERE o_orderdate >= DATE '1997-07-01' "
            "AND o_orderdate < DATE '1997-10-01' "
            "AND EXISTS (SELECT 1 FROM lineitem "
            "WHERE l_orderkey = o_orderkey "
            "AND l_shipdate > o_orderdate + INTERVAL 45 DAY) "
            "GROUP BY 1 ORDER BY 1"
        ),
        "tpch_q22": (
            "WITH b AS (SELECT c_custkey, c_nationkey, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c "
            "FROM customer), "
            "t AS (SELECT SUM(bal_c) // COUNT(*) AS thr FROM b "
            "WHERE bal_c > 0), "
            "hot AS (SELECT DISTINCT o_custkey FROM orders "
            "WHERE CAST(round(o_totalprice * 100) AS BIGINT) > 40000000) "
            "SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust, "
            "CAST(SUM(bal_c) AS BIGINT) AS totbal_c "
            "FROM b, t WHERE bal_c > thr AND c_custkey NOT IN "
            "(SELECT o_custkey FROM hot) GROUP BY 1 ORDER BY 1"
        ),
        "value_ohlc_daily": (
            "WITH e AS (SELECT event_type, "
            "CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day, "
            "ts, event_id, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
            "w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, "
            "day ORDER BY ts, event_id) AS ra, "
            "ROW_NUMBER() OVER (PARTITION BY event_type, day "
            "ORDER BY ts DESC, event_id DESC) AS rd FROM e) "
            "SELECT event_type, day, "
            "CAST(MIN(CASE WHEN ra = 1 THEN cents END) AS BIGINT) "
            "AS open_v, "
            "CAST(MAX(cents) AS BIGINT) AS high_v, "
            "CAST(MIN(cents) AS BIGINT) AS low_v, "
            "CAST(MIN(CASE WHEN rd = 1 THEN cents END) AS BIGINT) "
            "AS close_v, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM w GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "user_sequences": (
            "SELECT user_id, string_agg(event_type, ',' "
            "ORDER BY ts, event_id) AS seq, "
            "CAST(COUNT(*) AS BIGINT) AS n "
            "FROM events GROUP BY 1 ORDER BY 1"
        ),
        "user_streaks": (
            "WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day "
            "FROM events), "
            "r AS (SELECT user_id, day, CAST(ROW_NUMBER() OVER ("
            "PARTITION BY user_id ORDER BY day) AS INTEGER) AS rn FROM d), "
            "runs AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len "
            "FROM r GROUP BY user_id, day - rn) "
            "SELECT user_id, CAST(MAX(len) AS BIGINT) AS streak_days "
            "FROM runs GROUP BY 1 ORDER BY 1"
        ),
        "orders_profile": (
            "SELECT 'o_custkey' AS \"column\", "
            "CAST(COUNT(o_custkey) AS BIGINT) AS n, "
            "CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_null, "
            "CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct, "
            "CAST(CAST(MIN(o_custkey) AS BIGINT) AS VARCHAR) AS min_s, "
            "CAST(CAST(MAX(o_custkey) AS BIGINT) AS VARCHAR) AS max_s "
            "FROM orders UNION ALL "
            "SELECT 'o_orderpriority', CAST(COUNT(o_orderpriority) AS "
            "BIGINT), CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 "
            "ELSE 0 END) AS BIGINT), "
            "CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT), "
            "MIN(o_orderpriority), MAX(o_orderpriority) FROM orders "
            "UNION ALL "
            "SELECT 'o_orderstatus', CAST(COUNT(o_orderstatus) AS "
            "BIGINT), CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 "
            "ELSE 0 END) AS BIGINT), "
            "CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT), "
            "MIN(o_orderstatus), MAX(o_orderstatus) FROM orders "
            "ORDER BY \"column\""
        ),
        "points_zorder": (
            f"WITH {_PTS_CTE}, "
            "q AS (SELECT doc_id, "
            "CAST(round((lon + 180.0) * 1000000) AS BIGINT) * 65536 "
            "// 360000000 AS qx, "
            "CAST(round((lat + 85.0) * 1000000) AS BIGINT) * 65536 "
            "// 170000000 AS qy FROM pts) "
            f"SELECT doc_id, qx, qy, CAST({_Z_EXPR} AS BIGINT) AS zkey "
            "FROM q ORDER BY zkey, qx, qy, doc_id"
        ),
        "price_wmedian": (
            "WITH g AS (SELECT l_returnflag, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS v, "
            "CAST(round(l_quantity) AS BIGINT) AS w FROM lineitem), "
            "c AS (SELECT l_returnflag, v, "
            "SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw, "
            "SUM(w) OVER (PARTITION BY l_returnflag) AS tw FROM g) "
            "SELECT l_returnflag, CAST(MIN(v) AS BIGINT) AS wmedian "
            "FROM c WHERE 2 * cw >= tw GROUP BY 1 ORDER BY 1"
        ),
        "tpch_q6": (
            "SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_e4 FROM lineitem "
            "WHERE l_shipdate >= DATE '1996-01-01' "
            "AND l_shipdate < DATE '1997-01-01' "
            "AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7 "
            "AND l_quantity < 24"
        ),
        "tpch_q15": (
            "WITH rev AS (SELECT l_suppkey AS suppkey, "
            "CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS total_rev_e4 FROM lineitem "
            "WHERE l_shipdate >= DATE '1996-01-01' "
            "AND l_shipdate < DATE '1996-04-01' GROUP BY l_suppkey) "
            "SELECT CAST(r.suppkey AS BIGINT) AS s_suppkey, s.s_name, "
            "r.total_rev_e4 FROM rev r "
            "JOIN supplier s ON s.s_suppkey = r.suppkey "
            "WHERE r.total_rev_e4 = (SELECT MAX(total_rev_e4) FROM rev)"
        ),
        "tpch_q17": (
            "WITH pk AS (SELECT p_partkey FROM part "
            "WHERE p_brand = 'Brand#13'), "
            "st AS (SELECT l_partkey, "
            "CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem "
            "JOIN pk ON p_partkey = l_partkey GROUP BY l_partkey) "
            "SELECT CAST(COALESCE(SUM(CAST(round(l.l_extendedprice * 100) "
            "AS BIGINT)), 0) AS BIGINT) AS total_cents "
            "FROM lineitem l JOIN st ON st.l_partkey = l.l_partkey "
            "WHERE 5 * CAST(l.l_quantity AS BIGINT) * st.n < st.sum_qty"
        ),
        "tpch_q7": (
            "SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation, "
            "CAST(year(l.l_shipdate) AS BIGINT) AS l_year, "
            "CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_e4 "
            "FROM lineitem l "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation ns ON ns.n_nationkey = s.s_nationkey "
            "JOIN nation nc ON nc.n_nationkey = c.c_nationkey "
            "WHERE l.l_shipdate >= DATE '1996-01-01' "
            "AND l.l_shipdate < DATE '1998-01-01' "
            "AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2') OR "
            "(ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1')) "
            "GROUP BY ns.n_name, nc.n_name, year(l.l_shipdate)"
        ),
        "tpch_q10": (
            "WITH rev AS (SELECT o.o_custkey AS custkey, "
            "CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_e4 "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "WHERE l.l_returnflag = 'R' "
            "AND o.o_orderdate >= DATE '1996-01-01' "
            "AND o.o_orderdate < DATE '1996-04-01' "
            "GROUP BY o.o_custkey), "
            "top AS (SELECT * FROM rev "
            "ORDER BY revenue_e4 DESC, custkey LIMIT 20) "
            "SELECT CAST(t.custkey AS BIGINT) AS c_custkey, c.c_name, "
            "t.revenue_e4, "
            "CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_cents, "
            "n.n_name "
            "FROM top t JOIN customer c ON c.c_custkey = t.custkey "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey"
        ),
        "tpch_q14": (
            "SELECT "
            "CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN "
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l.l_discount * 100) AS BIGINT)) "
            "ELSE 0 END) AS BIGINT) AS promo_rev_e4, "
            "CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS total_rev_e4 "
            "FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey "
            "WHERE l.l_shipdate >= DATE '1995-09-01' "
            "AND l.l_shipdate < DATE '1995-10-01'"
        ),
        "tpch_q21": (
            "WITH l AS (SELECT l_orderkey AS okey, l_suppkey AS skey, "
            "MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY "
            "THEN 1 ELSE 0 END) AS late FROM lineitem JOIN orders "
            "ON l_orderkey = o_orderkey GROUP BY 1, 2), "
            "o AS (SELECT okey, COUNT(*) AS nsupp, SUM(late) AS nlate "
            "FROM l GROUP BY 1) "
            "SELECT CAST(l.skey AS BIGINT) AS s_suppkey, "
            "CAST(COUNT(*) AS BIGINT) AS numwait "
            "FROM l JOIN o USING (okey) "
            "WHERE l.late = 1 AND o.nlate = 1 AND o.nsupp >= 2 "
            "GROUP BY 1 ORDER BY numwait DESC, s_suppkey LIMIT 50"
        ),
        "tpch_q13": (
            "SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM ("
            "SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) "
            "AS c_count FROM customer c LEFT JOIN orders o "
            "ON c.c_custkey = o.o_custkey GROUP BY 1) t "
            "GROUP BY 1 ORDER BY 1"
        ),
        "tpch_q18": (
            "WITH hot AS (SELECT l_orderkey, "
            "CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) "
            "AS qty_sum FROM lineitem GROUP BY 1 "
            "HAVING SUM(CAST(round(l_quantity) AS BIGINT)) > 150) "
            "SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey, "
            "o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents, "
            "qty_sum FROM orders JOIN hot ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "ORDER BY total_cents DESC, o_orderdate, o_orderkey LIMIT 100"
        ),
        "value_hour_moments": (
            "WITH e AS (SELECT event_type, "
            "CAST(round(value * 100) AS BIGINT) AS x, "
            "CAST(EXTRACT(hour FROM ts) AS BIGINT) AS y FROM events) "
            "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(x) AS BIGINT) AS sum_x, "
            "CAST(SUM(y) AS BIGINT) AS sum_y, "
            "CAST(SUM(x * y) AS BIGINT) AS sum_xy, "
            "CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS BIGINT) "
            "AS cov_num FROM e GROUP BY 1 ORDER BY 1"
        ),
        "tpch_q5": (
            "SELECT n_name, CAST(SUM("
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) "
            "AS revenue_e4 "
            "FROM customer, orders, lineitem, supplier, nation, region "
            "WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey "
            "AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
            "AND r_name = 'ASIA' "
            "AND o_orderdate >= DATE '1997-01-01' "
            "AND o_orderdate < DATE '1998-01-01' "
            "GROUP BY n_name ORDER BY n_name"
        ),
        "supplier_cnt": (
            "SELECT p_brand, CAST(p_size AS BIGINT) AS p_size, "
            "CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "value_ntile": (
            "WITH e AS (SELECT event_id, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events), "
            "t AS (SELECT cents, NTILE(4) OVER (ORDER BY cents, event_id) "
            "AS bucket FROM e) "
            "SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(cents) AS BIGINT) AS sum_cents FROM t "
            "GROUP BY 1 ORDER BY 1"
        ),
        "type_cooccurrence": (
            "WITH d AS (SELECT DISTINCT user_id, event_type FROM events) "
            "SELECT a.event_type AS item_a, b.event_type AS item_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_entities "
            "FROM d a JOIN d b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type GROUP BY 1, 2 ORDER BY 1, 2"
        ),
        "value_histogram": (
            "WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) "
            "AS cents FROM events) "
            "SELECT CAST(floor(cents / 1000.0) AS BIGINT) AS bin, "
            "CAST(floor(cents / 1000.0) AS BIGINT) * 1000 AS bin_lo, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(cents) AS BIGINT) AS sum_v FROM e "
            "GROUP BY 1 ORDER BY 1"
        ),
    }
