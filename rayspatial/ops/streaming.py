"""Out-of-order event-time windowing with watermarks — the streaming
counterpart of ops/window.py's batch formulations (SURVEY 8.5.1).

``WatermarkWindower`` is the per-partition streaming operator: it
consumes arrival-ordered event batches, maintains per-window partial
aggregates, advances a watermark = max(seen event time) - allowed
lateness, EMITS a window's aggregate once the watermark passes the
window end, and drops (and counts) events that arrive behind the
watermark.  In a live deployment it runs as a Ray actor pool over a
key-partitioned stream (one actor owns a partition, state in
``__init__``, batches through ``__call__``, ``flush()`` at
end-of-stream).

``streaming_tumbling_window`` expresses the same semantics over a
bounded Ray Dataset: events are hash-partitioned (every key's events
co-locate), each partition REPLAYS its events in arrival order
(``event_id``; the documented stand-in for ingestion order) through a
WatermarkWindower, and emitted + flushed windows stream out.  The
final aggregates equal "aggregate over events not late at their
arrival" — deterministic and SQL-reproducible (running-max watermark
via a window function), which is how the driver oracle checks it.

Watermark granularity is PER EVENT (running max), the finest and the
one the oracle reproduces exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class WatermarkWindower:
    """Streaming tumbling-window aggregator for ONE partition."""

    def __init__(self, width_s: int, lateness_s: int):
        self.width_us = width_s * 1_000_000
        self.lateness_us = lateness_s * 1_000_000
        self.partials: dict[int, tuple[int, int]] = {}  # wstart -> (n, sum)
        self.watermark = -np.inf
        self.emitted: set[int] = set()
        self.late_dropped = 0

    def process(self, ts_us: np.ndarray, values: np.ndarray):
        """Consume arrival-ordered events; return rows emitted by the
        watermark advancing across window ends."""
        out: list[tuple[int, int, int]] = []
        # per-event watermark = running max of PRIOR event times - lateness
        prior_max = np.maximum.accumulate(
            np.concatenate([[np.int64(-(2**62))], ts_us[:-1]])
        )
        wm = prior_max - self.lateness_us
        if self.watermark > -np.inf:
            wm = np.maximum(wm, int(self.watermark))
        late = ts_us < wm
        self.late_dropped += int(late.sum())
        keep_ts = ts_us[~late]
        keep_v = values[~late]
        wstart = (keep_ts // self.width_us) * self.width_us
        # chunk-vectorized partials: one dict op per DISTINCT window per
        # chunk, never per event (round-2 verdict item 3).  np.add.at on
        # int64 keeps cent sums exact (no float accumulation).
        if len(wstart):
            uw, inv = np.unique(wstart, return_inverse=True)
            sums = np.zeros(len(uw), dtype=np.int64)
            np.add.at(sums, inv, keep_v.astype(np.int64))
            cnts = np.bincount(inv, minlength=len(uw))
            for k in range(len(uw)):
                w = int(uw[k])
                n, s = self.partials.get(w, (0, 0))
                self.partials[w] = (n + int(cnts[k]), s + int(sums[k]))
        new_wm = max(
            float(self.watermark),
            float(ts_us.max() - self.lateness_us) if len(ts_us) else -np.inf,
        )
        self.watermark = new_wm
        # emit every window whose END the watermark has passed
        for w in sorted(self.partials):
            if w + self.width_us <= new_wm and w not in self.emitted:
                n, s = self.partials[w]
                out.append((w, n, s))
                self.emitted.add(w)
        return out

    def flush(self):
        """End-of-stream: emit remaining open windows."""
        out = []
        for w in sorted(self.partials):
            if w not in self.emitted:
                n, s = self.partials[w]
                out.append((w, n, s))
                self.emitted.add(w)
        return out


def streaming_tumbling_window(events_ds, width_s: int, lateness_s: int,
                              num_partitions: int = 8,
                              chunk: int = 256,
                              part_col: str = "user_id",
                              ts_col: str = "ts",
                              value_col: str = "value"):
    """-> (part, window_start, n_events, sum_value) per partition and
    window, aggregating only events that were NOT late at their arrival
    (arrival order = event_id within partition; partition =
    ``part_col % num_partitions`` so the SQL oracle can reproduce it).
    """
    P = num_partitions

    def add_part(batch: pa.Table) -> pa.Table:
        part = batch.column(part_col).to_numpy() % P
        return batch.append_column("_spart", pa.array(part.astype(np.int64)))

    def replay(df: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for part, g in df.groupby("_spart", sort=True):
            g = g.sort_values("event_id", kind="stable")
            ts = g[ts_col].astype("int64").to_numpy()
            vals = g[value_col].to_numpy()
            wd = WatermarkWindower(width_s, lateness_s)
            # replay in arrival-order chunks (the batch boundary a live
            # stream would have); results are chunking-invariant because
            # the watermark is per-event
            for s in range(0, len(g), chunk):
                for w, n, sm in wd.process(ts[s : s + chunk],
                                           vals[s : s + chunk]):
                    out_rows.append((part, w, n, sm))
            for w, n, sm in wd.flush():
                out_rows.append((part, w, n, sm))
        out = pd.DataFrame(
            out_rows, columns=["part", "window_start", "n_events", "sum_value"]
        ).sort_values(["part", "window_start"], kind="stable")
        out["window_start"] = out["window_start"].astype("datetime64[us]")
        return out

    from rayspatial.util import hash_partitioned_agg

    ds = events_ds.map_batches(add_part, batch_format="pyarrow")
    out = hash_partitioned_agg(ds, ["_spart"], replay)

    def canon(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("window_start")
        return batch.set_column(
            i, "window_start", batch.column(i).cast(pa.timestamp("us"))
        )

    return out.map_batches(canon, batch_format="pyarrow")


def _survivors(g: pd.DataFrame, ts_col: str, id_col: str,
               lateness_us: int):
    """Arrival-order replay of ONE stream's partition slice: per-event
    watermark = running max of PRIOR event times - lateness; an event
    behind it is late-dropped.  -> (kept DataFrame sorted by arrival,
    n_late).  Chunking-invariant by construction (the watermark is per
    event, so batch boundaries cannot change the mask)."""
    g = g.sort_values(id_col, kind="stable")
    ts = g[ts_col].to_numpy().astype(np.int64)
    prior_max = np.maximum.accumulate(
        np.concatenate([[np.int64(-(2 ** 62))], ts[:-1]]))
    late = ts < prior_max - np.int64(lateness_us)
    return g[~late], int(late.sum())


class IntervalJoiner:
    """LIVE per-partition stream-stream interval-join operator — the
    actor-pool form of :func:`streaming_interval_join` (state in
    ``__init__``, arrival-ordered batches through :meth:`process`,
    :meth:`flush` at end-of-stream).  Symmetric hash join with
    watermark-driven eviction:

    - each arriving event is late-dropped against its OWN stream's
      per-event watermark (running max - lateness), identically to the
      batch operator;
    - a surviving LEFT event matches buffered RIGHT events in
      ``[ts - before, ts + after]``; a surviving RIGHT event matches
      buffered LEFT only (new-vs-new pairs are found by the left rule
      when the left event processes after the right in arrival order —
      feed batches through :meth:`process` in arrival order, sides
      interleaved or not);
    - bounded state: a left event is EVICTED once the right stream's
      watermark passes ``ts + after`` (no surviving future right can
      match it), and a right event once the left watermark passes
      ``ts + before`` — per-key state is O(events inside one window +
      lateness horizon), never the stream.

    Exactness vs the batch operator is asserted in
    tests/test_streaming.py (same pairs under any chunking), along
    with the buffer bound."""

    def __init__(self, before_s: int, after_s: int, lateness_s: int):
        self.before_us = int(before_s) * 1_000_000
        self.after_us = int(after_s) * 1_000_000
        self.lateness_us = int(lateness_s) * 1_000_000
        self.wm = [-(2 ** 62), -(2 ** 62)]        # per-side running max
        # per-side buffers: dict key -> list[(ts, id)]
        self.buf: list[dict[int, list[tuple[int, int]]]] = [{}, {}]
        self.late = [0, 0]
        self.max_buffered = 0

    def _evict(self):
        # left (side 0) survives while ts + after >= wm_right - lateness
        # (a future surviving right event has ts >= wm_right - lateness)
        cuts = (self.wm[1] - self.lateness_us - self.after_us,
                self.wm[0] - self.lateness_us - self.before_us)
        for side, cut in enumerate(cuts):
            b = self.buf[side]
            for k in list(b):
                kept = [e for e in b[k] if e[0] >= cut]
                if kept:
                    b[k] = kept
                else:
                    del b[k]

    def process(self, side: np.ndarray, key: np.ndarray, ts: np.ndarray,
                eid: np.ndarray) -> list[tuple[int, int, int, int, int]]:
        """Consume one arrival-ordered chunk (mixed sides allowed);
        -> emitted (key, l_id, r_id, l_ts, r_ts) pairs."""
        out: list[tuple[int, int, int, int, int]] = []
        for i in range(len(side)):
            s = int(side[i])
            t = int(ts[i])
            if t < self.wm[s] - self.lateness_us:
                self.late[s] += 1
                continue
            self.wm[s] = max(self.wm[s], t)
            k = int(key[i])
            e = int(eid[i])
            other = self.buf[1 - s].get(k, ())
            if s == 0:
                lo, hi = t - self.before_us, t + self.after_us
                for (rt, rid) in other:
                    if lo <= rt <= hi:
                        out.append((k, e, rid, t, rt))
            else:
                lo, hi = t - self.after_us, t + self.before_us
                for (lt, lid) in other:
                    if lo <= lt <= hi:
                        out.append((k, lid, e, lt, t))
            self.buf[s].setdefault(k, []).append((t, e))
        # eviction once per chunk: delaying it never changes output
        # (an evictable buffered event can no longer satisfy the
        # interval predicate against any surviving future event), it
        # only bounds state — so amortize the sweep
        self._evict()
        self.max_buffered = max(
            self.max_buffered,
            sum(len(v) for b in self.buf for v in b.values()))
        return out

    def flush(self) -> list:
        """End-of-stream: nothing pending (pairs emit eagerly); clears
        buffers and returns []."""
        self.buf = [{}, {}]
        return []


def streaming_interval_join(left_ds, right_ds, before_s: int, after_s: int,
                            lateness_s: int,
                            num_partitions: int = 8,
                            part_col: str = "user_id",
                            ts_col: str = "ts",
                            id_col: str = "event_id",
                            output: str = "pairs"):
    """Stream-stream watermarked interval join (SURVEY 8.8.5 — the one
    streaming shape ops/streaming.py lacked; the Flink intervalJoin
    semantic over two event streams).

    For every surviving LEFT event l, emit every surviving RIGHT event
    r of the same key with ``r.ts in [l.ts - before_s, l.ts + after_s]``
    (both ends inclusive).  "Surviving" = not late at arrival on its
    OWN stream: each stream replays per partition in arrival order
    (``id_col``), advances a per-event watermark = running max of prior
    event times - lateness, and drops (and counts) events behind it —
    the same per-event watermark contract as
    ``streaming_tumbling_window``, so a SQL oracle reproduces the drop
    mask with one window function per stream.

    Shape: both streams tag ``part = part_col % num_partitions`` (the
    oracle-reproducible partitioner) and a side flag, union, ONE hash
    shuffle co-locates each key's events from both streams, and the
    per-partition kernel is fully vectorized: dense-rank keys, build a
    composite ``key_rank * span + (ts - ts_min)`` (span = partition ts
    range + window + 2, so key groups stay disjoint), two searchsorted
    probes per left event give its match range, and the pair list
    materializes with repeat + ragged-arange — no Python row loop.

    In a live deployment the same kernel runs in a keyed actor pool
    with per-key right/left buffers evicted once the opposite stream's
    watermark passes ``ts + before/after`` — the bounded-state
    argument: buffered state per key is O(events inside one window +
    lateness horizon), never the stream.

    ``output="pairs"``  -> (part, key, l_id, r_id, l_ts, r_ts), sorted
                           by (l_id, r_id) within each partition
                           (deterministic: partition order is fixed by
                           the hash).
    ``output="late"``   -> (part, side, n_late) late-drop accounting,
                           side 0=left 1=right.
    """
    from rayspatial.util import hash_partitioned_agg

    if output not in ("pairs", "late"):
        raise ValueError(f"unknown output mode {output!r}")
    P = num_partitions
    before_us = int(before_s) * 1_000_000
    after_us = int(after_s) * 1_000_000
    lateness_us = int(lateness_s) * 1_000_000

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch.column(part_col).to_numpy().astype(np.int64)
            ts = batch.column(ts_col).cast(pa.int64()).to_numpy()
            return pa.table({
                "_side": pa.array(np.full(len(batch), side, dtype=np.int8)),
                "_spart": pa.array(key % P),
                "key": pa.array(key),
                "ts": pa.array(ts),
                "id": pa.array(
                    batch.column(id_col).to_numpy().astype(np.int64)),
            })

        return fn

    lt = left_ds.map_batches(tag(0), batch_format="pyarrow")
    rt = right_ds.map_batches(tag(1), batch_format="pyarrow")
    unioned = lt.union(rt)

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty_pairs = pd.DataFrame({
            "part": pd.Series([], dtype=np.int64),
            "key": pd.Series([], dtype=np.int64),
            "l_id": pd.Series([], dtype=np.int64),
            "r_id": pd.Series([], dtype=np.int64),
            "l_ts": pd.Series([], dtype=np.int64),
            "r_ts": pd.Series([], dtype=np.int64)})
        out_pairs, out_late = [], []
        for part, g in df.groupby("_spart", sort=True):
            lg, n_late_l = _survivors(g[g["_side"] == 0], "ts", "id",
                                      lateness_us)
            rg, n_late_r = _survivors(g[g["_side"] == 1], "ts", "id",
                                      lateness_us)
            out_late.append((int(part), 0, n_late_l))
            out_late.append((int(part), 1, n_late_r))
            if not len(lg) or not len(rg):
                continue
            lk = lg["key"].to_numpy().astype(np.int64)
            lts = lg["ts"].to_numpy().astype(np.int64)
            lid = lg["id"].to_numpy().astype(np.int64)
            rk = rg["key"].to_numpy().astype(np.int64)
            rts = rg["ts"].to_numpy().astype(np.int64)
            rid = rg["id"].to_numpy().astype(np.int64)
            # composite: dense key rank x shifted ts (disjoint per key)
            all_keys = np.unique(np.concatenate([lk, rk]))
            lkr = np.searchsorted(all_keys, lk).astype(np.int64)
            rkr = np.searchsorted(all_keys, rk).astype(np.int64)
            tmin = np.int64(min(lts.min(), rts.min()))
            tmax = np.int64(max(lts.max(), rts.max()))
            span = int(tmax - tmin) + before_us + after_us + 2
            if (len(all_keys)) * span > 2 ** 62:
                raise OverflowError(
                    "streaming_interval_join composite overflow: "
                    "partition ts range x key count too large — raise "
                    "num_partitions")
            span = np.int64(span)
            order = np.argsort(rkr * span + (rts - tmin), kind="stable")
            rcomp = (rkr * span + (rts - tmin))[order]
            lcomp = lkr * span + (lts - tmin)
            lo = np.searchsorted(rcomp, lcomp - np.int64(before_us),
                                 side="left")
            hi = np.searchsorted(rcomp, lcomp + np.int64(after_us),
                                 side="right")
            # clamp to the left event's own key group (window reaching
            # outside [0, span) of the key block cannot cross into a
            # neighbour: before+after+2 slack is built into span)
            cnt = hi - lo
            keep = cnt > 0
            if not keep.any():
                continue
            cntk = cnt[keep]
            from rayspatial.textops.hashing import _ragged_arange

            ridx = order[np.repeat(lo[keep], cntk) + _ragged_arange(cntk)]
            lrep = np.repeat(np.flatnonzero(keep), cntk)
            out_pairs.append(pd.DataFrame({
                "part": np.full(len(ridx), int(part), dtype=np.int64),
                "key": lk[lrep],
                "l_id": lid[lrep],
                "r_id": rid[ridx],
                "l_ts": lts[lrep],
                "r_ts": rts[ridx],
            }))
        if output == "late":
            return pd.DataFrame(out_late, columns=["part", "side", "n_late"]
                                ).astype(np.int64)
        if not out_pairs:
            return empty_pairs
        out = pd.concat(out_pairs, ignore_index=True)
        return out.sort_values(["l_id", "r_id"], kind="stable")

    return hash_partitioned_agg(unioned, ["_spart"], per_partition)


def streaming_interval_join_salted(left_ds, right_ds, before_s: int,
                                   after_s: int, lateness_s: int,
                                   num_partitions: int = 8,
                                   bucket_s: int | None = None,
                                   salt: int = 8,
                                   part_col: str = "user_id",
                                   ts_col: str = "ts",
                                   id_col: str = "event_id",
                                   output: str = "pairs"):
    """Hot-key-safe stream-stream interval join: output equals
    :func:`streaming_interval_join` row-for-row (asserted in tests;
    shares its SQL oracle), but the PAIR-JOIN stage shuffles by
    ``(part, time_bucket, key_salt)`` so one hot key spreads over
    #buckets x salt partitions instead of melting one.

    Two exchanges (the asof_salted pattern):

    1. survivor pass, keyed by ``part`` — the per-stream arrival-order
       watermark replay is O(n) vectorized, so a hot partition is cheap
       here; emits surviving rows + late counts.
    2. pair join, keyed by ``(bucket, key_salt)`` — each LEFT event
       goes to its own ``ts // bucket`` exactly once (per-partition
       results are final, no dedup pass); each RIGHT event replicates
       to the left buckets its window can serve
       (``floor((ts-after)/B) .. floor((ts+before)/B)`` — <= 2-3
       replicas when ``B >= before+after``).  The kernel dense-ranks
       (bucket, key) pairs and probes with two searchsorted calls, the
       rangejoin composite trick with the right replicas' relative
       offsets shifted by ``after`` so every value stays inside its
       block.
    """
    from rayspatial.textops.hashing import hash_int64
    from rayspatial.util import hash_partitioned_agg

    if output not in ("pairs", "late"):
        raise ValueError(f"unknown output mode {output!r}")
    P = num_partitions
    before_us = int(before_s) * 1_000_000
    after_us = int(after_s) * 1_000_000
    lateness_us = int(lateness_s) * 1_000_000
    B = (int(bucket_s) * 1_000_000 if bucket_s
         else max(before_us + after_us, 1_000_000))
    salt_u = np.uint64(max(1, salt))

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            key = batch.column(part_col).to_numpy().astype(np.int64)
            ts = batch.column(ts_col).cast(pa.int64()).to_numpy()
            return pa.table({
                "_side": pa.array(np.full(len(batch), side, dtype=np.int8)),
                "_spart": pa.array(key % P),
                "key": pa.array(key),
                "ts": pa.array(ts),
                "id": pa.array(
                    batch.column(id_col).to_numpy().astype(np.int64)),
            })

        return fn

    unioned = left_ds.map_batches(tag(0), batch_format="pyarrow").union(
        right_ds.map_batches(tag(1), batch_format="pyarrow"))

    # ---- stage 1: survivors (cheap vectorized replay per part) ----
    def survivors_pass(df: pd.DataFrame) -> pd.DataFrame:
        outs, late = [], []
        for part, g in df.groupby("_spart", sort=True):
            for s in (0, 1):
                kept, n_late = _survivors(g[g["_side"] == s], "ts", "id",
                                          lateness_us)
                late.append((int(part), s, n_late))
                if len(kept):
                    outs.append(kept[["_side", "_spart", "key", "ts",
                                      "id"]])
        if output == "late":
            return pd.DataFrame(late, columns=["part", "side", "n_late"]
                                ).astype(np.int64)
        if not outs:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in ("_side", "_spart", "key",
                                           "ts", "id")})
        return pd.concat(outs, ignore_index=True)

    stage1 = hash_partitioned_agg(unioned, ["_spart"], survivors_pass)
    if output == "late":
        return stage1

    # ---- stage 2: replicate rights to servable buckets, join ----
    def rep(batch: pa.Table) -> pa.Table:
        side = batch.column("_side").to_numpy()
        key = batch.column("key").to_numpy().astype(np.int64)
        ts = batch.column("ts").to_numpy().astype(np.int64)
        eid = batch.column("id").to_numpy().astype(np.int64)
        ks = (hash_int64(key.view(np.uint64)) % salt_u).astype(np.int64)
        lmask = side == 0
        cols = {"_side": [], "_bucket": [], "_ksalt": [], "key": [],
                "ts": [], "id": []}
        if lmask.any():
            cols["_side"].append(np.zeros(int(lmask.sum()), np.int8))
            cols["_bucket"].append(ts[lmask] // B)
            cols["_ksalt"].append(ks[lmask])
            cols["key"].append(key[lmask])
            cols["ts"].append(ts[lmask])
            cols["id"].append(eid[lmask])
        rsel = np.flatnonzero(~lmask)
        if len(rsel):
            b0 = (ts[rsel] - after_us) // B
            b1 = (ts[rsel] + before_us) // B
            cnt = (b1 - b0 + 1).astype(np.int64)
            from rayspatial.textops.hashing import _ragged_arange

            rows = np.repeat(rsel, cnt)
            buckets = np.repeat(b0, cnt) + _ragged_arange(cnt)
            cols["_side"].append(np.ones(len(rows), np.int8))
            cols["_bucket"].append(buckets)
            cols["_ksalt"].append(ks[rows])
            cols["key"].append(key[rows])
            cols["ts"].append(ts[rows])
            cols["id"].append(eid[rows])
        if not cols["_side"]:
            return pa.table({
                "_side": pa.array([], type=pa.int8()),
                "_bucket": pa.array([], type=pa.int64()),
                "_ksalt": pa.array([], type=pa.int64()),
                "key": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.int64()),
                "id": pa.array([], type=pa.int64())})
        return pa.table({c: pa.array(np.concatenate(v))
                         for c, v in cols.items()})

    tagged = stage1.map_batches(rep, batch_format="pyarrow")

    def join_partition(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({c: pd.Series([], dtype=np.int64)
                              for c in ("part", "key", "l_id", "r_id",
                                        "l_ts", "r_ts")})
        side = df["_side"].to_numpy()
        lmask = side == 0
        if not lmask.any() or lmask.all():
            return empty
        bkt = df["_bucket"].to_numpy().astype(np.int64)
        key = df["key"].to_numpy().astype(np.int64)
        ts = df["ts"].to_numpy().astype(np.int64)
        eid = df["id"].to_numpy().astype(np.int64)
        # dense-rank (bucket, key) so groups stay disjoint in one int64
        pair = np.stack([bkt, key], axis=1)
        _, rank = np.unique(pair, axis=0, return_inverse=True)
        # rel in [0, B) for lefts, [-after, B+before) for right
        # replicas; shift by +after so everything is >= 0
        rel = ts - bkt * np.int64(B) + np.int64(after_us)
        span = np.int64(B + before_us + 2 * after_us + 2)
        comp = rank.astype(np.int64) * span + rel
        rcomp = comp[~lmask]
        rorder = np.argsort(rcomp, kind="stable")
        rcomp_s = rcomp[rorder]
        lcomp = comp[lmask]
        lo = np.searchsorted(rcomp_s, lcomp - np.int64(before_us), "left")
        hi = np.searchsorted(rcomp_s, lcomp + np.int64(after_us), "right")
        cnt = hi - lo
        keep = cnt > 0
        if not keep.any():
            return empty
        from rayspatial.textops.hashing import _ragged_arange

        cntk = cnt[keep]
        ridx = rorder[np.repeat(lo[keep], cntk) + _ragged_arange(cntk)]
        lidx = np.flatnonzero(lmask)[np.repeat(np.flatnonzero(keep), cntk)]
        gidx = np.flatnonzero(~lmask)[ridx]
        out = pd.DataFrame({
            "part": key[lidx] % P,
            "key": key[lidx],
            "l_id": eid[lidx],
            "r_id": eid[gidx],
            "l_ts": ts[lidx],
            "r_ts": ts[gidx],
        })
        return out.sort_values(["l_id", "r_id"], kind="stable")

    return hash_partitioned_agg(tagged, ["_bucket", "_ksalt"],
                                join_partition)


class StreamingDeduper:
    """Streaming TTL dedup / throttle for ONE partition: an event is
    EMITTED iff it is not late (event time >= partition watermark) and
    its key has no prior non-late event with event time inside the
    trailing ``ttl`` horizon — the exactly-once-ingestion /
    notification-throttle primitive.

    State is a per-key max non-late event time, bounded by the
    watermark: a key whose stored time drops below watermark - ttl can
    never suppress again (future non-late events have ts >= watermark),
    so ``evict()`` keeps state proportional to keys ACTIVE within the
    horizon, not all keys ever seen.  Late arrivals and suppressed
    duplicates are counted (``late_dropped`` / ``suppressed``).
    Chunking-invariant: the watermark is per event (running max of
    prior event times - lateness), exactly as WatermarkWindower."""

    def __init__(self, ttl_s: int, lateness_s: int):
        self.ttl_us = ttl_s * 1_000_000
        self.lateness_us = lateness_s * 1_000_000
        self.key_max: dict = {}
        self.watermark = -np.inf
        self.late_dropped = 0
        self.suppressed = 0

    def process(self, keys: np.ndarray, ts_us: np.ndarray,
                ids: np.ndarray) -> np.ndarray:
        """Consume arrival-ordered events; return the boolean EMIT mask
        (callers slice their own payload columns with it)."""
        prior_max = np.maximum.accumulate(
            np.concatenate([[np.int64(-(2 ** 62))], ts_us[:-1]]))
        wm = prior_max - self.lateness_us
        if self.watermark > -np.inf:
            wm = np.maximum(wm, int(self.watermark))
        late = ts_us < wm
        self.late_dropped += int(late.sum())
        df = pd.DataFrame({"k": keys, "t": ts_us})
        tsn = np.where(late, np.int64(-(2 ** 62)), ts_us)
        df["tsn"] = tsn
        g = df.groupby("k", sort=False)
        prior_key = g["tsn"].cummax().astype(np.float64)
        prior_key = prior_key.groupby(df["k"], sort=False).shift(1)
        seeded = df["k"].map(self.key_max).astype(np.float64)
        prior_key = np.fmax(prior_key.to_numpy(), seeded.to_numpy())
        emit = (~late) & (np.isnan(prior_key)
                          | (prior_key < ts_us - self.ttl_us))
        self.suppressed += int(((~late) & ~emit).sum())
        # fold this chunk's non-late maxima into the state
        upd = df[~late].groupby("k", sort=False)["t"].max()
        for k, v in upd.items():
            cur = self.key_max.get(k)
            self.key_max[k] = int(v) if cur is None else max(cur, int(v))
        if len(ts_us):
            self.watermark = max(self.watermark,
                                 int(ts_us.max()) - self.lateness_us)
        self.evict()
        return emit

    def evict(self):
        if self.watermark == -np.inf:
            return
        floor = self.watermark - self.ttl_us
        drop = [k for k, v in self.key_max.items() if v < floor]
        for k in drop:
            del self.key_max[k]


def streaming_dedup(events_ds, ttl_s: int, lateness_s: int,
                    num_partitions: int = 8, chunk: int = 256,
                    part_col: str = "user_id",
                    key_cols: list[str] | None = None,
                    ts_col: str = "ts", id_col: str = "event_id"):
    """-> the EMITTED events (part_col, key_cols, id_col, ts_us) after
    per-partition streaming TTL dedup (partition = ``part_col %
    num_partitions`` so a SQL oracle reproduces the watermark scope,
    arrival order = ``id_col``).  Same bounded-dataset replay shape as
    streaming_tumbling_window: ONE hash exchange, per-partition
    arrival-order chunked replay through StreamingDeduper."""
    from rayspatial.util import hash_partitioned_agg

    key_cols = key_cols or [part_col]
    P = num_partitions

    def add_part(batch: pa.Table) -> pa.Table:
        us = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        t = pa.table({
            "_spart": pa.array(
                (batch.column(part_col).to_numpy() % P).astype(np.int64)),
            part_col: batch.column(part_col),
            id_col: batch.column(id_col),
            "ts_us": us,
            **{c: batch.column(c) for c in key_cols if c != part_col},
        })
        return t

    def replay(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("_spart", sort=True):
            g = g.sort_values(id_col, kind="stable")
            keys = (g[key_cols[0]].astype(str)
                    if len(key_cols) == 1 else
                    g[key_cols].astype(str).agg("\x1f".join, axis=1))
            ts = g["ts_us"].to_numpy()
            ids = g[id_col].to_numpy()
            karr = keys.to_numpy()  # hoisted: one materialization per group
            dd = StreamingDeduper(ttl_s, lateness_s)
            emit = np.zeros(len(g), dtype=bool)
            for s in range(0, len(g), chunk):
                emit[s:s + chunk] = dd.process(
                    karr[s:s + chunk], ts[s:s + chunk],
                    ids[s:s + chunk])
            outs.append(g[emit])
        cols = [part_col] + [c for c in key_cols if c != part_col] \
            + [id_col, "ts_us"]
        if not outs:
            return pd.DataFrame(columns=cols)
        out = pd.concat(outs)[cols]
        return out.sort_values(id_col, kind="stable")

    ds = events_ds.map_batches(add_part, batch_format="pyarrow")
    return hash_partitioned_agg(ds, ["_spart"], replay)


class StreamingSessionizer:
    """Streaming SESSION windows for ONE partition: gap-based sessions
    over an out-of-order event stream, emitted as soon as the
    watermark guarantees no future event can extend them.

    Out-of-order events inside the lateness horizon may extend a
    session backwards or MERGE two open sessions, so per-key state is
    a list of open [start, end, n, sum] intervals maintained under
    single-linkage gap clustering — which is insertion-order
    independent, so the closed sessions equal batch sessionization
    (ops/window.sessionize) over the non-late event subset, the
    property the SQL oracle checks.  A session closes when
    ``watermark > end + gap`` (any future non-late event has
    ts >= watermark and so cannot join).  Late arrivals (behind the
    per-partition watermark) drop and are counted.

    Hot keys: a key's events all land in its ``key % P`` partition;
    state stays bounded (open sessions only) but replay wall time is
    that partition's share of the stream — a single pathological key
    needs the batch path's salted stitcher (ops/window.
    sessionize_salted: time-bucket salt + boundary-session stitch),
    whose two-pass argument carries over to a live deployment."""

    def __init__(self, gap_s: int, lateness_s: int):
        self.gap_us = gap_s * 1_000_000
        self.lateness_us = lateness_s * 1_000_000
        self.open: dict = {}            # key -> list of [s, e, n, sum]
        self.watermark = -np.inf
        self.late_dropped = 0

    def process(self, keys: np.ndarray, ts_us: np.ndarray,
                values: np.ndarray) -> list[tuple]:
        """Consume arrival-ordered events; return closed-session rows
        (key, start_us, end_us, n_events, sum_value)."""
        prior_max = np.maximum.accumulate(
            np.concatenate([[np.int64(-(2 ** 62))], ts_us[:-1]]))
        wm = prior_max - self.lateness_us
        if self.watermark > -np.inf:
            wm = np.maximum(wm, int(self.watermark))
        late = ts_us < wm
        self.late_dropped += int(late.sum())
        g = self.gap_us
        for k, t, v in zip(keys[~late], ts_us[~late], values[~late]):
            t = int(t)
            ivs = self.open.setdefault(k, [])
            hit = [i for i, iv in enumerate(ivs)
                   if iv[0] - g <= t <= iv[1] + g]
            if not hit:
                ivs.append([t, t, 1, int(v)])
            else:
                first = hit[0]
                iv = ivs[first]
                iv[0] = min(iv[0], t)
                iv[1] = max(iv[1], t)
                iv[2] += 1
                iv[3] += int(v)
                for i in reversed(hit[1:]):     # merge chained sessions
                    o = ivs.pop(i)
                    iv[0] = min(iv[0], o[0])
                    iv[1] = max(iv[1], o[1])
                    iv[2] += o[2]
                    iv[3] += o[3]
        if len(ts_us):
            self.watermark = max(self.watermark,
                                 int(ts_us.max()) - self.lateness_us)
        return self._close(self.watermark)

    def _close(self, wm) -> list[tuple]:
        out = []
        for k in list(self.open):
            keep = []
            for s, e, n, sm in self.open[k]:
                if wm > e + self.gap_us:
                    out.append((k, s, e, n, sm))
                else:
                    keep.append([s, e, n, sm])
            if keep:
                self.open[k] = keep
            else:
                del self.open[k]
        return out

    def flush(self) -> list[tuple]:
        """End-of-stream: emit every still-open session."""
        out = [(k, s, e, n, sm)
               for k, ivs in self.open.items() for s, e, n, sm in ivs]
        self.open.clear()
        return out


def streaming_sessions(events_ds, gap_s: int, lateness_s: int,
                       num_partitions: int = 8, chunk: int = 256,
                       part_col: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id",
                       value_col: str = "value_cents"):
    """-> closed sessions (part_col, session_start_us, session_end_us,
    n_events, sum_value) from a per-partition streaming replay
    (partition = ``part_col % num_partitions``, arrival = ``id_col`` —
    the SQL-reproducible scope shared by every streaming oracle here).
    Equals batch sessionization of the non-late event subset."""
    from rayspatial.util import hash_partitioned_agg

    P = num_partitions

    def add_part(batch: pa.Table) -> pa.Table:
        us = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({
            "_spart": pa.array(
                (batch.column(part_col).to_numpy() % P).astype(np.int64)),
            part_col: batch.column(part_col),
            id_col: batch.column(id_col),
            "ts_us": us,
            value_col: batch.column(value_col),
        })

    def replay(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, gdf in df.groupby("_spart", sort=True):
            gdf = gdf.sort_values(id_col, kind="stable")
            keys = gdf[part_col].to_numpy()
            ts = gdf["ts_us"].to_numpy()
            vals = gdf[value_col].to_numpy()
            ss = StreamingSessionizer(gap_s, lateness_s)
            for s in range(0, len(gdf), chunk):
                rows.extend(ss.process(keys[s:s + chunk],
                                       ts[s:s + chunk], vals[s:s + chunk]))
            rows.extend(ss.flush())
        out = pd.DataFrame(
            rows, columns=[part_col, "session_start_us", "session_end_us",
                           "n_events", "sum_value"])
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out.sort_values([part_col, "session_start_us"],
                               kind="stable")

    ds = events_ds.map_batches(add_part, batch_format="pyarrow")
    return hash_partitioned_agg(ds, ["_spart"], replay)
