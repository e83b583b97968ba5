"""Training-data operator tests (dedup / similarity / analysis) on
sf0.001, with brute-force in-process oracles.

Test strategy mirrors the reference's (SURVEY.md §5): small fixture
corpus, inline expected values / brute-force cross-checks, plus
determinism checks (same input -> same output across runs)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    from rayspatial.util import read_parquet_sized

    return read_parquet_sized(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embs_df():
    return pq.read_table(f"{SF}/embeddings.parquet").to_pandas()


# --- hashing primitives ----------------------------------------------------


def test_hash_strings_reference_values():
    from rayspatial.textops.hashing import hash_strings

    def fnv(s: str) -> int:
        h = 0xCBF29CE484222325
        for b in s.encode():
            h = ((h ^ b) * 0x100000001B3) % 2**64
        return h

    vals = ["", "a", "hello world", "x" * 300, "ünïcodé"]
    got = hash_strings(pa.array(vals, type=pa.string()))
    for v, g in zip(vals, got):
        assert int(g) == fnv(v)


def test_rolling_fingerprint_reference_values():
    from rayspatial.textops.hashing import rolling_fingerprint

    B = 0x9E3779B97F4A7C15

    def poly(s: str) -> int:
        bs = s.encode()
        return sum(
            b * pow(B, len(bs) - 1 - i, 2**64) for i, b in enumerate(bs)
        ) % 2**64

    vals = ["", "abc", "hello world"]
    got = rolling_fingerprint(pa.array(vals, type=pa.string()))
    for v, g in zip(vals, got):
        assert int(np.uint64(g)) == poly(v)


def test_word_shingles():
    from rayspatial.textops.hashing import hash_strings, word_shingle_hashes

    flat, off = word_shingle_hashes(
        pa.array(["a b c d", "x", "a b c b c d", ""]), k=3
    )
    # "a b c d" -> {"a b c","b c d"}; "x" -> {}; third -> 4 distinct
    assert list(np.diff(off)) == [2, 0, 4, 0]
    expected = np.sort(hash_strings(pa.array(["a b c", "b c d"])))
    assert np.array_equal(flat[off[0] : off[1]], expected)


# --- exact dedup -----------------------------------------------------------


def test_exact_dedup_groups(ray_session, docs_ds, docs_df):
    from rayspatial.textops.dedup import exact_dedup_groups

    got = exact_dedup_groups(docs_ds).to_pandas().sort_values("doc_id")
    ref = (
        docs_df.groupby("text")
        .agg(doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        .reset_index(drop=True)
        .sort_values("doc_id")
    )
    assert np.array_equal(got["doc_id"].to_numpy(), ref["doc_id"].to_numpy())
    assert np.array_equal(got["n_copies"].to_numpy(), ref["n_copies"].to_numpy())


def test_exact_dedup_rows_with_planted_dups(ray_session):
    import ray.data as rd

    from rayspatial.textops.dedup import exact_dedup

    tab = pa.table(
        {
            "doc_id": pa.array([5, 1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(["dup", "dup", "uniq", "dup", "other"]),
        }
    )
    out = exact_dedup(rd.from_arrow(tab)).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [1, 2, 4]  # min id survives per text


def test_exact_dedup_mega_key_map_side_combine(ray_session):
    """A mega-duplicate key (one text repeated across every block) must
    contribute at most ONE shuffle row per input block — the map-side
    combiner bounds hot keys by #blocks, not #copies — and the final
    counts/representatives stay exact."""
    import ray.data as rd

    from rayspatial.textops.dedup import (
        exact_dedup,
        exact_dedup_groups,
        exact_hash_partials,
    )

    n, nblocks = 100_000, 40
    ids = np.arange(n, dtype=np.int64)
    texts = np.where(ids % 10 == 0,
                     np.char.add("unique doc ", ids.astype(str)),
                     "the mega duplicate boilerplate page")
    tab = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    ds = rd.from_arrow(tab).repartition(nblocks)

    # Shuffle-row bound: the combiner emits <= distinct-keys-per-block
    # rows; the hot key adds at most 1 per block.
    shuffled_rows = ds.map_batches(
        exact_hash_partials, batch_format="pyarrow").count()
    n_unique = int((ids % 10 == 0).sum())
    assert shuffled_rows <= n_unique + nblocks  # NOT ~90k hot-key rows

    got = exact_dedup_groups(ds).to_pandas()
    hot = got[got["n_copies"] > 1]
    assert len(hot) == 1
    assert hot["doc_id"].iloc[0] == 1  # min id of the hot key
    assert hot["n_copies"].iloc[0] == n - n_unique
    assert len(got) == n_unique + 1

    surv = exact_dedup(ds).to_pandas()
    assert len(surv) == n_unique + 1
    assert surv["doc_id"].min() == 0 and 1 in set(surv["doc_id"])


# --- n-gram jaccard / minhash / simhash ------------------------------------


def _brute_jaccard_pairs(df: pd.DataFrame, k: int, tau: float):
    sets = {}
    for _, r in df.iterrows():
        w = r["text"].split()
        sets[r["doc_id"]] = {
            " ".join(w[i : i + k]) for i in range(max(len(w) - k + 1, 0))
        }
    ids = sorted(sets)
    out = []
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= tau:
                out.append((a, b, inter))
    return out


def test_ngram_jaccard_exact_vs_brute(ray_session, docs_ds, docs_df):
    from rayspatial.textops.dedup import ngram_jaccard_dup_pairs

    got = (
        ngram_jaccard_dup_pairs(docs_ds, k=3, threshold_pct=50)
        .to_pandas()
        .sort_values(["a", "b"])
    )
    ref = _brute_jaccard_pairs(docs_df, 3, 0.5)
    assert [tuple(r) for r in got[["a", "b", "inter"]].to_numpy()] == ref


def test_minhash_recall_on_exact_pairs(ray_session, docs_ds, docs_df):
    from rayspatial.textops.dedup import minhash_lsh_candidates

    cand = minhash_lsh_candidates(docs_ds).to_pandas()
    cand_set = set(zip(cand["a"], cand["b"]))
    strong = [(a, b) for a, b, _ in _brute_jaccard_pairs(docs_df, 3, 0.7)]
    # 16 bands x 4 rows: P(detect | s=0.7) ~ 1-(1-0.7^4)^16 ~ 0.99
    found = sum(1 for p in strong if p in cand_set)
    assert found >= 0.9 * len(strong)


def test_simhash_pairs_vs_brute(ray_session, docs_ds, docs_df):
    from rayspatial.textops.dedup import simhash_batch, simhash_dup_pairs

    got = simhash_dup_pairs(docs_ds, hamming_k=3).to_pandas()
    sh = simhash_batch(
        pa.array(docs_df["text"].tolist()), docs_df["doc_id"].to_numpy()
    ).view(np.uint64)
    ids = docs_df["doc_id"].to_numpy()
    ref = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ham = bin(int(sh[i] ^ sh[j])).count("1")
            if ham <= 3:
                a, b = sorted((int(ids[i]), int(ids[j])))
                ref.append((a, b, ham))
    got_t = sorted(
        (int(r.a), int(r.b), int(r.hamming)) for r in got.itertuples()
    )
    assert got_t == sorted(ref)


def test_connected_duplicate_groups():
    from rayspatial.textops.dedup import connected_duplicate_groups

    pairs = pd.DataFrame({"a": [1, 2, 10], "b": [2, 3, 11]})
    g = connected_duplicate_groups(pairs)
    assert g[1] == g[2] == g[3] == 1
    assert g[10] == g[11] == 10


# --- embeddings: near-dup + ANN --------------------------------------------


def _norm_mat(embs_df):
    m = np.stack(embs_df["embedding"].to_numpy()).astype(np.float64)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def test_embedding_dup_pairs_vs_brute(ray_session, embs_df):
    from rayspatial.textops.ann import embedding_dup_pairs
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{SF}/embeddings.parquet")
    got = embedding_dup_pairs(ds, threshold=0.4).to_pandas()
    m = _norm_mat(embs_df)
    ids = embs_df["vec_id"].to_numpy()
    sims = m @ m.T
    ref = set()
    iu = np.triu_indices(len(ids), k=1)
    for i, j in zip(*iu):
        if sims[i, j] >= 0.4:
            ref.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    assert set(zip(got["a"], got["b"])) == ref


def test_ann_topk_vs_brute(ray_session, embs_df):
    from rayspatial.textops.ann import ann_topk
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{SF}/embeddings.parquet")
    ids = embs_df["vec_id"].to_numpy()
    qids = ids[ids % 100 == 0]
    got = ann_topk(ds, qids, k=5).to_pandas()
    m = _norm_mat(embs_df)
    pos = {v: i for i, v in enumerate(ids)}
    for q in qids:
        s = m @ m[pos[q]]
        cand = [(v, s[pos[v]]) for v in ids if v != q]
        cand.sort(key=lambda t: (-t[1], t[0]))
        want = [v for v, _ in cand[:5]]
        sub = got[got["query_id"] == q].sort_values("rank")
        assert list(sub["neighbor_id"]) == want


def test_srp_candidates_deterministic(ray_session, embs_df):
    from rayspatial.textops.ann import srp_bucket_candidates
    from rayspatial.util import read_parquet_sized

    a = srp_bucket_candidates(read_parquet_sized(f"{SF}/embeddings.parquet")).to_pandas()
    b = srp_bucket_candidates(read_parquet_sized(f"{SF}/embeddings.parquet")).to_pandas()
    assert set(zip(a["a"], a["b"])) == set(zip(b["a"], b["b"]))


# --- analysis --------------------------------------------------------------


def test_token_counts_and_stats(ray_session, docs_ds, docs_df):
    from rayspatial.textops.analysis import text_stats, token_counts

    got = token_counts(docs_ds).to_pandas().set_index("doc_id")["n_tokens"]
    ref = docs_df.set_index("doc_id")["text"].str.split().str.len()
    assert (got.sort_index() == ref.sort_index()).all()

    st = text_stats(docs_ds).to_pandas().set_index("doc_id").sort_index()
    assert (st["n_chars"] == docs_df.set_index("doc_id")["text"].str.len().sort_index()).all()
    assert (st["n_uniq_tokens"] <= st["n_tokens"]).all()
    assert (st["n_spaces"] == docs_df.set_index("doc_id")["text"].str.count(" ").sort_index()).all()


def test_fingerprints_unique_and_deterministic(ray_session, docs_ds):
    from rayspatial.textops.analysis import fingerprints

    a = fingerprints(docs_ds).to_pandas().sort_values("doc_id")
    b = fingerprints(docs_ds).to_pandas().sort_values("doc_id")
    assert np.array_equal(a["fp"].to_numpy(), b["fp"].to_numpy())
    # distinct texts -> distinct fingerprints (no collision on corpus)
    assert a["fp"].nunique() == len(a)


def test_lang_id_mechanics(ray_session, docs_ds, docs_df):
    from rayspatial.textops.analysis import lang_id

    sample = docs_df[docs_df.doc_id < 200][["text", "lang"]]
    out = lang_id(docs_ds, sample).to_pandas()
    assert len(out) == len(docs_df)
    assert set(out["pred_lang"]) <= set(sample["lang"])
    out2 = lang_id(docs_ds, sample).to_pandas()
    m = out.set_index("doc_id")["pred_lang"].sort_index()
    assert (m == out2.set_index("doc_id")["pred_lang"].sort_index()).all()


# --- multimodal plumbing ---------------------------------------------------


def test_binary_features_stub(ray_session):
    from rayspatial.pipeline.pages import read_pages
    from rayspatial.textops.multimodal import (
        FEATURE_DIM,
        BinaryFeatureExtractor,
        _fake_decode,
        binary_features,
    )

    out = binary_features(read_pages(SF), binary_col="html", id_col="doc_id")
    df = out.to_pandas().sort_values("doc_id")
    assert len(df) == 500
    assert all(len(f) == FEATURE_DIM for f in df["features"])
    # features deterministic & equal to direct decode of the payload
    pages = read_pages(SF).take(5)
    for p in pages:
        row = df[df["doc_id"] == p["doc_id"]].iloc[0]
        assert row["payload_bytes"] == len(p["html"])
        assert np.array_equal(np.array(row["features"]), _fake_decode(p["html"]))
    # real decoder path is an explicit stub in this container
    with pytest.raises((NotImplementedError, ValueError)):
        BinaryFeatureExtractor(decoder="pil")
    with pytest.raises(ValueError):
        BinaryFeatureExtractor(decoder="nope")


def test_connected_components_distributed(ray_session):
    import ray.data as rd

    from rayspatial.textops.components import connected_components_distributed
    from rayspatial.textops.dedup import connected_duplicate_groups

    # chain 1-2-3-4, star 10-(11,12,13), pair 20-21
    pairs = pd.DataFrame(
        {
            "a": [1, 2, 3, 10, 10, 10, 20],
            "b": [2, 3, 4, 11, 12, 13, 21],
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(pairs, preserve_index=False))
    got = (
        connected_components_distributed(ds, small_edge_limit=0)
        .to_pandas()
        .set_index("doc_id")["rep"]
        .sort_index()
    )
    ref = connected_duplicate_groups(pairs)
    for node, rep in ref.items():
        assert got[node] == rep
    # components separate
    assert got[4] == 1 and got[13] == 10 and got[21] == 20

    # random graph vs driver-side union-find
    rng = np.random.RandomState(5)
    a = rng.randint(0, 200, 300)
    b = rng.randint(0, 200, 300)
    keep = a != b
    rp = pd.DataFrame({"a": np.minimum(a, b)[keep], "b": np.maximum(a, b)[keep]})
    ds2 = rd.from_arrow(pa.Table.from_pandas(rp, preserve_index=False))
    got2 = (
        connected_components_distributed(ds2, small_edge_limit=0)
        .to_pandas()
        .set_index("doc_id")["rep"]
    )
    ref2 = connected_duplicate_groups(rp)
    for node, rep in ref2.items():
        assert got2[node] == rep


def test_connected_components_bucket_mode(ray_session):
    """Bucket (no-broadcast) propagation matches the broadcast mode and
    the driver union-find on a random graph."""
    import ray.data as rd

    from rayspatial.textops.components import connected_components_distributed
    from rayspatial.textops.dedup import connected_duplicate_groups

    rng = np.random.RandomState(11)
    a = rng.randint(0, 150, 250)
    b = rng.randint(0, 150, 250)
    keep = a != b
    rp = pd.DataFrame({"a": np.minimum(a, b)[keep], "b": np.maximum(a, b)[keep]})
    ds = rd.from_arrow(pa.Table.from_pandas(rp, preserve_index=False)).repartition(4)
    got = (
        connected_components_distributed(ds, mode="bucket", small_edge_limit=0)
        .to_pandas()
        .set_index("doc_id")["rep"]
    )
    ref = connected_duplicate_groups(rp)
    for node, rep in ref.items():
        assert got[node] == rep


def test_ivf_topk_recall_and_exactness(ray_session):
    """IVF probe-filtered top-k: exact when nprobe=nlist; high recall
    vs the exact result at nprobe<<nlist."""
    from rayspatial.textops.ann import ann_topk, ivf_topk
    from rayspatial.util import read_parquet_sized

    sf = "/root/testdata/sf0.01"
    import pyarrow.parquet as pq

    vec_ids = pq.read_table(
        f"{sf}/embeddings.parquet", columns=["vec_id"]
    ).column("vec_id").to_numpy()
    qids = vec_ids[vec_ids % 50 == 0]

    def ds():
        return read_parquet_sized(f"{sf}/embeddings.parquet")

    exact = ann_topk(ds(), qids, k=5).to_pandas()
    full = ivf_topk(ds(), qids, k=5, nlist=8, nprobe=8).to_pandas()
    pd.testing.assert_frame_equal(
        exact.sort_values(["query_id", "rank"]).reset_index(drop=True),
        full.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )
    approx = ivf_topk(ds(), qids, k=5, nlist=8, nprobe=3).to_pandas()
    e = set(map(tuple, exact[["query_id", "neighbor_id"]].to_numpy()))
    a = set(map(tuple, approx[["query_id", "neighbor_id"]].to_numpy()))
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall


def test_multimodal_resize_and_frames(ray_session):
    from rayspatial.pipeline.pages import read_pages
    from rayspatial.textops.multimodal import FrameSampler, ImageResizer

    sf = "/root/testdata/sf0.001"
    pages = read_pages(sf)
    thumbs = pages.map_batches(
        ImageResizer, fn_constructor_kwargs=dict(target=16),
        batch_format="pyarrow", batch_size=128, concurrency=(1, 2),
    ).take(5)
    for t in thumbs:
        # target is an upper bound: payloads smaller than target^2
        # bytes resize to their own side length
        assert t["width"] == t["height"] <= 16
        assert len(t["thumb"]) == t["width"] * t["height"]
    n_pages = pages.count()
    frames = pages.map_batches(
        FrameSampler, fn_constructor_kwargs=dict(num_frames=3),
        batch_format="pyarrow", batch_size=128, concurrency=(1, 2),
    )
    assert frames.count() == 3 * n_pages
    with pytest.raises(NotImplementedError):
        from rayspatial.textops.multimodal import ImageResizer as IR

        IR(decoder="real")


def test_binary_embeddings_feed_ann(ray_session):
    """Multimodal -> similarity-search composition: fake embeddings
    from binary payloads flow straight into ann_topk."""
    from rayspatial.pipeline.pages import read_pages
    from rayspatial.textops.ann import ann_topk
    from rayspatial.textops.multimodal import binary_embeddings

    sf = "/root/testdata/sf0.001"
    embs = binary_embeddings(read_pages(sf), id_col="doc_id")
    out = ann_topk(embs, query_ids=[0, 100], k=3).to_pandas()
    assert set(out["query_id"]) == {0, 100}
    assert (out.groupby("query_id").size() == 3).all()


def test_split_words_unicode_whitespace_matches_str_split():
    """ADVICE round 2: RE2's \\s is ASCII-only — split_words must still
    match str.split() on Unicode whitespace (NBSP, ideographic space,
    Zl/Zp separators, isspace control chars)."""
    import pyarrow as pa

    from rayspatial.textops.hashing import split_words

    docs = [
        "hello world",
        "a b　c",            # NBSP + ideographic space
        "x y z",            # line / paragraph separator
        "p\x1cq\x85r\x1d\x1e\x1fs",   # isspace() control chars
        "    ",   # all-Zs doc -> no tokens
        " lead trail ",
        "", None,
        "tab\tsep\nnl\x0b\x0cws",
        "mixed  \t 　 runs",
    ]
    flat, off = split_words(pa.array(docs))
    flat = flat.to_pylist()
    for i, d in enumerate(docs):
        got = flat[off[i] : off[i + 1]]
        exp = d.split() if d is not None else []
        assert got == exp, (d, got, exp)


def test_plan_block_pairs_prunes_far_clusters():
    """Unit: the angular triangle-inequality plan keeps near/overlapping
    cluster pairs and drops provably-far ones."""
    import numpy as np

    from rayspatial.textops.ann import _plan_block_pairs

    e = np.eye(3)
    # tight clusters around +x, -x, +y (radius 0.05 rad)
    sums = [(e[0], 0.05), (-e[0], 0.05), (e[1], 0.05)]
    plan = {(p["i"], p["j"]) for p in _plan_block_pairs(sums, 0.95)}
    # theta_t ~= 0.318 rad; +x vs -x (pi apart) and +x vs +y (pi/2)
    # both prune; self pairs stay
    assert plan == {(0, 0), (1, 1), (2, 2)}
    # wide radius defeats pruning (conservative, never drops a hit)
    sums_wide = [(e[0], 1.2), (e[1], 1.2)]
    plan2 = {(p["i"], p["j"]) for p in _plan_block_pairs(sums_wide, 0.95)}
    assert (0, 1) in plan2
    # empty blocks contribute nothing
    assert _plan_block_pairs([None, (e[0], 0.0)], 0.95) == [{"i": 1, "j": 1}]


def test_embedding_dup_pairs_pruned_exact_on_clustered_corpus(ray_session):
    """The default (pruned) path must return EXACTLY the brute-force
    pairs on a clustered planted-dup corpus at threshold 0.95 —
    recall 1.0 is by construction, not an LSH gamble."""
    import ray.data as rd

    from rayspatial.textops.ann import embedding_dup_pairs

    rng = np.random.default_rng(11)
    d, n_clusters, per = 32, 8, 50
    base = rng.standard_normal((n_clusters, d))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    vecs, ids = [], []
    vid = 0
    for c in range(n_clusters):
        for _ in range(per):
            v = base[c] + 0.03 * rng.standard_normal(d)  # tight: dups
            vecs.append(v / np.linalg.norm(v))
            ids.append(vid)
            vid += 1
    m = np.asarray(vecs)
    tab = pa.table({
        "vec_id": pa.array(np.asarray(ids, dtype=np.int64)),
        "embedding": pa.array([list(map(float, v)) for v in m]),
    })
    # >8 blocks so the adaptive gate ENGAGES the cluster-pruned path
    ds = rd.from_arrow(tab).repartition(16)
    got = embedding_dup_pairs(ds, threshold=0.95, nlist=8).to_pandas()
    sims = m @ m.T
    iu = np.triu_indices(len(m), k=1)
    ref = {(int(min(i, j)), int(max(i, j)))
           for i, j in zip(*iu) if sims[i, j] >= 0.95}
    assert len(ref) > 100  # planted dups actually exist
    assert set(zip(got["a"], got["b"])) == ref
    # and the plain (prune=False) oracle path agrees
    got2 = embedding_dup_pairs(ds, threshold=0.95, prune=False).to_pandas()
    assert set(zip(got2["a"], got2["b"])) == ref


def test_ivf_indexed_read_skipping(ray_session, tmp_path):
    """Round-2 verdict item 9: the materialized list-partitioned IVF
    index reads ONLY probed partitions (checked via input_files) and
    returns exactly the in-stream ivf_topk result for the same
    centroids/parameters."""
    import os

    import pyarrow.parquet as pq

    from rayspatial.textops.ann import (
        _emb_matrix,
        ivf_build_index,
        ivf_topk,
        ivf_topk_indexed,
    )
    from rayspatial.util import read_parquet_sized

    sf = "/root/testdata/sf0.01"
    idx = str(tmp_path / "ivf_index")
    ivf_build_index(read_parquet_sized(f"{sf}/embeddings.parquet"), idx,
                    nlist=8)
    n_parts = len([d for d in os.listdir(idx) if d.startswith("list=")])
    assert n_parts == 8

    tab = pq.read_table(f"{sf}/embeddings.parquet")
    vec_ids = tab.column("vec_id").to_numpy()
    all_qids = vec_ids[vec_ids % 50 == 0]
    qids = all_qids[:2]  # few queries -> probed union < nlist
    pos = {v: i for i, v in enumerate(vec_ids)}
    qmat = _emb_matrix(tab)[np.asarray([pos[q] for q in qids])]

    res = ivf_topk_indexed(idx, qids, qmat, k=5, nprobe=2)
    # read skipping: the plan's input files span only probed lists
    read_lists = {
        f.split("list=")[1].split("/")[0] for f in res.input_files()
    }
    assert len(read_lists) <= 4  # 2 queries x nprobe 2
    assert len(read_lists) < n_parts  # skipping actually happened
    got = res.to_pandas()

    stream = ivf_topk(read_parquet_sized(f"{sf}/embeddings.parquet"),
                      qids, k=5, nlist=8, nprobe=2).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values(["query_id", "rank"]).reset_index(drop=True),
        stream.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )


def test_connected_components_small_graph_fast_path(ray_session):
    """The size-gated single-task union-find returns exactly the
    distributed fixpoint's labels (same deterministic min-id rep)."""
    import ray.data as rd

    from rayspatial.textops.components import connected_components_distributed

    rng = np.random.RandomState(23)
    a = rng.randint(0, 300, 500)
    b = rng.randint(0, 300, 500)
    keep = a != b
    rp = pd.DataFrame({"a": np.minimum(a, b)[keep], "b": np.maximum(a, b)[keep]})
    ds = rd.from_arrow(pa.Table.from_pandas(rp, preserve_index=False)).repartition(4)
    fast = (
        connected_components_distributed(ds)  # fast path (edges << limit)
        .to_pandas().set_index("doc_id")["rep"].sort_index()
    )
    slow = (
        connected_components_distributed(ds, small_edge_limit=0)
        .to_pandas().set_index("doc_id")["rep"].sort_index()
    )
    pd.testing.assert_series_equal(fast, slow)


def test_repetition_stats_vs_python_reference(ray_session):
    import ray.data as rd

    from rayspatial.textops.analysis import repetition_stats

    texts = [
        "a b c d e f g h i j k l m n o p q r s t",     # 20 uniq words
        "a a a a a a a a a a b c d e f g h i j k",     # top-word heavy
        "x y x y x y x y x y x y x y x y x y x y",     # top-bigram heavy
        "",                                             # empty
        "solo",                                         # one word
        "  padded   with   unicode　spaces  ",
        "w " * 50,                                      # repeated single word
        " ".join(f"t{i}" for i in range(40)),           # all unique, long
    ]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    got = (
        repetition_stats(rd.from_pandas(df))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )

    for i, t in enumerate(texts):
        ws = t.split()
        n_words = len(ws)
        from collections import Counter
        wc = Counter(ws)
        bc = Counter(zip(ws, ws[1:]))
        n_uniq = len(wc)
        top_w = max(wc.values()) if wc else 0
        top_b = max(bc.values()) if bc else 0
        keep = int(n_words >= 20 and top_w * 8 <= n_words
                   and n_uniq * 5 >= n_words * 2)
        row = got.iloc[i]
        assert row.n_words == n_words, (i, t)
        assert row.n_uniq_words == n_uniq, (i, t)
        assert row.top_word_n == top_w, (i, t)
        assert row.top_bigram_n == top_b, (i, t)
        assert row.keep == keep, (i, t)


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_deterministic_and_calibrated():
    import ray.data as rd

    from rayspatial.textops.sampling import stratified_sample

    n = 4000
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(["en" if i % 2 else "fr" for i in range(n)]),
    })
    kept1 = stratified_sample(
        rd.from_arrow(t).repartition(7), rates={"en": 0.25}
    ).to_pandas().sort_values("doc_id")
    kept2 = stratified_sample(
        rd.from_arrow(t).repartition(2), rates={"en": 0.25}
    ).to_pandas().sort_values("doc_id")
    # identical sample regardless of partitioning
    assert kept1["doc_id"].tolist() == kept2["doc_id"].tolist()
    en = (kept1["lang"] == "en").sum()
    fr = (kept1["lang"] == "fr").sum()
    assert fr == n // 2                      # default rate 1.0 keeps all
    assert abs(en / (n // 2) - 0.25) < 0.03  # hash rate ~ nominal


@pytest.mark.usefixtures("ray_session")
def test_tfidf_topk_small():
    import ray.data as rd

    from rayspatial.textops.tfidf import tfidf_topk

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array([
            "apple apple banana shared",
            "banana cherry shared",
            "cherry cherry cherry shared",
        ]),
    })
    out = tfidf_topk(rd.from_arrow(docs).repartition(3), n_docs=3, k=2) \
        .to_pandas().sort_values(["doc_id", "score_micro", "term"],
                                 ascending=[True, False, True])
    # 'shared' has df=3 -> idf ln(1)=0 -> score 0: never in top-2 when
    # any nonzero-score term exists
    by_doc = out.groupby("doc_id")["term"].apply(list).to_dict()
    assert by_doc[0] == ["apple", "banana"]       # tf2*ln(3/1) > tf1*ln(3/2)
    assert by_doc[2][0] == "cherry"
    ln3_micro = int(np.round(np.log(3.0) * 1e6))
    a = out[(out.doc_id == 0) & (out.term == "apple")]
    assert a["tf"].iloc[0] == 2 and a["df"].iloc[0] == 1
    assert a["score_micro"].iloc[0] == 2 * ln3_micro


def test_assemble_labels_skips_schemaless_empty_blocks(ray_session):
    """All-to-all stages can emit empty blocks with NO schema (ray
    plan_udf_map_op.py passes them through map_batches uncalled, but
    raw to_arrow_refs consumers see them).  The per-worker label
    assembly must skip them instead of KeyError-ing on doc_id —
    the root cause of the flaky fast-path comparison."""
    import ray

    from rayspatial.textops.components import _assemble_labels

    good = pa.table({"doc_id": pa.array([3, 1], type=pa.int64()),
                     "label": pa.array([30, 10], type=pa.int64())})
    refs = (ray.put(pa.table({})), ray.put(good), ray.put(pa.table({})))
    keys, vals = _assemble_labels(("regression-empty-blocks", 0), refs)
    assert keys.tolist() == [1, 3]
    assert vals.tolist() == [10, 30]


def test_top_terms_exact_vs_python(ray_session):
    """Corpus-wide heavy hitters match a single-process count with the
    (count desc, term asc) tie order, across partitioned input."""
    import collections

    import ray.data as rd

    from rayspatial.textops.analysis import top_terms

    rng = np.random.RandomState(11)
    vocab = [f"w{i}" for i in range(50)]
    texts = [" ".join(rng.choice(vocab, rng.randint(0, 30)))
             for _ in range(400)] + ["", "   ", "w0\tw0\nw1"]
    ds = rd.from_arrow(pa.table({"text": pa.array(texts)})).repartition(7)
    got = top_terms(ds, k=10).to_pandas()
    cnt = collections.Counter(w for t in texts for w in t.split())
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["term"], got["cnt"])) == want


def test_decontaminate_vs_brute(ray_session, docs_ds, docs_df):
    """decontaminate == per-doc Python k-gram membership reference."""
    import ray.data as rd

    from rayspatial.textops.decontam import decontaminate

    k = 4
    is_bench = docs_df.doc_id % 23 == 0
    bench_ngrams = set()
    for t in docs_df.text[is_bench]:
        ws = t.split()
        for j in range(len(ws) - k + 1):
            bench_ngrams.add(" ".join(ws[j : j + k]))
    expect = []
    for i, t in zip(docs_df.doc_id[~is_bench], docs_df.text[~is_bench]):
        ws = t.split()
        if not any(
            " ".join(ws[j : j + k]) in bench_ngrams
            for j in range(len(ws) - k + 1)
        ):
            expect.append(i)

    bench_ds = rd.from_pandas(docs_df[is_bench])
    train_ds = rd.from_pandas(docs_df[~is_bench])
    got = decontaminate(train_ds, bench_ds, k=k).to_pandas()
    assert sorted(got.doc_id) == sorted(expect)
    assert list(got.columns) == ["doc_id", "n_chars"]
    # some contamination must actually occur for the test to mean anything
    assert len(expect) < int((~is_bench).sum())


def test_decontaminate_edge_cases(ray_session):
    """Short docs (< k words) always survive; empty benchmark keeps all;
    exact copies of bench docs are dropped."""
    import ray.data as rd

    from rayspatial.textops.decontam import decontaminate

    bench = pd.DataFrame({"doc_id": [100], "text": ["a b c d e"], "n_chars": [9]})
    train = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a b c d e",        # exact copy -> dropped
                "x a b c d y",      # contains bench 4-gram -> dropped
                "a b c",            # < k words -> kept
                "q w e r t y",      # clean -> kept
            ],
            "n_chars": [9, 11, 5, 11],
        }
    )
    got = decontaminate(
        rd.from_pandas(train), rd.from_pandas(bench), k=4
    ).to_pandas()
    assert sorted(got.doc_id) == [3, 4]

    empty_bench = rd.from_pandas(bench.iloc[0:0])
    got2 = decontaminate(rd.from_pandas(train), empty_bench, k=4).to_pandas()
    assert sorted(got2.doc_id) == [1, 2, 3, 4]


def test_pack_sequences_vs_brute(ray_session, docs_ds, docs_df):
    """pack_sequences == sequential Python greedy per (lang, win)."""
    from rayspatial.textops.packing import pack_sequences

    budget, window = 256, 64
    got = (
        pack_sequences(docs_ds, budget=budget, window=window)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    df = docs_df.assign(
        win=docs_df.doc_id // window,
        nt=[len(t.split()) for t in docs_df.text],
    ).sort_values("doc_id")
    expect = {}
    for (_, _), grp in df.groupby(["lang", "win"], sort=False):
        b, run = 0, None
        for r in grp.itertuples():
            if run is None:
                run = r.nt
            elif run + r.nt > budget:
                b, run = b + 1, r.nt
            else:
                run += r.nt
            expect[r.doc_id] = (b, r.nt)
    assert len(got) == len(df)
    for r in got.itertuples():
        assert (r.bin, r.n_tokens) == expect[r.doc_id], r.doc_id
    # packing must actually split: some unit has more than one bin
    assert got.bin.max() >= 1


def test_pack_sequences_edges(ray_session):
    """Over-budget doc gets its own bin; zero-token docs join the
    current bin; result independent of block layout."""
    import ray.data as rd

    from rayspatial.textops.packing import pack_sequences

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4],
            "lang": ["en"] * 5,
            "text": ["w " * 300, "a b c", "", "d e", "f " * 250],
        }
    )
    for nblocks in (1, 5):
        got = (
            pack_sequences(
                rd.from_pandas(docs).repartition(nblocks),
                budget=10,
                window=1000,
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        # doc0 (300 tok) own bin 0; doc1 (3) opens bin 1; doc2 (0) joins;
        # doc3 (2) joins (3+0+2<=10); doc4 (250) overflows -> bin 2
        assert list(got.bin) == [0, 1, 1, 1, 2]
        assert list(got.n_tokens) == [300, 3, 0, 2, 250]


def test_bigram_lm_scores_vs_brute(ray_session, docs_ds, docs_df):
    """bigram_lm_scores == per-doc Python add-one bigram LM."""
    from collections import Counter

    from rayspatial.textops.lm import bigram_lm_scores

    uni, bi = Counter(), Counter()
    for t in docs_df.text:
        ws = t.split()
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    V = len(uni)

    got = bigram_lm_scores(docs_ds).to_pandas().set_index("doc_id")
    assert len(got) == len(docs_df)
    for i, t in zip(docs_df.doc_id, docs_df.text):
        ws = t.split()
        expect = sum(
            int(np.round(np.log((bi[(a, b)] + 1.0) / (uni[a] + V)) * 1e6))
            for a, b in zip(ws, ws[1:])
        )
        assert got.loc[i, "lm_score_micro"] == expect, i
        assert got.loc[i, "n_bigrams"] == max(len(ws) - 1, 0)


def test_bigram_lm_scores_short_docs(ray_session):
    """Docs with <2 tokens score 0 with 0 bigrams."""
    import ray.data as rd

    from rayspatial.textops.lm import bigram_lm_scores

    docs = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["solo", "", "a b a b"]}
    )
    got = (
        bigram_lm_scores(rd.from_pandas(docs))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(got.n_bigrams) == [0, 0, 3]
    assert got.lm_score_micro.iloc[0] == 0 and got.lm_score_micro.iloc[1] == 0
    # model: uni a=2 b=2 solo=1 V=3; ab: c12=2 c1=5? no: uni[a]=2 -> ln(3/5)
    ab = round(np.log((2 + 1) / (2 + 3)) * 1e6)
    ba = round(np.log((1 + 1) / (2 + 3)) * 1e6)
    assert got.lm_score_micro.iloc[2] == 2 * ab + ba


def test_cap_per_group_vs_brute(ray_session, docs_ds, docs_df):
    """cap_per_group == pandas groupby.head, partition-independent."""
    from rayspatial.textops.sampling import cap_per_group

    capped = cap_per_group(
        docs_ds.map_batches(
            lambda b: b.select(["doc_id", "source"]), batch_format="pyarrow"
        ),
        "source",
        3,
        order_col="doc_id",
    ).to_pandas()
    want = (
        docs_df[["doc_id", "source"]]
        .sort_values(["source", "doc_id"])
        .groupby("source", sort=False)
        .head(3)
    )
    assert sorted(capped.doc_id) == sorted(want.doc_id)
    assert capped.groupby("source").size().max() == 3


def test_build_vocab_vs_brute(ray_session, docs_ds, docs_df):
    """build_vocab == Counter + rank; ids contiguous from 0."""
    from collections import Counter

    from rayspatial.textops.analysis import build_vocab

    cnt = Counter()
    for t in docs_df.text:
        cnt.update(t.split())
    want = sorted(
        ((c, w) for w, c in cnt.items() if c >= 3),
        key=lambda x: (-x[0], x[1]),
    )
    got = build_vocab(docs_ds, min_count=3).to_pandas()
    got = got.sort_values("token_id").reset_index(drop=True)
    assert list(got.token_id) == list(range(len(want)))
    assert [(c, w) for w, c in zip(got.term, got.cnt)] == want


def test_pmi_collocations_vs_brute(ray_session, docs_ds, docs_df):
    """pmi_collocations == Counter brute force with the same integer
    quantization and tie order."""
    from collections import Counter

    from rayspatial.textops.lm import pmi_collocations

    uni, bi = Counter(), Counter()
    n1 = n12 = 0
    for t in docs_df.text:
        ws = t.split()
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
        n1 += len(ws)
        n12 += max(len(ws) - 1, 0)
    cand = []
    for (a, b), c12 in bi.items():
        if c12 >= 5:
            num = float(c12 * n1 * n1)
            den = float(n12 * uni[a] * uni[b])
            cand.append((int(np.round(np.log(num / den) * 1e6)), a, b, c12))
    cand.sort(key=lambda x: (-x[0], x[1], x[2]))
    want = cand[:25]

    got = pmi_collocations(docs_ds, k=25, min_count=5).to_pandas()
    assert len(got) == len(want)
    for row, (pmi, a, b, c12) in zip(got.itertuples(), want):
        assert (row.w1, row.w2, row.c12, row.pmi_micro) == (a, b, c12, pmi)


def test_pca_distributed_matches_serial(ray_session, embs_df):
    """Distributed PCA == single-process reference on the same
    quantized moments, bit-exact, and partitioning-independent."""
    import ray.data as rd

    from rayspatial.textops.pca import pca_fit, pca_project

    Q = 1_000_000
    m = np.round(
        np.stack(embs_df.embedding.to_numpy()).astype(np.float64) * Q
    ).astype(np.int64)
    n, d = m.shape
    s1 = m.sum(axis=0)
    mean_q = s1 / n
    cov = (m.T.astype(np.float64) @ m.astype(np.float64)
           - np.outer(mean_q, s1)) / n
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:8]
    comps = v[:, order].T
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    want = np.round((m - mean_q) @ comps.T).astype(np.int64)

    tab = pa.table({
        "vec_id": pa.array(embs_df.vec_id.to_numpy()),
        "embedding": pa.array(embs_df.embedding.to_list(),
                              type=pa.list_(pa.float32())),
    })
    for nblocks in (2, 7):
        ds = rd.from_arrow(tab).repartition(nblocks)
        mq, c, _ = pca_fit(ds, n_components=8)
        assert np.array_equal(mq, mean_q) and np.allclose(c, comps, atol=0)
        got = pca_project(ds, mq, c).to_pandas().set_index("vec_id")
        for vid, row in zip(embs_df.vec_id, want):
            assert np.array_equal(np.asarray(got.loc[vid, "pc"]), row)
    # variance must concentrate: top-8 explain more than 8/64 uniformly
    assert (np.sort(w)[::-1][:8].sum() / w.sum()) > 8 / 64


def test_heavy_hitters_exact_vs_top_terms(ray_session, docs_ds):
    """Sketch-then-verify top-k == the exact top_terms result, even
    with tiny MG summaries (m=16 forces real truncation)."""
    from rayspatial.textops.analysis import heavy_hitters_topk, top_terms

    want = top_terms(docs_ds, k=10).to_pandas()
    for m in (16, 512):
        got = heavy_hitters_topk(docs_ds, k=10, m=m).to_pandas()
        assert list(got.term) == list(want.term), m
        assert list(got.cnt) == list(want.cnt), m


def test_incremental_dedup_against_index(ray_session, tmp_path):
    """New-shard dedup against a persisted hash index == Python
    reference; only the shard's buckets are opened; rebuild-free."""
    import ray.data as rd

    from rayspatial.textops.dedup import (
        build_hash_index,
        dedup_against_index,
    )

    old = pd.DataFrame({
        "doc_id": np.arange(100, dtype=np.int64),
        "text": [f"old doc {i % 30}" for i in range(100)],
    })
    new = pd.DataFrame({
        "doc_id": np.arange(1000, 1060, dtype=np.int64),
        "text": (
            [f"old doc {i}" for i in range(20)]       # all in index
            + [f"new doc {i % 10}" for i in range(30)]  # in-shard dups
            + [f"unique {i}" for i in range(10)]
        ),
    })
    idx = str(tmp_path / "hidx")
    build_hash_index(rd.from_pandas(old).repartition(3), idx)
    got = dedup_against_index(
        rd.from_pandas(new).repartition(4), idx
    ).to_pandas()

    seen = set(old.text)
    expect = []
    local = set()
    for r in new.itertuples():
        if r.text in seen or r.text in local:
            continue
        local.add(r.text)
        expect.append(r.doc_id)
    assert sorted(got.doc_id) == sorted(expect)
    assert len(expect) == 10 + 10  # 10 first-of-dup-group + 10 unique


def test_quantize_int8_vs_brute(ray_session, embs_df):
    """quantize_int8 == single-process integer reference; q in [0,255];
    partitioning-independent."""
    import ray.data as rd

    from rayspatial.textops.pca import quantize_int8

    Q = 1_000_000
    m = np.round(
        np.stack(embs_df.embedding.to_numpy()).astype(np.float64) * Q
    ).astype(np.int64)
    mn, mx = m.min(axis=0), m.max(axis=0)
    span = np.where(mx - mn == 0, 1, mx - mn)
    want = (m - mn) * 255 // span
    want[:, mx - mn == 0] = 0

    tab = pa.table({
        "vec_id": pa.array(embs_df.vec_id.to_numpy()),
        "embedding": pa.array(embs_df.embedding.to_list(),
                              type=pa.list_(pa.float32())),
    })
    got = quantize_int8(
        rd.from_arrow(tab).repartition(5)
    ).to_pandas()
    assert got.q.between(0, 255).all()
    piv = got.pivot(index="vec_id", columns="dim", values="q")
    piv = piv.loc[embs_df.vec_id.to_numpy()]
    assert np.array_equal(piv.to_numpy(), want)


def test_bigram_lm_min_model_count_prunes_tail(ray_session, docs_ds, docs_df):
    """min_model_count prunes rare bigrams from the model; pruned
    bigrams score through the 0+1 smoothing path."""
    from collections import Counter

    from rayspatial.textops.lm import bigram_lm_scores

    uni, bi = Counter(), Counter()
    for t in docs_df.text:
        ws = t.split()
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    V, thresh = len(uni), 3

    got = bigram_lm_scores(
        docs_ds, min_model_count=thresh).to_pandas().set_index("doc_id")
    for i, t in list(zip(docs_df.doc_id, docs_df.text))[:50]:
        ws = t.split()
        expect = sum(
            int(np.round(np.log(
                ((bi[(a, b)] if bi[(a, b)] >= thresh else 0) + 1.0)
                / (uni[a] + V)) * 1e6))
            for a, b in zip(ws, ws[1:])
        )
        assert got.loc[i, "lm_score_micro"] == expect, i


def test_exact_dedup_normalized(ray_session):
    """Case/whitespace variants collapse into one group; distinct
    content stays apart."""
    import ray.data as rd

    from rayspatial.textops.dedup import exact_dedup_groups_normalized

    docs = pd.DataFrame({
        "doc_id": np.arange(5, dtype=np.int64),
        "text": ["Hello  World", "hello world", "  HELLO\tWORLD ",
                 "hello worlds", "unrelated"],
    })
    got = exact_dedup_groups_normalized(
        rd.from_pandas(docs).repartition(2)
    ).to_pandas().sort_values("doc_id")
    assert list(got.doc_id) == [0, 3, 4]
    assert list(got.n_copies) == [3, 1, 1]


def test_snapshot_diff_statuses(ray_session):
    """All four statuses classified correctly across block layouts."""
    import ray.data as rd

    from rayspatial.textops.dedup import snapshot_diff

    old = pd.DataFrame({
        "doc_id": np.array([1, 2, 3, 4], dtype=np.int64),
        "text": ["a", "b", "c", "d"],
    })
    new = pd.DataFrame({
        "doc_id": np.array([2, 3, 4, 5], dtype=np.int64),
        "text": ["b", "C!", "d", "e"],
    })
    got = snapshot_diff(
        rd.from_pandas(old).repartition(2),
        rd.from_pandas(new).repartition(3),
    ).to_pandas().set_index("doc_id")
    assert got.loc[1, "status"] == "removed"
    assert got.loc[2, "status"] == "same"
    assert got.loc[3, "status"] == "changed"
    assert got.loc[4, "status"] == "same"
    assert got.loc[5, "status"] == "added"


def test_chunk_documents_vs_brute(ray_session):
    """chunk_documents == Python slicing reference, incl. short, exact
    one-window and empty docs; stride/window arg validation."""
    import ray.data as rd

    from rayspatial.textops.chunking import chunk_documents

    texts = {
        0: "a b c",                            # short: 1 chunk
        1: " ".join(f"t{i}" for i in range(10)),   # exactly 2 chunks w=6 s=4
        2: "",                                 # empty: no chunks
        3: " ".join(f"u{i}" for i in range(6)),    # == window: 1 chunk
        4: " ".join(f"v{i}" for i in range(11)),   # 2 chunks + tail -> 3? (11-6)/4 ceil=2 -> 3 chunks
    }
    docs = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    got = chunk_documents(
        rd.from_pandas(docs).repartition(2), window=6, stride=4
    ).to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)

    expect = []
    for d, t in texts.items():
        ws = t.split()
        n = len(ws)
        if n == 0:
            continue
        m = max(-(-(n - 6) // 4), 0) + 1
        for i in range(m):
            seg = ws[i * 4: i * 4 + 6]
            expect.append((d, i, len(seg), " ".join(seg)))
    assert [tuple(r) for r in got.itertuples(index=False)] == expect

    with pytest.raises(ValueError):
        chunk_documents(rd.from_pandas(docs), window=0)


def test_train_val_test_split_deterministic(ray_session, docs_ds):
    """Split is key-deterministic (identical across runs/layouts),
    disjoint and complete; ppm validation."""
    import ray.data as rd

    from rayspatial.textops.sampling import train_val_test_split

    a = train_val_test_split(docs_ds).to_pandas().set_index("doc_id")
    b = train_val_test_split(
        docs_ds.repartition(7)).to_pandas().set_index("doc_id")
    assert (a.sort_index().split == b.sort_index().split).all()
    assert set(a.split.unique()) <= {"train", "val", "test"}
    assert len(a) == a.index.nunique()

    with pytest.raises(ValueError):
        train_val_test_split(docs_ds, val_ppm=900_000, test_ppm=200_000)


def test_canonical_urls_rules(ray_session):
    """Canonicalization collapses case/port/query/slash variants and
    keeps the min-id representative; distinct pages stay apart."""
    import ray.data as rd

    from rayspatial.textops.curation import canonical_urls

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "url": [
            "HTTPS://Site-1.Example.com/Page/9",
            "https://site-1.example.com:443/Page/9?utm=z#frag",
            "https://site-1.example.com/Page/9/",
            "http://site-1.example.com:80/Page/9",    # http != https? same host/path but scheme differs
            "https://site-1.example.com/Page/10",
            "https://other.example.com/Page/9",
        ],
    })
    got = canonical_urls(
        rd.from_pandas(docs).repartition(2)
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # 0,1,2 collapse (https variants); 3 is http (different canonical);
    # 4 and 5 distinct
    assert list(got.doc_id) == [0, 3, 4, 5]
    assert got.loc[0, "canon_url"] == "https://site-1.example.com/Page/9"
    assert got.loc[1, "canon_url"] == "http://site-1.example.com/Page/9"


def test_new_ops_empty_inputs(ray_session):
    """Every round-3 operator survives empty inputs (schema-preserving
    empty results or a clear error), as empty filter results occur in
    real plans."""
    import ray.data as rd

    from rayspatial.ops.analytic import funnel, rolling_time_window
    from rayspatial.textops.chunking import chunk_documents
    from rayspatial.textops.decontam import decontaminate
    from rayspatial.textops.dedup import snapshot_diff
    from rayspatial.textops.lm import bigram_lm_scores
    from rayspatial.textops.packing import pack_sequences
    from rayspatial.textops.sampling import cap_per_group, train_val_test_split

    docs = pd.DataFrame({
        "doc_id": pd.Series(dtype="int64"),
        "text": pd.Series(dtype="str"),
        "lang": pd.Series(dtype="str"),
    })
    empty = rd.from_pandas(docs)
    some = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(3, dtype=np.int64),
        "text": ["a b c d e f", "g h", ""],
        "lang": ["en"] * 3,
    }))

    assert decontaminate(some, empty, k=2, keep_cols=()).count() == 3
    assert decontaminate(empty, some, k=2, keep_cols=()).count() == 0
    assert pack_sequences(empty).count() == 0
    assert bigram_lm_scores(empty).count() == 0
    assert chunk_documents(empty).count() == 0
    assert cap_per_group(empty, "lang", 2).count() == 0
    assert train_val_test_split(empty).count() == 0
    assert snapshot_diff(empty, some).count() == 3   # all 'added'
    assert snapshot_diff(some, empty).count() == 3   # all 'removed'

    ev = pd.DataFrame({
        "event_id": pd.Series(dtype="int64"),
        "user_id": pd.Series(dtype="int64"),
        "ts": pd.Series(dtype="datetime64[us]"),
        "cents": pd.Series(dtype="int64"),
        "event_type": pd.Series(dtype="str"),
    })
    eempty = rd.from_pandas(ev)
    assert rolling_time_window(
        eempty, "user_id", "ts", "cents", window_us=1000,
        id_cols=["event_id"]).count() == 0
    assert funnel(eempty, ["a", "b"]).count() == 0


def test_append_hash_index_incremental_flow(ray_session, tmp_path):
    """Shard flow: build index on A; dedup S1; APPEND S1; dedup S2 —
    S2 must now collide with both A and S1 (stale caches invalidated
    by the file-list cache key)."""
    import ray.data as rd

    from rayspatial.textops.dedup import (
        append_hash_index,
        build_hash_index,
        dedup_against_index,
    )

    idx = str(tmp_path / "hidx2")
    A = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                      "text": [f"base {i}" for i in range(10)]})
    build_hash_index(rd.from_pandas(A), idx)

    S1 = pd.DataFrame({"doc_id": np.arange(100, 104, dtype=np.int64),
                       "text": ["base 3", "s1 a", "s1 b", "s1 a"]})
    got1 = dedup_against_index(rd.from_pandas(S1), idx).to_pandas()
    assert sorted(got1.doc_id) == [101, 102]   # 'base 3' dup, 's1 a' x2

    append_hash_index(rd.from_pandas(S1), idx)

    S2 = pd.DataFrame({"doc_id": np.arange(200, 204, dtype=np.int64),
                       "text": ["s1 a", "base 7", "s2 new", "s1 b"]})
    got2 = dedup_against_index(rd.from_pandas(S2), idx).to_pandas()
    assert sorted(got2.doc_id) == [202]


def test_heavy_hitters_flat_distribution_falls_back_exact(ray_session):
    """ADVICE r3: when the k-th count <= N/m the MG candidate set can
    silently miss true top-k terms — the guard must route to the exact
    path.  A flat corpus (every term near-equal count) with tiny m
    exercises it: results must equal top_terms exactly."""
    import ray.data as rd

    from rayspatial.textops.analysis import heavy_hitters_topk, top_terms

    rng = np.random.default_rng(5)
    # 3000 distinct terms, each appearing 4-6 times: with m=8 the MG
    # slack N/m >> f_k, so the sketch is uninformative
    terms = [f"w{i:04d}" for i in range(3000)]
    toks = np.repeat(terms, rng.integers(4, 7, len(terms)))
    rng.shuffle(toks)
    docs = pd.DataFrame({
        "doc_id": np.arange(150),
        "text": [" ".join(toks[i::150]) for i in range(150)],
    })
    ds = rd.from_pandas(docs).repartition(6)
    got = heavy_hitters_topk(ds, k=10, m=8).to_pandas()
    ref = top_terms(ds, k=10).to_pandas()
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  ref.reset_index(drop=True))


def test_bigram_lm_unigram_cap_bounds_gather_keeps_v_exact(ray_session):
    """Round-3 verdict item 5: the unigram dimension of the broadcast
    model must be boundable.  On a heavy-vocab corpus (every token
    unique), min_unigram_count=2 prunes the entire unigram tail from
    the gather while V stays exact, and pruned-unigram transitions
    score with c1=0 (the documented +V smoothing floor)."""
    import math

    import ray.data as rd

    from rayspatial.textops.lm import _corpus_counts, bigram_lm_scores

    # 2000 singleton tokens + 2 frequent ones
    toks = [f"t{i:05d}" for i in range(2000)]
    docs = pd.DataFrame({
        "doc_id": np.arange(41, dtype=np.int64),
        "text": [" ".join(toks[i * 50:(i + 1) * 50]) for i in range(40)]
        + ["the the the the the cat cat cat cat cat"],
    })
    ds = rd.from_pandas(docs).repartition(4)
    uh, uc, bh, bc, V = _corpus_counts(ds, "text", min_model_count=2,
                                       min_unigram_count=2)
    assert V == 2002                     # exact despite pruning
    assert len(uh) == 2                  # only 'the'/'cat' survive
    # model gather bounded: uni rows + bi rows well under the corpus
    # vocabulary (the unpruned gather would be >= 2002 unigram rows)
    assert len(uh) + len(bh) < 50
    # under-cap corpora unaffected: thresholds of 1 == unpruned model
    got = bigram_lm_scores(ds, min_model_count=1, min_unigram_count=1
                           ).to_pandas().set_index("doc_id")
    # pruned-model scoring still well-defined for frequent tokens
    got2 = bigram_lm_scores(ds, min_model_count=2, min_unigram_count=2
                            ).to_pandas().set_index("doc_id")
    # doc 40: 'the'x5 'cat'x5 -> bigrams the-the x4, the-cat, cat-cat x4
    # with exact c: c(the)=c(cat)=5, c12(the,the)=4, (the,cat)=1, (cat,cat)=4
    # each bigram term quantizes to micro-nats BEFORE the per-doc sum
    t_kept = round(math.log((4 + 1) / (5 + 2002)) * 1e6)   # the-the/cat-cat
    t_pruned = round(math.log((0 + 1) / (5 + 2002)) * 1e6)  # the-cat pruned
    exp = 4 * t_kept + t_pruned + 4 * t_kept
    assert int(got2.loc[41 - 1, "lm_score_micro"]) == exp
    assert int(got.loc[40, "n_bigrams"]) == 9


def test_bmp_codec_roundtrip():
    """Pure-numpy BMP encode/decode round-trips exactly, including
    widths that need 4-byte row padding and top-down files."""
    from rayspatial.textops.multimodal import decode_bmp, encode_bmp

    rng = np.random.default_rng(2)
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 13), (2, 64)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(img)) == img).all(), (h, w)
    # top-down variant (negative biHeight)
    import struct

    img = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    b = bytearray(encode_bmp(img[::-1]))  # encoder writes bottom-up
    struct.pack_into("<i", b, 22, -4)     # flip to top-down
    assert (decode_bmp(bytes(b)) == img[::-1][::-1]).all()
    with pytest.raises(ValueError, match="BMP"):
        decode_bmp(b"nope")
    with pytest.raises(ValueError, match="24-bit"):
        bad = bytearray(encode_bmp(img))
        struct.pack_into("<H", bad, 28, 8)  # claim 8bpp
        decode_bmp(bytes(bad))


def test_binary_features_bmp_decoder(ray_session):
    """decoder='bmp' emits REAL decoded statistics through the actor
    pool (verdict r3 item 9: the multimodal component decodes, not
    stubs)."""
    import ray.data as rd

    from rayspatial.textops.multimodal import binary_features, encode_bmp

    rng = np.random.default_rng(4)
    imgs = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            for _ in range(20)]
    df = pd.DataFrame({"doc_id": np.arange(20, dtype=np.int64),
                       "img": [encode_bmp(im) for im in imgs]})
    out = binary_features(rd.from_pandas(df).repartition(3),
                          binary_col="img", id_col="doc_id",
                          decoder="bmp", batch_size=8
                          ).to_pandas().set_index("doc_id").sort_index()
    for i, im in enumerate(imgs):
        f = np.asarray(out.loc[i, "features"])
        assert f[0] == 8 and f[1] == 8
        assert f[2] == im[:, :, 0].sum() and f[3] == im[:, :, 1].sum()
        assert f[4] == im[:, :, 2].sum()
        assert f[5] == im.min() and f[6] == im.max()
        assert f[7] == im.sum()


def test_wav_codec_roundtrip():
    """Pure-numpy RIFF/PCM16 encode/decode round-trips exactly (mono,
    stereo, extra chunk before data)."""
    import struct

    from rayspatial.textops.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(6)
    mono = rng.integers(-32768, 32768, 300).astype(np.int16)
    s, rate = decode_wav(encode_wav(mono, 16000))
    assert rate == 16000 and s.shape == (300, 1)
    assert (s[:, 0] == mono).all()
    stereo = rng.integers(-32768, 32768, (128, 2)).astype(np.int16)
    s2, r2 = decode_wav(encode_wav(stereo, 44100))
    assert r2 == 44100 and (s2 == stereo).all()
    # tolerate a LIST chunk between fmt and data (chunk-walk, not
    # fixed offsets)
    raw = encode_wav(mono, 8000)
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    patched = raw[:36] + extra + raw[36:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    s3, r3 = decode_wav(patched)
    assert r3 == 8000 and (s3[:, 0] == mono).all()
    with pytest.raises(ValueError, match="WAVE"):
        decode_wav(b"RIFFxxxxJUNK" + b"\x00" * 64)
    with pytest.raises(ValueError, match="PCM"):
        bad = bytearray(raw)
        struct.pack_into("<H", bad, 20, 3)  # float format tag
        decode_wav(bytes(bad))


def test_pq_encode_and_adc_exactness(ray_session, embs_df):
    """PQ codes are the per-subspace argmin, and the ADC score equals
    the manual table-lookup sum."""
    import ray.data as rd

    from rayspatial.textops.ann import _pq_assign, pq_encode, pq_train
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{SF}/embeddings.parquet")
    books = pq_train(ds, m_subspaces=4, k_codes=16, train_limit=1024)
    assert books.shape[0] == 4
    codes = pq_encode(ds, books).to_pandas().set_index("vec_id")
    m = _norm_mat(embs_df)
    ids = embs_df["vec_id"].to_numpy()
    want = _pq_assign(m, books)
    got = np.stack(codes.loc[ids, "code"].to_numpy())
    assert (got == want).all()


def test_pq_topk_recall_vs_brute(ray_session, embs_df):
    """PQ ADC alone must beat chance by a wide margin on the
    near-random fixture vectors, and PQ + exact rerank (the FAISS
    refine shape) must recover brute-force top-k almost fully."""
    import ray.data as rd

    from rayspatial.textops.ann import (pq_encode, pq_topk,
                                        pq_topk_rerank, pq_train)
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{SF}/embeddings.parquet")
    books = pq_train(ds, m_subspaces=8, k_codes=32, train_limit=2048)
    codes = pq_encode(ds, books)
    mat = _norm_mat(embs_df)
    ids = embs_df["vec_id"].to_numpy()
    qsel = ids % 200 == 0
    pos = {v: i for i, v in enumerate(ids)}

    def brute_top(q, kk):
        s = mat @ mat[pos[q]]
        cand = sorted(((v, s[pos[v]]) for v in ids if v != q),
                      key=lambda t: (-t[1], t[0]))
        return {v for v, _ in cand[:kk]}

    got = pq_topk(codes, books, ids[qsel], mat[qsel], k=10).to_pandas()
    adc = np.mean([
        len(brute_top(q, 10) & set(got[got.query_id == q]["neighbor_id"]))
        / 10 for q in ids[qsel]])
    # chance recall@10 over 500 vectors is 0.02; random-ish fixture
    # vectors are PQ's worst case, so the ADC bar is modest
    assert adc >= 0.2, adc
    rer = pq_topk_rerank(ds, codes, books, ids[qsel], mat[qsel],
                         k=10, shortlist=60).to_pandas()
    rr = np.mean([
        len(brute_top(q, 10) & set(rer[rer.query_id == q]["neighbor_id"]))
        / 10 for q in ids[qsel]])
    assert rr >= 0.8, rr
    assert rr > adc


def test_pq_topk_block_invariant(ray_session):
    """PQ ADC results must not depend on corpus block boundaries."""
    import ray.data as rd

    from rayspatial.textops.ann import pq_encode, pq_topk, pq_train
    from rayspatial.util import read_parquet_sized

    ds = read_parquet_sized(f"{SF}/embeddings.parquet")
    books = pq_train(ds, m_subspaces=4, k_codes=16, train_limit=1024)
    import pyarrow.parquet as pq_

    tab = pq_.read_table(f"{SF}/embeddings.parquet")
    ids = tab.column("vec_id").to_numpy()
    qids = ids[:3]
    import numpy as _np
    qmat = _np.stack(tab.column("embedding").to_pylist()[:3])
    outs = []
    for parts in (1, 7):
        codes = pq_encode(rd.from_arrow(tab).repartition(parts), books)
        outs.append(pq_topk(codes, books, qids, qmat, k=5).to_pandas()
                    .sort_values(["query_id", "rank"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_encode_bmp_batch_matches_scalar():
    from rayspatial.textops.multimodal import (decode_bmp, encode_bmp,
                                               encode_bmp_batch)

    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 256, (6, 5, 7, 3), dtype=np.uint8)  # padded w
    batch = encode_bmp_batch(imgs)
    for i, im in enumerate(imgs):
        assert batch[i] == encode_bmp(im)
        assert (decode_bmp(batch[i]) == im).all()


def test_weighted_sample_distribution_and_determinism(ray_session):
    """A-ES weighted sampling: deterministic under re-partitioning, and
    weight-proportional in aggregate (heavier rows selected far more
    often than light ones across disjoint id salts)."""
    import ray.data as rd

    from rayspatial.textops.sampling import weighted_sample

    n = 20_000
    w = np.where(np.arange(n) % 10 == 0, 1000, 1).astype(np.int64)
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "n_chars": w})
    outs = []
    for parts in (2, 13):
        outs.append(weighted_sample(
            rd.from_pandas(df).repartition(parts), k=500
        ).to_pandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    sel = outs[0]
    heavy = (sel["doc_id"] % 10 == 0).mean()
    # heavy rows are 10% of the corpus but carry ~99% of the weight;
    # the sample must be dominated by them
    assert heavy > 0.8, heavy
    # zero/negative weights excluded
    df2 = df.copy()
    df2.loc[df2.doc_id < 10000, "n_chars"] = 0
    sel2 = weighted_sample(rd.from_pandas(df2), k=200).to_pandas()
    assert (sel2["doc_id"] >= 10000).all()


# ---------------------------------------------------------------- BM25


def _bm25_reference(texts, query_terms, k):
    """Serial reference of the exact integer BM25 contract
    (textops/bm25.py): rationalized Okapi saturation, micro-nat
    Lucene idf, floor division."""
    import math

    toks = [t.split() for t in texts]
    n = len(texts)
    tt = sum(len(w) for w in toks)
    scores = {}
    for term in set(query_terms):
        df = sum(term in w for w in toks)
        if df == 0:
            continue
        idf = round(math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6)
        for i, w in enumerate(toks):
            tf = w.count(term)
            if tf:
                sat = (tf * 22000 * tt) // (
                    10 * tt * tf + 3 * tt + 9 * len(w) * n)
                scores[i] = scores.get(i, 0) + idf * sat
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def test_bm25_topk_matches_serial_reference(ray_session):
    import ray.data as rd

    from rayspatial.textops.bm25 import bm25_topk

    rng = np.random.default_rng(7)
    vocab = ["join", "hash", "scan", "sort", "merge", "row", "col"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 40)))
             for _ in range(300)]
    texts += ["", "   "]  # empty docs count toward N, own zero tokens
    docs = pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts),
    })
    q = ["join", "sort", "merge"]
    exp = _bm25_reference(texts, q, 15)
    for parts in (1, 7):
        out = bm25_topk(rd.from_arrow(docs).repartition(parts), q, k=15) \
            .to_pandas()
        got = list(zip(out["doc_id"], out["score_scaled"]))
        assert got == exp, parts  # chunking-invariant, score-exact


def test_bm25_topk_edges(ray_session):
    import ray.data as rd

    from rayspatial.textops.bm25 import bm25_topk

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["join join join", "nothing here", "join once"]),
    })
    out = bm25_topk(rd.from_arrow(docs), ["join"], k=10).to_pandas()
    # doc 1 matches no query term -> absent; higher tf ranks first
    # (same dl would be needed for a pure-tf statement; here doc 0 has
    # both higher tf and equal-length, so it must lead)
    assert list(out["doc_id"]) == [0, 2]
    assert (out["score_scaled"] > 0).all()
    with pytest.raises(ValueError):
        bm25_topk(rd.from_arrow(docs), [], k=5)


def test_extract_json_int():
    import pyarrow as pa

    from rayspatial.textops.jsonops import extract_json_int

    col = pa.array([
        '{"k": 69}', '{"a": 1, "k": -7}', '{"k":0}', '{"a": 2}',
        None, '{"kk": 5}', '{"k" : 12 }',
    ])
    got = extract_json_int(col, "k").to_pylist()
    assert got == [69, -7, 0, None, None, None, 12]


def test_round4_ops_empty_inputs(ray_session):
    """Round-4 operators survive empty inputs (schema-preserving empty
    results or a clear error) — empty filter results occur in plans."""
    import ray.data as rd

    from rayspatial.ops.analytic import rolling_distinct
    from rayspatial.ops.resample import resample_ffill
    from rayspatial.ops.streaming import streaming_dedup
    from rayspatial.ops.window import extreme_row_by_group, pivot_counts
    from rayspatial.textops.bm25 import bm25_topk

    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": pd.Series(dtype="int64"),
        "text": pd.Series(dtype="str"),
    }))
    with pytest.raises(ValueError):      # empty corpus is a clear error
        bm25_topk(docs, ["x"], k=3)

    ev = rd.from_pandas(pd.DataFrame({
        "user_id": pd.Series(dtype="int64"),
        "event_id": pd.Series(dtype="int64"),
        "ts": pd.Series(dtype="datetime64[us]"),
        "value_cents": pd.Series(dtype="int64"),
        "event_type": pd.Series(dtype="str"),
    }))
    assert resample_ffill(ev, by="user_id", ts_col="ts",
                          id_col="event_id", value_col="value_cents",
                          start_us=0, end_us=1000,
                          step_us=500).count() == 0
    assert rolling_distinct(ev, "user_id", "ts", window=7).count() == 0
    assert streaming_dedup(ev, ttl_s=1, lateness_s=1,
                           key_cols=["user_id", "event_type"]).count() == 0
    assert extreme_row_by_group(ev, ["user_id"], ["value_cents"],
                                ascending=[False]).count() == 0
    assert pivot_counts(ev, ["user_id"], "event_type",
                        domain=["a"]).count() == 0


def test_redact_and_phrase(ray_session):
    import ray.data as rd

    from rayspatial.textops.curation import phrase_docs, redact_pattern

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["call 555-1234 or 555-9999 now",
                          "no numbers here", "x 555-0000"]),
    })
    out = redact_pattern(rd.from_arrow(docs), r"\d{3}-\d{4}", "[PHONE]"
                         ).to_pandas().sort_values("doc_id")
    assert list(out["n_redacted"]) == [2, 0, 1]
    assert out["text"].iloc[0] == "call [PHONE] or [PHONE] now"
    assert out["text"].iloc[1] == "no numbers here"
    hits = phrase_docs(rd.from_arrow(docs), "555-99").to_pandas()
    assert list(hits["doc_id"]) == [0]


def test_png_codec_roundtrip_and_filters():
    """decode_png inverts encode_png for grey/RGB/RGBA, and unfilters
    ALL five PNG scanline filter types (independently re-encoded)."""
    import struct
    import zlib

    from rayspatial.textops.multimodal import decode_png, encode_png

    rng = np.random.default_rng(2)
    for shape in ((7, 5), (16, 16, 3), (9, 4, 4)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        got = decode_png(encode_png(img))
        assert (got.squeeze() == img.squeeze()).all(), shape

    def ref_png(img, ftype):
        # independent encoder emitting the CHOSEN filter on every row
        h, w, ch = img.shape
        raw = bytearray()
        prev = np.zeros(w * ch, np.int32)
        for y in range(h):
            cur = img[y].reshape(-1).astype(np.int32)
            left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
            ul = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
            if ftype == 0:
                enc = cur
            elif ftype == 1:
                enc = (cur - left) & 0xFF
            elif ftype == 2:
                enc = (cur - prev) & 0xFF
            elif ftype == 3:
                enc = (cur - ((left + prev) >> 1)) & 0xFF
            else:
                p = left + prev - ul
                pa_, pb, pc = (np.abs(p - left), np.abs(p - prev),
                               np.abs(p - ul))
                pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                                np.where(pb <= pc, prev, ul))
                enc = (cur - pred) & 0xFF
            raw.append(ftype)
            raw.extend(enc.astype(np.uint8).tobytes())
            prev = cur
        sig = b"\x89PNG\r\n\x1a\n"

        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body +
                    struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

        return (sig + chunk(b"IHDR", struct.pack(
            ">IIBBBBB", img.shape[1], img.shape[0], 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))

    img = rng.integers(0, 256, (11, 6, 3), dtype=np.uint8)
    for f in range(5):
        assert (decode_png(ref_png(img, f)) == img).all(), f

    with pytest.raises(ValueError):
        decode_png(b"nope" * 20)


# --- JPEG codec -------------------------------------------------------------


def test_jpeg_codec_roundtrip_smooth():
    """Baseline encode->decode roundtrip on a smooth gradient stays
    within a few levels at high quality, for 4:4:4, 4:2:0 and
    grayscale."""
    from rayspatial.textops.multimodal import decode_jpeg, encode_jpeg

    x = np.linspace(0, 255, 48)
    img = np.clip(
        (x[None, :, None] + x[::2, None, None][:24] + np.arange(3) * 10) / 2,
        0, 255).astype(np.uint8)
    for sub, tol in (("444", 4), ("420", 6)):
        dec = decode_jpeg(encode_jpeg(img, quality=95, subsample=sub))
        assert dec.shape == img.shape
        assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= tol
    gray = (np.arange(64, dtype=np.int64).reshape(8, 8) * 3).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(gray, quality=95))
    assert dec.shape == gray.shape
    assert int(np.abs(dec.astype(int) - gray.astype(int)).max()) <= 2


def test_jpeg_constant_block_matches_closed_form():
    """For a constant-color image the lossy chain is exactly the
    closed-form DC-only arithmetic the SQL oracle reproduces."""
    from rayspatial.textops.multimodal import (_jpeg_qtables, decode_jpeg,
                                               encode_jpeg)

    EPS = 0.5 + 1e-9

    def fl(x):
        return np.floor(x + EPS)

    def closed_form(r, g, b, quality):
        qlum, qchr = _jpeg_qtables(quality)
        ql, qc = float(qlum[0, 0]), float(qchr[0, 0])
        y = np.clip(fl(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        cb = np.clip(fl(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0),
                     0, 255)
        cr = np.clip(fl(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0),
                     0, 255)

        def chan(v, q):
            qdc = np.floor(8.0 * (v - 128.0) / q + EPS)
            return np.clip(fl(qdc * q / 8.0 + 128.0), 0, 255)

        y2, cb2, cr2 = chan(y, ql), chan(cb, qc), chan(cr, qc)
        return (int(np.clip(fl(y2 + 1.402 * (cr2 - 128.0)), 0, 255)),
                int(np.clip(fl(y2 - 0.344136 * (cb2 - 128.0)
                               - 0.714136 * (cr2 - 128.0)), 0, 255)),
                int(np.clip(fl(y2 + 1.772 * (cb2 - 128.0)), 0, 255)))

    rng = np.random.default_rng(17)
    for trial in range(200):
        r, g, b = (int(v) for v in rng.integers(0, 256, 3))
        q = [90, 75, 50][trial % 3]
        img = np.full((16, 16, 3), [r, g, b], dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg(img, quality=q))
        assert len(np.unique(dec.reshape(-1, 3), axis=0)) == 1
        assert tuple(int(v) for v in dec[0, 0]) == closed_form(r, g, b, q)


def test_jpeg_decoder_rejects_junk_and_nonbaseline():
    from rayspatial.textops.multimodal import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"nope" * 20)
    # progressive SOF2 marker spliced into a valid header prefix
    p = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(p).find(b"\xFF\xC0")
    p[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(p))
    with pytest.raises(ValueError):  # truncated: no SOS
        decode_jpeg(bytes(encode_jpeg(
            np.zeros((8, 8), dtype=np.uint8)))[:20])


def test_jpeg_featurizer_via_arrow_buffers(ray_session):
    """High-bit magic bytes (0xFF) must survive the featurizer's Arrow
    buffer slicing (signed-char memoryview regression), and the
    non-8-multiple size path must pad correctly."""
    import ray.data as rd

    from rayspatial.textops.multimodal import (binary_features, decode_jpeg,
                                               encode_jpeg)

    imgs = [np.full((16, 16, 3), [i * 40 % 256, 60, 200], dtype=np.uint8)
            for i in range(6)]
    imgs.append(np.full((10, 13, 3), [1, 2, 3], dtype=np.uint8))  # padded
    payloads = [encode_jpeg(im, quality=90) for im in imgs]
    tab = pa.table({
        "doc_id": pa.array(np.arange(len(imgs), dtype=np.int64)),
        "img": pa.array(payloads, type=pa.binary()),
    })
    out = (binary_features(rd.from_arrow(tab), binary_col="img",
                           id_col="doc_id", decoder="jpeg", batch_size=4)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for i in range(len(imgs)):
        f = np.asarray(out["features"][i])
        dec = decode_jpeg(payloads[i])
        h, w = dec.shape[:2]
        assert (f[0], f[1], f[7]) == (w, h, h * w)
        assert f[4] == int(dec.astype(np.int64).sum())
