"""Multimodal (binary-payload) pipeline stages.

Images/audio/video are opaque ``binary`` columns + typed metadata.
``decoder='bmp'`` is a REAL image decode: a pure-numpy parser for
uncompressed 24-bit BI_RGB Windows bitmaps (header at
https://learn.microsoft.com/en-us/windows/win32/gdi/bitmap-header-types;
bottom-up and top-down rows, 4-byte row padding) — no image library
needed, so the component is genuinely end-to-end in this container.
``decoder='png'`` decodes a COMPRESSED real-world format the same way:
stdlib zlib inflate + numpy unfilter of all five PNG scanline filters
(8-bit grey/RGB/RGBA, non-interlaced).
Codec libraries that are NOT present (PIL/ffmpeg) stay stubbed behind
``decoder='pil'`` with a clearly-marked ``NotImplementedError``; the
deterministic ``'fake'`` decoder remains for plumbing tests.

The pages table's ``html:binary`` column doubles as the test payload.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

FEATURE_DIM = 8


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BI_RGB BMP bytes
    (bottom-up rows, 4-byte-padded strides)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    data_size = stride * h
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                       2835, 2835, 0, 0)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = img[::-1, :, ::-1].reshape(h, row_bytes)  # BGR
    return hdr + info + rows.tobytes()


def encode_bmp_batch(imgs: np.ndarray) -> list[bytes]:
    """(n, h, w, 3) uint8 RGB -> n BMP payloads, one header build and
    one vectorized BGR/flip pass for the whole batch (the per-row
    ``encode_bmp`` costs a struct.pack per image; a uniform-size corpus
    synthesizer should not)."""
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    n, h, w, c = imgs.shape
    if c != 3:
        raise ValueError("encode_bmp_batch expects (n, h, w, 3) RGB")
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    data_size = stride * h
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off) + \
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size,
                    2835, 2835, 0, 0)
    out = np.empty((n, off + data_size), dtype=np.uint8)
    out[:, :off] = np.frombuffer(hdr, dtype=np.uint8)
    rows = out[:, off:].reshape(n, h, stride)
    rows[:, :, row_bytes:] = 0
    rows[:, :, :row_bytes] = imgs[:, ::-1, :, ::-1].reshape(n, h, row_bytes)
    return [r.tobytes() for r in out]


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> (h, w, 3) uint8 RGB.  Pure
    numpy (vectorized row de-stride + BGR swap); handles bottom-up
    (positive biHeight) and top-down (negative) files."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    hsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI",
                                                       payload, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, "
                         f"compression={comp})")
    topdown = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    need = off + stride * h
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    b = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                      offset=off)
    img = b.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not topdown:
        img = img[::-1]
    return img[:, :, ::-1].copy()  # BGR -> RGB


def _bmp_features(payload: bytes) -> np.ndarray:
    """Real decoded-image features (all int64, SQL-reproducible for a
    synthesized image): [w, h, sum_r, sum_g, sum_b, min_v, max_v,
    sum_all]."""
    img = decode_bmp(payload)
    h, w, _ = img.shape
    csum = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
    return np.array([w, h, csum[0], csum[1], csum[2],
                     int(img.min()), int(img.max()),
                     int(csum.sum())], dtype=np.int64)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 PCM samples (n,) mono or (n, ch) -> RIFF/WAVE bytes
    (canonical 44-byte header, format tag 1 = PCM)."""
    s = np.ascontiguousarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.reshape(-1).tobytes()          # interleaved frames
    block = ch * 2
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16, 1, ch,
        sample_rate, sample_rate * block, block, 16, b"data", len(data))
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> ((n, ch) int16 samples, sample_rate).  Pure
    numpy; walks the chunk list (fmt may be followed by LIST/fact
    chunks before data)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8: pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
            break
        pos += 8 + size + (size & 1)        # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("truncated WAVE: missing fmt/data chunk")
    tag, ch, rate, _byte_rate, _block, bits = fmt
    if tag != 1 or bits != 16:
        raise ValueError(f"only 16-bit PCM supported (tag={tag}, "
                         f"bits={bits})")
    s = np.frombuffer(data, dtype="<i2")
    n = len(s) // ch
    return s[: n * ch].reshape(n, ch), rate


def _wav_features(payload: bytes) -> np.ndarray:
    """Real decoded-audio features (all int64, SQL-reproducible for a
    synthesized signal): [rate, channels, n_samples, sum, min, max,
    sum_abs, zero_crossings] over channel 0."""
    s, rate = decode_wav(payload)
    c0 = s[:, 0].astype(np.int64)
    zc = int((c0[1:] * c0[:-1] < 0).sum()) if len(c0) > 1 else 0
    return np.array([rate, s.shape[1], s.shape[0], int(c0.sum()),
                     int(c0.min()) if len(c0) else 0,
                     int(c0.max()) if len(c0) else 0,
                     int(np.abs(c0).sum()), zc], dtype=np.int64)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decode + feature extraction:
    8 int64 features from byte-chunk sums (stable across runs)."""
    b = np.frombuffer(payload, dtype=np.uint8)
    if len(b) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.int64)
    pad = (-len(b)) % FEATURE_DIM
    if pad:
        b = np.pad(b, (0, pad))
    return b.reshape(FEATURE_DIM, -1).sum(axis=1, dtype=np.int64)


class BinaryFeatureExtractor:
    """Actor-pool map_batches stage: binary column -> fixed-size
    feature vector + payload size.

    ``decoder='bmp'`` REALLY decodes (pure-numpy 24-bit BI_RGB parser,
    see ``decode_bmp``) and emits pixel statistics; ``decoder='fake'``
    uses the deterministic stub; ``decoder='pil'`` requires a real
    image library and raises ``NotImplementedError`` in this container
    (import-gated, never at module import time).  Large payloads =>
    keep ``batch_size`` small (e.g. 64-512) so a batch x concurrency
    fits the worker heap.
    """

    def __init__(self, binary_col: str = "html", id_col: str = "url",
                 decoder: str = "fake"):
        self.binary_col = binary_col
        self.id_col = id_col
        if decoder == "fake":
            self.decode = _fake_decode
        elif decoder == "bmp":
            self.decode = _bmp_features
        elif decoder == "png":
            self.decode = _png_features
        elif decoder == "wav":
            self.decode = _wav_features
        elif decoder == "pil":
            try:
                from PIL import Image  # noqa: F401
            except ImportError as exc:
                raise NotImplementedError(
                    "real image decode needs PIL, which is not installed "
                    "in this container; use decoder='fake' for plumbing "
                    "tests"
                ) from exc
            raise NotImplementedError("PIL decode path not implemented yet")
        else:
            raise ValueError(f"unknown decoder: {decoder}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Slice the Arrow binary buffers directly (offsets + values)
        # instead of to_pylist(): no batch-wide Python list of payload
        # copies; each decode sees a zero-copy memoryview of the value
        # buffer (decoders use struct.unpack_from / np.frombuffer /
        # slice-compare, all buffer-protocol APIs).  Per-payload decode
        # stays — inherent to codec work.
        col = batch.column(self.binary_col)
        if isinstance(col, pa.ChunkedArray):
            # single-chunk fast path: combine_chunks would COPY the
            # whole value buffer even for one chunk
            if col.num_chunks == 1:
                col = col.chunk(0)
            elif col.num_chunks == 0:
                col = pa.array([], type=col.type)
            else:
                col = col.combine_chunks()
        n = len(col)
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            owidth = (np.int64 if pa.types.is_large_binary(col.type)
                      else np.int32)
            off = np.frombuffer(col.buffers()[1], dtype=owidth)[
                col.offset: col.offset + n + 1].astype(np.int64)
            dbuf = col.buffers()[2]
            mv = memoryview(dbuf) if dbuf is not None else memoryview(b"")
            valid = (col.is_valid().to_numpy(zero_copy_only=False)
                     if col.null_count else np.ones(n, dtype=bool))
            sizes = np.where(valid, np.diff(off), 0).astype(np.int64)
            feats = np.empty((n, FEATURE_DIM), dtype=np.int64)
            for i in range(n):
                feats[i] = self.decode(
                    mv[off[i]: off[i + 1]] if valid[i] else b"")
        else:  # fixed-size / unexpected layout: row-wise fallback
            payloads = col.to_pylist()
            feats = np.stack([self.decode(p or b"") for p in payloads])
            sizes = np.array([len(p or b"") for p in payloads],
                             dtype=np.int64)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "payload_bytes": pa.array(sizes),
                "features": pa.array(
                    list(feats), type=pa.list_(pa.int64(), FEATURE_DIM)
                ),
            }
        )


def binary_features(ds, binary_col: str = "html", id_col: str = "url",
                    concurrency=(1, 4), batch_size: int = 256,
                    decoder: str = "fake"):
    """Binary payload -> feature table via an actor pool (the decode
    state — models, codecs — loads once per actor in ``__init__``)."""
    return ds.map_batches(
        BinaryFeatureExtractor,
        fn_constructor_kwargs=dict(binary_col=binary_col, id_col=id_col,
                                   decoder=decoder),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageResizer:
    """Actor-pool stage: binary image -> resized binary + (w, h)
    metadata.  The resample kernel is a deterministic fake (byte-grid
    area downsample) because no image library ships in this container;
    the plumbing — typed metadata columns, per-actor setup, small
    batches for big payloads — is the real contract."""

    def __init__(self, binary_col: str = "html", id_col: str = "url",
                 target: int = 64, decoder: str = "fake"):
        if decoder != "fake":
            raise NotImplementedError(
                "real image resample needs an image library not present "
                "in this container"
            )
        self.binary_col = binary_col
        self.id_col = id_col
        self.target = target

    def _resize(self, payload: bytes) -> tuple[bytes, int, int]:
        b = np.frombuffer(payload, dtype=np.uint8)
        side = max(int(np.sqrt(len(b))), 1)
        b = b[: side * side]
        if len(b) < side * side:
            b = np.pad(b, (0, side * side - len(b)))
        img = b.reshape(side, side)
        t = min(self.target, side)
        step = side // t
        small = img[: t * step, : t * step].reshape(t, step, t, step)
        out = small.mean(axis=(1, 3)).astype(np.uint8)
        return out.tobytes(), t, t

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self.binary_col).to_pylist()
        outs = [self._resize(p or b"") for p in payloads]
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "thumb": pa.array([o[0] for o in outs], type=pa.binary()),
            "width": pa.array([o[1] for o in outs], type=pa.int64()),
            "height": pa.array([o[2] for o in outs], type=pa.int64()),
        })


class FrameSampler:
    """Actor-pool stage: binary 'video' -> one row PER SAMPLED FRAME
    (row expansion; frame payloads are deterministic byte slices —
    the ffmpeg-shaped plumbing without ffmpeg)."""

    def __init__(self, binary_col: str = "html", id_col: str = "url",
                 num_frames: int = 4):
        self.binary_col = binary_col
        self.id_col = id_col
        self.num_frames = num_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for rid, payload in zip(batch.column(self.id_col).to_pylist(),
                                batch.column(self.binary_col).to_pylist()):
            b = payload or b""
            n = self.num_frames
            step = max(len(b) // n, 1)
            for f in range(n):
                ids.append(rid)
                fidx.append(f)
                frames.append(b[f * step : (f + 1) * step])
        return pa.table({
            self.id_col: pa.array(ids),
            "frame_idx": pa.array(fidx, type=pa.int64()),
            "frame": pa.array(frames, type=pa.binary()),
        })


def binary_embeddings(ds, binary_col: str = "html", id_col: str = "doc_id",
                      batch_size: int = 256, concurrency=(1, 4)):
    """Binary payload -> L2-normalized FEATURE_DIM float embedding
    (deterministic fake features) — the bridge from multimodal decode
    into the similarity-search operators (ann_topk / ivf_topk /
    embedding_dup_pairs consume its output schema directly)."""

    def embed(batch: pa.Table) -> pa.Table:
        payloads = batch.column(binary_col).to_pylist()
        feats = np.stack([_fake_decode(p or b"") for p in payloads]).astype(
            np.float64
        )
        nrm = np.linalg.norm(feats, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        feats = feats / nrm
        return pa.table({
            "vec_id": batch.column(id_col),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(feats.ravel(), type=pa.float64()), FEATURE_DIM
            ),
        })

    return ds.map_batches(embed, batch_format="pyarrow",
                          batch_size=batch_size)


# ------------------------------------------------------------- PNG
# Pure stdlib+numpy PNG codec: zlib (stdlib) inflates IDAT; the five
# scanline filters (None/Sub/Up/Average/Paeth, PNG spec §6) unfilter
# with numpy per scanline.  8-bit greyscale / RGB / RGBA, no
# interlacing — the shapes a web-crawl thumbnail pipeline actually
# meets for lossless payloads.  This makes the image component handle
# a COMPRESSED real-world format end-to-end without PIL.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CH = {0: 1, 2: 3, 6: 4}  # color type -> channels (8-bit only)


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) or (h, w, {1,3,4}) uint8 -> PNG bytes (filter 0 rows,
    one zlib-deflated IDAT)."""
    import zlib

    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError(f"encode_png: channels must be 1/3/4, got {ch}")
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = 0                       # filter type None per scanline
    raw[:, 1:] = img.reshape(h, w * ch)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, ch) uint8.  8-bit depth, color types
    0 (grey) / 2 (RGB) / 6 (RGBA), non-interlaced; all five scanline
    filters unfiltered vectorized per row."""
    import zlib

    if len(payload) < 45 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4: pos + 8]
        body = payload[pos + 8: pos + 8 + ln]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln                  # len + tag + crc
    if ihdr is None or not idat:
        raise ValueError("truncated PNG: missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, inter = ihdr
    if depth != 8 or comp != 0 or filt != 0 or inter != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, "
                         f"interlace={inter})")
    ch = _PNG_CH.get(ctype)
    if ch is None:
        raise ValueError(f"unsupported PNG color type {ctype}")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = 1 + w * ch
    if len(raw) < h * stride:
        raise ValueError("truncated PNG pixel data")
    raw = raw[: h * stride].reshape(h, stride)
    ftypes = raw[:, 0]
    out = np.zeros((h, w * ch), dtype=np.uint8)
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):                  # rows are filter-sequential
        f = int(ftypes[y])
        cur = raw[y, 1:].astype(np.int32)
        if f == 0:                      # None
            row = cur
        elif f == 1:                    # Sub: cumulative within row
            row = cur.reshape(w, ch).cumsum(axis=0, dtype=np.int32) \
                .reshape(w * ch) & 0xFF
        elif f == 2:                    # Up
            row = (cur + prev) & 0xFF
        elif f == 3:                    # Average (left-sequential)
            row = np.empty(w * ch, dtype=np.int32)
            row[:ch] = (cur[:ch] + (prev[:ch] >> 1)) & 0xFF
            for x in range(ch, w * ch, ch):
                row[x:x + ch] = (cur[x:x + ch] + (
                    (row[x - ch:x] + prev[x:x + ch]) >> 1)) & 0xFF
        elif f == 4:                    # Paeth (left-sequential)
            row = np.empty(w * ch, dtype=np.int32)
            row[:ch] = (cur[:ch] + prev[:ch]) & 0xFF
            for x in range(ch, w * ch, ch):
                a = row[x - ch:x]
                b = prev[x:x + ch]
                c = prev[x - ch:x]
                p = a + b - c
                pa_, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa_ <= pb) & (pa_ <= pc), a,
                                np.where(pb <= pc, b, c))
                row[x:x + ch] = (cur[x:x + ch] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = row
        prev = row.astype(np.int32)
    return out.reshape(h, w, ch)


def _png_features(payload: bytes) -> np.ndarray:
    """Decoded-PNG features (all int64, SQL-reproducible for a
    synthesized image): [w, h, ch, sum_c0, sum_all, min_v, max_v,
    n_pixels]."""
    img = decode_png(payload)
    h, w, ch = img.shape
    flat = img.reshape(-1).astype(np.int64)
    return np.array([w, h, ch, int(img[:, :, 0].sum(dtype=np.int64)),
                     int(flat.sum()), int(flat.min()), int(flat.max()),
                     h * w], dtype=np.int64)
