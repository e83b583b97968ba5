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

import functools
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
        elif decoder == "jpeg":
            self.decode = _jpeg_features
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
            # pyarrow Buffers expose format 'b' (SIGNED char) memoryviews;
            # cast to 'B' so magic-byte compares (0xFF, 0x89...) behave
            # like bytes
            mv = (memoryview(dbuf).cast("B") if dbuf is not None
                  else memoryview(b""))
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
                    concurrency=None, batch_size: int = 256,
                    decoder: str = "fake"):
    """Binary payload -> feature table via an actor pool (the decode
    state — models, codecs — loads once per actor in ``__init__``).

    ``concurrency`` defaults to ``(1, cluster_cpus)``: decode is pure
    CPU (~ms/payload for the real codecs), so the pool should be able
    to ramp to the machine — the old fixed ``(1, 4)`` cap serialized
    real-codec stages on wide nodes (jpeg_features at sf0.1: 9.2s
    capped vs ~1.3s at full width), and upstream synth/read stages
    fuse INTO the pool, inheriting the cap."""
    if concurrency is None:
        from rayspatial.util import cluster_cpus

        concurrency = (1, cluster_cpus())
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


# ------------------------------------------------------------- JPEG
# Pure stdlib+numpy baseline-sequential JPEG codec (ITU-T T.81, 1992):
# Annex-K quantization + huffman tables, orthonormal-matmul (F)DCT,
# canonical-code huffman coder, 0xFF byte stuffing, DRI/RSTn restart
# markers.  Encoder emits 8-bit grayscale / YCbCr 4:4:4 / 4:2:0; the
# decoder handles any baseline frame whose sampling factors are <= 2
# (i.e. 4:4:4 / 4:2:2 / 4:2:0 / grayscale — what a web crawl actually
# contains) and raises on progressive (SOF2) / arithmetic / 12-bit.
#
# Exactness contract (what lets jpeg_features carry a DuckDB oracle
# even though JPEG is lossy): every rounding in the pipeline is
# floor(x + 0.5 + 1e-9) — for a CONSTANT-COLOR block the whole
# encode->decode chain collapses to a closed-form arithmetic
# expression (color convert -> DC quantize -> dequantize -> IDCT ->
# inverse color convert) that SQL reproduces bit-for-bit, while the
# payload still exercises the full entropy-coded path (huffman, byte
# stuffing, marker parse).  The 1e-9 guard absorbs the ~1e-12 matmul
# noise of the DCT so float error can never flip a floor() across an
# exact half-integer boundary.

_JQ_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)
_JQ_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

_JZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

_JDC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JDC_LUM_VALS = list(range(12))
_JDC_CHR_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_JDC_CHR_VALS = list(range(12))
_JAC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_JAC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
_JAC_CHR_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_JAC_CHR_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

_JEPS = 1e-9


def _jround(x):
    """The pipeline's single rounding rule: floor(x + 0.5 + 1e-9) —
    see the exactness contract above."""
    return np.floor(x + (0.5 + _JEPS))


def _jdct_matrix() -> np.ndarray:
    u, x = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    m = np.cos((2 * x + 1) * u * np.pi / 16) * 0.5
    m[0] /= np.sqrt(2.0)
    return m  # orthonormal: M @ B @ M.T == T.81 FDCT


_JDCT_M = _jdct_matrix()


def _jpeg_qtables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex-K tables (public formula)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    lum = np.clip((_JQ_LUM * scale + 50) // 100, 1, 255)
    chrm = np.clip((_JQ_CHR * scale + 50) // 100, 1, 255)
    return lum, chrm


def _jhuff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (T.81 C.2)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


class _JBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1s


def _jmag(v: int) -> tuple[int, int]:
    """value -> (category ssss, ssss-bit code) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a, s = abs(v), 0
    while a:
        a >>= 1
        s += 1
    return (s, v if v >= 0 else v + (1 << s) - 1)


def _jencode_blocks(wr, blocks, qtab, dc_codes, ac_codes, prev_dc):
    """blocks: (n, 8, 8) float spatial (level-shifted); returns new
    prev_dc after huffman-encoding all n blocks."""
    for b in blocks:
        coef = _JDCT_M @ b @ _JDCT_M.T
        qc = _jround(coef / qtab).astype(np.int64).reshape(64)[_JZZ]
        diff = int(qc[0]) - prev_dc
        prev_dc = int(qc[0])
        s, bitsv = _jmag(diff)
        c, ln = dc_codes[s]
        wr.put(c, ln)
        if s:
            wr.put(bitsv, s)
        run = 0
        nz = np.flatnonzero(qc[1:])
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(qc[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = ac_codes[0xF0]  # ZRL
                wr.put(c, ln)
                run -= 16
            s, bitsv = _jmag(v)
            c, ln = ac_codes[(run << 4) | s]
            wr.put(c, ln)
            wr.put(bitsv, s)
            run = 0
        if last < 63:
            c, ln = ac_codes[0x00]  # EOB
            wr.put(c, ln)
    return prev_dc


def _jpad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, (-h) % 8), (0, (-w) % 8)), mode="edge")


def _jblocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W % 8 == 0 -> (n, 8, 8) in raster block order."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def encode_jpeg(img: np.ndarray, quality: int = 90,
                subsample: str = "444") -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JFIF bytes.
    ``subsample``: '444' (one block set per component) or '420'
    (2x2-box-averaged chroma, MCU-interleaved)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("encode_jpeg: need (h,w) gray or (h,w,3) RGB")
    if subsample not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsample!r}")
    h, w = img.shape[:2]
    qlum, qchr = _jpeg_qtables(quality)

    if gray:
        planes = [img.astype(np.float64)]
    else:
        r = img[:, :, 0].astype(np.float64)
        g = img[:, :, 1].astype(np.float64)
        b = img[:, :, 2].astype(np.float64)
        y = np.clip(_jround(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
        cb = np.clip(_jround(-0.168736 * r - 0.331264 * g + 0.5 * b
                             + 128.0), 0, 255)
        cr = np.clip(_jround(0.5 * r - 0.418688 * g - 0.081312 * b
                             + 128.0), 0, 255)
        if subsample == "420":
            def box2(p):
                hh, ww = p.shape
                p = np.pad(p, ((0, hh % 2), (0, ww % 2)), mode="edge")
                q = p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
                return np.clip(_jround(q.mean(axis=(1, 3))), 0, 255)
            cb, cr = box2(cb), box2(cr)
        planes = [y, cb, cr]

    dc_l = _jhuff_codes(_JDC_LUM_BITS, _JDC_LUM_VALS)
    ac_l = _jhuff_codes(_JAC_LUM_BITS, _JAC_LUM_VALS)
    dc_c = _jhuff_codes(_JDC_CHR_BITS, _JDC_CHR_VALS)
    ac_c = _jhuff_codes(_JAC_CHR_BITS, _JAC_CHR_VALS)

    out = bytearray(b"\xFF\xD8")                       # SOI
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    for tid, qt in ((0, qlum),) + ((() if gray else ((1, qchr),))):
        out += (b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
                + bytes(qt.reshape(64)[_JZZ].astype(np.uint8).tolist()))
    ncomp = 1 if gray else 3
    samp = (0x11, 0x11, 0x11) if (gray or subsample == "444") \
        else (0x22, 0x11, 0x11)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, samp[ci], 0 if ci == 0 else 1])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, tid, bits, vals in (
            (0, 0, _JDC_LUM_BITS, _JDC_LUM_VALS),
            (1, 0, _JAC_LUM_BITS, _JAC_LUM_VALS),
            *(() if gray else (
                (0, 1, _JDC_CHR_BITS, _JDC_CHR_VALS),
                (1, 1, _JAC_CHR_BITS, _JAC_CHR_VALS)))):
        out += (b"\xFF\xC4" + struct.pack(">H", 19 + len(vals))
                + bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    wr = _JBitWriter()
    if gray or subsample == "444":
        comps = [(_jblocks(_jpad8(p) - 128.0),
                  qlum if i == 0 else qchr,
                  dc_l if i == 0 else dc_c,
                  ac_l if i == 0 else ac_c)
                 for i, p in enumerate(planes)]
        n_units = len(comps[0][0])
        prev = [0] * len(comps)
        for u in range(n_units):  # interleave 1 block per comp per MCU
            for i, (blks, qt, dcc, acc) in enumerate(comps):
                prev[i] = _jencode_blocks(wr, blks[u:u + 1], qt, dcc,
                                          acc, prev[i])
    else:  # 420: MCU = 4 luma blocks (2x2) + 1 cb + 1 cr
        ypad = _jpad8(np.pad(planes[0],
                             ((0, (-h) % 16), (0, (-w) % 16)),
                             mode="edge")) - 128.0
        cbp = _jpad8(planes[1]) - 128.0
        crp = _jpad8(planes[2]) - 128.0
        hy, wy = ypad.shape
        mcu_rows, mcu_cols = hy // 16, wy // 16
        prev = [0, 0, 0]
        for my in range(mcu_rows):
            for mx in range(mcu_cols):
                yb = [ypad[my * 16 + dy * 8: my * 16 + dy * 8 + 8,
                           mx * 16 + dx * 8: mx * 16 + dx * 8 + 8]
                      for dy in range(2) for dx in range(2)]
                prev[0] = _jencode_blocks(wr, np.stack(yb), qlum,
                                          dc_l, ac_l, prev[0])
                cbb = cbp[my * 8: my * 8 + 8, mx * 8: mx * 8 + 8]
                prev[1] = _jencode_blocks(wr, cbb[None], qchr, dc_c,
                                          ac_c, prev[1])
                crb = crp[my * 8: my * 8 + 8, mx * 8: mx * 8 + 8]
                prev[2] = _jencode_blocks(wr, crb[None], qchr, dc_c,
                                          ac_c, prev[2])
    wr.flush()
    out += wr.buf
    out += b"\xFF\xD9"                                  # EOI
    return bytes(out)


class _JBitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing, RSTn awareness."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # set when a non-RST marker is hit

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.d[self.pos]
            if b == 0xFF:
                nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) \
                    else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:     # RSTn consumed by caller
                    self.marker = nxt
                    self.acc = (self.acc << 8)
                    self.nbits += 8
                    continue
                else:
                    self.marker = nxt
                    self.acc = (self.acc << 8)
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def restart(self):
        """Consume an RSTn marker at a byte boundary (T.81 E.2.4)."""
        self.acc = 0
        self.nbits = 0
        self.marker = None
        while self.pos + 1 < len(self.d):
            if self.d[self.pos] == 0xFF and \
                    0xD0 <= self.d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected RST marker")


def _jhuff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """(length, code) -> symbol for canonical codes."""
    return _jhuff_decode_table_cached(bytes(bits), bytes(vals))


@functools.lru_cache(maxsize=64)
def _jhuff_decode_table_cached(bits: bytes, vals: bytes) -> dict:
    # web corpora overwhelmingly reuse the Annex-K standard tables, so
    # one cache entry serves ~every payload an actor decodes
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _jread_symbol(rd: _JBitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | rd.bits(1)
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("bad huffman code in JPEG stream")


def _jextend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF/JPEG bytes -> (h, w) uint8 grayscale or (h, w, 3)
    uint8 RGB.  Handles 8-bit baseline sequential frames with sampling
    factors <= 2 (4:4:4 / 4:2:2 / 4:2:0 / grayscale), standard or
    custom DQT/DHT, 0xFF byte stuffing, DRI/RSTn restarts.  Raises on
    progressive (SOF2), arithmetic coding, and 12-bit frames."""
    d = payload
    if len(d) < 4 or d[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        m = d[pos + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            pos += 2
            continue
        if m == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", d, pos + 2)
        seg = d[pos + 4: pos + 2 + ln]
        if m == 0xDB:                      # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(seg, dtype=np.uint8, count=64,
                                   offset=o + 1).astype(np.int64)
                t = np.zeros(64, dtype=np.int64)
                t[_JZZ] = zz
                qtabs[tq] = t.reshape(8, 8)
                o += 65
        elif m == 0xC4:                    # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1: o + 17])
                nv = sum(bits)
                vals = list(seg[o + 17: o + 17 + nv])
                htabs[(tc, th)] = _jhuff_decode_table(bits, vals)
                o += 17 + nv
        elif m == 0xC0 or m == 0xC1:       # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arithmetic)"
                             " unsupported")
        elif m == 0xDD:                    # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:                    # SOS
            ns = seg[0]
            smap = {}
            for i in range(ns):
                cs, tt = seg[1 + 2 * i: 3 + 2 * i]
                smap[cs] = (tt >> 4, tt & 0xF)
            scan = (smap, pos + 2 + ln)
            break
        pos += 2 + ln
    if frame is None or scan is None:
        raise ValueError("truncated JPEG: missing SOF/SOS")

    smap, data_pos = scan
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors > 2 unsupported")
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]            # blocks per row
        c["bh"] = mcuy * c["v"]
        c["plane"] = np.zeros((c["bh"] * 8, c["bw"] * 8))
        c["dc"] = 0
        dct, act = smap[c["id"]]
        c["dct"] = htabs[(0, dct)]
        c["act"] = htabs[(1, act)]
        c["q"] = qtabs[c["tq"]]

    rd = _JBitReader(bytes(d), data_pos)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                rd.restart()
                for c in comps:
                    c["dc"] = 0
            n_mcu += 1
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _jread_symbol(rd, c["dct"])
                        diff = _jextend(rd.bits(s), s) if s else 0
                        c["dc"] += diff
                        zz[0] = c["dc"]
                        k = 1
                        while k < 64:
                            rs = _jread_symbol(rd, c["act"])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break      # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _jextend(rd.bits(s), s)
                            k += 1
                        blk = np.zeros(64)
                        blk[_JZZ] = zz * c["q"].reshape(64)[_JZZ]
                        sp = _JDCT_M.T @ blk.reshape(8, 8) @ _JDCT_M
                        py = (my * c["v"] + by) * 8
                        px = (mx * c["h"] + bx) * 8
                        c["plane"][py:py + 8, px:px + 8] = sp + 128.0

    planes = []
    for c in comps:
        p = c["plane"]
        if c["h"] < hmax or c["v"] < vmax:  # upsample by replication
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(p[:fh, :fw])
    if len(planes) == 1:
        return np.clip(_jround(planes[0]), 0, 255).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported component count {len(planes)}")
    y, cb, cr = planes
    y = np.clip(_jround(y), 0, 255)
    cb = np.clip(_jround(cb), 0, 255)
    cr = np.clip(_jround(cr), 0, 255)
    r = np.clip(_jround(y + 1.402 * (cr - 128.0)), 0, 255)
    g = np.clip(_jround(y - 0.344136 * (cb - 128.0)
                        - 0.714136 * (cr - 128.0)), 0, 255)
    b = np.clip(_jround(y + 1.772 * (cb - 128.0)), 0, 255)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def _jpeg_features(payload: bytes) -> np.ndarray:
    """Decoded-JPEG features (all int64; SQL-reproducible for a
    constant-color synthesized image — see the exactness contract):
    [w, h, ch, sum_c0, sum_all, min_v, max_v, n_pixels]."""
    img = decode_jpeg(payload)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    flat = img.reshape(-1).astype(np.int64)
    return np.array([w, h, ch, int(img[:, :, 0].sum(dtype=np.int64)),
                     int(flat.sum()), int(flat.min()), int(flat.max()),
                     h * w], dtype=np.int64)
