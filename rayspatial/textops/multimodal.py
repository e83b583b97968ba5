"""Multimodal (binary-payload) pipeline stages.

Images/audio/video are opaque ``binary`` columns + typed metadata.  The
decode libraries (PIL/ffmpeg/...) are NOT in this container, so the
decode kernel itself is stubbed — either a clearly-marked
``NotImplementedError`` or a deterministic fake — while all Ray-side
plumbing (schema, actor-pool stage, small batch sizes for large
payloads, output layout) is real and tested.

The pages table's ``html:binary`` column doubles as the test payload.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

FEATURE_DIM = 8


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

    ``decoder='fake'`` uses the deterministic stub; ``decoder='pil'``
    requires a real image library and raises ``NotImplementedError``
    in this container (import-gated, never at module import time).
    Large payloads => keep ``batch_size`` small (e.g. 64-512) so a
    batch x concurrency fits the worker heap.
    """

    def __init__(self, binary_col: str = "html", id_col: str = "url",
                 decoder: str = "fake"):
        self.binary_col = binary_col
        self.id_col = id_col
        if decoder == "fake":
            self.decode = _fake_decode
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
        payloads = batch.column(self.binary_col).to_pylist()
        feats = np.stack([self.decode(p or b"") for p in payloads])
        sizes = np.array([len(p or b"") for p in payloads], dtype=np.int64)
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
                    concurrency=(1, 4), batch_size: int = 256):
    """Binary payload -> feature table via an actor pool (the decode
    state — models, codecs — loads once per actor in ``__init__``)."""
    return ds.map_batches(
        BinaryFeatureExtractor,
        fn_constructor_kwargs=dict(binary_col=binary_col, id_col=id_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
