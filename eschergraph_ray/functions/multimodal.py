"""Multimodal (image/audio/video) column plumbing.

The reference's visual path (``eschergraph/builder/reader/multi_modal``,
M5/M6: TABLE/FIGURE elements -> multimodal LLM -> NodeEdgeExt) depends
on external services + image libs that are not in this container. We
keep the Ray-side plumbing REAL — schema, actor signature, batch
sizing, output layout — and stub only the codec boundary:

- media columns are opaque ``binary`` with typed metadata columns
  (``media_type``, ``width``, ``height``, ``duration_ms``);
- decode/feature-extract runs as an actor-pool ``map_batches`` with a
  SMALL batch size (large binary payloads: batch x concurrency must fit
  worker heap — SURVEY.md "Memory-aware");
- the default codec is a deterministic fake (blake2-derived features);
  a real codec would be loaded once per actor in ``__init__``. Pass
  ``strict=True`` to get the honest ``NotImplementedError``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # image/png, audio/wav, video/mp4 ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 32


class MediaFeatureActor:
    """binary payload -> fixed-dim feature vector (+ decoded dims).

    Real deployment: ``__init__`` loads the image/audio model once per
    actor; ``__call__`` decodes and batch-infers. Here the decode step
    is a deterministic fake unless ``strict``.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.strict:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "plug a real decoder here (loaded once per actor)"
            )
        h = hashlib.blake2b(payload or b"", digest_size=FEATURE_DIM * 2).digest()
        v = np.frombuffer(h, dtype=np.uint16).astype(np.float32)
        n = np.linalg.norm(v)
        return v / n if n else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._decode(p, m).tolist()
            for p, m in zip(batch["payload"].to_pylist(), batch["media_type"].to_pylist())
        ]
        out = batch.drop_columns(["payload"])  # don't carry blobs forward
        return out.append_column(
            "features", pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM))
        )


def extract_media_features(ds, concurrency: int = 4, batch_size: int = 32,
                           strict: bool = False):
    """Actor-pool feature extraction over a media Dataset.

    Small ``batch_size`` on purpose: payloads are large binaries; the
    object store should hold few per batch (memory-aware sizing)."""
    return ds.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synthetic_media_table(n: int = 16, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for tests."""
    rng = np.random.default_rng(seed)
    rows = {
        "media_id": [f"m{i:04d}" for i in range(n)],
        "media_type": [["image/png", "audio/wav", "video/mp4"][i % 3] for i in range(n)],
        "payload": [rng.integers(0, 256, size=256 + i, dtype=np.uint8).tobytes() for i in range(n)],
        "width": [64 if i % 3 == 0 else 0 for i in range(n)],
        "height": [64 if i % 3 == 0 else 0 for i in range(n)],
        "duration_ms": [0 if i % 3 == 0 else 1000 + i for i in range(n)],
    }
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)
