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

import base64
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


# Media attached to conversations (the visual-element analogue,
# VisualDocumentElement: doc_id + caption + content).
MEDIA_ATTACHED_SCHEMA = MEDIA_SCHEMA.append(pa.field("conv_id", pa.string())).append(
    pa.field("caption", pa.string())
)

# Visual logs get chunk ids above any text chunk id (text: salt-offset
# ids < salt_count * 100_000; reference uses chunk_id=None for visual
# metadata — a disjoint id range keeps one int32 column).
VISUAL_CHUNK_BASE = 1_000_000_000


def synthetic_attached_media(conv_ids: list[str], per_conv: int = 1,
                             seed: int = 42) -> pa.Table:
    """Media rows attached to conversations, captions carrying the
    transcript grammar's ``[[entity]]`` markers so visual extraction
    links figures to text entities."""
    base = synthetic_media_table(len(conv_ids) * per_conv, seed)
    convs, captions = [], []
    for i in range(base.num_rows):
        conv = conv_ids[i // per_conv]
        convs.append(conv)
        captions.append(
            f"architecture diagram {i}: [[{conv} owner]] presents the rollout plan"
        )
    return base.append_column("conv_id", pa.array(convs, pa.string())).append_column(
        "caption", pa.array(captions, pa.string())
    )


def encode_image_b64(payload: bytes | None) -> str | None:
    """F6 (``OpenAIProvider._encode_image``, reference
    ``eschergraph/agents/providers/openai.py:264-271``): base64-encode
    one image payload; ``None`` when the payload is missing (the
    reference returns None on read error)."""
    if payload is None:
        return None
    return base64.b64encode(payload).decode("utf-8")


def encode_media_data_urls(ds, batch_size: int = 32):
    """F6 message-prep stage (reference ``openai.py:249-271``): binary
    ``payload`` -> ``data_url`` string column
    ``data:{media_type};base64,{b64}`` — exactly the image part the
    reference embeds in its multimodal prompt. base64 runs at C speed
    per blob; the SMALL default batch size is deliberate (a data URL is
    4/3 the blob size ON TOP of the blob, so batch x concurrency must
    stay inside the worker heap). Blobs are dropped from the output —
    only the encoded form travels downstream."""

    def enc(batch: pa.Table) -> pa.Table:
        urls = [
            None if p is None else f"data:{m};base64,{encode_image_b64(p)}"
            for p, m in zip(
                batch["payload"].to_pylist(), batch["media_type"].to_pylist()
            )
        ]
        return batch.drop_columns(["payload"]).append_column(
            "data_url", pa.array(urls, pa.string())
        )

    return ds.map_batches(enc, batch_format="pyarrow", batch_size=batch_size)


TABLE_CELL = pa.struct(
    [
        ("row_index", pa.int32()),
        ("column_index", pa.int32()),
        ("content", pa.string()),
    ]
)

TABLE_SPEC_SCHEMA = pa.schema(
    [
        ("spec_id", pa.string()),
        ("conv_id", pa.string()),
        ("caption", pa.string()),
        ("row_count", pa.int32()),
        ("column_count", pa.int32()),
        ("cells", pa.list_(TABLE_CELL)),
    ]
)


def generate_markdown_table(row_count: int, column_count: int, cells) -> str:
    """F7 (``_generate_markdown_table``, reference
    ``eschergraph/builder/reader/multi_modal/multi_modal_parser.py:196-230``):
    dense ``row_count x column_count`` grid defaulted to ``""``, filled
    from sparse cells, rendered as a markdown table — header row, a
    ``---`` separator, then content rows, each line ``| a | b |\\n``.

    Deviation from the reference (which trusts its parser's output and
    would IndexError): out-of-range cells are SKIPPED and a
    non-positive row_count yields ``""`` — a malformed spec row must
    not kill a whole distributed stage."""
    if row_count <= 0 or column_count <= 0:
        return ""
    grid = [["" for _ in range(column_count)] for _ in range(row_count)]
    for cell in cells:
        r, c = cell["row_index"], cell["column_index"]
        if 0 <= r < row_count and 0 <= c < column_count:
            grid[r][c] = cell["content"]
    out = "| " + " | ".join(grid[0]) + " |\n"
    out += "| " + " | ".join(["---"] * column_count) + " |\n"
    for row in grid[1:]:
        out += "| " + " | ".join(row) + " |\n"
    return out


def render_table_elements(ds, batch_size: int = 256):
    """TABLE spec rows -> visual-element ``content`` (caption + newline
    + markdown table; ``_handle_tables``, reference
    ``multi_modal_parser.py:93-112``). Per-row string assembly is
    inherent here (each row builds one small ragged grid), but each
    grid is tiny and the stage parallelizes across batches."""

    def render(batch: pa.Table) -> pa.Table:
        contents = [
            f"{cap}\n" + generate_markdown_table(rc, cc, cells or [])
            for cap, rc, cc, cells in zip(
                batch["caption"].to_pylist(),
                batch["row_count"].to_pylist(),
                batch["column_count"].to_pylist(),
                batch["cells"].to_pylist(),
            )
        ]
        return batch.drop_columns(["cells"]).append_column(
            "content", pa.array(contents, pa.string())
        )

    return ds.map_batches(render, batch_format="pyarrow", batch_size=batch_size)


def synthetic_table_specs(n: int = 24, seed: int = 42) -> pa.Table:
    """Deterministic sparse TABLE specs for tests/oracles: 2-4 rows x
    2-4 columns, ~15% of cells absent (they must render as ``""``);
    each (row, column) appears at most once."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        rc = 2 + int(rng.integers(0, 3))
        cc = 2 + int(rng.integers(0, 3))
        cells = []
        for r in range(rc):
            for c in range(cc):
                if rng.random() < 0.85:
                    cells.append(
                        {
                            "row_index": r,
                            "column_index": c,
                            "content": f"r{r}c{c}v{int(rng.integers(0, 100))}",
                        }
                    )
        rows.append(
            {
                "spec_id": f"t{i:04d}",
                "conv_id": f"conv{i % 5}",
                "caption": f"Table {i}: quarterly rollout metrics",
                "row_count": rc,
                "column_count": cc,
                "cells": cells,
            }
        )
    return pa.Table.from_pylist(rows, schema=TABLE_SPEC_SCHEMA)


def transform_to_node_ext(answer: dict) -> tuple[list[dict], str | None]:
    """``BuildPipeline.transform_to_NodeExt``
    (build_pipeline.py:375-413) parity: validate entities, split off the
    ``main_node`` flag, return (entities, main_visual_entity_name)."""
    if "entities" not in answer or not isinstance(answer["entities"], list):
        raise ValueError("'entities' key missing or not a list")
    main: str | None = None
    entities: list[dict] = []
    for e in answer["entities"]:
        if not isinstance(e, dict) or not {"main_node", "name", "description"} <= e.keys():
            raise ValueError(f"invalid visual entity: {e!r}")
        if e.get("main_node") is True:
            main = e["name"]
        entities.append({"name": e["name"], "description": e["description"]})
    return entities, main


def media_build_logs(media_ds, llm_factory=None, concurrency: int = 2,
                     batch_size: int = 32, strict: bool = False):
    """Attached-media Dataset -> visual BuildLog rows (M5/M6,
    ``_handle_visual`` build_pipeline.py:315-373): decode/feature-
    extract (stub codec, actor state in __init__), visual-LLM
    extraction, NodeExt validation, one BuildLog per element with
    ``main_visual_entity_name`` set and the caption as chunk_text.
    Output schema matches ExtractorActor's so the two log streams union
    into one graph build."""
    from ..llm import DeterministicMockLLM
    from ..schemas import BUILD_LOGS

    llm_factory = llm_factory or DeterministicMockLLM

    class VisualExtractor(MediaFeatureActor):
        def __init__(self):
            super().__init__(strict=strict)
            self.llm = llm_factory()

        def __call__(self, batch: pa.Table) -> pa.Table:
            rows: list[dict] = []
            for mid, mtype, payload, conv, caption in zip(
                batch["media_id"].to_pylist(),
                batch["media_type"].to_pylist(),
                batch["payload"].to_pylist(),
                batch["conv_id"].to_pylist(),
                batch["caption"].to_pylist(),
            ):
                feats = self._decode(payload, mtype)
                answer = self.llm.extract_visual(caption, mtype, feats.tolist())
                try:
                    entities, main = transform_to_node_ext(answer)
                    quarantined = False
                except ValueError:
                    entities, main, quarantined = [], None, True
                rows.append(
                    {
                        "conv_id": conv,
                        # stable id from the media id, disjoint from text
                        "chunk_id": VISUAL_CHUNK_BASE + int(mid.lstrip("m")),
                        "chunk_text": caption or "no caption given",
                        "nodes": entities,
                        "edges": answer.get("relationships", []) if not quarantined else [],
                        "properties": [],
                        "quarantined": quarantined,
                        "turn_first": -1,
                        "turn_last": -1,
                        "n_tokens": 0,
                        "main_visual_entity_name": main,
                    }
                )
            schema = (
                BUILD_LOGS.append(pa.field("quarantined", pa.bool_()))
                .append(pa.field("turn_first", pa.int32()))
                .append(pa.field("turn_last", pa.int32()))
                .append(pa.field("n_tokens", pa.int32()))
                .append(pa.field("main_visual_entity_name", pa.string()))
            )
            return pa.Table.from_pylist(rows, schema=schema)

    return media_ds.map_batches(
        VisualExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FrameSampleActor:
    """video payload -> one row per sampled frame tick (0, every_ms,
    2*every_ms, ... < duration_ms) — the frame-sampling stage of a
    video training-data pipeline (restates the M5 visual path's
    per-element fan-out for the video modality).

    Real deployment: ``__init__`` opens the codec once per actor;
    ``__call__`` seeks each tick and decodes. The stub keeps the
    fan-out REAL and makes even the fake frame identity
    oracle-replayable: ``frame_md5 = md5(to_base64(payload) || ':' ||
    ts_ms)`` — both engines recompute it byte-identically (the proven
    to_base64/md5 parity devices). ``strict=True`` raises the honest
    NotImplementedError at the codec boundary.
    """

    def __init__(self, every_ms: int = 250, strict: bool = False):
        if every_ms <= 0:
            raise ValueError("every_ms must be positive")
        self.every_ms = every_ms
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "video codecs are not available in this environment; "
                "plug a real decoder here (opened once per actor)"
            )
        ids, idxs, tss, ws, hs, fps = [], [], [], [], [], []
        for mid, mt, payload, w, h, dur in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            if not (mt or "").startswith("video/") or not dur or dur <= 0:
                continue
            b64 = base64.b64encode(payload or b"").decode()
            for idx, ts in enumerate(range(0, dur, self.every_ms)):
                ids.append(mid)
                idxs.append(idx)
                tss.append(ts)
                ws.append(w)
                hs.append(h)
                fps.append(
                    hashlib.md5(f"{b64}:{ts}".encode()).hexdigest()
                )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(idxs, pa.int64()),
                "ts_ms": pa.array(tss, pa.int64()),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "frame_md5": pa.array(fps, pa.string()),
            }
        )


def sample_video_frames(ds, every_ms: int = 250, concurrency: int = 2,
                        batch_size: int = 16, strict: bool = False):
    """Actor-pool frame sampling over a media Dataset: video rows fan
    out to ``ceil(duration_ms / every_ms)`` frame rows; image/audio
    rows are dropped. Small ``batch_size`` on purpose — payloads are
    large binaries and the fan-out multiplies rows (memory-aware
    sizing, same discipline as :func:`extract_media_features`)."""
    return ds.map_batches(
        FrameSampleActor,
        fn_constructor_kwargs={"every_ms": every_ms, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageResizeActor:
    """image payload -> bounded-dimension payload + new dims — the
    resize/thumbnail stage of an image training-data pipeline.

    Dimension math is PURE INTEGER (oracle-replayable): an image whose
    longest side exceeds ``max_dim`` scales to
    ``new_w = (w * max_dim) // max(w, h)`` (same for h, min 1);
    smaller images pass through untouched. Real deployment: __init__
    loads the image library once per actor; __call__ decodes, resizes,
    re-encodes. The stub keeps the metadata transform real and tags
    the fake resized payload as ``md5(to_base64(payload) || ':' ||
    new_w || 'x' || new_h)`` — both engines recompute it.
    ``strict=True`` raises at the codec boundary.
    """

    def __init__(self, max_dim: int = 32, strict: bool = False):
        if max_dim <= 0:
            raise ValueError("max_dim must be positive")
        self.max_dim = max_dim
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "image codecs are not available in this environment; "
                "plug a real resizer here (loaded once per actor)"
            )
        ids, ows, ohs, nws, nhs, fps = [], [], [], [], [], []
        for mid, mt, payload, w, h in zip(
            batch["media_id"].to_pylist(),
            batch["media_type"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            if not (mt or "").startswith("image/") or not w or not h:
                continue
            longest = max(w, h)
            if longest > self.max_dim:
                nw = max(1, (w * self.max_dim) // longest)
                nh = max(1, (h * self.max_dim) // longest)
            else:
                nw, nh = w, h
            b64 = base64.b64encode(payload or b"").decode()
            ids.append(mid)
            ows.append(w)
            ohs.append(h)
            nws.append(nw)
            nhs.append(nh)
            fps.append(
                hashlib.md5(f"{b64}:{nw}x{nh}".encode()).hexdigest()
            )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "width": pa.array(ows, pa.int64()),
                "height": pa.array(ohs, pa.int64()),
                "new_width": pa.array(nws, pa.int64()),
                "new_height": pa.array(nhs, pa.int64()),
                "resized_md5": pa.array(fps, pa.string()),
            }
        )


def resize_images(ds, max_dim: int = 32, concurrency: int = 2,
                  batch_size: int = 16, strict: bool = False):
    """Actor-pool image resize over a media Dataset: image rows emit
    integer-exact bounded dimensions (+ the replayable stub payload
    tag); non-images are dropped. Small batches — binary payloads
    (the extract_media_features memory discipline)."""
    return ds.map_batches(
        ImageResizeActor,
        fn_constructor_kwargs={"max_dim": max_dim, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_int_features(payload: bytes) -> "np.ndarray":
    """The stub codec's PRE-normalization integer features (uint16
    words of the blake2b digest) — the exact ints the aHash sign rule
    and its SQL replay share. A real codec would emit quantized
    decoder features here instead."""
    h = hashlib.blake2b(payload or b"", digest_size=FEATURE_DIM * 2).digest()
    return np.frombuffer(h, dtype=np.uint16).astype(np.int64)


class MediaAHashActor:
    """binary payload -> 32-bit aHash: bit i set when integer feature
    i exceeds the integer-mean floor (Σf // 32) — the average-hash
    rule on the stub codec's integer features, all exact ints so the
    oracle replays it bit-for-bit."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "media codecs are not available in this environment"
            )
        hashes = []
        for p in batch["payload"].to_pylist():
            f = media_int_features(p)
            thr = int(f.sum()) // FEATURE_DIM
            bits = 0
            for i, v in enumerate(f.tolist()):
                if v > thr:
                    bits |= 1 << i
            hashes.append(bits)
        return pa.table({
            "media_id": batch["media_id"],
            "ahash": pa.array(hashes, pa.int64()),
        })


def media_ahash_pairs(ds, threshold: int = 3, concurrency: int = 2,
                      batch_size: int = 32):
    """Perceptual-hash near-dup pairs over a media corpus: aHash per
    payload (actor pool — the codec-holding stage), then LSH banding
    of the 32-bit hash into 4×8-bit bands (bucket groupby, EMIT-ONCE:
    a pair surfaces only from its first matching band) and a hamming
    verify. With ``threshold ≤ 3`` the banding is LOSSLESS by
    pigeonhole — 3 differing bits cannot dirty all 4 bands — so the
    SQL oracle replays plain all-pairs hamming with no band logic and
    must agree exactly. Returns ``(id_a, id_b, hamming)`` sorted.

    Scale shape: candidate generation is bucket-local (no all-pairs
    anywhere); the verify is popcount on XOR. The stub codec means
    only exact payload dups land within threshold — the PLUMBING
    (actor pool, banding, emit-once, verify) is the real, tested
    part; a real decoder drops into :class:`MediaAHashActor`.
    """
    if not 0 <= threshold <= 3:
        raise ValueError(
            "threshold must be in [0, 3] — 4 differing bits can dirty "
            "all 4 bands and the banding would miss pairs the oracle "
            "finds"
        )
    hashes = ds.map_batches(
        MediaAHashActor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    def explode(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ah = b["ahash"].to_numpy(zero_copy_only=False)
        ids = b["media_id"].to_pylist()
        rows_band, rows_key, rows_id, rows_hash = [], [], [], []
        for mid, h in zip(ids, ah.tolist()):
            for band in range(4):
                rows_band.append(band)
                rows_key.append((h >> (8 * band)) & 0xFF)
                rows_id.append(mid)
                rows_hash.append(h)
        return pa.table({
            "band": pa.array(rows_band, pa.int64()),
            "key": pa.array(rows_key, pa.int64()),
            "media_id": pa.array(rows_id, pa.string()),
            "ahash": pa.array(rows_hash, pa.int64()),
        })

    def bucket_pairs(g: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ids = g["media_id"].to_pylist()
        ah = g["ahash"].to_numpy(zero_copy_only=False)
        band = int(g["band"][0].as_py())
        out_a, out_b, out_h = [], [], []
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                a, b_ = sorted((ids[i], ids[j]))
                x = int(ah[i]) ^ int(ah[j])
                ham = bin(x).count("1")
                if ham > threshold:
                    continue
                # EMIT-ONCE: only the FIRST band the pair shares emits
                first = next(
                    bb for bb in range(4)
                    if ((x >> (8 * bb)) & 0xFF) == 0
                )
                if first != band:
                    continue
                out_a.append(a)
                out_b.append(b_)
                out_h.append(ham)
        return pa.table({
            "id_a": pa.array(out_a, pa.string()),
            "id_b": pa.array(out_b, pa.string()),
            "hamming": pa.array(out_h, pa.int64()),
        })

    return (
        hashes.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .sort(["id_a", "id_b"])
    )
