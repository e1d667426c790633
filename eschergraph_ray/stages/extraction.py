"""Per-chunk triple extraction — the hot path, as an actor pool.

Reference: ``BuildPipeline._handle_nodes_edges_chunk`` (M3,
``eschergraph/builder/build_pipeline.py:172-189``) and
``_extract_properties`` (M4, ``build_pipeline.py:191-225``), which run
as two ThreadPool(10) passes of one LLM call per chunk. Here both are
one ``map_batches`` actor-pool stage over Arrow chunk batches: the
client (mock or real provider + retry state) is built once per actor in
``__init__`` (SURVEY.md §2.9); property extraction is chunk-local so it
needs no extra shuffle — fusing M3+M4 into one stage halves the passes
over chunk text (documented deviation from the reference's two
sequential ThreadPool sweeps; semantics are identical because the
property prompt only sees the chunk's own extracted node names,
``json_property.jinja:30-40``).

Validation mirrors ``BuildingTools.check_node_edge_ext``
(``eschergraph/builder/building_tools.py:105-121``); a malformed
extraction quarantines the row (empty extraction + ``quarantined=True``)
instead of silently dropping it (the reference prints and drops,
``build_pipeline.py:108-112``).
"""

from __future__ import annotations

import os
from typing import Callable

import pyarrow as pa

from ..llm import DeterministicMockLLM, LLMClient
from ..schemas import BUILD_LOGS


def _req_str(v) -> str:
    """Quarantine-boundary value check: shape-valid payloads with
    non-string values must not reach pa.array (ArrowInvalid kills the
    task instead of quarantining the row)."""
    if not isinstance(v, str):
        raise ValueError(f"expected string, got {type(v).__name__}")
    return v


def check_node_edge_ext(ext: dict) -> bool:
    """building_tools.py:105-121 analogue: shape-check the LLM JSON."""
    if not isinstance(ext, dict):
        return False
    ents, rels = ext.get("entities"), ext.get("relationships")
    if not isinstance(ents, list) or not isinstance(rels, list):
        return False
    for e in ents:
        if not isinstance(e, dict) or "name" not in e or "description" not in e:
            return False
    for r in rels:
        if not isinstance(r, dict) or not {"source", "target", "relationship"} <= r.keys():
            return False
    return True


BUILD_LOGS_Q = BUILD_LOGS.append(pa.field("quarantined", pa.bool_()))


class ExtractorActor:
    """chunks -> build_logs. One client per actor; vector-free but the
    per-row work IS the model call (the mock is regex inversion)."""

    def __init__(
        self,
        llm_factory: Callable[[], LLMClient] = DeterministicMockLLM,
        side_write_dir: str | None = None,
    ):
        from .chunking import pin_arrow_threads

        pin_arrow_threads()
        self.llm = llm_factory()
        # When set, every output block is also persisted to this
        # directory (the build_logs checkpoint) from inside the stage —
        # one file per conv-complete block — so the expensive extraction
        # phase is checkpointed without a second pipeline execution.
        self.side_write_dir = side_write_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch["conv_id"].to_pylist()
        chunk_ids = batch["chunk_id"].to_pylist()
        texts = batch["text"].to_pylist()

        nodes_col: list[list[dict]] = []
        edges_col: list[list[dict]] = []
        props_col: list[list[dict]] = []
        quarantined: list[bool] = []
        for text in texts:
            # ALL payload parsing sits inside the quarantine boundary:
            # a real provider can return shape-valid JSON whose values
            # are the wrong types (non-string names, "properties" as a
            # bare string) — that must quarantine the ROW, never kill
            # the task (the module's stated contract).
            try:
                ext = self.llm.extract_nodes_edges(text)
                if not check_node_edge_ext(ext):
                    raise ValueError("invalid NodeEdgeExt shape")
                nodes = [
                    {"name": _req_str(e["name"]), "description": _req_str(e["description"])}
                    for e in ext["entities"]
                ]
                edges = [
                    {
                        "source": _req_str(r["source"]),
                        "target": _req_str(r["target"]),
                        "relationship": _req_str(r["relationship"]),
                    }
                    for r in ext["relationships"]
                ]
                node_names = [e["name"] for e in nodes]
                try:
                    props_raw = self.llm.extract_properties(text, node_names)
                except Exception:
                    props_raw = []
                props = []
                for p in props_raw:
                    pl = p["properties"]
                    if isinstance(pl, (str, bytes)) or not isinstance(pl, (list, tuple)):
                        raise ValueError("'properties' must be a list of strings")
                    props.append(
                        {
                            "entity_name": _req_str(p["entity_name"]),
                            "properties": [_req_str(x) for x in pl],
                        }
                    )
            except Exception:
                nodes_col.append([])
                edges_col.append([])
                props_col.append([])
                quarantined.append(True)
                continue
            nodes_col.append(nodes)
            edges_col.append(edges)
            props_col.append(props)
            quarantined.append(False)

        out = pa.Table.from_pydict(
            {
                "conv_id": pa.array(conv_ids, pa.string()),
                "chunk_id": pa.array(chunk_ids, pa.int32()),
                "chunk_text": pa.array(texts, pa.large_string()),
                "nodes": pa.array(nodes_col, BUILD_LOGS.field("nodes").type),
                "edges": pa.array(edges_col, BUILD_LOGS.field("edges").type),
                "properties": pa.array(props_col, BUILD_LOGS.field("properties").type),
                "quarantined": pa.array(quarantined, pa.bool_()),
            },
            schema=BUILD_LOGS_Q,
        )
        # Carry turn spans + token counts through for lineage and the
        # per-conversation Document records (chunk/token/turn counts).
        for col in ("turn_first", "turn_last", "n_tokens"):
            if col in batch.column_names:
                out = out.append_column(col, batch[col])
        # Text logs are never visual; the null column keeps the schema
        # union-compatible with media_build_logs (M5/M6).
        out = out.append_column(
            "main_visual_entity_name",
            pa.array([None] * out.num_rows, pa.string()),
        )
        if self.side_write_dir is not None and out.num_rows > 0:
            import hashlib

            import pyarrow.parquet as pq

            os.makedirs(self.side_write_dir, exist_ok=True)
            # deterministic name from the block's content span: a Ray
            # task retry overwrites its own file instead of duplicating
            # checkpoint rows (ADVICE r1)
            span = f"{conv_ids[0]}:{chunk_ids[0]}:{conv_ids[-1]}:{chunk_ids[-1]}:{len(conv_ids)}"
            name = hashlib.blake2b(span.encode(), digest_size=12).hexdigest()
            tmp = os.path.join(self.side_write_dir, f".{name}.tmp")
            pq.write_table(out.combine_chunks(), tmp)
            os.replace(tmp, os.path.join(self.side_write_dir, f"{name}.parquet"))
        return out


def extract_build_logs(
    chunks,
    llm_factory: Callable[[], LLMClient] = DeterministicMockLLM,
    concurrency=None,
    batch_size: int | None = 256,
    side_write_dir: str | None = None,
):
    """chunks Dataset -> build_logs Dataset (actor pool, Arrow in/out).

    ``concurrency`` bounds the pool — with a real provider this is the
    rate-limit control (the reference caps at 10 threads,
    ``eschergraph/agents/llm.py:38``); the mock is CPU-bound so we
    default to letting Ray size the pool by available CPUs.
    """
    if concurrency is None:
        # Fixed pool at ~30% of the session's CPUs: a pool that
        # reserves every slot starves the downstream graph/write task
        # stage and the pipeline serializes stage-by-stage (observed
        # ~2x wall); ~30/70 matches the measured work split between
        # read+chunk+extract (actor op) and graph+write (task op).
        # Ray's actor-pool autoscaler is not used — it ramps too slowly
        # for short runs; with a real provider a fixed pool is the
        # rate-limit control anyway.
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        frac = float(os.environ.get("EG_POOL_FRACTION", "0.3"))
        concurrency = max(1, int(round(cpus * frac)))
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
    return chunks.map_batches(
        ExtractorActor,
        fn_constructor_kwargs={
            "llm_factory": llm_factory,
            "side_write_dir": side_write_dir,
        },
        **kwargs,
    )
