"""Embedding/vector-sync stage (W2).

Reference: ``prepare_sync_data`` builds vector rows for every node,
edge and property — doc text ``name + ", " + description`` for nodes,
``node.name + ", " + description`` for properties (F2,
``eschergraph/tools/prepare_sync_data.py:44-75``), newline→space before
embedding (F4, ``eschergraph/agents/providers/openai.py:194``), model
text-embedding-3-large. Here: an actor-pool ``map_batches`` over the
union graph rows; the embedder (mock HashEmbedder, or a real client)
is constructed once per actor.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

from ..llm import Embedder, HashEmbedder
from ..schemas import EMBEDDINGS


class EmbedActor:
    def __init__(self, embedder_factory: Callable[[], Embedder] = HashEmbedder):
        from .chunking import pin_arrow_threads

        pin_arrow_threads()
        self.embedder = embedder_factory()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "kind" in batch.column_names:
            kinds = batch["kind"].to_pylist()
        else:
            # graph rows read back from kind-partitioned Parquet lose
            # the partition column; recover it from the id layout
            kinds = [
                "edge" if frm else ("property" if nn else "node")
                for frm, nn in zip(
                    batch["frm"].is_valid().to_pylist(),
                    batch["node_name"].is_valid().to_pylist(),
                )
            ]
        rows_id, rows_text, rows_type, rows_level, rows_doc = [], [], [], [], []
        names = batch["name"].to_pylist()
        descs = batch["description"].to_pylist()
        node_names = batch["node_name"].to_pylist()
        levels = batch["level"].to_pylist()
        ids = batch["id"].to_pylist()
        convs = batch["conv_id"].to_pylist()
        for kind, name, desc, node_name, level, id_, conv in zip(
            kinds, names, descs, node_names, levels, ids, convs
        ):
            if kind == "node":
                text = f"{name}, {desc or ''}"
            elif kind == "property":
                text = f"{node_name}, {desc or ''}"
            elif kind == "edge":
                text = desc or ""
            else:
                continue
            rows_id.append(id_)
            rows_text.append(text.replace("\n", " "))
            rows_type.append(kind)
            rows_level.append(level if level is not None else 0)
            rows_doc.append(conv)
        vecs = self.embedder.embed(rows_text)
        return pa.Table.from_pydict(
            {
                "id": pa.array(rows_id, pa.string()),
                "text": pa.array(rows_text, pa.large_string()),
                "type": pa.array(rows_type, pa.string()),
                "level": pa.array(rows_level, pa.int32()),
                "document_id": pa.array(rows_doc, pa.string()),
                "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            },
            schema=EMBEDDINGS,
        )


def embed_graph(graph_union, embedder_factory: Callable[[], Embedder] = HashEmbedder,
                concurrency=None):
    """union graph Dataset -> embeddings Dataset (actor pool)."""
    if concurrency is None:
        import os

        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        # one pool-sizing policy for all actor stages (CLAUDE.md: a pool
        # sized near ALL cpus starves downstream task stages) — same
        # fraction + override knob as ExtractorActor
        frac = float(os.environ.get("EG_POOL_FRACTION", "0.3"))
        concurrency = max(1, int(round(cpus * frac)))
    return graph_union.map_batches(
        EmbedActor,
        fn_constructor_kwargs={"embedder_factory": embedder_factory},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    )
