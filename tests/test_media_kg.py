"""Visual elements feed the knowledge graph (VERDICT r1 item 8) and
edges/properties with dangling endpoints are dropped at persist time
(reference parity, build_pipeline.py:279-308; ADVICE r1)."""

import pyarrow as pa
import ray.data as rd

from eschergraph_ray.functions.multimodal import (
    media_build_logs,
    synthetic_attached_media,
)
from eschergraph_ray.pipelines.build import build_graph_with_media
from eschergraph_ray.sources.transcripts import generate_transcripts_table
from eschergraph_ray.stages.graph_build import build_graph_batch
from eschergraph_ray.schemas import BUILD_LOGS


def test_media_logs_shape_and_main_entity():
    conv_ids = ["conv-0000000", "conv-0000001"]
    media = synthetic_attached_media(conv_ids, per_conv=2)
    logs = media_build_logs(rd.from_arrow(media), concurrency=1).to_pandas()
    assert len(logs) == 4
    assert logs["main_visual_entity_name"].notna().all()
    assert (~logs["quarantined"]).all()
    # visual chunk ids disjoint from the text range
    assert (logs["chunk_id"] >= 1_000_000_000).all()


def test_visual_nodes_reach_graph_with_is_visual():
    tbl = generate_transcripts_table(3)
    conv_ids = sorted(set(tbl["conv_id"].to_pylist()))
    media = synthetic_attached_media(conv_ids, per_conv=1)
    graph = build_graph_with_media(
        rd.from_arrow(tbl), rd.from_arrow(media)
    ).to_pandas()
    nodes = graph[graph["kind"] == "node"]
    vis = nodes[nodes["is_visual"] == True]  # noqa: E712
    # one main visual entity per conversation, at level 0
    assert len(vis) == len(conv_ids)
    assert set(vis["level"]) == {0}
    assert all(n.startswith("image ") or n.startswith("audio ") or
               n.startswith("video ") for n in vis["name"])
    # the figure links to its caption entity via a "depicts" edge
    edges = graph[(graph["kind"] == "edge") & (graph["description"] == "depicts")]
    assert len(edges) >= len(conv_ids)
    # visual triples exist too
    triples = graph[(graph["kind"] == "triple") & (graph["pred"] == "depicts")]
    assert len(triples) >= len(conv_ids)


def _log_row(conv, chunk_id, text, nodes, edges, props):
    return {
        "conv_id": conv,
        "chunk_id": chunk_id,
        "chunk_text": text,
        "nodes": nodes,
        "edges": edges,
        "properties": props,
    }


def test_dangling_edge_and_property_dropped():
    """An edge whose endpoint was never extracted as an entity node, and
    a property with an unknown owner, are dropped (not auto-created)."""
    logs = pa.Table.from_pylist(
        [
            _log_row(
                "c1",
                0,
                "chunk text",
                [{"name": "alice novak", "description": "an engineer"}],
                [
                    {"source": "alice novak", "target": "ghost entity",
                     "relationship": "mentors"},
                ],
                [{"entity_name": "phantom", "properties": ["owns the runbook"]}],
            )
        ],
        schema=BUILD_LOGS,
    )
    graph = build_graph_batch(logs).to_pandas()
    nodes = graph[graph["kind"] == "node"]
    assert "ghost entity" not in set(nodes["name"])
    assert "phantom" not in set(nodes["name"])
    assert len(graph[graph["kind"] == "edge"]) == 0
    assert len(graph[graph["kind"] == "property"]) == 0
    assert len(graph[graph["kind"] == "triple"]) == 0
