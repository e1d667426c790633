"""Extraction stage semantics — mirrors the reference's build-log tests
(tests/builder/test_build_pipeline.py) with the deterministic mock."""

import pyarrow as pa

from eschergraph_ray.llm import DeterministicMockLLM
from eschergraph_ray.stages.extraction import ExtractorActor, check_node_edge_ext


def _chunk_batch(texts):
    return pa.table(
        {
            "conv_id": pa.array(["c"] * len(texts), pa.string()),
            "chunk_id": pa.array(list(range(len(texts))), pa.int32()),
            "text": pa.array(texts, pa.large_string()),
        }
    )


def test_mock_extracts_entities_edges_properties():
    text = (
        "[[Alice Zhang]] ((a compiler engineer)). "
        "[[Alice Zhang]] <<mentors>> [[Bob Stone]]. "
        "[[Bob Stone]] {{keeps the runbook}}."
    )
    out = ExtractorActor()(_chunk_batch([text]))
    nodes = out["nodes"][0].as_py()
    assert {n["name"] for n in nodes} == {"alice zhang", "bob stone"}
    assert dict((n["name"], n["description"]) for n in nodes)["alice zhang"] == (
        "a compiler engineer"
    )
    edges = out["edges"][0].as_py()
    assert edges == [
        {"source": "Alice Zhang", "target": "Bob Stone", "relationship": "mentors"}
    ]
    props = out["properties"][0].as_py()
    assert props == [{"entity_name": "bob stone", "properties": ["keeps the runbook"]}]
    assert out["quarantined"][0].as_py() is False


def test_properties_match_existing_nodes_only():
    # json_property.jinja:30-40 — properties only for extracted nodes
    llm = DeterministicMockLLM()
    props = llm.extract_properties("[[Ghost]] {{owns nothing}}.", ["somebody else"])
    assert props == []


def test_malformed_extraction_quarantined():
    class BrokenLLM:
        def extract_nodes_edges(self, text):
            return {"entities": "not-a-list", "relationships": []}

        def extract_properties(self, text, names):
            return []

    out = ExtractorActor(llm_factory=BrokenLLM)(_chunk_batch(["anything"]))
    assert out["quarantined"][0].as_py() is True
    assert out["nodes"][0].as_py() == []


def test_check_node_edge_ext_shapes():
    assert check_node_edge_ext({"entities": [], "relationships": []})
    assert not check_node_edge_ext({"entities": [{}], "relationships": []})
    assert not check_node_edge_ext({"entities": []})
    assert not check_node_edge_ext(None)


def test_first_nonempty_description_wins():
    text = "[[X Y]] <<knows>> [[Z W]]. [[X Y]] ((the real description))."
    out = ExtractorActor()(_chunk_batch([text]))
    d = {n["name"]: n["description"] for n in out["nodes"][0].as_py()}
    assert d["x y"] == "the real description"
