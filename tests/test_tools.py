"""Agent tool-calling surface (reference agents/tools.py:1-61
analogue): schema generation, signature derivation, dispatch."""

import pytest

from eschergraph_ray.tools import (
    FunctionTool,
    Parameter,
    ToolBox,
    ToolException,
    function_tool,
)


def test_parameter_key_value_and_enum():
    p = Parameter("lang", "string", "language code",
                  enum=["en", "nl"], is_required=True)
    assert p.to_key() == "lang"
    assert p.to_value() == {
        "type": "string", "description": "language code",
        "enum": ["en", "nl"],
    }
    # no enum -> no enum key (reference Parameter.to_value)
    assert "enum" not in Parameter("k", "integer", "d").to_value()


def test_function_tool_schema_shape():
    t = FunctionTool(
        name="search",
        description="vector search",
        parameters=[
            Parameter("query", "string", "the query", is_required=True),
            Parameter("top_n", "integer", "hits to return"),
        ],
    )
    s = t.to_schema()
    assert s["type"] == "function"
    f = s["function"]
    assert f["name"] == "search" and f["parameters"]["type"] == "object"
    assert set(f["parameters"]["properties"]) == {"query", "top_n"}
    assert f["parameters"]["required"] == ["query"]


def test_function_tool_from_signature_and_dispatch():
    def add_tag(doc_id: int, tag: str, weight: float = 1.0) -> dict:
        """Attach a tag to a document."""
        return {"doc_id": doc_id, "tag": tag, "weight": weight}

    t = function_tool(add_tag, descriptions={"tag": "the tag to attach"})
    assert t.name == "add_tag"
    assert t.description == "Attach a tag to a document."
    assert t.required == ["doc_id", "tag"]
    types = {p.name: p.type for p in t.parameters}
    assert types == {"doc_id": "integer", "tag": "string",
                     "weight": "number"}
    assert t(doc_id=3, tag="x") == {"doc_id": 3, "tag": "x", "weight": 1.0}


def test_dispatch_validation():
    def f(a: str, mode: str = "fast"):
        return (a, mode)

    t = function_tool(f)
    t.parameters[1].enum = ["fast", "slow"]
    box = ToolBox([t])
    assert box.dispatch({"name": "f", "arguments": {"a": "x"}}) == ("x", "fast")
    with pytest.raises(ToolException, match="missing required"):
        box.dispatch({"name": "f", "arguments": {}})
    with pytest.raises(ToolException, match="unknown argument"):
        box.dispatch({"name": "f", "arguments": {"a": "x", "z": 1}})
    with pytest.raises(ToolException, match="enum"):
        box.dispatch({"name": "f", "arguments": {"a": "x", "mode": "warp"}})
    with pytest.raises(ToolException, match="unknown tool"):
        box.dispatch({"name": "nope", "arguments": {}})
    with pytest.raises(ToolException, match="duplicate"):
        box.register(t)
    assert [s["function"]["name"] for s in box.schemas()] == ["f"]
