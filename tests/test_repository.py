"""Repository-facade point lookups (repository.py parity surface)."""

import pytest

from eschergraph_ray.pipelines.build import load_kind_arrow
from eschergraph_ray.pipelines.repository import (
    clear_change_log,
    get_document_by_id,
    get_document_by_name,
    get_edge_by_id,
    get_node_by_id,
    get_node_by_name,
    get_property_by_id,
    list_available_tags,
    load_change_log,
)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    from eschergraph_ray.pipelines.build import build
    from eschergraph_ray.sources.transcripts import transcripts_parquet_dir

    out = str(tmp_path_factory.mktemp("repo") / "out")
    build(
        transcripts_parquet_dir(12, root="/tmp/eschergraph_ray_test"),
        out,
        tags_fn=lambda c: {"team": "search", "tier": int(c[-1], 36) % 3},
    )
    return out


def test_get_node_by_id(built):
    nodes = load_kind_arrow(built, "node")
    row = nodes.to_pylist()[3]
    got = get_node_by_id(built, row["node_id"])
    assert got is not None
    assert got["name"] == row["name"] and got["conv_id"] == row["conv_id"]
    assert get_node_by_id(built, "no-such-id") is None


def test_get_edge_and_property_by_id(built):
    edge = load_kind_arrow(built, "edge").to_pylist()[0]
    got = get_edge_by_id(built, edge["edge_id"])
    assert got is not None and got["frm"] == edge["frm"] and got["to"] == edge["to"]
    prop = load_kind_arrow(built, "property").to_pylist()[0]
    gp = get_property_by_id(built, prop["property_id"])
    assert gp is not None and gp["node_id"] == prop["node_id"]
    assert get_edge_by_id(built, "nope") is None
    assert get_property_by_id(built, "nope") is None


def test_get_node_by_name_level0_normalized(built):
    import pyarrow.compute as pc

    nodes = load_kind_arrow(built, "node")
    lvl0 = nodes.filter(pc.equal(nodes["level"], 0)).to_pylist()[0]
    got = get_node_by_name(built, lvl0["name"], lvl0["conv_id"])
    assert got is not None and got["node_id"] == lvl0["node_id"]
    # F1: lookups normalize like persistence does
    shouted = get_node_by_name(built, lvl0["name"].upper(), lvl0["conv_id"])
    assert shouted is not None and shouted["node_id"] == lvl0["node_id"]
    assert get_node_by_name(built, "unknown entity", lvl0["conv_id"]) is None


def test_document_lookups_and_tags(built):
    nodes = load_kind_arrow(built, "node")
    conv = nodes["conv_id"][0].as_py()
    doc = get_document_by_id(built, conv)
    assert doc is not None and doc["conv_id"] == conv and doc["turn_num"] > 0
    assert get_document_by_name(built, conv) == doc
    assert get_document_by_id(built, "missing-conv") is None
    tags = list_available_tags(built)
    assert tags == {"team": "str", "tier": "int"}


def test_clear_change_log(built):
    assert load_change_log(built).count() > 0
    moved = clear_change_log(built)
    assert moved > 0
    assert load_change_log(built).count() == 0
    assert clear_change_log(built) == 0  # idempotent


def test_get_all_documents_empty_build(tmp_path):
    from eschergraph_ray.pipelines.repository import get_all_documents

    assert get_all_documents(str(tmp_path)).count() == 0


def test_point_mutations_roundtrip(tmp_path):
    """update_node_description / add_property: rewrite-in-place, change
    log UPDATE/CREATE emission, idempotent re-add, and a sync plan that
    upserts exactly the touched objects (VERDICT r3 #7)."""
    import pyarrow.compute as pc

    from eschergraph_ray.functions.changelog import sync_actions
    from eschergraph_ray.pipelines.build import build
    from eschergraph_ray.pipelines.repository import (
        add_property,
        update_node_description,
    )
    from eschergraph_ray.sources.transcripts import transcripts_parquet_dir

    out = str(tmp_path / "out")
    build(transcripts_parquet_dir(6, root="/tmp/eschergraph_ray_test"), out)
    nodes = load_kind_arrow(out, "node")
    row = nodes.filter(pc.equal(nodes["level"], 0)).to_pylist()[0]
    nid = row["node_id"]

    # simulate a completed external sync so ONLY the point mutations
    # drive the next plan
    clear_change_log(out)

    assert update_node_description(out, "no-such-id", "x") is None
    upd = update_node_description(out, nid, "a corrected description")
    assert upd is not None and upd["description"] == "a corrected description"
    assert get_node_by_id(out, nid)["description"] == "a corrected description"

    n_props = load_kind_arrow(out, "property").num_rows
    assert add_property(out, "no-such-id", "x") is None
    prop = add_property(out, nid, "newly observed trait")
    assert prop is not None and prop["node_id"] == nid
    assert prop["description"] == "newly observed trait"
    assert load_kind_arrow(out, "property").num_rows == n_props + 1
    node = get_node_by_id(out, nid)
    assert "newly observed trait" in (node["properties"] or [])
    assert node["properties"] == sorted(node["properties"])

    # idempotent re-add: same deterministic id, no second row
    again = add_property(out, nid, "newly observed trait")
    assert again["property_id"] == prop["property_id"]
    assert load_kind_arrow(out, "property").num_rows == n_props + 1

    # the mutation-emitted log alone plans upserts for exactly the
    # touched objects (A4 algebra over UPDATE/CREATE rows)
    log = load_change_log(out)
    acts = {r["id"]: r["action"] for r in log.take_all()}
    assert acts[nid] == "UPDATE" and acts[prop["property_id"]] == "CREATE"
    plan = sync_actions(log).to_pandas().set_index("id")["sync_action"]
    assert plan[nid] == "upsert" and plan[prop["property_id"]] == "upsert"
    assert set(plan.index) == {nid, prop["property_id"]}
