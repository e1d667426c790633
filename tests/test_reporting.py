"""Dashboard, estimator, change-log algebra, RAG answer."""

import os

import pyarrow as pa
import pytest
import ray.data as rd

from eschergraph_ray.functions.changelog import sync_actions
from eschergraph_ray.functions.estimator import estimate_build
from eschergraph_ray.pipelines.dashboard import gather_dashboard, visualize_html
from eschergraph_ray.pipelines.search import global_answer, rag_answer
from eschergraph_ray.stages.embed import EmbedActor


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    from eschergraph_ray.pipelines.build import build
    from eschergraph_ray.sources.transcripts import transcripts_parquet_dir

    out = str(tmp_path_factory.mktemp("dash") / "out")
    build(transcripts_parquet_dir(12, root="/tmp/eschergraph_ray_test"), out)
    return out


def test_dashboard_counts_and_topk(built):
    d = gather_dashboard(built)
    assert d["node_count"] > 0 and d["edge_count"] > 0
    assert set(d["nodes_by_level"]) == {0, 1, 2}
    assert d["nodes_by_level"][2] == 12  # one level-2 node per conversation
    assert len(d["top_nodes_by_degree"]) == 5
    degs = [r["degree"] for r in d["top_nodes_by_degree"]]
    assert degs == sorted(degs, reverse=True)
    assert 1 <= len(d["top_communities_by_size"]) <= 3


def test_visualize_html(built, tmp_path):
    from eschergraph_ray.pipelines.build import load_kind_arrow

    conv = load_kind_arrow(built, "node")["conv_id"][0].as_py()
    path = visualize_html(built, conv, str(tmp_path / "g.html"))
    html = open(path).read()
    assert "<svg" in html and "circle" in html


def test_estimator_model():
    chunks = rd.from_arrow(
        pa.table(
            {
                "conv_id": ["c"] * 4,
                "chunk_id": [0, 1, 2, 3],
                "n_tokens": [400, 400, 400, 400],
            }
        )
    )
    est = estimate_build(chunks, model="gpt-4o", pool_size=10)
    assert est.chunks == 4 and est.tokens == 1600
    assert est.llm_calls == 10  # ceil(2.5 * 4)
    # reference model: ceil(4/2)*4 + 2*4*4 = 40 (estimator.py:57-71)
    assert est.est_seconds_reference == 40.0
    assert est.est_seconds_ray == 4.0  # 10 calls * 4s / 10 workers
    assert est.est_cost_usd > 0


def test_sync_actions_algebra():
    changes = rd.from_arrow(
        pa.table(
            {
                "id": ["a", "a", "b", "c", "c", "d", "e", "e"],
                "action": [
                    "CREATE", "UPDATE",   # a -> upsert
                    "DELETE",             # b -> delete
                    "CREATE", "DELETE",   # c -> neither (cancels)
                    "UPDATE",             # d -> upsert
                    "UPDATE", "DELETE",   # e -> delete (update doesn't protect)
                ],
            }
        )
    )
    out = sync_actions(changes).to_pandas().set_index("id")["sync_action"].to_dict()
    assert out == {"a": "upsert", "b": "delete", "d": "upsert", "e": "delete"}


def _emb_ds():
    rows = pa.table(
        {
            "kind": ["node", "node"],
            "conv_id": ["c1", "c1"],
            "id": ["n1", "n2"],
            "name": ["alice zhang", "bob stone"],
            "description": ["a compiler engineer", "a gardener"],
            "node_name": [None, None],
            "level": [0, 0],
        }
    )
    return rd.from_arrow(EmbedActor()(rows))


def test_rag_answer_shape():
    out = rag_answer(_emb_ds(), "who is alice zhang the engineer?")
    assert out["answer"].startswith("Based on")
    assert out["sources"][0] == "n1"
    assert out["visuals"] == []


def test_global_answer_no_hits():
    out = global_answer(_emb_ds(), "anything")  # no level-1 rows
    assert out == "I could not find relevant information."
