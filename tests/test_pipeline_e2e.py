"""End-to-end build: P/R vs the generator's ground truth, and
checkpoint/resume equivalence (north_rule)."""

import json
import shutil

import pytest

from eschergraph_ray.pipelines.build import build, load_kind_arrow
from eschergraph_ray.sources.transcripts import (
    generate_transcripts_table,
    oracle_properties_table,
    oracle_triples_table,
    transcripts_parquet_dir,
)

N = 30
SRC_ROOT = "/tmp/eschergraph_ray_test"


@pytest.fixture(scope="module")
def src_dir():
    return transcripts_parquet_dir(N, root=SRC_ROOT)


def _triple_set(out_dir):
    t = load_kind_arrow(out_dir, "triple").to_pandas()
    return set(map(tuple, t[["conv_id", "subj", "pred", "obj"]].values))


def test_build_pr_vs_oracle(src_dir):
    out = "/tmp/eg_t_e2e"
    shutil.rmtree(out, ignore_errors=True)
    res = build(src_dir, out)
    got = _triple_set(out)
    exp = set(map(tuple, oracle_triples_table(N).to_pandas().values))
    tp = len(got & exp)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(exp))
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"
    # properties too (incl. self-loop downgrades)
    props = load_kind_arrow(out, "property").to_pandas()
    gotp = set(map(tuple, props[["conv_id", "node_name", "description"]].values))
    expp = set(map(tuple, oracle_properties_table(N).to_pandas().values))
    tpp = len(gotp & expp)
    assert tpp / max(1, len(gotp)) >= 0.95
    assert tpp / max(1, len(expp)) >= 0.95
    # lineage recorded per partition
    lin = res.lineage.to_pylist()
    assert lin and all(r["status"] == "committed" for r in lin)
    assert sum(r["triple_count"] for r in lin) == len(got)


def test_killed_run_resumes_from_committed_partition(src_dir):
    out = "/tmp/eg_t_resume"
    shutil.rmtree(out, ignore_errors=True)
    with pytest.raises(RuntimeError, match="injected failure"):
        build(src_dir, out, commit_groups=3, fail_after_group=1)
    manifest = json.load(open(out + "/manifest.json"))
    statuses = sorted(v["status"] for v in manifest["partitions"].values())
    assert "committed" in statuses and len(statuses) < 3 or statuses.count("committed") == 1
    # resume completes the remaining groups only
    build(src_dir, out, commit_groups=3)
    manifest = json.load(open(out + "/manifest.json"))
    assert all(v["status"] == "committed" for v in manifest["partitions"].values())
    # identical output to a single-shot run (deterministic IDs)
    out2 = "/tmp/eg_t_single"
    shutil.rmtree(out2, ignore_errors=True)
    build(src_dir, out2, commit_groups=1)
    assert _triple_set(out) == _triple_set(out2)
    # sidecars are complete after resume: one Document record per
    # conversation, change log covers every persisted object
    from eschergraph_ray.pipelines.build import (
        load_change_log,
        load_documents_arrow,
    )

    docs_resumed = load_documents_arrow(out)
    docs_single = load_documents_arrow(out2)
    assert sorted(docs_resumed["conv_id"].to_pylist()) == sorted(
        docs_single["conv_id"].to_pylist()
    )
    n_objects = sum(
        load_kind_arrow(out, k).num_rows for k in ("node", "edge", "property")
    )
    log = load_change_log(out).to_pandas()
    assert len(log) == n_objects
    assert sorted(log["id"]) == sorted(
        load_change_log(out2).to_pandas()["id"]
    )


def test_generator_deterministic():
    a = generate_transcripts_table(4)
    b = generate_transcripts_table(4)
    assert a.equals(b)


def test_instage_sidecars_match_legacy_derivation(src_dir):
    # VERDICT r2 #8: the fused path emits Document-record (kind=docrec)
    # and CREATE change-log (kind=changelog) rows inside the graph
    # stage; the sidecar files must be value-identical to the legacy
    # driver-side derivations (DuckDB aggregate over build_logs /
    # projection of the node, edge, property partitions).
    import os

    import duckdb
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    out = "/tmp/eg_t_sidecar"
    shutil.rmtree(out, ignore_errors=True)
    build(src_dir, out, commit_groups=2)
    for pid in sorted(os.listdir(os.path.join(out, "graph"))):
        graph_dir = os.path.join(out, "graph", pid)
        assert os.path.isdir(os.path.join(graph_dir, "kind=docrec"))
        assert os.path.isdir(os.path.join(graph_dir, "kind=changelog"))
        # documents sidecar vs legacy DuckDB aggregate over build_logs
        logs_dir = os.path.join(out, "build_logs", pid)
        con = duckdb.connect()
        legacy_docs = con.execute(
            f"""
            SELECT conv_id, count(*) AS chunk_num,
                   coalesce(sum(CAST(n_tokens AS BIGINT)), 0) AS token_num,
                   max(turn_last) + 1 AS turn_num
            FROM read_parquet('{logs_dir}/**/*.parquet')
            GROUP BY conv_id ORDER BY conv_id
            """
        ).arrow()
        con.close()
        got_docs = pq.read_table(
            os.path.join(out, "documents", f"{pid}.parquet"),
            columns=["conv_id", "chunk_num", "token_num", "turn_num"],
        )
        assert got_docs.to_pylist() == legacy_docs.to_pylist()
        # change-log sidecar vs legacy projection of the graph partitions
        legacy_cl = set()
        for kind in ("node", "edge", "property"):
            d = os.path.join(graph_dir, f"kind={kind}")
            t = pads.dataset(d).to_table(columns=["id", "conv_id", "level"])
            for i, c, l in zip(
                t["id"].to_pylist(), t["conv_id"].to_pylist(), t["level"].to_pylist()
            ):
                legacy_cl.add((i, "CREATE", kind, l if l is not None else 0, c))
        got_cl = pq.read_table(os.path.join(out, "change_log", f"{pid}.parquet"))
        assert set(map(tuple, got_cl.to_pandas().values)) == legacy_cl
        assert len(got_cl) == len(legacy_cl)
