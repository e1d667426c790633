"""Canonicalization + graph materialization semantics.

Mirrors the reference's operator tests:
- persist-to-graph expectations (tests/builder/test_build_pipeline.py:79-145)
- node matcher merge/resolution (tests/tools/test_node_matcher.py:129-187)
- fuzzy match-set clustering (tests/tools/test_fuzzy_matcher.py)
- community invariants (tests/graph/test_community_alg.py:12-26,
  tests/tools/test_community_builder.py:76-182)
"""

import random

import pyarrow as pa

from eschergraph_ray.llm import DeterministicMockLLM, HashEmbedder
from eschergraph_ray.schemas import BUILD_LOGS
from eschergraph_ray.stages.graph_build import (
    _match_sets,
    build_graph_group,
    build_rename_map,
)


def _logs(rows):
    return pa.Table.from_pylist(rows, schema=BUILD_LOGS)


def _by_kind(out: pa.Table) -> dict[str, list[dict]]:
    rows = out.to_pylist()
    d: dict[str, list[dict]] = {}
    for r in rows:
        d.setdefault(r["kind"], []).append(r)
    return d


FILLER = "General planning discussion covering timelines and deliverables. " * 3


def test_persist_to_graph_expectations():
    # two build logs -> exact node/property/edge sets
    # (test_build_pipeline.py:88-145 analogue)
    logs = _logs(
        [
            {
                "conv_id": "c1",
                "chunk_id": 0,
                "chunk_text": FILLER,
                "nodes": [
                    {"name": "node 1", "description": "the first node"},
                    {"name": "node 2", "description": "the second node"},
                ],
                "edges": [
                    {"source": "node 1", "target": "node 2", "relationship": "connected to"}
                ],
                "properties": [
                    {"entity_name": "node 1", "properties": ["prop a", "prop b"]}
                ],
            },
            {
                "conv_id": "c1",
                "chunk_id": 1,
                "chunk_text": FILLER,
                "nodes": [{"name": "Node 1", "description": ""}],
                "edges": [],
                "properties": [],
            },
        ]
    )
    out = _by_kind(build_graph_group(logs))
    level0 = [n for n in out["node"] if n["level"] == 0]
    assert {n["name"] for n in level0} == {"node 1", "node 2"}
    n1 = next(n for n in level0 if n["name"] == "node 1")
    # name-dedup merges metadata across chunks (node.py:90-105)
    assert [m["chunk_id"] for m in n1["metadata"]] == [0, 1]
    assert n1["description"] == "the first node"
    assert sorted(n1["properties"]) == ["prop a", "prop b"]
    props = out["property"]
    assert {(p["node_name"], p["description"]) for p in props} == {
        ("node 1", "prop a"),
        ("node 1", "prop b"),
    }
    edges0 = [e for e in out["edge"] if e["level"] == 0]
    assert len(edges0) == 1
    assert {edges0[0]["frm_name"], edges0[0]["to_name"]} == {"node 1", "node 2"}
    assert out["triple"][0]["subj"] == "node 1"
    assert out["triple"][0]["obj"] == "node 2"
    # level-2 conversation node exists and points at communities (G4)
    level2 = [n for n in out["node"] if n["level"] == 2]
    assert len(level2) == 1 and level2[0]["name"] == "c1"


def test_self_loop_becomes_property():
    # build_pipeline.py:286-291: self-referential edge -> property
    logs = _logs(
        [
            {
                "conv_id": "c1",
                "chunk_id": 0,
                "chunk_text": FILLER,
                "nodes": [{"name": "solo", "description": "a node"}],
                "edges": [
                    {"source": "solo", "target": "Solo", "relationship": "likes itself"}
                ],
                "properties": [],
            }
        ]
    )
    out = _by_kind(build_graph_group(logs))
    assert "edge" not in {k for k, v in out.items() if v and k == "edge"} or not [
        e for e in out.get("edge", []) if e["level"] == 0
    ]
    assert {(p["node_name"], p["description"]) for p in out["property"]} == {
        ("solo", "likes itself")
    }
    assert "triple" not in out


def test_undirected_edge_dedup_merges_metadata():
    # edge equality is {frm,to}+description (edge.py:87-104)
    mk = lambda cid, s, t: {
        "conv_id": "c1",
        "chunk_id": cid,
        "chunk_text": FILLER,
        "nodes": [{"name": s, "description": ""}, {"name": t, "description": ""}],
        "edges": [{"source": s, "target": t, "relationship": "linked"}],
        "properties": [],
    }
    out = _by_kind(build_graph_group(_logs([mk(0, "aa bb", "cc dd"), mk(1, "cc dd", "aa bb")])))
    edges0 = [e for e in out["edge"] if e["level"] == 0]
    assert len(edges0) == 1
    assert [m["chunk_id"] for m in edges0[0]["metadata"]] == [0, 1]


def test_resolver_longest_name_wins_and_multi_canonical():
    # identifying_nodes.jinja:6,20-27 semantics
    llm = DeterministicMockLLM()
    out = llm.resolve_entities(
        ["lennart", "lennart timmermans", "patrick timmermans", "timmermans"]
    )
    canon = {e["name"]: sorted(e["merged entities"]) for e in out}
    assert set(canon) == {"lennart timmermans", "patrick timmermans"}
    assert canon["lennart timmermans"] == ["lennart", "timmermans"]
    assert canon["patrick timmermans"] == ["timmermans"]


def test_match_sets_cluster_and_rename_map():
    names = [
        "lennart",
        "lennart timmermans",
        "patrick timmermans",
        "timmermans",
        "unrelated corp",
    ]
    emb = HashEmbedder()
    clusters = _match_sets(names, emb)
    assert ["unrelated corp"] in clusters
    big = next(c for c in clusters if len(c) > 1)
    assert set(big) == set(names) - {"unrelated corp"}
    rename, _ = build_rename_map(names, DeterministicMockLLM(), emb)
    assert rename["lennart"] == ["lennart timmermans"]
    assert rename["timmermans"] == ["lennart timmermans", "patrick timmermans"]
    assert rename["unrelated corp"] == ["unrelated corp"]


def test_ambiguous_mention_resolved_by_context():
    # M9 analogue: cosine(chunk text, candidate context) top-1
    logs = _logs(
        [
            {
                "conv_id": "c1",
                "chunk_id": 0,
                "chunk_text": "Patrick Timmermans leads the effort. " + FILLER,
                "nodes": [
                    {"name": "patrick timmermans", "description": "a manager"},
                    {"name": "lennart timmermans", "description": "an engineer"},
                ],
                "edges": [],
                "properties": [],
            },
            {
                "conv_id": "c1",
                "chunk_id": 1,
                "chunk_text": "Then patrick spoke with the team again. " + FILLER,
                "nodes": [
                    {"name": "timmermans", "description": ""},
                    # endpoint must be extracted somewhere or the edge is
                    # dropped at persist (reference parity,
                    # build_pipeline.py:279-284)
                    {"name": "the team", "description": ""},
                ],
                "edges": [
                    {"source": "timmermans", "target": "the team", "relationship": "spoke with"}
                ],
                "properties": [],
            },
        ]
    )
    out = _by_kind(build_graph_group(logs))
    # "timmermans" in a chunk mentioning "patrick" resolves to patrick
    trip = out["triple"][0]
    assert trip["subj"] == "patrick timmermans"
    level0_names = {n["name"] for n in out["node"] if n["level"] == 0}
    assert "timmermans" not in level0_names


def _random_graph_logs(n_nodes=40, n_edges=90, seed=7):
    rng = random.Random(seed)
    names = [f"alpha{i} beta{i}" for i in range(n_nodes)]
    rows = []
    for cid in range(10):
        edges = []
        for _ in range(n_edges // 10):
            a, b = rng.sample(names, 2)
            edges.append({"source": a, "target": b, "relationship": "rel"})
        rows.append(
            {
                "conv_id": "c1",
                "chunk_id": cid,
                "chunk_text": FILLER,
                "nodes": [{"name": n, "description": "d"} for n in rng.sample(names, 8)],
                "edges": edges,
                "properties": [],
            }
        )
    return _logs(rows)


def test_community_invariants():
    out = _by_kind(build_graph_group(_random_graph_logs()))
    level0 = [n for n in out["node"] if n["level"] == 0]
    level1 = [n for n in out["node"] if n["level"] == 1]
    # partition covers all nodes; fewer communities than nodes
    # (test_community_alg.py:12-26)
    assert 0 < len(level1) < len(level0)
    assert all(n["community_id"] for n in level0)
    # child_nodes == partition (test_community_builder.py:112-121)
    child_union = sorted(c for n in level1 for c in n["child_node_ids"])
    assert child_union == sorted(n["id"] for n in level0)
    by_comm = {n["id"]: set(n["child_node_ids"]) for n in level1}
    for n in level0:
        assert n["id"] in by_comm[n["community_id"]]
    # inter-community edges unique per pair (community_builder.py:60-73)
    pairs = [
        tuple(sorted((e["frm"], e["to"])))
        for e in out["edge"]
        if e["level"] == 1
    ]
    assert len(pairs) == len(set(pairs))
    # level-2 node children are the communities (G4)
    level2 = next(n for n in out["node"] if n["level"] == 2)
    assert sorted(level2["child_node_ids"]) == sorted(n["id"] for n in level1)
    # findings order preserved as properties (community_builder.py:205-206)
    assert all(isinstance(n["properties"], list) for n in level1)


def test_blocked_match_sets_parity_and_scale(monkeypatch):
    # Giant-conversation guard: the token-blocked candidate generator
    # must produce the same clusters as the dense O(n^2) kernel whenever
    # mergeable pairs share a token (token_set_ratio >= 95 implies they
    # do), and must handle name counts where the dense matrix would be
    # prohibitive.
    import eschergraph_ray.stages.graph_build as gb

    emb = HashEmbedder()
    rng = random.Random(7)
    firsts = ["lennart", "patrick", "maria", "chen", "yusuf", "aiko"]
    lasts = ["timmermans", "garcia", "okafor", "novak", "larsen", "tanaka"]
    names = sorted(
        {
            f"{f} {l}" if rng.random() < 0.7 else f
            for f in firsts
            for l in lasts
            for _ in range(2)
        }
    )
    dense = _match_sets(names, emb)
    monkeypatch.setattr(gb, "MATCH_DENSE_LIMIT", 4)
    blocked = _match_sets(names, emb)
    assert blocked == dense

    # scale: 12k distinct names -> dense would allocate a 12k x 12k
    # matrix (~1.2 GB float64); blocked path stays within token blocks.
    monkeypatch.setattr(gb, "MATCH_DENSE_LIMIT", 4096)
    big = [f"entity {i:05d} {w}" for i, w in zip(range(12000, 0, -1),
           (f"w{j % 900}" for j in range(12000)))]
    clusters = _match_sets(big, emb)
    assert len(clusters) == len(big)  # all distinct, no spurious merges


def test_blocked_match_sets_df_cutoff(monkeypatch):
    # A stopword-hot token alone generates no pairs; rare tokens still do.
    import eschergraph_ray.stages.graph_build as gb

    emb = HashEmbedder()
    monkeypatch.setattr(gb, "MATCH_DENSE_LIMIT", 2)
    monkeypatch.setattr(gb, "MATCH_BLOCK_DF_CUTOFF", 10)
    names = [f"the item{i}" for i in range(50)] + [
        "acme corporation",
        "acme corporation inc",
    ]
    clusters = _match_sets(sorted(names), emb)
    merged = next(c for c in clusters if len(c) > 1)
    assert merged == ["acme corporation", "acme corporation inc"]
    # "the" block (df=52 > cutoff) contributed nothing: item names unmerged
    assert sum(len(c) > 1 for c in clusters) == 1


def test_union_find_transitive_chains():
    """Regression: depth>=3 union chains must collapse to ONE cluster
    (the old path-halving find returned the grandparent)."""
    import random

    from eschergraph_ray.stages.graph_build import _UnionFind

    uf = _UnionFind()
    for n in ["c", "b", "a", "0"]:
        uf.find(n)
    uf.union("c", "b")
    uf.union("b", "a")
    uf.union("a", "0")
    assert len({uf.find(n) for n in ["c", "b", "a", "0"]}) == 1

    for trial in range(50):
        rng = random.Random(trial)
        names = [f"n{i}" for i in range(25)]
        uf = _UnionFind()
        for n in names:
            uf.find(n)
        edges = [(rng.choice(names), rng.choice(names)) for _ in range(20)]
        for a, b in edges:
            uf.union(a, b)
        comp = {n: {n} for n in names}
        for a, b in edges:
            ca, cb = comp[a], comp[b]
            if ca is not cb:
                ca |= cb
                for m in cb:
                    comp[m] = ca
        got: dict = {}
        for n in names:
            got.setdefault(uf.find(n), set()).add(n)
        assert {frozenset(s) for s in got.values()} == {
            frozenset(s) for s in comp.values()
        }


def test_match_sets_transitive_chain_merges():
    """D2 transitive closure: a~b and b~c above the fuzzy threshold must
    merge a and c even though a~c scores BELOW it (93.8 here)."""
    from eschergraph_ray.functions.text import token_set_ratio
    from eschergraph_ray.llm import HashEmbedder
    from eschergraph_ray.stages.graph_build import _match_sets

    a = "international business machines corporation"
    b = "international business machines corporatio"
    c = "international business machines corpor"
    assert token_set_ratio(a, b) >= 95
    assert token_set_ratio(b, c) >= 95
    assert token_set_ratio(a, c) < 95  # only transitively connected
    clusters = _match_sets([a, b, c], HashEmbedder())
    assert clusters == [sorted([a, b, c])]
