"""Fixed-point PageRank: hand-computed recurrence, path equivalence,
ranking sanity."""

import pyarrow as pa
import ray.data as rd

from eschergraph_ray.functions.pagerank import BASE, P0, pagerank_fixed_point


def _edges(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "a": pa.array([x for x, _ in pairs], pa.string()),
                "b": pa.array([y for _, y in pairs], pa.string()),
            }
        )
    )


def _run(pairs, iters=3, **kw):
    out = pagerank_fixed_point(_edges(pairs), "a", "b", iters=iters, **kw)
    return {r["node"]: r["pr"] for r in out.take_all()}


def _reference(pairs, iters):
    """Driver-side replay of the documented integer recurrence."""
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    nodes = sorted({a for a, _ in sym})
    deg = {v: sum(1 for a, _ in sym if a == v) for v in nodes}
    p = {v: P0 for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for a, b in sym:
            s[b] += p[a] // deg[a]
        p = {v: BASE + (85 * s[v]) // 100 for v in nodes}
    return p


def test_one_iteration_hand_values():
    # star: hub h connected to 3 leaves
    pairs = [("h", "l1"), ("h", "l2"), ("h", "l3")]
    got = _run(pairs, iters=1)
    # hub receives 3 leaf contributions of P0 // 1 each
    assert got["h"] == BASE + (85 * 3 * P0) // 100
    # each leaf receives P0 // 3 from the hub
    assert got["l1"] == got["l2"] == got["l3"] == BASE + (85 * (P0 // 3)) // 100


def test_matches_reference_recurrence_multigraph():
    # includes a parallel edge (x, y) twice — multigraph degree counts
    pairs = [("x", "y"), ("x", "y"), ("y", "z"), ("z", "w"), ("w", "x")]
    assert _run(pairs, iters=3) == _reference(pairs, 3)


def test_fallback_path_equals_broadcast_path():
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    fast = _run(pairs, iters=3)
    slow = _run(pairs, iters=3, broadcast_nodes_below=0)
    assert fast == slow == _reference(pairs, 3)


def test_hub_outranks_leaf_at_equal_degree():
    # m1 and h both have degree 2, but h's neighbours are well-linked
    pairs = [("h", "m1"), ("h", "m2"), ("m1", "x"), ("m2", "y"), ("m2", "z")]
    got = _run(pairs)
    assert got["h"] > got["x"]


def test_empty_edges():
    out = pagerank_fixed_point(_edges([]), "a", "b")
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "pr"}


def _reference_ppr(pairs, iters, seeds):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    nodes = sorted({a for a, _ in sym})
    deg = {v: sum(1 for a, _ in sym if a == v) for v in nodes}
    p = {v: (P0 if v in seeds else 0) for v in nodes}
    for _ in range(iters):
        s = {v: 0 for v in nodes}
        for a, b in sym:
            s[b] += p[a] // deg[a]
        p = {
            v: (BASE if v in seeds else 0) + (85 * s[v]) // 100
            for v in nodes
        }
    return p


def test_personalized_matches_reference_both_paths():
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    seeds = ["a", "zz-not-in-graph"]  # absent seeds contribute nothing
    want = _reference_ppr(pairs, 3, set(seeds))
    fast = _run(pairs, iters=3, seed_nodes=seeds)
    slow = _run(pairs, iters=3, seed_nodes=seeds, broadcast_nodes_below=0)
    assert fast == slow == want
    # mass concentrates near the seed: its neighbour outranks the
    # far end of the chain
    assert fast["b"] > fast["e"]


# ---------------- hits_fixed_point ----------------

SCALE = 1_000_000


def _reference_hits(pairs, iters):
    nodes = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    a = {v: SCALE for v in nodes}
    h = {v: 0 for v in nodes}

    def norm(raw):
        m = max(raw.values())
        return (
            {v: (raw[v] * SCALE) // m for v in raw} if m > 0 else raw
        )

    for _ in range(iters):
        h = norm({v: sum(a[d] for s, d in pairs if s == v) for v in nodes})
        a = norm({v: sum(h[s] for s, d in pairs if d == v) for v in nodes})
    return {v: (a[v], h[v]) for v in nodes}


def _run_hits(pairs, **kw):
    from eschergraph_ray.functions.pagerank import hits_fixed_point

    out = hits_fixed_point(_edges(pairs), "a", "b", **kw).to_pandas()
    return {r.node: (r.auth, r.hub) for r in out.itertuples()}


def test_hits_matches_reference_both_paths():
    pairs = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"),
        ("c", "b"), ("d", "a"), ("e", "b"), ("a", "b"),  # parallel edge
    ]
    want = _reference_hits(pairs, 2)
    fast = _run_hits(pairs, iters=2)
    slow = _run_hits(pairs, iters=2, broadcast_nodes_below=0)
    assert fast == slow == want
    # e has no in-edges: zero authority; b is the most-cited node
    assert fast["e"][0] == 0
    assert max(fast, key=lambda v: fast[v][0]) == "b"


def test_hits_dangling_and_empty():
    import pytest

    from eschergraph_ray.functions.pagerank import hits_fixed_point

    with pytest.raises(ValueError, match=">= 1"):
        hits_fixed_point(_edges([]), "a", "b", iters=0)
    out = hits_fixed_point(_edges([]), "a", "b")
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "auth", "hub"}
    # pure sink: hub 0, auth max; pure source: auth 0
    got = _run_hits([("s", "t"), ("s2", "t")], iters=2)
    assert got["t"][1] == 0 and got["t"][0] == SCALE
    assert got["s"][0] == 0


# ------------------------------------------------------------------- Katz

def _katz_reference(pairs, iters=3, B=4):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    nodes = sorted({a for a, _ in sym})
    t = {v: 1 for v in nodes}
    acc = {v: B ** iters for v in nodes}
    for k in range(1, iters + 1):
        s = {v: 0 for v in nodes}
        for a, b in sym:
            s[b] += t[a]
        t = s
        for v in nodes:
            acc[v] += (B ** (iters - k)) * t[v]
    return acc


def _katz_run(pairs, **kw):
    from eschergraph_ray.functions.pagerank import katz_walk_centrality

    out = katz_walk_centrality(_edges(pairs), "a", "b", **kw)
    return {r["node"]: r["katz"] for r in out.take_all()}


def test_katz_hand_values_path_graph():
    # path a-b-c: walks from each node are countable by hand
    pairs = [("a", "b"), ("b", "c")]
    got = _katz_run(pairs)
    assert got == _katz_reference(pairs)
    # ends are symmetric, middle is most central
    assert got["a"] == got["c"]
    assert got["b"] > got["a"]


def test_katz_matches_reference_multigraph():
    pairs = [("a", "b"), ("a", "b"), ("b", "c"), ("c", "d"),
             ("d", "a"), ("b", "d")]
    assert _katz_run(pairs) == _katz_reference(pairs)


def test_katz_fallback_equals_broadcast():
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    fast = _katz_run(pairs)
    slow = _katz_run(pairs, broadcast_nodes_below=0)
    assert fast == slow


def test_katz_long_range_beats_degree():
    # x and y both have degree 2, but y's neighbours are a connected
    # clique while x hangs off two leaves: Katz ranks y above x
    pairs = [("x", "u"), ("x", "v"),
             ("y", "p"), ("y", "q"), ("p", "q"), ("p", "r"), ("q", "r")]
    got = _katz_run(pairs)
    assert got["y"] > got["x"]


def test_katz_empty_and_overflow_guard():
    import pytest

    from eschergraph_ray.functions.pagerank import katz_walk_centrality

    out = katz_walk_centrality(_edges([]), "a", "b")
    assert out.take_all() == []
    # a dense multigraph with huge multiplicity overflows loudly
    pairs = [("a", "b")] * 3000
    with pytest.raises(Exception, match="overflow"):
        _katz_run(pairs, iters=6, beta_denom=2)


# ------------------------------------------------------------ rich club

def test_rich_club_hand_case():
    from eschergraph_ray.functions.graph_metrics import rich_club_profile

    # triangle a-b-c (degrees 2) + pendant d-a (a deg 3, d deg 1)
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")]
    out = rich_club_profile(_edges(pairs), "a", "b",
                            thresholds=(1, 2)).to_pandas()
    got = {r.k: (r.n_club, r.e_club, r.phi_micro)
           for r in out.itertuples()}
    # k=1 club {a,b,c}: edges among them 3, phi = 6/6 = 1.0
    assert got[1] == (3, 3, 1_000_000)
    # k=2 club {a} only -> dropped (n_club < 2)
    assert 2 not in got


def test_degree_histogram_buckets():
    from eschergraph_ray.functions.graph_metrics import degree_histogram

    # star: hub degree 4 (bucket 2), four leaves degree 1 (bucket 0)
    pairs = [("h", f"l{i}") for i in range(4)]
    out = degree_histogram(_edges(pairs), "a", "b").to_pandas()
    got = {r.bucket: (r.min_degree, r.n_nodes)
           for r in out.itertuples()}
    assert got == {0: (1, 4), 2: (4, 1)}


def test_partition_conductance_hand_case():
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.graph_metrics import (
        partition_conductance,
    )

    # two triangles bridged by one edge: per community cut=1,
    # vol=7 (3 intra edges*2 + 1 cut), 2m=14, denom=min(7,7)=7
    pairs = [("a", "b"), ("b", "c"), ("c", "a"),
             ("x", "y"), ("y", "z"), ("z", "x"),
             ("a", "x")]
    edges = rd.from_arrow(pa.table({
        "s": pa.array([p[0] for p in pairs], pa.string()),
        "t": pa.array([p[1] for p in pairs], pa.string()),
    }))
    member = rd.from_arrow(pa.table({
        "node": pa.array(list("abcxyz"), pa.string()),
        "comm": pa.array([0, 0, 0, 1, 1, 1], pa.int64()),
    }))
    out = partition_conductance(edges, member, "s", "t", "node", "comm")
    got = {r.community: (r.cut_edges, r.degree_sum, r.phi_micro)
           for r in out.itertuples()}
    assert got[0] == (1, 7, 142_857)  # round(1e6/7)
    assert got[1] == (1, 7, 142_857)


def test_partition_conductance_single_community_zero():
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.graph_metrics import (
        partition_conductance,
    )

    edges = rd.from_arrow(pa.table({
        "s": pa.array(["a", "b"], pa.string()),
        "t": pa.array(["b", "c"], pa.string()),
    }))
    member = rd.from_arrow(pa.table({
        "node": pa.array(["a", "b", "c"], pa.string()),
        "comm": pa.array([5, 5, 5], pa.int64()),
    }))
    out = partition_conductance(edges, member, "s", "t", "node", "comm")
    assert list(out["phi_micro"]) == [0]
    assert list(out["cut_edges"]) == [0]


def test_edge_reciprocity_hand_case():
    from eschergraph_ray.functions.graph_metrics import edge_reciprocity

    # a->b and b->a (reciprocal pair = 2 edges), a->c one-way,
    # self-loop d->d excluded, duplicate a->b collapses
    pairs = [("a", "b"), ("b", "a"), ("a", "c"), ("d", "d"),
             ("a", "b")]
    out = edge_reciprocity(_edges(pairs), "a", "b")
    r = out.iloc[0]
    assert (r["n_edges"], r["n_reciprocal"]) == (3, 2)
    assert r["reciprocity_micro"] == 666_667  # round(2e6/3)


def test_edge_reciprocity_empty():
    from eschergraph_ray.functions.graph_metrics import edge_reciprocity

    out = edge_reciprocity(_edges([]), "a", "b")
    assert list(out.iloc[0]) == [0, 0, 0]
