"""k-core decomposition: fixed-iteration peel vs brute force."""

import pyarrow as pa
import ray.data as rd

def test_kcore_matches_bruteforce_peel(ray_session):
    import random

    from eschergraph_ray.functions.graph_metrics import kcore_nodes

    rng = random.Random(11)
    n = 60
    edges = {(a, b) for _ in range(220)
             for a, b in [sorted(rng.sample(range(n), 2))]}
    # reference peel
    from collections import defaultdict

    def brute(k):
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b); adj[b].add(a)
        while True:
            bad = [x for x, v in adj.items() if len(v) < k]
            if not bad:
                return {x: len(v) for x, v in adj.items()}
            for x in bad:
                for y in adj[x]:
                    adj[y].discard(x)
                del adj[x]

    tbl = pa.table(
        {
            "s": pa.array([a for a, _ in edges], pa.int64()),
            "d": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    for k, cutoff in [(3, 0), (5, 0), (9, 0), (3, 10**6), (5, 10**6)]:
        # cutoff=0 forces the distributed peel; the large cutoff takes
        # the driver fast path — both must agree with brute force
        out = kcore_nodes(
            rd.from_arrow(tbl).repartition(4), "s", "d", k=k, iters=30,
            small_edge_cutoff=cutoff,
        ).to_pandas()
        # to_pandas() on a fully-empty dataset drops the schema
        got = (
            {} if len(out) == 0
            else dict(zip(out["node"], out["core_degree"]))
        )
        assert got == brute(k), f"k={k}"


def test_kcore_empty_and_nonconvergence_guard(ray_session):
    import pytest as _pytest

    from eschergraph_ray.functions.graph_metrics import kcore_nodes

    # path graph: 1-2-3; k=2 peels everything (in a few rounds)
    tbl = pa.table(
        {"s": pa.array([1, 2], pa.int64()), "d": pa.array([2, 3], pa.int64())}
    )
    for cutoff in (0, 10**6):
        out = kcore_nodes(
            rd.from_arrow(tbl), "s", "d", k=2, iters=10,
            small_edge_cutoff=cutoff,
        ).to_pandas()
        assert len(out) == 0
        # iters too small to converge -> loud failure, never a wrong answer
        with _pytest.raises(RuntimeError, match="did not converge"):
            kcore_nodes(rd.from_arrow(tbl), "s", "d", k=2, iters=1,
                        small_edge_cutoff=cutoff)


def test_label_propagation_matches_bruteforce(ray_session):
    import random
    from collections import Counter, defaultdict

    from eschergraph_ray.functions.graph_metrics import label_propagation

    rng = random.Random(23)
    n = 40
    edges = {(a, b) for _ in range(80)
             for a, b in [sorted(rng.sample(range(n), 2))]}

    def brute(rounds):
        adj = defaultdict(list)
        for a, b in edges:
            adj[a].append(b); adj[b].append(a)
        label = {x: x for x in adj}
        for _ in range(rounds):
            label = {
                x: sorted(
                    Counter(label[m] for m in adj[x]).items(),
                    key=lambda kv: (-kv[1], kv[0]),
                )[0][0]
                for x in adj
            }
        return label

    tbl = pa.table(
        {
            "s": pa.array([a for a, _ in edges], pa.int64()),
            "d": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    for rounds, cutoff in [(3, 0), (3, 10**6), (6, 10**6)]:
        out = label_propagation(
            rd.from_arrow(tbl).repartition(3), "s", "d", rounds=rounds,
            small_edge_cutoff=cutoff,
        ).to_pandas()
        got = dict(zip(out["node"], out["label"]))
        assert got == brute(rounds), f"rounds={rounds} cutoff={cutoff}"


# ---------- BFS layers ----------

def _bfs_edges():
    import pyarrow as pa
    import ray.data as rd

    # hub 'b' (degree 3) is the deterministic seed; path b-a-x-y plus
    # isolated pair (p, q) that must NOT appear
    return rd.from_arrow(
        pa.table(
            {
                "s": ["a", "b", "b", "b", "x", "p"],
                "d": ["b", "c", "d", "a", "a", "q"],
            }
        )
    )


def test_bfs_layers_hand_local(ray_session):
    from eschergraph_ray.functions.graph_metrics import bfs_layers

    out = {
        r["node"]: r["hop"]
        for r in bfs_layers(_bfs_edges(), "s", "d", max_hops=3).take_all()
    }
    assert out == {"b": 0, "a": 1, "c": 1, "d": 1, "x": 2}
    # y would be hop 3 if it existed; p/q unreachable -> absent


def test_bfs_layers_distributed_matches_local(ray_session):
    from eschergraph_ray.functions.graph_metrics import bfs_layers

    loc = {
        (r["node"], r["hop"])
        for r in bfs_layers(_bfs_edges(), "s", "d", max_hops=2).take_all()
    }
    dist = {
        (r["node"], r["hop"])
        for r in bfs_layers(
            _bfs_edges(), "s", "d", max_hops=2, num_partitions=2,
            small_edge_cutoff=0,
        ).take_all()
    }
    assert loc == dist and ("x", 2) in loc


def test_bfs_layers_validation():
    import pytest

    from eschergraph_ray.functions.graph_metrics import bfs_layers

    with pytest.raises(ValueError):
        bfs_layers(None, "s", "d", max_hops=0)


# ---------- Adamic-Adar link prediction ----------

def test_adamic_adar_hand_computed(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.graph_metrics import adamic_adar_topk

    # square a-b-c-d-a plus chord a-c: non-adjacent pair is only (b, d)
    # with common neighbors a (deg 3) and c (deg 3)
    edges = rd.from_arrow(
        pa.table(
            {"s": ["a", "b", "c", "d", "a"], "d": ["b", "c", "d", "a", "c"]}
        )
    )
    out = adamic_adar_topk(edges, "s", "d", k=10).take_all()
    assert len(out) == 1
    r = out[0]
    q3 = round(1e6 / math.log(3))
    assert (r["node_a"], r["node_b"]) == ("b", "d")
    assert r["n_common"] == 2 and r["aa_micro"] == 2 * q3


def test_adamic_adar_distributed_matches_local(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.graph_metrics import adamic_adar_topk

    # star hub h with leaves x0..x4 plus edge x0-x1: every non-adjacent
    # leaf pair shares hub h; (x0,x1) is adjacent and must be excluded
    s = ["h"] * 5 + ["x0"]
    d = [f"x{i}" for i in range(5)] + ["x1"]
    edges = rd.from_arrow(pa.table({"s": s, "d": d}))
    loc = [
        (r["node_a"], r["node_b"], r["n_common"], r["aa_micro"])
        for r in adamic_adar_topk(edges, "s", "d", k=50).take_all()
    ]
    dist = [
        (r["node_a"], r["node_b"], r["n_common"], r["aa_micro"])
        for r in adamic_adar_topk(
            edges, "s", "d", k=50, num_partitions=2, fastpath_max_nodes=0
        ).take_all()
    ]
    assert loc == dist
    pairs = {(a, b) for a, b, *_ in loc}
    assert ("x0", "x1") not in pairs  # adjacent pair excluded
    assert ("x0", "x2") in pairs and len(pairs) == 9  # C(5,2) - 1


def test_clustering_coefficients_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.graph_metrics import (
        clustering_coefficients,
    )

    # triangle a-b-c plus pendant d on a: cc(b)=cc(c)=1,
    # cc(a)=2*1/(3*2)=1/3, d excluded (degree 1)
    edges = rd.from_arrow(
        pa.table({"s": ["a", "b", "c", "a"], "d": ["b", "c", "a", "d"]})
    )
    out = {
        r["node"]: (r["degree"], r["n_triangles"], r["cc_micro"])
        for r in clustering_coefficients(edges, "s", "d").take_all()
    }
    assert out == {
        "a": (3, 1, 333333),
        "b": (2, 1, 1000000),
        "c": (2, 1, 1000000),
    }


def test_degree_assortativity_matches_bruteforce(ray_session):
    import random

    from eschergraph_ray.functions.graph_metrics import degree_assortativity

    rng = random.Random(7)
    n = 40
    edges = {(a, b) for _ in range(140)
             for a, b in [sorted(rng.sample(range(n), 2))]}
    from collections import Counter

    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    nn = len(xs)
    sx = sum(xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num, den = nn * sxy - sx * sx, nn * sxx - sx * sx
    import math

    want = math.floor(abs(float(num) * 1e6 / float(den)) + 0.5)
    want = want if num * den >= 0 else -want

    tbl = pa.table(
        {
            "s": pa.array([a for a, _ in edges], pa.int64()),
            "d": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    # cutoff=0 forces the distributed join/moments path; the default
    # takes the driver numpy fast path — bit-identical results
    for cutoff in (0, 200_000):
        out = degree_assortativity(
            rd.from_arrow(tbl).repartition(3), "s", "d",
            small_edge_cutoff=cutoff,
        ).to_pandas()
        assert len(out) == 1
        assert int(out["n_pairs"][0]) == nn
        assert int(out["r_micro"][0]) == want
    # duplicate + reversed edges normalize away -> identical result
    tbl2 = pa.table(
        {
            "s": pa.array([a for a, _ in edges] + [b for _, b in edges],
                          pa.int64()),
            "d": pa.array([b for _, b in edges] + [a for a, _ in edges],
                          pa.int64()),
        }
    )
    out2 = degree_assortativity(rd.from_arrow(tbl2), "s", "d").to_pandas()
    assert out2.equals(out)


def test_degree_assortativity_degenerate(ray_session):
    from eschergraph_ray.functions.graph_metrics import degree_assortativity

    # 4-cycle: 2-regular -> den == 0 -> NULL r_micro
    tbl = pa.table(
        {
            "s": pa.array([0, 1, 2, 3], pa.int64()),
            "d": pa.array([1, 2, 3, 0], pa.int64()),
        }
    )
    out = degree_assortativity(rd.from_arrow(tbl), "s", "d").to_pandas()
    assert int(out["n_pairs"][0]) == 8
    assert out["r_micro"].isna().all()
    # empty graph -> zero rows (schema kept)
    empty = pa.table({"s": pa.array([], pa.int64()),
                      "d": pa.array([], pa.int64())})
    got = degree_assortativity(rd.from_arrow(empty), "s", "d")
    assert got.count() == 0


def test_partition_modularity_matches_bruteforce(ray_session):
    import random
    from collections import Counter

    from eschergraph_ray.functions.graph_metrics import partition_modularity

    rng = random.Random(23)
    n = 50
    # two planted blocks with sparse cross links
    edges = set()
    for _ in range(160):
        if rng.random() < 0.8:
            side = rng.randrange(2)
            a, b = rng.sample(range(side * 25, side * 25 + 25), 2)
        else:
            a, b = rng.randrange(0, 25), rng.randrange(25, 50)
        a, b = min(a, b), max(a, b)
        if a != b:
            edges.add((a, b))
    member = {v: f"c{v % 3}" for v in range(n)}

    m = len(edges)
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    e_c, d_c = Counter(), Counter()
    for a, b in edges:
        if member[a] == member[b]:
            e_c[member[a]] += 1
    for v, d in deg.items():
        d_c[member[v]] += d
    want = {
        c: (e_c.get(c, 0), d_c[c], 4 * m * e_c.get(c, 0) - d_c[c] ** 2)
        for c in d_c
    }

    tbl = pa.table(
        {
            "s": pa.array([a for a, _ in edges], pa.int64()),
            "d": pa.array([b for _, b in edges], pa.int64()),
        }
    )
    mem_tbl = pa.table(
        {
            "node": pa.array(sorted(member), pa.int64()),
            "comm": pa.array([member[v] for v in sorted(member)],
                             pa.string()),
        }
    )
    # (broadcast_limit, small_edge_cutoff): join fallback, distributed
    # broadcast tag, and the driver fast path — all bit-identical
    for limit, cutoff in ((0, 0), (10**6, 0), (10**6, 200_000)):
        out = partition_modularity(
            rd.from_arrow(tbl).repartition(3),
            rd.from_arrow(mem_tbl), "s", "d", "node", "comm",
            broadcast_limit=limit, small_edge_cutoff=cutoff,
        ).to_pandas()
        got = {
            r["community"]: (int(r["intra_edges"]), int(r["degree_sum"]),
                             int(r["contrib_num"]))
            for _, r in out.iterrows()
        }
        assert got == want, f"limit={limit} cutoff={cutoff}"
        # ordered by (contrib_num desc, community)
        key = list(zip(-out["contrib_num"], out["community"]))
        assert key == sorted(key)


def test_partition_modularity_membership_miss(ray_session):
    """Nodes absent from the membership drop out identically on both
    paths (inner-join semantics)."""
    from eschergraph_ray.functions.graph_metrics import partition_modularity

    tbl = pa.table(
        {
            "s": pa.array([0, 1, 2], pa.int64()),
            "d": pa.array([1, 2, 3], pa.int64()),
        }
    )
    mem = pa.table(
        {
            "node": pa.array([0, 1, 2], pa.int64()),
            "comm": pa.array(["x", "x", "y"], pa.string()),
        }
    )
    outs = []
    for limit, cutoff in ((0, 0), (10**6, 0), (10**6, 200_000)):
        out = partition_modularity(
            rd.from_arrow(tbl), rd.from_arrow(mem), "s", "d",
            "node", "comm", broadcast_limit=limit,
            small_edge_cutoff=cutoff,
        ).to_pandas()
        outs.append(out)
    assert outs[0].equals(outs[1])
    assert outs[0].equals(outs[2])
    got = {
        r["community"]: (int(r["intra_edges"]), int(r["degree_sum"]))
        for _, r in outs[0].iterrows()
    }
    # m=3; node 3 unmembered: its degree never reaches a community
    assert got == {"x": (1, 3), "y": (0, 2)}


# ---------- harmonic_centrality_seeds ----------


def _harm_reference(pairs, seeds, max_hops):
    """Driver replay: per-seed BFS hop counts over the simple graph."""
    adj = {}
    for s, d in pairs:
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = {}
    for seed in seeds:
        hop = {seed: 0}
        frontier = [seed]
        for h in range(1, max_hops + 1):
            nxt = [
                v for u in frontier for v in adj.get(u, ())
                if v not in hop
            ]
            for v in set(nxt):
                hop[v] = h
            frontier = sorted(set(nxt))
            if not frontier:
                break
        reached = [hh for hh in hop.values() if hh > 0]
        out[seed] = (
            len(reached),
            sum(1_000_000 // hh for hh in reached),
        )
    return out


def test_harmonic_hand_and_paths(ray_session):
    from eschergraph_ray.functions.graph_metrics import (
        harmonic_centrality_seeds,
    )

    pairs = [
        ("a", "b"), ("b", "c"), ("b", "d"), ("b", "a"),  # dup edge
        ("x", "a"), ("p", "q"), ("c", "e"), ("e", "f"),
    ]
    ds = rd.from_arrow(
        pa.table(
            {
                "s": [s for s, _ in pairs],
                "d": [d for _, d in pairs],
            }
        )
    )
    got = {
        r["seed"]: (r["n_reached"], r["harmonic_micro"])
        for r in harmonic_centrality_seeds(
            ds, "s", "d", n_seeds=2, max_hops=3
        ).take_all()
    }
    # degree (simple graph): b=3, a=3, c=2 ... ties a/b -> 'a','b'
    want = _harm_reference(pairs, ["a", "b"], 3)
    assert got == want
    # the isolated pair is never reached
    assert all(n < 8 for n, _ in got.values())
    dist = {
        r["seed"]: (r["n_reached"], r["harmonic_micro"])
        for r in harmonic_centrality_seeds(
            ds, "s", "d", n_seeds=2, max_hops=3, small_edge_cutoff=0,
            num_partitions=2,
        ).take_all()
    }
    assert dist == got


def test_harmonic_empty_and_validation(ray_session):
    import pytest

    from eschergraph_ray.functions.graph_metrics import (
        harmonic_centrality_seeds,
    )

    empty = rd.from_arrow(
        pa.table({"s": pa.array([], pa.string()),
                  "d": pa.array([], pa.string())})
    )
    out = harmonic_centrality_seeds(empty, "s", "d")
    assert out.count() == 0
    assert set(out.schema().names) == {
        "seed", "n_reached", "harmonic_micro"
    }
    with pytest.raises(ValueError, match=">= 1"):
        harmonic_centrality_seeds(empty, "s", "d", max_hops=0)


def test_diameter_double_sweep_path_graph():
    from eschergraph_ray.functions.graph_metrics import (
        diameter_double_sweep,
    )

    edges = rd.from_arrow(pa.table({
        "src": ["n1", "n2", "n3"],
        "dst": ["n2", "n3", "n4"],
    }))
    out = diameter_double_sweep(edges, "src", "dst").to_pandas()
    # seed = n2 (deg 2, smallest name among ties with n3); sweep 1
    # farthest = n4; sweep 2 from n4 walks the whole path
    assert list(out["hop"]) == [0, 1, 2, 3]
    assert list(out["n_nodes"]) == [1, 1, 1, 1]


def test_diameter_double_sweep_paths_agree():
    from eschergraph_ray.functions.graph_metrics import (
        diameter_double_sweep,
    )

    edges = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "d", "a", "x"],
        "dst": ["b", "c", "d", "e", "c", "y"],
    }))
    import pandas as pd

    fast = diameter_double_sweep(edges, "src", "dst").to_pandas()
    dist = diameter_double_sweep(
        edges, "src", "dst", small_edge_cutoff=0
    ).to_pandas()
    pd.testing.assert_frame_equal(fast, dist)


def test_diameter_double_sweep_empty():
    from eschergraph_ray.functions.graph_metrics import (
        diameter_double_sweep,
    )

    edges = rd.from_arrow(pa.table({
        "src": pa.array(["a"], pa.string()),
        "dst": pa.array(["a"], pa.string()),  # self-loop only
    }))
    assert diameter_double_sweep(edges, "src", "dst").count() == 0


def test_brandes_dependency_star_with_tail():
    from eschergraph_ray.functions.graph_metrics import (
        brandes_dependency_topk,
    )

    # star h-{x1,x2,x3} plus tail x3-y: seed=h; x3 brokers y
    edges = rd.from_arrow(pa.table({
        "src": ["h", "h", "h", "x3"],
        "dst": ["x1", "x2", "x3", "y"],
    }))
    out = brandes_dependency_topk(edges, "src", "dst").to_pandas()
    assert list(out["node"]) == ["x3", "x1", "x2", "y"]
    assert list(out["dep_micro"]) == [1_000_000, 0, 0, 0]


def test_brandes_dependency_split_paths():
    from eschergraph_ray.functions.graph_metrics import (
        brandes_dependency_topk,
    )

    # s(seed, deg 3) -> {a, b, t}; a-c, b-c: two shortest paths s->c
    # via a and b; sigma(c)=2 -> a and b each get (1*(1e6+0))//2
    edges = rd.from_arrow(pa.table({
        "src": ["s", "s", "s", "a", "b"],
        "dst": ["a", "b", "t", "c", "c"],
    }))
    out = brandes_dependency_topk(edges, "src", "dst").to_pandas()
    got = dict(zip(out["node"], out["dep_micro"]))
    assert got == {"a": 500_000, "b": 500_000, "t": 0, "c": 0}


def test_brandes_dependency_paths_agree():
    import numpy as np
    import pandas as pd

    from eschergraph_ray.functions.graph_metrics import (
        brandes_dependency_topk,
    )

    rng = np.random.default_rng(3)
    src = [f"n{int(i):02d}" for i in rng.integers(0, 40, 120)]
    dst = [f"n{int(i):02d}" for i in rng.integers(0, 40, 120)]
    e2 = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    fast = brandes_dependency_topk(e2, "src", "dst", k=100).to_pandas()
    dist = brandes_dependency_topk(
        e2, "src", "dst", k=100, small_edge_cutoff=0
    ).to_pandas()
    pd.testing.assert_frame_equal(fast, dist)


def test_transitivity_triangle_plus_pendant():
    from eschergraph_ray.functions.graph_metrics import transitivity

    # triangle a-b-c plus pendant d on a: T=1; degrees 3,2,2,1 ->
    # wedges = (6+2+2+0)/2 = 5 -> 3/5
    edges = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "a"],
        "dst": ["b", "c", "a", "d"],
    }))
    out = transitivity(edges, "src", "dst").to_pandas().iloc[0]
    assert (out["triangles"], out["wedges"]) == (1, 5)
    assert out["transitivity_micro"] == 600_000


def test_transitivity_no_wedges_empty():
    from eschergraph_ray.functions.graph_metrics import transitivity

    edges = rd.from_arrow(pa.table({
        "src": pa.array(["a"], pa.string()),
        "dst": pa.array(["a"], pa.string()),
    }))
    assert transitivity(edges, "src", "dst").count() == 0


def test_degree_gini_path_graph():
    import ray.data as rd2

    from eschergraph_ray.functions.graph_metrics import (
        _explode_endpoints,
        _normalized_edges,
    )
    from eschergraph_ray.functions.textstats import gini_concentration

    edges = _normalized_edges(rd.from_arrow(pa.table({
        "src": ["a", "b"], "dst": ["b", "c"],
    })), "src", "dst")
    out = gini_concentration(
        _explode_endpoints(edges), "node"
    ).to_pandas().iloc[0]
    # degrees sorted [1,1,2]: S=9, n=3, T=4 -> (18-16)/12 = 1/6
    assert (out["n_keys"], out["total"], out["gini_micro"]) == (
        3, 4, 166_667)
