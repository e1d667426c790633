"""Deterministic bounded Louvain community detection.

Stands in for the reference's leidenalg ModularityVertexPartition
(``eschergraph/graph/community_alg.py:25-50``; leidenalg/igraph are not
available in this environment, and networkx's louvain_communities was
observed to loop forever on some conversation graphs). Implements the
standard Louvain method (Blondel et al. 2008, public algorithm):
greedy modularity local moves + graph aggregation, with

- deterministic node visit order (sorted) and lowest-id tie-breaking,
- hard iteration bounds (termination guaranteed), and
- strictly-positive-gain moves only.

Community graphs here are per-conversation (tens of nodes), so this is
pure-Python hot-loop-free enough; at 100 TB scale it still runs inside
the per-conversation ``map_groups``/``map_batches`` task, never as a
global shuffle.
"""

from __future__ import annotations

MAX_SWEEPS = 12
MAX_LEVELS = 8


def _one_level(
    adj: dict[int, dict[int, float]], m2: float
) -> tuple[dict[int, int], bool]:
    """One Louvain level: local moves until stable. Returns
    (node -> community, improved)."""
    nodes = sorted(adj)
    comm = {v: v for v in nodes}
    deg = {v: sum(w for u, w in adj[v].items() if u != v) + 2 * adj[v].get(v, 0.0) for v in nodes}
    comm_tot = dict(deg)
    improved = False
    for _ in range(MAX_SWEEPS):
        moved = False
        for v in nodes:
            cv = comm[v]
            kv = deg[v]
            # weights from v to each neighboring community
            w2c: dict[int, float] = {}
            for u, w in adj[v].items():
                if u == v:
                    continue
                w2c[comm[u]] = w2c.get(comm[u], 0.0) + w
            comm_tot[cv] -= kv
            base = w2c.get(cv, 0.0) - comm_tot[cv] * kv / m2
            best_c, best_gain = cv, 0.0
            for c in sorted(w2c):
                if c == cv:
                    continue
                gain = (w2c[c] - comm_tot[c] * kv / m2) - base
                if gain > best_gain + 1e-12 or (
                    abs(gain - best_gain) <= 1e-12 and best_gain > 0 and c < best_c
                ):
                    best_c, best_gain = c, gain
            comm[v] = best_c
            comm_tot[best_c] += kv
            if best_c != cv:
                moved = True
                improved = True
        if not moved:
            break
    return comm, improved


def louvain_communities(
    nodes: list[str], edges: list[tuple[str, str]], seed: int = 42
) -> list[list[str]]:
    """Partition ``nodes`` by modularity over undirected ``edges``.

    Deterministic (seed kept for API parity; the algorithm itself is
    order-deterministic). Isolated nodes become singleton communities —
    same as ModularityVertexPartition.
    """
    if not nodes:
        return []
    idx = {n: i for i, n in enumerate(sorted(set(nodes)))}
    n = len(idx)
    adj: dict[int, dict[int, float]] = {i: {} for i in range(n)}
    m = 0.0
    for a, b in edges:
        ia, ib = idx.get(a), idx.get(b)
        if ia is None or ib is None or ia == ib:
            continue
        adj[ia][ib] = adj[ia].get(ib, 0.0) + 1.0
        adj[ib][ia] = adj[ib].get(ia, 0.0) + 1.0
        m += 1.0
    if m == 0:
        return [[name] for name in sorted(idx)]

    # membership of original node -> current supernode
    member = {i: i for i in range(n)}
    cur_adj = adj
    for _level in range(MAX_LEVELS):
        comm, improved = _one_level(cur_adj, 2.0 * m)
        if not improved:
            break
        # relabel communities densely
        labels = {c: k for k, c in enumerate(sorted(set(comm.values())))}
        member = {v: labels[comm[member[v]]] for v in member}
        # aggregate graph
        new_adj: dict[int, dict[int, float]] = {k: {} for k in range(len(labels))}
        for v, nbrs in cur_adj.items():
            cv = labels[comm[v]]
            for u, w in nbrs.items():
                cu = labels[comm[u]]
                if u == v:
                    # existing self-loop: stored once, keep full weight
                    new_adj[cv][cv] = new_adj[cv].get(cv, 0.0) + w
                elif cu == cv:
                    # intra edge appears in both directions -> w/2 each,
                    # so the aggregated self-loop carries the full w and
                    # supernode degrees match the sum of member degrees
                    new_adj[cv][cv] = new_adj[cv].get(cv, 0.0) + w / 2.0
                else:
                    new_adj[cv][cu] = new_adj[cv].get(cu, 0.0) + w
        if len(new_adj) == len(cur_adj):
            break
        cur_adj = new_adj

    names = sorted(idx)
    parts: dict[int, list[str]] = {}
    for name in names:
        parts.setdefault(member[idx[name]], []).append(name)
    return [sorted(p) for _, p in sorted(parts.items())]
