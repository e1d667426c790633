"""Distributed triangle counting over an edge list.

Graph analytics past degree top-k (`pipelines/dashboard.py`) and
PageRank (`functions/pagerank.py`): per-node triangle participation
counts over the undirected simple graph induced by an edge list — the
building block of clustering-coefficient / community-quality metrics.

Scale shape (the standard degree-orientation algorithm, cf. MapReduce
triangle enumeration a la Suri & Vassilvitskii "Counting Triangles and
the Curse of the Last Reducer", WWW'11):

1. normalize to distinct undirected edges ``(a < b)`` — one groupby;
2. compute degrees — one groupby over exploded endpoints;
3. orient every edge from its lower-``(degree, name)`` endpoint to the
   higher one: out-degrees are then O(sqrt(m))-bounded for the heavy
   nodes, so the wedge self-join below never explodes at a hub the way
   a naive adjacency self-join would (the "curse of the last reducer");
4. wedges = oriented ⨝ oriented on the source vertex (each unordered
   out-neighbor pair once);
5. triangles = wedges ⨝ distinct-undirected-edges on the closing pair —
   every triangle is found exactly once, no dedup pass;
6. per-node counts = explode the 3 corners, one groupby.

All joins are distributed hash joins (`Dataset.join`); nothing graph-
sized touches the driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_DEFAULT_PARTITIONS = 16


def _clamp_partitions(n: int) -> int:
    """Two JoinOperators of this pipeline run CONCURRENTLY in one
    streaming execution; their hash-shuffle aggregator pools are sized
    by num_partitions, and requesting far more than the session's CPUs
    deadlocks a small cluster (observed: 16-partition joins hang a
    4-CPU session; 4-partition joins complete). Clamp to the CPU
    count — on a real multi-node cluster pass num_partitions
    explicitly to scale the shuffle out."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", n))
    except Exception:
        cpus = n
    return max(2, min(n, cpus))


def _normalized_edges(edges_ds, src_col: str, dst_col: str):
    """Distinct undirected edges as (a, b) with a < b, self-loops
    dropped."""

    def norm(batch: pa.Table) -> pa.Table:
        s = batch[src_col]
        d = batch[dst_col]
        keep = pc.invert(pc.equal(s, d))
        s, d = pc.filter(s, keep), pc.filter(d, keep)
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        return pa.table({"a": lo, "b": hi})

    dedup = (
        edges_ds.map_batches(norm, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
    )
    return dedup.map_batches(
        lambda b: b.select(["a", "b"]), batch_format="pyarrow"
    )


def triangle_counts(edges_ds, src_col: str, dst_col: str,
                    num_partitions: int = _DEFAULT_PARTITIONS):
    """Per-node triangle participation counts.

    Returns ``(node, n_triangles)`` for every node in at least one
    triangle. Deterministic: counts are exact integers over the
    distinct-undirected-edge set, so the result is engine-independent
    (the SQL oracle enumerates the same a<b<c triples with two
    self-joins).
    """
    num_partitions = _clamp_partitions(num_partitions)
    # node type from the INPUT schema — an all-empty groupby output
    # carries no schema at all in Ray 2.49
    node_type = edges_ds.schema().base_schema.field(src_col).type
    edges = _normalized_edges(edges_ds, src_col, dst_col).materialize()
    empty = pa.table(
        {
            "node": pa.array([], node_type),
            "n_triangles": pa.array([], pa.int64()),
        }
    )
    if edges.count() == 0:
        return rd.from_arrow(empty)

    # degrees over the distinct simple graph
    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [pa.table({"node": batch["a"]}), pa.table({"node": batch["b"]})]
        ).combine_chunks()

    deg = (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("node")
        .count()
    )

    def deg_as(col: str, out: str):
        return deg.map_batches(
            lambda b, c=col, o=out: b.rename_columns([c, o]),
            batch_format="pyarrow",
        )

    # attach degrees to both endpoints (right key column is dropped)
    e1 = edges.join(
        deg_as("a", "da"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("a",),
    ).repartition(num_partitions)
    e2 = e1.join(
        deg_as("b", "db"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("b",),
    ).repartition(num_partitions)

    # orient each edge from the lower-(degree, name) endpoint
    def orient(batch: pa.Table) -> pa.Table:
        a, b = batch["a"], batch["b"]
        da, db = batch["da"], batch["db"]
        a_first = pc.or_(
            pc.less(da, db),
            pc.and_(pc.equal(da, db), pc.less(a, b)),
        )
        u = pc.if_else(a_first, a, b)
        v = pc.if_else(a_first, b, a)
        return pa.table({"u": u, "v": v})

    oriented = e2.map_batches(orient, batch_format="pyarrow").materialize()

    def tag(col_v: str):
        return oriented.map_batches(
            lambda b, o=col_v: b.rename_columns(["u", o]),
            batch_format="pyarrow",
        )

    wedges = tag("v1").join(
        tag("v2"),
        join_type="inner",
        num_partitions=num_partitions,
        on=("u",),
    ).repartition(num_partitions)

    # keep each unordered out-neighbor pair once, as the normalized
    # (min, max) probe key matching the undirected edge set
    def wedge_key(batch: pa.Table) -> pa.Table:
        keep = pc.less(batch["v1"], batch["v2"])
        t = batch.filter(keep)
        return pa.table({"a": t["v1"], "b": t["v2"], "w": t["u"]})

    # an EMPTY side crashes Ray 2.49's hash join ("No match for
    # FieldRef" / ArrowInvalid in the aggregator) — materialize the
    # wedge set and short-circuit, same device as dedup._nonempty_pairs.
    # The wedge set is the O(m^1.5)-bounded intermediate of the
    # degree-oriented algorithm; pinning it in the object store is
    # spill-safe.
    probe = wedges.map_batches(wedge_key, batch_format="pyarrow").materialize()
    if probe.count() == 0:
        return rd.from_arrow(empty)
    tri = probe.repartition(num_partitions).join(
        edges,
        join_type="inner",
        num_partitions=num_partitions,
        on=("a", "b"),
    ).materialize()
    if tri.count() == 0:
        return rd.from_arrow(empty)
    tri = tri.repartition(num_partitions)

    def corners(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"node": batch["a"]}),
                pa.table({"node": batch["b"]}),
                pa.table({"node": batch["w"]}),
            ]
        ).combine_chunks()

    counts = (
        tri.map_batches(corners, batch_format="pyarrow")
        .groupby("node")
        .count()
    )
    return counts.map_batches(
        lambda b: b.rename_columns(["node", "n_triangles"]),
        batch_format="pyarrow",
    )
