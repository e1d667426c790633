"""Fixed-point integer PageRank over an edge list — graph-centrality
ranking for the built knowledge graph.

The reference's dashboard ranks entities by raw degree
(`eschergraph/visualization` top-k; repo analogue `kg_dashboard` A5);
PageRank is the standard next step — an entity linked by well-linked
entities outranks one with the same degree of leaf neighbours. At KG
scale this must run as message passing over the edge list, not as a
driver-side matrix.

ALL arithmetic is int64 fixed-point (micro-units), which is what makes
the operator exactly SQL-replayable — no float sum-order divergence:

  p_0(v)     = 1_000_000                          (uniform, unnormalized)
  S_t(v)     = sum over incident edges (u, v) of  p_t(u) // deg(u)
  p_{t+1}(v) = 150_000 + (85 * S_t(v)) // 100     (damping 0.85)

Floor division and integer sums are order-independent; DuckDB replays
the recurrence verbatim with BIGINT `//`. A fixed small iteration
count (default 3) is part of the operator contract (ranking stabilizes
in a few rounds on short-diameter graphs; this is a ranking signal,
not a numerical eigenvector).

Two execution paths, identical results (same device as
``components.connected_components``):

  fast path — the (id, p, deg) score table fits a broadcast: messages
    are computed in ONE streaming pass over the symmetrized edges with
    vectorized searchsorted; the per-iteration reduce is the
    groupby(dst).sum shuffle; the node-sized score update happens on
    the driver (model state, not data).

  fallback — tagged union + groupby(key) message passing, never
    materializing the score table anywhere central; 3 shuffles per
    iteration, reducer memory bounded by true degree.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

P0 = 1_000_000
BASE = 150_000  # (1 - 0.85) * P0


def pagerank_fixed_point(
    edges_ds,
    src_col: str,
    dst_col: str,
    iters: int = 3,
    broadcast_nodes_below: int = 10_000_000,
    seed_nodes: list | None = None,
):
    """Dataset of ``(node, pr)`` over the UNDIRECTED multigraph of
    ``edges_ds`` (each edge contributes in both directions; parallel
    edges count — degree is incident-edge multiplicity). ``pr`` is the
    int64 fixed-point score after ``iters`` rounds.

    ``seed_nodes``: PERSONALIZED PageRank — restart mass lands only on
    the seed set (p_0 = P0 on seeds else 0; the per-round base term is
    BASE on seeds else 0), the standard "related to THESE entities"
    ranking. The seed list is query-state (a handful of ids), shipped
    by closure; the same integer recurrence stays exactly
    SQL-replayable. Seeds absent from the graph contribute nothing."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    def sym(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        a, b = batch[src_col], batch[dst_col]
        return pa.concat_tables(
            [
                pa.table({"src": a, "dst": b}),
                pa.table({"src": b, "dst": a}),
            ]
        ).combine_chunks()

    edges = edges_ds.map_batches(sym, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(
            pa.schema([("node", pa.string()), ("pr", pa.int64())]).empty_table()
        )
    deg = edges.groupby("src").count().materialize()  # (src, count())
    n_nodes = deg.count()

    if n_nodes <= broadcast_nodes_below:
        pdf = deg.to_pandas()
        ids = pdf["src"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        d = pdf["count()"].to_numpy(np.int64)[order]
        if seed_nodes is None:
            base = np.full(n_nodes, BASE, np.int64)
            p = np.full(n_nodes, P0, np.int64)
        else:
            mask = np.isin(ids, np.asarray(list(seed_nodes)))
            base = np.where(mask, BASE, 0).astype(np.int64)
            p = np.where(mask, P0, 0).astype(np.int64)

        for _ in range(iters):
            contrib_ref = ray.put((ids, p // d))

            def msg(batch: pa.Table, _ref=contrib_ref) -> pa.Table:
                from ..stages.chunking import pin_arrow_threads

                pin_arrow_threads()
                ids_s, c = ray.get(_ref)  # node-cached
                src = batch["src"].to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "id": batch["dst"],
                        "contrib": pa.array(
                            c[np.searchsorted(ids_s, src)], pa.int64()
                        ),
                    }
                )

            sums = (
                edges.map_batches(msg, batch_format="pyarrow")
                .groupby("id")
                .aggregate(Sum("contrib", alias_name="s"))
                .to_pandas()
            )
            s = np.zeros(n_nodes, np.int64)
            pos = np.searchsorted(ids, sums["id"].to_numpy())
            s[pos] = sums["s"].to_numpy(np.int64)
            p = base + (85 * s) // 100

        return rd.from_arrow(
            pa.table({"node": pa.array(ids), "pr": pa.array(p, pa.int64())})
        )

    # ---- distributed fallback: never centralizes the score table ----
    def _base_arr(id_arr):
        """Seed-masked base/p0 mask as int64 0/1 (1 everywhere when
        not personalized); the seed list is tiny closure state."""
        if seed_nodes is None:
            return pa.array([1] * len(id_arr), pa.int64())
        vs = pa.array(list(seed_nodes), type=id_arr.type)
        return pc.cast(pc.is_in(id_arr, value_set=vs), pa.int64())

    scores = deg.map_batches(
        lambda b: pa.table(
            {
                "id": b["src"],
                "p": pc.multiply(_base_arr(b["src"]), P0),
                "d": pc.cast(b["count()"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["src"],
                "dst": batch["dst"],
                "p": pa.nulls(len(batch), pa.int64()),
                "d": pa.nulls(len(batch), pa.int64()),
                "_side": pa.array([0] * len(batch), pa.int8()),
            }
        )

    tagged_edges = edges.map_batches(tag_edges, batch_format="pyarrow")

    def tag_scores(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["id"],
                "dst": pa.nulls(len(batch), batch["id"].type),
                "p": batch["p"],
                "d": batch["d"],
                "_side": pa.array([1] * len(batch), pa.int8()),
            }
        )

    def propagate(group: pa.Table) -> pa.Table:
        srow = group.filter(pc.equal(group["_side"], 1))
        contrib = srow["p"][0].as_py() // srow["d"][0].as_py()
        dsts = group.filter(pc.equal(group["_side"], 0))["dst"]
        return pa.table(
            {
                "id": dsts.combine_chunks(),
                "contrib": pa.array([contrib] * len(dsts), pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    for _ in range(iters):
        sums = (
            tagged_edges.union(
                scores.map_batches(tag_scores, batch_format="pyarrow")
            )
            .groupby("key")
            .map_groups(propagate, batch_format="pyarrow")
            .groupby("id")
            .aggregate(Sum("contrib", alias_name="s"))
        )

        # p_next needs (s, d) per node: union sums with the score
        # table's (id, d) and combine — LEFT-join semantics (a node
        # with no incoming message keeps s = 0)
        def tag_sums(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id": batch["id"],
                    "s": batch["s"],
                    "d": pa.array([0] * len(batch), pa.int64()),
                }
            )

        def tag_deg(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id": batch["id"],
                    "s": pa.array([0] * len(batch), pa.int64()),
                    "d": batch["d"],
                }
            )

        merged = (
            sums.map_batches(tag_sums, batch_format="pyarrow")
            .union(scores.map_batches(tag_deg, batch_format="pyarrow"))
            .groupby("id")
            .aggregate(Sum("s", alias_name="s"), Max("d", alias_name="d"))
        )
        scores = merged.map_batches(
            lambda b: pa.table(
                {
                    "id": b["id"],
                    # arrow integer divide truncates toward zero ==
                    # floor for these all-positive values — exact int64
                    "p": pc.add(
                        pc.multiply(_base_arr(b["id"]), BASE),
                        pc.divide(pc.multiply(b["s"], 85), 100),
                    ),
                    "d": b["d"],
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    return scores.map_batches(
        lambda b: pa.table({"node": b["id"], "pr": b["p"]}),
        batch_format="pyarrow",
    )
