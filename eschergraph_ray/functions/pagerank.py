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


def hits_fixed_point(
    edges_ds,
    src_col: str,
    dst_col: str,
    iters: int = 2,
    broadcast_nodes_below: int = 10_000_000,
):
    """Integer HITS (Kleinberg 1999 hubs & authorities) over the
    DIRECTED multigraph of ``edges_ds`` — the two-sided complement to
    :func:`pagerank_fixed_point`: a good HUB points at good
    authorities, a good AUTHORITY is pointed at by good hubs.

    All arithmetic is int64 fixed-point, exactly SQL-replayable:

      a_0(v)  = 1_000_000                                (uniform)
      hr(u)   = sum over out-edges (u, v) of a(v)        (raw hub)
      h(u)    = hr(u) * 1_000_000 // max(hr)             (normalize)
      ar(v)   = sum over in-edges  (u, v) of h(u)        (raw auth)
      a(v)    = ar(v) * 1_000_000 // max(ar)

    The max-normalization replaces the usual L2 norm so every step
    stays integer (sums and floor divisions are order-free in both
    engines). A fixed small ``iters`` is the operator contract, as for
    PageRank. Overflow bound: raw * SCALE must fit int64, i.e. max
    weighted in/out degree < ~9.2e6 — checked loudly per round.

    Returns ``(node, auth, hub)`` for every node of the graph (a node
    with no out-edges has hub 0; no in-edges, auth 0 after round 1).

    Two execution paths, identical results (the pagerank device):
    broadcast fast path below ``broadcast_nodes_below`` nodes (scores
    are model state: one searchsorted message pass per direction per
    round, groupby-sum shuffles, driver-side normalize); tagged-union
    fallback above it that never centralizes the score table — the
    per-round max is a scalar aggregate, the only driver state.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    if iters < 1:
        raise ValueError("iters must be >= 1")
    SCALE = 1_000_000
    OVERFLOW = (2**63 - 1) // SCALE

    def prep(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        return pa.table(
            {"src": batch[src_col], "dst": batch[dst_col]}
        ).combine_chunks()

    edges = edges_ds.map_batches(prep, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        sch = pa.schema(
            [("node", pa.string()), ("auth", pa.int64()),
             ("hub", pa.int64())]
        )
        return rd.from_arrow(sch.empty_table())

    def both_ends(batch: pa.Table) -> pa.Table:
        return pa.concat_tables(
            [
                pa.table({"id": batch["src"]}),
                pa.table({"id": batch["dst"]}),
            ]
        ).combine_chunks()

    nodes = (
        edges.map_batches(both_ends, batch_format="pyarrow")
        .groupby("id")
        .count()
        .materialize()
    )
    n_nodes = nodes.count()

    if n_nodes <= broadcast_nodes_below:
        ids = np.sort(nodes.to_pandas()["id"].to_numpy())
        a = np.full(n_nodes, SCALE, np.int64)
        h = np.zeros(n_nodes, np.int64)

        def _pass(scores: np.ndarray, key: str, other: str) -> np.ndarray:
            ref = ray.put((ids, scores))

            def msg(batch: pa.Table, _ref=ref) -> pa.Table:
                from ..stages.chunking import pin_arrow_threads

                pin_arrow_threads()
                ids_s, sc = ray.get(_ref)  # node-cached
                ov = batch[other].to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "id": batch[key],
                        "contrib": pa.array(
                            sc[np.searchsorted(ids_s, ov)], pa.int64()
                        ),
                    }
                )

            sums = (
                edges.map_batches(msg, batch_format="pyarrow")
                .groupby("id")
                .aggregate(Sum("contrib", alias_name="s"))
                .to_pandas()
            )
            raw = np.zeros(n_nodes, np.int64)
            pos = np.searchsorted(ids, sums["id"].to_numpy())
            raw[pos] = sums["s"].to_numpy(np.int64)
            m = int(raw.max())
            if m > OVERFLOW:
                raise ValueError(
                    f"hits_fixed_point: raw score {m} would overflow "
                    "int64 under SCALE normalization — reduce degree "
                    "skew or rescale"
                )
            return (raw * SCALE) // m if m > 0 else raw

        for _ in range(iters):
            h = _pass(a, key="src", other="dst")
            a = _pass(h, key="dst", other="src")

        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(ids),
                    "auth": pa.array(a, pa.int64()),
                    "hub": pa.array(h, pa.int64()),
                }
            )
        )

    # ---- distributed fallback: never centralizes the score table ----
    node_ids = nodes.map_batches(
        lambda b: pa.table({"id": b["id"]}), batch_format="pyarrow"
    ).materialize()

    def _tag_edges(key: str, other: str):
        def tag(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": batch[key],
                    "other": batch[other],
                    "val": pa.nulls(len(batch), pa.int64()),
                    "_side": pa.array([0] * len(batch), pa.int8()),
                }
            )

        return tag

    def _tag_scores(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["id"],
                "other": pa.nulls(len(batch), batch["id"].type),
                "val": batch["v"],
                "_side": pa.array([1] * len(batch), pa.int8()),
            }
        )

    def _propagate(group: pa.Table) -> pa.Table:
        srow = group.filter(pc.equal(group["_side"], 1))
        val = srow["val"][0].as_py()
        dsts = group.filter(pc.equal(group["_side"], 0))["other"]
        return pa.table(
            {
                "id": dsts.combine_chunks(),
                "contrib": pa.array([val] * len(dsts), pa.int64()),
            }
        )

    def _dist_pass(scores_ds, owner: str, recv: str):
        """One message round: the score of each edge's ``owner`` end
        flows to its ``recv`` end; returns normalized sums over every
        node (missing message = 0). The tagged-union group key is the
        OWNER (score rows and its edges meet in one reducer)."""
        sums = (
            edges.map_batches(_tag_edges(owner, recv),
                              batch_format="pyarrow")
            .union(scores_ds.map_batches(_tag_scores,
                                         batch_format="pyarrow"))
            .groupby("key")
            .map_groups(_propagate, batch_format="pyarrow")
            .groupby("id")
            .aggregate(Sum("contrib", alias_name="s"))
        )
        merged = (
            sums.map_batches(
                lambda b: pa.table(
                    {"id": b["id"], "s": pc.cast(b["s"], pa.int64())}
                ),
                batch_format="pyarrow",
            )
            .union(
                node_ids.map_batches(
                    lambda b: pa.table(
                        {
                            "id": b["id"],
                            "s": pa.array([0] * len(b), pa.int64()),
                        }
                    ),
                    batch_format="pyarrow",
                )
            )
            .groupby("id")
            .aggregate(Sum("s", alias_name="raw"))
            .materialize()
        )
        mrow = merged.max("raw")
        m = int(mrow) if mrow is not None else 0
        if m > OVERFLOW:
            raise ValueError(
                f"hits_fixed_point: raw score {m} would overflow int64 "
                "under SCALE normalization — reduce degree skew or "
                "rescale"
            )

        def norm(b: pa.Table) -> pa.Table:
            raw = pc.cast(b["raw"], pa.int64())
            v = (
                pc.divide(pc.multiply(raw, SCALE), m) if m > 0 else raw
            )
            return pa.table({"id": b["id"], "v": v})

        return merged.map_batches(norm, batch_format="pyarrow").materialize()

    a_ds = node_ids.map_batches(
        lambda b: pa.table(
            {"id": b["id"], "v": pa.array([SCALE] * len(b), pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    h_ds = None
    for _ in range(iters):
        # hub(u) sums a(v) over out-edges: a lives on dst, flows to src
        h_ds = _dist_pass(a_ds, owner="dst", recv="src")
        # auth(v) sums h(u) over in-edges: h lives on src, flows to dst
        a_ds = _dist_pass(h_ds, owner="src", recv="dst")

    def tag_a(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": b["id"],
                "a": b["v"],
                "h": pa.array([0] * len(b), pa.int64()),
            }
        )

    def tag_h(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": b["id"],
                "a": pa.array([0] * len(b), pa.int64()),
                "h": b["v"],
            }
        )

    return (
        a_ds.map_batches(tag_a, batch_format="pyarrow")
        .union(h_ds.map_batches(tag_h, batch_format="pyarrow"))
        .groupby("id")
        .aggregate(Sum("a", alias_name="auth"), Sum("h", alias_name="hub"))
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b["id"],
                    "auth": pc.cast(b["auth"], pa.int64()),
                    "hub": pc.cast(b["hub"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )


def katz_walk_centrality(
    edges_ds,
    src_col: str,
    dst_col: str,
    iters: int = 3,
    beta_denom: int = 4,
    broadcast_nodes_below: int = 10_000_000,
):
    """Integer Katz centrality (Katz 1953) over the UNDIRECTED
    multigraph of ``edges_ds`` — Σ_k β^k · (#walks of length k ending
    at v), the centrality that credits long-range reachability where
    degree sees one hop and PageRank divides influence away.

    EXACT-RATIONAL device: with β = 1/``beta_denom`` the score scaled
    by ``beta_denom^iters`` is a pure INTEGER:

      t_0(v) = 1;  t_{k+1}(v) = Σ over incident edges (u, v) of t_k(u)
      katz_scaled(v) = Σ_{k=0..iters} beta_denom^(iters-k) · t_k(v)

    Walk counts and the geometric weights are all int64 sums — no
    float anywhere, so DuckDB replays the unrolled recurrence verbatim
    with BIGINT joins. A fixed small ``iters`` is the operator
    contract (β must stay below 1/λ_max for the infinite series; a
    truncated integer prefix sidesteps convergence entirely). Walk
    counts grow like degree^k — overflow is checked LOUDLY per round
    (scores must stay under 2^62).

    Same two execution paths as :func:`pagerank_fixed_point`:
    broadcast (id, t) below ``broadcast_nodes_below`` with the
    searchsorted message pass; tagged-union groupby message passing
    above it. Returns ``(node, katz)``.
    """
    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    if iters < 1:
        raise ValueError("iters must be >= 1")
    if beta_denom < 2:
        raise ValueError("beta_denom must be >= 2")

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
            pa.schema(
                [("node", pa.string()), ("katz", pa.int64())]
            ).empty_table()
        )
    deg = edges.groupby("src").count().materialize()
    n_nodes = deg.count()
    LIMIT = 1 << 62

    if n_nodes <= broadcast_nodes_below:
        pdf = deg.to_pandas()
        ids = pdf["src"].to_numpy()
        ids = ids[np.argsort(ids)]
        dmax = max(int(pdf["count()"].max()), 1)
        t = np.ones(n_nodes, np.int64)
        acc = np.full(n_nodes, beta_denom ** iters, np.int64)

        for k in range(1, iters + 1):
            # pre-check BEFORE the wraparound: t_next <= t_max * deg_max
            if int(t.max(initial=0)) > LIMIT // dmax:
                raise ValueError(
                    "katz_walk_centrality: walk counts overflow int64 "
                    f"at round {k} — lower iters or raise beta_denom"
                )
            contrib_ref = ray.put((ids, t))

            def msg(batch: pa.Table, _ref=contrib_ref) -> pa.Table:
                from ..stages.chunking import pin_arrow_threads

                pin_arrow_threads()
                ids_s, tv = ray.get(_ref)
                src = batch["src"].to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "id": batch["dst"],
                        "contrib": pa.array(
                            tv[np.searchsorted(ids_s, src)], pa.int64()
                        ),
                    }
                )

            sums = (
                edges.map_batches(msg, batch_format="pyarrow")
                .groupby("id")
                .aggregate(Sum("contrib", alias_name="s"))
                .to_pandas()
            )
            t = np.zeros(n_nodes, np.int64)
            pos = np.searchsorted(ids, sums["id"].to_numpy())
            t[pos] = sums["s"].to_numpy(np.int64)
            acc = acc + (beta_denom ** (iters - k)) * t
            if int(t.max(initial=0)) >= LIMIT // beta_denom or (
                int(acc.max(initial=0)) >= LIMIT
            ):
                raise ValueError(
                    "katz_walk_centrality: walk counts overflow int64 "
                    f"at round {k} — lower iters or raise beta_denom"
                )

        return rd.from_arrow(
            pa.table({"node": pa.array(ids),
                      "katz": pa.array(acc, pa.int64())})
        )

    # ---- distributed fallback: scores stay a Dataset ----
    scores = deg.map_batches(
        lambda b: pa.table(
            {
                "id": b["src"],
                "t": pa.array([1] * len(b), pa.int64()),
                "acc": pa.array([beta_denom ** iters] * len(b),
                                pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["src"],
                "dst": batch["dst"],
                "t": pa.nulls(len(batch), pa.int64()),
                "_side": pa.array([0] * len(batch), pa.int8()),
            }
        )

    tagged_edges = edges.map_batches(tag_edges, batch_format="pyarrow")

    def tag_scores(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["id"],
                "dst": pa.nulls(len(batch), batch["id"].type),
                "t": batch["t"],
                "_side": pa.array([1] * len(batch), pa.int8()),
            }
        )

    def propagate(group: pa.Table) -> pa.Table:
        srow = group.filter(pc.equal(group["_side"], 1))
        tv = srow["t"][0].as_py()
        dsts = group.filter(pc.equal(group["_side"], 0))["dst"]
        return pa.table(
            {
                "id": dsts.combine_chunks(),
                "contrib": pa.array([tv] * len(dsts), pa.int64()),
            }
        )

    dmax_row = deg.aggregate(Max("count()"))
    dmax = max(int(dmax_row["max(count())"] or 1), 1)
    for k in range(1, iters + 1):
        mx_t = scores.aggregate(Max("t"))["max(t)"]
        if mx_t is not None and int(mx_t) > LIMIT // dmax:
            raise ValueError(
                "katz_walk_centrality: walk counts overflow int64 at "
                f"round {k} — lower iters or raise beta_denom"
            )
        sums = (
            tagged_edges.union(
                scores.map_batches(tag_scores, batch_format="pyarrow")
            )
            .groupby("key")
            .map_groups(propagate, batch_format="pyarrow")
            .groupby("id")
            .aggregate(Sum("contrib", alias_name="s"))
        )

        def tag_sums(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id": batch["id"],
                    "s": batch["s"],
                    "acc": pa.array([0] * len(batch), pa.int64()),
                }
            )

        def tag_acc(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id": batch["id"],
                    "s": pa.array([0] * len(batch), pa.int64()),
                    "acc": batch["acc"],
                }
            )

        w = beta_denom ** (iters - k)
        merged = (
            sums.map_batches(tag_sums, batch_format="pyarrow")
            .union(scores.map_batches(tag_acc, batch_format="pyarrow"))
            .groupby("id")
            .aggregate(Sum("s", alias_name="s"),
                       Sum("acc", alias_name="acc"))
        )
        scores = merged.map_batches(
            lambda b, _w=w: pa.table(
                {
                    "id": b["id"],
                    "t": pc.cast(b["s"], pa.int64()),
                    "acc": pc.add(
                        pc.cast(b["acc"], pa.int64()),
                        pc.multiply(pc.cast(b["s"], pa.int64()), _w),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        mx = scores.aggregate(Max("acc"))["max(acc)"]
        if mx is not None and int(mx) >= LIMIT:
            raise ValueError(
                "katz_walk_centrality: walk counts overflow int64 at "
                f"round {k} — lower iters or raise beta_denom"
            )

    return scores.map_batches(
        lambda b: pa.table({"node": b["id"], "katz": b["acc"]}),
        batch_format="pyarrow",
    )
