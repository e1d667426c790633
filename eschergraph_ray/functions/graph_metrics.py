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


def _explode_endpoints(edges):
    """(a, b) edge list -> one 'node' row per endpoint (the degree /
    seed aggregates' input) — zero-copy chunk concat, shared by the
    triangle / BFS / Adamic-Adar / clustering / k-core family."""

    def endpoints(b: pa.Table) -> pa.Table:
        node = pa.chunked_array(
            list(b["a"].chunks) + list(b["b"].chunks), type=b["a"].type
        )
        return pa.table({"node": node})

    return edges.map_batches(endpoints, batch_format="pyarrow")


def knn_from_pairs(pairs_ds, a_col: str, b_col: str, score_col: str,
                   k: int, out_id: str = "id", out_nbr: str = "neighbor_id"):
    """Top-k neighbor graph from a scored undirected pair list — the
    kNN-graph construction step of graph-based semantic search /
    SemDeDup-style cluster pruning, composed over any of the repo's
    pair producers (minhash, n-gram, cosine, semantic).

    Symmetrizes each pair to both directions, then keeps each node's
    ``k`` best neighbors by ``(score desc, neighbor asc)`` with a
    1-based ``rnk`` — exactly SQL ``row_number() OVER (PARTITION BY
    node ORDER BY score DESC, neighbor)``. One groupby shuffle; group
    sizes are bounded by the pair producer's df-cutoff, so no hub
    lands whole in a reducer beyond what the producer already allows.
    """

    def sym(batch: pa.Table) -> pa.Table:
        fwd = pa.table(
            {
                out_id: batch[a_col],
                out_nbr: batch[b_col],
                score_col: batch[score_col],
            }
        )
        rev = pa.table(
            {
                out_id: batch[b_col],
                out_nbr: batch[a_col],
                score_col: batch[score_col],
            }
        )
        return pa.concat_tables([fwd, rev]).combine_chunks()

    def topk(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[(score_col, "descending"), (out_nbr, "ascending")],
        )
        g = group.take(idx[: min(k, len(idx))])
        return g.append_column("rnk", pa.array(range(1, len(g) + 1), pa.int64()))

    return (
        pairs_ds.map_batches(sym, batch_format="pyarrow")
        .groupby(out_id)
        .map_groups(topk, batch_format="pyarrow")
    )


def triangle_counts(edges_ds, src_col: str, dst_col: str,
                    num_partitions: int = _DEFAULT_PARTITIONS,
                    fastpath_max_nodes: int = 2048,
                    fastpath_max_edges: int = 4_000_000,
                    pre_normalized: bool = False):
    """Per-node triangle participation counts.

    Returns ``(node, n_triangles)`` for every node in at least one
    triangle. Deterministic: counts are exact integers over the
    distinct-undirected-edge set, so the result is engine-independent
    (the SQL oracle enumerates the same a<b<c triples with two
    self-joins).

    Small-DENSE fast path: when the distinct-node count is at most
    ``fastpath_max_nodes`` the graph fits a driver-side adjacency
    matrix and per-node counts are ``(A² ∘ A)·1 / 2`` — one BLAS
    matmul instead of a 3-join pipeline. This is the regime the KG's
    entity graph actually lives in (a bounded entity vocabulary
    co-occurring across millions of conversations collapses to a small
    dense simple graph, where oriented wedges approach n³ and the
    join path does strictly more work than the matmul). Same
    broadcast-small-state precedent as components.py's label fast
    path; the distributed degree-oriented join path below remains the
    scale route for large SPARSE graphs (node-count check is a cheap
    aggregate, never a materialization gamble).
    """
    num_partitions = _clamp_partitions(num_partitions)
    # node type from the INPUT schema — an all-empty groupby output
    # carries no schema at all in Ray 2.49
    node_type = edges_ds.schema().base_schema.field(src_col).type
    # pre_normalized: the caller already holds the distinct (a < b)
    # loop-free edge list (e.g. clustering_coefficients) — skip the
    # redundant full distinct-groupby shuffle
    edges = (
        edges_ds.materialize()
        if pre_normalized
        else _normalized_edges(edges_ds, src_col, dst_col).materialize()
    )
    empty = pa.table(
        {
            "node": pa.array([], node_type),
            "n_triangles": pa.array([], pa.int64()),
        }
    )
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(empty)

    if n_edges <= fastpath_max_edges:
        import numpy as np

        all_nodes = edges.map_batches(
            lambda b: pa.concat_tables(
                [pa.table({"node": b["a"]}), pa.table({"node": b["b"]})]
            ).combine_chunks(),
            batch_format="pyarrow",
        ).groupby("node").count().materialize()
        # gate on a COUNT aggregate — the distinct node list only comes
        # to the driver after the bound check passes (never a
        # materialization gamble on a big sparse graph)
        if all_nodes.count() <= fastpath_max_nodes:
            nodes = sorted(
                r["node"]
                for b in all_nodes.iter_batches(batch_format="pyarrow")
                for r in b.select(["node"]).to_pylist()
            )
            idx = {v: i for i, v in enumerate(nodes)}
            n = len(nodes)
            A = np.zeros((n, n), dtype=np.float64)
            for b in edges.iter_batches(batch_format="pyarrow"):
                ai = [idx[v] for v in b["a"].to_pylist()]
                bi = [idx[v] for v in b["b"].to_pylist()]
                A[ai, bi] = 1.0
                A[bi, ai] = 1.0
            # diag(A^3)_i = sum_j (A^2)_ij * A_ij; entries <= n^2 stay
            # exact in float64
            tri = (((A @ A) * A).sum(axis=1) / 2).astype(np.int64)
            keep = tri > 0
            out = pa.table(
                {
                    "node": pa.array(
                        [nodes[i] for i in np.nonzero(keep)[0]], node_type
                    ),
                    "n_triangles": pa.array(tri[keep], pa.int64()),
                }
            )
            return rd.from_arrow(out if len(out) else empty)

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


def cooccurrence_pmi_topk(ds, group_col: str, item_col: str,
                          min_count: int = 3,
                          num_partitions: int = _DEFAULT_PARTITIONS,
                          assume_distinct: bool = False,
                          n_groups: int | None = None,
                          max_basket: int | None = 10_000,
                          include_item_counts: bool = False):
    """Item-pair co-occurrence strength by PMI over grouped
    observations — "related entities" mining over the KG (items =
    level-0 entity names, groups = conversations) or any
    (basket, item) table.

    ``pmi = ln( (n_ab * N) / (n_a * n_b) )`` with n_ab = groups
    containing both items, n_a/n_b = groups containing each item,
    N = total groups — all EXACT int64 counts assembled distributed:

    1. distinct (group, item) — one groupby;
    2. per-group item pairs via a hash SELF-JOIN on the group key
       (filter item_a < item_b) — vectorized end to end; a
       groupby(group).map_groups pair loop costs ~1 ms of Python per
       basket and melts down at millions of baskets (measured 71 s ->
       ~10 s at sf0.1), while join fan-out per basket is the same
       quadratic the pair table needs anyway. ``max_basket`` bounds
       that quadratic: a group with more than ``max_basket`` distinct
       items is DROPPED whole before any counting (the dedup.py
       hot-gram df-cutoff device — one degenerate 10^5-item basket
       would otherwise fan out 10^10 join rows), with a loud
       dropped-basket warning; a dropped basket contributes to
       neither pair counts, item counts, nor the group total N
       (except a caller-passed ``n_groups``, which is the caller's
       corpus-level denominator and is left untouched);
    3. pair counts — the int-bucket combine (dedup._pair_counts_bucketed;
       a native composite-key groupby would re-shuffle the whole
       basket fan-out); rare pairs cut at ``min_count`` BEFORE the
       attach so the scored table stays small;
    4. item counts attached via dedup._attach_payload — broadcast
       lookup below its budget, two hash joins past it (web-scale
       entity sets stay scale-safe);
    5. one scoring pass emitting integer micro-nats
       ``round(ln(expr) * 1e6)`` (the vocab.bigram_pmi parity device:
       a single float expression over exact ints, then an all-integer
       ordering).

    Returns ``(item_a, item_b, n_ab, pmi_micro)`` unranked; callers
    sort on (pmi_micro desc, item_a, item_b) and limit.
    ``include_item_counts=True`` appends the joined ``n_a``/``n_b``
    marginals (consumed by :func:`association_rules_topk`).

    ``assume_distinct=True`` skips the (group, item) dedup groupby for
    inputs the producer already guarantees unique (e.g. the KG's
    level-0 node rows are one-per-(conversation, name) by
    construction) — a full-input shuffle saved.
    """
    import numpy as np

    num_partitions = _clamp_partitions(num_partitions)

    from .dedup import _pair_counts_bucketed

    if assume_distinct:
        distinct = ds.map_batches(
            lambda b: b.select([group_col, item_col]),
            batch_format="pyarrow",
        )
    else:
        # (group, item) dedupe via the int-bucket combine — a native
        # composite-key groupby sort-shuffles the whole fact stream
        distinct = _pair_counts_bucketed(
            ds, out_col="_n", a_col=group_col, b_col=item_col
        ).map_batches(
            lambda b: b.select([group_col, item_col]),
            batch_format="pyarrow",
        )

    # coalesce: a partitioned build read arrives as hundreds of tiny
    # blocks, and per-block fixed costs dominate the join exchange
    # (the CLAUDE.md small-file lesson) — repartition once, then pin
    # for both join sides + N
    distinct = distinct.repartition(num_partitions).materialize()
    _ecols = {
        "item_a": pa.array([], ds.schema().base_schema.field(item_col).type),
        "item_b": pa.array([], ds.schema().base_schema.field(item_col).type),
        "n_ab": pa.array([], pa.int64()),
        "pmi_micro": pa.array([], pa.int64()),
    }
    if include_item_counts:
        _ecols["n_a"] = pa.array([], pa.int64())
        _ecols["n_b"] = pa.array([], pa.int64())
    empty_result = pa.table(_ecols)
    # empty input would put an empty side into the self-join below —
    # the documented Ray 2.49 hash-join crash; short-circuit instead
    if distinct.count() == 0:
        return rd.from_arrow(empty_result)
    if max_basket is not None:
        # basket-size cutoff: per-group distinct-item counts (one
        # groupby over the distinct table — doubles as the N count
        # below), oversized groups semi-joined OUT before the
        # quadratic pair explode. Loud, never silent.
        sizes = distinct.groupby(group_col).count().materialize()
        n_dropped = sizes.map_batches(
            lambda b: b.filter(pc.greater(b["count()"], max_basket)),
            batch_format="pyarrow",
        ).count()
        if n_dropped:
            import logging

            logging.getLogger(__name__).warning(
                "cooccurrence_pmi_topk: dropping %d basket(s) with more "
                "than max_basket=%d distinct items before pair "
                "generation (quadratic-fan-out guard)",
                n_dropped, max_basket,
            )
            ok = (
                sizes.map_batches(
                    lambda b: b.filter(
                        pc.less_equal(b["count()"], max_basket)
                    ).select([group_col]),
                    batch_format="pyarrow",
                )
                .repartition(num_partitions)
                .materialize()
            )
            if ok.count() == 0:
                return rd.from_arrow(empty_result)
            distinct = (
                distinct.join(
                    ok,
                    join_type="left_semi",
                    num_partitions=num_partitions,
                    on=(group_col,),
                )
                .repartition(num_partitions)
                .materialize()
            )
        if n_groups is None:
            n_groups = sizes.count() - n_dropped
    if n_groups is None:
        # N = number of distinct groups — a COUNT over the grouped keys
        # (an integer off a shuffle, never a driver-side key list);
        # callers that already know N (e.g. the KG's conversation count
        # from the documents sidecar metadata) pass it and skip this
        n_groups = distinct.groupby(group_col).count().count()

    def as_side(out: str):
        return distinct.map_batches(
            lambda b, o=out: b.rename_columns([group_col, o]),
            batch_format="pyarrow",
        )

    def partial_pair_counts(batch: pa.Table) -> pa.Table:
        # combiner: per-batch partial counts BEFORE the pair groupby,
        # so the exchange moves distinct-pairs-per-batch, not every
        # co-occurrence instance
        t = batch.filter(pc.less(batch["item_a"], batch["item_b"])).select(
            ["item_a", "item_b"]
        )
        return t.group_by(["item_a", "item_b"]).aggregate(
            [("item_a", "count")]
        ).rename_columns(["item_a", "item_b", "n_part"])

    pair_rows = (
        as_side("item_a")
        .join(
            as_side("item_b"),
            join_type="inner",
            num_partitions=num_partitions,
            on=(group_col,),
        )
        .map_batches(partial_pair_counts, batch_format="pyarrow")
    )
    # pair-partial SUM via the int-bucket combine (see
    # dedup._pair_counts_bucketed): a native groupby over the
    # (item_a, item_b) composite key re-shuffles the whole ~quadratic
    # basket fan-out on wide keys — bucketing by crc32(item_a) moves
    # the same rows on one small int and aggregates exactly
    pair_counts = _pair_counts_bucketed(
        pair_rows, out_col="n_ab", a_col="item_a", b_col="item_b",
        sum_col="n_part",
    ).map_batches(
        lambda b: b.filter(pc.greater_equal(b["n_ab"], min_count)),
        batch_format="pyarrow",
    )
    pair_counts = pair_counts.materialize()
    # sparse-key aggregates can emit schema-less EMPTY blocks next to
    # real ones, which crash the chained hash join ("No match for
    # FieldRef") — repartition normalizes (dedup._nonempty_pairs device)
    if pair_counts.count() == 0:
        return rd.from_arrow(empty_result)

    pair_counts = pair_counts.repartition(num_partitions)

    item_counts = (
        distinct.groupby(item_col)
        .count()
        .map_batches(
            lambda b: b.rename_columns([item_col, "n_item"]),
            batch_format="pyarrow",
        )
        # normalize sparse-key empty blocks (join-side crash guard)
        .repartition(num_partitions)
    ).materialize()  # consumed by BOTH attaches

    # marginal attach via dedup._attach_payload: ray.put broadcast +
    # index_in lookup below its row/byte budget (vocabulary-sized
    # tables — two joins' worth of barriers saved), the distributed
    # hash join past it (web-scale entity sets stay scale-safe)
    from .dedup import _attach_payload

    j1 = _attach_payload(pair_counts, item_counts, "item_a", item_col,
                         "n_item", "n_a", num_partitions)
    j2 = _attach_payload(j1, item_counts, "item_b", item_col,
                         "n_item", "n_b", num_partitions)

    def score(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        n_ab = batch["n_ab"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_a = batch["n_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_b = batch["n_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(n_ab) == 0:
            micro = np.array([], dtype=np.int64)
        else:
            # single float expression over exact ints, both engines:
            # ln( (n_ab * N) / (n_a * n_b) ) -> micro-nats
            expr = (n_ab * n_groups).astype(np.float64) / (
                n_a * n_b
            ).astype(np.float64)
            micro = np.asarray(
                pc.round(
                    pa.array(np.log(expr) * 1e6),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                )
            ).astype(np.int64)
        cols = {
            "item_a": batch["item_a"],
            "item_b": batch["item_b"],
            "n_ab": pa.array(n_ab, pa.int64()),
            "pmi_micro": pa.array(micro, pa.int64()),
        }
        if include_item_counts:
            cols["n_a"] = pa.array(n_a, pa.int64())
            cols["n_b"] = pa.array(n_b, pa.int64())
        return pa.table(cols)

    return j2.map_batches(score, batch_format="pyarrow")


def association_rules_topk(ds, group_col: str, item_col: str,
                           min_count: int = 3,
                           num_partitions: int = _DEFAULT_PARTITIONS,
                           assume_distinct: bool = False,
                           n_groups: int | None = None,
                           max_basket: int | None = 10_000):
    """Directed association rules over grouped co-occurrences — the
    market-basket rule miner (Agrawal & Srikant 1994 support/confidence
    counts, exact not sampled) over the same (group, item) table as
    :func:`cooccurrence_pmi_topk`: every surviving undirected pair
    emits both rules ``a -> b`` and ``b -> a`` with

      ``conf_micro = round(1e6 · n_ab / n_antecedent)``   (confidence)
      ``pmi_micro``  = the pair's log-lift (shared with the PMI op)

    Confidence answers "given the antecedent appears in a basket, how
    often does the consequent?" — the actionable form of relatedness
    (PMI is symmetric; confidence is not: a niche entity can strongly
    imply a hub while the hub implies nothing). All counts and the
    basket/min_count cuts are inherited from the PMI pipeline — one
    code path, one set of guards. Returns ``(antecedent, consequent,
    n_ab, conf_micro, pmi_micro)`` unranked; callers sort on
    (conf_micro desc, pmi_micro desc, names) and limit."""
    import numpy as np

    pairs = cooccurrence_pmi_topk(
        ds, group_col, item_col, min_count=min_count,
        num_partitions=num_partitions, assume_distinct=assume_distinct,
        n_groups=n_groups, max_basket=max_basket,
        include_item_counts=True,
    ).materialize()  # pair-table-sized (min_count-cut); consumed twice
    if pairs.count() == 0:
        t = ds.schema().base_schema.field(item_col).type
        return rd.from_arrow(
            pa.table(
                {
                    "antecedent": pa.array([], t),
                    "consequent": pa.array([], t),
                    "n_ab": pa.array([], pa.int64()),
                    "conf_micro": pa.array([], pa.int64()),
                    "pmi_micro": pa.array([], pa.int64()),
                }
            )
        )

    def directed(batch: pa.Table) -> pa.Table:
        n_ab = batch["n_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_a = batch["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_b = batch["n_b"].to_numpy(zero_copy_only=False).astype(np.float64)

        def conf(denom):
            return pc.cast(
                pc.round(
                    pa.array(1e6 * n_ab / denom),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )

        fwd = pa.table(
            {
                "antecedent": batch["item_a"],
                "consequent": batch["item_b"],
                "n_ab": batch["n_ab"],
                "conf_micro": conf(n_a),
                "pmi_micro": batch["pmi_micro"],
            }
        )
        rev = pa.table(
            {
                "antecedent": batch["item_b"],
                "consequent": batch["item_a"],
                "n_ab": batch["n_ab"],
                "conf_micro": conf(n_b),
                "pmi_micro": batch["pmi_micro"],
            }
        )
        return pa.concat_tables([fwd, rev]).combine_chunks()

    return pairs.map_batches(directed, batch_format="pyarrow")


def _kcore_local(edges_mat, k: int, iters: int, out_schema: pa.Schema):
    """Driver peel of a small materialized (a, b) edge list — exactly
    the distributed rounds' semantics (simultaneous removal of ALL
    sub-k nodes per round, same fixed-iteration bound)."""
    import numpy as np

    tbl = pa.concat_tables(
        list(edges_mat.iter_batches(batch_format="pyarrow"))
        or [pa.schema([pa.field("a", out_schema.field("node").type),
                       pa.field("b", out_schema.field("node").type)]
                      ).empty_table()]
    )
    a = tbl["a"].to_numpy(zero_copy_only=False)
    b = tbl["b"].to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[: len(a)], inv[len(a):]
    alive_e = np.ones(len(ea), bool)
    for _ in range(iters):
        if not alive_e.any():
            return rd.from_arrow(out_schema.empty_table())
        deg = np.bincount(ea[alive_e], minlength=len(nodes)) + np.bincount(
            eb[alive_e], minlength=len(nodes)
        )
        present = deg > 0
        bad = present & (deg < k)
        if not bad.any():
            keep = present
            return rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array(nodes[keep]).cast(
                            out_schema.field("node").type
                        ),
                        "core_degree": pa.array(
                            deg[keep].astype("int64"), pa.int64()
                        ),
                    }
                )
            )
        alive_e &= ~(bad[ea] | bad[eb])
    raise RuntimeError(
        f"k-core peel did not converge within {iters} iterations — "
        f"raise `iters` (and the oracle's unroll count) together"
    )


def kcore_nodes(edges_ds, src_col: str, dst_col: str, k: int,
                iters: int = 12, num_partitions: int = _DEFAULT_PARTITIONS,
                small_edge_cutoff: int = 200_000):
    """k-core of the undirected simple graph induced by ``edges_ds``:
    iteratively peel every node of degree < ``k`` until a fixed point —
    the standard robust-subgraph extraction (Seidman 1983; on a kNN
    similarity graph the k-core is exactly the "dense cluster seed"
    set, nodes mutually supported by >= k strong neighbors).

    Runs at most ``iters`` peel rounds and RAISES if the graph has not
    converged by then — the SQL oracle unrolls the same fixed count
    (each round is idempotent after convergence, so an early converge
    on the Ray side cannot diverge from the unrolled replay). Each
    round is fully distributed: one endpoint-explode groupby for
    degrees, two clamped left_anti hash joins to drop peeled
    endpoints; the driver sees only row COUNTS (convergence test).
    Per-round edge sets are materialized (they only shrink).

    Returns a Dataset (node, core_degree) — every survivor's degree
    within the core, all >= k — unsorted. ``node`` keeps the endpoint
    columns' own type."""
    P = _clamp_partitions(num_partitions)

    def degrees(eds):
        def endpoints(b: pa.Table) -> pa.Table:
            node = pa.chunked_array(
                list(b["a"].chunks) + list(b["b"].chunks), type=b["a"].type
            )
            return pa.table({"node": node})

        return (
            eds.map_batches(endpoints, batch_format="pyarrow")
            .groupby("node")
            .count()
        )

    edges = _normalized_edges(edges_ds, src_col, dst_col).materialize()
    node_type = edges.schema().base_schema.field("a").type
    out_schema = pa.schema(
        [pa.field("node", node_type), pa.field("core_degree", pa.int64())]
    )
    # Small-graph fast path (the triangle_counts dense-path precedent):
    # below the cutoff the NORMALIZED edge list is driver-affordable
    # model state, and 7+ peel rounds of degree-groupby + two
    # anti-joins are pure fixed overhead (~3 s/round of shuffle setup
    # for a graph numpy peels in microseconds). Same fixed-iteration /
    # loud-nonconvergence contract; the distributed path is forced in
    # tests with small_edge_cutoff=0.
    if edges.count() <= small_edge_cutoff:
        return _kcore_local(edges, k, iters, out_schema)
    for _ in range(iters):
        if edges.count() == 0:
            return rd.from_arrow(out_schema.empty_table())
        deg = degrees(edges).materialize()
        bad = deg.map_batches(
            lambda b: b.filter(pc.less(b["count()"], k)).select(["node"]),
            batch_format="pyarrow",
        ).materialize()
        if bad.count() == 0:  # fixed point: remaining rounds are no-ops
            def finalize(b: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "node": b["node"],
                        "core_degree": b["count()"].cast(pa.int64()),
                    }
                )

            return deg.map_batches(finalize, batch_format="pyarrow")
        bad = bad.repartition(P)
        half = (
            edges.repartition(P)
            .join(bad, join_type="left_anti",
                  num_partitions=P, on=("a",), right_on=("node",))
            .materialize()
        )
        # the first anti-join can empty the edge set mid-iteration; an
        # empty left side crashes the Acero join — short-circuit
        if half.count() == 0:
            edges = half
            continue
        edges = (
            half.repartition(P)
            .join(bad, join_type="left_anti",
                  num_partitions=P, on=("b",), right_on=("node",))
            .materialize()
        )
    raise RuntimeError(
        f"k-core peel did not converge within {iters} iterations — "
        f"raise `iters` (and the oracle's unroll count) together"
    )


def _lpa_local(edges_mat, rounds: int, out_schema: pa.Schema):
    """Driver LPA over a small materialized (a, b) edge list —
    synchronous rounds, most-frequent neighbor label, ties -> smallest
    label (identical to the distributed rounds and the SQL replay)."""
    import numpy as np

    tbl = pa.concat_tables(
        list(edges_mat.iter_batches(batch_format="pyarrow"))
        or [pa.schema([pa.field("a", out_schema.field("node").type),
                       pa.field("b", out_schema.field("node").type)]
                      ).empty_table()]
    )
    a = tbl["a"].to_numpy(zero_copy_only=False)
    b = tbl["b"].to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[: len(a)], inv[len(a):]
    src = np.concatenate([ea, eb])
    dst = np.concatenate([eb, ea])
    label = np.arange(len(nodes), dtype=np.int64)  # label = own index
    for _ in range(rounds):
        # synchronous argmax of neighbor-label counts, ties -> smallest
        # LABEL VALUE: sort (dst, label) pairs and segment-count
        lab = label[src]
        order = np.lexsort((lab, dst))
        d_s, l_s = dst[order], lab[order]
        # run starts where (dst, label) changes
        new_run = np.empty(len(d_s), bool)
        new_run[0] = True
        new_run[1:] = (d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1])
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.append(starts, len(d_s)))
        run_dst, run_lab = d_s[starts], l_s[starts]
        # per dst: max count, tie -> smallest label. run_lab ascending
        # within each dst, so lexsort by (-count) stable keeps smallest
        # label first among equal counts
        sel = np.lexsort((run_lab, -counts, run_dst))
        first = np.empty(len(sel), bool)
        rd_s = run_dst[sel]
        first[0] = True
        first[1:] = rd_s[1:] != rd_s[:-1]
        upd_nodes = rd_s[first]
        upd_labels = run_lab[sel][first]
        label = label.copy()
        label[upd_nodes] = upd_labels
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes).cast(out_schema.field("node").type),
                "label": pa.array(nodes[label]).cast(
                    out_schema.field("node").type
                ),
            }
        )
    )


def label_propagation(edges_ds, src_col: str, dst_col: str,
                      rounds: int = 6,
                      num_partitions: int = _DEFAULT_PARTITIONS,
                      small_edge_cutoff: int = 200_000):
    """Synchronous label propagation (Raghavan et al. 2007) over the
    undirected simple graph: every node starts labeled with itself;
    each round ALL nodes simultaneously adopt their neighbors' most
    frequent label (ties -> smallest label). Runs EXACTLY ``rounds``
    rounds — no convergence requirement, so the fixed-round SQL unroll
    is deterministic on both engines even mid-oscillation.

    Distributed round = one hash join (labels onto edge sources), one
    (node, label) count groupby, one per-node argmax; labels
    materialize between rounds (label-table-sized, not edge-sized).
    Below ``small_edge_cutoff`` normalized edges, a driver numpy pass
    computes the identical rounds (the kcore_nodes fast-path
    precedent); tests force both paths. Returns (node, label)."""
    P = _clamp_partitions(num_partitions)
    edges = _normalized_edges(edges_ds, src_col, dst_col).materialize()
    node_type = edges.schema().base_schema.field("a").type
    out_schema = pa.schema(
        [pa.field("node", node_type), pa.field("label", node_type)]
    )
    if edges.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    if edges.count() <= small_edge_cutoff:
        return _lpa_local(edges, rounds, out_schema)

    def sym(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.chunked_array(
                    list(b["a"].chunks) + list(b["b"].chunks),
                    type=b["a"].type,
                ),
                "dst": pa.chunked_array(
                    list(b["b"].chunks) + list(b["a"].chunks),
                    type=b["a"].type,
                ),
            }
        )

    sym_ds = edges.map_batches(
        sym, batch_format="pyarrow"
    ).repartition(P).materialize()
    labels = (
        sym_ds.groupby("src")
        .count()
        .map_batches(
            lambda b: pa.table({"node": b["src"], "label": b["src"]}),
            batch_format="pyarrow",
        )
        .repartition(P)
        .materialize()
    )

    def argmax(df):
        df = df.sort_values(["count()", "label"],
                            ascending=[False, True])
        # ARROW out: pandas-block outputs make the next round's join
        # and repartition shuffles ~15x slower (the dedup.py prefix
        # lesson)
        return pa.Table.from_pandas(
            df.iloc[:1][["dst", "label"]].rename(columns={"dst": "node"}),
            preserve_index=False,
        )

    for _ in range(rounds):
        cnt = (
            sym_ds.join(labels, join_type="inner", num_partitions=P,
                        on=("src",), right_on=("node",))
            .groupby(["dst", "label"])
            .count()
        )
        labels = (
            cnt.groupby("dst")
            .map_groups(argmax, batch_format="pandas")
            .repartition(P)
            .materialize()
        )
    return labels


def _np_bfs_hops(n_nodes: int, ea, eb, seed_idx: int, max_hops: int):
    """Min-hop numpy BFS sweep over index-encoded undirected edges —
    the ONE frontier loop shared by :func:`_bfs_local` and
    :func:`harmonic_centrality_seeds`; returns the per-node hop array
    (-1 = unreachable within max_hops)."""
    import numpy as np

    hop = np.full(n_nodes, -1, np.int64)
    hop[seed_idx] = 0
    frontier = np.zeros(n_nodes, bool)
    frontier[seed_idx] = True
    for h in range(1, max_hops + 1):
        touch = np.zeros(n_nodes, bool)
        touch[eb[frontier[ea]]] = True
        touch[ea[frontier[eb]]] = True
        new = touch & (hop < 0)
        if not new.any():
            break
        hop[new] = h
        frontier = new
    return hop


def _bfs_local(edges_mat, max_hops: int, out_schema: pa.Schema):
    """Driver BFS over a small materialized (a, b) edge list — same
    min-hop semantics as the distributed rounds."""
    import numpy as np

    tbl = pa.concat_tables(
        list(edges_mat.iter_batches(batch_format="pyarrow"))
        or [pa.schema([pa.field("a", out_schema.field("node").type),
                       pa.field("b", out_schema.field("node").type)]
                      ).empty_table()]
    )
    if tbl.num_rows == 0:
        return rd.from_arrow(out_schema.empty_table())
    a = tbl["a"].to_numpy(zero_copy_only=False)
    b = tbl["b"].to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ea, eb = inv[: len(a)], inv[len(a):]
    deg = np.bincount(ea, minlength=len(nodes)) + np.bincount(
        eb, minlength=len(nodes)
    )
    # np.unique sorts ascending, argmax takes the FIRST max -> the
    # lexicographically smallest among degree ties (the seed contract)
    seed = int(np.argmax(deg))
    hop = _np_bfs_hops(len(nodes), ea, eb, seed, max_hops)
    keep = hop >= 0
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes[keep]).cast(
                    out_schema.field("node").type
                ),
                "hop": pa.array(hop[keep], pa.int64()),
            }
        )
    )


def bfs_layers(edges_ds, src_col: str, dst_col: str, max_hops: int = 3,
               num_partitions: int = _DEFAULT_PARTITIONS,
               small_edge_cutoff: int = 200_000):
    """Min-hop BFS layers from a DETERMINISTIC seed (the max-degree
    node of the undirected simple graph, ties to the smallest name —
    computable identically by a SQL oracle) out to ``max_hops``.
    Returns (node, hop) for every reachable node including the seed at
    hop 0 — the neighborhood-expansion primitive (provenance walks,
    blast-radius queries, "entities within k hops of X").

    Distributed rounds: per-hop frontier expansion is two clamped
    hash semi-joins of the (materialized, shrinking-frontier) node set
    against the edge list plus one distinct-groupby — per round the
    shuffle moves frontier-adjacent edges only, and the visited set
    accumulates as a Dataset (never driver state). Below
    ``small_edge_cutoff`` normalized edges the whole graph is
    driver-affordable model state and numpy BFS replaces ~max_hops
    rounds of join fixed costs (the triangle_counts /
    kcore_nodes dense-path precedent; force the distributed path in
    tests with small_edge_cutoff=0)."""
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    P = _clamp_partitions(num_partitions)
    edges = _normalized_edges(edges_ds, src_col, dst_col).materialize()
    node_type = edges_ds.schema().base_schema.field(src_col).type
    out_schema = pa.schema(
        [pa.field("node", node_type), pa.field("hop", pa.int64())]
    )
    if edges.count() <= small_edge_cutoff:
        return _bfs_local(edges, max_hops, out_schema)

    deg = _explode_endpoints(edges).groupby("node").count()
    seed_row = deg.sort(["count()", "node"], descending=[True, False]).limit(
        1
    ).take_all()
    seed = seed_row[0]["node"]
    return _bfs_dist(edges, seed, max_hops, node_type, P)


def _bfs_dist(edges, seed, max_hops: int, node_type, P: int):
    """Distributed min-hop BFS from one given seed over a materialized
    normalized (a, b) edge list — the shared frontier-expansion loop
    behind :func:`bfs_layers` and :func:`harmonic_centrality_seeds`.
    Returns the (node, hop) layer dataset including the seed at 0."""

    def layer_tbl(names, h):
        return pa.table(
            {
                "node": pa.array(names, node_type),
                "hop": pa.array([h] * len(names), pa.int64()),
            }
        )

    layers = [rd.from_arrow(layer_tbl([seed], 0))]
    visited = rd.from_arrow(pa.table({"node": pa.array([seed], node_type)}))
    frontier = visited.materialize()
    for h in range(1, max_hops + 1):
        f = frontier.repartition(P)
        outs = []
        for side, other in (("a", "b"), ("b", "a")):
            hit = (
                edges.repartition(P)
                .join(f, join_type="left_semi", num_partitions=P,
                      on=(side,), right_on=("node",))
                .map_batches(
                    lambda b, o=other: pa.table({"node": b[o]}),
                    batch_format="pyarrow",
                )
                .materialize()
            )
            if hit.count() > 0:
                outs.append(hit)
        if not outs:
            break
        nxt = outs[0] if len(outs) == 1 else outs[0].union(outs[1])
        nxt = (
            nxt.groupby("node")
            .count()
            .map_batches(
                lambda b: b.select(["node"]), batch_format="pyarrow"
            )
            .repartition(P)
            .join(visited.repartition(P), join_type="left_anti",
                  num_partitions=P, on=("node",))
            .materialize()
        )
        if nxt.count() == 0:
            break
        layers.append(
            nxt.map_batches(
                lambda b, hh=h: b.append_column(
                    "hop", pa.array([hh] * len(b), pa.int64())
                ),
                batch_format="pyarrow",
            )
        )
        visited = visited.union(nxt).materialize()
        frontier = nxt
    out = layers[0]
    for ly in layers[1:]:
        out = out.union(ly)
    return out


def adamic_adar_topk(edges_ds, src_col: str, dst_col: str, k: int = 25,
                     num_partitions: int = _DEFAULT_PARTITIONS,
                     fastpath_max_nodes: int = 2048):
    """Adamic-Adar link prediction over the undirected simple graph:
    for every NON-adjacent pair (u, v) with at least one common
    neighbor, ``aa = sum over common neighbors w of 1 / ln(deg(w))``
    (Adamic & Adar 2003) — rarer hubs certify a stronger latent link.
    Returns the top ``k`` rows ``(node_a, node_b, n_common, aa_micro)``
    by (aa_micro desc, node_a, node_b).

    Parity device: the per-NODE weight ``q_w = round(1e6 / ln(d_w))``
    is the only float step (one ln, one division, zero-digit round —
    identical in DuckDB), so pair scores are exact int64 sums; degree-1
    centers generate no wedge and are dropped before the division.

    Small-dense fast path (the triangle_counts precedent, the KG
    regime): below ``fastpath_max_nodes`` distinct nodes the score
    matrix is one ``(A*q) @ A`` matmul — int-valued float64 (q <=
    1.5e6, n common neighbors <= n, far inside 2^53). The distributed
    route mirrors the PMI pipeline: wedges via a hash SELF-JOIN of the
    symmetrized edge list on the center (weights joined on, never
    broadcast), pair groupby-sum, adjacency dropped with a clamped
    left_anti join."""
    import math

    import numpy as np

    P = _clamp_partitions(num_partitions)
    node_type = edges_ds.schema().base_schema.field(src_col).type
    edges = _normalized_edges(edges_ds, src_col, dst_col).materialize()
    empty = pa.table(
        {
            "node_a": pa.array([], node_type),
            "node_b": pa.array([], node_type),
            "n_common": pa.array([], pa.int64()),
            "aa_micro": pa.array([], pa.int64()),
        }
    )
    if edges.count() == 0:
        return rd.from_arrow(empty)

    deg = _explode_endpoints(edges).groupby("node").count().materialize()
    if deg.count() <= fastpath_max_nodes:
        nodes = sorted(
            r["node"]
            for b in deg.iter_batches(batch_format="pyarrow")
            for r in b.select(["node"]).to_pylist()
        )
        idx = {v: i for i, v in enumerate(nodes)}
        n = len(nodes)
        A = np.zeros((n, n), np.float64)
        for b in edges.iter_batches(batch_format="pyarrow"):
            ai = [idx[v] for v in b["a"].to_pylist()]
            bi = [idx[v] for v in b["b"].to_pylist()]
            A[ai, bi] = 1.0
            A[bi, ai] = 1.0
        d = A.sum(axis=1)
        q = np.zeros(n, np.float64)
        m2 = d >= 2
        # the ONLY float step, once per node (libm log, like the SQL ln)
        q[m2] = np.asarray(
            pc.round(
                pa.array(1e6 / np.log(d[m2])),
                ndigits=0,
                round_mode="half_towards_infinity",
            )
        )
        S = (A * q) @ A       # sum of center weights per (u, v) path
        C = A @ A             # common-neighbor counts
        iu, ju = np.triu_indices(n, 1)
        keep = (C[iu, ju] > 0) & (A[iu, ju] == 0)
        iu, ju = iu[keep], ju[keep]
        aa = S[iu, ju].astype(np.int64)
        nc = C[iu, ju].astype(np.int64)
        order = np.lexsort((ju, iu, -aa))[:k]
        return rd.from_arrow(
            pa.table(
                {
                    "node_a": pa.array([nodes[i] for i in iu[order]],
                                       node_type),
                    "node_b": pa.array([nodes[j] for j in ju[order]],
                                       node_type),
                    "n_common": pa.array(nc[order], pa.int64()),
                    "aa_micro": pa.array(aa[order], pa.int64()),
                }
            )
        )

    # distributed route: weights for degree>=2 centers (one ln per node)
    def weights(b: pa.Table) -> pa.Table:
        bb = b.filter(pc.greater_equal(b["count()"], 2))
        qv = pc.cast(
            pc.round(
                pc.divide(
                    1e6,
                    pc.ln(pc.cast(bb["count()"], pa.float64())),
                ),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({"center": bb["node"], "q": qv})

    qds = deg.map_batches(weights, batch_format="pyarrow").repartition(P)

    def symmetrize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "center": pa.chunked_array(
                    list(b["a"].chunks) + list(b["b"].chunks),
                    type=b["a"].type,
                ),
                "nbr": pa.chunked_array(
                    list(b["b"].chunks) + list(b["a"].chunks),
                    type=b["a"].type,
                ),
            }
        )

    sym = (
        edges.map_batches(symmetrize, batch_format="pyarrow")
        .repartition(P)
        .join(qds, join_type="inner", num_partitions=P, on=("center",))
        .materialize()
    )

    def as_side(nbr_out: str, with_q: bool):
        cols = ["center", nbr_out] + (["q"] if with_q else [])

        def f(b: pa.Table, o=nbr_out, wq=with_q) -> pa.Table:
            out = {"center": b["center"], o: b["nbr"]}
            if wq:
                out["q"] = b["q"]
            return pa.table(out)

        return sym.map_batches(f, batch_format="pyarrow")

    wedges = (
        as_side("u", with_q=True)
        .join(as_side("v", with_q=False), join_type="inner",
              num_partitions=P, on=("center",))
        .map_batches(
            lambda b: b.filter(pc.less(b["u"], b["v"])).select(
                ["u", "v", "q"]
            ),
            batch_format="pyarrow",
        )
    )
    from ray.data.aggregate import Count, Sum

    sc = (
        wedges.groupby(["u", "v"])
        .aggregate(Count(alias_name="n_common"), Sum("q"))
        .map_batches(
            lambda b: pa.table(
                {
                    "u": b["u"],
                    "v": b["v"],
                    "n_common": pc.cast(b["n_common"], pa.int64()),
                    "aa_micro": pc.cast(b["sum(q)"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(P)
        .materialize()
    )
    if sc.count() == 0:
        return rd.from_arrow(empty)
    # drop adjacent pairs: edges are (a<b), wedge pairs are (u<v) —
    # same orientation, one composite left_anti
    pair_key = lambda t, x, y: t.map_batches(
        lambda b, xx=x, yy=y: b.append_column(
            "_pk",
            pc.binary_join_element_wise(
                pc.cast(b[xx], pa.string()), pc.cast(b[yy], pa.string()),
                "\x1f",
            ),
        ),
        batch_format="pyarrow",
    )
    ek = pair_key(edges, "a", "b").map_batches(
        lambda b: b.select(["_pk"]), batch_format="pyarrow"
    ).repartition(P)
    nonadj = (
        pair_key(sc, "u", "v")
        .repartition(P)
        .join(ek, join_type="left_anti", num_partitions=P, on=("_pk",))
        .map_batches(
            lambda b: pa.table(
                {
                    "node_a": b["u"],
                    "node_b": b["v"],
                    "n_common": b["n_common"],
                    "aa_micro": b["aa_micro"],
                }
            ),
            batch_format="pyarrow",
        )
    )
    return nonadj.sort(
        ["aa_micro", "node_a", "node_b"], descending=[True, False, False]
    ).limit(k)


def clustering_coefficients(edges_ds, src_col: str, dst_col: str,
                            num_partitions: int = _DEFAULT_PARTITIONS):
    """Per-node local clustering coefficient ``cc = 2*tri / (d*(d-1))``
    over the undirected simple graph — the standard
    how-clique-like-is-this-neighborhood metric, composed from
    :func:`triangle_counts` and the endpoint-explode degree aggregate
    (both already hub-safe). Nodes with degree < 2 are excluded (cc
    undefined); nodes in no triangle report 0.

    Returns ``(node, degree, n_triangles, cc_micro)`` with
    ``cc_micro = round(2e6 * tri / (d*(d-1)), 0)`` — exact integers
    into ONE float division + zero-digit round, identical in SQL."""
    P = _clamp_partitions(num_partitions)
    node_type = edges_ds.schema().base_schema.field(src_col).type
    edges = _normalized_edges(edges_ds, src_col, dst_col).materialize()
    empty = pa.table(
        {
            "node": pa.array([], node_type),
            "degree": pa.array([], pa.int64()),
            "n_triangles": pa.array([], pa.int64()),
            "cc_micro": pa.array([], pa.int64()),
        }
    )
    if edges.count() == 0:
        return rd.from_arrow(empty)

    deg = (
        _explode_endpoints(edges)
        .groupby("node")
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "degree": pc.cast(b["count()"], pa.int64()),
                }
            ).filter(pc.greater_equal(pc.field("degree"), 2)),
            batch_format="pyarrow",
        )
        .repartition(P)
        .materialize()
    )
    tri = triangle_counts(
        edges, "a", "b", num_partitions=P, pre_normalized=True
    ).repartition(P).materialize()
    if tri.count() == 0:
        joined = deg.map_batches(
            lambda b: b.append_column(
                "n_triangles", pa.array([0] * len(b), pa.int64())
            ),
            batch_format="pyarrow",
        )
    else:
        joined = deg.join(
            tri,
            "left_outer",
            num_partitions=P,
            on=("node",),
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "degree": b["degree"],
                    "n_triangles": pc.fill_null(
                        pc.cast(b["n_triangles"], pa.int64()), 0
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    def score(b: pa.Table) -> pa.Table:
        d = pc.cast(b["degree"], pa.float64())
        t = pc.cast(b["n_triangles"], pa.float64())
        cc = pc.cast(
            pc.round(
                pc.divide(
                    pc.multiply(t, 2e6),
                    pc.multiply(d, pc.subtract(d, 1.0)),
                ),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return b.append_column("cc_micro", cc)

    return joined.map_batches(score, batch_format="pyarrow").sort(
        ["cc_micro", "node"], descending=[True, False]
    )


def degree_assortativity(edges_ds, src_col: str, dst_col: str,
                         num_partitions: int = _DEFAULT_PARTITIONS,
                         small_edge_cutoff: int = 200_000):
    """Degree assortativity of the undirected simple graph — do hubs
    link to hubs (r > 0) or to leaves (r < 0)? (Newman 2002, "Mixing
    patterns in networks".) The single most-quoted global mixing
    diagnostic for a built knowledge graph.

    Over the symmetrized edge-endpoint degree pairs (x, y) — each
    undirected edge contributes both (deg u, deg v) and (deg v, deg u),
    which makes the two marginals identical — Pearson's r collapses to
    the PURE RATIONAL ``(n*sxy - sx*sx) / (n*sxx - sx*sx)`` (no sqrt:
    the two marginal variances are the same term), so the result is
    exact integer arithmetic into ONE double division + zero-digit
    round, bit-replayable in SQL.

    Shape: degree table via the endpoint-explode groupby, two hash
    joins to attach endpoint degrees, then per-batch int64 moment
    partials (n, sx, sxy, sxx) — only batch-count rows reach the
    driver, combined in arbitrary-precision Python ints (the moments
    exceed int64 long before the data stops fitting a cluster). Below
    ``small_edge_cutoff`` normalized edges a driver numpy pass computes
    the identical moments (the kcore/label-prop small-graph precedent —
    two hash joins on a hundreds-of-nodes KG cost seconds of fixed
    overhead); tests force both paths.

    Returns one row ``(n_pairs, r_micro)`` — ``r_micro = round(1e6 *
    num / den, 0)`` as int64, NULL when den == 0 (regular graph);
    zero rows on an empty graph.
    """
    import numpy as np
    P = _clamp_partitions(num_partitions)
    edges = _normalized_edges(edges_ds, src_col, dst_col).materialize()
    empty = pa.table(
        {
            "n_pairs": pa.array([], pa.int64()),
            "r_micro": pa.array([], pa.int64()),
        }
    )
    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(empty)

    if n_edges <= small_edge_cutoff:
        # identical moments, one driver numpy pass: degrees by
        # factorize+bincount, symmetrized sums. int64 is safe here —
        # at <=2e5 edges deg<=4e5, so sxx <= (4e5)^2 * 4e5 ~ 6.4e16.
        tbl = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow"))
        )
        a = tbl["a"].to_numpy(zero_copy_only=False)
        b_ = tbl["b"].to_numpy(zero_copy_only=False)
        _, inv = np.unique(np.concatenate([a, b_]), return_inverse=True)
        deg_all = np.bincount(inv).astype(np.int64)
        x = deg_all[inv[: len(a)]]
        y = deg_all[inv[len(a):]]
        n = 2 * len(x)
        sx = int((x + y).sum())
        sxy = 2 * int((x * y).sum())
        sxx = int((x * x).sum() + (y * y).sum())
        return _assortativity_result(n, sx, sxy, sxx)

    deg = (
        _explode_endpoints(edges)
        .groupby("node")
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "d": pc.cast(b["count()"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(P)
        .materialize()
    )
    joined = (
        edges.repartition(P)
        .join(
            deg.map_batches(
                lambda b: b.rename_columns(["node", "dx"]),
                batch_format="pyarrow",
            ),
            join_type="inner", num_partitions=P,
            on=("a",), right_on=("node",),
        )
        .repartition(P)
        .join(
            deg.map_batches(
                lambda b: b.rename_columns(["node", "dy"]),
                batch_format="pyarrow",
            ),
            join_type="inner", num_partitions=P,
            on=("b",), right_on=("node",),
        )
    )

    def moments(b: pa.Table) -> pa.Table:
        import numpy as np

        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        x = b["dx"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["dy"].to_numpy(zero_copy_only=False).astype(np.int64)
        # symmetrized: each edge as (x,y) AND (y,x)
        return pa.table(
            {
                "n": pa.array([2 * len(x)], pa.int64()),
                "sx": pa.array([int((x + y).sum())], pa.int64()),
                "sxy": pa.array([2 * int((x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum() + (y * y).sum())],
                                pa.int64()),
            }
        )

    parts = joined.map_batches(moments, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    sx = sum(int(r["sx"]) for r in parts)
    sxy = sum(int(r["sxy"]) for r in parts)
    sxx = sum(int(r["sxx"]) for r in parts)
    return _assortativity_result(n, sx, sxy, sxx)


def _assortativity_result(n: int, sx: int, sxy: int, sxx: int):
    """Exact-integer moments -> the one-row (n_pairs, r_micro) table —
    shared by degree_assortativity's driver and distributed paths so
    both are bit-identical."""
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    if den == 0:
        r_micro = pa.array([None], pa.int64())
    else:
        # ONE double multiply + ONE divide + zero-digit round — the
        # same IEEE ops as SQL round(CAST(num AS DOUBLE)*1e6/CAST(den
        # AS DOUBLE), 0)
        r_micro = pc.cast(
            pc.round(
                pa.array([float(num) * 1e6 / float(den)]),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
    return rd.from_arrow(
        pa.table({"n_pairs": pa.array([n], pa.int64()),
                  "r_micro": r_micro})
    )


def _modularity_local(edges_mat, membership_mat, m: int,
                      empty: pa.Table):
    """Driver pyarrow pass over a small materialized (a, b) edge list +
    (node, comm) membership — exactly the distributed decomposition's
    semantics (index_in community tagging with null-drop inner-join
    behavior, count/sum aggregates, (contrib desc, community) order),
    so both paths are bit-identical."""
    et = pa.concat_tables(
        list(edges_mat.iter_batches(batch_format="pyarrow"))
    ).combine_chunks()
    mt = pa.concat_tables(
        list(membership_mat.iter_batches(batch_format="pyarrow"))
    ).combine_chunks()
    nodes_arr = mt["node"].combine_chunks()
    comm_arr = mt["comm"].combine_chunks()

    ca = comm_arr.take(pc.index_in(et["a"], value_set=nodes_arr))
    cb = comm_arr.take(pc.index_in(et["b"], value_set=nodes_arr))
    # intra edges per community (null ca/cb -> null equal -> dropped,
    # matching the distributed filter)
    pairs = pa.table({"ca": ca, "cb": cb})
    intra_agg = (
        pairs.filter(pc.equal(pairs["ca"], pairs["cb"]))
        .select(["ca"])
        .group_by(["ca"])
        .aggregate([([], "count_all")])
        .rename_columns(["comm", "intra_edges"])
    )

    # community degree sums over non-isolated nodes (membership misses
    # dropped = inner-join semantics)
    ep = pa.table(
        {"node": pa.concat_arrays(et["a"].chunks + et["b"].chunks)}
    )
    degt = ep.group_by(["node"]).aggregate([([], "count_all")])
    dt = pa.table(
        {
            "comm": comm_arr.take(
                pc.index_in(degt["node"], value_set=nodes_arr)
            ),
            "d": pc.cast(degt["count_all"], pa.int64()),
        }
    )
    dt = dt.filter(pc.is_valid(dt["comm"]))
    dsum_t = (
        dt.group_by(["comm"])
        .aggregate([("d", "sum")])
        .rename_columns(["comm", "degree_sum"])
    )
    if dsum_t.num_rows == 0:
        return rd.from_arrow(empty)

    if intra_agg.num_rows == 0:
        e_c = pa.array([0] * dsum_t.num_rows, pa.int64())
    else:
        idx = pc.index_in(
            dsum_t["comm"], value_set=intra_agg["comm"].combine_chunks()
        )
        e_c = pc.fill_null(
            pc.cast(
                intra_agg["intra_edges"].combine_chunks().take(idx),
                pa.int64(),
            ),
            0,
        )
    d_c = pc.cast(dsum_t["degree_sum"], pa.int64())
    contrib = pc.subtract(
        pc.multiply(pa.scalar(4 * m, pa.int64()), e_c),
        pc.multiply(d_c, d_c),
    )
    out = pa.table(
        {
            "community": dsum_t["comm"],
            "intra_edges": e_c,
            "degree_sum": d_c,
            "contrib_num": contrib,
        }
    )
    order = pc.sort_indices(
        out,
        sort_keys=[("contrib_num", "descending"),
                   ("community", "ascending")],
    )
    return rd.from_arrow(out.take(order).combine_chunks())


def partition_modularity(edges_ds, membership_ds, src_col: str,
                         dst_col: str, node_col: str, comm_col: str,
                         num_partitions: int = _DEFAULT_PARTITIONS,
                         broadcast_limit: int = 500_000,
                         small_edge_cutoff: int = 200_000):
    """Per-community modularity decomposition of a node partition over
    the undirected simple graph — the objective Louvain/Leiden optimize
    (Newman & Girvan 2004), evaluated EXACTLY: with m edges, e_c
    intra-community edges and d_c the community degree sum, community
    c's modularity contribution is ``e_c/m - (d_c/2m)^2``; scaled by
    4m^2 it is the INTEGER ``4m*e_c - d_c^2``. Global Q =
    sum(contrib_num) / (4m^2) — both engines compare pure int64 rows,
    no float anywhere.

    Shape: membership (node -> community) attaches to edge endpoints
    via ray.put-broadcast dictionary lookup below ``broadcast_limit``
    memberships (one streaming pass, groupby moves community-cardinality
    partials only) or two distributed hash joins past it (tests force
    both paths); degree sums ride the endpoint-explode groupby. The
    partition is restricted to non-isolated nodes (degree 0 contributes
    nothing to either term). Below ``small_edge_cutoff`` normalized
    edges (when the membership also fits the broadcast budget) the
    whole decomposition runs as one driver pyarrow pass — the
    kcore/assortativity small-KG precedent; tests force every path.
    Returns ``(community, intra_edges, degree_sum, contrib_num)``
    ordered by (contrib_num desc, community).
    """
    import ray

    P = _clamp_partitions(num_partitions)
    edges = _normalized_edges(edges_ds, src_col, dst_col).materialize()
    comm_type = membership_ds.schema().base_schema.field(comm_col).type
    empty = pa.table(
        {
            "community": pa.array([], comm_type),
            "intra_edges": pa.array([], pa.int64()),
            "degree_sum": pa.array([], pa.int64()),
            "contrib_num": pa.array([], pa.int64()),
        }
    )
    m = edges.count()
    if m == 0:
        return rd.from_arrow(empty)

    membership = membership_ds.map_batches(
        lambda b: pa.table({"node": b[node_col], "comm": b[comm_col]}),
        batch_format="pyarrow",
    ).materialize()
    n_members = membership.count()

    if m <= small_edge_cutoff and n_members <= broadcast_limit:
        return _modularity_local(edges, membership, m, empty)

    membership = membership.repartition(P).materialize()

    from ray.data.aggregate import Sum

    if n_members <= broadcast_limit:
        # broadcast fast path: vectorized index_in + take against the
        # ray.put membership arrays — the exchange moves per-batch
        # per-community partials only
        mt = pa.concat_tables(
            list(membership.iter_batches(batch_format="pyarrow"))
        ).combine_chunks()
        ref = ray.put((mt["node"].combine_chunks(),
                       mt["comm"].combine_chunks()))

        def _resolve(r):
            return r if isinstance(r, tuple) else ray.get(r)

        def _map_comm(col, nodes_arr, comm_arr):
            return comm_arr.take(pc.index_in(col, value_set=nodes_arr))

        def tag(b: pa.Table, _ref=ref) -> pa.Table:
            from ..stages.chunking import pin_arrow_threads

            pin_arrow_threads()
            nodes_arr, comm_arr = _resolve(_ref)
            return pa.table(
                {
                    "ca": _map_comm(b["a"], nodes_arr, comm_arr),
                    "cb": _map_comm(b["b"], nodes_arr, comm_arr),
                }
            )

        tagged = edges.map_batches(tag, batch_format="pyarrow")
    else:
        tagged = (
            edges.repartition(P)
            .join(
                membership.map_batches(
                    lambda b: b.rename_columns(["node", "ca"]),
                    batch_format="pyarrow",
                ),
                join_type="inner", num_partitions=P,
                on=("a",), right_on=("node",),
            )
            .repartition(P)
            .join(
                membership.map_batches(
                    lambda b: b.rename_columns(["node", "cb"]),
                    batch_format="pyarrow",
                ),
                join_type="inner", num_partitions=P,
                on=("b",), right_on=("node",),
            )
            .map_batches(
                lambda b: b.select(["ca", "cb"]),
                batch_format="pyarrow",
            )
        )

    def intra_partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b["ca"], b["cb"]))
        return (
            t.select(["ca"])
            .group_by(["ca"])
            .aggregate([([], "count_all")])
            .rename_columns(["comm", "e_part"])
        )

    intra = (
        tagged.map_batches(intra_partial, batch_format="pyarrow")
        .groupby("comm")
        .aggregate(Sum("e_part", alias_name="intra_edges"))
        .repartition(P)
        .materialize()
    )

    # community degree sums over non-isolated nodes
    deg = (
        _explode_endpoints(edges)
        .groupby("node")
        .count()
    )
    if n_members <= broadcast_limit:
        def deg_tag(b: pa.Table, _ref=ref) -> pa.Table:
            nodes_arr, comm_arr = _resolve(_ref)
            t = pa.table(
                {
                    "comm": _map_comm(b["node"], nodes_arr, comm_arr),
                    "d": pc.cast(b["count()"], pa.int64()),
                }
            )
            # membership misses -> null comm; drop them to match the
            # join fallback's inner-join semantics
            return t.filter(pc.is_valid(t["comm"]))

        deg_comm = deg.map_batches(deg_tag, batch_format="pyarrow")
    else:
        deg_comm = (
            deg.map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"],
                        "d": pc.cast(b["count()"], pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
            .repartition(P)
            .join(membership, join_type="inner", num_partitions=P,
                  on=("node",))
            .map_batches(lambda b: b.select(["comm", "d"]),
                         batch_format="pyarrow")
        )
    dsum = (
        deg_comm.groupby("comm")
        .aggregate(Sum("d", alias_name="degree_sum"))
        .repartition(P)
        .materialize()
    )
    if dsum.count() == 0:
        return rd.from_arrow(empty)

    if intra.count() == 0:
        joined = dsum.map_batches(
            lambda b: b.append_column(
                "intra_edges", pa.array([0] * len(b), pa.int64())
            ),
            batch_format="pyarrow",
        )
    else:
        joined = dsum.join(
            intra, join_type="left_outer", num_partitions=P,
            on=("comm",),
        )

    def finalize(b: pa.Table, _m=m) -> pa.Table:
        e_c = pc.fill_null(pc.cast(b["intra_edges"], pa.int64()), 0)
        d_c = pc.cast(b["degree_sum"], pa.int64())
        contrib = pc.subtract(
            pc.multiply(pa.scalar(4 * _m, pa.int64()), e_c),
            pc.multiply(d_c, d_c),
        )
        return pa.table(
            {
                "community": b["comm"],
                "intra_edges": e_c,
                "degree_sum": d_c,
                "contrib_num": contrib,
            }
        )

    return joined.map_batches(finalize, batch_format="pyarrow").sort(
        ["contrib_num", "community"], descending=[True, False]
    )


def harmonic_centrality_seeds(edges_ds, src_col: str, dst_col: str,
                              n_seeds: int = 3, max_hops: int = 4,
                              num_partitions: int = _DEFAULT_PARTITIONS,
                              small_edge_cutoff: int = 200_000):
    """Sampled-seed harmonic centrality (Boldi & Vigna 2014 "Axioms
    for centrality"): for each of the ``n_seeds`` top-degree nodes
    (ties -> smallest name, the bfs_layers/kg_ppr seed contract),
    ``harmonic_micro = sum over nodes within max_hops of
    1_000_000 // hop`` plus the reached-node count — the exact-integer
    closeness diagnostic for the graph's hubs (full harmonic
    centrality over every node is O(V·E); seeding at the hubs is the
    standard sampled estimate and what the dashboard actually wants).

    Shape: one normalize + one degree groupby pick the seeds; each
    seed runs the shared min-hop BFS (numpy sweep below
    ``small_edge_cutoff`` normalized edges, else the
    frontier-expansion join rounds of :func:`bfs_layers` — per round
    the shuffle moves frontier-adjacent edges only). Per-seed output
    is two scalars (model state); hop distances divide 1e6 with FLOOR
    division, so the whole statistic is int64-exact in both engines.

    Returns ``(seed, n_reached, harmonic_micro)`` sorted by seed;
    ``n_reached`` excludes the seed itself.
    """
    import numpy as np

    if max_hops < 1 or n_seeds < 1:
        raise ValueError("max_hops and n_seeds must be >= 1")
    P = _clamp_partitions(num_partitions)
    edges = _normalized_edges(edges_ds, src_col, dst_col).materialize()
    node_type = edges_ds.schema().base_schema.field(src_col).type
    out_schema = pa.schema(
        [pa.field("seed", node_type), pa.field("n_reached", pa.int64()),
         pa.field("harmonic_micro", pa.int64())]
    )
    if edges.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    deg = _explode_endpoints(edges).groupby("node").count()
    seeds = sorted(
        r["node"]
        for r in deg.sort(["count()", "node"], descending=[True, False])
        .limit(n_seeds)
        .take_all()
    )

    if edges.count() <= small_edge_cutoff:
        tbl = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow"))
        )
        a = tbl["a"].to_numpy(zero_copy_only=False)
        b = tbl["b"].to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(np.concatenate([a, b]),
                               return_inverse=True)
        ea, eb = inv[: len(a)], inv[len(a):]
        rows = []
        for seed in seeds:
            s_idx = int(np.searchsorted(nodes, seed))
            hop = _np_bfs_hops(len(nodes), ea, eb, s_idx, max_hops)
            m = hop > 0
            rows.append(
                (seed, int(m.sum()), int((1_000_000 // hop[m]).sum()))
            )
    else:
        rows = []
        for seed in seeds:
            lay = _bfs_dist(edges, seed, max_hops, node_type, P)

            def hpart(batch: pa.Table) -> pa.Table:
                from ..stages.chunking import pin_arrow_threads

                pin_arrow_threads()
                hop = batch["hop"].to_numpy(zero_copy_only=False)
                mm = hop > 0
                return pa.table(
                    {
                        "n": pa.array([int(mm.sum())], pa.int64()),
                        "s": pa.array(
                            [int((1_000_000 // hop[mm]).sum())],
                            pa.int64(),
                        ),
                    }
                )

            tot = lay.map_batches(
                hpart, batch_format="pyarrow"
            ).sum(["n", "s"])
            rows.append((seed, int(tot["sum(n)"]), int(tot["sum(s)"])))

    return rd.from_arrow(
        pa.table(
            {
                "seed": pa.array([r[0] for r in rows], node_type),
                "n_reached": pa.array([r[1] for r in rows], pa.int64()),
                "harmonic_micro": pa.array(
                    [r[2] for r in rows], pa.int64()
                ),
            }
        )
    )


def mutual_nn_pairs(knn_ds, id_col: str, nbr_col: str, score_col: str,
                    rank_col: str = "rnk"):
    """Reciprocal best matches from a kNN table: pairs (a, b) where b
    is a's rank-1 neighbor AND a is b's — the mutual-nearest-neighbor
    filter used for high-precision alignment/dedup candidates
    (``a < b`` once per pair, the shared score carried through).

    Each rank-1 row ships as its sorted pair packed into ONE int64
    key (ids must fit 31 bits — loud guard), so the mutuality test is
    a packed-key groupby counting 2 — the wide-key lesson: never
    sort-shuffle an (id, id) composite. Output bounded by node count.
    Returns ``(id_a, id_b, {score_col})`` sorted by (id_a, id_b)."""
    import ray.data as rd

    def pack(b: pa.Table) -> pa.Table:
        import numpy as np

        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        b = b.filter(pc.equal(b[rank_col], 1))
        u = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b[nbr_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(u) and (u.min() < 0 or v.min() < 0
                       or max(u.max(), v.max()) >= 1 << 31):
            raise ValueError("ids must fit 31 bits for pair packing")
        lo, hi = np.minimum(u, v), np.maximum(u, v)
        return pa.table({
            "key": pa.array(lo * (1 << 31) + hi, pa.int64()),
            "s": pc.cast(b[score_col], pa.float64()),
        })

    from ray.data.aggregate import Count, Max

    agg = (
        knn_ds.map_batches(pack, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Count(alias_name="c"), Max("s", alias_name="s"))
    )

    def unpack(b: pa.Table) -> pa.Table:
        import numpy as np

        b = b.filter(pc.equal(b["c"], 2))
        key = b["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "id_a": pa.array(key >> 31, pa.int64()),
            "id_b": pa.array(key & ((1 << 31) - 1), pa.int64()),
            "score": pc.cast(b["s"], pa.float64()),
        })

    out = agg.map_batches(unpack, batch_format="pyarrow")
    if score_col != "score":
        out = out.map_batches(
            lambda b: b.rename_columns(["id_a", "id_b", score_col]),
            batch_format="pyarrow",
        )
    return out.sort(["id_a", "id_b"])


def rich_club_profile(edges_ds, src_col: str, dst_col: str,
                      thresholds: tuple = (1, 2, 4, 8, 16),
                      broadcast_nodes_below: int = 10_000_000):
    """Rich-club profile (Zhou & Mondragón 2004) of the UNDIRECTED
    multigraph: for each degree threshold k, how densely the
    degree->k "club" interconnects — φ(k) = 2·E_club / (n·(n−1)) with
    E_club the number of edges whose BOTH endpoints have degree > k.
    A high-φ tail means hubs preferentially wire to hubs (the KG's
    celebrity cluster); random graphs decay. Returns ``(k, n_club,
    e_club, phi_micro)`` for thresholds with n_club ≥ 2, sorted by k.

    Shape: one degree groupby; the degree table broadcasts below the
    budget (sorted ids + searchsorted membership per edge batch —
    counting E_club for ALL thresholds in one pass over the edge
    list); above it, a loud ValueError points at the join path
    (counting by threshold via edges⋈deg twice). φ is exact-int until
    ONE double division + multiply + zero-digit round per threshold.
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    def sym(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        a, b = batch[src_col], batch[dst_col]
        return pa.concat_tables([
            pa.table({"src": a, "dst": b}),
            pa.table({"src": b, "dst": a}),
        ]).combine_chunks()

    edges = edges_ds.map_batches(sym, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(pa.schema([
            ("k", pa.int64()), ("n_club", pa.int64()),
            ("e_club", pa.int64()), ("phi_micro", pa.int64()),
        ]).empty_table())
    deg = edges.groupby("src").count().materialize()
    n_nodes = deg.count()
    if n_nodes > broadcast_nodes_below:
        raise ValueError(
            "rich_club_profile: degree table exceeds the broadcast "
            "budget — use a per-threshold edges⋈degree join instead"
        )
    pdf = deg.to_pandas()
    ids = pdf["src"].to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    d = pdf["count()"].to_numpy(np.int64)[order]
    ref = ray.put((ids, d))
    ks = sorted(thresholds)

    def club_partial(batch: pa.Table, _ref=ref) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ids_s, dv = ray.get(_ref)
        sd = dv[np.searchsorted(ids_s, batch["src"].to_numpy(
            zero_copy_only=False))]
        dd = dv[np.searchsorted(ids_s, batch["dst"].to_numpy(
            zero_copy_only=False))]
        m = np.minimum(sd, dd)
        counts = [int((m > k).sum()) for k in ks]
        return pa.table({
            "k": pa.array(ks, pa.int64()),
            "e2": pa.array(counts, pa.int64()),  # both directions
        })

    e2 = (
        edges.map_batches(club_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("e2", alias_name="e2"))
        .to_pandas()
    )
    e2m = dict(zip(e2["k"].astype(int), e2["e2"].astype(int)))
    rows = []
    for k in ks:
        n_club = int((d > k).sum())
        if n_club < 2:
            continue
        e_club = e2m.get(k, 0) // 2  # sym counted each edge twice
        raw = 1e6 * (float(2 * e_club) / float(n_club * (n_club - 1)))
        phi = pc.cast(
            pc.round(pa.array([raw], pa.float64()), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )[0].as_py()
        rows.append((k, n_club, e_club, phi))
    return rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "n_club": pa.array([r[1] for r in rows], pa.int64()),
        "e_club": pa.array([r[2] for r in rows], pa.int64()),
        "phi_micro": pa.array([r[3] for r in rows], pa.int64()),
    }))


def degree_histogram(edges_ds, src_col: str, dst_col: str):
    """Log2-bucketed degree distribution of the UNDIRECTED multigraph
    — the first chart anyone draws of a graph: ``(bucket,
    min_degree, n_nodes)`` where bucket = floor(log2(degree)) via
    pure integer bit-length (no float log). One degree groupby, one
    bucket-cardinality combine."""
    from ray.data.aggregate import Sum

    def sym(batch: pa.Table) -> pa.Table:
        a, b = batch[src_col], batch[dst_col]
        return pa.concat_tables([
            pa.table({"src": a}), pa.table({"src": b}),
        ]).combine_chunks()

    deg = (
        edges_ds.map_batches(sym, batch_format="pyarrow")
        .groupby("src")
        .count()
    )

    def bucketize(b: pa.Table) -> pa.Table:
        import numpy as np

        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        d = pc.cast(b["count()"], pa.int64()).to_numpy(
            zero_copy_only=False)
        # floor(log2(d)) as bit_length - 1 — exact integers
        bucket = np.frompyfunc(lambda v: int(v).bit_length() - 1,
                               1, 1)(d).astype(np.int64)
        u, c = np.unique(bucket, return_counts=True)
        return pa.table({
            "bucket": pa.array(u, pa.int64()),
            "n": pa.array(c, pa.int64()),
        })

    hist = (
        deg.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n_nodes"))
    )
    return hist.map_batches(
        lambda b: pa.table({
            "bucket": pc.cast(b["bucket"], pa.int64()),
            "min_degree": pc.cast(
                pc.shift_left(pa.array([1] * len(b), pa.int64()),
                              pc.cast(b["bucket"], pa.int64())),
                pa.int64()),
            "n_nodes": pc.cast(b["n_nodes"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("bucket")


def partition_conductance(edges_ds, membership_ds, src_col: str,
                          dst_col: str, node_col: str, comm_col: str,
                          **mod_kwargs):
    """Per-community CONDUCTANCE of a node partition — φ_c =
    cut_c / min(vol_c, 2m − vol_c), the bottleneck quality metric
    complementing :func:`partition_modularity` (modularity rewards
    density, conductance exposes leaky boundaries). Everything
    derives EXACTLY from the modularity decomposition's integers:
    ``cut_c = degree_sum_c − 2·intra_c`` and ``2m = Σ degree_sum`` —
    no new distributed pass at all; the community-cardinality driver
    sweep does one double division + zero-digit round per community
    (φ = 0 when the denominator is 0, i.e. the partition is one
    community). Returns ``(community, cut_edges, degree_sum,
    phi_micro)`` sorted by community.
    """
    mod = partition_modularity(
        edges_ds, membership_ds, src_col, dst_col, node_col, comm_col,
        **mod_kwargs,
    ).to_pandas()
    import numpy as np
    import pandas as pd

    if mod.empty:
        return pd.DataFrame({
            "community": pd.Series([], dtype="int64"),
            "cut_edges": pd.Series([], dtype="int64"),
            "degree_sum": pd.Series([], dtype="int64"),
            "phi_micro": pd.Series([], dtype="int64"),
        })
    vol = mod["degree_sum"].to_numpy(np.int64)
    intra = mod["intra_edges"].to_numpy(np.int64)
    cut = vol - 2 * intra
    two_m = int(vol.sum())
    denom = np.minimum(vol, two_m - vol)
    raw = [
        1e6 * (float(int(c)) / float(int(dn))) if dn > 0 else 0.0
        for c, dn in zip(cut.tolist(), denom.tolist())
    ]
    phi = pc.cast(
        pc.round(pa.array(raw, pa.float64()), ndigits=0,
                 round_mode="half_towards_infinity"),
        pa.int64(),
    ).to_numpy(zero_copy_only=False)
    out = pd.DataFrame({
        "community": mod["community"].to_numpy(),
        "cut_edges": cut,
        "degree_sum": vol,
        "phi_micro": phi,
    }).sort_values("community").reset_index(drop=True)
    return out


def edge_reciprocity(edges_ds, src_col: str, dst_col: str):
    """Reciprocity of the DIRECTED simple graph: the share of
    distinct directed edges whose reverse also exists — how mutual
    the KG's subject→object relations are (citation graphs ~0, social
    graphs high). Self-loops are excluded (trivially reciprocal).
    Returns ONE row ``(n_edges, n_reciprocal, reciprocity_micro)``.

    Shape: per-batch distinct (a, b) cells; ONE canonical-pair
    groupby — key (min, max), per-row direction flags OR-combined —
    then the scalar sweep; a pair counts 2 reciprocal edges when both
    flags survive. Exact ints + one division.
    """
    from ray.data.aggregate import Max

    def cells(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.and_(pc.is_valid(b[src_col]), pc.is_valid(b[dst_col])),
            pc.not_equal(b[src_col], b[dst_col]),
        )
        t = b.filter(keep)
        a = pc.cast(t[src_col], pa.string())
        d = pc.cast(t[dst_col], pa.string())
        lo = pc.min_element_wise(a, d)
        hi = pc.max_element_wise(a, d)
        fwd = pc.cast(pc.equal(a, lo), pa.int64())  # edge goes lo->hi
        rev = pc.cast(pc.equal(a, hi), pa.int64())  # edge goes hi->lo
        cell = pa.table({"lo": lo, "hi": hi, "f": fwd, "r": rev})
        return (
            cell.group_by(["lo", "hi"])
            .aggregate([("f", "max"), ("r", "max")])
            .rename_columns(["lo", "hi", "f", "r"])
        )

    agg = (
        edges_ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["lo", "hi"])
        .aggregate(Max("f", alias_name="f"), Max("r", alias_name="r"))
    )

    def sweep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        f = pc.cast(b["f"], pa.int64()).to_numpy(zero_copy_only=False)
        r = pc.cast(b["r"], pa.int64()).to_numpy(zero_copy_only=False)
        n_edges = int(f.sum() + r.sum())
        n_recip = int(2 * ((f == 1) & (r == 1)).sum())
        return pa.table({
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_reciprocal": pa.array([n_recip], pa.int64()),
        })

    from ray.data.aggregate import Sum

    tot = (
        agg.map_batches(sweep, batch_format="pyarrow")
        .aggregate(Sum("n_edges", alias_name="e"),
                   Sum("n_reciprocal", alias_name="rr"))
    )
    import pandas as pd

    e = int(tot["e"] or 0)
    rr = int(tot["rr"] or 0)
    if e == 0:
        micro = 0
    else:
        raw = 1e6 * (float(rr) / float(e))
        micro = pc.cast(
            pc.round(pa.array([raw], pa.float64()), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )[0].as_py()
    return pd.DataFrame({
        "n_edges": [e], "n_reciprocal": [rr],
        "reciprocity_micro": [micro],
    }).astype("int64")


def diameter_double_sweep(edges_ds, src_col: str, dst_col: str,
                          max_hops: int = 16,
                          num_partitions: int = _DEFAULT_PARTITIONS,
                          small_edge_cutoff: int = 200_000):
    """Double-sweep BFS diameter estimate (Magnien–Latapy–Habib 2009
    lower bound) over the undirected simple graph: BFS from the
    deterministic max-degree seed (ties -> smallest name), re-seed at
    the farthest reached node (max hop, ties -> smallest name), BFS
    again, and return the SECOND sweep's layer histogram
    ``(hop, n_nodes)`` sorted by hop — its max hop is the classic
    diameter lower bound, and the layer profile shows the graph's
    depth structure at a glance.

    Both sweeps bound at ``max_hops`` (identically replayed by the
    recursive-CTE oracle). Below ``small_edge_cutoff`` normalized
    edges the whole graph is driver model state and two numpy sweeps
    replace ~2·max_hops rounds of join fixed costs (the
    bfs_layers/kcore dense-path precedent); above it both sweeps run
    the shared distributed frontier loop (:func:`_bfs_dist`), whose
    per-round shuffle touches frontier-adjacent edges only. Force the
    distributed path in tests with small_edge_cutoff=0."""
    import numpy as np

    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    P = _clamp_partitions(num_partitions)
    edges = _normalized_edges(edges_ds, src_col, dst_col).materialize()
    node_type = edges_ds.schema().base_schema.field(src_col).type
    out_schema = pa.schema(
        [pa.field("hop", pa.int64()), pa.field("n_nodes", pa.int64())]
    )
    if edges.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    if edges.count() <= small_edge_cutoff:
        tbl = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow"))
        )
        a = tbl["a"].to_numpy(zero_copy_only=False)
        b = tbl["b"].to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(
            np.concatenate([a, b]), return_inverse=True
        )
        ea, eb = inv[: len(a)], inv[len(a):]
        deg = np.bincount(ea, minlength=len(nodes)) + np.bincount(
            eb, minlength=len(nodes)
        )
        # nodes sorted ascending; argmax takes the FIRST max -> the
        # smallest name among ties (the shared seed contract)
        seed = int(np.argmax(deg))
        hop1 = _np_bfs_hops(len(nodes), ea, eb, seed, max_hops)
        far = int(np.argmax(hop1))  # max hop, first occurrence
        hop2 = _np_bfs_hops(len(nodes), ea, eb, far, max_hops)
        reach = hop2[hop2 >= 0]
        hist = np.bincount(reach).astype(np.int64)
        nz = np.flatnonzero(hist)
        return rd.from_arrow(pa.table({
            "hop": pa.array(nz, pa.int64()),
            "n_nodes": pa.array(hist[nz], pa.int64()),
        }))

    deg = _explode_endpoints(edges).groupby("node").count()
    seed = deg.sort(
        ["count()", "node"], descending=[True, False]
    ).limit(1).take_all()[0]["node"]
    lay1 = _bfs_dist(edges, seed, max_hops, node_type, P)
    far = lay1.sort(
        ["hop", "node"], descending=[True, False]
    ).limit(1).take_all()[0]["node"]
    lay2 = _bfs_dist(edges, far, max_hops, node_type, P)
    return (
        lay2.groupby("hop")
        .count()
        .map_batches(
            lambda t: pa.table({
                "hop": pc.cast(t["hop"], pa.int64()),
                "n_nodes": pc.cast(t["count()"], pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .sort("hop")
    )


def brandes_dependency_topk(edges_ds, src_col: str, dst_col: str,
                            max_levels: int = 4, k: int = 25,
                            num_partitions: int = _DEFAULT_PARTITIONS,
                            small_edge_cutoff: int = 200_000):
    """Single-seed Brandes dependency scores (Brandes 2001 §4 — the
    per-source pass of betweenness centrality) over the undirected
    simple graph, seeded at the deterministic max-degree node (ties
    -> smallest name): ``δ(v) = Σ_{w: succ} (σ_v/σ_w) · (1 + δ(w))``
    accumulated over the shortest-path DAG out to ``max_levels`` —
    top-k ``(node, dep_micro)`` by (dep desc, node). Betweenness
    proper is the mean of this pass over sampled seeds
    (Brandes–Pich 2007); the one-seed pass is itself the "which
    nodes broker the hub's shortest paths" diagnostic.

    Parity discipline: σ (shortest-path counts) are exact integers
    accumulated level-by-level; δ quantizes to micro with the
    pagerank per-edge floor-division device
    ``(σ_v · (1e6 + δ_w)) // σ_w`` — order-free integer sums, no
    float anywhere, replayed by a level-unrolled SQL oracle. Bounding
    at ``max_levels`` truncates deeper dependencies identically in
    both engines.

    Below ``small_edge_cutoff`` normalized edges the graph is driver
    model state (numpy level passes); above, levels come from the
    shared :func:`_bfs_dist` frontier loop and each σ/δ level pass is
    one clamped hash join + int-key groupby over hop-tagged edges —
    per level the shuffle moves only the edges bridging two adjacent
    layers. Force the distributed path in tests with
    small_edge_cutoff=0."""
    import numpy as np

    if max_levels < 1:
        raise ValueError("max_levels must be >= 1")
    P = _clamp_partitions(num_partitions)
    edges = _normalized_edges(edges_ds, src_col, dst_col).materialize()
    node_type = edges_ds.schema().base_schema.field(src_col).type
    out_schema = pa.schema(
        [pa.field("node", node_type),
         pa.field("dep_micro", pa.int64())]
    )
    if edges.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    if edges.count() <= small_edge_cutoff:
        tbl = pa.concat_tables(
            list(edges.iter_batches(batch_format="pyarrow"))
        )
        a = tbl["a"].to_numpy(zero_copy_only=False)
        b = tbl["b"].to_numpy(zero_copy_only=False)
        nodes, inv = np.unique(
            np.concatenate([a, b]), return_inverse=True
        )
        ea, eb = inv[: len(a)], inv[len(a):]
        deg = np.bincount(ea, minlength=len(nodes)) + np.bincount(
            eb, minlength=len(nodes)
        )
        seed = int(np.argmax(deg))
        hop = _np_bfs_hops(len(nodes), ea, eb, seed, max_levels)
        # forward σ pass: edges oriented down the BFS DAG
        fa = np.concatenate([ea, eb])
        fb = np.concatenate([eb, ea])
        down = (hop[fa] >= 0) & (hop[fb] == hop[fa] + 1)
        fa, fb = fa[down], fb[down]
        sig = np.zeros(len(nodes), np.int64)
        sig[seed] = 1
        for lv in range(1, max_levels + 1):
            m = hop[fb] == lv
            if not m.any():
                break
            # pre-add guard (np.add.at wraps silently): a node's new
            # sigma is bounded by max-parent-sigma * in-edges
            if int(sig[fa[m]].max()) * int(m.sum()) >= (1 << 62):
                raise ValueError(
                    "shortest-path counts would overflow int64; "
                    "lower max_levels or densify-prune the graph"
                )
            np.add.at(sig, fb[m], sig[fa[m]])
        # backward δ pass (micro, per-edge floor division)
        delta = np.zeros(len(nodes), np.int64)
        for lv in range(max_levels - 1, -1, -1):
            m = (hop[fa] == lv) & (sig[fb] > 0)
            if not m.any():
                continue
            # per-edge product + per-node sum bound, checked in exact
            # Python ints BEFORE the wrapped numpy ops
            bound = (int(sig[fa[m]].max())
                     * (1_000_000 + int(delta[fb[m]].max()))
                     * int(m.sum()))
            if bound >= (1 << 62):
                raise ValueError(
                    "dependency accumulation would overflow int64"
                )
            term = (sig[fa[m]] * (1_000_000 + delta[fb[m]])) // sig[fb[m]]
            np.add.at(delta, fa[m], term)
        keep = (hop >= 0) & (np.arange(len(nodes)) != seed)
        out = pa.table({
            "node": pa.array(nodes[keep]).cast(node_type),
            "dep_micro": pa.array(delta[keep], pa.int64()),
        })
        out = out.sort_by([("dep_micro", "descending"),
                           ("node", "ascending")])
        return rd.from_arrow(out.slice(0, k))

    # ---- distributed path ----
    deg = _explode_endpoints(edges).groupby("node").count()
    seed = deg.sort(
        ["count()", "node"], descending=[True, False]
    ).limit(1).take_all()[0]["node"]
    lv = _bfs_dist(edges, seed, max_levels, node_type, P).materialize()

    # hop-tag both endpoints once; keep only DAG edges (hop+1 steps),
    # oriented parent -> child, both directions considered
    both = edges.map_batches(
        lambda t: pa.table({
            "u": pa.chunked_array(
                list(t["a"].chunks) + list(t["b"].chunks),
                type=t["a"].type),
            "v": pa.chunked_array(
                list(t["b"].chunks) + list(t["a"].chunks),
                type=t["a"].type),
        }),
        batch_format="pyarrow",
    ).repartition(P)
    hu = both.join(
        lv.map_batches(lambda t: t.rename_columns(["node", "hu"]),
                       batch_format="pyarrow").repartition(P),
        join_type="inner", num_partitions=P, on=("u",),
        right_on=("node",),
    )
    dag = hu.join(
        lv.map_batches(lambda t: t.rename_columns(["node2", "hv"]),
                       batch_format="pyarrow").repartition(P),
        join_type="inner", num_partitions=P, on=("v",),
        right_on=("node2",),
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t["hv"], pc.add(t["hu"], 1))
        ).select(["u", "v", "hu", "hv"]),
        batch_format="pyarrow",
    ).repartition(P).materialize()

    sig_schema = pa.schema(
        [pa.field("node", node_type), pa.field("sig", pa.int64())]
    )
    sig = rd.from_arrow(pa.table({
        "node": pa.array([seed], node_type),
        "sig": pa.array([1], pa.int64()),
    }))
    sig_levels = {0: sig}
    for l_ in range(1, max_levels + 1):
        # materialize+count+repartition: a sparse level filter can
        # emit schema-less empty blocks that crash the Acero join
        # (the dedup._nonempty_pairs device)
        lvl_edges = dag.map_batches(
            lambda t, ll=l_: t.filter(pc.equal(t["hv"], ll)),
            batch_format="pyarrow",
        ).materialize()
        if lvl_edges.count() == 0:
            break
        step = (
            lvl_edges.repartition(P)
            .join(sig_levels[l_ - 1].repartition(P),
                  join_type="inner", num_partitions=P,
                  on=("u",), right_on=("node",))
            .map_batches(
                lambda t: pa.table({"node": t["v"], "s": t["sig"]}),
                batch_format="pyarrow",
            )
            .groupby("node")
            .sum("s")
            .map_batches(
                lambda t: pa.table({
                    "node": t["node"],
                    "sig": pc.cast(t["sum(s)"], pa.int64()),
                }),
                batch_format="pyarrow",
            )
            .materialize()
        )
        if step.count() == 0:
            break
        # the distributed Sum wraps silently too: negative or
        # implausibly-large sigma means an upstream overflow
        mval = step.max("sig")
        if mval is not None and (int(mval) < 0
                                 or int(mval) > (1 << 55)):
            raise ValueError(
                "shortest-path counts would overflow int64; lower "
                "max_levels or densify-prune the graph"
            )
        sig_levels[l_] = step

    deepest = max(sig_levels)
    delta_levels = {}
    zero = rd.from_arrow(pa.table({
        "node": pa.array([], node_type),
        "dep": pa.array([], pa.int64()),
    }))
    delta_levels[deepest] = zero
    for l_ in range(deepest - 1, -1, -1):
        if l_ + 1 not in sig_levels:
            delta_levels[l_] = zero
            continue
        down = dag.map_batches(
            lambda t, ll=l_: t.filter(pc.equal(t["hu"], ll)),
            batch_format="pyarrow",
        ).repartition(P).materialize()
        if down.count() == 0:
            delta_levels[l_] = zero
            continue
        j = down.repartition(P).join(
            sig_levels[l_].map_batches(
                lambda t: t.rename_columns(["nu", "sig_u"]),
                batch_format="pyarrow",
            ).repartition(P),
            join_type="inner", num_partitions=P,
            on=("u",), right_on=("nu",),
        )
        # normalize blocks between chained joins: a join can emit
        # schema-less empty partitions that crash the next Acero join
        j = j.materialize().repartition(P).join(
            sig_levels[l_ + 1].map_batches(
                lambda t: t.rename_columns(["nv", "sig_v"]),
                batch_format="pyarrow",
            ).repartition(P),
            join_type="inner", num_partitions=P,
            on=("v",), right_on=("nv",),
        )
        dl = delta_levels[l_ + 1].materialize()
        if dl.count() > 0:
            j = j.materialize().repartition(P).join(
                dl.map_batches(
                    lambda t: t.rename_columns(["nd", "dep_w"]),
                    batch_format="pyarrow",
                ).repartition(P),
                join_type="left_outer", num_partitions=P,
                on=("v",), right_on=("nd",),
            )

            def term_d(t: pa.Table) -> pa.Table:
                su = t["sig_u"].to_numpy(zero_copy_only=False)
                sv = t["sig_v"].to_numpy(zero_copy_only=False)
                dw = pc.cast(
                    pc.coalesce(t["dep_w"], pa.scalar(0, pa.int64())),
                    pa.int64(),
                ).to_numpy(zero_copy_only=False)
                if len(su) and (int(su.max())
                                * (1_000_000 + int(dw.max()))
                                * len(su)) >= (1 << 62):
                    raise ValueError(
                        "dependency accumulation would overflow int64"
                    )
                return pa.table({
                    "node": t["u"],
                    "d": pa.array((su * (1_000_000 + dw)) // sv,
                                  pa.int64()),
                })
        else:
            def term_d(t: pa.Table) -> pa.Table:
                su = t["sig_u"].to_numpy(zero_copy_only=False)
                sv = t["sig_v"].to_numpy(zero_copy_only=False)
                return pa.table({
                    "node": t["u"],
                    "d": pa.array((su * 1_000_000) // sv, pa.int64()),
                })
        agg = (
            j.map_batches(term_d, batch_format="pyarrow")
            .groupby("node")
            .sum("d")
            .map_batches(
                lambda t: pa.table({
                    "node": t["node"],
                    "dep": pc.cast(t["sum(d)"], pa.int64()),
                }),
                batch_format="pyarrow",
            )
            .materialize()
        )
        delta_levels[l_] = agg

    # assemble: every reachable non-seed node, δ defaulting to 0
    parts = []
    for l_ in range(1, deepest + 1):
        if l_ not in sig_levels:
            break
        nodes_l = sig_levels[l_].map_batches(
            lambda t: t.select(["node"]), batch_format="pyarrow"
        )
        dl = delta_levels.get(l_, zero).materialize()
        if dl.count() > 0:
            full = nodes_l.repartition(P).join(
                dl.map_batches(
                    lambda t: t.rename_columns(["nd", "dep"]),
                    batch_format="pyarrow",
                ).repartition(P),
                join_type="left_outer", num_partitions=P,
                on=("node",), right_on=("nd",),
            ).map_batches(
                lambda t: pa.table({
                    "node": t["node"],
                    "dep_micro": pc.cast(
                        pc.coalesce(t["dep"], pa.scalar(0, pa.int64())),
                        pa.int64(),
                    ),
                }),
                batch_format="pyarrow",
            )
        else:
            full = nodes_l.map_batches(
                lambda t: pa.table({
                    "node": t["node"],
                    "dep_micro": pa.array([0] * t.num_rows, pa.int64()),
                }),
                batch_format="pyarrow",
            )
        parts.append(full)
    if not parts:
        return rd.from_arrow(out_schema.empty_table())
    out = parts[0]
    for p_ in parts[1:]:
        out = out.union(p_)
    return out.sort(["dep_micro", "node"],
                    descending=[True, False]).limit(k)


def transitivity(edges_ds, src_col: str, dst_col: str,
                 num_partitions: int = _DEFAULT_PARTITIONS,
                 fastpath_max_nodes: int = 2048):
    """Global transitivity (closed-triple ratio) of the undirected
    simple graph — one row ``(triangles, wedges,
    transitivity_micro)`` with ``transitivity = 3T / W``,
    ``W = Σ d(d−1)/2``. The one-number clustering summary that pairs
    the per-node :func:`triangle_counts` / clustering-coefficient
    family: how much of the KG's wedge mass actually closes.

    Composes the existing exact devices: T from the triangle pipeline
    (dense matmul fast path / oriented-join fallback — per-node
    counts sum to 3T), W from one degree aggregation with per-batch
    int64 ``Σ d(d−1)`` partials. One float chain at the end. int64
    contract: Σ d² over nodes must stay below 2^63 (a 3·10^9-degree
    hub breaks it — at that point the graph has bigger problems)."""
    import ray.data as rd

    out_schema = pa.schema([
        pa.field("triangles", pa.int64()),
        pa.field("wedges", pa.int64()),
        pa.field("transitivity_micro", pa.int64()),
    ])
    # normalize ONCE and share: the triangle pipeline accepts the
    # pre-normalized edge list, and empty input short-circuits before
    # any triangle work
    edges = _normalized_edges(edges_ds, src_col, dst_col).materialize()
    if edges.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    tri = triangle_counts(edges, "a", "b",
                          num_partitions=num_partitions,
                          fastpath_max_nodes=fastpath_max_nodes,
                          pre_normalized=True)
    ts = tri.sum("n_triangles")
    t3 = 0 if ts is None else int(ts)
    deg = _explode_endpoints(edges).groupby("node").count()

    def wedge_partial(b: pa.Table) -> pa.Table:
        import numpy as np

        d = b["count()"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "w": pa.array([int((d * (d - 1)).sum())], pa.int64()),
        })

    ws = deg.map_batches(wedge_partial, batch_format="pyarrow").sum("w")
    wedges = 0 if ws is None else int(ws) // 2
    if wedges == 0:
        return rd.from_arrow(out_schema.empty_table())
    t = t3 // 3
    raw = 1e6 * (3.0 * float(t) / float(wedges))
    micro = pc.cast(
        pc.round(pa.array([raw], pa.float64()), ndigits=0,
                 round_mode="half_towards_infinity"),
        pa.int64(),
    )[0].as_py()
    return rd.from_arrow(pa.table({
        "triangles": pa.array([t], pa.int64()),
        "wedges": pa.array([wedges], pa.int64()),
        "transitivity_micro": pa.array([micro], pa.int64()),
    }))
