"""Distributed connected components over a pair/edge list.

The training-data use case: near-duplicate detection emits PAIRS
(minhash / simhash / embedding LSH), but the keep-one-per-group
decision needs CLUSTERS — the transitive closure of the pair graph.
At 100 TB the pair graph itself can be billions of edges, so the
closure must be computed distributed, not with a driver-side
union-find (the driver union-find in stages/graph_build.py is
per-conversation-bounded; this operator is the unbounded-graph
counterpart).

Algorithm: min-label propagation ("hash-to-min", Rastogi et al. 2013,
"Finding Connected Components in Map-Reduce in Logarithmic Rounds").
Every node starts labelled with its own id; each round every node
takes the min of its own label and its neighbours' labels; at the
fixed point every node carries the minimum node id of its component
(a deterministic canonical representative). Rounds are bounded by the
graph diameter (near-dup clusters are shallow — a handful of rounds).

Ray Data construction per round — two paths, identical fixed point.
The FAST path (labels fit a broadcast — the common case: the label
table is one row per dup-involved node) ships the sorted label arrays
via ``ray.put`` and computes messages with searchsorted inside one
streaming pass over the edges, leaving ONE shuffle per round (the
min-combine). The unbounded fallback is the union+groupby shape shared
with the temporal joins (functions/joins.py), no Dataset.join (and
none of its Ray 2.49 quirks):

    edges tagged (key=src, dst)  UNION  labels tagged (key=id, lbl)
      -> groupby(key)            (THE shuffle; edges co-partition
                                  with their source's label)
      -> per-group: emit (dst, src_label) for every edge + the node's
         own (id, label)
      -> groupby(id).min(lbl)    (message combine)

Labels are MATERIALIZED between rounds (2 int64 columns x V rows —
tiny next to the text) so round t doesn't re-execute rounds 0..t-1;
edges are materialized once. Convergence is detected with a
sum(label) aggregate: labels are monotonically non-increasing (the
self-message keeps the old label in the min), so the sum strictly
decreases until the fixed point — one cheap scalar per round instead
of a change-count join.

Scale notes: the shuffle each round moves the edge list once (degree-
bounded reducer output); a hot node costs its true degree, never a
cross product. Skewed components do not skew the shuffle — labels are
per-node rows, not per-component groups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _empty_labels(node_col: str, component_col: str) -> pa.Table:
    return pa.schema(
        [(node_col, pa.int64()), (component_col, pa.int64())]
    ).empty_table()


def connected_components(
    pairs_ds,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_col: str = "doc_id",
    component_col: str = "component_id",
    max_rounds: int = 64,
    broadcast_labels_below: int = 2_000_000,
):
    """Return a Dataset of ``(node_col, component_col)`` — one row per
    node that appears in ``pairs_ds``, labelled with the minimum node
    id reachable from it. Nodes absent from the pair list are their
    own singletons by definition and are NOT emitted (callers wanting
    them union the full id list with a coalesce).

    ``max_rounds`` is a loud-failure bound (diameter of a near-dup
    cluster in practice: < 10), not a tuning knob.

    Fast path: when the LABEL table (one row per dup-involved node —
    bounded by pair count, tiny next to the corpus at real dup rates)
    fits under ``broadcast_labels_below``, each round broadcasts it
    (``ray.put`` once, node-cached) and computes neighbour messages
    with a vectorized searchsorted inside one streaming pass over the
    edges — ONE shuffle per round (the message combine) instead of
    two, and no per-group Python. The tagged-union path below remains
    the unbounded-graph fallback; both paths compute the identical
    fixed point (same messages, same min-combine).
    """
    import ray.data as rd

    def to_edges(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        a = pc.cast(batch[id_a], pa.int64())
        b = pc.cast(batch[id_b], pa.int64())
        fwd = pa.table({"src": a, "dst": b})
        rev = pa.table({"src": b, "dst": a})
        return pa.concat_tables([fwd, rev]).combine_chunks()

    # materialized once: edges feed every round (and the empty check)
    edges = pairs_ds.map_batches(to_edges, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return rd.from_arrow(_empty_labels(node_col, component_col))

    # initial labels fuse the first propagation step: label(v) =
    # min(v, min over neighbours) — one groupby instead of a distinct
    # pass plus a round
    lbl0 = edges.groupby("src").min("dst")

    def init_label(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": batch["src"],
                "lbl": pc.min_element_wise(batch["src"], batch["min(dst)"]),
            }
        )

    labels = lbl0.map_batches(init_label, batch_format="pyarrow").materialize()
    prev_sum = labels.sum("lbl")

    def tag_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["src"],
                "dst": batch["dst"],
                "lbl": pa.nulls(len(batch), pa.int64()),
                "_side": pa.array([0] * len(batch), pa.int8()),
            }
        )

    def tag_labels(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": batch["id"],
                "dst": pa.nulls(len(batch), pa.int64()),
                "lbl": batch["lbl"],
                "_side": pa.array([1] * len(batch), pa.int8()),
            }
        )

    def propagate(group: pa.Table) -> pa.Table:
        # exactly one label row per key (labels come out of a groupby);
        # emit the label to every neighbour plus back to the node itself
        side = group["_side"]
        lbl_rows = group.filter(pc.equal(side, 1))
        lbl = lbl_rows["lbl"][0].as_py()
        key_val = lbl_rows["key"][0].as_py()
        dsts = group.filter(pc.equal(side, 0))["dst"]
        n = len(dsts) + 1
        ids = pa.concat_arrays(
            list(dsts.chunks) + [pa.array([key_val], pa.int64())]
        )
        return pa.table({"id": ids, "lbl": pa.array([lbl] * n, pa.int64())})

    tagged_edges = edges.map_batches(tag_edges, batch_format="pyarrow")
    use_broadcast = labels.count() <= broadcast_labels_below

    for _ in range(max_rounds):
        if use_broadcast:
            import numpy as np
            import ray

            pdf = labels.to_pandas()
            ids_np = pdf["id"].to_numpy(np.int64)
            order = np.argsort(ids_np)
            lbl_ref = ray.put(
                (ids_np[order], pdf["lbl"].to_numpy(np.int64)[order])
            )

            def msg(batch: pa.Table, _ref=lbl_ref) -> pa.Table:
                from ..stages.chunking import pin_arrow_threads

                pin_arrow_threads()
                ids_s, lbls_s = ray.get(_ref)  # node-cached
                src = batch["src"].to_numpy(zero_copy_only=False)
                # every src is a labelled node by construction
                lbl = lbls_s[np.searchsorted(ids_s, src)]
                return pa.table(
                    {"id": batch["dst"], "lbl": pa.array(lbl, pa.int64())}
                )

            msgs = edges.map_batches(msg, batch_format="pyarrow").union(labels)
        else:
            tagged_labels = labels.map_batches(
                tag_labels, batch_format="pyarrow"
            )
            msgs = (
                tagged_edges.union(tagged_labels)
                .groupby("key")
                .map_groups(propagate, batch_format="pyarrow")
            )
        combined = msgs.groupby("id").min("lbl")
        labels = combined.map_batches(
            lambda b: pa.table({"id": b["id"], "lbl": b["min(lbl)"]}),
            batch_format="pyarrow",
        ).materialize()
        cur_sum = labels.sum("lbl")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            "(graph diameter exceeds the bound — raise max_rounds)"
        )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({node_col: batch["id"], component_col: batch["lbl"]})

    return labels.map_batches(finalize, batch_format="pyarrow")


def dedup_survivors(
    ds,
    components_ds,
    id_col: str,
    node_col: str = "doc_id",
    component_col: str = "component_id",
    max_drop_broadcast: int = 200_000_000,
):
    """The keep-one-per-cluster ACTION: filter ``ds`` down to the rows
    that survive near-dup clustering — every cluster's canonical
    representative (the min-id member, i.e. ``node == component``)
    plus every document that was never in a pair.

    Shape: the DROP set (non-canonical cluster members) is exactly
    ``#dup_docs - #clusters`` rows — tiny next to the corpus even at
    pathological dup rates — so it is collected once, ``ray.put``
    broadcast as a sorted int64 array, and the corpus is filtered in
    one streaming ``map_batches`` pass with a vectorized searchsorted
    membership test. No shuffle of the corpus, no join.
    ``max_drop_broadcast`` is the loud-failure bound on that contract.
    """
    import numpy as np
    import ray

    def to_drops(batch: pa.Table) -> pa.Table:
        mask = pc.not_equal(batch[node_col], batch[component_col])
        return pa.table({"drop_id": pc.cast(batch.filter(mask)[node_col], pa.int64())})

    drops = components_ds.map_batches(to_drops, batch_format="pyarrow")
    # unique() on an empty/schema-less dataset can yield None or [None]
    uniq = drops.unique("drop_id") or []
    drop_ids = np.asarray([v for v in uniq if v is not None], np.int64)
    if len(drop_ids) > max_drop_broadcast:
        raise ValueError(
            f"{len(drop_ids)} drop ids exceed max_drop_broadcast="
            f"{max_drop_broadcast}; shard the drop set or use a join path"
        )
    drop_ids.sort()
    drop_ref = ray.put(drop_ids)

    def keep(batch: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)  # node-cached
        if len(drop) == 0:
            return batch
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(drop, ids)
        hit = (pos < len(drop)) & (drop[np.minimum(pos, len(drop) - 1)] == ids)
        return batch.filter(pa.array(~hit))

    return ds.map_batches(keep, batch_format="pyarrow")


def partitioned_component_histogram(pairs_ds, id_a: str, id_b: str,
                                    part_col: str, n_buckets: int = 64):
    """Connected-component SIZE HISTOGRAM of a PARTITION-SCOPED edge
    list — ``(component_size, n_components)`` where every edge's two
    endpoints belong to the same partition (per-conversation KG
    subgraphs, per-tenant graphs): the caller's contract that
    components never cross ``part_col`` is what makes this one
    bucketed pass instead of global label-propagation rounds.

    Shape: partitions hash into ``crc32(part) & (n_buckets−1)``
    buckets (the round-5 wide-key lesson: never one micro-group per
    partition); each bucket factorizes its (part, node) strings to
    dense ints and runs ONE union-find over its edges — correct even
    with many partitions per bucket, because cross-partition edges
    don't exist to merge them — and emits (size, count) partials;
    only those histogram-sized partials shuffle. Node ids may be any
    string; isolated nodes (absent from the edge list) are not
    counted, as in :func:`connected_components`.
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    import zlib

    import ray.data as rd
    from ray.data.aggregate import Sum

    SEP = "\x1f"

    def prep(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        part = batch[part_col]
        a = pc.binary_join_element_wise(
            pc.cast(part, pa.string()), pc.cast(batch[id_a], pa.string()),
            SEP,
        )
        b = pc.binary_join_element_wise(
            pc.cast(part, pa.string()), pc.cast(batch[id_b], pa.string()),
            SEP,
        )
        ps = pc.cast(part, pa.string()).to_pylist()
        uniq = {p: zlib.crc32(p.encode("utf-8")) & (n_buckets - 1)
                for p in set(ps)}
        bucket = pa.array([uniq[p] for p in ps], pa.int64())
        return pa.table({"bucket": bucket, "a": a, "b": b})

    def per_bucket(g: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        a = np.asarray(g["a"].to_pylist(), dtype=object)
        b = np.asarray(g["b"].to_pylist(), dtype=object)
        ids, codes = np.unique(np.concatenate([a, b]),
                               return_inverse=True)
        n = len(ids)
        parent = np.arange(n, dtype=np.int64)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ca, cb = codes[: len(a)], codes[len(a):]
        for x, y in zip(ca.tolist(), cb.tolist()):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)
        roots = np.fromiter((find(i) for i in range(n)), np.int64,
                            count=n)
        sizes = np.bincount(roots)
        sizes = sizes[sizes > 0]
        u, c = np.unique(sizes, return_counts=True)
        return pa.table({
            "component_size": pa.array(u, pa.int64()),
            "n": pa.array(c, pa.int64()),
        })

    hist = (
        pairs_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("component_size")
        .aggregate(Sum("n", alias_name="n_components"))
    )
    return hist.map_batches(
        lambda t: pa.table({
            "component_size": pc.cast(t["component_size"], pa.int64()),
            "n_components": pc.cast(t["n_components"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("component_size")


def dedup_best_survivors(
    ds,
    components_ds,
    id_col: str,
    quality_col: str,
    node_col: str = "doc_id",
    component_col: str = "component_id",
    max_member_broadcast: int = 200_000_000,
):
    """Quality-aware keep-one-per-cluster: instead of
    :func:`dedup_survivors`' min-id canonical, each near-dup cluster
    keeps its argmax-``quality_col`` member (ties → smallest id) —
    the "keep the longest / highest-quality copy" policy production
    dedup actually wants (the min-id pick can keep a truncated
    variant).

    Shape: cluster members are exactly the dup-involved ids — tiny
    next to the corpus — so their (id, component) table broadcasts;
    ONE streaming pass over ``ds`` (a) reads each member's quality
    and (b) later filters, with a component-cardinality argmax in
    between: per-batch candidate rows (component, quality, id) shrink
    to one per component before the shuffle (the latest_per_key
    discipline). The corpus itself is never shuffled or joined.
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Min

    mem = components_ds.map_batches(
        lambda b: pa.table({
            "node": pc.cast(b[node_col], pa.int64()),
            "comp": pc.cast(b[component_col], pa.int64()),
        }),
        batch_format="pyarrow",
    ).materialize()
    n_members = mem.count()
    if n_members == 0:
        return ds.map_batches(lambda b: b, batch_format="pyarrow")
    if n_members > max_member_broadcast:
        raise ValueError(
            f"{n_members} cluster members exceed max_member_broadcast="
            f"{max_member_broadcast}; shard the member set or use a "
            "join path"
        )
    mt = pa.concat_tables(
        list(mem.iter_batches(batch_format="pyarrow"))
    ).combine_chunks()
    nodes = mt["node"].to_numpy(zero_copy_only=False)
    comps = mt["comp"].to_numpy(zero_copy_only=False)
    order = np.argsort(nodes)
    nodes, comps = nodes[order], comps[order]
    mem_ref = ray.put((nodes, comps))

    def candidates(batch: pa.Table, _ref=mem_ref) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ns, cs = ray.get(_ref)
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        pos = np.searchsorted(ns, ids)
        hit = (pos < len(ns)) & (ns[np.minimum(pos, len(ns) - 1)] == ids)
        if not hit.any():
            return pa.table({
                "comp": pa.array([], pa.int64()),
                "key": pa.array([], pa.int64()),
            })
        q = pc.cast(batch[quality_col], pa.int64()).to_numpy(
            zero_copy_only=False)[hit]
        cids = cs[pos[hit]]
        mids = ids[hit]
        if len(q) and (int(q.min()) < 0 or int(q.max()) >= 1 << 29
                       or int(mids.max()) >= 1 << 33):
            raise ValueError(
                "dedup_best_survivors packs (quality, id) into one "
                "int64 min-key: needs 0 <= quality < 2^29 and "
                "id < 2^33"
            )
        # argmax(quality) with ties -> min id, as ONE packed min-key:
        # key = (-quality) * 2^33 + id
        key = (-q) * (1 << 33) + mids
        uk, inv = np.unique(cids, return_inverse=True)
        best = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(best, inv, key)
        return pa.table({
            "comp": pa.array(uk, pa.int64()),
            "key": pa.array(best, pa.int64()),
        })

    winners = (
        ds.map_batches(candidates, batch_format="pyarrow")
        .groupby("comp")
        .aggregate(Min("key", alias_name="key"))
        .to_pandas()
    )
    kw = winners["key"].to_numpy(np.int64)
    win_ids = ((kw % (1 << 33)) + (1 << 33)) % (1 << 33)
    win_set = set(int(i) for i in win_ids)
    drop_ids = np.asarray(
        sorted(int(n) for n in nodes if int(n) not in win_set),
        np.int64,
    )
    drop_ref = ray.put(drop_ids)

    def keep(batch: pa.Table) -> pa.Table:
        drop = ray.get(drop_ref)
        if len(drop) == 0:
            return batch
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        pos = np.searchsorted(drop, ids)
        hit = (pos < len(drop)) & (
            drop[np.minimum(pos, len(drop) - 1)] == ids)
        return batch.filter(pa.array(~hit))

    return ds.map_batches(keep, batch_format="pyarrow")
