"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540).

The scale idea: exact all-pairs cosine over N embeddings is O(N^2);
SemDeDup first k-means-clusters the corpus and then looks for
near-duplicates ONLY within each cluster, making the work
sum(|cluster|^2) — with k grown proportionally to N (the paper uses
k ~ N/2000) cluster sizes stay bounded and the whole job is linear
in N per pass.

Ray shape (one streaming pass + one shuffle):

1. ``explode``: every batch matmuls against the broadcast centroid
   matrix (the same quantized argmax as
   :func:`eschergraph_ray.functions.similarity.kmeans_assign`, so the
   assignment is SQL-replayable), then replicates each row to the
   ``C*(C+1)/2`` intra-cluster chunk pairs exactly like
   ``dedup.embedding_near_dup_pairs`` — the chunk split bounds reducer
   memory even when one cluster is hot.
2. one ``groupby((cluster, ca, cb))`` shuffle; each group does a
   single float64 numpy matmul between its two chunk matrices.

Parity device (shared with ``kmeans_assign``): pair cosines are
quantized to integer 1e-4 units with a zero-digit
``half_towards_infinity`` round BEFORE thresholding, and the integer
threshold comparison plus a single ``q / 1e4`` division are the only
float ops — the DuckDB oracle replays both the assignment and the
pair cosine in DOUBLE via zipped ``unnest`` and applies the same
integer cut.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _id_chunk, _unpack_f64
from .similarity import _batch_matrix, _normalize


def semantic_dedup_pairs(ds, centroid_ids, centroids: np.ndarray,
                         id_col: str, vec_col: str,
                         threshold: float = 0.3, num_chunks: int = 2):
    """Within-cluster cosine near-duplicate pairs.

    Returns ``(cluster, id_a, id_b, cosine)`` with ``id_a < id_b``,
    both ids assigned to ``cluster`` (the centroid's id), and
    ``cosine >= threshold`` under the quantized-integer comparison
    described in the module docstring. Dropping every ``id_b`` (the
    greedy "keep the smallest id of each dominated pair" policy) is
    the SemDeDup pruning action and stays SQL-expressible
    (``SELECT DISTINCT id_b``).
    """
    import ray

    qmin = int(round(threshold * 1e4))
    order = np.argsort(np.asarray(centroid_ids))
    cid_sorted = np.asarray(centroid_ids)[order]
    cent_ref = ray.put((cid_sorted, centroids[order]))

    def explode(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        id_type = batch[id_col].type
        if len(batch) == 0:
            return _empty_exploded(id_type)
        cids, cent = ray.get(cent_ref)  # node-cached broadcast
        m = _normalize(_batch_matrix(batch, vec_col))
        # quantize-before-argmax: identical assignment to kmeans_assign
        q = np.asarray(
            pc.round(
                pa.array((m @ cent.T).ravel() * 1e4),
                ndigits=0,
                round_mode="half_towards_infinity",
            )
        ).reshape(len(m), -1)
        clusters = cids[np.argmax(q, axis=1)]
        ids = batch[id_col].to_pylist()
        chunks = _id_chunk(ids, num_chunks)
        out_id, out_cl, out_ca, out_cb, out_c, out_vec = [], [], [], [], [], []
        for r in range(len(ids)):
            c = chunks[r]
            buf = m[r].tobytes()  # already float64-normalized
            for other in range(num_chunks):
                out_id.append(ids[r])
                out_cl.append(int(clusters[r]))
                out_ca.append(min(c, other))
                out_cb.append(max(c, other))
                out_c.append(c)
                out_vec.append(buf)
        return pa.table(
            {
                id_col: pa.array(out_id, id_type),
                "cluster": pa.array(out_cl, pa.int64()),
                "ca": pa.array(out_ca, pa.int32()),
                "cb": pa.array(out_cb, pa.int32()),
                "chunk": pa.array(out_c, pa.int32()),
                "vec": pa.array(out_vec, pa.large_binary()),
            }
        )

    def _empty_exploded(id_type: pa.DataType) -> pa.Table:
        return pa.table(
            {
                id_col: pa.array([], id_type),
                "cluster": pa.array([], pa.int64()),
                "ca": pa.array([], pa.int32()),
                "cb": pa.array([], pa.int32()),
                "chunk": pa.array([], pa.int32()),
                "vec": pa.array([], pa.large_binary()),
            }
        )

    def score_group(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        id_type = group[id_col].type
        cluster = group["cluster"][0].as_py() if len(group) else 0
        ca = group["ca"][0].as_py() if len(group) else 0
        cb = group["cb"][0].as_py() if len(group) else 0
        ids = group[id_col].to_pylist()
        chunks = group["chunk"].to_pylist()
        a_, b_, q_ = [], [], []
        if ids:
            # rows were float64-normalized ONCE before packing (explode)
            # — renormalizing here would perturb components by ~1 ulp
            # and open a gratuitous divergence at q-fenceposts
            vecs = np.vstack([_unpack_f64(b) for b in group["vec"].to_pylist()])

            def quant(sims: np.ndarray) -> np.ndarray:
                return (
                    np.asarray(
                        pc.round(
                            pa.array(sims.ravel() * 1e4),
                            ndigits=0,
                            round_mode="half_towards_infinity",
                        )
                    )
                    .reshape(sims.shape)
                    .astype(np.int64)
                )

            if ca == cb:
                qm = quant(vecs @ vecs.T)
                for i in range(len(ids)):
                    for j in np.nonzero(qm[i] >= qmin)[0]:
                        if ids[i] < ids[j]:
                            a_.append(ids[i])
                            b_.append(ids[j])
                            q_.append(int(qm[i, j]))
            else:
                ia = [r for r, c in enumerate(chunks) if c == ca]
                ib = [r for r, c in enumerate(chunks) if c == cb]
                if ia and ib:
                    qm = quant(vecs[ia] @ vecs[ib].T)
                    for x in range(len(ia)):
                        for y in np.nonzero(qm[x] >= qmin)[0]:
                            qid, oid = ids[ia[x]], ids[ib[y]]
                            lo, hi = (qid, oid) if qid < oid else (oid, qid)
                            a_.append(lo)
                            b_.append(hi)
                            q_.append(int(qm[x, y]))
        return pa.table(
            {
                "cluster": pa.array([cluster] * len(a_), pa.int64()),
                "id_a": pa.array(a_, id_type),
                "id_b": pa.array(b_, id_type),
                "cosine": pa.array([v / 1e4 for v in q_], pa.float64()),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["cluster", "ca", "cb"])
        .map_groups(score_group, batch_format="pyarrow")
    )


def semantic_dedup_drops(pairs_ds):
    """The SemDeDup pruning ACTION: from the within-cluster pair list,
    drop every ``id_b`` — the greedy "keep the smallest id of each
    dominated pair" policy (a dominated id is dropped no matter how
    many pairs name it). Returns one ``(vec_id)`` row per distinct
    dropped id; filtering the corpus by this set is the caller's
    ``searchsorted``/anti-join step (see ``components.dedup_survivors``
    for the minhash analogue)."""

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({"vec_id": batch["id_b"]})

    return (
        pairs_ds.map_batches(project, batch_format="pyarrow")
        .groupby("vec_id")
        .count()
        .map_batches(
            lambda b: b.select(["vec_id"]), batch_format="pyarrow"
        )
    )
