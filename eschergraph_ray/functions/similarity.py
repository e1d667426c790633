"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: exact cosine top-k — one numpy matmul per batch
  against a broadcast query matrix, then a tiny global sort+limit.
  The baseline and the oracle for the approximate variant.
- ``lsh_topk``: random-hyperplane LSH bucketing (the scale path): each
  vector is assigned a bucket by sign pattern; the query probes its own
  bucket plus all buckets within Hamming distance ``probe_hamming`` —
  recall < 1 by construction, asserted >= 0.9 vs brute force in tests.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_matrix(batch: pa.Table, vec_col: str) -> np.ndarray:
    n = len(batch)
    return np.asarray(
        batch[vec_col].combine_chunks().flatten(), dtype=np.float64
    ).reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1
    return m / n


def brute_force_topk(ds, query_vec, id_col: str, vec_col: str, k: int = 10):
    """Exact cosine top-k: vectorized scan + global sort desc + limit."""
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)

    def score(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        m = _normalize(_batch_matrix(batch, vec_col))
        # round(4): DuckDB's list_cosine_similarity accumulates in
        # float32 (~1e-8 error); 4 decimals makes Ray and the SQL oracle
        # bit-identical, and the sort key uses the rounded value so the
        # top-k cut is identical too
        s = np.round(m @ q, 4)
        return pa.table({id_col: batch[id_col], "cosine": pa.array(s, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow").sort(
        ["cosine", id_col], descending=[True, False]
    ).limit(k)


def lsh_topk(ds, query_vec, id_col: str, vec_col: str, k: int = 10,
             n_planes: int = 8, probe_hamming: int = 2, seed: int = 5):
    """Approximate top-k: hyperplane-sign buckets, multi-probe."""
    rng = np.random.default_rng(seed)
    dim = len(query_vec)
    planes = rng.standard_normal((n_planes, dim))
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    qsig = int(np.packbits((planes @ q > 0).astype(np.uint8), bitorder="little")[0])
    probe = {
        s
        for s in range(1 << n_planes)
        if bin(s ^ qsig).count("1") <= probe_hamming
    }

    def score(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        m = _normalize(_batch_matrix(batch, vec_col))
        sigs = np.packbits((m @ planes.T > 0).astype(np.uint8), axis=1, bitorder="little")[:, 0]
        mask = np.isin(sigs, list(probe))
        s = np.round(m[mask] @ q, 4)
        ids = np.asarray(batch[id_col].to_pylist(), dtype=object)[mask]
        return pa.table({id_col: pa.array(ids.tolist()), "cosine": pa.array(s, pa.float64())})

    return ds.map_batches(score, batch_format="pyarrow").sort(
        ["cosine", id_col], descending=[True, False]
    ).limit(k)
