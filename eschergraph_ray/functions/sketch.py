"""Distributed cardinality sketching: HyperLogLog approximate
distinct counts.

At 100 TB, ``ds.unique(col)`` / ``count(DISTINCT col)`` over a
high-cardinality column is an all-to-all shuffle of every distinct
value; the profiling questions a curation pipeline actually asks
("roughly how many distinct urls / users / shingles?") tolerate ~1-2%
error. HyperLogLog (Flajolet et al. 2007) answers them with a
fixed-size register array and NO shuffle at all:

  map_batches: each batch hashes its values (blake2b-64 — deterministic
    across processes, runs and cluster sizes; never Python ``hash``)
    and folds them into its own 2^p register array (vectorized
    ``np.maximum.at``), emitting ONE row per batch — the packed
    register bytes. The exchange moves #batches * 2^p bytes (KBs),
    never values.

  reduce: registers combine by elementwise max — associative and
    commutative, so retries/resumes/cluster sizes give byte-identical
    sketches. The final array is model-state-sized; combining on the
    driver is exactly the broadcast-small-side pattern.

The standard bias-corrected estimator with linear counting below the
small-range threshold. Relative error ~= 1.04 / sqrt(2^p) (p=12 ->
~1.6%). Deliberately NOT registered as a driver query: the driver
compares value bytes exactly and an approximate count has no SQL
oracle — accuracy is asserted in pytest against exact counts instead.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hash64(values: list) -> np.ndarray:
    """Deterministic 64-bit hashes (blake2b digest prefix)."""
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big"
            )
            for v in values
        ),
        dtype=np.uint64,
        count=len(values),
    )


def _fold(h: np.ndarray, p: int) -> np.ndarray:
    """Fold a batch of 64-bit hashes into a fresh 2^p register array."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if len(h) == 0:
        return regs
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)  # the remaining 64-p bits
    # rank = 1-based position of the leftmost 1-bit in w (w == 0 ->
    # the max rank 64-p+1). floor(log2) can misrank by 1 for the
    # ~2^-54 of values that float64 rounds across a power of two —
    # noise far below the sketch's own 1.04/sqrt(m) error
    rank = np.full(len(h), 64 - p + 1, np.uint8)
    nz = w != 0
    rank[nz] = (
        (64 - p)
        - np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64)
    ).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_partials(ds, col: str, p: int = 12):
    """One packed register row per batch (the combiner)."""
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        regs = _fold(_hash64(batch[col].to_pylist()), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.large_binary())})

    return ds.map_batches(partial, batch_format="pyarrow")


def approx_distinct(ds, col: str, p: int = 12) -> int:
    """Approximate number of distinct values in ``col`` (relative
    error ~1.04/sqrt(2^p); deterministic for a given input set —
    order- and partitioning-independent by max-merge)."""
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    for b in hll_partials(ds, col, p).iter_batches(batch_format="pyarrow"):
        for buf in b["regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(buf, np.uint8))
    return hll_estimate(regs, p)


def hll_estimate(regs: np.ndarray, p: int) -> int:
    """Bias-corrected HLL estimate with small-range linear counting."""
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1.0 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)
    return int(round(est))


# ---------------------------------------------------------------------
# Count-Min sketch: approximate frequencies / heavy hitters
# ---------------------------------------------------------------------
#
# The frequency-profiling twin of the HLL above (Cormode & Muthukrishnan
# 2005): "roughly how often does each of these tokens/urls/users occur?"
# without shuffling token instances. Same mergeable-sketch shape:
#
#   map_batches: each batch folds its values into a fresh d x w counter
#     matrix (d rows = independent hash functions via seeded blake2b,
#     vectorized np.add.at), emitting ONE packed row per batch.
#   reduce: matrices combine by elementwise SUM — associative and
#     commutative, so retries / partitioning changes give identical
#     sketches; the d x w int64 matrix is model state on the driver.
#
# Guarantee: estimate(v) >= true(v), and <= true(v) + (e/w) * N with
# probability 1 - (1/e)^d. Like the HLL, deliberately NOT a driver
# query (approximate counts have no exact-hash SQL oracle) — accuracy
# is pytest-bound against exact counts.


def _cms_hash(values: list, seed: int, w: int) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(
                    str(v).encode(), digest_size=8, salt=seed.to_bytes(8, "big")
                ).digest(),
                "big",
            )
            % w
            for v in values
        ),
        dtype=np.int64,
        count=len(values),
    )


def cms_partials(ds, col: str, w: int = 2048, d: int = 4):
    """One packed d x w counter row per batch (the combiner)."""
    if d < 1 or w < 8:
        raise ValueError("need d >= 1, w >= 8")

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        vals = batch[col].to_pylist()
        mat = np.zeros((d, w), np.int64)
        for row in range(d):
            np.add.at(mat[row], _cms_hash(vals, row, w), 1)
        return pa.table({"cms": pa.array([mat.tobytes()], pa.large_binary())})

    return ds.map_batches(partial, batch_format="pyarrow")


def cms_build(ds, col: str, w: int = 2048, d: int = 4) -> np.ndarray:
    """Merged d x w Count-Min matrix (model state)."""
    mat = np.zeros((d, w), np.int64)
    for b in cms_partials(ds, col, w, d).iter_batches(batch_format="pyarrow"):
        for buf in b["cms"].to_pylist():
            mat += np.frombuffer(buf, np.int64).reshape(d, w)
    return mat


def cms_query(mat: np.ndarray, values: list) -> np.ndarray:
    """Point-estimate counts for ``values`` (min over the d rows) —
    one vectorized probe per row, never an error below the true
    count."""
    d, w = mat.shape
    est = np.full(len(values), np.iinfo(np.int64).max, np.int64)
    for row in range(d):
        est = np.minimum(est, mat[row, _cms_hash(values, row, w)])
    return est
