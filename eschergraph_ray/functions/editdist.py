"""Blocked fuzzy name join on Levenshtein edit distance.

The reference resolves entity aliases with fuzzywuzzy's
``token_set_ratio`` inside one conversation
(``eschergraph/tools/fuzzy_matcher.py:48-58``); this operator is the
corpus-global complement: find ALL pairs of distinct entity names
within edit distance ``max_dist`` across the whole graph — the classic
record-linkage / entity-resolution primitive a 100 TB pipeline needs.

Distributed shape (one shuffle):

    names -> add block key (prefix) -> groupby(block) -> map_groups:
        block-local distinct, candidate pairs (a<b, |len diff| bound),
        VECTORIZED Levenshtein across all pairs at once -> filter

Blocking is exact-prefix (``name[:prefix_len]``): a pair is emitted
only if both names share the prefix, so recall is bounded by the
blocking choice (documented, mirrored in the SQL oracle — a pair whose
edit touches the first ``prefix_len`` chars is not a candidate). Hot
blocks larger than ``block_cutoff`` are skipped entirely (and the
oracle replays the same cutoff), the same df-cutoff discipline as the
minhash/ngram dedup family — emitted pair work per block is bounded by
``cutoff**2/2`` regardless of skew.

The Levenshtein kernel is NOT a per-pair Python loop: all pairs in a
block are solved simultaneously with a numpy DP — one row iteration
per character of the left string, each step O(n_pairs * len_b)
vectorized, with the insertion dependency resolved by the
``cummin(row - j) + j`` prefix-scan identity.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PAIR_SCHEMA = pa.schema(
    [
        pa.field("name_a", pa.string()),
        pa.field("name_b", pa.string()),
        pa.field("dist", pa.int64()),
    ]
)


def _encode(names: list[str], width: int, pad: int) -> np.ndarray:
    """(n, width) int64 code-point matrix padded with ``pad``."""
    out = np.full((len(names), width), pad, dtype=np.int64)
    for i, s in enumerate(names):
        if s:
            out[i, : len(s)] = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
    return out


def levenshtein_many(a_names: list[str], b_names: list[str]) -> np.ndarray:
    """Exact Levenshtein distance for each (a_names[i], b_names[i]) pair,
    computed for ALL pairs at once (numpy DP over the left string's
    positions). Distances are over Unicode code points — identical to
    DuckDB's character-based ``levenshtein()`` for the names we feed it.
    """
    n = len(a_names)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    la = np.array([len(s) for s in a_names], dtype=np.int64)
    lb = np.array([len(s) for s in b_names], dtype=np.int64)
    La, Lb = int(la.max(initial=0)), int(lb.max(initial=0))
    # distinct pad sentinels so padding never matches real chars
    a = _encode(a_names, max(La, 1), pad=-1)
    b = _encode(b_names, max(Lb, 1), pad=-2)
    J = np.arange(Lb + 1, dtype=np.int64)
    prev = np.broadcast_to(J, (n, Lb + 1)).copy()
    result = lb.copy()  # rows whose left string is empty: dist = len(b)
    for i in range(1, La + 1):
        sub = (a[:, i - 1 : i] != b).astype(np.int64)
        cand = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + sub)
        tmp = np.concatenate(
            [np.full((n, 1), i, dtype=np.int64), cand], axis=1
        )
        # insertion chain: cur[j] = min_{k<=j} tmp[k] + (j-k)
        cur = np.minimum.accumulate(tmp - J, axis=1) + J
        done = la == i
        if done.any():
            result[done] = cur[done, lb[done]]
        prev = cur
    return result


def _block_pairs(tbl: pa.Table, name_col: str, max_dist: int,
                 block_cutoff: int) -> pa.Table:
    """Pairs within ONE prefix block: block-local distinct (all copies
    of a name share its prefix, so local dedup is globally correct),
    a < b ordering, |len(a)-len(b)| <= max_dist candidate bound, then
    the vectorized DP and the final distance filter."""
    names = np.unique(np.asarray(tbl[name_col].to_pylist(), dtype=object))
    if len(names) < 2 or len(names) > block_cutoff:
        return PAIR_SCHEMA.empty_table()
    ii, jj = np.triu_indices(len(names), k=1)
    lens = np.array([len(s) for s in names], dtype=np.int64)
    keep = np.abs(lens[ii] - lens[jj]) <= max_dist
    ii, jj = ii[keep], jj[keep]
    if len(ii) == 0:
        return PAIR_SCHEMA.empty_table()
    left = [names[i] for i in ii]
    right = [names[j] for j in jj]
    dist = levenshtein_many(left, right)
    ok = dist <= max_dist
    return pa.table(
        {
            "name_a": pa.array([l for l, k in zip(left, ok) if k], pa.string()),
            "name_b": pa.array([r for r, k in zip(right, ok) if k], pa.string()),
            "dist": pa.array(dist[ok], pa.int64()),
        }
    )


def fuzzy_name_pairs(ds, name_col: str = "name", prefix_len: int = 3,
                     max_dist: int = 4, min_len: int = 4,
                     block_cutoff: int = 500):
    """All pairs of distinct names within ``max_dist`` edits, blocked by
    the ``prefix_len``-char prefix. ``ds`` is any Dataset with a string
    ``name_col``; duplicates are fine (deduped block-locally). Returns
    a Dataset with columns (name_a, name_b, dist), unsorted."""
    import pyarrow.compute as pc

    def prep(b: pa.Table) -> pa.Table:
        col = b[name_col]
        keep = pc.greater_equal(pc.utf8_length(col), min_len)
        col = col.filter(keep)
        return pa.table(
            {
                name_col: col,
                "_blk": pc.utf8_slice_codeunits(col, 0, prefix_len),
            }
        )

    def per_block(tbl: pa.Table) -> pa.Table:
        return _block_pairs(tbl, name_col, max_dist, block_cutoff)

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("_blk")
        .map_groups(per_block, batch_format="pyarrow")
    )
