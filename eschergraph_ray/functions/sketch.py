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
~1.6%).

Two hash flavors: blake2b (default, fastest) for library use, and md5
(``hashname="md5"``) whose 64-bit prefix DuckDB can replay byte-exactly
(``CAST('0x' || substr(md5(v),1,16) AS UBIGINT)``) — that makes the
ENTIRE sketch SQL-oracleable (register indexes, ranks, the integer-
scaled denominator and the final estimate are all deterministic), so
the md5 variant IS registered as a driver query
(``events_approx_distinct``); accuracy vs exact counts stays asserted
in pytest.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa


def _hash64(values: list, hashname: str = "blake2b") -> np.ndarray:
    """Deterministic 64-bit hashes (digest prefix, big-endian)."""
    if hashname == "blake2b":
        mk = lambda v: hashlib.blake2b(str(v).encode(), digest_size=8).digest()
    elif hashname == "md5":  # DuckDB-replayable: substr(md5(v),1,16)
        mk = lambda v: hashlib.md5(str(v).encode()).digest()[:8]
    else:
        raise ValueError(f"unknown hashname {hashname!r}")
    return np.fromiter(
        (int.from_bytes(mk(v), "big") for v in values),
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


def hll_estimate_replay(regs: np.ndarray, p: int) -> tuple[int, int]:
    """(zeros, estimate) computed the exact way the SQL oracle replays
    it — float-parity-safe by construction:

    - the harmonic denominator sum(2^-reg) is scaled by 2^(64-p+1) into
      EXACT integers (Python arbitrary precision; DuckDB HUGEINT) so
      summation order cannot perturb it; both engines then do the SAME
      single int->double conversion and one divide;
    - the raw-estimate product is written in the same left-to-right
      order on both sides;
    - the final integer is floor(x + 0.5) (exact op) rather than a
      round() whose half-even/half-away semantics differ per engine.

    Unlike ``hll_estimate`` (float exp2 sum, banker's round) this is
    byte-stable across engines; estimates agree with ``hll_estimate``
    to well within the sketch's own error."""
    m = 1 << p
    top = 64 - p + 1  # rank for an all-zero suffix; empty register = 0
    counts = np.bincount(regs.astype(np.int64), minlength=top + 1)
    S = sum(int(c) << (top - r) for r, c in enumerate(counts) if c)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m * float(1 << top) / float(S)
    zeros = int(counts[0])
    if raw <= 2.5 * m and zeros:
        n = math.floor(m * math.log(m / zeros) + 0.5)
    else:
        n = math.floor(raw + 0.5)
    return zeros, int(n)


def approx_distinct_multi(ds, cols: dict[str, int],
                          hashname: str = "md5") -> pa.Table:
    """Fused multi-column HLL: ONE streaming pass folds every column
    into its own register array per batch (rows are (col, packed regs)
    — KBs per batch regardless of input size), registers max-merge on
    the driver (model-state-sized), and each column's estimate uses the
    SQL-replay estimator. Returns an arrow table
    (column, p, zeros, approx_n) sorted by column name. Null values are
    dropped (mirroring SQL's ``WHERE col IS NOT NULL``)."""
    items = sorted(cols.items())

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        names, blobs = [], []
        for col, p in items:
            vals = batch[col].drop_null().to_pylist()
            names.append(col)
            blobs.append(_fold(_hash64(vals, hashname), p).tobytes())
        return pa.table(
            {
                "col": pa.array(names, pa.string()),
                "regs": pa.array(blobs, pa.large_binary()),
            }
        )

    merged = {col: np.zeros(1 << p, np.uint8) for col, p in items}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for col, buf in zip(b["col"].to_pylist(), b["regs"].to_pylist()):
            merged[col] = np.maximum(merged[col], np.frombuffer(buf, np.uint8))
    rows = []
    for col, p in items:
        zeros, n = hll_estimate_replay(merged[col], p)
        rows.append((col, p, zeros, n))
    return pa.table(
        {
            "column": pa.array([r[0] for r in rows], pa.string()),
            "p": pa.array([r[1] for r in rows], pa.int64()),
            "zeros": pa.array([r[2] for r in rows], pa.int64()),
            "approx_n": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


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
# probability 1 - (1/e)^d. The md5 hash flavor is DuckDB-replayable
# (``md5(concat('<row>:', v))`` prefix % w) — the ``docs_cms_counts``
# driver query replays bucket sums AND the min-over-rows estimate in
# SQL; accuracy stays pytest-bound against exact counts too.


def _cms_hash(values: list, seed: int, w: int,
              hashname: str = "blake2b") -> np.ndarray:
    if hashname == "blake2b":
        mk = lambda v: hashlib.blake2b(
            str(v).encode(), digest_size=8, salt=seed.to_bytes(8, "big")
        ).digest()
    elif hashname == "md5":  # replay: md5(concat('<seed>:', v))
        mk = lambda v: hashlib.md5(f"{seed}:{v}".encode()).digest()[:8]
    else:
        raise ValueError(f"unknown hashname {hashname!r}")
    return np.fromiter(
        (int.from_bytes(mk(v), "big") % w for v in values),
        dtype=np.int64,
        count=len(values),
    )


def cms_partials(ds, col: str, w: int = 2048, d: int = 4,
                 hashname: str = "blake2b"):
    """One packed d x w counter row per batch (the combiner)."""
    if d < 1 or w < 8:
        raise ValueError("need d >= 1, w >= 8")

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        vals = batch[col].to_pylist()
        mat = np.zeros((d, w), np.int64)
        for row in range(d):
            np.add.at(mat[row], _cms_hash(vals, row, w, hashname), 1)
        return pa.table({"cms": pa.array([mat.tobytes()], pa.large_binary())})

    return ds.map_batches(partial, batch_format="pyarrow")


def cms_build(ds, col: str, w: int = 2048, d: int = 4,
              hashname: str = "blake2b") -> np.ndarray:
    """Merged d x w Count-Min matrix (model state)."""
    mat = np.zeros((d, w), np.int64)
    for b in cms_partials(ds, col, w, d, hashname).iter_batches(
        batch_format="pyarrow"
    ):
        for buf in b["cms"].to_pylist():
            mat += np.frombuffer(buf, np.int64).reshape(d, w)
    return mat


def cms_query(mat: np.ndarray, values: list,
              hashname: str = "blake2b") -> np.ndarray:
    """Point-estimate counts for ``values`` (min over the d rows) —
    one vectorized probe per row, never an error below the true
    count."""
    d, w = mat.shape
    est = np.full(len(values), np.iinfo(np.int64).max, np.int64)
    for row in range(d):
        est = np.minimum(est, mat[row, _cms_hash(values, row, w, hashname)])
    return est


# ---- Bloom filter ------------------------------------------------------
# The third mergeable sketch: set MEMBERSHIP with no false negatives.
# The curation use-case is cross-corpus exclusion ("drop anything whose
# text already appears in the train shard / a blocklist") where the
# build side is huge but the FILTER is tiny: m bits total, OR-mergeable,
# so the build is the same one-packed-row-per-batch combiner as HLL/CMS
# (#batches * m/8 bytes move, never values) and the probe is a
# stateless broadcast-filter map. False positives are deterministic
# given (hash, m, k) — with the md5 flavor the whole thing (bit
# positions, the OR'd bit set, the all-bits-present probe) replays in
# DuckDB SQL, so the ``docs_bloom_probe`` driver query is byte-exact
# including any false positives. k independent hashes reuse _cms_hash
# (seed = hash index); m must be a power of two (the position is a
# 64-bit md5 prefix % m both sides).


def bloom_partials(ds, col: str, m: int = 1 << 16, k: int = 4,
                   hashname: str = "blake2b"):
    """One packed m-bit bitmap row per batch (the combiner)."""
    if m < 64 or m & (m - 1):
        raise ValueError("m must be a power of two >= 64")
    if not 1 <= k <= 16:
        raise ValueError("k must be in [1, 16]")

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        vals = batch[col].to_pylist()
        bits = np.zeros(m // 8, np.uint8)
        for i in range(k):
            pos = _cms_hash(vals, i, m, hashname)
            np.bitwise_or.at(
                bits, pos >> 3, np.left_shift(1, pos & 7).astype(np.uint8)
            )
        return pa.table({"bloom": pa.array([bits.tobytes()], pa.large_binary())})

    return ds.map_batches(partial, batch_format="pyarrow")


def bloom_build(ds, col: str, m: int = 1 << 16, k: int = 4,
                hashname: str = "blake2b") -> np.ndarray:
    """OR-merged bitmap (model state, m/8 bytes on the driver)."""
    bits = np.zeros(m // 8, np.uint8)
    for b in bloom_partials(ds, col, m, k, hashname).iter_batches(
        batch_format="pyarrow"
    ):
        for buf in b["bloom"].to_pylist():
            bits |= np.frombuffer(buf, np.uint8)
    return bits


def bloom_probe(ds, col: str, bits: np.ndarray, k: int = 4,
                hashname: str = "blake2b", out_col: str = "maybe_member"):
    """Append an int64 0/1 membership flag: 1 iff ALL k bit positions
    are set (no false negatives; false-positive rate ~(set_bits/m)^k).
    The bitmap is broadcast once via ``ray.put`` and fetched zero-copy
    from each node's object store — never re-shipped per batch."""
    import ray

    m = len(bits) * 8
    ref = ray.put(bits)

    def probe(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        bm = ray.get(ref)
        vals = batch[col].to_pylist()
        hit = np.ones(len(vals), bool)
        for i in range(k):
            pos = _cms_hash(vals, i, m, hashname)
            hit &= (bm[pos >> 3] & np.left_shift(1, pos & 7).astype(np.uint8)) != 0
        return batch.append_column(out_col, pa.array(hit.astype(np.int64)))

    return ds.map_batches(probe, batch_format="pyarrow")


def _fold_by_group(gv: list, vv: list, p: int, hashname: str):
    """(groups, packed-register blobs) for one batch's rows — the
    shared per-group md5 fold behind :func:`approx_distinct_by_group`
    and :func:`hll_set_algebra` (one place to fix the hash/fold)."""
    by: dict = {}
    for g, v in zip(gv, vv):
        by.setdefault(g, []).append(v)
    groups, blobs = [], []
    for g, vals in by.items():
        groups.append(g)
        blobs.append(_fold(_hash64(vals, hashname), p).tobytes())
    return groups, blobs


def approx_distinct_by_group(ds, group_col: str, col: str, p: int = 12,
                             hashname: str = "md5",
                             max_groups: int = 10_000) -> pa.Table:
    """Per-group HLL: approximate distinct ``col`` values for every
    ``group_col`` value in ONE streaming pass — the cardinality
    profile a pipeline wants per segment (distinct users per event
    type, distinct tokens per source) without a per-group exact
    distinct shuffle. Same mergeable-register shape as
    :func:`approx_distinct_multi`: each batch folds each group's
    values into a fresh 2^p register array (rows are (group, packed
    regs) — group-cardinality-bounded per batch), registers max-merge
    on the driver (model state: groups × 2^p bytes, guarded by
    ``max_groups`` with a loud error — a million-group profile wants
    the exact groupby instead), estimates use the SQL-replay
    estimator. Returns (group, p, zeros, approx_n) sorted by group;
    null groups/values are dropped.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pa.compute.and_(
            pa.compute.is_valid(batch[group_col]),
            pa.compute.is_valid(batch[col]),
        )
        t = batch.select([group_col, col]).filter(keep)
        groups, blobs = [], []
        if len(t):
            groups, blobs = _fold_by_group(
                t[group_col].to_pylist(), t[col].to_pylist(), p, hashname
            )
        return pa.table(
            {
                "grp": pa.array(groups),
                "regs": pa.array(blobs, pa.large_binary()),
            }
        )

    merged: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for g, buf in zip(b["grp"].to_pylist(), b["regs"].to_pylist()):
            prev = merged.get(g)
            cur = np.frombuffer(buf, np.uint8)
            merged[g] = cur if prev is None else np.maximum(prev, cur)
            if len(merged) > max_groups:
                raise ValueError(
                    f"approx_distinct_by_group: >{max_groups} groups — "
                    "register state no longer model-sized; use an exact "
                    "groupby count_distinct or raise max_groups"
                )
    rows = []
    for g in sorted(merged):
        zeros, n = hll_estimate_replay(merged[g], p)
        rows.append((g, zeros, n))
    return pa.table(
        {
            group_col: pa.array([r[0] for r in rows]),
            "p": pa.array([p] * len(rows), pa.int64()),
            "zeros": pa.array([r[1] for r in rows], pa.int64()),
            "approx_n": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def hll_set_algebra(ds, group_col: str, col: str, group_a, group_b,
                    p: int = 12, hashname: str = "md5") -> pa.Table:
    """Mergeable-sketch SET ALGEBRA between two groups' value sets:
    ``|A|``, ``|B|``, ``|A ∪ B|`` from HLL register max-merges and
    ``|A ∩ B| = |A| + |B| - |A ∪ B|`` by inclusion-exclusion — the
    overlap estimate exact distinct joins can't give without shuffling
    both sides. Mergeability is WHY sketches matter at 100 TB: the
    union costs one elementwise max over two 2^p register arrays that
    already exist; no data moves at all.

    One streaming pass filtered to the two groups (same md5 fold as
    :func:`approx_distinct_by_group`, so the SQL oracle replays every
    register); a group with no rows has all-zero registers and
    estimates 0 (the oracle coalesces the same way). The intersection
    estimate is reported RAW (it can go slightly negative within
    sketch error; both engines compute the identical integer).

    Returns a one-row table ``(group_a, group_b, p, approx_a,
    approx_b, approx_union, approx_intersection)``.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pa.compute.and_(
            pa.compute.is_in(
                batch[group_col],
                value_set=pa.array([group_a, group_b]),
            ),
            pa.compute.is_valid(batch[col]),
        )
        t = batch.select([group_col, col]).filter(keep)
        groups, blobs = [], []
        if len(t):
            groups, blobs = _fold_by_group(
                t[group_col].to_pylist(), t[col].to_pylist(), p, hashname
            )
        return pa.table(
            {
                "grp": pa.array(groups, pa.string()),
                "regs": pa.array(blobs, pa.large_binary()),
            }
        )

    regs = {group_a: np.zeros(m, np.uint8), group_b: np.zeros(m, np.uint8)}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for g, buf in zip(b["grp"].to_pylist(), b["regs"].to_pylist()):
            regs[g] = np.maximum(regs[g], np.frombuffer(buf, np.uint8))

    _, est_a = hll_estimate_replay(regs[group_a], p)
    _, est_b = hll_estimate_replay(regs[group_b], p)
    _, est_u = hll_estimate_replay(
        np.maximum(regs[group_a], regs[group_b]), p
    )
    return pa.table(
        {
            "group_a": pa.array([str(group_a)], pa.string()),
            "group_b": pa.array([str(group_b)], pa.string()),
            "p": pa.array([p], pa.int64()),
            "approx_a": pa.array([est_a], pa.int64()),
            "approx_b": pa.array([est_b], pa.int64()),
            "approx_union": pa.array([est_u], pa.int64()),
            "approx_intersection": pa.array(
                [est_a + est_b - est_u], pa.int64()
            ),
        }
    )


def content_checksum(ds, cols: list[str], sep: str = ":") -> pa.Table:
    """Order-independent corpus checksum: each row keys to the 60-bit
    md5 prefix of its ``sep``-joined column values and the keys
    XOR-fold (commutative + associative + self-inverse — partitioning
    and retry order cannot change it, and unlike a sum it cannot
    overflow). The cheap end-to-end integrity gate between pipeline
    stages: a copy / repartition / format round-trip that preserves
    the rows preserves the checksum; one changed byte, one dropped or
    duplicated row flips it (a row duplicated TWICE cancels — pair
    with the row count, which is why both are returned).

    One streaming pass of per-batch ``(n, xor)`` partials; the reduce
    folds batch-count-many rows driver-side (two scalars of model
    state). NULL values stringify as ``'NULL'`` (the SQL coalesces
    identically). Returns a one-row table ``(n_rows, xor_checksum)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        import hashlib

        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        colvals = [batch[c].to_pylist() for c in cols]
        x = 0
        for row in zip(*colvals):
            s = sep.join("NULL" if v is None else str(v) for v in row)
            x ^= int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "x": pa.array([x], pa.int64()),
            }
        )

    n_rows, xor = 0, 0
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for n, x in zip(b["n"].to_pylist(), b["x"].to_pylist()):
            n_rows += n
            xor ^= x
    return pa.table(
        {
            "n_rows": pa.array([n_rows], pa.int64()),
            "xor_checksum": pa.array([xor], pa.int64()),
        }
    )


def hll_sliding_distinct(ds, col: str, ts_col: str,
                         window_days: int = 7, p: int = 10,
                         hashname: str = "md5",
                         max_days: int = 20_000) -> "pa.Table":
    """Sliding-window approximate distinct — distinct ``col`` values
    over the trailing ``window_days``-day window ending at each active
    day — the sketch-MERGEABILITY showcase: an exact sliding distinct
    re-scans every window; HLL registers fold ONCE per day and every
    window is a register-wise max of its days' sketches (Flajolet et
    al. 2007 §4: max-merge is lossless, so the merged estimate equals
    the estimate of the unioned stream).

    Shape: per-batch rows are (day, packed 2^p registers) — calendar-
    bounded, KBs regardless of input size; a per-day groupby
    max-merges batch partials; the driver slides over the
    day-cardinality register table (model state, ``max_days``-guarded)
    and runs the byte-stable :func:`hll_estimate_replay` per window.
    Returns (day_idx, zeros, approx_n) sorted by day — one row per day
    PRESENT in the stream (trailing windows look back, so quiet days
    inside the range simply don't anchor a window).
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pa.compute.and_(
            pa.compute.is_valid(batch[col]),
            pa.compute.is_valid(batch[ts_col]),
        )
        t = batch.select([col, ts_col]).filter(keep)
        ts = pa.compute.cast(
            pa.compute.cast(t[ts_col], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        days = (ts // DAY_US).tolist()
        groups, blobs = [], []
        if len(t):
            groups, blobs = _fold_by_group(
                days, t[col].to_pylist(), p, hashname
            )
        return pa.table({
            "day": pa.array(groups, pa.int64()),
            "regs": pa.array(blobs, pa.large_binary()),
        })

    def maxmerge(group: pa.Table) -> pa.Table:
        regs = np.zeros(1 << p, np.uint8)
        for buf in group["regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(buf, np.uint8))
        return pa.table({
            "day": group["day"][:1],
            "regs": pa.array([regs.tobytes()], pa.large_binary()),
        })

    per_day: dict = {}
    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("day")
        .map_groups(maxmerge, batch_format="pyarrow")
    )
    for b in merged.iter_batches(batch_format="pyarrow"):
        for d, buf in zip(b["day"].to_pylist(), b["regs"].to_pylist()):
            per_day[d] = np.frombuffer(buf, np.uint8)
            if len(per_day) > max_days:
                raise ValueError(
                    f"hll_sliding_distinct: >{max_days} days — driver "
                    "register state no longer calendar-sized"
                )
    days = sorted(per_day)
    out_day, out_zeros, out_n = [], [], []
    for w in days:
        regs = np.zeros(1 << p, np.uint8)
        for d in days:
            if w - window_days < d <= w:
                regs = np.maximum(regs, per_day[d])
        zeros, n = hll_estimate_replay(regs, p)
        out_day.append(w)
        out_zeros.append(zeros)
        out_n.append(n)
    return pa.table({
        "day_idx": pa.array(out_day, pa.int64()),
        "zeros": pa.array(out_zeros, pa.int64()),
        "approx_n": pa.array(out_n, pa.int64()),
    })
