"""Feature-engineering operators for training-data pipelines:
embedding scalar quantization and per-group standardization.

Both follow the same two-phase shape: phase 1 reduces the corpus to a
tiny EXACT-INTEGER (or exact max) statistics table — per-batch
partials through a key-sized groupby, nothing data-sized on the
driver — and phase 2 broadcasts those statistics into one streaming
pass over the corpus.

Parity devices: the statistics are exact (max of doubles; int64 sums
of micro-unit quantized values), so the only float arithmetic is a
short, explicitly-ordered chain of IEEE ops replayed token-for-token
by the SQL oracle (each double op is deterministic; divergence only
enters through reassociation, which writing the same expression tree
on both engines eliminates — the round-4 integer-micro-unit lesson
from CLAUDE.md applied to derived statistics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _round0_half_away(arr: np.ndarray) -> np.ndarray:
    """DuckDB ``round(x, 0)`` replayed exactly = pyarrow's zero-digit
    ``half_towards_infinity`` round. NOT copysign(floor(abs+0.5)):
    that trick misrounds the 1-ulp window below .5 fenceposts
    (0.49999999999999994 + 0.5 == 1.0 in IEEE, so floor returns 1
    where both engines' round returns 0)."""
    a = np.asarray(arr, dtype=np.float64)
    return np.asarray(
        pc.round(
            pa.array(a.ravel()), ndigits=0,
            round_mode="half_towards_infinity",
        )
    ).reshape(a.shape)


def scalar_quantize_embeddings(ds, id_col: str, vec_col: str):
    """Symmetric per-dimension int8 scalar quantization of an embedding
    column — the standard 4x memory shrink for ANN serving (each
    float32 dimension becomes ``q = round(x / absmax_dim * 127)`` in
    [-127, 127], with ``absmax_dim`` the corpus-wide max |x| of that
    dimension).

    Phase 1 (stats): each batch emits d rows ``(dim, m = max|x|)``;
    one d-row groupby-max; the d-vector is model state (take_all is
    d rows, bounded by the embedding width). Phase 2: broadcast the
    vector, quantize every batch in one streaming pass.

    Returns exploded rows ``(id_col, dim, q)`` — exact integers, so
    the SQL oracle (unnest + generate_subscripts + the identical
    ``round(x / amax * 127, 0)`` expression) matches bit-for-bit.
    Dimensions whose absmax is 0 quantize to 0.
    """
    import ray

    from .similarity import _batch_matrix

    def partial_absmax(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        if len(batch) == 0:
            return pa.table(
                {"dim": pa.array([], pa.int64()),
                 "m": pa.array([], pa.float64())}
            )
        m = np.abs(_batch_matrix(batch, vec_col)).max(axis=0)
        return pa.table(
            {
                "dim": pa.array(np.arange(len(m)), pa.int64()),
                "m": pa.array(m, pa.float64()),
            }
        )

    stats = (
        ds.map_batches(partial_absmax, batch_format="pyarrow")
        .groupby("dim")
        .max("m")
        .take_all()
    )  # d rows of model state
    d = len(stats)
    amax = np.zeros(d, dtype=np.float64)
    for r in stats:
        amax[int(r["dim"])] = float(r["max(m)"])
    safe = amax.copy()
    safe[safe == 0.0] = 1.0  # those dims are all-zero -> q = 0
    amax_ref = ray.put(safe)

    def quantize(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        if len(batch) == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch[id_col].type),
                    "dim": pa.array([], pa.int64()),
                    "q": pa.array([], pa.int64()),
                }
            )
        a = ray.get(amax_ref)
        mat = _batch_matrix(batch, vec_col)
        n, dd = mat.shape
        # EXACT expression-tree parity with the SQL oracle:
        # round(x / amax * 127, 0), evaluated as (x / amax) * 127
        q = _round0_half_away((mat / a) * 127.0).astype(np.int64)
        ids = np.repeat(
            np.asarray(batch[id_col].to_pylist(), dtype=object), dd
        )
        return pa.table(
            {
                id_col: pa.array(ids.tolist(), batch[id_col].type),
                "dim": pa.array(np.tile(np.arange(dd), n), pa.int64()),
                "q": pa.array(q.ravel(), pa.int64()),
            }
        )

    return ds.map_batches(quantize, batch_format="pyarrow")


def group_zscore(ds, key_col: str, id_col: str, val_col: str,
                 cents: int = 100):
    """Per-group z-score standardization of a numeric column (feature
    normalization before training): ``z = (x - mean) / std_pop`` per
    ``key_col`` group, emitted as ``z`` rounded to 4 decimals.

    Exactness: values are first quantized to integer ``cents`` units
    (``round(x * cents, 0)`` — one multiply + one zero-digit round),
    and the per-group moments ``(n, s = sum, ss = sum of squares)``
    accumulate in int64 — EXACT, shuffle moves only 3 integers per
    (batch, key). The float chain is then derived from integers in an
    explicitly-ordered expression replayed literally by SQL:
    ``m = s/n; v = ss/n - m*m; z = round((xc - m) / sqrt(v) * 1e4, 0)
    / 1e4``. Groups with zero variance (or a single row) emit z = 0.

    int64 safety: ``ss`` requires ``n * (max|x| * cents)^2 < 2^63``
    — callers with large values pick a smaller ``cents``.
    """
    import ray

    def partial_moments(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        xc = np.asarray(
            pc.round(
                pc.multiply(pc.cast(batch[val_col], pa.float64()),
                            float(cents)),
                ndigits=0,
                round_mode="half_towards_infinity",
            )
        ).astype(np.int64)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(keys, return_inverse=True)
        n = np.bincount(inv)
        s = np.zeros(len(uk), dtype=np.int64)
        ssq = np.zeros(len(uk), dtype=np.int64)
        np.add.at(s, inv, xc)
        np.add.at(ssq, inv, xc * xc)
        return pa.table(
            {
                key_col: pa.array(uk.tolist(), batch[key_col].type),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(s, pa.int64()),
                "ss": pa.array(ssq, pa.int64()),
            }
        )

    stats = (
        ds.map_batches(partial_moments, batch_format="pyarrow")
        .groupby(key_col)
        .sum(["n", "s", "ss"])
        .take_all()
    )  # one row per group key: model state
    model = {
        r[key_col]: (int(r["sum(n)"]), int(r["sum(s)"]), int(r["sum(ss)"]))
        for r in stats
    }
    model_ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        mdl = ray.get(model_ref)
        xc = np.asarray(
            pc.round(
                pc.multiply(pc.cast(batch[val_col], pa.float64()),
                            float(cents)),
                ndigits=0,
                round_mode="half_towards_infinity",
            )
        ).astype(np.int64)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        z = np.zeros(len(xc), dtype=np.float64)
        for k in np.unique(keys):
            n, s, ss = mdl[k]
            m = s / n
            v = ss / n - m * m
            if n > 1 and v > 0.0:
                sd = np.sqrt(v)
                sel = keys == k
                z[sel] = _round0_half_away(
                    ((xc[sel] - m) / sd) * 1e4
                ) / 1e4
        return pa.table(
            {
                id_col: batch[id_col],
                key_col: batch[key_col],
                "z": pa.array(z, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def gram_matrix_micro(ds, vec_col: str, unit: float = 1e6):
    """Distributed Gram matrix ``G = Xq^T @ Xq`` over an embedding
    column, with every element first quantized to integer ``unit``
    units (``round(x * unit, 0)`` int64) — the covariance / PCA /
    whitening preparation pass, EXACT and engine-independent because
    all accumulation is int64.

    Shape: each batch computes its own d x d int64 partial with ONE
    numpy matmul and emits it packed as a single row — the exchange
    moves (#batches x d^2) integers, never vectors; partials combine
    by elementwise sum on the driver (model-state-sized, the
    kmeans_fit precedent). Returns the d x d numpy int64 matrix.

    int64 bound: ``n_rows * (max|x| * unit)^2 < 2^63`` — at web scale
    pick a smaller ``unit`` (or shard the reduce) accordingly.
    """
    from .similarity import _batch_matrix

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        if len(batch) == 0:
            return pa.table({"gram": pa.array([], pa.large_binary()),
                             "d": pa.array([], pa.int64())})
        mat = _batch_matrix(batch, vec_col)
        q = _round0_half_away(mat * unit).astype(np.int64)
        g = q.T @ q  # d x d int64
        return pa.table(
            {
                "gram": pa.array([g.tobytes()], pa.large_binary()),
                "d": pa.array([g.shape[0]], pa.int64()),
            }
        )

    acc = None
    d = None
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for buf, dd in zip(b["gram"].to_pylist(), b["d"].to_pylist()):
            g = np.frombuffer(buf, np.int64).reshape(dd, dd)
            if acc is None:
                acc, d = g.copy(), dd
            else:
                acc += g
    if acc is None:
        return np.zeros((0, 0), np.int64)
    return acc


def gram_matrix_rows(ds, vec_col: str, unit: float = 1e6):
    """:func:`gram_matrix_micro` exploded to ``(dim_i, dim_j, g)``
    rows (d^2 rows — a small result) for the driver-contract /
    SQL-oracle surface."""
    import ray.data as rd

    g = gram_matrix_micro(ds, vec_col, unit)
    d = g.shape[0]
    ii = np.repeat(np.arange(d, dtype=np.int64), d)
    jj = np.tile(np.arange(d, dtype=np.int64), d)
    return rd.from_arrow(
        pa.table(
            {
                "dim_i": pa.array(ii, pa.int64()),
                "dim_j": pa.array(jj, pa.int64()),
                "g": pa.array(g.ravel(), pa.int64()),
            }
        )
    )


def group_vector_sums(ds, key_col: str, vec_col: str, unit: float = 1e6):
    """Per-key elementwise vector sums — the grouped vector aggregate
    Ray Data lacks natively (mean pooling per cluster / per source:
    the centroid-profile and embedding-drift primitive). Every
    component is first quantized to integer ``unit`` units
    (``round(x * unit, 0)`` int64), so per-key accumulation is EXACT
    and engine-independent; callers derive means as ``sum / n``
    themselves (emitting both keeps the output all-integer — the
    parity discipline).

    Returns a LONG-format Dataset ``(key_col, dim, n, sum_micro)``
    (dim 1-based, matching SQL ``generate_subscripts``).

    Shape: each batch reduces to its own (keys-in-batch x d) int64
    partial with one ``np.add.at`` scatter and emits ONE packed row
    per key — the exchange moves (#batches x keys x d) integers,
    never vectors; partials combine on the driver (key-cardinality x
    d model state, the gram_matrix/kmeans_fit precedent). Keys may be
    any hashable scalar type (ints, strings, ...) — the output column
    keeps the input key type."""
    from .similarity import _batch_matrix

    key_type = ds.schema().base_schema.field(key_col).type

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        if len(batch) == 0:
            return pa.table(
                {
                    "k": pa.array([], key_type),
                    "n": pa.array([], pa.int64()),
                    "sums": pa.array([], pa.large_binary()),
                }
            )
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        mat = _batch_matrix(batch, vec_col)
        q = _round0_half_away(mat * unit).astype(np.int64)
        uk, inv = np.unique(keys, return_inverse=True)
        acc = np.zeros((len(uk), q.shape[1]), np.int64)
        np.add.at(acc, inv, q)
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(uk.tolist(), key_type),
                "n": pa.array(cnt, pa.int64()),
                "sums": pa.array([r.tobytes() for r in acc],
                                 pa.large_binary()),
            }
        )

    import ray.data as rd

    totals: dict[int, tuple[int, np.ndarray]] = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for k, n, buf in zip(
            b["k"].to_pylist(), b["n"].to_pylist(), b["sums"].to_pylist()
        ):
            v = np.frombuffer(buf, np.int64)
            if k in totals:
                pn, pv = totals[k]
                totals[k] = (pn + n, pv + v)
            else:
                totals[k] = (n, v.copy())
    ks, dims, ns, sums = [], [], [], []
    for k in sorted(totals):
        n, v = totals[k]
        ks.extend([k] * len(v))
        dims.extend(range(1, len(v) + 1))
        ns.extend([n] * len(v))
        sums.extend(v.tolist())
    return rd.from_arrow(
        pa.table(
            {
                key_col: pa.array(ks, key_type),
                "dim": pa.array(dims, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "sum_micro": pa.array(sums, pa.int64()),
            }
        )
    )


def knn_label_agreement(knn_ds, labels_ds, id_col: str, nbr_col: str,
                        label_col: str):
    """Embedding-quality evaluation by kNN label agreement: each
    vector's predicted label is the MAJORITY label among its graph
    neighbors (ties to the smallest label), compared against its own
    ground-truth label — returns per-label ``(label, n, n_agree)``
    (n = vectors of that true label that have neighbors). High
    agreement = the embedding geometry respects the labels; the
    standard sanity eval after any embedding/clustering change.

    Distributed argmax without per-vector Python groups: neighbor
    labels are counted with one groupby, then the (count, label)
    argmax is a MAX over zero-padded packed keys (count lpad 10 ||
    inverted label lpad 10 — maximizing count then minimizing label;
    the throttle_first_per_window device pointed the other way).
    Labels must be non-negative ints below 10^10."""
    import ray.data as rd
    from ray.data.aggregate import Max

    from .graph_metrics import _clamp_partitions

    P = _clamp_partitions(4)
    INV = 9_999_999_999

    nbr_labels = labels_ds.map_batches(
        lambda b: pa.table(
            {nbr_col: b[id_col], "nbr_label": b[label_col]}
        ),
        batch_format="pyarrow",
    ).repartition(P)
    cnt = (
        knn_ds.map_batches(
            lambda b: b.select([id_col, nbr_col]), batch_format="pyarrow"
        )
        .repartition(P)
        .join(nbr_labels, "inner", num_partitions=P, on=(nbr_col,))
        .groupby([id_col, "nbr_label"])
        .count()
    )

    def pack(b: pa.Table) -> pa.Table:
        lab = pc.cast(b["nbr_label"], pa.int64())
        if len(b) and (pc.min(lab).as_py() < 0
                       or pc.max(lab).as_py() > INV):
            raise ValueError("labels must be in [0, 10^10)")
        key = pc.binary_join_element_wise(
            pc.utf8_lpad(pc.cast(pc.cast(b["count()"], pa.int64()),
                                 pa.string()), 10, padding="0"),
            pc.utf8_lpad(pc.cast(pc.subtract(INV, lab), pa.string()),
                         10, padding="0"),
            ":",
        )
        return pa.table({id_col: b[id_col], "pk": key})

    pred = (
        cnt.map_batches(pack, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Max("pk"))
        .map_batches(
            lambda b: pa.table(
                {
                    id_col: b[id_col],
                    "pred_label": pc.subtract(
                        INV,
                        pc.cast(
                            pc.utf8_slice_codeunits(b["max(pk)"], 11),
                            pa.int64(),
                        ),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(P)
    )
    truth = labels_ds.map_batches(
        lambda b: pa.table(
            {id_col: b[id_col],
             "label": pc.cast(b[label_col], pa.int64())}
        ),
        batch_format="pyarrow",
    ).repartition(P)
    joined = pred.join(truth, "inner", num_partitions=P, on=(id_col,))

    def score(b: pa.Table) -> pa.Table:
        agree = pc.cast(
            pc.equal(b["pred_label"], b["label"]), pa.int64()
        )
        return pa.table(
            {
                "label": b["label"],
                "one": pa.array(np.ones(len(b), np.int64)),
                "agree": agree,
            }
        )

    from ray.data.aggregate import Sum

    return (
        joined.map_batches(score, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("one"), Sum("agree"))
        .map_batches(
            lambda b: pa.table(
                {
                    "label": b["label"],
                    "n": pc.cast(b["sum(one)"], pa.int64()),
                    "n_agree": pc.cast(b["sum(agree)"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort("label")
    )


def zorder_key(events_ds, ts_col: str, val_col: str, id_col: str,
               k: int = 32, bits: int = 16):
    """Z-order (Morton) clustering key over (hour, value-cents) — the
    multi-dimensional SORT KEY a 100 TB table is physically laid out
    by so range scans on EITHER dimension touch few files (the
    Delta/Iceberg OPTIMIZE ZORDER primitive). Interleaves the low
    ``bits`` bits of the hour index (even positions) and of the
    cent-quantized value (odd positions); returns the ``k`` smallest
    ``(event_id, hr, v_cents, morton)`` rows by (morton, id) — the
    head of the layout order, byte-replayable because the interleave
    is pure bit arithmetic on exact ints.

    Shape: the key is computed vectorized per batch and each batch
    keeps only its own k smallest candidates (distributive top-k), so
    the final exact sort sees at most k × #batches rows.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    HOUR_US = 3_600_000_000
    mask = (1 << bits) - 1

    def _interleave(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """a in even bit positions, b in odd — unrolled shifts, the
        same expression the SQL oracle writes term by term."""
        out = np.zeros(len(a), np.int64)
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    def key(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(pc.is_valid(batch[ts_col]),
                       pc.is_valid(batch[val_col]))
        t = batch.filter(keep)
        hr = np.asarray(
            pc.divide(
                pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                        pa.int64()),
                HOUR_US,
            )
        )
        vc = np.asarray(
            pc.cast(
                pc.round(
                    pc.multiply(pc.cast(t[val_col], pa.float64()), 100.0),
                    ndigits=0, round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
        )
        m = _interleave(hr & mask, vc & mask)
        out = pa.table({
            "event_id": pc.cast(t[id_col], pa.int64()),
            "hr": pa.array(hr, pa.int64()),
            "v_cents": pa.array(vc, pa.int64()),
            "morton": pa.array(m, pa.int64()),
        })
        idx = pc.sort_indices(out, sort_keys=[("morton", "ascending"),
                                              ("event_id", "ascending")])
        return out.take(idx[:k])

    return (
        events_ds.map_batches(key, batch_format="pyarrow")
        .sort(["morton", "event_id"])
        .limit(k)
    )


def dim_variance_profile(ds, vec_col: str, unit: float = 1e6):
    """Per-dimension variance profile of an embedding column — which
    coordinates actually carry signal (dead dims waste index space;
    one dominant dim says normalize). Coordinates quantize to
    ``unit`` ints per row; per-batch (dim, n, Σx, Σx²) partials are
    the only exchange (dim-cardinality), and the n²-scaled variance
    numerator is exact bigint — one double division + zero-digit
    round per dim. Returns ``(dim, n, var_micro)`` with dim 1-based
    (generate_subscripts parity), sorted by dim; ``var`` is the
    population variance of the QUANTIZED ints divided by unit², in
    micro-units.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        col = batch[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        arr = np.asarray(col.to_pylist(), dtype=np.float64)
        if arr.size == 0:
            return pa.table({
                "dim": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
                "sx": pa.array([], pa.int64()),
                "sxx": pa.array([], pa.int64()),
            })
        q = pc.cast(
            pc.round(pa.array((arr * unit).ravel(), pa.float64()),
                     ndigits=0, round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False).reshape(arr.shape)
        d = arr.shape[1]
        return pa.table({
            "dim": pa.array(np.arange(1, d + 1), pa.int64()),
            "n": pa.array([arr.shape[0]] * d, pa.int64()),
            "sx": pa.array(q.sum(axis=0, dtype=np.int64), pa.int64()),
            "sxx": pa.array((q * q).sum(axis=0, dtype=np.int64),
                            pa.int64()),
        })

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sxx", alias_name="sxx"))
        .to_pandas()
    )
    import pandas as pd

    rows = []
    for r in cells.itertuples():
        n, sx, sxx = int(r.n), int(r.sx), int(r.sxx)
        num = n * sxx - sx * sx          # exact bigint
        raw = 1e6 * (float(num) / (float(n) * float(n)
                                   * float(unit) * float(unit)))
        micro = pc.cast(
            pc.round(pa.array([raw], pa.float64()), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )[0].as_py()
        rows.append((int(r.dim), n, micro))
    rows.sort()
    return pd.DataFrame({
        "dim": [r[0] for r in rows],
        "n": [r[1] for r in rows],
        "var_micro": [r[2] for r in rows],
    })


def _power_iter(g, iters: int) -> list:
    """The shared power-iteration loop over an exact int Gram: v0 =
    1e6 everywhere; each matvec runs in arbitrary-precision Python
    ints (== HUGEINT) and each renormalization is the ONE identical
    float chain ``round(double(w) * 1e6 / double(max|w|), 0)``."""
    d = g.shape[0]
    G = [[int(x) for x in row] for row in g]
    v = [1_000_000] * d
    for _ in range(iters):
        w = [sum(G[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        if m == 0:
            # the SQL replay would divide by zero here — fail loudly
            # on both engines instead of silently diverging
            raise ValueError(
                "all-zero Gram matrix: no principal direction "
                "(is the embedding column all zeros?)"
            )
        scaled = [float(x) * 1e6 / float(m) for x in w]
        v = [
            int(r) for r in pc.cast(
                pc.round(pa.array(scaled, pa.float64()), ndigits=0,
                         round_mode="half_towards_infinity"),
                pa.int64(),
            ).to_pylist()
        ]
    return v


def top_direction_power(ds, vec_col: str, iters: int = 3,
                        unit: float = 1e6):
    """Top principal direction of the embedding cloud via power
    iteration on the EXACT integer Gram matrix — ``(dim, v_micro)``
    sorted by dim, the dominant eigenvector scaled to max |v| = 1e6.
    The one-vector PCA a curation pipeline uses to detect an
    anisotropic/collapsed embedding space (one direction hoarding
    variance) and to whiten before cosine dedup.

    Parity discipline: the Gram accumulates distributed as exact
    int64 (:func:`gram_matrix_micro` — the only pass over the data);
    each of the ``iters`` matvecs then runs in arbitrary-precision
    Python ints on the d-sized model state (the SQL replay uses
    HUGEINT — both exact, no float association order), and each
    renormalization is ONE identical float chain
    ``round(double(w) * 1e6 / double(max|w|), 0)``. v0 = 1e6
    everywhere makes the sign deterministic."""
    import ray.data as rd

    if iters < 1:
        raise ValueError("iters must be >= 1")
    out_schema = pa.schema(
        [pa.field("dim", pa.int64()), pa.field("v_micro", pa.int64())]
    )
    g = gram_matrix_micro(ds, vec_col, unit)
    d = g.shape[0]
    if d == 0:
        return rd.from_arrow(out_schema.empty_table())
    v = _power_iter(g, int(iters))
    return rd.from_arrow(pa.table({
        "dim": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
        "v_micro": pa.array(v, pa.int64()),
    }))


def variance_explained_top(ds, vec_col: str, iters: int = 3,
                           unit: float = 1e6):
    """Share of total variance (uncentered second moment) carried by
    the dominant principal direction — one row
    ``(d, explained_micro)`` with
    ``explained = (vᵀGv / vᵀv) / trace(G)`` over the exact integer
    Gram and the :func:`top_direction_power` eigenvector. The scalar
    anisotropy verdict: near 1e6 means the embedding space has
    collapsed onto one axis (cosine thresholds become meaningless);
    near 1e6/d means isotropic.

    All three quadratic forms are exact Python-int sums (HUGEINT in
    the replay); the result is one identical float chain. The only
    data pass is the distributed Gram partial reduce."""
    import ray.data as rd

    out_schema = pa.schema([
        pa.field("d", pa.int64()),
        pa.field("explained_micro", pa.int64()),
    ])
    g = gram_matrix_micro(ds, vec_col, unit)
    d = g.shape[0]
    if d == 0:
        return rd.from_arrow(out_schema.empty_table())
    v = _power_iter(g, int(iters))
    G = [[int(x) for x in row] for row in g]
    num = sum(G[i][j] * v[i] * v[j] for i in range(d) for j in range(d))
    den = sum(x * x for x in v)
    tr = sum(G[i][i] for i in range(d))
    if den == 0 or tr <= 0:
        # matches _power_iter's loud zero-Gram contract (the SQL
        # replay divides by zero on this input)
        raise ValueError(
            "degenerate Gram (zero trace or zero eigenvector norm)"
        )
    raw = 1e6 * ((float(num) / float(den)) / float(tr))
    ex = pc.cast(
        pc.round(pa.array([raw], pa.float64()), ndigits=0,
                 round_mode="half_towards_infinity"),
        pa.int64(),
    )[0].as_py()
    return rd.from_arrow(pa.table({
        "d": pa.array([d], pa.int64()),
        "explained_micro": pa.array([ex], pa.int64()),
    }))
