"""Cross-column dependence statistics (exact, integer-parity).

Mutual information between two bounded-cardinality columns — the
standard drift / leakage / seasonality diagnostic a training-data
pipeline runs over its metadata (is `label` independent of `source`?
does event type depend on hour-of-day?). Not in the reference (its
corpora are one pickle); the distributed shape generalizes the repo's
PMI device (``graph_metrics.cooccurrence_pmi_topk`` /
``vocab.bigram_pmi_topk``) from per-pair ranking to the aggregate
statistic.

Shape: one groupby builds the (x, y, n_xy) contingency table — the
only pass over the data, moving cell counts, never rows; marginals
derive from the CELLS (two tiny groupby-sums), join back via clamped
hash joins, and the weighted sum reduces to one row. A hot cell costs
one row; the data is never broadcast or collected.

Parity device (the repo's micro-nat discipline): per-cell
``q = round(ln(n_xy·N / (n_x·n_y)) · 1e6)`` int64 (one float
expression over exact counts), weighted total ``Σ n_xy·q`` in pure
int64 (order-free), and the final ``mi_micro = round(total / N)`` is
one division plus a zero-digit round — both engines bit-identical.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .graph_metrics import _DEFAULT_PARTITIONS, _clamp_partitions


def mutual_information(ds, x_col: str, y_col: str,
                       num_partitions: int = _DEFAULT_PARTITIONS):
    """MI(x; y) in integer micro-nats. Returns a one-row Dataset
    ``(n, n_cells, mi_micro)``; an empty input yields zero rows.
    Columns must be bounded-cardinality (categories, buckets — the
    contingency table is cell-count-sized); null rows are dropped
    first (SQL aggregate semantics)."""
    import numpy as np

    num_partitions = _clamp_partitions(num_partitions)

    from ray.data.aggregate import Sum

    def partial_cells(batch: pa.Table) -> pa.Table:
        # combiner: per-batch contingency partials — the exchange moves
        # at most cells-per-batch rows, never event rows
        t = batch.select([x_col, y_col]).filter(
            pc.and_(pc.is_valid(batch[x_col]), pc.is_valid(batch[y_col]))
        )
        return (
            t.group_by([x_col, y_col])
            .aggregate([([], "count_all")])
            .rename_columns([x_col, y_col, "n_part"])
        )

    cells = (
        ds.map_batches(partial_cells, batch_format="pyarrow")
        .groupby([x_col, y_col])
        .aggregate(Sum("n_part", alias_name="n_xy"))
        .repartition(num_partitions)
        .materialize()
    )
    empty = pa.table(
        {
            "n": pa.array([], pa.int64()),
            "n_cells": pa.array([], pa.int64()),
            "mi_micro": pa.array([], pa.int64()),
        }
    )
    n_cells = cells.count()
    if n_cells == 0:
        return rd.from_arrow(empty)
    n_total = int(cells.sum("n_xy"))

    def marginal(col: str, out: str):
        return (
            cells.groupby(col)
            .sum("n_xy")
            .map_batches(
                lambda b, c=col, o=out: b.rename_columns([c, o]),
                batch_format="pyarrow",
            )
            .repartition(num_partitions)
        )

    joined = (
        cells.join(marginal(x_col, "n_x"), join_type="inner",
                   num_partitions=num_partitions, on=(x_col,))
        # normalize join-output blocks before the chained second join
        # (Ray 2.49 schema-less-empty-block crash guard)
        .repartition(num_partitions)
        .join(marginal(y_col, "n_y"), join_type="inner",
              num_partitions=num_partitions, on=(y_col,))
    )

    def cell_terms(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        n_xy = batch["n_xy"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_x = batch["n_x"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_y = batch["n_y"].to_numpy(zero_copy_only=False).astype(np.float64)
        expr = n_xy * float(n_total) / (n_x * n_y)
        q = np.asarray(
            pc.round(
                pa.array(np.log(expr) * 1e6),
                ndigits=0,
                round_mode="half_towards_infinity",
            ).cast(pa.int64())
        )
        w = (batch["n_xy"].to_numpy(zero_copy_only=False).astype(np.int64)
             * q)
        return pa.table({"wq": pa.array(w, pa.int64())})

    total = joined.map_batches(cell_terms, batch_format="pyarrow").sum("wq")
    total = int(total or 0)
    mi_micro = int(
        pc.round(
            pa.array([total / float(n_total)]),
            ndigits=0,
            round_mode="half_towards_infinity",
        )[0].as_py()
    )
    return rd.from_arrow(
        pa.table(
            {
                "n": pa.array([n_total], pa.int64()),
                "n_cells": pa.array([n_cells], pa.int64()),
                "mi_micro": pa.array([mi_micro], pa.int64()),
            }
        )
    )


def ks_drift(ds, val_col: str, seg_col: str, seg_a: str, seg_b: str,
             cents: int = 100):
    """Two-sample Kolmogorov–Smirnov distance between segments
    ``seg_a`` and ``seg_b`` of ``val_col`` — the standard
    distribution-drift detector a training-data pipeline runs between
    shards / time slices / sources before mixing them. Returns one
    row ``(n_a, n_b, ks_num, ks_micro)`` where
    ``ks = ks_num / (n_a · n_b)`` and ``ks_micro = round(ks · 1e6)``;
    empty if either segment has no rows.

    Shape: per-batch arrow hash-aggregate partials collapse rows to
    (quantized value, per-segment count) cells before the only
    data-sized exchange; the CDF sweep runs in ONE reducer over the
    distinct-value table — bounded by value cardinality, never row
    count (the same contract as the hourly-anomaly sweep; a truly
    continuous 100 TB column would first bucket to fixed precision,
    which ``cents`` already is).

    Parity device: values quantize to integer ``round(v · cents)``;
    the sup statistic is computed CROSS-MULTIPLIED —
    ``ks_num = max |cum_a · n_b − cum_b · n_a|`` — so the maximum is
    taken over exact int64, never floats; only the final reporting
    division happens in float (int64→double conversion + one divide +
    zero-digit round, each one identical IEEE op on both engines).
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        seg = batch[seg_col]
        keep = pc.and_(
            pc.is_valid(batch[val_col]),
            pc.or_(pc.equal(seg, seg_a), pc.equal(seg, seg_b)),
        )
        t = batch.select([val_col, seg_col]).filter(keep)
        v = pc.cast(
            pc.round(
                pc.multiply(pc.cast(t[val_col], pa.float64()),
                            float(cents)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        is_a = pc.cast(pc.equal(t[seg_col], seg_a), pa.int64())
        cells = pa.table(
            {"v": v, "ca": is_a, "cb": pc.subtract(1, is_a)}
        )
        return (
            cells.group_by("v")
            .aggregate([("ca", "sum"), ("cb", "sum")])
            .rename_columns(["v", "ca", "cb"])
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("ca", alias_name="ca"), Sum("cb", alias_name="cb"))
    )

    def sweep(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("v")
        ca = pc.cast(g["ca"], pa.int64()).to_numpy(zero_copy_only=False)
        cb = pc.cast(g["cb"], pa.int64()).to_numpy(zero_copy_only=False)
        n_a, n_b = int(ca.sum()), int(cb.sum())
        if n_a == 0 or n_b == 0:
            return pa.table(
                {
                    "n_a": pa.array([], pa.int64()),
                    "n_b": pa.array([], pa.int64()),
                    "ks_num": pa.array([], pa.int64()),
                    "ks_micro": pa.array([], pa.int64()),
                }
            )
        cum_a = np.cumsum(ca, dtype=np.int64)
        cum_b = np.cumsum(cb, dtype=np.int64)
        ks_num = int(np.max(np.abs(cum_a * n_b - cum_b * n_a)))
        ks_micro = int(
            pc.round(
                # float() FIRST (== SQL's CAST AS DOUBLE), then ONE
                # IEEE divide — Python's big-int true division rounds
                # once overall and can differ in the last ulp
                pa.array([float(ks_num * 1_000_000) / float(n_a * n_b)]),
                ndigits=0,
                round_mode="half_towards_infinity",
            )[0].as_py()
        )
        return pa.table(
            {
                "n_a": pa.array([n_a], pa.int64()),
                "n_b": pa.array([n_b], pa.int64()),
                "ks_num": pa.array([ks_num], pa.int64()),
                "ks_micro": pa.array([ks_micro], pa.int64()),
            }
        )

    # value-cardinality-bounded cell table: one block, one sweep
    return cells.repartition(1).map_batches(
        sweep, batch_format="pyarrow", batch_size=None
    )


def rank_auc(ds, score_col: str, label_col: str):
    """Exact ROC-AUC of an integer score against a binary label — the
    Mann–Whitney rank-sum identity ``AUC = (#(neg<pos) + ties/2) /
    (n_pos·n_neg)``, the standard eval for any curation scorer
    (quality gates, langid, dedup confidence) before it is trusted to
    filter a corpus. Returns one row
    ``(n_pos, n_neg, auc_num2, auc_micro)`` with
    ``AUC = auc_num2 / (2·n_pos·n_neg)``; empty if either class is
    absent.

    Shape: per-batch combiner partials collapse rows to
    (score, n_pos, n_neg) cells; the pair count runs in ONE reducer
    over the distinct-score table (value-cardinality-bounded, the
    :func:`ks_drift` contract). Parity: the pair counts are pure
    int64 (no midranks, no floats); only the reporting ``auc_micro``
    divides (int64→double conversion + one divide + zero-digit
    round, identical IEEE ops on both engines).
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.is_valid(batch[score_col]), pc.is_valid(batch[label_col])
        )
        t = batch.select([score_col, label_col]).filter(keep)
        pos = pc.cast(pc.equal(t[label_col], 1), pa.int64())
        cells = pa.table(
            {
                "s": pc.cast(t[score_col], pa.int64()),
                "np_": pos,
                "nn_": pc.subtract(1, pos),
            }
        )
        return (
            cells.group_by("s")
            .aggregate([("np_", "sum"), ("nn_", "sum")])
            .rename_columns(["s", "np_", "nn_"])
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("s")
        .aggregate(Sum("np_", alias_name="np_"),
                   Sum("nn_", alias_name="nn_"))
    )

    def sweep(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("s")
        np_c = pc.cast(g["np_"], pa.int64()).to_numpy(zero_copy_only=False)
        nn_c = pc.cast(g["nn_"], pa.int64()).to_numpy(zero_copy_only=False)
        n_pos, n_neg = int(np_c.sum()), int(nn_c.sum())
        if n_pos == 0 or n_neg == 0:
            return pa.table(
                {
                    "n_pos": pa.array([], pa.int64()),
                    "n_neg": pa.array([], pa.int64()),
                    "auc_num2": pa.array([], pa.int64()),
                    "auc_micro": pa.array([], pa.int64()),
                }
            )
        cum_neg_before = np.concatenate(
            ([0], np.cumsum(nn_c, dtype=np.int64)[:-1])
        )
        correct = int(np.sum(np_c * cum_neg_before))
        ties = int(np.sum(np_c * nn_c))
        auc_num2 = 2 * correct + ties
        auc_micro = int(
            pc.round(
                pa.array(
                    [float(auc_num2 * 1_000_000)
                     / float(2 * n_pos * n_neg)]
                ),
                ndigits=0,
                round_mode="half_towards_infinity",
            )[0].as_py()
        )
        return pa.table(
            {
                "n_pos": pa.array([n_pos], pa.int64()),
                "n_neg": pa.array([n_neg], pa.int64()),
                "auc_num2": pa.array([auc_num2], pa.int64()),
                "auc_micro": pa.array([auc_micro], pa.int64()),
            }
        )

    # value-cardinality-bounded cell table: one block, one sweep
    return cells.repartition(1).map_batches(
        sweep, batch_format="pyarrow", batch_size=None
    )


def rank_auc_by_group(ds, group_col: str, score_col: str,
                      label_col: str):
    """Per-slice ROC-AUC — :func:`rank_auc` computed independently for
    every value of ``group_col`` (the slice-based evaluation surface:
    a scorer that looks fine globally can be broken on one source /
    language / time slice). Returns one row per group that has BOTH
    classes — ``(group_col, n_pos, n_neg, auc_num2, auc_micro)``,
    group-ascending; single-class groups are omitted (AUC undefined),
    matching the SQL replay's HAVING clause.

    Shape: per-batch combiner partials collapse rows to
    (group, score, n_pos, n_neg) cells; each group's rank-sum sweep
    runs in its own reducer over that group's score cells
    (``groupby(group).map_groups`` — per-group value cardinality
    bounded). Same pure-int64 parity as :func:`rank_auc`.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.and_(
                pc.is_valid(batch[group_col]),
                pc.is_valid(batch[score_col]),
            ),
            pc.is_valid(batch[label_col]),
        )
        t = batch.select([group_col, score_col, label_col]).filter(keep)
        pos = pc.cast(pc.equal(t[label_col], 1), pa.int64())
        cells = pa.table(
            {
                group_col: t[group_col],
                "s": pc.cast(t[score_col], pa.int64()),
                "np_": pos,
                "nn_": pc.subtract(1, pos),
            }
        )
        return (
            cells.group_by([group_col, "s"])
            .aggregate([("np_", "sum"), ("nn_", "sum")])
            .rename_columns([group_col, "s", "np_", "nn_"])
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "s"])
        .aggregate(Sum("np_", alias_name="np_"),
                   Sum("nn_", alias_name="nn_"))
    )

    def sweep(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("s")
        np_c = pc.cast(g["np_"], pa.int64()).to_numpy(zero_copy_only=False)
        nn_c = pc.cast(g["nn_"], pa.int64()).to_numpy(zero_copy_only=False)
        n_pos, n_neg = int(np_c.sum()), int(nn_c.sum())
        gval = group[group_col][:1]
        if n_pos == 0 or n_neg == 0:
            return pa.table(
                {
                    group_col: gval[:0],
                    "n_pos": pa.array([], pa.int64()),
                    "n_neg": pa.array([], pa.int64()),
                    "auc_num2": pa.array([], pa.int64()),
                    "auc_micro": pa.array([], pa.int64()),
                }
            )
        cum_neg_before = np.concatenate(
            ([0], np.cumsum(nn_c, dtype=np.int64)[:-1])
        )
        correct = int(np.sum(np_c * cum_neg_before))
        ties = int(np.sum(np_c * nn_c))
        auc_num2 = 2 * correct + ties
        auc_micro = int(
            pc.round(
                pa.array(
                    [float(auc_num2 * 1_000_000)
                     / float(2 * n_pos * n_neg)]
                ),
                ndigits=0,
                round_mode="half_towards_infinity",
            )[0].as_py()
        )
        return pa.table(
            {
                group_col: gval,
                "n_pos": pa.array([n_pos], pa.int64()),
                "n_neg": pa.array([n_neg], pa.int64()),
                "auc_num2": pa.array([auc_num2], pa.int64()),
                "auc_micro": pa.array([auc_micro], pa.int64()),
            }
        )

    return (
        cells.groupby(group_col)
        .map_groups(sweep, batch_format="pyarrow")
        .sort(group_col)
    )


def robust_stats_by_group(ds, group_col: str, val_col: str,
                          cents: int = 100, k_mad: int = 3):
    """Per-group robust statistics — ``(group, n, med_cents,
    mad_cents, n_outliers)`` where ``med`` / ``mad`` are the discrete
    inverse-CDF medians (SQL ``quantile_disc(0.5)``: smallest value
    whose cumulative count reaches half) of the value and of the
    absolute deviation, and ``n_outliers`` counts rows with
    ``|x − med| > k_mad · mad`` — the heavy-tail-safe anomaly profile
    (mean/stddev break on the very outliers you're hunting). Groups
    ascending; values quantized to integer ``cents``.

    Shape: per-batch combiner partials collapse rows to
    (group, value, count) cells — the only data-sized exchange — and
    EVERYTHING downstream (median, deviation distribution, MAD,
    outlier count) happens in one per-group reducer over that group's
    value cells, value-cardinality-bounded (the :func:`ks_drift`
    contract). Every statistic is an exact integer; no division
    anywhere.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.is_valid(batch[group_col]), pc.is_valid(batch[val_col])
        )
        t = batch.select([group_col, val_col]).filter(keep)
        v = pc.cast(
            pc.round(
                pc.multiply(pc.cast(t[val_col], pa.float64()),
                            float(cents)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        cells = pa.table({group_col: t[group_col], "v": v})
        return (
            cells.group_by([group_col, "v"])
            .aggregate([([], "count_all")])
            .rename_columns([group_col, "v", "cnt"])
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "v"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def inv_cdf_half(vals: "np.ndarray", cnts: "np.ndarray", n: int):
        # smallest value with 2*cum >= n (quantile_disc(0.5))
        cum = np.cumsum(cnts, dtype=np.int64)
        return int(vals[np.argmax(2 * cum >= n)])

    def sweep(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("v")
        v = pc.cast(g["v"], pa.int64()).to_numpy(zero_copy_only=False)
        c = pc.cast(g["cnt"], pa.int64()).to_numpy(zero_copy_only=False)
        n = int(c.sum())
        med = inv_cdf_half(v, c, n)
        d = np.abs(v - med)
        order = np.argsort(d, kind="stable")
        ds_, cs_ = d[order], c[order]
        # collapse equal deviations (two values can share |v - med|)
        uniq, start = np.unique(ds_, return_index=True)
        csum = np.add.reduceat(cs_, start)
        mad = inv_cdf_half(uniq, csum, n)
        n_out = int(csum[uniq > k_mad * mad].sum())
        return pa.table(
            {
                group_col: group[group_col][:1],
                "n": pa.array([n], pa.int64()),
                "med_cents": pa.array([med], pa.int64()),
                "mad_cents": pa.array([mad], pa.int64()),
                "n_outliers": pa.array([n_out], pa.int64()),
            }
        )

    return (
        cells.groupby(group_col)
        .map_groups(sweep, batch_format="pyarrow")
        .sort(group_col)
    )


# round(1e6 * log10(1 + 1/d)) for d = 1..9 — hardcoded as INTEGER
# constants on BOTH engines (they sum to exactly 1_000_000), so the
# expected-count arithmetic never touches a logarithm at runtime
BENFORD_MICRO = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_digits(ds, val_col: str):
    """Benford's-law first-digit audit of a positive currency column —
    the classic fraud / synthetic-data / unit-mixup detector (Benford
    1938; Nigrini's forensic-accounting standard). Values quantize to
    integer cents (the repo's micro-unit device), the first decimal
    digit comes from the INTEGER's string form (identical on both
    engines — no double formatting anywhere), and expectations use the
    hardcoded integer Benford table, so every output cell is exact
    int64: ``expected_micro = n * BENFORD_MICRO[d]`` and ``dev_micro =
    1e6*observed - expected_micro`` (micro-count units).

    Shape: one streaming pass of per-batch digit-count partials (at
    most 9 rows per batch reach the exchange), one 9-row groupby; all
    9 digits always present in the output (observed = 0 rows too —
    they are exactly the suspicious ones). Non-positive cents are
    excluded (no leading digit).
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        cents = pc.cast(
            pc.round(
                pc.multiply(pc.cast(b[val_col], pa.float64()), 100.0),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        cents = pc.filter(cents, pc.greater(cents, 0))
        digit = pc.cast(
            pc.utf8_slice_codeunits(pc.cast(cents, pa.string()), 0, 1),
            pa.int64(),
        )
        return (
            pa.table({"digit": digit})
            .group_by(["digit"])
            .aggregate([([], "count_all")])
            .rename_columns(["digit", "n_part"])
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n_part", alias_name="observed"))
        .take_all()
    )
    obs = {int(r["digit"]): int(r["observed"]) for r in counts}
    n = sum(obs.values())
    digits = list(range(1, 10))
    observed = [obs.get(d, 0) for d in digits]
    expected = [n * BENFORD_MICRO[d] for d in digits]
    dev = [1_000_000 * o - e for o, e in zip(observed, expected)]
    return rd.from_arrow(
        pa.table(
            {
                "digit": pa.array(digits, pa.int64()),
                "observed": pa.array(observed, pa.int64()),
                "expected_micro": pa.array(expected, pa.int64()),
                "dev_micro": pa.array(dev, pa.int64()),
            }
        )
    )


def group_quantiles(ds, group_col: str, val_col: str,
                    p_pcts: tuple = (50, 90, 99), cents: int = 100):
    """Per-group EXACT discrete quantiles — ``(group, n, p{P}_cents
    ...)`` where each quantile is the inverse CDF at P percent: the
    smallest value whose cumulative count satisfies ``100*cum >=
    P*n`` (all-integer comparison — no float threshold, no
    interpolation; the repo's quantile_disc convention). The grouped
    complement of the global sampled sketch (`sampling.py`): exact
    p50/p90/p99 latency/price floors per segment.

    Shape: per-batch combiner partials collapse rows to (group, value,
    count) cells — the only data-sized exchange — then each group's
    quantile sweep runs over its value-cardinality-bounded histogram
    in one reducer (the :func:`robust_stats_by_group` contract).
    """
    import numpy as np
    from ray.data.aggregate import Sum

    pcts = sorted(int(p) for p in p_pcts)
    if any(not 0 < p <= 100 for p in pcts):
        raise ValueError("p_pcts must be integer percents in (0, 100]")

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.is_valid(batch[group_col]), pc.is_valid(batch[val_col])
        )
        t = batch.select([group_col, val_col]).filter(keep)
        v = pc.cast(
            pc.round(
                pc.multiply(pc.cast(t[val_col], pa.float64()),
                            float(cents)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        cells = pa.table({group_col: t[group_col], "v": v})
        return (
            cells.group_by([group_col, "v"])
            .aggregate([([], "count_all")])
            .rename_columns([group_col, "v", "cnt"])
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "v"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def sweep(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("v")
        v = pc.cast(g["v"], pa.int64()).to_numpy(zero_copy_only=False)
        c = pc.cast(g["cnt"], pa.int64()).to_numpy(zero_copy_only=False)
        n = int(c.sum())
        cum = np.cumsum(c, dtype=np.int64)
        cols = {group_col: group[group_col][:1],
                "n": pa.array([n], pa.int64())}
        for p in pcts:
            q = int(v[np.argmax(100 * cum >= p * n)])
            cols[f"p{p}_cents"] = pa.array([q], pa.int64())
        return pa.table(cols)

    return (
        cells.groupby(group_col)
        .map_groups(sweep, batch_format="pyarrow")
        .sort(group_col)
    )


def entropy_by_group(ds, group_col: str, item_col: str):
    """Shannon entropy of each group's item distribution, in integer
    micro-nats — how concentrated vs spread is every segment's
    behavior (a per-group complement of :func:`mutual_information`,
    same micro-nat parity discipline): ``H = Σ (n_i/n) ln(n/n_i)``
    computed as per-cell ``q = round(1e6·ln(DOUBLE(n)/n_i))`` int64,
    weighted total ``Σ n_i·q`` in pure int64 (order-free), final
    ``h_micro = round(total/n)`` — one divide + zero-digit round per
    step, bit-identical in SQL.

    Shape: one contingency groupby builds (group, item, n_i) cells —
    the only pass over the data — then each group's sweep reduces its
    item-cardinality-bounded cell list in one reducer. Returns
    ``(group, n, n_items, h_micro)`` sorted by group; null
    groups/items are dropped first (SQL aggregate semantics).
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.is_valid(batch[group_col]), pc.is_valid(batch[item_col])
        )
        t = batch.select([group_col, item_col]).filter(keep)
        return (
            t.group_by([group_col, item_col])
            .aggregate([([], "count_all")])
            .rename_columns([group_col, item_col, "n_part"])
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, item_col])
        .aggregate(Sum("n_part", alias_name="n_i"))
    )

    def sweep(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        c = pc.cast(group["n_i"], pa.int64()).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        n = int(c.sum())
        q = np.asarray(
            pc.round(
                pa.array(np.log(float(n) / c.astype(np.float64)) * 1e6),
                ndigits=0,
                round_mode="half_towards_infinity",
            ).cast(pa.int64())
        )
        total = int((c * q).sum())
        h = int(
            pc.round(
                pa.array([total / float(n)]),
                ndigits=0,
                round_mode="half_towards_infinity",
            )[0].as_py()
        )
        return pa.table(
            {
                group_col: group[group_col][:1],
                "n": pa.array([n], pa.int64()),
                "n_items": pa.array([len(c)], pa.int64()),
                "h_micro": pa.array([h], pa.int64()),
            }
        )

    return (
        cells.groupby(group_col)
        .map_groups(sweep, batch_format="pyarrow")
        .sort(group_col)
    )


def value_histogram(ds, group_col: str, val_col: str, nbins: int = 10):
    """Equal-width histogram of micro-quantized values per group —
    ``bin = (v - vmin) * nbins // (vmax - vmin + 1)`` with the GLOBAL
    integer min/max, so bin edges are exact integers and both engines
    bucket identically (the +1 keeps the max value inside the last
    bin). Returns ``(group, bin, n)`` sorted; the bin's real-valued
    edges are one client reconstruction from (vmin, vmax).

    Two scans (the small_qty_revenue precedent): pass 1 is a scalar
    min/max aggregate, pass 2 a per-batch (group, bin) combiner ->
    one bin-cardinality groupby."""
    import numpy as np

    if nbins < 1:
        raise ValueError("nbins must be >= 1")

    def micro(b: pa.Table) -> np.ndarray:
        return np.asarray(
            pc.cast(
                pc.round(
                    pc.multiply(pc.cast(b[val_col], pa.float64()), 1e6),
                    ndigits=0, round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
        )

    def mm_partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        v = micro(b)
        if len(v) == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({
            "lo": pa.array([int(v.min())], pa.int64()),
            "hi": pa.array([int(v.max())], pa.int64()),
        })

    mm = ds.map_batches(mm_partial, batch_format="pyarrow")
    vmin = mm.min("lo")
    empty = pa.table({
        "group": pa.array([], pa.string()),
        "bin": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
    })
    if vmin is None:
        return rd.from_arrow(empty)
    vmax = mm.max("hi")
    span = int(vmax) - int(vmin) + 1
    lo = int(vmin)

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        v = micro(b)
        bins = (v - lo) * nbins // span
        t = pa.table({
            "group": b[group_col],
            "bin": pa.array(bins, pa.int64()),
        })
        return (
            t.group_by(["group", "bin"])
            .aggregate([("bin", "count")])
            .rename_columns(["group", "bin", "n"])
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["group", "bin"])
        .aggregate(Sum("n", alias_name="n"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "group": b["group"],
            "bin": pc.cast(b["bin"], pa.int64()),
            "n": pc.cast(b["n"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort(["group", "bin"])


def json_int_stats(ds, group_col: str, json_col: str, key: str):
    """Per-group n/sum/min/max of an integer JSON property extracted
    VECTORIZED from a fixed-shape JSON column (pc.extract_regex with
    a named group — the CLAUDE.md device; no per-row json.loads).
    Rows without the key drop out (SQL FILTER parity). Returns
    ``(group, n, sum_v, min_v, max_v)`` sorted by group — one
    group-cardinality exchange."""
    import numpy as np

    pattern = '"' + key + '":\\s*(?P<v>-?\\d+)'

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ex = pc.extract_regex(b[json_col], pattern)
        valid = pc.is_valid(ex)
        vals = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        t = pa.table({"g": b[group_col], "v": vals}).filter(valid)
        g = np.asarray(t["g"].to_pylist(), dtype=object)
        v = t["v"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(g, return_inverse=True)
        n = np.zeros(len(u), np.int64)
        s = np.zeros(len(u), np.int64)
        mn = np.full(len(u), np.iinfo(np.int64).max, np.int64)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.add.at(n, inv, 1)
        np.add.at(s, inv, v)
        np.minimum.at(mn, inv, v)
        np.maximum.at(mx, inv, v)
        return pa.table({
            "group": pa.array(list(u), pa.string()),
            "n": pa.array(n, pa.int64()),
            "s": pa.array(s, pa.int64()),
            "mn": pa.array(mn, pa.int64()),
            "mx": pa.array(mx, pa.int64()),
        })

    from ray.data.aggregate import Max, Min, Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("group")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s", alias_name="sum_v"),
            Min("mn", alias_name="min_v"),
            Max("mx", alias_name="max_v"),
        )
    )
    return agg.map_batches(
        lambda b: pa.table({
            "group": b["group"],
            "n": pc.cast(b["n"], pa.int64()),
            "sum_v": pc.cast(b["sum_v"], pa.int64()),
            "min_v": pc.cast(b["min_v"], pa.int64()),
            "max_v": pc.cast(b["max_v"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("group")


def day_over_day_users(ds, user_col: str, ts_col: str,
                       day_a: int, day_b: int,
                       day_us: int = 86_400_000_000,
                       n_buckets: int = 64):
    """Day-over-day audience movement between two epoch days: distinct
    users active on each, plus retained / new / churned counts — five
    exact scalars (every rate is a client division).

    Distinct (user, day-flag) pairs shrink per batch, bucket by
    ``user & (n_buckets-1)`` (a user's two flags share its bucket, so
    the per-bucket set algebra is exact), and only five-integer
    partials shuffle."""
    import numpy as np

    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        b = b.filter(pc.and_(pc.is_valid(b[user_col]),
                             pc.is_valid(b[ts_col])))
        ts = np.asarray(
            pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        )
        day = ts // day_us
        u = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ka = (day == day_a)
        kb = (day == day_b)
        keep = ka | kb
        u, isb = u[keep], kb[keep]
        pairs = np.unique(u * 2 + isb)
        return pa.table({
            "bucket": pa.array(
                np.bitwise_and(pairs // 2, n_buckets - 1), pa.int64()
            ),
            "p": pa.array(pairs, pa.int64()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        import numpy as np

        p = np.unique(g["p"].to_numpy(zero_copy_only=False))
        u, flag = p // 2, p % 2
        a_users = set(u[flag == 0].tolist())
        b_users = set(u[flag == 1].tolist())
        both = len(a_users & b_users)
        return pa.table({
            "na": pa.array([len(a_users)], pa.int64()),
            "nb": pa.array([len(b_users)], pa.int64()),
            "nr": pa.array([both], pa.int64()),
        })

    tot = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .sum(["na", "nb", "nr"])
    )
    na, nb, nr = (
        (0, 0, 0) if tot is None
        else (int(tot["sum(na)"]), int(tot["sum(nb)"]),
              int(tot["sum(nr)"]))
    )
    return rd.from_arrow(pa.table({
        "n_day_a": pa.array([na], pa.int64()),
        "n_day_b": pa.array([nb], pa.int64()),
        "n_retained": pa.array([nr], pa.int64()),
        "n_new": pa.array([nb - nr], pa.int64()),
        "n_churned": pa.array([na - nr], pa.int64()),
    }))


def mode_by_group(ds, group_col: str, val_col: str):
    """Exact grouped mode: each group's most frequent micro-quantized
    value, ties to the SMALLEST value (the deterministic argmax both
    engines replay as ``row_number() OVER (ORDER BY n DESC, v)``).
    Returns ``(group, mode_micro, n_mode)`` sorted by group — a
    (group, value)-cardinality combine, then the bounded argmax
    sweep."""
    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        v = pc.cast(
            pc.round(
                pc.multiply(pc.cast(b[val_col], pa.float64()), 1e6),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        t = pa.table({"g": b[group_col], "v": v})
        return (
            t.group_by(["g", "v"]).aggregate([("v", "count")])
            .rename_columns(["g", "v", "n"])
        )

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["g", "v"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def sweep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "group": pa.array([], pa.string()),
                "mode_micro": pa.array([], pa.int64()),
                "n_mode": pa.array([], pa.int64()),
            })
        g = np.asarray(b["g"].to_pylist(), dtype=object)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        # (group asc, n desc, v asc): first row per group is the mode
        order = np.lexsort((v, -n, g))
        g, v, n = g[order], v[order], n[order]
        first = np.ones(len(g), bool)
        first[1:] = g[1:] != g[:-1]
        return pa.table({
            "group": pa.array(list(g[first]), pa.string()),
            "mode_micro": pa.array(v[first], pa.int64()),
            "n_mode": pa.array(n[first], pa.int64()),
        })

    return counts.repartition(1).map_batches(
        sweep, batch_format="pyarrow", batch_size=None
    )


def exact_group_ndv(ds, group_col: str, id_col: str,
                    n_buckets: int = 64):
    """EXACT distinct-count per group — the precise counterpart of
    the HLL entries: distinct (group, id) pairs shrink per batch,
    bucket by ``id & (n_buckets-1)`` (an id's rows share its bucket,
    so per-bucket dedup is globally exact), and only per-(bucket,
    group) partial counts shuffle. Returns ``(group, n_distinct)``
    sorted by group."""
    import numpy as np

    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        b = b.filter(pc.and_(pc.is_valid(b[group_col]),
                             pc.is_valid(b[id_col])))
        t = pa.table({
            "g": b[group_col],
            "i": pc.cast(b[id_col], pa.int64()),
        }).group_by(["g", "i"]).aggregate([])
        ids = t["i"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(
                np.bitwise_and(ids, n_buckets - 1), pa.int64()
            ),
            "g": t["g"],
            "i": t["i"],
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        d = (
            pa.table({"g": g["g"], "i": g["i"]})
            .group_by(["g", "i"]).aggregate([])
        )
        c = d.group_by("g").aggregate([("i", "count")])
        return pa.table({
            "group": c["g"],
            "n": pc.cast(c["i_count"], pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("group")
        .aggregate(Sum("n", alias_name="n_distinct"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "group": b["group"],
            "n_distinct": pc.cast(b["n_distinct"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("group")


def theilsen_trend(events_ds, ts_col: str, type_col: str,
                   max_hours: int = 4096):
    """Per-type Theil–Sen robust trend over the hourly event-count
    series — the median of all pairwise slopes ``(c_j − c_i) /
    (h_j − h_i)`` between distinct hours, the estimator that shrugs
    off the outlier hours an OLS slope (events_trend) chases (Sen
    1968; 29.3% breakdown point).

    Shape: the stream collapses to (type, hour) count cells — the
    only data-sized exchange — and each type's reducer enumerates its
    own pair slopes vectorized (hour cardinality is TIME-bounded, not
    data-bounded: a month is 720 hours ≈ 259k pairs; ``max_hours``
    guards the quadratic loudly). Parity: counts and hour indices are
    exact int64; each slope is ONE float64 division and ONE multiply
    then a zero-digit half-away-from-zero round into integer
    micro-units (identical IEEE ops in DuckDB), and the median is the
    discrete inverse CDF (SQL ``quantile_disc(0.5)``).

    Returns ``(event_type, n_hours, n_pairs, slope_micro)`` for types
    with ≥ 2 distinct hours, sorted by type.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    HOUR_US = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(pc.is_valid(batch[type_col]),
                       pc.is_valid(batch[ts_col]))
        t = batch.select([type_col, ts_col]).filter(keep)
        hr = pc.divide(
            pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()),
            HOUR_US,
        )
        cells = pa.table({"event_type": t[type_col], "hr": hr})
        return (
            cells.group_by(["event_type", "hr"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "hr", "c"])
        )

    def slopes(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("hr")
        h = pc.cast(g["hr"], pa.int64()).to_numpy(zero_copy_only=False)
        c = pc.cast(g["c"], pa.int64()).to_numpy(zero_copy_only=False)
        n = len(h)
        if n < 2:
            return pa.table({
                "event_type": pa.array([], pa.string()),
                "n_hours": pa.array([], pa.int64()),
                "n_pairs": pa.array([], pa.int64()),
                "slope_micro": pa.array([], pa.int64()),
            })
        if n > max_hours:
            raise ValueError(
                f"theilsen_trend: {n} distinct hours exceeds "
                f"max_hours={max_hours}; the pair enumeration is "
                "quadratic in the series length — bucket time coarser"
            )
        i, j = np.triu_indices(n, k=1)
        raw = 1e6 * ((c[j] - c[i]).astype(np.float64)
                     / (h[j] - h[i]).astype(np.float64))
        sm = pc.cast(
            pc.round(pa.array(raw, pa.float64()), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        sm = np.sort(sm)
        npairs = len(sm)
        med = int(sm[(npairs + 1) // 2 - 1])
        return pa.table({
            "event_type": group["event_type"][:1],
            "n_hours": pa.array([n], pa.int64()),
            "n_pairs": pa.array([npairs], pa.int64()),
            "slope_micro": pa.array([med], pa.int64()),
        })

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hr"])
        .aggregate(Sum("c", alias_name="c"))
        .groupby("event_type")
        .map_groups(slopes, batch_format="pyarrow")
        .sort("event_type")
    )


def acf_by_group(events_ds, ts_col: str, type_col: str,
                 max_lag: int = 24, max_hours: int = 100_000):
    """Per-type autocorrelation function of the hourly count series at
    lags 1..``max_lag`` — the seasonality fingerprint (a daily cycle
    shows as a peak at lag 24). The series is the DENSE hourly grid
    over each type's [min, max] hour span with zero-filled quiet hours
    (ACF over only-active hours would silently delete the gaps that
    make the signal).

    Exact-integer parity device: with ``x_i`` the counts, ``n`` the
    grid length and ``T = Σx``, both ``num_l = Σ (n·x_i − T)(n·x_{i+l}
    − T)`` and ``den = Σ (n·x_i − T)²`` are exact integers (n² times
    the usual mean-centered sums — the same quantize-then-divide trick
    as the round-4 cosine replay), accumulated in Python arbitrary
    precision (DuckDB HUGEINT); the output is ONE division + one
    multiply + a zero-digit half-away round into micro-units. Types
    with zero variance are dropped; a lag is emitted only when the
    grid has at least one pair (n > l).

    Shape: the stream collapses to (type, hour) count cells; each
    type's reducer is time-bounded (``max_hours`` guards a degenerate
    span). Returns ``(event_type, lag, acf_micro)`` sorted.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    HOUR_US = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(pc.is_valid(batch[type_col]),
                       pc.is_valid(batch[ts_col]))
        t = batch.select([type_col, ts_col]).filter(keep)
        hr = pc.divide(
            pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()),
            HOUR_US,
        )
        cells = pa.table({"event_type": t[type_col], "hr": hr})
        return (
            cells.group_by(["event_type", "hr"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "hr", "c"])
        )

    def acf(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("hr")
        h = pc.cast(g["hr"], pa.int64()).to_numpy(zero_copy_only=False)
        c = pc.cast(g["c"], pa.int64()).to_numpy(zero_copy_only=False)
        lo, hi = int(h[0]), int(h[-1])
        n = hi - lo + 1
        if n > max_hours:
            raise ValueError(
                f"acf_by_group: grid of {n} hours exceeds "
                f"max_hours={max_hours} — bucket time coarser"
            )
        x = np.zeros(n, np.int64)
        x[h - lo] = c
        T = int(x.sum())
        dev = [int(v) * n - T for v in x.tolist()]  # exact ints
        den = sum(d * d for d in dev)
        etype, lags, vals = [], [], []
        if den > 0:
            for l in range(1, max_lag + 1):
                if n <= l:
                    break
                num = sum(a * b for a, b in zip(dev[:-l], dev[l:]))
                raw = 1e6 * (float(num) / float(den))
                lags.append(l)
                vals.append(raw)
            etype = [group["event_type"][0].as_py()] * len(lags)
        sm = pc.cast(
            pc.round(pa.array(vals, pa.float64()), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table({
            "event_type": pa.array(etype, pa.string()),
            "lag": pa.array(lags, pa.int64()),
            "acf_micro": sm,
        })

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hr"])
        .aggregate(Sum("c", alias_name="c"))
        .groupby("event_type")
        .map_groups(acf, batch_format="pyarrow")
        .sort(["event_type", "lag"])
    )


def fano_by_group(events_ds, ts_col: str, type_col: str,
                  max_hours: int = 100_000):
    """Per-type burstiness: the Fano factor (variance-to-mean ratio)
    of the hourly count series over the dense zero-filled grid —
    F ≈ 1 is Poisson-like arrival, F ≫ 1 is bursty, F < 1 is
    regular/throttled. The dispersion complement of
    :func:`acf_by_group` (same grid, same cells, one number per
    type).

    Exact-int parity: ``F = (n·Σx² − T²) / (n·T)`` — numerator and
    denominator are exact integers (Python bigint == HUGEINT), the
    output ONE double division then a zero-digit half-away round into
    micro-units. Types with T = 0 can't occur (a type exists because
    it has events). Returns ``(event_type, n_hours, fano_micro)``
    sorted.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    HOUR_US = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(pc.is_valid(batch[type_col]),
                       pc.is_valid(batch[ts_col]))
        t = batch.select([type_col, ts_col]).filter(keep)
        hr = pc.divide(
            pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()),
            HOUR_US,
        )
        cells = pa.table({"event_type": t[type_col], "hr": hr})
        return (
            cells.group_by(["event_type", "hr"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "hr", "c"])
        )

    def fano(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("hr")
        h = pc.cast(g["hr"], pa.int64()).to_numpy(zero_copy_only=False)
        c = pc.cast(g["c"], pa.int64()).to_numpy(zero_copy_only=False)
        lo, hi = int(h[0]), int(h[-1])
        n = hi - lo + 1
        if n > max_hours:
            raise ValueError(
                f"fano_by_group: grid of {n} hours exceeds "
                f"max_hours={max_hours} — bucket time coarser"
            )
        T = sum(int(v) for v in c.tolist())
        S2 = sum(int(v) * int(v) for v in c.tolist())
        num = n * S2 - T * T
        den = n * T
        raw = 1e6 * (float(num) / float(den))
        fm = pc.cast(
            pc.round(pa.array([raw], pa.float64()), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table({
            "event_type": group["event_type"][:1],
            "n_hours": pa.array([n], pa.int64()),
            "fano_micro": fm,
        })

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hr"])
        .aggregate(Sum("c", alias_name="c"))
        .groupby("event_type")
        .map_groups(fano, batch_format="pyarrow")
        .sort("event_type")
    )


def haar_energy(events_ds, ts_col: str, type_col: str,
                levels: int = 3, max_hours: int = 100_000):
    """Per-type multi-resolution burst analysis: unnormalized Haar
    wavelet detail ENERGY of the dense hourly count series at scales
    2h, 4h, 8h… — level k's energy is Σ(pair differences)² after k−1
    rounds of pair-summing, so a series bursty at the 2-hour scale but
    calm daily lights up level 1 only (the where-is-the-variance
    complement of events_acf / events_fano).

    Exact-int parity: the transform is pure pair sums and differences
    on int64 counts (odd tails zero-padded — identical to the SQL
    replay where the missing partner simply contributes nothing), and
    each energy is an exact integer sum of squares (HUGEINT in the
    oracle). Returns ``(event_type, level, n_coeffs, energy)`` for
    levels 1..``levels``, sorted.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    if levels < 1:
        raise ValueError("levels must be >= 1")
    HOUR_US = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(pc.is_valid(batch[type_col]),
                       pc.is_valid(batch[ts_col]))
        t = batch.select([type_col, ts_col]).filter(keep)
        hr = pc.divide(
            pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()),
            HOUR_US,
        )
        cells = pa.table({"event_type": t[type_col], "hr": hr})
        return (
            cells.group_by(["event_type", "hr"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "hr", "c"])
        )

    def wavelet(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("hr")
        h = pc.cast(g["hr"], pa.int64()).to_numpy(zero_copy_only=False)
        c = pc.cast(g["c"], pa.int64()).to_numpy(zero_copy_only=False)
        lo, hi = int(h[0]), int(h[-1])
        n = hi - lo + 1
        if n > max_hours:
            raise ValueError(
                f"haar_energy: grid of {n} hours exceeds "
                f"max_hours={max_hours} — bucket time coarser"
            )
        x = np.zeros(n, np.int64)
        x[h - lo] = c
        lv, ncf, en = [], [], []
        for k in range(1, levels + 1):
            if len(x) % 2:
                x = np.append(x, 0)
            ev_, od = x[0::2], x[1::2]
            d = ev_ - od
            lv.append(k)
            ncf.append(len(d))
            en.append(sum(int(v) * int(v) for v in d.tolist()))
            x = ev_ + od
            if len(x) == 0:
                break
        return pa.table({
            "event_type": pa.array(
                [group["event_type"][0].as_py()] * len(lv), pa.string()),
            "level": pa.array(lv, pa.int64()),
            "n_coeffs": pa.array(ncf, pa.int64()),
            "energy": pa.array(en, pa.int64()),
        })

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hr"])
        .aggregate(Sum("c", alias_name="c"))
        .groupby("event_type")
        .map_groups(wavelet, batch_format="pyarrow")
        .sort(["event_type", "level"])
    )


def control_chart_by_group(events_ds, ts_col: str, type_col: str,
                           k_sigma: int = 3, max_hours: int = 100_000):
    """Shewhart control-chart violations per type: hours of the dense
    zero-filled grid whose count falls outside mean ± k·σ — the SPC
    gate on ingest volume. EXACT integer test, no sqrt: with dev_i =
    n·x_i − T (n²-scaled mean-centering) and SS = Σdev², the condition
    |x_i − μ| > k·σ becomes ``n · dev_i² > k² · SS`` — pure bigint
    cross-multiplication both engines compare identically. Returns
    ``(event_type, n_hours, n_out_of_control)`` sorted.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    HOUR_US = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(pc.is_valid(batch[type_col]),
                       pc.is_valid(batch[ts_col]))
        t = batch.select([type_col, ts_col]).filter(keep)
        hr = pc.divide(
            pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()),
            HOUR_US,
        )
        cells = pa.table({"event_type": t[type_col], "hr": hr})
        return (
            cells.group_by(["event_type", "hr"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "hr", "c"])
        )

    def chart(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("hr")
        h = pc.cast(g["hr"], pa.int64()).to_numpy(zero_copy_only=False)
        c = pc.cast(g["c"], pa.int64()).to_numpy(zero_copy_only=False)
        lo, hi = int(h[0]), int(h[-1])
        n = hi - lo + 1
        if n > max_hours:
            raise ValueError(
                f"control_chart_by_group: grid of {n} hours exceeds "
                f"max_hours={max_hours} — bucket time coarser"
            )
        x = np.zeros(n, np.int64)
        x[h - lo] = c
        T = sum(int(v) for v in x.tolist())
        dev = [int(v) * n - T for v in x.tolist()]
        SS = sum(d * d for d in dev)
        kk = k_sigma * k_sigma
        n_out = sum(1 for d in dev if n * d * d > kk * SS)
        return pa.table({
            "event_type": group["event_type"][:1],
            "n_hours": pa.array([n], pa.int64()),
            "n_out_of_control": pa.array([n_out], pa.int64()),
        })

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hr"])
        .aggregate(Sum("c", alias_name="c"))
        .groupby("event_type")
        .map_groups(chart, batch_format="pyarrow")
        .sort("event_type")
    )


def coverage_gaps_by_group(events_ds, ts_col: str, type_col: str):
    """Per-type time-coverage report: span hours, active hours,
    missing hours and the LONGEST quiet gap — the missing-data audit
    an ingestion dashboard reads before anyone trusts a trend.
    All exact int64 from the (type, hour) cells: missing = span −
    active; longest gap = max over consecutive ACTIVE hours of
    (diff − 1) — no dense grid materialized anywhere. Returns
    ``(event_type, n_hours_span, n_hours_active, n_hours_missing,
    longest_gap)`` sorted.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    HOUR_US = 3_600_000_000

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(pc.is_valid(batch[type_col]),
                       pc.is_valid(batch[ts_col]))
        t = batch.select([type_col, ts_col]).filter(keep)
        hr = pc.divide(
            pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()),
            HOUR_US,
        )
        cells = pa.table({"event_type": t[type_col], "hr": hr})
        return (
            cells.group_by(["event_type", "hr"])
            .aggregate([([], "count_all")])
            .rename_columns(["event_type", "hr", "c"])
        )

    def gaps(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("hr")
        h = pc.cast(g["hr"], pa.int64()).to_numpy(zero_copy_only=False)
        span = int(h[-1] - h[0] + 1)
        active = len(h)
        longest = int((np.diff(h) - 1).max(initial=0))
        return pa.table({
            "event_type": group["event_type"][:1],
            "n_hours_span": pa.array([span], pa.int64()),
            "n_hours_active": pa.array([active], pa.int64()),
            "n_hours_missing": pa.array([span - active], pa.int64()),
            "longest_gap": pa.array([longest], pa.int64()),
        })

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "hr"])
        .aggregate(Sum("c", alias_name="c"))
        .groupby("event_type")
        .map_groups(gaps, batch_format="pyarrow")
        .sort("event_type")
    )


def key_skew_report(ds, key_col: str):
    """Shuffle-skew audit of a prospective partition key — the number
    every engine wants BEFORE it hash-partitions 100 TB by ``key``:
    key count, max rows per key, p50/p99 rows per key, and the
    heaviest key's share. A p99/p50 ratio near 1 shuffles evenly; a
    fat top-1 share says salt this key.

    Shape: per-batch (key, n) combiner → key-cardinality groupby →
    the distribution collapses AGAIN to count-of-counts cells
    ((rows-per-key value, #keys) — tiny), so the final sweep is
    cells-sized, not key-sized. Quantiles are the discrete inverse
    CDF (``quantile_disc``: smallest count with cum ≥ q·n, exact
    integer index); top-1 share is ONE division. Returns one row
    ``(n_keys, n_rows, max_per_key, p50_per_key, p99_per_key,
    top1_share_micro)``.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def cells(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = pa.table({"k": pc.drop_null(b[key_col])})
        return (
            t.group_by(["k"]).aggregate([([], "count_all")])
            .rename_columns(["k", "n"])
        )

    per_key = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum("n", alias_name="n"))
    )

    def coc(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        n = pc.cast(b["n"], pa.int64()).to_numpy(zero_copy_only=False)
        u, c = np.unique(n, return_counts=True)
        return pa.table({
            "cnt": pa.array(u, pa.int64()),
            "keys": pa.array(c, pa.int64()),
        })

    dist = (
        per_key.map_batches(coc, batch_format="pyarrow")
        .groupby("cnt")
        .aggregate(Sum("keys", alias_name="keys"))
        .to_pandas()
    )
    import pandas as pd

    if dist.empty:
        return pd.DataFrame({
            "n_keys": [0], "n_rows": [0], "max_per_key": [0],
            "p50_per_key": [0], "p99_per_key": [0],
            "top1_share_micro": [0],
        }).astype("int64")
    dist = dist.sort_values("cnt").reset_index(drop=True)
    cnt = dist["cnt"].to_numpy(np.int64)
    keys = dist["keys"].to_numpy(np.int64)
    n_keys = int(keys.sum())
    n_rows = int((cnt * keys).sum())
    cum = np.cumsum(keys)

    def q(num: int, den: int) -> int:
        # smallest count with cum >= q * n_keys (exact integers)
        need = (num * n_keys + den - 1) // den
        return int(cnt[np.argmax(cum >= need)])

    mx = int(cnt[-1])
    raw = 1e6 * (float(mx) / float(n_rows))
    top1 = pc.cast(
        pc.round(pa.array([raw], pa.float64()), ndigits=0,
                 round_mode="half_towards_infinity"),
        pa.int64(),
    )[0].as_py()
    return pd.DataFrame({
        "n_keys": [n_keys], "n_rows": [n_rows], "max_per_key": [mx],
        "p50_per_key": [q(1, 2)], "p99_per_key": [q(99, 100)],
        "top1_share_micro": [top1],
    }).astype("int64")


def grouped_pearson(ds, group_col: str, x_col: str, y_col: str,
                    unit: float = 1.0):
    """Per-group Pearson correlation of two numeric columns — exact
    integer moments (values quantized to ``unit`` ints per row, then
    n²-scaled centered sums in Python bigints == HUGEINT), so the
    only float work is the ONE expression both engines write
    identically: ``round(1e6 · num / sqrt(dx · dy))`` (one int→double
    each, one multiply, one sqrt, one divide, one zero-digit
    half-away round). Groups with zero variance on either side are
    dropped. Returns ``(group, n, corr_micro)`` sorted by group.

    Shape: per-batch (group, n, Σx, Σy, Σx², Σy², Σxy) partials —
    group-cardinality cells, one groupby, the final arithmetic on the
    cells. OVERFLOW CONTRACT: the distributed sums are int64, so pick
    ``unit`` with ``(unit·max|v|)² · n_rows < 2^63`` (correlation is
    scale-invariant — coarse units lose only sub-unit resolution);
    the driver's n²-scaled products run in Python bigints.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.and_(pc.is_valid(batch[group_col]),
                    pc.is_valid(batch[x_col])),
            pc.is_valid(batch[y_col]),
        )
        t = batch.filter(keep)

        def q(col):
            return np.asarray(pc.cast(
                pc.round(
                    pc.multiply(pc.cast(t[col], pa.float64()),
                                float(unit)),
                    ndigits=0, round_mode="half_towards_infinity",
                ),
                pa.int64(),
            ))

        x, y = q(x_col), q(y_col)
        g = np.asarray(t[group_col].to_pylist(), dtype=object)
        u, inv = np.unique(g, return_inverse=True)
        out = {"g": pa.array(list(u), pa.string())}
        for name, v in (("n", np.ones(len(x), np.int64)), ("sx", x),
                        ("sy", y), ("sxx", x * x), ("syy", y * y),
                        ("sxy", x * y)):
            s = np.zeros(len(u), np.int64)
            np.add.at(s, inv, v)
            out[name] = pa.array(s, pa.int64())
        return pa.table(out)

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sy", alias_name="sy"),
                   Sum("sxx", alias_name="sxx"),
                   Sum("syy", alias_name="syy"),
                   Sum("sxy", alias_name="sxy"))
        .to_pandas()
    )
    import pandas as pd

    rows = []
    for r in cells.itertuples():
        n, sx, sy = int(r.n), int(r.sx), int(r.sy)
        num = n * int(r.sxy) - sx * sy
        dx = n * int(r.sxx) - sx * sx
        dy = n * int(r.syy) - sy * sy
        if n < 2 or dx <= 0 or dy <= 0:
            continue
        import math

        raw = 1e6 * (float(num) / math.sqrt(float(dx) * float(dy)))
        micro = pc.cast(
            pc.round(pa.array([raw], pa.float64()), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )[0].as_py()
        rows.append((r.g, n, micro))
    rows.sort(key=lambda t: t[0])
    return pd.DataFrame({
        "grp": [r[0] for r in rows],
        "n": [r[1] for r in rows],
        "corr_micro": [r[2] for r in rows],
    })


def user_concentration_hhi(ds, group_col: str, user_col: str,
                           n_buckets: int = 64):
    """Herfindahl–Hirschman concentration of per-user activity within
    each group: ``HHI = Σ (n_u / N)² = Σ n_u² / N²`` over the users
    active in the group — ``(group, n_users, total, hhi_micro)``
    sorted by group. The standard "is one whale driving this event
    type" diagnostic, complementing the Gini and entropy profiles.

    Shape: per-batch Arrow (group, user) count partials tagged with
    ``user & (n_buckets-1)``, one int-bucket groupby whose per-bucket
    pass finishes each (group, user) cell exactly (a user's rows
    share its bucket) and emits (group, n_users, total, Σn²)
    partials, then a group-cardinality groupby-sum. Exact int64
    throughout; the single division happens once per group."""
    import numpy as np

    mask = int(n_buckets) - 1
    if n_buckets & mask:
        raise ValueError("n_buckets must be a power of two")

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ok = pc.and_(pc.is_valid(b[group_col]),
                     pc.is_valid(b[user_col]))
        b = b.filter(ok)
        t = pa.table({
            "g": b[group_col],
            "u": pc.cast(b[user_col], pa.int64()),
        })
        c = t.group_by(["g", "u"]).aggregate([([], "count_all")])
        return pa.table({
            "bucket": pc.bit_wise_and(c["u"], mask),
            "g": c["g"],
            "u": c["u"],
            "n": pc.cast(c["count_all"], pa.int64()),
        })

    def per_bucket(t: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = t.combine_chunks()
        gcode = pc.dictionary_encode(t["g"])
        if isinstance(gcode, pa.ChunkedArray):
            gcode = gcode.combine_chunks()
        gi = np.asarray(gcode.indices, dtype=np.int64)
        u = t["u"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        ng = len(gcode.dictionary)
        # finish each (group, user) cell: combine cross-batch rows
        order = np.lexsort((u, gi))
        gi, u, n = gi[order], u[order], n[order]
        new = np.ones(len(gi), bool)
        if len(gi) > 1:
            new[1:] = (gi[1:] != gi[:-1]) | (u[1:] != u[:-1])
        starts = np.flatnonzero(new)
        cell_n = np.add.reduceat(n, starts) if len(starts) else n[:0]
        cell_g = gi[starts]
        nu = np.bincount(cell_g, minlength=ng).astype(np.int64)
        tot = np.zeros(ng, np.int64)
        np.add.at(tot, cell_g, cell_n)
        sq = np.zeros(ng, np.int64)
        np.add.at(sq, cell_g, cell_n * cell_n)
        return pa.table({
            "g": gcode.dictionary,
            "nu": pa.array(nu, pa.int64()),
            "tot": pa.array(tot, pa.int64()),
            "sq": pa.array(sq, pa.int64()),
        })

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("g")
        .sum(["nu", "tot", "sq"])
    )

    def finalize(b: pa.Table) -> pa.Table:
        nu = b["sum(nu)"].to_numpy(zero_copy_only=False)
        tot = b["sum(tot)"].to_numpy(zero_copy_only=False)
        sq = b["sum(sq)"].to_numpy(zero_copy_only=False)
        hhi = 1e6 * (sq.astype(np.float64)
                     / (tot.astype(np.float64) * tot))
        return pa.table({
            "group": b["g"],
            "n_users": pa.array(nu, pa.int64()),
            "total": pa.array(tot, pa.int64()),
            "hhi_micro": pc.cast(
                pc.round(pa.array(hhi), ndigits=0,
                         round_mode="half_towards_infinity"),
                pa.int64(),
            ),
        })

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        "group"
    )


def grouped_ols(ds, group_col: str, x_col: str, y_col: str,
                unit_x: float = 1.0, unit_y: float = 1.0):
    """Per-group simple linear regression (OLS) — exact integer
    moments (the :func:`grouped_pearson` discipline), then slope and
    intercept as the only float chains both engines write
    identically: ``slope = (nΣxy − ΣxΣy) / (nΣxx − Σx²)``,
    ``intercept = (Σy − slope·Σx) / n`` — each micro-quantized with
    one zero-digit round. Groups with n < 2 or zero x-variance are
    dropped. Returns ``(grp, n, slope_micro, intercept_micro)``
    sorted by group.

    Shape: per-batch (group, n, Σx, Σy, Σx², Σxy) partials —
    group-cardinality cells, one groupby, driver arithmetic in Python
    bigints (== HUGEINT). Same overflow contract as grouped_pearson:
    pick units with ``(unit·max|v|)² · n_rows < 2^63``."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.and_(pc.is_valid(batch[group_col]),
                    pc.is_valid(batch[x_col])),
            pc.is_valid(batch[y_col]),
        )
        t = batch.filter(keep)

        def q(col, unit):
            return np.asarray(pc.cast(
                pc.round(
                    pc.multiply(pc.cast(t[col], pa.float64()),
                                float(unit)),
                    ndigits=0, round_mode="half_towards_infinity",
                ),
                pa.int64(),
            ))

        x, y = q(x_col, unit_x), q(y_col, unit_y)
        g = np.asarray(t[group_col].to_pylist(), dtype=object)
        u, inv = np.unique(g, return_inverse=True)
        out = {"g": pa.array(list(u), pa.string())}
        for name, v in (("n", np.ones(len(x), np.int64)), ("sx", x),
                        ("sy", y), ("sxx", x * x), ("sxy", x * y)):
            s = np.zeros(len(u), np.int64)
            np.add.at(s, inv, v)
            out[name] = pa.array(s, pa.int64())
        return pa.table(out)

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sy", alias_name="sy"),
                   Sum("sxx", alias_name="sxx"),
                   Sum("sxy", alias_name="sxy"))
        .to_pandas()
    )

    def _micro(raw: float) -> int:
        return pc.cast(
            pc.round(pa.array([raw], pa.float64()), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )[0].as_py()

    rows = []
    for r in cells.itertuples():
        n, sx, sy = int(r.n), int(r.sx), int(r.sy)
        num = n * int(r.sxy) - sx * sy
        dx = n * int(r.sxx) - sx * sx
        if n < 2 or dx <= 0:
            continue
        slope = _micro(1e6 * (float(num) / float(dx)))
        intercept = _micro(
            1e6 * ((float(sy) - (float(num) / float(dx)) * float(sx))
                   / float(n))
        )
        rows.append((r.g, n, slope, intercept))
    rows.sort(key=lambda t: t[0])
    return pd.DataFrame({
        "grp": [r[0] for r in rows],
        "n": [r[1] for r in rows],
        "slope_micro": [r[2] for r in rows],
        "intercept_micro": [r[3] for r in rows],
    }).astype({"n": "int64", "slope_micro": "int64",
               "intercept_micro": "int64"})


def winsorized_mean_by_group(ds, group_col: str, val_col: str,
                             p_lo: int = 5, p_hi: int = 95,
                             cents: int = 100):
    """Per-group winsorized mean — values clamped to the group's
    exact inverse-CDF [p_lo, p_hi] percentile bounds before
    averaging: ``(group, n, lo_cents, hi_cents, wmean_cents)`` sorted
    by group. The classic outlier-robust location estimate a
    curation pipeline uses when a median is too coarse but whales
    would poison a plain mean.

    Shape: the :func:`group_quantiles` device — per-batch (group,
    value, count) histogram partials are the only data-sized
    exchange; each group's sweep (both bounds + the clamped total,
    all exact int64) runs over its value-cardinality histogram in
    one reducer. The mean is one division + zero-digit round."""
    import numpy as np
    from ray.data.aggregate import Sum

    if not (0 < p_lo < p_hi <= 100):
        raise ValueError("need 0 < p_lo < p_hi <= 100")

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.is_valid(batch[group_col]), pc.is_valid(batch[val_col])
        )
        t = batch.select([group_col, val_col]).filter(keep)
        v = pc.cast(
            pc.round(
                pc.multiply(pc.cast(t[val_col], pa.float64()),
                            float(cents)),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        cells = pa.table({group_col: t[group_col], "v": v})
        return (
            cells.group_by([group_col, "v"])
            .aggregate([([], "count_all")])
            .rename_columns([group_col, "v", "cnt"])
        )

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "v"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def sweep(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("v")
        v = pc.cast(g["v"], pa.int64()).to_numpy(zero_copy_only=False)
        c = pc.cast(g["cnt"], pa.int64()).to_numpy(zero_copy_only=False)
        n = int(c.sum())
        cum = np.cumsum(c, dtype=np.int64)
        lo = int(v[np.argmax(100 * cum >= p_lo * n)])
        hi = int(v[np.argmax(100 * cum >= p_hi * n)])
        tot = int((np.clip(v, lo, hi) * c).sum())
        wmean = pc.cast(
            pc.round(pa.array([float(tot) / float(n)], pa.float64()),
                     ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )[0].as_py()
        return pa.table({
            group_col: group[group_col][:1],
            "n": pa.array([n], pa.int64()),
            "lo_cents": pa.array([lo], pa.int64()),
            "hi_cents": pa.array([hi], pa.int64()),
            "wmean_cents": pa.array([wmean], pa.int64()),
        })

    return (
        cells.groupby(group_col)
        .map_groups(sweep, batch_format="pyarrow")
        .sort(group_col)
    )


def welch_ttest(ds, group_col: str, val_col: str, group_a: str,
                group_b: str, cents: int = 100):
    """Welch's unequal-variance t-test between two segments — one row
    ``(n_a, n_b, t_micro, df_micro)``: the A/B-comparison primitive
    (did 'purchase' values shift vs 'view'?) computed from EXACT
    integer moments. Values quantize to ``cents`` ints per row; the
    per-group (n, Σv, Σv²) cells are the only exchange; t and the
    Welch–Satterthwaite df are each ONE identical float expression
    over the six integers. Returns an empty table when either group
    has n < 2 or zero variance-sum denominator."""
    import numpy as np
    from ray.data.aggregate import Sum

    out_schema = pa.schema([
        pa.field("n_a", pa.int64()), pa.field("n_b", pa.int64()),
        pa.field("t_micro", pa.int64()), pa.field("df_micro", pa.int64()),
    ])

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.is_valid(batch[val_col]),
            pc.is_in(batch[group_col],
                     value_set=pa.array([group_a, group_b])),
        )
        t = batch.select([group_col, val_col]).filter(keep)
        v = np.asarray(pc.cast(
            pc.round(
                pc.multiply(pc.cast(t[val_col], pa.float64()),
                            float(cents)),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ))
        isa = np.asarray(
            pc.equal(t[group_col], group_a)
        ).astype(np.int64)
        rows = []
        for tag, m in (("a", isa == 1), ("b", isa == 0)):
            rows.append((tag, int(m.sum()), int(v[m].sum()),
                         int((v[m] * v[m]).sum())))
        return pa.table({
            "g": pa.array([r[0] for r in rows], pa.string()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "sv": pa.array([r[2] for r in rows], pa.int64()),
            "svv": pa.array([r[3] for r in rows], pa.int64()),
        })

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("n", alias_name="n"), Sum("sv", alias_name="sv"),
                   Sum("svv", alias_name="svv"))
        .to_pandas()
    )
    import ray.data as rd

    mm = {r.g: (int(r.n), int(r.sv), int(r.svv))
          for r in cells.itertuples()}
    na, sa, sa2 = mm.get("a", (0, 0, 0))
    nb, sb, sb2 = mm.get("b", (0, 0, 0))
    if na < 2 or nb < 2:
        return rd.from_arrow(out_schema.empty_table())
    va = na * sa2 - sa * sa
    vb = nb * sb2 - sb * sb
    Va = float(va) / (float(na) * (na - 1))
    Vb = float(vb) / (float(nb) * (nb - 1))
    u = Va / na + Vb / nb
    if u <= 0:
        return rd.from_arrow(out_schema.empty_table())
    import math

    tstat = (float(sa) / na - float(sb) / nb) / math.sqrt(u)
    dfw = (u * u) / ((Va / na) * (Va / na) / (na - 1)
                     + (Vb / nb) * (Vb / nb) / (nb - 1))

    def _micro(x):
        return pc.cast(
            pc.round(pa.array([x], pa.float64()), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )[0].as_py()

    return rd.from_arrow(pa.table({
        "n_a": pa.array([na], pa.int64()),
        "n_b": pa.array([nb], pa.int64()),
        "t_micro": pa.array([_micro(1e6 * tstat)], pa.int64()),
        "df_micro": pa.array([_micro(1e6 * dfw)], pa.int64()),
    }))


def chi_square_independence(ds, x_col: str, y_col: str):
    """Pearson chi-square independence statistic between two
    bounded-cardinality columns — one row
    ``(n, nx, ny, dof, chi2_micro)``: the drift/association test
    behind 'did the type mix change by weekday'. The contingency
    table is the only data pass (the mutual_information combiner
    shape); per cell, ``round(1e6·(o−e)²/e)`` is one identical float
    chain over exact counts (e = rx·cy/N with the HUGEINT product
    converted once), and the statistic is the order-free integer sum
    of the cell terms."""
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(pc.is_valid(batch[x_col]),
                       pc.is_valid(batch[y_col]))
        t = batch.select([x_col, y_col]).filter(keep)
        c = t.group_by([x_col, y_col]).aggregate([([], "count_all")])
        return c.rename_columns(["x", "y", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["x", "y"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    import ray.data as rd

    out_schema = pa.schema([
        pa.field("n", pa.int64()), pa.field("nx", pa.int64()),
        pa.field("ny", pa.int64()), pa.field("dof", pa.int64()),
        pa.field("chi2_micro", pa.int64()),
    ])
    if len(cells) == 0:
        return rd.from_arrow(out_schema.empty_table())
    rx: dict = {}
    cy: dict = {}
    obs: dict = {}
    for r in cells.itertuples():
        rx[r.x] = rx.get(r.x, 0) + int(r.n)
        cy[r.y] = cy.get(r.y, 0) + int(r.n)
        obs[(r.x, r.y)] = int(r.n)
    N = sum(rx.values())
    total = 0
    # full cross product: ZERO cells contribute e, not nothing —
    # skipping them understates the statistic exactly when the
    # association is strongest
    for xk, rv in rx.items():
        for yk, cv in cy.items():
            e = float(rv * cv) / float(N)
            o = float(obs.get((xk, yk), 0))
            q = pc.cast(
                pc.round(pa.array([1e6 * (((o - e) * (o - e)) / e)],
                                  pa.float64()),
                         ndigits=0,
                         round_mode="half_towards_infinity"),
                pa.int64(),
            )[0].as_py()
            total += int(q)
    return rd.from_arrow(pa.table({
        "n": pa.array([N], pa.int64()),
        "nx": pa.array([len(rx)], pa.int64()),
        "ny": pa.array([len(cy)], pa.int64()),
        "dof": pa.array([(len(rx) - 1) * (len(cy) - 1)], pa.int64()),
        "chi2_micro": pa.array([total], pa.int64()),
    }))


def js_divergence_hours(ds, type_col: str, ts_col: str,
                        type_a: str, type_b: str):
    """Jensen–Shannon divergence between two event types' hour-of-day
    EPOCH-hour distributions — one row ``(n_hours, total_a, total_b,
    js_micro)``. The bounded, symmetric drift metric the MI /
    chi-square family lacks (JS ∈ [0, ln 2]): did 'purchase' traffic
    move to different hours than 'view'.

    Parity: hour cells are exact integer counts (the only data-sized
    pass); each hour's contribution
    ``0.5·(p·ln(p/m) + q·ln(q/m))`` (p = n_a/N_a, q = n_b/N_b,
    m = (p+q)/2) is ONE identical float chain quantized to
    micro-nats per cell, and the statistic is the order-free integer
    sum — the established per-cell micro-nat device."""
    import math

    import numpy as np
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.is_valid(b[ts_col]),
            pc.is_in(b[type_col],
                     value_set=pa.array([type_a, type_b])),
        )
        t = b.filter(keep)
        hr = pc.divide(pc.cast(t[ts_col], pa.int64()), 3_600_000_000)
        hour = pc.subtract(hr, pc.multiply(pc.divide(hr, 24), 24))
        cells = pa.table({
            "h": pc.cast(hour, pa.int64()),
            "g": t[type_col],
        })
        c = cells.group_by(["h", "g"]).aggregate([([], "count_all")])
        return c.rename_columns(["h", "g", "n"])

    cells = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["h", "g"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    import ray.data as rd

    out_schema = pa.schema([
        pa.field("n_hours", pa.int64()),
        pa.field("total_a", pa.int64()), pa.field("total_b", pa.int64()),
        pa.field("js_micro", pa.int64()),
    ])
    na: dict = {}
    nb: dict = {}
    for r in cells.itertuples():
        (na if r.g == type_a else nb)[int(r.h)] = int(r.n)
    Pa, Pb = sum(na.values()), sum(nb.values())
    if Pa == 0 or Pb == 0:
        return rd.from_arrow(out_schema.empty_table())
    hours = sorted(set(na) | set(nb))
    total = 0
    for h in hours:
        ca, cb = na.get(h, 0), nb.get(h, 0)
        p = float(ca) / float(Pa)
        q = float(cb) / float(Pb)
        m = (p + q) / 2.0
        tp = p * math.log(p / m) if ca > 0 else 0.0
        tq = q * math.log(q / m) if cb > 0 else 0.0
        cell = pc.cast(
            pc.round(pa.array([1e6 * (0.5 * (tp + tq))], pa.float64()),
                     ndigits=0, round_mode="half_towards_infinity"),
            pa.int64(),
        )[0].as_py()
        total += int(cell)
    return rd.from_arrow(pa.table({
        "n_hours": pa.array([len(hours)], pa.int64()),
        "total_a": pa.array([Pa], pa.int64()),
        "total_b": pa.array([Pb], pa.int64()),
        "js_micro": pa.array([total], pa.int64()),
    }))


def runs_test_by_group(ds, group_col: str, ts_col: str, id_col: str,
                       val_col: str, cents: int = 100):
    """Wald–Wolfowitz runs test per group: is the above/below-median
    sign sequence of each type's values RANDOM in time order, or does
    it cluster (regime switching, batching artifacts, feedback)?
    Returns ``(group, n, n_above, runs, z_micro)`` sorted by group —
    z is the normal-approximation statistic
    ``(R − μ)/σ``, μ = 2n₁n₂/n + 1.

    Two passes: the exact inverse-CDF median per group (the
    group_quantiles histogram device — value-cardinality cells, one
    reducer per group), then one ordered per-group pass ((ts, id)
    sort inside ``map_groups``, Arrow out) counting sign changes.
    Values quantize to cents; ties sit BELOW the median (v > m is
    'above' — replayed identically). Groups where either side is
    empty or n < 2 are dropped; z is one identical float chain over
    four integers."""
    import numpy as np
    from ray.data.aggregate import Sum

    def cell_partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.and_(pc.is_valid(batch[group_col]),
                    pc.is_valid(batch[val_col])),
            pc.and_(pc.is_valid(batch[ts_col]),
                    pc.is_valid(batch[id_col])),
        )
        t = batch.filter(keep)
        v = pc.cast(
            pc.round(
                pc.multiply(pc.cast(t[val_col], pa.float64()),
                            float(cents)),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        cells = pa.table({group_col: t[group_col], "v": v})
        return (
            cells.group_by([group_col, "v"])
            .aggregate([([], "count_all")])
            .rename_columns([group_col, "v", "cnt"])
        )

    cells = (
        ds.map_batches(cell_partial, batch_format="pyarrow")
        .groupby([group_col, "v"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    import ray.data as rd

    out_schema = pa.schema([
        pa.field("group", pa.string()), pa.field("n", pa.int64()),
        pa.field("n_above", pa.int64()), pa.field("runs", pa.int64()),
        pa.field("z_micro", pa.int64()),
    ])
    if len(cells) == 0:
        return rd.from_arrow(out_schema.empty_table())
    medians: dict = {}
    for g, gg in cells.groupby(group_col):
        vv = gg.sort_values("v")
        v = vv["v"].to_numpy()
        c = vv["cnt"].to_numpy()
        n = int(c.sum())
        cum = np.cumsum(c)
        medians[g] = int(v[np.argmax(100 * cum >= 50 * n)])

    def per_group(t: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.and_(pc.is_valid(t[val_col]), pc.is_valid(t[ts_col])),
            pc.is_valid(t[id_col]),
        )
        t = t.filter(keep)
        if t.num_rows < 2:
            return pa.table({
                "g": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "na": pa.array([], pa.int64()),
                "r": pa.array([], pa.int64()),
            })
        g = str(t[group_col][0].as_py())
        m = medians.get(g)
        idx = pc.sort_indices(
            t, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
        )
        v = np.asarray(pc.cast(
            pc.round(
                pc.multiply(
                    pc.cast(pc.take(t[val_col], idx), pa.float64()),
                    float(cents)),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ))
        sign = (v > m).astype(np.int64)
        runs = 1 + int((sign[1:] != sign[:-1]).sum())
        return pa.table({
            "g": pa.array([g], pa.string()),
            "n": pa.array([len(v)], pa.int64()),
            "na": pa.array([int(sign.sum())], pa.int64()),
            "r": pa.array([runs], pa.int64()),
        })

    agg = (
        ds.groupby(group_col)
        .map_groups(per_group, batch_format="pyarrow")
        .to_pandas()
    )
    rows = []
    for rr in agg.itertuples():
        n, na, r = int(rr.n), int(rr.na), int(rr.r)
        n2 = n - na
        if n < 2 or na == 0 or n2 == 0:
            continue
        mu = 2.0 * na * n2 / n + 1.0
        s2 = (2.0 * na * n2 * (2.0 * na * n2 - n)) \
            / (float(n) * n * (n - 1))
        if s2 <= 0:
            continue
        import math

        z = (float(r) - mu) / math.sqrt(s2)
        zm = pc.cast(
            pc.round(pa.array([1e6 * z], pa.float64()), ndigits=0,
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )[0].as_py()
        rows.append((rr.g, n, na, r, zm))
    rows.sort(key=lambda x: x[0])
    return rd.from_arrow(pa.table({
        "group": pa.array([x[0] for x in rows], pa.string()),
        "n": pa.array([x[1] for x in rows], pa.int64()),
        "n_above": pa.array([x[2] for x in rows], pa.int64()),
        "runs": pa.array([x[3] for x in rows], pa.int64()),
        "z_micro": pa.array([x[4] for x in rows], pa.int64()),
    }))
