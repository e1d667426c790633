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
