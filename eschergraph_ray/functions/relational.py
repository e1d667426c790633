"""Relational shapes the Dataset API lacks natively: multi-level
rollup aggregates and anti-joins.

Both are built from the engine's cheapest primitives — the rollup
re-aggregates its own finest level instead of rescanning the input,
and the anti-join is a tag-union + per-key max (one shuffle, no hash
join, skew-safe: a hot key contributes rows to exactly one reducer).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def rollup_counts(ds, k1: str, k2: str, val_col: str,
                  sentinel1, sentinel2, cents: int = 100):
    """Two-level ``GROUP BY ROLLUP (k1, k2)``: per-(k1, k2), per-k1,
    and grand-total rows of ``(n, sum_cents)``, with rolled-up key
    positions taking the caller's sentinels (never NULL — the
    cross-engine compare stays unambiguous).

    One scan: the FINEST level is computed with a groupby over
    cent-quantized int64 values; the coarser levels re-aggregate the
    (key-cardinality-sized, materialized) finest table — the classic
    rollup optimization, no second pass over the data.
    """

    def quantize(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        xc = pc.cast(
            pc.round(
                pc.multiply(pc.cast(batch[val_col], pa.float64()),
                            float(cents)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({k1: batch[k1], k2: batch[k2], "xc": xc})

    from ray.data.aggregate import Count, Sum

    finest = (
        ds.map_batches(quantize, batch_format="pyarrow")
        .groupby([k1, k2])
        .aggregate(Count(), Sum("xc"))
        .materialize()
    )  # key-cardinality-sized

    def lvl0(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                k1: batch[k1],
                k2: batch[k2],
                "n": pc.cast(batch["count()"], pa.int64()),
                "sum_cents": pc.cast(batch["sum(xc)"], pa.int64()),
            }
        )

    level0 = finest.map_batches(lvl0, batch_format="pyarrow")

    level1 = (
        level0.groupby(k1)
        .aggregate(Sum("n"), Sum("sum_cents"))
        .map_batches(
            lambda b: pa.table(
                {
                    k1: b[k1],
                    # explicit sentinel type: an empty groupby block
                    # would otherwise infer null and alternate schemas
                    k2: pa.array([sentinel2] * len(b),
                                 pa.scalar(sentinel2).type),
                    "n": pc.cast(b["sum(n)"], pa.int64()),
                    "sum_cents": pc.cast(b["sum(sum_cents)"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    totals = level0.map_batches(
        lambda b: pa.table(
            {
                "n": pc.cast(b["n"], pa.int64()),
                "sum_cents": pc.cast(b["sum_cents"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sum(["n", "sum_cents"])
    # empty input: Ray's sum() yields None values, while SQL ROLLUP
    # still emits ONE grand-total row (count 0, NULL sum) — match it
    tot_n = totals["sum(n)"] if totals else None
    tot_s = totals["sum(sum_cents)"] if totals else None
    total_tbl = pa.table(
        {
            k1: pa.array([sentinel1], pa.scalar(sentinel1).type),
            k2: pa.array([sentinel2], pa.scalar(sentinel2).type),
            "n": pa.array([int(tot_n) if tot_n is not None else 0],
                          pa.int64()),
            "sum_cents": pa.array(
                [int(tot_s) if tot_s is not None else None], pa.int64()
            ),
        }
    )
    if tot_n is None:
        return rd.from_arrow(total_tbl)
    return level0.union(level1).union(rd.from_arrow(total_tbl))


def antijoin_counts(keep_ds, drop_ds, keep_key: str, drop_key: str,
                    label_col: str, num_partitions: int = 8):
    """Anti-join: rows of ``keep_ds`` whose key never appears in
    ``drop_ds``, aggregated to ``(lbl, n)`` counts per ``label_col``.
    Row-correct for duplicate keep-side keys and multi-label keys
    (SQL ``NOT IN`` + ``count(*)`` semantics).

    Shape: the keep side is first pre-aggregated to key-cardinality
    size (``groupby(key, label).count``), the drop side is reduced to
    DISTINCT keys with a per-batch distinct combiner, then ONE native
    ``left_anti`` hash join removes the dropped keys and a label-sized
    groupby sums the surviving counts — the exchanges move distinct
    keys/pairs, never raw rows.
    """

    def batch_distinct(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        # combiner: per-batch distinct BEFORE the global distinct, so
        # the exchange moves distinct-keys-per-batch, not every row
        return batch.select([drop_key]).group_by([drop_key]).aggregate([])

    drops = (
        drop_ds.map_batches(batch_distinct, batch_format="pyarrow")
        .groupby(drop_key)
        .count()
        .map_batches(
            lambda b: b.select([drop_key]), batch_format="pyarrow"
        )
        .repartition(num_partitions)  # normalize sparse-key empties
        .materialize()
    )

    keep_agg = (
        keep_ds.groupby([keep_key, label_col])
        .count()
        .map_batches(
            lambda b: b.rename_columns([keep_key, "lbl", "n"]),
            batch_format="pyarrow",
        )
        .repartition(num_partitions)
        .materialize()
    )  # key-cardinality-sized
    empty = pa.table(
        {
            "lbl": pa.array([], keep_ds.schema().base_schema.field(
                label_col).type),
            "n": pa.array([], pa.int64()),
        }
    )
    if keep_agg.count() == 0:
        return rd.from_arrow(empty)
    if drops.count() == 0:
        survivors = keep_agg
    else:
        survivors = keep_agg.join(
            drops,
            join_type="left_anti",
            num_partitions=num_partitions,
            on=(keep_key,),
            right_on=(drop_key,),
        ).repartition(num_partitions).materialize()
        if survivors.count() == 0:
            return rd.from_arrow(empty)

    return (
        survivors.groupby("lbl")
        .sum("n")
        .map_batches(
            lambda b: b.rename_columns(["lbl", "n"]),
            batch_format="pyarrow",
        )
    )
