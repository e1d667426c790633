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
    total_tbl = pa.table(
        {
            k1: pa.array([sentinel1]),
            k2: pa.array([sentinel2]),
            "n": pa.array([int(totals["sum(n)"])], pa.int64()),
            "sum_cents": pa.array([int(totals["sum(sum_cents)"])], pa.int64()),
        }
    )
    return level0.union(level1).union(rd.from_arrow(total_tbl))


def antijoin_counts(keep_ds, drop_ds, keep_key: str, drop_key: str,
                    label_col: str):
    """Anti-join expressed as a tag-union + per-key max — "rows of
    ``keep_ds`` whose key never appears in ``drop_ds``", aggregated to
    ``(label, n)`` counts per ``label_col`` of the kept side.

    Shape: keep rows emit ``(key, label, flag=0)``, drop-side keys emit
    ``(key, "", flag=1)``; ONE groupby(key) with (max flag, max label)
    — the label survives because the empty-string tag sorts below any
    real label — then keys with ``max_flag == 0`` are counted per
    label. No hash join, one shuffle, hot keys stay one-reducer.
    """

    def tag_keep(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "k": batch[keep_key],
                "lbl": batch[label_col],
                "flag": pa.array([0] * n, pa.int64()),
            }
        )

    def tag_drop(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table(
            {
                "k": batch[drop_key],
                "lbl": pa.array([""] * n, pa.string()),
                "flag": pa.array([1] * n, pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    tagged = keep_ds.map_batches(tag_keep, batch_format="pyarrow").union(
        drop_ds.map_batches(tag_drop, batch_format="pyarrow")
    )
    flags = tagged.groupby("k").aggregate(Max("flag"), Max("lbl"))

    def keep_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["max(flag)"], 0))
        return pa.table({"lbl": t["max(lbl)"]})

    return (
        flags.map_batches(keep_only, batch_format="pyarrow")
        .groupby("lbl")
        .count()
        .map_batches(
            lambda b: b.rename_columns(["lbl", "n"]),
            batch_format="pyarrow",
        )
    )
