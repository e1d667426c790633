"""Incremental aggregate maintenance (materialized-view upkeep).

At 100 TB you do not rescan the corpus because one shard arrived: a
distributive aggregate (count / sum / min / max — here the hourly
event profile) is maintained by MERGING the persisted aggregate state
with the DELTA shard's aggregate — the same combiner algebra every
per-batch partial in this repo already relies on, lifted across runs.
The state is aggregate-cardinality-sized (hours × types), i.e. model
state, never data state; correctness is bit-equality with a full
recompute (the driver oracle IS the full recompute).

Restates the reference's incremental-build contract
(``eschergraph/builder/build_pipeline.py`` add-to-existing-graph
semantics) for the relational aggregate case; the KG analogue lives
in ``pipelines/build.py`` (incremental add) and
``functions/incremental_dedup.py`` (persisted dedup index probes).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def hourly_state(events_ds, type_col: str, ts_col: str, val_col: str):
    """The distributive hourly aggregate ``(event_type, hour,
    n_events, cents)`` — per-batch bucket combiner, one
    hour×type-cardinality groupby; cents are per-row micro-quantized
    then int64-summed (the events_hourly device)."""
    from ray.data.aggregate import Count, Sum

    def bucket(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(pc.is_valid(batch[type_col]),
                       pc.is_valid(batch[ts_col]))
        t = batch.filter(keep)
        hour = pc.floor_temporal(pc.cast(t[ts_col], pa.timestamp("us")),
                                 unit="hour")
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(t[val_col], pa.float64()),
                                 100.0),
                     round_mode="half_towards_infinity"),
            pa.int64(),
        )
        return pa.table({
            "event_type": t[type_col],
            "hour": hour,
            "cents": cents,
        })

    agg = (
        events_ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"),
                   Sum("cents", alias_name="cents"))
    )
    return agg.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "hour": pc.cast(t["hour"], pa.timestamp("us")),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "cents": pc.cast(t["cents"], pa.int64()),
        }),
        batch_format="pyarrow",
    )


def persist_state(state_ds, path: str) -> str:
    """Write the aggregate state once, atomically (tmp → rename; a
    crashed writer leaves no half-state). The state is
    aggregate-cardinality-sized, so a single combined file is the
    right physical layout (the round-2 row-group lesson)."""
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tbl = pa.Table.from_pandas(state_ds.to_pandas(),
                               preserve_index=False)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(tbl.combine_chunks(), tmp)
    os.replace(tmp, path)
    return path


def merge_with_state(state_path: str, delta_ds, type_col: str,
                     ts_col: str, val_col: str):
    """Persisted state + delta shard → refreshed aggregate, WITHOUT
    touching the base data: the delta aggregates (one scan of the new
    shard only), unions with the state parquet, and one
    aggregate-cardinality groupby re-combines — count and cents are
    distributive, so the merge is exact."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    base = rd.read_parquet(state_path)
    delta = hourly_state(delta_ds, type_col, ts_col, val_col)
    merged = (
        base.union(delta)
        .groupby(["event_type", "hour"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("cents", alias_name="cents"))
    )
    return merged.map_batches(
        lambda t: pa.table({
            "event_type": t["event_type"],
            "hour": pc.cast(t["hour"], pa.timestamp("us")),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "cents": pc.cast(t["cents"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort(["event_type", "hour"])
