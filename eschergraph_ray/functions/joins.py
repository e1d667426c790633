"""Temporal join operators the Dataset API lacks natively.

``asof_join``: for every left row, the single right row with the same
key and the greatest right time <= left time (backward as-of,
exact-match allowed — DuckDB ``ASOF JOIN`` semantics). Ray Data has no
as-of join; the distributed construction is the standard one:

    tag both streams with a side column -> union -> groupby(key)
    (THE shuffle; both streams co-partition on the join key) ->
    per-group pandas merge_asof over time-sorted frames.

Partitioning assumption (documented per the brief): per-key history
fits one reducer. For skewed keys, range-bucket time within key
(key, time_bucket) and carry the last right row of bucket b-1 into
bucket b — the same salting shape as the conversation chunker.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def interval_join(
    left_ds,
    right_ds,
    key: str,
    left_time: str,
    right_time: str,
    lo_us: int,
    hi_us: int,
    left_cols: list[str],
    right_cols: list[str],
    right_suffix: str = "_right",
    bucket_us: int | None = None,
):
    """Range (interval) join: all (left, right) pairs with the same key
    and ``left_time + lo_us < right_time <= left_time + hi_us``
    (half-open lower bound — tie-safe on integer microseconds).

    Distributed construction: right rows land in ONE time bucket
    (floor(t / B)); each left row probes every bucket its interval
    covers (ceil(span/B)+1 replicas, B = span by default), so a
    matching pair meets in exactly one (key, bucket) reducer — no
    dedup pass needed. The shuffle key is (key, bucket); skewed keys
    shrink B."""
    span = hi_us - lo_us
    B = bucket_us or max(span, 1)
    # resolve the other side's column types up front: capturing a
    # Dataset handle inside a UDF closure would serialize the whole
    # plan into every task
    left_types = {c: left_ds.schema().base_schema.field(c).type for c in left_cols}
    right_types = {c: right_ds.schema().base_schema.field(c).type for c in right_cols}

    def tag_left(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pc.cast(batch[left_time], pa.int64())
        tables = []
        lo_b = pc.floor(pc.divide(pc.cast(pc.add(t, lo_us + 1), pa.float64()), B))
        hi_b = pc.floor(pc.divide(pc.cast(pc.add(t, hi_us), pa.float64()), B))
        n_buckets = (span // B) + 2
        for i in range(n_buckets):
            b = pc.add(pc.cast(lo_b, pa.int64()), i)
            keep = pc.less_equal(b, pc.cast(hi_b, pa.int64()))
            sub = {
                key: batch[key],
                "_b": b,
                "_t": t,
                "_side": pa.array([0] * len(batch), pa.int8()),
            }
            for c in left_cols:
                sub[f"c0_{c}"] = batch[c]
            for c in right_cols:
                sub[f"c1_{c}"] = pa.nulls(len(batch), right_types[c])
            tables.append(pa.table(sub).filter(keep))
        return pa.concat_tables(tables).combine_chunks()

    def tag_right(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pc.cast(batch[right_time], pa.int64())
        out = {
            key: batch[key],
            "_b": pc.cast(
                pc.floor(pc.divide(pc.cast(t, pa.float64()), B)), pa.int64()
            ),
            "_t": t,
            "_side": pa.array([1] * len(batch), pa.int8()),
        }
        for c in left_cols:
            out[f"c0_{c}"] = pa.nulls(len(batch), left_types[c])
        for c in right_cols:
            out[f"c1_{c}"] = batch[c]
        return pa.table(out)

    tl = left_ds.map_batches(tag_left, batch_format="pyarrow")
    tr = right_ds.map_batches(tag_right, batch_format="pyarrow")

    def pair(group: pd.DataFrame) -> pd.DataFrame:
        lf = group[group["_side"] == 0]
        rf = group[group["_side"] == 1]
        if len(lf) == 0 or len(rf) == 0:
            return pd.DataFrame(
                columns=[key]
                + [f"c0_{c}" for c in left_cols]
                + ["_t", "_rt"]
                + [f"c1_{c}" for c in right_cols]
            )
        m = lf[[key, "_t"] + [f"c0_{c}" for c in left_cols]].merge(
            rf[["_t"] + [f"c1_{c}" for c in right_cols]].rename(columns={"_t": "_rt"}),
            how="cross",
        )
        m = m[(m["_rt"] > m["_t"] + lo_us) & (m["_rt"] <= m["_t"] + hi_us)]
        return m[
            [key]
            + [f"c0_{c}" for c in left_cols]
            + ["_t", "_rt"]
            + [f"c1_{c}" for c in right_cols]
        ]

    out = tl.union(tr).groupby([key, "_b"]).map_groups(pair, batch_format="pandas")

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {key: batch[key]}
        for c in left_cols:
            cols[c] = batch[f"c0_{c}"]
        cols[left_time] = pc.cast(batch["_t"], pa.timestamp("us"))
        cols[f"{right_time}{right_suffix}"] = pc.cast(
            pc.cast(batch["_rt"], pa.int64()), pa.timestamp("us")
        )
        for c in right_cols:
            cols[f"{c}{right_suffix}"] = batch[f"c1_{c}"]
        return pa.table(cols)

    return out.map_batches(finalize, batch_format="pyarrow")


def asof_join(
    left_ds,
    right_ds,
    key: str,
    left_time: str,
    right_time: str,
    left_cols: list[str],
    right_cols: list[str],
    right_suffix: str = "_right",
):
    """Backward as-of join (inner: left rows with no prior right row are
    dropped, matching DuckDB ``ASOF JOIN``). Column layout out:
    ``[key] + left_cols + [left_time] + right_cols_suffixed``."""

    left_types = {c: left_ds.schema().base_schema.field(c).type for c in left_cols}
    right_types = {c: right_ds.schema().base_schema.field(c).type for c in right_cols}

    def tag(side: int, time_col: str, cols: list[str]):
        other_types = left_types if side == 1 else right_types

        def f(batch: pa.Table) -> pa.Table:
            out = {
                key: batch[key],
                "_t": pa.compute.cast(batch[time_col], pa.int64()),
                "_side": pa.array([side] * len(batch), pa.int8()),
            }
            for c in cols:
                out[f"c{side}_{c}"] = batch[c]
            # the union needs one schema: null-fill the other side's cols
            for c, t in other_types.items():
                out[f"c{1 - side}_{c}"] = pa.nulls(len(batch), t)
            return pa.table(out)

        return f

    tagged_l = left_ds.map_batches(tag(0, left_time, left_cols), batch_format="pyarrow")
    tagged_r = right_ds.map_batches(tag(1, right_time, right_cols), batch_format="pyarrow")

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        lf = group[group["_side"] == 0].sort_values("_t", kind="mergesort")
        rf = group[group["_side"] == 1].sort_values("_t", kind="mergesort")
        if len(lf) == 0 or len(rf) == 0:
            return pd.DataFrame(
                columns=[key]
                + [f"c0_{c}" for c in left_cols]
                + ["_t", "_rt"]
                + [f"c1_{c}" for c in right_cols]
            )
        rf = rf.assign(_rt=rf["_t"])
        m = pd.merge_asof(
            lf[[key, "_t"] + [f"c0_{c}" for c in left_cols]],
            rf[["_t", "_rt"] + [f"c1_{c}" for c in right_cols]],
            on="_t",
            direction="backward",
            allow_exact_matches=True,
        )
        m = m[m["_rt"].notna()]  # inner semantics
        return m[
            [key]
            + [f"c0_{c}" for c in left_cols]
            + ["_t", "_rt"]
            + [f"c1_{c}" for c in right_cols]
        ]

    out = (
        tagged_l.union(tagged_r)
        .groupby(key)
        .map_groups(merge, batch_format="pandas")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {key: batch[key]}
        for c in left_cols:
            cols[c] = batch[f"c0_{c}"]
        cols[left_time] = pa.compute.cast(batch["_t"], pa.timestamp("us"))
        cols[f"{right_time}{right_suffix}"] = pa.compute.cast(
            pa.compute.cast(batch["_rt"], pa.int64()), pa.timestamp("us")
        )
        for c in right_cols:
            cols[f"{c}{right_suffix}"] = batch[f"c1_{c}"]
        return pa.table(cols)

    return out.map_batches(finalize, batch_format="pyarrow")
