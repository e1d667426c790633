"""Temporal join operators the Dataset API lacks natively.

``asof_join``: for every left row, the single right row with the same
key and the greatest right time <= left time (backward as-of,
exact-match allowed — DuckDB ``ASOF JOIN`` semantics). Ray Data has no
as-of join; the distributed construction is the standard one:

    tag both streams with a side column -> union -> groupby(key)
    (THE shuffle; both streams co-partition on the join key) ->
    per-group pandas merge_asof over time-sorted frames.

Partitioning: the default path assumes per-key history fits one
reducer; ``asof_join(bucket_us=B)`` removes that assumption — rows
shuffle on (key, floor(t/B)) and a per-key carry pass over tiny bucket
summaries injects each bucket's latest preceding right row (the same
salting shape as the conversation chunker). Proven equal to the plain
path across bucket sizes in tests/test_joins.py.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _scalar_tie_cols(right_cols: list[str], right_types: dict) -> list[str]:
    """Deterministic duplicate-timestamp tie-break columns: only
    SCALAR-typed right payloads participate (sorting pandas cells that
    hold lists/arrays raises 'ambiguous truth value'). With zero scalar
    right columns, equal-timestamp winners follow shuffle arrival order
    — callers needing determinism there must add a scalar column."""
    return [f"c1_{c}" for c in right_cols if not pa.types.is_nested(right_types[c])]


def _isna_scalar(v) -> bool:
    """pd.isna that is total over list/ndarray cells (returns False)."""
    if v is None:
        return True
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


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
    dedup pass needed. The shuffle key is (key, bucket).

    Hot-key safety: within a reducer the pairing is NOT a cross merge —
    rights are time-sorted once and every left probes its (lo, hi]
    range with vectorized searchsorted, so reducer memory is
    O(rows + matching pairs), never O(nl*nr). A key with a million
    rows in one bucket costs a sort plus its true output size; shrink
    ``bucket_us`` only when the OUTPUT per (key, bucket) is itself too
    large for one worker."""
    span = hi_us - lo_us
    B = bucket_us or max(span, 1)
    # resolve the other side's column types up front: capturing a
    # Dataset handle inside a UDF closure would serialize the whole
    # plan into every task
    left_types = {c: left_ds.schema().base_schema.field(c).type for c in left_cols}
    right_types = {c: right_ds.schema().base_schema.field(c).type for c in right_cols}
    # output time columns keep the INPUT types (tz-aware timestamps /
    # plain int64 epochs round-trip; naive us is just the common case)
    lt_type = left_ds.schema().base_schema.field(left_time).type
    rt_type = right_ds.schema().base_schema.field(right_time).type

    def tag_left(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
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

        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
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

    out_cols = (
        [key]
        + [f"c0_{c}" for c in left_cols]
        + ["_t", "_rt"]
        + [f"c1_{c}" for c in right_cols]
    )

    def pair(group: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        lf = group[group["_side"] == 0]
        rf = group[group["_side"] == 1]
        if len(lf) == 0 or len(rf) == 0:
            return pd.DataFrame(columns=out_cols)
        # time-sorted rights + vectorized searchsorted range probes:
        # O(rows log rows + pairs), bounded by the true output — a hot
        # (key, bucket) never materializes the nl*nr cross product
        rf = rf.sort_values("_t", kind="mergesort")
        rt = rf["_t"].to_numpy(np.int64)
        lt = lf["_t"].to_numpy(np.int64)
        starts = np.searchsorted(rt, lt + lo_us, side="right")  # _rt > t+lo
        ends = np.searchsorted(rt, lt + hi_us, side="right")  # _rt <= t+hi
        counts = ends - starts
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame(columns=out_cols)
        li = np.repeat(np.arange(len(lf)), counts)
        offs = np.repeat(np.cumsum(counts) - counts, counts)
        ri = np.repeat(starts, counts) + np.arange(total) - offs
        lsel = (
            lf.iloc[li][[key, "_t"] + [f"c0_{c}" for c in left_cols]]
            .reset_index(drop=True)
        )
        rsel = (
            rf.iloc[ri][["_t"] + [f"c1_{c}" for c in right_cols]]
            .rename(columns={"_t": "_rt"})
            .reset_index(drop=True)
        )
        return pd.concat([lsel, rsel], axis=1)[out_cols]

    out = tl.union(tr).groupby([key, "_b"]).map_groups(pair, batch_format="pandas")

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        # pandas map_groups NaN-promotes nullable ints to float64; cast
        # every payload column back to its resolved Arrow type so the
        # output schema matches the inputs byte-for-byte
        cols = {key: batch[key]}
        for c in left_cols:
            cols[c] = pc.cast(batch[f"c0_{c}"], left_types[c])
        cols[left_time] = pc.cast(batch["_t"], lt_type)
        cols[f"{right_time}{right_suffix}"] = pc.cast(
            pc.cast(batch["_rt"], pa.int64()), rt_type
        )
        for c in right_cols:
            cols[f"{c}{right_suffix}"] = pc.cast(batch[f"c1_{c}"], right_types[c])
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
    bucket_us: int | None = None,
):
    """Backward as-of join (inner: left rows with no prior right row are
    dropped, matching DuckDB ``ASOF JOIN``). Column layout out:
    ``[key] + left_cols + [left_time] + right_cols_suffixed``.

    ``bucket_us=None``: one reducer per key (assumes per-key history
    fits a worker). ``bucket_us=B``: the SKEW-SAFE path — rows shuffle
    on (key, floor(t/B)); per-bucket matching misses only rights from
    earlier buckets, so a carry pass computes, per key, each bucket's
    latest preceding right row from tiny per-bucket summaries (one row
    per non-empty bucket) and injects it into the bucket's reducer. A
    million-event key then costs max(bucket population) per reducer,
    never the whole history."""
    if bucket_us is not None:
        return _asof_join_bucketed(
            left_ds, right_ds, key, left_time, right_time,
            left_cols, right_cols, right_suffix, bucket_us,
        )

    left_types = {c: left_ds.schema().base_schema.field(c).type for c in left_cols}
    right_types = {c: right_ds.schema().base_schema.field(c).type for c in right_cols}
    lt_type = left_ds.schema().base_schema.field(left_time).type
    rt_type = right_ds.schema().base_schema.field(right_time).type
    tie_cols = _scalar_tie_cols(right_cols, right_types)

    num_buckets = 64

    def tag(side: int, time_col: str, cols: list[str]):
        other_types = left_types if side == 1 else right_types

        def f(batch: pa.Table) -> pa.Table:
            import zlib

            u = pc.unique(batch[key].combine_chunks())
            lut = {
                v: zlib.crc32(str(v).encode()) % num_buckets
                for v in u.to_pylist()
            }
            out = {
                key: batch[key],
                "_bk": pa.array(
                    [lut[v] for v in batch[key].to_pylist()], pa.int32()
                ),
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
        # one C-level merge_asof(by=key) per HASH BUCKET of keys — a
        # per-key map_groups costs one pandas call per key (tens of
        # thousands of micro-groups was most of this join's wall time);
        # per-key matching semantics are pandas' `by` grouping, C-side
        lf = group[group["_side"] == 0].sort_values("_t", kind="mergesort")
        # deterministic tie-break on duplicate right timestamps: sort by
        # the SCALAR payload columns too, so merge_asof (which picks the
        # LAST equal-_t row per key) always picks the payload-max row,
        # independent of shuffle arrival order (list-typed payloads
        # cannot be sort keys — see _scalar_tie_cols); global _t-major
        # order keeps each key's equal-_t run in tie_cols order
        rf = group[group["_side"] == 1].sort_values(
            ["_t"] + tie_cols, kind="mergesort"
        )
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
            rf[[key, "_t", "_rt"] + [f"c1_{c}" for c in right_cols]],
            on="_t",
            by=key,
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
        .groupby("_bk")
        .map_groups(merge, batch_format="pandas")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        # cast payload columns back to their Arrow types (pandas
        # NaN-promotes nullable ints to float64 through merge_asof)
        cols = {key: batch[key]}
        for c in left_cols:
            cols[c] = pa.compute.cast(batch[f"c0_{c}"], left_types[c])
        cols[left_time] = pa.compute.cast(batch["_t"], lt_type)
        cols[f"{right_time}{right_suffix}"] = pa.compute.cast(
            pa.compute.cast(batch["_rt"], pa.int64()), rt_type
        )
        for c in right_cols:
            cols[f"{c}{right_suffix}"] = pa.compute.cast(
                batch[f"c1_{c}"], right_types[c]
            )
        return pa.table(cols)

    return out.map_batches(finalize, batch_format="pyarrow")


def _asof_join_bucketed(left_ds, right_ds, key, left_time, right_time,
                        left_cols, right_cols, right_suffix, bucket_us):
    """Skew-safe as-of join (see ``asof_join``).

    Stages (all distributed; every grouped pass runs per HASH BUCKET
    of keys with the per-(key, bucket) work done C-side in pandas —
    one Python call per micro-group was most of the join's wall time):
    1. tag both sides with (key, bucket=floor(t/B)) + the hash bucket;
    2. bucket summaries: per (key, bucket) the latest right row
       (groupby.tail(1) after the tie-break sort) plus a left-presence
       marker — both TINY (<= one row per non-empty bucket);
    3. carry: for every left bucket, the latest right row from any
       STRICTLY EARLIER bucket — itself a merge_asof(by=key,
       allow_exact_matches=False) on the bucket index, with the
       match's _b rewritten to the left bucket (the injection);
    4. final merge_asof(by=[key, bucket]) over the bucket's own rights
       plus the carry."""
    import pyarrow.compute as pc

    left_types = {c: left_ds.schema().base_schema.field(c).type for c in left_cols}
    right_types = {c: right_ds.schema().base_schema.field(c).type for c in right_cols}
    lt_type = left_ds.schema().base_schema.field(left_time).type
    rt_type = right_ds.schema().base_schema.field(right_time).type
    tie_cols = _scalar_tie_cols(right_cols, right_types)

    num_buckets = 64

    def tag(side, time_col, cols, other_types):
        def f(batch: pa.Table) -> pa.Table:
            import zlib

            t = pc.cast(batch[time_col], pa.int64())
            u = pc.unique(batch[key].combine_chunks())
            lut = {
                v: zlib.crc32(str(v).encode()) % num_buckets
                for v in u.to_pylist()
            }
            out = {
                key: batch[key],
                "_bk": pa.array(
                    [lut[v] for v in batch[key].to_pylist()], pa.int32()
                ),
                "_b": pc.cast(
                    pc.floor(pc.divide(pc.cast(t, pa.float64()), bucket_us)),
                    pa.int64(),
                ),
                "_t": t,
                "_side": pa.array([side] * len(batch), pa.int8()),
            }
            for c in cols:
                out[f"c{side}_{c}"] = batch[c]
            for c, ty in other_types.items():
                out[f"c{1 - side}_{c}"] = pa.nulls(len(batch), ty)
            return pa.table(out)

        return f

    tl = left_ds.map_batches(
        tag(0, left_time, left_cols, right_types), batch_format="pyarrow"
    )
    tr = right_ds.map_batches(
        tag(1, right_time, right_cols, left_types), batch_format="pyarrow"
    )
    # materialized ONCE: `both` feeds two branches (summaries/carry and
    # the final merge) — without pinning, Ray re-executes the whole
    # tagged lineage per branch, doubling input IO and tag CPU
    both = tl.union(tr).materialize()

    # tagged schema + pandas->arrow normalizer, shared by every grouped
    # pass below: pandas NaN-promotes the null side's columns, and
    # PANDAS-block outputs feeding a downstream shuffle are ~15x slower
    # to sort (the dedup.py prefix lesson) — every map_groups returns
    # Arrow through this
    key_type = left_ds.schema().base_schema.field(key).type
    tagged_schema = pa.schema(
        [(key, key_type), ("_bk", pa.int32()), ("_b", pa.int64()),
         ("_t", pa.int64()), ("_side", pa.int8())]
        + [(f"c0_{c}", left_types[c]) for c in left_cols]
        + [(f"c1_{c}", right_types[c]) for c in right_cols]
    )

    def to_arrow(df: pd.DataFrame) -> pa.Table:
        arrays = []
        for field in tagged_schema:
            if field.name in df.columns:
                s = df[field.name]
                try:
                    # vectorized: from_pandas=True maps NaN -> null and
                    # losslessly narrows NaN-promoted float ints
                    arrays.append(pa.array(s, type=field.type,
                                           from_pandas=True))
                except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError,
                        ValueError):
                    # _isna_scalar fallback: pd.isna on a list/ndarray
                    # cell returns an array (ambiguous truth value)
                    arrays.append(
                        pa.array(
                            [None if _isna_scalar(v) else v for v in s],
                            field.type,
                        )
                    )
            else:
                arrays.append(pa.nulls(len(df), field.type))
        return pa.Table.from_arrays(arrays, schema=tagged_schema)

    # 2. per-(key, bucket) summaries — latest right row (full payload)
    # and a left-presence marker — computed VECTORIZED per hash bucket
    # of keys: one map_groups call per distinct (key, bucket) was one
    # pandas invocation per micro-group (hundreds of thousands at
    # sf0.1, most of this join's wall time); per-bucket
    # groupby.tail/head(1) is the same selection C-side
    def summarize(group: pd.DataFrame) -> pa.Table:
        rf = group[group["_side"] == 1]
        if len(rf):
            # deterministic on duplicate max-_t rows: payload-max wins
            # (same scalar-only tie-break as the merge pass); groupby
            # preserves sort order within each (key, _b)
            rf = rf.sort_values(["_t"] + tie_cols, kind="mergesort")
            rf = rf.groupby([key, "_b"], sort=False).tail(1)
        lf = group[group["_side"] == 0]
        if len(lf):
            lf = lf.groupby([key, "_b"], sort=False).head(1)
        return to_arrow(pd.concat([rf, lf], ignore_index=True))

    summaries = both.groupby("_bk").map_groups(
        summarize, batch_format="pandas"
    )

    # 3. per-key carry walk — itself a strict-backward as-of join of
    # the left-presence markers against the right summaries on the
    # BUCKET INDEX (last right row from any strictly-earlier bucket),
    # one C-level merge_asof(by=key) per hash bucket
    def carry(group: pd.DataFrame) -> pd.DataFrame:
        rs = group[group["_side"] == 1].sort_values("_b", kind="mergesort")
        ls = group[group["_side"] == 0].sort_values("_b", kind="mergesort")
        if len(rs) == 0 or len(ls) == 0:
            return tagged_schema.empty_table()
        m = pd.merge_asof(
            ls[[key, "_b"]],  # output _b = the LEFT bucket (injection)
            rs,
            on="_b",
            by=key,
            direction="backward",
            allow_exact_matches=False,  # strictly earlier buckets only
        )
        m = m[m["_t"].notna()]  # left buckets with no prior right: drop
        return to_arrow(m[list(group.columns)])

    carries = summaries.groupby("_bk").map_groups(carry, batch_format="pandas")

    def align(batch: pa.Table) -> pa.Table:
        return batch.select(tagged_schema.names).cast(tagged_schema)

    both = both.map_batches(align, batch_format="pyarrow")

    # 4. merge with carries injected as right rows — one C-level
    # merge_asof(by=[key, _b]) per hash bucket (the carry's _b was
    # rewritten to the left bucket, so per-(key, bucket) matching
    # semantics are pandas' `by` grouping)
    def merge(group: pd.DataFrame) -> pd.DataFrame:
        lf = group[group["_side"] == 0].sort_values("_t", kind="mergesort")
        rf = group[group["_side"] == 1].sort_values(
            ["_t"] + tie_cols, kind="mergesort"
        )
        if len(lf) == 0 or len(rf) == 0:
            return pd.DataFrame(
                columns=[key]
                + [f"c0_{c}" for c in left_cols]
                + ["_t", "_rt"]
                + [f"c1_{c}" for c in right_cols]
            )
        rf = rf.assign(_rt=rf["_t"])
        m = pd.merge_asof(
            lf[[key, "_b", "_t"] + [f"c0_{c}" for c in left_cols]],
            rf[[key, "_b", "_t", "_rt"] + [f"c1_{c}" for c in right_cols]],
            on="_t",
            by=[key, "_b"],
            direction="backward",
            allow_exact_matches=True,
        )
        m = m[m["_rt"].notna()]
        return m[
            [key]
            + [f"c0_{c}" for c in left_cols]
            + ["_t", "_rt"]
            + [f"c1_{c}" for c in right_cols]
        ]

    out = (
        both.union(carries)
        .groupby("_bk")
        .map_groups(merge, batch_format="pandas")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        # cast payload columns back to their Arrow types (pandas
        # NaN-promotes nullable ints to float64 through merge_asof)
        cols = {key: batch[key]}
        for c in left_cols:
            cols[c] = pc.cast(batch[f"c0_{c}"], left_types[c])
        cols[left_time] = pc.cast(batch["_t"], lt_type)
        cols[f"{right_time}{right_suffix}"] = pc.cast(
            pc.cast(batch["_rt"], pa.int64()), rt_type
        )
        for c in right_cols:
            cols[f"{c}{right_suffix}"] = pc.cast(batch[f"c1_{c}"], right_types[c])
        return pa.table(cols)

    return out.map_batches(finalize, batch_format="pyarrow")
