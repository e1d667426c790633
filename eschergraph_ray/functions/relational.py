"""Relational shapes the Dataset API lacks natively: multi-level
rollup aggregates and anti-joins.

Both are built from the engine's cheapest primitives — the rollup
re-aggregates its own finest level instead of rescanning the input,
and the anti-join is a tag-union + per-key max (one shuffle, no hash
join, skew-safe: a hot key contributes rows to exactly one reducer).
"""

from __future__ import annotations

import numpy as np
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


def regional_revenue(lineitem_ds, orders_ds, customer_ds,
                     supplier_nation: dict, nation_name: dict,
                     region_nations: set, date_lo_us: int, date_hi_us: int,
                     num_partitions: int = 8):
    """TPC-H Q5-shaped star join: revenue per nation for one region and
    one order-date year, with the canonical big/small split a 100 TB
    plan needs — the two FACT tables (lineitem, orders->customer) meet
    in distributed hash joins keyed on o_orderkey, while the DIMENSION
    tables (supplier->nation map, nation names, the region's nation
    set) are broadcast into every task as plain lookup state (at this
    size a closure capture; swap for an explicit ray.put handle when a
    dimension outgrows task-arg inlining). Revenue is exact int64
    micro-units: per row round(l_extendedprice * (1 - l_discount) *
    1e6) with round-half-towards-infinity — the single-op chain DuckDB
    round() replays bit-identically — then integer sums (a per-batch
    combiner, so the final groupby moves nation-cardinality rows).
    Returns (n_name, revenue_micro) sorted (revenue desc, name)."""
    import numpy as np

    from .graph_metrics import _clamp_partitions

    P = _clamp_partitions(num_partitions)
    sup_keys = np.array(sorted(supplier_nation), dtype=np.int64)
    sup_nat = np.array([supplier_nation[k] for k in sup_keys], np.int64)
    region_arr = np.array(sorted(region_nations), dtype=np.int64)

    def ord_prep(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["o_orderdate"], pa.int64())
        keep = pc.and_(
            pc.greater_equal(ts, date_lo_us), pc.less(ts, date_hi_us)
        )
        b = b.filter(keep)
        return pa.table(
            {"o_orderkey": b["o_orderkey"], "o_custkey": b["o_custkey"]}
        )

    def cust_prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b["c_custkey"],
                "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
            }
        )

    oc = (
        orders_ds.map_batches(ord_prep, batch_format="pyarrow")
        .repartition(P)
        .join(
            customer_ds.map_batches(cust_prep, batch_format="pyarrow")
            .repartition(P),
            join_type="inner", num_partitions=P,
            on=("o_custkey",), right_on=("c_custkey",),
        )
    )

    def line_prep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = ep * (1.0 - disc) * 1e6  # same op order as the SQL
        rev_micro = np.asarray(
            pc.round(pa.array(rev), ndigits=0,
                     round_mode="half_towards_infinity")
        ).astype(np.int64)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        s_nat = sup_nat[np.searchsorted(sup_keys, sk)]
        return pa.table(
            {
                "l_orderkey": b["l_orderkey"],
                "s_nationkey": pa.array(s_nat, pa.int64()),
                "rev_micro": pa.array(rev_micro, pa.int64()),
            }
        )

    joined = (
        lineitem_ds.map_batches(line_prep, batch_format="pyarrow")
        .repartition(P)
        .join(oc.repartition(P), join_type="inner", num_partitions=P,
              on=("l_orderkey",), right_on=("o_orderkey",))
    )

    def partial(b: pa.Table) -> pa.Table:
        s_nat = b["s_nationkey"].to_numpy(zero_copy_only=False)
        c_nat = b["c_nationkey"].to_numpy(zero_copy_only=False)
        rev = b["rev_micro"].to_numpy(zero_copy_only=False)
        keep = (s_nat == c_nat) & np.isin(s_nat, region_arr)
        s_nat, rev = s_nat[keep], rev[keep]
        u, inv = np.unique(s_nat, return_inverse=True)
        part = np.zeros(len(u), np.int64)  # exact int64 combiner
        np.add.at(part, inv, rev)
        return pa.table(
            {
                "nationkey": pa.array(u, pa.int64()),
                "rev": pa.array(part, pa.int64()),
            }
        )

    agg = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("nationkey")
        .sum("rev")
    )

    def finalize(b: pa.Table) -> pa.Table:
        names = [nation_name[int(k)] for k in b["nationkey"].to_pylist()]
        return pa.table(
            {
                "n_name": pa.array(names, pa.string()),
                "revenue_micro": pc.cast(b["sum(rev)"], pa.int64()),
            }
        )

    return (
        agg.map_batches(finalize, batch_format="pyarrow")
        .sort(["revenue_micro", "n_name"], descending=[True, False])
    )


def pivot_wide(ds, key: str, pivot_col: str, categories: list[str],
               val_col: str | None = None, val_category: str | None = None,
               micros: int = 1_000_000):
    """``PIVOT``: long (key, category, value) rows to ONE wide row per
    key — ``n_<cat>`` count columns for each category in the caller's
    CLOSED list, plus optionally ``<val_category>_micros``, the
    micro-unit-quantized sum of ``val_col`` restricted to
    ``val_category`` (int64 end to end — the cross-engine float-sum
    trap never arises).

    The category list must be closed and bounded (a pivot's output
    schema IS its category list; discovering it from data would make
    the schema data-dependent — callers that need discovery run a
    cheap ``unique()`` first). Unknown categories fold into no column
    (count-only queries can pass a prefix of the real domain).

    Scale shape: each batch pre-aggregates to at most
    (distinct keys in batch) rows with ONE arrow hash-aggregate over
    if_else indicator columns (the combiner), so the groupby shuffle
    moves key-cardinality-sized partials, never events. A hot key
    costs one int64 row per batch."""
    from ray.data.aggregate import Sum

    if not categories:
        raise ValueError("categories must be a non-empty closed list")
    ncols = [f"n_{c}" for c in categories]
    vcol = f"{val_category}_micros" if val_category is not None else None
    if vcol is not None and val_col is None:
        raise ValueError("val_category requires val_col")

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        cols = {key: batch[key]}
        cat = batch[pivot_col]
        for c, nc in zip(categories, ncols):
            # NULL category counts as no category (the SQL CASE's
            # ELSE 0), never a NULL indicator — an all-NULL key would
            # otherwise sum to NULL where the oracle says 0
            cols[nc] = pc.fill_null(
                pc.cast(pc.equal(cat, c), pa.int64()), 0
            )
        if vcol is not None:
            q = pc.cast(
                pc.round(
                    pc.multiply(
                        pc.cast(pc.fill_null(batch[val_col], 0.0),
                                pa.float64()),
                        float(micros),
                    ),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
            cols[vcol] = pc.if_else(
                pc.equal(cat, val_category), q, pa.scalar(0, pa.int64())
            )
        out_cols = [c for c in cols if c != key]
        t = pa.table(cols)
        agg = pa.TableGroupBy(t, key).aggregate(
            [(c, "sum") for c in out_cols]
        )
        return agg.rename_columns([key] + out_cols)

    out_cols = ncols + ([vcol] if vcol else [])
    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(*[Sum(c) for c in out_cols])
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {key: batch[key]}
        for c in out_cols:
            cols[c] = pc.fill_null(
                pc.cast(batch[f"sum({c})"], pa.int64()), 0
            )
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow").sort(key)


def table_profile(ds, cols: list[str]):
    """Per-column data-quality profile — ``(column, n, n_null, ndv)``
    for every requested column, ordered by column name: the
    Deequ/dbt-style validation surface a pipeline runs on every new
    shard before trusting it (row counts stable? nulls crept in? key
    cardinality sane?).

    Shape: ONE streaming pass emits per-batch cells — the DISTINCT
    non-null values of every column (rendered to strings: int /
    string / timestamp renderings are trivially injective and
    float64's Arrow cast is shortest-round-trip, so distinct-on-string
    == distinct-on-value) plus one null/total counter row per column —
    then one cell-sized groupby dedupes values globally and a
    column-cardinality-sized aggregate folds the profile. Two
    cell-sized exchanges TOTAL regardless of column count (at 100 TB
    a high-NDV column would swap its distinct leg for the
    md5-replayable HLL sketch in :mod:`sketch`; the exact legs ARE
    the oracle). SQL-NDV semantics: NULLs excluded from the distinct
    count.
    """
    from ray.data.aggregate import Sum

    if not cols:
        raise ValueError("cols must be non-empty")

    def cells(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        import numpy as np

        parts = []
        for c in cols:
            valid = batch[c].drop_null()
            sv = pc.cast(valid, pa.string())
            u = pc.unique(
                sv.combine_chunks()
                if isinstance(sv, pa.ChunkedArray) else sv
            )
            k = len(u)
            parts.append(
                pa.table(
                    {
                        "column": pa.repeat(pa.scalar(c), k),
                        "v": u,
                        "is_ctr": pa.array(
                            np.zeros(k, np.int8), pa.int8()
                        ),
                        "nn_part": pa.array(np.zeros(k, np.int64)),
                        "n_part": pa.array(np.zeros(k, np.int64)),
                    }
                )
            )
            # one counter row per column: is_ctr=1 carries the batch's
            # null/total tallies (the marker keeps it disjoint from any
            # real value; Ray's shuffle rejects NULL group keys)
            parts.append(
                pa.table(
                    {
                        "column": pa.array([c], pa.string()),
                        "v": pa.array([""], pa.string()),
                        "is_ctr": pa.array([1], pa.int8()),
                        "nn_part": pa.array(
                            [len(batch) - len(valid)], pa.int64()
                        ),
                        "n_part": pa.array([len(batch)], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts).combine_chunks()

    agg = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["column", "v", "is_ctr"])
        .aggregate(Sum("nn_part", alias_name="nn"),
                   Sum("n_part", alias_name="nr"))
    )

    def fold(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        is_val = pc.equal(pc.cast(batch["is_ctr"], pa.int8()), 0)
        return pa.table(
            {
                "column": batch["column"],
                "ndv_part": pc.cast(is_val, pa.int64()),
                "nn_part": pc.if_else(
                    is_val, 0, pc.cast(pc.fill_null(batch["nn"], 0),
                                       pa.int64())
                ),
                "n_part": pc.if_else(
                    is_val, 0, pc.cast(pc.fill_null(batch["nr"], 0),
                                       pa.int64())
                ),
            }
        )

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "column": batch["column"],
                "n": pc.cast(batch["sum(n_part)"], pa.int64()),
                "n_null": pc.cast(batch["sum(nn_part)"], pa.int64()),
                "ndv": pc.cast(batch["sum(ndv_part)"], pa.int64()),
            }
        )

    return (
        agg.map_batches(fold, batch_format="pyarrow")
        .groupby("column")
        .aggregate(Sum("n_part"), Sum("nn_part"), Sum("ndv_part"))
        .map_batches(finalize, batch_format="pyarrow")
        .sort("column")
    )


def rfm_segments(orders_ds, cust_col: str, date_col: str, price_col: str,
                 k: int = 4, day_us: int = 86_400_000_000):
    """RFM quartile segmentation — the classic customer-value grid:
    per-customer Recency (latest order day), Frequency (order count)
    and Monetary (total cents) each get an ANSI ``ntile(k)`` score
    ordered value-DESC with customer-key tie-break (bucket 1 = best),
    and the output is the ≤ k³-row count of customers per
    ``(r_score, f_score, m_score)`` cell.

    Shape: the per-customer aggregate is the only data-sized exchange;
    the three ntile scores are computed in ONE bounded sweep over the
    customer-cardinality aggregate (``repartition(1)`` +
    ``batch_size=None`` — the cheap global-sweep device, no extra hash
    shuffle). Scale path: past one reducer, swap the exact ntile for
    quantile-BOUNDARY bucketing (the stats inverse-CDF device) — same
    grid, documented tie-split deviation.

    Parity: days and cents are pure ``//`` / zero-digit-round int64;
    the ntile arithmetic is the shared
    :func:`..functions.windows.ansi_ntile_positions` divmod; ordering
    ``(value DESC, custkey ASC)`` is a total order on both engines."""
    import numpy as np
    from ray.data.aggregate import Count, Max, Sum

    from .windows import ansi_ntile_positions

    out_schema = pa.schema(
        [
            ("r_score", pa.int64()),
            ("f_score", pa.int64()),
            ("m_score", pa.int64()),
            ("n_customers", pa.int64()),
        ]
    )

    def quantize(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = batch.filter(
            pc.and_(
                pc.and_(pc.is_valid(batch[cust_col]),
                        pc.is_valid(batch[date_col])),
                pc.is_valid(batch[price_col]),
            )
        )
        day = pc.multiply(
            pc.divide(
                pc.cast(pc.cast(t[date_col], pa.timestamp("us")),
                        pa.int64()),
                day_us,
            ),
            day_us,
        )
        cents = pc.cast(
            pc.round(
                pc.multiply(pc.cast(t[price_col], pa.float64()), 100.0),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({cust_col: t[cust_col], "day": day, "cents": cents})

    agg = (
        orders_ds.map_batches(quantize, batch_format="pyarrow")
        .groupby(cust_col)
        .aggregate(
            Max("day", alias_name="rec"),
            Count(alias_name="freq"),
            Sum("cents", alias_name="mon"),
        )
        # the sweep below repartition(1)s anyway; materializing here
        # lets the empty input short-circuit (schema-less empty
        # aggregate blocks are the known Ray 2.49 trap)
        .materialize()
    )
    if agg.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    def sweep(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        n = batch.num_rows
        if n == 0:
            return out_schema.empty_table()
        cust = pc.cast(batch[cust_col], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        cols = {}
        for src, name in (("rec", "r_score"), ("freq", "f_score"),
                          ("mon", "m_score")):
            v = pc.cast(batch[src], pa.int64()).to_numpy(
                zero_copy_only=False
            )
            order = np.lexsort((cust, -v))  # value DESC, custkey ASC
            s = np.empty(n, np.int64)
            s[order] = ansi_ntile_positions(n, k)
            cols[name] = pa.array(s)
        cells = (
            pa.table(cols)
            .group_by(["r_score", "f_score", "m_score"])
            .aggregate([([], "count_all")])
            .rename_columns(["r_score", "f_score", "m_score",
                             "n_customers"])
        )
        return cells.set_column(
            3, "n_customers", pc.cast(cells["n_customers"], pa.int64())
        )

    return (
        agg.repartition(1)
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .sort(["r_score", "f_score", "m_score"])
    )


def pareto_deciles(orders_ds, key_col: str, price_col: str, k: int = 10):
    """Revenue-concentration (Lorenz/Pareto) deciles: keys ranked by
    total spend DESC are cut into ``k`` ANSI ntile buckets and each
    bucket reports ``(n_keys, cents, cum_cents, share_micro)`` — the
    "top 10% of customers carry X% of revenue" curve, the concentration
    complement of the Gini diagnostic.

    Same dataflow as :func:`rfm_segments`: the per-key cents aggregate
    is the only data-sized exchange; ranking + bucket sums + the
    cumulative sweep all happen in one bounded pass over the
    key-cardinality aggregate. ``share_micro = round(1e6·cum/total)``
    is the single reporting division — the int64 product is formed
    first on both engines, then ONE double divide + zero-digit round."""
    import numpy as np
    from ray.data.aggregate import Sum

    from .windows import ansi_ntile_positions

    out_schema = pa.schema(
        [
            ("decile", pa.int64()),
            ("n_keys", pa.int64()),
            ("cents", pa.int64()),
            ("cum_cents", pa.int64()),
            ("share_micro", pa.int64()),
        ]
    )

    def quantize(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = batch.filter(
            pc.and_(pc.is_valid(batch[key_col]),
                    pc.is_valid(batch[price_col]))
        )
        cents = pc.cast(
            pc.round(
                pc.multiply(pc.cast(t[price_col], pa.float64()), 100.0),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({key_col: t[key_col], "cents": cents})

    agg = (
        orders_ds.map_batches(quantize, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("cents", alias_name="cents"))
        .materialize()
    )
    if agg.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    def sweep(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        n = batch.num_rows
        if n == 0:
            return out_schema.empty_table()
        key = pc.cast(batch[key_col], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        v = pc.cast(batch["cents"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        order = np.lexsort((key, -v))  # spend DESC, key ASC
        tiles = np.empty(n, np.int64)
        tiles[order] = ansi_ntile_positions(n, k)
        n_keys = np.bincount(tiles, minlength=k + 1)[1:]
        cents = np.zeros(k, np.int64)  # exact int64 segment sums
        np.add.at(cents, tiles - 1, v)
        present = n_keys > 0
        cum = np.cumsum(cents, dtype=np.int64)
        total = int(cum[-1])
        share = pc.cast(
            pc.round(
                pa.array((cum * 1_000_000).astype(np.float64)
                         / float(total)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        dec = np.arange(1, k + 1, dtype=np.int64)
        return pa.table(
            {
                "decile": pa.array(dec[present]),
                "n_keys": pa.array(n_keys[present]),
                "cents": pa.array(cents[present]),
                "cum_cents": pa.array(cum[present]),
                "share_micro": pa.array(share[present]),
            }
        )

    return (
        agg.repartition(1)
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .sort("decile")
    )


def cube_counts(ds, k1: str, k2: str, val_col: str,
                sentinel1, sentinel2, scale: float = 1_000_000.0):
    """Two-key ``GROUP BY CUBE (k1, k2)``: the four grouping sets
    (k1,k2), (k1), (k2) and () with rolled-up key positions taking the
    caller's sentinels — completes the grouping-sets family next to
    :func:`rollup_counts` (which lacks the (k2) set).

    Same one-scan plan as the rollup: the FINEST level is the only
    data-sized exchange (values quantized to int64 ``scale`` units);
    the three coarser levels re-aggregate the cell-cardinality finest
    table. Empty input yields the single grand-total row SQL CUBE
    emits (n 0, NULL sum)."""
    from ray.data.aggregate import Count, Sum

    def quantize(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = batch.filter(
            pc.and_(
                pc.and_(pc.is_valid(batch[k1]), pc.is_valid(batch[k2])),
                pc.is_valid(batch[val_col]),
            )
        )
        xc = pc.cast(
            pc.round(
                pc.multiply(pc.cast(t[val_col], pa.float64()), scale),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({k1: t[k1], k2: t[k2], "xc": xc})

    finest = (
        ds.map_batches(quantize, batch_format="pyarrow")
        .groupby([k1, k2])
        .aggregate(Count(), Sum("xc"))
        .materialize()
    )  # cell-cardinality-sized

    t1 = pa.scalar(sentinel1).type
    t2 = pa.scalar(sentinel2).type

    def lvl0(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                k1: batch[k1],
                k2: batch[k2],
                "n": pc.cast(batch["count()"], pa.int64()),
                "sum_micro": pc.cast(batch["sum(xc)"], pa.int64()),
            }
        )

    level0 = finest.map_batches(lvl0, batch_format="pyarrow")

    def roll(key, sentinel, sentinel_type):
        return (
            level0.groupby(key)
            .aggregate(Sum("n"), Sum("sum_micro"))
            .map_batches(
                lambda b: pa.table(
                    {
                        k1: (b[k1] if key == k1 else pa.array(
                            [sentinel] * len(b), sentinel_type)),
                        k2: (b[k2] if key == k2 else pa.array(
                            [sentinel] * len(b), sentinel_type)),
                        "n": pc.cast(b["sum(n)"], pa.int64()),
                        "sum_micro": pc.cast(b["sum(sum_micro)"],
                                             pa.int64()),
                    }
                ),
                batch_format="pyarrow",
            )
        )

    level_k1 = roll(k1, sentinel2, t2)
    level_k2 = roll(k2, sentinel1, t1)

    totals = level0.map_batches(
        lambda b: b.select(["n", "sum_micro"]), batch_format="pyarrow"
    ).sum(["n", "sum_micro"])
    tot_n = totals["sum(n)"] if totals else None
    tot_s = totals["sum(sum_micro)"] if totals else None
    total_tbl = pa.table(
        {
            k1: pa.array([sentinel1], t1),
            k2: pa.array([sentinel2], t2),
            "n": pa.array([int(tot_n) if tot_n is not None else 0],
                          pa.int64()),
            "sum_micro": pa.array(
                [int(tot_s) if tot_s is not None else None], pa.int64()
            ),
        }
    )
    if tot_n is None:
        return rd.from_arrow(total_tbl)
    return (
        level0.union(level_k1)
        .union(level_k2)
        .union(rd.from_arrow(total_tbl))
    )


def rank_delta_periods(ds, key_col: str, period_col: str,
                       val_micro_col: str,
                       max_rows: int = 2_000_000):
    """Two-period trending-rank comparison: sum ``val_micro_col`` per
    (key, period), pick the EARLIEST and LATEST period present in the
    data, rank keys inside each by (value desc, key asc — a total
    order, so rank fenceposts are deterministic), and report the rank
    movement of every key present in BOTH periods. The
    "what's-trending / what collapsed" leaderboard-diff every
    analytics pipeline ships.

    Shape: ONE groupby collapses the fact stream to the
    (key × period)-cardinality aggregate; the rank/diff pass runs on
    that dimension-sized table driver-side (leaderboards are model
    state, like k-means centroids — a key space too large to rank on
    the driver has no readable leaderboard either). ``max_rows``
    makes that assumption LOUD: past it the op raises instead of
    OOMing the driver (the max_vocab_broadcast device). Inputs must
    already be integer micro-units; sums are exact int64.

    Returns ``(key, period_a, period_b, val_a_micro, val_b_micro,
    rank_a, rank_b, rank_delta)`` sorted by (rank_delta desc, key) —
    positive delta = climbed. Empty input -> zero rows.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    aggm = (
        ds.groupby([key_col, period_col])
        .aggregate(Sum(val_micro_col, alias_name="val"))
        .materialize()
    )
    n_cells = aggm.count()
    if n_cells > max_rows:
        raise ValueError(
            f"rank_delta_periods: {n_cells} (key, period) cells exceed "
            f"max_rows={max_rows} — the leaderboard rank/diff pass is "
            "driver-side model state; pre-filter the key space (top-N "
            "per period) or raise max_rows deliberately"
        )
    agg = aggm.take_all()
    empty = pa.table(
        {
            "key": pa.array([], pa.string()),
            "period_a": pa.array([], pa.int64()),
            "period_b": pa.array([], pa.int64()),
            "val_a_micro": pa.array([], pa.int64()),
            "val_b_micro": pa.array([], pa.int64()),
            "rank_a": pa.array([], pa.int64()),
            "rank_b": pa.array([], pa.int64()),
            "rank_delta": pa.array([], pa.int64()),
        }
    ).rename_columns([key_col, "period_a", "period_b", "val_a_micro",
                      "val_b_micro", "rank_a", "rank_b", "rank_delta"])
    if not agg:
        return rd.from_arrow(empty)
    periods = sorted({int(r[period_col]) for r in agg})
    pa_, pb = periods[0], periods[-1]
    if pa_ == pb:
        return rd.from_arrow(empty)

    def ranks(period):
        rows = sorted(
            ((int(r["val"]), r[key_col]) for r in agg
             if int(r[period_col]) == period),
            key=lambda t: (-t[0], t[1]),
        )
        return {k: (i + 1, v) for i, (v, k) in enumerate(rows)}

    ra, rb = ranks(pa_), ranks(pb)
    both = sorted(set(ra) & set(rb))
    out = sorted(
        (
            (k, ra[k][1], rb[k][1], ra[k][0], rb[k][0],
             ra[k][0] - rb[k][0])
            for k in both
        ),
        key=lambda t: (-t[5], t[0]),
    )
    return rd.from_arrow(
        pa.table(
            {
                key_col: pa.array([t[0] for t in out]),
                "period_a": pa.array([pa_] * len(out), pa.int64()),
                "period_b": pa.array([pb] * len(out), pa.int64()),
                "val_a_micro": pa.array([t[1] for t in out], pa.int64()),
                "val_b_micro": pa.array([t[2] for t in out], pa.int64()),
                "rank_a": pa.array([t[3] for t in out], pa.int64()),
                "rank_b": pa.array([t[4] for t in out], pa.int64()),
                "rank_delta": pa.array([t[5] for t in out], pa.int64()),
            }
        )
    )


def top_unshipped_orders(customer_ds, orders_ds, lineitem_ds, segment: str,
                         cutoff_us: int, k: int = 10,
                         num_partitions: int = 8):
    """TPC-H Q3-shaped shipping-priority query: top-k orders by OPEN
    revenue for one market segment — orders placed before the cutoff
    whose lineitems ship after it.

    The 100 TB split: the segment's customers SEMI-join out the orders
    fact (native left_semi — no payload moves), lineitem revenue
    pre-aggregates per order in a per-batch int64 combiner so the one
    fact-fact hash join moves order-cardinality rows, never raw
    lineitems. Revenue is exact micro-units (the regional_revenue
    one-op chain: round(extendedprice * (1 - discount) * 1e6) half-
    towards-infinity, then integer sums). Returns (o_orderkey,
    o_orderdate_us, o_orderpriority, revenue_micro) top-k by
    (revenue desc, orderdate, orderkey)."""
    import numpy as np

    from .graph_metrics import _clamp_partitions

    P = _clamp_partitions(num_partitions)
    empty = pa.table(
        {
            "o_orderkey": pa.array([], pa.int64()),
            "o_orderdate_us": pa.array([], pa.int64()),
            "o_orderpriority": pa.array([], pa.string()),
            "revenue_micro": pa.array([], pa.int64()),
        }
    )
    import ray.data as rd

    cust = customer_ds.map_batches(
        lambda b: b.filter(pc.equal(b["c_mktsegment"], segment)).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    ).repartition(P).materialize()
    if cust.count() == 0:
        return rd.from_arrow(empty)

    def ord_prep(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["o_orderdate"], pa.int64())
        b = b.filter(pc.less(ts, cutoff_us))
        return pa.table(
            {
                "o_orderkey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "o_orderdate_us": pc.cast(b["o_orderdate"], pa.int64()),
                "o_orderpriority": b["o_orderpriority"],
            }
        )

    orders = (
        orders_ds.map_batches(ord_prep, batch_format="pyarrow")
        .repartition(P)
        .join(cust, join_type="left_semi", num_partitions=P,
              on=("o_custkey",), right_on=("c_custkey",))
        .repartition(P)
        .materialize()
    )
    if orders.count() == 0:
        return rd.from_arrow(empty)

    def line_prep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ts = pc.cast(b["l_shipdate"], pa.int64())
        b = b.filter(pc.greater(ts, cutoff_us))
        ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        rev = ep * (1.0 - disc) * 1e6  # same op order as the SQL
        rev_micro = np.asarray(
            pc.round(pa.array(rev), ndigits=0,
                     round_mode="half_towards_infinity")
        ).astype(np.int64)
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(ok, return_inverse=True)
        part = np.zeros(len(u), np.int64)  # exact int64 combiner
        np.add.at(part, inv, rev_micro)
        return pa.table(
            {
                "l_orderkey": pa.array(u, pa.int64()),
                "rev": pa.array(part, pa.int64()),
            }
        )

    rev = (
        lineitem_ds.map_batches(line_prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .sum("rev")
        .map_batches(
            lambda b: b.rename_columns(["l_orderkey", "revenue_micro"]),
            batch_format="pyarrow",
        )
        .repartition(P)
        .materialize()
    )
    if rev.count() == 0:
        return rd.from_arrow(empty)

    joined = rev.join(
        orders, join_type="inner", num_partitions=P,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
                "o_orderdate_us": pc.cast(b["o_orderdate_us"], pa.int64()),
                "o_orderpriority": b["o_orderpriority"],
                "revenue_micro": pc.cast(b["revenue_micro"], pa.int64()),
            }
        )

    return (
        joined.map_batches(finalize, batch_format="pyarrow")
        .sort(["revenue_micro", "o_orderdate_us", "o_orderkey"],
              descending=[True, False, False])
        .limit(k)
    )


def skyline_2d(ds, id_col: str, min_col: str, max_col: str,
               cents: int = 100, max_candidates: int = 5_000_000):
    """2-D skyline (Pareto frontier): rows not DOMINATED by any other
    row, minimizing ``min_col`` while maximizing ``max_col`` — the
    classic multi-criteria shortlist (Börzsönyi/Kossmann/Stocker,
    ICDE 2001 "The Skyline Operator"). y dominates x iff
    ``y.min <= x.min AND y.max >= x.max`` with at least one strict;
    exact duplicates of a frontier point all survive (matches the SQL
    ``NOT EXISTS`` predicate verbatim).

    The 100 TB shape: the skyline is DISTRIBUTIVE — a global frontier
    point is a frontier point of every subset containing it — so pass
    1 computes each block's local skyline with a vectorized kernel
    (sort-free: per-price group-max + exclusive running max, pure
    numpy), shrinking each block to its frontier (typically
    O(log n) of it); pass 2 runs the same kernel once over the tiny
    union. No shuffle at all — the only materialization is the
    candidate union, guarded by ``max_candidates`` (a loud ValueError,
    never an OOM). ``min_col`` is cent-quantized int64 (zero-digit
    half-away round, both engines identical); ``max_col`` is cast
    int64.

    Returns ``(id_col, price_cents, size)`` sorted by
    (price_cents asc, size desc, id asc).
    """
    import ray.data as rd

    def _frontier_mask(price, size):
        """Bool mask of non-dominated points. Survive iff size equals
        the max size of the OWN price group AND strictly exceeds the
        max size over all strictly cheaper groups."""
        up, inv = np.unique(price, return_inverse=True)
        gmax = np.full(len(up), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(gmax, inv, size)
        run = np.maximum.accumulate(gmax)
        excl = np.empty(len(up), np.int64)
        excl[0] = np.iinfo(np.int64).min
        excl[1:] = run[:-1]
        return (size == gmax[inv]) & (size > excl[inv])

    def _kernel(batch: pa.Table, quantized: bool) -> pa.Table:
        """``quantized=False``: pass 1 over raw (min_col, max_col)
        input; ``True``: pass 2 over pass 1's own output schema — an
        explicit flag, never sniffed from column names (a user column
        that happens to be called price_cents must still quantize)."""
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "price_cents": pa.array([], pa.int64()),
                    "size": pa.array([], pa.int64()),
                }
            )
        if quantized:  # pass 2: pass 1 already quantized
            price = batch["price_cents"].to_numpy(zero_copy_only=False)
            size = batch["size"].to_numpy(zero_copy_only=False)
        else:
            price = np.asarray(
                pc.cast(
                    pc.round(
                        pc.multiply(pc.cast(batch[min_col], pa.float64()),
                                    float(cents)),
                        ndigits=0,
                        round_mode="half_towards_infinity",
                    ),
                    pa.int64(),
                )
            )
            size = np.asarray(pc.cast(batch[max_col], pa.int64()))
        keep = _frontier_mask(price, size)
        m = pa.array(keep)
        return pa.table(
            {
                id_col: pc.cast(pc.filter(batch[id_col], m), pa.int64()),
                "price_cents": pa.array(price[keep], pa.int64()),
                "size": pa.array(size[keep], pa.int64()),
            }
        )

    cand = ds.map_batches(
        lambda b: _kernel(b, quantized=False), batch_format="pyarrow"
    ).materialize()
    n_cand = cand.count()
    if n_cand == 0:
        # fresh from_arrow table: an empty MATERIALIZED dataset loses
        # its schema on to_pandas (the round-4 empty-dataset trap)
        return rd.from_arrow(
            pa.schema(
                [(id_col, pa.int64()), ("price_cents", pa.int64()),
                 ("size", pa.int64())]
            ).empty_table()
        )
    if n_cand > max_candidates:
        raise ValueError(
            f"skyline_2d: {n_cand} local-frontier candidates exceed "
            f"max_candidates={max_candidates}; the input's frontier is "
            "degenerate (near-total ordering by both criteria) — raise "
            "the guard or pre-bucket the min_col range"
        )
    return (
        cand.repartition(1)
        .map_batches(
            lambda b: _kernel(b, quantized=True),
            batch_format="pyarrow", batch_size=None,
        )
        .sort(["price_cents", "size", id_col],
              descending=[False, True, False])
    )


def order_count_distribution(customer_ds, orders_ds,
                             exclude_priority: str):
    """TPC-H Q13-shaped customer-distribution query: how many
    customers placed exactly k qualifying orders, INCLUDING the
    zero-order bucket the plain groupby can't see (Q13's left join
    exists only to count the silent customers).

    The 100 TB split: no join at all — per-customer counts are one
    groupby over the (filtered) orders fact; the distribution is a
    second groupby over that customer-cardinality table; the
    zero-order bucket is arithmetic (total customers − customers with
    ≥1 qualifying order, two scalar counts). Assumes orders⊂customers
    referential integrity (TPC-H guarantees it; an orphan custkey
    would count as a customer). Returns ``(c_count, custdist)``
    sorted by (custdist desc, c_count desc); the zero row appears
    only when such customers exist, matching the SQL's
    ``HAVING custdist > 0`` framing.
    """
    import ray.data as rd

    total_customers = customer_ds.count()

    counts = (
        orders_ds.map_batches(
            lambda b: b.filter(
                pc.not_equal(b["o_orderpriority"], exclude_priority)
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        )
        .groupby("o_custkey")
        .count()
        .materialize()  # customer-cardinality
    )
    with_orders = counts.count()

    dist = (
        counts.map_batches(
            lambda b: pa.table(
                {"c_count": pc.cast(b["count()"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .groupby("c_count")
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "c_count": pc.cast(b["c_count"], pa.int64()),
                    "custdist": pc.cast(b["count()"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )
    zero = total_customers - with_orders
    if zero > 0:
        dist = dist.union(
            rd.from_arrow(
                pa.table(
                    {
                        "c_count": pa.array([0], pa.int64()),
                        "custdist": pa.array([zero], pa.int64()),
                    }
                )
            )
        )
    return dist.sort(["custdist", "c_count"], descending=[True, True])


def cohort_ltv(orders_ds, cust_col: str, date_col: str, price_col: str,
               n_buckets: int = 1024):
    """Cohort lifetime-value matrix — customers grouped by the month
    of their FIRST order, then revenue tracked by month-age since
    that cohort month: ``(cohort_month, age_months, n_orders,
    revenue_micro)`` — the classic retention/LTV triangle every
    subscription and marketplace team reads.

    No join anywhere: per-batch combiners collapse orders to
    (customer, month) cells (customer-month cardinality, the only
    data-sized exchange); cells group by ``custkey & (n_buckets−1)``
    so the first-month lookup is ONE lexsort + run-length broadcast
    per bucket (never a per-customer micro-group — the round-5
    map_groups lesson), and only (cohort, age) partials leave the
    bucket. Revenue is per-order micro-quantized (``round(p*1e6,
    0)``) then summed in int64. Sorted by (cohort_month, age_months).
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    from ray.data.aggregate import Sum

    EPOCH_MONTHS = 1970 * 12

    def cells(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        b = b.filter(pc.and_(pc.is_valid(b[cust_col]),
                             pc.is_valid(b[date_col])))
        ts = np.asarray(
            pc.cast(pc.cast(b[date_col], pa.timestamp("us")), pa.int64())
        ).astype("datetime64[us]")
        m = ts.astype("datetime64[M]").astype(np.int64) + EPOCH_MONTHS
        cust = b[cust_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.asarray(
            pc.cast(
                pc.round(
                    pc.multiply(pc.cast(b[price_col], pa.float64()), 1e6),
                    ndigits=0, round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
        )
        # combine to (cust, month) cells inside the batch
        key = cust * 200_000 + m  # month index < 200k for any date
        uk, inv = np.unique(key, return_inverse=True)
        n = np.zeros(len(uk), np.int64)
        s = np.zeros(len(uk), np.int64)
        np.add.at(n, inv, 1)
        np.add.at(s, inv, v)
        uc, um = uk // 200_000, uk % 200_000
        return pa.table({
            "bucket": pa.array(np.bitwise_and(uc, n_buckets - 1),
                               pa.int64()),
            "cust": pa.array(uc, pa.int64()),
            "m": pa.array(um, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "v": pa.array(s, pa.int64()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        c = g["cust"].to_numpy(zero_copy_only=False)
        m = g["m"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        v = g["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((m, c))
        c, m, n, v = c[order], m[order], n[order], v[order]
        first = np.ones(len(c), bool)
        first[1:] = c[1:] != c[:-1]
        # run-length broadcast of each customer's first (= min) month
        cohort = np.repeat(m[first], np.diff(
            np.append(np.flatnonzero(first), len(c))))
        age = m - cohort
        key = cohort * 4096 + age  # age bounded by the month span
        uk, inv = np.unique(key, return_inverse=True)
        nn = np.zeros(len(uk), np.int64)
        vv = np.zeros(len(uk), np.int64)
        np.add.at(nn, inv, n)
        np.add.at(vv, inv, v)
        return pa.table({
            "cohort_m": pa.array(uk // 4096, pa.int64()),
            "age_months": pa.array(uk % 4096, pa.int64()),
            "n": pa.array(nn, pa.int64()),
            "v": pa.array(vv, pa.int64()),
        })

    agg = (
        orders_ds.map_batches(cells, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby(["cohort_m", "age_months"])
        .aggregate(Sum("n", alias_name="n_orders"),
                   Sum("v", alias_name="revenue_micro"))
    )

    def finish(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        cm = b["cohort_m"].to_numpy(zero_copy_only=False)
        label = (cm - EPOCH_MONTHS).astype("datetime64[M]").astype(str)
        return pa.table({
            "cohort_month": pa.array(label, pa.string()),
            "age_months": pc.cast(b["age_months"], pa.int64()),
            "n_orders": pc.cast(b["n_orders"], pa.int64()),
            "revenue_micro": pc.cast(b["revenue_micro"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow").sort(
        ["cohort_month", "age_months"]
    )


def abc_classes(orders_ds, key_col: str, price_col: str,
                a_pct: int = 80, b_pct: int = 95):
    """ABC (Pareto) classification of keys by cumulative revenue
    share — A while the running DESC-spend cumulative stays within
    ``a_pct``% of total, B within ``b_pct``%, else C: the inventory /
    curation triage the decile view (:func:`pareto_deciles`) doesn't
    directly give. Returns ``(abc_class, n_keys, cents,
    share_micro)`` sorted by class.

    Same dataflow as pareto_deciles: the per-key cents aggregate is
    the only data-sized exchange; the classification sweep runs once
    over the key-cardinality table. Parity: the class rule is pure
    integer cross-multiplication (``cum·100 ≤ total·pct`` — no
    division), per-class share is ONE double divide + zero-digit
    round over exact Python-int products (no int64 overflow at any
    scale).
    """
    if not 0 < a_pct < b_pct < 100:
        raise ValueError("need 0 < a_pct < b_pct < 100")
    from ray.data.aggregate import Sum

    out_schema = pa.schema([
        ("abc_class", pa.string()),
        ("n_keys", pa.int64()),
        ("cents", pa.int64()),
        ("share_micro", pa.int64()),
    ])

    def quantize(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = batch.filter(
            pc.and_(pc.is_valid(batch[key_col]),
                    pc.is_valid(batch[price_col]))
        )
        cents = pc.cast(
            pc.round(
                pc.multiply(pc.cast(t[price_col], pa.float64()), 100.0),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({key_col: t[key_col], "cents": cents})

    agg = (
        orders_ds.map_batches(quantize, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("cents", alias_name="cents"))
        .materialize()
    )
    if agg.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    def sweep(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        if batch.num_rows == 0:
            return out_schema.empty_table()
        key = pc.cast(batch[key_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        v = pc.cast(batch["cents"], pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.lexsort((key, -v))
        v = v[order]
        cum = np.cumsum(v, dtype=np.int64)
        total = int(cum[-1])
        cls = np.where(
            cum * 100 <= total * a_pct, 0,
            np.where(cum * 100 <= total * b_pct, 1, 2),
        )
        rows = []
        for ci, name in enumerate(("A", "B", "C")):
            m = cls == ci
            if not m.any():
                continue
            c_sum = int(v[m].sum())
            share = pc.cast(
                pc.round(
                    pa.array([float(c_sum * 1_000_000) / float(total)],
                             pa.float64()),
                    ndigits=0, round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )[0].as_py()
            rows.append((name, int(m.sum()), c_sum, share))
        return pa.table({
            "abc_class": pa.array([r[0] for r in rows], pa.string()),
            "n_keys": pa.array([r[1] for r in rows], pa.int64()),
            "cents": pa.array([r[2] for r in rows], pa.int64()),
            "share_micro": pa.array([r[3] for r in rows], pa.int64()),
        })

    return (
        agg.repartition(1)
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .sort("abc_class")
    )
