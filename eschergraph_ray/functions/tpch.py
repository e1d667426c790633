"""Classic warehouse query shapes over the TPC-H-ish test tables that
the registry did not yet cover: promo revenue share (Q14), small-
quantity revenue (Q17), large-volume orders (Q18), two-nation volume
shipping (Q7), returned-item revenue (Q10), and an OR-of-ANDs banded
revenue filter (Q19).

House rules shared with :mod:`.relational`: money is exact int64
micro-units via the one-op chain ``round(extendedprice * (1 -
discount) * 1e6)`` with half-towards-infinity (DuckDB ``round()``
replays it bit-identically); per-batch int64 combiners shrink every
fact stream to key cardinality before any shuffle; dimension lookups
(part flags, supplier nations, name maps) are broadcast as sorted
numpy arrays searched with ``searchsorted`` — ``ray.put`` handles at
the size where task-arg inlining stops being free; fact-fact meets are
distributed hash joins with the clamp/repartition/short-circuit guards
Ray 2.49 needs (see CLAUDE.md join quirks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .graph_metrics import _clamp_partitions


def _rev_micro(batch: pa.Table) -> np.ndarray:
    """round(l_extendedprice * (1 - l_discount) * 1e6) as exact int64,
    same op order and half-towards-infinity rounding as the SQL."""
    ep = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
    disc = batch["l_discount"].to_numpy(zero_copy_only=False)
    rev = ep * (1.0 - disc) * 1e6
    return np.asarray(
        pc.round(pa.array(rev), ndigits=0,
                 round_mode="half_towards_infinity")
    ).astype(np.int64)


def _price_micro(col: pa.ChunkedArray) -> pa.Array:
    """round(price * 1e6) exact int64 (DuckDB round parity)."""
    v = col.to_numpy(zero_copy_only=False) * 1e6
    return pa.array(
        np.asarray(
            pc.round(pa.array(v), ndigits=0,
                     round_mode="half_towards_infinity")
        ).astype(np.int64),
        pa.int64(),
    )


def _month_str(ts_us: np.ndarray) -> np.ndarray:
    """Epoch-us -> 'YYYY-MM' strings (strftime('%Y-%m') parity)."""
    return (
        ts_us.astype("datetime64[us]").astype("datetime64[M]").astype(str)
    )


def promo_revenue_by_month(lineitem_ds, promo_partkeys: np.ndarray,
                           date_lo_us: int, date_hi_us: int):
    """TPC-H Q14 shape: per ship-month in the window, revenue from
    PROMO-type parts vs total revenue — both exact int64 micro-units
    (the percentage is one trivial client-side division; shipping two
    integers keeps the cross-engine compare bit-exact).

    One scan: the promo flag is a broadcast sorted-partkey membership
    test (``np.isin`` against a dimension array — at 100 TB a
    ``ray.put`` handle), and a per-batch month combiner means the
    final groupby moves month-cardinality rows. Returns
    ``(ship_month, promo_rev_micro, total_rev_micro)`` sorted by
    month."""
    promo = np.sort(np.asarray(promo_partkeys, dtype=np.int64))

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ts = pc.cast(b["l_shipdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(ts, date_lo_us),
                       pc.less(ts, date_hi_us))
        b = b.filter(keep)
        if b.num_rows == 0:
            return pa.table({
                "ship_month": pa.array([], pa.string()),
                "promo_rev": pa.array([], pa.int64()),
                "total_rev": pa.array([], pa.int64()),
            })
        rev = _rev_micro(b)
        months = _month_str(
            b["l_shipdate"].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        is_promo = np.isin(pk, promo)
        u, inv = np.unique(months, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        pro = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, rev)
        np.add.at(pro, inv[is_promo], rev[is_promo])
        return pa.table({
            "ship_month": pa.array(u, pa.string()),
            "promo_rev": pa.array(pro, pa.int64()),
            "total_rev": pa.array(tot, pa.int64()),
        })

    agg = (
        lineitem_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ship_month")
        .sum(["promo_rev", "total_rev"])
    )

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "ship_month": b["ship_month"],
            "promo_rev_micro": pc.cast(b["sum(promo_rev)"], pa.int64()),
            "total_rev_micro": pc.cast(b["sum(total_rev)"], pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        "ship_month"
    )


def small_qty_revenue(lineitem_ds, brand_partkeys: np.ndarray,
                      frac_num: int = 1, frac_den: int = 5,
                      max_parts_broadcast: int = 2_000_000):
    """TPC-H Q17 shape: total revenue (and its //7 "yearly" figure)
    from lineitems of one brand's parts whose quantity falls below
    ``frac_num/frac_den`` of that part's average quantity.

    The fractional-average comparison is EXACT integer algebra:
    ``qty < (num/den) * (sum/cnt)  <=>  den*qty*cnt < num*sum`` with
    integer-valued quantities — no float avg ever materializes, so
    both engines agree bit-for-bit. Two scans of the (brand-filtered)
    lineitem stream: pass 1 builds per-part ``(sum_qty, cnt)`` with a
    per-batch combiner (part-cardinality shuffle), the model — one
    brand's parts — broadcasts back into pass 2 behind a loud size
    guard. Returns one row ``(n_items, revenue_micro,
    avg_yearly_micro)``."""
    brand = np.sort(np.asarray(brand_partkeys, dtype=np.int64))
    if frac_num <= 0 or frac_den <= 0:
        raise ValueError("frac_num and frac_den must be positive")

    def qty_partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(pk, brand)
        pk = pk[keep]
        qty = (
            b["l_quantity"].to_numpy(zero_copy_only=False)[keep]
            .astype(np.int64)
        )
        u, inv = np.unique(pk, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        c = np.zeros(len(u), np.int64)
        np.add.at(s, inv, qty)
        np.add.at(c, inv, 1)
        return pa.table({
            "pk": pa.array(u, pa.int64()),
            "s": pa.array(s, pa.int64()),
            "c": pa.array(c, pa.int64()),
        })

    stats = (
        lineitem_ds.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("pk")
        .sum(["s", "c"])
        .materialize()
    )
    n_parts = stats.count()
    if n_parts > max_parts_broadcast:
        raise ValueError(
            f"brand has {n_parts} parts > max_parts_broadcast="
            f"{max_parts_broadcast}; raise the guard or join "
            "distributed instead of broadcasting the model"
        )
    empty = pa.table({
        "n_items": pa.array([0], pa.int64()),
        "revenue_micro": pa.array([0], pa.int64()),
        "avg_yearly_micro": pa.array([0], pa.int64()),
    })
    if n_parts == 0:
        return rd.from_arrow(empty)
    st = pa.concat_tables(list(stats.iter_batches(batch_format="pyarrow")))
    pk_keys = st["pk"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pk_keys)
    pk_keys = pk_keys[order]
    sum_q = (
        st["sum(s)"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    )
    cnt_q = (
        st["sum(c)"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    )

    def rev_partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(pk, pk_keys)
        b = b.filter(pa.array(keep))
        if b.num_rows == 0:
            return pa.table({"n": pa.array([0], pa.int64()),
                             "r": pa.array([0], pa.int64())})
        pk = pk[keep]
        qty = b["l_quantity"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        idx = np.searchsorted(pk_keys, pk)
        small = frac_den * qty * cnt_q[idx] < frac_num * sum_q[idx]
        rev = _rev_micro(b)[small]
        return pa.table({
            "n": pa.array([int(small.sum())], pa.int64()),
            "r": pa.array([int(rev.sum())], pa.int64()),
        })

    tot = lineitem_ds.map_batches(
        rev_partial, batch_format="pyarrow"
    ).sum(["n", "r"])
    if tot is None:
        return rd.from_arrow(empty)
    n, r = int(tot["sum(n)"]), int(tot["sum(r)"])
    return rd.from_arrow(pa.table({
        "n_items": pa.array([n], pa.int64()),
        "revenue_micro": pa.array([r], pa.int64()),
        "avg_yearly_micro": pa.array([r // 7], pa.int64()),
    }))


def _collect_matching(ds, key_col: str, keys: np.ndarray,
                      prep=None) -> pa.Table | None:
    """Stream ``ds`` once, keep only rows whose ``key_col`` is in the
    broadcast sorted ``keys``, and pull the matches to the driver as
    one Arrow table (``prep`` maps each matched batch first). The
    scale contract: ``keys`` is a SMALL survivor set and ``key_col``
    is unique per row in ``ds``, so the collected table is bounded by
    ``len(keys)`` — the dim/fact stream is filtered in place with no
    shuffle and no JoinOperator. Returns None when nothing matched."""
    ks = np.sort(np.asarray(keys, dtype=np.int64))

    def f(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        v = b[key_col].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(np.isin(v, ks)))
        return prep(b) if prep is not None else b

    tbls = list(
        ds.map_batches(f, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    )
    tbls = [t for t in tbls if t.num_rows]
    if not tbls:
        return None
    return pa.concat_tables(tbls).combine_chunks()


def large_volume_orders(lineitem_ds, orders_ds, customer_ds,
                        qty_threshold: int, k: int = 100,
                        num_partitions: int = 8,
                        max_broadcast: int = 1_000_000):
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds
    the threshold, with customer name, order date/price, and the
    quantity — top-k by (totalprice desc, orderdate, orderkey).

    Per-batch int64 quantity combiner -> order-cardinality groupby ->
    HAVING filter; the surviving set is threshold-small by
    construction. Fast path (survivors <= max_broadcast): the two
    enrichments are broadcast-filtered STREAMING scans of orders and
    customer — no JoinOperator, no shuffle of either table — merged
    client-side on the bounded survivor set. Above the guard, the
    distributed hash joins run with the Ray 2.49
    clamp/repartition/short-circuit guards. Quantities stay int64;
    o_totalprice ships as exact micro-units."""
    P = _clamp_partitions(num_partitions)
    empty = pa.table({
        "c_name": pa.array([], pa.string()),
        "o_orderkey": pa.array([], pa.int64()),
        "o_orderdate_us": pa.array([], pa.int64()),
        "o_totalprice_micro": pa.array([], pa.int64()),
        "sum_qty": pa.array([], pa.int64()),
    })

    def qty_partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        u, inv = np.unique(ok, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, qty)
        return pa.table({
            "l_orderkey": pa.array(u, pa.int64()),
            "q": pa.array(s, pa.int64()),
        })

    big = (
        lineitem_ds.map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .sum("q")
        .map_batches(
            lambda b: b.rename_columns(["l_orderkey", "sum_qty"]).filter(
                pc.greater(b["sum(q)"], qty_threshold)
            ),
            batch_format="pyarrow",
        )
        .repartition(P)
        .materialize()
    )
    if big.count() == 0:
        return rd.from_arrow(empty)

    def ord_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "o_orderdate_us": pc.cast(b["o_orderdate"], pa.int64()),
            "o_totalprice_micro": _price_micro(b["o_totalprice"]),
        })

    if big.count() <= max_broadcast:
        bt = pa.concat_tables(
            list(big.iter_batches(batch_format="pyarrow"))
        )
        sv_ok = (
            bt["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        sv_qty = (
            bt["sum_qty"].to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.argsort(sv_ok)
        sv_ok, sv_qty = sv_ok[order], sv_qty[order]
        om = _collect_matching(orders_ds, "o_orderkey", sv_ok,
                               prep=ord_prep)
        if om is None:
            return rd.from_arrow(empty)
        o_ok = om["o_orderkey"].to_numpy(zero_copy_only=False)
        o_ck = om["o_custkey"].to_numpy(zero_copy_only=False)
        cm = _collect_matching(
            customer_ds, "c_custkey", np.unique(o_ck),
            prep=lambda b: b.select(["c_custkey", "c_name"]),
        )
        if cm is None:
            return rd.from_arrow(empty)
        c_ck = (
            cm["c_custkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        c_order = np.argsort(c_ck)
        c_ck = c_ck[c_order]
        c_names = np.asarray(cm["c_name"].to_pylist(),
                             dtype=object)[c_order]
        # inner semantics: drop orders whose customer is missing
        ci = np.clip(np.searchsorted(c_ck, o_ck), 0, len(c_ck) - 1)
        hit = c_ck[ci] == o_ck
        o_ok, o_ck, ci = o_ok[hit], o_ck[hit], ci[hit]
        date = (
            om["o_orderdate_us"].to_numpy(zero_copy_only=False)[hit]
        )
        price = (
            om["o_totalprice_micro"].to_numpy(zero_copy_only=False)[hit]
        )
        qty = sv_qty[np.searchsorted(sv_ok, o_ok)]
        top = np.lexsort((o_ok, date, -price))[:k]
        return rd.from_arrow(pa.table({
            "c_name": pa.array(c_names[ci][top], pa.string()),
            "o_orderkey": pa.array(o_ok[top], pa.int64()),
            "o_orderdate_us": pa.array(date[top], pa.int64()),
            "o_totalprice_micro": pa.array(price[top], pa.int64()),
            "sum_qty": pa.array(qty[top], pa.int64()),
        }))

    enriched = (
        big.join(
            orders_ds.map_batches(ord_prep, batch_format="pyarrow")
            .repartition(P),
            join_type="inner", num_partitions=P,
            on=("l_orderkey",), right_on=("o_orderkey",),
        )
        .repartition(P)
        .materialize()
    )
    if enriched.count() == 0:
        return rd.from_arrow(empty)

    named = enriched.join(
        customer_ds.map_batches(
            lambda b: b.select(["c_custkey", "c_name"]),
            batch_format="pyarrow",
        ).repartition(P),
        join_type="inner", num_partitions=P,
        on=("o_custkey",), right_on=("c_custkey",),
    )

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_name": b["c_name"],
            "o_orderkey": pc.cast(b["l_orderkey"], pa.int64()),
            "o_orderdate_us": pc.cast(b["o_orderdate_us"], pa.int64()),
            "o_totalprice_micro": pc.cast(
                b["o_totalprice_micro"], pa.int64()
            ),
            "sum_qty": pc.cast(b["sum_qty"], pa.int64()),
        })

    return (
        named.map_batches(finalize, batch_format="pyarrow")
        .sort(["o_totalprice_micro", "o_orderdate_us", "o_orderkey"],
              descending=[True, False, False])
        .limit(k)
    )


def volume_shipping(lineitem_ds, orders_ds, customer_ds,
                    supplier_nation: dict, nation_name: dict,
                    nation_a: str, nation_b: str,
                    date_lo_us: int, date_hi_us: int,
                    num_partitions: int = 8):
    """TPC-H Q7 shape: shipped revenue between two nations (both
    directions), grouped by (supplier nation, customer nation, ship
    year). The regional_revenue split, one key wider: lineitem meets
    orders->customer in distributed hash joins on o_orderkey while
    supplier->nation and the nation-name map broadcast; a per-batch
    combiner on the tiny (nation, nation, year) key space collapses
    the joined stream before the final groupby. Revenue exact int64
    micro-units. Returns ``(supp_nation, cust_nation, l_year,
    revenue_micro)`` sorted by the three keys."""
    P = _clamp_partitions(num_partitions)
    name_to_key = {v: k for k, v in nation_name.items()}
    if nation_a not in name_to_key or nation_b not in name_to_key:
        raise ValueError("both nations must exist in nation_name")
    ka, kb = name_to_key[nation_a], name_to_key[nation_b]
    sup_keys = np.array(sorted(supplier_nation), dtype=np.int64)
    sup_nat = np.array([supplier_nation[k] for k in sup_keys], np.int64)

    def line_prep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ts = pc.cast(b["l_shipdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(ts, date_lo_us),
                       pc.less(ts, date_hi_us))
        b = b.filter(keep)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        s_nat = sup_nat[np.searchsorted(sup_keys, sk)]
        nation_ok = (s_nat == ka) | (s_nat == kb)
        b = b.filter(pa.array(nation_ok))
        s_nat = s_nat[nation_ok]
        ship = b["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        years = (
            ship.astype("datetime64[us]").astype("datetime64[Y]")
            .astype(np.int64) + 1970
        )
        # per-batch combiner on (orderkey, nation-bit, year): the join
        # then moves at most order-cardinality rows (orderkey < 2^49,
        # years within 1970..6065 — both loud if violated)
        ok = (
            b["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        yoff = years - 1970
        if len(ok) and (ok.max() >= 1 << 49 or yoff.max() >= 4096
                        or yoff.min() < 0):
            raise ValueError("orderkey/year outside the packed range")
        key = ok * 8192 + np.where(s_nat == kb, 4096, 0) + yoff
        u, inv = np.unique(key, return_inverse=True)
        part = np.zeros(len(u), np.int64)
        np.add.at(part, inv, _rev_micro(b))
        return pa.table({
            "l_orderkey": pa.array(u // 8192, pa.int64()),
            "s_nationkey": pa.array(
                np.where(u % 8192 >= 4096, kb, ka), pa.int64()
            ),
            "l_year": pa.array(u % 4096 + 1970, pa.int64()),
            "rev_micro": pa.array(part, pa.int64()),
        })

    oc = (
        orders_ds.map_batches(
            lambda b: b.select(["o_orderkey", "o_custkey"]),
            batch_format="pyarrow",
        )
        .repartition(P)
        .join(
            customer_ds.map_batches(
                lambda b: pa.table({
                    "c_custkey": b["c_custkey"],
                    "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
                }),
                batch_format="pyarrow",
            ).repartition(P),
            join_type="inner", num_partitions=P,
            on=("o_custkey",), right_on=("c_custkey",),
        )
    )

    empty = pa.table({
        "supp_nation": pa.array([], pa.string()),
        "cust_nation": pa.array([], pa.string()),
        "l_year": pa.array([], pa.int64()),
        "revenue_micro": pa.array([], pa.int64()),
    })
    # the combined partials are at most order-cardinality; materialize
    # + count guards Ray 2.49's empty-side join crash (CLAUDE.md)
    lines = (
        lineitem_ds.map_batches(line_prep, batch_format="pyarrow")
        .repartition(P)
        .materialize()
    )
    if lines.count() == 0:
        return rd.from_arrow(empty)

    joined = lines.join(
        oc.repartition(P), join_type="inner", num_partitions=P,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        s_nat = b["s_nationkey"].to_numpy(zero_copy_only=False)
        c_nat = b["c_nationkey"].to_numpy(zero_copy_only=False)
        keep = ((s_nat == ka) & (c_nat == kb)) | (
            (s_nat == kb) & (c_nat == ka)
        )
        b = b.filter(pa.array(keep))
        if b.num_rows == 0:
            return pa.table({
                "key": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            })
        s_nat = s_nat[keep]
        year = b["l_year"].to_numpy(zero_copy_only=False)
        rev = b["rev_micro"].to_numpy(zero_copy_only=False)
        # pack (s_nation, year) into one int key: nations < 2^20
        key = s_nat * 1_048_576 + year
        u, inv = np.unique(key, return_inverse=True)
        part = np.zeros(len(u), np.int64)
        np.add.at(part, inv, rev)
        return pa.table({
            "key": pa.array(u, pa.int64()),
            "rev": pa.array(part, pa.int64()),
        })

    agg = joined.map_batches(partial, batch_format="pyarrow").groupby(
        "key"
    ).sum("rev")

    def finalize(b: pa.Table) -> pa.Table:
        key = b["key"].to_numpy(zero_copy_only=False)
        s_nat = key // 1_048_576
        year = key % 1_048_576
        supp = [nation_name[int(x)] for x in s_nat]
        cust = [nation_name[kb if int(x) == ka else ka] for x in s_nat]
        return pa.table({
            "supp_nation": pa.array(supp, pa.string()),
            "cust_nation": pa.array(cust, pa.string()),
            "l_year": pa.array(year, pa.int64()),
            "revenue_micro": pc.cast(b["sum(rev)"], pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        ["supp_nation", "cust_nation", "l_year"]
    )


def returned_item_revenue(lineitem_ds, orders_ds, customer_ds,
                          date_lo_us: int, date_hi_us: int, k: int = 20,
                          num_partitions: int = 8):
    """TPC-H Q10 shape: per-customer revenue from RETURNED lineitems
    (l_returnflag = 'R') of orders placed in the window — top-k by
    (revenue desc, custkey).

    lineitem pre-aggregates per order in an int64 combiner (the only
    full-fact scan); the order->custkey map joins distributed; the
    per-customer groupby then moves customer-cardinality rows, and
    only the top-k join against the customer dim for names. Returns
    ``(c_custkey, c_name, c_acctbal_micro, revenue_micro)``."""
    P = _clamp_partitions(num_partitions)
    empty = pa.table({
        "c_custkey": pa.array([], pa.int64()),
        "c_name": pa.array([], pa.string()),
        "c_acctbal_micro": pa.array([], pa.int64()),
        "revenue_micro": pa.array([], pa.int64()),
    })

    def line_prep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        b = b.filter(pc.equal(b["l_returnflag"], "R"))
        if b.num_rows == 0:
            return pa.table({
                "l_orderkey": pa.array([], pa.int64()),
                "rev": pa.array([], pa.int64()),
            })
        rev = _rev_micro(b)
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(ok, return_inverse=True)
        part = np.zeros(len(u), np.int64)
        np.add.at(part, inv, rev)
        return pa.table({
            "l_orderkey": pa.array(u, pa.int64()),
            "rev": pa.array(part, pa.int64()),
        })

    rev = (
        lineitem_ds.map_batches(line_prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .sum("rev")
        .repartition(P)
        .materialize()
    )
    if rev.count() == 0:
        return rd.from_arrow(empty)

    def ord_prep(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["o_orderdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(ts, date_lo_us),
                       pc.less(ts, date_hi_us))
        b = b.filter(keep)
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
        })

    # window-filtered key map is order-in-window cardinality; the
    # materialize + count guards Ray 2.49's empty-side join crash
    in_window = (
        orders_ds.map_batches(ord_prep, batch_format="pyarrow")
        .repartition(P)
        .materialize()
    )
    if in_window.count() == 0:
        return rd.from_arrow(empty)

    per_cust = (
        rev.join(
            in_window,
            join_type="inner", num_partitions=P,
            on=("l_orderkey",), right_on=("o_orderkey",),
        )
        .groupby("o_custkey")
        .sum("sum(rev)")
        .map_batches(
            lambda b: b.rename_columns(["o_custkey", "revenue_micro"]),
            batch_format="pyarrow",
        )
        .sort(["revenue_micro", "o_custkey"], descending=[True, False])
        .limit(k)
        .repartition(1)
        .materialize()
    )
    if per_cust.count() == 0:
        return rd.from_arrow(empty)

    def cust_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": b["c_custkey"],
            "c_name": b["c_name"],
            "c_acctbal_micro": _price_micro(b["c_acctbal"]),
        })

    # the top-k set is <= k rows BY CONSTRUCTION, so the name/balance
    # enrichment is always a broadcast-filtered streaming scan of the
    # customer dim — no JoinOperator, no shuffle of the dim
    pt = pa.concat_tables(
        list(per_cust.iter_batches(batch_format="pyarrow"))
    )
    t_ck = (
        pt["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    order = np.argsort(t_ck)
    t_ck = t_ck[order]
    t_rev = (
        pt["revenue_micro"].to_numpy(zero_copy_only=False)
        .astype(np.int64)[order]
    )
    cm = _collect_matching(customer_ds, "c_custkey", t_ck,
                           prep=cust_prep)
    if cm is None:
        return rd.from_arrow(empty)
    c_ck = (
        cm["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    c_order = np.argsort(c_ck)
    c_ck = c_ck[c_order]
    names = np.asarray(cm["c_name"].to_pylist(), dtype=object)[c_order]
    bal = (
        cm["c_acctbal_micro"].to_numpy(zero_copy_only=False)[c_order]
    )
    rev = t_rev[np.searchsorted(t_ck, c_ck)]
    out = np.lexsort((c_ck, -rev))
    return rd.from_arrow(pa.table({
        "c_custkey": pa.array(c_ck[out], pa.int64()),
        "c_name": pa.array(names[out], pa.string()),
        "c_acctbal_micro": pa.array(bal[out], pa.int64()),
        "revenue_micro": pa.array(rev[out], pa.int64()),
    }))


def banded_revenue(lineitem_ds, part_keys: np.ndarray,
                   part_brands: np.ndarray, part_sizes: np.ndarray,
                   bands: list[tuple[str, int, int, int, int]]):
    """TPC-H Q19 shape: total revenue from lineitems matching ANY of
    the (brand, size range, quantity range) bands — the OR-of-ANDs
    compound predicate evaluated as one vectorized numpy pass per
    batch against broadcast part attributes. Returns one row
    ``(n_items, revenue_micro)``.

    ``part_keys`` must be sorted ascending; brands/sizes align to it.
    At 100 TB the three part arrays ride a single ``ray.put`` handle;
    here task-arg capture is cheaper."""
    part_keys = np.asarray(part_keys, dtype=np.int64)
    if len(part_keys) == 0:
        raise ValueError("part_keys must be non-empty")
    if np.any(np.diff(part_keys) < 0):
        raise ValueError("part_keys must be sorted ascending")
    part_brands = np.asarray(part_brands)
    part_sizes = np.asarray(part_sizes, dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(part_keys, pk), 0,
                      len(part_keys) - 1)
        hit = part_keys[idx] == pk
        qty = b["l_quantity"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        brands = part_brands[idx]
        sizes = part_sizes[idx]
        keep = np.zeros(len(pk), dtype=bool)
        for brand, size_lo, size_hi, qty_lo, qty_hi in bands:
            keep |= (
                hit
                & (brands == brand)
                & (sizes >= size_lo) & (sizes <= size_hi)
                & (qty >= qty_lo) & (qty <= qty_hi)
            )
        rev = _rev_micro(b)[keep]
        return pa.table({
            "n": pa.array([int(keep.sum())], pa.int64()),
            "r": pa.array([int(rev.sum())], pa.int64()),
        })

    tot = lineitem_ds.map_batches(
        partial, batch_format="pyarrow"
    ).sum(["n", "r"])
    n, r = (0, 0) if tot is None else (int(tot["sum(n)"]),
                                       int(tot["sum(r)"]))
    return rd.from_arrow(pa.table({
        "n_items": pa.array([n], pa.int64()),
        "revenue_micro": pa.array([r], pa.int64()),
    }))


def top_supplier_revenue(lineitem_ds, supplier_ds,
                         date_lo_us: int, date_hi_us: int,
                         num_partitions: int = 8,
                         max_broadcast: int = 1_000_000):
    """TPC-H Q15 shape: the supplier(s) with the maximum shipped
    revenue in the window — ALL ties survive, exactly the SQL
    ``total = (SELECT max(total))`` predicate.

    One fact scan with a per-batch suppkey combiner -> a
    supplier-cardinality groupby (materialized: it is both the max
    source and the filter input). Fast path (winners <=
    max_broadcast): names come from a broadcast-filtered STREAMING
    scan of the supplier dim — no JoinOperator; above the guard, the
    distributed hash join runs with the usual Ray 2.49 guards.
    Returns ``(s_suppkey, s_name, total_revenue_micro)`` sorted by
    suppkey."""
    P = _clamp_partitions(num_partitions)
    empty = pa.table({
        "s_suppkey": pa.array([], pa.int64()),
        "s_name": pa.array([], pa.string()),
        "total_revenue_micro": pa.array([], pa.int64()),
    })

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ts = pc.cast(b["l_shipdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(ts, date_lo_us),
                       pc.less(ts, date_hi_us))
        b = b.filter(keep)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(sk, return_inverse=True)
        part = np.zeros(len(u), np.int64)
        np.add.at(part, inv, _rev_micro(b))
        return pa.table({
            "l_suppkey": pa.array(u, pa.int64()),
            "rev": pa.array(part, pa.int64()),
        })

    per_supp = (
        lineitem_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey")
        .sum("rev")
        .repartition(P)
        .materialize()
    )
    if per_supp.count() == 0:
        return rd.from_arrow(empty)
    best = per_supp.max("sum(rev)")

    winners = per_supp.map_batches(
        lambda b: b.rename_columns(
            ["s_suppkey", "total_revenue_micro"]
        ).filter(pc.equal(b["sum(rev)"], best)),
        batch_format="pyarrow",
    ).repartition(P)

    winners = winners.materialize()
    if winners.count() <= max_broadcast:
        wt = pa.concat_tables(
            list(winners.iter_batches(batch_format="pyarrow"))
        )
        w_sk = (
            wt["s_suppkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        order = np.argsort(w_sk)
        w_sk = w_sk[order]
        w_tot = (
            wt["total_revenue_micro"].to_numpy(zero_copy_only=False)
            .astype(np.int64)[order]
        )
        sm = _collect_matching(
            supplier_ds, "s_suppkey", w_sk,
            prep=lambda b: b.select(["s_suppkey", "s_name"]),
        )
        if sm is None:
            return rd.from_arrow(empty)
        s_sk = (
            sm["s_suppkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        s_order = np.argsort(s_sk)
        s_sk = s_sk[s_order]
        s_names = np.asarray(sm["s_name"].to_pylist(),
                             dtype=object)[s_order]
        # inner semantics: only winners present in the dim survive
        tot = w_tot[np.searchsorted(w_sk, s_sk)]
        return rd.from_arrow(pa.table({
            "s_suppkey": pa.array(s_sk, pa.int64()),
            "s_name": pa.array(s_names, pa.string()),
            "total_revenue_micro": pa.array(tot, pa.int64()),
        }))

    named = winners.join(
        supplier_ds.map_batches(
            lambda b: b.select(["s_suppkey", "s_name"]),
            batch_format="pyarrow",
        ).repartition(P).map_batches(
            lambda b: b.rename_columns(["suppkey_dim", "s_name"]),
            batch_format="pyarrow",
        ),
        join_type="inner", num_partitions=P,
        on=("s_suppkey",), right_on=("suppkey_dim",),
    )

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "s_suppkey": pc.cast(b["s_suppkey"], pa.int64()),
            "s_name": b["s_name"],
            "total_revenue_micro": pc.cast(
                b["total_revenue_micro"], pa.int64()
            ),
        })

    return named.map_batches(finalize, batch_format="pyarrow").sort(
        "s_suppkey"
    )


def market_share(lineitem_ds, orders_ds, customer_ds,
                 type_partkeys: np.ndarray, supplier_nation: dict,
                 region_cust_nations: set, target_nation: int,
                 num_partitions: int = 8):
    """TPC-H Q8 shape: per order year, the target nation's shipped
    revenue vs ALL nations' revenue for one part type sold to one
    region's customers — both exact int64 micro-units (the share is
    one client division).

    The part-type set and supplier->nation map broadcast into the one
    lineitem scan, which combines per (orderkey, is-target-bit) so the
    fact-fact join moves at most order-cardinality rows; the customer
    region filter broadcasts into the orders->customer join; the final
    groupby runs on year cardinality. Returns ``(o_year,
    nation_rev_micro, total_rev_micro)`` sorted by year."""
    P = _clamp_partitions(num_partitions)
    tpk = np.sort(np.asarray(type_partkeys, dtype=np.int64))
    sup_keys = np.array(sorted(supplier_nation), dtype=np.int64)
    sup_nat = np.array([supplier_nation[k] for k in sup_keys], np.int64)
    region = np.sort(np.fromiter(region_cust_nations, dtype=np.int64,
                                 count=len(region_cust_nations)))
    empty = pa.table({
        "o_year": pa.array([], pa.int64()),
        "nation_rev_micro": pa.array([], pa.int64()),
        "total_rev_micro": pa.array([], pa.int64()),
    })

    def line_prep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(np.isin(pk, tpk)))
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        s_nat = sup_nat[np.searchsorted(sup_keys, sk)]
        ok = (
            b["l_orderkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        if len(ok) and ok.max() >= 1 << 62:
            raise ValueError("orderkey outside the packed range")
        key = ok * 2 + (s_nat == target_nation)
        u, inv = np.unique(key, return_inverse=True)
        part = np.zeros(len(u), np.int64)
        np.add.at(part, inv, _rev_micro(b))
        return pa.table({
            "l_orderkey": pa.array(u // 2, pa.int64()),
            "is_target": pa.array((u % 2).astype(bool)),
            "rev": pa.array(part, pa.int64()),
        })

    lines = (
        lineitem_ds.map_batches(line_prep, batch_format="pyarrow")
        .repartition(P)
        .materialize()
    )
    if lines.count() == 0:
        return rd.from_arrow(empty)

    def cust_prep(b: pa.Table) -> pa.Table:
        nk = (
            b["c_nationkey"].to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        b = b.filter(pa.array(np.isin(nk, region)))
        return pa.table({"c_custkey": b["c_custkey"]})

    def ord_prep(b: pa.Table) -> pa.Table:
        ts = (
            b["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        years = (
            ts.astype("datetime64[us]").astype("datetime64[Y]")
            .astype(np.int64) + 1970
        )
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "o_year": pa.array(years, pa.int64()),
        })

    oc = (
        orders_ds.map_batches(ord_prep, batch_format="pyarrow")
        .repartition(P)
        .join(
            customer_ds.map_batches(cust_prep, batch_format="pyarrow")
            .repartition(P),
            join_type="left_semi", num_partitions=P,
            on=("o_custkey",), right_on=("c_custkey",),
        )
        .repartition(P)
        .materialize()
    )
    if oc.count() == 0:
        return rd.from_arrow(empty)

    joined = lines.join(
        oc, join_type="inner", num_partitions=P,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(b: pa.Table) -> pa.Table:
        year = b["o_year"].to_numpy(zero_copy_only=False)
        rev = b["rev"].to_numpy(zero_copy_only=False)
        tgt = b["is_target"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(year, return_inverse=True)
        tot = np.zeros(len(u), np.int64)
        nat = np.zeros(len(u), np.int64)
        np.add.at(tot, inv, rev)
        np.add.at(nat, inv[tgt], rev[tgt])
        return pa.table({
            "o_year": pa.array(u, pa.int64()),
            "nat": pa.array(nat, pa.int64()),
            "tot": pa.array(tot, pa.int64()),
        })

    agg = joined.map_batches(partial, batch_format="pyarrow").groupby(
        "o_year"
    ).sum(["nat", "tot"])

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_year": pc.cast(b["o_year"], pa.int64()),
            "nation_rev_micro": pc.cast(b["sum(nat)"], pa.int64()),
            "total_rev_micro": pc.cast(b["sum(tot)"], pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        "o_year"
    )


def late_shipment_priorities(lineitem_ds, orders_ds,
                             date_lo_us: int, date_hi_us: int,
                             grace_days: int = 60,
                             num_partitions: int = 8):
    """TPC-H Q4 shape (adapted to this schema: no l_commitdate, so
    "late" means the order's LAST shipment left more than
    ``grace_days`` after the order date): per order priority, how many
    window orders had a late shipment.

    The EXISTS collapses to ``max(l_shipdate) > o_orderdate + grace``
    — a per-order max combiner (the only full-fact scan) joins the
    window-filtered order keys; the final groupby is
    priority-cardinality. Returns ``(o_orderpriority, order_count)``
    sorted by priority."""
    P = _clamp_partitions(num_partitions)
    grace_us = int(grace_days) * 86_400_000_000
    empty = pa.table({
        "o_orderpriority": pa.array([], pa.string()),
        "order_count": pa.array([], pa.int64()),
    })

    def ship_partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        ts = (
            b["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        u, inv = np.unique(ok, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, ts)
        return pa.table({
            "l_orderkey": pa.array(u, pa.int64()),
            "ms": pa.array(mx, pa.int64()),
        })

    last_ship = (
        lineitem_ds.map_batches(ship_partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .max("ms")
        .repartition(P)
        .materialize()
    )
    if last_ship.count() == 0:
        return rd.from_arrow(empty)

    def ord_prep(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["o_orderdate"], pa.int64())
        keep = pc.and_(pc.greater_equal(ts, date_lo_us),
                       pc.less(ts, date_hi_us))
        b = b.filter(keep)
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "o_orderdate_us": pc.cast(b["o_orderdate"], pa.int64()),
            "o_orderpriority": b["o_orderpriority"],
        })

    in_window = (
        orders_ds.map_batches(ord_prep, batch_format="pyarrow")
        .repartition(P)
        .materialize()
    )
    if in_window.count() == 0:
        return rd.from_arrow(empty)

    joined = in_window.join(
        last_ship, join_type="inner", num_partitions=P,
        on=("o_orderkey",), right_on=("l_orderkey",),
    )

    def late_partial(b: pa.Table) -> pa.Table:
        late = pc.greater(
            b["max(ms)"],
            pc.add(b["o_orderdate_us"], grace_us),
        )
        b = b.filter(late)
        t = b.group_by("o_orderpriority").aggregate([
            ("o_orderkey", "count")
        ])
        return pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "n": pc.cast(t["o_orderkey_count"], pa.int64()),
        })

    agg = joined.map_batches(
        late_partial, batch_format="pyarrow"
    ).groupby("o_orderpriority").sum("n")

    return agg.map_batches(
        lambda b: b.rename_columns(["o_orderpriority", "order_count"]),
        batch_format="pyarrow",
    ).sort("o_orderpriority")


def waiting_customers(customer_ds, orders_ds, since_us: int,
                      num_partitions: int = 8):
    """TPC-H Q22 shape (adapted: this schema has no phone country
    code, and every customer has SOME order — so the cohort is
    dormant high-value accounts, grouped by nation): customers whose
    balance beats the average POSITIVE balance and who placed no
    order since the cutoff.

    The above-average predicate is exact integer algebra
    (bal·n_pos > sum_pos — no float average), its two scalars one
    combiner pass over the dim; dormancy is a native left_anti join
    against the date-filtered order keys (duplicate keys are fine for
    an existence test — no distinct shuffle). Returns
    ``(c_nationkey, n_custs, total_bal_micro)`` sorted by nation."""
    P = _clamp_partitions(num_partitions)
    empty = pa.table({
        "c_nationkey": pa.array([], pa.int64()),
        "n_custs": pa.array([], pa.int64()),
        "total_bal_micro": pa.array([], pa.int64()),
    })

    def bal_micro(col) -> np.ndarray:
        v = col.to_numpy(zero_copy_only=False) * 1e6
        return np.asarray(
            pc.round(pa.array(v), ndigits=0,
                     round_mode="half_towards_infinity")
        ).astype(np.int64)

    def pos_partial(b: pa.Table) -> pa.Table:
        bal = b["c_acctbal"].to_numpy(zero_copy_only=False)
        micro = bal_micro(b["c_acctbal"])[bal > 0]
        return pa.table({
            "s": pa.array([int(micro.sum())], pa.int64()),
            "n": pa.array([len(micro)], pa.int64()),
        })

    tot = customer_ds.map_batches(
        pos_partial, batch_format="pyarrow"
    ).sum(["s", "n"])
    if tot is None or int(tot["sum(n)"]) == 0:
        return rd.from_arrow(empty)
    sum_pos, n_pos = int(tot["sum(s)"]), int(tot["sum(n)"])

    def rich_prep(b: pa.Table) -> pa.Table:
        micro = bal_micro(b["c_acctbal"])
        if len(micro) and abs(int(micro.max())) > (1 << 62) // n_pos:
            raise ValueError(
                "bal*n_pos would overflow int64; rescale the "
                "micro-unit before comparing"
            )
        keep = micro * n_pos > sum_pos
        b = b.filter(pa.array(keep))
        return pa.table({
            "c_custkey": b["c_custkey"],
            "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
            "bal": pa.array(micro[keep], pa.int64()),
        })

    rich = (
        customer_ds.map_batches(rich_prep, batch_format="pyarrow")
        .repartition(P)
        .materialize()
    )
    if rich.count() == 0:
        return rd.from_arrow(empty)

    def recent_prep(b: pa.Table) -> pa.Table:
        ts = pc.cast(b["o_orderdate"], pa.int64())
        b = b.filter(pc.greater_equal(ts, since_us))
        return pa.table({"o_custkey": b["o_custkey"]})

    recent = (
        orders_ds.map_batches(recent_prep, batch_format="pyarrow")
        .repartition(P)
        .materialize()
    )
    dormant = rich if recent.count() == 0 else rich.join(
        recent, join_type="left_anti", num_partitions=P,
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def partial(b: pa.Table) -> pa.Table:
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False)
        bal = b["bal"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(nk, return_inverse=True)
        n = np.zeros(len(u), np.int64)
        s = np.zeros(len(u), np.int64)
        np.add.at(n, inv, 1)
        np.add.at(s, inv, bal)
        return pa.table({
            "c_nationkey": pa.array(u, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "s": pa.array(s, pa.int64()),
        })

    agg = dormant.map_batches(partial, batch_format="pyarrow").groupby(
        "c_nationkey"
    ).sum(["n", "s"])

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
            "n_custs": pc.cast(b["sum(n)"], pa.int64()),
            "total_bal_micro": pc.cast(b["sum(s)"], pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        "c_nationkey"
    )


def forecast_revenue_change(lineitem_ds, date_lo_us: int,
                            date_hi_us: int, disc_lo: float,
                            disc_hi: float, qty_below: int):
    """TPC-H Q6 shape: revenue that would have been gained by
    eliminating small discounts — ``sum(extendedprice * discount)``
    over the (ship window, discount band, small quantity) filter, as
    one scalar row ``(n_items, revenue_micro)``.

    Pure filter-sum: one scan, per-batch scalar partials, no shuffle
    at all. The discount band compares the SAME doubles both engines
    read from parquet (no arithmetic before the compare), and revenue
    micro-quantizes per row with the house one-op round chain —
    documented divergence from the spec's unrounded sum, shared with
    every revenue op here."""

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ts = pc.cast(b["l_shipdate"], pa.int64())
        disc = b["l_discount"].to_numpy(zero_copy_only=False)
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        keep = (
            (np.asarray(ts) >= date_lo_us)
            & (np.asarray(ts) < date_hi_us)
            & (disc >= disc_lo) & (disc <= disc_hi)
            & (qty < qty_below)
        )
        b = b.filter(pa.array(keep))
        ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
        rev = ep * b["l_discount"].to_numpy(zero_copy_only=False) * 1e6
        rev_micro = np.asarray(
            pc.round(pa.array(rev), ndigits=0,
                     round_mode="half_towards_infinity")
        ).astype(np.int64)
        return pa.table({
            "n": pa.array([b.num_rows], pa.int64()),
            "r": pa.array([int(rev_micro.sum())], pa.int64()),
        })

    tot = lineitem_ds.map_batches(
        partial, batch_format="pyarrow"
    ).sum(["n", "r"])
    n, r = (0, 0) if tot is None else (int(tot["sum(n)"]),
                                       int(tot["sum(r)"]))
    return rd.from_arrow(pa.table({
        "n_items": pa.array([n], pa.int64()),
        "revenue_micro": pa.array([r], pa.int64()),
    }))


def sole_late_suppliers(lineitem_ds, orders_ds, supplier_ds,
                        nation_name: dict, grace_days: int = 60,
                        k: int = 25, num_partitions: int = 8,
                        n_buckets: int = 64):
    """TPC-H Q21 shape (adapted: this schema has no
    l_commitdate/l_receiptdate, so a supplier is "late" on an order
    when ANY of its lineitems shipped more than ``grace_days`` after
    the order date): suppliers who were the SOLE late supplier on a
    multi-supplier order, ranked by how many orders they alone kept
    waiting — ``(s_name, nation, numwait)`` top-k by
    (numwait desc, s_name).

    The EXISTS/NOT-EXISTS pair collapses to per-order set algebra:
    n_suppliers >= 2 and n_late_suppliers == 1. lineitem shrinks to
    distinct (orderkey, suppkey, max shipdate) via a packed-int64
    per-batch combiner + one int-key groupby, meets orders in a
    distributed hash join, then an ``orderkey & (n_buckets-1)``
    bucket groupby does the per-order counting C-side (every row of
    an order shares its bucket, so the per-bucket pass is exact —
    the CLAUDE.md wide-key-shuffle device). Survivors are
    supplier-cardinality; names attach via the broadcast-filtered
    supplier scan (no JoinOperator)."""
    P = _clamp_partitions(num_partitions)
    grace_us = int(grace_days) * 86_400_000_000
    mask = int(n_buckets) - 1
    if n_buckets & mask:
        raise ValueError("n_buckets must be a power of two")
    empty = pa.table({
        "s_name": pa.array([], pa.string()),
        "nation": pa.array([], pa.string()),
        "numwait": pa.array([], pa.int64()),
    })

    def pair_partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        ts = pc.cast(b["l_shipdate"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        if len(ok) and (ok.max() >= 1 << 43 or sk.max() >= 1 << 20
                        or ok.min() < 0 or sk.min() < 0):
            raise ValueError("orderkey/suppkey outside the packed range")
        key = ok * (1 << 20) + sk
        u, inv = np.unique(key, return_inverse=True)
        mx = np.full(len(u), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(mx, inv, ts)
        return pa.table({
            "pk": pa.array(u, pa.int64()),
            "ms": pa.array(mx, pa.int64()),
        })

    pairs = (
        lineitem_ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("pk")
        .max("ms")
        .map_batches(
            lambda b: pa.table({
                "l_orderkey": pc.divide(b["pk"], 1 << 20),
                "l_suppkey": pc.bit_wise_and(b["pk"], (1 << 20) - 1),
                "ms": pc.cast(b["max(ms)"], pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .repartition(P)
        .materialize()
    )
    if pairs.count() == 0:
        return rd.from_arrow(empty)

    odates = (
        orders_ds.map_batches(
            lambda b: pa.table({
                "o_orderkey": b["o_orderkey"],
                "od": pc.cast(b["o_orderdate"], pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .repartition(P)
    )
    joined = pairs.join(
        odates, join_type="inner", num_partitions=P,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def tag(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        late = pc.greater(b["ms"], pc.add(b["od"], grace_us))
        return pa.table({
            "bucket": pa.array(ok & mask, pa.int64()),
            "ok": pa.array(ok, pa.int64()),
            "sk": b["l_suppkey"],
            "late": pc.cast(late, pa.int64()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ok = g["ok"].to_numpy(zero_copy_only=False)
        sk = g["sk"].to_numpy(zero_copy_only=False)
        late = g["late"].to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        ok, sk, late = ok[order], sk[order], late[order]
        uo, start, cnt = np.unique(ok, return_index=True,
                                   return_counts=True)
        nl = np.add.reduceat(late, start)
        qual = (cnt >= 2) & (nl == 1)
        if not qual.any():
            return pa.table({
                "sk": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        # the sole late supplier of each qualifying order
        lok = ok[late == 1]
        lsk = sk[late == 1]
        pos = np.searchsorted(lok, uo[qual])
        winners = lsk[pos]
        u, c = np.unique(winners, return_counts=True)
        return pa.table({
            "sk": pa.array(u, pa.int64()),
            "n": pa.array(c.astype(np.int64), pa.int64()),
        })

    agg = (
        joined.map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("sk")
        .sum("n")
        .materialize()
    )
    if agg.count() == 0:
        return rd.from_arrow(empty)
    wt = pa.concat_tables(
        list(agg.iter_batches(batch_format="pyarrow"))
    ).combine_chunks()
    keys = wt["sk"].to_numpy(zero_copy_only=False)
    numwait = wt["sum(n)"].to_numpy(zero_copy_only=False)
    sup = _collect_matching(
        supplier_ds, "s_suppkey", keys,
        prep=lambda b: b.select(["s_suppkey", "s_name", "s_nationkey"]),
    )
    if sup is None:
        return rd.from_arrow(empty)
    sup = sup.sort_by("s_suppkey")
    sup_keys = sup["s_suppkey"].to_numpy(zero_copy_only=False)
    # inner-join semantics: a winner suppkey missing from the dim is
    # dropped (the oracle's JOIN supplier does the same)
    idx = np.searchsorted(sup_keys, keys)
    hit = (idx < len(sup_keys)) & (
        sup_keys[np.minimum(idx, len(sup_keys) - 1)] == keys
    )
    keys, numwait, idx = keys[hit], numwait[hit], idx[hit]
    if len(keys) == 0:
        return rd.from_arrow(empty)
    names = np.asarray(sup["s_name"].to_pylist(), dtype=object)[idx]
    nats = sup["s_nationkey"].to_numpy(zero_copy_only=False)[idx]
    out = pa.table({
        "s_name": pa.array([str(x) for x in names], pa.string()),
        "nation": pa.array(
            [nation_name[int(x)] for x in nats], pa.string()
        ),
        "numwait": pa.array(numwait.astype(np.int64), pa.int64()),
    })
    out = out.sort_by([("numwait", "descending"), ("s_name", "ascending")])
    return rd.from_arrow(out.slice(0, k))


def profit_by_nation_year(lineitem_ds, orders_ds,
                          part_keys: np.ndarray,
                          part_retail: np.ndarray,
                          supp_keys: np.ndarray,
                          supp_nat: np.ndarray,
                          nation_name: dict,
                          cost_factor: float = 0.6,
                          num_partitions: int = 8):
    """TPC-H Q9 shape (adapted: no partsupp table, so supply cost is
    the synthetic ``p_retailprice * quantity * cost_factor``): profit
    per supplier nation per order year over the name-matched part
    subset — ``(nation, o_year, profit_micro)`` sorted by
    (nation, o_year desc).

    Part keys/prices and supplier->nation arrive as broadcast sorted
    arrays (dimension house rule); the lineitem scan filters, prices
    and pre-aggregates per (orderkey, nation) in a packed-int64
    combiner, meets orders for the year in ONE distributed hash join,
    then collapses onto the tiny (nation, year) key space. Profit is
    exact int64 micro-units: revenue via the shared one-op rounding
    chain, cost via the identical ``round(retail * qty * factor *
    1e6)`` chain."""
    P = _clamp_partitions(num_partitions)
    pk_sorted = np.sort(np.asarray(part_keys, dtype=np.int64))
    order_pk = np.argsort(np.asarray(part_keys, dtype=np.int64))
    retail = np.asarray(part_retail, dtype=np.float64)[order_pk]
    sk_order = np.argsort(np.asarray(supp_keys, dtype=np.int64))
    sk_sorted = np.asarray(supp_keys, dtype=np.int64)[sk_order]
    snat = np.asarray(supp_nat, dtype=np.int64)[sk_order]
    empty = pa.table({
        "nation": pa.array([], pa.string()),
        "o_year": pa.array([], pa.int64()),
        "profit_micro": pa.array([], pa.int64()),
    })

    def line_partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        lpk = b["l_partkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(lpk, pk_sorted)
        b = b.filter(pa.array(keep))
        if b.num_rows == 0:
            return pa.table({
                "l_orderkey": pa.array([], pa.int64()),
                "s_nationkey": pa.array([], pa.int64()),
                "profit": pa.array([], pa.int64()),
            })
        lpk = lpk[keep]
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)
        rev = _rev_micro(b)
        cost_f = retail[np.searchsorted(pk_sorted, lpk)] * qty \
            * cost_factor * 1e6
        cost = np.asarray(
            pc.round(pa.array(cost_f), ndigits=0,
                     round_mode="half_towards_infinity")
        ).astype(np.int64)
        profit = rev - cost
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False)
        # validate the supplier FK like the oracle's inner join: a
        # suppkey absent from the dim is DROPPED, never misattributed
        # (raw searchsorted would alias it onto a neighbor or crash)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk_sorted, sk)
        hit = (pos < len(sk_sorted)) & (
            sk_sorted[np.minimum(pos, len(sk_sorted) - 1)] == sk
        )
        if not hit.all():
            ok, profit, pos = ok[hit], profit[hit], pos[hit]
        nat = snat[pos]
        if len(ok) and (ok.max() >= 1 << 52 or nat.max() >= 2048
                        or nat.min() < 0):
            raise ValueError("orderkey/nationkey outside the packed range")
        key = ok * 2048 + nat
        u, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, profit)
        return pa.table({
            "l_orderkey": pa.array(u // 2048, pa.int64()),
            "s_nationkey": pa.array(u % 2048, pa.int64()),
            "profit": pa.array(s, pa.int64()),
        })

    lines = (
        lineitem_ds.map_batches(line_partial, batch_format="pyarrow")
        .repartition(P)
        .materialize()
    )
    if lines.count() == 0:
        return rd.from_arrow(empty)
    oyears = (
        orders_ds.map_batches(
            lambda b: pa.table({
                "o_orderkey": b["o_orderkey"],
                "o_year": pc.cast(
                    pc.year(b["o_orderdate"]), pa.int64()
                ),
            }),
            batch_format="pyarrow",
        )
        .repartition(P)
    )
    joined = lines.join(
        oyears, join_type="inner", num_partitions=P,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def ny_partial(b: pa.Table) -> pa.Table:
        nat = b["s_nationkey"].to_numpy(zero_copy_only=False)
        yr = b["o_year"].to_numpy(zero_copy_only=False)
        pf = b["profit"].to_numpy(zero_copy_only=False)
        yoff = yr - 1970
        if len(nat) and (yoff.max() >= 4096 or yoff.min() < 0):
            raise ValueError("year outside the packed range")
        key = nat * 4096 + yoff
        u, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, pf)
        return pa.table({
            "key": pa.array(u, pa.int64()),
            "p": pa.array(s, pa.int64()),
        })

    agg = joined.map_batches(
        ny_partial, batch_format="pyarrow"
    ).groupby("key").sum("p")

    def finalize(b: pa.Table) -> pa.Table:
        key = b["key"].to_numpy(zero_copy_only=False)
        return pa.table({
            "nation": pa.array(
                [nation_name[int(x)] for x in key // 4096], pa.string()
            ),
            "o_year": pa.array(key % 4096 + 1970, pa.int64()),
            "neg_year": pa.array(-(key % 4096), pa.int64()),
            "profit_micro": pc.cast(b["sum(p)"], pa.int64()),
        })

    return (
        agg.map_batches(finalize, batch_format="pyarrow")
        .sort(["nation", "neg_year"])
        .drop_columns(["neg_year"])
    )


def shipping_delay_bands(lineitem_ds, orders_ds,
                         band_us: int = 31_536_000_000_000,
                         band_lo: int = -7, band_hi: int = 7,
                         high_priorities=("1-URGENT", "2-HIGH"),
                         num_partitions: int = 8):
    """TPC-H Q12 shape (adapted: no l_shipmode, so lineitems band by
    SHIPPING DELAY — floor years between order date and ship date,
    clamped to [band_lo, band_hi]): per delay band, how many lineitems
    belong to high-priority orders vs the rest —
    ``(delay_band, high_count, low_count)`` sorted by band.

    One distributed hash join (lineitem keys meet order
    date/priority), then a packed (band, is_high) per-batch counting
    combiner collapses the stream onto <= 2*(hi-lo+1) cells. The band
    is ``floor(double_us_delta / band_us)`` — a single identical IEEE
    divide+floor in both engines (deltas << 2^53 stay exact)."""
    P = _clamp_partitions(num_partitions)
    hp = set(high_priorities)
    empty = pa.table({
        "delay_band": pa.array([], pa.int64()),
        "high_count": pa.array([], pa.int64()),
        "low_count": pa.array([], pa.int64()),
    })

    li = (
        lineitem_ds.map_batches(
            lambda b: pa.table({
                "l_orderkey": b["l_orderkey"],
                "ship": pc.cast(b["l_shipdate"], pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .repartition(P)
        .materialize()
    )
    if li.count() == 0:
        return rd.from_arrow(empty)

    def ord_prep(b: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": b["o_orderkey"],
            "od": pc.cast(b["o_orderdate"], pa.int64()),
            "hi": pc.cast(
                pc.is_in(b["o_orderpriority"],
                         value_set=pa.array(sorted(hp), pa.string())),
                pa.int64(),
            ),
        })

    joined = li.join(
        orders_ds.map_batches(ord_prep, batch_format="pyarrow")
        .repartition(P),
        join_type="inner", num_partitions=P,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )
    span = band_hi - band_lo + 1

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        d = (
            b["ship"].to_numpy(zero_copy_only=False)
            - b["od"].to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        band = np.clip(
            np.floor(d / float(band_us)).astype(np.int64),
            band_lo, band_hi,
        )
        hi = b["hi"].to_numpy(zero_copy_only=False)
        key = (band - band_lo) * 2 + hi
        cnt = np.bincount(key, minlength=span * 2).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "key": pa.array(nz, pa.int64()),
            "n": pa.array(cnt[nz], pa.int64()),
        })

    agg = joined.map_batches(
        partial, batch_format="pyarrow"
    ).groupby("key").sum("n").materialize()
    if agg.count() == 0:
        return rd.from_arrow(empty)
    t = pa.concat_tables(
        list(agg.iter_batches(batch_format="pyarrow"))
    ).combine_chunks()
    key = t["key"].to_numpy(zero_copy_only=False)
    n = t["sum(n)"].to_numpy(zero_copy_only=False)
    full = np.zeros(span * 2, np.int64)
    full[key] = n
    bands = np.arange(band_lo, band_hi + 1, dtype=np.int64)
    lo_c, hi_c = full[0::2], full[1::2]
    present = (lo_c + hi_c) > 0
    return rd.from_arrow(pa.table({
        "delay_band": pa.array(bands[present], pa.int64()),
        "high_count": pa.array(hi_c[present], pa.int64()),
        "low_count": pa.array(lo_c[present], pa.int64()),
    }))


def vwap_by_month(lineitem_ds):
    """Volume-weighted average revenue per unit by ship month —
    ``(ship_month, n_items, qty, revenue_micro, vwap_micro)`` sorted
    by month: the monthly price index (total discounted revenue over
    total quantity). One per-batch (month, n, Σqty, Σrev) int64
    combiner onto month-cardinality cells; revenue uses the shared
    one-op micro chain; the VWAP is one division + zero-digit
    round."""

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ts = pc.cast(b["l_shipdate"], pa.int64()).to_numpy(
            zero_copy_only=False
        )
        months = _month_str(np.asarray(ts))
        qty = b["l_quantity"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        rev = _rev_micro(b)
        u, inv = np.unique(months, return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        qs = np.zeros(len(u), np.int64)
        np.add.at(qs, inv, qty)
        rs = np.zeros(len(u), np.int64)
        np.add.at(rs, inv, rev)
        return pa.table({
            "ship_month": pa.array(u.tolist(), pa.string()),
            "n": pa.array(n, pa.int64()),
            "q": pa.array(qs, pa.int64()),
            "r": pa.array(rs, pa.int64()),
        })

    agg = (
        lineitem_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ship_month")
        .sum(["n", "q", "r"])
    )

    def finalize(b: pa.Table) -> pa.Table:
        q = b["sum(q)"].to_numpy(zero_copy_only=False)
        r = b["sum(r)"].to_numpy(zero_copy_only=False)
        keep = q > 0
        vwap = pc.cast(
            pc.round(
                pa.array(r[keep].astype(np.float64)
                         / q[keep].astype(np.float64)),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        t = b.filter(pa.array(keep))
        return pa.table({
            "ship_month": t["ship_month"],
            "n_items": pc.cast(t["sum(n)"], pa.int64()),
            "qty": pc.cast(t["sum(q)"], pa.int64()),
            "revenue_micro": pc.cast(t["sum(r)"], pa.int64()),
            "vwap_micro": vwap,
        })

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        "ship_month"
    )
