"""Classic warehouse query shapes (functions/tpch.py): hand-computed
semantics on tiny tables plus sf0.001 DuckDB oracle replays for the
Q14/Q17/Q18/Q7/Q10/Q19 shapes."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from eschergraph_ray.functions.tpch import (
    banded_revenue,
    large_volume_orders,
    promo_revenue_by_month,
    returned_item_revenue,
    small_qty_revenue,
    volume_shipping,
)

SF = "/root/testdata/sf0.001"
REV = ("CAST(round(l_extendedprice * (1 - l_discount) * 1e6, 0) "
       "AS BIGINT)")


def _ts(day: str) -> int:
    return int(np.datetime64(day, "us").astype(np.int64))


def _li(rows):
    """lineitem-ish table from (orderkey, partkey, suppkey, qty,
    price, disc, flag, shipdate) tuples."""
    ok, pk, sk, q, ep, di, fl, sd = zip(*rows)
    return rd.from_arrow(pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
        "l_suppkey": pa.array(sk, pa.int64()),
        "l_quantity": pa.array([float(x) for x in q], pa.float64()),
        "l_extendedprice": pa.array([float(x) for x in ep],
                                    pa.float64()),
        "l_discount": pa.array([float(x) for x in di], pa.float64()),
        "l_returnflag": pa.array(fl, pa.string()),
        "l_shipdate": pa.array(
            np.array([_ts(x) for x in sd], "datetime64[us]")
        ),
    }))


def test_promo_share_hand_computed():
    li = _li([
        (1, 10, 1, 1, 100.0, 0.0, "N", "1996-01-05"),
        (1, 11, 1, 1, 200.0, 0.5, "N", "1996-01-20"),
        (2, 10, 1, 1, 50.0, 0.0, "N", "1996-02-01"),
        (3, 10, 1, 1, 999.0, 0.0, "N", "1999-02-01"),  # out of window
    ])
    out = promo_revenue_by_month(
        li, np.array([10]), _ts("1996-01-01"), _ts("1997-01-01")
    ).to_pandas()
    got = {r.ship_month: (r.promo_rev_micro, r.total_rev_micro)
           for r in out.itertuples()}
    assert got == {"1996-01": (100_000_000, 200_000_000),
                   "1996-02": (50_000_000, 50_000_000)}


def test_promo_share_empty_window():
    li = _li([(1, 10, 1, 1, 100.0, 0.0, "N", "1996-01-05")])
    out = promo_revenue_by_month(
        li, np.array([10]), _ts("2005-01-01"), _ts("2006-01-01")
    )
    assert out.count() == 0


def test_small_qty_revenue_strict_fraction_boundary():
    # part 7: quantities 10,10,40 -> sum=60 cnt=3; 1/5 avg = 4;
    # qty 4 is NOT < 4 (strict), qty 3 is
    li = _li([
        (1, 7, 1, 10, 100.0, 0.0, "N", "1996-01-01"),
        (2, 7, 1, 10, 100.0, 0.0, "N", "1996-01-01"),
        (3, 7, 1, 40, 100.0, 0.0, "N", "1996-01-01"),
    ])
    out = small_qty_revenue(li, np.array([7])).to_pandas()
    assert out.n_items[0] == 0 and out.revenue_micro[0] == 0
    li2 = _li([
        (1, 7, 1, 20, 100.0, 0.0, "N", "1996-01-01"),
        (2, 7, 1, 20, 100.0, 0.0, "N", "1996-01-01"),
        (3, 7, 1, 3, 70.0, 0.5, "N", "1996-01-01"),  # 3 < 43/5*... ?
    ])
    # sum=43 cnt=3: small iff 5*q*3 < 43 -> q < 2.87 -> qty 3 is NOT
    out2 = small_qty_revenue(li2, np.array([7])).to_pandas()
    assert out2.n_items[0] == 0
    li3 = _li([
        (1, 7, 1, 20, 100.0, 0.0, "N", "1996-01-01"),
        (2, 7, 1, 20, 100.0, 0.0, "N", "1996-01-01"),
        (3, 7, 1, 2, 70.0, 0.5, "N", "1996-01-01"),
    ])
    # sum=42 cnt=3: 5*2*3=30 < 42 -> qty-2 row IS small
    out3 = small_qty_revenue(li3, np.array([7])).to_pandas()
    assert out3.n_items[0] == 1
    assert out3.revenue_micro[0] == 35_000_000
    assert out3.avg_yearly_micro[0] == 35_000_000 // 7


def test_small_qty_revenue_no_brand_parts():
    li = _li([(1, 7, 1, 10, 100.0, 0.0, "N", "1996-01-01")])
    out = small_qty_revenue(li, np.array([99])).to_pandas()
    assert (out.n_items[0], out.revenue_micro[0]) == (0, 0)


def _orders(rows):
    ok, ck, pr, dt = zip(*rows)
    return rd.from_arrow(pa.table({
        "o_orderkey": pa.array(ok, pa.int64()),
        "o_custkey": pa.array(ck, pa.int64()),
        "o_totalprice": pa.array([float(x) for x in pr], pa.float64()),
        "o_orderdate": pa.array(
            np.array([_ts(x) for x in dt], "datetime64[us]")
        ),
    }))


def _cust(rows):
    ck, nm, nk, bal = zip(*rows)
    return rd.from_arrow(pa.table({
        "c_custkey": pa.array(ck, pa.int64()),
        "c_name": pa.array(nm, pa.string()),
        "c_nationkey": pa.array(nk, pa.int64()),
        "c_acctbal": pa.array([float(x) for x in bal], pa.float64()),
    }))


def test_large_volume_orders_hand_computed():
    li = _li([
        (1, 10, 1, 60, 1.0, 0.0, "N", "1996-01-01"),
        (1, 10, 1, 50, 1.0, 0.0, "N", "1996-01-01"),
        (2, 10, 1, 40, 1.0, 0.0, "N", "1996-01-01"),
    ])
    out = large_volume_orders(
        li,
        _orders([(1, 5, 123.45, "1996-03-01"),
                 (2, 5, 999.0, "1996-03-02")]),
        _cust([(5, "cust5", 0, 0.0)]),
        qty_threshold=100,
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.c_name, r.o_orderkey, r.sum_qty) == ("cust5", 1, 110)
    assert r.o_totalprice_micro == 123_450_000


def test_large_volume_orders_empty_survivors():
    li = _li([(1, 10, 1, 5, 1.0, 0.0, "N", "1996-01-01")])
    out = large_volume_orders(
        li, _orders([(1, 5, 1.0, "1996-03-01")]),
        _cust([(5, "c", 0, 0.0)]), qty_threshold=1000,
    )
    assert out.count() == 0


def test_volume_shipping_hand_computed():
    # supplier 1 -> nation 0, supplier 2 -> nation 1;
    # cust 5 -> nation 1, cust 6 -> nation 0
    li = _li([
        (1, 0, 1, 1, 100.0, 0.0, "N", "1996-05-01"),  # n0 -> n1
        (2, 0, 2, 1, 40.0, 0.0, "N", "1997-05-01"),   # n1 -> n0
        (3, 0, 1, 1, 7.0, 0.0, "N", "1996-06-01"),    # n0 -> n0: drop
    ])
    out = volume_shipping(
        li,
        _orders([(1, 5, 0.0, "1996-01-01"),
                 (2, 6, 0.0, "1996-01-01"),
                 (3, 6, 0.0, "1996-01-01")]),
        _cust([(5, "a", 1, 0.0), (6, "b", 0, 0.0)]),
        supplier_nation={1: 0, 2: 1},
        nation_name={0: "N0", 1: "N1"},
        nation_a="N0", nation_b="N1",
        date_lo_us=_ts("1996-01-01"), date_hi_us=_ts("1998-01-01"),
    ).to_pandas()
    got = {(r.supp_nation, r.cust_nation, r.l_year): r.revenue_micro
           for r in out.itertuples()}
    assert got == {("N0", "N1", 1996): 100_000_000,
                   ("N1", "N0", 1997): 40_000_000}


def test_returned_item_revenue_hand_computed():
    li = _li([
        (1, 0, 1, 1, 100.0, 0.0, "R", "1996-05-01"),
        (1, 0, 1, 1, 60.0, 0.5, "R", "1996-05-02"),
        (2, 0, 1, 1, 999.0, 0.0, "N", "1996-05-01"),  # not returned
    ])
    out = returned_item_revenue(
        li,
        _orders([(1, 5, 0.0, "1996-02-01"), (2, 5, 0.0, "1996-02-01")]),
        _cust([(5, "cust5", 0, 12.34)]),
        date_lo_us=_ts("1996-01-01"), date_hi_us=_ts("1997-01-01"),
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.c_custkey, r.c_name) == (5, "cust5")
    assert r.revenue_micro == 130_000_000
    assert r.c_acctbal_micro == 12_340_000


def test_returned_item_revenue_empty_window():
    li = _li([(1, 0, 1, 1, 100.0, 0.0, "R", "1996-05-01")])
    out = returned_item_revenue(
        li, _orders([(1, 5, 0.0, "1996-02-01")]),
        _cust([(5, "c", 0, 0.0)]),
        date_lo_us=_ts("2005-01-01"), date_hi_us=_ts("2006-01-01"),
    )
    assert out.count() == 0


def test_banded_revenue_hand_computed():
    li = _li([
        (1, 10, 1, 5, 100.0, 0.0, "N", "1996-01-01"),   # band hit
        (1, 11, 1, 5, 50.0, 0.0, "N", "1996-01-01"),    # wrong brand
        (2, 10, 1, 30, 70.0, 0.0, "N", "1996-01-01"),   # qty out
    ])
    out = banded_revenue(
        li,
        part_keys=np.array([10, 11]),
        part_brands=np.array(["B1", "B2"]),
        part_sizes=np.array([5, 5]),
        bands=[("B1", 1, 10, 1, 20)],
    ).to_pandas()
    assert (out.n_items[0], out.revenue_micro[0]) == (1, 100_000_000)


def test_banded_revenue_no_match():
    li = _li([(1, 10, 1, 5, 100.0, 0.0, "N", "1996-01-01")])
    out = banded_revenue(
        li, np.array([10]), np.array(["B1"]), np.array([5]),
        bands=[("NOPE", 1, 10, 1, 20)],
    ).to_pandas()
    assert (out.n_items[0], out.revenue_micro[0]) == (0, 0)


# ---- sf0.001 DuckDB oracle replays -----------------------------------


def _con():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "part", "supplier",
              "nation"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _cmp(got: pd.DataFrame, want: pd.DataFrame):
    g = (got[sorted(got.columns)].sort_values(sorted(got.columns))
         .reset_index(drop=True))
    w = (want[sorted(want.columns)].sort_values(sorted(want.columns))
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_promo_share_oracle_sf0001():
    part = pq.read_table(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_type"])
    import pyarrow.compute as pc
    promo = part.filter(pc.equal(part["p_type"], "PROMO"))["p_partkey"]
    got = promo_revenue_by_month(
        rd.read_parquet(f"{SF}/lineitem.parquet"),
        promo.to_numpy(), _ts("1996-01-01"), _ts("1997-01-01"),
    ).to_pandas()
    want = _con().execute(f"""
        SELECT strftime(l.l_shipdate, '%Y-%m') AS ship_month,
               CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN {REV}
                             ELSE 0 END) AS BIGINT) AS promo_rev_micro,
               CAST(sum({REV}) AS BIGINT) AS total_rev_micro
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE l.l_shipdate >= '1996-01-01' AND l.l_shipdate < '1997-01-01'
        GROUP BY 1
    """).df()
    _cmp(got, want)


def test_small_qty_revenue_oracle_sf0001():
    part = pq.read_table(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    import pyarrow.compute as pc
    brand = part.filter(pc.equal(part["p_brand"], "Brand#4"))["p_partkey"]
    got = small_qty_revenue(
        rd.read_parquet(f"{SF}/lineitem.parquet"), brand.to_numpy(),
    ).to_pandas()
    want = _con().execute(f"""
        WITH bl AS (
          SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS qty,
                 {REV} AS rev
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_brand = 'Brand#4'
        ),
        st AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) s,
                      CAST(count(*) AS BIGINT) c FROM bl GROUP BY 1),
        small AS (SELECT rev FROM bl JOIN st USING (l_partkey)
                  WHERE 5 * qty * c < s)
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(coalesce(sum(rev), 0) AS BIGINT) AS revenue_micro,
               CAST(coalesce(sum(rev), 0) // 7 AS BIGINT)
                 AS avg_yearly_micro
        FROM small
    """).df()
    _cmp(got, want)


def test_large_volume_oracle_sf0001():
    got = large_volume_orders(
        rd.read_parquet(f"{SF}/lineitem.parquet"),
        rd.read_parquet(f"{SF}/orders.parquet"),
        rd.read_parquet(f"{SF}/customer.parquet"),
        qty_threshold=200, k=50,
    ).to_pandas()
    want = _con().execute("""
        WITH q AS (
          SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT))
                 AS BIGINT) AS sum_qty
          FROM lineitem GROUP BY 1
          HAVING sum(CAST(l_quantity AS BIGINT)) > 200
        )
        SELECT c.c_name, o.o_orderkey,
               CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate_us,
               CAST(round(o.o_totalprice * 1e6, 0) AS BIGINT)
                 AS o_totalprice_micro,
               q.sum_qty
        FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY o_totalprice_micro DESC, o_orderdate_us, o.o_orderkey
        LIMIT 50
    """).df()
    _cmp(got, want)


def test_volume_shipping_oracle_sf0001():
    nat = pq.read_table(f"{SF}/nation.parquet").to_pydict()
    sup = pq.read_table(f"{SF}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pydict()
    got = volume_shipping(
        rd.read_parquet(f"{SF}/lineitem.parquet"),
        rd.read_parquet(f"{SF}/orders.parquet"),
        rd.read_parquet(f"{SF}/customer.parquet"),
        supplier_nation={int(k): int(v) for k, v in
                         zip(sup["s_suppkey"], sup["s_nationkey"])},
        nation_name={int(k): str(v) for k, v in
                     zip(nat["n_nationkey"], nat["n_name"])},
        nation_a="NATION_12", nation_b="NATION_11",
        date_lo_us=_ts("1996-01-01"), date_hi_us=_ts("1998-01-01"),
    ).to_pandas()
    want = _con().execute(f"""
        WITH l AS (
          SELECT l_orderkey, l_suppkey, {REV} AS rev,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year
          FROM lineitem
          WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1998-01-01'
        )
        SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
               l.l_year, CAST(sum(l.rev) AS BIGINT) AS revenue_micro
        FROM l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc ON nc.n_nationkey = c.c_nationkey
        WHERE (ns.n_name = 'NATION_12' AND nc.n_name = 'NATION_11')
           OR (ns.n_name = 'NATION_11' AND nc.n_name = 'NATION_12')
        GROUP BY 1, 2, 3
    """).df()
    _cmp(got, want)


def test_returned_revenue_oracle_sf0001():
    got = returned_item_revenue(
        rd.read_parquet(f"{SF}/lineitem.parquet"),
        rd.read_parquet(f"{SF}/orders.parquet"),
        rd.read_parquet(f"{SF}/customer.parquet"),
        date_lo_us=_ts("1996-07-01"), date_hi_us=_ts("1996-10-01"),
        k=10,
    ).to_pandas()
    want = _con().execute(f"""
        WITH rev AS (
          SELECT l_orderkey, CAST(sum({REV}) AS BIGINT) AS r
          FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
        ),
        per_cust AS (
          SELECT o.o_custkey,
                 CAST(sum(rev.r) AS BIGINT) AS revenue_micro
          FROM rev JOIN orders o ON o.o_orderkey = rev.l_orderkey
          WHERE o.o_orderdate >= '1996-07-01'
            AND o.o_orderdate < '1996-10-01'
          GROUP BY 1 ORDER BY revenue_micro DESC, o.o_custkey LIMIT 10
        )
        SELECT p.o_custkey AS c_custkey, c.c_name,
               CAST(round(c.c_acctbal * 1e6, 0) AS BIGINT)
                 AS c_acctbal_micro,
               p.revenue_micro
        FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey
    """).df()
    _cmp(got, want)


def test_banded_revenue_oracle_sf0001():
    part = pq.read_table(
        f"{SF}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
    ).sort_by("p_partkey")
    got = banded_revenue(
        rd.read_parquet(f"{SF}/lineitem.parquet"),
        part["p_partkey"].to_numpy(),
        np.asarray(part["p_brand"].to_pylist()),
        part["p_size"].to_numpy(),
        bands=[("Brand#4", 1, 15, 1, 20), ("Brand#2", 10, 30, 5, 25)],
    ).to_pandas()
    want = _con().execute(f"""
        WITH hit AS (
          SELECT {REV} AS rev
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
                 AND CAST(l.l_quantity AS BIGINT) BETWEEN 1 AND 20)
             OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
                 AND CAST(l.l_quantity AS BIGINT) BETWEEN 5 AND 25)
        )
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(coalesce(sum(rev), 0) AS BIGINT) AS revenue_micro
        FROM hit
    """).df()
    _cmp(got, want)


# ---- Q15 / Q8 / Q4 / Q22 shapes ---------------------------------------


def test_top_supplier_ties_all_survive():
    from eschergraph_ray.functions.tpch import top_supplier_revenue

    li = _li([
        (1, 0, 1, 1, 100.0, 0.0, "N", "1996-02-01"),
        (2, 0, 2, 1, 60.0, 0.0, "N", "1996-02-02"),
        (3, 0, 2, 1, 40.0, 0.0, "N", "1996-02-03"),
        (4, 0, 3, 1, 5.0, 0.0, "N", "1996-02-04"),
        (5, 0, 1, 1, 999.0, 0.0, "N", "1999-01-01"),  # out of window
    ])
    sup = rd.from_arrow(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s1", "s2", "s3"], pa.string()),
    }))
    out = top_supplier_revenue(
        li, sup, _ts("1996-01-01"), _ts("1997-01-01")
    ).to_pandas()
    # suppliers 1 and 2 tie at 100.0
    assert list(out.s_suppkey) == [1, 2]
    assert list(out.s_name) == ["s1", "s2"]
    assert set(out.total_revenue_micro) == {100_000_000}


def test_top_supplier_empty_window():
    from eschergraph_ray.functions.tpch import top_supplier_revenue

    li = _li([(1, 0, 1, 1, 100.0, 0.0, "N", "1996-02-01")])
    sup = rd.from_arrow(pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_name": pa.array(["s1"], pa.string()),
    }))
    out = top_supplier_revenue(
        li, sup, _ts("2005-01-01"), _ts("2006-01-01")
    )
    assert out.count() == 0


def test_market_share_hand_computed():
    from eschergraph_ray.functions.tpch import market_share

    li = _li([
        (1, 10, 1, 1, 100.0, 0.0, "N", "1996-02-01"),  # target supp
        (2, 10, 2, 1, 60.0, 0.0, "N", "1996-02-01"),   # other supp
        (3, 11, 1, 1, 999.0, 0.0, "N", "1996-02-01"),  # wrong type
        (4, 10, 1, 1, 50.0, 0.0, "N", "1996-02-01"),   # cust outside
    ])
    out = market_share(
        li,
        _orders([(1, 5, 0.0, "1996-01-01"), (2, 5, 0.0, "1997-01-01"),
                 (3, 5, 0.0, "1996-01-01"), (4, 6, 0.0, "1996-01-01")]),
        _cust([(5, "in", 1, 0.0), (6, "out", 9, 0.0)]),
        type_partkeys=np.array([10]),
        supplier_nation={1: 3, 2: 4},
        region_cust_nations={1},
        target_nation=3,
    ).to_pandas()
    got = {r.o_year: (r.nation_rev_micro, r.total_rev_micro)
           for r in out.itertuples()}
    assert got == {1996: (100_000_000, 100_000_000),
                   1997: (0, 60_000_000)}


def test_late_shipment_priorities_hand_computed():
    from eschergraph_ray.functions.tpch import late_shipment_priorities

    li = _li([
        (1, 0, 1, 1, 1.0, 0.0, "N", "1996-01-10"),   # on time
        (1, 0, 1, 1, 1.0, 0.0, "N", "1996-06-01"),   # late -> order 1
        (2, 0, 1, 1, 1.0, 0.0, "N", "1996-01-20"),   # on time only
        (3, 0, 1, 1, 1.0, 0.0, "N", "1999-06-01"),   # order outside
    ])
    orders = rd.from_arrow(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_orderdate": pa.array(np.array(
            [_ts("1996-01-01"), _ts("1996-01-01"), _ts("1999-01-01")],
            "datetime64[us]")),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "5-LOW"],
                                    pa.string()),
    }))
    out = late_shipment_priorities(
        li, orders, _ts("1996-01-01"), _ts("1997-01-01"), grace_days=60
    ).to_pandas()
    assert list(out.o_orderpriority) == ["1-URGENT"]
    assert list(out.order_count) == [1]


def test_waiting_customers_hand_computed():
    from eschergraph_ray.functions.tpch import waiting_customers

    # balances 10, 20, 30, -5: positive avg = 20 -> only 30 beats it
    # (strict); cust 3 ordered recently, cust 4 long ago
    cust = _cust([(1, "a", 0, 10.0), (2, "b", 0, 20.0),
                  (3, "c", 1, 30.0), (4, "d", 1, 30.0),
                  (5, "e", 2, -5.0)])
    orders = _orders([(1, 3, 0.0, "2000-01-01"),
                      (2, 4, 0.0, "1996-01-01")])
    out = waiting_customers(
        cust, orders, since_us=_ts("1999-01-01")
    ).to_pandas()
    assert list(out.c_nationkey) == [1]
    assert list(out.n_custs) == [1]
    assert list(out.total_bal_micro) == [30_000_000]


def test_waiting_customers_no_recent_orders():
    from eschergraph_ray.functions.tpch import waiting_customers

    cust = _cust([(1, "a", 0, 10.0), (2, "b", 1, 30.0)])
    orders = _orders([(1, 1, 0.0, "1996-01-01")])
    out = waiting_customers(
        cust, orders, since_us=_ts("1999-01-01")
    ).to_pandas()
    # avg positive = 20 -> cust 2 qualifies; nobody ordered recently
    assert list(out.c_nationkey) == [1]
    assert list(out.total_bal_micro) == [30_000_000]


def test_top_supplier_oracle_sf0001():
    from eschergraph_ray.functions.tpch import top_supplier_revenue

    got = top_supplier_revenue(
        rd.read_parquet(f"{SF}/lineitem.parquet"),
        rd.read_parquet(f"{SF}/supplier.parquet"),
        _ts("1996-01-01"), _ts("1996-04-01"),
    ).to_pandas()
    want = _con().execute(f"""
        WITH r AS (
          SELECT l_suppkey, CAST(sum({REV}) AS BIGINT) AS total
          FROM lineitem
          WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
          GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name, r.total AS total_revenue_micro
        FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
        WHERE r.total = (SELECT max(total) FROM r)
    """).df()
    _cmp(got, want)


def test_late_priority_oracle_sf0001():
    from eschergraph_ray.functions.tpch import late_shipment_priorities

    got = late_shipment_priorities(
        rd.read_parquet(f"{SF}/lineitem.parquet"),
        rd.read_parquet(f"{SF}/orders.parquet"),
        _ts("1996-01-01"), _ts("1997-01-01"), grace_days=60,
    ).to_pandas()
    want = _con().execute("""
        WITH ms AS (
          SELECT l_orderkey, max(epoch_us(l_shipdate)) AS last_ship
          FROM lineitem GROUP BY 1
        )
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS order_count
        FROM orders o JOIN ms ON ms.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= '1996-01-01'
          AND o.o_orderdate < '1997-01-01'
          AND ms.last_ship > epoch_us(o.o_orderdate) + 5184000000000
        GROUP BY 1
    """).df()
    _cmp(got, want)


def test_waiting_customers_oracle_sf0001():
    from eschergraph_ray.functions.tpch import waiting_customers

    got = waiting_customers(
        rd.read_parquet(f"{SF}/customer.parquet"),
        rd.read_parquet(f"{SF}/orders.parquet"),
        since_us=_ts("1999-01-01"),
    ).to_pandas()
    want = _con().execute("""
        WITH s AS (
          SELECT CAST(sum(CAST(round(c_acctbal * 1e6, 0) AS BIGINT))
                      AS BIGINT) AS sp,
                 CAST(count(*) AS BIGINT) AS np
          FROM customer WHERE c_acctbal > 0
        ),
        recent AS (
          SELECT o_custkey FROM orders
          WHERE o_orderdate >= '1999-01-01'
        ),
        w AS (
          SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                 CAST(round(c_acctbal * 1e6, 0) AS BIGINT) AS bal
          FROM customer, s
          WHERE CAST(round(c_acctbal * 1e6, 0) AS BIGINT) * s.np > s.sp
            AND c_custkey NOT IN (SELECT o_custkey FROM recent)
        )
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_custs,
               CAST(sum(bal) AS BIGINT) AS total_bal_micro
        FROM w GROUP BY 1
    """).df()
    _cmp(got, want)


def test_large_volume_broadcast_vs_join_parity():
    from eschergraph_ray.functions.tpch import large_volume_orders

    args = (
        rd.read_parquet(f"{SF}/lineitem.parquet"),
        rd.read_parquet(f"{SF}/orders.parquet"),
        rd.read_parquet(f"{SF}/customer.parquet"),
    )
    fast = large_volume_orders(*args, qty_threshold=200, k=50).to_pandas()
    slow = large_volume_orders(
        *args, qty_threshold=200, k=50, max_broadcast=0
    ).to_pandas()
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True),
        check_dtype=False,
    )


def test_top_supplier_broadcast_vs_join_parity():
    from eschergraph_ray.functions.tpch import top_supplier_revenue

    args = (
        rd.read_parquet(f"{SF}/lineitem.parquet"),
        rd.read_parquet(f"{SF}/supplier.parquet"),
        _ts("1996-01-01"), _ts("1997-01-01"),
    )
    fast = top_supplier_revenue(*args).to_pandas()
    slow = top_supplier_revenue(*args, max_broadcast=0).to_pandas()
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True),
        check_dtype=False,
    )


def test_forecast_revenue_hand_computed():
    from eschergraph_ray.functions.tpch import forecast_revenue_change

    li = _li([
        (1, 0, 1, 10, 100.0, 0.05, "N", "1996-05-01"),  # hit: 5.0
        (2, 0, 1, 30, 100.0, 0.05, "N", "1996-05-01"),  # qty out
        (3, 0, 1, 10, 100.0, 0.09, "N", "1996-05-01"),  # disc out
        (4, 0, 1, 10, 100.0, 0.05, "N", "1999-05-01"),  # date out
    ])
    out = forecast_revenue_change(
        li, _ts("1996-01-01"), _ts("1997-01-01"),
        disc_lo=0.04, disc_hi=0.06, qty_below=24,
    ).to_pandas()
    assert (out.n_items[0], out.revenue_micro[0]) == (1, 5_000_000)


def test_forecast_revenue_oracle_sf0001():
    from eschergraph_ray.functions.tpch import forecast_revenue_change

    got = forecast_revenue_change(
        rd.read_parquet(f"{SF}/lineitem.parquet"),
        _ts("1996-01-01"), _ts("1997-01-01"),
        disc_lo=0.04, disc_hi=0.06, qty_below=24,
    ).to_pandas()
    want = _con().execute("""
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(coalesce(sum(CAST(round(
                   l_extendedprice * l_discount * 1e6, 0) AS BIGINT)),
                   0) AS BIGINT) AS revenue_micro
        FROM lineitem
        WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
          AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
    """).df()
    _cmp(got, want)


def _po(rows):
    """orders-ish table with priority: (orderkey, date, priority)."""
    ok, dt, pr = zip(*rows)
    return rd.from_arrow(pa.table({
        "o_orderkey": pa.array(ok, pa.int64()),
        "o_orderdate": pa.array(
            np.array([_ts(x) for x in dt], "datetime64[us]")
        ),
        "o_orderpriority": pa.array(pr, pa.string()),
    }))


def test_sole_late_suppliers_hand_computed():
    from eschergraph_ray.functions.tpch import sole_late_suppliers

    # O1: supp1 (one early + one late line -> late via max), supp2
    #     on time -> qualifies, winner supp1
    # O2: single supplier late -> excluded (needs >=2 suppliers)
    # O3: both suppliers late -> excluded (not sole)
    # O4: supp1 on time, supp3 late -> winner supp3
    li = _li([
        (1, 0, 1, 1, 10.0, 0.0, "N", "1996-01-02"),
        (1, 0, 1, 1, 10.0, 0.0, "N", "1996-06-01"),
        (1, 0, 2, 1, 10.0, 0.0, "N", "1996-01-15"),
        (2, 0, 1, 1, 10.0, 0.0, "N", "1996-09-01"),
        (3, 0, 1, 1, 10.0, 0.0, "N", "1996-06-01"),
        (3, 0, 2, 1, 10.0, 0.0, "N", "1996-07-01"),
        (4, 0, 1, 1, 10.0, 0.0, "N", "1996-01-05"),
        (4, 0, 3, 1, 10.0, 0.0, "N", "1996-12-01"),
    ])
    orders = _po([(1, "1996-01-01", "5-LOW"), (2, "1996-01-01", "5-LOW"),
                  (3, "1996-01-01", "5-LOW"), (4, "1996-01-01", "5-LOW")])
    sup = rd.from_arrow(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"], pa.string()),
        "s_nationkey": pa.array([0, 1, 0], pa.int32()),
    }))
    out = sole_late_suppliers(
        li, orders, sup, {0: "A", 1: "B"}, grace_days=60
    ).to_pandas()
    assert list(out["s_name"]) == ["S1", "S3"]
    assert list(out["nation"]) == ["A", "A"]
    assert list(out["numwait"]) == [1, 1]


def test_sole_late_suppliers_none_qualify():
    from eschergraph_ray.functions.tpch import sole_late_suppliers

    li = _li([(1, 0, 1, 1, 10.0, 0.0, "N", "1996-01-02")])
    orders = _po([(1, "1996-01-01", "5-LOW")])
    sup = rd.from_arrow(pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_name": pa.array(["S1"], pa.string()),
        "s_nationkey": pa.array([0], pa.int32()),
    }))
    out = sole_late_suppliers(li, orders, sup, {0: "A"})
    assert out.count() == 0


def test_profit_by_nation_year_hand_computed():
    from eschergraph_ray.functions.tpch import profit_by_nation_year

    li = _li([
        (1, 10, 1, 2, 1000.0, 0.0, "N", "1996-01-01"),
        (1, 11, 2, 1, 500.0, 0.5, "N", "1996-01-01"),
        (2, 10, 1, 1, 100.0, 0.0, "N", "1996-01-01"),
        (2, 99, 1, 1, 777.0, 0.0, "N", "1996-01-01"),  # unmatched part
    ])
    orders = _orders([(1, 1, 0.0, "1995-03-01"),
                      (2, 1, 0.0, "1996-03-01")])
    out = profit_by_nation_year(
        li, orders,
        part_keys=np.array([10, 11]),
        part_retail=np.array([100.0, 50.0]),
        supp_keys=np.array([1, 2]),
        supp_nat=np.array([0, 1]),
        nation_name={0: "A", 1: "B"},
        cost_factor=0.6,
    ).to_pandas()
    # rev(1e6): 1000, 250, 100; cost: 100*2*.6=120, 50*1*.6=30, 60
    rows = list(zip(out["nation"], out["o_year"], out["profit_micro"]))
    assert rows == [("A", 1996, 40_000_000),
                    ("A", 1995, 880_000_000),
                    ("B", 1995, 220_000_000)]


def test_shipping_delay_bands_hand_computed():
    from eschergraph_ray.functions.tpch import shipping_delay_bands

    li = _li([
        (1, 0, 1, 1, 1.0, 0.0, "N", "1996-06-01"),   # +152d -> 0
        (1, 0, 1, 1, 1.0, 0.0, "N", "1997-06-05"),   # +521d -> 1
        (2, 0, 1, 1, 1.0, 0.0, "N", "1995-01-01"),   # -365d -> -1
        (2, 0, 1, 1, 1.0, 0.0, "N", "1980-01-01"),   # clamp -> -7
    ])
    orders = _po([(1, "1996-01-01", "1-URGENT"),
                  (2, "1995-12-31", "5-LOW")])
    out = shipping_delay_bands(li, orders).to_pandas()
    rows = list(zip(out["delay_band"], out["high_count"],
                    out["low_count"]))
    assert rows == [(-7, 0, 1), (-1, 0, 1), (0, 1, 0), (1, 1, 0)]


def test_sole_late_oracle_sf0001():
    from eschergraph_ray.functions.tpch import sole_late_suppliers

    nat = pq.read_table(f"{SF}/nation.parquet").to_pydict()
    out = sole_late_suppliers(
        rd.read_parquet(f"{SF}/lineitem.parquet",
                        columns=["l_orderkey", "l_suppkey",
                                 "l_shipdate"]),
        rd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"]),
        rd.read_parquet(f"{SF}/supplier.parquet",
                        columns=["s_suppkey", "s_name",
                                 "s_nationkey"]),
        {int(k): str(v) for k, v in
         zip(nat["n_nationkey"], nat["n_name"])},
        grace_days=60, k=25,
    ).to_pandas()
    con = duckdb.connect()
    for t in ("lineitem", "orders", "supplier", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    o = con.execute("""
        WITH ls AS (
          SELECT l_orderkey AS ok, l_suppkey AS sk,
                 max(CASE WHEN epoch_us(l_shipdate)
                          > epoch_us(o_orderdate) + 5184000000000
                     THEN 1 ELSE 0 END) AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        od AS (SELECT ok, count(*) AS ns, sum(late) AS nl,
                      min(CASE WHEN late = 1 THEN sk END) AS lsk
               FROM ls GROUP BY 1),
        w AS (SELECT lsk AS sk, count(*) AS numwait FROM od
              WHERE ns >= 2 AND nl = 1 GROUP BY 1)
        SELECT s_name, n_name AS nation,
               CAST(numwait AS BIGINT) AS numwait
        FROM w JOIN supplier ON s_suppkey = sk
        JOIN nation ON n_nationkey = s_nationkey
        ORDER BY numwait DESC, s_name LIMIT 25
    """).df()
    pd.testing.assert_frame_equal(out, o, check_dtype=False)


def test_vwap_by_month_hand_computed():
    from eschergraph_ray.functions.tpch import vwap_by_month

    li = _li([
        (1, 0, 1, 2, 100.0, 0.0, "N", "1996-01-05"),
        (2, 0, 1, 3, 300.0, 0.5, "N", "1996-01-20"),
        (3, 0, 1, 4, 100.0, 0.0, "N", "1996-02-01"),
    ])
    out = vwap_by_month(li).to_pandas()
    jan = out[out["ship_month"] == "1996-01"].iloc[0]
    # rev = 100e6 + 150e6 = 250e6 over qty 5 -> 50e6/unit
    assert (jan["n_items"], jan["qty"], jan["revenue_micro"],
            jan["vwap_micro"]) == (2, 5, 250_000_000, 50_000_000)
    feb = out[out["ship_month"] == "1996-02"].iloc[0]
    assert feb["vwap_micro"] == 25_000_000
