"""Rollup aggregates and tag-union anti-join — hand-computed
semantics plus sf0.001 DuckDB oracle replays."""

import duckdb
import pandas as pd
import pyarrow as pa
import ray.data as rd

from eschergraph_ray.functions.relational import antijoin_counts, rollup_counts

SF = "/root/testdata/sf0.001"


def test_rollup_hand_computed():
    tbl = pa.table(
        {
            "t": pa.array(["a", "a", "a", "b"], pa.string()),
            "h": pa.array([1, 1, 2, 2], pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        }
    )
    out = rollup_counts(
        rd.from_arrow(tbl), "t", "h", "value", sentinel1="(all)", sentinel2=-1
    ).to_pandas()
    got = {(r.t, r.h): (r.n, r.sum_cents) for r in out.itertuples()}
    assert got[("a", 1)] == (2, 300)
    assert got[("a", 2)] == (1, 300)
    assert got[("b", 2)] == (1, 400)
    assert got[("a", -1)] == (3, 600)
    assert got[("b", -1)] == (1, 400)
    assert got[("(all)", -1)] == (4, 1000)
    assert len(out) == 6


def test_rollup_oracle_replay_sf0001():
    ds = rd.read_parquet(
        f"{SF}/events.parquet", columns=["event_type", "ts", "value"]
    )
    import pyarrow.compute as pc

    def prep(b):
        hr = pc.divide(pc.cast(b["ts"], pa.int64()), 3_600_000_000)
        return pa.table(
            {"event_type": b["event_type"], "hr": hr, "value": b["value"]}
        )

    got = (
        rollup_counts(
            ds.map_batches(prep, batch_format="pyarrow"),
            "event_type", "hr", "value", sentinel1="(all)", sentinel2=-1,
        )
        .to_pandas()
        .sort_values(["event_type", "hr"])
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(f"""
        WITH c AS (
          SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                 CAST(round(value * 100, 0) AS BIGINT) AS xc
          FROM read_parquet('{SF}/events.parquet')
        )
        SELECT coalesce(event_type, '(all)') AS event_type,
               coalesce(hr, -1) AS hr,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(xc) AS BIGINT) AS sum_cents
        FROM c GROUP BY ROLLUP (event_type, hr)
        ORDER BY event_type, hr
    """).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_rollup_empty_input_matches_sql_rollup():
    # SQL GROUP BY ROLLUP on empty input still emits ONE grand-total
    # row (count 0, NULL sum)
    tbl = pa.table(
        {
            "t": pa.array([], pa.string()),
            "h": pa.array([], pa.int64()),
            "value": pa.array([], pa.float64()),
        }
    )
    out = rollup_counts(
        rd.from_arrow(tbl), "t", "h", "value", sentinel1="(all)", sentinel2=-1
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.t, r.h, r.n) == ("(all)", -1, 0)
    assert pd.isna(r.sum_cents)


def test_antijoin_duplicate_keys_and_multilabel():
    # NOT IN + count(*) semantics: duplicate keep keys each count,
    # and a key appearing under two labels counts once per label
    keep = pa.table(
        {
            "k": pa.array([1, 1, 2, 2], pa.int64()),
            "seg": pa.array(["x", "y", "x", "x"], pa.string()),
        }
    )
    drop = pa.table({"dk": pa.array([], pa.int64())})
    out = antijoin_counts(
        rd.from_arrow(keep), rd.from_arrow(drop), "k", "dk", "seg"
    ).to_pandas()
    got = dict(zip(out["lbl"], out["n"]))
    assert got == {"x": 3, "y": 1}
    # everything dropped -> empty
    drop2 = pa.table({"dk": pa.array([1, 2], pa.int64())})
    out2 = antijoin_counts(
        rd.from_arrow(keep), rd.from_arrow(drop2), "k", "dk", "seg"
    )
    assert out2.take_all() == []


def test_antijoin_hand_computed():
    keep = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "seg": pa.array(["x", "x", "y", "z"], pa.string()),
        }
    )
    drop = pa.table({"dk": pa.array([2, 2, 4, 99], pa.int64())})
    out = antijoin_counts(
        rd.from_arrow(keep), rd.from_arrow(drop), "k", "dk", "seg"
    ).to_pandas()
    got = dict(zip(out["lbl"], out["n"]))
    # keys 1 (x) and 3 (y) survive; 2 and 4 are dropped; 99 is ignored
    assert got == {"x": 1, "y": 1}


def test_antijoin_oracle_replay_sf0001():
    import pyarrow.compute as pc

    cust = rd.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    orders = rd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: b.filter(pc.greater(b["o_totalprice"], 300000.0)).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    got = (
        antijoin_counts(cust, orders, "c_custkey", "o_custkey", "c_mktsegment")
        .to_pandas()
        .sort_values("lbl")
        .reset_index(drop=True)
        .rename(columns={"lbl": "c_mktsegment", "n": "n_customers"})
    )
    want = duckdb.connect().execute(f"""
        SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
        FROM read_parquet('{SF}/customer.parquet')
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM read_parquet('{SF}/orders.parquet')
               WHERE o_totalprice > 300000)
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """).df()
    assert len(got) > 0  # the 300k cut leaves customers on both scales
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_pivot_wide_hand_computed(ray_session):
    from eschergraph_ray.functions.relational import pivot_wide

    t = pa.table(
        {
            "k": [1, 1, 2, 2, 2, 3],
            "c": ["a", "b", "a", "a", "zzz", "b"],
            "v": [1.5, 2.0, 0.25, 0.75, 99.0, None],
        }
    )
    out = (
        pivot_wide(rd.from_arrow(t).repartition(3), "k", "c", ["a", "b"],
                   val_col="v", val_category="a")
        .to_pandas()
        .set_index("k")
    )
    assert list(out.columns) == ["n_a", "n_b", "a_micros"]
    assert out.loc[1].tolist() == [1, 1, 1_500_000]
    # unknown category 'zzz' folds into no column
    assert out.loc[2].tolist() == [2, 0, 1_000_000]
    # null value counts but contributes 0 micros
    assert out.loc[3].tolist() == [0, 1, 0]


def test_pivot_wide_counts_only_and_validation(ray_session):
    import pytest

    from eschergraph_ray.functions.relational import pivot_wide

    t = pa.table({"k": [1, 2], "c": ["a", "a"]})
    out = pivot_wide(rd.from_arrow(t), "k", "c", ["a"]).to_pandas()
    assert out["n_a"].tolist() == [1, 1]
    with pytest.raises(ValueError):
        pivot_wide(rd.from_arrow(t), "k", "c", [])
    with pytest.raises(ValueError):
        pivot_wide(rd.from_arrow(t), "k", "c", ["a"], val_category="a")


def test_rfm_segments_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.relational import rfm_segments

    D = 86_400_000_000
    # cust1: 2 orders (days 10,20) $10 each; cust2: 1 order day 30 $5;
    # cust3: 3 orders day 5 $1 each; cust4: 1 order day 1 $100
    rows = [
        (1, 10, 10.0), (1, 20, 10.0),
        (2, 30, 5.0),
        (3, 5, 1.0), (3, 5, 1.0), (3, 5, 1.0),
        (4, 1, 100.0),
    ]
    t = pa.table(
        {
            "c": pa.array([r[0] for r in rows], pa.int64()),
            "d": pa.array([r[1] * D for r in rows], pa.timestamp("us")),
            "p": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    out = (
        rfm_segments(rd.from_arrow(t).repartition(3), "c", "d", "p", k=2)
        .to_pandas()
    )
    # rec desc: c2,c1 | c3,c4 ; freq desc (tie by key): c3,c1 | c2,c4 ;
    # mon desc: c4,c1 | c2,c3 -> cells all singletons
    cells = {
        tuple(r[:3]): r[3]
        for r in out[["r_score", "f_score", "m_score",
                      "n_customers"]].itertuples(index=False)
    }
    assert cells == {
        (1, 1, 1): 1,  # cust1
        (1, 2, 2): 1,  # cust2
        (2, 1, 2): 1,  # cust3
        (2, 2, 1): 1,  # cust4
    }


def test_rfm_segments_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.relational import rfm_segments

    t = pa.table(
        {
            "c": pa.array([], pa.int64()),
            "d": pa.array([], pa.timestamp("us")),
            "p": pa.array([], pa.float64()),
        }
    )
    out = rfm_segments(rd.from_arrow(t), "c", "d", "p")
    assert out.schema().names == [
        "r_score", "f_score", "m_score", "n_customers"
    ]
    assert out.count() == 0


def test_pareto_deciles_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.relational import pareto_deciles

    t = pa.table(
        {
            "c": pa.array([4, 1, 1, 2, 3], pa.int64()),
            "p": pa.array([100.0, 10.0, 10.0, 5.0, 3.0], pa.float64()),
        }
    )
    out = pareto_deciles(
        rd.from_arrow(t).repartition(2), "c", "p", k=2
    ).to_pandas()
    # spend: c4=10000, c1=2000, c2=500, c3=300 cents
    # bucket1 {c4,c1}=12000; bucket2 {c2,c3}=800; total 12800
    assert out["decile"].tolist() == [1, 2]
    assert out["n_keys"].tolist() == [2, 2]
    assert out["cents"].tolist() == [12000, 800]
    assert out["cum_cents"].tolist() == [12000, 12800]
    assert out["share_micro"].tolist() == [937500, 1000000]


def test_pareto_deciles_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.relational import pareto_deciles

    t = pa.table(
        {"c": pa.array([], pa.int64()), "p": pa.array([], pa.float64())}
    )
    out = pareto_deciles(rd.from_arrow(t), "c", "p")
    assert out.count() == 0
    assert out.schema().names == [
        "decile", "n_keys", "cents", "cum_cents", "share_micro"
    ]


def test_cube_counts_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.relational import cube_counts

    t = pa.table(
        {
            "k1": pa.array(["a", "a", "b"], pa.string()),
            "k2": pa.array([1, 2, 1], pa.int64()),
            "v": pa.array([1.5, 2.0, 0.25], pa.float64()),
        }
    )
    out = (
        cube_counts(rd.from_arrow(t).repartition(2), "k1", "k2", "v",
                    "ALL", -1)
        .to_pandas()
        .set_index(["k1", "k2"])
        .sort_index()
    )
    M = 1_000_000
    assert out.loc[("a", 1)].tolist() == [1, int(1.5 * M)]
    assert out.loc[("a", 2)].tolist() == [1, 2 * M]
    assert out.loc[("b", 1)].tolist() == [1, M // 4]
    assert out.loc[("a", -1)].tolist() == [2, int(3.5 * M)]
    assert out.loc[("b", -1)].tolist() == [1, M // 4]
    assert out.loc[("ALL", 1)].tolist() == [2, int(1.75 * M)]
    assert out.loc[("ALL", 2)].tolist() == [1, 2 * M]
    assert out.loc[("ALL", -1)].tolist() == [3, int(3.75 * M)]
    assert len(out) == 8


def test_cube_counts_empty(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.relational import cube_counts

    t = pa.table(
        {
            "k1": pa.array([], pa.string()),
            "k2": pa.array([], pa.int64()),
            "v": pa.array([], pa.float64()),
        }
    )
    out = cube_counts(rd.from_arrow(t), "k1", "k2", "v", "ALL", -1)
    rows = out.take_all()
    assert len(rows) == 1
    assert rows[0]["k1"] == "ALL" and rows[0]["k2"] == -1
    assert rows[0]["n"] == 0 and rows[0]["sum_micro"] is None


def test_top_unshipped_orders_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.relational import top_unshipped_orders

    D = 1_000_000  # cutoff us
    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], pa.int64()),
            "c_mktsegment": pa.array(["BUILDING", "AUTO", "BUILDING"],
                                     pa.string()),
        }
    )
    orders = pa.table(
        {
            # o1: BUILDING, before cutoff -> eligible
            # o2: AUTO segment -> excluded
            # o3: BUILDING but ordered AT cutoff (not <) -> excluded
            # o4: BUILDING, before cutoff, but all lineitems shipped -> drops
            "o_orderkey": pa.array([10, 20, 30, 40], pa.int64()),
            "o_custkey": pa.array([1, 2, 3, 1], pa.int64()),
            "o_orderdate": pa.array([D - 10, D - 10, D, D - 5],
                                    pa.timestamp("us")),
            "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "3-MED",
                                         "4-LOW"], pa.string()),
        }
    )
    li = pa.table(
        {
            "l_orderkey": pa.array([10, 10, 20, 30, 40], pa.int64()),
            "l_extendedprice": pa.array([100.0, 50.0, 70.0, 80.0, 60.0],
                                        pa.float64()),
            "l_discount": pa.array([0.1, 0.0, 0.0, 0.0, 0.0], pa.float64()),
            # order 40's only lineitem shipped BEFORE the cutoff
            "l_shipdate": pa.array([D + 1, D + 2, D + 3, D + 4, D - 1],
                                   pa.timestamp("us")),
        }
    )
    out = top_unshipped_orders(
        rd.from_arrow(cust), rd.from_arrow(orders).repartition(2),
        rd.from_arrow(li).repartition(2), "BUILDING", D, k=10,
    ).to_pandas()
    assert list(out["o_orderkey"]) == [10]
    # 100*0.9*1e6 + 50*1e6 = 140_000_000
    assert int(out["revenue_micro"][0]) == 140_000_000
    assert out["o_orderpriority"][0] == "1-URGENT"


# ---------------- skyline_2d ----------------


def _sky(rows, **kw):
    from eschergraph_ray.functions.relational import skyline_2d

    tbl = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "price": pa.array([r[1] for r in rows], pa.float64()),
            "size": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = skyline_2d(
        rd.from_arrow(tbl), "id", "price", "size", **kw
    ).to_pandas()
    return list(zip(out["id"], out["price_cents"], out["size"]))


def test_skyline_hand_computed():
    # (2.0, 10) dominates (3.0, 10) and (2.5, 5); duplicates of a
    # frontier point both survive; (1.0, 3) survives (cheapest)
    rows = [
        (1, 2.0, 10),
        (2, 3.0, 10),   # dominated: same size, dearer
        (3, 2.5, 5),    # dominated by id 1 on both
        (4, 2.0, 10),   # duplicate frontier point -> survives
        (5, 1.0, 3),    # cheapest -> frontier
        (6, 1.0, 2),    # dominated by 5: same price, smaller
    ]
    got = _sky(rows)
    assert got == [(5, 100, 3), (1, 200, 10), (4, 200, 10)]


def test_skyline_multiblock_matches_single():
    # force many blocks so pass-1 local frontiers + pass-2 reduce run
    import random

    rng = random.Random(7)
    rows = [(i, rng.uniform(1, 9), rng.randrange(1, 50))
            for i in range(500)]
    from eschergraph_ray.functions.relational import skyline_2d

    tbl = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "price": pa.array([r[1] for r in rows], pa.float64()),
            "size": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    one = skyline_2d(rd.from_arrow(tbl), "id", "price", "size").to_pandas()
    many = skyline_2d(
        rd.from_arrow(tbl).repartition(17), "id", "price", "size"
    ).to_pandas()
    pd.testing.assert_frame_equal(one, many)
    # brute-force dominance check
    pts = {r[0]: (round(r[1] * 100), r[2]) for r in rows}
    def dominated(i):
        pi, si = pts[i]
        return any(
            (pj <= pi and sj >= si and (pj < pi or sj > si))
            for j, (pj, sj) in pts.items() if j != i
        )
    want = sorted(
        [i for i in pts if not dominated(i)],
        key=lambda i: (pts[i][0], -pts[i][1], i),
    )
    assert list(one["id"]) == want


def test_skyline_empty_and_guard():
    import pytest

    from eschergraph_ray.functions.relational import skyline_2d

    empty = skyline_2d(
        rd.from_arrow(
            pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "price": pa.array([], pa.float64()),
                    "size": pa.array([], pa.int64()),
                }
            )
        ),
        "id", "price", "size",
    )
    # empty datasets are checked via schema/count, never to_pandas
    assert empty.count() == 0
    assert set(empty.schema().names) == {"id", "price_cents", "size"}
    # a strictly anti-chained input (dearer is always bigger) IS its
    # own frontier -> the candidate guard trips loudly
    rows = [(i, float(i), i) for i in range(50)]
    with pytest.raises(ValueError, match="max_candidates"):
        _sky(rows, max_candidates=10)


# ---------------- order_count_distribution ----------------


def _ocd(customers, orders, exclude="X"):
    from eschergraph_ray.functions.relational import (
        order_count_distribution,
    )

    c = pa.table({"c_custkey": pa.array(customers, pa.int64())})
    o = pa.table(
        {
            "o_custkey": pa.array([x[0] for x in orders], pa.int64()),
            "o_orderpriority": pa.array(
                [x[1] for x in orders], pa.string()
            ),
        }
    )
    out = order_count_distribution(
        rd.from_arrow(c), rd.from_arrow(o), exclude_priority=exclude
    ).to_pandas()
    return list(zip(out["c_count"], out["custdist"]))


def test_order_count_distribution_hand():
    customers = [1, 2, 3, 4, 5]
    orders = [
        (1, "A"), (1, "A"), (2, "A"),
        (3, "X"), (3, "X"),          # all excluded -> zero bucket
        (4, "A"), (4, "X"),          # one qualifying
    ]
    got = _ocd(customers, orders)
    # counts: c1=2, c2=1, c4=1 -> dist {2:1, 1:2}; zero bucket = 2;
    # order is (custdist desc, c_count desc)
    assert got == [(1, 2), (0, 2), (2, 1)]


def test_order_count_distribution_no_zero_bucket():
    got = _ocd([1, 2], [(1, "A"), (2, "A")])
    assert got == [(1, 2)]
    assert all(c != 0 for c, _ in got)
