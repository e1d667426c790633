"""Sweep-line concurrency, Theil-Sen trend, and cohort LTV
(functions/windows.max_concurrent_sessions, stats.theilsen_trend,
relational.cohort_ltv) — hand-computed semantics plus sf0.001 DuckDB
oracle replays."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from eschergraph_ray.functions.relational import cohort_ltv
from eschergraph_ray.functions.stats import theilsen_trend
from eschergraph_ray.functions.windows import max_concurrent_sessions

SF = "/root/testdata/sf0.001"
MIN = 60_000_000
HOUR = 3_600_000_000
DAY = 86_400_000_000


def _ev(rows):
    """events-ish table from (event_id, user_id, type, ts_us)."""
    ei, ui, ty, ts = zip(*rows)
    return rd.from_arrow(pa.table({
        "event_id": pa.array(ei, pa.int64()),
        "user_id": pa.array(ui, pa.int64()),
        "event_type": pa.array(ty, pa.string()),
        "ts": pa.array(np.array(ts, "datetime64[us]")),
    }))


# ---------------------------------------------------------------- sweep-line

def test_max_concurrent_overlapping_sessions():
    # user 1: one session [0, 10min]; user 2: [5min, 5min] (single
    # event); user 3: [40h, 40h] on a later day.
    ev = _ev([
        (1, 1, "a", 0),
        (2, 1, "a", 10 * MIN),
        (3, 2, "a", 5 * MIN),
        (4, 3, "a", 40 * HOUR),
    ])
    out = max_concurrent_sessions(ev, "user_id", "ts", "event_id")
    assert list(out["day_idx"]) == [0, 1]
    # day 0: sessions 1 and 2 overlap at t=5min -> 2
    assert list(out["max_concurrent"]) == [2, 1]


def test_max_concurrent_gap_splits_sessions():
    # same user, 31-minute gap: two sessions, never concurrent
    ev = _ev([
        (1, 1, "a", 0),
        (2, 1, "a", 31 * MIN),
    ])
    out = max_concurrent_sessions(ev, "user_id", "ts", "event_id")
    assert list(out["max_concurrent"]) == [1]


def test_max_concurrent_carryover_offset_across_days():
    # user 1's session spans the day boundary: [23h, 25h]. user 2
    # has a one-event session at 24h30m (day 1). Day 1's max must
    # include the CARRIED session from day 0 (offset device).
    ev = _ev([
        (1, 1, "a", 23 * HOUR),
        (2, 1, "a", 23 * HOUR + 25 * MIN),
        (3, 1, "a", 23 * HOUR + 50 * MIN),
        (4, 1, "a", 24 * HOUR + 15 * MIN),
        (5, 1, "a", 24 * HOUR + 40 * MIN),
        (6, 1, "a", 25 * HOUR),
        (7, 2, "a", 24 * HOUR + 30 * MIN),
    ])
    out = max_concurrent_sessions(ev, "user_id", "ts", "event_id")
    d = dict(zip(out["day_idx"], out["max_concurrent"]))
    assert d[0] == 1
    assert d[1] == 2  # carried session + user 2's


def test_max_concurrent_sf0001_oracle():
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    out = max_concurrent_sessions(ev, "user_id", "ts", "event_id")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    o = con.execute("""
        WITH e AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM events WINDOW w AS (PARTITION BY user_id
                                   ORDER BY ts, event_id)
        ),
        s AS (SELECT user_id, ts,
                     sum(is_new) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM e),
        sess AS (SELECT user_id, sid, epoch_us(min(ts)) AS st,
                        epoch_us(max(ts)) AS en
                 FROM s GROUP BY 1, 2),
        b AS (SELECT st AS t, 1 AS d FROM sess
              UNION ALL SELECT en + 1, -1 FROM sess),
        g AS (SELECT t, sum(d) AS dd FROM b GROUP BY t),
        r AS (SELECT t, sum(dd) OVER (ORDER BY t
                                      ROWS UNBOUNDED PRECEDING) AS conc
              FROM g)
        SELECT CAST(t // 86400000000 AS BIGINT) AS day_idx,
               CAST(max(conc) AS BIGINT) AS max_concurrent
        FROM r GROUP BY 1 ORDER BY 1
    """).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), o, check_dtype=False
    )


def test_max_concurrent_rejects_negative_ts():
    ev = _ev([(1, 1, "a", 0)])
    neg = ev.map_batches(
        lambda b: pa.table({
            "event_id": b["event_id"],
            "user_id": b["user_id"],
            "ts": pa.array(np.array([-DAY], "datetime64[us]")),
        }),
        batch_format="pyarrow",
    )
    with pytest.raises(Exception, match="non-negative"):
        max_concurrent_sessions(neg, "user_id", "ts", "event_id")


# ----------------------------------------------------------------- Theil-Sen

def test_theilsen_exact_line():
    # counts 2, 4, 6 at hours 0, 1, 2: every pair slope = 2/hr
    rows = []
    eid = 0
    for h, n in [(0, 2), (1, 4), (2, 6)]:
        for _ in range(n):
            rows.append((eid, 1, "a", h * HOUR))
            eid += 1
    out = theilsen_trend(_ev(rows), "ts", "event_type").to_pandas()
    assert out.loc[0, "n_hours"] == 3
    assert out.loc[0, "n_pairs"] == 3
    assert out.loc[0, "slope_micro"] == 2_000_000


def test_theilsen_outlier_resistant():
    # counts 1,2,3,4,100 at hours 0..4: OLS would chase the spike;
    # the pair-slope median stays near 1/hr. n=10 pairs sorted ->
    # median = 5th smallest. Slopes: 1,1,1,1 (consecutive non-spike),
    # 1,1,1 (skip-1), plus spike slopes 96,49,32.33,24.
    rows = []
    eid = 0
    for h, n in [(0, 1), (1, 2), (2, 3), (3, 4), (4, 100)]:
        for _ in range(n):
            rows.append((eid, 1, "a", h * HOUR))
            eid += 1
    out = theilsen_trend(_ev(rows), "ts", "event_type").to_pandas()
    assert out.loc[0, "slope_micro"] == 1_000_000


def test_theilsen_single_hour_type_dropped():
    rows = [(1, 1, "solo", 0), (2, 1, "duo", 0), (3, 1, "duo", HOUR)]
    out = theilsen_trend(_ev(rows), "ts", "event_type").to_pandas()
    assert list(out["event_type"]) == ["duo"]


def test_theilsen_max_hours_guard():
    rows = [(i, 1, "a", i * HOUR) for i in range(5)]
    with pytest.raises(ValueError, match="max_hours"):
        theilsen_trend(_ev(rows), "ts", "event_type",
                       max_hours=3).to_pandas()


def test_theilsen_sf0001_oracle():
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    out = theilsen_trend(ev, "ts", "event_type").to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    o = con.execute("""
        WITH h AS (
          SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                 count(*) AS c
          FROM events GROUP BY 1, 2
        ),
        p AS (
          SELECT a.event_type,
                 CAST(round(1e6 * ((b.c - a.c) / (b.hr - a.hr)), 0)
                      AS BIGINT) AS sm
          FROM h a JOIN h b
            ON a.event_type = b.event_type AND b.hr > a.hr
        ),
        nh AS (SELECT event_type, count(*) AS n_hours FROM h GROUP BY 1)
        SELECT p.event_type, CAST(nh.n_hours AS BIGINT) AS n_hours,
               count(*) AS n_pairs,
               CAST(quantile_disc(p.sm, 0.5) AS BIGINT) AS slope_micro
        FROM p JOIN nh ON p.event_type = nh.event_type
        GROUP BY 1, 2 ORDER BY 1
    """).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), o, check_dtype=False
    )


# ---------------------------------------------------------------- cohort LTV

def _orders(rows):
    """orders-ish table from (custkey, date_str, price)."""
    ck, dt, pr = zip(*rows)
    return rd.from_arrow(pa.table({
        "o_custkey": pa.array(ck, pa.int64()),
        "o_orderdate": pa.array(np.array(dt, "datetime64[us]")),
        "o_totalprice": pa.array([float(x) for x in pr], pa.float64()),
    }))


def test_cohort_ltv_ages_and_sums():
    orders = _orders([
        (1, "2024-01-15", 10.0),   # cohort 2024-01, age 0
        (1, "2024-03-02", 20.0),   # age 2
        (2, "2024-03-20", 5.5),    # cohort 2024-03, age 0
        (2, "2024-03-25", 4.5),    # age 0 (same month)
    ])
    out = cohort_ltv(orders, "o_custkey", "o_orderdate",
                     "o_totalprice").to_pandas()
    rows = {(r.cohort_month, r.age_months): (r.n_orders, r.revenue_micro)
            for r in out.itertuples()}
    assert rows[("2024-01", 0)] == (1, 10_000_000)
    assert rows[("2024-01", 2)] == (1, 20_000_000)
    assert rows[("2024-03", 0)] == (2, 10_000_000)


def test_cohort_ltv_sf0001_oracle():
    orders = rd.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    )
    out = cohort_ltv(orders, "o_custkey", "o_orderdate",
                     "o_totalprice").to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{SF}/orders.parquet')")
    o = con.execute("""
        WITH f AS (
          SELECT o_custkey,
                 min(strftime(o_orderdate, '%Y-%m')) AS cohort_month
          FROM orders GROUP BY 1
        ),
        o AS (
          SELECT f.cohort_month,
                 (CAST(substr(strftime(o.o_orderdate, '%Y-%m'), 1, 4)
                       AS BIGINT) * 12
                  + CAST(substr(strftime(o.o_orderdate, '%Y-%m'), 6, 2)
                         AS BIGINT))
               - (CAST(substr(f.cohort_month, 1, 4) AS BIGINT) * 12
                  + CAST(substr(f.cohort_month, 6, 2) AS BIGINT))
                   AS age_months,
                 CAST(round(o.o_totalprice * 1e6, 0) AS BIGINT) AS v
          FROM orders o JOIN f ON o.o_custkey = f.o_custkey
        )
        SELECT cohort_month, age_months, count(*) AS n_orders,
               CAST(sum(v) AS BIGINT) AS revenue_micro
        FROM o GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), o, check_dtype=False
    )


# ----------------------------------------------------------------------- ACF

def test_acf_hand_case():
    from eschergraph_ray.functions.stats import acf_by_group

    # one event at hour 0, two at hour 1, three at hour 2:
    # x=[1,2,3], dev=[-3,0,3], den=18; lag1 num=0, lag2 num=-9
    rows = []
    eid = 0
    for h, n in [(0, 1), (1, 2), (2, 3)]:
        for _ in range(n):
            rows.append((eid, 1, "a", h * HOUR))
            eid += 1
    out = acf_by_group(_ev(rows), "ts", "event_type").to_pandas()
    got = dict(zip(out["lag"], out["acf_micro"]))
    assert got == {1: 0, 2: -500_000}


def test_acf_zero_fills_gaps():
    from eschergraph_ray.functions.stats import acf_by_group

    # events at hours 0 and 2 only: the dense grid is [1, 0, 1]
    rows = [(1, 1, "a", 0), (2, 1, "a", 2 * HOUR)]
    out = acf_by_group(_ev(rows), "ts", "event_type").to_pandas()
    got = dict(zip(out["lag"], out["acf_micro"]))
    # dev=[1,-2,1], den=6; lag1 num=-4 -> -666667; lag2 num=1 -> 166667
    assert got == {1: -666_667, 2: 166_667}


def test_acf_constant_series_dropped():
    from eschergraph_ray.functions.stats import acf_by_group

    rows = [(1, 1, "a", 0), (2, 1, "a", HOUR)]  # x=[1,1]: den=0
    out = acf_by_group(_ev(rows), "ts", "event_type").to_pandas()
    assert len(out) == 0


def test_acf_sf0001_oracle():
    from eschergraph_ray.functions.stats import acf_by_group

    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["ts", "event_type"])
    out = acf_by_group(ev, "ts", "event_type", max_lag=6).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    o = con.execute("""
        WITH h AS (
          SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                 count(*) AS c
          FROM events GROUP BY 1, 2
        ),
        span AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi
                 FROM h GROUP BY 1),
        grid AS (SELECT event_type,
                        unnest(generate_series(lo, hi)) AS hr
                 FROM span),
        x AS (SELECT g.event_type, g.hr, coalesce(h.c, 0) AS c
              FROM grid g LEFT JOIN h
                ON h.event_type = g.event_type AND h.hr = g.hr),
        st AS (SELECT event_type, count(*) AS n, sum(c) AS T
               FROM x GROUP BY 1),
        dv AS (SELECT x.event_type, x.hr,
                      CAST(st.n AS HUGEINT) * x.c - st.T AS dev
               FROM x JOIN st USING (event_type)),
        den AS (SELECT event_type, sum(dev * dev) AS den
                FROM dv GROUP BY 1),
        lags AS (SELECT l FROM generate_series(1, 6) t(l)),
        num AS (SELECT a.event_type, l.l, sum(a.dev * b.dev) AS num
                FROM dv a JOIN lags l ON true
                JOIN dv b ON b.event_type = a.event_type
                         AND b.hr = a.hr + l.l
                GROUP BY 1, 2)
        SELECT n.event_type, CAST(n.l AS BIGINT) AS lag,
               CAST(round(1e6 * (CAST(n.num AS DOUBLE)
                    / CAST(d.den AS DOUBLE)), 0) AS BIGINT) AS acf_micro
        FROM num n JOIN den d USING (event_type)
        WHERE d.den > 0 ORDER BY 1, 2
    """).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), o, check_dtype=False
    )


# ---------------------------------------------------------------- Fano / ABC

def test_fano_hand_case():
    from eschergraph_ray.functions.stats import fano_by_group

    # x=[4,0,2] (gap zero-filled): T=6, S2=20, n=3
    # F = (3*20 - 36) / (3*6) = 24/18 = 1.333333...
    rows = [(i, 1, "a", 0) for i in range(4)] + [
        (10, 1, "a", 2 * HOUR), (11, 1, "a", 2 * HOUR)]
    out = fano_by_group(_ev(rows), "ts", "event_type").to_pandas()
    assert out.loc[0, "n_hours"] == 3
    assert out.loc[0, "fano_micro"] == 1_333_333


def test_fano_constant_regular_series():
    from eschergraph_ray.functions.stats import fano_by_group

    # one event per hour for 4 hours: variance 0 -> F = 0
    rows = [(i, 1, "a", i * HOUR) for i in range(4)]
    out = fano_by_group(_ev(rows), "ts", "event_type").to_pandas()
    assert out.loc[0, "fano_micro"] == 0


def test_abc_hand_case():
    from eschergraph_ray.functions.relational import abc_classes

    # spends: 80, 15, 3, 2 (total 100): cum 80 (A), 95 (B), 98, 100 (C)
    orders = _orders([
        (1, "2024-01-01", 0.80),
        (2, "2024-01-01", 0.15),
        (3, "2024-01-01", 0.03),
        (4, "2024-01-01", 0.02),
    ])
    out = abc_classes(orders, "o_custkey", "o_totalprice").to_pandas()
    rows = {r.abc_class: (r.n_keys, r.cents, r.share_micro)
            for r in out.itertuples()}
    assert rows["A"] == (1, 80, 800_000)
    assert rows["B"] == (1, 15, 150_000)
    assert rows["C"] == (2, 5, 50_000)


def test_abc_boundary_is_inclusive():
    from eschergraph_ray.functions.relational import abc_classes

    # two equal spenders: first cum = 50 <= 80 -> A; second cum = 100
    # -> C (not B: 100 > 95). Tie broken by key asc.
    orders = _orders([
        (2, "2024-01-01", 0.50),
        (1, "2024-01-01", 0.50),
    ])
    out = abc_classes(orders, "o_custkey", "o_totalprice").to_pandas()
    rows = {r.abc_class: r.n_keys for r in out.itertuples()}
    assert rows == {"A": 1, "C": 1}


def test_haar_energy_hand_case():
    from eschergraph_ray.functions.stats import haar_energy

    # x = [1, 2, 3]: l1 pairs (1,2),(3,0): d=[-1,3] e=10, a=[3,3]
    # l2 pair (3,3): d=0 e=0, a=[6]; l3 pair (6,0): d=6 e=36
    rows = []
    eid = 0
    for h, n in [(0, 1), (1, 2), (2, 3)]:
        for _ in range(n):
            rows.append((eid, 1, "a", h * HOUR))
            eid += 1
    out = haar_energy(_ev(rows), "ts", "event_type").to_pandas()
    got = {r.level: (r.n_coeffs, r.energy) for r in out.itertuples()}
    assert got == {1: (2, 10), 2: (1, 0), 3: (1, 36)}


def test_haar_energy_scale_localization():
    from eschergraph_ray.functions.stats import haar_energy

    # strict 2-hour alternation 5,0,5,0,...: ALL detail energy at
    # level 1, none at coarser scales
    rows = []
    eid = 0
    for h in range(0, 8, 2):
        for _ in range(5):
            rows.append((eid, 1, "a", h * HOUR))
            eid += 1
    out = haar_energy(_ev(rows), "ts", "event_type").to_pandas()
    got = {r.level: r.energy for r in out.itertuples()}
    assert got[1] == 4 * 25 and got[2] == 0 and got[3] == 0


def test_control_chart_hand_case():
    from eschergraph_ray.functions.stats import control_chart_by_group

    # 30 calm hours of 1 event + one 50-event spike: only the spike
    # is out of control at 3 sigma
    rows = []
    eid = 0
    for h in range(30):
        rows.append((eid, 1, "a", h * HOUR)); eid += 1
    for _ in range(50):
        rows.append((eid, 1, "a", 30 * HOUR)); eid += 1
    out = control_chart_by_group(_ev(rows), "ts",
                                 "event_type").to_pandas()
    assert out.loc[0, "n_hours"] == 31
    assert out.loc[0, "n_out_of_control"] == 1


def test_control_chart_flat_series_clean():
    from eschergraph_ray.functions.stats import control_chart_by_group

    rows = [(i, 1, "a", i * HOUR) for i in range(10)]
    out = control_chart_by_group(_ev(rows), "ts",
                                 "event_type").to_pandas()
    assert out.loc[0, "n_out_of_control"] == 0


def test_coverage_gaps_hand_case():
    from eschergraph_ray.functions.stats import coverage_gaps_by_group

    # active hours 0, 1, 5, 6: span 7, missing 3, longest gap 3
    rows = [(i, 1, "a", h * HOUR) for i, h in enumerate([0, 1, 5, 6])]
    out = coverage_gaps_by_group(_ev(rows), "ts",
                                 "event_type").to_pandas()
    r = out.iloc[0]
    assert (r["n_hours_span"], r["n_hours_active"],
            r["n_hours_missing"], r["longest_gap"]) == (7, 4, 3, 3)


def test_coverage_gaps_single_hour():
    from eschergraph_ray.functions.stats import coverage_gaps_by_group

    rows = [(1, 1, "a", 0), (2, 1, "a", 1000)]
    out = coverage_gaps_by_group(_ev(rows), "ts",
                                 "event_type").to_pandas()
    r = out.iloc[0]
    assert (r["n_hours_span"], r["longest_gap"]) == (1, 0)


def test_key_skew_hand_case():
    from eschergraph_ray.functions.stats import key_skew_report

    import pyarrow as pa
    import ray.data as rd

    # keys: 1x10 rows (hot), 9 keys x 1 row
    vals = [1] * 10 + list(range(2, 11))
    ds = rd.from_arrow(pa.table({"k": pa.array(vals, pa.int64())}))
    out = key_skew_report(ds, "k")
    r = out.iloc[0]
    assert (r["n_keys"], r["n_rows"], r["max_per_key"]) == (10, 19, 10)
    assert r["p50_per_key"] == 1      # cum >= 5 at count 1
    assert r["p99_per_key"] == 10     # cum >= 9.9 -> needs the hot key
    # top-1 share = round(1e6 * 10/19)
    assert r["top1_share_micro"] == 526_316


def test_key_skew_uniform():
    from eschergraph_ray.functions.stats import key_skew_report

    import pyarrow as pa
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "k": pa.array(list(range(8)) * 3, pa.int64()),
    }))
    out = key_skew_report(ds, "k")
    r = out.iloc[0]
    assert (r["p50_per_key"], r["p99_per_key"],
            r["max_per_key"]) == (3, 3, 3)


def test_grouped_pearson_hand_cases():
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.stats import grouped_pearson

    t = pa.table({
        "g": pa.array(["up"] * 3 + ["down"] * 3 + ["flat"] * 2,
                      pa.string()),
        "x": pa.array([1.0, 2, 3, 1, 2, 3, 1, 2], pa.float64()),
        "y": pa.array([2.0, 4, 6, 6, 4, 2, 5, 5], pa.float64()),
    })
    out = grouped_pearson(rd.from_arrow(t), "g", "x", "y")
    got = dict(zip(out["grp"], out["corr_micro"]))
    assert got["up"] == 1_000_000
    assert got["down"] == -1_000_000
    assert "flat" not in got  # zero y-variance dropped


def test_dim_variance_profile_hand_case():
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.features import dim_variance_profile

    # dim1: [0, 1] -> var 0.25; dim2: [0.5, 0.5] -> var 0
    t = pa.table({
        "embedding": pa.array([[0.0, 0.5], [1.0, 0.5]],
                              pa.list_(pa.float32(), 2)),
    })
    out = dim_variance_profile(rd.from_arrow(t), "embedding")
    got = dict(zip(out["dim"], out["var_micro"]))
    assert got == {1: 250_000, 2: 0}
