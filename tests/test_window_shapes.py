"""Window-function shapes (functions/windows.py additions): integer
EWMA, gaps-and-islands streaks, dense-rank top-k — hand-computed
semantics plus sf0.001 DuckDB oracle replays."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from eschergraph_ray.functions.windows import (
    activity_streaks,
    ewma_by_group,
    topk_dense_by_group,
)

SF = "/root/testdata/sf0.001"
HOUR = 3_600_000_000


def _ev(rows):
    """events-ish table from (event_id, user_id, type, ts_us, value)."""
    ei, ui, ty, ts, v = zip(*rows)
    return rd.from_arrow(pa.table({
        "event_id": pa.array(ei, pa.int64()),
        "user_id": pa.array(ui, pa.int64()),
        "event_type": pa.array(ty, pa.string()),
        "ts": pa.array(np.array(ts, "datetime64[us]")),
        "value": pa.array([float(x) for x in v], pa.float64()),
    }))


def test_ewma_halving_recurrence():
    ev = _ev([
        (1, 1, "a", 0 * HOUR, 100.0),
        (2, 1, "a", 1 * HOUR, 50.0),
        (3, 1, "a", 2 * HOUR, 70.0),
        (4, 1, "b", 0 * HOUR, 9.0),
    ])
    out = ewma_by_group(ev, "event_type", "ts", "value").to_pandas()
    got = {(r.event_type, r.bucket): (r.value_micro, r.ewma_micro)
           for r in out.itertuples()}
    assert got[("a", 0)] == (100_000_000, 100_000_000)
    assert got[("a", 1)] == (50_000_000, 75_000_000)
    assert got[("a", 2)] == (70_000_000, 72_500_000)
    assert got[("b", 0)] == (9_000_000, 9_000_000)


def test_ewma_sums_within_bucket():
    ev = _ev([
        (1, 1, "a", 0, 1.0),
        (2, 1, "a", 1000, 2.0),   # same hour -> summed first
        (3, 1, "a", 1 * HOUR, 1.0),
    ])
    out = ewma_by_group(ev, "event_type", "ts", "value").to_pandas()
    assert list(out.value_micro) == [3_000_000, 1_000_000]
    assert list(out.ewma_micro) == [3_000_000, 2_000_000]


def test_streaks_hand_computed():
    day = 86_400_000_000
    ev = _ev([
        # user 1: days 1,2,3 then 7,8 -> best 3
        (1, 1, "a", 1 * day, 0.0), (2, 1, "a", 2 * day, 0.0),
        (3, 1, "a", 3 * day, 0.0), (4, 1, "a", 7 * day, 0.0),
        (5, 1, "a", 8 * day, 0.0),
        # two events same day count once
        (6, 2, "a", 5 * day, 0.0), (7, 2, "a", 5 * day + 9, 0.0),
        # user 3: days 10,11 -> best 2
        (8, 3, "a", 10 * day, 0.0), (9, 3, "a", 11 * day, 0.0),
    ])
    out = activity_streaks(ev, "user_id", "ts").to_pandas()
    got = dict(zip(out.streak_len, out.n_users))
    assert got == {1: 1, 2: 1, 3: 1}


def test_topk_dense_keeps_ties():
    ev = _ev([
        (1, 1, "a", 0, 5.0), (2, 1, "a", 0, 5.0),   # both rank 1
        (3, 1, "a", 0, 4.0),                        # rank 2
        (4, 1, "a", 0, 3.0), (5, 1, "a", 0, 2.0),   # rank 3, cut
        (6, 1, "b", 0, 1.0),
    ])
    out = topk_dense_by_group(ev, "event_type", "event_id", "value",
                              k=2).to_pandas()
    a = out[out.event_type == "a"]
    assert sorted(a.event_id) == [1, 2, 3]
    assert list(out[out.event_type == "b"].event_id) == [6]


def _con():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF}/events.parquet')"
    )
    return con


def _cmp(got, want):
    g = (got[sorted(got.columns)].sort_values(sorted(got.columns))
         .reset_index(drop=True))
    w = (want[sorted(want.columns)].sort_values(sorted(want.columns))
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_ewma_oracle_sf0001():
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"])
    got = ewma_by_group(ev, "event_type", "ts", "value").to_pandas()
    want = _con().execute("""
        WITH RECURSIVE h AS MATERIALIZED (
          SELECT event_type AS t, epoch_us(ts) // 3600000000 AS bkt,
                 CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT))
                      AS BIGINT) AS bv
          FROM events GROUP BY 1, 2
        ),
        r AS MATERIALIZED (
          SELECT t, bkt, bv,
                 CAST(row_number() OVER (PARTITION BY t ORDER BY bkt)
                      AS INT) AS rn
          FROM h
        ),
        w AS (
          SELECT t, bkt, bv, rn, bv AS s FROM r WHERE rn = 1
          UNION ALL
          SELECT r.t, r.bkt, r.bv, r.rn, (w.s + r.bv) // 2 AS s
          FROM w JOIN r ON r.t = w.t AND r.rn = w.rn + 1
        )
        SELECT t AS event_type, CAST(bkt AS BIGINT) AS bucket,
               bv AS value_micro, CAST(s AS BIGINT) AS ewma_micro
        FROM w
    """).df()
    _cmp(got, want)


def test_streaks_oracle_sf0001():
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"])
    got = activity_streaks(ev, "user_id", "ts").to_pandas()
    want = _con().execute("""
        WITH d AS (
          SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ),
        i AS (
          SELECT user_id, day,
                 day - row_number() OVER (PARTITION BY user_id
                                          ORDER BY day) AS isl
          FROM d
        ),
        runs AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS len
          FROM i GROUP BY user_id, isl
        ),
        best AS (
          SELECT user_id, max(len) AS streak_len FROM runs
          GROUP BY user_id
        )
        SELECT CAST(streak_len AS BIGINT) AS streak_len,
               CAST(count(*) AS BIGINT) AS n_users
        FROM best GROUP BY 1
    """).df()
    _cmp(got, want)


def test_topk_dense_oracle_sf0001():
    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "event_type", "value"])
    got = topk_dense_by_group(ev, "event_type", "event_id", "value",
                              k=3).to_pandas()
    want = _con().execute("""
        WITH q AS (
          SELECT event_type, event_id,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS value_micro,
                 dense_rank() OVER (
                   PARTITION BY event_type
                   ORDER BY CAST(round(value * 1e6, 0) AS BIGINT) DESC
                 ) AS dr
          FROM events
        )
        SELECT event_type, CAST(event_id AS BIGINT) AS event_id,
               value_micro
        FROM q WHERE dr <= 3
    """).df()
    _cmp(got, want)


def test_attribution_hand_computed():
    from eschergraph_ray.functions.windows import last_touch_attribution

    ev = _ev([
        (1, 1, "view", 100, 0.0),
        (2, 1, "purchase", 200, 10.0),     # <- view
        (3, 1, "click", 300, 0.0),
        (4, 1, "purchase", 400, 5.0),      # <- click
        (5, 2, "purchase", 50, 7.0),       # <- none (first touch)
        (6, 2, "purchase", 60, 3.0),       # <- none (prev is purchase)
    ])
    out = last_touch_attribution(
        ev, "user_id", "event_type", "ts", "event_id", "value",
        target_type="purchase",
    ).to_pandas()
    got = {r.source_type: (r.n_purchases, r.purchase_value_micro)
           for r in out.itertuples()}
    assert got == {"view": (1, 10_000_000), "click": (1, 5_000_000),
                   "none": (2, 10_000_000)}


def test_attribution_same_ts_ordered_by_id():
    from eschergraph_ray.functions.windows import last_touch_attribution

    # same timestamp: event_id breaks the tie, so the signup (id 1)
    # precedes the purchase (id 2)
    ev = _ev([
        (2, 1, "purchase", 100, 1.0),
        (1, 1, "signup", 100, 0.0),
    ])
    out = last_touch_attribution(
        ev, "user_id", "event_type", "ts", "event_id", "value",
        target_type="purchase",
    ).to_pandas()
    assert dict(zip(out.source_type, out.n_purchases)) == {"signup": 1}


def test_attribution_oracle_sf0001():
    from eschergraph_ray.functions.windows import last_touch_attribution

    ev = rd.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )
    got = last_touch_attribution(
        ev, "user_id", "event_type", "ts", "event_id", "value",
        target_type="purchase",
    ).to_pandas()
    want = _con().execute("""
        WITH o AS (
          SELECT user_id, event_type,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS vmic,
                 last_value(CASE WHEN event_type <> 'purchase'
                                 THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS src
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        )
        SELECT coalesce(src, 'none') AS source_type,
               CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(sum(vmic) AS BIGINT) AS purchase_value_micro
        FROM o WHERE event_type = 'purchase' GROUP BY 1
    """).df()
    _cmp(got, want)


def test_period_over_period_hand_computed():
    from eschergraph_ray.functions.windows import period_over_period

    month = 31 * 86_400_000_000
    ds = rd.from_arrow(pa.table({
        "ts": pa.array(np.array([0, 10, month, 2 * month],
                                "datetime64[us]")),
        "value": pa.array([1.0, 2.0, 10.0, 4.0], pa.float64()),
    }))
    out = period_over_period(ds, "ts", "value",
                             bucket="month").to_pandas()
    assert list(out.bucket) == ["1970-01", "1970-02", "1970-03"]
    assert list(out.value_micro) == [3_000_000, 10_000_000, 4_000_000]
    assert list(out.prev_micro) == [0, 3_000_000, 10_000_000]
    assert list(out.delta_micro) == [3_000_000, 7_000_000, -6_000_000]


def test_period_over_period_oracle_sf0001():
    from eschergraph_ray.functions.windows import period_over_period

    got = period_over_period(
        rd.read_parquet(f"{SF}/events.parquet",
                        columns=["ts", "value"]),
        "ts", "value", bucket="day",
    ).to_pandas()
    want = _con().execute("""
        WITH m AS (
          SELECT strftime(ts, '%Y-%m-%d') AS bucket,
                 CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT))
                      AS BIGINT) AS value_micro
          FROM events GROUP BY 1
        )
        SELECT bucket, value_micro,
               CAST(coalesce(lag(value_micro) OVER (ORDER BY bucket),
                    0) AS BIGINT) AS prev_micro,
               CAST(value_micro - coalesce(lag(value_micro)
                    OVER (ORDER BY bucket), 0) AS BIGINT)
                 AS delta_micro
        FROM m ORDER BY bucket
    """).df()
    _cmp(got, want)


def test_mutual_nn_hand_computed():
    from eschergraph_ray.functions.graph_metrics import mutual_nn_pairs

    # rank-1 edges: 1->2, 2->1 (mutual); 3->1 (one-way); 4->5, 5->4
    knn = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "neighbor_id": pa.array([2, 1, 1, 5, 4], pa.int64()),
        "cosine": pa.array([0.9, 0.9, 0.5, 0.8, 0.8], pa.float64()),
        "rnk": pa.array([1, 1, 1, 1, 1], pa.int64()),
    }))
    out = mutual_nn_pairs(knn, "vec_id", "neighbor_id",
                          "cosine").to_pandas()
    assert list(zip(out.id_a, out.id_b)) == [(1, 2), (4, 5)]
    assert list(out.cosine) == [0.9, 0.8]


def test_mutual_nn_ignores_lower_ranks():
    from eschergraph_ray.functions.graph_metrics import mutual_nn_pairs

    knn = rd.from_arrow(pa.table({
        "vec_id": pa.array([1, 1, 2], pa.int64()),
        "neighbor_id": pa.array([3, 2, 1], pa.int64()),
        "cosine": pa.array([0.9, 0.8, 0.8], pa.float64()),
        "rnk": pa.array([1, 2, 1], pa.int64()),
    }))
    # 1's rank-1 is 3, so (1,2) is not mutual even though 2->1
    out = mutual_nn_pairs(knn, "vec_id", "neighbor_id",
                          "cosine").to_pandas()
    assert len(out) == 0


def test_value_histogram_hand_computed():
    from eschergraph_ray.functions.stats import value_histogram

    ev = _ev([
        (1, 1, "a", 0, 0.0), (2, 1, "a", 0, 1.0),
        (3, 1, "a", 0, 10.0), (4, 1, "b", 0, 10.0),
    ])
    # micro: 0, 1e6, 1e7, 1e7 -> lo=0, span=1e7+1; nbins=2:
    # bins: 0, 0 (1e6*2//1e7+1=0), 1, 1
    out = value_histogram(ev, "event_type", "value",
                          nbins=2).to_pandas()
    got = {(r.group, r.bin): r.n for r in out.itertuples()}
    assert got == {("a", 0): 2, ("a", 1): 1, ("b", 1): 1}


def test_value_histogram_max_stays_in_last_bin():
    from eschergraph_ray.functions.stats import value_histogram

    ev = _ev([(1, 1, "a", 0, 5.0), (2, 1, "a", 0, 7.0)])
    out = value_histogram(ev, "event_type", "value",
                          nbins=4).to_pandas()
    assert out.bin.max() == 3  # never nbins


def test_json_int_stats_hand_computed():
    from eschergraph_ray.functions.stats import json_int_stats

    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["a", "a", "b", "b"], pa.string()),
        "props": pa.array(['{"k": 3}', '{"k": -1}', '{"k": 10}',
                           '{"other": 9}'], pa.string()),
    }))
    out = json_int_stats(ds, "event_type", "props", key="k").to_pandas()
    got = {r.group: (r.n, r.sum_v, r.min_v, r.max_v)
           for r in out.itertuples()}
    assert got == {"a": (2, 2, -1, 3), "b": (1, 10, 10, 10)}


def test_bounce_rate_hand_computed():
    from eschergraph_ray.functions.windows import session_bounce_rate

    m30 = 1_800_000_000
    ev = _ev([
        # user 1: view then click within gap (one 2-event session)
        (1, 1, "view", 0, 0.0), (2, 1, "click", m30, 0.0),
        # then a lone purchase after the gap (bounce)
        (3, 1, "purchase", 3 * m30 + 1, 0.0),
        # user 2: single view (bounce)
        (4, 2, "view", 0, 0.0),
    ])
    out = session_bounce_rate(ev, "user_id", "event_type", "ts",
                              "event_id").to_pandas()
    got = {r.entry_type: (r.n_sessions, r.n_bounces)
           for r in out.itertuples()}
    assert got == {"view": (2, 1), "purchase": (1, 1)}


def test_bounce_rate_oracle_sf0001():
    from eschergraph_ray.functions.windows import session_bounce_rate

    ev = rd.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts"],
    )
    got = session_bounce_rate(ev, "user_id", "event_type", "ts",
                              "event_id").to_pandas()
    want = _con().execute("""
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS t, event_id,
                 CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                        OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                           > 1800000000
                      THEN 1 ELSE 0 END AS new_s
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
          WINDOW w AS (PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id)
        ),
        s AS (
          SELECT *, sum(new_s) OVER (PARTITION BY user_id
                                     ORDER BY t, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
          FROM e
        ),
        per AS (
          SELECT DISTINCT user_id, sid,
                 first_value(event_type) OVER (
                   PARTITION BY user_id, sid ORDER BY t, event_id
                 ) AS entry_type,
                 count(*) OVER (PARTITION BY user_id, sid) AS n
          FROM s
        )
        SELECT entry_type,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bounces
        FROM per GROUP BY 1
    """).df()
    _cmp(got, want)


def test_value_histogram_oracle_sf0001():
    from eschergraph_ray.functions.stats import value_histogram

    ev = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    got = value_histogram(ev, "event_type", "value",
                          nbins=10).to_pandas()
    want = _con().execute("""
        WITH q AS (
          SELECT event_type,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS v
          FROM events
        ),
        mm AS (SELECT min(v) AS lo, max(v) - min(v) + 1 AS span FROM q)
        SELECT q.event_type AS "group",
               CAST((q.v - mm.lo) * 10 // mm.span AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n
        FROM q, mm GROUP BY 1, 2
    """).df()
    _cmp(got, want)


def test_day_over_day_hand_computed():
    from eschergraph_ray.functions.stats import day_over_day_users

    day = 86_400_000_000
    ev = _ev([
        (1, 1, "a", 5 * day, 0.0), (2, 2, "a", 5 * day, 0.0),
        (3, 1, "a", 6 * day, 0.0), (4, 3, "a", 6 * day, 0.0),
        (5, 9, "a", 7 * day, 0.0),  # other day ignored
    ])
    out = day_over_day_users(ev, "user_id", "ts",
                             day_a=5, day_b=6).to_pandas()
    r = out.iloc[0]
    assert (r.n_day_a, r.n_day_b, r.n_retained, r.n_new,
            r.n_churned) == (2, 2, 1, 1, 1)


def test_mode_ties_to_smallest():
    from eschergraph_ray.functions.stats import mode_by_group

    ev = _ev([
        (1, 1, "a", 0, 2.0), (2, 1, "a", 0, 2.0),
        (3, 1, "a", 0, 1.0), (4, 1, "a", 0, 1.0),
        (5, 1, "a", 0, 9.0),
    ])
    out = mode_by_group(ev, "event_type", "value").to_pandas()
    # 1.0 and 2.0 both appear twice; tie -> smallest value
    assert list(out["group"]) == ["a"]
    assert list(out.mode_micro) == [1_000_000]
    assert list(out.n_mode) == [2]


def test_exact_ndv_hand_computed():
    from eschergraph_ray.functions.stats import exact_group_ndv

    ev = _ev([
        (1, 1, "a", 0, 0.0), (2, 1, "a", 0, 0.0),
        (3, 2, "a", 0, 0.0), (4, 1, "b", 0, 0.0),
    ])
    out = exact_group_ndv(ev, "event_type", "user_id").to_pandas()
    assert dict(zip(out["group"], out.n_distinct)) == {"a": 2, "b": 1}


def test_latest_per_key_hand_computed():
    from eschergraph_ray.functions.windows import latest_per_key

    ev = _ev([
        (1, 1, "view", 100, 1.0),
        (2, 1, "click", 200, 2.0),       # user 1 latest
        (3, 2, "purchase", 50, 3.0),
        (5, 2, "view", 50, 4.0),         # same ts: higher id wins
    ])
    out = latest_per_key(ev, "user_id", "ts", "event_id",
                         "event_type", "value").to_pandas()
    got = {r.k: (r.event_id, r.event_type, r.value_micro)
           for r in out.itertuples()}
    assert got == {1: (2, "click", 2_000_000),
                   2: (5, "view", 4_000_000)}


def test_latest_per_key_oracle_sf0001():
    from eschergraph_ray.functions.windows import latest_per_key

    ev = rd.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts", "value"],
    )
    got = latest_per_key(ev, "user_id", "ts", "event_id",
                         "event_type", "value").to_pandas()
    want = _con().execute("""
        WITH r AS (
          SELECT user_id AS k, epoch_us(ts) AS ts_us, event_id,
                 event_type,
                 CAST(round(value * 1e6, 0) AS BIGINT) AS value_micro,
                 row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(ts) DESC, event_id DESC
                 ) AS rn
          FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        )
        SELECT CAST(k AS BIGINT) AS k, CAST(ts_us AS BIGINT) AS ts_us,
               CAST(event_id AS BIGINT) AS event_id, event_type,
               value_micro
        FROM r WHERE rn = 1
    """).df()
    _cmp(got, want)


def test_markov_stationary_hand_case(ray_session):
    from eschergraph_ray.functions.windows import markov_stationary

    # user 1: a->b, b->a, a->b  (c: a->b 2, b->a 1); user 2: b->b
    # r: a=2, b=2
    HOUR = 3_600_000_000
    ev = _ev([
        (1, 1, "a", 0, 0.0),
        (2, 1, "b", 1 * HOUR, 0.0),
        (3, 1, "a", 2 * HOUR, 0.0),
        (4, 1, "b", 3 * HOUR, 0.0),
        (5, 2, "b", 0, 0.0),
        (6, 2, "b", 1 * HOUR, 0.0),
    ])
    out = markov_stationary(ev, "user_id", "ts", "event_id",
                            "event_type", iters=1)
    got = dict(zip(out["event_type"], out["p_micro"]))
    # p1(a) = (1e6 * 1) // 2 = 500000 (from b)
    # p1(b) = (1e6 * 2) // 2 + (1e6 * 1) // 2 = 1500000
    assert got == {"a": 500_000, "b": 1_500_000}


def test_markov_stationary_sink_type(ray_session):
    from eschergraph_ray.functions.windows import markov_stationary

    # c only ever receives: it accumulates, a's mass drains
    ev = _ev([
        (1, 1, "a", 0, 0.0),
        (2, 1, "c", 3_600_000_000, 0.0),
    ])
    out = markov_stationary(ev, "user_id", "ts", "event_id",
                            "event_type", iters=2)
    got = dict(zip(out["event_type"], out["p_micro"]))
    # round 1: a->c moves 1e6; c has no outgoing row -> round 2 all 0
    assert got == {"a": 0, "c": 0}
    out1 = markov_stationary(ev, "user_id", "ts", "event_id",
                             "event_type", iters=1)
    got1 = dict(zip(out1["event_type"], out1["p_micro"]))
    assert got1 == {"a": 0, "c": 1_000_000}


def test_zorder_interleave_hand_values(ray_session):
    from eschergraph_ray.functions.features import zorder_key

    # hr=1 (bit0 even pos -> 1), cents=1 (bit0 odd pos -> 2):
    # morton(1,1) = 3; morton(0,1)=2; morton(1,0)=1; morton(0,0)=0
    HOUR = 3_600_000_000
    ev = _ev([
        (1, 1, "t", 0, 0.00),
        (2, 1, "t", HOUR, 0.00),
        (3, 1, "t", 0, 0.01),
        (4, 1, "t", HOUR, 0.01),
    ])
    out = zorder_key(ev, "ts", "value", "event_id", k=4).to_pandas()
    got = dict(zip(out["event_id"], out["morton"]))
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}
    # layout order is morton, not (hr, v) or (v, hr)
    assert list(out["event_id"]) == [1, 2, 3, 4]


def test_zorder_negative_values_and_k(ray_session):
    from eschergraph_ray.functions.features import zorder_key

    ev = _ev([(i, 1, "t", 0, float(i) - 2.0) for i in range(5)])
    out = zorder_key(ev, "ts", "value", "event_id", k=3).to_pandas()
    assert len(out) == 3
    # negative cents mask to HIGH low-16 bit patterns (two's
    # complement), so non-negative values sort first
    assert (out["v_cents"] >= 0).all()


def test_time_to_convert_hand_case(ray_session):
    from eschergraph_ray.functions.windows import time_to_convert

    MIN = 60_000_000
    # user 1: view@0, purchase@5min -> 5min
    # user 2: purchase@0 (BEFORE view@10min), never after -> -1
    # user 3: view only -> -1; user 4: purchase only -> not counted
    ev = _ev([
        (1, 1, "view", 0, 0.0),
        (2, 1, "purchase", 5 * MIN, 0.0),
        (3, 2, "purchase", 0, 0.0),
        (4, 2, "view", 10 * MIN, 0.0),
        (5, 3, "view", 0, 0.0),
        (6, 4, "purchase", 0, 0.0),
    ])
    out = time_to_convert(ev, "user_id", "ts", "event_type",
                          "view", "purchase").to_pandas()
    r = out.iloc[0]
    assert r["n_with_first_step"] == 3
    assert r["n_converted"] == 1
    assert r["median_delta_us"] == 5 * MIN
    assert r["p90_delta_us"] == 5 * MIN


def test_time_to_convert_same_ts_counts(ray_session):
    from eschergraph_ray.functions.windows import time_to_convert

    ev = _ev([
        (1, 1, "view", 1000, 0.0),
        (2, 1, "purchase", 1000, 0.0),
    ])
    out = time_to_convert(ev, "user_id", "ts", "event_type",
                          "view", "purchase").to_pandas()
    assert out.iloc[0]["n_converted"] == 1
    assert out.iloc[0]["median_delta_us"] == 0


def test_time_to_convert_quantile_matches_duckdb_index(ray_session):
    import duckdb

    from eschergraph_ray.functions.windows import time_to_convert

    # 5 converting users, deltas 1..5 minutes: DuckDB quantile_disc
    # is the discrete inverse CDF (ceil(q*n) - 1): median idx 2 ->
    # 3min, p90 idx ceil(4.5)-1 = 4 -> 5min
    MIN = 60_000_000
    rows = []
    eid = 0
    for u in range(1, 6):
        rows.append((eid, u, "view", 0, 0.0)); eid += 1
        rows.append((eid, u, "purchase", u * MIN, 0.0)); eid += 1
    out = time_to_convert(_ev(rows), "user_id", "ts", "event_type",
                          "view", "purchase").to_pandas()
    assert out.iloc[0]["median_delta_us"] == 3 * MIN
    assert out.iloc[0]["p90_delta_us"] == 5 * MIN
    dd = duckdb.sql(
        "SELECT quantile_disc(x, 0.9) FROM (SELECT unnest([1,2,3,4,5]) x)"
    ).fetchone()[0]
    assert dd == 5  # pin the engine behavior the index replicates


def test_dau_mau_stickiness_hand_case(ray_session):
    from eschergraph_ray.functions.windows import dau_mau_stickiness

    DAY = 86_400_000_000
    # day 0: users 1,2; day 1: user 1; day 40: user 3 (fresh window)
    ev = _ev([
        (1, 1, "t", 0, 0.0),
        (2, 2, "t", 0, 0.0),
        (3, 1, "t", DAY, 0.0),
        (4, 3, "t", 40 * DAY, 0.0),
    ])
    out = dau_mau_stickiness(ev, "user_id", "ts", window_days=30)
    got = {r.day_idx: (r.dau, r.mau, r.stickiness_micro)
           for r in out.itertuples()}
    assert got[0] == (2, 2, 1_000_000)
    assert got[1] == (1, 2, 500_000)   # trailing window carries day 0
    assert got[40] == (1, 1, 1_000_000)


def test_dau_mau_user_counts_once_per_window(ray_session):
    from eschergraph_ray.functions.windows import dau_mau_stickiness

    DAY = 86_400_000_000
    # same user active on days 0 and 1: MAU at day 1 must be 1, not 2
    ev = _ev([
        (1, 1, "t", 0, 0.0),
        (2, 1, "t", DAY, 0.0),
    ])
    out = dau_mau_stickiness(ev, "user_id", "ts", window_days=30)
    got = {r.day_idx: r.mau for r in out.itertuples()}
    assert got == {0: 1, 1: 1}


def test_markov_entropy_rate_hand_case(ray_session):
    from eschergraph_ray.functions.windows import markov_entropy_rate

    # u1: A,A,B -> (A,A),(A,B); u2: A,A -> (A,A)
    # c: (A,A)=2, (A,B)=1; r[A]=3
    # q(A,A)=round(ln(2/3)*1e6)=-405465; q(A,B)=-1098612
    # pi after 3 iters: A=296296, B=148148
    # total = (296296*2*405465)//3 + (296296*1*1098612)//3
    #       = 80091771760 + 108504780384 = 188596552144 -> //1e6
    ev = _ev([
        (1, 1, "A", 0, 0.0),
        (2, 1, "A", 1 * HOUR, 0.0),
        (3, 1, "B", 2 * HOUR, 0.0),
        (4, 2, "A", 0, 0.0),
        (5, 2, "A", 1 * HOUR, 0.0),
    ])
    out = markov_entropy_rate(ev, "user_id", "ts", "event_id",
                              "event_type", iters=3).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["n_types"], r["n_transitions"]) == (2, 3)
    assert r["entropy_rate_micro"] == 188_596


def test_markov_entropy_rate_deterministic_chain_is_zero(ray_session):
    from eschergraph_ray.functions.windows import markov_entropy_rate

    ev = _ev([
        (1, 1, "A", 0, 0.0),
        (2, 1, "B", 1 * HOUR, 0.0),
        (3, 1, "A", 2 * HOUR, 0.0),
        (4, 1, "B", 3 * HOUR, 0.0),
    ])
    out = markov_entropy_rate(ev, "user_id", "ts", "event_id",
                              "event_type").to_pandas()
    assert out.iloc[0]["entropy_rate_micro"] == 0


def test_grouped_ols_hand_case(ray_session):
    from eschergraph_ray.functions.stats import grouped_ols

    ds = rd.from_arrow(pa.table({
        "g": ["a", "a", "a", "b", "c", "c"],
        "x": pa.array([0.0, 1.0, 2.0, 5.0, 1.0, 1.0], pa.float64()),
        "y": pa.array([1.0, 3.0, 5.0, 9.0, 2.0, 4.0], pa.float64()),
    }))
    out = grouped_ols(ds, "g", "x", "y")
    # a: perfect line y=2x+1; b: n=1 dropped; c: zero x-var dropped
    assert list(out["grp"]) == ["a"]
    assert list(out["slope_micro"]) == [2_000_000]
    assert list(out["intercept_micro"]) == [1_000_000]


def test_winsorized_mean_hand_case(ray_session):
    from eschergraph_ray.functions.stats import winsorized_mean_by_group

    ds = rd.from_arrow(pa.table({
        "g": ["a"] * 4,
        "v": pa.array([0.01, 0.02, 0.03, 1.00], pa.float64()),
    }))
    out = winsorized_mean_by_group(ds, "g", "v", p_lo=25,
                                   p_hi=75).to_pandas()
    r = out.iloc[0]
    # cents [1,2,3,100]: lo=p25=1, hi=p75=3; clamped total 9 -> 2.25
    # rounds half-inf to 2
    assert (r["n"], r["lo_cents"], r["hi_cents"],
            r["wmean_cents"]) == (4, 1, 3, 2)


def test_welch_ttest_hand_case(ray_session):
    from eschergraph_ray.functions.stats import welch_ttest

    ds = rd.from_arrow(pa.table({
        "g": ["a", "a", "b", "b"],
        "v": pa.array([1.0, 3.0, 2.0, 2.0], pa.float64()),
    }))
    out = welch_ttest(ds, "g", "v", "a", "b").to_pandas()
    r = out.iloc[0]
    # equal means -> t = 0; Vb = 0 so df collapses to na-1 = 1
    assert (r["n_a"], r["n_b"], r["t_micro"], r["df_micro"]) == (
        2, 2, 0, 1_000_000)


def test_welch_ttest_degenerate_empty(ray_session):
    from eschergraph_ray.functions.stats import welch_ttest

    ds = rd.from_arrow(pa.table({
        "g": ["a", "b"],
        "v": pa.array([1.0, 2.0], pa.float64()),
    }))
    assert welch_ttest(ds, "g", "v", "a", "b").count() == 0


def test_chi_square_hand_cases(ray_session):
    from eschergraph_ray.functions.stats import chi_square_independence

    indep = rd.from_arrow(pa.table({
        "x": ["A"] * 20 + ["B"] * 20,
        "y": ([0] * 10 + [1] * 10) * 2,
    }))
    out = chi_square_independence(indep, "x", "y").to_pandas().iloc[0]
    assert (out["n"], out["nx"], out["ny"], out["dof"],
            out["chi2_micro"]) == (40, 2, 2, 1, 0)

    dep = rd.from_arrow(pa.table({
        "x": ["A"] * 20 + ["B"] * 20,
        "y": [0] * 20 + [1] * 20,
    }))
    out = chi_square_independence(dep, "x", "y").to_pandas().iloc[0]
    # every cell |o-e| = 10, e = 10 -> chi2 = 4 * 10 = 40
    assert out["chi2_micro"] == 40_000_000


def test_holt_forecast_hand_cases(ray_session):
    from eschergraph_ray.functions.windows import holt_forecast_by_type

    # type A: [10, 12] -> l=12e6, b=2e6; type B decreasing [10, 7, 3]
    # exercises the negative-trend floor-division branch
    rows = []
    eid = 0
    for typ, counts in (("A", [10, 12]), ("B", [10, 7, 3])):
        for h, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, 1, typ, h * HOUR, 0.0))
                eid += 1
    ev = _ev(rows)
    out = holt_forecast_by_type(ev, "event_type", "ts").to_pandas()
    a = out[out["event_type"] == "A"].iloc[0]
    assert (a["n_hours"], a["level_micro"], a["trend_micro"],
            a["forecast_1h"], a["forecast_24h"]) == (
        2, 12_000_000, 2_000_000, 14_000_000, 60_000_000)
    b = out[out["event_type"] == "B"].iloc[0]
    assert (b["level_micro"], b["trend_micro"]) == (3_800_000,
                                                    -3_020_000)
    assert b["forecast_1h"] == 780_000
    assert b["forecast_24h"] == 3_800_000 - 24 * 3_020_000


def test_holt_forecast_single_hour_dropped(ray_session):
    from eschergraph_ray.functions.windows import holt_forecast_by_type

    ev = _ev([(1, 1, "A", 0, 0.0)])
    assert holt_forecast_by_type(ev, "event_type", "ts").count() == 0


def test_holt_backtest_hand_case(ray_session):
    from eschergraph_ray.functions.windows import holt_backtest_by_type

    # A: [10, 12, 14] -> train on [10, 12]: l=12e6, b=2e6 ->
    # forecast 14e6 == actual -> err 0, ape 0
    rows = []
    eid = 0
    for h, c in enumerate([10, 12, 14]):
        for _ in range(c):
            rows.append((eid, 1, "A", h * HOUR, 0.0))
            eid += 1
    out = holt_backtest_by_type(
        _ev(rows), "event_type", "ts"
    ).to_pandas().iloc[0]
    assert (out["n_hours"], out["forecast_1h"], out["actual_micro"],
            out["err_micro"], out["ape_micro"]) == (
        3, 14_000_000, 14_000_000, 0, 0)


def test_js_divergence_hand_cases(ray_session):
    from eschergraph_ray.functions.stats import js_divergence_hours

    # identical hour profiles -> JS = 0
    same = _ev([
        (1, 1, "purchase", 0, 0.0), (2, 1, "view", 0, 0.0),
        (3, 1, "purchase", 1 * HOUR, 0.0), (4, 1, "view", 1 * HOUR, 0.0),
    ])
    out = js_divergence_hours(same, "event_type", "ts",
                              "purchase", "view").to_pandas().iloc[0]
    assert (out["n_hours"], out["total_a"], out["total_b"],
            out["js_micro"]) == (2, 2, 2, 0)

    # disjoint hours -> JS = ln 2 (693147 micro-nats; 2 cells of
    # 0.5*ln2 = 346574 each after rounding -> 693148)
    disj = _ev([
        (1, 1, "purchase", 0, 0.0),
        (2, 1, "view", 1 * HOUR, 0.0),
    ])
    out = js_divergence_hours(disj, "event_type", "ts",
                              "purchase", "view").to_pandas().iloc[0]
    assert abs(out["js_micro"] - 693_147) <= 2


def test_runs_test_hand_cases(ray_session):
    from eschergraph_ray.functions.stats import runs_test_by_group

    # alternating [1, 3, 1, 3]: median (inverse CDF p50) = 1 cents
    # v>m signs 0,1,0,1 -> runs 4, na=2
    # mu = 2*2*2/4 + 1 = 3; s2 = (8*(8-4))/(16*3) = 2/3
    # z = (4-3)/sqrt(2/3) = 1.224745 -> 1224745
    ev = _ev([
        (1, 1, "A", 0, 0.01),
        (2, 1, "A", 1 * HOUR, 0.03),
        (3, 1, "A", 2 * HOUR, 0.01),
        (4, 1, "A", 3 * HOUR, 0.03),
    ])
    out = runs_test_by_group(ev, "event_type", "ts", "event_id",
                             "value").to_pandas().iloc[0]
    assert (out["n"], out["n_above"], out["runs"]) == (4, 2, 4)
    assert abs(out["z_micro"] - 1_224_745) <= 1

    # constant values -> everything 'below' -> group dropped
    const = _ev([(1, 1, "B", 0, 0.02), (2, 1, "B", HOUR, 0.02)])
    assert runs_test_by_group(const, "event_type", "ts", "event_id",
                              "value").count() == 0
