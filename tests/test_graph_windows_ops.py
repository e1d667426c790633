"""Semantic dedup (SemDeDup), triangle counting, and per-key ordered
windows (running totals / funnel) — unit semantics on planted inputs
plus brute-force / DuckDB cross-checks."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from eschergraph_ray.functions.graph_metrics import (
    cooccurrence_pmi_topk,
    knn_from_pairs,
    triangle_counts,
)
from eschergraph_ray.functions.semdedup import semantic_dedup_pairs
from eschergraph_ray.functions.similarity import seed_centroids
from eschergraph_ray.functions.windows import (
    funnel_counts,
    group_percent_rank,
    resample_locf,
    running_totals,
)

SF = "/root/testdata/sf0.001"


# ---------- SemDeDup ----------


def _vec_tbl(ids, vecs):
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float64())
            ),
        }
    )


def test_semantic_dedup_planted_within_cluster_pair():
    # two well-separated clusters; a planted near-dup pair inside each;
    # one cross-cluster near-identical pair that must NOT be reported
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    vecs = [
        a,                       # 0 (seed -> cluster 0)
        b,                       # 1 (seed -> cluster 1)
        a + [0.0, 0.01, 0.0],    # 2 near-dup of 0
        b + [0.01, 0.0, 0.0],    # 3 near-dup of 1
        [0.7, 0.714, 0.0],       # 4 between clusters (assigned to 1)
    ]
    ds = rd.from_arrow(_vec_tbl(list(range(5)), vecs))
    ids, cent = seed_centroids(ds, "vec_id", "embedding", k=2)
    out = semantic_dedup_pairs(
        ds, ids, cent, "vec_id", "embedding", threshold=0.99
    ).to_pandas()
    pairs = {(r.id_a, r.id_b): r.cluster for r in out.itertuples()}
    assert (0, 2) in pairs and pairs[(0, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] == 1
    # 4 is cosine-close to both 1 and 3 but lands in one cluster with
    # them only if assigned there; crucially no pair spans clusters
    assig = {0: 0, 2: 0, 1: 1, 3: 1}
    for (x, y) in pairs:
        if x in assig and y in assig:
            assert assig.get(x) == assig.get(y)


def test_semantic_dedup_matches_brute_force_within_clusters():
    rng = np.random.default_rng(7)
    n, d, k = 60, 8, 4
    vecs = rng.normal(size=(n, d))
    ds = rd.from_arrow(_vec_tbl(list(range(n)), vecs))
    ids, cent = seed_centroids(ds, "vec_id", "embedding", k=k)
    thr = 0.5
    out = semantic_dedup_pairs(
        ds, ids, cent, "vec_id", "embedding", threshold=thr, num_chunks=3
    ).to_pandas()
    got = {(r.id_a, r.id_b, r.cluster) for r in out.itertuples()}
    # brute force: same quantized assignment, same quantized pair cut
    # (the exact pc.round half_towards_infinity kernel the impl uses)
    def q4(x):
        a = np.asarray(np.asarray(x, dtype=np.float64) * 1e4)
        return np.asarray(
            pa.compute.round(
                pa.array(a.ravel()), ndigits=0,
                round_mode="half_towards_infinity",
            )
        ).reshape(a.shape)

    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cm = np.asarray(cent)
    q = q4(m @ cm.T)
    clus = np.asarray(ids)[np.argmax(q, axis=1)]
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            if clus[i] == clus[j] and q4(float(m[i] @ m[j])) >= thr * 1e4:
                want.add((i, j, int(clus[i])))
    assert got == want


def test_semantic_dedup_drops_distinct_id_b():
    from eschergraph_ray.functions.semdedup import semantic_dedup_drops

    pairs = pa.table(
        {
            "cluster": pa.array([0, 0, 1], pa.int64()),
            "id_a": pa.array([1, 2, 5], pa.int64()),
            "id_b": pa.array([3, 3, 6], pa.int64()),
            "cosine": pa.array([0.99, 0.98, 0.97], pa.float64()),
        }
    )
    out = semantic_dedup_drops(rd.from_arrow(pairs)).to_pandas()
    assert sorted(out["vec_id"]) == [3, 6]  # 3 dropped once, not twice


def test_semantic_dedup_empty_input():
    ds = rd.from_arrow(_vec_tbl([0, 1], [[1.0, 0.0], [0.0, 1.0]]))
    ids, cent = seed_centroids(ds, "vec_id", "embedding", k=2)
    out = semantic_dedup_pairs(
        ds, ids, cent, "vec_id", "embedding", threshold=0.99
    ).to_pandas()
    # zero pairs: rows empty (an all-empty groupby output carries no
    # schema in Ray 2.49 — same contract as embedding_near_dup_pairs)
    assert len(out) == 0


# ---------- triangles ----------


def _edges(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "s": pa.array([p[0] for p in pairs], pa.string()),
                "t": pa.array([p[1] for p in pairs], pa.string()),
            }
        )
    )


def test_triangles_k4_with_noise():
    # K4 (4 triangles, every node in 3) + pendant + disjoint
    # triangle-free path; duplicate edges / self-loops / reversed
    # duplicates must not change counts
    pairs = [
        ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
        ("c", "d"), ("d", "e"), ("x", "y"), ("y", "z"),
        ("b", "a"), ("a", "a"), ("a", "b"),
    ]
    out = triangle_counts(_edges(pairs), "s", "t").to_pandas()
    got = dict(zip(out["node"], out["n_triangles"]))
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangles_none_and_empty():
    # (Ray 2.49 to_pandas() on an empty dataset drops the schema, so
    # assert emptiness via take_all and the schema via .schema())
    # path: no wedges survive orientation
    out = triangle_counts(_edges([("a", "b"), ("b", "c")]), "s", "t")
    assert out.take_all() == []
    assert out.schema().names == ["node", "n_triangles"]
    # square: a wedge exists but never closes (tri side empty)
    out = triangle_counts(
        _edges([("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]), "s", "t"
    )
    assert out.take_all() == []
    # fully empty input
    out = triangle_counts(_edges([]), "s", "t")
    assert out.take_all() == []
    assert out.schema().names == ["node", "n_triangles"]


def test_triangles_match_brute_force_random_graph():
    rng = np.random.default_rng(3)
    nodes = [f"n{i}" for i in range(30)]
    pairs = [
        (nodes[i], nodes[j])
        for i in range(30)
        for j in range(i + 1, 30)
        if rng.random() < 0.2
    ]
    out = triangle_counts(_edges(pairs), "s", "t").to_pandas()
    got = dict(zip(out["node"], out["n_triangles"]))
    # brute force over the adjacency matrix
    idx = {n: i for i, n in enumerate(nodes)}
    adj = np.zeros((30, 30), dtype=bool)
    for s, t in pairs:
        adj[idx[s], idx[t]] = adj[idx[t], idx[s]] = True
    want = {}
    for i in range(30):
        for j in range(i + 1, 30):
            for k in range(j + 1, 30):
                if adj[i, j] and adj[j, k] and adj[i, k]:
                    for v in (i, j, k):
                        want[nodes[v]] = want.get(nodes[v], 0) + 1
    assert got == want


def test_knn_from_pairs_topk_ties_and_symmetry():
    pairs = pa.table(
        {
            "id_a": pa.array([1, 1, 1, 2], pa.int64()),
            "id_b": pa.array([2, 3, 4, 3], pa.int64()),
            "cosine": pa.array([0.9, 0.8, 0.8, 0.7], pa.float64()),
        }
    )
    out = knn_from_pairs(
        rd.from_arrow(pairs), "id_a", "id_b", "cosine", k=2
    ).to_pandas()
    got = {
        (r.id, r.rnk): (r.neighbor_id, r.cosine) for r in out.itertuples()
    }
    assert got[(1, 1)] == (2, 0.9)
    assert got[(1, 2)] == (3, 0.8)  # 0.8 tie -> smaller neighbor id
    assert got[(2, 1)] == (1, 0.9) and got[(2, 2)] == (3, 0.7)
    assert got[(3, 1)] == (1, 0.8) and got[(3, 2)] == (2, 0.7)
    assert got[(4, 1)] == (1, 0.8)
    assert (4, 2) not in got and len(out) == 7


def test_cooccurrence_pmi_hand_computed():
    # x,y co-occur in g1-g3 (n_ab=3); x also in g4, y also in g5
    # (n_x=n_y=4, N=5); x,z co-occur only twice -> cut by min_count=3
    rows = [
        ("g1", "x"), ("g1", "y"), ("g2", "x"), ("g2", "y"),
        ("g3", "x"), ("g3", "y"), ("g4", "x"), ("g5", "y"),
        ("g1", "z"), ("g2", "z"),
        ("g1", "x"),  # duplicate observation must not inflate counts
    ]
    tbl = pa.table(
        {
            "grp": pa.array([r[0] for r in rows], pa.string()),
            "item": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    out = cooccurrence_pmi_topk(
        rd.from_arrow(tbl), "grp", "item", min_count=3
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r.item_a, r.item_b, r.n_ab) == ("x", "y", 3)
    want = np.copysign(
        np.floor(abs(np.log((3 * 5) / (4.0 * 4.0)) * 1e6) + 0.5),
        np.log(15 / 16.0),
    )
    assert r.pmi_micro == int(want)
    # min_count too high -> typed empty result
    out2 = cooccurrence_pmi_topk(
        rd.from_arrow(tbl), "grp", "item", min_count=10
    )
    assert out2.take_all() == []
    assert out2.schema().names == ["item_a", "item_b", "n_ab", "pmi_micro"]
    # fully empty input -> typed empty, no hash-join crash
    out3 = cooccurrence_pmi_topk(rd.from_arrow(tbl[:0]), "grp", "item")
    assert out3.take_all() == []
    assert out3.schema().names == ["item_a", "item_b", "n_ab", "pmi_micro"]


# ---------- running totals ----------


def test_running_totals_hand_computed():
    t0 = 1_700_000_000_000_000  # us
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "user_id": pa.array([7, 7, 7, 8], pa.int64()),
            "ts": pa.array([t0, t0 + 5, t0 + 5, t0 + 9], pa.timestamp("us")),
            "value": pa.array([1.005, 2.0, 0.5, 3.25], pa.float64()),
        }
    )
    out = (
        running_totals(rd.from_arrow(tbl), "user_id", "ts", "event_id", "value")
        .to_pandas()
        .set_index("event_id")
    )
    # order within user 7: (t0, id1), (t0+5, id2), (t0+5, id3) — ts then id
    assert out.loc[1, "running_micro"] == 1_005_000
    assert out.loc[2, "running_micro"] == 3_005_000
    assert out.loc[3, "running_micro"] == 3_505_000
    assert out.loc[4, "running_micro"] == 3_250_000
    assert out.loc[1, "gap_us"] == -1
    assert out.loc[2, "gap_us"] == 5
    assert out.loc[3, "gap_us"] == 0
    assert out.loc[4, "gap_us"] == -1


def test_running_totals_oracle_replay_sf0001():
    ds = rd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    got = (
        running_totals(ds, "user_id", "ts", "event_id", "value")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.execute(f"""
        SELECT event_id, user_id,
               CAST(sum(CAST(round(value * 1e6, 0) AS BIGINT)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS running_micro,
               coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
               ), -1) AS gap_us
        FROM read_parquet('{SF}/events.parquet')
        ORDER BY event_id
    """).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


# ---------- funnel ----------


def test_funnel_strict_order_and_gap():
    t0 = 1_700_000_000_000_000
    DAY = 86_400_000_000
    rows = [
        # user 1: full funnel inside the gap
        (1, t0, "view"), (1, t0 + 10, "click"), (1, t0 + 20, "purchase"),
        # user 2: click BEFORE the view — stops at step 1
        (2, t0, "click"), (2, t0 + 10, "view"),
        # user 3: click too late (> 1 day after view) — stops at step 1
        (3, t0, "view"), (3, t0 + DAY + 1, "click"),
        # user 4: view+click, purchase exactly at the gap limit (kept)
        (4, t0, "view"), (4, t0 + 5, "click"), (4, t0 + 5 + DAY, "purchase"),
        # user 5: purchase simultaneous with click — strict > drops it
        (5, t0, "view"), (5, t0 + 5, "click"), (5, t0 + 5, "purchase"),
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    out = funnel_counts(
        rd.from_arrow(tbl), "user_id", "ts", "event_type",
        ("view", "click", "purchase"), within_us=DAY,
    ).to_pandas()
    got = dict(zip(out["step_name"], out["n_keys"]))
    assert got == {"view": 5, "click": 3, "purchase": 2}


def test_percent_rank_ties_and_singleton():
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "event_type": pa.array(["a"] * 5 + ["b"], pa.string()),
            "value": pa.array([10.0, 20.0, 20.0, 30.0, 5.0, 9.0], pa.float64()),
        }
    )
    out = (
        group_percent_rank(rd.from_arrow(tbl), "event_type", "event_id", "value")
        .to_pandas()
        .set_index("event_id")
    )
    # group a sorted: 5,10,20,20,30 -> ranks-1: 0,1,2,2,4 over n-1=4
    assert out.loc[5, "pr"] == 0.0
    assert out.loc[1, "pr"] == 0.25
    assert out.loc[2, "pr"] == 0.5 and out.loc[3, "pr"] == 0.5
    assert out.loc[4, "pr"] == 1.0
    assert out.loc[6, "pr"] == 0.0  # singleton group


def test_percent_rank_oracle_replay_sf0001():
    ds = rd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    got = (
        group_percent_rank(ds, "event_type", "event_id", "value")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(f"""
        SELECT event_id, event_type,
               percent_rank() OVER (PARTITION BY event_type ORDER BY value) AS pr
        FROM read_parquet('{SF}/events.parquet') ORDER BY event_id
    """).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_resample_locf_hand_computed():
    DAY = 86_400_000_000
    t0 = 10 * DAY  # aligned
    rows = [
        # user 7: events at day 10 + 1h, day 11 (two simultaneous), day 13 - 1h
        (1, 7, t0 + 3_600_000_000, 1.0),
        (2, 7, 11 * DAY, 2.0),
        (3, 7, 11 * DAY, 3.0),       # same ts, larger id wins
        (4, 7, 13 * DAY - 3_600_000_000, 4.0),
        # user 8: span shorter than a step -> no grid points
        (5, 8, t0 + 1, 5.0),
        (6, 8, t0 + 2, 6.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    out = resample_locf(
        rd.from_arrow(tbl), "user_id", "ts", "event_id", "value", step_us=DAY
    ).to_pandas()
    got = {(r.user_id, r.t_us): r.v_cents for r in out.itertuples()}
    # user 7 grid: days 11 and 12 (day 10 grid point precedes the first event)
    assert got == {(7, 11 * DAY): 300, (7, 12 * DAY): 300}


def test_resample_locf_oracle_replay_sf0001():
    DAY = 86_400_000_000
    ds = rd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    got = (
        resample_locf(ds, "user_id", "ts", "event_id", "value", step_us=DAY)
        .to_pandas()
        .sort_values(["user_id", "t_us"])
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(f"""
        WITH c AS (
          SELECT user_id, epoch_us(ts) AS tus,
                 CAST(round(value * 100, 0) AS BIGINT) AS xc, event_id
          FROM read_parquet('{SF}/events.parquet')
        ),
        c1 AS (SELECT user_id, tus, max_by(xc, event_id) AS xc
               FROM c GROUP BY user_id, tus),
        b AS (SELECT user_id,
                     ((min(tus) + {DAY} - 1) // {DAY}) * {DAY} AS lo,
                     (max(tus) // {DAY}) * {DAY} AS hi
              FROM c GROUP BY user_id),
        g AS (SELECT user_id, unnest(generate_series(lo, hi, {DAY})) AS t
              FROM b WHERE lo <= hi)
        SELECT g.user_id, g.t AS t_us, c1.xc AS v_cents
        FROM g ASOF JOIN c1 ON g.user_id = c1.user_id AND g.t >= c1.tus
        ORDER BY g.user_id, t_us
    """).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_funnel_oracle_replay_sf0001():
    ds = rd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    got = funnel_counts(
        ds, "user_id", "ts", "event_type",
        ("view", "click", "purchase"), within_us=86_400_000_000,
    ).to_pandas().sort_values("step").reset_index(drop=True)
    con = duckdb.connect()
    want = con.execute(f"""
        WITH ev AS (SELECT * FROM read_parquet('{SF}/events.parquet')),
        s1 AS (SELECT user_id, min(ts) AS t FROM ev
               WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
               JOIN s1 ON e.user_id = s1.user_id
                      AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL 1 DAY
               WHERE e.event_type = 'click' GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) AS t FROM ev e
               JOIN s2 ON e.user_id = s2.user_id
                      AND e.ts > s2.t AND e.ts <= s2.t + INTERVAL 1 DAY
               WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT 1 AS step, 'view' AS step_name,
               (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_keys
        UNION ALL SELECT 2, 'click', (SELECT CAST(count(*) AS BIGINT) FROM s2)
        UNION ALL SELECT 3, 'purchase', (SELECT CAST(count(*) AS BIGINT) FROM s3)
        ORDER BY step
    """).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_throttle_first_per_window_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.windows import throttle_first_per_window

    H = 3_600_000_000
    t = pa.table(
        {
            "u": [1, 1, 1, 1, 2],
            "ts": pa.array(
                # u=1: three events in hour 0 (two tied at t=5, ids 9
                # and 3 -> id 3 survives), one in hour 1; u=2 single
                [5, 5, 100, H + 1, 50],
                pa.timestamp("us"),
            ),
            "eid": [9, 3, 7, 8, 4],
        }
    )
    out = (
        throttle_first_per_window(
            rd.from_arrow(t).repartition(3), ["u"], "ts", "eid"
        )
        .to_pandas()
        .set_index(["u", "window_start_us"])
    )
    assert out.loc[(1, 0)].tolist() == [3, 2]
    assert out.loc[(1, H)].tolist() == [8, 0]
    assert out.loc[(2, 0)].tolist() == [4, 0]


def test_throttle_window_validation():
    import pytest

    from eschergraph_ray.functions.windows import throttle_first_per_window

    with pytest.raises(ValueError):
        throttle_first_per_window(None, ["u"], "ts", "eid", window_us=0)


def test_throttle_rejects_negative_ids(ray_session):
    # '-' sorts before '0', so a negative id would win the packed-key
    # argmin under the WRONG ordering — the guard fails loud instead
    import pytest

    from eschergraph_ray.functions.windows import throttle_first_per_window

    t = pa.table(
        {
            "u": [1, 1],
            "ts": pa.array([5, 6], pa.timestamp("us")),
            "eid": [-3, 2],
        }
    )
    # the ValueError is raised inside a Ray task -> arrives wrapped
    with pytest.raises(Exception, match="non-negative ids"):
        throttle_first_per_window(
            rd.from_arrow(t), ["u"], "ts", "eid"
        ).take_all()


def test_association_rules_hand_computed(ray_session):
    """Directed confidence over the shared pair scaffolding: baskets
    g1-g3 = {x, y}, g4 = {x} -> rule y->x has confidence 1.0, x->y has
    3/4; both carry the pair's pmi_micro = round(ln(3*4/(4*3))*1e6)=0."""
    from eschergraph_ray.functions.graph_metrics import association_rules_topk

    rows = [(f"g{i}", v) for i in range(3) for v in ("x", "y")] + [("g4", "x")]
    tbl = pa.table(
        {
            "grp": pa.array([r[0] for r in rows], pa.string()),
            "item": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    out = sorted(
        association_rules_topk(
            rd.from_arrow(tbl), "grp", "item", min_count=3
        ).take_all(),
        key=lambda r: r["antecedent"],
    )
    assert [(r["antecedent"], r["consequent"], r["n_ab"], r["conf_micro"],
             r["pmi_micro"]) for r in out] == [
        ("x", "y", 3, 750000, 0),
        ("y", "x", 3, 1000000, 0),
    ]
    # empty input keeps the typed 5-column schema
    empty = association_rules_topk(rd.from_arrow(tbl[:0]), "grp", "item")
    assert empty.take_all() == []
    assert empty.schema().names == [
        "antecedent", "consequent", "n_ab", "conf_micro", "pmi_micro",
    ]


def test_mutual_information_hand_computed(ray_session):
    import math

    from eschergraph_ray.functions.stats import mutual_information

    # dependent: cells a0=4, a1=2, b0=2, b1=2 -> N=10
    xs = ["a"] * 6 + ["b"] * 4
    ys = [0, 0, 0, 0, 1, 1, 0, 0, 1, 1]
    ds = rd.from_arrow(pa.table({"x": xs, "y": ys})).repartition(3)
    out = mutual_information(ds, "x", "y").take_all()
    assert len(out) == 1
    r = out[0]
    assert r["n"] == 10 and r["n_cells"] == 4

    def q(nxy, nx, ny):
        return round(math.log(nxy * 10.0 / (nx * ny)) * 1e6)

    total = (4 * q(4, 6, 6) + 2 * q(2, 6, 4)
             + 2 * q(2, 4, 6) + 2 * q(2, 4, 4))
    assert r["mi_micro"] == round(total / 10.0)
    assert r["mi_micro"] > 0
    # exact independence -> every cell's q = 0 -> MI = 0
    xs2 = ["a", "a", "b", "b"]
    ys2 = [0, 1, 0, 1]
    ind = mutual_information(
        rd.from_arrow(pa.table({"x": xs2, "y": ys2})), "x", "y"
    ).take_all()[0]
    assert ind["mi_micro"] == 0 and ind["n"] == 4
    # empty input -> zero rows, typed schema
    e = mutual_information(rd.from_arrow(pa.table({"x": xs2, "y": ys2})[:0]),
                           "x", "y")
    assert e.take_all() == []
    assert e.schema().names == ["n", "n_cells", "mi_micro"]


def test_cooccurrence_max_basket_drops_pathological_group(ray_session):
    """The quadratic-fan-out guard: a basket over max_basket distinct
    items is dropped WHOLE (contributes to no pair/item/N counts); the
    other baskets' PMI reflects the reduced N."""
    import math

    hot = [("hot", f"i{j:02d}") for j in range(60)]
    normal = [(f"g{i}", v) for i in range(3) for v in ("x", "y")]
    tbl = pa.table(
        {
            "grp": pa.array([r[0] for r in hot + normal], pa.string()),
            "item": pa.array([r[1] for r in hot + normal], pa.string()),
        }
    )
    ds = rd.from_arrow(tbl)
    # cutoff active: only the 3 normal baskets remain -> N=3 and the
    # (x, y) pair has n_ab=n_a=n_b=3 -> pmi = ln(3*3/9) = 0
    cut = cooccurrence_pmi_topk(
        ds, "grp", "item", min_count=3, max_basket=10
    ).take_all()
    assert [(r["item_a"], r["item_b"], r["n_ab"], r["pmi_micro"])
            for r in cut] == [("x", "y", 3, 0)]
    # no cutoff: the hot basket joins N -> pmi = ln(3*4/9)
    full = cooccurrence_pmi_topk(
        ds, "grp", "item", min_count=3, max_basket=None
    ).take_all()
    assert [(r["item_a"], r["item_b"], r["n_ab"]) for r in full] == [
        ("x", "y", 3)
    ]
    assert full[0]["pmi_micro"] == round(math.log(3 * 4 / 9) * 1e6)
    # output-size bound: with the cutoff the hot basket's C(60,2)=1770
    # pairs never materialize
    assert cooccurrence_pmi_topk(
        ds, "grp", "item", min_count=1, max_basket=10
    ).count() == 1
    n_all = cooccurrence_pmi_topk(
        ds, "grp", "item", min_count=1, max_basket=None
    ).count()
    assert n_all == 1 + 60 * 59 // 2


def test_group_ntile_uneven_buckets(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.windows import group_ntile

    # 6 rows / 4 buckets: sizes 2,2,1,1 (first n mod k buckets larger);
    # value ties (30, 30) broken by id
    t = pa.table(
        {
            "k": ["a"] * 6 + ["b"],
            "v": [10.0, 20.0, 30.0, 30.0, 40.0, 50.0, 1.0],
            "eid": [1, 2, 4, 3, 5, 6, 7],
        }
    )
    out = {
        (r["k"], r["eid"]): r["ntile"]
        for r in group_ntile(
            rd.from_arrow(t).repartition(3), "k", "v", "eid", k=4
        ).take_all()
    }
    assert out == {
        ("a", 1): 1, ("a", 2): 1,      # bucket 1: rows 1-2
        ("a", 3): 2, ("a", 4): 2,      # tie at 30 -> id 3 before 4
        ("a", 5): 3, ("a", 6): 4,
        ("b", 7): 1,                    # single row, single bucket
    }


def test_group_ntile_validation():
    import pytest

    from eschergraph_ray.functions.windows import group_ntile

    with pytest.raises(ValueError):
        group_ntile(None, "k", "v", "id", k=0)


def test_retention_counts_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.windows import retention_counts

    D = 86_400_000_000
    # u1: first day 0, returns day 1 and day 7 (twice on day 1 — the
    # distinct collapse must count once); u2: first day 0, never
    # returns; u3: first day 2, returns day 3
    rows = [
        (1, 0), (1, D + 5), (1, D + 9), (1, 7 * D),
        (2, 100),
        (3, 2 * D), (3, 3 * D + 1),
    ]
    t = pa.table(
        {
            "user_id": [u for u, _ in rows],
            "ts": pa.array([ts for _, ts in rows], pa.timestamp("us")),
        }
    )
    out = {
        r["cohort_day"]: (r["n_users"], r["ret_1"], r["ret_7"])
        for r in retention_counts(
            rd.from_arrow(t).repartition(3), "user_id", "ts"
        ).take_all()
    }
    assert out == {0: (2, 1, 1), 2 * D: (1, 1, 0)}


def test_retention_counts_validation():
    import pytest

    from eschergraph_ray.functions.windows import retention_counts

    with pytest.raises(ValueError):
        retention_counts(None, "u", "ts", offsets=(0,))


def test_event_transitions_hand(ray_session):
    from eschergraph_ray.functions.windows import event_transitions

    # user 1: a->b->a->b (ties on ts broken by id); user 2: b->c;
    # user 3 single event (no pair); null type excised BEFORE pairing
    # so user 4's a,None,c yields a->c
    t = pa.table(
        {
            "uid": [1, 1, 1, 1, 2, 2, 3, 4, 4, 4],
            "ts": [10, 20, 20, 30, 5, 6, 1, 1, 2, 3],
            "eid": [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
            "typ": ["a", "b", "a", "b", "b", "c", "a", "a", None, "c"],
        }
    )
    out = (
        event_transitions(
            rd.from_arrow(t).repartition(3), "uid", "ts", "eid", "typ", k=10
        )
        .to_pandas()
    )
    got = {(r.src, r.dst): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1,
                   ("a", "c"): 1}
    # deterministic order: n desc then (src, dst) asc
    assert list(out.itertuples(index=False))[0][:2] == ("a", "b")
    # limit fencepost is the same total order
    top2 = event_transitions(
        rd.from_arrow(t), "uid", "ts", "eid", "typ", k=2
    ).to_pandas()
    assert [(r.src, r.dst) for r in top2.itertuples()] == [
        ("a", "b"), ("a", "c")
    ]


def test_hourly_anomalies_planted_burst(ray_session):
    from eschergraph_ray.functions.windows import hourly_anomalies

    HOUR = 3_600_000_000
    # 30 calm hours of 10 events, then one 100-event burst hour
    ts = []
    for h in range(30):
        ts += [h * HOUR + i for i in range(10)]
    ts += [30 * HOUR + i for i in range(100)]
    t = pa.table({"ts": pa.array(ts, pa.timestamp("us"))})
    out = hourly_anomalies(
        rd.from_arrow(t).repartition(4), "ts", window=24, factor_pct=300
    ).to_pandas()
    # only the burst hour: 100*100*24 > 300*240; calm hours never flag
    assert list(out["hr"]) == [30]
    assert list(out["n"]) == [100] and list(out["trail_n"]) == [240]
    # the first `window` observed hours are never flagged even if huge
    head = pa.table(
        {"ts": pa.array([0] * 50 + [HOUR] * 1, pa.timestamp("us"))}
    )
    assert len(hourly_anomalies(
        rd.from_arrow(head), "ts", window=24, factor_pct=300
    ).take_all()) == 0
    import pytest

    with pytest.raises(ValueError):
        hourly_anomalies(rd.from_arrow(t), "ts", window=0)


def test_ks_drift_extremes(ray_session):
    from eschergraph_ray.functions.stats import ks_drift

    # identical distributions -> ks 0
    t = pa.table(
        {
            "v": [1.0, 2.0, 3.0, 1.0, 2.0, 3.0],
            "seg": ["A", "A", "A", "B", "B", "B"],
        }
    )
    r = ks_drift(rd.from_arrow(t).repartition(2), "v", "seg", "A", "B")
    row = r.take_all()[0]
    assert (row["n_a"], row["n_b"], row["ks_num"], row["ks_micro"]) == (
        3, 3, 0, 0
    )
    # fully separated -> sup = n_a * n_b -> ks_micro = 1e6; other
    # segments ignored
    t2 = pa.table(
        {
            "v": [1.0, 2.0, 5.0, 6.0, 9.0],
            "seg": ["A", "A", "B", "B", "C"],
        }
    )
    row2 = ks_drift(rd.from_arrow(t2), "v", "seg", "A", "B").take_all()[0]
    assert row2["ks_num"] == 4 and row2["ks_micro"] == 1_000_000
    # an empty segment -> zero rows, typed schema
    e = ks_drift(rd.from_arrow(t2), "v", "seg", "A", "Z")
    assert e.take_all() == []
    assert e.schema().names == ["n_a", "n_b", "ks_num", "ks_micro"]


def test_centroid_outliers_planted(ray_session):
    from eschergraph_ray.functions.similarity import centroid_outliers

    # 2 reference centroids (ids 0, 1); id 99 planted far away
    vecs = [[0.0, 0.0], [1.0, 0.0], [0.1, 0.0], [0.9, 0.1],
            [100.0, 100.0]]
    ids = [0, 1, 2, 3, 99]
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    out = centroid_outliers(
        rd.from_arrow(t).repartition(2), "vec_id", "embedding",
        k_centroids=2, topk=5,
    ).to_pandas()
    assert list(out["vec_id"])[0] == 99
    # the references themselves are distance 0 and tie-break to the
    # SMALLEST centroid id for equidistant points
    byid = out.set_index("vec_id")
    assert byid.loc[0, "dist_sq"] == 0 and byid.loc[1, "dist_sq"] == 0
    # exact integer distances: id 2 -> (0.1*1e6)^2 = 1e10 to centroid 0
    assert byid.loc[2, "cluster"] == 0
    assert byid.loc[2, "dist_sq"] == 100_000 ** 2
    # empty input -> typed empty
    e = centroid_outliers(
        rd.from_arrow(t[:0]), "vec_id", "embedding", k_centroids=2
    )
    assert e.take_all() == []


def test_rank_auc_hand(ray_session):
    from eschergraph_ray.functions.stats import rank_auc

    # perfect separation -> AUC 1; reversed -> 0; all-tied -> 0.5
    t = pa.table({"s": [1, 2, 10, 20], "label": [0, 0, 1, 1]})
    r = rank_auc(rd.from_arrow(t).repartition(2), "s", "label").take_all()[0]
    assert (r["n_pos"], r["n_neg"], r["auc_num2"], r["auc_micro"]) == (
        2, 2, 8, 1_000_000
    )
    rev = rank_auc(
        rd.from_arrow(pa.table({"s": [10, 20, 1, 2],
                                "label": [0, 0, 1, 1]})), "s", "label"
    ).take_all()[0]
    assert rev["auc_num2"] == 0 and rev["auc_micro"] == 0
    tied = rank_auc(
        rd.from_arrow(pa.table({"s": [5, 5, 5, 5],
                                "label": [0, 1, 0, 1]})), "s", "label"
    ).take_all()[0]
    assert tied["auc_num2"] == 4 and tied["auc_micro"] == 500_000
    # mixed hand case: pos {2, 3}, neg {1, 3} ->
    # correct = (2>1) + (3>1) = 2, ties = 1 -> AUC = 5/8
    m = rank_auc(
        rd.from_arrow(pa.table({"s": [2, 3, 1, 3],
                                "label": [1, 1, 0, 0]})), "s", "label"
    ).take_all()[0]
    assert m["auc_num2"] == 5 and m["auc_micro"] == 625_000
    # single-class -> zero rows, typed schema
    e = rank_auc(
        rd.from_arrow(pa.table({"s": [1, 2], "label": [1, 1]})),
        "s", "label",
    )
    assert e.take_all() == []
    assert e.schema().names == ["n_pos", "n_neg", "auc_num2", "auc_micro"]


def test_lag_xcorr_hand(ray_session):
    import pytest

    from eschergraph_ray.functions.windows import lag_xcorr

    HOUR = 3_600_000_000
    # a fires at hours 0,1; b fires at hours 2,3 (2 events at hour 3):
    # lag 2 aligns both a-hours with a b-hour -> peak
    rows = [(0, "a"), (1, "a"), (2, "b"), (3, "b"), (3, "b"), (1, "c")]
    t = pa.table(
        {
            "ts": pa.array([h * HOUR for h, _ in rows], pa.timestamp("us")),
            "typ": [ty for _, ty in rows],
        }
    )
    out = lag_xcorr(
        rd.from_arrow(t).repartition(2), "ts", "typ", "a", "b", max_lag=3
    ).to_pandas()
    assert list(out["lag"]) == [0, 1, 2, 3]
    # lag1: a@1 x b@2 = 1; lag2: a@0xb@2 + a@1xb@3 = 1+2 = 3;
    # lag3: a@0xb@3 = 2
    assert list(out["xprod"]) == [0, 1, 3, 2]
    # autocorrelation (type_a == type_b) is well-defined: lag 0 is the
    # sum of squared counts
    auto = lag_xcorr(
        rd.from_arrow(t), "ts", "typ", "b", "b", max_lag=1
    ).to_pandas()
    assert list(auto["xprod"])[0] == 1 * 1 + 2 * 2
    with pytest.raises(ValueError):
        lag_xcorr(rd.from_arrow(t), "ts", "typ", "a", "b", max_lag=-1)


def test_rank_auc_by_group_hand(ray_session):
    from eschergraph_ray.functions.stats import rank_auc_by_group

    t = pa.table(
        {
            "g": ["a", "a", "a", "a", "b", "b", "b", "b", "c", "c"],
            "s": [1, 2, 10, 20, 10, 20, 1, 2, 5, 6],
            "label": [0, 0, 1, 1, 0, 0, 1, 1, 1, 1],
        }
    )
    out = rank_auc_by_group(
        rd.from_arrow(t).repartition(3), "g", "s", "label"
    ).to_pandas()
    # group a: perfect; group b: reversed; group c: single-class ->
    # omitted
    assert list(out["g"]) == ["a", "b"]
    assert list(out["auc_micro"]) == [1_000_000, 0]
    assert list(out["n_pos"]) == [2, 2] and list(out["n_neg"]) == [2, 2]


def test_hourly_trend_hand(ray_session):
    from eschergraph_ray.functions.windows import hourly_trend

    HOUR = 3_600_000_000
    # span hours 0..3 (h=4): type "up" counts [1,2,3,4] -> slope 1;
    # type "gap" appears only at hour 0 (missing hours = 0) -> down
    ts, typ = [], []
    for x, n in enumerate([1, 2, 3, 4]):
        ts += [x * HOUR] * n
        typ += ["up"] * n
    ts += [0, 0]
    typ += ["gap", "gap"]
    t = pa.table(
        {"ts": pa.array(ts, pa.timestamp("us")), "typ": typ}
    )
    out = hourly_trend(
        rd.from_arrow(t).repartition(2), "ts", "typ"
    ).to_pandas()
    assert list(out["event_type"]) == ["gap", "up"]
    # h=4: sx=6, sxx=14, den=4*14-36=20
    assert set(out["slope_den"]) == {20} and set(out["n_hours"]) == {4}
    up = out[out.event_type == "up"].iloc[0]
    # sy=10, sxy=0+2+6+12=20 -> num=4*20-6*10=20 -> slope exactly 1
    assert up["slope_num"] == 20 and up["slope_micro"] == 1_000_000
    gap = out[out.event_type == "gap"].iloc[0]
    # sy=2, sxy=0 -> num=-12 -> slope -0.6
    assert gap["slope_num"] == -12 and gap["slope_micro"] == -600_000
    # single-hour span -> undefined -> zero rows
    one = pa.table(
        {"ts": pa.array([0, 1], pa.timestamp("us")), "typ": ["a", "a"]}
    )
    assert hourly_trend(rd.from_arrow(one), "ts", "typ").take_all() == []


def test_robust_stats_by_group_hand(ray_session):
    from eschergraph_ray.functions.stats import robust_stats_by_group

    # group a: values [1,2,3,4,100] -> n=5, med: cum [1,2,3,4,5],
    # 2*cum>=5 at v=3 -> med=300c; |d|=[200,100,0,100,9700] ->
    # d-cells {0:1,100:2,200:1,9700:1} cum [1,3,4,5] -> mad: 2*cum>=5
    # at d=100 -> mad=100c; outliers d>300: the 9700 row -> 1
    t = pa.table(
        {
            "g": ["a"] * 5 + ["b"] * 2,
            "v": [1.0, 2.0, 3.0, 4.0, 100.0, 5.0, 5.0],
        }
    )
    out = robust_stats_by_group(
        rd.from_arrow(t).repartition(3), "g", "v"
    ).to_pandas()
    a = out[out.g == "a"].iloc[0]
    assert (a["n"], a["med_cents"], a["mad_cents"], a["n_outliers"]) == (
        5, 300, 100, 1
    )
    # constant group: mad 0 -> every non-median row is an "outlier"
    # under d > 0, but all values equal the median -> 0
    b = out[out.g == "b"].iloc[0]
    assert (b["n"], b["med_cents"], b["mad_cents"], b["n_outliers"]) == (
        2, 500, 0, 0
    )


# ---------- rolling active users (DAU/WAU) ----------


def test_ansi_ntile_positions_shared_math():
    from eschergraph_ray.functions.windows import ansi_ntile_positions

    # n=10, k=4: first 10 mod 4 = 2 buckets get 3 rows, rest get 2
    assert ansi_ntile_positions(10, 4).tolist() == [
        1, 1, 1, 2, 2, 2, 3, 3, 4, 4
    ]
    # fewer rows than buckets: one per bucket in order
    assert ansi_ntile_positions(3, 4).tolist() == [1, 2, 3]


def test_rolling_active_users_hand():
    import pytest

    from eschergraph_ray.functions.windows import rolling_active_users

    D = 86_400_000_000
    t = pa.table(
        {
            "u": pa.array([1, 2, 2, 3], pa.int64()),
            "ts": pa.array([0, 10, D + 5, 3 * D + 7], pa.timestamp("us")),
        }
    )
    out = (
        rolling_active_users(rd.from_arrow(t).repartition(2), "u", "ts",
                             window_days=2)
        .to_pandas()
        .set_index("day")
    )
    # day0: users {1,2}; day1: {2} (window {day0,day1} -> {1,2});
    # day3: {3} (day2 unobserved, so its window is just day3)
    assert out.loc[0].tolist() == [2, 2]
    assert out.loc[D].tolist() == [1, 2]
    assert out.loc[3 * D].tolist() == [1, 1]
    assert len(out) == 3
    with pytest.raises(ValueError):
        rolling_active_users(None, "u", "ts", window_days=0)


def test_rolling_active_users_empty():
    from eschergraph_ray.functions.windows import rolling_active_users

    t = pa.table(
        {
            "u": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us")),
        }
    )
    out = rolling_active_users(rd.from_arrow(t), "u", "ts")
    assert out.schema().names == ["day", "dau", "wau"]
    assert out.count() == 0


def test_rolling_active_users_oracle_replay_sf0001(ray_session):
    import duckdb

    from eschergraph_ray.functions.windows import rolling_active_users

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    got = (
        rolling_active_users(ds, "user_id", "ts", window_days=7)
        .to_pandas()
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH pairs AS (
          SELECT DISTINCT
                 (epoch_us(ts) // 86400000000) * 86400000000 AS day,
                 user_id
          FROM read_parquet('{SF}/events.parquet')
          WHERE ts IS NOT NULL AND user_id IS NOT NULL
        ),
        days AS (SELECT DISTINCT day FROM pairs)
        SELECT d.day,
               CAST(count(DISTINCT CASE WHEN p.day = d.day
                                        THEN p.user_id END)
                    AS BIGINT) AS dau,
               CAST(count(DISTINCT p.user_id) AS BIGINT) AS wau
        FROM days d
        JOIN pairs p ON p.day <= d.day
                    AND p.day > d.day - 7 * 86400000000
        GROUP BY d.day ORDER BY d.day
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------- session paths ----------


def test_session_paths_hand():
    from eschergraph_ray.functions.windows import session_paths

    S = 1_000_000
    rows = [
        # user 1: A,B within one session; C two hours later
        (1, 0 * S, 1, "A"),
        (1, 60 * S, 2, "B"),
        (1, 7200 * S, 3, "C"),
        # user 2: five X at 1s intervals, max_len=3 truncates
        *[(2, i * S, 10 + i, "X") for i in range(5)],
    ]
    t = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "eid": pa.array([r[2] for r in rows], pa.int64()),
            "typ": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    out = (
        session_paths(rd.from_arrow(t).repartition(2), "u", "ts", "eid",
                      "typ", gap_us=1_800_000_000, max_len=3, k=10)
        .to_pandas()
        .set_index("path")["n"]
    )
    assert out.to_dict() == {"A>B": 1, "C": 1, "X>X>X": 1}


def test_session_paths_tie_and_topk_cut():
    from eschergraph_ray.functions.windows import session_paths

    # two users with path "A", one with "B": k=1 keeps the n=2 path
    t = pa.table(
        {
            "u": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array([0, 0, 0], pa.timestamp("us")),
            "eid": pa.array([1, 2, 3], pa.int64()),
            "typ": pa.array(["A", "A", "B"], pa.string()),
        }
    )
    out = session_paths(
        rd.from_arrow(t), "u", "ts", "eid", "typ", k=1
    ).to_pandas()
    assert out["path"].tolist() == ["A"] and out["n"].tolist() == [2]


# ---------- activity changepoint ----------


def test_activity_changepoint_planted_shift():
    from eschergraph_ray.functions.windows import activity_changepoint

    H = 3_600_000_000
    # type A: hourly counts [1,1,5,5] over hours 0..3 -> m=4, T=12,
    # dev = |4*cum - i*12| = [8,16,8,0] -> changepoint at hour 1
    ts, typ = [], []
    for hr, c in enumerate([1, 1, 5, 5]):
        for j in range(c):
            ts.append(hr * H + j)
            typ.append("A")
    t = pa.table(
        {
            "ts": pa.array(ts, pa.timestamp("us")),
            "typ": pa.array(typ, pa.string()),
        }
    )
    out = activity_changepoint(
        rd.from_arrow(t).repartition(3), "ts", "typ"
    ).to_pandas()
    assert out.iloc[0].tolist() == ["A", 4, 12, 1, 16]


def test_activity_changepoint_tie_smallest_hour():
    from eschergraph_ray.functions.windows import activity_changepoint

    H = 3_600_000_000
    # uniform [2,2]: dev = [0,0] everywhere -> tie -> smallest hour
    t = pa.table(
        {
            "ts": pa.array([0, 1, H, H + 1], pa.timestamp("us")),
            "typ": pa.array(["B"] * 4, pa.string()),
        }
    )
    out = activity_changepoint(rd.from_arrow(t), "ts", "typ").to_pandas()
    assert out.iloc[0].tolist() == ["B", 2, 4, 0, 0]


def test_session_durations_hand():
    from eschergraph_ray.functions.windows import session_durations

    S = 1_000_000
    D = 86_400_000_000
    # user 1: two sessions — [0, 60s] (dur 60s) then 2h later a
    # singleton (dur 0); user 2: one event 3 days in (Thu+3=Sunday)
    t = pa.table(
        {
            "u": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(
                [0, 60 * S, 7200 * S, 3 * D + 5], pa.timestamp("us")
            ),
            "eid": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    out = (
        session_durations(rd.from_arrow(t).repartition(2), "u", "ts",
                          "eid")
        .to_pandas()
        .sort_values(["dow", "dur_us"])
        .reset_index(drop=True)
    )
    # (epoch_day + 4) % 7 — the events_seasonality convention:
    # day 0 (Thu) -> 4, day 3 (Sun) -> 0
    assert out.values.tolist() == [[0, 0], [4, 0], [4, 60 * S]]


def test_scd2_intervals_matches_bruteforce(ray_session):
    import random

    import pandas as pd
    import ray.data as rd

    from eschergraph_ray.functions.windows import scd2_intervals

    rng = random.Random(31)
    rows = []
    eid = 0
    for u in range(8):
        t = 1000
        for _ in range(rng.randrange(0, 25)):
            t += rng.randrange(1, 50)
            attr = rng.choice(["a", "b", "c", None])
            rows.append((u, t, eid, attr))
            eid += 1
    # brute force per user over the non-null subsequence
    want = []
    for u in range(8):
        seq = sorted(
            [(t, i, a) for (uu, t, i, a) in rows
             if uu == u and a is not None]
        )
        runs = []
        for t, i, a in seq:
            if runs and runs[-1][0] == a:
                runs[-1][2] += 1
            else:
                runs.append([a, t, 1])
        for j, (a, t, n) in enumerate(runs):
            to = runs[j + 1][1] if j + 1 < len(runs) else None
            want.append((u, a, t, to, n))
    want.sort(key=lambda r: (r[0], r[2], r[1]))

    tbl = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "eid": pa.array([r[2] for r in rows], pa.int64()),
            "attr": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    out = scd2_intervals(
        rd.from_arrow(tbl).repartition(3), "u", "ts", "eid", "attr"
    ).to_pandas()
    got = [
        (
            int(r["u"]), r["attr"], int(r["valid_from_us"]),
            None if pd.isna(r["valid_to_us"]) else int(r["valid_to_us"]),
            int(r["n_events"]),
        )
        for _, r in out.iterrows()
    ]
    assert got == want


def test_scd2_intervals_single_run_and_empty(ray_session):
    import ray.data as rd

    from eschergraph_ray.functions.windows import scd2_intervals

    tbl = pa.table(
        {
            "u": pa.array([5, 5], pa.int64()),
            "ts": pa.array([7, 9], pa.timestamp("us")),
            "eid": pa.array([0, 1], pa.int64()),
            "attr": pa.array(["x", "x"], pa.string()),
        }
    )
    out = scd2_intervals(rd.from_arrow(tbl), "u", "ts", "eid",
                         "attr").to_pandas()
    assert len(out) == 1
    assert out["n_events"][0] == 2 and out["valid_to_us"].isna().all()
    # all-null attr -> zero rows
    tbl2 = pa.table(
        {
            "u": pa.array([1], pa.int64()),
            "ts": pa.array([1], pa.timestamp("us")),
            "eid": pa.array([0], pa.int64()),
            "attr": pa.array([None], pa.string()),
        }
    )
    assert scd2_intervals(rd.from_arrow(tbl2), "u", "ts", "eid",
                          "attr").count() == 0


def test_benford_digits_hand(ray_session):
    import ray.data as rd

    from eschergraph_ray.functions.stats import BENFORD_MICRO, benford_digits

    # cents: 101, 123456, 250, 250, 999, -500 (dropped), 0 (dropped),
    # 0.004 -> 0 cents (dropped); digits: 1, 1, 2, 2, 9
    vals = [1.01, 1234.56, 2.50, 2.50, 9.99, -5.0, 0.0, 0.004]
    tbl = pa.table({"v": pa.array(vals, pa.float64())})
    out = benford_digits(
        rd.from_arrow(tbl).repartition(2), "v"
    ).to_pandas()
    assert list(out["digit"]) == list(range(1, 10))
    obs = dict(zip(out["digit"], out["observed"]))
    assert obs == {1: 2, 2: 2, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 1}
    n = 5
    for _, r in out.iterrows():
        d = int(r["digit"])
        assert int(r["expected_micro"]) == n * BENFORD_MICRO[d]
        assert int(r["dev_micro"]) == (
            1_000_000 * int(r["observed"]) - n * BENFORD_MICRO[d]
        )


def test_benford_digits_empty(ray_session):
    import ray.data as rd

    from eschergraph_ray.functions.stats import benford_digits

    tbl = pa.table({"v": pa.array([], pa.float64())})
    out = benford_digits(rd.from_arrow(tbl), "v").to_pandas()
    # all 9 digits, all zeros
    assert len(out) == 9
    assert (out["observed"] == 0).all()
    assert (out["expected_micro"] == 0).all()


def test_group_quantiles_matches_bruteforce(ray_session):
    import random

    from eschergraph_ray.functions.stats import group_quantiles

    rng = random.Random(13)
    rows = [(rng.choice(["a", "b", "c"]), round(rng.uniform(0, 50), 2))
            for _ in range(400)]
    rows += [("d", 1.0)]  # single-row group
    tbl = pa.table(
        {
            "g": pa.array([r[0] for r in rows], pa.string()),
            "v": pa.array([r[1] for r in rows], pa.float64()),
        }
    )
    out = group_quantiles(
        rd.from_arrow(tbl).repartition(3), "g", "v", p_pcts=(50, 90, 99)
    ).to_pandas()

    def brute(g):
        vals = sorted(round(v * 100) for gg, v in rows if gg == g)
        n = len(vals)
        qs = {}
        for p in (50, 90, 99):
            cum = 0
            for i, v in enumerate(vals):
                cum += 1
                if 100 * cum >= p * n:
                    qs[p] = v
                    break
        return n, qs

    assert list(out["g"]) == ["a", "b", "c", "d"]
    for _, r in out.iterrows():
        n, qs = brute(r["g"])
        assert int(r["n"]) == n
        for p in (50, 90, 99):
            assert int(r[f"p{p}_cents"]) == qs[p], (r["g"], p)


def test_entropy_by_group_hand(ray_session):
    import math

    from eschergraph_ray.functions.stats import entropy_by_group

    # group 'u': uniform over 4 items -> H = ln 4; 'k': constant -> 0
    rows = [("u", i % 4) for i in range(40)] + [("k", 9)] * 7
    rows += [(None, 1), ("u", None)]  # dropped
    tbl = pa.table(
        {
            "g": pa.array([r[0] for r in rows], pa.string()),
            "it": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    out = entropy_by_group(
        rd.from_arrow(tbl).repartition(2), "g", "it"
    ).to_pandas()
    got = {r["g"]: (int(r["n"]), int(r["n_items"]), int(r["h_micro"]))
           for _, r in out.iterrows()}
    assert got["k"] == (7, 1, 0)
    n, items, h = got["u"]
    assert (n, items) == (40, 4)
    assert abs(h - round(math.log(4) * 1e6)) <= 1


def test_approx_distinct_by_group_accuracy(ray_session):
    from eschergraph_ray.functions.sketch import approx_distinct_by_group

    rows = []
    for g, n_distinct in [("a", 500), ("b", 40), ("c", 1)]:
        for i in range(n_distinct):
            rows += [(g, f"{g}-{i}")] * 2  # duplicates must not count
    tbl = pa.table(
        {
            "g": pa.array([r[0] for r in rows], pa.string()),
            "v": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    out = approx_distinct_by_group(
        rd.from_arrow(tbl).repartition(4), "g", "v", p=12
    ).to_pandas()
    got = dict(zip(out["g"], out["approx_n"]))
    assert set(got) == {"a", "b", "c"}
    assert abs(got["a"] - 500) <= 50  # ~1.6% expected error at p=12
    assert abs(got["b"] - 40) <= 6
    assert got["c"] == 1
    # partition-count independence (max-merge is order-free)
    out2 = approx_distinct_by_group(
        rd.from_arrow(tbl).repartition(1), "g", "v", p=12
    ).to_pandas()
    assert out2.equals(out)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="groups"):
        approx_distinct_by_group(
            rd.from_arrow(tbl), "g", "v", p=12, max_groups=1
        )


def test_rank_delta_periods_hand(ray_session):
    from eschergraph_ray.functions.relational import rank_delta_periods

    # period 1 ranks: x(30) 1, y(20) 2, z(10) 3
    # period 3 ranks: z(50) 1, x(25) 2  (y absent -> excluded)
    rows = [
        ("x", 1, 30), ("y", 1, 20), ("z", 1, 10),
        ("z", 3, 50), ("x", 3, 25),
        ("w", 2, 99),  # middle period never compared
    ]
    tbl = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.string()),
            "per": pa.array([r[1] for r in rows], pa.int64()),
            "val": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    out = rank_delta_periods(
        rd.from_arrow(tbl).repartition(2), "k", "per", "val"
    ).to_pandas()
    assert list(out["k"]) == ["z", "x"]  # sorted by delta desc
    z = out.iloc[0]
    assert (int(z["period_a"]), int(z["period_b"])) == (1, 3)
    assert (int(z["rank_a"]), int(z["rank_b"]), int(z["rank_delta"])) == (3, 1, 2)
    x = out.iloc[1]
    assert (int(x["rank_a"]), int(x["rank_b"]), int(x["rank_delta"])) == (1, 2, -1)
    # one-period input -> zero rows
    one = pa.table(
        {
            "k": pa.array(["x"], pa.string()),
            "per": pa.array([1], pa.int64()),
            "val": pa.array([5], pa.int64()),
        }
    )
    assert rank_delta_periods(rd.from_arrow(one), "k", "per", "val").count() == 0
    # driver-state guard is LOUD, not an OOM: 5 cells > max_rows=4
    import pytest

    with pytest.raises(ValueError, match="max_rows"):
        rank_delta_periods(
            rd.from_arrow(tbl), "k", "per", "val", max_rows=4
        )


def test_ohlc_by_group_hand(ray_session):
    from eschergraph_ray.functions.windows import ohlc_by_group

    H = 3_600_000_000  # one hour in us
    # group "a", bucket 0: events at t=10(v=1.5), t=5(v=2.25), t=20(v=0.5)
    #   open = 2.25 (earliest ts), close = 0.5, hi = 2.25e6, lo = 0.5e6
    # group "a", bucket 1: single event v=-1.0000005 (rounds away from 0)
    # group "b", bucket 0: ts TIE at t=7 -> id breaks it (id 10 opens,
    #   id 11 closes)
    rows = [
        ("a", 10, 1, 1.5), ("a", 5, 2, 2.25), ("a", 20, 3, 0.5),
        ("a", H + 1, 4, -1.0000005),
        ("b", 7, 10, 3.0), ("b", 7, 11, 4.0),
    ]
    tbl = pa.table(
        {
            "g": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "eid": pa.array([r[2] for r in rows], pa.int64()),
            "v": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    out = ohlc_by_group(
        rd.from_arrow(tbl).repartition(3), "g", "ts", "eid", "v"
    ).to_pandas()
    got = {
        (r["g"], int(r["bucket"])): (
            int(r["open_micro"]), int(r["high_micro"]),
            int(r["low_micro"]), int(r["close_micro"]), int(r["n_events"])
        )
        for _, r in out.iterrows()
    }
    assert got == {
        ("a", 0): (2_250_000, 2_250_000, 500_000, 500_000, 3),
        # -1.0000005 * 1e6 = -1000000.5 -> half-towards-infinity -> -1000001
        ("a", 1): (-1_000_001, -1_000_001, -1_000_001, -1_000_001, 1),
        ("b", 0): (3_000_000, 4_000_000, 3_000_000, 4_000_000, 2),
    }
    # sorted by (group, bucket)
    key = list(zip(out["g"], out["bucket"]))
    assert key == sorted(key)


def test_hourly_drawdown_hand(ray_session):
    from eschergraph_ray.functions.windows import hourly_drawdown

    H = 3_600_000_000
    # type "a" hourly sums: +10, -4, -3, +5  (micro: x1e6)
    #   cum: 10, 6, 3, 8; runmax: 10, 10, 10, 10
    #   dd:  0, 4, 7, 2 -> max 7 at bucket 2
    # type "b": strictly rising -> dd 0 everywhere, trough = bucket 0
    rows = [
        ("a", 0, 10.0), ("a", 1, -4.0), ("a", 2, -3.0), ("a", 3, 5.0),
        ("b", 0, 1.0), ("b", 1, 2.0),
    ]
    tbl = pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array([r[1] * H + 7 for r in rows],
                           pa.timestamp("us")),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )
    out = hourly_drawdown(
        rd.from_arrow(tbl).repartition(3), "ts", "event_type", "value"
    ).to_pandas()
    got = {
        r["event_type"]: (int(r["max_drawdown_micro"]),
                          int(r["trough_bucket"]), int(r["n_buckets"]))
        for _, r in out.iterrows()
    }
    assert got == {"a": (7_000_000, 2, 4), "b": (0, 0, 2)}
    assert list(out["event_type"]) == ["a", "b"]


# ---------- interarrival_stats ----------


def _ia_events(rows):
    """rows: (event_id, user, type, ts_us)."""
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array(
                    [r[2] for r in rows], pa.string()
                ),
                "ts": pa.array(
                    [r[3] for r in rows], pa.timestamp("us")
                ),
            }
        )
    )


def test_interarrival_hand(ray_session):
    from eschergraph_ray.functions.windows import interarrival_stats

    rows = [
        # user 1 clicks at 0, 10, 40 -> gaps 10, 30
        (1, 1, "click", 0),
        (2, 1, "click", 10),
        (3, 1, "click", 40),
        # user 2 clicks once -> no gap; views at 5, 12 -> gap 7
        (4, 2, "click", 100),
        (5, 2, "view", 5),
        (6, 2, "view", 12),
        # same-ts tie within one stream -> gap 0 (order by id)
        (7, 3, "view", 50),
        (8, 3, "view", 50),
        # null-type rows are dropped on both engines, never crash
        (9, 1, None, 20),
        (10, 1, None, 30),
    ]
    out = interarrival_stats(
        _ia_events(rows), "user_id", "event_type", "ts", "event_id"
    ).to_pandas()
    got = {
        r.event_type: (r.n_gaps, r.sum_gap_us, r.avg_gap_us,
                       r.min_gap_us, r.max_gap_us)
        for r in out.itertuples()
    }
    assert got == {
        "click": (2, 40, 20, 10, 30),
        "view": (2, 7, 3, 0, 7),
    }


def test_interarrival_bucket_invariance_and_sql(ray_session):
    from eschergraph_ray.functions.windows import interarrival_stats

    rng = np.random.default_rng(11)
    n = 800
    rows = list(
        zip(
            range(n),
            rng.integers(0, 37, n).tolist(),
            rng.choice(["a", "b", "c"], n).tolist(),
            rng.integers(0, 10_000, n).tolist(),
        )
    )
    ds = _ia_events(rows)
    r64 = interarrival_stats(
        ds, "user_id", "event_type", "ts", "event_id", num_buckets=64
    ).to_pandas()
    r1 = interarrival_stats(
        _ia_events(rows), "user_id", "event_type", "ts", "event_id",
        num_buckets=1,
    ).to_pandas()
    pd.testing.assert_frame_equal(r64, r1)
    df = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts_us"]
    )
    o = duckdb.sql(
        """
        WITH q AS (
          SELECT event_type,
                 ts_us - lag(ts_us) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts_us, event_id) AS gap
          FROM df
        )
        SELECT event_type, CAST(count(*) AS BIGINT) n_gaps,
               CAST(sum(gap) AS BIGINT) sum_gap_us,
               CAST(sum(gap) // count(*) AS BIGINT) avg_gap_us,
               CAST(min(gap) AS BIGINT) min_gap_us,
               CAST(max(gap) AS BIGINT) max_gap_us
        FROM q WHERE gap IS NOT NULL
        GROUP BY event_type ORDER BY event_type
        """
    ).df()
    pd.testing.assert_frame_equal(r64, o, check_dtype=False)


def test_interarrival_empty_and_validation(ray_session):
    import pytest

    from eschergraph_ray.functions.windows import interarrival_stats

    out = interarrival_stats(
        _ia_events([]), "user_id", "event_type", "ts", "event_id"
    )
    assert out.count() == 0
    with pytest.raises(ValueError, match="power of two"):
        interarrival_stats(
            _ia_events([]), "user_id", "event_type", "ts", "event_id",
            num_buckets=48,
        )
