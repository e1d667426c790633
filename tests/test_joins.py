"""asof_join semantics: backward match, exact-match allowed, inner
drop for rows with no prior right row (DuckDB ASOF JOIN parity)."""

import pyarrow as pa
import ray.data as rd

from eschergraph_ray.functions.joins import asof_join


def _ts(us):
    return pa.array(us, pa.timestamp("us"))


def test_asof_backward_exact_and_inner():
    left = rd.from_arrow(
        pa.table(
            {
                "k": ["a", "a", "a", "b", "c"],
                "lid": [1, 2, 3, 4, 5],
                "t": _ts([100, 200, 300, 50, 10]),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": ["a", "a", "b", "b"],
                "rid": [10, 20, 30, 40],
                "t": _ts([150, 200, 40, 60]),
            }
        )
    )
    out = (
        asof_join(left, right, key="k", left_time="t", right_time="t",
                  left_cols=["lid"], right_cols=["rid"])
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    # lid=1 (t=100): no right row <= 100 for key a -> dropped (inner)
    # lid=2 (t=200): exact match rid=20
    # lid=3 (t=300): latest prior rid=20
    # lid=4 (t=50):  rid=30 (t=40), not rid=40 (t=60)
    # lid=5: key c has no right rows -> dropped
    assert out["lid"].tolist() == [2, 3, 4]
    assert out["rid_right"].tolist() == [20, 20, 30]
    gaps_us = ((out["t"] - out["t_right"]).dt.total_seconds() * 1e6).round()
    assert gaps_us.tolist() == [0.0, 100.0, 10.0]


def test_interval_join_matches_bruteforce():
    """Bucketed range join == brute-force O(n^2) reference, across
    bucket sizes (incl. buckets smaller than the span)."""
    import itertools
    import random

    rng = random.Random(9)
    keys = ["a", "b"]
    lrows = [(rng.choice(keys), i, rng.randint(0, 5000)) for i in range(40)]
    rrows = [(rng.choice(keys), 100 + i, rng.randint(0, 5000)) for i in range(40)]
    LO, HI = -300, 200  # right time in (t-300, t+200]
    want = {
        (lk, lid, rid)
        for (lk, lid, lt), (rk, rid, rt) in itertools.product(lrows, rrows)
        if lk == rk and lt + LO < rt <= lt + HI
    }
    left = rd.from_arrow(
        pa.table(
            {
                "k": [r[0] for r in lrows],
                "lid": [r[1] for r in lrows],
                "t": _ts([r[2] for r in lrows]),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": [r[0] for r in rrows],
                "rid": [r[1] for r in rrows],
                "t": _ts([r[2] for r in rrows]),
            }
        )
    )
    from eschergraph_ray.functions.joins import interval_join

    for bucket in (None, 100, 1000):
        out = interval_join(
            left, right, key="k", left_time="t", right_time="t",
            lo_us=LO, hi_us=HI, left_cols=["lid"], right_cols=["rid"],
            bucket_us=bucket,
        ).to_pandas()
        got = set(map(tuple, out[["k", "lid", "rid_right"]].values))
        assert got == want, bucket


def test_interval_join_hot_key_bounded():
    """Planted hot key: ONE key holding thousands of lefts AND rights in
    a single default-sized (key, bucket) reducer. The searchsorted
    pairing must complete without materializing the nl*nr cross product
    and match a vectorized numpy reference exactly."""
    import numpy as np

    n = 3000
    rng = np.random.default_rng(23)
    lt = rng.integers(0, 1_000_000, size=n)
    rt = rng.integers(0, 1_000_000, size=n)
    LO, HI = -50, 50  # narrow window: output stays sparse
    # numpy brute-force reference (no pandas, no cross DataFrame)
    diff = rt[None, :] - lt[:, None]
    li, ri = np.nonzero((diff > LO) & (diff <= HI))
    want = {(int(li_), int(ri_)) for li_, ri_ in zip(li, ri)}
    left = rd.from_arrow(
        pa.table({"k": ["hot"] * n, "lid": np.arange(n), "t": _ts(lt.tolist())})
    )
    right = rd.from_arrow(
        pa.table({"k": ["hot"] * n, "rid": np.arange(n), "t": _ts(rt.tolist())})
    )
    from eschergraph_ray.functions.joins import interval_join

    out = interval_join(
        left, right, key="k", left_time="t", right_time="t",
        lo_us=LO, hi_us=HI, left_cols=["lid"], right_cols=["rid"],
    ).to_pandas()
    got = set(map(tuple, out[["lid", "rid_right"]].values))
    assert got == want
    assert len(out) == len(want)  # exactly-once: pairs meet in ONE reducer


def test_bucketed_asof_equals_plain():
    """The skew-safe (key, time-bucket) as-of path == the per-key path,
    across bucket sizes — including buckets so small that most matches
    come from the carry pass."""
    import random

    rng = random.Random(17)
    lrows = [(rng.choice(["a", "b", "c"]), i, rng.randint(0, 10_000)) for i in range(60)]
    rrows = [(rng.choice(["a", "b", "c"]), 100 + i, rng.randint(0, 10_000)) for i in range(60)]
    left = rd.from_arrow(
        pa.table(
            {
                "k": [r[0] for r in lrows],
                "lid": [r[1] for r in lrows],
                "t": _ts([r[2] for r in lrows]),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": [r[0] for r in rrows],
                "rid": [r[1] for r in rrows],
                "t": _ts([r[2] for r in rrows]),
            }
        )
    )
    plain = (
        asof_join(left, right, key="k", left_time="t", right_time="t",
                  left_cols=["lid"], right_cols=["rid"])
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    for bucket in (100, 1000, 100_000):
        bucketed = (
            asof_join(left, right, key="k", left_time="t", right_time="t",
                      left_cols=["lid"], right_cols=["rid"], bucket_us=bucket)
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )
        assert bucketed["lid"].tolist() == plain["lid"].tolist(), bucket
        assert bucketed["rid_right"].tolist() == plain["rid_right"].tolist(), bucket


def test_asof_join_list_typed_right_payload(ray_session):
    """Regression: list<float> right payloads crashed the duplicate-ts
    tie-break sort and the bucketed path's NA scan."""
    import pyarrow as pa
    import ray.data as rd

    left = pa.table(
        {
            "k": ["a", "a", "b"],
            "lt": pa.array([10, 30, 20], pa.timestamp("us")),
            "lv": pa.array([1, 2, 3], pa.int64()),
        }
    )
    right = pa.table(
        {
            "k": ["a", "a", "b"],
            "rt": pa.array([5, 25, 15], pa.timestamp("us")),
            "emb": pa.array([[0.1, 0.2], [0.3, 0.4], [0.5, 0.6]]),
        }
    )
    from eschergraph_ray.functions.joins import asof_join

    for bucket in (None, 7):
        out = asof_join(
            rd.from_arrow(left),
            rd.from_arrow(right),
            "k",
            "lt",
            "rt",
            ["lv"],
            ["emb"],
            bucket_us=bucket,
        ).take_all()
        got = {(r["k"], r["lv"]): [round(x, 3) for x in r["emb_right"]] for r in out}
        assert got == {
            ("a", 1): [0.1, 0.2],
            ("a", 2): [0.3, 0.4],
            ("b", 3): [0.5, 0.6],
        }, got
