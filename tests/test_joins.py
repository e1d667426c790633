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
