"""Embedding scalar quantization and per-group z-score — hand-computed
semantics, degenerate inputs, and the DuckDB oracle replays."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from eschergraph_ray.functions.features import (
    group_zscore,
    scalar_quantize_embeddings,
)

SF = "/root/testdata/sf0.001"


def _vec_tbl(ids, vecs):
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float64())
            ),
        }
    )


def test_quantize_hand_computed_and_zero_dim():
    # dim0 absmax 2.0; dim1 absmax 0.5; dim2 all-zero -> q = 0
    ds = rd.from_arrow(
        _vec_tbl([1, 2], [[2.0, -0.25, 0.0], [-1.0, 0.5, 0.0]])
    )
    out = scalar_quantize_embeddings(ds, "vec_id", "embedding").to_pandas()
    got = {(r.vec_id, r.dim): r.q for r in out.itertuples()}
    assert got[(1, 0)] == 127          # 2.0/2.0*127
    assert got[(2, 0)] == -64          # -1/2*127 = -63.5 -> half away
    assert got[(1, 1)] == -64          # -0.25/0.5*127 = -63.5
    assert got[(2, 1)] == 127
    assert got[(1, 2)] == 0 and got[(2, 2)] == 0
    assert len(out) == 6


def test_quantize_bounds_random():
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(40, 16))
    ds = rd.from_arrow(_vec_tbl(list(range(40)), vecs))
    out = scalar_quantize_embeddings(ds, "vec_id", "embedding").to_pandas()
    assert len(out) == 40 * 16
    assert out["q"].abs().max() <= 127
    # the max-|x| element of each dim quantizes to exactly +/-127
    amax_rows = np.abs(vecs).argmax(axis=0)
    for d in range(16):
        q = out[(out.vec_id == amax_rows[d]) & (out.dim == d)]["q"].iloc[0]
        assert abs(q) == 127


def test_quantize_oracle_replay_sf0001():
    ds = rd.read_parquet(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    got = (
        scalar_quantize_embeddings(ds, "vec_id", "embedding")
        .to_pandas()
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(f"""
        WITH el AS (
          SELECT vec_id,
                 CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
                 CAST(unnest(embedding) AS DOUBLE) AS x
          FROM read_parquet('{SF}/embeddings.parquet')
        ),
        mx AS (SELECT dim, max(abs(x)) AS amax FROM el GROUP BY dim)
        SELECT e.vec_id, e.dim,
               CAST(CASE WHEN m.amax = 0 THEN 0
                         ELSE round(e.x / m.amax * 127, 0) END AS BIGINT) AS q
        FROM el e JOIN mx m ON e.dim = m.dim
        ORDER BY e.vec_id, e.dim
    """).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_gram_matrix_hand_computed_and_empty():
    from eschergraph_ray.functions.features import (
        gram_matrix_micro,
        gram_matrix_rows,
    )

    # rows [1.0, 0.5], [-0.5, 0.25] at unit=100 -> q = [[100,50],[-50,25]]
    ds = rd.from_arrow(_vec_tbl([1, 2], [[1.0, 0.5], [-0.5, 0.25]]))
    g = gram_matrix_micro(ds, "embedding", unit=100)
    q = np.array([[100, 50], [-50, 25]], dtype=np.int64)
    assert (g == q.T @ q).all()
    rows = gram_matrix_rows(ds, "embedding", unit=100).to_pandas()
    assert len(rows) == 4
    got = {(r.dim_i, r.dim_j): r.g for r in rows.itertuples()}
    assert got[(0, 1)] == got[(1, 0)] == 100 * 50 + (-50) * 25
    # empty input -> 0x0 matrix, empty rows
    empty = rd.from_arrow(_vec_tbl([], []))
    assert gram_matrix_micro(empty, "embedding").shape == (0, 0)
    assert gram_matrix_rows(empty, "embedding").take_all() == []


def _ev_tbl(rows):
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }
    )


def test_zscore_hand_computed_and_degenerate():
    rows = [
        (1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0),  # mean 2, pop std sqrt(2/3)
        (4, "b", 5.0),                                  # singleton -> 0
        (5, "c", 4.0), (6, "c", 4.0),                   # zero variance -> 0
    ]
    out = (
        group_zscore(rd.from_arrow(_ev_tbl(rows)), "event_type", "event_id",
                     "value")
        .to_pandas()
        .set_index("event_id")
    )
    import pyarrow.compute as _pc

    sd = np.sqrt((100**2 + 200**2 + 300**2) / 3 - 200.0**2)
    want1 = (
        _pc.round(
            pa.scalar((100 - 200.0) / sd * 1e4),
            ndigits=0,
            round_mode="half_towards_infinity",
        ).as_py()
        / 1e4
    )
    assert out.loc[1, "z"] == want1
    assert out.loc[2, "z"] == 0.0
    assert out.loc[3, "z"] == -want1
    assert out.loc[4, "z"] == 0.0
    assert out.loc[5, "z"] == 0.0 and out.loc[6, "z"] == 0.0


def test_zscore_oracle_replay_sf0001():
    ds = rd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "event_type", "value"]
    )
    got = (
        group_zscore(ds, "event_type", "event_id", "value", cents=100)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = duckdb.connect().execute(f"""
        WITH c AS (
          SELECT event_id, event_type,
                 CAST(round(value * 100, 0) AS BIGINT) AS xc
          FROM read_parquet('{SF}/events.parquet')
        ),
        st AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(xc) AS BIGINT) AS s,
                 CAST(sum(xc * xc) AS BIGINT) AS ss
          FROM c GROUP BY event_type
        )
        SELECT c.event_id, c.event_type,
               CASE WHEN st.n > 1
                         AND (CAST(st.ss AS DOUBLE) / st.n
                              - (CAST(st.s AS DOUBLE) / st.n)
                                * (CAST(st.s AS DOUBLE) / st.n)) > 0
                    THEN round((c.xc - CAST(st.s AS DOUBLE) / st.n)
                               / sqrt(CAST(st.ss AS DOUBLE) / st.n
                                      - (CAST(st.s AS DOUBLE) / st.n)
                                        * (CAST(st.s AS DOUBLE) / st.n))
                               * 1e4, 0) / 1e4
                    ELSE 0 END AS z
        FROM c JOIN st USING (event_type)
        ORDER BY event_id
    """).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )
    # standardized: each group's z mean ~0 and pop-std ~1
    g = got.groupby("event_type")["z"]
    assert (g.mean().abs() < 1e-3).all()
    assert ((g.std(ddof=0) - 1).abs() < 1e-2).all()

# ---------- grouped vector sums ----------


def test_group_vector_sums_hand_and_partition_invariance(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.features import group_vector_sums

    t = pa.table(
        {
            "k": [1, 1, 2],
            "v": [[0.5, -1.0], [0.25, 2.0], [1.0, 1.0]],
        }
    )

    def run(blocks):
        ds = rd.from_arrow(t)
        if blocks > 1:
            ds = ds.repartition(blocks)
        return {
            (r["k"], r["dim"]): (r["n"], r["sum_micro"])
            for r in group_vector_sums(ds, "k", "v").take_all()
        }

    out = run(1)
    assert out[(1, 1)] == (2, 750_000)
    assert out[(1, 2)] == (2, 1_000_000)
    assert out[(2, 1)] == (1, 1_000_000)
    assert out == run(3)  # partial combine is partitioning-invariant


def test_knn_label_agreement_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.features import knn_label_agreement

    # v1 (label 0): neighbors labeled 0,0,1 -> majority 0, agree
    # v2 (label 1): neighbors labeled 0,0   -> majority 0, disagree
    # v3 (label 0): neighbors labeled 0,1 (tie) -> smallest label 0, agree
    # v4 (label 2): no neighbors -> excluded
    knn = rd.from_arrow(
        pa.table(
            {
                "vec_id": [1, 1, 1, 2, 2, 3, 3],
                "neighbor_id": [10, 11, 12, 10, 11, 10, 12],
            }
        )
    )
    labels = rd.from_arrow(
        pa.table(
            {
                "vec_id": [1, 2, 3, 4, 10, 11, 12],
                "label": [0, 1, 0, 2, 0, 0, 1],
            }
        )
    )
    out = {
        r["label"]: (r["n"], r["n_agree"])
        for r in knn_label_agreement(
            knn, labels, "vec_id", "neighbor_id", "label"
        ).take_all()
    }
    assert out == {0: (2, 2), 1: (1, 0)}


def test_top_direction_power_hand_computed():
    from eschergraph_ray.functions.features import top_direction_power

    ds = rd.from_arrow(pa.table({
        "embedding": [[2.0, 0.0], [2.0, 0.0], [0.0, 1.0]],
    }))
    out = top_direction_power(ds, "embedding", iters=3).to_pandas()
    # Gram/1e12 = [[8,0],[0,1]]; each matvec scales dim1 down by 8:
    # 1e6 -> 125000 -> 15625 -> 1953.125 (rounds half-inf to 1953)
    assert list(out["dim"]) == [0, 1]
    assert list(out["v_micro"]) == [1_000_000, 1953]


def test_top_direction_power_matches_eigh():
    import numpy as np

    from eschergraph_ray.functions.features import top_direction_power

    rng = np.random.default_rng(7)
    base = rng.normal(size=(200, 8))
    base[:, 2] *= 6.0  # dominant axis
    ds = rd.from_arrow(pa.table({"embedding": base.tolist()}))
    out = top_direction_power(ds, "embedding", iters=8).to_pandas()
    v = out["v_micro"].to_numpy().astype(float)
    v /= np.linalg.norm(v)
    g = (base.T @ base)
    w, vecs = np.linalg.eigh(g)
    top = vecs[:, -1]
    assert abs(float(v @ top)) > 0.999


def test_top_direction_power_empty():
    from eschergraph_ray.functions.features import top_direction_power

    ds = rd.from_arrow(pa.table({
        "embedding": pa.array([], pa.list_(pa.float32())),
    }))
    assert top_direction_power(ds, "embedding").count() == 0


def test_variance_explained_top_two_axis():
    from eschergraph_ray.functions.features import variance_explained_top

    ds = rd.from_arrow(pa.table({
        "embedding": [[2.0, 0.0], [2.0, 0.0], [0.0, 1.0]],
    }))
    out = variance_explained_top(ds, "embedding", iters=3).to_pandas()
    assert out.iloc[0]["d"] == 2
    # G/1e12 = [[8,0],[0,1]] -> top axis carries ~8/9 of the trace
    assert 880_000 < out.iloc[0]["explained_micro"] < 895_000
