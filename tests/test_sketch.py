"""HyperLogLog approximate distinct: accuracy vs exact counts,
merge/partitioning invariance, determinism."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from eschergraph_ray.functions.sketch import (
    _fold,
    _hash64,
    approx_distinct,
    hll_estimate,
)


def _ids_ds(values, blocks=1):
    tbl = pa.table({"v": pa.array([str(v) for v in values], pa.string())})
    ds = rd.from_arrow(tbl)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_fold_rank_hand_values():
    p = 12
    # hash with ALL remaining bits zero -> max rank 53 at its register
    h = np.array([np.uint64(5) << np.uint64(52)], np.uint64)
    regs = _fold(h, p)
    assert regs[5] == 64 - p + 1
    # top remaining bit set -> rank 1
    h = np.array([(np.uint64(5) << np.uint64(52)) | (np.uint64(1) << np.uint64(51))], np.uint64)
    assert _fold(h, p)[5] == 1
    # lowest bit set -> rank 52
    h = np.array([(np.uint64(5) << np.uint64(52)) | np.uint64(1)], np.uint64)
    assert _fold(h, p)[5] == 52


@pytest.mark.parametrize("n", [100, 5_000, 100_000])
def test_accuracy_within_three_sigma(n):
    # p=12 -> sigma ~ 1.625%; allow 3 sigma + small-n slack
    est = hll_estimate(_fold(_hash64([f"v{i}" for i in range(n)]), 12), 12)
    assert abs(est - n) / n < 0.05


def test_duplicates_do_not_inflate():
    vals = [f"v{i % 500}" for i in range(20_000)]
    est = hll_estimate(_fold(_hash64(vals), 12), 12)
    assert abs(est - 500) / 500 < 0.05


def test_partition_invariance_and_determinism():
    vals = [f"u{i}" for i in range(3_000)]
    a = approx_distinct(_ids_ds(vals, blocks=1), "v")
    b = approx_distinct(_ids_ds(vals, blocks=7), "v")
    c = approx_distinct(_ids_ds(list(reversed(vals)), blocks=3), "v")
    assert a == b == c  # max-merge: order/partitioning independent


def test_merge_equals_single_fold():
    vals = [f"x{i}" for i in range(2_000)]
    h = _hash64(vals)
    whole = _fold(h, 12)
    merged = np.maximum(_fold(h[:700], 12), _fold(h[700:], 12))
    assert np.array_equal(whole, merged)


def test_p_bounds():
    with pytest.raises(ValueError, match="p must be"):
        approx_distinct(_ids_ds(["a"]), "v", p=3)


def test_documents_cardinality_sf0001():
    ds = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    )
    est = approx_distinct(ds, "doc_id")
    assert abs(est - 500) / 500 < 0.08


# ---------- Count-Min sketch ----------

from eschergraph_ray.functions.sketch import (  # noqa: E402
    _cms_hash,
    cms_build,
    cms_query,
)


def test_cms_never_underestimates_and_heavy_hitters():
    rng = np.random.default_rng(5)
    # zipf-ish corpus: token i appears ~ N / (i+1) times
    vals = []
    for i in range(200):
        vals.extend([f"tok{i}"] * (2000 // (i + 1)))
    rng.shuffle(vals)
    ds = _ids_ds(vals, blocks=4)
    mat = cms_build(ds, "v", w=2048, d=4)
    import collections

    true = collections.Counter(vals)
    probe = [f"tok{i}" for i in range(20)]
    est = cms_query(mat, probe)
    n = len(vals)
    for t, e in zip(probe, est):
        assert e >= true[t]                      # one-sided guarantee
        assert e <= true[t] + (np.e / 2048) * n + 1  # CM bound (w.h.p.)
    # heavy hitters keep their rank order at the top
    top_true = [t for t, _ in true.most_common(5)]
    order = sorted(probe, key=lambda t: -cms_query(mat, [t])[0])[:5]
    assert set(order) == set(top_true)


def test_cms_merge_equals_single_fold():
    vals = [f"v{i % 37}" for i in range(500)]
    m1 = cms_build(_ids_ds(vals, blocks=1), "v", w=256, d=3)
    m4 = cms_build(_ids_ds(vals, blocks=7), "v", w=256, d=3)
    assert (m1 == m4).all()
    # and equals a direct driver-side fold
    direct = np.zeros((3, 256), np.int64)
    for row in range(3):
        np.add.at(direct[row], _cms_hash([str(v) for v in vals], row, 256), 1)
    assert (m1 == direct).all()


def test_cms_total_mass_per_row():
    vals = [str(i) for i in range(321)]
    mat = cms_build(_ids_ds(vals), "v", w=64, d=2)
    assert (mat.sum(axis=1) == 321).all()


def test_replay_estimator_tracks_float_estimator():
    from eschergraph_ray.functions.sketch import hll_estimate_replay

    for n in (50, 3_000, 60_000):
        regs = _fold(_hash64([f"r{i}" for i in range(n)], "md5"), 12)
        zeros, est = hll_estimate_replay(regs, 12)
        assert zeros == int(np.count_nonzero(regs == 0))
        # replay estimator and float estimator agree far inside the
        # sketch's own ~1.6% error
        assert abs(est - hll_estimate(regs, 12)) <= max(2, n // 200)
        assert abs(est - n) / n < 0.06


def test_approx_distinct_multi_fused_pass(ray_session):
    from eschergraph_ray.functions.sketch import approx_distinct_multi

    n = 4_000
    tbl = pa.table(
        {
            "a": pa.array([f"a{i}" for i in range(n)], pa.string()),
            "b": pa.array([f"b{i % 7}" for i in range(n)], pa.string()),
        }
    )
    out = approx_distinct_multi(
        rd.from_arrow(tbl).repartition(5), {"a": 12, "b": 12}
    )
    got = {r["column"]: r["approx_n"] for r in out.to_pylist()}
    assert got["b"] == 7  # linear counting is exact this small
    assert abs(got["a"] - n) / n < 0.05


def test_cms_md5_flavor_matches_guarantees(ray_session):
    from eschergraph_ray.functions.sketch import cms_build, cms_query

    vals = [f"t{i % 37}" for i in range(5_000)] + ["hot"] * 800
    ds = _ids_ds(vals, blocks=6)
    mat = cms_build(ds, "v", w=64, d=3, hashname="md5")
    probe = [f"t{i}" for i in range(37)] + ["hot", "absent"]
    est = cms_query(mat, probe, hashname="md5")
    from collections import Counter

    true = Counter(vals)
    for t, e in zip(probe, est):
        assert e >= true[t]  # never underestimates
    assert mat.sum() == 3 * len(vals)


# ---- Bloom filter ------------------------------------------------------


def test_bloom_no_false_negatives_and_merge(ray_session):
    from eschergraph_ray.functions.sketch import bloom_build, bloom_probe

    members = [f"member-{i}" for i in range(200)]
    others = [f"other-{i}" for i in range(200)]
    bits1 = bloom_build(_ids_ds(members, blocks=1), "v", m=1 << 10, k=2)
    bits7 = bloom_build(_ids_ds(members, blocks=7), "v", m=1 << 10, k=2)
    # OR-merge is partitioning-invariant
    assert (bits1 == bits7).all()
    out = (
        bloom_probe(_ids_ds(members + others), "v", bits1, k=2)
        .to_pandas()
        .set_index("v")["maybe_member"]
    )
    # every member flagged (no false negatives)
    assert all(out[m] == 1 for m in members)
    # small filter -> SOME false positives exist, but far from all
    fp = sum(out[o] for o in others)
    assert 0 < fp < len(others) * 3 // 4
    # determinism: a second probe run returns identical flags
    out2 = (
        bloom_probe(_ids_ds(members + others), "v", bits1, k=2)
        .to_pandas()
        .set_index("v")["maybe_member"]
    )
    assert (out.sort_index() == out2.sort_index()).all()


def test_bloom_md5_flavor_matches_duckdb_bits(ray_session):
    """The md5 bit positions replay in DuckDB — the device the
    docs_oov_bloom oracle relies on."""
    import duckdb
    import numpy as np

    from eschergraph_ray.functions.sketch import _cms_hash, bloom_build

    vals = [f"tok-{i}" for i in range(50)]
    m, k = 1 << 10, 2
    bits = bloom_build(_ids_ds(vals), "v", m=m, k=k, hashname="md5")
    set_pos = {
        int(p)
        for p in np.flatnonzero(
            np.unpackbits(bits, bitorder="little")
        )
    }
    con = duckdb.connect()
    sql_pos = {
        r[0]
        for r in con.execute(
            f"""SELECT DISTINCT CAST(CAST(concat('0x',
                    substr(md5(concat(i, ':', v)), 1, 16)) AS UBIGINT)
                    % {m} AS BIGINT)
                FROM (SELECT unnest($vals) AS v)
                CROSS JOIN (SELECT unnest([0, 1]) AS i)""",
            {"vals": vals},
        ).fetchall()
    }
    assert set_pos == sql_pos


def test_bloom_param_validation():
    from eschergraph_ray.functions.sketch import bloom_partials

    with pytest.raises(ValueError):
        bloom_partials(None, "v", m=1000)  # not a power of two
    with pytest.raises(ValueError):
        bloom_partials(None, "v", k=0)


# ---------- hll_set_algebra ----------


def test_hll_set_algebra_known_overlap(ray_session):
    import ray.data as rd

    from eschergraph_ray.functions.sketch import (
        approx_distinct_by_group, hll_set_algebra,
    )

    # A = 0..2999, B = 2000..4999 -> true |A|=3000 |B|=3000 |A∪B|=5000
    rows_a = [("A", i) for i in range(3000)]
    rows_b = [("B", i) for i in range(2000, 5000)]
    tbl = pa.table(
        {
            "g": pa.array([r[0] for r in rows_a + rows_b], pa.string()),
            "v": pa.array([r[1] for r in rows_a + rows_b], pa.int64()),
        }
    )
    out = hll_set_algebra(
        rd.from_arrow(tbl), "g", "v", "A", "B", p=12
    ).to_pydict()
    ea, eb = out["approx_a"][0], out["approx_b"][0]
    eu, ei = out["approx_union"][0], out["approx_intersection"][0]
    # within the sketch's ~1.6% band (p=12), generous 10% test bound
    assert abs(ea - 3000) < 300 and abs(eb - 3000) < 300
    assert abs(eu - 5000) < 500
    assert abs(ei - 1000) < 500
    assert ei == ea + eb - eu
    # per-group estimates agree with the md5-replay group estimator
    byg = approx_distinct_by_group(
        rd.from_arrow(tbl), "g", "v", p=12
    ).to_pydict()
    assert dict(zip(byg["g"], byg["approx_n"])) == {"A": ea, "B": eb}


def test_hll_set_algebra_idempotent_and_absent(ray_session):
    import ray.data as rd

    from eschergraph_ray.functions.sketch import hll_set_algebra

    tbl = pa.table(
        {
            "g": pa.array(["A"] * 500, pa.string()),
            "v": pa.array(list(range(500)), pa.int64()),
        }
    )
    # B absent: |B| = 0, union == A, intersection == 0
    out = hll_set_algebra(
        rd.from_arrow(tbl), "g", "v", "A", "B", p=12
    ).to_pydict()
    assert out["approx_b"][0] == 0
    assert out["approx_union"][0] == out["approx_a"][0]
    assert out["approx_intersection"][0] == 0


# ---------- content_checksum ----------


def test_content_checksum_invariance_and_sensitivity(ray_session):
    import ray.data as rd

    from eschergraph_ray.functions.sketch import content_checksum

    tbl = pa.table(
        {
            "id": pa.array(list(range(100)), pa.int64()),
            "t": pa.array([f"row {i}" for i in range(100)], pa.string()),
        }
    )
    base = content_checksum(rd.from_arrow(tbl), ["id", "t"]).to_pydict()
    assert base["n_rows"] == [100]
    # partitioning / order invariance
    many = content_checksum(
        rd.from_arrow(tbl).repartition(7), ["id", "t"]
    ).to_pydict()
    shuffled = content_checksum(
        rd.from_arrow(tbl.take(list(reversed(range(100))))), ["id", "t"]
    ).to_pydict()
    assert many == base and shuffled["xor_checksum"] == base["xor_checksum"]
    # one changed byte flips it; a dropped row flips it
    mut = tbl.set_column(1, "t", pa.array(
        ["row 0!"] + [f"row {i}" for i in range(1, 100)], pa.string()))
    assert content_checksum(
        rd.from_arrow(mut), ["id", "t"]
    ).to_pydict()["xor_checksum"] != base["xor_checksum"]
    assert content_checksum(
        rd.from_arrow(tbl.slice(0, 99)), ["id", "t"]
    ).to_pydict()["xor_checksum"] != base["xor_checksum"]


def test_content_checksum_duckdb_and_nulls(ray_session):
    import duckdb
    import ray.data as rd

    from eschergraph_ray.functions.sketch import content_checksum

    tbl = pa.table(
        {
            "id": pa.array([1, 2, None], pa.int64()),
            "t": pa.array(["a", None, "c"], pa.string()),
        }
    )
    got = content_checksum(rd.from_arrow(tbl), ["id", "t"]).to_pydict()
    # query the ARROW table directly: to_pandas would float-ify the
    # nullable int64 ('1.0' vs '1') and break the varchar cast parity
    o = duckdb.sql(
        """
        SELECT CAST(count(*) AS BIGINT) n_rows,
               CAST(bit_xor(CAST(concat('0x', substr(md5(concat(
                    coalesce(CAST(id AS VARCHAR), 'NULL'), ':',
                    coalesce(t, 'NULL'))), 1, 15)) AS BIGINT))
                    AS BIGINT) xor_checksum
        FROM tbl
        """
    ).df()
    assert got["n_rows"][0] == int(o["n_rows"][0])
    assert got["xor_checksum"][0] == int(o["xor_checksum"][0])


def test_hll_sliding_merge_equals_union(ray_session):
    """Window estimate == single-shot estimate of the unioned values
    (max-merge losslessness), and disjoint day populations show up in
    the window union."""
    import ray.data as rd

    from eschergraph_ray.functions.sketch import (
        approx_distinct_by_group,
        hll_sliding_distinct,
    )

    DAY = 86_400_000_000
    # day 0: users 0..999; day 3: users 500..1499; day 20: users 0..99
    rows = (
        [(0, u) for u in range(1000)]
        + [(3 * DAY, u) for u in range(500, 1500)]
        + [(20 * DAY, u) for u in range(100)]
    )
    tbl = pa.table({
        "ts": pa.array(
            np.array([r[0] for r in rows], "datetime64[us]")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
    })
    out = hll_sliding_distinct(
        rd.from_arrow(tbl), "user_id", "ts", window_days=7, p=12
    ).to_pydict()
    got = dict(zip(out["day_idx"], out["approx_n"]))
    assert set(got) == {0, 3, 20}

    # single-shot estimates of the exact same unions
    flag = pa.table({
        "g": pa.array(
            ["d0"] * 1000 + ["d03"] * 2000,
            pa.string()),
        "v": pa.array(
            list(range(1000)) + list(range(1000)) +
            list(range(500, 1500)),
            pa.int64()),
    })
    ref = approx_distinct_by_group(
        rd.from_arrow(flag), "g", "v", p=12
    ).to_pydict()
    refd = dict(zip(ref["g"], ref["approx_n"]))
    assert got[0] == refd["d0"]          # window {day 0}
    assert got[3] == refd["d03"]         # window {day 0, day 3} union
    # true union 0..1499 = 1500; p=12 keeps the estimate within ~5%
    assert abs(got[3] - 1500) < 120
    assert abs(got[20] - 100) < 15       # day 20's window sees only itself


def test_hll_sliding_validation(ray_session):
    import ray.data as rd

    from eschergraph_ray.functions.sketch import hll_sliding_distinct

    tbl = pa.table({
        "ts": pa.array(np.array([0], "datetime64[us]")),
        "user_id": pa.array([1], pa.int64()),
    })
    with pytest.raises(ValueError, match="window_days"):
        hll_sliding_distinct(rd.from_arrow(tbl), "user_id", "ts",
                             window_days=0)
    with pytest.raises(ValueError, match="p must be"):
        hll_sliding_distinct(rd.from_arrow(tbl), "user_id", "ts", p=2)
