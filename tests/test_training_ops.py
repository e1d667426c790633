"""Round-4 training-data operators: stratified sampling, BM25 ranking,
distributed connected components — unit semantics plus DuckDB oracle
replays (the same comparisons the driver harness runs)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from eschergraph_ray.functions.components import connected_components
from eschergraph_ray.functions.ranking import bm25_topk
from eschergraph_ray.functions.sampling import stratified_sample

SF = "/root/testdata/sf0.001"


# ---------- connected components ----------


def _cc(pairs):
    t = pa.table(
        {
            "id_a": pa.array([a for a, _ in pairs], pa.int64()),
            "id_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    out = connected_components(rd.from_arrow(t), "id_a", "id_b").take_all()
    return {r["doc_id"]: r["component_id"] for r in out}


def test_cc_chain_needs_propagation():
    # a 9-node path: min-label must walk the whole diameter, so this
    # exercises the multi-round loop, not just the fused init step
    labels = _cc([(i, i + 1) for i in range(8)])
    assert labels == {i: 0 for i in range(9)}


def test_cc_two_components_and_canonical_min():
    labels = _cc([(5, 9), (9, 7), (20, 30), (30, 25), (25, 21)])
    assert labels == {5: 5, 9: 5, 7: 5, 20: 20, 30: 20, 25: 20, 21: 20}


def test_cc_empty_pairs():
    t = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )
    out = connected_components(rd.from_arrow(t), "id_a", "id_b")
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "component_id"}


def test_cc_fallback_path_equals_broadcast_path():
    # broadcast_labels_below=0 forces the unbounded tagged-union path;
    # both paths must reach the identical fixed point
    pairs = [(i, i + 1) for i in range(8)] + [(20, 30), (30, 25)]
    t = pa.table(
        {
            "id_a": pa.array([a for a, _ in pairs], pa.int64()),
            "id_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    fast = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(rd.from_arrow(t), "id_a", "id_b").take_all()
    }
    slow = {
        r["doc_id"]: r["component_id"]
        for r in connected_components(
            rd.from_arrow(t), "id_a", "id_b", broadcast_labels_below=0
        ).take_all()
    }
    assert fast == slow == {**{i: 0 for i in range(9)}, 20: 20, 30: 20, 25: 20}


def test_cc_matches_recursive_sql_closure():
    # random-ish sparse graph vs the DuckDB recursive-CTE closure —
    # the same oracle shape the dedup_components driver entry uses
    pairs = [(i, (i * 7 + 3) % 40) for i in range(0, 40, 3) if i != (i * 7 + 3) % 40]
    got = _cc(pairs)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p (id_a BIGINT, id_b BIGINT)"
    )
    con.executemany("INSERT INTO p VALUES (?, ?)", pairs)
    want = dict(
        con.execute(
            """
            WITH RECURSIVE edges AS (
              SELECT id_a AS src, id_b AS dst FROM p
              UNION SELECT id_b, id_a FROM p
            ),
            reach AS (
              SELECT src AS id, src AS lbl FROM edges
              UNION
              SELECT e.dst AS id, r.lbl AS lbl
              FROM reach r JOIN edges e ON e.src = r.id
            )
            SELECT id, min(lbl) FROM reach GROUP BY id
            """
        ).fetchall()
    )
    assert got == want


# ---------- stratified sampling ----------


def _strat_table(n):
    langs = ["en", "zh", "es", "de", "fr"]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "lang": pa.array([langs[i % 5] for i in range(n)], pa.string()),
        }
    )


def test_stratified_sample_rates_and_default():
    t = _strat_table(5000)
    fr = {"en": 0.1, "de": 1.0, "fr": 0.5}
    out = stratified_sample(
        rd.from_arrow(t), "doc_id", "lang", fr, default_fraction=0.0
    ).take_all()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    # default 0.0: unlisted strata contribute nothing
    assert "zh" not in by_lang and "es" not in by_lang
    assert len(by_lang["de"]) == 1000  # fraction 1.0 keeps everything
    assert 0.05 < len(by_lang["en"]) / 1000 < 0.16
    assert 0.4 < len(by_lang["fr"]) / 1000 < 0.6


def test_stratified_sample_block_invariant_and_nested_in_hash_sample():
    t = _strat_table(2000)
    fr = {"en": 0.3, "zh": 0.7}
    a = sorted(
        r["doc_id"]
        for r in stratified_sample(rd.from_arrow(t), "doc_id", "lang", fr).take_all()
    )
    b = sorted(
        r["doc_id"]
        for r in stratified_sample(
            rd.from_arrow(t).repartition(9), "doc_id", "lang", fr
        ).take_all()
    )
    assert a == b
    # lowering a stratum's rate only REMOVES rows (nested samples):
    # the same hash-threshold device means 0.3 ⊂ 0.7 per stratum
    small = {
        r["doc_id"]
        for r in stratified_sample(
            rd.from_arrow(t), "doc_id", "lang", {"en": 0.1, "zh": 0.2}
        ).take_all()
    }
    assert small <= set(a)


def test_stratified_sample_oracle_sf0001():
    import __ray_entry__ as E

    r = E.queries()["docs_stratified_sample"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    o = con.execute(E.oracle_sql()["docs_stratified_sample"]).df()
    pd.testing.assert_frame_equal(
        r.sort_values(["doc_id"]).reset_index(drop=True),
        o.sort_values(["doc_id"]).reset_index(drop=True),
        check_dtype=False,
    )


# ---------- grouped percentiles ----------


def test_grouped_percentiles_hand_check_and_nulls():
    from eschergraph_ray.functions.textstats import grouped_int_percentiles

    t = pa.table(
        {
            "g": ["a"] * 4 + ["b"] * 5 + ["a"],
            "v": pa.array([1, 2, 3, 4, 10, 20, 30, 40, 50, None], pa.int64()),
        }
    )
    out = {
        r["g"]: r
        for r in grouped_int_percentiles(rd.from_arrow(t), "g", "v").take_all()
    }
    # group a: values 1,2,3,4 (null dropped) -> quantile_disc picks
    # smallest value with cum_count >= p*n: p25->1, p50->2, p75->3
    assert (out["a"]["p25"], out["a"]["p50"], out["a"]["p75"]) == (1, 2, 3)
    assert out["a"]["n"] == 4
    # group b: 10..50 -> p25=20 (cum 2 >= 1.25), p50=30, p75=40
    assert (out["b"]["p25"], out["b"]["p50"], out["b"]["p75"]) == (20, 30, 40)
    assert out["b"]["n"] == 5


def test_events_value_quantiles_oracle_sf0001():
    import __ray_entry__ as E

    r = E.queries()["events_value_quantiles"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    o = con.execute(E.oracle_sql()["events_value_quantiles"]).df()
    pd.testing.assert_frame_equal(
        r.sort_values("event_type").reset_index(drop=True),
        o.sort_values("event_type").reset_index(drop=True),
        check_dtype=False,
    )


# ---------- BM25 ----------


def test_bm25_ranks_term_frequency_and_filters_zero():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "spark spark spark engine",
                "spark engine",
                "plain text only",
                "spark spark engine engine filler filler filler filler filler",
            ],
        }
    )
    out = bm25_topk(rd.from_arrow(t), "doc_id", "text", ["spark"], k=10).take_all()
    ids = [r["doc_id"] for r in out]
    assert 3 not in ids  # score 0 rows never qualify
    assert ids[0] == 1  # highest tf, short doc
    # doc 2 (tf=1, short) outranks doc 4's long-doc normalization? BM25
    # says no: doc 4 has tf=2 but 9 tokens; verify the length penalty
    # is applied at all (scores strictly ordered, no ties)
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert len(set(scores)) == len(scores)


def test_bm25_k_cap_and_tiebreak():
    t = pa.table(
        {
            "doc_id": pa.array(range(20), pa.int64()),
            "text": ["same words here"] * 20,
        }
    )
    out = bm25_topk(rd.from_arrow(t), "doc_id", "text", ["words"], k=5).take_all()
    # identical docs -> identical scores -> id ascending tie-break
    assert [r["doc_id"] for r in out] == [0, 1, 2, 3, 4]


def test_bm25_oracle_sf0001():
    import __ray_entry__ as E

    r = E.queries()["docs_bm25_topk"](SF).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    o = con.execute(E.oracle_sql()["docs_bm25_topk"]).df()
    pd.testing.assert_frame_equal(
        r.reset_index(drop=True), o.reset_index(drop=True), check_dtype=False,
        check_exact=True,
    )


def test_rrf_fuse_semantics():
    import math

    from eschergraph_ray.functions.ranking import rrf_fuse

    out = rrf_fuse(
        {"bm25": [7, 3, 9], "ann": [3, 11]}, k0=60
    ).to_pydict()
    rows = {
        d: (rb, ra, s)
        for d, rb, ra, s in zip(
            out["doc_id"], out["r_bm25"], out["r_ann"], out["rrf_nano"]
        )
    }
    # doc 3: rank 2 in bm25, rank 1 in ann -> both terms
    both = (1 / 62 + 1 / 61) * 1e9
    assert rows[3] == (2, 1, math.floor(both + 0.5))
    # doc 7: bm25 only (rank 1); absent rank sentinel is 0
    assert rows[7] == (1, 0, math.floor(1 / 61 * 1e9 + 0.5))
    # doc 11: ann only (rank 2)
    assert rows[11] == (0, 2, math.floor(1 / 62 * 1e9 + 0.5))
    # ordering: fused score desc, then id
    assert out["doc_id"][0] == 3
    assert out["rrf_nano"] == sorted(out["rrf_nano"], reverse=True)


def test_partitioned_component_histogram(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.components import (
        partitioned_component_histogram,
    )

    # conv A: path x-y-z (size 3) + pair p-q (size 2);
    # conv B: pair x-y (size 2 — same names, DIFFERENT partition);
    # conv C: triangle a-b-c (size 3)
    rows = [
        ("A", "x", "y"), ("A", "y", "z"), ("A", "p", "q"),
        ("B", "x", "y"),
        ("C", "a", "b"), ("C", "b", "c"), ("C", "c", "a"),
    ]
    t = pa.table({
        "conv": pa.array([r[0] for r in rows], pa.string()),
        "fa": pa.array([r[1] for r in rows], pa.string()),
        "fb": pa.array([r[2] for r in rows], pa.string()),
    })
    out = partitioned_component_histogram(
        rd.from_arrow(t), "fa", "fb", "conv"
    ).to_pandas()
    got = dict(zip(out["component_size"], out["n_components"]))
    assert got == {2: 2, 3: 2}
    # bucket count must not change the answer (many parts per bucket)
    out2 = partitioned_component_histogram(
        rd.from_arrow(t), "fa", "fb", "conv", n_buckets=2
    ).to_pandas()
    assert dict(zip(out2["component_size"], out2["n_components"])) == got


def test_dedup_best_survivors_keeps_longest(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.components import dedup_best_survivors

    # cluster {1,2,3}: doc 2 is longest -> keep 2, drop 1 and 3;
    # doc 4 never paired -> kept. Tie cluster {5,6}: equal quality ->
    # min id 5 kept.
    comps = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 5, 6], pa.int64()),
        "component_id": pa.array([1, 1, 1, 5, 5], pa.int64()),
    }))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "n_chars": pa.array([10, 99, 10, 1, 7, 7], pa.int64()),
    }))
    out = dedup_best_survivors(docs, comps, "doc_id", "n_chars")
    assert sorted(r["doc_id"] for r in out.take_all()) == [2, 4, 5]


def test_dedup_best_survivors_guard_and_empty(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from eschergraph_ray.functions.components import dedup_best_survivors

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "n_chars": pa.array([1, 1 << 30], pa.int64()),
    }))
    empty = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "component_id": pa.array([], pa.int64()),
    }))
    # no clusters -> identity
    out = dedup_best_survivors(docs, empty, "doc_id", "n_chars")
    assert out.count() == 2
    comps = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "component_id": pa.array([1, 1], pa.int64()),
    }))
    with pytest.raises(Exception, match="2\\^29"):
        dedup_best_survivors(docs, comps, "doc_id",
                             "n_chars").take_all()


def test_dup_rate_by_source_hand_case(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.dedup import dup_rate_by_source

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "source": pa.array(["s1", "s1", "s2", "s2", "s2"], pa.string()),
        # cross-source dup "xx" counts for BOTH sources
        "text": pa.array(["xx", "aa", "xx", "bb", "bb"], pa.string()),
    }))
    out = dup_rate_by_source(docs, "doc_id", "source", "text")
    got = {r.source: (r.n_docs, r.n_dup_docs, r.dup_rate_micro)
           for r in out.itertuples()}
    assert got["s1"] == (2, 1, 500_000)
    assert got["s2"] == (3, 3, 1_000_000)
