"""Deterministic sampling/splitting and PII-style redaction."""

import pyarrow as pa
import pytest
import ray.data as rd

from eschergraph_ray.functions.sampling import (
    add_split_column,
    fraction_to_hex_threshold,
    hash_sample,
)
from eschergraph_ray.functions.textstats import (
    redact_text,
    synthetic_pii_documents,
)


def test_fraction_threshold_bounds():
    assert fraction_to_hex_threshold(0.0) == "0000"
    assert fraction_to_hex_threshold(0.25) == "4000"
    assert fraction_to_hex_threshold(1.0) == "g"  # sorts after all hex
    with pytest.raises(ValueError):
        fraction_to_hex_threshold(1.5)


def _ids_table(n):
    return pa.table({"doc_id": pa.array(range(n), pa.int64())})


def test_hash_sample_deterministic_and_block_invariant():
    t = _ids_table(2000)
    a = sorted(r["doc_id"] for r in hash_sample(rd.from_arrow(t), "doc_id", 0.3).take_all())
    # different block structure must select the same rows
    b = sorted(
        r["doc_id"]
        for r in hash_sample(
            rd.from_arrow(t).repartition(7), "doc_id", 0.3
        ).take_all()
    )
    assert a == b
    # roughly the requested fraction (16-bit hash, n=2000)
    assert 0.25 < len(a) / 2000 < 0.35
    # fraction=0 selects nothing; fraction=1 selects everything
    assert hash_sample(rd.from_arrow(t), "doc_id", 0.0).count() == 0
    assert hash_sample(rd.from_arrow(t), "doc_id", 1.0).count() == 2000


def test_split_assignments_stable_under_growth():
    small = add_split_column(rd.from_arrow(_ids_table(500)), "doc_id", 0.2).take_all()
    big = add_split_column(rd.from_arrow(_ids_table(1500)), "doc_id", 0.2).take_all()
    small_map = {r["doc_id"]: r["split"] for r in small}
    big_map = {r["doc_id"]: r["split"] for r in big}
    # growing the corpus never reshuffles earlier assignments
    assert all(big_map[i] == small_map[i] for i in small_map)
    assert set(big_map.values()) == {"train", "holdout"}


def test_redact_text_plants_and_passthrough():
    tbl = synthetic_pii_documents(30)
    out = redact_text(rd.from_arrow(tbl), "text").take_all()
    by_id = {r["row_id"]: r for r in out}
    import re

    for row in tbl.to_pylist():
        r = by_id[row["row_id"]]
        red = r["redacted"]
        assert "@" not in red  # every planted email gone
        assert not re.search(r"\d{6,}", red)  # no long digit runs survive
        if r["n_email"] == r["n_phone"] == r["n_num"] == 0:
            assert red == row["text"]  # clean text is byte-identical
        else:
            assert "<EMAIL>" in red or "<PHONE>" in red or "<NUM>" in red


def test_redact_counts_exact():
    t = pa.table(
        {
            "id": ["a"],
            "text": ["mail me a@b.co or c@d.org, call +1 415-555-0000, id 1234567"],
        }
    )
    r = redact_text(rd.from_arrow(t), "text").take_all()[0]
    assert r["n_email"] == 2
    assert r["n_phone"] == 1  # a 7-digit run is too short for the phone pattern
    assert r["n_num"] == 1  # counted on the ORIGINAL text
    assert r["redacted"] == "mail me <EMAIL> or <EMAIL>, call <PHONE>, id <NUM>"


def test_repetition_counts_exact():
    from eschergraph_ray.functions.textstats import repetition_counts

    t = pa.table(
        {
            "id": ["a", "b", "c"],
            "text": ["a b a b a", "one two three", ""],
        }
    )
    rows = {r["id"]: r for r in repetition_counts(rd.from_arrow(t), "id", "text").take_all()}
    # "a b a b a": tokens 5 (2 distinct), bigrams 4 (a b, b a, a b, b a -> 2 distinct)
    assert rows["a"]["n_tokens"] == 5 and rows["a"]["n_distinct_tokens"] == 2
    assert rows["a"]["n_bigrams"] == 4 and rows["a"]["n_distinct_bigrams"] == 2
    assert rows["b"]["n_tokens"] == 3 and rows["b"]["n_distinct_bigrams"] == 2
    assert rows["c"]["n_tokens"] == 0 and rows["c"]["n_bigrams"] == 0


def test_histogram_percentiles_matches_duckdb_rule():
    import duckdb

    from eschergraph_ray.functions.textstats import histogram_percentiles

    cases = [
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10],
        [1, 1, 1, 1, 2, 100],
        [5],
        list(range(1, 12)),
        [3, 3, 3, 7, 7, 9, 9, 9, 9],
    ]
    con = duckdb.connect()
    for vals in cases:
        hist = {}
        for v in vals:
            hist[v] = hist.get(v, 0) + 1
        got = histogram_percentiles(sorted(hist.items()), (0.25, 0.5, 0.75))
        exp = con.execute(
            "SELECT quantile_disc(x,0.25), quantile_disc(x,0.5), quantile_disc(x,0.75)"
            f" FROM (SELECT unnest({vals}) x)"
        ).fetchone()
        assert tuple(got) == exp, (vals, got, exp)


def test_int_column_percentiles_distributed():
    from eschergraph_ray.functions.textstats import int_column_percentiles

    vals = [1] * 30 + [5] * 50 + [9] * 20
    ds = rd.from_arrow(pa.table({"n": pa.array(vals, pa.int64())})).repartition(6)
    (p25, p50, p75), n = int_column_percentiles(ds, "n")
    assert n == 100
    assert (p25, p50, p75) == (1, 5, 5)  # cum: 30, 80, 100


def test_pack_sequences_greedy_and_invariants():
    from eschergraph_ray.functions.packing import pack_sequences

    t = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            # token counts 10..400: forces multi-doc bins AND oversized
            "n_tokens": pa.array([10 + (i * 37) % 391 for i in range(40)], pa.int64()),
        }
    )
    out = pack_sequences(
        rd.from_arrow(t).repartition(5), "doc_id", "n_tokens", budget=256, num_parts=4
    ).take_all()
    toks = dict(zip(t["doc_id"].to_pylist(), t["n_tokens"].to_pylist()))
    # replay the greedy loop per part in id order
    exp = {}
    for part in range(4):
        ids = sorted(d for d in toks if d % 4 == part)
        bin_no, running = 0, 0
        for d in ids:
            if running > 0 and running + toks[d] > 256:
                bin_no += 1
                running = 0
            running += toks[d]
            exp[d] = (part, bin_no)
    assert len(out) == 40
    for r in out:
        assert exp[r["doc_id"]] == (r["part"], r["bin_id"])
    # invariant: no multi-doc bin exceeds the budget
    from collections import defaultdict

    fill = defaultdict(list)
    for r in out:
        fill[(r["part"], r["bin_id"])].append(toks[r["doc_id"]])
    for members in fill.values():
        assert sum(members) <= 256 or len(members) == 1  # oversized doc alone


def test_pack_sequences_requires_power_of_two_parts():
    from eschergraph_ray.functions.packing import pack_sequences

    t = pa.table({"doc_id": pa.array([1], pa.int64()), "n_tokens": pa.array([5], pa.int64())})
    with pytest.raises(ValueError):
        pack_sequences(rd.from_arrow(t), "doc_id", "n_tokens", budget=10, num_parts=6)


def test_pack_sequences_rejects_zero_parts():
    from eschergraph_ray.functions.packing import pack_sequences

    t = pa.table({"doc_id": pa.array([1], pa.int64()), "n_tokens": pa.array([5], pa.int64())})
    with pytest.raises(ValueError):
        pack_sequences(rd.from_arrow(t), "doc_id", "n_tokens", budget=10, num_parts=0)


def test_markdown_table_malformed_specs_do_not_crash():
    from eschergraph_ray.functions.multimodal import generate_markdown_table

    assert generate_markdown_table(0, 3, []) == ""
    assert generate_markdown_table(2, 0, []) == ""
    # out-of-range cells are skipped, in-range ones kept
    got = generate_markdown_table(
        2,
        2,
        [
            {"row_index": 0, "column_index": 0, "content": "ok"},
            {"row_index": 5, "column_index": 0, "content": "oob-row"},
            {"row_index": 0, "column_index": 9, "content": "oob-col"},
            {"row_index": -1, "column_index": 0, "content": "neg"},
        ],
    )
    assert got == "| ok |  |\n| --- | --- |\n|  |  |\n"


# ---------- budget-bounded selection ----------


def test_select_token_budget_boundary_ties(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.sampling import select_token_budget

    # scores: 9 (one doc, 10 tok), 5 (tie group of three, 10 tok each,
    # admitted in id order), 1 (never reached)
    t = pa.table(
        {
            "id": [1, 2, 3, 4, 5],
            "score": [9, 5, 5, 5, 1],
            "tok": [10, 10, 10, 10, 10],
        }
    )
    ds = rd.from_arrow(t).repartition(3)

    def sel(budget):
        return sorted(
            r["id"]
            for r in select_token_budget(
                ds, "id", "score", "tok", budget
            ).take_all()
        )

    assert sel(10) == [1]          # exactly the top doc
    assert sel(25) == [1, 2]       # one boundary doc fits
    assert sel(30) == [1, 2, 3]    # running total rule, id order
    assert sel(9) == []            # first doc overflows -> nothing
    assert sel(1000) == [1, 2, 3, 4, 5]
    assert sel(45) == [1, 2, 3, 4]  # full tie group, next score out


def test_select_token_budget_validation(ray_session):
    import pytest

    from eschergraph_ray.functions.sampling import select_token_budget

    with pytest.raises(ValueError):
        select_token_budget(None, "id", "s", "t", -1)
    # a negative token count breaks the monotone running-sum cutoff
    # (the SQL running total could dip back under budget) — fail loud
    t = pa.table(
        {
            "id": [1, 2],
            "s": [10, 9],
            "t": [5, -3],
        }
    )
    with pytest.raises(ValueError, match="non-negative token counts"):
        select_token_budget(rd.from_arrow(t), "id", "s", "t", 100)


# ---------- weighted sampling (A-Res) ----------


def test_weighted_sample_ares_bias_and_formula(ray_session):
    import hashlib
    import math

    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.sampling import weighted_sample_ares

    # one item 10000x heavier than 49 peers: virtually certain to be
    # in any small sample
    ids = list(range(50))
    w = [1.0] * 50
    w[7] = 10000.0
    ds = rd.from_arrow(
        pa.table({"id": pa.array(ids, pa.int64()), "w": w})
    ).repartition(4)
    out = weighted_sample_ares(ds, "id", "w", k=5).take_all()
    got = {r["id"]: r["pri_micro"] for r in out}
    assert len(got) == 5 and 7 in got
    # exact priority formula replay for the heavy item
    v = int(hashlib.md5(b"wrs7").hexdigest()[:12], 16)
    u = (v + 0.5) / float(1 << 48)
    assert got[7] == round(1e6 * math.log(u) / 10000.0)
    # determinism across partitionings
    out2 = weighted_sample_ares(
        rd.from_arrow(pa.table({"id": pa.array(ids, pa.int64()), "w": w})),
        "id", "w", k=5,
    ).take_all()
    assert [(r["id"], r["pri_micro"]) for r in out] == [
        (r["id"], r["pri_micro"]) for r in out2
    ]


def test_weighted_sample_ares_validation(ray_session):
    import pytest

    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.sampling import weighted_sample_ares

    with pytest.raises(ValueError):
        weighted_sample_ares(None, "id", "w", k=0)
    ds = rd.from_arrow(pa.table({"id": [1], "w": [0.0]}))
    with pytest.raises(Exception, match="positive"):
        weighted_sample_ares(ds, "id", "w", k=1).take_all()


def test_sampled_quantiles_duckdb_replay(ray_session):
    import duckdb
    import ray.data as rd

    from eschergraph_ray.functions.sampling import sampled_quantiles

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(
        f"{sf}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    got = sampled_quantiles(
        ds, "o_orderkey", "o_totalprice", fraction=0.0625, salt="aq"
    ).to_pandas()
    want = duckdb.sql(
        f"""
        WITH s AS (
          SELECT CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS v
          FROM read_parquet('{sf}/orders.parquet')
          WHERE o_totalprice IS NOT NULL
            AND substr(md5(concat('aq', CAST(o_orderkey AS VARCHAR))),
                       1, 4) < '1000'
        )
        SELECT CAST(count(*) AS BIGINT) AS n_sample,
               CAST(quantile_disc(v, 0.0625) AS BIGINT) AS q0625,
               CAST(quantile_disc(v, 0.25) AS BIGINT) AS q2500,
               CAST(quantile_disc(v, 0.5) AS BIGINT) AS q5000,
               CAST(quantile_disc(v, 0.75) AS BIGINT) AS q7500,
               CAST(quantile_disc(v, 0.9375) AS BIGINT) AS q9375
        FROM s HAVING count(*) > 0
        """
    ).df()
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_sample"].iloc[0] > 0


def test_sampled_quantiles_empty_sample(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.sampling import sampled_quantiles

    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    out = sampled_quantiles(rd.from_arrow(t), "id", "v", fraction=0.0)
    assert out.count() == 0
    assert out.schema().names[0] == "n_sample"
