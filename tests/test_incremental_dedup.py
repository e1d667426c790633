"""Incremental minhash dedup: index layout, probe parity with the
one-shot path restricted to cross pairs, and edge cases."""

import glob
import os

import pyarrow as pa
import pytest
import ray.data as rd

from eschergraph_ray.functions.dedup import (
    jaccard_verify_pairs,
    minhash_lsh_candidates,
)
from eschergraph_ray.functions.incremental_dedup import (
    build_minhash_index,
    probe_minhash_index,
)


def _docs_tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
OLD = [
    (1, BASE),
    (2, BASE + " extra tail words here"),
    (3, "completely different content about databases and queries"),
    (4, "another unrelated document with its own words entirely"),
]
NEW = [
    (100, BASE + " extra"),            # near-dup of 1 and 2
    (101, "fresh novel text with no relation to anything indexed"),
]


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mhidx") / "idx")
    build_minhash_index(rd.from_arrow(_docs_tbl(OLD)), d, "doc_id", "text")
    return d


def test_index_layout(index_dir):
    assert glob.glob(os.path.join(index_dir, "bands", "hb=*", "*.parquet"))
    assert glob.glob(os.path.join(index_dir, "shingles", "sb=*", "*.parquet"))
    assert os.path.exists(os.path.join(index_dir, "_stats.parquet"))


def test_probe_equals_full_run_cross_pairs(index_dir):
    new_ids = {i for i, _ in NEW}
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in probe_minhash_index(
            index_dir, rd.from_arrow(_docs_tbl(NEW)), "doc_id", "text",
            threshold=0.3,
        ).take_all()
    )
    # the one-shot pipeline over old ∪ new, filtered to cross pairs
    full_docs = rd.from_arrow(_docs_tbl(OLD + NEW))
    cand = minhash_lsh_candidates(full_docs, "doc_id", "text")
    full = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in jaccard_verify_pairs(
            cand, full_docs, "doc_id", "text", threshold=0.3
        ).take_all()
        if (r["id_a"] in new_ids) != (r["id_b"] in new_ids)
    )
    assert got == full
    assert len(got) >= 1  # doc 100 really matches the indexed near-dups


def test_probe_novel_doc_matches_nothing(index_dir):
    out = probe_minhash_index(
        index_dir,
        rd.from_arrow(_docs_tbl([(200, "zzz yyy xxx www vvv uuu ttt sss")])),
        "doc_id",
        "text",
    ).take_all()
    assert out == []


def test_probe_empty_new_shard(index_dir):
    empty = rd.from_arrow(
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())]).empty_table()
    )
    out = probe_minhash_index(index_dir, empty, "doc_id", "text")
    assert out.count() == 0
    assert set(out.schema().names) == {"id_a", "id_b", "jaccard"}


def test_probe_new_broadcast_guard(index_dir):
    with pytest.raises(ValueError, match="max_new_broadcast"):
        probe_minhash_index(
            index_dir,
            rd.from_arrow(_docs_tbl(NEW)),
            "doc_id",
            "text",
            max_new_broadcast=1,
        )


def test_dedup_incremental_probe_oracle_sf0001():
    import duckdb
    import pandas as pd

    import __ray_entry__ as E

    SF = "/root/testdata/sf0.001"
    cols = ["id_a", "id_b"]
    got = (
        E.queries()["dedup_incremental_probe"](SF)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(E.oracle_sql()["dedup_incremental_probe"])
        .df()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert len(got) > 0  # the synthetic near-dups cross the split
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
