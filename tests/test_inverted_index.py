"""Term-partitioned inverted index: layout, IO pruning, and score
parity with the scan-path BM25."""

import glob
import os

import pyarrow as pa
import pytest
import ray.data as rd

from eschergraph_ray.functions.inverted_index import (
    _token_bucket,
    bm25_index_topk,
    build_inverted_index,
)
from eschergraph_ray.functions.ranking import bm25_topk


def _docs_tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


CORPUS = [
    (1, "spark streams data fast spark"),
    (2, "window merge window sort"),
    (3, "customer orders data"),
    (4, "spark window customer merge"),
    (5, "totally unrelated words"),
]


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("invidx") / "idx")
    build_inverted_index(
        rd.from_arrow(_docs_tbl(CORPUS)), d, "doc_id", "text", num_buckets=8
    )
    return d


def test_index_layout_partitioned_by_term_bucket(index_dir):
    parts = sorted(glob.glob(os.path.join(index_dir, "term_bucket=*")))
    assert parts, "no bucket partitions written"
    assert os.path.exists(os.path.join(index_dir, "_stats.parquet"))
    # every token's postings live in (only) its bucket partition
    import pyarrow.parquet as pq

    for p in parts:
        b = int(p.split("=")[1])
        for f in glob.glob(os.path.join(p, "*.parquet")):
            toks = pq.read_table(f, columns=["token"])["token"].to_pylist()
            assert all(_token_bucket(t, 8) == b for t in toks)


def test_index_stats_sidecar(index_dir):
    import pyarrow.parquet as pq

    st = pq.read_table(os.path.join(index_dir, "_stats.parquet"))
    assert st["n_docs"][0].as_py() == 5
    assert st["sum_dl"][0].as_py() == sum(len(t.split()) for _, t in CORPUS)


def test_indexed_scores_equal_scan_scores(index_dir):
    terms = ["spark", "merge", "window", "customer"]
    scan = bm25_topk(
        rd.from_arrow(_docs_tbl(CORPUS)), "doc_id", "text", terms, k=10
    ).take_all()
    idx = bm25_index_topk(index_dir, "doc_id", terms, k=10).take_all()
    assert [(r["doc_id"], r["score"]) for r in idx] == [
        (r["doc_id"], r["score"]) for r in scan
    ]
    assert len(idx) == 4  # doc 5 matches nothing


def test_indexed_single_term_and_miss(index_dir):
    hit = bm25_index_topk(index_dir, "doc_id", ["spark"], k=10).take_all()
    assert sorted(r["doc_id"] for r in hit) == [1, 4]
    miss = bm25_index_topk(index_dir, "doc_id", ["zzznope"], k=10).take_all()
    assert miss == []


def test_indexed_empty_terms_raises(index_dir):
    with pytest.raises(ValueError, match="non-empty"):
        bm25_index_topk(index_dir, "doc_id", [], k=10)


def test_docs_bm25_indexed_matches_scan_query_sf0001():
    import __ray_entry__ as E

    sf = "/root/testdata/sf0.001"
    idx = E.queries()["docs_bm25_indexed"](sf).to_pandas()
    scan = E.queries()["docs_bm25_topk"](sf).to_pandas()
    assert idx.equals(scan)
