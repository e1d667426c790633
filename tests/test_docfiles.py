"""JSONL / CSV document sources: lossless round-trip into Ray."""

import pyarrow as pa

from eschergraph_ray.sources.docfiles import (
    export_documents_jsonl,
    read_documents_csv,
    read_documents_jsonl,
    write_documents_csv,
)

NASTY = [
    "plain text",
    'quotes " and , commas',
    "newline\ninside",
    "unicode: café — ok",
    "",
]


def _tbl():
    return pa.table(
        {
            "doc_id": pa.array(range(len(NASTY)), pa.int64()),
            "text": pa.array(NASTY),
        }
    )


def test_jsonl_roundtrip(tmp_path, ray_session):
    import pyarrow.parquet as pq

    src = tmp_path / "docs.parquet"
    pq.write_table(_tbl(), src)
    files = export_documents_jsonl(str(src), str(tmp_path / "jl"), shards=2)
    # idempotent second call returns the same listing
    assert files == export_documents_jsonl(str(src), str(tmp_path / "jl"), 2)
    # a DIFFERENT shard count is a different export, not a stale hit
    f3 = export_documents_jsonl(str(src), str(tmp_path / "jl"), shards=3)
    assert len(f3) == 3 and all(__import__("os").path.exists(p) for p in f3)
    out = read_documents_jsonl(files).to_pandas().sort_values("doc_id")
    assert list(out["text"]) == NASTY


def test_txt_directory(tmp_path, ray_session):
    from eschergraph_ray.sources.docfiles import read_documents_txt

    files = []
    for i, body in enumerate(NASTY):
        p = tmp_path / f"doc-{i:02d}.txt"
        p.write_text(body, encoding="utf-8")
        files.append(str(p))
    out = read_documents_txt(files).to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [f"doc-{i:02d}" for i in range(len(NASTY))]
    assert list(out["text"]) == NASTY


def test_csv_roundtrip(tmp_path, ray_session):
    p = write_documents_csv(_tbl(), str(tmp_path / "docs.csv"))
    out = read_documents_csv([p]).to_pandas().sort_values("doc_id")
    # all_valid quoting writes "" quoted, so even the empty string
    # round-trips losslessly — no normalization needed
    assert list(out["text"]) == NASTY


def test_write_csv_sharded_roundtrip_nasty_values(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.sources.docfiles import (
        read_documents_csv,
        write_csv_sharded,
    )

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "txt": pa.array(
                ['comma, inside', 'quote " inside', "uni ✓ çödé", ""],
                pa.string(),
            ),
            "n": pa.array([10, 20, 30, 40], pa.int64()),
        }
    )
    files = write_csv_sharded(
        rd.from_arrow(t).repartition(2), str(tmp_path / "csv"), "doc_id"
    )
    assert len(files) >= 1
    back = (
        read_documents_csv(files)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert back["doc_id"].tolist() == [1, 2, 3, 4]
    assert back["txt"].tolist() == [
        "comma, inside", 'quote " inside', "uni ✓ çödé", ""
    ]
    assert back["n"].tolist() == [10, 20, 30, 40]


def test_write_csv_sharded_retry_same_name(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.sources.docfiles import write_csv_sharded

    t = pa.table(
        {"doc_id": pa.array([7, 8], pa.int64()),
         "v": pa.array([1, 2], pa.int64())}
    )
    d = str(tmp_path / "csv2")
    f1 = write_csv_sharded(rd.from_arrow(t), d, "doc_id")
    f2 = write_csv_sharded(rd.from_arrow(t), d, "doc_id")
    # content-hash names: a rerun rewrites the SAME file set
    assert f1 == f2


def test_orc_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.sources.docfiles import (
        read_documents_orc,
        write_orc_sharded,
    )

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(['a "q"', "รถ\nnl", "", "x,y"], pa.string()),
            "score": pa.array([1.5, None, 0.0, -2.25], pa.float64()),
        }
    )
    files = write_orc_sharded(
        rd.from_arrow(t).repartition(3), str(tmp_path / "orc"), "doc_id"
    )
    assert len(files) >= 2  # sharded, not one giant file
    back = (
        read_documents_orc(files)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.equals(want)


def test_ipc_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.sources.docfiles import (
        read_documents_ipc,
        write_ipc_sharded,
    )

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(['a "q"', "รถ\nnl", "", "x,y"], pa.string()),
            "score": pa.array([1.5, None, 0.0, -2.25], pa.float64()),
        }
    )
    files = write_ipc_sharded(
        rd.from_arrow(t).repartition(3), str(tmp_path / "ipc"), "doc_id"
    )
    assert len(files) >= 2  # sharded, not one giant file
    back = (
        read_documents_ipc(files)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back.equals(want)


def test_ipc_retry_stable_names(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.sources.docfiles import write_ipc_sharded

    t = pa.table(
        {"doc_id": pa.array(["a", "b"], pa.string()),
         "v": pa.array([1, 2], pa.int64())}
    )
    d = str(tmp_path / "ipc2")
    f1 = write_ipc_sharded(rd.from_arrow(t), d, "doc_id")
    f2 = write_ipc_sharded(rd.from_arrow(t), d, "doc_id")
    assert f1 == f2


def test_union_by_name_fills_missing_columns(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from eschergraph_ray.sources.docfiles import (
        read_parquet_union_by_name,
    )

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "x": pa.array(["p", "q"], pa.string()),
    }), a)
    pq.write_table(pa.table({
        "id": pa.array([3], pa.int64()),
        "y": pa.array([7.5], pa.float64()),
    }), b)
    out = (
        read_parquet_union_by_name([a, b])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert sorted(out.columns) == ["id", "x", "y"]
    assert out["x"].isna().tolist() == [False, False, True]
    assert out["y"].isna().tolist() == [True, True, False]


def test_union_by_name_type_conflict_raises(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from eschergraph_ray.sources.docfiles import (
        read_parquet_union_by_name,
    )

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(pa.table({"id": pa.array([1], pa.int64())}), a)
    pq.write_table(pa.table({"id": pa.array(["x"], pa.string())}), b)
    with pytest.raises(ValueError, match="conflicting types"):
        read_parquet_union_by_name([a, b])
