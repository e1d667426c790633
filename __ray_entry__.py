"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on a synthetic
transcript corpus sized from sf0.001 (the transcript table is the
driver-mandated input shape, synthesized deterministically — see
eschergraph_ray/sources/transcripts.py). ``queries()`` exposes each
implemented operator; SQL-expressible ones have a DuckDB oracle in
``oracle_sql()``, the KG/graph ones are checked rows-only (their oracle
is the generator ground truth, asserted in tests/).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import shutil
from collections.abc import Callable
from typing import Any

SEED = 42


def _context():
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.enable_tensor_extension_casting = False


def _build_for(sf_dir: str, tag: str):
    """Run (once per process invocation) the full build for a corpus
    scaled to sf_dir; returns the output directory."""
    from eschergraph_ray.pipelines.build import build
    from eschergraph_ray.sources.transcripts import (
        sf_to_n_convs,
        transcripts_parquet_dir,
    )

    _context()
    n = sf_to_n_convs(sf_dir)
    src = transcripts_parquet_dir(n, seed=SEED)
    out = f"/tmp/eschergraph_ray/build-{tag}-n{n}"
    done = out + "/_QUERY_DONE"
    import os

    if not os.path.exists(done):
        shutil.rmtree(out, ignore_errors=True)
        build(src, out, commit_groups=2)
        with open(done, "w") as f:
            f.write("ok")
    return out


def entry() -> Any:
    """Flagship pipeline on a corpus scaled from sf0.001."""
    from eschergraph_ray.pipelines.build import load_kind

    out = _build_for("/root/testdata/sf0.001", "entry")
    return load_kind(out, "triple")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_kg(kind: str):
    def run(sf_dir: str):
        from eschergraph_ray.pipelines.build import load_kind_arrow

        out = _build_for(sf_dir, "q")
        t = load_kind_arrow(out, kind)
        # stable, list-free projection for the driver's hasher
        drop = [
            c
            for c in ("properties", "child_node_ids", "metadata", "is_visual")
            if c in t.column_names
        ]
        return t.drop_columns(drop)

    return run


def _q_chunks(sf_dir: str):
    import ray.data as rd

    from eschergraph_ray.sources.transcripts import (
        sf_to_n_convs,
        transcripts_parquet_dir,
    )
    from eschergraph_ray.stages.chunking import chunk_conversations

    _context()
    src = transcripts_parquet_dir(sf_to_n_convs(sf_dir), seed=SEED)
    return chunk_conversations(rd.read_parquet(src))


def _q_lineage(sf_dir: str):
    from eschergraph_ray.pipelines.build import _input_files  # noqa: F401
    import pyarrow.parquet as pq

    out = _build_for(sf_dir, "q")
    return pq.read_table(out + "/lineage.parquet")


def _q_doc_token_counts(sf_dir: str):
    """Token counting (F8/S7 analogue) over the documents table."""
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.text import _TOKEN_RE

    _context()

    def f(batch: pa.Table) -> pa.Table:
        counts = [len(_TOKEN_RE.findall(t)) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "n_tokens": pa.array(counts, pa.int64())}
        )

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


def _q_dedup_exact(sf_dir: str):
    """Exact dedup: one survivor (min doc_id) per identical text (D1/D6
    pattern: hash-partition + per-group first)."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Min

    _context()
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        import hashlib

        h = [
            hashlib.blake2b(t.encode(), digest_size=16).hexdigest()
            for t in batch["text"].to_pylist()
        ]
        return batch.append_column("h", pa.array(h, pa.string())).drop_columns(["text"])

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="doc_id"))
        .select_columns(["doc_id"])
    )


def _q_lineitem_pricing(sf_dir: str):
    """TPC-H Q1-style grouped aggregate (A1/A5 pattern)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    _context()
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("rev", rev)

    out = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("rev", alias_name="sum_revenue"),
            Count(alias_name="n_rows"),
        )
    )

    def rounded(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("sum_revenue"),
            "sum_revenue",
            pc.round(batch["sum_revenue"], 2),
        ).set_column(
            batch.column_names.index("sum_qty"),
            "sum_qty",
            pc.round(batch["sum_qty"], 2),
        )

    return out.map_batches(rounded, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "kg_triples": _q_kg("triple"),
        "kg_nodes": _q_kg("node"),
        "kg_edges": _q_kg("edge"),
        "kg_properties": _q_kg("property"),
        "kg_chunks": _q_chunks,
        "kg_lineage": _q_lineage,
        "doc_token_counts": _q_doc_token_counts,
        "dedup_exact_documents": _q_dedup_exact,
        "lineitem_pricing_summary": _q_lineitem_pricing,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "doc_token_counts": r"""
            SELECT doc_id,
                   CAST(array_length(regexp_extract_all(text,
                        '[A-Za-z]+(''[A-Za-z]+)?|\d+|[^\w\s]')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "dedup_exact_documents": """
            SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
        """,
        "lineitem_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
                   count(*) AS n_rows
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
    }
