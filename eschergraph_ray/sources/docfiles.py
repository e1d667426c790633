"""Text-file document sources: JSONL and CSV ingestion.

The reference's Reader dispatches on file extension (txt/pdf —
``eschergraph/builder/reader/reader.py``); the Ray-native analogue for
bulk corpora is format-dispatching `ray.data` readers over sharded
files. This module covers the two bulk text formats the sandbox can
exercise for real (JSONL via ``read_json`` — pyarrow's newline-
delimited JSON reader — and CSV via ``read_csv``), normalized to the
``(doc_id, text)`` documents schema. Parquet stays the primary format
(`pipelines/build.py`); these exist so a corpus that ARRIVES as
JSONL/CSV enters the same pipelines with no conversion step.

Scale shape: one block per input file (``override_num_blocks`` pins
it — Ray's default splits files into cpu-count-dependent sub-blocks,
the CLAUDE.md read_parquet trap, and read_json inherits it), so a
100 TB drop of N shards fans out N-wide and each shard decodes in one
task. The JSONL export helper exists for tests/oracles (deterministic,
atomic, _DONE-marked); a production export would be a
``write_json``-shaped task per block, not a driver loop.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa


def export_documents_jsonl(parquet_path: str, out_dir: str,
                           shards: int = 4) -> list[str]:
    """Deterministically shard a documents parquet into JSONL files
    (row i -> shard i % shards, preserving order within a shard).
    Atomic + idempotent via a _DONE marker; returns the file list."""
    import pyarrow.parquet as pq

    # marker AND filenames encode the shard count: a re-call with a
    # different ``shards`` is a different export that must neither
    # return never-written paths nor clobber the other layout's files
    done = os.path.join(out_dir, f"_DONE-{shards}")
    files = [
        os.path.join(out_dir, f"docs-{shards}x-{i:03d}.jsonl")
        for i in range(shards)
    ]
    if os.path.exists(done):
        return files
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(parquet_path, columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    for i, path in enumerate(files):
        with open(path + ".tmp", "w") as f:
            for j in range(i, len(ids), shards):
                f.write(json.dumps(
                    {"doc_id": ids[j], "text": texts[j]},
                    ensure_ascii=False,
                ) + "\n")
        os.replace(path + ".tmp", path)
    with open(done, "w") as f:
        f.write("ok")
    return files


def read_documents_jsonl(files: list[str]):
    """Documents from JSONL shards — one block per file."""
    import ray.data as rd

    return rd.read_json(sorted(files), override_num_blocks=len(files))


def write_documents_jsonl(ds, out_dir: str) -> list[str]:
    """Distributed JSONL sink — the production export path the module
    docstring promises: each BLOCK writes its own shard inside the
    task (``json.dumps(ensure_ascii=False)`` — lossless unicode), so a
    100 TB export fans out block-wide with no driver loop and no
    driver memory. Shard names are a content hash of the block's ids,
    so task retries rewrite the same file (atomic tmp -> rename keyed
    by pid; last writer wins with identical bytes) instead of
    duplicating data. Returns the sorted shard list — read back with
    :func:`read_documents_jsonl`."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        key = hashlib.md5(
            ("|".join(str(i) for i in ids)).encode("utf-8")
        ).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{key}.jsonl")
        tmp = f"{path}.tmp-{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            for i, t in zip(ids, texts):
                f.write(json.dumps({"doc_id": i, "text": t},
                                   ensure_ascii=False) + "\n")
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([len(ids)], pa.int64())})

    shards = ds.map_batches(
        write_shard, batch_format="pyarrow", batch_size=None
    ).take_all()
    return sorted(r["path"] for r in shards)


def write_documents_csv(tbl: pa.Table, path: str) -> str:
    """CSV export (arrow csv writer, quoting_style='all_valid': EVERY
    valid value is quoted, so embedded commas / quotes / newlines AND
    the empty string round-trip — the default 'needed' style leaves ""
    unquoted and the reader maps it back to null)."""
    import pyarrow.csv as pacsv

    pacsv.write_csv(
        tbl, path + ".tmp",
        write_options=pacsv.WriteOptions(quoting_style="all_valid"),
    )
    os.replace(path + ".tmp", path)
    return path


def read_documents_csv(files: list[str]):
    """Documents from CSV shards — one block per file."""
    import ray.data as rd

    return rd.read_csv(sorted(files), override_num_blocks=len(files))


def read_documents_txt(files: list[str], encoding: str = "utf-8"):
    """One document PER FILE from a directory of plain-text files —
    the reference Reader's ``.txt`` branch
    (``eschergraph/builder/reader/reader.py``: whole-file read, then
    char chunking downstream). ``doc_id`` is the file basename without
    extension; ``text`` is the full decoded file body (newlines kept —
    chunking is a downstream stage, not the reader's job).

    Shape: ``read_binary_files(include_paths=True)`` gives one block
    per file and ships raw bytes zero-copy; decode happens vectorized
    in the tasks (``pc.cast(binary -> string)`` validates UTF-8 in C).
    Non-UTF-8 encodings fall back to a per-row Python decode (rare
    path, explicit opt-in)."""
    import pyarrow.compute as pc
    import ray.data as rd

    def decode(batch: pa.Table) -> pa.Table:
        paths = [
            os.path.splitext(os.path.basename(p))[0]
            for p in batch["path"].to_pylist()
        ]
        if encoding == "utf-8":
            text = pc.cast(batch["bytes"], pa.string())
        else:
            text = pa.array(
                [b.decode(encoding) for b in batch["bytes"].to_pylist()]
            )
        return pa.table({"doc_id": pa.array(paths, pa.string()), "text": text})

    return rd.read_binary_files(
        sorted(files), include_paths=True, override_num_blocks=len(files)
    ).map_batches(decode, batch_format="pyarrow")


def write_csv_sharded(ds, out_dir: str, id_col: str) -> list[str]:
    """Distributed CSV sink — the CSV counterpart of
    :func:`write_documents_jsonl`: each BLOCK writes its own shard
    inside the task with the arrow csv writer
    (``quoting_style='all_valid'`` so embedded commas / quotes /
    newlines and empty strings round-trip), shard names are a content
    hash of the block's ids (task retries rewrite the same file via
    pid-keyed tmp + atomic rename instead of duplicating data), and no
    bytes ever pass through the driver. Returns the sorted shard list
    — read back with :func:`read_documents_csv`."""
    import hashlib

    import pyarrow.csv as pacsv

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        key = hashlib.md5(
            ("|".join(str(i) for i in ids)).encode("utf-8")
        ).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{key}.csv")
        tmp = f"{path}.tmp-{os.getpid()}"
        pacsv.write_csv(
            batch, tmp,
            write_options=pacsv.WriteOptions(quoting_style="all_valid"),
        )
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([len(ids)], pa.int64())})

    shards = ds.map_batches(
        write_shard, batch_format="pyarrow", batch_size=None
    ).take_all()
    return sorted(r["path"] for r in shards)


def write_orc_sharded(ds, out_dir: str, id_col: str) -> list[str]:
    """Distributed ORC sink — the columnar-interchange counterpart of
    :func:`write_documents_jsonl` for warehouses that speak ORC (Hive /
    Trino lakes): each BLOCK writes its own shard inside the task with
    ``pyarrow.orc.write_table``, shard names are a content hash of the
    block's ids (task retries rewrite the same file via pid-keyed tmp +
    atomic rename instead of duplicating data), and no bytes ever pass
    through the driver. Returns the sorted shard list — read back with
    :func:`read_documents_orc`."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        ids = batch[id_col].to_pylist()
        key = hashlib.md5(
            ("|".join(str(i) for i in ids)).encode("utf-8")
        ).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{key}.orc")
        tmp = f"{path}.tmp-{os.getpid()}"
        orc.write_table(batch.combine_chunks(), tmp)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([len(ids)], pa.int64())})

    shards = ds.map_batches(
        write_shard, batch_format="pyarrow", batch_size=None
    ).take_all()
    return sorted(r["path"] for r in shards)


def write_ipc_sharded(ds, out_dir: str, id_col: str) -> list[str]:
    """Distributed Arrow IPC (Feather v2) sink — the zero-copy
    interchange format for Arrow-native consumers (DuckDB, polars,
    pandas, Flight): each BLOCK writes its own shard inside the task
    with ``pyarrow.ipc.new_file``, shard names are a content hash of
    the block's ids (task retries rewrite the same file via pid-keyed
    tmp + atomic rename instead of duplicating data), and no bytes
    ever pass through the driver. Returns the sorted shard list —
    read back with :func:`read_documents_ipc`."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: pa.Table) -> pa.Table:
        import pyarrow.ipc as ipc

        ids = batch[id_col].to_pylist()
        key = hashlib.md5(
            ("|".join(str(i) for i in ids)).encode("utf-8")
        ).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{key}.arrow")
        tmp = f"{path}.tmp-{os.getpid()}"
        t = batch.combine_chunks()
        with ipc.new_file(tmp, t.schema) as w:
            w.write_table(t)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "rows": pa.array([len(ids)], pa.int64())})

    shards = ds.map_batches(
        write_shard, batch_format="pyarrow", batch_size=None
    ).take_all()
    return sorted(r["path"] for r in shards)


def read_documents_ipc(files: list[str]):
    """Arrow IPC shards back as a Dataset — Ray 2.49 ships no
    ``read_ipc``, so the source composes ``read_binary_files`` (one
    block per file, bytes zero-copy through the object store) with an
    in-task ``pyarrow.ipc`` decode: the same
    custom-file-format-on-Ray-Data recipe as
    :func:`read_documents_orc`."""
    import ray.data as rd

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.ipc as ipc

        tables = [
            ipc.open_file(pa.BufferReader(buf)).read_all()
            for buf in batch["bytes"].to_pylist()
        ]
        return pa.concat_tables(tables).combine_chunks()

    return rd.read_binary_files(
        sorted(files), include_paths=False,
        override_num_blocks=len(files),
    ).map_batches(decode, batch_format="pyarrow")


def read_documents_orc(files: list[str]):
    """ORC shards back as a Dataset — Ray 2.49 ships no ``read_orc``,
    so the source composes ``read_binary_files`` (one block per file,
    bytes zero-copy through the object store) with an in-task
    ``pyarrow.orc`` decode: the standard
    custom-file-format-on-Ray-Data recipe, same shape as
    :func:`read_documents_txt`."""
    import ray.data as rd

    def decode(batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        tables = [
            orc.ORCFile(pa.BufferReader(buf)).read()
            for buf in batch["bytes"].to_pylist()
        ]
        return pa.concat_tables(tables).combine_chunks()

    return rd.read_binary_files(
        sorted(files), include_paths=False,
        override_num_blocks=len(files),
    ).map_batches(decode, batch_format="pyarrow")


def read_parquet_union_by_name(files: list[str],
                               override_num_blocks: int | None = None):
    """Schema-EVOLUTION parquet source: read shards whose column sets
    DIFFER (a pipeline added or dropped columns mid-corpus) under
    union-by-name semantics — every output block carries the union
    schema, with all-null columns where a shard predates a field.
    Ray's ``read_parquet`` assumes one schema across files; this
    composes ``read_binary_files`` (one block per file, zero-copy
    bytes) with an in-task pyarrow decode + normalize — the same
    custom-source recipe as :func:`read_documents_orc`. Field TYPE
    conflicts raise loudly (evolution here means presence, not type
    punning).
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    files = sorted(files)
    fields: dict = {}
    for f in files:
        s = pq.ParquetFile(f).schema_arrow
        for fld in s:
            prev = fields.get(fld.name)
            if prev is not None and prev != fld.type:
                raise ValueError(
                    f"read_parquet_union_by_name: column {fld.name!r} "
                    f"has conflicting types {prev} vs {fld.type}"
                )
            fields.setdefault(fld.name, fld.type)
    union = pa.schema(sorted(fields.items()))

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq2

        tables = []
        for buf in batch["bytes"].to_pylist():
            t = pq2.read_table(pa.BufferReader(buf))
            cols = []
            for fld in union:
                if fld.name in t.column_names:
                    cols.append(pa.chunked_array(
                        [pa.concat_arrays(
                            [c.cast(fld.type) for c in
                             t[fld.name].chunks] or
                            [pa.array([], fld.type)])]))
                else:
                    cols.append(pa.nulls(len(t), fld.type))
            tables.append(pa.table(dict(zip(union.names, cols))))
        return pa.concat_tables(tables).combine_chunks()

    return rd.read_binary_files(
        files, include_paths=False,
        override_num_blocks=override_num_blocks or len(files),
    ).map_batches(decode, batch_format="pyarrow")
