"""The flagship build pipeline — ``Graph.build(files)`` restated.

Reference lifecycle (``eschergraph/graph/graph.py:237-273`` +
``eschergraph/builder/build_pipeline.py:55-100``) as a streaming Ray
Data job:

    read_parquet(transcript shards)                       # source
    -> map_batches(add_turn_tokens)                       # vectorized
    -> groupby(conv_id, salt).map_groups(chunk)           # shuffle 1
    -> map_batches(ExtractorActor)        [checkpoint: build_logs/]
    -> groupby(conv_id).map_groups(build_graph_group)     # shuffle 2
    -> write_parquet(graph/, partition_cols=["kind"])     # sink

Two phases, each checkpointed per commit group (state/checkpoint.py):
phase "extract" persists build_logs (the expensive LLM stage at scale),
phase "graph" persists the union graph table partitioned by row kind —
so each logical output table (nodes/edges/properties/triples) lands in
its own directory from ONE pass, no re-execution per table.

Partition unit = input shard span (files), commit unit = group of
partitions; a conversation must not span input shards (generator
guarantees it; production transcript exports are laid out this way).
A killed run rerun with the same arguments resumes after the last
committed group and, within a group, after the extract phase if that
completed.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable

import pyarrow as pa
import pyarrow.dataset as pads

from ..llm import DeterministicMockLLM, LLMClient
from ..stages.chunking import (
    MAX_TOKENS,
    chunk_conversations,
    chunk_conversations_sharded,
)
from ..stages.extraction import extract_build_logs
from ..stages.graph_build import build_graph, build_graph_sharded
from ..state.checkpoint import Manifest, atomic_dir_write


# Bump when the build's OUTPUT semantics change (chunk boundaries,
# sidecars, graph columns): keys downstream on-disk caches of build
# output so stale graphs cannot poison correctness runs.
BUILD_FORMAT = 6  # v6: symmetric token_set_ratio (SequenceMatcher order canonicalized)


@dataclass
class BuildResult:
    out_dir: str
    graph_dirs: list[str]
    lineage: pa.Table


def _input_files(input_path: str) -> list[str]:
    if os.path.isfile(input_path):
        return [input_path]
    files = []
    for root, _dirs, names in os.walk(input_path):
        for n in names:
            if n.endswith(".parquet"):
                files.append(os.path.join(root, n))
    return sorted(files)


def _logs_stats(logs_dir: str) -> dict:
    """Lineage counts for the extraction checkpoint. chunk_count comes
    from Parquet footers (no data scan); conv/turn counts from a light
    two-column DuckDB scan (covered turns = up to each conversation's
    last chunked turn)."""
    import duckdb
    import pyarrow.parquet as pq

    chunk_count = sum(
        pq.ParquetFile(os.path.join(logs_dir, f)).metadata.num_rows
        for f in os.listdir(logs_dir)
        if f.endswith(".parquet")
    )
    con = duckdb.connect()
    row = con.execute(
        f"""
        SELECT count(*), coalesce(sum(mx + 1), 0) FROM (
          SELECT conv_id, max(turn_last) AS mx
          FROM read_parquet('{logs_dir}/**/*.parquet')
          GROUP BY conv_id
        )
        """
    ).fetchone()
    quarantined = con.execute(
        f"""
        SELECT coalesce(sum(CAST(quarantined AS BIGINT)), 0)
        FROM read_parquet('{logs_dir}/**/*.parquet')
        """
    ).fetchone()[0]
    con.close()
    return {
        "conv_count": row[0],
        "chunk_count": chunk_count,
        "turn_count": int(row[1]),
        "quarantined_count": int(quarantined),
    }


def _graph_stats(graph_dir: str) -> dict:
    """Row counts per output kind straight from Parquet footers, plus
    conv/chunk/turn lineage counters from the tiny kind=stats partition
    (emitted inline by the graph stage — no build_logs re-scan)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    out = {"triple_count": 0, "node_count": 0, "edge_count": 0}
    for kind in ("triple", "node", "edge"):
        d = os.path.join(graph_dir, f"kind={kind}")
        if os.path.isdir(d):
            out[f"{kind}_count"] = sum(
                pq.ParquetFile(os.path.join(d, f)).metadata.num_rows
                for f in os.listdir(d)
                if f.endswith(".parquet")
            )
    sd = os.path.join(graph_dir, "kind=stats")
    if os.path.isdir(sd):
        cols = ["stat_convs", "stat_chunks", "stat_turns", "stat_quarantined"]
        t = pads.dataset(sd).to_table(columns=cols)
        import pyarrow.compute as pc

        out["conv_count"] = int(pc.sum(t["stat_convs"]).as_py() or 0)
        out["chunk_count"] = int(pc.sum(t["stat_chunks"]).as_py() or 0)
        out["turn_count"] = int(pc.sum(t["stat_turns"]).as_py() or 0)
        out["quarantined_count"] = int(pc.sum(t["stat_quarantined"]).as_py() or 0)
    return out


class DocumentAlreadyExistsError(ValueError):
    """Reference parity: DocumentAlreadyExistsException
    (``eschergraph/graph/utils.py:13-41``)."""


def _committed_doc_files(out_dir: str, manifest: "Manifest") -> list[str]:
    docs_root = os.path.join(out_dir, "documents")
    if not os.path.isdir(docs_root):
        return []
    committed = {
        pid
        for pid, rec in manifest.data.get("partitions", {}).items()
        if rec.get("status") == "committed"
    }
    return sorted(
        os.path.join(docs_root, f)
        for f in os.listdir(docs_root)
        if f.endswith(".parquet") and f[: -len(".parquet")] in committed
    )


def _partition_duplicates_from(part_convs: set[str], doc_files: list[str]) -> list[str]:
    """conv_ids of this (new) partition that are already committed.

    Distributed membership probe: the partition's own conv set (bounded
    by one commit group, the small side) is broadcast into a filter over
    the committed documents sidecar — the same small-side-broadcast
    shape as the reference's per-file ``duplicate_document_check``
    (``eschergraph/graph/utils.py:13-41``), never a scan of the data
    itself (the sidecar holds one row per conversation)."""
    if not doc_files or not part_convs:
        return []
    import pyarrow.compute as pc
    import ray.data as rd

    value_set = pa.array(sorted(part_convs), pa.string())

    def probe(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch["conv_id"], value_set=value_set)
        )

    dup = (
        rd.read_parquet(doc_files, columns=["conv_id"])
        .map_batches(probe, batch_format="pyarrow")
        .unique("conv_id")
    )
    return sorted(dup or [])  # unique() yields None on an empty result


def _write_documents_sidecar(
    out_dir: str,
    pid: str,
    logs_dir: str,
    tags_fn: Callable[[str], dict] | None,
    graph_dir: str | None = None,
) -> None:
    """One Document record per committed conversation
    (``eschergraph/persistence/document.py:10-29`` analogue).

    Preferred source: the ``kind=docrec`` rows the graph stage emitted
    inline (one per conversation — VERDICT r2 #8: no driver re-scan of
    the chunk-level build_logs between commit groups). Fallback for
    graphs built by the general (non-fused) path: the original DuckDB
    aggregate over the partition's build_logs checkpoint."""
    import duckdb
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..functions.tags import canonical_tags
    from ..schemas import DOCUMENTS_TABLE

    docrec_dir = os.path.join(graph_dir, "kind=docrec") if graph_dir else None
    sample = next(
        (f for f in sorted(os.listdir(logs_dir)) if f.endswith(".parquet")), None
    ) if os.path.isdir(logs_dir) else None
    if docrec_dir and os.path.isdir(docrec_dir):
        # per-conv rows; aggregate defensively in case a conversation
        # ever spans blocks (sum counts, max turn high-water mark)
        raw = pads.dataset(docrec_dir).to_table(
            columns=["conv_id", "stat_chunks", "stat_tokens", "stat_turns"]
        )
        g = raw.group_by("conv_id").aggregate(
            [("stat_chunks", "sum"), ("stat_tokens", "sum"), ("stat_turns", "max")]
        )
        g = g.take(pc.sort_indices(g["conv_id"]))
        t = pa.table(
            {
                "conv_id": g["conv_id"],
                "chunk_num": pc.cast(g["stat_chunks_sum"], pa.int64()),
                "token_num": pc.cast(g["stat_tokens_sum"], pa.int64()),
                "turn_num": pc.cast(g["stat_turns_max"], pa.int64()),
            }
        )
    elif sample is None:
        t = pa.table({"conv_id": [], "chunk_num": [], "token_num": [], "turn_num": []})
    else:
        names = pq.read_schema(os.path.join(logs_dir, sample)).names
        tok = (
            "coalesce(sum(CAST(n_tokens AS BIGINT)), 0)"
            if "n_tokens" in names
            else "CAST(0 AS BIGINT)"
        )
        con = duckdb.connect()
        t = con.execute(
            f"""
            SELECT conv_id, count(*) AS chunk_num, {tok} AS token_num,
                   max(turn_last) + 1 AS turn_num
            FROM read_parquet('{logs_dir}/**/*.parquet')
            GROUP BY conv_id ORDER BY conv_id
            """
        ).arrow()
        con.close()
    convs = t["conv_id"].to_pylist()
    tags = [canonical_tags(tags_fn(c) if tags_fn else {}) for c in convs]
    out = pa.Table.from_pydict(
        {
            "conv_id": pa.array(convs, pa.string()),
            "chunk_num": pa.array(t["chunk_num"].to_pylist(), pa.int64()),
            "token_num": pa.array(t["token_num"].to_pylist(), pa.int64()),
            "turn_num": pa.array(t["turn_num"].to_pylist(), pa.int64()),
            "tags": pa.array(tags, pa.string()),
        },
        schema=DOCUMENTS_TABLE,
    )
    os.makedirs(os.path.join(out_dir, "documents"), exist_ok=True)
    dst = os.path.join(out_dir, "documents", f"{pid}.parquet")
    pq.write_table(out, dst + ".tmp")
    os.replace(dst + ".tmp", dst)


def _write_change_log(out_dir: str, pid: str, graph_dir: str) -> None:
    """Emit the partition's ChangeLog — one CREATE per persisted node /
    edge / property (``eschergraph/persistence/change_log.py:12-31``;
    the reference logs every repository add on build). Deterministic
    ids make re-emission after a crash idempotent (file overwritten).

    Preferred source: the ``kind=changelog`` rows the graph stage
    emitted inline (VERDICT r2 #8) — the sidecar write is then a
    relocate of the already-projected 4 columns, not a driver scan of
    the node/edge/property partitions. Fallback (general-path graphs
    without changelog rows): the original projection."""
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ..schemas import CHANGE_LOG

    cl_dir = os.path.join(graph_dir, "kind=changelog")
    if os.path.isdir(cl_dir):
        t = pads.dataset(cl_dir).to_table(columns=["id", "conv_id", "level", "cl_type"])
        out = pa.table(
            {
                "id": t["id"],
                "action": pa.array(["CREATE"] * t.num_rows, pa.string()),
                "type": t["cl_type"],
                "level": pc.fill_null(pc.cast(t["level"], pa.int32()), 0),
                "conv_id": t["conv_id"],
            }
        )
        # deterministic row order regardless of the sink's file naming
        out = out.take(
            pc.sort_indices(out, sort_keys=[("type", "ascending"), ("id", "ascending")])
        )
    else:
        parts = []
        for kind in ("node", "edge", "property"):
            d = os.path.join(graph_dir, f"kind={kind}")
            if not os.path.isdir(d):
                continue
            t = pads.dataset(d).to_table(columns=["id", "conv_id", "level"])
            n = t.num_rows
            parts.append(
                pa.table(
                    {
                        "id": t["id"],
                        "action": pa.array(["CREATE"] * n, pa.string()),
                        "type": pa.array([kind] * n, pa.string()),
                        "level": pa.array(
                            [v if v is not None else 0 for v in t["level"].to_pylist()],
                            pa.int32(),
                        ),
                        "conv_id": t["conv_id"],
                    }
                )
            )
        out = (
            pa.concat_tables(parts)
            if parts
            else CHANGE_LOG.empty_table()
        )
    os.makedirs(os.path.join(out_dir, "change_log"), exist_ok=True)
    dst = os.path.join(out_dir, "change_log", f"{pid}.parquet")
    pq.write_table(out.cast(CHANGE_LOG).combine_chunks(), dst + ".tmp")
    os.replace(dst + ".tmp", dst)


def _stage_pending_update(out_dir: str, pid: str, conv_ids: list[str]) -> None:
    """Snapshot the EXISTING graph objects of conversations about to be
    re-added with ``on_duplicate="update"`` into a crash-durable sidecar
    (``pending_update/{pid}.parquet``). The snapshot is what lets the
    re-add emit the reference's UPDATE actions
    (``eschergraph/persistence/change_log.py:12-31``: the repository
    logs UPDATE when an add merges into an existing object) instead of
    pretending everything is a fresh CREATE. Merged with any earlier
    snapshot so a crash between staging and removal never loses ids.
    Size is bounded by the re-added conversations' object counts (the
    same bound as the dup_set guard), not by the graph."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..schemas import CHANGE_LOG

    targets = pa.array(sorted(conv_ids))
    parts = []
    graph_root = os.path.join(out_dir, "graph")
    if os.path.isdir(graph_root):
        for part in sorted(os.listdir(graph_root)):
            if part == pid:
                continue
            for kind in ("node", "edge", "property"):
                d = os.path.join(graph_root, part, f"kind={kind}")
                if not os.path.isdir(d):
                    continue
                # predicate pushed into the scan: only row groups whose
                # conv_id stats admit a target decode (never the whole
                # committed graph through the driver per re-add)
                t = pads.dataset(d).to_table(
                    columns=["id", "conv_id", "level"],
                    filter=pads.field("conv_id").isin(targets),
                )
                if t.num_rows:
                    parts.append(
                        pa.table(
                            {
                                "id": t["id"],
                                "action": pa.array(["DELETE"] * t.num_rows, pa.string()),
                                "type": pa.array([kind] * t.num_rows, pa.string()),
                                "level": pc.fill_null(pc.cast(t["level"], pa.int32()), 0),
                                "conv_id": t["conv_id"],
                            }
                        )
                    )
    pend_dir = os.path.join(out_dir, "pending_update")
    os.makedirs(pend_dir, exist_ok=True)
    dst = os.path.join(pend_dir, f"{pid}.parquet")
    if os.path.exists(dst):  # crash-rerun: merge with the prior snapshot
        parts.append(pq.read_table(dst))
    snap = (
        pa.concat_tables([p.cast(CHANGE_LOG) for p in parts])
        if parts
        else CHANGE_LOG.empty_table()
    )
    if snap.num_rows:
        g = snap.group_by(["id", "type", "conv_id"]).aggregate([("level", "max")])
        snap = pa.table(
            {
                "id": g["id"],
                "action": pa.array(["DELETE"] * g.num_rows, pa.string()),
                "type": g["type"],
                "level": pc.cast(g["level_max"], pa.int32()),
                "conv_id": g["conv_id"],
            }
        )
    pq.write_table(snap.cast(CHANGE_LOG), dst + ".tmp")
    os.replace(dst + ".tmp", dst)


def _apply_pending_update(out_dir: str, pid: str) -> None:
    """Finalize an ``on_duplicate="update"`` re-add after the partition's
    CREATE log is written: ids that already existed flip CREATE->UPDATE
    (A4 algebra: upsert), snapshot ids NOT re-created get DELETE rows
    (object vanished in the new version). Idempotent; no-op without a
    pending snapshot; runs on resume too (the snapshot is durable)."""
    import hashlib

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..schemas import CHANGE_LOG

    pend = os.path.join(out_dir, "pending_update", f"{pid}.parquet")
    if not os.path.exists(pend):
        return
    old = pq.read_table(pend)
    log_path = os.path.join(out_dir, "change_log", f"{pid}.parquet")
    logt = pq.read_table(log_path)
    # explicit string type: pa.array([]) is null-typed and pc.is_in
    # rejects a null value_set (empty snapshot = zero-object conv)
    old_ids = pa.array(sorted(set(old["id"].to_pylist())), pa.string())
    carried = pc.is_in(logt["id"], value_set=old_ids)
    action = pc.if_else(
        pc.and_(carried, pc.equal(logt["action"], "CREATE")),
        pa.scalar("UPDATE"),
        logt["action"],
    )
    logt = logt.set_column(logt.schema.get_field_index("action"), "action", action)
    pq.write_table(logt.cast(CHANGE_LOG).combine_chunks(), log_path + ".tmp")
    os.replace(log_path + ".tmp", log_path)
    # DELETE for old objects the new version no longer produces
    new_ids = pa.array(sorted(set(logt["id"].to_pylist())), pa.string())
    gone = old.filter(
        pc.invert(pc.fill_null(pc.is_in(old["id"], value_set=new_ids), False))
    )
    if gone.num_rows:
        digest = hashlib.blake2b(
            "".join(sorted(gone["id"].to_pylist())).encode(), digest_size=8
        ).hexdigest()
        dst = os.path.join(out_dir, "change_log", f"{pid}-update-delete-{digest}.parquet")
        pq.write_table(gone.cast(CHANGE_LOG).combine_chunks(), dst + ".tmp")
        os.replace(dst + ".tmp", dst)
    # the snapshot is removed by the caller only AFTER the partition
    # commits: a crash in between re-runs this (idempotent) flip


def build(
    input_path: str,
    out_dir: str,
    llm_factory: Callable[[], LLMClient] = DeterministicMockLLM,
    commit_groups: int = 1,
    max_tokens: int = MAX_TOKENS,
    extract_batch_size: int = 256,
    fail_after_group: int | None = None,
    conv_complete_shards: bool = True,
    tags_fn: Callable[[str], dict] | None = None,
    on_duplicate: str = "skip",
) -> BuildResult:
    """Run (or resume, or incrementally extend) the full build.
    ``fail_after_group`` injects a crash after N committed groups —
    used by the kill/resume test.

    ``conv_complete_shards=True`` (default, and the layout the
    checkpoint partitioning already requires): each input shard holds
    whole conversations, so reassembly/chunking and graph-build run as
    per-block ``map_batches`` with ZERO all-to-all shuffles. Set False
    for arbitrary row layouts to use the groupby(conv_id) exchange.

    Incremental add (reference ``Graph.build`` on an existing
    repository, ``eschergraph/graph/graph.py:237-273``): re-running
    with EXTRA shards under ``input_path`` appends them as new commit
    groups; committed partitions are never touched (byte-identical).
    Conversations already committed are detected against the documents
    sidecar and, per ``on_duplicate``, either skipped with a logged
    count (default) or raised as ``DocumentAlreadyExistsError``
    (reference ``duplicate_document_check`` parity).

    ``tags_fn(conv_id) -> dict`` attaches filterable Document tags."""
    import ray.data as rd

    os.makedirs(out_dir, exist_ok=True)
    manifest = Manifest(out_dir)
    files = _input_files(input_path)
    if not files:
        raise FileNotFoundError(f"no parquet under {input_path}")
    # The partition→input-shard assignment is itself checkpointed: a
    # resume must keep the original assignment even if called with a
    # different commit_groups, or committed-partition bookkeeping would
    # silently skip shards. NEW files (not in the stored assignment)
    # are appended as new groups — the incremental-add path.
    stored = manifest.data.get("groups")
    new_pids: set[str] = set()
    if stored is not None:
        stored_files = sorted(f for g in stored for f in g)
        missing = set(stored_files) - set(files)
        if missing:
            raise ValueError(
                f"{len(missing)} checkpointed shard(s) vanished from "
                f"{input_path} (e.g. {sorted(missing)[:2]}); use a fresh out_dir"
            )
        groups = list(stored)
        stored_set = set(stored_files)
        new_files = [f for f in files if f not in stored_set]
        if new_files:
            extra = [new_files[g::commit_groups] for g in range(commit_groups)]
            extra = [g for g in extra if g]
            new_pids = {
                f"part-{gid:04d}" for gid in range(len(groups), len(groups) + len(extra))
            }
            groups = groups + extra
            manifest.data["groups"] = groups
            # Persist WHICH partitions are incremental adds together
            # with the assignment (ADVICE r2): the duplicate-document
            # guard must still fire when a crash lands between this
            # append and the partition's commit — on the re-run these
            # pids are no longer "new files" but remain un-committed.
            prev_inc = set(manifest.data.get("incremental_pids", []))
            manifest.data["incremental_pids"] = sorted(prev_inc | new_pids)
            manifest._save()
    else:
        groups = [files[g::commit_groups] for g in range(commit_groups)]
        groups = [g for g in groups if g]
        manifest.data["groups"] = groups
        manifest._save()
    # The extract mode is part of the checkpoint's physical layout:
    # build_logs written with conv_complete_shards=False slice across
    # conversation boundaries, and resuming them through the sharded
    # graph path would build straddling conversations TWICE. Persist the
    # mode with the assignment and let the stored value win on resume.
    stored_mode = manifest.data.setdefault("conv_complete_shards", conv_complete_shards)
    if stored_mode != conv_complete_shards:
        conv_complete_shards = stored_mode
    manifest._save()
    # un-committed incremental partitions from ANY invocation (persisted
    # above) keep their duplicate guard across crashes/resumes
    new_pids |= set(manifest.data.get("incremental_pids", []))

    graph_dirs: list[str] = []
    done = 0
    for gid, group_files in enumerate(groups):
        pid = f"part-{gid:04d}"
        logs_dir = os.path.join(out_dir, "build_logs", pid)
        graph_dir = os.path.join(out_dir, "graph", pid)
        graph_dirs.append(graph_dir)
        pend_file = os.path.join(out_dir, "pending_update", f"{pid}.parquet")
        if manifest.phase_done(pid, "graph"):
            if os.path.exists(pend_file):
                # crash landed between commit and snapshot cleanup:
                # re-apply (idempotent) and clear
                _apply_pending_update(out_dir, pid)
                os.remove(pend_file)
            continue
        t0 = time.monotonic()

        # Duplicate-document guard for incrementally added partitions
        # (duplicate_document_check parity, utils.py:13-41).
        dup_set: set[str] = set()
        if pid in new_pids:
            part_convs = set(
                rd.read_parquet(group_files, columns=["conv_id"]).unique("conv_id")
            )
            dup_set = set(
                _partition_duplicates_from(
                    part_convs, _committed_doc_files(out_dir, manifest)
                )
            )
            if dup_set and on_duplicate == "error":
                raise DocumentAlreadyExistsError(
                    f"{len(dup_set)} conversation(s) in {pid} already exist "
                    f"in the graph (e.g. {sorted(dup_set)[:3]})"
                )
            if dup_set and on_duplicate == "update":
                # Reference UPDATE semantics (change_log.py:12-31 via
                # the repository's merge-on-add paths): re-added
                # conversations REPLACE their old objects. Stage a
                # durable snapshot of the old ids, remove the old rows
                # (their DELETE emission deferred to the snapshot),
                # then build the new version in THIS partition —
                # _apply_pending_update flips carried ids to UPDATE
                # and emits DELETE only for ids the new version lost.
                _stage_pending_update(out_dir, pid, sorted(dup_set))
                remove_documents(out_dir, sorted(dup_set), _defer_delete_log=True)
                dup_set = set()
            if dup_set and dup_set >= part_convs:
                # whole partition is a re-add: a logged no-op
                manifest.mark(
                    pid,
                    "committed",
                    skipped_duplicates=len(dup_set),
                    conv_count=0,
                    wall_ms=int(1000 * (time.monotonic() - t0)),
                )
                # prune here too, or every fully-duplicate re-add leaves
                # its pid in the crash-durable list forever
                inc = manifest.data.get("incremental_pids")
                if inc and pid in inc:
                    manifest.data["incremental_pids"] = sorted(set(inc) - {pid})
                    manifest._save()
                os.makedirs(graph_dir, exist_ok=True)
                continue

        def _drop_dups(ds):
            if not dup_set:
                return ds
            keep = pa.array(sorted(dup_set), pa.string())

            def f(t: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return t.filter(pc.invert(pc.is_in(t["conv_id"], value_set=keep)))

            return ds.map_batches(f, batch_format="pyarrow")

        extracted = manifest.phase_done(pid, "extract")
        if conv_complete_shards and not extracted:
            # Fused single streaming execution for the whole group:
            # read -> chunk -> extract(actor pool, side-writes the
            # build_logs checkpoint per block) -> graph -> write(graph).
            # 1 block per file + batch_size=None keeps every block
            # conversation-complete end to end, so no shuffle is needed.
            import shutil

            logs_tmp = logs_dir + ".tmp"
            shutil.rmtree(logs_tmp, ignore_errors=True)
            # ~2 shards per block: fewer, larger tasks (less per-task
            # overhead) while unions of conv-complete shards stay
            # conv-complete.
            transcripts = _drop_dups(
                rd.read_parquet(
                    group_files, override_num_blocks=max(1, len(group_files) // 2)
                )
            )
            chunks = chunk_conversations_sharded(transcripts, max_tokens=max_tokens)
            logs = extract_build_logs(
                chunks, llm_factory=llm_factory, batch_size=None, side_write_dir=logs_tmp
            )
            graph = build_graph_sharded(logs, llm_factory=llm_factory)
            atomic_dir_write(
                graph_dir,
                lambda tmp: graph.write_parquet(tmp, partition_cols=["kind"]),
            )
            shutil.rmtree(logs_dir, ignore_errors=True)
            os.replace(logs_tmp, logs_dir)
        else:
            if not extracted:
                transcripts = _drop_dups(rd.read_parquet(group_files))
                chunks = chunk_conversations(transcripts, max_tokens=max_tokens)
                logs = extract_build_logs(
                    chunks, llm_factory=llm_factory, batch_size=extract_batch_size
                )
                atomic_dir_write(logs_dir, lambda tmp: logs.write_parquet(tmp))
                manifest.mark(pid, "extracted", **_logs_stats(logs_dir))
            logs_files = [
                os.path.join(logs_dir, f)
                for f in sorted(os.listdir(logs_dir))
                if f.endswith(".parquet")
            ]
            if conv_complete_shards:
                logs_ds = rd.read_parquet(logs_files, override_num_blocks=len(logs_files))
                graph = build_graph_sharded(logs_ds, llm_factory=llm_factory)
            else:
                logs_ds = rd.read_parquet(logs_files)
                graph = build_graph(logs_ds, llm_factory=llm_factory)
            atomic_dir_write(
                graph_dir,
                lambda tmp: graph.write_parquet(tmp, partition_cols=["kind"]),
            )
        # Sidecars: Document records + ChangeLog for this partition.
        # Written (idempotently) before the commit mark so a crash in
        # between re-derives them on resume.
        _write_documents_sidecar(out_dir, pid, logs_dir, tags_fn, graph_dir)
        _write_change_log(out_dir, pid, graph_dir)
        _apply_pending_update(out_dir, pid)
        wall_ms = int(1000 * (time.monotonic() - t0))
        prev_ms = int(manifest.get(pid).get("wall_ms", 0))
        stats = dict(manifest.get(pid))
        stats.pop("status", None)
        stats.update(_graph_stats(graph_dir))
        if "conv_count" not in stats:  # non-fused path has no stats rows
            stats.update(_logs_stats(logs_dir))
        stats["skipped_duplicates"] = len(dup_set)
        stats["wall_ms"] = prev_ms + wall_ms
        manifest.mark(pid, "committed", **stats)
        # prune the committed pid from the crash-durable incremental
        # list (the dup guard only matters while un-committed; without
        # pruning the manifest grows with every incremental add forever)
        inc = manifest.data.get("incremental_pids")
        if inc and pid in inc:
            manifest.data["incremental_pids"] = sorted(set(inc) - {pid})
            manifest._save()
        if os.path.exists(pend_file):
            os.remove(pend_file)
        done += 1
        if fail_after_group is not None and done >= fail_after_group:
            raise RuntimeError(f"injected failure after {done} committed group(s)")

    lineage = manifest.lineage_table()
    import pyarrow.parquet as pq

    pq.write_table(lineage, os.path.join(out_dir, "lineage.parquet"))
    return BuildResult(out_dir=out_dir, graph_dirs=graph_dirs, lineage=lineage)


# ---- readers over the partitioned graph output ------------------------

_KIND_COLUMNS = {
    "node": {
        "id": "node_id",
        "conv_id": "conv_id",
        "name": "name",
        "description": "description",
        "level": "level",
        "properties": "properties",
        "is_visual": "is_visual",
        "community_id": "community_id",
        "child_node_ids": "child_node_ids",
        "metadata": "metadata",
    },
    "edge": {
        "id": "edge_id",
        "conv_id": "conv_id",
        "frm": "frm",
        "to": "to",
        "frm_name": "frm_name",
        "to_name": "to_name",
        "level": "level",
        "description": "description",
        "metadata": "metadata",
    },
    "property": {
        "id": "property_id",
        "node_id": "node_id",
        "conv_id": "conv_id",
        "node_name": "node_name",
        "description": "description",
        "metadata": "metadata",
    },
    "triple": {
        "conv_id": "conv_id",
        "subj": "subj",
        "pred": "pred",
        "obj": "obj",
        "chunk_id": "chunk_id",
    },
}


def load_kind(out_dir: str, kind: str):
    """Read one logical output table back as a Dataset (column-pruned).

    Coalesces MANY-small-file builds into ~32 MiB blocks at the read
    (the round-4 incremental-probe lesson: one block per tiny partition
    file makes per-block fixed costs dominate every downstream shuffle
    — 3.1 s -> 0.5 s on the sf0.1 membership groupby). Size-aware: a
    build whose files already exceed the target keeps file granularity,
    so a real many-TB build loses no read parallelism.
    """
    import math

    import ray.data as rd

    cols = _KIND_COLUMNS[kind]
    paths = []
    graph_root = os.path.join(out_dir, "graph")
    for pid in sorted(os.listdir(graph_root)):
        p = os.path.join(graph_root, pid, f"kind={kind}")
        if os.path.isdir(p):
            paths.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if f.endswith(".parquet")
            )
    import ray

    total = sum(os.path.getsize(p) for p in paths)
    cpus = int(ray.cluster_resources().get("CPU", 8)) if (
        ray.is_initialized()) else 8
    nb = min(len(paths), max(8, cpus, math.ceil(total / (32 << 20))))
    ds = rd.read_parquet(paths, columns=list(cols),
                         override_num_blocks=max(nb, 1))
    if any(k != v for k, v in cols.items()):
        ds = ds.map_batches(
            lambda t, c=cols: t.rename_columns([c[name] for name in t.column_names]),
            batch_format="pyarrow",
        )
    return ds


def build_graph_with_media(
    transcripts_ds,
    media_ds,
    llm_factory: Callable[[], LLMClient] = DeterministicMockLLM,
    max_tokens: int = MAX_TOKENS,
):
    """Text + visual pipelines fused into ONE graph build (M5/M6,
    ``_handle_multi_modal`` build_pipeline.py:310-373): transcript
    chunks -> ExtractorActor logs, attached media -> visual logs
    (stub codec, real plumbing), then the UNION of both log streams
    through the per-conversation graph build — the groupby(conv_id)
    exchange co-locates a conversation's text and visual logs, so
    figures link to text entities and their main visual entity persists
    with ``is_visual=True``."""
    from ..functions.multimodal import media_build_logs

    chunks = chunk_conversations(transcripts_ds, max_tokens=max_tokens)
    logs = extract_build_logs(chunks, llm_factory=llm_factory)
    mlogs = media_build_logs(media_ds, llm_factory=llm_factory)
    return build_graph(logs.union(mlogs), llm_factory=llm_factory)


def _rewrite_one_file(path: str, fn) -> dict:
    """Atomic single-parquet rewrite: ``fn(table) -> (kept_or_None,
    info)``; ``kept=None`` leaves the file untouched. Runs inside a Ray
    task on the mutation paths (tmp+rename on the worker — same
    shared-filesystem assumption as the writer stages)."""
    import pyarrow.parquet as pq

    from ..stages.chunking import pin_arrow_threads

    pin_arrow_threads()
    t = pq.read_table(path)
    kept, info = fn(t)
    if kept is not None:
        pq.write_table(kept.combine_chunks(), path + ".tmp")
        os.replace(path + ".tmp", path)
    return info


_REWRITE_TASK = None


def _parallel_rewrite(jobs: list[tuple[str, Callable]]) -> list[dict]:
    """Task-parallel mutation rewrite (VERDICT r3 #4): one Ray task per
    affected file, driver only aggregates the returned counts / delete
    rows — at 100 TB a document removal fans out over the cluster
    instead of pulling every affected file through one process.
    Results come back in job order (determinism: callers build the job
    list in the same kind/file order the old sequential loop used).
    Falls back inline when Ray isn't initialized (library code never
    calls ray.init)."""
    if not jobs:
        return []
    import ray

    if not ray.is_initialized():
        return [_rewrite_one_file(p, fn) for p, fn in jobs]
    global _REWRITE_TASK
    if _REWRITE_TASK is None:
        _REWRITE_TASK = ray.remote(num_cpus=1)(_rewrite_one_file)
    return ray.get([_REWRITE_TASK.remote(p, fn) for p, fn in jobs])


def _conv_removal_fn(kind: str, pid: str, targets: list[str]):
    """Per-file filter closure for ``remove_documents`` (shipped into
    the rewrite task): drop rows whose conv_id is in ``targets``;
    collect DELETE rows for graph object kinds and the removed turn
    total for document records."""

    def fn(t: pa.Table):
        import pyarrow.compute as pc

        info = {"pid": pid, "kind": kind, "gone": 0, "deletes": [], "turns": 0}
        if "conv_id" not in t.column_names:
            return None, info
        mask = pc.fill_null(
            pc.is_in(t["conv_id"], value_set=pa.array(targets)), False
        )
        n_gone = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
        if n_gone == 0:
            return None, info
        info["gone"] = n_gone
        if kind in ("node", "edge", "property"):
            gone = t.filter(mask)
            info["deletes"] = [
                {
                    "id": i_,
                    "action": "DELETE",
                    "type": kind,
                    "level": l_ if l_ is not None else 0,
                    "conv_id": c_,
                }
                for i_, c_, l_ in zip(
                    gone["id"].to_pylist(),
                    gone["conv_id"].to_pylist(),
                    gone["level"].to_pylist(),
                )
            ]
        if kind == "documents" and "turn_num" in t.column_names:
            info["turns"] = int(pc.sum(t.filter(mask)["turn_num"]).as_py() or 0)
        return t.filter(pc.invert(mask)), info

    return fn


def remove_documents(
    out_dir: str, conv_ids: list[str], _defer_delete_log: bool = False
) -> dict:
    """Remove conversations from a committed graph (the reference's
    ``remove_node_by_id`` cascade, ``simple_repository.py:724-760``,
    lifted to document granularity — level-0 identity is conv-scoped so
    removing a conversation removes its whole subgraph).

    Per affected partition: graph rows, build_logs rows and the
    Document record are filtered out (atomic per-file rewrite), and a
    DELETE ChangeLog row is appended for every removed node / edge /
    property — so ``sync_actions`` over the full log yields the right
    vector-store plan (created-then-deleted ids cancel out,
    ``prepare_sync_data.py:85-90``). Returns removal counts. A removed
    conversation can be re-added incrementally afterwards (the
    duplicate guard consults the documents sidecar, which no longer
    lists it)."""
    import pyarrow.parquet as pq

    from ..schemas import CHANGE_LOG

    targets = set(conv_ids)
    manifest = Manifest(out_dir)
    removed = {"node": 0, "edge": 0, "property": 0, "triple": 0, "documents": 0}

    # affected partitions via the documents sidecar (one row per conv)
    affected: list[str] = []
    for f in _sidecar_files(out_dir, "documents"):
        t = pq.read_table(f, columns=["conv_id"])
        if targets & set(t["conv_id"].to_pylist()):
            affected.append(os.path.basename(f)[: -len(".parquet")])

    # ONE task per affected file across ALL partitions (job order =
    # the old sequential kind/file order, so delete-log row order and
    # counts are unchanged); the driver only aggregates the task infos
    tsorted = sorted(targets)
    jobs: list[tuple[str, Callable]] = []
    for pid in affected:
        graph_dir = os.path.join(out_dir, "graph", pid)
        for kind in ("node", "edge", "property", "triple", "stats", "docrec", "changelog"):
            d = os.path.join(graph_dir, f"kind={kind}")
            if not os.path.isdir(d):
                continue
            for name in sorted(os.listdir(d)):
                if name.endswith(".parquet"):
                    jobs.append(
                        (os.path.join(d, name), _conv_removal_fn(kind, pid, tsorted))
                    )
        logs_dir = os.path.join(out_dir, "build_logs", pid)
        if os.path.isdir(logs_dir):
            for name in sorted(os.listdir(logs_dir)):
                if name.endswith(".parquet"):
                    jobs.append(
                        (os.path.join(logs_dir, name), _conv_removal_fn("logs", pid, tsorted))
                    )
        jobs.append(
            (
                os.path.join(out_dir, "documents", f"{pid}.parquet"),
                _conv_removal_fn("documents", pid, tsorted),
            )
        )
    infos = _parallel_rewrite(jobs)

    by_pid: dict[str, dict] = {
        pid: {"deletes": [], "docs": 0, "chunks": 0, "turns": 0} for pid in affected
    }
    for info in infos:
        agg = by_pid[info["pid"]]
        kind = info["kind"]
        agg["deletes"].extend(info["deletes"])
        if kind == "documents":
            removed["documents"] += info["gone"]
            agg["docs"] += info["gone"]
            agg["turns"] += info["turns"]
        elif kind == "logs":
            agg["chunks"] += info["gone"]
        elif kind in removed:
            removed[kind] += info["gone"]

    for pid in affected:
        delete_rows = by_pid[pid]["deletes"]
        docs_gone = by_pid[pid]["docs"]
        chunks_gone = by_pid[pid]["chunks"]
        turns_gone = by_pid[pid]["turns"]
        graph_dir = os.path.join(out_dir, "graph", pid)
        # append the DELETE change log (idempotent name from content);
        # deferred when the caller manages the log itself (the
        # on_duplicate="update" path, which already staged a durable
        # snapshot and will emit UPDATE/DELETE after the re-add)
        if delete_rows and not _defer_delete_log:
            import hashlib

            logt = pa.Table.from_pylist(delete_rows, schema=CHANGE_LOG)
            digest = hashlib.blake2b(
                "".join(sorted(r["id"] for r in delete_rows)).encode(), digest_size=8
            ).hexdigest()
            dst = os.path.join(out_dir, "change_log", f"{pid}-delete-{digest}.parquet")
            pq.write_table(logt, dst + ".tmp")
            os.replace(dst + ".tmp", dst)
        # lineage counters: footer counts reflect the rewrite; the
        # kind=stats rows are build-time, so conv/chunk/turn counters
        # are adjusted by what this removal took out
        rec = dict(manifest.get(pid))
        rec.pop("status", None)
        stats = _graph_stats(graph_dir)
        for key, gone in (
            ("conv_count", docs_gone),
            ("chunk_count", chunks_gone),
            ("turn_count", turns_gone),
        ):
            if key in stats:
                stats[key] = max(0, stats[key] - gone)
        rec.update(stats)
        manifest.mark(pid, "committed", **rec)
    lineage = manifest.lineage_table()
    pq.write_table(lineage, os.path.join(out_dir, "lineage.parquet"))
    return removed


def remove_node_by_id(out_dir: str, node_id: str) -> dict:
    """Node-granularity mutation — the reference's
    ``Repository.remove_node_by_id`` edge/property cascade
    (``eschergraph/persistence/adapters/simple_repository.py:724-760``):
    delete ONE node, every edge incident to it, every property it owns,
    and (beyond the reference, to keep our flat surfaces consistent)
    its conversation's triples that reference the node's name and its
    id in any community's ``child_node_ids``. A DELETE ChangeLog row is
    appended per removed object so the sync algebra (A4) plans the
    vector-store deletions. Atomic per-file rewrites, idempotent
    (removing an absent id is a no-op returning zero counts)."""
    import hashlib

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..schemas import CHANGE_LOG

    manifest = Manifest(out_dir)
    removed = {"node": 0, "edge": 0, "property": 0, "triple": 0}
    graph_root = os.path.join(out_dir, "graph")
    if not os.path.isdir(graph_root):
        return removed

    # locate the node (its partition, conversation, name, level)
    hit = None
    for pid in sorted(os.listdir(graph_root)):
        d = os.path.join(graph_root, pid, "kind=node")
        if not os.path.isdir(d):
            continue
        # id predicate pushed into the scan: row-group statistics prune
        # instead of decoding every partition's node surface
        row = pads.dataset(d).to_table(
            columns=["id", "conv_id", "name", "level"],
            filter=pads.field("id") == node_id,
        )
        if row.num_rows:
            hit = (
                pid,
                row["conv_id"][0].as_py(),
                row["name"][0].as_py(),
                int(row["level"][0].as_py() or 0),
            )
            break
    if hit is None:
        return removed
    pid, conv_id, name, level = hit
    graph_dir = os.path.join(graph_root, pid)

    def kind_files(kind: str) -> list[str]:
        d = os.path.join(graph_dir, f"kind={kind}")
        if not os.path.isdir(d):
            return []
        return [
            os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
        ]

    def keep_rewrite_fn(kind: str, keep_fn):
        """Per-file closure (shipped into the rewrite task): filter to
        ``keep_fn``'s mask, collecting DELETE rows for object kinds."""

        def fn(t: pa.Table):
            import pyarrow.compute as pc_

            keep = keep_fn(t)
            n_gone = t.num_rows - int(pc_.sum(pc_.cast(keep, pa.int64())).as_py() or 0)
            info = {"kind": kind, "gone": 0, "deletes": []}
            if n_gone == 0:
                return None, info
            info["gone"] = n_gone
            if kind in ("node", "edge", "property"):
                gone = t.filter(pc_.invert(keep))
                info["deletes"] = [
                    {
                        "id": i_,
                        "action": "DELETE",
                        "type": kind,
                        "level": l_ if l_ is not None else 0,
                        "conv_id": c_,
                    }
                    for i_, c_, l_ in zip(
                        gone["id"].to_pylist(),
                        gone["conv_id"].to_pylist(),
                        gone["level"].to_pylist(),
                    )
                ]
            return t.filter(keep), info

        return fn

    # phase 1: node/edge/property (+ level-0 triples) rewrites — one
    # Ray task per file, all kinds concurrent (job order preserves the
    # old sequential kind order for delete-log row determinism)
    keep_fns = {
        "node": lambda t: pc.invert(pc.fill_null(pc.equal(t["id"], node_id), False)),
        "edge": lambda t: pc.invert(
            pc.fill_null(
                pc.or_(pc.equal(t["frm"], node_id), pc.equal(t["to"], node_id)), False
            )
        ),
        "property": lambda t: pc.invert(
            pc.fill_null(pc.equal(t["node_id"], node_id), False)
        ),
    }
    if level == 0:
        keep_fns["triple"] = lambda t: pc.invert(
            pc.fill_null(
                pc.and_(
                    pc.equal(t["conv_id"], conv_id),
                    pc.or_(pc.equal(t["subj"], name), pc.equal(t["obj"], name)),
                ),
                False,
            )
        )
    jobs = [
        (p, keep_rewrite_fn(kind, kfn))
        for kind, kfn in keep_fns.items()
        for p in kind_files(kind)
    ]
    delete_rows: list[dict] = []
    for info in _parallel_rewrite(jobs):
        removed[info["kind"]] = removed.get(info["kind"], 0) + info["gone"]
        delete_rows.extend(info["deletes"])

    # phase 2 (depends on phase-1 delete ids): drop the removed ids from
    # the staged CREATE log partition so a (hypothetical) sidecar
    # re-derivation cannot resurrect them, and cascade the node out of
    # community membership lists (child_node_ids) — again task-parallel
    gone_ids = pa.array(sorted({r["id"] for r in delete_rows}))

    def changelog_keep(t):
        return pc.invert(pc.fill_null(pc.is_in(t["id"], value_set=gone_ids), False))

    def child_cascade_fn(t: pa.Table):
        info = {"kind": "children", "gone": 0, "deletes": []}
        if "child_node_ids" not in t.column_names:
            return None, info
        kids = t["child_node_ids"].to_pylist()
        if not any(row and node_id in row for row in kids):
            return None, info
        new_kids = [
            [k for k in (row or []) if k != node_id] if row is not None else None
            for row in kids
        ]
        idx = t.schema.get_field_index("child_node_ids")
        return (
            t.set_column(idx, "child_node_ids", pa.array(new_kids, t.schema.field(idx).type)),
            info,
        )

    _parallel_rewrite(
        [(p, keep_rewrite_fn("changelog", changelog_keep)) for p in kind_files("changelog")]
        + [(p, child_cascade_fn) for p in kind_files("node")]
    )
    # DELETE change log (idempotent, content-addressed name)
    if delete_rows:
        logt = pa.Table.from_pylist(delete_rows, schema=CHANGE_LOG)
        digest = hashlib.blake2b(
            "".join(sorted(r["id"] for r in delete_rows)).encode(), digest_size=8
        ).hexdigest()
        dst = os.path.join(out_dir, "change_log", f"{pid}-nodedel-{digest}.parquet")
        pq.write_table(logt, dst + ".tmp")
        os.replace(dst + ".tmp", dst)
    # lineage counters reflect the rewrite
    rec = dict(manifest.get(pid))
    rec.pop("status", None)
    rec.update(_graph_stats(graph_dir))
    manifest.mark(pid, "committed", **rec)
    pq.write_table(
        manifest.lineage_table(), os.path.join(out_dir, "lineage.parquet")
    )
    return removed


def load_graph_union(out_dir: str, kinds: tuple = ("node", "edge", "property")):
    """Graph rows as one Dataset with the ``kind`` column re-attached
    explicitly from the partition directory (the hive partition column
    is dropped by the writer; recovering it from column null-ness is
    fragile — VERDICT r1)."""
    import ray.data as rd

    graph_root = os.path.join(out_dir, "graph")
    union = None
    for kind in kinds:
        files = []
        for pid in sorted(os.listdir(graph_root)):
            d = os.path.join(graph_root, pid, f"kind={kind}")
            if os.path.isdir(d):
                files.extend(
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                )
        if not files:
            continue

        def tag(t: pa.Table, k=kind) -> pa.Table:
            return t.append_column("kind", pa.array([k] * len(t), pa.string()))

        # partitioning=None: hive inference would re-add "kind" for
        # SOME blocks only (schema-alternation hazard); we attach it
        # uniformly ourselves
        ds = rd.read_parquet(files, partitioning=None).map_batches(
            tag, batch_format="pyarrow"
        )
        union = ds if union is None else union.union(ds)
    return union


def _sidecar_files(out_dir: str, name: str) -> list[str]:
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")
    )


def load_documents_arrow(out_dir: str) -> pa.Table:
    """The graph's Document records (conv_id, chunk/token/turn counts,
    tags) — the reference's ``Repository.get_all_documents`` analogue."""
    from ..schemas import DOCUMENTS_TABLE

    files = _sidecar_files(out_dir, "documents")
    if not files:
        return DOCUMENTS_TABLE.empty_table()
    import pyarrow.parquet as pq

    return pa.concat_tables([pq.read_table(f) for f in files])


def list_available_tags(out_dir: str) -> dict[str, str]:
    """Tag name -> value type name over all Document records
    (``simple_repository.py:684-690`` parity: the repository tracks the
    type of each tag for filter building)."""
    import json

    out: dict[str, str] = {}
    t = load_documents_arrow(out_dir)
    for s in t["tags"].to_pylist():
        for k, v in (json.loads(s) if s else {}).items():
            out.setdefault(k, type(v).__name__)
    return out


def load_change_log(out_dir: str):
    """The build's ChangeLog as a Dataset (one CREATE per persisted
    node/edge/property, per partition) — feeds ``sync_actions``."""
    import ray.data as rd

    from ..schemas import CHANGE_LOG

    files = _sidecar_files(out_dir, "change_log")
    if not files:
        return rd.from_arrow(CHANGE_LOG.empty_table())
    return rd.read_parquet(files)


def get_max_level(out_dir: str) -> int:
    """A7 (``simple_repository.py:570-576``): highest node level in the
    graph — a footer-cheap column scan over the node partitions."""
    files = []
    graph_root = os.path.join(out_dir, "graph")
    if os.path.isdir(graph_root):
        for pid in sorted(os.listdir(graph_root)):
            d = os.path.join(graph_root, pid, "kind=node")
            if os.path.isdir(d):
                files.extend(
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                )
    if not files:
        return 0
    import ray.data as rd

    return int(rd.read_parquet(files, columns=["level"]).max("level") or 0)


def load_kind_arrow(out_dir: str, kind: str, filter=None) -> pa.Table:
    """Driver-side Arrow read for small results (tests/oracle checks).

    ``filter`` is an optional ``pyarrow.dataset`` expression over the
    PHYSICAL column names (e.g. ``pc.field("conv_id") == x``); it is
    pushed into the parquet scan so only matching row groups decode —
    use it whenever the caller wants a small slice of a large build.
    """
    cols = _KIND_COLUMNS[kind]
    graph_root = os.path.join(out_dir, "graph")
    tables = []
    for pid in sorted(os.listdir(graph_root)):
        p = os.path.join(graph_root, pid, f"kind={kind}")
        if os.path.isdir(p):
            t = pads.dataset(p).to_table(columns=list(cols), filter=filter)
            tables.append(t)
    tab = pa.concat_tables(tables) if tables else None
    if tab is None:
        return pa.table({v: [] for v in cols.values()})
    return tab.rename_columns([cols[name] for name in tab.column_names])
