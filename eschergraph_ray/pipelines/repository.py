"""Repository-facade point lookups over the partitioned build output.

The reference's ``Repository`` abstract API
(``eschergraph/persistence/repository.py:26-241``) is an object-graph
store; this module restates its READ surface over our flat,
kind-partitioned parquet output so a user of the reference can call the
same operations against a build directory:

- ``get_node_by_id`` / ``get_edge_by_id`` / ``get_property_by_id``
  (``repository.py:87-128``) — single-object lookups,
- ``get_node_by_name`` (``repository.py:50-68``) — level-0 node by
  (name, document) pair,
- ``get_document_by_id`` / ``get_document_by_name`` /
  ``get_all_documents`` (``repository.py:199-231``),
- ``list_available_tags`` (``repository.py:232-240``,
  ``simple_repository.py:684-690``): tag name -> python type name,
- ``clear_change_log`` (``repository.py:158-166``,
  ``simple_repository.py:602-608``).

Already covered elsewhere: ``get_max_level`` / ``get_all_at_level`` /
``get_change_log`` (``build.get_max_level``, ``build.load_kind`` +
level filter, the ``change_log/`` sidecar), mutation
(``build.remove_node_by_id`` / ``build.remove_documents`` /
incremental ``build.build``), ``filter_documents_by_tags``
(``functions/tags.py``).

Point mutations (the reference ``Repository.add_node`` update path,
``simple_repository.py:283-349``): ``update_node_description`` and
``add_property`` rewrite exactly the located partition's files through
the same task-parallel tmp+rename machinery as ``remove_node_by_id``
and append UPDATE / CREATE change-log rows so ``sync_actions`` (A4)
plans the vector-store upsert.

Scale note: point lookups push their predicate into the parquet scan
(only row groups whose column statistics admit the key decode), which
is the right primitive for a batch engine. A low-latency serving path
would additionally maintain an id -> partition index; the reference
needs none because its whole graph is one in-memory pickle — that
design is exactly what this engine exists to avoid at 100 TB.
"""

from __future__ import annotations

import os

import pyarrow.dataset as pads

from .build import (  # noqa: F401  (re-exports: the facade is complete here)
    _sidecar_files,
    get_max_level,
    list_available_tags,
    load_change_log,
    load_kind_arrow,
)


def _one(table) -> dict | None:
    rows = table.to_pylist()
    return rows[0] if rows else None


def get_node_by_id(out_dir: str, node_id: str) -> dict | None:
    """``Repository.get_node_by_id`` (repository.py:87-100)."""
    return _one(load_kind_arrow(out_dir, "node", filter=pads.field("id") == node_id))


def get_edge_by_id(out_dir: str, edge_id: str) -> dict | None:
    """``Repository.get_edge_by_id`` (repository.py:101-114)."""
    return _one(load_kind_arrow(out_dir, "edge", filter=pads.field("id") == edge_id))


def get_property_by_id(out_dir: str, property_id: str) -> dict | None:
    """``Repository.get_property_by_id`` (repository.py:115-128)."""
    return _one(
        load_kind_arrow(out_dir, "property", filter=pads.field("id") == property_id)
    )


def get_node_by_name(out_dir: str, name: str, conv_id: str) -> dict | None:
    """``Repository.get_node_by_name`` (repository.py:50-68,
    simple_repository.py:470-494): the level-0 node with this name
    extracted from this conversation (the reference's document). Names
    are stored F1-normalized (strip + whitespace-collapse + lower), so
    the lookup applies the same normalization."""
    from ..functions.text import normalize_name

    flt = (
        (pads.field("conv_id") == conv_id)
        & (pads.field("name") == normalize_name(name))
        & (pads.field("level") == 0)
    )
    return _one(load_kind_arrow(out_dir, "node", filter=flt))


def _documents_dataset(out_dir: str):
    files = _sidecar_files(out_dir, "documents")
    return pads.dataset(files) if files else None


def get_document_by_id(out_dir: str, conv_id: str) -> dict | None:
    """``Repository.get_document_by_id`` (repository.py:199-210). The
    conversation id IS the document identity in this engine (the
    reference's separate uuid/name both map to it), so
    ``get_document_by_name`` is the same lookup."""
    d = _documents_dataset(out_dir)
    if d is None:
        return None
    return _one(d.to_table(filter=pads.field("conv_id") == conv_id))


def get_document_by_name(out_dir: str, name: str) -> dict | None:
    """``Repository.get_document_by_name`` (repository.py:220-231)."""
    return get_document_by_id(out_dir, name)


def get_all_documents(out_dir: str):
    """``Repository.get_all_documents`` (repository.py:211-219) as a
    streaming Dataset over the documents sidecar (one row per
    conversation — never a driver concat). Empty builds yield an empty
    Dataset with the documents schema, like the other getters' None."""
    import ray.data as rd

    files = _sidecar_files(out_dir, "documents")
    if not files:
        from ..schemas import DOCUMENTS_TABLE

        return rd.from_arrow(DOCUMENTS_TABLE.empty_table())
    return rd.read_parquet(files)


def _locate_node(out_dir: str, node_id: str):
    """(partition_id, node row) for a node id, or None — id predicate
    pushed into the parquet scan (row-group statistics prune)."""
    graph_root = os.path.join(out_dir, "graph")
    if not os.path.isdir(graph_root):
        return None
    for pid in sorted(os.listdir(graph_root)):
        d = os.path.join(graph_root, pid, "kind=node")
        if not os.path.isdir(d):
            continue
        t = pads.dataset(d).to_table(filter=pads.field("id") == node_id)
        if t.num_rows:
            return pid, t.to_pylist()[0]
    return None


def _append_change_log(out_dir: str, pid: str, tag: str, rows: list[dict]) -> None:
    """Content-addressed, atomic change-log sidecar append (same naming
    scheme as the removal paths' delete logs — idempotent re-runs land
    on the same file name)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..schemas import CHANGE_LOG

    logt = pa.Table.from_pylist(rows, schema=CHANGE_LOG)
    digest = hashlib.blake2b(
        "".join(sorted(r["action"] + r["id"] for r in rows)).encode(), digest_size=8
    ).hexdigest()
    dst = os.path.join(out_dir, "change_log", f"{pid}-{tag}-{digest}.parquet")
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    pq.write_table(logt, dst + ".tmp")
    os.replace(dst + ".tmp", dst)


def update_node_description(out_dir: str, node_id: str, description: str) -> dict | None:
    """Single-object attribute update (reference ``Repository.add_node``
    on an EXISTING node, ``simple_repository.py:283-349`` — our node
    identity is (conv, level, name)-derived, so a description change
    keeps the id stable). Rewrites only the located partition's node
    files (task-parallel tmp+rename) and appends an UPDATE change-log
    row so the sync planner (A4) re-embeds the node. Returns the
    updated row, or None when the id does not exist."""
    from .build import _parallel_rewrite

    hit = _locate_node(out_dir, node_id)
    if hit is None:
        return None
    pid, row = hit
    d = os.path.join(out_dir, "graph", pid, "kind=node")

    def set_desc(t):
        import pyarrow as pa
        import pyarrow.compute as pc

        mask = pc.fill_null(pc.equal(t["id"], node_id), False)
        if not pc.any(mask).as_py():
            return None, {}
        idx = t.schema.get_field_index("description")
        field_t = t.schema.field(idx).type
        new = pc.if_else(mask, pa.scalar(description, field_t), t["description"])
        return t.set_column(idx, "description", new), {}

    _parallel_rewrite(
        [
            (os.path.join(d, f), set_desc)
            for f in sorted(os.listdir(d))
            if f.endswith(".parquet")
        ]
    )
    _append_change_log(
        out_dir,
        pid,
        "nodeupd",
        [
            {
                "id": node_id,
                "action": "UPDATE",
                "type": "node",
                "level": int(row.get("level") or 0),
                "conv_id": row.get("conv_id"),
            }
        ],
    )
    row["description"] = description
    return row


def add_property(out_dir: str, node_id: str, description: str) -> dict | None:
    """Add one property to an existing node (reference
    ``Repository.add_property`` through-node persistence,
    ``simple_repository.py:283-349`` properties branch): a new
    kind=property row with the build's deterministic id
    (``ids.property_id``), the owning node's ``properties`` list
    updated (kept sorted — build convention, graph_build.py:546), a
    CREATE change-log row for the property and an UPDATE row for the
    node. Idempotent: re-adding an existing (node, description)
    property is a no-op returning the existing row."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..ids import property_id as make_property_id
    from .build import _parallel_rewrite

    hit = _locate_node(out_dir, node_id)
    if hit is None:
        return None
    pid, node_row = hit
    prop_id = make_property_id(node_id, description)
    existing = get_property_by_id(out_dir, prop_id)
    if existing is not None:
        return existing

    graph_dir = os.path.join(out_dir, "graph", pid)
    prop_dir = os.path.join(graph_dir, "kind=property")
    os.makedirs(prop_dir, exist_ok=True)
    # the new row uses the partition's physical file schema (GRAPH_UNION
    # minus the hive column) so downstream multi-file reads never see
    # alternating schemas
    template = next(
        (
            os.path.join(graph_dir, f"kind={k}", f)
            for k in ("property", "node")
            for f in sorted(os.listdir(os.path.join(graph_dir, f"kind={k}")))
            if f.endswith(".parquet")
        ),
        None,
    )
    schema = pq.read_schema(template)
    vals = {
        "conv_id": node_row.get("conv_id"),
        "id": prop_id,
        "node_id": node_id,
        "node_name": node_row.get("name"),
        "description": description,
        "metadata": [],
    }
    arrays = [
        pa.array([vals.get(f.name)], f.type) if f.name in vals else pa.nulls(1, f.type)
        for f in schema
    ]
    dst = os.path.join(prop_dir, f"pointadd-{prop_id}.parquet")
    pq.write_table(pa.Table.from_arrays(arrays, schema=schema), dst + ".tmp")
    os.replace(dst + ".tmp", dst)

    # owning node's properties list gains the description (sorted)
    def add_to_node(t):
        import pyarrow.compute as pc

        mask = pc.fill_null(pc.equal(t["id"], node_id), False)
        if not pc.any(mask).as_py():
            return None, {}
        idx = t.schema.get_field_index("properties")
        props = t["properties"].to_pylist()
        flags = mask.to_pylist()
        for i, hit_ in enumerate(flags):
            if hit_:
                cur = list(props[i] or [])
                if description not in cur:
                    props[i] = sorted(cur + [description])
        return (
            t.set_column(idx, "properties", pa.array(props, t.schema.field(idx).type)),
            {},
        )

    node_dir = os.path.join(graph_dir, "kind=node")
    _parallel_rewrite(
        [
            (os.path.join(node_dir, f), add_to_node)
            for f in sorted(os.listdir(node_dir))
            if f.endswith(".parquet")
        ]
    )
    level = int(node_row.get("level") or 0)
    _append_change_log(
        out_dir,
        pid,
        "propadd",
        [
            {"id": prop_id, "action": "CREATE", "type": "property",
             "level": level, "conv_id": node_row.get("conv_id")},
            {"id": node_id, "action": "UPDATE", "type": "node",
             "level": level, "conv_id": node_row.get("conv_id")},
        ],
    )
    return get_property_by_id(out_dir, prop_id)


def clear_change_log(out_dir: str) -> int:
    """``Repository.clear_change_log`` (simple_repository.py:602-608):
    empty the change log after an external sync. The sidecar files are
    MOVED (atomic renames) into ``change_log_cleared/`` rather than
    deleted, so provenance survives while ``get_change_log`` readers of
    ``change_log/`` see an empty log. Returns the number of files
    cleared. Idempotent."""
    src = os.path.join(out_dir, "change_log")
    dst = os.path.join(out_dir, "change_log_cleared")
    files = _sidecar_files(out_dir, "change_log")
    if not files:
        return 0
    os.makedirs(dst, exist_ok=True)
    moved = 0
    for f in files:
        target = os.path.join(dst, os.path.basename(f))
        # repeated clear cycles re-archive same-named sidecar files;
        # probe until a FREE name so no earlier archive is overwritten
        if os.path.exists(target):
            root, ext = os.path.splitext(os.path.basename(f))
            k = 0
            while os.path.exists(os.path.join(dst, f"{root}-{k}{ext}")):
                k += 1
            target = os.path.join(dst, f"{root}-{k}{ext}")
        os.replace(f, target)
        moved += 1
    # never remove the (now empty) change_log dir: incremental adds
    # append future logs there
    assert os.path.isdir(src)
    return moved
