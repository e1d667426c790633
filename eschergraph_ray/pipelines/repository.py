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
