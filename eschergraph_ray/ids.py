"""Deterministic identifiers.

The reference assigns ``uuid4`` identities to every Node/Edge/Property
(``eschergraph/graph/base.py:24``), which makes reruns non-comparable.
We replace them with content-derived blake2b digests so that resume is
idempotent and P/R comparisons are stable (SURVEY.md §7.0).
"""

from __future__ import annotations

import hashlib

_SEP = "\x1f"  # unit separator — cannot appear in normalized names


def _digest(*parts: str) -> str:
    h = hashlib.blake2b(digest_size=16)
    h.update(_SEP.join(parts).encode("utf-8"))
    return h.hexdigest()


def node_id(conv_id: str, level: int, name_norm: str) -> str:
    """Stable node identity.

    Mirrors the reference invariant that ``(document_id, lower(name))``
    is unique at level 0 (``eschergraph/graph/node.py:90-105``); our
    document is the conversation.
    """
    return _digest("node", conv_id, str(level), name_norm)


def edge_id(frm_node_id: str, to_node_id: str, description: str) -> str:
    """Stable edge identity — **undirected**: equality of an Edge in the
    reference is ``{frm, to} + description`` (``eschergraph/graph/edge.py:87-104``),
    so the endpoint pair is sorted before hashing.
    """
    a, b = sorted((frm_node_id, to_node_id))
    return _digest("edge", a, b, description)


def property_id(owner_node_id: str, description: str) -> str:
    return _digest("property", owner_node_id, description)


def chunk_uid(conv_id: str, chunk_id: int) -> str:
    return _digest("chunk", conv_id, str(chunk_id))
