"""Arrow schemas — the contract between pipeline stages (FIXTURES.md §1-3).

All inter-stage IR is Arrow; every ``map_batches`` uses
``batch_format="pyarrow"`` unless a kernel needs pandas. Reference
analogues cited per table.
"""

from __future__ import annotations

import pyarrow as pa

# Primary input (BASELINE.json input_hint).
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.large_string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Chunk analogue (eschergraph/builder/models.py:17-24); chunk_id monotone
# per conversation (tests/builder/test_reader.py:22-33).
CHUNKS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("chunk_id", pa.int32()),
        ("text", pa.large_string()),
        ("turn_first", pa.int32()),
        ("turn_last", pa.int32()),
        ("n_tokens", pa.int32()),
    ]
)

_NODE_EXT = pa.struct([("name", pa.string()), ("description", pa.string())])
_EDGE_EXT = pa.struct(
    [("source", pa.string()), ("target", pa.string()), ("relationship", pa.string())]
)
_PROP_EXT = pa.struct(
    [("entity_name", pa.string()), ("properties", pa.list_(pa.string()))]
)

# BuildLog analogue (eschergraph/builder/build_log.py:40-49) — one row per
# chunk, nested NodeExt/EdgeExt/PropertyExt columns.
BUILD_LOGS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("chunk_id", pa.int32()),
        ("chunk_text", pa.large_string()),
        ("nodes", pa.list_(_NODE_EXT)),
        ("edges", pa.list_(_EDGE_EXT)),
        ("properties", pa.list_(_PROP_EXT)),
    ]
)

_METADATA = pa.list_(
    pa.struct([("document_id", pa.string()), ("chunk_id", pa.int32())])
)

# NodeModel analogue (simple_repository/models.py:23-34).
NODES = pa.schema(
    [
        ("node_id", pa.string()),
        ("conv_id", pa.string()),
        ("name", pa.string()),
        ("description", pa.large_string()),
        ("level", pa.int32()),
        ("properties", pa.list_(pa.string())),
        ("is_visual", pa.bool_()),
        ("community_id", pa.string()),
        ("child_node_ids", pa.list_(pa.string())),
        ("metadata", _METADATA),
    ]
)

# EdgeModel analogue (simple_repository/models.py:37-43); undirected, no
# self-loops (eschergraph/graph/edge.py:62-65).
EDGES = pa.schema(
    [
        ("edge_id", pa.string()),
        ("conv_id", pa.string()),
        ("frm", pa.string()),
        ("to", pa.string()),
        ("frm_name", pa.string()),
        ("to_name", pa.string()),
        ("level", pa.int32()),
        ("description", pa.large_string()),
        ("metadata", _METADATA),
    ]
)

# PropertyModel analogue (simple_repository/models.py:15-20).
PROPERTIES = pa.schema(
    [
        ("property_id", pa.string()),
        ("node_id", pa.string()),
        ("conv_id", pa.string()),
        ("node_name", pa.string()),
        ("description", pa.large_string()),
        ("metadata", _METADATA),
    ]
)

# Flat P/R comparison surface — EdgeExt after canonicalization
# (build_log.py:18-23); compared order-insensitively on
# (conv_id, subj, pred, obj).
TRIPLES = pa.schema(
    [
        ("conv_id", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.large_string()),
        ("obj", pa.string()),
        ("chunk_id", pa.int32()),
    ]
)

# Vector-sync analogue (eschergraph/tools/prepare_sync_data.py:44-75).
EMBEDDINGS = pa.schema(
    [
        ("id", pa.string()),
        ("text", pa.large_string()),
        ("type", pa.string()),  # "node" | "edge" | "property"
        ("level", pa.int32()),
        ("document_id", pa.string()),
        ("embedding", pa.list_(pa.float32())),
    ]
)

# Per-partition checkpoint/lineage record (north_rule).
LINEAGE = pa.schema(
    [
        ("partition_id", pa.string()),
        ("status", pa.string()),
        ("conv_count", pa.int64()),
        ("turn_count", pa.int64()),
        ("chunk_count", pa.int64()),
        ("triple_count", pa.int64()),
        ("node_count", pa.int64()),
        ("edge_count", pa.int64()),
        ("quarantined_count", pa.int64()),
        ("skipped_duplicates", pa.int64()),
        ("wall_ms", pa.int64()),
    ]
)

# Document record analogue (eschergraph/persistence/document.py:10-29):
# one row per committed conversation, written as a per-partition sidecar
# (out_dir/documents/part-*.parquet). ``tags`` is a canonical compact
# JSON object — the (semi-)structured metadata used for filtering
# (filter_documents_by_tags, simple_repository.py:693-723).
DOCUMENTS_TABLE = pa.schema(
    [
        ("conv_id", pa.string()),
        ("chunk_num", pa.int64()),
        ("token_num", pa.int64()),
        ("turn_num", pa.int64()),
        ("tags", pa.string()),
    ]
)

# ChangeLog analogue (eschergraph/persistence/change_log.py:12-31):
# emitted per committed partition for every persisted node / edge /
# property; consumed by the vector-sync planner
# (tools/prepare_sync_data.py:13-93 via functions/changelog.py).
CHANGE_LOG = pa.schema(
    [
        ("id", pa.string()),
        ("action", pa.string()),  # CREATE | UPDATE | DELETE
        ("type", pa.string()),  # node | edge | property
        ("level", pa.int32()),
        ("conv_id", pa.string()),
    ]
)

# Union row layout for the single-pass graph sink: all graph tables are
# emitted from one per-conversation map_groups and written with
# partition_cols=["kind"], so each output table streams to its own
# directory without re-running the pipeline per table.
GRAPH_UNION = pa.schema(
    [
        ("kind", pa.string()),  # node | edge | property | triple
        ("conv_id", pa.string()),
        ("id", pa.string()),
        ("name", pa.string()),
        ("description", pa.large_string()),
        ("level", pa.int32()),
        ("frm", pa.string()),
        ("to", pa.string()),
        ("frm_name", pa.string()),
        ("to_name", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.large_string()),
        ("obj", pa.string()),
        ("chunk_id", pa.int32()),
        ("node_id", pa.string()),
        ("node_name", pa.string()),
        ("properties", pa.list_(pa.string())),
        ("is_visual", pa.bool_()),
        ("community_id", pa.string()),
        ("child_node_ids", pa.list_(pa.string())),
        ("metadata", _METADATA),
        # kind="stats" rows only: per-block lineage counters, so the
        # checkpoint manifest needs no post-hoc scan of build_logs
        ("stat_convs", pa.int64()),
        ("stat_chunks", pa.int64()),
        ("stat_turns", pa.int64()),
        ("stat_quarantined", pa.int64()),
        # kind="docrec" rows only (one per conversation, emitted inside
        # the graph stage PRE quarantine-filter): the Document-record
        # counters, so the documents sidecar needs no driver-side
        # re-scan of the chunk-level build_logs (VERDICT r2 #8).
        # stat_chunks / stat_turns are shared with kind="stats".
        ("stat_tokens", pa.int64()),
        # kind="changelog" rows only: the object type (node | edge |
        # property) of an in-stage-emitted CREATE change-log row; id /
        # conv_id / level are carried in their shared columns.
        ("cl_type", pa.string()),
    ]
)
