"""eschergraph_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the query / data-processing
capabilities of PinkDot-AI/eschergraph (reference at /root/reference,
cited by file:line in docstrings) expressed as streaming
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- transcripts (Parquet) -> groupby(conv_id)+sort(turn_idx) reassembly ->
  chunking -> actor-pool triple extraction -> per-conversation entity
  canonicalization -> node/edge/property/triple materialization ->
  Louvain community summarization -> partitioned Parquet outputs with
  per-partition lineage and checkpoint/resume.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
session is owned by the caller (driver, bench.py, or the test fixture).
"""

__version__ = "0.2.0"

from .pipelines.build import (  # noqa: E402
    build,
    build_graph_with_media,
    get_max_level,
    load_change_log,
    load_documents_arrow,
    load_graph_union,
    load_kind,
    load_kind_arrow,
    remove_documents,
)
from .functions.joins import asof_join, interval_join  # noqa: E402
from .pipelines.dashboard import gather_dashboard  # noqa: E402
from .pipelines.repository import (  # noqa: E402
    clear_change_log,
    get_document_by_id,
    get_document_by_name,
    get_edge_by_id,
    get_node_by_id,
    get_node_by_name,
    get_property_by_id,
    list_available_tags,
)
from .pipelines.search import (  # noqa: E402
    attribute_search,
    global_answer,
    global_search,
    quick_search,
    rag_answer,
)

__all__ = [
    "build",
    "build_graph_with_media",
    "remove_documents",
    "get_max_level",
    "load_kind",
    "load_kind_arrow",
    "load_graph_union",
    "load_documents_arrow",
    "load_change_log",
    "gather_dashboard",
    "quick_search",
    "global_search",
    "attribute_search",
    "rag_answer",
    "global_answer",
    "asof_join",
    "interval_join",
    "get_node_by_id",
    "get_node_by_name",
    "get_edge_by_id",
    "get_property_by_id",
    "get_document_by_id",
    "get_document_by_name",
    "list_available_tags",
    "clear_change_log",
]
