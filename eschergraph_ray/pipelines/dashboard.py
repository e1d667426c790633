"""Dashboard / reporting analogues.

Reference: ``DashboardMaker.gather_data``
(``eschergraph/visualization/dashboard_maker.py:33-110``) — graph-wide
counts plus top-5 nodes by degree and top-3 communities by size (A5:
``nlargest(..., key=len(edges))``) — and the pyvis HTML visualizer
(``eschergraph/visualization/visualizer.py:22-96``). Restated as
Dataset aggregations over the materialized graph output:

- counts: ``ds.count()`` per kind / level,
- degree: explode edge endpoints -> groupby(node) count -> global
  ``sort desc + limit k`` (the only global sort, over tiny data),
- community sizes: level-1 nodes' ``child_node_ids`` lengths.

``visualize_html`` writes a dependency-free self-contained HTML (inline
SVG force-free radial layout) for a sampled conversation — the pyvis
analogue without pyvis.
"""

from __future__ import annotations

import html
import math
import os

import pyarrow as pa
import pyarrow.compute as pc


def gather_dashboard(out_dir: str) -> dict:
    """Counts + top-k report over a build's graph output (driver-side
    result; all aggregation distributed)."""
    from ray.data.aggregate import Count

    from .build import load_kind

    nodes = load_kind(out_dir, "node")
    edges = load_kind(out_dir, "edge")
    props = load_kind(out_dir, "property")

    level_counts = {
        r["level"]: r["count()"]
        for r in nodes.groupby("level").aggregate(Count()).take_all()
    }

    # top-5 nodes by degree (dashboard_maker.py:54-56)
    def explode_endpoints(batch: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [batch["frm"].combine_chunks(), batch["to"].combine_chunks()]
        )
        names = pa.concat_arrays(
            [batch["frm_name"].combine_chunks(), batch["to_name"].combine_chunks()]
        )
        return pa.table({"node_id": ids, "name": names})

    deg = (
        edges.map_batches(explode_endpoints, batch_format="pyarrow")
        .groupby(["node_id", "name"])
        .aggregate(Count(alias_name="degree"))
        .sort(["degree", "node_id"], descending=[True, False])
        .limit(5)
        .take_all()
    )

    # top-3 communities by member count
    def comm_sizes(batch: pa.Table) -> pa.Table:
        lvl1 = batch.filter(pc.equal(batch["level"], 1))
        sizes = pc.list_value_length(lvl1["child_node_ids"])
        return pa.table({"community_id": lvl1["node_id"], "name": lvl1["name"], "size": sizes})

    top_comms = (
        nodes.map_batches(comm_sizes, batch_format="pyarrow")
        .sort(["size", "community_id"], descending=[True, False])
        .limit(3)
        .take_all()
    )

    # sidecar counts (footer-only scans)
    import pyarrow.parquet as pq

    from .build import _sidecar_files

    doc_count = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in _sidecar_files(out_dir, "documents")
    )
    log_count = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in _sidecar_files(out_dir, "change_log")
    )

    return {
        "node_count": int(sum(level_counts.values())),
        "nodes_by_level": {int(k): int(v) for k, v in sorted(level_counts.items())},
        "edge_count": edges.count(),
        "property_count": props.count(),
        "document_count": doc_count,
        "change_log_count": log_count,
        "top_nodes_by_degree": [
            {"node_id": r["node_id"], "name": r["name"], "degree": int(r["degree"])}
            for r in deg
        ],
        "top_communities_by_size": [
            {"community_id": r["community_id"], "name": r["name"], "size": int(r["size"])}
            for r in top_comms
        ],
    }


def visualize_html(out_dir: str, conv_id: str, path: str) -> str:
    """Self-contained SVG visual of one conversation's level-0 graph
    (visualizer.py analogue; community-colored)."""
    import pyarrow.dataset as pads

    from .build import load_kind_arrow

    # predicate pushed into the parquet scan: only row groups containing
    # this conversation decode — never the whole graph on the driver
    conv_filter = (pads.field("conv_id") == conv_id) & (pads.field("level") == 0)
    nodes = load_kind_arrow(out_dir, "node", filter=conv_filter)
    edges = load_kind_arrow(out_dir, "edge", filter=conv_filter)
    n = nodes.num_rows
    ids = nodes["node_id"].to_pylist()
    names = nodes["name"].to_pylist()
    comms = nodes["community_id"].to_pylist()
    palette = ["#4c78a8", "#f58518", "#54a24b", "#e45756", "#72b7b2", "#b279a2"]
    comm_ix = {c: i for i, c in enumerate(sorted(set(comms)))}
    pos = {}
    for i, nid in enumerate(ids):
        a = 2 * math.pi * i / max(1, n)
        pos[nid] = (400 + 320 * math.cos(a), 400 + 320 * math.sin(a))
    parts = [
        "<!DOCTYPE html><html><body>",
        f"<h3>conversation {html.escape(conv_id)} — {n} entities</h3>",
        '<svg width="800" height="800">',
    ]
    for frm, to in zip(edges["frm"].to_pylist(), edges["to"].to_pylist()):
        if frm in pos and to in pos:
            (x1, y1), (x2, y2) = pos[frm], pos[to]
            parts.append(
                f'<line x1="{x1:.0f}" y1="{y1:.0f}" x2="{x2:.0f}" y2="{y2:.0f}" stroke="#bbb"/>'
            )
    for nid, name, comm in zip(ids, names, comms):
        x, y = pos[nid]
        color = palette[comm_ix.get(comm, 0) % len(palette)]
        parts.append(f'<circle cx="{x:.0f}" cy="{y:.0f}" r="9" fill="{color}"/>')
        parts.append(
            f'<text x="{x + 11:.0f}" y="{y + 4:.0f}" font-size="10">{html.escape(name)}</text>'
        )
    parts.append("</svg></body></html>")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("\n".join(parts))
    return path
