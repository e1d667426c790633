"""Zero-shuffle (conv-complete-shard) paths must match the general
groupby paths, and the Louvain replacement must behave."""

import random

import pyarrow as pa
import ray.data as rd

from eschergraph_ray.functions.community import louvain_communities
from eschergraph_ray.sources.transcripts import generate_transcripts_table
from eschergraph_ray.stages.chunking import (
    chunk_batch,
    chunk_conversations,
)
from eschergraph_ray.stages.extraction import ExtractorActor
from eschergraph_ray.stages.graph_build import build_graph_batch, build_graph


def test_sharded_chunking_equals_groupby_chunking():
    tbl = generate_transcripts_table(8)
    ds = rd.from_arrow(tbl)
    via_groupby = (
        chunk_conversations(ds).to_pandas().sort_values(["conv_id", "chunk_id"]).reset_index(drop=True)
    )
    via_batch = (
        chunk_batch(tbl).to_pandas().sort_values(["conv_id", "chunk_id"]).reset_index(drop=True)
    )
    assert via_groupby.equals(via_batch)


def test_sharded_chunking_equals_groupby_for_giant_conversation():
    """A conversation longer than SALT_SPAN (1024) turns spans several
    salt groups; the sharded path must slice on (conv_id, salt) and
    produce the exact chunk ids the groupby(conv_id, salt) path does
    (ADVICE r1 divergence)."""
    from eschergraph_ray.sources.transcripts import conv_rows, _rows_to_table
    from eschergraph_ray.stages.chunking import SALT_SPAN

    rows = conv_rows(42, 388)  # 1280-turn giant
    assert len(rows) > SALT_SPAN
    rows += conv_rows(42, 1)  # plus a small conversation in the block
    tbl = _rows_to_table(list(rows), random.Random(7))
    via_groupby = (
        chunk_conversations(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values(["conv_id", "chunk_id"])
        .reset_index(drop=True)
    )
    via_batch = (
        chunk_batch(tbl)
        .to_pandas()
        .sort_values(["conv_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert via_groupby.equals(via_batch)
    # salt-offset chunk ids present (second salt bucket starts at 100000)
    assert (via_batch["chunk_id"] >= 100000).any()


def test_sharded_graph_equals_groupby_graph():
    tbl = generate_transcripts_table(6)
    logs = ExtractorActor()(chunk_batch(tbl))
    via_batch = build_graph_batch(logs)
    via_groupby = build_graph(rd.from_arrow(logs)).to_pandas()
    a = via_batch.to_pandas()
    # the sharded path additionally emits per-block lineage stats rows
    # plus the in-stage sidecar rows (one docrec per conversation, one
    # changelog CREATE per node/edge/property)
    stats = a[a["kind"] == "stats"]
    assert len(stats) == 1 and stats["stat_convs"].iloc[0] == 6
    assert len(a[a["kind"] == "docrec"]) == 6
    n_objects = len(a[a["kind"].isin(["node", "edge", "property"])])
    assert len(a[a["kind"] == "changelog"]) == n_objects
    a = a[~a["kind"].isin(["stats", "docrec", "changelog"])]
    a = a.sort_values(["kind", "conv_id", "id", "subj", "chunk_id"], na_position="first").reset_index(drop=True)
    b = via_groupby.sort_values(["kind", "conv_id", "id", "subj", "chunk_id"], na_position="first").reset_index(drop=True)
    assert len(a) == len(b)
    assert a["kind"].tolist() == b["kind"].tolist()
    assert a["id"].tolist() == b["id"].tolist()
    trip_a = a[a["kind"] == "triple"][["conv_id", "subj", "pred", "obj"]]
    trip_b = b[b["kind"] == "triple"][["conv_id", "subj", "pred", "obj"]]
    assert set(map(tuple, trip_a.values)) == set(map(tuple, trip_b.values))


def test_louvain_covers_and_partitions():
    rng = random.Random(11)
    names = [f"x{i} y{i}" for i in range(50)]
    edges = [tuple(rng.sample(names, 2)) for _ in range(120)]
    parts = louvain_communities(names, edges)
    flat = sorted(n for p in parts for n in p)
    assert flat == sorted(names)          # covers all nodes
    assert 1 <= len(parts) < len(names)   # fewer communities than nodes
    assert parts == louvain_communities(names, edges)  # deterministic


def test_louvain_recovers_planted_communities():
    # two dense cliques joined by one edge -> exactly two communities
    a = [f"a{i}" for i in range(6)]
    b = [f"b{i}" for i in range(6)]
    edges = [(x, y) for i, x in enumerate(a) for y in a[i + 1:]]
    edges += [(x, y) for i, x in enumerate(b) for y in b[i + 1:]]
    edges.append((a[0], b[0]))
    parts = louvain_communities(a + b, edges)
    assert sorted(map(sorted, parts)) == [sorted(a), sorted(b)]


def test_louvain_isolated_nodes_are_singletons():
    parts = louvain_communities(["p", "q", "r"], [])
    assert parts == [["p"], ["q"], ["r"]]


def test_nonfused_build_matches_fused_build(tmp_path):
    """build(conv_complete_shards=False) — the groupby-exchange path for
    arbitrary row layouts — must produce the same triple set as the
    fused zero-shuffle default, including a giant (multi-salt)
    conversation (ADVICE r1 divergence, now fixed)."""
    import os

    import pyarrow.parquet as pq

    from eschergraph_ray.pipelines.build import build, load_kind_arrow
    from eschergraph_ray.sources.transcripts import conv_rows, _rows_to_table

    rows = []
    for i in (1, 2, 388):  # 388 = 1280-turn giant spanning two salts
        rows.extend(conv_rows(42, i))
    src = str(tmp_path / "src")
    os.makedirs(src)
    pq.write_table(_rows_to_table(rows, random.Random(3)), src + "/shard-000.parquet")

    def triples(out):
        t = load_kind_arrow(out, "triple").to_pandas()
        return set(map(tuple, t[["conv_id", "subj", "pred", "obj", "chunk_id"]].values))

    fused = str(tmp_path / "fused")
    build(src, fused)
    nonfused = str(tmp_path / "nonfused")
    build(src, nonfused, conv_complete_shards=False)
    assert triples(fused) == triples(nonfused)
