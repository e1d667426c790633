"""Graph mutation lifecycle: ChangeLog emission, Document records +
tags, incremental add, duplicate-document guard (VERDICT r1 items 3-5).

Reference analogues: change_log.py:12-31 (CREATE logs on persist),
graph.py:237-273 (re-add to an existing repository),
utils.py:13-41 (duplicate_document_check), document.py:10-29 +
simple_repository.py:693-723 (tags + filter_documents_by_tags)."""

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from eschergraph_ray.functions.changelog import sync_actions
from eschergraph_ray.functions.tags import (
    canonical_tags,
    filter_by_tags,
    filter_table_by_tags,
)
from eschergraph_ray.pipelines.build import (
    DocumentAlreadyExistsError,
    build,
    get_max_level,
    load_change_log,
    load_documents_arrow,
    load_kind_arrow,
)
from eschergraph_ray.sources.transcripts import conv_rows, _rows_to_table
import random


def _write_shards(root: str, conv_indices_per_shard: list[list[int]]) -> str:
    os.makedirs(root, exist_ok=True)
    for si, idxs in enumerate(conv_indices_per_shard):
        rows = []
        for i in idxs:
            rows.extend(conv_rows(42, i))
        tbl = _rows_to_table(rows, random.Random(si))
        pq.write_table(tbl, os.path.join(root, f"shard-{si:03d}.parquet"))
    return root


def _dir_digest(d: str) -> dict[str, str]:
    out = {}
    for root, _dirs, names in os.walk(d):
        for n in sorted(names):
            p = os.path.join(root, n)
            with open(p, "rb") as f:
                out[os.path.relpath(p, d)] = hashlib.blake2b(
                    f.read(), digest_size=16
                ).hexdigest()
    return out


def _tags_fn(conv_id: str) -> dict:
    n = int(conv_id.split("-")[1])
    tags = {"team": ["infra", "search", "ml"][n % 3]}
    if n % 4 != 0:
        tags["tier"] = n % 2
    return tags


def test_build_emits_documents_and_changelog(tmp_path):
    src = _write_shards(str(tmp_path / "src"), [[0, 1], [2, 3]])
    out = str(tmp_path / "out")
    build(src, out, commit_groups=2, tags_fn=_tags_fn)

    docs = load_documents_arrow(out)
    assert sorted(docs["conv_id"].to_pylist()) == [
        "conv-0000000",
        "conv-0000001",
        "conv-0000002",
        "conv-0000003",
    ]
    assert all(c > 0 for c in docs["chunk_num"].to_pylist())
    assert all(t > 0 for t in docs["token_num"].to_pylist())
    assert all(t > 0 for t in docs["turn_num"].to_pylist())
    tags = dict(zip(docs["conv_id"].to_pylist(), docs["tags"].to_pylist()))
    assert tags["conv-0000000"] == canonical_tags({"team": "infra"})
    assert tags["conv-0000001"] == canonical_tags({"team": "search", "tier": 1})

    # ChangeLog: one CREATE per persisted node/edge/property
    log = load_change_log(out).to_pandas()
    assert set(log["action"]) == {"CREATE"}
    n_nodes = load_kind_arrow(out, "node").num_rows
    n_edges = load_kind_arrow(out, "edge").num_rows
    n_props = load_kind_arrow(out, "property").num_rows
    assert len(log) == n_nodes + n_edges + n_props
    assert (log["type"] == "node").sum() == n_nodes

    # vector-sync plan over the REAL change log: every object upserted
    plan = sync_actions(load_change_log(out)).to_pandas()
    assert set(plan["sync_action"]) == {"upsert"}
    assert len(plan) == len(log)  # ids unique => one action per object

    assert get_max_level(out) == 2


def test_incremental_add_keeps_old_partitions_byte_identical(tmp_path):
    src = _write_shards(str(tmp_path / "src"), [[0, 1], [2, 3]])
    out = str(tmp_path / "out")
    build(src, out, commit_groups=2, tags_fn=_tags_fn)
    before = _dir_digest(os.path.join(out, "graph"))

    # add a NEW shard with new conversations into the same input dir
    _write_shards(str(tmp_path / "src"), [[0, 1], [2, 3], [4, 5]])
    build(src, out, commit_groups=2, tags_fn=_tags_fn)

    after = _dir_digest(os.path.join(out, "graph"))
    # every pre-existing file untouched, new partition appended
    assert all(after[k] == v for k, v in before.items())
    assert len(after) > len(before)
    docs = load_documents_arrow(out)
    assert "conv-0000004" in docs["conv_id"].to_pylist()
    # incremental triples match a fresh single-shot build
    fresh_out = str(tmp_path / "fresh")
    fresh_src = _write_shards(str(tmp_path / "src2"), [[0, 1], [2, 3], [4, 5]])
    build(fresh_src, fresh_out, commit_groups=1)
    inc = load_kind_arrow(out, "triple")
    fresh = load_kind_arrow(fresh_out, "triple")
    key = ["conv_id", "subj", "pred", "obj"]
    assert set(map(tuple, inc.select(key).to_pandas().values)) == set(
        map(tuple, fresh.select(key).to_pandas().values)
    )


def test_duplicate_document_skip_and_error(tmp_path):
    src = _write_shards(str(tmp_path / "src"), [[0, 1]])
    out = str(tmp_path / "out")
    build(src, out, tags_fn=_tags_fn)
    before = _dir_digest(out)
    n_docs = load_documents_arrow(out).num_rows

    # re-add the same conversations in a NEW shard file: logged no-op
    _write_shards(str(tmp_path / "src"), [[0, 1], [0, 1]])
    res = build(src, out, tags_fn=_tags_fn)
    lineage = res.lineage.to_pandas().set_index("partition_id")
    assert lineage.loc["part-0001", "skipped_duplicates"] == 2
    assert load_documents_arrow(out).num_rows == n_docs
    after = _dir_digest(out)
    assert all(after[k] == v for k, v in before.items() if k.startswith("graph/"))

    # a shard mixing one duplicate and one new conversation: dup is
    # dropped, the new conversation builds
    _write_shards(str(tmp_path / "src"), [[0, 1], [0, 1], [0, 7]])
    res = build(src, out, tags_fn=_tags_fn)
    lineage = res.lineage.to_pandas().set_index("partition_id")
    assert lineage.loc["part-0002", "skipped_duplicates"] == 1
    docs = load_documents_arrow(out)
    assert "conv-0000007" in docs["conv_id"].to_pylist()
    assert docs["conv_id"].to_pylist().count("conv-0000000") == 1

    # error policy: reference DocumentAlreadyExists parity
    _write_shards(str(tmp_path / "src"), [[0, 1], [0, 1], [0, 7], [1, 9]])
    with pytest.raises(DocumentAlreadyExistsError):
        build(src, out, tags_fn=_tags_fn, on_duplicate="error")


def _py_reference_filter(rows, filter_tags, ignore_missing):
    """Literal transcription of simple_repository.py:706-723."""
    out = []
    for tags in rows:
        include = True
        for k, v in filter_tags.items():
            if k not in tags and not ignore_missing:
                include = False
            elif k in tags and tags[k] != v:
                include = False
            if not include:
                break
        if include:
            out.append(tags)
    return out


def test_filter_by_tags_reference_semantics():
    tag_dicts = [
        {"team": "ml", "tier": 1},
        {"team": "ml"},
        {"team": "infra", "tier": 1},
        {"tier": 1},
        {},
        {"team": "ml", "tier": 2},
    ]
    tbl = pa.table(
        {
            "doc_id": list(range(len(tag_dicts))),
            "tags": [canonical_tags(t) for t in tag_dicts],
        }
    )
    for filter_tags in ({"team": "ml"}, {"team": "ml", "tier": 1}, {"tier": 1}):
        for ignore_missing in (False, True):
            want = len(_py_reference_filter(tag_dicts, filter_tags, ignore_missing))
            got_ds = filter_by_tags(
                rd.from_arrow(tbl), filter_tags, ignore_missing_tags=ignore_missing
            ).count()
            got_tbl = filter_table_by_tags(
                tbl, filter_tags, ignore_missing_tags=ignore_missing
            ).num_rows
            assert got_ds == want, (filter_tags, ignore_missing)
            assert got_tbl == want, (filter_tags, ignore_missing)


def test_kg_documents_tag_filter(tmp_path):
    src = _write_shards(str(tmp_path / "src"), [[0, 1, 2, 3, 4, 5]])
    out = str(tmp_path / "out")
    build(src, out, tags_fn=_tags_fn)
    docs = load_documents_arrow(out)
    got = filter_table_by_tags(docs, {"team": "search", "tier": 1})
    assert got["conv_id"].to_pylist() == ["conv-0000001"]
    # missing-tag policy: conv-0 (n%4==0) has no tier tag
    got2 = filter_table_by_tags(docs, {"team": "infra", "tier": 0},
                                ignore_missing_tags=True)
    assert "conv-0000000" in got2["conv_id"].to_pylist()


def test_remove_documents_and_readd(tmp_path):
    """Delete path: removing a conversation filters its subgraph,
    emits DELETE change logs (sync algebra cancels created-then-deleted
    ids), and the conversation can be re-added incrementally."""
    from eschergraph_ray.pipelines.build import remove_documents

    src = _write_shards(str(tmp_path / "src"), [[0, 1], [2, 3]])
    out = str(tmp_path / "out")
    build(src, out, commit_groups=2, tags_fn=_tags_fn)
    n_log_before = load_change_log(out).count()

    res = remove_documents(out, ["conv-0000002"])
    assert res["documents"] == 1
    assert res["node"] > 0 and res["edge"] > 0

    # subgraph gone from every kind
    for kind in ("node", "edge", "property", "triple"):
        t = load_kind_arrow(out, kind)
        assert "conv-0000002" not in set(t["conv_id"].to_pylist()), kind
    assert "conv-0000002" not in set(load_documents_arrow(out)["conv_id"].to_pylist())

    # DELETE rows appended; sync plan: deleted ids cancel (CREATE+DELETE)
    log = load_change_log(out).to_pandas()
    dels = log[log["action"] == "DELETE"]
    assert len(dels) == res["node"] + res["edge"] + res["property"]
    assert len(log) == n_log_before + len(dels)
    plan = sync_actions(load_change_log(out)).to_pandas()
    deleted_ids = set(dels["id"])
    assert deleted_ids.isdisjoint(set(plan["id"]))  # cancelled out
    assert set(plan["sync_action"]) == {"upsert"}

    # lineage counters dropped
    lineage = remove_documents.__globals__["Manifest"](out).lineage_table().to_pandas()
    assert lineage["conv_count"].sum() == 3

    # re-add: the duplicate guard no longer blocks the removed conv
    _write_shards(str(tmp_path / "src"), [[0, 1], [2, 3], [2]])
    build(src, out, commit_groups=1, tags_fn=_tags_fn)
    docs = load_documents_arrow(out)
    assert docs["conv_id"].to_pylist().count("conv-0000002") == 1
    t = load_kind_arrow(out, "triple")
    assert "conv-0000002" in set(t["conv_id"].to_pylist())


def test_list_available_tags(tmp_path):
    from eschergraph_ray.pipelines.build import list_available_tags

    src = _write_shards(str(tmp_path / "src"), [[0, 1, 2]])
    out = str(tmp_path / "out")
    build(src, out, tags_fn=_tags_fn)
    tags = list_available_tags(out)
    assert tags == {"team": "str", "tier": "int"}


def test_update_readd_flips_create_to_update(tmp_path):
    """on_duplicate="update": re-adding an existing conversation emits
    the reference's UPDATE actions (change_log.py:12-31 merge-on-add)
    for carried objects instead of pretending a fresh CREATE; the old
    copy is replaced, the graph holds exactly one version."""
    src = _write_shards(str(tmp_path / "src"), [[0, 1]])
    out = str(tmp_path / "out")
    build(src, out, tags_fn=_tags_fn)
    log0 = load_change_log(out).to_pandas()
    conv1_ids = set(log0[log0.conv_id == "conv-0000001"]["id"])
    assert conv1_ids

    # incremental re-add with IDENTICAL content -> every object carries
    rows = conv_rows(42, 1)
    pq.write_table(
        _rows_to_table(rows, random.Random(9)),
        os.path.join(src, "shard-900.parquet"),
    )
    build(src, out, tags_fn=_tags_fn, on_duplicate="update")

    log = load_change_log(out).to_pandas()
    upd = log[log.action == "UPDATE"]
    assert set(upd["id"]) == conv1_ids  # same deterministic ids carried
    assert not [
        f
        for f in os.listdir(os.path.join(out, "change_log"))
        if "-update-delete-" in f
    ]  # nothing lost on identical re-add

    # graph holds the conversation exactly once
    nodes = load_kind_arrow(out, "node").to_pandas()
    c1 = nodes[(nodes.conv_id == "conv-0000001") & (nodes.level == 0)]
    assert c1["name"].is_unique

    docs = load_documents_arrow(out).to_pandas()
    assert sorted(docs["conv_id"]) == ["conv-0000000", "conv-0000001"]

    # A4 algebra over the REAL emitted log: CREATE+UPDATE -> upsert
    plan = sync_actions(load_change_log(out)).to_pandas()
    actions = dict(zip(plan["id"], plan["sync_action"]))
    assert all(actions.get(i) == "upsert" for i in conv1_ids)


def test_update_readd_changed_content_emits_deletes(tmp_path):
    """A re-add whose new version LOST objects emits DELETE rows for
    exactly the vanished ids; carried ids flip to UPDATE; the sync plan
    cancels created-then-deleted ids (prepare_sync_data.py:85-90)."""
    src = _write_shards(str(tmp_path / "src"), [[0, 1]])
    out = str(tmp_path / "out")
    build(src, out, tags_fn=_tags_fn)
    old_ids = set(
        load_change_log(out).to_pandas().query("conv_id == 'conv-0000001'")["id"]
    )

    # re-add conv 1 TRUNCATED to its first 2 turns
    rows = conv_rows(42, 1)[:2]
    assert rows
    pq.write_table(
        _rows_to_table(rows, random.Random(9)),
        os.path.join(src, "shard-900.parquet"),
    )
    build(src, out, tags_fn=_tags_fn, on_duplicate="update")

    # the NEW partition's own log (part-0000's historical CREATE rows
    # stay in the append-only log by design)
    newlog = pq.read_table(
        os.path.join(out, "change_log", "part-0001.parquet")
    ).to_pandas()
    new_ids = set(newlog["id"])
    carried = set(newlog[newlog.action == "UPDATE"]["id"])
    assert carried == old_ids & new_ids
    assert set(newlog[newlog.action == "CREATE"]["id"]) == new_ids - old_ids

    log = load_change_log(out).to_pandas()
    c1 = log[log.conv_id == "conv-0000001"]
    deleted = set(c1[c1.action == "DELETE"]["id"])
    assert deleted == old_ids - new_ids
    assert deleted  # truncation really lost objects
    # carried ids -> upsert; vanished ids cancel out of the sync plan
    plan = sync_actions(load_change_log(out)).to_pandas()
    actions = dict(zip(plan["id"], plan["sync_action"]))
    for i in carried:
        assert actions.get(i) == "upsert"
    for i in deleted:
        assert i not in actions


def test_crash_during_incremental_add_keeps_dup_guard(tmp_path):
    """ADVICE r2 (medium): the duplicate-document guard must survive a
    crash between the incremental assignment append and the partition's
    commit — the incremental pids are persisted in the manifest, not
    only in memory."""
    src = _write_shards(str(tmp_path / "src"), [[0, 1]])
    out = str(tmp_path / "out")
    build(src, out, tags_fn=_tags_fn)

    # two NEW shards: a genuinely new conversation and a duplicate of
    # conv 1; commit_groups=2 makes them two partitions, and the crash
    # fires after the first commits, BEFORE the duplicate is examined
    pq.write_table(
        _rows_to_table(conv_rows(42, 4), random.Random(5)),
        os.path.join(src, "shard-801.parquet"),
    )
    pq.write_table(
        _rows_to_table(conv_rows(42, 1), random.Random(6)),
        os.path.join(src, "shard-802.parquet"),
    )
    with pytest.raises(RuntimeError, match="injected failure"):
        build(src, out, tags_fn=_tags_fn, commit_groups=2, fail_after_group=1)

    # resume: on the re-run the duplicate shard is no longer a "new
    # file", but its partition must still be guarded
    build(src, out, tags_fn=_tags_fn, commit_groups=2)
    docs = load_documents_arrow(out).to_pandas()
    assert sorted(docs["conv_id"]) == [
        "conv-0000000",
        "conv-0000001",
        "conv-0000004",
    ]  # conv 1 NOT added twice
    lineage = pq.read_table(os.path.join(out, "lineage.parquet")).to_pandas()
    assert lineage["skipped_duplicates"].sum() >= 1


def test_remove_node_by_id_cascade(tmp_path):
    # Reference Repository.remove_node_by_id (simple_repository.py:
    # 724-760): delete one node + incident edges + owned properties,
    # with DELETE change logs; plus our flat-surface cascades (triples
    # by name, community child_node_ids).
    from eschergraph_ray.pipelines.build import remove_node_by_id

    src = _write_shards(str(tmp_path / "src"), [[0, 1, 2, 3]])
    out = str(tmp_path / "out")
    build(src, out, tags_fn=_tags_fn)

    edges = load_kind_arrow(out, "edge").to_pandas()
    props = load_kind_arrow(out, "property").to_pandas()
    nodes = load_kind_arrow(out, "node").to_pandas()
    # a level-0 node that has both incident edges and properties
    l0_edges = edges[edges["level"] == 0]
    cand = set(l0_edges["frm"]) & set(props["node_id"])
    nid = sorted(cand)[0]
    row = nodes[nodes["node_id"] == nid].iloc[0]
    name, conv = row["name"], row["conv_id"]
    exp_edges = len(l0_edges[(l0_edges["frm"] == nid) | (l0_edges["to"] == nid)])
    exp_props = len(props[props["node_id"] == nid])
    triples = load_kind_arrow(out, "triple").to_pandas()
    exp_triples = len(
        triples[
            (triples["conv_id"] == conv)
            & ((triples["subj"] == name) | (triples["obj"] == name))
        ]
    )
    assert exp_edges > 0 and exp_props > 0

    removed = remove_node_by_id(out, nid)
    assert removed == {
        "node": 1,
        "edge": exp_edges,
        "property": exp_props,
        "triple": exp_triples,
    }

    nodes2 = load_kind_arrow(out, "node").to_pandas()
    edges2 = load_kind_arrow(out, "edge").to_pandas()
    props2 = load_kind_arrow(out, "property").to_pandas()
    assert nid not in set(nodes2["node_id"])
    assert not ((edges2["frm"] == nid) | (edges2["to"] == nid)).any()
    assert not (props2["node_id"] == nid).any()
    # no dangling reference in any community's children
    for kids in nodes2["child_node_ids"]:
        assert nid not in (kids if kids is not None else [])
    # DELETE logs appended -> the sync algebra cancels the created-
    # then-deleted ids (no upsert, no delete for a never-synced store)
    log = load_change_log(out).to_pandas()
    dele = log[log["action"] == "DELETE"]
    assert nid in set(dele["id"])
    assert len(dele) == 1 + exp_edges + exp_props
    plan = sync_actions(load_change_log(out)).to_pandas()
    assert nid not in set(plan["id"])
    # idempotent: second removal is a no-op
    assert remove_node_by_id(out, nid) == {
        "node": 0,
        "edge": 0,
        "property": 0,
        "triple": 0,
    }
    # lineage counters reflect the cascade
    lin = pq.read_table(os.path.join(out, "lineage.parquet")).to_pylist()
    assert sum(r["node_count"] for r in lin) == len(nodes2)
    assert sum(r["edge_count"] for r in lin) == len(edges2)


def test_apply_pending_update_empty_snapshot_and_empty_log(tmp_path):
    """Regression: an empty pending snapshot (zero-object conversation)
    or an empty CREATE log must not crash pc.is_in with a null-typed
    value set."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from eschergraph_ray.pipelines.build import _apply_pending_update
    from eschergraph_ray.schemas import CHANGE_LOG

    out = str(tmp_path)
    os_dirs = [f"{out}/pending_update", f"{out}/change_log"]
    import os

    for d in os_dirs:
        os.makedirs(d, exist_ok=True)
    # empty snapshot + non-empty log: all CREATEs stay CREATE
    pq.write_table(CHANGE_LOG.empty_table(), f"{out}/pending_update/part-0000.parquet")
    log = pa.table(
        {
            "id": ["n1"],
            "action": ["CREATE"],
            "type": ["node"],
            "level": pa.array([0], pa.int32()),
            "conv_id": ["c1"],
        }
    ).cast(CHANGE_LOG)
    pq.write_table(log, f"{out}/change_log/part-0000.parquet")
    _apply_pending_update(out, "part-0000")
    got = pq.read_table(f"{out}/change_log/part-0000.parquet")
    assert got["action"].to_pylist() == ["CREATE"]

    # non-empty snapshot + EMPTY log: every old id gets a DELETE row
    pq.write_table(
        pa.table(
            {
                "id": ["old1"],
                "action": ["DELETE"],
                "type": ["node"],
                "level": pa.array([0], pa.int32()),
                "conv_id": ["c9"],
            }
        ).cast(CHANGE_LOG),
        f"{out}/pending_update/part-0001.parquet",
    )
    pq.write_table(CHANGE_LOG.empty_table(), f"{out}/change_log/part-0001.parquet")
    _apply_pending_update(out, "part-0001")
    import glob

    extra = glob.glob(f"{out}/change_log/part-0001-update-delete-*.parquet")
    assert len(extra) == 1
    assert pq.read_table(extra[0])["id"].to_pylist() == ["old1"]
