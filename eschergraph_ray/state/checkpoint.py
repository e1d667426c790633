"""Checkpoint manifest + per-partition lineage (north_rule).

The reference has no checkpointing at all — a crash loses the whole
build (the pickle repository is written once at the end,
``eschergraph/persistence/adapters/simple_repository/simple_repository.py:578-588``);
its closest analogue is the ChangeLog-driven incremental vector sync
(``eschergraph/persistence/change_log.py:12-31``). We design it in:

- the input is split into *partitions* (spans of input Parquet shards;
  a conversation must not span shards — the standard layout for
  transcript exports and what our generator produces);
- partitions are processed in *commit groups*; each group's outputs are
  written to a temp directory and atomically renamed, then the manifest
  records the group ``committed`` together with its lineage counts
  (convs, turns, chunks, triples, nodes, edges, wall_ms);
- a killed run, restarted with the same arguments, skips committed
  groups entirely and re-runs only uncommitted ones; deterministic IDs
  (ids.py) make re-emission idempotent.

The manifest is a single JSON file rewritten atomically (tmp+rename) —
it is tiny (one record per partition), so no Parquet machinery needed;
``lineage_table()`` exports it as the LINEAGE Arrow table.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

from ..schemas import LINEAGE


class Manifest:
    def __init__(self, out_dir: str):
        self.path = os.path.join(out_dir, "manifest.json")
        self.data: dict = {"partitions": {}}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.data = json.load(f)

    def _save(self) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.data, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    def get(self, partition_id: str) -> dict:
        return self.data["partitions"].get(partition_id, {"status": "pending"})

    def phase_done(self, partition_id: str, phase: str) -> bool:
        rec = self.get(partition_id)
        if phase == "extract":
            return rec.get("status") in ("extracted", "committed")
        return rec.get("status") == "committed"

    def mark(self, partition_id: str, status: str, **stats) -> None:
        rec = self.data["partitions"].setdefault(partition_id, {})
        rec["status"] = status
        rec.update(stats)
        self._save()

    def lineage_table(self) -> pa.Table:
        rows = []
        for pid, rec in sorted(self.data["partitions"].items()):
            rows.append(
                {
                    "partition_id": pid,
                    "status": rec.get("status", "pending"),
                    "conv_count": int(rec.get("conv_count", 0)),
                    "turn_count": int(rec.get("turn_count", 0)),
                    "chunk_count": int(rec.get("chunk_count", 0)),
                    "triple_count": int(rec.get("triple_count", 0)),
                    "node_count": int(rec.get("node_count", 0)),
                    "edge_count": int(rec.get("edge_count", 0)),
                    "quarantined_count": int(rec.get("quarantined_count", 0)),
                    "skipped_duplicates": int(rec.get("skipped_duplicates", 0)),
                    "wall_ms": int(rec.get("wall_ms", 0)),
                }
            )
        return pa.Table.from_pylist(rows, schema=LINEAGE)


def atomic_dir_write(final_dir: str, write_fn) -> None:
    """Write a directory partition-atomically: tmp -> fsync-free rename."""
    import shutil

    tmp = final_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    write_fn(tmp)
    shutil.rmtree(final_dir, ignore_errors=True)
    os.replace(tmp, final_dir)
