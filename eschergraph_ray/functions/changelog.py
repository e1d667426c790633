"""Change-log action algebra (vector-sync planning).

Reference: ``prepare_sync_data``'s per-id action-set rules
(``eschergraph/tools/prepare_sync_data.py:80-93``, tested by
``tests/tools/test_sync_vector_db.py:22-50``):

- an object is (re)embedded/upserted iff its log contains a CREATE or
  UPDATE and no DELETE;
- it is deleted from the vector store iff its log contains a DELETE and
  no CREATE (created-then-deleted within one build cancels out).

Ray-native: one ``groupby(id)`` with boolean-or partial aggregation —
pre-aggregated inside ``map_batches`` so the shuffle carries one row
per (id, flags) pair per block, not one per change record.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

UPSERT = "upsert"
DELETE = "delete"


def sync_actions(changes_ds, id_col: str = "id", action_col: str = "action"):
    """changes (id, action in {CREATE,UPDATE,DELETE}) -> (id, sync_action)."""
    from ray.data.aggregate import Max

    def partial(batch: pa.Table) -> pa.Table:
        a = batch[action_col]
        has_cre = pc.or_(pc.equal(a, "CREATE"), pc.equal(a, "UPDATE"))
        has_del = pc.equal(a, "DELETE")
        has_create = pc.equal(a, "CREATE")
        t = pa.table(
            {
                id_col: batch[id_col],
                "cre_upd": pc.cast(has_cre, pa.int8()),
                "dele": pc.cast(has_del, pa.int8()),
                "cre": pc.cast(has_create, pa.int8()),
            }
        )
        # per-batch combiner: one row per id per block
        return (
            t.group_by(id_col)
            .aggregate([("cre_upd", "max"), ("dele", "max"), ("cre", "max")])
            .rename_columns([id_col, "cre_upd", "dele", "cre"])
        )

    agg = (
        changes_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Max("cre_upd", alias_name="cre_upd"),
            Max("dele", alias_name="dele"),
            Max("cre", alias_name="cre"),
        )
    )

    def decide(batch: pa.Table) -> pa.Table:
        upsert = pc.and_(
            pc.equal(batch["cre_upd"], 1), pc.equal(batch["dele"], 0)
        )
        delete = pc.and_(pc.equal(batch["dele"], 1), pc.equal(batch["cre"], 0))
        action = pc.if_else(
            upsert,
            pa.scalar(UPSERT),
            pc.if_else(delete, pa.scalar(DELETE), pa.scalar(None, pa.string())),
        )
        out = pa.table({batch.column_names[0]: batch[batch.column_names[0]], "sync_action": action})
        return out.filter(pc.is_valid(out["sync_action"]))

    return agg.map_batches(decide, batch_format="pyarrow")
