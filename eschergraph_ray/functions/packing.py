"""Greedy sequence packing (training-sample assembly).

Packing documents into fixed token-budget bins is the last step before
tokenized training data is written: short documents are concatenated up
to the context length so no sequence is padded. Greedy packing is
inherently sequential — bin N's contents depend on every prior doc —
so the distributed form hash-partitions the corpus and packs each
partition independently in deterministic (id) order:

- ``part = id % num_parts`` → ``groupby(part)`` is the ONLY shuffle;
- within a part, docs are sorted by id and packed greedily (start a
  new bin when adding the next doc would exceed the budget; an
  oversized doc gets its own bin);
- determinism: bin membership is a pure function of (id set, budget,
  num_parts) — retries and cluster sizes agree, and a recursive-CTE
  SQL oracle replays it exactly.

Scale note: ``num_parts`` is the parallelism unit — size it so one
part's (id, n_tokens) pairs fit a worker (two ints per doc; 10^8 docs
per part is a few GB). The packing loop touches only those two ints,
never the text.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def pack_sequences(ds, id_col: str, tokens_col: str, budget: int,
                   num_parts: int = 8):
    """id/token-count Dataset -> (id, part, bin_id) assignment.
    ``bin_id`` numbers bins within a part from 0."""

    if num_parts < 1 or (num_parts & (num_parts - 1)):
        raise ValueError("num_parts must be a power of two (bitmask partitioning)")

    def add_part(batch: pa.Table) -> pa.Table:
        # non-negative ids: id & (P-1) == id % P, and SQL replays it as %
        part = pc.cast(pc.bit_wise_and(batch[id_col], num_parts - 1), pa.int64())
        return pa.table(
            {
                id_col: batch[id_col],
                "part": part,
                tokens_col: batch[tokens_col],
            }
        )

    def greedy(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group[id_col])
        ids = pc.take(group[id_col], order).to_pylist()
        toks = pc.take(group[tokens_col], order).to_pylist()
        bins = []
        bin_no, running = 0, 0
        for n in toks:
            if running > 0 and running + n > budget:
                bin_no += 1
                running = 0
            running += n
            bins.append(bin_no)
        return pa.table(
            {
                id_col: pa.array(ids, group[id_col].type),
                "part": group["part"].slice(0, len(ids)),
                "bin_id": pa.array(bins, pa.int64()),
            }
        )

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(greedy, batch_format="pyarrow")
    )
