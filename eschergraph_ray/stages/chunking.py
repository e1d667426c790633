"""Conversation reassembly + chunking.

Ray-native restatement of the reference reader's stateful sequential
chunk packer (``Reader._chunk_paragraphs``,
``eschergraph/builder/reader/reader.py:93-127``) and chunk filter
(``reader.py:188-224``):

- ``groupby(conv_id)`` (salted for giant conversations) followed by an
  in-group ``sort(turn_idx)`` — the per-turn text-equality invariant:
  turns pass through reassembly byte-identical under stable ordering.
- pack turns into ~``max_tokens`` chunks; a role boundary (end of an
  assistant turn — the transcript analogue of the reference's
  ``sectionHeading`` break) forces a break once a chunk is ≥70% full
  (``reader.py:108-113`` semantics).
- a single over-long turn is split on sentence boundaries.
- drop chunks <100 chars or >40% non-alpha (``reader.py:188-224``).
- ``chunk_id`` strictly increasing per conversation
  (``tests/builder/test_reader.py:22-33`` invariant).

Skew handling (SURVEY.md §7.5): conversations longer than ``SALT_SPAN``
turns are salted into ``(conv_id, turn_idx // SALT_SPAN)`` groups so a
single million-turn conversation cannot pin one reducer; chunk ids are
offset by ``salt * CHUNKS_PER_SALT`` which preserves strict monotonicity
(chunks never span a salt boundary — documented deviation, the
reference has no conversations this large).

Token counting is vectorized ahead of the shuffle in a ``map_batches``
stage so the per-group function does no regex work per row.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import _TOKEN_RE, chunk_passes_filter, count_tokens
from ..schemas import CHUNKS

MAX_TOKENS = 400
SOFT_BREAK_FRACTION = 0.7
SALT_SPAN = 1024  # turns per salt bucket for giant conversations
CHUNKS_PER_SALT = 100_000

_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")

_ARROW_PINNED = False


def pin_arrow_threads() -> None:
    """Pin pyarrow's internal thread pool to 1 inside Ray workers.

    Arrow kernels (take / sort_indices / cast) default to a pool sized
    to ALL machine cores; with N Ray workers that is N x cores threads
    fighting the scheduler — observed as 10-20x UDF slowdown dominated
    by sys time. Each worker is already a single parallelism unit; its
    kernels must be single-threaded. Called once per process from every
    batch UDF."""
    global _ARROW_PINNED
    if not _ARROW_PINNED:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        _ARROW_PINNED = True


def add_turn_tokens(batch: pa.Table) -> pa.Table:
    """Vectorized per-turn token count + salt key (pre-shuffle stage).

    ``pc.count_substring_regex`` with the exact Python token pattern —
    verified byte-equal to ``len(_TOKEN_RE.findall(t))`` on both sandbox
    corpora (RE2 and Python agree on this backreference-free pattern;
    the SQL oracle uses the same regex)."""
    pin_arrow_threads()
    n_tokens = pc.cast(
        pc.count_substring_regex(
            pc.fill_null(batch["text"], ""), _TOKEN_RE.pattern
        ),
        pa.int32(),
    )
    salt = pc.cast(
        pc.floor(pc.divide(pc.cast(batch["turn_idx"], pa.float64()), SALT_SPAN)),
        pa.int32(),
    )
    out = batch.append_column("n_tokens", n_tokens)
    return out.append_column("salt", salt)


def _split_long_turn(text: str, max_tokens: int) -> list[str]:
    pieces: list[str] = []
    cur: list[str] = []
    cur_tokens = 0
    for sent in _SENTENCE_RE.split(text):
        t = count_tokens(sent)
        if cur and cur_tokens + t > max_tokens:
            pieces.append(" ".join(cur))
            cur, cur_tokens = [], 0
        cur.append(sent)
        cur_tokens += t
    if cur:
        pieces.append(" ".join(cur))
    return pieces


def chunk_group(group: pa.Table, max_tokens: int = MAX_TOKENS) -> pa.Table:
    """Chunk one (conv_id, salt) group. Pure function: pa.Table in/out."""
    if group.num_rows == 0:
        return CHUNKS.empty_table()
    order = pc.sort_indices(group["turn_idx"])
    group = group.take(order)
    conv_id = group["conv_id"][0].as_py()
    salt = group["salt"][0].as_py() if "salt" in group.column_names else 0
    if "salt" in group.column_names:
        # a group must be single-salt: the sharded fast path slices on
        # (conv_id, salt) and must agree with groupby(conv_id, salt)
        mx = pc.max(group["salt"]).as_py()
        if mx != salt:
            raise ValueError(f"multi-salt group for {conv_id}: {salt}..{mx}")
    turn_idx = group["turn_idx"].to_pylist()
    texts = group["text"].to_pylist()
    roles = group["role"].to_pylist()
    tokens = group["n_tokens"].to_pylist()

    # Reassembly invariant: stable, strictly increasing turn order.
    for a, b in zip(turn_idx, turn_idx[1:]):
        if b <= a:
            raise ValueError(f"non-monotone turn_idx in {conv_id}: {a} -> {b}")

    chunks: list[tuple[str, int, int, int]] = []  # text, first, last, n_tokens
    cur_parts: list[str] = []
    cur_tokens = 0
    cur_first = -1
    cur_last = -1

    def flush() -> None:
        nonlocal cur_parts, cur_tokens, cur_first, cur_last
        if cur_parts:
            chunks.append((" ".join(cur_parts), cur_first, cur_last, cur_tokens))
        cur_parts, cur_tokens, cur_first, cur_last = [], 0, -1, -1

    for ti, text, role, ntok in zip(turn_idx, texts, roles, tokens):
        if text is None:
            text = ""  # token stage fill_null-counts null text as 0
        if ntok > max_tokens:
            # Over-long single turn: flush, then emit sentence-split pieces.
            flush()
            for piece in _split_long_turn(text, max_tokens):
                chunks.append((piece, ti, ti, count_tokens(piece)))
            continue
        if cur_parts and cur_tokens + ntok > max_tokens:
            flush()
        cur_parts.append(text)
        cur_tokens += ntok
        cur_first = ti if cur_first < 0 else cur_first
        cur_last = ti
        # Role-boundary soft break (sectionHeading analogue,
        # reader.py:108-113): assistant/tool turn closes an exchange.
        if role in ("assistant", "tool") and cur_tokens >= SOFT_BREAK_FRACTION * max_tokens:
            flush()
    flush()

    kept = [(t, f, l, n) for (t, f, l, n) in chunks if chunk_passes_filter(t)]
    if len(kept) > CHUNKS_PER_SALT:
        # a silent spill into the next salt's id range would collide
        # chunk_ids; fail loudly like the other invariant guards
        raise ValueError(
            f"{conv_id} salt {salt}: {len(kept)} chunks exceed the "
            f"per-salt id range ({CHUNKS_PER_SALT}) — shrink SALT_SPAN"
        )
    base = salt * CHUNKS_PER_SALT
    return pa.Table.from_pydict(
        {
            "conv_id": pa.array([conv_id] * len(kept), pa.string()),
            "chunk_id": pa.array([base + i for i in range(len(kept))], pa.int32()),
            "text": pa.array([k[0] for k in kept], pa.large_string()),
            "turn_first": pa.array([k[1] for k in kept], pa.int32()),
            "turn_last": pa.array([k[2] for k in kept], pa.int32()),
            "n_tokens": pa.array([k[3] for k in kept], pa.int32()),
        },
        schema=CHUNKS,
    )


def chunk_conversations(transcripts, max_tokens: int = MAX_TOKENS):
    """transcripts Dataset -> chunks Dataset (one shuffle, key=(conv_id, salt)).

    The general path: works for any row layout. When input shards are
    conversation-complete use ``chunk_conversations_sharded`` — same
    semantics, zero shuffle.
    """
    with_tokens = transcripts.map_batches(add_turn_tokens, batch_format="pyarrow")
    return with_tokens.groupby(["conv_id", "salt"]).map_groups(
        lambda g: chunk_group(g, max_tokens), batch_format="pyarrow"
    )


def chunk_batch(batch: pa.Table, max_tokens: int = MAX_TOKENS) -> pa.Table:
    """Chunk every conversation contained in one conv-complete batch.

    Shuffle-free fast path: when each input shard holds whole
    conversations (the layout the checkpoint partitioning already
    requires — a conversation must not span shards), the
    groupby(conv_id) exchange is unnecessary; we group within the block.
    Semantics are identical to ``chunk_conversations`` (asserted by
    tests/test_chunking.py::test_sharded_path_equals_groupby_path).
    """
    batch = add_turn_tokens(batch)
    if batch.num_rows == 0:
        return CHUNKS.empty_table()
    out: list[pa.Table] = []
    # sort by (conv_id, turn_idx) once, then slice runs per
    # (conv_id, salt) — salt boundaries are contiguous under turn order,
    # and slicing on them keeps giant conversations byte-identical with
    # the groupby(conv_id, salt) path (ADVICE r1)
    batch = batch.take(
        pc.sort_indices(
            batch, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    salt = batch["salt"].to_numpy(zero_copy_only=False)
    new_run = (conv[1:] != conv[:-1]) | (salt[1:] != salt[:-1])
    boundaries = np.flatnonzero(new_run) + 1
    starts = np.concatenate([[0], boundaries])
    ends = np.concatenate([boundaries, [len(conv)]])
    for s, e in zip(starts.tolist(), ends.tolist()):
        out.append(chunk_group(batch.slice(s, e - s), max_tokens))
    # one chunk -> one parquet row group downstream (not one per conv)
    return pa.concat_tables(out).combine_chunks()


def chunk_conversations_sharded(transcripts, max_tokens: int = MAX_TOKENS):
    """Zero-shuffle chunking over conv-complete blocks (batch = block)."""
    return transcripts.map_batches(
        lambda b: chunk_batch(b, max_tokens), batch_format="pyarrow", batch_size=None
    )
