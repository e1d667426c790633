"""Chunker invariants — mirrors tests/builder/test_reader.py:11-66."""

import pyarrow as pa

from eschergraph_ray.functions.text import count_tokens
from eschergraph_ray.sources.transcripts import generate_transcripts_table
from eschergraph_ray.stages.chunking import MAX_TOKENS, add_turn_tokens, chunk_group


def _chunks_for(n_convs: int = 5):
    tbl = add_turn_tokens(generate_transcripts_table(n_convs))
    out = []
    for conv in tbl.column("conv_id").unique().to_pylist():
        g = tbl.filter(pa.compute.equal(tbl["conv_id"], conv))
        out.append(chunk_group(g))
    return out


def test_chunk_ids_strictly_increasing_per_conv():
    # tests/builder/test_reader.py:22-33 invariant
    for chunks in _chunks_for():
        ids = chunks["chunk_id"].to_pylist()
        assert ids == sorted(ids)
        assert len(set(ids)) == len(ids)


def test_chunk_token_cap():
    # <=430 tokens per chunk (test_reader.py:33 asserts 400+30 slack)
    for chunks in _chunks_for():
        for n in chunks["n_tokens"].to_pylist():
            assert n <= MAX_TOKENS + 30


def test_chunk_min_length_filter():
    for chunks in _chunks_for():
        for t in chunks["text"].to_pylist():
            assert len(t) >= 100


def test_turn_spans_monotone_and_text_preserved():
    # per-turn text equality invariant: every turn's text appears
    # verbatim inside its chunk, in turn order
    tbl = add_turn_tokens(generate_transcripts_table(3))
    for conv in tbl.column("conv_id").unique().to_pylist():
        g = tbl.filter(pa.compute.equal(tbl["conv_id"], conv))
        chunks = chunk_group(g)
        turn_text = {
            i: t
            for i, t in zip(g["turn_idx"].to_pylist(), g["text"].to_pylist())
        }
        prev_last = -1
        for text, first, last, _n in zip(
            chunks["text"].to_pylist(),
            chunks["turn_first"].to_pylist(),
            chunks["turn_last"].to_pylist(),
            chunks["n_tokens"].to_pylist(),
        ):
            assert first >= 0 and last >= first
            assert first > prev_last or first == prev_last  # split turns share
            prev_last = last
            if first == last and count_tokens(turn_text[first]) > MAX_TOKENS:
                continue  # sentence-split piece of an over-long turn
            for ti in range(first, last + 1):
                assert turn_text[ti] in text


def test_oversized_turn_is_sentence_split():
    long_turn = " ".join(f"Sentence number {i} about planning." for i in range(300))
    tbl = pa.table(
        {
            "conv_id": pa.array(["c"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array([long_turn], pa.large_string()),
            "tool": pa.array([""], pa.string()),
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    chunks = chunk_group(add_turn_tokens(tbl))
    assert chunks.num_rows > 1
    assert all(n <= MAX_TOKENS + 30 for n in chunks["n_tokens"].to_pylist())


def test_corpus_turns_never_hit_overlong_split():
    # The kg_chunks DuckDB oracle replays the packer WITHOUT the
    # over-long-turn sentence-split path (>MAX_TOKENS in one turn); this
    # pins the documented assumption that the synthetic corpus never
    # triggers it. If generation ever changes, this fails before the
    # oracle silently diverges.
    import pyarrow.compute as pc

    from eschergraph_ray.functions.text import _TOKEN_RE
    from eschergraph_ray.sources.transcripts import generate_transcripts_table
    from eschergraph_ray.stages.chunking import MAX_TOKENS

    tbl = generate_transcripts_table(120)
    counts = pc.count_substring_regex(tbl["text"], _TOKEN_RE.pattern)
    assert pc.max(counts).as_py() < MAX_TOKENS
