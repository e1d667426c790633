"""Property-style tests (hypothesis) for core invariants."""

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from eschergraph_ray.functions.community import louvain_communities
from eschergraph_ray.functions.text import count_tokens, token_set_ratio
from eschergraph_ray.stages.chunking import MAX_TOKENS, add_turn_tokens, chunk_group

WORD = st.text(alphabet="abcdefghij", min_size=1, max_size=8)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=200), st.text(max_size=200))
def test_token_set_ratio_bounds_and_symmetry(a, b):
    r = token_set_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == token_set_ratio(b, a)


@settings(max_examples=50, deadline=None)
@given(st.lists(WORD, min_size=1, max_size=10))
def test_token_set_ratio_self_and_subset(words):
    s = " ".join(words)
    assert token_set_ratio(s, s) == 100.0
    assert token_set_ratio(words[0], s) == 100.0  # token subset scores 100


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(WORD, min_size=3, max_size=60).map(lambda ws: " ".join(ws) + "."),
        min_size=1,
        max_size=30,
    )
)
def test_chunker_invariants_random_conversations(turn_texts):
    tbl = pa.table(
        {
            "conv_id": pa.array(["c"] * len(turn_texts), pa.string()),
            "turn_idx": pa.array(range(len(turn_texts)), pa.int32()),
            "role": pa.array(
                ["user" if i % 2 == 0 else "assistant" for i in range(len(turn_texts))],
                pa.string(),
            ),
            "text": pa.array(turn_texts, pa.large_string()),
            "tool": pa.array([""] * len(turn_texts), pa.string()),
            "ts": pa.array(range(len(turn_texts)), pa.timestamp("us")),
        }
    )
    chunks = chunk_group(add_turn_tokens(tbl))
    ids = chunks["chunk_id"].to_pylist()
    assert ids == sorted(set(ids))  # strictly increasing
    for n, text in zip(chunks["n_tokens"].to_pylist(), chunks["text"].to_pylist()):
        assert n <= MAX_TOKENS + 30
        assert len(text) >= 100  # filter applied
        assert n == count_tokens(text)


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=2, max_value=25).flatmap(
        lambda n: st.tuples(
            st.just(n),
            st.lists(
                st.tuples(
                    st.integers(0, n - 1), st.integers(0, n - 1)
                ),
                max_size=60,
            ),
        )
    )
)
def test_louvain_total_partition(args):
    n, raw_edges = args
    names = [f"node{i}" for i in range(n)]
    edges = [(names[a], names[b]) for a, b in raw_edges if a != b]
    parts = louvain_communities(names, edges)
    flat = sorted(x for p in parts for x in p)
    assert flat == sorted(names)  # exact cover, no dup, no loss
    assert parts == louvain_communities(names, edges)  # deterministic
