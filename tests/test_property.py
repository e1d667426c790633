"""Property-style tests (hypothesis) for core invariants."""

import pyarrow as pa
from hypothesis import example, given, settings, strategies as st

from eschergraph_ray.functions.community import louvain_communities
from eschergraph_ray.functions.text import count_tokens, token_set_ratio
from eschergraph_ray.stages.chunking import MAX_TOKENS, add_turn_tokens, chunk_group

WORD = st.text(alphabet="abcdefghij", min_size=1, max_size=8)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=200), st.text(max_size=200))
@example("2P", "p20P")  # SequenceMatcher order-asymmetry regression
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


TAG_KEY = st.text(alphabet="abcdefgh_", min_size=1, max_size=6)
TAG_VAL = st.one_of(
    st.text(alphabet="abc xyz", max_size=8),
    st.integers(min_value=-99, max_value=99),
    st.booleans(),
    st.none(),
    # floats and float-precision-lossy ints: float(2**53+1) == 2**53,
    # so the float-form literal must be guarded by Python equality
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.integers(min_value=2**53 - 2, max_value=2**53 + 4),
)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.dictionaries(TAG_KEY, TAG_VAL, max_size=4), max_size=8),
    st.dictionaries(TAG_KEY, TAG_VAL, min_size=1, max_size=3),
    st.booleans(),
)
def test_tag_regex_filter_equals_reference_semantics(tag_dicts, filter_tags, ignore_missing):
    """The vectorized per-key regex over canonical JSON implements
    exactly the reference's filter_documents_by_tags loop
    (simple_repository.py:706-723), for string/int/bool/null values."""
    import re

    from eschergraph_ray.functions.tags import (
        _key_pattern,
        _value_literals,
        canonical_tags,
    )

    def regex_filter(tags_json: str) -> bool:
        for k, v in filter_tags.items():
            m = re.search(_key_pattern(k), tags_json)
            if m is None:
                if not ignore_missing:
                    return False
            elif m.group("v") not in _value_literals(v):
                return False
        return True

    def reference_filter(tags: dict) -> bool:
        include = True
        for k, v in filter_tags.items():
            if k not in tags and not ignore_missing:
                include = False
            elif k in tags and tags[k] != v:
                include = False
            if not include:
                break
        return include

    for tags in tag_dicts:
        got = regex_filter(canonical_tags(tags))
        want = reference_filter(tags)
        assert got == want, (tags, filter_tags, ignore_missing)
