"""Vectorized Levenshtein kernel + blocked fuzzy name join."""

import random

import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings, strategies as st

from eschergraph_ray.functions.editdist import (
    fuzzy_name_pairs,
    levenshtein_many,
)


def _lev_ref(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.text(max_size=12), st.text(max_size=12)),
        min_size=0,
        max_size=20,
    )
)
def test_levenshtein_many_matches_scalar_dp(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = levenshtein_many(a, b)
    assert list(got) == [_lev_ref(x, y) for x, y in pairs]


def test_levenshtein_many_known_values():
    a = ["kitten", "flaw", "", "abc", "same"]
    b = ["sitting", "lawn", "xyz", "", "same"]
    assert list(levenshtein_many(a, b)) == [3, 2, 3, 3, 0]


def test_fuzzy_name_pairs_blocked_join(ray_session):
    names = [
        "maria lopez", "mario lopez",        # same 'mar' block, dist 1
        "maria lopez",                        # duplicate: deduped
        "marcus chen",                        # same block, far
        "zelda quinn",                        # lone block
        "abc",                                # < min_len: dropped
        "tomas fontaine", "tomas fontana",    # 'tom' block, dist 2
    ]
    ds = rd.from_arrow(pa.table({"name": pa.array(names)}))
    out = fuzzy_name_pairs(ds, max_dist=2).to_pandas()
    got = set(map(tuple, out[["name_a", "name_b", "dist"]].values))
    assert got == {
        ("maria lopez", "mario lopez", 1),
        ("tomas fontaine", "tomas fontana", 2),
    }


def test_fuzzy_name_pairs_hot_block_cutoff(ray_session):
    # a block above the cutoff emits NOTHING (df-cutoff discipline)
    rng = random.Random(7)
    hot = [
        "aaa" + "".join(rng.choice("xy") for _ in range(5)) for _ in range(40)
    ]
    ds = rd.from_arrow(pa.table({"name": pa.array(hot + ["zzz1", "zzz2"])}))
    out = fuzzy_name_pairs(ds, max_dist=4, block_cutoff=10).to_pandas()
    assert set(out["name_a"].str[:3]) == {"zzz"}
