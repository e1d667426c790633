"""Dedup operator semantics on crafted corpora."""

import pyarrow as pa
import ray.data as rd

from eschergraph_ray.functions.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    jaccard_verify_pairs,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_values,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays "
    "standard tunes about data processing engines and their many shuffles"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one word changed
FAR = "completely different content about gardening tomatoes in summer heat"


def _docs():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [BASE, BASE, NEAR, FAR],
            }
        )
    )


def test_exact_dedup_keeps_min_id():
    out = exact_dedup(_docs(), "doc_id", "text").to_pandas()
    assert sorted(out["doc_id"]) == [1, 3, 4]


def test_minhash_lsh_finds_near_duplicate():
    docs = _docs()
    cand = minhash_lsh_candidates(docs, "doc_id", "text")
    pairs = set(map(tuple, cand.to_pandas()[["id_a", "id_b"]].values))
    assert (1, 2) in pairs  # identical docs always collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup should collide
    verified = jaccard_verify_pairs(cand, docs, "doc_id", "text", threshold=0.7).to_pandas()
    vp = set(map(tuple, verified[["id_a", "id_b"]].values))
    assert (1, 2) in vp
    assert all(4 not in p for p in vp)  # FAR never verifies
    exact = verified[(verified.id_a == 1) & (verified.id_b == 2)]["jaccard"].iloc[0]
    assert exact == 1.0


def test_simhash_identical_and_near():
    sh = simhash_values(_docs(), "doc_id", "text").to_pandas().set_index("doc_id")["simhash"]
    assert sh[1] == sh[2]
    def ham(a, b):
        return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")
    assert ham(sh[1], sh[3]) < ham(sh[1], sh[4])
    pairs = simhash_near_pairs(_docs(), "doc_id", "text", max_hamming=3).to_pandas()
    ps = set(map(tuple, pairs[["id_a", "id_b"]].values))
    assert (1, 2) in ps


def test_ngram_jaccard_exact_values():
    out = ngram_jaccard_pairs(_docs(), "doc_id", "text", n=3, threshold=0.5).to_pandas()
    row = out[(out.id_a == 1) & (out.id_b == 2)]
    assert len(row) == 1 and row["jaccard"].iloc[0] == 1.0
    row13 = out[(out.id_a == 1) & (out.id_b == 3)]
    assert len(row13) == 1 and 0.5 <= row13["jaccard"].iloc[0] < 1.0
    assert not ((out.id_a == 1) & (out.id_b == 4)).any()


def test_embedding_near_dup():
    vecs = pa.table(
        {
            "vec_id": [1, 2, 3],
            "embedding": pa.array(
                [[1.0, 0.0, 0.0], [0.999, 0.04, 0.0], [0.0, 1.0, 0.0]],
                pa.list_(pa.float32()),
            ),
        }
    )
    out = embedding_near_dup_pairs(rd.from_arrow(vecs), "vec_id", "embedding", 0.9).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].values))
    assert pairs == {(1, 2)}
