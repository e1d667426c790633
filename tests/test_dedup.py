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


def test_ngram_broadcast_and_join_paths_agree():
    # broadcast_sizes_below=0 forces the distributed-join path; the
    # default takes the broadcast fast path — byte-identical outputs
    bc = ngram_jaccard_pairs(
        _docs(), "doc_id", "text", n=3, threshold=0.5
    ).to_pandas()
    jn = ngram_jaccard_pairs(
        _docs(), "doc_id", "text", n=3, threshold=0.5, broadcast_sizes_below=0
    ).to_pandas()
    key = ["id_a", "id_b", "jaccard"]
    assert sorted(map(tuple, bc[key].values)) == sorted(map(tuple, jn[key].values))


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


def _rand_vec_table(n=40, dim=16, seed=3):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n // 2, dim))
    # pair each base vector with a slightly-perturbed near-dup
    near = base + 0.05 * rng.standard_normal((n // 2, dim))
    mat = np.vstack([base, near])
    return pa.table(
        {
            "vec_id": list(range(n)),
            "embedding": pa.array([r.tolist() for r in mat], pa.list_(pa.float32())),
        }
    )


def _exact_pairs_numpy(tbl, threshold):
    import numpy as np

    ids = tbl["vec_id"].to_pylist()
    mat = np.asarray(tbl["embedding"].combine_chunks().flatten(), dtype=np.float64).reshape(
        len(ids), -1
    )
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1
    m = mat / norms
    sims = np.round(m @ m.T, 4)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if sims[i, j] >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, float(sims[i, j])))
    return out


def test_embedding_chunk_pair_exact_matches_numpy():
    """The distributed block-nested-loop result == the single-matrix
    all-pairs result, for several chunk counts (incl. chunks > rows-per
    -chunk edge cases)."""
    tbl = _rand_vec_table()
    want = _exact_pairs_numpy(tbl, 0.9)
    for chunks in (1, 3, 7):
        got = embedding_near_dup_pairs(
            rd.from_arrow(tbl), "vec_id", "embedding", 0.9, num_chunks=chunks
        ).to_pandas()
        assert set(map(tuple, got[["id_a", "id_b", "cosine"]].values)) == want, chunks


def test_embedding_lsh_recall_vs_exact():
    from eschergraph_ray.functions.dedup import embedding_lsh_near_dup_pairs

    tbl = _rand_vec_table()
    exact = {(a, b) for a, b, _ in _exact_pairs_numpy(tbl, 0.9)}
    got = embedding_lsh_near_dup_pairs(
        rd.from_arrow(tbl), "vec_id", "embedding", 0.9
    ).to_pandas()
    lsh = set(map(tuple, got[["id_a", "id_b"]].values))
    # verification is exact-cosine, so no false positives ever
    assert lsh <= exact
    # high-cosine near-dups collide with overwhelming probability
    assert len(lsh) >= 0.9 * len(exact)


def test_ngram_df_cutoff_kills_hot_gram():
    """A gram present in every doc is excluded from pairing when its
    document frequency exceeds the cutoff; per-doc sizes stay exact so
    the reported jaccard is a lower bound (never a false positive)."""
    hot = "alpha beta gamma"  # planted ubiquitous trigram
    docs = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "text": [
                f"{hot} one two three four",
                f"{hot} one two three five",
                f"{hot} six seven eight nine",
                f"{hot} ten eleven twelve thirteen",
                f"{hot} fourteen fifteen sixteen seventeen",
                f"{hot} eighteen nineteen twenty twentyone",
            ],
        }
    )
    # cutoff below df(hot)=6: the hot gram pairs no one
    out = ngram_jaccard_pairs(
        rd.from_arrow(docs), "doc_id", "text", n=3, threshold=0.3, df_cutoff=5
    ).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].values))
    # docs 1,2 still reach threshold through their shared rare grams
    assert (1, 2) in pairs
    # docs sharing ONLY the hot gram never pair at all
    assert all(p == (1, 2) for p in pairs)
    # without the cutoff the hot gram pairs everyone above 0.3? no -
    # jaccard (1 common / 13) stays below threshold, but (1,2) rises
    full = ngram_jaccard_pairs(
        rd.from_arrow(docs), "doc_id", "text", n=3, threshold=0.3
    ).to_pandas()
    j_cut = out[(out.id_a == 1) & (out.id_b == 2)]["jaccard"].iloc[0]
    j_full = full[(full.id_a == 1) & (full.id_b == 2)]["jaccard"].iloc[0]
    assert j_cut <= j_full  # lower bound when the cut is active


def test_minhash_hot_bucket_cutoff():
    """A degenerate band bucket (here: many EMPTY docs, which all share
    the [0]*num_perm signature by construction) is skipped instead of
    paired O(df^2); genuine near-dups outside the bucket still pair."""
    empties = list(range(100, 110))
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2] + empties,
                "text": [BASE, BASE] + [""] * len(empties),
            }
        )
    )
    out = minhash_lsh_candidates(
        docs, "doc_id", "text", df_cutoff=5
    ).to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].values))
    assert (1, 2) in pairs  # real dup survives
    assert not any(a in empties and b in empties for a, b in pairs)
    # without the cutoff the degenerate bucket pairs all 10 empties
    full = minhash_lsh_candidates(docs, "doc_id", "text").to_pandas()
    fp = set(map(tuple, full[["id_a", "id_b"]].values))
    assert (empties[0], empties[1]) in fp


def test_simhash_matches_scalar_reference_and_duckdb_hash():
    """The vectorized SimHash kernel equals a straightforward scalar
    reference, and the word hash is byte-identical to DuckDB's
    md5_number_lower (which is what makes the SQL oracle possible)."""
    import hashlib

    import duckdb

    from eschergraph_ray.functions.dedup import _word_hash_u64

    con = duckdb.connect()
    for w in ["hello", "the", "Wört", "x'y", "123"]:
        assert (
            con.execute("select md5_number_lower(?)", [w]).fetchone()[0]
            == _word_hash_u64(w)
        )

    def scalar_simhash(text: str) -> int:
        acc = [0] * 64
        for w in (text or "").lower().split():
            hv = _word_hash_u64(w)
            for i in range(64):
                acc[i] += 1 if (hv >> i) & 1 else -1
        v = 0
        for i in range(64):
            if acc[i] > 0:
                v |= 1 << i
        return v - (1 << 63)

    texts = [BASE, NEAR, FAR, "", "one", "a a a b"]
    docs = rd.from_arrow(
        pa.table({"doc_id": list(range(len(texts))), "text": texts})
    )
    got = (
        simhash_values(docs, "doc_id", "text")
        .to_pandas()
        .set_index("doc_id")["simhash"]
    )
    for i, t in enumerate(texts):
        assert int(got[i]) == scalar_simhash(t), (i, t)


def test_containment_catches_quote_inclusion_jaccard_misses(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = " ".join(f"q{i}" for i in range(12))
    long = short + " " + " ".join(f"w{i}" for i in range(300))
    other = " ".join(f"z{i}" for i in range(50))
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([short, long, other], pa.string()),
        }
    )
    ds = rd.from_arrow(t).repartition(2)
    cont = ngram_containment_pairs(
        ds, "doc_id", "text", n=3, threshold=0.5
    ).to_pandas()
    # the short doc is fully contained: containment = 1.0
    assert cont[["id_a", "id_b"]].values.tolist() == [[1, 2]]
    assert cont["containment"].iloc[0] == 1.0
    # symmetric jaccard dilutes the same pair below 0.5
    jac = ngram_jaccard_pairs(
        ds, "doc_id", "text", n=3, threshold=0.5
    ).to_pandas()
    assert len(jac) == 0


def test_containment_empty_input(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.dedup import ngram_containment_pairs

    t = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
        }
    )
    out = ngram_containment_pairs(rd.from_arrow(t), "doc_id", "text")
    assert out.count() == 0
    assert out.schema().names == ["id_a", "id_b", "containment"]


def test_jaccard_prefix_pairs_exact_vs_bruteforce(ray_session):
    """The prefix filter must find EVERY pair >= threshold (no
    df-cutoff lower-bound caveat) — compared against the brute-force
    all-pairs shingle Jaccard."""
    import numpy as np

    from eschergraph_ray.functions.dedup import (
        _word_shingles,
        jaccard_prefix_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = {
        "d1": base,
        "d2": base + " extra tail words here",       # near-dup of d1
        "d3": "completely different content about ray data pipelines",
        "d4": base.replace("quick", "slow"),          # near-dup of d1
        "d5": "ray data pipelines process completely different content",
        "d6": "tiny",                                 # short-text path
    }
    want = {}
    ks = sorted(docs)
    for i in range(len(ks)):
        for j in range(i + 1, len(ks)):
            a = _word_shingles(docs[ks[i]], 3)
            b = _word_shingles(docs[ks[j]], 3)
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= 0.5:
                want[(ks[i], ks[j])] = float(np.floor(jac * 1e6 + 0.5) / 1e6)

    tbl = pa.table(
        {
            "doc_id": pa.array(ks, pa.string()),
            "text": pa.array([docs[k] for k in ks], pa.string()),
        }
    )
    out = jaccard_prefix_pairs(
        rd.from_arrow(tbl).repartition(3), "doc_id", "text",
        shingle_k=3, threshold=0.5,
    ).to_pandas()
    got = {
        (r["id_a"], r["id_b"]): float(r["jaccard"])
        for _, r in out.iterrows()
    }
    assert got == want and len(want) >= 2  # the planted near-dups exist

    # exact-or-refuse: an absurdly low prefix_df_cutoff trips the guard
    import pytest

    with pytest.raises(ValueError, match="prefix_df_cutoff"):
        jaccard_prefix_pairs(
            rd.from_arrow(tbl), "doc_id", "text", shingle_k=3,
            threshold=0.5, prefix_df_cutoff=1,
        )


def test_simhash_hamming_histogram_identical_and_total():
    from eschergraph_ray.functions.dedup import simhash_hamming_histogram

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["alpha beta gamma", "alpha beta gamma",
                 "zzz qqq completely different words"],
    }))
    out = simhash_hamming_histogram(ds, "doc_id", "text",
                                    sample_n=16).to_pandas()
    rows = dict(zip(out["hamming"], out["n_pairs"]))
    assert rows.get(0) == 1           # the identical pair
    assert sum(rows.values()) == 3    # C(3,2)
    assert all(h <= 64 for h in rows)


def test_simhash_hamming_histogram_too_small():
    from eschergraph_ray.functions.dedup import simhash_hamming_histogram

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": ["only one"],
    }))
    assert simhash_hamming_histogram(ds, "doc_id", "text").count() == 0


def test_minhash_calibration_identical_docs_bin_zero():
    from eschergraph_ray.functions.dedup import (
        minhash_calibration_histogram,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": [text, text],
    }))
    out = minhash_calibration_histogram(ds, "doc_id", "text").to_pandas()
    # identical docs: estimate == exact == 1e6 -> error bin 0
    rows = dict(zip(out["err_bin"], out["n_pairs"]))
    assert rows == {0: 1}


def test_minhash_calibration_no_candidates_empty():
    from eschergraph_ray.functions.dedup import (
        minhash_calibration_histogram,
    )

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": ["completely different words here entirely",
                 "nothing shared with the other document at all"],
    }))
    out = minhash_calibration_histogram(ds, "doc_id", "text")
    assert out.count() == 0
