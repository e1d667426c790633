"""Unigram-LM scoring, bigram-PMI collocations, and distributed
k-means (assign + fit) — unit semantics plus the DuckDB oracle replays
the driver harness runs."""

import math

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from eschergraph_ray.functions.similarity import (
    kmeans_assign,
    kmeans_fit,
    seed_centroids,
)
from eschergraph_ray.functions.vocab import bigram_pmi_topk, unigram_nll

SF = "/root/testdata/sf0.001"


def _docs_tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


def _vec_tbl(ids, vecs):
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float64())
            ),
        }
    )


# ---------- unigram NLL ----------


def test_unigram_nll_hand_computed():
    # corpus: "a a b" + "a" -> p(a)=3/4, p(b)=1/4
    ds = rd.from_arrow(_docs_tbl([(1, "a a b"), (2, "a")]))
    out = {r["doc_id"]: r for r in unigram_nll(ds, "doc_id", "text").take_all()}
    qa = round(math.log(3 / 4) * 1e6)
    qb = round(math.log(1 / 4) * 1e6)
    want1 = round(-(2 * qa + qb) / 3) / 1e6
    want2 = round(-float(qa)) / 1e6
    assert out[1]["n_tokens"] == 3 and out[1]["nll"] == want1
    assert out[2]["n_tokens"] == 1 and out[2]["nll"] == want2
    # lower perplexity for the doc made of the more common token
    assert out[2]["nll"] < out[1]["nll"]


def test_unigram_nll_skips_empty_docs():
    ds = rd.from_arrow(_docs_tbl([(1, "word"), (2, ""), (3, "   ")]))
    out = unigram_nll(ds, "doc_id", "text").take_all()
    assert sorted(r["doc_id"] for r in out) == [1]


def test_unigram_nll_vocab_guard():
    ds = rd.from_arrow(_docs_tbl([(1, "a b c d e")]))
    with pytest.raises(ValueError, match="max_vocab_broadcast"):
        unigram_nll(ds, "doc_id", "text", max_vocab_broadcast=2)


def test_docs_unigram_nll_oracle_sf0001():
    import __ray_entry__ as E

    got = (
        E.queries()["docs_unigram_nll"](SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(E.oracle_sql()["docs_unigram_nll"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


# ---------- bigram PMI ----------


def test_bigram_pmi_hand_computed():
    # 4 docs of "x y"; bigram (x,y) n=4, unigrams x=4 y=4, N_uni=8 N_bi=4
    ds = rd.from_arrow(_docs_tbl([(i, "x y") for i in range(4)]))
    out = bigram_pmi_topk(ds, "text", k=5, min_count=2).take_all()
    assert len(out) == 1
    r = out[0]
    micro = round(math.log(4 * 8 * 8 / (4 * 4 * 4)) * 1e6)  # ln 4
    assert (r["w1"], r["w2"], r["n"]) == ("x", "y", 4)
    assert r["pmi"] == micro / 1e6


def test_bigram_pmi_min_count_and_order():
    rows = [(i, "big apple") for i in range(5)] + [
        (10 + i, "big deal") for i in range(3)
    ]
    ds = rd.from_arrow(_docs_tbl(rows))
    out = bigram_pmi_topk(ds, "text", k=5, min_count=5).take_all()
    # (big, deal) n=3 cut by min_count; only (big, apple) survives
    assert [(r["w1"], r["w2"]) for r in out] == [("big", "apple")]


def test_bigram_pmi_empty_corpus():
    ds = rd.from_arrow(_docs_tbl([(1, "solo")]))  # no adjacent pair
    assert bigram_pmi_topk(ds, "text", k=5).take_all() == []


def test_docs_collocations_oracle_sf0001():
    import __ray_entry__ as E

    got = E.queries()["docs_collocations"](SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(E.oracle_sql()["docs_collocations"]).df()
    # ordered top-k: compare as emitted
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


# ---------- k-means ----------


def test_seed_centroids_smallest_ids_normalized():
    ds = rd.from_arrow(
        _vec_tbl([30, 10, 20], [[0, 2.0], [3.0, 0], [0, 0.5]])
    )
    ids, cent = seed_centroids(ds, "vec_id", "embedding", k=2)
    assert ids == [10, 20]
    np.testing.assert_allclose(cent, [[1.0, 0.0], [0.0, 1.0]])


def test_kmeans_assign_nearest_and_tiebreak():
    ds = rd.from_arrow(
        _vec_tbl(
            [0, 1, 2, 3],
            [[1.0, 0.0], [0.0, 1.0], [0.9, 0.1], [1.0, 1.0]],
        )
    )
    ids, cent = seed_centroids(ds, "vec_id", "embedding", k=2)
    out = {
        r["vec_id"]: r
        for r in kmeans_assign(ds, ids, cent, "vec_id", "embedding").take_all()
    }
    assert out[0]["cluster"] == 0 and out[0]["cosine"] == 1.0
    assert out[1]["cluster"] == 1
    assert out[2]["cluster"] == 0  # closer to x-axis
    # [1,1] is equidistant: rounded cosines tie -> smallest centroid id
    assert out[3]["cluster"] == 0
    assert out[3]["cosine"] == round(math.sqrt(0.5) * 1e4) / 1e4


def test_kmeans_fit_separates_two_blobs():
    rng = np.random.default_rng(7)
    a = rng.normal([5, 0, 0], 0.05, (20, 3))
    b = rng.normal([0, 5, 0], 0.05, (20, 3))
    vecs = np.vstack([a, b])
    ds = rd.from_arrow(_vec_tbl(list(range(40)), vecs))
    cent = kmeans_fit(ds, "vec_id", "embedding", k=2, iters=4)
    assert cent.shape == (2, 3)
    # one centroid per blob, each ~unit-normalized blob mean
    sims = cent @ np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1.0]]).T
    tops = set(np.argmax(sims, axis=1))
    assert tops == {0, 1}
    np.testing.assert_allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-9)


def test_kmeans_fit_matches_numpy_reference():
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 4))
    ds = rd.from_arrow(_vec_tbl(list(range(30)), vecs))
    got = kmeans_fit(ds, "vec_id", "embedding", k=3, iters=3)

    # driver-side reference: same seeds, same update rule
    m = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cent = m[:3].copy()
    for _ in range(3):
        best = np.argmax(m @ cent.T, axis=1)
        new = cent.copy()
        for c in range(3):
            members = m[best == c]
            if len(members):
                s = members.sum(axis=0)
                n = np.linalg.norm(s)
                if n > 0:
                    new[c] = s / n
        cent = new
    np.testing.assert_allclose(got, cent, atol=1e-12)


def test_ivf_topk_accepts_kmeans_fit_centroids():
    """kmeans_fit is the full-corpus IVF quantizer (the scale path past
    the bounded-sample trainer): its centroids slot straight into
    ivf_topk, and recall vs brute force stays high."""
    from eschergraph_ray.functions.similarity import brute_force_topk, ivf_topk

    ds = rd.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    q = ds.take(1)[0]["embedding"]
    cent = kmeans_fit(ds, "vec_id", "embedding", k=8, iters=3)
    exact = [
        r["vec_id"]
        for r in brute_force_topk(ds, q, "vec_id", "embedding", k=10).take_all()
    ]
    approx = [
        r["vec_id"]
        for r in ivf_topk(
            ds, q, "vec_id", "embedding", k=10, n_probe=4, centroids=cent
        ).take_all()
    ]
    assert len(set(exact) & set(approx)) >= 9


def test_embeddings_kmeans_assign_oracle_sf0001():
    import __ray_entry__ as E

    got = (
        E.queries()["embeddings_kmeans_assign"](SF)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    want = (
        con.execute(E.oracle_sql()["embeddings_kmeans_assign"])
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(got) == 500 and got["cluster"].nunique() > 1
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


# ---------- bigram NLL ----------


def test_bigram_nll_hand_computed():
    from eschergraph_ray.functions.vocab import bigram_nll

    # corpus bigrams: doc1 "a b a c" -> (a b), (b a), (a c);
    # doc2 "a b" -> (a b). prefix(a)=3, prefix(b)=1:
    # p(b|a)=2/3, p(c|a)=1/3, p(a|b)=1
    ds = rd.from_arrow(_docs_tbl([(1, "a b a c"), (2, "a b")]))
    out = {r["doc_id"]: r for r in bigram_nll(ds, "doc_id", "text").take_all()}
    q_ab = round(math.log(2 / 3) * 1e6)
    q_ac = round(math.log(1 / 3) * 1e6)
    want1 = round(-(q_ab + 0 + q_ac) / 3) / 1e6
    want2 = round(-float(q_ab)) / 1e6
    assert out[1]["n_bigrams"] == 3 and out[1]["nll"] == want1
    assert out[2]["n_bigrams"] == 1 and out[2]["nll"] == want2
    # the doc containing the rarer transition scores worse
    assert out[1]["nll"] > out[2]["nll"]


def test_bigram_nll_skips_short_docs():
    from eschergraph_ray.functions.vocab import bigram_nll

    ds = rd.from_arrow(_docs_tbl([(1, "a b"), (2, "solo"), (3, "")]))
    out = bigram_nll(ds, "doc_id", "text").take_all()
    assert sorted(r["doc_id"] for r in out) == [1]


def test_bigram_nll_join_path_matches_broadcast():
    """Past max_vocab_broadcast the op switches to the distributed
    hash-join scoring path (VERDICT r4 #2) instead of refusing; both
    paths quantize per-bigram micro-nats identically and sum in int64,
    so outputs are byte-equal."""
    from eschergraph_ray.functions.vocab import bigram_nll

    rows = [(1, "a b a c"), (2, "a b"), (3, "c a b d e a b"),
            (4, "solo"), (5, "")]
    ds = rd.from_arrow(_docs_tbl(rows)).repartition(3)
    key = lambda r: r["doc_id"]  # noqa: E731
    want = sorted(bigram_nll(ds, "doc_id", "text").take_all(), key=key)
    got = sorted(
        bigram_nll(ds, "doc_id", "text", force_join_path=True).take_all(),
        key=key,
    )
    assert got == want and len(want) == 3
    # an over-budget vocabulary takes the join path, not a ValueError
    got2 = sorted(
        bigram_nll(ds, "doc_id", "text", max_vocab_broadcast=2).take_all(),
        key=key,
    )
    assert got2 == want


def test_bigram_pmi_join_path_matches_broadcast():
    from eschergraph_ray.functions.vocab import bigram_pmi_topk

    rows = [(i, "big apple pie") for i in range(5)] + [
        (10 + i, "big deal now then") for i in range(3)
    ]
    ds = rd.from_arrow(_docs_tbl(rows)).repartition(3)
    want = bigram_pmi_topk(ds, "text", k=10, min_count=2).take_all()
    got = bigram_pmi_topk(
        ds, "text", k=10, min_count=2, force_join_path=True
    ).take_all()
    assert got == want and len(want) >= 3
    got2 = bigram_pmi_topk(
        ds, "text", k=10, min_count=2, max_vocab_broadcast=2
    ).take_all()
    assert got2 == want


# ---------- ctfidf_top_terms ----------


def _ctfidf_run(rows, m=2, **kw):
    from eschergraph_ray.functions.vocab import ctfidf_top_terms

    ds = rd.from_arrow(
        pa.table(
            {
                "source": pa.array([r[0] for r in rows], pa.string()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )
    return ctfidf_top_terms(ds, "source", "text", m=m, **kw).to_pandas()


def test_ctfidf_hand(ray_session):
    # class A: "cat cat dog", class B: "dog fish" ->
    # T=5, k=2, A=2.5; f: cat 2, dog 2, fish 1
    out = _ctfidf_run([("A", "cat cat dog"), ("B", "dog fish")], m=2)
    got = {(r.source, r.token): r.score_micro for r in out.itertuples()}
    import math

    A = 5 / 2
    w = lambda f: math.log(1 + A / f)
    exp = {
        ("A", "cat"): round(2 * w(2) * 1e6),
        ("A", "dog"): round(1 * w(2) * 1e6),
        ("B", "dog"): round(1 * w(2) * 1e6),
        ("B", "fish"): round(1 * w(1) * 1e6),
    }
    assert got == exp
    # the class-exclusive rare term outranks the shared one in B
    assert got[("B", "fish")] > got[("B", "dog")]


def test_ctfidf_multiblock_and_duckdb(ray_session):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (f"s{rng.integers(0, 4)}",
         " ".join(rng.choice(vocab, size=rng.integers(3, 25)).tolist()))
        for _ in range(200)
    ]
    from eschergraph_ray.functions.vocab import ctfidf_top_terms

    tbl = pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    one = ctfidf_top_terms(
        rd.from_arrow(tbl), "source", "text", m=3
    ).to_pandas()
    many = ctfidf_top_terms(
        rd.from_arrow(tbl).repartition(11), "source", "text", m=3,
        num_buckets=8,
    ).to_pandas()
    pd.testing.assert_frame_equal(one, many)
    df = pd.DataFrame(rows, columns=["source", "text"])
    o = duckdb.sql(
        """
        WITH tok AS (
          SELECT source, unnest(regexp_extract_all(lower(text),
              '[A-Za-z]+(''[A-Za-z]+)?|\\d+|[^\\w\\s]')) AS token
          FROM df
        ),
        tf AS (SELECT source, token, CAST(count(*) AS BIGINT) tf
               FROM tok GROUP BY source, token),
        ft AS (SELECT token, CAST(sum(tf) AS BIGINT) f
               FROM tf GROUP BY token),
        tot AS (SELECT CAST(sum(tf) AS BIGINT) T,
                       CAST(count(DISTINCT source) AS BIGINT) k FROM tf),
        sc AS (
          SELECT source, token,
                 tf * ln(1 + (CAST(tot.T AS DOUBLE) / tot.k) / f) AS s,
                 CAST(round(
                   tf * ln(1 + (CAST(tot.T AS DOUBLE) / tot.k) / f)
                     * 1e6, 0) AS BIGINT) AS score_micro
          FROM tf JOIN ft USING (token) CROSS JOIN tot
        ),
        rk AS (SELECT source, token, score_micro, row_number() OVER (
                 PARTITION BY source ORDER BY s DESC, token) rn FROM sc)
        SELECT source, token, score_micro FROM rk WHERE rn <= 3
        ORDER BY source, token
        """
    ).df()
    pd.testing.assert_frame_equal(one, o, check_dtype=False)


def test_ctfidf_empty(ray_session):
    out_ds = _ctfidf_run([], m=2)
    assert len(out_ds) == 0
