"""Round-4 corpus-statistics / curation operators: benchmark
decontamination, vocabulary top-k, per-doc TF-IDF keywords, dedup
survivors — unit semantics plus DuckDB oracle replays (the same
comparisons the driver harness runs)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from eschergraph_ray.functions.components import dedup_survivors
from eschergraph_ray.functions.decontam import _doc_grams, decontaminate
from eschergraph_ray.functions.vocab import tfidf_top_terms, vocab_topk

SF = "/root/testdata/sf0.001"


def _docs_tbl(rows):
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )


# ---------- decontamination ----------


def test_doc_grams_window_and_short_doc():
    assert _doc_grams("A b c d", 3) == {"a b c", "b c d"}
    assert _doc_grams("a b", 3) == set()
    assert _doc_grams("  a   b\tc ", 2) == {"a b", "b c"}  # ws runs collapse
    assert _doc_grams(None, 2) == set()


def test_decontaminate_counts_distinct_shared_grams():
    bench = rd.from_arrow(_docs_tbl([(100, "the quick brown fox jumps")]))
    corpus = rd.from_arrow(
        _docs_tbl(
            [
                # contains BOTH bench 3-grams, one of them twice ->
                # n_hits counts DISTINCT grams (2), not occurrences
                (1, "x the quick brown fox jumps y the quick brown z"),
                (2, "totally unrelated words here"),  # clean: no row
                (3, "ends with the quick brown"),  # one gram
            ]
        )
    )
    out = decontaminate(corpus, bench, "doc_id", "text", n=3).take_all()
    got = {r["doc_id"]: r["n_hits"] for r in out}
    assert got == {1: 3, 3: 1}  # doc1: 'the quick brown','quick brown fox','brown fox jumps'


def test_decontaminate_no_hits_is_empty_with_schema():
    bench = rd.from_arrow(_docs_tbl([(9, "alpha beta gamma delta")]))
    corpus = rd.from_arrow(_docs_tbl([(1, "one two three four five")]))
    out = decontaminate(corpus, bench, "doc_id", "text", n=4)
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")]
    ) if out.count() else None
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "n_hits"}


def test_decontaminate_max_grams_guard():
    bench = rd.from_arrow(_docs_tbl([(9, "a b c d e f g h i j")]))
    corpus = rd.from_arrow(_docs_tbl([(1, "a b c")]))
    with pytest.raises(ValueError, match="max_grams"):
        decontaminate(corpus, bench, "doc_id", "text", n=2, max_grams=3)


def test_docs_decontaminate_oracle_sf0001():
    import __ray_entry__ as E

    got = (
        E.queries()["docs_decontaminate"](SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(E.oracle_sql()["docs_decontaminate"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) > 0  # the synthetic near-dups guarantee hits
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


# ---------- vocabulary top-k ----------


def test_vocab_topk_counts_and_tiebreak():
    ds = rd.from_arrow(
        _docs_tbl([(1, "red red blue"), (2, "blue green! green red")])
    )
    out = vocab_topk(ds, "text", k=3).take_all()
    # red=3, blue=2, green=2 -> tie (blue, green) breaks token-asc;
    # '!' (count 1) is cut by k
    assert [(r["token"], r["n"]) for r in out] == [
        ("red", 3),
        ("blue", 2),
        ("green", 2),
    ]


def test_vocab_topk_oracle_sf0001():
    import __ray_entry__ as E

    got = E.queries()["docs_vocab_topk"](SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = con.execute(E.oracle_sql()["docs_vocab_topk"]).df()
    # order matters (top-k): compare as emitted
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


# ---------- TF-IDF ----------


def test_tfidf_scores_and_local_topm():
    # 4 docs; 'rare' appears in 1 doc (idf=ln4), 'half' in 2 (ln2),
    # 'all' in every doc (idf=0 -> never emitted)
    ds = rd.from_arrow(
        _docs_tbl(
            [
                (1, "all rare half"),
                (2, "all half"),
                (3, "all"),
                (4, "all"),
            ]
        )
    )
    import math

    out = tfidf_top_terms(ds, "doc_id", "text", m=2).take_all()
    got = {(r["doc_id"], r["token"]): r["tfidf"] for r in out}
    assert got == {
        (1, "rare"): round(math.log(4.0), 6),
        (1, "half"): round(math.log(2.0), 6),
        (2, "half"): round(math.log(2.0), 6),
    }


def test_tfidf_min_df_drops_singletons():
    ds = rd.from_arrow(_docs_tbl([(1, "unique shared"), (2, "shared")]))
    out = tfidf_top_terms(ds, "doc_id", "text", m=5, min_df=2).take_all()
    # 'unique' (df=1) is cut by min_df; 'shared' is in all docs (idf 0)
    assert out == []


def test_tfidf_vocab_broadcast_guard():
    ds = rd.from_arrow(_docs_tbl([(1, "a b c d e")]))
    with pytest.raises(ValueError, match="max_vocab_broadcast"):
        tfidf_top_terms(ds, "doc_id", "text", max_vocab_broadcast=2)


def test_docs_tfidf_terms_oracle_sf0001():
    import __ray_entry__ as E

    cols = ["doc_id", "token"]
    got = (
        E.queries()["docs_tfidf_terms"](SF)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(E.oracle_sql()["docs_tfidf_terms"])
        .df()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


# ---------- dedup survivors ----------


def test_dedup_survivors_keeps_canonical_and_singletons():
    comps = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([5, 9, 7, 20, 30], pa.int64()),
                "component_id": pa.array([5, 5, 5, 20, 20], pa.int64()),
            }
        )
    )
    docs = rd.from_arrow(
        _docs_tbl([(i, f"doc {i}") for i in [5, 7, 9, 11, 20, 30]])
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_survivors(docs, comps, "doc_id").take_all()
    )
    # 5 and 20 are canonical, 11 was never paired; 7, 9, 30 drop
    assert kept == [5, 11, 20]


def test_dedup_survivors_empty_components_keeps_all():
    comps = rd.from_arrow(
        pa.schema(
            [("doc_id", pa.int64()), ("component_id", pa.int64())]
        ).empty_table()
    )
    docs = rd.from_arrow(_docs_tbl([(1, "a"), (2, "b")]))
    assert dedup_survivors(docs, comps, "doc_id").count() == 2


def test_per_group_topk_sample_deterministic_and_partition_invariant():
    import hashlib

    from eschergraph_ray.functions.sampling import per_group_topk_sample

    tbl = pa.table(
        {
            "src": pa.array([f"s{i % 3}" for i in range(40)], pa.string()),
            "doc_id": pa.array(list(range(40)), pa.int64()),
        }
    )
    one = per_group_topk_sample(
        rd.from_arrow(tbl), "src", "doc_id", k=2, salt="x"
    ).take_all()
    many = per_group_topk_sample(
        rd.from_arrow(tbl).repartition(7), "src", "doc_id", k=2, salt="x"
    ).take_all()
    key = lambda r: (r["src"], r["rank"])
    assert sorted(one, key=key) == sorted(many, key=key)
    # replay the spec directly: k smallest md5(salt||id) per group
    for src in ["s0", "s1", "s2"]:
        ids = [i for i in range(40) if f"s{i % 3}" == src]
        want = sorted(ids, key=lambda i: (hashlib.md5(f"x{i}".encode()).hexdigest(), i))[:2]
        got = [
            r["doc_id"]
            for r in sorted(one, key=key)
            if r["src"] == src
        ]
        assert got == want


def test_docs_sample_per_source_oracle_sf0001():
    import __ray_entry__ as E

    cols = ["source", "rank"]
    got = (
        E.queries()["docs_sample_per_source"](SF)
        .to_pandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(E.oracle_sql()["docs_sample_per_source"])
        .df()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert len(got) > 0 and got["rank"].max() <= 3
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_mask_repeated_spans_masks_shared_windows():
    from eschergraph_ray.functions.decontam import mask_repeated_spans

    shared = "one two three"  # 3-gram shared by docs 1 and 2
    docs = rd.from_arrow(
        _docs_tbl(
            [
                (1, f"alpha {shared} beta"),
                (2, f"{shared} gamma delta"),
                (3, "totally different words here"),
                (4, ""),  # empty doc: no output row
            ]
        )
    )
    out = {
        r["doc_id"]: r
        for r in mask_repeated_spans(docs, "doc_id", "text", n=3).take_all()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["n_masked"] == 3 and out[1]["text_clean"] == "alpha beta"
    assert out[2]["n_masked"] == 3 and out[2]["text_clean"] == "gamma delta"
    assert out[3]["n_masked"] == 0
    assert out[3]["text_clean"] == "totally different words here"


def test_mask_repeated_spans_full_mask_is_null():
    from eschergraph_ray.functions.decontam import mask_repeated_spans

    docs = rd.from_arrow(_docs_tbl([(1, "a b c"), (2, "a b c")]))
    out = {
        r["doc_id"]: r
        for r in mask_repeated_spans(docs, "doc_id", "text", n=3).take_all()
    }
    assert out[1]["n_masked"] == 3 and out[1]["text_clean"] is None
    assert out[2]["n_masked"] == 3 and out[2]["text_clean"] is None


def test_mask_repeated_spans_overlapping_windows_union():
    from eschergraph_ray.functions.decontam import mask_repeated_spans

    # docs share a 4-word run -> two overlapping hot 3-grams; coverage
    # is the UNION of windows, not double-counted
    docs = rd.from_arrow(
        _docs_tbl([(1, "p q r s x"), (2, "y p q r s")])
    )
    out = {
        r["doc_id"]: r
        for r in mask_repeated_spans(docs, "doc_id", "text", n=3).take_all()
    }
    assert out[1]["n_masked"] == 4 and out[1]["text_clean"] == "x"
    assert out[2]["n_masked"] == 4 and out[2]["text_clean"] == "y"


def test_docs_mask_spans_oracle_sf0001():
    import __ray_entry__ as E

    got = (
        E.queries()["docs_mask_spans"](SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(E.oracle_sql()["docs_mask_spans"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["n_masked"] > 0).sum() > 0  # the near-dups really mask
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_normalize_text_unicode_and_whitespace():
    from eschergraph_ray.functions.textstats import normalize_text

    docs = rd.from_arrow(
        _docs_tbl([(1, "  Héllo   Wörld  "), (2, "A\tB\nC"), (3, "")])
    )
    out = {
        r["doc_id"]: r for r in normalize_text(docs, "doc_id", "text").take_all()
    }
    assert out[1]["text_norm"] == "héllo wörld"
    assert out[1]["n_chars_norm"] == 11
    assert out[2]["text_norm"] == "a b c"
    assert out[3]["text_norm"] == "" and out[3]["n_chars_norm"] == 0


def test_docs_normalize_oracle_sf0001():
    import __ray_entry__ as E

    got = (
        E.queries()["docs_normalize"](SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(E.oracle_sql()["docs_normalize"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_curation_verdict_each_rule_fires():
    from eschergraph_ray.functions.textstats import curation_verdict

    good = (
        "the quick brown fox jumps over a lazy dog and runs on with "
        "great speed for it is that kind of animal in the wild"
    )
    docs = rd.from_arrow(
        _docs_tbl(
            [
                (1, good),  # passes everything
                (2, "short text"),  # len_ok = 0
                (3, "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( )))) !!!! "
                    "@@@@ #### $$$$ %%%% ^^^^"),  # alpha_ok = 0 (and others)
                (4, "alpha beta gamma delta epsilon zeta eta theta iota "
                    "kappa lambdaa mu nu xi"),  # stop_ok = 0 (no stopwords)
                (5, ("the dog " * 40) + "is it"),  # rep_ok = 0 (TTR tiny)
                (6, "der hund ist nicht mit das und ein eine zu der und "
                    "ist nicht mit das"),  # lang_ok = 0 (German)
            ]
        )
    )
    out = {
        r["doc_id"]: r
        for r in curation_verdict(docs, "doc_id", "text").take_all()
    }
    assert out[1]["keep"] == 1
    assert out[2]["len_ok"] == 0 and out[2]["keep"] == 0
    assert out[3]["alpha_ok"] == 0 and out[3]["keep"] == 0
    assert out[4]["stop_ok"] == 0 and out[4]["keep"] == 0
    assert out[5]["rep_ok"] == 0 and out[5]["keep"] == 0
    assert out[6]["lang_ok"] == 0 and out[6]["keep"] == 0


def test_docs_curation_verdict_oracle_sf0001():
    import __ray_entry__ as E

    got = (
        E.queries()["docs_curation_verdict"](SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(E.oracle_sql()["docs_curation_verdict"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # the verdict must actually discriminate on this corpus
    assert 0 < got["keep"].sum() < len(got)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_dedup_survivors_oracle_sf0001():
    import __ray_entry__ as E

    got = sorted(
        r["doc_id"] for r in E.queries()["dedup_survivors"](SF).take_all()
    )
    con = duckdb.connect()
    for t in ["documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    want = sorted(con.execute(E.oracle_sql()["dedup_survivors"]).df()["doc_id"])
    assert len(got) < 500  # some documents actually dropped
    assert got == want


def test_source_overlap_matrix_hand():
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.decontam import source_overlap_matrix

    # s1/s2 share exactly the shingle "a b c"; s3 shares nothing;
    # a 2-word doc uses the whole-text path; empty text and null
    # source contribute nothing
    docs = pa.table(
        {
            "text": [
                "a b c d",        # s1: shingles {a b c, b c d}
                "x a b c y",      # s2: {x a b, a b c, b c y}
                "p q",            # s3: whole-text shingle {p q}
                "",               # s1: nothing
                "ignored text here",  # null source: dropped
            ],
            "source": ["s1", "s2", "s3", "s1", None],
        }
    )
    out = source_overlap_matrix(
        rd.from_arrow(docs).repartition(2), "text", "source"
    ).to_pandas()
    got = {(r.src_a, r.src_b): r.n_shared for r in out.itertuples()}
    assert got == {
        ("s1", "s1"): 2, ("s2", "s2"): 3, ("s3", "s3"): 1,
        ("s1", "s2"): 1,
    }
    # ordered by pair; empty input -> typed empty
    assert list(out["src_a"]) == sorted(out["src_a"])
    e = source_overlap_matrix(rd.from_arrow(docs[:0]), "text", "source")
    assert e.take_all() == []
    assert e.schema().names == ["src_a", "src_b", "n_shared"]


def test_table_profile_hand():
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.relational import table_profile

    t = pa.table(
        {
            "a": [1, 1, 2, None, 3],
            "b": ["x", "x", "x", "x", None],
            "c": [1.5, 1.5, None, None, 2.5],
        }
    )
    out = table_profile(
        rd.from_arrow(t).repartition(2), ["a", "b", "c"]
    ).to_pandas()
    assert list(out["column"]) == ["a", "b", "c"]  # name-ordered
    assert list(out["n"]) == [5, 5, 5]
    assert list(out["n_null"]) == [1, 1, 2]
    # NDV excludes NULLs (SQL count(DISTINCT) semantics)
    assert list(out["ndv"]) == [3, 1, 2]
    import pytest

    with pytest.raises(ValueError):
        table_profile(rd.from_arrow(t), [])


def test_vocab_coverage_hand_computed():
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.vocab import vocab_coverage

    docs = rd.from_arrow(pa.table({
        "text": pa.array(["a a a b b c", "a b z"], pa.string()),
    }))
    out = vocab_coverage(docs, "text", ns=(1, 2, 10)).to_pandas()
    # counts: a=4 b=3 c=1 z=1 -> total 9; top1=4, top2=7, top10=9
    assert list(out.n_vocab) == [1, 2, 10]
    assert list(out.covered_tokens) == [4, 7, 9]
    assert list(out.total_tokens) == [9, 9, 9]


def test_vocab_coverage_oracle_sf0001():
    import duckdb
    import pandas as pd
    import ray.data as rd

    from eschergraph_ray.functions.vocab import vocab_coverage

    sf = "/root/testdata/sf0.001"
    got = vocab_coverage(
        rd.read_parquet(f"{sf}/documents.parquet", columns=["text"]),
        "text", ns=(10, 100, 1000),
    ).to_pandas()
    want = duckdb.connect().execute(f"""
        WITH toks AS (
          SELECT unnest(regexp_extract_all(lower(text),
              '[A-Za-z]+(''[A-Za-z]+)?|\\d+|[^\\w\\s]')) AS token
          FROM read_parquet('{sf}/documents.parquet')
        ),
        counts AS (
          SELECT token, CAST(count(*) AS BIGINT) AS n
          FROM toks GROUP BY 1
        ),
        ranked AS (
          SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rn
          FROM counts
        )
        SELECT CAST(v.n_vocab AS BIGINT) AS n_vocab,
               (SELECT CAST(coalesce(sum(n), 0) AS BIGINT)
                FROM ranked WHERE rn <= v.n_vocab) AS covered_tokens,
               (SELECT CAST(sum(n) AS BIGINT) FROM counts)
                 AS total_tokens
        FROM (VALUES (10), (100), (1000)) AS v(n_vocab)
        ORDER BY 1
    """).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False,
    )


def test_phrase_search_hand_computed():
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.vocab import phrase_search

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "the Table  hash join",          # 1 hit (case/space fold)
            "table hash table hash",         # 2 hits
            "hash table",                    # reversed: no hit
        ], pa.string()),
    }))
    out = phrase_search(docs, "doc_id", "text",
                        "table hash").to_pandas()
    assert dict(zip(out.doc_id, out.n_occurrences)) == {1: 1, 2: 2}


def test_phrase_search_overlapping():
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.vocab import phrase_search

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["a a a"], pa.string()),
    }))
    out = phrase_search(docs, "doc_id", "text", "a a").to_pandas()
    # sliding-window semantics: positions 0-1 and 1-2 both count
    assert list(out.n_occurrences) == [2]


def test_rake_keywords_hand_case(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.vocab import rake_keywords

    # "deep learning" appears twice as a phrase; "of", ".", and the
    # digit break phrases; "systems" rides alone once.
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(["d1", "d2"], pa.string()),
        "text": pa.array([
            "Deep learning of deep learning.",
            "Learning systems 42",
        ], pa.string()),
    }))
    out = rake_keywords(docs, "doc_id", "text", k=10).to_pandas()
    rows = {r.phrase: (r.n_occurrences, r.score_micro)
            for r in out.itertuples()}
    # word stats: deep freq=2 deg=4 (two len-2 phrases) -> 2.0
    #             learning freq=3 deg=5 (2+2+1... d2 "learning
    #             systems" is len 2, so deg=2+2+2=6) -> 2.0
    # recompute: phrases: [deep learning] x2, [learning systems],
    # [systems]? no — "Learning systems" is one phrase len 2, "42"
    # breaks. deep: freq 2, deg 4 -> 2.0; learning: freq 3, deg 6
    # -> 2.0; systems: freq 1, deg 2 -> 2.0
    assert rows["deep learning"] == (2, 4_000_000)
    assert rows["learning systems"] == (1, 4_000_000)
    assert "of" not in rows and "42" not in rows


def test_rake_keywords_vocab_guard(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from eschergraph_ray.functions.vocab import rake_keywords

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(["d"], pa.string()),
        "text": pa.array(["alpha beta gamma"], pa.string()),
    }))
    with pytest.raises(ValueError, match="max_vocab_broadcast"):
        rake_keywords(docs, "doc_id", "text", max_vocab_broadcast=1)


def test_rake_keywords_sf0001_smoke(ray_session):
    import ray.data as rd

    from eschergraph_ray.functions.vocab import rake_keywords

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "text"])
    out = rake_keywords(docs, "doc_id", "text", k=5).to_pandas()
    assert len(out) == 5
    # descending score, deterministic tiebreak
    s = out["score_micro"].tolist()
    assert s == sorted(s, reverse=True)


def test_template_prefixes_hand_case(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.vocab import template_prefixes

    tpl = "dear valued customer your account needs urgent attention"
    docs = rd.from_arrow(pa.table({
        "source": pa.array(["s1", "s2", "s1", "s1"], pa.string()),
        "text": pa.array([
            tpl + " now",
            tpl + " today",
            "completely different opening text with enough tokens here",
            "short",  # < 8 tokens: no prefix
        ], pa.string()),
    }))
    out = template_prefixes(docs, "source", "text", k_tokens=8,
                            top_k=5).to_pandas()
    top = out.iloc[0]
    assert top["prefix"] == "dear valued customer your account needs urgent attention"
    assert (top["n_docs"], top["n_sources"]) == (2, 2)
    assert len(out) == 2  # the short doc contributed nothing


def test_bpe_first_merges_hand_case(ray_session):
    from eschergraph_ray.functions.vocab import bpe_first_merges

    # "aaa" x2 docs -> token 'aaa' n=2, pairs 'aa' twice per token
    # -> 4; "ab ab" -> token 'ab' n=2 -> 'ab': 2
    ds = rd.from_arrow(pa.table({
        "text": ["aaa", "aaa", "ab ab"],
    }))
    out = bpe_first_merges(ds, "text", k=5).to_pandas()
    rows = list(zip(out["pair"], out["n_pairs"]))
    assert rows == [("aa", 4), ("ab", 2)]


def test_hapax_docs_topk_planted(ray_session):
    from eschergraph_ray.functions.vocab import hapax_docs_topk

    # 'zzzqx' and 'qqqzx' each appear once (doc 3); 'common' repeats.
    # The synthetic driver corpus has a CLOSED vocabulary (no corpus
    # hapaxes at all), so this op ships as a library function with a
    # planted-hapax test instead of a registry query.
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["common words here", "common words here too",
                 "common zzzqx qqqzx"],
    }))
    out = hapax_docs_topk(ds, "doc_id", "text", k=5).to_pandas()
    rows = list(zip(out["doc_id"], out["hapax"]))
    # doc 3 carries both hapaxes; docs 1/2 carry one each
    # ('here'/'too'? 'here' appears twice, 'too' once in doc 2)
    assert rows[0] == (3, 2)
    assert (2, 1) in rows


def test_zipf_slope_hand_case(ray_session):
    from eschergraph_ray.functions.vocab import zipf_slope

    # freqs 4, 2, 1 at ranks 1, 2, 3: LS slope of ln-ln is ~ -1.234
    ds = rd.from_arrow(pa.table({
        "text": ["a a a a b b c"],
    }))
    out = zipf_slope(ds, "text", k=10).to_pandas().iloc[0]
    assert out["k"] == 3
    assert -1_240_000 < out["slope_micro"] < -1_228_000


def test_zipf_slope_degenerate_empty(ray_session):
    from eschergraph_ray.functions.vocab import zipf_slope

    ds = rd.from_arrow(pa.table({"text": ["solo"]}))
    assert zipf_slope(ds, "text").count() == 0
