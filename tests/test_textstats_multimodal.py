"""Text analysis + multimodal plumbing tests."""

import pyarrow as pa
import pytest
import ray.data as rd

from eschergraph_ray.functions.multimodal import (
    MediaFeatureActor,
    extract_media_features,
    synthetic_media_table,
)
from eschergraph_ray.functions.textstats import (
    detect_language,
    fingerprint_docs,
    lang_id,
    quality_counts,
    winnow_fingerprints,
)


def test_quality_counts_exact():
    ds = rd.from_arrow(pa.table({"doc_id": [1], "text": ["The cat, and a dog!"]}))
    out = quality_counts(ds, "doc_id", "text").to_pandas().iloc[0]
    assert out["n_chars"] == 19
    assert out["n_alpha"] == 13  # Thecatandadog
    assert out["n_punct"] == 2  # , !
    assert out["n_words"] == 5
    assert out["n_stopwords"] == 3  # the, and, a


def test_detect_language_samples():
    assert detect_language("the cat is on the mat and it is happy") == "en"
    assert detect_language("der hund ist nicht mit der katze") == "de"
    assert detect_language("el perro es que la casa de un gato") == "es"
    assert detect_language("xyzzy plugh") == "und"


def test_lang_id_dataset():
    ds = rd.from_arrow(
        pa.table({"doc_id": [1, 2], "text": ["the dog is here and it is fine", "der hund ist nicht da und"]})
    )
    out = lang_id(ds, "doc_id", "text").to_pandas()
    assert out.sort_values("doc_id")["lang_pred"].tolist() == ["en", "de"]


def test_winnowing_properties():
    fp1 = winnow_fingerprints("abcdefghijklmnop")
    fp2 = winnow_fingerprints("abcdefghijklmnop")
    assert fp1 == fp2 and len(fp1) > 0
    # containment: substring shares most fingerprints
    big = winnow_fingerprints("XXXX abcdefghijklmnop YYYY")
    assert len(set(fp1) & set(big)) > 0
    assert winnow_fingerprints("ab") == []


def test_fingerprint_docs_columns():
    ds = rd.from_arrow(pa.table({"doc_id": [1, 2], "text": ["hello world document", ""]}))
    out = fingerprint_docs(ds, "doc_id", "text").to_pandas().set_index("doc_id")
    assert out.loc[1, "n_fingerprints"] > 0
    assert out.loc[2, "n_fingerprints"] == 0


def test_media_feature_plumbing():
    tbl = synthetic_media_table(12)
    out = extract_media_features(rd.from_arrow(tbl), concurrency=2).to_pandas()
    assert len(out) == 12
    assert "payload" not in out.columns  # blobs not carried forward
    assert all(len(f) == 32 for f in out["features"])
    # deterministic
    out2 = extract_media_features(rd.from_arrow(tbl), concurrency=2).to_pandas()
    a = sorted(map(tuple, out["features"].map(tuple).items()))
    b = sorted(map(tuple, out2["features"].map(tuple).items()))
    assert a == b


def test_media_strict_raises():
    actor = MediaFeatureActor(strict=True)
    with pytest.raises(NotImplementedError):
        actor(synthetic_media_table(2))


def test_fingerprint_near_pairs_detects_copy():
    """A document sharing a long run of text with another produces a
    high-overlap fingerprint pair; unrelated docs don't pair."""
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.textstats import fingerprint_near_pairs

    base = (
        "the scheduler assigns work to executors in waves while the "
        "object store spills cold blocks to disk under memory pressure "
        "and lineage tracks every transformation for recovery"
    )
    copied = base + " with a short appended remark at the end"
    other = (
        "gardening in midsummer requires regular watering of tomato "
        "plants and careful pruning of lower leaves to avoid blight "
        "spreading upward through the foliage canopy"
    )
    docs = rd.from_arrow(
        pa.table({"doc_id": [1, 2, 3], "text": [base, copied, other]})
    )
    out = fingerprint_near_pairs(docs, "doc_id", "text").to_pandas()
    pairs = set(map(tuple, out[["id_a", "id_b"]].values))
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
    row = out[(out.id_a == 1) & (out.id_b == 2)].iloc[0]
    assert row["overlap"] >= 0.8


def test_fingerprint_near_pairs_empty_when_no_overlap():
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.textstats import fingerprint_near_pairs

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": [
                    "completely unrelated first document about compilers",
                    "second text concerning marine biology and tides",
                ],
            }
        )
    )
    out = fingerprint_near_pairs(docs, "doc_id", "text").to_pandas()
    assert len(out) == 0


def test_encode_image_b64_reference_parity():
    # F6 (openai.py:264-271): plain b64, None passthrough on missing
    import base64

    from eschergraph_ray.functions.multimodal import encode_image_b64

    assert encode_image_b64(b"\x00\x01pixels") == base64.b64encode(
        b"\x00\x01pixels"
    ).decode("utf-8")
    assert encode_image_b64(None) is None


def test_encode_media_data_urls_stage(ray_session):
    from eschergraph_ray.functions.multimodal import (
        encode_image_b64,
        encode_media_data_urls,
        synthetic_media_table,
    )

    tbl = synthetic_media_table(6)
    out = encode_media_data_urls(rd.from_arrow(tbl)).take_all()
    by_id = {r["media_id"]: r for r in out}
    assert len(by_id) == 6
    for mid, mtype, payload in zip(
        tbl["media_id"].to_pylist(),
        tbl["media_type"].to_pylist(),
        tbl["payload"].to_pylist(),
    ):
        r = by_id[mid]
        assert "payload" not in r  # blobs never travel past the encoder
        assert r["data_url"] == f"data:{mtype};base64,{encode_image_b64(payload)}"


def test_generate_markdown_table_golden():
    # F7 (_generate_markdown_table, multi_modal_parser.py:196-230):
    # header row, --- separator, dense grid with "" for absent cells
    from eschergraph_ray.functions.multimodal import generate_markdown_table

    cells = [
        {"row_index": 0, "column_index": 0, "content": "name"},
        {"row_index": 0, "column_index": 1, "content": "qty"},
        {"row_index": 1, "column_index": 0, "content": "bolt"},
        # (1,1) absent on purpose -> renders as ""
        {"row_index": 2, "column_index": 1, "content": "7"},
    ]
    got = generate_markdown_table(3, 2, cells)
    assert got == (
        "| name | qty |\n"
        "| --- | --- |\n"
        "| bolt |  |\n"
        "|  | 7 |\n"
    )


def test_render_table_elements_stage(ray_session):
    from eschergraph_ray.functions.multimodal import (
        generate_markdown_table,
        render_table_elements,
        synthetic_table_specs,
    )

    specs = synthetic_table_specs(10)
    out = render_table_elements(rd.from_arrow(specs)).take_all()
    by_id = {r["spec_id"]: r["content"] for r in out}
    for row in specs.to_pylist():
        expected = f"{row['caption']}\n" + generate_markdown_table(
            row["row_count"], row["column_count"], row["cells"] or []
        )
        assert by_id[row["spec_id"]] == expected


def test_token_entropy_hand_values(ray_session):
    import math

    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.textstats import token_entropy

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["a b a", "zzz zzz zzz", "", "Mixed CASE mixed"]
            ),
        }
    )
    out = (
        token_entropy(rd.from_arrow(tbl), "doc_id", "text")
        .sort("doc_id")
        .to_pandas()
        .set_index("doc_id")
    )
    # doc 3 (no tokens) is dropped, mirroring the SQL unnest path
    assert list(out.index) == [1, 2, 4]
    # "a b a": counts {a:2, b:1} -> S = round(2*log2(2)*1e6) = 2_000_000
    assert out.loc[1, "n_tokens"] == 3 and out.loc[1, "n_distinct"] == 2
    assert out.loc[1, "s_micro"] == 2_000_000
    h = (math.log2(3) - 2_000_000 / 1e6 / 3) * 1e6
    assert out.loc[1, "h_micro"] == math.floor(h + 0.5)
    # constant doc: entropy exactly 0
    assert out.loc[2, "h_micro"] == 0 and out.loc[2, "n_distinct"] == 1
    # case-folding: "mixed" counted twice
    assert out.loc[4, "n_tokens"] == 3 and out.loc[4, "n_distinct"] == 2


def test_gini_concentration_hand(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.textstats import gini_concentration

    # perfect equality -> 0
    eq = pa.table({"k": [1, 2, 3, 4], "v": [0] * 4})
    out = gini_concentration(rd.from_arrow(eq), "k").to_pylist()[0]
    assert out == {"n_keys": 4, "total": 4, "gini_micro": 0}
    # skew: counts (1, 1, 6) sorted asc -> S = 1+2+18 = 21,
    # gini = (42 - 4*8) / (3*8) = 10/24
    sk = pa.table({"k": ["a", "b"] + ["c"] * 6})
    out = gini_concentration(
        rd.from_arrow(sk).repartition(3), "k"
    ).to_pylist()[0]
    assert out["n_keys"] == 3 and out["total"] == 8
    assert out["gini_micro"] == round(1e6 * 10 / 24)


# ---------- sample_video_frames ----------


def test_frame_sampling_hand(ray_session):
    import base64
    import hashlib

    from eschergraph_ray.functions.multimodal import (
        sample_video_frames,
        synthetic_media_table,
    )

    tbl = synthetic_media_table(9)  # ids m0000..m0008, video at i%3==2
    out = sample_video_frames(
        rd.from_arrow(tbl), every_ms=250
    ).to_pandas().sort_values(["media_id", "ts_ms"]).reset_index(drop=True)
    # only the 3 video rows fan out; duration 1000+i -> ceil(d/250)
    vids = {r["media_id"]: r for r in tbl.to_pylist()
            if r["media_type"].startswith("video/")}
    assert set(out["media_id"]) == set(vids)
    for mid, r in vids.items():
        sub = out[out["media_id"] == mid]
        ticks = list(range(0, r["duration_ms"], 250))
        assert list(sub["ts_ms"]) == ticks
        assert list(sub["frame_idx"]) == list(range(len(ticks)))
        b64 = base64.b64encode(r["payload"]).decode()
        want = [hashlib.md5(f"{b64}:{t}".encode()).hexdigest()
                for t in ticks]
        assert list(sub["frame_md5"]) == want


def test_frame_sampling_strict_and_validation(ray_session):
    import pytest

    from eschergraph_ray.functions.multimodal import (
        FrameSampleActor,
        sample_video_frames,
        synthetic_media_table,
    )

    with pytest.raises(ValueError, match="positive"):
        FrameSampleActor(every_ms=0)
    ds = sample_video_frames(
        rd.from_arrow(synthetic_media_table(3)), strict=True
    )
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        ds.count()


# ---------- resize_images ----------


def test_resize_hand_dims(ray_session):
    import base64
    import hashlib

    from eschergraph_ray.functions.multimodal import (
        MEDIA_SCHEMA, resize_images,
    )

    rows = [
        # (id, type, w, h) -> expected (nw, nh) at max_dim=32
        ("a", "image/png", 64, 64, 32, 32),
        ("b", "image/png", 100, 50, 32, 16),   # wide
        ("c", "image/png", 10, 100, 3, 32),    # tall, floor to 3
        ("d", "image/png", 20, 20, 20, 20),    # under bound: untouched
        ("e", "image/png", 1000, 7, 32, 1),    # extreme ratio -> min 1
        ("f", "video/mp4", 64, 64, -1, -1),    # non-image: dropped
    ]
    tbl = pa.Table.from_pydict(
        {
            "media_id": [r[0] for r in rows],
            "media_type": [r[1] for r in rows],
            "payload": [f"blob-{r[0]}".encode() for r in rows],
            "width": [r[2] for r in rows],
            "height": [r[3] for r in rows],
            "duration_ms": [0] * len(rows),
        },
        schema=MEDIA_SCHEMA,
    )
    out = resize_images(
        rd.from_arrow(tbl), max_dim=32
    ).to_pandas().sort_values("media_id").reset_index(drop=True)
    got = {
        r.media_id: (r.new_width, r.new_height, r.resized_md5)
        for r in out.itertuples()
    }
    assert set(got) == {"a", "b", "c", "d", "e"}
    for mid, _, w, h, nw, nh in rows:
        if mid not in got:
            continue
        b64 = base64.b64encode(f"blob-{mid}".encode()).decode()
        want_md5 = hashlib.md5(f"{b64}:{nw}x{nh}".encode()).hexdigest()
        assert got[mid] == (nw, nh, want_md5), mid


def test_resize_strict_and_validation(ray_session):
    import pytest

    from eschergraph_ray.functions.multimodal import (
        ImageResizeActor, resize_images, synthetic_media_table,
    )

    with pytest.raises(ValueError, match="positive"):
        ImageResizeActor(max_dim=0)
    ds = resize_images(
        rd.from_arrow(synthetic_media_table(3)), strict=True
    )
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        ds.count()


def test_media_ahash_pairs_finds_planted_dups(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from eschergraph_ray.functions.multimodal import (
        media_ahash_pairs,
        synthetic_media_table,
    )

    base = synthetic_media_table(12)
    dup = base.slice(0, 3)
    dup = dup.set_column(
        0, "media_id",
        pa.array([f"m{12 + i:04d}" for i in range(3)], pa.string()),
    )
    corpus = pa.concat_tables([base, dup]).combine_chunks()
    out = media_ahash_pairs(rd.from_arrow(corpus),
                            threshold=0).to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))
    assert got == {("m0000", "m0012"), ("m0001", "m0013"),
                   ("m0002", "m0014")}
    assert (out["hamming"] == 0).all()


def test_media_ahash_threshold_guard(ray_session):
    import pytest
    import ray.data as rd

    from eschergraph_ray.functions.multimodal import (
        media_ahash_pairs,
        synthetic_media_table,
    )

    ds = rd.from_arrow(synthetic_media_table(4))
    with pytest.raises(ValueError, match="pigeonhole|bands"):
        media_ahash_pairs(ds, threshold=4)


def test_readability_by_source_hand_computed():
    from eschergraph_ray.functions.textstats import readability_by_source

    ds = rd.from_arrow(pa.table({
        "source": ["a", "a", "b", None],
        "text": ["hello world", "elephantine cat", "i", "skip"],
    }))
    out = readability_by_source(ds, "source", "text").to_pandas()
    a = out[out["source"] == "a"].iloc[0]
    # words: hello world elephantine cat = 4; vowel runs:
    # e,o | o | e,e,a,i,e | a = 9; alpha chars 10 + 14; long: 1
    assert (a["n_docs"], a["words"], a["syllables"],
            a["alpha_chars"], a["long_words"]) == (2, 4, 9, 24, 1)
    assert a["spw_micro"] == 2_250_000
    assert a["awl_micro"] == 6_000_000
    assert a["long_ratio_micro"] == 250_000
    b = out[out["source"] == "b"].iloc[0]
    assert (b["words"], b["syllables"], b["long_words"]) == (1, 1, 0)
    assert len(out) == 2  # null source dropped


def test_hapax_by_source_hand_computed():
    from eschergraph_ray.functions.vocab import hapax_by_source

    ds = rd.from_arrow(pa.table({
        "source": ["a", "b"],
        "text": ["x x y", "Y z"],
    }))
    out = hapax_by_source(ds, "source", "text").to_pandas()
    rows = {r.source: (r.vocab, r.hapax, r.hapax_rate_micro)
            for r in out.itertuples()}
    # lowercased totals: x=2, y=2, z=1 -> hapax {z} in b
    assert rows == {"a": (2, 0, 0), "b": (2, 1, 500_000)}


def test_user_concentration_hhi_hand_computed():
    from eschergraph_ray.functions.stats import user_concentration_hhi

    ds = rd.from_arrow(pa.table({
        "event_type": ["A", "A", "A", "A", "B"],
        "user_id": pa.array([1, 1, 1, 2, 1], pa.int64()),
    }))
    out = user_concentration_hhi(ds, "event_type", "user_id").to_pandas()
    rows = {r.group: (r.n_users, r.total, r.hhi_micro)
            for r in out.itertuples()}
    # A: counts 3,1 -> (9+1)/16 = 0.625
    assert rows == {"A": (2, 4, 625_000), "B": (1, 1, 1_000_000)}
