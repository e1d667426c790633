"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set.

Standard practice for training-data curation (GPT-3 appendix C /
Gopher section A.3 style): any training document containing a long-ish
n-gram that also appears in an evaluation benchmark is "contaminated"
and must be dropped or audited — otherwise eval scores are inflated by
memorization. The reference has no analogue (it builds KGs from a
trusted corpus); at 100 TB this is a first-class pipeline stage.

Ray-Data-first shape (broadcast semi-join, no all-to-all):

  benchmark side: ``map_batches`` emits the per-document DISTINCT
    n-grams (word shingles, lowercase whitespace-split — the same gram
    device as ``dedup.ngram_jaccard_pairs`` so the DuckDB oracle can
    replay it verbatim), a ``unique()`` dedupes globally, and the
    resulting gram set is ``ray.put`` ONCE into the object store.
    Benchmarks are small by definition (MBs, not TBs) — the broadcast
    set is bounded by benchmark size, never corpus size. ``max_grams``
    makes that contract loud instead of silently OOMing.

  corpus side: a single streaming ``map_batches`` pass reads the
    broadcast set (``ray.get`` per task — Ray caches the object
    per-node, zero re-ship per batch) and counts, per document, how
    many of its DISTINCT grams hit the benchmark set. No shuffle at
    all: the corpus is touched exactly once, embarrassingly parallel.

Output: one row per contaminated document — ``(id_col, n_hits)`` with
``n_hits`` = number of distinct benchmark grams found (int64). Clean
documents emit nothing (at 100 TB almost everything is clean; emitting
only hits keeps the result tiny). Dropping the flagged docs is then a
broadcast anti-join (`hash_sample`-style filter) or a plain
``Dataset.filter``.
"""

from __future__ import annotations

import pyarrow as pa


def _doc_grams(text: str, n: int) -> set[str]:
    """Distinct lowercase word ``n``-grams of one document — identical
    to the SQL replay: whitespace-split (empties dropped), windows of
    ``n`` consecutive words joined by single spaces."""
    ws = (text or "").lower().split()
    if len(ws) < n:
        return set()
    return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}


def collect_benchmark_grams(
    bench_ds,
    text_col: str,
    n: int = 5,
    max_grams: int = 50_000_000,
):
    """Distinct n-grams of the benchmark set as a broadcast object ref.

    Returns ``(object_ref, n_grams)`` where the ref holds a frozenset
    of gram strings. The driver-side materialization is bounded by the
    BENCHMARK's size (the contract of decontamination — eval sets are
    tiny next to the corpus); ``max_grams`` turns a misuse (pointing
    this at a 100-TB "benchmark") into a loud error instead of an OOM.
    """
    import ray

    def explode(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        grams: set[str] = set()
        for txt in batch[text_col].to_pylist():
            grams.update(_doc_grams(txt, n))
        return pa.table({"gram": pa.array(sorted(grams), pa.string())})

    # per-batch distinct (combiner) -> global distinct; unique()
    # materializes on the driver, bounded by benchmark size.
    distinct = bench_ds.map_batches(explode, batch_format="pyarrow").unique("gram")
    if len(distinct) > max_grams:
        raise ValueError(
            f"benchmark produced {len(distinct)} grams > max_grams={max_grams}; "
            "decontamination broadcasts the benchmark gram set — use a "
            "smaller benchmark or raise max_grams explicitly"
        )
    return ray.put(frozenset(distinct)), len(distinct)


def decontaminate(
    corpus_ds,
    bench_ds,
    id_col: str,
    text_col: str,
    n: int = 5,
    max_grams: int = 50_000_000,
):
    """Flag corpus documents sharing any word ``n``-gram with
    ``bench_ds``. Returns a Dataset of ``(id_col, n_hits)`` —
    contaminated documents only, ``n_hits`` = distinct shared grams.

    The caller decides what "corpus" means (typically: all documents
    minus the benchmark split itself)."""
    import ray

    gram_ref, n_bench = collect_benchmark_grams(
        bench_ds, text_col, n=n, max_grams=max_grams
    )

    def flag(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        bench_grams = ray.get(gram_ref)  # node-cached, not re-shipped
        ids, hits = [], []
        id_arr = batch[id_col].to_pylist()
        for i, txt in enumerate(batch[text_col].to_pylist()):
            k = len(_doc_grams(txt, n) & bench_grams)
            if k:
                ids.append(id_arr[i])
                hits.append(k)
        return pa.table(
            {
                id_col: pa.array(ids, batch.schema.field(id_col).type),
                "n_hits": pa.array(hits, pa.int64()),
            }
        )

    return corpus_ds.map_batches(flag, batch_format="pyarrow")


def _gram_hash(gram: str) -> int:
    """blake2b-8 of the gram string, >> 1 to stay positive int64 —
    the df shuffle and hot-set broadcast move 8-byte ints instead of
    ~n*6-byte strings. Hash equality stands in for gram equality
    (collision odds ~V²/2⁶⁵ — the same device as the minhash band
    hash)."""
    import hashlib

    return (
        int.from_bytes(
            hashlib.blake2b(gram.encode(), digest_size=8).digest(), "big"
        )
        >> 1
    )


def repeated_gram_table(ds, id_col: str, text_col: str, n: int = 5,
                        max_df: int = 1):
    """(gram_hash, df) Dataset of word n-grams appearing in MORE than
    ``max_df`` distinct documents — the cross-document repetition
    model. Built skew-proof: per-batch Counters over each document's
    DISTINCT gram hashes (a combiner — a boilerplate gram repeated in
    every doc of a batch costs one row in the exchange), then a
    vocabulary-sized ``groupby.sum`` over int64 keys."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        c: "Counter[int]" = Counter()
        for txt in batch[text_col].to_pylist():
            c.update(_gram_hash(g) for g in _doc_grams(txt, n))
        return pa.table(
            {
                "gram_hash": pa.array(list(c.keys()), pa.int64()),
                "df": pa.array(list(c.values()), pa.int64()),
            }
        )

    df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("gram_hash")
        .aggregate(Sum("df", alias_name="df"))
    )
    return df.map_batches(
        lambda b: b.filter(pc.greater(b["df"], max_df)),
        batch_format="pyarrow",
    )


def mask_repeated_spans(
    ds,
    id_col: str,
    text_col: str,
    n: int = 5,
    max_df: int = 1,
    max_hot_broadcast: int = 50_000_000,
):
    """Exact-substring (span) deduplication, Lee et al. 2022 style:
    every word position covered by an ``n``-gram that appears in more
    than ``max_df`` distinct documents is masked out. Returns one row
    per non-empty document — ``(id_col, n_words, n_masked,
    text_clean)`` with ``text_clean`` the surviving words joined by
    single spaces (NULL when every word was masked; the normalization
    contract is lowercase + whitespace-collapse, same as
    :func:`_doc_grams`).

    Shape: the hot-gram set (pass 1, :func:`repeated_gram_table`) is
    by construction the corpus's REPEATED content — orders of
    magnitude smaller than the corpus; it is collected once (bounded
    by ``max_hot_broadcast``, loud failure — the paper's suffix-array
    formulation is the escape hatch when repeated content itself is
    huge) and ``ray.put`` broadcast; pass 2 masks every document in a
    single streaming ``map_batches`` with local window probes. The
    corpus text is never shuffled."""
    import ray

    # pinned: both the count (guard) and the collect consume it — an
    # unmaterialized dataset would re-run the corpus df pass twice
    hot_ds = repeated_gram_table(
        ds, id_col, text_col, n=n, max_df=max_df
    ).materialize()
    n_hot = hot_ds.count()
    if n_hot > max_hot_broadcast:
        raise ValueError(
            f"{n_hot} repeated grams exceed max_hot_broadcast="
            f"{max_hot_broadcast}; this corpus's repeated content is too "
            "large for the broadcast path — shard the hot set or use a "
            "suffix-array pass"
        )
    import numpy as np

    hot = (
        np.sort(hot_ds.to_pandas()["gram_hash"].to_numpy(np.int64))
        if n_hot
        else np.empty(0, np.int64)
    )
    hot_ref = ray.put(hot)

    def mask(batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        hot_arr = ray.get(hot_ref)  # node-cached
        ids, n_words, n_masked, cleaned = [], [], [], []
        id_arr = batch[id_col].to_pylist()
        for i, txt in enumerate(batch[text_col].to_pylist()):
            ws = (txt or "").lower().split()
            if not ws:
                continue  # SQL replay has no rows for empty docs
            cover = np.zeros(len(ws), bool)
            n_win = len(ws) - n + 1
            if n_win > 0 and len(hot_arr):
                wh = np.fromiter(
                    (
                        _gram_hash(" ".join(ws[s : s + n]))
                        for s in range(n_win)
                    ),
                    np.int64,
                    count=n_win,
                )
                pos = np.searchsorted(hot_arr, wh)
                hit = (pos < len(hot_arr)) & (
                    hot_arr[np.minimum(pos, len(hot_arr) - 1)] == wh
                )
                for s in np.flatnonzero(hit):
                    cover[s : s + n] = True
            kept = [w for w, c in zip(ws, cover) if not c]
            ids.append(id_arr[i])
            n_words.append(len(ws))
            n_masked.append(int(cover.sum()))
            cleaned.append(" ".join(kept) if kept else None)
        return pa.table(
            {
                id_col: pa.array(ids, batch.schema.field(id_col).type),
                "n_words": pa.array(n_words, pa.int64()),
                "n_masked": pa.array(n_masked, pa.int64()),
                "text_clean": pa.array(cleaned, pa.string()),
            }
        )

    return ds.map_batches(mask, batch_format="pyarrow")


def source_overlap_matrix(docs_ds, text_col: str, source_col: str,
                          shingle_k: int = 3):
    """Cross-source contamination matrix: for every (unordered) pair
    of sources, how many DISTINCT word-``shingle_k``-gram shingles
    they share — the corpus-level leakage diagnostic run before
    trusting a source split as an held-out set (the pairwise
    generalization of :func:`decontaminate`, which needs a designated
    benchmark side). Diagonal rows carry each source's own distinct
    shingle count. Returns ``(src_a, src_b, n_shared)`` with
    ``src_a <= src_b``, ordered by the pair.

    Shape: per-batch DISTINCT (shingle, source) combiner partials →
    one global distinct groupby → a self hash-join on the shingle
    hash whose fan-out is bounded by the SOURCE count per side (a
    shingle appears at most once per source after the distinct — no
    hot-key quadratic possible) → per-batch pair-count partials
    (≤ S² rows per batch) → a pair-cardinality-sized groupby.

    Parity: shingles hash with the md5 word-gram device
    (``dedup._word_shingles`` == DuckDB ``md5_number_lower``), so the
    SQL replay recomputes the same sets from raw text; counts are
    exact int64.
    """
    from .dedup import _word_shingles
    from .graph_metrics import _clamp_partitions

    P = _clamp_partitions(8)

    def explode(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        xs, srcs = [], []
        texts = batch[text_col].to_pylist()
        sources = batch[source_col].to_pylist()
        for t, s in zip(texts, sources):
            if s is None:
                continue
            for h in _word_shingles(t or "", shingle_k):
                # low 63 bits: Ray's shuffle block builders reject
                # uint64 values past int64 range; the SQL replay masks
                # identically (HUGEINT % 2^63) so sets stay equal
                xs.append(h & 0x7FFFFFFFFFFFFFFF)
                srcs.append(s)
        t = pa.table(
            {
                "x": pa.array(xs, pa.int64()),
                "src": pa.array(srcs, pa.string()),
            }
        )
        # per-batch distinct combiner: repeated grams within a batch
        # never reach the exchange
        return (
            t.group_by(["x", "src"])
            .aggregate([([], "count_all")])
            .select(["x", "src"])
        )

    distinct = (
        docs_ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["x", "src"])
        .count()
        .map_batches(lambda b: b.select(["x", "src"]),
                     batch_format="pyarrow")
        .repartition(P)
        .materialize()
    )
    if distinct.count() == 0:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "src_a": pa.array([], pa.string()),
                    "src_b": pa.array([], pa.string()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
        )
    left = distinct.map_batches(
        lambda b: b.rename_columns(["x", "src_a"]), batch_format="pyarrow"
    )
    right = distinct.map_batches(
        lambda b: b.rename_columns(["x", "src_b"]), batch_format="pyarrow"
    )

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def pair_partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = batch.filter(
            pc.less_equal(batch["src_a"], batch["src_b"])
        ).select(["src_a", "src_b"])
        return (
            t.group_by(["src_a", "src_b"])
            .aggregate([([], "count_all")])
            .rename_columns(["src_a", "src_b", "n_part"])
        )

    return (
        left.join(right, join_type="inner", num_partitions=P, on=("x",))
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["src_a", "src_b"])
        .aggregate(Sum("n_part", alias_name="n_shared"))
        .map_batches(
            lambda b: pa.table(
                {
                    "src_a": b["src_a"],
                    "src_b": b["src_b"],
                    "n_shared": pc.cast(b["n_shared"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["src_a", "src_b"])
    )
