"""Distributed BM25 keyword ranking over a document column.

The reference retrieves with embeddings only (quick/global search,
`eschergraph/graph/search/quick_search.py`); a large-scale
training-data pipeline also needs the classic lexical ranker — corpus
curation ("find documents about X"), hybrid retrieval, and quality
filtering all start with BM25. Ray-Data-first construction, two
streaming passes, zero driver-side text:

  pass 1 (corpus statistics): map_batches emits ONE partial row per
    batch — n_docs, sum of document lengths, per-term document
    frequency — and a distributed ``Dataset.sum`` reduces them to a
    handful of scalars. The shuffle moves #blocks tiny rows, never
    tokens (the same partial-aggregate shape as the dashboard top-k).

  pass 2 (scoring): the idf/avgdl scalars are broadcast in the UDF
    closure (bytes, not a join); each batch scores its own documents,
    then a global sort on (score desc, id) + limit(k) — the only
    all-to-all, over (id, score) pairs only.

Text is tokenized with the repo-wide token grammar
(functions/text.py:_TOKEN_RE) so a DuckDB oracle can replay scoring
exactly via regexp_extract_all + list_filter. Scores are rounded
(DuckDB round parity: half_towards_infinity) BEFORE the sort so the
tie-break on id is deterministic on both engines.

Okapi BM25 (Robertson/Sparck Jones, the standard smoothed form):

  idf(t)     = ln((N - df_t + 0.5) / (df_t + 0.5) + 1)   (>= 0 always)
  score(D,Q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

Scale notes: two passes re-read the text rather than materializing a
tf matrix — at 100 TB the re-read streams from storage while a
materialized intermediate would not fit; per-doc tokenization is
per-row-bounded and embarrassingly parallel. |terms| is a query-side
constant (not data-sized).
"""

from __future__ import annotations

import math

import pyarrow as pa


def bm25_topk(
    ds,
    id_col: str,
    text_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
):
    """Top-``k`` documents by BM25 over ``terms`` (already-normalized
    lowercase tokens of the repo token grammar). Returns a Dataset of
    ``(id_col, score)``, score rounded to ``round_to`` decimals,
    ordered by (score desc, id asc); only score > 0 rows qualify."""
    nt = len(terms)
    if nt == 0:
        raise ValueError("terms must be non-empty")

    def doc_tfs(batch: pa.Table):
        """Per-doc (dl, tf per term) — one findall per document, the
        Counter lookup makes per-term cost O(1) after it."""
        from collections import Counter

        from .text import _TOKEN_RE

        dls, tfs = [], [[] for _ in range(nt)]
        for txt in batch[text_col].to_pylist():
            toks = _TOKEN_RE.findall((txt or "").lower())
            c = Counter(toks)
            dls.append(len(toks))
            for j, t in enumerate(terms):
                tfs[j].append(c.get(t, 0))
        return dls, tfs

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        dls, tfs = doc_tfs(batch)
        row = {
            "n_docs": [len(dls)],
            "sum_dl": [int(sum(dls))],
        }
        for j in range(nt):
            row[f"df_{j}"] = [int(sum(1 for v in tfs[j] if v > 0))]
        return pa.table(row)

    stat_cols = ["n_docs", "sum_dl"] + [f"df_{j}" for j in range(nt)]
    sums = ds.map_batches(partial, batch_format="pyarrow").sum(stat_cols)
    n = sums["sum(n_docs)"]
    avgdl = sums["sum(sum_dl)"] / n
    idfs = [
        math.log((n - sums[f"sum(df_{j})"] + 0.5) / (sums[f"sum(df_{j})"] + 0.5) + 1.0)
        for j in range(nt)
    ]

    def score(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        dls, tfs = doc_tfs(batch)
        dl = np.asarray(dls, np.float64)
        s = np.zeros(len(dl), np.float64)
        # expression shape mirrors the SQL oracle TERM FOR TERM (same
        # left-associative double arithmetic -> bit-identical scores);
        # tf == 0 contributes exactly 0.0 (0 / positive), no guard needed
        norm = k1 * (1.0 - b + b * dl / avgdl)
        for j in range(nt):
            tf = np.asarray(tfs[j], np.float64)
            s += idfs[j] * tf * (k1 + 1.0) / (tf + norm)
        out = pa.table(
            {
                id_col: batch[id_col],
                "score": pc.round(
                    pa.array(s, pa.float64()),
                    ndigits=round_to,
                    round_mode="half_towards_infinity",
                ),
            }
        )
        return out.filter(pc.greater(out["score"], 0.0))

    scored = ds.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score", id_col], descending=[True, False]).limit(k)


def rrf_fuse(ranked_lists: dict[str, list], k0: int = 60) -> pa.Table:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    of named top-k id lists: score(d) = sum over lists of
    1/(k0 + rank_list(d)), ranks 1-based, absent = contributes nothing
    (rank column 0). The inputs are driver-resident top-k lists — the
    provably-small outputs of the upstream rankers — so fusion is pure
    model-state arithmetic, no distributed stage needed at ANY corpus
    size (list length is k, not N).

    Float parity with the SQL replay: per-list terms are single
    divisions added in sorted-list-name order, the fused score is
    quantized once with round-half-towards-infinity to nano units.
    Returns (doc_id, r_<name>..., rrf_nano) sorted (rrf_nano desc,
    doc_id)."""
    import pyarrow.compute as pc

    names = sorted(ranked_lists)
    rank_of = {
        name: {d: i + 1 for i, d in enumerate(ids)}
        for name, ids in ranked_lists.items()
    }
    union = sorted({d for ids in ranked_lists.values() for d in ids})
    scores, cols = [], {n: [] for n in names}
    for d in union:
        s = 0.0
        for n in names:  # fixed addition order: sorted list names
            r = rank_of[n].get(d, 0)
            cols[n].append(r)
            if r:
                s = s + 1.0 / (k0 + r)
        scores.append(s * 1e9)
    nano = pc.round(
        pa.array(scores, pa.float64()), ndigits=0,
        round_mode="half_towards_infinity",
    ).cast(pa.int64())
    tbl = pa.table(
        {
            "doc_id": pa.array(union),
            **{f"r_{n}": pa.array(cols[n], pa.int64()) for n in names},
            "rrf_nano": nano,
        }
    )
    return tbl.sort_by([("rrf_nano", "descending"), ("doc_id", "ascending")])
