"""Term-partitioned inverted index + indexed BM25 — the IO-pruning
scale path past ``ranking.bm25_topk``'s two full corpus scans.

``bm25_topk`` re-reads every document per query; right for one-off
curation queries, wrong for a query workload. This module materializes
the classic posting-list layout as hive-partitioned parquet:

  index_dir/term_bucket={h}/...parquet   rows: (token, id, tf, dl)
  index_dir/_stats.parquet               one row: (n_docs, sum_dl)

with ``h = blake2(token) % num_buckets`` — a query reads ONLY its
terms' bucket directories (storage never ships non-probed buckets,
same layout contract as ``similarity.build_lsh_partitioned_index``)
and pushes ``token IN terms`` down into the parquet scan, so the data
read per query is the query terms' postings, not the corpus.

Scoring is BIT-IDENTICAL to the scan path: per-term document
frequencies are recovered by counting the probed postings (a posting
exists iff tf > 0), the per-document term vector is rebuilt with a
partial-pivot + ``groupby(id).sum`` (integer tf columns — exact), and
the final score sums terms in QUERY ORDER with the same
left-associative double arithmetic as ``bm25_topk`` — which is why the
indexed query shares the scan query's DuckDB oracle verbatim.

Reference analogue: none (the reference searches embeddings only);
this is the lexical half of a hybrid retrieval stack at corpus scale.
"""

from __future__ import annotations

import hashlib
import math
import os

import pyarrow as pa


def _token_bucket(token: str, num_buckets: int) -> int:
    """Deterministic term partition (blake2, not Python hash — stable
    across processes, runs and cluster sizes)."""
    return (
        int.from_bytes(
            hashlib.blake2b(token.encode(), digest_size=4).digest(), "big"
        )
        % num_buckets
    )


def build_inverted_index(
    ds,
    index_dir: str,
    id_col: str,
    text_col: str,
    num_buckets: int = 64,
) -> str:
    """Materialize the posting-list layout. One streaming pass: every
    batch explodes its documents into (token, id, tf, dl, term_bucket)
    rows — tf/dl exact int64 — and the partitioned write groups them
    by term bucket. A second tiny pass reduces (n_docs, sum_dl) to the
    one-row stats sidecar the BM25 formula needs."""

    def explode(batch: pa.Table) -> pa.Table:
        from collections import Counter

        from ..stages.chunking import pin_arrow_threads
        from .text import _TOKEN_RE

        pin_arrow_threads()
        toks_out, ids_out, tf_out, dl_out, bk_out = [], [], [], [], []
        ids = batch[id_col].to_pylist()
        for i, txt in enumerate(batch[text_col].to_pylist()):
            toks = _TOKEN_RE.findall((txt or "").lower())
            dl = len(toks)
            for t, n in Counter(toks).items():
                toks_out.append(t)
                ids_out.append(ids[i])
                tf_out.append(n)
                dl_out.append(dl)
                bk_out.append(_token_bucket(t, num_buckets))
        return pa.table(
            {
                "token": pa.array(toks_out, pa.string()),
                id_col: pa.array(ids_out, batch.schema.field(id_col).type),
                "tf": pa.array(tf_out, pa.int64()),
                "dl": pa.array(dl_out, pa.int64()),
                "term_bucket": pa.array(bk_out, pa.int64()),
            }
        ).combine_chunks()  # one row group per file, not per chunk

    ds.map_batches(explode, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["term_bucket"]
    )

    def stat_partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads
        from .text import _TOKEN_RE

        pin_arrow_threads()
        dls = [
            len(_TOKEN_RE.findall((t or "").lower()))
            for t in batch[text_col].to_pylist()
        ]
        return pa.table(
            {"n_docs": [len(dls)], "sum_dl": [int(sum(dls))]}
        )

    sums = ds.map_batches(stat_partial, batch_format="pyarrow").sum(
        ["n_docs", "sum_dl"]
    )
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "n_docs": pa.array([sums["sum(n_docs)"]], pa.int64()),
                "sum_dl": pa.array([sums["sum(sum_dl)"]], pa.int64()),
                # the layout parameter RIDES WITH the index — a probe
                # with a mismatched bucket count would silently miss
                "num_buckets": pa.array([num_buckets], pa.int64()),
            }
        ),
        os.path.join(index_dir, "_stats.parquet"),
    )
    return index_dir


def bm25_index_topk(
    index_dir: str,
    id_col: str,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
):
    """Top-``k`` by BM25 over a :func:`build_inverted_index` layout.
    Reads only the query terms' bucket partitions with the token
    filter pushed into the scan; returns ``(id_col, score)`` ordered
    (score desc, id) — byte-identical to ``bm25_topk`` on the same
    corpus."""
    import glob

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    nt = len(terms)
    if nt == 0:
        raise ValueError("terms must be non-empty")

    st = pq.read_table(os.path.join(index_dir, "_stats.parquet"))
    n = float(st["n_docs"][0].as_py())
    avgdl = st["sum_dl"][0].as_py() / n
    num_buckets = st["num_buckets"][0].as_py()

    files = []
    for bkt in sorted({_token_bucket(t, num_buckets) for t in terms}):
        d = os.path.join(index_dir, f"term_bucket={bkt}")
        if os.path.isdir(d):
            files.extend(
                os.path.join(d, f)
                for f in sorted(os.listdir(d))
                if f.endswith(".parquet")
            )

    def _empty():
        any_files = sorted(
            glob.glob(os.path.join(index_dir, "term_bucket=*", "*.parquet"))
        )
        id_type = (
            pq.read_schema(any_files[0]).field(id_col).type
            if any_files
            else pa.int64()
        )
        return rd.from_arrow(
            pa.table(
                {id_col: pa.array([], id_type), "score": pa.array([], pa.float64())}
            )
        )

    if not files:
        return _empty()

    postings = rd.read_parquet(
        files,
        columns=["token", id_col, "tf", "dl"],
        # dataset expression (Ray 2.49 forwards it to fragment scans;
        # the tuple-DNF `filters=` form crashes in _sample_fragment)
        filter=pc.field("token").isin(list(terms)),
    )

    # per-term df = probed posting count (a posting exists iff tf > 0);
    # the aggregate is |terms|-sized — model state, not data
    df_rows = postings.groupby("token").count().take_all()
    dfs = {r["token"]: r["count()"] for r in df_rows}
    idfs = [
        math.log((n - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5) + 1.0)
        for t in terms
    ]
    if not dfs:
        return _empty()

    term_idx = {t: j for j, t in enumerate(terms)}

    def pivot(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        cols = {
            id_col: batch[id_col],
            "dl": batch["dl"],
        }
        toks = batch["token"].to_pylist()
        tf = batch["tf"].to_numpy(zero_copy_only=False)
        for j in range(nt):
            mask = np.array([term_idx[t] == j for t in toks])
            cols[f"tf_{j}"] = pa.array(
                np.where(mask, tf, 0).astype(np.int64), pa.int64()
            )
        return pa.table(cols)

    agg = (
        postings.map_batches(pivot, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(
            Max("dl", alias_name="dl"),
            *[Sum(f"tf_{j}", alias_name=f"tf_{j}") for j in range(nt)],
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.zeros(len(batch), np.float64)
        # TERM-ORDER summation, same left-associative expression as
        # ranking.bm25_topk -> bit-identical doubles, shared oracle
        norm = k1 * (1.0 - b + b * dl / avgdl)
        for j in range(nt):
            tf = (
                batch[f"tf_{j}"].to_numpy(zero_copy_only=False).astype(np.float64)
            )
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

    return (
        agg.map_batches(score, batch_format="pyarrow")
        .sort(["score", id_col], descending=[True, False])
        .limit(k)
    )
