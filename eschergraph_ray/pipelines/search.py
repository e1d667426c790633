"""Batch search jobs over the materialized graph + embeddings tables.

Reference entry points restated as Dataset queries (SURVEY.md §3.2/3.3):

- ``quick_search`` (``eschergraph/graph/search/quick_search.py:33-75``):
  vector search top_n=40 at level 0 (optional document filter), rerank,
  keep while score > 0.1 (``quick_search.py:139,145,180-209``).
- ``global_search`` (``eschergraph/graph/search/global_search.py:19-46``):
  top_n=15 at level 1, threshold 0 (``global_search.py:70,74-77``).

The reranker (Jina in the reference) is replaced by embedding cosine
(north-star allows this; the ordering+threshold semantics A6 are kept:
sort desc, filter score > t, limit k). The query embedding is computed
once on the driver and broadcast into the scoring stage via closure
capture of a small numpy vector — no shuffle; scoring is one numpy
matmul per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..llm import Embedder, HashEmbedder

QUICK_TOP_N = 40
QUICK_THRESHOLD = 0.1
GLOBAL_TOP_N = 15
GLOBAL_THRESHOLD = 0.0


def _score_stage(qvec: np.ndarray):
    """Dot-product scorer. CONTRACT: embeddings and the query must be
    unit vectors (every Embedder in this repo emits them, as OpenAI's
    API does) — the dot IS the cosine and the fixed A6 thresholds are
    meaningful. A non-normalizing Embedder plugin must normalize before
    storage; this stage deliberately does not re-normalize because the
    SQL oracle replays the exact stored bytes."""

    def score(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        emb = batch["embedding"]
        n = len(batch)
        if n == 0:  # reshape(0, -1) cannot infer a width
            return batch.append_column("score", pa.array([], pa.float64()))
        # float64 accumulation over the float32 embeddings, rounded
        # half-away-from-zero to 4 decimals: deterministic across
        # summation orders and byte-identical to the SQL oracle's
        # exact-double dot + round() (same device as the ANN family)
        mat = np.asarray(emb.combine_chunks().flatten(), dtype=np.float64).reshape(n, -1)
        raw = mat @ qvec.astype(np.float64)
        scores = np.copysign(np.floor(np.abs(raw) * 1e4 + 0.5), raw) / 1e4
        return batch.append_column("score", pa.array(scores))

    return score


def metadata_predicate(metadata: dict):
    """ChromaDB-filter parity (``chromadb.py:107-128``): each key maps
    to a column; a list value is an ``$in`` membership test, a scalar
    an equality test; multiple keys are ``$and``-combined. Returns a
    vectorized pa.Table -> BooleanArray predicate."""

    def pred(t: pa.Table):
        keep = None
        for key, value in metadata.items():
            if isinstance(value, (list, tuple, set)):
                if not value:  # ChromaDB $in [] matches nothing
                    cond = pa.array([False] * len(t), pa.bool_())
                else:
                    # typed value set: pa.array([]) infers null and
                    # pc.is_in rejects a null set against typed columns
                    cond = pc.is_in(
                        t[key],
                        value_set=pa.array(sorted(value), type=t[key].type),
                    )
            else:
                cond = pc.equal(t[key], value)
            cond = pc.fill_null(cond, False)
            keep = cond if keep is None else pc.and_(keep, cond)
        return keep

    return pred


def attribute_search(
    embeddings_ds,
    query: str,
    level: int,
    top_n: int,
    threshold: float,
    document_id: str | None = None,
    metadata: dict | None = None,
    embedder: Embedder | None = None,
):
    """vector search -> rerank -> threshold -> top_n (A6 semantics),
    with ChromaDB-style metadata filters ($in / $and,
    ``chromadb.py:87-149``)."""
    embedder = embedder or HashEmbedder()
    qvec = embedder.embed([query])[0]
    md = dict(metadata or {})
    md["level"] = level
    if document_id is not None:
        md["document_id"] = document_id
    pred = metadata_predicate(md)
    ds = embeddings_ds.map_batches(
        lambda t: t.filter(pred(t)), batch_format="pyarrow"
    )
    scored = ds.map_batches(_score_stage(qvec), batch_format="pyarrow")
    scored = scored.map_batches(
        lambda t: t.filter(pc.greater(t["score"], threshold)), batch_format="pyarrow"
    )
    # id tie-break: the top_n cut is deterministic (and SQL-replayable)
    # when several hits share a rounded score
    return scored.sort(["score", "id"], descending=[True, False]).limit(top_n)


def rerank_hits(hits_ds, query: str, reranker, top_n: int,
                text_col: str = "text", min_micro: int = 0):
    """Second-stage reranking over a BOUNDED candidate set — the
    reference's rerank step (``quick_search.py:139,145`` calls
    ``Reranker.rerank`` on the vector-search hits;
    ``agents/reranker.py:24-47``). The candidate list is inherently
    small (vector-search top_n ≤ 40), so the rerank call happens
    driver-side exactly like the reference's Jina HTTP call — the
    distributed stage is the ``attribute_search`` that produced the
    candidates. Returns a Dataset with the candidates' columns plus
    integer ``rerank_micro`` (= round(1e6·relevance)), ordered by
    (rerank_micro desc, id asc) and cut to ``top_n`` with
    ``rerank_micro > min_micro`` (the reference's keep-while-relevant
    loop, quick_search.py:180-209)."""
    import ray.data as rd

    tbl = pa.concat_tables(
        list(hits_ds.iter_batches(batch_format="pyarrow"))
    ) if not isinstance(hits_ds, pa.Table) else hits_ds
    if len(tbl) == 0:
        return rd.from_arrow(
            tbl.append_column("rerank_micro", pa.array([], pa.int64()))
        )
    texts = tbl[text_col].to_pylist()
    results = reranker.rerank(query, texts, top_n=len(texts))
    micro = [0] * len(texts)
    for r in results:
        micro[r["index"]] = int(round(r["relevance_score"] * 1e6))
    out = tbl.append_column("rerank_micro", pa.array(micro, pa.int64()))
    out = out.filter(pc.greater(out["rerank_micro"], min_micro))
    return (
        rd.from_arrow(out)
        .sort(["rerank_micro", "id"], descending=[True, False])
        .limit(top_n)
    )


def quick_search(embeddings_ds, query: str, document_id: str | None = None,
                 metadata: dict | None = None, embedder: Embedder | None = None,
                 reranker=None, rerank_top_n: int = 10):
    """Level-0 attribute search (quick_search.py semantics). ``metadata``
    supports the reference's multi-document filtered search:
    ``{"document_id": [id1, id2, ...]}`` ($in) plus any other
    column filters ($and-combined). Passing a ``reranker``
    (llm.Reranker) appends the reference's second rerank stage: the
    cosine top-40 candidates are re-scored by the plugged model and cut
    to ``rerank_top_n``."""
    if not query.strip():
        return embeddings_ds.limit(0)  # empty-query guard (quick_search.py:44-46)
    hits = attribute_search(
        embeddings_ds, query, level=0, top_n=QUICK_TOP_N,
        threshold=QUICK_THRESHOLD, document_id=document_id,
        metadata=metadata, embedder=embedder,
    )
    if reranker is None:
        return hits
    return rerank_hits(hits, query, reranker, top_n=rerank_top_n)


def global_search(embeddings_ds, query: str, embedder: Embedder | None = None):
    """Level-1 (community) search (global_search.py semantics)."""
    return attribute_search(
        embeddings_ds, query, level=1, top_n=GLOBAL_TOP_N,
        threshold=GLOBAL_THRESHOLD, embedder=embedder,
    )


def rag_answer(embeddings_ds, query: str, llm=None, document_id: str | None = None,
               embedder: Embedder | None = None) -> dict:
    """RAGAnswer analogue (``quick_search.py:24-30,33-75``): attribute
    search -> ordered context -> LLM answer. Returns
    ``{"answer": str, "sources": [ids]}`` (visuals: none for
    transcripts)."""
    from ..llm import DeterministicMockLLM

    llm = llm or DeterministicMockLLM()
    hits = quick_search(embeddings_ds, query, document_id=document_id,
                        embedder=embedder).take_all()
    contexts = [h["text"] for h in hits]
    return {
        "answer": llm.answer(query, contexts),
        "sources": [h["id"] for h in hits],
        "visuals": [],
    }


def global_answer(embeddings_ds, query: str, llm=None,
                  embedder: Embedder | None = None) -> str:
    """global_search.py:19-46 analogue: community context join + answer."""
    from ..llm import DeterministicMockLLM

    llm = llm or DeterministicMockLLM()
    hits = global_search(embeddings_ds, query, embedder=embedder).take_all()
    return llm.answer(query, [h["text"] for h in hits])
