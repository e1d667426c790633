"""Pluggable model-provider surface (+ deterministic mocks).

Mirrors the reference's extension points — ``ModelProvider`` ABC
(``eschergraph/agents/llm.py:32-101``), ``Embedding`` ABC
(``eschergraph/agents/embedding.py:12-39``), ``Reranker`` ABC
(``eschergraph/agents/reranker.py:24-47``) — as minimal protocols whose
implementations live inside map_batches actor pools (constructed once
per actor in ``__init__``; SURVEY.md §2.9). A real provider would hold
an HTTP client + tenacity retry there; this sandbox ships deterministic
mocks:

- ``DeterministicMockLLM`` inverts the synthetic transcript grammar
  (sources/transcripts.py) exactly, so ground-truth triples are
  computable without any model — the reference's tests use
  ``MagicMock(spec=ModelProvider)`` the same way (tests/conftest.py:27-55).
- ``HashEmbedder`` emits fixed-dim token-hash embeddings; names sharing
  tokens have strictly higher cosine than unrelated names by
  construction (FIXTURES.md §5), standing in for
  text-embedding-3-large (``eschergraph/agents/providers/openai.py:193-197``).
"""

from __future__ import annotations

import hashlib
import re
from typing import Protocol

import numpy as np

_ENTITY_RE = re.compile(r"\[\[([^\]]+)\]\](?:\s*\(\(([^)]*)\)\))?")
_EDGE_RE = re.compile(r"\[\[([^\]]+)\]\]\s*<<([^>]+)>>\s*\[\[([^\]]+)\]\]")
_PROP_RE = re.compile(r"\[\[([^\]]+)\]\]\s*\{\{([^}]+)\}\}")
_WORD_RE = re.compile(r"[a-z0-9]+")


class LLMClient(Protocol):
    """Per-chunk extraction contract (prompt analogues:
    json_build.jinja / json_property.jinja / identifying_nodes.jinja /
    community_prompt.jinja / summary.jinja / json_keywords.jinja)."""

    def extract_nodes_edges(self, chunk_text: str) -> dict: ...
    def extract_properties(self, chunk_text: str, node_names: list[str]) -> list[dict]: ...
    def resolve_entities(self, names: list[str]) -> list[dict]: ...
    def summarize_community(self, edges_csv: list[str], properties_csv: list[str]) -> dict: ...
    def summarize_conversation(self, text: str) -> str: ...
    def keywords(self, text: str) -> list[str]: ...
    def extract_visual(self, caption: str, media_type: str,
                       features: list[float]) -> dict: ...
    def answer(self, query: str, contexts: list[str]) -> str: ...  # RAG (search.py)


class DeterministicMockLLM:
    """Grammar-inverting mock — a pure function of its inputs."""

    def extract_nodes_edges(self, chunk_text: str) -> dict:
        """NodeEdgeExt analogue (eschergraph/builder/build_log.py:33-37):
        entities with descriptions + free-text relationships."""
        if "[[" not in chunk_text:
            # marker-free filler chunk: the regex passes cannot match —
            # a substring probe skips them (same output, ~3x less regex
            # work on filler-heavy transcripts)
            return {"entities": [], "relationships": []}
        nodes: dict[str, str] = {}
        for m in _ENTITY_RE.finditer(chunk_text):
            name, desc = m.group(1).strip(), (m.group(2) or "").strip()
            key = name.lower()
            if key not in nodes or (not nodes[key] and desc):
                nodes[key] = desc
        edges = [
            {
                "source": m.group(1).strip(),
                "target": m.group(3).strip(),
                "relationship": m.group(2).strip(),
            }
            for m in _EDGE_RE.finditer(chunk_text)
        ]
        return {
            "entities": [{"name": n, "description": d} for n, d in nodes.items()],
            "relationships": edges,
        }

    def extract_properties(self, chunk_text: str, node_names: list[str]) -> list[dict]:
        """json_property.jinja semantics: match properties to existing
        nodes only (eschergraph/builder/build_pipeline.py:191-225)."""
        if "{{" not in chunk_text:
            return []
        allowed = {n.lower() for n in node_names}
        by_entity: dict[str, list[str]] = {}
        for m in _PROP_RE.finditer(chunk_text):
            name = m.group(1).strip().lower()
            if name in allowed:
                by_entity.setdefault(name, []).append(m.group(2).strip())
        return [
            {"entity_name": n, "properties": ps} for n, ps in by_entity.items()
        ]

    def resolve_entities(self, names: list[str]) -> list[dict]:
        """identifying_nodes.jinja analogue ("always return the full
        name", line 6): a name is canonical iff no other name in the
        cluster strictly contains its token set; every alias maps to all
        canonicals whose token set contains it (an alias may map to
        multiple canonicals, jinja:20-27)."""
        toks = {n: set(_WORD_RE.findall(n.lower())) for n in names}
        canonicals = [
            n
            for n in names
            if not any(
                m != n and toks[n] < toks[m] for m in names
            )
        ]
        out = []
        for c in canonicals:
            merged = [a for a in names if a != c and toks[a] <= toks[c]]
            out.append({"name": c, "merged entities": merged})
        return out

    def summarize_community(self, edges_csv: list[str], properties_csv: list[str]) -> dict:
        """community_prompt.jinja analogue: {title, summary, findings[]}
        with findings order preserved (community_builder.py:205-206)."""
        findings = [
            {"summary": line, "explanation": f"observed relationship: {line}"}
            for line in edges_csv[:5]
        ]
        title_src = edges_csv[0] if edges_csv else (properties_csv[0] if properties_csv else "community")
        return {
            "title": title_src.split(",")[0][:60] or "community",
            "summary": " ; ".join(edges_csv[:3]) or "an extracted community",
            "findings": findings,
        }

    def summarize_conversation(self, text: str) -> str:
        words = text.split()
        return " ".join(words[:40])

    def answer(self, question: str, contexts: list[str]) -> str:
        """question_with_context.jinja analogue — deterministic."""
        if not contexts:
            return "I could not find relevant information."
        return (
            f"Based on {len(contexts)} sources, regarding '{question}': "
            + contexts[0]
        )

    def keywords(self, text: str) -> list[str]:
        seen: list[str] = []
        for m in _ENTITY_RE.finditer(text):
            k = m.group(1).strip().lower()
            if k not in seen:
                seen.append(k)
        return seen[:15] or ["conversation"]

    def extract_visual(self, caption: str, media_type: str,
                       features: list[float]) -> dict:
        """Visual-LLM answer analogue (JSON_TABLE / JSON_FIGURE,
        ``eschergraph/builder/build_pipeline.py:316-341``): entities
        carry a ``main_node`` flag (``transform_to_NodeExt``,
        build_pipeline.py:375-413). Deterministic: the main entity is
        the figure/table itself; secondary entities come from any
        ``[[...]]`` markers in the caption, with a relationship to the
        main entity ("depicts")."""
        kind = (media_type or "").split("/")[0] or "figure"
        main = f"{kind} {caption.split(':')[0].strip().lower()}" if caption else kind
        entities = [
            {"main_node": True, "name": main,
             "description": f"a {kind} captioned '{caption}'"}
        ]
        relationships = []
        for m in _ENTITY_RE.finditer(caption or ""):
            name = m.group(1).strip()
            entities.append(
                {"main_node": False, "name": name,
                 "description": (m.group(2) or "").strip()}
            )
            relationships.append(
                {"source": main, "target": name, "relationship": "depicts"}
            )
        return {"entities": entities, "relationships": relationships}


class Embedder(Protocol):
    def embed(self, texts: list[str]) -> np.ndarray: ...

    @property
    def dim(self) -> int: ...


class HashEmbedder:
    """Deterministic token-hash embedding (FIXTURES.md §5): each token
    hashes to a fixed unit direction; a text embeds to the normalized
    mean of its token directions, so shared tokens ⇒ higher cosine."""

    def __init__(self, dim: int = 64, seed: int = 42):
        self._dim = dim
        self._seed = seed
        self._cache: dict[str, np.ndarray] = {}

    @property
    def dim(self) -> int:
        return self._dim

    def _token_vec(self, tok: str) -> np.ndarray:
        v = self._cache.get(tok)
        if v is None:
            h = hashlib.blake2b(f"{self._seed}:{tok}".encode(), digest_size=8)
            rng = np.random.default_rng(int.from_bytes(h.digest(), "big"))
            v = rng.standard_normal(self._dim)
            v /= np.linalg.norm(v)
            self._cache[tok] = v
        return v

    def embed(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self._dim), dtype=np.float32)
        for i, t in enumerate(texts):
            toks = _WORD_RE.findall((t or "").lower())
            if not toks:
                continue
            v = np.sum([self._token_vec(tok) for tok in toks], axis=0)
            n = np.linalg.norm(v)
            if n > 0:
                out[i] = (v / n).astype(np.float32)
        return out


class Reranker(Protocol):
    """Pluggable second-stage rerank contract — the reference's
    ``Reranker`` ABC (``eschergraph/agents/reranker.py:24-47``; Jina
    transport at ``agents/providers/jina.py:33-84``). ``rerank``
    returns at most ``top_n`` results ordered by relevance desc, each a
    dict with the reference's ``RerankerResult`` fields: ``index``
    (position in the input list), ``relevance_score`` (float),
    ``text``. A real cross-encoder implementation holds its HTTP
    client/model here and is constructed once per call site (the
    candidate lists it sees are inherently bounded — vector-search
    top_n, quick_search.py:139)."""

    def rerank(
        self, query: str, text_list: list[str], top_n: int
    ) -> list[dict]: ...

    def get_model_name(self) -> str: ...


class TokenOverlapReranker:
    """Deterministic mock reranker (JinaReranker stand-in): relevance =
    Jaccard overlap of DISTINCT token sets between query and candidate
    under the repo token grammar (functions/text.py:_TOKEN_RE), scored
    in integer micro-units ``round(1e6 * |Q∩T| / |Q∪T|)`` so a DuckDB
    oracle replays the exact ranking (list_distinct/list_intersect +
    the same single divide-then-round). Ties order by input index asc
    (stable), matching a stable-sort cross-encoder."""

    model = "token-overlap-jaccard"
    required_credentials: list[str] = []

    def get_model_name(self) -> str:
        return self.model

    @staticmethod
    def relevance_micro(query: str, text: str) -> int:
        from .functions.text import _TOKEN_RE

        q = set(_TOKEN_RE.findall((query or "").lower()))
        t = set(_TOKEN_RE.findall((text or "").lower()))
        union = len(q | t)
        if union == 0:
            return 0
        inter = len(q & t)
        # single divide then zero-digit round — the cross-engine-safe
        # float chain (same device as vocab micro-nats)
        import pyarrow as pa
        import pyarrow.compute as pc

        return int(
            pc.round(
                pa.array([1e6 * inter / union]),
                ndigits=0,
                round_mode="half_towards_infinity",
            )[0].as_py()
        )

    def rerank(
        self, query: str, text_list: list[str], top_n: int
    ) -> list[dict]:
        scored = [
            {
                "index": i,
                "relevance_score": self.relevance_micro(query, t) / 1e6,
                "text": t,
            }
            for i, t in enumerate(text_list)
        ]
        scored.sort(key=lambda r: (-r["relevance_score"], r["index"]))
        return scored[:top_n]
