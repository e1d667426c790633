"""Provider-backed implementations of the ``LLMClient`` / ``Embedder``
protocols (llm.py) — the extension surface a reference user swaps in to
run against a real model.

Mirrors the reference's OpenAI provider shape
(``eschergraph/agents/providers/openai.py:59-197``): retry with
exponential backoff x3 attempts, per-call token-usage accounting
(``TokenUsage``, ``eschergraph/agents/llm.py:24-29``), JSON response
mode for structured prompts, and newline->space normalization before
embedding (``openai.py:193-197``). The transport is pluggable so the
retry/quarantine path is testable offline (the sandbox has no network
and no ``openai`` package): ``OpenAICompatTransport`` speaks the
OpenAI-compatible REST shape over stdlib ``urllib`` against any
base_url; tests inject in-memory transports.

Usage with the Ray stages (constructed ONCE per map_batches actor —
pass a picklable factory, never a live client):

    build(src, out, llm_factory=lambda: ProviderLLM(
        OpenAICompatTransport(model="gpt-4o-mini")))

Real-network tests are env-gated like the reference's provider tests
(``TEST_PROVIDERS=true``, reference tests/conftest.py:21-24).
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from typing import Any, Callable, Protocol

import numpy as np


class ExternalProviderError(RuntimeError):
    """Raised when a provider call fails after all retry attempts
    (reference ``ExternalProviderException``)."""


class CredentialError(RuntimeError):
    """Missing API credential (reference ``CredentialException``)."""


@dataclass
class TokenUsage:
    """Tokens used by one provider call (reference llm.py:24-29)."""

    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0


class ChatTransport(Protocol):
    """One round-trip to a chat model. Returns (text, TokenUsage)."""

    def complete(self, system: str, prompt: str, json_mode: bool) -> tuple[str, TokenUsage]: ...


class EmbedTransport(Protocol):
    def embed(self, texts: list[str]) -> list[list[float]]: ...


def _with_retries(fn: Callable[[], Any], attempts: int = 3,
                  base_delay: float = 1.0, max_delay: float = 40.0,
                  sleep: Callable[[float], None] = time.sleep) -> Any:
    """Exponential backoff, ``attempts`` tries total (reference:
    tenacity ``wait_random_exponential(multiplier=1, max=40)`` +
    ``stop_after_attempt(3)``). Deterministic delays (no jitter) so the
    retry path is unit-testable; the terminal failure wraps the last
    error in ExternalProviderError."""
    last: Exception | None = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — provider errors are opaque
            last = e
            if i < attempts - 1:
                sleep(min(base_delay * (2**i), max_delay))
    raise ExternalProviderError(f"provider call failed after {attempts} attempts: {last}") from last


class OpenAICompatTransport:
    """OpenAI-compatible REST transport over stdlib urllib (no sdk
    dependency). Works against api.openai.com or any compatible
    endpoint via ``base_url``. Credential comes from ``api_key_env``
    at call time (reference ``OpenAIProvider.client``,
    openai.py:60-66 — lazy, raises CredentialException when unset)."""

    SYSTEM_MESSAGE = (
        "You are an agent that extracts structured knowledge from "
        "document chunks. Answer ONLY with the requested JSON."
    )

    def __init__(self, model: str = "gpt-4o-mini",
                 embed_model: str = "text-embedding-3-large",
                 base_url: str = "https://api.openai.com/v1",
                 api_key_env: str = "OPENAI_API_KEY",
                 timeout: float = 60.0):
        self.model = model
        self.embed_model = embed_model
        self.base_url = base_url.rstrip("/")
        self.api_key_env = api_key_env
        self.timeout = timeout

    def _post(self, path: str, payload: dict) -> dict:
        api_key = os.getenv(self.api_key_env)
        if not api_key:
            raise CredentialError(f"no API key set in ${self.api_key_env}")
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            data=json.dumps(payload).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {api_key}",
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode())

    def complete(self, system: str, prompt: str, json_mode: bool) -> tuple[str, TokenUsage]:
        payload: dict[str, Any] = {
            "model": self.model,
            "messages": [
                {"role": "system", "content": system or self.SYSTEM_MESSAGE},
                {"role": "user", "content": prompt},
            ],
        }
        if json_mode:
            payload["response_format"] = {"type": "json_object"}
        resp = self._post("/chat/completions", payload)
        usage = resp.get("usage") or {}
        return (
            resp["choices"][0]["message"]["content"],
            TokenUsage(
                prompt_tokens=int(usage.get("prompt_tokens", 0)),
                completion_tokens=int(usage.get("completion_tokens", 0)),
                total_tokens=int(usage.get("total_tokens", 0)),
            ),
        )

    def embed(self, texts: list[str]) -> list[list[float]]:
        resp = self._post("/embeddings", {"model": self.embed_model, "input": texts})
        data = sorted(resp["data"], key=lambda d: d["index"])
        return [d["embedding"] for d in data]


@dataclass
class ProviderLLM:
    """``LLMClient`` backed by a chat transport. Each protocol method
    sends the jinja-analogue prompt in JSON mode, retries x3, records
    token usage, and falls back to a documented empty result ONLY on
    malformed-JSON content (a transport failure after retries still
    raises — callers see real outages, not silent empties)."""

    transport: ChatTransport
    attempts: int = 3
    tokens: list[TokenUsage] = field(default_factory=list)
    _sleep: Callable[[float], None] = time.sleep

    def _json_call(self, system: str, prompt: str) -> Any:
        def once():
            text, usage = self.transport.complete(system, prompt, json_mode=True)
            self.tokens.append(usage)
            return json.loads(text)

        return _with_retries(once, attempts=self.attempts, sleep=self._sleep)

    def _text_call(self, system: str, prompt: str) -> str:
        def once():
            text, usage = self.transport.complete(system, prompt, json_mode=False)
            self.tokens.append(usage)
            return text

        return _with_retries(once, attempts=self.attempts, sleep=self._sleep)

    # --- LLMClient protocol (prompt analogues cited per method) ---

    def extract_nodes_edges(self, chunk_text: str) -> dict:
        """prompts/templates/json_build.jinja (strict-variable render —
        reference jinja_helper.py:16-44 surface)."""
        from .prompts import process_template

        out = self._json_call(
            "Extract entities and relationships from the chunk.",
            process_template("json_build.jinja", {"input_text": chunk_text}),
        )
        return {
            "entities": list(out.get("entities") or []),
            "relationships": list(out.get("relationships") or []),
        }

    def extract_properties(self, chunk_text: str, node_names: list[str]) -> list[dict]:
        """prompts/templates/json_property.jinja: properties for KNOWN
        nodes only."""
        from .prompts import process_template

        out = self._json_call(
            "Extract properties of the listed entities from the chunk.",
            process_template(
                "json_property.jinja",
                {"input_text": chunk_text, "current_nodes": str(node_names)},
            ),
        )
        allowed = {n.lower() for n in node_names}
        return [
            p for p in (out.get("properties") or [])
            if str(p.get("entity_name", "")).lower() in allowed
        ]

    def resolve_entities(self, names: list[str]) -> list[dict]:
        """prompts/templates/identifying_nodes.jinja: canonical +
        merged aliases."""
        from .prompts import process_template

        out = self._json_call(
            "Group entity names that refer to the same real-world entity.",
            process_template("identifying_nodes.jinja",
                             {"entities": str(names)}),
        )
        return list(out.get("entities") or [])

    def summarize_community(self, edges_csv: list[str], properties_csv: list[str]) -> dict:
        """prompts/templates/community_prompt.jinja: {title, summary,
        findings[]}."""
        from .prompts import process_template

        out = self._json_call(
            "Summarize this community of related entities.",
            process_template(
                "community_prompt.jinja",
                {"relationships": "\n".join(edges_csv),
                 "properties": "\n".join(properties_csv)},
            ),
        )
        return {
            "title": str(out.get("title", "community"))[:60],
            "summary": str(out.get("summary", "")),
            "findings": list(out.get("findings") or []),
        }

    def summarize_conversation(self, text: str) -> str:
        from .prompts import process_template

        return self._text_call(
            "Summarize the conversation in <=40 words.",
            process_template("summary.jinja", {"full_text": text}),
        )

    def keywords(self, text: str) -> list[str]:
        from .prompts import process_template

        out = self._json_call(
            "Extract the most important keywords.",
            process_template("json_keywords.jinja", {"full_text": text}),
        )
        return [str(k) for k in (out.get("keywords") or [])][:15] or ["conversation"]

    def extract_visual(self, caption: str, media_type: str,
                       features: list[float]) -> dict:
        """prompts/templates/json_figure.jinja (JSON_TABLE/JSON_FIGURE
        dispatch, build_pipeline.py:316-341)."""
        from .prompts import process_template

        out = self._json_call(
            "Extract entities from this figure/table description.",
            process_template(
                "json_figure.jinja",
                {"figure_caption": f"({media_type}) {caption}",
                 "keywords": ""},
            ),
        )
        return {
            "entities": list(out.get("entities") or []),
            "relationships": list(out.get("relationships") or []),
        }

    def answer(self, query: str, contexts: list[str]) -> str:
        """prompts/templates/search/question_with_context.jinja."""
        from .prompts import process_template

        return self._text_call(
            "Answer strictly from the provided context.",
            process_template(
                "search/question_with_context.jinja",
                {"QUERY": query, "CONTEXT": "\n---\n".join(contexts)},
            ),
        )


@dataclass
class ProviderEmbedder:
    """``Embedder`` backed by an embeddings transport. Newlines are
    replaced by spaces before the call (reference openai.py:193-197 /
    F4) and requests are chunked to ``max_batch`` inputs."""

    transport: EmbedTransport
    dim_: int = 3072  # text-embedding-3-large
    max_batch: int = 512
    attempts: int = 3
    _sleep: Callable[[float], None] = time.sleep

    @property
    def dim(self) -> int:
        return self.dim_

    def embed(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim_), dtype=np.float32)
        cleaned = [(t or "").replace("\n", " ") for t in texts]
        vecs: list[list[float]] = []
        for i in range(0, len(cleaned), self.max_batch):
            chunk = cleaned[i : i + self.max_batch]
            vecs.extend(
                _with_retries(
                    lambda c=chunk: self.transport.embed(c),
                    attempts=self.attempts,
                    sleep=self._sleep,
                )
            )
        out = np.asarray(vecs, dtype=np.float32)
        if out.shape != (len(texts), self.dim_):
            raise ExternalProviderError(
                f"embedding shape {out.shape} != ({len(texts)}, {self.dim_})"
            )
        return out
