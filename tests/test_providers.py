"""Provider-backed LLMClient/Embedder: retry/backoff, token-usage
accounting, credential + quarantine paths (reference analogue:
``eschergraph/agents/providers/openai.py:59-197``; env-gated live tests
mirror the reference's TEST_PROVIDERS marker, tests/conftest.py:21-24)."""

import json
import os

import numpy as np
import pytest

from eschergraph_ray.providers import (
    CredentialError,
    ExternalProviderError,
    OpenAICompatTransport,
    ProviderEmbedder,
    ProviderLLM,
    TokenUsage,
)

provider_test = pytest.mark.skipif(
    os.environ.get("TEST_PROVIDERS") != "true",
    reason="Credentials for external provider required.",
)


class FlakyTransport:
    """Fails ``fail_n`` times, then answers."""

    def __init__(self, fail_n: int, answer: dict):
        self.fail_n = fail_n
        self.calls = 0
        self.answer = answer

    def complete(self, system, prompt, json_mode):
        self.calls += 1
        if self.calls <= self.fail_n:
            raise ConnectionError("transient")
        return json.dumps(self.answer), TokenUsage(10, 5, 15)


def test_retry_recovers_and_accounts_tokens():
    sleeps = []
    t = FlakyTransport(2, {"entities": [{"name": "ada", "description": "d"}],
                           "relationships": []})
    llm = ProviderLLM(t, _sleep=sleeps.append)
    out = llm.extract_nodes_edges("chunk")
    assert out["entities"][0]["name"] == "ada"
    assert t.calls == 3
    assert sleeps == [1.0, 2.0]  # exponential backoff between attempts
    assert llm.tokens == [TokenUsage(10, 5, 15)]  # only the success billed


def test_retry_exhaustion_raises_external_provider_error():
    t = FlakyTransport(99, {})
    llm = ProviderLLM(t, _sleep=lambda _: None)
    with pytest.raises(ExternalProviderError, match="after 3 attempts"):
        llm.keywords("text")
    assert t.calls == 3  # stop_after_attempt(3) parity


def test_malformed_json_is_retried_then_quarantined():
    class BadJson:
        def __init__(self):
            self.calls = 0

        def complete(self, system, prompt, json_mode):
            self.calls += 1
            return "not json {", TokenUsage(1, 1, 2)

    t = BadJson()
    llm = ProviderLLM(t, _sleep=lambda _: None)
    with pytest.raises(ExternalProviderError):
        llm.resolve_entities(["a", "b"])
    assert t.calls == 3
    assert len(llm.tokens) == 3  # every round-trip is billed, parse or not


def test_extract_properties_filters_to_known_nodes():
    t = FlakyTransport(0, {"properties": [
        {"entity_name": "Ada", "properties": ["mathematician"]},
        {"entity_name": "hallucinated", "properties": ["x"]},
    ]})
    llm = ProviderLLM(t, _sleep=lambda _: None)
    out = llm.extract_properties("chunk", ["ada", "turing"])
    assert out == [{"entity_name": "Ada", "properties": ["mathematician"]}]


def test_embedder_batches_and_normalizes_newlines():
    class Recorder:
        def __init__(self):
            self.batches = []

        def embed(self, texts):
            self.batches.append(list(texts))
            return [[1.0, 0.0] for _ in texts]

    r = Recorder()
    e = ProviderEmbedder(r, dim_=2, max_batch=2, _sleep=lambda _: None)
    out = e.embed(["a\nb", "c", "d"])
    assert out.shape == (3, 2) and out.dtype == np.float32
    assert r.batches == [["a b", "c"], ["d"]]  # newline->space + chunking
    assert e.dim == 2


def test_embedder_shape_mismatch_raises():
    class Wrong:
        def embed(self, texts):
            return [[1.0] for _ in texts]  # dim 1, declared 2

    e = ProviderEmbedder(Wrong(), dim_=2, _sleep=lambda _: None)
    with pytest.raises(ExternalProviderError, match="shape"):
        e.embed(["x"])


def test_missing_credential_raises_before_any_network():
    t = OpenAICompatTransport(api_key_env="ESCHERGRAPH_RAY_TEST_NO_SUCH_KEY")
    with pytest.raises(CredentialError):
        t.complete("s", "p", json_mode=True)


@provider_test
def test_live_roundtrip():  # pragma: no cover — needs network + key
    llm = ProviderLLM(OpenAICompatTransport())
    out = llm.extract_nodes_edges("Ada Lovelace worked with Charles Babbage.")
    assert isinstance(out.get("entities"), list)
