"""Scalar text functions shared across stages.

Reference analogues:
- token counting: tiktoken cl100k_base in ``eschergraph/builder/reader/reader.py:226-238``.
  tiktoken is unavailable in this environment, so we use a BPE-ish
  regex tokenizer (word pieces + punctuation) with a compiled,
  module-cached pattern — the reference wastefully rebuilds the encoder
  per call; we do not.
- name normalization: ``.lower()`` applied before any matching or
  persistence (``eschergraph/builder/build_pipeline.py:236-245,261-271``).
- chunk filter: drop chunks <100 chars or >40%% non-alpha
  (``eschergraph/builder/reader/reader.py:188-224``).
- fuzzy score: ``fuzz.token_set_ratio >= 95``
  (``eschergraph/tools/fuzzy_matcher.py:48-58``) — reimplemented from the
  published token_set_ratio definition on top of stdlib difflib.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

# BPE-ish tokenization: words (incl. contractions), numbers, punctuation runs.
_TOKEN_RE = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?|\d+|[^\w\s]")
_WS_RE = re.compile(r"\s+")
_ALPHA_RE = re.compile(r"[A-Za-z]")
_WORD_RE = re.compile(r"[a-z0-9]+")

# SQL equivalent used by the DuckDB oracle (must stay in sync):
#   array_length(regexp_extract_all(text, '[A-Za-z]+(''[A-Za-z]+)?|\d+|[^\w\s]'))
TOKEN_REGEX_SQL = r"[A-Za-z]+('[A-Za-z]+)?|\d+|[^\w\s]"


def count_tokens(text: str) -> int:
    """Approximate token count (reader.py:226-238 analogue)."""
    return len(_TOKEN_RE.findall(text))


def normalize_name(name: str) -> str:
    """The universal entity key ``name_norm`` (F1 in SURVEY.md §2.3)."""
    return _WS_RE.sub(" ", name.strip().lower())


def chunk_passes_filter(text: str, min_chars: int = 100, max_non_alpha: float = 0.4) -> bool:
    """Chunk filter semantics of ``Reader._chunk_filter`` (reader.py:188-224)."""
    if len(text) < min_chars:
        return False
    stripped = text.replace(" ", "")
    if not stripped:
        return False
    non_alpha = sum(1 for c in stripped if not _ALPHA_RE.match(c))
    return (non_alpha / len(stripped)) <= max_non_alpha


def _ratio(a: str, b: str) -> float:
    # SequenceMatcher.ratio() is NOT symmetric: find_longest_match
    # tie-breaks by position in the FIRST argument, so e.g.
    # ('2p','p20p') scores 0.667 but ('p20p','2p') scores 0.333.
    # Canonicalize the order so token_set_ratio(a,b)==token_set_ratio(b,a).
    if a > b:
        a, b = b, a
    return 100.0 * SequenceMatcher(None, a, b).ratio()


def token_set_ratio(a: str, b: str) -> float:
    """fuzzywuzzy-style token_set_ratio (fuzzy_matcher.py:58 analogue).

    Tokens are set-deduplicated and sorted; the score is the max ratio of
    (intersection vs intersection+diff_a, intersection vs
    intersection+diff_b, combined vs combined).
    """
    ta = set(_WORD_RE.findall(a.lower()))
    tb = set(_WORD_RE.findall(b.lower()))
    if not ta or not tb:
        return 0.0
    inter = " ".join(sorted(ta & tb))
    sa = (inter + " " + " ".join(sorted(ta - tb))).strip()
    sb = (inter + " " + " ".join(sorted(tb - ta))).strip()
    if inter and (inter == sa or inter == sb):
        return 100.0
    return max(_ratio(inter, sa), _ratio(inter, sb), _ratio(sa, sb))
