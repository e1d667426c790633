"""Deterministic synthetic transcript corpus + ground-truth oracle.

The driver's input hint (BASELINE.json) fixes the input shape: a Parquet
table of multi-turn conversation/agent transcripts
``(conv_id, turn_idx, role, text, tool, ts)``. No such table exists in
/root/testdata, so we synthesize it deterministically from a seed
(FIXTURES.md §1): conversation ``i`` is a pure function of
``(seed, i)``, which lets the oracle recompute ground-truth triples
without running the pipeline, and lets generation itself run as a
distributed ``ray.data`` pipeline at bench scale.

Turn texts embed facts in a marker grammar the deterministic mock
extractor (stages/extraction.py) inverts exactly:

- entity description   ``[[Alias]] ((description)).``
- relationship         ``[[Alias A]] <<predicate>> [[Alias B]].``
- property             ``[[Alias]] {{property text}}.``

Aliases mirror the reference's node-matcher fixture style
("Lennart" / "Lennart Timmermans" / "Timmermans",
``eschergraph/agents/prompts/identifying_nodes.jinja:20-27``): a mention
uses the full name, the first name, or the surname; a small fraction of
conversations deliberately share a surname between two entities so
per-mention disambiguation (reference: reranker top-1,
``eschergraph/tools/node_matcher.py:81-102``) is actually exercised.

Skew: every 97th conversation is a "giant" (~40x median turns) to
exercise salted repartition and bounded extraction batches
(SURVEY.md §7.5).
"""

from __future__ import annotations

import hashlib
import os
import random
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from ..schemas import TRANSCRIPTS

FIRST_NAMES = [
    "lennart", "patrick", "noura", "ivan", "mei", "tomas", "amara", "jorge",
    "sanne", "keiko", "dmitri", "fatima", "owen", "priya", "lucas", "zara",
    "henrik", "alba", "rafael", "ines", "bram", "yara", "oscar", "talia",
]
LAST_NAMES = [
    "timmermans", "okafor", "kowalski", "tanaka", "moreau", "lindqvist",
    "haddad", "castillo", "novak", "berg", "fontaine", "abebe", "kim",
    "duarte", "petrov", "vance", "iyer", "sorensen", "quinn", "mbeki",
]
PREDICATES = [
    "collaborates with", "reports to", "mentors", "depends on",
    "works alongside", "funds the work of", "reviews code for",
    "shares an office with", "co-authored a paper with", "supervises",
]
DESCRIPTIONS = [
    "a senior software engineer on the platform team",
    "an open source maintainer focused on data systems",
    "a research scientist studying distributed computation",
    "a product manager for the analytics suite",
    "a site reliability engineer handling storage",
    "a graduate student working on graph algorithms",
    "a consultant specialising in stream processing",
    "a security analyst reviewing the ingestion path",
]
PROPERTY_TEXTS = [
    "prefers reviewing pull requests early in the morning",
    "maintains the internal style guide",
    "holds the weekly architecture office hours",
    "wrote the original prototype of the scheduler",
    "keeps the oncall runbook up to date",
    "presented the quarterly roadmap review",
    "owns the integration test environment",
    "tracks the capacity planning spreadsheet",
]
FILLER_WORDS = (
    "the discussion then moved on to general planning and scheduling topics "
    "covering timelines deliverables staffing reviews documentation quality "
    "metrics deployment rollout monitoring alerting budgets roadmaps retrospectives"
).split()
TOOLS = ["", "", "", "search", "calculator", "code_interpreter"]

GIANT_EVERY = 97  # every Nth conversation is a skew giant
BASE_TS_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds
# Bump whenever generated CONTENT changes — it keys the on-disk corpus
# cache, so stale corpora can't silently poison correctness runs.
GEN_VERSION = 1


def _conv_rng(seed: int, index: int) -> random.Random:
    h = hashlib.blake2b(f"{seed}:{index}".encode(), digest_size=8)
    return random.Random(int.from_bytes(h.digest(), "big"))


@dataclass
class Entity:
    first: str
    last: str
    description: str

    @property
    def canonical(self) -> str:
        return f"{self.first} {self.last}"


@dataclass
class ConvTruth:
    """Ground truth for one conversation (pure function of (seed, index))."""

    conv_id: str
    entities: list[Entity]
    # (subj_canonical, predicate, obj_canonical) — self-loops excluded
    triples: set[tuple[str, str, str]] = field(default_factory=set)
    # (owner_canonical, property_text) — includes self-loop downgrades
    # (reference rule: self-referential edge becomes a property,
    #  eschergraph/builder/build_pipeline.py:286-291)
    properties: set[tuple[str, str]] = field(default_factory=set)


def _build_spec(seed: int, index: int) -> tuple[ConvTruth, list[dict]]:
    """Build the conversation's entities, fact schedule and turn rows."""
    rng = _conv_rng(seed, index)
    conv_id = f"conv-{index:07d}"

    n_entities = rng.randint(3, 8)
    firsts = rng.sample(FIRST_NAMES, n_entities)
    lasts = rng.sample(LAST_NAMES, n_entities)
    shared_surname = rng.random() < 0.15 and n_entities >= 3
    if shared_surname:
        lasts[1] = lasts[0]  # two entities share a surname → ambiguity
    entities = [
        Entity(f, l, rng.choice(DESCRIPTIONS)) for f, l in zip(firsts, lasts)
    ]
    truth = ConvTruth(conv_id=conv_id, entities=entities)

    last_counts: dict[str, int] = {}
    for e in entities:
        last_counts[e.last] = last_counts.get(e.last, 0) + 1

    def mention(e: Entity) -> str:
        r = rng.random()
        if last_counts[e.last] > 1:
            # ambiguous surname: mostly use the unambiguous forms
            if r < 0.05:
                return e.last
            return e.canonical if r < 0.70 else e.first
        if r < 0.55:
            return e.canonical
        return e.first if r < 0.80 else e.last

    # Fact sentences (ground truth recorded alongside).
    sentences: list[str] = []
    for e in entities:
        sentences.append(f"[[{e.canonical}]] (({e.description})).")
    n_rel = max(2, int(1.5 * n_entities))
    for _ in range(n_rel):
        a, b = rng.sample(entities, 2)
        pred = rng.choice(PREDICATES)
        if rng.random() < 0.05:
            # self-loop extraction → property per reference rule
            sentences.append(f"[[{mention(a)}]] <<{pred}>> [[{mention(a)}]].")
            truth.properties.add((a.canonical, pred))
        else:
            sentences.append(f"[[{mention(a)}]] <<{pred}>> [[{mention(b)}]].")
            truth.triples.add((a.canonical, pred, b.canonical))
    for e in entities:
        for _ in range(rng.randint(0, 2)):
            prop = rng.choice(PROPERTY_TEXTS)
            sentences.append(f"[[{mention(e)}]] {{{{{prop}}}}}.")
            truth.properties.add((e.canonical, prop))
    rng.shuffle(sentences)

    # Spread fact sentences over turns with filler so chunking is real.
    is_giant = index % GIANT_EVERY == 0 and index > 0
    n_turns = rng.randint(8, 40) * (40 if is_giant else 1)
    # Every fact must land in some turn (at most 2/turn on average).
    n_turns = max(n_turns, (len(sentences) + 1) // 2)
    rows: list[dict] = []
    ts = BASE_TS_US + index * 3_600_000_000
    fact_iter = iter(sentences)
    facts_left = len(sentences)
    for t in range(n_turns):
        turns_left = n_turns - t
        n_facts = 0
        if facts_left > 0:
            need = -(-facts_left // turns_left)  # ceil: catch up if behind
            n_facts = min(facts_left, max(need, rng.randint(0, 2)))
        parts = []
        for _ in range(n_facts):
            parts.append(next(fact_iter))
            facts_left -= 1
        n_filler = rng.randint(8, 25)
        filler = " ".join(rng.choice(FILLER_WORDS) for _ in range(n_filler))
        parts.append(filler.capitalize() + ".")
        role = "user" if t % 2 == 0 else "assistant"
        tool = rng.choice(TOOLS) if role == "assistant" else ""
        if tool:
            role = "tool"
        ts += rng.randint(1_000_000, 90_000_000)
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": " ".join(parts),
                "tool": tool,
                "ts": ts,
            }
        )
    return truth, rows


def conv_truth(seed: int, index: int) -> ConvTruth:
    """Ground truth only (used by the oracle / P-R harness)."""
    truth, _ = _build_spec(seed, index)
    return truth


def conv_rows(seed: int, index: int) -> list[dict]:
    """Turn rows for one conversation (pure, deterministic)."""
    _, rows = _build_spec(seed, index)
    return rows


def _rows_to_table(rows: list[dict], shuffle_rng: random.Random) -> pa.Table:
    # Shuffle rows within the batch so on-disk order != turn order and
    # groupby(conv_id)+sort(turn_idx) reassembly is genuinely exercised.
    shuffle_rng.shuffle(rows)
    cols = {
        "conv_id": pa.array([r["conv_id"] for r in rows], pa.string()),
        "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
        "role": pa.array([r["role"] for r in rows], pa.string()),
        "text": pa.array([r["text"] for r in rows], pa.large_string()),
        "tool": pa.array([r["tool"] for r in rows], pa.string()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
    }
    return pa.Table.from_pydict(cols, schema=TRANSCRIPTS)


def generate_transcripts_table(n_convs: int, seed: int = 42) -> pa.Table:
    """Small-scale in-memory generation (tests)."""
    rows: list[dict] = []
    for i in range(n_convs):
        rows.extend(conv_rows(seed, i))
    return _rows_to_table(rows, random.Random(seed ^ 0xA5A5))


def transcripts_parquet_dir(n_convs: int, seed: int = 42, root: str = "/tmp/eschergraph_ray") -> str:
    """Materialize (once) a sharded Parquet transcript corpus and return
    its directory. Generation is distributed via ray.data so bench-scale
    corpora don't bottleneck on the driver; the corpus is cached on disk
    keyed by (n_convs, seed).
    """
    out = os.path.join(root, f"transcripts-v{GEN_VERSION}-n{n_convs}-s{seed}")
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    import shutil

    import ray.data as rd

    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def gen(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        idxs = batch["id"].to_pylist()
        if not idxs:  # n_convs < n_blocks leaves some blocks empty
            return _rows_to_table([], random.Random(seed))
        for i in idxs:
            rows.extend(conv_rows(seed, i))
        return _rows_to_table(rows, random.Random((seed << 16) ^ (idxs[0] + 1)))

    # enough shards for load balance (giant convs skew shard sizes)
    n_blocks = max(4, min(512, n_convs // 200 or 1))
    ds = rd.range(n_convs, override_num_blocks=n_blocks)
    # batch_size=None -> one task per block, so generation parallelizes
    # across the worker pool instead of bundling into few huge batches
    ds.map_batches(gen, batch_format="pyarrow", batch_size=None).write_parquet(tmp)
    shutil.rmtree(out, ignore_errors=True)
    os.rename(tmp, out)
    with open(done, "w") as f:
        f.write("ok")
    return out


def oracle_triples_table(n_convs: int, seed: int = 42) -> pa.Table:
    """Ground-truth (conv_id, subj, pred, obj) set for P/R comparison."""
    conv_ids, subjs, preds, objs = [], [], [], []
    for i in range(n_convs):
        t = conv_truth(seed, i)
        for s, p, o in sorted(t.triples):
            conv_ids.append(t.conv_id)
            subjs.append(s)
            preds.append(p)
            objs.append(o)
    return pa.Table.from_pydict(
        {"conv_id": conv_ids, "subj": subjs, "pred": preds, "obj": objs}
    )


def oracle_properties_table(n_convs: int, seed: int = 42) -> pa.Table:
    conv_ids, names, descs = [], [], []
    for i in range(n_convs):
        t = conv_truth(seed, i)
        for n, d in sorted(t.properties):
            conv_ids.append(t.conv_id)
            names.append(n)
            descs.append(d)
    return pa.Table.from_pydict(
        {"conv_id": conv_ids, "node_name": names, "description": descs}
    )


def sf_to_n_convs(sf_dir: str) -> int:
    """Scale the synthetic corpus with the driver's sf directory (by its
    documents row count) so correctness runs at sf0.01 and bench at sf0.1
    see proportionally sized transcript corpora."""
    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows
    # sf0.001 -> 600 convs (smoke), sf0.01 -> 6k (correctness),
    # sf0.1 -> 60k convs (~2M turns) so bench compute dominates fixed
    # orchestration cost and the two-parallelism scaling signal is real.
    return max(20, n_rows // 10)
