"""Build cost/time estimator — ``eschergraph/tools/estimator.py:8-78``
analogue with the same published constants, re-derived for the Ray
execution model.

Reference model (single process, ThreadPool max_workers=2):
    time  = ceil(chunks/2)*t + chunks*t (matcher) + chunks*t (community)
    t     = 4 s (gpt-4o) / 2 s (gpt-4o-mini)          (estimator.py:51-53)
    calls ~ 2.5 per chunk                              (estimator.py:22-24)
    cost  = $5/M prompt + $15/M completion (gpt-4o),
            $0.15/$0.60 (mini); completion ~ prompt/4  (estimator.py:27-37)

Ray model: chunk-extraction calls run on an actor pool of size P, so
wall ~= total_calls * t_call / P + fixed; the estimate is computed from
the chunks Dataset (``ds.sum`` over token counts — A1).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

SECONDS_PER_CALL = {"gpt-4o": 4.0, "gpt-4o-mini": 2.0}
PROMPT_COST_PER_M = {"gpt-4o": 5.0, "gpt-4o-mini": 0.15}
COMPLETION_COST_PER_M = {"gpt-4o": 15.0, "gpt-4o-mini": 0.60}
CALLS_PER_CHUNK = 2.5  # build + property + amortized matcher/community


@dataclass
class BuildEstimate:
    chunks: int
    tokens: int
    llm_calls: int
    est_seconds_reference: float  # reference's sequential model
    est_seconds_ray: float  # actor-pool model at given parallelism
    est_cost_usd: float


def estimate_build(chunks_ds, model: str = "gpt-4o-mini", pool_size: int = 10) -> BuildEstimate:
    """Estimate from a chunks Dataset (schemas.CHUNKS)."""
    n_chunks = chunks_ds.count()
    tokens = int(chunks_ds.sum("n_tokens") or 0)
    t = SECONDS_PER_CALL[model]
    calls = int(math.ceil(CALLS_PER_CHUNK * n_chunks))
    # reference: ceil(chunks/2)*t + chunks*t + chunks*t  (estimator.py:57-71)
    ref_seconds = math.ceil(n_chunks / 2) * t + 2 * n_chunks * t
    ray_seconds = calls * t / max(1, pool_size)
    prompt_tokens = tokens * CALLS_PER_CHUNK
    completion_tokens = prompt_tokens / 4  # estimator.py:33-35
    cost = (
        prompt_tokens / 1e6 * PROMPT_COST_PER_M[model]
        + completion_tokens / 1e6 * COMPLETION_COST_PER_M[model]
    )
    return BuildEstimate(
        chunks=n_chunks,
        tokens=tokens,
        llm_calls=calls,
        est_seconds_reference=round(ref_seconds, 1),
        est_seconds_ray=round(ray_seconds, 1),
        est_cost_usd=round(cost, 4),
    )
