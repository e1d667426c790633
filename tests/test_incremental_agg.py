"""Incremental aggregate maintenance (functions/incremental_agg.py):
merge == full recompute, atomic persist, delta-only scanning; plus
vocab.type_token_ratio."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from eschergraph_ray.functions.incremental_agg import (
    hourly_state,
    merge_with_state,
    persist_state,
)

HOUR = 3_600_000_000


def _ev(rows):
    ei, ty, ts, v = zip(*rows)
    return rd.from_arrow(pa.table({
        "event_id": pa.array(ei, pa.int64()),
        "event_type": pa.array(ty, pa.string()),
        "ts": pa.array(np.array(ts, "datetime64[us]")),
        "value": pa.array([float(x) for x in v], pa.float64()),
    }))


def test_merge_equals_full_recompute(ray_session, tmp_path):
    rows = [(i, "ab"[i % 2], (i % 5) * HOUR, 1.25 * i) for i in range(40)]
    full = _ev(rows)
    base = _ev([r for r in rows if r[0] % 4 != 3])
    delta = _ev([r for r in rows if r[0] % 4 == 3])
    state = str(tmp_path / "state.parquet")
    persist_state(hourly_state(base, "event_type", "ts", "value"), state)
    merged = merge_with_state(state, delta, "event_type", "ts",
                              "value").to_pandas()
    scratch = (
        hourly_state(full, "event_type", "ts", "value")
        .sort(["event_type", "hour"]).to_pandas()
    )
    assert merged.reset_index(drop=True).equals(
        scratch.reset_index(drop=True))


def test_merge_new_hours_and_types_appear(ray_session, tmp_path):
    base = _ev([(1, "a", 0, 1.0)])
    delta = _ev([(2, "a", 0, 2.0), (3, "b", 5 * HOUR, 4.0)])
    state = str(tmp_path / "state.parquet")
    persist_state(hourly_state(base, "event_type", "ts", "value"), state)
    out = merge_with_state(state, delta, "event_type", "ts",
                           "value").to_pandas()
    got = {(r.event_type, r.hour.hour): (r.n_events, r.cents)
           for r in out.itertuples()}
    assert got[("a", 0)] == (2, 300)   # 1.00 + 2.00 merged
    assert got[("b", 5)] == (1, 400)   # unseen type from the delta


def test_persist_is_atomic_and_single_file(ray_session, tmp_path):
    base = _ev([(1, "a", 0, 1.0)])
    state = str(tmp_path / "s.parquet")
    p = persist_state(hourly_state(base, "event_type", "ts", "value"),
                      state)
    assert p == state and os.path.exists(state)
    leftovers = [f for f in os.listdir(tmp_path) if ".tmp-" in f]
    assert leftovers == []


def test_type_token_ratio_hand_case(ray_session):
    from eschergraph_ray.functions.vocab import type_token_ratio

    docs = rd.from_arrow(pa.table({
        "source": pa.array(["s1", "s1", "s2"], pa.string()),
        "text": pa.array([
            "a b a",          # s1: 3 tokens
            "b c",            # s1: 2 tokens -> types {a,b,c}=3, tot 5
            "x x x x",        # s2: 4 tokens, 1 type
        ], pa.string()),
    }))
    out = type_token_ratio(docs, "source", "text")
    got = {r.source: (r.n_tokens, r.n_types, r.ttr_micro)
           for r in out.itertuples()}
    assert got["s1"] == (5, 3, 600_000)
    assert got["s2"] == (4, 1, 250_000)
