"""Ordered per-key window operators over an event stream.

Completes the windowed-aggregate family (`events_hourly` tumbling,
`events_sliding_window` sliding, `sessionize_events` session windows)
with the two remaining classic shapes:

- :func:`running_totals` — per-key running aggregate + lag (the SQL
  ``sum() OVER (PARTITION BY ... ORDER BY ... ROWS UNBOUNDED
  PRECEDING)`` / ``lag()`` pair), expressed as
  ``groupby(key).map_groups`` with an in-group vectorized sort — the
  same per-key-fits-one-reducer contract sessionization already
  relies on (per-user event history is bounded; hot keys would be
  salted by time range first).
- :func:`funnel_counts` — ordered sequential-pattern matching (the
  strict "step k+1 after step k" conversion funnel), one bounded row
  per key out of the shuffle, then a histogram-sized aggregate.

Parity devices: running sums are integer micro-units
(``round(value * 1e6, 0)`` — zero-digit round, identical IEEE op in
DuckDB and pyarrow) accumulated in int64, never floats; time gaps are
int64 microseconds (pyarrow ``timestamp[us] -> int64`` cast == DuckDB
``epoch_us``); the first-row lag is ``-1`` (both engines coalesce).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def running_totals(events_ds, key_col: str, ts_col: str, id_col: str,
                   val_col: str):
    """Per-key running total (integer micro-units) and gap-since-
    previous-event (microseconds), ordered by ``(ts, id)``.

    Returns ``(id_col, key_col, running_micro, gap_us)``;
    ``gap_us = -1`` for each key's first event.
    """

    def window(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        idx = pc.sort_indices(
            group,
            sort_keys=[(ts_col, "ascending"), (id_col, "ascending")],
        )
        g = group.take(idx)
        micro = pc.cast(
            pc.round(
                pc.multiply(pc.cast(g[val_col], pa.float64()), 1e6),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        running = np.cumsum(micro, dtype=np.int64)
        ts_us = pc.cast(g[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        gap = np.empty(len(ts_us), dtype=np.int64)
        gap[0] = -1
        if len(ts_us) > 1:
            gap[1:] = ts_us[1:] - ts_us[:-1]
        return pa.table(
            {
                id_col: g[id_col],
                key_col: g[key_col],
                "running_micro": pa.array(running, pa.int64()),
                "gap_us": pa.array(gap, pa.int64()),
            }
        )

    return events_ds.groupby(key_col).map_groups(
        window, batch_format="pyarrow"
    )


def group_percent_rank(ds, key_col: str, id_col: str, val_col: str):
    """Per-group percentile-rank normalization of a numeric column —
    the rank-based alternative to z-scoring (robust to heavy tails):
    ``pr = (rank - 1) / (n - 1)`` with SQL ``percent_rank()``
    semantics (competition rank: 1 + count of strictly smaller
    values; single-row groups get 0).

    Parity: rank and n are exact integers; ``(r - 1) / (n - 1)`` is
    ONE float division both engines compute identically. Ties share a
    rank, so tie order never matters.
    """

    def ranks(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        v = np.asarray(
            pc.cast(group[val_col], pa.float64()).to_numpy(
                zero_copy_only=False
            )
        )
        n = len(v)
        if n == 1:
            pr = np.zeros(1, dtype=np.float64)
        else:
            sv = np.sort(v)
            r0 = np.searchsorted(sv, v, side="left")  # rank - 1
            pr = r0 / (n - 1)
        return pa.table(
            {
                id_col: group[id_col],
                key_col: group[key_col],
                "pr": pa.array(pr, pa.float64()),
            }
        )

    return ds.groupby(key_col).map_groups(ranks, batch_format="pyarrow")


def resample_locf(events_ds, key_col: str, ts_col: str, id_col: str,
                  val_col: str, step_us: int, cents: int = 100):
    """Per-key regular-grid resampling with last-observation-carried-
    forward — the classic feature-pipeline densification of an
    irregular event stream onto an aligned time grid.

    Each key's grid runs over the step-aligned points inside its own
    [min(ts), max(ts)] (pure int64 arithmetic: ``lo = ceil_div(mn,
    step) * step``, ``hi = (mx // step) * step``), and each grid point
    carries the value of the latest event at-or-before it; among
    simultaneous events the largest ``id_col`` wins (deterministic
    last-write-wins, replayed by the oracle's ``max_by(xc, id)``
    pre-dedup + ``ASOF JOIN``). Values ride as integer ``cents``
    units; timestamps as int64 microseconds — the whole output is
    exact integers.
    """

    def grid(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        idx = pc.sort_indices(
            group,
            sort_keys=[(ts_col, "ascending"), (id_col, "ascending")],
        )
        g = group.take(idx)
        tus = pc.cast(g[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        xc = pc.cast(
            pc.round(
                pc.multiply(pc.cast(g[val_col], pa.float64()), float(cents)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        mn, mx = int(tus[0]), int(tus[-1])
        lo = ((mn + step_us - 1) // step_us) * step_us
        hi = (mx // step_us) * step_us
        if lo > hi:
            return pa.table(
                {
                    key_col: group[key_col][:0],
                    "t_us": pa.array([], pa.int64()),
                    "v_cents": pa.array([], pa.int64()),
                }
            )
        pts = np.arange(lo, hi + 1, step_us, dtype=np.int64)
        # searchsorted right - 1: the LAST row with tus <= t; rows are
        # (tus, id)-sorted, so simultaneous events resolve to max id
        sel = np.searchsorted(tus, pts, side="right") - 1
        return pa.table(
            {
                key_col: pa.array(
                    [g[key_col][0].as_py()] * len(pts), group[key_col].type
                ),
                "t_us": pa.array(pts, pa.int64()),
                "v_cents": pa.array(xc[sel], pa.int64()),
            }
        )

    return events_ds.groupby(key_col).map_groups(grid, batch_format="pyarrow")


def funnel_counts(events_ds, key_col: str, ts_col: str, type_col: str,
                  steps: tuple[str, ...], within_us: int | None = None):
    """Strictly-ordered conversion funnel: a key reaches step ``k+1``
    only with an event of ``steps[k+1]`` at a time strictly AFTER its
    earliest completion of step ``k`` (and, when ``within_us`` is set,
    at most that many microseconds after it — exact int64 comparisons,
    so the SQL ``+ INTERVAL`` replay is bit-identical).

    Returns one row per step: ``(step, step_name, n_keys)`` where
    ``n_keys`` counts keys reaching at least that step. The per-key
    pass emits exactly one ``(key, depth)`` row; the only driver-side
    materialization is the ``len(steps)+1``-row depth histogram.
    """
    steps = tuple(steps)

    def depth_of(group: pa.Table) -> pa.Table:
        types = group[type_col].to_numpy(zero_copy_only=False)
        ts = pc.cast(group[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        t_prev = None
        depth = 0
        for step in steps:
            mask = types == step
            if t_prev is not None:
                mask = mask & (ts > t_prev)
                if within_us is not None:
                    mask = mask & (ts <= t_prev + within_us)
            if not mask.any():
                break
            t_prev = ts[mask].min()
            depth += 1
        return pa.table(
            {
                key_col: group[key_col][:1],
                "depth": pa.array([depth], pa.int64()),
            }
        )

    hist_rows = (
        events_ds.groupby(key_col)
        .map_groups(depth_of, batch_format="pyarrow")
        .groupby("depth")
        .count()
        .take_all()
    )  # bounded: at most len(steps)+1 rows
    by_depth = {int(r["depth"]): int(r["count()"]) for r in hist_rows}
    out_step, out_name, out_n = [], [], []
    for k, name in enumerate(steps, start=1):
        out_step.append(k)
        out_name.append(name)
        out_n.append(sum(n for d, n in by_depth.items() if d >= k))
    return rd.from_arrow(
        pa.table(
            {
                "step": pa.array(out_step, pa.int64()),
                "step_name": pa.array(out_name, pa.string()),
                "n_keys": pa.array(out_n, pa.int64()),
            }
        )
    )


def throttle_first_per_window(ds, key_cols: list[str], ts_col: str,
                              id_col: str,
                              window_us: int = 3_600_000_000):
    """Keep-first-per-window compaction (event throttling / log
    dedup): for each (key..., tumbling window) bucket, the EARLIEST
    event survives (ties on ts broken by smallest id) and the rest are
    counted as suppressed. Returns one row per occupied bucket:
    ``(*key_cols, window_us_start, kept_<id_col>, n_suppressed)``.

    Distributed argmin without a row shuffle: the batch combiner packs
    ``(ts, id)`` into a zero-padded sortable string key and reduces
    each batch to per-bucket ``(min_key, count)`` partials with one
    arrow hash-aggregate, so the groupby moves bucket-cardinality
    partials, never events — min and sum are both associative, a hot
    bucket costs one row per batch. Window start is integer
    ``(epoch_us // window) * window`` (same int arithmetic as SQL
    ``//`` — no temporal-resolution parity risk)."""
    if window_us <= 0:
        raise ValueError("window_us must be positive")
    from ray.data.aggregate import Min, Sum

    kept_col = f"kept_{id_col}"

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ts = pc.cast(pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64())
        if len(batch) and pc.min(ts).as_py() < 0:
            raise ValueError(
                "throttle_first_per_window requires non-negative "
                "timestamps (lexicographic key order breaks below 0)"
            )
        if len(batch) and pc.min(
            pc.cast(batch[id_col], pa.int64())
        ).as_py() < 0:
            raise ValueError(
                "throttle_first_per_window requires non-negative ids "
                "('-' sorts before '0', so a negative id wins the "
                "packed-key argmin with the wrong ordering)"
            )
        win = pc.multiply(pc.divide(ts, window_us), window_us)
        k = pc.binary_join_element_wise(
            pc.utf8_lpad(pc.cast(ts, pa.string()), 20, padding="0"),
            pc.utf8_lpad(pc.cast(batch[id_col], pa.string()), 20,
                         padding="0"),
            ":",
        )
        cols = {c: batch[c] for c in key_cols}
        cols["window_start_us"] = win
        cols["k"] = k
        cols["one"] = pa.array(np.ones(len(batch), np.int64))
        t = pa.table(cols)
        agg = pa.TableGroupBy(t, key_cols + ["window_start_us"]).aggregate(
            [("k", "min"), ("one", "sum")]
        )
        return agg.rename_columns(
            key_cols + ["window_start_us", "k", "one"]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_cols + ["window_start_us"])
        .aggregate(Min("k"), Sum("one"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c] for c in key_cols}
        cols["window_start_us"] = pc.cast(batch["window_start_us"],
                                          pa.int64())
        cols[kept_col] = pc.cast(
            pc.utf8_slice_codeunits(batch["min(k)"], 21), pa.int64()
        )
        cols["n_suppressed"] = pc.subtract(
            pc.cast(batch["sum(one)"], pa.int64()), 1
        )
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        key_cols + ["window_start_us"]
    )


def ansi_ntile_positions(n: int, k: int) -> "np.ndarray":
    """1-based ANSI ``ntile(k)`` bucket ids for rank positions
    ``0..n-1``: the first ``n mod k`` buckets get one extra row —
    DuckDB/ANSI semantics, shared by :func:`group_ntile` and the RFM
    sweep so every caller replays the identical divmod arithmetic."""
    q, rem = divmod(n, k)
    r = np.arange(n, dtype=np.int64)
    if q == 0:
        # fewer rows than buckets: one row per bucket, in order
        return r + 1
    big = rem * (q + 1)
    return np.where(r < big, r // (q + 1) + 1, rem + (r - big) // q + 1)


def group_ntile(ds, key_col: str, val_col: str, id_col: str, k: int = 4):
    """SQL ``ntile(k) OVER (PARTITION BY key ORDER BY val, id)``:
    equal-ROW-COUNT buckets per key (the first ``n mod k`` buckets get
    the extra row — DuckDB/ANSI semantics, replayed exactly with the
    same divmod arithmetic). Ties order by id, so bucket assignment is
    deterministic on both engines. Returns
    ``(id_col, key_col, ntile)``.

    Same per-key-fits-one-reducer contract as the other ordered window
    ops here (``groupby(key).map_groups`` with an in-group vectorized
    sort); keys are assumed bounded-cardinality-per-key, not
    bounded-count."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def tiles(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(val_col, "ascending"), (id_col, "ascending")]
        )
        t = g.take(idx)
        nt = ansi_ntile_positions(t.num_rows, k)
        return pa.table(
            {
                id_col: t[id_col],
                key_col: t[key_col],
                "ntile": pa.array(nt, pa.int64()),
            }
        )

    return ds.groupby(key_col).map_groups(tiles, batch_format="pyarrow")


def event_transitions(events_ds, key_col: str, ts_col: str, id_col: str,
                      type_col: str, k: int = 20):
    """Top-k first-order Markov transitions: how often does event type
    ``src`` get immediately followed by ``dst`` within the same key's
    ``(ts, id)``-ordered stream — the sequence-model complement of the
    bigram LM (:mod:`vocab`), run over the event log instead of text.
    The standard input to next-event prediction, funnel discovery and
    bot detection in a training-data pipeline.

    Shape: each key's (bounded) history meets in one reducer — the
    same contract as :func:`running_totals` / sessionization — where
    consecutive pairs reduce to a PER-GROUP transition count partial,
    so the second exchange moves at most |types|² rows per group, and
    the final groupby+top-k is transition-cardinality-sized. Null
    types are dropped BEFORE pairing on both engines (adjacency is
    defined over the non-null subsequence).

    Parity: counts are exact int64; the top-k cut orders by
    ``(n DESC, src ASC, dst ASC)`` — a total order, so the limit
    fencepost is deterministic on both engines.
    """
    from ray.data.aggregate import Sum

    def pairs(group: pa.Table) -> pa.Table:
        # groups are tiny (one key's history): emit raw consecutive
        # pairs; the per-BATCH combiner below aggregates across many
        # groups at once (a per-group hash-aggregate here costs more
        # than it saves)
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.filter(pc.is_valid(group[type_col]))
        if len(g) < 2:
            return pa.table(
                {
                    "src": pa.array([], pa.string()),
                    "dst": pa.array([], pa.string()),
                }
            )
        idx = pc.sort_indices(
            g, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
        )
        t = pc.cast(g[type_col], pa.string()).take(idx).combine_chunks()
        return pa.table({"src": t.slice(0, len(t) - 1),
                         "dst": t.slice(1)})

    def combiner(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        return (
            batch.group_by(["src", "dst"])
            .aggregate([([], "count_all")])
            .rename_columns(["src", "dst", "n_part"])
        )

    return (
        events_ds.groupby(key_col)
        .map_groups(pairs, batch_format="pyarrow")
        .map_batches(combiner, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Sum("n_part", alias_name="n"))
        .map_batches(
            lambda b: pa.table(
                {
                    "src": b["src"],
                    "dst": b["dst"],
                    "n": pc.cast(b["n"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort(["n", "src", "dst"], descending=[True, False, False])
        .limit(k)
    )


def hourly_anomalies(events_ds, ts_col: str, window: int = 24,
                     factor_pct: int = 300,
                     hour_us: int = 3_600_000_000):
    """Trailing-window burst detection over the hourly event-count
    series: flag every OBSERVED hour whose count exceeds
    ``factor_pct``% of the trailing mean of the previous ``window``
    observed hours (frame semantics = SQL ``ROWS BETWEEN window
    PRECEDING AND 1 PRECEDING`` over the hour-count table — gaps are
    not zero-filled, matching the SQL frame exactly). The standard
    ingest-monitoring / traffic-anomaly diagnostic.

    Shape: per-batch arrow hash-aggregate partials (the combiner)
    collapse event rows to hour cells before the only exchange; the
    windowed pass runs in ONE reducer over the hour table, which is
    bounded by the corpus time span (never by row count) — the same
    bounded-cardinality argument as the seasonality profile. Returns
    ``(hr, n, trail_n)`` for flagged hours, hour-ascending; the first
    ``window`` observed hours are never flagged (incomplete frame).

    Parity: hr is integer ``epoch_us // hour_us``; the flag predicate
    ``n * 100 * window > factor_pct * trail_n`` is pure int64 — no
    division anywhere.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    if window < 1 or factor_pct < 1:
        raise ValueError("window and factor_pct must be positive")

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        t = pa.table({"hr": pc.divide(ts, hour_us)})
        return (
            t.group_by("hr")
            .aggregate([([], "count_all")])
            .rename_columns(["hr", "n_part"])
        )

    hours = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hr")
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def flag(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("hr")
        n = pc.cast(g["n"], pa.int64()).to_numpy(zero_copy_only=False)
        hr = pc.cast(g["hr"], pa.int64()).to_numpy(zero_copy_only=False)
        cum = np.concatenate(([0], np.cumsum(n, dtype=np.int64)))
        i = np.arange(len(n))
        lo = np.maximum(i - window, 0)
        trail = cum[i] - cum[lo]
        keep = (i >= window) & (n * (100 * window) > factor_pct * trail)
        return pa.table(
            {
                "hr": pa.array(hr[keep], pa.int64()),
                "n": pa.array(n[keep], pa.int64()),
                "trail_n": pa.array(trail[keep], pa.int64()),
            }
        )

    # the hour table is span-bounded: one block, one batch, one sweep
    # (repartition(1) + batch_size=None — cheaper than a keyed groupby)
    return (
        hours.repartition(1)
        .map_batches(flag, batch_format="pyarrow", batch_size=None)
        .sort("hr")
    )


def retention_counts(events_ds, user_col: str, ts_col: str,
                     offsets: tuple = (1, 7),
                     day_us: int = 86_400_000_000):
    """Cohort retention: users grouped by FIRST-ACTIVE day, with, for
    each requested day offset N, how many returned exactly on day
    cohort+N — the classic day-1/day-7 growth curve. Returns one row
    per cohort day: ``(cohort_day, n_users, ret_<N>...)`` (cohort_day
    = int64 epoch-us of the day start; pure ``//`` arithmetic, no
    temporal parity risk).

    Shape: the event log collapses to distinct (user, day) pairs in
    one groupby (activity multiplicity never shuffles), first-active
    days are a per-user Min aggregate, the join back is a clamped
    hash join, and the per-cohort flags are if_else indicator sums —
    everything downstream of the first groupby is
    user-cardinality-sized."""
    import numpy as np
    from ray.data.aggregate import Min, Sum

    from .graph_metrics import _clamp_partitions

    if not offsets or any(o < 1 for o in offsets):
        raise ValueError("offsets must be positive day counts")
    P = _clamp_partitions(4)

    def to_days(b: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                user_col: b[user_col],
                "day": pc.multiply(pc.divide(ts, day_us), day_us),
            }
        )

    days = (
        events_ds.map_batches(to_days, batch_format="pyarrow")
        .groupby([user_col, "day"])
        .count()
        .map_batches(
            lambda b: b.select([user_col, "day"]), batch_format="pyarrow"
        )
        .repartition(P)
        .materialize()
    )
    first = (
        days.groupby(user_col)
        .aggregate(Min("day"))
        .map_batches(
            lambda b: pa.table(
                {
                    user_col: b[user_col],
                    "cohort_day": pc.cast(b["min(day)"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(P)
        .materialize()
    )
    sizes = first.groupby("cohort_day").count()
    ret_cols = [f"ret_{o}" for o in offsets]

    def flags(b: pa.Table) -> pa.Table:
        off = pc.divide(
            pc.subtract(pc.cast(b["day"], pa.int64()), b["cohort_day"]),
            day_us,
        )
        cols = {"cohort_day": b["cohort_day"]}
        for o, rc in zip(offsets, ret_cols):
            cols[rc] = pc.cast(pc.equal(off, o), pa.int64())
        return pa.table(cols)

    rets = (
        days.join(first, "inner", num_partitions=P, on=(user_col,))
        .map_batches(flags, batch_format="pyarrow")
        .groupby("cohort_day")
        .aggregate(*[Sum(c) for c in ret_cols])
    )

    def finalize(b: pa.Table) -> pa.Table:
        cols = {
            "cohort_day": pc.cast(b["cohort_day"], pa.int64()),
            "n_users": pc.cast(b["count()"], pa.int64()),
        }
        for c in ret_cols:
            cols[c] = pc.fill_null(pc.cast(b[f"sum({c})"], pa.int64()), 0)
        return pa.table(cols)

    return (
        sizes.repartition(P)
        .join(rets.repartition(P), "left_outer", num_partitions=P,
              on=("cohort_day",))
        .map_batches(finalize, batch_format="pyarrow")
        .sort("cohort_day")
    )


def lag_xcorr(events_ds, ts_col: str, type_col: str, type_a: str,
              type_b: str, max_lag: int = 6,
              hour_us: int = 3_600_000_000):
    """Lagged cross-correlation between two event types' hourly count
    series: for each lag ``ℓ in 0..max_lag``, the raw integer dot
    product ``Σ_h a(h)·b(h+ℓ)`` — does type_b follow type_a, and by
    how many hours? (The lead-lag diagnostic behind funnel latency
    and cause→effect mining.) Returns ``(lag, xprod)`` for every lag,
    lag-ascending; hours where either series is absent contribute 0
    (inner-join semantics, identical on both engines).

    Shape: one combiner pass collapses events to per-(hour, type)
    cells; the lag sweep runs in ONE reducer over the span-bounded
    hour table (the :func:`hourly_anomalies` contract). Every product
    and sum is exact int64.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    if max_lag < 0:
        raise ValueError("max_lag must be >= 0")

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.or_(
            pc.equal(b[type_col], type_a), pc.equal(b[type_col], type_b)
        )
        t = b.select([ts_col, type_col]).filter(keep)
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        # independent indicators so type_a == type_b (autocorrelation)
        # is well-defined too
        cells = pa.table(
            {
                "hr": pc.divide(ts, hour_us),
                "na": pc.cast(pc.equal(t[type_col], type_a), pa.int64()),
                "nb": pc.cast(pc.equal(t[type_col], type_b), pa.int64()),
            }
        )
        return (
            cells.group_by("hr")
            .aggregate([("na", "sum"), ("nb", "sum")])
            .rename_columns(["hr", "na", "nb"])
        )

    hours = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hr")
        .aggregate(Sum("na", alias_name="na"), Sum("nb", alias_name="nb"))
    )

    def sweep(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.sort_by("hr")
        hr = pc.cast(g["hr"], pa.int64()).to_numpy(zero_copy_only=False)
        na = pc.cast(g["na"], pa.int64()).to_numpy(zero_copy_only=False)
        nb = pc.cast(g["nb"], pa.int64()).to_numpy(zero_copy_only=False)
        lags = np.arange(max_lag + 1, dtype=np.int64)
        prods = np.zeros(max_lag + 1, dtype=np.int64)
        for li in range(max_lag + 1):
            j = np.searchsorted(hr, hr + li)
            ok = (j < len(hr))
            ok[ok] &= hr[j[ok]] == hr[ok] + li
            prods[li] = int(np.sum(na[ok] * nb[j[ok]]))
        return pa.table(
            {
                "lag": pa.array(lags, pa.int64()),
                "xprod": pa.array(prods, pa.int64()),
            }
        )

    return (
        hours.repartition(1)
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .sort("lag")
    )


def hourly_trend(events_ds, ts_col: str, type_col: str,
                 hour_us: int = 3_600_000_000):
    """Per-type linear trend of the hourly count series over the
    corpus's FULL hour span (missing hours count as zero — a type
    that dies out trends down): the exact ordinary-least-squares
    slope, kept as an integer fraction. The traffic-drift detector
    behind "which event types are growing/shrinking".

    For x = hour − first_hour over a span of h hours, the x-only sums
    are closed-form (n = h, Σx = h(h−1)/2, Σx² = (h−1)h(2h−1)/6);
    only Σy and Σxy touch data, accumulated over the (span-bounded)
    hour-cell table. Returns per type
    ``(event_type, n_hours, slope_num, slope_den, slope_micro)`` with
    ``slope = slope_num / slope_den`` events/hour —
    ``slope_num = n·Σxy − Σx·Σy``, ``slope_den = n·Σx² − (Σx)²``
    exact int64; ``slope_micro = round(1e6·num/den)`` is the one
    reporting division (float-cast first, both engines identical).
    Empty input or a single-hour span (slope undefined) yields zero
    rows.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = b.select([ts_col, type_col]).filter(
            pc.is_valid(b[type_col])
        )
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        cells = pa.table(
            {"typ": pc.cast(t[type_col], pa.string()),
             "hr": pc.divide(ts, hour_us)}
        )
        return (
            cells.group_by(["typ", "hr"])
            .aggregate([([], "count_all")])
            .rename_columns(["typ", "hr", "cnt"])
        )

    cells = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["typ", "hr"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .materialize()
    )  # span x type bounded
    empty = pa.table(
        {
            "event_type": pa.array([], pa.string()),
            "n_hours": pa.array([], pa.int64()),
            "slope_num": pa.array([], pa.int64()),
            "slope_den": pa.array([], pa.int64()),
            "slope_micro": pa.array([], pa.int64()),
        }
    )
    if cells.count() == 0:
        return rd.from_arrow(empty)
    lo = int(cells.min("hr"))
    hi = int(cells.max("hr"))
    h = hi - lo + 1
    if h < 2:
        return rd.from_arrow(empty)
    sx = h * (h - 1) // 2
    sxx = (h - 1) * h * (2 * h - 1) // 6
    den = h * sxx - sx * sx

    def sweep(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        if len(group) == 0:
            return empty
        g = group.sort_by("typ")
        typ = g["typ"]
        cnt = pc.cast(g["cnt"], pa.int64()).to_numpy(zero_copy_only=False)
        x = (pc.cast(g["hr"], pa.int64()).to_numpy(zero_copy_only=False)
             - lo)
        tkeys = pc.cast(typ, pa.string()).to_pylist()
        out_t, out_num, out_mic = [], [], []
        i = 0
        n = len(tkeys)
        while i < n:
            j = i
            sy = sxy = 0
            while j < n and tkeys[j] == tkeys[i]:
                sy += int(cnt[j])
                sxy += int(cnt[j]) * int(x[j])
                j += 1
            num = h * sxy - sx * sy
            out_t.append(tkeys[i])
            out_num.append(num)
            out_mic.append(int(
                pc.round(
                    pa.array([float(num * 1_000_000) / float(den)]),
                    ndigits=0,
                    round_mode="half_towards_infinity",
                )[0].as_py()
            ))
            i = j
        k = len(out_t)
        return pa.table(
            {
                "event_type": pa.array(out_t, pa.string()),
                "n_hours": pa.array([h] * k, pa.int64()),
                "slope_num": pa.array(out_num, pa.int64()),
                "slope_den": pa.array([den] * k, pa.int64()),
                "slope_micro": pa.array(out_mic, pa.int64()),
            }
        )

    return (
        cells.repartition(1)
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .sort("event_type")
    )


def rolling_active_users(events_ds, user_col: str, ts_col: str,
                         window_days: int = 7,
                         day_us: int = 86_400_000_000):
    """Rolling N-day distinct active users per observed day — the
    DAU/WAU growth curve, the first chart every event-log pipeline
    ships. Returns one row per day that has events:
    ``(day, dau, wau)`` with ``day`` = int64 epoch-us day start,
    ``dau`` = distinct users that day, ``wau`` = distinct users in the
    trailing ``window_days`` window ending that day.

    Shape: the event log collapses to distinct ``(user, day)`` pairs
    in one groupby (activity multiplicity never shuffles — the
    retention_counts device), each pair is EXPLODED into the
    ``window_days`` trailing windows it contributes to (vectorized
    ``np.repeat``) and clipped against the broadcast observed-day set
    (calendar-cardinality, ray.put once), then distinct membership per
    ``(window day, user)`` is re-derived with a Max indicator — every
    exchange after the first groupby is pairs × window_days, never raw
    events. Pure ``//`` day arithmetic on both engines, all-int64
    output."""
    import ray
    from ray.data.aggregate import Count, Max, Sum

    if window_days < 1:
        raise ValueError("window_days must be >= 1")

    out_schema = pa.schema(
        [("day", pa.int64()), ("dau", pa.int64()), ("wau", pa.int64())]
    )

    def to_days(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = b.filter(
            pc.and_(pc.is_valid(b[ts_col]), pc.is_valid(b[user_col]))
        )
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                user_col: t[user_col],
                "day": pc.multiply(pc.divide(ts, day_us), day_us),
            }
        )

    pairs = (
        events_ds.map_batches(to_days, batch_format="pyarrow")
        .groupby([user_col, "day"])
        .count()
        .map_batches(
            lambda b: b.select([user_col, "day"]), batch_format="pyarrow"
        )
        .materialize()  # pairs-cardinality; reused twice below
    )
    days = pairs.unique("day")  # observed-day set: calendar-sized
    if not days:
        return rd.from_arrow(out_schema.empty_table())
    days_ref = ray.put(np.asarray(sorted(days), np.int64))

    def explode(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        observed = ray.get(days_ref)
        src = pc.cast(b["day"], pa.int64()).to_numpy(zero_copy_only=False)
        usr = b[user_col].to_numpy(zero_copy_only=False)
        offs = np.arange(window_days, dtype=np.int64) * day_us
        tgt = (src[:, None] + offs[None, :]).ravel()
        usr_r = np.repeat(usr, window_days)
        is_dau = (tgt == np.repeat(src, window_days)).astype(np.int64)
        keep = np.isin(tgt, observed)
        return pa.table(
            {
                "day": pa.array(tgt[keep]),
                user_col: pa.array(usr_r[keep]),
                "is_dau": pa.array(is_dau[keep]),
            }
        )

    return (
        pairs.map_batches(explode, batch_format="pyarrow")
        .groupby(["day", user_col])
        .aggregate(Max("is_dau", alias_name="is_dau"))
        .groupby("day")
        .aggregate(Count(alias_name="wau"), Sum("is_dau", alias_name="dau"))
        .map_batches(
            lambda b: pa.table(
                {
                    "day": pc.cast(b["day"], pa.int64()),
                    "dau": pc.cast(b["dau"], pa.int64()),
                    "wau": pc.cast(b["wau"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort("day")
    )


def session_paths(events_ds, user_col: str, ts_col: str, id_col: str,
                  type_col: str, gap_us: int = 1_800_000_000,
                  max_len: int = 8, k: int = 15):
    """Top-k session event-type paths: sessionize each user's stream
    (same gap rule as `sessionize_events`), render each session's
    first ``max_len`` event types as a ``'>'``-joined path string, and
    count path frequencies corpus-wide — the sequential-pattern-mining
    staple behind funnel discovery and bot fingerprinting.

    Shape: each user's (bounded) history meets in one reducer — the
    sessionization contract — where it reduces to one path row per
    session; a per-BATCH combiner pre-aggregates path counts so the
    final exchange is path-cardinality-sized (``max_len`` bounds the
    string, so a runaway session can't emit an unbounded key).

    Parity: ordering is ``(ts, id)`` — a total order — on both
    engines; nulls in user/ts/type are dropped BEFORE sessionizing;
    the top-k cut orders by ``(n DESC, path ASC)``."""
    from ray.data.aggregate import Sum

    def paths(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.filter(
            pc.and_(pc.is_valid(group[type_col]),
                    pc.is_valid(group[ts_col]))
        )
        if g.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        idx = pc.sort_indices(
            g, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
        )
        t = g.take(idx)
        ts = pc.cast(
            pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        types = pc.cast(t[type_col], pa.string()).to_pylist()
        brk = np.ones(len(ts), bool)
        brk[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(ts))
        out = [
            ">".join(types[s:min(e, s + max_len)])
            for s, e in zip(starts, ends)
        ]
        return pa.table({"path": pa.array(out, pa.string())})

    def prefilter(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        return b.select([user_col, ts_col, id_col, type_col]).filter(
            pc.is_valid(b[user_col])
        )

    def combiner(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        return (
            batch.group_by("path")
            .aggregate([([], "count_all")])
            .rename_columns(["path", "n_part"])
        )

    return (
        events_ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby(user_col)
        .map_groups(paths, batch_format="pyarrow")
        .map_batches(combiner, batch_format="pyarrow")
        .groupby("path")
        .aggregate(Sum("n_part", alias_name="n"))
        .map_batches(
            lambda b: pa.table(
                {"path": b["path"], "n": pc.cast(b["n"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .sort(["n", "path"], descending=[True, False])
        .limit(k)
    )


def activity_changepoint(events_ds, ts_col: str, type_col: str,
                         hour_us: int = 3_600_000_000):
    """Per-type CUSUM changepoint over the OBSERVED hourly activity
    profile: for each event type, the hour where the cumulative count
    deviates most from a uniform spread across its observed hours —
    the standard "when did this stream's behavior shift" detector
    (Page's CUSUM on the count series, argmax of |S_i|).

    For a type with m observed hour-cells totalling T events,
    ``dev_i = m·cum_i − i·T`` (i = 1-based cell rank, exact int64;
    dev_m ≡ 0). Returns per type
    ``(event_type, n_cells, n_events, cp_hr, dev_abs)`` where
    ``cp_hr`` is the epoch-hour with max |dev| (smallest hour on ties
    — argmax over the hour-ascending sequence picks the first max on
    both engines).

    Shape: per-batch (type, hour) count partials (the hourly_trend
    combiner — counts move, never rows), one span×type-bounded
    groupby, then a single bounded sweep (``repartition(1)`` +
    ``batch_size=None``)."""
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = b.select([ts_col, type_col]).filter(
            pc.and_(pc.is_valid(b[type_col]), pc.is_valid(b[ts_col]))
        )
        ts = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64())
        cells = pa.table(
            {"typ": pc.cast(t[type_col], pa.string()),
             "hr": pc.divide(ts, hour_us)}
        )
        return (
            cells.group_by(["typ", "hr"])
            .aggregate([([], "count_all")])
            .rename_columns(["typ", "hr", "cnt"])
        )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("n_cells", pa.int64()),
            ("n_events", pa.int64()),
            ("cp_hr", pa.int64()),
            ("dev_abs", pa.int64()),
        ]
    )

    def sweep(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        if len(group) == 0:
            return out_schema.empty_table()
        g = group.sort_by([("typ", "ascending"), ("hr", "ascending")])
        typ = pc.cast(g["typ"], pa.string()).to_pylist()
        hr = pc.cast(g["hr"], pa.int64()).to_numpy(zero_copy_only=False)
        cnt = pc.cast(g["cnt"], pa.int64()).to_numpy(zero_copy_only=False)
        rows = {name: [] for name in out_schema.names}
        i = 0
        n = len(typ)
        while i < n:
            j = i
            while j < n and typ[j] == typ[i]:
                j += 1
            c = cnt[i:j]
            m = j - i
            total = int(c.sum())
            cum = np.cumsum(c, dtype=np.int64)
            dev = np.abs(m * cum - np.arange(1, m + 1, dtype=np.int64)
                         * total)
            best = int(np.argmax(dev))  # first max = smallest hour
            rows["event_type"].append(typ[i])
            rows["n_cells"].append(m)
            rows["n_events"].append(total)
            rows["cp_hr"].append(int(hr[i + best]))
            rows["dev_abs"].append(int(dev[best]))
            i = j
        return pa.table(
            {
                "event_type": pa.array(rows["event_type"], pa.string()),
                "n_cells": pa.array(rows["n_cells"], pa.int64()),
                "n_events": pa.array(rows["n_events"], pa.int64()),
                "cp_hr": pa.array(rows["cp_hr"], pa.int64()),
                "dev_abs": pa.array(rows["dev_abs"], pa.int64()),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["typ", "hr"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .repartition(1)
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
        .sort("event_type")
    )


def session_durations(events_ds, user_col: str, ts_col: str, id_col: str,
                      gap_us: int = 1_800_000_000,
                      day_us: int = 86_400_000_000):
    """Session durations keyed by start day-of-week: sessionize each
    user's stream (the shared 30-min-gap rule) and emit one
    ``(dow, dur_us)`` row per session — duration = last−first event
    (0 for singletons), dow of the session's start day (epoch-day + 4
    mod 7, Monday=0). The feed for per-weekday engagement robust
    stats; same per-user-meets-one-reducer contract as
    :func:`session_paths`."""

    def sessions(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.filter(pc.is_valid(group[ts_col]))
        if g.num_rows == 0:
            return pa.table(
                {"dow": pa.array([], pa.int64()),
                 "dur_us": pa.array([], pa.int64())}
            )
        idx = pc.sort_indices(
            g, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
        )
        ts = pc.cast(
            pc.cast(g.take(idx)[ts_col], pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        brk = np.ones(len(ts), bool)
        brk[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(ts)) - 1
        t0 = ts[starts]
        return pa.table(
            {
                "dow": pa.array((t0 // day_us + 4) % 7, pa.int64()),
                "dur_us": pa.array(ts[ends] - t0, pa.int64()),
            }
        )

    def prefilter(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        return b.select([user_col, ts_col, id_col]).filter(
            pc.is_valid(b[user_col])
        )

    return (
        events_ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby(user_col)
        .map_groups(sessions, batch_format="pyarrow")
    )


def scd2_intervals(events_ds, key_col: str, ts_col: str, id_col: str,
                   attr_col: str):
    """Slowly-changing-dimension TYPE-2 history building — the
    warehouse-standard "collapse an event stream into validity
    intervals" transform: per key, consecutive runs of the same
    ``attr_col`` value become one row ``(valid_from_us, valid_to_us,
    n_events)``, where valid_to is the NEXT run's start (NULL while
    current). The gaps-and-islands window chain in SQL terms, the
    dimension-table feed in pipeline terms.

    Shape: each key's (bounded) history meets in one reducer — the
    sessionize/transitions contract — and reduces to runs-per-key rows
    (never event rows) before anything else moves. Null attributes are
    dropped first on both engines (runs are defined over the non-null
    subsequence). All outputs are exact int64 microseconds/counts; the
    final (key, valid_from, attr) order is total because event ids
    break ts ties inside the sort, and two runs can only share a
    valid_from if raw timestamps collide across a boundary — attr
    disambiguates the output order even then.
    """
    import numpy as np

    def intervals(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.filter(pc.is_valid(group[attr_col]))
        empty = pa.table(
            {
                "key": pa.array([], group[key_col].type),
                "attr": pa.array([], pa.string()),
                "valid_from_us": pa.array([], pa.int64()),
                "valid_to_us": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
            }
        ).rename_columns([key_col, attr_col, "valid_from_us",
                          "valid_to_us", "n_events"])
        if len(g) == 0:
            return empty
        idx = pc.sort_indices(
            g, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
        )
        attr = pc.cast(g[attr_col], pa.string()).take(idx)
        ts = (
            pc.cast(g[ts_col].take(idx), pa.int64())
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        a = attr.to_numpy(zero_copy_only=False)
        chg = np.ones(len(a), dtype=bool)
        chg[1:] = a[1:] != a[:-1]
        starts = np.flatnonzero(chg)
        ends = np.append(starts[1:], len(a))
        valid_from = ts[starts]
        # the last run is still current -> NULL valid_to
        to_np = np.append(valid_from[1:], -1)
        mask = np.zeros(len(starts), dtype=bool)
        if len(mask):
            mask[-1] = True
        to_arr = pa.array(
            np.ma.masked_array(to_np, mask=mask), pa.int64()
        )
        return pa.table(
            {
                key_col: pa.array(
                    [g[key_col][0].as_py()] * len(starts),
                    group[key_col].type,
                ),
                attr_col: pa.array(a[starts], pa.string()),
                "valid_from_us": pa.array(valid_from, pa.int64()),
                "valid_to_us": to_arr,
                "n_events": pa.array(
                    (ends - starts).astype(np.int64), pa.int64()
                ),
            }
        )

    def prefilter(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        return b.select([key_col, ts_col, id_col, attr_col]).filter(
            pc.is_valid(b[key_col])
        )

    return (
        events_ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(intervals, batch_format="pyarrow")
        .sort([key_col, "valid_from_us", attr_col])
    )


def ohlc_by_group(events_ds, group_col: str, ts_col: str, id_col: str,
                  val_col: str, bucket_us: int = 3_600_000_000):
    """OHLC downsampling — the candlestick aggregation every
    timeseries store ships: per (group, time bucket) the OPEN (value
    of the first event by (ts, id) — id breaks timestamp ties
    deterministically), HIGH, LOW, CLOSE (last event's value) and the
    event count.

    Values are micro-quantized to int64 BEFORE any aggregation
    (``round(v * 1e6, 0)`` half-towards-infinity — the repo's standard
    float-parity device), so min/max/first/last are pure integer
    selections both engines agree on bit-for-bit.

    Shape: one streaming pass emits per-batch per-(group, bucket)
    partials (first/last carry their (ts, id) argument key), then a
    single bounded sweep combines them — (group x bucket) cardinality
    is span-bounded model state, the repartition(1) + one-batch
    map_batches device that beats a keyed groupby on bounded tables.
    Returns ``(group, bucket, open_micro, high_micro, low_micro,
    close_micro, n_events)`` sorted by (group, bucket)."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        v = pc.cast(
            pc.round(
                pc.multiply(pc.cast(b[val_col], pa.float64()), 1e6),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        df = pd.DataFrame(
            {
                "g": b[group_col].to_pandas(),
                "bkt": pc.divide(ts, bucket_us).to_pandas(),
                "ts": ts.to_pandas(),
                "i": pc.cast(b[id_col], pa.int64()).to_pandas(),
                "v": v.to_pandas(),
            }
        ).sort_values(["g", "bkt", "ts", "i"], kind="mergesort")
        gb = df.groupby(["g", "bkt"], sort=False)
        head = gb.head(1).set_index(["g", "bkt"])
        tail = gb.tail(1).set_index(["g", "bkt"])
        agg = gb.agg(lo=("v", "min"), hi=("v", "max"), n=("v", "size"))
        out = agg.join(head[["ts", "i", "v"]].rename(
            columns={"ts": "f_ts", "i": "f_id", "v": "f_v"}
        )).join(tail[["ts", "i", "v"]].rename(
            columns={"ts": "l_ts", "i": "l_id", "v": "l_v"}
        )).reset_index()
        return pa.table(
            {
                "g": pa.array(out["g"], b[group_col].type),
                "bkt": pa.array(out["bkt"], pa.int64()),
                "lo": pa.array(out["lo"], pa.int64()),
                "hi": pa.array(out["hi"], pa.int64()),
                "n": pa.array(out["n"], pa.int64()),
                "f_ts": pa.array(out["f_ts"], pa.int64()),
                "f_id": pa.array(out["f_id"], pa.int64()),
                "f_v": pa.array(out["f_v"], pa.int64()),
                "l_ts": pa.array(out["l_ts"], pa.int64()),
                "l_id": pa.array(out["l_id"], pa.int64()),
                "l_v": pa.array(out["l_v"], pa.int64()),
            }
        )

    def combine(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        df = b.to_pandas()
        if len(df) == 0:
            return pa.table(
                {
                    group_col: pa.array([], b["g"].type),
                    "bucket": pa.array([], pa.int64()),
                    "open_micro": pa.array([], pa.int64()),
                    "high_micro": pa.array([], pa.int64()),
                    "low_micro": pa.array([], pa.int64()),
                    "close_micro": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                }
            )
        fdf = df.sort_values(["g", "bkt", "f_ts", "f_id"], kind="mergesort")
        opens = fdf.groupby(["g", "bkt"], sort=False)["f_v"].first()
        ldf = df.sort_values(["g", "bkt", "l_ts", "l_id"], kind="mergesort")
        closes = ldf.groupby(["g", "bkt"], sort=False)["l_v"].last()
        agg = df.groupby(["g", "bkt"]).agg(
            low_micro=("lo", "min"), high_micro=("hi", "max"),
            n_events=("n", "sum"),
        )
        out = agg.join(opens.rename("open_micro")).join(
            closes.rename("close_micro")
        ).reset_index().sort_values(["g", "bkt"], kind="mergesort")
        return pa.table(
            {
                group_col: pa.array(out["g"], b["g"].type),
                "bucket": pa.array(out["bkt"], pa.int64()),
                "open_micro": pa.array(out["open_micro"], pa.int64()),
                "high_micro": pa.array(out["high_micro"], pa.int64()),
                "low_micro": pa.array(out["low_micro"], pa.int64()),
                "close_micro": pa.array(out["close_micro"], pa.int64()),
                "n_events": pa.array(out["n_events"], pa.int64()),
            }
        )

    return (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
    )


def hourly_drawdown(events_ds, ts_col: str, type_col: str, val_col: str,
                    bucket_us: int = 3_600_000_000):
    """Maximum drawdown per type over the bucketed cumulative value
    series — the classic peak-to-trough risk metric: with cum(h) the
    running total of per-bucket value sums and runmax(h) its running
    maximum, drawdown(h) = runmax(h) - cum(h) and the answer is its
    maximum (ties -> FIRST bucket, the deterministic argmax).

    Values are micro-quantized to int64 per event before any sum (the
    standard parity device), so cum/runmax/drawdown are pure integer
    series both engines replay bit-for-bit via SQL window functions.

    Shape: per-batch (type, bucket) partials -> one bucket-cardinality
    groupby -> the span-bounded repartition(1) sweep (cumsum/cummax
    are C-side pandas). Returns ``(event_type, max_drawdown_micro,
    trough_bucket, n_buckets)`` sorted by type."""
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        v = pc.cast(
            pc.round(
                pc.multiply(pc.cast(b[val_col], pa.float64()), 1e6),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                "t": b[type_col],
                "bkt": pc.divide(ts, bucket_us),
                "v": v,
            }
        )
        return (
            t.group_by(["t", "bkt"])
            .aggregate([("v", "sum")])
            .rename_columns(["t", "bkt", "hv"])
        )

    from ray.data.aggregate import Sum

    hourly = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["t", "bkt"])
        .aggregate(Sum("hv", alias_name="hv"))
    )

    def sweep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        if b.num_rows == 0:
            return pa.table(
                {
                    "event_type": pa.array([], b["t"].type),
                    "max_drawdown_micro": pa.array([], pa.int64()),
                    "trough_bucket": pa.array([], pa.int64()),
                    "n_buckets": pa.array([], pa.int64()),
                }
            )
        df = b.to_pandas().sort_values(["t", "bkt"], kind="mergesort")
        g = df.groupby("t", sort=True)
        cum = g["hv"].cumsum()
        runmax = cum.groupby(df["t"], sort=False).cummax()
        df = df.assign(dd=(runmax - cum))
        # idxmax picks the FIRST max — rows are in bucket order, so
        # this is the (dd desc, bucket asc) argmax the SQL replays
        pick = df.loc[df.groupby("t", sort=True)["dd"].idxmax()]
        sizes = g.size()
        out = pd.DataFrame(
            {
                "event_type": pick["t"].to_numpy(),
                "max_drawdown_micro": pick["dd"].to_numpy("int64"),
                "trough_bucket": pick["bkt"].to_numpy("int64"),
                "n_buckets": sizes.loc[pick["t"]].to_numpy("int64"),
            }
        ).sort_values("event_type", kind="mergesort")
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        hourly.repartition(1)
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )


def interarrival_stats(events_ds, user_col: str, type_col: str,
                       ts_col: str, id_col: str,
                       num_buckets: int = 64):
    """Per-type inter-arrival statistics over each user's PER-TYPE
    event stream — the burstiness/cadence diagnostic (how often does
    a user click vs. purchase): for every (user, type) stream sorted
    by ``(ts, id)``, the gaps between consecutive events, aggregated
    per type to ``(n_gaps, sum_gap_us, avg_gap_us, min_gap_us,
    max_gap_us)``. Singleton streams contribute no gaps; a type whose
    every user has one event is absent (matching SQL ``lag``).

    The 100 TB shape — the round-5 wide-key lesson applied at design
    time: grouping by the COMPOSITE (user, type) key would sort-shuffle
    the whole stream (the 49 s pathology), so rows shuffle by
    ``user & (num_buckets-1)`` int bucket instead (exact: a user's
    rows land in one reducer) and the per-(user, type) sort/diff runs
    C-side inside the bucket group with one ``np.lexsort``. The bucket
    pass emits per-(bucket, type) PARTIALS, so the final shuffle is
    type-cardinality sized. avg is floor division (exact int64, both
    engines).
    """
    from ray.data.aggregate import Max, Min, Sum

    P = int(num_buckets)
    if P & (P - 1) or P <= 0:
        raise ValueError("num_buckets must be a power of two")

    def prefilter(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        # type nulls are dropped on BOTH engines (a null dictionary
        # index would poison the lexsort codes; SQL filters the same)
        m = pc.and_(
            pc.and_(pc.is_valid(b[user_col]), pc.is_valid(b[ts_col])),
            pc.is_valid(b[type_col]),
        )
        b = b.filter(m)
        return pa.table(
            {
                "_bkt": pc.bit_wise_and(
                    pc.cast(b[user_col], pa.int64()), P - 1
                ),
                "u": pc.cast(b[user_col], pa.int64()),
                "t": b[type_col],
                "ts": pc.cast(
                    pc.cast(b[ts_col], pa.timestamp("us")), pa.int64()
                ),
                "i": pc.cast(b[id_col], pa.int64()),
            }
        )

    def gaps(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "mn": pa.array([], pa.int64()),
                "mx": pa.array([], pa.int64()),
            }
        )
        if group.num_rows < 2:
            return empty
        tarr = group["t"].combine_chunks()
        if isinstance(tarr, pa.ChunkedArray):
            tarr = tarr.combine_chunks()
        tdict = tarr.dictionary_encode()
        tcode = np.asarray(tdict.indices, np.int64)
        u = group["u"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        iv = group["i"].to_numpy(zero_copy_only=False)
        order = np.lexsort((iv, ts, tcode, u))
        us, cs, tss = u[order], tcode[order], ts[order]
        same = (us[1:] == us[:-1]) & (cs[1:] == cs[:-1])
        if not same.any():
            return empty
        gap = (tss[1:] - tss[:-1])[same]
        code = cs[1:][same]
        k = len(tdict.dictionary)
        n = np.zeros(k, np.int64)
        s = np.zeros(k, np.int64)
        mn = np.full(k, np.iinfo(np.int64).max, np.int64)
        mx = np.full(k, np.iinfo(np.int64).min, np.int64)
        np.add.at(n, code, 1)
        np.add.at(s, code, gap)
        np.minimum.at(mn, code, gap)
        np.maximum.at(mx, code, gap)
        hit = n > 0
        return pa.table(
            {
                "event_type": tdict.dictionary.filter(pa.array(hit)),
                "n": pa.array(n[hit], pa.int64()),
                "s": pa.array(s[hit], pa.int64()),
                "mn": pa.array(mn[hit], pa.int64()),
                "mx": pa.array(mx[hit], pa.int64()),
            }
        )

    agg = (
        events_ds.map_batches(prefilter, batch_format="pyarrow")
        .groupby("_bkt")
        .map_groups(gaps, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n_gaps"),
            Sum("s", alias_name="sum_gap_us"),
            Min("mn", alias_name="min_gap_us"),
            Max("mx", alias_name="max_gap_us"),
        )
    )

    def finalize(b: pa.Table) -> pa.Table:
        n = pc.cast(b["n_gaps"], pa.int64())
        s = pc.cast(b["sum_gap_us"], pa.int64())
        return pa.table(
            {
                "event_type": b["event_type"],
                "n_gaps": n,
                "sum_gap_us": s,
                # gaps are >= 0 so arrow's truncate == floor == SQL //
                "avg_gap_us": pc.divide(s, n),
                "min_gap_us": pc.cast(b["min_gap_us"], pa.int64()),
                "max_gap_us": pc.cast(b["max_gap_us"], pa.int64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        "event_type"
    )


def ewma_by_group(events_ds, type_col: str, ts_col: str, val_col: str,
                  bucket_us: int = 3_600_000_000):
    """Integer EWMA (alpha = 1/2) per type over the bucketed value
    series: with v(h) the per-bucket micro-quantized value sum over
    OBSERVED buckets in order, s(1) = v(1) and
    s(h) = (s(h-1) + v(h)) // 2 — the halving recurrence keeps every
    step a single int64 add + floor division, so both engines replay
    the smoothed series bit-for-bit (no float alpha powers ever
    materialize; SQL replays via a recursive CTE bounded by the
    bucket span).

    Shape: per-batch (type, bucket) partials -> one bucket-cardinality
    groupby -> the span-bounded repartition(1) sweep (the recurrence
    itself is a tiny per-type Python loop over bucket counts, which
    the span bounds — the same contract as hourly_drawdown). Returns
    ``(event_type, bucket, value_micro, ewma_micro)`` sorted by
    (type, bucket)."""

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        v = pc.cast(
            pc.round(
                pc.multiply(pc.cast(b[val_col], pa.float64()), 1e6),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        t = pa.table(
            {"t": b[type_col], "bkt": pc.divide(ts, bucket_us), "v": v}
        )
        return (
            t.group_by(["t", "bkt"])
            .aggregate([("v", "sum")])
            .rename_columns(["t", "bkt", "bv"])
        )

    from ray.data.aggregate import Sum

    bucketed = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["t", "bkt"])
        .aggregate(Sum("bv", alias_name="bv"))
    )

    def sweep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        empty = pa.table({
            "event_type": pa.array([], pa.string()),
            "bucket": pa.array([], pa.int64()),
            "value_micro": pa.array([], pa.int64()),
            "ewma_micro": pa.array([], pa.int64()),
        })
        if b.num_rows == 0:
            return empty
        t = np.asarray(b["t"].to_pylist(), dtype=object)
        bkt = b["bkt"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = b["bv"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((bkt, t))
        t, bkt, v = t[order], bkt[order], v[order]
        s = np.empty(len(v), np.int64)
        prev_t = None
        for i in range(len(v)):
            if t[i] != prev_t:
                s[i] = v[i]
                prev_t = t[i]
            else:
                # floor division matches DuckDB // on int64
                s[i] = (s[i - 1] + v[i]) // 2
        return pa.table({
            "event_type": pa.array(list(t), pa.string()),
            "bucket": pa.array(bkt, pa.int64()),
            "value_micro": pa.array(v, pa.int64()),
            "ewma_micro": pa.array(s, pa.int64()),
        })

    return (
        bucketed.repartition(1)
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )


def activity_streaks(events_ds, user_col: str, ts_col: str,
                     day_us: int = 86_400_000_000,
                     n_buckets: int = 64):
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    days, aggregated to a histogram ``(streak_len, n_users)`` — the
    classic ``day - dense_rank`` island trick, fully replayable in SQL
    window functions.

    The wide (user, day) key never hits Ray's sort-shuffle: per-batch
    distinct (user, day) partials bucket by ``user & (n_buckets-1)``
    (an int key; a user's days all share its bucket, so the per-bucket
    pass sees every user whole), each bucket group deduplicates days
    and computes all its users' longest islands in one np.lexsort +
    boundary-diff sweep, and only (streak_len) partial counts shuffle
    — a histogram-sized final aggregate."""
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        b = b.filter(pc.and_(pc.is_valid(b[user_col]),
                             pc.is_valid(b[ts_col])))
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        u = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            np.asarray(ts).astype(np.int64) // day_us
        )
        pairs = np.unique(np.stack([u, day], axis=1), axis=0)
        return pa.table({
            "bucket": pa.array(
                np.bitwise_and(pairs[:, 0], n_buckets - 1), pa.int64()
            ),
            "u": pa.array(pairs[:, 0], pa.int64()),
            "day": pa.array(pairs[:, 1], pa.int64()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        u = g["u"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        # drop cross-batch duplicate (user, day) pairs
        keep = np.ones(len(u), bool)
        keep[1:] = (u[1:] != u[:-1]) | (day[1:] != day[:-1])
        u, day = u[keep], day[keep]
        if len(u) == 0:
            return pa.table({"streak_len": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        # island id = day - rank-within-user; same (u, island) ->
        # consecutive run. new island where user changes OR gap > 1
        new_run = np.ones(len(u), bool)
        new_run[1:] = (u[1:] != u[:-1]) | (day[1:] != day[:-1] + 1)
        run_id = np.cumsum(new_run) - 1
        run_len = np.bincount(run_id)
        run_user = u[new_run]
        # longest run per user (runs of one user are contiguous)
        first = np.ones(len(run_user), bool)
        first[1:] = run_user[1:] != run_user[:-1]
        user_grp = np.cumsum(first) - 1
        best = np.zeros(user_grp[-1] + 1, np.int64)
        np.maximum.at(best, user_grp, run_len)
        lens, counts = np.unique(best, return_counts=True)
        return pa.table({
            "streak_len": pa.array(lens, pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64()),
        })

    from ray.data.aggregate import Sum

    hist = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("streak_len")
        .aggregate(Sum("n", alias_name="n_users"))
    )
    return hist.map_batches(
        lambda b: pa.table({
            "streak_len": pc.cast(b["streak_len"], pa.int64()),
            "n_users": pc.cast(b["n_users"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("streak_len")


def topk_dense_by_group(events_ds, type_col: str, id_col: str,
                        val_col: str, k: int = 3):
    """All rows whose value is among each group's k largest DISTINCT
    values — ``dense_rank() <= k``, the ties-keep-everything variant
    of per-group top-k (micro-quantized so rank boundaries are exact
    integers on both engines).

    Distributive: each batch keeps only its local top-k distinct
    values per group (a superset of the global winners), the tiny
    (group, value) candidate table combines once, the k-th distinct
    value per group broadcasts back as the threshold of a streaming
    filter scan — the full stream is never shuffled. Returns
    ``(event_type, event_id, value_micro)`` sorted by
    (type, value desc, id)."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def micro(b: pa.Table) -> np.ndarray:
        return np.asarray(
            pc.cast(
                pc.round(
                    pc.multiply(pc.cast(b[val_col], pa.float64()), 1e6),
                    ndigits=0, round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
        )

    def cand_partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = pa.table({"t": b[type_col], "v": pa.array(micro(b))})
        t = t.group_by(["t", "v"]).aggregate([])
        # local top-k distinct per group
        import pandas as pd

        df = t.to_pandas()
        df = (
            df.sort_values(["t", "v"], ascending=[True, False])
            .groupby("t", sort=False).head(k)
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    # local candidates are <= k distinct values per (group, batch) —
    # tiny by construction, so they concat on the driver (no shuffle)
    ct = pa.concat_tables(
        list(
            events_ds.map_batches(cand_partial, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
    )
    if ct.num_rows == 0:
        return rd.from_arrow(pa.table({
            "event_type": pa.array([], pa.string()),
            "event_id": pa.array([], pa.int64()),
            "value_micro": pa.array([], pa.int64()),
        }))
    import pandas as pd

    cdf = (
        ct.to_pandas().drop_duplicates(["t", "v"])
        .sort_values(["t", "v"], ascending=[True, False])
    )
    thr = cdf.groupby("t", sort=False).head(k).groupby("t")["v"].min()
    thr_types = np.asarray(thr.index.to_numpy(), dtype=object)
    t_order = np.argsort(thr_types)
    thr_types = thr_types[t_order]
    thr_vals = thr.to_numpy("int64")[t_order]

    def keep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        v = micro(b)
        tt = np.asarray(b[type_col].to_pylist(), dtype=object)
        idx = np.clip(np.searchsorted(thr_types, tt), 0,
                      len(thr_types) - 1)
        ok = (thr_types[idx] == tt) & (v >= thr_vals[idx])
        b = b.filter(pa.array(ok))
        return pa.table({
            "event_type": b[type_col],
            "event_id": pc.cast(b[id_col], pa.int64()),
            "value_micro": pa.array(v[ok], pa.int64()),
        })

    return events_ds.map_batches(keep, batch_format="pyarrow").sort(
        ["event_type", "value_micro", "event_id"],
        descending=[False, True, False],
    )


def last_touch_attribution(events_ds, user_col: str, type_col: str,
                           ts_col: str, id_col: str, val_col: str,
                           target_type: str, n_buckets: int = 64):
    """Marketing-style last-touch attribution: each ``target_type``
    event is credited to the most recent PRECEDING event of any OTHER
    type in the same user's (ts, id)-ordered stream ('none' when the
    target is the user's first touch), aggregated per source type to
    ``(source_type, n_purchases, purchase_value_micro)``.

    The per-user ordered walk never hits Ray's sort-shuffle: rows
    bucket by ``user & (n_buckets-1)``, one np.lexsort per bucket
    group orders ALL its users' streams at once, a single
    maximum.accumulate forward-fills the last non-target index
    (user-boundary-checked), and only (source_type) partials shuffle
    — a type-cardinality final aggregate. SQL replays via
    ``last_value(... IGNORE NULLS) OVER (... ROWS BETWEEN UNBOUNDED
    PRECEDING AND 1 PRECEDING)``. Assumes one bucket's events fit one
    reducer (the sessionize contract; salt by time range first for
    hot buckets at extreme scale)."""
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")

    def prep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        b = b.filter(pc.and_(pc.is_valid(b[user_col]),
                             pc.is_valid(b[ts_col])))
        u = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = pc.cast(
            pc.round(
                pc.multiply(pc.cast(b[val_col], pa.float64()), 1e6),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({
            "bucket": pa.array(np.bitwise_and(u, n_buckets - 1),
                               pa.int64()),
            "u": pa.array(u, pa.int64()),
            "t": b[type_col],
            "ts": pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                          pa.int64()),
            "eid": pc.cast(b[id_col], pa.int64()),
            "vmic": v,
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        u = g["u"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        vmic = g["vmic"].to_numpy(zero_copy_only=False)
        types = np.asarray(g["t"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, vmic, types = u[order], vmic[order], types[order]
        is_src = types != target_type
        idx = np.arange(len(u))
        ff = np.maximum.accumulate(np.where(is_src, idx, -1))
        tgt = types == target_type
        src = np.full(tgt.sum(), "none", dtype=object)
        fft = ff[tgt]
        # a fill from another user's stream means "no touch yet"
        valid = (fft >= 0) & (u[fft] == u[tgt])
        src[valid] = types[fft[valid]]
        sv, inv = np.unique(src, return_inverse=True)
        n = np.zeros(len(sv), np.int64)
        s = np.zeros(len(sv), np.int64)
        np.add.at(n, inv, 1)
        np.add.at(s, inv, vmic[tgt])
        return pa.table({
            "source_type": pa.array(list(sv), pa.string()),
            "n": pa.array(n, pa.int64()),
            "s": pa.array(s, pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (
        events_ds.map_batches(prep, batch_format="pyarrow",
                              batch_size=None)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("source_type")
        .aggregate(Sum("n", alias_name="n_purchases"),
                   Sum("s", alias_name="purchase_value_micro"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "source_type": b["source_type"],
            "n_purchases": pc.cast(b["n_purchases"], pa.int64()),
            "purchase_value_micro": pc.cast(
                b["purchase_value_micro"], pa.int64()
            ),
        }),
        batch_format="pyarrow",
    ).sort("source_type")


def period_over_period(ds, ts_col: str, val_col: str,
                       bucket: str = "month"):
    """Period-over-period value deltas: per calendar bucket, the
    micro-quantized value sum, the previous bucket's sum (0 for the
    first), and the signed delta — the classic MoM growth report as
    three exact integers (the growth ratio is one client division).

    Per-batch bucket combiner -> bucket-cardinality groupby -> the
    span-bounded repartition(1) sweep for the lag. ``bucket`` is
    'month' or 'day' (calendar buckets; strftime parity with SQL).
    Returns ``(bucket, value_micro, prev_micro, delta_micro)``
    sorted."""
    if bucket not in ("month", "day"):
        raise ValueError("bucket must be 'month' or 'day'")
    np_unit = {"month": "datetime64[M]", "day": "datetime64[D]"}[bucket]

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ts = np.asarray(
            pc.cast(pc.cast(b[ts_col], pa.timestamp("us")), pa.int64())
        ).astype("datetime64[us]")
        key = ts.astype(np_unit).astype(str)
        v = np.asarray(
            pc.cast(
                pc.round(
                    pc.multiply(pc.cast(b[val_col], pa.float64()), 1e6),
                    ndigits=0, round_mode="half_towards_infinity",
                ),
                pa.int64(),
            )
        )
        u, inv = np.unique(key, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, v)
        return pa.table({
            "bucket": pa.array(u, pa.string()),
            "v": pa.array(s, pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("v", alias_name="v"))
    )

    def sweep(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({
                "bucket": pa.array([], pa.string()),
                "value_micro": pa.array([], pa.int64()),
                "prev_micro": pa.array([], pa.int64()),
                "delta_micro": pa.array([], pa.int64()),
            })
        key = np.asarray(b["bucket"].to_pylist(), dtype=object)
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(key)
        key, v = key[order], v[order]
        prev = np.concatenate([[0], v[:-1]])
        return pa.table({
            "bucket": pa.array(list(key), pa.string()),
            "value_micro": pa.array(v, pa.int64()),
            "prev_micro": pa.array(prev, pa.int64()),
            "delta_micro": pa.array(v - prev, pa.int64()),
        })

    return agg.repartition(1).map_batches(
        sweep, batch_format="pyarrow", batch_size=None
    )


def session_bounce_rate(events_ds, user_col: str, type_col: str,
                        ts_col: str, id_col: str,
                        gap_us: int = 1_800_000_000,
                        n_buckets: int = 64):
    """Per entry type (the first event of each session), how many
    sessions started there and how many BOUNCED (one-event sessions)
    — sessions split where the same user's (ts, id)-ordered gap
    exceeds ``gap_us`` (the sessionize_events rule). The bounce rate
    is one client division over two exact counts.

    Same shuffle discipline as last_touch_attribution: user&bucket
    grouping, one lexsort per bucket, session boundaries and sizes as
    boundary-diff numpy, only (entry_type) partials shuffle. SQL
    replays via the lag-gap flag + running-sum session id windows."""
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")

    def prep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        b = b.filter(pc.and_(pc.is_valid(b[user_col]),
                             pc.is_valid(b[ts_col])))
        u = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(np.bitwise_and(u, n_buckets - 1),
                               pa.int64()),
            "u": pa.array(u, pa.int64()),
            "t": b[type_col],
            "ts": pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                          pa.int64()),
            "eid": pc.cast(b[id_col], pa.int64()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        u = g["u"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        types = np.asarray(g["t"].to_pylist(), dtype=object)
        order = np.lexsort((eid, ts, u))
        u, ts, types = u[order], ts[order], types[order]
        new_s = np.ones(len(u), bool)
        new_s[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        sid = np.cumsum(new_s) - 1
        size = np.bincount(sid)
        entry = types[new_s]
        sv, inv = np.unique(entry, return_inverse=True)
        ns = np.zeros(len(sv), np.int64)
        nb = np.zeros(len(sv), np.int64)
        np.add.at(ns, inv, 1)
        np.add.at(nb, inv[size == 1], 1)
        return pa.table({
            "entry_type": pa.array(list(sv), pa.string()),
            "ns": pa.array(ns, pa.int64()),
            "nb": pa.array(nb, pa.int64()),
        })

    from ray.data.aggregate import Sum

    agg = (
        events_ds.map_batches(prep, batch_format="pyarrow",
                              batch_size=None)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .groupby("entry_type")
        .aggregate(Sum("ns", alias_name="n_sessions"),
                   Sum("nb", alias_name="n_bounces"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "entry_type": b["entry_type"],
            "n_sessions": pc.cast(b["n_sessions"], pa.int64()),
            "n_bounces": pc.cast(b["n_bounces"], pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("entry_type")


def latest_per_key(events_ds, key_col: str, ts_col: str, id_col: str,
                   type_col: str, val_col: str):
    """Latest-record-per-key dedup (the "current state" snapshot every
    CDC/upsert pipeline ends with): each key's most recent row by
    (ts, id) — ``row_number() OVER (PARTITION BY key ORDER BY ts
    DESC, id DESC) = 1``. Returns ``(key, ts_us, event_id, event_type,
    value_micro)`` sorted by key.

    Distributive argmax: every batch keeps one candidate row per key
    (a per-batch lexsort + boundary pick), so the only shuffle is the
    key-cardinality groupby of candidates; the final pick per group
    reuses the same kernel."""

    def pick(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        k = b["k"].to_numpy(zero_copy_only=False)
        ts = b["ts_us"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-eid, -ts, k))
        first = np.ones(len(k), bool)
        first[1:] = k[order][1:] != k[order][:-1]
        return b.take(pa.array(order[first]))

    def prep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        b = b.filter(pc.and_(pc.is_valid(b[key_col]),
                             pc.is_valid(b[ts_col])))
        v = pc.cast(
            pc.round(
                pc.multiply(pc.cast(b[val_col], pa.float64()), 1e6),
                ndigits=0, round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        t = pa.table({
            "k": pc.cast(b[key_col], pa.int64()),
            "ts_us": pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                             pa.int64()),
            "event_id": pc.cast(b[id_col], pa.int64()),
            "event_type": b[type_col],
            "value_micro": v,
        })
        return pick(t)

    return (
        events_ds.map_batches(prep, batch_format="pyarrow")
        .groupby("k")
        .map_groups(pick, batch_format="pyarrow")
        .sort("k")
    )


def max_concurrent_sessions(events_ds, user_col: str, ts_col: str,
                            id_col: str,
                            gap_us: int = 1_800_000_000,
                            n_buckets: int = 64):
    """Peak session concurrency per day — the sweep-line / interval-
    stabbing classic ("how many sessions were open at once?"):
    sessionize each user's stream (gap > ``gap_us``, the
    sessionize_events rule), turn every session ``[start, end]`` into
    a ``+1`` boundary at ``start`` and a ``-1`` at ``end + 1 µs``,
    and report, per day with at least one boundary, the maximum of
    the GLOBAL running sum evaluated after each distinct boundary
    timestamp (SQL: ``max(sum(d) OVER (ORDER BY t))`` per day).

    Distributed prefix sum without a global sort: session boundaries
    come out of the user&bucket session pass (one lexsort per bucket,
    the session_bounce_rate shuffle discipline); a per-DAY reducer
    sorts only its own boundaries and emits a 3-int partial
    ``(day, total_delta, max_prefix)``; the driver's cumulative sum
    over the day-cardinality partials anchors each day's offset —
    driver state is calendar-sized, never data-sized. Deltas at the
    same microsecond are summed before the running total, so
    intra-timestamp ordering can never matter.

    Returns a pandas DataFrame ``(day_idx, max_concurrent)`` sorted by
    ``day_idx`` (epoch days, ``t // 86_400_000_000``); all exact
    int64.
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    if gap_us <= 0:
        raise ValueError("gap_us must be positive")
    import pandas as pd

    DAY_US = 86_400_000_000

    def prep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        b = b.filter(pc.and_(pc.is_valid(b[user_col]),
                             pc.is_valid(b[ts_col])))
        u = b[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(pc.cast(b[ts_col], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        if len(ts) and ts.min() < 0:
            raise ValueError(
                "max_concurrent_sessions requires non-negative "
                "timestamps (epoch-day floor division)"
            )
        return pa.table({
            "bucket": pa.array(np.bitwise_and(u, n_buckets - 1),
                               pa.int64()),
            "u": pa.array(u, pa.int64()),
            "ts": pa.array(ts, pa.int64()),
            "eid": pc.cast(b[id_col], pa.int64()),
        })

    def boundaries(g: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        u = g["u"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["eid"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, u))
        u, ts = u[order], ts[order]
        new_s = np.ones(len(u), bool)
        new_s[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        starts = ts[new_s]
        # a session ends on the row BEFORE the next session start
        end_mask = np.roll(new_s, -1)
        if len(u):
            end_mask[-1] = True
        ends = ts[end_mask]
        t = np.concatenate([starts, ends + 1])
        d = np.concatenate([
            np.ones(len(starts), np.int64),
            np.full(len(ends), -1, np.int64),
        ])
        return pa.table({
            "day_idx": pa.array(t // DAY_US, pa.int64()),
            "t": pa.array(t, pa.int64()),
            "d": pa.array(d, pa.int64()),
        })

    def day_partial(g: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = g["t"].to_numpy(zero_copy_only=False)
        d = g["d"].to_numpy(zero_copy_only=False)
        order = np.argsort(t, kind="stable")
        t, d = t[order], d[order]
        # sum deltas per distinct timestamp, then prefix-sum
        uniq, start = np.unique(t, return_index=True)
        dd = np.add.reduceat(d, start)
        prefix = np.cumsum(dd, dtype=np.int64)
        return pa.table({
            "day_idx": g["day_idx"][:1],
            "total": pa.array([int(prefix[-1])], pa.int64()),
            "max_rel": pa.array([int(prefix.max())], pa.int64()),
        })

    parts = (
        events_ds.map_batches(prep, batch_format="pyarrow",
                              batch_size=None)
        .groupby("bucket")
        .map_groups(boundaries, batch_format="pyarrow")
        .groupby("day_idx")
        .map_groups(day_partial, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({
            "day_idx": pd.Series([], dtype="int64"),
            "max_concurrent": pd.Series([], dtype="int64"),
        })
    parts = parts.sort_values("day_idx").reset_index(drop=True)
    offset = parts["total"].cumsum().shift(1, fill_value=0)
    return pd.DataFrame({
        "day_idx": parts["day_idx"].astype("int64"),
        "max_concurrent": (offset + parts["max_rel"]).astype("int64"),
    })


def _markov_counts(events_ds, key_col: str, ts_col: str, id_col: str,
                   type_col: str):
    """Shared transition-count combiner behind markov_stationary /
    markov_entropy_rate: per-key ordered histories -> (src, dst, n)
    pandas counts + the sorted type list (both model-state-sized)."""
    from ray.data.aggregate import Sum

    def pairs(group: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        g = group.filter(pc.is_valid(group[type_col]))
        if len(g) < 2:
            return pa.table({
                "src": pa.array([], pa.string()),
                "dst": pa.array([], pa.string()),
            })
        idx = pc.sort_indices(
            g, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
        )
        t = pc.cast(g[type_col], pa.string()).take(idx).combine_chunks()
        return pa.table({"src": t.slice(0, len(t) - 1),
                         "dst": t.slice(1)})

    def combiner(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        return (
            batch.group_by(["src", "dst"])
            .aggregate([([], "count_all")])
            .rename_columns(["src", "dst", "n_part"])
        )

    valid = events_ds.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.and_(pc.is_valid(b[type_col]),
                        pc.is_valid(b[key_col])),
                pc.is_valid(b[ts_col]),
            )
        ),
        batch_format="pyarrow",
    )
    counts = (
        valid.groupby(key_col)
        .map_groups(pairs, batch_format="pyarrow")
        .map_batches(combiner, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    types_ds = valid.map_batches(
        lambda b: pa.table({
            "t": pc.unique(
                pc.cast(pc.drop_null(b[type_col]), pa.string())
            ),
        }),
        batch_format="pyarrow",
    ).groupby("t").count().to_pandas()
    types = sorted(types_ds["t"].tolist()) if len(types_ds) else []
    return counts, types


def markov_stationary(events_ds, key_col: str, ts_col: str, id_col: str,
                      type_col: str, iters: int = 3):
    """Iterated distribution of the first-order event-type Markov
    chain — where user journeys CONCENTRATE after ``iters`` hops, the
    long-run complement of :func:`event_transitions`' raw edge counts.

    Integer fixed point (the pagerank.py device): ``p_0 = 1e6`` per
    type; ``p_{t+1}(j) = Σ_i (p_t(i) · c_ij) // r_i`` with per-edge
    floor division (``c`` = transition counts, ``r_i`` = row totals) —
    exactly SQL-replayable as unrolled BIGINT/HUGEINT rounds. Types
    that never appear as a source keep no outgoing mass (their column
    still RECEIVES); mass lost to flooring simply decays — this is a
    ranking signal, not a normalized eigenvector.

    Shape: the data-sized work is the transition count (per-key
    histories meet one reducer, per-batch (src, dst) combiner); the
    |types|² count table is driver model state and the iteration runs
    in Python arbitrary-precision ints (no overflow at any count
    scale). Returns ``(event_type, p_micro)`` sorted by type.
    """
    import pandas as pd

    counts, types = _markov_counts(events_ds, key_col, ts_col, id_col,
                                   type_col)
    if not types:
        return pd.DataFrame({
            "event_type": pd.Series([], dtype="object"),
            "p_micro": pd.Series([], dtype="int64"),
        })
    c: dict = {}
    r: dict = {}
    for row in counts.itertuples():
        c[(row.src, row.dst)] = int(row.n)
        r[row.src] = r.get(row.src, 0) + int(row.n)
    p = {t: 1_000_000 for t in types}
    for _ in range(iters):
        nxt = {t: 0 for t in types}
        for (s, d), n in c.items():
            nxt[d] += (p[s] * n) // r[s]
        p = nxt
    return pd.DataFrame({
        "event_type": types,
        "p_micro": [p[t] for t in types],
    }).astype({"p_micro": "int64"})


def time_to_convert(events_ds, user_col: str, ts_col: str,
                    type_col: str, step_a: str, step_b: str,
                    n_buckets: int = 64):
    """Conversion latency between two funnel steps: for each user
    with at least one ``step_a`` event, the delta from their FIRST
    ``step_a`` to their first ``step_b`` at-or-after it — the
    time-to-convert distribution behind every funnel (funnel_counts
    reports WHO converts; this reports HOW FAST). Returns ONE row
    ``(n_with_first_step, n_converted, median_delta_us,
    p90_delta_us)``.

    Shape: user&bucket grouping (one vectorized pass per bucket, the
    session-family shuffle discipline) reduces each user to a single
    delta row (−1 = never converted); the quantile sweep is a
    user-cardinality single reducer (the pareto_deciles contract).
    Parity: deltas are exact int64 µs; the quantile index replicates
    DuckDB ``quantile_disc`` — the discrete inverse CDF, smallest
    value whose cumulative count reaches ``q·n`` — as the EXACT
    integer ``ceil(num·n/den) − 1`` (q shipped as a rational, no
    float index arithmetic at all).
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")

    def prep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(
            pc.and_(pc.is_valid(b[user_col]), pc.is_valid(b[ts_col])),
            pc.is_in(b[type_col],
                     value_set=pa.array([step_a, step_b], pa.string())),
        )
        t = b.filter(keep)
        u = t[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(np.bitwise_and(u, n_buckets - 1),
                               pa.int64()),
            "u": pa.array(u, pa.int64()),
            "ts": pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                          pa.int64()),
            "is_a": pc.cast(pc.equal(t[type_col], step_a), pa.int8()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        u = g["u"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False)
        isa = g["is_a"].to_numpy(zero_copy_only=False).astype(bool)
        deltas = []
        order = np.lexsort((ts, u))
        u, ts, isa = u[order], ts[order], isa[order]
        bounds = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[bounds[1:], len(u)]
        for s, e in zip(bounds.tolist(), ends.tolist()):
            ats = ts[s:e][isa[s:e]]
            if len(ats) == 0:
                continue
            ta = int(ats[0])
            bts = ts[s:e][(~isa[s:e]) & (ts[s:e] >= ta)]
            deltas.append(int(bts[0]) - ta if len(bts) else -1)
        return pa.table({"delta": pa.array(deltas, pa.int64())})

    def sweep(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        d = b["delta"].to_numpy(zero_copy_only=False)
        n_a = len(d)
        conv = np.sort(d[d >= 0])
        n_c = len(conv)

        def q(num: int, den: int) -> int:
            if n_c == 0:
                return -1
            idx = (num * n_c + den - 1) // den - 1  # ceil(q*n) - 1
            return int(conv[idx])

        return pa.table({
            "n_with_first_step": pa.array([n_a], pa.int64()),
            "n_converted": pa.array([n_c], pa.int64()),
            "median_delta_us": pa.array([q(1, 2)], pa.int64()),
            "p90_delta_us": pa.array([q(9, 10)], pa.int64()),
        })

    return (
        events_ds.map_batches(prep, batch_format="pyarrow",
                              batch_size=None)
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .repartition(1)
        .map_batches(sweep, batch_format="pyarrow", batch_size=None)
    )


def dau_mau_stickiness(events_ds, user_col: str, ts_col: str,
                       window_days: int = 30):
    """DAU / trailing-MAU stickiness per active day — the engagement
    ratio product dashboards track. EXACT distincts (the
    deliberate counterpart of the HLL path in
    ``sketch.hll_sliding_distinct``): the stream collapses to active
    (user, day) cells; each cell EXPLODES into the ≤ ``window_days``
    trailing windows it can serve (bounded fan-out: activity ×
    window, the cost the sketch version exists to avoid — both ship
    so the tradeoff is measurable); distinct-per-window is exact
    because a (user, day) cell is already deduplicated. Returns
    ``(day_idx, dau, mau, stickiness_micro)`` for days with ≥ 1
    event, sorted; stickiness is ONE division.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    from ray.data.aggregate import Sum

    DAY_US = 86_400_000_000

    def cells(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(pc.is_valid(b[user_col]), pc.is_valid(b[ts_col]))
        t = b.filter(keep)
        day = pc.divide(
            pc.cast(pc.cast(t[ts_col], pa.timestamp("us")), pa.int64()),
            DAY_US,
        )
        cell = pa.table({"u": t[user_col], "day": day})
        return (
            cell.group_by(["u", "day"]).aggregate([([], "count_all")])
            .rename_columns(["u", "day", "n"])
        )

    active = (
        events_ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["u", "day"])
        .count()
        .map_batches(lambda b: b.select(["u", "day"]),
                     batch_format="pyarrow")
        .materialize()
    )
    # the day set (calendar-sized) gates the explode: a cell serves
    # window W only if W is an ACTIVE day in [day, day + window - 1]
    days = sorted(v for v in (active.unique("day") or [])
                  if v is not None)
    import ray

    days_ref = ray.put(np.asarray(days, np.int64))

    def explode(b: pa.Table, _ref=days_ref) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        dv = ray.get(_ref)
        u = b["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["day"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(dv, d, side="left")
        hi = np.searchsorted(dv, d + window_days, side="left")
        counts = hi - lo
        total = int(counts.sum())
        if total == 0:
            return pa.table({
                "u": pa.array([], pa.int64()),
                "day_idx": pa.array([], pa.int64()),
                "mau_c": pa.array([], pa.int64()),
                "dau_c": pa.array([], pa.int64()),
            })
        # flat index trick: for row i, dv[lo[i] .. hi[i]) — fully
        # vectorized (no per-cell Python loop in the hot path)
        rep = np.repeat(np.arange(len(u)), counts)
        offs = np.arange(total) - np.repeat(
            np.cumsum(counts) - counts, counts)
        w = dv[lo[rep] + offs]
        return pa.table({
            "u": pa.array(u[rep], pa.int64()),
            "day_idx": pa.array(w, pa.int64()),
            "mau_c": pa.array(np.ones(total, np.int64)),
            "dau_c": pa.array((w == d[rep]).astype(np.int64)),
        })

    per_user_win = (
        active.map_batches(explode, batch_format="pyarrow")
        .groupby(["u", "day_idx"])
        .aggregate(Sum("mau_c", alias_name="m"),
                   Sum("dau_c", alias_name="dd"))
    )

    def shrink(b: pa.Table) -> pa.Table:
        # a user counts ONCE per window regardless of active days in it
        return pa.table({
            "day_idx": b["day_idx"],
            "mau_c": pa.array([1] * len(b), pa.int64()),
            "dau_c": pc.cast(pc.greater(b["dd"], 0), pa.int64()),
        })

    agg = (
        per_user_win.map_batches(shrink, batch_format="pyarrow")
        .groupby("day_idx")
        .aggregate(Sum("mau_c", alias_name="mau"),
                   Sum("dau_c", alias_name="dau"))
        .to_pandas()
    )
    import pandas as pd

    agg = agg.sort_values("day_idx").reset_index(drop=True)
    mau = agg["mau"].to_numpy(np.int64)
    dau = agg["dau"].to_numpy(np.int64)
    raw = pa.array(1e6 * (dau.astype(np.float64) / mau.astype(np.float64)),
                   pa.float64())
    st = pc.cast(
        pc.round(raw, ndigits=0, round_mode="half_towards_infinity"),
        pa.int64(),
    ).to_numpy(zero_copy_only=False)
    return pd.DataFrame({
        "day_idx": agg["day_idx"].to_numpy(np.int64),
        "dau": dau,
        "mau": mau,
        "stickiness_micro": st,
    })


def markov_entropy_rate(events_ds, key_col: str, ts_col: str,
                        id_col: str, type_col: str, iters: int = 3):
    """Entropy rate of the first-order event-type Markov chain —
    ``H = Σ_i π_i Σ_j P_ij · (-ln P_ij)`` with π the
    :func:`markov_stationary` integer distribution — one row
    ``(n_types, n_transitions, entropy_rate_micro)`` in micro-nats.
    The sequence-predictability diagnostic: near zero means journeys
    are deterministic templates (bot traffic / dedup-worthy
    boilerplate flows); high means genuinely mixed behavior.

    Parity: per-edge ``q = round(ln(n/tot)·1e6)`` micro-nats (the
    bigram-NLL device) over exact counts; the weighted sum runs the
    pagerank per-edge floor-division device
    ``(π_i · n_ij · (-q)) // tot_i`` in arbitrary-precision ints, so
    both engines agree bit-for-bit; one final ``// 1e6`` rescales
    π-micro × nat-micro back to micro-nats. Data-sized work is the
    shared transition combiner only."""
    import numpy as np

    counts, types = _markov_counts(events_ds, key_col, ts_col, id_col,
                                   type_col)
    out_schema = pa.schema([
        pa.field("n_types", pa.int64()),
        pa.field("n_transitions", pa.int64()),
        pa.field("entropy_rate_micro", pa.int64()),
    ])
    if not types or len(counts) == 0:
        return rd.from_arrow(out_schema.empty_table())
    c: dict = {}
    r: dict = {}
    for row in counts.itertuples():
        c[(row.src, row.dst)] = int(row.n)
        r[row.src] = r.get(row.src, 0) + int(row.n)
    p = {t: 1_000_000 for t in types}
    for _ in range(int(iters)):
        nxt = {t: 0 for t in types}
        for (s, d), n in c.items():
            nxt[d] += (p[s] * n) // r[s]
        p = nxt
    edges = list(c.items())
    n_arr = np.array([n for _, n in edges], np.float64)
    tot_arr = np.array([r[s] for (s, _), _ in edges], np.float64)
    q = pc.cast(
        pc.round(pa.array(np.log(n_arr / tot_arr) * 1e6), ndigits=0,
                 round_mode="half_towards_infinity"),
        pa.int64(),
    ).to_pylist()
    total = 0
    for ((s, _), n), qq in zip(edges, q):
        total += (p[s] * n * (-int(qq))) // r[s]
    return rd.from_arrow(pa.table({
        "n_types": pa.array([len(types)], pa.int64()),
        "n_transitions": pa.array([sum(c.values())], pa.int64()),
        "entropy_rate_micro": pa.array([total // 1_000_000],
                                       pa.int64()),
    }))


def _holt_recurrence(ys, upto: int, a_num: int, a_den: int,
                     b_num: int, b_den: int):
    """The shared integer Holt level/trend recurrence over
    ``ys[:upto]`` (init l1 = y1, b1 = y2 - y1; floor division ==
    Python ``//`` == the oracle's positive-mod emulation). Requires
    upto >= 2."""
    level = ys[0] * 1_000_000
    trend = (ys[1] - ys[0]) * 1_000_000
    for t_ in range(1, upto):
        prev = level
        level = (a_num * ys[t_] * 1_000_000
                 + (a_den - a_num) * (level + trend)) // a_den
        trend = (b_num * (level - prev)
                 + (b_den - b_num) * trend) // b_den
    return level, trend


def holt_forecast_by_type(events_ds, type_col: str, ts_col: str,
                          alpha=(1, 5), beta=(1, 10)):
    """Holt's linear (level + trend) exponential smoothing over each
    type's hourly count series, with an integer-exact recurrence —
    ``(event_type, n_hours, level_micro, trend_micro, forecast_1h,
    forecast_24h)`` sorted by type. The classic short-horizon volume
    forecast (capacity planning / anomaly baselines), made bit-exact
    across engines: with ``alpha = a/p``, ``beta = b/q``,

        l_t = fld(a·y_t·1e6 + (p−a)·(l_{t−1} + b_{t−1}), p)
        b_t = fld(b·(l_t − l_{t−1}) + (q−b)·b_{t−1}, q)

    where ``fld`` is FLOOR division (Python ``//``; the SQL replay
    emulates it with the positive-mod identity, since DuckDB ``//``
    truncates toward zero on negatives — probed, not assumed). Init:
    l₁ = y₁·1e6, b₁ = (y₂−y₁)·1e6; types with fewer than 2 active
    hours are dropped. Forecasts are l + h·b.

    Shape: the hourly count table is the only data-sized work
    (per-batch packed (type, hour) combiner + one groupby); the
    recurrence is inherently sequential, so it runs driver-side over
    the model-state-sized series (the markov/pagerank precedent) —
    in Python ints, matching the oracle's recursive CTE step for
    step."""
    import numpy as np
    from ray.data.aggregate import Sum

    a_num, a_den = int(alpha[0]), int(alpha[1])
    b_num, b_den = int(beta[0]), int(beta[1])
    if not (0 < a_num < a_den and 0 < b_num < b_den):
        raise ValueError("alpha and beta must be proper fractions")

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(pc.is_valid(batch[type_col]),
                       pc.is_valid(batch[ts_col]))
        t = batch.filter(keep)
        hr = pc.divide(pc.cast(t[ts_col], pa.int64()), 3_600_000_000)
        cells = pa.table({"t": pc.cast(t[type_col], pa.string()),
                          "hr": hr})
        return (
            cells.group_by(["t", "hr"])
            .aggregate([([], "count_all")])
            .rename_columns(["t", "hr", "y"])
        )

    hourly = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["t", "hr"])
        .aggregate(Sum("y", alias_name="y"))
        .to_pandas()
    )
    import ray.data as rd

    out_schema = pa.schema([
        pa.field("event_type", pa.string()),
        pa.field("n_hours", pa.int64()),
        pa.field("level_micro", pa.int64()),
        pa.field("trend_micro", pa.int64()),
        pa.field("forecast_1h", pa.int64()),
        pa.field("forecast_24h", pa.int64()),
    ])
    if len(hourly) == 0:
        return rd.from_arrow(out_schema.empty_table())
    rows = []
    for typ, g in hourly.groupby("t"):
        ys = [int(v) for v in
              g.sort_values("hr")["y"].tolist()]
        n = len(ys)
        if n < 2:
            continue
        level, trend = _holt_recurrence(ys, n, a_num, a_den, b_num,
                                        b_den)
        rows.append((str(typ), n, level, trend, level + trend,
                     level + 24 * trend))
    rows.sort(key=lambda r: r[0])
    return rd.from_arrow(pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_hours": pa.array([r[1] for r in rows], pa.int64()),
        "level_micro": pa.array([r[2] for r in rows], pa.int64()),
        "trend_micro": pa.array([r[3] for r in rows], pa.int64()),
        "forecast_1h": pa.array([r[4] for r in rows], pa.int64()),
        "forecast_24h": pa.array([r[5] for r in rows], pa.int64()),
    }))


def holt_backtest_by_type(events_ds, type_col: str, ts_col: str,
                          alpha=(1, 5), beta=(1, 10)):
    """One-step-holdout backtest of :func:`holt_forecast_by_type`:
    train the integer Holt recurrence on each type's first n−1 active
    hours, forecast one step, and score it against the held-out last
    hour — ``(event_type, n_hours, forecast_1h, actual_micro,
    err_micro, ape_micro)`` sorted by type. The eval that must
    accompany any forecast op: a model nobody backtests is a random
    number generator with confidence.

    Same hourly-count pass and shared :func:`_holt_recurrence`
    (types with fewer than 3 active hours are dropped — the holdout
    needs a 2-hour training prefix); the absolute-percentage error
    is one division + zero-digit round. "Next step" means the next
    ACTIVE hour in the series, exactly as the forecast op defines
    its horizon."""
    from ray.data.aggregate import Sum

    a_num, a_den = int(alpha[0]), int(alpha[1])
    b_num, b_den = int(beta[0]), int(beta[1])
    if not (0 < a_num < a_den and 0 < b_num < b_den):
        raise ValueError("alpha and beta must be proper fractions")

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(pc.is_valid(batch[type_col]),
                       pc.is_valid(batch[ts_col]))
        t = batch.filter(keep)
        hr = pc.divide(pc.cast(t[ts_col], pa.int64()), 3_600_000_000)
        cells = pa.table({"t": pc.cast(t[type_col], pa.string()),
                          "hr": hr})
        return (
            cells.group_by(["t", "hr"])
            .aggregate([([], "count_all")])
            .rename_columns(["t", "hr", "y"])
        )

    hourly = (
        events_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["t", "hr"])
        .aggregate(Sum("y", alias_name="y"))
        .to_pandas()
    )
    import ray.data as rd

    out_schema = pa.schema([
        pa.field("event_type", pa.string()),
        pa.field("n_hours", pa.int64()),
        pa.field("forecast_1h", pa.int64()),
        pa.field("actual_micro", pa.int64()),
        pa.field("err_micro", pa.int64()),
        pa.field("ape_micro", pa.int64()),
    ])
    if len(hourly) == 0:
        return rd.from_arrow(out_schema.empty_table())
    rows = []
    for typ, g in hourly.groupby("t"):
        ys = [int(v) for v in g.sort_values("hr")["y"].tolist()]
        n = len(ys)
        if n < 3 or ys[-1] == 0:
            continue
        level, trend = _holt_recurrence(ys, n - 1, a_num, a_den,
                                        b_num, b_den)
        fc = level + trend
        actual = ys[-1] * 1_000_000
        err = fc - actual
        ape = pc.cast(
            pc.round(pa.array(
                [1e6 * (float(abs(err)) / float(actual))],
                pa.float64()),
                ndigits=0, round_mode="half_towards_infinity"),
            pa.int64(),
        )[0].as_py()
        rows.append((str(typ), n, fc, actual, err, ape))
    rows.sort(key=lambda r: r[0])
    return rd.from_arrow(pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "n_hours": pa.array([r[1] for r in rows], pa.int64()),
        "forecast_1h": pa.array([r[2] for r in rows], pa.int64()),
        "actual_micro": pa.array([r[3] for r in rows], pa.int64()),
        "err_micro": pa.array([r[4] for r in rows], pa.int64()),
        "ape_micro": pa.array([r[5] for r in rows], pa.int64()),
    }))
