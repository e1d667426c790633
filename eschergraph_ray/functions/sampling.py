"""Deterministic hash-based sampling / splitting (training-data ops).

A 100-TB pipeline cannot sample with RNG state: membership must be a
pure function of the row's identity so that re-runs, retried tasks and
incremental additions agree, and so a DuckDB oracle can replay the
selection exactly. The device: the first 4 hex chars of
``md5(salt + id)`` compared against a threshold — 16 bits of uniform
hash, stable everywhere (Python hashlib and DuckDB ``md5()`` produce
identical digests), no shuffle, embarrassingly parallel.

Not in the reference (its corpora fit in one pickle); standard
training-data practice (hash-mod holdout splits). SQL replay:
``substr(md5(salt || CAST(id AS VARCHAR)), 1, 4) < '<thr>'``.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def fraction_to_hex_threshold(fraction: float) -> str:
    """Map a keep-fraction to the 4-hex-digit threshold. Granularity is
    1/65536; the actual kept fraction is ``int(fraction * 65536) /
    65536`` (document the rounding rather than hiding it)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    n = int(fraction * 65536)
    if n >= 65536:
        # comparison is LEXICOGRAPHIC (for SQL parity): "10000" would
        # sort before most 4-char hex buckets, so keep-everything needs
        # a sentinel that sorts after every hex digit
        return "g"
    return format(n, "04x")


def _bucket(value: str, salt: str) -> str:
    return hashlib.md5((salt + value).encode("utf-8")).hexdigest()[:4]


def hash_sample(ds, id_col: str, fraction: float, salt: str = "",
                invert: bool = False):
    """Keep rows whose hash bucket falls below the fraction threshold
    (``invert=True`` keeps the COMPLEMENT — the two calls partition the
    corpus exactly, e.g. benchmark split vs training corpus).
    Membership depends only on (salt, id): retries, resumes and other
    cluster sizes select the SAME rows. Per-batch filter, no state, no
    shuffle."""
    thr = fraction_to_hex_threshold(fraction)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        mask = pa.array(
            [(_bucket(str(i), salt) < thr) != invert for i in ids], pa.bool_()
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
):
    """Per-stratum deterministic sampling — the standard corpus-mixing
    op (e.g. keep 100% of low-resource languages, 10% of English).
    Same hash device as ``hash_sample`` but the threshold is looked up
    from the row's stratum, so each stratum is an independent uniform
    sample and membership is still a pure function of (salt, id):
    rebalancing the mix never reshuffles which rows a kept stratum
    contributes. Per-batch filter, no shuffle, no stratum-size skew
    (hot strata cost nothing extra — there is no groupby).

    SQL replay: ``substr(md5(salt || id), 1, 4) < CASE stratum
    WHEN ... THEN '<thr>' ... ELSE '<default_thr>' END``."""
    thrs = {k: fraction_to_hex_threshold(v) for k, v in fractions.items()}
    default_thr = fraction_to_hex_threshold(default_fraction)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        strata = batch[stratum_col].to_pylist()
        mask = pa.array(
            [
                _bucket(str(i), salt) < thrs.get(s, default_thr)
                for i, s in zip(ids, strata)
            ],
            pa.bool_(),
        )
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def add_split_column(ds, id_col: str, holdout_fraction: float, salt: str = "",
                     out_col: str = "split"):
    """Train/holdout split as a column (the standard eval-holdout op):
    ``holdout`` when the row's bucket is below the threshold, else
    ``train``. Same hash device as ``hash_sample``, so a row's split is
    immutable as the corpus grows — new data never reshuffles old
    assignments."""
    thr = fraction_to_hex_threshold(holdout_fraction)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        splits = [
            "holdout" if _bucket(str(i), salt) < thr else "train" for i in ids
        ]
        return batch.append_column(out_col, pa.array(splits, pa.string()))

    return ds.map_batches(tag, batch_format="pyarrow")


def per_group_topk_sample(ds, group_col: str, id_col: str, k: int = 3,
                          salt: str = ""):
    """Deterministic representative sampling: the ``k`` rows of each
    group with the smallest ``md5(salt || id)`` — a fixed-size
    per-stratum sample (inspection panels, eval slices, per-domain
    spot checks) whose membership is a pure function of (salt, id), so
    it is stable across retries, cluster sizes and corpus growth
    within a group. Returns ``(group_col, rank, id_col)`` with rank
    1..k by (hash, id).

    Skew-safe shape (same as the dashboard/events top-k): each BLOCK
    keeps its local top-k per group first, so the groupby merge sees
    at most #blocks × k rows per group — a hot stratum ("en" at 90%
    of the corpus) never lands in one reducer."""
    import hashlib as _hl

    import pandas as pd

    def add_rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g[[group_col, id_col]].copy()
        g["_h"] = [
            _hl.md5((salt + str(i)).encode("utf-8")).hexdigest()
            for i in g[id_col]
        ]
        return (
            g.sort_values(["_h", id_col])
            .groupby(group_col, sort=False)
            .head(k)
        )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", id_col]).head(k).reset_index(drop=True)
        g["rank"] = g.index + 1
        return g[[group_col, "rank", id_col]]

    return (
        ds.map_batches(add_rank, batch_format="pandas")
        .groupby(group_col)
        .map_groups(topk, batch_format="pandas")
    )


def select_token_budget(ds, id_col: str, score_col: str, tokens_col: str,
                        budget: int):
    """Budget-bounded corpus selection: admit rows in
    ``(score desc, id asc)`` order while the RUNNING token total stays
    within ``budget`` — the "best docs until N tokens" curation pass
    (SQL: ``sum(tokens) OVER (ORDER BY score DESC, id) <= budget``;
    once one row overflows, every later row is excluded too, since the
    running sum never decreases).

    Distributed construction (no global sort of rows): pass 1 reduces
    the corpus to a per-SCORE histogram of token totals —
    score-cardinality-sized, the micro-unit scores this repo emits are
    bounded — and the driver's cumsum over it finds the cutoff score:
    every strictly-better score is fully admitted, every strictly-worse
    fully excluded. Only the single BOUNDARY score's rows (a tie
    group) come back ``(id, tokens)`` to settle partial admission in
    id order. Pass 2 is a stateless broadcast filter. Scores and
    tokens must be integers (the parity discipline)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    if budget < 0:
        raise ValueError("budget must be >= 0")
    from ray.data.aggregate import Min

    hist = ds.groupby(score_col).aggregate(
        Sum(tokens_col), Min(tokens_col)
    ).to_pandas()
    # the running-sum-never-decreases contract (and hence the
    # prefix-cutoff construction) requires non-negative token counts;
    # a negative value would let the SQL running total dip back under
    # budget and re-admit later rows — fail loud instead
    if len(hist) and int(hist[f"min({tokens_col})"].min()) < 0:
        raise ValueError(
            "select_token_budget requires non-negative token counts "
            "(a negative value breaks the monotone running-sum cutoff)"
        )
    def empty_sel():
        return ds.map_batches(lambda b: b.slice(0, 0),
                              batch_format="pyarrow")

    if len(hist) == 0:
        return empty_sel()
    hist = hist.sort_values(score_col, ascending=False)
    scores = hist[score_col].to_numpy(np.int64)
    cum = hist[f"sum({tokens_col})"].to_numpy(np.int64).cumsum()
    # cumsum is monotone (tokens >= 0): the admitted PREFIX of tie
    # groups is exactly the ones whose cumulative total fits
    n_full = int((cum <= budget).sum())
    # all tie groups fit -> pure score filter, no boundary work
    if n_full == len(scores):
        lo = int(scores[-1])
        return ds.map_batches(
            lambda b: b.filter(pc.greater_equal(b[score_col], lo)),
            batch_format="pyarrow",
        )
    boundary_score = int(scores[n_full])
    prior = int(cum[n_full - 1]) if n_full else 0
    # the boundary tie group (bounded: one score value), settled in
    # id order on the driver
    btbl = ds.map_batches(
        lambda b: b.filter(pc.equal(b[score_col], boundary_score)),
        batch_format="pyarrow",
    ).select_columns([id_col, tokens_col]).to_pandas()
    btbl = btbl.sort_values(id_col)
    bcum = prior + btbl[tokens_col].to_numpy(np.int64).cumsum()
    admitted = btbl[id_col].to_numpy()[bcum <= budget]
    if n_full == 0 and len(admitted) == 0:
        return empty_sel()
    adm_sorted = np.sort(admitted)
    min_full = int(scores[n_full - 1]) if n_full else None
    adm_ref = ray.put(adm_sorted)

    def keep(batch: pa.Table) -> pa.Table:
        import numpy as _np
        import pyarrow.compute as pc

        adm = ray.get(adm_ref)
        s = batch[score_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mask = _np.zeros(len(batch), bool)
        if min_full is not None:
            mask |= s >= min_full
        if len(adm):
            pos = _np.searchsorted(adm, ids)
            hit = (pos < len(adm)) & (adm[_np.minimum(pos, len(adm) - 1)] == ids)
            mask |= (s == boundary_score) & hit
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample_ares(ds, id_col: str, weight_col: str, k: int = 100,
                         salt: str = "wrs"):
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis
    & Spirakis 2006 A-Res): item priority ``ln(u) / w`` with ``u`` a
    pure hash of (salt, id) — the top-``k`` by priority is an exact
    weighted sample, and membership is reproducible across retries,
    cluster sizes and engines (no RNG state, the hash_sample doctrine
    extended to weights). Returns ``(id_col, weight_col, pri_micro)``
    ranked (pri_micro desc, id asc).

    Parity device: ``u = (md5-48-bit + 0.5) / 2^48`` (never 0 or 1),
    priority quantized to integer micro units in ONE expression —
    ``round(1e6 * ln(u) / w, 0)`` — so the rank boundary is
    all-integer. Weights must be positive.

    Shape: priorities are per-row pure functions (no shuffle); each
    batch keeps only its local top-k, so the final sort sees at most
    #batches x k rows."""
    import hashlib

    import numpy as np
    import pyarrow.compute as pc

    if k < 1:
        raise ValueError("k must be >= 1")
    TWO48 = float(1 << 48)

    def pri(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ids = batch[id_col].to_pylist()
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        if len(w) and w.min() <= 0:
            raise ValueError("weights must be positive")
        v = np.fromiter(
            (
                int(
                    hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:12], 16
                )
                for i in ids
            ),
            dtype=np.float64,
            count=len(ids),
        )
        u = (v + 0.5) / TWO48
        p = pc.cast(
            pc.round(
                pa.array(1e6 * np.log(u) / w),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                id_col: batch[id_col],
                weight_col: batch[weight_col],
                "pri_micro": p,
            }
        )
        # local top-k: only #batches x k rows reach the global sort
        idx = pc.sort_indices(
            t,
            sort_keys=[("pri_micro", "descending"), (id_col, "ascending")],
        )
        return t.take(idx[:k])

    return (
        ds.map_batches(pri, batch_format="pyarrow")
        .sort(["pri_micro", id_col], descending=[True, False])
        .limit(k)
    )


def sampled_quantiles(ds, id_col: str, val_col: str, fraction: float,
                      salt: str = "", cents: int = 100,
                      ps: tuple = (0.0625, 0.25, 0.5, 0.75, 0.9375)):
    """Approximate corpus quantiles from a deterministic hash-mod
    sample — the sketch-shaped scale path for quantiles over columns
    whose full value histogram is too wide to exchange: sample
    ``fraction`` of rows by md5(salt+id) (membership replayable in
    SQL), quantize to integer cents, and invert the SAMPLE's exact CDF
    with the shared inverse-CDF rule (``histogram_percentiles``).

    ``ps`` must be binary-exact fractions (k/2^m) so ``p·n`` is the
    identical float on both engines. Returns ONE row:
    ``(n_sample, q<pppp>...)`` with pppp = p·10⁴ zero-padded; empty
    sample ⇒ zero rows (oracle pairs with ``HAVING count(*) > 0``).

    Shape: the per-batch hash filter drops (1-fraction) of rows before
    anything moves; the only exchange is the sample's value histogram
    (groupby(value).count), then one bounded sweep."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count

    from .textstats import histogram_percentiles

    names = [f"q{int(round(p * 10000)):04d}" for p in ps]
    out_schema = pa.schema(
        [("n_sample", pa.int64())] + [(nm, pa.int64()) for nm in names]
    )

    def quantize(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch[val_col]))
        v = pc.cast(
            pc.round(
                pc.multiply(pc.cast(t[val_col], pa.float64()),
                            float(cents)),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({"v": v})

    hist = (
        hash_sample(ds, id_col, fraction, salt)
        .map_batches(quantize, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Count(alias_name="cnt"))
        .materialize()
    )
    if hist.count() == 0:
        return rd.from_arrow(out_schema.empty_table())

    def sweep(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        if batch.num_rows == 0:
            return out_schema.empty_table()
        pairs = list(
            zip(
                pc.cast(batch["v"], pa.int64()).to_pylist(),
                pc.cast(batch["cnt"], pa.int64()).to_pylist(),
            )
        )
        picks = histogram_percentiles(pairs, ps)
        n = sum(c for _v, c in pairs)
        cols = {"n_sample": pa.array([n], pa.int64())}
        for nm, pick in zip(names, picks):
            cols[nm] = pa.array([pick], pa.int64())
        return pa.table(cols)

    return hist.repartition(1).map_batches(
        sweep, batch_format="pyarrow", batch_size=None
    )
