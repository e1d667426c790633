"""Text analysis operators: quality metrics, language-ID heuristic,
token counting, rolling-hash fingerprinting (winnowing).

Quality metrics are emitted as exact integer counts (not ratios) so the
DuckDB oracle comparison is float-free. Language-ID is an n-gram /
stopword-profile heuristic (rows-only check; unit-tested on known
samples). Fingerprinting follows the published winnowing scheme
(Schleimer et al. 2003): k-gram rolling hashes, per-window minimum.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ALPHA = re.compile(r"[A-Za-z]")
_PUNCT = re.compile(r"[^\w\s]")
_WORD = re.compile(r"[A-Za-z']+")

EN_STOP = {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for", "on", "with"}

_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "with", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"},
    "es": {"el", "la", "los", "las", "y", "es", "que", "de", "un", "una", "por"},
    "fr": {"le", "la", "les", "et", "est", "que", "des", "une", "dans", "pour"},
    "it": {"il", "la", "che", "di", "e", "un", "una", "per", "con", "sono"},
}


def quality_counts(ds, id_col: str, text_col: str):
    """Integer quality metrics per doc (length/punct/stopword family)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n_chars, n_alpha, n_punct, n_words, n_stop = [], [], [], [], []
        for t in texts:
            t = t or ""
            n_chars.append(len(t))
            n_alpha.append(len(_ALPHA.findall(t)))
            n_punct.append(len(_PUNCT.findall(t)))
            words = _WORD.findall(t.lower())
            n_words.append(len(words))
            n_stop.append(sum(1 for w in words if w in EN_STOP))
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_alpha": pa.array(n_alpha, pa.int64()),
                "n_punct": pa.array(n_punct, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_stopwords": pa.array(n_stop, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def detect_language(text: str) -> str:
    """Stopword-profile argmax; 'und' for undetermined."""
    words = set(_WORD.findall((text or "").lower()))
    best, best_score = "und", 0
    for lang in sorted(_LANG_PROFILES):
        score = len(words & _LANG_PROFILES[lang])
        if score > best_score:
            best, best_score = lang, score
    return best


def lang_id(ds, id_col: str, text_col: str):
    def f(batch: pa.Table) -> pa.Table:
        langs = [detect_language(t) for t in batch[text_col].to_pylist()]
        return pa.table({id_col: batch[id_col], "lang_pred": pa.array(langs, pa.string())})

    return ds.map_batches(f, batch_format="pyarrow")


def winnow_fingerprints(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowing fingerprints over character k-grams.

    k-gram hash = upper 8 bytes of md5, little-endian — byte-identical
    to DuckDB ``md5_number_lower(gram)``, so the SQL oracle can replay
    the whole winnowing selection (per-window first-min) from the raw
    text."""
    t = (text or "").lower()
    if len(t) < k:
        return []
    hashes = [
        int.from_bytes(hashlib.md5(t[i : i + k].encode()).digest()[8:16], "little")
        for i in range(len(t) - k + 1)
    ]
    if len(hashes) <= window:
        return [min(hashes)]
    h = np.array(hashes, dtype=np.uint64)
    # vectorized per-window first-min: argmin over the sliding window
    # view replaces the per-window Python loop. The selected index
    # sequence j is non-decreasing (a window's first-min either stays
    # in view or is replaced by a later element), so the original
    # "skip if same index as the previously EMITTED one" dedup is
    # exactly the consecutive-duplicate drop below.
    from numpy.lib.stride_tricks import sliding_window_view

    w = sliding_window_view(h, window)
    j = np.arange(len(h) - window + 1) + np.argmin(w, axis=1)
    keep = np.empty(len(j), bool)
    keep[0] = True
    keep[1:] = j[1:] != j[:-1]
    return [int(x) for x in h[j[keep]]]


def fingerprint_docs(ds, id_col: str, text_col: str, k: int = 5, window: int = 4):
    """Per-doc winnowing fingerprint set (count + min/max as scalars)."""

    def f(batch: pa.Table) -> pa.Table:
        n, mn = [], []
        for t in batch[text_col].to_pylist():
            fp = winnow_fingerprints(t, k, window)
            n.append(len(fp))
            mn.append(min(fp) - (1 << 63) if fp else None)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_fingerprints": pa.array(n, pa.int64()),
                "min_fingerprint": pa.array(mn, pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def fingerprint_near_pairs(ds, id_col: str, text_col: str, k: int = 5,
                           window: int = 4, min_common: int = 5,
                           min_overlap: float = 0.5, df_cutoff: int = 256):
    """MOSS-style copy detection over winnowing fingerprints
    (Schleimer et al. 2003 §4): explode per-doc fingerprint sets ->
    df-filter fingerprints (df >= 2 AND df <= ``df_cutoff``; most
    winnowing fps are df=1 noise and hot ones are template boilerplate,
    exactly ngram_jaccard_pairs' hot-gram cut) -> SELF-JOIN on the
    fingerprint for pair fan-out -> shared-fp counts per pair via the
    int-bucket combine -> join per-doc set sizes back by id ->
    overlap coefficient n_common / min(n_a, n_b). Fully distributed;
    same join infrastructure as the other near-dup verifiers.

    ``df_cutoff`` matters more here than for word n-grams: 5-char-gram
    winnowing fingerprints recur across template-heavy corpora, and a
    boilerplate fingerprint shared by df docs costs O(df^2) pairs in
    its reducer. A fingerprint present in >256 documents is template
    noise, not copy evidence (MOSS makes the same exclusion for
    over-shared fingerprints)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from .dedup import (
        _attach_payload,
        _empty_pairs_table,
        _nonempty_pairs,
        _pinned_payload,
    )

    def explode(batch: pa.Table) -> pa.Table:
        # fp - 2^63 exactly, for ALL uint64 values: flip the top bit
        # and reinterpret (an astype+subtract pair wraps for fp >= 2^63)
        per_doc = [
            (np.unique(
                np.asarray(winnow_fingerprints(t, k, window), np.uint64)
            ) ^ np.uint64(1 << 63)).view(np.int64)
            for t in batch[text_col].to_pylist()
        ]
        counts = np.array([len(f) for f in per_doc], np.int64)
        idx = np.repeat(np.arange(len(per_doc), dtype=np.int64), counts)
        ids_arr = batch[id_col].combine_chunks()
        return pa.table(
            {
                id_col: ids_arr.take(pa.array(idx)),
                "fp": pa.array(
                    np.concatenate(per_doc) if per_doc else
                    np.array([], np.int64),
                    pa.int64(),
                ),
            }
        )

    # materialized ONCE: consumed by both the sizes groupby and the
    # pair groupby — without the pin the md5 fingerprinting pass (the
    # compute-heavy stage) re-executes per consumer
    fps = ds.map_batches(explode, batch_format="pyarrow").materialize()
    # pinned + coalesced: consumed by two joins (see _pinned_payload)
    sizes = _pinned_payload(fps.groupby(id_col).aggregate(Count(alias_name="n_fp")))

    # pair generation as a df-filtered SELF-JOIN on the fingerprint
    # (the cooccurrence_pmi device) instead of groupby(fp).map_groups:
    # winnowing fps are mostly df=1, so millions of one-row groups pay
    # pure per-group Python overhead for zero pairs. df >= 2 keeps only
    # pair-producing fps; df <= df_cutoff is the same hot-template cut
    # the per-group path applied (group size == df: per-doc fps are
    # distinct by construction).
    from .dedup import DEFAULT_JOIN_PARTITIONS

    P = DEFAULT_JOIN_PARTITIONS
    dfs = fps.groupby("fp").aggregate(Count(alias_name="df"))
    ok = dfs.map_batches(
        lambda b: b.filter(
            pc.and_(pc.greater_equal(b["df"], 2),
                    pc.less_equal(b["df"], df_cutoff))
        ).select(["fp"]),
        batch_format="pyarrow",
    ).materialize()
    if ok.count() == 0:
        import ray.data as rd

        id_type = ds.schema().base_schema.field(id_col).type
        return rd.from_arrow(_empty_pairs_table(id_type, "overlap"))
    elig = (
        fps.repartition(P)
        .join(ok.repartition(P), join_type="left_semi",
              num_partitions=P, on=("fp",))
        .repartition(P)
        .materialize()
    )

    def as_side(out: str):
        return elig.map_batches(
            lambda b, o=out: b.select(["fp", id_col]).rename_columns(
                ["fp", o]
            ),
            batch_format="pyarrow",
        )

    # shared-fp counts per pair via the int-bucket combine (see
    # dedup._pair_counts_bucketed: a native groupby over the
    # (string, string) pair key re-shuffles the whole quadratic
    # fan-out — measured 49 s native vs 0.8 s bucketed at sf0.1)
    from .dedup import _pair_counts_bucketed

    raw_pairs = (
        as_side("id_a")
        .join(as_side("id_b"), join_type="inner",
              num_partitions=P, on=("fp",))
        .map_batches(
            lambda b: b.filter(pc.less(b["id_a"], b["id_b"])).select(
                ["id_a", "id_b"]
            ),
            batch_format="pyarrow",
        )
    )
    inter = _pair_counts_bucketed(raw_pairs).map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_common"], min_common)),
        batch_format="pyarrow",
    )
    inter = _nonempty_pairs(inter)
    if inter is None:
        import ray.data as rd

        id_type = ds.schema().base_schema.field(id_col).type
        return rd.from_arrow(_empty_pairs_table(id_type, "overlap"))
    j1 = _attach_payload(inter, sizes, "id_a", id_col, "n_fp", "n_a")
    j2 = _attach_payload(j1, sizes, "id_b", id_col, "n_fp", "n_b")

    def overlap(batch: pa.Table) -> pa.Table:
        denom = pc.min_element_wise(batch["n_a"], batch["n_b"])
        ov = pc.divide(
            pc.cast(batch["n_common"], pa.float64()), pc.cast(denom, pa.float64())
        )
        out = pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "n_common": batch["n_common"],
                "overlap": pc.round(ov, 6, round_mode="half_towards_infinity"),
            }
        )
        return out.filter(pc.greater_equal(ov, min_overlap))

    return j2.map_batches(overlap, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# PII-style redaction (training-data scrubbing)
# ---------------------------------------------------------------------------

# RE2 patterns (pyarrow.compute and DuckDB both run RE2, so the SQL
# oracle's regexp_replace(..., 'g') replays these byte-identically).
# Order matters: PHONE before NUM, or a phone's digit runs are eaten
# by the weaker pattern first.
REDACT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d[\d\- ]{6,}\d", "<PHONE>"),
    ("num", r"\d{6,}", "<NUM>"),
)


def redact_text(ds, text_col: str, out_col: str = "redacted",
                patterns=REDACT_PATTERNS):
    """Vectorized PII-style scrubbing: sequential
    ``pc.replace_substring_regex`` passes over the column, plus an
    integer match count per pattern (``n_<name>`` columns, counted
    BEFORE replacement so the numbers describe the original text).
    Pure per-batch compute — no state, no shuffle, kernels in C."""
    import pyarrow.compute as pc

    def scrub(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        for name, pat, _repl in patterns:
            batch = batch.append_column(
                f"n_{name}",
                pc.cast(pc.count_substring_regex(col, pat), pa.int64()),
            )
        red = col
        for _name, pat, repl in patterns:
            red = pc.replace_substring_regex(red, pat, repl)
        return batch.append_column(out_col, red)

    return ds.map_batches(scrub, batch_format="pyarrow")


def synthetic_pii_documents(n: int = 40, seed: int = 42) -> pa.Table:
    """Deterministic corpus with planted emails / phone numbers / long
    ids among filler words — redaction must find every plant and leave
    the rest byte-identical."""
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "omega", "sigma", "kappa"]
    rows = []
    for i in range(n):
        parts = [words[int(j)] for j in rng.integers(0, len(words), size=8)]
        if i % 2 == 0:
            parts.insert(3, f"user{i}@example{i % 7}.com")
        if i % 3 == 0:
            parts.insert(5, f"+1 {200 + i}-555-{1000 + i}")
        if i % 5 == 0:
            parts.insert(1, f"{10 ** 8 + i * 977}")
        rows.append({"row_id": f"d{i:04d}", "text": " ".join(parts)})
    return pa.Table.from_pylist(
        rows, schema=pa.schema([("row_id", pa.string()), ("text", pa.string())])
    )


# ---------------------------------------------------------------------------
# Within-document repetition (Gopher-style quality rule)
# ---------------------------------------------------------------------------

_REP_WORD = re.compile(r"[a-z]+")


def repetition_counts(ds, id_col: str, text_col: str):
    """Within-doc repetition metrics (the Gopher corpus rules, Rae et
    al. 2021 §A1.1: documents dominated by repeated n-grams are
    filtered before training): per doc, total and DISTINCT token and
    bigram counts, as exact integers so the SQL oracle is float-free
    (consumers derive dup fractions). Distinct-per-row forces a per-row
    kernel (a columnar distinct-within-list needs the token lists
    materialized anyway); the compiled regex is module-cached and the
    stage is embarrassingly parallel."""

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        n_tok, n_dtok, n_big, n_dbig = [], [], [], []
        for t in batch[text_col].to_pylist():
            toks = _REP_WORD.findall((t or "").lower())
            bigrams = list(zip(toks, toks[1:]))
            n_tok.append(len(toks))
            n_dtok.append(len(set(toks)))
            n_big.append(len(bigrams))
            n_dbig.append(len(set(bigrams)))
        return pa.table(
            {
                id_col: ids,
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_distinct_tokens": pa.array(n_dtok, pa.int64()),
                "n_bigrams": pa.array(n_big, pa.int64()),
                "n_distinct_bigrams": pa.array(n_dbig, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Distributed exact percentiles via bounded histogram
# ---------------------------------------------------------------------------


def histogram_percentiles(hist: list[tuple[int, int]], ps: tuple[float, ...]):
    """Exact discrete percentiles from a (value, count) histogram:
    the smallest value whose cumulative count reaches ``p * n`` — the
    classic inverse-CDF / SQL ``quantile_disc`` rule (probed against
    DuckDB 1.0 across boundary cases). Call with BINARY-EXACT p values
    (0.25, 0.5, 0.75, ...) so ``p * n`` has no float ambiguity at exact
    multiples."""
    hist = sorted(hist)
    n = sum(c for _v, c in hist)
    out = []
    for p in ps:
        target = p * n
        cum = 0
        pick = hist[-1][0] if hist else None
        for v, c in hist:
            cum += c
            if cum >= target:
                pick = v
                break
        out.append(pick)
    return out


def grouped_int_percentiles(
    ds, group_col: str, col: str, ps: tuple[float, ...] = (0.25, 0.5, 0.75)
):
    """Per-group exact percentiles of a bounded-cardinality integer
    column — the grouped counterpart of ``int_column_percentiles``,
    with NO driver step at all: shuffle 1 builds the per-(group, value)
    histogram (moves counts, not rows), shuffle 2 regroups the tiny
    histogram by group and inverts each CDF inside ``map_groups``.
    Null values are dropped first (matching SQL aggregate semantics, so
    a ``quantile_disc ... GROUP BY`` oracle replays exactly). Output:
    one row per group — (group_col, p<25>, p<50>, ..., n).

    Scale: a hot group costs its value-cardinality (histogram rows),
    never its row count; the per-group inversion is O(cardinality)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    def drop_nulls(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch[col]))

    hist = (
        ds.map_batches(drop_nulls, batch_format="pyarrow")
        .groupby([group_col, col])
        .aggregate(Count(alias_name="cnt"))
    )

    p_names = [f"p{int(p * 100)}" for p in ps]

    def per_group(g: pa.Table) -> pa.Table:
        pairs = list(zip(g[col].to_pylist(), g["cnt"].to_pylist()))
        picks = histogram_percentiles(pairs, ps)
        row = {group_col: [g[group_col][0].as_py()]}
        for name, pick in zip(p_names, picks):
            row[name] = pa.array([pick], pa.int64())
        row["n"] = pa.array([sum(c for _v, c in pairs)], pa.int64())
        return pa.table(row)

    return hist.groupby(group_col).map_groups(per_group, batch_format="pyarrow")


def int_column_percentiles(ds, col: str, ps: tuple[float, ...] = (0.25, 0.5, 0.75)):
    """Distributed exact percentiles of a bounded-cardinality integer
    column: groupby(value).count() is the ONLY shuffle (the histogram —
    thousands of rows at most — not the data) and the driver inverts
    the tiny CDF. The sketch-free exact path; for unbounded/continuous
    columns you'd swap in a t-digest, same dataflow shape."""
    from ray.data.aggregate import Count

    hist_rows = ds.groupby(col).aggregate(Count(alias_name="cnt")).take_all()
    # drop the null group: None is not a value and cannot sort/compare
    hist = [(r[col], r["cnt"]) for r in hist_rows if r[col] is not None]
    return histogram_percentiles(hist, ps), sum(c for _v, c in hist)


def curation_verdict(
    ds,
    id_col: str,
    text_col: str,
    min_words: int = 10,
    max_words: int = 100_000,
):
    """The composed keep/drop gate a curation pipeline actually ships
    (Gopher-style rule stack, Rae et al. 2021 §A1.1): length, alphabetic
    ratio, stopword presence, type-token repetition and language-id
    evaluated TOGETHER in one streaming pass — one tokenization per
    document feeds every rule, where running the individual signal
    queries would re-read the corpus five times.

    Every rule is an INTEGER comparison (ratios are cross-multiplied:
    ``5*n_alpha >= 3*n_chars`` is alpha-ratio >= 0.6 with no float in
    either engine), so the whole verdict table is exact-hashable:

      len_ok   min_words <= n_words <= max_words     (_WORD grammar)
      alpha_ok 5*n_alpha >= 3*n_chars                (>= 60% alphabetic)
      stop_ok  50*n_stopwords >= n_words             (>= 2% stopwords)
      rep_ok   10*n_distinct >= 3*n_tokens           (TTR >= 0.3, _REP_WORD)
      lang_ok  stopword-profile argmax == 'en'
      keep     AND of all five

    Returns ``(id_col, len_ok, alpha_ok, stop_ok, rep_ok, lang_ok,
    keep)`` as int64 0/1 — one row per document, so the drop REASONS
    survive for auditing (filtering is then a trivial keep == 1)."""

    def verdict(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        cols: dict[str, list[int]] = {
            k: [] for k in ("len_ok", "alpha_ok", "stop_ok", "rep_ok", "lang_ok", "keep")
        }
        for t in batch[text_col].to_pylist():
            t = t or ""
            low = t.lower()
            n_chars = len(t)
            n_alpha = len(_ALPHA.findall(t))
            words = _WORD.findall(low)
            n_words = len(words)
            n_stop = sum(1 for w in words if w in EN_STOP)
            toks = _REP_WORD.findall(low)
            len_ok = int(min_words <= n_words <= max_words)
            alpha_ok = int(5 * n_alpha >= 3 * n_chars)
            stop_ok = int(50 * n_stop >= n_words)
            rep_ok = int(10 * len(set(toks)) >= 3 * len(toks))
            lang_ok = int(detect_language(t) == "en")
            cols["len_ok"].append(len_ok)
            cols["alpha_ok"].append(alpha_ok)
            cols["stop_ok"].append(stop_ok)
            cols["rep_ok"].append(rep_ok)
            cols["lang_ok"].append(lang_ok)
            cols["keep"].append(len_ok & alpha_ok & stop_ok & rep_ok & lang_ok)
        out = {id_col: ids}
        out.update({k: pa.array(v, pa.int64()) for k, v in cols.items()})
        return pa.table(out)

    return ds.map_batches(verdict, batch_format="pyarrow")


def normalize_text(ds, id_col: str, text_col: str,
                   out_col: str = "text_norm"):
    """C4-style text normalization as a single zero-copy Arrow kernel
    chain — whitespace-collapse, trim, lowercase, Unicode NFC — the
    canonical first pass of a cleaning pipeline (and the normalization
    every hash-based dedup in this repo assumes). The ws/trim/lower
    steps are pure Arrow kernels (``replace_substring_regex`` is RE2,
    byte-identical to DuckDB's regexp_replace 'g'); NFC goes through
    ``unicodedata`` ONLY for rows a vectorized regex flags as
    non-ASCII (pyarrow's ``utf8_normalize`` is broken in this build —
    it emits decomposed output for every requested form — and ASCII
    text, the overwhelming majority of an English corpus, is NFC by
    definition). Emits the normalized text plus its length so
    downstream length filters need no second pass."""
    import pyarrow.compute as pc

    def norm(batch: pa.Table) -> pa.Table:
        import unicodedata

        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = pc.utf8_lower(
            pc.utf8_trim_whitespace(
                pc.replace_substring_regex(batch[text_col], r"\s+", " ")
            )
        )
        non_ascii = pc.match_substring_regex(t, r"[^\x00-\x7F]")
        if pc.any(non_ascii).as_py():
            vals = t.to_pylist()
            fix = non_ascii.to_pylist() if hasattr(non_ascii, "to_pylist") else list(non_ascii)
            t = pa.array(
                [
                    unicodedata.normalize("NFC", v) if (f and v is not None) else v
                    for v, f in zip(vals, fix)
                ],
                pa.string(),
            )
        return pa.table(
            {
                id_col: batch[id_col],
                out_col: t,
                "n_chars_norm": pc.cast(pc.utf8_length(t), pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Token-distribution entropy (vocabulary-diversity quality signal)
# ---------------------------------------------------------------------------

_LOG2_MEMO: dict[int, float] = {}


def _log2_int(n: int) -> float:
    """math.log2 (one libm call — DuckDB's log2 is the same libm, so
    values are bit-identical; numpy's SIMD np.log2 is NOT guaranteed
    to be) with a memo over the small-int counts that dominate."""
    import math

    v = _LOG2_MEMO.get(n)
    if v is None:
        v = _LOG2_MEMO[n] = math.log2(n)
    return v


def token_entropy(ds, id_col: str, text_col: str):
    """Per-document Shannon entropy of the token distribution — the
    vocabulary-diversity quality signal (low entropy = boilerplate /
    keyword-stuffed / repetitive text; complements the Gopher
    repetition integers above). Tokens are the same ``[a-z]+`` lowered
    words the repetition rule uses.

    Float-parity device (the round-4 int-micro-unit discipline): each
    per-term value c*log2(c) is quantized to an int64 micro-unit with
    ONE identical op chain on both engines (int->double multiply chain
    + round-half-towards-infinity), summed exactly in int64, and the
    final entropy h_micro = (log2(n) - (S/1e6)/n) * 1e6 is again a
    single identical expression. log2 comes from libm on both sides
    (math.log2 here, never numpy's SIMD log2).

    Emits (id, n_tokens, n_distinct, s_micro, h_micro); documents with
    zero tokens are dropped (the SQL unnest path drops them too)."""
    import numpy as np

    from ..stages.chunking import pin_arrow_threads

    def stats(batch: pa.Table) -> pa.Table:
        pin_arrow_threads()
        ids, n_tok, n_dis, offsets, flat = [], [], [], [0], []
        for i, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            toks = _REP_WORD.findall((t or "").lower())
            if not toks:
                continue
            counts = {}
            for tok in toks:
                counts[tok] = counts.get(tok, 0) + 1
            ids.append(i)
            n_tok.append(len(toks))
            n_dis.append(len(counts))
            flat.extend(counts.values())
            offsets.append(len(flat))
        if not ids:
            return pa.table(
                {
                    id_col: pa.array([], batch[id_col].type),
                    "n_tokens": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "s_micro": pa.array([], pa.int64()),
                    "h_micro": pa.array([], pa.int64()),
                }
            )
        c = np.asarray(flat, dtype=np.int64)
        u, inv = np.unique(c, return_inverse=True)
        l2 = np.array([_log2_int(int(v)) for v in u], np.float64)[inv]
        term = c.astype(np.float64) * l2 * 1e6  # same order as the SQL
        s_terms = np.asarray(
            pc.round(pa.array(term), ndigits=0,
                     round_mode="half_towards_infinity")
        ).astype(np.int64)
        s = np.add.reduceat(s_terms, offsets[:-1])
        n = np.asarray(n_tok, np.int64)
        log2n = np.array([_log2_int(int(v)) for v in n], np.float64)
        h = (log2n - (s / 1e6) / n) * 1e6
        h_micro = np.asarray(
            pc.round(pa.array(h), ndigits=0,
                     round_mode="half_towards_infinity")
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "n_tokens": pa.array(n, pa.int64()),
                "n_distinct": pa.array(n_dis, pa.int64()),
                "s_micro": pa.array(s, pa.int64()),
                "h_micro": pa.array(h_micro, pa.int64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def gini_concentration(ds, key_col: str):
    """Gini coefficient of the per-key activity distribution — the
    standard concentration/imbalance diagnostic (is 90% of the corpus
    from 1% of sources / users?). Returns a one-row table
    ``(n_keys, total, gini_micro)`` with
    ``gini = (2*S - (n+1)*T) / (n*T)``, ``S`` the rank-weighted sum
    over counts sorted ascending — numerator and denominator are EXACT
    int64, so the only float step is one division + zero-digit round
    (micro units). Tie order among equal counts cannot change S (a
    run of equal x contributes x * sum(consecutive ranks) regardless
    of permutation), so the SQL row_number replay agrees bit-for-bit.

    Shape: one groupby to key-cardinality counts, one sort of the
    count table, then the rank accumulation STREAMS through the
    driver batch by batch (O(1) driver memory — counts never
    materialize as a list)."""
    import pyarrow.compute as pc

    counts = (
        ds.groupby(key_col)
        .count()
        .sort(["count()", key_col])
    )
    n = 0
    total = 0
    s = 0
    for b in counts.iter_batches(batch_format="pyarrow"):
        xs = b["count()"].to_pylist()
        for x in xs:
            n += 1
            total += x
            s += n * x
    if n == 0 or total == 0:
        return pa.table(
            {
                "n_keys": pa.array([], pa.int64()),
                "total": pa.array([], pa.int64()),
                "gini_micro": pa.array([], pa.int64()),
            }
        )
    num = float(2 * s - (n + 1) * total)  # exact python ints -> one cast
    den = float(n * total)
    gini = pc.round(
        pa.array([1e6 * num / den]),
        ndigits=0,
        round_mode="half_towards_infinity",
    ).cast(pa.int64())
    return pa.table(
        {
            "n_keys": pa.array([n], pa.int64()),
            "total": pa.array([total], pa.int64()),
            "gini_micro": gini,
        }
    )


def readability_by_source(ds, source_col: str, text_col: str,
                          long_chars: int = 7):
    """Per-source lexical-difficulty profile: alpha-token words,
    vowel-group "syllables", alpha chars, and long words (>=
    ``long_chars`` letters), plus syllables-per-word, average word
    length, and long-word share in integer micro-units —
    ``(source, n_docs, words, syllables, alpha_chars, long_words,
    spw_micro, awl_micro, long_ratio_micro)`` sorted by source.

    These are the Flesch-Kincaid / LIX ingredients that stay
    well-defined on corpora without sentence punctuation (this
    repo's synthetic corpus has none — a sentence-based score would
    be degenerate; sentence segmentation is the caller's extension
    point). All four counters are single RE2
    ``count_substring_regex`` scans (byte-equal to DuckDB
    ``len(regexp_extract_all(...))``; the greedy ``{7,}`` run
    matches each long word once), summed per source in a per-batch
    Arrow combiner — the shuffle moves source-cardinality partials
    only. Ratios are the one-division micro device. Sources with
    zero words are dropped."""
    import numpy as np

    def partial(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        ok = pc.and_(pc.is_valid(b[source_col]),
                     pc.is_valid(b[text_col]))
        b = b.filter(ok)
        t = pa.table({
            "source": b[source_col],
            "d": pa.array(np.ones(b.num_rows, np.int64)),
            "w": pc.cast(pc.count_substring_regex(
                b[text_col], r"[A-Za-z]+('[A-Za-z]+)?"), pa.int64()),
            "y": pc.cast(pc.count_substring_regex(
                b[text_col], r"[aeiouyAEIOUY]+"), pa.int64()),
            "c": pc.cast(pc.count_substring_regex(
                b[text_col], r"[A-Za-z]"), pa.int64()),
            "lw": pc.cast(pc.count_substring_regex(
                b[text_col], r"[A-Za-z]{%d,}" % int(long_chars)),
                pa.int64()),
        })
        g = t.group_by("source").aggregate(
            [("d", "sum"), ("w", "sum"), ("y", "sum"), ("c", "sum"),
             ("lw", "sum")]
        )
        return g.rename_columns(["source", "d", "w", "y", "c", "lw"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .sum(["d", "w", "y", "c", "lw"])
    )

    def finalize(b: pa.Table) -> pa.Table:
        import numpy as np

        nd = b["sum(d)"].to_numpy(zero_copy_only=False)
        w = b["sum(w)"].to_numpy(zero_copy_only=False)
        y = b["sum(y)"].to_numpy(zero_copy_only=False)
        c = b["sum(c)"].to_numpy(zero_copy_only=False)
        lw = b["sum(lw)"].to_numpy(zero_copy_only=False)
        keep = w > 0
        nd, w, y, c, lw = nd[keep], w[keep], y[keep], c[keep], lw[keep]
        src = pa.array(
            np.asarray(b["source"].to_pylist(), object)[keep].tolist(),
            pa.string(),
        )
        wf = w.astype(np.float64)

        def _micro(x):
            return pc.cast(
                pc.round(pa.array(x), ndigits=0,
                         round_mode="half_towards_infinity"),
                pa.int64(),
            )

        return pa.table({
            "source": src,
            "n_docs": pa.array(nd, pa.int64()),
            "words": pa.array(w, pa.int64()),
            "syllables": pa.array(y, pa.int64()),
            "alpha_chars": pa.array(c, pa.int64()),
            "long_words": pa.array(lw, pa.int64()),
            "spw_micro": _micro(1e6 * (y.astype(np.float64) / wf)),
            "awl_micro": _micro(1e6 * (c.astype(np.float64) / wf)),
            "long_ratio_micro": _micro(
                1e6 * (lw.astype(np.float64) / wf)
            ),
        })

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        "source"
    )
