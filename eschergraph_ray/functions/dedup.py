"""Deduplication operators for large-scale training-data pipelines.

Each operator is a Dataset -> Dataset transform with its shuffle key
documented. The exact-dedup shape mirrors the reference's
``(document_id, lower(name))`` node identity groupby (D1/D6,
``eschergraph/builder/build_pipeline.py:227-247``,
``eschergraph/graph/node.py:90-105``); the near-dup family follows the
standard published constructions (MinHash+LSH banding, SimHash, n-gram
Jaccard) implemented on numpy inside ``map_batches``.

Scale notes: candidate generation is always a groupby on a small key
(content hash / band bucket / simhash band); pair verification is a
distributed hash join of the candidate pairs against a per-doc
signature table (``Dataset.join`` on id_a, then id_b) — nothing is
materialized on the driver. Candidate-pair outputs are deduplicated
per unordered pair. Signature payloads ride through the join as packed
``large_binary`` (Acero joins reject list-typed non-key columns).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1
# Hash-join fan-out for pair-verification joins. At sandbox scale any
# small value works; on a cluster size ~= total cores.
DEFAULT_JOIN_PARTITIONS = 8


def _text_hash(texts: list[str]) -> list[str]:
    return [hashlib.blake2b((t or "").encode(), digest_size=16).hexdigest() for t in texts]


def exact_dedup(ds, id_col: str, text_col: str):
    """One surviving id (min) per identical text.
    Shuffle key: blake2(text). D1/D6 pattern: hash-partition + per-group first."""
    from ray.data.aggregate import Min

    def add_hash(batch: pa.Table) -> pa.Table:
        h = _text_hash(batch[text_col].to_pylist())
        return pa.table({id_col: batch[id_col], "h": pa.array(h, pa.string())})

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )


def _word_shingles(text: str, k: int) -> set[int]:
    """Distinct word-k-gram hashes. Hash = upper 8 bytes of md5,
    little-endian — byte-identical to DuckDB ``md5_number_lower(gram)``,
    which lets the SQL oracle recompute MinHash signatures and exact
    Jaccard verification from the raw documents (same device as
    ``_word_hash_u64`` below for SimHash)."""
    words = (text or "").lower().split()
    if len(words) < k:
        if not words:
            return set()
        return {
            int.from_bytes(
                hashlib.md5(" ".join(words).encode()).digest()[8:16], "little"
            )
        }
    out = set()
    h = hashlib.md5
    for i in range(len(words) - k + 1):
        out.add(
            int.from_bytes(h(" ".join(words[i : i + k]).encode()).digest()[8:16], "little")
        )
    return out


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    ds, id_col: str, text_col: str, num_perm: int = 64, shingle_k: int = 3, seed: int = 7
):
    """Per-doc MinHash signature (list<uint64> as list<int64> column)."""
    a, b = _minhash_params(num_perm, seed)

    def sig(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sigs = []
        for t in batch[text_col].to_pylist():
            sh = np.fromiter(_word_shingles(t, shingle_k), dtype=np.uint64)
            if len(sh) == 0:
                sigs.append([0] * num_perm)
                continue
            # (a*x + b) mod p, min over shingles, per permutation
            vals = (sh[None, :] * a[:, None] + b[:, None]) % _MERSENNE
            sigs.append(vals.min(axis=1).astype(np.int64).tolist())
        return pa.table(
            {id_col: pa.array(ids), "signature": pa.array(sigs, pa.list_(pa.int64()))}
        )

    return ds.map_batches(sig, batch_format="pyarrow")


# hash partitions for vectorized bucket pairing (power of two: the
# partition id is a bit mask of the bucket hash). 64 bounds the
# map_groups call count while keeping partitions small enough that a
# worker sorts one comfortably; at 100 TB raise it with cluster size.
_PAIR_PARTITIONS = 64


def _bucket_pairs_vectorized(ds, key_cols: list[str], id_col: str,
                             df_cutoff: int, part_col: str = "_part"):
    """All unordered (id_a < id_b) pairs that share a bucket key, with
    the per-bucket ``df_cutoff``, computed VECTORIZED per hash
    partition instead of one ``map_groups`` UDF call per bucket.

    Why: ``groupby(bucket).map_groups`` invokes Python once per
    DISTINCT bucket — for n-gram dedup that is one call per distinct
    gram (hundreds of thousands of micro-groups; measured ~75% of the
    query's wall time at sf0.1). Here buckets are hash-partitioned on
    ``part_col`` (one group per PARTITION, e.g. 64 calls total), each
    partition is sorted by (key, id) once in Arrow, run boundaries are
    found with one numpy compare, and only runs with 2..df_cutoff
    members expand pairs (``np.triu_indices`` — C loop). Singleton
    buckets (the vast majority) cost one boolean each.

    Identical output to the per-bucket path: ids within a run are
    sorted, so i<j yields id_a < id_b; a bucket larger than
    ``df_cutoff`` emits nothing. Callers must attach ``part_col`` =
    deterministic hash(bucket key) so a bucket never straddles
    partitions."""
    import numpy as np

    def pairs(part: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t_id = part[id_col].type
        empty = pa.table({"id_a": pa.array([], t_id), "id_b": pa.array([], t_id)})
        n = part.num_rows
        if n < 2:
            return empty
        idx = pc.sort_indices(
            part, sort_keys=[(c, "ascending") for c in key_cols + [id_col]]
        )
        t = part.take(idx).combine_chunks()
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for c in key_cols:
            arr = t[c].to_numpy(zero_copy_only=False)
            change[1:] |= arr[1:] != arr[:-1]
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], n)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        a_parts, b_parts = [], []
        for s, e in zip(starts, ends):
            run = e - s
            if run < 2 or run > df_cutoff:  # singleton or hot-bucket cut
                continue
            i, j = np.triu_indices(run, 1)
            a_parts.append(ids[s:e][i])
            b_parts.append(ids[s:e][j])
        if not a_parts:
            return empty
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(a_parts), t_id),
                "id_b": pa.array(np.concatenate(b_parts), t_id),
            }
        )

    return ds.groupby(part_col).map_groups(pairs, batch_format="pyarrow")


def minhash_band_rows(
    ds,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 7,
):
    """One ``(id, band_id, band_hash)`` row per document per band —
    band_hash = blake2b-8 of the band's signature chunk bytes (>> 1 to
    stay in int64). Shared by the one-shot candidate path and the
    persisted incremental index so their hashes are byte-identical."""
    if bands < 1 or num_perm % bands:
        raise ValueError(f"bands ({bands}) must divide num_perm ({num_perm})")
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(ds, id_col, text_col, num_perm, shingle_k, seed)

    def explode(batch: pa.Table) -> pa.Table:
        ids, bids, bhash = [], [], []
        for id_, sig in zip(batch[id_col].to_pylist(), batch["signature"].to_pylist()):
            for bi in range(bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                h = hashlib.blake2b(np.array(chunk, dtype=np.int64).tobytes(), digest_size=8)
                ids.append(id_)
                bids.append(bi)
                bhash.append(int.from_bytes(h.digest(), "big") >> 1)
        return pa.table(
            {
                id_col: pa.array(ids),
                "band_id": pa.array(bids, pa.int32()),
                "band_hash": pa.array(bhash, pa.int64()),
            }
        )

    return sigs.map_batches(explode, batch_format="pyarrow")


def minhash_lsh_candidates(
    ds,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 7,
    df_cutoff: int = 2000,
):
    """Candidate near-dup pairs via LSH banding.
    Pipeline: signature (map) -> explode (band_id, band_hash, id) ->
    groupby band bucket (THE shuffle) -> pairs within bucket -> distinct
    unordered pairs.

    ``df_cutoff``: a band bucket holding more than this many docs is
    skipped instead of paired O(df^2) — the degenerate bucket exists by
    construction (all empty/near-empty docs share one signature), and
    at corpus scale one hot bucket would otherwise dominate the whole
    job. The recall loss is PROBABILISTIC, not guaranteed-recovered: a
    pair is lost outright only if EVERY band where its two signatures
    collide lands in a hot (> cutoff) bucket; with independent bands
    that is overwhelmingly unlikely for genuinely similar pairs, but it
    is not a pigeonhole guarantee. The SQL oracle replays the same
    cutoff (bucket sizes pre-computed, hot buckets excluded from the
    candidate join) so Ray and oracle stay byte-equal even when a
    bucket IS cut."""
    if bands < 1 or num_perm % bands:
        # silent truncation makes trailing perms dead weight; bands >
        # num_perm makes EVERY band hash empty (one global bucket)
        raise ValueError(f"bands ({bands}) must divide num_perm ({num_perm})")
    exploded = minhash_band_rows(
        ds, id_col, text_col, num_perm, bands, shingle_k, seed
    ).map_batches(
        # bucket partition for the vectorized pairing: band_hash is
        # blake2-uniform, so its low bits ARE the hash partition (the
        # pyarrow-has-no-modulo trick: power-of-two mask)
        lambda t: t.append_column(
            "_part", pc.bit_wise_and(t["band_hash"], _PAIR_PARTITIONS - 1)
        ),
        batch_format="pyarrow",
    )
    pairs = _bucket_pairs_vectorized(
        exploded, ["band_id", "band_hash"], id_col, df_cutoff
    )
    # distinct unordered pairs via the int-bucket combine (the native
    # (id_a, id_b) groupby re-shuffles the whole band fan-out on wide
    # string keys)
    return _pair_counts_bucketed(pairs, out_col="n_bands").select_columns(
        ["id_a", "id_b"]
    )


def _pair_counts_bucketed(pairs_ds, out_col: str = "n_common",
                          num_buckets: int = 64, a_col: str = "id_a",
                          b_col: str = "id_b", sum_col: str | None = None,
                          min_col: str | None = None):
    """Occurrence counts per unordered (id_a, id_b) pair WITHOUT a
    native groupby over the composite key: a sort shuffle of the
    ~quadratic pair fan-out on wide (string, string) keys is the most
    expensive exchange in the near-dup family (measured 49 s native vs
    0.8 s bucketed for 1.5M pairs at sf0.1). Rows are bucketed by
    ``crc32(id_a) % num_buckets`` — every row of a pair shares id_a,
    so ONE bucket holds the pair whole and the per-bucket Arrow
    group_by is its complete, exact count. The exchange key is a
    single small int; bucket size = fan-out / num_buckets plus hot-id
    skew, which the pair producer's df_cutoff already bounds.

    ``sum_col``: sum that int column per pair instead of counting rows
    (the combiner-partials shape, e.g. cooccurrence_pmi's n_part);
    ``min_col``: per-pair minimum instead (simhash's best hamming)."""
    val_col = sum_col or min_col
    cols = [a_col, b_col] + ([val_col] if val_col else [])

    def bucket(batch: pa.Table) -> pa.Table:
        import zlib

        t = batch.select(cols)
        u = pc.unique(t[a_col].combine_chunks())
        lut = {
            v: zlib.crc32(str(v).encode()) % num_buckets
            for v in u.to_pylist()
        }
        bk = pa.array([lut[v] for v in t[a_col].to_pylist()], pa.int32())
        return t.append_column("bucket", bk)

    def per_bucket(group: pa.Table) -> pa.Table:
        if sum_col:
            agg = (sum_col, "sum")
        elif min_col:
            agg = (min_col, "min")
        else:
            agg = (a_col, "count")
        return (
            group.select(cols)
            .group_by([a_col, b_col])
            .aggregate([agg])
            .rename_columns([a_col, b_col, out_col])
        )

    return (
        pairs_ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def _pack_u64(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype=np.uint64).tobytes()


def _nonempty_pairs(pairs_ds):
    """Materialize the (small) candidate-pair set and return it, or
    None when empty — Ray's hash join loses the schema of an empty
    left side and raises; callers short-circuit to an empty result.
    Candidate pairs are the SMALL intermediate of every near-dup
    pipeline, so pinning them in the object store is cheap and also
    avoids recomputing candidate generation for the second join."""
    mat = pairs_ds.materialize()
    n = mat.count()
    if n == 0:
        return None
    # repartition: an upstream aggregate with sparse keys can emit
    # schema-less EMPTY blocks alongside real ones, which crash the
    # Acero join ("No match for FieldRef"); coalescing normalizes them
    return mat.repartition(max(1, min(DEFAULT_JOIN_PARTITIONS, n // 256 + 1)))


def _pinned_payload(ds, num_partitions: int = DEFAULT_JOIN_PARTITIONS):
    """Pin a join payload table AND coalesce its blocks: aggregate
    outputs can contain schema-less empty blocks that crash the Acero
    join on EITHER side; repartition normalizes them."""
    return ds.materialize().repartition(num_partitions)


def _empty_pairs_table(id_type: pa.DataType, value_col: str) -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], id_type),
            "id_b": pa.array([], id_type),
            value_col: pa.array([], pa.float64()),
        }
    )


def _attach_payload(pairs_ds, payload_ds, pair_key: str, id_col: str,
                    payload_col: str, out_col: str,
                    num_partitions: int = DEFAULT_JOIN_PARTITIONS,
                    broadcast_limit: int = 200_000):
    """Attach pairs_ds[pair_key] == payload_ds[id_col], bringing
    ``payload_col`` in as ``out_col``. The payload table must carry
    its payload as a join-safe type (binary/fixed-width).

    Below ``broadcast_limit`` payload rows the attach is a ray.put
    broadcast + vectorized index_in/take lookup inside one streaming
    map (inner semantics: missing keys drop) — the pairs stream never
    shuffles, which matters because candidate-pair tables are often
    ~quadratic in the (small) payload table they reference. Past the
    limit: the distributed hash join, unchanged."""
    import ray

    n_payload = payload_ds.count()
    mt = None
    if n_payload <= broadcast_limit:
        mt = pa.concat_tables(
            list(payload_ds.iter_batches(batch_format="pyarrow"))
        ).combine_chunks()
        if mt.nbytes > (256 << 20):  # fat payloads: keep the join
            mt = None
    if mt is not None:
        ref = ray.put((mt[id_col].combine_chunks(),
                       mt[payload_col].combine_chunks()))

        def attach(b: pa.Table, _ref=ref) -> pa.Table:
            from ..stages.chunking import pin_arrow_threads

            pin_arrow_threads()
            r = _ref if isinstance(_ref, tuple) else ray.get(_ref)
            ids_arr, payload = r
            vals = payload.take(pc.index_in(b[pair_key], value_set=ids_arr))
            t = b.append_column(out_col, vals)
            return t.filter(pc.is_valid(t[out_col]))

        return pairs_ds.map_batches(attach, batch_format="pyarrow")

    def rename(batch: pa.Table) -> pa.Table:
        return batch.select([id_col, payload_col]).rename_columns([id_col, out_col])

    side = payload_ds.map_batches(rename, batch_format="pyarrow")
    joined = pairs_ds.join(
        side,
        join_type="inner",
        num_partitions=num_partitions,
        on=(pair_key,),
        right_on=(id_col,),
    )
    # the join itself can emit schema-less empty partitions, which
    # crash a CHAINED second join; coalescing normalizes them
    return joined.repartition(num_partitions)


def shingle_signatures(docs_ds, id_col: str, text_col: str, shingle_k: int = 3):
    """Per-doc sorted-unique shingle hashes packed as large_binary
    (join-safe payload; unpack with np.frombuffer(uint64))."""

    def sig(batch: pa.Table) -> pa.Table:
        packed = []
        for t in batch[text_col].to_pylist():
            sh = np.fromiter(_word_shingles(t, shingle_k), dtype=np.uint64)
            sh.sort()
            packed.append(_pack_u64(sh))
        return pa.table(
            {id_col: batch[id_col], "shingles": pa.array(packed, pa.large_binary())}
        )

    return docs_ds.map_batches(sig, batch_format="pyarrow")


def jaccard_verify_pairs(pairs_ds, docs_ds, id_col: str, text_col: str,
                         shingle_k: int = 3, threshold: float = 0.7,
                         num_partitions: int = DEFAULT_JOIN_PARTITIONS,
                         sigs_ds=None):
    """Verify candidate pairs by exact shingle Jaccard — fully
    distributed: pairs ⨝ shingle-signatures on id_a, then id_b (two
    hash joins), then a vectorized per-pair intersection. No driver
    materialization, no broadcast of the doc side.

    ``sigs_ds``: optional precomputed ``shingle_signatures`` table —
    the incremental-index probe passes one assembled from persisted
    old-side blobs plus fresh new-side blobs."""
    import ray.data as rd

    # materialize: both joins consume the signature table; without
    # pinning it, the docs scan + shingling would re-execute per join
    # (signatures are ~20-50x smaller than the text they summarize)
    sigs = (
        sigs_ds
        if sigs_ds is not None
        else shingle_signatures(docs_ds, id_col, text_col, shingle_k)
    ).materialize()
    pairs_ds = _nonempty_pairs(pairs_ds)
    if pairs_ds is None:
        id_type = docs_ds.schema().base_schema.field(id_col).type
        return rd.from_arrow(_empty_pairs_table(id_type, "jaccard"))
    j1 = _attach_payload(pairs_ds, sigs, "id_a", id_col, "shingles", "sh_a",
                         num_partitions)
    j2 = _attach_payload(j1, sigs, "id_b", id_col, "shingles", "sh_b",
                         num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        keep_a, keep_b, jac = [], [], []
        for a, b, ba, bb in zip(
            batch["id_a"].to_pylist(),
            batch["id_b"].to_pylist(),
            batch["sh_a"].to_pylist(),
            batch["sh_b"].to_pylist(),
        ):
            sa = np.frombuffer(ba, dtype=np.uint64)
            sb = np.frombuffer(bb, dtype=np.uint64)
            if len(sa) == 0 or len(sb) == 0:
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            j = inter / (len(sa) + len(sb) - inter)
            if j >= threshold:
                keep_a.append(a)
                keep_b.append(b)
                # half-away-from-zero = DuckDB round() (Python round()
                # is banker's — diverges on exact .5 ulps)
                jac.append(float(np.floor(j * 1e6 + 0.5) / 1e6))
        id_type = batch["id_a"].type
        return pa.table(
            {
                "id_a": pa.array(keep_a, id_type),
                "id_b": pa.array(keep_b, id_type),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return j2.map_batches(verify, batch_format="pyarrow")


def _word_hash_u64(word: str) -> int:
    """Word hash for SimHash: upper 8 bytes of md5, little-endian —
    byte-identical to DuckDB's ``md5_number_lower(word)``, which makes
    the whole SimHash recomputable by the SQL oracle."""
    return int.from_bytes(hashlib.md5(word.encode()).digest()[8:16], "little")


def simhash_values(ds, id_col: str, text_col: str):
    """64-bit SimHash per doc over word-token hashes (duplicate word
    occurrences weighted by count). Vectorized: one hash per DISTINCT
    word (per-worker cache across docs), then the 64 bit-sums for a
    whole doc as a single counts @ bits matmul."""

    class SimHasher:
        def __init__(self):
            from ..stages.chunking import pin_arrow_threads

            pin_arrow_threads()
            self._cache: dict[str, int] = {}

        def _hashes(self, words: np.ndarray) -> np.ndarray:
            c = self._cache
            if len(c) > 1_000_000:
                # actor lives for the whole corpus; an unbounded vocab
                # (ids, numbers, typos) must not grow the heap forever
                c.clear()
            out = np.empty(len(words), dtype=np.uint64)
            for i, w in enumerate(words):
                hv = c.get(w)
                if hv is None:
                    hv = _word_hash_u64(w)
                    c[w] = hv
                out[i] = hv
            return out

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = []
            for t in batch[text_col].to_pylist():
                words, counts = np.unique((t or "").lower().split(), return_counts=True)
                if len(words) == 0:
                    out.append(-(1 << 63))
                    continue
                hv = self._hashes(words)
                # (W, 64) bit matrix, bit i of value = column i
                bits = np.unpackbits(
                    hv.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
                ).astype(np.int64)
                acc = counts @ (2 * bits - 1)
                v = int(
                    np.bitwise_or.reduce(
                        (np.uint64(1) << np.arange(64, dtype=np.uint64))[acc > 0],
                        axis=None,
                    )
                    if (acc > 0).any()
                    else 0
                )
                out.append(v - (1 << 63))  # store as signed int64
            return pa.table(
                {id_col: batch[id_col], "simhash": pa.array(out, pa.int64())}
            )

    # actor pool: the word-hash cache persists across batches; sized by
    # the shared EG_POOL_FRACTION policy (a literal 4 idled 6x of the
    # box on 32 cpus)
    import os as _os

    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 4)) if _ray.is_initialized() else 4
    frac = float(_os.environ.get("EG_POOL_FRACTION", "0.3"))
    return ds.map_batches(
        SimHasher, batch_format="pyarrow", concurrency=max(1, int(round(cpus * frac)))
    )


def simhash_near_pairs(ds, id_col: str, text_col: str, max_hamming: int = 3):
    """Near-dup pairs with Hamming distance <= max_hamming.
    Banding: 4 x 16-bit bands — any pair within distance 3 shares at
    least one exact band (pigeonhole). Shuffle key: (band_id, band_val)."""
    sigs = simhash_values(ds, id_col, text_col)

    def explode(batch: pa.Table) -> pa.Table:
        ids, bids, bvals, full = [], [], [], []
        for i, s in zip(batch[id_col].to_pylist(), batch["simhash"].to_pylist()):
            u = s + (1 << 63)
            for bi in range(4):
                ids.append(i)
                bids.append(bi)
                bvals.append((u >> (16 * bi)) & 0xFFFF)
                full.append(s)
        return pa.table(
            {
                id_col: pa.array(ids),
                "band_id": pa.array(bids, pa.int32()),
                "band_val": pa.array(bvals, pa.int32()),
                "simhash": pa.array(full, pa.int64()),
            }
        )

    def pairs(group: pa.Table) -> pa.Table:
        rows = sorted(set(zip(group[id_col].to_pylist(), group["simhash"].to_pylist())))
        a_, b_, d_ = [], [], []
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin((rows[i][1] ^ rows[j][1]) & ((1 << 64) - 1)).count("1")
                if d <= max_hamming:
                    a_.append(rows[i][0])
                    b_.append(rows[j][0])
                    d_.append(d)
        t = group[id_col].type  # typed: pa.array([]) infers null (schema trap)
        return pa.table(
            {
                "id_a": pa.array(a_, t),
                "id_b": pa.array(b_, t),
                "hamming": pa.array(d_, pa.int32()),
            }
        )

    cand = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(pairs, batch_format="pyarrow")
    )
    # per-pair best hamming via the int-bucket combine (a native
    # composite-key groupby re-shuffles the whole band fan-out)
    return _pair_counts_bucketed(cand, out_col="hamming",
                                 min_col="hamming")


def ngram_jaccard_pairs(ds, id_col: str, text_col: str, n: int = 3,
                        threshold: float = 0.5, df_cutoff: int = 2000,
                        num_partitions: int = DEFAULT_JOIN_PARTITIONS,
                        broadcast_sizes_below: int = 2_000_000):
    """EXACT n-gram (word) Jaccard similar pairs — SQL-checkable and
    fully distributed.

    explode distinct n-grams -> groupby(gram) pairs (THE shuffle; a
    gram bucket larger than ``df_cutoff`` docs is skipped — the
    document-frequency cut that kills the hot-gram O(df^2) reducer) ->
    count common per pair -> two hash joins against the per-doc
    distinct-gram counts -> jaccard.

    ``df_cutoff`` semantics: per-doc gram counts stay exact; only the
    *pairing* of ubiquitous grams is cut, so when the cut is active the
    reported jaccard is a lower bound (an all-docs stop-phrase can only
    have pushed pairs DOWN toward threshold, never created false
    positives). With the default cutoff no gram at sandbox scale is
    cut and the output is byte-exact vs the SQL oracle."""
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        import zlib

        ids, gs, parts = [], [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            words = (t or "").lower().split()
            grams = {" ".join(words[k : k + n]) for k in range(len(words) - n + 1)}
            for g in grams:
                ids.append(i)
                gs.append(g)
                # deterministic gram partition for the vectorized
                # pairing (crc32: stable across processes, cheap)
                parts.append(zlib.crc32(g.encode()) & (_PAIR_PARTITIONS - 1))
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "gram": pa.array(gs, pa.string()),
                "_part": pa.array(parts, pa.int64()),
            }
        )

    grams = ds.map_batches(explode, batch_format="pyarrow")
    # pinned + coalesced: consumed by two joins; aggregate outputs can
    # carry degenerate empty blocks (see _pinned_payload)
    sizes = _pinned_payload(grams.groupby(id_col).aggregate(Count(alias_name="n_grams")))

    inter = _pair_counts_bucketed(
        _bucket_pairs_vectorized(grams, ["gram"], id_col, df_cutoff)
    )
    inter = _nonempty_pairs(inter)
    if inter is None:
        import ray.data as rd

        id_type = ds.schema().base_schema.field(id_col).type
        return rd.from_arrow(_empty_pairs_table(id_type, "jaccard"))

    # sizes is one integer per doc — when it fits comfortably in the
    # object store, BROADCAST it (ray.put once, zero-copy read per
    # task) instead of dragging every candidate pair through two hash
    # joins + their repartitions (measured: the join phase was ~1/3 of
    # the query wall at sf0.1 with a dense pair graph). Above the
    # threshold the distributed joins remain the scale path.
    if sizes.count() <= broadcast_sizes_below:
        import ray as _ray

        pdf = sizes.to_pandas()
        order = np.argsort(pdf[id_col].to_numpy())
        side_ref = _ray.put(
            (pdf[id_col].to_numpy()[order], pdf["n_grams"].to_numpy()[order])
        )

        def jac_broadcast(batch: pa.Table) -> pa.Table:
            ids_np, cnt_np = _ray.get(side_ref)
            a = batch["id_a"].to_numpy(zero_copy_only=False)
            b = batch["id_b"].to_numpy(zero_copy_only=False)
            pa_i = np.searchsorted(ids_np, a)
            pb_i = np.searchsorted(ids_np, b)
            if not ((ids_np[pa_i] == a).all() and (ids_np[pb_i] == b).all()):
                raise RuntimeError("pair id missing from broadcast size table")
            nc = batch["n_common"].to_numpy(zero_copy_only=False)
            union = cnt_np[pa_i] + cnt_np[pb_i] - nc
            # same IEEE double division as the join path's pc.divide
            j = pa.array(nc.astype(np.float64) / union.astype(np.float64))
            out = pa.table(
                {
                    "id_a": batch["id_a"],
                    "id_b": batch["id_b"],
                    "jaccard": pc.round(j, 6, round_mode="half_towards_infinity"),
                }
            )
            return out.filter(pc.greater_equal(j, threshold))

        return inter.map_batches(jac_broadcast, batch_format="pyarrow")

    j1 = _attach_payload(inter, sizes, "id_a", id_col, "n_grams", "n_a",
                         num_partitions)
    j2 = _attach_payload(j1, sizes, "id_b", id_col, "n_grams", "n_b",
                         num_partitions)

    def jac(batch: pa.Table) -> pa.Table:
        union = pc.subtract(pc.add(batch["n_a"], batch["n_b"]), batch["n_common"])
        j = pc.divide(
            pc.cast(batch["n_common"], pa.float64()), pc.cast(union, pa.float64())
        )
        out = pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                # half-away-from-zero matches DuckDB round() exactly
                "jaccard": pc.round(j, 6, round_mode="half_towards_infinity"),
            }
        )
        return out.filter(pc.greater_equal(j, threshold))

    return j2.map_batches(jac, batch_format="pyarrow")


def _id_chunk(ids: list, num_chunks: int) -> list[int]:
    """Deterministic chunk assignment per id (blake2, not Python hash)."""
    return [
        int.from_bytes(
            hashlib.blake2b(str(i).encode(), digest_size=4).digest(), "big"
        )
        % num_chunks
        for i in ids
    ]


def _unpack_f64(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.float64)


def _norm_rows(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1
    return m / norms


def embedding_near_dup_pairs(ds, id_col: str, vec_col: str,
                             threshold: float = 0.9, num_chunks: int = 4):
    """EXACT cosine near-dup pairs over an embedding column — the
    distributed block-nested-loop shape (exact all-pairs similarity is
    inherently O(N^2) work; this spreads it over C*(C+1)/2 independent
    reducers instead of materializing anything on the driver):

    each vector is assigned a chunk c = blake2(id) % C and replicated
    to every unordered chunk pair containing c; one groupby((ca, cb))
    shuffle; each group does a single numpy matmul between its two
    chunk matrices. Data through the shuffle = C x input. For the
    sub-quadratic scale path see ``embedding_lsh_near_dup_pairs``."""

    def explode(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ids = batch[id_col].to_pylist()
        chunks = _id_chunk(ids, num_chunks)
        mat = np.asarray(
            batch[vec_col].combine_chunks().flatten(), dtype=np.float64
        ).reshape(n, -1)
        out_id, out_ca, out_cb, out_c, out_vec = [], [], [], [], []
        for r in range(n):
            c = chunks[r]
            buf = mat[r].tobytes()
            for other in range(num_chunks):
                out_id.append(ids[r])
                out_ca.append(min(c, other))
                out_cb.append(max(c, other))
                out_c.append(c)
                out_vec.append(buf)
        return pa.table(
            {
                id_col: pa.array(out_id, batch[id_col].type),
                "ca": pa.array(out_ca, pa.int32()),
                "cb": pa.array(out_cb, pa.int32()),
                "chunk": pa.array(out_c, pa.int32()),
                "vec": pa.array(out_vec, pa.large_binary()),
            }
        )

    def score_group(group: pa.Table) -> pa.Table:
        ca = group["ca"][0].as_py()
        cb = group["cb"][0].as_py()
        ids = group[id_col].to_pylist()
        chunks = group["chunk"].to_pylist()
        vecs = np.vstack([_unpack_f64(b) for b in group["vec"].to_pylist()])
        a_, b_, s_ = [], [], []
        if ca == cb:
            m = _norm_rows(vecs)
            # round(4) before thresholding: keeps the cut bit-identical
            # with the float32-accumulating SQL oracle
            sims = np.round(m @ m.T, 4)
            for i in range(len(ids)):
                for j in np.nonzero(sims[i] >= threshold)[0]:
                    if ids[i] < ids[j]:
                        a_.append(ids[i])
                        b_.append(ids[j])
                        s_.append(float(sims[i, j]))
        else:
            ia = [r for r, c in enumerate(chunks) if c == ca]
            ib = [r for r, c in enumerate(chunks) if c == cb]
            if ia and ib:
                ma = _norm_rows(vecs[ia])
                mb = _norm_rows(vecs[ib])
                sims = np.round(ma @ mb.T, 4)
                for x in range(len(ia)):
                    for y in np.nonzero(sims[x] >= threshold)[0]:
                        qid, oid = ids[ia[x]], ids[ib[y]]
                        lo, hi = (qid, oid) if qid < oid else (oid, qid)
                        a_.append(lo)
                        b_.append(hi)
                        s_.append(float(sims[x, y]))
        t = group[id_col].type
        return pa.table(
            {
                "id_a": pa.array(a_, t),
                "id_b": pa.array(b_, t),
                "cosine": pa.array(s_, pa.float64()),
            }
        )

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["ca", "cb"])
        .map_groups(score_group, batch_format="pyarrow")
    )


def packed_vectors(ds, id_col: str, vec_col: str):
    """(id, vec as packed float64 large_binary) — join-safe payload."""

    def pack(batch: pa.Table) -> pa.Table:
        n = len(batch)
        mat = np.asarray(
            batch[vec_col].combine_chunks().flatten(), dtype=np.float64
        ).reshape(n, -1)
        return pa.table(
            {
                id_col: batch[id_col],
                "vec": pa.array([mat[r].tobytes() for r in range(n)], pa.large_binary()),
            }
        )

    return ds.map_batches(pack, batch_format="pyarrow")


def dedup_lsh_planes(dim: int, num_planes: int = 64, seed: int = 7) -> np.ndarray:
    """The near-dup LSH hyperplanes, (dim, num_planes) — the SINGLE
    source for both the pipeline and the SQL oracle's model-state
    side-write (__ray_entry__._sidewrite_dedup_planes); seed/shape
    changes must flow through here so they cannot drift apart."""
    return np.random.default_rng(seed).standard_normal((dim, num_planes))


def embedding_lsh_candidates(ds, id_col: str, vec_col: str,
                             num_planes: int = 64, bands: int = 16, seed: int = 7):
    """Hyperplane-LSH candidate pairs (the sub-quadratic scale path):
    sign-bit signature under ``num_planes`` seeded random hyperplanes,
    banded into ``bands`` buckets; groupby (band_id, band_hash) over
    the (id, band) rows is THE shuffle. Pairs are distinct per
    unordered pair BY CONSTRUCTION via the emit-once rule — each row
    carries its full packed signature (+8*bands bytes of shuffle
    payload) and a bucket emits a pair only when no EARLIER band also
    matched, which deletes the pairs-stream distinct groupby that
    otherwise re-shuffles the whole quadratic candidate fan-out."""
    if bands < 1 or num_planes % bands:
        raise ValueError(f"bands ({bands}) must divide num_planes ({num_planes})")
    bits_per_band = num_planes // bands
    _plane_cache: dict = {}

    def _planes(dim: int) -> np.ndarray:
        key = (seed, dim, num_planes)
        p = _plane_cache.get(key)
        if p is None:
            p = dedup_lsh_planes(dim, num_planes, seed)
            _plane_cache[key] = p
        return p

    def sig(batch: pa.Table) -> pa.Table:
        n = len(batch)
        mat = np.asarray(
            batch[vec_col].combine_chunks().flatten(), dtype=np.float64
        ).reshape(n, -1)
        planes = _planes(mat.shape[1])
        bits = (mat @ planes) >= 0  # (n, num_planes) bool
        # band hashes in one reshape-matmul; each (id, band) row also
        # carries the row's FULL packed signature so the bucket stage
        # can apply the emit-once rule without a second lookup
        weights = (1 << np.arange(bits_per_band, dtype=np.int64))
        vals = bits.reshape(n, bands, bits_per_band).astype(np.int64) @ weights
        ids_arr = batch[id_col].combine_chunks()
        sig_bytes = [vals[r].tobytes() for r in range(n)]
        return pa.table(
            {
                id_col: ids_arr.take(
                    pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
                ),
                "band_id": pa.array(
                    np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()
                ),
                "band_hash": pa.array(vals.ravel(), pa.int64()),
                "sig": pa.array(
                    [s for s in sig_bytes for _ in range(bands)],
                    pa.large_binary(),
                ),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        # sorted ids + the i<j upper triangle via triu_indices, then
        # the EMIT-ONCE rule: a pair is emitted only from its FIRST
        # matching band (any earlier-band hash equality suppresses
        # it), so the global pair stream is distinct by construction —
        # no 8M-row distinct-pair shuffle afterwards, and no per-pair
        # Python loop (a degenerate bucket melts down in Python long
        # before numpy)
        t = group[id_col].type
        bi = int(group["band_id"][0].as_py())
        tbl = group.select([id_col, "sig"]).combine_chunks()
        tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[(id_col, "ascending")]))
        if tbl.num_rows > 1:  # defensive id dedupe (the old set() behavior)
            ids0 = tbl[id_col].combine_chunks()
            if isinstance(ids0, pa.ChunkedArray):
                ids0 = pa.concat_arrays(ids0.chunks)
            first = pa.concat_arrays([
                pa.array([True]),
                pc.not_equal(ids0.slice(1), ids0.slice(0, len(ids0) - 1)),
            ])
            tbl = tbl.filter(first)
        n = tbl.num_rows
        S = np.frombuffer(
            b"".join(tbl["sig"].to_pylist()), dtype=np.int64
        ).reshape(n, bands)
        iu, ju = np.triu_indices(n, k=1)
        if bi > 0 and len(iu):
            seen_earlier = (S[iu, :bi] == S[ju, :bi]).any(axis=1)
            iu, ju = iu[~seen_earlier], ju[~seen_earlier]
        ids = tbl[id_col]
        return pa.table(
            {
                "id_a": ids.take(pa.array(iu, pa.int64())),
                "id_b": ids.take(pa.array(ju, pa.int64())),
            }
        ).cast(pa.schema([("id_a", t), ("id_b", t)]))

    return (
        ds.map_batches(sig, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )


def embedding_lsh_near_dup_pairs(ds, id_col: str, vec_col: str,
                                 threshold: float = 0.9, num_planes: int = 64,
                                 bands: int = 16, seed: int = 7,
                                 num_partitions: int = DEFAULT_JOIN_PARTITIONS):
    """LSH-bucketed cosine near-dup: candidates from hyperplane banding,
    then exact-cosine verification via two hash joins of the candidate
    pairs against the packed-vector table (same join shape as
    ``jaccard_verify_pairs``). Probabilistic recall (tested >= brute
    force on the sandbox corpora); use ``embedding_near_dup_pairs`` for
    the exact result.

    Banding guidance: recall at threshold t needs band-match probability
    p^bits with p = 1 - arccos(t)/pi. The default (16 bands x 4 bits)
    targets LOW thresholds (~0.4, ~94% recall) at the cost of large
    buckets on big corpora; for true near-dup thresholds (>= 0.8) use
    ``bands=8`` (8-bit bands — buckets shrink ~16x, recall ~94% at
    cosine 0.9). Sign-LSH cannot be both sharp and high-recall at low
    thresholds — that regime is what ``embedding_near_dup_pairs``'s
    exact chunk-pair path is for."""
    cand = _nonempty_pairs(
        embedding_lsh_candidates(ds, id_col, vec_col, num_planes, bands, seed)
    )
    if cand is None:
        import ray.data as rd

        id_type = ds.schema().base_schema.field(id_col).type
        return rd.from_arrow(_empty_pairs_table(id_type, "cosine"))
    # pinned: consumed by two joins (see jaccard_verify_pairs note)
    vecs = packed_vectors(ds, id_col, vec_col).materialize()
    j1 = _attach_payload(cand, vecs, "id_a", id_col, "vec", "vec_a", num_partitions)
    j2 = _attach_payload(j1, vecs, "id_b", id_col, "vec", "vec_b", num_partitions)

    def verify(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        t = batch["id_a"].type
        n = batch.num_rows
        if n:
            # pass 1 — vectorized prefilter: one batched cosine sweep
            # with a margin wider than both the 4-digit round's reach
            # (5e-5) and any dgemm-vs-ddot accumulation drift, so no
            # pair the exact pass would keep can be dropped. This cuts
            # the per-pair Python pass below from every candidate
            # (degenerate low-threshold banding admits most of the
            # quadratic) to just the near-threshold survivors.
            va = np.frombuffer(
                b"".join(batch["vec_a"].to_pylist()), dtype=np.float64
            ).reshape(n, -1)
            vb = np.frombuffer(
                b"".join(batch["vec_b"].to_pylist()), dtype=np.float64
            ).reshape(n, -1)
            na = np.linalg.norm(va, axis=1)
            na[na == 0] = 1.0
            nb = np.linalg.norm(vb, axis=1)
            nb[nb == 0] = 1.0
            s = np.einsum(
                "bd,bd->b", va / na[:, None], vb / nb[:, None]
            )
            keep = np.nonzero(s >= threshold - 1e-4)[0]
            batch = batch.take(pa.array(keep, pa.int64()))
        a_, b_, s_ = [], [], []
        for a, b, va_, vb_ in zip(
            batch["id_a"].to_pylist(),
            batch["id_b"].to_pylist(),
            batch["vec_a"].to_pylist(),
            batch["vec_b"].to_pylist(),
        ):
            x = _unpack_f64(va_)
            y = _unpack_f64(vb_)
            nx = np.linalg.norm(x) or 1.0
            ny = np.linalg.norm(y) or 1.0
            # pass 2 — np.round per pair: byte-identical value parity
            # with embedding_near_dup_pairs (and the SQL replay)
            sim = float(np.round((x / nx) @ (y / ny), 4))
            if sim >= threshold:
                a_.append(a)
                b_.append(b)
                s_.append(sim)
        return pa.table(
            {
                "id_a": pa.array(a_, t),
                "id_b": pa.array(b_, t),
                "cosine": pa.array(s_, pa.float64()),
            }
        )

    return j2.map_batches(verify, batch_format="pyarrow")


def ngram_containment_pairs(ds, id_col: str, text_col: str, n: int = 3,
                            threshold: float = 0.5,
                            df_cutoff: int = 2000,
                            num_partitions: int = DEFAULT_JOIN_PARTITIONS,
                            broadcast_sizes_below: int = 2_000_000):
    """EXACT n-gram CONTAINMENT pairs — the asymmetric complement of
    :func:`ngram_jaccard_pairs`: ``containment = n_common /
    min(|A|, |B|)`` flags a short document quoted inside a long one,
    which symmetric Jaccard dilutes toward zero (the Broder
    containment measure; the standard quote-inclusion / boilerplate
    curation gate).

    Identical distributed shape to the Jaccard op (same explode, same
    hot-gram df-cutoff, same broadcast-sizes fast path with join
    fallback); only the scoring formula differs, and the same
    lower-bound semantics hold when the cutoff is active."""
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        import zlib

        ids, gs, parts = [], [], []
        for i, t in zip(batch[id_col].to_pylist(),
                        batch[text_col].to_pylist()):
            words = (t or "").lower().split()
            grams = {
                " ".join(words[k:k + n]) for k in range(len(words) - n + 1)
            }
            for g in grams:
                ids.append(i)
                gs.append(g)
                parts.append(zlib.crc32(g.encode()) & (_PAIR_PARTITIONS - 1))
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "gram": pa.array(gs, pa.string()),
                "_part": pa.array(parts, pa.int64()),
            }
        )

    grams = ds.map_batches(explode, batch_format="pyarrow")
    sizes = _pinned_payload(
        grams.groupby(id_col).aggregate(Count(alias_name="n_grams"))
    )

    inter = _pair_counts_bucketed(
        _bucket_pairs_vectorized(grams, ["gram"], id_col, df_cutoff)
    )
    inter = _nonempty_pairs(inter)
    if inter is None:
        import ray.data as rd

        id_type = ds.schema().base_schema.field(id_col).type
        return rd.from_arrow(_empty_pairs_table(id_type, "containment"))

    def score_np(nc: np.ndarray, na: np.ndarray, nb: np.ndarray):
        # same IEEE double division as DuckDB n_common / least(na, nb)
        return nc.astype(np.float64) / np.minimum(na, nb).astype(
            np.float64
        )

    if sizes.count() <= broadcast_sizes_below:
        import ray as _ray

        pdf = sizes.to_pandas()
        order = np.argsort(pdf[id_col].to_numpy())
        side_ref = _ray.put(
            (pdf[id_col].to_numpy()[order],
             pdf["n_grams"].to_numpy()[order])
        )

        def cont_broadcast(batch: pa.Table) -> pa.Table:
            ids_np, cnt_np = _ray.get(side_ref)
            a = batch["id_a"].to_numpy(zero_copy_only=False)
            b = batch["id_b"].to_numpy(zero_copy_only=False)
            pa_i = np.searchsorted(ids_np, a)
            pb_i = np.searchsorted(ids_np, b)
            if not ((ids_np[pa_i] == a).all()
                    and (ids_np[pb_i] == b).all()):
                raise RuntimeError(
                    "pair id missing from broadcast size table"
                )
            nc = batch["n_common"].to_numpy(zero_copy_only=False)
            c = pa.array(score_np(nc, cnt_np[pa_i], cnt_np[pb_i]))
            out = pa.table(
                {
                    "id_a": batch["id_a"],
                    "id_b": batch["id_b"],
                    "containment": pc.round(
                        c, 6, round_mode="half_towards_infinity"
                    ),
                }
            )
            return out.filter(pc.greater_equal(c, threshold))

        return inter.map_batches(cont_broadcast, batch_format="pyarrow")

    j1 = _attach_payload(inter, sizes, "id_a", id_col, "n_grams", "n_a",
                         num_partitions)
    j2 = _attach_payload(j1, sizes, "id_b", id_col, "n_grams", "n_b",
                         num_partitions)

    def cont(batch: pa.Table) -> pa.Table:
        c = pa.array(
            score_np(
                batch["n_common"].to_numpy(zero_copy_only=False),
                batch["n_a"].to_numpy(zero_copy_only=False),
                batch["n_b"].to_numpy(zero_copy_only=False),
            )
        )
        out = pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "containment": pc.round(
                    c, 6, round_mode="half_towards_infinity"
                ),
            }
        )
        return out.filter(pc.greater_equal(c, threshold))

    return j2.map_batches(cont, batch_format="pyarrow")


def jaccard_prefix_pairs(ds, id_col: str, text_col: str,
                         shingle_k: int = 3, threshold: float = 0.5,
                         num_partitions: int = DEFAULT_JOIN_PARTITIONS,
                         prefix_df_cutoff: int = 100_000,
                         num_buckets: int = 64):
    """EXACT Jaccard >= ``threshold`` pairs via PREFIX FILTERING (the
    PPJoin family — Chaudhuri et al. 2006, Xiao et al. 2008): order
    every document's distinct shingle hashes by (global df, hash) —
    rarest first — and keep only the first ``g - ceil(t*g) + 1`` as
    its PREFIX; two documents can reach Jaccard t ONLY if their
    prefixes intersect, so candidate generation explodes prefixes
    (a few rarest shingles per doc), never whole shingle sets.

    Unlike ``ngram_jaccard_pairs``'s hot-gram df-cutoff (which makes
    the result a lower bound when active), this operator is EXACT by
    construction: prefixes are the rarest shingles, so hot shingles
    almost never pair — and if a prefix shingle's df still exceeds
    ``prefix_df_cutoff`` the op raises LOUDLY instead of silently
    degrading (exact-or-refuse contract).

    Shape: shingle explode -> df groupby + co-keyed join back ->
    per-doc prefix selection vectorized per crc32 hash bucket (sort +
    cumcount, C-side) -> prefix-shingle pair fan-out
    (_bucket_pairs_vectorized) -> distinct pairs (int-bucket combine)
    -> exact verification via jaccard_verify_pairs. The shingle-hash
    definition is _word_shingles (md5 upper 8 bytes), so the SQL
    oracle replays everything including the (df, hash) order from the
    raw text."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    id_type = ds.schema().base_schema.field(id_col).type

    def explode(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        per_doc = []
        for t in batch[text_col].to_pylist():
            u = np.fromiter(_word_shingles(t, shingle_k), dtype=np.uint64)
            u.sort()
            # hash - 2^63 exactly for ALL uint64 values (top-bit flip
            # + reinterpret) — order-preserving, Ray-shuffle-safe int64
            per_doc.append((u ^ np.uint64(1 << 63)).view(np.int64))
        counts = np.array([len(f) for f in per_doc], np.int64)
        idx = np.repeat(np.arange(len(per_doc), dtype=np.int64), counts)
        ids_arr = batch[id_col].combine_chunks()
        return pa.table(
            {
                id_col: ids_arr.take(pa.array(idx)),
                "h": pa.array(
                    np.concatenate(per_doc) if per_doc else
                    np.array([], np.int64),
                    pa.int64(),
                ),
            }
        )

    P = num_partitions
    sh = ds.map_batches(explode, batch_format="pyarrow").materialize()
    dfs = (
        sh.groupby("h")
        .count()
        .map_batches(
            lambda b: pa.table(
                {"h": b["h"], "df": pc.cast(b["count()"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .repartition(P)
        .materialize()
    )
    if dfs.count() == 0:
        return rd.from_arrow(_empty_pairs_table(id_type, "jaccard"))
    joined = (
        sh.repartition(P)
        .join(dfs, join_type="inner", num_partitions=P, on=("h",))
        .repartition(P)
    )

    def bucket(b: pa.Table) -> pa.Table:
        import zlib

        u = pc.unique(b[id_col].combine_chunks())
        lut = {
            v: zlib.crc32(str(v).encode()) % num_buckets
            for v in u.to_pylist()
        }
        bk = pa.array([lut[v] for v in b[id_col].to_pylist()], pa.int32())
        return b.append_column("_bk", bk)

    def prefix(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values([id_col, "df", "h"], kind="mergesort")
        grp = g.groupby(id_col, sort=False)
        sizes = grp["h"].transform("size").to_numpy(np.int64)
        rn = grp.cumcount().to_numpy(np.int64)  # 0-based
        # prefix length L = g - ceil(t*g) + 1; keep rn < L (0-based ==
        # SQL row_number() <= L). ceil(t*g) is the same single float
        # op DuckDB ceil(t * g) performs — replayable.
        lim = sizes - np.ceil(threshold * sizes).astype(np.int64) + 1
        # return ARROW, not pandas: pandas-block datasets make the
        # downstream groupby/sort shuffles ~15x slower (measured
        # 42 s -> 2.7 s on the df-guard groupby at sf0.1)
        return pa.Table.from_pandas(
            g.loc[rn < lim, [id_col, "h"]], preserve_index=False
        )

    prefix_rows = (
        joined.map_batches(bucket, batch_format="pyarrow")
        .groupby("_bk")
        .map_groups(prefix, batch_format="pandas")
        .materialize()
    )

    # exact-or-refuse: a prefix shingle hotter than the cutoff means
    # the quadratic fan-out assumption broke — raise, never degrade
    n_hot = (
        prefix_rows.groupby("h")
        .count()
        .map_batches(
            lambda b: b.filter(
                pc.greater(b["count()"], prefix_df_cutoff)
            ),
            batch_format="pyarrow",
        )
        .count()
    )
    if n_hot:
        raise ValueError(
            f"jaccard_prefix_pairs: {n_hot} prefix shingle(s) exceed "
            f"prefix_df_cutoff={prefix_df_cutoff} — the prefix-filter "
            "fan-out bound does not hold on this corpus; raise the "
            "cutoff deliberately or fall back to ngram_jaccard_pairs"
        )

    tagged = prefix_rows.map_batches(
        lambda t: t.append_column(
            "_part", pc.bit_wise_and(t["h"], _PAIR_PARTITIONS - 1)
        ),
        batch_format="pyarrow",
    )
    cand = _pair_counts_bucketed(
        _bucket_pairs_vectorized(tagged, ["h"], id_col, prefix_df_cutoff),
        out_col="n_shared",
    ).select_columns(["id_a", "id_b"])

    # LENGTH filter (same literature): J(A,B) >= t forces
    # min(|A|, |B|) >= t * max(|A|, |B|) — a vectorized integer check
    # that kills most surviving candidates BEFORE the per-pair exact
    # verify (the expensive stage). The epsilon keeps a boundary pair
    # (min == t*max exactly) from being dropped by float rounding, so
    # exactness is preserved.
    sizes = _pinned_payload(
        sh.groupby(id_col).count().map_batches(
            lambda b: pa.table(
                {id_col: b[id_col], "n_sh": pc.cast(b["count()"],
                                                    pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        P,
    )
    j1 = _attach_payload(cand, sizes, "id_a", id_col, "n_sh", "n_a", P)
    j2 = _attach_payload(j1, sizes, "id_b", id_col, "n_sh", "n_b", P)

    def length_filter(b: pa.Table) -> pa.Table:
        na = b["n_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        nb = b["n_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        lo = np.minimum(na, nb)
        hi = np.maximum(na, nb)
        keep = lo.astype(np.float64) >= threshold * hi - 1e-9
        return b.select(["id_a", "id_b"]).take(
            pa.array(np.nonzero(keep)[0], pa.int64())
        )

    cand = j2.map_batches(length_filter, batch_format="pyarrow")
    return jaccard_verify_pairs(
        cand, ds, id_col, text_col, shingle_k=shingle_k,
        threshold=threshold, num_partitions=P,
    )


def dup_rate_by_source(ds, id_col: str, group_col: str, text_col: str,
                       num_partitions: int = 8):
    """Per-source exact-duplicate RATE — the curation dashboard's
    first dedup number: for each source, how many of its documents
    share their full content hash with ANY document in the corpus
    (cross-source duplicates count for both sources). Returns
    ``(source, n_docs, n_dup_docs, dup_rate_micro)`` sorted by
    source.

    Shape: one pass collapses the corpus to (md5(text), source, n)
    cells; a hash-cardinality groupby derives per-hash totals; the
    flagged per-(hash, source) counts re-aggregate by source. Parity:
    md5 == DuckDB md5 (the repo's proven device), the rate is ONE
    int/int→double division + multiply + zero-digit round.
    """
    import hashlib

    from ray.data.aggregate import Sum

    from .graph_metrics import _clamp_partitions

    def cells(b: pa.Table) -> pa.Table:
        from collections import Counter

        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        keep = pc.and_(pc.is_valid(b[group_col]),
                       pc.is_valid(b[text_col]))
        t = b.filter(keep)
        c: "Counter" = Counter()
        for s, txt in zip(t[group_col].to_pylist(),
                          t[text_col].to_pylist()):
            c[(hashlib.md5(txt.encode("utf-8")).hexdigest(), s)] += 1
        ks = list(c.keys())
        return pa.table({
            "hh": pa.array([k[0] for k in ks], pa.string()),
            "source": pa.array([k[1] for k in ks], pa.string()),
            "n": pa.array([c[k] for k in ks], pa.int64()),
        })

    hs = (
        ds.map_batches(cells, batch_format="pyarrow")
        .groupby(["hh", "source"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    totals = hs.groupby("hh").aggregate(Sum("n", alias_name="tot"))
    P = _clamp_partitions(num_partitions)
    joined = hs.repartition(P).join(
        totals.repartition(P),
        join_type="inner",
        num_partitions=P,
        on=("hh",),
    )

    def per_source(b: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        dup = pc.if_else(pc.greater(b["tot"], 1), b["n"],
                         pa.array([0] * len(b), pa.int64()))
        return pa.table({
            "source": b["source"],
            "nd": pc.cast(b["n"], pa.int64()),
            "dd": pc.cast(dup, pa.int64()),
        })

    agg = (
        joined.map_batches(per_source, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("nd", alias_name="n_docs"),
                   Sum("dd", alias_name="n_dup_docs"))
        .to_pandas()
    )
    import numpy as np
    import pandas as pd

    agg = agg.sort_values("source").reset_index(drop=True)
    nd = agg["n_docs"].to_numpy(np.int64)
    dd = agg["n_dup_docs"].to_numpy(np.int64)
    raw = pa.array(1e6 * (dd.astype(np.float64) / nd.astype(np.float64)),
                   pa.float64())
    rate = pc.cast(
        pc.round(raw, ndigits=0, round_mode="half_towards_infinity"),
        pa.int64(),
    ).to_numpy(zero_copy_only=False)
    return pd.DataFrame({
        "source": agg["source"].to_numpy(),
        "n_docs": nd,
        "n_dup_docs": dd,
        "dup_rate_micro": rate,
    })


def simhash_hamming_histogram(ds, id_col: str, text_col: str,
                              sample_n: int = 256, salt: str = "shh"):
    """Pairwise SimHash Hamming-distance distribution on a
    deterministic md5-rank sample — ``(hamming, n_pairs)`` sorted by
    distance. The banding-parameter calibration companion to
    :func:`simhash_near_pairs`: it shows where the corpus's
    similarity mass sits relative to the ``max_hamming`` cutoff
    (choose bands from the valley, not by folklore).

    Scale shape: the sample selection is one streaming prefiltered
    scan (the pq_codes adaptive hash-threshold device), SimHash runs
    only on the sampled rows, and the quadratic popcount is
    sample-bounded driver math on 64-bit ints. The signed int64
    storage bias (value − 2^63) XORs out pairwise, so distances need
    no unbiasing."""
    import ray.data as rd

    if sample_n < 2:
        raise ValueError("sample_n must be >= 2")
    out_schema = pa.schema([
        pa.field("hamming", pa.int64()),
        pa.field("n_pairs", pa.int64()),
    ])
    n = ds.count()
    if n < 2:
        return rd.from_arrow(out_schema.empty_table())
    from .similarity import hash_rank_sample

    sampled = hash_rank_sample(ds, id_col, [text_col], sample_n, salt)
    rows = simhash_values(sampled, id_col, text_col).take_all()
    if len(rows) < 2:
        return rd.from_arrow(out_schema.empty_table())
    vals = [int(r["simhash"]) & ((1 << 64) - 1) for r in rows]
    hist = np.zeros(65, np.int64)
    for i in range(len(vals)):
        vi = vals[i]
        for j in range(i + 1, len(vals)):
            hist[(vi ^ vals[j]).bit_count()] += 1
    nz = np.flatnonzero(hist)
    return rd.from_arrow(pa.table({
        "hamming": pa.array(nz, pa.int64()),
        "n_pairs": pa.array(hist[nz], pa.int64()),
    }))


def minhash_calibration_histogram(ds, id_col: str, text_col: str,
                                  num_perm: int = 64, bands: int = 16,
                                  shingle_k: int = 3, seed: int = 7,
                                  df_cutoff: int = 2000,
                                  bin_micro: int = 100_000,
                                  bin_lo: int = -10, bin_hi: int = 9):
    """MinHash-estimate vs exact-Jaccard calibration over the LSH
    candidate pairs: per pair, the signature agreement estimate
    ``(eq · 1e6) // num_perm`` minus the exact shingle Jaccard in
    micro, bucketed into ``bin_micro``-wide error bins —
    ``(err_bin, n_pairs)`` sorted by bin. THE parameter-tuning op for
    the near-dup family: it shows whether 64 permutations are enough
    for the corpus's similarity range (estimator bias/variance in one
    table) before anyone trusts a 0.5 threshold.

    Shape: candidates come from the production LSH path (same
    df_cutoff, byte-identical buckets); signatures and shingle sets
    attach as packed-binary payloads via the established distributed
    pair joins (no driver pair state); the estimate is pure int
    (floor division), the exact side is one division + zero-digit
    round, the bin one float floor — all replayed by the oracle."""
    import ray.data as rd

    out_schema = pa.schema([
        pa.field("err_bin", pa.int64()),
        pa.field("n_pairs", pa.int64()),
    ])
    cand = _nonempty_pairs(
        minhash_lsh_candidates(ds, id_col, text_col, num_perm, bands,
                               shingle_k, seed, df_cutoff)
    )
    if cand is None:
        return rd.from_arrow(out_schema.empty_table())

    def pack_sig(batch: pa.Table) -> pa.Table:
        blobs = [
            np.asarray(s, dtype=np.int64).tobytes()
            for s in batch["signature"].to_pylist()
        ]
        return pa.table({
            id_col: batch[id_col],
            "sigblob": pa.array(blobs, pa.large_binary()),
        })

    sigs = (
        minhash_signatures(ds, id_col, text_col, num_perm, shingle_k,
                           seed)
        .map_batches(pack_sig, batch_format="pyarrow")
        .materialize()
    )
    shs = shingle_signatures(ds, id_col, text_col, shingle_k).materialize()
    j = _attach_payload(cand, sigs, "id_a", id_col, "sigblob", "sig_a")
    j = _attach_payload(j, sigs, "id_b", id_col, "sigblob", "sig_b")
    j = _attach_payload(j, shs, "id_a", id_col, "shingles", "sh_a")
    j = _attach_payload(j, shs, "id_b", id_col, "shingles", "sh_b")
    span = bin_hi - bin_lo + 1

    def partial(batch: pa.Table) -> pa.Table:
        from ..stages.chunking import pin_arrow_threads

        pin_arrow_threads()
        bins = np.zeros(span, np.int64)
        for sa_b, sb_b, ha_b, hb_b in zip(
            batch["sig_a"].to_pylist(), batch["sig_b"].to_pylist(),
            batch["sh_a"].to_pylist(), batch["sh_b"].to_pylist(),
        ):
            sa = np.frombuffer(sa_b, dtype=np.int64)
            sb = np.frombuffer(sb_b, dtype=np.int64)
            ha = np.frombuffer(ha_b, dtype=np.uint64)
            hb = np.frombuffer(hb_b, dtype=np.uint64)
            if len(ha) == 0 or len(hb) == 0:
                continue
            eq = int((sa == sb).sum())
            est = (eq * 1_000_000) // num_perm
            inter = len(np.intersect1d(ha, hb, assume_unique=True))
            jac = 1e6 * (float(inter)
                         / float(len(ha) + len(hb) - inter))
            exact = int(pc.round(
                pa.array([jac], pa.float64()), ndigits=0,
                round_mode="half_towards_infinity",
            ).cast(pa.int64())[0].as_py())
            b = int(np.floor(float(est - exact) / float(bin_micro)))
            bins[min(max(b, bin_lo), bin_hi) - bin_lo] += 1
        nz = np.flatnonzero(bins)
        return pa.table({
            "err_bin": pa.array(nz + bin_lo, pa.int64()),
            "n": pa.array(bins[nz], pa.int64()),
        })

    return (
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("err_bin")
        .sum("n")
        .map_batches(
            lambda t: pa.table({
                "err_bin": t["err_bin"],
                "n_pairs": pc.cast(t["sum(n)"], pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .sort("err_bin")
    )
