"""Deduplication operators for large-scale training-data pipelines.

Each operator is a Dataset -> Dataset transform with its shuffle key
documented. The exact-dedup shape mirrors the reference's
``(document_id, lower(name))`` node identity groupby (D1/D6,
``eschergraph/builder/build_pipeline.py:227-247``,
``eschergraph/graph/node.py:90-105``); the near-dup family follows the
standard published constructions (MinHash+LSH banding, SimHash, n-gram
Jaccard) implemented on numpy inside ``map_batches``.

Scale notes: candidate generation is always a groupby on a small key
(content hash / band bucket / simhash band); pair verification joins
text back by hashing the id — at sandbox scale the text side is
broadcast, at 100 TB it becomes a hash join on doc id. Candidate-pair
outputs are deduplicated per unordered pair.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = (1 << 61) - 1


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
    words = (text or "").lower().split()
    if len(words) < k:
        if not words:
            return set()
        return {
            int.from_bytes(
                hashlib.blake2b(" ".join(words).encode(), digest_size=8).digest(), "big"
            )
        }
    out = set()
    h = hashlib.blake2b
    for i in range(len(words) - k + 1):
        out.add(
            int.from_bytes(h(" ".join(words[i : i + k]).encode(), digest_size=8).digest(), "big")
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


def minhash_lsh_candidates(
    ds,
    id_col: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 7,
):
    """Candidate near-dup pairs via LSH banding.
    Pipeline: signature (map) -> explode (band_id, band_hash, id) ->
    groupby band bucket (THE shuffle) -> pairs within bucket -> distinct
    unordered pairs."""
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

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group[id_col].to_pylist()))
        a_, b_ = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_.append(ids[i])
                b_.append(ids[j])
        return pa.table({"id_a": pa.array(a_), "id_b": pa.array(b_)})

    pairs = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    from ray.data.aggregate import Count

    return (
        pairs.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n_bands")).select_columns(
            ["id_a", "id_b"]
        )
    )


def jaccard_verify_pairs(pairs_ds, docs_ds, id_col: str, text_col: str,
                         shingle_k: int = 3, threshold: float = 0.7):
    """Verify candidate pairs by exact shingle Jaccard.

    The doc side is broadcast via ``ray.put`` (small-side lookup read
    once per task, not re-shipped per batch); at 100 TB this becomes a
    hash join of pairs against docs on id."""
    import ray

    id_to_text = {}
    for b in docs_ds.select_columns([id_col, text_col]).iter_batches(batch_format="pyarrow"):
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            id_to_text[i] = t
    ref = ray.put(id_to_text)

    class Verify:
        def __init__(self):
            self.docs = ray.get(ref)
            self.cache: dict = {}

        def _sh(self, i):
            s = self.cache.get(i)
            if s is None:
                s = _word_shingles(self.docs.get(i, ""), shingle_k)
                self.cache[i] = s
            return s

        def __call__(self, batch: pa.Table) -> pa.Table:
            keep_a, keep_b, jac = [], [], []
            for a, b in zip(batch["id_a"].to_pylist(), batch["id_b"].to_pylist()):
                sa, sb = self._sh(a), self._sh(b)
                if not sa or not sb:
                    continue
                inter = len(sa & sb)
                j = inter / (len(sa) + len(sb) - inter)
                if j >= threshold:
                    keep_a.append(a)
                    keep_b.append(b)
                    jac.append(round(j, 6))
            return pa.table(
                {
                    "id_a": pa.array(keep_a),
                    "id_b": pa.array(keep_b),
                    "jaccard": pa.array(jac, pa.float64()),
                }
            )

    return pairs_ds.map_batches(Verify, batch_format="pyarrow", concurrency=2)


def simhash_values(ds, id_col: str, text_col: str):
    """64-bit SimHash per doc over word-token hashes."""

    def sh(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch[text_col].to_pylist():
            acc = np.zeros(64, dtype=np.int64)
            for w in (t or "").lower().split():
                hv = int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
                )
                bits = np.fromiter(((hv >> i) & 1 for i in range(64)), dtype=np.int64)
                acc += 2 * bits - 1
            v = 0
            for i in range(64):
                if acc[i] > 0:
                    v |= 1 << i
            out.append(v - (1 << 63))  # store as signed int64
        return pa.table({id_col: batch[id_col], "simhash": pa.array(out, pa.int64())})

    return ds.map_batches(sh, batch_format="pyarrow")


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
        return pa.table(
            {"id_a": pa.array(a_), "id_b": pa.array(b_), "hamming": pa.array(d_, pa.int32())}
        )

    from ray.data.aggregate import Min

    cand = (
        sigs.map_batches(explode, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(pairs, batch_format="pyarrow")
    )
    return (
        cand.groupby(["id_a", "id_b"]).aggregate(Min("hamming", alias_name="hamming"))
    )


def ngram_jaccard_pairs(ds, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5):
    """EXACT n-gram (word) Jaccard similar pairs — SQL-checkable.

    explode distinct n-grams -> groupby n-gram -> pairs -> count common
    (one groupby-pairs shuffle) -> jaccard vs per-doc distinct counts
    (broadcast small map)."""
    import ray
    from ray.data.aggregate import Count

    def explode(batch: pa.Table) -> pa.Table:
        ids, gs = [], []
        for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            words = (t or "").lower().split()
            grams = {" ".join(words[k : k + n]) for k in range(len(words) - n + 1)}
            for g in grams:
                ids.append(i)
                gs.append(g)
        return pa.table({id_col: pa.array(ids), "gram": pa.array(gs, pa.string())})

    grams = ds.map_batches(explode, batch_format="pyarrow")
    counts = {}
    for b in grams.groupby(id_col).aggregate(Count(alias_name="n_grams")).iter_batches(
        batch_format="pyarrow"
    ):
        for i, c in zip(b[id_col].to_pylist(), b["n_grams"].to_pylist()):
            counts[i] = c
    ref = ray.put(counts)

    def gram_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group[id_col].to_pylist()))
        a_, b_ = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a_.append(ids[i])
                b_.append(ids[j])
        return pa.table({"id_a": pa.array(a_), "id_b": pa.array(b_)})

    inter = (
        grams.groupby("gram")
        .map_groups(gram_pairs, batch_format="pyarrow")
        .groupby(["id_a", "id_b"])
        .aggregate(Count(alias_name="n_common"))
    )

    class Jac:
        def __init__(self):
            self.counts = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["id_a"].to_pylist()
            b = batch["id_b"].to_pylist()
            c = batch["n_common"].to_pylist()
            jac = [
                ci / (self.counts[ai] + self.counts[bi] - ci)
                for ai, bi, ci in zip(a, b, c)
            ]
            out = batch.append_column("jaccard", pa.array(jac, pa.float64()))
            return out.filter(pc.greater_equal(out["jaccard"], threshold))

    def round6(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("jaccard"),
            "jaccard",
            pc.round(batch["jaccard"], 6),
        )

    return (
        inter.map_batches(Jac, batch_format="pyarrow", concurrency=2)
        .map_batches(round6, batch_format="pyarrow")
        .select_columns(["id_a", "id_b", "jaccard"])
    )


def embedding_near_dup_pairs(ds, id_col: str, vec_col: str, threshold: float = 0.9):
    """Cosine near-dup pairs over an embedding column.

    Sandbox path: broadcast the (small) normalized matrix once via
    ``ray.put`` and scan batches against it (numpy matmul) — no O(n^2)
    shuffle. Scale path: LSH-bucket by hyperplane signs first (same
    banding shape as simhash) then pair within buckets."""
    import ray

    ids_all, vecs = [], []
    for b in ds.select_columns([id_col, vec_col]).iter_batches(batch_format="pyarrow"):
        ids_all.extend(b[id_col].to_pylist())
        n = len(b)
        m = np.asarray(b[vec_col].combine_chunks().flatten(), dtype=np.float64).reshape(n, -1)
        vecs.append(m)
    mat = np.vstack(vecs)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1
    mat = mat / norms
    ref = ray.put((ids_all, mat))

    class Score:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)
            self.pos = {i: k for k, i in enumerate(self.ids)}

        def __call__(self, batch: pa.Table) -> pa.Table:
            n = len(batch)
            q = np.asarray(
                batch[vec_col].combine_chunks().flatten(), dtype=np.float64
            ).reshape(n, -1)
            qn = np.linalg.norm(q, axis=1, keepdims=True)
            qn[qn == 0] = 1
            q = q / qn
            # round(4) before thresholding: keeps the cut bit-identical
            # with the float32-accumulating SQL oracle
            sims = np.round(q @ self.mat.T, 4)
            a_, b_, s_ = [], [], []
            for r, qid in enumerate(batch[id_col].to_pylist()):
                hits = np.nonzero(sims[r] >= threshold)[0]
                for h in hits:
                    oid = self.ids[h]
                    if qid < oid:  # unordered pair once, no self
                        a_.append(qid)
                        b_.append(oid)
                        s_.append(float(sims[r, h]))
            return pa.table(
                {
                    "id_a": pa.array(a_),
                    "id_b": pa.array(b_),
                    "cosine": pa.array(s_, pa.float64()),
                }
            )

    return ds.map_batches(Score, batch_format="pyarrow", concurrency=2)
