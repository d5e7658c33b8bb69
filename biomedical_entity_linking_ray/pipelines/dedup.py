"""Deduplication operators over the `documents` table.

The training-data dedup family, each expressed Ray-Data-first:

- exact dedup          hash-partition on sha256(text) + per-group min
- MinHash + LSH        shingle -> minhash -> band -> bucket groupby -> verify
- SimHash              64-bit simhash + banded prefix buckets + Hamming verify
- n-gram Jaccard       exact trigram-set Jaccard on co-bucketed candidates
- embedding cosine     near-dup by cosine over the embeddings table

Reference analogs: D1 exact dedup (bigbio_utils.py:256-268); candidate
generation + similarity scoring (scispacy_embeddings.py / sapbert utils) --
near-dup IS the product in the target domain (SURVEY.md 2.7 note).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min

from biomedical_entity_linking_ray.functions import hashing
from biomedical_entity_linking_ray.functions.vectors import (
    binary_column_to_matrix,
    list_column_to_matrix,
)


def _read_docs(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(sf_dir: str, broadcast_max: int = 500_000) -> "ray.data.Dataset":
    """(doc_id, canonical_id): canonical = min doc_id among identical texts.

    Pattern: vectorized sha256 inside map_batches, then ONE groupby-min on the
    hash (hash-partition + per-group first) attached back -- no text moves
    through the shuffle, only (sha, id). The canonical map is broadcast while
    it fits (worker-cached dict, no join actor fleet); hash join beyond."""
    import ray as _ray

    from biomedical_entity_linking_ray.functions.joins import cached_broadcast, hash_join

    def add_sha(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "sha": hashing.sha256_hex_batch(t["text"])})

    keyed = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_sha, batch_format="pyarrow", batch_size=4096
    ).materialize()  # branch-consumed: canon aggregate + attach
    canon = keyed.groupby("sha").aggregate(
        Min("doc_id", alias_name="canonical_id")).materialize()
    if canon.count() <= broadcast_max:
        from biomedical_entity_linking_ray.functions.joins import (
            broadcast_attach_column)

        return broadcast_attach_column(
            keyed, canon.to_pandas(), "sha", "canonical_id",
        ).select_columns(["doc_id", "canonical_id"])
    return hash_join(keyed, canon, "inner", 8, on=("sha",)).select_columns(
        ["doc_id", "canonical_id"]
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

class _DocSketcher:
    """MinHash permutation table built once per worker; emits per-doc signature."""

    def __init__(self, num_perm: int, shingle_k: int, seed: int):
        self.h = hashing.MinHasher(num_perm, seed)
        self.k = shingle_k
        self.num_perm = num_perm

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        for i, s in enumerate(texts):
            sigs[i] = self.h.signature(hashing.char_shingle_hashes(s, self.k, 4096))
        return pa.table({
            "doc_id": t["doc_id"],
            "sig": pa.array([sigs[i].tobytes() for i in range(n)], pa.binary()),
        })


# Per-worker-process sketcher cache (same pattern as normalize._extract_batch):
# stateless tasks reuse long-lived Ray workers, so the permutation table builds
# once per worker with no actor-pool CPU reservation -- a reserved pool here
# can deadlock against join aggregators when the dataset is branch-consumed.
_SKETCHER_CACHE: dict[tuple, _DocSketcher] = {}


def _sketch_batch(t: pa.Table, num_perm: int, shingle_k: int, seed: int) -> pa.Table:
    key = (num_perm, shingle_k, seed)
    sk = _SKETCHER_CACHE.get(key)
    if sk is None:
        sk = _DocSketcher(num_perm, shingle_k, seed)
        _SKETCHER_CACHE[key] = sk
    return sk(t)


def minhash_near_dup_pairs(
    sf_dir: str,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 4,
    jaccard_threshold: float = 0.6,
    seed: int = 42,
    spill_dir: str | None = None,
    docs: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """(id_a, id_b, jaccard_est) candidate near-dup pairs above threshold.
    `docs` overrides the (doc_id, text) corpus scan (derived-corpus hooks,
    e.g. the non-ASCII parity query).

    shingle+minhash per batch -> vectorized explode of SKINNY (bucket, doc)
    rows (bucket = splitmix64-mixed band hash, one int64 -- band identity is
    preserved up to a 2^-64 cross-band collision) -> singleton drop + coarse
    bucket groupby -> within-bucket pairs with the signatures delivered by
    `within_key_pairs`' payload path (broadcast while the sketch table fits,
    ONE enrich join beyond -- never sig x bands through the shuffle),
    Jaccard-verified in the same pass -> cross-band dedup by max estimate.

    The sketch table (id + num_perm*8 bytes/doc; text dropped) is consumed by
    both the explode and the payload side, so it is pinned once -- in the
    object store by default (spills under pressure), or as a Parquet
    checkpoint when `spill_dir` is given (the 100-TB path: lineage on disk,
    object store stays free).
    """
    import functools

    src = docs if docs is not None else _read_docs(sf_dir, ["doc_id", "text"])
    sketches = src.map_batches(
        functools.partial(_sketch_batch, num_perm=num_perm,
                          shingle_k=shingle_k, seed=seed),
        batch_format="pyarrow", batch_size=1024,
    )
    if spill_dir is not None:
        sketches.write_parquet(spill_dir)
        sketches = ray.data.read_parquet(spill_dir)
    else:
        sketches = sketches.materialize()

    band_salt = hashing.splitmix64(np.arange(1, bands + 1, dtype=np.uint64))

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        sigs = binary_column_to_matrix(t["sig"], np.uint64, num_perm)
        bh = hashing.band_hashes_batch(sigs, bands)          # (n, bands)
        bucket = hashing.splitmix64(
            (bh ^ band_salt[None, :]).ravel()).view(np.int64)
        ids = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), bands)
        return pa.table({
            "bucket": pa.array(bucket),
            "doc_id": pa.array(ids, pa.int64()),
        })

    buckets = sketches.map_batches(explode, batch_format="pyarrow", batch_size=2048)

    from biomedical_entity_linking_ray.functions.candidate_pairs import within_key_pairs
    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate

    def emit(g: pd.DataFrame, ia: np.ndarray, ib: np.ndarray) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy()
        if len(ia) == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 "jaccard_est": pd.Series(dtype=np.float64)})
        sigs = np.frombuffer(b"".join(g["sig"].tolist()), dtype=np.uint64
                             ).reshape(len(g), num_perm)
        j = (sigs[ia] == sigs[ib]).mean(axis=1)
        keep = j >= jaccard_threshold
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "jaccard_est": j[keep]})

    pairs = within_key_pairs(buckets, "bucket", "doc_id", emit=emit,
                             payload=sketches)
    return bucketed_aggregate(pairs, ["id_a", "id_b"],
                              {"jaccard_est": ("jaccard_est", "max")})


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash_near_dup_pairs(
    sf_dir: str, max_hamming: int = 8, prefix_bits: int = 12,
    spill_dir: str | None = None, all_pairs_max: int = 64,
) -> "ray.data.Dataset":
    """(id_a, id_b, hamming): SimHash with rotated-prefix bucketing.

    4 rotations x 12-bit prefixes bucket candidates (near-identical simhashes
    share at least one rotated prefix whp), Hamming-verified within buckets.
    The sketch table (16 B/doc) is pinned in the object store by default;
    pass `spill_dir` to land it as Parquet instead (the 10^12-doc path, same
    contract as minhash_near_dup_pairs).
    """

    def sketch(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        hs = np.fromiter(
            (hashing.simhash64(hashing.token_hashes(s)) for s in texts),
            dtype=np.uint64, count=len(texts),
        )
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(hs)})

    sk = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        sketch, batch_format="pyarrow", batch_size=2048
    )
    if spill_dir is not None:
        sk.write_parquet(spill_dir)
        sk = ray.data.read_parquet(spill_dir)
    else:
        sk = sk.materialize()

    rotations = 4

    def explode(t: pa.Table) -> pa.Table:
        # fully vectorized: bucket = r * 2^prefix_bits + prefix (one int64,
        # bijective with the (rotation, prefix) pair). The 8-byte simhash
        # payload rides the bucket row -- skinnier than any id join.
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        hs = np.asarray(t["simhash"].to_pylist(), dtype=np.uint64)
        keys = np.empty(rotations * hs.size, dtype=np.int64)
        for r in range(rotations):
            rot = ((hs << np.uint64(r * 16)) | (hs >> np.uint64(64 - r * 16))).astype(np.uint64)
            pref = (rot >> np.uint64(64 - prefix_bits)).astype(np.int64)
            keys[r * hs.size:(r + 1) * hs.size] = (np.int64(r) << np.int64(prefix_bits)) + pref
        return pa.table({
            "bucket": pa.array(keys),
            "doc_id": pa.array(np.tile(ids, rotations), pa.int64()),
            "simhash": pa.array(np.tile(hs, rotations)),
        })

    buckets = sk.map_batches(explode, batch_format="pyarrow", batch_size=2048)

    from biomedical_entity_linking_ray.functions.candidate_pairs import within_key_pairs
    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate

    def emit(g: pd.DataFrame, ia: np.ndarray, ib: np.ndarray) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        d = hashing.hamming64(hs[ia], hs[ib]) if len(ia) else np.array([], np.int64)
        keep = d <= max_hamming
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "hamming": d[keep]})

    pairs = within_key_pairs(buckets, "bucket", "doc_id", emit=emit,
                             all_pairs_max=all_pairs_max)
    return bucketed_aggregate(pairs, ["id_a", "id_b"], {"hamming": ("hamming", "min")})


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, verified on co-bucketed candidates)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    sf_dir: str, n: int = 3, threshold: float = 0.5,
    candidates: "ray.data.Dataset | None" = None,
    spill_dir: str | None = None,
) -> "ray.data.Dataset":
    """(id_a, id_b, jaccard) with EXACT token-n-gram Jaccard >= threshold.

    Candidates are any (id_a, id_b) pair Dataset -- pass the output of a
    sketch-based candidate generator to share it across verifiers; by default
    one MinHash-LSH banding pass runs at threshold 0 (candidates only, no
    second cascade). The verify step recomputes exact n-gram sets from the
    text via a feature join, so the output is an exact-similarity operator,
    not an estimate.
    """
    cand = candidates if candidates is not None else \
        minhash_near_dup_pairs(sf_dir, jaccard_threshold=0.0)
    cand = cand.select_columns(["id_a", "id_b"])

    def gram_sets(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        out = []
        for s in texts:
            toks = s.split()
            grams = {" ".join(toks[i:i + n]) for i in range(max(0, len(toks) - n + 1))}
            arr = np.fromiter((hashing.fnv1a_str(g) for g in grams), dtype=np.uint64,
                              count=len(grams))
            out.append(np.sort(arr).tobytes())
        return pa.table({"doc_id": t["doc_id"], "grams": pa.array(out, pa.binary())})

    feats = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        gram_sets, batch_format="pyarrow", batch_size=2048
    )
    if spill_dir is not None:  # 10^12-doc path: gram sets land as Parquet
        feats.write_parquet(spill_dir)
        feats = ray.data.read_parquet(spill_dir)
    else:
        feats = feats.materialize()

    from biomedical_entity_linking_ray.functions.joins import hash_join, heal_projection

    _J1_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                            ("grams_a", pa.binary())])
    j1 = hash_join(cand, feats, "inner", 8, on=("id_a",), right_on=("doc_id",))
    j1 = j1.map_batches(
        heal_projection(_J1_SCHEMA, lambda t: pa.table(
            {"id_a": t["id_a"], "id_b": t["id_b"], "grams_a": t["grams"]})),
        batch_format="pyarrow",
    )
    j2 = hash_join(j1, feats, "inner", 8, on=("id_b",), right_on=("doc_id",))

    def _flat_u64(col) -> tuple[np.ndarray, np.ndarray]:
        """Zero-ish-copy flatten of a binary column of packed uint64 arrays:
        (concatenated values, per-row element counts). One memcpy of the
        Arrow data buffer; no per-row Python bytes objects."""
        arr = col.combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], np.int32)[
            arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], np.uint8)
        vals = data[offs[0]:offs[-1]].copy().view(np.uint64)
        return vals, np.diff(offs) // 8

    def verify(t: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                          "jaccard": pa.array([], pa.float64())})
        if t.num_columns == 0 or t.num_rows == 0:
            return empty
        # fully vectorized batch intersection (the shape proven in
        # ngram_jaccard_exact, adapted to one-array-pair-per-row): tag every
        # gram with its pair index, one lexsort over (pair, value), and a
        # value repeated within a pair == present on both sides (each side is
        # distinct by construction) -- intersection sizes fall out of one
        # bincount over the duplicate positions. No per-pair Python loop.
        n_pairs = t.num_rows
        va, sa = _flat_u64(t["grams_a"])
        vb, sb = _flat_u64(t["grams"])
        pair_of = np.concatenate([np.repeat(np.arange(n_pairs), sa),
                                  np.repeat(np.arange(n_pairs), sb)])
        vals = np.concatenate([va, vb])
        order = np.lexsort((vals, pair_of))
        sv, sp = vals[order], pair_of[order]
        dup = (sv[1:] == sv[:-1]) & (sp[1:] == sp[:-1])
        inter = np.bincount(sp[1:][dup], minlength=n_pairs)
        union = sa + sb - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = (union > 0) & (jac >= threshold)
        idx = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table({"id_a": t["id_a"].take(idx),
                         "id_b": t["id_b"].take(idx),
                         "jaccard": pa.array(jac[keep], pa.float64())})

    return j2.map_batches(verify, batch_format="pyarrow")


_WS_TOKEN = None  # compiled lazily: explicit ASCII whitespace class so the
# tokenizer is reproducible in RE2-based SQL engines (unicode \s differs)


def ngram_jaccard_exact(
    sf_dir: str, n: int = 3, threshold: float = 0.5, chunk: int = 1000,
) -> "ray.data.Dataset":
    """(id_a, id_b, jaccard): EXACT all-pairs token-n-gram Jaccard >= threshold.

    The brute-force baseline next to the LSH-candidate variant above (same
    relationship as embedding_near_dup_exact vs the hyperplane-LSH pairs):
    chunk-pair Ray tasks, each holding two chunks' sorted distinct gram-hash
    arrays from the object store; per a-doc one vectorized searchsorted
    against the b-chunk's concatenated grams + segment-sum. Data never flows
    through the driver. O(B^2) tasks -- exactness costs all-pairs; the LSH
    path is the 100-TB route.

    Gram identity is a 64-bit FNV hash (collision odds ~|grams|^2 / 2^64);
    tokens split on the explicit ASCII whitespace class so a SQL oracle
    tokenizes identically.
    """
    import re

    import ray as _ray

    global _WS_TOKEN
    if _WS_TOKEN is None:
        _WS_TOKEN = re.compile(r"[^ \t\n\r]+")
    path = os.path.join(sf_dir, "documents.parquet")
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    n_rows = pf.metadata.num_rows

    @_ray.remote
    def load(offset: int, count: int):
        t = pq.read_table(path, columns=["doc_id", "text"]).slice(offset, count)
        ids = t["doc_id"].to_numpy()
        grams, offs = [], [0]
        sizes = np.empty(len(ids), np.int64)
        for i, s in enumerate(t["text"].to_pylist()):
            toks = _WS_TOKEN.findall(s)
            gs = {" ".join(toks[j:j + n]) for j in range(max(0, len(toks) - n + 1))}
            arr = np.sort(np.fromiter((hashing.fnv1a_str(g) for g in gs),
                                      dtype=np.uint64, count=len(gs)))
            grams.append(arr)
            sizes[i] = arr.size
            offs.append(offs[-1] + arr.size)
        return ids, np.concatenate(grams) if grams else np.zeros(0, np.uint64), \
            np.asarray(offs, np.int64), sizes

    @_ray.remote
    def score(ca, cb, same: bool):
        ia, ga, offa, sa = ca
        ib, gb, offb, sb = cb
        out_a, out_b, out_j = [], [], []
        for i in range(len(ia)):
            a_arr = ga[offa[i]:offa[i + 1]]
            if a_arr.size == 0:
                continue
            idx = np.searchsorted(a_arr, gb)
            np.clip(idx, 0, a_arr.size - 1, out=idx)
            hit = (a_arr[idx] == gb).astype(np.int64)
            if gb.size:
                # reduceat gotchas: an empty trailing segment would index past
                # the end, and an empty segment yields hit[start] not 0 --
                # clip the starts and zero empty segments explicitly
                starts = np.minimum(offb[:-1], gb.size - 1)
                inter = np.add.reduceat(hit, starts)
                inter[sb == 0] = 0
            else:
                inter = np.zeros(len(ib), np.int64)
            union = sa[i] + sb - inter
            with np.errstate(invalid="ignore", divide="ignore"):
                jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
            keep = jac >= threshold
            if same:
                keep &= ib > ia[i]  # upper triangle within the same chunk
            for j in np.flatnonzero(keep):
                lo, hi = (ia[i], ib[j]) if ia[i] < ib[j] else (ib[j], ia[i])
                out_a.append(lo); out_b.append(hi); out_j.append(jac[j])
        return pa.table({"id_a": pa.array(out_a, pa.int64()),
                         "id_b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(out_j, pa.float64())})

    chunks = [load.remote(o, chunk) for o in range(0, n_rows, chunk)]
    parts = [score.remote(chunks[i], chunks[j], i == j)
             for i in range(len(chunks)) for j in range(i, len(chunks))]
    if not parts:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64())}))
    # assemble from refs: pair tables become dataset blocks IN the object
    # store -- nothing flows through the driver
    return ray.data.from_arrow_refs(parts)


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup_exact(
    sf_dir: str, threshold: float = 0.4,
) -> "ray.data.Dataset":
    """(id_a, id_b, cosine): EXACT all-pairs cosine >= threshold.

    Ray Data has no cross join, so this is the one operator family expressed
    with raw Ray tasks (SURVEY.md guidance: raw tasks only where the Dataset
    API can't): one task per parquet row group loads + unit-normalizes its
    chunk into the object store, then one task per (i <= j) chunk pair does a
    single matmul and emits only the passing pairs. Data never flows through
    the driver: pair tables are assembled into dataset blocks from object
    refs; the driver holds only row-group metadata. O(B^2) tasks in the chunk
    count -- the brute-force baseline; `embedding_near_dup_pairs` (hyperplane
    LSH) is the at-scale path.

    Cosines are rounded to 4 decimals BEFORE thresholding so the result is
    reproducible against a SQL oracle.
    """
    import ray as _ray

    path = os.path.join(sf_dir, "embeddings.parquet")
    import pyarrow.parquet as pq

    n_rg = pq.ParquetFile(path).metadata.num_row_groups

    @_ray.remote
    def load(i: int):
        t = pq.ParquetFile(path).read_row_group(i, columns=["vec_id", "embedding"])
        V = list_column_to_matrix(t["embedding"], np.float64)
        nrm = np.linalg.norm(V, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        return t["vec_id"].to_numpy(), V / nrm

    @_ray.remote
    def score(ca, cb, same: bool):
        (ia, A), (ib, B) = ca, cb
        S = np.round(A @ B.T, 4)
        if same:
            iu = np.triu_indices(len(ia), k=1)
            sel = S[iu] >= threshold
            aa, bb, cc = ia[iu[0][sel]], ib[iu[1][sel]], S[iu][sel]
        else:
            r, c = np.nonzero(S >= threshold)
            aa, bb, cc = ia[r], ib[c], S[r, c]
        lo = np.minimum(aa, bb)
        hi = np.maximum(aa, bb)
        return pa.table({"id_a": pa.array(lo, pa.int64()),
                         "id_b": pa.array(hi, pa.int64()),
                         "cosine": pa.array(cc, pa.float64())})

    chunks = [load.remote(i) for i in range(n_rg)]
    parts = [score.remote(chunks[i], chunks[j], i == j)
             for i in range(n_rg) for j in range(i, n_rg)]
    if not parts:
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64())}))
    # assemble from refs: pair tables become dataset blocks IN the object
    # store -- nothing flows through the driver
    return ray.data.from_arrow_refs(parts)


def embedding_near_dup_pairs(
    sf_dir: str, threshold: float = 0.3, lsh_planes: int = 12, rotations: int = 3,
    seed: int = 42, all_pairs_max: int = 64, dtype=np.float32,
    spill_dir: str | None = None,
) -> "ray.data.Dataset":
    """(id_a, id_b, cosine) over the embeddings table, cosine >= threshold.

    Random-hyperplane LSH buckets (rotations x sign-prefix) bound the pair
    enumeration; exact cosine verification inside each bucket (rounded to 4
    decimals BEFORE thresholding, the SQL-reproducibility convention).
    Exploded rows are SKINNY (bucket = r * 2^planes + sign-code int64,
    vec_id); the unit vectors are computed once into a payload table and
    delivered by `within_key_pairs`' broadcast/enrich path -- never
    unit x rotations through the bucket shuffle.

    `lsh_planes=0` is the oracle config: zero hyperplanes put every vector in
    one bucket, so with `all_pairs_max >= n` the in-bucket verify enumerates
    every pair and the exact cross-join DuckDB oracle applies verbatim --
    checking the explode/bucket/verify/agg plumbing end to end (pass
    dtype=np.float64 there; float32 is the at-scale wire format).
    """
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding"])
    rng = np.random.RandomState(seed)
    planes = [rng.randn(lsh_planes, 64).astype(np.float32) for _ in range(rotations)]
    import ray as _ray
    planes_ref = _ray.put(planes)

    def unitize(t: pa.Table) -> pa.Table:
        vecs = list_column_to_matrix(t["embedding"], dtype)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        return pa.table({
            "vec_id": t["vec_id"],
            "unit": pa.array([unit[i].tobytes() for i in range(len(unit))],
                             pa.binary()),
        })

    units = emb.map_batches(unitize, batch_format="pyarrow", batch_size=2048)
    if spill_dir is not None:  # 10^12-doc path: unit vectors land as Parquet
        units.write_parquet(spill_dir)
        units = ray.data.read_parquet(spill_dir)
    else:
        units = units.materialize()
    dim = len(units.take(1)[0]["unit"]) // np.dtype(dtype).itemsize

    def explode(t: pa.Table) -> pa.Table:
        pls = _ray.get(planes_ref)
        n = t.num_rows
        unit = binary_column_to_matrix(t["unit"], dtype, dim)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        keys = np.empty(len(pls) * n, dtype=np.int64)
        for r, P in enumerate(pls):
            signs = (unit @ P.T) > 0  # (n, planes)
            codes = (signs * (1 << np.arange(lsh_planes))).sum(axis=1) \
                if lsh_planes else np.zeros(n, dtype=np.int64)
            keys[r * n:(r + 1) * n] = (np.int64(r) << np.int64(lsh_planes)) + codes
        return pa.table({
            "bucket": pa.array(keys),
            "vec_id": pa.array(np.tile(ids, len(pls)), pa.int64()),
        })

    buckets = units.map_batches(explode, batch_format="pyarrow", batch_size=2048)

    from biomedical_entity_linking_ray.functions.candidate_pairs import within_key_pairs
    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate

    def emit(g: pd.DataFrame, ia: np.ndarray, ib: np.ndarray) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        if len(ia) == 0:
            return pd.DataFrame({"id_a": pd.Series(dtype=np.int64),
                                 "id_b": pd.Series(dtype=np.int64),
                                 "cosine": pd.Series(dtype=np.float64)})
        M = np.frombuffer(b"".join(g["unit"].tolist()), dtype=dtype).reshape(len(g), -1)
        c = np.round(np.einsum("ij,ij->i", M[ia], M[ib]).astype(np.float64), 4)
        keep = c >= threshold
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "cosine": c[keep]})

    pairs = within_key_pairs(buckets, "bucket", "vec_id", emit=emit,
                             all_pairs_max=all_pairs_max,
                             payload=units)
    return bucketed_aggregate(pairs, ["id_a", "id_b"], {"cosine": ("cosine", "max")})


# ---------------------------------------------------------------------------
# incremental dedup: new batch vs an existing reference corpus
# ---------------------------------------------------------------------------

def novel_documents(
    sf_dir: str,
    ref_mod: int = 3,
    n_bits: int = 1 << 20,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """(doc_id, lang, n_chars): documents whose CONTENT does not appear in
    the reference corpus -- the incremental-dedup pass of a continuously
    ingesting pipeline (drop what the existing 100-TB corpus already has).

    Scale shape: both sides key on sha256(text) (64-byte key regardless of
    doc size); the reference side is summarized into ONE Bloom bitmap
    (bits/key constant, independent of corpus row width), probe rows that
    MISS the filter are emitted map-side with no shuffle (no false
    negatives => provably novel), and only Bloom hits go through the exact
    left-anti hash join (functions/joins.py:bloom_anti_join). Here the
    reference corpus is the doc_id % ref_mod == 0 slice of the same table so
    the result is SQL-checkable."""
    from biomedical_entity_linking_ray.functions.joins import bloom_anti_join

    def with_sha(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"], "lang": t["lang"],
            "n_chars": t["n_chars"],
            "sha": hashing.sha256_hex_batch(t["text"]),
        })

    docs = _read_docs(sf_dir, ["doc_id", "text", "lang", "n_chars"]).map_batches(
        with_sha, batch_format="pyarrow")
    m = int(ref_mod)

    def ref_slice(t: pa.Table) -> pa.Table:
        keep = t["doc_id"].to_numpy(zero_copy_only=False) % m == 0
        return t.filter(pa.array(keep)).select(["sha"])

    ref = docs.map_batches(ref_slice, batch_format="pyarrow")
    novel = bloom_anti_join(docs, ref, "sha", "sha",
                            n_bits=n_bits, num_partitions=num_partitions)
    return novel.map_batches(
        lambda t: t.select(["doc_id", "lang", "n_chars"]),
        batch_format="pyarrow")


# ---------------------------------------------------------------------------
# test-set decontamination: drop training docs sharing any word n-gram with
# a benchmark/eval corpus
# ---------------------------------------------------------------------------

# same tokenizer the chunking/token oracles use (text_analysis._WORD)
_WORD = re.compile(r"[A-Za-z0-9_]+")


def _gram_hashes_per_doc(texts: list[str], n: int) -> list[np.ndarray]:
    """Word n-gram hashes per text: regex tokenize (C), ONE vectorized
    FNV-1a pass over every token in the batch, then a positional polynomial
    combine over each doc's length-n sliding windows (order-sensitive, so
    'a b|c' != 'a|b c' cannot arise -- tokens are atomic). Docs with fewer
    than n tokens emit no grams."""
    toks = [_WORD.findall(s) for s in texts]
    flat = [w for ws in toks for w in ws]
    h = hashing.fnv1a_fixed(flat, width=32) if flat else np.zeros(0, np.uint64)
    out: list[np.ndarray] = []
    pos = 0
    with np.errstate(over="ignore"):
        powers = np.empty(n, dtype=np.uint64)
        acc = np.uint64(1)
        for j in range(n - 1, -1, -1):
            powers[j] = acc
            acc = acc * np.uint64(0x100000001B3)
        for ws in toks:
            m = len(ws)
            hh = h[pos:pos + m]
            pos += m
            if m < n:
                out.append(np.zeros(0, dtype=np.uint64))
                continue
            win = np.lib.stride_tricks.sliding_window_view(hh, n)
            out.append(hashing.splitmix64(
                (win * powers).sum(axis=1, dtype=np.uint64)))
    return out


def decontaminate_documents(
    sf_dir: str,
    bench_mod: int = 7,
    ngram_n: int = 4,
) -> "ray.data.Dataset":
    """(doc_id, lang, n_chars): training documents (doc_id % bench_mod != 0)
    that share NO word n-gram with the benchmark slice (doc_id % bench_mod
    == 0) -- test-set decontamination, the pass a training-data pipeline
    runs so the corpus cannot leak its eval benchmarks (the 13-gram-overlap
    rule of Brown et al. 2020 'Language Models are Few-Shot Learners' app. C,
    at n=4 for this tiny synthetic vocabulary).

    Scale shape: the benchmark side is an EVAL corpus, small by nature (MBs;
    ~1e8 grams = 800 MB of uint64 worst case), so its distinct gram hashes
    are reduced per-batch, gathered once, sorted, and broadcast via ray.put;
    the 100-TB training side then streams through a pure map-side filter --
    tokenize, hash grams (vectorized batch FNV + windowed combine), binary-
    search the broadcast array -- with NO shuffle anywhere. A pathologically
    large 'benchmark' side should use novel_documents' bloom_anti_join shape
    instead. Equality is on 64-bit gram hashes: a false drop needs an FNV
    collision between distinct grams (~1e-7 at 3M x 3M grams) -- the usual
    sketch-grade guarantee, and enough for the driver's value-exact check."""
    from biomedical_entity_linking_ray.functions.joins import cached_broadcast

    docs = _read_docs(sf_dir, ["doc_id", "text", "lang", "n_chars"])
    m = int(bench_mod)
    n = int(ngram_n)

    def bench_grams(t: pa.Table) -> pa.Table:
        keep = t["doc_id"].to_numpy(zero_copy_only=False) % m == 0
        tt = t.filter(pa.array(keep))
        gs = _gram_hashes_per_doc(tt["text"].to_pylist(), n)
        u = (np.unique(np.concatenate(gs)) if gs
             else np.zeros(0, dtype=np.uint64))
        return pa.table({"g": pa.array(u, pa.uint64())})

    # bounded driver gather: per-batch-unique bench gram hashes only
    # (separate pruned scan: the bench pass needs no lang/n_chars payload)
    gathered = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        bench_grams, batch_format="pyarrow").to_pandas()
    bench_sorted = np.unique(gathered["g"].to_numpy().astype(np.uint64))
    ref = ray.put(bench_sorted)

    def clean_only(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        tt = t.filter(pa.array(ids % m != 0))
        out = tt.select(["doc_id", "lang", "n_chars"])
        if tt.num_rows == 0:
            return out
        b = cached_broadcast(ref)
        gs = _gram_hashes_per_doc(tt["text"].to_pylist(), n)
        keep = np.ones(tt.num_rows, dtype=bool)
        if b.size:
            for i, g in enumerate(gs):
                if g.size:
                    idx = np.searchsorted(b, g)
                    idx[idx == b.size] = 0
                    keep[i] = not np.any(b[idx] == g)
        return out.filter(pa.array(keep))

    return docs.map_batches(clean_only, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# paragraph-level exact dedup (CCNet / RefinedWeb line-dedup analog)
# ---------------------------------------------------------------------------

def _segment_lists(texts: pa.ChunkedArray | pa.Array, window: int | None,
                   delim: str | None):
    """Segment a string column into parts, fully vectorized.

    Returns (paras: pa.Array of part strings flattened doc-major,
    n_parts: np.ndarray per-doc part counts). Two segmenters:
    - delim: parts are `pc.split_pattern(text, delim)` elements (real
      corpora: '\\n' lines / '\\n\\n' paragraphs),
    - window: parts are non-overlapping runs of `window` space-separated
      words, rejoined with ' ' (synthetic single-line corpora). Built with
      offset arithmetic over the flattened word array + one Arrow
      binary_join -- no per-row Python.
    Empty text yields exactly one empty part in both modes (str.split
    semantics), matching DuckDB string_split.
    """
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if delim is not None:
        lists = pc.split_pattern(texts, delim)
        offs = lists.offsets.to_numpy()
        return lists.flatten(), np.diff(offs)
    assert window and window > 0
    words = pc.split_pattern(texts, " ")
    flat = words.flatten()
    offs = words.offsets.to_numpy().astype(np.int64)
    counts = np.diff(offs)                       # words per doc (>= 1)
    n_parts = -(-counts // window)               # ceil
    total = int(n_parts.sum())
    sizes = np.full(total, window, dtype=np.int64)
    last = np.cumsum(n_parts) - 1
    sizes[last] = counts - window * (n_parts - 1)
    new_offs = np.empty(total + 1, dtype=np.int64)
    new_offs[0] = 0
    np.cumsum(sizes, out=new_offs[1:])
    # int64 offsets (LargeListArray): a batch whose flattened word count
    # reaches 2^31 would overflow int32 list offsets, and the rebuild passes
    # run under Ray's default batch size, not the segment-side 2048
    la = pa.LargeListArray.from_arrays(pa.array(new_offs, pa.int64()),
                                       flat.cast(pa.large_string()))
    joined = pc.binary_join(la, pa.scalar(" ", pa.large_string()))
    return joined.cast(pa.string()), n_parts


def _part_keys(paras: pa.Array) -> pa.Array:
    """128-bit content key per part: sha256 hex truncated to 32 chars.

    Exact-equality key (collision odds ~2^-64 at 10^12 parts); half the
    shuffle width of full sha hex. Digests run straight off the Arrow UTF-8
    buffer (hashing.sha256_hex_batch) -- no per-row Python str."""
    return hashing.sha256_hex_batch(paras, trunc=32)


def paragraph_dedup(
    sf_dir: str,
    window: int | None = 16,
    delim: str | None = None,
    n_buckets: int | None = None,
    broadcast_max: int = 500_000,
) -> "ray.data.Dataset":
    """Remove globally duplicated paragraphs, keep first occurrence,
    reassemble documents: (doc_id, text_clean, n_parts, n_kept).

    The CCNet/RefinedWeb line-level dedup step (Wenzek et al. 2020 §4.1;
    Penedo et al. 2023 §G): an exact-substring-at-paragraph-granularity
    complement to the whole-document dedup family above. An occurrence of a
    paragraph is kept iff it is the globally FIRST occurrence under the
    total order (doc_id, part_idx); every other occurrence (cross- AND
    intra-document) is dropped, and each document is rebuilt from its kept
    parts in order (possibly empty).

    Scale shape: the segment stage ships only skinny (key, packed-position)
    rows -- part text never enters the shuffle; winners come from ONE
    bucketed min-aggregation (group count = n_buckets regardless of distinct
    paragraph cardinality); kept positions fold back to one int64-list row
    per surviving doc, joined to the pruned documents scan via bounded
    broadcast with a hash-join fallback; part text is re-derived map-side
    from the same deterministic segmenter. doc_id must be a non-negative
    int64 and part counts < 2^32 (packed position = hex16(doc_id)||
    hex8(idx), lexicographic == numeric order).
    """
    import pyarrow.compute as pc

    import ray as _ray

    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate
    from biomedical_entity_linking_ray.functions.joins import cached_broadcast, hash_join

    def _hex8(vals: np.ndarray) -> np.ndarray:
        h16 = hashing.hex16_batch(vals.astype(np.uint64))
        return h16.view("U1").reshape(-1, 16)[:, 8:].copy().view("U8").ravel()

    def segment(t: pa.Table) -> pa.Table:
        paras, n_parts = _segment_lists(t["text"], window, delim)
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        rep_ids = np.repeat(doc_ids, n_parts)
        starts = np.repeat(np.cumsum(n_parts) - n_parts, n_parts)
        idx = np.arange(len(rep_ids), dtype=np.int64) - starts
        packed = np.char.add(hashing.hex16_batch(rep_ids.astype(np.uint64)),
                             _hex8(idx))
        return pa.table({
            "k": _part_keys(paras),
            "pos": pa.array(packed, pa.string()),
        })

    occ = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        segment, batch_format="pyarrow", batch_size=2048)
    winners = bucketed_aggregate(
        occ, keys=["k"], aggs={"pos": ("pos", "min")}, n_buckets=n_buckets)

    def decode(t: pa.Table) -> pa.Table:
        pos = t["pos"].to_pylist()
        return pa.table({
            "doc_id": pa.array([int(p[:16], 16) for p in pos], pa.int64()),
            "idx": pa.array([int(p[16:], 16) for p in pos], pa.int64()),
        })

    kept = winners.map_batches(decode, batch_format="pyarrow")
    kept_lists = bucketed_aggregate(
        kept, keys=["doc_id"], aggs={"kept": ("idx", "set")},
        n_buckets=n_buckets).materialize()
    docs = _read_docs(sf_dir, ["doc_id", "text"])
    joiner = " " if delim is None else delim

    def rebuild(t: pa.Table, kept_rows: list) -> pa.Table:
        # kept_rows: per-row iterable of kept part indices (sorted ascending)
        paras, n_parts = _segment_lists(t["text"], window, delim)
        plist = paras.to_pylist()
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        starts = np.cumsum(n_parts) - n_parts
        texts, n_kept = [], []
        for i in range(len(doc_ids)):
            ks = kept_rows[i]
            n_kept.append(len(ks))
            s = int(starts[i])
            texts.append(joiner.join(plist[s + j] for j in ks))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text_clean": pa.array(texts, pa.string()),
            "n_parts": pa.array(n_parts, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
        })

    if kept_lists.count() <= broadcast_max:
        ref = _ray.put(kept_lists.to_pandas())

        def attach(t: pa.Table) -> pa.Table:
            m = cached_broadcast(
                ref, lambda df: dict(zip(df["doc_id"], df["kept"])))
            rows = [m.get(int(d), ())
                    for d in t["doc_id"].to_numpy(zero_copy_only=False)]
            return rebuild(t, rows)

        return docs.map_batches(attach, batch_format="pyarrow",
                                batch_size=2048)

    # Acero (Ray's hash-join backend) rejects list-typed payload columns:
    # csv-encode the kept indices through the join, decode map-side after.
    def enc(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "kept_csv": pa.array([",".join(map(str, k))
                                  for k in t["kept"].to_pylist()], pa.string()),
        })

    joined = hash_join(docs, kept_lists.map_batches(enc, batch_format="pyarrow"),
                       "left_outer", 8, on=("doc_id",))

    def rebuild_joined(t: pa.Table) -> pa.Table:
        rows = [tuple(int(x) for x in k.split(",")) if k else ()
                for k in t["kept_csv"].to_pylist()]
        return rebuild(t.select(["doc_id", "text"]), rows)

    return joined.map_batches(rebuild_joined, batch_format="pyarrow",
                              batch_size=2048)


# ---------------------------------------------------------------------------
# exact substring dedup at word n-gram resolution (Lee et al. 2022)
# ---------------------------------------------------------------------------

def _gram_occurrences(t: pa.Table, n: int):
    """Vectorized word n-gram enumeration over a batch of documents.

    Returns (doc_ids_rep, i_idx, grams): for every valid in-doc position i
    (i + n <= word count), the n-gram string words[i:i+n] joined by ' '.
    Grams are built from n shifted zero-copy slices of the batch-flattened
    word array via one element-wise Arrow join; cross-document windows are
    masked out with offset arithmetic -- no per-row Python."""
    import pyarrow.compute as pc

    texts = t["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(texts, " ")
    flat = words.flatten()
    offs = words.offsets.to_numpy().astype(np.int64)
    counts = np.diff(offs)
    T = len(flat)
    m = T - n + 1
    if m <= 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                pa.array([], pa.string()))
    parts = [flat.slice(j, m) for j in range(n)]
    grams_all = pc.binary_join_element_wise(*parts, " ")
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    starts = offs[:-1]
    pos = np.arange(m, dtype=np.int64)
    doc_of = np.searchsorted(starts, pos, side="right") - 1
    i_idx = pos - starts[doc_of]
    valid = i_idx + n <= counts[doc_of]
    keep = np.flatnonzero(valid)
    return (doc_ids[doc_of[keep]], i_idx[keep],
            grams_all.take(pa.array(keep, pa.int64())))


def substring_dedup(
    sf_dir: str,
    n: int = 8,
    n_buckets: int | None = None,
    broadcast_max: int = 500_000,
    spill_dir: str | None = None,
) -> "ray.data.Dataset":
    """Exact substring dedup at word n-gram resolution: remove every word
    covered by a NON-FIRST occurrence of a duplicated n-gram, rebuild
    documents -> (doc_id, text_clean, n_words, n_removed).

    The distributed analog of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better") suffix-array ExactSubstr dedup, at fixed
    n-gram resolution: any repeated run of >= n words is removed from all
    occurrences except the globally first under (doc_id, position). The
    first occurrence keeps its words, so one copy of every duplicated span
    always survives.

    Scale shape: grams and their keys are computed exactly ONCE into a
    materialized skinny occurrence table (128-bit gram key, packed position,
    doc_id, i) that feeds both sides; the winner aggregation shuffles only
    (k, pos) through ONE bucketed count+min; only keys with >1 occurrence
    survive (the duplicated-gram table, typically a small fraction), probed
    back against the occurrence table via a broadcast hash-map (pandas .map,
    no re-hashing) while it fits, an exact hash join beyond; covered word
    positions fold to one row per AFFECTED doc and reach the rebuild scan
    bounded-broadcast-else-join. Gram text never enters a shuffle. doc_id
    must be a non-negative int64 (packed position = hex16(doc_id)||hex8(i)).
    """
    import ray as _ray

    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate
    from biomedical_entity_linking_ray.functions.joins import cached_broadcast, hash_join

    def _packed(doc_ids: np.ndarray, idx: np.ndarray) -> np.ndarray:
        h16 = hashing.hex16_batch(doc_ids.astype(np.uint64))
        h8 = hashing.hex16_batch(idx.astype(np.uint64)) \
            .view("U1").reshape(-1, 16)[:, 8:].copy().view("U8").ravel()
        return np.char.add(h16, h8)

    def gram_occ(t: pa.Table) -> pa.Table:
        doc_rep, i_idx, grams = _gram_occurrences(t, n)
        return pa.table({
            "k": _part_keys(grams),
            "pos": pa.array(_packed(doc_rep, i_idx), pa.string()),
            "doc_id": pa.array(doc_rep, pa.int64()),
            "i": pa.array(i_idx, pa.int64()),
        })

    # one gram pass, materialized and reused by BOTH the winner aggregation
    # and the coverage pass -- grams and their sha keys are computed exactly
    # once. batch_size=512 keeps the sha-bearing stage wide enough to fill
    # the CPUs (2048 left a 5k-doc corpus running on 3 tasks). The pinned
    # occurrence table scales with total gram count: in the object store by
    # default (spills under pressure), or as Parquet via `spill_dir` (the
    # 10^12-doc path, same contract as minhash_near_dup_pairs).
    occw = _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        gram_occ, batch_format="pyarrow", batch_size=512)
    if spill_dir is not None:
        occw.write_parquet(spill_dir)
        occw = ray.data.read_parquet(spill_dir)
    else:
        occw = occw.materialize()
    per_key = bucketed_aggregate(
        occw.select_columns(["k", "pos"]),
        aggs={"n_occ": ("pos", "count"), "first": ("pos", "min")},
        keys=["k"], n_buckets=n_buckets)
    dup_keys = per_key.filter(expr="n_occ > 1").select_columns(["k", "first"]) \
        .materialize()
    docs = _read_docs(sf_dir, ["doc_id", "text"])

    def rebuild(t: pa.Table, covered_rows: list) -> pa.Table:
        # covered_rows: per-row set/list of covered word indices
        import pyarrow.compute as pc

        texts = t["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.split_pattern(texts, " ")
        wl = words.to_pylist()
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts_out, n_words, n_removed = [], [], []
        for i in range(len(doc_ids)):
            cov = covered_rows[i]
            ws = wl[i]
            n_words.append(len(ws))
            n_removed.append(len(cov))
            texts_out.append(" ".join(
                w for j, w in enumerate(ws) if j not in cov))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text_clean": pa.array(texts_out, pa.string()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
        })

    def expand(t: pa.Table) -> pa.Table:
        # (doc_id, gram start i) of a non-first dup occurrence -> the n
        # covered word positions, vectorized
        d = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), n)
        base = np.repeat(t["i"].to_numpy(zero_copy_only=False), n)
        off = np.tile(np.arange(n, dtype=np.int64), t.num_rows)
        return pa.table({"doc_id": pa.array(d, pa.int64()),
                         "j": pa.array(base + off, pa.int64())})

    if dup_keys.count() <= broadcast_max:
        # coverage pass over the MATERIALIZED occurrence table: one hash-map
        # probe per gram via pandas .map (C speed), no re-hashing
        ref = _ray.put(dup_keys.to_pandas())

        def mark(t: pa.Table) -> pa.Table:
            first_of = cached_broadcast(
                ref, lambda df: dict(zip(df["k"], df["first"])))
            s = t["k"].to_pandas().map(first_of)
            mask = (s.notna()
                    & (s.to_numpy() != t["pos"].to_pandas().to_numpy()))
            m = mask.to_numpy()
            return expand(t.select(["doc_id", "i"]).filter(pa.array(m)))

        cov = occw.map_batches(mark, batch_format="pyarrow")
    else:
        # scale path: exact join of occurrences vs duplicated keys
        def drop_first(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.not_equal(t["pos"], t["first"]))

        cov = hash_join(occw, dup_keys, "inner", 8, on=("k",)) \
            .map_batches(drop_first, batch_format="pyarrow") \
            .map_batches(expand, batch_format="pyarrow")

    # fold covered positions to one row per AFFECTED doc (typically a small
    # fraction), deliver to the rebuild scan bounded-broadcast-else-join
    cov_lists = bucketed_aggregate(
        cov, keys=["doc_id"], aggs={"cov": ("j", "set")},
        n_buckets=n_buckets).materialize()

    if cov_lists.count() <= broadcast_max:
        cref = _ray.put(cov_lists.to_pandas())

        def scrub(t: pa.Table) -> pa.Table:
            m = cached_broadcast(
                cref, lambda df: dict(zip(df["doc_id"], df["cov"])))
            rows = [m.get(int(d), ())
                    for d in t["doc_id"].to_numpy(zero_copy_only=False)]
            return rebuild(t, [set(r) for r in rows])

        return docs.map_batches(scrub, batch_format="pyarrow",
                                batch_size=2048)

    def enc(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "cov_csv": pa.array([",".join(map(str, c))
                                 for c in t["cov"].to_pylist()], pa.string()),
        })

    joined = hash_join(docs, cov_lists.map_batches(enc, batch_format="pyarrow"),
                       "left_outer", 8, on=("doc_id",))

    def rebuild_joined(t: pa.Table) -> pa.Table:
        rows = [set(int(x) for x in c.split(",")) if c else set()
                for c in t["cov_csv"].to_pylist()]
        return rebuild(t.select(["doc_id", "text"]), rows)

    return joined.map_batches(rebuild_joined, batch_format="pyarrow",
                              batch_size=2048)


# ---------------------------------------------------------------------------
# end-to-end fuzzy dedup: MinHash pairs -> connected components -> canonical
# ---------------------------------------------------------------------------

def minhash_dedup_assignments(
    sf_dir: str,
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 4,
    jaccard_threshold: float = 0.6,
    seed: int = 42,
) -> "ray.data.Dataset":
    """Fuzzy dedup, the full product: (doc_id, canonical_id) where canonical
    is the MINIMUM doc_id of the document's near-duplicate cluster (the
    transitive closure of MinHash+LSH pairs above `jaccard_threshold`);
    singletons map to themselves.

    The near-dup analog of `exact_dedup` and the shape every keep-one-per-
    cluster training-data dedup pipeline ends in (SlimPajama / BigCode
    pipelines; reference analog: cluster -> canonical prediction,
    eval_cluster_linking.py:186-219). Composes the oracle-green
    `minhash_near_dup_pairs` cascade with the flagship's distributed
    connected-components stage (driver union-find under the residual bound,
    Pregel partition actors beyond), so it inherits both scale stories; ids
    ride the CC stage as hex16 strings (lexicographic == numeric order, so
    the stage's min-label canonical IS the numeric min doc_id)."""
    pairs = minhash_near_dup_pairs(
        sf_dir, num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        jaccard_threshold=jaccard_threshold, seed=seed)
    return pairs_to_assignments(pairs, sf_dir)


def simhash_dedup_assignments(
    sf_dir: str, max_hamming: int = 8, prefix_bits: int = 12,
) -> "ray.data.Dataset":
    """SimHash twin of `minhash_dedup_assignments`: transitive closure of
    the (already oracled whp) SimHash pair graph -> (doc_id, canonical_id),
    canonical = component minimum, singletons self-mapped."""
    pairs = simhash_near_dup_pairs(
        sf_dir, max_hamming=max_hamming, prefix_bits=prefix_bits)
    return pairs_to_assignments(pairs, sf_dir)


def ngram_dedup_assignments(
    sf_dir: str, n: int = 3, threshold: float = 0.5,
) -> "ray.data.Dataset":
    """Exact-verified fuzzy dedup: transitive closure of the EXACT token
    n-gram Jaccard pair graph (LSH candidates, exact verify) ->
    (doc_id, canonical_id). The strictest member of the fuzzy-dedup family:
    unlike the minhash/simhash twins, no estimator variance -- every edge is
    a true Jaccard >= threshold."""
    pairs = ngram_jaccard_pairs(sf_dir, n=n, threshold=threshold)
    return pairs_to_assignments(pairs, sf_dir)


def pairs_to_assignments(
    pairs: "ray.data.Dataset", sf_dir: str,
    nodes: "ray.data.Dataset | None" = None, id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """(id_a, id_b, ...) near-dup pair graph -> (<id_col>, canonical_id) via
    the flagship's distributed connected-components stage; canonical = the
    numeric minimum id of the component (ids ride CC as hex16 strings).
    Nodes default to the documents table; pass `nodes`/`id_col` to close a
    pair graph over any integer-keyed table (e.g. the SNM part-name graph)."""
    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.stages.clustering import connected_components

    def enc_pair(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "id_a": pa.array(hashing.hex16_batch(a), pa.string()),
            "id_b": pa.array(hashing.hex16_batch(b), pa.string()),
        })

    def enc_node(t: pa.Table) -> pa.Table:
        d = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            "file_id": pa.array(hashing.hex16_batch(d), pa.string())})

    edges = pairs.map_batches(enc_pair, batch_format="pyarrow")
    if nodes is None:
        nodes = _read_docs(sf_dir, ["doc_id"])
    nodes = nodes.map_batches(enc_node, batch_format="pyarrow")
    cc = connected_components(edges, nodes, LinkageConfig())

    def dec(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pa.array(
                [int(x, 16) for x in t["file_id"].to_pylist()], pa.int64()),
            "canonical_id": pa.array(
                [int(x, 16) for x in t["canonical_id"].to_pylist()], pa.int64()),
        })

    return cc.map_batches(dec, batch_format="pyarrow")


def snm_dedup_assignments(
    sf_dir: str, window: int = 8, max_dist: int = 1,
) -> "ray.data.Dataset":
    """Sorted-neighborhood dedup, the full product: (p_partkey, canonical_id)
    where canonical is the minimum part key of the SNM near-dup cluster --
    transitive closure of window pairs whose name edit distance is
    <= `max_dist`; singletons map to themselves. The entity-resolution
    cascade (Hernandez-Stolfo merge/purge): sliding-window blocking ->
    edit-distance match -> union. Composes the oracle-green
    `sorted_neighborhood_pairs` with the flagship CC stage, inheriting both
    scale stories."""
    from biomedical_entity_linking_ray.pipelines.similarity import (
        sorted_neighborhood_pairs,
    )

    pairs = sorted_neighborhood_pairs(sf_dir, window=window).filter(
        expr=f"dist <= {max_dist}")
    nodes = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey"])
    return pairs_to_assignments(pairs, sf_dir, nodes=nodes,
                                id_col="p_partkey")


# ---------------------------------------------------------------------------
# near-dup graph analytics: per-node triangle counting
# ---------------------------------------------------------------------------

def near_dup_triangles(
    sf_dir: str, n_buckets: int | None = None, join_partitions: int = 8,
    spill_dir: str | None = None,
) -> "ray.data.Dataset":
    """Per-node triangle counts over the SimHash near-dup graph:
    (doc_id, n_triangles) for every document in at least one triangle.

    Triangle density separates true duplicate CLIQUES (template families,
    vendored trees -- every pair agrees) from chain artifacts of transitive
    closure (A~B~C where A!~C), so it is the standard diagnostic for how
    aggressive a fuzzy-dedup threshold is. Classic distributed algorithm on
    the id-ordered orientation: edges (u<v) -> per-node higher-neighbor
    adjacency (ONE bucketed set-agg) -> wedge explode at the lowest vertex
    (vectorized; O(d^2) per node on the PRUNED near-dup graph, orders of
    magnitude smaller than the corpus) -> ONE hash join of wedges against
    edges -> per-node count fold. Every triangle {u<v<w} is found exactly
    once, at u.

    Oriented edges are DEDUPED up front (bucketed distinct on (u, v)), so
    any pair source works -- a source emitting an undirected edge more than
    once would otherwise inflate counts through the wedge-vs-edge join (the
    adjacency side is already distinct via the 'set' agg)."""
    from biomedical_entity_linking_ray.functions.groups import (
        bucketed_aggregate,
        bucketed_distinct,
    )
    from biomedical_entity_linking_ray.functions.joins import hash_join

    pairs = simhash_near_dup_pairs(sf_dir)

    def orient(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(np.minimum(a, b), pa.int64()),
                         "v": pa.array(np.maximum(a, b), pa.int64())})

    edges = bucketed_distinct(
        pairs.map_batches(orient, batch_format="pyarrow"),
        ["u", "v"], n_buckets=n_buckets)
    if spill_dir is not None:  # 10^12-doc path: pruned edge list as Parquet
        edges.write_parquet(spill_dir)
        edges = ray.data.read_parquet(spill_dir)
    else:
        edges = edges.materialize()
    hi = bucketed_aggregate(edges, keys=["u"], aggs={"nbrs": ("v", "set")},
                            n_buckets=n_buckets)

    def wedges(t: pa.Table) -> pa.Table:
        us = t["u"].to_numpy(zero_copy_only=False)
        out_u, out_v, out_w = [], [], []
        for i, ns in enumerate(t["nbrs"].to_pylist()):
            if len(ns) < 2:
                continue
            a = np.asarray(ns, dtype=np.int64)  # 'set' agg: sorted ascending
            iu, iw = np.triu_indices(len(a), k=1)
            out_u.append(np.full(len(iu), us[i], dtype=np.int64))
            out_v.append(a[iu])
            out_w.append(a[iw])
        if not out_u:
            return pa.table({"wu": pa.array([], pa.int64()),
                             "v": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64())})
        return pa.table({"wu": pa.array(np.concatenate(out_u)),
                         "v": pa.array(np.concatenate(out_v)),
                         "w": pa.array(np.concatenate(out_w))})

    wedge_ds = hi.map_batches(wedges, batch_format="pyarrow")
    tri = hash_join(wedge_ds, edges, "inner", join_partitions,
                    on=("v", "w"), right_on=("u", "v"))

    def explode_nodes(t: pa.Table) -> pa.Table:
        cols = [t[c].to_numpy(zero_copy_only=False) for c in ("wu", "v", "w")]
        return pa.table({"doc_id": pa.array(np.concatenate(cols), pa.int64())})

    return bucketed_aggregate(
        tri.map_batches(explode_nodes, batch_format="pyarrow"),
        keys=["doc_id"], aggs={"n_triangles": ("doc_id", "count")},
        n_buckets=n_buckets)


def near_dup_degrees(
    sf_dir: str, n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """(doc_id, degree) over the SimHash near-dup graph -- the degree
    distribution is the first-order health check of a dedup threshold
    (heavy right tail = a too-loose threshold gluing the corpus into
    super-components; `near_dup_triangles` is the second-order check).

    One vectorized explode of each deduped undirected edge into its two
    endpoint rows, then ONE bucketed count -- no join, no driver state."""
    from biomedical_entity_linking_ray.functions.groups import (
        bucketed_aggregate,
        bucketed_distinct,
    )

    pairs = simhash_near_dup_pairs(sf_dir)

    def orient(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(np.minimum(a, b), pa.int64()),
                         "v": pa.array(np.maximum(a, b), pa.int64())})

    edges = bucketed_distinct(
        pairs.map_batches(orient, batch_format="pyarrow"),
        ["u", "v"], n_buckets=n_buckets)

    def endpoints(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(np.concatenate([u, v]), pa.int64()),
            "one": pa.array(np.ones(2 * len(u), dtype=np.int64)),
        })

    return bucketed_aggregate(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["doc_id"], {"degree": ("one", "sum")}, n_buckets=n_buckets)
