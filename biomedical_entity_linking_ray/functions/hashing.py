"""Deterministic vectorized hashing kernels (numpy only).

All sketches here are mergeable/deterministic and independent of process,
platform and PYTHONHASHSEED -- a hard requirement because blocks execute in
unordered parallel workers and two runs at different parallelism must produce
identical results (SURVEY.md 7.4 "Determinism under parallelism"; the
reference is careless here, bioel data_utils.py:291-294 uses unseeded RNG).

Kernels: FNV-1a (scalar + vectorized sliding-window), char-shingle set
hashing, MinHash signatures, LSH band keys, hashed-TF vectors, SimHash,
rolling document fingerprints. Arithmetic is uint64 with wraparound
(mod 2^64), which numpy does natively on arrays.
"""

from __future__ import annotations

import hashlib

import numpy as np

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

_OLD_ERR = np.seterr(over="ignore")  # uint64 wraparound is intentional everywhere here
np.seterr(**_OLD_ERR)


def fnv1a_bytes(data: bytes) -> int:
    """Scalar FNV-1a 64-bit over a byte string."""
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv1a_str(s: str) -> int:
    return fnv1a_bytes(s.encode("utf-8", "surrogatepass"))


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8", "surrogatepass")).hexdigest()


def sha256_hex_batch(col, trunc: int | None = None) -> "pa.Array":
    """sha256 hex per element of an Arrow string column, hashed straight off
    the column's UTF-8 data buffer via zero-copy memoryview slices -- no
    per-row Python str materialization or re-encode. Arrow strings are valid
    UTF-8 by construction, so the buffer bytes equal
    `s.encode("utf-8")` (byte-identical to `sha256_hex` per element).
    The loop body is a releasing-the-GIL C digest."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if len(arr) == 0:
        return pa.array([], pa.string())
    offs = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    mv = memoryview(arr.buffers()[2])
    digests = [hashlib.sha256(mv[offs[i]:offs[i + 1]]).hexdigest()
               for i in range(len(arr))]
    if trunc is not None:
        digests = [h[:trunc] for h in digests]
    return pa.array(digests, pa.string())


def fnv1a_fixed(strs, width: int = 130) -> np.ndarray:
    """Vectorized FNV-1a over an array of strings, truncated/NUL-padded to
    `width` bytes (loop over byte columns, not rows). Exact for strings up to
    `width` bytes; longer strings hash on their prefix -- fine for checksums
    over fixed-width ids (sha-hex file_ids are 64 chars)."""
    a = np.asarray(strs)
    try:
        b = a.astype(f"S{width}")  # fast path: ASCII keys (ids, block keys)
    except (UnicodeEncodeError, TypeError):
        b = np.array(
            [str(x).encode("utf-8", "surrogatepass")[:width] for x in a.ravel()],
            dtype=f"S{width}",
        )
    if b.size == 0:
        return np.zeros(0, dtype=np.uint64)
    m = np.ascontiguousarray(b).view(np.uint8).reshape(b.size, width)
    with np.errstate(over="ignore"):
        h = np.full(b.size, _FNV_OFFSET, dtype=np.uint64)
        for j in range(width):
            h = (h ^ m[:, j].astype(np.uint64)) * _FNV_PRIME
    return h


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer -- cheap strong mixing of uint64 arrays."""
    x = x.astype(np.uint64, copy=True)
    x += _GOLDEN
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def char_shingle_hashes(text: str, k: int, max_shingles: int = 0) -> np.ndarray:
    """64-bit hashes of all k-char shingles of `text` (vectorized, MULTISET).

    Sliding-window FNV-1a over the utf-8 bytes: no Python loop over shingles,
    only a loop over the k window columns. Duplicates are NOT removed: the
    MinHash min per bin is duplicate-insensitive, and the hashed-TF vector
    weights by frequency -- so the np.unique sort (the single hottest kernel
    of the content scan at ~L log L per row) buys nothing. The max_shingles
    cap keeps the smallest hashes (KMV-style sketch via a linear-time
    partition, stable under permutation of the document).
    """
    b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if b.size == 0:
        b = np.zeros(1, dtype=np.uint8)
    if b.size < k:  # pad short docs so they still produce one shingle
        b = np.pad(b, (0, k - b.size))
    # widen to uint64 ONCE; each window column is then a zero-copy view
    # (the sliding_window_view + per-column astype variant paid a fresh
    # widening copy per k, ~25% of the whole content scan)
    b64 = b.astype(np.uint64)
    n = b.size - k + 1
    with np.errstate(over="ignore"):
        h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
        for j in range(k):
            h ^= b64[j:j + n]
            h *= _FNV_PRIME
    if max_shingles and h.size > max_shingles:
        h = np.partition(h, max_shingles - 1)[:max_shingles]
    return h


def sample_shingles(h: np.ndarray, mod: int) -> np.ndarray:
    """Content-defined mod-p sampling: keep shingles whose hash % mod == 0.

    Unlike positional striding this is shift-robust (a 1-char insertion does
    not decorrelate the samples of two near-identical documents), and the
    Jaccard of the sampled universes estimates the full Jaccard unbiasedly --
    the classic winnowing/mod-sketch trick. Cuts every downstream per-shingle
    cost (OPH binning, TF hashing) by ~mod. Falls back to the full set when
    sampling would empty a short document (an all-empty signature would
    co-block every tiny doc)."""
    if mod <= 1:
        return h
    s = h[h % np.uint64(mod) == 0]
    return s if s.size else h


def shingle_hashes_batch(
    texts: list[str], k: int, max_shingles: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Batched `char_shingle_hashes`: ONE sliding-window FNV pass over the
    concatenation of all rows (k numpy ops total instead of k per row), then
    per-row segment slicing. Returns (values, offsets) with `offsets` of
    shape (n+1,); row i's shingle multiset is values[offsets[i]:offsets[i+1]].

    Row-equivalent to calling char_shingle_hashes per row as a MULTISET
    (element order within a row may differ; every consumer -- MinHash min,
    mod-sampling, TF bincount -- is order-insensitive). Windows that would
    cross a row boundary are simply not selected by the per-row slices.
    """
    encs = []
    for s in texts:
        e = s.encode("utf-8", "surrogatepass")
        if len(e) < k:  # empty -> one zero byte, then pad: matches per-row
            e = (e or b"\x00") + b"\x00" * (k - max(len(e), 1))
        encs.append(e)
    n = len(encs)
    if n == 0:
        return np.zeros(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    lens = np.fromiter((len(e) for e in encs), dtype=np.int64, count=n)
    buf = np.frombuffer(b"".join(encs), dtype=np.uint8)
    b64 = buf.astype(np.uint64)
    ng = buf.size - k + 1
    with np.errstate(over="ignore"):
        h = np.full(ng, _FNV_OFFSET, dtype=np.uint64)
        for j in range(k):
            h ^= b64[j:j + ng]
            h *= _FNV_PRIME
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    nwin = lens - k + 1  # >= 1 per row by the padding above
    segs = []
    for i in range(n):
        seg = h[starts[i]: starts[i] + nwin[i]]
        if max_shingles and seg.size > max_shingles:
            # KMV cap: smallest `max_shingles` values (linear-time partition)
            seg = np.partition(seg, max_shingles - 1)[:max_shingles]
        segs.append(seg)
    counts = np.fromiter((s.size for s in segs), dtype=np.int64, count=n)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    return np.concatenate(segs), offs


def sample_shingles_batch(
    vals: np.ndarray, offs: np.ndarray, mod: int
) -> tuple[np.ndarray, np.ndarray]:
    """Batched `sample_shingles` over a (values, offsets) segment array:
    global mod-p mask, per-row fallback to the full row when sampling would
    empty it (same semantics as the per-row function)."""
    if mod <= 1 or vals.size == 0:
        return vals, offs
    keep = vals % np.uint64(mod) == 0
    counts = np.add.reduceat(keep.astype(np.int64), offs[:-1])
    for r in np.flatnonzero(counts == 0):  # rare: tiny rows
        keep[offs[r]: offs[r + 1]] = True
        counts[r] = offs[r + 1] - offs[r]
    new_offs = np.zeros(offs.size, dtype=np.int64)
    np.cumsum(counts, out=new_offs[1:])
    return vals[keep], new_offs


def hashed_tf_batch(vals: np.ndarray, offs: np.ndarray, dim: int) -> np.ndarray:
    """Batched `hashed_tf_vector`: one global mix + ONE bincount over flat
    (row * dim + feature) indices, then row-wise L2 normalization. Produces
    the same values as the per-row function (same scatter-add order within a
    row, same norm)."""
    n = offs.size - 1
    if vals.size == 0:
        return np.zeros((n, dim), dtype=np.float32)
    mixed = splitmix64(vals)
    idx = (mixed % np.uint64(dim)).astype(np.int64)
    sign = np.where((mixed >> np.uint64(63)).astype(bool), -1.0, 1.0)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
    v = np.bincount(row_ids * dim + idx, weights=sign, minlength=n * dim)
    v = v.reshape(n, dim)
    nrm = np.sqrt(np.einsum("ij,ij->i", v, v))
    nrm[nrm == 0] = 1.0
    v /= nrm[:, None]
    return v.astype(np.float32)


def token_hashes(text: str, lowercase: bool = True) -> np.ndarray:
    """64-bit hashes of whitespace/punct tokens (unique-preserving counts not kept)."""
    if lowercase:
        text = text.lower()
    toks = _TOKEN_SPLIT.findall(text)
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    return np.fromiter((fnv1a_str(t) for t in toks), dtype=np.uint64, count=len(toks))


import re  # noqa: E402

_TOKEN_SPLIT = re.compile(r"[A-Za-z0-9_]+")


class MinHasher:
    """One-permutation MinHash (OPH) over 64-bit shingle hashes.

    One seeded affine permutation h(x) = a*x + b (mod 2^64) maps every shingle
    once; shingles are binned by their top bits into `num_perm` bins and the
    per-bin minimum is the signature slot (Li, Owen & Zhang, NIPS 2012). Empty
    bins borrow the nearest filled bin to the left, circularly (rotation
    densification, Shrivastava & Li 2014). Cost is O(shingles) per document --
    the classical k-permutation scheme's O(num_perm * shingles) multiply
    traffic made the feature scan memory-bandwidth-bound, which destroyed
    multi-core scaling.

    P(sig_a[i] == sig_b[i]) ~= Jaccard(A, B), same as classical MinHash.
    """

    def __init__(self, num_perm: int, seed: int):
        rng = np.random.RandomState(seed)
        lo = rng.randint(0, 2**32, size=2, dtype=np.uint64)
        hi = rng.randint(0, 2**32, size=2, dtype=np.uint64)
        params = (hi << np.uint64(32)) | lo
        self.a = params[0] | np.uint64(1)  # odd multiplier
        self.b = params[1]
        self.num_perm = num_perm

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """(num_perm,) uint64 signature. Empty input -> all-max sentinel."""
        P = self.num_perm
        if shingles.size == 0:
            return np.full(P, np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = self.a * shingles.astype(np.uint64) + self.b
        # bin by the HIGH bits: the per-bin min then keeps its low bits
        # uniform, so a truncated (uint16) signature stays fully informative.
        # For power-of-two P the bin is literally the top bits, so ONE value
        # sort groups by bin with the bin-minimum first -- no argsort, no
        # reduceat, no per-perm loop.
        if P & (P - 1) == 0:
            shift = np.uint64(64 - P.bit_length() + 1)
            h = np.sort(h)
            bins = (h >> shift).astype(np.int64)
        else:
            bins = (h // np.uint64((2**64) // P)).astype(np.int64)
            np.clip(bins, 0, P - 1, out=bins)
            order = np.lexsort((h, bins))  # bin-major, value-ascending
            bins, h = bins[order], h[order]
        starts = np.flatnonzero(np.r_[True, bins[1:] != bins[:-1]])
        sig = np.full(P, np.iinfo(np.uint64).max, dtype=np.uint64)
        sig[bins[starts]] = h[starts]
        # rotation densification: an empty bin takes the nearest filled bin to
        # its left (wrapping), mixed with its own index so borrowed slots do
        # not trivially agree across documents that share only the donor bin
        empty = sig == np.iinfo(np.uint64).max
        if empty.any() and not empty.all():
            idx = np.where(~empty, np.arange(P), -1)
            np.maximum.accumulate(idx, out=idx)
            wrap = idx < 0
            if wrap.any():
                idx[wrap] = idx[-1]  # wrap to the last filled bin
            borrowed = splitmix64(sig[idx[empty]] + np.arange(P, dtype=np.uint64)[empty])
            sig[empty] = borrowed
        return sig

    def signature_batch(self, vals: np.ndarray, offs: np.ndarray) -> np.ndarray:
        """(n, num_perm) uint64 signatures for a (values, offsets) segment
        array -- same per-row result as `signature` (per-bin minimum + the
        same rotation densification), computed with ONE global affine pass
        and ONE scatter-min instead of a sort per row."""
        P = self.num_perm
        n = offs.size - 1
        MAX = np.iinfo(np.uint64).max
        sig = np.full((n, P), MAX, dtype=np.uint64)
        if vals.size:
            with np.errstate(over="ignore"):
                h = self.a * vals + self.b
            if P & (P - 1) == 0:
                shift = np.uint64(64 - P.bit_length() + 1)
                bins = (h >> shift).astype(np.int64)
            else:
                bins = (h // np.uint64((2**64) // P)).astype(np.int64)
                np.clip(bins, 0, P - 1, out=bins)
            row_ids = np.repeat(np.arange(n, dtype=np.int64), np.diff(offs))
            np.minimum.at(sig.reshape(-1), row_ids * P + bins, h)
        empty = sig == MAX
        some = empty.any(axis=1) & ~empty.all(axis=1)
        if some.any():
            sub, e = sig[some], empty[some]
            idx = np.where(~e, np.arange(P, dtype=np.int64)[None, :], -1)
            np.maximum.accumulate(idx, axis=1, out=idx)
            idx = np.where(idx < 0, idx[:, -1:], idx)  # circular wrap
            cols = np.broadcast_to(np.arange(P, dtype=np.uint64), sub.shape)
            with np.errstate(over="ignore"):
                borrowed = splitmix64(
                    np.take_along_axis(sub, idx, axis=1)[e] + cols[e])
            sub[e] = borrowed
            sig[some] = sub
        return sig

    @staticmethod
    def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        return float(np.mean(sig_a == sig_b))

    @staticmethod
    def estimate_jaccard_batch(sigs_a: np.ndarray, sigs_b: np.ndarray) -> np.ndarray:
        """Row-wise Jaccard estimate for (n, num_perm) stacked signatures."""
        return (sigs_a == sigs_b).mean(axis=1)


def band_hashes(sig: np.ndarray, bands: int) -> np.ndarray:
    """(bands,) uint64: one mixed hash per LSH band of the signature."""
    rows = sig.size // bands
    banded = sig[: bands * rows].reshape(bands, rows)
    with np.errstate(over="ignore"):
        h = np.full(bands, _FNV_OFFSET, dtype=np.uint64)
        for j in range(rows):
            h = (h ^ splitmix64(banded[:, j])) * _FNV_PRIME
    return h


def band_hashes_batch(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, bands) band hashes for stacked (n, num_perm) signatures."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    banded = sigs[:, : bands * rows].reshape(n, bands, rows)
    with np.errstate(over="ignore"):
        h = np.full((n, bands), _FNV_OFFSET, dtype=np.uint64)
        for j in range(rows):
            h = (h ^ splitmix64(banded[:, :, j].ravel()).reshape(n, bands)) * _FNV_PRIME
    return h


_HEX_DIGITS = np.frombuffer(b"0123456789abcdef", dtype="S1")


def hex16_batch(vals: np.ndarray) -> np.ndarray:
    """Vectorized ``%016x`` of a uint64 array: (n,) -> (n,) unicode 'U16'.

    Big-endian byte view + per-nibble table lookup -- no Python-level
    formatting per element (the f-string loop it replaces was the last
    per-row Python work in the flagship's block-key explode)."""
    if vals.size == 0:
        return np.empty(0, dtype="U16")
    b = np.ascontiguousarray(vals, dtype=">u8").view(np.uint8).reshape(-1, 8)
    out = np.empty((b.shape[0], 16), dtype="S1")
    out[:, 0::2] = _HEX_DIGITS[b >> 4]
    out[:, 1::2] = _HEX_DIGITS[b & 0x0F]
    return out.view("S16").ravel().astype("U16")


def hashed_tf_vector(hashes: np.ndarray, dim: int) -> np.ndarray:
    """L2-normalized hashed term-frequency vector (float32, `dim`).

    Feature index = mix(h) % dim, signed by one mix bit (feature hashing with
    sign trick reduces collision bias).
    """
    if hashes.size == 0:
        return np.zeros(dim, dtype=np.float32)
    mixed = splitmix64(hashes)
    idx = (mixed % np.uint64(dim)).astype(np.int64)
    sign = np.where((mixed >> np.uint64(63)).astype(bool), -1.0, 1.0)
    v = np.bincount(idx, weights=sign, minlength=dim)  # C-speed scatter-add
    n = np.linalg.norm(v)
    if n > 0:
        v /= n
    return v.astype(np.float32)


def simhash64(hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of a multiset of token hashes."""
    if hashes.size == 0:
        return 0
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.float64)
    bits = bits * 2.0 - 1.0
    if weights is not None:
        bits *= weights[:, None]
    acc = bits.sum(axis=0)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a.astype(np.uint64), b.astype(np.uint64))
    # popcount via bit tricks (numpy<2 has no bit_count)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> np.uint64(1)) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    with np.errstate(over="ignore"):
        return ((x * h01) >> np.uint64(56)).astype(np.int64)


def rolling_fingerprint(text: str, window: int = 64) -> int:
    """Deterministic document fingerprint: min of rolling FNV window hashes.

    A winnowing-style fingerprint (Schleimer et al., SIGMOD'03 idea): hash all
    `window`-char windows, keep the minimum -- stable under local edits.
    """
    h = char_shingle_hashes(text, min(window, max(1, len(text))))
    return int(h.min()) if h.size else 0
