"""String similarity and normalization scalar kernels.

Pure-python Jaro-Winkler (no external deps in this container); applied per
pair inside batched stages -- path strings are short (<200 chars) so the
per-call cost is tiny vs. the content kernels.

Reference analogs: alias string normalization (umls_utils lowercase flags,
sapbert data utils) and candidate-name similarity; the target domain swaps
alias-vs-alias similarity for path-vs-path Jaro-Winkler (SURVEY.md 2.9).
"""

from __future__ import annotations

import re

_WS = re.compile(r"\s+")
_PATH_SPLIT = re.compile(r"[/\\._\-]+")


def normalize_content(text: str) -> str:
    """Whitespace-collapse + strip; the canonical form fed to shingling.

    `str.split`/join instead of a regex sub: C-speed, ~3x faster on multi-KB
    content, same unicode-whitespace semantics.

    NOTE: sha256(content) -- the per-row invariant -- is computed over the RAW
    content, not this normalized form.
    """
    return " ".join(text.split())


def normalize_path(path: str) -> str:
    return path.strip().lower()


def path_tokens(path: str) -> list[str]:
    return [t for t in _PATH_SPLIT.split(normalize_path(path)) if t]


def path_stem(path: str) -> str:
    """Filename without directories or extension: 'src/A/util_v2.py' -> 'util_v2'."""
    base = normalize_path(path).rsplit("/", 1)[-1]
    return base.rsplit(".", 1)[0] if "." in base else base


# per-process cache of s2 -> {char: [positions]} (paths repeat heavily across
# the pair stream; building the index is the O(L) part worth reusing)
_POS_CACHE: dict[str, dict] = {}
_POS_CACHE_CAP = 200_000


def _char_positions(s: str) -> dict:
    d = _POS_CACHE.get(s)
    if d is None:
        d = {}
        for j, c in enumerate(s):
            d.setdefault(c, []).append(j)
        if len(_POS_CACHE) >= _POS_CACHE_CAP:
            _POS_CACHE.clear()
        _POS_CACHE[s] = d
    return d


def jaro(s1: str, s2: str) -> float:
    """Classical Jaro with the standard greedy window matching, O(len1+len2):
    per-character position lists of s2 with monotone pointers replace the
    O(len*window) inner scan (the window lower bound only ever increases, so
    a pointer never needs to back up)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    pos = _char_positions(s2)
    ptr: dict[str, int] = {}
    m1: list[str] = []   # matched chars of s1 in i order
    mj: list[int] = []   # their matched positions in s2
    for i, c in enumerate(s1):
        pl = pos.get(c)
        if pl is None:
            continue
        p = ptr.get(c, 0)
        lo = i - match_window
        n = len(pl)
        while p < n and pl[p] < lo:
            p += 1
        if p < n and pl[p] <= i + match_window:
            m1.append(c)
            mj.append(pl[p])
            p += 1
        ptr[c] = p
    m = len(m1)
    if m == 0:
        return 0.0
    # transpositions: matched chars of s2 taken in position order
    transpositions = 0
    for c, j in zip(m1, sorted(mj)):
        if c != s2[j]:
            transpositions += 1
    t = transpositions / 2
    return (m / len1 + m / len2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1, max_prefix: int = 4) -> float:
    j = jaro(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b or prefix >= max_prefix:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1.0 - j)


# per-process pair-result memo: the same (path_a, path_b) pair recurs across
# LSH bands / blocks within a worker's pair stream; the memo turns repeats
# into one dict hit (bounded -- cleared at cap, correctness unaffected)
_JW_CACHE: dict[tuple, float] = {}
_JW_CACHE_CAP = 2_000_000


# lazily compiled C kernel (see _jw_kernel.c). None = not probed yet,
# False = probe failed (no compiler) -> pure-Python fallback.
_JW_LIB = None


def _load_jw_kernel():
    global _JW_LIB
    if _JW_LIB is not None:
        return _JW_LIB or None
    try:
        import ctypes
        import hashlib
        import os
        import subprocess
        import tempfile

        src = os.path.join(os.path.dirname(__file__), "_jw_kernel.c")
        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        so = os.path.join(tempfile.gettempdir(), f"bel_jw_{tag}.so")
        if not os.path.exists(so):
            # unique tmp + atomic rename: many Ray workers may race here
            tmp = f"{so}.{os.getpid()}.tmp"
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", src, "-o", tmp],
                check=True, capture_output=True, timeout=60,
            )
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        lib.jw_batch.restype = None
        lib.jw_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_double, ctypes.c_int64,
        ]
        _JW_LIB = lib
    except Exception:
        _JW_LIB = False
    return _JW_LIB or None


def _jw_cached(s1: str, s2: str) -> float:
    cache = _JW_CACHE
    v = cache.get((s1, s2))
    if v is None:
        v = jaro_winkler(s1, s2)
        if len(cache) >= _JW_CACHE_CAP:
            cache.clear()
        cache[(s1, s2)] = v
    return v


def jaro_winkler_pairs(paths_a, paths_b) -> "np.ndarray":
    """Batched Jaro-Winkler over parallel arrays of strings.

    Vectorized preparation: identical pairs short-circuit to 1.0, the rest
    are factorized to DISTINCT (a, b) pairs (LSH bands repeat the same path
    pair many times), each scored once by the compiled C kernel over a
    UTF-32 string table, then scattered back. Falls back to the memoized
    pure-Python scalar when no C compiler is available.
    """
    import numpy as np
    import pandas as pd

    n = len(paths_a)
    a = np.asarray(paths_a, dtype=object)
    b = np.asarray(paths_b, dtype=object)
    out = np.empty(n, dtype=np.float64)
    eq = a == b
    out[eq] = 1.0
    rest = np.flatnonzero(~eq)
    if rest.size == 0:
        return out
    codes, uniques = pd.factorize(np.concatenate([a[rest], b[rest]]), sort=False)
    ca = codes[: rest.size].astype(np.uint64)
    cb = codes[rest.size:].astype(np.uint64)
    packed, inv = np.unique((ca << np.uint64(32)) | cb, return_inverse=True)
    uia = (packed >> np.uint64(32)).astype(np.int64)
    uib = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    lib = _load_jw_kernel()
    if lib is None:
        vals = np.fromiter(
            (_jw_cached(uniques[i], uniques[j]) for i, j in zip(uia, uib)),
            dtype=np.float64, count=uia.size)
    else:
        import ctypes

        enc = [s.encode("utf-32-le") for s in uniques]
        lens = np.fromiter((len(e) >> 2 for e in enc), dtype=np.int64,
                           count=len(enc))
        offs = np.zeros(len(enc) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        buf = np.frombuffer(b"".join(enc) or b"\x00\x00\x00\x00", dtype=np.uint32)
        vals = np.empty(uia.size, dtype=np.float64)
        lib.jw_batch(
            ctypes.c_void_p(buf.ctypes.data), ctypes.c_void_p(offs.ctypes.data),
            ctypes.c_void_p(uia.ctypes.data), ctypes.c_void_p(uib.ctypes.data),
            ctypes.c_int64(uia.size), ctypes.c_void_p(vals.ctypes.data),
            ctypes.c_double(0.1), ctypes.c_int64(4),
        )
        bad = np.flatnonzero(vals < 0.0)  # per-pair malloc failure sentinel
        for k in bad:
            vals[k] = jaro_winkler(uniques[uia[k]], uniques[uib[k]])
    out[rest] = vals[inv]
    return out


def levenshtein_batch(strs_a, strs_b) -> "np.ndarray":
    """Batched Levenshtein distance over parallel string arrays, vectorized
    ACROSS pairs (reference comparator family: string-similarity candidate
    verification, bioel/bioel/ontology/umls_utils.py alias matching -- here
    as the classic edit-distance record-linkage comparator).

    The row recurrence L[i][j] = min(A[j], L[i][j-1] + 1) -- whose insertion
    term is sequential in j -- has the closed form
    L[i][j] = j + min_{k<=j}(C[k] - k) with C = [i, A[1..m]], so each DP row
    is ONE np.minimum.accumulate over a (pairs x m+1) matrix: the only Python
    loop is over the longest left-string length, every step is a full-batch
    numpy kernel. Identical pairs short-circuit to 0; repeated (a, b) pairs
    (blocked joins repeat hot names) are factorized to uniques first.
    """
    import numpy as np
    import pandas as pd

    n = len(strs_a)
    a = np.asarray(strs_a, dtype=object)
    b = np.asarray(strs_b, dtype=object)
    out = np.zeros(n, dtype=np.int64)
    eq = a == b
    rest = np.flatnonzero(~eq)
    if rest.size == 0:
        return out
    codes, uniques = pd.factorize(np.concatenate([a[rest], b[rest]]), sort=False)
    ca = codes[: rest.size].astype(np.uint64)
    cb = codes[rest.size:].astype(np.uint64)
    packed, inv = np.unique((ca << np.uint64(32)) | cb, return_inverse=True)
    uia = (packed >> np.uint64(32)).astype(np.int64)
    uib = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)

    enc = [s.encode("utf-32-le") for s in uniques]
    lens = np.fromiter((len(e) >> 2 for e in enc), dtype=np.int64, count=len(enc))
    la, lb = lens[uia], lens[uib]
    m = int(lb.max(initial=0))
    lmax = int(la.max(initial=0))
    npair = uia.size
    # code-point matrix of the right-hand strings, padded with an impossible
    # sentinel so padded columns never fake a zero substitution cost
    B = np.full((npair, m), 0xFFFFFFFF, dtype=np.uint32)
    for r, j in enumerate(uib):
        e = enc[j]
        B[r, : lens[j]] = np.frombuffer(e, dtype=np.uint32)
    A_chars = np.zeros((npair, lmax), dtype=np.uint32)
    for r, i in enumerate(uia):
        e = enc[i]
        A_chars[r, : lens[i]] = np.frombuffer(e, dtype=np.uint32)

    dp = np.broadcast_to(np.arange(m + 1, dtype=np.int32), (npair, m + 1)).copy()
    vals = np.empty(npair, dtype=np.int64)
    done = la == 0
    vals[done] = lb[done]
    ramp = np.arange(m + 1, dtype=np.int32)
    C = np.empty((npair, m + 1), dtype=np.int32)
    for i in range(1, lmax + 1):
        sub = (A_chars[:, i - 1, None] != B).astype(np.int32)
        C[:, 0] = i
        np.minimum(dp[:, :-1] + sub, dp[:, 1:] + 1, out=C[:, 1:])
        np.subtract(C, ramp, out=C)
        np.minimum.accumulate(C, axis=1, out=C)
        np.add(C, ramp, out=dp)
        hit = la == i
        if hit.any():
            vals[hit] = dp[hit, lb[hit]]
    out[rest] = vals[inv]
    return out
