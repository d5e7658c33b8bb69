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


def jaro_winkler_pairs(paths_a, paths_b) -> "np.ndarray":
    """Batched memoized Jaro-Winkler over parallel arrays of strings."""
    import numpy as np

    n = len(paths_a)
    out = np.empty(n, dtype=np.float64)
    cache = _JW_CACHE
    for k in range(n):
        key = (paths_a[k], paths_b[k])
        v = cache.get(key)
        if v is None:
            v = jaro_winkler(key[0], key[1])
            if len(cache) >= _JW_CACHE_CAP:
                cache.clear()
            cache[key] = v
        out[k] = v
    return out
