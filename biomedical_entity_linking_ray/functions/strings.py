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

    NOTE: sha256(content) -- the per-row invariant -- is computed over the RAW
    content, not this normalized form.
    """
    return _WS.sub(" ", text).strip()


def normalize_path(path: str) -> str:
    return path.strip().lower()


def path_tokens(path: str) -> list[str]:
    return [t for t in _PATH_SPLIT.split(normalize_path(path)) if t]


def path_stem(path: str) -> str:
    """Filename without directories or extension: 'src/A/util_v2.py' -> 'util_v2'."""
    base = normalize_path(path).rsplit("/", 1)[-1]
    return base.rsplit(".", 1)[0] if "." in base else base


def jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    f1 = [False] * len1
    f2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not f2[j] and s2[j] == c:
                f1[i] = True
                f2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(len1):
        if f1[i]:
            while not f2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    t = transpositions / 2
    m = matches
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
