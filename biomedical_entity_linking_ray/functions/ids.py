"""Stable row identity derivation shared by the generator and the pipeline.

`file_id = sha256(repo|path|commit)` and `content_sha = sha256(content)`
(FIXTURES.md 1). Hex strings: at 10^12 rows a 64-bit surrogate would collide
(birthday bound ~5e4 collisions), so ids stay 256-bit hex; label propagation
compares them lexicographically which is a total order, all we need.
"""

from __future__ import annotations

import hashlib


def file_id_of(repo: str, path: str, commit: str) -> str:
    key = f"{repo}|{path}|{commit}"
    return hashlib.sha256(key.encode("utf-8", "surrogatepass")).hexdigest()


def content_sha_of(content: str) -> str:
    return hashlib.sha256(content.encode("utf-8", "surrogatepass")).hexdigest()
