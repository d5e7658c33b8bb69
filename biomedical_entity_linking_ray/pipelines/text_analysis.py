"""Text-analysis operators over the `documents` table.

Large-scale training-data hygiene stages, each a vectorized `map_batches`
over zero-copy Arrow (reference analogs: mention-text normalization M1-M5 and
dataset statistics A5 in SURVEY.md 2.2/2.5):

- token counting       (whitespace/word-regex tokens; SQL-oracle-able)
- quality scoring      (length / punctuation / stopword / repetition ratios)
- language ID          (stopword-profile n-gram heuristic; no oracle)
- fingerprinting       (rolling min-hash document fingerprint; rows-only)

Every function takes `sf_dir` and reads only the columns it needs.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_WORD = re.compile(r"[A-Za-z0-9_]+")

# tiny per-language stopword profiles for the heuristic language ID
# (deterministic, vocabulary-based -- a standard n-gram/stopword LID shape)
_LID_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "para", "que"},
    "zh": set(),  # CJK handled by a codepoint-ratio rule below
}


def read_documents(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def token_counts(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_tokens, n_chars_norm): word-regex token count per doc."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_tok = np.fromiter((len(_WORD.findall(s)) for s in texts), dtype=np.int64, count=len(texts))
        n_chr = np.fromiter((len(s) for s in texts), dtype=np.int64, count=len(texts))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok),
            "n_chars_norm": pa.array(n_chr),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )


class QualityScorer:
    """Actor-pool callable: compiled regexes + stopword set as per-actor state."""

    def __init__(self):
        self.word = _WORD
        self.punct = re.compile(r"[^\w\s]")
        self.stop = _LID_PROFILES["en"]

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        n_tok = np.empty(n, np.int64)
        stop_ratio = np.empty(n, np.float64)
        punct_ratio = np.empty(n, np.float64)
        uniq_ratio = np.empty(n, np.float64)
        for i, s in enumerate(texts):
            toks = self.word.findall(s.lower())
            n_tok[i] = len(toks)
            stop_ratio[i] = (sum(1 for w in toks if w in self.stop) / len(toks)) if toks else 0.0
            punct_ratio[i] = len(self.punct.findall(s)) / max(1, len(s))
            uniq_ratio[i] = (len(set(toks)) / len(toks)) if toks else 0.0
        quality = (
            np.clip(n_tok / 32.0, 0, 1) * 0.3
            + (1.0 - punct_ratio) * 0.2
            + uniq_ratio * 0.3
            + np.clip(stop_ratio * 4, 0, 1) * 0.2
        )
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok),
            "stopword_ratio": pa.array(stop_ratio),
            "punct_ratio": pa.array(punct_ratio),
            "unique_token_ratio": pa.array(uniq_ratio),
            "quality": pa.array(quality),
        })


def quality_scores(sf_dir: str, concurrency: int = 2) -> "ray.data.Dataset":
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        QualityScorer, batch_format="pyarrow", batch_size=4096, concurrency=concurrency
    )


class LanguageId:
    """Stopword-profile language identifier (actor pool; profiles built once)."""

    def __init__(self):
        self.profiles = {k: v for k, v in _LID_PROFILES.items() if v}
        self.word = _WORD

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        langs = []
        for s in texts:
            cjk = sum(1 for ch in s[:400] if "一" <= ch <= "鿿")
            if cjk > len(s[:400]) * 0.05:
                langs.append("zh")
                continue
            toks = set(self.word.findall(s.lower())[:200])
            best, best_hits = "unknown", 0
            for lang, prof in self.profiles.items():
                hits = len(toks & prof)
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best if best_hits >= 1 else "unknown")
        return pa.table({
            "doc_id": t["doc_id"],
            "lang_true": t["lang"],
            "lang_pred": pa.array(langs, pa.string()),
        })


def language_id(sf_dir: str, concurrency: int = 2) -> "ray.data.Dataset":
    return read_documents(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        LanguageId, batch_format="pyarrow", batch_size=4096, concurrency=concurrency
    )


def fingerprints(sf_dir: str, window: int = 32) -> "ray.data.Dataset":
    """(doc_id, fingerprint): winnowing-style rolling-hash min fingerprint."""
    from biomedical_entity_linking_ray.functions import hashing

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        fps = np.fromiter(
            (hashing.rolling_fingerprint(s, window) for s in texts),
            dtype=np.uint64, count=len(texts),
        )
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(fps)})

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )
