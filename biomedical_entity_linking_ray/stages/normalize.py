"""Stage 0 -- normalization + content features over zero-copy Arrow batches.

One pass over the raw files table computing, per row:
- ``file_id``     sha256(repo|path|commit)      (stable identity)
- ``content_sha`` sha256(raw content)           (the per-row invariant column)
- ``path_norm`` / ``stem``                      (for Jaro-Winkler + path keys)
- ``sig``         MinHash signature, binary (num_perm x uint16 LE bytes --
                  the low 16 bits of each 64-bit min; band keys and the
                  equality-based Jaccard estimate are unaffected beyond a
                  ~2^-16 per-perm collision bias, and every downstream
                  shuffle ships 4x fewer sketch bytes)
- ``tfvec``       hashed-TF unit vector, binary (tf_dim x float16 LE bytes;
                  decoded to float32 at the consumer -- cosine at score
                  precision, half the wire size)

Sketches travel as opaque binary: Arrow binary columns pass through hash
joins / shuffles untouched (acero rejects fixed_size_list payloads) and
decode zero-copy with ``np.frombuffer`` at the consumer.
- ``n_tokens``    token count (cheap quality stat)

``content`` is DROPPED from the output: every downstream shuffle moves only
ids + fixed-size sketches (SURVEY.md 7.4 "Very wide rows"). At 100 TB the
raw bytes are read exactly once, in this stage.

Reference analog: `dataset_to_df` normalization (bigbio_utils.py:163-299) +
TF-IDF char-ngram vectorization (scispacy_embeddings.py:143-159), re-expressed
as a stateful actor-pool `map_batches` (MinHasher built once per actor).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from biomedical_entity_linking_ray.config import LinkageConfig
from biomedical_entity_linking_ray.functions import hashing, strings
from biomedical_entity_linking_ray.functions.ids import content_sha_of, file_id_of


FEATURE_SCHEMA = pa.schema([
    ("file_id", pa.string()), ("content_sha", pa.string()),
    ("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
    ("lang", pa.string()), ("path_norm", pa.string()), ("stem", pa.string()),
    ("n_tokens", pa.int64()), ("sig", pa.binary()), ("tfvec", pa.binary()),
])


class FeatureExtractor:
    """Actor-pool callable: per-actor state = MinHash permutation table."""

    def __init__(self, cfg: LinkageConfig):
        self.cfg = cfg
        self.hasher = hashing.MinHasher(cfg.num_perm, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        commits = batch["commit"].to_pylist()
        contents = batch["content"].to_pylist()

        n = len(repos)
        file_ids = [file_id_of(r, p, c) for r, p, c in zip(repos, paths, commits)]
        shas = [content_sha_of(c) for c in contents]
        path_norms = [strings.normalize_path(p) for p in paths]
        stems = [strings.path_stem(p) for p in paths]

        # NOTE: the whole content pipeline stays PER ROW on purpose: a ~7 KB
        # row's hash arrays are L1/L2-resident across all ~30 kernel steps,
        # while the batched variants (shingle_hashes_batch / signature_batch
        # / hashed_tf_batch -- kept for many-small-text callers) stream
        # multi-MB temporaries through DRAM and measured 3-8x SLOWER here.
        sigs = np.empty((n, cfg.num_perm), dtype=np.uint16)
        vecs = np.empty((n, cfg.tf_dim), dtype=np.float16)
        n_tokens = np.empty(n, dtype=np.int64)
        for i, content in enumerate(contents):
            norm = strings.normalize_content(content)
            sh = hashing.sample_shingles(
                hashing.char_shingle_hashes(norm, cfg.shingle_k, cfg.max_shingles),
                cfg.shingle_sample_mod)
            sigs[i] = self.hasher.signature(sh).astype(np.uint16)  # low 16 bits
            vecs[i] = hashing.hashed_tf_vector(sh, cfg.tf_dim).astype(np.float16)
            n_tokens[i] = norm.count(" ") + 1 if norm else 0

        out = pa.table({
            "file_id": pa.array(file_ids, pa.string()),
            "content_sha": pa.array(shas, pa.string()),
            "repo": batch["repo"],
            "path": batch["path"],
            "commit": batch["commit"],
            "lang": batch["lang"],
            "path_norm": pa.array(path_norms, pa.string()),
            "stem": pa.array(stems, pa.string()),
            "n_tokens": pa.array(n_tokens),
            "sig": pa.array([sigs[i].tobytes() for i in range(n)], pa.binary()),
            "tfvec": pa.array([vecs[i].tobytes() for i in range(n)], pa.binary()),
        })
        return out


def pool_size(requested: int | None = None) -> int:
    """Actor-pool size: `requested` clamped to cpus-2, or cpus-2 when None.
    A pool equal to num_cpus starves the read/shuffle stages and the
    streaming executor deadlocks (observed at num_cpus=4)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    cap = max(1, cpus - 2) if cpus > 2 else 1
    return cap if requested is None else max(1, min(requested, cap))


# Per-worker-process hasher cache: stateless *tasks* reuse long-lived Ray
# workers, so the MinHash permutation table is built once per worker without
# paying actor-pool startup (measured: a 30-actor pool costs ~7 s before the
# first batch; tasks start instantly). Model-heavy stages (PairScorer,
# ImageDecoder) stay actor pools -- their state is worth a pool.
_EXTRACTOR_CACHE: dict[tuple, FeatureExtractor] = {}


def _extract_batch(batch: pa.Table, cfg: LinkageConfig) -> pa.Table:
    key = (cfg.num_perm, cfg.seed, cfg.shingle_k, cfg.max_shingles, cfg.tf_dim)
    ex = _EXTRACTOR_CACHE.get(key)
    if ex is None:
        ex = FeatureExtractor(cfg)
        _EXTRACTOR_CACHE[key] = ex
    return ex(batch)


def compute_features(
    files: "ray.data.Dataset",
    cfg: LinkageConfig,
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """files(repo,path,commit,lang,content) -> feature table (content dropped)."""
    import functools

    return files.map_batches(
        functools.partial(_extract_batch, cfg=cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
    )
