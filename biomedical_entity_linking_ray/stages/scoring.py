"""Stage 2 -- pairwise scoring in a stateful actor pool.

The reference scores candidate pairs with warm per-worker model state
(biencoder embed+score, data_process.py:565-684; crossencoder scalar score per
pair, crossencoder.py:104-124). Here the actor holds the scoring state
(weights; a drop-in slot for a heavier model) and each `__call__` scores a
batch of pairs over zero-copy Arrow:

- ``score_jw``       Jaro-Winkler(path_a, path_b)           (rename evidence)
- ``score_jaccard``  MinHash-signature agreement             (content near-dup)
- ``score_cosine``   dot(tfvec_a, tfvec_b) (unit vectors)    (content overlap)
- ``score``          weighted blend

Runs post-contraction: every pair crosses distinct content hashes, so there
is no exact-match shortcut left to take. Output is skinny (ids + scores);
the sketch payloads stop here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from biomedical_entity_linking_ray.config import LinkageConfig
from biomedical_entity_linking_ray.functions.strings import jaro_winkler_pairs
from biomedical_entity_linking_ray.functions.vectors import binary_column_to_matrix


def _binary_to_np(col: pa.ChunkedArray, width: int, dtype) -> np.ndarray:
    """(n, width) matrix from a binary sketch column (zero-copy buffer view)."""
    return binary_column_to_matrix(col, dtype, width)


class PairScorer:
    """Actor-pool callable. State: config + score weights resident per actor."""

    def __init__(self, cfg: LinkageConfig):
        self.cfg = cfg
        self.w_jw = cfg.w_jw
        self.w_jac = cfg.w_jac
        self.w_cos = cfg.w_cos

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return EMPTY_SCORED
        sig_a = _binary_to_np(batch["sig_a"], cfg.num_perm, np.uint16)
        sig_b = _binary_to_np(batch["sig_b"], cfg.num_perm, np.uint16)
        vec_a = _binary_to_np(batch["vec_a"], cfg.tf_dim, np.float16).astype(np.float32)
        vec_b = _binary_to_np(batch["vec_b"], cfg.tf_dim, np.float16).astype(np.float32)

        jac = (sig_a == sig_b).mean(axis=1)
        cos = np.einsum("ij,ij->i", vec_a, vec_b).astype(np.float64)
        np.clip(cos, -1.0, 1.0, out=cos)
        jw = jaro_winkler_pairs(batch["path_a"].to_pylist(), batch["path_b"].to_pylist())
        score = self.w_jw * jw + self.w_jac * jac + self.w_cos * cos

        return pa.table({
            "id_a": batch["id_a"],
            "id_b": batch["id_b"],
            "block_key": batch["block_key"],
            "score_jw": pa.array(jw),
            "score_jaccard": pa.array(jac),
            "score_cosine": pa.array(cos),
            "score": pa.array(score),
        })


EMPTY_SCORED = pa.table({
    "id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string()),
    "block_key": pa.array([], pa.string()),
    "score_jw": pa.array([], pa.float64()), "score_jaccard": pa.array([], pa.float64()),
    "score_cosine": pa.array([], pa.float64()), "score": pa.array([], pa.float64()),
})


def score_pairs(
    pairs_with_feats: "ray.data.Dataset",
    cfg: LinkageConfig,
    concurrency: int | None = None,
    scorer: type = PairScorer,
) -> "ray.data.Dataset":
    """`scorer` is the crossencoder slot (reference T10, crossencoder.py:
    104-124): any class taking (cfg) in __init__ (model load, once per actor)
    and mapping a feature-pair Arrow batch to the EMPTY_SCORED schema."""
    from biomedical_entity_linking_ray.stages.normalize import pool_size

    return pairs_with_feats.map_batches(
        scorer,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        batch_size=cfg.score_batch_size,
        # None -> scale the pool with the cluster (at least the configured min)
        concurrency=pool_size(concurrency) if concurrency else pool_size(
            max(cfg.scorer_concurrency, pool_size() // 2) or 1),
    )


def threshold_edges(scored: "ray.data.Dataset", cfg: LinkageConfig) -> "ray.data.Dataset":
    """Vectorized score filter (reference analog: edge threshold,
    special_partition.pyx:374-378)."""
    tau = cfg.tau

    def flt(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["score"], pa.scalar(tau)))

    return scored.map_batches(flt, batch_format="pyarrow")
