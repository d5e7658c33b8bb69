"""Ray-Data-native record-linkage engine.

A from-scratch re-expression of the query/data-processing capabilities of the
biomedical-entity-linking benchmark (candidate generation -> pairwise scoring ->
cluster assignment, see SURVEY.md) as a three-stage ``ray.data.Dataset`` job
over Parquet tables of source-code files ``(repo, path, commit, lang, content)``:

1. **blocking** -- ``map_batches`` over zero-copy Arrow computing sha256 exact
   keys, MinHash/LSH band keys and lang+path-token keys, materialized through a
   salted ``groupby`` shuffle (reference analog: TF-IDF / k-NN candidate
   generation, ``scispacy_embeddings.py``, ``BiEncoderLightningModule.py``).
2. **pairwise scoring** -- actor-pool ``map_batches`` emitting Jaro-Winkler on
   paths, MinHash-estimated token-Jaccard and hashed-TF cosine on content
   (reference analog: biencoder/crossencoder scoring, ``crossencoder.py``).
3. **transitive clustering** -- distributed connected components via iterative
   min-label propagation + pointer jumping over groupby shuffles (reference
   analog: ``special_partition.pyx`` + ``eval_cluster_linking.py``).

Nothing here calls ``ray.init()`` -- sessions are owned by the caller
(driver / pytest fixture / bench.py).
"""

def _tune_allocator() -> None:
    """Raise glibc's mmap/trim thresholds so the multi-MB numpy temporaries
    every batch kernel churns through are served from the REUSED brk heap
    instead of fresh mmap regions (which glibc unmaps on free, so every
    elementwise op re-pays ~1 page fault / 4 KB on the next batch; measured
    5x on a-fnv-pass-sized arrays). Runs once per process at package import
    -- Ray workers import this package when they deserialize any stage UDF.
    Opt out with BEL_NO_MALLOC_TUNE=1. No-op off Linux/glibc.
    """
    import ctypes
    import os
    import sys

    if os.environ.get("BEL_NO_MALLOC_TUNE") or not sys.platform.startswith("linux"):
        return
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 256 << 20)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 256 << 20)  # M_TRIM_THRESHOLD
    except Exception:
        pass


_tune_allocator()

from biomedical_entity_linking_ray.config import LinkageConfig  # noqa: E402

__all__ = ["LinkageConfig"]
__version__ = "0.1.0"
