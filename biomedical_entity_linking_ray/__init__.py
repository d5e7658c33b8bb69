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

from biomedical_entity_linking_ray.config import LinkageConfig

__all__ = ["LinkageConfig"]
__version__ = "0.1.0"
