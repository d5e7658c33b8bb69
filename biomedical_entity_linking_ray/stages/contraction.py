"""Stage 0.5 -- exact-duplicate contraction by content_sha.

Rows with identical content form a clique by definition; scoring them
pairwise is pure waste (a 10^8-copy vendored file would be 10^15 pairs).
One groupby-min assigns every row to the representative = min(file_id) of its
content_sha group; blocking / scoring / clustering then run over unique
contents only, and members inherit their representative's cluster at the end.

This is the reference's exact-dedup step (bigbio_utils.py:256-268, D1 in
SURVEY.md 2.7) promoted to a graph contraction. It also collapses the exact
hot block before the shuffle ever sees it -- salting then only has to handle
*near-dup* hot families and generic path-stem keys.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from biomedical_entity_linking_ray.config import LinkageConfig


def exact_contract(
    feats: "ray.data.Dataset", cfg: LinkageConfig
) -> tuple["ray.data.Dataset", "ray.data.Dataset", int]:
    """feature table -> (members, reps, n_reps).

    members: (file_id, rep_id, content_sha, repo, path, commit, lang) -- every input row
    reps:    feature rows where file_id == rep_id (one per unique content)
    n_reps:  unique-content count (== sha_rep rows, already computed here) --
             callers use it for broadcast-vs-join decisions without another scan
    """
    from biomedical_entity_linking_ray.config import effective_partitions
    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate
    from biomedical_entity_linking_ray.functions.joins import hash_join, heal_projection
    from biomedical_entity_linking_ray.stages.normalize import FEATURE_SCHEMA

    P = effective_partitions(cfg)
    sha_rep = bucketed_aggregate(
        feats.select_columns(["content_sha", "file_id"]),
        ["content_sha"], {"rep_id": ("file_id", "min")},
        n_buckets=P * 4,
    ).materialize()
    mem_schema = FEATURE_SCHEMA.append(pa.field("rep_id", pa.string()))
    if sha_rep.count() <= cfg.broadcast_side_max:
        # broadcast fast path: sha -> rep arrays ray.put once, ONE pandas
        # Index hashtable per worker, vectorized get_indexer per batch
        from biomedical_entity_linking_ray.functions.joins import (
            broadcast_attach_column)

        joined = broadcast_attach_column(
            feats, sha_rep.to_pandas(), "content_sha", "rep_id").materialize()
    else:
        joined = hash_join(
            feats, sha_rep, "inner", P, on=("content_sha",)
        ).map_batches(
            heal_projection(mem_schema, lambda t: t.select(mem_schema.names)),
            batch_format="pyarrow",
        ).materialize()  # members AND reps derive from this: pin once, not twice
    reps = joined.filter(expr="file_id == rep_id")
    members_skinny = joined.select_columns(
        ["file_id", "rep_id", "content_sha", "repo", "path", "commit", "lang"]
    )
    return members_skinny, reps, sha_rep.count()
