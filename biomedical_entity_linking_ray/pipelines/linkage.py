"""The flagship pipeline: contraction -> blocking -> scoring -> clustering.

End-to-end Ray Data job over a `(repo, path, commit, lang, content)` files
table, returning cluster assignments that carry the per-row `content_sha`
invariant (reference lifecycle analog: arboEL biencoder inference, SURVEY.md
3.1 -- candidate gen -> k-NN graph -> partition -> cluster -> predict).

Dataflow (all skinny shuffles; content read exactly once in stage 0):

    files ──map_batches──> feats (sha, sketches; content dropped)
      feats ──groupby(sha).min──> members(file_id, rep_id) + reps
      reps ──explode keys──> (block_key, rep) ──salt──> groupby ──> pairs
      pairs ──dedup──> join feats x2 ──actor pool──> scored ──filter──> edges
      edges ──label propagation──> rep clusters ──join members──> assignments
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

import ray.data

from biomedical_entity_linking_ray.config import DEFAULT_CONFIG, LinkageConfig
from biomedical_entity_linking_ray.functions.joins import hash_join, heal_projection
from biomedical_entity_linking_ray.stages import blocking, clustering, contraction, normalize, scoring


_ASSIGN_SCHEMA = pa.schema([
    ("file_id", pa.string()), ("cluster_id", pa.string()),
    ("canonical_id", pa.string()), ("content_sha", pa.string()),
])
_FULL_SCHEMA = pa.schema([
    ("file_id", pa.string()), ("cluster_id", pa.string()),
    ("canonical_id", pa.string()), ("content_sha", pa.string()),
    ("repo", pa.string()), ("path", pa.string()),
    ("commit", pa.string()), ("lang", pa.string()),
])


@dataclass
class LinkageResult:
    features: "ray.data.Dataset"      # file_id, content_sha, lang, ... (content dropped)
    members: "ray.data.Dataset"       # file_id, rep_id, content_sha
    reps: "ray.data.Dataset"          # feature rows of unique contents
    block_rows: "ray.data.Dataset"    # block_key, file_id (reps, post-salting)
    scored_pairs: "ray.data.Dataset"  # id_a, id_b, block_key, score_*, score
    edges: "ray.data.Dataset"         # scored pairs with score >= tau
    assignments: "ray.data.Dataset"   # file_id, cluster_id, canonical_id, content_sha, repo, path, commit, lang


def run_linkage(
    files: "ray.data.Dataset",
    cfg: LinkageConfig = DEFAULT_CONFIG,
    feature_concurrency: int | None = 4,
) -> LinkageResult:
    feats = normalize.compute_features(files, cfg, concurrency=feature_concurrency)
    # feats feeds contraction + the final lineage join: pin once instead of
    # re-running the content scan.
    feats = feats.materialize()
    if feats.count() == 0:
        # empty input: return a fully-typed empty result (an empty dataset has
        # no schema in Ray, which would break every downstream stage)
        feats = ray.data.from_arrow(normalize.FEATURE_SCHEMA.empty_table())
        empty_str2 = ray.data.from_arrow(pa.schema(
            [("block_key", pa.string()), ("file_id", pa.string())]).empty_table())
        empty_scored = ray.data.from_arrow(scoring.EMPTY_SCORED)
        return LinkageResult(
            features=feats,
            members=ray.data.from_arrow(pa.schema(
                [("file_id", pa.string()), ("rep_id", pa.string()),
                 ("content_sha", pa.string())]).empty_table()),
            reps=feats,
            block_rows=empty_str2,
            scored_pairs=empty_scored,
            edges=empty_scored,
            assignments=ray.data.from_arrow(_FULL_SCHEMA.empty_table()),
        )

    members, reps = contraction.exact_contract(feats, cfg)
    members = members.materialize()
    reps = reps.materialize()

    block_rows = blocking.emit_block_keys(reps, cfg)
    block_rows = blocking.salt_hot_keys(block_rows, cfg).materialize()

    pairs = blocking.generate_pairs(block_rows, cfg).materialize()
    if pairs.count() == 0:
        # no co-blocked candidates at all: a schema-less empty dataset would
        # break the downstream joins, so substitute a typed empty edge table
        scored = ray.data.from_arrow(scoring.EMPTY_SCORED)
        edges = scored
    else:
        pairs_f = blocking.attach_pair_features(pairs, reps, cfg)
        scored = scoring.score_pairs(pairs_f, cfg).materialize()
        edges = scoring.threshold_edges(scored, cfg)

    rep_assign = clustering.connected_components(edges, reps, cfg)

    # members inherit their representative's cluster (hash join on rep_id)
    P = cfg.join_partitions
    assign = hash_join(
        members, rep_assign, "inner", P, on=("rep_id",), right_on=("file_id",),
        right_suffix="_rep",
    ).map_batches(
        heal_projection(_ASSIGN_SCHEMA, lambda t: pa.table({
            "file_id": t["file_id"],
            "cluster_id": t["cluster_id"],
            "canonical_id": t["canonical_id"],
            "content_sha": t["content_sha"],
        })),
        batch_format="pyarrow",
    )
    # lineage join: provenance columns back onto every assignment so the
    # per-row sha256 invariant + origin are checkable on the final output
    lineage = feats.select_columns(["file_id", "repo", "path", "commit", "lang"])
    assign_full = hash_join(
        assign, lineage, "inner", P, on=("file_id",)
    ).map_batches(
        heal_projection(_FULL_SCHEMA, lambda t: pa.table(
            {c: t[c] for c in _FULL_SCHEMA.names}
        )),
        batch_format="pyarrow",
    )

    return LinkageResult(
        features=feats,
        members=members,
        reps=reps,
        block_rows=block_rows,
        scored_pairs=scored,
        edges=edges,
        assignments=assign_full,
    )


def cluster_summary(result: LinkageResult) -> "ray.data.Dataset":
    """(cluster_id, size) for clusters with >= 2 members, largest first
    (reference analog: cluster extraction keeps components with >= 2 nodes,
    eval_cluster_linking.py:134-146)."""
    from ray.data.aggregate import Count

    sizes = result.assignments.groupby("cluster_id").aggregate(Count(alias_name="size"))
    return sizes.filter(expr="size >= 2").sort("size", descending=True)
