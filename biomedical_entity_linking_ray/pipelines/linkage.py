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

from biomedical_entity_linking_ray.config import DEFAULT_CONFIG, LinkageConfig, effective_partitions
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
    feature_concurrency: int | None = None,
) -> LinkageResult:
    # A files table read from few parquet files arrives as few blocks, and
    # block count caps stage parallelism (one task per block): split the input
    # so the content scan fans out across the cluster.
    import ray as _ray

    n_blocks = max(32, int(_ray.cluster_resources().get("CPU", 8)) * 2) \
        if _ray.is_initialized() else 32
    files = files.repartition(n_blocks)

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

    block_rows = blocking.emit_block_keys(reps, cfg).materialize()
    # ^ consumed twice (hot-key counting + salting rewrite): pin, don't recompute
    block_rows = blocking.salt_hot_keys(block_rows, cfg).materialize()

    # fused stage 1.5/2: member-set block dedup -> enrich once -> in-block
    # scoring + local contraction (see stages/fused_scoring.py for why this
    # replaces the two-join pair-feature attach at scale)
    from biomedical_entity_linking_ray.stages import fused_scoring

    blocks_dd = fused_scoring.dedup_blocks_by_memberset(block_rows, cfg)
    enriched = fused_scoring.enrich_block_rows(blocks_dd, reps, cfg).materialize()
    if enriched.count() == 0:
        scored = ray.data.from_arrow(scoring.EMPTY_SCORED)
        edges = scored
    else:
        scored, edges = fused_scoring.score_blocks(enriched, cfg)
        scored = scored.materialize()

    rep_assign = clustering.connected_components(edges, reps, cfg).materialize()

    # members inherit their representative's cluster; members already carry
    # the lineage columns (content_sha, repo, path, commit, lang) from
    # contraction, so attaching labels is the ONLY remaining step. Fast path:
    # broadcast the rep->cluster map when it fits (ray.put once, vectorized
    # lookup per batch); hash join beyond the bound (the 10^12-scale path).
    P = effective_partitions(cfg)
    if rep_assign.count() <= cfg.broadcast_labels_max:
        import pandas as _pd

        lab_df = rep_assign.select_columns(["file_id", "cluster_id"]).to_pandas()
        lab_ref = ray.put(dict(zip(lab_df["file_id"], lab_df["cluster_id"])))

        def attach(t: pa.Table) -> pa.Table:
            lab = ray.get(lab_ref)
            reps_col = t["rep_id"].to_pylist()
            cl = [lab.get(r, r) for r in reps_col]
            return pa.table({
                "file_id": t["file_id"], "cluster_id": pa.array(cl, pa.string()),
                "canonical_id": pa.array(cl, pa.string()),
                "content_sha": t["content_sha"], "repo": t["repo"],
                "path": t["path"], "commit": t["commit"], "lang": t["lang"],
            })

        assign_full = members.map_batches(attach, batch_format="pyarrow")
    else:
        assign_full = hash_join(
            members, rep_assign, "inner", P, on=("rep_id",), right_on=("file_id",),
            right_suffix="_rep",
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
