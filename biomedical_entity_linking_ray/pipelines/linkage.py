"""The flagship pipeline: contraction -> blocking -> scoring -> clustering.

End-to-end Ray Data job over a `(repo, path, commit, lang, content)` files
table, returning cluster assignments that carry the per-row `content_sha`
invariant (reference lifecycle analog: arboEL biencoder inference, SURVEY.md
3.1 -- candidate gen -> k-NN graph -> partition -> cluster -> predict).

Dataflow (all skinny shuffles; content read exactly once in stage 0):

    files ──map_batches──> feats (sha, sketches; content dropped)
      feats ──groupby(sha).min──> members(file_id, rep_id) + reps
      reps ──explode keys──> (block_key, rep) ──salt──> groupby
      blocks ──memberset dedup──> enrich once ──fused in-block scoring──>
        scored pairs + star edges (local contraction)
      star edges ──connected components──> rep clusters ──attach members──>
        assignments

Persistence: pass ``checkpoint_root`` to land every stage in a resumable
Parquet checkpoint with a manifest (state/manifests.py) instead of pinning it
in the object store -- the 100-TB path, where `feats` alone would not fit in
cluster memory. Without a root, stages are `materialize()`d in the object
store (the small/interactive path; the streaming executor spills if needed).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
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
    star_edges: "ray.data.Dataset"    # (root, member) edges from local contraction
    assignments: "ray.data.Dataset"   # file_id, cluster_id, canonical_id, content_sha, repo, path, commit, lang


def _empty_result(feats_schema_ds: "ray.data.Dataset") -> LinkageResult:
    """Fully-typed empty result (an empty dataset has no schema in Ray, which
    would break every downstream stage)."""
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
        star_edges=empty_scored,
        assignments=ray.data.from_arrow(_FULL_SCHEMA.empty_table()),
    )


def run_linkage(
    files: "ray.data.Dataset",
    cfg: LinkageConfig = DEFAULT_CONFIG,
    feature_concurrency: int | None = None,
    checkpoint_root: str | None = None,
) -> LinkageResult:
    """Run the flagship pipeline. With ``checkpoint_root``, every stage is a
    resumable Parquet checkpoint (rerun with the same root + config resumes
    after the last complete stage); without, stages pin in the object store."""
    from biomedical_entity_linking_ray.stages import fused_scoring

    ckpt = None
    if checkpoint_root is not None:
        from biomedical_entity_linking_ray.state.manifests import CheckpointedRun

        ckpt = CheckpointedRun(checkpoint_root, cfg)

    import os as _os
    import time as _time

    _timing = bool(_os.environ.get("BEL_STAGE_TIMING"))

    def persist(name: str, build):
        """build() -> (dataset, counters). Checkpointed to parquet when a root
        was given (lineage = files on disk, object store stays skinny),
        object-store materialize otherwise."""
        t0 = _time.time()
        if ckpt is not None:
            out = ckpt.stage(name, build)
        else:
            out = build()[0].materialize()
        if _timing:
            print(f"[stage {name}] {_time.time() - t0:.2f}s", flush=True)
        return out

    # A files table read from few parquet files arrives as few blocks, and
    # block count caps stage parallelism (one task per block): split the input
    # so the content scan fans out across the cluster.
    import ray as _ray

    n_blocks = max(32, int(_ray.cluster_resources().get("CPU", 8)) * 2) \
        if _ray.is_initialized() else 32
    try:
        cur_blocks = files.num_blocks()  # known only for materialized inputs
    except NotImplementedError:
        # lazy read: ReadParquet self-splits into >= cpu-count blocks, so a
        # repartition here would only copy the full content through the
        # object store for nothing (measured ~7 s / 2.6 GB at bench scale)
        cur_blocks = None
    if cur_blocks is not None and cur_blocks < n_blocks:
        files = files.repartition(n_blocks)

    # Compact the SKINNY feature output (content already dropped) to
    # ~2x-cpu blocks: a many-file read can arrive as hundreds of small
    # blocks, and every downstream stage would pay per-task overhead on all
    # of them (measured +7s/stage at 2 CPUs); repartitioning here moves only
    # ids+sketches, never the raw content.
    feats = persist("s0_features", lambda: (
        normalize.compute_features(files, cfg, concurrency=feature_concurrency)
        .repartition(n_blocks), {}))
    if feats.count() == 0:
        return _empty_result(feats)

    # ONE contraction run feeds both outputs (members/reps are projections of
    # the same pinned join -- recomputing it per output doubles the shuffle)
    n_reps = None
    if ckpt is not None and ckpt.is_complete("s1_members") and ckpt.is_complete("s1_reps"):
        members = ckpt.read_stage("s1_members")
        reps = ckpt.read_stage("s1_reps")
    else:
        _t0 = _time.time()
        members, reps, n_reps = contraction.exact_contract(feats, cfg)
        if ckpt is not None:
            members = ckpt.write_stage("s1_members", members, {})
            reps = ckpt.write_stage("s1_reps", reps, {})
        # non-ckpt: members/reps are cheap projections of the join table that
        # exact_contract already pinned -- re-materializing them would push
        # two more copies through the object store for nothing
        if _timing:
            print(f"[stage s1 contract] {_time.time() - _t0:.2f}s", flush=True)
    if n_reps is None:
        n_reps = reps.count()

    block_rows = persist("s2_blocks", lambda: (
        blocking.salt_hot_keys(
            blocking.emit_block_keys(reps, cfg).materialize(), cfg), {}))
    # ^ inner materialize: emit output is consumed twice (hot-key counting +
    # salting rewrite) within the stage build

    # fused stage 1.5/2: member-set block dedup -> in-block scoring + local
    # contraction (see stages/fused_scoring.py). Feature delivery adapts:
    # while the rep feature table fits the broadcast bound, the coarse scoring
    # shuffle moves ONLY skinny (block_key, file_id) strings and each bucket
    # looks payloads up from the worker-cached broadcast; beyond the bound
    # (the 10^12-scale regime) features ride the shuffle via the enrich join.
    _t0 = _time.time()
    empty_blocks = block_rows.count() == 0
    # (memberset dedup / enrich cannot empty a nonempty block table, so the
    # emptiness probe reads the already-pinned block_rows)

    if empty_blocks:
        scored = ray.data.from_arrow(scoring.EMPTY_SCORED)
        stars = scored
        cc_edges = scored
    elif ckpt is not None and ckpt.is_complete("s4_scored") and ckpt.is_complete("s5_stars"):
        scored = ckpt.read_stage("s4_scored")
        stars = ckpt.read_stage("s5_stars")
        cc_edges = stars
    else:
        # Checkpointed (large) runs route the scored-pair/star dedup through
        # the Parquet disk exchange: the tagged stream -- the job's largest
        # all-to-all -- lands compressed on disk exactly once and is reduced
        # per bucket directory, instead of pinning raw Arrow in the object
        # store and paying the groupby sort's 2-3x shuffle spill (the
        # round-3 disk-headroom finding, BASELINE.md).
        spill = None
        if checkpoint_root is not None:
            import shutil as _shutil

            spill = _os.path.join(checkpoint_root, "s3_exchange")
            _shutil.rmtree(spill, ignore_errors=True)
        blocks_dd = fused_scoring.dedup_blocks_by_memberset(block_rows, cfg)
        if n_reps <= cfg.broadcast_side_max:
            feats_ref = fused_scoring.pack_rep_feats(reps, cfg)
            scored, stars, stars_raw = fused_scoring.score_blocks(
                blocks_dd, cfg, feats_ref=feats_ref, spill_dir=spill)
        else:
            enriched = fused_scoring.enrich_block_rows(blocks_dd, reps, cfg)
            scored, stars, stars_raw = fused_scoring.score_blocks(
                enriched, cfg, spill_dir=spill)
        if ckpt is not None:
            scored_m = scored.materialize()  # one reduce run feeds write + count
            scored = ckpt.write_stage(
                "s4_scored", scored_m, {"pairs_scored": scored_m.count()})
            stars = ckpt.write_stage("s5_stars", stars, {})
            cc_edges = stars  # resumable deduped artifact feeds CC
            if spill is not None:
                # both dedup consumers are durable Parquet now; the exchange
                # dir is scratch -- reclaim it (it is the run's largest file)
                _shutil.rmtree(spill, ignore_errors=True)
        else:
            # union-find ignores duplicate edges, so CC reads the raw star
            # stream and the dedup shuffle never runs on the critical path
            # (clustering re-dedups itself if the list needs the actor path);
            # the deduped `stars` stays lazy for star_edges consumers
            cc_edges = stars_raw
        # non-ckpt: BOTH outputs stay lazy over the tagged table score_blocks
        # pins internally -- clustering pulls its edges through its own skinny
        # materialize, and the scored-pair dedup shuffle (not on the critical
        # path to assignments) runs only for consumers reading scored_pairs
    if _timing:
        print(f"[stage s4/s5 score] {_time.time() - _t0:.2f}s", flush=True)

    rep_assign = persist("s6_clusters", lambda: (
        clustering.connected_components(cc_edges, reps, cfg), {}))

    # members inherit their representative's cluster; members already carry
    # the lineage columns (content_sha, repo, path, commit, lang) from
    # contraction, so attaching labels is the ONLY remaining step. Fast path:
    # broadcast the rep->cluster map when it fits (ray.put once, vectorized
    # lookup per batch); hash join beyond the bound (the 10^12-scale path).
    P = effective_partitions(cfg)

    def build_assignments():
        if rep_assign.count() <= cfg.broadcast_labels_max:
            lab_df = rep_assign.select_columns(["file_id", "cluster_id"]).to_pandas()
            # two numpy arrays, not a python dict: a multi-million-entry dict
            # costs seconds to unpickle PER WORKER; arrays deserialize as
            # buffers and the Index hashtable builds once per worker
            lab_ref = ray.put((lab_df["file_id"].to_numpy(),
                               lab_df["cluster_id"].to_numpy()))

            def attach(t: pa.Table) -> pa.Table:
                from biomedical_entity_linking_ray.functions.joins import cached_broadcast

                keys_idx, vals = cached_broadcast(
                    lab_ref, transform=lambda kv: (pd.Index(kv[0]), kv[1]))
                reps_col = t["rep_id"].to_numpy(zero_copy_only=False)
                pos = keys_idx.get_indexer(reps_col)
                import numpy as _np

                cl = _np.where(pos >= 0, vals[_np.maximum(pos, 0)], reps_col)
                return pa.table({
                    "file_id": t["file_id"], "cluster_id": pa.array(cl, pa.string()),
                    "canonical_id": pa.array(cl, pa.string()),
                    "content_sha": t["content_sha"], "repo": t["repo"],
                    "path": t["path"], "commit": t["commit"], "lang": t["lang"],
                })

            return members.map_batches(attach, batch_format="pyarrow"), {}
        joined = hash_join(
            members, rep_assign, "inner", P, on=("rep_id",), right_on=("file_id",),
            right_suffix="_rep",
        ).map_batches(
            heal_projection(_FULL_SCHEMA, lambda t: pa.table(
                {c: t[c] for c in _FULL_SCHEMA.names}
            )),
            batch_format="pyarrow",
        )
        return joined, {}

    _t0 = _time.time()
    if ckpt is not None:
        assign_full = persist("s7_assignments", build_assignments)
    else:
        assign_full = build_assignments()[0]  # lazy: consumer decides
    if _timing:
        print(f"[stage s7 attach] {_time.time() - _t0:.2f}s", flush=True)

    return LinkageResult(
        features=feats,
        members=members,
        reps=reps,
        block_rows=block_rows,
        scored_pairs=scored,
        # ADVICE fix: `edges` is what the docstring promises -- scored pairs at
        # score >= tau; the synthetic-score star edges are exposed separately.
        edges=scoring.threshold_edges(scored, cfg),
        star_edges=stars,
        assignments=assign_full,
    )


def cluster_summary(result: LinkageResult) -> "ray.data.Dataset":
    """(cluster_id, size, n_langs) for clusters with >= 2 members, largest
    first (reference analog: cluster extraction keeps components with >= 2
    nodes, eval_cluster_linking.py:134-146; per-type grouping,
    evaluate.py:686-874)."""
    from ray.data.aggregate import Count

    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate

    sizes = bucketed_aggregate(
        result.assignments.select_columns(["cluster_id", "lang"]),
        ["cluster_id"], {"size": ("lang", "count"), "n_langs": ("lang", "nunique")},
    )
    return sizes.filter(expr="size >= 2").sort("size", descending=True)
