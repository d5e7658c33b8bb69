"""Incremental linkage: link a DELTA of new files against a previously
clustered corpus without rescanning its content or re-clustering untouched
rows.

A production entity-resolution deployment at the 100 TB scale never re-runs
the flagship over the whole corpus for each day's arrivals — it links the
increment against frozen prior state. Per-increment cost here:

- raw content is scanned for the DELTA only (stage i0);
- the base corpus contributes three skinny MAP-ONLY passes — no shuffle ever
  moves base rows the delta cannot affect: re-deriving block keys from the
  stored rep features (i2, sketches only, content never re-read), the
  touched-cluster lookup over prior assignments (i4), and the
  untouched-assignment passthrough (i6). Each pass filters map-side against
  a broadcast of a delta-proportional key set (Bloom/semijoin fallback
  beyond the bound);
- every shuffle (delta contraction, block scoring, connected components)
  runs over delta-proportional tables: the touched blocks and the prior
  clusters they intersect.

Semantics (tested in tests/test_incremental.py):

- **sticky reps** — a content_sha already present in the base keeps its
  prior rep_id, so cluster identities are stable across increments and
  known-content arrivals attach without rescoring anything;
- **monotone connectivity** — prior matches are never lost; new edges come
  from FULLY rescoring every block that a new-content delta rep lands in
  (all its base and delta members, salted at their combined counts), plus
  the prior cluster edges of every touched cluster;
- **labels are min-file_id per connected component**, identical to the
  batch pipeline, so ``incremental(base, delta) == run_linkage(base+delta)``
  whenever blocking enumerates the same candidate pairs in both runs —
  guaranteed when no touched block crosses ``all_pairs_max`` / ``salt_cap``
  (pair windows and salt splits are membership-order dependent above those
  caps; below them pair sets are exact). The planted-corpus driver query
  `linkage_incremental` value-checks this equality against the same
  closed-form SQL oracle as `linkage_assignments`.

Reference analog: the reference's inference entry points resolve each NEW
mention batch against a frozen prebuilt ontology index (bioel
models/biencoder inference + krissbert predict: load index, embed queries,
link) rather than retraining/rebuilding per batch — this pipeline is that
lifecycle applied to the linkage corpus itself.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from biomedical_entity_linking_ray.config import (
    DEFAULT_CONFIG, LinkageConfig, effective_partitions)
from biomedical_entity_linking_ray.functions.groups import (
    bucketed_aggregate, bucketed_distinct)
from biomedical_entity_linking_ray.functions.joins import (
    bloom_anti_join, bloom_semi_join, broadcast_attach_column,
    cached_broadcast, hash_join,
    heal_projection)
from biomedical_entity_linking_ray.stages import blocking, clustering, normalize
from biomedical_entity_linking_ray.pipelines.linkage import _FULL_SCHEMA


@dataclass
class LinkagePrior:
    """Frozen state of a prior `run_linkage` the increment links against.

    Exactly two artifacts a checkpointed run already lands: the rep feature
    table (one row per unique content; sketches only, never raw content) and
    the final assignments. Membership/edges are NOT needed — prior
    connectivity is fully encoded by the assignment labels."""

    reps: "ray.data.Dataset"         # s1_reps: feature rows, file_id == rep_id
    assignments: "ray.data.Dataset"  # s7_assignments: _FULL_SCHEMA


def prior_from_result(res) -> LinkagePrior:
    """Prior state from an in-memory LinkageResult (same-session chaining)."""
    return LinkagePrior(reps=res.reps, assignments=res.assignments)


def prior_from_checkpoint(root: str, cfg: LinkageConfig = DEFAULT_CONFIG) -> LinkagePrior:
    """Prior state from a `run_linkage(checkpoint_root=...)` directory — the
    cross-session path: increments run against Parquet, nothing is pinned."""
    from biomedical_entity_linking_ray.state.manifests import CheckpointedRun

    ck = CheckpointedRun(root, cfg)
    return LinkagePrior(
        reps=ck.read_stage("s1_reps"),
        assignments=ck.read_stage("s7_assignments"),
    )


@dataclass
class IncrementalResult:
    assignments: "ray.data.Dataset"        # full corpus: untouched ∪ relabeled
    delta_assignments: "ray.data.Dataset"  # the delta files' rows only
    scored_pairs: "ray.data.Dataset"       # audit: pairs scored in touched blocks
    updated_reps: "ray.data.Dataset"       # prior.reps ∪ new-content delta reps
    stats: dict


def prior_from_incremental(inc: IncrementalResult) -> LinkagePrior:
    """Prior state from a finished increment — day-over-day chaining: the next
    delta links against base ∪ all prior deltas without any batch rerun.
    Sticky reps compose: a sha seen in ANY earlier wave keeps the rep that
    wave assigned, so blocking keys (functions of content sketches, not of
    which file is rep) match a batch run's keys wave after wave."""
    return LinkagePrior(reps=inc.updated_reps, assignments=inc.assignments)


def checkpoint_prior(
    inc: IncrementalResult,
    root: str,
    cfg: LinkageConfig = DEFAULT_CONFIG,
) -> None:
    """Persist the increment's updated prior (s1_reps + s7_assignments
    manifests) into a FRESH checkpoint root, so the next increment can run
    cross-session via `prior_from_checkpoint(root, cfg)`.

    Refuses a root that already holds a complete prior for this config: the
    state an increment was derived from stays immutable — a failed writeback
    must never corrupt the only copy of the prior."""
    from biomedical_entity_linking_ray.state.manifests import CheckpointedRun

    ck = CheckpointedRun(root, cfg)
    if ck.is_complete("s1_reps") or ck.is_complete("s7_assignments"):
        raise ValueError(
            f"{root} already holds a complete prior for this config; "
            "write the updated prior to a fresh root")
    ck.write_stage("s1_reps", inc.updated_reps, {})
    ck.write_stage("s7_assignments", inc.assignments, {})


def _isin_filter(
    ds: "ray.data.Dataset",
    col: str,
    values_ds,
    n_values: int,
    cfg: LinkageConfig,
    keep: bool = True,
) -> "ray.data.Dataset":
    """Map-side ``col [NOT] IN values`` filter.

    The filter side here is always delta-proportional: under the broadcast
    bound it ships once via ray.put and each worker builds ONE pandas Index
    hashtable (O(batch) probes per batch — the fused_scoring semi-filter
    shape); beyond the bound it falls back to the exact Bloom semi/anti join
    (misses emitted map-side, only hits enter a shuffle). `values_ds` may be
    a numpy array already on the driver (fast paths that computed the key
    set driver-side anyway), which skips the collection job."""
    if n_values == 0:
        if keep:
            return ds.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
        return ds
    if n_values <= cfg.broadcast_side_max:
        if isinstance(values_ds, np.ndarray):
            vals = values_ds
        else:
            vals = values_ds.to_pandas()[col].to_numpy()
        ref = ray.put(vals)

        def f(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            idx = cached_broadcast(ref, transform=pd.Index)
            pos = idx.get_indexer(t[col].to_numpy(zero_copy_only=False))
            m = pos >= 0
            return t.filter(pa.array(m if keep else ~m))

        return ds.map_batches(f, batch_format="pyarrow")
    if isinstance(values_ds, np.ndarray):
        values_ds = ray.data.from_arrow(
            pa.table({col: pa.array(values_ds)}))
    P = effective_partitions(cfg)
    fn = bloom_semi_join if keep else bloom_anti_join
    return fn(ds, values_ds, col, col, num_partitions=P)


def _rename2(ds: "ray.data.Dataset", cols: list[str], names: list[str]) -> "ray.data.Dataset":
    """Project `cols` and rename to `names` (skinny, lazy)."""

    def f(t: pa.Table) -> pa.Table:
        return pa.table({n: t[c] for c, n in zip(cols, names)})

    return ds.map_batches(f, batch_format="pyarrow")


_EMPTY_BLOCKS = pa.schema(
    [("block_key", pa.string()), ("file_id", pa.string())])


def run_linkage_incremental(
    new_files: "ray.data.Dataset",
    prior: LinkagePrior,
    cfg: LinkageConfig = DEFAULT_CONFIG,
    feature_concurrency: int | None = None,
) -> IncrementalResult:
    """Link `new_files` (repo, path, commit, lang, content) against `prior`.

    Returns the FULL updated assignment table (untouched prior rows pass
    through as a map-side filtered scan — never shuffled) plus the
    delta-only view and per-stage counts."""
    from biomedical_entity_linking_ray.stages import fused_scoring, scoring

    import os as _os
    import time as _time

    _timing = bool(_os.environ.get("BEL_STAGE_TIMING"))
    _t = [_time.time()]

    def _mark(name: str) -> None:
        if _timing:
            now = _time.time()
            print(f"[inc {name}] {now - _t[0]:.2f}s", flush=True)
            _t[0] = now

    P = effective_partitions(cfg)
    stats: dict = {}

    # ---- i0: delta features — the ONLY content scan in the job -----------
    dfeats = normalize.compute_features(
        new_files, cfg, concurrency=feature_concurrency).materialize()
    n_delta = dfeats.count()
    _mark("i0 delta features")
    stats["n_delta_files"] = n_delta
    if n_delta == 0:
        from biomedical_entity_linking_ray.stages import scoring as _scoring

        empty = ray.data.from_arrow(_FULL_SCHEMA.empty_table())
        return IncrementalResult(
            prior.assignments, empty,
            ray.data.from_arrow(_scoring.EMPTY_SCORED), prior.reps, stats)

    # ---- i1: sticky contraction of the delta ------------------------------
    # shas already in the base keep their prior rep (one skinny map-only pass
    # over prior.reps filtered against the broadcast delta-sha set); new shas
    # take min(delta file_id) — which IS min over base∪delta for a new sha.
    if n_delta <= cfg.broadcast_side_max:
        # driver-side fast path: the sha→rep map is delta-proportional, so
        # pull the two skinny delta key columns once and derive delta_shas /
        # min-per-sha / new_sha_rep in pandas — same values as the shuffle
        # path below, minus four barrier jobs. At bench-scale deltas the
        # increment's wall is dominated by the per-stage scheduling floor,
        # not data, so collapsing barriers is the honest optimization here.
        ddf = dfeats.select_columns(["content_sha", "file_id"]).to_pandas()
        delta_sha_vals = ddf["content_sha"].unique()
        n_dsha = len(delta_sha_vals)
        base_matched_df = _isin_filter(
            prior.reps.select_columns(["content_sha", "file_id"]),
            "content_sha", delta_sha_vals, n_dsha, cfg, keep=True,
        ).to_pandas()
        if "content_sha" not in base_matched_df.columns:
            # a fully-empty filter result loses its schema on collection
            base_matched_df = pd.DataFrame(
                {"content_sha": pd.Series([], dtype=object),
                 "file_id": pd.Series([], dtype=object)})
        base_matched_df = base_matched_df.rename(columns={"file_id": "rep_id"})
        n_matched = len(base_matched_df)
        dmin = (ddf.groupby("content_sha", sort=False)["file_id"].min()
                .reset_index().rename(columns={"file_id": "rep_id"}))
        new_sha_rep_df = dmin[~dmin["content_sha"].isin(
            pd.Index(base_matched_df["content_sha"]))]
        n_new_shas = len(new_sha_rep_df)
        sha_rep_df = pd.concat(
            [base_matched_df, new_sha_rep_df], ignore_index=True)
        new_rep_vals = new_sha_rep_df["rep_id"].to_numpy()
        delta_id_vals = ddf["file_id"].unique()
        n_delta_ids = len(delta_id_vals)
        members_delta = broadcast_attach_column(
            dfeats, sha_rep_df, "content_sha", "rep_id").materialize()
        reps_delta_new = _isin_filter(
            dfeats, "file_id", new_rep_vals, n_new_shas, cfg, keep=True,
        ).materialize()
    else:
        delta_shas = bucketed_distinct(
            dfeats.select_columns(["content_sha"]), ["content_sha"],
            n_buckets=P,
        ).materialize()
        n_dsha = delta_shas.count()
        base_matched = _isin_filter(
            prior.reps.select_columns(["content_sha", "file_id"]),
            "content_sha", delta_shas, n_dsha, cfg, keep=True,
        )
        base_matched = _rename2(
            base_matched, ["content_sha", "file_id"],
            ["content_sha", "rep_id"],
        ).materialize()
        n_matched = base_matched.count()

        delta_min = bucketed_aggregate(
            dfeats.select_columns(["content_sha", "file_id"]),
            ["content_sha"], {"rep_id": ("file_id", "min")}, n_buckets=P,
        )
        new_sha_rep = _isin_filter(
            delta_min, "content_sha",
            base_matched.select_columns(["content_sha"]), n_matched, cfg,
            keep=False,
        ).materialize()
        n_new_shas = new_sha_rep.count()
        sha_rep = base_matched.union(new_sha_rep).materialize()

        # attach rep_id onto the delta feature rows (contraction members
        # shape); beyond the broadcast bound this is the exact_contract
        # hash-join shape
        if n_dsha <= cfg.broadcast_side_max:
            members_delta = broadcast_attach_column(
                dfeats, sha_rep.to_pandas(), "content_sha", "rep_id",
            ).materialize()
        else:
            members_delta = hash_join(
                dfeats, sha_rep, "inner", P, on=("content_sha",)).materialize()

        # feature rows of the NEW-content reps (these are the only rows that
        # can create new blocks: known-content arrivals attach via i1 and
        # change no block's membership under sticky reps)
        new_rep_ids = new_sha_rep.select_columns(["rep_id"])
        reps_delta_new = _isin_filter(
            dfeats, "file_id",
            _rename2(new_rep_ids, ["rep_id"], ["file_id"]), n_new_shas, cfg,
            keep=True,
        ).materialize()
        delta_id_vals = bucketed_distinct(
            members_delta.select_columns(["file_id"]), ["file_id"],
            n_buckets=P,
        ).materialize()
        n_delta_ids = delta_id_vals.count()
    stats["n_shas_matched_in_base"] = n_matched
    stats["n_new_shas"] = n_new_shas
    _mark("i1 sticky contraction")

    # ---- i2: touched blocks ------------------------------------------------
    # delta reps emit their block keys; base block rows are re-derived from
    # the STORED rep features (map-only, sketches not content) and filtered
    # map-side to the touched key set before anything shuffles.
    if n_new_shas > 0:
        delta_keys = blocking.emit_block_keys(reps_delta_new, cfg).materialize()
        dkeys = bucketed_distinct(
            delta_keys.select_columns(["block_key"]), ["block_key"],
            n_buckets=P,
        ).materialize()
        n_dkeys = dkeys.count()
        base_touched = _isin_filter(
            blocking.emit_block_keys(prior.reps, cfg),
            "block_key", dkeys, n_dkeys, cfg, keep=True,
        )
        block_rows = blocking.salt_hot_keys(
            base_touched.union(delta_keys).materialize(), cfg)
        # combined counts == the batch run's counts for these keys, so the
        # salt split matches a full rerun wherever salting binds at all
    else:
        n_dkeys = 0
        block_rows = ray.data.from_arrow(_EMPTY_BLOCKS.empty_table())
    stats["n_touched_block_keys"] = n_dkeys
    _mark("i2 touched blocks")

    # ---- i3: score touched blocks (the flagship's fused path) -------------
    n_block_rows = block_rows.count()
    if n_block_rows == 0:
        stars_raw = ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.string()),
            "id_b": pa.array([], pa.string()),
            "block_key": pa.array([], pa.string()),
        }))
        scored = ray.data.from_arrow(scoring.EMPTY_SCORED)
        touched_rep_ids = ray.data.from_arrow(
            pa.table({"file_id": pa.array([], pa.string())}))
        n_touched_reps = 0
    else:
        blocks_dd = fused_scoring.dedup_blocks_by_memberset(block_rows, cfg)
        touched_rep_ids = bucketed_distinct(
            block_rows.select_columns(["file_id"]), ["file_id"], n_buckets=P,
        ).materialize()
        n_touched_reps = touched_rep_ids.count()
        feat_cols = ["file_id", "path_norm", "sig", "tfvec"]
        scoring_feats = _isin_filter(
            prior.reps.select_columns(feat_cols), "file_id",
            touched_rep_ids, n_touched_reps, cfg, keep=True,
        ).union(reps_delta_new.select_columns(feat_cols)).materialize()
        if scoring_feats.count() <= cfg.broadcast_side_max:
            feats_ref = fused_scoring.pack_rep_feats(scoring_feats, cfg)
            scored, _stars, stars_raw = fused_scoring.score_blocks(
                blocks_dd, cfg, feats_ref=feats_ref)
        else:
            enriched = fused_scoring.enrich_block_rows(
                blocks_dd, scoring_feats, cfg)
            scored, _stars, stars_raw = fused_scoring.score_blocks(enriched, cfg)
    stats["n_touched_reps"] = n_touched_reps
    _mark("i3 score touched blocks")

    # ---- i4: which prior clusters can the delta actually move? -------------
    # Rescored base-base pairs in touched blocks were already enumerated by
    # the base run (identical blocks, identical caps), so their edges are
    # redundant with the prior labels. The only NEW connectivity is in
    # star-edge components that CONTAIN a delta file (local contraction keeps
    # every chain member in one component, so delta-mediated base-base links
    # always share a component with the delta node that caused them). A first
    # CC over just the new edges — delta-proportional — finds those
    # components; prior clusters intersecting them are the full relabel
    # scope. Everything else passes through untouched, so the increment's
    # shuffles never grow with blocks that merely got rescored to no effect.
    if isinstance(delta_id_vals, np.ndarray):
        delta_ids = ray.data.from_arrow(
            pa.table({"file_id": pa.array(delta_id_vals)}))
    else:
        delta_ids = delta_id_vals
    member_edges = _rename2(
        members_delta, ["rep_id", "file_id"], ["id_a", "id_b"])
    new_edges = stars_raw.select_columns(["id_a", "id_b"]).union(member_edges)
    new_cc = clustering.connected_components(
        new_edges, delta_ids, cfg).materialize()
    delta_comps = bucketed_distinct(
        _isin_filter(new_cc.select_columns(["file_id", "cluster_id"]),
                     "file_id", delta_id_vals, n_delta_ids, cfg, keep=True)
        .select_columns(["cluster_id"]),
        ["cluster_id"], n_buckets=P,
    ).materialize()
    touched_nodes = _isin_filter(
        new_cc.select_columns(["file_id", "cluster_id"]), "cluster_id",
        delta_comps, delta_comps.count(), cfg, keep=True,
    ).select_columns(["file_id"]).materialize()
    n_touched_nodes = touched_nodes.count()
    stats["n_new_component_nodes"] = n_touched_nodes

    touched_clusters = bucketed_distinct(
        _isin_filter(
            prior.assignments.select_columns(["file_id", "cluster_id"]),
            "file_id", touched_nodes, n_touched_nodes, cfg, keep=True,
        ).select_columns(["cluster_id"]),
        ["cluster_id"], n_buckets=P,
    ).materialize()
    n_touched_clusters = touched_clusters.count()
    stats["n_touched_clusters"] = n_touched_clusters
    cluster_members = _isin_filter(
        prior.assignments, "cluster_id", touched_clusters,
        n_touched_clusters, cfg, keep=True,
    ).materialize()
    stats["n_touched_base_files"] = cluster_members.count()
    _mark("i4 touched clusters")

    # ---- i5: final components over the touched region (file level) --------
    # prior cluster edges (label → member) carry the base connectivity of
    # every touched cluster; the delta-component new edges carry the rest.
    # Labels = min file_id per component — identical to the batch pipeline
    # because every cluster label is itself a member file id.
    if n_touched_clusters == 0:
        # no prior cluster intersects a delta component, so every delta
        # component is all-delta (a base node in one would have a prior
        # assignment, touching its cluster) and the i4 CC over the new edges
        # IS the final labeling: same nodes, same edges, same min-file_id
        # labels the dedicated CC below would recompute.
        relabel = _isin_filter(
            new_cc, "file_id", delta_id_vals, n_delta_ids, cfg, keep=True,
        ).materialize()
    else:
        prior_edges = _rename2(
            cluster_members, ["cluster_id", "file_id"], ["id_a", "id_b"])
        scoped_new_edges = _isin_filter(
            new_edges, "id_a", _rename2(touched_nodes, ["file_id"], ["id_a"]),
            n_touched_nodes, cfg, keep=True)
        edges = prior_edges.union(scoped_new_edges)
        nodes = cluster_members.select_columns(["file_id"]).union(
            members_delta.select_columns(["file_id"]))
        relabel = clustering.connected_components(edges, nodes, cfg)
    _mark("i5 relabel CC")

    # ---- i6: assemble -------------------------------------------------------
    # lineage columns ride from prior assignments (base) / delta members
    lineage_cols = ["file_id", "content_sha", "repo", "path", "commit", "lang"]
    lineage = cluster_members.select_columns(lineage_cols).union(
        members_delta.select_columns(lineage_cols)).materialize()
    n_scope = lineage.count()
    if relabel.count() <= cfg.broadcast_labels_max:
        lab_df = relabel.select_columns(["file_id", "cluster_id"]).to_pandas()
        lab_ref = ray.put((lab_df["file_id"].to_numpy(),
                           lab_df["cluster_id"].to_numpy()))

        def attach_label(t: pa.Table) -> pa.Table:
            keys_idx, vals = cached_broadcast(
                lab_ref, transform=lambda kv: (pd.Index(kv[0]), kv[1]))
            fid = t["file_id"].to_numpy(zero_copy_only=False)
            pos = keys_idx.get_indexer(fid)
            cl = np.where(pos >= 0, vals[np.maximum(pos, 0)], fid)
            return pa.table({
                "file_id": t["file_id"],
                "cluster_id": pa.array(cl, pa.string()),
                "canonical_id": pa.array(cl, pa.string()),
                "content_sha": t["content_sha"], "repo": t["repo"],
                "path": t["path"], "commit": t["commit"], "lang": t["lang"],
            })

        relabeled_full = lineage.map_batches(
            attach_label, batch_format="pyarrow")
    else:
        relabeled_full = hash_join(
            lineage, relabel.select_columns(["file_id", "cluster_id"]),
            "inner", P, on=("file_id",), right_suffix="_lab",
        ).map_batches(
            heal_projection(_FULL_SCHEMA, lambda t: pa.table({
                "file_id": t["file_id"], "cluster_id": t["cluster_id"],
                "canonical_id": t["cluster_id"],
                "content_sha": t["content_sha"], "repo": t["repo"],
                "path": t["path"], "commit": t["commit"], "lang": t["lang"],
            })),
            batch_format="pyarrow",
        )
    relabeled_full = relabeled_full.materialize()
    stats["n_relabeled"] = n_scope

    untouched = _isin_filter(
        prior.assignments, "cluster_id", touched_clusters,
        n_touched_clusters, cfg, keep=False,
    )
    assignments = untouched.union(relabeled_full)

    delta_assignments = _isin_filter(
        relabeled_full, "file_id", delta_id_vals, n_delta_ids, cfg, keep=True)

    # updated prior reps for the NEXT increment: base reps pass through
    # untouched (sticky), new-content delta reps join with rep_id == file_id
    # (they are their own rep, as in the batch s1_reps schema).
    def _with_rep_id(t: pa.Table) -> pa.Table:
        return t.append_column("rep_id", t["file_id"])

    updated_reps = prior.reps.union(
        reps_delta_new.map_batches(_with_rep_id, batch_format="pyarrow"))
    _mark("i6 assemble")
    return IncrementalResult(
        assignments, delta_assignments, scored, updated_reps, stats)
