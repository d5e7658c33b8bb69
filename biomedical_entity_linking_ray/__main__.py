"""``ray job submit`` entrypoint for the flagship linkage pipeline.

The production deployment shape (BASELINE.json north rule; ref analog: the
reference drives its candidate-gen -> rerank -> cluster flow from notebooks /
``python evaluate.py`` invocations, e.g. ``bioel/bioel/evaluate.py`` __main__
and ``krissbert/evaluate.py``) — one self-contained driver script the Ray job
manager executes on the cluster head:

    ray job submit --working-dir /path/to/repo -- \\
        python -m biomedical_entity_linking_ray \\
            --input  s3://bucket/files_parquet/ \\
            --output s3://bucket/run1/assignments \\
            --checkpoint-root s3://bucket/run1/ckpt \\
            --assignments-only --metrics-out metrics.json

Semantics:

- reads ONLY the five input columns (``repo path commit lang content``) from
  the Parquet source — column pruning at the scan, so a wider table never
  leaves storage;
- runs ``run_linkage`` under streaming execution; with ``--checkpoint-root``
  every stage lands as a resumable Parquet manifest
  (``state/manifests.py``) and a resubmitted job skips completed stages;
- writes assignments as partitioned Parquet (one file per block;
  ``--partition-cols`` adds hive partitioning, e.g. by ``lang``) — never one
  giant file;
- prints ONE final JSON line (and optionally writes it to ``--metrics-out``)
  with row counts, cluster count, per-stage checkpoint counters and wall
  time, so the job log doubles as the run's metrics record.

Ray session ownership: this is a CLI entry point, so it may own the session
(driver contract in ``__ray_entry__.py``). Under ``ray job submit`` the job
runtime exports RAY_ADDRESS and ``ray.init(address="auto")`` attaches to the
running cluster; standalone (no cluster) it starts a local one. This sandbox
has no dashboard, so the job-submission HTTP path itself can't run here —
``tests/test_job_entry.py`` executes the identical command line
(``python -m biomedical_entity_linking_ray ...``) in a fresh process, which
is verbatim what the job manager runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="python -m biomedical_entity_linking_ray",
        description="Flagship record-linkage job over a Parquet files table "
                    "(repo, path, commit, lang, content).")
    ap.add_argument("--input", required=True,
                    help="Parquet file/dir of the files table")
    ap.add_argument("--output", required=True,
                    help="output dir for the assignments Parquet")
    ap.add_argument("--checkpoint-root", default=None,
                    help="stage checkpoint root (resumable Parquet manifests; "
                         "resubmitting the job with the same root + config "
                         "resumes after the last complete stage)")
    ap.add_argument("--assignments-only", action="store_true",
                    help="emit_scored_pairs=False: skip the scored-pair "
                         "product artifact and its all-to-all dedup "
                         "(the high-throughput deployment mode)")
    ap.add_argument("--tau", type=float, default=None,
                    help="edge-decision threshold override")
    ap.add_argument("--salt-cap", type=int, default=None,
                    help="hot-block salting cap override")
    ap.add_argument("--partition-cols", nargs="*", default=None,
                    help="hive-partition the output by these columns "
                         "(e.g. lang)")
    ap.add_argument("--anchors", default=None,
                    help="Parquet file/dir with a file_id column naming "
                         "ANCHOR rows (e.g. a dictionary table): refine "
                         "clusters so each keeps >= 1 anchor (the reference "
                         "special_partition invariant; stages/anchored.py). "
                         "Batch DEFAULT mode only -- needs the scored pairs")
    ap.add_argument("--prior-checkpoint", default=None,
                    help="INCREMENTAL mode: link --input (the DELTA files "
                         "table) against the frozen prior state in this "
                         "batch-run checkpoint root, instead of re-clustering "
                         "the corpus. The config (--tau/--salt-cap/...) must "
                         "match the batch run that wrote the checkpoint "
                         "(manifest fingerprints are verified). Output is the "
                         "FULL updated assignment table unless --delta-only.")
    ap.add_argument("--delta-only", action="store_true",
                    help="incremental mode: write only the delta files' "
                         "assignment rows instead of the full updated table")
    ap.add_argument("--update-checkpoint", default=None,
                    help="incremental mode: also persist the UPDATED prior "
                         "(reps + assignments manifests) into this FRESH "
                         "root, so tomorrow's delta chains with "
                         "--prior-checkpoint <this root>; the root the "
                         "increment was derived from stays immutable")
    ap.add_argument("--metrics-out", default=None,
                    help="also write the final metrics JSON line to this path")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="LOCAL standalone runs only: size the local Ray "
                         "session; ignored when attaching to a cluster")
    return ap


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if args.update_checkpoint and not args.prior_checkpoint:
        print("error: --update-checkpoint only applies to incremental runs "
              "(--prior-checkpoint); a batch run's --checkpoint-root IS its "
              "prior", file=sys.stderr)
        return 2
    if args.anchors and args.prior_checkpoint:
        print("error: --anchors applies to batch mode (anchored refinement "
              "needs the full scored graph; run the batch job over "
              "base+delta)", file=sys.stderr)
        return 2
    if args.anchors and args.assignments_only:
        # statically decidable: reject BEFORE the batch pipeline runs
        print("error: --anchors needs the scored-pair graph; drop "
              "--assignments-only", file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        # Under `ray job submit` the job runtime exports RAY_ADDRESS and this
        # attaches to the cluster; standalone it starts a local session.
        addr = os.environ.get("RAY_ADDRESS", "auto")
        kw = {"include_dashboard": False}
        if args.num_cpus is not None and addr in ("auto", "local"):
            kw["num_cpus"] = args.num_cpus
            addr = "local"
        try:
            ray.init(address=addr, **kw)
        except ConnectionError:
            ray.init(address="local", **kw)

    import ray.data as rd

    from biomedical_entity_linking_ray.config import DEFAULT_CONFIG
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage

    cfg_kw = {}
    if args.assignments_only:
        cfg_kw["emit_scored_pairs"] = False
    if args.tau is not None:
        cfg_kw["tau"] = args.tau
    if args.salt_cap is not None:
        cfg_kw["salt_cap"] = args.salt_cap
    cfg = (type(DEFAULT_CONFIG)(**{**DEFAULT_CONFIG.__dict__, **cfg_kw})
           if cfg_kw else DEFAULT_CONFIG)

    inc_stats = None
    t0 = time.time()
    files = rd.read_parquet(
        args.input, columns=["repo", "path", "commit", "lang", "content"])
    if args.prior_checkpoint:
        # Incremental: the increment is delta-proportional, not a stage graph
        # over the corpus, so it has no checkpoint root of its own.
        if args.checkpoint_root:
            print("error: --checkpoint-root applies to batch mode; an "
                  "incremental run is delta-proportional (resubmit the whole "
                  "increment instead)", file=sys.stderr)
            return 2
        from biomedical_entity_linking_ray.pipelines.incremental import (
            checkpoint_prior, prior_from_checkpoint, run_linkage_incremental,
        )
        from biomedical_entity_linking_ray.state.manifests import (
            CheckpointedRun,
        )
        ck = CheckpointedRun(args.prior_checkpoint, cfg)
        missing = [st for st in ("s1_reps", "s7_assignments")
                   if not ck.is_complete(st)]
        if missing:
            print(f"error: prior checkpoint {args.prior_checkpoint} has no "
                  f"complete {missing} for this config (stale fingerprint or "
                  "unfinished batch run)", file=sys.stderr)
            return 2
        inc = run_linkage_incremental(
            files, prior_from_checkpoint(args.prior_checkpoint, cfg), cfg)
        out_ds = inc.delta_assignments if args.delta_only else inc.assignments
        inc_stats = inc.stats
        if args.update_checkpoint:
            if os.path.abspath(args.update_checkpoint) == os.path.abspath(
                    args.prior_checkpoint):
                print("error: --update-checkpoint must be a fresh root, not "
                      "the prior it was derived from", file=sys.stderr)
                return 2
            checkpoint_prior(inc, args.update_checkpoint, cfg)
            inc_stats = {**inc_stats,
                         "updated_prior_root": args.update_checkpoint}
    else:
        res = run_linkage(files, cfg, checkpoint_root=args.checkpoint_root)
        out_ds = res.assignments
        if args.anchors:
            from biomedical_entity_linking_ray.stages.anchored import (
                anchored_partition, exact_bond_edges,
            )
            import pyarrow as pa

            from biomedical_entity_linking_ray.functions.joins import (
                hash_join, heal_projection,
            )

            anchors_ds = rd.read_parquet(args.anchors, columns=["file_id"])
            edges = res.edges.select_columns(["id_a", "id_b", "score"]) \
                .union(exact_bond_edges(res.members))
            refined = anchored_partition(edges, res.assignments, anchors_ds)
            # re-attach the per-row invariant + lineage columns so the
            # anchored output honors the SAME job contract as the plain
            # batch output (content_sha, repo/path/commit/lang for
            # --partition-cols)
            lineage = ["content_sha", "repo", "path", "commit", "lang"]
            sch = pa.schema(
                [("file_id", pa.string()), ("cluster_id", pa.string()),
                 ("canonical_id", pa.string())]
                + [(c, pa.string()) for c in lineage])
            out_ds = hash_join(
                refined, res.members.select_columns(["file_id", *lineage]),
                "inner", 16, on=("file_id",),
            ).map_batches(
                heal_projection(sch, lambda t: t.select(sch.names)),
                batch_format="pyarrow")

    write_kw = {}
    if args.partition_cols:
        write_kw["partition_cols"] = list(args.partition_cols)
    out_ds.write_parquet(args.output, **write_kw)

    # The output is its own source of truth for counts: read it back (cheap
    # column-pruned scan) rather than re-executing assignment lineage.
    out = rd.read_parquet(args.output, columns=["cluster_id"])
    n_rows = out.count()
    n_clusters = out.groupby("cluster_id").count().count()

    stage_counters = {}
    if args.checkpoint_root:
        from biomedical_entity_linking_ray.state.manifests import (
            CheckpointedRun,
        )
        ck = CheckpointedRun(args.checkpoint_root, cfg)
        for st in ("s0_features", "s1_members", "s1_reps", "s2_blocks",
                   "s4_scored", "s5_stars", "s6_clusters",
                   "s7_assignments"):
            m = ck.manifest(st)
            if m:
                stage_counters[st] = {"rows": m.get("rows"),
                                      **(m.get("counters") or {})}

    metrics = {
        "metric": "linkage job",
        "mode": "incremental" if args.prior_checkpoint else "batch",
        "input": args.input,
        "output": args.output,
        "rows_out": n_rows,
        "n_clusters": n_clusters,
        "assignments_only": bool(args.assignments_only),
        "checkpointed": args.checkpoint_root is not None,
        "stages": stage_counters,
        "sec_total": round(time.time() - t0, 3),
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }
    if inc_stats is not None:
        metrics["incremental"] = inc_stats
        metrics["delta_only"] = bool(args.delta_only)
    line = json.dumps(metrics)
    print(line, flush=True)
    if args.metrics_out:
        with open(args.metrics_out, "w") as f:
            f.write(line + "\n")

    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
