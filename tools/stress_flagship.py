"""Flagship scale stress: large synthetic corpus, checkpointed, resumable.

VERDICT r3 #5: raise the supported single-VM envelope. The DEFAULT config's
scored-pair (id_a, id_b) max-score dedup is the job's largest all-to-all and
its sort spill exceeds this sandbox's disk above ~700 k rows; the
assignments-only deployment mode (``emit_scored_pairs=False``) never builds
that artifact, so the same VM should carry ~2x the rows. This script measures
that claim: generate a ~1.3-1.4 M-row corpus (structure scaled from the unit
corpus, vendored hot family capped), run the flagship with per-stage timing
and a Parquet checkpoint root, and print per-stage walls + an order-
independent assignments hash.

Resume check (the round-3 protocol): after a complete run, rerun with
``--wipe-stages s6_clusters s7_assignments`` in a FRESH process -- stages
s0-s5 must resume from manifests (near-zero wall) and the reprinted hash must
be bit-identical.

Usage:
    python tools/stress_flagship.py --factor 640 [--default-config]
    python tools/stress_flagship.py --factor 640 --wipe-stages s6_clusters s7_assignments

Owns its Ray session (CLI entry point; guarded init per driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("BEL_STAGE_TIMING", "1")


def assignments_hash(ds) -> tuple[int, int]:
    """(row_count, order-independent uint64 hash) over (file_id, cluster_id).

    Per-batch: hash_pandas_object -> uint64 row hashes; combine by wrapping
    sum, so block order / partitioning cannot change the digest. Streams --
    only one partial row per batch reaches the driver.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "file_id": t["file_id"].to_pandas(),
            "cluster_id": t["cluster_id"].to_pandas(),
        })
        h = pd.util.hash_pandas_object(df, index=False).to_numpy()
        s = int(np.bitwise_xor.reduce(h)) if len(h) else 0
        tot = int(h.astype(np.uint64).sum(dtype=np.uint64))
        return pa.table({"n": pa.array([len(h)], pa.int64()),
                         "x": pa.array([s], pa.uint64()),
                         "s": pa.array([tot], pa.uint64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(p["n"] for p in parts)
    x = 0
    s = 0
    for p in parts:
        x ^= int(p["x"])
        s = (s + int(p["s"])) & 0xFFFFFFFFFFFFFFFF
    return n, (x ^ s)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=float, default=640.0,
                    help="structure scale vs the unit SynthConfig (~2030 rows)")
    ap.add_argument("--hot-cap", type=int, default=10_000,
                    help="cap on the vendored hot-family size (round-3 protocol)")
    ap.add_argument("--default-config", action="store_true",
                    help="run the DEFAULT config (emit_scored_pairs=True) "
                         "instead of assignments-only mode")
    ap.add_argument("--checkpoint-root", default=None,
                    help="default: /tmp/bel_stress_<mode>_f<factor>")
    ap.add_argument("--wipe-stages", nargs="*", default=[],
                    help="checkpoint stage dirs to delete before running "
                         "(resume-after-kill protocol)")
    ap.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--broadcast-side-max", type=int, default=None,
                    help="override LinkageConfig.broadcast_side_max for runs "
                         "where this node's heap comfortably holds a bigger "
                         "feature broadcast than the conservative default "
                         "(payload is ~1.3 KB/rep; see config.py)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)

    import ray.data as rd

    from biomedical_entity_linking_ray.config import LinkageConfig, SynthConfig
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage
    from biomedical_entity_linking_ray.synth import materialize_corpus

    mode = "default" if args.default_config else "ao"
    root = args.checkpoint_root or f"/tmp/bel_stress_{mode}_f{args.factor:g}"

    for st in args.wipe_stages:
        p = os.path.join(root, st)
        if os.path.exists(p):
            shutil.rmtree(p)
            print(f"[wipe] removed {p}", flush=True)

    cfg = SynthConfig().scaled(args.factor)
    cfg = SynthConfig(**{**cfg.__dict__,
                         "hot_block_size": min(cfg.hot_block_size, args.hot_cap)})
    t0 = time.time()
    d = materialize_corpus(cfg, shards=32)
    print(f"[corpus] {d} ({time.time() - t0:.1f}s)", flush=True)

    files = rd.read_parquet(os.path.join(d, "files.parquet"))
    n_files = files.count()
    print(f"[corpus] rows={n_files}", flush=True)

    kw = {"emit_scored_pairs": args.default_config}
    if args.broadcast_side_max is not None:
        kw["broadcast_side_max"] = args.broadcast_side_max
    lcfg = LinkageConfig(**kw)
    t0 = time.time()
    res = run_linkage(files, lcfg, checkpoint_root=root)
    n, h = assignments_hash(res.assignments)
    wall = time.time() - t0
    out = {"mode": mode, "factor": args.factor, "rows": n_files,
           "assignments": n, "hash": h, "wall_s": round(wall, 1),
           "num_cpus": args.num_cpus, "checkpoint_root": root}
    print(json.dumps(out), flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
