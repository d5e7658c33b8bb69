"""Benchmark harness.

Plain run: executes the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N}

--scaling: runs the headline linkage pipeline twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and prints both times plus the
scaling efficiency (sandbox proxy for the N -> 4N cluster-size rule).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline operator set: the flagship linkage job + one representative of each
# family (aggregation, join, top-k, dedup, similarity, text). Light queries
# run first: the first stages of a fresh Ray session pay worker spawn +
# import cost, which would otherwise be misattributed to the flagship job.
BENCH_QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "top_orders",
    "token_counts",
    "exact_dedup",
    "minhash_near_dup",
    # sub-document dedup family (round 3): ExactSubstr at word 8-grams
    "substring_dedup",
    "knn_bruteforce",
    # semantic-curation family (round 4): 3 Lloyd partial-sum passes +
    # cluster-scoped cosine prune (SemDeDup)
    "semdedup",
    # selection family (round 4): DSIR fit pass (bincount combiners) +
    # streaming score pass over the corpus text
    "dsir_weights",
    # temporal-join family (round 3): banded range self-join over events
    "events_nearby",
    # fuzzy-join family (round 4): blocked Levenshtein verify (batched DP)
    "fuzzy_name_pairs",
    # sketch family (round 4): Count-Min prune -> exact heavy hitters
    "heavy_hitter_ngrams",
    # the synthetic-corpus flagship: the SAME workload BENCH_r01/r02 timed
    # under the name "linkage_assignments" (that name now runs the planted
    # oracle corpus for the driver's value-exact check; see BASELINE.md note)
    "linkage_synth_assignments",
]


def _consume(res) -> int:
    """Force execution; return row count."""
    if hasattr(res, "count"):
        return res.count()
    return len(res)


def run_bench() -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import __ray_entry__ as ent

    qs = ent.queries()
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    # warm the page cache so we measure compute + shuffle, not first disk read
    for t in ["lineitem", "orders", "documents", "embeddings"]:
        with open(os.path.join(SF_DIR, f"{t}.parquet"), "rb") as f:
            f.read()
    # materialize the synthetic files corpus BEFORE timing: it is the linkage
    # query's INPUT table (driver-side data prep), not pipeline work
    from biomedical_entity_linking_ray.synth import materialize_corpus, synth_config_for_sf_dir

    materialize_corpus(synth_config_for_sf_dir(SF_DIR))

    # spin up the worker pool before the timer: a fresh Ray session pays
    # ~3-5 s of worker spawn + module import on its first stage, which is
    # session startup, not operator cost (a long-lived cluster pays it once)
    import ray.data as _rd

    _rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 2).map_batches(
        lambda b: b).count()

    # median-of-N per query (default 3): this shared-host VM carries up to
    # ~40% run-to-run noise, so single samples made round-over-round
    # comparison need prose caveats; medians + mins make BENCH files
    # self-describing. The headline value is the SUM OF MEDIANS.
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "3"))
    import statistics

    timings_min: dict[str, float] = {}
    timings_max: dict[str, float] = {}
    total_t0 = time.time()
    for name in BENCH_QUERIES:
        samples = []
        for _ in range(reps):
            # the linkage entries memoize per sf_dir -- clear so every rep
            # runs the real pipeline, not a cache hit
            ent._LINKAGE_CACHE.clear()
            ent._PLANTED_CACHE.clear()
            t0 = time.time()
            rows[name] = _consume(qs[name](SF_DIR))
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 3)
        timings_min[name] = round(min(samples), 3)
        timings_max[name] = round(max(samples), 3)
    wall = round(time.time() - total_t0, 3)

    out = {
        "metric": "headline pipelines wall time (linkage + operator battery; "
                  "sum of per-query medians)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_min": timings_min,
        "queries_max": timings_max,
        "reps": reps,
        "wall_all_reps": wall,
        "rows": rows,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def run_linkage_only() -> dict:
    """Flagship linkage on a larger synthetic corpus (the scaling workload:
    compute-bound, so the N vs 4N comparison measures the pipeline, not the
    driver's fixed per-job latency)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from biomedical_entity_linking_ray.config import LinkageConfig, SynthConfig
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage
    from biomedical_entity_linking_ray.synth import materialize_corpus

    # Default = the round-2 scaling workload (factor 60, 134,204 rows of
    # ~6-10 KB files) so efficiency is comparable round over round. Smaller
    # factors under-amortize fixed per-job latency (factor 30 measured 0.74
    # vs 0.80 at 60 on identical code); factor 120 gains nothing (0.75 --
    # the 8-CPU leg starts paying object-store pressure on this VM).
    factor = float(os.environ.get("GRAFT_SCALE_FACTOR", "60"))
    # content_scale ~6 plants ~6-10 KB source files: representative of a real
    # source-code corpus (the unit-test corpus uses ~1.5 KB rows for speed,
    # which over-weights shuffle overhead relative to the content scan)
    content_scale = float(os.environ.get("GRAFT_CONTENT_SCALE", "6"))
    shards = 24 if factor > 20 else 1  # parallel generation for big corpora
    d = materialize_corpus(
        SynthConfig().scaled(factor, content_scale=content_scale), shards=shards)
    # size read blocks to the session: the default splitter can emit hundreds
    # of small blocks (24 shard files x 9 splits), and every one becomes a
    # task in each downstream stage -- pure overhead at low CPU counts
    files = rd.read_parquet(os.path.join(d, "files.parquet"),
                            override_num_blocks=max(32, NUM_CPUS * 2))
    n_input = files.count()  # warms the page cache too

    t0 = time.time()
    res = run_linkage(files, LinkageConfig())
    n_assign = res.assignments.count()
    dt = round(time.time() - t0, 3)
    n_pairs = res.scored_pairs.count()
    out = {
        "metric": "linkage wall time (synthetic files corpus)",
        "value": dt,
        "unit": "sec",
        "rows_in": n_input,
        "rows_out": n_assign,
        "pairs_scored": n_pairs,
        "rows_per_sec": round(n_input / dt, 1),
        "pairs_scored_per_sec": round(n_pairs / dt, 1),
        "factor": factor,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    import shutil

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        cmd = [sys.executable, os.path.abspath(__file__), "--linkage-only"]
        if shutil.which("taskset"):
            # pin to a REAL n-core cpuset: ray.init(num_cpus=n) only gates task
            # scheduling -- untracked threads (Arrow kernels, object store)
            # would otherwise overshoot the budget and corrupt the N-vs-4N
            # hardware proxy
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
    # default: BOTH N->4N legs (2->8 and 8->32) so one artifact carries the
    # small-cluster bar AND the hardware-ceiling regime of this shared VM;
    # GRAFT_SCALING_LO/HI narrow it to a single pair
    lo_env, hi_env = (os.environ.get("GRAFT_SCALING_LO"),
                      os.environ.get("GRAFT_SCALING_HI"))
    pairs = ([(int(lo_env), int(hi_env))] if lo_env and hi_env
             else [(2, 8), (8, 32)])

    # best-of-N per CPU count: the sandbox VM shares its host, so single runs
    # carry up to ~40% noise; min wall-time approximates uncontended hardware
    best: dict[int, dict] = {}
    for n in sorted({c for p in pairs for c in p}):
        best[n] = min((run(n) for _ in range(reps)), key=lambda r: r["value"])

    legs = {}
    for lo, hi in pairs:
        t_lo, t_hi = best[lo]["value"], best[hi]["value"]
        legs[f"{lo}_to_{hi}"] = {
            f"sec_{lo}": t_lo, f"sec_{hi}": t_hi,
            "speedup": round(t_lo / t_hi, 3),
            "efficiency": round((t_lo / t_hi) / (hi / lo), 3),
        }
    head_lo, head_hi = pairs[0]
    any_r = best[head_lo]
    return {
        "metric": "scaling efficiency (N -> 4N cpus, taskset-pinned fresh "
                  "processes, same input)",
        "legs": legs,
        # flat fields for the headline pair (driver-artifact compatibility)
        f"sec_{head_lo}": best[head_lo]["value"],
        f"sec_{head_hi}": best[head_hi]["value"],
        "speedup": legs[f"{head_lo}_to_{head_hi}"]["speedup"],
        "scaling_efficiency": legs[f"{head_lo}_to_{head_hi}"]["efficiency"],
        "rows_in": any_r["rows_in"],
        "pairs_scored": any_r["pairs_scored"],
        **{f"rows_per_sec_{n}": best[n]["rows_per_sec"] for n in best},
        "workload": "linkage on synthetic files corpus factor="
                    + os.environ.get("GRAFT_SCALE_FACTOR", "60"),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--linkage-only" in sys.argv:
        print(json.dumps(run_linkage_only()))
    else:
        print(json.dumps(run_bench()))
