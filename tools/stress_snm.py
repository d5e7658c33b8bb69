"""SNM boundary-sampling stress at 10^7 DISTINCT sort keys.

Evidence for the round-4 verdict finding: the boundary sample used a fixed
hash-residue modulus (h % 16 == 0), pulling O(n_keys/16) rows to the driver
-- a scale-killer at the 10^9+ distinct-key regime SNM targets. Round 5
derives the modulus from the distinct-key count so the driver pull is
bounded at ~64*n_ranges rows at ANY cardinality.

This script (a) measures the ACTUAL sampled-pool size at 10^7 distinct keys
(same fnv1a residue the production sampler applies), (b) runs the full
sorted_neighborhood_pairs rank+window cascade end to end at that scale, and
(c) cross-checks the pair count against the closed form for all-distinct
keys (window pairs over a global rank of n rows: sum_{w=1..W} (n-w)).

    python tools/stress_snm.py [n_rows] [window]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sys.path.insert(0, REPO)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from biomedical_entity_linking_ray.config import default_buckets
    from biomedical_entity_linking_ray.functions import hashing
    from biomedical_entity_linking_ray.pipelines.similarity import (
        sorted_neighborhood_pairs,
    )

    # --- synthesize: n rows, ALL-DISTINCT 16-hex-char names ---
    work = "/tmp/snm_stress"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    t0 = time.time()
    ids = np.arange(n, dtype=np.uint64)
    names = hashing.hex16_batch(hashing.splitmix64(ids))
    pq.write_table(pa.table({
        "p_partkey": pa.array(ids.astype(np.int64)),
        "p_name": pa.array(names, pa.string()),
    }), os.path.join(work, "part.parquet"))
    gen_s = time.time() - t0

    # --- (a) driver-pull bound: replicate the production derivation ---
    n_ranges = default_buckets()
    sample_target = max(64 * n_ranges, 256)
    mod = np.uint64(max(1, 1 << max(
        0, int(n / sample_target - 1).bit_length())))
    h = hashing.fnv1a_fixed(names, width=64)
    pool = int((h % mod == 0).sum())
    old_pool = int((h % np.uint64(16) == 0).sum())  # the pre-fix pull

    # --- (b) full cascade end to end ---
    t0 = time.time()
    pairs = sorted_neighborhood_pairs(
        work, window=window, spill_dir=os.path.join(work, "spill"))
    n_pairs = pairs.count()
    wall = time.time() - t0

    # --- (c) closed form for all-distinct keys ---
    expect = sum(n - w for w in range(1, window + 1))
    out = {
        "n_rows": n, "distinct_keys": n, "window": window,
        "n_ranges": n_ranges, "sample_target": sample_target,
        "modulus": int(mod), "sampled_pool": pool,
        "pre_fix_pool_mod16": old_pool,
        "pairs": n_pairs, "pairs_expected": expect,
        "pairs_match": n_pairs == expect,
        "gen_sec": round(gen_s, 1), "snm_sec": round(wall, 1),
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()
    return 0 if n_pairs == expect and pool <= 4 * sample_target else 1


if __name__ == "__main__":
    raise SystemExit(main())
