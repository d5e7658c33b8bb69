"""FIXTURES.md §6: plain single-process oracle vs the distributed engine.

A pure numpy/pandas implementation of blocking -> scoring -> clustering (no
Ray; shares only the scalar kernels, which define the SEMANTICS) recomputes
the flagship pipeline on a small corpus. The distributed engine must match
it EXACTLY -- block-key sets, scored pairs including float score values, and
final cluster assignments -- so any divergence introduced by parallel
execution (ordering, partitioning, broadcast vs join paths) is caught here.

Config notes: salt_cap is set above every planted block size and
all_pairs_max above every block's membership so both sides enumerate ALL
within-block pairs (no salting/windowing to mirror).
"""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from biomedical_entity_linking_ray.config import LinkageConfig, SynthConfig
from biomedical_entity_linking_ray.functions import hashing, strings
from biomedical_entity_linking_ray.stages.normalize import FeatureExtractor


@pytest.fixture(scope="module")
def tiny_corpus():
    from biomedical_entity_linking_ray.synth import generate_corpus

    return generate_corpus(SynthConfig().scaled(0.03))


CFG = LinkageConfig(salt_cap=100_000, all_pairs_max=100_000,
                    join_partitions=4, scorer_concurrency=2)


def oracle_pipeline(files_table, cfg):
    """Single-process reference: returns (feats_df, block_rows, scored, assign)."""
    feats = FeatureExtractor(cfg)(files_table).to_pandas()
    # contraction: rep = min file_id per content_sha
    rep_of_sha = feats.groupby("content_sha")["file_id"].min()
    feats["rep_id"] = feats["content_sha"].map(rep_of_sha)
    reps = feats[feats["file_id"] == feats["rep_id"]].reset_index(drop=True)

    # blocking keys over reps (same key format as stages/blocking.py)
    n = len(reps)
    sigs = np.frombuffer(b"".join(reps["sig"]), dtype=np.uint16
                         ).reshape(n, cfg.num_perm)
    bh = hashing.band_hashes_batch(sigs, cfg.lsh_bands)
    rows = []
    for i in range(n):
        for b in range(cfg.lsh_bands):
            rows.append((f"m{b}:{reps['lang'][i]}:{bh[i, b]:016x}",
                         reps["file_id"][i]))
        if reps["stem"][i]:
            rows.append((f"p:{reps['lang'][i]}:{reps['stem'][i]}",
                         reps["file_id"][i]))
    block_rows = pd.DataFrame(rows, columns=["block_key", "file_id"]) \
        .drop_duplicates()

    # all within-block pairs, deduplicated across blocks
    fx = reps.set_index("file_id")
    pairs = {}
    for _, g in block_rows.groupby("block_key"):
        ids = sorted(g["file_id"])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                pairs.setdefault((ids[i], ids[j]), None)
    pa_, pb_ = zip(*sorted(pairs)) if pairs else ((), ())
    sig_of = {f: np.frombuffer(s, dtype=np.uint16) for f, s in
              zip(reps["file_id"], reps["sig"])}
    vec_of = {f: np.frombuffer(v, dtype=np.float16).astype(np.float32)
              for f, v in zip(reps["file_id"], reps["tfvec"])}
    jac = np.array([(sig_of[a] == sig_of[b]).mean() for a, b in zip(pa_, pb_)])
    cos = np.array([np.float64(np.dot(vec_of[a], vec_of[b]))
                    for a, b in zip(pa_, pb_)])
    np.clip(cos, -1.0, 1.0, out=cos)
    jw = np.array([strings.jaro_winkler(fx.loc[a, "path_norm"], fx.loc[b, "path_norm"])
                   for a, b in zip(pa_, pb_)])
    score = cfg.w_jw * jw + cfg.w_jac * jac + cfg.w_cos * cos
    scored = pd.DataFrame({"id_a": pa_, "id_b": pb_, "score_jw": jw,
                           "score_jaccard": jac, "score_cosine": cos,
                           "score": score})

    # transitive clustering over passing pairs; min-id canonical
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in scored[scored["score"] >= cfg.tau][["id_a", "id_b"]].itertuples(index=False):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    rep_label = {f: find(f) for f in reps["file_id"]}
    assign = feats[["file_id", "rep_id", "content_sha"]].copy()
    assign["cluster_id"] = assign["rep_id"].map(rep_label)
    return feats, block_rows, scored, assign[["file_id", "cluster_id", "content_sha"]]


def test_engine_matches_single_process_oracle(tiny_corpus):
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage

    files = rd.from_arrow(tiny_corpus.files)
    res = run_linkage(files, CFG, feature_concurrency=2)

    o_feats, o_blocks, o_scored, o_assign = oracle_pipeline(tiny_corpus.files, CFG)

    # 1. block-key rows identical as a set
    e_blocks = res.block_rows.to_pandas().drop_duplicates()
    assert (set(map(tuple, e_blocks[["block_key", "file_id"]].itertuples(index=False)))
            == set(map(tuple, o_blocks.itertuples(index=False))))

    # 2. scored pairs identical -- keys AND float values
    e_scored = res.scored_pairs.to_pandas()[
        ["id_a", "id_b", "score_jw", "score_jaccard", "score_cosine", "score"]
    ].sort_values(["id_a", "id_b"]).reset_index(drop=True)
    o_scored = o_scored.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(e_scored) == len(o_scored)
    pd.testing.assert_frame_equal(e_scored, o_scored, check_exact=False, atol=1e-12)

    # 3. assignments identical (cluster ids are canonical min member ids)
    e_assign = res.assignments.to_pandas()[["file_id", "cluster_id", "content_sha"]] \
        .sort_values("file_id").reset_index(drop=True)
    o_assign = o_assign.sort_values("file_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(e_assign, o_assign)
