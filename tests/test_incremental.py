"""Incremental linkage (pipelines/incremental.py).

Equality contract: incremental(base, delta) == run_linkage(base ∪ delta)
whenever blocking enumerates identical candidate pairs in both runs (no
touched block crosses all_pairs_max / salt_cap) — exercised exactly on the
planted corpus. On the adversarial synthetic corpus (hot vendored block >
salt_cap, where the batch run itself windows pair enumeration) the contract
weakens to documented monotonicity + gold quality, checked separately.
"""
from __future__ import annotations

import pandas as pd
import pytest

import ray.data as rd

from biomedical_entity_linking_ray.config import LinkageConfig, SynthConfig
from biomedical_entity_linking_ray.pipelines.incremental import (
    LinkagePrior, prior_from_checkpoint, prior_from_result,
    run_linkage_incremental)
from biomedical_entity_linking_ray.pipelines.linkage import run_linkage

SF_DIR = "/root/testdata/sf0.001"


def _frame(ds) -> pd.DataFrame:
    return (ds.to_pandas()
            .sort_values("file_id").reset_index(drop=True)
            [["file_id", "cluster_id", "canonical_id", "content_sha",
              "repo", "path", "commit", "lang"]])


@pytest.fixture(scope="module")
def planted_split():
    """Planted corpus split: base = {v0,v1}×c0 (every group keeps a seed
    file); delta = v2 variants (new content that must merge through the v1
    chain) + all c1 copies (exact-dup arrivals that attach via sticky reps)."""
    from biomedical_entity_linking_ray.synth import planted_files_from_docs

    files = planted_files_from_docs(SF_DIR).materialize()
    base = files.filter(expr="commit == 'v0c0' or commit == 'v1c0'").materialize()
    delta = files.filter(expr="commit != 'v0c0' and commit != 'v1c0'").materialize()
    return files, base, delta


@pytest.fixture(scope="module")
def planted_full(planted_split):
    files, _, _ = planted_split
    return _frame(run_linkage(files, LinkageConfig()).assignments)


@pytest.fixture(scope="module")
def planted_prior(planted_split):
    _, base, _ = planted_split
    return run_linkage(base, LinkageConfig())


def test_incremental_equals_full_planted(planted_split, planted_full, planted_prior):
    """Value-exact: assignments identical to the batch run over base ∪ delta
    (same contract the driver checks against the closed-form SQL oracle)."""
    _, _, delta = planted_split
    inc = run_linkage_incremental(
        delta, prior_from_result(planted_prior), LinkageConfig())
    assert _frame(inc.assignments).equals(planted_full)
    # the delta view is exactly the delta rows of the full table
    ddf = _frame(inc.delta_assignments)
    want = planted_full[planted_full["commit"].isin(ddf["commit"].unique())]
    assert len(ddf) == inc.stats["n_delta_files"]
    assert set(ddf["file_id"]) <= set(planted_full["file_id"])


def test_incremental_exact_dup_only_delta(planted_split, planted_prior):
    """A delta of purely known content (c1 copies of base files): zero new
    shas, zero touched blocks, NO scoring — rows attach via sticky reps and
    labels still move to the new min when a copy's file_id sorts lower."""
    files, base, _ = planted_split
    dup_delta = files.filter(
        expr="commit == 'v0c1' or commit == 'v1c1'").materialize()
    inc = run_linkage_incremental(
        dup_delta, prior_from_result(planted_prior), LinkageConfig())
    assert inc.stats["n_new_shas"] == 0
    assert inc.stats["n_touched_block_keys"] == 0
    full = _frame(run_linkage(
        base.union(dup_delta), LinkageConfig()).assignments)
    assert _frame(inc.assignments).equals(full)


def test_incremental_equals_full_beyond_broadcast_bound(
        planted_split, planted_full, planted_prior):
    """Same equality with every broadcast bound forced to zero: the Bloom
    semi/anti joins, the hash-join rep attach and the hash-join label attach
    (the 100-TB fallbacks of every map-side filter) must produce the same
    values as the broadcast fast paths."""
    _, _, delta = planted_split
    cfg = LinkageConfig(broadcast_side_max=0, broadcast_labels_max=0)
    inc = run_linkage_incremental(delta, prior_from_result(planted_prior), cfg)
    assert _frame(inc.assignments).equals(planted_full)


def test_incremental_novel_delta_no_touched_clusters(planted_split, planted_prior):
    """A delta of brand-new content (disjoint from every base block) with
    intra-delta exact and near duplicates: zero prior clusters touched, the
    relabel short-circuits to the new-edge CC, and the result equals the
    batch run over base ∪ delta."""
    import pyarrow as pa

    _, base, _ = planted_split
    rows = []
    for i in range(12):
        j = i - (i % 4 == 3)  # every 4th row is an exact copy of its neighbor
        body = " ".join(f"zq{j}tok{t}" for t in range(60))
        rows.append(("novel", f"n/{j}.txt", f"c{i}", "python", body))
    delta = rd.from_arrow(pa.table({
        "repo": pa.array([r[0] for r in rows]),
        "path": pa.array([r[1] for r in rows]),
        "commit": pa.array([r[2] for r in rows]),
        "lang": pa.array([r[3] for r in rows]),
        "content": pa.array([r[4] for r in rows]),
    })).materialize()
    inc = run_linkage_incremental(
        delta, prior_from_result(planted_prior), LinkageConfig())
    assert inc.stats["n_touched_clusters"] == 0
    assert inc.stats["n_touched_base_files"] == 0
    full = _frame(run_linkage(base.union(delta), LinkageConfig()).assignments)
    assert _frame(inc.assignments).equals(full)


def test_incremental_empty_delta(planted_split, planted_prior):
    import pyarrow as pa

    empty = rd.from_arrow(pa.schema(
        [("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
         ("lang", pa.string()), ("content", pa.string())]).empty_table())
    inc = run_linkage_incremental(
        empty, prior_from_result(planted_prior), LinkageConfig())
    assert inc.stats["n_delta_files"] == 0
    assert _frame(inc.assignments).equals(_frame(planted_prior.assignments))
    assert inc.delta_assignments.count() == 0


def test_incremental_from_checkpoint(tmp_path, planted_split, planted_full):
    """Cross-session path: prior state read back from a checkpointed base
    run's Parquet stages gives the same result as the in-memory prior."""
    _, base, delta = planted_split
    cfg = LinkageConfig()
    root = str(tmp_path / "base_ckpt")
    run_linkage(base, cfg, checkpoint_root=root)
    inc = run_linkage_incremental(delta, prior_from_checkpoint(root, cfg), cfg)
    assert _frame(inc.assignments).equals(planted_full)


def test_incremental_synth_monotone_and_gold():
    """Adversarial synthetic corpus (hot block > salt_cap): strict equality
    is out of contract, so check the documented guarantees — (a) prior
    matches are never lost, (b) gold pairwise F1 matches the batch bar."""
    from biomedical_entity_linking_ray.functions.hashing import fnv1a_fixed
    from biomedical_entity_linking_ray.stages.evaluation import pairwise_f1
    from biomedical_entity_linking_ray.synth import generate_corpus

    import numpy as np

    corpus = generate_corpus(SynthConfig().scaled(0.08))
    files = rd.from_arrow(corpus.files).materialize()
    cfg = LinkageConfig(salt_cap=32, join_partitions=4, scorer_concurrency=2)

    # deterministic ~25% delta by identity hash
    def split(t, keep_delta):
        key = [f"{r}|{p}|{c}" for r, p, c in zip(
            t["repo"].to_pylist(), t["path"].to_pylist(),
            t["commit"].to_pylist())]
        h = fnv1a_fixed(np.asarray(key, dtype=object), width=64)
        m = (h % np.uint64(4)) == np.uint64(0)
        import pyarrow as pa
        return t.filter(pa.array(m if keep_delta else ~m))

    base = files.map_batches(
        lambda t: split(t, False), batch_format="pyarrow").materialize()
    delta = files.map_batches(
        lambda t: split(t, True), batch_format="pyarrow").materialize()
    assert base.count() + delta.count() == files.count()
    assert delta.count() > 0

    prior = run_linkage(base, cfg, feature_concurrency=2)
    inc = run_linkage_incremental(
        delta, prior_from_result(prior), cfg, feature_concurrency=2)

    # (a) monotone: every prior co-cluster pair still co-clusters
    pdf = prior.assignments.to_pandas()[["file_id", "cluster_id"]]
    new = inc.assignments.to_pandas()[["file_id", "cluster_id"]]
    new_of = dict(zip(new["file_id"], new["cluster_id"]))
    merged = pdf.assign(new_cluster=pdf["file_id"].map(new_of))
    assert merged["new_cluster"].notna().all()
    split_groups = merged.groupby("cluster_id")["new_cluster"].nunique()
    assert (split_groups == 1).all(), "a prior cluster was split by the increment"

    # (b) quality straight off the gold pair labels: planted positives
    # co-cluster, planted hard negatives stay apart (no conditioning on
    # blocking — the incremental result must stand on its own)
    gp = corpus.gold_pairs.to_pandas()
    la = gp["id_a"].map(new_of)
    lb = gp["id_b"].map(new_of)
    same = (la == lb).to_numpy()
    pos = (gp["label"] == 1).to_numpy()
    recall = same[pos].mean()
    neg_ok = (~same[~pos]).mean()
    assert recall >= 0.99, recall
    assert neg_ok >= 0.99, neg_ok


def test_incremental_chained_waves(tmp_path, planted_split, planted_full,
                                   planted_prior):
    """Day-over-day chaining: wave 2 links against wave 1's updated prior —
    in memory (prior_from_incremental) and across sessions (checkpoint_prior
    -> prior_from_checkpoint) — and the final table equals the batch run over
    all three waves. delta2's v2c1 files share content with delta1's v2c0,
    so the second wave must resolve reps that only exist in the UPDATED prior,
    not in the base run."""
    from biomedical_entity_linking_ray.pipelines.incremental import (
        checkpoint_prior, prior_from_incremental)

    files, base, _ = planted_split
    cfg = LinkageConfig()
    d1 = files.filter(expr="commit == 'v2c0' or commit == 'v0c1'").materialize()
    d2 = files.filter(expr="commit == 'v1c1' or commit == 'v2c1'").materialize()
    assert base.count() + d1.count() + d2.count() == files.count()

    inc1 = run_linkage_incremental(d1, prior_from_result(planted_prior), cfg)
    p1 = str(tmp_path / "prior_wave1")
    checkpoint_prior(inc1, p1, cfg)

    # updated reps: one per distinct content sha of base ∪ delta1
    reps_df = inc1.updated_reps.to_pandas()
    want_shas = set(planted_full.loc[
        planted_full["commit"].isin(["v0c0", "v1c0", "v2c0", "v0c1"]),
        "content_sha"])
    assert set(reps_df["content_sha"]) == want_shas
    assert not reps_df["content_sha"].duplicated().any()
    assert (reps_df["rep_id"] == reps_df["file_id"]).all()

    inc2_mem = run_linkage_incremental(d2, prior_from_incremental(inc1), cfg)
    inc2_ckpt = run_linkage_incremental(d2, prior_from_checkpoint(p1, cfg), cfg)
    pd.testing.assert_frame_equal(_frame(inc2_mem.assignments), planted_full)
    pd.testing.assert_frame_equal(_frame(inc2_ckpt.assignments), planted_full)

    # the prior a wave was derived from stays immutable
    with pytest.raises(ValueError, match="fresh root"):
        checkpoint_prior(inc1, p1, cfg)
