"""End-to-end linkage pipeline assertions (FIXTURES.md 6 contract).

1. per-row content_sha invariant preserved end-to-end;
2. blocking recall: every gold positive co-blocked (logical keys, post-salt);
3. pairwise F1 >= 0.99 vs gold pairs at shared blocking key;
4. cluster assignments match golden canonical mapping;
5. determinism: a second run produces identical assignments.
"""

import pandas as pd
import pytest

import ray.data as rd

from biomedical_entity_linking_ray.functions.ids import content_sha_of
from biomedical_entity_linking_ray.stages.evaluation import blocking_recall, pairwise_f1


def test_corpus_shape(small_corpus):
    assert small_corpus.files.column_names == ["repo", "path", "commit", "lang", "content"]
    assert small_corpus.files.num_rows > 100
    gp = small_corpus.gold_pairs.to_pandas()
    assert set(gp["label"]) == {0, 1}


def test_sha_invariant(small_corpus, linkage_result):
    cfg, res = linkage_result
    raw = small_corpus.files.to_pandas()
    raw["file_id_sha"] = [content_sha_of(c) for c in raw["content"]]
    out = res.assignments.to_pandas()
    assert len(out) == len(raw)
    merged = out.merge(
        raw[["repo", "path", "commit", "file_id_sha"]], on=["repo", "path", "commit"]
    )
    assert (merged["content_sha"] == merged["file_id_sha"]).all()


def test_blocking_recall(small_corpus, linkage_result):
    cfg, res = linkage_result
    gp = small_corpus.gold_pairs.to_pandas()
    assert blocking_recall(gp, res.block_rows, res.members) >= 0.99


def test_pairwise_f1(small_corpus, linkage_result):
    cfg, res = linkage_result
    gp = small_corpus.gold_pairs.to_pandas()
    m = pairwise_f1(gp, res.assignments, res.block_rows, res.members)
    assert m["f1"] >= 0.99, m
    assert m["precision"] >= 0.99, m


def test_gold_cluster_agreement(small_corpus, linkage_result):
    """Every gold cluster must land in one predicted cluster (purity both ways
    on planted members)."""
    cfg, res = linkage_result
    gold = small_corpus.gold_clusters.to_pandas()
    pred = res.assignments.to_pandas()[["file_id", "cluster_id"]]
    j = gold.merge(pred, on="file_id", suffixes=("_gold", "_pred"))
    # gold cluster -> exactly one predicted cluster
    frag = j.groupby("cluster_id_gold")["cluster_id_pred"].nunique()
    assert (frag == 1).all(), frag[frag > 1]


def test_determinism_rerun(small_corpus, linkage_result):
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage

    cfg, res = linkage_result
    files = rd.from_arrow(small_corpus.files)
    res2 = run_linkage(files, cfg, feature_concurrency=2)
    a = res.assignments.to_pandas().sort_values("file_id").reset_index(drop=True)
    b = res2.assignments.to_pandas().sort_values("file_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["file_id", "cluster_id", "canonical_id", "content_sha"]],
        b[["file_id", "cluster_id", "canonical_id", "content_sha"]],
    )


def test_canonical_is_min_member(linkage_result):
    cfg, res = linkage_result
    df = res.assignments.to_pandas()
    mins = df.groupby("cluster_id")["file_id"].min()
    assert (df["canonical_id"].map(lambda c: c in mins.values)).all()
    assert (mins.index == mins.values).all()  # cluster_id IS the min file_id


def test_scale_paths_match_broadcast_paths(small_corpus, linkage_result):
    """Force every beyond-bound branch -- partitioned hash joins for the
    contract/memberset/enrich sides, join-based label attach, distributed
    label propagation instead of driver union-find -- and require byte-equal
    assignments. This is the 10^12-scale code path, which broadcasts would
    otherwise always shadow at test scale."""
    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage

    cfg_scale = LinkageConfig(
        salt_cap=32, join_partitions=4, scorer_concurrency=2,
        broadcast_side_max=0, broadcast_labels_max=0, driver_cc_max_edges=0,
    )
    files = rd.from_arrow(small_corpus.files)
    res_scale = run_linkage(files, cfg_scale, feature_concurrency=2)
    a = res_scale.assignments.to_pandas().sort_values("file_id").reset_index(drop=True)

    _, res_bcast = linkage_result  # default config: broadcast paths
    b = res_bcast.assignments.to_pandas().sort_values("file_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["file_id", "cluster_id", "canonical_id", "content_sha"]],
        b[["file_id", "cluster_id", "canonical_id", "content_sha"]],
    )


def test_standalone_scorer_matches_fused(small_corpus, linkage_result):
    """The un-fused building blocks (generate_pairs -> attach_pair_features
    -> PairScorer actor pool -- the crossencoder-analog path for model-heavy
    scorers, T10) must produce the same pair set with the same float scores
    as the fused in-block path the flagship uses."""
    from biomedical_entity_linking_ray.stages import blocking, scoring

    cfg, res = linkage_result
    pairs = blocking.generate_pairs(res.block_rows, cfg)
    scored2 = scoring.score_pairs(
        blocking.attach_pair_features(pairs, res.reps, cfg), cfg, concurrency=2)
    cols = ["id_a", "id_b", "score_jw", "score_jaccard", "score_cosine", "score"]
    a = res.scored_pairs.to_pandas()[cols].sort_values(["id_a", "id_b"]).reset_index(drop=True)
    b = scored2.to_pandas()[cols].sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, atol=1e-12)


def test_salting_preserves_connectivity(small_corpus):
    """Tiny salt cap forces many sub-blocks; hot family must stay one cluster."""
    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage

    files = rd.from_arrow(small_corpus.files)
    cfg = LinkageConfig(salt_cap=8, all_pairs_max=8, pair_window=4,
                        join_partitions=4, scorer_concurrency=2)
    res = run_linkage(files, cfg, feature_concurrency=2)
    gold = small_corpus.gold_clusters.to_pandas()
    hot_cid = gold.groupby("cluster_id").size().idxmax()
    hot_ids = set(gold[gold["cluster_id"] == hot_cid]["file_id"])
    pred = res.assignments.to_pandas()
    got = pred[pred["file_id"].isin(hot_ids)]["cluster_id"].nunique()
    assert got == 1, f"hot family fragmented into {got} clusters"


def test_hot_block_windowed_enumeration_recall():
    """A vendored-file mega-family whose post-contraction rep block EXCEEDS
    all_pairs_max under the DEFAULT config: pair enumeration falls back to
    sorted-neighborhood windows (candidate_pairs.py / fused_scoring enum) and
    transitive closure must still recover ONE cluster with F1 >= 0.99
    (SURVEY 7.4 hot-blocks hard part; ref analog special_partition.pyx)."""
    from biomedical_entity_linking_ray.config import LinkageConfig, SynthConfig
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage
    from biomedical_entity_linking_ray.synth import generate_corpus

    corpus = generate_corpus(SynthConfig().scaled(0.5))  # hot family ~250 rows
    cfg = LinkageConfig()  # DEFAULT all_pairs_max=64 / pair_window=8
    res = run_linkage(rd.from_arrow(corpus.files), cfg)

    # the windowed path must actually engage: some block wider than the bound
    bk = res.block_rows.to_pandas()["block_key"].value_counts()
    assert int(bk.max()) > cfg.all_pairs_max, int(bk.max())

    m = pairwise_f1(corpus.gold_pairs.to_pandas(), res.assignments,
                    res.block_rows, res.members)
    assert m["f1"] >= 0.99 and m["precision"] >= 0.99, m

    # the hot family resolves to exactly one cluster
    gc = corpus.gold_clusters.to_pandas()
    hot_cid = gc.groupby("cluster_id").size().idxmax()
    hot_fids = set(gc[gc.cluster_id == hot_cid].file_id)
    assert len(hot_fids) > cfg.all_pairs_max
    asn = res.assignments.to_pandas()
    labels = set(asn[asn.file_id.isin(hot_fids)].cluster_id)
    assert len(labels) == 1, f"hot family split into {len(labels)} clusters"


def test_assignments_only_mode_matches_default(small_corpus, linkage_result):
    """emit_scored_pairs=False (assignments-only mode) skips the pair-dedup
    all-to-all entirely; cluster assignments must be IDENTICAL to the default
    run and the scored-pair product comes back typed-empty."""
    from dataclasses import replace

    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage

    cfg, res_default = linkage_result
    cfg2 = replace(cfg, emit_scored_pairs=False)
    res2 = run_linkage(rd.from_arrow(small_corpus.files), cfg2,
                       feature_concurrency=2)

    a = res_default.assignments.to_pandas()[["file_id", "cluster_id"]] \
        .sort_values("file_id").reset_index(drop=True)
    b = res2.assignments.to_pandas()[["file_id", "cluster_id"]] \
        .sort_values("file_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    assert res2.scored_pairs.count() == 0
    assert "score" in res2.scored_pairs.schema().names  # typed empty
    assert res2.edges.count() == 0
