"""Semantic-curation operators (pipelines/semantic.py): distributed spherical
k-means, SemDeDup cluster-scoped pruning, and the corpus-trained bigram-LM
quality score -- each checked value-exact against its closed-form DuckDB
oracle (the unrolled-Lloyd CTE chain), plus the bounded-broadcast else-branch
paths the driver config never exercises."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["documents", "embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_kmeans_embeddings_matches_unrolled_sql(con):
    from biomedical_entity_linking_ray.pipelines.semantic import (
        kmeans_embeddings, kmeans_sql)

    rdf = _canon(kmeans_embeddings(SF_DIR).to_pandas())
    odf = _canon(con.sql(kmeans_sql()).df())
    assert len(rdf) == 500 and rdf["cluster_id"].nunique() > 1
    pd.testing.assert_frame_equal(rdf, odf, check_dtype=False, atol=1e-9)


def test_kmeans_iterations_change_assignments(con):
    """Lloyd actually iterates: 0-iteration (seed-only) assignment differs
    from the 3-iteration one on this corpus."""
    from biomedical_entity_linking_ray.pipelines.semantic import kmeans_embeddings

    a0 = kmeans_embeddings(SF_DIR, iters=0).to_pandas().set_index("vec_id")
    a3 = kmeans_embeddings(SF_DIR, iters=3).to_pandas().set_index("vec_id")
    assert (a0["cluster_id"] != a3["cluster_id"].reindex(a0.index)).any()


def test_semdedup_matches_sql_and_prune_rule(con):
    from biomedical_entity_linking_ray.pipelines.semantic import (
        kmeans_embeddings, semdedup, semdedup_sql)

    kept = semdedup(SF_DIR, tau=0.3).to_pandas()
    odf = _canon(con.sql(semdedup_sql(tau=0.3)).df())
    pd.testing.assert_frame_equal(_canon(kept), odf, check_dtype=False)
    assign = kmeans_embeddings(SF_DIR).to_pandas()
    assert 0 < len(kept) < len(assign)  # prune fired, non-vacuous
    # survivors are a subset of assignments with unchanged cluster ids
    m = assign.set_index("vec_id")["cluster_id"]
    assert (kept.set_index("vec_id")["cluster_id"] == m.reindex(
        kept["vec_id"]).to_numpy()).all()
    # the lowest vec_id of every cluster always survives (keep-lowest-id rule)
    first = assign.groupby("cluster_id")["vec_id"].min()
    assert set(first).issubset(set(kept["vec_id"]))


def test_semdedup_anti_join_fallback_matches_broadcast(con):
    """anti_broadcast_max=0 forces the partitioned left-anti join (the
    10^12-row path); result must be identical."""
    from biomedical_entity_linking_ray.pipelines.semantic import semdedup

    a = _canon(semdedup(SF_DIR, tau=0.3).to_pandas())
    b = _canon(semdedup(SF_DIR, tau=0.3, anti_broadcast_max=0).to_pandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_semdedup_no_pairs_above_tau_keeps_everything(con):
    from biomedical_entity_linking_ray.pipelines.semantic import semdedup

    kept = semdedup(SF_DIR, tau=0.9999).to_pandas()
    assert len(kept) == 500


def test_lm_quality_matches_sql(con):
    from biomedical_entity_linking_ray.pipelines.semantic import (
        LM_QUALITY_SQL, lm_quality)

    rdf = _canon(lm_quality(SF_DIR).to_pandas())
    odf = _canon(con.sql(LM_QUALITY_SQL).df())
    pd.testing.assert_frame_equal(rdf, odf, check_dtype=False, atol=1e-9)
    # scores are log-probs: strictly negative, finite
    assert np.isfinite(rdf["lm_score"]).all() and (rdf["lm_score"] < 0).all()


def test_lm_quality_join_path_matches_broadcast(con):
    """broadcast_max=0 forces the explode + two-hash-join else-branch."""
    from biomedical_entity_linking_ray.pipelines.semantic import lm_quality

    a = _canon(lm_quality(SF_DIR).to_pandas())
    b = _canon(lm_quality(SF_DIR, broadcast_max=0).to_pandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
