"""Training-data selection operators: leakage-safe cluster split + DSIR.

Oracle parity runs in the driver sweep (test_operators-style checks here
cover the sf0.001 tier); the properties below pin the semantics the SQL
cannot see -- leakage safety across near-dup components, split-fraction
sanity, and the bigram boundary mask edge cases.
"""

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
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(4)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", ["cluster_split", "dsir_weights",
                                  "dsir_select", "dsir_resample",
                                  "domain_mix"])
def test_selection_matches_oracle(name, con, ray_session):
    import __ray_entry__ as ent

    rdf = _canon(ent.queries()[name](SF_DIR).to_pandas())
    odf = _canon(con.sql(ent.oracle_sql()[name]).df())
    assert list(rdf.columns) == list(odf.columns)
    assert len(rdf) == len(odf)
    pd.testing.assert_frame_equal(rdf, odf, check_dtype=False, atol=1e-6)


def test_cluster_split_is_leakage_safe(ray_session):
    """Every near-dup component lands entirely in ONE split: split is
    constant within each canonical_id group, and every doc appears exactly
    once."""
    from biomedical_entity_linking_ray.pipelines.selection import cluster_split

    df = cluster_split(SF_DIR).to_pandas()
    assert df["doc_id"].is_unique
    per_cluster = df.groupby("canonical_id")["split"].nunique()
    assert (per_cluster == 1).all()
    # thresholds at 0.8/0.9 of 2^64: all three splits materialize and the
    # train share is in a sane band even on a 500-doc corpus
    frac = (df["split"] == "train").mean()
    assert 0.6 < frac < 0.95
    assert set(df["split"].unique()) <= {"train", "val", "test"}


def test_cluster_split_deterministic_and_seed_sensitive(ray_session):
    from biomedical_entity_linking_ray.pipelines.selection import cluster_split

    a = cluster_split(SF_DIR).to_pandas().sort_values("doc_id")
    b = cluster_split(SF_DIR).to_pandas().sort_values("doc_id")
    assert (a["split"].to_numpy() == b["split"].to_numpy()).all()
    c = cluster_split(SF_DIR, seed=7).to_pandas().sort_values("doc_id")
    assert (a["split"].to_numpy() != c["split"].to_numpy()).any()


def test_doc_features_bigram_boundary_mask():
    """Bigram features never cross document boundaries, including around
    zero-token documents at either end of the batch."""
    from biomedical_entity_linking_ray.pipelines.selection import (
        _doc_features)

    B = 4096
    # ("" -> 0 tokens) | ("a b" -> 2 toks, 1 bigram) | 0 | ("x" -> 1, 0) | 0
    buckets, rows = _doc_features(["", "a b", "!!", "x", "?"], B)
    n_uni = 3          # a, b, x
    n_bi = 1           # (a, b) only
    assert buckets.size == n_uni + n_bi
    # rows: unigrams a,b -> doc 1, x -> doc 3; bigram -> doc 1
    assert rows.tolist() == [1, 1, 3, 1]

    # cross-check against a trivially correct per-doc reference
    texts = ["alpha beta gamma", "beta gamma", "", "alpha"]
    got_b, got_r = _doc_features(texts, B)
    for i, s in enumerate(texts):
        toks = s.split()
        mine = sorted(got_b[got_r == i].tolist())
        solo_b, solo_r = _doc_features([s], B)
        assert sorted(solo_b.tolist()) == mine
        assert solo_b.size == len(toks) + max(len(toks) - 1, 0)


def test_dsir_resample_deterministic_and_seeded(ray_session):
    """The Gumbel sample is a pure function of (doc_id, seed): identical
    across runs, different under a different seed, and not simply the
    greedy top-k (the noise must actually perturb the ranking)."""
    from biomedical_entity_linking_ray.pipelines.selection import (
        dsir_resample, dsir_select)

    a = dsir_resample(SF_DIR, k=50).to_pandas()
    b = dsir_resample(SF_DIR, k=50).to_pandas()
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    c = dsir_resample(SF_DIR, k=50, seed=1234).to_pandas()
    assert a["doc_id"].tolist() != c["doc_id"].tolist()
    greedy = dsir_select(SF_DIR, k=50).to_pandas()
    assert set(a["doc_id"]) != set(greedy["doc_id"])


def test_domain_mix_follows_weights(ray_session):
    """Sampled per-source counts track w_s * T within binomial noise;
    weight-0 sources vanish; the sample is deterministic."""
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.pipelines.selection import domain_mix

    srcs = sorted(pq.read_table(f"{SF_DIR}/documents.parquet",
                                columns=["source"])["source"].to_pylist())
    n_by = pd.Series(srcs).value_counts()
    w = {s: (2 if i % 2 == 0 else 1) for i, s in enumerate(sorted(n_by.index))}
    w[sorted(n_by.index)[0]] = 0  # excluded domain
    df = domain_mix(SF_DIR, weights=w).to_pandas()
    assert sorted(n_by.index)[0] not in set(df["source"])
    t_units = min(int(n_by[s]) // w[s] for s in n_by.index if w[s] > 0)
    got = df["source"].value_counts()
    for s in n_by.index:
        if w[s] == 0:
            continue
        target = w[s] * t_units
        # binomial tolerance: 4 sigma + 1
        tol = 4 * np.sqrt(target) + 1
        assert abs(int(got.get(s, 0)) - target) <= tol, (s, got.get(s), target)
    again = domain_mix(SF_DIR, weights=w).to_pandas()
    assert sorted(df["doc_id"]) == sorted(again["doc_id"])


def test_dsir_prefers_target_language(ray_session):
    """Sanity on the semantics: docs of the target language score higher on
    average than the rest (their n-grams are over-represented in the target
    model by construction)."""
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.pipelines.selection import (
        dsir_log_weights)

    w = dsir_log_weights(SF_DIR).to_pandas()
    langs = pq.read_table(f"{SF_DIR}/documents.parquet",
                          columns=["doc_id", "lang"]).to_pandas()
    m = w.merge(langs, on="doc_id")
    scored = m[m["n_features"] > 0]
    mean_en = scored.loc[scored["lang"] == "en", "log_weight"].mean()
    mean_rest = scored.loc[scored["lang"] != "en", "log_weight"].mean()
    assert mean_en > mean_rest
