"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself, then:
- ``entry()``       -- flagship linkage pipeline smoke on sf0.001-scale data;
- ``queries()``     -- one callable per implemented operator (SURVEY.md 2);
- ``oracle_sql()``  -- DuckDB-equivalent SQL per query where expressible
                       (tables region nation customer supplier part orders
                       lineitem events documents embeddings are views).

No ray.init / ray.shutdown anywhere in this module or the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


_LINKAGE_CACHE: dict[str, Any] = {}


def _linkage_result(sf_dir: str):
    import ray.data as rd

    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage
    from biomedical_entity_linking_ray.synth import materialize_corpus, synth_config_for_sf_dir
    import os

    if sf_dir not in _LINKAGE_CACHE:
        d = materialize_corpus(synth_config_for_sf_dir(sf_dir))
        files = rd.read_parquet(os.path.join(d, "files.parquet"))
        _LINKAGE_CACHE[sf_dir] = run_linkage(files, LinkageConfig())
    return _LINKAGE_CACHE[sf_dir]


def entry() -> Any:
    """Flagship: record-linkage over the synthetic files corpus at sf0.001
    scale; returns the cluster-assignment Dataset (>=0 rows, stable schema)."""
    res = _linkage_result("/root/testdata/sf0.001")
    return res.assignments


def queries() -> dict[str, Callable[[str], Any]]:
    from biomedical_entity_linking_ray.pipelines import (
        dedup,
        multimodal,
        relational,
        similarity,
        text_analysis,
    )

    def linkage_assignments(sf_dir: str):
        return _linkage_result(sf_dir).assignments

    def linkage_cluster_sizes(sf_dir: str):
        from biomedical_entity_linking_ray.pipelines.linkage import cluster_summary

        return cluster_summary(_linkage_result(sf_dir))

    return {
        # --- relational operator battery (SQL-checked) ---
        "pricing_summary": relational.pricing_summary,
        "top_orders": relational.top_orders,
        "revenue_by_nation": relational.revenue_by_nation,
        "customers_without_orders": relational.customers_without_orders,
        "parts_with_lineitems": relational.parts_with_lineitems,
        "event_type_counts": relational.event_type_counts,
        "union_order_extremes": relational.union_order_extremes,
        "lineitem_sequence": relational.lineitem_sequence,
        "events_hourly": relational.events_hourly,
        "high_value_lineitems": relational.high_value_lineitems,
        # --- text analysis over documents ---
        "token_counts": text_analysis.token_counts,
        "quality_scores": text_analysis.quality_scores,
        "language_id": text_analysis.language_id,
        "doc_fingerprints": text_analysis.fingerprints,
        # --- dedup family ---
        "exact_dedup": dedup.exact_dedup,
        "minhash_near_dup": dedup.minhash_near_dup_pairs,
        "simhash_near_dup": dedup.simhash_near_dup_pairs,
        "ngram_jaccard": dedup.ngram_jaccard_pairs,
        "embedding_near_dup": dedup.embedding_near_dup_pairs,
        # --- similarity search over embeddings ---
        "knn_bruteforce": similarity.knn_bruteforce,
        "knn_lsh": similarity.knn_lsh,
        # --- multimodal plumbing (binary payload -> actor-pool decode) ---
        "image_features": multimodal.image_feature_pipeline,
        # --- flagship linkage (no SQL oracle: synthetic files table) ---
        "linkage_assignments": linkage_assignments,
        "linkage_cluster_sizes": linkage_cluster_sizes,
    }


def oracle_sql() -> dict[str, str]:
    from biomedical_entity_linking_ray.pipelines.relational import SQL

    out = dict(SQL)
    out["token_counts"] = """
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS n_tokens,
               length(text) AS n_chars_norm
        FROM documents
    """
    out["exact_dedup"] = """
        SELECT doc_id, MIN(doc_id) OVER (PARTITION BY text) AS canonical_id
        FROM documents
    """
    out["knn_bruteforce"] = """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS qe
            FROM embeddings ORDER BY vec_id ASC LIMIT 16
        ),
        s AS (
            SELECT q.query_id, e.vec_id,
                   ROUND(list_cosine_similarity(q.qe, e.embedding), 4) AS cosine
            FROM q CROSS JOIN embeddings e
        ),
        r AS (
            SELECT query_id, vec_id, cosine,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine DESC, vec_id ASC) AS rank
            FROM s
        )
        SELECT query_id, rank, vec_id, cosine FROM r WHERE rank <= 5
    """
    # language_id / quality_scores / fingerprints / near-dup sketch families /
    # linkage_* are non-SQL-expressible (model-ish scoring, sketching,
    # iterative clustering, synthetic side table) -> rows-only checks.
    return out
