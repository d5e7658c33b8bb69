"""Bucketed grouped aggregation -- the fast path around per-group overhead.

`Dataset.groupby(keys).aggregate(...)` and `.map_groups(...)` pay a per-group
cost (measured ~2.5 ms/group on this Ray build): 10^4+ distinct keys turn a
sub-second aggregation into tens of seconds, and at 10^9 keys it would never
finish. The standard fix is coarse bucketing: hash the key columns into a
bounded number of buckets, shuffle once on the bucket id (same data movement
as the fine-grained groupby), and run a vectorized pandas groupby inside each
bucket. Group count seen by Ray == n_buckets, independent of key cardinality.

Aggregations must be distributive (min/max/sum/count/first) -- each key lives
in exactly one bucket, so no cross-bucket merge is needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from biomedical_entity_linking_ray.functions import hashing

# 'set' collects the sorted distinct values per key into a list column --
# the reference's most common KB aggregation shape (UMLS alias sets,
# ontology.py:357-369, A2/S8 in SURVEY.md). Valid under bucketing because a
# key lives in exactly one bucket (no cross-bucket set merge needed).
_AGGS = {"min", "max", "sum", "count", "first", "nunique", "mean", "set"}


def _bucket_of(df_keys: pd.DataFrame, n_buckets: int) -> np.ndarray:
    """Deterministic uint bucket from the concatenated key columns.

    String keys hash with the vectorized fixed-width FNV (prefix-truncated at
    96 bytes -- collisions only merge buckets, the in-bucket groupby still
    splits on the true key, so correctness and determinism are unaffected)."""
    acc = np.zeros(len(df_keys), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in df_keys.columns:
            col = df_keys[c]
            if pd.api.types.is_integer_dtype(col):
                h = hashing.splitmix64(col.to_numpy().astype(np.uint64))
            else:
                h = hashing.fnv1a_fixed(col.to_numpy(), width=96)
            acc = hashing.splitmix64(acc ^ h)
    return (acc % np.uint64(n_buckets)).astype(np.int64)


def bucketed_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """GROUP BY `keys` with named aggregations `{out_col: (in_col, fn)}`.

    fn in {min, max, sum, count, first, nunique, mean}; 'count' counts rows
    (in_col ignored). One shuffle; n_buckets groups regardless of cardinality
    (default: cluster-derived via config.default_buckets, so per-bucket
    memory stays flat as the cluster grows with the data).
    """
    from biomedical_entity_linking_ray.config import default_buckets

    n_buckets = n_buckets or default_buckets()
    for out, (col, fn) in aggs.items():
        assert fn in _AGGS, fn

    def add_bucket(t: pa.Table) -> pa.Table:
        df = t.select(keys).to_pandas()
        return t.append_column("__bucket", pa.array(_bucket_of(df, n_buckets)))

    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        named = {}
        for out, (col, fn) in aggs.items():
            if fn == "count":
                named[out] = (keys[0] if col is None else col, "size")
            elif fn == "set":
                named[out] = (col, lambda s: sorted(set(s)))
            else:
                named[out] = (col, fn)
        out_df = g.groupby(keys, as_index=False).agg(**named)
        return out_df

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(agg_bucket, batch_format="pandas")
    )


def bucketed_distinct(
    ds: "ray.data.Dataset", keys: list[str], n_buckets: int | None = None
) -> "ray.data.Dataset":
    """SELECT DISTINCT keys -- same bucketing, drop_duplicates per bucket."""
    from biomedical_entity_linking_ray.config import default_buckets

    n_buckets = n_buckets or default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        df = t.select(keys).to_pandas()
        return t.select(keys).append_column("__bucket", pa.array(_bucket_of(df, n_buckets)))

    def uniq(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(keys)[keys]

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(uniq, batch_format="pandas")
    )
