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


# ---------------------------------------------------------------------------
# Disk-exchange aggregation (the shuffle-spill-free path for the job's
# largest all-to-all)
# ---------------------------------------------------------------------------

def parquet_exchange_write(
    ds: "ray.data.Dataset",
    keys: list[str],
    spill_dir: str,
    n_buckets: int | None = None,
    coalesce_blocks: int | None = None,
) -> int:
    """Complete hash-partition of `ds` by `keys` into `n_buckets` Parquet
    directories (``spill_dir/__bucket=i/``) -- the map side of an EXTERNAL
    shuffle whose exchange medium is compressed Parquet on disk instead of
    the object store's raw-Arrow spill files.

    Why: a sort-based ``groupby`` shuffle spills ~2-3x the (uncompressed)
    stream volume through the object store; measured on the flagship's
    scored-pair dedup that exceeds this sandbox's disk above ~700 k input
    rows (BASELINE.md round-3 disk-headroom finding). Pair rows are
    id-string/float columns that compress ~5x in Parquet, and the exchange
    write is the ONLY copy -- the reduce side reads each bucket directory
    directly, so the all-to-all never enters the object store.

    Partitioning contract: every row of one key group lands in exactly one
    bucket directory (hash of the key columns), so per-bucket aggregation is
    complete -- the same distributive-agg argument as `bucketed_aggregate`.
    Sizing contract: one bucket (~N/n_buckets rows) must fit a reduce task's
    heap; n_buckets defaults to the cluster-derived `default_buckets()` so
    per-bucket volume stays flat as the cluster grows with the data. Shuffle
    files number ``write_tasks x n_buckets`` (the classic map-side layout);
    `coalesce_blocks` (default 2x CPUs) compacts the writer fan-in first so
    small corpora don't scatter thousands of tiny files.

    The caller owns `spill_dir` freshness (Parquet writes APPEND; pass a
    fresh or wiped directory).
    """
    from biomedical_entity_linking_ray.config import default_buckets

    n_buckets = n_buckets or default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        df = t.select(keys).to_pandas()
        return t.append_column("__bucket", pa.array(_bucket_of(df, n_buckets)))

    if coalesce_blocks is None:
        import ray as _ray

        cpus = int(_ray.cluster_resources().get("CPU", 4)) if _ray.is_initialized() else 4
        coalesce_blocks = cpus * 2
    try:
        nb = ds.num_blocks()
    except NotImplementedError:
        nb = None  # lazy input: block count unknowable without executing
    if nb is not None and nb > coalesce_blocks * 2:
        # materialized input with many small blocks: one split/coalesce pass
        # (no sort) caps writer fan-in so shuffle-file count stays
        # ~coalesce_blocks x buckets. A LAZY input streams straight into the
        # partitioned write instead: repartitioning it would buffer the whole
        # stream in the object store while the Parquet write also accumulates
        # -- measured double-carry blew this sandbox's disk at 1.4 M rows /
        # 2x10^8 pairs. The cost of streaming is file fan-out
        # (upstream_blocks x n_buckets shuffle files, the classic MapReduce
        # map-side layout); a DFS deployment absorbs that, and reduce tasks
        # read whole bucket DIRECTORIES, so file count never affects
        # correctness.
        ds = ds.repartition(coalesce_blocks)
    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        spill_dir, partition_cols=["__bucket"])
    return n_buckets


def parquet_exchange_aggregate(
    spill_dir: str,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    pre_filter: tuple[str, str] | None = None,
    drop: list[str] | None = None,
) -> "ray.data.Dataset":
    """Reduce side of `parquet_exchange_write`: one task per bucket directory
    reads ONLY its partition and runs a vectorized pandas groupby -- no
    object-store exchange at all (the Parquet write WAS the shuffle). Several
    reduces may consume one exchange (e.g. pair-dedup and star-dedup both key
    on (id_a, id_b)); `pre_filter=(col, value)` selects the relevant rows at
    the Parquet scan. Returns an empty-but-typed Dataset when the exchange
    produced no rows.
    """
    import glob as _glob
    import os as _os

    import pyarrow.dataset as pads
    import pyarrow.parquet as _pq

    bucket_dirs = sorted(_glob.glob(_os.path.join(spill_dir, "__bucket=*")))

    def agg_dir(batch: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for d in batch["dir"]:
            dset = pads.dataset(d, format="parquet")
            flt = None
            if pre_filter is not None:
                flt = pads.field(pre_filter[0]) == pre_filter[1]
            cols = None  # all columns minus partition col (not in files)
            t = dset.to_table(filter=flt, columns=cols)
            if t.num_rows:
                frames.append(t.to_pandas())
        if not frames:
            return pd.DataFrame()  # dropped by Ray (zero-row batch)
        g = pd.concat(frames, ignore_index=True)
        if drop:
            g = g.drop(columns=[c for c in drop if c in g.columns])
        named = {}
        for out, (col, fn) in aggs.items():
            named[out] = (col, "size" if fn == "count" else fn)
        return g.groupby(keys, as_index=False).agg(**named)

    if not bucket_dirs:
        cols = {k: pd.Series(dtype=object) for k in keys}
        for out in aggs:
            cols[out] = pd.Series(dtype=object)
        return ray.data.from_pandas(pd.DataFrame(cols))
    return ray.data.from_items(
        [{"dir": d} for d in bucket_dirs]
    ).map_batches(agg_dir, batch_format="pandas", batch_size=1, num_cpus=1)
