"""Hash-join wrapper with deadlock-safe aggregator sizing.

`Dataset.join` spawns `num_partitions` HashShuffleAggregator actors; with
default 1-CPU actors, two chained joins plus a scoring actor pool can reserve
more CPUs than the node has and the streaming executor deadlocks (observed at
num_cpus=8). Fractional-CPU aggregators keep the shuffle actors cheap -- they
are I/O-bound accumulators, not compute -- so map stages retain the cores.
"""

from __future__ import annotations

import pyarrow as pa  # noqa: F401  (schema typing in heal_projection)

import ray.data

# Aggregators are I/O-bound accumulators: near-zero CPU reservation so that
# several concurrent joins (feature attach is two back-to-back) plus a scoring
# actor pool can't starve the map stages even on an 8-CPU node.
AGG_REMOTE_ARGS = {"num_cpus": 0.01, "memory": 256 * 1024 * 1024}


def heal_projection(schema: "pa.Schema", build):
    """Wrap a post-join projection so schema-less empty blocks are healed.

    Ray 2.49's hash join emits zero-column blocks for empty shuffle
    partitions; feeding one into a later join/map fails ('No match for key
    field'). Each projection after a join declares its output schema and this
    wrapper substitutes a correctly-typed empty table for poisoned blocks.
    """

    def fn(t: "pa.Table") -> "pa.Table":
        if t.num_columns == 0:
            return schema.empty_table()
        return build(t)

    return fn


# Per-worker-process cache of deserialized broadcast objects: ray.get of a
# large ref re-deserializes on every call, so map functions that read a
# broadcast lookup per batch go through here -- built once per worker, like
# actor state but for stateless tasks.
_BCAST_CACHE: dict[str, object] = {}


def cached_broadcast(ref, transform=None):
    """ray.get(ref) (+ optional one-time transform) memoized per worker."""
    key = ref.hex()
    v = _BCAST_CACHE.get(key)
    if v is None:
        import ray as _ray

        v = _ray.get(ref)
        if transform is not None:
            v = transform(v)
        if len(_BCAST_CACHE) > 8:  # bound worker memory across job generations
            _BCAST_CACHE.clear()
        _BCAST_CACHE[key] = v
    return v


def broadcast_attach_column(
    ds: "ray.data.Dataset",
    df,
    key_col: str,
    val_col: str,
    out_col: str | None = None,
) -> "ray.data.Dataset":
    """Attach `df[val_col]` onto `ds` rows by exact `key_col` match — the
    broadcast analog of an inner join on a COVERING map: ray.put the two
    columns once as numpy arrays, build ONE pandas Index hashtable per
    worker (cached_broadcast), then O(batch) vectorized `get_indexer` probes
    per batch instead of a per-row Python dict loop. Fails loudly if a batch
    key is absent from the map (the dict loop's KeyError, vectorized)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray as _ray

    out_col = out_col or val_col
    ref = _ray.put((df[key_col].to_numpy(), df[val_col].to_numpy()))

    def attach(t: pa.Table) -> pa.Table:
        idx, vals = cached_broadcast(
            ref, transform=lambda kv: (pd.Index(kv[0]), kv[1]))
        pos = idx.get_indexer(t[key_col].to_numpy(zero_copy_only=False))
        if len(pos) and not (pos >= 0).all():
            missing = t[key_col].to_pylist()[int(np.argmin(pos))]
            raise KeyError(f"{key_col}={missing!r} absent from broadcast map")
        return t.append_column(out_col, pa.array(vals[pos]))

    return ds.map_batches(attach, batch_format="pyarrow")


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    join_type: str,
    num_partitions: int,
    on: tuple,
    right_on: tuple | None = None,
    left_suffix: str | None = None,
    right_suffix: str | None = None,
) -> "ray.data.Dataset":
    # Compact both inputs first: Ray 2.49's join aggregator crashes on inputs
    # containing empty blocks produced by upstream map/filter stages ("No match
    # for key field reference" at finalize). repartition(shuffle=False) merges
    # them away with a streaming split, no hash exchange.
    left = left.repartition(num_partitions)
    right = right.repartition(num_partitions)
    return left.join(
        right,
        join_type,
        num_partitions,
        on=on,
        right_on=right_on,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
        aggregator_ray_remote_args=AGG_REMOTE_ARGS,
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi join: the scale path when the filter side is too big to
# broadcast exactly (reference anti/semi joins load one side in memory, e.g.
# data_process.py's excluded-id sets -- fine at 1 M keys, impossible at 10^10).
# A w-bit Bloom filter summarizes the filter keys at ~10 bits/key regardless
# of key width; the probe side is pruned map-side (no shuffle of pruned rows),
# and an exact semi join over the SURVIVORS removes the false positives, so
# the result is EXACT while the expensive all-to-all only ever sees rows that
# are almost certainly matches.
# ---------------------------------------------------------------------------


def _key_hash_pair(col, seed: int = 0x243F6A8885A308D3):
    """Two independent 64-bit hash streams (h1, h2|1) for double hashing,
    from either integer or string key columns (vectorized)."""
    import numpy as np
    import pandas as pd

    from biomedical_entity_linking_ray.functions import hashing

    s = col.to_pandas() if not isinstance(col, pd.Series) else col
    if pd.api.types.is_integer_dtype(s):
        k = s.to_numpy().astype(np.uint64)
    else:
        k = hashing.fnv1a_fixed(s.to_numpy(), width=96)
    with np.errstate(over="ignore"):
        h1 = hashing.splitmix64(k)
        h2 = hashing.splitmix64(k ^ np.uint64(seed)) | np.uint64(1)
    return h1, h2


def build_bloom(
    ds: "ray.data.Dataset", key: str, n_bits: int = 1 << 23, n_hashes: int = 4
):
    """Distributed Bloom build: per-block partial bitmaps, OR-merged as they
    stream to the driver -- the driver holds exactly ONE n_bits/8-byte bitmap
    at a time (a 2^30-bit filter for ~10^8 keys is 128 MB; the per-block
    transfer is the same bitmap, so swap in a tree reduce if block count x
    bitmap size ever dominates). Returns an object-store ref to the bitmap."""
    import numpy as np

    import ray as _ray

    nb = int(n_bits)
    assert nb % 8 == 0

    def partial(t: "pa.Table") -> "pa.Table":
        h1, h2 = _key_hash_pair(t[key])
        bm = np.zeros(nb // 8, dtype=np.uint8)
        with np.errstate(over="ignore"):
            for i in range(n_hashes):
                idx = (h1 + np.uint64(i) * h2) % np.uint64(nb)
                # .at: unbuffered, so duplicate byte indices all land
                np.bitwise_or.at(
                    bm, (idx >> np.uint64(3)).astype(np.int64),
                    np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    acc = np.zeros(nb // 8, dtype=np.uint8)
    parts = ds.select_columns([key]).map_batches(
        partial, batch_format="pyarrow", batch_size=262144)
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=4):
        for v in b["bm"]:
            acc |= np.frombuffer(v.as_py(), dtype=np.uint8)
    return _ray.put(acc)


def _bloom_hit_mask(t: "pa.Table", key: str, bm, nb: int, n_hashes: int):
    """Vectorized membership test: True where ALL n_hashes bits are set."""
    import numpy as np

    h1, h2 = _key_hash_pair(t[key])
    mask = np.ones(len(h1), dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(n_hashes):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(nb)
            bits = bm[(idx >> np.uint64(3)).astype(np.int64)]
            mask &= (bits >> (idx & np.uint64(7)).astype(np.uint8)) & 1 == 1
    return mask


def bloom_semi_join(
    probe: "ray.data.Dataset",
    flt: "ray.data.Dataset",
    probe_key: str,
    filter_key: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
    num_partitions: int = 32,
    exact: bool = True,
) -> "ray.data.Dataset":
    """probe SEMI JOIN flt: Bloom-prune the probe map-side, then (exact=True)
    verify survivors with a real hash semi join against the distinct filter
    keys. Result is exactly the semi join; the all-to-all only moves
    survivors (false-positive rate ~ (1-e^(-kn/w))^k). exact=False returns
    the superset for callers that tolerate FPs (e.g. candidate generation)."""
    import numpy as np

    from biomedical_entity_linking_ray.functions import groups

    nb = int(n_bits)
    bm_ref = build_bloom(flt, filter_key, nb, n_hashes)

    def prune(t: "pa.Table") -> "pa.Table":
        if t.num_rows == 0:
            return t
        return t.filter(pa.array(
            _bloom_hit_mask(t, probe_key, cached_broadcast(bm_ref), nb, n_hashes)))

    survivors = probe.map_batches(prune, batch_format="pyarrow")
    if not exact:
        return survivors
    keys = groups.bucketed_distinct(flt.select_columns([filter_key]), [filter_key])
    if filter_key != probe_key:
        keys = keys.map_batches(
            lambda t: t.rename_columns([probe_key]), batch_format="pyarrow")

    schema = probe.schema().base_schema
    probe_cols = list(schema.names)
    joined = hash_join(survivors, keys, "inner", num_partitions, on=(probe_key,))
    return joined.map_batches(
        heal_projection(schema, lambda t: t.select(probe_cols)),
        batch_format="pyarrow")


def bloom_anti_join(
    probe: "ray.data.Dataset",
    flt: "ray.data.Dataset",
    probe_key: str,
    filter_key: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """probe ANTI JOIN flt (probe rows whose key is NOT in flt), EXACT.

    The incremental-dedup scale shape: a Bloom filter has no false
    negatives, so a probe row that MISSES the filter is provably novel and
    is emitted map-side without touching any shuffle; only Bloom HITS (true
    members plus the ~(1-e^(-kn/w))^k false-positive sliver) go through the
    exact left-anti hash join against the distinct filter keys. A typical
    incremental batch is mostly novel, so the all-to-all sees a small
    fraction of the input. Cost note: the two branches re-execute the lazy
    probe scan twice (Ray Data has no multi-output operator); with pruned
    parquet reads that 2x scan is far cheaper than shuffling the misses.
    """
    import numpy as np  # noqa: F401  (mask kernel)

    from biomedical_entity_linking_ray.functions import groups

    nb = int(n_bits)
    bm_ref = build_bloom(flt, filter_key, nb, n_hashes)

    def misses(t: "pa.Table") -> "pa.Table":
        if t.num_rows == 0:
            return t
        m = _bloom_hit_mask(t, probe_key, cached_broadcast(bm_ref), nb, n_hashes)
        return t.filter(pa.array(~m))

    def hits(t: "pa.Table") -> "pa.Table":
        if t.num_rows == 0:
            return t
        m = _bloom_hit_mask(t, probe_key, cached_broadcast(bm_ref), nb, n_hashes)
        return t.filter(pa.array(m))

    novel_direct = probe.map_batches(misses, batch_format="pyarrow")
    candidates = probe.map_batches(hits, batch_format="pyarrow")

    keys = groups.bucketed_distinct(flt.select_columns([filter_key]), [filter_key])
    if filter_key != probe_key:
        keys = keys.map_batches(
            lambda t: t.rename_columns([probe_key]), batch_format="pyarrow")

    schema = probe.schema().base_schema
    probe_cols = list(schema.names)
    anti = hash_join(candidates, keys, "left_anti", num_partitions, on=(probe_key,))
    anti = anti.map_batches(
        heal_projection(schema, lambda t: t.select(probe_cols)),
        batch_format="pyarrow")
    return novel_direct.union(anti)
