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
