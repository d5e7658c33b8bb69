"""Shared within-block candidate-pair enumeration (the LSH-bucket hot path).

Used by the linkage blocking stage and every near-dup pipeline. The naive
`groupby(bucket).map_groups(per_bucket_fn)` pays ~2.5 ms per distinct bucket
on this Ray build -- fatal with 10^4..10^9 LSH buckets. This helper:

1. drops single-member buckets with a pre-aggregated count + left-semi join
   (no driver-side key set -- scales to any bucket cardinality);
2. hashes surviving buckets into `n_coarse` coarse groups (one shuffle whose
   group count is bounded and independent of bucket cardinality);
3. enumerates pairs inside each coarse group with one vectorized pass
   (sort + run-length boundaries + numpy index math): all pairs for buckets
   up to `all_pairs_max` members, sorted-neighborhood `window` links beyond
   (stays connected; transitive closure recovers the rest).

`emit(g, ia, ib)` builds the output frame from the bucket-sorted DataFrame and
pair index arrays, so callers attach payloads (simhash, unit vectors, ...)
without a second join.

Payload delivery (`payload=` / `payload_on=`): callers whose per-row payload
is large relative to the (key, id) row -- a 256 B minhash signature exploded
over 16 bands would otherwise cross the bucket shuffle 16x -- pass the payload
as its own one-row-per-id Dataset. The exploded rows then stay SKINNY through
the singleton filter and the coarse shuffle; payload columns are attached at
the last moment, inside the per-coarse-group pass: from a worker-cached
`ray.put` broadcast while the payload table fits `payload_broadcast_max`
(zero payload bytes through any shuffle), else via ONE hash join onto the
singleton-surviving rows (payload crosses the wire once per surviving row --
the 10^12-doc path; most LSH bands are singletons and never see it). Same
feats_ref / enrich-once pattern as stages/fused_scoring.py.
"""

from __future__ import annotations

import warnings
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from biomedical_entity_linking_ray.functions import hashing
from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate
from biomedical_entity_linking_ray.functions.joins import hash_join


def default_emit(key_col: str, id_col: str) -> Callable:
    def emit(g: pd.DataFrame, ia: np.ndarray, ib: np.ndarray) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        return pd.DataFrame({
            "id_a": ids[ia], "id_b": ids[ib], key_col: g[key_col].to_numpy()[ia],
        })

    return emit


def within_key_pairs(
    rows: "ray.data.Dataset",
    key_col: str,
    id_col: str,
    emit: Callable | None = None,
    n_coarse: int | None = None,
    all_pairs_max: int = 64,
    window: int = 8,
    join_partitions: int = 8,
    broadcast_keys_max: int = 2_000_000,
    payload: "ray.data.Dataset | None" = None,
    payload_on: str | None = None,
    payload_broadcast_max: int = 500_000,
    payload_columns: "list[str] | None" = None,
    strict_all_pairs: bool = False,
) -> "ray.data.Dataset":
    """See module docstring. `payload_columns` declares the payload column
    names up front so that an EMPTY payload table (whose schema Ray reports
    as None) still reaches `emit` as all-null columns instead of vanishing --
    an empty payload does not guarantee zero surviving pair groups for every
    caller. `strict_all_pairs=True` raises instead of silently degrading to
    sorted-neighborhood window pairs when a block exceeds `all_pairs_max`
    (callers whose result is contractually exhaustive must pass it)."""
    from biomedical_entity_linking_ray.config import default_buckets

    n_coarse = n_coarse or default_buckets()
    emit = emit or default_emit(key_col, id_col)
    payload_ref = None
    payload_cols: list[str] = []
    if payload is not None:
        payload_on = payload_on or id_col
        payload = payload.materialize()
        # an EMPTY materialized payload reports schema() None; with declared
        # payload_columns we still attach them (as all-null via the reindex
        # in pairs_of_coarse) so emit sees a consistent frame; without a
        # declaration, degrade to payload-less enumeration
        _sc = payload.schema()
        payload_cols = [c for c in _sc.names if c != payload_on] \
            if _sc is not None else list(payload_columns or [])
        if not payload_cols:
            payload = None
        elif _sc is None:
            import ray as _ray

            payload_ref = _ray.put(pd.DataFrame(
                {payload_on: pd.Series(dtype=object),
                 **{c: pd.Series(dtype=object) for c in payload_cols}}))
            payload = None  # broadcast/join sizing below not needed

    counts = bucketed_aggregate(
        rows.select_columns([key_col]).map_batches(
            lambda t: t.append_column("one", pa.array(np.ones(t.num_rows, dtype=np.int64))),
            batch_format="pyarrow",
        ),
        [key_col], {"cnt": ("one", "sum")},
        n_buckets=n_coarse,
    )
    multi = counts.filter(expr="cnt >= 2").select_columns([key_col]).materialize()
    n_multi = multi.count()
    if n_multi == 0:
        # no key has two members: every row drops, types preserved
        rows = rows.map_batches(lambda t: t.slice(0, 0), batch_format="pyarrow")
    elif n_multi <= broadcast_keys_max:
        # broadcast the multi-member key set: vectorized is_in per batch, no
        # semi-join aggregator fleet (hash join beyond the bound)
        import pyarrow.compute as pc
        import ray as _ray

        from biomedical_entity_linking_ray.functions.joins import cached_broadcast

        keys_ref = _ray.put(pa.array(multi.to_pandas()[key_col]))

        def semi(t: pa.Table) -> pa.Table:
            ks = cached_broadcast(keys_ref)
            return t.filter(pc.is_in(t[key_col], value_set=ks))

        rows = rows.map_batches(semi, batch_format="pyarrow")
    else:
        rows = hash_join(rows, multi, "left_semi", join_partitions, on=(key_col,))

    if payload is not None:
        if payload.count() <= payload_broadcast_max:
            import ray as _ray

            payload_ref = _ray.put(payload.to_pandas())
        else:
            # 10^12-doc path: ONE join ships each surviving row's payload once
            from biomedical_entity_linking_ray.functions.joins import heal_projection

            joined_schema = pa.schema(
                [(key_col, rows.schema().field(key_col).type),
                 (id_col, rows.schema().field(id_col).type)]
                + [(c, payload.schema().field(c).type) for c in payload_cols])
            rows = hash_join(
                rows, payload, "inner", join_partitions,
                on=(id_col,), right_on=(payload_on,),
            ).map_batches(
                heal_projection(joined_schema,
                                lambda t: t.select(joined_schema.names)),
                batch_format="pyarrow",
            )

    def add_coarse(t: pa.Table) -> pa.Table:
        col = t[key_col]
        if pa.types.is_integer(col.type):
            h = hashing.splitmix64(
                col.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            h = hashing.fnv1a_fixed(col.to_numpy(zero_copy_only=False), width=96)
        b = (h % np.uint64(n_coarse)).astype(np.int64)
        return t.append_column("__coarse", pa.array(b))

    coarse = rows.map_batches(add_coarse, batch_format="pyarrow")

    def pairs_of_coarse(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates([key_col, id_col]).sort_values([key_col, id_col])
        g = g.reset_index(drop=True)
        if payload_ref is not None and len(g):
            from biomedical_entity_linking_ray.functions.joins import cached_broadcast

            idx = cached_broadcast(
                payload_ref, lambda df: df.set_index(payload_on, drop=False))
            sel = idx.reindex(g[id_col].to_numpy())
            for c in payload_cols:
                g[c] = sel[c].to_numpy()
        n = len(g)
        if n == 0:
            return emit(g, np.array([], np.int64), np.array([], np.int64))
        keys = g[key_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        lens = np.diff(np.r_[starts, n])
        ia_all, ib_all = [], []
        for s, ln in zip(starts, lens):
            if ln < 2:
                continue
            if ln <= all_pairs_max:
                iu = np.triu_indices(ln, k=1)
                ia_all.append(iu[0] + s)
                ib_all.append(iu[1] + s)
            else:
                if strict_all_pairs:
                    raise ValueError(
                        f"within_key_pairs: block {keys[s]!r} has {ln} "
                        f"members > all_pairs_max={all_pairs_max}; exact "
                        "enumeration requested (strict_all_pairs). Use a "
                        "finer blocking key or raise all_pairs_max.")
                warnings.warn(
                    f"within_key_pairs: block {keys[s]!r} has {ln} members "
                    f"> all_pairs_max={all_pairs_max}; degrading to "
                    f"sorted-neighborhood window={window} pairs (result is "
                    "no longer exhaustive within this block)",
                    RuntimeWarning, stacklevel=2)
                ia_all.append(np.concatenate(
                    [np.arange(s, s + ln - w) for w in range(1, window + 1)]))
                ib_all.append(np.concatenate(
                    [np.arange(s + w, s + ln) for w in range(1, window + 1)]))
        if not ia_all:
            return emit(g, np.array([], np.int64), np.array([], np.int64))
        return emit(g, np.concatenate(ia_all), np.concatenate(ib_all))

    return coarse.groupby("__coarse").map_groups(pairs_of_coarse, batch_format="pandas")
