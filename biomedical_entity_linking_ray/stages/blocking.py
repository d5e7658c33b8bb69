"""Stage 1 -- blocking: key emission, hot-key salting, candidate-pair generation.

The reference's candidate generation (char-ngram TF-IDF ANN,
scispacy_embeddings.py:110-204; FAISS k-NN, BiEncoderLightningModule.py:488-557)
is re-expressed without any ANN index: a row is exploded into its blocking keys
(`map_batches`), keys are hash-shuffled (`groupby`) and pairs are enumerated
within each block (`map_groups`). At 10^12 rows an index would not fit or
build; LSH banding gives the same candidate semantics as a shuffle.

Runs AFTER exact contraction, over unique-content representatives only.
Everything shuffled here is skinny -- (block_key, file_id) rows and
(id_a, id_b, block_key) pairs; the KB-sized sketch features are joined onto
the deduplicated pair list afterwards (`attach_pair_features`), so feature
bytes move exactly once per surviving pair side, never through the
key-explosion or dedup shuffles.

Skew control (SURVEY.md 7.4 "Hot blocks"): per-key counts are pre-aggregated
inside `map_batches` (combiner) and only tiny partials are shuffled; keys over
`salt_cap` are broadcast (`ray.put`, read once per task) to a salting pass
splitting them into `ceil(n/cap)` sub-blocks by id-hash with a deterministic
~1/bridge_rate ring overlap into the next sub-block, keeping the block's
windowed-link graph connected for transitive clustering.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Min, Sum

from biomedical_entity_linking_ray.config import LinkageConfig, effective_partitions
from biomedical_entity_linking_ray.functions import hashing
from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate
from biomedical_entity_linking_ray.functions.joins import hash_join
from biomedical_entity_linking_ray.functions.vectors import binary_column_to_matrix


# Blocker registry (SURVEY 2.11 extension surface, next to the encoder and
# scorer slots): a blocker is a callable
#     fn(batch: pa.Table[FEATURE_SCHEMA], cfg: LinkageConfig) -> pa.Table
# returning (block_key: string, file_id: string) rows -- vectorized inside,
# applied per feature batch alongside the built-in minhash/path keys.
# Resolution happens DRIVER-side in emit_block_keys (names -> functions are
# captured into the map closure), so runtime registrations reach every
# worker regardless of import order. Reference analog: the ontology/model
# load_function string dispatch (scispacy/evaluate.py:52-62, model.py:31-206).
BLOCKER_REGISTRY: dict[str, object] = {}


def register_blocker(name: str, fn) -> None:
    """fn(batch: pa.Table, cfg) -> pa.Table(block_key, file_id)."""
    BLOCKER_REGISTRY[name] = fn


def resolve_blocker(blocker):
    """Name -> callable via the registry; a callable passes through."""
    if isinstance(blocker, str):
        try:
            return BLOCKER_REGISTRY[blocker]
        except KeyError:
            raise ValueError(
                f"unknown blocker {blocker!r}; registered: "
                f"{sorted(BLOCKER_REGISTRY)}") from None
    return blocker


def emit_block_keys(reps: "ray.data.Dataset", cfg: LinkageConfig) -> "ray.data.Dataset":
    """Explode each representative row into (block_key, file_id) rows.

    Keys (lang-prefixed so cross-lang decoys never share a block):
    - ``m<band>:<lang>:<hash>``   MinHash LSH band keys over content shingles
    - ``p:<lang>:<stem>``         filename-stem key (catches renamed near-dups)
    - any `cfg.extra_blockers` registry entries (SURVEY 2.11 slot)

    (No sha key: exact duplicates are already contracted away.)
    """
    bands = cfg.lsh_bands
    extra = [resolve_blocker(b) for b in getattr(cfg, "extra_blockers", ())]
    # per-band prefix strings ("m0".."m15") built once; tiled per batch
    band_names = np.array([f"m{b}" for b in range(bands)], dtype=object)
    _EMPTY = pa.table({"block_key": pa.array([], pa.string()),
                       "file_id": pa.array([], pa.string())})

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        if n == 0:
            return _EMPTY
        parts: list[pa.Table] = []
        if cfg.use_minhash_keys:
            sigs = binary_column_to_matrix(batch["sig"], np.uint16, cfg.num_perm)
            bh = hashing.band_hashes_batch(sigs, bands)          # (n, bands)
            # row-major explode, fully vectorized: nibble-table hex, Arrow
            # take for the repeated lang/file_id columns, one Arrow join
            hex_pa = pa.array(hashing.hex16_batch(bh.ravel()), pa.string())
            pref_pa = pa.array(np.tile(band_names, n), pa.string())
            rep_idx = np.repeat(np.arange(n, dtype=np.int64), bands)
            keys = pc.binary_join_element_wise(
                pref_pa, pc.take(batch["lang"], rep_idx), hex_pa, ":")
            parts.append(pa.table({
                "block_key": keys,
                "file_id": pc.take(batch["file_id"], rep_idx),
            }))
        if cfg.use_path_key:
            stem = batch["stem"]
            mask = pc.and_kleene(stem.is_valid(), pc.not_equal(stem, ""))
            sel = batch.filter(pc.fill_null(mask, False))
            if sel.num_rows:
                pkeys = pc.binary_join_element_wise(
                    pa.array(np.full(sel.num_rows, "p", dtype=object), pa.string()),
                    sel["lang"], sel["stem"], ":")
                parts.append(pa.table({
                    "block_key": pkeys, "file_id": sel["file_id"]}))
        for fn in extra:
            t = fn(batch, cfg)
            if t.num_rows:
                parts.append(t.select(["block_key", "file_id"]))

        return pa.concat_tables(parts) if parts else _EMPTY

    return reps.map_batches(explode, batch_format="pyarrow", batch_size=cfg.batch_size)


def keyed_counts(ds: "ray.data.Dataset", key: str, batch_size: int = 65536) -> "ray.data.Dataset":
    """Pre-aggregated distinct-key counts: combiner inside map_batches, then a
    small groupby-sum over partials (guide: 'Aggregation at scale')."""

    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch[key].combine_chunks())  # vectorized Arrow kernel
        return pa.table({key: vc.field("values"), "cnt": vc.field("counts")})

    partials = ds.select_columns([key]).map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
    return bucketed_aggregate(partials, [key], {"cnt": ("cnt", "sum")})


def strip_salt(key: str) -> str:
    """Logical blocking key of a physically-salted key (drop '#<salt>')."""
    i = key.rfind("#")
    return key[:i] if i >= 0 else key


def salt_hot_keys(block_rows: "ray.data.Dataset", cfg: LinkageConfig) -> "ray.data.Dataset":
    """Split any block key with > salt_cap rows into salted `key#<salt>`
    sub-blocks (deterministic id-hash) with ring-overlap bridge rows.

    (Singleton keys are NOT pruned here: an experiment that dropped them via
    the same per-key counts added a counts materialization + a keep-set scan
    and saved nothing downstream -- the streaming executor already overlaps
    the memberset-dedup shuffle, whose cnt >= 2 filter is where singletons
    die, with the scoring stage.)"""
    counts = keyed_counts(block_rows, "block_key")
    hot_tbl = counts.filter(expr=f"cnt > {cfg.salt_cap}").to_pandas()
    if len(hot_tbl) == 0:
        return block_rows
    hot = {k: int(math.ceil(c / cfg.salt_cap)) for k, c in zip(hot_tbl["block_key"], hot_tbl["cnt"])}
    hot_ref = ray.put((hot, pa.array(list(hot), pa.string())))
    bridge_rate = cfg.bridge_rate

    def apply_salt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        hot_map, hot_keys = ray.get(hot_ref)  # zero-copy shared read per task
        # cold rows (the overwhelming majority) never leave Arrow: one
        # vectorized membership test, zero-copy pass-through when clean
        mask = pc.is_in(batch["block_key"], value_set=hot_keys)
        if not pc.any(mask).as_py():
            return batch
        cold = batch.filter(pc.invert(mask))
        hotb = batch.filter(mask)
        hk = hotb["block_key"].to_numpy(zero_copy_only=False)
        hf = hotb["file_id"].to_numpy(zero_copy_only=False)
        ns = pd.Series(hk).map(hot_map).to_numpy(dtype=np.uint64)
        h = hashing.fnv1a_fixed(hf, width=64)
        s = h % ns
        salted = np.char.add(np.char.add(hk.astype("U"), "#"), s.astype("U"))
        out_keys = [salted]
        out_fids = [hf]
        bridge = (h >> np.uint64(32)) % np.uint64(bridge_rate) == 0  # ring overlap
        if bridge.any():
            s2 = (s[bridge] + np.uint64(1)) % ns[bridge]
            out_keys.append(np.char.add(np.char.add(hk[bridge].astype("U"), "#"),
                                        s2.astype("U")))
            out_fids.append(hf[bridge])
        salted_tbl = pa.table({
            "block_key": pa.array(np.concatenate(out_keys).astype("U"), pa.string()),
            "file_id": pa.array(np.concatenate(out_fids).astype("U"), pa.string()),
        })
        return pa.concat_tables([cold, salted_tbl])

    return block_rows.map_batches(apply_salt, batch_format="pyarrow", batch_size=cfg.batch_size)


def generate_pairs(block_rows: "ray.data.Dataset", cfg: LinkageConfig) -> "ray.data.Dataset":
    """Salted block rows -> deduplicated candidate pairs (id_a, id_b, block_key).

    Within a block sorted by file_id: all O(n^2)/2 pairs when n <= all_pairs_max,
    otherwise each row links to its next `pair_window` neighbors (sorted
    neighborhood -- connected, bounded fan-out; transitive clustering recovers
    the full cluster). Singleton keys are dropped by a pre-aggregated count +
    semi join and enumeration is vectorized over coarse buckets
    (functions/candidate_pairs.py). Cross-key duplicates collapse via a
    bucketed groupby-min on (id_a, id_b) (reference analog: edge dedup,
    special_partition.pyx:363-389).
    """
    from biomedical_entity_linking_ray.functions.candidate_pairs import within_key_pairs

    P = effective_partitions(cfg)
    pairs = within_key_pairs(
        block_rows, "block_key", "file_id",
        n_coarse=max(P * 4, 16),
        all_pairs_max=cfg.all_pairs_max,
        window=cfg.pair_window,
        join_partitions=P,
    )
    return bucketed_aggregate(pairs, ["id_a", "id_b"], {"block_key": ("block_key", "min")})


_EMPTY_PAIRS = pd.DataFrame({
    "id_a": pd.Series(dtype=str), "id_b": pd.Series(dtype=str),
    "block_key": pd.Series(dtype=str),
})

# feature columns each pair side needs for scoring
_FEATS = ["file_id", "path_norm", "sig", "tfvec"]


def attach_pair_features(
    pairs: "ray.data.Dataset", reps: "ray.data.Dataset", cfg: LinkageConfig
) -> "ray.data.Dataset":
    """Hash-join the per-side sketch features onto deduplicated pairs.

    Two partitioned joins (on id_a, then id_b) against the representative
    feature table -- the at-scale replacement for carrying KB-sized payloads
    through the blocking shuffles.
    """
    from biomedical_entity_linking_ray.functions.joins import heal_projection

    feats = reps.select_columns(_FEATS)
    P = effective_partitions(cfg)

    _A_SCHEMA = pa.schema([
        ("id_a", pa.string()), ("id_b", pa.string()), ("block_key", pa.string()),
        ("path_a", pa.string()), ("sig_a", pa.binary()), ("vec_a", pa.binary()),
    ])
    _AB_SCHEMA = pa.schema(list(_A_SCHEMA) + [
        ("path_b", pa.string()), ("sig_b", pa.binary()), ("vec_b", pa.binary()),
    ])

    a = hash_join(
        pairs, feats, "inner", P, on=("id_a",), right_on=("file_id",),
        right_suffix="_ra",
    ).map_batches(
        heal_projection(_A_SCHEMA, lambda t: pa.table({
            "id_a": t["id_a"], "id_b": t["id_b"], "block_key": t["block_key"],
            "path_a": t["path_norm"], "sig_a": t["sig"], "vec_a": t["tfvec"],
        })),
        batch_format="pyarrow",
    )
    return hash_join(
        a, feats, "inner", P, on=("id_b",), right_on=("file_id",),
        right_suffix="_rb",
    ).map_batches(
        heal_projection(_AB_SCHEMA, lambda t: pa.table({
            "id_a": t["id_a"], "id_b": t["id_b"], "block_key": t["block_key"],
            "path_a": t["path_a"], "sig_a": t["sig_a"], "vec_a": t["vec_a"],
            "path_b": t["path_norm"], "sig_b": t["sig"], "vec_b": t["tfvec"],
        })),
        batch_format="pyarrow",
    )
