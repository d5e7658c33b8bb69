"""Fused within-block pair scoring + local contraction (the scale path).

Motivation (measured at 179k rows / 32 cpus): the two-join design that
attaches per-side sketches onto 2.6M candidate pairs moves ~10 GB through
hash shuffles (143 s); label propagation over the full 1.9M-edge list costs
another 150 s. Both costs are avoidable:

1. **member-set block dedup** -- the ~21 LSH bands of one near-dup cluster
   usually produce the *same* member set; a commutative set-hash aggregate
   (sum of mixed id-hashes per block, then min-key per set-hash + semi join,
   all bucketed) keeps ONE block per distinct member set. Skinny shuffles
   only.
2. **enrich once** -- features join onto the deduped block ROWS
   (~1.2 x reps, not ~pairs), so each sketch crosses the wire once.
3. **fused scoring** -- one bucketed groupby moves the enriched rows; inside
   each block a vectorized pass enumerates the (windowed) pairs and scores
   them from the in-memory side arrays: no payload duplication per pair.
   Scorer state (weights, thresholds) is plain config captured in the
   closure; the standalone actor-pool scorer (scoring.py) remains the
   building block for model-heavy scorers (crossencoder analog, T10).
4. **local contraction** -- within a block, union-find over the passing
   pairs emits one star edge per member to its block-local root. Transitive
   clustering then runs on ~1.2 edges/row instead of ~15 pairs/row; global
   connectivity is preserved because rows shared between blocks carry both
   stars (reference analog: the greedy per-component partition,
   special_partition.pyx:288-356, done distributed).

Outputs: scored pairs (deduplicated, max score) AND star edges, from one
shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from biomedical_entity_linking_ray.config import LinkageConfig, effective_partitions
from biomedical_entity_linking_ray.functions import hashing
from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate
from biomedical_entity_linking_ray.functions.joins import hash_join, heal_projection
from biomedical_entity_linking_ray.functions.strings import jaro_winkler_pairs


def dedup_blocks_by_memberset(
    block_rows: "ray.data.Dataset", cfg: LinkageConfig
) -> "ray.data.Dataset":
    """Keep one block key per distinct member set (skinny, 2 bucketed aggs +
    1 semi filter). Set hash = sum of splitmix64(fnv(id)) -- commutative, so
    it aggregates without collecting the set. The representative-key side is
    broadcast when it fits (vectorized is_in per batch); semi hash join
    beyond the bound."""
    import ray as _ray

    from biomedical_entity_linking_ray.functions.joins import cached_broadcast

    P = effective_partitions(cfg)

    def add_idhash(t: pa.Table) -> pa.Table:
        h = hashing.fnv1a_fixed(t["file_id"].to_numpy(zero_copy_only=False), width=64)
        h = hashing.splitmix64(h).astype(np.int64)  # int64 for pandas sum
        # the sethash aggregate needs only (block_key, idh): dropping file_id
        # here keeps its shuffle ~30% smaller
        return pa.table({"block_key": t["block_key"], "idh": pa.array(h)})

    keyed = block_rows.map_batches(add_idhash, batch_format="pyarrow")
    sethash = bucketed_aggregate(
        keyed, ["block_key"], {"mh": ("idh", "sum"), "cnt": ("idh", "count")},
        n_buckets=P * 4,
    )
    # one representative block key per (set-hash, size); the cnt >= 2 filter
    # drops every SINGLETON block here for free (the count is already on the
    # row) -- singletons produce no pairs and no stars, and they are the bulk
    # of LSH band keys, so the enrich join and the scoring shuffle downstream
    # never see them
    rep_keys = bucketed_aggregate(
        sethash.filter(expr="cnt >= 2"), ["mh", "cnt"],
        {"block_key": ("block_key", "min")},
        n_buckets=P * 4,
    ).select_columns(["block_key"]).materialize()
    n_keys = rep_keys.count()
    if n_keys == 0:
        # every block is a singleton (e.g. all-distinct corpus): nothing to
        # score -- emit a typed empty block table (an empty to_pandas() would
        # be column-less)
        return ray.data.from_arrow(pa.schema(
            [("block_key", pa.string()), ("file_id", pa.string())]).empty_table())
    if n_keys <= cfg.broadcast_side_max:
        import pandas as _pd

        keys_ref = _ray.put(rep_keys.to_pandas()["block_key"].to_numpy())

        def semi(t: pa.Table) -> pa.Table:
            # pc.is_in rebuilds its value-set hashtable on EVERY call -- at
            # millions of rep keys that turned a semi filter into the job's
            # slowest stage. A pandas Index builds the hashtable ONCE per
            # worker (inside cached_broadcast's one-time transform, reused by
            # its first get_indexer) and each batch pays only O(batch) probes.
            ks = cached_broadcast(keys_ref, transform=_pd.Index)
            idx = ks.get_indexer(t["block_key"].to_numpy(zero_copy_only=False))
            return t.filter(pa.array(idx >= 0))

        return block_rows.map_batches(semi, batch_format="pyarrow")
    return hash_join(block_rows, rep_keys, "left_semi", P, on=("block_key",))


def enrich_block_rows(
    block_rows: "ray.data.Dataset", reps: "ray.data.Dataset", cfg: LinkageConfig
) -> "ray.data.Dataset":
    """Attach per-row features onto block rows (once per row, not per pair).

    The feature side (one row per unique content) is broadcast when it fits
    (`ray.put` once, indexed lookup built once per worker, vectorized take per
    batch); a partitioned hash join beyond the bound (the 10^12-scale path).
    """
    import ray as _ray

    from biomedical_entity_linking_ray.functions.joins import cached_broadcast

    P = effective_partitions(cfg)
    feats = reps.select_columns(["file_id", "path_norm", "sig", "tfvec"])
    out_schema = pa.schema([
        ("block_key", pa.string()), ("file_id", pa.string()),
        ("path_norm", pa.string()), ("sig", pa.binary()), ("tfvec", pa.binary()),
    ])
    feats = feats.materialize()
    if feats.count() <= cfg.broadcast_side_max:
        feats_ref = _ray.put(feats.to_pandas())

        def enrich(t: pa.Table) -> pa.Table:
            idx = cached_broadcast(
                feats_ref, lambda df: df.set_index("file_id", drop=False))
            sel = idx.reindex(t["file_id"].to_pylist())
            return pa.table({
                "block_key": t["block_key"],
                "file_id": t["file_id"],
                "path_norm": pa.array(sel["path_norm"].to_numpy(), pa.string()),
                "sig": pa.array(sel["sig"].tolist(), pa.binary()),
                "tfvec": pa.array(sel["tfvec"].tolist(), pa.binary()),
            })

        return block_rows.map_batches(enrich, batch_format="pyarrow")
    return hash_join(
        block_rows, feats, "inner", P, on=("file_id",)
    ).map_batches(
        heal_projection(out_schema, lambda t: t.select(out_schema.names)),
        batch_format="pyarrow",
    )


def pack_rep_feats(reps: "ray.data.Dataset", cfg: LinkageConfig):
    """reps(file_id, path_norm, sig, tfvec) -> `ray.put` ObjectRef of a
    PACKED tuple (file_id ndarray, path ndarray, sig (n, num_perm) uint16,
    tfvec (n, tf_dim) float16) for score_blocks' broadcast fast path.

    Packing once on the driver replaces the old pandas-DataFrame broadcast
    whose object-bytes columns every scoring bucket re-decoded with
    ``b"".join(sel[...].tolist())`` (n Python bytes objects + a full copy
    per bucket); consumers now gather rows with one numpy fancy-index. The
    sketch matrices come off the Arrow data buffers zero-copy."""
    import ray as _ray

    from biomedical_entity_linking_ray.functions.vectors import (
        binary_column_to_matrix,
    )

    cols = ["file_id", "path_norm", "sig", "tfvec"]
    # per-block projection + empty-block drop: Ray's filter/map stages can
    # emit EMPTY blocks that bypass select_columns and keep their upstream
    # schema, which would fail concat_tables (the heal_projection quirk)
    blocks = [b.select(cols) for b in
              _ray.get(reps.select_columns(cols).to_arrow_refs())
              if b.num_rows]
    t = pa.concat_tables(blocks) if blocks else pa.table({
        "file_id": pa.array([], pa.string()),
        "path_norm": pa.array([], pa.string()),
        "sig": pa.array([], pa.binary()),
        "tfvec": pa.array([], pa.binary())})
    fid = np.asarray(t["file_id"].to_pylist(), dtype=object)
    paths = np.asarray(t["path_norm"].to_pylist(), dtype=object)
    sigs = np.ascontiguousarray(
        binary_column_to_matrix(t["sig"], np.uint16, cfg.num_perm))
    vecs = np.ascontiguousarray(
        binary_column_to_matrix(t["tfvec"], np.float16, cfg.tf_dim))
    return _ray.put((fid, paths, sigs, vecs))


def _feats_index(packed):
    """One-time per-worker transform: hashtable over the packed file_ids."""
    import pandas as _pd

    fid, paths, sigs, vecs = packed
    return _pd.Index(fid), paths, sigs, vecs


_PAIR_SCHEMA = pa.schema([
    ("kind", pa.string()), ("id_a", pa.string()), ("id_b", pa.string()),
    ("block_key", pa.string()),
    ("score_jw", pa.float64()), ("score_jaccard", pa.float64()),
    ("score_cosine", pa.float64()), ("score", pa.float64()),
])


def _empty_out() -> pa.Table:
    return _PAIR_SCHEMA.empty_table()


def score_blocks(
    rows: "ray.data.Dataset", cfg: LinkageConfig, feats_ref=None,
    spill_dir: str | None = None,
) -> tuple["ray.data.Dataset", "ray.data.Dataset", "ray.data.Dataset"]:
    """One bucketed shuffle -> (scored_pairs, star_edges, raw_star_edges).

    ``star_edges`` is deduplicated across blocks (one row per distinct
    (root, member) edge -- the resumable/checkpointable artifact);
    ``raw_star_edges`` is the pre-dedup stream straight off the scoring pass.
    Connected components is union-find -- duplicate edges are a no-op there --
    so the flagship's single-pass path feeds CC the raw stream and skips the
    dedup shuffle entirely (clustering re-deduplicates only when the edge list
    is big enough to need the partition-actor path, where duplicate adjacency
    would inflate resident memory).

    Inside each block: windowed pair enumeration over ids sorted ascending,
    vectorized scoring from the stacked side arrays, then a union-find over
    passing pairs emitting (member -> block-local root) star edges. Emitted
    rows are tagged 'p' (scored pair) / 's' (star edge) and split after the
    shuffle; pair rows dedup by max score across blocks, star rows by
    distinct.

    Two feature-delivery modes:
    - ``feats_ref`` given (a `ray.put` ObjectRef of the rep feature frame):
      `rows` is the SKINNY (block_key, file_id) table -- only strings move
      through the coarse shuffle and payloads are looked up per bucket from
      the worker-cached broadcast. The fast path while the feature table fits
      the object store.
    - ``feats_ref`` None: `rows` is the enriched table carrying
      path_norm/sig/tfvec (the 10^12-scale path fed by `enrich_block_rows`'s
      hash join; payload rides the shuffle because no node could hold it).
    """
    from biomedical_entity_linking_ray.functions.joins import cached_broadcast

    num_perm, tf_dim = cfg.num_perm, cfg.tf_dim
    W, all_max, tau = cfg.pair_window, cfg.all_pairs_max, cfg.tau
    w_jw, w_jac, w_cos = cfg.w_jw, cfg.w_jac, cfg.w_cos
    emit_pairs = cfg.emit_scored_pairs  # False: stars only (assignments-only mode)
    # fine-grained coarse buckets: per-group scoring cost is quadratic-ish in
    # block size, so coarse groups must be numerous enough that one heavy
    # group cannot straggle a whole core's worth of work
    n_coarse = effective_partitions(cfg) * 16

    def add_coarse(t: pa.Table) -> pa.Table:
        h = hashing.fnv1a_fixed(t["block_key"].to_numpy(zero_copy_only=False), width=96)
        b = (h % np.uint64(n_coarse)).astype(np.int64)
        return t.append_column("__coarse", pa.array(b))

    coarse = rows.map_batches(add_coarse, batch_format="pyarrow")

    import os as _os

    _prof = bool(_os.environ.get("BEL_SCORE_TIMING"))

    def _adjacent_same(col, n: int) -> np.ndarray:
        """bool[n-1]: row i+1 equals row i in `col` (C++ kernel, no Python
        string materialization)."""
        import pyarrow.compute as pc

        if n < 2:
            return np.zeros(0, dtype=bool)
        return pc.equal(col.slice(1), col.slice(0, n - 1)).to_numpy(
            zero_copy_only=False)

    def _dense_payload(col, dtype, width: int, n: int) -> np.ndarray:
        """(n, width) matrix view of an equal-width binary column -- shared
        zero-copy decode (vectors.binary_column_to_matrix) so buffer-view
        fixes live in one place."""
        from biomedical_entity_linking_ray.functions.vectors import (
            binary_column_to_matrix,
        )

        return binary_column_to_matrix(col, dtype, width)

    def score_bucket(g: pa.Table) -> pa.Table:
        import time as _time

        import pyarrow.compute as pc

        _marks = [_time.time()]

        def _mark():
            _marks.append(_time.time())

        if g.num_rows == 0:
            return _empty_out()
        need = (["block_key", "file_id"] if feats_ref is not None else
                ["block_key", "file_id", "path_norm", "sig", "tfvec"])
        # arrow-native dedup + sort: C++ kernels, no pandas object columns.
        # Sorting by UTF-8 bytes == sorting by code points (UTF-8 preserves
        # code-point order), so block/id order matches the old pandas path.
        g = g.select(need).combine_chunks()
        g = g.sort_by([("block_key", "ascending"), ("file_id", "ascending")])
        n = g.num_rows
        bk, fid = g["block_key"], g["file_id"]
        dup = _adjacent_same(bk, n) & _adjacent_same(fid, n)
        if dup.any():
            g = g.filter(pa.array(np.r_[True, ~dup])).combine_chunks()
            n = g.num_rows
            bk, fid = g["block_key"], g["file_id"]
        _mark()
        if feats_ref is not None:
            fidx, bpaths, bsigs, bvecs = cached_broadcast(
                feats_ref, _feats_index)
            pos = fidx.get_indexer(fid.to_numpy(zero_copy_only=False))
            if pos.size and pos.min() < 0:
                raise KeyError("block row references a file_id absent from "
                               "the packed rep feature broadcast")
            paths, path_codes = bpaths[pos], None
            sigs = bsigs[pos]                      # one fancy-index gather
            vecs = bvecs[pos].astype(np.float32)   # (no per-bucket re-join)
        else:
            d = pc.dictionary_encode(g["path_norm"].combine_chunks())
            d = d.combine_chunks() if isinstance(d, pa.ChunkedArray) else d
            path_codes = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            paths = np.asarray(d.dictionary.to_pylist(), dtype=object)
            sigs = _dense_payload(g["sig"], np.uint16, num_perm, n)
            vecs = _dense_payload(g["tfvec"], np.float16, tf_dim, n
                                  ).astype(np.float32)
        _mark()

        starts = np.flatnonzero(np.r_[True, ~_adjacent_same(bk, n)])
        lens = np.diff(np.r_[starts, n])
        ia_all, ib_all = [], []
        for s, ln in zip(starts, lens):
            if ln < 2:
                continue
            if ln <= all_max:
                iu = np.triu_indices(ln, k=1)
                ia_all.append(iu[0] + s)
                ib_all.append(iu[1] + s)
            else:
                ia_all.append(np.concatenate(
                    [np.arange(s, s + ln - w) for w in range(1, W + 1)]))
                ib_all.append(np.concatenate(
                    [np.arange(s + w, s + ln) for w in range(1, W + 1)]))
        if not ia_all:
            return _empty_out()
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        _mark()

        # CHUNKED sketch scoring: a full-width gather would materialize two
        # (pairs, num_perm) temporaries per kernel (~1 KB/pair of DRAM
        # traffic -- the scaling killer on a shared memory bus); 8k-pair
        # chunks keep the gathered temporaries L2-resident while the source
        # rows stay cache-hot (consecutive pairs index the same block).
        # count_nonzero + one divide == .mean(axis=1) exactly; float32
        # einsum assigned into float64 == .astype(np.float64) exactly.
        npairs = ia.size
        jac = np.empty(npairs, dtype=np.float64)
        cos = np.empty(npairs, dtype=np.float64)
        CH = 8192
        for c0 in range(0, npairs, CH):
            sl = slice(c0, min(c0 + CH, npairs))
            ia_c, ib_c = ia[sl], ib[sl]
            jac[sl] = np.count_nonzero(sigs[ia_c] == sigs[ib_c], axis=1)
            cos[sl] = np.einsum("ij,ij->i", vecs[ia_c], vecs[ib_c])
        jac /= float(num_perm)
        np.clip(cos, -1.0, 1.0, out=cos)
        _mark()
        _mark()

        def _jw_at(idx_a: np.ndarray, idx_b: np.ndarray) -> np.ndarray:
            if path_codes is None:
                return jaro_winkler_pairs(paths[idx_a], paths[idx_b])
            return jaro_winkler_pairs(
                paths[path_codes[idx_a]], paths[path_codes[idx_b]])

        if emit_pairs:
            jw = _jw_at(ia, ib)
            score = w_jw * jw + w_jac * jac + w_cos * cos
            passing = score >= tau
        else:
            # assignments-only: only the passing SET matters, so skip the JW
            # kernel (5-6x the cost of jac+cos per pair) wherever even jw=1.0
            # cannot reach tau. FP mult/add are monotone, so
            # score(jw<=1) <= bound(jw=1) exactly -- the candidate filter can
            # never drop a passing pair; candidates get the identical
            # left-to-right expression, so the passing set is bit-equal.
            bound = w_jw * 1.0 + w_jac * jac + w_cos * cos
            cand = np.flatnonzero(bound >= tau)
            passing = np.zeros(ia.size, dtype=bool)
            if cand.size:
                jw_c = _jw_at(ia[cand], ib[cand])
                passing[cand] = (
                    w_jw * jw_c + w_jac * jac[cand] + w_cos * cos[cand]) >= tau
        _mark()

        # local union-find over passing pairs -> star edges (member, root).
        # Rows are sorted by (block_key, file_id) and pairs stay inside one
        # block, so the min INDEX of a component is its min file_id: union by
        # min index == the old union by min id, without string compares.
        parent = np.arange(n, dtype=np.int64)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        # plain-int iteration (tolist) skips numpy-scalar boxing in the loop
        for a, b in zip(ia[passing].tolist(), ib[passing].tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
        member_mask = roots != np.arange(n)
        member_idx = np.flatnonzero(member_mask)
        np_, ns = ia.size, member_idx.size
        zeros = np.zeros(ns, dtype=np.float64)
        _mark()
        # emission via arrow take: the id/key columns never become Python
        # strings; float columns wrap the numpy buffers zero-copy
        ia_pa, ib_pa = pa.array(ia), pa.array(ib)
        m_pa, r_pa = pa.array(member_idx), pa.array(roots[member_idx])
        pairs_tab = pa.table({
            "kind": pa.array(np.full(np_, "p", dtype=object), pa.string()),
            "id_a": pc.take(fid, ia_pa), "id_b": pc.take(fid, ib_pa),
            "block_key": pc.take(bk, ia_pa),
            "score_jw": pa.array(jw), "score_jaccard": pa.array(jac),
            "score_cosine": pa.array(cos), "score": pa.array(score),
        }, schema=_PAIR_SCHEMA) if emit_pairs else _empty_out()
        stars_tab = pa.table({
            "kind": pa.array(np.full(ns, "s", dtype=object), pa.string()),
            "id_a": pc.take(fid, r_pa), "id_b": pc.take(fid, m_pa),
            "block_key": pc.take(bk, m_pa),
            "score_jw": pa.array(zeros), "score_jaccard": pa.array(zeros),
            "score_cosine": pa.array(zeros),
            "score": pa.array(np.ones(ns, dtype=np.float64)),
        }, schema=_PAIR_SCHEMA)
        out = pa.concat_tables([pairs_tab, stars_tab])
        if _prof and np_ >= 100_000:
            d = np.diff(_marks)
            names = ["sort", "gather", "enum", "jac+cos", "clip", "jw", "uf", "emit"]
            d = list(d) + [_time.time() - _marks[-1]]
            print("  [score n=%d pairs=%d] " % (n, np_)
                  + " ".join(f"{nm}={v:.2f}" for nm, v in zip(names, d)),
                  flush=True)
        return out

    tagged = coarse.groupby("__coarse").map_groups(
        score_bucket, batch_format="pyarrow"
    )
    empty = False
    if spill_dir is not None:
        # disk-exchange path (the large-run envelope): the tagged pair/star
        # stream lands ONCE as Parquet hash-partitioned on the dedup key
        # (id_a, id_b) -- ~5x smaller than the raw-Arrow object-store pin --
        # and the dedup "shuffle" becomes per-bucket-directory reduces that
        # never enter the object store. See parquet_exchange_write for the
        # sizing/partitioning contract and BASELINE.md for the disk-headroom
        # measurement that motivates it.
        from biomedical_entity_linking_ray.config import default_buckets
        from biomedical_entity_linking_ray.functions.groups import (
            parquet_exchange_aggregate, parquet_exchange_write)

        # B = cpus*4: per-bucket reduce volume ~N/B stays flat as the cluster
        # grows with the data; file fan-out = write_tasks x B (see
        # parquet_exchange_write sizing note)
        parquet_exchange_write(tagged, ["id_a", "id_b"], spill_dir,
                               n_buckets=default_buckets(per_cpu=4))
        import glob as _glob

        empty = not _glob.glob(_os.path.join(spill_dir, "__bucket=*"))
    else:
        tagged = tagged.materialize()
        if _prof:
            print(tagged.stats(), flush=True)
        empty = tagged.count() == 0
    if empty:
        # every surviving block was singleton-free of pairs: typed empties
        # (a schema-less empty dataset would poison the filters below)
        from biomedical_entity_linking_ray.stages.scoring import EMPTY_SCORED

        empty_scored = ray.data.from_arrow(EMPTY_SCORED)
        empty_stars = ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.string()), "id_b": pa.array([], pa.string()),
            "block_key": pa.array([], pa.string()),
        }))
        return empty_scored, empty_stars, empty_stars

    P4 = n_coarse
    _pair_aggs = {
        "block_key": ("block_key", "min"), "score_jw": ("score_jw", "max"),
        "score_jaccard": ("score_jaccard", "max"),
        "score_cosine": ("score_cosine", "max"), "score": ("score", "max"),
    }
    if spill_dir is not None:
        from biomedical_entity_linking_ray.stages.scoring import EMPTY_SCORED

        scored = (parquet_exchange_aggregate(
            spill_dir, ["id_a", "id_b"], _pair_aggs, pre_filter=("kind", "p"))
            if emit_pairs else ray.data.from_arrow(EMPTY_SCORED))
        stars = parquet_exchange_aggregate(
            spill_dir, ["id_a", "id_b"], {"block_key": ("block_key", "min")},
            pre_filter=("kind", "s"))
        stars_raw = ray.data.read_parquet(spill_dir).filter(
            expr="kind == 's'").map_batches(
            lambda t: t.select(["id_a", "id_b", "block_key"]),
            batch_format="pyarrow",
        )
        return scored, stars, stars_raw
    if emit_pairs:
        scored = bucketed_aggregate(
            tagged.filter(expr="kind == 'p'"),
            ["id_a", "id_b"], _pair_aggs,
            n_buckets=P4,
        )
    else:
        from biomedical_entity_linking_ray.stages.scoring import EMPTY_SCORED

        # assignments-only mode: the pair dedup (the job's largest all-to-all)
        # never runs; consumers get a typed empty product table
        scored = ray.data.from_arrow(EMPTY_SCORED)
    stars_raw = tagged.filter(expr="kind == 's'").map_batches(
        lambda t: t.select(["id_a", "id_b", "block_key"]),
        batch_format="pyarrow",
    )
    stars = bucketed_aggregate(
        stars_raw, ["id_a", "id_b"], {"block_key": ("block_key", "min")},
        n_buckets=P4,
    )
    return scored, stars, stars_raw
