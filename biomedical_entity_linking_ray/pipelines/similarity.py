"""Similarity search over the `embeddings` table (list<float> column).

The reference's dense-retrieval k-NN (FAISS flat / IVF,
data_process.py:517-562; DenseFlatIndexer, run_entity_linking.py:50-163)
re-expressed without an index server:

- brute-force top-k: broadcast the query matrix once (`ray.put`), each batch
  does one numpy matmul against it, per-batch local top-k, then a single
  global top-k merge per query (O3 distributed-top-k pattern in SURVEY.md 2.6).
- LSH-bucketed variant: the scale path -- random-hyperplane buckets bound the
  candidate set per query (analog of IVF nlist/nprobe).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from biomedical_entity_linking_ray.functions.vectors import list_column_to_matrix


def _read_embeddings(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def load_query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic queries: the first `n_queries` vectors of the table itself
    (self-retrieval benchmark -- rank-1 hit must be the vector's own id).

    The read is row-group-pruned with a `vec_id < n_queries` predicate -- at
    100 TB the query load touches one row group, never the whole table. Falls
    back to a full scan only if ids turn out non-dense (filtered read returns
    fewer than n rows)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(path, columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", n_queries)])
    if t.num_rows < n_queries:  # non-dense ids: full scan fallback (small data)
        t = pq.read_table(path, columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(n_queries)  # n smallest ids:
    # deterministic + oracle-expressible (ORDER BY vec_id LIMIT n)
    q = np.array(list(df["embedding"]), dtype=np.float64)
    qids = df["vec_id"].to_numpy(dtype=np.int64)
    return qids, q


def knn_bruteforce(
    sf_dir: str, k: int = 5, n_queries: int = 16, exclude_self: bool = False,
    corpus: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """(query_id, rank, vec_id, cosine): exact top-k by cosine per query.

    Query matrix broadcast via `ray.put` (read once per task, never per batch);
    per-batch matmul + local top-k; global merge via groupby(query_id).
    `exclude_self` drops the query's own vector before ranking (for neighbor
    retrieval metrics). `corpus` overrides the (vec_id, embedding) corpus scan
    -- the filtered-search hook (`knn_filtered`).
    """
    qids, Q = load_query_matrix(sf_dir, n_queries)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qu = Q / qn  # float64: matches the SQL oracle's cosine to ~1e-15
    q_ref = ray.put((qids, Qu))

    def local_topk(t: pa.Table) -> pa.Table:
        qids_, Qu_ = ray.get(q_ref)
        V = list_column_to_matrix(t["embedding"], np.float64)
        vn = np.linalg.norm(V, axis=1, keepdims=True)
        vn[vn == 0] = 1.0
        Vu = V / vn
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        # round to 4 decimals BEFORE ranking so rank ties break identically
        # in Ray and in the DuckDB oracle (both then tie-break by vec_id)
        sims = np.round(Qu_ @ Vu.T, 4)  # (q, n)
        if exclude_self:
            sims[qids_[:, None] == ids[None, :]] = -2.0
        kk = min(k, ids.size)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids_)):
            # local cut must respect the global (cosine DESC, vec_id ASC)
            # order: a plain argpartition drops boundary ties arbitrarily
            order = np.lexsort((ids, -sims[qi]))[:kk]
            order = order[sims[qi, order] > -2.0]  # drop excluded-self slots
            out_q.extend([int(qids_[qi])] * order.size)
            out_v.extend(ids[order].tolist())
            out_s.extend(sims[qi, order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })

    partials = (corpus if corpus is not None else _read_embeddings(sf_dir)) \
        .map_batches(local_topk, batch_format="pyarrow", batch_size=4096)

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "vec_id", "cosine"]]

    return partials.groupby("query_id").map_groups(merge_topk, batch_format="pandas")


def knn_filtered(
    sf_dir: str, k: int = 5, n_queries: int = 16, max_label: int = 5,
) -> "ray.data.Dataset":
    """Metadata-filtered vector search (the vector-DB 'filtered ANN' product,
    here with the exact kernel): top-k by cosine restricted to corpus vectors
    with label < max_label.

    The predicate rides INTO the Parquet scan as a pyarrow dataset expression
    -- row groups whose label statistics miss the range never leave storage,
    and non-matching rows are dropped before the embedding column reaches a
    batch. Queries remain the unfiltered first-n vectors (external queries
    searching a filtered corpus), so a query's own vector may legitimately be
    excluded from its results."""
    import pyarrow.compute as _pc

    corpus = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=(_pc.field("label") < max_label),
    )
    return knn_bruteforce(sf_dir, k=k, n_queries=n_queries, corpus=corpus)


def knn_ivf(
    sf_dir: str, k: int = 5, n_queries: int = 16,
    n_centroids: int = 16, nprobe: int = 4, kmeans_iters: int = 10,
    train_rows: int = 2048,
) -> "ray.data.Dataset":
    """Approximate top-k via an IVF index expressed Ray-natively (reference
    T3: FAISS IndexIVFFlat with nlist/nprobe, data_process.py:517-562).

    Train: spherical k-means on a row-group-pruned sample, driver-side
    (deterministic: first-rows init, fixed iteration count). Search: the
    centroid matrix is broadcast once; each batch assigns its vectors to
    their nearest centroid and scores a query only against vectors in the
    query's `nprobe` nearest cells -- the inverted-list pruning -- followed
    by the same distributed top-k merge as the exact path.
    """
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    qids, Q = load_query_matrix(sf_dir, n_queries)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    # float64 + round-before-rank (same as knn_bruteforce): with
    # nprobe == n_centroids the pruning admits everything, so the result is
    # the exact top-k and the brute-force DuckDB oracle applies verbatim
    Qu = Q / qn

    # --- train (pruned sample; falls back to full read only if ids sparse) ---
    t = pq.read_table(path, columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", train_rows)])
    X = list_column_to_matrix(t["embedding"], np.float32)
    xn = np.linalg.norm(X, axis=1, keepdims=True)
    xn[xn == 0] = 1.0
    X = X / xn
    C = X[:n_centroids].copy()  # deterministic init: first rows
    for _ in range(kmeans_iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_centroids):
            m = X[assign == c]
            if len(m):
                v = m.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    C[c] = v / nv
    q_probes = np.argsort(-(Qu @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    bc = ray.put((qids, Qu, C, q_probes))

    def local_topk(t: pa.Table) -> pa.Table:
        qids_, Qu_, C_, qp = ray.get(bc)
        V = list_column_to_matrix(t["embedding"], np.float64)
        vn = np.linalg.norm(V, axis=1, keepdims=True)
        vn[vn == 0] = 1.0
        Vu = V / vn
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        cid = np.argmax(Vu.astype(np.float32) @ C_.T, axis=1)  # (n,)
        cand_mask = (qp[:, :, None] == cid[None, None, :]).any(axis=1)
        sims = np.round(Qu_ @ Vu.T, 4)
        sims[~cand_mask] = -2.0
        kk = min(k, ids.size)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids_)):
            order = np.lexsort((ids, -sims[qi]))[:kk]
            for j in order:
                if sims[qi, j] > -2.0:
                    out_q.append(int(qids_[qi]))
                    out_v.append(int(ids[j]))
                    out_s.append(float(sims[qi, j]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })

    partials = _read_embeddings(sf_dir).map_batches(
        local_topk, batch_format="pyarrow", batch_size=4096
    )

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "vec_id", "cosine"]]

    return partials.groupby("query_id").map_groups(merge_topk, batch_format="pandas")


def label_recall_at_k(
    sf_dir: str, ks: tuple = (1, 3, 5), n_queries: int = 16,
) -> "pa.Table":
    """(k, recall): fraction of queries whose top-k neighbors (self excluded)
    share the query's label -- the ranked-retrieval metric family (reference
    analog: recall@k over gold CUIs, bioel/bioel/evaluate.py:234-260 and
    min_hit_index :203-231).

    The k-NN itself is the distributed operator; this aggregates its small
    (n_queries x k) result with labels fetched via a pruned parquet read of
    exactly the ids involved."""
    import pyarrow.parquet as pq

    kmax = max(ks)
    nn = knn_bruteforce(sf_dir, k=kmax, n_queries=n_queries,
                        exclude_self=True).to_pandas()
    need = sorted(set(nn["query_id"]) | set(nn["vec_id"]))
    lab = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "label"], filters=[("vec_id", "in", need)],
    ).to_pandas()
    label_of = dict(zip(lab["vec_id"], lab["label"]))
    nn["hit"] = [int(label_of[v] == label_of[q])
                 for q, v in zip(nn["query_id"], nn["vec_id"])]
    out_k, out_r = [], []
    for k in sorted(ks):
        per_q = nn[nn["rank"] <= k].groupby("query_id")["hit"].max()
        out_k.append(k)
        out_r.append(round(float(per_q.mean()), 4))
    return pa.table({"k": pa.array(out_k, pa.int64()),
                     "recall": pa.array(out_r, pa.float64())})


def knn_lsh(
    sf_dir: str, k: int = 5, n_queries: int = 16,
    lsh_planes: int = 8, rotations: int = 4, seed: int = 42,
) -> "ray.data.Dataset":
    """Approximate top-k: random-hyperplane buckets (rotations x sign-code);
    a query only scores vectors sharing >= 1 bucket (IVF-style pruning).

    Scoring follows the knn_bruteforce convention (float64 cosine, rounded to
    4 decimals BEFORE ranking, vec_id tie-break) so the `lsh_planes=0` config
    -- zero hyperplanes puts everything in one bucket, admitting every
    candidate -- reproduces the exact brute-force result and the same DuckDB
    oracle checks the bucket/mask/merge plumbing end to end."""
    qids, Q = load_query_matrix(sf_dir, n_queries)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Qu = Q / qn
    rng = np.random.RandomState(seed)
    planes = [rng.randn(lsh_planes, Q.shape[1]) for _ in range(rotations)]

    # per-rotation sign codes of the queries, (rotations, n_queries)
    q_codes = np.stack([
        ((Qu @ P.T) > 0) @ (1 << np.arange(lsh_planes)) for P in planes
    ])
    bc_ref = ray.put((qids, Qu, planes, q_codes))

    def local_topk(t: pa.Table) -> pa.Table:
        qids_, Qu_, planes_, qcodes_ = ray.get(bc_ref)
        V = list_column_to_matrix(t["embedding"], np.float64)
        vn = np.linalg.norm(V, axis=1, keepdims=True)
        vn[vn == 0] = 1.0
        Vu = V / vn
        ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
        # which queries share a bucket with which vectors: one broadcast
        # code-equality compare per rotation (no per-row Python loop)
        cand_mask = np.zeros((len(qids_), ids.size), dtype=bool)
        for r, P in enumerate(planes_):
            codes = ((Vu @ P.T) > 0) @ (1 << np.arange(P.shape[0]))
            cand_mask |= qcodes_[r][:, None] == codes[None, :]
        # round BEFORE ranking: rank ties then break identically to SQL
        sims = np.round(Qu_ @ Vu.T, 4)
        sims[~cand_mask] = -2.0  # outside candidate set
        kk = min(k, ids.size)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(qids_)):
            # same (cosine DESC, vec_id ASC)-respecting local cut as brute force
            order = np.lexsort((ids, -sims[qi]))[:kk]
            for j in order:
                if sims[qi, j] > -2.0:
                    out_q.append(int(qids_[qi]))
                    out_v.append(int(ids[j]))
                    out_s.append(float(sims[qi, j]))
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cosine": pa.array(out_s, pa.float64()),
        })

    partials = _read_embeddings(sf_dir).map_batches(
        local_topk, batch_format="pyarrow", batch_size=4096
    )

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "vec_id", "cosine"]]

    return partials.groupby("query_id").map_groups(merge_topk, batch_format="pandas")


def fuzzy_name_join(
    sf_dir: str, max_dist: int = 4, block_col: str = "p_brand",
    all_pairs_max: int = 100_000,
) -> "ray.data.Dataset":
    """Blocked fuzzy self-join on part names: (id_a, id_b, dist) for every
    same-brand part pair whose name Levenshtein distance is <= `max_dist`,
    id_a < id_b. The classic record-linkage blocking + edit-distance-verify
    comparator (reference analog: alias string matching in
    bioel/bioel/ontology/umls_utils.py; the flagship uses Jaro-Winkler for
    the same role -- this is the bounded-edit variant).

    Scale shape: blocking-key pair enumeration rides `within_key_pairs`
    (singleton blocks drop map-side, surviving rows cross ONE bounded coarse
    shuffle; names attach via the payload broadcast/enrich-once path, so the
    pair stream before verify is skinny ids; for these ~10-byte names the
    in-row alternative measures within noise of the payload path -- 2.4 vs
    2.6 s warm at sf0.1 -- so the payload shape is kept for its generality
    to wide payloads). Verification is the batched
    anti-diagonal-free DP of `strings.levenshtein_batch` -- one
    np.minimum.accumulate per DP row over the whole batch, repeated pairs
    factorized to uniques. The quadratic term is bounded by the caller's
    blocking key: `all_pairs_max` caps exact enumeration per block, and
    because this join is contractually exhaustive the helper runs in strict
    mode -- a block past the cap RAISES (pick a finer blocking key or raise
    the cap) instead of silently degrading to window pairs."""
    from biomedical_entity_linking_ray.functions.candidate_pairs import (
        within_key_pairs,
    )
    from biomedical_entity_linking_ray.functions.strings import levenshtein_batch

    parts = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", block_col, "p_name"])
    names = parts.select_columns(["p_partkey", "p_name"])
    skinny = parts.select_columns([block_col, "p_partkey"])

    def emit(g: pd.DataFrame, ia: np.ndarray, ib: np.ndarray) -> pd.DataFrame:
        ids = g["p_partkey"].to_numpy()
        nm = g["p_name"].to_numpy()
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib],
                             "name_a": nm[ia], "name_b": nm[ib]})

    # strict: this join is contractually EXHAUSTIVE (the registered oracle is
    # an exact blocked self-join) -- a block past all_pairs_max must raise,
    # not silently degrade to window pairs
    pairs = within_key_pairs(
        skinny, block_col, "p_partkey", emit=emit,
        all_pairs_max=all_pairs_max, payload=names, payload_on="p_partkey",
        payload_columns=["p_name"], strict_all_pairs=True)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        d = levenshtein_batch(t["name_a"].to_pylist(), t["name_b"].to_pylist())
        keep = d <= max_dist
        return pa.table({"id_a": t["id_a"].filter(pa.array(keep)),
                         "id_b": t["id_b"].filter(pa.array(keep)),
                         "dist": pa.array(d[keep], pa.int64())})

    return pairs.map_batches(verify, batch_format="pyarrow")


def knn_self_join(sf_dir: str, k: int = 3) -> "ray.data.Dataset":
    """(query_id, rank, vec_id, cosine): top-k cosine neighbors for EVERY
    vector, self excluded -- the ANN self-join that feeds embedding
    clustering / near-dup mining (reference analog: full-corpus candidate
    retrieval, run_entity_linking.py:50-163, as a join rather than a query
    batch).

    This is the exact brute-force BASELINE: the query side (the whole
    table) broadcasts once via `ray.put` and every corpus batch does one
    matmul -- O(N^2/batch) compute with zero shuffle beyond the final
    per-query top-k merge. Quadratic by construction: past the
    broadcast-comfortable regime (~10^6 rows) use the bucketed variants
    (`knn_lsh`, `knn_ivf`, `embedding_near_dup_lsh`) whose candidate sets
    are bounded per bucket; this kernel then verifies inside buckets.
    Cosines are rounded to 4 decimals BEFORE ranking so ranks tie-break
    identically (cosine DESC, vec_id ASC) in Ray and in the SQL oracle."""
    import pyarrow.parquet as pq

    n = pq.ParquetFile(
        os.path.join(sf_dir, "embeddings.parquet")).metadata.num_rows
    return knn_bruteforce(sf_dir, k=k, n_queries=int(n), exclude_self=True)


def sorted_neighborhood_pairs(
    sf_dir: str, window: int = 8, n_ranges: int | None = None,
    band: int = 4096,
    broadcast_keys_max: int = 2_000_000, join_partitions: int = 8,
    spill_dir: str | None = None,
) -> "ray.data.Dataset":
    """Sorted-neighborhood method (Hernandez & Stolfo 1995): order all parts
    by (p_name, p_partkey) and emit every pair within `window` positions,
    with rank gap and name edit distance -- the classic sliding-window
    record-linkage blocking that catches near-miss keys LSH-style blocking
    can miss ("red bolt" ~ "red bolts" sort adjacent).

    Distributed global rank without a global sort of the corpus:
    1. DISTINCT keys + counts (one bucketed aggregate -- rows collapse to the
       key table);
    2. deterministic hash-sampled key boundaries split the key space into
       `n_ranges` ORDERED ranges; per-range row sums prefix driver-side
       (n_ranges scalars, the token_packing shape);
    3. inside each range one vectorized sort+cumsum assigns each KEY its
       global row base; key bases reach the rows via broadcast under
       `broadcast_keys_max`, hash join beyond;
    4. each row's rank = key base + its id-order position among same-key
       rows (one bounded bucket shuffle);
    5. rank bands of width `band` with the last `window` ranks ghosted into
       the next band: every window pair lives in exactly one band (left
       element never a ghost), enumerated with index arithmetic.
    The corpus is never globally sorted and no stage holds more than a
    range/band of skinny (key, id, rank) rows.

    `band` must exceed `window` (ghosting covers exactly one boundary per
    pair); undersized bands are clamped to 2*window rather than silently
    dropping pairs that span more than one boundary."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    band = max(band, 2 * window)
    from biomedical_entity_linking_ray.config import default_buckets
    from biomedical_entity_linking_ray.functions import hashing
    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate
    from biomedical_entity_linking_ray.functions.joins import (
        cached_broadcast,
        hash_join,
        heal_projection,
    )
    from biomedical_entity_linking_ray.functions.strings import levenshtein_batch

    # cluster-derived: a range's key_bases group holds ~distinct_keys/n_ranges
    # rows, so a fixed literal would grow per-task memory with the corpus
    n_ranges = n_ranges or default_buckets()
    parts = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_name"])

    def add_one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    _EMPTY_PAIRS = pa.schema([
        ("id_a", pa.int64()), ("id_b", pa.int64()),
        ("gap", pa.int64()), ("dist", pa.int64())])

    keys = bucketed_aggregate(
        parts.select_columns(["p_name"]).map_batches(
            add_one, batch_format="pyarrow"),
        ["p_name"], {"cnt": ("one", "sum")})
    if spill_dir is not None:  # 10^12-row path: lineage on disk, resumable
        keys.write_parquet(os.path.join(spill_dir, "keys"))
        keys = ray.data.read_parquet(os.path.join(spill_dir, "keys"))
    else:
        keys = keys.materialize()
    n_keys_total = keys.count()
    if n_keys_total == 0:  # empty table: no ranks, no windows
        return ray.data.from_arrow(_EMPTY_PAIRS.empty_table())

    # 2. sampled ORDERED boundaries. The residue modulus is DERIVED from the
    # distinct-key count so the driver pull is bounded at ~64 samples/range
    # regardless of cardinality (a fixed modulus would pull O(n_keys/mod)
    # rows -- a driver OOM at 10^9+ distinct keys). Hash-residue sampling is
    # deterministic and uniform, so boundaries only steer range balance; the
    # final ranks are exact for ANY boundary choice (per-range cumsum + exact
    # range prefix sums), so this knob never affects output values.
    sample_target = max(64 * n_ranges, 256)
    mod = np.uint64(max(1, 1 << max(
        0, int(n_keys_total / sample_target - 1).bit_length())))

    def sample(t: pa.Table) -> pa.Table:
        h = hashing.fnv1a_fixed(t["p_name"].to_numpy(zero_copy_only=False),
                                width=64)
        return t.select(["p_name"]).filter(pa.array(h % mod == np.uint64(0)))

    sampled = keys.map_batches(sample, batch_format="pyarrow").to_pandas()
    pool = np.sort(sampled["p_name"].to_numpy()) if len(sampled) else np.array([])
    if pool.size >= n_ranges:
        bounds = pool[np.linspace(0, pool.size - 1, n_ranges + 1)
                      .astype(np.int64)][1:-1]
    else:
        bounds = pool[1:-1] if pool.size > 2 else np.array([], dtype=object)

    def add_range(t: pa.Table) -> pa.Table:
        k = t["p_name"].to_numpy(zero_copy_only=False)
        r = np.searchsorted(bounds, k, side="right") if bounds.size \
            else np.zeros(len(k), np.int64)
        return t.append_column("__range", pa.array(r.astype(np.int64)))

    ranged = keys.map_batches(add_range, batch_format="pyarrow")
    range_sums = bucketed_aggregate(
        ranged, ["__range"], {"rows": ("cnt", "sum")}, n_buckets=16,
    ).to_pandas().sort_values("__range")
    base = dict(zip(
        range_sums["__range"],
        np.concatenate([[0], np.cumsum(range_sums["rows"].to_numpy())[:-1]]),
    ))
    base_ref = ray.put(base)

    # 3. per-range key bases
    def key_bases(g: pd.DataFrame) -> pd.DataFrame:
        b = cached_broadcast(base_ref)
        g = g.sort_values("p_name", kind="mergesort").reset_index(drop=True)
        cnt = g["cnt"].to_numpy()
        g["key_base"] = (np.cumsum(cnt) - cnt
                         + int(b[int(g["__range"].iloc[0])]))
        return g[["p_name", "key_base"]]

    kb = ranged.groupby("__range").map_groups(
        key_bases, batch_format="pandas")
    if spill_dir is not None:
        kb.write_parquet(os.path.join(spill_dir, "key_bases"))
        kb = ray.data.read_parquet(os.path.join(spill_dir, "key_bases"))
    else:
        kb = kb.materialize()

    # 4. row ranks: key base + id position within the key
    n_keys = kb.count()
    if n_keys <= broadcast_keys_max:
        kb_df = kb.to_pandas()
        kb_ref = ray.put((kb_df["p_name"].to_numpy(),
                          kb_df["key_base"].to_numpy()))

        def attach(t: pa.Table) -> pa.Table:
            names, bases = cached_broadcast(kb_ref)
            idx = pd.Index(names)
            kb_col = bases[idx.get_indexer(
                t["p_name"].to_numpy(zero_copy_only=False))]
            return t.append_column("key_base", pa.array(kb_col, pa.int64()))

        with_base = parts.map_batches(attach, batch_format="pyarrow")
    else:  # 10^12-row path: distinct-key table too big to broadcast
        joined_schema = pa.schema([
            ("p_partkey", pa.int64()), ("p_name", pa.string()),
            ("key_base", pa.int64())])
        with_base = hash_join(
            parts, kb, "inner", join_partitions, on=("p_name",),
        ).map_batches(
            heal_projection(joined_schema,
                            lambda t: t.select(joined_schema.names)),
            batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hashing.fnv1a_fixed(t["p_name"].to_numpy(zero_copy_only=False),
                                width=64)
        from biomedical_entity_linking_ray.config import default_buckets
        b = (h % np.uint64(default_buckets())).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def rank_rows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_name", "p_partkey"],
                          kind="mergesort").reset_index(drop=True)
        g["rank"] = (g["key_base"]
                     + g.groupby("p_name", sort=False).cumcount()).astype(np.int64)
        return g[["p_partkey", "p_name", "rank"]]

    ranked = with_base.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(rank_rows, batch_format="pandas")

    # 5. banded window pairs (ghost the last `window` ranks into band+1)
    def to_bands(t: pa.Table) -> pa.Table:
        r = t["rank"].to_numpy()
        b = r // band
        ghost = (r % band) >= band - window
        own = t.append_column("__band", pa.array(b.astype(np.int64)))
        own = own.append_column("__ghost", pa.array(
            np.zeros(t.num_rows, dtype=bool)))
        gh = t.filter(pa.array(ghost))
        gh = gh.append_column("__band", pa.array(
            (gh["rank"].to_numpy() // band + 1).astype(np.int64)))
        gh = gh.append_column("__ghost", pa.array(
            np.ones(gh.num_rows, dtype=bool)))
        return pa.concat_tables([own, gh])

    def window_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("rank", kind="mergesort").reset_index(drop=True)
        rk = g["rank"].to_numpy()
        ids = g["p_partkey"].to_numpy()
        nm = g["p_name"].to_numpy()
        ghost = g["__ghost"].to_numpy()
        ia, ib = [], []
        n = len(g)
        for w in range(1, window + 1):
            if n <= w:
                break
            a = np.arange(0, n - w)
            # ghosts sort first (their ranks precede every own rank), so the
            # only duplicate-producing combination is ghost-ghost -- that
            # pair is the previous band's own-own pair. Ghost-LEFT x own
            # pairs are exactly the cross-boundary windows ghosting exists
            # to capture.
            keep = ~(ghost[a] & ghost[a + w]) & (rk[a + w] - rk[a] <= window)
            ia.append(a[keep])
            ib.append(a[keep] + w)
        if not ia:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "gap": pd.Series([], dtype=np.int64),
                                 "dist": pd.Series([], dtype=np.int64)})
        ia = np.concatenate(ia)
        ib = np.concatenate(ib)
        return pd.DataFrame({
            "id_a": ids[ia], "id_b": ids[ib],
            "gap": (rk[ib] - rk[ia]).astype(np.int64),
            "dist": levenshtein_batch(nm[ia], nm[ib]),
        })

    return ranked.map_batches(to_bands, batch_format="pyarrow") \
        .groupby("__band").map_groups(window_pairs, batch_format="pandas")


def anchored_assign_bipartite(
    sf_dir: str, n_anchors: int = 25, k: int = 3,
) -> "ray.data.Dataset":
    """(vec_id, canonical_id): anchored-cluster partition over a bipartite
    mention->anchor candidate graph (reference G2 semantics,
    special_partition.pyx:288-356 run through stages/anchored.py).

    Anchors are the `n_anchors` smallest vec_ids (ORDER BY vec_id LIMIT n --
    the oracle-expressible pick); every other vector is a mention whose
    candidate edges are its top-`k` anchors by 4-dp-rounded cosine. The REAL
    generic machinery runs end-to-end -- exact kernel edges, distributed
    connected components, the fused anchored sweep -- and on a bipartite
    graph the refined partition provably collapses to per-mention argmax
    (cosine DESC, anchor_id ASC): a mention's side is unanchored until its
    first (= best) edge merges, and every later edge joins two anchored
    sides and is refused. That closed form IS the SQL oracle.

    Scale shape: the anchor matrix broadcasts once via `ray.put` (anchor
    dictionaries are small relative to the corpus); mentions stream in one
    map_batches with a per-row top-k cut -- no shuffle before the skinny
    edge stream. Ids are zero-padded strings inside the stage (the stage's
    key type) and decode back to int64 at the end.
    """
    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.stages.anchored import anchored_partition
    from biomedical_entity_linking_ray.stages.clustering import connected_components

    qids, A = load_query_matrix(sf_dir, n_anchors)
    an = np.linalg.norm(A, axis=1, keepdims=True)
    an[an == 0] = 1.0
    Au = A / an
    a_ref = ray.put((qids, Au))
    _pad = "a{:012d}".format

    def edges_fn(t: pa.Table) -> pa.Table:
        aids, Au_ = ray.get(a_ref)
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ~np.isin(ids, aids)  # mentions only
        if not keep.any():
            return pa.table({"id_a": pa.array([], pa.string()),
                             "id_b": pa.array([], pa.string()),
                             "score": pa.array([], pa.float64())})
        V = list_column_to_matrix(t["embedding"], np.float64)[keep]
        ids = ids[keep]
        vn = np.linalg.norm(V, axis=1, keepdims=True)
        vn[vn == 0] = 1.0
        sims = np.round((V / vn) @ Au_.T, 4)  # (m, n_anchors)
        kk = min(k, len(aids))
        # one vectorized cut for the whole batch: anchors are column-sorted
        # by id (load_query_matrix sorts), so a STABLE argsort on -sims
        # breaks score ties by anchor id ascending -- identical to the
        # per-row lexsort((aids, -sims[i])) it replaces, without the
        # per-mention Python loop
        order = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        apad = np.array([_pad(a) for a in aids], dtype=object)
        mpad = np.array([_pad(i) for i in ids], dtype=object)
        return pa.table({
            "id_a": pa.array(np.repeat(mpad, kk), pa.string()),
            "id_b": pa.array(apad[order.ravel()], pa.string()),
            "score": pa.array(
                np.take_along_axis(sims, order, axis=1).ravel(),
                pa.float64())})

    edges = _read_embeddings(sf_dir).map_batches(
        edges_fn, batch_format="pyarrow", batch_size=4096)

    def node_fn(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"file_id": pa.array(
            [_pad(i) for i in ids], pa.string())})

    nodes = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id"],
    ).map_batches(node_fn, batch_format="pyarrow")
    coarse = connected_components(edges, nodes, LinkageConfig())
    anchors_ds = ray.data.from_arrow(pa.table({
        "file_id": pa.array([_pad(i) for i in np.sort(qids)], pa.string())}))
    refined = anchored_partition(edges, coarse, anchors_ds)

    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "vec_id": pc.utf8_slice_codeunits(t["file_id"], 1, 13)
                        .cast(pa.int64()),
            "canonical_id": pc.utf8_slice_codeunits(t["canonical_id"], 1, 13)
                              .cast(pa.int64()),
        })

    return refined.map_batches(decode, batch_format="pyarrow")
