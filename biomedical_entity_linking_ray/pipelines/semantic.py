"""Semantic (embedding-space) corpus curation: distributed k-means and
SemDeDup-style cluster-scoped near-duplicate pruning, plus a corpus-trained
bigram-LM quality score (the model-based filter slot of a CCNet-style
curation stack).

Reference analog: the repo's embedding rerank clusters candidate mentions by
dense similarity (bioel/bioel/models/*/candidate_generation, FAISS k-means in
data_process.py:517-562 for the IVF coarse quantizer); here the same
spherical-k-means machinery is expressed Ray-natively and reused for
corpus-level semantic dedup (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication") and the n-gram-LM
quality gate follows CCNet (Wenzek et al. 2020) with the external KenLM
replaced by a corpus-trained add-one-smoothed bigram model, so the whole
operator is closed-form and SQL-oracle-checkable.

Determinism contract (shared with the DuckDB oracles):
- centroid init = unit-normalized embeddings of the k smallest vec_ids;
- assignment = argmax cosine ROUNDED TO 4 DECIMALS, ties -> lowest centroid
  index (numpy argmax first-occurrence == SQL ROW_NUMBER ORDER BY cos DESC,
  cidx ASC);
- after each Lloyd update the re-normalized centroid is ROUNDED TO 6
  DECIMALS, so both sides iterate from bit-identical centroids and float
  summation order (distributed partial sums vs DuckDB AVG) cannot drift
  across iterations;
- an empty cluster keeps its previous centroid.

Scale shape: each Lloyd iteration is ONE streaming pass (map_batches emits
k partial-sum rows per batch; only k x 64 floats x n_batches reach the
driver); the centroid matrix is k x dim and travels by ray.put broadcast.
The SemDeDup in-cluster prune rides `within_key_pairs` (singleton-drop +
coarse-bucketed pair enumeration), so no cluster is ever materialized in one
task beyond `all_pairs_max` members -- the knob that subdivides hot clusters
at 10^12-doc scale (set high only in the oracle config, where the SQL
pairwise rule requires exhaustive in-cluster pairs).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from biomedical_entity_linking_ray.functions.vectors import list_column_to_matrix


# ---------------------------------------------------------------------------
# spherical k-means over the embeddings table
# ---------------------------------------------------------------------------

def _unitize_f64(vecs: np.ndarray) -> np.ndarray:
    v = vecs.astype(np.float64)
    n = np.linalg.norm(v, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return v / n


def _read_embeddings(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])


def _init_centroids(sf_dir: str, k: int) -> np.ndarray:
    """Unit-normalized embeddings of the k smallest vec_ids (row-group-pruned
    read -- at 100 TB the init touches one row group), rounded to 6."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "embeddings.parquet")
    t = pq.read_table(path, columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", k)])
    if t.num_rows < k:  # non-dense ids: full scan fallback (small data)
        t = pq.read_table(path, columns=["vec_id", "embedding"])
    df = t.to_pandas().sort_values("vec_id").head(k)
    X = np.array(list(df["embedding"]), dtype=np.float64)
    return np.round(_unitize_f64(X), 6)


def _cosine_to_centroids(unit: np.ndarray, C: np.ndarray) -> np.ndarray:
    """round(cos, 4) of unit rows vs (rounded, hence not exactly unit)
    centroids -- the full cosine formula, matching DuckDB's
    list_cosine_similarity on the same operands."""
    cn = np.linalg.norm(C, axis=1)
    cn[cn == 0] = 1.0
    return np.round((unit @ C.T) / cn[None, :], 4)


def kmeans_embeddings(
    sf_dir: str, k: int = 8, iters: int = 3,
) -> "ray.data.Dataset":
    """(vec_id, cluster_id, cosine): spherical-k-means assignment after
    `iters` Lloyd iterations under the module's determinism contract.

    Each iteration = one streaming pass: per batch, assign vectors to their
    nearest centroid and emit k rows of (cluster, count, component-sums);
    the driver folds those k x n_batches skinny rows into the next centroid
    matrix (k x dim doubles -- constant-size driver state) and re-broadcasts.
    """
    emb = _read_embeddings(sf_dir)
    return assign_to_centroids(emb, _kmeans_centroids(sf_dir, k, iters))


def assign_to_centroids(emb: "ray.data.Dataset", C: np.ndarray) -> "ray.data.Dataset":
    """Final assignment pass against a fixed centroid matrix (broadcast once)."""
    ref = ray.put(C)

    def fn(t: pa.Table) -> pa.Table:
        from biomedical_entity_linking_ray.functions.joins import cached_broadcast

        Cb = cached_broadcast(ref)
        unit = _unitize_f64(list_column_to_matrix(t["embedding"]))
        cos = _cosine_to_centroids(unit, Cb)
        assign = np.argmax(cos, axis=1)
        return pa.table({
            "vec_id": t["vec_id"],
            "cluster_id": pa.array(assign.astype(np.int64)),
            "cosine": pa.array(cos[np.arange(len(assign)), assign]),
        })

    return emb.map_batches(fn, batch_format="pyarrow", batch_size=4096)


def _kmeans_centroids(sf_dir: str, k: int, iters: int) -> np.ndarray:
    """The Lloyd loop (shared by kmeans_embeddings and semdedup): returns the
    final k x dim centroid matrix, rounded per the determinism contract."""
    emb = _read_embeddings(sf_dir)
    C = _init_centroids(sf_dir, k)
    dim = C.shape[1]
    for _ in range(iters):
        ref = ray.put(C)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            from biomedical_entity_linking_ray.functions.joins import cached_broadcast

            Cb = cached_broadcast(_ref)
            unit = _unitize_f64(list_column_to_matrix(t["embedding"]))
            assign = np.argmax(_cosine_to_centroids(unit, Cb), axis=1)
            sums = np.zeros((len(Cb), dim), dtype=np.float64)
            np.add.at(sums, assign, unit)
            cnt = np.bincount(assign, minlength=len(Cb)).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(len(Cb), dtype=np.int64)),
                "cnt": pa.array(cnt),
                "sums": pa.array(list(sums), pa.list_(pa.float64())),
            })

        parts = emb.map_batches(partial, batch_format="pyarrow",
                                batch_size=4096).to_pandas()
        sums = np.zeros((k, dim), dtype=np.float64)
        cnt = np.zeros(k, dtype=np.int64)
        for c, n, s in zip(parts["cluster"], parts["cnt"], parts["sums"]):
            sums[c] += np.asarray(s, dtype=np.float64)
            cnt[c] += n
        newC = C.copy()
        nz = cnt > 0
        mean = sums[nz] / cnt[nz, None]
        nrm = np.linalg.norm(mean, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        newC[nz] = np.round(mean / nrm, 6)
        C = newC
    return C


# ---------------------------------------------------------------------------
# SemDeDup: cluster-scoped embedding near-dup prune
# ---------------------------------------------------------------------------

def semdedup(
    sf_dir: str, k: int = 8, iters: int = 3, tau: float = 0.92,
    all_pairs_max: int = 4096, n_coarse: int | None = None,
    anti_broadcast_max: int = 2_000_000,
) -> "ray.data.Dataset":
    """(vec_id, cluster_id) of SURVIVING vectors: k-means the embedding
    space, then inside each cluster drop any vector whose cosine (rounded to
    4) to a LOWER-id cluster-mate is >= tau (the deterministic keep-lowest-id
    variant of SemDeDup's eps-ball pruning).

    Scale shape: the pair enumeration is `within_key_pairs` keyed on
    cluster_id with the unit vectors delivered as a payload table through the
    broadcast/enrich-once path -- clusters bigger than `all_pairs_max` fall
    back to sorted-neighborhood links at 10^12-doc scale (subdividing hot
    clusters; raise k instead when recall matters). The default here is
    exhaustive so the SQL pairwise oracle applies verbatim at test scale.
    The drop set is a skinny (vec_id) table removed with one vectorized
    anti-probe (broadcast while bounded).
    """
    from biomedical_entity_linking_ray.functions.candidate_pairs import within_key_pairs

    emb = _read_embeddings(sf_dir)
    C = _kmeans_centroids(sf_dir, k, iters)
    assigned = assign_to_centroids(emb, C).select_columns(["vec_id", "cluster_id"])

    def unitize(t: pa.Table) -> pa.Table:
        unit = _unitize_f64(list_column_to_matrix(t["embedding"]))
        return pa.table({
            "vec_id": t["vec_id"],
            "unit": pa.array([unit[i].tobytes() for i in range(len(unit))],
                             pa.binary()),
        })

    units = emb.map_batches(unitize, batch_format="pyarrow", batch_size=4096)
    assigned = assigned.materialize()  # reused: pair input + survivor base

    def emit(g: pd.DataFrame, ia: np.ndarray, ib: np.ndarray) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        U = np.frombuffer(b"".join(g["unit"].tolist()),
                          dtype=np.float64).reshape(len(g), -1)
        cos = np.round(np.einsum("ij,ij->i", U[ia], U[ib]), 4)
        keep = cos >= tau
        a, b = ids[ia[keep]], ids[ib[keep]]
        return pd.DataFrame({"drop_id": np.maximum(a, b)})

    dropped = within_key_pairs(
        assigned, "cluster_id", "vec_id", emit=emit,
        all_pairs_max=all_pairs_max, n_coarse=n_coarse,
        payload=units, payload_on="vec_id",
    )
    dropped = dropped.materialize()
    n_dropped = dropped.count()
    if n_dropped == 0:  # nothing within tau of a lower-id cluster-mate
        return assigned
    if n_dropped <= anti_broadcast_max:  # skinny id set: broadcast anti-probe
        drop_ids = dropped.to_pandas()["drop_id"].unique()
        drop_ref = ray.put(pa.array(np.sort(drop_ids), pa.int64()))

        def anti(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from biomedical_entity_linking_ray.functions.joins import cached_broadcast

            ks = cached_broadcast(drop_ref)
            return t.filter(pc.invert(pc.is_in(t["vec_id"], value_set=ks)))

        return assigned.map_batches(anti, batch_format="pyarrow")
    # 10^12-doc path: one partitioned anti join on the skinny drop table
    from biomedical_entity_linking_ray.functions.joins import hash_join

    uniq = dropped.map_batches(
        lambda t: t.rename_columns(["vec_id"]), batch_format="pyarrow")
    return hash_join(assigned, uniq, "left_anti", 8, on=("vec_id",))


# ---------------------------------------------------------------------------
# SQL oracles: the Lloyd loop is deterministic under the rounding contract,
# and every CTE is MATERIALIZED -- without it DuckDB re-inlines the chain at
# each reference and the unrolled iterations blow up combinatorially
# (measured at sf0.01: semdedup 352 s -> 0.4 s, kmeans 24 s -> 0.1 s).
# so the whole iteration unrolls into a closed-form CTE chain (same device as
# analytics._hll_sql oracling the sketch itself).
# ---------------------------------------------------------------------------

def _kmeans_cte(k: int, iters: int) -> str:
    """CTE chain ending in `afin(vec_id, cluster_id, cosine)` -- the exact
    unrolled spherical k-means under the module's determinism contract."""
    head = f"""
        uv AS MATERIALIZED (
            SELECT vec_id, emb,
                   CASE WHEN nrm = 0 THEN 1.0 ELSE nrm END AS nrm
            FROM (SELECT vec_id, embedding::DOUBLE[] AS emb,
                         sqrt(list_inner_product(embedding::DOUBLE[],
                                                 embedding::DOUBLE[])) AS nrm
                  FROM embeddings)
        ),
        up AS MATERIALIZED (
            SELECT vec_id, i, emb[i] / nrm AS u
            FROM (SELECT vec_id, emb, nrm,
                         unnest(range(1, len(emb) + 1)) AS i FROM uv)
        ),
        seeds AS MATERIALIZED (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cidx, vec_id
            FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})
        ),
        c0v AS MATERIALIZED (
            SELECT seeds.cidx, up.i, ROUND(up.u, 6) AS v
            FROM seeds JOIN up USING (vec_id)
        )"""
    parts = [head]
    for t in range(iters):
        c, a, cn = f"c{t}v", f"a{t + 1}", f"n{t + 1}"
        m, mn, cnew = f"m{t + 1}", f"mn{t + 1}", f"c{t + 1}v"
        parts.append(f"""
        {cn} AS MATERIALIZED (SELECT cidx, sqrt(SUM(v * v)) AS cnrm FROM {c} GROUP BY cidx),
        {a} AS MATERIALIZED (
            SELECT vec_id, cidx FROM (
                SELECT s.vec_id, s.cidx,
                       ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY
                           ROUND(s.dot / CASE WHEN n.cnrm = 0 THEN 1.0
                                              ELSE n.cnrm END, 4) DESC,
                           s.cidx ASC) AS rn
                FROM (SELECT up.vec_id, cv.cidx, SUM(up.u * cv.v) AS dot
                      FROM up JOIN {c} cv USING (i) GROUP BY 1, 2) s
                JOIN {cn} n USING (cidx)
            ) WHERE rn = 1
        ),
        {m} AS MATERIALIZED (
            SELECT {a}.cidx, up.i, AVG(up.u) AS mv
            FROM {a} JOIN up USING (vec_id) GROUP BY 1, 2
        ),
        {mn} AS MATERIALIZED (SELECT cidx, sqrt(SUM(mv * mv)) AS mnrm FROM {m} GROUP BY cidx),
        {cnew} AS MATERIALIZED (
            SELECT {m}.cidx, {m}.i,
                   ROUND(mv / CASE WHEN mnrm = 0 THEN 1.0 ELSE mnrm END, 6) AS v
            FROM {m} JOIN {mn} USING (cidx)
            UNION ALL
            SELECT cv.cidx, cv.i, cv.v FROM {c} cv
            WHERE cv.cidx NOT IN (SELECT cidx FROM {m})
        )""")
    c, cn = f"c{iters}v", "nfin"
    parts.append(f"""
        {cn} AS MATERIALIZED (SELECT cidx, sqrt(SUM(v * v)) AS cnrm FROM {c} GROUP BY cidx),
        afin AS MATERIALIZED (
            SELECT vec_id, cidx AS cluster_id, cos AS cosine FROM (
                SELECT s.vec_id, s.cidx,
                       ROUND(s.dot / CASE WHEN n.cnrm = 0 THEN 1.0
                                          ELSE n.cnrm END, 4) AS cos,
                       ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY
                           ROUND(s.dot / CASE WHEN n.cnrm = 0 THEN 1.0
                                              ELSE n.cnrm END, 4) DESC,
                           s.cidx ASC) AS rn
                FROM (SELECT up.vec_id, cv.cidx, SUM(up.u * cv.v) AS dot
                      FROM up JOIN {c} cv USING (i) GROUP BY 1, 2) s
                JOIN {cn} n USING (cidx)
            ) WHERE rn = 1
        )""")
    return ",".join(parts)


def kmeans_sql(k: int = 8, iters: int = 3) -> str:
    return ("WITH " + _kmeans_cte(k, iters)
            + "\n        SELECT vec_id, cluster_id, cosine FROM afin")


def semdedup_sql(k: int = 8, iters: int = 3, tau: float = 0.92) -> str:
    return ("WITH " + _kmeans_cte(k, iters) + f""",
        drops AS MATERIALIZED (
            SELECT DISTINCT b.vec_id
            FROM afin a JOIN afin b
              ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
            JOIN embeddings ea ON ea.vec_id = a.vec_id
            JOIN embeddings eb ON eb.vec_id = b.vec_id
            WHERE ROUND(list_cosine_similarity(ea.embedding::DOUBLE[],
                                               eb.embedding::DOUBLE[]), 4)
                  >= {tau}
        )
        SELECT vec_id, cluster_id FROM afin
        WHERE vec_id NOT IN (SELECT vec_id FROM drops)""")


LM_QUALITY_SQL = """
    WITH toks AS MATERIALIZED (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_]+') AS w
        FROM documents
    ),
    uni AS MATERIALIZED (
        SELECT w1, COUNT(*) AS cu
        FROM (SELECT unnest(w) AS w1 FROM toks) GROUP BY w1
    ),
    vocab AS MATERIALIZED (SELECT COUNT(*) AS v FROM uni),
    big AS MATERIALIZED (
        SELECT doc_id, w[i] AS w1, w[i] || ' ' || w[i + 1] AS gram
        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i FROM toks)
    ),
    bcnt AS MATERIALIZED (SELECT gram, COUNT(*) AS cb FROM big GROUP BY gram),
    scored AS MATERIALIZED (
        SELECT big.doc_id,
               ln((bcnt.cb + 1.0) / (uni.cu + vocab.v)) AS lp
        FROM big JOIN bcnt USING (gram) JOIN uni USING (w1) CROSS JOIN vocab
    )
    SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(AVG(lp), 4) AS lm_score
    FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# corpus-trained bigram-LM quality score (CCNet's KenLM slot, closed-form)
# ---------------------------------------------------------------------------

_LOWER_WORD = re.compile(r"[a-z0-9_]+")


def lm_quality(
    sf_dir: str, broadcast_max: int = 2_000_000, join_partitions: int = 8,
) -> "ray.data.Dataset":
    """(doc_id, n_bigrams, lm_score): per-document mean log-probability under
    an add-one-smoothed bigram LM trained on the corpus itself; docs with at
    least one bigram. lm_score = ROUND(AVG(ln((c(w1 w2)+1)/(c(w1)+V))), 4),
    V = distinct token count.

    Two streaming passes over `text`: (1) per-batch token/bigram value_counts
    are the combiner, merged exactly through `bucketed_aggregate` (the model
    shuffle carries (gram, partial_count) rows, never token streams);
    (2) scoring probes the two count tables per batch. The model tables ride
    a ray.put broadcast while within `broadcast_max` rows; beyond it each doc
    explodes to (doc_id, bigram) rows scored via two hash joins then a
    groupby-mean -- the 10^12-doc path, same bounded-broadcast-else-join
    convention as the rest of the engine.
    """
    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate

    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=["doc_id", "text"])

    def gram_partial(t: pa.Table) -> pa.Table:
        unis: list[str] = []
        bigs: list[str] = []
        for s in t["text"].to_pylist():
            w = _LOWER_WORD.findall(s.lower())
            unis.extend(w)
            bigs.extend(map(" ".join, zip(w, w[1:])))
        vu = pd.Series(unis).value_counts() if unis else pd.Series(dtype=np.int64)
        vb = pd.Series(bigs).value_counts() if bigs else pd.Series(dtype=np.int64)
        return pa.table({
            "gram": pa.array(np.concatenate([vu.index.to_numpy(dtype=object),
                                             vb.index.to_numpy(dtype=object)]),
                             pa.string()),
            "is_bigram": pa.array(np.concatenate([
                np.zeros(len(vu), dtype=bool), np.ones(len(vb), dtype=bool)])),
            "n": pa.array(np.concatenate([vu.to_numpy(np.int64),
                                          vb.to_numpy(np.int64)])),
        })

    counts = bucketed_aggregate(
        docs.select_columns(["text"]).map_batches(
            gram_partial, batch_format="pyarrow", batch_size=4096),
        ["gram", "is_bigram"], {"n": ("n", "sum")},
    ).materialize()

    uni = counts.filter(expr="is_bigram == False")
    n_vocab = uni.count()
    if counts.count() <= broadcast_max:
        cdf = counts.to_pandas()
        uni_map = dict(zip(cdf.loc[~cdf["is_bigram"], "gram"],
                           cdf.loc[~cdf["is_bigram"], "n"]))
        big_map = dict(zip(cdf.loc[cdf["is_bigram"], "gram"],
                           cdf.loc[cdf["is_bigram"], "n"]))
        model_ref = ray.put((uni_map, big_map))

        def score(t: pa.Table) -> pa.Table:
            from biomedical_entity_linking_ray.functions.joins import cached_broadcast

            um, bm = cached_broadcast(model_ref)
            ids, nb, sc = [], [], []
            for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                w = _LOWER_WORD.findall(s.lower())
                if len(w) < 2:
                    continue
                cu = np.array([um[a] for a in w[:-1]], dtype=np.float64)
                cb = np.array([bm[a + " " + b] for a, b in zip(w, w[1:])],
                              dtype=np.float64)
                lp = np.log((cb + 1.0) / (cu + float(n_vocab)))
                ids.append(d)
                nb.append(len(lp))
                sc.append(round(float(lp.mean()), 4))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "n_bigrams": pa.array(nb, pa.int64()),
                             "lm_score": pa.array(sc, pa.float64())})

        return docs.map_batches(score, batch_format="pyarrow", batch_size=4096)

    # 10^12-doc path: explode per-doc bigrams, join the model, groupby mean
    from biomedical_entity_linking_ray.functions.joins import hash_join

    def explode(t: pa.Table) -> pa.Table:
        ids, w1s, grams = [], [], []
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            w = _LOWER_WORD.findall(s.lower())
            for a, b in zip(w, w[1:]):
                ids.append(d)
                w1s.append(a)
                grams.append(a + " " + b)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "w1": pa.array(w1s, pa.string()),
                         "gram": pa.array(grams, pa.string())})

    pairs = docs.map_batches(explode, batch_format="pyarrow", batch_size=4096)
    big = counts.filter(expr="is_bigram == True") \
        .select_columns(["gram", "n"]).rename_columns(["gram", "cb"])
    unic = uni.select_columns(["gram", "n"]).rename_columns(["w1g", "cu"])
    j = hash_join(pairs, big, "inner", join_partitions, on=("gram",))
    j = hash_join(j, unic, "inner", join_partitions, on=("w1",), right_on=("w1g",))

    def lp(t: pa.Table) -> pa.Table:
        cb = t["cb"].to_numpy(zero_copy_only=False).astype(np.float64)
        cu = t["cu"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({
            "doc_id": t["doc_id"],
            "lp": pa.array(np.log((cb + 1.0) / (cu + float(n_vocab)))),
        })

    per_doc = bucketed_aggregate(
        j.map_batches(lp, batch_format="pyarrow"),
        ["doc_id"], {"n_bigrams": ("lp", "count"), "s": ("lp", "sum")})

    def fin(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        n = t["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"doc_id": t["doc_id"], "n_bigrams": t["n_bigrams"],
                         "lm_score": pa.array(np.round(s / n, 4))})

    return per_doc.map_batches(fin, batch_format="pyarrow")
