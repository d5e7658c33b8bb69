"""Stage 4 -- pairwise evaluation vs gold labeled pairs at shared blocking key.

The north rule's quality gate: pairwise F1 >= 0.99 on labeled pairs whose two
sides share at least one *logical* blocking key (reference analog: recall@k /
accuracy vs gold CUIs, bioel/bioel/evaluate.py:234-260 -- quality is measured
on the candidate-retrievable set, here the co-blocked set).

Logical co-blocking accounts for the physical pipeline transforms:
- exact contraction: two rows with the same content_sha share every key by
  definition (same representative);
- salting: `key#3` vs `key#7` are the same logical key (salt is partitioning,
  not semantics) -- suffixes are stripped before comparison.

The gold-pair table is small by construction (FIXTURES.md 2), so membership /
label lookups for exactly the gold ids are pulled via a broadcast semi-filter
(`ray.put` of the id set, vectorized `is_in` inside map_batches) -- no shuffle
of the big side.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from biomedical_entity_linking_ray.stages.blocking import strip_salt


def _filter_to_ids(ds: "ray.data.Dataset", cols: list[str], id_col: str, ids_ref) -> pd.DataFrame:
    def flt(t: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        mask = pc.is_in(t[id_col], value_set=pa.array(list(ids), pa.string()))
        return t.select(cols).filter(mask)

    return ds.map_batches(flt, batch_format="pyarrow").to_pandas()


def _gold_context(
    gold_pairs: pd.DataFrame,
    members: "ray.data.Dataset",
    block_rows: "ray.data.Dataset",
):
    """(rep_of, keys_of_rep) lookup tables restricted to the gold ids."""
    ids = set(gold_pairs["id_a"]) | set(gold_pairs["id_b"])
    ids_ref = ray.put(ids)
    mem_df = _filter_to_ids(members, ["file_id", "rep_id"], "file_id", ids_ref)
    rep_of = dict(zip(mem_df["file_id"], mem_df["rep_id"]))

    reps_ref = ray.put(set(rep_of.values()))
    blk_df = _filter_to_ids(block_rows, ["file_id", "block_key"], "file_id", reps_ref)
    keys_of: dict[str, set] = {}
    for f, k in zip(blk_df["file_id"], blk_df["block_key"]):
        keys_of.setdefault(f, set()).add(strip_salt(k))
    return rep_of, keys_of


def _co_blocked(a: str, b: str, rep_of: dict, keys_of: dict) -> bool:
    ra, rb = rep_of.get(a), rep_of.get(b)
    if ra is None or rb is None:
        return False
    if ra == rb:  # identical content: same key set by definition
        return True
    return bool(keys_of.get(ra, set()) & keys_of.get(rb, set()))


def pairwise_f1(
    gold_pairs: pd.DataFrame,          # id_a, id_b, label (small, driver-side)
    assignments: "ray.data.Dataset",   # file_id, cluster_id
    block_rows: "ray.data.Dataset",    # block_key, file_id (reps, post-salting)
    members: "ray.data.Dataset",       # file_id, rep_id
) -> dict:
    rep_of, keys_of = _gold_context(gold_pairs, members, block_rows)

    ids = set(gold_pairs["id_a"]) | set(gold_pairs["id_b"])
    ids_ref = ray.put(ids)
    lab_df = _filter_to_ids(assignments, ["file_id", "cluster_id"], "file_id", ids_ref)
    label_of = dict(zip(lab_df["file_id"], lab_df["cluster_id"]))

    # F1 on labeled pairs AT A SHARED LOGICAL BLOCKING KEY (the north rule's
    # conditioning); positives never co-blocked are tracked separately in
    # `missed_by_blocking` / `f1_strict`.
    tp = fp = fn = tn = 0
    missed_by_blocking = 0
    n_evaluable = 0
    for a, b, lbl in zip(gold_pairs["id_a"], gold_pairs["id_b"], gold_pairs["label"]):
        if not _co_blocked(a, b, rep_of, keys_of):
            if lbl == 1:
                missed_by_blocking += 1
            continue
        n_evaluable += 1
        pred = label_of.get(a) is not None and label_of.get(a) == label_of.get(b)
        if pred and lbl == 1:
            tp += 1
        elif pred and lbl == 0:
            fp += 1
        elif not pred and lbl == 1:
            fn += 1
        else:
            tn += 1

    def _prf(tp_, fp_, fn_):
        p = tp_ / (tp_ + fp_) if tp_ + fp_ else 1.0
        r = tp_ / (tp_ + fn_) if tp_ + fn_ else 1.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        return p, r, f

    precision, recall, f1 = _prf(tp, fp, fn)
    _, recall_strict, f1_strict = _prf(tp, fp, fn + missed_by_blocking)
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "missed_by_blocking": missed_by_blocking,
        "n_gold": len(gold_pairs), "n_evaluable": n_evaluable,
        "precision": precision, "recall": recall, "f1": f1,
        "recall_strict": recall_strict, "f1_strict": f1_strict,
    }


def pairwise_f1_by_group(
    gold_pairs: pd.DataFrame,
    assignments: "ray.data.Dataset",
    block_rows: "ray.data.Dataset",
    members: "ray.data.Dataset",
    group_col: str = "lang",
) -> pd.DataFrame:
    """Per-group pairwise metrics (reference A7: per-type error analysis,
    bioel/bioel/evaluate.py:686-874 -- grouped sizes + per-group accuracy).

    A gold pair belongs to group g if both sides carry g in `group_col` (from
    the assignments lineage columns); mixed pairs report under 'mixed'.
    Returns one row per group: n / tp / fp / fn / precision / recall / f1.
    """
    rep_of, keys_of = _gold_context(gold_pairs, members, block_rows)

    ids = set(gold_pairs["id_a"]) | set(gold_pairs["id_b"])
    ids_ref = ray.put(ids)
    lab_df = _filter_to_ids(
        assignments, ["file_id", "cluster_id", group_col], "file_id", ids_ref)
    label_of = dict(zip(lab_df["file_id"], lab_df["cluster_id"]))
    group_of = dict(zip(lab_df["file_id"], lab_df[group_col]))

    counts: dict[str, dict] = {}
    for a, b, lbl in zip(gold_pairs["id_a"], gold_pairs["id_b"], gold_pairs["label"]):
        if not _co_blocked(a, b, rep_of, keys_of):
            continue
        ga, gb = group_of.get(a), group_of.get(b)
        g = ga if ga == gb else "mixed"
        c = counts.setdefault(g, {"n": 0, "tp": 0, "fp": 0, "fn": 0})
        c["n"] += 1
        pred = label_of.get(a) is not None and label_of.get(a) == label_of.get(b)
        if pred and lbl == 1:
            c["tp"] += 1
        elif pred and lbl == 0:
            c["fp"] += 1
        elif not pred and lbl == 1:
            c["fn"] += 1

    rows = []
    for g in sorted(counts, key=str):
        c = counts[g]
        p = c["tp"] / (c["tp"] + c["fp"]) if c["tp"] + c["fp"] else 1.0
        r = c["tp"] / (c["tp"] + c["fn"]) if c["tp"] + c["fn"] else 1.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        rows.append({"group": g, **c, "precision": p, "recall": r, "f1": f})
    return pd.DataFrame(rows)


def blocking_recall(
    gold_pairs: pd.DataFrame,
    block_rows: "ray.data.Dataset",
    members: "ray.data.Dataset",
) -> float:
    """Fraction of gold positives whose sides share >= 1 logical block key."""
    pos = gold_pairs[gold_pairs["label"] == 1]
    if len(pos) == 0:
        return 1.0
    rep_of, keys_of = _gold_context(pos, members, block_rows)
    hits = sum(
        1 for a, b in zip(pos["id_a"], pos["id_b"])
        if _co_blocked(a, b, rep_of, keys_of)
    )
    return hits / len(pos)


#: the reference's sentinel for "gold id absent from the candidate list"
#: (bioel/bioel/evaluate.py:299 treats it as an out-of-range hit index).
MISS_SENTINEL = 1_000_000


def _chi2_stat(obs) -> tuple[float, int]:
    """Pearson chi-square statistic + dof for an r x c contingency table
    (scipy.chi2_contingency semantics: Yates continuity correction applied
    only when dof == 1; p-value omitted -- no chi2 CDF in this container,
    and none in the SQL oracle either)."""
    import numpy as np

    obs = np.asarray(obs, dtype=np.float64)
    total = obs.sum()
    exp = obs.sum(axis=1, keepdims=True) * obs.sum(axis=0, keepdims=True) / total
    dof = (obs.shape[0] - 1) * (obs.shape[1] - 1)
    diff = np.abs(obs - exp)
    if dof == 1:
        diff = np.clip(diff - 0.5, 0.0, None)
    return float((diff * diff / exp).sum()), dof


def detailed_type_report(preds: "ray.data.Dataset", k: int = 5) -> pa.Table:
    """A7 per-type statistical report (ref bioel/bioel/evaluate.py:686-874).

    Input: per-mention results `(mention_id, type, hit_index)` where
    `hit_index` is the 0-based rank of the gold id in the candidate list
    (0 = top-1 correct, MISS_SENTINEL = not retrieved at all).

    One streaming pass computes per-batch PARTIAL per-type counts
    (vectorized masks, no Python row loop), a tiny groupby-sum merges them,
    and the chi-square statistics over the CG / NED contingency crosstabs
    are computed on the |types|-row result. Per-type columns mirror the
    reference: success (hit==0), hit@k (hit<k), CG miss (hit>k), NED miss
    (0<hit<=k), the CG/NED crosstab cells, accuracy and recall@k
    (quantized to 1e-4 as `*_q4` integers for cross-engine hash stability),
    plus the table-wide chi2_cg_q4 / chi2_ned_q4 / dof constants.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        hit = t["hit_index"].to_numpy(zero_copy_only=False).astype(np.int64)
        typ = np.asarray(t["type"].to_pylist(), dtype=object)
        cats, codes = np.unique(typ, return_inverse=True)
        n_cat = len(cats)

        def seg(mask) -> np.ndarray:
            return np.bincount(codes[mask], minlength=n_cat).astype(np.int64)

        ones = np.ones_like(hit, dtype=bool)
        return pa.table({
            "type": pa.array(cats.tolist(), pa.string()),
            "n_mentions": pa.array(seg(ones)),
            "n_success": pa.array(seg(hit == 0)),
            "n_hit_k": pa.array(seg(hit < k)),
            "n_miss_cg": pa.array(seg(hit > k)),
            "n_miss_ned": pa.array(seg((hit <= k) & (hit != 0))),
            "cg_hit": pa.array(seg(hit != MISS_SENTINEL)),
        })

    agg = (preds.map_batches(partial, batch_format="pyarrow")
           .groupby("type")
           .aggregate(*[Sum(c, alias_name=c) for c in
                        ("n_mentions", "n_success", "n_hit_k",
                         "n_miss_cg", "n_miss_ned", "cg_hit")]))
    # |types| rows: driver-side finish is O(types), not O(corpus)
    df = agg.to_pandas().sort_values("type").reset_index(drop=True)

    n = df["n_mentions"].to_numpy(dtype=np.int64)
    cg_hit = df["cg_hit"].to_numpy(dtype=np.int64)
    ned_hit = df["n_success"].to_numpy(dtype=np.int64)
    chi2_cg, dof = _chi2_stat(np.stack([n - cg_hit, cg_hit], axis=1))
    chi2_ned, _ = _chi2_stat(np.stack([n - ned_hit, ned_hit], axis=1))

    def q4(x) -> np.ndarray:
        return np.floor(np.asarray(x, dtype=np.float64) * 10000 + 0.5).astype(np.int64)

    out = df.copy()
    out["cg_miss"] = n - cg_hit
    out["ned_hit"] = ned_hit
    out["ned_miss"] = n - ned_hit
    out["accuracy_q4"] = q4(df["n_success"] / n)
    out["recall_k_q4"] = q4(df["n_hit_k"] / n)
    out["chi2_cg_q4"] = q4(chi2_cg)
    out["chi2_ned_q4"] = q4(chi2_ned)
    out["dof"] = np.int64(dof)
    return pa.Table.from_pandas(out, preserve_index=False)


def precision_report(preds: "ray.data.Dataset", ks: tuple = (1, 2, 3, 4, 5)) -> pa.Table:
    """A7 ranking metrics (ref bioel/bioel/evaluate.py:288-351): for each k,
    precision@k (reference definition: hits-within-k / (k*n)), the 'DK'
    variant (hits-within-k / n), and MAP@k (mean of 1/(hit_index+1) when the
    gold id is within the top k, else 0).

    Streaming partial sums per batch; the MAP numerator is accumulated as an
    INTEGER (60 // (hit+1), exact for k <= 5 since hit+1 divides 60) so
    cross-batch addition order cannot perturb the float result -- the same
    trick the SQL oracle uses. Ratios are quantized to `*_q4` integers.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    ks = tuple(sorted(ks))
    if max(ks) > 5:
        raise ValueError("precision_report supports k <= 5 (exact-int MAP trick)")

    def partial(t: pa.Table) -> pa.Table:
        hit = t["hit_index"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows_n, rows_hits, rows_ap = [], [], []
        for k in ks:
            mask = hit < k
            rows_n.append(len(hit))
            rows_hits.append(int(mask.sum()))
            rows_ap.append(int((60 // (hit[mask] + 1)).sum()))
        return pa.table({
            "k": pa.array(list(ks), pa.int64()),
            "n": pa.array(rows_n, pa.int64()),
            "hits": pa.array(rows_hits, pa.int64()),
            "ap60": pa.array(rows_ap, pa.int64()),
        })

    agg = (preds.map_batches(partial, batch_format="pyarrow")
           .groupby("k")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("hits", alias_name="hits"),
                      Sum("ap60", alias_name="ap60")))
    df = agg.to_pandas().sort_values("k").reset_index(drop=True)

    k_arr = df["k"].to_numpy(dtype=np.int64)
    n = df["n"].to_numpy(dtype=np.int64)
    hits = df["hits"].to_numpy(dtype=np.int64)
    ap60 = df["ap60"].to_numpy(dtype=np.int64)

    def q4(x) -> np.ndarray:
        return np.floor(np.asarray(x, dtype=np.float64) * 10000 + 0.5).astype(np.int64)

    return pa.table({
        "k": pa.array(k_arr),
        "n_mentions": pa.array(n),
        "precision_q4": pa.array(q4(hits / (k_arr * n))),
        "precision_dk_q4": pa.array(q4(hits / n)),
        "map_q4": pa.array(q4(ap60 / 60.0 / n)),
    })


def recall_matrix(
    gold: "ray.data.Dataset",
    runs: "dict[str, ray.data.Dataset]",
    ks: tuple = (1, 3, 5),
    broadcast_gold_max: int = 2_000_000,
) -> "ray.data.Dataset":
    """Joint multi-run evaluation report: (model, k, recall, n_mentions).

    The reference's `Evaluate` harness loads N models' per-mention candidate
    lists, joins them to the gold table by mention_id and reports a
    per-model recall@k matrix (bioel/bioel/evaluate.py:410-588 load_results /
    process_datasets / evaluate; recall math as in evaluate.py:234-260).
    Re-expressed Ray-Data-first:

    - `gold(mention_id, gold_id)` is broadcast while it fits (`ray.put` once,
      worker-cached index, vectorized reindex per batch); hash join beyond;
    - each run `preds(mention_id, candidates list<str> best-first)` streams
      through ONE map_batches computing per-batch PARTIAL hit counts per k
      (combiner), merged by a tiny groupby-sum -- no full materialization;
    - mentions absent from gold are dropped (the reference's dict-lookup
      semantics); mentions absent from a run count as misses at every k,
      via the n_mentions denominator taken from gold.
    """
    import numpy as np

    import ray as _ray
    from ray.data.aggregate import Sum

    from biomedical_entity_linking_ray.functions.joins import cached_broadcast, hash_join

    gold = gold.materialize()
    n_gold = gold.count()
    use_bcast = n_gold <= broadcast_gold_max
    gold_ref = _ray.put(gold.to_pandas()) if use_bcast else None
    ks = tuple(sorted(ks))

    parts = []
    for model, preds in runs.items():
        if use_bcast:
            def attach(t: pa.Table) -> pa.Table:
                g = cached_broadcast(
                    gold_ref, lambda d: d.set_index("mention_id")["gold_id"])
                df = t.select(["mention_id", "candidates"]).to_pandas()
                df["gold_id"] = g.reindex(df["mention_id"]).to_numpy()
                df = df[df["gold_id"].notna()]
                return pa.Table.from_pandas(df, preserve_index=False)

            joined = preds.map_batches(attach, batch_format="pyarrow")
        else:
            joined = hash_join(preds, gold, "inner", 16, on=("mention_id",))

        def partial(t: pa.Table, model=model) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.table({"model": pa.array([], pa.string()),
                                 "k": pa.array([], pa.int64()),
                                 "hits": pa.array([], pa.int64())})
            cands = t["candidates"].to_pylist()
            golds = t["gold_id"].to_pylist()
            hits = np.zeros(len(ks), dtype=np.int64)
            for cl, gid in zip(cands, golds):
                cl = cl or []
                for j, k in enumerate(ks):
                    if gid in cl[:k]:
                        hits[j] += 1
            return pa.table({
                "model": pa.array([model] * len(ks), pa.string()),
                "k": pa.array(list(ks), pa.int64()),
                "hits": pa.array(hits),
            })

        parts.append(joined.map_batches(partial, batch_format="pyarrow"))

    merged = parts[0]
    for p in parts[1:]:
        merged = merged.union(p)
    summed = merged.groupby(["model", "k"]).aggregate(Sum("hits", alias_name="hits"))

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rec = pc.round(pc.divide(pc.cast(t["hits"], pa.float64()),
                                 float(max(n_gold, 1))), ndigits=4)
        return pa.table({
            "model": t["model"], "k": t["k"], "recall": rec,
            "n_mentions": pa.array(np.full(t.num_rows, n_gold, dtype=np.int64)),
        })

    return summed.map_batches(finish, batch_format="pyarrow")
