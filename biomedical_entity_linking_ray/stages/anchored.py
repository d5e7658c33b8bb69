"""Anchored-cluster partition (reference G2): every cluster keeps >= 1 anchor.

The reference's joint-graph inference guarantees that each final cluster
contains at least one dictionary ENTITY: edges are processed in ascending
score order and greedily dropped, an edge surviving only if dropping it would
leave one of its endpoints unable to reach any entity
(special_partition.pyx:288-356 -- tentative drop + per-endpoint
reachability DFS, restore on failure); the evaluation asserts the invariant
outright (eval_cluster_linking.py:253-255). Before the greedy sweep the
undirected graph is pre-filtered to its maximum spanning forest
(special_partition.pyx:392-397).

Ray-native shape: clusters are independent, so the sequential greedy runs
PER COARSE COMPONENT inside one bucketed `groupby().map_groups` -- the same
partitioning contract as stages/mst.py (a cluster never spans buckets; the
kernel is vectorized sort + union-find, not per-row Python dicts). Instead
of the reference's O(E * V) drop-and-DFS loop, the kernel fuses Kruskal and
the greedy refinement into ONE descending-score union-find sweep:

    for each edge, best score first:
        if endpoints not yet MST-connected:        # it is a forest edge
            if both refined components already hold an anchor: REFUSE
            else: union, merging anchor counts

Refusing a merge of two anchored components is exactly the ascending greedy
drop on the spanning forest: an edge is dropped iff both of its forest sides
(under all higher-score kept edges) contain an anchor -- the constrained
single-linkage dendrogram cut. `tests/test_anchored.py` property-checks this
fused sweep against a literal transcription of the reference's
ascending-drop-with-reachability loop on randomized graphs, and pins the
no-anchorless-cluster invariant.

Components with NO anchor at all are left intact as one cluster (no drop can
ever satisfy reachability there -- same fixed point as the reference loop).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from biomedical_entity_linking_ray.functions import hashing
from biomedical_entity_linking_ray.functions.joins import (
    cached_broadcast,
    hash_join,
    heal_projection,
)

_OUT = pa.schema([
    ("file_id", pa.string()), ("cluster_id", pa.string()),
    ("canonical_id", pa.string()),
])


def refine_component(
    ids_a: np.ndarray, ids_b: np.ndarray, scores: np.ndarray,
    is_anchor: "dict | set | None", nodes: np.ndarray,
) -> np.ndarray:
    """One component's fused sweep: returns the refined-cluster root INDEX
    (into `nodes`) per node. `nodes` must contain every edge endpoint;
    `is_anchor` is a membership test over node values. Exposed for the
    property test; the distributed kernel below inlines the same logic over
    whole buckets."""
    pos = {v: i for i, v in enumerate(nodes)}
    ea = np.fromiter((pos[v] for v in ids_a), np.int64, len(ids_a))
    eb = np.fromiter((pos[v] for v in ids_b), np.int64, len(ids_b))
    n = len(nodes)
    anchored = np.fromiter(
        ((v in is_anchor) for v in nodes), bool, n) if is_anchor else \
        np.zeros(n, bool)
    order = np.lexsort((ids_b, ids_a, -scores))
    mst_parent = np.arange(n, dtype=np.int64)
    ref_parent = np.arange(n, dtype=np.int64)
    anchors_in = anchored.astype(np.int64).copy()

    def find(parent: np.ndarray, x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in order.tolist():
        a, b = int(ea[i]), int(eb[i])
        ma, mb = find(mst_parent, a), find(mst_parent, b)
        if ma == mb:
            continue  # cycle edge: the MST prefilter discards it
        mst_parent[mb] = ma
        ra, rb = find(ref_parent, a), find(ref_parent, b)
        if ra == rb:
            continue
        if anchors_in[ra] > 0 and anchors_in[rb] > 0:
            continue  # REFUSED: the ascending-greedy drop of this edge
        ref_parent[rb] = ra
        anchors_in[ra] += anchors_in[rb]
    return np.fromiter((find(ref_parent, i) for i in range(n)), np.int64, n)


def exact_bond_edges(
    members: "ray.data.Dataset", score: float = 2.0,
) -> "ray.data.Dataset":
    """members(file_id, rep_id) -> (id_a=rep, id_b=member, score) for every
    exact-duplicate member (file_id != rep_id).

    Bond score 2.0 > any real pair score (scores are <= 1.0), so the
    descending sweep processes bonds first: identical-content rows ride
    with their contraction rep unless both sides are already anchored --
    the one case the greedy may split, keeping each anchor its own
    cluster. Union these with the scored pairs to give the partition full
    node coverage (contracted members never appear in the scored stream)."""
    import pyarrow.compute as pc

    def bonds(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(pc.equal(t["file_id"], t["rep_id"])))
        return pa.table({
            "id_a": t["rep_id"], "id_b": t["file_id"],
            "score": pa.array(np.full(t.num_rows, score), pa.float64())})

    return members.select_columns(["file_id", "rep_id"]).map_batches(
        bonds, batch_format="pyarrow")


def anchored_partition(
    edges: "ray.data.Dataset",
    assignments: "ray.data.Dataset",
    anchors: "ray.data.Dataset",
    n_buckets: int | None = None,
    anchor_broadcast_max: int = 2_000_000,
    broadcast_labels_max: int = 2_000_000,
    join_partitions: int = 16,
) -> "ray.data.Dataset":
    """edges(id_a, id_b, score) x assignments(file_id, cluster_id) x
    anchors(file_id) -> (file_id, cluster_id, canonical_id) where every
    output cluster whose coarse component held an anchor retains >= 1 anchor.

    cluster_id is the lexicographic min member (the repo-wide canonical
    labeling convention); canonical_id is the min ANCHOR member, falling
    back to the min member for anchorless components.

    Scale shape: anchor membership broadcasts as a key set under
    `anchor_broadcast_max` (dictionary tables are small relative to the
    corpus) and attaches via hash join beyond; coarse labels reach edges the
    same way (`broadcast_labels_max`); one bucket shuffle on
    hash(cluster_id) co-locates each component; edgeless nodes never enter
    the shuffle (map-side anti filter against edge endpoints is unnecessary
    -- they are exactly the rows whose cluster has one member, recovered by
    a second skinny pass over assignments)."""
    from biomedical_entity_linking_ray.config import default_buckets

    n_buckets = n_buckets or default_buckets()
    skinny = edges.select_columns(["id_a", "id_b", "score"])

    # ---- attach the coarse component label to each edge (on id_a: both
    # endpoints share the component by construction)
    lab = assignments.select_columns(["file_id", "cluster_id"]).materialize()
    if lab.count() <= broadcast_labels_max:
        lab_df = lab.to_pandas()
        lab_ref = ray.put(dict(zip(lab_df["file_id"], lab_df["cluster_id"])))

        def attach(t: pa.Table) -> pa.Table:
            m = cached_broadcast(lab_ref)
            cl = [m.get(x) for x in t["id_a"].to_pylist()]
            keep = pa.array([c is not None for c in cl])
            return pa.table({
                "cluster_id": pa.array(cl, pa.string()),
                "id_a": t["id_a"], "id_b": t["id_b"], "score": t["score"],
            }).filter(keep)

        tagged = skinny.map_batches(attach, batch_format="pyarrow")
    else:
        sch = pa.schema([
            ("cluster_id", pa.string()), ("id_a", pa.string()),
            ("id_b", pa.string()), ("score", pa.float64())])
        tagged = hash_join(
            skinny, lab, "inner", join_partitions,
            on=("id_a",), right_on=("file_id",),
        ).map_batches(
            heal_projection(sch, lambda t: t.select(sch.names)),
            batch_format="pyarrow")

    # pin the skinny tagged stream ONCE: both the refine kernel and the
    # singleton anti pass consume it (the anti's bloom build scans its
    # filter side twice more), and the caller's edge lineage may itself be
    # the job's largest all-to-all left deliberately lazy (linkage.py's
    # scored-pair dedup) -- without this pin that shuffle would re-execute
    # per consumer
    tagged = tagged.materialize()
    if tagged.count() == 0:
        # no refinable edges: every assignment passes through unchanged
        # (also dodges the empty-block stale-schema join quirk downstream)
        return lab.map_batches(
            heal_projection(_OUT, lambda t: pa.table({
                "file_id": t["file_id"], "cluster_id": t["cluster_id"],
                "canonical_id": t["cluster_id"],
            })),
            batch_format="pyarrow")

    # ---- anchor membership flags per endpoint
    anc = anchors.select_columns(["file_id"]).materialize()
    n_anchors = anc.count()
    if n_anchors <= anchor_broadcast_max:
        # empty-table to_pandas drops columns -- broadcast the empty set
        anc_ref = ray.put(frozenset(
            anc.to_pandas()["file_id"]) if n_anchors else frozenset())

        def flag(t: pa.Table) -> pa.Table:
            s = cached_broadcast(anc_ref)
            aa = [x in s for x in t["id_a"].to_pylist()]
            ab = [x in s for x in t["id_b"].to_pylist()]
            return t.append_column("anchor_a", pa.array(aa)) \
                    .append_column("anchor_b", pa.array(ab))

        flagged = tagged.map_batches(flag, batch_format="pyarrow")
    else:
        # corpus-scale anchor table: two indicator left joins, one per side
        def mark(col_out: str):
            def fn(t: pa.Table) -> pa.Table:
                return t.append_column(col_out, pa.array(
                    np.ones(t.num_rows, dtype=bool)))
            return fn

        marked = anc.map_batches(mark("__hit"), batch_format="pyarrow")
        flagged = tagged
        for side in ("a", "b"):
            flagged = hash_join(
                flagged, marked, "left_outer", join_partitions,
                on=(f"id_{side}",), right_on=("file_id",),
            ).map_batches(
                lambda t, s=side: t.append_column(
                    f"anchor_{s}", t["__hit"].combine_chunks().fill_null(False)
                ).drop_columns(
                    [c for c in ("__hit", "file_id") if c in t.column_names]),
                batch_format="pyarrow")

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hashing.fnv1a_fixed(
            t["cluster_id"].to_numpy(zero_copy_only=False), width=96)
        return t.append_column("__bucket", pa.array(
            (h % np.uint64(n_buckets)).astype(np.int64)))

    def refine(g: pd.DataFrame) -> pd.DataFrame:
        # one factorization serves every component in the bucket: edges of
        # different components can never union (disjoint node sets), so a
        # single pair of union-find arrays is safe -- the per_cluster_mst
        # contract
        if not len(g):
            return pd.DataFrame({c: pd.Series(dtype=object)
                                 for c in _OUT.names})
        codes, uniques = pd.factorize(
            pd.concat([g["id_a"], g["id_b"]], ignore_index=True), sort=False)
        n = len(uniques)
        ea, eb = codes[: len(g)], codes[len(g):]
        anchored = np.zeros(n, dtype=bool)
        anchored[ea[g["anchor_a"].to_numpy()]] = True
        anchored[eb[g["anchor_b"].to_numpy()]] = True
        uniq = uniques.to_numpy()
        order = np.lexsort(
            (g["id_b"].to_numpy(), g["id_a"].to_numpy(),
             -g["score"].to_numpy()))
        mst_parent = np.arange(n, dtype=np.int64)
        ref_parent = np.arange(n, dtype=np.int64)
        anchors_in = anchored.astype(np.int64).copy()

        def find(parent: np.ndarray, x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(ea[order].tolist(), eb[order].tolist()):
            ma, mb = find(mst_parent, a), find(mst_parent, b)
            if ma == mb:
                continue
            mst_parent[mb] = ma
            ra, rb = find(ref_parent, a), find(ref_parent, b)
            if ra == rb:
                continue
            if anchors_in[ra] > 0 and anchors_in[rb] > 0:
                continue
            ref_parent[rb] = ra
            anchors_in[ra] += anchors_in[rb]

        roots = np.fromiter(
            (find(ref_parent, i) for i in range(n)), np.int64, n)
        out = pd.DataFrame({"file_id": uniq, "__root": roots,
                            "__anchor": anchored})
        # min member = cluster label; min anchor member = canonical
        grp = out.groupby("__root")
        cl = grp["file_id"].min().rename("cluster_id")
        canon = out[out["__anchor"]].groupby("__root")["file_id"].min() \
            .rename("canonical_id")
        lab = pd.concat([cl, canon], axis=1)
        lab["canonical_id"] = lab["canonical_id"].fillna(lab["cluster_id"])
        out = out.merge(lab, left_on="__root", right_index=True)
        return out[["file_id", "cluster_id", "canonical_id"]]

    refined = flagged.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(refine, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow")  # normalize block
    # type to Arrow so downstream union/sort never mixes pandas+arrow blocks

    # ---- edgeless nodes (singleton coarse clusters) pass through unchanged
    def singles_of(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.equal(t["file_id"], t["cluster_id"])
        # a node equal to its own label is a singleton ONLY if nothing else
        # shares the label; multi-member clusters are fully re-emitted by the
        # kernel (their min member included), so re-emitting the min here
        # would duplicate it -- filter to labels absent from the edge stream
        return t.filter(keep)

    lab_sing = lab.map_batches(singles_of, batch_format="pyarrow")
    # drop label-min rows whose cluster actually has edges (they were
    # re-emitted by the kernel): anti join on cluster_id against edge labels
    edge_labels = tagged.select_columns(["cluster_id"])
    from biomedical_entity_linking_ray.functions.joins import bloom_anti_join

    singles = bloom_anti_join(
        lab_sing, edge_labels, "cluster_id", "cluster_id",
        num_partitions=join_partitions,
    ).map_batches(
        heal_projection(_OUT, lambda t: pa.table({
            "file_id": t["file_id"], "cluster_id": t["cluster_id"],
            "canonical_id": t["file_id"],
        })),
        batch_format="pyarrow")

    return refined.union(singles)
