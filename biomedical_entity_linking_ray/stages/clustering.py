"""Stage 3 -- transitive clustering: distributed connected components.

The reference collapses the scored edge graph with single-node scipy
`connected_components` + a Cython greedy partition
(eval_cluster_linking.py:90-146, special_partition.pyx:288-356). That cannot
hold a 10^12-node edge list in one process, so this stage is a distributed
min-label propagation with pointer jumping:

- state: labels Dataset ``(node, label)``, initialized label = node;
- propagate round: every node takes the min label over itself and its
  neighbors (one hash join edges><labels + one groupby-min);
- pointer-jump round: label <- label(label) (labels self-join), giving
  O(log diameter) convergence on chain-shaped blocks from windowed pair
  generation;
- convergence: order-independent XOR checksum of (node,label) repeated
  between rounds (cheap single-row-per-batch reduce).

The final label IS the component's minimum file_id, i.e. the canonical
representative (reference analog: `analyzeClusters` picks the lowest-index
entity per component, eval_cluster_linking.py:186-219).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from biomedical_entity_linking_ray.config import LinkageConfig, effective_partitions
from biomedical_entity_linking_ray.functions import hashing
from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate
from biomedical_entity_linking_ray.functions.joins import hash_join, heal_projection
from ray.data.aggregate import Min


_NODE_CAND = pa.schema([("node", pa.string()), ("cand", pa.string())])
_NODE_LABEL = pa.schema([("node", pa.string()), ("label", pa.string())])
_ASSIGN3 = pa.schema([
    ("file_id", pa.string()), ("cluster_id", pa.string()), ("canonical_id", pa.string()),
])


def _bidirect(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """(id_a,id_b) -> (node,nbr) in both directions."""

    def fwd(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["id_a"], "nbr": t["id_b"]})

    def rev(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["id_b"], "nbr": t["id_a"]})

    e = edges.select_columns(["id_a", "id_b"])
    return e.map_batches(fwd, batch_format="pyarrow").union(
        e.map_batches(rev, batch_format="pyarrow")
    )


def _checksum(labels: "ray.data.Dataset") -> int:
    """Order-independent XOR of fnv64(node|label) -- equal checksums across a
    round imply (whp) no label changed."""

    def batch_xor(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"x": pa.array([0], pa.uint64())})
        joined = (t["node"].to_pandas() + "|" + t["label"].to_pandas()).to_numpy()
        h = hashing.fnv1a_fixed(joined, width=130)  # 64+1+64 sha-hex ids + pad
        x = np.bitwise_xor.reduce(h)
        return pa.table({"x": pa.array([int(x)], pa.uint64())})

    acc = 0
    for row in labels.map_batches(batch_xor, batch_format="pyarrow").take_all():
        acc ^= int(row["x"])
    return acc


def _driver_union_find(
    skinny_edges: "ray.data.Dataset",
    nodes: "ray.data.Dataset",
    cfg: LinkageConfig,
) -> "ray.data.Dataset":
    """In-memory union-find over a small residual edge list; singletons via
    the same anti-join as the distributed path.

    Ids are factorized to dense ints (vectorized) so the sequential union
    loop runs over numpy int arrays with path halving -- no per-edge dict
    lookups on 64-char strings."""
    import pandas as pd

    edf = skinny_edges.to_pandas()
    codes, uniques = pd.factorize(
        pd.concat([edf["id_a"], edf["id_b"]], ignore_index=True), sort=False)
    n = len(uniques)
    ea = codes[: len(edf)]
    eb = codes[len(edf):]
    # min-id root keeps canonical semantics: order ids so the lexicographically
    # smaller member of each union becomes the root
    uniq = uniques.to_numpy()
    order = np.argsort(uniq)              # rank[i] = lexicographic rank of id i
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in zip(ea, eb):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rank[ra] <= rank[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
    labels = ray.data.from_arrow(pa.table({
        "node": pa.array(uniq, pa.string()),
        "label": pa.array(uniq[roots], pa.string()),
    })).materialize()

    clustered = labels.map_batches(
        lambda t: pa.table({
            "file_id": t["node"], "cluster_id": t["label"],
            "canonical_id": t["label"],
        }),
        batch_format="pyarrow",
    )
    # singletons: within the driver-bounded fast path the labeled-node set is
    # small by construction -- broadcast it once and anti-filter per batch
    # (no join barrier); the distributed path below keeps the anti join
    import pyarrow.compute as pc

    labeled_ref = ray.put(pa.array(uniq, pa.string()))

    def anti(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(t["file_id"], value_set=ray.get(labeled_ref)))
        t = t.filter(mask)
        return pa.table({
            "file_id": t["file_id"], "cluster_id": t["file_id"],
            "canonical_id": t["file_id"],
        })

    singles = nodes.select_columns(["file_id"]).map_batches(
        anti, batch_format="pyarrow")
    return clustered.union(singles)


def connected_components(
    edges: "ray.data.Dataset",
    nodes: "ray.data.Dataset",
    cfg: LinkageConfig,
) -> "ray.data.Dataset":
    """edges(id_a,id_b,...), nodes(file_id,...) -> (file_id, cluster_id, canonical_id).

    Singleton nodes (no surviving edge) keep their own id as cluster id.
    """
    P = effective_partitions(cfg)

    # Fast path: the edge list here is the residual graph AFTER local
    # contraction (fused_scoring emits ~1 star edge per member), so it is
    # usually orders of magnitude smaller than the corpus. Below the
    # configured bound, resolve it with an in-memory union-find on the driver
    # (reference analog: scipy connected_components,
    # eval_cluster_linking.py:90-146); the distributed label propagation
    # below is the path that runs at 10^12 scale.
    skinny = edges.select_columns(["id_a", "id_b"]).materialize()
    n_edges = skinny.count()
    if 0 < n_edges <= cfg.driver_cc_max_edges:
        return _driver_union_find(skinny, nodes, cfg)

    # Only nodes that touch an edge can change label -- restrict the iteration
    # to them (typically a small fraction of the corpus); singletons are
    # emitted directly with label = self at the end.
    e_bi = _bidirect(edges).materialize()
    has_edges = e_bi.count() > 0
    # distributed distinct: per-batch dedup (combiner) then groupby-min --
    # never collects node ids on the driver
    # init = round-0 propagate for free: label(node) = min(node, neighbors)
    # directly from the edge list (no join needed before labels exist)
    labels = bucketed_aggregate(
        e_bi.map_batches(
            lambda t: pa.table({
                "node": pa.concat_arrays([t["node"].combine_chunks(),
                                          t["node"].combine_chunks()]),
                "cand": pa.concat_arrays([t["node"].combine_chunks(),
                                          t["nbr"].combine_chunks()]),
            }),
            batch_format="pyarrow",
        ),
        ["node"], {"label": ("cand", "min")},
    ).materialize()

    prev = _checksum(labels)
    for _ in range(cfg.max_rounds):
        if not has_edges:
            break
        # --- propagate: cand(node) = labels of neighbors ---
        msgs = hash_join(
            e_bi, labels, "inner", P, on=("node",)
        ).map_batches(
            heal_projection(
                _NODE_CAND, lambda t: pa.table({"node": t["nbr"], "cand": t["label"]})
            ),
            batch_format="pyarrow",
        )
        own = labels.map_batches(
            lambda t: pa.table({"node": t["node"], "cand": t["label"]}),
            batch_format="pyarrow",
        )
        propagated = bucketed_aggregate(
            own.union(msgs), ["node"], {"label": ("cand", "min")}
        )
        # --- pointer jump: label <- label(label), fused into the same
        # execution (one materialize per round, not two) ---
        parents = propagated.map_batches(
            lambda t: pa.table({"pnode": t["node"], "plabel": t["label"]}),
            batch_format="pyarrow",
        )
        labels = hash_join(
            propagated, parents, "inner", P, on=("label",), right_on=("pnode",)
        ).map_batches(
            heal_projection(
                _NODE_LABEL, lambda t: pa.table({"node": t["node"], "label": t["plabel"]})
            ),
            batch_format="pyarrow",
        ).materialize()

        cur = _checksum(labels)
        if cur == prev:
            break
        prev = cur

    clustered = labels.map_batches(
        lambda t: pa.table({
            "file_id": t["node"],
            "cluster_id": t["label"],
            "canonical_id": t["label"],
        }),
        batch_format="pyarrow",
    )
    # singletons: nodes with no surviving edge keep their own id (anti join)
    all_nodes = nodes.select_columns(["file_id"])
    if has_edges:
        singles = hash_join(
            all_nodes, labels, "left_anti", P, on=("file_id",), right_on=("node",)
        )
    else:
        singles = all_nodes
    singles = singles.map_batches(
        heal_projection(_ASSIGN3, lambda t: pa.table({
            "file_id": t["file_id"],
            "cluster_id": t["file_id"],
            "canonical_id": t["file_id"],
        })),
        batch_format="pyarrow",
    )
    return clustered.union(singles) if has_edges else singles
