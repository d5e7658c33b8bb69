"""Stage 3 -- transitive clustering: distributed connected components.

The reference collapses the scored edge graph with single-node scipy
`connected_components` + a Cython greedy partition
(eval_cluster_linking.py:90-146, special_partition.pyx:288-356). That cannot
hold a 10^12-node edge list in one process, so this stage offers two
distributed-by-design paths:

- residual graphs under `driver_cc_max_edges`: vectorized union-find on the
  driver (factorized int ids, path halving);
- beyond the bound: Pregel-style min-label propagation with pointer jumping
  on a fixed partition-actor pool (stages/cc_actors.py) -- edges ingest once,
  rounds move only label messages, O(log diameter) convergence.

The final label IS the component's minimum file_id, i.e. the canonical
representative (reference analog: `analyzeClusters` picks the lowest-index
entity per component, eval_cluster_linking.py:186-219).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from biomedical_entity_linking_ray.config import LinkageConfig, effective_partitions
from biomedical_entity_linking_ray.functions.joins import hash_join, heal_projection


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
    import os as _os
    import time as _time

    import pandas as pd

    _timing = bool(_os.environ.get("BEL_STAGE_TIMING"))
    _t0 = _time.time()
    edf = skinny_edges.to_pandas()
    if _timing:
        print(f"  [s6.fetch] {len(edf)} edges {_time.time() - _t0:.2f}s", flush=True)
        _t0 = _time.time()
    codes, uniques = pd.factorize(
        pd.concat([edf["id_a"], edf["id_b"]], ignore_index=True), sort=False)
    n = len(uniques)
    ea = codes[: len(edf)]
    eb = codes[len(edf):]
    # The raw star stream still carries cross-batch duplicate edges (the
    # per-batch Arrow distinct only strips co-located ones). Union-find is
    # order-independent here -- every union roots at the min-rank member, so
    # the component root is the min regardless of edge order -- which makes a
    # vectorized undirected dedup safe and cuts the sequential loop to the
    # unique edge count (~6x fewer at bench scale).
    assert n < (1 << 32)
    lo = np.minimum(ea, eb).astype(np.uint64)
    hi = np.maximum(ea, eb).astype(np.uint64)
    packed = np.unique((lo << np.uint64(32)) | hi)
    ea = (packed >> np.uint64(32)).astype(np.int64)
    eb = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
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

    # plain-int iteration: indexing `parent` with Python ints skips the
    # numpy-scalar boxing that dominates a sequential loop over arrays
    for a, b in zip(ea.tolist(), eb.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            if rank[ra] <= rank[rb]:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)
    if _timing:
        print(f"  [s6.uf] n={n} {_time.time() - _t0:.2f}s", flush=True)
        _t0 = _time.time()
    labels = ray.data.from_arrow(pa.table({
        "node": pa.array(uniq, pa.string()),
        "label": pa.array(uniq[roots], pa.string()),
    })).materialize()
    if _timing:
        print(f"  [s6.labels] {_time.time() - _t0:.2f}s", flush=True)

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
    import pandas as _pd

    from biomedical_entity_linking_ray.functions.joins import cached_broadcast

    labeled_ref = ray.put(uniq)

    def anti(t: pa.Table) -> pa.Table:
        # pandas Index: hashtable built once per worker (pc.is_in would
        # rebuild its value-set table on every batch -- quadratic-ish once
        # the labeled set reaches millions of nodes)
        ks = cached_broadcast(labeled_ref, transform=_pd.Index)
        idx = ks.get_indexer(t["file_id"].to_numpy(zero_copy_only=False))
        t = t.filter(pa.array(idx < 0))
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
    # Per-batch LOCAL dedup (no shuffle): the flagship feeds the raw star
    # stream here, whose cross-block duplicates usually co-occur inside one
    # scoring output block -- a zero-copy Arrow distinct per batch strips most
    # of them before anything is materialized or pulled to the driver.
    import os as _os
    import time as _time

    _timing = bool(_os.environ.get("BEL_STAGE_TIMING"))
    _t0 = _time.time()
    skinny = edges.select_columns(["id_a", "id_b"]).map_batches(
        lambda t: t.group_by(["id_a", "id_b"]).aggregate([]),
        batch_format="pyarrow",
    ).materialize()
    n_edges = skinny.count()
    if _timing:
        print(f"  [s6.edges] {n_edges} rows {_time.time() - _t0:.2f}s", flush=True)
    if 0 < n_edges <= cfg.driver_cc_max_edges:
        return _driver_union_find(skinny, nodes, cfg)

    # Beyond the driver bound the edge list may still carry cross-block
    # duplicates (the flagship feeds the raw star stream here precisely
    # because union-find absorbs them for free); the partition actors hold
    # adjacency resident, so dedup IS worth one bucketed shuffle before
    # ingestion at this scale.
    from biomedical_entity_linking_ray.functions.groups import bucketed_distinct

    skinny = bucketed_distinct(skinny, ["id_a", "id_b"], n_buckets=P * 4)

    # Only nodes that touch an edge can change label -- restrict the iteration
    # to them (typically a small fraction of the corpus); singletons are
    # emitted directly with label = self at the end.
    e_bi = _bidirect(skinny).materialize()
    has_edges = e_bi.count() > 0
    if has_edges:
        # Pregel-style partition actors: the static edge list is ingested ONCE
        # into a fixed actor pool and rounds exchange only label messages +
        # pointer jumps -- a DAG re-expression would re-shuffle the edges
        # through fresh join operators every round (measured 160 s vs ~5 s on
        # the same graph). See stages/cc_actors.py.
        from biomedical_entity_linking_ray.stages.cc_actors import actor_label_propagation

        labels = actor_label_propagation(
            e_bi, n_parts=min(P, 64), max_rounds=cfg.max_rounds)
    else:
        labels = ray.data.from_arrow(_NODE_LABEL.empty_table())

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


# ---------------------------------------------------------------------------
# Canonical-policy registry (SURVEY 2.11 extension surface, next to the
# encoder / scorer / blocker slots). A policy is a callable
#     fn(members: pd.DataFrame) -> pd.DataFrame[cluster_id, canonical_id]
# receiving every assignment row of a bucket (one cluster never spans
# buckets) joined with the requested feature columns; vectorize inside.
# Reference analog: analyzeClusters' lowest-index representative pick
# (eval_cluster_linking.py:186-219) generalized to a named slot.
# ---------------------------------------------------------------------------

def _min_id_policy(members):
    return members.groupby("cluster_id", as_index=False).agg(
        canonical_id=("file_id", "min"))


def _max_tokens_policy(members):
    m = members.sort_values(["cluster_id", "n_tokens", "file_id"],
                            ascending=[True, False, True], kind="mergesort")
    return m.drop_duplicates("cluster_id")[["cluster_id", "file_id"]] \
        .rename(columns={"file_id": "canonical_id"})


CANONICAL_POLICY_REGISTRY: dict[str, object] = {
    "min_id": _min_id_policy,
    "max_tokens": _max_tokens_policy,
}


def register_canonical_policy(name: str, fn) -> None:
    """fn(members: pd.DataFrame) -> pd.DataFrame[cluster_id, canonical_id]."""
    CANONICAL_POLICY_REGISTRY[name] = fn


def resolve_canonical_policy(policy):
    if isinstance(policy, str):
        try:
            return CANONICAL_POLICY_REGISTRY[policy]
        except KeyError:
            raise ValueError(
                f"unknown canonical policy {policy!r}; registered: "
                f"{sorted(CANONICAL_POLICY_REGISTRY)}") from None
    return policy


def relabel_canonical(
    assignments: "ray.data.Dataset",
    feats: "ray.data.Dataset | None" = None,
    policy="min_id",
    feature_cols: tuple = ("n_tokens",),
    n_buckets: int | None = None,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Post-pass: recompute canonical_id per cluster under a registered
    policy. Scale shape: optional feature columns arrive via a SKINNY hash
    join on file_id (never a corpus broadcast); cluster members co-locate
    through one bucket shuffle on hash(cluster_id); the policy runs
    vectorized per bucket. Resolution is driver-side so runtime
    registrations reach every worker."""
    import pandas as pd

    from biomedical_entity_linking_ray.config import default_buckets
    from biomedical_entity_linking_ray.functions import hashing

    n_buckets = n_buckets or default_buckets()
    pol = resolve_canonical_policy(policy)
    ds = assignments.select_columns(["file_id", "cluster_id"])
    cols = ["file_id", "cluster_id"]
    if feats is not None and feature_cols:
        side = feats.select_columns(["file_id", *feature_cols])
        ds = hash_join(ds, side, "inner", num_partitions, on=("file_id",))
        cols = cols + list(feature_cols)
    # heal schema = post-bucket layout so an empty healed block still carries
    # __bucket for the groupby
    base = pa.schema(
        [("file_id", pa.string()), ("cluster_id", pa.string())]
        + ([(c, feats.schema().base_schema.field(c).type) for c in feature_cols]
           if feats is not None and feature_cols else [])
        + [("__bucket", pa.int64())])

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        b = hashing.fnv1a_fixed(
            t["cluster_id"].to_numpy(zero_copy_only=False), width=96)
        return t.append_column(
            "__bucket", pa.array((b % np.uint64(n_buckets)).astype(np.int64)))

    def relabel(g: pd.DataFrame) -> pd.DataFrame:
        top = pol(g)
        out = g.merge(top, on="cluster_id")
        return out[["file_id", "cluster_id", "canonical_id"]]

    return ds.map_batches(
        heal_projection(base, add_bucket), batch_format="pyarrow",
    ).groupby("__bucket").map_groups(relabel, batch_format="pandas")
