"""Per-cluster maximum spanning forest over scored edges (reference O6).

The reference orders candidate edges per component and prunes them through an
MST before greedy partitioning (scipy MST prefilter + ascending-score edge
processing, special_partition.pyx:392-397 and :430-431; gold-cluster MST
arborescence, BiEncoderLightningModule.py:1088-1094). The Ray-native shape:
attach each edge's cluster id, hash-bucket clusters (bounded group count --
the per-group-overhead rule), and run one deterministic Kruskal sweep per
bucket. Edges never cross clusters, so a single union-find per bucket yields
the per-cluster forests in one pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from biomedical_entity_linking_ray.config import LinkageConfig, effective_partitions
from biomedical_entity_linking_ray.functions import hashing
from biomedical_entity_linking_ray.functions.joins import hash_join, heal_projection

_EDGE_C = pa.schema([
    ("cluster_id", pa.string()), ("id_a", pa.string()),
    ("id_b", pa.string()), ("score", pa.float64()),
])


def per_cluster_mst(
    edges: "ray.data.Dataset",
    assignments: "ray.data.Dataset",
    cfg: LinkageConfig,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """edges(id_a, id_b, score) x assignments(file_id, cluster_id) ->
    (cluster_id, id_a, id_b, score): max-score spanning forest per cluster.

    Label attach: broadcast map under `broadcast_labels_max`, hash join
    beyond (same bound policy as the flagship's final attach)."""
    from biomedical_entity_linking_ray.config import default_buckets

    n_buckets = n_buckets or default_buckets()
    P = effective_partitions(cfg)
    skinny = edges.select_columns(["id_a", "id_b", "score"])

    if assignments.count() <= cfg.broadcast_labels_max:
        lab_df = assignments.select_columns(["file_id", "cluster_id"]).to_pandas()
        lab_ref = ray.put(dict(zip(lab_df["file_id"], lab_df["cluster_id"])))

        def attach(t: pa.Table) -> pa.Table:
            lab = ray.get(lab_ref)
            cl = [lab.get(x) for x in t["id_a"].to_pylist()]
            keep = pa.array([c is not None for c in cl])
            return pa.table({
                "cluster_id": pa.array(cl, pa.string()),
                "id_a": t["id_a"], "id_b": t["id_b"], "score": t["score"],
            }).filter(keep)

        tagged = skinny.map_batches(attach, batch_format="pyarrow")
    else:
        tagged = hash_join(
            skinny, assignments.select_columns(["file_id", "cluster_id"]),
            "inner", P, on=("id_a",), right_on=("file_id",),
        ).map_batches(
            heal_projection(_EDGE_C, lambda t: pa.table({
                "cluster_id": t["cluster_id"], "id_a": t["id_a"],
                "id_b": t["id_b"], "score": t["score"],
            })),
            batch_format="pyarrow",
        )

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hashing.fnv1a_fixed(t["cluster_id"].to_numpy(zero_copy_only=False),
                                width=96)
        b = (h % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def kruskal(g: pd.DataFrame) -> pd.DataFrame:
        # deterministic order: best score first, stable id tie-break; edges of
        # different clusters cannot union (disjoint node sets), so one
        # union-find serves every cluster in the bucket
        g = g.sort_values(["cluster_id", "score", "id_a", "id_b"],
                          ascending=[True, False, True, True],
                          kind="mergesort").reset_index(drop=True)
        codes, _ = pd.factorize(
            pd.concat([g["id_a"], g["id_b"]], ignore_index=True), sort=False)
        ea, eb = codes[: len(g)], codes[len(g):]
        parent = np.arange(codes.max() + 1 if len(g) else 0, dtype=np.int64)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        keep = np.zeros(len(g), dtype=bool)
        for i, (a, b) in enumerate(zip(ea, eb)):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
                keep[i] = True
        return g.loc[keep, ["cluster_id", "id_a", "id_b", "score"]]

    return tagged.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(kruskal, batch_format="pandas")
