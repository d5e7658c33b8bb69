"""Distributed connected components on a fixed partition-actor pool.

The label-propagation-as-Dataset-rounds path pays for what a DAG engine
cannot avoid: the STATIC edge list re-shuffles through fresh join operators
(and their aggregator fleets) every round. Iterative graph state is the one
place SURVEY.md licenses raw Ray actors ("a shared mutable index"), and this
is the classic shape: `P` partition actors each hold their edge partition
and their owned nodes' labels in memory ONCE; a round exchanges only label
messages (Pregel-style), and pointer jumping keeps rounds at O(log diameter).

Routing: node `n` is owned by actor `fnv(n) % P`. Edge (u, v) lives with
owner(u); the bidirectional edge list guarantees every node appears as a
source. Messages are Arrow tables moved actor-to-actor through the object
store via `num_returns=P` method calls -- the driver holds only ObjectRefs,
never data. Determinism: min-label with lexicographic ids; convergence when
a full round changes nothing anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from biomedical_entity_linking_ray.functions import hashing


def _owner(ids: np.ndarray, n_parts: int) -> np.ndarray:
    return (hashing.fnv1a_fixed(ids, width=64) % np.uint64(n_parts)).astype(np.int64)


@ray.remote(num_cpus=0.5)
class CCPartition:
    """One graph partition: owned nodes' labels + outgoing adjacency."""

    def __init__(self, idx: int, n_parts: int):
        self.idx = idx
        self.n = n_parts
        self._src_chunks: list[np.ndarray] = []
        self._dst_chunks: list[np.ndarray] = []

    def add_edges(self, t: pa.Table) -> int:
        """Ingest (node, nbr) rows whose source is owned by this partition."""
        self._src_chunks.append(t["node"].to_numpy(zero_copy_only=False))
        self._dst_chunks.append(t["nbr"].to_numpy(zero_copy_only=False))
        return t.num_rows

    def finalize(self) -> int:
        src = np.concatenate(self._src_chunks) if self._src_chunks else np.array([], object)
        dst = np.concatenate(self._dst_chunks) if self._dst_chunks else np.array([], object)
        self._src_chunks = self._dst_chunks = []
        # factorize owned nodes; round-0 fusion: label = min(node, min out-nbr)
        codes, uniq = pd.factorize(pd.Series(src), sort=False)
        self.nodes = uniq.to_numpy() if len(uniq) else np.array([], object)
        self.node_pos = {x: i for i, x in enumerate(self.nodes)}
        init = pd.DataFrame({"c": codes, "d": dst}).groupby("c")["d"].min()
        self.labels = self.nodes.copy()
        if len(init):
            np.minimum.at(self.labels, init.index.to_numpy(), init.to_numpy())
        self.edge_src_code = codes
        self.edge_dst = dst
        self.edge_dst_owner = _owner(dst, self.n) if len(dst) else np.array([], np.int64)
        self.dst_order = np.argsort(self.edge_dst_owner, kind="stable")
        self.dst_bounds = np.searchsorted(
            self.edge_dst_owner[self.dst_order], np.arange(self.n + 1))
        return len(self.nodes)

    # --- phase A: push my labels along my out-edges, grouped by dst owner ---
    def out_messages(self):
        out = []
        for q in range(self.n):
            sl = self.dst_order[self.dst_bounds[q]:self.dst_bounds[q + 1]]
            out.append(pa.table({
                "node": pa.array(self.edge_dst[sl], pa.string()),
                "cand": pa.array(self.labels[self.edge_src_code[sl]], pa.string()),
            }))
        return tuple(out)

    def apply_messages(self, *tables) -> int:
        nodes, cands = [], []
        for t in tables:
            if t.num_rows:
                nodes.append(t["node"].to_numpy(zero_copy_only=False))
                cands.append(t["cand"].to_numpy(zero_copy_only=False))
        if not nodes:
            return 0
        df = pd.DataFrame({"n": np.concatenate(nodes), "c": np.concatenate(cands)})
        best = df.groupby("n")["c"].min()
        idx = np.fromiter((self.node_pos[x] for x in best.index), dtype=np.int64,
                          count=len(best))
        cand = best.to_numpy()
        changed = cand < self.labels[idx]
        self.labels[idx[changed]] = cand[changed]
        return int(changed.sum())

    # --- phase B: pointer jump -- label <- label(label), two sub-hops ---
    def jump_requests(self):
        """Distinct current labels grouped by their owner."""
        uniq = pd.unique(pd.Series(self.labels))
        arr = np.asarray(uniq, dtype=object)
        own = _owner(arr, self.n) if len(arr) else np.array([], np.int64)
        order = np.argsort(own, kind="stable")
        bounds = np.searchsorted(own[order], np.arange(self.n + 1))
        return tuple(
            pa.table({"key": pa.array(arr[order[bounds[q]:bounds[q + 1]]], pa.string())})
            for q in range(self.n)
        )

    def answer_jumps(self, *tables):
        """For each requested key (a label value), reply with label[key]
        (keys not owned here resolve to themselves -- they are roots whose
        node row lives nowhere, which cannot happen for bidirectional edges,
        or already-minimal labels)."""
        out = []
        for t in tables:
            keys = t["key"].to_numpy(zero_copy_only=False)
            vals = np.array([
                self.labels[self.node_pos[k]] if k in self.node_pos else k
                for k in keys
            ], dtype=object)
            out.append(pa.table({"key": pa.array(keys, pa.string()),
                                 "val": pa.array(vals, pa.string())}))
        return tuple(out)

    def apply_jumps(self, *tables) -> int:
        m: dict = {}
        for t in tables:
            for k, v in zip(t["key"].to_pylist(), t["val"].to_pylist()):
                m[k] = v
        new = np.array([m.get(x, x) for x in self.labels], dtype=object)
        changed = new < self.labels
        self.labels[changed] = new[changed]
        return int(changed.sum())

    def get_labels(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, pa.string()),
                         "label": pa.array(self.labels, pa.string())})


def actor_label_propagation(
    e_bi: "ray.data.Dataset", n_parts: int, max_rounds: int = 50,
) -> "ray.data.Dataset":
    """(node, nbr) bidirectional edges -> (node, label) via partition actors.

    Edges are pushed to their owner INSIDE map_batches tasks (the driver never
    holds edge data); each round is one message exchange + one pointer-jump
    exchange, O(log diameter) rounds to converge.
    """
    actors = [CCPartition.remote(i, n_parts) for i in range(n_parts)]

    def distribute(t: pa.Table) -> pa.Table:
        src = t["node"].to_numpy(zero_copy_only=False)
        own = _owner(src, n_parts)
        order = np.argsort(own, kind="stable")
        bounds = np.searchsorted(own[order], np.arange(n_parts + 1))
        refs = []
        for q in range(n_parts):
            sl = order[bounds[q]:bounds[q + 1]]
            if len(sl):
                refs.append(actors[q].add_edges.remote(t.take(sl)))
        ray.get(refs)  # barrier inside the task: actor ingested this batch
        return pa.table({"n": pa.array([t.num_rows], pa.int64())})

    e_bi.map_batches(distribute, batch_size=65536, batch_format="pyarrow") \
        .materialize()
    ray.get([a.finalize.remote() for a in actors])

    for _ in range(max_rounds):
        # phase A: neighbor label push (messages routed by num_returns --
        # the driver moves ObjectRefs only)
        outs = [a.out_messages.options(num_returns=n_parts).remote()
                for a in actors]
        changed_a = ray.get([
            actors[q].apply_messages.remote(*[outs[p][q] for p in range(n_parts)])
            for q in range(n_parts)
        ])
        # phase B: pointer jump
        reqs = [a.jump_requests.options(num_returns=n_parts).remote()
                for a in actors]
        answers = [
            actors[q].answer_jumps.options(num_returns=n_parts).remote(
                *[reqs[p][q] for p in range(n_parts)])
            for q in range(n_parts)
        ]
        changed_b = ray.get([
            actors[p].apply_jumps.remote(*[answers[q][p] for q in range(n_parts)])
            for p in range(n_parts)
        ])
        if sum(changed_a) + sum(changed_b) == 0:
            break

    labels = ray.data.from_arrow(ray.get([a.get_labels.remote() for a in actors]))
    for a in actors:
        ray.kill(a)
    return labels.materialize()
