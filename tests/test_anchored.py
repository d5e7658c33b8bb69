"""Anchored-cluster partition (reference G2 semantics).

Pins (1) the fused descending union-find sweep against a LITERAL
transcription of the reference's ascending-drop-with-reachability loop
(special_partition.pyx:288-356: tentative drop, per-endpoint
entity-reachability DFS, restore on failure, after an MST prefilter
:392-397), and (2) the no-anchorless-cluster invariant the reference asserts
(eval_cluster_linking.py:253-255)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd


# ---------------------------------------------------------------------------
# literal reference transcription (slow, obviously-correct)
# ---------------------------------------------------------------------------

def _mst_prefilter(edges):
    """Max spanning forest via Kruskal, descending score (distinct scores)."""
    order = sorted(range(len(edges)), key=lambda i: -edges[i][2])
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    kept = []
    for i in order:
        a, b, s = edges[i]
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
            kept.append((a, b, s))
    return kept


def _reachable_anchors(start, adj, dropped, anchors):
    """BFS over non-dropped edges; True iff an anchor is reachable."""
    seen = {start}
    stack = [start]
    while stack:
        u = stack.pop()
        if u in anchors:
            return True
        for v, eid in adj[u]:
            if eid in dropped or v in seen:
                continue
            seen.add(v)
            stack.append(v)
    return False


def literal_anchored_clusters(edges, anchors):
    """Reference loop: MST prefilter, then ascending greedy drop where an
    edge stays dropped only if BOTH endpoints still reach an anchor."""
    forest = _mst_prefilter(edges)
    adj = {}
    for eid, (a, b, _s) in enumerate(forest):
        adj.setdefault(a, []).append((b, eid))
        adj.setdefault(b, []).append((a, eid))
    dropped = set()
    for eid, (a, b, _s) in sorted(
            enumerate(forest), key=lambda t: t[1][2]):  # ascending score
        dropped.add(eid)
        if not (_reachable_anchors(a, adj, dropped, anchors)
                and _reachable_anchors(b, adj, dropped, anchors)):
            dropped.remove(eid)  # restore: reachability would break
    # components of the kept forest
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for eid, (a, b, _s) in enumerate(forest):
        nodes.update((a, b))
        if eid not in dropped:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
    return {n: find(n) for n in sorted(nodes)}


def _clusters_as_sets(labels):
    inv = {}
    for n, r in labels.items():
        inv.setdefault(r, set()).add(n)
    return sorted(map(frozenset, inv.values()), key=min)


def _random_graph(rng, n_nodes, n_edges, n_anchors):
    nodes = [f"n{i:03d}" for i in range(n_nodes)]
    seen, edges = set(), []
    scores = rng.permutation(n_edges * 3)[:n_edges]  # distinct
    k = 0
    while len(edges) < n_edges and k < n_edges * 20:
        k += 1
        a, b = rng.choice(n_nodes, 2, replace=False)
        key = (min(a, b), max(a, b))
        if key in seen:
            continue
        seen.add(key)
        edges.append((nodes[key[0]], nodes[key[1]],
                      float(scores[len(edges)]) / (n_edges * 3)))
    anchors = set(rng.choice(nodes, size=min(n_anchors, n_nodes),
                             replace=False))
    return nodes, edges, anchors


def test_fused_sweep_matches_literal_reference_loop():
    from biomedical_entity_linking_ray.stages.anchored import refine_component

    rng = np.random.default_rng(42)
    for trial in range(60):
        n_nodes = int(rng.integers(2, 24))
        n_edges = int(rng.integers(1, min(40, n_nodes * (n_nodes - 1) // 2 + 1)))
        n_anchors = int(rng.integers(0, n_nodes + 1))
        nodes, edges, anchors = _random_graph(rng, n_nodes, n_edges, n_anchors)
        touched = sorted({x for e in edges for x in e[:2]})
        ids_a = np.array([e[0] for e in edges], dtype=object)
        ids_b = np.array([e[1] for e in edges], dtype=object)
        scores = np.array([e[2] for e in edges])
        roots = refine_component(
            ids_a, ids_b, scores, anchors, np.array(touched, dtype=object))
        fused = {touched[i]: touched[int(roots[i])]
                 for i in range(len(touched))}
        lit = literal_anchored_clusters(edges, anchors)
        assert _clusters_as_sets(fused) == _clusters_as_sets(lit), \
            f"trial {trial}: {edges} anchors={anchors}"


def test_no_anchorless_cluster_invariant():
    """eval_cluster_linking.py:253-255: every refined cluster of a component
    that held an anchor retains >= 1 anchor."""
    from biomedical_entity_linking_ray.stages.anchored import refine_component

    rng = np.random.default_rng(7)
    for _ in range(40):
        n_nodes = int(rng.integers(3, 30))
        n_edges = int(rng.integers(2, min(60, n_nodes * 2)))
        nodes, edges, anchors = _random_graph(
            rng, n_nodes, n_edges, int(rng.integers(1, n_nodes)))
        touched = sorted({x for e in edges for x in e[:2]})
        roots = refine_component(
            np.array([e[0] for e in edges], dtype=object),
            np.array([e[1] for e in edges], dtype=object),
            np.array([e[2] for e in edges]),
            anchors, np.array(touched, dtype=object))
        fused = {touched[i]: touched[int(roots[i])]
                 for i in range(len(touched))}
        # coarse components (ignore anchors) to know which had anchors
        coarse = literal_anchored_clusters(edges, set())  # no anchor: CC
        comp_anchored = {}
        for n, r in coarse.items():
            comp_anchored[r] = comp_anchored.get(r, False) or (n in anchors)
        for cl in _clusters_as_sets(fused):
            src = coarse[min(cl)]
            if comp_anchored[src]:
                assert cl & anchors, (cl, anchors, edges)


def test_anchored_partition_dataset_end_to_end():
    from biomedical_entity_linking_ray.stages.anchored import anchored_partition

    # two components: one with 2 anchors (must split), one anchorless
    edges = rd.from_items([
        {"id_a": "A1", "id_b": "m1", "score": 0.9},
        {"id_a": "m1", "id_b": "m2", "score": 0.2},
        {"id_a": "m2", "id_b": "A2", "score": 0.8},
        {"id_a": "x1", "id_b": "x2", "score": 0.5},
    ])
    assignments = rd.from_items([
        {"file_id": f, "cluster_id": c} for f, c in [
            ("A1", "A1"), ("m1", "A1"), ("m2", "A1"), ("A2", "A1"),
            ("x1", "x1"), ("x2", "x1"), ("lone", "lone")]
    ])
    anchors = rd.from_items([{"file_id": "A1"}, {"file_id": "A2"}])
    out = anchored_partition(edges, assignments, anchors).to_pandas() \
        .sort_values("file_id").reset_index(drop=True)
    lab = dict(zip(out["file_id"], out["cluster_id"]))
    canon = dict(zip(out["file_id"], out["canonical_id"]))
    # the 0.2 bridge between two anchored sides is dropped
    assert lab["A1"] == lab["m1"] and lab["A2"] == lab["m2"]
    assert lab["A1"] != lab["A2"]
    assert canon["m1"] == "A1" and canon["m2"] == "A2"
    # anchorless component stays whole; singleton passes through
    assert lab["x1"] == lab["x2"] == "x1"
    assert lab["lone"] == "lone" and canon["lone"] == "lone"
    assert len(out) == 7


def test_anchored_partition_join_fallback_paths():
    """Force the hash-join label/anchor paths (broadcast bounds at 0) and
    check value-parity with the broadcast paths."""
    from biomedical_entity_linking_ray.stages.anchored import anchored_partition

    edges = rd.from_items([
        {"id_a": "A1", "id_b": "m1", "score": 0.9},
        {"id_a": "m1", "id_b": "m2", "score": 0.3},
        {"id_a": "m2", "id_b": "A2", "score": 0.7},
    ])
    assignments = rd.from_items([
        {"file_id": f, "cluster_id": "A1"} for f in ("A1", "m1", "m2", "A2")])
    anchors = rd.from_items([{"file_id": "A1"}, {"file_id": "A2"}])
    a = anchored_partition(edges, assignments, anchors).to_pandas()
    b = anchored_partition(
        edges, assignments, anchors,
        anchor_broadcast_max=0, broadcast_labels_max=0).to_pandas()
    key = ["file_id"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))


def test_anchored_partition_duplicate_and_selfloop_edges():
    """Duplicate edges are cycle-skips, self-loops are no-ops: the result
    must equal the clean-edge run (reference pre-dedup analog,
    special_partition.pyx:363-389)."""
    from biomedical_entity_linking_ray.stages.anchored import anchored_partition

    clean = [
        {"id_a": "A1", "id_b": "m1", "score": 0.9},
        {"id_a": "m1", "id_b": "m2", "score": 0.2},
        {"id_a": "m2", "id_b": "A2", "score": 0.8},
    ]
    dirty = clean + [
        {"id_a": "A1", "id_b": "m1", "score": 0.9},   # exact duplicate
        {"id_a": "m1", "id_b": "A1", "score": 0.9},   # reversed duplicate
        {"id_a": "m2", "id_b": "m2", "score": 0.5},   # self-loop
    ]
    assignments = rd.from_items([
        {"file_id": f, "cluster_id": "A1"} for f in ("A1", "m1", "m2", "A2")])
    anchors = rd.from_items([{"file_id": "A1"}, {"file_id": "A2"}])
    key = ["file_id"]
    a = anchored_partition(rd.from_items(clean), assignments, anchors) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    b = anchored_partition(rd.from_items(dirty), assignments, anchors) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_anchored_partition_empty_edges_and_empty_anchors():
    from biomedical_entity_linking_ray.stages.anchored import anchored_partition

    assignments = rd.from_items([
        {"file_id": "x", "cluster_id": "x"}, {"file_id": "y", "cluster_id": "y"}])
    empty_edges = rd.from_items([
        {"id_a": "q", "id_b": "q", "score": 0.0}]).filter(lambda r: False)
    anchors = rd.from_items([{"file_id": "x"}])
    out = anchored_partition(empty_edges, assignments, anchors).to_pandas()
    assert sorted(out["file_id"]) == ["x", "y"]
    assert (out["file_id"] == out["cluster_id"]).all()
    # anchorless world: one component stays whole
    edges = rd.from_items([{"id_a": "x", "id_b": "y", "score": 0.5}])
    no_anchors = anchors.filter(lambda r: False)
    out2 = anchored_partition(edges, rd.from_items([
        {"file_id": "x", "cluster_id": "x"},
        {"file_id": "y", "cluster_id": "x"}]), no_anchors).to_pandas()
    assert out2["cluster_id"].nunique() == 1
