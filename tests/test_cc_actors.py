"""Unit tests for the Pregel-style partition-actor connected components."""

import numpy as np
import pandas as pd
import pytest

import pyarrow as pa
import ray.data as rd


def _labels_of(edge_pairs, n_parts=4, max_rounds=50):
    from biomedical_entity_linking_ray.stages.cc_actors import actor_label_propagation

    t = pa.table({
        "id_a": pa.array([a for a, b in edge_pairs], pa.string()),
        "id_b": pa.array([b for a, b in edge_pairs], pa.string()),
    })
    e = rd.from_arrow(t)
    both = e.map_batches(
        lambda x: pa.table({"node": x["id_a"], "nbr": x["id_b"]}),
        batch_format="pyarrow",
    ).union(e.map_batches(
        lambda x: pa.table({"node": x["id_b"], "nbr": x["id_a"]}),
        batch_format="pyarrow",
    ))
    df = actor_label_propagation(both, n_parts, max_rounds).to_pandas()
    return dict(zip(df["node"], df["label"]))


def test_cc_actors_chain_and_components():
    # a long chain (worst case for plain propagation -- pointer jumping must
    # converge it within max_rounds), plus a separate triangle
    chain = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(40)]
    tri = [("t1", "t2"), ("t2", "t3"), ("t1", "t3")]
    lab = _labels_of(chain + tri, n_parts=4, max_rounds=16)
    assert {lab[f"n{i:03d}"] for i in range(41)} == {"n000"}
    assert {lab[t] for t in ("t1", "t2", "t3")} == {"t1"}
    assert len(lab) == 44


def test_cc_actors_ring_min_label():
    ring = [(f"r{i}", f"r{(i + 1) % 10}") for i in range(10)]
    lab = _labels_of(ring, n_parts=3)
    assert set(lab.values()) == {"r0"}


def test_cc_actors_matches_networkless_reference():
    """Random graph vs a plain union-find ground truth."""
    rng = np.random.RandomState(3)
    nodes = [f"x{i:04d}" for i in range(200)]
    edges = [(nodes[rng.randint(200)], nodes[rng.randint(200)]) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    lab = _labels_of(edges, n_parts=4)

    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    touched = {n for e in edges for n in e}
    expect = {n: find(n) for n in touched}
    assert lab == expect
