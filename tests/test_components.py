"""connected_components vs a local union-find reference."""

import numpy as np
import pytest

import ray.data

from pyrdf2vec_ray.ops.components import connected_components


def _uf_components(edges):
    """Union-find reference: node -> min node id of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(edges):
    ds = ray.data.from_items(
        [{"doc_a": int(a), "doc_b": int(b)} for a, b in edges]
    )
    out = connected_components(ds)
    return {r["node"]: r["component"] for r in out.take_all()}


def test_chain_multi_round(ray_session):
    # a 20-node path forces label propagation across many hops — the
    # pointer-jump acceleration is what keeps rounds logarithmic
    edges = [(i, i + 1) for i in range(100, 120)]
    got = _run(edges)
    assert got == {n: 100 for n in range(100, 121)}


def test_mixed_topologies(ray_session):
    edges = (
        [(0, 1), (1, 2), (2, 0)]          # triangle
        + [(10, 11)]                      # isolated pair
        + [(20, i) for i in range(21, 26)]  # star
        + [(30, 31), (31, 32), (33, 32)]  # zigzag chain
    )
    got = _run(edges)
    assert got == _uf_components(edges)


def test_duplicate_and_self_pairs(ray_session):
    # repeated candidate pairs (LSH emits dups) and self-loops are inert
    edges = [(5, 6), (6, 5), (5, 6), (7, 7)]
    got = _run(edges)
    assert got == {5: 5, 6: 5, 7: 7}


def test_random_graphs_match_union_find(ray_session):
    rng = np.random.RandomState(11)
    for trial in range(3):
        n = 60
        m = 45
        edges = list(zip(rng.randint(0, n, m).tolist(),
                         rng.randint(0, n, m).tolist()))
        got = _run(edges)
        assert got == _uf_components(edges), f"trial {trial}"


def test_empty_pairs(ray_session):
    ds = ray.data.from_items([{"doc_a": 1, "doc_b": 2}]).filter(
        lambda r: False
    )
    out = connected_components(ds)
    assert out.count() == 0
    assert set(out.schema().names) == {"node", "component"}
