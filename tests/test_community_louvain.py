"""Deterministic Louvain (reference community.py:99-138 best_partition
semantics; exact partition parity is impossible — python-louvain
randomizes node order — so structure + modularity are pinned instead)."""

import numpy as np

from pyrdf2vec_ray import synth
from pyrdf2vec_ray.stages.community import detect_communities, louvain_labels
from pyrdf2vec_ray.state.graph_index import GraphIndex

IRI = synth.IRI_PREFIX


def _two_cliques_edges():
    # nodes 0-4 clique, 5-9 clique, one bridge 4-5
    u, v = [], []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                u.append(base + i)
                v.append(base + j)
    u.append(4)
    v.append(5)
    return np.array(u), np.array(v)


def test_louvain_two_cliques():
    u, v = _two_cliques_edges()
    labels = louvain_labels(u, v, 10)
    assert len(set(labels[:5])) == 1
    assert len(set(labels[5:])) == 1
    assert labels[0] != labels[9]


def test_louvain_deterministic():
    u, v = _two_cliques_edges()
    a = louvain_labels(u, v, 10)
    b = louvain_labels(u, v, 10)
    assert np.array_equal(a, b)


def _modularity(u, v, n, labels):
    m = len(u)
    deg = np.zeros(n)
    np.add.at(deg, u, 1.0)
    np.add.at(deg, v, 1.0)
    q = 0.0
    for uu, vv in zip(u, v):
        if labels[uu] == labels[vv]:
            q += 1.0
    q /= m
    for c in set(labels):
        dc = deg[labels == c].sum()
        q -= (dc / (2 * m)) ** 2
    return q


def test_louvain_beats_singletons_on_kg():
    from pyrdf2vec_ray.stages.community import _entity_edges

    triples = synth.LONG_CHAIN + synth.LOOP + [
        (synth.entity_iri(i), IRI + f"p{i % 3}", synth.entity_iri((i * 7 + 1) % 40))
        for i in range(120)
    ]
    gi = GraphIndex.from_table(synth.triples_table(triples))
    g = gi.local()
    u, v = _entity_edges(g)
    labels = louvain_labels(u, v, g.num_vertices)
    q = _modularity(u, v, g.num_vertices, labels)
    assert q > 0.1          # singleton partition has q < 0
    # walker-facing contract unchanged
    cs = detect_communities(g)
    assert (cs.community_of[np.flatnonzero(g.a.is_entity)] >= 0).all()
    assert sum(len(m) for m in cs.members) == int(g.a.is_entity.sum())


def test_lpa_substitute_still_available():
    gi = GraphIndex.from_table(synth.triples_table(synth.LOOP))
    cs = detect_communities(gi.local(), method="lpa")
    assert len(cs.members) >= 1
