"""Community detection for CommunityWalker (reference community.py:99-138).

The reference runs python-louvain's ``best_partition`` on the undirected
entity graph (edge per hop).  Louvain is global and multi-level — not
shuffle-friendly; per SURVEY.md A10 the scale substitute is label
propagation, which is what runs here: deterministic synchronous-ish LPA
(sorted node order, most-common neighbor label, ties → smallest).  The
walker's teleport semantics (hop_prob jumps to a random community
member) are unchanged; only the partition algorithm differs, which the
reference tests never pin (they assert walk-shape invariants only).
"""

from __future__ import annotations

import numpy as np

from pyrdf2vec_ray.stages.walk import CommunityState
from pyrdf2vec_ray.state.graph_index import LocalGraph


def detect_communities(
    g: LocalGraph, max_sweeps: int = 20, resolution: float = 1.0
) -> CommunityState:
    a = g.a
    nv = g.num_vertices
    src = np.repeat(np.arange(nv), np.diff(a.fwd_indptr)).astype(np.int64)
    dst = a.fwd_obj.astype(np.int64)
    # undirected unique edges among entities
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    pair = np.unique(lo * nv + hi)
    u = (pair // nv).astype(np.int64)
    v = (pair % nv).astype(np.int64)

    # adjacency lists (symmetric)
    deg = np.zeros(nv, dtype=np.int64)
    np.add.at(deg, u, 1)
    np.add.at(deg, v, 1)
    indptr = np.zeros(nv + 1, dtype=np.int64)
    np.cumsum(deg, out=indptr[1:])
    nbr = np.zeros(indptr[-1], dtype=np.int64)
    cursor = indptr[:-1].copy()
    for x, y in ((u, v), (v, u)):
        for i in range(len(x)):
            nbr[cursor[x[i]]] = y[i]
            cursor[x[i]] += 1

    labels = np.arange(nv, dtype=np.int64)
    active = np.flatnonzero(a.is_entity)
    for _ in range(max_sweeps):
        changed = False
        for node in active:
            neigh = nbr[indptr[node] : indptr[node + 1]]
            if len(neigh) == 0:
                continue
            cand, counts = np.unique(labels[neigh], return_counts=True)
            best = cand[counts == counts.max()].min()
            if best != labels[node]:
                labels[node] = best
                changed = True
        if not changed:
            break

    community_of = np.full(nv, -1, dtype=np.int32)
    uniq, inv = np.unique(labels[active], return_inverse=True)
    community_of[active] = inv.astype(np.int32)
    members = [active[inv == c] for c in range(len(uniq))]
    return CommunityState(community_of=community_of, members=members)
