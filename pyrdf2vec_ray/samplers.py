"""Sampling strategies (reference: pyrdf2vec/samplers/*, SURVEY.md §2.4).

A sampler is (1) a global fit over the whole graph and (2) a per-hop
weight function used inside DFS walk actors.  The fit statistics are
plain grouped counts over the triples table; here they are computed
vectorized from the broadcast CSR arrays (one pass, no shuffle — the
triples were already shuffled once to dedup), and the equivalent
Dataset/groupby formulations live in `pyrdf2vec_ray.stats` for the
oracle-checked `vertex_stats` pipeline.  Weight semantics are faithful
to the reference per-sampler docstrings below.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pyrdf2vec_ray.state.graph_index import LocalGraph

SAMPLER_KINDS = ("uniform", "objfreq", "predfreq", "objpredfreq", "pagerank", "wide")


@dataclass(frozen=True)
class SamplerSpec:
    """Configuration mirroring Sampler(inverse, split) + per-kind params
    (samplers/sampler.py:44-48, pagerank.py:42-48)."""

    kind: str = "uniform"
    inverse: bool = False
    split: bool = False
    alpha: float = 0.85          # PageRank damping
    random_state: int | None = None

    def __post_init__(self):
        if self.kind not in SAMPLER_KINDS:
            raise ValueError(f"unknown sampler kind {self.kind!r}")


def pagerank_scores(g: LocalGraph, alpha: float = 0.85, tol: float = 1e-6,
                    max_iter: int = 100) -> np.ndarray:
    """PageRank over the entity-only digraph with parallel (subj, obj)
    edges collapsed — exactly the graph the reference builds for
    networkx (samplers/pagerank.py:59-67: nx.DiGraph add_edge dedups).
    Power iteration with uniform personalization and dangling-mass
    redistribution, matching networkx.pagerank semantics.  Non-entity
    ids get score 0.  At cluster scale this is k rounds of
    edges-join-scores + groupby(dst).sum() (SURVEY.md A5); the vectorized
    single-pass form here serves graphs that fit the object store."""
    a = g.a
    # unique entity→entity edges
    key = a.fwd_obj.astype(np.int64)
    src = np.repeat(np.arange(g.num_vertices), np.diff(a.fwd_indptr)).astype(np.int64)
    pair = np.unique(src * g.num_vertices + key)
    src_u = (pair // g.num_vertices).astype(np.int64)
    dst_u = (pair % g.num_vertices).astype(np.int64)

    nodes = np.flatnonzero(a.is_entity)
    n = len(nodes)
    if n == 0:
        return np.zeros(g.num_vertices)
    pos = np.full(g.num_vertices, -1, dtype=np.int64)
    pos[nodes] = np.arange(n)
    s, d = pos[src_u], pos[dst_u]
    out_deg = np.zeros(n)
    np.add.at(out_deg, s, 1.0)

    x = np.full(n, 1.0 / n)
    p = np.full(n, 1.0 / n)
    dangling = out_deg == 0
    for _ in range(max_iter):
        x_last = x
        contrib = np.where(out_deg > 0, x_last / np.maximum(out_deg, 1), 0.0)
        x = np.zeros(n)
        np.add.at(x, d, contrib[s])
        x = alpha * x + (alpha * x_last[dangling].sum() + (1 - alpha)) * p
        if np.abs(x - x_last).sum() < n * tol:
            break
    out = np.zeros(g.num_vertices)
    out[nodes] = x
    return out


@dataclass
class FittedSampler:
    """Fitted state + the get_weights pipeline (sampler.py:111-136):
    raw weights → optional inverse (max - (w - min)) → optional split
    (divide by the target vertex's in-degree, dropping zero-degree
    targets) → normalize to sum 1."""

    spec: SamplerSpec
    node_w: np.ndarray | None = None          # per-vertex-id weight (objfreq/pagerank)
    pred_w: np.ndarray | None = None          # per-vertex-id weight of predicate names
    pair_keys: np.ndarray | None = None       # sorted pred*nv+obj keys (objpredfreq)
    pair_counts: np.ndarray | None = None
    in_deg: np.ndarray | None = None          # split divisor (sampler.py:86-91)
    out_deg: np.ndarray | None = None         # wide
    nv: int = 0
    extras: dict = field(default_factory=dict)

    @staticmethod
    def fit(spec: SamplerSpec, g: LocalGraph) -> "FittedSampler":
        a = g.a
        nv = g.num_vertices
        fs = FittedSampler(spec=spec, nv=nv)
        fs.in_deg = g.in_deg().astype(np.float64)
        fs.out_deg = g.out_deg().astype(np.float64)
        if spec.kind == "objfreq":
            # in-degree of the target entity (frequency.py:46-81)
            fs.node_w = fs.in_deg
        elif spec.kind == "predfreq":
            # occurrences of the predicate name (frequency.py:116-152)
            pw = np.zeros(nv)
            np.add.at(pw, a.fwd_pred.astype(np.int64), 1.0)
            fs.pred_w = pw
        elif spec.kind == "objpredfreq":
            # occurrences of each (pred, obj) pair (frequency.py:188-227)
            key = a.fwd_pred.astype(np.int64) * nv + a.fwd_obj.astype(np.int64)
            fs.pair_keys, fs.pair_counts = np.unique(key, return_counts=True)
            fs.pair_counts = fs.pair_counts.astype(np.float64)
        elif spec.kind == "pagerank":
            fs.node_w = pagerank_scores(g, alpha=spec.alpha)
        elif spec.kind == "wide":
            # (nc[pred]+nc[obj]) * ((pred_deg[pred]+obj_deg[obj])/2), where —
            # per the reference's per-vertex loop (wide.py:50-96) — nc of a
            # predicate name resolves to 1 (each predicate instance has
            # exactly one parent), nc of an entity is its out-degree, and
            # obj_deg of an entity is 1 (vertices are unique by name).
            pw = np.zeros(nv)
            np.add.at(pw, a.fwd_pred.astype(np.int64), 1.0)
            fs.pred_w = pw
        return fs

    def raw_weights(self, pred_ids: np.ndarray, other_ids: np.ndarray) -> np.ndarray:
        k = self.spec.kind
        if k == "uniform":
            return np.ones(len(pred_ids))
        if k in ("objfreq", "pagerank"):
            return self.node_w[other_ids]
        if k == "predfreq":
            return self.pred_w[pred_ids]
        if k == "objpredfreq":
            key = pred_ids.astype(np.int64) * self.nv + other_ids.astype(np.int64)
            idx = np.searchsorted(self.pair_keys, key)
            idx = np.clip(idx, 0, len(self.pair_keys) - 1)
            w = np.where(self.pair_keys[idx] == key, self.pair_counts[idx], 0.0)
            return w
        if k == "wide":
            nc = 1.0 + self.out_deg[other_ids]
            return nc * ((self.pred_w[pred_ids] + 1.0) / 2.0)
        raise AssertionError(k)

    def hop_probabilities(
        self, pred_ids: np.ndarray, other_ids: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Returns (kept_candidate_positions, probabilities).  Positions
        shrink only under split=True when a target has in-degree 0
        (sampler.py:128-133 silently drops those hops)."""
        w = self.raw_weights(pred_ids, other_ids).astype(np.float64)
        keep = np.arange(len(w))
        if self.spec.inverse and len(w):
            w = w.max() - (w - w.min())
        if self.spec.split:
            deg = self.in_deg[other_ids]
            mask = deg != 0
            keep, w, deg = keep[mask], w[mask], deg[mask]
            w = w / deg
        total = w.sum()
        if total == 0 or len(w) == 0:
            return keep, np.array([])
        return keep, w / total
