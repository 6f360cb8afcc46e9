"""Weisfeiler-Lehman relabeling (reference weisfeiler_lehman.py:69-129).

Vertices of the bipartite graph are entities AND per-triple predicate
instances; label propagation runs through both:

  L0(entity)         = name            L0(pinst(s,p,o)) = p
  Ln(pinst(s,p,o))   = H(L_{n-1}(pinst) + "-" + L_{n-1}(s))
  Ln(entity v)       = H(L_{n-1}(v) + "-" + join(sorted(set(
                           L_{n-1}(pinst) of triples with obj = v))))
  H(x) = str(md5(x).digest()[:md5_bytes])   (or x when md5_bytes is None)

Computed here as k vectorized passes over the CSR edge arrays (pandas
groupby for the sorted-distinct-join).  The distributed formulation is k
rounds of edges⋈labels + groupby(child) (SURVEY.md A9); this
single-task form serves graphs that fit the object store and is itself
run inside one Ray task when used from the pipeline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyrdf2vec_ray.functions.canon import md5_token
from pyrdf2vec_ray.state.graph_index import LocalGraph


def _hash_distinct(strings: np.ndarray, md5_bytes: int | None) -> np.ndarray:
    """Hash each string, calling md5 only once per DISTINCT value: WL
    labels converge fast, so distinct labels << vertices/edges — this is
    what makes the relabeling vectorized rather than a per-vertex loop.

    pd.factorize (hash-based, object dtype) — NOT np.unique over a
    fixed-width string array: hub vertices produce suffix strings of
    100s of KB, and U-dtype pads every row to the longest one."""
    codes, uniq = pd.factorize(strings, sort=False)
    if md5_bytes:
        hashed = np.array([md5_token(u, md5_bytes) for u in uniq], dtype=object)
    else:
        hashed = np.asarray(uniq, dtype=object)
    return hashed[codes]


def wl_labels(
    g: LocalGraph, wl_iterations: int, md5_bytes: int | None = 8
) -> dict[str, list[str]]:
    """name → [label_0, ..., label_k] for every ENTITY vertex."""
    a = g.a
    nv = g.num_vertices
    names = a.names

    subj_per_edge = np.repeat(np.arange(nv), np.diff(a.fwd_indptr))
    obj_per_edge = a.fwd_obj.astype(np.int64)

    ent_labels = names.astype(object).copy()          # L_n(entity), start n=0
    pin_labels = names[a.fwd_pred.astype(np.int64)].astype(object)  # L_n(pinst)

    history: list[np.ndarray] = [ent_labels.copy()]

    for _ in range(wl_iterations):
        # entity suffix: sorted distinct pinst labels of incoming triples
        df = pd.DataFrame({"obj": obj_per_edge, "lab": pin_labels})
        suffix = (
            df.drop_duplicates()
            .sort_values(["obj", "lab"])
            .groupby("obj")["lab"]
            .agg("-".join)
        )
        suffix_full = np.full(nv, "", dtype=object)
        suffix_full[suffix.index.to_numpy()] = suffix.to_numpy()

        # vectorized concat (C-level object add) + distinct-only hashing
        new_ent = _hash_distinct(ent_labels + "-" + suffix_full, md5_bytes)
        new_pin = _hash_distinct(
            pin_labels + "-" + ent_labels[subj_per_edge], md5_bytes
        )
        ent_labels, pin_labels = new_ent, new_pin
        history.append(ent_labels.copy())

    entity_ids = np.flatnonzero(a.is_entity)
    return {
        str(names[v]): [str(h[v]) for h in history] for v in entity_ids
    }
