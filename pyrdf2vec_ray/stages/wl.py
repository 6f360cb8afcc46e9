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


def wl_labels(
    g: LocalGraph, wl_iterations: int, md5_bytes: int | None = 8
) -> dict[str, list[str]]:
    """name → [label_0, ..., label_k] for every ENTITY vertex."""
    a = g.a
    nv = g.num_vertices
    names = a.names

    def H(x: str) -> str:
        return md5_token(x, md5_bytes) if md5_bytes else str(x)

    subj_per_edge = np.repeat(np.arange(nv), np.diff(a.fwd_indptr))
    obj_per_edge = a.fwd_obj.astype(np.int64)

    ent_labels = names.astype(object).copy()          # L_n(entity), start n=0
    pin_labels = names[a.fwd_pred.astype(np.int64)].astype(object)  # L_n(pinst)

    history: list[np.ndarray] = [ent_labels.copy()]
    has_parent = np.zeros(nv, dtype=bool)
    has_parent[obj_per_edge] = True

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

        new_ent = np.array(
            [H(f"{ent_labels[v]}-{suffix_full[v]}") for v in range(nv)],
            dtype=object,
        )
        new_pin = np.array(
            [
                H(f"{pin_labels[e]}-{ent_labels[subj_per_edge[e]]}")
                for e in range(len(pin_labels))
            ],
            dtype=object,
        )
        ent_labels, pin_labels = new_ent, new_pin
        history.append(ent_labels.copy())

    entity_ids = np.flatnonzero(a.is_entity)
    return {
        str(names[v]): [str(h[v]) for h in history] for v in entity_ids
    }
