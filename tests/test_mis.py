"""mis_bounded: Luby rounds vs a straight-line reference on hand
graphs — independence, maximality once converged, bounded-round
undecided semantics, isolated-vertex fast path."""
from __future__ import annotations

import hashlib

import pandas as pd
import ray.data

from pyrdf2vec_ray.ops.graph import mis_bounded


def _p(v: str) -> int:
    return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)


def _ref_mis(edges, rounds):
    nbrs: dict[str, set[str]] = {}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    undecided = set(nbrs)
    state = {}
    for _ in range(rounds):
        if not undecided:
            break
        live = {v: {u for u in nbrs[v] if u in undecided}
                for v in undecided}
        ins = {v for v in undecided
               if all(_p(v) < _p(u) for u in live[v])}
        outs = {u for v in ins for u in live[v]}
        for v in ins:
            state[v] = "in"
        for v in outs:
            state[v] = "out"
        undecided -= ins | outs
    for v in undecided:
        state[v] = "undecided"
    return state


def _run(edges, rounds):
    a, b = zip(*edges)
    ds = ray.data.from_pandas(pd.DataFrame({"a": a, "b": b}))
    out = mis_bounded(ds, rounds=rounds).to_pandas()
    return dict(zip(out["v"], out["state"]))


def test_path_graph_matches_reference_each_round():
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    for rounds in (1, 2, 3):
        assert _run(edges, rounds) == _ref_mis(edges, rounds)


def test_converged_set_is_independent_and_maximal():
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
             ("e", "a"), ("a", "c")]
    got = _run(edges, rounds=6)
    assert "undecided" not in got.values()
    ins = {v for v, s in got.items() if s == "in"}
    for x, y in edges:
        assert not (x in ins and y in ins)  # independent
    for v, s in got.items():  # maximal: every OUT vertex has an IN nbr
        if s == "out":
            assert any((v, u) in edges or (u, v) in edges
                       for u in ins)


def test_self_loop_dropped_star_resolves_one_round():
    edges = [("hub", "x"), ("hub", "y"), ("hub", "z"), ("x", "x")]
    got = _run(edges, rounds=1)
    assert got == _ref_mis(edges, 1)
    ins = {v for v, s in got.items() if s == "in"}
    assert ins and ("hub" not in ins or ins == {"hub"})
