"""Property-based invariants (hypothesis) for the pure kernels — no Ray
jobs per example, so hundreds of cases run in seconds."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyrdf2vec_ray.functions import canon
from pyrdf2vec_ray.literals import cast_literals
from pyrdf2vec_ray.ops.dedup import _perm_coeffs, _shingle_hashes
from pyrdf2vec_ray.samplers import FittedSampler, SamplerSpec
from pyrdf2vec_ray.state.graph_index import GraphIndex
from pyrdf2vec_ray.synth import triples_table

name = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=12
)
triple = st.tuples(name, name, name)


@settings(max_examples=50, deadline=None)
@given(st.lists(triple, min_size=1, max_size=60))
def test_graph_index_roundtrip(triples):
    """Every input triple is reachable as a forward hop of its subject and
    a reverse hop of its object; degrees sum to the distinct triple count."""
    uniq = set(triples)
    gi = GraphIndex.from_table(triples_table(sorted(uniq)))
    g = gi.local()
    assert int(g.out_deg().sum()) == len(uniq) == int(g.in_deg().sum())
    for s, p, o in uniq:
        sid = g.name_to_id(s)
        preds, objs = g.get_hops(sid)
        names = g.a.names
        assert (p, o) in {(str(names[a]), str(names[b])) for a, b in zip(preds, objs)}


@settings(max_examples=50, deadline=None)
@given(st.lists(triple, min_size=1, max_size=40))
def test_sampler_probabilities_valid(triples):
    gi = GraphIndex.from_table(triples_table(sorted(set(triples))))
    g = gi.local()
    for kind in ("uniform", "objfreq", "predfreq", "objpredfreq", "wide"):
        fs = FittedSampler.fit(SamplerSpec(kind=kind), g)
        for vid in range(g.num_vertices):
            preds, objs = g.get_hops(vid)
            if len(preds) == 0:
                continue
            keep, p = fs.hop_probabilities(
                preds.astype(np.int64), objs.astype(np.int64)
            )
            if len(p):
                assert np.isclose(p.sum(), 1.0)
                assert (p >= 0).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(name, min_size=1, max_size=9))
def test_anonymous_walk_invariants(walk):
    root = walk[0]
    out = canon.map_anonymous(walk, root)
    assert len(out) == len(walk)
    for tok, orig in zip(out, walk):
        if orig == root:
            assert tok == root
        else:
            assert tok.isdigit() and walk[int(tok)] == orig


@settings(max_examples=100, deadline=None)
@given(st.lists(name, min_size=1, max_size=7))
def test_split_walk_deterministic_lower_unique(walk):
    out = canon.split_walk(walk, with_reverse=False)
    assert out == canon.split_walk(walk, with_reverse=False)
    assert len(set(out)) == len(out)                 # order-preserving dedup
    assert all(t == t.lower() for t in out)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.text(max_size=8), max_size=3), max_size=4))
def test_cast_literals_shape(chains):
    out = cast_literals(chains)
    assert len(out) == len(chains)
    for cell, chain in zip(out, chains):
        if len(chain) == 0:
            assert isinstance(cell, float) and np.isnan(cell)
        elif len(chain) > 1:
            assert isinstance(cell, tuple) and len(cell) == len(chain)


@settings(max_examples=30, deadline=None)
@given(st.text(min_size=1, max_size=200), st.text(min_size=1, max_size=200))
def test_minhash_similarity_monotone(a, b):
    """Identical texts → identical signatures; signature similarity is
    bounded by [0,1] and symmetric."""
    coeff_a, coeff_b = _perm_coeffs(32)
    def sig(t):
        sh = _shingle_hashes(t, 3)
        return ((sh[None, :] * coeff_a[:, None] + coeff_b[:, None])
                % np.uint64((1 << 61) - 1)).min(axis=1)
    sa, sb = sig(a), sig(b)
    assert np.array_equal(sa, sig(a))
    sim = (sa == sb).mean()
    assert 0.0 <= sim <= 1.0
    if a == b:
        assert sim == 1.0
