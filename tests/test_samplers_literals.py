"""Sampler fitted-state golds (tests/samplers/test_frequency.py:83-101,
test_uniform.py:56-59, test_pagerank.py:76-84) and literal goldens
(tests/test_graph.py:69-119), recomputed on the Ray-native state."""

import numpy as np
import pytest

from pyrdf2vec_ray import synth
from pyrdf2vec_ray.literals import cast_literals, get_literals, pliterals
from pyrdf2vec_ray.samplers import FittedSampler, SamplerSpec, pagerank_scores
from pyrdf2vec_ray.state.graph_index import GraphIndex

IRI = synth.IRI_PREFIX


@pytest.fixture(scope="module")
def graphs():
    return (
        GraphIndex.from_table(synth.triples_table(synth.LOOP)).local(),
        GraphIndex.from_table(synth.triples_table(synth.LONG_CHAIN)).local(),
        GraphIndex.from_table(synth.triples_table(synth.GRAPH)).local(),
    )


def hops_of(g, name, reverse=False):
    vid = g.name_to_id(name)
    preds, others = g.get_hops(vid, reverse)
    names = g.a.names
    return {(str(names[p]), str(names[o])) for p, o in zip(preds, others)}


def test_hops_forward_reverse(graphs):
    loop, _, _ = graphs
    assert hops_of(loop, IRI + "Alice") == {
        (IRI + "knows", IRI + "Bob"),
        (IRI + "knows", IRI + "Dean"),
    }
    assert hops_of(loop, IRI + "Alice", reverse=True) == {
        (IRI + "loves", IRI + "Dean"),
    }


def test_objfreq_counts(graphs):
    loop, chain, _ = graphs
    # entries = # entity vertices (frequency.py:46-81 fits every non-pred vertex)
    assert int(loop.a.is_entity.sum()) == 3
    assert int(chain.a.is_entity.sum()) == 9
    fs = FittedSampler.fit(SamplerSpec(kind="objfreq"), loop)
    # in-degrees: Alice 1 (loves), Bob 1, Dean 2
    d = {str(loop.a.names[i]): fs.node_w[i] for i in range(loop.num_vertices)}
    assert d[IRI + "Alice"] == 1 and d[IRI + "Bob"] == 1 and d[IRI + "Dean"] == 2


def test_predfreq_counts(graphs):
    loop, chain, _ = graphs
    fs = FittedSampler.fit(SamplerSpec(kind="predfreq"), loop)
    d = {str(loop.a.names[i]): fs.pred_w[i] for i in range(loop.num_vertices)}
    assert d[IRI + "knows"] == 3 and d[IRI + "loves"] == 1
    # distinct predicate names: LOOP 2, LONG_CHAIN 1
    assert int(loop.a.is_pred.sum()) == 2
    assert int(chain.a.is_pred.sum()) == 1


def test_objpredfreq_counts(graphs):
    loop, chain, _ = graphs
    fs_l = FittedSampler.fit(SamplerSpec(kind="objpredfreq"), loop)
    fs_c = FittedSampler.fit(SamplerSpec(kind="objpredfreq"), chain)
    assert len(fs_l.pair_keys) == 3   # (knows,Bob),(knows,Dean),(loves,Alice)
    assert len(fs_c.pair_keys) == 8


def test_uniform_weights(graphs):
    loop, _, _ = graphs
    fs = FittedSampler.fit(SamplerSpec(kind="uniform"), loop)
    w = fs.raw_weights(np.array([0, 1]), np.array([1, 2]))
    assert (w == 1).all()


def test_pagerank_bounds(graphs):
    loop, _, _ = graphs
    alpha = 0.85
    pr = pagerank_scores(loop, alpha=alpha)
    ent = pr[loop.a.is_entity]
    assert np.isclose(ent.sum(), 1.0, atol=1e-4)
    assert (ent <= alpha).all() and (ent > 0).all()


def test_normalized_probabilities(graphs):
    loop, _, _ = graphs
    for kind in ("uniform", "objfreq", "predfreq", "objpredfreq", "pagerank", "wide"):
        for inverse in (False, True):
            fs = FittedSampler.fit(SamplerSpec(kind=kind, inverse=inverse), loop)
            vid = loop.name_to_id(IRI + "Alice")
            preds, objs = loop.get_hops(vid)
            keep, p = fs.hop_probabilities(
                preds.astype(np.int64), objs.astype(np.int64)
            )
            assert np.isclose(p.sum(), 1.0)
            assert (p <= 1.0 + 1e-12).all()


def test_cast_literals_goldens():
    assert np.isnan(cast_literals([[]])[0])
    out = cast_literals([[], []])
    assert len(out) == 2 and all(np.isnan(v) for v in out)
    assert cast_literals([[IRI + "Bob"]]) == [IRI + "Bob"]
    assert cast_literals([[IRI + "Bob", IRI + "Dean"]]) == [(IRI + "Bob", IRI + "Dean")]
    assert cast_literals([["0.42"]]) == [0.42]
    assert cast_literals([["0.42", "0.37"]]) == [(0.42, 0.37)]


def test_pliterals_chain(graphs):
    _, _, graph = graphs
    chain = [IRI + "knows"]
    assert set(pliterals(graph, IRI + "Alice", chain)) == {IRI + "Bob", IRI + "Dean"}
    assert pliterals(graph, IRI + "Bob", chain) == [IRI + "Casper"]
    assert pliterals(graph, IRI + "Dean", chain) == []
    # depth-2 chain: Alice -knows-> {Bob,Dean} -knows-> {Casper}
    assert pliterals(graph, IRI + "Alice", [IRI + "knows", IRI + "knows"]) == [
        IRI + "Casper"
    ]


def test_get_literals_matrix(graphs):
    gi = GraphIndex.from_table(synth.triples_table(synth.GRAPH))
    res = get_literals(
        gi,
        [IRI + "Alice", IRI + "Bob", IRI + "Dean"],
        [[IRI + "knows"]],
    )
    assert res[0] == [(IRI + "Bob", IRI + "Dean")] or res[0] == [
        (IRI + "Dean", IRI + "Bob")
    ]
    assert res[1] == [IRI + "Casper"]
    assert len(res[2]) == 1 and np.isnan(res[2][0])


def test_personalized_pagerank_core():
    import numpy as np

    from pyrdf2vec_ray.samplers import _pagerank_from_pairs

    # triangle 0->1->2->0 plus pendant 2->3 (3 dangling)
    src = np.array([0, 1, 2, 2], dtype=np.int64)
    dst = np.array([1, 2, 0, 3], dtype=np.int64)
    ent = np.ones(4, dtype=bool)

    # personalization=None is bit-identical to the pre-parameter path
    base = _pagerank_from_pairs(src, dst, ent, 4, max_iter=50)
    unif = _pagerank_from_pairs(src, dst, ent, 4, max_iter=50,
                                personalization=np.full(4, 0.25))
    assert (base == unif).all()

    # seed mass on node 0 only: scores sum to 1 and concentrate on the
    # seed's forward orbit (0 -> 1 -> 2), not the pendant
    p = np.array([1.0, 0, 0, 0])
    ppr = _pagerank_from_pairs(src, dst, ent, 4, max_iter=100,
                               personalization=p)
    assert abs(ppr.sum() - 1.0) < 1e-9
    assert ppr[0] > ppr[3] and ppr[1] > ppr[3]

    import pytest

    with pytest.raises(ValueError):
        _pagerank_from_pairs(src, dst, ent, 4,
                             personalization=np.array([1.0, 0.0]))
