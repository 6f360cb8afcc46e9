"""Distributed (parameter-server) Word2Vec: determinism across runs,
shape/compat with the single-actor trainer, transformer integration."""

import numpy as np

from pyrdf2vec_ray import synth
from pyrdf2vec_ray.embedders_dist import DistributedWord2Vec
from pyrdf2vec_ray.pipelines.rdf2vec import RDF2VecTransformer
from pyrdf2vec_ray.state.graph_index import GraphIndex
from pyrdf2vec_ray.walkers import WalkerSpec

CORPUS = [
    [["a", "p", "b"], ["a", "q", "c"], ["b", "p", "c"]],
    [["c", "r", "a"], ["c", "p", "b"], ["b", "q", "a"]],
] * 4


def test_distributed_deterministic():
    va = DistributedWord2Vec(num_workers=2, vector_size=16, epochs=3, seed=5) \
        .fit(CORPUS).transform(["a", "b", "c"])
    vb = DistributedWord2Vec(num_workers=2, vector_size=16, epochs=3, seed=5) \
        .fit(CORPUS).transform(["a", "b", "c"])
    assert all(np.array_equal(x, y) for x, y in zip(va, vb))
    assert va[0].shape == (16,)
    assert not np.allclose(va[0], va[1])


def test_distributed_in_transformer():
    gi = GraphIndex.from_table(synth.triples_table(synth.LOOP))
    entities = [synth.IRI_PREFIX + n for n in ["Alice", "Bob", "Dean"]]
    t = RDF2VecTransformer(
        embedder=DistributedWord2Vec(num_workers=2, vector_size=8, epochs=2, seed=3),
        walkers=[WalkerSpec(max_depth=2, max_walks=None, random_state=3)],
    )
    emb, _ = t.fit_transform(gi, entities)
    assert len(emb) == 3 and emb[0].shape == (8,)
