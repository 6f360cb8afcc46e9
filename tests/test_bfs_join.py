"""Join-based BFS (the no-broadcast scale path) must produce exactly the
same walk sets as the broadcast-graph actor BFS."""

from pyrdf2vec_ray import synth
from pyrdf2vec_ray.pipelines.bfs_join import bfs_walks_join
from pyrdf2vec_ray.sources.graph_edit import from_triples
from pyrdf2vec_ray.state.graph_index import GraphIndex
from pyrdf2vec_ray.util import to_table
from pyrdf2vec_ray.walkers import WalkerSpec, extract_walks

IRI = synth.IRI_PREFIX
ENTITIES = [IRI + n for n in ["Alice", "Bob", "Dean"]]


def actor_walks(triples, entities, depth):
    gi = GraphIndex.from_table(synth.triples_table(triples))
    spec = WalkerSpec(strategy="random", max_depth=depth, max_walks=None,
                      md5_bytes=None)
    t = to_table(extract_walks(gi, entities, spec, concurrency=1))
    out = {}
    for e, walks in zip(t["entity"].to_pylist(), t["walks"].to_pylist()):
        out.setdefault(e, set()).update(tuple(w) for w in walks)
    return out


def join_walks(triples, entities, depth):
    ds = from_triples(triples)
    t = to_table(bfs_walks_join(ds, entities, depth, num_buckets=4))
    out = {}
    for e, w in zip(t["entity"].to_pylist(), t["walk"].to_pylist()):
        out.setdefault(e, set()).add(tuple(w))
    return out


def test_join_bfs_matches_actor_bfs_loop():
    for depth in (1, 2, 3):
        assert join_walks(synth.LOOP, ENTITIES, depth) == actor_walks(
            synth.LOOP, ENTITIES, depth
        ), depth


def test_join_bfs_matches_actor_bfs_chain_dead_ends():
    ents = [IRI + n for n in ["Alice", "Emma", "Julio"]]
    for depth in (2, 4):
        assert join_walks(synth.LONG_CHAIN, ents, depth) == actor_walks(
            synth.LONG_CHAIN, ents, depth
        ), depth
