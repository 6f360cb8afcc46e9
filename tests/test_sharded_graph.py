"""Sharded graph index: built from a Dataset with NO driver-side
materialization, and walk-for-walk identical to the broadcast CSR."""

import numpy as np
import pytest
import ray.data

from pyrdf2vec_ray import synth
from pyrdf2vec_ray.samplers import SamplerSpec
from pyrdf2vec_ray.state.graph_index import GraphIndex
from pyrdf2vec_ray.state.sharded_graph import ShardedGraphIndex
from pyrdf2vec_ray.util import to_table
from pyrdf2vec_ray.walkers import WalkerSpec, extract_walks

IRI = synth.IRI_PREFIX


def _walk_sets(gi, entities, spec):
    t = to_table(extract_walks(gi, entities, spec, batch_size=4))
    out = {}
    for e, walks in zip(t["entity"].to_pylist(), t["walks"].to_pylist()):
        out.setdefault(e, set()).update(tuple(w) for w in walks)
    return out


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    """(broadcast, sharded) indexes over the same synthetic graph —
    LONG_CHAIN plus a denser deterministic block so sampling has real
    branching."""
    triples = synth.LONG_CHAIN + synth.LOOP + [
        (synth.entity_iri(i), IRI + f"p{i % 3}", synth.entity_iri((i * 7 + 1) % 40))
        for i in range(120)
    ]
    table = synth.triples_table(triples)
    bc = GraphIndex.from_table(table)
    ds = ray.data.from_arrow(table)
    sh = ShardedGraphIndex.build(
        ds, num_shards=4,
        scratch_dir=str(tmp_path_factory.mktemp("shards")),
    )
    return bc, sh


def test_build_without_driver_materialization(tmp_path, monkeypatch):
    """The build path must never collect the triples Dataset to the
    driver (the round-1 scale-killer: GraphIndex.from_dataset →
    util.to_table)."""
    import pyrdf2vec_ray.state.graph_index as gim
    import pyrdf2vec_ray.util as util

    def boom(*a, **k):
        raise AssertionError("driver-side materialization of the triples")

    monkeypatch.setattr(util, "to_table", boom)
    monkeypatch.setattr(gim.GraphIndex, "from_dataset", staticmethod(boom))
    ds = ray.data.from_arrow(synth.triples_table(synth.LONG_CHAIN))
    sh = ShardedGraphIndex.build(ds, num_shards=3, scratch_dir=str(tmp_path))
    g = sh.local()
    preds, objs = g.get_hops(IRI + "Alice")
    assert {str(o) for o in objs} == {IRI + "Bob", IRI + "Dean"}


def test_contains_routing(pair):
    _, sh = pair
    g = sh.local()
    names = [IRI + "Alice", IRI + "Julio", synth.entity_iri(0), IRI + "Nope",
             IRI + "knows"]
    got = g.contains(names)
    # Julio exists only as an object; 'knows' is predicate-only (not an
    # entity); routing hits exactly the owning shard per direction
    assert got.tolist() == [True, True, True, False, False]


def test_bfs_walks_identical(pair):
    bc, sh = pair
    ents = [IRI + "Alice", IRI + "Emma", synth.entity_iri(3)]
    for md5_bytes in (None, 8):
        for with_reverse in (False, True):
            spec = WalkerSpec(strategy="random", max_depth=2, max_walks=None,
                              md5_bytes=md5_bytes, with_reverse=with_reverse)
            assert _walk_sets(bc, ents, spec) == _walk_sets(sh, ents, spec)


def test_custom_walker_plugin_end_to_end(pair):
    """register_walker (the reference's open Walker ABC,
    walker.py:168-212) runs a user strategy through extract_walks on
    BOTH backends, with the same dedup+sort contract as built-ins.
    The plugin is defined locally so cloudpickle ships it by VALUE
    (plugins from installed packages ship by reference instead)."""
    from pyrdf2vec_ray.walkers import register_walker

    def hop_pairs_walker(graph, entity, spec):
        # depth-1 (root, pred, obj) plus reverse (subj, pred, root)
        walks = []
        preds, objs = graph.get_hops(entity)
        for p, o in zip(preds, objs):
            walks.append((entity, p, o))
        rpreds, subs = graph.get_hops(entity, is_reverse=True)
        for p, s in zip(rpreds, subs):
            walks.append((s, p, entity))
        return walks or [(entity,)]

    register_walker("hop_pairs", hop_pairs_walker)
    bc, sh = pair
    ents = [IRI + "Alice", synth.entity_iri(3)]
    spec = WalkerSpec(strategy="hop_pairs", max_depth=1)
    got_bc = _walk_sets(bc, ents, spec)
    got_sh = _walk_sets(sh, ents, spec)
    assert got_bc == got_sh
    # ground truth from the broadcast CSR directly
    g = bc.local()
    for e in ents:
        vid = g.name_to_id(e)
        preds, objs = g.get_hops(vid)
        names = g.a.names
        want = {(e, str(names[p]), str(names[o]))
                for p, o in zip(preds, objs)}
        rp, rs = g.get_hops(vid, is_reverse=True)
        want |= {(str(names[s]), str(names[p]), e) for p, s in zip(rp, rs)}
        assert got_bc[e] == (want or {(e,)})
    with pytest.raises(ValueError):
        WalkerSpec(strategy="not_registered")


def test_dataset_roots_identical_to_list_roots(pair):
    """Dataset-native root input (the scale form: roots stream, keep-set
    is the crc32-sharded sorted-name index) must be bit-identical to the
    reference-API list form — with md5 ACTIVE so the keep-set membership
    actually decides hashing (non-root walk vertices hash, roots don't)."""
    import pyarrow as pa

    import ray.data

    bc, sh = pair
    ents = [IRI + "Alice", IRI + "Emma", synth.entity_iri(3)]
    roots_ds = ray.data.from_arrow(
        pa.table({"entity": pa.array(ents, pa.string())})
    )
    spec = WalkerSpec(strategy="random", max_depth=2, max_walks=None,
                      md5_bytes=8)
    for gi in (bc, sh):
        assert _walk_sets(gi, roots_ds, spec) == _walk_sets(gi, ents, spec)


@pytest.mark.parametrize("kind,inverse,split", [
    ("uniform", False, False),
    ("objfreq", False, False),
    ("objfreq", True, True),
    ("predfreq", False, False),
    ("objpredfreq", False, False),
    ("wide", False, False),
    ("pagerank", False, False),
])
def test_dfs_sampled_walks_identical(pair, kind, inverse, split):
    """Same RNG stream + same candidate order + bit-equal weights →
    identical sampled walks on both backends."""
    bc, sh = pair
    ents = [synth.entity_iri(i) for i in (0, 3, 5, 8)]
    spec = WalkerSpec(
        strategy="random", max_depth=3, max_walks=6, random_state=17,
        sampler=SamplerSpec(kind=kind, inverse=inverse, split=split),
    )
    assert _walk_sets(bc, ents, spec) == _walk_sets(sh, ents, spec)


def test_other_strategies_identical(pair):
    bc, sh = pair
    ents = [IRI + "Alice", synth.entity_iri(3)]
    for strategy in ("anonymous", "walklet", "split", "halk", "ngram"):
        spec = WalkerSpec(strategy=strategy, max_depth=2, max_walks=None)
        assert _walk_sets(bc, ents, spec) == _walk_sets(sh, ents, spec), strategy


def test_missing_entity_raises_in_worker(pair):
    _, sh = pair
    spec = WalkerSpec(strategy="random", max_depth=1, max_walks=None)
    with pytest.raises(Exception, match="not in the Knowledge Graph"):
        to_table(extract_walks(sh, [IRI + "Ghost"], spec, batch_size=2))


def test_wl_walks_identical(pair):
    """WL labels from the parquet-backed Dataset are byte-identical to
    the CSR fit, so WL walks match across backends."""
    bc, sh = pair
    ents = [IRI + "Alice", synth.entity_iri(3)]
    spec = WalkerSpec(strategy="wl", max_depth=2, max_walks=None,
                      wl_iterations=2)
    assert _walk_sets(bc, ents, spec) == _walk_sets(sh, ents, spec)


def test_community_walks_identical(pair):
    """Louvain from the distinct-edge Dataset produces the same compact
    partition, ids and member order as the broadcast fit — teleporting
    walks match across backends."""
    bc, sh = pair
    ents = [synth.entity_iri(i) for i in (0, 3, 5)]
    spec = WalkerSpec(strategy="community", max_depth=2, max_walks=5,
                      random_state=11)
    assert _walk_sets(bc, ents, spec) == _walk_sets(sh, ents, spec)


def test_community_partition_identical(pair):
    from pyrdf2vec_ray.stages.community import (
        detect_communities,
        detect_communities_from_dataset,
    )

    bc, sh = pair
    cs_b = detect_communities(bc.local())
    cs_n = detect_communities_from_dataset(sh.triples_dataset())
    names = bc.local().a.names
    ents = np.flatnonzero(bc.local().a.is_entity)
    for vid in ents:
        assert cs_b.community_of[vid] == cs_n.community_of[str(names[vid])]
    assert len(cs_b.members) == len(cs_n.members)
    for mb, mn in zip(cs_b.members, cs_n.members):
        assert [str(names[v]) for v in mb] == [str(x) for x in mn]


def test_name_sampler_weights_match_broadcast(pair):
    """NameFittedSampler lookups equal FittedSampler values for the same
    hop candidates (integer counts and the shared pagerank core)."""
    from pyrdf2vec_ray.samplers import FittedSampler, NameFittedSampler

    bc, sh = pair
    g = bc.local()
    vid = g.name_to_id(synth.entity_iri(3))
    preds, objs = g.get_hops(vid)
    names = g.a.names
    pred_names = [str(names[p]) for p in preds]
    obj_names = [str(names[o]) for o in objs]
    for kind in ("objfreq", "predfreq", "objpredfreq", "wide", "pagerank"):
        spec = SamplerSpec(kind=kind)
        f_b = FittedSampler.fit(spec, g)
        f_n = NameFittedSampler.fit(spec, sh.triples_dataset())
        kb, pb = f_b.hop_probabilities(list(preds), list(objs))
        kn, pn = f_n.hop_probabilities(pred_names, obj_names)
        assert kb.tolist() == kn.tolist()
        np.testing.assert_array_equal(pb, pn)


def test_literals_identical_across_backends(pair):
    from pyrdf2vec_ray.literals import get_literals, literals_dataset

    bc, sh = pair
    ents = [IRI + "Alice", IRI + "Bob"]
    chains = [[IRI + "knows"], [IRI + "knows", IRI + "knows"]]
    assert get_literals(bc, ents, chains) == get_literals(sh, ents, chains)
    t_b = to_table(literals_dataset(bc, ents, chains, concurrency=1))
    t_s = to_table(literals_dataset(sh, ents, chains, concurrency=1))
    assert t_b.to_pylist() == t_s.to_pylist()


@pytest.mark.parametrize("depth", [0, 2, 6])
@pytest.mark.parametrize("max_walks", [None, 3])
def test_sharded_walk_shape_invariants(pair, depth, max_walks):
    """Reference walk-shape invariants (tests/walkers/*) hold on the
    sharded backend too: length bound, root position, count bound."""
    _, sh = pair
    ents = [IRI + "Alice", synth.entity_iri(5)]
    spec = WalkerSpec(strategy="random", max_depth=depth,
                      max_walks=max_walks, random_state=7)
    out = _walk_sets(sh, ents, spec)
    for e, walks in out.items():
        assert walks, e
        for w in walks:
            assert len(w) <= 2 * depth + 1
            assert len(w) % 2 == 1
        if max_walks is not None:
            assert len(walks) <= max_walks
        # root present at position 0 for every non-hashed walk
        assert all(w[0] == e for w in walks)


def test_lazy_shard_owner_routing(pair):
    """VERDICT r4 item 2: a worker-side view resolves shards on first
    touch — one entity's hops map only its owner shard (plus the shards
    its neighbors route to when asked), never all 2·S up front."""
    _, sh = pair
    g = sh.local()
    assert g.mapped_count() == 0          # nothing resident at creation
    preds, objs = g.get_hops(IRI + "Alice")
    assert len(objs) > 0
    assert g.mapped_count() == 1          # exactly the owner (fwd) shard
    # existence check touches fwd+rev of ONE shard, not 2·S = 8
    g.contains_one(IRI + "Emma")
    assert g.mapped_count() <= 3
    # parity with the eager form on every vertex in the graph
    import ray as _ray

    eager = type(g)(
        [_ray.get(r) for r in sh.fwd_refs],
        [_ray.get(r) for r in sh.rev_refs],
    )
    for name in [IRI + "Alice", IRI + "Julio", synth.entity_iri(0),
                 IRI + "Nope"]:
        for rev in (False, True):
            pl, ol = g.get_hops(name, rev)
            pe, oe = eager.get_hops(name, rev)
            assert pl.tolist() == pe.tolist()
            assert ol.tolist() == oe.tolist()


def test_keepset_lazy_and_shard_routed_input(pair, tmp_path):
    """Dataset roots: the keep-set parquet doubles as the walk input and
    its fragments are shard-pure; ShardedKeepSet resolves lazily."""
    import pyarrow.parquet as pq
    import zlib

    from pyrdf2vec_ray.walkers import ShardedKeepSet, build_keepset_refs

    ents = [IRI + "Alice", IRI + "Bob", IRI + "Carol", synth.entity_iri(5)]
    ds = ray.data.from_items([{"entity": e} for e in ents])
    refs, root = build_keepset_refs(ds, num_shards=4,
                                    scratch_dir=str(tmp_path))
    ks = ShardedKeepSet.from_refs(refs)
    assert sum(a is not None for a in ks.shards) == 0
    assert (IRI + "Alice") in ks and (IRI + "Nope") not in ks
    assert sum(a is not None for a in ks.shards) <= 2
    # read-back fragments are shard-pure: every file holds one shard
    t = pq.read_table(root)
    for e in t["entity"].to_pylist():
        assert e in ks   # round-trips
    shards_seen = {zlib.crc32(e.encode()) % 4 for e in ents}
    assert len(shards_seen) >= 2   # the fixture actually spans shards
