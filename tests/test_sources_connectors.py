"""N-Triples source + SPARQL connector parity (reference
tests/test_connectors.py:29-99, graphs tests for file load)."""

import numpy as np

from pyrdf2vec_ray.connectors import SPARQLConnector, res2hops
from pyrdf2vec_ray.sources.ntriples import parse_ntriples_lines, read_ntriples
from pyrdf2vec_ray.util import to_table

NT = """# comment
<http://a> <http://p> <http://b> .
<http://a> <http://p> "0.42" .
<http://a> <http://q> "hello world"@en .
<http://a> <http://p> <http://b> .
bad line ignored
"""


def test_parse_ntriples_lines():
    triples = parse_ntriples_lines(NT.splitlines())
    assert ("http://a", "http://p", "http://b") in triples
    assert ("http://a", "http://p", "0.42") in triples
    assert ("http://a", "http://q", "hello world") in triples
    assert len(triples) == 4  # dup kept at parse level


def test_read_ntriples_dedups_and_skips(tmp_path):
    p = tmp_path / "g.nt"
    p.write_text(NT)
    ds = read_ntriples(str(p), skip_predicates=frozenset({"http://q"}))
    t = to_table(ds)
    got = set(zip(t["subj"].to_pylist(), t["pred"].to_pylist(), t["obj"].to_pylist()))
    assert got == {
        ("http://a", "http://p", "http://b"),
        ("http://a", "http://p", "0.42"),
    }


def test_sparql_query_construction():
    c = SPARQLConnector("http://example.org/sparql")
    assert (
        c.get_query("http://x#E")
        == "SELECT ?p ?o WHERE { <http://x#E> ?p ?o . }"
    )
    q = c.get_query("http://x#E", ["http://x#p1", "http://x#p2"])
    assert q == (
        "SELECT ?o WHERE { <http://x#E> <http://x#p1> ?o1 . "
        "?o1 <http://x#p2> ?o . }"
    )


def test_res2literals_goldens():
    r2l = SPARQLConnector.res2literals
    assert np.isnan(r2l([]))
    assert r2l([{"o": {"value": "0.42"}}]) == 0.42
    assert r2l([{"o": {"value": "x"}}]) == "x"
    assert r2l([{"o": {"value": "1"}}, {"o": {"value": "y"}}]) == (1.0, "y")


def test_res2hops_skip():
    res = [
        {"p": {"value": "http://p"}, "o": {"value": "http://b"}},
        {"p": {"value": "http://skip"}, "o": {"value": "http://c"}},
    ]
    assert res2hops(res, frozenset({"http://skip"})) == [("http://p", "http://b")]


def test_read_entities_csv_tsv(tmp_path):
    from pyrdf2vec_ray.sources.graph_edit import read_entities

    c = tmp_path / "e.csv"
    c.write_text("entity,label\nhttp://x#A,1\nhttp://x#B,0\n")
    assert read_entities(str(c)) == ["http://x#A", "http://x#B"]
    t = tmp_path / "e.tsv"
    t.write_text("entity\tlabel\nhttp://x#C\t1\n")
    assert read_entities(str(t)) == ["http://x#C"]


def test_fetch_hops_dataset_fake_endpoint():
    """Live fetch path with an injected in-process endpoint: the actor
    pool streams entities into hop queries and parses responses to the
    same triples the local graph holds (reference remote mode,
    kg.py:218-239)."""
    from pyrdf2vec_ray import synth
    from pyrdf2vec_ray.connectors import FakeSPARQLEndpoint, fetch_hops_dataset
    from pyrdf2vec_ray.util import to_table

    fake = FakeSPARQLEndpoint(synth.LOOP)
    ents = [synth.IRI_PREFIX + n for n in ("Alice", "Bob", "Dean")]
    t = to_table(
        fetch_hops_dataset(ents, "http://fake/sparql", fake, concurrency=(1, 2))
    )
    got = set(zip(t["subj"].to_pylist(), t["pred"].to_pylist(), t["obj"].to_pylist()))
    assert got == set(synth.LOOP)


def test_fetch_skip_predicates_and_cache():
    from pyrdf2vec_ray import synth
    from pyrdf2vec_ray.connectors import (
        FakeSPARQLEndpoint,
        FetchingSPARQLConnector,
        res2hops,
    )

    fake = FakeSPARQLEndpoint(synth.LOOP)
    c = FetchingSPARQLConnector("http://fake/sparql", fake)
    q = c.get_query(synth.IRI_PREFIX + "Alice")
    r1 = c.fetch(q)
    r2 = c.fetch(q)
    assert r1 == r2
    assert c.n_transport_calls == 1          # second hit served by TTL cache
    hops = res2hops(r1, frozenset([synth.IRI_PREFIX + "knows"]))
    assert hops == []                         # skip filter (kg.py:489-490)


def test_fake_endpoint_literal_chain():
    from pyrdf2vec_ray import synth
    from pyrdf2vec_ray.connectors import FakeSPARQLEndpoint, SPARQLConnector

    fake = FakeSPARQLEndpoint(synth.LONG_CHAIN)
    c = SPARQLConnector("e")
    q = c.get_query(
        synth.IRI_PREFIX + "Alice",
        [synth.IRI_PREFIX + "knows", synth.IRI_PREFIX + "knows"],
    )
    res = fake("e", q)
    vals = sorted(b["o"]["value"] for b in res)
    assert vals == [synth.IRI_PREFIX + "Mathilde"]
