"""Turtle / RDF-XML sources parse to the same triples as the N-Triples
form (reference S1 fmt surface, kg.py:142-164)."""

import pytest

from pyrdf2vec_ray.sources.rdf import (
    RDF_TYPE,
    parse_rdfxml,
    parse_turtle,
    read_rdf,
)
from pyrdf2vec_ray.util import to_table

EX = "http://example.org/"

TTL = """\
@prefix ex: <http://example.org/> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
# a comment
ex:alice a foaf:Person ;
    foaf:knows ex:bob, ex:dean ;
    foaf:name "Alice\\nSmith"@en ;
    ex:age 33 .

<http://example.org/bob> foaf:knows ex:dean .
ex:dean ex:salary "12.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .
"""

NT = """\
<http://example.org/alice> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://xmlns.com/foaf/0.1/Person> .
<http://example.org/alice> <http://xmlns.com/foaf/0.1/knows> <http://example.org/bob> .
<http://example.org/alice> <http://xmlns.com/foaf/0.1/knows> <http://example.org/dean> .
<http://example.org/alice> <http://xmlns.com/foaf/0.1/name> "Alice\\nSmith"@en .
<http://example.org/alice> <http://example.org/age> "33" .
<http://example.org/bob> <http://xmlns.com/foaf/0.1/knows> <http://example.org/dean> .
<http://example.org/dean> <http://example.org/salary> "12.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .
"""

OWL_XML = """\
<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:owl="http://www.w3.org/2002/07/owl#"
         xmlns:ex="http://example.org/">
  <owl:NamedIndividual rdf:about="http://example.org/alice">
    <ex:knows rdf:resource="http://example.org/bob"/>
    <ex:name>Alice</ex:name>
    <ex:knows>
      <owl:NamedIndividual rdf:about="http://example.org/dean"/>
    </ex:knows>
  </owl:NamedIndividual>
  <rdf:Description rdf:about="http://example.org/bob">
    <ex:age>42</ex:age>
  </rdf:Description>
</rdf:RDF>
"""


def test_turtle_matches_ntriples(tmp_path):
    from pyrdf2vec_ray.sources.ntriples import parse_ntriples_lines

    ttl = set(parse_turtle(TTL))
    nt = set(parse_ntriples_lines(NT.splitlines()))
    assert ttl == nt


def test_turtle_blank_nodes_and_collections():
    ttl = """\
@prefix ex: <http://example.org/> .
ex:a ex:rel [ ex:p ex:b ; ex:q "v" ] .
ex:c ex:list ( ex:x ex:y ) .
"""
    triples = parse_turtle(ttl)
    by_pred = {}
    for s, p, o in triples:
        by_pred.setdefault(p, []).append((s, o))
    # anonymous bnode carries its nested property list
    bnode = by_pred[EX + "rel"][0][1]
    assert bnode.startswith("_:")
    assert (bnode, EX + "b") in by_pred[EX + "p"]
    assert (bnode, "v") in by_pred[EX + "q"]
    # collection unrolls to rdf:first/rest
    firsts = {o for _, o in
              by_pred["http://www.w3.org/1999/02/22-rdf-syntax-ns#first"]}
    assert firsts == {EX + "x", EX + "y"}


def test_turtle_base_and_sparql_prefix():
    ttl = """\
BASE <http://example.org/>
PREFIX ex: <http://example.org/>
<alice> ex:knows <bob> .
"""
    assert parse_turtle(ttl) == [(EX + "alice", EX + "knows", EX + "bob")]


def test_rdfxml_owl_style():
    triples = set(parse_rdfxml(OWL_XML))
    OWL = "http://www.w3.org/2002/07/owl#"
    assert (EX + "alice", RDF_TYPE, OWL + "NamedIndividual") in triples
    assert (EX + "alice", EX + "knows", EX + "bob") in triples
    assert (EX + "alice", EX + "knows", EX + "dean") in triples
    assert (EX + "alice", EX + "name", "Alice") in triples
    assert (EX + "dean", RDF_TYPE, OWL + "NamedIndividual") in triples
    # rdf:Description asserts NO type triple
    assert (EX + "bob", EX + "age", "42") in triples
    assert not any(s == EX + "bob" and p == RDF_TYPE for s, p, _ in triples)


def test_read_rdf_dispatch(tmp_path):
    ttl_path = tmp_path / "g.ttl"
    ttl_path.write_text(TTL)
    owl_path = tmp_path / "g.owl"
    owl_path.write_text(OWL_XML)

    t = to_table(read_rdf(str(ttl_path)))
    assert t.num_rows == 7
    # disjoint predicates (ex: vs foaf:): plain union, no collapse
    both = to_table(read_rdf([str(ttl_path), str(owl_path)]))
    assert both.num_rows == 7 + 6
    # identical content across files dedups to one copy (set semantics)
    ttl2 = tmp_path / "copy.ttl"
    ttl2.write_text(TTL)
    deduped = to_table(read_rdf([str(ttl_path), str(ttl2)]))
    assert deduped.num_rows == 7

    with pytest.raises(ValueError, match="cannot infer"):
        read_rdf(str(tmp_path / "g.unknown"))


N3 = TTL  # n3 ⊇ turtle: the same doc must parse identically via .n3

TRIG = """\
@prefix ex: <http://example.org/> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
ex:alice foaf:name "Alice\\nSmith"@en .
GRAPH ex:g1 {
    ex:alice a foaf:Person ;
        foaf:knows ex:bob, ex:dean .
}
ex:g2 {
    <http://example.org/bob> foaf:knows ex:dean .
    ex:dean ex:salary "12.5"^^<http://www.w3.org/2001/XMLSchema#decimal> .
}
{ ex:alice ex:age 33 }
"""

JSONLD = """\
{
  "@context": {
    "ex": "http://example.org/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "name": "http://xmlns.com/foaf/0.1/name",
    "knows": "http://xmlns.com/foaf/0.1/knows"
  },
  "@graph": [
    {
      "@id": "ex:alice",
      "@type": "foaf:Person",
      "knows": [{"@id": "ex:bob"}, {"@id": "ex:dean"}],
      "name": {"@value": "Alice\\nSmith", "@language": "en"},
      "ex:age": 33
    },
    {"@id": "http://example.org/bob", "knows": {"@id": "ex:dean"}},
    {"@id": "ex:dean", "ex:salary": {"@value": "12.5",
        "@type": "http://www.w3.org/2001/XMLSchema#decimal"}}
  ]
}
"""

NQ = "".join(
    line.rstrip().removesuffix(".").rstrip()
    + f" <http://example.org/g{i % 2}> .\n"
    for i, line in enumerate(NT.splitlines())
)


def test_n3_trig_jsonld_nquads_match_ntriples(tmp_path):
    """TTL ≡ NT ≡ N3 ≡ TriG ≡ JSON-LD ≡ NQ parity: every format the
    reference accepts via rdflib (KG(location, fmt=...), kg.py:142-164)
    parses to the same triple set here."""
    from pyrdf2vec_ray.sources.ntriples import parse_ntriples_lines
    from pyrdf2vec_ray.sources.rdf import parse_jsonld, parse_trig

    want = set(parse_ntriples_lines(NT.splitlines()))
    assert set(parse_turtle(N3)) == want
    assert set(parse_trig(TRIG)) == want
    assert set(parse_jsonld(JSONLD)) == want
    assert set(parse_ntriples_lines(NQ.splitlines())) == want

    # end-to-end through read_rdf's extension dispatch
    for fname, text in [("g.n3", N3), ("g.trig", TRIG),
                        ("g.jsonld", JSONLD), ("g.nq", NQ)]:
        p = tmp_path / fname
        p.write_text(text)
        t = to_table(read_rdf(str(p)))
        got = set(zip(t["subj"].to_pylist(), t["pred"].to_pylist(),
                      t["obj"].to_pylist()))
        assert got == want, fname


def test_jsonld_list_and_bnodes():
    from pyrdf2vec_ray.sources.rdf import parse_jsonld

    doc = """
    {"@id": "http://e/x", "http://e/items":
        {"@list": [{"@id": "http://e/a"}, {"@value": true}]}}
    """
    triples = set(parse_jsonld(doc))
    firsts = {(s, o) for s, p, o in triples if p.endswith("#first")}
    assert {o for _, o in firsts} == {"http://e/a", "true"}
    rests = [t for t in triples if t[1].endswith("#rest")]
    assert len(rests) == 2


def test_read_rdf_skip_predicates(tmp_path):
    ttl_path = tmp_path / "g.ttl"
    ttl_path.write_text(TTL)
    t = to_table(
        read_rdf(str(ttl_path),
                 skip_predicates=frozenset(["http://xmlns.com/foaf/0.1/knows"]))
    )
    assert t.num_rows == 4
