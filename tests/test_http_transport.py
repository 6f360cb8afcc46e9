"""Live HTTP SPARQL transport (stdlib urllib) against an in-process
HTTP server speaking the SPARQL JSON protocol — reference parity for the
sync client (reference connectors.py:121-134): GET ?query= with an
Accept: application/sparql-results+json header, results.bindings out."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from pyrdf2vec_ray.connectors import (
    FakeSPARQLEndpoint,
    FetchingSPARQLConnector,
    SPARQLConnector,
    fetch_hops_dataset,
    http_fetch,
    res2hops,
)

TRIPLES = [
    ("urn:a", "urn:p", "urn:b"),
    ("urn:a", "urn:p", "urn:c"),
    ("urn:a", "urn:q", "urn:d"),
    ("urn:b", "urn:p", "urn:e"),
]


@pytest.fixture(scope="module")
def sparql_server():
    """ThreadingHTTPServer answering SPARQL GETs from the fake triple
    store, with request introspection for header/param assertions."""
    fake = FakeSPARQLEndpoint(TRIPLES)
    seen = []

    class Handler(BaseHTTPRequestHandler):
        def do_HEAD(self):
            url = urlparse(self.path)
            ok = url.path == "/sparql" and "query" in parse_qs(url.query)
            self.send_response(200 if ok else 404)
            self.end_headers()

        def do_GET(self):
            url = urlparse(self.path)
            if url.path != "/sparql":
                self.send_response(404)
                self.end_headers()
                return
            query = parse_qs(url.query)["query"][0]
            seen.append(
                {"query": query, "accept": self.headers.get("Accept")}
            )
            bindings = fake("", query)
            body = json.dumps(
                {"head": {"vars": ["p", "o"]},
                 "results": {"bindings": bindings}}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/sparql-results+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/sparql", seen
    srv.shutdown()


def test_http_fetch_parses_bindings(sparql_server):
    endpoint, seen = sparql_server
    q = SPARQLConnector(endpoint).get_query("urn:a")
    res = http_fetch(endpoint, q)
    assert sorted(res2hops(res)) == [
        ("urn:p", "urn:b"), ("urn:p", "urn:c"), ("urn:q", "urn:d")
    ]
    assert seen[-1]["accept"] == "application/sparql-results+json"
    assert seen[-1]["query"] == q


def test_default_transport_is_live_http(sparql_server):
    endpoint, _ = sparql_server
    c = FetchingSPARQLConnector(endpoint)   # no fetch_fn injected
    q = c.get_query("urn:b")
    r1 = c.fetch(q)
    r2 = c.fetch(q)                          # TTL cache: one transport call
    assert r1 == r2 == [{"p": {"value": "urn:p"}, "o": {"value": "urn:e"}}]
    assert c.n_transport_calls == 1


def test_afetch_bundles_over_http(sparql_server):
    endpoint, _ = sparql_server
    c = FetchingSPARQLConnector(endpoint)
    queries = [c.get_query(e) for e in ("urn:a", "urn:b", "urn:a")]
    res = c.afetch(queries, max_concurrency=4)
    assert res[0] == res[2]                  # single flight per distinct query
    assert c.n_transport_calls == 2


def test_check_location_url_probe_and_files(sparql_server, tmp_path):
    """Reference _check_location parity (utils/validation.py:39-62,83-98):
    live HEAD probe for URLs, existence check for files."""
    from pyrdf2vec_ray.connectors import check_location, is_valid_url

    endpoint, _ = sparql_server
    assert is_valid_url(endpoint)
    check_location(endpoint)                      # reachable: no raise
    assert not is_valid_url(endpoint.replace("/sparql", "/nope"))
    with pytest.raises(ValueError, match="valid URL"):
        check_location(endpoint.replace("/sparql", "/nope"))
    check_location(endpoint + "x", probe_url=False)   # offline mode
    f = tmp_path / "g.nt"
    f.write_text("")
    check_location(str(f))
    with pytest.raises(FileNotFoundError):
        check_location(str(tmp_path / "missing.nt"))
    check_location(None)


def test_fetch_hops_dataset_live(ray_session, sparql_server):
    """The fetcher actor pool end-to-end over real HTTP: entities →
    hop triples Dataset (reference remote-KG mode, kg.py:218-239)."""
    endpoint, _ = sparql_server
    ds = fetch_hops_dataset(
        ["urn:a", "urn:b"], endpoint, fetch_fn=None, concurrency=(1, 2),
    )
    rows = sorted(
        (r["subj"], r["pred"], r["obj"]) for r in ds.take_all()
    )
    assert rows == sorted(TRIPLES)
