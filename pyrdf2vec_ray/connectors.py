"""SPARQL connector surface (reference connectors.py).

This sandbox has no network, so ``fetch`` is abstract — but the
reference's testable behavior is the QUERY CONSTRUCTION
(connectors.py:136-154) and the RESPONSE CONVERSIONS (res2literals
connectors.py:156-176, _res2hops kg.py:469-491), reproduced here
exactly.  A live deployment plugs an HTTP ``fetch`` into
``SPARQLConnector`` and runs it as an actor pool
(``map_batches(FetcherActor, concurrency=N)``) with a per-actor session
+ cache, per SURVEY.md S2.
"""

from __future__ import annotations

import numpy as np


class Connector:
    """Abstract connector (reference connectors.py:16-71)."""

    def __init__(self, endpoint: str):
        self.endpoint = endpoint

    def fetch(self, query: str):
        raise NotImplementedError("plug an HTTP client in a live deployment")


class SPARQLConnector(Connector):
    def get_query(self, entity: str, preds: list[str] | None = None) -> str:
        """Reference connectors.py:136-154: hop query without preds, literal
        chain query with them."""
        query = f"SELECT ?p ?o WHERE {{ <{entity}> ?p "
        if preds:
            query = f"SELECT ?o WHERE {{ <{entity}> <{preds[0]}> "
            for i in range(1, len(preds)):
                query += f"?o{i} . ?o{i} <{preds[i]}> "
        query += "?o . }"
        return query

    @staticmethod
    def res2literals(res) -> float | str | tuple:
        """Reference connectors.py:156-176: [] → NaN, each value
        try-float-else-str, >1 → tuple."""
        if len(res) == 0:
            return np.nan
        literals = []
        for literal in res:
            try:
                literals.append(float(literal["o"]["value"]))
            except Exception:
                literals.append(literal["o"]["value"])
        if len(literals) > 1:
            return tuple(literals)
        return literals[0]


def res2hops(res, skip_predicates: frozenset[str] = frozenset()) -> list[tuple[str, str]]:
    """SPARQL JSON bindings → (pred, obj) hops (reference kg.py:469-491)."""
    hops = []
    for value in res:
        pred = value["p"]["value"]
        if pred not in skip_predicates:
            hops.append((pred, value["o"]["value"]))
    return hops


# ---- live fetch path (injectable transport) --------------------------------

import time as _time


def is_valid_url(url: str, timeout: float = 10.0) -> bool:
    """Endpoint reachability probe — reference parity
    (utils/validation.py:83-98): HEAD the endpoint with an ``ASK {}``
    query, valid iff it answers 200."""
    from urllib.parse import urlencode
    from urllib.request import Request, urlopen

    try:
        req = Request(
            url + ("&" if "?" in url else "?") + urlencode({"query": "ASK {}"}),
            method="HEAD",
        )
        with urlopen(req, timeout=timeout) as resp:
            return resp.status == 200
    except Exception:
        return False


def check_location(location: str | None, probe_url: bool = True) -> None:
    """Location validation — reference ``_check_location`` parity
    (utils/validation.py:39-62, wired into ``KG(location=...)`` at
    kg.py:65-66): http(s) locations must answer the HEAD probe (skipped
    when ``probe_url=False`` for offline construction), anything else
    must be an existing file."""
    if location is None:
        return
    if location.startswith(("http://", "https://")):
        if probe_url and not is_valid_url(location):
            raise ValueError(
                f"'location' must be a valid URL (got {location})"
            )
    else:
        import os

        if not os.path.isfile(location):
            raise FileNotFoundError(
                f"'location' must be a valid file (got {location})"
            )


def http_fetch(endpoint: str, query: str, timeout: float = 30.0) -> list[dict]:
    """Live SPARQL-protocol GET transport (stdlib urllib — requests /
    aiohttp are not in this container): the reference's sync client
    (reference connectors.py:121-134) sends ``?query=`` with an
    ``Accept: application/sparql-results+json`` header and returns the
    parsed ``results.bindings`` list.  Network-bound concurrency comes
    from ``FetchingSPARQLConnector.afetch``'s bounded thread pool (the
    aiohttp-equivalent bundling) plus the fetcher actor pool."""
    import json
    from urllib.parse import urlencode
    from urllib.request import Request, urlopen

    url = endpoint + ("&" if "?" in endpoint else "?") + urlencode(
        {"query": query}
    )
    req = Request(url, headers={"Accept": "application/sparql-results+json"})
    with urlopen(req, timeout=timeout) as resp:
        body = resp.read()
    return json.loads(body)["results"]["bindings"]


class TTLCache:
    """Minimal (maxsize, ttl) query cache with FIFO eviction — the
    reference wraps cachetools.TTLCache(1024, 1200) around every fetch
    (connectors.py:36-41, kg.py:107-112); cachetools is not available
    here so the same contract is implemented inline."""

    def __init__(self, maxsize: int = 1024, ttl: float = 1200.0):
        self.maxsize = maxsize
        self.ttl = ttl
        self._data: dict = {}

    def get(self, key):
        hit = self._data.get(key)
        if hit is None:
            return None
        value, t = hit
        if _time.monotonic() - t > self.ttl:
            del self._data[key]
            return None
        return value

    def put(self, key, value):
        if len(self._data) >= self.maxsize:
            self._data.pop(next(iter(self._data)))
        self._data[key] = (value, _time.monotonic())


class FetchingSPARQLConnector(SPARQLConnector):
    """SPARQLConnector with a pluggable transport: ``fetch_fn(endpoint,
    query) -> bindings list`` (the parsed ``results.bindings`` of the
    SPARQL JSON protocol).  The default transport is the live stdlib
    HTTP client (``http_fetch`` — exercised in tests against an
    in-process HTTP server); deployments can inject their own client and
    the test suite injects ``FakeSPARQLEndpoint``.  Responses are
    TTL-cached per connector instance (= per actor), like the
    reference's sync path (connectors.py:103-134)."""

    def __init__(self, endpoint: str, fetch_fn=None, cache: TTLCache | None = None):
        super().__init__(endpoint)
        self.fetch_fn = fetch_fn if fetch_fn is not None else http_fetch
        self.cache = cache if cache is not None else TTLCache()
        self.n_transport_calls = 0

    def fetch(self, query: str):
        hit = self.cache.get(query)
        if hit is not None:
            return hit
        self.n_transport_calls += 1
        res = self.fetch_fn(self.endpoint, query)
        self.cache.put(query, res)
        return res

    def afetch(self, queries: list[str], max_concurrency: int = 16):
        """Bundled fetch (reference connectors.py:89-101
        ``asyncio.gather``): cache misses are fetched CONCURRENTLY —
        via ``asyncio.gather`` when the injected transport is a
        coroutine function, else via a bounded thread pool (the
        aiohttp stand-in; SPARQL fetches are network-bound, so threads
        give the same wall-clock bundling).  Each distinct query is
        fetched once (single flight) and cached; results return in
        query order with the same cache state as sequential fetches."""
        results: dict[str, object] = {}
        misses: list[str] = []
        seen: set[str] = set()
        for q in queries:
            if q in seen:
                continue
            seen.add(q)
            hit = self.cache.get(q)
            if hit is not None:
                results[q] = hit
            else:
                misses.append(q)
        if misses:
            import inspect

            self.n_transport_calls += len(misses)
            if inspect.iscoroutinefunction(self.fetch_fn):
                import asyncio

                async def run():
                    sem = asyncio.Semaphore(max_concurrency)

                    async def one(q):
                        async with sem:
                            return await self.fetch_fn(self.endpoint, q)

                    return await asyncio.gather(*(one(q) for q in misses))

                try:
                    asyncio.get_running_loop()
                except RuntimeError:
                    fetched = asyncio.run(run())
                else:
                    # called from a thread that already owns a running
                    # loop (async driver / Jupyter): asyncio.run would
                    # raise — run the gather on a dedicated thread+loop
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(max_workers=1) as pool:
                        fetched = pool.submit(asyncio.run, run()).result()
            else:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                    max_workers=min(len(misses), max_concurrency)
                ) as pool:
                    fetched = list(pool.map(
                        lambda q: self.fetch_fn(self.endpoint, q), misses
                    ))
            for q, res in zip(misses, fetched):
                self.cache.put(q, res)
                results[q] = res
        return [results[q] for q in queries]


class FakeSPARQLEndpoint:
    """In-process SPARQL endpoint over a triples list: answers exactly
    the query strings ``SPARQLConnector.get_query`` builds (hop queries
    and literal chain queries), in the SPARQL JSON bindings shape."""

    def __init__(self, triples: list[tuple[str, str, str]]):
        from collections import defaultdict

        self.fwd = defaultdict(list)
        for s, p, o in triples:
            self.fwd[s].append((p, o))

    def __call__(self, endpoint: str, query: str) -> list[dict]:
        import re as _re

        iris = _re.findall(r"<([^>]+)>", query)
        root = iris[0]
        if query.startswith("SELECT ?p"):  # hop query: all (p, o) of root
            return [
                {"p": {"value": p}, "o": {"value": o}}
                for p, o in self.fwd.get(root, [])
            ]
        # literal chain query: remaining IRIs are the fixed predicates
        frontier = [root]
        for pred in iris[1:]:
            frontier = [
                o for node in frontier for (p, o) in self.fwd.get(node, [])
                if p == pred
            ]
        return [{"o": {"value": o}} for o in frontier]


class HopFetcher:
    """map_batches actor (SURVEY.md S2: ``map_batches(FetcherActor,
    concurrency=N)``): one connector (session + TTL cache) per actor,
    built once in ``__init__``; each batch of entities becomes hop
    queries, responses parse through res2hops into triple rows."""

    def __init__(self, endpoint: str, fetch_fn,
                 skip_predicates: frozenset[str] = frozenset()):
        self.connector = FetchingSPARQLConnector(endpoint, fetch_fn)
        self.skip = skip_predicates

    def __call__(self, batch):
        import pyarrow as pa

        subs, preds, objs = [], [], []
        entities = batch["entity"].to_pylist()
        for entity, res in zip(
            entities,
            self.connector.afetch(
                [self.connector.get_query(e) for e in entities]
            ),
        ):
            for p, o in res2hops(res, self.skip):
                subs.append(entity)
                preds.append(p)
                objs.append(o)
        return pa.table(
            {"subj": pa.array(subs, pa.string()),
             "pred": pa.array(preds, pa.string()),
             "obj": pa.array(objs, pa.string())}
        )


def fetch_hops_dataset(
    entities: list[str],
    endpoint: str,
    fetch_fn,
    skip_predicates: frozenset[str] = frozenset(),
    concurrency: int | tuple = (1, 4),
    batch_size: int = 64,
):
    """Entities → remote hop triples Dataset via the fetcher actor pool
    (the reference's remote KG mode, kg.py:218-239 + _fill_hops
    kg.py:428-443, re-expressed as a streaming stage)."""
    import pyarrow as pa

    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"entity": pa.array(entities, pa.string())})
    )
    return ds.map_batches(
        HopFetcher,
        fn_constructor_kwargs={
            "endpoint": endpoint, "fetch_fn": fetch_fn,
            "skip_predicates": skip_predicates,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
