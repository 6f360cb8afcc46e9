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
