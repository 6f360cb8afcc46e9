"""SPARQL text front-end for the in-engine pattern algebra.

`ops/bgp.py` exposes the evaluator as a Python API; this module lets a
user hand the engine an actual SPARQL string — the surface a reference
user already writes against a remote endpoint
(`/root/reference/pyrdf2vec/connectors.py:99-116` builds exactly these
query strings) — for the supported subset:

    SELECT [DISTINCT] ?v ... | * WHERE {
        ?s pred ?o .                 # triple patterns ('.' separated)
        ?s (p1|p2)+ ?o .             # property paths
        FILTER(?a != ?b)             # =, !=, <, <=, >, >=
        OPTIONAL { ... }             # nested pattern group
        MINUS { ... }                #   "
        VALUES ?v { "x" "y" }        # inline per-var value list
    } [LIMIT n]

Terms: ``?var``, ``"quoted literal"``, ``<iri>`` (angle brackets
stripped), or a bare token (taken as a constant symbol — this engine's
triple stores hold plain strings like ``customer:17``).  CONSTRUCT
templates are reached through :func:`sparql_query` with a
``CONSTRUCT { s p o } WHERE { ... }`` head.

The parser is a ~100-line recursive-descent over a regex token stream
— deliberately small: everything after parsing is the distributed
plan of `bgp_match`/`bgp_construct`, so the text layer adds zero
execution machinery.  Unsupported syntax raises ``SparqlSyntaxError``
naming the offending token (no silent partial parses).
"""
from __future__ import annotations

import re

import ray.data

from pyrdf2vec_ray.ops.bgp import bgp_construct, bgp_match

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>"(?:[^"\\]|\\.)*")
      | (?P<iri><[^>\s]*>)
      | (?P<punct>[{}().]|!=|<=|>=|=|<|>)
      | (?P<word>[^\s{}()."<>=!]+)
    )""", re.VERBOSE)

_FILTER_OPS = {"=": "==", "!=": "!=", "<": "<", "<=": "<=",
               ">": ">", ">=": ">="}


class SparqlSyntaxError(ValueError):
    pass


def _tokenize(text: str) -> list[str]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise SparqlSyntaxError(
                    f"cannot tokenize at ...{text[pos:pos + 20]!r}")
            break
        tok = next(v for v in m.groupdict().values() if v is not None)
        out.append(tok)
        pos = m.end()
    return out


def _term(tok: str) -> str:
    """Token → engine term: ?var stays, "lit" unquotes, <iri> strips,
    bare token passes through (incl. property paths like (p|q)+)."""
    if tok.startswith('"') and tok.endswith('"'):
        return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    if tok.startswith("<") and tok.endswith(">"):
        return tok[1:-1]
    return tok


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        tok = self.peek()
        if tok is None:
            raise SparqlSyntaxError("unexpected end of query")
        self.i += 1
        return tok

    def expect(self, want: str) -> None:
        tok = self.next()
        if tok.upper() != want.upper():
            raise SparqlSyntaxError(f"expected {want!r}, got {tok!r}")

    def keyword(self, tok: str | None, *names: str) -> bool:
        return tok is not None and tok.upper() in names

    def parse_group(self) -> dict:
        """{ ... } → patterns / filters / optional / minus / values."""
        self.expect("{")
        out = {"patterns": [], "filters": [], "optional": [],
               "minus": [], "values": {}}
        while True:
            tok = self.peek()
            if tok is None:
                raise SparqlSyntaxError("unterminated group (missing })")
            if tok == "}":
                self.next()
                return out
            if tok == ".":
                self.next()
                continue
            if self.keyword(tok, "FILTER"):
                self.next()
                self.expect("(")
                lhs = self.next()
                op = self.next()
                rhs = self.next()
                self.expect(")")
                if not lhs.startswith("?"):
                    raise SparqlSyntaxError(
                        f"FILTER lhs must be a variable, got {lhs!r}")
                if op not in _FILTER_OPS:
                    raise SparqlSyntaxError(f"unsupported FILTER op {op!r}")
                out["filters"].append(
                    (lhs[1:], _FILTER_OPS[op], _term(rhs)))
                continue
            if self.keyword(tok, "OPTIONAL", "MINUS"):
                self.next()
                sub = self.parse_group()
                if (sub["filters"] or sub["optional"] or sub["minus"]
                        or sub["values"]):
                    raise SparqlSyntaxError(
                        f"{tok.upper()} groups support plain patterns "
                        "only")
                out[tok.lower()].append(sub["patterns"])
                continue
            if self.keyword(tok, "VALUES"):
                self.next()
                var = self.next()
                if not var.startswith("?"):
                    raise SparqlSyntaxError(
                        f"VALUES needs a variable, got {var!r}")
                self.expect("{")
                vals = []
                while self.peek() != "}":
                    vals.append(_term(self.next()))
                self.next()
                out["values"][var[1:]] = vals
                continue
            s = self.next()
            p = self._pred()
            o = self.next()
            out["patterns"].append((_term(s), p, _term(o)))

    def _pred(self) -> str:
        """Predicate position: a plain term, or a parenthesized
        property-path alternation ``(p1|p2)+`` reassembled from the
        token stream."""
        tok = self.next()
        if tok != "(":
            return _term(tok)
        body = []
        while self.peek() != ")":
            if self.peek() is None:
                raise SparqlSyntaxError("unterminated ( in predicate")
            body.append(self.next())
        self.next()  # ')'
        plus = self.peek()
        if plus != "+" and not (plus or "").startswith("+"):
            raise SparqlSyntaxError(
                "parenthesized predicate must be a (p1|p2)+ path")
        self.next()
        return "(" + "".join(body) + ")+"

    def parse(self) -> dict:
        head = self.next().upper()
        q: dict = {"form": head}
        if head == "SELECT":
            tok = self.peek()
            if self.keyword(tok, "DISTINCT"):
                self.next()
            sel: list[str] | None = []
            aggs: list[tuple[str, str]] = []  # (counted var|'*', alias)
            while not self.keyword(self.peek(), "WHERE"):
                tok = self.next()
                if tok == "*":
                    sel = None
                    continue
                if tok == "(":
                    # (COUNT(?v|*) AS ?alias)
                    fn = self.next()
                    if fn.upper() != "COUNT":
                        raise SparqlSyntaxError(
                            f"only COUNT aggregates supported, got {fn!r}")
                    self.expect("(")
                    counted = self.next()
                    self.expect(")")
                    self.expect("AS")
                    alias = self.next()
                    self.expect(")")
                    if not alias.startswith("?"):
                        raise SparqlSyntaxError(
                            f"AS expects a variable, got {alias!r}")
                    aggs.append((counted, alias[1:]))
                    continue
                if not tok.startswith("?"):
                    raise SparqlSyntaxError(
                        f"SELECT expects variables, got {tok!r}")
                if sel is not None:
                    sel.append(tok[1:])
            q["select"] = sel or None
            if aggs:
                q["aggs"] = aggs
        elif head == "CONSTRUCT":
            self.expect("{")
            s, p, o = self.next(), self.next(), self.next()
            if self.peek() == ".":
                self.next()
            self.expect("}")
            q["template"] = (_term(s), _term(p), _term(o))
        elif head == "ASK":
            pass
        elif head == "DESCRIBE":
            var = self.next()
            if not var.startswith("?"):
                raise SparqlSyntaxError(
                    f"DESCRIBE expects a variable, got {var!r}")
            q["describe"] = var[1:]
        else:
            raise SparqlSyntaxError(
                f"only SELECT / CONSTRUCT / ASK / DESCRIBE supported, "
                f"got {head!r}")
        if self.keyword(self.peek(), "WHERE"):
            self.next()
        elif head != "ASK":
            self.expect("WHERE")
        q["group"] = self.parse_group()
        if self.keyword(self.peek(), "GROUP"):
            self.next()
            self.expect("BY")
            gvars = []
            while (self.peek() or "").startswith("?"):
                gvars.append(self.next()[1:])
            if not gvars:
                raise SparqlSyntaxError("GROUP BY needs ?variables")
            q["groupby"] = gvars
        if self.keyword(self.peek(), "ORDER"):
            self.next()
            self.expect("BY")
            order: list[tuple[str, bool]] = []
            while True:
                tok = self.peek()
                if tok is not None and tok.startswith("?"):
                    self.next()
                    desc = False
                    if self.keyword(self.peek(), "ASC", "DESC"):
                        desc = self.next().upper() == "DESC"
                    order.append((tok[1:], desc))
                else:
                    break
            if not order:
                raise SparqlSyntaxError("ORDER BY needs ?variables")
            q["order"] = order
        if self.keyword(self.peek(), "LIMIT"):
            self.next()
            n = self.next()
            if not n.isdigit():
                raise SparqlSyntaxError(f"LIMIT expects an int, got {n!r}")
            q["limit"] = int(n)
        if self.peek() is not None:
            raise SparqlSyntaxError(
                f"trailing tokens from {self.peek()!r}")
        return q


def parse_sparql(text: str) -> dict:
    """Parse the supported SPARQL subset to a plan dict (exposed for
    tests and inspection)."""
    return _Parser(_tokenize(text)).parse()


def sparql_query(
    triples: ray.data.Dataset,
    text: str,
    closure_rounds: int = 6,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """Run a SPARQL string (see module docstring for the subset)
    against a ``(subj, pred, obj)`` Dataset — parse, then hand the
    groups to :func:`bgp_match` / :func:`bgp_construct`; all
    distributed-plan properties are theirs."""
    q = parse_sparql(text)
    g = q["group"]
    kwargs = dict(
        optional=g["optional"] or None,
        filters=g["filters"] or None,
        minus=g["minus"] or None,
        values=g["values"] or None,
        closure_rounds=closure_rounds,
        num_buckets=num_buckets,
    )
    if q["form"] == "CONSTRUCT":
        out = bgp_construct(triples, g["patterns"], q["template"],
                            **{k: v for k, v in kwargs.items()
                               if k != "num_buckets"},
                            num_buckets=num_buckets)
    elif q["form"] == "DESCRIBE":
        from pyrdf2vec_ray.ops.bgp import bgp_describe

        out = bgp_describe(triples, g["patterns"], q["describe"],
                           **{k: v for k, v in kwargs.items()
                              if k != "num_buckets"},
                           num_buckets=num_buckets)
    elif q["form"] == "ASK":
        sols = bgp_match(triples, g["patterns"], **kwargs)
        hit = len(sols.limit(1).take(1)) > 0
        return ray.data.from_items([{"ask": hit}])
    elif "aggs" in q:
        if len(q["aggs"]) != 1:
            raise SparqlSyntaxError("exactly one COUNT aggregate "
                                    "supported per query")
        gvars = q.get("groupby") or q.get("select") or []
        if not gvars:
            raise SparqlSyntaxError(
                "COUNT needs GROUP BY (global counts: GROUP BY a "
                "constant-bound variable)")
        from pyrdf2vec_ray.shuffle import bucket_count

        sols = bgp_match(triples, g["patterns"], **kwargs)
        # over a null-free solution set COUNT(?v) == COUNT(*)
        out = bucket_count(sols.select_columns(gvars), gvars,
                           count_col=q["aggs"][0][1],
                           num_buckets=num_buckets)
    else:
        out = bgp_match(triples, g["patterns"],
                        select=q.get("select"), **kwargs)
    if "order" in q:
        # a global sort of the RESULT set (result-sized, not
        # corpus-sized) — the one deliberate all-to-all here
        out = out.sort([c for c, _ in q["order"]],
                       descending=[d for _, d in q["order"]])
    if "limit" in q:
        out = out.limit(q["limit"])
    return out
