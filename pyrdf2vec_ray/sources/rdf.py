"""Turtle / RDF-XML file sources (reference S1: ``KG(location, fmt=...)``
parses any rdflib format, graphs/kg.py:142-164; its samples and examples
use ``samples/mutag/mutag.owl``, an RDF/XML file).

rdflib is not available in this environment, so these are self-contained
parsers for the practically-used subsets:

- **Turtle** (`parse_turtle`): @prefix/@base + SPARQL-style PREFIX/BASE,
  prefixed names, the ``a`` keyword, ``;`` predicate lists and ``,``
  object lists, blank nodes (labelled and ``[...]`` anonymous with
  nested property lists), RDF collections ``( ... )``, short and long
  ('''/\"\"\") string literals with @lang / ^^datatype tags, numeric and
  boolean literals.
- **RDF/XML** (`parse_rdfxml`): rdf:Description and typed node elements,
  rdf:about/ID/nodeID/resource, nested node elements, literal property
  values, xml:base.

Literal objects keep their lexical form (language / datatype tags are
dropped), matching the N-Triples source and the reference's
``Vertex(str(o))`` (kg.py:156-162).

Parsing Turtle/XML is stateful (prefix table / element tree), so one
FILE parses in one task — ``read_rdf`` fans out across FILES and feeds
the shared dedup shuffle.  Line-oriented N-Triples remains the format
that block-splits WITHIN a file (sources/ntriples.py); convert to NT
for maximum read parallelism on huge single files.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

from pyrdf2vec_ray.schemas import TRIPLES

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDF_FIRST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
RDF_REST = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
RDF_NIL = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"

_TOKEN_RE = re.compile(
    r"""
      (?P<comment>\#[^\n]*)
    | (?P<iri><[^<>"{}|^`\\\s]*>)
    | (?P<long_str2>\"\"\"(?:.|\n)*?\"\"\")
    | (?P<long_str1>'''(?:.|\n)*?''')
    | (?P<str2>"(?:[^"\\\n]|\\.)*")
    | (?P<str1>'(?:[^'\\\n]|\\.)*')
    | (?P<directive>@prefix\b|@base\b|PREFIX\b|BASE\b)
    | (?P<langtag>@[a-zA-Z][a-zA-Z0-9-]*)
    | (?P<dtype>\^\^)
    | (?P<number>[+-]?(?:\d+\.\d*|\.\d+|\d+)(?:[eE][+-]?\d+)?)
    | (?P<punct>[.;,\[\](){}])
    | (?P<pname>[^\s.;,\[\]()"'<>#][^\s;,\[\]()"'<>]*)
    """,
    re.VERBOSE,
)


_ESCAPE_RE = re.compile(r"\\(?:u([0-9a-fA-F]{4})|U([0-9a-fA-F]{8})|(.))")
_ECHAR = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
          '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    # Decode ONLY Turtle escape sequences (ECHAR + \uXXXX/\UXXXXXXXX).
    # A whole-string encode().decode('unicode_escape') round-trip would
    # latin-1-mangle every non-ASCII codepoint ('café' -> 'cafÃ©').
    if "\\" not in s:
        return s

    def repl(m: re.Match) -> str:
        if m.group(1) is not None:
            return chr(int(m.group(1), 16))
        if m.group(2) is not None:
            return chr(int(m.group(2), 16))
        c = m.group(3)
        return _ECHAR.get(c, c)

    return _ESCAPE_RE.sub(repl, s)


class _TurtleParser:
    def __init__(self, text: str, trig: bool = False):
        self.trig = trig
        # Tokenize, then split statement-terminating '.'s glued onto
        # pname/number tokens ('ex:s ex:p ex:o.' / 'ex:p 42.'): Turtle's
        # PN_LOCAL may contain but not END with '.', and '42.' is the
        # integer 42 followed by punctuation (DECIMAL needs digits after
        # the dot).
        toks: list[tuple[str, str]] = []
        for m in _TOKEN_RE.finditer(text):
            kind, val = m.lastgroup, m.group()
            if kind == "comment":
                continue
            if kind in ("pname", "number") and val.endswith("."):
                stripped = val.rstrip(".")
                if stripped:
                    toks.append((kind, stripped))
                    toks.extend([("punct", ".")] * (len(val) - len(stripped)))
                    continue
            toks.append((kind, val))
        self.tokens = toks
        self.pos = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.bnode_n = 0
        self.triples: list[tuple[str, str, str]] = []

    # -- token stream --------------------------------------------------------

    def _peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else (None, None)

    def _next(self):
        t = self._peek()
        self.pos += 1
        return t

    def _expect_punct(self, ch: str):
        kind, val = self._next()
        if kind not in ("punct",) or val != ch:
            raise ValueError(f"Turtle parse error: expected {ch!r}, got {val!r}")

    # -- term construction ---------------------------------------------------

    def _iri(self, raw: str) -> str:
        inner = raw[1:-1]
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", inner):
            return self.base + inner
        return inner

    def _pname(self, raw: str) -> str:
        if raw.startswith("_:"):
            return raw
        if ":" in raw:
            p, local = raw.split(":", 1)
            ns = self.prefixes.get(p)
            if ns is None:
                raise ValueError(f"Turtle parse error: unknown prefix {p!r}")
            # trailing '.'s were already split off in the tokenizer
            return ns + local
        raise ValueError(f"Turtle parse error: unexpected token {raw!r}")

    def _new_bnode(self) -> str:
        self.bnode_n += 1
        return f"_:genid{self.bnode_n}"

    def _strip_literal_tags(self):
        kind, _ = self._peek()
        if kind == "langtag":
            self._next()
        elif kind == "dtype":
            self._next()
            self._next()  # the datatype IRI / pname

    def _term(self, as_subject: bool = False) -> str:
        kind, val = self._next()
        if kind == "iri":
            return self._iri(val)
        if kind == "pname":
            if val == "a" and not as_subject:
                return RDF_TYPE
            if val in ("true", "false"):
                return val
            return self._pname(val)
        if kind == "number":
            return val
        if kind in ("str1", "str2"):
            s = _unescape(val[1:-1])
            self._strip_literal_tags()
            return s
        if kind in ("long_str1", "long_str2"):
            s = _unescape(val[3:-3])
            self._strip_literal_tags()
            return s
        if kind == "punct" and val == "[":
            node = self._new_bnode()
            if self._peek() != ("punct", "]"):
                self._po_list(node)
            self._expect_punct("]")
            return node
        if kind == "punct" and val == "(":
            return self._collection()
        raise ValueError(f"Turtle parse error: unexpected token {val!r}")

    def _collection(self) -> str:
        items = []
        while self._peek() != ("punct", ")"):
            items.append(self._term())
        self._next()  # ')'
        if not items:
            return RDF_NIL
        head = self._new_bnode()
        node = head
        for i, item in enumerate(items):
            self.triples.append((node, RDF_FIRST, item))
            nxt = self._new_bnode() if i + 1 < len(items) else RDF_NIL
            self.triples.append((node, RDF_REST, nxt))
            node = nxt
        return head

    # -- grammar -------------------------------------------------------------

    def _po_list(self, subject: str):
        while True:
            pred = self._term()
            while True:
                obj = self._term()
                self.triples.append((subject, pred, obj))
                if self._peek() == ("punct", ","):
                    self._next()
                    continue
                break
            if self._peek() == ("punct", ";"):
                self._next()
                # dangling ';' before '.' or ']'
                if self._peek() in (("punct", "."), ("punct", "]")):
                    return
                continue
            return

    def parse(self) -> list[tuple[str, str, str]]:
        while self.pos < len(self.tokens):
            kind, val = self._peek()
            if kind == "directive":
                self._next()
                d = val.lower().lstrip("@")
                if d == "prefix":
                    _, pval = self._next()       # 'p:' pname
                    p = pval.rstrip(":")
                    _, ival = self._next()       # <iri>
                    self.prefixes[p] = ival[1:-1]
                else:  # base
                    _, ival = self._next()
                    self.base = ival[1:-1]
                if self._peek() == ("punct", "."):
                    self._next()
                continue
            if self.trig:
                # TriG graph blocks: [GRAPH] [label] { statements } —
                # graph names are discarded (the engine's KG is the
                # union graph, like the reference's rdflib-parse-to-KG)
                if (kind, val) == ("punct", "{"):
                    self._next()
                    self._graph_block()
                    continue
                if kind == "pname" and val.upper() == "GRAPH":
                    # spec keyword is case-insensitive; a bare lowercase
                    # pname without ':' can't be a subject anyway
                    self._next()
                    self._term(as_subject=True)   # the graph label
                    self._expect_punct("{")
                    self._graph_block()
                    continue
                # speculative parse for "<label> {": _term has SIDE
                # EFFECTS ([..]/(..) append triples and advance bnode_n),
                # so the rewind must restore ALL parser state, not just
                # the token position — or anonymous-bnode subjects get
                # emitted twice under two ids
                save = (self.pos, len(self.triples), self.bnode_n)
                try:
                    maybe_label = self._term(as_subject=True)
                except ValueError:
                    maybe_label = None
                if maybe_label is not None and self._peek() == ("punct", "{"):
                    self._next()
                    self._graph_block()
                    continue
                self.pos, n_triples, self.bnode_n = save
                del self.triples[n_triples:]
            subject = self._term(as_subject=True)
            self._po_list(subject)
            self._expect_punct(".")
        return self.triples

    def _graph_block(self):
        while self._peek() != ("punct", "}"):
            if self._peek() == (None, None):
                raise ValueError("TriG parse error: unterminated graph block")
            subject = self._term(as_subject=True)
            self._po_list(subject)
            if self._peek() == ("punct", "."):
                self._next()
        self._next()  # '}' 


def parse_turtle(text: str) -> list[tuple[str, str, str]]:
    return _TurtleParser(text).parse()


def parse_trig(text: str) -> list[tuple[str, str, str]]:
    """TriG = Turtle + named-graph blocks; triples from ALL graphs merge
    into the union graph (graph names dropped), matching how the
    reference folds any rdflib-parsed source into one KG
    (graphs/kg.py:142-164)."""
    return _TurtleParser(text, trig=True).parse()


def _jsonld_scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def parse_jsonld(text: str) -> list[tuple[str, str, str]]:
    """JSON-LD subset parser (expanded / flattened documents plus a
    SIMPLE string-valued @context of term→IRI and prefix→namespace
    entries): node objects with @id (blank ids generated otherwise),
    @type → rdf:type, property values as node refs / @value objects /
    plain scalars / nested nodes / @list collections, and an optional
    @graph wrapper.  Full @context processing (remote contexts, @vocab,
    value coercion) routes through rdflib when installed — see
    ``read_rdf``'s fallback."""
    import json

    doc = json.loads(text)
    ctx: dict[str, str] = {}
    if isinstance(doc, dict):
        c = doc.get("@context") or {}
        if isinstance(c, dict):
            ctx = {k: v for k, v in c.items() if isinstance(v, str)}
        nodes = doc.get("@graph")
        if nodes is None:
            nodes = [doc]
    else:
        nodes = doc

    triples: list[tuple[str, str, str]] = []
    state = {"bnode": 0}

    def expand(term: str) -> str:
        if term in ctx:
            return ctx[term]
        if ":" in term:
            p, local = term.split(":", 1)
            if p in ctx:
                return ctx[p] + local
        return term

    def new_bnode() -> str:
        state["bnode"] += 1
        return f"_:genid{state['bnode']}"

    def collection(items) -> str:
        if not items:
            return RDF_NIL
        head = new_bnode()
        node = head
        for i, item in enumerate(items):
            triples.append((node, RDF_FIRST, value_of(item)))
            nxt = new_bnode() if i + 1 < len(items) else RDF_NIL
            triples.append((node, RDF_REST, nxt))
            node = nxt
        return head

    def value_of(item) -> str:
        if isinstance(item, dict):
            if "@value" in item:
                return _jsonld_scalar(item["@value"])
            if "@list" in item:
                return collection(item["@list"])
            return walk(item)
        return _jsonld_scalar(item)

    def walk(n: dict) -> str:
        sid = expand(n["@id"]) if "@id" in n else new_bnode()
        for k, v in n.items():
            if k in ("@id", "@context", "@graph"):
                continue
            vals = v if isinstance(v, list) else [v]
            if k == "@type":
                for t in vals:
                    triples.append((sid, RDF_TYPE, expand(t)))
                continue
            pred = expand(k)
            for item in vals:
                triples.append((sid, pred, value_of(item)))
        return sid

    for n in nodes:
        if isinstance(n, dict):
            walk(n)
    return triples


def _parse_with_rdflib(text: str, fmt: str):
    """Optional rdflib fallback for constructs outside the subset
    parsers (full JSON-LD contexts, n3 rules, exotic Turtle).  Returns
    None when rdflib is not installed (this container ships without
    it)."""
    try:
        import rdflib
    except ImportError:
        return None
    if fmt in ("trig", "nquads"):
        g = rdflib.Dataset()
        g.parse(data=text, format=fmt)
        return sorted({(str(s), str(p), str(o)) for s, p, o, _ in g.quads()})
    g = rdflib.Graph()
    g.parse(data=text, format=fmt)
    return sorted((str(s), str(p), str(o)) for s, p, o in g)


# ---- RDF/XML ---------------------------------------------------------------

_XML_RDF = "{http://www.w3.org/1999/02/22-rdf-syntax-ns#}"
_XML_BASE = "{http://www.w3.org/XML/1998/namespace}base"


def _xml_tag_iri(tag: str) -> str:
    # ElementTree yields '{namespace}local'
    if tag.startswith("{"):
        ns, local = tag[1:].split("}", 1)
        return ns + local
    return tag


def parse_rdfxml(text: str) -> list[tuple[str, str, str]]:
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    triples: list[tuple[str, str, str]] = []
    counter = [0]

    def bnode():
        counter[0] += 1
        return f"_:genid{counter[0]}"

    def node_id(el, base) -> str:
        about = el.get(f"{_XML_RDF}about")
        if about is not None:
            return base + about if about.startswith("#") or about == "" else about
        rid = el.get(f"{_XML_RDF}ID")
        if rid is not None:
            return f"{base}#{rid}"
        nid = el.get(f"{_XML_RDF}nodeID")
        if nid is not None:
            return f"_:{nid}"
        return bnode()

    def walk_node(el, base) -> str:
        base = el.get(_XML_BASE, base)
        subj = node_id(el, base)
        # a typed node element (anything but rdf:Description) asserts its
        # element name as an rdf:type triple
        if el.tag != f"{_XML_RDF}Description":
            triples.append((subj, RDF_TYPE, _xml_tag_iri(el.tag)))
        for prop in el:
            pred = _xml_tag_iri(prop.tag)
            res = prop.get(f"{_XML_RDF}resource")
            if res is not None:
                obj = base + res if res.startswith("#") else res
                triples.append((subj, pred, obj))
                continue
            nid = prop.get(f"{_XML_RDF}nodeID")
            if nid is not None:
                triples.append((subj, pred, f"_:{nid}"))
                continue
            children = list(prop)
            if children:
                for child in children:
                    triples.append((subj, pred, walk_node(child, base)))
            else:
                triples.append((subj, pred, (prop.text or "").strip()))
        return subj

    base = root.get(_XML_BASE, "")
    if _xml_tag_iri(root.tag).endswith("RDF"):
        for el in root:
            walk_node(el, base)
    else:
        walk_node(root, base)
    return triples


# ---- dispatch --------------------------------------------------------------

_FMT_BY_EXT = {
    ".nt": "nt", ".ntriples": "nt",
    ".nq": "nquads", ".nquads": "nquads",
    ".ttl": "turtle", ".turtle": "turtle",
    ".n3": "n3",
    ".trig": "trig",
    ".jsonld": "json-ld",
    ".owl": "xml", ".rdf": "xml", ".xml": "xml",
}

# self-contained subset parsers per stateful format; n3 parses through
# the Turtle grammar (n3 ⊃ turtle — formulas/rules are outside the
# subset and route to the rdflib fallback)
_PARSERS = {
    "turtle": parse_turtle,
    "n3": parse_turtle,
    "trig": parse_trig,
    "json-ld": parse_jsonld,
    "xml": parse_rdfxml,
}


def parse_rdf_text(text: str, fmt: str) -> list[tuple[str, str, str]]:
    """One document → triples: the deterministic subset parser first,
    rdflib (when installed) for anything the subset rejects — so every
    rdflib format the reference accepts (``KG(location, fmt=...)``,
    graphs/kg.py:142-164) has a path here."""
    try:
        return _PARSERS[fmt](text)
    except Exception as err:
        rl_fmt = fmt
        res = _parse_with_rdflib(text, rl_fmt)
        if res is None:
            raise ValueError(
                f"subset {fmt} parser failed ({err}); install rdflib for "
                f"full {fmt} support"
            ) from err
        return res


def read_rdf(
    paths: str | list[str],
    fmt: str | None = None,
    skip_predicates: frozenset[str] = frozenset(),
) -> ray.data.Dataset:
    """File(s) → deduplicated triples Dataset (reference ``KG(location,
    fmt=...)``).  ``fmt``: 'nt' | 'nquads' | 'turtle' | 'n3' | 'trig' |
    'json-ld' | 'xml', inferred from the extension when None.  NT and
    N-Quads parse block-parallel within a file (line-oriented); the
    stateful formats parse one task per file and scale across files,
    each via the deterministic subset parser with an rdflib fallback
    when installed (``parse_rdf_text``)."""
    if isinstance(paths, str):
        paths = [paths]
    import os

    from pyrdf2vec_ray.pipelines.construct import dedup_triples
    from pyrdf2vec_ray.sources.ntriples import read_ntriples

    def fmt_of(p: str) -> str:
        if fmt:
            return fmt
        ext = os.path.splitext(p)[1].lower()
        if ext not in _FMT_BY_EXT:
            raise ValueError(f"cannot infer RDF format of {p!r}; pass fmt=")
        return _FMT_BY_EXT[ext]

    nt_paths = [p for p in paths if fmt_of(p) in ("nt", "nquads")]
    other = [(p, fmt_of(p)) for p in paths
             if fmt_of(p) not in ("nt", "nquads")]

    parts: list[ray.data.Dataset] = []
    if nt_paths:
        for p in nt_paths:
            parts.append(read_ntriples(p, skip_predicates=skip_predicates))

    if other:
        files = ray.data.from_items(
            [{"path": p, "fmt": f} for p, f in other]
        )

        def parse_file(batch: pa.Table) -> pa.Table:
            triples: list[tuple[str, str, str]] = []
            for path, f in zip(batch["path"].to_pylist(), batch["fmt"].to_pylist()):
                with open(path, encoding="utf-8") as fh:
                    text = fh.read()
                triples.extend(parse_rdf_text(text, f))
            triples = [t for t in triples if t[1] not in skip_predicates]
            s, p, o = zip(*triples) if triples else ([], [], [])
            return pa.Table.from_pydict(
                {"subj": list(s), "pred": list(p), "obj": list(o)}, schema=TRIPLES
            )

        parts.append(
            dedup_triples(
                files.map_batches(parse_file, batch_format="pyarrow", batch_size=1)
            )
        )

    if len(parts) == 1:
        return parts[0]
    return dedup_triples(parts[0].union(*parts[1:]))
