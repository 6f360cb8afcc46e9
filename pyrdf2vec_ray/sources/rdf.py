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
    | (?P<punct>[.;,\[\]()])
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
    def __init__(self, text: str):
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
            subject = self._term(as_subject=True)
            self._po_list(subject)
            self._expect_punct(".")
        return self.triples


def parse_turtle(text: str) -> list[tuple[str, str, str]]:
    return _TurtleParser(text).parse()


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
    ".ttl": "turtle", ".turtle": "turtle", ".n3": "turtle",
    ".owl": "xml", ".rdf": "xml", ".xml": "xml",
}


def read_rdf(
    paths: str | list[str],
    fmt: str | None = None,
    skip_predicates: frozenset[str] = frozenset(),
) -> ray.data.Dataset:
    """File(s) → deduplicated triples Dataset (reference ``KG(location,
    fmt=...)``).  ``fmt``: 'nt' | 'turtle' | 'xml', inferred from the
    extension when None.  NT parses block-parallel within a file; the
    stateful formats parse one task per file and scale across files."""
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

    nt_paths = [p for p in paths if fmt_of(p) == "nt"]
    other = [(p, fmt_of(p)) for p in paths if fmt_of(p) != "nt"]

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
                triples.extend(
                    parse_turtle(text) if f == "turtle" else parse_rdfxml(text)
                )
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
