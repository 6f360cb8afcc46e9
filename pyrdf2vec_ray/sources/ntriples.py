"""N-Triples / Turtle-lite file source (reference S1: rdflib parse →
KG.add_walk stream, graphs/kg.py:142-164).

rdflib is not available here; this reads the line-oriented N-Triples
subset (IRIs in <>, literals in quotes, optional @lang / ^^type tags,
trailing '.') with ``ray.data.read_text`` + a vectorized regex — each
line parses independently, so the source scales by splitting the file
into blocks.  skip_predicates filtering matches kg.py:209.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

from pyrdf2vec_ray.schemas import TRIPLES

# also accepts N-Quads: an optional graph label (IRI or blank node)
# before the terminating '.' is parsed and DROPPED — the engine's KG is
# the union graph, like the reference's rdflib-parse-to-KG fold.
# Blank-node subjects/objects (_:name) are first-class: real N-Quads
# exports use them everywhere, and silently skipping their lines would
# be silent data loss.
NT_RE = re.compile(
    r"""^\s*
        (?:<(?P<subj>[^>]+)>|(?P<subj_b>_:\S+))\s+
        <(?P<pred>[^>]+)>\s+
        (?:<(?P<obj_iri>[^>]+)>
          |(?P<obj_b>_:\S+)
          |"(?P<obj_lit>(?:[^"\\]|\\.)*)"(?:@[\w-]+|\^\^<[^>]+>)?)
        (?:\s+(?:<[^>]+>|_:\S+))?
        \s*\.\s*$""",
    re.VERBOSE,
)


def parse_ntriples_lines(lines: list[str]) -> list[tuple[str, str, str]]:
    out = []
    for line in lines:
        if not line or line.lstrip().startswith("#"):
            continue
        m = NT_RE.match(line)
        if m:
            obj = m.group("obj_iri") or m.group("obj_b")
            if obj is None:
                obj = m.group("obj_lit").encode().decode("unicode_escape")
            out.append((m.group("subj") or m.group("subj_b"),
                        m.group("pred"), obj))
    return out


def read_ntriples(
    path: str, skip_predicates: frozenset[str] = frozenset()
) -> ray.data.Dataset:
    """File → deduplicated triples Dataset (the reference's set-valued
    graph semantics)."""
    from pyrdf2vec_ray.pipelines.construct import dedup_triples

    def parse(batch: pa.Table) -> pa.Table:
        triples = parse_ntriples_lines(batch["text"].to_pylist())
        triples = [t for t in triples if t[1] not in skip_predicates]
        s, p, o = zip(*triples) if triples else ([], [], [])
        return pa.Table.from_pydict(
            {"subj": list(s), "pred": list(p), "obj": list(o)}, schema=TRIPLES
        )

    raw = ray.data.read_text(path)
    return dedup_triples(raw.map_batches(parse, batch_format="pyarrow"))
