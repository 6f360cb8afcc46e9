"""Property-based invariants (hypothesis) for the pure kernels — no Ray
jobs per example, so hundreds of cases run in seconds."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyrdf2vec_ray.functions import canon
from pyrdf2vec_ray.literals import cast_literals
from pyrdf2vec_ray.ops.dedup import _perm_coeffs, _shingle_hashes
from pyrdf2vec_ray.samplers import FittedSampler, SamplerSpec
from pyrdf2vec_ray.state.graph_index import GraphIndex
from pyrdf2vec_ray.synth import triples_table

name = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=12
)
triple = st.tuples(name, name, name)


@settings(max_examples=50, deadline=None)
@given(st.lists(triple, min_size=1, max_size=60))
def test_graph_index_roundtrip(triples):
    """Every input triple is reachable as a forward hop of its subject and
    a reverse hop of its object; degrees sum to the distinct triple count."""
    uniq = set(triples)
    gi = GraphIndex.from_table(triples_table(sorted(uniq)))
    g = gi.local()
    assert int(g.out_deg().sum()) == len(uniq) == int(g.in_deg().sum())
    for s, p, o in uniq:
        sid = g.name_to_id(s)
        preds, objs = g.get_hops(sid)
        names = g.a.names
        assert (p, o) in {(str(names[a]), str(names[b])) for a, b in zip(preds, objs)}


@settings(max_examples=50, deadline=None)
@given(st.lists(triple, min_size=1, max_size=40))
def test_sampler_probabilities_valid(triples):
    gi = GraphIndex.from_table(triples_table(sorted(set(triples))))
    g = gi.local()
    for kind in ("uniform", "objfreq", "predfreq", "objpredfreq", "wide"):
        fs = FittedSampler.fit(SamplerSpec(kind=kind), g)
        for vid in range(g.num_vertices):
            preds, objs = g.get_hops(vid)
            if len(preds) == 0:
                continue
            keep, p = fs.hop_probabilities(
                preds.astype(np.int64), objs.astype(np.int64)
            )
            if len(p):
                assert np.isclose(p.sum(), 1.0)
                assert (p >= 0).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(name, min_size=1, max_size=9))
def test_anonymous_walk_invariants(walk):
    root = walk[0]
    out = canon.map_anonymous(walk, root)
    assert len(out) == len(walk)
    for tok, orig in zip(out, walk):
        if orig == root:
            assert tok == root
        else:
            assert tok.isdigit() and walk[int(tok)] == orig


@settings(max_examples=100, deadline=None)
@given(st.lists(name, min_size=1, max_size=7))
def test_split_walk_deterministic_lower_unique(walk):
    out = canon.split_walk(walk, with_reverse=False)
    assert out == canon.split_walk(walk, with_reverse=False)
    assert len(set(out)) == len(out)                 # order-preserving dedup
    assert all(t == t.lower() for t in out)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.text(max_size=8), max_size=3), max_size=4))
def test_cast_literals_shape(chains):
    out = cast_literals(chains)
    assert len(out) == len(chains)
    for cell, chain in zip(out, chains):
        if len(chain) == 0:
            assert isinstance(cell, float) and np.isnan(cell)
        elif len(chain) > 1:
            assert isinstance(cell, tuple) and len(cell) == len(chain)


@settings(max_examples=30, deadline=None)
@given(st.text(min_size=1, max_size=200), st.text(min_size=1, max_size=200))
def test_minhash_similarity_monotone(a, b):
    """Identical texts → identical signatures; signature similarity is
    bounded by [0,1] and symmetric."""
    coeff_a, coeff_b = _perm_coeffs(32)
    def sig(t):
        sh = _shingle_hashes(t, 3)
        return ((sh[None, :] * coeff_a[:, None] + coeff_b[:, None])
                % np.uint64((1 << 61) - 1)).min(axis=1)
    sa, sb = sig(a), sig(b)
    assert np.array_equal(sa, sig(a))
    sim = (sa == sb).mean()
    assert 0.0 <= sim <= 1.0
    if a == b:
        assert sim == 1.0


@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=40), min_size=2, max_size=12
    ),
    threshold=st.sampled_from([0.3, 0.6, 0.9]),
)
@settings(max_examples=8, deadline=None)
def test_distributed_jaccard_equals_naive(texts, threshold):
    """The bucketed pair⋈shingles verification must equal a naive local
    Jaccard over every candidate pair."""
    import itertools

    import pyarrow as pa
    import ray.data

    from pyrdf2vec_ray.ops.dedup import _shingle_hashes, verify_jaccard
    from pyrdf2vec_ray.util import to_table

    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    pairs = list(itertools.combinations(range(len(texts)), 2))
    pairs_ds = ray.data.from_arrow(
        pa.table({"doc_a": pa.array([a for a, _ in pairs], pa.int64()),
                  "doc_b": pa.array([b for _, b in pairs], pa.int64())})
    )
    got = to_table(verify_jaccard(docs, pairs_ds, k=2, threshold=threshold))
    if got.num_rows == 0 or "doc_a" not in got.column_names:
        got_map = {}
    else:
        got_map = {
            (a, b): j for a, b, j in zip(
                got["doc_a"].to_pylist(), got["doc_b"].to_pylist(),
                got["jaccard"].to_pylist(),
            )
        }
    for a, b in pairs:
        sa = set(_shingle_hashes(texts[a], 2).tolist())
        sb = set(_shingle_hashes(texts[b], 2).tolist())
        j = len(sa & sb) / max(1, len(sa | sb))
        if j >= threshold:
            assert abs(got_map[(a, b)] - j) < 1e-12, (a, b)
        else:
            assert (a, b) not in got_map


_iri_local = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122),
    min_size=1, max_size=10,
)
_lit_text = st.text(min_size=0, max_size=40).filter(
    lambda s: "\r" not in s and all(ord(c) >= 32 or c in "\t\n" for c in s)
)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_iri_local, _iri_local, _lit_text),
                min_size=1, max_size=20))
def test_turtle_literal_roundtrip(rows):
    """Serialize (s, p, literal) triples to Turtle with escaped string
    literals (incl. arbitrary unicode), parse back, compare exactly —
    pins the escape decoder against the escape writer."""
    from pyrdf2vec_ray.sources.rdf import parse_turtle

    def esc(s: str) -> str:
        return (s.replace("\\", "\\\\").replace('"', '\\"')
                 .replace("\n", "\\n").replace("\t", "\\t"))

    doc = "@prefix ex: <http://e/> .\n" + "\n".join(
        f'ex:{s} ex:{p} "{esc(o)}" .' for s, p, o in rows
    )
    got = set(parse_turtle(doc))
    want = {(f"http://e/{s}", f"http://e/{p}", o) for s, p, o in rows}
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.lists(st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1, max_size=6), min_size=0, max_size=20),
        min_size=1, max_size=8),
    st.integers(min_value=2, max_value=6),
)
def test_fingerprint_batch_equals_naive(tok_docs, window):
    """The vectorized fingerprint kernel must equal the obvious per-doc
    min-over-shingle-hashes definition for any token layout (short docs,
    empty docs, duplicate shingles)."""
    import hashlib

    import pandas as pd
    import pyarrow as pa

    import ray.data

    from pyrdf2vec_ray.ops.text import fingerprint

    texts = [" ".join(toks) for toks in tok_docs]

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = []
    for t in texts:
        toks = t.split()
        if len(toks) < window:
            want.append(h(" ".join(toks)))
        else:
            want.append(min(h(" ".join(toks[i:i + window]))
                            for i in range(len(toks) - window + 1)))

    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}))
    got = fingerprint(ds, window=window).to_pandas().sort_values("doc_id")
    assert got["fingerprint"].tolist() == want


@settings(max_examples=100, deadline=None)
@given(
    st.lists(  # per entity: a ragged list of odd-ish length walks
        st.lists(
            st.lists(name, min_size=1, max_size=7),
            min_size=0, max_size=5,
        ),
        min_size=0, max_size=8,
    )
)
def test_halk_partial_counts_matches_naive(entity_walks):
    """The vectorized HALK stats kernel equals the definitional loop
    (per-walk DISTINCT predicate counting, halk.py:127-136) on any
    ragged corpus — empty batches, empty walk lists, single-token
    walks, repeated predicates within a walk."""
    import pyarrow as pa

    from pyrdf2vec_ray.walkers import halk_partial_counts

    batch = pa.table({
        "entity": pa.array(
            [f"e{i}" for i in range(len(entity_walks))], pa.string()
        ),
        "walks": pa.array(
            entity_walks, pa.list_(pa.list_(pa.string()))
        ),
    })
    counts: dict[str, int] = {}
    total = 0
    for walks in entity_walks:
        for walk in walks:
            total += 1
            for pred in set(walk[1::2]):
                counts[pred] = counts.get(pred, 0) + 1

    got = halk_partial_counts(batch)
    got_map = dict(zip(got["pred"].to_pylist(), got["n"].to_pylist()))
    assert got_map.pop("\x00TOTAL\x00") == total
    assert got_map == counts


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=64))
@settings(max_examples=200, deadline=None)
def test_bitlen_u64_matches_python(vals):
    from pyrdf2vec_ray.ops.sketch import _bitlen_u64

    arr = np.array(vals, dtype=np.uint64)
    got = _bitlen_u64(arr)
    assert got.tolist() == [int(v).bit_length() for v in vals]


@given(st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                min_size=1, max_size=64))
@settings(max_examples=200, deadline=None)
def test_splitmix64_vector_matches_scalar(vals):
    from pyrdf2vec_ray.ops.curate import splitmix64, splitmix64_py

    arr = np.array(vals, dtype=np.uint64)
    got = splitmix64(arr)
    assert got.tolist() == [splitmix64_py(int(v)) for v in vals]


@given(st.lists(st.integers(min_value=0, max_value=100), min_size=1,
                max_size=200),
       st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=150, deadline=None)
def test_quantile_rank_rule_matches_duckdb(vals, q):
    """The engine's ceil(n*q) 1-based rank rule == quantile_disc for
    arbitrary int multisets and q."""
    import duckdb

    s = sorted(vals)
    r = max(0, int(np.ceil(len(s) * q)) - 1)
    got = s[min(r, len(s) - 1)]
    con = duckdb.connect()
    ref = con.execute(
        "SELECT quantile_disc(x, ?) FROM (SELECT unnest(?) AS x)",
        [q, vals],
    ).fetchone()[0]
    assert got == ref, (vals, q, got, ref)
