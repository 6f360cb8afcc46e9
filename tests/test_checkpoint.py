"""Checkpoint manifest + resume: a partially-completed run resumes
without recomputing finished partitions, and the final output matches a
straight-through run."""

import pyarrow as pa

from pyrdf2vec_ray import synth
from pyrdf2vec_ray.checkpoint import (
    CheckpointManifest,
    construct_kg_checkpointed,
    read_run,
    run_partitioned,
)
from pyrdf2vec_ray.pipelines.construct import construct_kg
from pyrdf2vec_ray.util import to_table

N_DOCS, SEED, N_ENT = 120, 42, 20


def cands():
    return {synth.entity_name(i).casefold(): synth.entity_iri(i) for i in range(N_ENT)}


def triple_set(t: pa.Table):
    return set(zip(t["subj"].to_pylist(), t["pred"].to_pylist(), t["obj"].to_pylist()))


def test_resume_skips_completed_partitions(tmp_path):
    root = str(tmp_path / "run1")
    built = []

    import ray.data

    def build(partition: str):
        built.append(partition)
        i = int(partition.split("-")[1])
        return ray.data.from_arrow(pa.table({"x": [i] * 10}))

    parts = [(f"p-{i}", f"fp{i}") for i in range(4)]
    r1 = run_partitioned(root, parts[:2], build)
    assert [r.partition for r in r1] == ["p-0", "p-1"]
    assert built == ["p-0", "p-1"]

    # "killed" after 2 partitions; resume with the full list
    r2 = run_partitioned(root, parts, build)
    assert built == ["p-0", "p-1", "p-2", "p-3"]   # 0/1 NOT recomputed
    assert [r.skipped for r in r2] == [True, True, False, False]
    assert read_run(root).count() == 40

    # changed input fingerprint invalidates one partition
    parts2 = list(parts)
    parts2[1] = ("p-1", "fpCHANGED")
    r3 = run_partitioned(root, parts2, build)
    assert built.count("p-1") == 2
    assert [r.skipped for r in r3] == [True, False, True, True]


def test_manifest_records_metrics(tmp_path):
    root = str(tmp_path / "run2")
    import ray.data

    run_partitioned(root, [("a", "f1")], lambda p: ray.data.range(5))
    m = CheckpointManifest(root)
    e = m.entries["a"]
    assert e["rows"] == 5 and e["seconds"] >= 0 and e["fingerprint"] == "f1"


def test_checkpointed_construct_matches_straight_run(tmp_path):
    root = str(tmp_path / "kgrun")
    results = construct_kg_checkpointed(
        root, N_DOCS, cands(), n_partitions=4, seed=SEED, n_entities=N_ENT
    )
    assert all(not r.skipped for r in results)
    got = to_table(
        read_run(root).groupby(["subj", "pred", "obj"]).count()
    ).select(["subj", "pred", "obj"])

    docs = synth.synth_documents(N_DOCS, seed=SEED, n_entities=N_ENT)
    want = to_table(construct_kg(docs, cands()))
    assert triple_set(got) == triple_set(want)

    # second invocation is a full skip
    results2 = construct_kg_checkpointed(
        root, N_DOCS, cands(), n_partitions=4, seed=SEED, n_entities=N_ENT
    )
    assert all(r.skipped for r in results2)
