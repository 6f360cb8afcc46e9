"""BFS walk extraction as iterative frontier⋈adjacency joins (SURVEY.md
G2 "→ Ray Data": the scale path for graphs too large to broadcast).

The actor-pool walker (`walkers.extract_walks`) maps a zero-copy
broadcast CSR graph — ideal while the graph fits one node's object
store.  This pipeline needs NO materialized graph object: each depth
round is one hash-bucket co-partition of the live frontier with the
triples table (shuffle.bucket_apply semantics), a vectorized pandas
merge per bucket, and dead-end retention as the unmatched left rows —
exactly the reference BFS semantics (random.py:50-81):

  frontier_0 = {(root,)}
  per depth: every walk extends by ALL hops of its tail; a parent walk
  is dropped iff it had ≥1 hop; dead ends survive to the output.

Partitioning assumption: a bucket holds every triple of the subjects
hashed to it — hot tails fan out inside one bucket task; salt the
triples of mega-hubs (construct.materialize_adjacency's cap) if a
single subject's edges exceed a worker's heap.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from pyrdf2vec_ray.shuffle import add_bucket

WALK_SEP = "\x1f"


def _frontier_from_entities(entities: list[str]) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {
                "tail": pa.array(entities, pa.string()),
                "root": pa.array(entities, pa.string()),
                "walk": pa.array(entities, pa.string()),  # WALK_SEP-joined
            }
        )
    )


def bfs_walks_join(
    triples: ray.data.Dataset,
    entities: list[str],
    max_depth: int,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """→ Dataset (entity, walk: list<string>) of unique BFS walks.

    Each depth round materializes the (shrinking/growing) frontier; the
    triples Dataset is re-used as the build side of every round's
    co-partition. Output rows stream out per round (dead ends) plus the
    final frontier at max_depth."""
    adj = add_bucket(
        triples.map_batches(
            lambda b: b.rename_columns(["key", "pred", "obj"]),
            batch_format="pyarrow",
        ),
        ["key"],
        num_buckets,
    ).materialize()

    finals: list[ray.data.Dataset] = []
    frontier = _frontier_from_entities(entities)

    for _ in range(max_depth):
        f = add_bucket(
            frontier.map_batches(
                lambda b: b.rename_columns(["key", "root", "walk"]),
                batch_format="pyarrow",
            ),
            ["key"],
            num_buckets,
        )
        tagged = f.map_batches(
            lambda b: b.append_column("side", pa.array(["f"] * len(b))),
            batch_format="pyarrow",
        ).union(
            adj.map_batches(
                lambda b: pa.table(
                    {
                        "key": b["key"],
                        "root": b["pred"],   # reuse columns: root<-pred
                        "walk": b["obj"],    # walk<-obj
                        "bucket": b["bucket"],
                        "side": pa.array(["a"] * len(b)),
                    }
                ),
                batch_format="pyarrow",
            )
        )

        def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop(columns=["bucket"])
            fr = g[g["side"] == "f"][["key", "root", "walk"]]
            ad = g[g["side"] == "a"].rename(
                columns={"root": "pred", "walk": "obj"}
            )[["key", "pred", "obj"]]
            m = fr.merge(ad, on="key", how="left", sort=True)
            matched = m[m["pred"].notna()]
            dead = m[m["pred"].isna()].drop_duplicates(["root", "walk"])
            ext = pd.DataFrame(
                {
                    "key": matched["obj"],
                    "root": matched["root"],
                    "walk": matched["walk"] + WALK_SEP + matched["pred"]
                    + WALK_SEP + matched["obj"],
                    "done": False,
                }
            )
            dead_rows = pd.DataFrame(
                {"key": dead["key"], "root": dead["root"], "walk": dead["walk"],
                 "done": True}
            )
            return pd.concat([ext, dead_rows], ignore_index=True)

        joined = tagged.groupby("bucket").map_groups(
            join_bucket, batch_format="pandas"
        ).materialize()
        finals.append(joined.filter(expr="done == True"))
        frontier = joined.filter(expr="done == False").drop_columns(["done"])

    finals.append(frontier.map_batches(
        lambda b: b.append_column("done", pa.array([True] * len(b))),
        batch_format="pyarrow",
    ))

    out = finals[0].union(*finals[1:]) if len(finals) > 1 else finals[0]

    def to_walks(batch: pa.Table) -> pa.Table:
        roots = batch["root"].to_pylist()
        walks = [w.split(WALK_SEP) for w in batch["walk"].to_pylist()]
        return pa.table(
            {"entity": pa.array(roots, pa.string()),
             "walk": pa.array(walks, pa.list_(pa.string()))}
        )

    return out.map_batches(to_walks, batch_format="pyarrow")
