"""pyrdf2vec_ray — a Ray-Data-native knowledge-graph construction + embedding engine.

Re-implements the query/data-processing capabilities of pyRDF2Vec
(reference: /root/reference, predict-idlab/pyRDF2Vec v0.2.3) as Ray Data
pipelines: ``map_batches`` over zero-copy Arrow batches for triple
extraction / canonicalization, actor pools for stateful walk extraction
and entity linking, and groupby shuffles for graph materialization and
sampler statistics.  Nothing here calls ``ray.init()`` — callers own the
Ray session.
"""

from pyrdf2vec_ray import schemas  # noqa: F401

__version__ = "0.1.0"
