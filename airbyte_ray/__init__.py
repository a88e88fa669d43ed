"""airbyte_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the Airbyte reference (Newton-School/airbyte @ /root/reference) on idiomatic
Ray Data: ``ray.data.Dataset`` pipelines, ``map_batches`` over zero-copy
Arrow batches, actor pools for stateful stages, explicit hash partitioning
for the keyed merge.  See SURVEY.md for the operator inventory and the
mapping from reference semantics (file:line cites) to this engine.

Nothing here calls ``ray.init()`` — sessions are owned by the caller
(bench.py, pytest fixture, or the evaluation driver).
"""

__version__ = "0.1.0"
