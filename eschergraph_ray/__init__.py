"""eschergraph_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the query / data-processing
capabilities of PinkDot-AI/eschergraph (reference at /root/reference,
cited by file:line in docstrings) expressed as streaming
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- transcripts (Parquet) -> groupby(conv_id)+sort(turn_idx) reassembly ->
  chunking -> actor-pool triple extraction -> per-conversation entity
  canonicalization -> node/edge/property/triple materialization ->
  Louvain community summarization -> partitioned Parquet outputs with
  per-partition lineage and checkpoint/resume.

Nothing in this package calls ``ray.init()``/``ray.shutdown()`` — the
session is owned by the caller (driver, bench.py, or the test fixture).
"""

__version__ = "0.1.0"
