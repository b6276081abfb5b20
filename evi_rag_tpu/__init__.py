"""EVI-RAG-TPU: a TPU-native evidence-retrieval framework for KGQA.

A ground-up JAX/XLA/Pallas re-design of the capabilities of EVI-RAG
(Martin1007Wang/EVI-RAG): evidence-based retrieval-augmented knowledge-graph
question answering. The pipeline has four stages:

1. data build  -- normalize raw KGQA parquet into per-question subgraphs with
   undirected-BFS shortest-path supervision, precompute frozen text embeddings
   (``evi_rag_tpu.data``).
2. retriever   -- a per-edge (triple) scorer conditioned on the question,
   trained with multi-positive InfoNCE (``evi_rag_tpu.models.retriever``).
3. gflownet    -- an edge-level GFlowNet sampling evidence paths over the
   retriever-built agent graph, trained with Sub-Trajectory Balance
   (``evi_rag_tpu.models.gflownet``).
4. reasoner    -- an LLM or oracle answering from retrieved evidence, with
   semantic-dissipation scoring (``evi_rag_tpu.eval``).

Design stance (TPU-first, not a port):

- Ragged multi-graph batches become *padded buckets* with masks
  (``evi_rag_tpu.ops.graph.GraphBatch``); every per-graph reduction is a
  segment op (``evi_rag_tpu.ops.segment``) that XLA lowers to efficient
  one-pass scatters, with Pallas kernels for the hot paths
  (``evi_rag_tpu.ops.pallas``).
- The GFlowNet environment is a pure-functional ``lax.scan`` step over a
  fixed-shape state -- no data-dependent Python control flow under ``jit``.
- Data parallelism rides an ICI ``jax.sharding.Mesh`` via ``shard_map``/
  NamedSharding (``evi_rag_tpu.parallel``); the candidate-edge axis of the
  query path can shard across devices for million-triple fan-out.
- Storage stays host-side (parquet + flat binary blobs, ``evi_rag_tpu.data``);
  embedding tables are device-resident.
"""

__version__ = "0.1.0"
