"""Typed device-side batch pytrees consumed by the models.

These are the padded-bucket analogs of the reference's PyG ``Batch`` objects
(``src/data/g_retrieval_dataset.py:29-37``, ``src/data/g_agent_dataset.py:
337-356``).  Variable-length per-graph index lists (``q_local_indices``,
``a_local_indices``, ``start_node_locals`` ...) become node-level boolean
masks, which is the natural static-shape encoding; pair-CSR supervision
becomes a padded pair axis with its own mask.
"""

from __future__ import annotations

import dataclasses

import jax

from evi_rag_tpu.ops.graph import GraphBatch


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmbedTables:
    """Device-resident embedding tables (uploaded once per task, not per
    batch).  Each table carries ONE extra all-zero row at index ``V`` so
    padded rows materialize to zeros exactly like the host-dense collation;
    batches then feed int32 row ids only (~1000x fewer host->device bytes per
    step than dense gathered embeddings -- the training-path twin of the
    serve surface's device-resident projected tables)."""

    entity: jax.Array    # [V+1, D]; row V is the zero pad row
    relation: jax.Array  # [R+1, D]; row R is the zero pad row


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RetrieverBatch:
    """One padded bucket of per-question subgraphs for triple scoring.

    Text embeddings are gathered host-side by the feeder (the reference does
    the same in DataLoader workers, ``src/data/components/loader.py:60-65``)
    or -- with ``node_rows``/``edge_rows`` set and the dense fields None --
    on device from a resident ``EmbedTables`` inside the jitted step
    (``materialize_retriever_batch``); the model only sees dense arrays.
    """

    graph: GraphBatch
    node_emb: jax.Array | None  # [N, D] entity text embeddings (row 0 semantics resolved)
    node_is_nontext: jax.Array  # [N] bool -- embedding row 0 => learned non-text embedding
    edge_emb: jax.Array | None  # [E, D] relation text embeddings
    question_emb: jax.Array    # [G, D]
    topic_one_hot: jax.Array   # [N, num_topics] float
    edge_labels: jax.Array     # [E] float in {0,1}; positive_triple_mask supervision
    node_is_q: jax.Array       # [N] bool: question/topic entity
    node_is_a: jax.Array       # [N] bool: answer entity
    node_rows: jax.Array | None = None  # [N] int32 entity-table rows (id feed)
    edge_rows: jax.Array | None = None  # [E] int32 relation-table rows (id feed)

    @property
    def edge_is_near(self) -> jax.Array:
        """Edges incident to a question or answer node.

        Replaces ``compute_qa_edge_mask`` (reference ``src/utils/
        graph_utils.py:107-153``); "bridge" edges are the complement.
        """
        qa = self.node_is_q | self.node_is_a
        return qa[self.graph.heads] | qa[self.graph.tails]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AgentBatch:
    """Padded GFlowNet environment batch (the reference ``g_agent`` sample,
    ``src/data/g_agent_dataset.py:19-52``).

    The directed edge list is the retriever-selected evidence graph; edges
    carry retriever scores and relation text embeddings.  Start/answer local
    index lists become node masks; ``is_dummy`` marks dummy-agent graphs
    (questions whose answer is absent from the subgraph,
    ``g_agent_builder.py:434-470``).
    """

    graph: GraphBatch
    edge_scores: jax.Array     # [E] f32 retriever scores (logits)
    edge_relations: jax.Array  # [E] int32 relation vocab ids
    node_emb: jax.Array | None  # [N, D] entity text embeddings
    node_is_nontext: jax.Array  # [N] bool
    edge_emb: jax.Array | None  # [E, D] relation text embeddings
    question_emb: jax.Array    # [G, D]
    node_is_start: jax.Array   # [N] bool
    node_is_answer: jax.Array  # [N] bool
    is_dummy: jax.Array        # [G] bool
    edge_labels: jax.Array     # [E] f32 DAG (shortest-path) edge labels for BC
    pairs: "PairSupervision"
    node_rows: jax.Array | None = None  # [N] int32 entity-table rows (id feed)
    edge_rows: jax.Array | None = None  # [E] int32 relation-table rows (id feed)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PairSupervision:
    """Padded (start, answer) pair-level shortest-path supervision.

    Mirrors the reference ``pair_*`` CSR fields emitted by the build pipeline
    (``scripts/build_retrieval_pipeline.py:691-752``) and consumed by the
    GFlowNet reward's shortest-length matching (``gflownet_rewards.py:158-213``).
    """

    pair_batch: jax.Array          # [P] int32 graph id (padding -> padding graph)
    pair_start_local: jax.Array    # [P] int32 graph-local start node
    pair_answer_local: jax.Array   # [P] int32 graph-local answer node
    pair_shortest_len: jax.Array   # [P] int32 BFS shortest distance
    pair_mask: jax.Array           # [P] bool


def make_tables(entity_emb, relation_emb) -> EmbedTables:
    """Upload entity/relation tables once (plus the zero pad row).  Call at
    task start; pass to step factories so id-feed batches materialize on
    device."""
    import jax.numpy as jnp
    import numpy as np

    def pad(t):
        t = np.asarray(t, dtype=np.float32)
        return jnp.asarray(np.concatenate([t, np.zeros((1, t.shape[1]), t.dtype)]))

    return EmbedTables(entity=pad(entity_emb), relation=pad(relation_emb))


def materialize_retriever_batch(
    batch: RetrieverBatch, tables: EmbedTables | None
) -> RetrieverBatch:
    """Resolve an id-feed batch into dense embeddings on device (works on
    flat ``[N]`` and stacked ``[S, N]`` row arrays alike).  Dense batches
    pass through untouched."""
    if batch.node_emb is not None:
        return batch
    if tables is None:
        raise ValueError("id-feed batch requires EmbedTables (got tables=None)")
    return dataclasses.replace(
        batch,
        node_emb=tables.entity[batch.node_rows],
        edge_emb=tables.relation[batch.edge_rows],
        node_rows=None,
        edge_rows=None,
    )


def materialize_agent_batch(batch, tables: EmbedTables | None):
    """AgentBatch twin of ``materialize_retriever_batch``."""
    if batch.node_emb is not None:
        return batch
    if tables is None:
        raise ValueError("id-feed batch requires EmbedTables (got tables=None)")
    return dataclasses.replace(
        batch,
        node_emb=tables.entity[batch.node_rows],
        edge_emb=tables.relation[batch.edge_rows],
        node_rows=None,
        edge_rows=None,
    )
