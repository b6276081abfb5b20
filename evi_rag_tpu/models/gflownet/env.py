"""Pure-functional set-based graph MDP with edge-level actions.

Re-design of the reference ``GraphEnv`` (``src/models/components/
gflownet_env.py:48-387``): the mutable ``GraphState`` + in-place ``step``
becomes an immutable ``EnvState`` pytree and pure ``env_reset``/``env_step``
functions suitable for ``lax.scan`` -- fixed shapes, no data-dependent
control flow, done-masking instead of early exit.

Semantics preserved:
* actions are *directed* edge ids (global, padded axis); STOP = -1;
* a selected edge's non-active endpoint becomes the new active frontier
  (frontier replacement, not accumulation); backward selection (tail active,
  head not) is detected dynamically (``gflownet_env.py:330-337``);
* answer-hit records the minimum graph-local node id among active answer
  nodes (``amin`` tracking, ``gflownet_env.py:347-359``);
* start-as-answer 0-hop hits at reset; stop_on_answer / horizon done logic;
* ``action_hidden`` keeps a running mean of selected edge embeddings
  (``gflownet_env.py:363-378``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from evi_rag_tpu.models.batches import AgentBatch
from evi_rag_tpu.ops.segment import segment_min, segment_sum

STOP_ACTION = -1
DIRECTION_FORWARD = 0
DIRECTION_BACKWARD = 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvState:
    active_nodes: jax.Array    # [N] bool: current frontier
    visited_nodes: jax.Array   # [N] bool
    used_edge_mask: jax.Array  # [E] bool
    selection_order: jax.Array  # [E] int32 (step index or -1)
    done: jax.Array            # [G] bool
    step_counts: jax.Array     # [G] int32
    answer_hits: jax.Array     # [G] bool
    answer_node_hit: jax.Array  # [G] int32 graph-local node id, -1 if none
    start_node_hit: jax.Array  # [G] int32 graph-local chosen-start id, -1
    action_hidden: jax.Array   # [G, H] running mean of selected edge tokens
    directions: jax.Array      # [G, T] int32 per-step direction
    actions: jax.Array         # [G, T] int32 per-step action (edge id or -1)


def _min_local_answer_hit(
    active: jax.Array, batch: AgentBatch
) -> tuple[jax.Array, jax.Array]:
    """(hit[G], min graph-local answer node id[G] or -1)."""
    gb = batch.graph
    n = gb.num_nodes
    hit_nodes = active & batch.node_is_answer & gb.node_mask
    local = jnp.arange(n, dtype=jnp.int32) - gb.node_ptr[gb.node_batch].astype(jnp.int32)
    packed = jnp.where(hit_nodes, local, n + 1)
    min_local = segment_min(packed, gb.node_batch, gb.num_graphs, fill=n + 1)
    has = min_local <= n
    return has, jnp.where(has, min_local, -1)


def env_reset(
    batch: AgentBatch,
    *,
    max_steps: int,
    hidden_dim: int,
    stop_on_answer: bool = False,
) -> EnvState:
    gb = batch.graph
    g, n, e = gb.num_graphs, gb.num_nodes, gb.num_edges
    t = max_steps + 1

    active = batch.node_is_start & gb.node_mask
    start_counts = segment_sum(active.astype(jnp.float32), gb.node_batch, g)
    missing_start = start_counts == 0

    answer_hits, answer_node_hit = _min_local_answer_hit(active, batch)
    start_node_hit = jnp.where(answer_hits, answer_node_hit, -1)

    done = missing_start | batch.is_dummy | (~gb.graph_mask)
    if stop_on_answer:
        done = done | answer_hits

    return EnvState(
        active_nodes=active,
        visited_nodes=active,
        used_edge_mask=jnp.zeros(e, dtype=bool),
        selection_order=jnp.full(e, -1, dtype=jnp.int32),
        done=done,
        step_counts=jnp.zeros(g, dtype=jnp.int32),
        answer_hits=answer_hits,
        answer_node_hit=answer_node_hit.astype(jnp.int32),
        start_node_hit=start_node_hit.astype(jnp.int32),
        action_hidden=jnp.zeros((g, hidden_dim), dtype=jnp.float32),
        directions=jnp.full((g, t), DIRECTION_FORWARD, dtype=jnp.int32),
        actions=jnp.full((g, t), STOP_ACTION, dtype=jnp.int32),
    )


def candidate_edge_masks(
    state: EnvState, batch: AgentBatch, *, max_steps: int
) -> tuple[jax.Array, jax.Array]:
    """(forward, backward) candidate masks: incident to the active frontier,
    graph not done, horizon not exhausted (``gflownet_env.py:254-264``)."""
    gb = batch.graph
    eb = gb.edge_batch
    horizon = state.step_counts[eb] >= max_steps
    base = (~state.done[eb]) & (~horizon) & gb.edge_mask
    fwd = base & state.active_nodes[gb.heads]
    bwd = base & state.active_nodes[gb.tails]
    return fwd, bwd


def env_step(
    state: EnvState,
    batch: AgentBatch,
    actions: jax.Array,        # [G] int32 global edge id or STOP_ACTION
    action_embeddings: jax.Array,  # [G, H] selected edge tokens (0 for stop)
    *,
    step_index: jax.Array | int,
    max_steps: int,
    stop_on_answer: bool = False,
) -> EnvState:
    gb = batch.graph
    g, n, e = gb.num_graphs, gb.num_nodes, gb.num_edges
    step_index = jnp.asarray(step_index, dtype=jnp.int32)

    is_stop = (actions == STOP_ACTION) | state.done
    act = jnp.where(is_stop, 0, actions).astype(jnp.int32)  # safe index

    # One selected edge per acting graph -> scatter into edge-level mask.
    # Guard: a graph's action must be its own edge; acting on a foreign edge
    # is silently dropped (the reference raises; validation is host-side).
    # NOTE: stopped graphs all alias safe-index 0, so the scatter must be an
    # OR (`.max`), not `.set` -- duplicate-index `.set` is order-unspecified
    # and a False write could clobber a real selection.
    own = gb.edge_batch[act] == jnp.arange(g, dtype=gb.edge_batch.dtype)
    edge_selected = jnp.zeros(e, dtype=bool).at[act].max((~is_stop) & own, mode="drop")

    used = state.used_edge_mask | edge_selected
    sel_order = jnp.where(edge_selected, step_index, state.selection_order)

    heads, tails = gb.heads, gb.tails
    head_active_e = state.active_nodes[heads] & edge_selected
    tail_active_e = state.active_nodes[tails] & edge_selected

    # Per-graph direction: backward iff tail active and head not.
    sel_head_active = segment_sum(head_active_e.astype(jnp.float32), gb.edge_batch, g) > 0
    sel_tail_active = segment_sum(tail_active_e.astype(jnp.float32), gb.edge_batch, g) > 0
    acting = ~is_stop
    step_directions = jnp.where(
        acting & (~sel_head_active) & sel_tail_active, DIRECTION_BACKWARD, DIRECTION_FORWARD
    ).astype(jnp.int32)

    # At step 0 record the chosen start endpoint (graph-local).
    chosen_start_glob = jnp.where(sel_head_active, heads[act], tails[act]).astype(jnp.int32)
    local_start = chosen_start_glob - gb.node_ptr[jnp.arange(g)].astype(jnp.int32)
    record_start = acting & (step_index == 0)
    start_node_hit = jnp.where(record_start, local_start, state.start_node_hit)

    # Frontier replacement: new actives are the far endpoints of selected edges.
    next_active = jnp.zeros(n, dtype=bool)
    next_active = next_active.at[tails].max(head_active_e)
    next_active = next_active.at[heads].max(tail_active_e)
    replace = acting[gb.node_batch]
    active = jnp.where(replace, next_active, state.active_nodes)

    visited = state.visited_nodes | active

    has_hit, min_local = _min_local_answer_hit(active, batch)
    newly = (~state.answer_hits) & has_hit
    answer_node_hit = jnp.where(newly, min_local, state.answer_node_hit)
    answer_hits = state.answer_hits | has_hit

    # Running mean of selected edge embeddings over acting steps.
    counts = state.step_counts.astype(jnp.float32)
    new_hidden = (
        state.action_hidden * counts[:, None] + action_embeddings
    ) / (counts[:, None] + 1.0)
    action_hidden = jnp.where(acting[:, None], new_hidden, state.action_hidden)

    step_counts = state.step_counts + acting.astype(jnp.int32)
    horizon = step_counts >= max_steps
    done = state.done | is_stop | horizon
    if stop_on_answer:
        done = done | answer_hits

    return EnvState(
        active_nodes=active,
        visited_nodes=visited,
        used_edge_mask=used,
        selection_order=sel_order,
        done=done,
        step_counts=step_counts,
        answer_hits=answer_hits,
        answer_node_hit=answer_node_hit.astype(jnp.int32),
        start_node_hit=start_node_hit,
        action_hidden=action_hidden,
        directions=state.directions.at[:, step_index].set(step_directions),
        actions=state.actions.at[:, step_index].set(jnp.where(is_stop, STOP_ACTION, actions).astype(jnp.int32)),
    )
