"""GFlowNet env semantics: frontier movement, directions, hits, horizon."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evi_rag_tpu.data.feeder import Bucket, collate_agent
from evi_rag_tpu.data.g_agent import AgentSample
from evi_rag_tpu.models.gflownet.env import (
    DIRECTION_BACKWARD,
    DIRECTION_FORWARD,
    STOP_ACTION,
    candidate_edge_masks,
    env_reset,
    env_step,
)
from evi_rag_tpu.models.gflownet.reward import RewardConfig, compute_reward

H = 8
MAX_STEPS = 3


def _path_sample(qid=0):
    """0 ->e0-> 1 ->e1-> 2 (answer); plus a back edge 2->0 (e2)."""
    return AgentSample(
        sample_id=f"s{qid}",
        question_id=qid,
        num_nodes=3,
        edge_head_locals=np.array([0, 1, 2]),
        edge_tail_locals=np.array([1, 2, 0]),
        edge_relations=np.array([0, 1, 2]),
        edge_scores=np.array([1.0, 2.0, -1.0], np.float32),
        edge_labels=np.array([1.0, 1.0, 0.0], np.float32),
        node_entity_ids=np.array([10, 11, 12]),
        node_embedding_ids=np.array([1, 2, 3]),
        start_entity_ids=np.array([10]),
        answer_entity_ids=np.array([12]),
        start_node_locals=np.array([0]),
        answer_node_locals=np.array([2]),
        pair_start_local=np.array([0]),
        pair_answer_local=np.array([2]),
        pair_shortest_len=np.array([2]),
        is_answer_reachable=True,
        is_dummy_agent=False,
    )


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    ent = rng.normal(size=(16, H)).astype(np.float32)
    rel = rng.normal(size=(8, H)).astype(np.float32)
    q = rng.normal(size=(2, H)).astype(np.float32)
    return collate_agent(
        [_path_sample(0), _path_sample(1)],
        entity_emb=ent, relation_emb=rel, question_emb=q,
        bucket=Bucket(graphs=3, nodes=8, edges=8, pairs=4),
    )


def test_reset_and_candidates(batch):
    state = env_reset(batch, max_steps=MAX_STEPS, hidden_dim=H)
    assert not bool(state.done[0]) and not bool(state.done[1])
    assert bool(state.done[2])  # padding graph
    fwd, bwd = candidate_edge_masks(state, batch, max_steps=MAX_STEPS)
    # graph0 edges at offsets 0,1,2; start node 0 active: e0 fwd (head=0), e2 bwd (tail=0)
    np.testing.assert_array_equal(np.asarray(fwd[:3]), [True, False, False])
    np.testing.assert_array_equal(np.asarray(bwd[:3]), [False, False, True])


def test_walk_to_answer(batch):
    emb = jnp.zeros((batch.graph.num_graphs, H))
    state = env_reset(batch, max_steps=MAX_STEPS, hidden_dim=H)
    # Step 0: graph0 takes e0 (global 0), graph1 stops.
    actions = jnp.asarray([0, STOP_ACTION, STOP_ACTION], jnp.int32)
    state = env_step(state, batch, actions, emb, step_index=0, max_steps=MAX_STEPS)
    assert bool(state.done[1]) and not bool(state.done[0])
    assert int(state.step_counts[0]) == 1
    assert int(state.directions[0, 0]) == DIRECTION_FORWARD
    assert int(state.start_node_hit[0]) == 0
    active = np.asarray(state.active_nodes)
    assert active[1] and not active[0]  # frontier replaced
    # Step 1: graph0 takes e1 (global 1) -> reaches answer node 2.
    actions = jnp.asarray([1, STOP_ACTION, STOP_ACTION], jnp.int32)
    state = env_step(state, batch, actions, emb, step_index=1, max_steps=MAX_STEPS)
    assert bool(state.answer_hits[0])
    assert int(state.answer_node_hit[0]) == 2
    sel = np.asarray(state.used_edge_mask)
    assert sel[0] and sel[1] and not sel[2]

    # Reward: hit with 2 selected edges, shortest=2 => length_cost 0.
    rw = compute_reward(
        batch,
        selected_mask=state.used_edge_mask,
        answer_hit=state.answer_hits,
        start_node_hit=state.start_node_hit,
        answer_node_hit=state.answer_node_hit,
        config=RewardConfig(),
    )
    assert float(rw.success[0]) == 1.0
    assert float(rw.length_cost[0]) == 0.0
    assert float(rw.path_len[0]) == 2.0
    assert float(rw.shortest_len[0]) == 2.0
    assert float(rw.log_reward[0]) > float(rw.log_reward[1])  # graph1 failed
    # Padding graph: -inf log reward, 0 reward.
    assert float(rw.reward[2]) == 0.0


def test_backward_direction(batch):
    emb = jnp.zeros((batch.graph.num_graphs, H))
    state = env_reset(batch, max_steps=MAX_STEPS, hidden_dim=H)
    # graph0 picks e2 = (2 -> 0): tail active -> backward, frontier moves to 2 (answer!).
    actions = jnp.asarray([2, STOP_ACTION, STOP_ACTION], jnp.int32)
    state = env_step(state, batch, actions, emb, step_index=0, max_steps=MAX_STEPS)
    assert int(state.directions[0, 0]) == DIRECTION_BACKWARD
    assert bool(state.answer_hits[0])


def test_horizon_exhaustion(batch):
    emb = jnp.zeros((batch.graph.num_graphs, H))
    state = env_reset(batch, max_steps=1, hidden_dim=H)
    actions = jnp.asarray([0, 3, STOP_ACTION], jnp.int32)  # graph1's first edge is global 3
    state = env_step(state, batch, actions, emb, step_index=0, max_steps=1)
    assert bool(state.done.all())  # horizon 1 exhausted


def test_stop_on_answer_zero_hop():
    """A start node that is also an answer => done at reset with 0-hop hit."""
    s = _path_sample(0)
    s.answer_node_locals = np.array([0])
    s.answer_entity_ids = np.array([10])
    rng = np.random.default_rng(0)
    b = collate_agent(
        [s], entity_emb=rng.normal(size=(16, H)).astype(np.float32),
        relation_emb=rng.normal(size=(8, H)).astype(np.float32),
        question_emb=rng.normal(size=(2, H)).astype(np.float32),
        bucket=Bucket(graphs=2, nodes=8, edges=8, pairs=4),
    )
    state = env_reset(b, max_steps=MAX_STEPS, hidden_dim=H, stop_on_answer=True)
    assert bool(state.answer_hits[0]) and bool(state.done[0])
    assert int(state.answer_node_hit[0]) == 0
