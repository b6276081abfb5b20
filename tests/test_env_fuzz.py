"""Property fuzz: the jitted GFlowNet env vs a straight-line numpy simulator.

Random graphs, random valid action sequences; every EnvState field must
match an independent, readable numpy re-implementation of the reference
semantics (``gflownet_env.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evi_rag_tpu.data.feeder import Bucket, collate_agent
from evi_rag_tpu.data.g_agent import AgentSample
from evi_rag_tpu.models.gflownet.env import (
    STOP_ACTION,
    candidate_edge_masks,
    env_reset,
    env_step,
)

H = 4
MAX_STEPS = 3


def _random_agent_sample(rng, qid):
    n = int(rng.integers(3, 8))
    e = int(rng.integers(2, 10))
    heads = rng.integers(0, n, size=e)
    tails = rng.integers(0, n, size=e)
    starts = np.unique(rng.integers(0, n, size=rng.integers(1, 3)))
    answers = np.unique(rng.integers(0, n, size=rng.integers(1, 3)))
    return AgentSample(
        sample_id=f"f{qid}", question_id=qid, num_nodes=n,
        edge_head_locals=heads, edge_tail_locals=tails,
        edge_relations=rng.integers(0, 4, size=e),
        edge_scores=rng.normal(size=e).astype(np.float32),
        edge_labels=(rng.random(e) < 0.3).astype(np.float32),
        node_entity_ids=np.arange(n) + 100 * qid,
        node_embedding_ids=rng.integers(0, 8, size=n),
        start_entity_ids=starts + 100 * qid, answer_entity_ids=answers + 100 * qid,
        start_node_locals=starts, answer_node_locals=answers,
        pair_start_local=np.zeros(0, np.int64), pair_answer_local=np.zeros(0, np.int64),
        pair_shortest_len=np.zeros(0, np.int64),
        is_answer_reachable=True, is_dummy_agent=False,
    )


class NumpySim:
    """Readable single-graph reference simulator."""

    def __init__(self, sample: AgentSample, max_steps: int):
        self.s = sample
        self.max_steps = max_steps
        self.active = np.zeros(sample.num_nodes, bool)
        self.active[sample.start_node_locals] = True
        self.is_answer = np.zeros(sample.num_nodes, bool)
        self.is_answer[sample.answer_locals if hasattr(sample, 'answer_locals') else sample.answer_node_locals] = True
        self.used = np.zeros(sample.num_edges, bool)
        self.steps = 0
        hits = np.nonzero(self.active & self.is_answer)[0]
        self.answer_hit = hits.size > 0
        self.answer_node_hit = int(hits.min()) if hits.size else -1
        self.start_node_hit = self.answer_node_hit if self.answer_hit else -1
        self.done = False

    def candidates(self):
        if self.done or self.steps >= self.max_steps:
            return np.zeros(self.s.num_edges, bool)
        fwd = self.active[self.s.edge_head_locals]
        bwd = self.active[self.s.edge_tail_locals]
        return (fwd | bwd) & ~self.used

    def step(self, action, step_index):
        if self.done or action == STOP_ACTION:
            self.done = True
            return
        h = int(self.s.edge_head_locals[action])
        t = int(self.s.edge_tail_locals[action])
        self.used[action] = True
        head_active = self.active[h]
        chosen_start = h if head_active else t
        if step_index == 0:
            self.start_node_hit = chosen_start
        new_active = np.zeros_like(self.active)
        if head_active:
            new_active[t] = True
        if self.active[t]:
            new_active[h] = True
        self.active = new_active
        hits = np.nonzero(self.active & self.is_answer)[0]
        if hits.size and not self.answer_hit:
            self.answer_node_hit = int(hits.min())
        self.answer_hit = self.answer_hit or hits.size > 0
        self.steps += 1
        if self.steps >= self.max_steps:
            self.done = True


@pytest.mark.parametrize("trial", range(6))
def test_env_matches_numpy_sim(trial):
    rng = np.random.default_rng(trial)
    samples = [_random_agent_sample(rng, i) for i in range(3)]
    ent = rng.normal(size=(400, H)).astype(np.float32)
    rel = rng.normal(size=(8, H)).astype(np.float32)
    q = rng.normal(size=(3, H)).astype(np.float32)
    batch = collate_agent(
        samples, entity_emb=ent, relation_emb=rel, question_emb=q,
        bucket=Bucket(graphs=4, nodes=64, edges=64, pairs=4),
    )
    eptr = np.asarray(batch.graph.edge_ptr)
    sims = [NumpySim(s, MAX_STEPS) for s in samples]
    state = env_reset(batch, max_steps=MAX_STEPS, hidden_dim=H)

    for g, sim in enumerate(sims):
        assert bool(state.answer_hits[g]) == sim.answer_hit, f"reset hit g{g}"
        assert int(state.answer_node_hit[g]) == sim.answer_node_hit

    emb = jnp.zeros((batch.graph.num_graphs, H))
    for step_idx in range(MAX_STEPS + 1):
        fwd, bwd = candidate_edge_masks(state, batch, max_steps=MAX_STEPS)
        valid = np.asarray((fwd | bwd) & ~state.used_edge_mask)
        actions = []
        for g, sim in enumerate(sims):
            cand_ref = sim.candidates()
            cand_got = valid[eptr[g] : eptr[g] + sim.s.num_edges]
            np.testing.assert_array_equal(cand_got, cand_ref, err_msg=f"cands g{g} t{step_idx}")
            choices = np.nonzero(cand_ref)[0]
            if choices.size == 0 or rng.random() < 0.25:
                a_local = STOP_ACTION
            else:
                a_local = int(rng.choice(choices))
            sim.step(a_local, step_idx)
            actions.append(a_local + eptr[g] if a_local >= 0 else STOP_ACTION)
        actions.append(STOP_ACTION)  # padding graph
        state = env_step(
            state, batch, jnp.asarray(actions, jnp.int32), emb,
            step_index=step_idx, max_steps=MAX_STEPS,
        )
        for g, sim in enumerate(sims):
            n0 = np.asarray(batch.graph.node_ptr)[g]
            got_active = np.asarray(state.active_nodes)[n0 : n0 + sim.s.num_nodes]
            np.testing.assert_array_equal(got_active, sim.active, err_msg=f"active g{g} t{step_idx}")
            got_used = np.asarray(state.used_edge_mask)[eptr[g] : eptr[g] + sim.s.num_edges]
            np.testing.assert_array_equal(got_used, sim.used, err_msg=f"used g{g} t{step_idx}")
            assert bool(state.answer_hits[g]) == sim.answer_hit, f"hit g{g} t{step_idx}"
            assert int(state.answer_node_hit[g]) == sim.answer_node_hit, f"hitnode g{g} t{step_idx}"
            assert int(state.start_node_hit[g]) == sim.start_node_hit, f"startnode g{g} t{step_idx}"
            assert bool(state.done[g]) == sim.done, f"done g{g} t{step_idx}"
            assert int(state.step_counts[g]) == sim.steps, f"steps g{g} t{step_idx}"
