"""Differential parity vs torch oracles transcribed from the reference math.

Each oracle below is a line-by-line torch transcription of the reference
EVI-RAG equations (test-only; the framework itself never imports torch for
these paths).  Shared random weights/inputs drive both the JAX implementation
and the oracle; agreement on random inits is the strongest parity evidence
obtainable without the real datasets (VERDICT r2 missing #1).

Oracles and their sources:
* retriever forward  -- ``src/models/components/retriever.py:403-484``
  (projections, DDE struct features 519-553 via scatter-mean PEConv
  ``graph.py:13-74``, geometry scoring 453-484, twin-view combine 369-381)
* grouped InfoNCE    -- ``src/losses/retriever_loss.py:72-143``
* g_agent calibration + start-edge selection
                     -- ``src/data/components/g_agent_builder.py:594-724``
* env step           -- ``src/models/components/gflownet_env.py:266-387``
* reward             -- ``src/models/components/gflownet_rewards.py:57-213``
* SubTB + log-flow   -- ``src/models/gflownet_module.py:882-915, 980-1036``
"""

import numpy as np
import pytest
import torch

torch.set_default_dtype(torch.float32)

import jax
import jax.numpy as jnp

from evi_rag_tpu.data.feeder import Bucket, collate_agent, collate_retriever
from evi_rag_tpu.data.synthetic import make_synthetic_dataset
from evi_rag_tpu.models.retriever import Retriever

EMB = 32


def T(x):
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def TL(x):
    return torch.from_numpy(np.asarray(x, dtype=np.int64))


# --------------------------------------------------------------------- #
# 1. Retriever forward oracle
# --------------------------------------------------------------------- #


def _scatter_mean(x: torch.Tensor, src, dst, num_nodes: int) -> torch.Tensor:
    """PEConv: mean aggregation of messages x[src] at dst (``graph.py:13-23``;
    PyG mean-aggr leaves nodes with no in-edges at 0)."""
    out = torch.zeros(num_nodes, x.shape[1])
    out.index_add_(0, dst, x[src])
    cnt = torch.zeros(num_nodes)
    cnt.index_add_(0, dst, torch.ones(dst.numel()))
    return out / cnt.clamp(min=1.0).unsqueeze(-1)


def _oracle_node_struct(topic, heads, tails, num_nodes, rounds=2, rev=2):
    """``Retriever._build_node_structure_features`` (``retriever.py:519-553``)
    + ``DDE.forward`` (``graph.py:41-74``): forward rounds then reverse
    rounds, interleaved stack layout."""
    feats = [topic]
    h = topic
    for _ in range(rounds):
        h = _scatter_mean(h, heads, tails, num_nodes)
        feats.append(h)
    h = topic
    for _ in range(rev):
        h = _scatter_mean(h, tails, heads, num_nodes)
        feats.append(h)
    return torch.stack(feats, dim=-1).reshape(num_nodes, -1)


def _oracle_retriever_logits(p, s, ent_emb, rel_emb, q_emb):
    """Eval-mode forward per reference ``_forward_impl`` (dropout off,
    hide-and-seek off).  ``p`` is the flax param dict (numpy leaves); torch
    side uses the flax [in, out] kernel layout via plain matmuls -- the
    transcription under test is the equation structure, not the layout."""
    lin = lambda name, x: x @ T(p[name]["kernel"]) + T(p[name]["bias"])
    proj = lambda name, x: torch.tanh(
        x @ T(p[name]["proj"]["kernel"]) + T(p[name]["proj"]["bias"])
    )
    ln = lambda name, x: torch.nn.functional.layer_norm(
        x, (x.shape[-1],), T(p[name]["scale"]), T(p[name]["bias"])
    )
    gelu = torch.nn.functional.gelu  # exact erf form, reference nn.GELU()

    heads = TL(s.edge_index[0])
    tails = TL(s.edge_index[1])
    n = s.num_nodes

    # _prepare_edge_inputs (retriever.py:403-451)
    query_repr = proj("query_proj", T(q_emb[s.question_id]))[None, :]
    node_repr = proj("entity_proj", T(ent_emb[s.node_embedding_ids]))
    non_text = proj("entity_proj", T(p["non_text_entity_emb"])[None, :])[0]
    non_text_mask = TL(s.node_embedding_ids) == 0
    node_repr = torch.where(non_text_mask.unsqueeze(-1), non_text.unsqueeze(0), node_repr)
    head_repr = node_repr[heads]
    tail_repr = node_repr[tails]
    relation_repr = proj("relation_proj", T(rel_emb[s.edge_relations]))

    topic = torch.zeros(n, 2)
    topic[TL(s.topic_locals), 0] = 1.0
    non_topic = np.setdiff1d(np.arange(n), s.topic_locals)
    topic[TL(non_topic), 1] = 1.0
    node_struct = _oracle_node_struct(topic, heads, tails, n)
    struct_fwd = torch.cat([node_struct[heads], node_struct[tails]], dim=-1)
    struct_bwd = torch.cat([node_struct[tails], node_struct[heads]], dim=-1)

    # _score_edges (retriever.py:453-484)
    r_ctx = relation_repr * torch.sigmoid(lin("q_gate", query_repr)) + torch.tanh(
        lin("q_bias", query_repr)
    )

    def score(h_r, t_r, struct_raw):
        struct_ctx = gelu(ln("struct_norm", lin("struct_proj", struct_raw)))
        nav_gate = torch.sigmoid(lin("struct_gate", struct_ctx))
        interaction = h_r * r_ctx * t_r
        modulated = interaction * nav_gate
        error_vec = h_r + r_ctx - t_r
        dist = -torch.norm(error_vec, p=2, dim=-1, keepdim=True)
        combined = torch.cat([modulated, struct_ctx, error_vec, dist], dim=-1)
        features = lin("state_net_1", gelu(ln("state_norm", lin("state_net_0", combined))))
        return lin("score_head", features).squeeze(-1)

    logits_fwd = score(head_repr, tail_repr, struct_fwd)
    logits_bwd = score(tail_repr, head_repr, struct_bwd)

    # _combine_directional_outputs (retriever.py:369-381)
    stacked = torch.stack([logits_fwd, logits_bwd], dim=0)
    weights = torch.softmax(stacked, dim=0)
    return (weights * stacked).sum(dim=0)


def test_retriever_forward_matches_torch_oracle():
    ds = make_synthetic_dataset(num_samples=4, emb_dim=EMB, max_nodes=14, seed=3)
    model = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    bucket = Bucket(graphs=5, nodes=96, edges=256)
    batch = collate_retriever(
        ds.samples, entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket,
    )
    params = jax.jit(model.init)(jax.random.key(0), batch)
    got = np.asarray(jax.jit(model.apply)(params, batch).logits)
    p = jax.tree.map(np.asarray, params["params"])

    e_off = 0
    for s in ds.samples:
        ne = s.edge_index.shape[1]
        want = _oracle_retriever_logits(
            p, s, ds.entity_emb, ds.relation_emb, ds.question_emb
        ).numpy()
        np.testing.assert_allclose(
            got[e_off : e_off + ne], want, rtol=2e-4, atol=2e-5,
            err_msg=f"sample {s.sample_id}",
        )
        e_off += ne


# --------------------------------------------------------------------- #
# 2. Grouped InfoNCE oracle
# --------------------------------------------------------------------- #


def _oracle_infonce(logits, targets, edge_batch, num_graphs, temperature=1.0,
                    edge_weights=None):
    """``RetrieverLoss._infonce_loss`` (``retriever_loss.py:72-143``)."""
    pos_mask = targets > 0.5
    neg_mask = ~pos_mask
    if int(pos_mask.sum()) == 0 or int(neg_mask.sum()) == 0:
        return torch.zeros(()), 0
    scores = logits / temperature
    if edge_weights is not None:
        scores = scores + torch.log(edge_weights.clamp_min(1e-6))
    neg_inf = torch.tensor(float("-inf"))

    max_all = torch.full((num_graphs,), neg_inf)
    max_all.scatter_reduce_(0, edge_batch, scores, reduce="amax", include_self=True)
    scores_pos = scores.masked_fill(~pos_mask, neg_inf)
    max_pos = torch.full((num_graphs,), neg_inf)
    max_pos.scatter_reduce_(0, edge_batch, scores_pos, reduce="amax", include_self=True)

    exp_all = torch.exp(scores - max_all[edge_batch])
    sum_all = torch.zeros(num_graphs)
    sum_all.scatter_add_(0, edge_batch, exp_all)
    exp_pos = torch.zeros_like(scores)
    pos_idx = torch.nonzero(pos_mask).view(-1)
    exp_pos[pos_idx] = torch.exp(scores[pos_idx] - max_pos[edge_batch[pos_idx]])
    sum_pos = torch.zeros(num_graphs)
    sum_pos.scatter_add_(0, edge_batch, exp_pos)

    lse_all = max_all + torch.log(sum_all.clamp_min(1e-12))
    lse_pos = max_pos + torch.log(sum_pos.clamp_min(1e-12))

    pos_counts = torch.zeros(num_graphs)
    pos_counts.scatter_add_(0, edge_batch, pos_mask.float())
    edge_counts = torch.zeros(num_graphs)
    edge_counts.scatter_add_(0, edge_batch, torch.ones_like(scores))
    valid = (pos_counts > 0) & ((edge_counts - pos_counts) > 0)
    if not bool(valid.any()):
        return torch.zeros(()), 0
    return (lse_all - lse_pos)[valid].mean(), int(valid.sum())


@pytest.mark.parametrize("seed,weighted", [(0, False), (1, False), (2, True)])
def test_infonce_matches_torch_oracle(seed, weighted):
    from evi_rag_tpu.models.losses import RetrieverLossConfig, retriever_loss

    rng = np.random.default_rng(seed)
    g, e_real, e_pad = 6, 90, 128
    logits = rng.normal(size=e_real).astype(np.float32) * 3
    labels = (rng.random(e_real) < 0.3).astype(np.float32)
    edge_batch = np.sort(rng.integers(0, g, size=e_real)).astype(np.int32)
    labels[edge_batch == 2] = 0.0  # a graph with no positives (excluded)
    labels[edge_batch == 4] = 1.0  # a graph with no negatives (excluded)
    near = rng.random(e_real) < 0.5

    # Padded JAX-side arrays: padding edges live in an extra padding graph.
    pad = e_pad - e_real
    logits_p = np.concatenate([logits, rng.normal(size=pad).astype(np.float32)])
    labels_p = np.concatenate([labels, np.ones(pad, np.float32)])
    eb_p = np.concatenate([edge_batch, np.full(pad, g, np.int32)])
    mask_p = np.concatenate([np.ones(e_real, bool), np.zeros(pad, bool)])
    near_p = np.concatenate([near, np.zeros(pad, bool)])
    gmask = np.concatenate([np.ones(g, bool), [False]])

    cfg = RetrieverLossConfig(
        infonce_temperature=0.7,
        edge_weight_near=2.0 if weighted else 1.0,
        edge_weight_bridge=0.5 if weighted else 1.0,
    )
    out = retriever_loss(
        jnp.asarray(logits_p), jnp.asarray(labels_p), jnp.asarray(eb_p),
        num_graphs=g + 1, graph_mask=jnp.asarray(gmask),
        edge_mask=jnp.asarray(mask_p), config=cfg,
        edge_is_near=jnp.asarray(near_p) if weighted else None,
    )

    w = None
    if weighted:
        w = torch.where(torch.from_numpy(near), torch.tensor(2.0), torch.tensor(0.5))
    want, n_valid = _oracle_infonce(
        T(logits), T(labels), TL(edge_batch), g, temperature=0.7, edge_weights=w
    )
    np.testing.assert_allclose(
        float(out.components["infonce"]), float(want), rtol=1e-5, atol=1e-6
    )
    assert int(out.metrics["infonce_graphs"]) == n_valid


# --------------------------------------------------------------------- #
# 3. g_agent calibration + selection oracles
# --------------------------------------------------------------------- #


def _oracle_node_softmax_logit(edge_scores, heads, tails, num_nodes):
    """``GAgentBuilder._node_softmax_logit`` (``g_agent_builder.py:594-626``)."""
    neg_inf = torch.tensor(float("-inf"))

    def endpoint_prob(idx):
        mx = torch.full((num_nodes,), neg_inf)
        mx.scatter_reduce_(0, idx, edge_scores, reduce="amax", include_self=True)
        ex = torch.exp(edge_scores - mx[idx])
        sm = torch.zeros(num_nodes)
        sm.scatter_add_(0, idx, ex)
        return ex / sm[idx].clamp_min(1e-9)

    prob = (endpoint_prob(heads) + endpoint_prob(tails)) * 0.5
    prob = prob.clamp(min=1e-9, max=1.0 - 1e-9)
    return torch.log(prob) - torch.log1p(-prob)


def _oracle_select_start_edges(heads, tails, edge_scores, start_nodes, num_nodes,
                               keep_ratio, min_edges, max_edges):
    """``GAgentBuilder._select_start_edges`` (``g_agent_builder.py:656-724``)."""
    start_nodes = torch.unique(start_nodes)
    num_edges = int(edge_scores.numel())
    deg = torch.bincount(heads, minlength=num_nodes) + torch.bincount(tails, minlength=num_nodes)
    deg_s = deg.index_select(0, start_nodes)
    k_s = torch.ceil(deg_s.float() * keep_ratio).long()
    if min_edges > 0:
        k_s = torch.maximum(k_s, torch.full_like(k_s, min_edges))
    if max_edges is not None:
        k_s = torch.minimum(k_s, torch.full_like(k_s, max_edges))
    k_s = torch.minimum(k_s, deg_s)
    if k_s.numel() == 0 or int(k_s.max()) == 0:
        return torch.empty(0, dtype=torch.long)

    edge_idx = torch.arange(num_edges)
    nodes = torch.cat([heads, tails])
    edges = torch.cat([edge_idx, edge_idx])
    scores2 = torch.cat([edge_scores, edge_scores])
    start_mask = torch.zeros(num_nodes, dtype=torch.bool)
    start_mask[start_nodes] = True
    keep = start_mask[nodes]
    nodes, edges, scores2 = nodes[keep], edges[keep], scores2[keep]

    order_score = torch.argsort(scores2, descending=True, stable=True)
    nodes_sorted = nodes[order_score]
    edges_sorted = edges[order_score]
    order_node = torch.argsort(nodes_sorted, stable=True)
    nodes_g = nodes_sorted[order_node]
    edges_g = edges_sorted[order_node]
    counts = torch.bincount(nodes_g, minlength=num_nodes)
    offsets = torch.cumsum(counts, 0) - counts
    pos = torch.arange(nodes_g.numel()) - offsets[nodes_g]
    k_per = torch.zeros(num_nodes, dtype=torch.long)
    k_per[start_nodes] = k_s
    sel = pos < k_per[nodes_g]
    return torch.unique(edges_g[sel], sorted=True)


def test_g_agent_calibration_matches_torch_oracle():
    from evi_rag_tpu.data.g_agent import node_softmax_logit, select_start_edges, select_topk_edges

    rng = np.random.default_rng(11)
    for trial in range(4):
        n, e = 20 + trial * 7, 60 + trial * 20
        heads = rng.integers(0, n, size=e)
        tails = rng.integers(0, n, size=e)
        scores = rng.normal(size=e).astype(np.float32) * 2

        got = node_softmax_logit(scores, heads, tails, n)
        want = _oracle_node_softmax_logit(T(scores), TL(heads), TL(tails), n)
        np.testing.assert_allclose(got, want.numpy(), rtol=2e-5, atol=2e-6)

        # Top-k set parity (reference returns score order, repo sorted ids).
        k = 17
        got_k = set(select_topk_edges(scores, k).tolist())
        order = torch.argsort(T(scores), descending=True, stable=True)
        want_k = set(order[:k].tolist())
        assert got_k == want_k

        starts = rng.choice(n, size=3, replace=False)
        for ratio, mn, mx in [(0.3, 1, None), (0.8, 2, 4), (0.1, 0, 2)]:
            got_s = select_start_edges(
                heads=heads, tails=tails, scores=scores, start_nodes=starts,
                num_nodes=n, keep_ratio=ratio, min_edges=mn, max_edges=mx,
            )
            want_s = _oracle_select_start_edges(
                TL(heads), TL(tails), T(scores), TL(starts), n, ratio, mn, mx
            )
            np.testing.assert_array_equal(got_s, want_s.numpy(), err_msg=f"{ratio},{mn},{mx}")


# --------------------------------------------------------------------- #
# 4. Env step oracle
# --------------------------------------------------------------------- #


class _OracleEnv:
    """Mutable transcription of ``GraphEnv.step`` (``gflownet_env.py:266-387``)
    over the unpadded flat batch (real nodes/edges only)."""

    def __init__(self, *, edge_index, edge_batch, node_batch, node_ptr,
                 node_is_answer, start_active, max_steps, hidden_dim,
                 stop_on_answer=False):
        self.edge_index = edge_index
        self.edge_batch = edge_batch
        self.node_batch = node_batch
        self.node_ptr = node_ptr
        self.node_is_answer = node_is_answer
        self.max_steps = max_steps
        self.stop_on_answer = stop_on_answer
        g = int(node_ptr.numel()) - 1
        n = int(node_batch.numel())
        e = int(edge_batch.numel())
        self.num_graphs = g
        self.active = start_active.clone()
        self.visited = start_active.clone()
        self.used = torch.zeros(e, dtype=torch.bool)
        self.done = torch.zeros(g, dtype=torch.bool)
        self.step_counts = torch.zeros(g, dtype=torch.long)
        self.answer_hits = torch.zeros(g, dtype=torch.bool)
        self.answer_node_hit = torch.full((g,), -1, dtype=torch.long)
        self.start_node_hit = torch.full((g,), -1, dtype=torch.long)
        self.action_hidden = torch.zeros(g, hidden_dim)
        self.directions = []
        # reset-time 0-hop answer hit (gflownet_env.py:62-248)
        self._record_hits(initial=True)
        self.start_node_hit = torch.where(
            self.answer_hits, self.answer_node_hit, self.start_node_hit
        )
        if stop_on_answer:
            self.done = self.done | self.answer_hits

    def _record_hits(self, initial=False):
        hit_nodes = self.active & self.node_is_answer
        if not bool(hit_nodes.any()):
            return
        hit_idx = torch.nonzero(hit_nodes).view(-1)
        hit_batch = self.node_batch[hit_idx]
        local_idx = hit_idx - self.node_ptr[hit_batch]
        sentinel = int(self.node_ptr[-1]) + 1
        min_local = torch.full((self.num_graphs,), sentinel, dtype=torch.long)
        min_local.scatter_reduce_(0, hit_batch, local_idx, reduce="amin", include_self=True)
        has_hit = min_local != sentinel
        newly = (~self.answer_hits) & has_hit
        self.answer_node_hit = torch.where(newly, min_local, self.answer_node_hit)
        self.answer_hits = self.answer_hits | has_hit

    def candidate_mask(self):
        eb = self.edge_batch
        base = (~self.done[eb]) & (self.step_counts[eb] < self.max_steps)
        fwd = base & self.active[self.edge_index[0]]
        bwd = base & self.active[self.edge_index[1]]
        return fwd | bwd

    def step(self, actions, action_embeddings, step_index):
        g = self.num_graphs
        is_stop = (actions == -1) | self.done
        valid = ~is_stop
        e = int(self.edge_batch.numel())
        edge_selected = torch.zeros(e, dtype=torch.bool)
        if bool(valid.any()):
            edge_selected[actions[valid]] = True
        self.used = self.used | edge_selected

        step_directions = torch.zeros(g, dtype=torch.long)  # FORWARD
        next_active = torch.zeros_like(self.active)
        if bool(edge_selected.any()):
            heads = self.edge_index[0, edge_selected]
            tails = self.edge_index[1, edge_selected]
            head_active = self.active[heads]
            tail_active = self.active[tails]
            if step_index == 0:
                chosen = torch.where(head_active, heads, tails)
                gids = self.edge_batch[edge_selected]
                self.start_node_hit[gids] = chosen - self.node_ptr[gids]
            is_backward = (~head_active) & tail_active
            if bool(is_backward.any()):
                self.directions_backward = True
                step_directions[self.edge_batch[edge_selected][is_backward]] = 1
            next_active[tails[head_active]] = True
            next_active[heads[tail_active]] = True

        replace = valid
        if bool(replace.any()):
            rn = replace[self.node_batch]
            self.active = torch.where(rn, next_active, self.active)
        self.visited = self.visited | self.active
        self._record_hits()

        counts = self.step_counts.float().clamp(min=0)
        new_hidden = (self.action_hidden * counts.unsqueeze(-1) + action_embeddings) / (
            counts + 1.0
        ).unsqueeze(-1)
        self.action_hidden = torch.where(valid.unsqueeze(-1), new_hidden, self.action_hidden)

        self.step_counts = self.step_counts + valid.long()
        done = self.done | is_stop | (self.step_counts >= self.max_steps)
        if self.stop_on_answer:
            done = done | self.answer_hits
        self.done = done
        self.directions.append(step_directions)
        return step_directions


def _random_agent_batch(seed, num_samples=3):
    """Synthetic agent samples (retriever output shape) + padded AgentBatch."""
    from evi_rag_tpu.data.g_agent import AgentSample

    rng = np.random.default_rng(seed)
    samples = []
    for qid in range(num_samples):
        n = int(rng.integers(5, 10))
        e = int(rng.integers(6, 14))
        heads = rng.integers(0, n, size=e)
        tails = (heads + 1 + rng.integers(0, n - 1, size=e)) % n  # no self loops
        start = rng.choice(n, size=1)
        ans = rng.choice(n, size=1)
        samples.append(AgentSample(
            sample_id=f"p{qid}", question_id=qid, num_nodes=n,
            edge_head_locals=heads, edge_tail_locals=tails,
            edge_relations=rng.integers(0, 4, size=e),
            edge_scores=rng.normal(size=e).astype(np.float32),
            edge_labels=(rng.random(e) < 0.4).astype(np.float32),
            node_entity_ids=np.arange(n) + 100 * qid,
            node_embedding_ids=rng.integers(0, 8, size=n),
            start_entity_ids=start + 100 * qid,
            answer_entity_ids=ans + 100 * qid,
            start_node_locals=start, answer_node_locals=ans,
            pair_start_local=start, pair_answer_local=ans,
            pair_shortest_len=np.array([int(rng.integers(1, 4))]),
            is_answer_reachable=True, is_dummy_agent=False,
        ))
    ent = rng.normal(size=(8, EMB)).astype(np.float32)
    rel = rng.normal(size=(4, EMB)).astype(np.float32)
    q = rng.normal(size=(num_samples, EMB)).astype(np.float32)
    nodes = sum(s.num_nodes for s in samples)
    edges = sum(s.num_edges for s in samples)
    batch = collate_agent(
        samples, entity_emb=ent, relation_emb=rel, question_emb=q,
        bucket=Bucket(graphs=num_samples + 1, nodes=nodes + 4,
                      edges=edges + 4, pairs=num_samples + 2),
    )
    return samples, batch


@pytest.mark.parametrize("seed", [0, 7])
def test_env_step_matches_torch_oracle(seed):
    from evi_rag_tpu.models.gflownet.env import (
        STOP_ACTION, candidate_edge_masks, env_reset, env_step,
    )

    samples, batch = _random_agent_batch(seed)
    g_real = len(samples)
    n_real = sum(s.num_nodes for s in samples)
    e_real = sum(s.num_edges for s in samples)
    max_steps, hdim = 3, 4

    gb = batch.graph
    node_ptr = np.asarray(gb.node_ptr)[: g_real + 1]
    oracle = _OracleEnv(
        edge_index=TL(np.asarray(gb.edge_index)[:, :e_real]),
        edge_batch=TL(np.asarray(gb.edge_batch)[:e_real]),
        node_batch=TL(np.asarray(gb.node_batch)[:n_real]),
        node_ptr=TL(node_ptr),
        node_is_answer=torch.from_numpy(np.asarray(batch.node_is_answer)[:n_real]),
        start_active=torch.from_numpy(np.asarray(batch.node_is_start)[:n_real]),
        max_steps=max_steps, hidden_dim=hdim,
    )
    state = env_reset(batch, max_steps=max_steps, hidden_dim=hdim)

    rng = np.random.default_rng(seed + 100)
    for t in range(max_steps):
        fwd, bwd = candidate_edge_masks(state, batch, max_steps=max_steps)
        cand = np.asarray(fwd | bwd)[:e_real] & ~np.asarray(state.used_edge_mask)[:e_real]
        ocand = oracle.candidate_mask() & ~oracle.used
        np.testing.assert_array_equal(cand, ocand.numpy(), err_msg=f"step {t} candidates")

        actions = np.full(batch.graph.num_graphs, STOP_ACTION, np.int32)
        eb = np.asarray(batch.graph.edge_batch)[:e_real]
        for g in range(g_real):
            opts = np.nonzero(cand & (eb == g))[0]
            if opts.size and rng.random() < 0.8:
                actions[g] = int(rng.choice(opts))
        emb = rng.normal(size=(batch.graph.num_graphs, hdim)).astype(np.float32)

        odir = oracle.step(TL(actions[:g_real]), T(emb[:g_real]), t)
        state = env_step(
            state, batch, jnp.asarray(actions), jnp.asarray(emb),
            step_index=t, max_steps=max_steps,
        )

        np.testing.assert_array_equal(
            np.asarray(state.active_nodes)[:n_real], oracle.active.numpy(), err_msg=f"step {t}")
        np.testing.assert_array_equal(
            np.asarray(state.visited_nodes)[:n_real], oracle.visited.numpy())
        np.testing.assert_array_equal(
            np.asarray(state.used_edge_mask)[:e_real], oracle.used.numpy())
        np.testing.assert_array_equal(
            np.asarray(state.done)[:g_real], oracle.done.numpy())
        np.testing.assert_array_equal(
            np.asarray(state.step_counts)[:g_real], oracle.step_counts.numpy())
        np.testing.assert_array_equal(
            np.asarray(state.answer_hits)[:g_real], oracle.answer_hits.numpy())
        np.testing.assert_array_equal(
            np.asarray(state.answer_node_hit)[:g_real], oracle.answer_node_hit.numpy())
        np.testing.assert_array_equal(
            np.asarray(state.start_node_hit)[:g_real], oracle.start_node_hit.numpy())
        np.testing.assert_array_equal(
            np.asarray(state.directions)[:g_real, t], odir.numpy())
        np.testing.assert_allclose(
            np.asarray(state.action_hidden)[:g_real], oracle.action_hidden.numpy(),
            rtol=1e-6, atol=1e-7)


# --------------------------------------------------------------------- #
# 5. Reward oracle
# --------------------------------------------------------------------- #


def _oracle_reward(*, selected_mask, edge_scores, edge_batch, answer_hit,
                   dummy_mask, pair_start, pair_answer, pair_lengths,
                   start_node_hit, answer_node_hit, node_ptr, num_graphs,
                   log_success, log_failure, semantic_coef, length_coef):
    """``GFlowNetReward.forward`` (``gflownet_rewards.py:57-213``); pair ids
    arrive GLOBAL (node_ptr-offset) exactly like the reference and are
    re-localized via bucketize."""
    mask_f = selected_mask.float()
    path_len = torch.zeros(num_graphs)
    path_len.index_add_(0, edge_batch, mask_f)

    semantic_sum = torch.zeros(num_graphs)
    semantic_sum.index_add_(0, edge_batch, mask_f * torch.sigmoid(edge_scores))
    semantic_score = semantic_sum / path_len.clamp(min=1.0)

    # _match_shortest_lengths (158-213) with scatter_reduce_ amin replacing
    # torch_scatter.scatter_min.
    pair_graph = torch.bucketize(pair_start, node_ptr[1:], right=True)
    pair_start_local = pair_start - node_ptr[pair_graph]
    pair_answer_local = pair_answer - node_ptr[pair_graph]
    match = (pair_start_local == start_node_hit[pair_graph]) & (
        pair_answer_local == answer_node_hit[pair_graph]
    )
    if bool(match.any()):
        mg = pair_graph[match]
        ml = pair_lengths[match]
        match_counts = torch.bincount(mg, minlength=num_graphs)
        sentinel = int(ml.max()) + 1
        out = torch.full((num_graphs,), sentinel, dtype=ml.dtype)
        out.scatter_reduce_(0, mg, ml, reduce="amin", include_self=True)
        shortest_len = torch.where(match_counts > 0, out, torch.full_like(out, -1))
    else:
        shortest_len = torch.full((num_graphs,), -1, dtype=torch.long)

    hit_mask = answer_hit.bool()
    shortest_f = shortest_len.float()
    missing = shortest_f < 0
    length_cost = torch.where(
        hit_mask & (~missing), (path_len - shortest_f).clamp(min=0.0),
        torch.zeros_like(path_len),
    )
    semantic_score = torch.where(hit_mask, semantic_score, torch.zeros_like(semantic_score))
    length_cost = torch.where(hit_mask, length_cost, torch.zeros_like(length_cost))
    log_reward = torch.where(
        hit_mask,
        log_success + semantic_coef * semantic_score - length_coef * length_cost,
        torch.full((num_graphs,), log_failure),
    )
    log_reward = torch.where(dummy_mask, torch.full_like(log_reward, float("-inf")), log_reward)
    return log_reward, torch.where(dummy_mask, torch.zeros_like(path_len), path_len), shortest_len


@pytest.mark.parametrize("seed", [1, 5])
def test_reward_matches_torch_oracle(seed):
    import math

    from evi_rag_tpu.models.gflownet.reward import RewardConfig, compute_reward

    samples, batch = _random_agent_batch(seed)
    g_real = len(samples)
    e_real = sum(s.num_edges for s in samples)
    rng = np.random.default_rng(seed + 3)
    g_pad = batch.graph.num_graphs

    selected = np.zeros(batch.graph.num_edges, bool)
    selected[:e_real] = rng.random(e_real) < 0.4
    answer_hit = rng.random(g_pad) < 0.6
    answer_hit[g_real:] = False
    # realized hit endpoints: sometimes the supervised pair, sometimes not
    start_hit = np.full(g_pad, -1, np.int64)
    ans_hit = np.full(g_pad, -1, np.int64)
    for g, s in enumerate(samples):
        if rng.random() < 0.7:
            start_hit[g] = int(s.pair_start_local[0])
            ans_hit[g] = int(s.pair_answer_local[0])
        else:
            start_hit[g] = int(rng.integers(0, s.num_nodes))
            ans_hit[g] = int(rng.integers(0, s.num_nodes))

    cfg = RewardConfig(success_reward=1.0, failure_reward=1e-4,
                       semantic_coef=1.3, length_coef=0.8)
    out = compute_reward(
        batch, selected_mask=jnp.asarray(selected),
        answer_hit=jnp.asarray(answer_hit),
        start_node_hit=jnp.asarray(start_hit.astype(np.int32)),
        answer_node_hit=jnp.asarray(ans_hit.astype(np.int32)),
        config=cfg,
    )

    # Oracle inputs: unpadded, pairs in GLOBAL node ids like the reference.
    node_ptr = np.asarray(batch.graph.node_ptr)[: g_real + 1].astype(np.int64)
    pair_start_g, pair_ans_g, pair_len = [], [], []
    for g, s in enumerate(samples):
        pair_start_g += (s.pair_start_local + node_ptr[g]).tolist()
        pair_ans_g += (s.pair_answer_local + node_ptr[g]).tolist()
        pair_len += s.pair_shortest_len.tolist()
    want_lr, want_pl, want_sl = _oracle_reward(
        selected_mask=torch.from_numpy(selected[:e_real]),
        edge_scores=T(np.asarray(batch.edge_scores)[:e_real]),
        edge_batch=TL(np.asarray(batch.graph.edge_batch)[:e_real]),
        answer_hit=torch.from_numpy(answer_hit[:g_real]),
        dummy_mask=torch.zeros(g_real, dtype=torch.bool),
        pair_start=TL(pair_start_g), pair_answer=TL(pair_ans_g),
        pair_lengths=TL(pair_len),
        start_node_hit=TL(start_hit[:g_real]), answer_node_hit=TL(ans_hit[:g_real]),
        node_ptr=TL(node_ptr), num_graphs=g_real,
        log_success=math.log(1.0), log_failure=math.log(1e-4),
        semantic_coef=1.3, length_coef=0.8,
    )
    np.testing.assert_allclose(
        np.asarray(out.log_reward)[:g_real], want_lr.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out.path_len)[:g_real], want_pl.numpy(), rtol=1e-6, atol=0)
    np.testing.assert_array_equal(
        np.asarray(out.shortest_len)[:g_real], want_sl.numpy())


# --------------------------------------------------------------------- #
# 6. SubTB oracle
# --------------------------------------------------------------------- #


def _oracle_subtb(log_flow_states, log_pf_steps, edge_lengths, graph_mask=None):
    """``GFlowNetModule._compute_subtb_loss`` (``gflownet_module.py:980-1036``)."""
    num_graphs, num_actions = log_pf_steps.shape
    log_pf_prefix = torch.zeros(num_graphs, num_actions + 1)
    log_pf_prefix[:, 1:] = log_pf_steps.cumsum(dim=1)
    a = log_flow_states - log_pf_prefix
    b = log_pf_prefix - log_flow_states
    a_cumsum = a.cumsum(dim=1)
    a2_cumsum = (a * a).cumsum(dim=1)
    prefix_a = a_cumsum - a
    prefix_a2 = a2_cumsum - a * a
    idx = torch.arange(num_actions + 1, dtype=log_pf_steps.dtype).view(1, -1)
    contrib = prefix_a2 + 2.0 * b * prefix_a + idx * (b * b)
    term_state = edge_lengths.clamp(min=0, max=num_actions - 1) + 1
    mask = idx <= term_state.view(-1, 1)
    mask_f = mask.to(dtype=contrib.dtype)
    sum_sq = (contrib * mask_f).sum(dim=1)
    denom = (idx * mask_f).sum(dim=1).clamp(min=1.0)
    per_graph = sum_sq / denom
    if graph_mask is not None:
        w = graph_mask.to(dtype=per_graph.dtype)
        return (per_graph * w).sum() / w.sum().clamp(min=1.0)
    return per_graph.mean()


def _oracle_log_flow_states(log_flow_pred, log_reward, edge_lengths):
    """``_compute_log_flow_states`` terminal handling (``gflownet_module.py:907-915``)."""
    g, t = log_flow_pred.shape
    states = torch.zeros(g, t + 1)
    states[:, :t] = log_flow_pred
    states[:, t] = log_reward
    term = edge_lengths.clamp(min=0, max=t - 1) + 1
    states.scatter_(1, term.view(-1, 1), log_reward.view(-1, 1))
    return states


@pytest.mark.parametrize("seed", [2, 9])
def test_subtb_matches_torch_oracle(seed):
    from evi_rag_tpu.models.gflownet.subtb import log_flow_with_terminal_reward, subtb_loss

    rng = np.random.default_rng(seed)
    g, t = 5, 4
    log_flow_pred = rng.normal(size=(g, t)).astype(np.float32)
    log_pf = -np.abs(rng.normal(size=(g, t))).astype(np.float32)
    log_reward = rng.normal(size=g).astype(np.float32)
    edge_lengths = rng.integers(0, t + 1, size=g).astype(np.int32)
    gmask = rng.random(g) < 0.8

    states = log_flow_with_terminal_reward(
        jnp.asarray(log_flow_pred), jnp.asarray(log_reward), jnp.asarray(edge_lengths)
    )
    want_states = _oracle_log_flow_states(
        T(log_flow_pred), T(log_reward), TL(edge_lengths)
    )
    np.testing.assert_allclose(np.asarray(states), want_states.numpy(), rtol=1e-6, atol=1e-7)

    got = subtb_loss(
        states, jnp.asarray(log_pf), jnp.asarray(edge_lengths),
        graph_mask=jnp.asarray(gmask),
    )
    want = _oracle_subtb(want_states, T(log_pf), TL(edge_lengths), torch.from_numpy(gmask))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5, atol=1e-6)

    got_nm = subtb_loss(states, jnp.asarray(log_pf), jnp.asarray(edge_lengths))
    want_nm = _oracle_subtb(want_states, T(log_pf), TL(edge_lengths))
    np.testing.assert_allclose(float(got_nm), float(want_nm), rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------- #
# 7. Actor joint edges+STOP log-prob oracle
# --------------------------------------------------------------------- #


def _oracle_log_probs_edges(edge_logits, stop_logits, edge_batch, valid_edges,
                            num_graphs, temp):
    """``GFlowNetActor._log_probs_edges`` (``gflownet_actor.py:375-418``),
    segment-logsumexp via scatter_reduce_ amax + scatter_add_."""
    neg_inf = torch.finfo(torch.float32).min
    edge_scaled = edge_logits.float() / temp
    stop_scaled = stop_logits.float() / temp
    v = valid_edges.bool()
    if bool(v.any()):
        mx = torch.full((num_graphs,), neg_inf)
        mx.scatter_reduce_(0, edge_batch[v], edge_scaled[v], reduce="amax", include_self=True)
        ex = torch.exp(edge_scaled[v] - mx[edge_batch[v]])
        sm = torch.zeros(num_graphs)
        sm.scatter_add_(0, edge_batch[v], ex)
        lse = torch.where(
            sm > 0, mx + torch.log(sm.clamp_min(1e-38)), torch.full_like(mx, neg_inf)
        )
    else:
        lse = torch.full((num_graphs,), neg_inf)
    log_denom = torch.logaddexp(lse, stop_scaled)
    lp_edge = edge_scaled - log_denom[edge_batch]
    lp_edge = torch.where(v, lp_edge, torch.full_like(lp_edge, neg_inf))
    lp_stop = stop_scaled - log_denom
    has_edge = lse > neg_inf
    return lp_edge, lp_stop, has_edge


@pytest.mark.parametrize("seed", [3, 12])
def test_actor_log_probs_match_torch_oracle(seed):
    from evi_rag_tpu.models.gflownet.actor import log_probs_edges

    rng = np.random.default_rng(seed)
    g, e = 5, 40
    edge_logits = (rng.normal(size=e) * 3).astype(np.float32)
    stop_logits = (rng.normal(size=g) * 2).astype(np.float32)
    edge_batch = np.sort(rng.integers(0, g, size=e)).astype(np.int32)
    valid = rng.random(e) < 0.7
    valid[edge_batch == 3] = False  # a graph with no valid edges (stop-only)
    temp = 0.8

    lp_e, lp_s, has = log_probs_edges(
        jnp.asarray(edge_logits), jnp.asarray(stop_logits),
        jnp.asarray(edge_batch), jnp.asarray(valid), g, temp,
    )
    o_e, o_s, o_has = _oracle_log_probs_edges(
        T(edge_logits), T(stop_logits), TL(edge_batch),
        torch.from_numpy(valid), g, temp,
    )
    np.testing.assert_allclose(np.asarray(lp_s), o_s.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(has), o_has.numpy())
    ve = valid  # compare only valid edges (invalid are -inf sentinels both sides)
    np.testing.assert_allclose(
        np.asarray(lp_e)[ve], o_e.numpy()[ve], rtol=1e-5, atol=1e-6
    )
    # The joint categorical normalizes: sum_e P(e) + P(stop) == 1 per graph.
    pe = np.exp(np.asarray(lp_e)[ve])
    tot = np.zeros(g)
    np.add.at(tot, edge_batch[ve], pe)
    tot += np.exp(np.asarray(lp_s))
    np.testing.assert_allclose(tot, np.ones(g), rtol=1e-5)
