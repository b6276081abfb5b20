"""GFlowNet rollout + SubTB training: correctness and a few update steps."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evi_rag_tpu.data.feeder import Bucket, collate_agent, fixed_agent_bucket
from evi_rag_tpu.data.g_agent import AgentSettings, build_agent_sample
from evi_rag_tpu.data.synthetic import make_synthetic_dataset
from evi_rag_tpu.models.gflownet.actor import ActorConfig, rollout
from evi_rag_tpu.models.gflownet.embedder import embed_agent_batch, init_edge_score_proj
from evi_rag_tpu.models.gflownet.subtb import (
    bc_weight_schedule,
    log_flow_with_terminal_reward,
    subtb_loss,
)
from evi_rag_tpu.models.retriever import Retriever
from evi_rag_tpu.train.checkpoint import export_retriever_features
from evi_rag_tpu.train.gflownet_trainer import (
    GFlowNetConfig,
    build_modules,
    init_gflownet_params,
    make_gfn_eval_step,
    make_gfn_train_step,
)
from evi_rag_tpu.train.optim import OptimizerConfig
from evi_rag_tpu.train.retriever_trainer import TrainState
from evi_rag_tpu.train.optim import setup_optimizer

EMB = 16


@pytest.fixture(scope="module")
def setup():
    ds = make_synthetic_dataset(num_samples=8, emb_dim=EMB, max_nodes=12, seed=5)
    rng = np.random.default_rng(0)
    agent_samples = []
    for s in ds.samples:
        a = build_agent_sample(
            sample_id=s.sample_id,
            question_id=s.question_id,
            heads=s.edge_index[0],
            tails=s.edge_index[1],
            relations=s.edge_relations,
            labels=s.edge_labels.astype(np.float32),
            scores=rng.normal(size=s.edge_index.shape[1]).astype(np.float32)
            + 2.0 * s.edge_labels.astype(np.float32),
            node_entity_ids=np.arange(1000, 1000 + s.num_nodes),
            node_embedding_ids=s.node_embedding_ids,
            start_entity_ids=1000 + s.topic_locals,
            answer_entity_ids=1000 + s.answer_locals,
            settings=AgentSettings(edge_top_k=20, max_hops=3, score_mode="logits"),
        )
        if a is not None:
            agent_samples.append(a)
    assert len(agent_samples) >= 4
    agent_samples = agent_samples[:4]
    bucket = fixed_agent_bucket(agent_samples, 4)
    bucket = dataclasses.replace(bucket, nodes=min(bucket.nodes, 128), edges=min(bucket.edges, 512))
    batch = collate_agent(
        agent_samples,
        entity_emb=ds.entity_emb,
        relation_emb=ds.relation_emb,
        question_emb=ds.question_emb,
        bucket=bucket,
    )
    retr = Retriever(emb_dim=EMB, hidden_dim=EMB, dropout_p=0.0)
    # Build a minimal retriever batch for init shapes: reuse agent arrays.
    from evi_rag_tpu.models.batches import RetrieverBatch

    rb = RetrieverBatch(
        graph=batch.graph,
        node_emb=batch.node_emb,
        node_is_nontext=batch.node_is_nontext,
        edge_emb=batch.edge_emb,
        question_emb=batch.question_emb,
        topic_one_hot=jnp.stack(
            [batch.node_is_start.astype(jnp.float32), 1 - batch.node_is_start.astype(jnp.float32)],
            axis=-1,
        ),
        edge_labels=batch.edge_labels,
        node_is_q=batch.node_is_start,
        node_is_a=batch.node_is_answer,
    )
    rparams = jax.jit(retr.init)(jax.random.key(0), rb)
    bundle = export_retriever_features(rparams["params"], retr.parity_meta())
    return ds, batch, bundle


def _cfg():
    return GFlowNetConfig(
        hidden_dim=EMB,
        max_steps=2,
        stop_on_answer=True,
        num_train_rollouts=2,
        bc_weight=0.5,
        total_steps=50,
        eval_rollout_prefixes=(1, 2, 4),
        optimizer=OptimizerConfig(name="adamw", learning_rate=1e-3, grad_clip_norm=1.0),
        dropout=0.0,
    )


def test_embedder_outputs(setup):
    _, batch, bundle = setup
    out = jax.jit(
        lambda b: embed_agent_batch(bundle, b, edge_score_proj=init_edge_score_proj(EMB))
    )(batch)
    assert out.edge_tokens.shape == (batch.graph.num_edges, EMB)
    assert out.node_tokens.shape == (batch.graph.num_nodes, EMB)
    assert np.isfinite(np.asarray(out.edge_tokens)).all()
    # Zero-init score proj: token independent of score at init.


def test_rollout_shapes_and_logpf(setup):
    _, batch, bundle = setup
    cfg = _cfg()
    modules = build_modules(cfg)
    params = init_gflownet_params(cfg, modules, bundle, batch, seed=0)

    @jax.jit
    def run(key):
        embed = embed_agent_batch(bundle, batch, edge_score_proj=params["edge_score_proj"])
        return rollout(
            policy=modules.policy,
            state_encoder=modules.state_encoder,
            policy_params=params["policy"],
            encoder_params=params["state_encoder"],
            batch=batch,
            embed=embed,
            rng=key,
            config=cfg.actor,
        )

    ro = run(jax.random.key(0))
    g = batch.graph.num_graphs
    T = cfg.max_steps + 1
    assert ro["log_pf_steps"].shape == (g, T)
    assert ro["state_emb_seq"].shape == (g, T, EMB)
    assert ro["actions_seq"].shape == (g, T)
    lp = np.asarray(ro["log_pf"])
    assert np.isfinite(lp).all()
    assert (lp <= 1e-5).all()  # log-probabilities
    # Selected edges belong to the right graphs and respect ordering.
    sel = np.asarray(ro["selected_mask"])
    order = np.asarray(ro["selection_order"])
    assert ((order >= 0) == sel).all()
    # Actions in sequence either STOP or valid edges of their own graph.
    eb = np.asarray(batch.graph.edge_batch)
    for g_i in range(g - 1):
        for t in range(T):
            a = int(ro["actions_seq"][g_i, t])
            if a >= 0:
                assert eb[a] == g_i


def test_forced_rollout_replays_actions(setup):
    _, batch, bundle = setup
    cfg = _cfg()
    modules = build_modules(cfg)
    params = init_gflownet_params(cfg, modules, bundle, batch, seed=0)
    embed = embed_agent_batch(bundle, batch, edge_score_proj=params["edge_score_proj"])
    free = rollout(
        policy=modules.policy, state_encoder=modules.state_encoder,
        policy_params=params["policy"], encoder_params=params["state_encoder"],
        batch=batch, embed=embed, rng=jax.random.key(3), config=cfg.actor,
    )
    forced = rollout(
        policy=modules.policy, state_encoder=modules.state_encoder,
        policy_params=params["policy"], encoder_params=params["state_encoder"],
        batch=batch, embed=embed, rng=jax.random.key(99), config=cfg.actor,
        forced_actions=free["actions_seq"],
    )
    np.testing.assert_array_equal(
        np.asarray(forced["actions_seq"]), np.asarray(free["actions_seq"])
    )
    np.testing.assert_allclose(
        np.asarray(forced["log_pf"]), np.asarray(free["log_pf"]), rtol=1e-4, atol=1e-5
    )


def test_subtb_closed_form_vs_bruteforce():
    rng = np.random.default_rng(0)
    G, T = 3, 4
    log_pf = rng.normal(size=(G, T)).astype(np.float32)
    log_flow = rng.normal(size=(G, T + 1)).astype(np.float32)
    lengths = np.array([0, 2, 3])
    got = float(subtb_loss(jnp.asarray(log_flow), jnp.asarray(log_pf), jnp.asarray(lengths)))
    # Brute force: sum over 0<=i<j<=term of (F_i + sum pf[i:j] - F_j)^2.
    per = []
    for g in range(G):
        term = min(max(lengths[g], 0), T - 1) + 1
        prefix = np.concatenate([[0], np.cumsum(log_pf[g])])
        tot, cnt = 0.0, 0
        for i in range(term + 1):
            for j in range(i + 1, term + 1):
                r = log_flow[g, i] + (prefix[j] - prefix[i]) - log_flow[g, j]
                tot += r * r
                cnt += 1
        per.append(tot / max(cnt, 1))
    np.testing.assert_allclose(got, np.mean(per), rtol=1e-4)


def test_log_flow_terminal_overwrite():
    lf = jnp.zeros((2, 3))
    lr = jnp.asarray([5.0, 7.0])
    lengths = jnp.asarray([1, 99])
    out = np.asarray(log_flow_with_terminal_reward(lf, lr, lengths))
    assert out.shape == (2, 4)
    assert out[0, 2] == 5.0 and out[0, 3] == 5.0
    assert out[1, 3] == 7.0  # clamped to last slot


def test_bc_schedule():
    w = bc_weight_schedule(0, bc_weight=1.0, hold_steps=10, decay_steps=10)
    assert float(w) == 1.0
    w = bc_weight_schedule(20, bc_weight=1.0, hold_steps=10, decay_steps=10)
    assert float(w) == pytest.approx(0.0, abs=1e-6)
    w = bc_weight_schedule(15, bc_weight=1.0, hold_steps=10, decay_steps=10)
    assert 0.4 < float(w) < 0.6


def test_gfn_train_steps_reduce_loss(setup):
    _, batch, bundle = setup
    cfg = _cfg()
    modules = build_modules(cfg)
    params = init_gflownet_params(cfg, modules, bundle, batch, seed=0)
    tx = setup_optimizer(cfg.optimizer, params)
    state = TrainState(
        params=params, opt_state=jax.jit(tx.init)(params),
        step=jnp.zeros((), jnp.int32), rng=jax.random.key(1),
    )
    step = make_gfn_train_step(modules, tx, cfg, bundle)
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    eval_step = make_gfn_eval_step(modules, cfg, bundle, num_rollouts=4)
    res = eval_step(state.params, batch, jax.random.key(2))
    assert np.isfinite(float(res["loss"]))
    hit1 = np.asarray(res["answer_hit@1"])
    hit4 = np.asarray(res["answer_hit@4"])
    valid = np.asarray(res["graph_valid"])
    assert (hit4[valid] >= hit1[valid]).all()  # best-of-k monotone
    # Reference-protocol variant: dummy graphs count as misses, so the
    # dummy-inclusive hit vector is <= the dummy-exclusive one everywhere
    # and exactly 0 on dummy slots.
    ref4 = np.asarray(res["answer_hit_ref@4"])
    valid_ref = np.asarray(res["graph_valid_ref"])
    assert (ref4 <= hit4).all()
    assert (ref4[~valid] == 0).all()
    assert valid_ref.sum() >= valid.sum()


def test_eval_step_collect_rollouts_consistent(setup):
    """collect_rollouts returns the SAME sampled trajectories the metric
    suite scored: per-rollout hits must reproduce answer_hit@R for valid
    graphs, and action/direction shapes must match [R, G, T]."""
    _, batch, bundle = setup
    cfg = _cfg()
    modules = build_modules(cfg)
    params = init_gflownet_params(cfg, modules, bundle, batch, seed=0)
    R = 4
    eval_step = make_gfn_eval_step(
        modules, cfg, bundle, num_rollouts=R, collect_rollouts=True
    )
    res = eval_step(params, batch, jax.random.key(2))
    G = int(batch.graph.num_graphs)
    acts = np.asarray(res["rollout_actions"])
    dirs = np.asarray(res["rollout_directions"])
    hits = np.asarray(res["rollout_hits"])
    assert acts.ndim == 3 and acts.shape[:2] == (R, G)
    assert dirs.shape == acts.shape
    assert hits.shape == (R, G)
    valid = np.asarray(res["graph_valid"])
    hit_r = np.asarray(res[f"answer_hit@{R}"])
    assert (hits.any(axis=0)[valid] == hit_r.astype(bool)[valid]).all()
    # Plain eval step (no flag) must not carry trajectory fields.
    res0 = make_gfn_eval_step(modules, cfg, bundle, num_rollouts=R)(
        params, batch, jax.random.key(2)
    )
    assert "rollout_actions" not in res0
    # Same rng => identical metric values with and without collection.
    np.testing.assert_allclose(
        np.asarray(res0[f"answer_hit@{R}"]), hit_r, rtol=0, atol=0
    )


def test_bf16_policy_close_to_f32_and_trains(setup):
    """The bf16 policy (reference 16-mixed capability, trainer/gpu.yaml) must
    produce logits within bf16 quantization of the f32 policy on identical
    params, keep log-probs f32, and still reduce the training loss."""
    _, batch, bundle = setup
    cfg32 = _cfg()
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    mods32, mods16 = build_modules(cfg32), build_modules(cfg16)
    params = init_gflownet_params(cfg32, mods32, bundle, batch, seed=0)

    from evi_rag_tpu.models.gflownet.embedder import embed_agent_batch_frozen

    emb = embed_agent_batch_frozen(bundle, batch)
    edge_tokens = emb.edge_tokens + jnp.asarray(batch.edge_scores)[:, None] * 0.0
    g = int(batch.graph.num_graphs)
    state_tokens = jnp.asarray(
        np.random.default_rng(3).normal(size=(g, EMB)), jnp.float32
    )
    valid = jnp.asarray(batch.graph.edge_mask)
    pp = params["policy"]
    out32 = mods32.policy.apply(pp, edge_tokens, state_tokens,
                                batch.graph.edge_batch, valid)
    out16 = mods16.policy.apply(pp, edge_tokens, state_tokens,
                                batch.graph.edge_batch, valid)
    for a, b in zip(out32, out16):
        assert a.dtype == jnp.float32 and b.dtype == jnp.float32
        fa, fb = np.asarray(a), np.asarray(b)
        m = np.isfinite(fa)
        scale = np.maximum(np.abs(fa[m]), 1.0)
        assert np.max(np.abs(fa[m] - fb[m]) / scale) < 0.1

    # bf16 end-to-end: a few train steps stay finite and reduce the loss.
    params16 = init_gflownet_params(cfg16, mods16, bundle, batch, seed=0)
    tx = setup_optimizer(cfg16.optimizer, params16)
    state = TrainState(
        params=params16, opt_state=jax.jit(tx.init)(params16),
        step=jnp.zeros((), jnp.int32), rng=jax.random.key(1),
    )
    step = make_gfn_train_step(mods16, tx, cfg16, bundle)
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_state_dde_variant(setup):
    """use_state_dde adds struct tokens to the state without breaking training."""
    _, batch, bundle = setup
    cfg = dataclasses.replace(_cfg(), use_state_dde=True)
    modules = build_modules(cfg)
    params = init_gflownet_params(cfg, modules, bundle, batch, seed=0)
    assert "state_dde_proj" in str(jax.tree_util.tree_structure(params["state_encoder"]))
    tx = setup_optimizer(cfg.optimizer, params)
    state = TrainState(
        params=params, opt_state=jax.jit(tx.init)(params),
        step=jnp.zeros((), jnp.int32), rng=jax.random.key(3),
    )
    step = make_gfn_train_step(modules, tx, cfg, bundle)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_concat_mode_embedder(setup):
    """Legacy concat-mode bundle: split-weight adapter == dense concat."""
    from evi_rag_tpu.models.gflownet.embedder import _adapter_features

    _, batch, bundle = setup
    rng = np.random.default_rng(4)
    H, S = EMB, 2 * 2 * (1 + 2 + 2)
    adapter = {
        "dense_0": {
            "kernel": jnp.asarray(rng.normal(size=(4 * H + S, H)).astype(np.float32)),
            "bias": jnp.zeros(H),
        },
        "norm": {"scale": jnp.ones(H), "bias": jnp.zeros(H)},
        "dense_1": {
            "kernel": jnp.asarray(rng.normal(size=(H, H)).astype(np.float32)),
            "bias": jnp.zeros(H),
        },
    }
    E = 7
    q = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(E, H)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(E, S)).astype(np.float32))
    got = _adapter_features(adapter, q_edge=q, head_edge=h, relation_edge=r, tail_edge=t, struct_edge=s)
    # Dense reference.
    concat = jnp.concatenate([q, h, r, t, s], axis=-1)
    z = concat @ adapter["dense_0"]["kernel"] + adapter["dense_0"]["bias"]
    mean = z.mean(-1, keepdims=True)
    var = ((z - mean) ** 2).mean(-1, keepdims=True)
    z = (z - mean) * jax.lax.rsqrt(var + 1e-5)  # torch LayerNorm eps
    # Exact (erf) GELU, matching the reference nn.GELU() semantics.
    want = jax.nn.gelu(z, approximate=False) @ adapter["dense_1"]["kernel"] + adapter["dense_1"]["bias"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    # Full embed path with a concat bundle.
    concat_bundle = {
        "edge_mode": "concat",
        "parity_meta": bundle["parity_meta"],
        "features": {
            **{k: bundle["features"][k] for k in ("entity_proj", "relation_proj", "query_proj", "non_text_entity_emb")},
            "edge_adapter": adapter,
        },
    }
    out = embed_agent_batch(concat_bundle, batch, edge_score_proj=init_edge_score_proj(H))
    assert out.edge_tokens.shape == (batch.graph.num_edges, H)
    assert np.isfinite(np.asarray(out.edge_tokens)).all()


def test_training_with_dummy_agents_is_finite(setup):
    """Dummy agents (answer absent) carry -inf log-reward; the loss masking
    must keep gradients finite (reference zeroes dummies for the loss,
    gflownet_module.py:520-550)."""
    ds, batch, bundle = setup
    # Mark one real graph as dummy.
    dummy = np.asarray(batch.is_dummy).copy()
    dummy[0] = True
    batch_d = dataclasses.replace(batch, is_dummy=jnp.asarray(dummy))
    cfg = _cfg()
    modules = build_modules(cfg)
    params = init_gflownet_params(cfg, modules, bundle, batch_d, seed=0)
    tx = setup_optimizer(cfg.optimizer, params)
    state = TrainState(
        params=params, opt_state=jax.jit(tx.init)(params),
        step=jnp.zeros((), jnp.int32), rng=jax.random.key(5),
    )
    step = make_gfn_train_step(modules, tx, cfg, bundle)
    state2, m = step(state, batch_d)
    assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree.leaves(state2.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_cached_frozen_embed_matches_uncached(setup):
    """Passing the precomputed frozen embedding to the train step yields the
    exact same update as computing it inline (the cache is a pure hoist)."""
    from evi_rag_tpu.models.gflownet.embedder import embed_agent_batch_frozen

    _, batch, bundle = setup
    cfg = _cfg()
    modules = build_modules(cfg)
    params = init_gflownet_params(cfg, modules, bundle, batch, seed=0)
    tx = setup_optimizer(cfg.optimizer, params)

    def fresh_state():
        return TrainState(
            params=jax.tree.map(lambda x: x, params),
            opt_state=jax.jit(tx.init)(params),
            step=jnp.zeros((), jnp.int32), rng=jax.random.key(7),
        )

    step = make_gfn_train_step(modules, tx, cfg, bundle)
    s1, m1 = step(fresh_state(), batch)
    frozen = jax.jit(lambda b: embed_agent_batch_frozen(bundle, b))(batch)
    s2, m2 = step(fresh_state(), batch, frozen)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_fit_gflownet_with_embed_cache(setup):
    """fit_gflownet(cache_frozen_embed=True) trains to a finite monitor."""
    from evi_rag_tpu.train.gflownet_trainer import fit_gflownet

    _, batch, bundle = setup
    cfg = dataclasses.replace(_cfg(), max_epochs=2, cache_frozen_embed=True)

    def train_batches(epoch):
        return [batch]

    def val_batches():
        return [batch]

    best, info = fit_gflownet(cfg, bundle, train_batches, val_batches, seed=0, eval_rollouts=2)
    assert np.isfinite(info["best_score"])
    assert len(info["history"]) == 2
