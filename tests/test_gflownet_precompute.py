"""Precomputed-policy rollout path == canonical per-step policy path.

The rollout restructure (``PolicyStepTensors``; VERDICT r3 #5) hoists the
per-step edge-axis matmuls out of the scan via a LayerNorm+Dense split.  These
tests pin the two paths equal on the same keys/params: exactly-equal actions
and tight-tolerance log-probs at f32 (the only differences are f32
reassociation), and step-level policy-output parity against ``__call__``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evi_rag_tpu.models.gflownet.actor import rollout
from evi_rag_tpu.models.gflownet.embedder import embed_agent_batch
from evi_rag_tpu.models.gflownet.policy import GFlowNetEdgePolicy
from evi_rag_tpu.train.gflownet_trainer import build_modules, init_gflownet_params

from tests.test_gflownet_train import EMB, _cfg, setup  # noqa: F401  (fixture)


def _jitter(params, seed=7, scale=0.05):
    """Break the zero-inits so logits are non-trivial (zero-init heads give
    all-zero logits, which would hide head-math bugs behind constant outputs)."""
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.key(seed), len(leaves))
    return jax.tree.unflatten(
        treedef,
        [l + scale * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)],
    )


def _run_rollout(setup_data, *, precompute, key, train=False, dropout=0.0,
                 compute_dtype="float32", greedy=False):
    _, batch, bundle = setup_data
    cfg = dataclasses.replace(_cfg(), dropout=dropout, compute_dtype=compute_dtype)
    modules = build_modules(cfg)
    params = init_gflownet_params(cfg, modules, bundle, batch, seed=0)
    params = {k: (_jitter(v) if k != "edge_score_proj" else v) for k, v in params.items()}
    embed = embed_agent_batch(bundle, batch, edge_score_proj=params["edge_score_proj"])
    dag = (batch.edge_labels > 0.5) & batch.graph.edge_mask
    actor_cfg = dataclasses.replace(cfg.actor, precompute_policy=precompute)
    return jax.jit(
        lambda k: rollout(
            policy=modules.policy, state_encoder=modules.state_encoder,
            policy_params=params["policy"], encoder_params=params["state_encoder"],
            batch=batch, embed=embed, rng=k, config=actor_cfg,
            dag_edge_mask=dag, train=train, greedy=greedy,
        )
    )(key)


@pytest.mark.parametrize("greedy", [False, True])
def test_rollout_paths_match_f32(setup, greedy):  # noqa: F811
    key = jax.random.key(3)
    a = _run_rollout(setup, precompute=False, key=key, greedy=greedy)
    b = _run_rollout(setup, precompute=True, key=key, greedy=greedy)
    np.testing.assert_array_equal(np.asarray(a["actions_seq"]), np.asarray(b["actions_seq"]))
    np.testing.assert_array_equal(np.asarray(a["selected_mask"]), np.asarray(b["selected_mask"]))
    np.testing.assert_allclose(np.asarray(a["log_pf"]), np.asarray(b["log_pf"]), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(a["state_emb_seq"]), np.asarray(b["state_emb_seq"]), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(a["bc_loss_per_graph"]), np.asarray(b["bc_loss_per_graph"]), rtol=2e-4, atol=2e-4
    )


def test_policy_step_output_parity(setup):  # noqa: F811
    """precompute_steps + apply_precomputed == __call__ per step (no dropout)."""
    _, batch, bundle = setup
    cfg = _cfg()
    modules = build_modules(cfg)
    params = init_gflownet_params(cfg, modules, bundle, batch, seed=0)
    pparams = _jitter(params["policy"])
    embed = embed_agent_batch(bundle, batch, edge_score_proj=params["edge_score_proj"])
    policy: GFlowNetEdgePolicy = modules.policy
    gb = batch.graph
    T = 3
    edge_tokens = embed.edge_tokens.astype(jnp.float32)
    st = policy.apply(pparams, edge_tokens, T, method=GFlowNetEdgePolicy.precompute_steps)
    rngs = np.random.default_rng(0)
    state_tokens = jnp.asarray(rngs.normal(size=(gb.num_graphs, EMB)), jnp.float32)
    valid = gb.edge_mask & (jnp.arange(gb.num_edges) % 3 != 0)
    ref = policy.apply(pparams, edge_tokens, state_tokens, gb.edge_batch, valid)
    for t in range(T):
        st_t = jax.tree.map(lambda x: x[t], st)
        got = policy.apply(
            pparams, st_t, state_tokens, gb.edge_batch, valid,
            method=GFlowNetEdgePolicy.apply_precomputed,
        )
        for r, g_ in zip(ref, got):
            np.testing.assert_allclose(np.asarray(r), np.asarray(g_), rtol=2e-4, atol=2e-4)


def test_precompute_dropout_masks_vary_per_step(setup):  # noqa: F811
    """Train-mode step tensors must carry INDEPENDENT per-step dropout (the
    canonical path resamples per step; a single shared mask would change
    regularization semantics)."""
    _, batch, bundle = setup
    cfg = dataclasses.replace(_cfg(), dropout=0.5)
    modules = build_modules(cfg)
    params = init_gflownet_params(cfg, modules, bundle, batch, seed=0)
    embed = embed_agent_batch(bundle, batch, edge_score_proj=params["edge_score_proj"])
    policy: GFlowNetEdgePolicy = modules.policy
    st = policy.apply(
        params["policy"], embed.edge_tokens.astype(jnp.float32), 3,
        train=True, rngs={"dropout": jax.random.key(1)},
        method=GFlowNetEdgePolicy.precompute_steps,
    )
    d = np.asarray(st.drop2)
    assert not np.array_equal(d[0], d[1]) and not np.array_equal(d[1], d[2])
    k = np.asarray(st.k)
    assert not np.array_equal(k[0], k[1])  # edge dropout also per step


def test_rollout_train_dropout_finite(setup):  # noqa: F811
    ro = _run_rollout(
        setup, precompute=True, key=jax.random.key(9), train=True, dropout=0.3,
    )
    assert np.isfinite(np.asarray(ro["log_pf"])).all()
    assert np.isfinite(np.asarray(ro["bc_loss_per_graph"])).all()


def test_rollout_bf16_precompute_close_to_f32(setup):  # noqa: F811
    """bf16 compute keeps the same discrete behaviour on this tiny problem
    and finite log-probs (hw-numerics lane covers tolerance on the chip)."""
    ro = _run_rollout(
        setup, precompute=True, key=jax.random.key(5), compute_dtype="bfloat16",
    )
    assert np.isfinite(np.asarray(ro["log_pf"])).all()
