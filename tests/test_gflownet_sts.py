"""Sample-then-score rollout == canonical precomputed-policy rollout.

The two-pass restructure (VERDICT r3 #5) samples actions in a forward-only
scan (Gumbel/greedy argmax on temperature-scaled logits -- invariant to the
per-graph joint normalizer) and recomputes all per-step log-probs / BC stats /
state embeddings in one batched differentiable pass.  These tests pin:
exactly-equal actions on shared keys, tight-tolerance log-probs and state
embeddings, forced-replay parity (where the scan never touches the policy),
and gradient parity of a full loss through both paths.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evi_rag_tpu.models.gflownet.actor import rollout
from evi_rag_tpu.models.gflownet.embedder import embed_agent_batch
from evi_rag_tpu.train.gflownet_trainer import build_modules, init_gflownet_params

from tests.test_gflownet_precompute import _jitter
from tests.test_gflownet_train import _cfg, setup  # noqa: F401  (fixture)


def _prep(setup_data, *, dropout=0.0, compute_dtype="float32"):
    _, batch, bundle = setup_data
    cfg = dataclasses.replace(_cfg(), dropout=dropout, compute_dtype=compute_dtype)
    modules = build_modules(cfg)
    params = init_gflownet_params(cfg, modules, bundle, batch, seed=0)
    params = {k: (_jitter(v) if k != "edge_score_proj" else v) for k, v in params.items()}
    embed = embed_agent_batch(bundle, batch, edge_score_proj=params["edge_score_proj"])
    dag = (batch.edge_labels > 0.5) & batch.graph.edge_mask
    return cfg, modules, params, batch, embed, dag


def _roll(cfg, modules, params, batch, embed, dag, *, sts, key, greedy=False,
          train=False, forced=None):
    actor_cfg = dataclasses.replace(cfg.actor, sample_then_score=sts)
    return jax.jit(
        lambda k: rollout(
            policy=modules.policy, state_encoder=modules.state_encoder,
            policy_params=params["policy"], encoder_params=params["state_encoder"],
            batch=batch, embed=embed, rng=k, config=actor_cfg,
            dag_edge_mask=dag, train=train, greedy=greedy, forced_actions=forced,
        )
    )(key)


@pytest.mark.parametrize("greedy", [False, True])
def test_sts_matches_canonical(setup, greedy):  # noqa: F811
    prep = _prep(setup)
    key = jax.random.key(3)
    a = _roll(*prep, sts=False, key=key, greedy=greedy)
    b = _roll(*prep, sts=True, key=key, greedy=greedy)
    np.testing.assert_array_equal(np.asarray(a["actions_seq"]), np.asarray(b["actions_seq"]))
    np.testing.assert_array_equal(np.asarray(a["selected_mask"]), np.asarray(b["selected_mask"]))
    np.testing.assert_array_equal(np.asarray(a["directions_seq"]), np.asarray(b["directions_seq"]))
    for k in ("log_pf", "log_pf_steps", "state_emb_seq", "bc_loss_per_graph",
              "bc_steps_per_graph", "length", "reach_success"):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=2e-4, atol=2e-4, err_msg=k
        )


def test_sts_forced_replay_matches(setup):  # noqa: F811
    """Forced replay: the STS scan skips the policy entirely, yet log-probs of
    the forced trajectory must match the canonical forced path."""
    prep = _prep(setup)
    key = jax.random.key(11)
    free = _roll(*prep, sts=False, key=key)
    forced = free["actions_seq"]
    a = _roll(*prep, sts=False, key=jax.random.key(12), forced=forced)
    b = _roll(*prep, sts=True, key=jax.random.key(12), forced=forced)
    np.testing.assert_array_equal(np.asarray(a["actions_seq"]), np.asarray(b["actions_seq"]))
    np.testing.assert_allclose(
        np.asarray(a["log_pf_steps"]), np.asarray(b["log_pf_steps"]), rtol=2e-4, atol=2e-4
    )
    # Replaying the free-run actions reproduces the free-run log-probs.
    np.testing.assert_allclose(
        np.asarray(free["log_pf"]), np.asarray(b["log_pf"]), rtol=2e-4, atol=2e-4
    )


def test_sts_gradient_parity(setup):  # noqa: F811
    """Gradients of a full rollout-consuming loss agree between paths: the
    sampling scan must contribute nothing, and the batched score pass must
    carry exactly the canonical path's parameter dependencies (policy,
    encoder incl. step embeddings, edge tokens via the action-history mean)."""
    cfg, modules, params, batch, embed, dag = _prep(setup)
    key = jax.random.key(7)

    def loss_fn(p, sts):
        actor_cfg = dataclasses.replace(cfg.actor, sample_then_score=sts)
        ro = rollout(
            policy=modules.policy, state_encoder=modules.state_encoder,
            policy_params=p["policy"], encoder_params=p["state_encoder"],
            batch=batch, embed=embed, rng=key, config=actor_cfg,
            dag_edge_mask=dag,
        )
        return (
            jnp.sum(ro["log_pf_steps"] ** 2)
            + jnp.sum(ro["state_emb_seq"] ** 2)
            + jnp.sum(ro["bc_loss_per_graph"])
        )

    trainable = {k: params[k] for k in ("policy", "state_encoder")}

    def run(sts):
        return jax.grad(lambda p: loss_fn({**params, **p}, sts))(trainable)

    ga, gb = run(False), run(True)
    flat_a, _ = jax.tree.flatten(ga)
    flat_b, _ = jax.tree.flatten(gb)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat_a), "degenerate test: zero grads"
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(xb), rtol=5e-3, atol=5e-4
        )


def test_sts_train_dropout_parity(setup):  # noqa: F811
    """Train mode: both passes share one PolicyStepTensors dropout stream, so
    the STS path reproduces the canonical precomputed path bit-for-stream."""
    prep = _prep(setup, dropout=0.3)
    key = jax.random.key(9)
    a = _roll(*prep, sts=False, key=key, train=True)
    b = _roll(*prep, sts=True, key=key, train=True)
    np.testing.assert_array_equal(np.asarray(a["actions_seq"]), np.asarray(b["actions_seq"]))
    np.testing.assert_allclose(
        np.asarray(a["log_pf_steps"]), np.asarray(b["log_pf_steps"]), rtol=2e-4, atol=2e-4
    )
    assert np.isfinite(np.asarray(b["bc_loss_per_graph"])).all()


def test_sts_bf16_finite(setup):  # noqa: F811
    prep = _prep(setup, compute_dtype="bfloat16")
    ro = _roll(*prep, sts=True, key=jax.random.key(5))
    assert np.isfinite(np.asarray(ro["log_pf"])).all()


def test_sts_train_step_end_to_end(setup):  # noqa: F811
    """A full jitted train step (4 rollouts + SubTB + BC) runs and produces
    finite loss/grads with sample_then_score on, and its loss matches the
    canonical path step-for-step on the same rng."""
    import dataclasses as dc

    from evi_rag_tpu.train.gflownet_trainer import (
        make_gfn_train_step,
    )
    from evi_rag_tpu.train.optim import setup_optimizer
    from evi_rag_tpu.train.retriever_trainer import TrainState

    _, batch, bundle = setup
    losses = {}
    for sts in (False, True):
        cfg = dc.replace(_cfg(), sample_then_score=sts, bc_weight=0.3)
        modules = build_modules(cfg)
        params = init_gflownet_params(cfg, modules, bundle, batch, seed=0)
        tx = setup_optimizer(cfg.optimizer, params)
        state = TrainState(
            params=params, opt_state=jax.jit(tx.init)(params),
            step=jnp.zeros((), jnp.int32), rng=jax.random.key(2),
        )
        step = make_gfn_train_step(modules, tx, cfg, bundle)
        out = None
        for _ in range(2):
            state, out = step(state, batch)
        losses[sts] = float(out["loss"])
        assert np.isfinite(losses[sts])
    np.testing.assert_allclose(losses[False], losses[True], rtol=1e-3, atol=1e-4)


import pytest


@pytest.mark.parametrize("remat_mode", [True, "dots"])
def test_sts_remat_parity(setup, remat_mode):  # noqa: F811
    """``remat_policy`` under STS wraps the whole batched score pass in one
    ``jax.checkpoint``: the forward pass must be IDENTICAL (the recomputed
    ``precompute_steps`` uses the same rng key, and checkpoint does not
    change forward math), and gradients must match the non-remat STS path --
    the backward pass recomputes the [T, E, H] tensors instead of reloading
    them, which is a scheduling change only."""
    cfg, modules, params, batch, embed, dag = _prep(setup, dropout=0.3)
    key = jax.random.key(21)

    def run(remat, train):
        actor_cfg = dataclasses.replace(
            cfg.actor, sample_then_score=True, remat_policy=remat
        )
        return jax.jit(
            lambda k: rollout(
                policy=modules.policy, state_encoder=modules.state_encoder,
                policy_params=params["policy"], encoder_params=params["state_encoder"],
                batch=batch, embed=embed, rng=k, config=actor_cfg,
                dag_edge_mask=dag, train=train,
            )
        )(key)

    for train in (False, True):
        a, b = run(False, train), run(remat_mode, train)
        np.testing.assert_array_equal(
            np.asarray(a["actions_seq"]), np.asarray(b["actions_seq"])
        )
        for k in ("log_pf_steps", "state_emb_seq", "bc_loss_per_graph"):
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=1e-5, atol=1e-6, err_msg=k
            )

    def grads(remat):
        actor_cfg = dataclasses.replace(
            cfg.actor, sample_then_score=True, remat_policy=remat
        )

        def loss_fn(p):
            ro = rollout(
                policy=modules.policy, state_encoder=modules.state_encoder,
                policy_params=p["policy"], encoder_params=p["state_encoder"],
                batch=batch, embed=embed, rng=key, config=actor_cfg,
                dag_edge_mask=dag, train=True,
            )
            return (
                jnp.sum(ro["log_pf_steps"] ** 2)
                + jnp.sum(ro["state_emb_seq"] ** 2)
                + jnp.sum(ro["bc_loss_per_graph"])
            )

        trainable = {k: params[k] for k in ("policy", "state_encoder")}
        return jax.grad(lambda p: loss_fn({**params, **p}))(trainable)

    ga, gb = grads(False), grads(remat_mode)
    flat_a, _ = jax.tree.flatten(ga)
    flat_b, _ = jax.tree.flatten(gb)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat_a), "degenerate test: zero grads"
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), rtol=1e-4, atol=1e-6)
