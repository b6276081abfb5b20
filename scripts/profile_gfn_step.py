"""Profile the GFlowNet train step on the real chip (VERDICT r3 #5 prelude).

Two outputs:
1. A section-timing breakdown -- each phase of the step jitted and timed in
   isolation (frozen embed, rollout forward, full loss forward, fwd+bwd,
   optimizer apply) so the wall-clock split is measured, not guessed.
2. Optionally (``--trace DIR``) a ``jax.profiler`` trace of the full step for
   op-level attribution in XProf/TensorBoard.

The batch construction matches ``bench.bench_gflownet_step`` exactly (16
graphs, D=1024, edge_top_k=200) so numbers line up with
``bench_details.json``'s ``gflownet_step_graphs_per_sec*`` keys.

Usage: python scripts/profile_gfn_step.py [--trace /tmp/gfn_trace] [--iters 5]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _build(num_graphs: int = 16, dropout: float = 0.1, remat: bool = False):
    """Mirror bench.py's exact GFN setup (same shapes/seeds at the default
    width, so numbers line up with bench_details.json).  ``num_graphs``
    widens the batch for the TPU-occupancy sweep: at G=16 the step is
    launch-latency bound, not compute bound."""
    from evi_rag_tpu.data.feeder import collate_agent, fixed_agent_bucket
    from evi_rag_tpu.data.g_agent import AgentSettings, build_agent_sample
    from evi_rag_tpu.data.synthetic import make_synthetic_dataset
    from evi_rag_tpu.models.batches import RetrieverBatch
    from evi_rag_tpu.models.retriever import Retriever
    from evi_rag_tpu.train.checkpoint import export_retriever_features
    from evi_rag_tpu.train.gflownet_trainer import (
        GFlowNetConfig,
        build_modules,
        init_gflownet_params,
        make_gfn_train_step,
    )
    from evi_rag_tpu.train.optim import OptimizerConfig, setup_optimizer
    from evi_rag_tpu.train.retriever_trainer import TrainState

    emb = 1024
    ds = make_synthetic_dataset(num_samples=num_graphs, emb_dim=emb, max_nodes=48, seed=5)
    rng = np.random.default_rng(0)
    agents = []
    for s in ds.samples:
        a = build_agent_sample(
            sample_id=s.sample_id, question_id=s.question_id,
            heads=s.edge_index[0], tails=s.edge_index[1], relations=s.edge_relations,
            labels=s.edge_labels.astype(np.float32),
            scores=rng.normal(size=s.edge_index.shape[1]).astype(np.float32) + 2 * s.edge_labels,
            node_entity_ids=np.arange(1000, 1000 + s.num_nodes),
            node_embedding_ids=s.node_embedding_ids,
            start_entity_ids=1000 + s.topic_locals, answer_entity_ids=1000 + s.answer_locals,
            settings=AgentSettings(edge_top_k=200, score_mode="logits"),
        )
        if a is not None:
            agents.append(a)
    agents = agents[:num_graphs]
    bucket = fixed_agent_bucket(agents, num_graphs)
    batch = collate_agent(
        agents, entity_emb=ds.entity_emb, relation_emb=ds.relation_emb,
        question_emb=ds.question_emb, bucket=bucket,
    )
    retr = Retriever(emb_dim=emb, hidden_dim=emb, dropout_p=0.0)
    rb = RetrieverBatch(
        graph=batch.graph, node_emb=batch.node_emb, node_is_nontext=batch.node_is_nontext,
        edge_emb=batch.edge_emb, question_emb=batch.question_emb,
        topic_one_hot=jnp.stack(
            [batch.node_is_start.astype(jnp.float32), 1 - batch.node_is_start.astype(jnp.float32)], -1
        ),
        edge_labels=batch.edge_labels, node_is_q=batch.node_is_start, node_is_a=batch.node_is_answer,
    )
    rp = jax.jit(retr.init)(jax.random.key(0), rb)
    bundle = export_retriever_features(rp["params"], retr.parity_meta())
    cfg = GFlowNetConfig(
        hidden_dim=emb, max_steps=3, num_train_rollouts=4, bc_weight=0.5,
        total_steps=100, dropout=dropout, remat_policy=remat, optimizer=OptimizerConfig(name="adamw", learning_rate=1e-4),
    )
    mods = build_modules(cfg)
    params = init_gflownet_params(cfg, mods, bundle, batch, seed=0)
    tx = setup_optimizer(cfg.optimizer, params)
    state = TrainState(
        params=params, opt_state=jax.jit(tx.init)(params),
        step=jnp.zeros((), jnp.int32), rng=jax.random.key(1),
    )
    step = make_gfn_train_step(mods, tx, cfg, bundle)
    return cfg, mods, bundle, batch, params, tx, state, step


def _timeit(fn, *args, iters=5, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, help="jax.profiler trace output dir")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--graphs", type=int, default=16)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}")
    cfg, mods, bundle, batch, params, tx, state, step = _build(args.graphs, args.dropout, args.remat)

    from evi_rag_tpu.models.gflownet.actor import rollout
    from evi_rag_tpu.models.gflownet.embedder import (
        apply_score_bonus,
        embed_agent_batch_frozen,
    )
    from evi_rag_tpu.train.gflownet_trainer import _rollout_losses

    g = int(batch.graph.num_graphs)
    e = int(batch.graph.num_edges)
    n = int(batch.graph.num_nodes)
    print(f"batch: G={g} N={n} E={e} H={cfg.hidden_dim} R={cfg.num_train_rollouts} T={cfg.max_steps + 1}")

    # --- sections ---
    embed_fn = jax.jit(functools.partial(embed_agent_batch_frozen, bundle))
    fe = embed_fn(batch)
    ms_embed = _timeit(embed_fn, batch, iters=args.iters)

    def fwd_rollouts(params, batch, fe, key):
        rngs = jax.random.split(key, cfg.num_train_rollouts)
        loss, _ = _rollout_losses(
            params, mods, bundle, batch, rngs, cfg,
            bc_weight=jnp.asarray(0.5), temperature=cfg.policy_temperature,
            train=True, frozen_embed=fe,
        )
        return loss

    key = jax.random.key(3)
    fwd_j = jax.jit(fwd_rollouts)
    ms_fwd = _timeit(fwd_j, params, batch, fe, key, iters=args.iters)

    grad_j = jax.jit(jax.grad(fwd_rollouts))
    ms_fwdbwd = _timeit(grad_j, params, batch, fe, key, iters=args.iters)

    grads = grad_j(params, batch, fe, key)

    def opt_apply(grads, opt_state, params):
        updates, opt_state = tx.update(grads, opt_state, params)
        return jax.tree.map(lambda p, u: p + u, params, updates), opt_state

    opt_j = jax.jit(opt_apply)
    ms_opt = _timeit(opt_j, grads, state.opt_state, params, iters=args.iters)

    # One actor rollout forward only (no reward/subtb/estimator), isolating
    # the scan itself.
    embed_full = jax.jit(
        lambda fe, batch, p: apply_score_bonus(fe, batch, p)
    )(fe, batch, params["edge_score_proj"])

    def one_rollout(params, key):
        return rollout(
            policy=mods.policy, state_encoder=mods.state_encoder,
            policy_params=params["policy"], encoder_params=params["state_encoder"],
            batch=batch, embed=embed_full, rng=key, config=cfg.actor, train=True,
        )["log_pf"]

    ro_j = jax.jit(one_rollout)
    ms_one_rollout = _timeit(ro_j, params, key, iters=args.iters)

    ms_full = _timeit(lambda s, b: step(s, b, fe)[1]["loss"], state, batch, iters=args.iters)
    ms_full_nocache = _timeit(lambda s, b: step(s, b)[1]["loss"], state, batch, iters=args.iters)

    # Sample-then-score variants (forward-only sampling scan + one batched
    # differentiable score pass; gflownet.sample_then_score).
    from evi_rag_tpu.train.gflownet_trainer import make_gfn_train_step

    sts_ms = {}
    for label, over in (
        ("sts", dict(sample_then_score=True)),
        ("sts_bf16", dict(sample_then_score=True, compute_dtype="bfloat16")),
        ("sts_remat", dict(sample_then_score=True, remat_policy=True)),
        ("sts_remat_bf16", dict(
            sample_then_score=True, remat_policy=True, compute_dtype="bfloat16"
        )),
    ):
        cfg_v = dataclasses.replace(cfg, **over)
        from evi_rag_tpu.train.gflownet_trainer import build_modules, init_gflownet_params
        from evi_rag_tpu.train.optim import setup_optimizer
        from evi_rag_tpu.train.retriever_trainer import TrainState

        mods_v = build_modules(cfg_v)
        params_v = init_gflownet_params(cfg_v, mods_v, bundle, batch, seed=0)
        tx_v = setup_optimizer(cfg_v.optimizer, params_v)
        st_v = TrainState(
            params=params_v, opt_state=jax.jit(tx_v.init)(params_v),
            step=jnp.zeros((), jnp.int32), rng=jax.random.key(1),
        )
        step_v = make_gfn_train_step(mods_v, tx_v, cfg_v, bundle)
        sts_ms[label] = _timeit(
            lambda s, b: step_v(s, b, fe)[1]["loss"], st_v, batch, iters=args.iters
        )

    print(f"frozen embed            : {ms_embed:8.3f} ms")
    print(f"1 rollout fwd (scan)    : {ms_one_rollout:8.3f} ms")
    print(f"{cfg.num_train_rollouts} rollouts + loss fwd  : {ms_fwd:8.3f} ms")
    print(f"fwd+bwd (grad)          : {ms_fwdbwd:8.3f} ms")
    print(f"optimizer apply         : {ms_opt:8.3f} ms")
    print(f"FULL step (cached embed): {ms_full:8.3f} ms  -> {g / ms_full * 1e3:7.1f} graphs/s")
    print(f"FULL step (embed inline): {ms_full_nocache:8.3f} ms  -> {g / ms_full_nocache * 1e3:7.1f} graphs/s")
    for label, ms in sts_ms.items():
        print(f"FULL step ({label:11s}): {ms:8.3f} ms  -> {g / ms * 1e3:7.1f} graphs/s")
    print(f"  bwd-only estimate     : {ms_fwdbwd - ms_fwd:8.3f} ms")
    print(f"  non-loss overhead     : {ms_full - ms_fwdbwd - ms_opt:8.3f} ms (rng/bookkeeping/fusion diff)")

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(3):
                state, m = step(state, batch, fe)
            jax.block_until_ready(m["loss"])
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
