"""GFlowNet training/eval loop (the reference ``GFlowNetModule``,
``src/models/gflownet_module.py:30-1044``, as jitted pure steps).

One training step (mirrors ``_compute_batch_loss``, ``:388-635``):
frozen-retriever embed -> N sampled rollouts (vmapped over rollout keys, not
Python-looped) -> terminal reward -> estimator flow states with terminal
logR -> closed-form SubTB + scheduled DAG behaviour-cloning.  Dummy graphs
(answer absent) are masked out of the loss exactly as the reference does
(log_reward zeroed for the loss, graphs excluded from the mean, ``:520-550``).

Eval: best-of-k rollouts -> ``answer_hit@{k}`` prefix metrics (``:623-634``).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp

from evi_rag_tpu.models.batches import (
    AgentBatch,
    EmbedTables,
    materialize_agent_batch,
)
from evi_rag_tpu.models.gflownet.actor import ActorConfig, rollout
from evi_rag_tpu.models.gflownet.embedder import (
    embed_agent_batch,
    init_edge_score_proj,
)
from evi_rag_tpu.models.gflownet.policy import GFlowNetEdgePolicy
from evi_rag_tpu.models.gflownet.reward import RewardConfig, compute_reward
from evi_rag_tpu.models.gflownet.state_encoder import GFlowNetEstimator, StateEncoder
from evi_rag_tpu.models.gflownet.subtb import (
    bc_weight_schedule,
    log_flow_with_terminal_reward,
    subtb_loss,
)
from evi_rag_tpu.train.optim import OptimizerConfig, setup_optimizer
from evi_rag_tpu.train.retriever_trainer import TrainState

log = logging.getLogger(__name__)

POS_LABEL_THRESHOLD = 0.5


@dataclasses.dataclass(frozen=True)
class GFlowNetConfig:
    hidden_dim: int = 1024
    max_steps: int = 3
    stop_on_answer: bool = True
    policy_temperature: float = 1.0
    eval_temperature: float = 1.0
    num_train_rollouts: int = 4
    reward: RewardConfig = RewardConfig()
    use_state_dde: bool = False
    bc_weight: float = 0.0
    bc_weight_floor: float = 0.0
    bc_hold_ratio: float = 0.0
    bc_decay_ratio: float = 0.0
    total_steps: int = 10_000
    eval_rollout_prefixes: tuple[int, ...] = (1, 10, 25, 50, 100)
    optimizer: OptimizerConfig = OptimizerConfig(name="adamw", learning_rate=1e-4)
    max_epochs: int = 10
    monitor: str = "answer_hit"
    patience: int = 5
    dropout: float = 0.1
    # Cache the frozen retriever embeddings per train batch across epochs
    # (the heavy parameter-free part of every step; measured 837.5 -> 979.5
    # graphs/s on a v5e chip). OPT-IN: caching fixes batch MEMBERSHIP across
    # epochs (only inter-epoch order reshuffles), diverging from the
    # reference's per-epoch reshuffled DataLoader composition
    # (gflownet_datamodule shuffle=True) -- the default keeps reference
    # training semantics (ADVICE r3). Costs device memory proportional to
    # the epoch's batch count when enabled.
    cache_frozen_embed: bool = False
    # Mixed precision for the policy's per-edge network (reference trains
    # 16-mixed, configs/trainer/gpu.yaml); log-probs/SubTB/reward stay f32.
    compute_dtype: str = "float32"  # float32 | bfloat16
    # Hoist per-step edge-axis policy matmuls out of the rollout scan (see
    # ActorConfig.precompute_policy).
    precompute_policy: bool = True
    # Recompute (don't store) the hoisted step tensors in the backward pass
    # (see ActorConfig.remat_policy; ``"dots"`` = save matmul results,
    # recompute only elementwise chains).
    remat_policy: bool | str = False
    # Two-pass rollout: forward-only sampling scan + one batched
    # differentiable score pass over the step axis (see
    # ActorConfig.sample_then_score).
    sample_then_score: bool = False

    @property
    def actor(self) -> ActorConfig:
        return ActorConfig(
            max_steps=self.max_steps,
            policy_temperature=self.policy_temperature,
            stop_on_answer=self.stop_on_answer,
            precompute_policy=self.precompute_policy,
            remat_policy=self.remat_policy,
            sample_then_score=self.sample_then_score,
        )


@dataclasses.dataclass
class GFlowNetModules:
    policy: GFlowNetEdgePolicy
    state_encoder: StateEncoder
    estimator: GFlowNetEstimator


def build_modules(cfg: GFlowNetConfig) -> GFlowNetModules:
    return GFlowNetModules(
        policy=GFlowNetEdgePolicy(
            hidden_dim=cfg.hidden_dim, dropout=cfg.dropout,
            compute_dtype=cfg.compute_dtype,
        ),
        state_encoder=StateEncoder(
            hidden_dim=cfg.hidden_dim,
            max_steps=cfg.max_steps,
            use_state_dde=cfg.use_state_dde,
        ),
        estimator=GFlowNetEstimator(hidden_dim=cfg.hidden_dim),
    )


def init_gflownet_params(
    cfg: GFlowNetConfig,
    modules: GFlowNetModules,
    bundle: dict[str, Any],
    example_batch: AgentBatch,
    *,
    seed: int = 0,
    tables: EmbedTables | None = None,
) -> dict[str, Any]:
    """Init trainable params: policy / state encoder / estimator /
    edge_score_proj (the frozen retriever bundle is NOT trainable)."""
    k0, k1, k2 = jax.random.split(jax.random.key(seed), 3)
    h = cfg.hidden_dim

    def _se_init(module: StateEncoder, batch, node_tokens, question_tokens):
        # Touch ALL submodules (precompute + encode_state) so every parameter
        # collection exists before rollout-time apply.
        cache = module.precompute(batch, node_tokens=node_tokens, question_tokens=question_tokens)
        from evi_rag_tpu.models.gflownet.env import env_reset

        state0 = env_reset(batch, max_steps=cfg.max_steps, hidden_dim=h)
        return module.encode_state(cache, state0, batch)

    def _init(tbl):
        ex = materialize_agent_batch(example_batch, tbl)
        embed = embed_agent_batch(
            bundle, ex, edge_score_proj=init_edge_score_proj(h)
        )
        se_params = modules.state_encoder.init(
            k0,
            ex,
            embed.node_tokens,
            embed.question_tokens,
            method=_se_init,
        )
        pol_params = modules.policy.init(
            k1,
            embed.edge_tokens,
            jnp.zeros((ex.graph.num_graphs, h)),
            ex.graph.edge_batch,
            ex.graph.edge_mask,
        )
        est_params = modules.estimator.init(
            k2,
            jnp.zeros((example_batch.graph.num_graphs, h)),
            embed.question_tokens,
        )
        return {
            "policy": pol_params,
            "state_encoder": se_params,
            "estimator": est_params,
            "edge_score_proj": init_edge_score_proj(h),
        }

    # Tables as jit arguments, never closures (closure constants are
    # serialized into remote-compile payloads; HTTP 413 at vocab scale).
    return jax.jit(_init)(tables)


def _rollout_losses(
    params: dict[str, Any],
    modules: GFlowNetModules,
    bundle: dict[str, Any],
    batch: AgentBatch,
    rngs: jax.Array,           # [R] rollout keys
    cfg: GFlowNetConfig,
    *,
    bc_weight: jax.Array,
    temperature: float,
    greedy: bool = False,
    train: bool = False,
    frozen_embed=None,
    collect_rollouts: bool = False,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Mean SubTB (+BC) loss over R rollouts; per-rollout metrics stacked.

    ``collect_rollouts`` additionally returns the raw per-rollout trajectories
    (``rollout_actions``/``rollout_directions`` [R, G, T] and unmasked
    ``rollout_hits`` [R, G]) so artifact writers can record the SAME sampled
    rollouts the metrics scored — one jitted pass instead of a second
    un-jitted rollout sweep (which at WebQSP scale was tunnel-dispatch bound
    and accumulated per-shape programs until OOM)."""
    from evi_rag_tpu.models.gflownet.embedder import (
        apply_score_bonus,
        embed_agent_batch_frozen,
    )

    gb = batch.graph
    base = frozen_embed if frozen_embed is not None else embed_agent_batch_frozen(bundle, batch)
    embed = apply_score_bonus(base, batch, params["edge_score_proj"])
    need_bc = train and cfg.bc_weight > 0.0
    dag_mask = (batch.edge_labels > POS_LABEL_THRESHOLD) & gb.edge_mask if need_bc else None
    actor_cfg = dataclasses.replace(cfg.actor, policy_temperature=temperature)
    not_dummy = (~batch.is_dummy) & gb.graph_mask

    def one_rollout(key):
        ro = rollout(
            policy=modules.policy,
            state_encoder=modules.state_encoder,
            policy_params=params["policy"],
            encoder_params=params["state_encoder"],
            batch=batch,
            embed=embed,
            rng=key,
            config=actor_cfg,
            greedy=greedy,
            dag_edge_mask=dag_mask,
            train=train,
        )
        rw = compute_reward(
            batch,
            selected_mask=ro["selected_mask"],
            answer_hit=ro["answer_hits"],
            start_node_hit=ro["start_node_hit"],
            answer_node_hit=ro["answer_node_hit"],
            config=cfg.reward,
        )
        # Dummy/padding graphs carry -inf logR; zero it for the loss and
        # exclude those graphs from the SubTB mean (reference :520-550).
        log_r = jnp.where(not_dummy, rw.log_reward, 0.0)
        log_flow_pred = modules.estimator.apply(
            params["estimator"], ro["state_emb_seq"], embed.question_tokens
        )  # [G, T]
        flows = log_flow_with_terminal_reward(log_flow_pred, log_r, ro["length"].astype(jnp.int32))
        l_subtb = subtb_loss(flows, ro["log_pf_steps"], ro["length"].astype(jnp.int32), graph_mask=not_dummy)
        if need_bc:
            bc = jnp.sum(ro["bc_loss_per_graph"] * not_dummy) / jnp.maximum(
                jnp.sum(not_dummy.astype(jnp.float32)), 1.0
            )
        else:
            bc = jnp.zeros(())
        loss = l_subtb + bc_weight * bc
        nd = jnp.maximum(jnp.sum(not_dummy.astype(jnp.float32)), 1.0)
        metrics = {
            "subtb_loss": l_subtb,
            "bc_loss": bc,
            "answer_hit_graphs": jnp.where(not_dummy, rw.success, 0.0),
            "answer_hit": jnp.sum(jnp.where(not_dummy, rw.success, 0.0)) / nd,
            "log_reward": jnp.sum(jnp.where(not_dummy, jnp.where(not_dummy, rw.log_reward, 0.0), 0.0)) / nd,
            "length_mean": jnp.sum(jnp.where(not_dummy, rw.path_len, 0.0)) / nd,
            "semantic": jnp.sum(jnp.where(not_dummy, rw.semantic_score, 0.0)) / nd,
        }
        if collect_rollouts:
            metrics["rollout_actions"] = ro["actions_seq"].astype(jnp.int32)
            metrics["rollout_directions"] = ro["directions_seq"].astype(jnp.int32)
            metrics["rollout_hits"] = ro["answer_hits"]
        return loss, metrics

    losses, metrics = jax.vmap(one_rollout)(rngs)
    # Stacked per-rollout outputs pass through unmeaned.
    stacked = {"answer_hit_graphs", "rollout_actions", "rollout_directions", "rollout_hits"}
    mean_metrics = {k: jnp.mean(v, axis=0) for k, v in metrics.items() if k not in stacked}
    for k in stacked & metrics.keys():
        mean_metrics[k] = metrics[k]
    return jnp.mean(losses), mean_metrics


def make_gfn_train_step(
    modules: GFlowNetModules,
    tx: Any,
    cfg: GFlowNetConfig,
    bundle: dict[str, Any],
    tables: EmbedTables | None = None,
) -> Callable[[TrainState, AgentBatch], tuple[TrainState, dict[str, jax.Array]]]:
    """Jitted update.  Accepts a flat AgentBatch or a stacked ``[D, ...]``
    batch for data-parallel training over a mesh (same vmap-over-shards
    pattern as the retriever step)."""

    @functools.partial(jax.jit, static_argnames=())
    def _step(state: TrainState, batch: AgentBatch, tbl, frozen_embed=None):
        batch = materialize_agent_batch(batch, tbl)
        rng, sub = jax.random.split(state.rng)
        stacked = batch.question_emb.ndim == 3
        bc_w = bc_weight_schedule(
            state.step,
            bc_weight=cfg.bc_weight,
            bc_weight_floor=cfg.bc_weight_floor,
            hold_steps=int(round(cfg.total_steps * cfg.bc_hold_ratio)),
            decay_steps=int(round(cfg.total_steps * cfg.bc_decay_ratio)),
        )

        def shard_loss(params, shard_batch, shard_rng, shard_frozen=None):
            rngs = jax.random.split(shard_rng, cfg.num_train_rollouts)
            return _rollout_losses(
                params, modules, bundle, shard_batch, rngs, cfg,
                bc_weight=bc_w, temperature=cfg.policy_temperature, train=True,
                frozen_embed=shard_frozen,
            )

        if stacked:
            def loss_fn(params):
                d = batch.question_emb.shape[0]
                keys = jax.random.split(sub, d)
                if frozen_embed is not None:
                    losses, metrics = jax.vmap(shard_loss, in_axes=(None, 0, 0, 0))(
                        params, batch, keys, frozen_embed
                    )
                else:
                    losses, metrics = jax.vmap(shard_loss, in_axes=(None, 0, 0))(
                        params, batch, keys
                    )
                return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)
        else:
            def loss_fn(params):
                return shard_loss(params, batch, sub, frozen_embed)

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        out = {k: v for k, v in metrics.items() if k != "answer_hit_graphs"}
        out["loss"] = loss
        out["bc_weight"] = bc_w
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1, rng=rng), out

    def step(state: TrainState, batch: AgentBatch, frozen_embed=None):
        return _step(state, batch, tables, frozen_embed)

    return step


def make_gfn_eval_step(
    modules: GFlowNetModules,
    cfg: GFlowNetConfig,
    bundle: dict[str, Any],
    *,
    num_rollouts: int | None = None,
    tables: EmbedTables | None = None,
    collect_rollouts: bool = False,
) -> Callable[[dict, AgentBatch, jax.Array], dict[str, jax.Array]]:
    """Best-of-k eval: answer_hit@{k} prefixes over sampled rollouts.

    Two denominators are reported. ``answer_hit@k`` *excludes* dummy agents
    (answer absent from the subgraph) via ``graph_valid`` — a property of
    the policy, with coverage measured separately by
    ``answer/reachability@k``.  ``answer_hit_ref@k`` follows the reference
    protocol exactly (``gflownet_module.py:623-634``): dummies count as
    guaranteed misses, so numbers are directly comparable to the reference.
    """
    ks = tuple(cfg.eval_rollout_prefixes)
    r = num_rollouts if num_rollouts is not None else max(ks)

    @jax.jit
    def _step(params, batch: AgentBatch, tbl, rng):
        batch = materialize_agent_batch(batch, tbl)
        rngs = jax.random.split(rng, r)
        loss, metrics = _rollout_losses(
            params, modules, bundle, batch, rngs, cfg,
            bc_weight=jnp.zeros(()), temperature=cfg.eval_temperature,
            collect_rollouts=collect_rollouts,
        )
        hits = metrics.pop("answer_hit_graphs") > 0.5  # [R, G]
        not_dummy = (~batch.is_dummy) & batch.graph.graph_mask
        cum = jnp.cumsum(hits.astype(jnp.int32), axis=0) > 0
        out = dict(metrics)
        out["loss"] = loss
        for k in ks:
            kk = min(max(int(k), 1), r)
            hit_k = cum[kk - 1]
            out[f"answer_hit@{k}"] = hit_k.astype(jnp.float32)
            # Reference protocol: dummy graphs are guaranteed misses.
            out[f"answer_hit_ref@{k}"] = (hit_k & not_dummy).astype(jnp.float32)
        out["graph_valid"] = not_dummy
        out["graph_valid_ref"] = batch.graph.graph_mask
        return out

    def step(params, batch: AgentBatch, rng):
        return _step(params, batch, tables, rng)

    return step


def evaluate_gflownet(
    params: dict,
    eval_step: Callable,
    batches: Iterable[AgentBatch],
    *,
    rng: jax.Array,
    ks: tuple[int, ...],
) -> dict[str, float]:
    return evaluate_gflownet_results(
        eval_step(params, batch, jax.random.fold_in(rng, i))
        for i, batch in enumerate(batches)
    )


def evaluate_gflownet_results(results: Iterable[dict]) -> dict[str, float]:
    """Aggregate precomputed ``eval_step`` outputs (same one-pass contract as
    ``retriever_trainer.evaluate_results``: callers that also consume
    per-batch rollout trajectories run a single forward pass per split)."""
    from evi_rag_tpu.eval.metrics import MetricAccumulator

    acc = MetricAccumulator()
    for res in results:
        res = dict(res)
        for k in ("rollout_actions", "rollout_directions", "rollout_hits"):
            res.pop(k, None)
        valid = res.pop("graph_valid")
        valid_ref = res.pop("graph_valid_ref")
        per_graph = {k: v for k, v in res.items() if k.startswith("answer_hit@")}
        acc.update(per_graph, valid)
        per_graph_ref = {k: v for k, v in res.items() if k.startswith("answer_hit_ref@")}
        acc.update(per_graph_ref, valid_ref)
        scalars = {
            k: v
            for k, v in res.items()
            if not (k.startswith("answer_hit@") or k.startswith("answer_hit_ref@"))
        }
        for name, v in scalars.items():
            acc.update({name: jnp.asarray(v)}, jnp.ones((), bool))
    return acc.compute()


def fit_gflownet(
    cfg: GFlowNetConfig,
    bundle: dict[str, Any],
    train_batches: Callable[[int], Iterable[AgentBatch]],
    val_batches: Callable[[], Iterable[AgentBatch]],
    *,
    seed: int = 0,
    eval_rollouts: int = 4,
    tables: EmbedTables | None = None,
) -> tuple[dict, dict[str, Any]]:
    modules = build_modules(cfg)
    first = next(iter(train_batches(0)))
    params = init_gflownet_params(cfg, modules, bundle, first, seed=seed, tables=tables)
    tx = setup_optimizer(cfg.optimizer, params)
    opt_state = jax.jit(tx.init)(params)
    state = TrainState(
        params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32),
        rng=jax.random.key(seed + 1),
    )
    train_step = make_gfn_train_step(modules, tx, cfg, bundle, tables=tables)
    eval_step = make_gfn_eval_step(
        modules, cfg, bundle, num_rollouts=eval_rollouts, tables=tables
    )

    best_score = -float("inf")
    best_params = state.params
    bad = 0
    cached_batches = None
    history: list[dict] = []
    for epoch in range(cfg.max_epochs):
        t0 = time.time()
        last = {}
        from evi_rag_tpu.data.feeder import prefetch

        if cfg.cache_frozen_embed:
            # Fixed batch membership, shuffled order: the frozen retriever
            # embedding of each batch is computed once and reused every
            # epoch (it has no trainable inputs).
            if cached_batches is None:
                from evi_rag_tpu.models.gflownet.embedder import embed_agent_batch_frozen

                embed_fn_t = jax.jit(
                    lambda bb, tbl: embed_agent_batch_frozen(
                        bundle, materialize_agent_batch(bb, tbl)
                    )
                )
                embed_fn = lambda bb: embed_fn_t(bb, tables)  # noqa: E731
                cached_batches = []
                for b in train_batches(0):
                    fe = (
                        jax.vmap(lambda bb: embed_fn(bb))(b)
                        if b.question_emb.ndim == 3
                        else embed_fn(b)
                    )
                    cached_batches.append((b, fe))
            import numpy as _np

            # Fold the run seed: a bare epoch seed would give every run the
            # same inter-epoch batch order.
            order = _np.random.default_rng([seed, epoch]).permutation(len(cached_batches))
            for j in order:
                b, fe = cached_batches[j]
                state, last = train_step(state, b, fe)
        else:
            for batch in prefetch(iter(train_batches(epoch))):
                state, last = train_step(state, batch)
        val = evaluate_gflownet(
            state.params, eval_step, val_batches(), rng=jax.random.key(1000 + epoch),
            ks=cfg.eval_rollout_prefixes,
        )
        score = val.get(cfg.monitor, val.get("answer_hit", -float("inf")))
        history.append({
            "epoch": epoch, "val": val,
            "train_loss": float(last.get("loss", float("nan"))),
            "seconds": time.time() - t0,
        })
        log.info("gfn epoch %d monitor=%.4f", epoch, score)
        if score > best_score:
            best_score, best_params, bad = score, jax.tree.map(lambda x: x, state.params), 0
        else:
            bad += 1
            if bad > cfg.patience:
                break
    return best_params, {"history": history, "best_score": best_score, "final_state": state}
