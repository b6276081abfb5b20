"""Retriever training/eval loop (the reference's ``RetrieverModule`` +
Lightning Trainer, re-designed as jitted pure steps).

* ``make_train_step`` builds one jitted update: forward + InfoNCE + optax.
  Data parallelism is *stacked*: the feeder packs one padded sub-batch per
  mesh shard into a leading ``[D, ...]`` axis, the step ``vmap``s over it, and
  XLA partitions that axis over the ``data`` mesh axis -- gathers stay local
  to a shard (each sub-batch is self-contained), gradients psum over ICI.
  This replaces Lightning DDP + NCCL (``configs/trainer/ddp.yaml``,
  ``g_retrieval_datamodule.py:30-39``).
* ``make_eval_step`` computes the full per-graph metric suite on device.
* ``fit`` drives epochs with the reference's model-selection protocol:
  monitor ``val/answer/reachability@100`` (max), early stopping, best-state
  retention (``configs/experiment/train_retriever.yaml:27-35``).
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Any, Callable, Iterable

import jax
import jax.numpy as jnp

from evi_rag_tpu.eval.metrics import (
    MetricAccumulator,
    answer_reachability_at_k,
    bridge_positive_coverage,
    edge_recall_at_k,
    prob_quality,
    score_margin,
)
from evi_rag_tpu.models.batches import (
    EmbedTables,
    RetrieverBatch,
    materialize_retriever_batch,
)
from evi_rag_tpu.models.losses import RetrieverLossConfig, retriever_loss
from evi_rag_tpu.models.retriever import Retriever
from evi_rag_tpu.train.optim import OptimizerConfig, setup_optimizer

log = logging.getLogger(__name__)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class RetrieverTrainConfig:
    loss: RetrieverLossConfig = RetrieverLossConfig()
    optimizer: OptimizerConfig = OptimizerConfig(name="adamw", learning_rate=1e-4)
    max_epochs: int = 10
    monitor: str = "answer/reachability@100"
    monitor_mode: str = "max"
    patience: int = 5
    k_values: tuple[int, ...] = (1, 10, 25, 50, 100, 200, 300, 400, 500)
    # Rematerialize the forward pass in backward (jax.checkpoint): trades
    # ~1/3 more FLOPs for O(1) activation memory -- lets edge buckets grow
    # several x on a fixed HBM budget.
    remat: bool = False


def create_train_state(
    model: Retriever,
    example_batch: RetrieverBatch,
    cfg: RetrieverTrainConfig,
    *,
    seed: int = 0,
    tables: EmbedTables | None = None,
) -> tuple[TrainState, Any]:
    """Init params + optimizer. ``example_batch`` may be stacked or flat."""
    flat = example_batch
    if flat.question_emb.ndim == 3:  # stacked [D, G, dim]
        flat = jax.tree.map(lambda x: x[0], flat)
    # Tables ride as jit ARGUMENTS, never closures: a closed-over table is
    # serialized into the compile payload as a literal constant, which a
    # remote-compile tunnel rejects outright at production vocabulary sizes
    # (HTTP 413 on a 120k x 1024 entity table).
    params = jax.jit(
        lambda k, b, t: model.init(k, materialize_retriever_batch(b, t))
    )(jax.random.key(seed), flat, tables)
    tx = setup_optimizer(cfg.optimizer, params)
    opt_state = jax.jit(tx.init)(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32), rng=jax.random.key(seed + 1)), tx


def make_train_step(
    model: Retriever,
    tx: Any,
    cfg: RetrieverTrainConfig,
    tables: EmbedTables | None = None,
) -> Callable[[TrainState, RetrieverBatch], tuple[TrainState, dict[str, jax.Array]]]:
    """Jitted update over a stacked ``[D, ...]`` batch.  With ``tables``,
    id-feed batches materialize their embeddings on device at step entry
    (gather from the resident tables; ids-only host feeds)."""
    loss_cfg = cfg.loss

    def _forward(params, batch: RetrieverBatch, rng):
        rngs = {"dropout": rng, "hide_seek": jax.random.fold_in(rng, 1)}
        return model.apply(params, batch, train=True, rngs=rngs)

    forward = jax.checkpoint(_forward) if cfg.remat else _forward

    def shard_loss(params, batch: RetrieverBatch, rng):
        out = forward(params, batch, rng)
        lo = retriever_loss(
            out.logits,
            batch.edge_labels,
            batch.graph.edge_batch,
            num_graphs=batch.graph.num_graphs,
            graph_mask=batch.graph.graph_mask,
            edge_mask=batch.graph.edge_mask,
            config=loss_cfg,
            edge_is_near=batch.edge_is_near if loss_cfg.requires_edge_is_near else None,
        )
        return lo.loss, {**lo.components, **lo.metrics}

    def loss_fn(params, stacked: RetrieverBatch, rng):
        d = stacked.question_emb.shape[0]
        rngs = jax.random.split(rng, d)
        losses, metrics = jax.vmap(shard_loss, in_axes=(None, 0, 0))(params, stacked, rngs)
        return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)

    @jax.jit
    def _step(state: TrainState, stacked: RetrieverBatch, tbl):
        stacked = materialize_retriever_batch(stacked, tbl)
        rng, sub = jax.random.split(state.rng)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, stacked, sub
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1, rng=rng)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = jnp.sqrt(
            sum(jnp.sum(g * g) for g in jax.tree.leaves(grads))
        )
        return new_state, metrics

    # Tables as jit arguments (see create_train_state): the returned step
    # keeps the 2-arg signature callers expect.
    def step(state: TrainState, stacked: RetrieverBatch):
        return _step(state, stacked, tables)

    return step


def make_eval_step(
    model: Retriever, cfg: RetrieverTrainConfig,
    tables: EmbedTables | None = None,
) -> Callable[[Any, RetrieverBatch], dict[str, jax.Array]]:
    """Jitted per-batch metric computation (flat batch, one device/replicated).

    Mirrors ``RetrieverModule._shared_eval_step`` + the metric collection
    (reference ``retriever_module.py:99-176``).
    """
    ks = cfg.k_values

    @jax.jit
    def _step(params, batch: RetrieverBatch, tbl) -> dict[str, jax.Array]:
        batch = materialize_retriever_batch(batch, tbl)
        out = model.apply(params, batch)
        scores = out.logits
        labels = batch.edge_labels
        res: dict[str, jax.Array] = {}
        rec = edge_recall_at_k(scores, labels, batch, ks)
        res.update({f"edge/{k}": v for k, v in rec.items() if k != "graph_valid"})
        res["edge/graph_valid"] = rec["graph_valid"]
        bridge_sub = ~batch.edge_is_near
        brec = edge_recall_at_k(
            scores, labels, batch, ks, subset_mask=bridge_sub, require_positive=True
        )
        res.update({f"bridge/{k}": v for k, v in brec.items() if k != "graph_valid"})
        res["bridge/graph_valid"] = brec["graph_valid"]
        reach = answer_reachability_at_k(scores, batch, ks)
        res.update({f"answer/{k}": v for k, v in reach.items() if k != "graph_valid"})
        res["answer/graph_valid"] = reach["graph_valid"]
        sm = score_margin(scores, labels, batch)
        res["edge/score_margin"] = sm["margin"]
        # Margin is an extreme-value statistic (min pos - max neg,
        # reference ScoreMargin ``retriever_metrics.py:330-395``): one hard
        # negative drives it negative even for strong rankers.  The positive
        # rate -- fraction of graphs whose WORST positive outranks the BEST
        # negative -- is the bounded [0, 1] regression signal derived from
        # the same quantity (VERDICT r2 weak #4).
        res["edge/margin_positive_rate"] = (sm["margin"] > 0).astype(jnp.float32)
        res["edge/margin_valid"] = sm["graph_valid"]
        pq = prob_quality(scores, labels, batch, subset_mask=bridge_sub)
        res.update({f"bridge/{k}": v for k, v in pq.items() if k != "graph_valid"})
        res["bridge/quality_valid"] = pq["graph_valid"]
        res["coverage"] = bridge_positive_coverage(labels, batch)  # scalar sums
        # FeatureMonitor analog (reference src/metrics/feature_monitor.py):
        # mean sigmoid prob by label + edge-feature norm stability.
        emask = batch.graph.edge_mask
        probs = jax.nn.sigmoid(scores)
        pos = (labels > 0.5) & emask
        neg = (labels <= 0.5) & emask
        res["features/pos_prob_avg"] = jnp.sum(jnp.where(pos, probs, 0.0)) / jnp.maximum(jnp.sum(pos), 1)
        res["features/neg_prob_avg"] = jnp.sum(jnp.where(neg, probs, 0.0)) / jnp.maximum(jnp.sum(neg), 1)
        norms = jnp.linalg.norm(out.edge_embeddings, axis=-1)
        res["features/norm_avg"] = jnp.sum(jnp.where(emask, norms, 0.0)) / jnp.maximum(jnp.sum(emask), 1)
        res["logits"] = scores
        res["logits_fwd"] = out.logits_fwd
        res["logits_bwd"] = out.logits_bwd
        return res

    def step(params, batch: RetrieverBatch) -> dict[str, jax.Array]:
        return _step(params, batch, tables)

    return step


def evaluate(
    params: Any,
    eval_step: Callable,
    batches: Iterable[RetrieverBatch],
) -> dict[str, float]:
    """Aggregate the metric suite over an eval split."""
    return evaluate_results(eval_step(params, b) for b in batches)


def evaluate_results(results: Iterable[dict]) -> dict[str, float]:
    """Aggregate precomputed ``eval_step`` outputs.  Lets callers that also
    need per-batch outputs (artifact/ranking generation) run ONE forward pass
    per split instead of two."""
    acc = MetricAccumulator()
    cov = MetricAccumulator()
    feat = MetricAccumulator()
    for res in results:
        feat.update(
            {
                "features/pos_prob_avg": res["features/pos_prob_avg"],
                "features/neg_prob_avg": res["features/neg_prob_avg"],
                "features/norm_avg": res["features/norm_avg"],
            },
            jnp.ones((), bool),
        )
        groups = {
            "edge/graph_valid": [k for k in res if k.startswith("edge/recall")],
            "bridge/graph_valid": [k for k in res if k.startswith("bridge/recall")],
            "answer/graph_valid": [k for k in res if k.startswith("answer/reach")],
            "edge/margin_valid": ["edge/score_margin", "edge/margin_positive_rate"],
            "bridge/quality_valid": ["bridge/pos_prob", "bridge/neg_prob", "bridge/separation"],
        }
        for valid_key, names in groups.items():
            acc.update({n: res[n] for n in names}, res[valid_key])
        cov.update_sums(res["coverage"])
    out = acc.compute()
    c = cov._sums
    out["bridge/pos_edge_frac"] = c.get("bridge_pos_edges", 0.0) / max(c.get("total_pos_edges", 0.0), 1e-8)
    out["bridge/pos_graph_frac"] = c.get("graphs_with_bridge_pos", 0.0) / max(
        c.get("graphs_with_pos", 0.0), 1e-8
    )
    out.update(feat.compute())
    out["features/separation_gap"] = out.get("features/pos_prob_avg", 0.0) - out.get(
        "features/neg_prob_avg", 0.0
    )
    return out


def fit(
    model: Retriever,
    cfg: RetrieverTrainConfig,
    train_batches: Callable[[int], Iterable[RetrieverBatch]],
    val_batches: Callable[[], Iterable[RetrieverBatch]],
    *,
    seed: int = 0,
    log_every: int = 50,
    resume_from: str | None = None,
    mesh=None,
    tables: EmbedTables | None = None,
) -> tuple[Any, dict[str, Any]]:
    """Epoch loop with monitored early stopping; returns (best_params, history).

    ``resume_from`` restores params (+opt_state when present) from a
    checkpoint dir -- the reference's ``ckpt_path`` resume (train.py:198).
    """
    first = next(iter(train_batches(0)))
    state, tx = create_train_state(model, first, cfg, seed=seed, tables=tables)
    place = lambda b: b  # noqa: E731
    if mesh is not None:
        from evi_rag_tpu.parallel.mesh import place_replicated, shard_batch

        state = place_replicated(state, mesh)
        place = lambda b: shard_batch(b, mesh)  # noqa: E731
    if resume_from:
        import json as _json
        import pathlib as _pathlib

        from evi_rag_tpu.train.checkpoint import load_checkpoint

        _meta = _json.loads((_pathlib.Path(resume_from) / "meta.json").read_text())
        tree, meta = load_checkpoint(
            resume_from,
            example={"params": state.params, "opt_state": state.opt_state}
            if _meta.get("has_opt_state")
            else {"params": state.params},
        )
        state = TrainState(
            params=tree["params"],
            opt_state=tree.get("opt_state", state.opt_state),
            step=jnp.asarray(int(meta.get("step") or 0), jnp.int32),
            rng=state.rng,
        )
        log.info("resumed from %s at step %s", resume_from, meta.get("step"))
    train_step = make_train_step(model, tx, cfg, tables=tables)
    eval_step = make_eval_step(model, cfg, tables=tables)

    sign = 1.0 if cfg.monitor_mode == "max" else -1.0
    best_score = -float("inf")
    best_params = state.params
    bad_epochs = 0
    history: list[dict[str, Any]] = []

    for epoch in range(cfg.max_epochs):
        t0 = time.time()
        n_steps = 0
        last_metrics = None
        from evi_rag_tpu.data.feeder import prefetch

        for batch in prefetch(iter(train_batches(epoch))):
            state, metrics = train_step(state, place(batch))
            last_metrics = metrics  # device scalar; synced once per epoch
            n_steps += 1
            if n_steps % log_every == 0:
                log.info(
                    "epoch %d step %d loss %.4f", epoch, n_steps, float(metrics["loss"])
                )
        last_loss = float(last_metrics["loss"]) if last_metrics is not None else float("nan")
        val = evaluate(state.params, eval_step, val_batches())
        score = sign * val.get(cfg.monitor, -float("inf"))
        history.append({"epoch": epoch, "val": val, "train_loss": float(last_loss), "seconds": time.time() - t0})
        log.info("epoch %d %s=%.4f", epoch, cfg.monitor, val.get(cfg.monitor, float("nan")))
        if score > best_score:
            best_score = score
            best_params = jax.tree.map(lambda x: x, state.params)
            bad_epochs = 0
        else:
            bad_epochs += 1
            if bad_epochs > cfg.patience:
                log.info("early stop at epoch %d", epoch)
                break
    return best_params, {"history": history, "best_score": sign * best_score, "final_state": state}
