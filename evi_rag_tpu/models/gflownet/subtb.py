"""Closed-form Sub-Trajectory Balance (λ=1) with deterministic P_B.

Re-derivation of the reference's O(T) all-subtrajectory loss
(``src/models/gflownet_module.py:980-1036``).  With deterministic backward
policy (every non-terminal state has a unique predecessor => log P_B = 0,
``gflownet_module.py:917-930``), the SubTB residual for sub-trajectory
i -> j (0 <= i < j <= T) is

    r_ij = logF(s_i) + sum_{t=i..j-1} logPF_t - logF(s_j)
         = (logF_i - prefix_i) + (prefix_j - logF_j)  =:  a_i + b_j

where ``prefix_t`` is the cumulative log PF.  The λ=1 loss is

    L = sum_{i<j<=T} (a_i + b_j)^2 / #pairs
      = sum_j [ sum_{i<j} a_i^2 + 2 b_j sum_{i<j} a_i + j b_j^2 ] / sum_j j

computed with two cumulative sums -- O(T) instead of O(T^2).  The terminal
index is (num selected edges + 1); ``log_flow_states`` must already carry
logR at the terminal slot (see ``log_flow_with_terminal_reward``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_flow_with_terminal_reward(
    log_flow_pred: jax.Array,  # [G, T] estimator logF at each visited state
    log_reward: jax.Array,     # [G]
    edge_lengths: jax.Array,   # [G] number of selected edges
) -> jax.Array:
    """[G, T+1] flow states with logF(s_terminal) := logR.

    Mirrors reference ``_compute_log_flow_states``
    (``gflownet_module.py:882-915``): one extra slot is appended holding
    logR for max-length trajectories, and the realized terminal index
    (stop step + 1 = edge_lengths + 1) is overwritten with logR.
    """
    g, t = log_flow_pred.shape
    lr = log_reward.astype(log_flow_pred.dtype)
    states = jnp.concatenate([log_flow_pred, lr[:, None]], axis=1)  # [G, T+1]
    term = jnp.clip(edge_lengths.astype(jnp.int32), 0, t - 1) + 1
    states = states.at[jnp.arange(g), term].set(lr)
    return states


def subtb_loss(
    log_flow_states: jax.Array,  # [G, T+1]
    log_pf_steps: jax.Array,     # [G, T]
    edge_lengths: jax.Array,     # [G]
    *,
    graph_mask: jax.Array | None = None,
) -> jax.Array:
    g, t = log_pf_steps.shape
    if log_flow_states.shape != (g, t + 1):
        raise ValueError(
            f"log_flow_states shape {log_flow_states.shape} != ({g}, {t + 1})"
        )
    prefix = jnp.concatenate(
        [jnp.zeros((g, 1), log_pf_steps.dtype), jnp.cumsum(log_pf_steps, axis=1)], axis=1
    )  # [G, T+1]
    a = log_flow_states - prefix
    b = prefix - log_flow_states

    a_cum = jnp.cumsum(a, axis=1)
    a2_cum = jnp.cumsum(a * a, axis=1)
    prefix_a = a_cum - a          # sum_{i<j} a_i at slot j
    prefix_a2 = a2_cum - a * a

    idx = jnp.arange(t + 1, dtype=log_pf_steps.dtype)[None, :]
    contrib = prefix_a2 + 2.0 * b * prefix_a + idx * (b * b)

    term = jnp.clip(edge_lengths.astype(jnp.int32), 0, t - 1) + 1
    mask = idx <= term[:, None].astype(log_pf_steps.dtype)
    sum_sq = jnp.sum(contrib * mask, axis=1)
    denom = jnp.maximum(jnp.sum(idx * mask, axis=1), 1.0)
    per_graph = sum_sq / denom

    if graph_mask is not None:
        w = graph_mask.astype(per_graph.dtype)
        return jnp.sum(per_graph * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(per_graph)


def bc_weight_schedule(
    step: jax.Array | int,
    *,
    bc_weight: float,
    bc_weight_floor: float = 0.0,
    hold_steps: int = 0,
    decay_steps: int = 0,
) -> jax.Array:
    """Cosine hold/decay schedule for the DAG behaviour-cloning weight
    (reference ``_compute_bc_weight``, ``gflownet_module.py:952-978``)."""
    if bc_weight <= 0.0:
        return jnp.zeros(())
    floor = max(0.0, min(bc_weight_floor, bc_weight))
    step = jnp.asarray(step, jnp.float32)
    if hold_steps == 0 and decay_steps == 0:
        return jnp.full((), bc_weight)
    if decay_steps <= 0:
        scale = (step < hold_steps).astype(jnp.float32)
    else:
        tt = jnp.clip(step - hold_steps, 0, decay_steps)
        scale = jnp.where(
            step < hold_steps,
            1.0,
            0.5 * (1.0 + jnp.cos(jnp.pi * tt / decay_steps)),
        )
    return floor + (bc_weight - floor) * scale
