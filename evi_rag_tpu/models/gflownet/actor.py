"""Vectorized multi-graph rollout as a fixed-length ``lax.scan``.

Re-design of the reference ``GFlowNetActor.rollout`` (``src/models/
components/gflownet_actor.py:74-373``), the hot loop of GFlowNet training.
The reference runs a Python loop with data-dependent early exit
(``:303-304``) and host-side validation per step; under XLA that becomes a
fixed ``max_steps+1``-length scan with done-masking -- finished graphs take
STOP actions contributing log-prob 0, matching semantics exactly.

Per step: encode state -> policy -> joint edge+STOP segment softmax
(``_log_probs_edges``, ``:375-418``) -> Gumbel-max categorical sampling via
``segment_argmax`` (replacing torch_scatter ``scatter_max``, ``:262-281``)
or greedy / forced replay -> pure env step.  Behaviour-cloning statistics
(per-step -logsumexp of DAG-edge log-probs, ``:426-446``) are accumulated
in-scan.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from evi_rag_tpu.models.batches import AgentBatch
from evi_rag_tpu.models.gflownet.embedder import EmbedOutputs
from evi_rag_tpu.models.gflownet.env import (
    STOP_ACTION,
    EnvState,
    candidate_edge_masks,
    env_reset,
    env_step,
)
from evi_rag_tpu.models.gflownet.policy import GFlowNetEdgePolicy
from evi_rag_tpu.models.gflownet.state_encoder import StateEncoder
from evi_rag_tpu.ops.segment import NEG_INF, segment_argmax, segment_logsumexp, segment_sum

MIN_TEMPERATURE = 1e-5


def _remat_policy_of(config: "ActorConfig"):
    """jax.checkpoint policy for ``remat_policy``: ``True`` -> recompute
    everything (None policy); ``"dots"`` -> save matmul results, recompute
    only elementwise chains (dropout expansions, LayerNorm/GELU activations)."""
    if config.remat_policy == "dots":
        return jax.checkpoint_policies.dots_saveable
    return None


@dataclasses.dataclass(frozen=True)
class ActorConfig:
    max_steps: int
    policy_temperature: float = 1.0
    stop_on_answer: bool = False
    # Hoist the per-step edge-axis policy matmuls (attn k/v, edge-head edge
    # half) into batched pre-scan launches (``PolicyStepTensors``); the scan
    # body keeps only [G, H] matmuls + segment ops.  Identical math modulo
    # f32 reassociation and the dropout rng stream; turn off to run the
    # canonical per-step policy.
    precompute_policy: bool = True
    # Rematerialize the policy's [T, E, H] tensors in the backward pass.
    # In ``sample_then_score`` mode this wraps the ENTIRE batched score pass
    # (precompute_steps -> encode_states_batched -> apply_precomputed ->
    # log-prob gathers) in one ``jax.checkpoint``, so no [T, E, H] tensor —
    # k/v/p_edge/dropout masks/edge-head activations — survives as a
    # residual; the backward pass recomputes them from ``edge_base`` + the
    # rng key (threefry is deterministic, so the masks are identical).
    # MEASURED A/B on v5e at G=64 (docs/tpu_design.md): a LOSS — sts 1534 ->
    # sts_remat 1232 graphs/s.  The recompute re-pays a full score-pass
    # forward (~17.6 ms) while the residual IO it saves is only ~6-10 ms:
    # the dropout cost identified earlier (step 2695 graphs/s with dropout
    # off) is dominated by the LOST CROSS-STEP CSE (per-step masks force 4x
    # the edge-axis compute+traffic), which remat cannot recover.  Kept as
    # an off-by-default knob for memory-constrained configs (it does shrink
    # peak residency) and as the recorded negative result.  In the canonical
    # path this wraps only ``precompute_steps``, whose outputs are by
    # definition materialized at the boundary — measured neutral.
    # Bit-identical forward either way (tests/test_gflownet_sts.py).
    #
    # ``"dots"``: the SURGICAL variant — same checkpoint boundaries but with
    # ``jax.checkpoint_policies.dots_saveable``, so every matmul result
    # (k/v/p_edge, attention dots, heads) is SAVED and only the elementwise
    # chains (the dropout-masked ``edge_repr`` expansion, the edge-head
    # LayerNorm/GELU/mask activations) rematerialize in the backward pass.
    # This keeps exactly the residuals the full-remat experiment lost
    # (17.6 ms of re-paid matmuls) while still killing the [T, E, H]
    # elementwise residuals the round-4 dropout attribution blamed.
    remat_policy: bool | str = False
    # Sample-then-score: run the sequential rollout forward-only (actions,
    # masks, env snapshots; no autodiff residuals), then recompute every
    # step's log-probs / BC stats / state embeddings in ONE batched
    # differentiable pass over the step axis.  The backward pass stops
    # serializing over T entirely; the scan additionally drops the per-step
    # segment-logsumexp (Gumbel/greedy argmax is invariant to the per-graph
    # joint normalizer, so raw temperature-scaled logits sample identically).
    # Implies ``precompute_policy`` tensors (shared by both passes, so the
    # dropout stream and edge-axis matmuls are computed once).
    sample_then_score: bool = False

    @property
    def num_steps(self) -> int:
        return self.max_steps + 1


def log_probs_edges(
    edge_logits: jax.Array,   # [E]
    stop_logits: jax.Array,   # [G]
    edge_batch: jax.Array,
    valid_edges: jax.Array,
    num_graphs: int,
    temperature: float,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(log_prob_edge [E], log_prob_stop [G], has_edge [G]) of the joint
    edges+STOP categorical (reference ``gflownet_actor.py:375-418``)."""
    t = max(float(temperature), MIN_TEMPERATURE)
    e_scaled = edge_logits.astype(jnp.float32) / t
    s_scaled = stop_logits.astype(jnp.float32) / t
    lse_edges = segment_logsumexp(e_scaled, edge_batch, num_graphs, mask=valid_edges)
    log_denom = jnp.logaddexp(lse_edges, s_scaled)
    lp_edge = jnp.where(valid_edges, e_scaled - log_denom[edge_batch], NEG_INF)
    lp_stop = s_scaled - log_denom
    has_edge = lse_edges > NEG_INF
    return lp_edge, lp_stop, has_edge


def rollout(
    *,
    policy: GFlowNetEdgePolicy,
    state_encoder: StateEncoder,
    policy_params: Any,
    encoder_params: Any,
    batch: AgentBatch,
    embed: EmbedOutputs,
    rng: jax.Array,
    config: ActorConfig,
    greedy: bool = False,
    forced_actions: jax.Array | None = None,  # [G, T] edge ids / STOP
    dag_edge_mask: jax.Array | None = None,   # [E] bool, enables BC stats
    train: bool = False,
) -> dict[str, jax.Array]:
    if config.sample_then_score:
        return _rollout_sample_then_score(
            policy=policy, state_encoder=state_encoder,
            policy_params=policy_params, encoder_params=encoder_params,
            batch=batch, embed=embed, rng=rng, config=config, greedy=greedy,
            forced_actions=forced_actions, dag_edge_mask=dag_edge_mask,
            train=train,
        )
    gb = batch.graph
    g = gb.num_graphs
    h = embed.edge_tokens.shape[-1]
    T = config.num_steps
    temp = config.policy_temperature
    is_greedy = greedy or temp < MIN_TEMPERATURE

    edge_tokens = embed.edge_tokens.astype(jnp.float32)
    cache = state_encoder.apply(
        encoder_params,
        batch,
        node_tokens=embed.node_tokens.astype(jnp.float32),
        question_tokens=embed.question_tokens.astype(jnp.float32),
        method=StateEncoder.precompute,
    )
    edge_base = policy.apply(
        policy_params, edge_tokens, method=GFlowNetEdgePolicy.compute_edge_base
    )
    step_tensors = None
    if config.precompute_policy:

        def _precompute(params, tokens, base, key):
            rngs = {"dropout": key} if train else None
            return policy.apply(
                params, tokens, T, edge_base=base, train=train,
                method=GFlowNetEdgePolicy.precompute_steps, rngs=rngs,
            )

        if config.remat_policy:
            _precompute = jax.checkpoint(_precompute, policy=_remat_policy_of(config))
        step_tensors = _precompute(
            policy_params, edge_tokens, edge_base, jax.random.fold_in(rng, 987)
        )

    state0 = env_reset(
        batch, max_steps=config.max_steps, hidden_dim=h, stop_on_answer=config.stop_on_answer
    )
    want_bc = dag_edge_mask is not None
    dag_mask = dag_edge_mask if want_bc else jnp.zeros(gb.num_edges, dtype=bool)

    step_keys = jax.random.split(rng, T)
    forced = (
        forced_actions.astype(jnp.int32).T
        if forced_actions is not None
        else jnp.full((T, g), STOP_ACTION, dtype=jnp.int32)
    )

    def step_fn(carry, xs):
        state: EnvState = carry
        step_idx, key, forced_t, st_t = xs

        state_tokens = state_encoder.apply(
            encoder_params, cache, state, batch, method=StateEncoder.encode_state
        )
        fwd, bwd = candidate_edge_masks(state, batch, max_steps=config.max_steps)
        unused = ~state.used_edge_mask
        valid = (fwd | bwd) & unused

        if st_t is not None:
            edge_logits, stop_logits, state_out = policy.apply(
                policy_params, st_t, state_tokens, gb.edge_batch, valid,
                method=GFlowNetEdgePolicy.apply_precomputed,
            )
        else:
            policy_rngs = {"dropout": jax.random.fold_in(key, 2)} if train else None
            edge_logits, stop_logits, state_out = policy.apply(
                policy_params, edge_tokens, state_tokens, gb.edge_batch, valid,
                edge_base=edge_base, train=train, rngs=policy_rngs,
            )
        lp_edge, lp_stop, has_edge = log_probs_edges(
            edge_logits, stop_logits, gb.edge_batch, valid, g, temp
        )

        if forced_actions is not None:
            actions = forced_t
            forced_stop = actions == STOP_ACTION
            safe = jnp.where(forced_stop, 0, actions)
            log_pf = jnp.where(forced_stop, lp_stop, lp_edge[safe])
        else:
            if is_greedy:
                score_edge, score_stop = lp_edge, lp_stop
            else:
                ge = -jnp.log(-jnp.log(
                    jax.random.uniform(key, lp_edge.shape, minval=1e-10, maxval=1.0 - 1e-10)
                ))
                gs = -jnp.log(-jnp.log(
                    jax.random.uniform(
                        jax.random.fold_in(key, 1), lp_stop.shape, minval=1e-10, maxval=1.0 - 1e-10
                    )
                ))
                score_edge, score_stop = lp_edge + ge, lp_stop + gs
            score_edge = jnp.where(valid, score_edge, NEG_INF)
            max_v, argmax_e = segment_argmax(score_edge, gb.edge_batch, g, mask=valid)
            choose_edge = has_edge & (max_v > score_stop)
            actions = jnp.where(choose_edge, argmax_e.astype(jnp.int32), STOP_ACTION)
            log_pf = jnp.where(choose_edge, lp_edge[argmax_e], lp_stop)

        # Done graphs: STOP with zero log-prob contribution.
        actions = jnp.where(state.done, STOP_ACTION, actions)
        log_pf = jnp.where(state.done, 0.0, log_pf)

        if want_bc:
            bc_mask = valid & dag_mask
            bc_lse = segment_logsumexp(lp_edge, gb.edge_batch, g, mask=bc_mask)
            bc_count = segment_sum(bc_mask.astype(jnp.float32), gb.edge_batch, g)
            bc_valid = bc_count > 0
            bc_step_loss = jnp.where(bc_valid, -bc_lse, 0.0)
            bc_step_count = bc_valid.astype(jnp.float32)
        else:
            bc_step_loss = jnp.zeros(g)
            bc_step_count = jnp.zeros(g)

        sel = jnp.where(actions == STOP_ACTION, 0, actions)
        sel_emb = jnp.where(
            (actions != STOP_ACTION)[:, None], edge_tokens[sel], jnp.zeros((g, h))
        )
        new_state = env_step(
            state, batch, actions, sel_emb,
            step_index=step_idx, max_steps=config.max_steps,
            stop_on_answer=config.stop_on_answer,
        )
        outs = (log_pf, state_out.astype(jnp.float32), actions, bc_step_loss, bc_step_count)
        return new_state, outs

    # None is an empty pytree: scan passes it through unsliced.
    xs = (jnp.arange(T, dtype=jnp.int32), step_keys, forced, step_tensors)
    # Horizons are tiny (reference max_steps=3, gflownet_env.py:266-387), so
    # fully unroll short rollouts: the while-loop (and its reverse-mode twin)
    # serialized small per-step ops behind loop-carried dynamic-update-slices;
    # unrolled, XLA fuses across steps.  Measured on a v5e: 12.8 -> 11.2 ms
    # per train step at T=3 (1253 -> 1428 graphs/s, +14%).  Longer horizons
    # keep the scan to bound code size.
    final_state, (log_pf_steps, state_emb_seq, actions_seq, bc_losses, bc_counts) = jax.lax.scan(
        step_fn, state0, xs, unroll=True if T <= 8 else 1
    )

    # scan stacks on axis 0 = time; transpose to [G, T].
    log_pf_steps = log_pf_steps.T
    actions_seq = actions_seq.T
    state_emb_seq = jnp.transpose(state_emb_seq, (1, 0, 2))

    result = {
        "log_pf": jnp.sum(log_pf_steps, axis=1),
        "log_pf_steps": log_pf_steps,
        "state_emb_seq": state_emb_seq,
        "actions_seq": actions_seq,
        "directions_seq": final_state.directions,
        "selected_mask": final_state.used_edge_mask,
        "selection_order": final_state.selection_order,
        "reach_success": final_state.answer_hits.astype(jnp.float32),
        "length": final_state.step_counts.astype(jnp.float32),
        "answer_node_hit": final_state.answer_node_hit,
        "start_node_hit": final_state.start_node_hit,
        "active_nodes": final_state.active_nodes,
        "answer_hits": final_state.answer_hits,
    }
    if want_bc:
        bc_loss_sum = jnp.sum(bc_losses, axis=0)
        bc_step_counts = jnp.sum(bc_counts, axis=0)
        dag_counts = segment_sum(dag_mask.astype(jnp.float32), gb.edge_batch, g)
        result["bc_loss_per_graph"] = bc_loss_sum / jnp.maximum(bc_step_counts, 1.0)
        result["bc_steps_per_graph"] = bc_step_counts
        result["bc_has_dag"] = (dag_counts > 0).astype(jnp.float32)
    return result


def _rollout_sample_then_score(
    *,
    policy: GFlowNetEdgePolicy,
    state_encoder: StateEncoder,
    policy_params: Any,
    encoder_params: Any,
    batch: AgentBatch,
    embed: EmbedOutputs,
    rng: jax.Array,
    config: ActorConfig,
    greedy: bool = False,
    forced_actions: jax.Array | None = None,
    dag_edge_mask: jax.Array | None = None,
    train: bool = False,
) -> dict[str, jax.Array]:
    """Two-pass rollout: a forward-only sampling scan (no autodiff residuals,
    no per-step logsumexp), then one batched differentiable score pass over
    all T steps (VERDICT r3 #5: the sequential-step overhead of the rollout's
    reverse-mode twin disappears -- the score pass and its backward batch the
    step axis into single launches).

    Action parity with the canonical path: Gumbel-max / greedy over the joint
    edges+STOP categorical is invariant to the per-graph log-denominator, so
    the scan samples on temperature-scaled logits directly.  The score pass
    shares the sampling pass's ``PolicyStepTensors`` (one dropout stream, one
    set of edge-axis matmuls), so the recomputed log-probs are exactly the
    canonical path's log-probs modulo f32 reassociation.  The env's
    incremental action-history mean is recomputed in closed form (exclusive
    cumulative sum / count) so gradients flow through the selected edge
    tokens just as they do through ``env_step`` in the canonical path.
    """
    gb = batch.graph
    g = gb.num_graphs
    h = embed.edge_tokens.shape[-1]
    T = config.num_steps
    temp = config.policy_temperature
    t_div = max(float(temp), MIN_TEMPERATURE)
    is_greedy = greedy or temp < MIN_TEMPERATURE

    edge_tokens = embed.edge_tokens.astype(jnp.float32)
    cache = state_encoder.apply(
        encoder_params,
        batch,
        node_tokens=embed.node_tokens.astype(jnp.float32),
        question_tokens=embed.question_tokens.astype(jnp.float32),
        method=StateEncoder.precompute,
    )
    pre_key = jax.random.fold_in(rng, 987)
    pre_rngs = {"dropout": pre_key} if train else None
    step_tensors = policy.apply(
        policy_params, edge_tokens, T, train=train,
        method=GFlowNetEdgePolicy.precompute_steps, rngs=pre_rngs,
    )

    # ---- pass 1: sampling scan (forward-only) -------------------------
    # Every float input is stop-gradiented so the scan contributes nothing
    # to the autodiff graph; its outputs are ints/bools (actions + env-state
    # snapshots) consumed by the score pass.
    sg = jax.lax.stop_gradient
    psg, esg = sg(policy_params), sg(encoder_params)
    cache_sg, st_sg, tok_sg = sg(cache), sg(step_tensors), sg(edge_tokens)

    state0 = env_reset(
        batch, max_steps=config.max_steps, hidden_dim=h, stop_on_answer=config.stop_on_answer
    )
    step_keys = jax.random.split(rng, T)
    forced = (
        forced_actions.astype(jnp.int32).T
        if forced_actions is not None
        else jnp.full((T, g), STOP_ACTION, dtype=jnp.int32)
    )

    def sample_fn(carry, xs):
        state: EnvState = carry
        step_idx, key, forced_t, st_t = xs
        fwd, bwd = candidate_edge_masks(state, batch, max_steps=config.max_steps)
        valid = (fwd | bwd) & ~state.used_edge_mask
        snap = (valid, state.active_nodes, state.step_counts, state.done)

        if forced_actions is not None:
            # Forced replay never consults the policy: the scan is pure env
            # stepping + snapshot collection.
            actions = forced_t
        else:
            state_tokens = state_encoder.apply(
                esg, cache_sg, state, batch, method=StateEncoder.encode_state
            )
            edge_logits, stop_logits, _ = policy.apply(
                psg, st_t, state_tokens, gb.edge_batch, valid,
                method=GFlowNetEdgePolicy.apply_precomputed,
            )
            e_scaled = edge_logits.astype(jnp.float32) / t_div
            s_scaled = stop_logits.astype(jnp.float32) / t_div
            if is_greedy:
                score_edge, score_stop = e_scaled, s_scaled
            else:
                ge = -jnp.log(-jnp.log(
                    jax.random.uniform(key, e_scaled.shape, minval=1e-10, maxval=1.0 - 1e-10)
                ))
                gs = -jnp.log(-jnp.log(
                    jax.random.uniform(
                        jax.random.fold_in(key, 1), s_scaled.shape,
                        minval=1e-10, maxval=1.0 - 1e-10,
                    )
                ))
                score_edge, score_stop = e_scaled + ge, s_scaled + gs
            score_edge = jnp.where(valid, score_edge, NEG_INF)
            max_v, argmax_e = segment_argmax(score_edge, gb.edge_batch, g, mask=valid)
            has_edge = segment_sum(valid.astype(jnp.float32), gb.edge_batch, g) > 0
            choose_edge = has_edge & (max_v > score_stop)
            actions = jnp.where(choose_edge, argmax_e.astype(jnp.int32), STOP_ACTION)

        actions = jnp.where(state.done, STOP_ACTION, actions)
        sel = jnp.where(actions == STOP_ACTION, 0, actions)
        sel_emb = jnp.where(
            (actions != STOP_ACTION)[:, None], tok_sg[sel], jnp.zeros((g, h))
        )
        new_state = env_step(
            state, batch, actions, sel_emb,
            step_index=step_idx, max_steps=config.max_steps,
            stop_on_answer=config.stop_on_answer,
        )
        return new_state, (actions, *snap)

    xs = (jnp.arange(T, dtype=jnp.int32), step_keys, forced, st_sg)
    final_state, (actions_t, valid_seq, active_seq, counts_seq, done_seq) = jax.lax.scan(
        sample_fn, state0, xs, unroll=True if T <= 8 else 1
    )
    actions_t = sg(actions_t)
    valid_seq, active_seq = sg(valid_seq), sg(active_seq)
    counts_seq, done_seq = sg(counts_seq), sg(done_seq)

    # ---- pass 2: batched differentiable score pass ---------------------
    acting = actions_t != STOP_ACTION                       # [T, G]
    safe = jnp.where(acting, actions_t, 0)
    sel_emb_seq = jnp.where(acting[..., None], edge_tokens[safe], 0.0)  # [T, G, H]
    # Pre-step action-history mean, closed form: exclusive cumsum / count
    # (``env_step``'s running mean after k acting steps == mean of the k
    # selected edge tokens).
    cum_emb = jnp.cumsum(sel_emb_seq, axis=0) - sel_emb_seq
    cum_cnt = jnp.cumsum(acting.astype(jnp.float32), axis=0) - acting
    action_hidden_seq = cum_emb / jnp.maximum(cum_cnt, 1.0)[..., None]

    want_bc = dag_edge_mask is not None
    is_stop = actions_t == STOP_ACTION

    def _score_pass(policy_params, encoder_params, edge_tokens, cache,
                    action_hidden_seq, st, pre_key):
        """edge_base -> per-step log-probs, reduced to [T, G] inside.

        Under ``remat_policy`` this whole function sits inside one
        ``jax.checkpoint``: ``st=None`` makes it recompute the step tensors
        from ``edge_tokens`` + ``pre_key`` (identical dropout masks to the
        sampling scan's copy), and every [T, E(,H)]-sized intermediate dies
        at the boundary — the only residuals the outer autodiff keeps are
        this function's inputs and its [T, G(,H)] outputs."""
        if st is None:
            st = policy.apply(
                policy_params, edge_tokens, T, train=train,
                method=GFlowNetEdgePolicy.precompute_steps,
                rngs={"dropout": pre_key} if train else None,
            )
        state_tokens_seq = state_encoder.apply(
            encoder_params, cache, batch,
            active_seq=active_seq, counts_seq=counts_seq,
            action_hidden_seq=action_hidden_seq,
            method=StateEncoder.encode_states_batched,
        )                                                    # [T, G, H]

        def score_step(st_t, state_tokens, valid):
            return policy.apply(
                policy_params, st_t, state_tokens, gb.edge_batch, valid,
                method=GFlowNetEdgePolicy.apply_precomputed,
            )

        edge_logits_seq, stop_logits_seq, state_out_seq = jax.vmap(score_step)(
            st, state_tokens_seq, valid_seq
        )
        lp_edge_seq, lp_stop_seq, _ = jax.vmap(
            lambda e, s, v: log_probs_edges(e, s, gb.edge_batch, v, g, temp)
        )(edge_logits_seq, stop_logits_seq, valid_seq)

        log_pf_t = jnp.where(
            is_stop, lp_stop_seq, jnp.take_along_axis(lp_edge_seq, safe, axis=1)
        )
        log_pf_t = jnp.where(done_seq, 0.0, log_pf_t)        # [T, G]

        if want_bc:
            bc_mask_seq = valid_seq & dag_edge_mask[None]    # [T, E]
            bc_lse = jax.vmap(
                lambda lp, m: segment_logsumexp(lp, gb.edge_batch, g, mask=m)
            )(lp_edge_seq, bc_mask_seq)
            bc_cnt = jax.vmap(
                lambda m: segment_sum(m.astype(jnp.float32), gb.edge_batch, g)
            )(bc_mask_seq)
        else:
            bc_lse = bc_cnt = jnp.zeros((T, g), jnp.float32)
        return log_pf_t, state_out_seq, bc_lse, bc_cnt

    if config.remat_policy:
        log_pf_t, state_out_seq, bc_lse, bc_cnt = jax.checkpoint(
            _score_pass, policy=_remat_policy_of(config)
        )(
            policy_params, encoder_params, edge_tokens, cache,
            action_hidden_seq, None, pre_key,
        )
    else:
        log_pf_t, state_out_seq, bc_lse, bc_cnt = _score_pass(
            policy_params, encoder_params, edge_tokens, cache,
            action_hidden_seq, step_tensors, pre_key,
        )
    result = {
        "log_pf": jnp.sum(log_pf_t, axis=0),
        "log_pf_steps": log_pf_t.T,
        "state_emb_seq": jnp.transpose(state_out_seq.astype(jnp.float32), (1, 0, 2)),
        "actions_seq": actions_t.T,
        "directions_seq": final_state.directions,
        "selected_mask": final_state.used_edge_mask,
        "selection_order": final_state.selection_order,
        "reach_success": final_state.answer_hits.astype(jnp.float32),
        "length": final_state.step_counts.astype(jnp.float32),
        "answer_node_hit": final_state.answer_node_hit,
        "start_node_hit": final_state.start_node_hit,
        "active_nodes": final_state.active_nodes,
        "answer_hits": final_state.answer_hits,
    }
    if want_bc:
        bc_valid = bc_cnt > 0
        bc_loss_sum = jnp.sum(jnp.where(bc_valid, -bc_lse, 0.0), axis=0)
        bc_step_counts = jnp.sum(bc_valid.astype(jnp.float32), axis=0)
        dag_counts = segment_sum(dag_edge_mask.astype(jnp.float32), gb.edge_batch, g)
        result["bc_loss_per_graph"] = bc_loss_sum / jnp.maximum(bc_step_counts, 1.0)
        result["bc_steps_per_graph"] = bc_step_counts
        result["bc_has_dag"] = (dag_counts > 0).astype(jnp.float32)
    return result
