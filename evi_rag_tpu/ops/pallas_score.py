"""Fused Pallas TPU kernel for bidirectional triple scoring.

The serving hot loop (BASELINE.json: "fused Pallas matmul+score+top-k kernel
over millions of candidate triples").  One kernel launch scores a tile of
candidates for one query, both directions, with every weight matrix resident
in VMEM and the concat never materialized:

* the state_net input ``[inter ‖ struct_ctx ‖ err ‖ dist] @ W1`` is computed
  as split matmuls ``inter @ W1a + struct_ctx @ W1b + err @ W1c + dist*w1d``
  (the same split-weight trick the reference uses to avoid the 4H concat,
  ``gflownet_embedder.py:934-1033``, here applied inside the kernel);
* the backward view reuses the loaded h/r/t tiles (halving HBM traffic vs
  two passes) and derives its struct context by *swapping the struct
  projection's row halves* instead of re-gathering:
  ``struct_bwd @ Ws == head_part @ Ws_bot + tail_part @ Ws_top``;
* the twin-view softmax combine (``retriever.py:369-381``) happens in
  registers before the store.

Compute is bf16 on the MXU with f32 accumulation (``preferred_element_type``).
Weight residency: for D=H=1024 the split W1 blocks + W2 total ~8 MB bf16,
within the ~16 MB VMEM budget alongside double-buffered input tiles.

``pallas_score_bidirectional`` matches ``ops/query.py::score_all`` to bf16
tolerance (covered by tests in interpret mode and on hardware by the bench).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _prep_weights(feats: dict[str, Any], dtype=jnp.bfloat16) -> dict[str, jax.Array]:
    """Split and cast the retriever feature weights for the kernel."""
    d = feats["q_gate"]["kernel"].shape[0]
    h = feats["state_net_1"]["kernel"].shape[0]
    w1 = feats["state_net_0"]["kernel"]  # [(3D+1), H] rows: inter, struct, err, dist
    ws = feats["struct_proj"]["kernel"]  # [S, D]
    s = ws.shape[0]
    if w1.shape[0] != 3 * d + 1:
        raise ValueError(f"state_net_0 rows {w1.shape[0]} != 3*{d}+1")
    if s % 2 != 0:
        raise ValueError("struct dim must be even (head/tail halves)")
    return {
        "w1_inter": w1[:d].astype(dtype),
        "w1_struct": w1[d : 2 * d].astype(dtype),
        "w1_err": w1[2 * d : 3 * d].astype(dtype),
        "w1_dist": w1[3 * d :].astype(jnp.float32),  # [1, H]
        "b1": feats["state_net_0"]["bias"].astype(jnp.float32),
        "ln1_scale": feats["state_norm"]["scale"].astype(jnp.float32),
        "ln1_bias": feats["state_norm"]["bias"].astype(jnp.float32),
        "w2": feats["state_net_1"]["kernel"].astype(dtype),
        "b2": feats["state_net_1"]["bias"].astype(jnp.float32),
        "w_score": feats["score_head"]["kernel"].astype(jnp.float32),  # [H, 1]
        "b_score": feats["score_head"]["bias"].astype(jnp.float32),
        "ws_top": ws[: s // 2].astype(dtype),   # head-half rows
        "ws_bot": ws[s // 2 :].astype(dtype),   # tail-half rows
        "bs": feats["struct_proj"]["bias"].astype(jnp.float32),
        "lns_scale": feats["struct_norm"]["scale"].astype(jnp.float32),
        "lns_bias": feats["struct_norm"]["bias"].astype(jnp.float32),
        "wg_kernel": feats["struct_gate"]["kernel"].astype(jnp.float32),  # [D, 1]
        "wg_bias": feats["struct_gate"]["bias"].astype(jnp.float32),
    }


def _ln(x, scale, bias, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _score_kernel(
    # scalar-free refs; order matches pallas_call in_specs
    h_ref, r_ref, t_ref, s_head_ref, s_tail_ref, gate_ref, bias_ref,
    w1i_ref, w1s_ref, w1e_ref, w1d_ref, b1_ref, ln1s_ref, ln1b_ref,
    w2_ref, b2_ref, wsc_ref, bsc_ref,
    wst_ref, wsb_ref, bs_ref, lnss_ref, lnsb_ref, wg_ref, wgb_ref,
    out_ref,
):
    f32 = jnp.float32
    h = h_ref[:]
    r = r_ref[:]
    t = t_ref[:]
    gate = gate_ref[:]
    bias = bias_ref[:]
    r_ctx = r * gate + bias

    # struct contexts, both orientations, from the two projection halves.
    sh = s_head_ref[:]
    st = s_tail_ref[:]
    proj_f = (
        jnp.dot(sh, wst_ref[:], preferred_element_type=f32)
        + jnp.dot(st, wsb_ref[:], preferred_element_type=f32)
        + bs_ref[:]
    )
    proj_b = (
        jnp.dot(sh, wsb_ref[:], preferred_element_type=f32)
        + jnp.dot(st, wst_ref[:], preferred_element_type=f32)
        + bs_ref[:]
    )

    def direction(head, tail, sc_raw):
        sc = jax.nn.gelu(_ln(sc_raw, lnss_ref[:], lnsb_ref[:]))
        nav = jax.nn.sigmoid(jnp.dot(sc.astype(f32), wg_ref[:], preferred_element_type=f32) + wgb_ref[:])
        sc16 = sc.astype(h.dtype)
        inter = head * r_ctx * tail * nav.astype(h.dtype)
        err = head + r_ctx - tail
        err32 = err.astype(f32)
        dist = -jnp.sqrt(jnp.sum(err32 * err32, axis=-1, keepdims=True) + 1e-12)
        z = (
            jnp.dot(inter, w1i_ref[:], preferred_element_type=f32)
            + jnp.dot(sc16, w1s_ref[:], preferred_element_type=f32)
            + jnp.dot(err, w1e_ref[:], preferred_element_type=f32)
            + dist * w1d_ref[:]
            + b1_ref[:]
        )
        z = jax.nn.gelu(_ln(z, ln1s_ref[:], ln1b_ref[:]))
        z = jnp.dot(z.astype(h.dtype), w2_ref[:], preferred_element_type=f32) + b2_ref[:]
        return (
            jnp.dot(z, wsc_ref[:], preferred_element_type=f32)[:, 0] + bsc_ref[0]
        )

    fwd = direction(h, t, proj_f)
    bwd = direction(t, h, proj_b)
    # Twin-view softmax combine in registers.
    mx = jnp.maximum(fwd, bwd)
    ef = jnp.exp(fwd - mx)
    eb = jnp.exp(bwd - mx)
    w_f = ef / (ef + eb)
    out_ref[:, 0] = w_f * fwd + (1.0 - w_f) * bwd


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def pallas_score_bidirectional(
    bundle: dict[str, Any],
    q_emb: jax.Array,        # [D] one query (raw)
    head_repr: jax.Array,    # [M, D] pre-projected
    rel_repr: jax.Array,     # [M, D]
    tail_repr: jax.Array,    # [M, D]
    struct_raw: jax.Array,   # [M, S]
    *,
    tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """[M] bidirectional scores for one query via the fused kernel."""
    from evi_rag_tpu.ops.nnfn import dense as _dense, projector as _projector

    feats = bundle["features"]
    w = _prep_weights(feats)
    d = head_repr.shape[1]
    s = struct_raw.shape[1]
    m = head_repr.shape[0]
    if m % tile != 0:
        pad = tile - m % tile
        padf = lambda x: jnp.pad(x, ((0, pad), (0, 0)))
        head_repr, rel_repr, tail_repr, struct_raw = map(
            padf, (head_repr, rel_repr, tail_repr, struct_raw)
        )
    mp = head_repr.shape[0]

    qp = _projector(feats["query_proj"], q_emb[None, :])
    gate = jax.nn.sigmoid(_dense(feats["q_gate"], qp)).astype(jnp.bfloat16)  # [1, D]
    bias = jnp.tanh(_dense(feats["q_bias"], qp)).astype(jnp.bfloat16)

    bf16 = jnp.bfloat16
    grid = (mp // tile,)
    tiled = lambda c: pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0), memory_space=pltpu.VMEM)
    vec = lambda c: pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM)

    hh = s // 2
    hdim = w["w2"].shape[0]
    out = pl.pallas_call(
        _score_kernel,
        grid=grid,
        in_specs=[
            tiled(d), tiled(d), tiled(d),                      # h, r, t
            tiled(hh), tiled(hh),                              # struct halves
            full(1, d), full(1, d),                            # gate, bias
            full(d, hdim), full(d, hdim), full(d, hdim),       # w1 splits
            full(1, hdim), vec(hdim), vec(hdim), vec(hdim),    # w1d, b1, ln1
            full(hdim, hdim), vec(hdim),                       # w2, b2
            full(hdim, 1), vec(1),                             # score head
            full(hh, d), full(hh, d), vec(d), vec(d), vec(d),  # struct proj + ln
            full(d, 1), vec(1),                                # struct gate
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # The resident weight set (~8 MB bf16 at D=H=1024) plus pipelined
            # input tiles exceeds the default scoped-vmem budget; raise it.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        head_repr.astype(bf16), rel_repr.astype(bf16), tail_repr.astype(bf16),
        struct_raw[:, :hh].astype(bf16), struct_raw[:, hh:].astype(bf16),
        gate, bias,
        w["w1_inter"], w["w1_struct"], w["w1_err"],
        w["w1_dist"], w["b1"], w["ln1_scale"], w["ln1_bias"],
        w["w2"], w["b2"],
        w["w_score"], w["b_score"],
        w["ws_top"], w["ws_bot"], w["bs"], w["lns_scale"], w["lns_bias"],
        w["wg_kernel"], w["wg_bias"],
    )
    return out[:m, 0]


def pallas_query_topk(
    bundle: dict[str, Any],
    q_emb: jax.Array,    # [B, D]
    index,               # ops.query.TripleIndex
    *,
    k: int,
    tile: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Batched top-k via the fused kernel (vmapped over queries)."""

    def one(q):
        scores = pallas_score_bidirectional(
            bundle, q, index.head_repr, index.rel_repr, index.tail_repr,
            index.struct_raw, tile=tile, interpret=interpret,
        )
        return jax.lax.top_k(scores, k)

    return jax.vmap(one)(q_emb)
