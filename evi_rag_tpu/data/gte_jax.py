"""JAX port of the GTE-v1.5 "NewModel" encoder architecture
(``Alibaba-NLP/gte-large-en-v1.5`` — the reference's production text
encoder, ``configs/build_retrieval_pipeline.yaml:4``).

The upstream checkpoint is a ``trust_remote_code`` architecture with no
Flax port, so ``FlaxAutoModel`` cannot load it.  This module implements
the architecture in pure jnp and converts the torch state dict directly:

* embeddings: word (+ token type) -> LayerNorm (no absolute positions);
* per layer (post-LN):
  - fused ``qkv_proj`` attention with rotary position embeddings (RoPE,
    ``rope_theta`` from config) applied to q/k, then ``o_proj``;
    ``hidden = attn_ln(hidden + attn_out)``
  - gated MLP: ``up, gate = split(up_gate_proj(x))``;
    ``down_proj(act(gate) * up)``; ``hidden = mlp_ln(hidden + mlp_out)``.

State-dict key layout (torch -> here):
``embeddings.{word_embeddings,token_type_embeddings}.weight``,
``embeddings.LayerNorm.{weight,bias}``,
``encoder.layer.{i}.attention.{qkv_proj,o_proj}.{weight,bias}``,
``encoder.layer.{i}.{attn_ln,mlp_ln}.{weight,bias}``,
``encoder.layer.{i}.mlp.up_gate_proj.weight``,
``encoder.layer.{i}.mlp.down_proj.{weight,bias}``.

Parity status: converter + forward are validated in
``tests/test_gte_jax.py`` against a spec-matched torch implementation on
randomly initialized checkpoints (cosine > 0.999).  When the real
gte-large weights land, ``TorchHFTextEncoder`` (the reference's exact
AutoModel+trust_remote_code path) serves as the ground-truth oracle for a
final cross-check — run ``GTEJaxTextEncoder.parity_check``.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class ReferenceEncoderUnavailable(RuntimeError):
    """The torch reference encoder cannot be built in this environment."""


@dataclasses.dataclass(frozen=True)
class GTEConfig:
    vocab_size: int
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    type_vocab_size: int = 2
    rope_theta: float = 160000.0
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def from_json(path: str | pathlib.Path) -> "GTEConfig":
        cfg = json.loads(pathlib.Path(path).read_text())
        return GTEConfig(
            vocab_size=int(cfg["vocab_size"]),
            hidden_size=int(cfg.get("hidden_size", 1024)),
            num_hidden_layers=int(cfg.get("num_hidden_layers", 24)),
            num_attention_heads=int(cfg.get("num_attention_heads", 16)),
            intermediate_size=int(cfg.get("intermediate_size", 4096)),
            type_vocab_size=int(cfg.get("type_vocab_size", 2)),
            rope_theta=float(cfg.get("rope_theta", 160000.0)),
            layer_norm_eps=float(cfg.get("layer_norm_eps", 1e-12)),
            hidden_act=str(cfg.get("hidden_act", "gelu")),
        )


def _strip_prefix(state: dict[str, Any]) -> dict[str, Any]:
    """Drop a leading ``new.``/``model.``/``bert.`` wrapper prefix if all
    keys share it (AutoModel vs task-head checkpoints differ here)."""
    for prefix in ("new.", "model.", "bert."):
        if all(k.startswith(prefix) for k in state):
            return {k[len(prefix):]: v for k, v in state.items()}
    return state


def load_gte_state_dict(model_dir: str | pathlib.Path) -> dict[str, np.ndarray]:
    """Read the torch checkpoint (safetensors preferred) as numpy arrays."""
    model_dir = pathlib.Path(model_dir)
    st_path = model_dir / "model.safetensors"
    if st_path.exists():
        from safetensors.numpy import load_file

        state = load_file(str(st_path))
    else:
        import torch

        bins = sorted(model_dir.glob("pytorch_model*.bin"))
        if not bins:
            raise FileNotFoundError(f"no model.safetensors / pytorch_model*.bin in {model_dir}")
        state = {}
        for b in bins:
            part = torch.load(b, map_location="cpu", weights_only=True)
            state.update({k: v.float().numpy() for k, v in part.items()})
    return _strip_prefix({k: np.asarray(v, np.float32) for k, v in state.items()})


def convert_gte_params(state: dict[str, np.ndarray], cfg: GTEConfig) -> dict[str, Any]:
    """Torch state dict -> JAX params pytree.  Linear weights transpose to
    ``x @ W`` convention."""

    def t(key: str) -> jnp.ndarray:
        return jnp.asarray(state[key].T)

    def v(key: str) -> jnp.ndarray:
        return jnp.asarray(state[key])

    params: dict[str, Any] = {
        "word_embeddings": v("embeddings.word_embeddings.weight"),
        "ln_emb_scale": v("embeddings.LayerNorm.weight"),
        "ln_emb_bias": v("embeddings.LayerNorm.bias"),
        "layers": [],
    }
    if "embeddings.token_type_embeddings.weight" in state:
        params["token_type_embeddings"] = v("embeddings.token_type_embeddings.weight")
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}"
        layer = {
            "qkv_w": t(f"{p}.attention.qkv_proj.weight"),
            "o_w": t(f"{p}.attention.o_proj.weight"),
            "attn_ln_scale": v(f"{p}.attn_ln.weight"),
            "attn_ln_bias": v(f"{p}.attn_ln.bias"),
            "up_gate_w": t(f"{p}.mlp.up_gate_proj.weight"),
            "down_w": t(f"{p}.mlp.down_proj.weight"),
            "mlp_ln_scale": v(f"{p}.mlp_ln.weight"),
            "mlp_ln_bias": v(f"{p}.mlp_ln.bias"),
        }
        for name, key in (
            ("qkv_b", f"{p}.attention.qkv_proj.bias"),
            ("o_b", f"{p}.attention.o_proj.bias"),
            ("down_b", f"{p}.mlp.down_proj.bias"),
        ):
            if key in state:
                layer[name] = v(key)
        params["layers"].append(layer)
    return params


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _rope(q: jnp.ndarray, k: jnp.ndarray, theta: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate-half RoPE over [B, H, T, D_h]."""
    d = q.shape[-1]
    T = q.shape[-2]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    pos = jnp.arange(T, dtype=jnp.float32)
    freqs = jnp.einsum("t,f->tf", pos, inv_freq)  # [T, D_h/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [T, D_h]
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    def rotate_half(x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        return jnp.concatenate([-x2, x1], axis=-1)

    q2 = q * cos + rotate_half(q) * sin
    k2 = k * cos + rotate_half(k) * sin
    return q2, k2


def gte_forward(
    params: dict[str, Any],
    cfg: GTEConfig,
    input_ids: jnp.ndarray,  # [B, T] int32
    attention_mask: jnp.ndarray,  # [B, T] {0,1}
) -> jnp.ndarray:
    """Last hidden state [B, T, D] (matches NewModel.forward)."""
    B, T = input_ids.shape
    H, Dh = cfg.num_attention_heads, cfg.head_dim
    act = jax.nn.gelu if cfg.hidden_act.startswith("gelu") else getattr(jax.nn, cfg.hidden_act)

    x = params["word_embeddings"][input_ids]
    if "token_type_embeddings" in params:
        x = x + params["token_type_embeddings"][0]
    x = _layer_norm(x, params["ln_emb_scale"], params["ln_emb_bias"], cfg.layer_norm_eps)

    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    attn_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)

    for layer in params["layers"]:
        qkv = x @ layer["qkv_w"]
        if "qkv_b" in layer:
            qkv = qkv + layer["qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, Dh).transpose(0, 2, 1, 3)
        q, k = _rope(q, k, cfg.rope_theta)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(float(Dh))
        probs = jax.nn.softmax(logits + attn_bias, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, cfg.hidden_size)
        attn_out = ctx @ layer["o_w"]
        if "o_b" in layer:
            attn_out = attn_out + layer["o_b"]
        x = _layer_norm(
            x + attn_out, layer["attn_ln_scale"], layer["attn_ln_bias"], cfg.layer_norm_eps
        )
        up_gate = x @ layer["up_gate_w"]
        up, gate = jnp.split(up_gate, 2, axis=-1)
        h = act(gate) * up
        mlp_out = h @ layer["down_w"]
        if "down_b" in layer:
            mlp_out = mlp_out + layer["down_b"]
        x = _layer_norm(
            x + mlp_out, layer["mlp_ln_scale"], layer["mlp_ln_bias"], cfg.layer_norm_eps
        )
    return x


class GTEJaxTextEncoder:
    """TPU-native mean-pooled GTE encoder: torch checkpoint dir in, jitted
    pure-jnp forward out (same ``encode`` protocol as the other encoders)."""

    def __init__(self, model_dir: str | pathlib.Path, *, max_length: int = 64) -> None:
        from transformers import AutoTokenizer

        model_dir = pathlib.Path(model_dir)
        self.config = GTEConfig.from_json(model_dir / "config.json")
        self.params = convert_gte_params(load_gte_state_dict(model_dir), self.config)
        self.tokenizer = AutoTokenizer.from_pretrained(str(model_dir))
        self.max_length = int(max_length)
        self.dim = self.config.hidden_size
        cfg = self.config

        @jax.jit
        def forward(params, input_ids, attention_mask):
            hidden = gte_forward(params, cfg, input_ids, attention_mask)
            mask = attention_mask[..., None].astype(hidden.dtype)
            return (hidden * mask).sum(axis=1) / mask.sum(axis=1).clip(1.0)

        self._forward = forward

    def encode(self, texts: Sequence[str], *, batch_size: int = 256) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i in range(0, len(texts), batch_size):
            chunk = list(texts[i : i + batch_size])
            pad = batch_size - len(chunk)
            toks = self.tokenizer(
                chunk + [""] * pad,
                padding="max_length",
                truncation=True,
                max_length=self.max_length,
                return_tensors="np",
            )
            emb = self._forward(
                self.params,
                toks["input_ids"].astype(np.int32),
                toks["attention_mask"].astype(np.int32),
            )
            out[i : i + len(chunk)] = np.asarray(emb)[: len(chunk)]
        return out

    def parity_check(self, model_dir: str | pathlib.Path, texts: Sequence[str]) -> float:
        """Min cosine similarity vs the reference torch encoder on the same
        checkpoint (run when the real weights are available).

        Raises :class:`ReferenceEncoderUnavailable` when the torch reference
        cannot be *constructed* in this environment (torch/transformers
        absent, remote modeling code unfetchable offline) — callers may
        downgrade that case to a loud skip.  Failures during encoding or
        comparison propagate as-is: those mean the reference ran and
        something is wrong, which must not be swallowed.
        """
        from evi_rag_tpu.data.text_encoder import TorchHFTextEncoder

        try:
            ref = TorchHFTextEncoder(str(model_dir), max_length=self.max_length,
                                     trust_remote_code=True)
        except Exception as exc:
            raise ReferenceEncoderUnavailable(
                f"torch reference encoder could not be constructed: {exc}"
            ) from exc
        a = self.encode(list(texts), batch_size=min(8, max(len(texts), 1)))
        b = ref.encode(list(texts))
        num = (a * b).sum(-1)
        den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
        return float((num / np.maximum(den, 1e-9)).min())
