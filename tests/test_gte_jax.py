"""Text-encoder bridge parity tests (VERDICT missing #2).

1. ``FlaxHFTextEncoder(from_pt=True)`` vs ``TorchHFTextEncoder`` on a
   locally constructed tiny torch BERT checkpoint — validates the
   torch->JAX weight-conversion path for Flax-ported architectures with
   the reference's mean-pooling semantics (``text_encode_utils.py:32-67``).
2. ``GTEJaxTextEncoder`` (pure-jnp port of the gte-v1.5 "NewModel" arch)
   vs a spec-matched torch implementation on a random checkpoint saved
   with the official state-dict key layout — validates the converter and
   the RoPE/gated-MLP/post-LN forward to cosine > 0.999.
"""

import json
import math
import pathlib

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch import + HF model construction

TEXTS = [
    "who directed the film inception",
    "capital of france",
    "a much longer question about the population of the city of berlin in germany",
    "short",
]


def _write_tokenizer(d: pathlib.Path, vocab_size: int) -> None:
    from transformers import BertTokenizerFast

    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    base = [
        "who", "directed", "the", "film", "inception", "capital", "of", "france",
        "a", "much", "longer", "question", "about", "population", "city",
        "berlin", "in", "germany", "short",
    ]
    words += base + [f"tok{i}" for i in range(vocab_size - len(words) - len(base))]
    vocab = d / "vocab.txt"
    vocab.write_text("\n".join(words[:vocab_size]))
    BertTokenizerFast(vocab_file=str(vocab)).save_pretrained(str(d))


def _cos_rows(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    return num / np.maximum(den, 1e-9)


def test_bert_from_pt_parity(tmp_path):
    import torch
    from transformers import BertConfig, BertModel

    from evi_rag_tpu.data.text_encoder import FlaxHFTextEncoder, TorchHFTextEncoder

    d = tmp_path / "bert"
    d.mkdir()
    cfg = BertConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=64,
    )
    torch.manual_seed(0)
    BertModel(cfg).save_pretrained(str(d), safe_serialization=False)
    _write_tokenizer(d, cfg.vocab_size)

    ref = TorchHFTextEncoder(str(d), max_length=32, trust_remote_code=False)
    jx = FlaxHFTextEncoder(str(d), max_length=32, from_pt=True)
    a = ref.encode(TEXTS)
    b = jx.encode(TEXTS, batch_size=4)
    assert a.shape == b.shape == (4, 32)
    assert _cos_rows(a, b).min() > 0.999


# ----- spec-matched torch NewModel (gte-v1.5 architecture family) -------- #


def _torch_new_model(cfg_dict):
    """Minimal torch implementation of the gte 'NewModel' spec used as the
    parity oracle: RoPE attention (fused qkv), gated MLP, post-LN."""
    import torch
    import torch.nn as nn

    H = cfg_dict["num_attention_heads"]
    D = cfg_dict["hidden_size"]
    Dh = D // H
    I = cfg_dict["intermediate_size"]
    eps = cfg_dict["layer_norm_eps"]
    theta = cfg_dict["rope_theta"]

    class Layer(nn.Module):
        def __init__(self):
            super().__init__()
            self.attention = nn.Module()
            self.attention.qkv_proj = nn.Linear(D, 3 * D, bias=True)
            self.attention.o_proj = nn.Linear(D, D, bias=True)
            self.attn_ln = nn.LayerNorm(D, eps=eps)
            self.mlp = nn.Module()
            self.mlp.up_gate_proj = nn.Linear(D, 2 * I, bias=False)
            self.mlp.down_proj = nn.Linear(I, D, bias=True)
            self.mlp_ln = nn.LayerNorm(D, eps=eps)

        def rope(self, x):
            # x: [B, H, T, Dh]
            T = x.shape[-2]
            inv = 1.0 / (theta ** (torch.arange(0, Dh, 2).float() / Dh))
            freqs = torch.outer(torch.arange(T).float(), inv)
            emb = torch.cat([freqs, freqs], dim=-1)
            cos, sin = emb.cos(), emb.sin()
            x1, x2 = x.chunk(2, dim=-1)
            rot = torch.cat([-x2, x1], dim=-1)
            return x * cos + rot * sin

        def forward(self, x, mask_bias):
            B, T, _ = x.shape
            qkv = self.attention.qkv_proj(x)
            q, k, v = qkv.chunk(3, dim=-1)
            q = q.view(B, T, H, Dh).transpose(1, 2)
            k = k.view(B, T, H, Dh).transpose(1, 2)
            v = v.view(B, T, H, Dh).transpose(1, 2)
            q, k = self.rope(q), self.rope(k)
            logits = q @ k.transpose(-1, -2) / math.sqrt(Dh) + mask_bias
            ctx = logits.softmax(-1) @ v
            ctx = ctx.transpose(1, 2).reshape(B, T, D)
            x = self.attn_ln(x + self.attention.o_proj(ctx))
            up, gate = self.mlp.up_gate_proj(x).chunk(2, dim=-1)
            x = self.mlp_ln(x + self.mlp.down_proj(torch.nn.functional.gelu(gate) * up))
            return x

    class NewModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.embeddings = nn.Module()
            self.embeddings.word_embeddings = nn.Embedding(cfg_dict["vocab_size"], D)
            self.embeddings.token_type_embeddings = nn.Embedding(
                cfg_dict["type_vocab_size"], D
            )
            self.embeddings.LayerNorm = nn.LayerNorm(D, eps=eps)
            self.encoder = nn.Module()
            self.encoder.layer = nn.ModuleList(
                [Layer() for _ in range(cfg_dict["num_hidden_layers"])]
            )

        def forward(self, input_ids, attention_mask):
            x = self.embeddings.word_embeddings(input_ids)
            x = x + self.embeddings.token_type_embeddings.weight[0]
            x = self.embeddings.LayerNorm(x)
            bias = torch.where(
                attention_mask[:, None, None, :] > 0,
                torch.zeros(1),
                torch.full((1,), torch.finfo(torch.float32).min),
            )
            for layer in self.encoder.layer:
                x = layer(x, bias)
            return x

    return NewModel()


def test_gte_jax_parity_vs_torch_spec(tmp_path):
    import torch

    from evi_rag_tpu.data.gte_jax import GTEJaxTextEncoder

    d = tmp_path / "gte_tiny"
    d.mkdir()
    cfg = {
        "vocab_size": 64,
        "hidden_size": 32,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "intermediate_size": 48,
        "type_vocab_size": 2,
        "rope_theta": 160000.0,
        "layer_norm_eps": 1e-12,
        "hidden_act": "gelu",
        "model_type": "new",
    }
    (d / "config.json").write_text(json.dumps(cfg))
    _write_tokenizer(d, cfg["vocab_size"])

    torch.manual_seed(1)
    model = _torch_new_model(cfg)
    model.eval()
    torch.save(model.state_dict(), d / "pytorch_model.bin")

    enc = GTEJaxTextEncoder(d, max_length=24)
    got = enc.encode(TEXTS, batch_size=4)

    # Oracle: torch forward + mean pooling on the same tokens.
    toks = enc.tokenizer(
        TEXTS, padding=True, truncation=True, max_length=24, return_tensors="pt"
    )
    with torch.no_grad():
        hidden = model(toks["input_ids"], toks["attention_mask"])
        m = toks["attention_mask"].unsqueeze(-1).float()
        want = ((hidden * m).sum(1) / m.sum(1).clamp(min=1.0)).numpy()

    assert got.shape == want.shape == (4, 32)
    cos = _cos_rows(got, want)
    assert cos.min() > 0.999, cos
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_gte_jax_in_build_pipeline(tmp_path):
    """gte_jax encoder kind drives the CLI build end-to-end."""
    import torch

    from evi_rag_tpu import cli
    from evi_rag_tpu.utils.config import load_config

    d = tmp_path / "gte_tiny"
    d.mkdir()
    cfg = {
        "vocab_size": 64, "hidden_size": 16, "num_hidden_layers": 1,
        "num_attention_heads": 2, "intermediate_size": 24, "type_vocab_size": 2,
        "rope_theta": 160000.0, "layer_norm_eps": 1e-12, "hidden_act": "gelu",
        "model_type": "new",
    }
    (d / "config.json").write_text(json.dumps(cfg))
    _write_tokenizer(d, 64)
    torch.manual_seed(2)
    torch.save(_torch_new_model(cfg).state_dict(), d / "pytorch_model.bin")

    import pyarrow as pa
    import pyarrow.parquet as pq

    raw = tmp_path / "raw"
    raw.mkdir()
    rows = [
        {
            "id": "t0", "question": "who directed the film",
            "answer": ["berlin"], "q_entity": ["film"], "a_entity": ["berlin"],
            "graph": [["film", "rel.directed", "berlin"]],
        }
    ]
    pq.write_table(pa.Table.from_pylist(rows), raw / "train-0.parquet")

    configs = str(pathlib.Path(__file__).resolve().parents[1] / "configs")
    c = load_config(
        configs,
        "build",
        [
            f"build.raw_root={raw}",
            f"build.out_dir={tmp_path}/norm",
            "build.encoder.kind=gte_jax",
            f"build.encoder.model_path={d}",
        ],
    )
    c["task_name"] = "build"
    c.setdefault("paths", {})["log_dir"] = str(tmp_path / "logs")
    rd = tmp_path / "run"
    rd.mkdir()
    m = cli.TASKS["build"](c, run_dir=rd)
    ent = np.load(tmp_path / "norm" / "embeddings" / "entity_embeddings.npy")
    assert ent.shape[1] == 16 and m["num_entities"] == 2
    assert np.abs(ent[1:]).sum() > 0  # real encoder output, row 0 reserved


def test_build_gate_refuses_diverging_gte_port(tmp_path, monkeypatch):
    """When encoder=gte_jax, task_build runs ``parity_check`` against the
    torch reference encoder and refuses to build below the cosine floor
    (VERDICT r2 next-step #6); an unavailable torch reference skips loudly
    (covered by test_gte_jax_in_build_pipeline, whose tiny arch cannot load
    via AutoModel)."""
    import torch

    from evi_rag_tpu import cli
    from evi_rag_tpu.data.gte_jax import GTEJaxTextEncoder
    from evi_rag_tpu.utils.config import ConfigError, load_config

    d = tmp_path / "gte_tiny"
    d.mkdir()
    cfg = {
        "vocab_size": 64, "hidden_size": 16, "num_hidden_layers": 1,
        "num_attention_heads": 2, "intermediate_size": 24, "type_vocab_size": 2,
        "rope_theta": 160000.0, "layer_norm_eps": 1e-12, "hidden_act": "gelu",
        "model_type": "new",
    }
    (d / "config.json").write_text(json.dumps(cfg))
    _write_tokenizer(d, 64)
    torch.manual_seed(3)
    torch.save(_torch_new_model(cfg).state_dict(), d / "pytorch_model.bin")

    import pyarrow as pa
    import pyarrow.parquet as pq

    raw = tmp_path / "raw"
    raw.mkdir()
    pq.write_table(pa.Table.from_pylist([
        {"id": "t0", "question": "who directed the film",
         "answer": ["berlin"], "q_entity": ["film"], "a_entity": ["berlin"],
         "graph": [["film", "rel.directed", "berlin"]]},
    ]), raw / "train-0.parquet")

    configs = str(pathlib.Path(__file__).resolve().parents[1] / "configs")
    c = load_config(
        configs, "build",
        [
            f"build.raw_root={raw}", f"build.out_dir={tmp_path}/norm",
            "build.encoder.kind=gte_jax", f"build.encoder.model_path={d}",
        ],
    )
    c["task_name"] = "build"
    c.setdefault("paths", {})["log_dir"] = str(tmp_path / "logs")
    rd = tmp_path / "run"
    rd.mkdir()

    # Diverging port => hard refusal before any artifact is written.
    monkeypatch.setattr(GTEJaxTextEncoder, "parity_check", lambda self, p, t: 0.42)
    with pytest.raises(ConfigError, match="parity FAILED"):
        cli.task_build.__wrapped__(c, run_dir=rd)

    # Passing port => build proceeds.
    monkeypatch.setattr(GTEJaxTextEncoder, "parity_check", lambda self, p, t: 0.99999)
    m = cli.task_build.__wrapped__(c, run_dir=rd)
    assert m["num_entities"] == 2
