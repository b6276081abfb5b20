"""Frozen text encoders for entity/relation/question embeddings.

Replaces the reference's torch-CUDA ``TextEncoder`` (``scripts/
text_encode_utils.py:13-112``): HF AutoModel + mean pooling over valid
tokens, streamed to a memmap.  Two implementations:

* ``FlaxHFTextEncoder`` -- the production path: a Flax HF checkpoint
  (default geometry: ``Alibaba-NLP/gte-large-en-v1.5``-style, 1024-d)
  executed under jit in padded length buckets with attention-mask mean
  pooling on device.  Model weights must be available locally (this
  environment has no egress), so construction takes an explicit path.
* ``HashTextEncoder`` -- a deterministic, dependency-free featurizer
  (token n-gram feature hashing -> unit-norm D-dim vectors) used in tests
  and offline builds.  Similar strings get similar vectors, which is all
  the pipeline-level tests require.

Both expose ``encode(texts) -> [N, D] float32`` and stream through
``encode_to_memmap`` with the reference's row-0 convention: row 0 is
reserved (zeros) for non-text entities.
"""

from __future__ import annotations

import hashlib
import pathlib
from typing import Protocol, Sequence

import numpy as np


class TextEncoder(Protocol):
    dim: int

    def encode(self, texts: Sequence[str], *, batch_size: int = 256) -> np.ndarray: ...


class HashTextEncoder:
    """Deterministic feature-hashing encoder (offline/test fallback)."""

    def __init__(self, dim: int = 256, *, ngram: int = 3, seed: int = 0) -> None:
        self.dim = int(dim)
        self.ngram = int(ngram)
        self.seed = int(seed)

    def _features(self, text: str) -> np.ndarray:
        v = np.zeros(self.dim, dtype=np.float32)
        toks = text.lower().split()
        grams = list(toks)
        joined = " ".join(toks)
        grams += [joined[i : i + self.ngram] for i in range(max(len(joined) - self.ngram + 1, 0))]
        for g in grams:
            h = hashlib.blake2b(f"{self.seed}:{g}".encode(), digest_size=8).digest()
            idx = int.from_bytes(h[:4], "little") % self.dim
            sign = 1.0 if h[4] & 1 else -1.0
            v[idx] += sign
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    def encode(self, texts: Sequence[str], *, batch_size: int = 256) -> np.ndarray:
        return np.stack([self._features(t) for t in texts]) if texts else np.zeros((0, self.dim), np.float32)


class TorchHFTextEncoder:
    """The reference encoder verbatim: torch AutoModel + attention-mask mean
    pooling (``scripts/text_encode_utils.py:13-67``).  This is the
    guaranteed-correct path for ``trust_remote_code`` architectures like
    ``Alibaba-NLP/gte-large-en-v1.5`` that have no Flax port — the offline
    build stage is host-side, so a CPU torch forward is acceptable there;
    the TPU-native alternative is ``data/gte_jax.py``."""

    def __init__(
        self,
        model_path: str,
        *,
        max_length: int = 64,
        trust_remote_code: bool = True,
        device: str = "cpu",
    ) -> None:
        import torch
        from transformers import AutoModel, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(
            model_path, trust_remote_code=trust_remote_code
        )
        self.model = AutoModel.from_pretrained(
            model_path, trust_remote_code=trust_remote_code
        ).to(device)
        self.model.eval()
        self.device = device
        self.max_length = int(max_length)
        self.dim = int(self.model.config.hidden_size)
        self._torch = torch

    def encode(self, texts: Sequence[str], *, batch_size: int = 256) -> np.ndarray:
        torch = self._torch
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        with torch.no_grad():
            for i in range(0, len(texts), batch_size):
                chunk = list(texts[i : i + batch_size])
                toks = self.tokenizer(
                    chunk,
                    padding=True,
                    truncation=True,
                    max_length=self.max_length,
                    return_tensors="pt",
                ).to(self.device)
                hidden = self.model(**toks).last_hidden_state
                mask = toks["attention_mask"].unsqueeze(-1).to(hidden.dtype)
                emb = (hidden * mask).sum(1) / mask.sum(1).clamp(min=1.0)
                out[i : i + len(chunk)] = emb.float().cpu().numpy()
        return out


class FlaxHFTextEncoder:
    """Mean-pooled frozen HF encoder on TPU via Flax (jit + length buckets).

    ``from_pt=True`` converts a torch-only checkpoint's weights on load
    (works for any architecture with a Flax port, e.g. the BERT family)."""

    def __init__(
        self,
        model_path: str,
        *,
        max_length: int = 64,
        dtype: str = "float32",
        from_pt: bool = False,
    ) -> None:
        import jax
        from transformers import AutoTokenizer, FlaxAutoModel

        self.tokenizer = AutoTokenizer.from_pretrained(model_path)
        self.model = FlaxAutoModel.from_pretrained(
            model_path, trust_remote_code=False, from_pt=from_pt
        )
        self.max_length = int(max_length)
        self.dim = int(self.model.config.hidden_size)

        def forward(input_ids, attention_mask):
            out = self.model(input_ids=input_ids, attention_mask=attention_mask)
            hidden = out.last_hidden_state
            mask = attention_mask[..., None].astype(hidden.dtype)
            return (hidden * mask).sum(axis=1) / mask.sum(axis=1).clip(1.0)

        self._forward = jax.jit(forward)

    def encode(self, texts: Sequence[str], *, batch_size: int = 256) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i in range(0, len(texts), batch_size):
            chunk = list(texts[i : i + batch_size])
            # Pad the batch to a fixed size so XLA sees one shape.
            pad = batch_size - len(chunk)
            toks = self.tokenizer(
                chunk + [""] * pad,
                padding="max_length",
                truncation=True,
                max_length=self.max_length,
                return_tensors="np",
            )
            emb = self._forward(toks["input_ids"], toks["attention_mask"])
            out[i : i + len(chunk)] = np.asarray(emb)[: len(chunk)]
        return out


def encode_to_memmap(
    encoder: TextEncoder,
    texts: Sequence[str],
    out_path: str | pathlib.Path,
    *,
    batch_size: int = 256,
    reserve_row0: bool = True,
) -> np.ndarray:
    """Stream-encode into a .npy memmap; row 0 reserved for non-text entities
    (reference ``encode_to_memmap``, ``text_encode_utils.py:70-112``)."""
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    offset = 1 if reserve_row0 else 0
    n = len(texts) + offset
    arr = np.lib.format.open_memmap(
        out_path, mode="w+", dtype=np.float32, shape=(n, encoder.dim)
    )
    if reserve_row0:
        arr[0] = 0.0
    for i in range(0, len(texts), batch_size):
        chunk = list(texts[i : i + batch_size])
        arr[offset + i : offset + i + len(chunk)] = encoder.encode(chunk, batch_size=batch_size)
    arr.flush()
    return arr
