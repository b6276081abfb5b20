"""FlaxHFTextEncoder against a locally-constructed tiny BERT (no downloads)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_model_dir(tmp_path_factory):
    from transformers import BertConfig, BertTokenizerFast, FlaxBertModel

    d = tmp_path_factory.mktemp("tiny_bert")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "hello", "world", "graph", "question"]
    (d / "vocab.txt").write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(d / "vocab.txt"), do_lower_case=True)
    tok.save_pretrained(d)
    cfg = BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=64, max_position_embeddings=64,
    )
    model = FlaxBertModel(cfg, seed=0)
    model.save_pretrained(d)
    return str(d)


def test_flax_hf_encoder_mean_pooling(tiny_model_dir):
    from evi_rag_tpu.data.text_encoder import FlaxHFTextEncoder

    enc = FlaxHFTextEncoder(tiny_model_dir, max_length=16)
    assert enc.dim == 32
    out = enc.encode(["hello world", "graph question", "hello world"], batch_size=4)
    assert out.shape == (3, 32)
    assert np.isfinite(out).all()
    # Deterministic + identical inputs agree.
    np.testing.assert_allclose(out[0], out[2], rtol=1e-5)
    # Mean pooling respects the attention mask: padded positions must not
    # change the embedding (compare against a longer max_length run).
    enc2 = FlaxHFTextEncoder(tiny_model_dir, max_length=32)
    out2 = enc2.encode(["hello world"], batch_size=4)
    np.testing.assert_allclose(out[0], out2[0], rtol=1e-4, atol=1e-5)


def test_flax_hf_encoder_to_memmap(tiny_model_dir, tmp_path):
    from evi_rag_tpu.data.text_encoder import FlaxHFTextEncoder, encode_to_memmap

    enc = FlaxHFTextEncoder(tiny_model_dir, max_length=8)
    arr = encode_to_memmap(enc, ["hello", "world"], tmp_path / "e.npy")
    assert arr.shape == (3, 32)
    np.testing.assert_array_equal(arr[0], 0.0)
    assert np.abs(arr[1:]).sum() > 0
