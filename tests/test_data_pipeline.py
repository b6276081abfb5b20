"""Store codec, text encoders, and the end-to-end build pipeline."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from evi_rag_tpu.data.pipeline import (
    PipelineConfig,
    TextEntityPolicy,
    build_pipeline,
    load_retrieval_split,
)
from evi_rag_tpu.data.store import (
    SampleStore,
    SampleStoreWriter,
    decode_record,
    encode_record,
)
from evi_rag_tpu.data.text_encoder import HashTextEncoder, encode_to_memmap


def test_record_codec_roundtrip():
    rec = {
        "arr_f": np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32),
        "arr_i": np.arange(5, dtype=np.int64),
        "empty": np.zeros((0,), np.int32),
        "text": "héllo world",
        "flag": True,
        "n": 42,
        "x": 2.5,
        "blob": b"\x00\x01\x02",
        "listy": [1, 2, 3],
    }
    out = decode_record(encode_record(rec))
    np.testing.assert_array_equal(out["arr_f"], rec["arr_f"])
    np.testing.assert_array_equal(out["arr_i"], rec["arr_i"])
    assert out["empty"].shape == (0,)
    assert out["text"] == rec["text"]
    assert out["flag"] is True and out["n"] == 42 and out["x"] == 2.5
    assert out["blob"] == rec["blob"]
    np.testing.assert_array_equal(out["listy"], [1, 2, 3])


def test_store_write_read_atomic(tmp_path):
    path = tmp_path / "store"
    w = SampleStoreWriter(path)
    w.add("a", {"x": np.ones(3)})
    w.add("b", {"x": np.zeros(2)})
    assert not path.exists()  # staged in .tmp until finalize
    w.finalize(artifact="test_store", extra={"dataset": "t"})
    assert path.exists() and not path.with_name("store.tmp").exists()

    store = SampleStore(path, expected_artifact="test_store")
    assert len(store) == 2 and "a" in store
    np.testing.assert_array_equal(store.get("a")["x"], np.ones(3))
    with pytest.raises(KeyError):
        store.get("missing")
    with pytest.raises(ValueError, match="artifact mismatch"):
        SampleStore(path, expected_artifact="other")


def test_hash_encoder_deterministic():
    enc = HashTextEncoder(dim=64)
    a = enc.encode(["barack obama", "barack obama", "paris france"])
    np.testing.assert_array_equal(a[0], a[1])
    assert abs(a[0] @ a[2]) < 0.9  # different strings differ
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)


def test_encode_to_memmap_row0(tmp_path):
    enc = HashTextEncoder(dim=16)
    arr = encode_to_memmap(enc, ["x", "y"], tmp_path / "emb.npy")
    assert arr.shape == (3, 16)
    np.testing.assert_array_equal(arr[0], 0.0)
    loaded = np.load(tmp_path / "emb.npy")
    np.testing.assert_array_equal(loaded, arr)


def _write_raw(tmp_path):
    rows = [
        {
            "id": "q0",
            "question": "who directed inception",
            "q_entity": ["Inception"],
            "a_entity": ["Christopher Nolan"],
            "graph": [
                ["Inception", "directed_by", "Christopher Nolan"],
                ["Inception", "starring", "Leonardo DiCaprio"],
                ["Christopher Nolan", "born_in", "m.london"],
                ["Inception", "self", "Inception"],  # self-loop: removed
                ["Inception", "directed_by", "Christopher Nolan"],  # dup: removed
            ],
        },
        {
            "id": "q1",
            "question": "empty graph sample",
            "q_entity": ["X"],
            "a_entity": ["Y"],
            "graph": [],
        },
        {
            "id": "q2",
            "question": "unreachable answer",
            "q_entity": ["A"],
            "a_entity": ["Zed"],
            "graph": [["A", "r", "B"], ["C", "r", "Zed"]],
        },
    ]
    pq.write_table(pa.Table.from_pylist(rows), tmp_path / "train-00000.parquet")
    test_rows = [dict(rows[0], id="t0")]
    pq.write_table(pa.Table.from_pylist(test_rows), tmp_path / "test-00000.parquet")


def test_build_pipeline_end_to_end(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    _write_raw(raw)
    out = tmp_path / "normalized"
    cfg = PipelineConfig(
        dataset="toy",
        raw_root=str(raw),
        out_dir=str(out),
        text_policy=TextEntityPolicy(mode="exclude_regex", exclude_regex=r"^m\."),
    )
    enc = HashTextEncoder(dim=32)
    res = build_pipeline(cfg, enc)

    assert res.counts["total"]["train"] == 3
    assert res.counts["kept"]["train"] == 2  # empty graph dropped
    # Vocab: m.london is non-text.
    ents = pq.read_table(out / "entity_vocab.parquet").to_pylist()
    by_id = {e["kg_id"]: e for e in ents}
    assert by_id["m.london"]["is_text"] is False
    assert by_id["m.london"]["embedding_id"] == 0
    assert by_id["Inception"]["embedding_id"] > 0
    assert res.num_text_entities == len([e for e in ents if e["is_text"]])

    # Embedding tables: rows = text entities + reserved row0.
    emb = np.load(out / "embeddings" / "entity_embeddings.npy")
    assert emb.shape == (res.num_text_entities + 1, 32)

    # Filters.
    sub = json.loads((out / "sub_filter.json").read_text())
    assert "toy/train/q0" in sub["sample_ids"]
    assert "toy/train/q2" not in sub["sample_ids"]  # no path
    nz = json.loads((out / "nonzero_positive_filter.json").read_text())
    assert "toy/train/q0" in nz["sample_ids"]
    assert "toy/train/q2" not in nz["sample_ids"]

    # Materialized store loads back as collate-ready samples.
    samples, q_emb = load_retrieval_split(out, "train")
    assert len(samples) == 2 and q_emb.shape == (2, 32)
    s0 = next(s for s in samples if s.sample_id.endswith("q0"))
    # Self-loop and duplicate removed: 3 unique non-loop edges.
    assert s0.edge_index.shape[1] == 3
    assert s0.edge_labels.sum() == 1  # only the directed_by edge is on the path
    assert s0.pair_shortest_len.tolist() == [1]
    # Filter application.
    only_sub, _ = load_retrieval_split(out, "train", filter_ids=set(sub["sample_ids"]))
    assert [s.sample_id for s in only_sub] == ["toy/train/q0"]

    # Test split exists as well.
    test_samples, _ = load_retrieval_split(out, "test")
    assert len(test_samples) == 1


def test_pipeline_answer_subgraph_priority(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    rows = [
        {
            "id": "q0",
            "question": "q",
            "q_entity": ["A"],
            "a_entity": ["C"],
            # Two A->C paths; the answer_subgraph names only the B route.
            "graph": [["A", "r1", "B"], ["B", "r2", "C"], ["A", "r3", "C"]],
            "answer_subgraph": [["A", "r1", "B"], ["B", "r2", "C"]],
        }
    ]
    pq.write_table(pa.Table.from_pylist(rows), raw / "train-0.parquet")
    out = tmp_path / "norm"
    build_pipeline(
        PipelineConfig(dataset="toy", raw_root=str(raw), out_dir=str(out)),
        HashTextEncoder(dim=16),
    )
    samples, _ = load_retrieval_split(out, "train")
    s = samples[0]
    # Positives restricted to the answer_subgraph shortest path (2 edges),
    # NOT the direct A->C shortcut.
    assert s.edge_labels.tolist() == [True, True, False]


def test_prefetch_yields_and_propagates_errors():
    from evi_rag_tpu.data.feeder import prefetch

    assert list(prefetch(iter(range(5)), size=2)) == [0, 1, 2, 3, 4]

    def boom():
        yield 1
        raise RuntimeError("collate failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="collate failed"):
        list(it)


def test_build_pipeline_with_workers(tmp_path):
    """The ProcessPoolExecutor graph-build path matches the serial path."""
    raw = tmp_path / "raw"
    raw.mkdir()
    _write_raw(raw)
    serial = tmp_path / "serial"
    par = tmp_path / "par"
    enc = HashTextEncoder(dim=16)
    build_pipeline(PipelineConfig(dataset="toy", raw_root=str(raw), out_dir=str(serial)), enc)
    build_pipeline(
        PipelineConfig(dataset="toy", raw_root=str(raw), out_dir=str(par), num_workers=2), enc
    )
    s1, _ = load_retrieval_split(serial, "train")
    s2, _ = load_retrieval_split(par, "train")
    assert len(s1) == len(s2)
    for a, b in zip(s1, s2):
        assert a.sample_id == b.sample_id
        np.testing.assert_array_equal(a.edge_index, b.edge_index)
        np.testing.assert_array_equal(a.edge_labels, b.edge_labels)


def test_manifest_validation(tmp_path):
    from evi_rag_tpu.eval.artifacts import validate_manifest, write_manifest

    d = tmp_path / "art"
    d.mkdir()
    (d / "test.jsonl").write_text("{}\n")
    write_manifest(d, artifact="eval_bfs", filename="test.jsonl", split="test")
    m = validate_manifest(d, artifact="eval_bfs", split="test")
    assert m["split"] == "test"
    with pytest.raises(ValueError, match="artifact"):
        validate_manifest(d, artifact="wrong", split="test")
    with pytest.raises(FileNotFoundError):
        validate_manifest(d, artifact="eval_bfs", split="validation")
    (d / "test.jsonl").unlink()
    with pytest.raises(FileNotFoundError, match="missing file"):
        validate_manifest(d, artifact="eval_bfs", split="test")
