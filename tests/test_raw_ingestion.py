"""Schema-verbatim raw-parquet ingestion fixtures for all four dataset
families (reference ``scripts/build_retrieval_pipeline.py:1058-1137`` +
``configs/dataset/{webqsp,cwq,gtsqa,kgqagen}.yaml``).

The fixtures use the exact HF RoG arrow column types (``graph`` as
list<list<string>>, list<string> entity fields, scalar-or-list answers),
so the moment the real WebQSP/CWQ parquet lands, the only untested step is
the download."""

import json
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from evi_rag_tpu.data.pipeline import (
    PipelineConfig,
    SplitFilter,
    TextEntityPolicy,
    build_pipeline,
    has_connectivity,
    load_retrieval_split,
    normalize_entity_with_lookup,
    read_raw_parquet,
    should_keep_sample,
)
from evi_rag_tpu.data.text_encoder import HashTextEncoder

CONFIGS = str(pathlib.Path(__file__).resolve().parents[1] / "configs")

# Exact HF RoG-webqsp/cwq arrow schema (nested graph triples, choices col).
ROG_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("question", pa.string()),
        ("answer", pa.list_(pa.string())),
        ("q_entity", pa.list_(pa.string())),
        ("a_entity", pa.list_(pa.string())),
        ("graph", pa.list_(pa.list_(pa.string()))),
        ("choices", pa.list_(pa.string())),
    ]
)

GTSQA_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("question", pa.string()),
        ("all_answers_wikidata", pa.list_(pa.string())),
        ("seed_entities", pa.list_(pa.string())),
        ("answer_node", pa.list_(pa.string())),
        ("graph", pa.list_(pa.list_(pa.string()))),
        ("answer_subgraph", pa.list_(pa.list_(pa.string()))),
        ("graph_isomorphism", pa.string()),
        ("redundant", pa.bool_()),
        ("test_type", pa.list_(pa.string())),
    ]
)

KGQAGEN_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("question", pa.string()),
        ("answer", pa.list_(pa.string())),
        ("seed", pa.list_(pa.string())),
        ("proof", pa.list_(pa.list_(pa.string()))),
    ]
)


def _write(path: pathlib.Path, rows: list[dict], schema: pa.Schema) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)


def _webqsp_rows():
    # Freebase style: m./g. ids are CVTs (non-text); names are text.
    return [
        {
            "id": "WebQTrn-0",
            "question": "who directed film x",
            "answer": ["Alice Smith"],
            "q_entity": ["Film X"],
            "a_entity": ["Alice Smith"],
            "graph": [
                ["Film X", "film.film.directed_by", "m.0abc1"],
                ["m.0abc1", "type.object.name", "Alice Smith"],
                ["Film X", "film.film.genre", "Drama"],
            ],
            "choices": [],
        },
        {
            "id": "WebQTrn-1",
            "question": "unanswerable",
            "answer": ["Nobody"],
            "q_entity": ["Film Y"],
            "a_entity": ["Nobody"],  # not in graph
            "graph": [["Film Y", "film.film.genre", "Comedy"]],
            "choices": [],
        },
    ]


def _make_webqsp_raw(tmp_path: pathlib.Path) -> pathlib.Path:
    raw = tmp_path / "raw"
    rows = _webqsp_rows()
    _write(raw / "train-00000-of-00002.parquet", rows, ROG_SCHEMA)
    _write(raw / "train-00001-of-00002.parquet", [rows[0] | {"id": "WebQTrn-2"}], ROG_SCHEMA)
    _write(
        raw / "validation-00000-of-00001.parquet",
        [rows[0] | {"id": "WebQVal-0"}],
        ROG_SCHEMA,
    )
    _write(raw / "test-00000-of-00001.parquet", [rows[0] | {"id": "WebQTest-0"}], ROG_SCHEMA)
    return raw


def test_webqsp_rog_schema_roundtrip(tmp_path):
    raw = _make_webqsp_raw(tmp_path)
    samples = list(read_raw_parquet(raw, "webqsp"))
    assert sorted({s.split for s in samples}) == ["test", "train", "validation"]
    train = [s for s in samples if s.split == "train"]
    assert [s.question_id for s in train] == ["WebQTrn-0", "WebQTrn-1", "WebQTrn-2"]
    s0 = train[0]
    assert s0.graph[0] == ("Film X", "film.film.directed_by", "m.0abc1")
    assert s0.answer_texts == ["Alice Smith"]
    assert s0.q_entity == ["Film X"] and s0.a_entity == ["Alice Smith"]


def test_webqsp_build_trains_and_evals(tmp_path):
    """Full CLI chain on the schema-verbatim fixture: build -> train ->
    eval with ranking metrics (the 'one command from real WebQSP' check)."""
    from evi_rag_tpu import cli
    from evi_rag_tpu.utils.config import load_config

    raw = _make_webqsp_raw(tmp_path)
    out = tmp_path / "normalized"

    def run(task, overrides):
        c = load_config(CONFIGS, task, overrides)
        c["task_name"] = task
        c.setdefault("paths", {})["log_dir"] = str(tmp_path / "logs")
        rd = tmp_path / "runs" / task
        rd.mkdir(parents=True, exist_ok=True)
        return cli.TASKS[task](c, run_dir=rd)

    m = run(
        "build",
        [
            "build=webqsp",
            f"build.raw_root={raw}",
            f"build.out_dir={out}",
            "build.encoder.dim=32",
        ],
    )
    # Freebase CVT m.0abc1 is non-text under the reference regex.
    assert m["num_text_entities"] < m["num_entities"]
    assert (out / "sub_filter.json").exists()

    m2 = run(
        "train_retriever",
        [
            "dataset.source=normalized",
            f"dataset.normalized_dir={out}",
            "dataset.name=webqsp-fixture-sub",
            "dataset.filter=sub_filter.json",
            "retriever.model.hidden_dim=16",
            "retriever.model.emb_dim=auto",
            "retriever.train.max_epochs=1",
            "retriever.train.per_shard_batch=2",
            "retriever.train.k_values=[1,2]",
            "retriever.train.monitor=edge/recall@2",
            f"retriever.train.ckpt_dir={tmp_path}/ckpt",
        ],
    )
    assert m2["epochs"] >= 1
    m3 = run(
        "eval_retriever",
        [
            "dataset.source=normalized",
            f"dataset.normalized_dir={out}",
            "dataset.name=webqsp-fixture-sub",
            f"retriever.ckpt={tmp_path}/ckpt/best",
            "retriever.model.hidden_dim=16",
            "retriever.model.emb_dim=auto",
            "eval.splits=[validation]",
            "eval.write_artifacts=false",
            "retriever.train.k_values=[1,2]",
        ],
    )
    assert "validation/ranking/mrr" in m3


def test_kgqagen_qid_normalization(tmp_path):
    raw = tmp_path / "raw"
    rows = [
        {
            "id": "kg-0",
            "question": "capital of country q1",
            "answer": ["City A (Q2)"],
            "seed": ["Country B"],  # label-only: resolved via graph mentions
            "proof": [
                ["Country B (Q1)", "capital", "City A (Q2)"],
                ["City A (Q2)", "population", "5 million"],
            ],
        }
    ]
    _write(raw / "train-00000-of-00001.parquet", rows, KGQAGEN_SCHEMA)
    samples = list(
        read_raw_parquet(
            raw,
            "kgqagen",
            column_map={
                "question_id_field": "id",
                "question_field": "question",
                "answer_text_field": "answer",
                "q_entity_field": "seed",
                "a_entity_field": "answer",
                "graph_field": "proof",
            },
            entity_normalization="qid_in_parentheses",
        )
    )
    (s,) = samples
    # Graph nodes normalize "Label (Qxxx)" -> QID.
    assert s.graph[0] == ("Q1", "capital", "Q2")
    # The label-only seed resolves through the harvested label->QID map.
    assert s.q_entity == ["Q1"]
    assert s.a_entity == ["Q2"]
    # Non-QID tail stays verbatim.
    assert s.graph[1][2] == "5 million"
    # Raw answer text is preserved for the reasoner.
    assert s.answer_texts == ["City A (Q2)"]


def test_gtsqa_extras_and_answer_subgraph_priority(tmp_path):
    raw = tmp_path / "raw"
    rows = [
        {
            "id": "gt-0",
            "question": "which award",
            "all_answers_wikidata": ["Award X"],
            "seed_entities": ["Q10"],
            "answer_node": ["Q20"],
            "graph": [
                ["Q10", "P1", "Q20"],      # direct 1-hop path
                ["Q10", "P2", "Q30"],
                ["Q30", "P3", "Q20"],      # alternative 2-hop path
            ],
            "answer_subgraph": [["Q10", "P2", "Q30"], ["Q30", "P3", "Q20"]],
            "graph_isomorphism": "path",
            "redundant": False,
            "test_type": ["zero_shot"],
        }
    ]
    _write(raw / "test-00000-of-00001.parquet", rows, GTSQA_SCHEMA)
    cmap = {
        "question_id_field": "id",
        "question_field": "question",
        "answer_text_field": "all_answers_wikidata",
        "q_entity_field": "seed_entities",
        "a_entity_field": "answer_node",
        "graph_field": "graph",
        "answer_subgraph_field": "answer_subgraph",
        "graph_iso_field": "graph_isomorphism",
        "redundant_field": "redundant",
        "test_type_field": "test_type",
    }
    (s,) = list(read_raw_parquet(raw, "gtsqa", column_map=cmap))
    assert s.answer_subgraph == [("Q10", "P2", "Q30"), ("Q30", "P3", "Q20")]
    assert s.graph_iso_type == "path" and s.redundant is False
    assert s.test_type == ["zero_shot"]

    # Build: labeling must prefer the GT answer_subgraph edges over the
    # shorter direct edge (reference answer-subgraph priority,
    # build_retrieval_pipeline.py:1450-1603).
    out = tmp_path / "norm"
    build_pipeline(
        PipelineConfig(
            dataset="gtsqa",
            raw_root=str(raw),
            out_dir=str(out),
            text_policy=TextEntityPolicy(mode="regex", match_regex=r"^(?!Q\d+|P\d+).+"),
        ),
        HashTextEncoder(dim=16),
        column_map=cmap,
    )
    samples, _ = load_retrieval_split(out, "test")
    (rs,) = samples
    labeled = set(np.nonzero(rs.edge_labels)[0].tolist())
    assert labeled == {1, 2}, "answer_subgraph edges must carry the labels"
    # GTSQA extras survive into questions.parquet.
    qt = pq.read_table(out / "questions.parquet").to_pylist()
    assert qt[0]["graph_iso_type"] == "path"
    assert qt[0]["answer_texts"] == ["Award X"]


def test_scalar_answer_and_split_filters(tmp_path):
    raw = tmp_path / "raw"
    schema = pa.schema(
        [
            ("id", pa.string()),
            ("question", pa.string()),
            ("answer", pa.string()),  # scalar answer column variant
            ("q_entity", pa.list_(pa.string())),
            ("a_entity", pa.list_(pa.string())),
            ("graph", pa.list_(pa.list_(pa.string()))),
        ]
    )
    rows = [
        {
            "id": "a",
            "question": "q",
            "answer": "only answer",
            "q_entity": ["X"],
            "a_entity": ["Y"],
            "graph": [["X", "r", "Y"]],
        },
        {
            "id": "b",
            "question": "q2",
            "answer": "none",
            "q_entity": ["X"],
            "a_entity": ["Z"],  # Z absent from graph
            "graph": [["X", "r", "Y"]],
        },
    ]
    _write(raw / "train-00000-of-00001.parquet", rows, schema)
    samples = list(read_raw_parquet(raw, "toy"))
    assert samples[0].answer_texts == ["only answer"]  # scalar coerced

    keep = SplitFilter(skip_no_ans=True, skip_no_path=True)
    assert should_keep_sample(samples[0], keep)
    assert not should_keep_sample(samples[1], keep)
    assert has_connectivity(samples[0].graph, ["X"], ["Y"])
    assert not has_connectivity(samples[0].graph, ["X"], ["Z"])
    # Directed mode: Y cannot reach X.
    assert not has_connectivity(samples[0].graph, ["Y"], ["X"], path_mode="directed")

    out = tmp_path / "norm"
    res = build_pipeline(
        PipelineConfig(
            dataset="toy",
            raw_root=str(raw),
            out_dir=str(out),
            train_filter=keep,
        ),
        HashTextEncoder(dim=16),
    )
    assert res.counts["filtered"] == {"train": 1}
    assert res.counts["kept"] == {"train": 1}
    store_samples, _ = load_retrieval_split(out, "train")
    assert len(store_samples) == 1


def test_normalize_entity_lookup_unit():
    lut = {"Berlin": "Q64"}
    assert normalize_entity_with_lookup("Berlin (Q64)", "qid_in_parentheses", {}) == "Q64"
    assert normalize_entity_with_lookup("Berlin", "qid_in_parentheses", lut) == "Q64"
    assert normalize_entity_with_lookup("Berlin", "none", lut) == "Berlin"
    assert normalize_entity_with_lookup("Unknown", "qid_in_parentheses", {}) == "Unknown"


def test_answer_texts_in_store(tmp_path):
    raw = _make_webqsp_raw(tmp_path)
    out = tmp_path / "norm"
    build_pipeline(
        PipelineConfig(dataset="webqsp", raw_root=str(raw), out_dir=str(out)),
        HashTextEncoder(dim=16),
    )
    from evi_rag_tpu.data.store import SampleStore

    store = SampleStore(out / "materialized" / "train", expected_artifact="g_retrieval")
    rec = store.get(store.ids[0])
    assert json.loads(rec["answer_texts"]) == ["Alice Smith"]
