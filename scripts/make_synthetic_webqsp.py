"""Generate a WebQSP-*scale* synthetic raw dataset in the exact RoG parquet
schema the ingestion layer consumes (VERDICT r3 next-round #4).

The real WebQSP parquet is absent from this container, so quality numbers
have topped out at a 288-question toy set.  This generator matches the
statistics that stress the system -- question count (~4.7k: 2,826 train /
246 validation / 1,628 test, the reference split sizes), a shared Freebase-
style global entity pool (entities recur across questions, exercising vocab
dedup + embedding-table residency), CVT ``m./g.`` non-text nodes, and a
log-normal subgraph edge-count distribution (median ~1.2k triples, p95 ~4k,
like the RoG-materialized WebQSP subgraphs) -- while staying fully synthetic.

Schema + normalization contract: reference ``scripts/text_encode_utils.py``
consumers and ``configs/dataset/webqsp.yaml`` (column_map id/question/answer/
q_entity/a_entity/graph); our reader is ``evi_rag_tpu/data/pipeline.py::
read_raw_parquet`` with the fixture-proven ROG schema
(tests/test_raw_ingestion.py).

Usage:
    python scripts/make_synthetic_webqsp.py [--out data/raw/webqsp_synth]
        [--train 2826] [--validation 246] [--test 1628]
        [--pool 120000] [--relations 600] [--seed 0]
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

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

_DOMAINS = ("film", "people", "location", "sports", "music", "government",
            "business", "education", "medicine", "award")
_PROPS = ("contained_by", "directed_by", "member_of", "born_in", "works_for",
          "plays_for", "capital_of", "genre", "spouse", "nationality",
          "parent", "founded", "position", "language", "currency")


def _entity_pool(n: int, rng: np.random.Generator) -> tuple[np.ndarray, np.ndarray]:
    """Global entity names: ~25% CVT-style m./g. ids (non-text per the
    webqsp text_regex '^(?!m\\.|g\\.).*'), the rest readable names."""
    is_cvt = rng.random(n) < 0.25
    names = np.empty(n, dtype=object)
    for i in range(n):
        if is_cvt[i]:
            names[i] = f"{'m' if rng.random() < 0.8 else 'g'}.0{i:06x}"
        else:
            names[i] = f"Entity {i} {_DOMAINS[i % len(_DOMAINS)].title()}"
    return names, is_cvt


def _relation_pool(n: int, rng: np.random.Generator) -> np.ndarray:
    rels = np.empty(n, dtype=object)
    for i in range(n):
        d = _DOMAINS[rng.integers(len(_DOMAINS))]
        t = _DOMAINS[rng.integers(len(_DOMAINS))]
        p = _PROPS[rng.integers(len(_PROPS))]
        rels[i] = f"{d}.{t}.{p}_{i}"
    return rels


def _edge_count(rng: np.random.Generator, cap: int) -> int:
    # Log-normal tuned to median ~1.2k, p95 ~4k (RoG WebQSP-like).
    return int(np.clip(rng.lognormal(mean=7.1, sigma=0.75), 24, cap))


def make_question(
    qid: str,
    rng: np.random.Generator,
    ent_names: np.ndarray,
    rel_names: np.ndarray,
    *,
    edge_cap: int,
) -> dict:
    n_edges = _edge_count(rng, edge_cap)
    # Node pool scales sub-linearly with edges (graphs get denser as they
    # grow, matching KG neighborhoods).
    n_nodes = max(8, int(n_edges ** 0.78))
    node_ids = rng.choice(len(ent_names), size=n_nodes, replace=False)

    # Plant 1-2 hop ground-truth paths from 1-2 topic entities to 1-3
    # answers (WebQSP is 1-2 hop; ~40% multi-answer).
    n_topics = 1 if rng.random() < 0.85 else 2
    n_answers = 1 + (rng.random() < 0.4) + (rng.random() < 0.15)
    hops = 1 if rng.random() < 0.6 else 2
    topics = node_ids[:n_topics]
    answers = node_ids[n_topics : n_topics + n_answers]
    mids = node_ids[n_topics + n_answers : n_topics + n_answers + n_answers]

    triples: list[list[str]] = []
    seen: set[tuple[int, int, int]] = set()

    def add(h: int, r: int, t: int) -> None:
        if h != t and (h, r, t) not in seen:
            seen.add((h, r, t))
            triples.append([str(ent_names[h]), str(rel_names[r]), str(ent_names[t])])

    gold_rel = rng.integers(len(rel_names), size=4)
    for a_i, a in enumerate(answers):
        t = topics[a_i % n_topics]
        if hops == 1:
            add(t, gold_rel[0], a)
        else:
            m = mids[a_i % max(len(mids), 1)] if len(mids) else a
            add(t, gold_rel[1], m)
            add(m, gold_rel[2], a)

    # Distractors: preferential attachment around topic/answer neighborhoods
    # (~60%) + uniform background (~40%), like KG ego-nets.
    hot = np.concatenate([topics, answers, mids[: len(answers)]])
    while len(triples) < n_edges:
        batch = min(1024, n_edges - len(triples))
        h_hot = rng.random(batch) < 0.35
        hs = np.where(h_hot, rng.choice(hot, size=batch),
                      node_ids[rng.integers(n_nodes, size=batch)])
        ts = node_ids[rng.integers(n_nodes, size=batch)]
        rs = rng.integers(len(rel_names), size=batch)
        for h, r, t in zip(hs, rs, ts):
            add(int(h), int(r), int(t))

    q_text = f"synthetic question {qid} about {ent_names[topics[0]]}?"
    return {
        "id": qid,
        "question": q_text,
        "answer": [str(ent_names[a]) for a in answers],
        "q_entity": [str(ent_names[t]) for t in topics],
        "a_entity": [str(ent_names[a]) for a in answers],
        "graph": triples,
        "choices": [],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/raw/webqsp_synth")
    ap.add_argument("--train", type=int, default=2826)
    ap.add_argument("--validation", type=int, default=246)
    ap.add_argument("--test", type=int, default=1628)
    ap.add_argument("--pool", type=int, default=120_000)
    ap.add_argument("--relations", type=int, default=600)
    ap.add_argument("--edge-cap", type=int, default=6144)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shard-rows", type=int, default=512)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    ent_names, _ = _entity_pool(args.pool, rng)
    rel_names = _relation_pool(args.relations, rng)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    total_triples = 0
    prefix = {"train": "WebQTrn", "validation": "WebQVal", "test": "WebQTest"}
    for split, count in (("train", args.train), ("validation", args.validation),
                         ("test", args.test)):
        rows, shard = [], 0
        n_shards = -(-count // args.shard_rows)
        for i in range(count):
            rows.append(make_question(
                f"{prefix[split]}-{i}", rng, ent_names, rel_names,
                edge_cap=args.edge_cap,
            ))
            total_triples += len(rows[-1]["graph"])
            if len(rows) >= args.shard_rows or i == count - 1:
                pq.write_table(
                    pa.Table.from_pylist(rows, schema=ROG_SCHEMA),
                    out / f"{split}-{shard:05d}-of-{n_shards:05d}.parquet",
                )
                rows, shard = [], shard + 1
        print(f"{split}: {count} questions -> {shard} shards")
    print(f"total triples: {total_triples:,} under {out}")


if __name__ == "__main__":
    main()
