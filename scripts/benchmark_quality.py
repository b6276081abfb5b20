#!/usr/bin/env python
"""Self-measured quality baseline: full pipeline on synthetic KGQA.

The reference publishes no benchmark numbers (BASELINE.md), so the quality
baseline is self-measured: this script trains the retriever, materializes the
agent graphs, trains the GFlowNet, and reports the reference-defined metric
grid (edge recall@k, answer reachability@k, GFlowNet answer_hit@k, oracle
hit/recall@k) on a held-out synthetic split.  Writes
``docs/RESULTS_synthetic.md``.

Usage: python scripts/benchmark_quality.py [--samples 128] [--emb 64]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=128)
    ap.add_argument("--emb", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--out", default="docs/RESULTS_synthetic.md")
    args = ap.parse_args()

    import jax
    import numpy as np

    from evi_rag_tpu.data.feeder import (
        Bucket,
        collate_agent,
        collate_retriever,
        fixed_agent_bucket,
        fixed_bucket_for,
        iter_stacked_batches,
    )
    from evi_rag_tpu.data.g_agent import AgentSettings, build_agent_sample
    from evi_rag_tpu.data.synthetic import make_synthetic_dataset
    from evi_rag_tpu.eval.oracle import aggregate_oracle_metrics, oracle_metrics_for_sample
    from evi_rag_tpu.models.losses import RetrieverLossConfig
    from evi_rag_tpu.models.retriever import Retriever
    from evi_rag_tpu.train.checkpoint import export_retriever_features
    from evi_rag_tpu.train.gflownet_trainer import GFlowNetConfig, fit_gflownet
    from evi_rag_tpu.train.optim import OptimizerConfig
    from evi_rag_tpu.train.retriever_trainer import (
        RetrieverTrainConfig,
        evaluate,
        fit,
        make_eval_step,
    )

    t_start = time.time()
    ks = (1, 5, 10, 25, 50, 100)
    # distractor_relation_overlap < 1 gives the task a clean learnable
    # signal (relation-distinctive answers, like real KGs) so margins and
    # separation are meaningful quality indicators, not just plumbing proof.
    kw = dict(emb_dim=args.emb, max_nodes=32, distractor_relation_overlap=0.15)
    train_ds = make_synthetic_dataset(num_samples=args.samples, seed=0, **kw)
    test_ds = make_synthetic_dataset(num_samples=max(args.samples // 4, 16), seed=100, **kw)
    model = Retriever(emb_dim=args.emb, hidden_dim=args.emb, dropout_p=0.0)
    cfg = RetrieverTrainConfig(
        loss=RetrieverLossConfig(),
        optimizer=OptimizerConfig(name="adamw", learning_rate=3e-3, grad_clip_norm=1.0),
        max_epochs=args.epochs,
        monitor="edge/recall@10",
        k_values=ks,
        patience=args.epochs,
    )
    bucket = fixed_bucket_for(train_ds.samples + test_ds.samples, 8)
    kw_tr = dict(entity_emb=train_ds.entity_emb, relation_emb=train_ds.relation_emb, question_emb=train_ds.question_emb)
    kw_te = dict(entity_emb=test_ds.entity_emb, relation_emb=test_ds.relation_emb, question_emb=test_ds.question_emb)

    def train_batches(epoch):
        return iter_stacked_batches(train_ds.samples, num_shards=1, per_shard_batch=8, bucket=bucket, seed=epoch, **kw_tr)

    def test_batches():
        for i in range(0, len(test_ds.samples), 8):
            yield collate_retriever(test_ds.samples[i : i + 8], bucket=bucket, **kw_te)

    best_params, info = fit(model, cfg, train_batches, test_batches, seed=0)
    eval_step = make_eval_step(model, cfg)
    retr = evaluate(best_params, eval_step, test_batches())

    # g_agent materialization + oracle on the held-out split.
    settings = AgentSettings(edge_top_k=100, max_hops=3, score_mode="node_softmax", allow_empty_answer=True)
    agent_samples = []
    oracle_inputs = []
    i = 0
    for batch in test_batches():
        res = eval_step(best_params, batch)
        scores = np.asarray(res["logits"])
        eb = np.asarray(batch.graph.edge_batch)
        emask = np.asarray(batch.graph.edge_mask)
        for g, s in enumerate(test_ds.samples[i : i + 8]):
            sel = np.nonzero((eb == g) & emask)[0]
            ent_ids = np.arange(1000, 1000 + s.num_nodes)
            a = build_agent_sample(
                sample_id=s.sample_id, question_id=s.question_id,
                heads=s.edge_index[0], tails=s.edge_index[1], relations=s.edge_relations,
                labels=s.edge_labels.astype(np.float32), scores=scores[sel],
                node_entity_ids=ent_ids, node_embedding_ids=s.node_embedding_ids,
                start_entity_ids=ent_ids[s.topic_locals], answer_entity_ids=ent_ids[s.answer_locals],
                settings=settings,
            )
            if a is not None:
                agent_samples.append(a)
                order = np.argsort(-a.edge_scores, kind="stable")
                oracle_inputs.append({
                    "head_entity_ids": a.node_entity_ids[a.edge_head_locals[order]],
                    "tail_entity_ids": a.node_entity_ids[a.edge_tail_locals[order]],
                    "answer_entity_ids": a.answer_entity_ids,
                })
        i += 8
    oracle = aggregate_oracle_metrics([
        oracle_metrics_for_sample(k_values=ks, **x) for x in oracle_inputs
    ])

    # GFlowNet on the agent graphs.
    bundle = export_retriever_features(best_params["params"], model.parity_meta())
    reachable = [a for a in agent_samples if a.is_answer_reachable]
    abucket = fixed_agent_bucket(reachable, 8)
    gcfg = GFlowNetConfig(
        hidden_dim=args.emb, max_steps=3, stop_on_answer=True, num_train_rollouts=4,
        bc_weight=0.5, total_steps=500, eval_rollout_prefixes=(1, 4, 10),
        optimizer=OptimizerConfig(name="adamw", learning_rate=1e-3), max_epochs=5,
        dropout=0.0,
    )

    def agent_batches(epoch=0):
        order = np.arange(len(reachable))
        np.random.default_rng(epoch).shuffle(order)
        for j in range(0, len(order), 8):
            chunk = [reachable[x] for x in order[j : j + 8]]
            yield collate_agent(chunk, bucket=abucket, **kw_te)

    gfn_params, gfn_info = fit_gflownet(gcfg, bundle, agent_batches, lambda: agent_batches(999), seed=0)
    gfn = gfn_info["history"][-1]["val"] if gfn_info["history"] else {}

    elapsed = time.time() - t_start
    lines = [
        "# Self-measured quality baseline (synthetic KGQA)",
        "",
        f"Backend: `{jax.default_backend()}` ({jax.devices()[0].device_kind}); "
        f"{args.samples} train / {len(test_ds.samples)} test samples, emb={args.emb}; "
        f"total wall time {elapsed:.0f}s.",
        "",
        "## Retriever (held-out split)",
        "",
        "| k | edge recall@k | answer reachability@k |",
        "|---|---|---|",
    ]
    for k in ks:
        lines.append(
            f"| {k} | {retr.get(f'edge/recall@{k}', float('nan')):.3f} "
            f"| {retr.get(f'answer/reachability@{k}', float('nan')):.3f} |"
        )
    lines += [
        "",
        f"Score margin {retr.get('edge/score_margin', float('nan')):.3f} "
        f"(positive-margin rate {retr.get('edge/margin_positive_rate', float('nan')):.3f}); "
        f"bridge separation {retr.get('bridge/separation', float('nan')):.3f}.",
        "",
        "## Oracle upper bound over agent graphs",
        "",
        "| k | answer hit@k | answer recall@k |",
        "|---|---|---|",
    ]
    for k in ks:
        lines.append(
            f"| {k} | {oracle.get(f'answer_hit@{k}', float('nan')):.3f} "
            f"| {oracle.get(f'answer_recall@{k}', float('nan')):.3f} |"
        )
    lines += [
        "",
        "## GFlowNet (best-of-k rollouts)",
        "",
        "| rollouts k | answer_hit@k |",
        "|---|---|",
    ]
    for k in gcfg.eval_rollout_prefixes:
        lines.append(f"| {k} | {gfn.get(f'answer_hit@{k}', float('nan')):.3f} |")
    lines += [
        "",
        f"Mean sampled log-reward {gfn.get('log_reward', float('nan')):.3f}; "
        f"mean path length {gfn.get('length_mean', float('nan')):.2f}.",
        "",
    ]
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text("\n".join(lines))
    print(json.dumps({"elapsed_s": round(elapsed, 1), "out": str(out)}))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
