#!/usr/bin/env bash
# Hide-and-seek mask ablation sweep (re-design of the reference
# scripts/run_retriever_mask_ablation.sh): trains the retriever across a grid
# of near/far demotion probabilities and biases.
set -euo pipefail

DATASET="${1:-synthetic}"
CLI="python -m evi_rag_tpu.cli"

for p_near in 0.0 0.3 0.6; do
  for bias in -2.0 -5.0; do
    echo "== ablation p_near=$p_near bias_near=$bias =="
    $CLI train_retriever dataset="$DATASET" \
      retriever.model.hide_seek.enabled=true \
      retriever.model.hide_seek.p_near="$p_near" \
      retriever.model.hide_seek.bias_near="$bias"
  done
done
