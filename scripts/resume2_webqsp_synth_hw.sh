#!/usr/bin/env bash
# Resume the WebQSP-scale hardware pipeline from eval_gflownet.
set -euo pipefail
cd /root/repo
DATASET=webqsp_synth
ART="artifacts/$DATASET"
EXP="experiment=webqsp_synth_hw"
CLI="python -m evi_rag_tpu.cli"
TIMES="$ART/stage_times.tsv"
CKPT="$ART/ckpt/retriever/best"

stage() {
  local name="$1"; shift
  echo "== $name =="
  local t0=$SECONDS
  "$@"
  echo -e "$name\t$((SECONDS - t0))" | tee -a "$TIMES"
}

stage eval_gflownet $CLI eval_gflownet $EXP dataset="$DATASET-sub" \
  gflownet.ckpt="$ART/ckpt/gflownet/best" \
  gflownet.g_agent_dir="$ART/$DATASET-sub/g_agent" \
  "eval.splits=[validation, test]" eval.artifacts_dir="$ART/$DATASET-sub"

stage reasoner $CLI reasoner $EXP dataset="$DATASET-sub" \
  gflownet.g_agent_dir="$ART/$DATASET-sub/g_agent" \
  eval.artifacts_dir="$ART/$DATASET-sub"

stage serve $CLI serve $EXP dataset="$DATASET" retriever.ckpt="$CKPT" \
  "serve.splits=[validation, test]" serve.k=100 "serve.k_values=[1, 10, 100]"

echo "resume2 complete"
cat "$TIMES"
