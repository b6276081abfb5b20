#!/usr/bin/env bash
# WebQSP-scale hardware pipeline (VERDICT r3 #4): all 7 stages + serve on the
# real chip at production width over the synthetic RoG-format set.  Records
# per-stage wall seconds to $ART/stage_times.tsv for docs/RESULTS_synthetic.md.
#
# Usage: scripts/run_webqsp_synth_hw.sh [artifacts_dir]
set -euo pipefail

DATASET=webqsp_synth
ART="${1:-artifacts/$DATASET}"
EXP="experiment=webqsp_synth_hw"
CLI="python -m evi_rag_tpu.cli"
TIMES="$ART/stage_times.tsv"
mkdir -p "$ART"
: > "$TIMES"

stage() {  # stage <name> <cmd...>
  local name="$1"; shift
  echo "== $name =="
  local t0=$SECONDS
  "$@"
  echo -e "$name\t$((SECONDS - t0))" | tee -a "$TIMES"
}

[ -d "data/raw/$DATASET" ] || python scripts/make_synthetic_webqsp.py

if [ ! -f "data/normalized/$DATASET/questions.parquet" ]; then
  stage build $CLI build build.dataset="$DATASET" \
    build.raw_root="data/raw/$DATASET" build.out_dir="data/normalized/$DATASET" \
    build.encoder.dim=1024
else
  echo "== build: reusing data/normalized/$DATASET =="
fi

stage train_retriever $CLI train_retriever $EXP dataset="$DATASET-sub" \
  retriever.train.ckpt_dir="$ART/ckpt/retriever"

CKPT="$ART/ckpt/retriever/best"

for variant in "$DATASET" "$DATASET-sub"; do
  stage "eval_retriever:$variant" $CLI eval_retriever $EXP dataset="$variant" \
    retriever.ckpt="$CKPT" "eval.splits=[train, validation, test]" \
    eval.artifacts_dir="$ART/$variant"
done

stage train_gflownet $CLI train_gflownet $EXP dataset="$DATASET-sub" \
  retriever.ckpt="$CKPT" gflownet.g_agent_dir="$ART/$DATASET-sub/g_agent" \
  gflownet.ckpt_dir="$ART/ckpt/gflownet"

stage eval_gflownet $CLI eval_gflownet $EXP dataset="$DATASET-sub" \
  gflownet.ckpt="$ART/ckpt/gflownet/best" \
  gflownet.g_agent_dir="$ART/$DATASET-sub/g_agent" \
  "eval.splits=[validation, test]" eval.artifacts_dir="$ART/$DATASET-sub"

stage reasoner $CLI reasoner $EXP dataset="$DATASET-sub" \
  gflownet.g_agent_dir="$ART/$DATASET-sub/g_agent" \
  eval.artifacts_dir="$ART/$DATASET-sub"

stage serve $CLI serve $EXP dataset="$DATASET" retriever.ckpt="$CKPT" \
  "serve.splits=[validation, test]" serve.k=100 "serve.k_values=[1, 10, 100]"

echo "webqsp_synth hardware pipeline complete: $ART"
cat "$TIMES"
