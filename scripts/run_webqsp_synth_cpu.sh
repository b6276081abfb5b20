#!/usr/bin/env bash
# WebQSP-scale CPU-width pipeline (VERDICT r3 #4 fallback lane): the same
# 4.7k-question synthetic RoG set as run_webqsp_synth_hw.sh, built and run at
# 256-d hash geometry so a 1-core box can execute all 7 stages + serve when
# the TPU tunnel is unreachable.  Per-stage wall seconds go to
# $ART/stage_times.tsv for docs/RESULTS_synthetic.md; the chip-width run
# supersedes these numbers when hardware is back.
#
# Usage: scripts/run_webqsp_synth_cpu.sh [artifacts_dir]
set -euo pipefail

# Force the local CPU backend: JAX_PLATFORMS alone is not enough -- the
# container's .axon_site sitecustomize force-registers the remote TPU
# backend, so strip it from PYTHONPATH (same sanitization as
# __graft_entry__.dryrun_multichip).
export JAX_PLATFORMS=cpu
export PYTHONPATH="$(python - <<'PY'
import os
parts = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p and ".axon_site" not in p]
print(os.pathsep.join(parts))
PY
)"

DATASET=webqsp_synth_256
RAW=data/raw/webqsp_synth
ART="${1:-artifacts/$DATASET}"
EXP="experiment=webqsp_synth_cpu"
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

[ -d "$RAW" ] || stage make_raw python scripts/make_synthetic_webqsp.py --out "$RAW"

if [ ! -f "data/normalized/$DATASET/questions.parquet" ]; then
  stage build $CLI build build.dataset="$DATASET" \
    build.raw_root="$RAW" build.out_dir="data/normalized/$DATASET" \
    build.encoder.dim=256
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

echo "webqsp_synth_256 CPU pipeline complete: $ART"
cat "$TIMES"
