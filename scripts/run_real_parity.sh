#!/usr/bin/env bash
# One-command recall-parity runbook against REAL WebQSP/CWQ data
# (VERDICT r4 #7).  Executes the reference evaluation protocol the moment
# the two blocked-on-egress artifacts land in the container:
#
#   1. RoG-materialized WebQSP parquet  (HF: rmanluo/RoG-webqsp)
#      -> data/raw/webqsp/{train,validation,test}-*.parquet
#   2. gte-large-en-v1.5 checkpoint     (HF: Alibaba-NLP/gte-large-en-v1.5)
#      -> $GTE_MODEL_PATH (config.json + weights)
#
# Usage:
#   scripts/run_real_parity.sh [raw_root] [gte_model_path] [dataset]
#   scripts/run_real_parity.sh --dryrun <raw_root> <out_scratch>
#
# Protocol matched to the reference:
#   - build: undirected-BFS pair supervision, gte-large 1024-d mean-pooled
#     embeddings (the gte_jax port runs its parity_check gate vs the torch
#     encoder when torch can construct it), sub/nonzero filters
#     (reference scripts/build_retrieval_pipeline.py).
#   - train: sub-dataset scope, monitor val/answer/reachability@100
#     (reference configs/experiment/train_retriever.yaml:27-35).
#   - eval: full+sub dual loop over train/validation/test with the
#     reference window k-grid [1,10,25,50,100,200,300,400,500]
#     (reference configs/window/default.yaml:8, src/eval.py:32-77).
# The eval metrics.json tables (edge/recall@k, answer/reachability@k) are
# then directly comparable to a reference run of
#   python src/eval.py experiment=eval_retriever dataset=webqsp.
set -euo pipefail

CLI="python -m evi_rag_tpu.cli"
KGRID="[1, 10, 25, 50, 100, 200, 300, 400, 500]"

if [ "${1:-}" = "--dryrun" ]; then
  # Fixture mode: same stages, hash encoder + tiny budgets.  Proves the
  # runbook executes end-to-end without the blocked artifacts
  # (tests/test_real_parity_runbook.py runs this against the RoG-schema
  # fixture).
  RAW="${2:?--dryrun needs raw_root}"; SCRATCH="${3:?--dryrun needs scratch dir}"
  NORM="$SCRATCH/normalized"; ART="$SCRATCH/artifacts"; LOGS="$SCRATCH/logs"
  ENC=(build.encoder.kind=hash build.encoder.dim=64)
  MODEL=(retriever.model.hidden_dim=64)
  TRAIN_BUDGET=(retriever.train.max_epochs=1 retriever.train.per_shard_batch=2
                "retriever.train.k_values=[1, 10]")
  EVAL_K="[1, 10]"
  DATASET=webqsp
else
  RAW="${1:-data/raw/webqsp}"
  GTE="${2:-${GTE_MODEL_PATH:?set GTE_MODEL_PATH or pass gte path}}"
  DATASET="${3:-webqsp}"
  NORM="data/normalized/$DATASET"; ART="artifacts/$DATASET"; LOGS="logs"
  ENC=(build.encoder.kind=gte_jax "build.encoder.model_path=$GTE"
       build.encoder.dim=1024 build.encoder.parity_check=true)
  MODEL=(retriever.model.hidden_dim=1024
         retriever.model.compute_dtype=bfloat16)
  TRAIN_BUDGET=(retriever.train.max_epochs=30 retriever.train.patience=5
                "retriever.train.k_values=[10, 100]")
  EVAL_K="$KGRID"
fi

[ -d "$RAW" ] || { echo "raw parquet not found at $RAW" >&2; exit 2; }

echo "== 1/4 build ($DATASET) =="
$CLI build build.dataset="$DATASET" build.raw_root="$RAW" \
  build.out_dir="$NORM" "${ENC[@]}" \
  paths.log_dir="$LOGS" extras.print_config=false --configs-dir configs

echo "== 2/4 train_retriever ($DATASET-sub) =="
$CLI train_retriever dataset="$DATASET-sub" dataset.normalized_dir="$NORM" \
  retriever.train.monitor=answer/reachability@100 \
  "${MODEL[@]}" "${TRAIN_BUDGET[@]}" retriever.train.ckpt_dir="$ART/ckpt/retriever" \
  paths.log_dir="$LOGS" extras.print_config=false --configs-dir configs

echo "== 3/4 eval_retriever (full + sub, reference k-grid) =="
for variant in "$DATASET" "$DATASET-sub"; do
  $CLI eval_retriever dataset="$variant" dataset.normalized_dir="$NORM" \
    retriever.ckpt="$ART/ckpt/retriever/best" "${MODEL[@]}" \
    "eval.splits=[validation, test]" "retriever.train.k_values=$EVAL_K" \
    eval.artifacts_dir="$ART/$variant" \
    paths.log_dir="$LOGS" extras.print_config=false --configs-dir configs
done

echo "== 4/4 recall table =="
python - "$LOGS" <<'EOF'
import json, pathlib, sys
logs = pathlib.Path(sys.argv[1])
rows = sorted(logs.glob("eval_retriever_*/runs/*/metrics.json"))
if not rows:
    raise SystemExit("no eval_retriever metrics.json found under " + str(logs))
for f in rows[-2:]:
    d = json.loads(f.read_text())
    keys = sorted(k for k in d if "recall@" in k or "reachability@" in k)
    print(f"-- {f.parent.parent.parent.name}")
    for k in keys:
        print(f"  {k}: {d[k]:.4f}")
EOF
echo "parity runbook complete — compare the table above to the reference's"
echo "eval_retriever metrics.json for the same dataset."
