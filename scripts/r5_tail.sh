#!/bin/bash
# r5 queue tail — invoked by scripts/r5_queue.sh after the λ=2048 rebuild.
#
# Jobs (VERDICT r4 tasks 4 and 6):
#   1. Snapshot the new checkpoints into git-committable NPZs (box resets
#      destroyed the r4h weights; never again). CPU-only, no lock.
#   2. Expanded eval set: blend + in-band evals on BOTH splits (train =
#      16 real crops codec-fit read, holdout = 4 real + 2 synthetic
#      generalization read) for the surviving flagship λ=128 (from its NPZ)
#      and the fresh λ=2048 checkpoint → single-SHA BASELINE tables with
#      n=20 real crops total.
#   3. Context A/B clean pair (task 6, wall-clock gated): hyperprior vs
#      space-channel at λ=128, 20k matched budget, both post-stop-gradient
#      fix — replaces the r4 caveat with a confound-free table.
set -u
cd /root/repo
Q=/root/r5_queue.log
LOCK=/tmp/tpucdc_tpu.lock
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

run() {
  local name=$1; shift
  local tmo=$1; shift
  log "START $name"
  if timeout "$tmo" flock "$LOCK" "$@" > "/root/r5_$name.log" 2>&1; then
    log "DONE $name"
    return 0
  fi
  log "FAIL $name rc=$?"
  return 1
}

landtail() {
  mkdir -p artifacts/metrics
  [ -f /root/r5flag/blend/metrics.jsonl ] && cp /root/r5flag/blend/metrics.jsonl artifacts/metrics/r5_expanded_blend.jsonl
  [ -f /root/r5flag/inband_gamma/metrics.jsonl ] && cp /root/r5flag/inband_gamma/metrics.jsonl artifacts/metrics/r5_expanded_inband.jsonl
  [ -f /root/r5res/blend/metrics.jsonl ] && cp /root/r5res/blend/metrics.jsonl artifacts/metrics/r5_l2048_blend.jsonl
  [ -f /root/r5ab/eval/metrics.jsonl ] && cp /root/r5ab/eval/metrics.jsonl artifacts/metrics/r5_ctx_ab_hyper.jsonl
  [ -f /root/r5ab_sc/eval/metrics.jsonl ] && cp /root/r5ab_sc/eval/metrics.jsonl artifacts/metrics/r5_ctx_ab_sc.jsonl
}

# --- 1. NPZ snapshots (CPU; survive the next box reset) -------------------
log "START npz snapshots"
python scripts/export_params.py --ckpt /root/r5res/lambda2048/ckpt --wide \
    --prediction residual --out artifacts/l2048_params.npz \
    > /root/r5_npz_l2048.log 2>&1 && log "DONE npz l2048" || log "FAIL npz l2048"
python scripts/export_params.py --ckpt /root/r5vrw/ckpt --vr --wide \
    --prediction residual --t-low 0.35,0.5 \
    --out artifacts/vr_wide_params.npz \
    > /root/r5_npz_vrw.log 2>&1 && log "DONE npz vr_wide" || log "FAIL npz vr_wide"

# --- 2. expanded-split evals (value order: the spatial-dial measurement
#     and the holdout rows land first in case the round's clock runs out;
#     each job is individually resumable from artifacts/metrics) -----------
INB="python scripts/eval_inband_gamma.py --workdir /root/r5flag --lambdas 128 --wide --params-npz artifacts/flagship_params.npz"
run exp_inband_hold 7200 $INB --split holdout
landtail
FLAG="python scripts/eval_blend.py --workdir /root/r5flag --lambdas 128 --wide --params-npz artifacts/flagship_params.npz"
run exp_blend_train 7200 $FLAG --split train
run exp_blend_hold 7200 $FLAG --split holdout
landtail
run exp_inband_train 7200 $INB --split train
landtail
# fresh λ=2048 checkpoint: holdout blend confirms γ=0 stays right at high
# rate on the crop-192 weights (train-split row dropped for wall clock —
# the eval-menu in seg2 already covers the holdout R-D anchor)
L2048="python scripts/eval_blend.py --workdir /root/r5res --lambdas 2048 --wide"
run l2048_blend_hold 7200 $L2048 --split holdout
landtail

# --- 3. context A/B clean pair (gated: skip if past the wall-clock cutoff;
#     the queue must end with an idle chip + a clean bench well before the
#     end-of-round snapshot) ------------------------------------------------
CUTOFF_H=18
if [ "$(date +%H)" -lt "$CUTOFF_H" ]; then
  AB="python scripts/train_rd_sweep.py --lambdas 128 --steps 20000 --prediction residual --lpips-weight 15 --t-low 0.35,0.5 --dispatch 16 --batch 16"
  run ctx_ab_hyper 7200 $AB --context hyperprior --workdir /root/r5ab
  run ctx_ab_sc 7200 $AB --context space-channel --workdir /root/r5ab_sc
  landtail
else
  log "SKIP ctx A/B (past ${CUTOFF_H}:00 cutoff)"
fi
landtail
