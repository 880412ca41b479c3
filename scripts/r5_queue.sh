#!/bin/bash
# r5 TPU job queue (round 5).
#
# Context: another box reset destroyed every off-repo checkpoint (the r4h
# wide-VR weights, the half-trained lambda=2048 crop-192 run, the medium VR)
# and the JAX compile caches. The wide-VR EVAL rows survived in
# artifacts/metrics/r4h_vr_wide_eval.jsonl; the lambda=2048 crop-192 row and
# the continuous-rate trained-weights validation (r4i) did not run at all.
# This queue rebuilds exactly what the r5 verdict tasks need, in value order:
#   1. wide-VR 50k retrain          -> unlocks r4i continuous dial + the
#      matched-rate VR-vs-per-lambda table (VERDICT r4 tasks 1c, 3)
#   2. eval_vr_continuous           -> continuous R-D smoothness, rate-control
#      accuracy, matched-rate targets at the per-lambda curve's bpp points
#   3. lambda=2048 crop-192 60k     -> last crop-128 point on the headline
#      curve rebuilt (tasks 1b, 5: honest JPEG anchor comparison)
#   4. optional tail (scripts/r5_tail.sh, written later in the round)
#   5. bench.py                     -> warm, uncontended official number
#
# VERDICT r4 task 2 (bench contamination): every TPU job here runs under
# flock /tmp/tpucdc_tpu.lock; bench.py blocks on the same lock, so a
# driver-run bench can never overlap a queue job again. NEVER leave this
# queue running across an end-of-round snapshot.
#
# Run:    bash scripts/r5_queue.sh   (backgrounded by the session)
# Logs:   /root/r5_<job>.log    Progress: /root/r5_queue.log
set -u
cd /root/repo
Q=/root/r5_queue.log
LOCK=/tmp/tpucdc_tpu.lock
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

probe() {
  # TPU health: the axon remote-compile tunnel dies for stretches — when it
  # is down even backend init fails or hangs (CLAUDE.md).
  timeout 600 flock "$LOCK" python - <<'EOF'
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
EOF
}

land() {
  # Copy every metrics JSONL into artifacts/metrics/ after each job so the
  # results survive another box reset even before the harvest commits
  # (VERDICT r4 weak #2: queue data must not die in logs).
  mkdir -p artifacts/metrics
  [ -f /root/r5vrw/eval/metrics.jsonl ] && cp /root/r5vrw/eval/metrics.jsonl artifacts/metrics/r5_vr_wide_eval.jsonl
  [ -f /root/r5vrw/continuous/metrics.jsonl ] && cp /root/r5vrw/continuous/metrics.jsonl artifacts/metrics/r5_vr_cont.jsonl
  [ -f /root/r5res/eval/metrics.jsonl ] && cp /root/r5res/eval/metrics.jsonl artifacts/metrics/r5_c192_l2048_eval.jsonl
}

run() {
  local name=$1; shift
  local tmo=$1; shift
  local try
  for try in 1 2 3; do
    log "START $name (try $try)"
    if ! probe; then
      log "PROBE FAIL before $name (tunnel down?) — sleeping 600"
      sleep 600
      continue
    fi
    if timeout "$tmo" flock "$LOCK" "$@" > "/root/r5_$name.log" 2>&1; then
      log "DONE $name"
      land
      return 0
    fi
    log "FAIL $name rc=$? (try $try)"
    land
    sleep 120
  done
  log "GIVEUP $name"
  return 1
}

# --- 1. wide-VR retrain (flagship recipe; crop 128, 50k in one process is
#     ~39 GiB of relay leak — under the ~50 GiB bar, no segmenting needed).
run vr_wide 10800 python scripts/train_vr_sweep.py --steps 50000 --wide \
    --prediction residual --t-low 0.35,0.5 --lpips-weight 15 \
    --workdir /root/r5vrw || exit 1

# --- 2. continuous-rate dial on the trained wide-VR weights (the r4i job
#     that never ran). --targets = the per-lambda headline curve's bpp
#     points, so the rate-control section doubles as the matched-rate
#     VR-vs-per-lambda table (VERDICT r4 task 3).
run vr_cont 10800 python scripts/eval_vr_continuous.py --workdir /root/r5vrw \
    --wide --prediction residual --t-low 0.35,0.5 --grid-per-seg 4 \
    --targets 0.125,0.336,0.98,2.13

# --- 3. lambda=2048 crop-192 flagship-recipe rebuild, 60k in two 30k
#     segments (relay leak at crop 192: 30k x 16x192^2x3 B ~ 53 GiB/process).
TRAIN="python scripts/train_rd_sweep.py --lambdas 2048 --wide --prediction residual --lpips-weight 15 --t-low 0.35,0.5 --crop 192 --dispatch 16 --batch 16 --steps 60000 --workdir /root/r5res"
run l2048_seg1 10800 $TRAIN --resume --seg-steps 30000 --no-eval || exit 1
run l2048_seg2 10800 $TRAIN --resume --eval-menu || exit 1

# --- 4. optional tail written later in the round (expanded eval set /
#     context A/B), only if it exists by the time the queue gets here.
if [ -f scripts/r5_tail.sh ]; then
  log "TAIL start"
  bash scripts/r5_tail.sh
  log "TAIL done"
fi

# --- 5. warm, uncontended bench so the end-of-round driver snapshot hits a
#     cached HLO and an idle chip.
run bench 7200 python bench.py

log "QUEUE COMPLETE"
