#!/bin/bash
# r5 queue RESUME (session 2): the original scripts/r5_queue.sh queue was a
# child of the builder session and died with it at ~13:13 during l2048_seg1
# (step 24000 logged, last checkpoint 20000). vr_wide + vr_cont completed and
# are harvested. This script re-runs the remainder, starting from the seg1
# resume, then the tail and the warm bench. Launch DETACHED (setsid) so a
# session restart cannot kill it again.
set -u
cd /root/repo
Q=/root/r5_queue.log
LOCK=/tmp/tpucdc_tpu.lock
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

probe() {
  timeout 600 flock "$LOCK" python - <<'EOF'
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
EOF
}

land() {
  mkdir -p artifacts/metrics
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

log "RESUME queue (session 2) from l2048_seg1"
TRAIN="python scripts/train_rd_sweep.py --lambdas 2048 --wide --prediction residual --lpips-weight 15 --t-low 0.35,0.5 --crop 192 --dispatch 16 --batch 16 --steps 60000 --workdir /root/r5res"
run l2048_seg1 10800 $TRAIN --resume --seg-steps 30000 --no-eval || exit 1
run l2048_seg2 10800 $TRAIN --resume --eval-menu || exit 1

if [ -f scripts/r5_tail.sh ]; then
  log "TAIL start"
  bash scripts/r5_tail.sh
  log "TAIL done"
fi

run bench 7200 python bench.py

log "QUEUE COMPLETE"
