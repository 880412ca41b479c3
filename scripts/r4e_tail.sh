#!/bin/bash
# r4e OPTIONAL tail (run only after r4d_queue.sh completes and only if wall
# clock allows): the lane128 trained A/B — PERF.md r4's MFU lever (27 % vs
# 14 %, 2.3× FLOPs for +15 % wall clock) carried onto trained weights at the
# flagship rate point. Equal-quality bar: adopt lane128 as the flagship UNet
# only if its serving decode matches/beats the medium UNet's blend table at
# λ=128 (TODO.md r5 candidate, pulled forward).
set -u
cd /root/repo
Q=/root/r4d_queue.log
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

probe() {
  timeout 600 python - <<'EOF'
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
EOF
}

run() {
  local name=$1; shift
  local tmo=$1; shift
  local try
  for try in 1 2 3; do
    log "START $name (try $try)"
    if ! probe; then
      log "PROBE FAIL before $name — sleeping 600"; sleep 600; continue
    fi
    if timeout "$tmo" "$@" > "/root/r4d_$name.log" 2>&1; then
      log "DONE $name"
      mkdir -p artifacts/metrics
      [ -f /root/r4lane/blend/metrics.jsonl ] && cp /root/r4lane/blend/metrics.jsonl artifacts/metrics/r4d_lane128_blend.jsonl
      [ -f /root/r4lane/eval/metrics.jsonl ] && cp /root/r4lane/eval/metrics.jsonl artifacts/metrics/r4d_lane128_eval.jsonl
      return 0
    fi
    log "FAIL $name rc=$? (try $try)"; sleep 120
  done
  log "GIVEUP $name"
  return 1
}

LTRAIN="python scripts/train_rd_sweep.py --lambdas 128 --wide --prediction residual --lpips-weight 15 --t-low 0.35,0.5 --crop 192 --dispatch 16 --batch 16 --steps 60000 --unet lane128 --workdir /root/r4lane"

run lane128_seg1 14400 $LTRAIN --resume --seg-steps 30000 --no-eval || exit 1
run lane128_seg2 14400 $LTRAIN --resume --eval-menu || exit 1
run lane128_blend 10800 python scripts/eval_blend.py --workdir /root/r4lane --lambdas 128 --wide --unet lane128
log "R4E TAIL COMPLETE"
