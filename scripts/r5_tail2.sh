#!/bin/bash
# r5 queue tail 2 — extra evals queued by session 3 after the ctx A/B gate.
#
# Waits for the running r5_tail.sh (PID in /tmp/r5_tail.pid or passed as
# $1) to exit, then:
#   1. in-band + spatial gamma eval on the fresh lambda=2048 crop-192
#      checkpoint, BOTH splits — validates that the new v5 spatial encode
#      default is safe at high rate (expected: header picks gamma~0, grids
#      rarely kept, never worse than scalar).
#   2. bench.py once, under the lock, so the end-of-round snapshot starts
#      from a verified-clean serving number.
set -u
cd /root/repo
Q=/root/r5_queue.log
LOCK=/tmp/tpucdc_tpu.lock
WAIT_PID=${1:-}
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

if [ -n "$WAIT_PID" ]; then
  log "TAIL2 waiting on pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
log "TAIL2 start"

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

INB2048="python scripts/eval_inband_gamma.py --workdir /root/r5res --lambdas 2048 --wide"
run l2048_inband_hold 7200 $INB2048 --split holdout
run l2048_inband_train 7200 $INB2048 --split train
mkdir -p artifacts/metrics
[ -f /root/r5res/inband_gamma/metrics.jsonl ] && \
  cp /root/r5res/inband_gamma/metrics.jsonl artifacts/metrics/r5_l2048_inband.jsonl

run bench_verify 3600 python bench.py
log "TAIL2 done"
