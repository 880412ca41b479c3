#!/bin/bash
# r4d TPU job queue (round-4 session 4).
#
# Context: the box was reset between sessions — /root/r3res checkpoints, the
# JAX compile caches and the r4c queue+logs are GONE (repo + bundled corpus
# survived). This queue (a) rebuilds the flagship checkpoint, folding in the
# queued c192_l128 task (train at crop 192, the root-cause fix the λ=512 run
# validated: 11.5 % rate win at equal PSNR), and (b) runs the remaining r4
# measurements. Serial — the TPU grant is exclusive (CLAUDE.md).
#
# Run:    bash scripts/r4d_queue.sh & echo $! > /tmp/r4d_queue.pid
# Logs:   /root/r4d_<job>.log    Progress: /root/r4d_queue.log
# land(): copies every metrics JSONL into artifacts/metrics/ after each job
#         so results survive another reset even before harvest commits.
set -u
cd /root/repo
Q=/root/r4d_queue.log
log() { echo "$(date +%H:%M:%S) $*" >> "$Q"; }

probe() {
  # TPU health: the axon remote-compile tunnel dies for stretches (r4b/r4c
  # outages) — when it is down even backend init fails or hangs.
  timeout 600 python - <<'EOF'
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
import jax.numpy as jnp
assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0
EOF
}

land() {
  mkdir -p artifacts/metrics
  [ -f /root/r4res/eval/metrics.jsonl ] && cp /root/r4res/eval/metrics.jsonl artifacts/metrics/r4d_c192_l128_eval.jsonl
  [ -f /root/r4res/blend/metrics.jsonl ] && cp /root/r4res/blend/metrics.jsonl artifacts/metrics/r4d_blend.jsonl
  [ -f /root/r4res/inband_gamma/metrics.jsonl ] && cp /root/r4res/inband_gamma/metrics.jsonl artifacts/metrics/r4d_inband.jsonl
  [ -f /root/r4vr/eval/metrics.jsonl ] && cp /root/r4vr/eval/metrics.jsonl artifacts/metrics/r4d_vr.jsonl
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
    if timeout "$tmo" "$@" > "/root/r4d_$name.log" 2>&1; then
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

# --- flagship retrain: wide codec + residual refiner, λ=128, crop 192,
#     60k steps split into two 30k segments (relay leak ≈ batch bytes/step:
#     30k × 16×192²×3 B ≈ 53 GiB per process — one 60k process would OOM).
TRAIN="python scripts/train_rd_sweep.py --lambdas 128 --wide --prediction residual --lpips-weight 15 --t-low 0.35,0.5 --crop 192 --dispatch 16 --batch 16 --steps 60000 --workdir /root/r4res"

run c192_l128_seg1 14400 $TRAIN --resume --seg-steps 30000 --no-eval || exit 1
run c192_l128_seg2 14400 $TRAIN --resume --eval-menu || exit 1

# Point the flagship spec at the rebuilt checkpoint so bench.py and
# profile_decode load trained weights again (the serving γ dial is
# re-verified by the blend job and harvested into flagship.json after).
python - <<'EOF'
import json, pathlib
p = pathlib.Path("artifacts/flagship.json")
spec = json.loads(p.read_text())
spec["ckpt_dir"] = "/root/r4res/lambda128/ckpt"
spec["notes"] += (" | r4 session 4: retrained at CROP 192 after a box reset "
                  "destroyed /root/r3res (c192_l128 queue task); dial "
                  "re-verified by the r4d blend/inband jobs.")
p.write_text(json.dumps(spec, indent=2) + "\n")
EOF
log "flagship.json ckpt_dir -> /root/r4res/lambda128/ckpt"

run blend_l128 10800 python scripts/eval_blend.py --workdir /root/r4res --lambdas 128 --wide
run inband_l128 10800 python scripts/eval_inband_gamma.py --workdir /root/r4res --lambdas 128
run bench 7200 python bench.py
run vr50k 14400 python scripts/train_vr_sweep.py --steps 50000 --workdir /root/r4vr
run profile_decode 7200 python scripts/profile_decode.py
run mfu_lane96 7200 python scripts/profile_unet.py lane96
run mfu_lane128_shallow 7200 python scripts/profile_unet.py lane128_shallow
run mfu_serving 7200 python scripts/profile_unet.py serving_unet
run xprof1 7200 python scripts/xprof.py 1
run xprof4 7200 python scripts/xprof.py 4
run bench_overlap 7200 python scripts/bench_overlap.py
log "QUEUE COMPLETE"
