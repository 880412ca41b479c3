"""Snapshot ANY run's EMA params into a git-committable .npz.

Generalizes scripts/export_flagship_params.py (which is bound to
artifacts/flagship.json): box resets destroy every orbax run dir under
/root, and round 4 lost the wide-VR and λ=2048 checkpoints that way —
trained weights that aren't snapshotted in-repo do not survive the round
boundary. CPU-only host work; safe to run while the TPU grant is busy.

Usage:
  python scripts/export_params.py --ckpt /root/r5res/lambda2048/ckpt \
      --wide --prediction residual --out artifacts/l2048_params.npz
  python scripts/export_params.py --ckpt /root/r5vrw/ckpt --vr --wide \
      --prediction residual --t-low 0.35,0.5 \
      --out artifacts/vr_wide_params.npz
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/tpucdc_jax_cpu_cache")

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "scripts"))


def main():
    from train_rd_sweep import build_eval_config

    from tpucdc.pipelines.train import create_state
    from tpucdc.utils import CheckpointManager
    from tpucdc.utils.checkpoint import load_params_npz, save_params_npz

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="orbax run dir")
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--wide", action="store_true")
    ap.add_argument("--unet", default="medium")
    ap.add_argument("--prediction", default="residual")
    ap.add_argument("--vr", action="store_true",
                    help="variable-rate config (train_vr_sweep recipe)")
    ap.add_argument("--context", default="space-channel",
                    help="VR context kind (--vr only)")
    ap.add_argument("--t-low", default="")
    args = ap.parse_args()

    if args.vr:
        from train_vr_sweep import vr_sc_config
        base = vr_sc_config(1000, 16, args.context,
                            prediction=args.prediction, t_low=args.t_low,
                            wide=args.wide)
    else:
        base = build_eval_config(args.wide, args.unet, args.prediction)
    _, abstract = create_state(base, jax.random.key(0))
    mngr = CheckpointManager(args.ckpt)
    step = mngr.latest_step()
    state = mngr.restore(abstract)
    out = pathlib.Path(args.out)
    save_params_npz(state.ema_params, out)
    restored = load_params_npz(out, state.ema_params)
    import numpy as np
    for (kp, a), b in zip(
            jax.tree_util.tree_flatten_with_path(state.ema_params)[0],
            jax.tree_util.tree_leaves(restored)):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            raise AssertionError(f"roundtrip mismatch at {kp}")
    print(f"wrote {out} ({out.stat().st_size / 1e6:.1f} MB) from step {step}")


if __name__ == "__main__":
    main()
