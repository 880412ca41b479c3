"""Snapshot the flagship EMA params into a git-committable .npz.

The orbax run directories referenced by artifacts/flagship.json live under
/root/r4res — OUTSIDE the repo — and a box reset destroys them (it already
destroyed /root/r3res once). This script restores the latest checkpoint,
writes artifacts/flagship_params.npz (compressed, ~tens of MB: EMA params
only, no optimizer state), and stamps "params_npz" into flagship.json so
bench.py / eval scripts can fall back to it when the run dir is gone.

CPU-only host work; safe to run while the TPU grant is busy.
"""

from __future__ import annotations

import json
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

    spec_path = REPO / "artifacts" / "flagship.json"
    spec = json.loads(spec_path.read_text())
    base = build_eval_config(bool(spec.get("wide")),
                             spec.get("unet", "medium"),
                             spec.get("prediction", "x0"))
    model, abstract = create_state(base, jax.random.key(0))
    mngr = CheckpointManager(spec["ckpt_dir"])
    step = mngr.latest_step()
    state = mngr.restore(abstract)
    out = REPO / "artifacts" / "flagship_params.npz"
    save_params_npz(state.ema_params, out)
    # Verify the roundtrip before stamping the spec.
    restored = load_params_npz(out, state.ema_params)
    import numpy as np
    for (kp, a), b in zip(
            jax.tree_util.tree_flatten_with_path(state.ema_params)[0],
            jax.tree_util.tree_leaves(restored)):
        if not np.array_equal(np.asarray(a), np.asarray(b)):
            raise AssertionError(f"roundtrip mismatch at {kp}")
    spec["params_npz"] = "artifacts/flagship_params.npz"
    spec["params_npz_step"] = int(step)
    spec_path.write_text(json.dumps(spec, indent=2) + "\n")
    print(f"wrote {out} ({out.stat().st_size / 1e6:.1f} MB) from step {step}")


if __name__ == "__main__":
    main()
