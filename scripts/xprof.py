"""Capture an XProf trace of the flagship UNet step and print the op-level
time breakdown (SURVEY.md §5.1 — per-kernel cost via XProf op profile)."""

import glob
import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from tpucdc import presets
from tpucdc.model import CDCModel, init_model

LOGDIR = "/tmp/tpucdc_xprof"


def main():
    cfg = presets.flagship()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=256)
    y = jnp.zeros((1, 32, 48, cfg.model.codec.latent_channels))

    @jax.jit
    def run(params, y, x, t):
        cf, ct = model.apply(params, y, method=CDCModel.cond_signal)
        def body(x, i):
            return model.apply(params, x, t, cf, ct,
                               method=CDCModel.denoise), None
        out, _ = jax.lax.scan(body, x, jnp.arange(4))
        return out

    x = jnp.zeros((1, 512, 768, 3))
    t = jnp.zeros((1,), jnp.int32)
    _ = float(jnp.sum(run(params, y, x, t)))       # compile+warm

    with jax.profiler.trace(LOGDIR):
        _ = float(jnp.sum(run(params, y, x, t)))

    # Convert the xplane to the op_profile tool and print the top ops.
    files = glob.glob(f"{LOGDIR}/plugins/profile/*/*.xplane.pb")
    if not files:
        print("no xplane captured", file=sys.stderr)
        return 1
    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t
    data, _ = r2t.xspace_to_tool_data([files[-1]], "op_profile", {})
    prof = json.loads(data)

    def walk(node, depth=0, out=None):
        m = node.get("metrics", {})
        out.append((m.get("time", 0.0), node.get("name", "?"), depth))
        for ch in node.get("children", []):
            walk(ch, depth + 1, out)

    rows = []
    root = prof.get("byProgram") or prof.get("byCategory") or {}
    walk(root, 0, rows)
    rows.sort(reverse=True)
    print("=== top ops by % of device time ===")
    for t_, name, depth in rows[:40]:
        if t_ > 0.2:
            print(f"{t_:6.2f}%  {name[:110]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
