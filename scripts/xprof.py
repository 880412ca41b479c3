"""Capture an XProf trace of the flagship UNet scan and print the op-kind
time breakdown (SURVEY.md §5.1 — per-kernel cost via XProf).

tensorboard_plugin_profile's converter is incompatible with this image's TF,
so the xplane.pb is decoded schema-free via `protoc --decode_raw` and parsed
textually (field map: plane=1{name=2, lines=3{name=2, events=4{metadata_id=1,
duration_ps=3}}, event_metadata=4{id=1, meta=2{name=2}}}).
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent))
import glob
import re
import subprocess
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from tpucdc import presets
from tpucdc.model import CDCModel, init_model

LOGDIR = "/tmp/tpucdc_xprof"


def capture(batch: int = 1):
    """batch > 1 profiles the batched-decode scan (VERDICT r2 weak 4: the
    batch-4 super-linear decode needs an XProf-backed root cause)."""
    cfg = presets.flagship()
    model, params = init_model(cfg.model, jax.random.key(0), image_size=256)
    y = jnp.zeros((batch, 32, 48, cfg.model.codec.latent_channels))

    @jax.jit
    def run(params, y, x, t):
        cf, ct = model.apply(params, y, method=CDCModel.cond_signal)
        xb = (model.apply(params, y, method=CDCModel.synthesize)
              if cfg.model.codec.synthesis else None)
        def body(x, i):
            return model.apply(params, x, t, cf, ct, xb,
                               method=CDCModel.denoise), None
        out, _ = jax.lax.scan(body, x, jnp.arange(4))
        return out

    x = jnp.zeros((batch, 512, 768, 3))
    t = jnp.zeros((batch,), jnp.int32)
    _ = float(jnp.sum(run(params, y, x, t)))       # compile+warm
    with jax.profiler.trace(LOGDIR):
        _ = float(jnp.sum(run(params, y, x, t)))


def _parse_block(lines, i):
    out = defaultdict(list)
    while i < len(lines):
        ln = lines[i].strip()
        if ln == "}":
            return out, i + 1
        m = re.match(r"^(\d+) \{$", ln)
        if m:
            child, i = _parse_block(lines, i + 1)
            out[int(m.group(1))].append(child)
            continue
        m = re.match(r"^(\d+): (.*)$", ln)
        if m:
            out[int(m.group(1))].append(m.group(2))
            i += 1
            continue
        i += 1
    return out, i


def report():
    files = sorted(glob.glob(f"{LOGDIR}/plugins/profile/*/*.xplane.pb"))
    if not files:
        print("no xplane captured", file=sys.stderr)
        return 1
    raw = subprocess.run(["protoc", "--decode_raw"],
                         stdin=open(files[-1], "rb"),
                         capture_output=True, text=True).stdout
    lines = raw.splitlines()
    planes, i = [], 0
    while i < len(lines):
        if lines[i].strip() == "1 {":
            blk, i = _parse_block(lines, i + 1)
            planes.append(blk)
        else:
            i += 1

    for p in planes:
        name = p.get(2, ["?"])[0]
        if "TPU:0" not in name:
            continue
        meta = {}
        for em in p.get(4, []):
            try:
                meta[int(em[1][0])] = em[2][0].get(2, ["?"])[0].strip('"')
            except (KeyError, IndexError, ValueError):
                pass
        for line in p.get(3, []):
            lname = line.get(2, ["?"])[0]
            if "XLA Ops" not in str(lname):
                continue
            kinds = defaultdict(float)
            tot = 0.0
            for ev in line.get(4, []):
                try:
                    nm = meta.get(int(ev[1][0]), "?")
                    dur = float(ev[3][0]) / 1e9
                except (KeyError, IndexError, ValueError):
                    continue
                m = re.match(r"%?([a-zA-Z\-_]+)[\.\d]*\s*=?", nm)
                kinds[m.group(1) if m else nm[:20]] += dur
                tot += dur
            print(f"== XLA Ops: {tot:.2f} ms total")
            for k, ms in sorted(kinds.items(), key=lambda kv: -kv[1])[:15]:
                if ms > tot * 0.005:
                    print(f"  {ms:8.2f} ms {100*ms/tot:5.1f}%  {k}")
    return 0


if __name__ == "__main__":
    capture(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 1)
    sys.exit(report())
