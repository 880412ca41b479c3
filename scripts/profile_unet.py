import sys, time, json, dataclasses
import os
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
from tpucdc import presets
from tpucdc.model import CDCModel, init_model

V5E_BF16_PEAK_TFLOPS = 197.0


def bench_cfg(tag, cfg, steps=20):
    model, params = init_model(cfg.model, jax.random.key(0), image_size=256)
    y = jnp.zeros((1, 32, 48, cfg.model.codec.latent_channels))
    @jax.jit
    def run(params, y, x, t):
        cf, ct = model.apply(params, y, method=CDCModel.cond_signal)
        xb = (model.apply(params, y, method=CDCModel.synthesize)
              if cfg.model.codec.synthesis else None)
        def body(x, i):
            return model.apply(params, x, t, cf, ct, xb, method=CDCModel.denoise), None
        out, _ = jax.lax.scan(body, x, jnp.arange(steps))
        return out
    if os.environ.get("TPUCDC_PROFILE_TINY"):
        # CPU smoke path: same code, 64×64 shapes (script-correctness check
        # without burning a 5-15 min TPU remote compile per variant).
        y = jnp.zeros((1, 4, 4, cfg.model.codec.latent_channels))
        x = jnp.zeros((1, 64, 64, 3))
    else:
        x = jnp.zeros((1, 512, 768, 3))
    t = jnp.zeros((1,), jnp.int32)
    # Exact FLOP count from the compiled executable (PERF.md speed-of-light
    # method) -> per-variant MFU, not just ms/step. Counted on a SINGLE
    # denoise eval: XLA cost_analysis reports a lax.scan body ONCE (trip
    # count is dynamic to the analysis), so dividing the scan program's
    # count by `steps` under-reports per-step FLOPs/MFU by `steps`×
    # (verified on CPU: scan-of-20 matmuls and one matmul report identical
    # flops; the r4 mfu_lane128/lane96 queue logs carry the 20×-low
    # numbers).
    cf, ct = model.apply(params, y, method=CDCModel.cond_signal)
    xb = (model.apply(params, y, method=CDCModel.synthesize)
          if cfg.model.codec.synthesis else None)
    denoise = jax.jit(lambda p, x, t, cf, ct, xb: model.apply(
        p, x, t, cf, ct, xb, method=CDCModel.denoise))
    ca = denoise.lower(params, x, t, cf, ct, xb).compile().cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops_per_step = float(ca.get("flops", 0.0))
    _ = float(jnp.sum(run(params, y, x, t)))
    t0 = time.perf_counter()
    _ = float(jnp.sum(run(params, y, x, t)))
    dt = (time.perf_counter() - t0) / steps
    tflops = flops_per_step / dt / 1e12
    print(json.dumps({
        "tag": tag, "ms_per_step": round(dt*1000, 2),
        "gflop_per_step": round(flops_per_step / 1e9, 1),
        "achieved_tflops": round(tflops, 1),
        "mfu_pct": round(100 * tflops / V5E_BF16_PEAK_TFLOPS, 1),
    }), flush=True)

def bench_cond(tag, cfg, iters=50):
    """Conditioning-head-only latency (the once-per-decode cost).

    XProf r1: 6.3 ms fusion + 4.3 ms copy/reshape per decode on flagship —
    the repeat-upsample stages; compare upsample="shuffle"."""
    model, params = init_model(cfg.model, jax.random.key(0), image_size=256)
    y = jnp.zeros((1, 32, 48, cfg.model.codec.latent_channels))
    run = jax.jit(lambda p, y: model.apply(p, y, method=CDCModel.cond_signal))
    f, t = run(params, y)
    import numpy as np; np.asarray(f)
    t0 = time.perf_counter()
    for _ in range(iters):
        f, t = run(params, y)
    np.asarray(f)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"tag": tag, "cond_ms": round(dt*1000, 3)}), flush=True)

base = presets.flagship()
which = sys.argv[1]
if which == "flagship":
    bench_cfg("flagship", base)
elif which == "attn3":
    c = dataclasses.replace(base, model=dataclasses.replace(
        base.model, unet=dataclasses.replace(base.model.unet, attn_levels=(3,)))).validated()
    bench_cfg("attn_only_l3", c)
elif which == "noattn":
    c = dataclasses.replace(base, model=dataclasses.replace(
        base.model, unet=dataclasses.replace(base.model.unet, attn_levels=()))).validated()
    bench_cfg("no_attn", c)
elif which == "xlagn":
    from tpucdc.ops import groupnorm
    groupnorm.set_force_fallback(True)
    bench_cfg("flagship_xla_gn", base)
elif which == "patch4":
    c = dataclasses.replace(base, model=dataclasses.replace(
        base.model, unet=dataclasses.replace(base.model.unet, patch_size=4))).validated()
    bench_cfg("patch4", c)
elif which == "resblocks1":
    c = dataclasses.replace(base, model=dataclasses.replace(
        base.model, unet=dataclasses.replace(base.model.unet, num_res_blocks=1))).validated()
    bench_cfg("resblocks1", c)
if which == "v2":
    bench_cfg("flagship_v2", base)
elif which == "v2_xlagn":
    from tpucdc.ops import groupnorm
    groupnorm.set_force_fallback(True)
    bench_cfg("flagship_v2_xla_gn", base)
elif which == "v2_xlaattn":
    import tpucdc.ops.attention as attention_mod
    attention_mod.set_force_fallback(True)
    bench_cfg("flagship_v2_xla_attn", base)
elif which == "v2_xlaboth":
    import tpucdc.ops.attention as attention_mod
    from tpucdc.ops import groupnorm
    groupnorm.set_force_fallback(True)
    attention_mod.set_force_fallback(True)
    bench_cfg("flagship_v2_xla_both", base)

elif which == "cond_repeat":
    bench_cond("cond_repeat", base)
elif which == "cond_shuffle":
    c = dataclasses.replace(base, model=dataclasses.replace(
        base.model, cond=dataclasses.replace(
            base.model.cond, upsample="shuffle"))).validated()
    bench_cond("cond_shuffle", c)

# ---- round-3 MFU-lever variants (VERDICT r2 item 7): fill the 128-wide MXU
# lanes at the hot levels. All evaluated at the flagship decode shape
# (768x512 input, patch-4 grid 192x128). ----
elif which == "lane128":
    # L0/L1 at 128 channels (mult 1,1,2,2): every conv feeds full MXU lanes;
    # more FLOPs than flagship v2 but a higher roofline fraction.
    c = dataclasses.replace(base, model=dataclasses.replace(
        base.model, unet=dataclasses.replace(
            base.model.unet, base_channels=128,
            channel_mult=(1, 1, 2, 2)))).validated()
    bench_cfg("lane128_mult1122", c)
elif which == "lane96":
    c = dataclasses.replace(base, model=dataclasses.replace(
        base.model, unet=dataclasses.replace(
            base.model.unet, base_channels=96,
            channel_mult=(1, 2, 3, 4)))).validated()
    bench_cfg("lane96_mult1234", c)
elif which == "lane128_shallow":
    # 3-level variant: fewer levels, all wide.
    c = dataclasses.replace(base, model=dataclasses.replace(
        base.model, unet=dataclasses.replace(
            base.model.unet, base_channels=128,
            channel_mult=(1, 2, 2), attn_levels=(2,)))).validated()
    bench_cfg("lane128_mult122", c)
elif which == "serving_unet":
    # The r3 trained serving arch: medium UNet (base 32) + wide codec.
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    from train_tpu_demo import medium
    m = medium()
    c = dataclasses.replace(m, model=dataclasses.replace(
        m.model, codec=dataclasses.replace(
            m.model.codec, hidden_channels=128, latent_channels=192,
            hyper_channels=128))).validated()
    bench_cfg("serving_medium_unet_wide_codec", c)
