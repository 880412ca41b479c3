"""Single-chip TPU smoke tests (SURVEY.md §4.2) — OPT-IN via
``TPUCDC_FORCE_TPU_TESTS=1`` (nightly-style; see TODO.md engineering).

Not auto-enabled by TPU presence: the axon grant is EXCLUSIVE, so when any
training/bench job holds the chip these tests don't fail fast — they BLOCK
at first device use until the holder exits (observed as a 7-min "failure"
inside a default `pytest tests/` during the r2 λ sweep), and they'd steal
the grant from a long run otherwise. The default suite must stay CPU-only.

NOTE: tests/conftest.py forces CPU for the main suite; this module spawns a
fresh interpreter so the TPU plugin initializes normally."""

import json
import os
import subprocess
import sys
import textwrap

import pytest


def _has_tpu():
    return os.environ.get("TPUCDC_FORCE_TPU_TESTS")


@pytest.mark.skipif(not _has_tpu(), reason="no TPU attached")
def test_tpu_kernels_and_decode():
    script = textwrap.dedent("""
        import json
        import jax, jax.numpy as jnp, numpy as np
        assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
        from tpucdc.ops.groupnorm import _gn_reference
        from tpucdc.ops.pallas.gn_silu import gn_silu_pallas
        x = jax.random.normal(jax.random.key(0), (2, 32, 32, 128), jnp.bfloat16)
        g = jnp.ones((128,)); b = jnp.zeros((128,))
        got = gn_silu_pallas(x, g, b, 32)
        want = _gn_reference(x, g, b, 32, 1e-5, True)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - want.astype(jnp.float32))))
        assert err < 0.1, err

        from tpucdc.ops.attention import attention_reference
        from tpucdc.ops.pallas.flash_attention import flash_attention_pallas
        q = jax.random.normal(jax.random.key(1), (1, 4, 256, 64), jnp.bfloat16)
        out = flash_attention_pallas(q, q, q, 0.125)
        ref = attention_reference(q, q, q, 0.125)
        err2 = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                     - ref.astype(jnp.float32))))
        assert err2 < 0.1, err2
        print(json.dumps({"gn_err": err, "attn_err": err2}))
    """)
    proc = subprocess.run([sys.executable, "-c", script], capture_output=True,
                          timeout=560, text=True)
    assert proc.returncode == 0, proc.stderr[-3000:]
    print(proc.stdout)


@pytest.mark.skipif(not _has_tpu(), reason="no TPU attached")
def test_tpu_continuous_rate_roundtrip():
    """Continuous VR quality on the real chip: the traced-gain analysis +
    inv-gain decode programs compile and a fractional-quality bitstream
    roundtrips (tiny model — fresh compile is small)."""
    script = textwrap.dedent("""
        import dataclasses, json
        import jax, jax.numpy as jnp, numpy as np
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_tpucdc")
        from tpucdc import presets
        from tpucdc.model import init_model
        from tpucdc.pipelines.codec_runtime import CodecRuntime
        cfg = presets.tiny()
        codec = dataclasses.replace(cfg.model.codec, num_qualities=3)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, codec=codec),
            train=dataclasses.replace(cfg.train,
                                      rd_lambdas=(4.0, 16.0, 64.0)),
            sample=dataclasses.replace(cfg.sample, steps=2)).validated()
        model, params = init_model(cfg.model, jax.random.key(0),
                                   image_size=64)
        c = cfg.model.codec.latent_channels
        g = np.stack([np.full(c, 0.5), np.full(c, 1.0),
                      np.full(c, 2.0)]).astype(np.float32)
        params["params"]["gains"] = jnp.asarray(g)
        params["params"]["inv_gains"] = jnp.asarray(1.0 / g)
        rt = CodecRuntime(cfg, model, params)
        img = np.random.default_rng(0).integers(0, 255, (64, 64, 3),
                                                dtype=np.uint8)
        blob = rt.compress(img, quality=1.5)
        out = rt.decompress(blob, steps=2)
        assert out.shape == img.shape
        est = rt.estimate_bpp(img, 1.5)
        act = len(blob) * 8 / (64 * 64)
        print(json.dumps({"est": est, "actual": act}))
        assert abs(est - act) / act < 0.2, (est, act)
    """)
    proc = subprocess.run([sys.executable, "-c", script], capture_output=True,
                          timeout=560, text=True)
    assert proc.returncode == 0, proc.stderr[-3000:]
    print(proc.stdout)


@pytest.mark.skipif(not _has_tpu(), reason="no TPU attached")
def test_tpu_decode_latency_regression():
    """Flagship 768×512 DDIM-100 decode stays well under the 1 s target
    (generous 2 s bound to absorb tunnel jitter; compile cache required —
    cold compile would exceed the subprocess timeout)."""
    script = textwrap.dedent("""
        import json
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_tpucdc")
        from tpucdc import presets
        from tpucdc.data.datasets import synthetic_images
        from tpucdc.eval.harness import time_decode
        from tpucdc.model import init_model
        from tpucdc.pipelines.codec_runtime import CodecRuntime
        cfg = presets.flagship()
        model, params = init_model(cfg.model, jax.random.key(0),
                                   image_size=256)
        rt = CodecRuntime(cfg, model, params)
        img = synthetic_images(1, 512, 768, seed=7)[0]
        t = time_decode(rt, rt.compress(img), steps=100, warmup=1, iters=2)
        print(json.dumps(t))
        assert t["decode_s_median"] < 2.0, t
    """)
    proc = subprocess.run([sys.executable, "-c", script], capture_output=True,
                          timeout=560, text=True)
    assert proc.returncode == 0, proc.stderr[-3000:]
    print(proc.stdout)
