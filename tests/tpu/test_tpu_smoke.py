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
