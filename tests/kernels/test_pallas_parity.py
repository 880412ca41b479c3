"""Pallas kernel vs pure-JAX fallback parity, via interpret mode on CPU
(SURVEY.md §4.2 "Kernel tests"). The same tests run compiled on real TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tpucdc.ops.attention import attention_reference
from tpucdc.ops.groupnorm import _gn_reference
from tpucdc.ops.pallas.flash_attention import flash_attention_pallas
from tpucdc.ops.pallas.gn_silu import gn_silu_pallas


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape,groups", [((2, 8, 8, 32), 8),
                                          ((1, 16, 16, 64), 16),
                                          ((3, 7, 5, 16), 4)])
def test_gn_silu_kernel_matches_reference(shape, groups, dtype):
    k = jax.random.key(0)
    x = jax.random.normal(k, shape, jnp.float32).astype(dtype)
    gamma = jax.random.normal(jax.random.fold_in(k, 1), (shape[-1],))
    beta = jax.random.normal(jax.random.fold_in(k, 2), (shape[-1],))
    with pltpu.force_tpu_interpret_mode():
        got = gn_silu_pallas(x, gamma, beta, groups)
    want = _gn_reference(x, gamma, beta, groups, 1e-5, True)
    atol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol)
    assert got.dtype == x.dtype


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("nq,nk,d", [(256, 256, 64), (512, 128, 32),
                                     (256, 384, 128)])
def test_attention_kernel_matches_reference(nq, nk, d, dtype):
    k = jax.random.key(3)
    q = jax.random.normal(jax.random.fold_in(k, 0), (2, 2, nq, d), jnp.float32).astype(dtype)
    kk = jax.random.normal(jax.random.fold_in(k, 1), (2, 2, nk, d), jnp.float32).astype(dtype)
    v = jax.random.normal(jax.random.fold_in(k, 2), (2, 2, nk, d), jnp.float32).astype(dtype)
    scale = d ** -0.5
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_pallas(q, kk, v, scale)
    assert got is not None
    want = attention_reference(q, kk, v, scale)
    atol = 2e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol)


def test_attention_kernel_rejects_unsupported_shapes():
    q = jnp.zeros((1, 1, 100, 64))   # Nq not 256-aligned
    assert flash_attention_pallas(q, q, q, 1.0) is None
