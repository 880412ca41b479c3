"""Distortion metrics: PSNR and MS-SSIM in JAX (SURVEY.md C21;
BASELINE.json:2 — 'Kodak bpp vs PSNR/LPIPS at fixed steps')."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _to_f32(img):
    a = jnp.asarray(img)
    if a.dtype == jnp.uint8:
        a = a.astype(jnp.float32)
    return a.astype(jnp.float32)


def mse(a, b) -> float:
    return float(jnp.mean(jnp.square(_to_f32(a) - _to_f32(b))))


def psnr(a, b, peak: float = 255.0) -> float:
    """PSNR in dB between two uint8 (or 0..255 float) images."""
    m = mse(a, b)
    return float(10.0 * np.log10(peak * peak / max(m, 1e-12)))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    g = np.exp(-0.5 * ((np.arange(size) - size // 2) / sigma) ** 2)
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def _filter2(img, kernel):
    """Depthwise 'valid' 2-D filter over [B,H,W,C].

    Precision.HIGHEST: on TPU the default conv precision multiplies in
    bfloat16, and the E[x²]−μ² moment cancellation then errs by O(1%) —
    observed as MS-SSIM 1.028 on a high-variance η=1 recon in the r3 sweep
    (metrics must be exact; this conv is microscopic next to the decode)."""
    c = img.shape[-1]
    k = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c, precision=jax.lax.Precision.HIGHEST)


def _ssim_pair(a, b, peak):
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    kern = _gaussian_kernel()
    # Center on the global means before the E[x²]-μ² moment forms: at
    # 255-scale inputs the uncentered form cancels catastrophically in f32
    # and σ estimates err enough for cs (and MS-SSIM) to exceed 1 by ~1%
    # (observed 1.0063 in the r2 λ sweep). Window statistics are unchanged:
    # covariances are shift-invariant, and the luminance term adds the
    # global means back.
    ga = jnp.mean(a)
    gb = jnp.mean(b)
    a0, b0 = a - ga, b - gb
    mu_a0, mu_b0 = _filter2(a0, kern), _filter2(b0, kern)
    mu_a, mu_b = mu_a0 + ga, mu_b0 + gb
    saa = _filter2(a0 * a0, kern) - mu_a0 * mu_a0
    sbb = _filter2(b0 * b0, kern) - mu_b0 * mu_b0
    sab = _filter2(a0 * b0, kern) - mu_a0 * mu_b0
    lum = (2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
    cs = (2 * sab + c2) / (saa + sbb + c2)
    return jnp.mean(lum * cs), jnp.mean(cs)


_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _ms_ssim_jit(a, b, levels: int, peak: float):
    weights = jnp.asarray(_MSSSIM_WEIGHTS[:levels])
    weights = weights / jnp.sum(weights)
    vals = []
    for lvl in range(levels):
        ssim_full, cs = _ssim_pair(a, b, peak)
        vals.append(ssim_full if lvl == levels - 1 else cs)
        if lvl != levels - 1:
            a = jax.lax.reduce_window(a, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID") / 4.0
            b = jax.lax.reduce_window(b, 0.0, jax.lax.add, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID") / 4.0
    vals = jnp.stack(vals)
    return jnp.prod(jnp.maximum(vals, 1e-6) ** weights)


@functools.partial(jax.jit, static_argnums=(2,))
def _gmsd_jit(a, b, peak: float):
    # Rec.601 luminance, then 2×2 average-downsample (the paper's
    # preprocessing approximates the viewing-distance blur).
    w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    la = jnp.tensordot(a, w, axes=[[-1], [0]])[..., None]   # [B,H,W,1]
    lb = jnp.tensordot(b, w, axes=[[-1], [0]])[..., None]
    la = jax.lax.reduce_window(la, 0.0, jax.lax.add, (1, 2, 2, 1),
                               (1, 2, 2, 1), "VALID") / 4.0
    lb = jax.lax.reduce_window(lb, 0.0, jax.lax.add, (1, 2, 2, 1),
                               (1, 2, 2, 1), "VALID") / 4.0
    # Prewitt gradient magnitudes.
    hx = jnp.asarray([[1, 0, -1], [1, 0, -1], [1, 0, -1]],
                     jnp.float32) / 3.0
    def grad_mag(x):
        gx = _filter2(x, hx)
        gy = _filter2(x, hx.T)
        return jnp.sqrt(gx * gx + gy * gy + 1e-12)
    ga, gb = grad_mag(la), grad_mag(lb)
    c = 170.0 * (peak / 255.0) ** 2   # the paper's c for 8-bit range
    gms = (2.0 * ga * gb + c) / (ga * ga + gb * gb + c)
    return jnp.sqrt(jnp.mean(jnp.square(gms - jnp.mean(gms))))


def gmsd(a, b, peak: float = 255.0) -> float:
    """Gradient Magnitude Similarity Deviation (Xue, Zhang, Mou, Bovik
    2013) — a weight-free full-reference perceptual metric (LOWER is
    better; 0 = identical). Complements the LPIPS random-conv proxy
    (eval/lpips.py): GMSD needs no pretrained features, so it is exact in
    this zero-egress environment, and it ranks distortion types close to
    human opinion scores on TID/LIVE in the literature."""
    a = _to_f32(a)
    b = _to_f32(b)
    if a.ndim == 3:                   # HWC → BHWC, matching ms_ssim
        a, b = a[None], b[None]
    return float(_gmsd_jit(a, b, peak))


def ms_ssim(a, b, peak: float = 255.0) -> float:
    """Multi-scale SSIM (Wang et al.); level count adapts to image size."""
    a = _to_f32(a)
    b = _to_f32(b)
    if a.ndim == 3:
        a, b = a[None], b[None]
    # Each level needs >= 11px after the halvings.
    min_side = min(a.shape[1], a.shape[2])
    levels = 1
    while levels < 5 and min_side // (2 ** levels) >= 11:
        levels += 1
    return float(_ms_ssim_jit(a, b, levels, peak))
