"""LPIPS-style perceptual distance (SURVEY.md C21; BASELINE.json:2,:11).

Canonical LPIPS needs pretrained VGG/AlexNet features; this build environment
has zero egress and no cached weights (documented in BASELINE.md), so the
extractor loads real weights from an .npz when available and otherwise falls
back to a DETERMINISTIC random-conv feature stack. Random-filter perceptual
metrics are a recognized proxy (correlate with human judgment far better than
MSE); ``PerceptualMetric.kind`` reports which path is active so eval output
is never silently mislabeled.

Weights .npz layout (set TPUCDC_LPIPS_WEIGHTS=/path/to/file.npz):
  convN_kernel [kh, kw, cin, cout], convN_bias [cout] for N = 0..4
  (VGG16 conv1_2/conv2_2/conv3_3/conv4_3/conv5_3 taps),
  linN [c] per-layer channel weights.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

_LAYER_CHANNELS = (64, 128, 256, 512, 512)


def _random_params(seed: int = 0):
    """Deterministic He-init conv stack standing in for VGG features."""
    rng = np.random.default_rng(seed)
    params = []
    cin = 3
    for cout in _LAYER_CHANNELS:
        k = rng.normal(size=(3, 3, cin, cout)) * np.sqrt(2.0 / (9 * cin))
        b = np.zeros(cout)
        w = np.abs(rng.normal(size=cout)) / cout
        params.append((jnp.asarray(k, jnp.float32),
                       jnp.asarray(b, jnp.float32),
                       jnp.asarray(w, jnp.float32)))
        cin = cout
    return params


def _load_npz(path: str):
    data = np.load(path)
    params = []
    for i in range(5):
        params.append((jnp.asarray(data[f"conv{i}_kernel"], jnp.float32),
                       jnp.asarray(data[f"conv{i}_bias"], jnp.float32),
                       jnp.asarray(data[f"lin{i}"], jnp.float32)))
    return params


class PerceptualMetric:
    """Callable LPIPS(-proxy): (img_a, img_b uint8 HWC) -> float distance."""

    def __init__(self, weights_path: str | None = None, seed: int = 0):
        weights_path = weights_path or os.environ.get("TPUCDC_LPIPS_WEIGHTS")
        if weights_path and os.path.exists(weights_path):
            self.params = _load_npz(weights_path)
            self.kind = "lpips"
        else:
            self.params = _random_params(seed)
            self.kind = "lpips-random-proxy"
        self._fn = jax.jit(self._distance)

    def _features(self, x):
        """x: [B,H,W,3] in [-1,1] → list of unit-normalized feature maps."""
        feats = []
        h = x
        for (k, b, _) in self.params:
            h = jax.lax.conv_general_dilated(
                h, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
            h = jax.nn.relu(h)
            norm = jnp.sqrt(jnp.sum(h * h, axis=-1, keepdims=True) + 1e-10)
            feats.append(h / norm)
            # stride-2 pool between taps (VGG-style pyramid)
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID")
        return feats

    def _distance(self, a, b):
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for (_, _, w), xa, xb in zip(self.params, fa, fb):
            d = jnp.square(xa - xb) * w
            total = total + jnp.mean(jnp.sum(d, axis=-1))
        return total

    def distance(self, a, b):
        """Differentiable batch distance on [-1,1] NHWC arrays (traceable —
        usable as a training loss term, pipelines/train.loss_fn)."""
        return self._distance(a, b)

    def __call__(self, img_a: np.ndarray, img_b: np.ndarray) -> float:
        a = jnp.asarray(img_a, jnp.float32)[None] / 127.5 - 1.0
        b = jnp.asarray(img_b, jnp.float32)[None] / 127.5 - 1.0
        return float(self._fn(a, b))
