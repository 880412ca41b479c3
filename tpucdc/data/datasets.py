"""Dataset loaders: Kodak / CLIC2020 / Tecnick + synthetic fallback
(SURVEY.md C21 loaders; BASELINE.json:2,:10,:11).

This build environment has zero egress, so the standard eval sets cannot be
downloaded here. Loaders read from a local directory when present (env var or
conventional path) and otherwise fall back to a DETERMINISTIC synthetic set
(flagged via ``EvalDataset.synthetic``) so every eval-harness code path stays
exercised; R-D numbers on synthetic data are self-baseline only (BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import os
import pathlib
from typing import Iterator

import numpy as np

_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".ppm")

_SPECS = {
    "kodak": ("TPUCDC_KODAK_DIR", ["/root/data/kodak", "./data/kodak"],
              24, (512, 768)),
    "clic2020": ("TPUCDC_CLIC_DIR", ["/root/data/clic2020", "./data/clic2020"],
                 8, (1024, 1536)),
    "tecnick": ("TPUCDC_TECNICK_DIR", ["/root/data/tecnick", "./data/tecnick"],
                8, (1200, 1200)),
}


@dataclasses.dataclass
class EvalDataset:
    name: str
    images: list[np.ndarray]          # HWC uint8
    synthetic: bool

    def __len__(self):
        return len(self.images)

    def __iter__(self):
        return iter(self.images)


def _load_dir(path: pathlib.Path) -> list[np.ndarray]:
    from PIL import Image
    files = sorted(p for p in path.iterdir() if p.suffix.lower() in _EXTS)
    return [np.asarray(Image.open(f).convert("RGB")) for f in files]


def synthetic_images(n: int, h: int, w: int, seed: int = 0) -> list[np.ndarray]:
    """Deterministic natural-image-like synthetics: smooth multi-scale fields
    plus edges — compressible and non-trivial for the codec."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        img = np.zeros((h, w, 3), np.float64)
        for scale in (4, 8, 16, 32):
            base = rng.normal(size=(max(h // scale, 1), max(w // scale, 1), 3))
            img += np.kron(base, np.ones((scale, scale, 1)))[:h, :w] / scale
        # Hard edges: random rectangles.
        for _ in range(6):
            i0, j0 = rng.integers(0, h), rng.integers(0, w)
            di, dj = rng.integers(h // 8, h // 2), rng.integers(w // 8, w // 2)
            img[i0:i0 + di, j0:j0 + dj] += rng.normal(scale=0.3, size=(3,))
        img = (img - img.min()) / (np.ptp(img) + 1e-9)
        out.append((img * 255).astype(np.uint8))
    return out


def eval_dataset(name: str) -> EvalDataset:
    env, paths, n_synth, (h, w) = _SPECS[name]
    cand = [os.environ.get(env)] + paths
    for p in cand:
        if p and pathlib.Path(p).is_dir():
            imgs = _load_dir(pathlib.Path(p))
            if imgs:
                return EvalDataset(name, imgs, synthetic=False)
    return EvalDataset(name, synthetic_images(n_synth, h, w,
                                              seed=hash(name) % 2**31),
                       synthetic=True)


def kodak() -> EvalDataset:
    return eval_dataset("kodak")


def clic2020() -> EvalDataset:
    return eval_dataset("clic2020")


def tecnick() -> EvalDataset:
    return eval_dataset("tecnick")


def train_crop_iterator(images: list[np.ndarray], batch_size: int,
                        crop: int, seed: int = 0) -> Iterator[np.ndarray]:
    """Infinite iterator of random-crop + flip batches in [-1, 1] f32.

    Deterministic given (images, seed) and checkpointable by step count: the
    per-batch RNG is derived from the global batch index, so resuming at step
    N reproduces the exact batch stream (SURVEY.md §5.3 preemption safety).
    """
    usable = [im for im in images
              if im.shape[0] >= crop and im.shape[1] >= crop]
    if not usable:
        raise ValueError(f"no images at least {crop}px on both sides")
    batch_idx = 0
    while True:
        rng = np.random.default_rng((seed, batch_idx))
        out = np.empty((batch_size, crop, crop, 3), np.float32)
        for b in range(batch_size):
            im = usable[rng.integers(len(usable))]
            i = rng.integers(im.shape[0] - crop + 1)
            j = rng.integers(im.shape[1] - crop + 1)
            patch = im[i:i + crop, j:j + crop]
            if rng.random() < 0.5:
                patch = patch[:, ::-1]
            out[b] = patch.astype(np.float32) / 127.5 - 1.0
        batch_idx += 1
        yield out
