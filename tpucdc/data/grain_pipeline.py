"""grain-based training input pipeline (SURVEY.md C18, §3.1 — "grain:
decode+random crops, host threads").

Wraps the same deterministic crop sampling as datasets.train_crop_iterator in
a ``grain.MapDataset`` so prefetch happens on host worker threads, hiding the
host→device copy behind the train step (SURVEY.md §3.1 note). Falls back to
the plain iterator when grain is unavailable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np


def grain_crop_iterator(images: list[np.ndarray], batch_size: int,
                        crop: int, seed: int = 0,
                        prefetch: int = 4) -> Iterator[np.ndarray]:
    """Infinite prefetched batch iterator; deterministic per batch index."""
    try:
        import grain.python as grain
    except Exception:
        from tpucdc.data.datasets import train_crop_iterator
        return train_crop_iterator(images, batch_size, crop, seed)

    usable = [im for im in images
              if im.shape[0] >= crop and im.shape[1] >= crop]
    if not usable:
        raise ValueError(f"no images at least {crop}px on both sides")

    def make_batch(batch_idx: int) -> np.ndarray:
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
        return out

    ds = (grain.MapDataset.range(2 ** 62)
          .map(make_batch)
          .to_iter_dataset(grain.ReadOptions(num_threads=2,
                                             prefetch_buffer_size=prefetch)))
    return iter(ds)
