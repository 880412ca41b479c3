"""High-level Python API (SURVEY.md §1.2 L8: "CLI + tpucdc.api").

One-liners over the pipelines for library users:

    import tpucdc.api as tpucdc
    runtime = tpucdc.load_runtime(preset="flagship", checkpoint="/run/ckpt")
    blob = runtime.compress(img_u8)
    img = runtime.decompress(blob)

    tpucdc.train(preset="tiny", steps=1000, workdir="/tmp/run")
"""

from __future__ import annotations

import pathlib
from typing import Optional

import jax

from tpucdc import presets
from tpucdc.config import Config, apply_overrides
from tpucdc.model import init_model
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.pipelines import train as train_lib


def build_config(preset: str = "flagship",
                 overrides: Optional[dict] = None) -> Config:
    cfg = {"tiny": presets.tiny, "flagship": presets.flagship}[preset]()
    if overrides:
        cfg = apply_overrides(cfg, {k: str(v) for k, v in overrides.items()})
    return cfg.validated()


def load_runtime(preset: str = "flagship", checkpoint: Optional[str] = None,
                 overrides: Optional[dict] = None,
                 use_ema: bool = True) -> CodecRuntime:
    """Build a ready-to-serve CodecRuntime, optionally from a checkpoint."""
    cfg = build_config(preset, overrides)
    model, params = init_model(cfg.model, jax.random.key(0),
                               image_size=cfg.train.crop_size)
    if checkpoint:
        from tpucdc.utils.checkpoint import CheckpointManager
        mngr = CheckpointManager(checkpoint)
        _, abstract = train_lib.create_state(cfg, jax.random.key(0))
        state = mngr.restore(abstract)
        params = state.ema_params if use_ema else state.params
    return CodecRuntime(cfg, model, params)


def train(preset: str = "tiny", steps: int = 1000,
          workdir: str = "/tmp/tpucdc", dataset: str = "kodak",
          overrides: Optional[dict] = None):
    """Run R-D training; returns (model, final TrainState)."""
    from tpucdc.data import eval_dataset, train_crop_iterator
    from tpucdc.runtime import make_mesh
    from tpucdc.utils import CheckpointManager, MetricLogger

    cfg = build_config(preset, overrides)
    tag = f"lambda{cfg.train.rd_lambda:g}"
    wd = pathlib.Path(workdir) / tag
    logger = MetricLogger(wd / "logs")
    ckpt = CheckpointManager(wd / "ckpt")
    ds = eval_dataset(dataset)
    data = train_crop_iterator(ds.images, cfg.train.batch_size,
                               cfg.train.crop_size, seed=cfg.train.seed, as_uint8=True)
    return train_lib.fit(
        cfg, data, mesh=make_mesh(), writer=logger,
        checkpointer=lambda step, st: ckpt.save(step, st), num_steps=steps)
