"""TPU training demo: R-D train a mid-size model on-device, checkpoint, then
decode a 768×512 image with the trained EMA weights (full pipeline on TPU).

Produces JSONL metrics in /tmp/tpucdc_tpu_demo and prints a summary line.
"""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent))
import dataclasses
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np

from tpucdc.codec.transforms import CodecConfig
from tpucdc.config import Config, ModelConfig, SampleConfig, ScheduleConfig, TrainConfig
from tpucdc.data import synthetic_images, train_crop_iterator
from tpucdc.diffusion.conditioning import ConditioningConfig
from tpucdc.diffusion.unet import UNetConfig
from tpucdc.pipelines import train as train_lib
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.runtime import make_mesh
from tpucdc.utils import CheckpointManager, MetricLogger


def medium() -> Config:
    return Config(
        model=ModelConfig(
            codec=CodecConfig(hidden_channels=64, latent_channels=96,
                              hyper_channels=64, synthesis=True),
            cond=ConditioningConfig(feature_channels=32, token_dim=96,
                                    hidden_channels=96),
            unet=UNetConfig(base_channels=32, channel_mult=(1, 2, 3),
                            num_res_blocks=2, attn_levels=(2,), num_heads=4,
                            patch_size=4, groups=16),
            schedule=ScheduleConfig(kind="cosine", num_steps=1000),
        ),
        train=TrainConfig(batch_size=16, crop_size=128, lr=3e-4,
                          warmup_steps=100, rd_lambda=16.0, log_every=50),
        sample=SampleConfig(steps=50),
    ).validated()


def main(steps=800):
    cfg = medium()
    imgs = synthetic_images(64, 256, 256, seed=21)
    data = train_crop_iterator(imgs, cfg.train.batch_size,
                               cfg.train.crop_size, seed=1)
    logger = MetricLogger("/tmp/tpucdc_tpu_demo/logs", use_clu=False)
    mesh = make_mesh(n_data=1)

    t0 = time.time()
    model, state = train_lib.fit(cfg, data, mesh=mesh, writer=logger,
                                 num_steps=steps)
    train_s = time.time() - t0
    ckpt = CheckpointManager("/tmp/tpucdc_tpu_demo/ckpt")
    ckpt.save(steps, state, wait=True)

    runtime = CodecRuntime(cfg, model, state.ema_params)
    test = synthetic_images(1, 512, 768, seed=77)[0]
    blob = runtime.compress(test)
    recon = runtime.decompress(blob, steps=50)
    from tpucdc.eval.metrics import psnr, ms_ssim
    summary = {
        "train_steps": steps,
        "train_wall_s": round(train_s, 1),
        "steps_per_sec": round(steps / train_s, 3),
        "bpp_768x512": len(blob) * 8 / (512 * 768),
        "psnr": round(psnr(test, recon), 2),
        "ms_ssim": round(ms_ssim(test, recon), 4),
    }
    logger.write_row(summary)
    print("SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
