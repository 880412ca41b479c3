"""Variable-rate demo on TPU: train ONE mid-size model over a 3-point λ grid
(gain units), then compress the same image at each quality — byte sizes and
PSNR should spread (BASELINE.json:9 with a single model)."""

import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent))
import dataclasses
import json

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np

from tpucdc.data import synthetic_images, train_crop_iterator
from tpucdc.eval.metrics import psnr
from tpucdc.model import init_model
from tpucdc.pipelines import train as train_lib
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.runtime import make_mesh
from tpucdc.utils import MetricLogger


def vr_config():
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    from train_tpu_demo import medium
    cfg = medium()
    codec = dataclasses.replace(cfg.model.codec, num_qualities=3)
    model = dataclasses.replace(cfg.model, codec=codec)
    train = dataclasses.replace(cfg.train, rd_lambdas=(2.0, 16.0, 128.0))
    return dataclasses.replace(cfg, model=model, train=train).validated()


def main(steps=6000):
    cfg = vr_config()
    imgs = synthetic_images(64, 256, 256, seed=21)
    data = train_crop_iterator(imgs, cfg.train.batch_size,
                               cfg.train.crop_size, seed=1)
    logger = MetricLogger("/tmp/tpucdc_vr_demo/logs", use_clu=False)
    model, state = train_lib.fit(cfg, data, mesh=make_mesh(n_data=1),
                                 writer=logger, num_steps=steps)

    rt = CodecRuntime(cfg, model, state.ema_params)
    test = synthetic_images(1, 512, 768, seed=77)[0]
    rows = []
    for q in range(3):
        blob = rt.compress(test, quality_id=q)
        recon = rt.decompress(blob, steps=25)
        rows.append({"quality": q,
                     "lambda": cfg.train.rd_lambdas[q],
                     "bpp": len(blob) * 8 / (512 * 768),
                     "psnr": round(psnr(test, recon), 2)})
        logger.write_row(rows[-1])
    print("VR-RD " + json.dumps(rows))


if __name__ == "__main__":
    main()
