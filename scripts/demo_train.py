"""Round-1 demo: train the tiny preset on synthetic data (CPU), checkpoint,
then eval with real bitstreams -> JSONL rows in /tmp/tpucdc_demo."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent))
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/tpucdc_jax_cpu_cache")
import dataclasses, json
import numpy as np
from tpucdc import presets
from tpucdc.data import synthetic_images, train_crop_iterator
from tpucdc.pipelines import train as train_lib
from tpucdc.runtime import make_mesh
from tpucdc.utils import CheckpointManager, MetricLogger

cfg = presets.tiny()
cfg = dataclasses.replace(cfg, train=dataclasses.replace(
    cfg.train, batch_size=8, crop_size=64, lr=5e-4, warmup_steps=50,
    log_every=25, rd_lambda=8.0))
imgs = synthetic_images(32, 128, 128, seed=3)
data = train_crop_iterator(imgs, 8, 64, seed=0)
logger = MetricLogger("/tmp/tpucdc_demo/logs", use_clu=False)
ckpt = CheckpointManager("/tmp/tpucdc_demo/ckpt")
mesh = make_mesh(n_data=1)
model, state = train_lib.fit(cfg, data, mesh=mesh, writer=logger,
                             num_steps=600)
ckpt.save(600, state, wait=True)
print("TRAINED", int(state.step))

# Eval with the trained EMA params
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.eval.harness import EvalOptions, evaluate_dataset
from tpucdc.data.datasets import EvalDataset
runtime = CodecRuntime(cfg, model, state.ema_params)
ds = EvalDataset("synthetic64", synthetic_images(4, 128, 128, seed=99), True)
opts = EvalOptions(steps=16, compute_lpips=True)
res = evaluate_dataset(runtime, ds, opts, on_row=logger.write_row)
print("EVAL", json.dumps(res["aggregate"], default=float))
