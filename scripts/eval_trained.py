"""Eval the TPU-trained medium checkpoint: real-bitstream metrics on held-out
synthetic images (produces JSONL; tables via scripts/make_baseline_tables.py)."""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent))
import dataclasses, json, sys
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_tpucdc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
sys.path.insert(0, "/root/repo/scripts")
from train_tpu_demo import medium
from tpucdc.data.datasets import EvalDataset, synthetic_images
from tpucdc.eval.harness import EvalOptions, evaluate_dataset
from tpucdc.model import init_model
from tpucdc.pipelines.codec_runtime import CodecRuntime
from tpucdc.pipelines.train import create_state
from tpucdc.utils import CheckpointManager, MetricLogger

cfg = medium()
model, _ = init_model(cfg.model, jax.random.key(0), image_size=cfg.train.crop_size)
mngr = CheckpointManager("/tmp/tpucdc_tpu_demo/ckpt")
_, abstract = create_state(cfg, jax.random.key(0))
state = mngr.restore(abstract)
print("restored step", int(state.step))
rt = CodecRuntime(cfg, model, state.ema_params)
ds = EvalDataset("synthetic768", synthetic_images(4, 512, 768, seed=77), True)
logger = MetricLogger("/tmp/tpucdc_tpu_demo/eval", use_clu=False, echo=False)
res = evaluate_dataset(rt, ds, EvalOptions(steps=50), on_row=logger.write_row)
print("AGG", json.dumps(res["aggregate"], default=float))
