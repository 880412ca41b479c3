"""Eval-harness integration on the tiny runtime (SURVEY.md C21)."""

import dataclasses

import jax
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.data.datasets import EvalDataset, synthetic_images
from tpucdc.eval.harness import EvalOptions, evaluate_dataset
from tpucdc.model import init_model
from tpucdc.pipelines.codec_runtime import CodecRuntime


def test_evaluate_dataset_rows_and_aggregate():
    cfg = presets.tiny()
    cfg = dataclasses.replace(
        cfg, sample=dataclasses.replace(cfg.sample, steps=2))
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    runtime = CodecRuntime(cfg, model, params)
    ds = EvalDataset("synthetic", synthetic_images(2, 64, 64, seed=5), True)

    seen = []
    res = evaluate_dataset(runtime, ds, EvalOptions(steps=2),
                           on_row=seen.append)
    assert len(res["rows"]) == 2 and len(seen) == 2
    for row in res["rows"]:
        for key in ("bpp", "psnr", "ms_ssim", "lpips", "decode_s",
                    "steps_per_sec", "dataset", "synthetic"):
            assert key in row, key
        assert row["bpp"] > 0 and np.isfinite(row["psnr"])
    agg = res["aggregate"]
    assert agg["num_images"] == 2
    assert agg["bpp"] == pytest.approx(
        np.mean([r["bpp"] for r in res["rows"]]))


def test_grain_pipeline_batches():
    from tpucdc.data.grain_pipeline import grain_crop_iterator
    imgs = synthetic_images(2, 96, 96, seed=0)
    it = grain_crop_iterator(imgs, 4, 64, seed=3)
    b = next(it)
    assert b.shape == (4, 64, 64, 3)
    assert b.dtype == np.float32
    assert -1.0 <= b.min() and b.max() <= 1.0
