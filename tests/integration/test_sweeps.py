"""Sweep drivers (BASELINE.json:9/:11): R-D sweep and step×guidance sweep
run end-to-end on the tiny runtime."""

import dataclasses

import jax
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.data.datasets import EvalDataset, synthetic_images
from tpucdc.eval.harness import EvalOptions, rd_sweep, step_guidance_sweep
from tpucdc.model import init_model
from tpucdc.pipelines.codec_runtime import CodecRuntime


@pytest.fixture(scope="module")
def setup():
    cfg = presets.tiny()
    cfg = dataclasses.replace(
        cfg, sample=dataclasses.replace(cfg.sample, steps=2))
    model, params = init_model(cfg.model, jax.random.key(0), image_size=64)
    ds = EvalDataset("synthetic", synthetic_images(1, 64, 64, seed=5), True)
    return cfg, model, params, ds


def test_step_guidance_sweep(setup):
    cfg, model, params, ds = setup
    rt = CodecRuntime(cfg, model, params)
    rows = step_guidance_sweep(
        rt, ds, steps_grid=(2,), guidance_grid=(1.0, 2.0),
        base_opts=EvalOptions(steps=2, compute_lpips=False))
    assert len(rows) == 2
    for r in rows:
        assert {"steps", "guidance", "bpp", "psnr", "fid"} <= set(r)
        assert np.isfinite(r["fid"])


def test_rd_sweep_driver(setup):
    cfg, model, params, ds = setup

    built = []

    def make_runtime(lam):
        c = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, rd_lambda=lam))
        built.append(lam)
        return CodecRuntime(c, model, params)

    points = rd_sweep(make_runtime, (8.0, 16.0), ds,
                      EvalOptions(steps=2, compute_lpips=False))
    assert built == [8.0, 16.0]
    assert [p["rd_lambda"] for p in points] == [8.0, 16.0]
    for p in points:
        assert p["bpp"] > 0 and np.isfinite(p["psnr"])
