"""Tiny-config end-to-end training on the 8-device CPU mesh (SURVEY.md §4.2,
M3 exit criterion: R-D training runs, bpp + eps-MSE decrease)."""

import dataclasses

import jax
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.pipelines import train as train_lib
from tpucdc.runtime import make_mesh


def _synthetic_batches(batch, size, seed=0):
    rng = np.random.default_rng(seed)
    # Smooth low-frequency images (compressible, learnable signal).
    while True:
        base = rng.normal(size=(batch, 8, 8, 3)).astype(np.float32)
        img = np.repeat(np.repeat(base, size // 8, 1), size // 8, 2)
        yield np.clip(img * 0.5, -1, 1)


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = presets.tiny()
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=8, crop_size=64,
                                       warmup_steps=2, lr=1e-3, log_every=1))


def test_train_step_runs_and_improves(tiny_cfg):
    mesh = make_mesh()
    logs = []
    data = _synthetic_batches(tiny_cfg.train.batch_size, 64)
    model, state = train_lib.fit(
        tiny_cfg, data, mesh=mesh,
        writer=lambda step, m: logs.append(m), num_steps=20)
    assert int(state.step) == 20
    first, last = logs[0], logs[-1]
    assert np.isfinite(last["loss"])
    assert last["loss"] < first["loss"], (first, last)
    # EMA params track the trained params, not the init.
    assert all(np.isfinite(v) for v in last.values())


def test_train_state_sharding(tiny_cfg):
    mesh = make_mesh()
    _, state = train_lib.create_state(tiny_cfg, jax.random.key(0), mesh)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert leaf.sharding.is_fully_replicated
