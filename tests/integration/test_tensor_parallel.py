"""Tensor-parallel sharding rules (SURVEY.md §2.3 TP row, added round 2):
training with params/EMA/opt moments sharded over the ``model`` axis must
produce the same optimization trajectory as the replicated DP run — XLA
inserts the collectives; the math is identical up to reduction order."""

import dataclasses

import jax
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.parallel.tp_rules import leaf_spec, tree_shardings
from tpucdc.pipelines import train as train_lib
from tpucdc.runtime import make_mesh


def _cfg(sharding):
    cfg = presets.tiny()
    return dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, batch_size=4, crop_size=64, warmup_steps=1, lr=1e-3,
        log_every=1, param_sharding=sharding))


def test_leaf_spec_rule():
    assert leaf_spec((3, 3, 16, 32), 4) == jax.sharding.PartitionSpec(
        None, None, None, "model")
    assert leaf_spec((32,), 4)[-1] == "model"
    assert leaf_spec((3, 3, 16, 32), 1) == jax.sharding.PartitionSpec()
    assert leaf_spec((30,), 4) == jax.sharding.PartitionSpec()   # 30 % 4 != 0
    assert leaf_spec((), 4) == jax.sharding.PartitionSpec()      # scalar step


def test_tp_matches_replicated_training():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")

    def run(sharding, mesh):
        cfg = _cfg(sharding)
        rng = np.random.default_rng(0)

        def batches():
            while True:
                yield rng.normal(
                    scale=0.3, size=(4, 64, 64, 3)).astype(np.float32)
        metrics = {}
        _, state = train_lib.fit(
            cfg, batches(), mesh=mesh, num_steps=3,
            writer=lambda step, m: metrics.update(m))
        return state, metrics

    # data=2 x model=4 tensor-sharded vs data=2 (model=1) replicated.
    state_tp, m_tp = run("tensor", make_mesh(n_data=2, n_model=4))
    state_rep, m_rep = run("replicated",
                           make_mesh(n_data=2, devices=jax.devices()[:2]))

    assert int(state_tp.step) == int(state_rep.step) == 3
    for k in ("loss", "bpp", "mse_eps"):
        np.testing.assert_allclose(m_tp[k], m_rep[k], rtol=2e-3, atol=2e-4)
    # Parameters agree leaf-wise (same trajectory, different layout). Bound:
    # AdamW moves each weight ~lr per step regardless of gradient magnitude
    # (rsqrt normalization), so a reduction-order sign flip on a near-zero
    # gradient costs up to one full step — allow ~2 of 3 steps' worth.
    flat_tp = jax.tree_util.tree_leaves(state_tp.params)
    flat_rep = jax.tree_util.tree_leaves(state_rep.params)
    worst = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(flat_tp, flat_rep))
    assert worst < 2e-3, worst


def test_tp_shardings_cover_wide_leaves():
    cfg = _cfg("tensor")
    mesh = make_mesh(n_data=2, n_model=4)
    _, state = train_lib.create_state(
        cfg, jax.random.key(0), mesh=mesh)
    sh = tree_shardings(state, mesh)
    specs = [s.spec for s in jax.tree_util.tree_leaves(
        sh, is_leaf=lambda x: hasattr(x, "spec"))]
    n_sharded = sum(1 for s in specs if len(s) and s[-1] == "model")
    assert n_sharded > 20   # conv kernels + moments actually split
