"""Checkpoint/resume: bit-exact state restore + deterministic data iterator
(SURVEY.md §5.3/§5.4 preemption safety)."""

import dataclasses

import jax
import numpy as np
import pytest

from tpucdc import presets
from tpucdc.data import synthetic_images, train_crop_iterator
from tpucdc.pipelines import train as train_lib
from tpucdc.utils import CheckpointManager


def test_checkpoint_roundtrip(tmp_path):
    cfg = presets.tiny()
    _, state = train_lib.create_state(cfg, jax.random.key(0))
    mngr = CheckpointManager(tmp_path / "ckpt")
    mngr.save(3, state, wait=True)
    assert mngr.latest_step() == 3

    _, fresh = train_lib.create_state(cfg, jax.random.key(1))
    restored = mngr.restore(fresh)
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    mngr.close()


def test_crop_iterator_deterministic_resume():
    imgs = synthetic_images(3, 96, 96, seed=0)
    it1 = train_crop_iterator(imgs, 4, 64, seed=5)
    batches = [next(it1) for _ in range(5)]
    # "Resume": a fresh iterator skipped to batch 3 reproduces batch 3.
    it2 = train_crop_iterator(imgs, 4, 64, seed=5)
    for _ in range(3):
        next(it2)
    np.testing.assert_array_equal(next(it2), batches[3])


def test_params_npz_roundtrip(tmp_path):
    """save_params_npz/load_params_npz: exact weights, structure-checked."""
    from tpucdc.utils.checkpoint import load_params_npz, save_params_npz

    cfg = presets.tiny()
    _, state = train_lib.create_state(cfg, jax.random.key(0))
    path = tmp_path / "ema.npz"
    save_params_npz(state.ema_params, path)
    abstract = jax.eval_shape(lambda: state.ema_params)
    restored = load_params_npz(path, abstract)
    for x, y in zip(jax.tree_util.tree_leaves(state.ema_params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # Shape mismatch must raise, not mis-assign.
    bad = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct((s.shape[0] + 1,) + tuple(s.shape[1:]),
                                       s.dtype), abstract)
    with pytest.raises(ValueError):
        load_params_npz(path, bad)
