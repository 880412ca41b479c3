"""Fault injection + preemption-safe resume (SURVEY.md §5.3): a training run
killed at step N resumes bit-exactly from the last checkpoint."""

import dataclasses
import subprocess
import sys
import textwrap

import jax
import numpy as np

from tpucdc import presets
from tpucdc.data import synthetic_images, train_crop_iterator
from tpucdc.pipelines import train as train_lib
from tpucdc.utils import CheckpointManager


def _tiny_cfg():
    cfg = presets.tiny()
    return dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, batch_size=2, crop_size=64, warmup_steps=1, lr=1e-3))


def test_resume_continues_from_checkpoint(tmp_path):
    cfg = dataclasses.replace(
        _tiny_cfg(), train=dataclasses.replace(
            _tiny_cfg().train, checkpoint_every=2))
    imgs = synthetic_images(2, 64, 64, seed=0)
    mesh = train_lib.make_mesh(n_data=2)

    mngr = CheckpointManager(tmp_path / "ckpt")
    data = train_crop_iterator(imgs, 2, 64, seed=1)
    train_lib.fit(cfg, data, mesh=mesh, num_steps=2,
                  checkpointer=lambda step, st: mngr.save(step, st, wait=True))
    assert mngr.latest_step() == 2

    # Resume: restore step-2 state, run 1 more step; the data iterator is
    # deterministic in the batch index so the stream picks up exactly.
    _, abstract = train_lib.create_state(cfg, jax.random.key(cfg.train.seed))
    restored = mngr.restore(abstract)
    data = train_crop_iterator(imgs, 2, 64, seed=1)
    for _ in range(int(restored.step)):
        next(data)   # skip consumed batches
    _, state2 = train_lib.fit(cfg, data, mesh=mesh, start_state=restored,
                              num_steps=1)
    assert int(state2.step) == 3


def test_fault_inject_kills_at_step(tmp_path):
    """--fault-inject debug flag exits the process at the target step."""
    script = textwrap.dedent("""
        import dataclasses, os
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        # Mirror tests/conftest.py: persistent compile cache + opt-level-0
        # (the child process does not inherit the conftest's jax config).
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/tpucdc_jax_cpu_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        jax.config.update("jax_disable_most_optimizations", True)
        import numpy as np
        from tpucdc import presets
        from tpucdc.pipelines import train as train_lib
        cfg = presets.tiny()
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, batch_size=2, crop_size=64, warmup_steps=1,
            fault_inject_step=2))
        from tpucdc.runtime import make_mesh
        def batches():
            while True:
                yield np.zeros((2, 64, 64, 3), np.float32)
        train_lib.fit(cfg, batches(), mesh=make_mesh(n_data=1), num_steps=10)
    """)
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, timeout=420)
    assert proc.returncode == 42, proc.stderr[-2000:]
