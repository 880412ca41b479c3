import numpy as np

import tpucdc.api as api


def test_build_config_overrides():
    cfg = api.build_config("tiny", {"train.rd_lambda": 4.0,
                                    "sample.steps": 3})
    assert cfg.train.rd_lambda == 4.0
    assert cfg.sample.steps == 3


def test_load_runtime_roundtrip():
    rt = api.load_runtime("tiny", overrides={"sample.steps": 2})
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3),
                                            dtype=np.uint8)
    out = rt.decompress(rt.compress(img), steps=2)
    assert out.shape == img.shape
