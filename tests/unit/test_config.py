import dataclasses

import pytest

from tpucdc import presets
from tpucdc.config import Config, apply_overrides


def test_presets_validate():
    for preset in (presets.tiny(), presets.flagship()):
        assert preset.model.unet.cond_channels == \
            preset.model.cond.feature_channels
        assert preset.model.unet.cond_token_dim == preset.model.cond.token_dim
        assert preset.model.cond.latent_factor == \
            preset.model.codec.latent_factor


def test_dot_overrides():
    cfg = presets.tiny()
    cfg2 = apply_overrides(cfg, {"train.lr": "3e-3",
                                 "model.unet.base_channels": "24",
                                 "sample.steps": "7",
                                 "model.unet.channel_mult": "1,2,4"})
    assert cfg2.train.lr == 3e-3
    assert cfg2.model.unet.base_channels == 24
    assert cfg2.sample.steps == 7
    assert cfg2.model.unet.channel_mult == (1, 2, 4)
    # original untouched (frozen dataclasses)
    assert cfg.train.lr != 3e-3


def test_override_unknown_key_raises():
    with pytest.raises(KeyError):
        apply_overrides(Config(), {"nope.nothing": "1"})


def test_rd_grid_monotone():
    assert list(presets.RD_LAMBDA_GRID) == sorted(presets.RD_LAMBDA_GRID)
    cfgs = presets.rd_sweep(presets.tiny())
    assert [c.train.rd_lambda for c in cfgs] == list(presets.RD_LAMBDA_GRID)
