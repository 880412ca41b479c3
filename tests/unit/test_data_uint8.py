"""uint8 batch path (round 2): train_crop_iterator(as_uint8=True) + the train
step's on-device [-1,1] conversion must match the f32 host-side path exactly
(same uint8 source, same /127.5 - 1 mapping)."""

import jax.numpy as jnp
import numpy as np

from tpucdc.data import synthetic_images, train_crop_iterator


def test_uint8_iterator_matches_f32_after_device_convert():
    imgs = synthetic_images(4, 96, 96, seed=3)
    it_f32 = train_crop_iterator(imgs, 4, 64, seed=7)
    it_u8 = train_crop_iterator(imgs, 4, 64, seed=7, as_uint8=True)
    for _ in range(3):
        b_f32 = next(it_f32)
        b_u8 = next(it_u8)
        assert b_u8.dtype == np.uint8 and b_f32.dtype == np.float32
        # the train step's device-side conversion
        conv = np.asarray(
            jnp.asarray(b_u8).astype(jnp.float32) * (1.0 / 127.5) - 1.0)
        np.testing.assert_allclose(conv, b_f32, atol=1e-6)
