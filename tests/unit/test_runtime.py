import jax
import jax.numpy as jnp
import numpy as np

from tpucdc.runtime import (KeyChain, make_mesh, replicate, shard_batch,
                            data_sharding)


def test_make_mesh_all_devices():
    mesh = make_mesh()
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (jax.local_device_count(), 1)


def test_make_mesh_subset():
    mesh = make_mesh(n_data=4)
    assert mesh.devices.shape == (4, 1)


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    n = mesh.devices.shape[0]
    batch = {"x": jnp.zeros((2 * n, 8, 8, 3)), "y": jnp.zeros((2 * n,))}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding == data_sharding(mesh, 4)
    np.testing.assert_array_equal(np.asarray(sharded["x"]), 0)


def test_replicate():
    mesh = make_mesh()
    tree = {"w": jnp.ones((4, 4))}
    rep = replicate(tree, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_keychain_streams_independent():
    kc = KeyChain(jax.random.key(0))
    a = jax.random.normal(kc.key("noise", 3), (16,))
    b = jax.random.normal(kc.key("dropout", 3), (16,))
    c = jax.random.normal(kc.key("noise", 4), (16,))
    assert not np.allclose(a, b)
    assert not np.allclose(a, c)
    # Deterministic: same tag+step reproduces.
    a2 = jax.random.normal(kc.key("noise", 3), (16,))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
