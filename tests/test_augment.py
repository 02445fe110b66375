"""On-device augmentation pipeline: layout equivalence and semantics.

The pipeline computes in channels-first internally (see data/augment.py
module docstring — channels-last lane-pads c=2 to 128 on TPU); these tests
pin the legacy channels-last entry to the channels-first one bitwise, and
the no-op configuration to an exact center crop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_mvd_seg_tpu.data.augment import AugmentConfig, augment_batch


@pytest.fixture(scope="module")
def batch():
    rs = np.random.RandomState(3)
    data = jnp.asarray(rs.normal(size=(2, 10, 12, 14, 3)), jnp.float32)
    seg = jnp.asarray(rs.randint(-1, 3, (2, 10, 12, 14)), jnp.int32)
    return data, seg


def test_channels_first_matches_channels_last(batch):
    data, seg = batch
    cfg = AugmentConfig(patch_size=(8, 10, 12))
    key = jax.random.PRNGKey(11)
    d_cl, s_cl = augment_batch(key, data, seg, cfg)
    d_cf, s_cf = augment_batch(key, jnp.moveaxis(data, -1, 1), seg, cfg,
                               channels_first=True)
    assert d_cl.shape == (2, 8, 10, 12, 3)
    assert d_cf.shape == (2, 3, 8, 10, 12)
    np.testing.assert_array_equal(np.asarray(s_cl), np.asarray(s_cf))
    np.testing.assert_array_equal(np.asarray(d_cl),
                                  np.moveaxis(np.asarray(d_cf), 1, -1))
    assert bool(jnp.isfinite(d_cf).all())


def test_noop_config_is_center_crop(batch):
    data, seg = batch
    cfg = AugmentConfig(patch_size=(8, 10, 12), p_rotation=0.0, p_scale=0.0,
                        p_noise=0.0, p_blur=0.0, p_brightness=0.0,
                        p_contrast=0.0, p_lowres=0.0, p_gamma=0.0,
                        p_gamma_invert=0.0, mirror_axes=())
    d, s = augment_batch(jax.random.PRNGKey(0), data, seg, cfg)
    # center crop offsets: (in - out)//2 per axis = 1, 1, 1
    ref = np.asarray(data)[:, 1:9, 1:11, 1:13]
    np.testing.assert_allclose(np.asarray(d), ref, rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(s),
                                  np.asarray(seg)[:, 1:9, 1:11, 1:13])


def test_seg_labels_preserved(batch):
    data, seg = batch
    cfg = AugmentConfig(patch_size=(8, 10, 12))
    _, s = augment_batch(jax.random.PRNGKey(7), data, seg, cfg)
    assert set(np.unique(np.asarray(s))) <= set(np.unique(np.asarray(seg)))


def test_gated_matches_vmap(batch):
    """The gated (lax.cond) execution mode draws the same randomness and
    produces the same results as the original vmap mode — seg exact, data
    to float-association tolerance (the untriggered spatial branch blends
    per axis instead of summing 8 corner weights). 30 keys cover all
    transforms triggering at their reference probabilities."""
    data, seg = batch
    data_cf = jnp.moveaxis(data, -1, 1)
    cfg = AugmentConfig(patch_size=(8, 10, 12))
    for i in range(30):
        key = jax.random.PRNGKey(i)
        dg, sg = augment_batch(key, data_cf, seg, cfg, channels_first=True,
                               mode="gated")
        dv, sv = augment_batch(key, data_cf, seg, cfg, channels_first=True,
                               mode="vmap")
        np.testing.assert_array_equal(np.asarray(sg), np.asarray(sv))
        np.testing.assert_allclose(np.asarray(dg), np.asarray(dv),
                                   rtol=0, atol=1e-4, err_msg=f"key {i}")


def test_gated_sharded_matches_single_device(batch):
    """augment_batch(mesh=...) routes the gated scan through shard_map so
    each device branches on its own samples; results equal the unsharded
    gated path."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >=2 devices")
    n = 2 if len(devs) < 4 else 4
    data, seg = batch
    data = jnp.concatenate([data] * (n // 2), 0)
    seg = jnp.concatenate([seg] * (n // 2), 0)
    data_cf = jnp.moveaxis(data, -1, 1)
    cfg = AugmentConfig(patch_size=(8, 10, 12))
    mesh = Mesh(np.array(devs[:n]).reshape(n, 1), ("data", "model"))
    key = jax.random.PRNGKey(5)
    f = jax.jit(lambda k, d, s: augment_batch(
        k, d, s, cfg, channels_first=True, mesh=mesh),
        in_shardings=(None, NamedSharding(mesh, P("data")),
                      NamedSharding(mesh, P("data"))))
    dg, sg = f(key, data_cf, seg)
    d1, s1 = augment_batch(key, data_cf, seg, cfg, channels_first=True,
                           mode="gated")
    np.testing.assert_array_equal(np.asarray(sg), np.asarray(s1))
    np.testing.assert_allclose(np.asarray(dg), np.asarray(d1),
                               rtol=0, atol=1e-5)
