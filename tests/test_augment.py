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


# ------------------------------------------------------------- DA5 extras

def _da5_cfg(patch=(8, 8, 8), **over):
    """A DA5-flavored config on a cubic patch (all axes matching)."""
    base = dict(
        patch_size=patch, p_rotation=0.4, p_rot_per_axis=0.5,
        p_scale=0.2, scale_range=(0.7, 1.43), independent_scale=True,
        p_rot90=0.5, rot90_axes=((0, 1), (1, 0), (0, 2), (2, 0),
                                 (1, 2), (2, 1)),
        p_transpose=0.5, transpose_axes=(0, 1, 2),
        median_oneof_blur=True, p_median=0.2, median_size=(2, 8),
        p_blur=0.2, blur_sigma=(0.3, 1.5),
        p_brightness=0.0, p_brightness_additive=0.1,
        p_contrast=0.2, contrast_range=(0.5, 2.0),
        p_contrast_preserve=0.5, p_contrast_per_channel=0.5,
        p_lowres=0.15, lowres_zoom=(0.25, 1.0),
        p_gamma_invert=0.1, p_gamma=0.1, gamma_second_invert=True,
        p_blank_rect=0.4, p_bright_grad=0.3, p_local_gamma=0.3,
        p_sharpen=0.2)
    base.update(over)
    return AugmentConfig(**base)


@pytest.fixture(scope="module")
def cubic_batch():
    rs = np.random.RandomState(5)
    data = jnp.asarray(rs.normal(size=(2, 2, 10, 10, 10)), jnp.float32)
    seg = jnp.asarray(rs.randint(-1, 3, (2, 10, 10, 10)), jnp.int32)
    return data, seg


def test_da5_gated_matches_vmap(cubic_batch):
    """The DA5 extras must produce identical draws and taken-branch math in
    both execution modes (the same statement the base pipeline pins)."""
    data, seg = cubic_batch
    cfg = _da5_cfg()
    for key in (jax.random.PRNGKey(k) for k in range(8)):
        dg, sg = augment_batch(key, data, seg, cfg, channels_first=True,
                               mode="gated")
        dv, sv = augment_batch(key, data, seg, cfg, channels_first=True,
                               mode="vmap")
        np.testing.assert_array_equal(np.asarray(sg), np.asarray(sv))
        np.testing.assert_allclose(np.asarray(dg), np.asarray(dv),
                                   rtol=2e-4, atol=2e-4)


def test_da5_defaults_do_not_change_base_stream(batch):
    """All DA5 fields default-off: the base pipeline's outputs are bitwise
    unchanged by the DA5-capable code (draw-stream pin)."""
    data, seg = batch
    cfg = AugmentConfig(patch_size=(8, 10, 12))
    cfg_da5_off = AugmentConfig(patch_size=(8, 10, 12), p_rot90=0.0,
                                p_transpose=0.0, p_median=0.0,
                                p_blank_rect=0.0, p_bright_grad=0.0,
                                p_local_gamma=0.0, p_sharpen=0.0,
                                p_brightness_additive=0.0)
    key = jax.random.PRNGKey(21)
    d1, s1 = augment_batch(key, data, seg, cfg)
    d2, s2 = augment_batch(key, data, seg, cfg_da5_off)
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_da5_seg_geometry_follows_data(cubic_batch):
    """rot90/transpose must move data and seg together: a seg rebuilt from
    a data channel that encodes the label must match the transformed seg."""
    data, seg = cubic_batch
    # channel 0 encodes the seg value exactly
    data = data.at[:, 0].set(seg.astype(jnp.float32))
    cfg = _da5_cfg(
        # geometry only: rot90 + transpose (+ mirror), no intensity noise
        p_rotation=0.0, p_scale=0.0, p_median=0.0, p_blur=0.0, p_noise=0.0,
        p_brightness_additive=0.0, p_contrast=0.0, p_lowres=0.0,
        p_gamma=0.0, p_gamma_invert=0.0, p_blank_rect=0.0,
        p_bright_grad=0.0, p_local_gamma=0.0, p_sharpen=0.0,
        patch_size=(10, 10, 10))
    for k in range(6):
        d, s = augment_batch(jax.random.PRNGKey(k), data, seg, cfg,
                             channels_first=True)
        np.testing.assert_array_equal(
            np.asarray(d[:, 0]).astype(np.int32), np.asarray(s))


def test_da5_median_smooths_impulses():
    """A forced median pass must remove isolated impulses (the defining
    property of a median filter) while a mean blur would only spread them."""
    from multimodal_mvd_seg_tpu.data.augment import _median_channel
    vol = np.zeros((9, 9, 9), np.float32)
    vol[4, 4, 4] = 100.0  # isolated impulse
    cfg = AugmentConfig(patch_size=(9, 9, 9), median_size=(3, 4))
    out = np.asarray(_median_channel(jnp.asarray(vol), jnp.int32(0), cfg))
    assert out[4, 4, 4] == 0.0
    assert np.abs(out).max() == 0.0


def test_da5_blank_rect_sets_region_to_mean():
    from multimodal_mvd_seg_tpu.data.augment import _blank_rect_channel
    rs = np.random.RandomState(0)
    vol = jnp.asarray(rs.normal(size=(24, 24, 24)), jnp.float32)
    cfg = AugmentConfig(patch_size=(24, 24, 24), blank_rect_num=(1, 2))
    out = np.asarray(_blank_rect_channel(jax.random.PRNGKey(3), vol, cfg))
    changed = out != np.asarray(vol)
    assert changed.any(), "one rectangle must always be drawn (num in [1,2))"
    # the changed region is constant and equals the original mean there
    region_vals = out[changed]
    assert np.allclose(region_vals, region_vals[0], atol=1e-5)
    assert np.allclose(region_vals[0], np.asarray(vol)[changed].mean(),
                       atol=1e-4)


def test_da5_sharpen_amplifies_edges():
    from multimodal_mvd_seg_tpu.data.augment import _sharpen_channel
    x = np.zeros((8, 8, 8), np.float32)
    x[:, :, 4:] = 1.0  # step edge
    cfg = AugmentConfig(patch_size=(8, 8, 8), sharpen_strength=(0.5, 0.5))
    out = np.asarray(_sharpen_channel(jax.random.PRNGKey(0),
                                      jnp.asarray(x), cfg))
    # overshoot on both sides of the edge, interior untouched
    assert out[4, 4, 3] < 0.0 and out[4, 4, 4] > 1.0
    assert out[4, 4, 0] == 0.0 and out[4, 4, 7] == 1.0


def test_da5_median_blur_oneof_exclusive():
    """Over many keys, median and blur never fire together (OneOf)."""
    from multimodal_mvd_seg_tpu.data.augment import (_median_one,
                                                     _gaussian_blur_one)
    rs = np.random.RandomState(1)
    data = jnp.asarray(rs.normal(size=(2, 8, 8, 8)), jnp.float32)
    cfg = _da5_cfg(p_median=1.0, p_blur=1.0, p_median_per_channel=1.0,
                   p_blur_per_channel=1.0)
    fired_median = fired_blur = 0
    for k in range(24):
        key = jax.random.fold_in(jax.random.PRNGKey(100), k)
        choose_median = jax.random.uniform(
            jax.random.fold_in(key, 77)) < 0.5
        med = _median_one(key, data, cfg, choose_median, gated=False)
        blu = _gaussian_blur_one(key, data, cfg, suppress=choose_median)
        m = not np.allclose(np.asarray(med), np.asarray(data))
        b = not np.allclose(np.asarray(blu), np.asarray(data))
        assert not (m and b), "median and blur fired together"
        fired_median += m
        fired_blur += b
    assert fired_median > 0 and fired_blur > 0


def test_da5_dense_median_matches_scipy_exactly():
    """The DA5 median is the EXACT dense k^dim filter — bitwise equal to
    scipy.ndimage.median_filter (the kernel batchgenerators'
    MedianFilterTransform applies) for every size DA5 draws, including
    even sizes and boundary voxels (closes the round-3 deviation note)."""
    from scipy.ndimage import median_filter
    from multimodal_mvd_seg_tpu.data.augment import _median_dense

    rs = np.random.RandomState(3)
    v = rs.normal(size=(10, 11, 12)).astype(np.float32)
    for k in range(2, 8):
        ours = np.asarray(_median_dense(jnp.asarray(v), k))
        ref = median_filter(v, size=k, mode="reflect")
        np.testing.assert_array_equal(ours, ref)
    v2 = rs.normal(size=(9, 13)).astype(np.float32)
    for k in (2, 5):
        np.testing.assert_array_equal(
            np.asarray(_median_dense(jnp.asarray(v2), k)),
            median_filter(v2, size=k, mode="reflect"))
