"""Forward-shape tests for the auxiliary model families (SelfAttnNet/
FinalNet, HybridNet, CSNet3D, WingsNet, HDenseFormer, attention decoders)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

PATCH = (8, 16, 16)
FEATS = (8, 16, 32)
KERNELS = [[3, 3, 3]] * 3
STRIDES = [[1, 1, 1], [2, 2, 2], [2, 2, 2]]
NCONV = [2, 2, 2]
NC = 3


def _x(channels=2, batch=1, patch=PATCH, seed=0):
    return jnp.asarray(np.random.RandomState(seed).normal(
        size=(batch, *patch, channels)), jnp.bfloat16)


def _init_apply(net, x, **init_kwargs):
    variables = net.init(jax.random.PRNGKey(0), x, train=False, **init_kwargs)
    return net.apply(variables, x, train=False, **init_kwargs)


def _dual_kwargs():
    return dict(features_per_stage=FEATS, n_conv_per_stage=NCONV,
                kernel_sizes=KERNELS, strides=STRIDES, num_classes=NC,
                hidden_size=FEATS[-1])


def test_selfattn_and_finalnet_shapes():
    from multimodal_mvd_seg_tpu.models.selfattn_net import (FinalNetv2,
                                                            FinalNetv4,
                                                            SelfAttnNetv1)
    x = _x()
    out = _init_apply(SelfAttnNetv1(**_dual_kwargs()), x)
    assert len(out) == 2  # deep supervision: 2 decoder stages
    assert out[0].shape == (1, *PATCH, NC)
    assert out[1].shape == (1, 4, 8, 8, NC)

    out = _init_apply(FinalNetv2(**_dual_kwargs()), x)
    assert out[0].shape == (1, *PATCH, NC)

    out1, out2 = _init_apply(FinalNetv4(**_dual_kwargs()), x)
    assert out1[0].shape == out2[0].shape == (1, *PATCH, NC)
    # inference mode averages the branches into one output
    net = FinalNetv4(**{**_dual_kwargs(), "do_ds": False})
    avg = _init_apply(net, x)
    assert avg.shape == (1, *PATCH, NC)


def test_finalnet_v1_distance_map():
    from multimodal_mvd_seg_tpu.models.selfattn_net import FinalNetv1
    x = _x()
    out, dist = _init_apply(FinalNetv1(**_dual_kwargs()), x)
    assert out[0].shape == (1, *PATCH, NC)
    assert dist.shape == (1, NC, *PATCH)
    assert np.all(np.asarray(dist) >= 0)


def test_hybridnet_forward():
    from multimodal_mvd_seg_tpu.models.hybrid_net import (HybridNet,
                                                          HybridNet_v1)
    # HybridNet's stem is (2,4,4) + 3×(2,2,2): patch divisible by (16,32,32)
    patch = (16, 32, 32)
    x = _x(patch=patch)
    # encoder dims must follow (2fs, 4fs, 8fs, 16fs) for the decoder's
    # additive skips, like the reference's (32,64,128,256) with fs=16
    net = HybridNet(num_classes=NC, feature_size=4, depths=(1, 1, 1, 1),
                    encoder_dims=(8, 16, 32, 64), hidden_size=64,
                    cnn_features=(8, 16, 32, 64, 64),
                    cnn_strides=((2, 4, 4), (2, 2, 2), (2, 2, 2), (2, 2, 2),
                                 (1, 1, 1)))
    logits, f1c, f2c, f1cl, f2cl = _init_apply(net, x)
    assert logits[0].shape == (1, *patch, NC)
    assert f1c.shape == (1, 256) and f2c.shape == (1, 256)
    assert f1cl.shape == (1, 1) and f2cl.shape == (1, 1)
    assert HybridNet_v1.__mro__[1].__name__ == "HybridNet"


def test_csnet_and_wingsnet():
    from multimodal_mvd_seg_tpu.models.csnet_wingsnet import CSNet3D, WingsNet
    x = _x(patch=(16, 16, 16))
    out = _init_apply(CSNet3D(classes=NC, channels=2, base_features=4), x)
    assert out.shape == (1, 16, 16, 16, NC)
    o1, o2 = _init_apply(WingsNet(in_channel=2, n_classes=2,
                                  base_features=4), x)
    assert o1.shape == o2.shape == (1, 16, 16, 16, 2)


def test_hdenseformer_block():
    from multimodal_mvd_seg_tpu.models.hdenseformer import (
        Dense_TransformerBlock)
    x = _x(patch=(8, 8, 8))
    out = _init_apply(Dense_TransformerBlock(in_channels=2, dim=16,
                                             patch_size=(4, 4, 4), depth=2,
                                             heads=4), x)
    assert out.shape == (1, 2, 2, 2, 16)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_cross_window_attention():
    from multimodal_mvd_seg_tpu.models.attn_decoders import (
        CrossWindowAttention3D)
    win = (2, 2, 2)
    N = 8
    x = jnp.asarray(np.random.RandomState(0).normal(size=(2, N, 16)),
                    jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).normal(size=(2, N, 16)),
                    jnp.float32)
    net = CrossWindowAttention3D(dim=16, window_size=win, num_heads=4)
    variables = net.init(jax.random.PRNGKey(0), x, y, train=False)
    out = net.apply(variables, x, y, train=False)
    assert out.shape == (2, N, 16)


def test_factory_csnet_wingsnet():
    from multimodal_mvd_seg_tpu.models.factory import (
        get_CSNet_from_plans, get_wingsnet_from_plans)
    from multimodal_mvd_seg_tpu.plans.plans_handler import PlansManager
    import __graft_entry__ as ge
    plans, dataset_json = ge._tiny_plans_and_dataset(patch=(16, 16, 16))
    pm = PlansManager(plans)
    cfg = pm.get_configuration("3d_fullres")
    assert get_CSNet_from_plans(pm, dataset_json, cfg, 2).classes == 3
    assert get_wingsnet_from_plans(pm, dataset_json, cfg, 2).in_channel == 2


def test_hybridnet_variant_bindings():
    """v1..v6 bind the reference's distinguishing configurations and all
    forward with the right output contract."""
    import jax
    from multimodal_mvd_seg_tpu.models import hybrid_net as H
    patch = (16, 32, 32)
    x = _x(patch=patch)
    small = dict(num_classes=NC, feature_size=4, depths=(1, 1, 1, 1),
                 encoder_dims=(8, 16, 32, 64), hidden_size=64,
                 cnn_features=(8, 16, 32, 64, 64))
    mirror = ((2, 4, 4), (2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 1, 1))
    plain = ((1, 1, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 4, 4))
    cfgs = {
        H.HybridNet_v1: dict(cnn_strides=plain),
        H.HybridNet_v2: dict(cnn_strides=plain),
        H.HybridNet_v3: {},
        H.HybridNet_v4: dict(cnn_strides=plain),
        H.HybridNet_v5: dict(cnn_strides=mirror),
        H.HybridNet_v6: dict(cnn_strides=plain),
    }
    for cls, extra in cfgs.items():
        net = cls(**small, **extra)
        logits, f1c, f2c, f1cl, f2cl = _init_apply(net, x)
        assert logits[0].shape == (1, *patch, NC), cls.__name__
        assert f1c.shape == (1, 256) and f1cl.shape == (1, 1), cls.__name__
    # the knobs really differ
    assert H.HybridNet_v1.decoder_source == "cnn_skips"
    assert H.HybridNet_v2.proj_residual is True
    assert H.HybridNet_v3.share_mode == "dual_trans"
    assert H.HybridNet_v4.share_mode == "joint"
    assert H.HybridNet_v5.skip_fusion == "enhanced"
    assert H.HybridNet_v6.skip_fusion == "none"


def test_distance_map_per_sample_per_channel():
    """The EDT callback must run per (sample, channel): a joint EDT over
    (B, C, *sp) sees zeros one channel-step away from every foreground
    voxel and degenerates to the mask itself (round-2 review finding)."""
    from scipy.ndimage import distance_transform_edt
    from multimodal_mvd_seg_tpu.models.attn_decoders import _distance_map
    onehot = np.zeros((2, 3, 5, 5, 5), np.float32)
    onehot[:, 0] = 1.0
    onehot[0, 0, 2, 2, 2] = 0.0
    onehot[0, 1, 2, 2, 2] = 1.0
    got = _distance_map(onehot)
    for b in range(2):
        for c in range(3):
            np.testing.assert_allclose(
                got[b, c], distance_transform_edt(onehot[b, c]))
    # the degenerate joint-EDT result would cap channel-0 at 1.0 everywhere
    assert got[1, 0].max() > 1.0
