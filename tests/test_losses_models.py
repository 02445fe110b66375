"""Loss-value and model-shape tests (reference has none; SURVEY.md §4 calls
for real unit tests here)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_mvd_seg_tpu.losses import (
    DC_and_CE_loss, DC_and_BCE_loss, deep_supervision_loss, get_tp_fp_fn_tn,
    soft_dice_loss, cross_entropy_loss, topk_loss, kl_loss_compute1, distill_kl)
from multimodal_mvd_seg_tpu.losses.deep_supervision import default_ds_weights


def test_tp_fp_fn_counts():
    probs = jnp.zeros((1, 2, 2, 3))
    probs = probs.at[0, :, :, 0].set(1.0)  # predict all background
    target = jnp.array([[[0, 1], [2, 0]]])
    tp, fp, fn, tn = get_tp_fp_fn_tn(probs, target)
    np.testing.assert_allclose(tp[0], [2, 0, 0])
    np.testing.assert_allclose(fn[0], [0, 1, 1])
    np.testing.assert_allclose(fp[0], [2, 0, 0])


def test_perfect_dice_is_minus_one():
    target = jnp.array([[[0, 1], [1, 0]]])
    logits = jax.nn.one_hot(target, 2) * 100.0 - 50.0
    val = soft_dice_loss(logits, target, do_bg=False)
    assert float(val) == pytest.approx(-1.0, abs=1e-4)


def test_dice_ce_monotone():
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.randint(0, 3, (2, 4, 4, 4)))
    good = jax.nn.one_hot(target, 3) * 10
    bad = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 3)))
    loss = DC_and_CE_loss(batch_dice=True)
    assert float(loss(good, target)) < float(loss(bad, target))


def test_ignore_label_masks_loss():
    target = jnp.array([[[0, 1], [2, 2]]])  # 2 = ignore
    logits = jax.nn.one_hot(jnp.array([[[0, 1], [0, 1]]]), 2) * 20.0
    loss = DC_and_CE_loss(ignore_label=2)
    # ignored voxels mispredicted → loss should still be ≈ perfect
    assert float(loss(logits, target)) == pytest.approx(-1.0, abs=1e-2)


def test_bce_loss_regions():
    target = jnp.zeros((1, 4, 4, 2))
    target = target.at[..., 0].set(1.0)
    logits = jnp.stack([jnp.full((1, 4, 4), 20.0), jnp.full((1, 4, 4), -20.0)], -1)
    loss = DC_and_BCE_loss()
    assert float(loss(logits, target)) < -0.9


def test_ds_weights_and_loss():
    w = default_ds_weights(3)
    assert w[-1] == 0 and abs(w.sum() - 1) < 1e-9
    outs = [jnp.zeros((1, 4, 4, 2)), jnp.zeros((1, 2, 2, 2))]
    tgts = [jnp.zeros((1, 4, 4), jnp.int32), jnp.zeros((1, 2, 2), jnp.int32)]
    v = deep_supervision_loss(lambda o, t: cross_entropy_loss(o, t), outs, tgts)
    assert np.isfinite(float(v))


def test_topk_loss_reduces_to_worst():
    target = jnp.zeros((1, 10, 10), jnp.int32)
    logits = jnp.zeros((1, 10, 10, 2))
    logits = logits.at[0, 0, 0, 1].set(50.0)  # one terrible voxel
    full = cross_entropy_loss(logits, target)
    topk = topk_loss(logits, target, k_percent=1.0)
    assert float(topk) > float(full)


def test_kl_symmetric_and_zero():
    p = jnp.array([0.2, 0.7, 0.9])
    assert float(kl_loss_compute1(p, p)) == pytest.approx(0.0, abs=1e-5)
    q = jnp.array([0.8, 0.1, 0.2])
    assert float(kl_loss_compute1(p, q)) == pytest.approx(
        float(kl_loss_compute1(q, p)), abs=1e-6)
    assert float(kl_loss_compute1(p, q)) > 0


def test_distill_kl_zero_for_equal():
    logits = jnp.asarray(np.random.RandomState(0).normal(size=(2, 4, 3)))
    assert float(distill_kl(logits, logits, 2.0)) == pytest.approx(0.0, abs=1e-4)


def test_plain_conv_unet_shapes():
    from multimodal_mvd_seg_tpu.models.unet import PlainConvUNet
    net = PlainConvUNet(
        features_per_stage=[8, 16, 32],
        n_conv_per_stage_encoder=[2, 2, 2],
        n_conv_per_stage_decoder=[2, 2],
        kernel_sizes=[[3, 3, 3]] * 3,
        strides=[[1, 1, 1], [2, 2, 2], [2, 2, 2]],
        num_classes=3, deep_supervision=True)
    x = jnp.zeros((1, 16, 16, 16, 2), jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    outs = net.apply(variables, x, train=False)
    assert isinstance(outs, list) and len(outs) == 2
    assert outs[0].shape == (1, 16, 16, 16, 3)  # finest first
    assert outs[1].shape == (1, 8, 8, 8, 3)
    assert outs[0].dtype == jnp.float32


def test_residual_unet_shapes():
    from multimodal_mvd_seg_tpu.models.unet import ResidualEncoderUNet
    net = ResidualEncoderUNet(
        features_per_stage=[8, 16],
        n_conv_per_stage_encoder=[1, 2],
        n_conv_per_stage_decoder=[1],
        kernel_sizes=[[3, 3], [3, 3]],
        strides=[[1, 1], [2, 2]],
        num_classes=2, deep_supervision=False)
    x = jnp.zeros((2, 16, 16, 1), jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    out = net.apply(variables, x, train=False)
    assert out.shape == (2, 16, 16, 2)


def test_factory_from_plans(prepared_dataset_shared):
    # session-preprocessed dataset: plans already exist (tests/conftest.py)
    from multimodal_mvd_seg_tpu.plans.plans_handler import PlansManager
    from multimodal_mvd_seg_tpu.models.factory import build_network_and_params
    from multimodal_mvd_seg_tpu.utils.files import load_json, join

    ds = prepared_dataset_shared
    pm = PlansManager(join(ds["preprocessed"], ds["dataset_name"],
                           "nnUNetPlans.json"))
    dataset_json = load_json(join(ds["preprocessed"], ds["dataset_name"],
                                  "dataset.json"))
    cfg = pm.get_configuration("3d_fullres")
    net, variables = build_network_and_params(pm, dataset_json, cfg)
    x = jnp.zeros((1, *cfg.patch_size, 2), jnp.bfloat16)
    outs = net.apply(variables, x, train=False)
    assert outs[0].shape == (1, *cfg.patch_size, 3)


def test_bce_loss_ignore_mask_denominator():
    """Masked BCE divides by mask.sum() ONLY (upstream nnU-Net semantics:
    channels are summed per voxel, the denominator counts voxels once)."""
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.normal(size=(1, 3, 3, 2)), jnp.float32)
    regions = jnp.asarray(rng.rand(1, 3, 3, 2) > 0.5, jnp.float32)
    ignore = jnp.zeros((1, 3, 3, 1)).at[0, 0, 0, 0].set(1.0)
    target = jnp.concatenate([regions, ignore], axis=-1)
    loss = DC_and_BCE_loss(use_ignore_label=True, weight_dice=0.0,
                           weight_ce=1.0)
    got = float(loss(logits, target))
    lg = np.asarray(logits, np.float64)
    bce_el = np.maximum(lg, 0) - lg * np.asarray(regions) + \
        np.log1p(np.exp(-np.abs(lg)))
    m = 1.0 - np.asarray(ignore)
    want = (bce_el * m).sum() / m.sum()
    assert got == pytest.approx(want, rel=1e-5)
