"""Unit tests for the MVD capability layer: ContrastiveNet, contrastive
memory machinery, mutual-distillation losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


PATCH = (16, 32, 32)  # divisible by the encoder's total stride (16, 32, 32)
N_CLASSES = 3


@pytest.fixture(scope="module")
def contrastive_net():
    from multimodal_mvd_seg_tpu.models.contrastive_net import ContrastiveNet
    net = ContrastiveNet(input_channels=2, num_classes=N_CLASSES,
                         feature_size=16, num_heads=4)
    x = jnp.zeros((2, *PATCH, 2), jnp.bfloat16)
    variables = net.init(jax.random.PRNGKey(0), x, train=False,
                         method="init_all")
    return net, variables


def test_contrastive_net_forward_shapes(contrastive_net):
    net, variables = contrastive_net
    x = jnp.asarray(np.random.RandomState(0).normal(size=(2, *PATCH, 2)),
                    jnp.bfloat16)
    out = net.apply(variables, x, train=False)
    logits1, logits2, fea1, fea2 = out
    assert len(logits1) == 3 and len(logits2) == 3
    # finest-first deep supervision at 1, 1/2, 1/4 resolution
    assert logits1[0].shape == (2, *PATCH, N_CLASSES)
    assert logits1[1].shape == (2, 8, 16, 16, N_CLASSES)
    assert logits1[2].shape == (2, 4, 8, 8, N_CLASSES)
    assert logits2[0].shape == (2, *PATCH, N_CLASSES)
    # full-res 16-dim feature maps for the contrastive machinery
    assert fea1.shape == (2, *PATCH, 16)
    assert fea2.shape == (2, *PATCH, 16)
    assert np.isfinite(np.asarray(logits1[0], np.float32)).all()
    # branches are distinct functions (bug-fixed wiring): different params
    assert not np.allclose(np.asarray(logits1[0], np.float32),
                           np.asarray(logits2[0], np.float32))


def test_contrastive_net_heads(contrastive_net):
    net, variables = contrastive_net
    feats = jnp.asarray(np.random.RandomState(1).normal(size=(8, 16)),
                        jnp.float32)
    proj = net.apply(variables, feats, 1, train=False, method="project")
    pred = net.apply(variables, proj, 1, train=False, method="predict")
    assert proj.shape == (8, 16) and pred.shape == (8, 16)
    scores = net.apply(variables, feats, train=False,
                       method="selector_scores")
    assert scores.shape == (N_CLASSES, 8, 1)
    scores_m = net.apply(variables, feats, memory=True, train=False,
                         method="selector_scores")
    assert scores_m.shape == (N_CLASSES, 8, 1)
    # train-mode heads mutate batch stats
    _, mutated = net.apply(variables, feats, 1, train=True, method="project",
                           mutable=["batch_stats"])
    assert "batch_stats" in mutated


def test_feature_memory_insert_and_fifo():
    from multimodal_mvd_seg_tpu.losses.feature_memory import (
        add_features_learned, elements_per_class, init_feature_memory)
    state = init_feature_memory(n_classes=2, memory_per_class=8,
                                feature_size=4)
    assert elements_per_class(2, 256, 60) == 8
    feats = jnp.arange(2 * 6 * 4, dtype=jnp.float32).reshape(2, 6, 4)
    mask = jnp.array([[True] * 6, [True, True, False, False, False, False]])
    scores = jnp.asarray(np.random.RandomState(0).normal(size=(2, 6)))
    state = add_features_learned(state, feats, mask, scores, n_push=3)
    # class 0: 3 pushed; class 1: only 2 eligible
    assert int(state.valid[0].sum()) == 3
    assert int(state.valid[1].sum()) == 2
    # pushes are the LOWEST-selector-score rows
    order = np.argsort(np.asarray(scores[0]))[:3]
    got = np.sort(np.asarray(state.memory[0][:3]), axis=0)
    want = np.sort(np.asarray(feats[0][order]), axis=0)
    np.testing.assert_allclose(got, want)
    # FIFO: fill beyond capacity, newest stay
    for _ in range(4):
        state = add_features_learned(state, feats, mask, scores, n_push=3)
    assert int(state.valid[0].sum()) == 8
    assert state.memory.shape == (2, 8, 4)


def test_sample_class_rows_fixed_shape():
    from multimodal_mvd_seg_tpu.losses.feature_memory import sample_class_rows
    labels = jnp.array([0, 0, 1, 1, 1, 2, 0, 1])
    eligible = jnp.array([True, True, True, False, True, True, False, True])
    idx, mask = sample_class_rows(jax.random.PRNGKey(0), labels, eligible,
                                  n_classes=3, k=4)
    assert idx.shape == (3, 4) and mask.shape == (3, 4)
    assert int(mask[0].sum()) == 2   # two eligible class-0 rows
    assert int(mask[1].sum()) == 3
    assert int(mask[2].sum()) == 1
    lab = np.asarray(labels)
    for c in range(3):
        chosen = np.asarray(idx[c])[np.asarray(mask[c])]
        assert (lab[chosen] == c).all()


def test_contrastive_memory_loss():
    from multimodal_mvd_seg_tpu.losses.contrastive import (
        contrastive_class_to_class_learned_memory)
    rng = np.random.RandomState(0)
    C, K, M, F = 3, 5, 6, 4
    feats = jnp.asarray(rng.normal(size=(C, K, F)), jnp.float32)
    fmask = jnp.ones((C, K), bool)
    mem = jnp.asarray(rng.normal(size=(C, M, F)), jnp.float32)
    mvalid = jnp.ones((C, M), bool)
    s_f = jnp.zeros((C, K))
    s_m = jnp.zeros((C, M))
    loss = contrastive_class_to_class_learned_memory(
        feats, fmask, mem, mvalid, s_f, s_m, C)
    assert loss.shape == ()
    assert 0.0 < float(loss) < 2.0
    # identical features/memory → distance 0
    same = contrastive_class_to_class_learned_memory(
        mem[:, :K], fmask, mem, mvalid, s_f, s_m, C)
    # first K memory rows match → mean distance strictly smaller
    assert float(same) < float(loss)
    # classes with <2 valid features are skipped entirely
    fmask1 = fmask.at[:, 1:].set(False)
    skipped = contrastive_class_to_class_learned_memory(
        feats, fmask1, mem, mvalid, s_f, s_m, C)
    assert float(skipped) == 0.0
    # uniform weights: equals plain masked mean of cosine distances
    def l2n(x):
        return x / np.linalg.norm(x, axis=-1, keepdims=True)
    want = np.mean([ (1 - l2n(np.asarray(feats[c])) @
                      l2n(np.asarray(mem[c])).T).mean() for c in range(C)])
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_kl_loss_compute1_and_distill():
    from multimodal_mvd_seg_tpu.losses.distill import (
        cc_3d, distill_kl, kl_loss_compute1, l2_loss)
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.uniform(0.05, 0.95, (2, 4, 4, 4)))
    assert float(kl_loss_compute1(p, p)) == pytest.approx(0.0, abs=1e-6)
    q = jnp.clip(p + 0.2, 0.0, 1.0)
    v = float(kl_loss_compute1(p, q))
    assert v > 0
    # symmetry
    assert float(kl_loss_compute1(q, p)) == pytest.approx(v, rel=1e-5)
    logits = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 3)))
    assert float(distill_kl(logits, logits)) == pytest.approx(0.0, abs=1e-6)
    assert float(distill_kl(logits, logits + 1.0)) == pytest.approx(0.0, abs=1e-5)
    assert float(l2_loss(logits, logits)) == 0.0
    x = jnp.asarray(rng.normal(size=(2, 1, 4, 4, 4)))
    assert float(cc_3d(x, x)) == pytest.approx(1.0, rel=1e-5)


def test_dual_factory():
    from multimodal_mvd_seg_tpu.models.factory import (
        get_dual_network_from_plans)
    from multimodal_mvd_seg_tpu.plans.plans_handler import PlansManager
    import __graft_entry__ as ge
    plans, dataset_json = ge._tiny_plans_and_dataset(patch=PATCH)
    pm = PlansManager(plans)
    cfg = pm.get_configuration("3d_fullres")
    net = get_dual_network_from_plans(pm, dataset_json, cfg, 2,
                                      deep_supervision=True)
    assert net.num_classes == 3 and net.feature_size == 16


def test_probe_forward_matches_dual_forward_bitwise():
    """forward_vessel1 (the two-phase topo probe's slim forward) must be
    BITWISE the branch-1 logits of the full dual forward under the same
    dropout rng — flax derives dropout keys from module paths, so skipping
    branch 2 must not change branch 1."""
    import jax
    import jax.numpy as jnp
    from multimodal_mvd_seg_tpu.models.contrastive_net import ContrastiveNet
    net = ContrastiveNet(input_channels=2, num_classes=3, feature_size=16,
                         depths=(1, 1, 1, 1), do_ds=True)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 32, 32, 2),
                    jnp.bfloat16)
    v = jax.jit(lambda r, t: net.init(r, t, train=False,
                                      method="init_all"))(
        jax.random.PRNGKey(0), x)
    k = jax.random.PRNGKey(7)
    full, _ = jax.jit(lambda v_, x_: net.apply(
        v_, x_, train=True, rngs={"dropout": k},
        mutable=["batch_stats"]))(v, x)
    probe, _ = jax.jit(lambda v_, x_: net.apply(
        v_, x_, train=True, rngs={"dropout": k}, mutable=["batch_stats"],
        method="forward_vessel1"))(v, x)
    np.testing.assert_array_equal(np.asarray(full[0][0], np.float32),
                                  np.asarray(probe, np.float32))


def test_feature_memory_no_candidates_keeps_bank():
    """A class with zero (or partial) valid candidates must not have its
    FIFO shifted — each class advances by ITS OWN valid-push count
    (round-2 review finding: a fixed n_push shift evicted real entries
    for rare classes absent from a batch)."""
    from multimodal_mvd_seg_tpu.losses.feature_memory import (
        add_features_learned, init_feature_memory)
    state = init_feature_memory(n_classes=2, memory_per_class=4,
                                feature_size=3)
    feats = jnp.arange(2 * 5 * 3, dtype=jnp.float32).reshape(2, 5, 3)
    mask_full = jnp.ones((2, 5), bool)
    scores = jnp.asarray(np.random.RandomState(1).normal(size=(2, 5)))
    # fill both banks completely
    state = add_features_learned(state, feats, mask_full, scores, n_push=4)
    assert int(state.valid.sum()) == 8
    bank1_before = np.asarray(state.memory[1]).copy()
    # next batch: class 1 has NO candidates, class 0 has 2
    mask = jnp.array([[True, True, False, False, False],
                      [False] * 5])
    state2 = add_features_learned(state, feats + 100, mask, scores, n_push=4)
    np.testing.assert_array_equal(np.asarray(state2.memory[1]), bank1_before)
    assert int(state2.valid[1].sum()) == 4
    # class 0 advanced by exactly 2: two new rows + two retained old rows
    assert int(state2.valid[0].sum()) == 4
    new_rows = np.asarray(state2.memory[0][:2])
    assert np.all(new_rows >= 100)  # the fresh batch's features
    np.testing.assert_array_equal(np.asarray(state2.memory[0][2:]),
                                  np.asarray(state.memory[0][:2]))
