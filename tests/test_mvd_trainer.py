"""End-to-end MVD ContrastiveTrainer: one compiled dual-branch train step
with mutual KL + topo + curriculum-gated memory/contrastive terms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

PATCH = (16, 32, 32)


class _TinyContrastiveTrainer:
    """Lazily constructed to keep import-time light."""

    def __new__(cls, tmp_path):
        import os
        from multimodal_mvd_seg_tpu.training.mvd_trainer import (
            ContrastiveTrainer)
        from multimodal_mvd_seg_tpu.models.contrastive_net import (
            ContrastiveNet)
        import __graft_entry__ as ge

        plans, dataset_json = ge._tiny_plans_and_dataset(patch=PATCH)

        class TinyMVD(ContrastiveTrainer):
            def build_network_architecture(self, deep_supervision=True):
                # depth-1 encoder keeps the CPU-test compile tractable;
                # identical code paths to the full 3-deep flagship
                return ContrastiveNet(
                    input_channels=self.num_input_channels,
                    num_classes=self.label_manager.num_segmentation_heads,
                    feature_size=16, depths=(1, 1, 1, 1),
                    do_ds=deep_supervision)

        os.environ["MVDSEG_raw"] = str(tmp_path / "raw")
        os.environ["MVDSEG_preprocessed"] = str(tmp_path / "pre")
        os.environ["MVDSEG_results"] = str(tmp_path / "res")
        for d in ("raw", "pre", "res"):
            (tmp_path / d).mkdir(exist_ok=True)
        from multimodal_mvd_seg_tpu import paths
        paths.refresh()
        trainer = TinyMVD(plans, "3d_fullres", 0, dataset_json)
        trainer.n_data_parallel = 2  # keep the CPU-test SPMD compile fast
        trainer.num_iterations_per_epoch = 1
        trainer.memory_candidates_per_class = 32
        trainer.contrastive_rows_per_class = 32
        trainer.topo_cap = 64
        return trainer


@pytest.fixture(scope="module")
def mvd_trainer(tmp_path_factory):
    trainer = _TinyContrastiveTrainer(tmp_path_factory.mktemp("mvd"))
    trainer.initialize()
    return trainer


def _batch(trainer, seed=0):
    rng = np.random.RandomState(seed)
    bs = max(trainer.configuration_manager.batch_size,
             trainer.mesh.shape["data"])
    init_patch = tuple(trainer._initial_patch_size)
    data = jax.device_put(
        rng.normal(size=(bs, 2, *init_patch)).astype(np.float32),
        trainer._batch_sharding)
    seg = jax.device_put(
        rng.randint(0, 3, size=(bs, *init_patch)).astype(np.int32),
        trainer._batch_sharding)
    return data, seg


def test_mvd_train_step_curriculum(mvd_trainer):
    trainer = mvd_trainer
    data, seg = _batch(trainer)

    # phase 1: base losses + mutual + topo only
    trainer.current_epoch = 0
    m0 = jax.device_get(trainer.train_step(data, seg))
    assert np.isfinite(m0["loss"]) and m0["loss"] > 0
    assert np.isfinite(m0["mutual"]) and np.isfinite(m0["topo"])
    assert m0["contrastive"] == 0.0
    assert int(jax.device_get(trainer.state.memory_valid).sum()) == 0

    # phase 2 (epoch > 50): memory bank fills
    trainer.current_epoch = 60
    m1 = jax.device_get(trainer.train_step(data, seg))
    n_mem = int(jax.device_get(trainer.state.memory_valid).sum())
    assert n_mem > 0
    assert m1["contrastive"] == 0.0

    # phase 3 (epoch ≥ 100): contrastive active (same compiled step)
    trainer.current_epoch = 120
    m2 = jax.device_get(trainer.train_step(data, seg))
    assert np.isfinite(m2["contrastive"])
    assert int(jax.device_get(trainer.state.step)) == 3


def test_two_phase_step_matches_callback_step(mvd_trainer):
    """The full two-phase ContrastiveTrainer step (probe jit → host
    persistence/matching → train jit) must update params identically to
    the single-jit callback step — VERDICT.md round-1 item 1."""
    trainer = mvd_trainer
    assert trainer.topo_mode == "callback"  # CPU supports callbacks
    # GT = a small spherical shell of the vessel class: one clean dim-2
    # cavity that survives the augmentation crop (a dense random seg floods
    # the capped diagram with dim-0/1 bars and yields topo == 0)
    rng_np = np.random.RandomState(7)
    bs = max(trainer.configuration_manager.batch_size,
             trainer.mesh.shape["data"])
    init_patch = tuple(trainer._initial_patch_size)
    grids = np.mgrid[[slice(0, s) for s in init_patch]]
    r = np.sqrt(sum((g - s / 2.0) ** 2
                    for g, s in zip(grids, init_patch)))
    shell = (((r > 2.5) & (r < 5.0)) * 2).astype(np.int32)
    seg = jax.device_put(
        np.broadcast_to(shell, (bs, *init_patch)).copy(),
        trainer._batch_sharding)
    data = jax.device_put(
        (rng_np.normal(size=(bs, 2, *init_patch)) +
         shell).astype(np.float32),  # (d,h,w) broadcasts into (b,c,d,h,w)
        trainer._batch_sharding)
    trainer.current_epoch = 0

    start_state = jax.device_get(trainer.state)
    start_rng = trainer._rng

    m_cb = jax.device_get(trainer.train_step(data, seg))
    params_cb = jax.device_get(trainer.state.params)

    # rewind and rerun the same step through the two-phase path
    rep = jax.sharding.NamedSharding(trainer.mesh,
                                     jax.sharding.PartitionSpec())
    trainer.state = jax.device_put(start_state, rep)
    trainer._rng = start_rng
    trainer.topo_mode = "two_phase"
    try:
        trainer._compile_steps()
        trainer.topo_pipeline = False  # exact sequential schedule
        m_tp = jax.device_get(trainer.train_step(data, seg))
        params_tp = jax.device_get(trainer.state.params)

        # pipelined replay of the same step: the priming call defers the
        # train jit (returns None) and reads the SAME entry params in its
        # probe, so after flush_train_steps the step must be identical
        trainer.state = jax.device_put(start_state, rep)
        trainer._rng = start_rng
        trainer.topo_pipeline = True
        assert trainer.train_step(data, seg) is None
        flushed = trainer.flush_train_steps()
        assert len(flushed) == 1 and trainer.flush_train_steps() == []
        m_pl = jax.device_get(flushed[0])
        params_pl = jax.device_get(trainer.state.params)
    finally:
        trainer.topo_pipeline = True
        trainer.topo_mode = "callback"
        trainer._compile_steps()

    assert m_cb["topo"] > 0  # the term is actually exercised
    assert m_tp["topo"] == pytest.approx(m_cb["topo"], rel=1e-4)
    assert m_tp["loss"] == pytest.approx(m_cb["loss"], rel=1e-4)
    for a, b in zip(jax.tree.leaves(params_cb), jax.tree.leaves(params_tp)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
    # pipelined == sequential two-phase (same compiled fns, same inputs)
    assert m_pl["topo"] == pytest.approx(m_tp["topo"], rel=1e-6)
    assert m_pl["loss"] == pytest.approx(m_tp["loss"], rel=1e-6)
    for a, b in zip(jax.tree.leaves(params_tp), jax.tree.leaves(params_pl)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_mvd_checkpoint_roundtrip(mvd_trainer, tmp_path):
    import os
    trainer = mvd_trainer
    f = str(tmp_path / "ckpt.pkl")
    trainer.current_epoch = 7
    trainer.save_checkpoint(f)
    before = jax.device_get(trainer.state.params)
    trainer.load_checkpoint(f)
    after = jax.device_get(trainer.state.params)
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b)
    assert trainer.current_epoch == 7
    assert os.path.getsize(f) > 1000


def test_mvd_val_step_and_registry(mvd_trainer):
    trainer = mvd_trainer
    data, seg = _batch(trainer, seed=1)
    # validation uses the final patch size
    bs = data.shape[0]
    rng = np.random.RandomState(2)
    vdata = jax.device_put(
        rng.normal(size=(bs, 2, *PATCH)).astype(np.float32),
        trainer._batch_sharding)
    vseg = jax.device_put(
        rng.randint(0, 3, size=(bs, *PATCH)).astype(np.int32),
        trainer._batch_sharding)
    m = jax.device_get(trainer.validation_step(vdata, vseg))
    assert np.isfinite(m["loss"])
    assert m["tp"].shape == (2,)  # fg classes

    from multimodal_mvd_seg_tpu.training.registry import get_trainer_class
    from multimodal_mvd_seg_tpu.training.mvd_trainer import ContrastiveTrainer
    assert get_trainer_class("ContrastiveTrainer") is ContrastiveTrainer
    assert get_trainer_class("MVDTrainer") is ContrastiveTrainer


def test_patch_rounding_persists_to_plans(tmp_path):
    """Plans patches not divisible by the dual encoder's (16,32,32) are
    rounded up, AND the rounded value lands in the plans dict (the UNETR++
    pos-embed/EPA params are input-size-dependent, so the predictor must
    rebuild from the same patch)."""
    import os
    from multimodal_mvd_seg_tpu.training.mvd_trainer import ContrastiveTrainer
    import __graft_entry__ as ge

    plans, dataset_json = ge._tiny_plans_and_dataset(patch=(20, 28, 32))
    os.environ["MVDSEG_raw"] = str(tmp_path / "raw")
    os.environ["MVDSEG_preprocessed"] = str(tmp_path / "pre")
    os.environ["MVDSEG_results"] = str(tmp_path / "res")
    for d in ("raw", "pre", "res"):
        (tmp_path / d).mkdir(exist_ok=True)
    from multimodal_mvd_seg_tpu import paths
    paths.refresh()

    class T(ContrastiveTrainer):
        def _init_network_state(self):      # skip the expensive net build
            raise _Stop()

    class _Stop(Exception):
        pass

    tr = T(plans, "3d_fullres", 0, dataset_json)
    try:
        tr.initialize()
    except _Stop:
        pass
    assert tr.configuration_manager.patch_size == [32, 32, 32]
    assert plans["configurations"]["3d_fullres"]["patch_size"] == [32, 32, 32]


def test_predictor_restores_batch_stats(tmp_path):
    """Checkpoints carrying batch_stats (the dual net's BatchNorm) restore
    as full flax variables dicts (reference predict_from_raw_data2.py's
    dual-net state-dict handling)."""
    import pickle
    from multimodal_mvd_seg_tpu.inference.predictor import MVDSegPredictor
    import __graft_entry__ as ge
    from multimodal_mvd_seg_tpu.utils.files import save_json

    plans, dataset_json = ge._tiny_plans_and_dataset(patch=(16, 16, 16))
    mdir = tmp_path / "model"
    (mdir / "fold_0").mkdir(parents=True)
    save_json(plans, str(mdir / "plans.json"))
    save_json(dataset_json, str(mdir / "dataset.json"))
    ckpt = {"network_weights": {"w": np.zeros(2)},
            "batch_stats": {"bn": {"mean": np.zeros(2)}},
            "init_args": {"configuration": "3d_fullres"},
            "trainer_name": "MVDSegTrainer",
            "inference_allowed_mirroring_axes": (0, 1, 2)}
    with open(mdir / "fold_0" / "checkpoint_final.pkl", "wb") as f:
        pickle.dump(ckpt, f)
    pred = MVDSegPredictor(verbose=False)
    pred.initialize_from_trained_model_folder(str(mdir), use_folds=(0,))
    entry = pred.params_list[0]
    assert "params" in entry and "batch_stats" in entry


def test_mvd_train_step_nl_layout(tmp_path):
    """One compiled ContrastiveTrainer step with the NL (channels-last)
    cell layout (MVDSEG_MVD_S2D_LAYOUT analog): integration check that the
    trainer's loss paths consume the NL net's channels-last heads/features
    and produce a finite loss."""
    import __graft_entry__ as ge
    trainer = ge.make_tiny_mvd_trainer(2, patch=PATCH, topo_cap=64,
                                       s2d_layout="NL")
    trainer.initialize()
    data, seg = _batch(trainer)
    trainer.current_epoch = 0
    m = trainer.train_step(data, seg)
    assert np.isfinite(float(jax.device_get(m["loss"])))


def test_mvd_pretrained_from_torch_checkpoint(mvd_trainer, tmp_path):
    """-pretrained_weights with a raw reference MVD .pth on the
    ContrastiveTrainer: encoder tensors + BatchNorm running stats transfer,
    segmentation heads (out*) stay at their fresh init."""
    import numpy as np
    torch = pytest.importorskip("torch")
    from test_contrastive_import import TContrastiveNet, _randomize
    from multimodal_mvd_seg_tpu.run.run_training import (
        load_pretrained_weights)

    trainer = mvd_trainer
    twin = TContrastiveNet(patch=PATCH, in_ch=2, n_classes=3, fs=16,
                           dims=(32, 64, 128, 512), proj=(64, 64, 64, 32),
                           depths=(1, 1, 1, 1), feat_dim=16)
    _randomize(twin, seed=5)
    pth = tmp_path / "mvd_ref.pth"
    torch.save({"network_weights": twin.state_dict()}, pth)

    before_out1 = np.asarray(
        trainer.state.params["out1"]["conv"]["kernel"]).copy()
    load_pretrained_weights(trainer, str(pth))
    sd = twin.state_dict()
    got = np.asarray(
        trainer.state.params["share_encoder"]["stage0"]["down"]["kernel"])
    np.testing.assert_array_equal(
        got, sd["share_encoder.downsample_layers.0.0.conv.weight"].numpy())
    # BatchNorm running stats came along into the MVD state
    bs = np.asarray(trainer.state.batch_stats["share_encoder"]["stage0"]
                    ["block0"]["conv51"]["norm1"]["mean"])
    np.testing.assert_allclose(
        bs, sd["share_encoder.stages.0.0.conv51.norm1.running_mean"].numpy(),
        rtol=1e-6)
    # seg heads untouched
    np.testing.assert_array_equal(
        np.asarray(trainer.state.params["out1"]["conv"]["kernel"]),
        before_out1)
