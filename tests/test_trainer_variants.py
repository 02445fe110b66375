"""Trainer variants: registry, overrides, and a representative train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

PATCH = (16, 16, 16)


def _make(trainer_cls, tmp_path, **attrs):
    import os
    import __graft_entry__ as ge
    plans, dataset_json = ge._tiny_plans_and_dataset(patch=PATCH)
    os.environ.setdefault("MVDSEG_raw", str(tmp_path / "raw"))
    os.environ.setdefault("MVDSEG_preprocessed", str(tmp_path / "pre"))
    os.environ.setdefault("MVDSEG_results", str(tmp_path / "res"))
    for d in ("raw", "pre", "res"):
        (tmp_path / d).mkdir(exist_ok=True)
    from multimodal_mvd_seg_tpu import paths
    paths.refresh()
    t = trainer_cls(plans, "3d_fullres", 0, dataset_json)
    for k, v in attrs.items():
        setattr(t, k, v)
    return t


def test_registry_has_all_reference_variants():
    from multimodal_mvd_seg_tpu.training.registry import available_trainers
    ts = set(available_trainers())
    expected = {
        "nnUNetTrainerBenchmark_5epochs",
        "nnUNetTrainerBenchmark_5epochs_noDataLoading",
        "nnUNetTrainerDA5", "nnUNetTrainerDAOrd0", "nnUNetTrainerNoDA",
        "nnUNetTrainerNoMirroring", "nnUNetTrainerCELoss",
        "nnUNetTrainerDiceLoss", "nnUNetTrainerTopkLoss",
        "nnUNetTrainerCosAnneal", "nnUNetTrainerBN",
        "nnUNetTrainerNoDeepSupervision", "nnUNetTrainerAdam",
        "nnUNetTrainerAdan", "nnUNetTrainer_probabilisticOversampling",
        "nnUNetTrainer_5epochs", "nnUNetTrainer_Xepochs_NoMirroring",
        "ContrastiveTrainer", "MVDTrainer", "nnUNetTrainer",
    }
    missing = expected - ts
    assert not missing, f"missing trainers: {missing}"


def test_variant_overrides(tmp_path):
    from multimodal_mvd_seg_tpu.training import variants as V
    t = _make(V.nnUNetTrainerNoDA, tmp_path)
    ov = t._augment_overrides()
    assert ov["mirror_axes"] == () and ov["p_rotation"] == 0.0
    t = _make(V.nnUNetTrainerDAOrd0, tmp_path)
    assert t._augment_overrides() == {"interp_order": 0}
    t = _make(V.nnUNetTrainerNoMirroring, tmp_path)
    assert t._augment_overrides() == {"mirror_axes": ()}
    t = _make(V.nnUNetTrainer_5epochs, tmp_path)
    assert t.num_epochs == 5
    t = _make(V.nnUNetTrainer_Xepochs_NoMirroring, tmp_path)
    assert t.num_epochs == 250 and t._augment_overrides()["mirror_axes"] == ()
    t = _make(V.nnUNetTrainer_probabilisticOversampling, tmp_path)
    assert t.probabilistic_oversampling is True
    t = _make(V.nnUNetTrainerNoDeepSupervision, tmp_path)
    assert t.enable_deep_supervision is False
    assert _make(V.nnUNetTrainerAdam, tmp_path).initial_lr == 3e-4
    assert _make(V.nnUNetTrainerAdan, tmp_path).initial_lr == 1e-3


@pytest.mark.parametrize("variant", ["nnUNetTrainerTopkLoss",
                                     "nnUNetTrainerCosAnneal"])
def test_variant_train_step(tmp_path, variant):
    from multimodal_mvd_seg_tpu.training.registry import get_trainer_class
    t = _make(get_trainer_class(variant), tmp_path, n_data_parallel=2)
    t.initialize()
    rng = np.random.RandomState(0)
    bs = max(t.configuration_manager.batch_size, 2)
    init_patch = tuple(t._initial_patch_size)
    data = jax.device_put(rng.normal(size=(bs, 2, *init_patch))
                          .astype(np.float32), t._batch_sharding)
    seg = jax.device_put(rng.randint(0, 3, (bs, *init_patch))
                         .astype(np.int32), t._batch_sharding)
    m = t.train_step(data, seg)
    assert np.isfinite(float(jax.device_get(m["loss"])))


def test_probabilistic_oversampling_sampler():
    from multimodal_mvd_seg_tpu.data.sampler import PatchSampler
    s = PatchSampler.__new__(PatchSampler)
    s.batch_size = 10
    s.oversample_foreground_percent = 0.33
    s.probabilistic_oversampling = False
    assert [s._must_contain_fg(i) for i in range(10)].count(True) == 3
    s.probabilistic_oversampling = True
    rng = np.random.RandomState(0)
    draws = [s._must_contain_fg(0, rng) for _ in range(2000)]
    assert 0.28 < np.mean(draws) < 0.38
