"""Integration coverage of all labeling modes (the reference derives 4 dummy
datasets — standard / regions / ignore / regions+ignore — from Hippocampus
for exactly this, reference tests/integration_tests/readme.md:7-10)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _make_dataset(tmp_path, monkeypatch, dataset_id, labels,
                  regions_class_order=None, n_cases=6, seed=0):
    from multimodal_mvd_seg_tpu.imageio.nifti import write_nifti
    from multimodal_mvd_seg_tpu.experiment_planning.generate_dataset_json \
        import generate_dataset_json
    name = f"Dataset{dataset_id:03d}_Mode"
    raw = tmp_path / "raw"
    ds = raw / name
    (ds / "imagesTr").mkdir(parents=True)
    (ds / "labelsTr").mkdir()
    for p in ("pre", "res"):
        (tmp_path / p).mkdir(exist_ok=True)
    rng = np.random.RandomState(seed)
    shape = (20, 24, 28)
    for i in range(n_cases):
        seg = np.zeros(shape, np.uint8)
        seg[6:14, 8:16, 10:18] = 1
        seg[10, 4:20, 14] = 2
        if regions_class_order or "ignore" in labels:
            # some unannotated voxels for the ignore modes
            if "ignore" in labels:
                seg[:3] = labels["ignore"]
        img = rng.normal(0, 0.1, shape).astype(np.float32) + (seg == 1) * 1.0 \
            + (seg == 2) * 2.0
        write_nifti(str(ds / "imagesTr" / f"case_{i:03d}_0000.nii.gz"), img.T,
                    spacing=(1.0, 1.0, 1.0))
        write_nifti(str(ds / "labelsTr" / f"case_{i:03d}.nii.gz"), seg.T,
                    spacing=(1.0, 1.0, 1.0))
    generate_dataset_json(str(ds), channel_names={0: "MRI"}, labels=labels,
                          num_training_cases=n_cases, file_ending=".nii.gz",
                          dataset_name=name,
                          regions_class_order=regions_class_order)
    monkeypatch.setenv("MVDSEG_raw", str(raw))
    monkeypatch.setenv("MVDSEG_preprocessed", str(tmp_path / "pre"))
    monkeypatch.setenv("MVDSEG_results", str(tmp_path / "res"))
    from multimodal_mvd_seg_tpu import paths
    paths.refresh()
    return dataset_id, name


def _run_short_training(dataset_id, tmp_path):
    from multimodal_mvd_seg_tpu.experiment_planning.api import (
        extract_fingerprints, plan_experiments, preprocess)
    from multimodal_mvd_seg_tpu.run.run_training import get_trainer_from_args
    extract_fingerprints([dataset_id], num_processes=1)
    plan_experiments([dataset_id])
    preprocess([dataset_id], configurations=("3d_fullres",),
               num_processes=(1,))
    trainer = get_trainer_from_args(dataset_id, "3d_fullres", 0)
    trainer.num_epochs = 1
    trainer.num_iterations_per_epoch = 2
    trainer.num_val_iterations_per_epoch = 1
    trainer.n_data_parallel = 2
    trainer.run_training()
    L = trainer.logger.my_fantastic_logging
    assert np.isfinite(L["train_losses"][0])
    return trainer


def test_ignore_label_mode(tmp_path, monkeypatch):
    did, _ = _make_dataset(tmp_path, monkeypatch, 998,
                           {"background": 0, "organ": 1, "vessel": 2,
                            "ignore": 3})
    trainer = _run_short_training(did, tmp_path)
    assert trainer.label_manager.has_ignore_label
    assert trainer.label_manager.ignore_label == 3


def test_regions_mode(tmp_path, monkeypatch):
    did, _ = _make_dataset(
        tmp_path, monkeypatch, 997,
        {"background": 0, "whole": (1, 2), "core": 2},
        regions_class_order=(1, 2))
    trainer = _run_short_training(did, tmp_path)
    assert trainer.label_manager.has_regions


def test_regions_plus_ignore_mode(tmp_path, monkeypatch):
    did, _ = _make_dataset(
        tmp_path, monkeypatch, 999,
        {"background": 0, "whole": (1, 2), "core": 2, "ignore": 3},
        regions_class_order=(1, 2))
    trainer = _run_short_training(did, tmp_path)
    assert trainer.label_manager.has_regions
    assert trainer.label_manager.has_ignore_label
