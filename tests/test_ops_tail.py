"""Tests for postprocessing, ensembling, model selection helpers, overlay
plots and dataset conversion."""

import os

import numpy as np
import pytest


def _write_seg(path, arr, spacing=(1.0, 1.0, 1.0)):
    from multimodal_mvd_seg_tpu.imageio.nifti import write_nifti
    write_nifti(str(path), np.asarray(arr, np.uint8).T,
                spacing=tuple(reversed(spacing)))


@pytest.fixture()
def seg_folders(tmp_path):
    """gt + noisy prediction folders (2 cases, labels {0,1,2}); predictions
    carry a spurious small extra component of label 1."""
    import __graft_entry__ as ge
    from multimodal_mvd_seg_tpu.utils.files import save_json
    gt = tmp_path / "gt"
    pred = tmp_path / "pred"
    gt.mkdir()
    pred.mkdir()
    rng = np.random.RandomState(0)
    shape = (16, 16, 16)
    for i in range(2):
        seg = np.zeros(shape, np.uint8)
        seg[4:10, 4:10, 4:10] = 1
        seg[12, 2:14, 8] = 2
        _write_seg(gt / f"case_{i}.nii.gz", seg)
        noisy = seg.copy()
        noisy[14:16, 14:16, 14:16] = 1  # spurious CC far from the organ
        _write_seg(pred / f"case_{i}.nii.gz", noisy)
    plans, dataset_json = ge._tiny_plans_and_dataset(patch=(16, 16, 16))
    save_json(plans, str(pred / "plans.json"))
    save_json(dataset_json, str(pred / "dataset.json"))
    return {"gt": str(gt), "pred": str(pred), "shape": shape,
            "plans": plans, "dataset_json": dataset_json}


def test_remove_all_but_largest_component():
    from multimodal_mvd_seg_tpu.postprocessing import (
        remove_all_but_largest_component_from_segmentation)
    seg = np.zeros((10, 10, 10), np.uint8)
    seg[1:5, 1:5, 1:5] = 1   # big
    seg[8, 8, 8] = 1         # small spurious
    out = remove_all_but_largest_component_from_segmentation(seg, 1)
    assert out[2, 2, 2] == 1 and out[8, 8, 8] == 0
    # other labels untouched
    seg[9, 0, 0] = 2
    out = remove_all_but_largest_component_from_segmentation(seg, 1)
    assert out[9, 0, 0] == 2


def test_determine_and_apply_postprocessing(seg_folders, tmp_path):
    from multimodal_mvd_seg_tpu.postprocessing import (
        apply_postprocessing_to_folder, determine_postprocessing)
    from multimodal_mvd_seg_tpu.utils.files import load_pickle, isfile, join
    pp_fns, pp_kwargs = determine_postprocessing(
        seg_folders["pred"], seg_folders["gt"],
        seg_folders["plans"], seg_folders["dataset_json"], num_processes=1)
    # removing the spurious CC improves Dice → at least one pp accepted
    assert len(pp_fns) >= 1
    assert isfile(join(seg_folders["pred"], "postprocessing.pkl"))
    assert isfile(join(seg_folders["pred"], "postprocessing.json"))
    fns, kwargs = load_pickle(join(seg_folders["pred"], "postprocessing.pkl"))
    out = tmp_path / "applied"
    apply_postprocessing_to_folder(seg_folders["pred"], str(out), fns, kwargs,
                                   seg_folders["plans"],
                                   seg_folders["dataset_json"],
                                   num_processes=1)
    from multimodal_mvd_seg_tpu.imageio.nifti import read_nifti
    seg, _ = read_nifti(str(out / "case_0.nii.gz"))
    assert seg.T[15, 15, 15] == 0  # spurious component removed


def test_ensemble_folders(seg_folders, tmp_path):
    from multimodal_mvd_seg_tpu.ensembling import ensemble_folders
    from multimodal_mvd_seg_tpu.utils.files import save_pickle
    shape = seg_folders["shape"]
    rng = np.random.RandomState(1)
    folders = []
    for m in range(2):
        d = tmp_path / f"model{m}"
        d.mkdir()
        for i in range(2):
            probs = rng.dirichlet((1, 1, 1), size=shape).transpose(3, 0, 1, 2)
            np.savez_compressed(d / f"case_{i}.npz",
                                probabilities=probs.astype(np.float32))
            save_pickle({"spacing": (1.0, 1.0, 1.0)},
                        str(d / f"case_{i}.pkl"))
        import shutil
        shutil.copy(os.path.join(seg_folders["pred"], "plans.json"),
                    d / "plans.json")
        shutil.copy(os.path.join(seg_folders["pred"], "dataset.json"),
                    d / "dataset.json")
        folders.append(str(d))
    out = tmp_path / "ens"
    ensemble_folders(folders, str(out), save_merged_probabilities=True,
                     num_processes=1)
    assert (out / "case_0.nii.gz").exists()
    assert (out / "case_0.npz").exists()
    merged = np.load(out / "case_0.npz")["probabilities"]
    a = np.load(folders[0] + "/case_0.npz")["probabilities"]
    b = np.load(folders[1] + "/case_0.npz")["probabilities"]
    np.testing.assert_allclose(merged, (a + b) / 2, rtol=1e-6)


def test_overlay_plots(tmp_path):
    from multimodal_mvd_seg_tpu.utils.overlay_plots import generate_overlay
    img = np.random.RandomState(0).rand(32, 32)
    seg = np.zeros((32, 32), np.int64)
    seg[8:16, 8:16] = 1
    rgb = generate_overlay(img, seg)
    assert rgb.shape == (32, 32, 3) and rgb.dtype == np.uint8
    # overlay recolors the labeled region
    assert not np.allclose(rgb[10, 10], [rgb[10, 10][0]] * 3)


def test_model_export_import_roundtrip(tmp_path, monkeypatch):
    from multimodal_mvd_seg_tpu import paths
    from multimodal_mvd_seg_tpu.model_sharing import (
        export_pretrained_model, install_model_from_zip_file)
    from multimodal_mvd_seg_tpu.utils.files import save_json
    res1 = tmp_path / "results1"
    res2 = tmp_path / "results2"
    raw = tmp_path / "raw"
    (raw / "Dataset001_Synth").mkdir(parents=True)
    model = res1 / "Dataset001_Synth" / "MVDSegTrainer__nnUNetPlans__3d_fullres"
    (model / "fold_0").mkdir(parents=True)
    save_json({"x": 1}, str(model / "plans.json"))
    save_json({"y": 2}, str(model / "dataset.json"))
    (model / "fold_0" / "checkpoint_final.pkl").write_bytes(b"stub")
    monkeypatch.setenv("MVDSEG_raw", str(raw))
    monkeypatch.setenv("MVDSEG_preprocessed", str(tmp_path / "pre"))
    monkeypatch.setenv("MVDSEG_results", str(res1))
    paths.refresh()
    zip_path = str(tmp_path / "model.zip")
    export_pretrained_model(1, zip_path, configurations=("3d_fullres",),
                            folds=(0,), strict=True)
    res2.mkdir()
    monkeypatch.setenv("MVDSEG_results", str(res2))
    paths.refresh()
    install_model_from_zip_file(zip_path)
    target = res2 / "Dataset001_Synth" / \
        "MVDSegTrainer__nnUNetPlans__3d_fullres"
    assert (target / "plans.json").exists()
    assert (target / "fold_0" / "checkpoint_final.pkl").read_bytes() == b"stub"
    paths.refresh()


def test_convert_old_dataset(tmp_path, monkeypatch):
    from multimodal_mvd_seg_tpu import paths
    from multimodal_mvd_seg_tpu.dataset_conversion import convert_old_dataset
    from multimodal_mvd_seg_tpu.utils.files import load_json, save_json
    src = tmp_path / "Task042_Toy"
    (src / "imagesTr").mkdir(parents=True)
    (src / "labelsTr").mkdir()
    for i in range(2):
        _write_seg(src / "imagesTr" / f"case_{i}_0000.nii.gz",
                   np.zeros((4, 4, 4)))
        _write_seg(src / "labelsTr" / f"case_{i}.nii.gz",
                   np.zeros((4, 4, 4)))
    save_json({"modality": {"0": "MRI"},
               "labels": {"0": "background", "1": "organ"}},
              str(src / "dataset.json"))
    monkeypatch.setenv("MVDSEG_raw", str(tmp_path / "raw"))
    (tmp_path / "raw").mkdir()
    paths.refresh()
    out = convert_old_dataset(str(src))
    ds = load_json(os.path.join(out, "dataset.json"))
    assert ds["channel_names"] == {"0": "MRI"}
    assert ds["labels"]["organ"] == 1
    assert ds["numTraining"] == 2
    paths.refresh()
