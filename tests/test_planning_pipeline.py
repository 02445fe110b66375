"""End-to-end data-prep test: fingerprint → plan → preprocess on the synthetic
dataset (the integration path of reference plan_and_preprocess, call stack
SURVEY.md §3.2)."""

import os

import numpy as np

from multimodal_mvd_seg_tpu.utils.files import load_json, load_pickle, join


def test_fingerprint_plan_preprocess(synthetic_raw_dataset):
    from multimodal_mvd_seg_tpu.experiment_planning.api import (
        extract_fingerprints, plan_experiments, preprocess)
    from multimodal_mvd_seg_tpu.plans.plans_handler import PlansManager

    ds = synthetic_raw_dataset
    extract_fingerprints([1], num_processes=1, check_dataset_integrity=True)

    fp_file = join(ds["preprocessed"], ds["dataset_name"],
                   "dataset_fingerprint.json")
    assert os.path.isfile(fp_file)
    fp = load_json(fp_file)
    assert len(fp["spacings"]) == ds["n_cases"]
    assert "0" in fp["foreground_intensity_properties_per_channel"] or \
        0 in fp["foreground_intensity_properties_per_channel"]

    plan_experiments([1])
    plans_file = join(ds["preprocessed"], ds["dataset_name"], "nnUNetPlans.json")
    assert os.path.isfile(plans_file)
    pm = PlansManager(plans_file)
    assert "2d" in pm.available_configurations
    assert "3d_fullres" in pm.available_configurations
    cfg = pm.get_configuration("3d_fullres")
    assert len(cfg.patch_size) == 3
    assert cfg.batch_size >= 2
    # patch must be divisible by the pooling product per axis
    pools = np.prod(cfg.pool_op_kernel_sizes, 0)
    assert all(p % q == 0 for p, q in zip(cfg.patch_size, pools))

    preprocess([1], configurations=("3d_fullres",), num_processes=(1,))
    out_dir = join(ds["preprocessed"], ds["dataset_name"],
                   cfg.data_identifier)
    npzs = [f for f in os.listdir(out_dir) if f.endswith(".npz")]
    assert len(npzs) == ds["n_cases"]

    arr = np.load(join(out_dir, npzs[0]))
    data, seg = arr["data"], arr["seg"]
    assert data.ndim == 4 and seg.ndim == 4
    assert data.dtype == np.float32
    # z-score normalization applied
    assert abs(float(data.mean())) < 1.0
    props = load_pickle(join(out_dir, npzs[0].replace(".npz", ".pkl")))
    assert "class_locations" in props
    assert 1 in props["class_locations"] and 2 in props["class_locations"]
    assert len(props["class_locations"][2]) > 0
    assert "bbox_used_for_cropping" in props
    assert "shape_before_cropping" in props


def test_fingerprint_all_background_dataset(tmp_path, monkeypatch):
    """A dataset whose labels are all background still fingerprints (the
    per-channel foreground concat used to crash on the empty list)."""
    from multimodal_mvd_seg_tpu.imageio.nifti import write_nifti
    from multimodal_mvd_seg_tpu.experiment_planning.generate_dataset_json import (
        generate_dataset_json)
    raw = tmp_path / "raw"
    pre = tmp_path / "pre"
    ds = raw / "Dataset002_Empty"
    (ds / "imagesTr").mkdir(parents=True)
    (ds / "labelsTr").mkdir(parents=True)
    pre.mkdir()
    rng = np.random.RandomState(0)
    for i in range(2):
        write_nifti(str(ds / "imagesTr" / f"c{i}_0000.nii.gz"),
                    rng.rand(8, 8, 8).astype(np.float32))
        write_nifti(str(ds / "labelsTr" / f"c{i}.nii.gz"),
                    np.zeros((8, 8, 8), np.uint8))
    generate_dataset_json(str(ds), channel_names={0: "T1"},
                          labels={"background": 0, "organ": 1},
                          num_training_cases=2, file_ending=".nii.gz",
                          dataset_name="Dataset002_Empty")
    monkeypatch.setenv("MVDSEG_raw", str(raw))
    monkeypatch.setenv("MVDSEG_preprocessed", str(pre))
    monkeypatch.setenv("MVDSEG_results", str(tmp_path / "res"))
    (tmp_path / "res").mkdir()
    from multimodal_mvd_seg_tpu import paths
    paths.refresh()
    from multimodal_mvd_seg_tpu.experiment_planning.api import (
        extract_fingerprints)
    extract_fingerprints([2], num_processes=1)
    import json
    fp = json.load(open(pre / "Dataset002_Empty"
                        / "dataset_fingerprint.json"))
    stats = fp["foreground_intensity_properties_per_channel"]["0"]
    assert np.isfinite(stats["mean"])
