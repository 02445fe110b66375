"""CLI surface: every console script resolves; argparse wiring of
representative entry points drives the underlying APIs."""

import sys

import numpy as np
import pytest


def test_all_console_scripts_resolve():
    import importlib
    import tomllib
    cfg = tomllib.load(open("pyproject.toml", "rb"))
    scripts = cfg["project"]["scripts"]
    # 23 canonical (21 reference-parity + mvdseg_import_torch_checkpoint
    # + mvdseg_import_torch_model_folder) + 21 nnUNetv2_* aliases
    assert len(scripts) == 44
    for name, target in scripts.items():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn)), name


def test_plan_and_preprocess_cli(synthetic_raw_dataset, monkeypatch):
    from multimodal_mvd_seg_tpu.cli.entrypoints import (
        extract_fingerprint_entry, plan_experiment_entry, preprocess_entry)
    from multimodal_mvd_seg_tpu.utils.files import isfile, join
    ds = synthetic_raw_dataset
    monkeypatch.setattr(sys, "argv", ["prog", "-d", "1", "-np", "1"])
    extract_fingerprint_entry()
    assert isfile(join(ds["preprocessed"], ds["dataset_name"],
                       "dataset_fingerprint.json"))
    monkeypatch.setattr(sys, "argv", ["prog", "-d", "1"])
    plan_experiment_entry()
    assert isfile(join(ds["preprocessed"], ds["dataset_name"],
                       "nnUNetPlans.json"))
    monkeypatch.setattr(sys, "argv", ["prog", "-d", "1", "-c", "3d_fullres",
                                      "-np", "1"])
    preprocess_entry()
    from multimodal_mvd_seg_tpu.utils.files import subfiles
    npzs = subfiles(join(ds["preprocessed"], ds["dataset_name"],
                         "nnUNetPlans_3d_fullres"), suffix=".npz")
    assert len(npzs) == ds["n_cases"]


def test_evaluate_simple_cli(tmp_path, monkeypatch):
    from multimodal_mvd_seg_tpu.cli.entrypoints import (
        evaluate_simple_entry_point)
    from multimodal_mvd_seg_tpu.imageio.nifti import write_nifti
    from multimodal_mvd_seg_tpu.utils.files import load_json
    gt = tmp_path / "gt"
    pred = tmp_path / "pred"
    gt.mkdir()
    pred.mkdir()
    seg = np.zeros((8, 8, 8), np.uint8)
    seg[2:6, 2:6, 2:6] = 1
    for d in (gt, pred):
        write_nifti(str(d / "case_0.nii.gz"), seg, spacing=(1, 1, 1))
    out = str(tmp_path / "summary.json")
    monkeypatch.setattr(sys, "argv", ["prog", str(gt), str(pred),
                                      "-l", "1", "-o", out, "-np", "1"])
    evaluate_simple_entry_point()
    res = load_json(out)
    assert res["foreground_mean"]["Dice"] == pytest.approx(1.0)
