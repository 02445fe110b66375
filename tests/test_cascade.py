"""Cascade pipeline: lowres training → predicted_next_stage export →
cascade-fullres training consuming the previous stage (the reference's
3d_lowres/3d_cascade_fullres loop, configs injected like
tests/integration_tests/add_lowres_and_cascade.py)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture()
def cascade_dataset(synthetic_raw_dataset):
    from multimodal_mvd_seg_tpu.experiment_planning.api import (
        extract_fingerprints, plan_experiments, preprocess)
    from multimodal_mvd_seg_tpu.tests.integration_tests.\
        add_lowres_and_cascade import add_lowres_and_cascade
    extract_fingerprints([1], num_processes=1)
    plan_experiments([1])
    add_lowres_and_cascade([1])
    preprocess([1], configurations=("3d_fullres", "3d_lowres"),
               num_processes=(1, 1))
    return synthetic_raw_dataset


def test_cascade_training_roundtrip(cascade_dataset):
    from multimodal_mvd_seg_tpu.run.run_training import get_trainer_from_args
    from multimodal_mvd_seg_tpu.utils.files import isdir, join, subfiles

    def shorten(t):
        t.num_epochs = 1
        t.num_iterations_per_epoch = 2
        t.num_val_iterations_per_epoch = 1
        t.n_data_parallel = 2
        return t

    # stage 1: lowres — validation must export predicted_next_stage npz
    lowres = shorten(get_trainer_from_args(1, "3d_lowres", 0))
    assert not lowres.is_cascaded
    lowres.run_training()
    lowres.perform_actual_validation()
    next_stage_dir = join(lowres.output_folder_base, "predicted_next_stage",
                          "3d_cascade_fullres")
    assert isdir(next_stage_dir)
    npzs = subfiles(next_stage_dir, suffix=".npz", join=False)
    assert len(npzs) > 0
    # the driver needs ALL cases, not just fold-0 validation: predict the
    # remaining ones by reusing the validation export path over all keys
    # (for this test the fold-0 val cases suffice for the train subset used)

    # stage 2: cascade fullres — consumes the lowres predictions
    from multimodal_mvd_seg_tpu.inference.export import resample_and_save  # noqa
    cascade = shorten(get_trainer_from_args(1, "3d_cascade_fullres", 0))
    assert cascade.is_cascaded
    assert cascade.folder_with_segs_from_previous_stage.endswith(
        "predicted_next_stage/3d_cascade_fullres")
    # make every case available to the cascade loader
    import shutil
    from multimodal_mvd_seg_tpu.data.dataset import MVDSegDataset
    all_cases = MVDSegDataset(cascade.preprocessed_dataset_folder).keys()
    have = {n[:-4] for n in npzs}
    template = join(next_stage_dir, npzs[0])
    for c in all_cases:
        if c not in have:
            shutil.copy(template, join(next_stage_dir, c + ".npz"))
    # input channels: 2 modalities + 2 one-hot fg labels
    assert cascade.num_input_channels == 4
    cascade.run_training()
    L = cascade.logger.my_fantastic_logging
    assert np.isfinite(L["train_losses"][0])


def test_prepare_integration_datasets(tmp_path, monkeypatch):
    from multimodal_mvd_seg_tpu import paths
    for d in ("raw", "pre", "res"):
        (tmp_path / d).mkdir()
    monkeypatch.setenv("MVDSEG_raw", str(tmp_path / "raw"))
    monkeypatch.setenv("MVDSEG_preprocessed", str(tmp_path / "pre"))
    monkeypatch.setenv("MVDSEG_results", str(tmp_path / "res"))
    paths.refresh()
    from multimodal_mvd_seg_tpu.tests.integration_tests.\
        prepare_integration_tests import prepare_integration_tests
    created = prepare_integration_tests()
    assert len(created) == 4
    from multimodal_mvd_seg_tpu.utils.files import join, load_json
    ds999 = load_json(join(str(tmp_path / "raw"),
                           "Dataset999_IntegrationTest", "dataset.json"))
    assert "ignore" in ds999["labels"]
    assert isinstance(ds999["labels"]["all_fg"], (list, tuple))
    from multimodal_mvd_seg_tpu.tests.integration_tests.\
        cleanup_integration_test import cleanup_integration_test
    cleanup_integration_test()
    import os
    assert not os.listdir(str(tmp_path / "raw"))
    paths.refresh()
