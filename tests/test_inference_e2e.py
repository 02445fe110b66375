"""End-to-end inference from raw files: train briefly, restore the predictor
from the results folder (checkpoint path), predict a raw folder, evaluate,
ensemble, and run a 2d configuration — the reference's predict/evaluate CLI
surface."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture()
def trained_model(prepared_dataset_shared):
    # session-preprocessed dataset (tests/conftest.py); short fold-0
    # training via the public entry (writes checkpoint_final)
    synthetic_raw_dataset = prepared_dataset_shared
    from multimodal_mvd_seg_tpu.run.run_training import get_trainer_from_args
    trainer = get_trainer_from_args(1, "3d_fullres", 0)
    trainer.num_epochs = 1
    trainer.num_iterations_per_epoch = 2
    trainer.num_val_iterations_per_epoch = 1
    trainer.n_data_parallel = 2
    trainer.run_training()
    return synthetic_raw_dataset, trainer


def test_predict_from_files_and_evaluate(trained_model, tmp_path):
    ds, trainer = trained_model
    from multimodal_mvd_seg_tpu.inference.predictor import MVDSegPredictor
    from multimodal_mvd_seg_tpu.utils.files import join, load_json, save_json
    import shutil

    # the predictor restores from the model folder: it needs dataset/plans
    model_base = trainer.output_folder_base
    save_json(trainer.plans_manager.plans, join(model_base, "plans.json"))
    save_json(trainer.dataset_json, join(model_base, "dataset.json"))

    predictor = MVDSegPredictor(tile_step_size=0.5, use_mirroring=False,
                                tile_batch_size=2)
    predictor.initialize_from_trained_model_folder(
        model_base, use_folds=(0,), checkpoint_name="checkpoint_final.pkl")

    in_folder = join(ds["raw"], ds["dataset_name"], "imagesTr")
    out_folder = str(tmp_path / "preds")
    predictor.predict_from_files(in_folder, out_folder,
                                 save_probabilities=True)

    from multimodal_mvd_seg_tpu.utils.files import subfiles
    segs = subfiles(out_folder, suffix=".nii.gz", join=False)
    assert len(segs) == ds["n_cases"]
    npzs = subfiles(out_folder, suffix=".npz", join=False)
    assert len(npzs) == ds["n_cases"]

    # output geometry matches the originals
    from multimodal_mvd_seg_tpu.imageio.nifti import read_nifti
    seg, _ = read_nifti(join(out_folder, segs[0]))
    assert tuple(seg.shape) == tuple(reversed(ds["shape"]))

    # evaluate against the gt labels
    from multimodal_mvd_seg_tpu.evaluation.evaluate import (
        compute_metrics_on_folder_simple)
    metrics = compute_metrics_on_folder_simple(
        join(ds["raw"], ds["dataset_name"], "labelsTr"), out_folder,
        trainer.dataset_json)
    assert "foreground_mean" in metrics
    assert np.isfinite(metrics["foreground_mean"]["Dice"]) or \
        metrics["foreground_mean"]["Dice"] is not None

    # ensembling over the same folder twice must reproduce the probabilities
    from multimodal_mvd_seg_tpu.ensembling import ensemble_folders
    save_json(trainer.plans_manager.plans, join(out_folder, "plans.json"))
    save_json(trainer.dataset_json, join(out_folder, "dataset.json"))
    ens = str(tmp_path / "ens")
    ensemble_folders([out_folder, out_folder], ens, num_processes=1)
    assert len(subfiles(ens, suffix=".nii.gz", join=False)) == ds["n_cases"]


def test_2d_configuration_trains(trained_model):
    ds, _ = trained_model
    from multimodal_mvd_seg_tpu.run.run_training import get_trainer_from_args
    trainer = get_trainer_from_args(1, "2d", 0)
    trainer.num_epochs = 1
    trainer.num_iterations_per_epoch = 2
    trainer.num_val_iterations_per_epoch = 1
    trainer.n_data_parallel = 2
    trainer.run_training()
    L = trainer.logger.my_fantastic_logging
    assert np.isfinite(L["train_losses"][0])
