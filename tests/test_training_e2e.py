"""End-to-end training + inference test on the synthetic dataset: the
equivalent of the reference's 5-epoch integration test (SURVEY.md §4), but as
an actual automated assertion suite, on a simulated multi-device CPU mesh."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture()
def prepared_dataset(prepared_dataset_shared):
    # session-preprocessed dataset (tests/conftest.py) — no per-test
    # fingerprint/plan/preprocess
    return prepared_dataset_shared


def test_train_validate_infer(prepared_dataset):
    from multimodal_mvd_seg_tpu.training.trainer import MVDSegTrainer
    from multimodal_mvd_seg_tpu.utils.files import load_json, join

    ds = prepared_dataset
    plans = load_json(join(ds["preprocessed"], ds["dataset_name"],
                           "nnUNetPlans.json"))
    dataset_json = load_json(join(ds["preprocessed"], ds["dataset_name"],
                                  "dataset.json"))
    trainer = MVDSegTrainer(plans, "3d_fullres", 0, dataset_json)
    trainer.num_epochs = 2
    trainer.num_iterations_per_epoch = 3
    trainer.num_val_iterations_per_epoch = 2
    trainer.n_data_parallel = 2   # exercise the sharded path on 2 CPU devices

    trainer.run_training()

    L = trainer.logger.my_fantastic_logging
    assert len(L["train_losses"]) == 2
    assert all(np.isfinite(l) for l in L["train_losses"])
    assert np.isfinite(L["ema_fg_dice"][-1])
    out = trainer.output_folder
    assert os.path.isfile(join(out, "checkpoint_final.pkl"))
    assert os.path.isfile(join(out, "checkpoint_best.pkl"))
    assert os.path.isfile(join(out, "progress.png"))
    assert os.path.isfile(join(out, "debug.json"))

    # checkpoint round-trip
    trainer2 = MVDSegTrainer(plans, "3d_fullres", 0, dataset_json)
    trainer2.num_epochs = 2
    trainer2.n_data_parallel = 2
    trainer2.load_checkpoint(join(out, "checkpoint_final.pkl"))
    assert trainer2.current_epoch == 2
    p1 = trainer.state.params
    p2 = trainer2.state.params
    import jax
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # final validation: sliding-window predict every val case + summary.json
    metrics = trainer.perform_actual_validation()
    assert os.path.isfile(join(out, "validation", "summary.json"))
    assert "foreground_mean" in metrics
    assert np.isfinite(metrics["foreground_mean"]["Dice"]) or \
        metrics["foreground_mean"]["Dice"] is not None


def test_sliding_window_math():
    from multimodal_mvd_seg_tpu.inference.sliding_window import (
        compute_gaussian, compute_steps_for_sliding_window, pad_nd_image)

    g = compute_gaussian((8, 8, 8))
    assert g.shape == (8, 8, 8)
    assert g.max() == pytest.approx(1000.0, rel=1e-3)
    assert g.min() > 0
    # center heavier than corner
    assert g[4, 4, 4] > g[0, 0, 0]

    steps = compute_steps_for_sliding_window((16, 16), (8, 8), 0.5)
    assert steps == [[0, 4, 8], [0, 4, 8]]
    steps = compute_steps_for_sliding_window((8, 8), (8, 8), 0.5)
    assert steps == [[0], [0]]

    x = np.ones((2, 5, 6))
    padded, slicer = pad_nd_image(x, (8, 8))
    assert padded.shape == (2, 8, 8)
    np.testing.assert_array_equal(padded[slicer], x)
