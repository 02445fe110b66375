"""End-to-end integration run over the derived datasets.

Parity: reference nnunetv2/tests/integration_tests/run_integration_test.sh +
run_integration_test_bestconfig_inference.py: plan+preprocess each derived
dataset, train all configurations × folds with a short trainer, then run
find_best_configuration + inference + postprocessing. Pass criterion, per
the reference readme (:47-52): nothing crashes and
inference_information.json exists.
"""

import argparse

from ...evaluation.find_best_configuration import (default_trained_models,
                                                   find_best_configuration)
from ...experiment_planning.api import (extract_fingerprints,
                                        plan_experiments, preprocess)
from ...run.run_training import run_training
from .add_lowres_and_cascade import add_lowres_and_cascade


def run_integration_test(dataset_id: int,
                         trainer: str = "nnUNetTrainer_5epochs",
                         configurations=("2d", "3d_fullres", "3d_lowres",
                                         "3d_cascade_fullres"),
                         folds=(0, 1, 2, 3, 4),
                         with_cascade: bool = True):
    extract_fingerprints([dataset_id], num_processes=1,
                         check_dataset_integrity=True)
    plan_experiments([dataset_id])
    if with_cascade:
        add_lowres_and_cascade([dataset_id])
    preprocess([dataset_id],
               configurations=[c for c in configurations
                               if c != "3d_cascade_fullres"],
               num_processes=(1,))
    for c in configurations:
        for f in folds:
            run_training(dataset_id, c, f, trainer_name=trainer,
                         export_validation_probabilities=True)
    models = default_trained_models((trainer,), ("nnUNetPlans",),
                                    tuple(configurations))
    info = find_best_configuration(dataset_id, models, folds=tuple(folds))
    print("integration test finished; best:",
          info["best_model_or_ensemble"]["key"])
    return info


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("dataset_id", type=int)
    p.add_argument("-tr", default="nnUNetTrainer_5epochs")
    p.add_argument("-c", nargs="+",
                   default=("2d", "3d_fullres"))
    p.add_argument("-f", nargs="+", type=int, default=(0,))
    a = p.parse_args()
    run_integration_test(a.dataset_id, a.tr, tuple(a.c), tuple(a.f),
                         with_cascade="3d_cascade_fullres" in a.c)
