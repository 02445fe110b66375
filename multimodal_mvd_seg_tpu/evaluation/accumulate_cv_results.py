"""Merge per-fold validation predictions into one cross-validation folder.

Parity: reference nnunetv2/evaluation/accumulate_cv_results.py — copy every
fold's ``validation/`` outputs into ``crossval_results_folds_X_Y_.../`` and
compute a fresh summary.json over the merged set.
"""

import shutil
from typing import List, Tuple, Union

from ..configuration import default_num_processes
from ..plans.plans_handler import PlansManager
from ..utils.files import (isdir, isfile, join, load_json, maybe_mkdir_p,
                           subfiles)
from .evaluate import compute_metrics_on_folder


def folds_tuple_to_string(folds: Union[List, Tuple]) -> str:
    """reference utilities/file_path_utilities.py naming."""
    return "_".join(str(f) for f in folds)


def accumulate_cv_results(trained_model_folder: str,
                          merged_output_folder: str,
                          folds: Union[List[int], Tuple[int, ...]],
                          num_processes: int = default_num_processes,
                          overwrite: bool = True):
    if overwrite and isdir(merged_output_folder):
        shutil.rmtree(merged_output_folder)
    maybe_mkdir_p(merged_output_folder)

    dataset_json = load_json(join(trained_model_folder, "dataset.json"))
    plans = load_json(join(trained_model_folder, "plans.json"))
    plans_manager = PlansManager(plans)
    rw = plans_manager.image_reader_writer_class()
    label_manager = plans_manager.get_label_manager(dataset_json)
    file_ending = dataset_json["file_ending"]

    # carry plans/dataset.json like the reference — downstream
    # determine_postprocessing reads them from the merged folder when a
    # single model wins find_best_configuration
    shutil.copy(join(trained_model_folder, "plans.json"),
                join(merged_output_folder, "plans.json"))
    shutil.copy(join(trained_model_folder, "dataset.json"),
                join(merged_output_folder, "dataset.json"))

    for f in folds:
        val = join(trained_model_folder, f"fold_{f}", "validation")
        assert isdir(val), f"expected validation folder missing: {val}"
        for fn in subfiles(val, join=False):
            if fn.endswith(file_ending) or fn.endswith(".npz") or \
                    fn.endswith(".pkl"):
                dst = join(merged_output_folder, fn)
                if overwrite or not isfile(dst):
                    shutil.copy(join(val, fn), dst)

    if overwrite or not isfile(join(merged_output_folder, "summary.json")):
        from .. import paths
        gt_folder = join(paths.get_preprocessed(),
                         plans_manager.dataset_name, "gt_segmentations")
        if not isdir(gt_folder):
            gt_folder = join(paths.get_raw(), plans_manager.dataset_name,
                             "labelsTr")
        labels = label_manager.foreground_regions \
            if label_manager.has_regions else label_manager.foreground_labels
        compute_metrics_on_folder(
            gt_folder, merged_output_folder,
            join(merged_output_folder, "summary.json"), rw, file_ending,
            labels, label_manager.ignore_label, num_processes)
