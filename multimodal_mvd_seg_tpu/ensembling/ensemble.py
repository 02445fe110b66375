"""Probability ensembling.

Parity: reference nnunetv2/ensembling/ensemble.py — average the saved
softmax ``.npz`` probabilities across models/folds and export segmentations:
``ensemble_folders`` (:49) over prediction folders, and
``ensemble_crossvalidations`` (:128) over trained-model folders' per-fold
``validation/`` outputs (used by find_best_configuration).
"""

import multiprocessing
from typing import List, Optional, Union

import numpy as np

from ..configuration import default_num_processes
from ..plans.plans_handler import PlansManager
from ..utils.files import (isfile, join, load_json, load_pickle,
                           maybe_mkdir_p, save_json, subfiles)


def merge_files(files: List[str], output_filename_truncated: str,
                plans_manager: PlansManager, dataset_json: dict,
                save_merged_probabilities: bool = False):
    """Average the probability npz files of one case and export the
    segmentation (reference ensemble.py:21-46)."""
    label_manager = plans_manager.get_label_manager(dataset_json)
    probabilities = None
    for f in files:
        prob = np.load(f)["probabilities"].astype(np.float32)
        probabilities = prob if probabilities is None else probabilities + prob
    probabilities /= len(files)

    properties = load_pickle(files[0][:-4] + ".pkl")
    segmentation = label_manager.convert_probabilities_to_segmentation(
        probabilities)
    rw = plans_manager.image_reader_writer_class()
    rw.write_seg(np.asarray(segmentation),
                 output_filename_truncated + dataset_json["file_ending"],
                 properties)
    if save_merged_probabilities:
        np.savez_compressed(output_filename_truncated + ".npz",
                            probabilities=probabilities)
        from ..utils.files import save_pickle
        save_pickle(properties, output_filename_truncated + ".pkl")


def ensemble_folders(list_of_input_folders: List[str], output_folder: str,
                     save_merged_probabilities: bool = False,
                     num_processes: int = default_num_processes,
                     dataset_json_file_or_dict: Union[str, dict, None] = None,
                     plans_json_file_or_dict: Union[str, dict, None] = None):
    """reference ensemble.py:49-95."""
    if dataset_json_file_or_dict is None:
        dataset_json_file_or_dict = join(list_of_input_folders[0],
                                         "dataset.json")
    dataset_json = load_json(dataset_json_file_or_dict) \
        if isinstance(dataset_json_file_or_dict, str) \
        else dataset_json_file_or_dict
    if plans_json_file_or_dict is None:
        plans_json_file_or_dict = join(list_of_input_folders[0], "plans.json")
    plans = load_json(plans_json_file_or_dict) \
        if isinstance(plans_json_file_or_dict, str) else plans_json_file_or_dict
    plans_manager = PlansManager(plans)

    # cases present (as npz) in ALL folders
    npz_per_folder = [set(f[:-4] for f in subfiles(fld, suffix=".npz",
                                                   join=False))
                      for fld in list_of_input_folders]
    common = sorted(set.intersection(*npz_per_folder))
    assert common, "No common .npz probability files across input folders " \
        "(predict with --save_probabilities)"
    maybe_mkdir_p(output_folder)
    jobs = [([join(fld, c + ".npz") for fld in list_of_input_folders],
             join(output_folder, c), plans_manager, dataset_json,
             save_merged_probabilities) for c in common]
    if num_processes <= 1:
        for j in jobs:
            merge_files(*j)
    else:
        with multiprocessing.get_context("spawn").Pool(num_processes) as p:
            p.starmap(merge_files, jobs)
    save_json(dataset_json, join(output_folder, "dataset.json"), sort_keys=False)
    save_json(plans, join(output_folder, "plans.json"), sort_keys=False)


def ensemble_crossvalidations(list_of_trained_model_folders: List[str],
                              output_folder: str,
                              folds: Union[List[int], tuple] = (0, 1, 2, 3, 4),
                              num_processes: int = default_num_processes):
    """Ensemble the cross-validation (validation-set) probabilities of
    several trained models (reference ensemble.py:128-206)."""
    dataset_json = load_json(join(list_of_trained_model_folders[0],
                                  "dataset.json"))
    plans = load_json(join(list_of_trained_model_folders[0], "plans.json"))
    plans_manager = PlansManager(plans)

    # case → fold folder per model
    per_model = []
    for tr in list_of_trained_model_folders:
        case_to_file = {}
        for f in folds:
            val = join(tr, f"fold_{f}", "validation")
            for npz in subfiles(val, suffix=".npz", join=False):
                case_to_file[npz[:-4]] = join(val, npz)
        per_model.append(case_to_file)
    common = sorted(set.intersection(*(set(m) for m in per_model)))
    assert common, "No common validation .npz files across models; run " \
        "training/validation with probability saving first"

    maybe_mkdir_p(output_folder)
    jobs = [([m[c] for m in per_model], join(output_folder, c),
             plans_manager, dataset_json, False) for c in common]
    if num_processes <= 1:
        for j in jobs:
            merge_files(*j)
    else:
        with multiprocessing.get_context("spawn").Pool(num_processes) as p:
            p.starmap(merge_files, jobs)
    save_json(dataset_json, join(output_folder, "dataset.json"), sort_keys=False)
    save_json(plans, join(output_folder, "plans.json"), sort_keys=False)
