"""Connected-component postprocessing.

Parity: reference nnunetv2/postprocessing/remove_connected_components.py
(:22-253): remove-all-but-largest-CC per foreground label/region, decided by
the measured Dice gain on cross-validation predictions; the accepted
pipeline is pickled to ``postprocessing.pkl`` and summarized in
``postprocessing.json``. Host-side numpy/scipy (this never touches the hot
path). The reference's ``do_this = True`` debug override that
unconditionally accepts the first stage (:163) is NOT copied.
"""

import multiprocessing
import pickle
import shutil
from typing import Callable, List, Optional, Tuple, Union

import numpy as np

from ..configuration import default_num_processes
from ..evaluation.evaluate import (compute_metrics_on_folder,
                                   label_or_region_to_mask)
from ..plans.plans_handler import PlansManager
from ..utils.files import (isdir, isfile, join, load_json, maybe_mkdir_p,
                           save_json, subfiles)


def remove_all_but_largest_component(mask: np.ndarray) -> np.ndarray:
    """Keep only the largest 26-connected (3D) / 8-connected (2D) component
    (equivalent of the reference's acvl_utils helper)."""
    from scipy import ndimage
    structure = np.ones((3,) * mask.ndim, dtype=bool)
    labeled, n = ndimage.label(mask, structure=structure)
    if n <= 1:
        return mask.astype(bool)
    sizes = ndimage.sum_labels(np.ones_like(labeled), labeled,
                               index=np.arange(1, n + 1))
    keep = 1 + int(np.argmax(sizes))
    return labeled == keep


def remove_all_but_largest_component_from_segmentation(
        segmentation: np.ndarray,
        labels_or_regions: Union[int, Tuple[int, ...], List],
        background_label: int = 0) -> np.ndarray:
    """reference :22-35."""
    mask = np.zeros_like(segmentation, dtype=bool)
    if not isinstance(labels_or_regions, list):
        labels_or_regions = [labels_or_regions]
    for l_or_r in labels_or_regions:
        mask |= label_or_region_to_mask(segmentation, l_or_r)
    keep = remove_all_but_largest_component(mask)
    ret = np.copy(segmentation)
    ret[mask & ~keep] = background_label
    return ret


def apply_postprocessing(segmentation: np.ndarray, pp_fns: List[Callable],
                         pp_fn_kwargs: List[dict]) -> np.ndarray:
    for fn, kwargs in zip(pp_fns, pp_fn_kwargs):
        segmentation = fn(segmentation, **kwargs)
    return segmentation


def load_postprocess_save(segmentation_file: str, output_fname: str,
                          image_reader_writer, pp_fns: List[Callable],
                          pp_fn_kwargs: List[dict]):
    seg, props = image_reader_writer.read_seg(segmentation_file)
    seg = apply_postprocessing(seg[0], pp_fns, pp_fn_kwargs)
    image_reader_writer.write_seg(seg, output_fname, props)


def _process_folder(src, dst, files, rw, pp_fns, pp_fn_kwargs, num_processes):
    maybe_mkdir_p(dst)
    jobs = [(join(src, f), join(dst, f), rw, pp_fns, pp_fn_kwargs)
            for f in files]
    if num_processes <= 1:
        for j in jobs:
            load_postprocess_save(*j)
    else:
        with multiprocessing.get_context("spawn").Pool(num_processes) as p:
            p.starmap(load_postprocess_save, jobs)


def determine_postprocessing(folder_predictions: str, folder_ref: str,
                             plans_file_or_dict: Union[str, dict, None] = None,
                             dataset_json_file_or_dict: Union[str, dict, None] = None,
                             num_processes: int = default_num_processes,
                             keep_postprocessed_files: bool = True):
    """reference :55-253 — greedy acceptance of largest-CC removal, first on
    the union of foreground labels, then per label/region, each kept only if
    it measurably improves Dice."""
    output_folder = join(folder_predictions, "postprocessed")
    if plans_file_or_dict is None:
        plans_file_or_dict = join(folder_predictions, "plans.json")
    plans = load_json(plans_file_or_dict) \
        if isinstance(plans_file_or_dict, str) else plans_file_or_dict
    if dataset_json_file_or_dict is None:
        dataset_json_file_or_dict = join(folder_predictions, "dataset.json")
    dataset_json = load_json(dataset_json_file_or_dict) \
        if isinstance(dataset_json_file_or_dict, str) \
        else dataset_json_file_or_dict

    plans_manager = PlansManager(plans)
    rw = plans_manager.image_reader_writer_class()
    label_manager = plans_manager.get_label_manager(dataset_json)
    labels_or_regions = label_manager.foreground_regions \
        if label_manager.has_regions else label_manager.foreground_labels

    file_ending = dataset_json["file_ending"]
    predicted_files = subfiles(folder_predictions, suffix=file_ending,
                               join=False)

    def evaluate(folder):
        return compute_metrics_on_folder(
            folder_ref, folder, join(folder, "summary.json"), rw,
            file_ending, labels_or_regions, label_manager.ignore_label,
            num_processes)

    baseline = evaluate(folder_predictions)
    pp_fns: List[Callable] = []
    pp_fn_kwargs: List[dict] = []
    source = folder_predictions
    source_results = baseline

    # stage 1: all-but-largest on the union of all foreground labels
    out_here = join(output_folder, "temp", "keep_largest_fg")
    kwargs = {"labels_or_regions": label_manager.foreground_labels}
    _process_folder(source, out_here, predicted_files, rw,
                    [remove_all_but_largest_component_from_segmentation],
                    [kwargs], num_processes)
    pp_results = evaluate(out_here)
    do_this = pp_results["foreground_mean"]["Dice"] > \
        source_results["foreground_mean"]["Dice"]
    if do_this:  # defensive: no single class may get worse
        for k in pp_results["mean"]:
            if pp_results["mean"][k]["Dice"] < source_results["mean"][k]["Dice"]:
                do_this = False
                break
    if do_this:
        source, source_results = out_here, pp_results
        pp_fns.append(remove_all_but_largest_component_from_segmentation)
        pp_fn_kwargs.append(kwargs)

    # stage 2: per label/region
    if len(labels_or_regions) > 1:
        for l_or_r in labels_or_regions:
            out_here = join(output_folder, "temp",
                            "keep_largest_perClassOrRegion")
            kwargs = {"labels_or_regions": l_or_r}
            _process_folder(source, out_here, predicted_files, rw,
                            [remove_all_but_largest_component_from_segmentation],
                            [kwargs], num_processes)
            pp_results = evaluate(out_here)
            # compute_metrics stringifies tuple/list (region) keys —
            # evaluate.py:53 — so index the mean dict the same way
            mk = str(l_or_r) if isinstance(l_or_r, (tuple, list)) else l_or_r
            if pp_results["mean"][mk]["Dice"] > \
                    source_results["mean"][mk]["Dice"]:
                best = join(output_folder, "temp",
                            "keep_largest_perClassOrRegion_currentBest")
                if isdir(best):
                    shutil.rmtree(best)
                shutil.move(out_here, best)
                source, source_results = best, pp_results
                pp_fns.append(
                    remove_all_but_largest_component_from_segmentation)
                pp_fn_kwargs.append(kwargs)

    maybe_mkdir_p(output_folder)
    for f in subfiles(source, join=False):
        shutil.copy(join(source, f), join(output_folder, f))
    with open(join(folder_predictions, "postprocessing.pkl"), "wb") as f:
        pickle.dump((pp_fns, pp_fn_kwargs), f)

    def strkeys(d):
        return {str(k): v for k, v in d.items()}

    save_json({
        "input_folder": {"foreground_mean": baseline["foreground_mean"],
                         "mean": strkeys(baseline["mean"])},
        "postprocessed": {"foreground_mean": source_results["foreground_mean"],
                          "mean": strkeys(source_results["mean"])},
        "postprocessing_fns": [fn.__name__ for fn in pp_fns],
        "postprocessing_kwargs": pp_fn_kwargs,
    }, join(folder_predictions, "postprocessing.json"))

    if isdir(join(output_folder, "temp")):
        shutil.rmtree(join(output_folder, "temp"))
    if not keep_postprocessed_files:
        shutil.rmtree(output_folder)
    return pp_fns, pp_fn_kwargs


def apply_postprocessing_to_folder(input_folder: str, output_folder: str,
                                   pp_fns: List[Callable],
                                   pp_fn_kwargs: List[dict],
                                   plans_file_or_dict=None,
                                   dataset_json_file_or_dict=None,
                                   num_processes: int = default_num_processes):
    """reference :254-300."""
    if plans_file_or_dict is None:
        plans_file_or_dict = join(input_folder, "plans.json")
    plans = load_json(plans_file_or_dict) \
        if isinstance(plans_file_or_dict, str) else plans_file_or_dict
    if dataset_json_file_or_dict is None:
        dataset_json_file_or_dict = join(input_folder, "dataset.json")
    dataset_json = load_json(dataset_json_file_or_dict) \
        if isinstance(dataset_json_file_or_dict, str) \
        else dataset_json_file_or_dict
    rw = PlansManager(plans).image_reader_writer_class()
    files = subfiles(input_folder, suffix=dataset_json["file_ending"],
                     join=False)
    _process_folder(input_folder, output_folder, files, rw, pp_fns,
                    pp_fn_kwargs, num_processes)
