"""Prediction evaluation: per-case tp/fp/fn/tn masks → Dice/IoU + summary.json.

Parity: reference nnunetv2/evaluation/evaluate_predictions.py:89-180
(compute_metrics, compute_metrics_on_folder with per-case results, per-class
means and foreground mean)."""

import multiprocessing
import os
from typing import List, Optional, Union

import numpy as np

from ..imageio.registry import determine_reader_writer_from_dataset_json
from ..plans.label_handling import LabelManager
from ..utils.files import join, isfile, load_json, save_json, subfiles


def label_or_region_to_mask(seg: np.ndarray, label_or_region) -> np.ndarray:
    if np.isscalar(label_or_region):
        return seg == label_or_region
    mask = np.zeros_like(seg, dtype=bool)
    for l in label_or_region:
        mask |= seg == l
    return mask


def compute_tp_fp_fn_tn(mask_ref: np.ndarray, mask_pred: np.ndarray,
                        ignore_mask: Optional[np.ndarray] = None):
    use = ~ignore_mask if ignore_mask is not None else None
    if use is None:
        tp = int(np.sum(mask_ref & mask_pred))
        fp = int(np.sum(~mask_ref & mask_pred))
        fn = int(np.sum(mask_ref & ~mask_pred))
        tn = int(np.sum(~mask_ref & ~mask_pred))
    else:
        tp = int(np.sum(mask_ref & mask_pred & use))
        fp = int(np.sum(~mask_ref & mask_pred & use))
        fn = int(np.sum(mask_ref & ~mask_pred & use))
        tn = int(np.sum(~mask_ref & ~mask_pred & use))
    return tp, fp, fn, tn


def compute_metrics(reference_file: str, prediction_file: str, image_reader_writer,
                    labels_or_regions, ignore_label: Optional[int] = None) -> dict:
    """reference evaluate_predictions.py:89-121."""
    seg_ref, _ = image_reader_writer.read_seg(reference_file)
    seg_pred, _ = image_reader_writer.read_seg(prediction_file)
    ignore_mask = (seg_ref == ignore_label) if ignore_label is not None else None

    results = {'reference_file': reference_file,
               'prediction_file': prediction_file, 'metrics': {}}
    for r in labels_or_regions:
        key = str(r) if isinstance(r, (tuple, list)) else r
        mask_ref = label_or_region_to_mask(seg_ref, r)
        mask_pred = label_or_region_to_mask(seg_pred, r)
        tp, fp, fn, tn = compute_tp_fp_fn_tn(mask_ref, mask_pred, ignore_mask)
        m = {}
        if tp + fp + fn == 0:
            m['Dice'] = np.nan
            m['IoU'] = np.nan
        else:
            m['Dice'] = 2 * tp / (2 * tp + fp + fn)
            m['IoU'] = tp / (tp + fp + fn)
        m.update({'FP': fp, 'TP': tp, 'FN': fn, 'TN': tn,
                  'n_pred': fp + tp, 'n_ref': fn + tp})
        results['metrics'][key] = m
    return results


def compute_metrics_on_folder(folder_ref: str, folder_pred: str,
                              output_file: Optional[str],
                              image_reader_writer, file_ending: str,
                              regions_or_labels, ignore_label: Optional[int] = None,
                              num_processes: int = 1, chill: bool = True) -> dict:
    """reference evaluate_predictions.py:123-180."""
    files_pred = subfiles(folder_pred, suffix=file_ending, join=False)
    files_ref = subfiles(folder_ref, suffix=file_ending, join=False)
    if not chill:
        assert all(i in files_ref for i in files_pred), \
            "Not all prediction files have a reference"
    files = [f for f in files_pred if f in files_ref]

    jobs = [(join(folder_ref, f), join(folder_pred, f), image_reader_writer,
             regions_or_labels, ignore_label) for f in files]
    if not jobs:
        raise RuntimeError(
            f"no prediction in {folder_pred} matches a reference in "
            f"{folder_ref} (file_ending {file_ending!r}) — nothing to "
            f"evaluate")
    if num_processes <= 1:
        results = [compute_metrics(*j) for j in jobs]
    else:
        with multiprocessing.get_context("spawn").Pool(num_processes) as p:
            results = p.starmap(compute_metrics, jobs)

    metric_list = list(results[0]['metrics'][
        list(results[0]['metrics'].keys())[0]].keys())
    means = {}
    for r in results[0]['metrics'].keys():
        means[r] = {m: float(np.nanmean([res['metrics'][r][m]
                                         for res in results]))
                    for m in metric_list}
    foreground_mean = {m: float(np.mean(
        [means[k][m] for k in means if k != 0 and k != '0']))
        for m in metric_list}

    result = {'metric_per_case': results, 'mean': means,
              'foreground_mean': foreground_mean}
    if output_file is not None:
        save_json(_jsonify(result), output_file)
    return result


def _jsonify(obj):
    if isinstance(obj, dict):
        return {str(k): _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(i) for i in obj]
    if isinstance(obj, (np.floating, float)) and np.isnan(obj):
        return None
    if isinstance(obj, np.generic):
        return obj.item()
    return obj


def compute_metrics_on_folder_simple(folder_ref: str, folder_pred: str,
                                     dataset_json: dict,
                                     case_identifiers: Optional[List[str]] = None,
                                     num_processes: int = 1) -> dict:
    """Convenience used by the trainer's final validation."""
    lm = LabelManager(dataset_json['labels'],
                      dataset_json.get('regions_class_order'))
    rw = determine_reader_writer_from_dataset_json(dataset_json,
                                                   verbose=False)()
    labels = lm.foreground_regions if lm.has_regions else lm.foreground_labels
    return compute_metrics_on_folder(
        folder_ref, folder_pred, None, rw, dataset_json['file_ending'],
        labels, lm.ignore_label, num_processes)
