"""Prediction export: logits → original-grid segmentation files.

Parity: reference nnunetv2/inference/export_prediction.py:15-145 — resample
logits to the pre-resampling shape, apply the inference nonlinearity, convert
to a segmentation, revert cropping and transposition, write via the dataset's
reader/writer. ``resample_and_save`` feeds cascade next stages."""

from typing import Union

import numpy as np

from ..plans.plans_handler import PlansManager, ConfigurationManager
from ..utils.files import save_pickle


def convert_predicted_logits_to_segmentation_with_correct_shape(
        predicted_logits: np.ndarray, plans_manager: PlansManager,
        configuration_manager: ConfigurationManager, label_manager,
        properties_dict: dict, return_probabilities: bool = False):
    """reference export_prediction.py:15-68."""
    # resample to shape after cropping / before resampling
    spacing = configuration_manager.spacing
    current_spacing = spacing if len(spacing) == \
        len(properties_dict['shape_after_cropping_and_before_resampling']) else \
        [properties_dict['spacing'][0], *spacing]
    target_spacing = [properties_dict['spacing'][i]
                      for i in plans_manager.transpose_forward]
    predicted_logits = configuration_manager.resampling_fn_probabilities(
        predicted_logits,
        properties_dict['shape_after_cropping_and_before_resampling'],
        current_spacing, target_spacing)

    predicted_probabilities = label_manager.apply_inference_nonlin(
        predicted_logits)
    del predicted_logits
    segmentation = label_manager.convert_probabilities_to_segmentation(
        np.asarray(predicted_probabilities))

    # revert cropping
    segmentation_reverted_cropping = np.zeros(
        properties_dict['shape_before_cropping'],
        dtype=np.uint8 if len(label_manager.foreground_labels) < 255
        else np.uint16)
    slicer = tuple(slice(lo, hi)
                   for lo, hi in properties_dict['bbox_used_for_cropping'])
    segmentation_reverted_cropping[slicer] = segmentation
    del segmentation

    # revert transpose
    segmentation_reverted_cropping = segmentation_reverted_cropping.transpose(
        plans_manager.transpose_backward)
    if return_probabilities:
        probs = np.asarray(predicted_probabilities)
        probs = label_manager.revert_cropping_on_probabilities(
            probs, properties_dict['bbox_used_for_cropping'],
            properties_dict['shape_before_cropping'])
        probs = probs.transpose([0] + [i + 1 for i in
                                       plans_manager.transpose_backward])
        return segmentation_reverted_cropping, probs
    return segmentation_reverted_cropping


def export_prediction_from_logits(predicted_logits: np.ndarray,
                                  properties_dict: dict,
                                  configuration_manager: ConfigurationManager,
                                  plans_manager: PlansManager,
                                  dataset_json: dict,
                                  output_file_truncated: str,
                                  save_probabilities: bool = False):
    """reference export_prediction.py:71-106."""
    label_manager = plans_manager.get_label_manager(dataset_json)
    ret = convert_predicted_logits_to_segmentation_with_correct_shape(
        predicted_logits, plans_manager, configuration_manager, label_manager,
        properties_dict, return_probabilities=save_probabilities)
    if save_probabilities:
        segmentation_final, probabilities_final = ret
        base = output_file_truncated
        for e in (".nii.gz", ".nii", ".png", ".tif", ".tiff"):
            if base.endswith(e):
                base = base[: -len(e)]
                break
        np.savez_compressed(base + ".npz", probabilities=probabilities_final)
        save_pickle(properties_dict, base + ".pkl")
    else:
        segmentation_final = ret

    rw = plans_manager.image_reader_writer_class()
    out = output_file_truncated
    if not any(out.endswith(e) for e in
               (dataset_json["file_ending"],)):
        out = out + dataset_json["file_ending"]
    rw.write_seg(segmentation_final, out, properties_dict)


def resample_and_save(predicted_logits: np.ndarray, target_shape,
                      output_file: str, plans_manager: PlansManager,
                      configuration_manager: ConfigurationManager,
                      properties_dict: dict, dataset_json: dict):
    """Cascade helper: resample lowres logits to the next stage's grid and
    save the argmax segmentation npz (reference export_prediction.py:109-145)."""
    label_manager = plans_manager.get_label_manager(dataset_json)
    spacing = configuration_manager.spacing
    current_spacing = spacing if len(spacing) == len(target_shape) else \
        [properties_dict['spacing'][0], *spacing]
    target_spacing = spacing  # same spacing family; shape drives the resize
    resampled = configuration_manager.resampling_fn_probabilities(
        predicted_logits, target_shape, current_spacing, target_spacing)
    seg = label_manager.convert_logits_to_segmentation(resampled)
    np.savez_compressed(output_file, seg=seg.astype(np.int8)[None])
