"""Label/region/ignore-label semantics and probability→segmentation conversion.

Parity: reference nnunetv2/utilities/label_handling/label_handling.py:21-301.
Numpy/JAX implementation (inference nonlinearity is computed on-device when the
input is a jax.Array)."""

from typing import List, Tuple, Union

import numpy as np


def softmax_dim0(x: np.ndarray) -> np.ndarray:
    x = x - x.max(0, keepdims=True)
    e = np.exp(x)
    return e / e.sum(0, keepdims=True)


def sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


class LabelManager:
    """Reference label_handling.py:21-235. Handles three labeling modes:
    plain labels, overlapping regions (sigmoid heads + regions_class_order),
    and an optional ignore label (must be the highest value)."""

    def __init__(self, label_dict: dict, regions_class_order: Union[List[int], None],
                 force_use_labels: bool = False, inference_nonlin=None):
        self._sanity_check(label_dict)
        self.label_dict = label_dict
        self.regions_class_order = regions_class_order
        self._force_use_labels = force_use_labels

        if force_use_labels:
            self._has_regions = False
        else:
            self._has_regions = any(isinstance(i, (tuple, list)) and len(i) > 1
                                    for i in self.label_dict.values())

        self._ignore_label = self._determine_ignore_label()
        self._all_labels = self._get_all_labels()
        self._regions = self._get_regions()

        if self.has_ignore_label:
            assert self.ignore_label == max(self.all_labels) + 1, \
                "the ignore label must have the highest label value"

        if inference_nonlin is None:
            self.inference_nonlin = sigmoid if self.has_regions else softmax_dim0
        else:
            self.inference_nonlin = inference_nonlin

    @staticmethod
    def _sanity_check(label_dict: dict):
        if 'background' not in label_dict:
            raise RuntimeError("Background label not declared (must be label 0)")
        bg = label_dict['background']
        if isinstance(bg, (tuple, list)):
            raise RuntimeError(f"Background label must be the scalar 0, got {bg}")
        assert int(bg) == 0, f"Background label must be 0, got {bg}"

    def _get_all_labels(self) -> List[int]:
        all_labels = []
        for k, r in self.label_dict.items():
            if k == 'ignore':
                continue
            if isinstance(r, (tuple, list)):
                all_labels.extend(int(ri) for ri in r)
            else:
                all_labels.append(int(r))
        return sorted(np.unique(all_labels).tolist())

    def _get_regions(self):
        if not self._has_regions or self._force_use_labels:
            return None
        assert self.regions_class_order is not None, \
            "region-based training requires regions_class_order"
        regions = []
        for k, r in self.label_dict.items():
            if k == 'ignore':
                continue
            if (np.isscalar(r) and r == 0) or (
                    isinstance(r, (tuple, list)) and len(np.unique(r)) == 1
                    and np.unique(r)[0] == 0):
                continue
            if isinstance(r, list):
                r = tuple(r)
            regions.append(r)
        assert len(self.regions_class_order) == len(regions), \
            "regions_class_order must have one entry per region"
        return regions

    def _determine_ignore_label(self):
        ignore_label = self.label_dict.get('ignore')
        if ignore_label is not None:
            assert isinstance(ignore_label, int), \
                f"ignore label must be an integer, got {type(ignore_label)}"
        return ignore_label

    @property
    def has_regions(self) -> bool:
        return self._has_regions

    @property
    def has_ignore_label(self) -> bool:
        return self.ignore_label is not None

    @property
    def all_regions(self):
        return self._regions

    @property
    def all_labels(self) -> List[int]:
        return self._all_labels

    @property
    def ignore_label(self):
        return self._ignore_label

    def apply_inference_nonlin(self, logits) -> np.ndarray:
        """logits: (c, x, y(, z)). Softmax (labels) or sigmoid (regions)."""
        import jax.numpy as jnp
        import jax
        if isinstance(logits, jax.Array):
            fn = (jax.nn.sigmoid if self.has_regions
                  else lambda a: jax.nn.softmax(a, axis=0))
            return fn(logits.astype(jnp.float32))
        return self.inference_nonlin(np.asarray(logits, dtype=np.float32))

    def convert_probabilities_to_segmentation(self, predicted_probabilities):
        predicted_probabilities = np.asarray(predicted_probabilities)
        assert predicted_probabilities.shape[0] == self.num_segmentation_heads, (
            f"expected {self.num_segmentation_heads} channels, got "
            f"{predicted_probabilities.shape[0]}")
        if self.has_regions:
            segmentation = np.zeros(predicted_probabilities.shape[1:], dtype=np.uint16)
            for i, c in enumerate(self.regions_class_order):
                segmentation[predicted_probabilities[i] > 0.5] = c
            return segmentation
        return predicted_probabilities.argmax(0)

    def convert_logits_to_segmentation(self, predicted_logits):
        probabilities = np.asarray(self.apply_inference_nonlin(predicted_logits))
        return self.convert_probabilities_to_segmentation(probabilities)

    def revert_cropping_on_probabilities(self, predicted_probabilities,
                                         bbox: List[List[int]],
                                         original_shape):
        """Pad probabilities back to pre-crop shape; padded voxels become
        background (reference label_handling.py:185-209)."""
        predicted_probabilities = np.asarray(predicted_probabilities)
        out = np.zeros((predicted_probabilities.shape[0], *original_shape),
                       dtype=predicted_probabilities.dtype)
        if not self.has_regions:
            out[0] = 1
        slicer = tuple([slice(None)] + [slice(lo, hi) for lo, hi in bbox])
        out[slicer] = predicted_probabilities
        return out

    @staticmethod
    def filter_background(classes_or_regions):
        return [i for i in classes_or_regions if
                ((not isinstance(i, (tuple, list))) and i != 0)
                or (isinstance(i, (tuple, list)) and not (
                    len(np.unique(i)) == 1 and np.unique(i)[0] == 0))]

    @property
    def foreground_regions(self):
        return self.filter_background(self.all_regions)

    @property
    def foreground_labels(self):
        return self.filter_background(self.all_labels)

    @property
    def num_segmentation_heads(self) -> int:
        return (len(self.foreground_regions) if self.has_regions
                else len(self.all_labels))


def convert_labelmap_to_one_hot(segmentation: np.ndarray,
                                all_labels,
                                output_dtype=None) -> np.ndarray:
    """One-hot encode a labelmap along a new leading axis
    (reference label_handling.py:248-280). Labels must be consecutive ints."""
    result = np.zeros((len(all_labels), *segmentation.shape),
                      dtype=output_dtype if output_dtype is not None else np.uint8)
    for i, l in enumerate(all_labels):
        result[i] = segmentation == l
    return result


def determine_num_input_channels(plans_manager, configuration_or_config_manager,
                                 dataset_json: dict) -> int:
    """Reference label_handling.py:283-301: modalities (+ one-hot prev-stage
    foreground labels for cascade configurations)."""
    if isinstance(configuration_or_config_manager, str):
        config_manager = plans_manager.get_configuration(configuration_or_config_manager)
    else:
        config_manager = configuration_or_config_manager
    label_manager = plans_manager.get_label_manager(dataset_json)
    num_modalities = (len(dataset_json['modality']) if 'modality' in dataset_json
                      else len(dataset_json['channel_names']))
    if config_manager.previous_stage_name is not None:
        return num_modalities + len(label_manager.foreground_labels)
    return num_modalities
