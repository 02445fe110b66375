"""Experiment planner: fingerprint → per-configuration plans.

Parity: reference nnunetv2/experiment_planning/experiment_planners/
default_experiment_planner.py:24-535. Same target-spacing / transpose /
patch-shrink-loop / batch-size math and the same plans-JSON schema (artifact
name ``nnUNetPlans.json``), so plans interoperate with the reference. The VRAM
estimate is an analytic activation-count model of a plain conv U-Net (the
reference calls dynamic_network_architectures'
``compute_conv_feature_map_size``; ours reproduces that accounting), with the
memory target expressed for a TPU chip's HBM (v5e: 16 GB) by default."""

import shutil
from copy import deepcopy
from functools import lru_cache
from typing import List, Tuple, Union

import numpy as np

from .. import paths
from ..configuration import ANISO_THRESHOLD
from ..imageio.registry import determine_reader_writer_from_dataset_json
from ..preprocessing.normalization import get_normalization_scheme
from ..preprocessing.resampling import (compute_new_shape,
                                        resample_data_or_seg_to_shape)
from ..utils.dataset_naming import maybe_convert_to_dataset_name
from ..utils.dataset_files import get_filenames_of_train_images_and_targets
from ..utils.files import load_json, save_json, join, isfile, maybe_mkdir_p
from .network_topology import get_pool_and_conv_props


@lru_cache(maxsize=None)
def _estimate_activation_count(patch_size: Tuple[int, ...],
                               strides: Tuple[Tuple[int, ...], ...],
                               num_input_channels: int,
                               features_per_stage: Tuple[int, ...],
                               blocks_per_stage_encoder: Tuple[int, ...],
                               blocks_per_stage_decoder: Tuple[int, ...],
                               num_labels: int) -> float:
    """Analytic equivalent of PlainConvUNet.compute_conv_feature_map_size:
    sum over all conv outputs (encoder blocks, transpconvs, decoder blocks,
    deep-supervision seg heads) of their element counts."""
    n_stages = len(strides)
    sizes = []
    cur = np.array(patch_size, dtype=np.float64)
    total = 0.0
    for s in range(n_stages):
        cur = cur / np.array(strides[s])
        numel = float(np.prod(cur))
        total += blocks_per_stage_encoder[s] * features_per_stage[s] * numel
        sizes.append(numel)
    for d in range(n_stages - 1):
        skip_stage = n_stages - 2 - d
        numel = sizes[skip_stage]
        f = features_per_stage[skip_stage]
        total += f * numel                                   # transpconv output
        total += blocks_per_stage_decoder[d] * f * numel     # conv blocks
        total += num_labels * numel                          # (ds) seg head
    total += num_input_channels * float(np.prod(patch_size))  # input itself
    return total


class ExperimentPlanner:
    def __init__(self, dataset_name_or_id: Union[str, int],
                 gpu_memory_target_in_gb: float = 8,
                 preprocessor_name: str = 'DefaultPreprocessor',
                 plans_name: str = 'nnUNetPlans',
                 overwrite_target_spacing: Union[List[float], Tuple[float, ...]] = None,
                 suppress_transpose: bool = False):
        self.dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
        self.suppress_transpose = suppress_transpose
        self.raw_dataset_folder = join(paths.get_raw(), self.dataset_name)
        preprocessed_folder = join(paths.get_preprocessed(), self.dataset_name)
        self.dataset_json = load_json(join(self.raw_dataset_folder, 'dataset.json'))
        self.dataset = get_filenames_of_train_images_and_targets(
            self.raw_dataset_folder, self.dataset_json)

        fp_file = join(preprocessed_folder, 'dataset_fingerprint.json')
        if not isfile(fp_file):
            raise RuntimeError(
                'Fingerprint missing for this dataset. Run fingerprint extraction first.')
        self.dataset_fingerprint = load_json(fp_file)

        self.anisotropy_threshold = ANISO_THRESHOLD

        # constants mirror reference default_experiment_planner.py:52-72
        self.UNet_base_num_features = 32
        self.UNet_class_name = 'PlainConvUNet'
        self.UNet_reference_val_3d = 560000000
        self.UNet_reference_val_2d = 85000000
        self.UNet_reference_com_nfeatures = 32
        self.UNet_reference_val_corresp_GB = 8
        self.UNet_reference_val_corresp_bs_2d = 12
        self.UNet_reference_val_corresp_bs_3d = 2
        self.UNet_vram_target_GB = gpu_memory_target_in_gb
        self.UNet_featuremap_min_edge_length = 4
        self.UNet_blocks_per_stage_encoder = (2,) * 14
        self.UNet_blocks_per_stage_decoder = (2,) * 13
        self.UNet_min_batch_size = 2
        self.UNet_max_features_2d = 512
        self.UNet_max_features_3d = 320

        self.lowres_creation_threshold = 0.25
        self.preprocessor_name = preprocessor_name
        self.plans_identifier = plans_name
        self.overwrite_target_spacing = overwrite_target_spacing
        self.plans = None

    def determine_reader_writer(self):
        example = self.dataset[next(iter(self.dataset))]['images'][0]
        return determine_reader_writer_from_dataset_json(self.dataset_json, example,
                                                         verbose=False)

    def static_estimate_VRAM_usage(self, patch_size, strides, num_input_channels,
                                   features_per_stage, blocks_per_stage_encoder,
                                   blocks_per_stage_decoder, num_labels) -> float:
        return _estimate_activation_count(
            tuple(int(i) for i in patch_size),
            tuple(tuple(int(j) for j in i) for i in strides),
            int(num_input_channels), tuple(features_per_stage),
            tuple(blocks_per_stage_encoder), tuple(blocks_per_stage_decoder),
            int(num_labels))

    def determine_resampling(self, *args, **kwargs):
        data_kwargs = {"is_seg": False, "order": 3, "order_z": 0,
                       "force_separate_z": None}
        seg_kwargs = {"is_seg": True, "order": 1, "order_z": 0,
                      "force_separate_z": None}
        return (resample_data_or_seg_to_shape, data_kwargs,
                resample_data_or_seg_to_shape, seg_kwargs)

    def determine_segmentation_softmax_export_fn(self, *args, **kwargs):
        kwargs_ = {"is_seg": False, "order": 1, "order_z": 0,
                   "force_separate_z": None}
        return resample_data_or_seg_to_shape, kwargs_

    def determine_fullres_target_spacing(self) -> np.ndarray:
        """Median spacing, with the 10th-percentile override for strongly
        anisotropic datasets (reference :156-198)."""
        if self.overwrite_target_spacing is not None:
            return np.array(self.overwrite_target_spacing)
        spacings = self.dataset_fingerprint['spacings']
        sizes = self.dataset_fingerprint['shapes_after_crop']
        target = np.percentile(np.vstack(spacings), 50, 0)
        target_size = np.percentile(np.vstack(sizes), 50, 0)
        worst_spacing_axis = np.argmax(target)
        other_axes = [i for i in range(len(target)) if i != worst_spacing_axis]
        other_spacings = [target[i] for i in other_axes]
        other_sizes = [target_size[i] for i in other_axes]
        has_aniso_spacing = target[worst_spacing_axis] > (
            self.anisotropy_threshold * max(other_spacings))
        has_aniso_voxels = target_size[worst_spacing_axis] * \
            self.anisotropy_threshold < min(other_sizes)
        if has_aniso_spacing and has_aniso_voxels:
            spacings_of_axis = np.vstack(spacings)[:, worst_spacing_axis]
            target_spacing_of_axis = np.percentile(spacings_of_axis, 10)
            if target_spacing_of_axis < max(other_spacings):
                target_spacing_of_axis = max(max(other_spacings),
                                             target_spacing_of_axis) + 1e-5
            target[worst_spacing_axis] = target_spacing_of_axis
        return target

    def determine_normalization_scheme_and_whether_mask_is_used_for_norm(self):
        modalities = self.dataset_json.get('channel_names',
                                           self.dataset_json.get('modality'))
        schemes = [get_normalization_scheme(m) for m in modalities.values()]
        if self.dataset_fingerprint['median_relative_size_after_cropping'] < 3 / 4.:
            use_mask = [i.leaves_pixels_outside_mask_at_zero_if_use_mask_for_norm_is_true
                        for i in schemes]
        else:
            use_mask = [False] * len(schemes)
        return [i.__name__ for i in schemes], use_mask

    def determine_transpose(self):
        if self.suppress_transpose:
            return [0, 1, 2], [0, 1, 2]
        target_spacing = self.determine_fullres_target_spacing()
        max_spacing_axis = int(np.argmax(target_spacing))
        remaining = [i for i in range(3) if i != max_spacing_axis]
        transpose_forward = [max_spacing_axis] + remaining
        transpose_backward = [transpose_forward.index(i) for i in range(3)]
        return transpose_forward, transpose_backward

    def _features_per_stage(self, num_stages: int, dim: int) -> Tuple[int, ...]:
        max_f = self.UNet_max_features_2d if dim == 2 else self.UNet_max_features_3d
        return tuple(min(max_f, self.UNet_reference_com_nfeatures * 2 ** i)
                     for i in range(num_stages))

    def get_plans_for_configuration(self, spacing, median_shape,
                                    data_identifier: str,
                                    approximate_n_voxels_dataset: float) -> dict:
        """Reference :229-369: aspect-ratio initial patch, shrink the most
        oversized axis until the activation estimate fits, then derive batch
        size from the remaining headroom (capped at 5% of dataset voxels)."""
        assert all(i > 0 for i in spacing), f"Spacing must be > 0! {spacing}"
        num_channels = len(self.dataset_json.get(
            'channel_names', self.dataset_json.get('modality')))
        num_labels = len(self.dataset_json['labels'])
        tmp = 1 / np.array(spacing)
        if len(spacing) == 3:
            initial_patch_size = [round(i) for i in
                                  tmp * (256 ** 3 / np.prod(tmp)) ** (1 / 3)]
        elif len(spacing) == 2:
            initial_patch_size = [round(i) for i in
                                  tmp * (2048 ** 2 / np.prod(tmp)) ** (1 / 2)]
        else:
            raise RuntimeError("spacing must be 2d or 3d")
        initial_patch_size = np.array(
            [min(i, j) for i, j in zip(initial_patch_size, median_shape[:len(spacing)])])

        (network_num_pool_per_axis, pool_op_kernel_sizes, conv_kernel_sizes,
         patch_size, shape_must_be_divisible_by) = get_pool_and_conv_props(
            spacing, initial_patch_size, self.UNet_featuremap_min_edge_length, 999999)

        def estimate_for(patch, pools):
            num_stages = len(pools)
            return self.static_estimate_VRAM_usage(
                patch, pools, num_channels,
                self._features_per_stage(num_stages, len(spacing)),
                self.UNet_blocks_per_stage_encoder[:num_stages],
                self.UNet_blocks_per_stage_decoder[:num_stages - 1],
                num_labels)

        estimate = estimate_for(patch_size, pool_op_kernel_sizes)
        reference = ((self.UNet_reference_val_2d if len(spacing) == 2
                      else self.UNet_reference_val_3d)
                     * (self.UNet_vram_target_GB / self.UNet_reference_val_corresp_GB))

        while estimate > reference:
            axis_to_be_reduced = np.argsort(
                np.array(patch_size) / np.array(median_shape[:len(spacing)]))[-1]
            tmp = deepcopy(patch_size)
            tmp[axis_to_be_reduced] -= shape_must_be_divisible_by[axis_to_be_reduced]
            _, _, _, _, shape_must_be_divisible_by = get_pool_and_conv_props(
                spacing, tmp, self.UNet_featuremap_min_edge_length, 999999)
            patch_size[axis_to_be_reduced] -= shape_must_be_divisible_by[axis_to_be_reduced]
            (network_num_pool_per_axis, pool_op_kernel_sizes, conv_kernel_sizes,
             patch_size, shape_must_be_divisible_by) = get_pool_and_conv_props(
                spacing, patch_size, self.UNet_featuremap_min_edge_length, 999999)
            estimate = estimate_for(patch_size, pool_op_kernel_sizes)

        ref_bs = (self.UNet_reference_val_corresp_bs_2d if len(spacing) == 2
                  else self.UNet_reference_val_corresp_bs_3d)
        batch_size = round((reference / estimate) * ref_bs)
        bs_5percent = round(approximate_n_voxels_dataset * 0.05 /
                            np.prod(patch_size, dtype=np.float64))
        batch_size = max(min(batch_size, bs_5percent), self.UNet_min_batch_size)

        (resampling_data, resampling_data_kwargs, resampling_seg,
         resampling_seg_kwargs) = self.determine_resampling()
        resampling_softmax, resampling_softmax_kwargs = \
            self.determine_segmentation_softmax_export_fn()
        normalization_schemes, mask_is_used_for_norm = \
            self.determine_normalization_scheme_and_whether_mask_is_used_for_norm()
        num_stages = len(pool_op_kernel_sizes)
        return {
            'data_identifier': data_identifier,
            'preprocessor_name': self.preprocessor_name,
            'batch_size': int(batch_size),
            'patch_size': [int(i) for i in patch_size],
            'median_image_size_in_voxels': [float(i) for i in median_shape],
            'spacing': [float(i) for i in spacing],
            'normalization_schemes': normalization_schemes,
            'use_mask_for_norm': mask_is_used_for_norm,
            'UNet_class_name': self.UNet_class_name,
            'UNet_base_num_features': self.UNet_base_num_features,
            'n_conv_per_stage_encoder': list(
                self.UNet_blocks_per_stage_encoder[:num_stages]),
            'n_conv_per_stage_decoder': list(
                self.UNet_blocks_per_stage_decoder[:num_stages - 1]),
            'num_pool_per_axis': [int(i) for i in network_num_pool_per_axis],
            'pool_op_kernel_sizes': [[int(j) for j in i]
                                     for i in pool_op_kernel_sizes],
            'conv_kernel_sizes': [[int(j) for j in i] for i in conv_kernel_sizes],
            'unet_max_num_features': (self.UNet_max_features_3d if len(spacing) == 3
                                      else self.UNet_max_features_2d),
            'resampling_fn_data': resampling_data.__name__,
            'resampling_fn_seg': resampling_seg.__name__,
            'resampling_fn_data_kwargs': resampling_data_kwargs,
            'resampling_fn_seg_kwargs': resampling_seg_kwargs,
            'resampling_fn_probabilities': resampling_softmax.__name__,
            'resampling_fn_probabilities_kwargs': resampling_softmax_kwargs,
        }

    def plan_experiment(self) -> dict:
        """Reference :371-502."""
        transpose_forward, transpose_backward = self.determine_transpose()
        fullres_spacing = self.determine_fullres_target_spacing()
        fullres_spacing_transposed = fullres_spacing[transpose_forward]

        new_shapes = [compute_new_shape(j, i, fullres_spacing) for i, j in
                      zip(self.dataset_fingerprint['spacings'],
                          self.dataset_fingerprint['shapes_after_crop'])]
        new_median_shape = np.median(new_shapes, 0)
        new_median_shape_transposed = new_median_shape[transpose_forward]

        approximate_n_voxels_dataset = float(
            np.prod(new_median_shape_transposed, dtype=np.float64) *
            self.dataset_json['numTraining'])

        if new_median_shape_transposed[0] != 1:
            plan_3d_fullres = self.get_plans_for_configuration(
                fullres_spacing_transposed, new_median_shape_transposed,
                self.generate_data_identifier('3d_fullres'),
                approximate_n_voxels_dataset)
            patch_size_fullres = plan_3d_fullres['patch_size']
            median_num_voxels = np.prod(new_median_shape_transposed, dtype=np.float64)
            num_voxels_in_patch = np.prod(patch_size_fullres, dtype=np.float64)

            plan_3d_lowres = None
            lowres_spacing = deepcopy(np.array(plan_3d_fullres['spacing']))
            spacing_increase_factor = 1.03
            while num_voxels_in_patch / median_num_voxels < self.lowres_creation_threshold:
                max_spacing = max(lowres_spacing)
                if np.any((max_spacing / lowres_spacing) > 2):
                    lowres_spacing[(max_spacing / lowres_spacing) > 2] *= \
                        spacing_increase_factor
                else:
                    lowres_spacing *= spacing_increase_factor
                median_num_voxels = np.prod(
                    np.array(plan_3d_fullres['spacing']) / lowres_spacing *
                    new_median_shape_transposed, dtype=np.float64)
                plan_3d_lowres = self.get_plans_for_configuration(
                    lowres_spacing,
                    [round(i) for i in np.array(plan_3d_fullres['spacing']) /
                     lowres_spacing * new_median_shape_transposed],
                    self.generate_data_identifier('3d_lowres'),
                    float(median_num_voxels * self.dataset_json['numTraining']))
                num_voxels_in_patch = np.prod(plan_3d_lowres['patch_size'],
                                              dtype=np.int64)
            if plan_3d_lowres is not None:
                plan_3d_lowres['batch_dice'] = False
                plan_3d_fullres['batch_dice'] = True
            else:
                plan_3d_fullres['batch_dice'] = False
        else:
            plan_3d_fullres = None
            plan_3d_lowres = None

        plan_2d = self.get_plans_for_configuration(
            fullres_spacing_transposed[1:], new_median_shape_transposed[1:],
            self.generate_data_identifier('2d'), approximate_n_voxels_dataset)
        plan_2d['batch_dice'] = True

        median_spacing = np.median(self.dataset_fingerprint['spacings'], 0)[
            transpose_forward]
        median_shape = np.median(self.dataset_fingerprint['shapes_after_crop'], 0)[
            transpose_forward]

        shutil.copy(join(self.raw_dataset_folder, 'dataset.json'),
                    join(paths.get_preprocessed(), self.dataset_name, 'dataset.json'))

        plans = {
            'dataset_name': self.dataset_name,
            'plans_name': self.plans_identifier,
            'original_median_spacing_after_transp': [float(i) for i in median_spacing],
            'original_median_shape_after_transp': [int(round(i)) for i in median_shape],
            'image_reader_writer': self.determine_reader_writer().__name__,
            'transpose_forward': [int(i) for i in transpose_forward],
            'transpose_backward': [int(i) for i in transpose_backward],
            'configurations': {'2d': plan_2d},
            'experiment_planner_used': self.__class__.__name__,
            'label_manager': 'LabelManager',
            'foreground_intensity_properties_per_channel':
                self.dataset_fingerprint['foreground_intensity_properties_per_channel'],
        }
        if plan_3d_lowres is not None:
            plans['configurations']['3d_lowres'] = plan_3d_lowres
            if plan_3d_fullres is not None:
                plans['configurations']['3d_lowres']['next_stage'] = '3d_cascade_fullres'
        if plan_3d_fullres is not None:
            plans['configurations']['3d_fullres'] = plan_3d_fullres
            if plan_3d_lowres is not None:
                plans['configurations']['3d_cascade_fullres'] = {
                    'inherits_from': '3d_fullres',
                    'previous_stage': '3d_lowres',
                }

        self.plans = plans
        self.save_plans(plans)
        return plans

    def save_plans(self, plans):
        plans_file = join(paths.get_preprocessed(), self.dataset_name,
                          self.plans_identifier + '.json')
        if isfile(plans_file):
            old_plans = load_json(plans_file)
            old_configurations = old_plans['configurations']
            for c in plans['configurations']:
                old_configurations.pop(c, None)
            plans['configurations'].update(old_configurations)
        maybe_mkdir_p(join(paths.get_preprocessed(), self.dataset_name))
        save_json(plans, plans_file, sort_keys=False)
        print(f"Plans were saved to {plans_file}")

    def generate_data_identifier(self, configuration_name: str) -> str:
        return self.plans_identifier + '_' + configuration_name

    def load_plans(self, fname: str):
        self.plans = load_json(fname)


class ResEncUNetPlanner(ExperimentPlanner):
    """Residual-encoder variant (reference resencUNet_planner.py): deeper
    encoder block counts, separate reference values."""

    def __init__(self, dataset_name_or_id, gpu_memory_target_in_gb: float = 8,
                 preprocessor_name: str = 'DefaultPreprocessor',
                 plans_name: str = 'nnUNetResEncUNetPlans',
                 overwrite_target_spacing=None, suppress_transpose: bool = False):
        super().__init__(dataset_name_or_id, gpu_memory_target_in_gb,
                         preprocessor_name, plans_name, overwrite_target_spacing,
                         suppress_transpose)
        self.UNet_class_name = 'ResidualEncoderUNet'
        self.UNet_blocks_per_stage_encoder = (1, 3, 4, 6, 6, 6, 6, 6, 6, 6, 6)
        self.UNet_blocks_per_stage_decoder = (1,) * 10
        self.UNet_reference_val_3d = 680000000
        self.UNet_reference_val_2d = 135000000


_PLANNERS = {"ExperimentPlanner": ExperimentPlanner,
             "ResEncUNetPlanner": ResEncUNetPlanner}


def get_planner_class_by_name(name: str):
    if name not in _PLANNERS:
        raise RuntimeError(f"Unknown planner {name!r}; known: {sorted(_PLANNERS)}")
    return _PLANNERS[name]
