"""Case preprocessing: transpose → crop → normalize → resample → fg sampling.

Parity: reference nnunetv2/preprocessing/preprocessors/default_preprocessor.py
(:40-261). Identical order of operations and artifacts: per-case ``{case}.npz``
(data+seg) and ``{case}.pkl`` properties (incl. class_locations with seed 1234,
10k samples, 1% min coverage). Host-parallel via a process pool (CPU-bound
spline resampling); the TPU never sees this stage."""

import multiprocessing
from typing import List, Union

import numpy as np

from ..configuration import default_num_processes
from ..plans.plans_handler import PlansManager, ConfigurationManager
from ..utils.files import (load_json, join, maybe_mkdir_p, save_pickle, isfile,
                           subfiles)
from ..utils.dataset_files import get_filenames_of_train_images_and_targets
from .cropping import crop_to_nonzero
from .normalization import get_normalization_class_by_name
from .resampling import compute_new_shape


class DefaultPreprocessor:
    def __init__(self, verbose: bool = True):
        self.verbose = verbose

    def run_case_npy(self, data: np.ndarray, seg: Union[np.ndarray, None],
                     properties: dict, plans_manager: PlansManager,
                     configuration_manager: ConfigurationManager,
                     dataset_json: Union[dict, str]):
        data = np.copy(data)
        if seg is not None:
            assert data.shape[1:] == seg.shape[1:], \
                "Shape mismatch between image and segmentation"
            seg = np.copy(seg)
        has_seg = seg is not None

        tf = plans_manager.transpose_forward
        data = data.transpose([0, *[i + 1 for i in tf]])
        if seg is not None:
            seg = seg.transpose([0, *[i + 1 for i in tf]])
        original_spacing = [properties['spacing'][i] for i in tf]

        properties['shape_before_cropping'] = data.shape[1:]
        data, seg, bbox = crop_to_nonzero(data, seg)
        properties['bbox_used_for_cropping'] = bbox
        properties['shape_after_cropping_and_before_resampling'] = data.shape[1:]

        target_spacing = list(configuration_manager.spacing)
        if len(target_spacing) < len(data.shape[1:]):
            # 2d config: keep between-slice spacing unchanged
            target_spacing = [original_spacing[0]] + target_spacing
        new_shape = compute_new_shape(data.shape[1:], original_spacing, target_spacing)

        data = self._normalize(data, seg, configuration_manager,
                               plans_manager.foreground_intensity_properties_per_channel)

        old_shape = data.shape[1:]
        data = configuration_manager.resampling_fn_data(
            data, new_shape, original_spacing, target_spacing)
        seg = configuration_manager.resampling_fn_seg(
            seg, new_shape, original_spacing, target_spacing)
        if self.verbose:
            print(f'old shape: {old_shape}, new shape: {new_shape}, '
                  f'old spacing: {original_spacing}, new spacing: {target_spacing}')

        if has_seg:
            label_manager = plans_manager.get_label_manager(
                load_json(dataset_json) if isinstance(dataset_json, str) else dataset_json)
            collect_for_this = (label_manager.foreground_regions
                                if label_manager.has_regions
                                else label_manager.foreground_labels)
            if label_manager.has_ignore_label:
                collect_for_this.append(label_manager.all_labels)
            properties['class_locations'] = self._sample_foreground_locations(
                seg, collect_for_this, verbose=self.verbose)
            seg = self.modify_seg_fn(seg, plans_manager, dataset_json,
                                     configuration_manager)
        seg = seg.astype(np.int16 if np.max(seg) > 127 else np.int8)
        return data.astype(np.float32), seg

    def modify_seg_fn(self, seg, plans_manager, dataset_json, configuration_manager):
        return seg

    def run_case(self, image_files: List[str], seg_file: Union[str, None],
                 plans_manager: PlansManager,
                 configuration_manager: ConfigurationManager,
                 dataset_json: Union[dict, str]):
        if isinstance(dataset_json, str):
            dataset_json = load_json(dataset_json)
        rw = plans_manager.image_reader_writer_class()
        data, data_properties = rw.read_images(image_files)
        seg = rw.read_seg(seg_file)[0] if seg_file is not None else None
        data, seg = self.run_case_npy(data, seg, data_properties, plans_manager,
                                      configuration_manager, dataset_json)
        return data, seg, data_properties

    def run_case_save(self, output_filename_truncated: str, image_files: List[str],
                      seg_file: str, plans_manager: PlansManager,
                      configuration_manager: ConfigurationManager,
                      dataset_json: Union[dict, str]):
        data, seg, properties = self.run_case(image_files, seg_file, plans_manager,
                                              configuration_manager, dataset_json)
        np.savez_compressed(output_filename_truncated + '.npz', data=data, seg=seg)
        save_pickle(properties, output_filename_truncated + '.pkl')

    @staticmethod
    def _sample_foreground_locations(seg: np.ndarray, classes_or_regions,
                                     seed: int = 1234, verbose: bool = False):
        """Reference default_preprocessor.py:155-184: ≤10k samples per class,
        at least 1% coverage, deterministic RandomState(1234)."""
        num_samples = 10000
        min_percent_coverage = 0.01
        rndst = np.random.RandomState(seed)
        class_locs = {}
        for c in classes_or_regions:
            k = c if not isinstance(c, list) else tuple(c)
            if isinstance(c, (tuple, list)):
                mask = seg == c[0]
                for cc in c[1:]:
                    mask |= seg == cc
                all_locs = np.argwhere(mask)
            else:
                all_locs = np.argwhere(seg == c)
            if len(all_locs) == 0:
                class_locs[k] = []
                continue
            target = min(num_samples, len(all_locs))
            target = max(target, int(np.ceil(len(all_locs) * min_percent_coverage)))
            class_locs[k] = all_locs[rndst.choice(len(all_locs), target, replace=False)]
            if verbose:
                print(c, target)
        return class_locs

    def _normalize(self, data: np.ndarray, seg: np.ndarray,
                   configuration_manager: ConfigurationManager,
                   foreground_intensity_properties_per_channel: dict) -> np.ndarray:
        for c in range(data.shape[0]):
            scheme = configuration_manager.normalization_schemes[c]
            normalizer = get_normalization_class_by_name(scheme)(
                use_mask_for_norm=configuration_manager.use_mask_for_norm[c],
                intensityproperties=foreground_intensity_properties_per_channel[str(c)])
            data[c] = normalizer.run(data[c], seg[0])
        return data

    def run(self, dataset_name_or_id: Union[int, str], configuration_name: str,
            plans_identifier: str, num_processes: int = default_num_processes):
        """Preprocess all training cases of a dataset
        (reference default_preprocessor.py:198-261)."""
        from .. import paths
        from ..utils.dataset_naming import maybe_convert_to_dataset_name
        dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)

        assert paths.get_preprocessed() is not None
        plans_file = join(paths.get_preprocessed(), dataset_name,
                          plans_identifier + '.json')
        assert isfile(plans_file), \
            f"Expected plans file {plans_file}. Run planning first."
        plans_manager = PlansManager(plans_file)
        configuration_manager = plans_manager.get_configuration(configuration_name)

        dataset_json_file = join(paths.get_preprocessed(), dataset_name, 'dataset.json')
        dataset_json = load_json(dataset_json_file)

        output_directory = join(paths.get_preprocessed(), dataset_name,
                                configuration_manager.data_identifier)
        maybe_mkdir_p(output_directory)

        dataset = get_filenames_of_train_images_and_targets(
            join(paths.get_raw(), dataset_name), dataset_json)

        jobs = [(join(output_directory, k), dataset[k]['images'], dataset[k]['label'],
                 plans_manager, configuration_manager, dataset_json)
                for k in dataset]
        if num_processes <= 1:
            for j in jobs:
                self.run_case_save(*j)
        else:
            with multiprocessing.get_context("spawn").Pool(num_processes) as p:
                results = [p.apply_async(_run_case_save_mp, (self.verbose,) + j)
                           for j in jobs]
                for r in results:
                    r.get()  # surface worker exceptions


def _run_case_save_mp(verbose, *args):
    DefaultPreprocessor(verbose=verbose).run_case_save(*args)


_PREPROCESSORS = {"DefaultPreprocessor": DefaultPreprocessor}


def register_preprocessor(cls):
    _PREPROCESSORS[cls.__name__] = cls
    return cls


def get_preprocessor_class_by_name(name: str):
    if name not in _PREPROCESSORS:
        raise RuntimeError(f"Unknown preprocessor {name!r}; known: "
                           f"{sorted(_PREPROCESSORS)}")
    return _PREPROCESSORS[name]
