"""Dataset fingerprint extraction.

Parity: reference nnunetv2/experiment_planning/dataset_fingerprint/
fingerprint_extractor.py:18-377. Per case: spacing, shape after nonzero crop,
10k sampled foreground intensities (seed 1234); aggregated per-channel
mean/median/std/min/max/p0.5/p99.5 → dataset_fingerprint.json. Supports the
fork's label-free mode (sample all intensities) when a case has no label."""

import multiprocessing
import os
from typing import List, Type, Union

import numpy as np

from .. import paths
from ..configuration import default_num_processes
from ..imageio.base import BaseReaderWriter
from ..imageio.registry import determine_reader_writer_from_dataset_json
from ..preprocessing.cropping import crop_to_nonzero
from ..utils.dataset_naming import maybe_convert_to_dataset_name
from ..utils.dataset_files import get_filenames_of_train_images_and_targets
from ..utils.files import load_json, save_json, join, isfile, maybe_mkdir_p


class DatasetFingerprintExtractor:
    def __init__(self, dataset_name_or_id: Union[str, int],
                 num_processes: int = default_num_processes, verbose: bool = False):
        self.dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
        self.verbose = verbose
        self.input_folder = join(paths.get_raw(), self.dataset_name)
        self.num_processes = num_processes
        self.dataset_json = load_json(join(self.input_folder, 'dataset.json'))
        self.dataset = get_filenames_of_train_images_and_targets(
            self.input_folder, self.dataset_json)
        # total voxel budget for intensity stats across the dataset (reference :39)
        self.num_foreground_voxels_for_intensitystats = 10e7

    @staticmethod
    def collect_foreground_intensities(segmentation: np.ndarray, images: np.ndarray,
                                       seed: int = 1234, num_samples: int = 10000):
        assert images.ndim == 4 and segmentation.ndim == 4
        assert not np.any(np.isnan(segmentation)), "Segmentation contains NaNs"
        assert not np.any(np.isnan(images)), "Images contain NaNs"
        rs = np.random.RandomState(seed)
        intensities_per_channel = []
        intensity_statistics_per_channel = []
        foreground_mask = segmentation[0] > 0
        for i in range(len(images)):
            fg = images[i][foreground_mask]
            n = len(fg)
            intensities_per_channel.append(
                rs.choice(fg, num_samples, replace=True) if n > 0 else [])
            intensity_statistics_per_channel.append({
                'mean': np.mean(fg) if n > 0 else np.nan,
                'median': np.median(fg) if n > 0 else np.nan,
                'min': np.min(fg) if n > 0 else np.nan,
                'max': np.max(fg) if n > 0 else np.nan,
                'percentile_99_5': np.percentile(fg, 99.5) if n > 0 else np.nan,
                'percentile_00_5': np.percentile(fg, 0.5) if n > 0 else np.nan,
            })
        return intensities_per_channel, intensity_statistics_per_channel

    @staticmethod
    def analyze_case(image_files: List[str], segmentation_file: Union[str, None],
                     reader_writer_class: Type[BaseReaderWriter],
                     num_samples: int = 10000):
        rw = reader_writer_class()
        images, properties_images = rw.read_images(image_files)

        if segmentation_file is not None and isfile(segmentation_file):
            segmentation, _ = rw.read_seg(segmentation_file)
            data_cropped, seg_cropped, bbox = crop_to_nonzero(images, segmentation)
            intensities, stats = DatasetFingerprintExtractor.\
                collect_foreground_intensities(seg_cropped, data_cropped,
                                               num_samples=num_samples)
        else:
            # semi-supervised / unlabeled case: sample all intensities
            # (reference fork fingerprint_extractor.py:92-129,154-190)
            data_cropped, _, _ = crop_to_nonzero(images)
            rs = np.random.RandomState(1234)
            intensities = [rs.choice(data_cropped[i].ravel(), num_samples,
                                     replace=True)
                           for i in range(len(data_cropped))]
            stats = None

        spacing = properties_images['spacing']
        shape_before_crop = images.shape[1:]
        shape_after_crop = data_cropped.shape[1:]
        relative_size = np.prod(shape_after_crop) / np.prod(shape_before_crop)
        return shape_after_crop, spacing, intensities, stats, relative_size

    def run(self, overwrite_existing: bool = False) -> dict:
        preprocessed_output_folder = join(paths.get_preprocessed(), self.dataset_name)
        maybe_mkdir_p(preprocessed_output_folder)
        properties_file = join(preprocessed_output_folder, 'dataset_fingerprint.json')

        if isfile(properties_file) and not overwrite_existing:
            return load_json(properties_file)

        first_case = self.dataset[next(iter(self.dataset))]
        reader_writer_class = determine_reader_writer_from_dataset_json(
            self.dataset_json, first_case['images'][0], verbose=self.verbose)
        num_samples_per_case = int(
            self.num_foreground_voxels_for_intensitystats // len(self.dataset))

        jobs = [(self.dataset[k]['images'], self.dataset[k].get('label'),
                 reader_writer_class, num_samples_per_case)
                for k in self.dataset]
        if self.num_processes <= 1:
            results = [self.analyze_case(*j) for j in jobs]
        else:
            with multiprocessing.get_context("spawn").Pool(self.num_processes) as p:
                results = p.starmap(DatasetFingerprintExtractor.analyze_case, jobs)

        shapes_after_crop = [r[0] for r in results]
        spacings = [r[1] for r in results]
        # np.concatenate needs >=1 array — a channel with no foreground in
        # ANY case (all-background dataset) falls through to the zeros(1)
        # fallback below instead of crashing here
        fg_per_channel = [
            np.concatenate(chunks) if (chunks := [
                np.asarray(r[2][i]).ravel()
                for r in results if len(r[2][i]) > 0])
            else np.zeros(0)
            for i in range(len(results[0][2]))]
        median_relative_size = np.median([r[4] for r in results], 0)

        num_channels = len(self.dataset_json.get('channel_names',
                                                 self.dataset_json.get('modality', {})))
        intensity_statistics_per_channel = {}
        for i in range(num_channels):
            v = fg_per_channel[i] if i < len(fg_per_channel) and len(fg_per_channel[i]) \
                else np.zeros(1)
            intensity_statistics_per_channel[i] = {
                'mean': float(np.mean(v)),
                'median': float(np.median(v)),
                'std': float(np.std(v)),
                'min': float(np.min(v)),
                'max': float(np.max(v)),
                'percentile_99_5': float(np.percentile(v, 99.5)),
                'percentile_00_5': float(np.percentile(v, 0.5)),
            }

        fingerprint = {
            "spacings": spacings,
            "shapes_after_crop": shapes_after_crop,
            "foreground_intensity_properties_per_channel":
                intensity_statistics_per_channel,
            "median_relative_size_after_cropping": median_relative_size,
        }
        try:
            save_json(fingerprint, properties_file)
        except Exception:
            if isfile(properties_file):
                os.remove(properties_file)
            raise
        return fingerprint
