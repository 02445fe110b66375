"""Preprocessed-case store.

Parity: reference nnunetv2/training/dataloading/nnunet_dataset.py:11-115 — a
lazy dict of {case: npz/pkl paths}; load_case prefers unpacked .npy /
_seg.npy memory-mapped reads; previous-stage seg stacking for cascades — and
utils.py:26-36 (unpack_dataset)."""

import multiprocessing
import os
from typing import List, Optional, Tuple

import numpy as np

from ..utils.files import (join, isfile, load_pickle, subfiles)


class MVDSegDataset:
    """Case store over a preprocessed-configuration folder."""

    def __init__(self, folder: str, case_identifiers: Optional[List[str]] = None,
                 folder_with_segs_from_previous_stage: Optional[str] = None):
        if case_identifiers is None:
            case_identifiers = [os.path.basename(i)[:-4]
                                for i in subfiles(folder, suffix=".npz")]
        case_identifiers.sort()
        self.dataset = {}
        for c in case_identifiers:
            self.dataset[c] = {
                'data_file': join(folder, f"{c}.npz"),
                'properties_file': join(folder, f"{c}.pkl"),
            }
            if folder_with_segs_from_previous_stage is not None:
                self.dataset[c]['seg_from_prev_stage_file'] = join(
                    folder_with_segs_from_previous_stage, f"{c}.npz")

    def __getitem__(self, key):
        return self.dataset[key]

    def __len__(self):
        return len(self.dataset)

    def keys(self):
        return self.dataset.keys()

    def items(self):
        return self.dataset.items()

    def case_shape(self, key: str):
        """(spatial_shape, n_channels, properties) without loading voxels:
        unpacked .npy headers are read directly (np.lib.format), npz members
        via their zip-local headers — keeps eligibility probes (e.g.
        DeviceCachedLoader.supports) from decompressing the dataset."""
        entry = self[key]
        data_npy = entry['data_file'][:-4] + ".npy"
        properties = load_pickle(entry['properties_file'])
        try:
            if isfile(data_npy):
                with open(data_npy, "rb") as f:
                    version = np.lib.format.read_magic(f)
                    shape, _, _ = np.lib.format._read_array_header(f, version)
            else:
                import zipfile
                with zipfile.ZipFile(entry['data_file']) as zf, \
                        zf.open("data.npy") as f:
                    version = np.lib.format.read_magic(f)
                    shape, _, _ = np.lib.format._read_array_header(f, version)
        except Exception:
            return None, None, properties
        return tuple(shape[1:]), int(shape[0]), properties

    def load_case(self, key: str) -> Tuple[np.ndarray, np.ndarray, dict]:
        entry = self[key]
        data_npy = entry['data_file'][:-4] + ".npy"
        seg_npy = entry['data_file'][:-4] + "_seg.npy"
        if isfile(data_npy):
            data = np.load(data_npy, mmap_mode="r")
        else:
            data = np.load(entry['data_file'])['data']
        if isfile(seg_npy):
            seg = np.load(seg_npy, mmap_mode="r")
        else:
            seg = np.load(entry['data_file'])['seg']
        properties = load_pickle(entry['properties_file'])

        if 'seg_from_prev_stage_file' in entry:
            prev_npy = entry['seg_from_prev_stage_file'][:-4] + "_seg.npy"
            if isfile(prev_npy):
                prev = np.load(prev_npy, mmap_mode="r")
            else:
                prev = np.load(entry['seg_from_prev_stage_file'])['seg']
            seg = np.vstack((seg[:], prev[:][None] if prev.ndim == 3 else prev[:]))
        return data, seg, properties


# legacy alias matching the reference class name
nnUNetDataset = MVDSegDataset


def _unpack_case(npz_file: str, unpack_segmentation: bool, overwrite: bool):
    data_npy = npz_file[:-4] + ".npy"
    seg_npy = npz_file[:-4] + "_seg.npy"
    if overwrite or not isfile(data_npy) or (
            unpack_segmentation and not isfile(seg_npy)):
        a = np.load(npz_file)
        np.save(data_npy, a['data'])
        if unpack_segmentation:
            np.save(seg_npy, a['seg'])


def unpack_dataset(folder: str, unpack_segmentation: bool = True,
                   overwrite_existing: bool = False, num_processes: int = 8):
    """Decompress npz → npy so load_case can memory-map
    (reference dataloading/utils.py:26-36)."""
    npz_files = subfiles(folder, suffix=".npz")
    if num_processes <= 1 or len(npz_files) <= 1:
        for f in npz_files:
            _unpack_case(f, unpack_segmentation, overwrite_existing)
        return
    with multiprocessing.get_context("spawn").Pool(num_processes) as p:
        p.starmap(_unpack_case, [(f, unpack_segmentation, overwrite_existing)
                                 for f in npz_files])
