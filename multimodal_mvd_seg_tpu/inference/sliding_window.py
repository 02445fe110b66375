"""Sliding-window tiling math.

Parity: reference nnunetv2/inference/sliding_window_prediction.py:10-56
(Gaussian importance map with σ = tile/8 scaled ×1000; step grid with
tile_step_size overlap) and acvl_utils pad_nd_image semantics."""

from functools import lru_cache
from typing import List, Tuple

import numpy as np
from scipy.ndimage import gaussian_filter


@lru_cache(maxsize=2)
def compute_gaussian(tile_size: Tuple[int, ...], sigma_scale: float = 1. / 8,
                     value_scaling_factor: float = 1000.0,
                     dtype=np.float32) -> np.ndarray:
    tmp = np.zeros(tile_size)
    center_coords = [i // 2 for i in tile_size]
    sigmas = [i * sigma_scale for i in tile_size]
    tmp[tuple(center_coords)] = 1
    gaussian_importance_map = gaussian_filter(tmp, sigmas, mode='constant', cval=0)
    gaussian_importance_map /= np.max(gaussian_importance_map) / value_scaling_factor
    gaussian_importance_map = gaussian_importance_map.astype(dtype)
    # ensure no zeros (would cause div-by-zero at normalization)
    mask = gaussian_importance_map == 0
    gaussian_importance_map[mask] = np.min(
        gaussian_importance_map[~mask])
    return gaussian_importance_map


def compute_steps_for_sliding_window(image_size: Tuple[int, ...],
                                     tile_size: Tuple[int, ...],
                                     tile_step_size: float) -> List[List[int]]:
    assert all(i >= j for i, j in zip(image_size, tile_size)), \
        "image size must be at least as large as patch_size"
    assert 0 < tile_step_size <= 1

    target_step_sizes_in_voxels = [i * tile_step_size for i in tile_size]
    num_steps = [int(np.ceil((i - k) / j)) + 1 for i, j, k in
                 zip(image_size, target_step_sizes_in_voxels, tile_size)]
    steps = []
    for dim in range(len(tile_size)):
        max_step_value = image_size[dim] - tile_size[dim]
        if num_steps[dim] > 1:
            actual_step_size = max_step_value / (num_steps[dim] - 1)
        else:
            actual_step_size = 99999999999
        steps_here = [int(np.round(actual_step_size * i))
                      for i in range(num_steps[dim])]
        steps.append(steps_here)
    return steps


def pad_nd_image(image: np.ndarray, new_shape: Tuple[int, ...],
                 mode: str = "constant", return_slicer: bool = True,
                 shape_must_be_divisible_by=None, **kwargs):
    """acvl_utils.miscellaneous.ptqdm pad_nd_image equivalent: symmetric pad of
    the trailing len(new_shape) axes up to new_shape."""
    old_shape = np.array(image.shape)
    num_axes_nopad = image.ndim - len(new_shape)
    new_shape = [max(new_shape[i], old_shape[num_axes_nopad + i])
                 for i in range(len(new_shape))]
    if shape_must_be_divisible_by is not None:
        if not isinstance(shape_must_be_divisible_by, (list, tuple, np.ndarray)):
            shape_must_be_divisible_by = [shape_must_be_divisible_by] * len(new_shape)
        new_shape = [new_shape[i] + shape_must_be_divisible_by[i] -
                     new_shape[i] % shape_must_be_divisible_by[i]
                     if new_shape[i] % shape_must_be_divisible_by[i] != 0
                     else new_shape[i] for i in range(len(new_shape))]
    difference = np.array(new_shape) - old_shape[num_axes_nopad:]
    pad_below = difference // 2
    pad_above = difference - pad_below
    pad_list = [(0, 0)] * num_axes_nopad + \
        [(int(b), int(a)) for b, a in zip(pad_below, pad_above)]
    if any(p != (0, 0) for p in pad_list):
        res = np.pad(image, pad_list, mode, **kwargs)
    else:
        res = image
    if not return_slicer:
        return res
    slicer = tuple(slice(p[0], p[0] + s)
                   for p, s in zip(pad_list, image.shape))
    return res, slicer
