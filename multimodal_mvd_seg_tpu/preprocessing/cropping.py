"""Nonzero-region cropping.

Parity: reference nnunetv2/preprocessing/cropping/cropping.py:8-49 plus the
acvl_utils bbox helpers it imports. Convention: voxels outside the nonzero mask
get label -1 in the (possibly synthesized) segmentation so mask-aware
normalization and loss masking can find them."""

from typing import List

import numpy as np
from scipy.ndimage import binary_fill_holes


def create_nonzero_mask(data: np.ndarray) -> np.ndarray:
    assert data.ndim in (3, 4), "data must be (C, X, Y[, Z])"
    nonzero_mask = np.zeros(data.shape[1:], dtype=bool)
    for c in range(data.shape[0]):
        nonzero_mask |= data[c] != 0
    return binary_fill_holes(nonzero_mask)


def get_bbox_from_mask(mask: np.ndarray) -> List[List[int]]:
    """Per-axis [min, max) bounds of the True region (acvl_utils semantics)."""
    bbox = []
    for ax in range(mask.ndim):
        other = tuple(i for i in range(mask.ndim) if i != ax)
        nz = np.any(mask, axis=other)
        idx = np.where(nz)[0]
        if len(idx) == 0:
            bbox.append([0, mask.shape[ax]])
        else:
            bbox.append([int(idx[0]), int(idx[-1]) + 1])
    return bbox


def bounding_box_to_slice(bbox: List[List[int]]):
    return tuple(slice(lo, hi) for lo, hi in bbox)


def crop_to_nonzero(data: np.ndarray, seg: np.ndarray = None, nonzero_label: int = -1):
    """Crop data (c, x, y, z) to its nonzero bounding box. Returns
    (data, seg, bbox); if seg is None a mask-seg of {0, nonzero_label} is
    synthesized (reference cropping.py:24-49)."""
    nonzero_mask = create_nonzero_mask(data)
    bbox = get_bbox_from_mask(nonzero_mask)
    slicer = bounding_box_to_slice(bbox)

    data = data[(slice(None), *slicer)]
    if seg is not None:
        seg = seg[(slice(None), *slicer)]

    nonzero_mask = nonzero_mask[slicer][None]
    if seg is not None:
        seg[(seg == 0) & (~nonzero_mask)] = nonzero_label
    else:
        nonzero_mask = nonzero_mask.astype(np.int8)
        nonzero_mask[nonzero_mask == 0] = nonzero_label
        nonzero_mask[nonzero_mask > 0] = 0
        seg = nonzero_mask
    return data, seg, bbox
