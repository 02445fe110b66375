"""Anisotropy-aware spline resampling.

Parity: reference nnunetv2/preprocessing/resampling/default_resampling.py
(:13-216). skimage.transform.resize is not available here; ``_resize`` rebuilds
its exact coordinate convention ((out + 0.5) * scale - 0.5, mode='edge', no
anti-aliasing) on scipy.ndimage.map_coordinates, so outputs agree to
interpolation tolerance. Segmentations resize one-hot-wise and data with cubic
splines; strongly anisotropic volumes resample in-plane first, then the lowres
axis at order_z (reference :125-216)."""

from typing import List, Tuple, Union

import numpy as np
from scipy.ndimage import map_coordinates, spline_filter

from ..configuration import ANISO_THRESHOLD


def get_do_separate_z(spacing, anisotropy_threshold=ANISO_THRESHOLD) -> bool:
    return (np.max(spacing) / np.min(spacing)) > anisotropy_threshold


def get_lowres_axis(new_spacing) -> np.ndarray:
    return np.where(max(new_spacing) / np.array(new_spacing) == 1)[0]


def compute_new_shape(old_shape, old_spacing, new_spacing) -> np.ndarray:
    assert len(old_spacing) == len(old_shape) == len(new_spacing)
    return np.array([int(round(i / j * k))
                     for i, j, k in zip(old_spacing, new_spacing, old_shape)])


def _resize(image: np.ndarray, new_shape, order: int) -> np.ndarray:
    """skimage.transform.resize(..., mode='edge', anti_aliasing=False,
    clip=True) equivalent for nd arrays."""
    image = np.asarray(image, dtype=float)
    old_shape = image.shape
    new_shape = tuple(int(i) for i in new_shape)
    if tuple(old_shape) == new_shape:
        return image.copy()
    grids = np.meshgrid(*[(np.arange(n) + 0.5) * (o / n) - 0.5
                          for o, n in zip(old_shape, new_shape)], indexing="ij")
    coords = np.stack(grids, 0)
    out = map_coordinates(image, coords, order=order, mode="nearest")
    if order > 0:  # clip=True in skimage
        out = np.clip(out, image.min(), image.max())
    return out


def resize_segmentation(segmentation: np.ndarray, new_shape, order: int = 3
                        ) -> np.ndarray:
    """batchgenerators.augmentations.utils.resize_segmentation equivalent:
    order-0 directly, otherwise per-label one-hot resize with 0.5 threshold."""
    tpe = segmentation.dtype
    if order == 0:
        return _resize(segmentation.astype(float), new_shape, order).astype(tpe)
    unique_labels = np.unique(segmentation)
    reshaped = np.zeros(new_shape, dtype=tpe)
    for c in unique_labels:
        mask = (segmentation == c).astype(float)
        reshaped_multihot = _resize(mask, new_shape, order)
        reshaped[reshaped_multihot >= 0.5] = c
    return reshaped


def _determine_axis(current_spacing, new_spacing, force_separate_z,
                    separate_z_anisotropy_threshold):
    if force_separate_z is not None:
        do_separate_z = force_separate_z
        axis = get_lowres_axis(current_spacing) if force_separate_z else None
    else:
        if get_do_separate_z(current_spacing, separate_z_anisotropy_threshold):
            do_separate_z, axis = True, get_lowres_axis(current_spacing)
        elif get_do_separate_z(new_spacing, separate_z_anisotropy_threshold):
            do_separate_z, axis = True, get_lowres_axis(new_spacing)
        else:
            do_separate_z, axis = False, None
    if axis is not None and len(axis) in (2, 3):
        # 2-3 axes tie for lowest resolution → no separate-z treatment
        do_separate_z = False
    return do_separate_z, axis


def resample_data_or_seg(data: np.ndarray, new_shape, is_seg: bool = False,
                         axis=None, order: int = 3, do_separate_z: bool = False,
                         order_z: int = 0) -> np.ndarray:
    """Reference default_resampling.py:125-216."""
    assert data.ndim == 4, "data must be (c, x, y, z)"
    assert len(new_shape) == data.ndim - 1

    resize_fn = resize_segmentation if is_seg else _resize
    dtype_data = data.dtype
    shape = np.array(data[0].shape)
    new_shape = np.array([int(i) for i in new_shape])
    if np.all(shape == new_shape):
        return data

    data = data.astype(float)
    if do_separate_z:
        assert len(axis) == 1, "only one anisotropic axis supported"
        ax = int(axis[0])
        new_shape_2d = np.delete(new_shape, ax)

        reshaped_final = []
        for c in range(data.shape[0]):
            slices = []
            for slice_id in range(shape[ax]):
                sl = np.take(data[c], slice_id, axis=ax)
                slices.append(resize_fn(sl, new_shape_2d, order))
            reshaped_data = np.stack(slices, ax)
            if shape[ax] != new_shape[ax]:
                # interpolate along the lowres axis at order_z
                rows, cols, dim = new_shape
                orig_rows, orig_cols, orig_dim = reshaped_data.shape
                row_scale = float(orig_rows) / rows
                col_scale = float(orig_cols) / cols
                dim_scale = float(orig_dim) / dim
                map_rows, map_cols, map_dims = np.mgrid[:rows, :cols, :dim]
                map_rows = row_scale * (map_rows + 0.5) - 0.5
                map_cols = col_scale * (map_cols + 0.5) - 0.5
                map_dims = dim_scale * (map_dims + 0.5) - 0.5
                coord_map = np.array([map_rows, map_cols, map_dims])
                if not is_seg or order_z == 0:
                    reshaped_final.append(
                        map_coordinates(reshaped_data, coord_map, order=order_z,
                                        mode="nearest")[None])
                else:
                    unique_labels = np.sort(np.unique(reshaped_data.ravel()))
                    reshaped = np.zeros(new_shape, dtype=dtype_data)
                    for cl in unique_labels:
                        reshaped_multihot = np.round(map_coordinates(
                            (reshaped_data == cl).astype(float), coord_map,
                            order=order_z, mode="nearest"))
                        reshaped[reshaped_multihot > 0.5] = cl
                    reshaped_final.append(reshaped[None])
            else:
                reshaped_final.append(reshaped_data[None])
        return np.vstack(reshaped_final).astype(dtype_data)

    reshaped = [resize_fn(data[c], new_shape, order)[None]
                for c in range(data.shape[0])]
    return np.vstack(reshaped).astype(dtype_data)


def resample_data_or_seg_to_spacing(data: np.ndarray, current_spacing, new_spacing,
                                    is_seg: bool = False, order: int = 3,
                                    order_z: int = 0,
                                    force_separate_z: Union[bool, None] = False,
                                    separate_z_anisotropy_threshold: float = ANISO_THRESHOLD):
    do_separate_z, axis = _determine_axis(current_spacing, new_spacing,
                                          force_separate_z,
                                          separate_z_anisotropy_threshold)
    assert data.ndim == 4, "data must be c x y z"
    new_shape = compute_new_shape(np.array(data[0].shape), current_spacing, new_spacing)
    return resample_data_or_seg(data, new_shape, is_seg, axis, order,
                                do_separate_z, order_z=order_z)


def resample_data_or_seg_to_shape(data, new_shape, current_spacing, new_spacing,
                                  is_seg: bool = False, order: int = 3,
                                  order_z: int = 0,
                                  force_separate_z: Union[bool, None] = False,
                                  separate_z_anisotropy_threshold: float = ANISO_THRESHOLD):
    data = np.asarray(data)
    do_separate_z, axis = _determine_axis(current_spacing, new_spacing,
                                          force_separate_z,
                                          separate_z_anisotropy_threshold)
    assert data.ndim == 4, "data must be c x y z"
    return resample_data_or_seg(data, new_shape, is_seg, axis, order,
                                do_separate_z, order_z=order_z)


_RESAMPLING_FNS = {
    "resample_data_or_seg_to_shape": resample_data_or_seg_to_shape,
    "resample_data_or_seg_to_spacing": resample_data_or_seg_to_spacing,
}


def get_resampling_fn_by_name(name: str):
    if name not in _RESAMPLING_FNS:
        raise RuntimeError(f"Unknown resampling fn {name!r}; known: "
                           f"{sorted(_RESAMPLING_FNS)}")
    return _RESAMPLING_FNS[name]
