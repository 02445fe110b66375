"""Foreground-oversampled patch sampling.

Parity: reference nnunetv2/training/dataloading/base_data_loader.py:64-139
(bbox math with padding), data_loader_3d.py / data_loader_2d.py (random
infinite batches, last ~33% of each batch forced to contain foreground via the
precomputed class_locations), and
data_augmentation/compute_initial_patch_size.py (rotation-aware enlarged
sampling patch so on-device affine augmentation has headroom).

Output batches are channels-last numpy arrays ready for device_put:
data (b, *patch, c) float32, seg (b, *patch) int32."""

from typing import List, Optional, Tuple, Union

import numpy as np

from .dataset import MVDSegDataset


def rotate_coords_3d(coords, angle_x, angle_y, angle_z):
    def rx(a):
        return np.array([[1, 0, 0],
                         [0, np.cos(a), -np.sin(a)],
                         [0, np.sin(a), np.cos(a)]])

    def ry(a):
        return np.array([[np.cos(a), 0, np.sin(a)],
                         [0, 1, 0],
                         [-np.sin(a), 0, np.cos(a)]])

    def rz(a):
        return np.array([[np.cos(a), -np.sin(a), 0],
                         [np.sin(a), np.cos(a), 0],
                         [0, 0, 1]])

    return rz(angle_z) @ ry(angle_y) @ rx(angle_x) @ np.asarray(coords, float)


def rotate_coords_2d(coords, angle):
    rot = np.array([[np.cos(angle), -np.sin(angle)],
                    [np.sin(angle), np.cos(angle)]])
    return rot @ np.asarray(coords, float)


def get_initial_patch_size(final_patch_size, rot_x, rot_y, rot_z, scale_range):
    """Enlarged sampling patch so that rotation+scaling stays inside data
    (reference compute_initial_patch_size.get_patch_size)."""
    def mx(r):
        return max(np.abs(r)) if isinstance(r, (tuple, list, np.ndarray)) else r
    rot_x, rot_y, rot_z = (min(np.pi / 2, mx(r)) for r in (rot_x, rot_y, rot_z))
    coords = np.array(final_patch_size)
    final_shape = np.copy(coords).astype(float)
    if len(coords) == 3:
        for r in (rotate_coords_3d(coords, rot_x, 0, 0),
                  rotate_coords_3d(coords, 0, rot_y, 0),
                  rotate_coords_3d(coords, 0, 0, rot_z)):
            final_shape = np.max(np.vstack((np.abs(r), final_shape)), 0)
    elif len(coords) == 2:
        final_shape = np.max(np.vstack(
            (np.abs(rotate_coords_2d(coords, rot_x)), final_shape)), 0)
    final_shape /= min(scale_range)
    return final_shape.astype(int)


class PatchSampler:
    """Infinite random batches with deterministic per-step seeding."""

    def __init__(self, dataset: MVDSegDataset, batch_size: int,
                 patch_size: Union[List[int], Tuple[int, ...]],
                 final_patch_size: Optional[Union[List[int], Tuple[int, ...]]] = None,
                 oversample_foreground_percent: float = 0.33,
                 num_input_channels: Optional[int] = None,
                 pad_value_seg: int = -1,
                 dim: Optional[int] = None,
                 probabilistic_oversampling: bool = False,
                 cascade_foreground_labels: Optional[List[int]] = None):
        self.dataset = dataset
        self.keys = list(dataset.keys())
        self.batch_size = batch_size
        self.patch_size = tuple(int(i) for i in patch_size)
        self.final_patch_size = tuple(final_patch_size) if final_patch_size \
            else self.patch_size
        self.oversample_foreground_percent = oversample_foreground_percent
        self.pad_value_seg = pad_value_seg
        self.dim = dim if dim is not None else len(self.patch_size)
        self.probabilistic_oversampling = probabilistic_oversampling
        # cascade: one-hot the previous-stage segmentation (stacked as seg
        # channel 1 by MVDSegDataset) into extra data channels, with the
        # reference's corruption augmentations (MoveSegAsOneHotToData +
        # ApplyRandomBinaryOperatorTransform + RemoveRandomConnectedComponent,
        # reference data_augmentation/cascade_transforms.py) applied on host
        # like the reference's CPU augmentation workers
        self.cascade_foreground_labels = cascade_foreground_labels

    def _must_contain_fg(self, sample_idx: int,
                         rng: Optional[np.random.RandomState] = None) -> bool:
        # reference base_data_loader: last round(bs * p) samples are forced
        # fg; the probabilistic variant draws per sample instead (reference
        # variants/sampling/nnUNetTrainer_probabilisticOversampling.py)
        if self.probabilistic_oversampling and rng is not None:
            return rng.rand() < self.oversample_foreground_percent
        return sample_idx >= round(
            self.batch_size * (1 - self.oversample_foreground_percent))

    @staticmethod
    def _get_bbox(shape, patch_size, force_fg: bool, class_locations,
                  rng: np.random.RandomState, slice_axis_fixed=None):
        """Reference base_data_loader.get_bbox:64-139."""
        dim = len(patch_size)
        need_to_pad = [max(0, patch_size[d] - shape[d]) for d in range(dim)]
        lbs = [-need_to_pad[d] // 2 for d in range(dim)]
        ubs = [shape[d] + need_to_pad[d] // 2 + need_to_pad[d] % 2 -
               patch_size[d] for d in range(dim)]

        if not force_fg or class_locations is None:
            bbox_lbs = [rng.randint(lbs[d], ubs[d] + 1) for d in range(dim)]
        else:
            eligible = [k for k, v in class_locations.items() if len(v) > 0]
            if len(eligible) == 0:
                bbox_lbs = [rng.randint(lbs[d], ubs[d] + 1) for d in range(dim)]
            else:
                c = eligible[rng.randint(len(eligible))]
                locs = class_locations[c]
                loc = locs[rng.randint(len(locs))]
                # loc is (x, y, z) in the (possibly 3d) seg; align to patch dims
                loc = loc[-dim:]
                bbox_lbs = [min(max(lbs[d], int(loc[d]) - patch_size[d] // 2),
                                ubs[d]) for d in range(dim)]
        bbox_ubs = [bbox_lbs[d] + patch_size[d] for d in range(dim)]
        return bbox_lbs, bbox_ubs

    def _crop_pad(self, array: np.ndarray, bbox_lbs, bbox_ubs, pad_value):
        """Crop [c, *spatial] to bbox with constant padding outside."""
        dim = len(bbox_lbs)
        shape = array.shape[1:]
        valid_lbs = [max(0, bbox_lbs[d]) for d in range(dim)]
        valid_ubs = [min(shape[d], bbox_ubs[d]) for d in range(dim)]
        slicer = (slice(None),) + tuple(
            slice(valid_lbs[d], valid_ubs[d]) for d in range(dim))
        cropped = np.asarray(array[slicer])
        padding = [(0, 0)] + [(valid_lbs[d] - bbox_lbs[d],
                               bbox_ubs[d] - valid_ubs[d]) for d in range(dim)]
        if any(p != (0, 0) for p in padding):
            cropped = np.pad(cropped, padding, mode="constant",
                             constant_values=pad_value)
        return cropped

    def generate_batch(self, rng: np.random.RandomState):
        """-> data (b, c, *patch) float32, seg (b, *patch) int32.

        Channels-FIRST: the TPU-native batch layout (channels-last would
        lane-pad c=2 to 128 in every on-device consumer — see
        data/augment.py); also what the preprocessed (c, *sp) case arrays
        store, so assembly is a plain crop without a transpose."""
        b = self.batch_size
        data_batch = np.zeros((b, 0, *self.patch_size), np.float32)
        seg_batch = np.zeros((b, *self.patch_size), np.int32)
        data_alloc = None
        for j in range(b):
            key = self.keys[rng.randint(len(self.keys))]
            data, seg, props = self.dataset.load_case(key)
            force_fg = self._must_contain_fg(j, rng)
            class_locations = props.get('class_locations')

            if self.dim == 2 and data.ndim == 4:
                # 2d training on 3d volumes: pick a slice
                # (reference data_loader_2d samples a fg slice when forcing fg)
                if force_fg and class_locations:
                    eligible = [k for k, v in class_locations.items() if len(v) > 0]
                else:
                    eligible = []
                if eligible:
                    c = eligible[rng.randint(len(eligible))]
                    locs = class_locations[c]
                    s = int(locs[rng.randint(len(locs))][0])
                else:
                    s = rng.randint(data.shape[1])
                data = np.asarray(data[:, s])
                seg = np.asarray(seg[:, s])
                class_locations = ({k: np.asarray(v)[np.asarray(v)[:, 0] == s][:, 1:]
                                    for k, v in class_locations.items()}
                                   if class_locations else None)

            shape = data.shape[1:]
            bbox_lbs, bbox_ubs = self._get_bbox(shape, self.patch_size, force_fg,
                                                class_locations, rng)
            d = self._crop_pad(data, bbox_lbs, bbox_ubs, 0.0)
            s_ = self._crop_pad(seg, bbox_lbs, bbox_ubs, self.pad_value_seg)
            if self.cascade_foreground_labels is not None and s_.shape[0] > 1:
                prev = self._augment_prev_stage(s_[1], rng)
                onehot = np.stack([(prev == l).astype(np.float32)
                                   for l in self.cascade_foreground_labels])
                d = np.concatenate([d, onehot], 0)
            if data_alloc is None:
                data_alloc = np.zeros((b, d.shape[0], *self.patch_size),
                                      np.float32)
            data_alloc[j] = d
            seg_batch[j] = s_[0]
        return data_alloc if data_alloc is not None else data_batch, seg_batch

    @staticmethod
    def _augment_prev_stage(prev: np.ndarray,
                            rng: np.random.RandomState) -> np.ndarray:
        """Corrupt the previous-stage prediction so the cascade net cannot
        blindly trust it (reference cascade_transforms.py: random binary
        dilation/erosion p=0.4 per channel, random connected-component
        removal p=0.2)."""
        from scipy import ndimage
        prev = prev.copy()
        labels = [l for l in np.unique(prev) if l > 0]
        for l in labels:
            if rng.rand() < 0.4:
                mask = prev == l
                size = rng.randint(1, 8)
                structure = np.ones((size,) * prev.ndim, bool)
                if rng.rand() < 0.5:
                    mask = ndimage.binary_dilation(mask, structure)
                else:
                    mask = ndimage.binary_erosion(mask, structure)
                prev[prev == l] = 0
                prev[mask] = l
            if rng.rand() < 0.2:
                mask = prev == l
                cc, n = ndimage.label(mask)
                if n > 1:
                    drop = rng.randint(1, n + 1)
                    prev[cc == drop] = 0
        return prev
