"""Intensity normalization schemes + channel-name mapping.

Parity: reference nnunetv2/preprocessing/normalization/
default_normalization_schemes.py:8-99 and map_channel_name_to_normalization.py."""

from abc import ABC, abstractmethod
from typing import Type

import numpy as np


class ImageNormalization(ABC):
    leaves_pixels_outside_mask_at_zero_if_use_mask_for_norm_is_true = None

    def __init__(self, use_mask_for_norm: bool = None, intensityproperties: dict = None,
                 target_dtype=np.float32):
        assert use_mask_for_norm is None or isinstance(use_mask_for_norm, bool)
        self.use_mask_for_norm = use_mask_for_norm
        self.intensityproperties = intensityproperties or {}
        self.target_dtype = target_dtype

    @abstractmethod
    def run(self, image: np.ndarray, seg: np.ndarray = None) -> np.ndarray:
        ...


class ZScoreNormalization(ImageNormalization):
    leaves_pixels_outside_mask_at_zero_if_use_mask_for_norm_is_true = True

    def run(self, image, seg=None):
        image = image.astype(self.target_dtype)
        if self.use_mask_for_norm:
            mask = seg >= 0
            mean = image[mask].mean()
            std = image[mask].std()
            image[mask] = (image[mask] - mean) / max(std, 1e-8)
        else:
            mean, std = image.mean(), image.std()
            image = (image - mean) / max(std, 1e-8)
        return image


class CTNormalization(ImageNormalization):
    leaves_pixels_outside_mask_at_zero_if_use_mask_for_norm_is_true = False

    def run(self, image, seg=None):
        assert self.intensityproperties, "CTNormalization requires intensity properties"
        image = image.astype(self.target_dtype)
        lower = self.intensityproperties['percentile_00_5']
        upper = self.intensityproperties['percentile_99_5']
        image = np.clip(image, lower, upper)
        return (image - self.intensityproperties['mean']) / max(
            self.intensityproperties['std'], 1e-8)


class NoNormalization(ImageNormalization):
    leaves_pixels_outside_mask_at_zero_if_use_mask_for_norm_is_true = False

    def run(self, image, seg=None):
        return image.astype(self.target_dtype)


class RescaleTo01Normalization(ImageNormalization):
    leaves_pixels_outside_mask_at_zero_if_use_mask_for_norm_is_true = False

    def run(self, image, seg=None):
        image = image.astype(self.target_dtype)
        image = image - image.min()
        return image / np.clip(image.max(), a_min=1e-8, a_max=None)


class RGBTo01Normalization(ImageNormalization):
    leaves_pixels_outside_mask_at_zero_if_use_mask_for_norm_is_true = False

    def run(self, image, seg=None):
        assert image.min() >= 0 and image.max() <= 255, \
            "RGB images must be uint8-valued"
        return image.astype(self.target_dtype) / 255.0


channel_name_to_normalization_mapping = {
    'CT': CTNormalization,
    'noNorm': NoNormalization,
    'zscore': ZScoreNormalization,
    'rescale_0_1': RescaleTo01Normalization,
    'rgb_to_0_1': RGBTo01Normalization,
}

_BY_NAME = {cls.__name__: cls for cls in
            [ZScoreNormalization, CTNormalization, NoNormalization,
             RescaleTo01Normalization, RGBTo01Normalization]}


def get_normalization_scheme(channel_name: str) -> Type[ImageNormalization]:
    return channel_name_to_normalization_mapping.get(channel_name, ZScoreNormalization)


def get_normalization_class_by_name(name: str) -> Type[ImageNormalization]:
    if name not in _BY_NAME:
        raise RuntimeError(f"Unknown normalization scheme {name!r}; known: "
                           f"{sorted(_BY_NAME)}")
    return _BY_NAME[name]
