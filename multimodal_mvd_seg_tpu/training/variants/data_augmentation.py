"""Data-augmentation trainer variants.

Parity: reference variants/data_augmentation/ — NoDA (no augmentation at
all), DAOrd0 (order-0 data interpolation in the spatial warp), NoMirroring,
and DA5 (the aggressive insane-DA recipe, 410 LoC in the reference —
expressed here as stronger parameters of the same fused on-device pipeline:
full ±180° rotation, wider scaling with higher probabilities, stronger
noise/blur/brightness/contrast/gamma).
"""

import numpy as np

from ..trainer import MVDSegTrainer


class nnUNetTrainerNoDA(MVDSegTrainer):
    def _augment_overrides(self):
        return dict(p_rotation=0.0, p_scale=0.0, p_noise=0.0, p_blur=0.0,
                    p_brightness=0.0, p_contrast=0.0, p_lowres=0.0,
                    p_gamma=0.0, p_gamma_invert=0.0, mirror_axes=())

    def configure_rotation_dummyDA_mirroring_and_initial_patch_size(self):
        rotation, dummy, _, _ = \
            super().configure_rotation_dummyDA_mirroring_and_initial_patch_size()
        # no spatial aug → sample at the final patch size, nothing mirrored
        return rotation, dummy, list(self.configuration_manager.patch_size), ()


class nnUNetTrainerDAOrd0(MVDSegTrainer):
    def _augment_overrides(self):
        return dict(interp_order=0)


class nnUNetTrainerNoMirroring(MVDSegTrainer):
    def _augment_overrides(self):
        return dict(mirror_axes=())


class nnUNetTrainerDA5(MVDSegTrainer):
    def _augment_overrides(self):
        return dict(rotation=(-np.pi, np.pi), p_rotation=0.6,
                    scale_range=(0.6, 1.67), p_scale=0.3,
                    p_noise=0.3, noise_var=(0.0, 0.15),
                    p_blur=0.3, blur_sigma=(0.3, 1.5),
                    p_brightness=0.3, brightness_range=(0.6, 1.4),
                    p_contrast=0.3, contrast_range=(0.6, 1.4),
                    p_lowres=0.4, lowres_zoom=(0.25, 1.0),
                    p_gamma=0.4, p_gamma_invert=0.2, gamma_range=(0.5, 1.6))

    def configure_rotation_dummyDA_mirroring_and_initial_patch_size(self):
        from ...data.sampler import get_initial_patch_size
        patch_size = self.configuration_manager.patch_size
        _, do_dummy_2d, _, mirror_axes = \
            super().configure_rotation_dummyDA_mirroring_and_initial_patch_size()
        rotation = (-np.pi, np.pi)
        initial = list(get_initial_patch_size(
            patch_size if not do_dummy_2d else patch_size[1:],
            rotation, rotation, rotation, (0.6, 1.67)))
        if do_dummy_2d:
            initial = [patch_size[0]] + initial
        return rotation, do_dummy_2d, initial, mirror_axes
