"""Data-augmentation trainer variants.

Parity: reference variants/data_augmentation/ — NoDA (no augmentation at
all), DAOrd0 (order-0 data interpolation in the spatial warp), NoMirroring,
and DA5 (the aggressive insane-DA recipe, reference nnUNetTrainerDA5.py,
410 LoC) with its literal transform list as gated on-device ops: per-axis
rotation gating + independent per-axis scaling, Rot90/Transpose over
matching axes, OneOf(median filter, blur), additive brightness, contrast
preserve-range OneOf with per-channel gates, double inverted gamma, blank
rectangles, additive brightness-gradient field, local gamma field, and
Laplacian sharpening (data/augment.py DA5 extras).
"""


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
    """The literal DA5 recipe (reference nnUNetTrainerDA5.py:110-265):
    same base rotation config as the default trainer, scale (0.7, 1.43)
    drawn independently per axis, each rotation axis gated at 0.5, plus the
    DA5-only transform set (see module docstring). The initial (pre-warp)
    sampling patch uses DA5's (0.7, 1.43) scale range (reference :83-87)."""

    def _augment_overrides(self):
        ps = list(self.configuration_manager.patch_size)
        matching = [sum(p == q for q in ps) for p in ps]
        valid = tuple(i for i, m in enumerate(matching)
                      if m == max(matching))
        multi = max(matching) > 1 and len(valid) > 1
        pairs = tuple((a, b) for a in valid for b in valid
                      if a != b) if multi else ()
        return dict(
            # spatial: p_rot 0.4 gated per axis at 0.5; independent per-axis
            # scale (0.7, 1.43) at p 0.2 (reference :121-144)
            p_rotation=0.4, p_rot_per_axis=0.5,
            p_scale=0.2, scale_range=(0.7, 1.43), independent_scale=True,
            # rot90 / transpose over equal-size axes (:150-159)
            p_rot90=0.5 if pairs else 0.0, rot90_axes=pairs,
            p_transpose=0.5 if multi else 0.0,
            transpose_axes=valid if multi else (),
            # OneOf(median(2..8), blur(0.3..1.5)) (:161-173)
            median_oneof_blur=True, p_median=0.2, median_size=(2, 8),
            p_median_per_channel=0.5,
            p_blur=0.2, blur_sigma=(0.3, 1.5), p_blur_per_channel=0.5,
            p_noise=0.1,
            # additive brightness replaces multiplicative (:176-183)
            p_brightness=0.0, p_brightness_additive=0.1,
            brightness_additive_sigma=0.5,
            p_brightness_additive_per_channel=0.5,
            # contrast OneOf(preserve, not), per-channel (:184-204)
            p_contrast=0.2, contrast_range=(0.5, 2.0),
            p_contrast_preserve=0.5, p_contrast_per_channel=0.5,
            p_lowres=0.15, lowres_zoom=(0.25, 1.0),
            p_lowres_per_channel=0.5,
            # two inverted gammas (:216-219)
            p_gamma_invert=0.1, p_gamma=0.1, gamma_second_invert=True,
            gamma_range=(0.7, 1.5),
            # DA5 tail (:224-265)
            p_blank_rect=0.4, p_blank_rect_per_channel=0.5,
            p_bright_grad=0.3, p_bright_grad_per_channel=0.5,
            p_local_gamma=0.3, p_local_gamma_per_channel=0.5,
            p_sharpen=0.2, sharpen_strength=(0.1, 1.0),
            p_sharpen_per_channel=0.5)

    def configure_rotation_dummyDA_mirroring_and_initial_patch_size(self):
        from ...data.sampler import get_initial_patch_size
        patch_size = self.configuration_manager.patch_size
        rotation, do_dummy_2d, _, mirror_axes = \
            super().configure_rotation_dummyDA_mirroring_and_initial_patch_size()
        # DA5 keeps the base rotation ranges but computes the initial patch
        # with its own (0.7, 1.43) scale range (reference :83-87)
        initial = list(get_initial_patch_size(
            patch_size if not do_dummy_2d else patch_size[1:],
            rotation, rotation, rotation, (0.7, 1.43)))
        if do_dummy_2d:
            initial = [patch_size[0]] + initial
        return rotation, do_dummy_2d, initial, mirror_axes


class nnUNetTrainerDA5ord0(nnUNetTrainerDA5):
    """DA5 with order-0 data interpolation in the spatial warp (reference
    nnUNetTrainerDA5.py:308-355; its order_resampling_data=0)."""

    def _augment_overrides(self):
        return {**super()._augment_overrides(), "interp_order": 0}


class nnUNetTrainerDA5Segord0(nnUNetTrainerDA5):
    """DA5 with order-0 seg interpolation (reference :357-404,
    order_resampling_data=3/seg=0). Seg is always nearest here and the
    on-device warp interpolates data linearly (jax map_coordinates caps at
    order 1), so this is behaviorally DA5 — kept for name parity."""


class nnUNetTrainerDA5_10epochs(nnUNetTrainerDA5):
    """Reference :406-410."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_epochs = 10
