"""Preprocessing parity against committed golden fixtures produced by
EXECUTING the reference implementation (see
tests/fixtures/generate_preprocessing_golden.py for exactly how).

Pins (VERDICT.md round-1 item 4):
- crop / normalize / class-locations: BIT-IDENTICAL to the reference
  (default_preprocessor.py:40-113, cropping.py:24-49,
  default_normalization_schemes.py);
- resampled volumes: bounded float tolerance vs the reference
  (default_resampling.py:125-216), including the separate-z anisotropic
  path; segmentations must agree voxel-exactly except at interpolation-
  ambiguous boundary voxels (<0.5% of the volume).
"""

import os
from functools import partial

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "preprocessing_golden.npz")


class _DuckPlans:
    transpose_forward = [0, 1, 2]
    foreground_intensity_properties_per_channel = {
        "0": {"mean": 70.0, "std": 88.0, "percentile_00_5": -74.0,
              "percentile_99_5": 218.0},
        "1": {"mean": 40.0, "std": 12.0, "percentile_00_5": 10.0,
              "percentile_99_5": 75.0}}

    def get_label_manager(self, dataset_json):
        return _DuckLabels()


class _DuckLabels:
    has_regions = False
    has_ignore_label = False
    foreground_labels = [1, 2]


class _DuckConfig:
    normalization_schemes = ["CTNormalization", "ZScoreNormalization"]
    use_mask_for_norm = [False, True]

    def __init__(self, spacing):
        from multimodal_mvd_seg_tpu.preprocessing.resampling import (
            resample_data_or_seg_to_shape)
        self.spacing = spacing
        # nnUNetPlans.json default resampling kwargs
        self.resampling_fn_data = partial(
            resample_data_or_seg_to_shape, is_seg=False, order=3, order_z=0,
            force_separate_z=None)
        self.resampling_fn_seg = partial(
            resample_data_or_seg_to_shape, is_seg=True, order=1, order_z=0,
            force_separate_z=None)


def _run_ours(tag, g, spacing_in, spacing_out):
    from multimodal_mvd_seg_tpu.preprocessing.preprocessor import (
        DefaultPreprocessor)
    p = DefaultPreprocessor(verbose=False)
    props = {"spacing": list(spacing_in)}
    dataset_json = {"labels": {"background": 0, "organ": 1, "vessel": 2}}
    data, seg = p.run_case_npy(
        g[f"{tag}_in_data"].copy(), g[f"{tag}_in_seg"].copy(), props,
        _DuckPlans(), _DuckConfig(list(spacing_out)), dataset_json)
    return data, seg, props


@pytest.fixture(scope="module")
def golden():
    assert os.path.isfile(FIXTURE), \
        "golden fixture missing — run tests/fixtures/generate_preprocessing_golden.py"
    return np.load(FIXTURE)


def test_crop_normalize_class_locations_bit_identical(golden):
    """No-resample case: the full crop→normalize→class-locations pipeline
    must be bit-identical to the reference."""
    data, seg, props = _run_ours("noresample", golden, (1, 1, 1), (1, 1, 1))
    np.testing.assert_array_equal(np.asarray(props["bbox_used_for_cropping"]),
                                  golden["noresample_bbox"])
    np.testing.assert_array_equal(data, golden["noresample_data"])
    np.testing.assert_array_equal(seg, golden["noresample_seg"])
    assert seg.dtype == golden["noresample_seg"].dtype
    for cls in (1, 2):
        np.testing.assert_array_equal(
            np.asarray(props["class_locations"][cls]),
            golden[f"noresample_class_locs_{cls}"])


@pytest.mark.parametrize("tag,sp_in,sp_out", [
    ("iso", (1.0, 1.0, 1.0), (1.5, 1.5, 1.5)),
    ("aniso", (4.0, 1.0, 1.0), (4.0, 1.2, 1.2)),  # separate-z path
])
def test_resampled_case_parity(golden, tag, sp_in, sp_out):
    data, seg, props = _run_ours(tag, golden, sp_in, sp_out)
    np.testing.assert_array_equal(np.asarray(props["bbox_used_for_cropping"]),
                                  golden[f"{tag}_bbox"])
    np.testing.assert_array_equal(
        np.asarray(props["shape_after_cropping_and_before_resampling"]),
        golden[f"{tag}_shape_after_cropping"])
    ref_data = golden[f"{tag}_data"]
    assert data.shape == ref_data.shape
    # bounded interpolation tolerance (data is in normalized units ~N(0,1))
    np.testing.assert_allclose(data, ref_data, atol=5e-4, rtol=1e-4)
    ref_seg = golden[f"{tag}_seg"]
    assert seg.shape == ref_seg.shape
    mismatch = float((seg != ref_seg).mean())
    assert mismatch < 0.005, f"{tag}: {mismatch:.4%} seg voxels disagree"
    # class locations are sampled from the resampled seg with the fixed
    # seed 1234 — identical whenever the segs agree voxel-exactly
    if mismatch == 0.0:
        for cls in (1, 2):
            np.testing.assert_array_equal(
                np.asarray(props["class_locations"][cls]),
                golden[f"{tag}_class_locs_{cls}"])
