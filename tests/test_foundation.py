"""Foundation-layer tests: NIfTI codec, plans inheritance, label manager,
cropping, resampling."""

import numpy as np
import pytest

from multimodal_mvd_seg_tpu.imageio.nifti import NiftiIO, read_nifti, write_nifti
from multimodal_mvd_seg_tpu.plans.plans_handler import PlansManager
from multimodal_mvd_seg_tpu.plans.label_handling import (
    LabelManager, convert_labelmap_to_one_hot)
from multimodal_mvd_seg_tpu.preprocessing.cropping import crop_to_nonzero
from multimodal_mvd_seg_tpu.preprocessing.resampling import (
    compute_new_shape, resample_data_or_seg_to_shape, resize_segmentation)


def test_nifti_roundtrip(tmp_path):
    rng = np.random.RandomState(42)
    data = rng.normal(size=(10, 12, 14)).astype(np.float32)
    f = str(tmp_path / "x.nii.gz")
    write_nifti(f, data, spacing=(1.0, 2.0, 3.0))
    back, hdr = read_nifti(f)
    np.testing.assert_allclose(back, data, rtol=1e-6)
    np.testing.assert_allclose(hdr["zooms"][:3], (1.0, 2.0, 3.0))


def test_nifti_io_reader_contract(tmp_path):
    rng = np.random.RandomState(0)
    vol = rng.normal(size=(8, 9, 10)).astype(np.float32)
    f = str(tmp_path / "img_0000.nii")
    write_nifti(f, vol.T, spacing=(3.0, 2.0, 1.0))
    io = NiftiIO()
    arr, props = io.read_images((f,))
    assert arr.shape == (1, 8, 9, 10)
    assert props["spacing"] == [1.0, 2.0, 3.0]  # reversed zooms
    np.testing.assert_allclose(arr[0], vol, rtol=1e-6)

    # write_seg roundtrip preserves original header geometry
    seg = (vol > 0).astype(np.uint8)
    out = str(tmp_path / "seg.nii.gz")
    io.write_seg(seg, out, props)
    seg_back, seg_props = io.read_seg(out)
    np.testing.assert_array_equal(seg_back[0], seg)
    assert seg_props["spacing"] == props["spacing"]


def test_plans_inheritance_and_cycle():
    plans = {
        "dataset_name": "D", "plans_name": "P",
        "configurations": {
            "3d_fullres": {"batch_size": 2, "patch_size": [32, 32, 32]},
            "bs4": {"inherits_from": "3d_fullres", "batch_size": 4},
            "a": {"inherits_from": "b"}, "b": {"inherits_from": "a"},
        },
    }
    pm = PlansManager(plans)
    cfg = pm.get_configuration("bs4")
    assert cfg.batch_size == 4
    assert cfg.patch_size == [32, 32, 32]
    with pytest.raises(RuntimeError, match="Circular"):
        pm.get_configuration("a")


def test_label_manager_modes():
    lm = LabelManager({"background": 0, "organ": 1, "vessel": 2}, None)
    assert not lm.has_regions and not lm.has_ignore_label
    assert lm.all_labels == [0, 1, 2]
    assert lm.foreground_labels == [1, 2]
    assert lm.num_segmentation_heads == 3

    lm_r = LabelManager({"background": 0, "whole": (1, 2), "core": (2,)},
                        regions_class_order=(1, 2))
    assert lm_r.has_regions
    assert lm_r.num_segmentation_heads == 2

    lm_i = LabelManager({"background": 0, "fg": 1, "ignore": 2}, None)
    assert lm_i.has_ignore_label and lm_i.ignore_label == 2

    logits = np.zeros((3, 4, 4, 4), dtype=np.float32)
    logits[1] = 5.0
    seg = lm.convert_logits_to_segmentation(logits)
    assert (seg == 1).all()


def test_one_hot():
    seg = np.array([[0, 1], [2, 1]])
    oh = convert_labelmap_to_one_hot(seg, [0, 1, 2])
    assert oh.shape == (3, 2, 2)
    np.testing.assert_array_equal(oh.argmax(0), seg)


def test_crop_to_nonzero():
    data = np.zeros((1, 10, 10, 10), dtype=np.float32)
    data[0, 2:8, 3:7, 1:9] = 1.0
    seg = np.zeros((1, 10, 10, 10), dtype=np.int8)
    cropped, seg_c, bbox = crop_to_nonzero(data, seg)
    assert cropped.shape == (1, 6, 4, 8)
    assert bbox == [[2, 8], [3, 7], [1, 9]]
    assert (seg_c == -1).sum() == 0  # filled region has no outside voxels inside bbox

    # without seg: synthesized mask-seg
    data2 = np.zeros((1, 6, 6, 6), dtype=np.float32)
    data2[0, 1:5, 1:5, 1:5] = 1.0
    data2[0, 2, 2, 2] = 0.0  # hole — gets filled
    _, seg2, _ = crop_to_nonzero(data2)
    assert set(np.unique(seg2)) <= {-1, 0}
    assert seg2[0, 1, 1, 1] == 0  # hole filled → inside mask


def test_resampling_identity_and_shape():
    rng = np.random.RandomState(1)
    data = rng.normal(size=(2, 8, 9, 10)).astype(np.float32)
    same = resample_data_or_seg_to_shape(data, (8, 9, 10), (1, 1, 1), (1, 1, 1))
    np.testing.assert_array_equal(same, data)

    up = resample_data_or_seg_to_shape(data, (16, 18, 20), (2, 2, 2), (1, 1, 1))
    assert up.shape == (2, 16, 18, 20)
    # means should be approximately preserved by spline interpolation
    assert abs(up.mean() - data.mean()) < 0.05


def test_resample_segmentation_labels_preserved():
    seg = np.zeros((1, 8, 8, 8), dtype=np.int8)
    seg[0, 2:6, 2:6, 2:6] = 1
    seg[0, 3:5, 3:5, 3:5] = 2
    out = resample_data_or_seg_to_shape(seg, (16, 16, 16), (2, 2, 2), (1, 1, 1),
                                        is_seg=True, order=1)
    assert set(np.unique(out)) <= {0, 1, 2}
    assert out.shape == (1, 16, 16, 16)
    # structure preserved: label-2 core inside label-1 shell
    assert out[0, 8, 8, 8] == 2


def test_resize_segmentation_order0():
    seg = np.array([[0, 1], [2, 3]], dtype=np.int8)
    out = resize_segmentation(seg, (4, 4), order=0)
    assert out.dtype == seg.dtype
    np.testing.assert_array_equal(np.unique(out), [0, 1, 2, 3])


def test_compute_new_shape():
    np.testing.assert_array_equal(
        compute_new_shape((100, 100, 50), (1.0, 1.0, 2.0), (2.0, 2.0, 2.0)),
        [50, 50, 50])


def test_separate_z_resampling():
    rng = np.random.RandomState(3)
    data = rng.normal(size=(1, 4, 32, 32)).astype(np.float32)
    # spacing (5, 1, 1) is anisotropic (> threshold 3) → separate-z path
    out = resample_data_or_seg_to_shape(data, (8, 16, 16), (5, 1, 1), (2.5, 2, 2),
                                        force_separate_z=None)
    assert out.shape == (1, 8, 16, 16)
