"""Legacy metric zoo + Hausdorff distances + image IO backends."""

import numpy as np
import pytest


def test_confusion_matrix_and_overlap_metrics():
    from multimodal_mvd_seg_tpu.evaluation.metrics import (
        ConfusionMatrix, accuracy, dice, fscore, jaccard, precision, recall,
        specificity)
    ref = np.zeros((10, 10), bool)
    ref[2:6, 2:6] = True            # 16 voxels
    test = np.zeros((10, 10), bool)
    test[4:8, 2:6] = True           # 16 voxels, 8 overlap
    cm = ConfusionMatrix(test, ref)
    tp, fp, tn, fn = cm.get_matrix()
    assert (tp, fp, fn) == (8, 8, 8)
    assert dice(confusion_matrix=cm) == pytest.approx(0.5)
    assert jaccard(confusion_matrix=cm) == pytest.approx(8 / 24)
    assert precision(confusion_matrix=cm) == pytest.approx(0.5)
    assert recall(confusion_matrix=cm) == pytest.approx(0.5)
    assert specificity(confusion_matrix=cm) == pytest.approx(76 / 84)
    assert accuracy(confusion_matrix=cm) == pytest.approx(84 / 100)
    assert fscore(confusion_matrix=cm) == pytest.approx(0.5)
    # empty/empty → NaN convention
    empty = np.zeros((4, 4), bool)
    assert np.isnan(dice(empty, empty))
    assert dice(empty, empty, nan_for_nonexisting=False) == 0.0


def test_hausdorff_and_assd():
    from multimodal_mvd_seg_tpu.evaluation.metrics import (
        avg_surface_distance_symmetric, hausdorff_distance,
        hausdorff_distance_95)
    a = np.zeros((20, 20, 20), bool)
    b = np.zeros((20, 20, 20), bool)
    a[5:10, 5:10, 5:10] = True
    b[5:10, 5:10, 5:10] = True
    assert hausdorff_distance(a, b) == 0.0
    assert avg_surface_distance_symmetric(a, b) == 0.0
    # shift by 3 along one axis → HD = 3
    c = np.zeros_like(a)
    c[8:13, 5:10, 5:10] = True
    assert hausdorff_distance(a, c) == pytest.approx(3.0)
    assert hausdorff_distance_95(a, c) <= 3.0
    assert 0 < avg_surface_distance_symmetric(a, c) <= 3.0
    # spacing scales distances
    assert hausdorff_distance(a, c, voxel_spacing=(2.0, 1.0, 1.0)) == \
        pytest.approx(6.0)
    # disjoint vs empty
    assert np.isnan(hausdorff_distance(a, np.zeros_like(a)))


def test_tiff_io_roundtrip(tmp_path):
    from multimodal_mvd_seg_tpu.imageio.tiff import Tiff3DIO
    rw = Tiff3DIO()
    arr = (np.random.RandomState(0).rand(5, 6, 7) * 100).astype(np.float32)
    f = str(tmp_path / "img.tif")
    rw.write_seg(arr.astype(np.uint8), f, {"spacing": (2.0, 1.0, 0.5)})
    seg, props = rw.read_seg(f)
    np.testing.assert_array_equal(seg[0], arr.astype(np.uint8))
    assert tuple(props["spacing"]) == (2.0, 1.0, 0.5)


def test_natural_image_io_roundtrip(tmp_path):
    from multimodal_mvd_seg_tpu.imageio.natural import NaturalImage2DIO
    rw = NaturalImage2DIO()
    seg = (np.random.RandomState(0).rand(16, 16) > 0.5).astype(np.uint8)
    f = str(tmp_path / "seg.png")
    rw.write_seg(seg, f, {"spacing": (999.0, 1.0, 1.0)})
    back, props = rw.read_seg(f)
    np.testing.assert_array_equal(np.squeeze(back), seg)


def test_nifti_4d_and_header_roundtrip(tmp_path):
    from multimodal_mvd_seg_tpu.imageio.nifti import read_nifti, write_nifti
    arr = np.random.RandomState(0).rand(4, 5, 6).astype(np.float32)
    f = str(tmp_path / "x.nii.gz")
    write_nifti(f, arr, spacing=(0.5, 1.0, 2.0))
    back, hdr = read_nifti(f)
    np.testing.assert_allclose(back, arr, rtol=1e-6)
    assert tuple(np.round(hdr["zooms"][:3], 5)) == (0.5, 1.0, 2.0)
