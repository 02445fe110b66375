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


def _write_nifti2(fname, arr, spacing=(1.0, 1.0, 1.0), srow=None):
    """Hand-rolled minimal NIfTI-2 writer (test fixture only — the package
    writes NIfTI-1, reads both)."""
    import gzip
    import struct
    hdr = bytearray(540)
    struct.pack_into("<i", hdr, 0, 540)
    hdr[4:8] = b"n+2\x00"
    hdr[8:12] = b"\x0d\x0a\x1a\x0a"
    struct.pack_into("<2h", hdr, 12, 16, 32)  # float32
    struct.pack_into("<8q", hdr, 16, arr.ndim, *arr.shape,
                     *([1] * (7 - arr.ndim)))
    struct.pack_into("<8d", hdr, 104, 1.0, *spacing,
                     *([1.0] * (7 - len(spacing))))
    struct.pack_into("<q", hdr, 168, 544)
    struct.pack_into("<2d", hdr, 176, 1.0, 0.0)
    struct.pack_into("<i", hdr, 348, 1)  # sform_code
    if srow is None:
        srow = np.zeros((3, 4))
        srow[:3, :3] = np.diag(spacing)
    struct.pack_into("<12d", hdr, 400, *np.asarray(srow).ravel())
    opener = gzip.open if fname.endswith(".gz") else open
    with opener(fname, "wb") as f:
        f.write(bytes(hdr) + b"\x00" * 4)
        f.write(np.asfortranarray(arr.astype(np.float32)).tobytes(order="F"))


def test_nifti2_read_support(tmp_path):
    from multimodal_mvd_seg_tpu.imageio.nifti import NiftiIO, read_nifti
    arr = np.random.RandomState(1).rand(4, 5, 6).astype(np.float32)
    f = str(tmp_path / "v2.nii.gz")
    _write_nifti2(f, arr, spacing=(0.7, 1.1, 2.3))
    back, hdr = read_nifti(f)
    np.testing.assert_allclose(back, arr, rtol=1e-6)
    assert tuple(np.round(hdr["zooms"][:3], 5)) == (0.7, 1.1, 2.3)
    data, props = NiftiIO().read_images([f])
    assert data.shape == (1, 6, 5, 4)
    assert tuple(np.round(props["spacing"], 5)) == (2.3, 1.1, 0.7)


def test_nifti_affine_mismatch_rejected(tmp_path):
    import pytest
    from multimodal_mvd_seg_tpu.imageio.nifti import NiftiIO
    arr = np.random.RandomState(2).rand(4, 5, 6).astype(np.float32)
    a, b = str(tmp_path / "a.nii.gz"), str(tmp_path / "b.nii.gz")
    srow_a = np.zeros((3, 4)); srow_a[:3, :3] = np.eye(3)
    srow_b = np.zeros((3, 4))
    srow_b[:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]])  # rotated
    _write_nifti2(a, arr, srow=srow_a)
    _write_nifti2(b, arr, srow=srow_b)
    with pytest.raises(RuntimeError, match="affine"):
        NiftiIO().read_images([a, b])
    # same affine passes
    _write_nifti2(b, arr, srow=srow_a)
    data, _ = NiftiIO().read_images([a, b])
    assert data.shape == (2, 6, 5, 4)


def test_nifti_4d_time_as_channels(tmp_path):
    from multimodal_mvd_seg_tpu.imageio.nifti import NiftiIO, write_nifti
    arr = np.random.RandomState(3).rand(4, 5, 6, 3).astype(np.float32)
    f = str(tmp_path / "t.nii.gz")
    write_nifti(f, arr, spacing=(0.5, 1.0, 2.0))
    data, props = NiftiIO().read_images([f])
    assert data.shape == (3, 6, 5, 4)  # (t→c, k, j, i)
    np.testing.assert_allclose(data[1], arr[..., 1].T, rtol=1e-6)
    assert tuple(np.round(props["spacing"], 5)) == (2.0, 1.0, 0.5)


def test_nifti2_seg_write_preserves_sform(tmp_path):
    """Segmentations written against a NIfTI-2 source (raw_header=None)
    must carry the source's sform orientation/origin, not an identity
    rebuild from spacing (round-2 review finding)."""
    from multimodal_mvd_seg_tpu.imageio.nifti import read_nifti, write_nifti
    arr = np.random.RandomState(3).rand(4, 5, 6).astype(np.float32)
    srow = np.array([[0.0, -0.7, 0.0, 12.5],
                     [1.1, 0.0, 0.0, -30.0],
                     [0.0, 0.0, 2.3, 7.75]])
    src = str(tmp_path / "src2.nii.gz")
    _write_nifti2(src, arr, spacing=(0.7, 1.1, 2.3), srow=srow)
    _, hdr = read_nifti(src)
    assert hdr["raw_header"] is None  # NIfTI-2: no reusable v1 header
    out = str(tmp_path / "seg.nii.gz")
    seg = (arr > 0.5).astype(np.uint8)
    write_nifti(out, seg, header=hdr, spacing=(0.7, 1.1, 2.3))
    back, hdr2 = read_nifti(out)
    np.testing.assert_array_equal(back, seg)
    assert hdr2["sform_code"] == 1
    np.testing.assert_allclose(hdr2["srow"], srow, atol=1e-5)


def test_compute_metrics_on_folder_empty_match(tmp_path):
    """No prediction/reference filename overlap raises an actionable error
    instead of IndexError (chill=True default)."""
    import pytest
    from multimodal_mvd_seg_tpu.evaluation.evaluate import (
        compute_metrics_on_folder)
    from multimodal_mvd_seg_tpu.imageio.nifti import NiftiIO, write_nifti
    ref, pred = tmp_path / "ref", tmp_path / "pred"
    ref.mkdir(), pred.mkdir()
    write_nifti(str(ref / "a.nii.gz"),
                np.zeros((4, 4, 4), np.uint8))
    with pytest.raises(RuntimeError, match="nothing to evaluate"):
        compute_metrics_on_folder(str(ref), str(pred),
                                  str(tmp_path / "summary.json"),
                                  NiftiIO(), ".nii.gz", [1], None, 1)


def test_nifti_nan_scl_slope_and_detached_pair(tmp_path):
    import struct
    import pytest
    from multimodal_mvd_seg_tpu.imageio.nifti import read_nifti, write_nifti
    arr = np.random.RandomState(4).rand(3, 4, 5).astype(np.float32)
    f = str(tmp_path / "x.nii.gz")
    write_nifti(f, arr)
    import gzip
    raw = bytearray(gzip.decompress(open(f, "rb").read()))
    # NaN scl_slope/inter mean "no scaling" in the wild
    struct.pack_into("<2f", raw, 112, float("nan"), float("nan"))
    g = str(tmp_path / "nan_slope.nii")
    open(g, "wb").write(bytes(raw))
    back, _ = read_nifti(g)
    np.testing.assert_allclose(back, arr, rtol=1e-6)
    # detached .hdr/.img pairs are rejected with a clear message
    raw[344:348] = b"ni1\x00"
    h = str(tmp_path / "detached.hdr")
    open(h, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="detached"):
        read_nifti(h)


def test_nifti_2d_spacing_contract(tmp_path):
    """2D NIfTI: the fake leading spatial axis reports spacing 999 (base
    reader contract), not the file's meaningless pixdim[3]."""
    from multimodal_mvd_seg_tpu.imageio.nifti import NiftiIO, write_nifti
    arr = np.random.RandomState(5).rand(7, 9).astype(np.float32)
    f = str(tmp_path / "flat.nii.gz")
    write_nifti(f, arr, spacing=(0.5, 0.25))
    data, props = NiftiIO().read_images([f])
    assert data.shape == (1, 1, 9, 7)
    assert props["spacing"][0] == 999.0
    assert tuple(np.round(props["spacing"][1:], 5)) == (0.25, 0.5)


def test_nrrd_ascii_encoding_full_header(tmp_path):
    """ASCII-encoded NRRDs parse spacing/sizes like binary ones (the old
    early-return lost everything but raw fields)."""
    from multimodal_mvd_seg_tpu.imageio.nrrd import read_nrrd
    arr = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
    body = " ".join(str(v) for v in arr.T.ravel())  # fastest axis first
    hdr = ("NRRD0004\n"
           "type: short\n"
           "dimension: 3\n"
           "sizes: 2 3 4\n"
           "spacings: 0.5 1.0 2.0\n"
           "encoding: ascii\n"
           "\n")
    f = str(tmp_path / "a.nrrd")
    open(f, "wb").write(hdr.encode() + body.encode())
    data, header = read_nrrd(f)
    np.testing.assert_array_equal(data, arr)
    assert header["sizes"] == [2, 3, 4]
    assert header["spacing"] == [0.5, 1.0, 2.0]
