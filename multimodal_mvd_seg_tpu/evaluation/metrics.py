"""Legacy metric zoo + surface distances.

Parity: reference nnunetv2/evaluation/metrics.py (404 LoC: ConfusionMatrix +
dice/jaccard/precision/recall/sensitivity/specificity/accuracy/fscore and
friends) and nnunetv2/evaluation/Hausdorff.py:84-131 (Hausdorff distance,
95th-percentile Hausdorff, average symmetric surface distance). Host-side
numpy/scipy — evaluation is IO-bound, not a hot path.
"""

from typing import Optional, Tuple

import numpy as np


class ConfusionMatrix:
    """Lazy tp/fp/tn/fn over boolean masks (reference metrics.py)."""

    def __init__(self, test=None, reference=None):
        self.tp = self.fp = self.tn = self.fn = None
        self.reference_empty = self.reference_full = None
        self.test_empty = self.test_full = None
        self.test = None
        self.reference = None
        self.set_reference(reference)
        self.set_test(test)

    def set_test(self, test):
        self.test = test
        self.reset()

    def set_reference(self, reference):
        self.reference = reference
        self.reset()

    def reset(self):
        self.tp = self.fp = self.tn = self.fn = None
        self.test_empty = self.test_full = None
        self.reference_empty = self.reference_full = None

    def compute(self):
        if self.test is None or self.reference is None:
            raise ValueError("test and reference must both be set")
        t = np.asarray(self.test).astype(bool)
        r = np.asarray(self.reference).astype(bool)
        assert t.shape == r.shape, "shape mismatch"
        self.tp = int(np.sum(t & r))
        self.fp = int(np.sum(t & ~r))
        self.tn = int(np.sum(~t & ~r))
        self.fn = int(np.sum(~t & r))
        self.test_empty = not np.any(t)
        self.test_full = bool(np.all(t))
        self.reference_empty = not np.any(r)
        self.reference_full = bool(np.all(r))

    def get_matrix(self):
        if self.tp is None:
            self.compute()
        return self.tp, self.fp, self.tn, self.fn

    def get_existence(self):
        if self.tp is None:
            self.compute()
        return (self.test_empty, self.test_full, self.reference_empty,
                self.reference_full)


def _cm(test, reference, confusion_matrix):
    if confusion_matrix is None:
        confusion_matrix = ConfusionMatrix(test, reference)
    return confusion_matrix


def dice(test=None, reference=None, confusion_matrix=None,
         nan_for_nonexisting: bool = True, **kwargs):
    """2TP / (2TP + FP + FN)"""
    cm = _cm(test, reference, confusion_matrix)
    tp, fp, tn, fn = cm.get_matrix()
    test_empty, _, reference_empty, _ = cm.get_existence()
    if test_empty and reference_empty:
        return float("NaN") if nan_for_nonexisting else 0.0
    return 2 * tp / max(2 * tp + fp + fn, 1e-8)


def jaccard(test=None, reference=None, confusion_matrix=None,
            nan_for_nonexisting: bool = True, **kwargs):
    """TP / (TP + FP + FN)"""
    cm = _cm(test, reference, confusion_matrix)
    tp, fp, tn, fn = cm.get_matrix()
    test_empty, _, reference_empty, _ = cm.get_existence()
    if test_empty and reference_empty:
        return float("NaN") if nan_for_nonexisting else 0.0
    return tp / max(tp + fp + fn, 1e-8)


def precision(test=None, reference=None, confusion_matrix=None,
              nan_for_nonexisting: bool = True, **kwargs):
    cm = _cm(test, reference, confusion_matrix)
    tp, fp, tn, fn = cm.get_matrix()
    if cm.get_existence()[0]:  # test empty
        return float("NaN") if nan_for_nonexisting else 0.0
    return tp / max(tp + fp, 1e-8)


def sensitivity(test=None, reference=None, confusion_matrix=None,
                nan_for_nonexisting: bool = True, **kwargs):
    """= recall: TP / (TP + FN)"""
    cm = _cm(test, reference, confusion_matrix)
    tp, fp, tn, fn = cm.get_matrix()
    if cm.get_existence()[2]:  # reference empty
        return float("NaN") if nan_for_nonexisting else 0.0
    return tp / max(tp + fn, 1e-8)


recall = sensitivity


def specificity(test=None, reference=None, confusion_matrix=None,
                nan_for_nonexisting: bool = True, **kwargs):
    """TN / (TN + FP)"""
    cm = _cm(test, reference, confusion_matrix)
    tp, fp, tn, fn = cm.get_matrix()
    if cm.get_existence()[3]:  # reference full
        return float("NaN") if nan_for_nonexisting else 0.0
    return tn / max(tn + fp, 1e-8)


def accuracy(test=None, reference=None, confusion_matrix=None, **kwargs):
    cm = _cm(test, reference, confusion_matrix)
    tp, fp, tn, fn = cm.get_matrix()
    return (tp + tn) / max(tp + fp + tn + fn, 1e-8)


def fscore(test=None, reference=None, confusion_matrix=None, beta: float = 1.0,
           nan_for_nonexisting: bool = True, **kwargs):
    p = precision(test, reference, confusion_matrix, nan_for_nonexisting)
    r = recall(test, reference, confusion_matrix, nan_for_nonexisting)
    if np.isnan(p) or np.isnan(r) or (p + r) == 0:
        return float("NaN") if nan_for_nonexisting else 0.0
    return (1 + beta ** 2) * p * r / (beta ** 2 * p + r)


def false_positive_rate(test=None, reference=None, confusion_matrix=None,
                        **kwargs):
    return 1.0 - specificity(test, reference, confusion_matrix)


def false_negative_rate(test=None, reference=None, confusion_matrix=None,
                        **kwargs):
    return 1.0 - sensitivity(test, reference, confusion_matrix)


# ------------------------------------------------------- surface distances

def _surface_points(mask: np.ndarray,
                    spacing: Optional[Tuple[float, ...]] = None) -> np.ndarray:
    """Coordinates (mm) of border voxels (erosion-based surface)."""
    from scipy import ndimage
    mask = np.asarray(mask).astype(bool)
    if not mask.any():
        return np.zeros((0, mask.ndim))
    eroded = ndimage.binary_erosion(mask)
    surface = mask & ~eroded
    pts = np.argwhere(surface).astype(np.float64)
    if spacing is not None:
        pts *= np.asarray(spacing, np.float64)
    return pts


def _directed_distances(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    from scipy.spatial import cKDTree
    if len(a) == 0 or len(b) == 0:
        return np.asarray([np.inf])
    return cKDTree(b).query(a)[0]


def hausdorff_distance(test, reference, voxel_spacing=None,
                       nan_for_nonexisting: bool = True, **kwargs) -> float:
    """Max symmetric surface distance (reference Hausdorff.py:84-104)."""
    t = _surface_points(test, voxel_spacing)
    r = _surface_points(reference, voxel_spacing)
    if len(t) == 0 or len(r) == 0:
        return float("NaN") if nan_for_nonexisting else 0.0
    return float(max(_directed_distances(t, r).max(),
                     _directed_distances(r, t).max()))


def hausdorff_distance_95(test, reference, voxel_spacing=None,
                          nan_for_nonexisting: bool = True, **kwargs) -> float:
    """95th-percentile symmetric Hausdorff (reference Hausdorff.py:107-118)."""
    t = _surface_points(test, voxel_spacing)
    r = _surface_points(reference, voxel_spacing)
    if len(t) == 0 or len(r) == 0:
        return float("NaN") if nan_for_nonexisting else 0.0
    d1 = _directed_distances(t, r)
    d2 = _directed_distances(r, t)
    return float(max(np.percentile(d1, 95), np.percentile(d2, 95)))


def avg_surface_distance_symmetric(test, reference, voxel_spacing=None,
                                   nan_for_nonexisting: bool = True,
                                   **kwargs) -> float:
    """ASSD (reference Hausdorff.py:121-131)."""
    t = _surface_points(test, voxel_spacing)
    r = _surface_points(reference, voxel_spacing)
    if len(t) == 0 or len(r) == 0:
        return float("NaN") if nan_for_nonexisting else 0.0
    d1 = _directed_distances(t, r)
    d2 = _directed_distances(r, t)
    return float((d1.sum() + d2.sum()) / (len(d1) + len(d2)))


ALL_METRICS = {
    "Dice": dice,
    "Jaccard": jaccard,
    "Precision": precision,
    "Recall": recall,
    "Sensitivity": sensitivity,
    "Specificity": specificity,
    "Accuracy": accuracy,
    "F-Score": fscore,
    "False Positive Rate": false_positive_rate,
    "False Negative Rate": false_negative_rate,
    "Hausdorff Distance": hausdorff_distance,
    "Hausdorff Distance 95": hausdorff_distance_95,
    "Avg. Symmetric Surface Distance": avg_surface_distance_symmetric,
}
