"""Topology evaluation metrics: Betti numbers / Betti error / clDice.

Parity targets (reference nnunetv2/training/metrics/):
- ``compute_persistence_diagram`` / ``betti_number`` — betti_compute.py:8-53
  (gudhi cubical persistence of an image; betti_number = the H1 interval
  count of a border-zeroed 2D patch).
- ``getBetti`` — cal_betti.py:19-57 (patchwise Betti error, topo_size=65).
- ``clDice`` / ``cal_clDice`` — clDice_metric.py:7-66 (centerline Dice over
  folders of segmentations, per label 0..3 plus overall).

Differences by design (documented, not accidental):
- persistence comes from our C++ core (ops/native/persistence.cpp) under the
  V-construction instead of gudhi's T-construction; for the binarized masks
  these metrics consume, bars of positive persistence + essential bars are
  counted (gudhi's zero-persistence pairs carry no information here).
- skeletons come from an iterative morphological thinning (the numpy twin of
  losses/soft_skeleton.soft_skel) instead of scikit-image's
  skeletonize/skeletonize_3d, which is not in this environment.
"""

import os
from typing import List

import numpy as np

from ..ops.persistence import _host_cubical


def compute_persistence_diagram(matrix: np.ndarray, min_pers: float = 0,
                                i: int = 5) -> np.ndarray:
    """Persistence diagram of the sublevel cubical filtration.

    i == 5 → all dimensions (rows [birth, death]); otherwise rows of
    dimension ``i`` only, matching the reference's gudhi wrapper.
    Essential bars get death = +inf.
    """
    img = np.asarray(matrix, np.float32)
    maxdim = max(img.ndim - 1, 0) if i == 5 else i
    dims, b_idx, d_idx = _host_cubical(img, maxdim, cap=1 << 20,
                                       keep_zero=False)
    flat = img.reshape(-1)
    rows = []
    for dim, bi, di in zip(dims, b_idx, d_idx):
        if dim < 0:
            continue
        if i != 5 and dim != i:
            continue
        birth = float(flat[bi])
        death = float(flat[di]) if di >= 0 else np.inf
        if death - birth < min_pers:
            continue
        rows.append([birth, death])
    return np.asarray(rows, np.float64).reshape(-1, 2)


def betti_number(image2d: np.ndarray) -> int:
    """H1 interval count of a border-zeroed 2D binary patch
    (reference betti_compute.betti_number:42-53)."""
    img = np.array(image2d, np.float32, copy=True)
    img[0, :] = 0
    img[-1, :] = 0
    img[:, 0] = 0
    img[:, -1] = 0
    return int(len(compute_persistence_diagram(img, i=1)))


def getBetti(binary_predict: np.ndarray, masks: np.ndarray,
             topo_size: int = 65) -> List[int]:
    """Patchwise |betti(pred) − betti(gt)| list (reference cal_betti.getBetti
    :19-57)."""
    errors = []
    h, w = masks.shape[:2]
    for y in range(0, h, topo_size):
        for x in range(0, w, topo_size):
            b = binary_predict[y:min(y + topo_size, h),
                               x:min(x + topo_size, w)]
            g = masks[y:min(y + topo_size, h), x:min(x + topo_size, w)]
            errors.append(abs(betti_number(b) - betti_number(g)))
    return errors


def _soft_erode_np(img):
    from scipy.ndimage import minimum_filter
    pools = []
    for ax in range(img.ndim):
        size = [1] * img.ndim
        size[ax] = 3
        pools.append(minimum_filter(img, size=size, mode="nearest"))
    out = pools[0]
    for p in pools[1:]:
        out = np.minimum(out, p)
    return out


def _soft_open_np(img):
    from scipy.ndimage import maximum_filter
    return maximum_filter(_soft_erode_np(img), size=3, mode="nearest")


def binary_skeleton(mask: np.ndarray, iterations: int = None) -> np.ndarray:
    """Morphological skeleton of a binary 2D/3D mask (numpy twin of
    losses/soft_skeleton.soft_skel; stands in for skimage skeletonize)."""
    img = (np.asarray(mask) > 0.5).astype(np.float32)
    if iterations is None:
        iterations = int(max(img.shape))  # enough to erode everything away
    skel = np.clip(img - _soft_open_np(img), 0, 1)
    for _ in range(iterations):
        img = _soft_erode_np(img)
        if img.max() == 0:
            break
        delta = np.clip(img - _soft_open_np(img), 0, 1)
        skel = skel + np.clip(delta - skel * delta, 0, 1)
    return skel > 0.5


def cl_score(v: np.ndarray, s: np.ndarray) -> float:
    """Skeleton volume overlap (reference clDice_metric.cl_score:7-17)."""
    denom = np.sum(s)
    return float(np.sum(v * s) / denom) if denom else 0.0


def clDice(v_p: np.ndarray, v_l: np.ndarray) -> float:
    """Centerline Dice between binary masks (reference :20-36)."""
    v_p = np.asarray(v_p) > 0.5
    v_l = np.asarray(v_l) > 0.5
    tprec = cl_score(v_p, binary_skeleton(v_l))
    tsens = cl_score(v_l, binary_skeleton(v_p))
    if tprec + tsens == 0:
        return 0.0
    return 2 * tprec * tsens / (tprec + tsens)


def cal_clDice(predict_path: str, gt_path: str, num_labels: int = 4,
               file_ending: str = ".nii.gz") -> np.ndarray:
    """Mean per-label clDice over a folder of predictions vs ground truth
    (reference clDice_metric.cal_clDice:39-66)."""
    from ..imageio.nifti import read_nifti
    cldice = []
    for file in sorted(os.listdir(predict_path)):
        if not file.endswith(file_ending):
            continue
        pred, _ = read_nifti(os.path.join(predict_path, file))
        gt, _ = read_nifti(os.path.join(gt_path, file))
        cld = [clDice(np.where(pred == num, 1, 0),
                      np.where(gt == num, 1, 0))
               for num in range(num_labels)]
        cldice.append(cld)
    return np.mean(cldice, axis=0)
