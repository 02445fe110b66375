"""Label-map wrangling utilities.

Parity: the reference's one-off in-house scripts under nnunetv2/utilities/
(aggregate_label.py, combine_labels.py, rename/check label scripts,
statistical significance) distilled into reusable functions over NIfTI
folders.
"""

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..imageio.nifti import read_nifti, write_nifti
from ..utils.files import join, maybe_mkdir_p, subfiles


def combine_labels(input_files: Sequence[str], output_file: str,
                   priority: Optional[Sequence[int]] = None):
    """Merge several binary/label maps into one labelmap; later files (or
    explicit priority order) overwrite earlier ones on overlap
    (reference combine_labels.py behavior)."""
    out = None
    header = None
    order = range(len(input_files)) if priority is None else priority
    for rank, idx in enumerate(order, start=1):
        data, header = read_nifti(input_files[idx])
        mask = data > 0
        if out is None:
            out = np.zeros(data.shape, np.uint8)
        out[mask] = np.where(data[mask] > 1, data[mask], rank).astype(np.uint8)
    write_nifti(output_file, out, spacing=tuple(header["zooms"][:3]))


def aggregate_labels_folder(input_folders: List[str], output_folder: str,
                            file_ending: str = ".nii.gz"):
    """Case-wise combine over parallel folders (reference aggregate_label.py)."""
    maybe_mkdir_p(output_folder)
    names = subfiles(input_folders[0], suffix=file_ending, join=False)
    for n in names:
        combine_labels([join(f, n) for f in input_folders],
                       join(output_folder, n))


def remap_labels(input_file: str, output_file: str, mapping: Dict[int, int]):
    """Rename label ids (reference rename-label scripts)."""
    data, header = read_nifti(input_file)
    out = data.copy()
    for src, dst in mapping.items():
        out[data == src] = dst
    write_nifti(output_file, out.astype(np.uint8),
                spacing=tuple(header["zooms"][:3]))


def check_labels_folder(folder: str, expected: Sequence[int],
                        file_ending: str = ".nii.gz") -> Dict[str, list]:
    """Report unexpected label values per case (reference check scripts)."""
    bad = {}
    for f in subfiles(folder, suffix=file_ending, join=False):
        data, _ = read_nifti(join(folder, f))
        found = set(np.unique(data).astype(int).tolist())
        extra = sorted(found - set(int(e) for e in expected))
        if extra:
            bad[f] = extra
    return bad


def paired_wilcoxon(scores_a: Sequence[float], scores_b: Sequence[float]):
    """Paired significance test over per-case metric values
    (reference statistical-significance script; scipy Wilcoxon)."""
    from scipy.stats import wilcoxon
    stat, p = wilcoxon(scores_a, scores_b)
    return {"statistic": float(stat), "pvalue": float(p),
            "mean_a": float(np.mean(scores_a)),
            "mean_b": float(np.mean(scores_b))}
