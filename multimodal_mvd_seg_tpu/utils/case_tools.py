"""Raw-dataset case wrangling.

Parity: the reference's one-off in-house scripts under nnunetv2/utilities/
(rename_files.py, random_select_test.py, selec_single_modal.py,
remove_cases.py, select_cases_with_annotation.py, select_usable_cases.py,
read_dataset_property.py) distilled into reusable functions over nnU-Net-
convention raw folders. The remaining scripts in that folder (read_npz.py,
read_pkl.py, read_png.py, read_l.py, read_unique.py, temp*.py,
check_pkl_npy.py, crop_data_slice.py, find_samevalue_csv.py — one of which
does not even parse) are throwaway debugging one-offs with no reuse value
and are deliberately not ported; their behavior is covered by normal numpy/
pickle usage.
"""

import os
import random
import re
import shutil
from typing import Dict, List, Optional, Sequence, Tuple

from .files import join, maybe_mkdir_p, subfiles


def rename_to_convention(input_folder: str, output_folder: str,
                         channel_suffixes: Dict[str, int],
                         case_prefix: str = "case",
                         file_ending: str = ".nii.gz",
                         copy: bool = True) -> Dict[str, str]:
    """Rename arbitrary per-case files to the nnU-Net raw convention
    ``{prefix}_{case:04d}_{channel:04d}{ending}`` (reference
    rename_files.py intent). ``channel_suffixes`` maps a filename substring
    identifying each modality (e.g. {"T2": 0, "TOF": 1}) to its channel
    index; files sharing everything but the modality substring are grouped
    into one case. Returns {new_name: source_path}."""
    maybe_mkdir_p(output_folder)
    groups: Dict[str, Dict[int, str]] = {}
    for f in sorted(subfiles(input_folder, suffix=file_ending, join=False)):
        for token, channel in channel_suffixes.items():
            if token in f:
                stem = f.replace(token, "").replace(file_ending, "")
                stem = re.sub(r"[_\-. ]+", "_", stem).strip("_")
                groups.setdefault(stem, {})[channel] = join(input_folder, f)
                break
    mapping = {}
    op = shutil.copy if copy else shutil.move
    for i, stem in enumerate(sorted(groups)):
        for channel, src in sorted(groups[stem].items()):
            new = f"{case_prefix}_{i:04d}_{channel:04d}{file_ending}"
            op(src, join(output_folder, new))
            mapping[new] = src
    return mapping


def random_select_test_cases(images_tr: str, labels_tr: str, images_ts: str,
                             n_test: int, seed: int = 1234,
                             file_ending: str = ".nii.gz") -> List[str]:
    """Move ``n_test`` randomly chosen cases from imagesTr (all channels)
    to imagesTs, dropping their labels (reference random_select_test.py).
    Returns the chosen case identifiers."""
    maybe_mkdir_p(images_ts)
    cases = sorted({re.sub(r"_\d{4}" + re.escape(file_ending) + "$", "", f)
                    for f in subfiles(images_tr, suffix=file_ending,
                                      join=False)})
    rng = random.Random(seed)
    chosen = sorted(rng.sample(cases, n_test))
    for case in chosen:
        for f in subfiles(images_tr, prefix=case + "_", suffix=file_ending,
                          join=False):
            shutil.move(join(images_tr, f), join(images_ts, f))
        lab = join(labels_tr, case + file_ending)
        if os.path.isfile(lab):
            os.remove(lab)
    return chosen


def select_single_modality(input_folder: str, output_folder: str,
                           channel: int,
                           file_ending: str = ".nii.gz") -> List[str]:
    """Copy only one modality's files, renumbered to channel 0000
    (reference selec_single_modal.py)."""
    maybe_mkdir_p(output_folder)
    suffix = f"_{channel:04d}{file_ending}"
    out = []
    for f in sorted(subfiles(input_folder, suffix=suffix, join=False)):
        new = f[:-len(suffix)] + f"_0000{file_ending}"
        shutil.copy(join(input_folder, f), join(output_folder, new))
        out.append(new)
    return out


def remove_cases(folder: str, case_identifiers: Sequence[str],
                 file_ending: str = ".nii.gz") -> int:
    """Delete all files of the given cases (reference remove_cases.py)."""
    n = 0
    for case in case_identifiers:
        for f in subfiles(folder, prefix=case, suffix=file_ending):
            os.remove(f)
            n += 1
    return n


def select_cases_with_annotation(images_folder: str, labels_folder: str,
                                 file_ending: str = ".nii.gz"
                                 ) -> Tuple[List[str], List[str]]:
    """Split case ids into (annotated, unannotated) by the presence of a
    label file (reference select_cases_with_annotation.py /
    select_usable_cases.py)."""
    cases = sorted({re.sub(r"_\d{4}" + re.escape(file_ending) + "$", "", f)
                    for f in subfiles(images_folder, suffix=file_ending,
                                      join=False)})
    have = [c for c in cases
            if os.path.isfile(join(labels_folder, c + file_ending))]
    missing = [c for c in cases if c not in set(have)]
    return have, missing


def read_dataset_property(preprocessed_dataset_folder: str,
                          prop: Optional[str] = None):
    """Load dataset_fingerprint.json (optionally one key) — reference
    read_dataset_property.py."""
    from .files import load_json
    fp = load_json(join(preprocessed_dataset_folder,
                        "dataset_fingerprint.json"))
    return fp if prop is None else fp[prop]
