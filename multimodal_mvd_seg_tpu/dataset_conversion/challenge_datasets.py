"""Per-challenge dataset converters.

Parity: the reference ships one script per challenge under
dataset_conversion/ (Dataset027_ACDC.py, Dataset120_RoadSegmentation.py,
Dataset137_BraTS21.py, Dataset218/219_Amos2022, Dataset220_KiTS2023.py).
Those scripts are thin folder-reorganizers around the same three moves —
copy/split channels, (optionally) remap labels, write dataset.json — so the
rebuild provides them as functions over a shared core.
"""

import os
import shutil
from typing import Dict, Optional, Sequence

import numpy as np

from .. import paths
from ..experiment_planning.generate_dataset_json import generate_dataset_json
from ..imageio.nifti import read_nifti, write_nifti
from ..utils.files import isdir, join, maybe_mkdir_p, subfiles


def _fresh(target: str):
    if isdir(target):
        shutil.rmtree(target)
    for sub in ("imagesTr", "labelsTr", "imagesTs"):
        maybe_mkdir_p(join(target, sub))


def _convert_simple(source_images: str, source_labels: str, target: str,
                    channel_names: Dict[int, str], labels: Dict[str, int],
                    file_ending: str = ".nii.gz",
                    label_remap: Optional[Dict[int, int]] = None,
                    dataset_name: str = "") -> int:
    """Cases already one file per channel (``_0000`` suffixes)."""
    n = 0
    for f in subfiles(source_images, suffix=file_ending, join=False):
        shutil.copy(join(source_images, f), join(target, "imagesTr", f))
    for f in subfiles(source_labels, suffix=file_ending, join=False):
        if label_remap:
            seg, hdr = read_nifti(join(source_labels, f))
            out = seg.copy()
            for a, b in label_remap.items():
                out[seg == a] = b
            write_nifti(join(target, "labelsTr", f), out.astype(np.uint8),
                        spacing=tuple(hdr["zooms"][:3]))
        else:
            shutil.copy(join(source_labels, f), join(target, "labelsTr", f))
        n += 1
    generate_dataset_json(target, channel_names=channel_names, labels=labels,
                          num_training_cases=n, file_ending=file_ending,
                          dataset_name=dataset_name)
    return n


def convert_acdc(source_folder: str, dataset_id: int = 27) -> str:
    """ACDC cardiac MRI (reference Dataset027_ACDC.py): per-patient ED/ES
    frames become separate cases; labels {RV:1, MLV:2, LVC:3}."""
    name = f"Dataset{dataset_id:03d}_ACDC"
    target = join(paths.get_raw(), name)
    _fresh(target)
    n = 0
    training = join(source_folder, "training")
    src = training if isdir(training) else source_folder
    for patient in sorted(os.listdir(src)):
        pdir = join(src, patient)
        if not isdir(pdir):
            continue
        frames = [f for f in subfiles(pdir, suffix=".nii.gz", join=False)
                  if "_gt" not in f and "frame" in f and "4d" not in f]
        for fr in frames:
            gt = fr.replace(".nii.gz", "_gt.nii.gz")
            if not os.path.isfile(join(pdir, gt)):
                continue
            case = fr.replace(".nii.gz", "")
            shutil.copy(join(pdir, fr),
                        join(target, "imagesTr", f"{case}_0000.nii.gz"))
            shutil.copy(join(pdir, gt),
                        join(target, "labelsTr", f"{case}.nii.gz"))
            n += 1
    generate_dataset_json(target, channel_names={0: "cineMRI"},
                          labels={"background": 0, "RV": 1, "MLV": 2,
                                  "LVC": 3},
                          num_training_cases=n, file_ending=".nii.gz",
                          dataset_name=name)
    return target


def convert_brats21(source_folder: str, dataset_id: int = 137) -> str:
    """BraTS21 (reference Dataset137_BraTS21.py): 4 modalities per case;
    label 4 (ET) remapped to 3; region-based labels (whole/core/enhancing)."""
    name = f"Dataset{dataset_id:03d}_BraTS2021"
    target = join(paths.get_raw(), name)
    _fresh(target)
    mods = ["t1", "t1ce", "t2", "flair"]
    n = 0
    for case_dir in sorted(os.listdir(source_folder)):
        cdir = join(source_folder, case_dir)
        if not isdir(cdir):
            continue
        seg_file = join(cdir, f"{case_dir}_seg.nii.gz")
        if not os.path.isfile(seg_file):
            continue
        for i, m in enumerate(mods):
            shutil.copy(join(cdir, f"{case_dir}_{m}.nii.gz"),
                        join(target, "imagesTr",
                             f"{case_dir}_{i:04d}.nii.gz"))
        seg, hdr = read_nifti(seg_file)
        out = seg.copy()
        out[seg == 4] = 3
        write_nifti(join(target, "labelsTr", f"{case_dir}.nii.gz"),
                    out.astype(np.uint8), spacing=tuple(hdr["zooms"][:3]))
        n += 1
    generate_dataset_json(
        target, channel_names={0: "T1", 1: "T1ce", 2: "T2", 3: "Flair"},
        labels={"background": 0, "whole_tumor": (1, 2, 3),
                "tumor_core": (2, 3), "enhancing_tumor": 3},
        num_training_cases=n, file_ending=".nii.gz", dataset_name=name,
        regions_class_order=(1, 2, 3))
    return target


def convert_amos(source_folder: str, dataset_id: int = 218,
                 task: int = 1) -> str:
    """AMOS 2022 (reference Dataset218/219_Amos2022_task1/2.py): abdominal
    CT(/MRI) multi-organ; task 1 uses the CT cases, task 2 all."""
    name = f"Dataset{dataset_id:03d}_Amos2022_task{task}"
    target = join(paths.get_raw(), name)
    _fresh(target)
    organs = ["spleen", "right kidney", "left kidney", "gallbladder",
              "esophagus", "liver", "stomach", "aorta", "inferior vena cava",
              "pancreas", "right adrenal gland", "left adrenal gland",
              "duodenum", "bladder", "prostate/uterus"]
    labels = {"background": 0}
    labels.update({o: i + 1 for i, o in enumerate(organs)})
    n = 0
    img_dir = join(source_folder, "imagesTr")
    lab_dir = join(source_folder, "labelsTr")
    for f in subfiles(img_dir, suffix=".nii.gz", join=False):
        case_num = int("".join(c for c in f if c.isdigit()) or 0)
        if task == 1 and case_num > 500:   # >500 are MRI in AMOS
            continue
        case = f.replace(".nii.gz", "")
        shutil.copy(join(img_dir, f),
                    join(target, "imagesTr", f"{case}_0000.nii.gz"))
        shutil.copy(join(lab_dir, f), join(target, "labelsTr", f))
        n += 1
    generate_dataset_json(target, channel_names={0: "CT" if task == 1
                                                 else "either_CT_or_MR"},
                          labels=labels, num_training_cases=n,
                          file_ending=".nii.gz", dataset_name=name)
    return target


def convert_kits23(source_folder: str, dataset_id: int = 220) -> str:
    """KiTS 2023 (reference Dataset220_KiTS2023.py): kidney/tumor/cyst with
    region-based training."""
    name = f"Dataset{dataset_id:03d}_KiTS2023"
    target = join(paths.get_raw(), name)
    _fresh(target)
    n = 0
    for case_dir in sorted(os.listdir(source_folder)):
        cdir = join(source_folder, case_dir)
        if not isdir(cdir) or not os.path.isfile(join(cdir, "imaging.nii.gz")):
            continue
        shutil.copy(join(cdir, "imaging.nii.gz"),
                    join(target, "imagesTr", f"{case_dir}_0000.nii.gz"))
        shutil.copy(join(cdir, "segmentation.nii.gz"),
                    join(target, "labelsTr", f"{case_dir}.nii.gz"))
        n += 1
    generate_dataset_json(
        target, channel_names={0: "CT"},
        labels={"background": 0, "kidney_and_mass": (1, 2, 3),
                "mass": (2, 3), "tumor": 2},
        num_training_cases=n, file_ending=".nii.gz", dataset_name=name,
        regions_class_order=(1, 3, 2))
    return target


def convert_road_segmentation(source_folder: str,
                              dataset_id: int = 120) -> str:
    """Massachusetts road segmentation (reference
    Dataset120_RoadSegmentation.py): 2D natural images, binary road label."""
    name = f"Dataset{dataset_id:03d}_RoadSegmentation"
    target = join(paths.get_raw(), name)
    _fresh(target)
    from PIL import Image
    img_dir = join(source_folder, "images")
    lab_dir = join(source_folder, "labels")
    n = 0
    for f in sorted(os.listdir(img_dir)):
        case = os.path.splitext(f)[0]
        img = np.asarray(Image.open(join(img_dir, f)))
        lab = np.asarray(Image.open(join(lab_dir, f)))
        Image.fromarray(img).save(join(target, "imagesTr",
                                       f"{case}_0000.png"))
        Image.fromarray(((lab > 127) * 1).astype(np.uint8)).save(
            join(target, "labelsTr", f"{case}.png"))
        n += 1
    generate_dataset_json(target, channel_names={0: "R"},
                          labels={"background": 0, "road": 1},
                          num_training_cases=n, file_ending=".png",
                          dataset_name=name)
    return target
