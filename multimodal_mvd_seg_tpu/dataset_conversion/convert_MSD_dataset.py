"""Convert a Medical Segmentation Decathlon dataset to the raw layout.

Parity: reference nnunetv2/dataset_conversion/convert_MSD_dataset.py (which
ships with a syntax error at :12 — reimplemented working): split the MSD
4D multi-modality images into per-channel ``_{c:04d}`` files, rewrite
dataset.json (modality → channel_names, label map inverted to name → id).
"""

import os
import shutil
from typing import Optional

import numpy as np

from .. import paths
from ..experiment_planning.generate_dataset_json import generate_dataset_json
from ..imageio.nifti import read_nifti, write_nifti
from ..utils.files import isdir, join, load_json, maybe_mkdir_p


def convert_msd_dataset(source_folder: str,
                        overwrite_target_id: Optional[int] = None,
                        num_processes: int = 1) -> str:
    source_folder = source_folder.rstrip("/")
    task_name = os.path.basename(source_folder)
    assert task_name.startswith("Task"), \
        "MSD folders are named TaskXX_Name"
    task_id = int(task_name[4:6])
    name = task_name.split("_", 1)[1]
    target_id = overwrite_target_id if overwrite_target_id is not None \
        else task_id
    target_name = f"Dataset{target_id:03d}_{name}"
    target = join(paths.get_raw(), target_name)
    if isdir(target):
        shutil.rmtree(target)
    for sub in ("imagesTr", "labelsTr", "imagesTs"):
        maybe_mkdir_p(join(target, sub))

    ds = load_json(join(source_folder, "dataset.json"))
    n_channels = len(ds["modality"])

    def split_image(src, dst_base):
        data, header = read_nifti(src)
        spacing = tuple(header["zooms"][:3])
        if n_channels == 1:
            if data.ndim == 4:
                data = data[..., 0]
            write_nifti(dst_base + "_0000.nii.gz", data, spacing=spacing)
        else:
            assert data.ndim == 4, f"expected 4D MSD image, got {data.shape}"
            for c in range(n_channels):
                write_nifti(f"{dst_base}_{c:04d}.nii.gz", data[..., c],
                            spacing=spacing)

    n_train = 0
    for entry in ds["training"]:
        img = join(source_folder, entry["image"].lstrip("./"))
        lab = join(source_folder, entry["label"].lstrip("./"))
        case = os.path.basename(img).replace(".nii.gz", "")
        split_image(img, join(target, "imagesTr", case))
        shutil.copy(lab, join(target, "labelsTr", case + ".nii.gz"))
        n_train += 1
    for img_rel in ds.get("test", []):
        img = join(source_folder, img_rel.lstrip("./"))
        case = os.path.basename(img).replace(".nii.gz", "")
        split_image(img, join(target, "imagesTs", case))

    channel_names = {int(k): v for k, v in ds["modality"].items()}
    labels = {v: int(k) for k, v in ds["labels"].items()}
    generate_dataset_json(target, channel_names=channel_names, labels=labels,
                          num_training_cases=n_train, file_ending=".nii.gz",
                          dataset_name=target_name,
                          description=ds.get("description", ""),
                          license=ds.get("licence", ds.get("license", "")),
                          reference=ds.get("reference", ""),
                          release=ds.get("release", ""))
    return target
