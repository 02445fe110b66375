"""Convert an old (v1) nnU-Net raw dataset to the v2 layout.

Parity: reference nnunetv2/dataset_conversion/
convert_raw_dataset_from_old_nnunet_format.py — images already carry the
``_0000`` channel suffixes; copy them over and rewrite dataset.json
(modality → channel_names, inverted labels, numTraining).
"""

import os
import shutil

from .. import paths
from ..experiment_planning.generate_dataset_json import generate_dataset_json
from ..utils.files import isdir, join, load_json, maybe_mkdir_p, subfiles


def convert_old_dataset(source_folder: str) -> str:
    source_folder = source_folder.rstrip("/")
    task_name = os.path.basename(source_folder)
    assert task_name.startswith("Task"), "old datasets are named TaskXXX_Name"
    task_id = int(task_name[4:7])
    name = task_name.split("_", 1)[1]
    target_name = f"Dataset{task_id:03d}_{name}"
    target = join(paths.get_raw(), target_name)
    if isdir(target):
        shutil.rmtree(target)
    for sub in ("imagesTr", "labelsTr"):
        maybe_mkdir_p(join(target, sub))
        for f in subfiles(join(source_folder, sub), join=False):
            shutil.copy(join(source_folder, sub, f), join(target, sub, f))
    if isdir(join(source_folder, "imagesTs")):
        maybe_mkdir_p(join(target, "imagesTs"))
        for f in subfiles(join(source_folder, "imagesTs"), join=False):
            shutil.copy(join(source_folder, "imagesTs", f),
                        join(target, "imagesTs", f))

    old = load_json(join(source_folder, "dataset.json"))
    channel_names = {int(k): v for k, v in old["modality"].items()}
    labels = {v: int(k) for k, v in old["labels"].items()}
    n_train = len(set(f.split("_")[0] if "_" not in f else
                      f[:f.rfind("_")]
                      for f in subfiles(join(target, "imagesTr"), join=False)))
    generate_dataset_json(target, channel_names=channel_names, labels=labels,
                          num_training_cases=n_train, file_ending=".nii.gz",
                          dataset_name=target_name)
    return target
