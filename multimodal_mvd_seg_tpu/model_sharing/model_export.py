"""Export a trained model (results folder) to a portable zip.

Parity: reference nnunetv2/model_sharing/model_export.py (124 LoC): pack the
selected folds' checkpoints, plans/dataset jsons, postprocessing artifacts
and (optionally) the merged cross-validation summaries into one zip that
``install_model_from_zip_file`` can unpack into another machine's results
folder.
"""

import os
import zipfile
from typing import List, Optional, Tuple, Union

from .. import paths
from ..utils.dataset_naming import maybe_convert_to_dataset_name
from ..utils.files import isdir, isfile, join, subdirs, subfiles


def export_pretrained_model(dataset_name_or_id: Union[int, str],
                            output_file: str,
                            configurations: Tuple[str, ...] = (
                                "2d", "3d_fullres", "3d_lowres",
                                "3d_cascade_fullres"),
                            trainer: str = "MVDSegTrainer",
                            plans_identifier: str = "nnUNetPlans",
                            folds: Tuple[Union[int, str], ...] = (0, 1, 2, 3, 4),
                            strict: bool = True,
                            save_checkpoints: Tuple[str, ...] = (
                                "checkpoint_final.pkl",),
                            export_crossval_predictions: bool = False):
    dataset_name = maybe_convert_to_dataset_name(dataset_name_or_id)
    base = join(paths.get_results(), dataset_name)
    with zipfile.ZipFile(output_file, "w", zipfile.ZIP_DEFLATED) as zf:
        found_any = False
        for c in configurations:
            folder = join(base, f"{trainer}__{plans_identifier}__{c}")
            if not isdir(folder):
                if strict:
                    raise RuntimeError(f"{folder} does not exist")
                continue
            found_any = True
            for top in ("plans.json", "dataset.json",
                        "dataset_fingerprint.json", "postprocessing.json",
                        "postprocessing.pkl"):
                if isfile(join(folder, top)):
                    zf.write(join(folder, top),
                             os.path.relpath(join(folder, top),
                                             paths.get_results()))
            for f in folds:
                fold_dir = join(folder, f"fold_{f}")
                if not isdir(fold_dir):
                    if strict:
                        raise RuntimeError(f"fold missing: {fold_dir}")
                    continue
                for ckpt in save_checkpoints:
                    p = join(fold_dir, ckpt)
                    if isfile(p):
                        zf.write(p, os.path.relpath(p, paths.get_results()))
                for extra in ("debug.json",):
                    p = join(fold_dir, extra)
                    if isfile(p):
                        zf.write(p, os.path.relpath(p, paths.get_results()))
            if export_crossval_predictions:
                for d in subdirs(folder, prefix="crossval_results",
                                 join=True):
                    for p in subfiles(d, join=True):
                        zf.write(p, os.path.relpath(p, paths.get_results()))
        # dataset-level selection artifacts
        for top in ("inference_information.json",
                    "inference_instructions.txt"):
            if isfile(join(base, top)):
                zf.write(join(base, top),
                         os.path.relpath(join(base, top), paths.get_results()))
        assert found_any, "nothing was exported — no matching model folders"
    print(f"Exported {dataset_name} to {output_file}")
