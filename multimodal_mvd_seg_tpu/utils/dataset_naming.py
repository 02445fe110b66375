"""Dataset name/id conversion.

Parity: reference nnunetv2/utilities/dataset_name_id_conversion.py — datasets
live in folders named ``Dataset{XXX}_{Name}``; users may address them by integer
id, "DatasetXXX_Name", or plain id string."""

import os
from typing import Union

from .. import paths
from .files import subdirs


def convert_id_to_dataset_name(dataset_id: int) -> str:
    startswith = "Dataset%03d" % dataset_id
    candidates = set()
    for base in (paths.get_preprocessed(False), paths.get_raw(False),
                 paths.get_results(False)):
        if base is not None and os.path.isdir(base):
            candidates.update(
                os.path.basename(d) for d in subdirs(base, prefix=startswith))
    if len(candidates) > 1:
        raise RuntimeError(
            f"More than one dataset name found for id {dataset_id}: {candidates}")
    if len(candidates) == 0:
        raise RuntimeError(
            f"Could not find a dataset with id {dataset_id} in "
            f"MVDSEG_raw/preprocessed/results. Looked for folder {startswith}_*")
    return candidates.pop()


def maybe_convert_to_dataset_name(name_or_id: Union[int, str]) -> str:
    if isinstance(name_or_id, str) and name_or_id.startswith("Dataset"):
        return name_or_id
    try:
        return convert_id_to_dataset_name(int(name_or_id))
    except ValueError:
        raise ValueError(
            f"dataset must be an integer id or 'DatasetXXX_Name', got {name_or_id!r}")


def convert_dataset_name_to_id(dataset_name: str) -> int:
    assert dataset_name.startswith("Dataset")
    return int(dataset_name[7:10])
