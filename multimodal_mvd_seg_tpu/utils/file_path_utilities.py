"""Results-folder naming helpers.

Parity: reference nnunetv2/utilities/file_path_utilities.py:1-124 —
output-folder construction (incl. the fork's ``specified_cfg`` suffix,
nnUNetTrainer.py:125), fold-tuple naming, and worker liveness checking
(re-exported from the prefetch pipeline where it lives here).
"""

from typing import Optional, Tuple, Union

from .. import paths
from .dataset_naming import maybe_convert_to_dataset_name
from .files import join


def get_output_folder(dataset_name_or_id, trainer_name: str = "MVDSegTrainer",
                      plans_identifier: str = "nnUNetPlans",
                      configuration: str = "3d_fullres",
                      fold: Optional[Union[int, str]] = None,
                      specified_cfg: Optional[str] = None) -> str:
    name = f"{trainer_name}__{plans_identifier}__{configuration}"
    if specified_cfg:
        name += f"__{specified_cfg}"
    folder = join(paths.get_results(),
                  maybe_convert_to_dataset_name(dataset_name_or_id), name)
    if fold is not None:
        folder = join(folder, f"fold_{fold}")
    return folder


def folds_tuple_to_string(folds: Union[list, Tuple]) -> str:
    return "_".join(str(f) for f in folds)


def folds_string_to_tuple(folds_string: str) -> tuple:
    return tuple(int(f) if f != "all" else f
                 for f in folds_string.split("_"))


def check_workers_alive_and_busy(loader, *args, **kwargs):
    """Liveness check over a PrefetchLoader (the reference checks its
    multiprocessing pools the same way)."""
    loader.check_workers_alive_and_busy()
    return False
