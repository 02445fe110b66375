"""Transfer a plans file to another dataset (pretraining workflows).

Parity: reference experiment_planning/plans_for_pretraining/
move_plans_between_datasets.py — rewrite dataset_name/data_identifier and
the reader/writer to match the target dataset.
"""

from typing import Optional, Union

from .. import paths
from ..imageio.registry import determine_reader_writer_from_dataset_json
from ..utils.dataset_naming import maybe_convert_to_dataset_name
from ..utils.files import isdir, isfile, join, load_json, save_json


def move_plans_between_datasets(source_dataset_name_or_id: Union[int, str],
                                target_dataset_name_or_id: Union[int, str],
                                source_plans_identifier: str,
                                target_plans_identifier: Optional[str] = None
                                ) -> str:
    source_name = maybe_convert_to_dataset_name(source_dataset_name_or_id)
    target_name = maybe_convert_to_dataset_name(target_dataset_name_or_id)
    if target_plans_identifier is None:
        target_plans_identifier = source_plans_identifier

    source_folder = join(paths.get_preprocessed(), source_name)
    assert isdir(source_folder), (
        "Cannot move plans: preprocessed directory of the source dataset is "
        "missing. Run mvdseg_plan_and_preprocess for it first!")
    source_plans_file = join(source_folder, source_plans_identifier + ".json")
    assert isfile(source_plans_file), \
        f"Source plans missing: {source_plans_file}"

    plans = load_json(source_plans_file)
    plans["dataset_name"] = target_name
    if target_plans_identifier != source_plans_identifier:
        for c in plans["configurations"]:
            old = plans["configurations"][c].get("data_identifier")
            if old is None:
                continue
            if old.startswith(source_plans_identifier):
                new = target_plans_identifier + \
                    old[len(source_plans_identifier):]
            else:
                new = target_plans_identifier + "_" + old
            plans["configurations"][c]["data_identifier"] = new
    plans["plans_name"] = target_plans_identifier

    target_dataset_json = load_json(join(paths.get_raw(), target_name,
                                         "dataset.json"))
    rw = determine_reader_writer_from_dataset_json(target_dataset_json)
    plans["image_reader_writer"] = rw.__name__

    target_folder = join(paths.get_preprocessed(), target_name)
    assert isdir(target_folder), (
        "Target dataset has no preprocessed folder yet — run at least "
        "mvdseg_extract_fingerprint on it first.")
    out = join(target_folder, target_plans_identifier + ".json")
    save_json(plans, out, sort_keys=False)
    return out
