"""Inject 3d_lowres + 3d_cascade_fullres configurations into a plans file.

Parity: reference nnunetv2/tests/integration_tests/add_lowres_and_cascade.py
— small integration datasets never trigger lowres planning, so the test
harness injects a lowres config (inheriting 3d_fullres) and a cascade config
so all four configurations get exercised.
"""

import argparse

from ... import paths
from ...utils.dataset_naming import maybe_convert_to_dataset_name
from ...utils.files import join, load_json, save_json


def add_lowres_and_cascade(dataset_ids, plans_identifier: str = "nnUNetPlans"):
    for d in dataset_ids:
        name = maybe_convert_to_dataset_name(d)
        plans_file = join(paths.get_preprocessed(), name,
                          plans_identifier + ".json")
        plans = load_json(plans_file)
        fullres = plans["configurations"]["3d_fullres"]
        plans["configurations"]["3d_lowres"] = {
            "inherits_from": "3d_fullres",
            "data_identifier": plans["plans_name"] + "_3d_lowres",
            "spacing": [s * 2 for s in fullres["spacing"]],
            "median_image_size_in_voxels": [
                round(i / 2) for i in
                fullres["median_image_size_in_voxels"]],
            "next_stage": "3d_cascade_fullres",
        }
        plans["configurations"]["3d_cascade_fullres"] = {
            "inherits_from": "3d_fullres",
            "previous_stage": "3d_lowres",
        }
        save_json(plans, plans_file, sort_keys=False)
        print(f"Added 3d_lowres + 3d_cascade_fullres to {plans_file}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-d", nargs="+", required=True)
    args = p.parse_args()
    add_lowres_and_cascade([int(i) if str(i).isdigit() else i
                            for i in args.d])
