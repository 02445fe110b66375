"""Install a model zip into the local results folder.

Parity: reference nnunetv2/model_sharing/model_import.py."""

import zipfile

from .. import paths


def install_model_from_zip_file(zip_file: str):
    with zipfile.ZipFile(zip_file, "r") as zf:
        zf.extractall(paths.get_results())
    print(f"Installed {zip_file} into {paths.get_results()}")
