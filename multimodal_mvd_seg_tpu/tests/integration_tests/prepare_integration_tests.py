"""Derive the 4 integration datasets (standard / regions / ignore /
regions+ignore) from one source dataset.

Parity: reference nnunetv2/tests/integration_tests/
prepare_integration_tests.sh (+readme.md:7-10): clone a small dataset into
ids 996-999 covering every labeling mode. The source here is any raw
dataset (or the built-in synthetic generator when none is given).
"""

import argparse
import os
import shutil

import numpy as np

from ... import paths
from ...experiment_planning.generate_dataset_json import generate_dataset_json
from ...imageio.nifti import read_nifti, write_nifti
from ...utils.dataset_naming import maybe_convert_to_dataset_name
from ...utils.files import join, load_json, maybe_mkdir_p, subfiles

INTEGRATION_IDS = {
    996: "standard labels",
    997: "regions",
    998: "ignore label",
    999: "regions + ignore",
}


def make_synthetic_source(n_cases: int = 10, shape=(24, 28, 32),
                          dataset_id: int = 995) -> str:
    """Generate a small 1-channel 3-label dataset to derive from."""
    name = f"Dataset{dataset_id:03d}_IntegrationSource"
    base = join(paths.get_raw(), name)
    for sub in ("imagesTr", "labelsTr"):
        maybe_mkdir_p(join(base, sub))
    rng = np.random.RandomState(0)
    for i in range(n_cases):
        seg = np.zeros(shape, np.uint8)
        cx = 10 + rng.randint(-2, 3)
        seg[cx - 4:cx + 4, 8:18, 10:22] = 1
        seg[cx, 4:24, 16] = 2
        img = rng.normal(0, 0.1, shape).astype(np.float32) + \
            (seg == 1) + 2.0 * (seg == 2)
        write_nifti(join(base, "imagesTr", f"case_{i:03d}_0000.nii.gz"),
                    img.T, spacing=(1.0, 1.0, 1.0))
        write_nifti(join(base, "labelsTr", f"case_{i:03d}.nii.gz"), seg.T,
                    spacing=(1.0, 1.0, 1.0))
    generate_dataset_json(base, channel_names={0: "MRI"},
                          labels={"background": 0, "organ": 1, "vessel": 2},
                          num_training_cases=n_cases, file_ending=".nii.gz",
                          dataset_name=name)
    return name


def prepare_integration_tests(source_dataset=None):
    source = maybe_convert_to_dataset_name(source_dataset) \
        if source_dataset is not None else make_synthetic_source()
    src = join(paths.get_raw(), source)
    src_json = load_json(join(src, "dataset.json"))
    labels = {k: v for k, v in src_json["labels"].items()}
    fg = [v for v in labels.values() if v != 0]
    ignore_id = max(fg) + 1

    derived = {
        996: dict(labels=labels, regions=None, remap_ignore=False),
        997: dict(labels={"background": 0,
                          "all_fg": tuple(fg),
                          labels_key_of(labels, fg[-1]): fg[-1]},
                  regions=(1, fg[-1]), remap_ignore=False),
        998: dict(labels={**labels, "ignore": ignore_id}, regions=None,
                  remap_ignore=True),
        999: dict(labels={"background": 0,
                          "all_fg": tuple(fg),
                          labels_key_of(labels, fg[-1]): fg[-1],
                          "ignore": ignore_id},
                  regions=(1, fg[-1]), remap_ignore=True),
    }
    created = []
    for did, spec in derived.items():
        name = f"Dataset{did:03d}_IntegrationTest"
        dst = join(paths.get_raw(), name)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        maybe_mkdir_p(join(dst, "imagesTr"))
        maybe_mkdir_p(join(dst, "labelsTr"))
        for f in subfiles(join(src, "imagesTr"), join=False):
            shutil.copy(join(src, "imagesTr", f), join(dst, "imagesTr", f))
        rng = np.random.RandomState(did)
        for f in subfiles(join(src, "labelsTr"), join=False):
            seg, hdr = read_nifti(join(src, "labelsTr", f))
            seg = np.asarray(seg).copy()
            if spec["remap_ignore"]:
                # mark a random border slab as unannotated
                seg[:, :, : rng.randint(1, 3)] = ignore_id
            write_nifti(join(dst, "labelsTr", f), seg.astype(np.uint8),
                        spacing=tuple(hdr["zooms"][:3]))
        n_train = len(subfiles(join(dst, "labelsTr"), join=False))
        generate_dataset_json(
            dst, channel_names={int(k): v for k, v in
                                src_json["channel_names"].items()},
            labels=spec["labels"], num_training_cases=n_train,
            file_ending=src_json["file_ending"], dataset_name=name,
            regions_class_order=spec["regions"])
        created.append(name)
        print(f"created {name} ({INTEGRATION_IDS[did]})")
    return created


def labels_key_of(labels: dict, value) -> str:
    for k, v in labels.items():
        if v == value:
            return k
    return f"label{value}"


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("-d", default=None,
                   help="source dataset (default: generate synthetic)")
    prepare_integration_tests(p.parse_args().d)
