import os

# Tests run on a simulated 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver benches on the real chip).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# this image's sitecustomize imports jax (axon TPU backend) at interpreter
# start, before conftest runs — env vars alone are too late. Platform
# selection is lazy, so the config update still wins if no computation ran.
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture()
def synthetic_raw_dataset(tmp_path, monkeypatch):
    """A tiny 2-channel 3D segmentation dataset (Dataset001_Synth) with 6
    cases, NIfTI storage, labels {background, organ, vessel}."""
    from multimodal_mvd_seg_tpu.imageio.nifti import write_nifti
    from multimodal_mvd_seg_tpu.experiment_planning.generate_dataset_json import (
        generate_dataset_json)

    raw = tmp_path / "raw"
    pre = tmp_path / "preprocessed"
    res = tmp_path / "results"
    ds = raw / "Dataset001_Synth"
    (ds / "imagesTr").mkdir(parents=True)
    (ds / "labelsTr").mkdir(parents=True)
    (ds / "imagesTs").mkdir(parents=True)
    for p in (pre, res):
        p.mkdir()

    rng = np.random.RandomState(0)
    n_cases = 6
    shape = (24, 28, 32)
    spacing = (1.0, 0.7, 0.7)
    for i in range(n_cases):
        case = f"case_{i:03d}"
        seg = np.zeros(shape, dtype=np.uint8)
        # an "organ" blob and a thin "vessel" line
        cx, cy, cz = 12 + rng.randint(-2, 3), 14 + rng.randint(-2, 3), 16
        xx, yy, zz = np.mgrid[:shape[0], :shape[1], :shape[2]]
        organ = ((xx - cx) ** 2 + (yy - cy) ** 2 + (zz - cz) ** 2) < 36
        seg[organ] = 1
        seg[cx, cy, :] = 2
        for c in range(2):
            img = rng.normal(0, 0.1, shape).astype(np.float32)
            img += (seg == 1) * (1.0 + 0.2 * c) + (seg == 2) * (2.0 - 0.3 * c)
            img[:2] = 0  # border so nonzero-crop does something
            img[-2:] = 0
            write_nifti(str(ds / "imagesTr" / f"{case}_{c:04d}.nii.gz"),
                        img.T, spacing=tuple(reversed(spacing)))
        write_nifti(str(ds / "labelsTr" / f"{case}.nii.gz"), seg.T,
                    spacing=tuple(reversed(spacing)))

    generate_dataset_json(str(ds),
                          channel_names={0: "T2", 1: "TOF"},
                          labels={"background": 0, "organ": 1, "vessel": 2},
                          num_training_cases=n_cases, file_ending=".nii.gz",
                          dataset_name="Dataset001_Synth")

    monkeypatch.setenv("MVDSEG_raw", str(raw))
    monkeypatch.setenv("MVDSEG_preprocessed", str(pre))
    monkeypatch.setenv("MVDSEG_results", str(res))
    from multimodal_mvd_seg_tpu import paths
    paths.refresh()
    return {"raw": str(raw), "preprocessed": str(pre), "results": str(res),
            "dataset_name": "Dataset001_Synth", "n_cases": n_cases,
            "shape": shape, "spacing": spacing}
