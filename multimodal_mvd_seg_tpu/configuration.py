"""Global configuration knobs.

Parity: reference nnunetv2/configuration.py:1-10 and
nnunetv2/utilities/default_n_proc_DA.py. On TPU the data-augmentation worker
count controls the host-side prefetch pipeline width, not a process pool of
batchgenerators workers (augmentation itself is fused on-device XLA)."""

import os

default_num_processes = int(os.environ.get(
    "MVDSEG_def_n_proc", os.environ.get("nnUNet_def_n_proc", 8)))

# anisotropy threshold: spacing ratio beyond which resampling treats the
# low-resolution axis separately (reference configuration.py:8, value 3)
ANISO_THRESHOLD = 3


def get_allowed_n_proc_DA() -> int:
    """Host-side input-pipeline parallelism (reference default_n_proc_DA.py)."""
    v = os.environ.get("MVDSEG_n_proc_DA", os.environ.get("nnUNet_n_proc_DA"))
    if v is not None:
        return int(v)
    return min(12, os.cpu_count() or 8)
