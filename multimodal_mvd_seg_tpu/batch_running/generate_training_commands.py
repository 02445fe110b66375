"""Cluster command generation.

Parity: reference nnunetv2/batch_running/generate_lsf_runs_customDecathlon.py
and friends — emit one training command per (dataset × configuration ×
fold × trainer × plans) cell, optionally wrapped for a scheduler. The TPU
deployment story replaces LSF `bsub -gpu` with generic wrappers (plain
shell, or any scheduler prefix the caller supplies).
"""

from itertools import product
from typing import List, Optional, Sequence, Union


def generate_training_commands(
        datasets: Sequence[Union[int, str]],
        configurations: Sequence[str] = ("2d", "3d_fullres", "3d_lowres",
                                         "3d_cascade_fullres"),
        folds: Sequence[Union[int, str]] = (0, 1, 2, 3, 4),
        trainers: Sequence[str] = ("MVDSegTrainer",),
        plans: Sequence[str] = ("nnUNetPlans",),
        num_devices: int = 1,
        extra_args: str = "") -> List[str]:
    cmds = []
    for d, c, f, tr, p in product(datasets, configurations, folds, trainers,
                                  plans):
        cmd = f"mvdseg_train {d} {c} {f} -tr {tr} -p {p}"
        if num_devices > 1:
            cmd += f" -num_gpus {num_devices}"
        if extra_args:
            cmd += f" {extra_args}"
        cmds.append(cmd)
    return cmds


def generate_lsf_commands(datasets, queue: str = "gpu.legacy",
                          site_prefix: Optional[str] = None,
                          **kwargs) -> List[str]:
    """LSF-wrapped commands (reference generate_lsf_runs_customDecathlon.py);
    ``site_prefix`` overrides the bsub boilerplate entirely."""
    prefix = site_prefix if site_prefix is not None else \
        f"bsub -q {queue} -R \"rusage[mem=32G]\" "
    return [prefix + c for c in generate_training_commands(datasets,
                                                           **kwargs)]
