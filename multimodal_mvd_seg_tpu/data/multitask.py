"""Multi-task data machinery: tagged samplers + switchable generator.

Parity: reference training/dataloading/switchable_dataloader.py:1-16
(``switchable_generator`` round-robin/settable generator multiplexer) and
data_loader_3d.py:51-72 (``nnUNetDataLoader3DwithTag`` — batches annotated
with the task's class-name tags), feeding the multi-task training path
(run/run_training.py:73-119,254-349).
"""

from typing import List, Sequence

import numpy as np

from .sampler import PatchSampler


class switchable_generator:
    """Multiplex several generators; ``setPart`` selects the active one
    (reference switchable_dataloader.py:1-16)."""

    def __init__(self, gens: Sequence, default_id: int = 0):
        self.gens = list(gens)
        self.cur_gen = self.gens[default_id]

    def setPart(self, idx: int):
        self.cur_gen = self.gens[idx]

    def __iter__(self):
        return self

    def __next__(self):
        return next(self.cur_gen)

    next = __next__


class PatchSamplerWithTag(PatchSampler):
    """PatchSampler whose batches carry the task's tags
    (reference nnUNetDataLoader3DwithTag)."""

    def __init__(self, *args, tags: List[str] = (), **kwargs):
        super().__init__(*args, **kwargs)
        self.tags = list(tags)

    def generate_batch(self, rng: np.random.RandomState):
        data, seg = super().generate_batch(rng)
        return data, seg, self.tags
