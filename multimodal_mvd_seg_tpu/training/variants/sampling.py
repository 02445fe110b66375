"""Sampling variant (reference variants/sampling/
nnUNetTrainer_probabilisticOversampling.py): every sample is foreground-
forced with probability p instead of forcing the last round(bs·p) batch
positions."""

from ..trainer import MVDSegTrainer


class nnUNetTrainer_probabilisticOversampling(MVDSegTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.probabilistic_oversampling = True
