"""Deep-supervision loss wrapper.

Reconstruction of the reference's missing module
``nnunetv2.training.loss.deep_supervision`` (imported at nnUNetTrainer.py:49):
weighted sum of a loss applied to matching lists of multi-scale outputs and
targets. nnU-Net weights are 1/2^i with the coarsest scale zeroed, normalized
to sum 1 (nnUNetTrainer._build_loss, reference :351-375)."""

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np


def default_ds_weights(num_scales: int) -> np.ndarray:
    weights = np.array([1 / (2 ** i) for i in range(num_scales)])
    if num_scales > 1:
        weights[-1] = 0.0
    return weights / weights.sum()


def deep_supervision_loss(loss_fn: Callable, outputs: Sequence[jnp.ndarray],
                          targets: Sequence[jnp.ndarray],
                          weights: Sequence[float] = None) -> jnp.ndarray:
    if weights is None:
        weights = default_ds_weights(len(outputs))
    assert len(outputs) == len(targets) >= len(weights)
    total = 0.0
    for w, o, t in zip(weights, outputs, targets):
        if w == 0.0:
            continue
        total = total + w * loss_fn(o, t)
    return total


class DeepSupervisionWrapper:
    def __init__(self, loss: Callable, weight_factors: Sequence[float] = None):
        self.loss = loss
        self.weight_factors = weight_factors

    def __call__(self, outputs, targets):
        return deep_supervision_loss(self.loss, outputs, targets,
                                     self.weight_factors)
