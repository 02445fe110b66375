"""Optimizer variants (reference variants/optimizer/): Adam (lr 3e-4,
wd 3e-5) and Adan."""

import optax

from ..trainer import MVDSegTrainer
from .lr_schedule import jnp  # noqa: F401  (shared import surface)


class nnUNetTrainerAdam(MVDSegTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.initial_lr = 3e-4  # reference nnUNetTrainerAdam / VanillaRAdam

    def _make_optimizer(self):
        iters = self.num_iterations_per_epoch
        from ..lr_scheduler import poly_lr

        def schedule(step):
            import jax.numpy as jnp
            epoch = jnp.minimum(step // iters, self.num_epochs - 1)
            return poly_lr(self.initial_lr, epoch, self.num_epochs)

        return optax.chain(
            optax.clip_by_global_norm(self.grad_clip_norm),
            optax.adamw(schedule, weight_decay=self.weight_decay))


class nnUNetTrainerAdan(MVDSegTrainer):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.initial_lr = 1e-3  # reference nnUNetTrainerAdan

    def _make_optimizer(self):
        iters = self.num_iterations_per_epoch
        from ..lr_scheduler import poly_lr

        def schedule(step):
            import jax.numpy as jnp
            epoch = jnp.minimum(step // iters, self.num_epochs - 1)
            return poly_lr(self.initial_lr, epoch, self.num_epochs)

        return optax.chain(
            optax.clip_by_global_norm(self.grad_clip_norm),
            optax.adan(schedule, weight_decay=self.weight_decay))
