"""LR-schedule variant (reference variants/lr_schedule/
nnUNetTrainerCosAnneal.py): CosineAnnealingLR over num_epochs instead of
PolyLR."""

import jax.numpy as jnp
import optax

from ..trainer import MVDSegTrainer


class nnUNetTrainerCosAnneal(MVDSegTrainer):
    def _make_optimizer(self):
        iters = self.num_iterations_per_epoch

        def schedule(step):
            epoch = jnp.minimum(step // iters, self.num_epochs - 1)
            return 0.5 * self.initial_lr * \
                (1 + jnp.cos(jnp.pi * epoch / self.num_epochs))

        return optax.chain(
            optax.clip_by_global_norm(self.grad_clip_norm),
            optax.add_decayed_weights(self.weight_decay),
            optax.sgd(schedule, momentum=0.99, nesterov=True))
