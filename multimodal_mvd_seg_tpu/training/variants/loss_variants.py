"""Loss trainer variants (reference variants/loss/): CE-only, Dice-only,
Dice+TopK10."""

from ...losses.deep_supervision import DeepSupervisionWrapper, default_ds_weights
from ...losses.dice import MemoryEfficientSoftDiceLoss
from ...losses.robust_ce import cross_entropy_loss, topk_loss
from ..trainer import MVDSegTrainer


class _CEOnly:
    def __init__(self, ignore_label=None):
        self.ignore_label = ignore_label

    def __call__(self, logits, target):
        mask = None
        if self.ignore_label is not None:
            mask = target != self.ignore_label
            import jax.numpy as jnp
            target = jnp.where(mask, target, 0)
        return cross_entropy_loss(logits, target, mask=mask)


class _DiceOnly:
    def __init__(self, batch_dice, ignore_label=None):
        self.loss = MemoryEfficientSoftDiceLoss(batch_dice=batch_dice,
                                                do_bg=False)
        self.ignore_label = ignore_label

    def __call__(self, logits, target):
        import jax.numpy as jnp
        mask = None
        if self.ignore_label is not None:
            mask = target != self.ignore_label
            target = jnp.where(mask, target, 0)
        return self.loss(logits, target, loss_mask=mask)


class _DiceTopK10:
    def __init__(self, batch_dice, ignore_label=None):
        self.dice = _DiceOnly(batch_dice, ignore_label)
        self.ignore_label = ignore_label

    def __call__(self, logits, target):
        import jax.numpy as jnp
        mask = None
        if self.ignore_label is not None:
            mask = target != self.ignore_label
            target = jnp.where(mask, target, 0)
        return self.dice(logits, target) + \
            topk_loss(logits, target, k_percent=10.0, mask=mask)


class _LossOverrideMixin(MVDSegTrainer):
    _loss_factory = None

    def _build_loss(self):
        assert not self.label_manager.has_regions, \
            f"regions not supported by {self.__class__.__name__}"
        base = type(self)._loss_factory(self)
        if self.enable_deep_supervision:
            return DeepSupervisionWrapper(
                base, default_ds_weights(len(self._ds_scales())))
        return base


class nnUNetTrainerCELoss(_LossOverrideMixin):
    def _loss_factory(self):
        return _CEOnly(self.label_manager.ignore_label)


class nnUNetTrainerDiceLoss(_LossOverrideMixin):
    def _loss_factory(self):
        return _DiceOnly(self.configuration_manager.batch_dice,
                         self.label_manager.ignore_label)


class nnUNetTrainerTopkLoss(_LossOverrideMixin):
    def _loss_factory(self):
        return _DiceTopK10(self.configuration_manager.batch_dice,
                           self.label_manager.ignore_label)
