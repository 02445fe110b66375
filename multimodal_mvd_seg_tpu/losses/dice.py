"""Soft Dice loss and tp/fp/fn/tn accounting.

Reconstruction of the reference's missing module
``nnunetv2.training.loss.dice`` (imported at nnUNetTrainer.py:50,
MVDTrainer.py:50; see SURVEY.md §0) from upstream nnU-Net v2.1.1 semantics:
``get_tp_fp_fn_tn`` and a memory-efficient soft Dice with optional batch dice.
Pure functions over channels-last arrays: logits/probs (b, *spatial, c),
targets as integer labelmaps (b, *spatial) or one-hot (b, *spatial, c).

Under pjit the DDP all-gather of tp/fp/fn (upstream ``AllGatherGrad``,
reference utilities/ddp_allgather.py:25-48) is unnecessary: the arrays are
sharded over the batch axis and the sums below compile to psums over the mesh."""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def one_hot(target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(b, *spatial) int → (b, *spatial, c) float."""
    return jax.nn.one_hot(target, num_classes, dtype=jnp.float32)


def get_tp_fp_fn_tn(probs: jnp.ndarray, target: jnp.ndarray,
                    axes: Optional[Tuple[int, ...]] = None,
                    mask: Optional[jnp.ndarray] = None,
                    square: bool = False):
    """probs: (b, *spatial, c) after nonlin. target: int labelmap
    (b, *spatial) or one-hot (b, *spatial, c). axes: reduction axes
    (default: spatial only → per-sample per-class stats)."""
    num_classes = probs.shape[-1]
    if target.ndim == probs.ndim - 1:
        y_onehot = one_hot(target, num_classes)
    else:
        y_onehot = target.astype(jnp.float32)
    probs = probs.astype(jnp.float32)

    if axes is None:
        axes = tuple(range(1, probs.ndim - 1))

    tp = probs * y_onehot
    fp = probs * (1 - y_onehot)
    fn = (1 - probs) * y_onehot
    tn = (1 - probs) * (1 - y_onehot)

    if mask is not None:
        m = mask.astype(jnp.float32)[..., None]
        tp, fp, fn, tn = tp * m, fp * m, fn * m, tn * m
    if square:
        tp, fp, fn, tn = tp ** 2, fp ** 2, fn ** 2, tn ** 2

    return (tp.sum(axes), fp.sum(axes), fn.sum(axes), tn.sum(axes))


def soft_dice_loss(logits: jnp.ndarray, target: jnp.ndarray,
                   batch_dice: bool = False, do_bg: bool = False,
                   smooth: float = 1e-5,
                   apply_nonlin: str = "softmax",
                   mask: Optional[jnp.ndarray] = None,
                   ddp_axis_name: Optional[str] = None) -> jnp.ndarray:
    """Memory-efficient soft Dice (upstream MemoryEfficientSoftDiceLoss
    semantics). Returns -mean(dice) over (foreground) classes.

    ddp_axis_name: if set, tp/fp/fn are psum-reduced over that mesh axis
    before the dice quotient (the pjit analogue of the reference's batch-dice
    DDP all-gather)."""
    if apply_nonlin == "softmax":
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    elif apply_nonlin == "sigmoid":
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    else:
        probs = logits.astype(jnp.float32)

    axes = (0,) + tuple(range(1, probs.ndim - 1)) if batch_dice \
        else tuple(range(1, probs.ndim - 1))
    # NOTE perf: a gather+segment_sum formulation of tp/fp/fn was measured
    # SLOWER on v5e (TPU scatter-add), despite 4x fewer dense products. The
    # fast dense form below uses ONE bf16 product with fp32 accumulation and
    # derives fp/fn from the marginals (fp = Σp − tp, fn = Σy − tp), instead
    # of the four fp32 products of get_tp_fp_fn_tn.
    if target.ndim == probs.ndim - 1:
        num_classes = probs.shape[-1]
        y1h = jax.nn.one_hot(jnp.clip(target, 0, num_classes - 1),
                             num_classes, dtype=jnp.bfloat16)
        if mask is not None:
            y1h = y1h * mask.astype(jnp.bfloat16)[..., None]
            probs_m = probs * mask.astype(jnp.float32)[..., None]
        else:
            probs_m = probs
        tp = (probs_m.astype(jnp.bfloat16) * y1h).sum(
            axes, dtype=jnp.float32)
        sum_p = probs_m.sum(axes)
        sum_y = y1h.sum(axes, dtype=jnp.float32)
        fp = sum_p - tp
        fn = sum_y - tp
    else:
        tp, fp, fn, _ = get_tp_fp_fn_tn(probs, target, axes=axes, mask=mask)
    if ddp_axis_name is not None and batch_dice:
        tp = jax.lax.psum(tp, ddp_axis_name)
        fp = jax.lax.psum(fp, ddp_axis_name)
        fn = jax.lax.psum(fn, ddp_axis_name)

    if not do_bg:
        tp, fp, fn = tp[..., 1:], fp[..., 1:], fn[..., 1:]

    nominator = 2 * tp
    denominator = 2 * tp + fp + fn
    dc = (nominator + smooth) / jnp.clip(denominator + smooth, 1e-8)
    return -dc.mean()


class MemoryEfficientSoftDiceLoss:
    """Thin callable wrapper matching the reference class surface
    (nnUNetTrainer._build_loss passes batch_dice/do_bg/smooth/ddp kwargs)."""

    def __init__(self, apply_nonlin: str = "softmax", batch_dice: bool = False,
                 do_bg: bool = False, smooth: float = 1e-5, ddp: bool = False,
                 ddp_axis_name: Optional[str] = None):
        self.apply_nonlin = apply_nonlin
        self.batch_dice = batch_dice
        self.do_bg = do_bg
        self.smooth = smooth
        self.ddp_axis_name = ddp_axis_name if ddp else None

    def __call__(self, logits, target, loss_mask=None):
        return soft_dice_loss(logits, target, batch_dice=self.batch_dice,
                              do_bg=self.do_bg, smooth=self.smooth,
                              apply_nonlin=self.apply_nonlin, mask=loss_mask,
                              ddp_axis_name=self.ddp_axis_name)
