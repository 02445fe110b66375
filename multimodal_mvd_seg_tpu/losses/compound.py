"""Compound Dice+CE / Dice+BCE losses.

Reconstruction of the reference's missing module
``nnunetv2.training.loss.compound_losses`` (imported at nnUNetTrainer.py:48,
MVDTrainer.py:48; SURVEY.md §0) from upstream nnU-Net v2.1.1 semantics,
including ignore-label masking."""

from typing import Optional

import jax
import jax.numpy as jnp

from .dice import soft_dice_loss
from .robust_ce import cross_entropy_loss


class DC_and_CE_loss:
    """weight_dice * softDice + weight_ce * CE; with ignore_label, both terms
    are restricted to annotated voxels and the target is cleaned to background
    at ignored positions (upstream compound_losses.DC_and_CE_loss)."""

    def __init__(self, batch_dice: bool = False, do_bg: bool = False,
                 smooth: float = 1e-5, weight_ce: float = 1.0,
                 weight_dice: float = 1.0, ignore_label: Optional[int] = None,
                 ddp_axis_name: Optional[str] = None):
        self.batch_dice = batch_dice
        self.do_bg = do_bg
        self.smooth = smooth
        self.weight_ce = weight_ce
        self.weight_dice = weight_dice
        self.ignore_label = ignore_label
        self.ddp_axis_name = ddp_axis_name

    def __call__(self, logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """logits (b, *spatial, c); target int (b, *spatial)."""
        mask = None
        if self.ignore_label is not None:
            mask = (target != self.ignore_label)
            target = jnp.where(mask, target, 0)
        if self.weight_dice != 0 and self.weight_ce != 0:
            return self._fused_cf(logits, target, mask)
        dc = soft_dice_loss(logits, target, batch_dice=self.batch_dice,
                            do_bg=self.do_bg, smooth=self.smooth,
                            apply_nonlin="softmax", mask=mask,
                            ddp_axis_name=self.ddp_axis_name) \
            if self.weight_dice != 0 else 0.0
        ce = cross_entropy_loss(logits, target, mask=mask) \
            if self.weight_ce != 0 else 0.0
        return self.weight_dice * dc + self.weight_ce * ce

    def _fused_cf(self, logits, target, mask):
        """Shared-softmax Dice+CE computed in a (b, c, voxels) layout.

        The class axis of segmentation logits is tiny (e.g. 5); in the
        natural channels-last layout it lands on the TPU's 128-lane minor
        dimension and every elementwise op pays up to 25x lane padding —
        measured 85 ms for the deep-supervision loss stack on the 3d_fullres
        benchmark shape. Flattening voxels minor makes the class axis a
        sublane dim (pads 5->8) and the whole stack fuses into a handful of
        full-bandwidth passes (measured ~8x faster end-to-end)."""
        b, c = logits.shape[0], logits.shape[-1]
        lg = jnp.swapaxes(logits.reshape(b, -1, c), 1, 2)  # (b, c, V)
        lg = lg.astype(jnp.float32)
        logp = jax.nn.log_softmax(lg, axis=1)
        probs = jnp.exp(logp)
        tgt = jnp.clip(target, 0, c - 1).astype(jnp.int32).reshape(b, 1, -1)
        y = (tgt == jnp.arange(c, dtype=jnp.int32).reshape(1, c, 1))
        yf = y.astype(jnp.float32)
        axes = (0, 2) if self.batch_dice else (2,)
        if mask is not None:
            mf = mask.reshape(b, 1, -1).astype(jnp.float32)
            yf = yf * mf
            probs_m = probs * mf
        else:
            probs_m = probs
        tp = jnp.sum(probs_m * yf, axis=axes)
        fp = jnp.sum(probs_m, axis=axes) - tp
        fn = jnp.sum(yf, axis=axes) - tp
        if self.ddp_axis_name is not None and self.batch_dice:
            tp = jax.lax.psum(tp, self.ddp_axis_name)
            fp = jax.lax.psum(fp, self.ddp_axis_name)
            fn = jax.lax.psum(fn, self.ddp_axis_name)
        if not self.do_bg:
            tp, fp, fn = tp[..., 1:], fp[..., 1:], fn[..., 1:]
        dc = -jnp.mean((2 * tp + self.smooth)
                       / jnp.clip(2 * tp + fp + fn + self.smooth, 1e-8))
        nll = -jnp.sum(logp * yf, axis=1)          # (b, V); mask folded in yf
        if mask is not None:
            ce = nll.sum() / jnp.clip(mf.sum(), 1.0)
        else:
            ce = nll.mean()
        return self.weight_dice * dc + self.weight_ce * ce


class DC_and_BCE_loss:
    """Sigmoid Dice + binary cross-entropy for region-based training; target is
    multi-hot (b, *spatial, c). With ignore label the mask arrives as the last
    target channel (upstream compound_losses.DC_and_BCE_loss)."""

    def __init__(self, batch_dice: bool = True, do_bg: bool = True,
                 smooth: float = 1e-5, weight_ce: float = 1.0,
                 weight_dice: float = 1.0, use_ignore_label: bool = False,
                 ddp_axis_name: Optional[str] = None):
        self.batch_dice = batch_dice
        self.do_bg = do_bg
        self.smooth = smooth
        self.weight_ce = weight_ce
        self.weight_dice = weight_dice
        self.use_ignore_label = use_ignore_label
        self.ddp_axis_name = ddp_axis_name

    def __call__(self, logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        if self.use_ignore_label:
            mask = (1.0 - target[..., -1:]).astype(jnp.float32)
            target = target[..., :-1]
        else:
            mask = None
        target = target.astype(jnp.float32)
        dc = soft_dice_loss(logits, target, batch_dice=self.batch_dice,
                            do_bg=self.do_bg, smooth=self.smooth,
                            apply_nonlin="sigmoid",
                            mask=None if mask is None else mask[..., 0],
                            ddp_axis_name=self.ddp_axis_name)
        logits = logits.astype(jnp.float32)
        bce_el = (jnp.maximum(logits, 0) - logits * target +
                  jnp.log1p(jnp.exp(-jnp.abs(logits))))
        if mask is not None:
            # upstream nnU-Net: (bce*mask).sum() / mask.sum() — the mask
            # counts each voxel ONCE while bce sums over region channels,
            # so no extra channel factor in the denominator (dividing by
            # mask.sum()*C would weight CE 1/C of the reference run)
            bce = (bce_el * mask).sum() / jnp.clip(mask.sum(), 1e-8)
        else:
            bce = bce_el.mean()
        return self.weight_dice * dc + self.weight_ce * bce
