"""ContrastiveNet — the MVD paper's dual-branch network (flax, channels-last).

TPU-native re-design of reference
my_network/my_network/HybridNetwork.py:1364-1578 (ContrastiveNet):

- shared 2-channel UNETR++ transformer encoder (UnetrPPEncoderv1 layout:
  dims [32,64,128,512], stem stride (2,2,2), stage-3 downsample (2,4,4));
- bottleneck channel-split 256/256 into the T2 and TOF branches (:1547);
- per-branch UNETR++ decoder chains with additive skips from the shared
  hidden states and a full-resolution UnetResBlock stem computed on the T2
  channel (:1410-1417,1548);
- 3 deep-supervision heads per branch (:1493-1499,1565-1567);
- projection/prediction MLP heads (16→16, BN+ReLU) and 2×num_classes
  learned sigmoid "selector" MLPs (:1500-1542) used by the contrastive
  memory machinery (losses/contrastive.py, losses/feature_memory.py).

The reference forward has a known bug — branch 2's decoder chain feeds
branch 1's activations (dec3/dec2/dec1 instead of dec3_/dec2_/dec1_ at
HybridNetwork.py:1562-1564, SURVEY.md §0). We implement the intended
wiring by default; ``branch2_wiring="reference"`` reproduces the
reference's literal dataflow — required when replaying checkpoints whose
branch-2 decoders were *trained* on branch-1 activations
(model_sharing/torch_import.py sets it on imported folders).

``__call__(data, train)`` returns ``(logits_list1, logits_list2, fea1,
fea2)`` when ``do_ds`` (lists finest-first, channels-last logits in fp32)
and the branch-1 full-resolution logits otherwise. The auxiliary heads are
reachable through ``method=``-dispatch: ``project``, ``predict`` and
``selector_scores`` (see MVD trainer).
"""

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import s2d as _s2d
from .unetrpp import (UnetOutBlockCF, UnetResBlockCF, UnetrPPEncoderCF,
                      UnetrUpBlockCF)

_trunc02 = nn.initializers.truncated_normal(stddev=0.02)


class MLPHead(nn.Module):
    """Linear → BatchNorm → ReLU → Linear over feature rows (N, F).

    Matches the reference's nn.Sequential(Linear, BatchNorm1d, ReLU, Linear)
    projection/prediction heads (HybridNetwork.py:1500-1525). BatchNorm
    statistics are computed over the row axis; ``train=False`` uses the
    running averages (the reference inserts memory features under
    eval-mode heads, MVDTrainer.py:949-953).
    """
    features: int
    out_features: int
    negative_slope: float = 0.0  # 0 → ReLU; selectors use LeakyReLU(0.2)

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = x.astype(jnp.float32)
        x = nn.Dense(self.features, kernel_init=_trunc02, name="fc1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        x = nn.leaky_relu(x, negative_slope=self.negative_slope) \
            if self.negative_slope else nn.relu(x)
        return nn.Dense(self.out_features, kernel_init=_trunc02,
                        name="fc2")(x)


class ContrastiveNet(nn.Module):
    input_channels: int = 2
    num_classes: int = 4
    feature_size: int = 16
    num_heads: int = 4
    depths: Sequence[int] = (3, 3, 3, 3)
    encoder_dims: Sequence[int] = (32, 64, 128, 512)
    proj_size: Sequence[int] = (64, 64, 64, 32)
    do_ds: bool = True
    feat_dim: int = 16  # projection/prediction/selector width (dim_in=16)
    # checkpoint the transformer/decoder blocks: required to fit the paper's
    # 2-ch 64×128×256 batch-2 training step in 16G HBM
    remat: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    # full-resolution blocks run in the space-to-depth domain (ops/s2d.py):
    # feature_size=16 channels would otherwise lane-pad 8x on TPU. Factors
    # (2,2,2) lift them to C=128 cell convs. Pass None (the factory does
    # this for non-divisible patches) to use plain channels-first blocks.
    s2d_factors: Optional[Sequence[int]] = (2, 2, 2)
    # cell layout of those s2d stages: "NC" = (B, C*F, *cells), "NL" =
    # (B, *cells, C*F) — the TPU conv's native layout (C*F = 128 pads
    # nothing there). The stem ENTERS in NC regardless (its s2d input has
    # C*F = 8, which channels-last would lane-pad 16x); in NL the seg
    # heads emit channels-last logits directly (no full-res relayout).
    s2d_layout: str = "NC"
    # "fixed" (each branch consumes its own activations) or "reference"
    # (the literal HybridNetwork.py:1562-1564 dataflow — see module
    # docstring; imported torch checkpoints need this)
    branch2_wiring: str = "fixed"
    # EPA out-projection biases (EPACF.out_bias); imported torch
    # checkpoints carry them, fresh trainings keep the round-1 tree
    epa_out_bias: bool = False

    def setup(self):
        fs = self.feature_size
        self.share_encoder = UnetrPPEncoderCF(
            dims=tuple(self.encoder_dims), proj_size=tuple(self.proj_size),
            depths=tuple(self.depths), num_heads=self.num_heads,
            in_channels=self.input_channels, stem_stride=(2, 2, 2),
            stage_strides=((2, 2, 2), (2, 2, 2), (2, 4, 4)),
            remat=self.remat, dtype=self.dtype,
            epa_out_bias=self.epa_out_bias)

        def up(out_ch, stride, conv_decoder=False, proj=64, s2d=None):
            return UnetrUpBlockCF(out_channels=out_ch, upsample_stride=stride,
                                  proj_size=proj, num_heads=self.num_heads,
                                  conv_decoder=conv_decoder,
                                  s2d_factors=s2d, remat=self.remat,
                                  s2d_layout=self.s2d_layout,
                                  epa_out_bias=self.epa_out_bias,
                                  dtype=self.dtype)

        sf = None if self.s2d_factors is None else tuple(self.s2d_factors)
        # full-resolution stem on the T2 channel (enters NC — see
        # s2d_layout note — and leaves in the stage layout)
        self.encoder1 = UnetResBlockCF(fs, kernel_size=3, s2d_factors=sf,
                                       s2d_layout=self.s2d_layout,
                                       s2d_layout_in="NC",
                                       dtype=self.dtype)

        # branch 1 (T2): 256 → 128 → 64 → 32 → 16
        self.decoder5 = up(fs * 8, (2, 4, 4))
        self.decoder4 = up(fs * 4, (2, 2, 2))
        self.decoder3 = up(fs * 2, (2, 2, 2))
        self.decoder2 = up(fs, (2, 2, 2), conv_decoder=True, s2d=sf)
        # branch 2 (TOF)
        self.decoder5_ = up(fs * 8, (2, 4, 4))
        self.decoder4_ = up(fs * 4, (2, 2, 2))
        self.decoder3_ = up(fs * 2, (2, 2, 2))
        self.decoder2_ = up(fs, (2, 2, 2), conv_decoder=True, s2d=sf)

        self.out1 = UnetOutBlockCF(self.num_classes, s2d_factors=sf,
                                   s2d_layout=self.s2d_layout)
        self.out1_ = UnetOutBlockCF(self.num_classes, s2d_factors=sf,
                                    s2d_layout=self.s2d_layout)
        if self.do_ds:
            self.out2 = UnetOutBlockCF(self.num_classes)
            self.out3 = UnetOutBlockCF(self.num_classes)
            self.out2_ = UnetOutBlockCF(self.num_classes)
            self.out3_ = UnetOutBlockCF(self.num_classes)

        fd = self.feat_dim
        self.projection_head1 = MLPHead(fd, fd)
        self.projection_head2 = MLPHead(fd, fd)
        self.prediction_head1 = MLPHead(fd, fd)
        self.prediction_head2 = MLPHead(fd, fd)
        self.selectors = [MLPHead(fd, 1, negative_slope=0.2,
                                  name=f"contrastive_class_selector_{c}")
                          for c in range(self.num_classes)]
        self.selectors_memory = [
            MLPHead(fd, 1, negative_slope=0.2,
                    name=f"contrastive_class_selector_memory{c}")
            for c in range(self.num_classes)]

    def __call__(self, data, *, train: bool = True):
        # channels-last boundary, channels-first (+s2d) execution inside
        xc = jnp.moveaxis(data, -1, 1)
        sf = None if self.s2d_factors is None else tuple(self.s2d_factors)
        if sf is not None:
            assert all(d % (2 * f) == 0
                       for d, f in zip(xc.shape[2:], sf)), \
                (xc.shape, sf, "pass s2d_factors=None for this patch")
        bottleneck, hidden = self.share_encoder(xc, train=train)
        half = bottleneck.shape[1] // 2
        fea1, fea2 = bottleneck[:, :half], bottleneck[:, half:]
        stem_in = xc[:, 0:1]
        if sf is not None:
            stem_in = _s2d.space_to_depth(stem_in, sf)
        stem = self.encoder1(stem_in, train=train)
        enc1, enc2, enc3 = hidden[0], hidden[1], hidden[2]

        dec3 = self.decoder5(fea1, enc3, train=train)
        dec2 = self.decoder4(dec3, enc2, train=train)
        dec1 = self.decoder3(dec2, enc1, train=train)
        out = self.decoder2(dec1, stem, train=train)

        dec3_ = self.decoder5_(fea2, enc3, train=train)
        if self.branch2_wiring == "reference":
            # literal HybridNetwork.py:1562-1564 dataflow: decoder4_/3_/2_
            # consume BRANCH-1 activations (see module docstring)
            dec2_ = self.decoder4_(dec3, enc2, train=train)
            dec1_ = self.decoder3_(dec2, enc1, train=train)
            out_ = self.decoder2_(dec1, stem, train=train)
        else:
            dec2_ = self.decoder4_(dec3_, enc2, train=train)
            dec1_ = self.decoder3_(dec2_, enc1, train=train)
            out_ = self.decoder2_(dec1_, stem, train=train)

        def cl(t):  # channels-first fp32 logits -> channels-last
            return jnp.moveaxis(t, 1, -1)

        nl = sf is not None and self.s2d_layout == "NL"
        # in NL the full-res heads/features come out channels-last already
        cl1 = (lambda t: t) if nl else cl

        def full_res_fea(t):
            if sf is None:
                return cl(t)
            if nl:
                return _s2d.depth_to_space_cl(t, sf)
            return cl(_s2d.depth_to_space(t, sf))

        if self.do_ds:
            logits = [cl1(self.out1(out)), cl(self.out2(dec1)),
                      cl(self.out3(dec2))]
            logits_ = [cl1(self.out1_(out_)), cl(self.out2_(dec1_)),
                       cl(self.out3_(dec2_))]
            return logits, logits_, full_res_fea(out), full_res_fea(out_)
        return cl1(self.out1(out))

    def forward_vessel1(self, data, *, train: bool = True):
        """Branch-1 full-resolution logits only — the two-phase topological
        probe's forward. Runs the shared encoder + stem + branch-1 decoder
        chain exactly as ``__call__`` does (flax derives each Dropout's rng
        from its module path, so the branch-1 activations are BITWISE the
        ones the train step's dual forward produces with the same rng) while
        skipping branch 2 and the deep-supervision heads — roughly half the
        probe's decoder cost."""
        xc = jnp.moveaxis(data, -1, 1)
        sf = None if self.s2d_factors is None else tuple(self.s2d_factors)
        bottleneck, hidden = self.share_encoder(xc, train=train)
        half = bottleneck.shape[1] // 2
        fea1 = bottleneck[:, :half]
        stem_in = xc[:, 0:1]
        if sf is not None:
            stem_in = _s2d.space_to_depth(stem_in, sf)
        stem = self.encoder1(stem_in, train=train)
        enc1, enc2, enc3 = hidden[0], hidden[1], hidden[2]
        dec3 = self.decoder5(fea1, enc3, train=train)
        dec2 = self.decoder4(dec3, enc2, train=train)
        dec1 = self.decoder3(dec2, enc1, train=train)
        out = self.decoder2(dec1, stem, train=train)
        logits = self.out1(out)
        if sf is not None and self.s2d_layout == "NL":
            return logits  # channels-last already (see UnetOutBlockCF)
        return jnp.moveaxis(logits, 1, -1)

    def init_all(self, data, *, train: bool = False):
        """Initialization entry point: traces the dual forward AND every
        auxiliary head so ``init(..., method="init_all")`` creates all
        parameters (flax only materializes params for traced modules)."""
        out = self(data, train=train)
        dummy = jnp.zeros((2, self.feat_dim), jnp.float32)
        for branch in (1, 2):
            proj = self.project(dummy, branch, train=train)
            self.predict(proj, branch, train=train)
        self.selector_scores(dummy, memory=False, train=train)
        self.selector_scores(dummy, memory=True, train=train)
        return out

    # ---- auxiliary heads (invoked via network.apply(..., method=...)) ----

    def project(self, feats, branch: int, *, train: bool = True):
        """Projection head on feature rows (N, feat_dim); branch 1=T2, 2=TOF."""
        head = self.projection_head1 if branch == 1 else self.projection_head2
        return head(feats, train=train)

    def predict(self, feats, branch: int, *, train: bool = True):
        head = self.prediction_head1 if branch == 1 else self.prediction_head2
        return head(feats, train=train)

    def selector_scores(self, feats, *, memory: bool = False,
                        train: bool = True):
        """Stacked per-class selector logits: (num_classes, N, 1)."""
        heads = self.selectors_memory if memory else self.selectors
        return jnp.stack([h(feats, train=train) for h in heads], 0)
