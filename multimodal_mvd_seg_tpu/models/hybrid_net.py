"""HybridNet family — dual modality-specific CNN encoders + shared UNETR++
transformer encoder with gated feature fusion.

Parity: reference my_network/my_network/HybridNetwork.py:17-1363
(EnhancedFeature :17-49, HybridNet :52-246, HybridNet_v1…_v6 :248-1363,
UnetrPPEncoder_fusion :1743, Fusion_layer :1839). The v1…v6 classes are the
paper's early design iterations of what became ContrastiveNet; they share
one mechanism set — per-modality PlainConvEncoders, a shared UNETR++
encoder run per modality, sigmoid-gated EnhancedFeature fusion of
(shared, specific₁, specific₂), bottleneck contrastive projections (f/g
heads) and modality classifiers (t/classifier heads), and a UNETR++ decoder
chain over modality-1's hidden states with a full-resolution UnetResBlock
stem. The TPU rebuild expresses that mechanism set once, parameterized, and
binds the six variant names to their distinguishing configurations
(skip source / fusion scheme), rather than shipping six 200-line copies.

Forward (do_ds): ``(logits_list, f1_contra, f2_contra, f1_clasf, f2_clasf)``
— logits finest-first; contra vectors (B, 256); classifier logits (B, 1)
(reference :196-246).
"""

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .unet import PlainConvEncoder
from .unetrpp import UnetOutBlock, UnetResBlock, UnetrPPEncoder, UnetrUpBlock


class EnhancedFeature(nn.Module):
    """Sigmoid-gated fusion of two feature maps, optionally conditioned on a
    third (reference HybridNetwork.py:17-49)."""
    in_chans: int
    is_first: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x0, x1, x2, *, train: bool = True):
        dim = x1.ndim - 2

        def conv_bn_relu(x, name):
            x = nn.Conv(self.in_chans, (3,) * dim, padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        name=name + "_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=jnp.float32, name=name + "_bn")(x)
            return nn.relu(x)

        w = jax.nn.sigmoid(conv_bn_relu(jnp.concatenate([x1, x2], -1),
                                        "conv1"))
        feat1 = x1.astype(jnp.float32) * w
        feat2 = x2.astype(jnp.float32) * w
        mixed = conv_bn_relu((feat1 + feat2).astype(self.dtype), "conv2")
        x = conv_bn_relu(jnp.concatenate(
            [mixed.astype(self.dtype), x1.astype(self.dtype),
             x2.astype(self.dtype)], -1), "conv3")
        if not self.is_first:
            x = conv_bn_relu(jnp.concatenate(
                [x0.astype(self.dtype), x.astype(self.dtype)], -1), "conv")
        return x.astype(self.dtype)


class _MLP(nn.Module):
    sizes: Sequence[int]
    batch_norm: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = x.astype(jnp.float32)
        for i, s in enumerate(self.sizes):
            x = nn.Dense(s, name=f"fc{i}")(x)
            if i < len(self.sizes) - 1:
                if self.batch_norm:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, dtype=jnp.float32,
                                     name=f"bn{i}")(x)
                x = nn.relu(x)
        return x


class HybridNet(nn.Module):
    """The parameterized family base (reference HybridNet :52-246).

    The knobs below span the six design iterations HybridNet_v1..v6
    (reference :248-1363). All variants share one mechanism set — modality-
    specific CNN encoders, a shared UNETR++ transformer encoder, bottleneck
    contrastive projections f→g (:162-172) and modality classifiers
    t→classifier (:173-192), a concat+projection bottleneck fusion, and a
    UNETR++ decoder with a full-resolution UnetResBlock stem — and differ in
    how the shared encoder is applied, where the specific features come
    from, and how skips are routed/fused:

    ===== =============== ============ ======================= =============
    vari  share_mode      spe_mode     decoder_source          extras
    ===== =============== ============ ======================= =============
    base  per_modality    bottleneck   trans_hidden            enhanced
                                                               bottleneck
    v1    per_modality    skips        cnn_skips (UNetDecoder) (:354-400;
                                                               as shipped its
                                                               UNETR++ path
                                                               is commented
                                                               and the
                                                               return is
                                                               broken — we
                                                               implement the
                                                               working
                                                               CNN-decoder
                                                               intent)
    v2    per_modality    bottleneck   trans_hidden            proj_residual
                                                               (:562-563)
    v3    dual transformer encoders + per-stage EnhancedFeature fusion
          (UnetrPPEncoder_fusion :1743-1838); decoder over fused hidden
          states (shipped forward passes the encoder tuple as a skip — we
          implement the coherent intent)
    v4    joint (2ch,     bottleneck   trans_hidden            —
          split 256/256)
    v5    joint           skips        trans_hidden            skip_fusion=
                                                               enhanced
                                                               (:1122-1129)
    v6    joint           skips        trans_hidden            — ("modified
                                                               based on v5;
                                                               no decoder
                                                               fusion",
                                                               :1301)
    ===== =============== ============ ======================= =============
    """
    num_classes: int = 4
    feature_size: int = 16
    hidden_size: int = 256
    num_heads: int = 4
    depths: Sequence[int] = (3, 3, 3, 3)
    encoder_dims: Sequence[int] = (32, 64, 128, 256)
    cnn_features: Sequence[int] = (32, 64, 128, 256, 256)
    cnn_strides: Sequence[Sequence[int]] = (
        (1, 1, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 4, 4))
    stem_stride: Sequence[int] = (2, 4, 4)
    do_ds: bool = True
    # ----- variant knobs (defaults = the reference base HybridNet) -----
    share_mode: str = "per_modality"   # per_modality | joint | dual_trans
    spe_mode: str = "bottleneck"       # bottleneck | skips | none
    decoder_source: str = "trans_hidden"   # trans_hidden | cnn_skips
    bottleneck_fusion: str = "enhanced"    # enhanced | concat_proj
    proj_residual: bool = False        # v2: fea_proj += fea_sha (:562-563)
    skip_fusion: str = "none"          # none | enhanced (v5)
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        fs = self.feature_size
        n = len(self.cnn_features)
        if self.spe_mode != "none":
            self.spe_encoder1 = PlainConvEncoder(
                self.cnn_features, [2] * n, [[3, 3, 3]] * n,
                self.cnn_strides, dtype=self.dtype)
            self.spe_encoder2 = PlainConvEncoder(
                self.cnn_features, [2] * n, [[3, 3, 3]] * n,
                self.cnn_strides, dtype=self.dtype)

        dims = tuple(self.encoder_dims)
        if self.share_mode == "joint":
            # joint 2-channel encoder; bottleneck split in half, like
            # ContrastiveNet (reference v4/v5/v6 dims (..., 2*hidden))
            dims = dims[:-1] + (2 * self.hidden_size,)
            self.share_encoder = UnetrPPEncoder(
                dims=dims, depths=tuple(self.depths),
                num_heads=self.num_heads, in_channels=2,
                stem_stride=tuple(self.stem_stride), dtype=self.dtype)
        elif self.share_mode == "dual_trans":
            self.share_encoder = UnetrPPEncoder(
                dims=dims, depths=tuple(self.depths),
                num_heads=self.num_heads, in_channels=1,
                stem_stride=tuple(self.stem_stride), dtype=self.dtype)
            self.share_encoder2 = UnetrPPEncoder(
                dims=dims, depths=tuple(self.depths),
                num_heads=self.num_heads, in_channels=1,
                stem_stride=tuple(self.stem_stride), dtype=self.dtype)
            # per-stage fusion of the two modality hidden lists
            self.trans_fusions = [
                EnhancedFeature(dims[i], is_first=(i == 0),
                                dtype=self.dtype, name=f"trans_fusion{i}")
                for i in range(len(dims))]
        else:
            self.share_encoder = UnetrPPEncoder(
                dims=dims, depths=tuple(self.depths),
                num_heads=self.num_heads, in_channels=1,
                stem_stride=tuple(self.stem_stride), dtype=self.dtype)
        self.encoder1 = UnetResBlock(fs, kernel_size=3, dtype=self.dtype)

        if self.decoder_source == "cnn_skips":
            from .unet import UNetDecoder
            self.cnn_decoder = UNetDecoder(
                self.cnn_features, [2] * (n - 1), [[3, 3, 3]] * n,
                self.cnn_strides, self.num_classes,
                deep_supervision=self.do_ds, dtype=self.dtype)
        else:
            self.decoder5 = UnetrUpBlock(fs * 8, (2, 2, 2), dtype=self.dtype)
            self.decoder4 = UnetrUpBlock(fs * 4, (2, 2, 2), dtype=self.dtype)
            self.decoder3 = UnetrUpBlock(fs * 2, (2, 2, 2), dtype=self.dtype)
            self.decoder2 = UnetrUpBlock(fs, tuple(self.stem_stride),
                                         conv_decoder=True, dtype=self.dtype)
            self.out1 = UnetOutBlock(self.num_classes)
            if self.do_ds:
                self.out2 = UnetOutBlock(self.num_classes)
                self.out3 = UnetOutBlock(self.num_classes)

        if self.bottleneck_fusion == "enhanced":
            self.fusion_block = EnhancedFeature(self.hidden_size,
                                                is_first=True,
                                                dtype=self.dtype)
            self.projection1 = nn.Conv(self.hidden_size, (3, 3, 3),
                                       padding="SAME", dtype=self.dtype)
        else:
            # reference v1..v6: projection1/2 on cat(shared, specific),
            # projection3 on the concat of both modalities
            self.projection1 = nn.Conv(self.hidden_size, (3, 3, 3),
                                       padding="SAME", dtype=self.dtype)
            self.projection2 = nn.Conv(self.hidden_size, (3, 3, 3),
                                       padding="SAME", dtype=self.dtype)
            self.projection3 = nn.Conv(2 * self.hidden_size, (3, 3, 3),
                                       padding="SAME", dtype=self.dtype)

        if self.skip_fusion == "enhanced":
            # v5: EnhancedFeature on each decoder skip, fusing the shared
            # hidden state with the resolution-matched CNN skip
            self.fusion_layers = [
                EnhancedFeature(self.encoder_dims[i], dtype=self.dtype,
                                name=f"fusion_layer{i}")
                for i in range(3)]

        # bottleneck contrastive projections f→g (reference :162-172)
        self.f1 = nn.Conv(16, (1, 1, 1), dtype=self.dtype)
        self.f2 = nn.Conv(16, (1, 1, 1), dtype=self.dtype)
        self.g1 = _MLP((1024, 256))
        self.g2 = _MLP((1024, 256))
        # modality classifiers t→classifier (reference :173-192)
        self.t1 = nn.Conv(16, (1, 1, 1), dtype=self.dtype)
        self.t2 = nn.Conv(16, (1, 1, 1), dtype=self.dtype)
        self.classifier1 = _MLP((1024, 256, 100, 1), batch_norm=True)
        self.classifier2 = _MLP((1024, 256, 100, 1), batch_norm=True)

    def _cnn_skip_matching(self, hidden_j):
        """CNN-skip index whose cumulative stride equals shared hidden
        state j's (stem * 2^j); None when the trajectories don't align."""
        import numpy as np
        target = np.array(self.stem_stride) * (2 ** hidden_j)
        cum = np.ones(len(self.stem_stride), int)
        for i, s in enumerate(self.cnn_strides):
            cum = cum * np.array(s)
            if (cum == target).all():
                return i
        return None

    def __call__(self, data, *, train: bool = True):
        t2 = data[..., 0:1]
        tof = data[..., 1:2]

        spe1_skips = spe2_skips = None
        fea1_spe = fea2_spe = None
        if self.spe_mode != "none":
            spe1_skips = self.spe_encoder1(t2, train=train)
            spe2_skips = self.spe_encoder2(tof, train=train)
            fea1_spe, fea2_spe = spe1_skips[-1], spe2_skips[-1]

        if self.share_mode == "joint":
            fea_sha, hidden = self.share_encoder(data, train=train)
            half = fea_sha.shape[-1] // 2
            fea1_sha, fea2_sha = fea_sha[..., :half], fea_sha[..., half:]
        elif self.share_mode == "dual_trans":
            fea1_sha, hidden1 = self.share_encoder(t2, train=train)
            fea2_sha, hidden2 = self.share_encoder2(tof, train=train)
            hidden = [self.trans_fusions[i](hidden1[i], hidden1[i],
                                            hidden2[i], train=train)
                      for i in range(3)]
            fused_btl = self.trans_fusions[-1](fea1_sha, fea1_sha, fea2_sha,
                                               train=train)
        else:
            fea1_sha, hidden1 = self.share_encoder(t2, train=train)
            fea2_sha, hidden2 = self.share_encoder(tof, train=train)
            hidden = hidden1  # skips come from the T2 shared-encoder states

        stem = self.encoder1(t2, train=train)

        def flat(x):
            return x.reshape(x.shape[0], -1)

        f1_contra = self.g1(flat(self.f1(fea1_sha)), train=train)
        f2_contra = self.g2(flat(self.f2(fea2_sha)), train=train)
        spe_for_cls1 = fea1_spe if fea1_spe is not None else fea1_sha
        spe_for_cls2 = fea2_spe if fea2_spe is not None else fea2_sha
        f1_clasf = self.classifier1(flat(self.t1(spe_for_cls1)), train=train)
        f2_clasf = self.classifier2(flat(self.t2(spe_for_cls2)), train=train)

        # ---- bottleneck fusion → decoder input ----
        if self.share_mode == "dual_trans":
            to_decoder = fused_btl
        elif self.bottleneck_fusion == "enhanced":
            share = self.projection1(
                jnp.concatenate([fea1_sha, fea2_sha], -1))
            to_decoder = self.fusion_block(share, fea1_spe, fea2_spe,
                                           train=train) \
                if fea1_spe is not None else share
        else:
            c1 = jnp.concatenate([fea1_sha, fea1_spe], -1) \
                if fea1_spe is not None else fea1_sha
            c2 = jnp.concatenate([fea2_sha, fea2_spe], -1) \
                if fea2_spe is not None else fea2_sha
            p1 = self.projection1(c1)
            p2 = self.projection2(c2)
            if self.proj_residual:      # v2 (:562-563)
                p1 = p1 + fea1_sha.astype(p1.dtype)
                p2 = p2 + fea2_sha.astype(p2.dtype)
            to_decoder = self.projection3(jnp.concatenate([p1, p2], -1))

        # ---- decoder ----
        if self.decoder_source == "cnn_skips":      # v1
            logits = self.cnn_decoder(spe1_skips, train=train)
            if not self.do_ds:
                return logits
            return logits, f1_contra, f2_contra, f1_clasf, f2_clasf

        skips = list(hidden[:3])
        if self.skip_fusion == "enhanced" and spe1_skips is not None:
            for j in range(3):
                m = self._cnn_skip_matching(j)
                if m is not None and \
                        spe1_skips[m].shape[-1] == skips[j].shape[-1]:
                    skips[j] = self.fusion_layers[j](
                        skips[j], spe1_skips[m], spe2_skips[m], train=train)
        dec3 = self.decoder5(to_decoder, skips[2], train=train)
        dec2 = self.decoder4(dec3, skips[1], train=train)
        dec1 = self.decoder3(dec2, skips[0], train=train)
        out = self.decoder2(dec1, stem, train=train)
        if self.do_ds:
            logits = [self.out1(out), self.out2(dec1), self.out3(dec2)]
            return logits, f1_contra, f2_contra, f1_clasf, f2_clasf
        return self.out1(out)


# The six reference iterations, bound to their distinguishing
# configurations (see the class docstring table; file:line cites there).
class HybridNet_v1(HybridNet):
    spe_mode: str = "skips"
    decoder_source: str = "cnn_skips"
    bottleneck_fusion: str = "concat_proj"


class HybridNet_v2(HybridNet):
    bottleneck_fusion: str = "concat_proj"
    proj_residual: bool = True


class HybridNet_v3(HybridNet):
    share_mode: str = "dual_trans"
    spe_mode: str = "none"


class HybridNet_v4(HybridNet):
    share_mode: str = "joint"
    bottleneck_fusion: str = "concat_proj"


class HybridNet_v5(HybridNet):
    share_mode: str = "joint"
    spe_mode: str = "skips"
    bottleneck_fusion: str = "concat_proj"
    skip_fusion: str = "enhanced"
    # CNN trajectory mirrors the shared encoder so skips align per stage
    cnn_strides: Sequence[Sequence[int]] = (
        (2, 4, 4), (2, 2, 2), (2, 2, 2), (2, 2, 2), (1, 1, 1))
    cnn_features: Sequence[int] = (32, 64, 128, 256, 256)


class HybridNet_v6(HybridNet):
    share_mode: str = "joint"
    spe_mode: str = "skips"
    bottleneck_fusion: str = "concat_proj"
