"""Reference MVD-flagship checkpoint import
(model_sharing/torch_import.py::convert_contrastive_net): a torch twin of
the reference's ContrastiveNet (HybridNetwork.py:1364-1578 with the
public-UNETR++ building blocks its missing my_network/UNetRPP modules
vendor — EPA/TransformerBlock/UnetResBlock/UnetrUpBlock naming) is
converted and must produce numerically identical outputs through
models.contrastive_net.ContrastiveNet(branch2_wiring="reference",
epa_out_bias=True). This doubles as a cross-framework numerical parity
proof of the EPA attention, transformer-block, and dual-decoder semantics
(incl. the s2d execution path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from multimodal_mvd_seg_tpu.model_sharing.torch_import import (  # noqa: E402
    contrastive_net_kwargs, convert_contrastive_net, import_contrastive_net,
    load_network_weights)

# tiny ContrastiveNet geometry: dims[3] must be 2 * (feature_size * 16)
FS = 4
DIMS = (8, 16, 32, 128)
PROJ = (8, 8, 8, 4)
DEPTHS = (1, 1, 1, 1)
HEADS = 4
N_CLASSES = 3
PATCH = (32, 32, 32)


def _t3(v):
    return tuple(v) if isinstance(v, (list, tuple)) else (v,) * 3


class TConv(tnn.Sequential):
    """monai-get_conv_layer twin: a Sequential holding one `conv` submodule
    (state-dict names `<scope>.conv.weight`), padding (k-s+1)//2, bias off
    unless requested (conv_only=True default)."""

    def __init__(self, cin, cout, k, s, bias=False, transposed=False):
        super().__init__()
        k_, s_ = _t3(k), _t3(s)
        if transposed:
            conv = tnn.ConvTranspose3d(cin, cout, k_, s_, bias=bias)
        else:
            pad = tuple(max(0, (kk - ss + 1) // 2) for kk, ss in zip(k_, s_))
            conv = tnn.Conv3d(cin, cout, k_, s_, padding=pad, bias=bias)
        self.add_module("conv", conv)


class TUnetResBlock(tnn.Module):
    def __init__(self, cin, cout, kernel=3, stride=1, norm="instance"):
        super().__init__()
        self.conv1 = TConv(cin, cout, kernel, stride)
        self.conv2 = TConv(cout, cout, kernel, 1)
        self.lrelu = tnn.LeakyReLU(0.01, inplace=False)

        def mk():
            return tnn.InstanceNorm3d(cout, eps=1e-5, affine=True) \
                if norm == "instance" else tnn.BatchNorm3d(cout, eps=1e-5)

        self.norm1, self.norm2 = mk(), mk()
        self.downsample = cin != cout or any(s != 1 for s in _t3(stride))
        if self.downsample:
            self.conv3 = TConv(cin, cout, 1, stride)
            self.norm3 = mk()

    def forward(self, x):
        res = x
        out = self.lrelu(self.norm1(self.conv1(x)))
        out = self.norm2(self.conv2(out))
        if self.downsample:
            res = self.norm3(self.conv3(res))
        return self.lrelu(out + res)


class TEPA(tnn.Module):
    def __init__(self, input_size, hidden_size, proj_size, num_heads=4):
        super().__init__()
        self.num_heads = num_heads
        self.temperature = tnn.Parameter(torch.ones(num_heads, 1, 1))
        self.temperature2 = tnn.Parameter(torch.ones(num_heads, 1, 1))
        self.qkvv = tnn.Linear(hidden_size, hidden_size * 4, bias=False)
        # E and F are the SAME shared token projection
        self.E = self.F = tnn.Linear(input_size, proj_size, bias=False)
        self.attn_drop = tnn.Dropout(0.1)
        self.attn_drop_2 = tnn.Dropout(0.1)
        self.out_proj = tnn.Linear(hidden_size, hidden_size // 2)
        self.out_proj2 = tnn.Linear(hidden_size, hidden_size // 2)

    def forward(self, x):
        B, N, C = x.shape
        h = self.num_heads
        qkvv = self.qkvv(x).reshape(B, N, 4, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v_ca, v_sa = [t.transpose(-2, -1) for t in qkvv]  # (B,h,hd,N)
        k_proj = self.E(k)
        v_sa_proj = self.F(v_sa)
        q = torch.nn.functional.normalize(q, dim=-1)
        k = torch.nn.functional.normalize(k, dim=-1)
        attn_ca = (q @ k.transpose(-2, -1)) * self.temperature
        attn_ca = self.attn_drop(attn_ca.softmax(dim=-1))
        x_ca = (attn_ca @ v_ca).permute(0, 3, 1, 2).reshape(B, N, C)
        attn_sa = (q.permute(0, 1, 3, 2) @ k_proj) * self.temperature2
        attn_sa = self.attn_drop_2(attn_sa.softmax(dim=-1))
        x_sa = (attn_sa @ v_sa_proj.transpose(-2, -1))  # (B,h,N,hd)
        x_sa = x_sa.permute(0, 2, 1, 3).reshape(B, N, C)
        # out_proj takes the SPATIAL half, out_proj2 the channel half
        return torch.cat((self.out_proj(x_sa), self.out_proj2(x_ca)), dim=-1)


class TTransformerBlock(tnn.Module):
    def __init__(self, input_size, hidden_size, proj_size, num_heads):
        super().__init__()
        self.norm = tnn.LayerNorm(hidden_size)
        self.gamma = tnn.Parameter(1e-6 * torch.ones(hidden_size))
        self.epa_block = TEPA(input_size, hidden_size, proj_size, num_heads)
        self.conv51 = TUnetResBlock(hidden_size, hidden_size, 3, 1, "batch")
        self.conv8 = tnn.Sequential(tnn.Dropout3d(0.1),
                                    tnn.Conv3d(hidden_size, hidden_size, 1))
        self.pos_embed = tnn.Parameter(torch.zeros(1, input_size, hidden_size))

    def forward(self, x):
        B, C = x.shape[:2]
        sp = x.shape[2:]
        t = x.reshape(B, C, -1).permute(0, 2, 1) + self.pos_embed
        t = t + self.gamma * self.epa_block(self.norm(t))
        attn_skip = t.permute(0, 2, 1).reshape(B, C, *sp)
        return attn_skip + self.conv8(self.conv51(attn_skip))


class TUnetrPPEncoderV1(tnn.Module):
    """stem (2,2,2); downsamples (2,2,2),(2,2,2),(2,4,4)
    (reference HybridNetwork.py:1675-1705)."""

    def __init__(self, input_sizes, dims=DIMS, proj=PROJ, depths=DEPTHS,
                 heads=HEADS, in_ch=2):
        super().__init__()
        strides = [(2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 4, 4)]
        cins = [in_ch] + list(dims[:-1])
        self.downsample_layers = tnn.ModuleList([
            tnn.Sequential(TConv(cins[i], dims[i], strides[i], strides[i]),
                           tnn.GroupNorm(cins[i], dims[i], eps=1e-5))
            for i in range(4)])
        self.stages = tnn.ModuleList([
            tnn.Sequential(*[TTransformerBlock(input_sizes[i], dims[i],
                                               proj[i], heads)
                             for _ in range(depths[i])])
            for i in range(4)])

    def forward(self, x):
        hidden = []
        for i in range(4):
            x = self.downsample_layers[i](x)
            x = self.stages[i](x)
            hidden.append(x)
        return x, hidden


class TUnetrUpBlock(tnn.Module):
    def __init__(self, cin, cout, upsample, input_size, proj_size=64,
                 num_heads=4, depth=3, conv_decoder=False, norm="instance"):
        super().__init__()
        self.transp_conv = TConv(cin, cout, upsample, upsample,
                                 transposed=True)
        self.decoder_block = tnn.ModuleList()
        if conv_decoder:
            self.decoder_block.append(TUnetResBlock(cout, cout, 3, 1, norm))
        else:
            self.decoder_block.append(tnn.Sequential(
                *[TTransformerBlock(input_size, cout, proj_size, num_heads)
                  for _ in range(depth)]))

    def forward(self, inp, skip):
        return self.decoder_block[0](self.transp_conv(inp) + skip)


class TUnetOutBlock(tnn.Module):
    def __init__(self, cin, n):
        super().__init__()
        self.conv = TConv(cin, n, 1, 1, bias=True)

    def forward(self, x):
        return self.conv(x)


def _tmlp(fin, fout, slope=0.0):
    act = tnn.ReLU() if slope == 0 else tnn.LeakyReLU(slope)
    return tnn.Sequential(tnn.Linear(fin, fin), tnn.BatchNorm1d(fin), act,
                          tnn.Linear(fin, fout))


class TContrastiveNet(tnn.Module):
    """Reference ContrastiveNet wiring (HybridNetwork.py:1364-1578) —
    including the literal branch-2 dataflow at :1562-1564 (decoder4_/3_/2_
    consume branch-1 activations) and the constructed-but-unused `fusion`
    module."""

    def __init__(self, patch=PATCH, in_ch=2, n_classes=N_CLASSES, fs=FS,
                 dims=DIMS, proj=PROJ, depths=DEPTHS, heads=HEADS,
                 feat_dim=None):
        super().__init__()
        feat_dim = feat_dim or fs
        sizes = []
        sp = patch
        for s in [(2, 2, 2), (2, 2, 2), (2, 2, 2), (2, 4, 4)]:
            sp = tuple(a // b for a, b in zip(sp, s))
            sizes.append(int(np.prod(sp)))
        self.share_encoder = TUnetrPPEncoderV1(sizes, dims, proj, depths,
                                               heads, in_ch)
        self.encoder1 = TUnetResBlock(1, fs, 3, 1, "instance")
        for suffix in ("", "_"):
            setattr(self, "decoder5" + suffix,
                    TUnetrUpBlock(fs * 16, fs * 8, (2, 4, 4), sizes[2],
                                  num_heads=heads))
            setattr(self, "decoder4" + suffix,
                    TUnetrUpBlock(fs * 8, fs * 4, 2, sizes[1],
                                  num_heads=heads))
            setattr(self, "decoder3" + suffix,
                    TUnetrUpBlock(fs * 4, fs * 2, 2, sizes[0],
                                  num_heads=heads))
            setattr(self, "decoder2" + suffix,
                    TUnetrUpBlock(fs * 2, fs, 2, int(np.prod(patch)),
                                  num_heads=heads, conv_decoder=True))
            setattr(self, "out1" + suffix, TUnetOutBlock(fs, n_classes))
            setattr(self, "out2" + suffix, TUnetOutBlock(fs * 2, n_classes))
            setattr(self, "out3" + suffix, TUnetOutBlock(fs * 4, n_classes))
        self.fusion = tnn.Sequential(tnn.Conv3d(8, 8, 1))  # unused in forward
        self.projection_head1 = _tmlp(feat_dim, feat_dim)
        self.projection_head2 = _tmlp(feat_dim, feat_dim)
        self.prediction_head1 = _tmlp(feat_dim, feat_dim)
        self.prediction_head2 = _tmlp(feat_dim, feat_dim)
        for c in range(n_classes):
            setattr(self, f"contrastive_class_selector_{c}",
                    _tmlp(feat_dim, 1, slope=0.2))
            setattr(self, f"contrastive_class_selector_memory{c}",
                    _tmlp(feat_dim, 1, slope=0.2))

    def forward(self, data):
        fea, hidden = self.share_encoder(data)
        half = fea.shape[1] // 2
        fea1, fea2 = fea[:, :half], fea[:, half:]
        conv_block = self.encoder1(data[:, 0:1])
        enc1, enc2, enc3 = hidden[0], hidden[1], hidden[2]
        dec3 = self.decoder5(fea1, enc3)
        dec2 = self.decoder4(dec3, enc2)
        dec1 = self.decoder3(dec2, enc1)
        out = self.decoder2(dec1, conv_block)
        dec3_ = self.decoder5_(fea2, enc3)  # noqa: F841 (dead, as in ref)
        dec2_ = self.decoder4_(dec3, enc2)   # branch-1 inputs — the
        dec1_ = self.decoder3_(dec2, enc1)   # reference's literal wiring
        out_ = self.decoder2_(dec1, conv_block)
        logits = [self.out1(out), self.out2(dec1), self.out3(dec2)]
        logits_ = [self.out1_(out_), self.out2_(dec1_), self.out3_(dec2_)]
        return logits, logits_, out, out_


def _randomize(net, seed=0):
    """Fill every parameter/stat with seeded noise so identity defaults
    (zeros/ones) cannot mask mapping bugs."""
    g = torch.Generator().manual_seed(seed)
    sd = net.state_dict()
    for k, v in sd.items():
        if not torch.is_floating_point(v):
            continue
        r = torch.randn(v.shape, generator=g)
        if "running_var" in k:
            v.copy_(0.5 + 0.5 * r.abs())
        elif "temperature" in k:
            v.copy_(0.5 + 0.5 * r.abs())
        elif k.endswith("norm.weight") or ".norm1.weight" in k \
                or ".norm2.weight" in k or ".norm3.weight" in k \
                or k.endswith(".1.weight"):
            v.copy_(1.0 + 0.2 * r)
        elif "gamma" in k:
            v.copy_(0.05 * r)
        else:
            # modest scale: the dual decoder stacks ~20 residual blocks, and
            # wilder weights amplify activations past f32 range (real
            # checkpoints are trained to sane magnitudes)
            v.copy_(0.1 * r)
    net.load_state_dict(sd)


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(0)
    net = TContrastiveNet()
    _randomize(net)
    net.eval()
    x = torch.randn(2, 2, *PATCH, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        ref = net(x)
    return net, x, ref


def test_kwargs_derived_from_weights(twin):
    net, _, _ = twin
    kw = contrastive_net_kwargs(load_network_weights(net.state_dict()))
    assert kw["input_channels"] == 2
    assert kw["num_classes"] == N_CLASSES
    assert kw["feature_size"] == FS
    assert kw["num_heads"] == HEADS
    assert tuple(kw["encoder_dims"]) == DIMS
    assert tuple(kw["proj_size"]) == PROJ
    assert tuple(kw["depths"]) == DEPTHS
    assert kw["do_ds"] is True
    assert kw["feat_dim"] == FS
    assert kw["branch2_wiring"] == "reference"
    assert kw["epa_out_bias"] is True


def _apply_ours(net, variables, x_np):
    xj = jnp.moveaxis(jnp.asarray(x_np), 1, -1)
    out = jax.jit(net.apply, static_argnames="train")(variables, xj,
                                                      train=False)
    return out


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


@pytest.mark.parametrize("s2d", [None, (2, 2, 2)],
                         ids=["plain-cf", "s2d-222"])
def test_forward_parity(twin, s2d):
    """Imported weights through ContrastiveNet (branch2_wiring='reference',
    f32) must reproduce the torch twin's outputs — both heads-lists and
    both full-resolution feature maps — in plain channels-first and in the
    space-to-depth execution."""
    tnet, x, ref = twin
    net, variables = import_contrastive_net(
        {"network_weights": tnet.state_dict()},
        dtype=jnp.float32, s2d_factors=s2d, remat=False)
    assert net.branch2_wiring == "reference" and net.epa_out_bias
    logits, logits_, fea1, fea2 = _apply_ours(net, variables, x.numpy())
    for ours, theirs in zip(logits + logits_, ref[0] + ref[1]):
        r = _rel(np.moveaxis(np.asarray(ours), -1, 1), theirs.numpy())
        assert r < 2e-4, r
    for ours, theirs in ((fea1, ref[2]), (fea2, ref[3])):
        r = _rel(np.moveaxis(np.asarray(ours), -1, 1), theirs.numpy())
        assert r < 2e-4, r


def test_aux_heads_parity(twin):
    """projection/prediction/selector heads (eval-mode BatchNorm1d with
    imported running stats) match the torch twin row-for-row."""
    tnet, _, _ = twin
    net, variables = import_contrastive_net(
        {"network_weights": tnet.state_dict()}, dtype=jnp.float32,
        s2d_factors=None, remat=False)
    feats = np.random.RandomState(3).randn(5, FS).astype(np.float32)
    tf = torch.from_numpy(feats)
    fj = jnp.asarray(feats)
    with torch.no_grad():
        for branch in (1, 2):
            proj_t = getattr(tnet, f"projection_head{branch}")(tf).numpy()
            proj_j = net.apply(variables, fj, branch, train=False,
                               method="project")
            assert _rel(proj_j, proj_t) < 1e-5
            pred_t = getattr(tnet, f"prediction_head{branch}")(tf).numpy()
            pred_j = net.apply(variables, fj, branch, train=False,
                               method="predict")
            assert _rel(pred_j, pred_t) < 1e-5
        sel_j = net.apply(variables, fj, train=False, memory=False,
                          method="selector_scores")
        sel_mem_j = net.apply(variables, fj, train=False, memory=True,
                              method="selector_scores")
        for c in range(N_CLASSES):
            sel_t = getattr(tnet, f"contrastive_class_selector_{c}")(tf)
            assert _rel(sel_j[c], sel_t.numpy()) < 1e-5
            mem_t = getattr(tnet,
                            f"contrastive_class_selector_memory{c}")(tf)
            assert _rel(sel_mem_j[c], mem_t.numpy()) < 1e-5


def test_model_folder_import_dispatch(twin, tmp_path):
    """import_torch_model_folder detects a ContrastiveNet state dict and
    writes an MVD checkpoint (batch_stats + network_overrides with
    branch2_wiring='reference')."""
    import json
    import pickle
    import shutil

    from multimodal_mvd_seg_tpu.model_sharing.torch_import import (
        import_torch_model_folder)

    tnet, _, _ = twin
    src = tmp_path / "ref" / "MVDTrainer__nnUNetPlans__3d_fullres"
    (src / "fold_0").mkdir(parents=True)
    plans = {"plans_name": "nnUNetPlans", "dataset_name": "Dataset001",
             "configurations": {"3d_fullres": {"patch_size": list(PATCH)}}}
    json.dump(plans, open(src / "plans.json", "w"))
    json.dump({"labels": {"background": 0}}, open(src / "dataset.json", "w"))
    torch.save({"network_weights": tnet.state_dict(),
                "init_args": {"configuration": "3d_fullres"},
                "trainer_name": "nnUNetTrainer",
                "inference_allowed_mirroring_axes": (0, 1, 2)},
               src / "fold_0" / "checkpoint_final.pth")
    dst = tmp_path / "imported"
    converted = import_torch_model_folder(str(src), str(dst))
    ck = pickle.load(open(converted["fold_0"][0], "rb"))
    assert ck["trainer_name"] == "MVDTrainer"
    ov = ck["network_overrides"]
    assert ov["branch2_wiring"] == "reference" and ov["epa_out_bias"] is True
    # full weight-derived architecture rides along so the predictor's
    # clone() corrects the factory's hard-coded paper scale
    assert ov["feature_size"] == FS and ov["encoder_dims"] == DIMS
    assert ov["depths"] == DEPTHS and "do_ds" not in ov
    assert "batch_stats" in ck and ck["batch_stats"]
    # running stats landed in the stats tree, affine scale in params
    b0 = ck["batch_stats"]["share_encoder"]["stage0"]["block0"]["conv51"]
    assert set(b0["norm1"]) == {"mean", "var"}
    sd = tnet.state_dict()
    np.testing.assert_allclose(
        b0["norm1"]["mean"],
        sd["share_encoder.stages.0.0.conv51.norm1.running_mean"].numpy())
