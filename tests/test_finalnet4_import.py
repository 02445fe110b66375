"""Reference FinalNetv4 checkpoint import
(model_sharing/torch_import.py::convert_finalnet4): a torch twin with the
reference's state-dict STRUCTURE (selfattnNet.py:1078-1160 — dual
PlainConvEncoders + dual UNetDecoder6, UNetDecoder.py:797-925) is converted
and must produce numerically identical outputs through
models.selfattn_net.FinalNetv4(padding="TORCH").

The public reference code cannot run as shipped (UNetDecoder6 is never
imported in selfattnNet.py and its forward(skips, attn_skip) arity does not
match the decoder1(skips1) call), so the twin implements the REPAIRED
forward semantics this framework ships: bottleneck = pos_embed + MHSA
residual (the working pattern of UNetDecoder.py:76-88), whose conv
refinement (absent from UNetDecoder6) the importer zeroes into an exact
identity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from multimodal_mvd_seg_tpu.model_sharing.torch_import import (  # noqa: E402
    convert_finalnet4, finalnet4_kwargs, import_finalnet4,
    load_network_weights)

FEATURES = (8, 16, 32, 64)
N_CONV = (2, 2, 2, 2)
KERNELS = ((3, 3, 3),) * 4
STRIDES = ((1, 1, 1), (2, 2, 2), (2, 2, 2), (2, 2, 2))
N_CLASSES = 3
HIDDEN = 64                      # == FEATURES[-1] (bottleneck channels)
PATCH = (16, 32, 32)             # bottleneck (2, 4, 4) -> 32 tokens
N_TOKENS = 32
HEADS = 8


class TConvNormAct(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv = tnn.Conv3d(cin, cout, 3, stride, padding=1, bias=True)
        self.norm = tnn.InstanceNorm3d(cout, eps=1e-5, affine=True)

    def forward(self, x):
        return tnn.functional.leaky_relu(self.norm(self.conv(x)), 0.01)


class TStack(tnn.Module):
    """dynamic-network-architectures StackedConvBlocks naming:
    convs.{i}.{conv,norm}."""

    def __init__(self, n, cin, cout, stride):
        super().__init__()
        self.convs = tnn.ModuleList(
            [TConvNormAct(cin if i == 0 else cout, cout,
                          stride if i == 0 else 1) for i in range(n)])

    def forward(self, x):
        for c in self.convs:
            x = c(x)
        return x


class TEncoder(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        stages, prev = [], cin
        for f, n, st in zip(FEATURES, N_CONV, (1, 2, 2, 2)):
            stages.append(TStack(n, prev, f, st))
            prev = f
        self.stages = tnn.ModuleList(stages)

    def forward(self, x):
        skips = []
        for s in self.stages:
            x = s(x)
            skips.append(x)
        return skips


class TAttention(tnn.Module):
    """UNetDecoder.py:1060 Attention (qkv fused Linear, proj)."""

    def __init__(self, dim, heads=HEADS):
        super().__init__()
        self.num_heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=False)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                  C // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class TDecoder6(tnn.Module):
    """UNetDecoder6's parameter structure (transpconvs/stages/seg_layers +
    selfattn/norm1/pos_embed1 + the dead crossattn/norm2/pos_embed2/3),
    forward = the repaired semantics (see module docstring)."""

    def __init__(self):
        super().__init__()
        n = len(FEATURES)
        tps, stages, segs = [], [], []
        for s in range(1, n):
            below = FEATURES[-s]
            skip = FEATURES[-(s + 1)]
            st = STRIDES[-s]
            tps.append(tnn.ConvTranspose3d(below, skip, st, st, bias=True))
            stages.append(TStack(2, 2 * skip, skip, 1))
            segs.append(tnn.Conv3d(skip, N_CLASSES, 1, 1, 0, bias=True))
        self.transpconvs = tnn.ModuleList(tps)
        self.stages = tnn.ModuleList(stages)
        self.seg_layers = tnn.ModuleList(segs)
        self.pos_embed1 = tnn.Parameter(torch.zeros(1, N_TOKENS, HIDDEN))
        self.pos_embed2 = tnn.Parameter(torch.zeros(1, N_TOKENS, HIDDEN))
        self.pos_embed3 = tnn.Parameter(torch.zeros(1, N_TOKENS, HIDDEN))
        self.selfattn = TAttention(HIDDEN)
        self.crossattn = TAttention(HIDDEN)   # dead (params only)
        self.norm1 = tnn.LayerNorm(HIDDEN)
        self.norm2 = tnn.LayerNorm(HIDDEN)    # dead

    def forward(self, skips):
        x = skips[-1]
        B, C = x.shape[:2]
        sp = x.shape[2:]
        tokens = x.flatten(2).transpose(1, 2)          # (B, N, C)
        tokens = tokens + self.pos_embed1
        attn = tokens + self.selfattn(self.norm1(tokens))
        x = attn.transpose(1, 2).reshape(B, C, *sp)
        seg_outputs = []
        for s in range(len(self.stages)):
            x = self.transpconvs[s](x)
            x = torch.cat((x, skips[-(s + 2)]), 1)
            x = self.stages[s](x)
            seg_outputs.append(self.seg_layers[s](x))
        return seg_outputs[::-1]


class TFinalNetv4(tnn.Module):
    def __init__(self):
        super().__init__()
        self.encoder1 = TEncoder(1)
        self.encoder2 = TEncoder(1)
        self.decoder1 = TDecoder6()
        self.decoder2 = TDecoder6()
        # FinalNetv4-level dead attention zoo (selfattnNet.py:1137-1145)
        self.pos_embed1 = tnn.Parameter(torch.zeros(1, N_TOKENS, HIDDEN))
        self.pos_embed2 = tnn.Parameter(torch.zeros(1, N_TOKENS, HIDDEN))
        self.selfattn1 = TAttention(HIDDEN)
        self.selfattn2 = TAttention(HIDDEN)
        self.norm1 = tnn.LayerNorm(HIDDEN)
        self.norm2 = tnn.LayerNorm(HIDDEN)

    def forward(self, x, do_ds=True):
        o1 = self.decoder1(self.encoder1(x[:, 0:1]))
        o2 = self.decoder2(self.encoder2(x[:, 1:2]))
        if not do_ds:
            return (o1[0] + o2[0]) / 2
        return o1, o2


@pytest.fixture(scope="module")
def twin():
    torch.manual_seed(5)
    t = TFinalNetv4().eval()
    # non-trivial values everywhere (default-zero pos embeds would mask
    # conversion bugs)
    with torch.no_grad():
        for p in t.parameters():
            if (p == 0).all():
                p.add_(torch.randn_like(p) * 0.05)
    return t


def test_kwargs_derived_from_weights(twin):
    w = load_network_weights(twin.state_dict())
    kw = finalnet4_kwargs(w)
    assert kw["features_per_stage"] == list(FEATURES)
    assert kw["n_conv_per_stage"] == list(N_CONV)
    assert kw["strides"] == [list(s) for s in STRIDES]
    assert kw["num_classes"] == N_CLASSES
    assert kw["hidden_size"] == HIDDEN


def test_forward_parity(twin):
    rs = np.random.RandomState(0)
    x = rs.normal(size=(2, 2, *PATCH)).astype(np.float32)
    with torch.no_grad():
        ref_ds = twin(torch.from_numpy(x))
        ref_avg = twin(torch.from_numpy(x), do_ds=False).numpy()

    net, variables = import_finalnet4(twin.state_dict(), do_ds=True,
                                      dtype=jnp.float32)
    xs = jnp.moveaxis(jnp.asarray(x), 1, -1)
    o1, o2 = jax.jit(lambda v, t: net.apply(v, t, train=False))(variables, xs)
    for branch, ref in ((o1, ref_ds[0]), (o2, ref_ds[1])):
        assert len(branch) == len(ref)
        for mine, theirs in zip(branch, ref):
            np.testing.assert_allclose(
                np.moveaxis(np.asarray(mine), -1, 1), theirs.numpy(),
                rtol=2e-3, atol=2e-3)

    net_avg, variables_avg = import_finalnet4(twin.state_dict(), do_ds=False,
                                              dtype=jnp.float32)
    avg = jax.jit(lambda v, t: net_avg.apply(v, t, train=False))(
        variables_avg, xs)
    np.testing.assert_allclose(np.moveaxis(np.asarray(avg), -1, 1), ref_avg,
                               rtol=2e-3, atol=2e-3)


def test_dead_keys_skipped(twin):
    w = load_network_weights(twin.state_dict())
    _, skipped = convert_finalnet4(w)
    assert any(k.startswith("selfattn1.") for k in skipped)
    assert any("crossattn" in k for k in skipped)
    assert any("pos_embed2" in k for k in skipped)
