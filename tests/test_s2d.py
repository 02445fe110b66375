"""Space-to-depth execution domain (ops/s2d.py): exact equivalence with the
plain channels-first conv path at every cell-conv mode, and end-to-end
through PlainConvUNetCF."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_mvd_seg_tpu.ops import s2d

DN = ("NCDHW", "OIDHW", "NCDHW")
FACTORS = [(1, 2, 2), (2, 2, 1), (2, 2, 2)]


def plain_conv(x, w, stride=(1, 1, 1)):
    return jax.lax.conv_general_dilated(x, w, stride, "SAME",
                                        dimension_numbers=DN)


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    assert a.shape == b.shape, (a.shape, b.shape)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


@pytest.fixture(scope="module")
def data():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 3, 8, 12, 16), jnp.float32)
    return rs, x


@pytest.mark.parametrize("f", FACTORS)
def test_roundtrip(data, f):
    _, x = data
    xs = s2d.space_to_depth(x, f)
    assert _rel_err(s2d.depth_to_space(xs, f), x) == 0.0


@pytest.mark.parametrize("f", FACTORS)
def test_stride1_pair_and_masked_norm(data, f):
    rs, x = data
    xs = s2d.space_to_depth(x, f)
    rep0, rep1 = s2d.rep_of(f), s2d.phase_up(s2d.rep_of(f))
    w1 = jnp.asarray(rs.randn(5, 3, 3, 3, 3) * 0.2, jnp.float32)
    w2 = jnp.asarray(rs.randn(4, 5, 3, 3, 3) * 0.2, jnp.float32)
    up = s2d.CellConvSpec((3, 3, 3), (1, 1, 1), rep0, rep1, xs.shape[2:])
    y1 = up(xs, w1)
    m, _ = s2d.artifact_mask(rep1, y1.shape[2:])
    F = s2d.rep_F(rep1)
    y1m = (y1.reshape(2, 5, F, *y1.shape[2:]) * m).reshape(y1.shape)
    dn = s2d.CellConvSpec((3, 3, 3), (1, 1, 1), rep1, rep0, y1m.shape[2:])
    got = s2d.depth_to_space(dn(y1m, w2), f)
    ref = plain_conv(plain_conv(x, w1), w2)
    assert _rel_err(got, ref) < 2e-5

    # masked IN on the phase-1 intermediate == plain IN on the logical tensor
    sc = jnp.asarray(rs.rand(5) + 0.5, jnp.float32)
    bi = jnp.asarray(rs.randn(5) * 0.1, jnp.float32)
    z = s2d.masked_instance_norm_act(y1m, rep1, sc, bi)
    r1 = plain_conv(x, w1)
    mm = r1.mean(axis=(2, 3, 4), keepdims=True)
    vv = r1.var(axis=(2, 3, 4), keepdims=True)
    refn = jax.nn.leaky_relu(
        (r1 - mm) * jax.lax.rsqrt(vv + 1e-5) * sc.reshape(1, -1, 1, 1, 1)
        + bi.reshape(1, -1, 1, 1, 1), 0.01)
    zf = np.asarray(s2d.depth_to_space(z, f))
    sl = [slice(None)] * 2 + [slice(1, 1 + L) if ff == 2 else slice(None)
                              for L, ff in zip((8, 12, 16), f)]
    assert _rel_err(zf[tuple(sl)], refn) < 2e-5


@pytest.mark.parametrize("f", [(1, 2, 2), (2, 2, 1)])
def test_strided_modes(data, f):
    rs, x = data
    xs = s2d.space_to_depth(x, f)
    rep0, rep1 = s2d.rep_of(f), s2d.phase_up(s2d.rep_of(f))
    # phase-up strided entry into another s2d stage, then down
    w3 = jnp.asarray(rs.randn(6, 3, 3, 3, 3) * 0.2, jnp.float32)
    w4 = jnp.asarray(rs.randn(4, 6, 3, 3, 3) * 0.2, jnp.float32)
    sup = s2d.CellConvSpec((3, 3, 3), (2, 2, 2), rep0, rep1, xs.shape[2:])
    u = sup(xs, w3)
    mu, _ = s2d.artifact_mask(rep1, u.shape[2:])
    um = (u.reshape(2, 6, s2d.rep_F(rep1), *u.shape[2:]) * mu
          ).reshape(u.shape)
    dn2 = s2d.CellConvSpec((3, 3, 3), (1, 1, 1), rep1, rep0, um.shape[2:])
    got = s2d.depth_to_space(dn2(um, w4), f)
    ref = plain_conv(plain_conv(x, w3, (2, 2, 2)), w4)
    assert _rel_err(got, ref) < 2e-5
    # strided exit into the normal domain
    e = s2d.CellConvSpec((3, 3, 3), (2, 2, 2), rep0, s2d.normal_rep(3),
                         xs.shape[2:])(xs, w3)
    assert _rel_err(e, plain_conv(x, w3, (2, 2, 2))) < 2e-5


@pytest.mark.parametrize("f", FACTORS)
def test_seg_head_diag_and_transpose(data, f):
    rs, x = data
    xs = s2d.space_to_depth(x, f)
    rep0 = s2d.rep_of(f)
    w6 = jnp.asarray(rs.randn(4, 3, 1, 1, 1) * 0.2, jnp.float32)
    g = s2d.CellConvSpec((1, 1, 1), (1, 1, 1), rep0, rep0, xs.shape[2:])(
        xs, w6)
    assert _rel_err(s2d.depth_to_space(g, f), plain_conv(x, w6)) < 2e-5

    wt = jnp.asarray(rs.randn(3, 6, 2, 2, 2) * 0.2, jnp.float32)
    ref = jax.lax.conv_transpose(
        x, wt, (2, 2, 2), "SAME",
        dimension_numbers=("NCDHW", "IODHW", "NCDHW"))
    tr = s2d.cell_transpose(x, wt, s2d.normal_rep(3), rep0, (2, 2, 2))
    assert _rel_err(s2d.depth_to_space(tr, f), ref) < 2e-5
    xsmall = jnp.asarray(np.random.RandomState(1).randn(2, 3, 4, 6, 8),
                         jnp.float32)
    tr2 = s2d.cell_transpose(s2d.space_to_depth(xsmall, f), wt, rep0, rep0,
                             (2, 2, 2))
    ref2 = jax.lax.conv_transpose(
        xsmall, wt, (2, 2, 2), "SAME",
        dimension_numbers=("NCDHW", "IODHW", "NCDHW"))
    assert _rel_err(s2d.depth_to_space(tr2, f), ref2) < 2e-5


def test_unet_s2d_equivalence():
    """PlainConvUNetCF with s2d_stages=2 has the identical parameter tree
    and (to fp32 roundoff) identical outputs as the plain execution."""
    from multimodal_mvd_seg_tpu.models.unet import PlainConvUNetCF
    kw = dict(features_per_stage=[8, 16, 32, 64],
              n_conv_per_stage_encoder=[2] * 4,
              n_conv_per_stage_decoder=[2] * 3,
              kernel_sizes=[[3, 3, 3]] * 4,
              strides=[[1, 1, 1], [2, 2, 2], [2, 2, 2], [1, 2, 2]],
              num_classes=3, deep_supervision=True, dtype=jnp.float32,
              seg_dtype=jnp.float32)  # f32 keeps the domain comparison tight
    net0 = PlainConvUNetCF(**kw)
    net2 = PlainConvUNetCF(**kw, s2d_stages=2, s2d_factors=(1, 2, 2))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 32, 32, 2),
                    jnp.float32)
    p0 = jax.jit(lambda r, t: net0.init(r, t, train=False))(
        jax.random.PRNGKey(0), x)["params"]
    p2 = jax.jit(lambda r, t: net2.init(r, t, train=False))(
        jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p0) == jax.tree.structure(p2)
    assert max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, p2))) == 0.0
    o0 = net0.apply({"params": p0}, x, train=True)
    o2 = net2.apply({"params": p0}, x, train=True)
    for a, b in zip(o0, o2):
        assert _rel_err(a, b) < 1e-4
    # gradients flow and match shapes
    def lossf(net):
        def f(p):
            return sum(jnp.sum(t) for t in net.apply({"params": p}, x,
                                                     train=True))
        return f
    g0 = jax.grad(lossf(net0))(p0)
    g2 = jax.grad(lossf(net2))(p0)
    # conv-bias grads are ~0 under instance norm (IN is invariant to a
    # per-channel constant), so compare against the GLOBAL gradient scale
    scale = max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g0))
    errs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()) / scale, g0, g2)
    assert max(jax.tree.leaves(errs)) < 5e-3


def test_stage_factor_demotion():
    from multimodal_mvd_seg_tpu.models.unet import s2d_stage_factors
    # odd W at stage0 -> demote every stage (prefix rule)
    sf = s2d_stage_factors((16, 32, 30), [[3, 3, 3]] * 3,
                           [[1, 1, 1], [2, 2, 2], [2, 2, 2]],
                           [2, 2, 2], [2, 2], 2, (1, 2, 2))
    assert sf[0] == (1, 1, 1)
    # odd conv count -> demoted
    sf = s2d_stage_factors((16, 32, 32), [[3, 3, 3]] * 3,
                           [[1, 1, 1], [2, 2, 2], [2, 2, 2]],
                           [3, 2, 2], [2, 2], 2, (1, 2, 2))
    assert sf[0] == (1, 1, 1)
    # eligible: stage0+1 factored
    sf = s2d_stage_factors((16, 32, 32), [[3, 3, 3]] * 3,
                           [[1, 1, 1], [2, 2, 2], [2, 2, 2]],
                           [2, 2, 2], [2, 2], 2, (1, 2, 2))
    assert sf[0] == (1, 2, 2) and sf[1] == (1, 2, 2) and sf[2] == (1, 1, 1)


def test_factory_uses_s2d(synthetic_raw_dataset):
    """The factory's PlainConvUNetCF defaults carry the s2d execution flags
    and the resulting net still produces correct shapes."""
    from multimodal_mvd_seg_tpu.models.factory import _default_s2d_factors
    # 3D with 4-divisible leading axes: leave the minor (lane) axis whole
    assert _default_s2d_factors((64, 128, 256)) == (2, 2, 1)
    assert _default_s2d_factors((160, 128, 112)) == (2, 2, 1)
    # fallback: split the two largest axes
    assert _default_s2d_factors((30, 128, 256)) == (1, 2, 2)
    assert _default_s2d_factors((320, 256)) == (2, 2)


def test_channels_last_cell_layout_matches_nc():
    """CellConvSpec/masked_instance_norm_act accept layout='NL'
    (channels-last cells, the TPU conv's native layout); numerics must
    match the NC path through a phase-up/phase-down conv+norm pair."""
    from multimodal_mvd_seg_tpu.ops import s2d
    rng = np.random.RandomState(0)
    factors = (2, 2, 1)
    rep0, rep1 = s2d.rep_of(factors), s2d.phase_up(s2d.rep_of(factors))
    c, cells = 8, (6, 8, 10)
    F = s2d.rep_F(rep0)
    x_nc = jnp.asarray(rng.randn(2, c * F, *cells), jnp.float32)
    x_nl = jnp.moveaxis(x_nc, 1, -1)
    w = jnp.asarray(rng.randn(c, c, 3, 3, 3) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(c), jnp.float32)
    sc = jnp.asarray(rng.randn(c), jnp.float32)
    bi = jnp.asarray(rng.randn(c), jnp.float32)
    spec = s2d.CellConvSpec((3, 3, 3), (1, 1, 1), rep0, rep1, cells)
    y_nc = s2d.masked_instance_norm_act(spec(x_nc, w, b), rep1, sc, bi)
    y_nl = s2d.masked_instance_norm_act(
        spec(x_nl, w, b, layout="NL"), rep1, sc, bi, layout="NL")
    spec2 = s2d.CellConvSpec((3, 3, 3), (1, 1, 1), rep1, rep0,
                             tuple(spec.out_lens))
    z_nc = s2d.masked_instance_norm_act(spec2(y_nc, w), rep0, sc, bi)
    z_nl = s2d.masked_instance_norm_act(spec2(y_nl, w, layout="NL"),
                                        rep0, sc, bi, layout="NL")
    assert float(jnp.max(jnp.abs(z_nc - jnp.moveaxis(z_nl, -1, 1)))) < 1e-4


def test_unet_s2d_layout_nl_matches_nc():
    """s2d_layout='NL' (channels-last cells) must produce the same outputs
    as the NC default from the SAME parameter tree (it is purely an
    execution-layout choice)."""
    from multimodal_mvd_seg_tpu.models.unet import PlainConvUNetCF
    kw = dict(features_per_stage=[8, 16, 32, 64],
              n_conv_per_stage_encoder=[2] * 4,
              n_conv_per_stage_decoder=[2] * 3,
              kernel_sizes=[[3, 3, 3]] * 4,
              strides=[[1, 1, 1], [2, 2, 2], [2, 2, 2], [1, 2, 2]],
              num_classes=3, deep_supervision=True, dtype=jnp.float32,
              seg_dtype=jnp.float32, s2d_stages=2, s2d_factors=(1, 2, 2))
    net_nc = PlainConvUNetCF(**kw)
    net_nl = PlainConvUNetCF(**kw, s2d_layout="NL")
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 32, 32, 2),
                    jnp.float32)
    params = jax.jit(net_nc.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    o_nc = jax.jit(net_nc.apply, static_argnames="train")(
        params, x, train=False)
    o_nl = jax.jit(net_nl.apply, static_argnames="train")(
        params, x, train=False)
    for a, b in zip(o_nc, o_nl):
        assert a.shape == b.shape
        assert _rel_err(a, b) < 2e-5


def test_concat_free_skip_fusion_matches_concat():
    """CellConv/StackedConvBlocksS2D accept a tuple of channel partitions
    (decoder skip fusion); the split-weight execution must equal the conv
    of the concatenated input to float roundoff."""
    from multimodal_mvd_seg_tpu.models.blocks import StackedConvBlocksS2D
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(1, 8 * 4, 8, 8, 8), jnp.float32)
    b = jnp.asarray(rng.randn(1, 8 * 4, 8, 8, 8), jnp.float32)
    blk = StackedConvBlocksS2D(2, 16, (3, 3, 3), (1, 1, 1),
                               (1, 2, 2), (1, 2, 2), dtype=jnp.float32)
    params = blk.init(jax.random.PRNGKey(0),
                      jnp.concatenate([a, b], axis=1), train=False)
    o_cat = blk.apply(params, jnp.concatenate([a, b], axis=1), train=True)
    o_tup = blk.apply(params, (a, b), train=True)
    assert _rel_err(o_cat, o_tup) < 1e-5


def test_contrastive_net_s2d_layout_nl_matches_nc():
    """The MVD dual net's s2d_layout='NL' execution must produce the same
    dual logits/features as NC from the SAME parameter tree. In NL the
    full-res heads emit channels-last directly (UnetOutBlockCF), so both
    modes compare in the channels-last contract the trainers consume."""
    from multimodal_mvd_seg_tpu.models.contrastive_net import ContrastiveNet
    kw = dict(input_channels=2, num_classes=3, feature_size=16,
              depths=(1, 1, 1, 1), do_ds=True, remat=False,
              dtype=jnp.float32, s2d_factors=(2, 2, 2))
    net_nc = ContrastiveNet(**kw)
    net_nl = ContrastiveNet(**kw, s2d_layout="NL")
    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 32, 32, 2),
                    jnp.float32)
    params = jax.jit(net_nc.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    o_nc = jax.jit(net_nc.apply, static_argnames="train")(
        params, x, train=False)
    o_nl = jax.jit(net_nl.apply, static_argnames="train")(
        params, x, train=False)
    flat_nc, flat_nl = jax.tree.leaves(o_nc), jax.tree.leaves(o_nl)
    assert len(flat_nc) == len(flat_nl) == 8  # 3+3 DS logits + 2 features
    for a, b in zip(flat_nc, flat_nl):
        assert a.shape == b.shape
        assert _rel_err(a, b) < 2e-5

    # the probe forward (two-phase topo) takes the same layout knob
    v_nc = jax.jit(net_nc.apply, static_argnames=("train", "method"))(
        params, x, train=False, method="forward_vessel1")
    v_nl = jax.jit(net_nl.apply, static_argnames=("train", "method"))(
        params, x, train=False, method="forward_vessel1")
    assert v_nc.shape == v_nl.shape
    assert _rel_err(v_nc, v_nl) < 2e-5


@pytest.mark.parametrize("f", FACTORS)
def test_zero_phase_stride1_pair(data, f, monkeypatch):
    """MVDSEG_S2D_PHASE=zero: a stride-1 kernel-3 conv pair expressed as
    two phase-0 -> phase-0 cell convs (K_cell=3 per factored axis) equals
    the plain conv pair — no phase-up arrays, no artifact masks."""
    rs, x = data
    rep = s2d.rep_of(f)
    w1 = jnp.asarray(rs.randn(8, 3, 3, 3, 3) * 0.2, jnp.float32)
    w2 = jnp.asarray(rs.randn(8, 8, 3, 3, 3) * 0.2, jnp.float32)
    ref = plain_conv(plain_conv(x, w1), w2)

    xc = s2d.space_to_depth(x, f)
    spec1 = s2d.CellConvSpec((3, 3, 3), (1, 1, 1), rep, rep, xc.shape[2:])
    spec2 = s2d.CellConvSpec((3, 3, 3), (1, 1, 1), rep, rep, xc.shape[2:])
    assert spec1.K_cell == tuple(3 for _ in f)  # K=3 on every axis
    y = spec2(spec1(xc, w1), w2)
    out = s2d.depth_to_space(y, f)
    assert _rel_err(out, ref) < 1e-5


def test_unet_s2d_zero_phase_equivalence(monkeypatch):
    """The full s2d U-Net under MVDSEG_S2D_PHASE=zero matches the plain
    execution (same param tree, same outputs)."""
    monkeypatch.setenv("MVDSEG_S2D_PHASE", "zero")
    kw = dict(features_per_stage=[8, 16, 32, 64],
              n_conv_per_stage_encoder=[2] * 4,
              n_conv_per_stage_decoder=[2] * 3,
              kernel_sizes=[[3, 3, 3]] * 4,
              strides=[[1, 1, 1], [2, 2, 2], [2, 2, 2], [1, 2, 2]],
              num_classes=3, deep_supervision=True, dtype=jnp.float32,
              seg_dtype=jnp.float32)
    from multimodal_mvd_seg_tpu.models.unet import PlainConvUNetCF
    net0 = PlainConvUNetCF(**kw)

    net2 = PlainConvUNetCF(**kw, s2d_stages=2, s2d_factors=(1, 2, 2))
    x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 32, 32, 2),
                    jnp.float32)
    p0 = jax.jit(lambda r, t: net0.init(r, t, train=False))(
        jax.random.PRNGKey(0), x)["params"]
    p2 = jax.jit(lambda r, t: net2.init(r, t, train=False))(
        jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p0) == jax.tree.structure(p2)
    o0 = net0.apply({"params": p0}, x, train=True)
    o2 = net2.apply({"params": p0}, x, train=True)
    for a, b in zip(o0, o2):
        assert _rel_err(a, b) < 1e-4


def test_unetrpp_block_zero_phase(monkeypatch):
    """UnetResBlockCF (the MVD flagship's conv block) under zero-phase s2d
    matches its plain channels-first execution."""
    from multimodal_mvd_seg_tpu.models.unetrpp import UnetResBlockCF
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(1, 8, 4, 4, 8), jnp.float32)
    plain = UnetResBlockCF(8, dtype=jnp.float32)
    params = plain.init(jax.random.PRNGKey(0), x)
    ref = plain.apply(params, x)
    monkeypatch.setenv("MVDSEG_S2D_PHASE", "zero")
    s2dnet = UnetResBlockCF(8, s2d_factors=(2, 2, 2), dtype=jnp.float32)
    xc = s2d.space_to_depth(x, (2, 2, 2))
    p2 = s2dnet.init(jax.random.PRNGKey(0), xc)
    assert jax.tree.structure(params) == jax.tree.structure(p2)
    out = s2d.depth_to_space(s2dnet.apply(params, xc), (2, 2, 2))
    assert _rel_err(out, ref) < 1e-4


def test_contrastive_net_zero_phase_matches_default(monkeypatch):
    """The MVD dual net under MVDSEG_S2D_PHASE=zero produces the same
    outputs as the default phase-shift execution, same parameter tree."""
    from multimodal_mvd_seg_tpu.models.contrastive_net import ContrastiveNet
    kw = dict(input_channels=2, num_classes=3, feature_size=16,
              depths=(1, 1, 1, 1), do_ds=True, remat=False,
              dtype=jnp.float32, s2d_factors=(2, 2, 2))
    net = ContrastiveNet(**kw)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 16, 32, 32, 2),
                    jnp.float32)
    params = jax.jit(net.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    o_ref = jax.jit(net.apply, static_argnames="train")(
        params, x, train=False)
    monkeypatch.setenv("MVDSEG_S2D_PHASE", "zero")
    o_zero = jax.jit(net.apply, static_argnames="train")(
        params, x, train=False)
    for a, b in zip(jax.tree.leaves(o_ref), jax.tree.leaves(o_zero)):
        assert a.shape == b.shape
        assert _rel_err(a, b) < 2e-5


def test_unet_nl_zero_phase_matches_default(monkeypatch):
    """The NL cell layout composes with zero-phase execution (the perf
    campaign measures this combination): same outputs as the default
    NC/phase-shift execution from the same parameter tree."""
    from multimodal_mvd_seg_tpu.models.unet import PlainConvUNetCF
    kw = dict(features_per_stage=[8, 16, 32, 64],
              n_conv_per_stage_encoder=[2] * 4,
              n_conv_per_stage_decoder=[2] * 3,
              kernel_sizes=[[3, 3, 3]] * 4,
              strides=[[1, 1, 1], [2, 2, 2], [2, 2, 2], [1, 2, 2]],
              num_classes=3, deep_supervision=True, dtype=jnp.float32,
              seg_dtype=jnp.float32, s2d_stages=2, s2d_factors=(1, 2, 2))
    net_ref = PlainConvUNetCF(**kw)
    x = jnp.asarray(np.random.RandomState(4).randn(1, 16, 32, 32, 2),
                    jnp.float32)
    params = jax.jit(net_ref.init, static_argnames="train")(
        jax.random.PRNGKey(0), x, train=False)
    o_ref = jax.jit(net_ref.apply, static_argnames="train")(
        params, x, train=False)
    monkeypatch.setenv("MVDSEG_S2D_PHASE", "zero")
    net_nl = PlainConvUNetCF(**kw, s2d_layout="NL")
    o_nl = jax.jit(net_nl.apply, static_argnames="train")(
        params, x, train=False)
    for a, b in zip(o_ref, o_nl):
        assert a.shape == b.shape
        assert _rel_err(a, b) < 2e-5


def test_unet_s2d_torch_padding_equivalence():
    """conv_padding="TORCH" (imported reference checkpoints) through the
    s2d path: CellConvSpec(pad_mode="TORCH") strided entry convs +
    transpconv bias must reproduce the plain TORCH-padded execution (which
    test_torch_import.py pins against real torch)."""
    from multimodal_mvd_seg_tpu.models.unet import PlainConvUNetCF
    kw = dict(features_per_stage=[8, 16, 32, 64],
              n_conv_per_stage_encoder=[2] * 4,
              n_conv_per_stage_decoder=[2] * 3,
              kernel_sizes=[[3, 3, 3]] * 4,
              strides=[[1, 1, 1], [2, 2, 2], [2, 2, 2], [1, 2, 2]],
              num_classes=3, deep_supervision=True, dtype=jnp.float32,
              seg_dtype=jnp.float32, conv_padding="TORCH",
              transpconv_bias=True)
    net0 = PlainConvUNetCF(**kw)
    net2 = PlainConvUNetCF(**kw, s2d_stages=2, s2d_factors=(1, 2, 2))
    x = jnp.asarray(np.random.RandomState(1).randn(1, 16, 32, 32, 2),
                    jnp.float32)
    p0 = jax.jit(lambda r, t: net0.init(r, t, train=False))(
        jax.random.PRNGKey(0), x)["params"]
    p2 = jax.jit(lambda r, t: net2.init(r, t, train=False))(
        jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p0) == jax.tree.structure(p2)
    # make the transpconv biases non-zero so the s2d bias path is exercised
    rng = np.random.RandomState(2)
    p0 = jax.tree_util.tree_map_with_path(
        lambda path, v: jnp.asarray(rng.randn(*v.shape), v.dtype)
        if "bias" in str(path) and "up" in str(path) else v, p0)
    o0 = net0.apply({"params": p0}, x, train=True)
    o2 = net2.apply({"params": p0}, x, train=True)
    for a, b in zip(o0, o2):
        assert _rel_err(a, b) < 1e-4


def test_cellconvspec_rejects_odd_phase1_length():
    """A phase-1 output rep can only represent logical lengths divisible by
    the factor (one artifact row per end); odd lengths must be rejected,
    not silently mask out a real data row."""
    from multimodal_mvd_seg_tpu.ops.s2d import CellConvSpec
    with pytest.raises(AssertionError):
        CellConvSpec((3,), (2,), ((2, 0),), ((2, 1),), (3,))
    # the legit phase-up geometry still builds
    CellConvSpec((3,), (1,), ((2, 0),), ((2, 1),), (4,))


def test_norm_impl_dot_matches_xla(monkeypatch):
    """MVDSEG_NORM_IMPL=dot (f32-accumulating bf16 reductions, no f32
    materialization) must match the default "xla" formulation to
    reduction-order tolerance — masked (phase-up) and unmasked reps, both
    layouts."""
    import os
    import jax.numpy as jnp
    from multimodal_mvd_seg_tpu.ops import s2d

    rng = np.random.RandomState(4)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (16,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    for rep, cells in ((s2d.rep_of((2, 2, 1)), (9, 9, 8)),
                       (s2d.phase_up(s2d.rep_of((2, 2, 1))), (10, 10, 8)),
                       (s2d.rep_of((1, 1, 1)), (8, 8, 8))):
        F = s2d.rep_F(rep)
        for layout in ("NC", "NL"):
            shape = (2, 16 * F, *cells) if layout == "NC" \
                else (2, *cells, 16 * F)
            x = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
            monkeypatch.setenv("MVDSEG_NORM_IMPL", "xla")
            ref = np.asarray(s2d.masked_instance_norm_act(
                x, rep, scale, bias, layout=layout), np.float32)
            monkeypatch.setenv("MVDSEG_NORM_IMPL", "dot")
            got = np.asarray(s2d.masked_instance_norm_act(
                x, rep, scale, bias, layout=layout), np.float32)
            np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
            # bf16 grid: most entries should be bitwise identical
            assert (got == ref).mean() > 0.95, (layout, rep)


def test_norm_elemwise_bf16_matches_f32(monkeypatch):
    """MVDSEG_NORM_ELEMWISE=bf16 (apply pass in bf16 with pre-cast
    coefficients — keeps full-size f32 materializations of x out of the
    HLO) must match the f32 apply to ~1-2 bf16 ulps; exact zeros on
    artifact rows must be preserved."""
    import jax.numpy as jnp
    from multimodal_mvd_seg_tpu.ops import s2d
    from multimodal_mvd_seg_tpu.models.blocks import instance_norm_act_cf

    rng = np.random.RandomState(5)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (16,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    monkeypatch.setenv("MVDSEG_NORM_IMPL", "xla")
    for rep, cells in ((s2d.rep_of((2, 2, 1)), (9, 9, 8)),
                       (s2d.phase_up(s2d.rep_of((2, 2, 1))), (10, 10, 8))):
        F = s2d.rep_F(rep)
        x = jnp.asarray(rng.normal(size=(2, 16 * F, *cells)), jnp.bfloat16)
        monkeypatch.setenv("MVDSEG_NORM_ELEMWISE", "f32")
        ref = np.asarray(s2d.masked_instance_norm_act(
            x, rep, scale, bias), np.float32)
        monkeypatch.setenv("MVDSEG_NORM_ELEMWISE", "bf16")
        got = np.asarray(s2d.masked_instance_norm_act(
            x, rep, scale, bias), np.float32)
        np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)
        assert (got == ref).mean() > 0.5, rep
        # artifact rows stay exactly zero: the bf16 path must produce
        # zeros wherever the f32 path did
        if any(f > 1 and p for f, p in rep):
            assert ((ref == 0) <= (got == 0)).all()
    # channels-first (non-s2d) form
    x = jnp.asarray(rng.normal(size=(2, 16, 8, 8, 8)), jnp.bfloat16)
    monkeypatch.setenv("MVDSEG_NORM_ELEMWISE", "f32")
    ref = np.asarray(instance_norm_act_cf(x, scale=scale, bias=bias),
                     np.float32)
    monkeypatch.setenv("MVDSEG_NORM_ELEMWISE", "bf16")
    got = np.asarray(instance_norm_act_cf(x, scale=scale, bias=bias),
                     np.float32)
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)
