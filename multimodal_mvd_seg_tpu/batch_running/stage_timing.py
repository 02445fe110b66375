"""Per-stage wall-time attribution of the bench train step.

mfu.py times the whole step and its coarse parts (fwd / fwd+bwd / loss /
optimizer); the HLO byte ranking (hlo_bytes.py) attributes STATIC bytes
but round 2/3 A/Bs showed static bytes do not predict wall time on this
chip (XLA overlaps the relayout copies). This probe measures TIME per
U-Net stage directly: it rebuilds every encoder stage / upconv / decoder
stage of the exact bench network (same factors/layout/padding via
models/unet.py's wiring rules) as a standalone module at its real input
shape, and times jitted fwd and fwd+bwd(sum) for each, plus each
sub-executable's own XLA cost analysis (flops/bytes) so per-stage
achieved TF/s / GB/s fall out.

Caveat: per-stage sums exceed the fused full-step time (the full step
overlaps stages and shares boundary tensors); the value is the RANKING
and each stage's distance from its own roofline.

Run on the bench chip:
  PYTHONPATH=/root/repo:/root/.axon_site python -m \
      multimodal_mvd_seg_tpu.batch_running.stage_timing [--steps 10]
"""

import argparse
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.ravel()[:2]))


def _timed(fn, *args, n=10, warm=2):
    import jax
    out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    for _ in range(warm):
        out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--peak-tf", type=float, default=197.0)
    ap.add_argument("--peak-gbs", type=float, default=819.0)
    ap.add_argument("--only", nargs="*", default=None,
                    help="probe only these stage names (e.g. enc0 dec4) — "
                         "each probe costs two slow tunnel compiles")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ..models import unet as unet_mod
    from ..models.blocks import (StackedConvBlocksCF, StackedConvBlocksS2D,
                                 ConvTransposeCF, ConvTransposeS2D)
    from ..ops import s2d as _s2d

    import os
    layout = os.environ.get("MVDSEG_BENCH_S2D_LAYOUT", "NC")
    patch = (64, 128, 256)
    B, channels = 2, 2
    features = [32, 64, 128, 256, 320, 320]
    n_enc = [2] * 6
    n_dec = [2] * 5
    kernels = [[3, 3, 3]] * 6
    strides = [[1, 1, 1], [2, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2],
               [1, 2, 2]]
    sf = unet_mod.s2d_stage_factors(patch, kernels, strides, n_enc, n_dec,
                                    2, (2, 2, 1))
    dim = 3

    def factored(s):
        return any(f > 1 for f in sf[s])

    def lay(s):
        return "NL" if factored(s) and layout == "NL" else "NC"

    def spatial_at(s):
        sp = np.array(patch)
        for t in strides[1:s + 1]:
            sp //= np.array(t)
        return tuple(int(v) for v in sp)

    def cell_shape(s, C):
        """NC cell tensor shape of a stage-s activation with C logical ch."""
        f = sf[s]
        sp = np.array(spatial_at(s)) // np.array(f)
        F = int(np.prod(f))
        return (B, C * F, *map(int, sp))

    rs = np.random.RandomState(0)

    def rnd(shape, s=0):
        """stage-s activation in the bench layout (NC, or NL when the
        stage is factored and MVDSEG_BENCH_S2D_LAYOUT=NL)."""
        x = jnp.asarray(rs.normal(size=shape).astype(np.float32)
                        ).astype(jnp.bfloat16)
        return jnp.moveaxis(x, 1, -1) if lay(s) == "NL" else x

    rows = []

    def probe(name, module, *xs):
        if args.only and name not in args.only:
            return
        vs = jax.jit(lambda r: module.init(r, *xs))(jax.random.PRNGKey(0))

        def fwd(v, *t):
            return jnp.sum(module.apply(v, *t).astype(jnp.float32))

        def fwdbwd(v, *t):
            return jax.value_and_grad(fwd)(v, *t)

        # AOT-compile each exactly once (a jit object would recompile on
        # first call even after .lower().compile()) — 16 probes x slow
        # tunnel compiles make duplicates prohibitive
        cf = jax.jit(fwd).lower(vs, *xs).compile()
        cb = jax.jit(fwdbwd).lower(vs, *xs).compile()
        ca = cb.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl, by = float(ca.get("flops", 0)), float(ca.get(
            "bytes accessed", 0))
        tf = _timed(cf, vs, *xs, n=args.steps)
        tb = _timed(cb, vs, *xs, n=args.steps)
        rows.append((name, tf, tb, fl, by))
        print(f"{name:<16s} fwd {tf*1e3:7.1f} ms   fwd+bwd {tb*1e3:7.1f} ms"
              f"   {fl/1e12:5.2f} TFLOP {by/1e9:6.1f} GB"
              f"   => {fl/tb/1e12:5.1f} TF/s {by/tb/1e9:5.0f} GB/s",
              flush=True)

    # encoder stages (mirrors PlainConvUNetCF.__call__ wiring)
    for s in range(6):
        in_f = sf[0] if s == 0 else sf[s - 1]
        use_s2d = factored(s) or any(ff > 1 for ff in in_f)
        C_in = channels if s == 0 else features[s - 1]
        # input: stage-(s-1) activation (cell domain at in_f); stage 0 input
        # is the space_to_depth'd image at sf[0]
        if s:
            xin = rnd(cell_shape(s - 1, C_in), s - 1)
        else:
            # stage-0 input is the space_to_depth'd image — NL cells when
            # the bench layout is NL (unet.py feeds space_to_depth_cl so
            # the entry conv runs the fused Pallas path), NC otherwise
            xin = rnd(cell_shape(0, channels), 0)
        if use_s2d:
            li = lay(0) if s == 0 else lay(s - 1)
            m = StackedConvBlocksS2D(n_enc[s], features[s], kernels[s],
                                     strides[s], tuple(in_f), tuple(sf[s]),
                                     layout=lay(s), layout_in=li,
                                     input_no_grad=(s == 0))
        else:
            m = StackedConvBlocksCF(n_enc[s], features[s], kernels[s],
                                    strides[s])
        probe(f"enc{s}", m, xin)

    # decoder: upconv + conv block per stage
    for d in range(5):
        skip = 4 - d
        f = features[skip]
        stride = tuple(strides[skip + 1])
        src_f, dst_f = sf[skip + 1], sf[skip]
        xin = rnd(cell_shape(skip + 1, features[skip + 1]), skip + 1)
        if factored(skip) or any(ff > 1 for ff in src_f):
            up = ConvTransposeS2D(f, stride, stride, tuple(src_f),
                                  tuple(dst_f), layout_in=lay(skip + 1),
                                  layout_out=lay(skip))
        else:
            up = ConvTransposeCF(f, stride, stride)
        probe(f"up{d}", up, xin)
        xup = rnd(cell_shape(skip, f), skip)
        xskip = rnd(cell_shape(skip, f), skip)
        if factored(skip):
            m = StackedConvBlocksS2D(n_dec[d], f, kernels[skip],
                                     (1,) * dim, tuple(dst_f), tuple(dst_f),
                                     layout=lay(skip), layout_in=lay(skip))
            probe(f"dec{d}", m, (xup, xskip))
        else:
            m = StackedConvBlocksCF(n_dec[d], f, kernels[skip], (1,) * dim)
            probe(f"dec{d}", m, jnp.concatenate([xup, xskip], axis=1))

    tot_f = sum(r[1] for r in rows)
    tot_b = sum(r[2] for r in rows)
    print(f"\nsum of stages: fwd {tot_f*1e3:.1f} ms, fwd+bwd "
          f"{tot_b*1e3:.1f} ms  (full-step bench ~218 ms reference; "
          f"overlap makes the fused step cheaper than the sum)")
    print("STAGE TIMING DONE", flush=True)


if __name__ == "__main__":
    main()
