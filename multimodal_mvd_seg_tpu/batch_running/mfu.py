"""MFU / roofline accounting of the headline bench step (hardware facts,
not anchor folklore).

Compiles the EXACT `bench.py` train step for the current backend, reads
XLA's cost analysis of the compiled executable (flops / bytes accessed —
exact for the HLO actually executed), times the full step plus its parts
(eval fwd, fwd+bwd, DS loss, optimizer), and prints achieved TF/s as %MFU
and GB/s as %HBM against the chip peaks. Feeds the table in
documentation/tpu_performance.md.

Honors the same env knobs as bench.py (MVDSEG_BENCH_S2D_LAYOUT,
MVDSEG_NORM_IMPL, MVDSEG_S2D_PHASE).

Run on the bench chip:
  PYTHONPATH=/root/repo:/root/.axon_site python -m \
      multimodal_mvd_seg_tpu.batch_running.mfu [--peak-tf 197] [--peak-gbs 819]
"""

import argparse
import time

import jax
import jax.numpy as jnp


def _sync(x):
    # tiny scalar readback: on tunneled backends block_until_ready alone
    # does not synchronize (documentation/tpu_performance.md)
    return float(jnp.sum(x.ravel()[:2]))


def _timed(name, fn, *args, n=10, warm=3):
    out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    for _ in range(warm):
        out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1000:.1f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--peak-tf", type=float, default=197.0,
                    help="chip bf16 peak, TFLOP/s (v5e default)")
    ap.add_argument("--peak-gbs", type=float, default=819.0,
                    help="chip HBM peak, GB/s (v5e default)")
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import bench
    print("devices:", jax.devices(), flush=True)
    step, (params, opt_state, data, seg), parts = bench.build_step(
        return_parts=True)
    jstep = jax.jit(step)
    comp = jstep.lower(params, opt_state, data, seg).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", -1))
    byts = float(ca.get("bytes accessed", -1))
    print(f"TPU-compiled cost analysis: {flops / 1e12:.3f} TFLOP, "
          f"{byts / 1e9:.1f} GB accessed", flush=True)

    dt = _timed("full train step", jstep, params, opt_state, data, seg,
                n=args.steps)
    print(f"=> {1 / dt:.2f} steps/s | {flops / dt / 1e12:.1f} TF/s "
          f"({flops / dt / 1e12 / args.peak_tf * 100:.0f}% MFU) | "
          f"{byts / dt / 1e9:.0f} GB/s "
          f"({byts / dt / 1e9 / args.peak_gbs * 100:.0f}% HBM)", flush=True)

    # per-part rows of the MFU table (documentation/tpu_performance.md)
    _timed("eval fwd", jax.jit(parts["fwd_eval"]), params, data,
           n=args.steps)
    _timed("fwd+bwd (incl. DS loss)", jax.jit(parts["fwd_bwd"]),
           params, data, seg, n=args.steps)
    outs = jax.jit(parts["fwd_train"])(params, data)
    outs = jax.block_until_ready(outs)
    _timed("DS loss alone", jax.jit(parts["ds_loss"]), outs, seg,
           n=args.steps)
    _, grads = jax.jit(parts["fwd_bwd"])(params, data, seg)
    grads = jax.block_until_ready(grads)
    _timed("optimizer alone", jax.jit(parts["opt_update"]),
           params, opt_state, grads, n=args.steps)

    # roofline floors at the compiled executable's own counts
    print(f"roofline floors: compute {flops / args.peak_tf / 1e12 * 1000:.0f}"
          f" ms | bandwidth {byts / args.peak_gbs / 1e9 * 1000:.0f} ms",
          flush=True)
    print("MFU DONE", flush=True)


if __name__ == "__main__":
    main()
