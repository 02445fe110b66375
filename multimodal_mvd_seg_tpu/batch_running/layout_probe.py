"""Cell-conv layout probe: channels-first (NC) vs channels-last (NL) cells.

The 3d_fullres train step is bandwidth-bound in the two full-resolution
s2d stages (documentation/tpu_performance.md MFU table): XLA's counted
bytes are ~7x what the activation arithmetic requires. Leading suspect:
the NCDHW cell layout forces relayout copies around every TPU convolution
(the hardware's native conv layout keeps the feature dim on the 128-lane
axis, i.e. channels-last; in the cell domain C*F >= 128 so channels-last
pads nothing). This probe times the *hot stage structure* — the stride-1
phase-alternating cell-conv + masked-norm pairs of stage 0/1 — in both
layouts, fwd+bwd, and prints XLA's counted flops/bytes per variant.

Run on the bench chip:
  PYTHONPATH=/root/repo:/root/.axon_site python -m \
      multimodal_mvd_seg_tpu.batch_running.layout_probe
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import s2d


def _sync(x):
    # block_until_ready may not synchronize on tunneled backends; force a
    # tiny scalar readback (memory: axon tunnel quirks)
    return float(jnp.sum(jnp.ravel(x)[:2]))


def stage_fn(layout, c, cells, factors, n_convs=4):
    """n stride-1 convs at C=c in the cell domain of `factors`, with masked
    instance norm + leaky relu after each — the byte-dominant structure of
    the full-res U-Net stages."""
    rep0 = s2d.rep_of(factors)
    rep1 = s2d.phase_up(rep0)
    F = s2d.rep_F(rep0)
    kernel = (3, 3, 3)

    def make_specs():
        specs = []
        rep = rep0
        lens = tuple(cells)
        for i in range(n_convs):
            rep_out = rep1 if i % 2 == 0 else rep0
            spec = s2d.CellConvSpec(kernel, (1, 1, 1), rep, rep_out, lens)
            specs.append((spec, rep_out))
            lens = tuple(spec.out_lens)
            rep = rep_out
        return specs

    specs = make_specs()

    def fn(x, ws, scales, biases):
        for (spec, rep_out), w, sc, bi in zip(specs, ws, scales, biases):
            x = spec(x, w.astype(x.dtype), layout=layout)
            x = s2d.masked_instance_norm_act(x, rep_out, sc, bi,
                                             layout=layout)
        return x

    return fn, specs, F


def run_variant(layout, c=32, cells=(32, 64, 256), factors=(2, 2, 1),
                batch=2, n_convs=4, steps=20):
    fn, specs, F = stage_fn(layout, c, cells, factors, n_convs)
    rng = np.random.RandomState(0)
    if layout == "NC":
        x = jnp.asarray(rng.randn(batch, c * F, *cells), jnp.bfloat16)
    else:
        x = jnp.asarray(rng.randn(batch, *cells, c * F), jnp.bfloat16)
    ws = [jnp.asarray(rng.randn(c, c, 3, 3, 3) * 0.05, jnp.float32)
          for _ in range(n_convs)]
    scales = [jnp.ones((c,), jnp.float32)] * n_convs
    biases = [jnp.zeros((c,), jnp.float32)] * n_convs

    def loss(x, ws, scales, biases):
        return jnp.sum(fn(x, ws, scales, biases).astype(jnp.float32))

    grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
    compiled = grad.lower(x, ws, scales, biases).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = ca.get("flops", float("nan"))
        bytes_ = ca.get("bytes accessed", float("nan"))
    except Exception as e:
        flops = bytes_ = float("nan")
        print(f"  cost_analysis failed: {e}")
    for _ in range(3):
        out = grad(x, ws, scales, biases)
        _sync(out[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = grad(x, ws, scales, biases)
    _sync(out[0])
    dt = (time.perf_counter() - t0) / steps
    print(f"[{layout}] c={c} cells={cells} f={factors} n={n_convs}: "
          f"{dt * 1e3:.1f} ms fwd+bwd | {flops / 1e12:.2f} TFLOP | "
          f"{bytes_ / 1e9:.1f} GB | {flops / dt / 1e12:.1f} TF/s | "
          f"{bytes_ / dt / 1e9:.0f} GB/s", flush=True)
    return dt


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    # stage 0 of the bench shape (patch 64x128x256, factors (2,2,1))
    for layout in ("NC", "NL"):
        run_variant(layout, c=32, cells=(32, 64, 256))
    # stage 1 (stride 2: cells halve, C=64, same factors)
    for layout in ("NC", "NL"):
        run_variant(layout, c=64, cells=(16, 32, 128))


if __name__ == "__main__":
    main()
