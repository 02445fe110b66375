"""Benchmark: 3d_fullres train-step throughput on the real chip.

Mirrors the reference's benchmark trainer protocol
(nnUNetTrainerBenchmark_5epochs_noDataLoading: fixed dummy batches, pure
device compute, fastest-window timing — reference
variants/benchmarking/nnUNetTrainerBenchmark_5epochs.py:31-64) on the MVD
paper's training shape: 2-channel 64×128×256 patches, batch 2
(HybridNetwork.py:1445-1453 / MVDTrainer.py:164-166).

Baseline anchor: an A100 runs a 250-iteration nnU-Net 3d_fullres epoch in
~120 s at this scale (documentation/benchmarking.md's spreadsheet-era numbers)
→ ~2.08 train steps/s. vs_baseline = our steps/s ÷ 2.08.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

A100_STEPS_PER_S = 250.0 / 120.0


def build_network(s2d_layout: str = None):
    """The benchmark network (PlainConvUNetCF at the MVD paper's 3d_fullres
    shape) and its initialized params — shared with
    batch_running/infer_bench.py (TTA-on sliding-window timing)."""
    import os
    if s2d_layout is None:
        # NL is the Pallas cell-conv path's layout (ops/pallas_cell.py,
        # blocks._cell_impl "auto" = pallas on TPU backends): measured
        # 5.78 vs 4.62 steps/s on the v5e. On CPU the pallas kernels
        # don't run, and NL+xla measured slower than NC+xla (4.41 vs
        # 4.62), so each backend defaults to its winning combination.
        default = "NC" if jax.default_backend() == "cpu" else "NL"
        s2d_layout = os.environ.get("MVDSEG_BENCH_S2D_LAYOUT", default)
    from multimodal_mvd_seg_tpu.models.unet import PlainConvUNetCF

    patch = (64, 128, 256)
    strides = [[1, 1, 1], [2, 2, 2], [2, 2, 2], [2, 2, 2], [2, 2, 2],
               [1, 2, 2]]
    # channels-first layout + space-to-depth execution of the two full-res
    # stages: the TPU fast path (s2d turns the small-channel stage-0/1 convs
    # into C>=128 cell convs the MXU runs 3.4x faster; measured 1.85 -> 3.0
    # steps/s on this shape — see ops/s2d.py and models/blocks.py)
    net = PlainConvUNetCF(
        features_per_stage=[32, 64, 128, 256, 320, 320],
        n_conv_per_stage_encoder=[2] * 6,
        n_conv_per_stage_decoder=[2] * 5,
        kernel_sizes=[[3, 3, 3]] * 6,
        strides=strides,
        num_classes=5,  # MVD: background + 4 key structures
        deep_supervision=True,
        s2d_stages=2,
        s2d_factors=(2, 2, 1),
        s2d_layout=s2d_layout)

    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((2, *patch, 2), jnp.bfloat16)
    # jitted init: eager flax init costs hundreds of tiny XLA programs
    params = jax.jit(lambda r, t: net.init(r, t, train=False))(rng, x)[
        "params"]
    return net, params, patch, strides


def build_step(s2d_layout: str = None, return_parts: bool = False):
    """The benchmark train step and its example arguments, unjitted —
    shared with batch_running/hlo_bytes.py (per-instruction HBM byte
    attribution of this exact executable). ``s2d_layout`` picks the cell
    layout of the space-to-depth stages ("NC"/"NL", see ops/s2d.py);
    default from $MVDSEG_BENCH_S2D_LAYOUT, else NL on TPU / NC on CPU.

    ``return_parts``: additionally return a dict of the step's pieces
    (eval fwd, train fwd, fwd+bwd, DS loss alone, optimizer alone), each
    an unjitted closure — batch_running/mfu.py times them for the
    per-part rows of documentation/tpu_performance.md's MFU table."""
    from multimodal_mvd_seg_tpu.losses.compound import DC_and_CE_loss
    from multimodal_mvd_seg_tpu.losses.deep_supervision import (
        DeepSupervisionWrapper, default_ds_weights)
    from multimodal_mvd_seg_tpu.data.augment import downsample_seg_for_ds

    batch = 2
    channels = 2
    classes = 5  # MVD: background + 4 key structures
    net, params, patch, strides = build_network(s2d_layout)

    ds_scales = [list(1 / np.array(s)) for s in
                 np.cumprod(np.vstack(strides), axis=0)][:-1]
    loss_obj = DeepSupervisionWrapper(DC_and_CE_loss(batch_dice=True),
                                      default_ds_weights(len(ds_scales)))

    tx = optax.chain(optax.clip_by_global_norm(12.0),
                     optax.add_decayed_weights(3e-5),
                     optax.sgd(1e-2, momentum=0.99, nesterov=True))
    opt_state = tx.init(params)

    def train_step(params, opt_state, data, seg):
        # data arrives (b, c, *patch): a compact HBM buffer (channels-last
        # would lane-pad c=2 to 128, a 64x-padded input the first read
        # pays for). The channels-last view below cancels against the
        # model's internal (B, C, *sp) entry transpose inside this jit.
        data_cl = jnp.moveaxis(data, 1, -1)
        targets = downsample_seg_for_ds(seg, ds_scales)

        def loss_fn(p):
            outs = net.apply({"params": p}, data_cl, train=True)
            return loss_obj(outs, targets)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    rs = np.random.RandomState(0)
    data = jnp.asarray(rs.normal(size=(batch, channels, *patch)),
                       jnp.bfloat16)
    seg = jnp.asarray(rs.randint(0, classes, (batch, *patch)), jnp.int32)
    if not return_parts:
        return train_step, (params, opt_state, data, seg)

    def fwd_eval(params, data):
        return net.apply({"params": params},
                         jnp.moveaxis(data, 1, -1), train=False)

    def fwd_train(params, data):
        return net.apply({"params": params},
                         jnp.moveaxis(data, 1, -1), train=True)

    def fwd_bwd(params, data, seg):
        targets = downsample_seg_for_ds(seg, ds_scales)

        def loss_fn(p):
            outs = net.apply({"params": p}, jnp.moveaxis(data, 1, -1),
                             train=True)
            return loss_obj(outs, targets)
        return jax.value_and_grad(loss_fn)(params)

    def ds_loss(outs, seg):
        return loss_obj(outs, downsample_seg_for_ds(seg, ds_scales))

    def opt_update(params, opt_state, grads):
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2

    parts = {"fwd_eval": fwd_eval, "fwd_train": fwd_train,
             "fwd_bwd": fwd_bwd, "ds_loss": ds_loss,
             "opt_update": opt_update}
    return train_step, (params, opt_state, data, seg), parts


def main():
    step, (params, opt_state, data, seg) = build_step()
    train_step = jax.jit(step, donate_argnums=(0, 1))

    # warmup / compile (float() forces a host readback: on the axon tunnel
    # block_until_ready alone does not synchronize)
    params, opt_state, loss = train_step(params, opt_state, data, seg)
    float(loss)

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = train_step(params, opt_state, data, seg)
    float(loss)
    dt = time.perf_counter() - t0

    steps_per_s = n_steps / dt
    print(json.dumps({
        "metric": "3d_fullres_train_steps_per_s",
        "value": round(steps_per_s, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / A100_STEPS_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
