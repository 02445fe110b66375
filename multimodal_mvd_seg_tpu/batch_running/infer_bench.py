"""Sliding-window inference timing under the REFERENCE protocol.

The reference predictor defaults to Gaussian-weighted tiles at step 0.5
WITH 8-way mirror TTA (predict_from_raw_data.py:562-589 — every tile is
forwarded once per flip-axis combination and the logits are averaged).
BASELINE.md's <2 s/case target is therefore only meaningful with TTA ON;
the round-1/2 0.35 s/case figure was TTA OFF. This harness times the
on-device portion of `predict_preprocessed_case` for one case at a given
volume shape, for each TTA mode:

  - ``off``      : no mirroring (the round-1 number's protocol)
  - ``loop``     : reference dataflow — 2^n sequential forwards per tile
  - ``batched``  : TPU-native — all 2^n flip variants concatenated into
                   the tile batch, ONE forward at 2^n x batch
                   (tta_mode="batched"; exact-equality with loop is pinned
                   in tests/test_tta_modes.py)

Usage (bench chip):
    python -m multimodal_mvd_seg_tpu.batch_running.infer_bench \
        [--volume 96 160 320] [--tile-batch 2] [--repeats 3]

Prints one JSON line per mode: {"mode", "s_per_case", "n_tiles",
"n_forward_tiles"} — s_per_case is ON-DEVICE wall time, measured as the
slope between 1 and 1+N chained dispatches of the compiled scan with a
single 4-byte scalar sync at the end. Slope timing is required on this
pool's tunneled backend: the tunnel reads back at ~8 MB/s, so a full
device_get of the (5, *volume) f32 logits costs ~12 s — two orders of
magnitude more than the same readback over PCIe on a real TPU host —
and `block_until_ready()` does not synchronize. The end-to-end
time including the tunnel readback is reported separately as
"s_per_case_with_tunnel_readback".
"""

import argparse
import itertools
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--volume", type=int, nargs=3, default=(96, 160, 320))
    ap.add_argument("--tile-batch", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--slope-n", type=int, default=4,
                    help="extra dispatches for the slope measurement")
    ap.add_argument("--modes", nargs="*",
                    default=("off", "loop", "batched"))
    args = ap.parse_args()

    import jax
    from ..inference.predictor import nnUNetPredictor
    from ..inference.sliding_window import (compute_steps_for_sliding_window,
                                            pad_nd_image)
    from ..plans.plans_handler import PlansManager
    import __graft_entry__  # repo-root driver entry: tiny plans builder
    import bench

    # the bench.py flagship-shape network (2ch 64x128x256 patches, 5 classes)
    net, params, patch_, _strides = bench.build_network()

    plans, dataset_json = __graft_entry__._tiny_plans_and_dataset(
        patch=(64, 128, 256), channels=2, classes=5)
    plans["configurations"]["3d_fullres"]["batch_size"] = 2
    pm = PlansManager(plans)
    cfg = pm.get_configuration("3d_fullres")

    rs = np.random.RandomState(0)
    data = rs.normal(size=(2, *args.volume)).astype(np.float32)

    patch = (64, 128, 256)
    padded, _ = pad_nd_image(np.moveaxis(data, 0, -1), (*patch, 2))
    steps = compute_steps_for_sliding_window(padded.shape[:-1], patch, 0.5)
    n_tiles = int(np.prod([len(s) for s in steps]))

    for mode in args.modes:
        p = nnUNetPredictor(
            tile_step_size=0.5, use_gaussian=True,
            use_mirroring=(mode != "off"),
            allowed_mirroring_axes=(0, 1, 2),
            tile_batch_size=args.tile_batch,
            tta_mode=("batched" if mode == "batched" else "loop"))
        p.manual_initialization(net, pm, cfg, [{"params": params}],
                                dataset_json, "bench", (0, 1, 2))
        # warmup: compile + first execution + full tunnel readback (also
        # the end-to-end number, timed on the second call)
        logits = p.predict_preprocessed_case(data)
        np.asarray(logits)
        t0 = time.perf_counter()
        np.asarray(p.predict_preprocessed_case(data))
        e2e = time.perf_counter() - t0

        # on-device slope: k chained dispatches of the compiled scan,
        # one scalar readback to sync (block_until_ready is a no-op on
        # the tunneled backend). slope = ((1+N) - 1 dispatches) / N.
        padded, _ = pad_nd_image(np.moveaxis(data, 0, -1), (*patch, 2))
        steps = compute_steps_for_sliding_window(
            padded.shape[:-1], patch, 0.5)
        coords = np.array(list(itertools.product(*steps)), np.int32)
        n_pad = int(np.ceil(len(coords) / args.tile_batch)
                    * args.tile_batch)
        valid = np.zeros(n_pad, bool)
        valid[:len(coords)] = True
        coords_p = np.zeros((n_pad, coords.shape[1]), np.int32)
        coords_p[:len(coords)] = coords
        fn = p._get_sliding_window_fn(padded.shape[:-1], n_pad, 2,
                                      logits.shape[0])
        import jax.numpy as jnp
        vol_dev, cd, vd = (jnp.asarray(padded), jnp.asarray(coords_p),
                           jnp.asarray(valid))
        pr = p.params_list[0]

        def run_k(k):
            t0 = time.perf_counter()
            for _ in range(k):
                out = fn(pr, vol_dev, cd, vd)
            np.asarray(out[0, 0, 0, 0])  # 4-byte sync
            return time.perf_counter() - t0

        run_k(1)  # settle
        best = float("inf")
        for _ in range(args.repeats):
            t1, tn = run_k(1), run_k(1 + args.slope_n)
            best = min(best, (tn - t1) / args.slope_n)
        n_fwd = n_tiles * (8 if mode != "off" else 1)
        print(json.dumps({
            "mode": mode,
            "s_per_case": round(best, 4),
            "s_per_case_with_tunnel_readback": round(e2e, 4),
            "n_tiles": n_tiles,
            "n_forward_tiles": n_fwd,
            "volume": list(args.volume),
            "tile_batch": args.tile_batch,
            "device": str(jax.devices()[0].device_kind),
        }))


if __name__ == "__main__":
    main()
