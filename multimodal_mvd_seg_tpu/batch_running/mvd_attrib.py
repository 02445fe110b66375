"""Wall-clock attribution of the MVD flagship (ContrastiveTrainer) step.

Times, on the current backend, at the paper scale (2ch 64x128x256, the
dual-branch ContrastiveNet from the plans the driver entry uses):

  - the full train step with the topological term OFF,
  - on-device augmentation alone (channels-first batch contract),
  - the full two-phase topological step, pipelined and sequential
    (losses/topo.py two-phase mode: device probe jit -> host
    persistence/matching -> train jit),
  - the host persistence + optimal-matching cost alone.

Feeds the MVD table in documentation/tpu_performance.md. Honors
MVDSEG_MVD_S2D_LAYOUT / MVDSEG_NORM_IMPL / MVDSEG_S2D_PHASE.

Run from the repo root (imports the driver entry's tiny-plans helper):
  PYTHONPATH=/root/repo:/root/.axon_site python -m \
      multimodal_mvd_seg_tpu.batch_running.mvd_attrib
"""

import os
import tempfile
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.ravel()[:2]))


def main():
    for name in ("results", "preprocessed", "raw"):
        key = f"MVDSEG_{name}"
        if key not in os.environ:
            os.environ[key] = tempfile.mkdtemp(prefix=f"mvd_attrib_{name}_")

    import jax
    try:
        import __graft_entry__ as ge
    except ImportError as e:  # repo root not on sys.path
        raise SystemExit(
            "run from the repo root (needs __graft_entry__.py): " + str(e))
    from multimodal_mvd_seg_tpu import paths
    paths.refresh()
    from multimodal_mvd_seg_tpu.data.augment import augment_batch
    from multimodal_mvd_seg_tpu.training.mvd_trainer import (
        ContrastiveTrainer, topo_match_host)

    print("devices:", jax.devices(), flush=True)
    plans, dataset_json = ge._tiny_plans_and_dataset(
        patch=(64, 128, 256), channels=2, classes=5)

    class _Quiet(ContrastiveTrainer):
        def print_to_log_file(self, *args, **kwargs):
            print(*args, flush=True)

    trainer = _Quiet(plans, "3d_fullres", 0, dataset_json)
    trainer.n_data_parallel = 1
    trainer.topo_mode = "off"
    t0 = time.perf_counter()
    trainer.initialize()
    print(f"init {time.perf_counter() - t0:.0f}s", flush=True)

    bs = trainer.configuration_manager.batch_size
    init_patch = tuple(trainer._initial_patch_size)
    rng = np.random.RandomState(0)
    data = jax.device_put(
        rng.normal(size=(bs, 2, *init_patch)).astype(np.float32),
        trainer._batch_sharding)
    seg = jax.device_put(
        rng.randint(0, 3, size=(bs, *init_patch)).astype(np.int32),
        trainer._batch_sharding)

    def steady(label, n=8, warm=3):
        m = None
        for _ in range(warm):
            m = trainer.train_step(data, seg)
        _sync(m["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            m = trainer.train_step(data, seg)
        _sync(m["loss"])
        print(f"{label}: {(time.perf_counter() - t0) / n * 1000:.0f} ms",
              flush=True)

    trainer.current_epoch = 0
    steady("full step, topo OFF")

    aug = jax.jit(lambda k, d, s: augment_batch(
        k, d, s, trainer.aug_cfg, channels_first=True))
    key = jax.random.PRNGKey(0)
    d2, _ = aug(key, data, seg)
    _sync(d2)
    t0 = time.perf_counter()
    for _ in range(4):
        d2, _ = aug(key, data, seg)
    _sync(d2)
    print(f"augment-only (CF): {(time.perf_counter() - t0) / 4 * 1000:.0f} "
          f"ms", flush=True)

    trainer.topo_mode = "two_phase"
    trainer.topo_pipeline = True
    trainer._compile_steps()
    trainer.train_step(data, seg)  # priming call (pipelined: returns None)
    steady("full step, topo ON (two-phase, pipelined)")

    trainer.flush_train_steps()
    trainer.topo_pipeline = False
    steady("full step, topo ON (two-phase, sequential)", n=4, warm=2)

    pp, pt, _, _ = trainer._topo_probe_fn(
        trainer.state.params, trainer.state.batch_stats, key, data, seg)
    a1, a2 = np.asarray(pp), np.asarray(pt)
    t0 = time.perf_counter()
    for _ in range(4):
        topo_match_host(a1, a2, trainer.topo_feat_d, trainer.topo_q,
                        trainer.topo_cap)
    print(f"host persistence+match: "
          f"{(time.perf_counter() - t0) / 4 * 1000:.0f} ms "
          f"pooled {a1.shape}", flush=True)
    print("MVD ATTRIB DONE", flush=True)


if __name__ == "__main__":
    main()
