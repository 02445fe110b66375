"""Data-parallel numerical equivalence: an n=1 vs n=8 sharded train step of
the flagship ContrastiveTrainer must produce the same loss and parameters to
floating-point tolerance — the actual correctness statement for data
parallelism (VERDICT.md round-1 weak item 5). Equivalence holds because the
global batch, rng key sequence and arithmetic are identical; only the psum
reduction order differs.

The test nets run in f32 (dtype override in make_tiny_mvd_trainer): the
statement under test is that the PARTITIONING computes the same math, and
f32 keeps reduction-order noise at the ~1e-6 floor. In production bf16,
near-cancelling bias-gradient sums legitimately differ by up to ~75%
relative between reduction orders (measured: decoder bias grads at 1e-4
magnitude) — noise inherent to bf16, not a sharding bug, and asserting
through it would force meaninglessly loose tolerances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _global_batch(trainer, bs=8, seed=11):
    rng = np.random.RandomState(seed)
    init_patch = tuple(trainer._initial_patch_size)
    data = jax.device_put(
        rng.normal(size=(bs, 2, *init_patch)).astype(np.float32),
        trainer._batch_sharding)
    seg = jax.device_put(
        rng.randint(0, 3, size=(bs, *init_patch)).astype(np.int32),
        trainer._batch_sharding)
    return data, seg


def test_mvd_step_tensor_parallel_equivalence(tmp_path, monkeypatch):
    """'model'-axis tensor parallelism (params sharded via
    tensor_parallel_shardings, GSPMD-inserted collectives) must produce the
    same step as the replicated mesh from identical inputs.

    Runs in topo_mode="two_phase" — the production mode on the bench TPU,
    and the only partitioner-friendly one: in "callback" mode GSPMD tries
    to partition the sequential in-graph persistence while-loop over the
    model axis and falls into involuntary full rematerialization
    (spmd_partitioner.cc warning), blowing the CPU compile past 10 min."""
    import jax.tree_util as jtu
    import __graft_entry__ as ge
    monkeypatch.setenv("MVDSEG_results", str(tmp_path / "res"))
    monkeypatch.setenv("MVDSEG_preprocessed", str(tmp_path / "pre"))
    monkeypatch.setenv("MVDSEG_raw", str(tmp_path / "raw"))

    results = {}
    for n_model in (1, 2):
        trainer = ge.make_tiny_mvd_trainer(2, seed=123, n_model=n_model,
                                           topo_mode="two_phase",
                                           dtype=jnp.float32)
        trainer.topo_pipeline = False  # single synchronous step
        trainer.initialize()
        assert dict(trainer.mesh.shape)["model"] == n_model
        data, seg = _global_batch(trainer, bs=2)
        trainer.current_epoch = 0
        m = jax.device_get(trainer.train_step(data, seg))
        if n_model == 2:
            n_sharded = sum(
                1 for _, leaf in jtu.tree_leaves_with_path(
                    trainer.state.params)
                if hasattr(leaf, "sharding")
                and not leaf.sharding.is_fully_replicated)
            assert n_sharded > 0, "no param sharded over the model axis"
        results[n_model] = (m, jax.device_get(trainer.state.params))

    from flax.traverse_util import flatten_dict
    m1, p1 = results[1]
    m2, p2 = results[2]
    assert float(m2["loss"]) == pytest.approx(float(m1["loss"]),
                                              rel=2e-3, abs=1e-4)
    p1, p2 = flatten_dict(p1), flatten_dict(p2)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p1[k], np.float32),
                                   np.asarray(p2[k], np.float32),
                                   rtol=1e-3, atol=1e-5,
                                   err_msg="/".join(k))


def test_mvd_step_n1_vs_n8_equivalence(tmp_path, monkeypatch):
    import __graft_entry__ as ge
    monkeypatch.setenv("MVDSEG_results", str(tmp_path / "res"))
    monkeypatch.setenv("MVDSEG_preprocessed", str(tmp_path / "pre"))
    monkeypatch.setenv("MVDSEG_raw", str(tmp_path / "raw"))

    results = {}
    for n_dev in (1, 8):
        trainer = ge.make_tiny_mvd_trainer(n_dev, seed=123,
                                           dtype=jnp.float32)
        trainer.initialize()
        assert dict(trainer.mesh.shape)["data"] == n_dev
        data, seg = _global_batch(trainer)  # same global batch both widths
        # step 1 (epoch 0): the equivalence statement — identical params in,
        # one sharded step, params out must match to reduction-order noise.
        # (Comparing after a SECOND step is not meaningful: forward rounding
        # amplifies the ~1e-6 step-1 difference chaotically.)
        trainer.current_epoch = 0
        m0 = jax.device_get(trainer.train_step(data, seg))
        params1 = jax.device_get(trainer.state.params)
        # step 2 (epoch 60): memory-insert phase still runs and fills the
        # bank under sharding; only sanity-checked (see note above)
        trainer.current_epoch = 60
        m60 = jax.device_get(trainer.train_step(data, seg))
        results[n_dev] = {
            "m0": m0, "m60": m60, "params": params1,
            "memory_valid": int(
                jax.device_get(trainer.state.memory_valid).sum()),
        }

    r1, r8 = results[1], results[8]
    for k in ("loss", "mutual", "topo"):
        assert float(r8["m0"][k]) == pytest.approx(
            float(r1["m0"][k]), rel=2e-3, abs=1e-5), \
            f"step-1 metric {k} diverges between mesh widths"
    from flax.traverse_util import flatten_dict
    p1 = flatten_dict(r1["params"])
    p8 = flatten_dict(r8["params"])
    assert set(p1) == set(p8)
    for k in p1:
        a = np.asarray(p1[k], np.float32)
        b = np.asarray(p8[k], np.float32)
        # f32 reduction-order noise after one step is ~1e-6 absolute;
        # atol floors the near-zero biases where rtol is meaningless
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5,
                                   err_msg="/".join(k))
    assert np.isfinite(r1["m60"]["loss"]) and np.isfinite(r8["m60"]["loss"])
    assert r1["memory_valid"] > 0 and r8["memory_valid"] > 0
