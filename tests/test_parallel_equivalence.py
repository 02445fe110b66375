"""Data-parallel numerical equivalence: an n=1 vs n=8 sharded train step of
the flagship ContrastiveTrainer must produce the same loss and parameters to
floating-point tolerance — the actual correctness statement for data
parallelism (VERDICT.md round-1 weak item 5). Equivalence holds because the
global batch, rng key sequence and arithmetic are identical; only the psum
reduction order differs."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _global_batch(trainer, bs=8, seed=11):
    rng = np.random.RandomState(seed)
    init_patch = tuple(trainer._initial_patch_size)
    data = jax.device_put(
        rng.normal(size=(bs, *init_patch, 2)).astype(np.float32),
        trainer._batch_sharding)
    seg = jax.device_put(
        rng.randint(0, 3, size=(bs, *init_patch)).astype(np.int32),
        trainer._batch_sharding)
    return data, seg


def test_mvd_step_n1_vs_n8_equivalence(tmp_path, monkeypatch):
    import __graft_entry__ as ge
    monkeypatch.setenv("MVDSEG_results", str(tmp_path / "res"))
    monkeypatch.setenv("MVDSEG_preprocessed", str(tmp_path / "pre"))
    monkeypatch.setenv("MVDSEG_raw", str(tmp_path / "raw"))

    results = {}
    for n_dev in (1, 8):
        trainer = ge.make_tiny_mvd_trainer(n_dev, seed=123)
        trainer.initialize()
        assert dict(trainer.mesh.shape)["data"] == n_dev
        data, seg = _global_batch(trainer)  # same global batch both widths
        metrics = {}
        for epoch in (0, 60):  # base+topo+KL phase, then memory-insert phase
            trainer.current_epoch = epoch
            metrics[epoch] = jax.device_get(trainer.train_step(data, seg))
        results[n_dev] = {
            "metrics": metrics,
            "params": jax.device_get(trainer.state.params),
            "memory_valid": int(
                jax.device_get(trainer.state.memory_valid).sum()),
        }

    r1, r8 = results[1], results[8]
    for epoch in (0, 60):
        for k in ("loss", "mutual", "topo"):
            assert float(r8["metrics"][epoch][k]) == pytest.approx(
                float(r1["metrics"][epoch][k]), rel=2e-3, abs=1e-5), \
                f"epoch {epoch} metric {k} diverges between mesh widths"
    leaves1 = jax.tree.leaves(r1["params"])
    leaves8 = jax.tree.leaves(r8["params"])
    assert len(leaves1) == len(leaves8)
    for a, b in zip(leaves1, leaves8):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=2e-5)
    assert r1["memory_valid"] == r8["memory_valid"]
