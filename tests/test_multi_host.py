"""Simulated multi-host path (VERDICT.md round-1 item 7): two REAL OS
processes initialize jax.distributed over a localhost coordinator (2 CPU
devices each), build the global 4-device mesh through parallel.mesh.get_mesh,
assemble a global batch from process-local shards (the PrefetchLoader
multi-host path), and run a cross-host collective — proving the code path
constructs the global mesh without TPU pod hardware."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from multimodal_mvd_seg_tpu.run.run_training import initialize_multi_host

port = sys.argv[1]
pid = int(sys.argv[2])
initialize_multi_host(coordinator_address=f"localhost:{port}",
                      num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2

from jax.sharding import NamedSharding, PartitionSpec as P
from multimodal_mvd_seg_tpu.parallel.mesh import get_mesh
from multimodal_mvd_seg_tpu.training.trainer import MVDSegTrainer

mesh = get_mesh()
assert dict(mesh.shape) == {"data": 4, "model": 1}, dict(mesh.shape)

# per-host batch slice -> global sharded array (the PrefetchLoader path)
sharding = NamedSharding(mesh, P("data"))
local = np.full((2, 4), float(pid), np.float32)  # host 0 -> 0s, host 1 -> 1s
g = jax.make_array_from_process_local_data(sharding, local)
assert g.shape == (4, 4)

# cross-host collective: the global mean must see BOTH hosts' data
mean = jax.jit(lambda x: x.mean(), in_shardings=sharding,
               out_shardings=NamedSharding(mesh, P()))(g)
np.testing.assert_allclose(float(mean), 0.5)

# rank-0 gating used by checkpoint/log writes
assert MVDSegTrainer.is_main_process() == (pid == 0)
print(f"WORKER_{pid}_OK")
"""


def test_two_process_distributed_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(port), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    assert "WORKER_0_OK" in outs[0]
    assert "WORKER_1_OK" in outs[1]


_TRAIN_WORKER = r"""
import os, sys
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from multimodal_mvd_seg_tpu.run.run_training import initialize_multi_host

port = sys.argv[1]
pid = int(sys.argv[2])
initialize_multi_host(coordinator_address=f"localhost:{port}",
                      num_processes=2, process_id=pid)
assert jax.device_count() == 4 and jax.local_device_count() == 2

import __graft_entry__ as ge
from multimodal_mvd_seg_tpu.training.trainer import MVDSegTrainer

plans, dsj = ge._tiny_plans_and_dataset(patch=(16, 16, 16))


class _NoDisk(MVDSegTrainer):
    def __init__(self):
        import tempfile
        for v in ("MVDSEG_results", "MVDSEG_preprocessed", "MVDSEG_raw"):
            os.environ.setdefault(v, tempfile.mkdtemp())
        from multimodal_mvd_seg_tpu import paths
        paths.refresh()
        super().__init__(plans, "3d_fullres", 0, dsj)
        self.n_data_parallel = 4

    def print_to_log_file(self, *a, **k):
        pass


tr = _NoDisk()
tr.initialize()
assert dict(tr.mesh.shape) == {"data": 4, "model": 1}, dict(tr.mesh.shape)

# the run/run_training.py wiring sizes the sampler per host: each process
# contributes its LOCAL half (2 of 4 samples) of the global batch, exactly
# like data/pipeline.py's multi-host branch
init_patch = tuple(tr._initial_patch_size)
local_data = np.random.RandomState(100 + pid).normal(
    size=(2, 2, *init_patch)).astype(np.float32)
local_seg = np.random.RandomState(200 + pid).randint(
    0, 3, (2, *init_patch)).astype(np.int32)
gdata = jax.make_array_from_process_local_data(tr._batch_sharding, local_data)
gseg = jax.make_array_from_process_local_data(tr._batch_sharding, local_seg)
assert gdata.shape[0] == 4  # global batch assembled from per-host halves

metrics = tr.train_step(gdata, gseg)
loss = float(jax.device_get(metrics["loss"]))
assert np.isfinite(loss), loss

# the updated params must be IDENTICAL on both hosts (the gradient psum ran
# across processes); print a digest for the parent to compare
leaves = jax.tree.leaves(tr.state.params)
digest = float(sum(np.abs(np.asarray(jax.device_get(l),
                                     np.float64)).sum() for l in leaves))
print(f"WORKER_{pid}_STEP loss={loss:.10f} digest={digest:.10f}")
"""


def test_two_process_train_step(tmp_path):
    """A REAL data-parallel train step across 2 OS processes: per-process
    local batch halves -> global sharded array -> one compiled step with
    cross-process gradient psum -> identical updated params on both hosts
    (VERDICT r2 item 6: the wiring must run as >=2 actual processes)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "train_worker.py"
    script.write_text(_TRAIN_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(port), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True)
        for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    lines = [next(l for l in o.splitlines() if "_STEP " in l) for o in outs]
    # same loss and same parameter digest on both hosts
    stats = [l.split("STEP ", 1)[1] for l in lines]
    assert stats[0] == stats[1], f"hosts diverged: {stats}"
