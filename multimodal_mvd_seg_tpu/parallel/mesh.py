"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL DDP machinery
(run/run_training.py:152-231, utilities/ddp_allgather.py): instead of process
spawning and gradient allreduce hooks, we lay a `jax.sharding.Mesh` over the
chips and pjit the train step with the global batch sharded on the 'data' axis;
XLA inserts the gradient psums over ICI. The per-rank batch-size/oversample
partitioning logic (reference nnUNetTrainer.py:304-349) disappears: the
sampler produces the *global* batch and sharding distributes it.

The mesh carries a second 'model' axis so callers can build non-trivial
(data, model) layouts, but no shipped trainer shards parameters on it today
— the reference has data parallelism only (SURVEY.md §2b parallelism
census), and every trainer here pjits with params replicated. Pass
n_model=1 (the default) unless you are experimenting with your own
partition specs."""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_data: Optional[int] = None, n_model: int = 1,
             devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), \
        f"mesh {n_data}x{n_model} needs {n_data * n_model} devices, " \
        f"have {len(devices)}"
    dev_array = np.array(devices[:n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for input arrays (leading axis = batch)."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_spec() -> P:
    return P("data")
