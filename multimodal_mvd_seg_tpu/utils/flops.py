"""FLOPs / walltime probes.

Parity: reference utilities/test_FLOPS.py:17-30 (matmul walltime probe) and
the thop/ptflops-style model FLOPs counting imported (but commented out) by
the reference trainer (nnUNetTrainer.py:65-66,910-911). The TPU-native form
uses XLA's own cost analysis, which is exact for the compiled HLO.
"""

import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def count_flops(fn, *example_args) -> dict:
    """FLOPs / bytes of the compiled fn via XLA cost analysis."""
    lowered = jax.jit(fn).lower(*example_args)
    analysis = lowered.compile().cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return {"flops": float(analysis.get("flops", -1.0)),
            "bytes accessed": float(analysis.get("bytes accessed", -1.0))}


def model_flops(network, variables, example_input) -> dict:
    """FLOPs of one forward pass of a flax module (thop.profile stand-in)."""
    return count_flops(
        lambda x: network.apply(variables, x, train=False), example_input)


def matmul_walltime_probe(n: int = 4096, dtype=jnp.bfloat16,
                          iters: int = 10) -> Tuple[float, float]:
    """(seconds, achieved TFLOP/s) of an n×n matmul — reference
    test_FLOPS.py measures the same on torch/cuda."""
    a = jnp.asarray(np.random.randn(n, n), dtype)
    b = jnp.asarray(np.random.randn(n, n), dtype)

    @jax.jit
    def mm(a, b):
        return (a @ b).astype(jnp.float32).sum()

    float(mm(a, b))  # compile + sync
    t0 = time.perf_counter()
    v = None
    for _ in range(iters):
        v = mm(a, b)
    float(v)
    dt = (time.perf_counter() - t0) / iters
    return dt, 2 * n ** 3 / dt / 1e12
