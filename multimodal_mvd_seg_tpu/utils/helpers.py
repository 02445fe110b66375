"""Small helpers.

Parity: reference nnunetv2/utilities/helpers.py (softmax_helper_dim0/1,
empty_cache, dummy_context), utilities/collate_outputs.py and
utilities/json_export.py (recursive_fix_for_json_export).
"""

from contextlib import contextmanager
from typing import List

import jax
import jax.numpy as jnp
import numpy as np


def l2_normalize(x, axis=-1, eps=1e-12):
    """x / max(‖x‖₂, eps) with a backward that is finite at x = 0.

    ``x / jnp.maximum(jnp.linalg.norm(x), eps)`` guards the division but
    NOT the norm's own VJP (d‖x‖/dx = x/‖x‖ → 0/0 = NaN on an all-zero
    row). All-zero rows are routine here — empty memory-bank slots, masked
    contrastive rows, and ESPECIALLY the zero padding GSPMD adds to
    sharded axes under 'model'-axis tensor parallelism (a NaN in the
    padding poisons real gradients through the dW reductions; observed as
    NaN params on every n_model=2 step). The rsqrt(max(Σx², eps²)) form
    is NaN-free everywhere and cheaper (no sqrt-then-divide)."""
    n2 = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(n2, eps * eps))


def softmax_helper_dim0(x):
    return jax.nn.softmax(x, axis=0)


def softmax_helper_dim1(x):
    return jax.nn.softmax(x, axis=1)


def empty_cache(device=None):
    """The reference empties the CUDA cache; XLA manages HBM itself — clear
    jit caches as the closest equivalent (rarely needed)."""
    try:
        jax.clear_caches()
    except Exception:
        pass


@contextmanager
def dummy_context():
    yield None


def collate_outputs(outputs: List[dict]) -> dict:
    """List of step dicts → dict of stacked/listed values
    (reference utilities/collate_outputs.py)."""
    collated = {}
    for k in outputs[0].keys():
        vals = [o[k] for o in outputs]
        first = vals[0]
        if np.isscalar(first) or (hasattr(first, "ndim") and
                                  np.ndim(first) == 0):
            collated[k] = np.array([float(v) for v in vals])
        elif isinstance(first, np.ndarray) or hasattr(first, "shape"):
            collated[k] = np.vstack([np.asarray(v)[None] for v in vals])
        else:
            collated[k] = vals
    return collated


def recursive_fix_for_json_export(d: dict):
    """In-place numpy→python conversion (reference utilities/json_export.py)."""
    keys = list(d.keys())
    for k in keys:
        v = d[k]
        if isinstance(k, (np.integer, np.floating, np.bool_)):
            d[k.item()] = d.pop(k)
            k = k.item()
            v = d[k]
        if isinstance(v, dict):
            recursive_fix_for_json_export(v)
        elif isinstance(v, np.ndarray):
            d[k] = v.tolist()
        elif isinstance(v, (np.integer, np.floating, np.bool_)):
            d[k] = v.item()
        elif isinstance(v, (list, tuple)):
            d[k] = [i.item() if isinstance(i, np.generic) else i for i in v]
