"""Differentiable level-set persistence layers.

Parity: the reference's vendored topologylayer ``nn/levelset.py:12-198``
(``LevelSetLayer``/``LevelSetLayer1D``/``LevelSetLayer2D`` with
freudenthal/grid complex constructors). Re-design: the grid complexes are
handled by the cubical C++ core under the V-construction — the same
vertex-function (sub/super)level filtration the freudenthal triangulation
encodes, minus the triangulation bookkeeping — and the layers are pure
callables returning fixed-cap masked diagrams per homology dimension (XLA
needs static shapes). Gradients flow to the critical vertices through the
value gathers in ops/persistence.py, matching functional/sublevel.py:8-46.

A diagram is ``{"birth": (cap,), "death": (cap,), "mask": (cap,) bool}``;
``__call__`` returns ``(dgms, issublevel)`` where ``dgms`` is a tuple
indexed by homology dimension — the same contract shape as the reference
layers (list of per-dim barcodes + sub/superlevel flag).
"""

from typing import Optional, Tuple

import jax.numpy as jnp

from ..ops.persistence import cubical_persistence_pairs


class LevelSetLayer:
    """n-D level-set persistence over a grid function."""

    def __init__(self, maxdim: int = 1, sublevel: bool = True,
                 cap: int = 1024, keep_essential: bool = True):
        self.maxdim = maxdim
        self.sublevel = sublevel
        self.cap = cap
        self.keep_essential = keep_essential

    def __call__(self, x: jnp.ndarray) -> Tuple[tuple, bool]:
        out = cubical_persistence_pairs(x, maxdim=self.maxdim, cap=self.cap,
                                        superlevel=not self.sublevel)
        dgms = []
        for d in range(self.maxdim + 1):
            m = out["valid"] & (out["dims"] == d)
            if not self.keep_essential:
                m = m & out["finite"]
            dgms.append({"birth": out["birth"], "death": out["death"],
                         "mask": m, "finite": out["finite"]})
        return tuple(dgms), self.sublevel


class LevelSetLayer1D(LevelSetLayer):
    """Reference nn/levelset.py LevelSetLayer1D: H0 of a 1D signal."""

    def __init__(self, size: Optional[int] = None, sublevel: bool = True,
                 cap: int = 1024):
        del size  # shapes are static under jit; kept for API parity
        super().__init__(maxdim=0, sublevel=sublevel, cap=cap)


class LevelSetLayer2D(LevelSetLayer):
    """Reference nn/levelset.py:137 LevelSetLayer2D: H0/H1 of an image
    (default superlevel — 'maxdim=1, sublevel=False' in the reference's
    image uses, e.g. Topo_Loss.py)."""

    def __init__(self, size: Optional[tuple] = None, maxdim: int = 1,
                 sublevel: bool = False, complex: str = "grid",
                 cap: int = 1024):
        del size, complex
        super().__init__(maxdim=maxdim, sublevel=sublevel, cap=cap)


class LevelSetLayer3D(LevelSetLayer):
    """3D extension (the MVD volumes are 3D; the reference only shipped
    1D/2D layers and used torch_topological for 3D)."""

    def __init__(self, size: Optional[tuple] = None, maxdim: int = 2,
                 sublevel: bool = False, cap: int = 2048):
        del size
        super().__init__(maxdim=maxdim, sublevel=sublevel, cap=cap)
