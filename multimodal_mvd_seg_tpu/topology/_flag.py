"""Host-side flag-filtration persistence over point clouds.

Shared machinery for RipsLayer / AlphaLayer (reference topologylayer
``functional/flag.py`` + ``nn/rips.py`` / ``nn/alpha.py``): simplices take
the filtration value of their longest edge; persistence runs in the C++
core; each bar is reported through the *critical edges* of its birth and
death simplices so the JAX layers can re-read the values from the
(differentiable) distance matrix — the same gradient routing as the
reference's ``persistenceBackwardFlag``.
"""

from itertools import combinations
from typing import List, Sequence, Tuple

import numpy as np

from ..ops.persistence import simplicial_persistence_pairs


def _faces_key(s: Tuple[int, ...]):
    return tuple(sorted(s))


def flag_persistence_host(dist: np.ndarray,
                          top_simplices: Sequence[Tuple[int, ...]],
                          maxdim: int, cap: int):
    """Persistence of the flag filtration on the complex spanned by
    ``top_simplices`` (all their faces are added automatically).

    Returns int32 arrays (cap,): bar_dim (−1 pad), birth edge (bi, bj) and
    death edge (di, dj); di == −1 ⇒ essential. Vertex-born bars use
    bi == bj == vertex.
    """
    n = dist.shape[0]
    # collect all simplices up to dim maxdim+1 (deaths live one dim up)
    simplex_set = {}
    for top in top_simplices:
        top = _faces_key(top)
        k = min(len(top), maxdim + 2)
        for size in range(1, k + 1):
            for s in combinations(top, size):
                simplex_set[s] = True
    simplices: List[Tuple[int, ...]] = list(simplex_set.keys())

    def value_and_critical(s):
        if len(s) == 1:
            return 0.0, (s[0], s[0])
        best, edge = -1.0, (s[0], s[0])
        for a, b in combinations(s, 2):
            d = dist[a, b]
            if d > best:
                best, edge = d, (a, b)
        return best, edge

    vals, crit = zip(*(value_and_critical(s) for s in simplices))
    vals = np.asarray(vals, np.float64)
    dims = np.asarray([len(s) - 1 for s in simplices], np.int32)
    order = np.lexsort((np.arange(len(simplices)), dims, vals))
    rank = np.empty(len(order), np.int64)
    rank[order] = np.arange(len(order))
    index_of = {s: i for i, s in enumerate(simplices)}

    sorted_dims = dims[order].astype(np.int32)
    bnd_indices: List[int] = []
    bnd_offsets = [0]
    for pos in range(len(order)):
        s = simplices[order[pos]]
        if len(s) > 1:
            for f in combinations(s, len(s) - 1):
                bnd_indices.append(rank[index_of[f]])
        bnd_offsets.append(len(bnd_indices))

    bar_dims, birth_c, death_c = simplicial_persistence_pairs(
        sorted_dims, np.asarray(bnd_offsets, np.int64),
        np.asarray(bnd_indices, np.int64), cap=max(cap * 4, 1024))

    out_dim = np.full(cap, -1, np.int32)
    out_b = np.full((cap, 2), -1, np.int32)
    out_d = np.full((cap, 2), -1, np.int32)
    k = 0
    for bd, bc, dc in zip(bar_dims, birth_c, death_c):
        if bd < 0 or bd > maxdim or k >= cap:
            continue
        b_simplex = simplices[order[bc]]
        bv, bedge = value_and_critical(b_simplex)
        if dc >= 0:
            d_simplex = simplices[order[dc]]
            dv, dedge = value_and_critical(d_simplex)
            if dv == bv:       # zero-persistence pairs carry no signal
                continue
            out_d[k] = dedge
        out_dim[k] = bd
        out_b[k] = bedge
        k += 1
    return out_dim, out_b[:, 0], out_b[:, 1], out_d[:, 0], out_d[:, 1]
