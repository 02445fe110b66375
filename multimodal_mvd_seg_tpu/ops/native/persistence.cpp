// Persistent homology core (C++17, no external deps).
//
// TPU-native equivalent of the reference's only native component — the
// topologylayer pybind11/torch persistence extension
// (reference nnunetv2/training/topologylayer/functional/persistence/*.cpp|*.h,
// 1119 LoC; SURVEY.md §2a "topologylayer persistence — C++"). Re-designed
// from the standard algorithms rather than translated:
//
//  * cubical_persistence — sublevel-set persistence of a 1D/2D/3D image
//    under the V-construction (vertices = voxels; the filtration value of a
//    cell is the max over its vertices). Covers the reference's
//    LevelSetLayer* (freudenthal/grid) and the gudhi/torch_topological
//    CubicalComplex uses (MVDTrainer.py:94-97,904-924, TopoLossNIPS.py,
//    betti_compute.py).
//  * simplicial_persistence — generic boundary-matrix reduction over Z/2
//    for an arbitrary complex in filtration order (rips/alpha/flag layers).
//
// Both use the twist/clearing optimisation (Chen & Kerber 2011): columns are
// reduced dimension-by-dimension in decreasing dimension, and the column of
// any cell already paired as a birth is cleared without reduction.
//
// The host-side persistence is exposed to JAX through jax.pure_callback; the
// GRADIENT never flows through this code. Each bar is reported via the
// *critical vertex* of its birth/death cell (the vertex attaining the max),
// so the JAX side re-reads birth/death values with a differentiable gather
// — the same gradient routing as the reference's persistenceBackward.
//
// Exposed C ABI (ctypes):
//   int cubical_persistence(const float* img, int nx, int ny, int nz,
//                           int maxdim, int keep_zero, int cap,
//                           int* out_dim, long long* out_birth_v,
//                           long long* out_death_v);
//   int simplicial_persistence(long long n_cells, const int* dims,
//                              const long long* bnd_offsets,
//                              const long long* bnd_indices,
//                              int keep_zero, int cap, int* out_dim,
//                              long long* out_birth_c, long long* out_death_c);
//
// Return value: number of bars written (<= cap); essential classes have
// out_death_* == -1. Bars are emitted in filtration order of their birth.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

using i64 = long long;

// symmetric difference of two ascending-sorted index lists (Z/2 column add)
void xor_merge(std::vector<int64_t>& a, const std::vector<int64_t>& b,
               std::vector<int64_t>& scratch) {
  scratch.clear();
  size_t i = 0, j = 0;
  while (i < a.size() && j < b.size()) {
    if (a[i] < b[j]) scratch.push_back(a[i++]);
    else if (b[j] < a[i]) scratch.push_back(b[j++]);
    else { ++i; ++j; }
  }
  scratch.insert(scratch.end(), a.begin() + i, a.end());
  scratch.insert(scratch.end(), b.begin() + j, b.end());
  a.swap(scratch);
}

struct Pair {
  int dim;
  i64 birth_cell;  // internal cell id
  i64 death_cell;  // -1 = essential
  i64 birth_pos;   // filtration position (for output ordering)
};

// Generic reduction with clearing. Cells are given in filtration order
// (position == id). boundary(c) must return ascending positions of faces.
// dims[c] in [0, maxdim_cells]. Emits pairs of cell positions.
template <typename BoundaryFn>
std::vector<Pair> reduce_complex(i64 n_cells, const int* dims, int max_dim,
                                 BoundaryFn boundary) {
  std::vector<int8_t> cleared(n_cells, 0);
  std::vector<int8_t> paired(n_cells, 0);
  // pivot position -> index into stored columns
  std::vector<i64> pivot_owner(n_cells, -1);
  std::vector<std::vector<int64_t>> stored;
  stored.reserve(1024);
  std::vector<Pair> pairs;
  std::vector<int64_t> col, scratch;

  for (int d = max_dim; d >= 1; --d) {
    for (i64 c = 0; c < n_cells; ++c) {
      if (dims[c] != d || cleared[c]) continue;
      boundary(c, col);                    // ascending positions
      // reduce
      while (!col.empty()) {
        i64 piv = col.back();
        i64 owner = pivot_owner[piv];
        if (owner < 0) break;
        xor_merge(col, stored[owner], scratch);
      }
      if (!col.empty()) {
        i64 piv = col.back();
        pivot_owner[piv] = (i64)stored.size();
        stored.push_back(col);
        paired[piv] = 1;
        paired[c] = 1;
        cleared[piv] = 1;                  // clearing: piv's column is zero
        pairs.push_back({d - 1, piv, c, piv});
      }
    }
  }
  // essential classes: never paired, dimension <= max_dim - 1 creators plus
  // top-dim cells with zero column. A cell is a creator iff its (possibly
  // cleared) column reduces to zero — exactly the unpaired cells here.
  for (i64 c = 0; c < n_cells; ++c) {
    if (!paired[c]) pairs.push_back({dims[c], c, -1, c});
  }
  std::sort(pairs.begin(), pairs.end(), [](const Pair& a, const Pair& b) {
    if (a.birth_pos != b.birth_pos) return a.birth_pos < b.birth_pos;
    return a.dim < b.dim;
  });
  return pairs;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------- cubical

int cubical_persistence(const float* img, int nx, int ny, int nz,
                        int maxdim, int keep_zero, int cap,
                        int* out_dim, i64* out_birth_v, i64* out_death_v) {
  // doubled-grid cell complex: cell (i,j,k), 0<=i<2nx-1 ..., dim = #odd coords
  const i64 gx = 2 * (i64)nx - 1, gy = 2 * (i64)ny - 1, gz = 2 * (i64)nz - 1;
  const i64 n_cells = gx * gy * gz;
  const int space_dim = (nz > 1 ? 3 : (ny > 1 ? 2 : 1));
  if (maxdim < 0) maxdim = space_dim - 1;

  auto cid = [&](i64 i, i64 j, i64 k) { return (i * gy + j) * gz + k; };
  auto vox = [&](i64 i, i64 j, i64 k) {  // even coords -> voxel flat index
    return ((i >> 1) * (i64)ny + (j >> 1)) * (i64)nz + (k >> 1);
  };

  // filtration value (max over vertices) + critical vertex per cell
  std::vector<float> val(n_cells);
  std::vector<i64> crit(n_cells);
  std::vector<int> dim(n_cells);
  for (i64 i = 0; i < gx; ++i)
    for (i64 j = 0; j < gy; ++j)
      for (i64 k = 0; k < gz; ++k) {
        const i64 c = cid(i, j, k);
        float best = -1e38f;
        i64 best_v = -1;
        // vertices of the cell: coords rounded down/up to even per odd axis
        for (int m = 0; m < 8; ++m) {
          const i64 vi = (i & 1) ? (i - 1 + 2 * ((m >> 0) & 1)) : i;
          const i64 vj = (j & 1) ? (j - 1 + 2 * ((m >> 1) & 1)) : j;
          const i64 vk = (k & 1) ? (k - 1 + 2 * ((m >> 2) & 1)) : k;
          if (((m >> 0) & 1) && !(i & 1)) continue;
          if (((m >> 1) & 1) && !(j & 1)) continue;
          if (((m >> 2) & 1) && !(k & 1)) continue;
          const i64 v = vox(vi, vj, vk);
          const float x = img[v];
          if (x > best || (x == best && v < best_v)) { best = x; best_v = v; }
        }
        val[c] = best;
        crit[c] = best_v;
        dim[c] = (int)((i & 1) + (j & 1) + (k & 1));
      }

  // filtration order: by (value, dim, id); rank = position
  std::vector<i64> order(n_cells);
  std::iota(order.begin(), order.end(), (i64)0);
  std::sort(order.begin(), order.end(), [&](i64 a, i64 b) {
    if (val[a] != val[b]) return val[a] < val[b];
    if (dim[a] != dim[b]) return dim[a] < dim[b];
    return a < b;
  });
  std::vector<i64> rank(n_cells);
  for (i64 p = 0; p < n_cells; ++p) rank[order[p]] = p;
  std::vector<int> dim_at(n_cells);
  for (i64 p = 0; p < n_cells; ++p) dim_at[p] = dim[order[p]];

  const int top_dim = space_dim;  // reduce all dims so H_{space_dim-1} pairs
  auto boundary = [&](i64 pos, std::vector<int64_t>& col) {
    col.clear();
    const i64 c = order[pos];
    const i64 k = c % gz, j = (c / gz) % gy, i = c / (gz * gy);
    if (i & 1) { col.push_back(rank[cid(i - 1, j, k)]);
                 col.push_back(rank[cid(i + 1, j, k)]); }
    if (j & 1) { col.push_back(rank[cid(i, j - 1, k)]);
                 col.push_back(rank[cid(i, j + 1, k)]); }
    if (k & 1) { col.push_back(rank[cid(i, j + 0, k - 1)]);
                 col.push_back(rank[cid(i, j, k + 1)]); }
    std::sort(col.begin(), col.end());
  };

  auto pairs = reduce_complex(n_cells, dim_at.data(), top_dim, boundary);

  int n_out = 0;
  for (const auto& p : pairs) {
    if (p.dim > maxdim) continue;
    const i64 bc = order[p.birth_pos];
    const i64 dc = p.death_cell >= 0 ? order[p.death_cell] : -1;
    if (dc >= 0 && !keep_zero && val[bc] == val[dc]) continue;
    if (n_out >= cap) break;
    out_dim[n_out] = p.dim;
    out_birth_v[n_out] = crit[bc];
    out_death_v[n_out] = dc >= 0 ? crit[dc] : -1;
    ++n_out;
  }
  return n_out;
}

// -------------------------------------------------------------- simplicial

int simplicial_persistence(i64 n_cells, const int* dims,
                           const i64* bnd_offsets, const i64* bnd_indices,
                           int keep_zero, int cap, int* out_dim,
                           i64* out_birth_c, i64* out_death_c) {
  int max_dim = 0;
  for (i64 c = 0; c < n_cells; ++c) max_dim = std::max(max_dim, dims[c]);
  auto boundary = [&](i64 c, std::vector<int64_t>& col) {
    col.assign(bnd_indices + bnd_offsets[c], bnd_indices + bnd_offsets[c + 1]);
    std::sort(col.begin(), col.end());
  };
  auto pairs = reduce_complex(n_cells, dims, max_dim, boundary);
  int n_out = 0;
  for (const auto& p : pairs) {
    // zero-persistence filtering is done by the caller (values live there)
    (void)keep_zero;
    if (n_out >= cap) break;
    out_dim[n_out] = p.dim;
    out_birth_c[n_out] = p.birth_cell;
    out_death_c[n_out] = p.death_cell;
    ++n_out;
  }
  return n_out;
}

}  // extern "C"
