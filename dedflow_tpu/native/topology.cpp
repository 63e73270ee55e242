// Native host-side topology/plan builder.
//
// Counterpart of the reference's C host layer: the hashmap CSR
// construction with its 64-neighbor cap and binary-search inserts
// (csr.c:36-190) and the host side of the scatter-plan machinery. This
// implementation is sort-based and cap-free: one key sort builds the
// nodal sparsity, and stable counting sorts build the deterministic
// scatter permutations that replace the reference's GPU graph coloring
// (color_impl.cu) on TPU.
//
// Exposed via ctypes (no pybind11 in this image); the NumPy
// implementation in sparse/topology.py is the oracle and fallback.
//
// Build: make -C dedflow_tpu/native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Builds, for a tet mesh (ien: ne x 4 int32, nodes 0..n-1):
//   row_ptr   (n+1)      CSR offsets of the nodal sparsity
//   col_ind   (cap)      CSR columns, sorted per row; cap >= 16*ne + n
//   elem_nnz  (16*ne)    nnz index of pair (ien[e][a], ien[e][b]),
//                        b fastest (matches sparse/topology.py)
//   mat_perm  (16*ne)    stable permutation sorting updates by elem_nnz
//   node_perm (4*ne)     stable permutation sorting (e,a) by ien[e][a]
// Every node keeps a diagonal entry even if isolated (padding nodes).
// Returns nnz, or -1 if cap is too small.
int64_t dedflow_topology(const int32_t* ien, int64_t ne, int64_t n,
                         int64_t* row_ptr, int32_t* col_ind, int64_t cap,
                         int32_t* elem_nnz, int32_t* mat_perm,
                         int32_t* node_perm) {
  const int64_t m = 16 * ne;
  std::vector<int64_t> keys(m + n);
  for (int64_t e = 0; e < ne; ++e) {
    const int32_t* nd = ien + 4 * e;
    int64_t* k = keys.data() + 16 * e;
    for (int a = 0; a < 4; ++a)
      for (int b = 0; b < 4; ++b)
        k[a * 4 + b] = (int64_t)nd[a] * n + nd[b];
  }
  for (int64_t i = 0; i < n; ++i) keys[m + i] = i * n + i;  // diagonals

  std::vector<int64_t> sorted(keys.begin(), keys.end());
  std::sort(sorted.begin(), sorted.end());
  sorted.erase(std::unique(sorted.begin(), sorted.end()), sorted.end());
  const int64_t nnz = (int64_t)sorted.size();
  if (nnz > cap) return -1;

  for (int64_t i = 0; i <= n; ++i) row_ptr[i] = 0;
  for (int64_t k = 0; k < nnz; ++k) {
    col_ind[k] = (int32_t)(sorted[k] % n);
    ++row_ptr[sorted[k] / n + 1];
  }
  for (int64_t i = 0; i < n; ++i) row_ptr[i + 1] += row_ptr[i];

  // elem_nnz via binary search of each pair key
  for (int64_t u = 0; u < m; ++u) {
    elem_nnz[u] = (int32_t)(std::lower_bound(sorted.begin(), sorted.end(),
                                             keys[u]) -
                            sorted.begin());
  }

  // mat_perm: stable counting sort of elem_nnz over nnz buckets
  {
    std::vector<int64_t> count(nnz + 1, 0);
    for (int64_t u = 0; u < m; ++u) ++count[elem_nnz[u] + 1];
    for (int64_t k = 0; k < nnz; ++k) count[k + 1] += count[k];
    for (int64_t u = 0; u < m; ++u) mat_perm[count[elem_nnz[u]]++] = (int32_t)u;
  }

  // node_perm: stable counting sort of the flat ien by node id
  {
    std::vector<int64_t> count(n + 1, 0);
    const int64_t mn = 4 * ne;
    for (int64_t u = 0; u < mn; ++u) ++count[ien[u] + 1];
    for (int64_t i = 0; i < n; ++i) count[i + 1] += count[i];
    for (int64_t u = 0; u < mn; ++u) node_perm[count[ien[u]]++] = (int32_t)u;
  }
  return nnz;
}

// Recursive coordinate bisection (parallel to parallel/partition.py):
// orders balanced spatial parts; part[i] receives the part id of node i.
static void rcb_recurse(const double* xg, int64_t* idx, int64_t cnt, int p0,
                        int p1, int64_t* part) {
  const int nparts = p1 - p0;
  if (nparts <= 1 || cnt == 0) {
    for (int64_t i = 0; i < cnt; ++i) part[idx[i]] = p0;
    return;
  }
  double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = 0; i < cnt; ++i)
    for (int d = 0; d < 3; ++d) {
      const double v = xg[3 * idx[i] + d];
      if (v < lo[d]) lo[d] = v;
      if (v > hi[d]) hi[d] = v;
    }
  int axis = 0;
  for (int d = 1; d < 3; ++d)
    if (hi[d] - lo[d] > hi[axis] - lo[axis]) axis = d;
  const int left = nparts / 2;
  const int64_t nleft = (cnt * left) / nparts;
  std::stable_sort(idx, idx + cnt, [&](int64_t a, int64_t b) {
    return xg[3 * a + axis] < xg[3 * b + axis];
  });
  rcb_recurse(xg, idx, nleft, p0, p0 + left, part);
  rcb_recurse(xg, idx + nleft, cnt - nleft, p0 + left, p1, part);
}

void dedflow_rcb(const double* xg, int64_t n, int64_t num_parts,
                 int64_t* part) {
  std::vector<int64_t> idx(n);
  for (int64_t i = 0; i < n; ++i) idx[i] = i;
  rcb_recurse(xg, idx.data(), n, 0, (int)num_parts, part);
}

}  // extern "C"
