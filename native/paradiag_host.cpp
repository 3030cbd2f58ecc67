// Host-side native runtime: P1 finite-element CSR assembly, RCM reordering,
// and mesh partitioning.
//
// The reference delegates all host-side mesh/matrix infrastructure to
// Firedrake/PETSc (C): mesh partitioning, CSR ('aij') assembly, DoF
// numbering (Control_Wave_PC.py:16-45, :186). This library is the
// from-scratch TPU-framework equivalent: it runs on the host CPU, produces
// CSR arrays that the JAX side turns into device constants / ELL apply data
// (ops/sparse.py), and is reached through ctypes (no pybind11 in this
// toolchain). O(nnz) assembly -- replaces the O(n^2) pure-python fallback
// for large 2D meshes.
//
// Build: g++ -O3 -march=native -shared -fPIC paradiag_host.cpp -o libparadiag_host.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// P1 triangle assembly: points (n_pts x 2), tris (n_tri x 3, int32).
// Two-pass CSR: symbolic (sorted, deduplicated per row) then numeric fill of
// mass and stiffness simultaneously. Returns nnz; caller allocates using the
// bound returned by p1_assembly_nnz_bound and passes capacity.
// ---------------------------------------------------------------------------

int64_t p1_symbolic(const int32_t* tris, int64_t n_tri, int64_t n_pts,
                    int64_t* indptr /* n_pts+1 */, int32_t* indices /* cap */,
                    int64_t cap) {
  // adjacency lists (including self)
  std::vector<std::vector<int32_t>> adj(n_pts);
  for (int64_t p = 0; p < n_pts; ++p) adj[p].push_back((int32_t)p);
  for (int64_t t = 0; t < n_tri; ++t) {
    const int32_t* v = tris + 3 * t;
    for (int a = 0; a < 3; ++a)
      for (int b = 0; b < 3; ++b)
        if (a != b) adj[v[a]].push_back(v[b]);
  }
  int64_t nnz = 0;
  indptr[0] = 0;
  for (int64_t p = 0; p < n_pts; ++p) {
    auto& row = adj[p];
    std::sort(row.begin(), row.end());
    row.erase(std::unique(row.begin(), row.end()), row.end());
    if (nnz + (int64_t)row.size() > cap) return -1;
    std::memcpy(indices + nnz, row.data(), row.size() * sizeof(int32_t));
    nnz += row.size();
    indptr[p + 1] = nnz;
  }
  return nnz;
}

static inline int64_t csr_find(const int64_t* indptr, const int32_t* indices,
                               int64_t row, int32_t col) {
  int64_t lo = indptr[row], hi = indptr[row + 1];
  const int32_t* first = indices + lo;
  const int32_t* last = indices + hi;
  const int32_t* it = std::lower_bound(first, last, col);
  return lo + (it - first);
}

void p1_numeric(const double* pts, const int32_t* tris, int64_t n_tri,
                const int64_t* indptr, const int32_t* indices,
                double* mass, double* stiff) {
  // local P1 matrices on a triangle (a,b,c):
  //   M_e = area/12 * [[2,1,1],[1,2,1],[1,1,2]]
  //   K_e = area * G G^T with G = gradients of barycentric basis
  for (int64_t t = 0; t < n_tri; ++t) {
    const int32_t* v = tris + 3 * t;
    double x0 = pts[2 * v[0]], y0 = pts[2 * v[0] + 1];
    double x1 = pts[2 * v[1]], y1 = pts[2 * v[1] + 1];
    double x2 = pts[2 * v[2]], y2 = pts[2 * v[2] + 1];
    double det = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0);
    double area = 0.5 * (det < 0 ? -det : det);
    // gradients: grad(lambda_i) = perp(opposite edge) / det
    double gx[3], gy[3];
    gx[0] = (y1 - y2) / det; gy[0] = (x2 - x1) / det;
    gx[1] = (y2 - y0) / det; gy[1] = (x0 - x2) / det;
    gx[2] = (y0 - y1) / det; gy[2] = (x1 - x0) / det;
    for (int a = 0; a < 3; ++a) {
      for (int b = 0; b < 3; ++b) {
        int64_t k = csr_find(indptr, indices, v[a], v[b]);
        mass[k] += area / 12.0 * (a == b ? 2.0 : 1.0);
        stiff[k] += area * (gx[a] * gx[b] + gy[a] * gy[b]);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// 1D interval assembly (n_el elements, nodes 0..n_el): tridiagonal CSR.
// ---------------------------------------------------------------------------
int64_t p1_interval(int64_t n_el, double h, int64_t* indptr, int32_t* indices,
                    double* mass, double* stiff) {
  int64_t n = n_el + 1;
  int64_t nnz = 0;
  indptr[0] = 0;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = std::max<int64_t>(0, i - 1);
         j <= std::min<int64_t>(n - 1, i + 1); ++j) {
      indices[nnz] = (int32_t)j;
      if (j == i) {
        bool edge = (i == 0 || i == n - 1);
        mass[nnz] = edge ? 2.0 * h / 6.0 : 4.0 * h / 6.0;
        stiff[nnz] = edge ? 1.0 / h : 2.0 / h;
      } else {
        mass[nnz] = h / 6.0;
        stiff[nnz] = -1.0 / h;
      }
      ++nnz;
    }
    indptr[i + 1] = nnz;
  }
  return nnz;
}

// ---------------------------------------------------------------------------
// Reverse Cuthill-McKee ordering on a CSR graph (bandwidth reduction).
// perm[i] = old index of the node placed at new position i.
// ---------------------------------------------------------------------------
void rcm_order(const int64_t* indptr, const int32_t* indices, int64_t n,
               int32_t* perm) {
  std::vector<int32_t> degree(n);
  for (int64_t i = 0; i < n; ++i)
    degree[i] = (int32_t)(indptr[i + 1] - indptr[i]);
  std::vector<char> visited(n, 0);
  int64_t out = 0;
  std::vector<int32_t> order;
  order.reserve(n);
  for (;;) {
    // next start: unvisited node of minimum degree
    int32_t start = -1;
    for (int64_t i = 0; i < n; ++i)
      if (!visited[i] && (start < 0 || degree[i] < degree[start]))
        start = (int32_t)i;
    if (start < 0) break;
    std::queue<int32_t> q;
    q.push(start);
    visited[start] = 1;
    while (!q.empty()) {
      int32_t u = q.front();
      q.pop();
      order.push_back(u);
      std::vector<int32_t> nbrs;
      for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
        int32_t v = indices[k];
        if (!visited[v]) {
          visited[v] = 1;
          nbrs.push_back(v);
        }
      }
      std::sort(nbrs.begin(), nbrs.end(),
                [&](int32_t a, int32_t b) { return degree[a] < degree[b]; });
      for (int32_t v : nbrs) q.push(v);
    }
  }
  // reverse
  for (int64_t i = 0; i < n; ++i) perm[i] = order[n - 1 - i];
  (void)out;
}

// ---------------------------------------------------------------------------
// Balanced contiguous 1D partition of rows into n_parts (PETSc-style block
// row distribution): part[i] = owning part of row i.
// ---------------------------------------------------------------------------
void partition_rows(int64_t n, int64_t n_parts, int32_t* part) {
  int64_t base = n / n_parts, rem = n % n_parts;
  int64_t i = 0;
  for (int64_t p = 0; p < n_parts; ++p) {
    int64_t cnt = base + (p < rem ? 1 : 0);
    for (int64_t k = 0; k < cnt; ++k) part[i++] = (int32_t)p;
  }
}

}  // extern "C"
