// gts_native — native host-side kernels for the preprocessing pipeline.
//
// The reference delegates its preprocessing compute to native code inside
// dependencies: skimage's Cython SLIC (mri2graph/graphgen.py:243) and scipy's C
// ndimage reductions (graphgen.py:57-100). This library is the framework's own
// native runtime for those stages:
//
//   * slic3d               — blockwise 27-candidate SLIC (identical algorithm to
//                            data/slic.py's numpy canonical, OpenMP-parallel)
//   * enforce_connectivity — fragment absorption via BFS component labeling
//   * segment_quantiles    — per-segment sorted-bucket quantile features
//   * segment_mode_u16     — per-segment modal label (small label alphabets)
//   * segment_centroids    — per-segment uniform-mass centroids
//
// Exposed extern "C" for ctypes (no pybind11 in this image). All buffers are
// caller-allocated numpy arrays; int64 sizes; C-contiguous.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// segment statistics
// ---------------------------------------------------------------------------

// Per-segment linear-interpolated quantiles.
// values[n], segs[n] in [0, n_seg); qs[nq] in [0,1]; out[n_seg * nq].
// Empty segments produce 0.
void segment_quantiles(const float* values, const int32_t* segs, int64_t n,
                       int32_t n_seg, const double* qs, int32_t nq,
                       float* out) {
  std::vector<int64_t> counts(n_seg + 1, 0);
  for (int64_t i = 0; i < n; ++i) counts[segs[i] + 1]++;
  std::vector<int64_t> offsets(n_seg + 1, 0);
  for (int32_t s = 0; s < n_seg; ++s) offsets[s + 1] = offsets[s] + counts[s + 1];
  std::vector<float> bucket(n);
  std::vector<int64_t> cursor(offsets.begin(), offsets.end() - 1);
  for (int64_t i = 0; i < n; ++i) bucket[cursor[segs[i]]++] = values[i];

#pragma omp parallel for schedule(dynamic, 64)
  for (int32_t s = 0; s < n_seg; ++s) {
    float* b = bucket.data() + offsets[s];
    int64_t cnt = offsets[s + 1] - offsets[s];
    float* o = out + (int64_t)s * nq;
    if (cnt == 0) {
      for (int32_t q = 0; q < nq; ++q) o[q] = 0.0f;
      continue;
    }
    std::sort(b, b + cnt);
    for (int32_t q = 0; q < nq; ++q) {
      double pos = (double)(cnt - 1) * qs[q];
      int64_t lo = (int64_t)std::floor(pos);
      int64_t hi = (int64_t)std::ceil(pos);
      double frac = pos - (double)lo;
      o[q] = (float)(b[lo] * (1.0 - frac) + b[hi] * frac);
    }
  }
}

// Per-segment modal value for labels in [0, n_vals). labels[n], segs[n].
void segment_mode_u16(const int16_t* labels, const int32_t* segs, int64_t n,
                      int32_t n_seg, int32_t n_vals, int32_t* out) {
  std::vector<int64_t> hist((int64_t)n_seg * n_vals, 0);
  for (int64_t i = 0; i < n; ++i) hist[(int64_t)segs[i] * n_vals + labels[i]]++;
#pragma omp parallel for
  for (int32_t s = 0; s < n_seg; ++s) {
    const int64_t* h = hist.data() + (int64_t)s * n_vals;
    int32_t best = 0;
    for (int32_t v = 1; v < n_vals; ++v)
      if (h[v] > h[best]) best = v;
    out[s] = best;
  }
}

// Per-segment centroid over an (X,Y,Z) volume of segment ids. out[n_seg*3].
void segment_centroids(const int32_t* segs, int64_t X, int64_t Y, int64_t Z,
                       int32_t n_seg, float* out) {
  std::vector<double> acc((int64_t)n_seg * 3, 0.0);
  std::vector<int64_t> cnt(n_seg, 0);
  int64_t i = 0;
  for (int64_t x = 0; x < X; ++x)
    for (int64_t y = 0; y < Y; ++y)
      for (int64_t z = 0; z < Z; ++z, ++i) {
        int32_t s = segs[i];
        acc[(int64_t)s * 3 + 0] += (double)x;
        acc[(int64_t)s * 3 + 1] += (double)y;
        acc[(int64_t)s * 3 + 2] += (double)z;
        cnt[s]++;
      }
  for (int32_t s = 0; s < n_seg; ++s) {
    double c = cnt[s] > 0 ? (double)cnt[s] : 1.0;
    out[s * 3 + 0] = (float)(acc[(int64_t)s * 3 + 0] / c);
    out[s * 3 + 1] = (float)(acc[(int64_t)s * 3 + 1] / c);
    out[s * 3 + 2] = (float)(acc[(int64_t)s * 3 + 2] / c);
  }
}

// ---------------------------------------------------------------------------
// SLIC
// ---------------------------------------------------------------------------

// Blockwise 27-candidate SLIC over a (X,Y,Z,C) image (C-contiguous, channels
// last). Grid (gx,gy,gz) cluster centers; `inv_m2` = 1/compactness^2,
// `inv_s2` = 1/step^2 (distance convention shared with data/slic.py).
// labels_out[X*Y*Z] int32 receives the center id per voxel.
void slic3d(const float* img, int64_t X, int64_t Y, int64_t Z, int64_t C,
            int32_t gx, int32_t gy, int32_t gz, double inv_m2, double inv_s2,
            int32_t iters, int32_t* labels_out) {
  const int64_t V = X * Y * Z;
  const int32_t n_centers = gx * gy * gz;
  const int64_t cdim = 3 + C;  // pos + color per center
  std::vector<double> centers((int64_t)n_centers * cdim, 0.0);
  std::vector<double> accum;
  std::vector<int64_t> counts(n_centers, 0);

  // voxel -> owning grid cell along each axis
  std::vector<int32_t> cx(X), cy(Y), cz(Z);
  for (int64_t x = 0; x < X; ++x) cx[x] = (int32_t)std::min<int64_t>(x * gx / X, gx - 1);
  for (int64_t y = 0; y < Y; ++y) cy[y] = (int32_t)std::min<int64_t>(y * gy / Y, gy - 1);
  for (int64_t z = 0; z < Z; ++z) cz[z] = (int32_t)std::min<int64_t>(z * gz / Z, gz - 1);

  // init centers = mean position/color of each cell
  {
    int64_t i = 0;
    for (int64_t x = 0; x < X; ++x)
      for (int64_t y = 0; y < Y; ++y)
        for (int64_t z = 0; z < Z; ++z, ++i) {
          int32_t c = (cx[x] * gy + cy[y]) * gz + cz[z];
          double* ctr = centers.data() + (int64_t)c * cdim;
          ctr[0] += (double)x; ctr[1] += (double)y; ctr[2] += (double)z;
          const float* px = img + i * C;
          for (int64_t ch = 0; ch < C; ++ch) ctr[3 + ch] += (double)px[ch];
          counts[c]++;
        }
    for (int32_t c = 0; c < n_centers; ++c) {
      double cnt = counts[c] > 0 ? (double)counts[c] : 1.0;
      for (int64_t d = 0; d < cdim; ++d) centers[(int64_t)c * cdim + d] /= cnt;
    }
  }

  int n_threads = 1;
#ifdef _OPENMP
  n_threads = omp_get_max_threads();
#endif

  for (int32_t it = 0; it < iters; ++it) {
    // assignment + per-thread accumulation
    accum.assign((int64_t)n_threads * n_centers * (cdim + 1), 0.0);
#pragma omp parallel
    {
      int tid = 0;
#ifdef _OPENMP
      tid = omp_get_thread_num();
#endif
      double* acc = accum.data() + (int64_t)tid * n_centers * (cdim + 1);
#pragma omp for schedule(static)
      for (int64_t x = 0; x < X; ++x) {
        for (int64_t y = 0; y < Y; ++y) {
          for (int64_t z = 0; z < Z; ++z) {
            const int64_t i = (x * Y + y) * Z + z;
            const float* px = img + i * C;
            double best_d = std::numeric_limits<double>::infinity();
            int32_t best_c = (cx[x] * gy + cy[y]) * gz + cz[z];
            for (int32_t dx = -1; dx <= 1; ++dx) {
              int32_t ix = cx[x] + dx;
              if (ix < 0 || ix >= gx) continue;
              for (int32_t dy = -1; dy <= 1; ++dy) {
                int32_t iy = cy[y] + dy;
                if (iy < 0 || iy >= gy) continue;
                for (int32_t dz = -1; dz <= 1; ++dz) {
                  int32_t iz = cz[z] + dz;
                  if (iz < 0 || iz >= gz) continue;
                  int32_t c = (ix * gy + iy) * gz + iz;
                  const double* ctr = centers.data() + (int64_t)c * cdim;
                  double ds = (x - ctr[0]) * (x - ctr[0]) +
                              (y - ctr[1]) * (y - ctr[1]) +
                              (z - ctr[2]) * (z - ctr[2]);
                  double dc = 0.0;
                  for (int64_t ch = 0; ch < C; ++ch) {
                    double dd = (double)px[ch] - ctr[3 + ch];
                    dc += dd * dd;
                  }
                  double d = dc * inv_m2 + ds * inv_s2;
                  if (d < best_d) { best_d = d; best_c = c; }
                }
              }
            }
            labels_out[i] = best_c;
            double* a = acc + (int64_t)best_c * (cdim + 1);
            a[0] += (double)x; a[1] += (double)y; a[2] += (double)z;
            for (int64_t ch = 0; ch < C; ++ch) a[3 + ch] += (double)px[ch];
            a[cdim] += 1.0;
          }
        }
      }
    }
    // reduce per-thread accumulators -> new centers
#pragma omp parallel for schedule(static)
    for (int32_t c = 0; c < n_centers; ++c) {
      double sum[64] = {0.0};  // cdim <= 3 + 60 channels
      double cnt = 0.0;
      for (int t = 0; t < n_threads; ++t) {
        const double* a =
            accum.data() + ((int64_t)t * n_centers + c) * (cdim + 1);
        for (int64_t d = 0; d < cdim; ++d) sum[d] += a[d];
        cnt += a[cdim];
      }
      if (cnt > 0.0) {
        double* ctr = centers.data() + (int64_t)c * cdim;
        for (int64_t d = 0; d < cdim; ++d) ctr[d] = sum[d] / cnt;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// connectivity enforcement
// ---------------------------------------------------------------------------

// Keep each label's largest 6-connected component; absorb every other fragment
// into the neighboring label with the largest contact area. In-place on labels.
void enforce_connectivity(int32_t* labels, int64_t X, int64_t Y, int64_t Z,
                          int32_t n_labels) {
  const int64_t V = X * Y * Z;
  std::vector<int32_t> comp(V, -1);
  std::vector<int64_t> comp_size;
  std::vector<int32_t> comp_label;
  std::vector<int64_t> stack;
  stack.reserve(4096);

  auto idx = [&](int64_t x, int64_t y, int64_t z) { return (x * Y + y) * Z + z; };

  // component labeling (BFS per seed)
  int32_t n_comp = 0;
  for (int64_t seed = 0; seed < V; ++seed) {
    if (comp[seed] != -1) continue;
    int32_t lab = labels[seed];
    int32_t cid = n_comp++;
    comp_size.push_back(0);
    comp_label.push_back(lab);
    stack.push_back(seed);
    comp[seed] = cid;
    while (!stack.empty()) {
      int64_t i = stack.back();
      stack.pop_back();
      comp_size[cid]++;
      int64_t z = i % Z, y = (i / Z) % Y, x = i / (Y * Z);
      const int64_t nb[6] = {
          x > 0 ? idx(x - 1, y, z) : -1,     x + 1 < X ? idx(x + 1, y, z) : -1,
          y > 0 ? idx(x, y - 1, z) : -1,     y + 1 < Y ? idx(x, y + 1, z) : -1,
          z > 0 ? idx(x, y, z - 1) : -1,     z + 1 < Z ? idx(x, y, z + 1) : -1};
      for (int k = 0; k < 6; ++k) {
        int64_t j = nb[k];
        if (j >= 0 && comp[j] == -1 && labels[j] == lab) {
          comp[j] = cid;
          stack.push_back(j);
        }
      }
    }
  }

  // largest component per label
  std::vector<int32_t> keep(n_labels, -1);
  std::vector<int64_t> keep_size(n_labels, 0);
  for (int32_t c = 0; c < n_comp; ++c) {
    int32_t lab = comp_label[c];
    if (comp_size[c] > keep_size[lab]) {
      keep_size[lab] = comp_size[c];
      keep[lab] = c;
    }
  }

  // iteratively absorb fragments into an adjacent kept region; a fragment
  // bordering only other fragments waits for them to resolve first
  std::vector<char> is_kept(n_comp, 0);
  for (int32_t l = 0; l < n_labels; ++l)
    if (keep[l] >= 0) is_kept[keep[l]] = 1;

  // worklist of fragment voxels: sweeps iterate only what is still unresolved
  // instead of the whole volume, and each sweep is OpenMP-parallel. Each pass
  // is two-phase (read the PREVIOUS state, then apply), so the result is
  // deterministic regardless of thread count: a voxel absorbs from its first
  // kept neighbor in the fixed 6-direction order of the previous sweep's
  // state — repeated sweeps erode fragments from their kept borders inward.
  std::vector<int64_t> work;
  for (int64_t i = 0; i < V; ++i)
    if (!is_kept[comp[i]]) work.push_back(i);

  std::vector<int32_t> new_comp(work.size());
  std::vector<char> resolved(work.size());
  while (!work.empty()) {
    const int64_t W = (int64_t)work.size();
    int64_t n_resolved = 0;
#pragma omp parallel for schedule(static) reduction(+ : n_resolved)
    for (int64_t w = 0; w < W; ++w) {
      const int64_t i = work[w];
      int64_t z = i % Z, y = (i / Z) % Y, x = i / (Y * Z);
      const int64_t nb[6] = {
          x > 0 ? idx(x - 1, y, z) : -1,     x + 1 < X ? idx(x + 1, y, z) : -1,
          y > 0 ? idx(x, y - 1, z) : -1,     y + 1 < Y ? idx(x, y + 1, z) : -1,
          z > 0 ? idx(x, y, z - 1) : -1,     z + 1 < Z ? idx(x, y, z + 1) : -1};
      resolved[w] = 0;
      for (int k = 0; k < 6; ++k) {
        int64_t j = nb[k];
        if (j >= 0 && is_kept[comp[j]]) {
          new_comp[w] = comp[j];
          resolved[w] = 1;
          n_resolved++;
          break;
        }
      }
    }
    if (n_resolved == 0) break;  // isolated fragments with no kept border
    // apply + compact the worklist
    int64_t out_w = 0;
    for (int64_t w = 0; w < W; ++w) {
      if (resolved[w]) {
        const int64_t i = work[w];
        comp[i] = new_comp[w];
        labels[i] = comp_label[new_comp[w]];
      } else {
        work[out_w++] = work[w];
      }
    }
    work.resize(out_w);
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// regular kNN adjacency
// ---------------------------------------------------------------------------

// Greedy symmetric k-regular adjacency over centroids (the reference's
// enforce_regularity construction, mri2graph/graphgen.py:120-135, re-done in
// C++): process nodes in index order; each node tops up its degree to k with
// its nearest not-yet-linked higher-index neighbors; edges are symmetric.
// centroids: [n, 3] f32. Writes up to max_edges (src, dst) int32 pairs (both
// directions); returns the number written, or -1 if max_edges was too small.
extern "C" int64_t knn_regular(const float* centroids, int64_t n, int32_t k,
                               int32_t* src_out, int32_t* dst_out,
                               int64_t max_edges) {
  std::vector<std::vector<int32_t>> adj(n);
  std::vector<float> dist(n);
  std::vector<int32_t> cand;
  cand.reserve(n);
  int64_t written = 0;

  // distance row computed on the fly (no n^2 matrix held)
  for (int64_t i = 0; i < n; ++i) {
    int32_t deficit = k - (int32_t)adj[i].size();
    if (deficit <= 0) continue;
    const float* ci = centroids + i * 3;
#pragma omp parallel for schedule(static)
    for (int64_t j = 0; j < n; ++j) {
      const float* cj = centroids + j * 3;
      float dx = ci[0] - cj[0], dy = ci[1] - cj[1], dz = ci[2] - cj[2];
      dist[j] = dx * dx + dy * dy + dz * dz;
    }
    cand.clear();
    for (int64_t j = i + 1; j < n; ++j) {
      bool linked = false;
      for (int32_t v : adj[i])
        if (v == j) { linked = true; break; }
      if (!linked) cand.push_back((int32_t)j);
    }
    int32_t take = std::min<int32_t>(deficit, (int32_t)cand.size());
    std::partial_sort(cand.begin(), cand.begin() + take, cand.end(),
                      [&](int32_t a, int32_t b) {
                        if (dist[a] != dist[b]) return dist[a] < dist[b];
                        return a < b;
                      });
    for (int32_t t = 0; t < take; ++t) {
      int32_t j = cand[t];
      adj[i].push_back(j);
      adj[j].push_back((int32_t)i);
    }
  }
  for (int64_t i = 0; i < n; ++i) {
    for (int32_t j : adj[i]) {
      if (written >= max_edges) return -1;
      // adj[i] holds i's neighbors; emit edge j -> i (dst-major like numpy's
      // nonzero order is not required — caller builds ELL from the pair list)
      src_out[written] = j;
      dst_out[written] = (int32_t)i;
      written++;
    }
  }
  return written;
}
