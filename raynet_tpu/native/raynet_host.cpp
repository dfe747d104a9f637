// Native host-side kernels for the data pipeline.
//
// The reference used Cython for these roles (raynet/ray_marching/
// ray_tracing.pyx, raynet/utils/fast_utils.pyx); here they are plain C++
// with OpenMP, exposed through a C ABI for ctypes. The TPU compute path
// never calls this library — it accelerates sample generation and GT-depth
// raycasts that would otherwise bottleneck the input pipeline.
//
// Build: make -C raynet_tpu/native   (produces libraynet_host.so)

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Amanatides-Woo DDA over a regular voxel grid, batched over rays.
// Semantics identical to the JAX op (ops/ray_marching.py): eps=1e-2 endpoint
// nudging, X-beats-Y-beats-Z nested tie-breaking, boundary exit without
// emission, inclusive last-voxel emission.
// ---------------------------------------------------------------------------
static const float kEps = 1e-2f;

static inline int dda_single(
    const float* bbox, const int* grid, const float* s_in, const float* e_in,
    int max_voxels, int32_t* out_idx /* (max_voxels, 3) */) {
  float start[3], end[3], bin[3], ray[3];
  int step[3], cur[3], last[3];
  for (int a = 0; a < 3; ++a) {
    bin[a] = (bbox[3 + a] - bbox[a]) / grid[a];
    start[a] = s_in[a] - bbox[a];
    end[a] = e_in[a] - bbox[a];
    ray[a] = end[a] - start[a];
    step[a] = ray[a] >= 0 ? 1 : -1;
    start[a] += step[a] * bin[a] * kEps;
    end[a] -= step[a] * bin[a] * kEps;
    // recompute ray AFTER nudging? No: reference computes ray before nudge.
  }
  for (int a = 0; a < 3; ++a) {
    cur[a] = (int)std::floor(start[a] / bin[a]);
    last[a] = (int)std::floor(end[a] / bin[a]);
    if (cur[a] < 0 || cur[a] >= grid[a]) return 0;
  }

  float t_max[3], t_delta[3];
  for (int a = 0; a < 3; ++a) {
    if (ray[a] != 0) {
      float cc = cur[a] * bin[a];
      float boundary = (step[a] < 0 && cc < start[a])
                           ? cc
                           : cc + step[a] * bin[a];
      t_max[a] = (boundary - start[a]) / ray[a];
      t_delta[a] = step[a] * bin[a] / ray[a];
    } else {
      t_max[a] = FLT_MAX;
      t_delta[a] = FLT_MAX;
    }
  }

  int ii = 0;
  out_idx[0] = cur[0];
  out_idx[1] = cur[1];
  out_idx[2] = cur[2];
  ii = 1;
  while (!(cur[0] == last[0] && cur[1] == last[1] && cur[2] == last[2]) &&
         ii < max_voxels) {
    int axis;
    if (t_max[0] < t_max[1])
      axis = (t_max[0] < t_max[2]) ? 0 : 2;
    else
      axis = (t_max[1] < t_max[2]) ? 1 : 2;
    cur[axis] += step[axis];
    if (cur[axis] < 0 || cur[axis] >= grid[axis]) return ii;
    t_max[axis] += t_delta[axis];
    out_idx[3 * ii] = cur[0];
    out_idx[3 * ii + 1] = cur[1];
    out_idx[3 * ii + 2] = cur[2];
    ++ii;
  }
  return ii;
}

void voxel_traversal_batch(
    const float* bbox /* (6,) */, const int* grid /* (3,) */,
    const float* starts /* (n, 3) */, const float* ends /* (n, 3) */,
    int n, int max_voxels,
    int32_t* out_idx /* (n, max_voxels, 3) zeroed by caller */,
    int32_t* out_cnt /* (n,) */) {
#pragma omp parallel for schedule(static)
  for (int r = 0; r < n; ++r) {
    out_cnt[r] = dda_single(bbox, grid, starts + 3 * r, ends + 3 * r,
                            max_voxels, out_idx + (int64_t)r * max_voxels * 3);
  }
}

// ---------------------------------------------------------------------------
// Moeller-Trumbore first-hit: for each ray, the closest intersection depth
// (distance from the origin) over all triangles, or -1 when there is none.
// The open-interval barycentric test (u>0, v>0, u+v<1) matches the
// reference's fast_utils.pyx kernel.
// ---------------------------------------------------------------------------
void ray_mesh_first_hit(
    const float* origin /* (3,) */, const float* dirs /* (n, 3) unit */,
    int n, const float* tris /* (t, 9) p0 p1 p2 */, int t,
    float* out_depth /* (n,) */, float* out_points /* (n, 3) */) {
#pragma omp parallel for schedule(dynamic, 16)
  for (int r = 0; r < n; ++r) {
    const float* d = dirs + 3 * r;
    float best = FLT_MAX;
    for (int k = 0; k < t; ++k) {
      const float* p0 = tris + 9 * k;
      const float* p1 = p0 + 3;
      const float* p2 = p0 + 6;
      float e1[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
      float e2[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
      float pv[3] = {d[1] * e2[2] - d[2] * e2[1],
                     d[2] * e2[0] - d[0] * e2[2],
                     d[0] * e2[1] - d[1] * e2[0]};
      float det = e1[0] * pv[0] + e1[1] * pv[1] + e1[2] * pv[2];
      if (det == 0.0f) continue;
      float inv = 1.0f / det;
      float tv[3] = {origin[0] - p0[0], origin[1] - p0[1], origin[2] - p0[2]};
      float u = (tv[0] * pv[0] + tv[1] * pv[1] + tv[2] * pv[2]) * inv;
      if (u <= 0.0f) continue;
      float qv[3] = {tv[1] * e1[2] - tv[2] * e1[1],
                     tv[2] * e1[0] - tv[0] * e1[2],
                     tv[0] * e1[1] - tv[1] * e1[0]};
      float v = (d[0] * qv[0] + d[1] * qv[1] + d[2] * qv[2]) * inv;
      if (v <= 0.0f || u + v >= 1.0f) continue;
      float tt = (e2[0] * qv[0] + e2[1] * qv[1] + e2[2] * qv[2]) * inv;
      if (tt > 0.0f && tt < best) best = tt;
    }
    if (best < FLT_MAX) {
      out_depth[r] = best;
      for (int a = 0; a < 3; ++a)
        out_points[3 * r + a] = origin[a] + best * d[a];
    } else {
      out_depth[r] = -1.0f;
      out_points[3 * r] = out_points[3 * r + 1] = out_points[3 * r + 2] = 0.0f;
    }
  }
}

// ---------------------------------------------------------------------------
// Batched patch extraction: gather (ph, pw, c) windows around integer
// centers, zero-filled outside the image (Image.patch expand semantics).
// Returns the number of patches fully inside the image.
// ---------------------------------------------------------------------------
int extract_patches(
    const float* image /* (h, w, c) */, int h, int w, int c,
    const int32_t* centers /* (n, 2) x,y */, int n, int ph, int pw,
    float* out /* (n, ph, pw, c) zeroed by caller */) {
  int inside = 0;
#pragma omp parallel for schedule(static) reduction(+ : inside)
  for (int i = 0; i < n; ++i) {
    int cx = centers[2 * i], cy = centers[2 * i + 1];
    int min_x = cx - pw / 2, min_y = cy - ph / 2;
    int max_x = min_x + pw, max_y = min_y + ph;
    bool full = min_x >= 0 && min_y >= 0 && max_x <= w && max_y <= h;
    if (full) ++inside;
    float* dst = out + (int64_t)i * ph * pw * c;
    for (int y = std::max(0, min_y); y < std::min(h, max_y); ++y) {
      int sy = y - min_y;
      int x0 = std::max(0, min_x), x1 = std::min(w, max_x);
      if (x0 >= x1) continue;
      const float* src_row = image + ((int64_t)y * w + x0) * c;
      float* dst_row = dst + ((int64_t)sy * pw + (x0 - min_x)) * c;
      std::copy(src_row, src_row + (int64_t)(x1 - x0) * c, dst_row);
    }
  }
  return inside;
}


// ---------------------------------------------------------------------------
// Beam-planner ray statistics (f64, planner semantics — see
// ops/pallas/bp_beam.py _exact_k/_group_spans, which this replaces at
// scale: the vectorized numpy forms build (rays x slices) temporaries,
// ~20 s per DTU-resolution view; this single pass is cache-resident).
// Inputs are PERMUTED (dom, lat1, lat2), flip-applied, bbox-min-relative
// f64 coordinates. Per 'rays'-sized block, emits:
//   k_blk:  max DDA emissions in any single dominant slice (slack-padded
//           boundaries, counted in BOTH slices — conservative)
//   need_a: max over 8-slice groups of the SNAP-AWARE box extent the
//           runtime needs: (hi + 2) - 8*floor((lo - 3)/8) + 1 cells,
//           where lo/hi are the block-group floor-cell extrema of the
//           lateral lerp positions (runtime origin = snap8(min - 1);
//           +-2 budgets the planner-f64 vs runtime-f32 jitter)
//   need_b: same with 128-cell stripe snapping (cells, not stripes)
//   hat_cross: max over 8-slice groups of the CROSS-RAY segment-t
//           window (max over group-overlapping rays of t at boundary
//           g+1 minus min of t at boundary g) — the kernel's hat
//           window base is a single block-wide min per chunk, so its
//           coverage must budget ray-to-ray entry-depth spread, not
//           just each ray's own span (x1e6, rounded up, as int32)
// Arithmetic mirrors the numpy forms exactly; build with
// -ffp-contract=off so results are bit-identical.
// ---------------------------------------------------------------------------
void bp_plan_stats(
    const double* st, const double* en, int64_t n, int rays, int S,
    int ngrp, const double* pb, double slack, double eps,
    int32_t* k_blk, int32_t* need_a, int32_t* need_b,
    int32_t* hat_cross) {
  const int64_t nb = n / rays;
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < nb; ++b) {
    std::vector<double> lo_a(ngrp, 1e300), hi_a(ngrp, -1e300);
    std::vector<double> lo_b(ngrp, 1e300), hi_b(ngrp, -1e300);
    std::vector<double> lo_t(ngrp, 1e300), hi_t(ngrp, -1e300);
    int kmax = 1;
    for (int r = 0; r < rays; ++r) {
      const double* s3 = st + (b * rays + r) * 3;
      const double* e3 = en + (b * rays + r) * 3;
      double stepf[3], tmax[3], tdelta[3];
      for (int a = 0; a < 3; ++a) {
        double ray = e3[a] - s3[a];
        stepf[a] = ray >= 0.0 ? 1.0 : -1.0;
        double startn = s3[a] + stepf[a] * pb[a] * eps;
        double cur = std::floor(startn / pb[a]);
        double cc = cur * pb[a];
        double boundary = (stepf[a] < 0.0 && cc < startn)
                              ? cc
                              : cc + stepf[a] * pb[a];
        if (ray != 0.0) {
          tmax[a] = (boundary - startn) / ray;
          tdelta[a] = stepf[a] * pb[a] / ray;
        } else {
          tmax[a] = std::numeric_limits<double>::infinity();
          tdelta[a] = std::numeric_limits<double>::infinity();
        }
      }
      // --- exact K: walk the S relative dominant slices. Fast-path:
      // every slice interval is at most td0 + 2*slack long, so
      // 1 + sum_a (floor((td0 + 2*slack)/td_a) + 1) bounds any
      // slice's emissions from above — when the bound cannot beat the
      // block's best-so-far, the walk is provably redundant (the
      // result is identical: skipped rays satisfy exact <= bound <=
      // kmax). Most rays skip once kmax reaches the block's true max.
      double kbound = 1.0;
      for (int a = 1; a < 3; ++a) {
        double c = (tdelta[0] + 2.0 * slack) / tdelta[a];
        kbound += (std::isfinite(c) ? std::floor(c) : 0.0) + 1.0;
      }
      if (!std::isfinite(tdelta[0]))
        kbound = std::numeric_limits<double>::infinity();
      if (!std::isfinite(kbound) || (int)kbound > kmax) {
      double t_prev = 0.0;  // t_entry[0] = 0
      for (int j = 0; j < S; ++j) {
        double t_next = tmax[0] + (double)j * tdelta[0];
        if (!(t_next < 1.0)) t_next = 1.0;  // min(., 1); inf/nan -> 1
        double tlo = t_prev - slack;
        double thi = t_next + slack;
        double em = 1.0;
        for (int a = 1; a < 3; ++a) {
          // crossings_below(T) = clip(floor((T - tmax)/tdelta) + 1, 0,)
          double xh = (thi - tmax[a]) / tdelta[a];
          double xl = (tlo - tmax[a]) / tdelta[a];
          double nh = std::isfinite(xh)
                          ? std::max(std::floor(xh) + 1.0, 0.0)
                          : 0.0;
          double nl = std::isfinite(xl)
                          ? std::max(std::floor(xl) + 1.0, 0.0)
                          : 0.0;
          em += nh - nl;
        }
        if (std::isfinite(em) && (int)em > kmax) kmax = (int)em;
        t_prev = t_next;
      }
      }
      // --- group-boundary lateral positions (clamped dominant lerp)
      double d0 = s3[0] / pb[0], d1 = e3[0] / pb[0];
      double denom = d1 - d0;
      if (denom < 1e-9) denom = 1e-9;
      double inv = 1.0 / denom;
      double a0 = s3[1] / pb[1], da = e3[1] / pb[1] - a0;
      double b0 = s3[2] / pb[2], db = e3[2] / pb[2] - b0;
      double pa_prev = 0.0, pb_prev = 0.0, t_prev_b = 0.0;
      for (int g = 0; g <= ngrp; ++g) {
        double t = ((double)g * 8.0 - d0) * inv;
        if (t < 0.0) t = 0.0;
        if (t > 1.0) t = 1.0;
        double pa = a0 + t * da;
        double pbv = b0 + t * db;
        if (g > 0) {
          // cross-ray t window of group g-1: only rays whose dominant
          // span overlaps the group (others clamp to an endpoint and
          // would inflate the window with irrelevant values)
          double glo = (double)(g - 1) * 8.0, ghi = (double)g * 8.0;
          if (d1 >= glo && d0 <= ghi) {
            if (t_prev_b < lo_t[g - 1]) lo_t[g - 1] = t_prev_b;
            if (t > hi_t[g - 1]) hi_t[g - 1] = t;
          }
        }
        if (g > 0) {
          double la = std::floor(std::min(pa_prev, pa));
          double ha = std::floor(std::max(pa_prev, pa));
          double lb = std::floor(std::min(pb_prev, pbv));
          double hb = std::floor(std::max(pb_prev, pbv));
          if (la < lo_a[g - 1]) lo_a[g - 1] = la;
          if (ha > hi_a[g - 1]) hi_a[g - 1] = ha;
          if (lb < lo_b[g - 1]) lo_b[g - 1] = lb;
          if (hb > hi_b[g - 1]) hi_b[g - 1] = hb;
        }
        pa_prev = pa;
        pb_prev = pbv;
        t_prev_b = t;
      }
    }
    double hc = 0.0;
    for (int g = 0; g < ngrp; ++g) {
      if (hi_t[g] > lo_t[g] && hi_t[g] - lo_t[g] > hc)
        hc = hi_t[g] - lo_t[g];
    }
    hat_cross[b] = (int32_t)std::ceil(hc * 1e6);
    int sa = 0, sb = 0;
    for (int g = 0; g < ngrp; ++g) {
      double a0 = 8.0 * std::floor((lo_a[g] - 3.0) / 8.0);
      double bg = 128.0 * std::floor((lo_b[g] - 3.0) / 128.0);
      sa = std::max(sa, (int)(hi_a[g] + 2.0 - a0 + 1.0));
      sb = std::max(sb, (int)(hi_b[g] + 2.0 - bg + 1.0));
    }
    k_blk[b] = kmax;
    need_a[b] = sa;
    need_b[b] = sb;
  }
}

}  // extern "C"
