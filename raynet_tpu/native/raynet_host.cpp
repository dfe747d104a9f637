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
// Arithmetic mirrors the numpy forms exactly; build with
// -ffp-contract=off so results are bit-identical.
// ---------------------------------------------------------------------------
// bp_plan_stats_raw additionally fuses the permute/flip/bbox-shift that
// the Python wrapper used to do with numpy temporaries (~0.5 s per 720p
// view on a single-core host): st/en are ORIGINAL-axis camera-frame f64
// segment endpoints; perm (3 ints), bmin (3, original order), flip and
// ext (= S * pb[0], the permuted dominant extent) apply per ray. The
// arithmetic order matches the numpy marshalling exactly (shift, then
// mirror), so results stay bit-identical to the pre-permuted form.
// Per-ray planner accumulation shared by bp_plan_stats_raw (needs) and
// bp_plan_agg (raw per-block aggregates): K-walk max into *kmax, group
// lateral lo/hi into the four ngrp-length arrays. The body is the
// former bp_plan_stats_raw inner loop verbatim, so both entry points
// stay bit-identical to the pre-refactor results.
static inline void plan_accum_ray(
    const double* st, const double* en, int64_t i, const int32_t* perm,
    int flip, const double* bmin, double ext, const double* pb, int S,
    int ngrp, double slack, double eps, int* kmax,
    double* lo_a, double* hi_a, double* lo_b, double* hi_b) {
  double s3[3], e3[3];
  for (int a = 0; a < 3; ++a) {
    s3[a] = st[i * 3 + perm[a]] - bmin[perm[a]];
    e3[a] = en[i * 3 + perm[a]] - bmin[perm[a]];
  }
  if (flip) {
    s3[0] = ext - s3[0];
    e3[0] = ext - e3[0];
  }
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
  if (!std::isfinite(kbound) || (int)kbound > *kmax) {
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
      if (std::isfinite(em) && (int)em > *kmax) *kmax = (int)em;
      t_prev = t_next;
    }
  }
  // --- group-boundary lateral positions (clamped dominant lerp).
  // Deliberately the SERIAL one-pass form: a staged two-pass variant
  // (positions buffer, then vectorized floor/min/max) measured 25%
  // SLOWER despite AVX-512 auto-vectorization — the pass is bound by
  // the per-ray division latency chain above, and the stage buffer
  // only added store/load traffic (measured 2026-08-19, 1.9M rays).
  double d0 = s3[0] / pb[0], d1 = e3[0] / pb[0];
  double denom = d1 - d0;
  if (denom < 1e-9) denom = 1e-9;
  double inv = 1.0 / denom;
  double a0 = s3[1] / pb[1], da = e3[1] / pb[1] - a0;
  double b0 = s3[2] / pb[2], db = e3[2] / pb[2] - b0;
  double pa_prev = 0.0, pb_prev = 0.0;
  for (int g = 0; g <= ngrp; ++g) {
    double t = ((double)g * 8.0 - d0) * inv;
    if (t < 0.0) t = 0.0;
    if (t > 1.0) t = 1.0;
    double pa = a0 + t * da;
    double pbv = b0 + t * db;
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
  }
}

void bp_plan_stats_raw(
    const double* st, const double* en, int64_t n, int rays, int S,
    int ngrp, const double* pb, const int32_t* perm, int flip,
    const double* bmin, double ext, double slack, double eps,
    int32_t* k_blk, int32_t* need_a, int32_t* need_b) {
  const int64_t nb = n / rays;
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < nb; ++b) {
    std::vector<double> lo_a(ngrp, 1e300), hi_a(ngrp, -1e300);
    std::vector<double> lo_b(ngrp, 1e300), hi_b(ngrp, -1e300);
    int kmax = 1;
    for (int r = 0; r < rays; ++r)
      plan_accum_ray(st, en, b * rays + r, perm, flip, bmin, ext, pb, S,
                     ngrp, slack, eps, &kmax, lo_a.data(), hi_a.data(),
                     lo_b.data(), hi_b.data());
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

// Raw per-block planner aggregates: per-block K plus the (nb, ngrp)
// group lateral lo/hi floors, BEFORE the snap-aware need reduction.
// One pass at the finest rays-per-block candidate serves every coarser
// candidate too: a coarse block's aggregates are elementwise min/max
// over its consecutive fine sub-blocks and its K the max (the Python
// side derives needs per candidate — see bp_beam._needs_from_agg), so
// the auto-planners march each ray ONCE instead of once per candidate.
void bp_plan_agg(
    const double* st, const double* en, int64_t n, int rays, int S,
    int ngrp, const double* pb, const int32_t* perm, int flip,
    const double* bmin, double ext, double slack, double eps,
    int32_t* k_blk, double* lo_a, double* hi_a, double* lo_b,
    double* hi_b) {
  const int64_t nb = n / rays;
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < nb; ++b) {
    double* la = lo_a + b * ngrp;
    double* ha = hi_a + b * ngrp;
    double* lb = lo_b + b * ngrp;
    double* hb = hi_b + b * ngrp;
    for (int g = 0; g < ngrp; ++g) {
      la[g] = 1e300;
      ha[g] = -1e300;
      lb[g] = 1e300;
      hb[g] = -1e300;
    }
    int kmax = 1;
    for (int r = 0; r < rays; ++r)
      plan_accum_ray(st, en, b * rays + r, perm, flip, bmin, ext, pb, S,
                     ngrp, slack, eps, &kmax, la, ha, lb, hb);
    k_blk[b] = kmax;
  }
}

// Pre-permuted entry point (kept for the bit-parity tests): identity
// perm, no flip, zero shift — subtracting 0.0 is exact, so this is
// bit-identical to the raw form on already-marshalled inputs.
void bp_plan_stats(
    const double* st, const double* en, int64_t n, int rays, int S,
    int ngrp, const double* pb, double slack, double eps,
    int32_t* k_blk, int32_t* need_a, int32_t* need_b) {
  const int32_t ident[3] = {0, 1, 2};
  const double zero3[3] = {0.0, 0.0, 0.0};
  bp_plan_stats_raw(st, en, n, rays, S, ngrp, pb, ident, 0, zero3, 0.0,
                    slack, eps, k_blk, need_a, need_b);
}

// ---------------------------------------------------------------------------
// Dominant-axis/march-direction detection + block-local miss fill (see
// ops/pallas/bp_beam.py _dom_sign_and_fill, whose numpy form costs ~3 s
// per 720p view on a single-core host: two (N, 3) copies plus gather/
// where passes). Operates IN PLACE on s/e. Returns 0 ok / 1 empty-rays /
// 2 mixed-dominant-sign; dom_out is valid for codes 0 and 2, flip_out
// for code 0. Semantics notes vs the numpy form: argmax of the hit-mean
// equals argmax of the hit-sum (same denominator per axis); numpy's
// where(hit, row, row_of_first_hit_in_block) fill reads ORIGINAL values,
// and fill sources are always hit rows (never overwritten), so the
// sequential in-place fill is equivalent.
// ---------------------------------------------------------------------------
int dom_sign_and_fill(
    double* s, double* e, int64_t n, int rays, const double* bins3,
    int32_t* dom_out, int32_t* flip_out) {
  const int64_t nb = n / rays;
  // dom selection sums |r|/bins in FP: an OpenMP scalar reduction would
  // make the accumulation order (and so, at near-tie rigs like 45-deg
  // diagonals, the argmax) depend on the thread count — a different
  // (still valid) plan per machine costs 30-150 s remote recompiles.
  // Accumulate per fixed-size chunk in parallel, then reduce the chunk
  // sums SEQUENTIALLY in chunk order: bit-stable for any thread count.
  // pos/neg/nhit are integer counts — order-independent either way.
  const int64_t CHUNK = 65536;
  const int64_t nchunk = (n + CHUNK - 1) / CHUNK;
  std::vector<double> partial(3 * nchunk, 0.0);
  int64_t pos[3] = {0, 0, 0}, neg[3] = {0, 0, 0}, nhit = 0;
#pragma omp parallel for schedule(static) reduction(+ : pos[:3], neg[:3], nhit)
  for (int64_t c = 0; c < nchunk; ++c) {
    const int64_t lo = c * CHUNK, hi = std::min(n, lo + CHUNK);
    double csums[3] = {0.0, 0.0, 0.0};
    for (int64_t i = lo; i < hi; ++i) {
      double r[3];
      double asum = 0.0;
      for (int a = 0; a < 3; ++a) {
        r[a] = e[3 * i + a] - s[3 * i + a];
        asum += std::fabs(r[a]);
      }
      if (!(asum > 0.0)) continue;
      ++nhit;
      for (int a = 0; a < 3; ++a) {
        csums[a] += std::fabs(r[a]) / bins3[a];
        if (r[a] > 0.0) ++pos[a];
        if (r[a] < 0.0) ++neg[a];
      }
    }
    for (int a = 0; a < 3; ++a) partial[3 * c + a] = csums[a];
  }
  double sums[3] = {0.0, 0.0, 0.0};
  for (int64_t c = 0; c < nchunk; ++c)
    for (int a = 0; a < 3; ++a) sums[a] += partial[3 * c + a];
  if (nhit == 0) return 1;
  int dom = 0;
  for (int a = 1; a < 3; ++a)
    if (sums[a] > sums[dom]) dom = a;  // numpy argmax: first max wins
  *dom_out = dom;
  if (pos[dom] == nhit)
    *flip_out = 0;
  else if (neg[dom] == nhit)
    *flip_out = 1;
  else
    return 2;
  if (nhit == n) return 0;
  auto is_hit = [&](int64_t row) {
    double asum = 0.0;
    for (int a = 0; a < 3; ++a)
      asum += std::fabs(e[3 * row + a] - s[3 * row + a]);
    return asum > 0.0;
  };
  // global fallback source: first hit row overall (only used by blocks
  // with no hit of their own; hit rows are never overwritten, so this
  // stays valid while blocks fill in parallel)
  int64_t gsrc = 0;
  while (!is_hit(gsrc)) ++gsrc;  // nhit > 0 guarantees termination
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < nb; ++b) {
    int64_t src = -1;
    for (int r = 0; r < rays; ++r)
      if (is_hit(b * rays + r)) {
        src = b * rays + r;
        break;
      }
    if (src < 0) src = gsrc;
    for (int r = 0; r < rays; ++r) {
      int64_t row = b * rays + r;
      if (row == src || is_hit(row)) continue;
      for (int a = 0; a < 3; ++a) {
        s[3 * row + a] = s[3 * src + a];
        e[3 * row + a] = e[3 * src + a];
      }
    }
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Fused f64 pixel-ray / bbox slab segments (planner front half — see
// ops/geometry.py host_rays_entry_exit, whose vectorized numpy form
// builds ~25 (N, 3) f64 temporaries and measured 5.5 s per 720p view on
// a single-core host; this loop is one cache-resident pass, ~60 ms).
// Semantics are the numpy form's exactly, including its NaN rules:
// numpy minimum/maximum PROPAGATE NaN (std::fmin/fmax ignore it), rays
// whose LINE misses the box collapse to a zero-length segment at the
// mid-slab point, and non-finite t_mid (parallel rays outside a slab)
// falls back to t = 0 (the camera center). -ffp-contract=off keeps the
// mul-add chains bit-comparable to numpy's.
// ---------------------------------------------------------------------------
static inline double min_nanprop(double a, double b) {
  if (a != a || b != b) return std::numeric_limits<double>::quiet_NaN();
  return a < b ? a : b;
}
static inline double max_nanprop(double a, double b) {
  if (a != a || b != b) return std::numeric_limits<double>::quiet_NaN();
  return a > b ? a : b;
}

static inline void ray_segment_single(
    int32_t ray_idx, const double* P_pinv, const double* cc,
    const double* bbox, int height, double* s /* (3,) */,
    double* e /* (3,) */) {
  const double x = (double)(ray_idx / height);
  const double y = (double)(ray_idx % height);
  double hom[4];
  for (int j = 0; j < 4; ++j)
    hom[j] = x * P_pinv[3 * j] + y * P_pinv[3 * j + 1] + P_pinv[3 * j + 2];
  double dir[3], t_near = -std::numeric_limits<double>::infinity(),
                 t_far = std::numeric_limits<double>::infinity();
  for (int a = 0; a < 3; ++a) {
    dir[a] = hom[a] / hom[3] - cc[a];
    const double t1 = (bbox[a] - cc[a]) / dir[a];
    const double t2 = (bbox[3 + a] - cc[a]) / dir[a];
    t_near = max_nanprop(t_near, min_nanprop(t1, t2));
    t_far = min_nanprop(t_far, max_nanprop(t1, t2));
  }
  const bool near_mask = std::fabs(t_near) < std::fabs(t_far);
  double tna = near_mask ? t_near : t_far;
  double tfa = near_mask ? t_far : t_near;
  if (t_near > t_far) {  // line misses the box: mid-slab collapse
    double t_mid = 0.5 * (t_near + t_far);
    if (!std::isfinite(t_mid)) t_mid = 0.0;
    tna = t_mid;
    tfa = t_mid;
  }
  for (int a = 0; a < 3; ++a) {
    s[a] = cc[a] + tna * dir[a];
    e[a] = cc[a] + tfa * dir[a];
  }
}

void rays_entry_exit(
    const int32_t* ray_idxs /* (n,) non-negative pixel ids */, int64_t n,
    const double* P_pinv /* (4, 3) row-major */, const double* cc /* (3,) */,
    const double* bbox /* (6,) min xyz, max xyz */, int height,
    double* out_s /* (n, 3) */, double* out_e /* (n, 3) */) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    ray_segment_single(ray_idxs[i], P_pinv, cc, bbox, height,
                       out_s + 3 * i, out_e + 3 * i);
  }
}

// ---------------------------------------------------------------------------
// Band-spec span planning for the plane-sweep kernel: per-view maximum over
// all (rays_per_block ray block, depth-group) sub-band boxes of
// (y_span, x_span). Host analog of ops/pallas/planesweep._plan_spans_max —
// f64 projections with round-half-even (std::nearbyint, like numpy/jnp
// round); the runtime front end is exact f32, and the +pad margin in
// plan_band_specs absorbs the f64-vs-f32 rounding jitter (the same contract
// as the beam planner's +-2 budget). Replaces a 30-150 s remote TPU compile
// of the planning program plus per-view device round trips.
// ---------------------------------------------------------------------------
// One projected feature index. Returns false for a NaN projection or a
// clamp sentinel (fx == 0 || fy == 0) — excluded from boxes either way.
static inline bool project_feature_idx_single(
    const double* Pv /* (3, 4) */, double px, double py, double pz,
    int offset, int width, int height, double* w_out, int32_t* fx_out,
    int32_t* fy_out) {
  const double w = Pv[8] * px + Pv[9] * py + Pv[10] * pz + Pv[11];
  const double u = (Pv[0] * px + Pv[1] * py + Pv[2] * pz + Pv[3]) / w;
  const double vv = (Pv[4] * px + Pv[5] * py + Pv[6] * pz + Pv[7]) / w;
  *w_out = w;
  *fx_out = 0;
  *fy_out = 0;
  double rx = std::nearbyint(u), ry = std::nearbyint(vv);
  if (rx != rx || ry != ry) return false;  // NaN projection: sentinel
  // saturate infinities to the clamp range (the runtime's f32 cast
  // saturates too)
  rx = std::min(std::max(rx, -2.0e9), 2.0e9);
  ry = std::min(std::max(ry, -2.0e9), 2.0e9);
  int64_t fx = (int64_t)rx + offset, fy = (int64_t)ry + offset;
  fx = fx < 0 ? 0 : (fx > width ? width : fx);
  fy = fy < 0 ? 0 : (fy > height ? height : fy);
  *fx_out = (int32_t)fx;
  *fy_out = (int32_t)fy;
  return fx != 0 && fy != 0;  // both-zero sentinel
}

static inline void box_update(int32_t* bx, int32_t fx, int32_t fy) {
  if (fy < bx[0]) bx[0] = fy;
  if (fx < bx[1]) bx[1] = fx;
  if (fy > bx[2]) bx[2] = fy;
  if (fx > bx[3]) bx[3] = fx;
}

void band_plan_spans(
    const int32_t* ray_idxs /* (n,) tile-ordered, non-negative */, int64_t n,
    const double* P /* (V, 3, 4) row-major */, int n_views,
    const double* P_pinv /* (4, 3) */, const double* cc /* (3,) */,
    const double* bbox /* (6,) */, int height, int width, int padding,
    int depth_planes, int group_d, int rays_per_block,
    int32_t* out_spans /* (V, 2) (y_span, x_span) maxima */) {
  const int64_t nb = n / rays_per_block;
  const int gd = group_d < depth_planes ? group_d : depth_planes;
  const int ng = depth_planes / gd;
  const int offset = padding - (padding - 1) / 2;
  const double inv_dm1 = 1.0 / (double)(depth_planes - 1);
  // per-(block, group, view) boxes: min_y, min_x, max_y, max_x
  std::vector<int32_t> boxes((size_t)nb * ng * n_views * 4);
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < nb; ++b) {
    int32_t* box = boxes.data() + (size_t)b * ng * n_views * 4;
    for (int j = 0; j < ng * n_views; ++j) {
      box[4 * j + 0] = INT32_MAX;  // min_y
      box[4 * j + 1] = INT32_MAX;  // min_x
      box[4 * j + 2] = -1;         // max_y
      box[4 * j + 3] = -1;         // max_x
    }
    for (int r = 0; r < rays_per_block; ++r) {
      double s[3], e[3];
      ray_segment_single(ray_idxs[b * rays_per_block + r], P_pinv, cc,
                         bbox, height, s, e);
      if (s[0] == e[0] && s[1] == e[1] && s[2] == e[2]) continue;  // miss
      const double dx = e[0] - s[0], dy = e[1] - s[1], dz = e[2] - s[2];
      for (int v = 0; v < n_views; ++v) {
        const double* Pv = P + 12 * v;
        for (int g = 0; g < ng; ++g) {
          // The projection of the 3D segment is per-coordinate a
          // MOEBIUS function of the depth index — monotone wherever w
          // keeps its sign — so a depth group's box is attained at the
          // group's two ENDPOINT planes unless w changes sign inside
          // the group or a clamp sentinel interferes; those rare
          // (border / behind-camera) groups take the per-plane loop.
          const int d0 = g * gd, d1 = g * gd + gd - 1;
          const double f0 = (double)d0 * inv_dm1,
                       f1 = (double)d1 * inv_dm1;
          double w0, w1;
          int32_t fx0, fy0, fx1, fy1;
          const bool ok0 = project_feature_idx_single(
              Pv, s[0] + f0 * dx, s[1] + f0 * dy, s[2] + f0 * dz,
              offset, width, height, &w0, &fx0, &fy0);
          const bool ok1 = project_feature_idx_single(
              Pv, s[0] + f1 * dx, s[1] + f1 * dy, s[2] + f1 * dz,
              offset, width, height, &w1, &fx1, &fy1);
          int32_t* bx = box + 4 * (g * n_views + v);
          if (ok0 && ok1 && ((w0 > 0.0) == (w1 > 0.0))) {
            box_update(bx, fx0, fy0);
            box_update(bx, fx1, fy1);
            continue;
          }
          for (int d = d0; d <= d1; ++d) {
            const double f = (double)d * inv_dm1;
            double w;
            int32_t fx, fy;
            if (project_feature_idx_single(
                    Pv, s[0] + f * dx, s[1] + f * dy, s[2] + f * dz,
                    offset, width, height, &w, &fx, &fy))
              box_update(bx, fx, fy);
          }
        }
      }
    }
  }
  for (int v = 0; v < n_views; ++v) {
    out_spans[2 * v] = 0;
    out_spans[2 * v + 1] = 0;
  }
  for (int64_t b = 0; b < nb; ++b) {
    const int32_t* box = boxes.data() + (size_t)b * ng * n_views * 4;
    for (int g = 0; g < ng; ++g)
      for (int v = 0; v < n_views; ++v) {
        const int32_t* bx = box + 4 * (g * n_views + v);
        if (bx[2] < 0) continue;  // all-sentinel: empty box, span 0
        const int32_t sy = bx[2] - bx[0], sx = bx[3] - bx[1];
        if (sy > out_spans[2 * v]) out_spans[2 * v] = sy;
        if (sx > out_spans[2 * v + 1]) out_spans[2 * v + 1] = sx;
      }
  }
}

}  // extern "C"
