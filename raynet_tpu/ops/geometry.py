"""Differentiable geometry ops: projection, ray construction, slab tests.

Conventions (identical to the reference device kernels,
raynet/cuda_implementations/sampling_schemes.cu):

- Ray indices are COLUMN-MAJOR over the image: ``x = r // H``, ``y = r % H``.
- The reference promotes the back-projection ``P_pinv @ [x, y, 1]`` to
  double (sampling_schemes.cu:15-39). On device it runs in float32 (f64 is
  emulated and slow on TPU); only the host oracle
  (``host_rays_entry_exit``) keeps the f64 dot product, so device rays
  match it to ~1e-6 relative, not bitwise.
- Near/far of the bbox slab test are swapped by |t| so the segment always
  runs away from the camera (sampling_schemes.cu:80-89).
"""
import jax.numpy as jnp
import numpy as np


def project_points(P, points):
    """Project homogeneous-appended 3D points with a 3x4 camera matrix.

    Arguments
    ---------
        P: (..., 3, 4) projection matrix(es)
        points: (..., N, 3) 3D points (the homogeneous 1 is implicit)

    Returns
    -------
        (..., N, 2) dehomogenized pixel coordinates (x, y).

    Implementation note: this is a SCALAR multiply-add chain, not an
    einsum. On TPU an f32 einsum lowers to the MXU at DEFAULT precision
    (bf16-truncated operands) — measured up to 3e4 px of error near the
    epipole (w -> 0) vs exact f32, silently corrupting every feature
    lookup. The reference computes projections in double precision
    (sampling_schemes.cu:15-39); the left-to-right f32 chain matches the
    lane-major banded front end (pallas/planesweep.py) bit for bit.
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]

    def row(i):
        Pi = P[..., i, :]
        return (
            Pi[..., 0, None] * x + Pi[..., 1, None] * y
            + Pi[..., 2, None] * z + Pi[..., 3, None]
        )

    u, v, w = row(0), row(1), row(2)
    return jnp.stack([u / w, v / w], axis=-1)


def rays_from_pixel_idxs(ray_idxs, P_pinv, camera_center, height):
    """Back-project column-major ray indices into world-space directions.

    Arguments
    ---------
        ray_idxs: (N,) int32 ray indices
        P_pinv: (4, 3) pseudo-inverse projection matrix
        camera_center: (3,) camera center (world)
        height: static int, image height

    Returns
    -------
        directions: (N, 3) float32 un-normalized ray directions
        (``destination - camera_center`` where destination is the
        dehomogenized back-projection of the pixel).
    """
    x = (ray_idxs // height).astype(jnp.float32)
    y = (ray_idxs % height).astype(jnp.float32)

    # The reference evaluates this projection in double precision
    # (sampling_schemes.cu:15-39). On TPU, f64 is emulated and slow; a
    # scalar f32 multiply-add chain is exact (an f32 matmul would hit the
    # MXU at DEFAULT precision — bf16-truncated operands, see
    # project_points) and matches double to ~1e-6 relative for O(1)-O(10)
    # P_pinv entries, well inside the 0.999-agreement budget.
    Pp = P_pinv.astype(jnp.float32)
    hom = [
        Pp[i, 0] * x + Pp[i, 1] * y + Pp[i, 2] for i in range(4)
    ]
    dest = jnp.stack(
        [hom[0] / hom[3], hom[1] / hom[3], hom[2] / hom[3]], axis=-1
    )
    return dest - camera_center[None, :]


def rays_entry_exit_bbox(directions, camera_center, bbox_min, bbox_max):
    """Slab test + |t| near/far swap; returns per-ray segment endpoints.

    Arguments
    ---------
        directions: (N, 3) ray directions
        camera_center: (3,) shared origin
        bbox_min, bbox_max: (3,)

    Returns
    -------
        ray_start, ray_end: (N, 3) float32 entry and exit points. Rays whose
        LINE misses the box collapse to a zero-length segment at the line's
        mid-slab (closest-approach) point — a point ON the ray and OUTSIDE
        the box, so traversal/marching emits nothing, projections stay near
        the ray's own epipolar band, and planners can drop them by testing
        ``(ray_end - ray_start) == 0``. (The reference leaves miss segments
        unspecified and relies on callers filtering,
        ray_tracing.pyx:64-199 / sampling_schemes.cu:44-90.)
    """
    t1 = (bbox_min[None] - camera_center[None]) / directions
    t2 = (bbox_max[None] - camera_center[None]) / directions
    t_near = jnp.min(jnp.stack([t1, t2]), axis=0).max(axis=-1)
    t_far = jnp.max(jnp.stack([t1, t2]), axis=0).min(axis=-1)

    near_mask = jnp.abs(t_near) < jnp.abs(t_far)
    t_near_actual = jnp.where(near_mask, t_near, t_far)
    t_far_actual = jnp.where(near_mask, t_far, t_near)
    miss = t_near > t_far
    # Zero direction components put +-inf in t_near/t_far (inf - inf =
    # NaN); fall back to t = 0 — the camera center, which is outside the
    # box whenever any ray misses (a line through an interior point
    # always hits), preserving the zero-length-outside invariant.
    t_mid = 0.5 * (t_near + t_far)
    t_mid = jnp.where(jnp.isfinite(t_mid), t_mid, 0.0)
    t_near_actual = jnp.where(miss, t_mid, t_near_actual)
    t_far_actual = jnp.where(miss, t_mid, t_far_actual)

    ray_start = camera_center[None] + t_near_actual[:, None] * directions
    ray_end = camera_center[None] + t_far_actual[:, None] * directions
    return ray_start, ray_end


def rays_slab_t(directions, origins, bbox_min, bbox_max):
    """Raw (t_near, t_far) of the slab test, no swap. origins: (N, 3)."""
    t1 = (bbox_min[None] - origins) / directions
    t2 = (bbox_max[None] - origins) / directions
    t_near = jnp.minimum(t1, t2).max(axis=-1)
    t_far = jnp.maximum(t1, t2).min(axis=-1)
    return t_near, t_far


def host_rays_entry_exit(ray_idxs, P_pinv, camera_center, bbox, height,
                         dtype=np.float32):
    """Float64 host (numpy) evaluation of ray segments, for the strict
    precision path, the beam/band PLANNERS (which consume f64 directly:
    downloading the device f32 segments cost ~1.4 s/view through the
    axon tunnel, and f32 rounding is orders of magnitude inside the
    planners' +-2-cell jitter budgets), and as the oracle for
    :func:`rays_from_pixel_idxs` + :func:`rays_entry_exit_bbox`.

    Miss semantics match the device op exactly: rays whose LINE misses
    the box collapse to a zero-length segment at the mid-slab point
    (zero direction components fall back to t = 0, the camera center).

    Returns ``dtype`` (ray_start, ray_end) of shape (N, 3).
    """
    ray_idxs = np.asarray(ray_idxs)
    # Native fused pass when available: the vectorized numpy form below
    # builds ~25 (N, 3) f64 temporaries and measured 5.5 s per 720p view
    # on a single-core host (the orchestration plan's largest term);
    # the C++ loop is one cache-resident pass with identical semantics
    # (tests/test_native.py checks agreement).
    if ray_idxs.size and ray_idxs.min() >= 0:
        from .. import native

        if native.is_available():
            s, e = native.rays_entry_exit(
                ray_idxs, P_pinv, camera_center, bbox, height
            )
            return s.astype(dtype, copy=False), e.astype(dtype, copy=False)
    return _host_rays_entry_exit_numpy(
        ray_idxs, P_pinv, camera_center, bbox, height, dtype
    )


def _host_rays_entry_exit_numpy(ray_idxs, P_pinv, camera_center, bbox,
                                height, dtype=np.float32):
    """Pure-numpy fallback / oracle for :func:`host_rays_entry_exit`."""
    ray_idxs = np.asarray(ray_idxs)
    x = (ray_idxs // height).astype(np.float64)
    y = (ray_idxs % height).astype(np.float64)
    px = np.stack([x, y, np.ones_like(x)], axis=-1)
    hom = px @ np.asarray(P_pinv, dtype=np.float64).T
    dest = hom[:, :3] / hom[:, 3:4]
    cc = np.asarray(camera_center, dtype=np.float64).reshape(3)
    directions = dest - cc[None]

    bbox = np.asarray(bbox, dtype=np.float64).reshape(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = (bbox[None, :3] - cc[None]) / directions
        t2 = (bbox[None, 3:] - cc[None]) / directions
    t_near = np.minimum(t1, t2).max(axis=1)
    t_far = np.maximum(t1, t2).min(axis=1)
    near_mask = np.abs(t_near) < np.abs(t_far)
    t_near_actual = np.where(near_mask, t_near, t_far)
    t_far_actual = np.where(near_mask, t_far, t_near)
    miss = t_near > t_far
    with np.errstate(invalid="ignore"):
        t_mid = 0.5 * (t_near + t_far)
    t_mid = np.where(np.isfinite(t_mid), t_mid, 0.0)
    t_near_actual = np.where(miss, t_mid, t_near_actual)
    t_far_actual = np.where(miss, t_mid, t_far_actual)
    ray_start = cc[None] + t_near_actual[:, None] * directions
    ray_end = cc[None] + t_far_actual[:, None] * directions
    return ray_start.astype(dtype), ray_end.astype(dtype)
