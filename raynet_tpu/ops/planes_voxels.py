"""Depth-plane -> voxel probability mapping.

Re-implements the reference's interpolation family
(raynet/planes_voxels_mapping/planes_voxels_mapping.py) as batched,
differentiable JAX ops:

- ``li`` / ``li_2`` (the default, :165-211 and its CUDA twin
  cuda_implementations/planes_voxels_mapping.cu:6-92): top-2
  inverse-distance interpolation. Because the D depth hypotheses are
  UNIFORM in the segment parameter t, the two nearest hypotheses of a
  projected voxel are always the bracketing pair ``floor(t * (D-1))`` and
  ``+1`` — the reference's per-voxel argsort over D distances collapses to
  an exact hat-function sum (O(M) instead of O(M·D·logD)).
- ``quadratic`` (:214-235): scipy ``interp1d(kind="quadratic")`` — a k=2
  interpolating B-spline. The spline's coefficients are LINEAR in the D
  sample values and the knots are static, so the whole spline is a constant
  (intervals, 3, D) tensor computed once at trace time; evaluation is a
  per-interval Horner step.
- ``kde`` (:238-281): Gaussian kernel density over squared world-space
  distances along the ray, gamma=10.

Select by name with :func:`get_planes_voxels_mapping` (same names as the
reference factory at :284-289, which also maps "li" to the li_2 kernel).
"""
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

_EPS_T = 1e-4


def project_voxels_to_rays(voxel_centers, ray_start, ray_end, clip=True):
    """Parameter t of each voxel center projected onto its ray segment.

    Arguments
    ---------
        voxel_centers: (N, M, 3) world-space centers of visited voxels
        ray_start, ray_end: (N, 3) segment endpoints (the first/last sampled
            points of the ray)

    Returns
    -------
        t: (N, M) float32, clipped to [eps, 1-eps] when ``clip``
        (parity: planes_voxels_mapping.py:59-94, eps=1e-4).
    """
    ray = ray_end - ray_start  # (N, 3)
    vdir = voxel_centers - ray_start[:, None, :]  # (N, M, 3)
    # elementwise mul + reduce, NOT an einsum: an f32 einsum lowers to
    # the MXU at DEFAULT precision (bf16-truncated operands) on TPU —
    # see ops/geometry.project_points
    t = (vdir * ray[:, None, :]).sum(-1) / (ray * ray).sum(-1)[:, None]
    if clip:
        t = jnp.clip(t, _EPS_T, 1 - _EPS_T)
    return t


def depth_planes_to_voxels(S_planes, t, counts, depth_planes):
    """Interpolate per-plane depth probabilities onto visited voxels.

    Arguments
    ---------
        S_planes: (N, D) per-depth-plane probabilities (softmax output)
        t: (N, M) projected voxel parameters in [0, 1]
        counts: (N,) number of valid voxels per ray
        depth_planes: static D

    Returns
    -------
        S_vox: (N, M) per-voxel probabilities, masked to each ray's count and
        renormalized to sum to 1 over the valid entries.

    With UNIFORM plane spacing h = 1/(D-1), the two-nearest
    inverse-distance interpolation is EXACTLY the hat-function sum

        s_new(t) = sum_d s_d * max(0, 1 - |t - t_d| / h)

    (for bracketed t the two coefficients are 1 - d1/h and 1 - d2/h and all
    other hats vanish). Evaluating the sum directly replaces two
    take_along_axis row gathers over 42M elements — slow on TPU — with one
    fused elementwise pass over (N, M) x D.
    """
    D = depth_planes
    n, m = t.shape
    scale = jnp.float32(D - 1)  # = 1/h

    s_new = jnp.zeros_like(t)
    for d in range(D):  # unrolled: D is small and static
        w = jnp.maximum(0.0, 1.0 - jnp.abs(t - d / scale) * scale)
        s_new = s_new + S_planes[:, d][:, None] * w

    mask = jnp.arange(m)[None, :] < counts[:, None]
    s_new = jnp.where(mask, s_new, 0.0)
    total = s_new.sum(axis=1, keepdims=True)
    return jnp.where(mask, s_new / jnp.maximum(total, 1e-30), 0.0)


@lru_cache(maxsize=None)
def _quadratic_spline_tensor(depth_planes):
    """(intervals, 3, D) tensor C with
    s(t) = sum_j C[k, j] . s * (t - breaks[k])^(2-j) for t in interval k.

    Built once per D by running scipy's interpolator on the identity basis
    (the spline coefficients are linear in the sample values); matches
    ``interp1d(t_points, s, kind="quadratic")`` exactly.
    """
    from scipy.interpolate import PPoly, make_interp_spline

    t_points = np.linspace(0.0, 1.0, depth_planes)
    cols = []
    breaks = None
    for d in range(depth_planes):
        e = np.zeros(depth_planes)
        e[d] = 1.0
        pp = PPoly.from_spline(make_interp_spline(t_points, e, k=2))
        # from_spline keeps the repeated boundary knots; drop the degenerate
        # zero-length end intervals.
        keep = np.diff(pp.x) > 0
        if breaks is None:
            breaks = np.concatenate([pp.x[:-1][keep], pp.x[-1:]])
        cols.append(pp.c[:, keep])  # (3, K)
    C = np.stack(cols, axis=-1).transpose(1, 0, 2)  # (K, 3, D)
    return breaks.astype(np.float32), C.astype(np.float32)


def depth_planes_to_voxels_quadratic(S_planes, t, counts, depth_planes):
    """Quadratic-spline variant (planes_voxels_mapping.py:214-235).

    ``t`` must already be clipped to [eps, 1-eps] (the reference clips).
    """
    breaks_np, C_np = _quadratic_spline_tensor(depth_planes)
    breaks = jnp.asarray(breaks_np)
    C = jnp.asarray(C_np)

    # Per-ray polynomial tables: (N, K, 3). HIGHEST precision: the MXU's
    # DEFAULT f32 einsum truncates operands to bf16 (ops/geometry note).
    T = jnp.einsum(
        "kjd,nd->nkj", C, S_planes,
        precision=jax.lax.Precision.HIGHEST,
    )
    idx = jnp.clip(
        jnp.searchsorted(breaks, t, side="right") - 1, 0, C.shape[0] - 1
    )  # (N, M)
    dt = t - breaks[idx]
    c = jnp.take_along_axis(T, idx[..., None], axis=1)  # (N, M, 3)
    s_new = (c[..., 0] * dt + c[..., 1]) * dt + c[..., 2]

    mask = jnp.arange(t.shape[1])[None, :] < counts[:, None]
    s_new = jnp.where(mask, s_new, 0.0)
    total = s_new.sum(axis=1, keepdims=True)
    return jnp.where(mask, s_new / jnp.maximum(total, 1e-30), 0.0)


def depth_planes_to_voxels_kde(
    S_planes, t, ray_norm_sq, counts, depth_planes, gamma=10.0
):
    """Gaussian-KDE variant (planes_voxels_mapping.py:238-281).

    ``t`` is the UNclipped projection parameter; distances are squared
    world-space offsets along the ray: (t_d - t)^2 * ||ray||^2.
    """
    D = depth_planes
    scale = jnp.float32(D - 1)
    g = ray_norm_sq[:, None] * gamma  # (N, 1)

    s_new = jnp.zeros_like(t)
    for d in range(D):  # unrolled: D is small and static
        w = jnp.exp(-((t - d / scale) ** 2) * g)
        s_new = s_new + S_planes[:, d][:, None] * w

    mask = jnp.arange(t.shape[1])[None, :] < counts[:, None]
    s_new = jnp.where(mask, s_new, 0.0)
    total = s_new.sum(axis=1, keepdims=True)
    return jnp.where(mask, s_new / jnp.maximum(total, 1e-30), 0.0)


@partial(jax.jit, static_argnames=("grid_shape", "depth_planes"))
def planes_to_voxels_mapping(
    S_planes,
    voxel_indices,
    counts,
    ray_start,
    ray_end,
    bbox,
    grid_shape,
    depth_planes,
):
    """Fused: voxel centers -> segment projection -> top-2 interpolation."""
    from .ray_marching import voxel_centers as _centers

    centers = _centers(voxel_indices, bbox, grid_shape)  # (N, M, 3)
    t = project_voxels_to_rays(centers, ray_start, ray_end)
    return depth_planes_to_voxels(S_planes, t, counts, depth_planes)


@partial(
    jax.jit, static_argnames=("grid_shape", "depth_planes", "interpolation")
)
def planes_to_voxels_mapping_by_name(
    S_planes,
    voxel_indices,
    counts,
    ray_start,
    ray_end,
    bbox,
    grid_shape,
    depth_planes,
    interpolation="li",
    gamma=10.0,
):
    """Variant-selectable mapping (reference factory names :284-289)."""
    from .ray_marching import voxel_centers as _centers

    centers = _centers(voxel_indices, bbox, grid_shape)
    if interpolation in ("li", "li_2"):
        t = project_voxels_to_rays(centers, ray_start, ray_end)
        return depth_planes_to_voxels(S_planes, t, counts, depth_planes)
    if interpolation == "quadratic":
        t = project_voxels_to_rays(centers, ray_start, ray_end, clip=True)
        return depth_planes_to_voxels_quadratic(
            S_planes, t, counts, depth_planes
        )
    if interpolation == "kde":
        t = project_voxels_to_rays(centers, ray_start, ray_end, clip=False)
        ray = ray_end - ray_start
        ray_norm_sq = (ray * ray).sum(-1)
        return depth_planes_to_voxels_kde(
            S_planes, t, ray_norm_sq, counts, depth_planes, gamma
        )
    raise KeyError("unknown interpolation %r" % (interpolation,))


def get_planes_voxels_mapping(name):
    """Factory with the reference's names ("li" resolves to the li_2 kernel
    there too); returns a partial of the batched fused op."""
    if name not in ("li", "li_2", "quadratic", "kde"):
        raise KeyError("unknown planes->voxels mapping %r" % (name,))
    return partial(planes_to_voxels_mapping_by_name, interpolation=name)
