"""Depth-plane -> voxel probability mapping (top-2 inverse-distance interp).

Re-implements the reference's `li_2` mapping
(raynet/planes_voxels_mapping/planes_voxels_mapping.py:165-211 and its CUDA
twin cuda_implementations/planes_voxels_mapping.cu:6-92) as one batched,
differentiable JAX op.

Because the D depth hypotheses are UNIFORM in the segment parameter t, the
two nearest hypotheses of a projected voxel are always the bracketing pair
``floor(t * (D-1))`` and ``+1`` — so the reference's per-voxel argsort over D
distances collapses to index arithmetic (O(M) instead of O(M·D·logD)).
"""
from functools import partial

import jax
import jax.numpy as jnp

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
    t = jnp.einsum("nmc,nc->nm", vdir, ray) / jnp.einsum(
        "nc,nc->n", ray, ray
    )[:, None]
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
