"""Amanatides-Woo voxel-grid traversal as a batched, fixed-shape JAX op.

The reference implements this DDA twice (Cython: raynet/ray_marching/
ray_tracing.pyx:64-199; CUDA: raynet/cuda_implementations/ray_tracing.cu),
both as sequential per-ray loops with early exit. On TPU the natural mapping
is the transpose: a ``lax.scan`` over the (static) step budget M whose body
is elementwise over all N rays at once — every step is a handful of VPU ops
on (N,)-shaped arrays, and the early exit becomes an ``alive`` mask.

Exact semantic parity points:
- eps = 1e-2 boundary nudging of both endpoints (ray_tracing.pyx:114-119)
- first voxel emitted unconditionally if inside the grid, else count=0
- stepping order: X beats Y beats Z on tMax ties is NOT symmetric — the
  nested comparisons are ``tMaxX < tMaxY ? (tMaxX < tMaxZ ? X : Z)
  : (tMaxY < tMaxZ ? Y : Z)`` (pyx:169-194)
- walking out of the grid terminates WITHOUT emitting; reaching the last
  voxel or filling M entries terminates AFTER emitting
"""
from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-2
_FLT_MAX = jnp.float32(3.4028235e38)


@partial(jax.jit, static_argnames=("grid_shape", "max_voxels"))
def voxel_traversal(bbox, ray_start, ray_end, grid_shape, max_voxels):
    """Traverse a regular voxel grid along N ray segments.

    Arguments
    ---------
        bbox: (6,) float32 [min_xyz, max_xyz] of the grid
        ray_start, ray_end: (N, 3) float32 segment endpoints (normally the
            bbox entry/exit points from the sampling ops)
        grid_shape: static (3,) ints — voxels per axis
        max_voxels: static int M — per-ray step budget

    Returns
    -------
        voxel_indices: (N, M, 3) int32, zero-padded past each ray's count
        counts: (N,) int32 number of visited voxels per ray
    """
    grid = jnp.asarray(grid_shape, dtype=jnp.int32)
    gridf = grid.astype(jnp.float32)
    bbox = jnp.asarray(bbox, dtype=jnp.float32).reshape(6)

    bin_size = (bbox[3:] - bbox[:3]) / gridf  # (3,)
    start = ray_start - bbox[None, :3]
    end = ray_end - bbox[None, :3]
    ray = end - start
    step = jnp.where(ray >= 0, 1, -1).astype(jnp.int32)  # (N, 3)
    stepf = step.astype(jnp.float32)

    # Nudge endpoints off voxel boundaries (pyx:114-119).
    start = start + stepf * bin_size[None] * _EPS
    end = end - stepf * bin_size[None] * _EPS

    cur = jnp.floor(start / bin_size[None]).astype(jnp.int32)  # (N, 3)
    last = jnp.floor(end / bin_size[None]).astype(jnp.int32)

    inside0 = jnp.all((cur >= 0) & (cur < grid[None]), axis=-1)  # (N,)

    # t of the next boundary crossing per axis (pyx:130-157).
    cur_coord = cur.astype(jnp.float32) * bin_size[None]
    boundary = jnp.where(
        (step < 0) & (cur_coord < start),
        cur_coord,
        cur_coord + stepf * bin_size[None],
    )
    t_max = jnp.where(ray != 0, (boundary - start) / ray, _FLT_MAX)
    t_delta = jnp.where(ray != 0, stepf * bin_size[None] / ray, _FLT_MAX)

    def body(carry, _):
        # CLOSED-FORM crossing times: the carry holds per-axis crossing
        # COUNTS and each step evaluates t_a = t_max0 + n_a * t_delta_a.
        # The incremental ``t += t_delta`` formulation drifts ~1e-5 over
        # hundreds of f32 steps; closed form keeps every implementation
        # (this scan, the Pallas DDA, the fused BP beam kernel, the numpy
        # oracle) ordering crossings identically.
        cur, ncross, alive = carry
        t_cur = t_max + ncross.astype(jnp.float32) * t_delta
        at_last = jnp.all(cur == last, axis=-1)
        advance = alive & ~at_last  # rays still stepping (pyx:168)

        # Axis selection replicating the nested-if tie-breaking.
        tx, ty, tz = t_cur[:, 0], t_cur[:, 1], t_cur[:, 2]
        axis = jnp.where(
            tx < ty,
            jnp.where(tx < tz, 0, 2),
            jnp.where(ty < tz, 1, 2),
        )  # (N,)
        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        new_cur = cur + onehot * step

        moved = new_cur[jnp.arange(cur.shape[0]), axis]
        grid_ax = grid[axis]
        oob = (moved < 0) | (moved >= grid_ax)

        emit = advance & ~oob
        cur = jnp.where(emit[:, None], new_cur, cur)
        ncross = ncross + jnp.where(emit[:, None], onehot, 0)
        return (cur, ncross, emit), (cur, emit)

    (_, _, _), (steps_vox, steps_emit) = jax.lax.scan(
        body, (cur, jnp.zeros_like(cur), inside0), None,
        length=max_voxels - 1,
    )
    # steps_*: (M-1, N, ...) — prepend the unconditional first emission.
    voxels = jnp.concatenate([cur[None], steps_vox], axis=0)  # (M, N, 3)
    emitted = jnp.concatenate([inside0[None], steps_emit], axis=0)  # (M, N)

    voxels = jnp.where(emitted[..., None], voxels, 0)
    counts = emitted.sum(axis=0).astype(jnp.int32)

    return (
        jnp.transpose(voxels, (1, 0, 2)),
        counts,
    )


def flatten_voxel_indices(voxel_indices, grid_shape):
    """(N, M, 3) voxel indices -> (N, M) flat row-major grid offsets."""
    d1, d2, d3 = grid_shape
    return (
        voxel_indices[..., 0] * (d2 * d3)
        + voxel_indices[..., 1] * d3
        + voxel_indices[..., 2]
    )


def unflatten_voxel_indices(flat_idx, grid_shape):
    """(..., ) flat row-major offsets -> (..., 3) voxel indices."""
    d1, d2, d3 = grid_shape
    return jnp.stack(
        [flat_idx // (d2 * d3), (flat_idx // d3) % d2, flat_idx % d3],
        axis=-1,
    )


def voxel_traversal_flat(
    bbox, ray_start, ray_end, grid_shape, max_voxels, use_pallas=False
):
    """Traversal returning (N, M) FLAT indices + counts.

    ``use_pallas`` selects the VMEM-resident Pallas kernel (TPU; ~100x the
    lax.scan formulation at production shapes) — the scan path remains for
    CPU execution and as the cross-checked reference.
    """
    if use_pallas:
        from .pallas.traversal import voxel_traversal_flat_pallas

        return voxel_traversal_flat_pallas(
            bbox, ray_start, ray_end, grid_shape, max_voxels
        )
    vox, counts = voxel_traversal(
        bbox, ray_start, ray_end, grid_shape, max_voxels
    )
    return flatten_voxel_indices(vox, grid_shape), counts


def voxel_centers(voxel_indices, bbox, grid_shape):
    """World-space centers of (..., 3) voxel indices.

    Matches get_voxel_grid's linspace-derived bin size (the grid centers the
    reference uploads to the device; utils/generic_utils.py:90-110).
    """
    bbox = jnp.asarray(bbox, dtype=jnp.float32).reshape(6)
    grid = jnp.asarray(grid_shape, dtype=jnp.float32)
    bin_size = (bbox[3:] - bbox[:3]) / grid
    return bbox[:3] + voxel_indices.astype(jnp.float32) * bin_size + bin_size / 2
