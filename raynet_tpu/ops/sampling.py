"""Depth-hypothesis sampling along rays, as batched JAX ops.

One implementation per scheme replaces the reference's triplication
(raynet/common/sampling_schemes.py, tf_implementations/sampling_schemes.py,
cuda_implementations/sampling_schemes.cu). All functions are jit-friendly:
static D, fixed shapes, no data-dependent control flow.
"""
from functools import partial

import jax
import jax.numpy as jnp

from .geometry import rays_from_pixel_idxs, rays_entry_exit_bbox


def sample_points_along_segments(ray_start, ray_end, depth_planes):
    """D points uniformly spaced on each [start, end] segment.

    Matches the device kernel's ``start + k*(end-start)/(D-1)`` evaluation
    (sampling_schemes.cu:116-121) rather than linspace-in-t, so endpoint
    rounding agrees bitwise with the reference.

    Arguments
    ---------
        ray_start, ray_end: (N, 3)
        depth_planes: static int D

    Returns
    -------
        (N, D, 3) float32 sampled points.
    """
    k = jnp.arange(depth_planes, dtype=jnp.float32)
    frac = k / (depth_planes - 1)  # (D,)
    delta = (ray_end - ray_start)[:, None, :]  # (N, 1, 3)
    return ray_start[:, None, :] + frac[None, :, None] * delta


@partial(jax.jit, static_argnames=("height", "depth_planes"))
def sample_points_in_bbox(
    ray_idxs, P_pinv, camera_center, bbox, height, depth_planes
):
    """Uniform depth hypotheses between each ray's bbox entry and exit.

    Arguments
    ---------
        ray_idxs: (N,) int32 column-major ray indices
        P_pinv: (4, 3) pseudo-inverse projection of the reference view
        camera_center: (3,)
        bbox: (6,) [min_xyz, max_xyz]
        height: static image height
        depth_planes: static D

    Returns
    -------
        points: (N, D, 3) float32
    """
    directions = rays_from_pixel_idxs(ray_idxs, P_pinv, camera_center, height)
    ray_start, ray_end = rays_entry_exit_bbox(
        directions, camera_center, bbox[:3], bbox[3:]
    )
    return sample_points_along_segments(ray_start, ray_end, depth_planes)


@partial(jax.jit, static_argnames=("height", "depth_planes"))
def sample_points_in_range(
    ray_idxs, P_pinv, camera_center, depth_range, height, depth_planes
):
    """Uniform metric-depth hypotheses on the normalized ray direction.

    Parity: raynet/common/sampling_schemes.py:178-237 (SamplingInRangeScheme).
    ``depth_range`` is a (2,) [near, far] array in world units.
    """
    directions = rays_from_pixel_idxs(ray_idxs, P_pinv, camera_center, height)
    directions = directions / jnp.linalg.norm(directions, axis=-1, keepdims=True)
    t = jnp.linspace(depth_range[0], depth_range[1], depth_planes)
    return camera_center[None, None, :] + (
        directions[:, None, :] * t[None, :, None]
    )


def segments_in_bbox(ray_idxs, P_pinv, camera_center, bbox, height):
    """(ray_start, ray_end) segments for each ray through the bbox."""
    directions = rays_from_pixel_idxs(ray_idxs, P_pinv, camera_center, height)
    return rays_entry_exit_bbox(directions, camera_center, bbox[:3], bbox[3:])


SAMPLING_SCHEMES = ("sample_in_bbox", "sample_in_range")


def get_sampling_scheme_op(name):
    """Factory mirroring the reference's scheme names to batched ops."""
    if "bbox" in name:
        return sample_points_in_bbox
    if "range" in name:
        return sample_points_in_range
    raise KeyError("unknown sampling scheme %r" % (name,))
