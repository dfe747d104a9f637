"""Fused per-ray-batch inference pipelines, one jit each.

These are the TPU equivalents of the reference's fused CUDA kernels:
- :func:`mvcnn_depth_step`  ~ similarities.py's
  multi_view_cnn forward pass with depth estimation (plane sweep + argmax)
- :func:`mvcnn_voxel_depth_step` ~ mvcnn_with_ray_marching_and_voxels_mapping
  (adds DDA traversal + depth->voxel interpolation, argmax voxel center)
- :func:`raynet_message_step` / :func:`raynet_depth_step` ~ raynet_fp.py's
  batch_raynet_fp / batch_complete_depth_estimation (adds BP message update
  against a global occupancy accumulator)

Everything in a step is one XLA program: sampling, gathers, contractions,
scans and scatters fuse into a single device launch per ray batch, replacing
the reference's per-stage kernel launches + host round-trips.
"""
from functools import partial

import jax
import jax.numpy as jnp

from .geometry import rays_from_pixel_idxs, rays_entry_exit_bbox
from .sampling import sample_points_along_segments
from .similarities import compute_similarities
from .ray_marching import (
    voxel_traversal_flat,
    unflatten_voxel_indices,
    voxel_centers,
)
from .planes_voxels import planes_to_voxels_mapping
from . import mrf


def _segments(ray_idxs, P_pinv, camera_center, bbox, height):
    directions = rays_from_pixel_idxs(ray_idxs, P_pinv, camera_center, height)
    return rays_entry_exit_bbox(directions, camera_center, bbox[:3], bbox[3:])


@partial(
    jax.jit,
    static_argnames=("height", "width", "padding", "depth_planes"),
)
def mvcnn_depth_step(
    ray_idxs,
    features,
    P,
    P_pinv,
    camera_center,
    bbox,
    height,
    width,
    padding,
    depth_planes,
):
    """Plane-sweep scoring + per-ray argmax depth.

    Returns (S (N, D) softmax scores, depth (N,) = ||argmax point - C||).
    Ties break to the first maximum, like the reference argmax.
    """
    ray_start, ray_end = _segments(
        ray_idxs, P_pinv, camera_center, bbox, height
    )
    points = sample_points_along_segments(ray_start, ray_end, depth_planes)
    S = compute_similarities(features, P, points, padding, height, width)

    best = jnp.argmax(S, axis=-1)  # (N,)
    best_points = jnp.take_along_axis(
        points, best[:, None, None], axis=1
    )[:, 0]
    depth = jnp.linalg.norm(best_points - camera_center[None], axis=-1)
    return S, depth


@partial(
    jax.jit,
    static_argnames=(
        "height",
        "width",
        "padding",
        "depth_planes",
        "grid_shape",
        "max_voxels",
        "use_pallas",
    ),
)
def mvcnn_voxel_depth_step(
    ray_idxs,
    features,
    P,
    P_pinv,
    camera_center,
    bbox,
    height,
    width,
    padding,
    depth_planes,
    grid_shape,
    max_voxels,
    use_pallas=False,
):
    """Plane sweep -> voxel traversal -> depth->voxel mapping -> argmax.

    Returns (S_vox (N, M), voxel_indices (N, M, 3), counts (N,), depth (N,)).
    """
    ray_start, ray_end = _segments(
        ray_idxs, P_pinv, camera_center, bbox, height
    )
    points = sample_points_along_segments(ray_start, ray_end, depth_planes)
    S_planes = compute_similarities(features, P, points, padding, height, width)

    flat_idx, counts = voxel_traversal_flat(
        bbox, ray_start, ray_end, grid_shape, max_voxels, use_pallas
    )
    vox = unflatten_voxel_indices(flat_idx, grid_shape)
    S_vox = planes_to_voxels_mapping(
        S_planes, vox, counts, ray_start, ray_end, bbox, grid_shape,
        depth_planes,
    )

    centers = voxel_centers(vox, bbox, grid_shape)  # (N, M, 3)
    best = jnp.argmax(S_vox, axis=-1)
    best_centers = jnp.take_along_axis(centers, best[:, None, None], axis=1)[
        :, 0
    ]
    depth = jnp.linalg.norm(best_centers - camera_center[None], axis=-1)
    depth = jnp.where(counts > 0, depth, 0.0)
    return S_vox, vox, counts, depth


@partial(
    jax.jit,
    static_argnames=(
        "height",
        "width",
        "padding",
        "depth_planes",
        "grid_shape",
        "max_voxels",
        "use_pallas",
        "first_iteration",
    ),
)
def raynet_message_step(
    ray_idxs,
    features,
    P,
    P_pinv,
    camera_center,
    bbox,
    messages_pon,
    grid_acc_flat,
    n_valid,
    height,
    width,
    padding,
    depth_planes,
    grid_shape,
    max_voxels,
    use_pallas=False,
    first_iteration=False,
):
    """Front half of RayNet + one BP message update for this ray batch.

    Returns (new_messages (N, M), scatter (G,)) where scatter is this batch's
    additive contribution to the NEXT iteration's accumulator grid.

    ``n_valid`` (dynamic scalar): rows >= n_valid are padding (the batch
    iterator repeats ray 0 to keep shapes static); their counts are zeroed so
    they contribute NOTHING to the scatter — otherwise the duplicated ray's
    messages would be accumulated once per padded row, silently saturating
    the occupancy along its voxel path.

    ``first_iteration``: the accumulator is still uniformly the prior and
    the incoming messages are zero, so the specialized first sweep skips the
    42M-element grid gather entirely (ops/mrf.bp_update_first).
    """
    ray_start, ray_end = _segments(
        ray_idxs, P_pinv, camera_center, bbox, height
    )
    points = sample_points_along_segments(ray_start, ray_end, depth_planes)
    S_planes = compute_similarities(features, P, points, padding, height, width)

    flat_idx, counts = voxel_traversal_flat(
        bbox, ray_start, ray_end, grid_shape, max_voxels, use_pallas
    )
    counts = jnp.where(
        jnp.arange(counts.shape[0]) < n_valid, counts, 0
    )
    vox = unflatten_voxel_indices(flat_idx, grid_shape)
    S_vox = planes_to_voxels_mapping(
        S_planes, vox, counts, ray_start, ray_end, bbox, grid_shape,
        depth_planes,
    )

    grid_size = int(grid_shape[0]) * int(grid_shape[1]) * int(grid_shape[2])
    if first_iteration:
        new_msgs, scatter = mrf.bp_update_first(
            S_vox, flat_idx, counts, grid_acc_flat[0], grid_size
        )
    else:
        new_msgs, scatter = mrf.bp_update(
            S_vox, flat_idx, counts, messages_pon, grid_acc_flat, grid_size
        )
    return new_msgs, scatter


@partial(
    jax.jit,
    static_argnames=(
        "height",
        "width",
        "padding",
        "depth_planes",
        "grid_shape",
        "max_voxels",
        "use_pallas",
    ),
)
def raynet_depth_step(
    ray_idxs,
    features,
    P,
    P_pinv,
    camera_center,
    bbox,
    messages_pon,
    grid_acc_flat,
    height,
    width,
    padding,
    depth_planes,
    grid_shape,
    max_voxels,
    use_pallas=False,
):
    """Final RayNet sweep: occlusion-aware posterior depth per ray.

    Returns (S_new (N, M), depth (N,)).
    """
    ray_start, ray_end = _segments(
        ray_idxs, P_pinv, camera_center, bbox, height
    )
    points = sample_points_along_segments(ray_start, ray_end, depth_planes)
    S_planes = compute_similarities(features, P, points, padding, height, width)

    flat_idx, counts = voxel_traversal_flat(
        bbox, ray_start, ray_end, grid_shape, max_voxels, use_pallas
    )
    vox = unflatten_voxel_indices(flat_idx, grid_shape)
    S_vox = planes_to_voxels_mapping(
        S_planes, vox, counts, ray_start, ray_end, bbox, grid_shape,
        depth_planes,
    )

    grid_size = int(grid_shape[0]) * int(grid_shape[1]) * int(grid_shape[2])
    S_new = mrf.depth_estimate(
        S_vox, flat_idx, counts, messages_pon, grid_acc_flat, grid_size
    )

    centers = voxel_centers(vox, bbox, grid_shape)
    best = jnp.argmax(S_new, axis=-1)
    best_centers = jnp.take_along_axis(centers, best[:, None, None], axis=1)[
        :, 0
    ]
    depth = jnp.linalg.norm(best_centers - camera_center[None], axis=-1)
    depth = jnp.where(counts > 0, depth, 0.0)
    return S_new, depth
