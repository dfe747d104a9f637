"""Backend dispatch facades.

Parity: raynet/ray_marching/ray_marching.py:84-90
(get_voxel_traversal_backend: "cython"/"cuda") and
raynet/planes_voxels_mapping/depth_to_voxels.py (get_depth_to_voxels_backend:
"numpy"/"cuda"). On TPU both roles are served by the single JAX
implementation; the historical names are accepted aliases.
"""
import numpy as np
import jax.numpy as jnp

from .ray_marching import voxel_traversal


def get_ray_voxel_indices(bbox, grid_shape, ray_starts, ray_ends, max_voxels):
    """Batched voxel traversal with a numpy API (host callers).

    Returns (ray_voxel_indices (N, M, 3) int32, ray_voxel_count (N,) int32).
    """
    vox, cnt = voxel_traversal(
        jnp.asarray(np.asarray(bbox).reshape(-1), dtype=jnp.float32),
        jnp.asarray(ray_starts, dtype=jnp.float32),
        jnp.asarray(ray_ends, dtype=jnp.float32),
        tuple(int(g) for g in grid_shape),
        int(max_voxels),
    )
    return np.asarray(vox), np.asarray(cnt)


def perform_ray_marching(scene, grid_shape, ray_starts, ray_ends, max_voxels):
    """Scene-level convenience wrapper over :func:`get_ray_voxel_indices`."""
    return get_ray_voxel_indices(
        scene.bbox, grid_shape, ray_starts, ray_ends, max_voxels
    )


def get_voxel_traversal_backend(name="xla"):
    """"cython"/"cuda"/"xla" all resolve to the batched JAX traversal."""
    if name not in ("cython", "cuda", "xla", "jax"):
        raise KeyError("unknown voxel traversal backend %r" % (name,))
    return get_ray_voxel_indices


def depth_to_voxels(
    S, ray_voxel_indices, ray_voxel_count, ray_starts, ray_ends, bbox,
    grid_shape, depth_planes, interpolation="li", gamma=10.0,
):
    """Numpy-API wrapper of the fused depth->voxel mapping.

    ``interpolation`` selects the variant ("li"/"li_2"/"quadratic"/"kde" —
    the reference's single_ray_depth_to_voxels factory names,
    planes_voxels_mapping.py:284-289); ``gamma`` is the kde bandwidth.
    """
    from .planes_voxels import planes_to_voxels_mapping_by_name

    return np.asarray(
        planes_to_voxels_mapping_by_name(
            jnp.asarray(S),
            jnp.asarray(ray_voxel_indices),
            jnp.asarray(ray_voxel_count),
            jnp.asarray(ray_starts, dtype=jnp.float32),
            jnp.asarray(ray_ends, dtype=jnp.float32),
            jnp.asarray(np.asarray(bbox).reshape(-1), dtype=jnp.float32),
            tuple(int(g) for g in grid_shape),
            int(depth_planes),
            interpolation=interpolation,
            gamma=gamma,
        )
    )


def get_depth_to_voxels_backend(name="xla"):
    """"numpy"/"cuda"/"xla" all resolve to the batched JAX mapping."""
    if name not in ("numpy", "cuda", "xla", "jax"):
        raise KeyError("unknown depth-to-voxels backend %r" % (name,))
    return depth_to_voxels
