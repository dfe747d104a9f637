"""Generic host-side helpers: ray/pixel indexing, voxel grid construction.

Parity: raynet/utils/generic_utils.py. The ray <-> pixel mapping is
COLUMN-MAJOR throughout the framework: ray index r maps to pixel
``x = r // H`` (column) and ``y = r % H`` (row), matching the reference's
`cuda_implementations/sampling_schemes.cu:5-8` unravel and the `(W, H).T`
depth-map layout.
"""
import numpy as np


def pixel_to_ray(y, x, axis_length, axis_order="columns"):
    """Map a pixel to its ray index (column-major by default)."""
    if axis_order == "columns":
        return x * axis_length + y
    elif axis_order == "rows":
        return y * axis_length + x
    raise ValueError("axis_order argument can be either columns or rows")


def ray_to_pixel(ray_idx, height):
    """Inverse of :func:`pixel_to_ray` for column-major indexing.

    Returns (x, y) — x along the width, y along the height.
    """
    return ray_idx // height, ray_idx % height


def point_from_depth(camera_center, direction, depth):
    """3D point at metric ``depth`` along a (not necessarily unit) ray."""
    assert camera_center.shape == (3, 1)
    assert direction.shape == (3, 1)
    a_norm = direction / np.sqrt(np.sum(direction ** 2))
    return a_norm * depth + camera_center


def voxel_to_world_coordinates(voxel_index, bbox, grid_shape):
    """Center of a voxel in world coordinates.

    ``bbox`` is the (1, 6) [min, max] box; parity with
    raynet/utils/generic_utils.py:62-87.
    """
    assert bbox.shape == (1, 6)
    bin_size = (bbox[0, 3:] - bbox[0, :3]) / grid_shape
    t = voxel_index * bin_size
    t = t + bbox[0, :3]
    t = t + bin_size / 2
    return t


def get_voxel_grid(bbox, grid_shape):
    """Centers of all voxels of a regular grid over ``bbox``.

    Returns (3, D1, D2, D3) float32 (parity:
    raynet/utils/generic_utils.py:90-110).
    """
    assert bbox.shape == (1, 6)
    xyz = [
        np.linspace(s, e, c, endpoint=False, dtype=np.float32)
        for s, e, c in zip(bbox[0, :3], bbox[0, 3:], grid_shape)
    ]
    bin_size = np.array([xi[1] - xi[0] for xi in xyz]).reshape(3, 1, 1, 1)
    return np.stack(np.meshgrid(*xyz, indexing="ij")) + bin_size / 2


def point_to_voxel(p, bbox_origin, bin_size):
    """Voxel index containing a 3D point (floor semantics)."""
    assert p.shape == (3, 1)
    v = (p - bbox_origin) / bin_size
    return np.floor(v).astype(np.int32)
