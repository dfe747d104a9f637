"""Pallas traversal kernel vs the lax.scan reference op (interpret mode on
the CPU backend)."""
import numpy as np
import jax.numpy as jnp

from raynet_tpu.ops.ray_marching import voxel_traversal, flatten_voxel_indices
from raynet_tpu.ops.pallas.traversal import voxel_traversal_flat_pallas


def test_pallas_matches_scan_op(rng):
    bbox = np.array([-1.0, -2.0, 0.0, 3.0, 2.0, 1.5], dtype=np.float32)
    grid_shape = (13, 9, 5)
    M = 32
    n = 200  # not a multiple of the 1024-ray block: exercises padding

    starts = np.stack(
        [
            rng.uniform(bbox[0], bbox[3], n),
            rng.uniform(bbox[1], bbox[4], n),
            np.full(n, bbox[2]),
        ],
        axis=1,
    ).astype(np.float32)
    ends = np.stack(
        [
            rng.uniform(bbox[0], bbox[3], n),
            rng.uniform(bbox[1], bbox[4], n),
            np.full(n, bbox[5]),
        ],
        axis=1,
    ).astype(np.float32)

    ref_vox, ref_cnt = voxel_traversal(
        jnp.asarray(bbox), jnp.asarray(starts), jnp.asarray(ends),
        grid_shape, M,
    )
    ref_flat = np.asarray(
        flatten_voxel_indices(ref_vox, grid_shape)
    )
    ref_cnt = np.asarray(ref_cnt)

    idx, cnt = voxel_traversal_flat_pallas(
        jnp.asarray(bbox), jnp.asarray(starts), jnp.asarray(ends),
        grid_shape, M, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(cnt), ref_cnt)
    np.testing.assert_array_equal(np.asarray(idx), ref_flat)


def test_pallas_handles_misses(rng):
    bbox = np.array([0, 0, 0, 4, 4, 4], dtype=np.float32)
    starts = np.tile(
        np.array([[-10.0, -10.0, -10.0]], dtype=np.float32), (8, 1)
    )
    ends = starts + 1.0
    idx, cnt = voxel_traversal_flat_pallas(
        jnp.asarray(bbox), jnp.asarray(starts), jnp.asarray(ends),
        (4, 4, 4), 8, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(cnt), 0)
    np.testing.assert_array_equal(np.asarray(idx), 0)


def test_pallas_negative_directions_and_diagonals(rng):
    """Rays entering from the max faces (negative steps) and near-diagonal
    rays must match the scan op exactly."""
    bbox = np.array([-2.0, -1.0, 0.5, 2.0, 3.0, 4.5], dtype=np.float32)
    grid_shape = (7, 11, 6)
    M = 40
    n = 160
    # endpoints on random opposite faces, both directions
    starts = np.stack(
        [
            rng.uniform(bbox[0], bbox[3], n),
            rng.uniform(bbox[1], bbox[4], n),
            np.where(rng.rand(n) < 0.5, bbox[2], bbox[5]),
        ],
        axis=1,
    ).astype(np.float32)
    ends = np.stack(
        [
            rng.uniform(bbox[0], bbox[3], n),
            rng.uniform(bbox[1], bbox[4], n),
            bbox[2] + bbox[5] - starts[:, 2],  # opposite z face
        ],
        axis=1,
    ).astype(np.float32)
    # sprinkle exact diagonals (tie-break stress)
    starts[:8] = [bbox[0], bbox[1], bbox[2]]
    ends[:8] = [bbox[3], bbox[4], bbox[5]]

    ref_vox, ref_cnt = voxel_traversal(
        jnp.asarray(bbox), jnp.asarray(starts), jnp.asarray(ends),
        grid_shape, M,
    )
    ref_flat = np.asarray(flatten_voxel_indices(ref_vox, grid_shape))
    idx, cnt = voxel_traversal_flat_pallas(
        jnp.asarray(bbox), jnp.asarray(starts), jnp.asarray(ends),
        grid_shape, M, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(cnt), np.asarray(ref_cnt))
    np.testing.assert_array_equal(np.asarray(idx), ref_flat)
