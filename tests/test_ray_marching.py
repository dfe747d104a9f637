"""Voxel traversal: exact visited-voxel sequences on hand-built rays (the
reference's 2D-trick worlds, tests/test_ray_marching.py) plus fuzzing against
the sequential numpy oracle.
"""
import numpy as np
import jax.numpy as jnp

from raynet_tpu.ops.ray_marching import (
    voxel_traversal,
    flatten_voxel_indices,
    voxel_centers,
)
from oracles import voxel_traversal_oracle


def run_single(bbox, grid_shape, start, end, M=64):
    vox, cnt = voxel_traversal(
        jnp.asarray(bbox, dtype=jnp.float32),
        jnp.asarray([start], dtype=jnp.float32),
        jnp.asarray([end], dtype=jnp.float32),
        tuple(grid_shape),
        M,
    )
    return np.asarray(vox[0]), int(cnt[0])


def test_straight_x_ray():
    bbox = [0, 0, 0, 4, 4, 1]
    vox, cnt = run_single(bbox, (4, 4, 1), [0.0, 2.5, 0.5], [4.0, 2.5, 0.5])
    assert cnt == 4
    np.testing.assert_array_equal(vox[:4, 0], [0, 1, 2, 3])
    np.testing.assert_array_equal(vox[:4, 1], [2, 2, 2, 2])


def test_diagonal_ray():
    bbox = [0, 0, 0, 2, 2, 1]
    vox, cnt = run_single(bbox, (2, 2, 1), [0.0, 0.0, 0.5], [2.0, 2.0, 0.5])
    # Diagonal with the eps nudge visits 2 or 3 voxels starting at (0,0) and
    # ending at (1,1); verify against the oracle for exactness.
    ref, ref_cnt = voxel_traversal_oracle(
        bbox, (2, 2, 1), [0.0, 0.0, 0.5], [2.0, 2.0, 0.5], 64
    )
    assert cnt == ref_cnt
    np.testing.assert_array_equal(vox[:cnt], ref[:ref_cnt])


def test_reverse_direction():
    bbox = [0, 0, 0, 4, 4, 1]
    vox, cnt = run_single(bbox, (4, 4, 1), [4.0, 1.5, 0.5], [0.0, 1.5, 0.5])
    assert cnt == 4
    np.testing.assert_array_equal(vox[:4, 0], [3, 2, 1, 0])


def test_ray_outside_grid_returns_zero():
    bbox = [0, 0, 0, 4, 4, 1]
    vox, cnt = run_single(bbox, (4, 4, 1), [-10, -10, 5.0], [-9, -9, 6.0])
    assert cnt == 0
    np.testing.assert_array_equal(vox, 0)


def test_max_voxels_truncation():
    bbox = [0, 0, 0, 16, 1, 1]
    vox, cnt = run_single(bbox, (16, 1, 1), [0, 0.5, 0.5], [16, 0.5, 0.5], M=5)
    assert cnt == 5
    np.testing.assert_array_equal(vox[:5, 0], [0, 1, 2, 3, 4])


def test_fuzz_against_oracle(rng):
    bbox = np.array([-1.0, -2.0, 0.0, 3.0, 2.0, 1.5], dtype=np.float32)
    grid_shape = (13, 9, 5)
    M = 64
    n = 128
    # Random segments crossing the box: sample endpoints on opposite faces.
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

    vox, cnt = voxel_traversal(
        jnp.asarray(bbox), jnp.asarray(starts), jnp.asarray(ends), grid_shape, M
    )
    vox, cnt = np.asarray(vox), np.asarray(cnt)
    for i in range(n):
        ref, ref_cnt = voxel_traversal_oracle(
            bbox, grid_shape, starts[i], ends[i], M
        )
        assert cnt[i] == ref_cnt, "ray %d count %d != oracle %d" % (
            i,
            cnt[i],
            ref_cnt,
        )
        np.testing.assert_array_equal(vox[i, : cnt[i]], ref[:ref_cnt])


def test_flatten_and_centers_roundtrip():
    grid_shape = (4, 5, 6)
    idx = np.stack(
        np.meshgrid(*[np.arange(g) for g in grid_shape], indexing="ij"), -1
    ).reshape(-1, 3)
    flat = np.asarray(
        flatten_voxel_indices(jnp.asarray(idx)[None], grid_shape)
    )[0]
    np.testing.assert_array_equal(flat, np.arange(4 * 5 * 6))

    bbox = np.array([0, 0, 0, 4, 5, 6], dtype=np.float32)
    centers = np.asarray(voxel_centers(jnp.asarray(idx), bbox, grid_shape))
    np.testing.assert_allclose(centers, idx + 0.5, rtol=1e-6)


def test_traversal_performance_bound():
    """Parity with the reference's smoke bound (1000 rays through a 64x64x15
    grid in < 1 s, tests/test_ray_marching.py:79-90) — here batched.
    """
    import time

    bbox = np.array([0, 0, 0, 64, 64, 15], dtype=np.float32)
    rng = np.random.RandomState(1)
    starts = rng.uniform(0, 1, (1000, 3)).astype(np.float32) * [64, 64, 0]
    ends = rng.uniform(0, 1, (1000, 3)).astype(np.float32) * [64, 64, 0] + [
        0,
        0,
        15,
    ]
    # warmup/compile
    voxel_traversal(jnp.asarray(bbox), jnp.asarray(starts), jnp.asarray(ends), (64, 64, 15), 256)[1].block_until_ready()
    t0 = time.time()
    voxel_traversal(
        jnp.asarray(bbox), jnp.asarray(starts), jnp.asarray(ends), (64, 64, 15), 256
    )[1].block_until_ready()
    assert time.time() - t0 < 1.0
