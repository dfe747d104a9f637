"""Depth-plane -> voxel interpolation, validated against the reference-style
li_2 oracle (per-voxel argsort over all D distances) — equivalence holds
because the depth hypotheses are uniform in t.
"""
import numpy as np
import jax.numpy as jnp

from raynet_tpu.ops.planes_voxels import (
    depth_planes_to_voxels,
    planes_to_voxels_mapping,
    project_voxels_to_rays,
)
from raynet_tpu.ops.ray_marching import voxel_traversal, voxel_centers
from oracles import depth_to_voxels_li2_oracle


def test_projection_parameters(rng):
    n, m = 4, 5
    ray_start = rng.randn(n, 3).astype(np.float32)
    ray_end = ray_start + rng.rand(n, 3).astype(np.float32) + 1.0
    # voxel centers ON the segment at known t
    ts = rng.rand(n, m).astype(np.float32)
    centers = ray_start[:, None] + ts[..., None] * (ray_end - ray_start)[:, None]
    t = np.asarray(
        project_voxels_to_rays(
            jnp.asarray(centers), jnp.asarray(ray_start), jnp.asarray(ray_end),
            clip=False,
        )
    )
    np.testing.assert_allclose(t, ts, rtol=1e-4, atol=1e-5)


def test_matches_li2_oracle(rng):
    d, m = 32, 20
    n = 10
    bbox = np.array([0, 0, 0, 8, 8, 4], dtype=np.float32)
    grid_shape = (16, 16, 8)

    starts = np.stack(
        [rng.uniform(0, 8, n), rng.uniform(0, 8, n), np.zeros(n)], 1
    ).astype(np.float32)
    ends = np.stack(
        [rng.uniform(0, 8, n), rng.uniform(0, 8, n), np.full(n, 4.0)], 1
    ).astype(np.float32)

    vox, counts = voxel_traversal(
        jnp.asarray(bbox), jnp.asarray(starts), jnp.asarray(ends), grid_shape, m
    )
    vox, counts = np.asarray(vox), np.asarray(counts)

    S = rng.uniform(0.01, 1.0, size=(n, d)).astype(np.float32)
    S = S / S.sum(axis=1, keepdims=True)

    out = np.asarray(
        planes_to_voxels_mapping(
            jnp.asarray(S),
            jnp.asarray(vox),
            jnp.asarray(counts),
            jnp.asarray(starts),
            jnp.asarray(ends),
            jnp.asarray(bbox),
            grid_shape,
            d,
        )
    )

    centers = np.asarray(voxel_centers(jnp.asarray(vox), bbox, grid_shape))
    points = np.stack(
        [
            starts[:, None, :] + f * (ends - starts)[:, None, :]
            for f in np.linspace(0, 1, d)
        ],
        axis=1,
    ).reshape(n, d, 3)

    for r in range(n):
        c = counts[r]
        if c < 2:
            continue
        ref = depth_to_voxels_li2_oracle(
            centers[r, :c].T.astype(np.float64),
            points[r].T.astype(np.float64),
            S[r].astype(np.float64),
        )
        np.testing.assert_allclose(out[r, :c], ref, rtol=5e-4, atol=5e-5)
        # padding stays zero, valid region sums to 1
        np.testing.assert_array_equal(out[r, c:], 0)
        np.testing.assert_allclose(out[r].sum(), 1.0, rtol=1e-5)


def test_uniform_distribution_stays_uniformish(rng):
    d, m, n = 8, 6, 3
    S = np.full((n, d), 1.0 / d, dtype=np.float32)
    t = rng.rand(n, m).astype(np.float32)
    counts = np.full((n,), m, dtype=np.int32)
    out = np.asarray(
        depth_planes_to_voxels(jnp.asarray(S), jnp.asarray(t), jnp.asarray(counts), d)
    )
    np.testing.assert_allclose(out, 1.0 / m, rtol=1e-5)
