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


def _traversal_setup(rng, d=16, m=20, n=10):
    bbox = np.array([0, 0, 0, 8, 8, 4], dtype=np.float32)
    grid_shape = (16, 16, 8)
    starts = np.stack(
        [rng.uniform(0, 8, n), rng.uniform(0, 8, n), np.zeros(n)], 1
    ).astype(np.float32)
    ends = np.stack(
        [rng.uniform(0, 8, n), rng.uniform(0, 8, n), np.full(n, 4.0)], 1
    ).astype(np.float32)
    vox, counts = voxel_traversal(
        jnp.asarray(bbox), jnp.asarray(starts), jnp.asarray(ends),
        grid_shape, m,
    )
    S = rng.uniform(0.01, 1.0, size=(n, d)).astype(np.float32)
    S = S / S.sum(axis=1, keepdims=True)
    return bbox, grid_shape, starts, ends, np.asarray(vox), np.asarray(counts), S


def test_quadratic_matches_scipy_oracle(rng):
    """The spline-tensor evaluation equals scipy interp1d(kind="quadratic")
    per ray (reference planes_voxels_mapping.py:214-235)."""
    from scipy.interpolate import interp1d
    from raynet_tpu.ops.planes_voxels import get_planes_voxels_mapping

    d, m, n = 16, 20, 10
    bbox, grid_shape, starts, ends, vox, counts, S = _traversal_setup(
        rng, d, m, n
    )
    op = get_planes_voxels_mapping("quadratic")
    out = np.asarray(
        op(
            jnp.asarray(S), jnp.asarray(vox), jnp.asarray(counts),
            jnp.asarray(starts), jnp.asarray(ends), jnp.asarray(bbox),
            grid_shape, d,
        )
    )

    centers = np.asarray(voxel_centers(jnp.asarray(vox), bbox, grid_shape))
    t_points = np.linspace(0, 1, d)
    for r in range(n):
        c = counts[r]
        if c < 1:
            continue
        ray = ends[r] - starts[r]
        t = ((centers[r, :c] - starts[r]) @ ray) / (ray @ ray)
        t = np.clip(t, 1e-4, 1 - 1e-4)
        ref = interp1d(t_points, S[r], kind="quadratic")(t)
        ref = ref / ref.sum()
        np.testing.assert_allclose(out[r, :c], ref, rtol=2e-3, atol=2e-4)
        np.testing.assert_array_equal(out[r, c:], 0)


def test_kde_matches_numpy_oracle(rng):
    """Gaussian-KDE variant vs a direct transcription of the reference
    semantics (planes_voxels_mapping.py:238-281): squared world distances
    along the ray, gamma=10, UNclipped t."""
    from raynet_tpu.ops.planes_voxels import get_planes_voxels_mapping

    d, m, n = 16, 20, 10
    bbox, grid_shape, starts, ends, vox, counts, S = _traversal_setup(
        rng, d, m, n
    )
    op = get_planes_voxels_mapping("kde")
    out = np.asarray(
        op(
            jnp.asarray(S), jnp.asarray(vox), jnp.asarray(counts),
            jnp.asarray(starts), jnp.asarray(ends), jnp.asarray(bbox),
            grid_shape, d,
        )
    )

    centers = np.asarray(voxel_centers(jnp.asarray(vox), bbox, grid_shape))
    t_points = np.linspace(0, 1, d)
    for r in range(n):
        c = counts[r]
        if c < 1:
            continue
        ray = (ends[r] - starts[r]).astype(np.float64)
        ray_norm = ray @ ray
        t = ((centers[r, :c] - starts[r]) @ ray) / ray_norm  # no clipping
        dist = ((t_points.reshape(-1, 1) - t.reshape(1, -1)) ** 2) * ray_norm
        kernel = np.exp(-dist * 10.0)
        ref = (kernel * S[r].reshape(-1, 1)).sum(axis=0)
        ref = ref / ref.sum()
        np.testing.assert_allclose(out[r, :c], ref, rtol=1e-3, atol=1e-4)
        np.testing.assert_array_equal(out[r, c:], 0)


def test_mapping_factory_names():
    from raynet_tpu.ops.planes_voxels import get_planes_voxels_mapping
    import pytest

    for name in ("li", "li_2", "quadratic", "kde"):
        assert callable(get_planes_voxels_mapping(name))
    with pytest.raises(KeyError):
        get_planes_voxels_mapping("cubic")


def test_uniform_distribution_stays_uniformish(rng):
    d, m, n = 8, 6, 3
    S = np.full((n, d), 1.0 / d, dtype=np.float32)
    t = rng.rand(n, m).astype(np.float32)
    counts = np.full((n,), m, dtype=np.int32)
    out = np.asarray(
        depth_planes_to_voxels(jnp.asarray(S), jnp.asarray(t), jnp.asarray(counts), d)
    )
    np.testing.assert_allclose(out, 1.0 / m, rtol=1e-5)
