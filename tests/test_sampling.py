"""Sampling-scheme invariants (the reference's property tests,
tests/test_sampling_schemes.py): collinearity with the camera center,
reprojection onto the originating pixel, containment in the bbox — plus
agreement between the device op and the float64 host oracle.
"""
import numpy as np
import jax.numpy as jnp

from raynet_tpu.ops.geometry import host_rays_entry_exit, project_points
from raynet_tpu.ops.sampling import (
    sample_points_in_bbox,
    sample_points_in_range,
)


def make_camera(rng):
    """A synthetic pinhole camera at z=-20 looking straight at the origin
    with a narrow FOV, so every pixel's ray crosses the test bbox."""
    K = np.array([[500.0, 0, 32], [0, 500.0, 24], [0, 0, 1]])
    R = np.eye(3)
    center = np.array([0.0, 0.0, -20.0]) + rng.randn(3) * 0.1
    t = -R @ center.reshape(3, 1)
    P = K @ np.hstack([R, t])
    P_pinv = np.linalg.pinv(P)
    return P, P_pinv, center


def test_points_in_bbox_invariants(rng):
    P, P_pinv, center = make_camera(rng)
    H, W, D = 48, 64, 16
    bbox = np.array([-2, -2, -2, 2, 2, 2], dtype=np.float32)

    ray_idxs = rng.randint(0, H * W, size=(64,)).astype(np.int32)
    pts = np.asarray(
        sample_points_in_bbox(
            jnp.asarray(ray_idxs),
            jnp.asarray(P_pinv, dtype=jnp.float32),
            jnp.asarray(center, dtype=jnp.float32),
            jnp.asarray(bbox),
            H,
            D,
        )
    )
    assert pts.shape == (64, D, 3)

    # 1) containment (with slack for the f32 slab test)
    assert np.all(pts >= bbox[:3] - 1e-3)
    assert np.all(pts <= bbox[3:] + 1e-3)

    # 2) collinearity: all D points lie on the camera-center ray
    d0 = pts[:, -1] - pts[:, 0]
    dc = pts[:, 0] - center[None]
    cross = np.cross(d0, dc)
    assert np.abs(cross).max() < 1e-3

    # 3) reprojection: each point projects back onto its source pixel
    proj = np.asarray(
        project_points(
            jnp.asarray(P, dtype=jnp.float32)[None],
            jnp.asarray(pts.reshape(1, -1, 3)),
        )
    ).reshape(64, D, 2)
    x = (ray_idxs // H).astype(np.float64)
    y = (ray_idxs % H).astype(np.float64)
    np.testing.assert_allclose(
        proj[..., 0], np.broadcast_to(x[:, None], proj[..., 0].shape), atol=0.1
    )
    np.testing.assert_allclose(
        proj[..., 1], np.broadcast_to(y[:, None], proj[..., 1].shape), atol=0.1
    )


def test_device_matches_host_oracle(rng):
    P, P_pinv, center = make_camera(rng)
    H, W, D = 48, 64, 32
    bbox = np.array([-2, -2, -2, 2, 2, 2], dtype=np.float32)
    ray_idxs = rng.randint(0, H * W, size=(128,)).astype(np.int32)

    start, end = host_rays_entry_exit(ray_idxs, P_pinv, center, bbox, H)
    pts = np.asarray(
        sample_points_in_bbox(
            jnp.asarray(ray_idxs),
            jnp.asarray(P_pinv, dtype=jnp.float32),
            jnp.asarray(center, dtype=jnp.float32),
            jnp.asarray(bbox),
            H,
            D,
        )
    )
    np.testing.assert_allclose(pts[:, 0], start, atol=2e-3)
    np.testing.assert_allclose(pts[:, -1], end, atol=2e-3)


def test_sample_in_range_metric_depths(rng):
    P, P_pinv, center = make_camera(rng)
    H, D = 48, 8
    depth_range = np.array([5.0, 30.0], dtype=np.float32)
    ray_idxs = np.arange(16, dtype=np.int32)
    pts = np.asarray(
        sample_points_in_range(
            jnp.asarray(ray_idxs),
            jnp.asarray(P_pinv, dtype=jnp.float32),
            jnp.asarray(center, dtype=jnp.float32),
            jnp.asarray(depth_range),
            H,
            D,
        )
    )
    dists = np.linalg.norm(pts - center[None, None], axis=-1)
    expected = np.linspace(5.0, 30.0, D)
    np.testing.assert_allclose(
        dists, np.broadcast_to(expected[None], dists.shape), rtol=1e-4
    )


def test_projections_never_lower_to_dot():
    """Geometry projections must stay OFF the MXU: an f32 dot/einsum
    lowers at DEFAULT precision on TPU (operands truncated to bf16),
    which the w->0 dehomogenization amplifies to thousands of pixels
    near the epipole (round-3 regression: on-device agreement 1.0 ->
    0.066, invisible to CPU/interpret tests). Guard the lowering: no
    dot ops in the jaxpr/HLO of the projection helpers."""
    import jax

    from raynet_tpu.ops.geometry import (
        project_points,
        rays_from_pixel_idxs,
    )
    from raynet_tpu.ops.planes_voxels import project_voxels_to_rays

    P = jnp.zeros((5, 3, 4))
    pts = jnp.zeros((7, 3))
    txt = jax.jit(project_points).lower(P, pts).as_text()
    assert "dot_general" not in txt and " dot(" not in txt

    pp = jnp.zeros((4, 3))
    c = jnp.zeros((3,))
    idx = jnp.zeros((13,), jnp.int32)
    txt = jax.jit(rays_from_pixel_idxs, static_argnums=3).lower(
        idx, pp, c, 36
    ).as_text()
    assert "dot_general" not in txt and " dot(" not in txt

    centers = jnp.zeros((7, 4, 3))
    s = jnp.zeros((7, 3))
    e = jnp.ones((7, 3))
    txt = jax.jit(project_voxels_to_rays).lower(centers, s, e).as_text()
    assert "dot_general" not in txt and " dot(" not in txt
