"""Host-level sampling-scheme objects with the reference's factory API.

Parity: raynet/common/sampling_schemes.py — same scheme names and the same
three entry points (per-ray / all-rays / batched). Vectorized paths delegate
to the JAX ops in :mod:`raynet_tpu.ops.sampling`; scalar paths (used by the
sample generators during training-data creation) stay in float64 numpy.

Shapes mirror the reference: ``sample_points_across_ray`` returns (D, 4)
homogeneous points; ``sample_points_across_rays[_batched]`` returns
(4, N, D).
"""
import numpy as np
import jax.numpy as jnp

from ..utils.geometry import ray_aabbox_intersection, ray_ray_intersection
from ..ops import sampling as ops_sampling
from ..ops.ray_marching import voxel_traversal


def _homogeneous(points_xyz):
    return np.hstack(
        [points_xyz, np.ones((points_xyz.shape[0], 1), dtype=points_xyz.dtype)]
    )


class SamplingScheme:
    def __init__(self, generation_params):
        self.sampling_type = generation_params.sampling_type
        self.n_points = generation_params.depth_planes
        self._gp = generation_params

    def _get_ray_from_pixel(self, scene, i, y, x):
        pixel = np.array([[x, y, 1]]).T
        origin, destination = scene.get_image(i).ray(pixel)
        return origin, destination

    def _points_in_line(self, start, end, t):
        points = (start + t * (end - start)).T
        return points.astype(np.float32)

    def sample_points_across_ray(self, scene, i, y, x):
        raise NotImplementedError()

    def sample_points_across_rays(self, scene, i):
        raise NotImplementedError()

    def sample_points_across_rays_batched(self, scene, i, batch):
        raise NotImplementedError()


class SamplingInBboxScheme(SamplingScheme):
    """Uniform samples between the ray's bbox entry and exit."""

    def sample_points_across_ray(self, scene, i, y, x):
        origin, destination = self._get_ray_from_pixel(scene, i, y, x)
        bbox = scene.bbox
        t_near, t_far = ray_aabbox_intersection(
            origin[:3], destination[:3], bbox[0, :3], bbox[0, 3:]
        )
        if t_near is None or t_far is None:
            return None
        t = np.linspace(t_near, t_far, self.n_points, dtype=np.float32)
        return self._points_in_line(origin, destination, t)

    def _rays_to_points(self, camera_center, directions, bbox):
        """(4, N, D) points for explicit origin/directions (float64)."""
        n = directions.shape[1]
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (bbox[:3].reshape(3, 1) - camera_center[:3]) / directions[:3]
            t2 = (bbox[3:].reshape(3, 1) - camera_center[:3]) / directions[:3]
        t_near = np.minimum(t1, t2).max(axis=0)
        t_far = np.maximum(t1, t2).min(axis=0)
        t = np.linspace(t_near, t_far, self.n_points, axis=-1)  # (N, D)
        pts = camera_center[:, :, None] + directions[:, :, None] * t[None]
        return pts.astype(np.float32)  # (4, N, D); homogeneous row stays 1

    def sample_points_across_rays(self, scene, i):
        camera_center, rays = scene.get_image(i).rays()
        directions = rays.T - camera_center
        return self._rays_to_points(
            camera_center, directions, scene.bbox.reshape(-1)
        )

    def sample_points_across_rays_batched(self, scene, i, batch):
        camera_center, rays = scene.get_image(i).rays()
        directions = (rays.T - camera_center)[:, batch]
        return self._rays_to_points(
            camera_center, directions, scene.bbox.reshape(-1)
        )


class SamplingInRangeScheme(SamplingScheme):
    """Uniform metric depths on the normalized direction."""

    def __init__(self, generation_params):
        super().__init__(generation_params)
        self._range = generation_params.depth_range

    def sample_points_across_ray(self, scene, i, y, x):
        origin, destination = self._get_ray_from_pixel(scene, i, y, x)
        t = np.linspace(
            self._range[0], self._range[1], self.n_points, dtype=np.float32
        )
        d = destination - origin
        d = d / np.sqrt(np.sum(d ** 2))
        return (origin + t * d).T

    def _rays_to_points(self, camera_center, directions):
        t = np.linspace(self._range[0], self._range[1], self.n_points)
        pts = camera_center[:, :, None] + directions[:, :, None] * t[
            None, None, :
        ]
        return pts.astype(np.float32)

    def sample_points_across_rays(self, scene, i):
        camera_center, rays = scene.get_image(i).rays()
        directions = rays.T - camera_center
        directions = directions / np.sqrt((directions ** 2).sum(axis=0))
        return self._rays_to_points(camera_center, directions)

    def sample_points_across_rays_batched(self, scene, i, batch):
        camera_center, rays = scene.get_image(i).rays()
        directions = rays.T - camera_center
        directions = directions / np.sqrt((directions ** 2).sum(axis=0))
        return self._rays_to_points(camera_center, directions[:, batch])


class SamplingInDisparityScheme(SamplingScheme):
    """Uniform in the farthest neighbor's image plane, back-triangulated.

    Parity: raynet/common/sampling_schemes.py:240-297.
    """

    def sample_points_across_ray(self, scene, i, y, x):
        bbox = scene.bbox
        origin, destination = self._get_ray_from_pixel(scene, i, y, x)
        t_near, t_far = ray_aabbox_intersection(
            origin[:3], destination[:3], bbox[0, :3], bbox[0, 3:]
        )
        if t_near is None or t_far is None:
            return None

        direction = destination - origin
        p_near = (origin + t_near * direction).T
        p_far = (origin + t_far * direction).T

        images = scene.get_image_with_neighbors(i)
        far_view = images[-1]
        from ..utils.geometry import project

        pixel_near = project(far_view.camera.P, p_near.T)[:-1]
        pixel_far = project(far_view.camera.P, p_far.T)[:-1]

        t = np.linspace(0, 1, self.n_points, dtype=np.float32)
        pixels = (pixel_near + t * (pixel_far - pixel_near)).T
        pixels = np.hstack((pixels, np.ones((self.n_points, 1))))

        points = []
        for p in pixels:
            n_origin, n_destination = far_view.ray(p.reshape(-1, 1))
            n_direction = n_destination - n_origin
            point = ray_ray_intersection(
                origin[:-1], direction[:-1], n_origin[:-1], n_direction[:-1]
            )
            points.append(np.hstack((point[0], [1.0])))
        return np.array(points, dtype=np.float32)


class SamplingInVoxelSpaceScheme(SamplingScheme):
    """Points = centers of the voxels the ray marches through."""

    def __init__(self, generation_params):
        super().__init__(generation_params)
        self._grid_shape = generation_params.grid_shape
        self.n_points = generation_params.max_number_of_marched_voxels

    def sample_points_across_ray(self, scene, i, y, x):
        bbox = scene.bbox
        origin, destination = self._get_ray_from_pixel(scene, i, y, x)
        t_near, t_far = ray_aabbox_intersection(
            origin[:3], destination[:3], bbox[0, :3], bbox[0, 3:]
        )
        if t_near is None or t_far is None:
            return None

        direction = destination - origin
        p_near = (origin + t_near * direction)[:3].reshape(1, 3)
        p_far = (origin + t_far * direction)[:3].reshape(1, 3)

        vox, cnt = voxel_traversal(
            jnp.asarray(bbox.reshape(-1), dtype=jnp.float32),
            jnp.asarray(p_near, dtype=jnp.float32),
            jnp.asarray(p_far, dtype=jnp.float32),
            tuple(int(g) for g in self._grid_shape),
            self.n_points,
        )
        nr = int(cnt[0])
        idxs = np.asarray(vox[0][:nr])
        grid = scene.voxel_grid(self._grid_shape)
        points = grid[:, idxs[:, 0], idxs[:, 1], idxs[:, 2]].T
        return _homogeneous(points.astype(np.float32))


class DeviceSamplingInBboxScheme(SamplingInBboxScheme):
    """All-rays sampling evaluated on the accelerator (the reference's
    TF-compiled scheme, here the jitted JAX op)."""

    def sample_points_across_rays(self, scene, i):
        H, W = scene.image_shape
        image = scene.get_image(i)
        pts = ops_sampling.sample_points_in_bbox(
            jnp.arange(H * W, dtype=jnp.int32),
            jnp.asarray(image.camera.P_pinv, dtype=jnp.float32),
            jnp.asarray(image.camera.center[:3, 0], dtype=jnp.float32),
            jnp.asarray(scene.bbox.reshape(-1), dtype=jnp.float32),
            H,
            self.n_points,
        )
        return np.moveaxis(np.asarray(pts), -1, 0)  # (3, N, D)


class DeviceSamplingInRangeScheme(SamplingInRangeScheme):
    def sample_points_across_rays(self, scene, i):
        H, W = scene.image_shape
        image = scene.get_image(i)
        pts = ops_sampling.sample_points_in_range(
            jnp.arange(H * W, dtype=jnp.int32),
            jnp.asarray(image.camera.P_pinv, dtype=jnp.float32),
            jnp.asarray(image.camera.center[:3, 0], dtype=jnp.float32),
            jnp.asarray(self._range, dtype=jnp.float32),
            H,
            self.n_points,
        )
        return np.moveaxis(np.asarray(pts), -1, 0)


class DummySamplingScheme:
    def __init__(self, generation_params):
        self.sampling_type = generation_params.sampling_type


def get_sampling_scheme(name):
    """Same names as the reference factory
    (common/sampling_schemes.py:417-426); the tf_* aliases map onto the
    device-evaluated schemes."""
    return {
        "sample_in_bbox": SamplingInBboxScheme,
        "sample_in_disparity": SamplingInDisparityScheme,
        "sample_in_range": SamplingInRangeScheme,
        "sample_in_voxel_space": SamplingInVoxelSpaceScheme,
        "tf_sample_in_bbox": DeviceSamplingInBboxScheme,
        "tf_sample_in_range": DeviceSamplingInRangeScheme,
        "device_sample_in_bbox": DeviceSamplingInBboxScheme,
        "device_sample_in_range": DeviceSamplingInRangeScheme,
        "full_tf_sample_in_bbox": DummySamplingScheme,
        "full_tf_sample_in_range": DummySamplingScheme,
    }[name]
