"""Image = pixel buffer (normalized to [0, 1]) + the camera that produced it.

Parity: raynet/common/image.py. Axis conventions: the x-axis runs along
image COLUMNS (width), the y-axis along ROWS (height); pixels are
homogeneous (3, 1) column vectors [x, y, 1]^T. ``rays()`` enumerates pixels
COLUMN-MAJOR (u outer, v inner) to match the framework-wide ray indexing.
"""
import numpy as np
import imageio.v2 as imageio

from .camera import Camera
from ..utils.geometry import project


class Image:
    def __init__(self, camera, image_data, normalize=True):
        self._camera = camera
        self._image = image_data
        if self._image.ndim == 2:
            self._image = self._image[:, :, np.newaxis]
        # Keep the raw uint8 alongside the normalized float view: the
        # feature-extraction path ships u8 to the device (4x fewer bytes
        # over the host link) and divides by 255 there in f32 — equal to
        # this host normalization within 1 f32 ulp (XLA may compile the
        # constant division as a reciprocal multiply).
        self._image_u8 = None
        if normalize:
            if self._image.dtype == np.uint8:
                self._image_u8 = self._image
            self._image = self._image.astype(np.float32) / np.float32(255.0)

    @property
    def image_u8(self):
        """Raw uint8 pixels when the source was 8-bit (else None)."""
        return self._image_u8

    @classmethod
    def from_file(cls, image_file, camera_poses):
        image = imageio.imread(image_file)
        camera = Camera(
            K=camera_poses["K"], R=camera_poses["R"], t=camera_poses["t"]
        )
        return cls(camera, image)

    @property
    def image(self):
        return self._image

    @property
    def camera(self):
        return self._camera

    @property
    def width(self):
        return self._image.shape[1]

    @property
    def height(self):
        return self._image.shape[0]

    @property
    def channels(self):
        return self._image.shape[2]

    def random_pixel(self, rng=np.random):
        return np.array(
            [[rng.randint(0, self.width), rng.randint(0, self.height), 1]]
        ).T

    def rgb2gray(self):
        return Image(
            self._camera,
            np.dot(self._image[..., :3], [0.299, 0.587, 0.114]),
            normalize=False,
        )

    def project(self, point):
        """Project 3D homogeneous point(s) to rounded integer pixels."""
        return np.round(project(self._camera.P, point)).astype(int)

    def patch_from_3d(self, point, patch_size, expand_patch=True):
        return self.patch(self.project(point), patch_size, expand_patch)

    def patch(self, patch_center, patch_size, expand_patch=True):
        """Image content around ``patch_center`` ((C+1, 1) pixel column).

        Out-of-bounds regions are zero-filled when ``expand_patch``;
        otherwise the whole patch is -1 (reference semantics,
        common/image.py:92-143).
        """
        pad_x = patch_size[1] // 2
        pad_y = patch_size[0] // 2
        min_x = int(patch_center[0, 0]) - pad_x
        max_x = int(patch_center[0, 0]) + pad_x + patch_size[1] % 2
        min_y = int(patch_center[1, 0]) - pad_y
        max_y = int(patch_center[1, 0]) + pad_y + patch_size[0] % 2

        patch = np.zeros(
            tuple(patch_size) + self._image.shape[2:], dtype=np.float32
        )
        h, w = self.height, self.width
        if min_x >= 0 and min_y >= 0 and max_x <= w and max_y <= h:
            patch[:, :] = self._image[min_y:max_y, min_x:max_x]
        elif expand_patch:
            p_min_x = min(w, max(0, min_x))
            p_max_x = max(0, min(w, max_x))
            p_min_y = min(h, max(0, min_y))
            p_max_y = max(0, min(h, max_y))
            s_min_x = min(patch_size[1], max(0, -min_x))
            s_max_x = max(0, min(patch_size[1], patch_size[1] + w - max_x))
            s_min_y = min(patch_size[0], max(0, -min_y))
            s_max_y = max(0, min(patch_size[0], patch_size[0] + h - max_y))
            patch[s_min_y:s_max_y, s_min_x:s_max_x] = self._image[
                p_min_y:p_max_y, p_min_x:p_max_x
            ]
        else:
            patch.fill(-1.0)
        return patch

    def patches_from_3d_points(self, points, patch_size):
        """Patches around the projections of (N, 4) homogeneous points, or
        None if ANY projected patch falls outside the image (reference
        semantics, common/image.py:145-208)."""
        patch_centers = np.round(project(self._camera.P, points.T)).astype(int)
        return self.patches(patch_centers, patch_size)

    def patches(self, patch_centers, patch_size):
        assert patch_centers.shape[0] > patch_centers.shape[1]
        pad_x = patch_size[1] // 2
        pad_y = patch_size[0] // 2
        min_x = patch_centers[:, 0] - pad_x
        max_x = patch_centers[:, 0] + pad_x + patch_size[1] % 2
        min_y = patch_centers[:, 1] - pad_y
        max_y = patch_centers[:, 1] + pad_y + patch_size[0] % 2

        h, w = self.height, self.width
        inside = (min_x >= 0) & (min_y >= 0) & (max_x <= w) & (max_y <= h)
        if not np.all(inside):
            return None

        # Vectorized gather: build (ph, pw) index grids per patch.
        n = patch_centers.shape[0]
        ph, pw = patch_size[0], patch_size[1]
        ys = min_y[:, None, None] + np.arange(ph)[None, :, None]
        xs = min_x[:, None, None] + np.arange(pw)[None, None, :]
        return self._image[ys, xs].astype(np.float32).reshape(
            (n, ph, pw) + self._image.shape[2:]
        )

    def ray(self, pixel):
        """The (camera_center, back-projected point) pair of a pixel.

        Both returned as homogeneous (4, 1) columns; the back-projection is
        ``pinv(P) @ pixel`` dehomogenized.
        """
        if len(pixel) == 2:
            pixel = np.vstack((pixel, [1]))
        ray = project(self._camera.P_pinv, pixel.astype(np.float32))
        assert ray.shape == (4, 1)
        return self._camera.center, ray

    def rays(self):
        """Back-projections of ALL pixels, column-major (u outer, v inner).

        Returns (camera_center (4,1), rays (N, 4)) with N = W*H.
        """
        u = np.repeat(np.arange(self.width), self.height)
        v = np.tile(np.arange(self.height), self.width)
        pixels = np.stack([u, v, np.ones_like(u)]).astype(np.float64)
        rays = project(self._camera.P_pinv, pixels)
        return self._camera.center, rays
