"""Point clouds from depth maps: backprojection, consistency filtering,
PLY export, kNN indexing.

Parity: raynet/pointcloud.py (points are (3, N) column-major; PLY exports
are binary with a byte-order header; consistency keeps points whose maximum
reprojected-depth deviation over the n nearest views is below a threshold).
The KD-tree is scipy's cKDTree instead of scikit-learn's.
"""
import sys

import numpy as np
from scipy.spatial import cKDTree

from .utils.geometry import project


class Pointcloud:
    """A (D, N) collection of points, searchable and exportable."""

    def __init__(self, points):
        self._points = points
        self._index = None

    @property
    def points(self):
        return self._points

    def save_ply(self, file):
        n = self.points.shape[1]
        header = (
            "ply\nformat binary_%s_endian 1.0\ncomment raynet_tpu"
            " pointcloud\nelement vertex %d\nproperty float x\n"
            "property float y\nproperty float z\nend_header\n"
        ) % (sys.byteorder, n)
        with open(file, "wb") as f:
            f.write(header.encode("ascii"))
            self.points.T.astype(np.float32).tofile(f)

    def save_colored_ply(self, file, intensities, colormap="jet"):
        from matplotlib import colormaps

        cmap = colormaps[colormap]
        colors = cmap(np.asarray(intensities).ravel() / 2)[:, :3]
        colors = (colors * 255).astype(np.uint8)

        n = self.points.shape[1]
        header = (
            "ply\nformat binary_%s_endian 1.0\ncomment raynet_tpu"
            " pointcloud\nelement vertex %d\nproperty float x\n"
            "property float y\nproperty float z\nproperty uchar red\n"
            "property uchar green\nproperty uchar blue\nend_header\n"
        ) % (sys.byteorder, n)
        pts = self.points.T.astype(np.float32)
        with open(file, "wb") as f:
            f.write(header.encode("ascii"))
            # interleave xyz (12B) + rgb (3B) per vertex
            blob = bytearray()
            for p, c in zip(pts, colors):
                blob += p.tobytes() + c.tobytes()
            f.write(bytes(blob))

    def save(self, file):
        np.save(file, self.points)

    def filter(self, mask):
        self._points = mask.filter(self.points)
        self._index = None

    def index(self, leaf_size=40):
        if self._index is None:
            self._index = cKDTree(self.points.T, leafsize=leaf_size)

    def nearest_neighbors(self, X, k=1, return_distances=True):
        dists, idxs = self._index.query(X.T, k=k)
        if return_distances:
            return dists.reshape(-1, 1), idxs.reshape(-1, 1)
        return idxs.reshape(-1, 1)


class PointcloudFromDepthMaps(Pointcloud):
    """Backproject per-view depth maps along normalized rays.

    Pixels near the image borders (default 40 px) and pixels with zero
    ground-truth depth are dropped (parity: pointcloud.py:76-159).
    """

    def __init__(self, scene, frame_idxs, depthmaps, borders=40):
        super().__init__(None)
        self._scene = scene
        self._frame_idxs = frame_idxs
        self._depthmaps = depthmaps
        self._borders = borders

    def _remove_unwanted_points(self, G, D, R):
        h, w = G.shape
        idxs = np.arange(h * w).reshape(w, h).T
        bh = slice(self._borders, h - self._borders)
        bw = slice(self._borders, w - self._borders)

        G = G[bh, bw]
        D = D[bh, bw]
        idxs = idxs[bh, bw]

        gmask = G != 0
        return D[gmask].reshape(1, -1), R[:, idxs[gmask].ravel()]

    def _generate_points_per_image(self, frame, predicted_depth_file):
        image = self._scene.get_image(frame)
        depth = np.load(predicted_depth_file)
        if np.isnan(depth).any():
            depth[np.isnan(depth)] = depth[~np.isnan(depth)].min()

        camera_center, rays = image.rays()
        depth, rays = self._remove_unwanted_points(
            self._scene.get_depth_map(frame), depth, rays.T
        )
        directions = rays - camera_center
        norms = np.sqrt((directions ** 2).sum(axis=0, keepdims=True))
        return camera_center + depth * directions / norms

    @property
    def points(self):
        if self._points is None:
            pts = np.hstack(
                [
                    self._generate_points_per_image(i, d)
                    for i, d in zip(self._frame_idxs, self._depthmaps)
                ]
            )
            self._points = pts[:-1, :]  # drop the homogeneous row
        return self._points


class PointcloudFromDepthMapsWithConsistency(PointcloudFromDepthMaps):
    """Keep only points whose reprojection into the n nearest views agrees
    with those views' predicted depths within a threshold.
    """

    def __init__(
        self,
        scene,
        frame_idxs,
        depthmaps,
        borders=40,
        consistency_threshold=0.75,
        n_neighbors=5,
    ):
        super().__init__(scene, frame_idxs, depthmaps, borders)
        self._consistency_threshold = consistency_threshold
        self._n_neighbors = n_neighbors
        self._camera_neighbors = None
        self._frame_idxs_map = {f: i for i, f in enumerate(frame_idxs)}

    def _neighbor_frames(self, frame):
        if self._camera_neighbors is None:
            a = np.hstack(
                [
                    self._scene.get_image(i).camera.center
                    for i in self._frame_idxs
                ]
            )
            d = 2 * (a * a).sum(axis=0) - 2 * a.T.dot(a)
            self._camera_neighbors = d.argsort()[:, 1 : self._n_neighbors + 1]
        return [
            (self._frame_idxs[i], self._depthmaps[i])
            for i in self._camera_neighbors[self._frame_idxs_map[frame]]
        ]

    def _generate_points_per_image(self, frame, predicted_depth_file):
        pts = super()._generate_points_per_image(frame, predicted_depth_file)

        tau = None
        for i, d in self._neighbor_frames(frame):
            image = self._scene.get_image(i)
            pixels = project(image.camera.P, pts).T
            x = np.round(pixels[0]).astype(np.int32)
            y = np.round(pixels[1]).astype(np.int32)
            valid = (
                (0 <= x) & (x < image.width) & (0 <= y) & (y < image.height)
            )
            x[~valid] = 0
            y[~valid] = 0
            predicted = np.load(d)[y, x]
            depths = np.sqrt(((pts - image.camera.center) ** 2).sum(axis=0))

            dev = np.abs(predicted - depths)
            tau = dev if tau is None else np.maximum(dev, tau)
            tau[~valid] = float("inf")

        return pts[:, tau < self._consistency_threshold]


def get_pointcloud(scene, frame_idxs, depthmaps, with_consistency, **kwargs):
    if with_consistency:
        return PointcloudFromDepthMapsWithConsistency(
            scene,
            frame_idxs,
            depthmaps,
            kwargs["borders"],
            kwargs["consistency_threshold"],
            kwargs["n_neighbors"],
        )
    return PointcloudFromDepthMaps(
        scene, frame_idxs, depthmaps, kwargs["borders"]
    )
