"""Data-model layer: synthesized Restrepo-format scene on disk (the
reference's fixture-generating style, tests/test_scene.py), camera math,
patch gathers, octree GT depth, pointcloud roundtrip.
"""
import os

import numpy as np
import pytest

from raynet_tpu.common.camera import Camera
from raynet_tpu.common.dataset import RestrepoDataset
from raynet_tpu.common.scene import RestrepoScene
from raynet_tpu.common.generation_parameters import GenerationParameters
from raynet_tpu.common.sampling_schemes import get_sampling_scheme
from raynet_tpu.pointcloud import Pointcloud
from raynet_tpu.utils.oct_tree import OctTree
from raynet_tpu.utils.training_utils import (
    get_adjacent_frames_idxs,
    dirac_distribution,
)
from conftest import MOCK_H as H, MOCK_W as W


def test_scene_parsing(mock_scene_dir):
    scene = RestrepoScene(str(mock_scene_dir))
    assert scene.n_images == 6
    assert scene.image_shape == (H, W)
    np.testing.assert_array_equal(
        scene.bbox, np.array([[-3, -3, -3, 3, 3, 3]], dtype=np.float32)
    )
    im = scene.get_image(2)
    assert im.image.shape == (H, W, 3)
    assert im.image.max() <= 1.0

    # camera center should be ~20 from origin
    np.testing.assert_allclose(
        np.linalg.norm(im.camera.center[:3]), 20.0, rtol=1e-4
    )


def test_neighbor_selection(mock_scene_dir):
    scene = RestrepoScene(str(mock_scene_dir))
    images = scene.get_image_with_neighbors(2)
    assert len(images) == 5
    # borders
    np.testing.assert_array_equal(
        get_adjacent_frames_idxs(0, 6, 4, 0), [1, 2, 3, 4]
    )
    np.testing.assert_array_equal(
        get_adjacent_frames_idxs(5, 6, 4, 0), [1, 2, 3, 4]
    )
    np.testing.assert_array_equal(
        get_adjacent_frames_idxs(2, 6, 4, 0), [0, 1, 3, 4]
    )


def test_ray_reprojects_to_pixel(mock_scene_dir):
    scene = RestrepoScene(str(mock_scene_dir))
    im = scene.get_image(0)
    pixel = np.array([[13, 7, 1]]).T
    origin, dest = im.ray(pixel)
    reproj = im.project(dest)
    np.testing.assert_array_equal(reproj[:2], pixel[:2])


def test_gt_depth_via_octree(mock_scene_dir):
    scene = RestrepoScene(str(mock_scene_dir))
    # Slightly off-center pixel (the exact center ray hits the quad's shared
    # diagonal, which the strict MT barycentric test rejects by design).
    d = scene.get_depth_for_pixel(0, H // 2 + 2, W // 2 + 3)
    assert d is not None
    assert abs(d - 20.0) < 0.5


def test_patches_and_patch_equivalence(mock_scene_dir, rng):
    scene = RestrepoScene(str(mock_scene_dir))
    im = scene.get_image(1)
    points = np.array(
        [
            [0.2, 0.1, 0.0, 1.0],
            [-0.3, 0.4, 0.1, 1.0],
            [0.0, 0.0, 0.5, 1.0],
            [0.4, -0.2, -0.3, 1.0],
        ],
        dtype=np.float32,
    )
    patches = im.patches_from_3d_points(points, (5, 5))
    assert patches is not None and patches.shape == (4, 5, 5, 3)
    for k, p in enumerate(points):
        single = im.patch_from_3d(p.reshape(-1, 1), (5, 5))
        np.testing.assert_allclose(patches[k], single)

    # any out-of-image point -> None for the whole batch
    far = points.copy()
    far[0, :2] = 1000.0
    assert im.patches_from_3d_points(far, (5, 5)) is None


def test_dataset_wrapper(mock_scene_dir):
    dataset = RestrepoDataset(str(mock_scene_dir.parent))
    assert dataset.n_scenes == 1
    scene = dataset.get_scene(0)
    assert scene.n_images == 6
    with pytest.raises(ValueError):
        dataset.get_scene(12)


def test_sampling_scheme_on_scene(mock_scene_dir):
    scene = RestrepoScene(str(mock_scene_dir))
    gp = GenerationParameters(depth_planes=8, sampling_type="sample_points_in_bbox")
    scheme = get_sampling_scheme("sample_in_bbox")(gp)
    pts = scheme.sample_points_across_ray(scene, 0, H // 2, W // 2)
    assert pts.shape == (8, 4)
    assert np.all(pts[:, :3] >= -3.01) and np.all(pts[:, :3] <= 3.01)

    all_pts = scheme.sample_points_across_rays(scene, 0)
    assert all_pts.shape == (4, H * W, 8)

    # dirac target: the point nearest to a GT point on the ray gets mass 1
    target = pts[3].reshape(-1, 1)
    dist = dirac_distribution(target, pts)
    assert dist.argmax() == 3 and dist.sum() == 1.0


def test_pointcloud_ply_roundtrip(tmp_path, rng):
    from raynet_tpu.common.parse_input_data import (
        parse_stl_file_to_pointcloud,
    )

    pts = rng.rand(3, 50).astype(np.float32)
    pc = Pointcloud(pts)
    f = str(tmp_path / "cloud.ply")
    pc.save_ply(f)
    with open(f, "rb") as fh:
        loaded = parse_stl_file_to_pointcloud(f)
    np.testing.assert_allclose(loaded, pts.T, rtol=1e-6)

    pc.index()
    d, i = pc.nearest_neighbors(pts[:, :5])
    np.testing.assert_allclose(d, 0, atol=1e-6)
    np.testing.assert_array_equal(i.ravel(), np.arange(5))


def test_octree_matches_bruteforce(rng):
    tris = rng.rand(50, 3, 3).astype(np.float32) * 4 - 2
    tree = OctTree(tris, depth=3)
    from raynet_tpu.utils.geometry import ray_triangles_intersection_mt

    origin = np.array([[0.0, 0.0, -10.0, 1.0]]).T
    dest = np.array([[0.1, 0.05, 1.0, 1.0]]).T
    got = tree.ray_intersections(origin, dest)
    ref = ray_triangles_intersection_mt(
        origin[:3, 0], dest[:3, 0], tris[:, 0], tris[:, 1], tris[:, 2]
    )
    got_sorted = got[np.lexsort(got.T)] if len(got) else got
    ref_sorted = ref[np.lexsort(ref.T)] if len(ref) else ref
    np.testing.assert_allclose(got_sorted, ref_sorted, rtol=1e-5, atol=1e-6)
