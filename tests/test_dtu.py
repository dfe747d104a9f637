"""DTUScene / DTUDataset on a synthesized DTU-layout dataset: calibration
decomposition, bbox from .mat, GT depth as ray distances, observation mask,
STL point cloud, and a forward-pass smoke.
"""
import os

import numpy as np
import pytest
import imageio.v2 as imageio
from scipy.io import savemat

from raynet_tpu.common.dataset import DTUDataset
from conftest import _make_ring_camera

H, W = 32, 40
SCAN = 1


@pytest.fixture(scope="module")
def dtu_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dtu")
    rect = root / "Rectified" / ("scan%03d" % SCAN)
    cal = root / "SampleSet" / "MVS_Data" / "Calibration" / "cal18"
    obs = root / "SampleSet" / "MVS_Data" / "ObsMask"
    depth = root / "Depth" / ("scan%03d" % SCAN)
    stl = root / "Points" / "stl"
    for d in (rect, cal, obs, depth, stl):
        d.mkdir(parents=True)

    rng = np.random.RandomState(11)
    n_frames = 5
    K, _, _ = _make_ring_camera(0.0, H, W)
    np.savetxt(cal / "intrinsic.txt", K, fmt="%.9g", delimiter=" ")

    for i in range(1, n_frames + 1):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        imageio.imwrite(rect / ("rect_%03d_max.png" % (i,)), img)

        _, R, t = _make_ring_camera((i - n_frames / 2) * 0.05, H, W)
        P = K @ np.hstack([R, t])
        # cal18 pos files carry 4 rows; the 4th is ignored
        rows = np.vstack([P, np.zeros((1, 4))])
        np.savetxt(cal / ("pos_%03d.txt" % (i,)), rows, fmt="%.9g",
                   delimiter=" ")

        # GT z-depth: plane z=0 is ~20 in front of each ring camera; the
        # z-depth of that plane in camera coords varies per pixel — use a
        # constant 20 plus noise-free structure for the roundtrip test.
        gt = np.full((H, W), 20.0, dtype=np.float32)
        gt[:2, :] = 0.0  # some invalid pixels
        np.save(depth / ("depth_%03d.npy" % (i,)), gt)

    mask = np.ones((8, 8, 8), dtype=np.uint8)
    savemat(
        obs / ("ObsMask%d_10.mat" % (SCAN,)),
        {"BB": np.array([[-3, -3, -3], [3, 3, 3]], dtype=np.float64),
         "ObsMask": mask},
    )

    # binary PLY "stl" point cloud
    pts = rng.rand(100, 3).astype(np.float32)
    header = (
        "ply\nformat binary_little_endian 1.0\nelement vertex 100\n"
        "property float x\nproperty float y\nproperty float z\nend_header\n"
    )
    with open(stl / ("stl%03d_total.ply" % (SCAN,)), "wb") as f:
        f.write(header.encode("ascii"))
        pts.tofile(f)
    return root


def test_dtu_scene_parsing(dtu_root):
    ds = DTUDataset(str(dtu_root), illumination="max")
    scene = ds.get_scene(SCAN)
    assert scene.n_images == 5
    assert scene.image_shape == (H, W)
    np.testing.assert_array_equal(
        scene.bbox, np.array([[-3, -3, -3, 3, 3, 3]], dtype=np.float32)
    )
    assert scene.observation_mask.shape == (8, 8, 8)

    im = scene.get_image(0)
    # K^-1 P decomposition must reproduce the ring-camera center (~20 away)
    np.testing.assert_allclose(
        np.linalg.norm(im.camera.center[:3]), 20.0, rtol=1e-3
    )


def test_dtu_depth_semantics(dtu_root):
    ds = DTUDataset(str(dtu_root), illumination="max")
    scene = ds.get_scene(SCAN)
    # zero z-depth pixels are rejected
    assert scene.get_depth_for_pixel(0, 0, 5) is None
    # a central pixel: ray distance >= z-depth (equal only on the axis)
    d = scene.get_depth_for_pixel(0, H // 2, W // 2)
    assert d is not None and 19.9 <= d <= 20.5

    dm = scene.get_depth_map(0)
    assert dm.shape == (H, W)
    assert np.all(dm[:2, :] == 0)
    center_ray_distance = dm[H // 2, W // 2]
    assert 19.9 <= center_ray_distance <= 20.5
    # ray distances grow away from the principal axis
    assert dm[H // 2, 2] > center_ray_distance


def test_dtu_pointcloud(dtu_root):
    ds = DTUDataset(str(dtu_root), illumination="max")
    scene = ds.get_scene(SCAN)
    pc = scene.get_pointcloud()
    assert pc.points.shape == (3, 100)


def test_dtu_forward_pass_smoke(dtu_root):
    from raynet_tpu.common.generation_parameters import GenerationParameters
    from raynet_tpu.common.sampling_schemes import get_sampling_scheme
    from raynet_tpu.inference import get_forward_pass_factory
    from raynet_tpu.models.feature_extractor import FeatureExtractor

    ds = DTUDataset(str(dtu_root), illumination="max")
    scene = ds.get_scene(SCAN)
    gp = GenerationParameters(
        depth_planes=8,
        grid_shape=np.array([8, 8, 8], dtype=np.int32),
        max_number_of_marched_voxels=16,
        padding=11,
        gamma_mrf=0.05,
    )
    model = FeatureExtractor("simple_cnn")
    fp = get_forward_pass_factory("multi_view_cnn")(
        model, gp, get_sampling_scheme("sample_in_bbox")(gp),
        scene.image_shape, H * W,
    )
    maps = list(fp.forward_pass(scene, (0, 1, 1)))
    assert maps[0].shape == (H, W)
    assert np.isfinite(maps[0]).all()
