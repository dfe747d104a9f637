"""Coverage for the remaining component paths: disparity/voxel-space
sampling, device-evaluated schemes, reducers, alternative CNNs, metrics with
filters, consistency point clouds, voting depth converter.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raynet_tpu.common.scene import RestrepoScene
from raynet_tpu.common.generation_parameters import GenerationParameters
from raynet_tpu.common.sampling_schemes import get_sampling_scheme
from conftest import MOCK_H as H, MOCK_W as W


@pytest.fixture(scope="module")
def scene(mock_scene_dir):
    return RestrepoScene(str(mock_scene_dir))


def gp(**kw):
    defaults = dict(
        depth_planes=8,
        neighbors=4,
        patch_shape=(11, 11, 3),
        grid_shape=np.array([16, 16, 16], dtype=np.int32),
        max_number_of_marched_voxels=48,
        padding=11,
        depth_range=(15.0, 25.0),
        sampling_type="sample_points_in_bbox",
    )
    defaults.update(kw)
    return GenerationParameters(**defaults)


def test_disparity_scheme(scene):
    scheme = get_sampling_scheme("sample_in_disparity")(gp())
    pts = scheme.sample_points_across_ray(scene, 0, H // 2, W // 2 + 3)
    assert pts.shape == (8, 4)
    # all points lie on the reference ray (collinear with camera center)
    im = scene.get_image(0)
    c = im.camera.center[:3, 0]
    d = pts[-1, :3] - pts[0, :3]
    for p in pts:
        cross = np.cross(p[:3] - c, d)
        assert np.linalg.norm(cross) / np.linalg.norm(d) < 2e-2


def test_voxel_space_scheme(scene):
    scheme = get_sampling_scheme("sample_in_voxel_space")(gp())
    pts = scheme.sample_points_across_ray(scene, 0, H // 2, W // 2)
    assert pts is not None and pts.shape[1] == 4
    assert len(pts) >= 2
    # points are voxel centers inside the bbox
    assert np.all(pts[:, :3] >= -3) and np.all(pts[:, :3] <= 3)


def test_device_scheme_matches_host(scene):
    dev = get_sampling_scheme("tf_sample_in_bbox")(gp())
    host = get_sampling_scheme("sample_in_bbox")(gp())
    pts_dev = dev.sample_points_across_rays(scene, 0)  # (3, N, D)
    pts_host = host.sample_points_across_rays(scene, 0)  # (4, N, D)
    assert pts_dev.shape == (3, H * W, 8)
    np.testing.assert_allclose(pts_dev, pts_host[:3], atol=5e-3)


def test_reducers():
    from raynet_tpu.models.cnn import Reducer

    x = jnp.asarray([[[1.0, 5.0, 3.0], [2.0, 2.0, 2.0]]])  # (1, 2, 3)
    np.testing.assert_allclose(np.asarray(Reducer("max")(x)), [[5.0, 2.0]])
    np.testing.assert_allclose(
        np.asarray(Reducer("average")(x)), [[3.0, 2.0]]
    )
    np.testing.assert_allclose(
        np.asarray(Reducer("topK", k=2)(x)), [[4.0, 2.0]]
    )


@pytest.mark.parametrize(
    "name,size,channels",
    [("simple_cnn_ln", 11, 32), ("dilated_cnn_receptive_field_25", 25, 32),
     ("dilated_cnn_receptive_field_25_with_tanh", 25, 32)],
)
def test_cnn_variants(name, size, channels):
    from raynet_tpu.models.cnn import cnn_factory

    model = cnn_factory(name)()
    x = jnp.zeros((1, size, size, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    f = model.apply(variables, x)
    assert f.shape == (1, 1, 1, channels)


def test_accuracy_completeness_with_filters(rng):
    from raynet_tpu.metrics import (
        Accuracy, Completeness, FiltersFactory, VoxelMask, ReduceDensity,
    )
    from raynet_tpu.pointcloud import Pointcloud

    gt_pts = rng.rand(3, 400).astype(np.float32)
    pred_pts = gt_pts + rng.randn(3, 400).astype(np.float32) * 0.01

    class FakeScene:
        def get_pointcloud(self):
            return Pointcloud(gt_pts)

    ff = FiltersFactory([])
    acc = Accuracy(ff, truncate=1.0)
    dists, _ = acc.compute(FakeScene(), [], [], Pointcloud(pred_pts.copy()))
    assert dists.mean() < 0.05
    comp = Completeness(ff, truncate=1.0)
    dists, _ = comp.compute(FakeScene(), [], [], Pointcloud(pred_pts.copy()))
    assert dists.mean() < 0.05

    # VoxelMask keeps only masked cells
    bbox = np.array([[0, 0, 0, 1, 1, 1]], dtype=np.float32)
    mask = np.zeros((4, 4, 4), dtype=np.uint8)
    mask[:2] = 1  # keep x < 0.5
    vm = VoxelMask(bbox, mask)
    kept = vm.filter(gt_pts)
    assert np.all(kept[0] < 0.5 + 1e-6)
    assert kept.shape[1] < gt_pts.shape[1]

    # ReduceDensity thins clustered points
    clustered = np.repeat(rng.rand(3, 10).astype(np.float32), 20, axis=1)
    rd = ReduceDensity(min_dist=0.05)
    thinned = rd.filter(clustered)
    assert thinned.shape[1] <= 15


def test_consistency_pointcloud(mock_scene_dir, tmp_path, scene):
    from raynet_tpu.pointcloud import (
        PointcloudFromDepthMaps, PointcloudFromDepthMapsWithConsistency,
    )

    # perfect depth maps: GT plane at z=0 -> fully consistent across views
    frame_idxs = [0, 1, 2]
    files = []
    for i in frame_idxs:
        dm = scene.get_depth_map(i)
        f = tmp_path / ("depth_%03d.npy" % i)
        np.save(f, dm)
        files.append(str(f))

    plain = PointcloudFromDepthMaps(scene, frame_idxs, files, borders=2)
    cons = PointcloudFromDepthMapsWithConsistency(
        scene, frame_idxs, files, borders=2,
        consistency_threshold=0.5, n_neighbors=2,
    )
    n_plain = plain.points.shape[1]
    n_cons = cons.points.shape[1]
    assert n_plain > 0
    # consistent geometry: the filter keeps the vast majority
    assert n_cons > 0.8 * n_plain
    # inconsistent maps get filtered out
    bad = [files[0]] + [
        str(tmp_path / ("bad_%d.npy" % i)) for i in frame_idxs[1:]
    ]
    for i, f in zip(frame_idxs[1:], bad[1:]):
        np.save(f, scene.get_depth_map(i) * 0.5)
    cons_bad = PointcloudFromDepthMapsWithConsistency(
        scene, frame_idxs, bad, borders=2,
        consistency_threshold=0.5, n_neighbors=2,
    )
    assert cons_bad.points.shape[1] < 0.2 * n_plain


def test_voting_depth_converter(scene):
    from raynet_tpu.inference.forward_pass import ForwardPass

    n, d = H * W, 4
    # distribution peaked on plane 2 everywhere
    S = np.zeros((n, d), dtype=np.float32)
    S[:, 2] = 1.0
    scheme = get_sampling_scheme("sample_in_bbox")(gp(depth_planes=4))
    points = scheme.sample_points_across_rays(scene, 0)  # (4, N, D)
    dm = ForwardPass.create_depth_map_from_distribution_with_voting(
        scene, 0, points, S
    )
    assert dm.shape == (H, W)
    # expectation == distance of plane-2 point
    c = scene.get_image(0).camera.center[:3, 0]
    expected = np.linalg.norm(points[:3, 0, 2] - c)
    np.testing.assert_allclose(dm[0, 0], expected, rtol=1e-4)


def test_argmax_depth_converter(scene):
    from raynet_tpu.inference.forward_pass import ForwardPass

    n, d = H * W, 4
    S = np.zeros((n, d), dtype=np.float32)
    S[:, 1] = 1.0
    dm = ForwardPass.create_depth_map_from_distribution(scene, 0, S)
    assert dm.shape == (H, W)
    assert np.all(dm > 0) and np.all(dm <= 800)
