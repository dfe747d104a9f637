"""Standalone voxel-space depth-map export."""
import numpy as np

from raynet_tpu.common.scene import RestrepoScene
from raynet_tpu.ops.mrf_utils import export_depth_map_from_voxel_indices
from conftest import MOCK_H as H, MOCK_W as W


def test_export_depth_map_from_voxel_indices(mock_scene_dir, rng):
    scene = RestrepoScene(str(mock_scene_dir))
    grid_shape = (8, 8, 8)
    n, m = 16, 5
    S = rng.rand(n, m).astype(np.float32)
    vox = rng.randint(0, 8, (n, m, 3)).astype(np.int32)
    ray_idxs = rng.choice(H * W, size=n, replace=False).astype(np.int32)

    D = export_depth_map_from_voxel_indices(
        scene, 0, S, vox, ray_idxs, grid_shape
    )
    assert D.shape == (H, W)
    # exactly n pixels are set, each to the distance of its argmax voxel
    assert (D > 0).sum() == n
    r = ray_idxs[0]
    x, y = r // H, r % H
    best = vox[0, S[0].argmax()]
    center = scene.voxel_grid(grid_shape)[:, best[0], best[1], best[2]]
    cam = scene.get_image(0).camera.center[:3, 0]
    np.testing.assert_allclose(
        D[y, x], np.linalg.norm(center - cam), rtol=1e-5
    )
