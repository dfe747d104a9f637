"""BPInference facade: backend-equivalence (XLA vs numpy oracle) — the
reference's triple-backend test pattern — plus reconstruct_scene output.
"""
import numpy as np
import pytest

from raynet_tpu.ops.bp_inference import get_bp_backend
from raynet_tpu.ops.backends import (
    get_voxel_traversal_backend,
    get_depth_to_voxels_backend,
)


def _random_problem(rng, n=6, m=8, grid=(5, 4, 3)):
    idx = np.stack(
        [
            rng.randint(0, grid[0], (n, m)),
            rng.randint(0, grid[1], (n, m)),
            rng.randint(0, grid[2], (n, m)),
        ],
        axis=-1,
    ).astype(np.int32)
    counts = rng.randint(2, m + 1, (n,)).astype(np.int32)
    S = rng.uniform(0.01, 1.0, (n, m)).astype(np.float32)
    for r in range(n):
        S[r, counts[r]:] = 0
        idx[r, counts[r]:] = 0
    return S, idx, counts


def test_backends_agree(rng):
    S, idx, counts = _random_problem(rng)
    grid = (5, 4, 3)

    results = {}
    for name in ("numpy", "xla"):
        backend = get_bp_backend(name, gamma=0.05, bp_iterations=3)
        S_new, grid_acc, msgs = backend.mrf_inference(S, idx, counts, grid)
        results[name] = (S_new, grid_acc, msgs)

    np.testing.assert_allclose(
        results["numpy"][0], results["xla"][0], rtol=3e-4, atol=3e-4
    )
    np.testing.assert_allclose(
        results["numpy"][1], results["xla"][1], rtol=3e-4, atol=3e-4
    )
    # the historical backend names alias the XLA implementation
    assert type(get_bp_backend("cuda")) is type(get_bp_backend("xla"))
    assert type(get_bp_backend("tf")) is type(get_bp_backend("xla"))


def test_backend_facades(rng):
    trav = get_voxel_traversal_backend("cython")
    bbox = np.array([[0, 0, 0, 4, 4, 4]], dtype=np.float32)
    starts = np.array([[0.1, 2.0, 2.0]], dtype=np.float32)
    ends = np.array([[3.9, 2.0, 2.0]], dtype=np.float32)
    vox, cnt = trav(bbox, (4, 4, 4), starts, ends, 8)
    assert cnt[0] == 4

    d2v = get_depth_to_voxels_backend("numpy")
    S = np.full((1, 4), 0.25, dtype=np.float32)
    out = d2v(S, vox, cnt, starts, ends, bbox, (4, 4, 4), 4)
    np.testing.assert_allclose(out[0, : cnt[0]].sum(), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_reconstruct_scene(mock_scene_dir, tmp_path):
    from raynet_tpu.common.scene import RestrepoScene
    from raynet_tpu.common.generation_parameters import GenerationParameters
    from raynet_tpu.common.sampling_schemes import get_sampling_scheme
    from raynet_tpu.inference import get_forward_pass_factory
    from raynet_tpu.models.feature_extractor import FeatureExtractor
    from conftest import MOCK_H as H, MOCK_W as W

    scene = RestrepoScene(str(mock_scene_dir))
    gp = GenerationParameters(
        depth_planes=8,
        grid_shape=np.array([12, 12, 12], dtype=np.int32),
        max_number_of_marched_voxels=24,
        padding=11,
        gamma_mrf=0.05,
    )
    model = FeatureExtractor("simple_cnn")
    scheme = get_sampling_scheme("sample_in_bbox")(gp)
    fp = get_forward_pass_factory("raynet")(
        model, gp, scheme, scene.image_shape, H * W
    )
    backend = get_bp_backend("xla", gamma=0.05)
    paths = backend.reconstruct_scene(scene, fp, (0, 2, 1), str(tmp_path))
    assert len(paths) == 2
    for p in paths:
        dm = np.load(p)
        assert dm.shape == (H, W)
