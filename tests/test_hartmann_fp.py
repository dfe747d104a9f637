"""Hartmann forward pass (vectorized patch-quintuple scoring) smoke test."""
import numpy as np

from raynet_tpu.common.scene import RestrepoScene
from raynet_tpu.common.generation_parameters import GenerationParameters
from raynet_tpu.common.sampling_schemes import get_sampling_scheme
from raynet_tpu.inference import get_forward_pass_factory
from raynet_tpu.models.feature_extractor import HartmannModel
from conftest import MOCK_H as H, MOCK_W as W


def test_hartmann_forward_pass(mock_scene_dir):
    scene = RestrepoScene(str(mock_scene_dir))
    gp = GenerationParameters(
        depth_planes=4,
        neighbors=4,
        patch_shape=(32, 32, 3),
        padding=11,
    )
    model = HartmannModel(patch_shape=(32, 32, 3))
    fp = get_forward_pass_factory("hartmann_fp")(
        model, gp, get_sampling_scheme("sample_in_bbox")(gp),
        scene.image_shape, rays_batch=4096,
    )
    dm = next(iter(fp.forward_pass(scene, (0, 1, 1))))
    assert dm.shape == (H, W)
    assert np.isfinite(dm).all()
    assert dm.min() >= 10.0 and dm.max() <= 30.0
