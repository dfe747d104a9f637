"""Hartmann forward pass (vectorized patch-quintuple scoring) smoke test.

The orchestration is exercised with a lightweight scoring stub (the real
HartmannSimilarityNet is covered by test_hartmann.py — its 2048-channel head
is needlessly slow for a CPU plumbing test).
"""
import numpy as np

from raynet_tpu.common.scene import RestrepoScene
from raynet_tpu.common.generation_parameters import GenerationParameters
from raynet_tpu.common.sampling_schemes import get_sampling_scheme
from raynet_tpu.inference import get_forward_pass_factory
from conftest import MOCK_H as H, MOCK_W as W


class TinyQuintupleScorer:
    """predict(patches (B, V, ph, pw, C)) -> (B, 1, 1, 2) match scores:
    mean absolute deviation across views (lower = more consistent)."""

    cnn_name = "tiny"

    def predict(self, patches):
        p = np.asarray(patches, dtype=np.float32)
        dev = np.abs(p - p.mean(axis=1, keepdims=True)).mean(axis=(1, 2, 3, 4))
        return np.stack([-dev, dev], axis=-1).reshape(-1, 1, 1, 2)


def test_hartmann_forward_pass(mock_scene_dir):
    scene = RestrepoScene(str(mock_scene_dir))
    gp = GenerationParameters(
        depth_planes=4,
        neighbors=4,
        patch_shape=(11, 11, 3),
        padding=11,
    )
    fp = get_forward_pass_factory("hartmann_fp")(
        TinyQuintupleScorer(), gp, get_sampling_scheme("sample_in_bbox")(gp),
        scene.image_shape, rays_batch=4096,
    )
    dm = next(iter(fp.forward_pass(scene, (0, 1, 1))))
    assert dm.shape == (H, W)
    assert np.isfinite(dm).all()
    assert dm.min() >= 10.0 and dm.max() <= 30.0
