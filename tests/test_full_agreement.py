"""Whole-pipeline depth-map agreement: the XLA multi_view_cnn forward pass
vs a literal-loop numpy re-derivation (the BASELINE north-star check is
>= 0.999 agreement against the slow reference; each stage already has an
oracle test — this composes them end to end).
"""
import numpy as np
import pytest

from raynet_tpu.common.scene import RestrepoScene
from raynet_tpu.common.generation_parameters import GenerationParameters
from raynet_tpu.common.sampling_schemes import get_sampling_scheme
from raynet_tpu.inference import get_forward_pass_factory
from raynet_tpu.models.feature_extractor import FeatureExtractor, zeropad_images
from conftest import MOCK_H as H, MOCK_W as W


def numpy_mvcnn_depth_map(scene, model, gp, ref_idx):
    """Literal-loop plane sweep: per ray, per depth, per view pair."""
    images = scene.get_image_with_neighbors(ref_idx, gp.neighbors)
    feats = np.asarray(
        model.predict(zeropad_images(images, gp.padding)), dtype=np.float64
    )
    P = [im.camera.P.astype(np.float64) for im in images]
    P_pinv = images[0].camera.P_pinv.astype(np.float64)
    center = images[0].camera.center[:3, 0].astype(np.float64)
    bbox = scene.bbox.reshape(-1).astype(np.float64)
    D = gp.depth_planes
    pad = gp.padding
    offset = pad - (pad - 1) // 2
    n_views = len(images)

    depth_map = np.zeros(H * W, dtype=np.float64)
    for r in range(H * W):
        x, y = r // H, r % H
        hom = P_pinv @ np.array([x, y, 1.0])
        direction = hom[:3] / hom[3] - center

        t1 = (bbox[:3] - center) / direction
        t2 = (bbox[3:] - center) / direction
        t_near = np.minimum(t1, t2).max()
        t_far = np.maximum(t1, t2).min()
        if abs(t_near) >= abs(t_far):
            t_near, t_far = t_far, t_near
        start = center + t_near * direction
        end = center + t_far * direction

        scores = np.zeros(D)
        for k in range(D):
            p = start + k * (end - start) / (D - 1)
            fs = []
            for v in range(n_views):
                hom2 = P[v] @ np.append(p, 1.0)
                px, py = hom2[0] / hom2[2], hom2[1] / hom2[2]
                fx = int(np.clip(round(px) + offset, 0, W))
                fy = int(np.clip(round(py) + offset, 0, H))
                if fx == 0 or fy == 0:
                    fx = fy = 0
                fs.append(feats[v, fy, fx])
            s = 0.0
            for i in range(n_views):
                for j in range(i + 1, n_views):
                    s += float(np.dot(fs[i], fs[j]))
            scores[k] = s / (n_views * (n_views - 1) / 2)
        best = int(np.argmax(scores))
        p = start + best * (end - start) / (D - 1)
        depth_map[r] = np.linalg.norm(p - center)
    return depth_map.reshape(W, H).T


def test_depth_map_agreement(mock_scene_dir):
    scene = RestrepoScene(str(mock_scene_dir))
    gp = GenerationParameters(
        depth_planes=8, neighbors=4, patch_shape=(11, 11, 3), padding=11
    )
    model = FeatureExtractor("simple_cnn", seed=0)
    fp = get_forward_pass_factory("multi_view_cnn")(
        model, gp, get_sampling_scheme("sample_in_bbox")(gp),
        scene.image_shape, H * W,
    )
    xla_map = next(iter(fp.forward_pass(scene, (0, 1, 1))))
    np_map = numpy_mvcnn_depth_map(scene, model, gp, 0)

    rel = np.abs(xla_map - np_map) / np.maximum(np_map, 1e-6)
    agreement = float((rel < 1e-3).mean())
    assert agreement >= 0.999, "agreement %.4f < 0.999" % (agreement,)
