"""Plane-sweep similarity scorer: closed-form pair reduction vs the explicit
pair loop, feature-index semantics, and a constructed geometric sanity check.
"""
import numpy as np
import jax.numpy as jnp

from raynet_tpu.ops.similarities import (
    compute_similarities,
    compute_similarities_pairwise,
    pixel_to_feature_idx,
)


def test_pixel_to_feature_idx_semantics():
    padding, h, w = 11, 40, 60
    offset = padding - (padding - 1) // 2  # = 6
    px = jnp.asarray(
        [
            [10.4, 20.6],  # interior -> round + offset
            [-30.0, 5.0],  # x clamps to 0 -> both zeroed
            [5.0, -30.0],  # y clamps to 0 -> both zeroed
            [500.0, 5.0],  # x clamps to w
            [59.9, 39.9],  # near the max corner
        ]
    )
    out = np.asarray(pixel_to_feature_idx(px, padding, h, w))
    np.testing.assert_array_equal(out[0], [10 + offset, 21 + offset])
    np.testing.assert_array_equal(out[1], [0, 0])
    np.testing.assert_array_equal(out[2], [0, 0])
    np.testing.assert_array_equal(out[3], [w, 5 + offset])
    np.testing.assert_array_equal(out[4], [w, h])


def test_closed_form_equals_pairwise(rng):
    v, hf, wf, f = 5, 20, 24, 8
    padding = 3
    h, w = hf - padding - 1, wf - padding - 1
    features = rng.randn(v, hf, wf, f).astype(np.float32)
    # Simple "cameras": project onto xy with identity-ish P
    P = np.zeros((v, 3, 4), dtype=np.float32)
    for i in range(v):
        P[i, 0, 0] = 1.0
        P[i, 1, 1] = 1.0
        P[i, 2, 2] = 0.0
        P[i, 2, 3] = 1.0  # homogeneous w = 1
        P[i, 0, 3] = rng.randn() * 2
        P[i, 1, 3] = rng.randn() * 2
    points = rng.uniform(0, min(h, w) - 1, size=(16, 6, 3)).astype(np.float32)

    s_fast = np.asarray(
        compute_similarities(
            jnp.asarray(features), jnp.asarray(P), jnp.asarray(points),
            padding, h, w,
        )
    )
    s_pairs = np.asarray(
        compute_similarities_pairwise(
            jnp.asarray(features), jnp.asarray(P), jnp.asarray(points),
            padding, h, w,
        )
    )
    np.testing.assert_allclose(s_fast, s_pairs, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(s_fast.sum(-1), 1.0, rtol=1e-5)


def test_peak_at_consistent_depth(rng):
    """Construct feature maps so that exactly one depth hypothesis projects
    to matching high-similarity features in all views -> softmax must peak
    there.
    """
    v, f = 3, 4
    padding, h, w = 3, 16, 16
    hf, wf = h + padding + 1, w + padding + 1
    features = rng.randn(v, hf, wf, f).astype(np.float32) * 0.01

    P = np.zeros((v, 3, 4), dtype=np.float32)
    offsets = [0.0, 1.0, -1.0]
    for i in range(v):
        P[i, 0, 0] = 1.0
        P[i, 1, 1] = 1.0
        P[i, 2, 3] = 1.0
        P[i, 0, 3] = offsets[i]  # shift x per view

    # Depth hypotheses along z don't change projection (orthographic-ish);
    # vary x instead so each hypothesis hits a distinct pixel.
    d = 5
    points = np.zeros((1, d, 3), dtype=np.float32)
    points[0, :, 0] = np.arange(d) + 4  # x = 4..8
    points[0, :, 1] = 8.0

    # Make hypothesis k=2 (x=6) consistent: same strong feature vector at the
    # projected cell of every view.
    strong = rng.randn(f).astype(np.float32) * 5
    off = padding - (padding - 1) // 2
    for i in range(v):
        fx = int(round(6 + offsets[i])) + off
        fy = 8 + off
        features[i, fy, fx] = strong

    s = np.asarray(
        compute_similarities(
            jnp.asarray(features), jnp.asarray(P), jnp.asarray(points),
            padding, h, w,
        )
    )
    assert s[0].argmax() == 2
