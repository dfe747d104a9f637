"""Model shapes, receptive fields, and loss parity properties."""
import numpy as np
import jax
import jax.numpy as jnp

from raynet_tpu.models import (
    cnn_factory,
    cnn_output_padding,
    MultiViewSimilarityNet,
    loss_factory,
    emd,
    squared_emd,
)
from raynet_tpu.models.layers import LayerNormalization, masked_softmax


def test_simple_cnn_feature_shape():
    """Zero-padded (H+2p, W+2p) image -> (H+p+1, W+p+1, 32) feature map,
    the invariant the plane-sweep indexing relies on."""
    h, w, p = 24, 30, 11
    model = cnn_factory("simple_cnn")()
    x = jnp.zeros((1, h + 2 * p, w + 2 * p, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    f = model.apply(variables, x)
    assert f.shape == (1, h + p + 1, w + p + 1, 32)
    assert cnn_output_padding("simple_cnn") == 10


def test_dilated_cnn_receptive_field():
    p = 25
    model = cnn_factory("dilated_cnn_receptive_field_25")()
    x = jnp.zeros((1, p, p, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    f = model.apply(variables, x)
    assert f.shape == (1, 1, 1, 32)


def test_similarity_net_forward():
    b, d, n = 2, 4, 3
    patches = jnp.asarray(
        np.random.RandomState(0).rand(b, d, n, 11, 11, 3), dtype=jnp.float32
    )
    model = MultiViewSimilarityNet()
    variables = model.init(jax.random.PRNGKey(0), patches, patches)
    y = model.apply(variables, patches, patches)
    assert y.shape == (b, d)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-5)
    # identical streams with dot-product merge: scores symmetric, valid probs
    assert np.all(np.asarray(y) > 0)


def test_emd_properties(rng):
    y = rng.rand(8, 16).astype(np.float32)
    y /= y.sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(emd(y, y)), 0.0, atol=1e-7)
    assert np.all(np.asarray(squared_emd(y, np.roll(y, 1, axis=1))) > 0)
    # emd between shifted diracs == shift distance / D
    d = 16
    a = np.zeros((1, d), dtype=np.float32)
    b = np.zeros((1, d), dtype=np.float32)
    a[0, 3] = 1
    b[0, 7] = 1
    np.testing.assert_allclose(np.asarray(emd(a, b))[0], 4.0 / d, rtol=1e-6)
    assert loss_factory("emd") is emd
    assert loss_factory("anything-else") is emd


def test_layer_normalization_stats():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 5, 4) * 3 + 7)
    ln = LayerNormalization()
    variables = ln.init(jax.random.PRNGKey(0), x)
    y = np.asarray(ln.apply(variables, x))
    # with gamma=1, bias=0: per-sample mean ~0, std ~1
    np.testing.assert_allclose(y.reshape(2, -1).mean(1), 0.0, atol=1e-5)
    np.testing.assert_allclose(y.reshape(2, -1).std(1), 1.0, atol=2e-3)


def test_masked_softmax():
    x = jnp.asarray([[1.0, 2.0, 3.0, 50.0], [1.0, 1.0, 1.0, 1.0]])
    counts = jnp.asarray([3, 2])
    y = np.asarray(masked_softmax(x, counts))
    np.testing.assert_array_equal(y[0, 3:], 0)
    np.testing.assert_array_equal(y[1, 2:], 0)
    np.testing.assert_allclose(y.sum(-1), 1.0, rtol=1e-6)
    np.testing.assert_allclose(y[1, 0], 0.5, rtol=1e-6)


def test_uint8_feature_path_matches_f32():
    """uint8 images normalized ON DEVICE must match the host-normalized
    f32 path to within 1 ulp of input quantization (XLA compiles the
    constant /255 as a reciprocal multiply, so the normalized inputs may
    differ in the last bit; the u8 upload moves 4x fewer bytes over the
    host link — raynet_tpu.models.feature_extractor
    predict/zeropad_images)."""
    from raynet_tpu.common.camera import Camera
    from raynet_tpu.common.image import Image
    from raynet_tpu.models.feature_extractor import (
        FeatureExtractor, zeropad_images,
    )

    rng = np.random.RandomState(3)
    raw = (rng.rand(2, 12, 16, 3) * 255).astype(np.uint8)
    K = np.eye(3)
    K[0, 2], K[1, 2] = 8, 6
    cam = Camera(K=K, R=np.eye(3), t=np.zeros((3, 1)))
    imgs = [Image(cam, raw[i]) for i in range(2)]

    padded = zeropad_images(imgs, 4)
    assert padded.dtype == np.uint8  # u8 sources keep the u8 fast path

    fe = FeatureExtractor("simple_cnn", seed=0)
    feats_u8 = np.asarray(fe.predict(padded))
    f32 = np.zeros(padded.shape, np.float32)
    for i, im in enumerate(imgs):
        f32[i, 4:-4 or None, 4:-4 or None][: im.image.shape[0],
                                           : im.image.shape[1]] = im.image
    feats_f32 = np.asarray(fe.predict(f32))
    scale = float(np.abs(feats_f32).max())
    np.testing.assert_allclose(feats_u8, feats_f32, atol=1e-5 * scale)

    # float-sourced images keep the f32 stacking path
    imgs_f = [Image(cam, raw[i].astype(np.float64), normalize=False)
              for i in range(2)]
    assert zeropad_images(imgs_f, 4).dtype == np.float32
