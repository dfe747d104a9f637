"""Keras .hdf5 -> Flax weight conversion (models/keras_import.py).

The reference publishes pretrained Keras 2 checkpoints and loads them
with name-matched group surgery (/root/reference/raynet/models.py:
294-341). These tests write tiny randomly-initialized .hdf5 files in
the Keras layouts in-test and verify the converted FeatureExtractor
reproduces a pure-numpy forward oracle of the Keras arithmetic.
"""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")


def _write_keras_simple_cnn(path, rng, layout="submodel", cin=3):
    """A 5x(conv3x3 + BN) simple_cnn checkpoint in a Keras 2 layout.

    layout:
      'flat'     — model.save_weights: layer groups at the root
      'model'    — model.save: nested under model_weights
      'submodel' — the CNN inside the siamese training net (published
                   RayNet checkpoints): model_weights/<name>/<layer>/...
    Returns the layer weights for the numpy oracle.
    """
    layers = []
    c_in = cin
    for i in range(5):
        k = rng.randn(3, 3, c_in, 32).astype(np.float32) * 0.3
        b = rng.randn(32).astype(np.float32) * 0.1
        gamma = rng.rand(32).astype(np.float32) + 0.5
        beta = rng.randn(32).astype(np.float32) * 0.1
        mean = rng.randn(32).astype(np.float32) * 0.1
        var = rng.rand(32).astype(np.float32) + 0.5
        layers.append((k, b, gamma, beta, mean, var))
        c_in = 32

    with h5py.File(path, "w") as f:
        if layout == "flat":
            root = f
        elif layout == "model":
            root = f.create_group("model_weights")
        else:
            root = f.create_group("model_weights").create_group(
                "sequential_1"
            )
        layer_names = []
        for i, (k, b, gamma, beta, mean, var) in enumerate(layers):
            conv = "conv2d_%d" % (i + 1,)
            bn = "batch_normalization_%d" % (i + 1,)
            g = root.create_group(conv)
            g.create_dataset("kernel:0", data=k)
            g.create_dataset("bias:0", data=b)
            g2 = root.create_group(bn)
            g2.create_dataset("gamma:0", data=gamma)
            g2.create_dataset("beta:0", data=beta)
            g2.create_dataset("moving_mean:0", data=mean)
            g2.create_dataset("moving_variance:0", data=var)
            layer_names += [conv, bn]
        if layout == "flat":
            # save_weights stamps the ordering attribute
            f.attrs["layer_names"] = np.array(
                [n.encode() for n in layer_names]
            )
    return layers


def _numpy_simple_cnn(x, layers, eps=1e-3):
    """Keras inference arithmetic: valid conv -> BN(moving stats) ->
    relu between layers, none after the last BN."""

    # float64 oracle: the framework's conv accumulates in f32 with
    # XLA's own summation order; 5 stacked layers amplify that to ~1e-3
    # relative on rare near-cancellation elements, while a WRONG weight
    # mapping (order/transpose) is O(1) relative everywhere.
    x = x.astype(np.float64)

    def conv_valid(x, k, b):
        kh, kw, cin, cout = k.shape
        n, h, w, _ = x.shape
        out = np.zeros((n, h - kh + 1, w - kw + 1, cout), np.float64)
        for dy in range(kh):
            for dx in range(kw):
                patch = x[:, dy : dy + out.shape[1], dx : dx + out.shape[2]]
                out += np.einsum("nhwc,cf->nhwf", patch, k[dy, dx])
        return out + b

    for i, (k, b, gamma, beta, mean, var) in enumerate(layers):
        x = conv_valid(x, k, b)
        x = gamma * (x - mean) / np.sqrt(var + eps) + beta
        if i < len(layers) - 1:
            x = np.maximum(x, 0.0)
    return x


@pytest.mark.parametrize("layout", ["flat", "model", "submodel"])
def test_hdf5_simple_cnn_matches_numpy_oracle(tmp_path, rng, layout):
    from raynet_tpu.models.feature_extractor import FeatureExtractor

    path = str(tmp_path / "weights.hdf5")
    layers = _write_keras_simple_cnn(path, rng, layout=layout)

    fe = FeatureExtractor("simple_cnn")
    fe.load_weights(path)

    x = rng.rand(2, 21, 23, 3).astype(np.float32)
    got = np.asarray(fe.predict(x))
    want = _numpy_simple_cnn(x, layers)
    assert got.shape == want.shape == (2, 11, 13, 32)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-3)


def test_hdf5_theano_ordered_kernels_transpose(tmp_path, rng):
    """(cout, cin, kh, kw) kernels in the file convert to HWIO."""
    from raynet_tpu.models.feature_extractor import FeatureExtractor

    path = str(tmp_path / "weights_th.hdf5")
    layers = _write_keras_simple_cnn(path, rng, layout="flat")
    # rewrite every kernel in OIHW order
    with h5py.File(path, "r+") as f:
        for i in range(5):
            g = f["conv2d_%d" % (i + 1,)]
            k = np.asarray(g["kernel:0"])
            del g["kernel:0"]
            g.create_dataset("kernel:0", data=k.transpose(3, 2, 0, 1))

    fe = FeatureExtractor("simple_cnn")
    fe.load_weights(path)
    x = rng.rand(1, 17, 17, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fe.predict(x)), _numpy_simple_cnn(x, layers),
        rtol=5e-3, atol=1e-3,
    )


def test_hdf5_shape_mismatch_raises(tmp_path, rng):
    from raynet_tpu.models.feature_extractor import FeatureExtractor

    path = str(tmp_path / "weights_bad.hdf5")
    _write_keras_simple_cnn(path, rng, layout="flat", cin=1)  # wrong cin
    fe = FeatureExtractor("simple_cnn")
    with pytest.raises(ValueError, match="shape"):
        fe.load_weights(path)


def test_hdf5_missing_layers_raises(tmp_path, rng):
    from raynet_tpu.models.feature_extractor import FeatureExtractor

    path = str(tmp_path / "weights_partial.hdf5")
    with h5py.File(path, "w") as f:
        g = f.create_group("conv2d_1")
        g.create_dataset(
            "kernel:0", data=rng.randn(3, 3, 3, 32).astype(np.float32)
        )
        g.create_dataset("bias:0", data=np.zeros(32, np.float32))
    fe = FeatureExtractor("simple_cnn")
    with pytest.raises(ValueError, match="missing"):
        fe.load_weights(path)


def test_forward_cli_accepts_hdf5_weight_file(tmp_path, rng,
                                              mock_scene_dir):
    """The user surface: raynet_forward --weight_file model.hdf5 runs the
    converted model end to end (reference parity: scripts pass Keras
    checkpoints directly)."""
    from raynet_tpu.scripts import forward_pass as fp_cli

    wpath = str(tmp_path / "published.hdf5")
    _write_keras_simple_cnn(wpath, rng, layout="submodel")
    out = tmp_path / "out"
    fp_cli.main(
        [
            str(mock_scene_dir.parent), str(out),
            "--scene_idx", "0",
            "--forward_pass_factory", "multi_view_cnn",
            "--weight_file", wpath,
            "--rays_batch", "1728",
            "--start_end", "0,1",
            "--depth_planes", "8",
            "--grid_shape", "12,12,12",
            "--maximum_number_of_marched_voxels", "24",
            "--patch_shape", "11,11,3",
        ]
    )
    dm = np.load(out / "depth_000.npy")
    assert np.isfinite(dm).all() and dm.shape == (36, 48)
