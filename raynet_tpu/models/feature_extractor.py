"""Feature-extraction wrapper: a CNN + parameters with a predict() API.

Replaces the reference's Keras model.predict on zero-padded image stacks
(forward_pass.py:292-294). Weights round-trip through flax.serialization
msgpack files (the framework's native checkpoint format; orbax handles the
training-side checkpoints).
"""
import jax
import jax.numpy as jnp
import numpy as np
import flax

from .cnn import cnn_factory


class FeatureExtractor:
    """A CNN bound to parameters, callable on image stacks."""

    def __init__(self, cnn_name="simple_cnn", variables=None, seed=0,
                 channels=3, dtype=jnp.float32, output_dtype=None):
        self.cnn_name = cnn_name
        self.model = cnn_factory(cnn_name)()
        self.dtype = dtype
        self.channels = channels
        # bf16 feature maps make the downstream plane-sweep gather ~2.6x
        # faster on TPU; the CNN itself still computes in f32.
        self.output_dtype = output_dtype
        if variables is None:
            dummy = jnp.zeros((1, 33, 33, channels), dtype)
            variables = self.model.init(jax.random.PRNGKey(seed), dummy)
        self.variables = variables
        out_dt = output_dtype
        in_dt = dtype

        def _fwd(v, x):
            # uint8 inputs normalize ON DEVICE: shipping u8 moves 4x
            # fewer bytes over the host link than pre-normalized f32.
            # Normalize in f32 like the host path (Image.__init__), then
            # cast to the model dtype; XLA compiles the constant /255 as
            # a reciprocal multiply, so inputs may differ from the host
            # path by 1 f32 ulp (bounded in test_models).
            if jnp.issubdtype(x.dtype, jnp.integer):
                x = (x.astype(jnp.float32) / 255.0).astype(in_dt)
            out = self.model.apply(v, x, train=False)
            return out.astype(out_dt) if out_dt is not None else out

        self._apply = jax.jit(_fwd)

    @property
    def feature_dim(self):
        """Output feature-channel count, derived WITHOUT any device work
        (jax.eval_shape): lets the orchestrator plan kernels before any
        image upload or CNN dispatch (cold-path decoupling)."""
        if not hasattr(self, "_feature_dim"):
            out = jax.eval_shape(
                self._apply, self.variables,
                jax.ShapeDtypeStruct((1, 33, 33, self.channels), self.dtype),
            )
            self._feature_dim = int(out.shape[-1])
        return self._feature_dim

    def predict(self, images):
        """images: (V, H, W, C) float array in [0, 1] — or uint8, which
        is transferred raw and normalized on device — -> (V, Hf, Wf, F)
        features."""
        arr = np.asarray(images) if not hasattr(images, "dtype") else images
        if arr.dtype == np.uint8:
            return self._apply(self.variables, jnp.asarray(arr))
        return self._apply(self.variables, jnp.asarray(arr, self.dtype))

    # -- persistence ---------------------------------------------------
    def save_weights(self, path):
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(self.variables))

    def load_weights(self, path):
        """Load msgpack (native) or Keras .hdf5/.h5 (reference-published
        checkpoints, converted via models.keras_import)."""
        if str(path).endswith((".hdf5", ".h5")):
            from .keras_import import load_keras_hdf5

            self.variables = load_keras_hdf5(path, self.variables)
            return
        with open(path, "rb") as f:
            self.variables = flax.serialization.from_bytes(
                self.variables, f.read()
            )

    @classmethod
    def from_weights(cls, cnn_name, path, channels=3):
        fe = cls(cnn_name, channels=channels)
        fe.load_weights(path)
        return fe


class HartmannModel:
    """HartmannSimilarityNet bound to parameters with a predict() API
    (patch quintuples -> 2-way match softmax maps)."""

    def __init__(self, variables=None, seed=0, patch_shape=(32, 32, 3),
                 n_views=5):
        from .cnn import HartmannSimilarityNet

        self.cnn_name = "hartmann_cnn"
        self.model = HartmannSimilarityNet()
        if variables is None:
            ph, pw, c = patch_shape
            dummy = jnp.zeros((1, n_views, ph, pw, c), jnp.float32)
            variables = self.model.init(jax.random.PRNGKey(seed), dummy)
        self.variables = variables
        self._apply = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False)
        )

    def predict(self, patches):
        """patches: (B, V, ph, pw, C) -> (B, h', w', 2) match scores."""
        return self._apply(
            self.variables, jnp.asarray(patches, jnp.float32)
        )

    def save_weights(self, path):
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(self.variables))

    def load_weights(self, path):
        with open(path, "rb") as f:
            self.variables = flax.serialization.from_bytes(
                self.variables, f.read()
            )


def upsample_features(features, cnn_name):
    """Kron-upsample feature maps of strided CNNs back to pixel stride.

    Parity: forward_pass.py:141-166 — only architectures with pooling
    (hartmann_cnn: two 2x2 max-pools) need it; pure conv stacks return
    features unchanged.
    """
    total_stride = {"hartmann_cnn": 4}.get(cnn_name, 1)
    if total_stride <= 1:
        return features
    return np.kron(
        np.asarray(features), np.ones((1, total_stride, total_stride, 1))
    )


def zeropad_images(images, padding):
    """Stack Image objects into one zero-padded (V, H+2p, W+2p, C) array.

    When every view's source was 8-bit, the stack stays uint8 (the
    zero-pad border is 0 either way) so the device upload moves 4x fewer
    bytes; FeatureExtractor.predict normalizes u8 on device with the
    same /255 f32 division the host path uses — identical features.

    Parity: forward_pass.py:181-198 (_to_list_with_zeropadded_images).
    """
    h, w, c = images[0].image.shape
    p = padding
    u8s = [getattr(im, "image_u8", None) for im in images]
    if all(u is not None for u in u8s):
        out = np.zeros(
            (len(images), h + 2 * p, w + 2 * p, c), dtype=np.uint8
        )
        for i, u in enumerate(u8s):
            out[i, p : p + h, p : p + w, :] = u
        return out
    out = np.zeros((len(images), h + 2 * p, w + 2 * p, c), dtype=np.float32)
    for i, im in enumerate(images):
        out[i, p : p + h, p : p + w, :] = im.image
    return out
