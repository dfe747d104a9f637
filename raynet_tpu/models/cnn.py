"""Multi-view CNN architectures and similarity heads, in Flax.

The five feature extractors mirror the reference's factories
(raynet/models.py:90-275): all-VALID-padding conv stacks with 32 filters and
a normalization after every conv; the LAST layer carries no activation so
features are raw normalized responses. Receptive fields:

    simple_cnn / simple_cnn_ln          5 x (3x3)            rf = 11
    dilated_cnn_receptive_field_25(*)   5,5,5(d=2),3,3,3,3   rf = 25
    hartmann_cnn                        conv5-tanh-pool x 2

TPU notes: the convs run in NHWC with f32 accumulation; feature extraction
over full zero-padded images batches all V views into one conv stack, which
is where the MXU earns its keep.
"""
from typing import Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .layers import LayerNormalization


class _ConvBNStack(nn.Module):
    """Conv->norm(->act) stack; no activation after the final norm."""

    layer_specs: Sequence[Tuple[int, int, int]]  # (filters, kernel, dilation)
    activation: Callable = nn.relu
    norm: str = "batch"  # "batch" | "layer"

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.layer_specs)
        for i, (filters, kernel, dilation) in enumerate(self.layer_specs):
            x = nn.Conv(
                features=filters,
                kernel_size=(kernel, kernel),
                padding="VALID",
                kernel_dilation=(dilation, dilation),
                kernel_init=nn.initializers.glorot_uniform(),
            )(x)
            if self.norm == "batch":
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.99,
                    epsilon=1e-3,
                )(x)
            else:
                x = LayerNormalization()(x)
            if i < n - 1:
                x = self.activation(x)
        return x


class SimpleCNN(nn.Module):
    """5 x (3x3 conv + BN), relu between — rf 11 (models.py:90-111)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _ConvBNStack([(32, 3, 1)] * 5)(x, train)


class SimpleCNNLN(nn.Module):
    """SimpleCNN with LayerNormalization (models.py:114-135)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _ConvBNStack([(32, 3, 1)] * 5, norm="layer")(x, train)


_DILATED_SPECS = [
    (32, 5, 1),
    (32, 5, 1),
    (32, 5, 2),
    (32, 3, 1),
    (32, 3, 1),
    (32, 3, 1),
    (32, 3, 1),
]


class DilatedCNN25(nn.Module):
    """7-layer dilated stack, rf 25, relu (models.py:138-193)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _ConvBNStack(_DILATED_SPECS)(x, train)


class DilatedCNN25Tanh(nn.Module):
    """Same stack with tanh activations (models.py:196-251)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _ConvBNStack(_DILATED_SPECS, activation=nn.tanh)(x, train)


class HartmannCNN(nn.Module):
    """conv5-tanh-maxpool x 2 baseline feature net (models.py:254-262)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        del train
        x = nn.Conv(32, (5, 5), padding="VALID")(x)
        x = nn.tanh(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(64, (5, 5), padding="VALID")(x)
        x = nn.tanh(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


_CNN_FACTORIES = {
    "simple_cnn": SimpleCNN,
    "simple_cnn_ln": SimpleCNNLN,
    "dilated_cnn_receptive_field_25": DilatedCNN25,
    "dilated_cnn_receptive_field_25_with_tanh": DilatedCNN25Tanh,
    "hartmann_cnn": HartmannCNN,
}

# Receptive field minus 1 == how much a VALID stack shrinks each spatial dim.
CNN_SHRINKAGE = {
    "simple_cnn": 10,
    "simple_cnn_ln": 10,
    "dilated_cnn_receptive_field_25": 24,
    "dilated_cnn_receptive_field_25_with_tanh": 24,
    "hartmann_cnn": None,  # pooling: not a pure shrink
}


def cnn_factory(name):
    return _CNN_FACTORIES[name]


def cnn_output_padding(name):
    """Receptive-field shrink of a stack; the `padding` generation parameter
    must equal shrink+1 for the feature-map indexing to line up (the
    reference uses padding = patch height, e.g. 11 for simple_cnn)."""
    return CNN_SHRINKAGE[name]


class Reducer(nn.Module):
    """Reduce the pair axis of (B, D, N) similarity scores.

    Parity: raynet/models.py:34-74 (Average / Max / TopKAverage).
    """

    kind: str = "average"
    k: int = 3

    def __call__(self, x):
        if self.kind == "average":
            return x.mean(axis=-1)
        if self.kind == "max":
            return x.max(axis=-1)
        if self.kind == "topK":
            top = jnp.sort(x, axis=-1)[..., -self.k:]
            return top.mean(axis=-1)
        raise ValueError("unknown reducer %r" % (self.kind,))


class MultiViewSimilarityNet(nn.Module):
    """Siamese patch-similarity network for MVCNN pretraining.

    Two patch stacks of shape (B, D, N, Hp, Wp, C) go through a shared CNN
    (the patches collapse to 1x1 spatially for matched patch/receptive-field
    sizes), are dotted per pair, reduced over the N pair axis, and softmaxed
    over the D depth hypotheses (parity: models.py:344-403,
    build_simple_nn_for_training).
    """

    cnn_name: str = "simple_cnn"
    reducer: str = "average"
    merge_layer: str = "dot-product"  # or "cosine-similarity"
    top_k: int = 3

    @nn.compact
    def __call__(self, x1, x2, train: bool = False):
        b, d, n = x1.shape[:3]
        cnn = cnn_factory(self.cnn_name)()

        def embed(x):
            flat = x.reshape((-1,) + x.shape[3:])
            f = cnn(flat, train)
            if f.shape[1] * f.shape[2] == 0:
                raise ValueError(
                    "patch %r is smaller than the %s receptive field"
                    % (x.shape[3:5], self.cnn_name)
                )
            return f.reshape(b, d, n, -1)

        f1 = embed(x1)
        f2 = embed(x2)
        if self.merge_layer == "cosine-similarity":
            f1 = f1 / jnp.linalg.norm(f1, axis=-1, keepdims=True)
            f2 = f2 / jnp.linalg.norm(f2, axis=-1, keepdims=True)
        sims = (f1 * f2).sum(axis=-1)  # (B, D, N)
        scores = Reducer(self.reducer, self.top_k)(sims)  # (B, D)
        return nn.softmax(scores, axis=-1)


class HartmannSimilarityNet(nn.Module):
    """Hartmann et al. baseline: average 5 patch embeddings, then a small
    conv similarity head with a 2-way softmax (models.py:406-470).
    """

    @nn.compact
    def __call__(self, patches, train: bool = False):
        # patches: (B, 5, Hp, Wp, C)
        b, v = patches.shape[:2]
        cnn = HartmannCNN()
        f = cnn(patches.reshape((-1,) + patches.shape[2:]), train)
        f = f.reshape((b, v) + f.shape[1:]).mean(axis=1)
        if f.shape[1] < 5 or f.shape[2] < 5:
            raise ValueError(
                "hartmann patches must be at least 32x32 (similarity head "
                "got %r feature maps)" % (f.shape[1:3],)
            )
        x = nn.Conv(2048, (5, 5), padding="VALID")(f)
        x = nn.relu(x)
        x = nn.Conv(2048, (1, 1))(x)
        x = nn.relu(x)
        x = nn.Conv(2, (1, 1))(x)
        return nn.softmax(x, axis=-1)


def get_nn(name):
    """Registry mirroring the reference's get_nn (models.py:473-479)."""
    nets = {
        "simple_cnn": lambda **kw: cnn_factory(
            kw.pop("cnn_name", "simple_cnn")
        )(),
        "simple_nn_for_training": MultiViewSimilarityNet,
        "hartmann": HartmannSimilarityNet,
    }
    return nets[name]
