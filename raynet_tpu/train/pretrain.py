"""MVCNN pretraining: siamese patch-similarity training step.

Parity: the reference's `raynet_pretrain` path — Keras fit on
build_simple_nn_for_training (models.py:344-403) with EMD loss and
accuracy / mae / mde metrics — re-expressed as a jitted optax step with
explicit BatchNorm statistics.
"""
from typing import Any

import jax
import jax.numpy as jnp
from flax.training import train_state

from ..models.cnn import MultiViewSimilarityNet
from ..models.losses import loss_factory
from ..models.optimizers import optimizer_factory


class PretrainState(train_state.TrainState):
    batch_stats: Any = None


def create_pretrain_state(
    rng,
    input_shape,
    cnn_name="simple_cnn",
    optimizer="Adam",
    lr=1e-3,
    momentum=None,
    clipnorm=0.0,
    loss="emd",
    reducer="average",
    merge_layer="dot-product",
    weight_decay=0.0,
):
    """input_shape = (D, N, H, W, C) without the batch dim (reference
    convention, scripts/arguments.py:401-445)."""
    d, n, h, w, c = input_shape
    model = MultiViewSimilarityNet(
        cnn_name=cnn_name, reducer=reducer, merge_layer=merge_layer
    )
    dummy = jnp.zeros((1, d, n, h, w, c), jnp.float32)
    variables = model.init(rng, dummy, dummy)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    state = PretrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=optimizer_factory(optimizer, lr, momentum, clipnorm),
        batch_stats=batch_stats,
    )
    loss_fn = loss_factory(loss)
    return model, state, loss_fn, weight_decay


def create_hartmann_pretrain_state(
    rng,
    patch_shape,
    n_views=5,
    optimizer="SGD",
    lr=1e-3,
    momentum=0.9,
    clipnorm=0.0,
):
    """Hartmann et al. baseline pretraining: 5-patch quintuples -> 2-way
    match/no-match softmax with categorical crossentropy (parity:
    models.py:406-470 + HartmannSampleGenerator targets)."""
    from ..models.cnn import HartmannSimilarityNet
    from ..models.losses import categorical_crossentropy

    model = HartmannSimilarityNet()
    ph, pw, c = patch_shape
    dummy = jnp.zeros((1, n_views, ph, pw, c), jnp.float32)
    variables = model.init(rng, dummy)
    state = PretrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=optimizer_factory(optimizer, lr, momentum, clipnorm),
        batch_stats=variables.get("batch_stats", {}),
    )

    @jax.jit
    def train_step(state, patches, y):
        """patches: (B, 5, ph, pw, c); y: (B, 1, 1, 2)."""

        def compute_loss(params):
            out = model.apply({"params": params}, patches, train=True)
            return categorical_crossentropy(
                y.reshape(y.shape[0], -1), out.reshape(out.shape[0], -1)
            ).mean(), out

        (loss, out), grads = jax.value_and_grad(compute_loss, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads=grads)
        acc = (
            (jnp.argmax(y.reshape(y.shape[0], -1), -1)
             == jnp.argmax(out.reshape(out.shape[0], -1), -1))
            .astype(jnp.float32)
            .mean()
        )
        return state, {"loss": loss, "acc": acc}

    return model, state, train_step


def make_pretrain_step(model, loss_fn, weight_decay=0.0):
    @jax.jit
    def train_step(state, x1, x2, y):
        def compute_loss(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x1,
                x2,
                train=True,
                mutable=["batch_stats"],
            )
            loss = loss_fn(y, out).mean()
            if weight_decay:
                loss = loss + weight_decay * sum(
                    jnp.sum(p ** 2)
                    for p in jax.tree_util.tree_leaves(params)
                    if p.ndim > 1
                )
            return loss, (out, updates)

        (loss, (out, updates)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        state = state.replace(batch_stats=updates["batch_stats"])
        metrics = _metrics(y, out, loss)
        return state, metrics

    @jax.jit
    def eval_step(state, x1, x2, y):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x1,
            x2,
            train=False,
        )
        return _metrics(y, out, loss_fn(y, out).mean())

    def _metrics(y, out, loss):
        acc = (
            (jnp.argmax(y, axis=-1) == jnp.argmax(out, axis=-1))
            .astype(jnp.float32)
            .mean()
        )
        mae = jnp.abs(y - out).mean()
        mde = (
            jnp.abs(jnp.argmax(y, -1) - jnp.argmax(out, -1))
            .astype(jnp.float32)
            .mean()
        )
        return {"loss": loss, "acc": acc, "mae": mae, "mde": mde}

    return train_step, eval_step
