"""End-to-end RayNet training: CNN -> pairwise similarities -> depth->voxel
mapping -> unrolled BP -> posterior depth -> EMD loss, with an optionally
trainable occupancy prior gamma.

Parity: raynet/tf_implementations/forward_backward_pass.py:128-370
(build_end_to_end_training). The TF map_fn/foldl plumbing becomes batched
ops: the per-ray BP recurrences are the masked scans of ops/mrf.py and the
sequential sparse_add fold over rays becomes one scatter-add — the single
largest structural speedup over the reference's training graph.
"""
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state

from ..models.cnn import cnn_factory
from ..models.losses import loss_factory, expected_squared_error
from ..models.optimizers import optimizer_factory
from ..ops import mrf
from ..ops.planes_voxels import project_voxels_to_rays, depth_planes_to_voxels
from ..ops.ray_marching import voxel_centers, flatten_voxel_indices

_GAMMA_CLIP = (1e-5, 1.0 - 1e-5)


class E2EState(train_state.TrainState):
    batch_stats: Any = None


def raynet_forward(
    model,
    variables,
    gamma,
    X,
    points,
    ray_voxel_indices,
    ray_voxel_count,
    bbox,
    grid_shape,
    bp_iterations=3,
    train=True,
):
    """Differentiable RayNet forward on a batch of rays from one scene.

    Arguments
    ---------
        X: (V, B, D, ph, pw, C) per-view patch stacks
        points: (B, D, 4) sampled points (homogeneous)
        ray_voxel_indices: (B, M, 3); ray_voxel_count: (B,)
        bbox: (6,); grid_shape: static (D1, D2, D3)

    Returns (S_post (B, M), aux dict, batch_stats updates or None).
    """
    v, b, d = X.shape[:3]
    flat = X.reshape((v * b * d,) + X.shape[3:])
    if train:
        feats, updates = model.apply(
            variables, flat, train=True, mutable=["batch_stats"]
        )
    else:
        feats = model.apply(variables, flat, train=False)
        updates = None
    if feats.shape[1] * feats.shape[2] == 0:
        raise ValueError(
            "patch %r is smaller than the CNN receptive field"
            % (X.shape[3:5],)
        )
    f = feats.reshape(v, b, d, -1)  # patches collapse to 1x1 spatial

    # sum over view pairs i<j via the closed-form identity
    sum_f = f.sum(axis=0)
    sum_sq = (f * f).sum(axis=(0, 3))
    pair_sum = 0.5 * ((sum_f * sum_f).sum(-1) - sum_sq)
    n_pairs = (v * (v - 1)) // 2
    S_planes = jax.nn.softmax(pair_sum / n_pairs, axis=-1)  # (B, D)

    # depth -> voxel mapping (li_2 top-2 interpolation)
    centers = voxel_centers(ray_voxel_indices, bbox, grid_shape)
    ray_start = points[:, 0, :3]
    ray_end = points[:, -1, :3]
    t = project_voxels_to_rays(centers, ray_start, ray_end)
    S_vox = depth_planes_to_voxels(S_planes, t, ray_voxel_count, d)

    gamma = jnp.clip(gamma, *_GAMMA_CLIP)
    grid_acc, msgs = mrf.belief_propagation(
        S_vox,
        ray_voxel_indices,
        ray_voxel_count,
        grid_shape,
        gamma=gamma,
        bp_iterations=bp_iterations,
    )
    grid_size = int(np.prod(grid_shape))
    flat_idx = flatten_voxel_indices(ray_voxel_indices, grid_shape)
    S_post = mrf.depth_estimate(
        S_vox, flat_idx, ray_voxel_count, msgs, grid_acc.reshape(-1),
        grid_size,
    )
    aux = {"S_planes": S_planes, "S_vox": S_vox, "centers": centers}
    return S_post, aux, updates


def build_end_to_end_training(
    rng,
    generation_params,
    grid_shape,
    cnn_name="simple_cnn",
    loss="emd",
    optimizer="Adam",
    lr=1e-4,
    momentum=None,
    clipnorm=0.0,
    gamma=0.031,
    train_with_gamma=True,
    bp_iterations=3,
    weight_file=None,
    return_grads=False,
):
    """Returns (state, train_fn, eval_fn) — the functional counterpart of the
    reference's (train_on_batch, evaluate_on_batch) K.functions.

    ``return_grads``: include the raw gradient pytree in train_fn's
    metrics. Used by the sharded-vs-single-device parity tests: post-Adam
    params cannot be compared for functionally-degenerate directions
    (a conv bias feeding BatchNorm has zero gradient; Adam amplifies its
    reduction-order noise to ±lr), but the gradients themselves must
    agree to float tolerance."""
    gp = generation_params
    model = cnn_factory(cnn_name)()
    ph, pw, c = gp.patch_shape
    variables = model.init(rng, jnp.zeros((1, ph, pw, c), jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if weight_file:
        import flax

        with open(weight_file, "rb") as f:
            restored = flax.serialization.from_bytes(
                {"params": params, "batch_stats": batch_stats}, f.read()
            )
        params = restored["params"]
        batch_stats = restored["batch_stats"]

    grid_shape = tuple(int(g) for g in grid_shape)
    loss_fn = loss_factory(loss)

    trainable = {"cnn": params}
    if train_with_gamma:
        trainable["gamma"] = jnp.asarray(gamma, jnp.float32)
    state = E2EState.create(
        apply_fn=model.apply,
        params=trainable,
        tx=optimizer_factory(optimizer, lr, momentum, clipnorm),
        batch_stats=batch_stats,
    )

    def _forward(params, batch_stats, batch, train):
        cnn_params = params["cnn"]
        g = params.get("gamma", None)
        if g is None:
            g = jnp.asarray(gamma, jnp.float32)  # fixed prior
        variables = {"params": cnn_params, "batch_stats": batch_stats}
        S_post, aux, updates = raynet_forward(
            model,
            variables,
            g,
            batch["X"],
            batch["points"],
            batch["ray_voxel_indices"],
            batch["ray_voxel_count"],
            batch["bbox"],
            grid_shape,
            bp_iterations=bp_iterations,
            train=train,
        )
        return S_post, aux, updates, g

    def _loss(y, S_post, aux, batch):
        if loss == "expected_squared_error":
            dists = jnp.linalg.norm(
                aux["centers"] - batch["camera_centers"][:, None, :3],
                axis=-1,
            )
            return expected_squared_error(y, S_post, dists).mean()
        return loss_fn(y, S_post).mean()

    @jax.jit
    def train_fn(state, batch):
        def compute_loss(params):
            S_post, aux, updates, g = _forward(
                params, state.batch_stats, batch, train=True
            )
            return _loss(batch["y"], S_post, aux, batch), (updates, g)

        (loss_val, (updates, g)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads)
        if "gamma" in state.params:
            # clip-constraint parity (forward_backward_pass.py:346-353)
            clipped = jnp.clip(state.params["gamma"], *_GAMMA_CLIP)
            state = state.replace(
                params={**state.params, "gamma": clipped}
            )
        if updates is not None:
            state = state.replace(batch_stats=updates["batch_stats"])
        metrics = {"loss": loss_val, "gamma": g}
        if return_grads:
            metrics["grads"] = grads
        return state, metrics

    @jax.jit
    def eval_fn(state, batch):
        S_post, aux, _, g = _forward(
            state.params, state.batch_stats, batch, train=False
        )
        return {"loss": _loss(batch["y"], S_post, aux, batch), "gamma": g}

    return state, train_fn, eval_fn
