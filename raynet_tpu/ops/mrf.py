"""MRF with ray potentials: sum-product belief propagation as JAX scans.

One differentiable implementation replaces the reference's numpy
(raynet/mrf/mrf_np.py), TF (raynet/mrf/mrf_tf.py) and CUDA
(raynet/cuda_implementations/mrf_bp.cu) backends.

Mapping of the reference's structure onto XLA:
- the per-ray linear-time message recurrences (eq. 13/14 of Ulusoy 3DV'15;
  cumsum/cumprod closed forms, mrf_np.py:73-120) become masked exclusive
  ``cumsum``/``cumprod`` over the fixed voxel budget M;
- the cross-ray atomicAdd reduction into the occupancy grid
  (mrf_bp.cu:169-176) becomes a ``.at[].add`` scatter on the flattened grid
  (a commutative segment reduction XLA lowers well);
- the double-buffered accumulator swap per BP iteration
  (forward_pass.py:675-678) becomes the carry of a ``lax.scan``.

All messages are "pon" = log(mu+ / mu-) quotients, exactly as the reference.
"""
from functools import partial

import jax
import jax.numpy as jnp

_CLIP_S = 1e-5
_CLIP_MU = 1e-4


def log_prior(gamma):
    """log(gamma / (1 - gamma)) — the accumulator's per-voxel init."""
    return jnp.log(gamma) - jnp.log(1.0 - gamma)


def clip_and_renorm(S, mask):
    """Clip to [1e-5, 1-1e-5] on valid entries and renormalize to sum 1.

    Parity: mrf_np.py:4-8 / mrf_bp.cu:103-111, count-aware like mrf_tf.py:6-15.
    """
    S = jnp.clip(S, _CLIP_S, 1.0 - _CLIP_S)
    S = jnp.where(mask, S, 0.0)
    return S / jnp.maximum(S.sum(axis=-1, keepdims=True), 1e-30)


def occupancy_to_ray(grid_acc_flat, flat_idx, messages_pon, mask):
    """Positive occupancy-to-ray message mu in (0, 1).

    ``grid_acc[v] - own message`` in log space, then a numerically stable
    sigmoid, clipped to [1e-4, 1-1e-4] (mrf_np.py:50-71 / mrf_bp.cu:12-35).
    Masked entries return 0 so that (1 - mu) = 1 leaves cumprods untouched.
    """
    pon = grid_acc_flat[flat_idx] - messages_pon
    mx = jnp.maximum(0.0, pon)
    t1 = jnp.exp(0.0 - mx)
    t2 = jnp.exp(pon - mx)
    mu = jnp.clip(t2 / (t1 + t2), _CLIP_MU, 1.0 - _CLIP_MU)
    return jnp.where(mask, mu, 0.0)


def _ray_messages(grid_acc_flat, flat_idx, messages_pon, S, mask):
    """New pon messages for every ray (vectorized over N, masked over M).

    Implements the two-pass linear recurrence of mrf_bp.cu:88-167:
      pos_i = cumsum_{j<i}(c_j) + exclprod_i * s_i
      neg_i = cumsum_{j<i}(c_j) + (total - cumsum_{j<=i}(c_j)) / (1 - mu_i)
    with c_j = mu_j * exclprod_j * s_j and exclprod_i = prod_{j<i}(1 - mu_j).
    """
    mu = occupancy_to_ray(grid_acc_flat, flat_idx, messages_pon, mask)
    return _ray_messages_from_mu(mu, S, mask)


def _ray_messages_from_mu(mu, S, mask):
    one_minus = jnp.where(mask, 1.0 - mu, 1.0)
    exclprod = jnp.concatenate(
        [
            jnp.ones_like(one_minus[..., :1]),
            jnp.cumprod(one_minus, axis=-1)[..., :-1],
        ],
        axis=-1,
    )
    contrib = mu * exclprod * S  # masked: mu==0 and S==0 outside
    cumsum_incl = jnp.cumsum(contrib, axis=-1)
    cumsum_excl = cumsum_incl - contrib
    total = cumsum_incl[..., -1:]

    pos = cumsum_excl + exclprod * S
    neg = cumsum_excl + (total - cumsum_incl) / one_minus

    # Guard the division so masked/degenerate rays stay finite — NaNs behind
    # a jnp.where still poison gradients. The clip is inactive in the normal
    # regime (mu is already clipped to [1e-4, 1-1e-4]).
    p = pos / jnp.maximum(pos + neg, 1e-37)
    p = jnp.clip(p, 1e-37, 1.0 - 1e-7)
    new_pon = jnp.log(p) - jnp.log1p(-p)
    return jnp.where(mask, new_pon, 0.0)


@partial(jax.jit, static_argnames=("grid_size",))
def bp_update_first(S, flat_idx, counts, pon_const, grid_size):
    """First BP sweep, specialized: before any accumulation the grid
    uniformly holds the prior and the messages are zero, so the
    occupancy-to-ray message is the CONSTANT sigmoid(prior) = gamma — the
    42M-element grid gather (the most expensive op of a sweep) vanishes
    exactly. ``pon_const`` is the uniform accumulator value
    (log(gamma/(1-gamma))), e.g. ``grid_acc_flat[0]``.
    """
    m = S.shape[-1]
    mask = (jnp.arange(m)[None, :] < counts[:, None]) & (counts[:, None] > 1)
    Sr = clip_and_renorm(S, mask)
    mx = jnp.maximum(0.0, pon_const)
    mu_const = jnp.clip(
        jnp.exp(pon_const - mx) / (jnp.exp(0.0 - mx) + jnp.exp(pon_const - mx)),
        _CLIP_MU,
        1.0 - _CLIP_MU,
    )
    mu = jnp.where(mask, mu_const, 0.0)
    new_pon = _ray_messages_from_mu(mu, Sr, mask)

    safe_idx = jnp.where(mask, flat_idx, 0)
    scatter = jnp.zeros((grid_size,), dtype=S.dtype).at[
        safe_idx.reshape(-1)
    ].add(jnp.where(mask, new_pon, 0.0).reshape(-1))
    return new_pon, scatter


@partial(jax.jit, static_argnames=("grid_size",))
def bp_update(S, flat_idx, counts, messages_pon, grid_acc_flat, grid_size):
    """One BP sweep over a batch of rays.

    Arguments
    ---------
        S: (N, M) per-voxel depth probabilities (pre clip/renorm)
        flat_idx: (N, M) int32 flattened grid indices of visited voxels
        counts: (N,) valid-voxel counts
        messages_pon: (N, M) previous-iteration ray->occupancy messages
        grid_acc_flat: (G,) accumulated messages from the PREVIOUS iteration
        grid_size: static G (for the scatter)

    Returns
    -------
        new_messages_pon: (N, M)
        scatter: (G,) the contribution to ADD into the next iteration's
            accumulator (caller owns the log-prior initialization).

    Rays with counts <= 1 are skipped exactly like the reference
    (mrf_np.py:299-300): messages stay 0 and contribute nothing.
    """
    m = S.shape[-1]
    mask = (jnp.arange(m)[None, :] < counts[:, None]) & (counts[:, None] > 1)
    Sr = clip_and_renorm(S, mask)
    new_pon = _ray_messages(grid_acc_flat, flat_idx, messages_pon, Sr, mask)

    safe_idx = jnp.where(mask, flat_idx, 0)
    scatter = jnp.zeros((grid_size,), dtype=S.dtype).at[safe_idx.reshape(-1)].add(
        jnp.where(mask, new_pon, 0.0).reshape(-1)
    )
    return new_pon, scatter


@partial(jax.jit, static_argnames=("grid_size",))
def depth_estimate(S, flat_idx, counts, messages_pon, grid_acc_flat, grid_size):
    """Posterior depth distribution after BP (eq. 55; mrf_bp.cu:37-86).

    S_new_i = mu_i * prod_{j<i}(1 - mu_j) * s_i, normalized per ray.
    """
    del grid_size  # static-arg symmetry with bp_update
    m = S.shape[-1]
    mask = (jnp.arange(m)[None, :] < counts[:, None]) & (counts[:, None] > 1)
    Sr = clip_and_renorm(S, mask)
    mu = occupancy_to_ray(grid_acc_flat, flat_idx, messages_pon, mask)
    one_minus = jnp.where(mask, 1.0 - mu, 1.0)
    exclprod = jnp.concatenate(
        [
            jnp.ones_like(one_minus[..., :1]),
            jnp.cumprod(one_minus, axis=-1)[..., :-1],
        ],
        axis=-1,
    )
    s_new = mu * exclprod * Sr
    total = s_new.sum(axis=-1, keepdims=True)
    return jnp.where(mask, s_new / jnp.maximum(total, 1e-30), 0.0)


@partial(jax.jit, static_argnames=("grid_shape", "bp_iterations", "remat"))
def belief_propagation(
    S, voxel_indices, counts, grid_shape, gamma=0.05, bp_iterations=3,
    remat=True,
):
    """Full multi-iteration BP over one batch of rays.

    Arguments
    ---------
        S: (N, M) per-voxel depth probabilities
        voxel_indices: (N, M, 3) int32 visited voxel indices
        counts: (N,)
        grid_shape: static (D1, D2, D3)
        gamma: occupancy prior
        bp_iterations: static number of sweeps

    Returns
    -------
        grid_acc: (D1, D2, D3) accumulated pon messages after the final sweep
        messages_pon: (N, M) final ray->occupancy messages

    This is the whole-batch analogue of mrf_np.belief_propagation:243-330
    (where every ray is visited once per iteration before the accumulator
    swap). Differentiable end-to-end; used unrolled in training. With
    ``remat`` (default) each iteration's intermediates are rematerialized in
    the backward pass instead of stored — differentiating the unrolled BP
    would otherwise keep every sweep's (N, M) cumprod/cumsum chain live.
    """
    from .ray_marching import flatten_voxel_indices

    grid_size = int(grid_shape[0]) * int(grid_shape[1]) * int(grid_shape[2])
    flat_idx = flatten_voxel_indices(voxel_indices, grid_shape)
    prior = log_prior(jnp.asarray(gamma, dtype=S.dtype))

    # First sweep specialized: uniform prior + zero messages need no grid
    # gather (bp_update_first).
    msgs, scatter = bp_update_first(S, flat_idx, counts, prior, grid_size)
    grid_acc = scatter + prior

    def body(carry, _):
        msgs, grid_acc = carry
        new_msgs, scatter = bp_update(
            S, flat_idx, counts, msgs, grid_acc, grid_size
        )
        new_grid = scatter + prior
        return (new_msgs, new_grid), None

    if remat:
        body = jax.checkpoint(body)
    if bp_iterations > 1:
        (msgs, grid_acc), _ = jax.lax.scan(
            body, (msgs, grid_acc), None, length=bp_iterations - 1
        )
    return grid_acc.reshape(grid_shape), msgs
