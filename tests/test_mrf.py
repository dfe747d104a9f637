"""Belief propagation: tiny human-checkable worlds (the reference's 6x6x1
"2D trick", tests/test_mrf.py) plus fuzzing against the numpy oracle, plus a
differentiability smoke test — the property the TPU build adds over the
reference's inference-only CUDA backend.
"""
import numpy as np
import jax
import jax.numpy as jnp

from raynet_tpu.ops.mrf import (
    belief_propagation,
    bp_update,
    depth_estimate,
    log_prior,
)
from raynet_tpu.ops.ray_marching import flatten_voxel_indices
from oracles import belief_propagation_oracle, depth_estimate_oracle


def make_ray(voxels_2d, grid=(6, 6, 1), m=8):
    """Build (indices, count) for a ray visiting the given (x, y) voxels."""
    idx = np.zeros((m, 3), dtype=np.int32)
    for k, (x, y) in enumerate(voxels_2d):
        idx[k] = [x, y, 0]
    return idx, len(voxels_2d)


def run_bp(S, indices, counts, grid=(6, 6, 1), gamma=0.05, iterations=3):
    acc, msgs = belief_propagation(
        jnp.asarray(S, dtype=jnp.float32),
        jnp.asarray(indices),
        jnp.asarray(counts, dtype=jnp.int32),
        grid,
        gamma=gamma,
        bp_iterations=iterations,
    )
    return np.asarray(acc), np.asarray(msgs)


def occupancy_from_acc(acc):
    """Stable sigmoid of the accumulated pon (mrf_np.py:206-240)."""
    mx = np.maximum(0.0, acc)
    t1 = np.exp(0.0 - mx)
    t2 = np.exp(acc - mx)
    return t2 / (t2 + t1)


def test_single_ray_peaked_distribution():
    # One ray marching straight through x=0..5 at y=2; the depth distribution
    # peaks at voxel 3 -> after BP that voxel has the largest marginal.
    idx, c = make_ray([(x, 2) for x in range(6)])
    S = np.full((1, 8), 0.0, dtype=np.float32)
    S[0, :6] = [0.05, 0.05, 0.1, 0.6, 0.1, 0.1]
    acc, _ = run_bp(S, idx[None], [c])
    occ = occupancy_from_acc(acc)
    peak = np.unravel_index(occ.argmax(), occ.shape)
    assert peak == (3, 2, 0)


def test_two_agreeing_rays_sharpen():
    # Two crossing rays both peaked on the same voxel (3, 3): the posterior
    # depth distribution must be sharper than the input after BP.
    r1, c1 = make_ray([(x, 3) for x in range(6)])
    r2, c2 = make_ray([(3, y) for y in range(6)])
    S = np.zeros((2, 8), dtype=np.float32)
    S[0, :6] = [0.1, 0.1, 0.1, 0.5, 0.1, 0.1]
    S[1, :6] = [0.1, 0.1, 0.1, 0.5, 0.1, 0.1]
    indices = np.stack([r1, r2])
    counts = np.array([c1, c2], dtype=np.int32)

    acc, msgs = run_bp(S, indices, counts)
    flat = flatten_voxel_indices(jnp.asarray(indices), (6, 6, 1))
    S_post = np.asarray(
        depth_estimate(
            jnp.asarray(S),
            flat,
            jnp.asarray(counts),
            jnp.asarray(msgs),
            jnp.asarray(acc).reshape(-1),
            36,
        )
    )
    assert S_post[0].argmax() == 3
    assert S_post[1].argmax() == 3
    assert S_post[0].max() > S[0].max()
    # and the jointly-voted voxel has the grid's maximum occupancy
    occ = occupancy_from_acc(acc)
    assert np.unravel_index(occ.argmax(), occ.shape) == (3, 3, 0)


def test_conflicting_ray_suppresses_front_voxel():
    # Ray A is confident about (1, 2); ray B marches through (0..5, 2) with a
    # peak far behind at (4, 2). A's evidence at voxel 1 must reduce B's
    # posterior beyond voxel 1 less than an unobstructed BP would — i.e. B's
    # posterior mass before the conflict voxel grows.
    rA, cA = make_ray([(1, y) for y in range(6)])
    rB, cB = make_ray([(x, 2) for x in range(6)])
    S = np.zeros((2, 8), dtype=np.float32)
    S[0, :6] = [0.05, 0.05, 0.75, 0.05, 0.05, 0.05]  # A peaks at (1,2) = k=2
    S[1, :6] = [0.15, 0.2, 0.15, 0.15, 0.2, 0.15]  # B nearly flat
    indices = np.stack([rA, rB])
    counts = np.array([cA, cB], dtype=np.int32)

    acc, msgs = run_bp(S, indices, counts)
    flat = flatten_voxel_indices(jnp.asarray(indices), (6, 6, 1))
    S_post = np.asarray(
        depth_estimate(
            jnp.asarray(S),
            flat,
            jnp.asarray(counts),
            jnp.asarray(msgs),
            jnp.asarray(acc).reshape(-1),
            36,
        )
    )
    # B's posterior now peaks at the voxel A says is occupied: x=1 -> k=1
    assert S_post[1].argmax() == 1


def test_bp_matches_numpy_oracle(rng):
    grid = (5, 4, 3)
    g = 5 * 4 * 3
    n, m = 7, 6
    flat_idx = rng.randint(0, g, size=(n, m)).astype(np.int32)
    counts = rng.randint(2, m + 1, size=(n,)).astype(np.int32)
    S = rng.uniform(0.01, 1.0, size=(n, m)).astype(np.float32)
    for r in range(n):
        S[r, counts[r]:] = 0.0
        flat_idx[r, counts[r]:] = 0

    # indices (N, M, 3) from flat
    d2, d3 = grid[1], grid[2]
    idx3 = np.stack(
        [flat_idx // (d2 * d3), (flat_idx // d3) % d2, flat_idx % d3], axis=-1
    ).astype(np.int32)

    acc, msgs = run_bp(S, idx3, counts, grid=grid, gamma=0.05, iterations=3)
    ref_acc, ref_msgs = belief_propagation_oracle(
        S, flat_idx, counts, g, gamma=0.05, bp_iterations=3
    )
    np.testing.assert_allclose(
        acc.reshape(-1), ref_acc, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(msgs, ref_msgs, rtol=2e-4, atol=2e-4)

    # depth estimation against its oracle
    S_post = np.asarray(
        depth_estimate(
            jnp.asarray(S),
            jnp.asarray(flat_idx),
            jnp.asarray(counts),
            jnp.asarray(msgs),
            jnp.asarray(acc, dtype=jnp.float32).reshape(-1),
            g,
        )
    )
    ref_post = depth_estimate_oracle(S, flat_idx, counts, msgs, ref_acc)
    np.testing.assert_allclose(S_post, ref_post, rtol=2e-4, atol=2e-4)


def test_bp_is_differentiable(rng):
    """The unrolled BP must carry gradients back to S (training path parity
    with the reference's TF backend, mrf/mrf_tf.py)."""
    grid = (4, 4, 1)
    n, m = 3, 4
    flat_idx = rng.randint(0, 16, size=(n, m)).astype(np.int32)
    counts = np.full((n,), m, dtype=np.int32)
    idx3 = np.stack(
        [flat_idx // 4, flat_idx % 4, np.zeros_like(flat_idx)], axis=-1
    ).astype(np.int32)
    S = rng.uniform(0.05, 1.0, size=(n, m)).astype(np.float32)

    def loss(S):
        acc, msgs = belief_propagation(
            S, jnp.asarray(idx3), jnp.asarray(counts), grid, 0.05, 2
        )
        flat = flatten_voxel_indices(jnp.asarray(idx3), grid)
        post = depth_estimate(
            S, flat, jnp.asarray(counts), msgs, acc.reshape(-1), 16
        )
        return (post * jnp.arange(m)[None]).sum()

    g = jax.grad(loss)(jnp.asarray(S))
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).max() > 0


def test_bp_update_first_matches_general(rng):
    """The specialized first sweep equals the general update on a uniform
    prior grid with zero messages."""
    from raynet_tpu.ops.mrf import bp_update, bp_update_first, log_prior

    g = 5 * 4 * 3
    n, m = 7, 6
    flat_idx = rng.randint(0, g, size=(n, m)).astype(np.int32)
    counts = rng.randint(2, m + 1, size=(n,)).astype(np.int32)
    S = rng.uniform(0.01, 1.0, size=(n, m)).astype(np.float32)
    gamma = 0.05
    prior = float(log_prior(gamma))

    msgs0 = jnp.zeros((n, m), jnp.float32)
    grid0 = jnp.full((g,), prior, jnp.float32)
    ref_msgs, ref_scatter = bp_update(
        jnp.asarray(S), jnp.asarray(flat_idx), jnp.asarray(counts),
        msgs0, grid0, g,
    )
    fast_msgs, fast_scatter = bp_update_first(
        jnp.asarray(S), jnp.asarray(flat_idx), jnp.asarray(counts),
        jnp.float32(prior), g,
    )
    np.testing.assert_allclose(
        np.asarray(fast_msgs), np.asarray(ref_msgs), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(fast_scatter), np.asarray(ref_scatter), rtol=1e-6,
        atol=1e-6,
    )
