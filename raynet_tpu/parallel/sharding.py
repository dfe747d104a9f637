"""Multi-chip scale-out: ray sharding over a device mesh.

The reference is single-GPU (SURVEY.md §2.4); this module is the genuinely
new distributed component. The parallel structure of the workload:

- rays are embarrassingly parallel through sampling / plane sweep /
  traversal / mapping / per-ray BP recurrences -> shard the ray axis;
- the ONLY cross-ray interaction is the commutative scatter-add into the
  occupancy grid, once per BP iteration -> one ``psum`` over ICI per
  iteration (the grid is small: 256x256x128 f32 = 32 MB);
- the CNN runs per-view and is replicated (5 images per view set).

Two styles are provided: explicit ``shard_map`` wrappers with a hand-placed
``psum`` (inference scale-out), and sharding-annotated inputs for the jitted
training step where GSPMD inserts the same collective automatically.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import mrf, fused

RAY_AXIS = "rays"


def make_ray_mesh(n_devices=None, devices=None):
    """1D mesh over the ray axis (the workload's data-parallel axis)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (RAY_AXIS,))


def shard_batch(mesh, x, axis=0):
    """Place an array with its ``axis`` sharded over the ray mesh axis."""
    spec = [None] * np.ndim(x)
    spec[axis] = RAY_AXIS
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def sharded_bp_update(mesh, grid_size):
    """BP sweep with rays sharded over the mesh; the grid contribution is
    reduced with one psum over ICI (the atomicAdd -> collective mapping)."""

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS), P()),
        out_specs=(P(RAY_AXIS), P()),
    )
    def step(S, flat_idx, counts, messages_pon, grid_acc_flat):
        new_msgs, scatter = mrf.bp_update(
            S, flat_idx, counts, messages_pon, grid_acc_flat, grid_size
        )
        return new_msgs, jax.lax.psum(scatter, RAY_AXIS)

    return step


def sharded_raynet_message_step(
    mesh, height, width, padding, depth_planes, grid_shape, max_voxels,
    use_pallas=False, first_iteration=False,
):
    """Full fused RayNet message step with rays sharded over the mesh."""

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(RAY_AXIS),  # ray_idxs
            P(),  # features
            P(),  # P
            P(),  # P_pinv
            P(),  # camera_center
            P(),  # bbox
            P(RAY_AXIS),  # messages
            P(),  # grid_acc
            P(),  # n_valid (global; padding sits at the batch tail)
        ),
        out_specs=(P(RAY_AXIS), P()),
    )
    def step(
        ray_idxs, features, Pm, P_pinv, center, bbox, messages, grid_acc,
        n_valid,
    ):
        # Per-shard valid count: the padded rows occupy the END of the
        # global batch, so shard k of local size L owns rows [kL, (k+1)L).
        local_n = ray_idxs.shape[0]
        shard = jax.lax.axis_index(RAY_AXIS)
        local_valid = jnp.clip(n_valid - shard * local_n, 0, local_n)
        new_msgs, scatter, _ = fused.raynet_message_step(
            ray_idxs, features, Pm, P_pinv, center, bbox, messages,
            grid_acc, local_valid, height, width, padding, depth_planes,
            grid_shape, max_voxels, use_pallas=use_pallas,
            first_iteration=first_iteration,
        )
        return new_msgs, jax.lax.psum(scatter, RAY_AXIS)

    return step


def sharded_raynet_depth_step(
    mesh, height, width, padding, depth_planes, grid_shape, max_voxels,
    use_pallas=False,
):
    """Final posterior-depth sweep with rays sharded over the mesh (no
    cross-ray interaction: the grid is read-only here, so no collective)."""

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(RAY_AXIS), P(), P(), P(), P(), P(), P(RAY_AXIS), P(),
        ),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS)),
    )
    def step(
        ray_idxs, features, Pm, P_pinv, center, bbox, messages, grid_acc
    ):
        return fused.raynet_depth_step(
            ray_idxs, features, Pm, P_pinv, center, bbox, messages,
            grid_acc, height, width, padding, depth_planes, grid_shape,
            max_voxels, use_pallas=use_pallas,
        )

    return step


def sharded_beam_message_step(
    mesh, height, width, padding, depth_planes, bp_cfg, band_specs=None,
    first_iteration=False, interpret=False,
):
    """The fused BP beam sweep with rays sharded over the mesh: each device
    runs the Pallas kernel on its ray shard against the replicated
    accumulator; the per-device grid contributions are psum'd over ICI
    (the atomicAdd -> collective mapping, now at beam-kernel speed)."""

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(RAY_AXIS),  # ray_idxs
            P(),  # features
            P(),  # P
            P(),  # P_pinv
            P(),  # camera_center
            P(),  # bbox
            P(RAY_AXIS),  # slot-layout messages
            P(),  # grid_acc
            P(),  # n_valid (global; padding sits at the batch tail)
        ),
        out_specs=(P(RAY_AXIS), P(), P(RAY_AXIS)),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )
    def step(
        ray_idxs, features, Pm, P_pinv, center, bbox, messages, grid_acc,
        n_valid,
    ):
        local_n = ray_idxs.shape[0]
        shard = jax.lax.axis_index(RAY_AXIS)
        local_valid = jnp.clip(n_valid - shard * local_n, 0, local_n)
        new_msgs, scatter, overflow, _ = fused.raynet_beam_message_step(
            ray_idxs, features, Pm, P_pinv, center, bbox, messages,
            grid_acc, local_valid, height, width, padding, depth_planes,
            bp_cfg, band_specs=band_specs,
            first_iteration=first_iteration, interpret=interpret,
        )
        return (
            new_msgs,
            jax.lax.psum(scatter, RAY_AXIS),
            jnp.broadcast_to(overflow, (local_n,)),
        )

    return step


def sharded_beam_depth_step(
    mesh, height, width, padding, depth_planes, bp_cfg, band_specs=None,
    interpret=False,
):
    """Final beam depth sweep with rays sharded (grid read-only).

    Returns (depth, overflow) where overflow is the per-shard planner
    K/box violation count broadcast over that shard's rows — silently
    dropping it would yield wrong depths with no error (ADVICE r2)."""

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(RAY_AXIS), P(), P(), P(), P(), P(), P(RAY_AXIS), P(),
        ),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS)),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )
    def step(
        ray_idxs, features, Pm, P_pinv, center, bbox, messages, grid_acc
    ):
        depth, overflow = fused.raynet_beam_depth_step(
            ray_idxs, features, Pm, P_pinv, center, bbox, messages,
            grid_acc, height, width, padding, depth_planes, bp_cfg,
            band_specs=band_specs, interpret=interpret,
        )
        return depth, jnp.broadcast_to(overflow, (ray_idxs.shape[0],))

    return step


def sharded_image_update(
    mesh, n_dev, *, batch, height, width, padding, depth_planes,
    grid_shape, max_voxels, bp_cfg, band_specs, first_iteration,
    use_scores, use_pallas,
):
    """Sharded SINGLE-DISPATCH per-(image, sweep) scan: each device runs
    fused.raynet_image_update over ITS ray shard of every batch (the
    perm-layout scatter rides the shard-local scan carry), and the grid
    contribution is reduced with ONE psum per (image, sweep) — replacing
    the per-batch psum granularity (~4,200 32 MB collectives per DTU
    scene where ~150 do).

    Store layouts (device-major so shard_map's contiguous axis-0 split
    matches ray ownership):
      msgs_st:   (n_dev, local_blocks, SLOTS, RAYS) beam-native, or
                 (n_dev, local_rows, M) for the XLA path
      scores_st: (n_dev, local_rows, D)
      chunks_st: (n_dev, nb, unit) int32 ray ids
    ``scatter_prior`` is the replicated prior grid; shard contributions
    accumulate from zero and the psum'd total is added to it (a psum of
    per-shard prior-initialized grids would count the prior n_dev times).

    Returns a step fn: (msgs_st, scores_st, scatter_prior, grid_acc,
    chunks_st, n_valids, chunk_offsets, features, P, P_pinv, center,
    bbox) -> (msgs_st, scores_st, scatter_total, overflow_sum).

    ``chunk_offsets``: (nb,) int32 LOCAL-store row offsets — a class
    SEGMENT scans a chunk sub-range [c0, c1) of the image against the
    full local store, so chunk c sits at rows (c0 + c) * unit of each
    device's shard (pass arange(nb) * unit for a whole image).
    """
    from functools import partial as _partial

    unit = batch // n_dev
    common = dict(
        batch=unit, height=height, width=width, padding=padding,
        depth_planes=depth_planes, grid_shape=grid_shape,
        max_voxels=max_voxels, bp_cfg=bp_cfg, band_specs=band_specs,
        first_iteration=first_iteration, use_scores=use_scores,
        use_pallas=use_pallas,
    )

    @_partial(jax.jit, donate_argnums=(0, 2))
    @_partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(RAY_AXIS),  # msgs_st
            P(RAY_AXIS),  # scores_st
            P(),          # scatter_prior
            P(),          # grid_acc
            P(RAY_AXIS),  # chunks_st
            P(),          # n_valids (global per chunk)
            P(),          # chunk_offsets (local store rows)
            P(), P(), P(), P(), P(),
        ),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS), P(), P(RAY_AXIS)),
        check_vma=False,  # pallas_call out_shapes carry no vma info
    )
    def step(msgs_st, scores_st, scatter_prior, grid_acc, chunks_st,
             n_valids, chunk_offsets, features, Pm, P_pinv, center, bbox):
        k = jax.lax.axis_index(RAY_AXIS)
        local_nv = jnp.clip(n_valids - k * unit, 0, unit)
        m, s, scat, ov = fused.raynet_image_update(
            msgs_st[0], scores_st[0], jnp.zeros_like(scatter_prior),
            grid_acc, chunks_st[0], local_nv,
            features, Pm, P_pinv, center, bbox, chunk_offsets,
            **common,
        )
        total = scatter_prior + jax.lax.psum(scat, RAY_AXIS)
        return m[None], s[None], total, jnp.broadcast_to(ov, (1,))

    return step


def sharded_image_depth(
    mesh, n_dev, *, batch, height, width, padding, depth_planes,
    grid_shape, max_voxels, bp_cfg, band_specs, use_scores, use_pallas,
):
    """Sharded single-dispatch final depth sweep (grid read-only: no
    collective). ``chunk_offsets`` as in sharded_image_update (class
    segments scan a chunk sub-range of the image's store). Returns
    (depths_st (n_dev, nb, unit), overflow_st)."""
    from functools import partial as _partial

    unit = batch // n_dev
    common = dict(
        batch=unit, height=height, width=width, padding=padding,
        depth_planes=depth_planes, grid_shape=grid_shape,
        max_voxels=max_voxels, bp_cfg=bp_cfg, band_specs=band_specs,
        use_scores=use_scores, use_pallas=use_pallas,
    )

    @jax.jit
    @_partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(RAY_AXIS), P(RAY_AXIS), P(), P(RAY_AXIS), P(),
            P(), P(), P(), P(), P(),
        ),
        out_specs=(P(RAY_AXIS), P(RAY_AXIS)),
        check_vma=False,
    )
    def step(msgs_st, scores_st, grid_acc, chunks_st, chunk_offsets,
             features, Pm, P_pinv, center, bbox):
        depths, bad = fused.raynet_image_depth(
            msgs_st[0], scores_st[0], grid_acc, chunks_st[0],
            features, Pm, P_pinv, center, bbox, chunk_offsets,
            **common,
        )
        return depths[None], jnp.broadcast_to(bad, (1,))

    return step


def shard_e2e_batch(mesh, batch):
    """Shard a RayNet training batch over rays; scene-level tensors are
    replicated. GSPMD then runs the whole jitted train step SPMD, inserting
    the grid all-reduce automatically."""
    sharded = {}
    for k, v in batch.items():
        if k == "X":  # (V, B, D, ...) — rays on axis 1
            sharded[k] = shard_batch(mesh, v, axis=1)
        elif k in ("bbox", "scene_idx"):
            sharded[k] = replicate(mesh, v) if k == "bbox" else v
        else:  # (B, ...) ray-major tensors
            sharded[k] = shard_batch(mesh, v, axis=0)
    return sharded


def replicate_state(mesh, state):
    """Replicate a flax TrainState's arrays over the mesh."""
    return jax.tree_util.tree_map(
        lambda x: replicate(mesh, x) if hasattr(x, "shape") else x, state
    )
