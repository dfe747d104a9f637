"""Fused per-ray-batch inference pipelines, one jit each.

These are the TPU equivalents of the reference's fused CUDA kernels:
- :func:`mvcnn_depth_step`  ~ similarities.py's
  multi_view_cnn forward pass with depth estimation (plane sweep + argmax)
- :func:`mvcnn_voxel_depth_step` ~ mvcnn_with_ray_marching_and_voxels_mapping
  (adds DDA traversal + depth->voxel interpolation, argmax voxel center)
- :func:`raynet_message_step` / :func:`raynet_depth_step` ~ raynet_fp.py's
  batch_raynet_fp / batch_complete_depth_estimation (adds BP message update
  against a global occupancy accumulator)

Everything in a step is one XLA program: sampling, gathers, contractions,
scans and scatters fuse into a single device launch per ray batch, replacing
the reference's per-stage kernel launches + host round-trips.
"""
from functools import partial

import jax
import jax.numpy as jnp

from .sampling import (
    sample_points_along_segments,
    segments_in_bbox as _segments,
)
from .similarities import compute_similarities
from .ray_marching import (
    voxel_traversal_flat,
    unflatten_voxel_indices,
    voxel_centers,
)
from .planes_voxels import planes_to_voxels_mapping
from . import mrf


def _scores(
    features, P, ray_start, ray_end, padding, height, width,
    depth_planes, band_specs, strict=False, packed=None,
):
    """Plane-sweep scores from ray segments: the lane-major banded Pallas
    kernel when ``band_specs`` is set (rays must then be in tile order),
    the XLA gather path otherwise.

    ``strict=True`` drops the fallback branch and instead returns
    ``(S, bad)`` where ``bad`` > 0 flags a band overflow (the scores are
    then garbage and the caller must abort). The lax.cond keeps BOTH
    branches' buffers alive — the XLA branch's padded (N, D, V, F) gather
    intermediate alone is ~8 GB at 65k rays — so memory-tight callers
    (the per-image scan) use strict mode and ride the same
    planner-invariant error path as the beam kernel's overflow flag.

    The scores depend only on (features, geometry) — NOT on BP messages —
    so callers running several BP sweeps per image pass the first sweep's
    scores back in (``S_planes=...``) instead of recomputing them.
    """
    if band_specs is None:
        points = sample_points_along_segments(
            ray_start, ray_end, depth_planes
        )
        S = compute_similarities(
            features, P, points, padding, height, width
        )
        return (S, jnp.float32(0.0)) if strict else S
    from .pallas.planesweep import banded_scores_from_segments

    n_views = features.shape[0]
    n_pairs = (n_views * (n_views - 1)) // 2
    pair, fits = banded_scores_from_segments(
        features, P, ray_start, ray_end, depth_planes, padding,
        height, width, band_specs, packed=packed,
    )
    S_banded = jax.nn.softmax(pair / n_pairs, axis=-1)
    if strict:
        return S_banded, 1.0 - fits.astype(jnp.float32)

    def fallback(_):
        points = sample_points_along_segments(
            ray_start, ray_end, depth_planes
        )
        return compute_similarities(
            features, P, points, padding, height, width
        )

    return jax.lax.cond(fits, lambda _: S_banded, fallback, None)


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "padding", "depth_planes", "band_specs",
        "tile_ordered",
    ),
)
def mvcnn_depth_step(
    ray_idxs,
    features,
    P,
    P_pinv,
    camera_center,
    bbox,
    height,
    width,
    padding,
    depth_planes,
    band_specs=None,
    tile_ordered=False,
):
    """Plane-sweep scoring + per-ray argmax depth.

    Returns (S (N, D) softmax scores, depth (N,) = ||argmax point - C||).
    Ties break to the first maximum, like the reference argmax.

    ``band_specs`` (static, from ops.pallas.planesweep.plan_band_specs)
    routes the scoring through the banded Pallas kernel (~11x on v5e);
    ``tile_ordered`` promises the rays are already pixel-tile sorted.
    """
    reorder = band_specs is not None and not tile_ordered
    if reorder:
        from .pallas.planesweep import tile_order

        perm, inv = tile_order(ray_idxs, height)
        ray_idxs = ray_idxs[perm]
    ray_start, ray_end = _segments(
        ray_idxs, P_pinv, camera_center, bbox, height
    )
    points = sample_points_along_segments(ray_start, ray_end, depth_planes)
    S = _scores(
        features, P, ray_start, ray_end, padding, height, width,
        depth_planes, band_specs,
    )

    best = jnp.argmax(S, axis=-1)  # (N,)
    best_points = jnp.take_along_axis(
        points, best[:, None, None], axis=1
    )[:, 0]
    depth = jnp.linalg.norm(best_points - camera_center[None], axis=-1)
    if reorder:
        S, depth = S[inv], depth[inv]
    return S, depth


@partial(
    jax.jit,
    static_argnames=(
        "height",
        "width",
        "padding",
        "depth_planes",
        "grid_shape",
        "max_voxels",
        "use_pallas",
        "band_specs",
        "tile_ordered",
    ),
)
def mvcnn_voxel_depth_step(
    ray_idxs,
    features,
    P,
    P_pinv,
    camera_center,
    bbox,
    height,
    width,
    padding,
    depth_planes,
    grid_shape,
    max_voxels,
    use_pallas=False,
    band_specs=None,
    tile_ordered=False,
):
    """Plane sweep -> voxel traversal -> depth->voxel mapping -> argmax.

    Returns (S_vox (N, M), voxel_indices (N, M, 3), counts (N,), depth (N,)).
    """
    reorder = band_specs is not None and not tile_ordered
    if reorder:
        from .pallas.planesweep import tile_order

        perm, inv = tile_order(ray_idxs, height)
        ray_idxs = ray_idxs[perm]
    ray_start, ray_end = _segments(
        ray_idxs, P_pinv, camera_center, bbox, height
    )
    S_planes = _scores(
        features, P, ray_start, ray_end, padding, height, width,
        depth_planes, band_specs,
    )

    flat_idx, counts = voxel_traversal_flat(
        bbox, ray_start, ray_end, grid_shape, max_voxels, use_pallas
    )
    vox = unflatten_voxel_indices(flat_idx, grid_shape)
    S_vox = planes_to_voxels_mapping(
        S_planes, vox, counts, ray_start, ray_end, bbox, grid_shape,
        depth_planes,
    )

    centers = voxel_centers(vox, bbox, grid_shape)  # (N, M, 3)
    best = jnp.argmax(S_vox, axis=-1)
    best_centers = jnp.take_along_axis(centers, best[:, None, None], axis=1)[
        :, 0
    ]
    depth = jnp.linalg.norm(best_centers - camera_center[None], axis=-1)
    depth = jnp.where(counts > 0, depth, 0.0)
    if reorder:
        S_vox, vox = S_vox[inv], vox[inv]
        counts, depth = counts[inv], depth[inv]
    return S_vox, vox, counts, depth


@partial(
    jax.jit,
    static_argnames=(
        "height",
        "width",
        "padding",
        "depth_planes",
        "grid_shape",
        "max_voxels",
        "use_pallas",
        "first_iteration",
        "band_specs",
        "tile_ordered",
        "strict_bands",
    ),
)
def raynet_message_step(
    ray_idxs,
    features,
    P,
    P_pinv,
    camera_center,
    bbox,
    messages_pon,
    grid_acc_flat,
    n_valid,
    height,
    width,
    padding,
    depth_planes,
    grid_shape,
    max_voxels,
    use_pallas=False,
    first_iteration=False,
    band_specs=None,
    tile_ordered=False,
    S_planes=None,
    strict_bands=False,
    packed=None,
):
    """Front half of RayNet + one BP message update for this ray batch.

    ``strict_bands``: compute the banded similarities WITHOUT the XLA
    fallback branch (see _similarities) and return a 4th element ``bad``
    flagging a band overflow.

    Returns (new_messages (N, M), scatter (G,), S_planes (N, D)) where
    scatter is this batch's additive contribution to the NEXT iteration's
    accumulator grid and S_planes are the (message-independent) plane-sweep
    scores — pass them back in on later sweeps to skip the plane sweep.

    ``n_valid`` (dynamic scalar): rows >= n_valid are padding (the batch
    iterator repeats ray 0 to keep shapes static); their counts are zeroed so
    they contribute NOTHING to the scatter — otherwise the duplicated ray's
    messages would be accumulated once per padded row, silently saturating
    the occupancy along its voxel path.

    ``first_iteration``: the accumulator is still uniformly the prior and
    the incoming messages are zero, so the specialized first sweep skips the
    42M-element grid gather entirely (ops/mrf.bp_update_first).
    """
    # pad rays arrive as -(ray+1): duplicate geometry, masked from scatters
    pad_rows = ray_idxs < 0
    ray_idxs = jnp.where(pad_rows, -ray_idxs - 1, ray_idxs)
    reorder = band_specs is not None and not tile_ordered
    if reorder:
        from .pallas.planesweep import tile_order

        perm, inv = tile_order(ray_idxs, height)
        ray_idxs = ray_idxs[perm]
        messages_pon = messages_pon[perm]
        pad_rows = pad_rows[perm]
        if S_planes is not None:
            S_planes = S_planes[perm]
        valid = (perm < n_valid) & ~pad_rows
    else:
        valid = (jnp.arange(ray_idxs.shape[0]) < n_valid) & ~pad_rows
    ray_start, ray_end = _segments(
        ray_idxs, P_pinv, camera_center, bbox, height
    )
    bad = jnp.float32(0.0)
    if S_planes is None:
        if strict_bands:
            S_planes, bad = _scores(
                features, P, ray_start, ray_end, padding, height, width,
                depth_planes, band_specs, strict=True, packed=packed,
            )
        else:
            S_planes = _scores(
                features, P, ray_start, ray_end, padding, height, width,
                depth_planes, band_specs, packed=packed,
            )

    flat_idx, counts = voxel_traversal_flat(
        bbox, ray_start, ray_end, grid_shape, max_voxels, use_pallas
    )
    counts = jnp.where(valid, counts, 0)
    vox = unflatten_voxel_indices(flat_idx, grid_shape)
    S_vox = planes_to_voxels_mapping(
        S_planes, vox, counts, ray_start, ray_end, bbox, grid_shape,
        depth_planes,
    )

    grid_size = int(grid_shape[0]) * int(grid_shape[1]) * int(grid_shape[2])
    if first_iteration:
        new_msgs, scatter = mrf.bp_update_first(
            S_vox, flat_idx, counts, grid_acc_flat[0], grid_size
        )
    else:
        new_msgs, scatter = mrf.bp_update(
            S_vox, flat_idx, counts, messages_pon, grid_acc_flat, grid_size
        )
    if reorder:
        new_msgs = new_msgs[inv]
        S_planes = S_planes[inv]
    if strict_bands:
        return new_msgs, scatter, S_planes, bad
    return new_msgs, scatter, S_planes


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "padding", "depth_planes", "bp_cfg",
        "band_specs", "first_iteration", "interpret", "strict_bands",
    ),
)
def raynet_beam_message_step(
    ray_idxs,
    features,
    P,
    P_pinv,
    camera_center,
    bbox,
    messages_slot,
    grid_acc_flat,
    n_valid,
    height,
    width,
    padding,
    depth_planes,
    bp_cfg,
    band_specs=None,
    first_iteration=False,
    interpret=False,
    S_planes=None,
    strict_bands=False,
):
    """Fully fused RayNet message sweep: banded plane-sweep similarities +
    the BP beam kernel (traversal, hat mapping, gather, recurrences,
    scatter all in one Pallas program — 26x the XLA sweep on v5e).

    Rays MUST be tile-ordered and N a multiple of 256; messages are stored
    in the kernel's slot layout ((N, bp_cfg.slots)).

    ``S_planes`` (optional, (N, D)): precomputed plane-sweep scores. The
    scores are message-independent, so the orchestrator computes them once
    per image (first sweep) and reuses them for the remaining sweeps.

    Returns (new_messages_slot, scatter (G,), overflow scalar, S_planes).
    """
    from .pallas.bp_beam import bp_beam_message_step

    pad_rows = ray_idxs < 0
    ray_idxs = jnp.where(pad_rows, -ray_idxs - 1, ray_idxs)
    ray_start, ray_end = _segments(
        ray_idxs, P_pinv, camera_center, bbox, height
    )
    bad = jnp.float32(0.0)
    if S_planes is None:
        if strict_bands:
            S_planes, bad = _scores(
                features, P, ray_start, ray_end, padding, height, width,
                depth_planes, band_specs, strict=True,
            )
        else:
            S_planes = _scores(
                features, P, ray_start, ray_end, padding, height, width,
                depth_planes, band_specs,
            )
    valid = (
        (jnp.arange(ray_idxs.shape[0]) < n_valid) & ~pad_rows
    ).astype(jnp.int32)
    new_msgs, scatter, overflow = bp_beam_message_step(
        ray_start, ray_end, valid, S_planes, messages_slot,
        grid_acc_flat, camera_center, bbox, bp_cfg,
        first_iteration=first_iteration, interpret=interpret,
    )
    return new_msgs, scatter, overflow + bad, S_planes


@partial(
    jax.jit,
    static_argnames=(
        "height", "width", "padding", "depth_planes", "bp_cfg",
        "band_specs", "interpret", "strict_bands",
    ),
)
def raynet_beam_depth_step(
    ray_idxs,
    features,
    P,
    P_pinv,
    camera_center,
    bbox,
    messages_slot,
    grid_acc_flat,
    height,
    width,
    padding,
    depth_planes,
    bp_cfg,
    band_specs=None,
    interpret=False,
    S_planes=None,
    strict_bands=False,
):
    """Fused posterior-depth sweep via the BP beam kernel.

    Returns (depth (N,), overflow scalar)."""
    from .pallas.bp_beam import bp_beam_depth_step

    ray_idxs = jnp.where(ray_idxs < 0, -ray_idxs - 1, ray_idxs)
    ray_start, ray_end = _segments(
        ray_idxs, P_pinv, camera_center, bbox, height
    )
    bad = jnp.float32(0.0)
    if S_planes is None:
        if strict_bands:
            S_planes, bad = _scores(
                features, P, ray_start, ray_end, padding, height, width,
                depth_planes, band_specs, strict=True,
            )
        else:
            S_planes = _scores(
                features, P, ray_start, ray_end, padding, height, width,
                depth_planes, band_specs,
            )
    valid = jnp.ones((ray_idxs.shape[0],), jnp.int32)
    depth, overflow = bp_beam_depth_step(
        ray_start, ray_end, valid, S_planes, messages_slot,
        grid_acc_flat, camera_center, bbox, bp_cfg, interpret=interpret,
    )
    return depth, overflow + bad


def _strict_front(chunk, features, P, P_pinv, camera_center, bbox, S_in,
                  height, width, padding, depth_planes, band_specs,
                  packed=None):
    """Shared front half of the per-image scan bodies: decode -(ray+1)
    pad entries, compute ray segments, and (when not cached) the strict
    banded plane scores. Returns (ray_start, ray_end, pad_rows, S, bad).
    ``packed``: loop-invariant pre-packed feature layout (see
    pack_features_for_bands) — scan bodies MUST pass it so the ~300 MB
    packing chain is not re-evaluated per ray batch.
    """
    pad_rows = chunk < 0
    chunk = jnp.where(pad_rows, -chunk - 1, chunk)
    ray_start, ray_end = _segments(
        chunk, P_pinv, camera_center, bbox, height
    )
    bad = jnp.float32(0.0)
    if S_in is None:
        S_in, bad = _scores(
            features, P, ray_start, ray_end, padding, height, width,
            depth_planes, band_specs, strict=True, packed=packed,
        )
    return ray_start, ray_end, pad_rows, S_in, bad


@partial(
    jax.jit,
    static_argnames=(
        "batch", "height", "width", "padding", "depth_planes",
        "grid_shape", "max_voxels", "bp_cfg", "band_specs",
        "first_iteration", "use_scores", "use_pallas",
    ),
    donate_argnums=(0, 2),
)
def raynet_image_update(
    msgs_full,      # per-image store (beam-native or (rows, M)) — DONATED
    scores_full,    # (nb*batch, D) cached plane scores (or a dummy)
    scatter_total,  # (G,) accumulating scatter — DONATED
    grid_acc,       # (G,) read-only accumulator
    chunks,         # (nb, batch) int32 ray indices (tail padded)
    n_valids,       # (nb,) int32 valid rows per chunk
    features, P, P_pinv, camera_center, bbox,
    chunk_offsets=None,  # (nb,) int32 GLOBAL row offsets (class segments
                         # scan a sub-range of a shared store); None ->
                         # arange(nb)*batch
    *,
    batch, height, width, padding, depth_planes, grid_shape, max_voxels,
    bp_cfg, band_specs, first_iteration, use_scores, use_pallas,
):
    """ONE dispatch per (image, sweep): lax.scan over the image's ray
    batches with the message store as carry. At DTU scale the per-batch
    dispatch latency (~5-15 ms each through the axon tunnel, ~5,700
    dispatches per scene) would otherwise rival the device time.

    The store is padded to whole batches so every slice is full-size;
    validity is the kernel's dynamic n_valid mask.

    Returns (msgs_full, scores_full, scatter_total, overflow_sum).

    With a beam config the message store is kept in the kernel's NATIVE
    (total_blocks, slots, RAYS) layout across sweeps — the two ~100 MB
    per-batch layout transposes were the dominant prep-glue cost.
    """
    offs = chunk_offsets
    if offs is None:
        offs = jnp.arange(chunks.shape[0], dtype=jnp.int32) * batch
    # Loop-invariant banded-kernel feature packing, ONCE per dispatch:
    # evaluated inside the scan body it re-pads the ~300 MB (720p, 5
    # views) feature stack every ray batch — XLA does not hoist it out
    # of the while loop (measured 35-46 ms/chunk first sweep vs ~13 ms
    # of kernel time).
    packed = None
    if band_specs is not None and (first_iteration or not use_scores):
        from .pallas.planesweep import pack_features_for_bands

        packed = pack_features_for_bands(features, band_specs)
    if bp_cfg is not None:
        from .pallas.bp_beam import (
            bp_beam_message_step_perm, grid_to_perm, grid_from_perm,
        )

        nblk = batch // bp_cfg.rays
        # Grid layouts convert ONCE per image-sweep; the kernel's aliased
        # RMW scatter accumulates straight into the PERM-layout carry (no
        # per-batch zeros grid, flat add, or transpose pair).
        grid_perm = grid_to_perm(grid_acc, bp_cfg)
        scatter_perm = grid_to_perm(scatter_total, bp_cfg)
    else:
        cols = msgs_full.shape[1]

    def body(carry, xs):
        msgs_full, scores_full, acc = carry
        chunk, n_valid, off = xs
        if bp_cfg is not None:
            msg_block = jax.lax.dynamic_slice(
                msgs_full, (off // bp_cfg.rays, 0, 0),
                (nblk, bp_cfg.slots, bp_cfg.rays),
            ).astype(jnp.float32)
        else:
            msg_block = jax.lax.dynamic_slice(
                msgs_full, (off, 0), (batch, cols)
            ).astype(jnp.float32)
        S_in = None
        if use_scores and not first_iteration:
            S_in = jax.lax.dynamic_slice(
                scores_full, (off, 0), (batch, depth_planes)
            )
        # strict band mode: no XLA fallback branch (its padded
        # (N, D, V, F) gather temp alone is ~8 GB at 65k rays and the
        # lax.cond keeps both branches' buffers alive inside the scan);
        # a band overflow rides the planner-invariant error path instead.
        if bp_cfg is not None:
            ray_start, ray_end, pad_rows, S_in, bad = _strict_front(
                chunk, features, P, P_pinv, camera_center, bbox, S_in,
                height, width, padding, depth_planes, band_specs,
                packed=packed,
            )
            valid = (
                (jnp.arange(batch) < n_valid) & ~pad_rows
            ).astype(jnp.int32)
            new_msgs, acc, overflow = bp_beam_message_step_perm(
                ray_start, ray_end, valid, S_in, msg_block, grid_perm,
                acc, camera_center, bbox, bp_cfg,
                first_iteration=first_iteration, native_msgs=True,
            )
            overflow = overflow + bad
            S_out = S_in
        else:
            new_msgs, scatter, S_out, overflow = raynet_message_step(
                chunk, features, P, P_pinv, camera_center, bbox,
                msg_block, grid_acc, n_valid,
                height, width, padding, depth_planes, grid_shape,
                max_voxels, use_pallas=use_pallas,
                first_iteration=first_iteration,
                band_specs=band_specs, tile_ordered=True, S_planes=S_in,
                strict_bands=True, packed=packed,
            )
            acc = acc + scatter
        msgs_full = jax.lax.dynamic_update_slice(
            msgs_full, new_msgs.astype(msgs_full.dtype),
            (off // bp_cfg.rays, 0, 0) if bp_cfg is not None
            else (off, 0),
        )
        if use_scores and first_iteration:
            scores_full = jax.lax.dynamic_update_slice(
                scores_full, S_out.astype(scores_full.dtype), (off, 0)
            )
        return (msgs_full, scores_full, acc), overflow

    acc0 = scatter_perm if bp_cfg is not None else scatter_total
    (msgs_full, scores_full, acc), ovs = jax.lax.scan(
        body, (msgs_full, scores_full, acc0),
        (chunks, n_valids, offs),
    )
    if bp_cfg is not None:
        scatter_total = grid_from_perm(acc, bp_cfg)
    else:
        scatter_total = acc
    return msgs_full, scores_full, scatter_total, ovs.sum()


@partial(
    jax.jit,
    static_argnames=(
        "batch", "height", "width", "padding", "depth_planes",
        "grid_shape", "max_voxels", "bp_cfg", "band_specs",
        "use_scores", "use_pallas",
    ),
)
def raynet_image_depth(
    msgs_full, scores_full, grid_acc, chunks,
    features, P, P_pinv, camera_center, bbox,
    chunk_offsets=None,
    *,
    batch, height, width, padding, depth_planes, grid_shape, max_voxels,
    bp_cfg, band_specs, use_scores, use_pallas,
):
    """Single-dispatch final depth sweep over a whole image (see
    :func:`raynet_image_update`). Returns (nb, batch) depths."""
    offs = chunk_offsets
    if offs is None:
        offs = jnp.arange(chunks.shape[0], dtype=jnp.int32) * batch
    # loop-invariant feature packing (see raynet_image_update)
    packed = None
    if band_specs is not None and not use_scores:
        from .pallas.planesweep import pack_features_for_bands

        packed = pack_features_for_bands(features, band_specs)
    if bp_cfg is not None:
        from .pallas.bp_beam import bp_beam_depth_step_perm, grid_to_perm

        nblk = batch // bp_cfg.rays
        grid_perm = grid_to_perm(grid_acc, bp_cfg)
        scratch0 = jnp.zeros_like(grid_perm)  # dead aliased buffer
    else:
        cols = msgs_full.shape[1]

    def body(carry, xs):
        chunk, off = xs
        if bp_cfg is not None:
            msg_block = jax.lax.dynamic_slice(
                msgs_full, (off // bp_cfg.rays, 0, 0),
                (nblk, bp_cfg.slots, bp_cfg.rays),
            ).astype(jnp.float32)
        else:
            msg_block = jax.lax.dynamic_slice(
                msgs_full, (off, 0), (batch, cols)
            ).astype(jnp.float32)
        S_in = None
        if use_scores:
            S_in = jax.lax.dynamic_slice(
                scores_full, (off, 0), (batch, depth_planes)
            )
        if bp_cfg is not None:
            ray_start, ray_end, _, S_in, bad = _strict_front(
                chunk, features, P, P_pinv, camera_center, bbox, S_in,
                height, width, padding, depth_planes, band_specs,
                packed=packed,
            )
            valid = jnp.ones((batch,), jnp.int32)
            depth, carry, overflow = bp_beam_depth_step_perm(
                ray_start, ray_end, valid, S_in, msg_block, grid_perm,
                carry, camera_center, bbox, bp_cfg, native_msgs=True,
            )
            bad = bad + overflow
        else:
            _, depth, bad = raynet_depth_step(
                chunk, features, P, P_pinv, camera_center, bbox,
                msg_block, grid_acc, height, width, padding,
                depth_planes, grid_shape, max_voxels,
                use_pallas=use_pallas, band_specs=band_specs,
                tile_ordered=True, S_planes=S_in, strict_bands=True,
                packed=packed,
            )
        return carry, (depth, bad)

    carry0 = scratch0 if bp_cfg is not None else 0
    _, (depths, bads) = jax.lax.scan(body, carry0, (chunks, offs))
    return depths, bads.sum()


@partial(
    jax.jit,
    static_argnames=(
        "height",
        "width",
        "padding",
        "depth_planes",
        "grid_shape",
        "max_voxels",
        "use_pallas",
        "band_specs",
        "tile_ordered",
        "strict_bands",
    ),
)
def raynet_depth_step(
    ray_idxs,
    features,
    P,
    P_pinv,
    camera_center,
    bbox,
    messages_pon,
    grid_acc_flat,
    height,
    width,
    padding,
    depth_planes,
    grid_shape,
    max_voxels,
    use_pallas=False,
    band_specs=None,
    tile_ordered=False,
    S_planes=None,
    strict_bands=False,
    packed=None,
):
    """Final RayNet sweep: occlusion-aware posterior depth per ray.

    Returns (S_new (N, M), depth (N,)); with ``strict_bands`` a third
    element flags a banded-kernel box overflow (see _similarities).
    """
    ray_idxs = jnp.where(ray_idxs < 0, -ray_idxs - 1, ray_idxs)
    reorder = band_specs is not None and not tile_ordered
    if reorder:
        from .pallas.planesweep import tile_order

        perm, inv = tile_order(ray_idxs, height)
        ray_idxs = ray_idxs[perm]
        messages_pon = messages_pon[perm]
        if S_planes is not None:
            S_planes = S_planes[perm]
    ray_start, ray_end = _segments(
        ray_idxs, P_pinv, camera_center, bbox, height
    )
    bad = jnp.float32(0.0)
    if S_planes is None:
        if strict_bands:
            S_planes, bad = _scores(
                features, P, ray_start, ray_end, padding, height, width,
                depth_planes, band_specs, strict=True, packed=packed,
            )
        else:
            S_planes = _scores(
                features, P, ray_start, ray_end, padding, height, width,
                depth_planes, band_specs, packed=packed,
            )

    flat_idx, counts = voxel_traversal_flat(
        bbox, ray_start, ray_end, grid_shape, max_voxels, use_pallas
    )
    vox = unflatten_voxel_indices(flat_idx, grid_shape)
    S_vox = planes_to_voxels_mapping(
        S_planes, vox, counts, ray_start, ray_end, bbox, grid_shape,
        depth_planes,
    )

    grid_size = int(grid_shape[0]) * int(grid_shape[1]) * int(grid_shape[2])
    S_new = mrf.depth_estimate(
        S_vox, flat_idx, counts, messages_pon, grid_acc_flat, grid_size
    )

    centers = voxel_centers(vox, bbox, grid_shape)
    best = jnp.argmax(S_new, axis=-1)
    best_centers = jnp.take_along_axis(centers, best[:, None, None], axis=1)[
        :, 0
    ]
    depth = jnp.linalg.norm(best_centers - camera_center[None], axis=-1)
    depth = jnp.where(counts > 0, depth, 0.0)
    if reorder:
        S_new, depth = S_new[inv], depth[inv]
    if strict_bands:
        return S_new, depth, bad
    return S_new, depth
