"""Multi-view plane-sweep feature similarity scoring.

Re-implements the reference's fused CUDA kernel
(raynet/cuda_implementations/feature_similarities.cu) as XLA gathers plus a
closed-form pair reduction.

Key identity (exact, just a different summation order): the accumulated
similarity over all view pairs

    S_d = sum_{i<j} f_i . f_j  =  0.5 * ( || sum_i f_i ||^2 - sum_i ||f_i||^2 )

turns the O(V^2 F) pair loop into two O(V F) reductions — the kind of
restructuring that matters on a machine built around large contractions.

Feature-map indexing parity (feature_similarities.cu:42-61):
    f_x = round(px) + padding - (padding - 1) // 2, clamped to [0, W]
    f_y = round(py) + padding - (padding - 1) // 2, clamped to [0, H]
    if either clamps to 0, BOTH are set to 0 (zero-padding sentinel),
where (H, W) is the ORIGINAL image shape and the feature maps have shape
(H + padding + 1, W + padding + 1) — valid convs with receptive field
``padding`` over images zero-padded by ``padding`` on each side.
"""
from functools import partial

import jax
import jax.numpy as jnp

from .geometry import project_points


def pixel_to_feature_idx(pixels, padding, height, width):
    """Map projected pixels to feature-map cells with the reference's
    clamp-and-zero-sentinel semantics.

    Arguments
    ---------
        pixels: (..., 2) float (x, y) pixel coordinates
        padding, height, width: static ints (original image dims)

    Returns
    -------
        (..., 2) int32 (fx, fy) feature-map indices.
    """
    offset = padding - (padding - 1) // 2
    f = jnp.round(pixels).astype(jnp.int32) + offset
    fx = jnp.clip(f[..., 0], 0, width)
    fy = jnp.clip(f[..., 1], 0, height)
    either_zero = (fx == 0) | (fy == 0)
    fx = jnp.where(either_zero, 0, fx)
    fy = jnp.where(either_zero, 0, fy)
    return jnp.stack([fx, fy], axis=-1)


def gather_view_features(features, feature_idx):
    """Gather per-view feature vectors at feature-map cells.

    Arguments
    ---------
        features: (V, Hf, Wf, F) per-view feature maps
        feature_idx: (N, D, V, 2) int32 (fx, fy) indices

    Returns
    -------
        (N, D, V, F) gathered feature vectors.
    """
    fx = feature_idx[..., 0]
    fy = feature_idx[..., 1]
    v = jnp.arange(features.shape[0])[None, None, :]
    return features[v, fy, fx]  # advanced indexing -> XLA gather


@partial(jax.jit, static_argnames=("padding", "height", "width"))
def compute_similarities(features, P, points, padding, height, width):
    """Per-ray depth distribution from multi-view feature agreement.

    Arguments
    ---------
        features: (V, Hf, Wf, F) feature maps (view 0 = reference view)
        P: (V, 3, 4) projection matrices
        points: (N, D, 3) depth-hypothesis points
        padding, height, width: static ints

    Returns
    -------
        S: (N, D) softmax depth distribution per ray
        (parity: feature_similarities.cu:66-124 — pair-mean then stable
        softmax over D).
    """
    n_views = features.shape[0]
    # Project every point into every view: (V, N*D, 2)
    flat_pts = points.reshape(-1, 3)
    pixels = project_points(P, flat_pts[None].repeat(n_views, axis=0))
    pixels = pixels.reshape(n_views, *points.shape[:2], 2)  # (V, N, D, 2)
    pixels = jnp.moveaxis(pixels, 0, 2)  # (N, D, V, 2)

    fidx = pixel_to_feature_idx(pixels, padding, height, width)
    f = gather_view_features(features, fidx)  # (N, D, V, F)
    # bf16 feature maps gather ~2.6x faster on TPU (row-overhead bound);
    # all arithmetic after the gather stays f32.
    f = f.astype(jnp.float32)

    sum_f = f.sum(axis=2)  # (N, D, F)
    sum_sq = (f * f).sum(axis=(2, 3))  # (N, D)
    pair_sum = 0.5 * ((sum_f * sum_f).sum(axis=-1) - sum_sq)

    n_pairs = (n_views * (n_views - 1)) // 2
    scores = pair_sum / n_pairs
    return jax.nn.softmax(scores, axis=-1)


def project_to_feature_idx(features, P, points, padding, height, width):
    """(N, D, V, 2) int32 feature indices for every point in every view."""
    n_views = features.shape[0]
    flat_pts = points.reshape(-1, 3)
    pixels = project_points(P, flat_pts[None].repeat(n_views, axis=0))
    pixels = pixels.reshape(n_views, *points.shape[:2], 2)
    pixels = jnp.moveaxis(pixels, 0, 2)
    return pixel_to_feature_idx(pixels, padding, height, width)


def compute_similarities_banded(
    features, P, points, padding, height, width, box_specs, interpret=False
):
    """compute_similarities via the banded Pallas kernel
    (ops/pallas/planesweep.py): ~11x the XLA gather path on v5e.

    ``points`` must be in ray TILE order (ops.pallas.planesweep.tile_order)
    with N a multiple of 128; ``box_specs`` from plan_band_specs/
    measure_box_specs. Returns S in the same (tile) row order.
    """
    from .pallas.planesweep import banded_similarities

    n_views = features.shape[0]
    fidx = project_to_feature_idx(
        features, P, points, padding, height, width
    )
    pair = banded_similarities(
        features, fidx, box_specs, height, width, points.shape[1],
        interpret=interpret,
    )
    n_pairs = (n_views * (n_views - 1)) // 2
    return jax.nn.softmax(pair / n_pairs, axis=-1)


def bands_fit(fidx, box_specs):
    """In-graph check that every block's band fits the static boxes (the
    banded kernel is only exact then; callers lax.cond to the XLA path
    otherwise)."""
    from .pallas.planesweep import compute_band_boxes

    mins, maxs = compute_band_boxes(fidx, fidx.shape[1])
    spans = maxs - mins  # (NB, G, V, 2) per-depth-group sub-boxes
    bh = jnp.asarray([s[0] for s in box_specs])
    # width in pixels that survives the 8-group origin snap + group packing
    bw_px = jnp.asarray([(s[1] - 8) * 4 - 3 for s in box_specs])
    fits_h = (spans[..., 0] + 1 <= bh[None, None, :]).all()
    fits_w = (spans[..., 1] + 1 <= bw_px[None, None, :]).all()
    return fits_h & fits_w


def compute_similarities_pairwise(features, P, points, padding, height, width):
    """Explicit pair-loop variant (einsum over view pairs) for tests that
    check the closed-form reduction against the reference's literal order.
    """
    n_views = features.shape[0]
    flat_pts = points.reshape(-1, 3)
    pixels = project_points(P, flat_pts[None].repeat(n_views, axis=0))
    pixels = pixels.reshape(n_views, *points.shape[:2], 2)
    pixels = jnp.moveaxis(pixels, 0, 2)

    fidx = pixel_to_feature_idx(pixels, padding, height, width)
    f = gather_view_features(features, fidx).astype(jnp.float32)

    gram = jnp.einsum("ndvf,ndwf->ndvw", f, f)
    iu = jnp.triu_indices(n_views, k=1)
    pair_sum = gram[..., iu[0], iu[1]].sum(axis=-1)
    n_pairs = (n_views * (n_views - 1)) // 2
    return jax.nn.softmax(pair_sum / n_pairs, axis=-1)
