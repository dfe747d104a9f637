"""Fused BP beam kernel vs the XLA path (interpret mode, CPU).

The kernel stores messages in slice-major slot order; comparisons use
order-insensitive views (scatter grids, depths, per-ray sorted message
multisets) plus a full two-sweep roundtrip.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raynet_tpu.ops.geometry import rays_from_pixel_idxs, rays_entry_exit_bbox
from raynet_tpu.ops.sampling import sample_points_along_segments
from raynet_tpu.ops.similarities import compute_similarities
from raynet_tpu.ops.ray_marching import (
    voxel_traversal_flat,
    unflatten_voxel_indices,
)
from raynet_tpu.ops.planes_voxels import planes_to_voxels_mapping
from raynet_tpu.ops import mrf
from raynet_tpu.ops.pallas.bp_beam import (
    plan_bp_config,
    bp_beam_message_step,
    bp_beam_depth_step,
)
from raynet_tpu.ops.pallas.planesweep import tile_order


H = W = 32
D = 8
GRID = (16, 16, 16)
M = 48
GAMMA = 0.05


@pytest.fixture(scope="module")
def geo():
    rng = np.random.RandomState(0)
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    c = np.array([0.5, -0.3, -10.0])
    z = -c / np.linalg.norm(c)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    t = -R @ c.reshape(3, 1)
    P = K @ np.hstack([R, t])
    P_pinv = np.linalg.pinv(P)
    bbox = np.array([-2, -2, -2, 2, 2, 2], np.float32)

    idxs = jnp.arange(H * W, dtype=jnp.int32)
    perm, _ = tile_order(idxs, H)
    idxs = idxs[perm]
    dirs = rays_from_pixel_idxs(
        idxs, jnp.asarray(P_pinv, jnp.float32),
        jnp.asarray(c, jnp.float32), H,
    )
    s, e = rays_entry_exit_bbox(
        dirs, jnp.asarray(c, jnp.float32),
        jnp.asarray(bbox[:3]), jnp.asarray(bbox[3:]),
    )
    pts = sample_points_along_segments(s, e, D)
    # half benign, half PEAKED rows: near-one-hot plane distributions
    # drive normalized hat values under the 1e-5 clip, covering the
    # normalize->clip->renormalize ordering (reviewed parity bug)
    n_half = (H * W) // 2
    S_planes = jnp.asarray(
        np.concatenate(
            [
                rng.dirichlet(np.ones(D), size=n_half),
                rng.dirichlet(np.full(D, 0.05), size=H * W - n_half),
            ]
        ),
        jnp.float32,
    )
    cfg = plan_bp_config(
        P_pinv, c, bbox, GRID, H, W, D, M, gamma=GAMMA, sample_stride=1
    )
    assert cfg is not None, "planner rejected the test geometry"
    return dict(
        start=s, end=e, S_planes=S_planes, cfg=cfg,
        center=jnp.asarray(c, jnp.float32), bbox=jnp.asarray(bbox),
        rng=rng,
    )


def _xla_sweep(geo, messages_step, grid_acc, first, grid=GRID, m=M):
    """Reference: traversal + mapping + bp_update in step space."""
    g = int(np.prod(grid))
    flat_idx, counts = voxel_traversal_flat(
        geo["bbox"], geo["start"], geo["end"], grid, m, False
    )
    vox = unflatten_voxel_indices(flat_idx, grid)
    S_vox = planes_to_voxels_mapping(
        geo["S_planes"], vox, counts, geo["start"], geo["end"],
        geo["bbox"], grid, D,
    )
    if first:
        msgs, scatter = mrf.bp_update_first(
            S_vox, flat_idx, counts, grid_acc[0], g
        )
    else:
        msgs, scatter = mrf.bp_update(
            S_vox, flat_idx, counts, messages_step, grid_acc, g
        )
    return msgs, scatter, S_vox, flat_idx, counts


def _sorted_rows(a):
    return np.sort(np.asarray(a), axis=1)


def _assert_mostly_close(a, b, rtol=2e-4, atol=2e-4, frac=0.998,
                         max_abs=0.05):
    """All-but-a-tail elementwise agreement: degenerate one-hot plane
    rows push messages to the +-12 log-odds rails where float32 rounding
    in a different summation order costs ~1e-2."""
    a, b = np.asarray(a), np.asarray(b)
    close = np.isclose(a, b, rtol=rtol, atol=atol)
    assert close.mean() >= frac, close.mean()
    assert np.abs(a - b).max() <= max_abs, np.abs(a - b).max()


def test_bp_beam_first_sweep_matches(geo):
    g = int(np.prod(GRID))
    n = H * W
    prior = float(np.log(GAMMA) - np.log(1 - GAMMA))
    grid_acc = jnp.full((g,), prior, jnp.float32)
    valid = jnp.ones((n,), jnp.int32)

    xla_msgs, xla_scatter, *_ = _xla_sweep(geo, None, grid_acc, True)

    msgs0 = jnp.zeros((n, geo["cfg"].slots), jnp.float32)
    k_msgs, k_scatter, overflow = bp_beam_message_step(
        geo["start"], geo["end"], valid, geo["S_planes"], msgs0,
        grid_acc, geo["center"], geo["bbox"], geo["cfg"],
        first_iteration=True, interpret=True,
    )
    assert float(overflow) == 0.0

    # peaked (near-one-hot) rows amplify ~1e-7 hat-parameter rounding to
    # ~1e-2 in log-odds messages; bound the tail instead of every element
    _assert_mostly_close(k_scatter, xla_scatter)
    _assert_mostly_close(_sorted_rows(k_msgs), _sorted_rows(xla_msgs))


def test_bp_beam_roundtrip_and_depth_match(geo):
    """Two message sweeps + the depth sweep, kernel vs XLA end to end."""
    g = int(np.prod(GRID))
    n = H * W
    prior = float(np.log(GAMMA) - np.log(1 - GAMMA))
    valid = jnp.ones((n,), jnp.int32)
    cfg = geo["cfg"]

    # XLA: two sweeps
    acc0 = jnp.full((g,), prior, jnp.float32)
    x_m1, x_s1, S_vox, flat_idx, counts = _xla_sweep(geo, None, acc0, True)
    acc1 = x_s1 + prior
    x_m2, x_s2, *_ = _xla_sweep(geo, x_m1, acc1, False)
    acc2 = x_s2 + prior
    x_Snew = mrf.depth_estimate(S_vox, flat_idx, counts, x_m2, acc2, g)
    from raynet_tpu.ops.ray_marching import voxel_centers

    centers = voxel_centers(
        unflatten_voxel_indices(flat_idx, GRID), geo["bbox"], GRID
    )
    best = jnp.argmax(x_Snew, axis=-1)
    bc = jnp.take_along_axis(centers, best[:, None, None], axis=1)[:, 0]
    x_depth = jnp.linalg.norm(bc - geo["center"][None], axis=-1)
    x_depth = np.where(np.asarray(counts) > 0, np.asarray(x_depth), 0.0)

    # kernel: two sweeps + depth
    msgs0 = jnp.zeros((n, cfg.slots), jnp.float32)
    k_m1, k_s1, ov1 = bp_beam_message_step(
        geo["start"], geo["end"], valid, geo["S_planes"], msgs0,
        acc0, geo["center"], geo["bbox"], cfg,
        first_iteration=True, interpret=True,
    )
    k_acc1 = k_s1 + prior
    k_m2, k_s2, ov2 = bp_beam_message_step(
        geo["start"], geo["end"], valid, geo["S_planes"], k_m1,
        k_acc1, geo["center"], geo["bbox"], cfg, interpret=True,
    )
    k_acc2 = k_s2 + prior
    k_depth, ov3 = bp_beam_depth_step(
        geo["start"], geo["end"], valid, geo["S_planes"], k_m2,
        k_acc2, geo["center"], geo["bbox"], cfg, interpret=True,
    )
    assert float(ov1) == float(ov2) == float(ov3) == 0.0

    _assert_mostly_close(k_s2, x_s2, rtol=1e-3, atol=1e-3)
    _assert_mostly_close(
        _sorted_rows(k_m2), _sorted_rows(x_m2), rtol=1e-3, atol=1e-3,
        max_abs=0.1,
    )
    close = np.isclose(
        np.asarray(k_depth), x_depth, rtol=1e-4, atol=1e-4
    )
    assert close.mean() > 0.995, (
        "depth mismatch beyond ties: %f" % close.mean()
    )


def test_bp_beam_negative_dominant_sign_flip(rng):
    """A camera on the +z side (rays marching -z) uses the mirror path;
    first-sweep scatter must still match the XLA reference."""
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    c = np.array([0.4, 0.2, 10.0])  # looking back toward -z
    z = -c / np.linalg.norm(c)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    t = -R @ c.reshape(3, 1)
    P = K @ np.hstack([R, t])
    P_pinv = np.linalg.pinv(P)
    bbox = np.array([-2, -2, -2, 2, 2, 2], np.float32)

    idxs = jnp.arange(H * W, dtype=jnp.int32)
    perm, _ = tile_order(idxs, H)
    idxs = idxs[perm]
    dirs = rays_from_pixel_idxs(
        idxs, jnp.asarray(P_pinv, jnp.float32), jnp.asarray(c, jnp.float32),
        H,
    )
    s, e = rays_entry_exit_bbox(
        dirs, jnp.asarray(c, jnp.float32), jnp.asarray(bbox[:3]),
        jnp.asarray(bbox[3:]),
    )
    S_planes = jnp.asarray(
        rng.dirichlet(np.ones(D), size=H * W), jnp.float32
    )
    cfg = plan_bp_config(
        P_pinv, c, bbox, GRID, H, W, D, M, gamma=GAMMA, sample_stride=1
    )
    assert cfg is not None and cfg.flip

    g = int(np.prod(GRID))
    prior = float(np.log(GAMMA) - np.log(1 - GAMMA))
    acc0 = jnp.full((g,), prior, jnp.float32)
    geo2 = dict(start=s, end=e, S_planes=S_planes, bbox=jnp.asarray(bbox))
    xla_msgs, xla_scatter, *_ = _xla_sweep(geo2, None, acc0, True)

    n = H * W
    k_msgs, k_scatter, overflow = bp_beam_message_step(
        s, e, jnp.ones((n,), jnp.int32), S_planes,
        jnp.zeros((n, cfg.slots), jnp.float32), acc0,
        jnp.asarray(c, jnp.float32), jnp.asarray(bbox), cfg,
        first_iteration=True, interpret=True,
    )
    assert float(overflow) == 0.0
    np.testing.assert_allclose(
        np.asarray(k_scatter), np.asarray(xla_scatter),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        _sorted_rows(k_msgs), _sorted_rows(xla_msgs), rtol=2e-4, atol=2e-4
    )


def test_bp_beam_filtered_ray_plan(geo):
    """Planning from an explicit (GT-filtered) tile-sorted ray subset: the
    blocks can span distant tiles, so the planner walks the actual blocks;
    the sweep must still match the XLA reference on those rays exactly."""
    rng = np.random.RandomState(7)
    n_full = H * W
    idxs = jnp.arange(n_full, dtype=jnp.int32)
    perm, _ = tile_order(idxs, H)
    tile_sorted = np.asarray(idxs[perm])
    # keep a random ~55% of rays (in tile order), like a GT mask would
    mask = rng.rand(n_full) < 0.55
    kept = tile_sorted[mask[tile_sorted]]

    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    c = np.array([0.5, -0.3, -10.0])
    z = -c / np.linalg.norm(c)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    t = -R @ c.reshape(3, 1)
    P = K @ np.hstack([R, t])
    P_pinv = np.linalg.pinv(P)
    bbox = np.asarray(geo["bbox"], np.float32)

    cfg = plan_bp_config(
        P_pinv, c, bbox, GRID, H, W, D, M, gamma=GAMMA, ray_idxs=kept
    )
    assert cfg is not None

    # pad the runtime batch the way the orchestrator does (repeat last ray)
    from raynet_tpu.ops.geometry import (
        rays_from_pixel_idxs as _rays, rays_entry_exit_bbox as _seg,
    )

    n_valid = len(kept)
    pad = (-n_valid) % 256
    batch = np.concatenate([kept, np.full(pad, kept[-1], np.int32)])
    dirs = _rays(
        jnp.asarray(batch), jnp.asarray(P_pinv, jnp.float32),
        jnp.asarray(c, jnp.float32), H,
    )
    s, e = _seg(
        dirs, jnp.asarray(c, jnp.float32),
        jnp.asarray(bbox[:3]), jnp.asarray(bbox[3:]),
    )
    n = len(batch)
    S_planes = jnp.asarray(
        np.random.RandomState(3).dirichlet(np.ones(D), size=n), jnp.float32
    )
    g = int(np.prod(GRID))
    prior = float(np.log(GAMMA) - np.log(1 - GAMMA))
    acc0 = jnp.full((g,), prior, jnp.float32)
    valid = (jnp.arange(n) < n_valid).astype(jnp.int32)

    geo2 = dict(start=s, end=e, S_planes=S_planes, bbox=jnp.asarray(bbox))
    x_msgs, x_scatter, S_vox, flat_idx, counts = _xla_sweep(
        geo2, None, acc0, True
    )
    # XLA path masks padded rays via counts
    counts_np = np.array(counts)
    counts_np[n_valid:] = 0

    k_msgs, k_scatter, overflow = bp_beam_message_step(
        s, e, valid, S_planes, jnp.zeros((n, cfg.slots), jnp.float32),
        acc0, jnp.asarray(c, jnp.float32), jnp.asarray(bbox), cfg,
        first_iteration=True, interpret=True,
    )
    assert float(overflow) == 0.0
    # compare only the valid rays' messages; scatter needs the XLA run
    # re-masked, so recompute it with zeroed padded counts
    x_msgs2, x_scatter2 = mrf.bp_update_first(
        S_vox, flat_idx, jnp.asarray(counts_np), acc0[0], g
    )
    np.testing.assert_allclose(
        np.asarray(k_scatter), np.asarray(x_scatter2), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        _sorted_rows(k_msgs[:n_valid]), _sorted_rows(x_msgs2[:n_valid]),
        rtol=2e-4, atol=2e-4,
    )


@pytest.mark.slow
def test_image_scan_matches_per_batch_steps(geo):
    """fused.raynet_image_update/raynet_image_depth (the per-image scan
    with PERM-layout grids and the aliased RMW scatter carry) must equal
    sequential per-batch beam steps + flat scatter adds."""
    from jax.experimental.pallas import tpu as pltpu
    from raynet_tpu.ops import fused

    cfg = geo["cfg"]
    g = int(np.prod(GRID))
    n = H * W
    batch = 512  # 2 chunks of 2 blocks each
    nb = n // batch
    prior = float(np.log(GAMMA) - np.log(1 - GAMMA))
    acc0 = jnp.full((g,), prior, jnp.float32)
    msgs0 = jnp.zeros((n, cfg.slots), jnp.float32)
    valid = jnp.ones((n,), jnp.int32)

    # reference: sequential per-batch steps
    ref_msgs = []
    ref_scatter = jnp.full((g,), prior, jnp.float32)
    for c in range(nb):
        sl = slice(c * batch, (c + 1) * batch)
        m, s, ov = bp_beam_message_step(
            geo["start"][sl], geo["end"][sl], valid[sl],
            geo["S_planes"][sl], msgs0[sl], acc0,
            geo["center"], geo["bbox"], cfg,
            first_iteration=True, interpret=True,
        )
        assert float(ov) == 0.0
        ref_msgs.append(np.asarray(m))
        ref_scatter = ref_scatter + s
    ref_msgs = np.concatenate(ref_msgs)

    # scan path needs ray indices; rebuild the tile-sorted index list the
    # fixture used and a camera P_pinv consistent with geo's segments
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    c0 = np.array([0.5, -0.3, -10.0])
    z = -c0 / np.linalg.norm(c0)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    P1 = K @ np.hstack([R, -R @ c0.reshape(3, 1)])
    P_pinv = jnp.asarray(np.linalg.pinv(P1), jnp.float32)
    idxs = jnp.arange(n, dtype=jnp.int32)
    perm, _ = tile_order(idxs, H)
    idxs = idxs[perm]
    chunks = idxs.reshape(nb, batch)
    n_valids = jnp.full((nb,), batch, jnp.int32)
    Pms = jnp.asarray(np.stack([P1] * 3), jnp.float32)
    feats = jnp.zeros((3, H + 12, W + 12, 32), jnp.bfloat16)

    with pltpu.force_tpu_interpret_mode():
        # msgs arg is DONATED — pass a fresh copy, msgs0 is reused below
        # beam message stores are kernel-NATIVE (blocks, slots, RAYS)
        out_msgs, out_scores, out_scatter, ov = fused.raynet_image_update(
            jnp.zeros((n // cfg.rays, cfg.slots, cfg.rays), jnp.float32),
            geo["S_planes"], jnp.full((g,), prior, jnp.float32),
            acc0, chunks, n_valids, feats, Pms, P_pinv, geo["center"],
            geo["bbox"],
            batch=batch, height=H, width=W, padding=11,
            depth_planes=D, grid_shape=GRID, max_voxels=M,
            bp_cfg=cfg, band_specs=None, first_iteration=False,
            use_scores=True, use_pallas=False,
        )
    assert float(ov) == 0.0
    np.testing.assert_allclose(
        np.asarray(out_scatter), np.asarray(ref_scatter),
        rtol=1e-4, atol=1e-4,
    )
    # NOTE first_iteration=False with zero messages equals the
    # first-iteration specialization only through the gather; compare the
    # scan against the same-mode per-batch reference instead:
    ref2 = []
    ref2_scatter = jnp.full((g,), prior, jnp.float32)
    for c in range(nb):
        sl = slice(c * batch, (c + 1) * batch)
        m, s, ov2 = bp_beam_message_step(
            geo["start"][sl], geo["end"][sl], valid[sl],
            geo["S_planes"][sl], msgs0[sl], acc0,
            geo["center"], geo["bbox"], cfg,
            first_iteration=False, interpret=True,
        )
        ref2.append(np.asarray(m))
        ref2_scatter = ref2_scatter + s
    np.testing.assert_allclose(
        np.asarray(out_scatter), np.asarray(ref2_scatter),
        rtol=1e-4, atol=1e-4,
    )
    out_msgs_rays = np.asarray(out_msgs).transpose(0, 2, 1).reshape(
        n, cfg.slots
    )
    np.testing.assert_allclose(
        out_msgs_rays, np.concatenate(ref2), rtol=1e-4, atol=1e-4
    )

    # depth sweep through the scan vs per-batch
    with pltpu.force_tpu_interpret_mode():
        depths, bad = fused.raynet_image_depth(
            out_msgs, geo["S_planes"], ref2_scatter, chunks, feats, Pms,
            P_pinv, geo["center"], geo["bbox"],
            batch=batch, height=H, width=W, padding=11,
            depth_planes=D, grid_shape=GRID, max_voxels=M,
            bp_cfg=cfg, band_specs=None, use_scores=True,
            use_pallas=False,
        )
    assert float(bad) == 0.0
    ref_depth = []
    for c in range(nb):
        sl = slice(c * batch, (c + 1) * batch)
        d_, ov3 = bp_beam_depth_step(
            geo["start"][sl], geo["end"][sl], valid[sl],
            geo["S_planes"][sl], jnp.asarray(out_msgs_rays)[sl],
            ref2_scatter,
            geo["center"], geo["bbox"], cfg, interpret=True,
        )
        ref_depth.append(np.asarray(d_))
    close = np.isclose(
        np.asarray(depths).reshape(-1), np.concatenate(ref_depth),
        rtol=1e-4, atol=1e-4,
    )
    assert close.mean() > 0.995


def test_bp_beam_padded_rays_masked(geo):
    """Invalid (padded) rays must contribute nothing to the scatter."""
    g = int(np.prod(GRID))
    n = H * W
    prior = float(np.log(GAMMA) - np.log(1 - GAMMA))
    acc0 = jnp.full((g,), prior, jnp.float32)
    cfg = geo["cfg"]
    msgs0 = jnp.zeros((n, cfg.slots), jnp.float32)

    valid_all = jnp.ones((n,), jnp.int32)
    _, s_all, _ = bp_beam_message_step(
        geo["start"], geo["end"], valid_all, geo["S_planes"], msgs0,
        acc0, geo["center"], geo["bbox"], cfg,
        first_iteration=True, interpret=True,
    )
    valid_half = (jnp.arange(n) < n // 2).astype(jnp.int32)
    m_half, s_half, _ = bp_beam_message_step(
        geo["start"], geo["end"], valid_half, geo["S_planes"], msgs0,
        acc0, geo["center"], geo["bbox"], cfg,
        first_iteration=True, interpret=True,
    )
    # messages of masked rays are zero; scatter only counts the valid half
    assert np.all(np.asarray(m_half)[n // 2:] == 0)
    assert float(jnp.abs(s_half).sum()) < float(jnp.abs(s_all).sum())


@pytest.mark.slow
def test_bp_beam_block_classes(geo):
    """Per-block box classes: blocks reordered small-first, the two class
    segments scan with their own static configs against a shared store,
    and the result equals the single-(large)-config scan."""
    from jax.experimental.pallas import tpu as pltpu
    from raynet_tpu.ops import fused
    from raynet_tpu.ops.pallas.bp_beam import plan_bp_classes
    from raynet_tpu.inference.forward_pass import RayNetForwardPass

    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    c0 = np.array([0.5, -0.3, -10.0])
    z = -c0 / np.linalg.norm(c0)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    P1 = K @ np.hstack([R, -R @ c0.reshape(3, 1)])
    P_pinv = np.linalg.pinv(P1)
    bbox = np.asarray(geo["bbox"], np.float32)

    info = plan_bp_classes(
        P_pinv, c0, bbox, GRID, H, W, D, M, gamma=GAMMA,
        min_rows_ratio=1.0, small_quantile=0.5,
    )
    assert info is not None
    if info["cfg_small"] is None:
        # force a split for the mechanics test: call the reorder with a
        # synthetic mask and run both segments with the SAME cfg
        nb = (H * W) // info["cfg_large"].rays
        mask = np.zeros(nb, bool)
        mask[: nb // 2] = True
        info = dict(
            cfg_large=info["cfg_large"], cfg_small=info["cfg_large"],
            small_mask=mask,
        )
    cfg_s, cfg_l = info["cfg_small"], info["cfg_large"]
    assert cfg_s.slots == cfg_l.slots

    batch = 512
    idxs = jnp.arange(H * W, dtype=jnp.int32)
    perm, _ = tile_order(idxs, H)
    base = np.asarray(idxs[perm])
    new_idxs, nsb, nchunks = RayNetForwardPass._reorder_blocks_by_class(
        base, info["small_mask"], cfg_l.rays, batch
    )
    assert nchunks * batch == len(new_idxs)
    dec = np.where(new_idxs < 0, -new_idxs - 1, new_idxs)
    assert set(dec) == set(base)  # every ray still present

    g = int(np.prod(GRID))
    prior = float(np.log(GAMMA) - np.log(1 - GAMMA))
    acc0 = jnp.full((g,), prior, jnp.float32)
    chunks = jnp.asarray(new_idxs).reshape(nchunks, batch)
    n_valids = jnp.full((nchunks,), batch, jnp.int32)
    Pms = jnp.asarray(np.stack([P1] * 3), jnp.float32)
    feats = jnp.zeros((3, H + 12, W + 12, 32), jnp.bfloat16)
    n_rows = nchunks * batch
    S_all = jnp.asarray(
        np.random.RandomState(5).dirichlet(np.ones(D), size=n_rows),
        jnp.float32,
    )

    def run(segments):
        msgs = jnp.zeros(
            (n_rows // cfg_l.rays, cfg_l.slots, cfg_l.rays), jnp.float32
        )
        scat = jnp.full((g,), prior, jnp.float32)
        ovs = 0.0
        with pltpu.force_tpu_interpret_mode():
            for seg_cfg, c0_, c1_ in segments:
                offs = jnp.asarray(
                    np.arange(c0_, c1_, dtype=np.int32) * batch
                )
                msgs, _, scat, ov = fused.raynet_image_update(
                    msgs, S_all, scat, acc0,
                    chunks[c0_:c1_], n_valids[c0_:c1_],
                    feats, Pms, jnp.asarray(P_pinv, jnp.float32),
                    jnp.asarray(c0, jnp.float32), jnp.asarray(bbox),
                    offs,
                    batch=batch, height=H, width=W, padding=11,
                    depth_planes=D, grid_shape=GRID, max_voxels=M,
                    bp_cfg=seg_cfg, band_specs=None,
                    first_iteration=True, use_scores=True,
                    use_pallas=False,
                )
                ovs += float(ov)
        return msgs, scat, ovs

    segs_cls = [(cfg_s, 0, nsb)] + (
        [(cfg_l, nsb, nchunks)] if nsb < nchunks else []
    )
    m_cls, s_cls, ov_cls = run(segs_cls)
    m_ref, s_ref, ov_ref = run([(cfg_l, 0, nchunks)])
    assert ov_cls == 0.0 and ov_ref == 0.0
    np.testing.assert_allclose(
        np.asarray(s_cls), np.asarray(s_ref), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(m_cls), np.asarray(m_ref), rtol=1e-4, atol=1e-4
    )


def test_bp_beam_bbox_miss_rays(rng):
    """An OBLIQUE wide-FOV camera whose corner rays miss the bbox with
    sign-flipped slab garbage: the planner must still accept (miss rays
    are zero-length segments excluded from the dominant-sign/K/span
    statistics — the round-2 planner rejected every such rig as
    "mixed-dominant-sign"), and the kernel must agree with the XLA path
    with misses present (dead lanes: no emissions, no origin drag)."""
    K = np.array([[22.0, 0, W / 2], [0, 22.0, H / 2], [0, 0, 1]])
    c = np.array([5.5, 2.2, -6.0])  # oblique: slab t's straddle zero
    z = -c / np.linalg.norm(c)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    t = -R @ c.reshape(3, 1)
    P = K @ np.hstack([R, t])
    P_pinv = np.linalg.pinv(P)
    bbox = np.array([-2, -2, -2, 2, 2, 2], np.float32)

    idxs = jnp.arange(H * W, dtype=jnp.int32)
    perm, _ = tile_order(idxs, H)
    idxs = idxs[perm]
    dirs = rays_from_pixel_idxs(
        idxs, jnp.asarray(P_pinv, jnp.float32), jnp.asarray(c, jnp.float32),
        H,
    )
    s, e = rays_entry_exit_bbox(
        dirs, jnp.asarray(c, jnp.float32), jnp.asarray(bbox[:3]),
        jnp.asarray(bbox[3:]),
    )
    miss = np.asarray(jnp.all(s == e, axis=1))
    assert 0.05 < miss.mean() < 0.95, (
        "fixture should mix hits and misses, got %.2f" % miss.mean()
    )
    # miss segments collapse to a point on the ray OUTSIDE the bbox
    sm = np.asarray(s)[miss]
    assert (
        (sm < bbox[:3] - 1e-6) | (sm > bbox[3:] + 1e-6)
    ).any(axis=1).all()

    cfg = plan_bp_config(
        P_pinv, c, bbox, GRID, H, W, D, M, gamma=GAMMA, sample_stride=1
    )
    assert cfg is not None, "planner rejected a rig with bbox misses"

    S_planes = jnp.asarray(
        rng.dirichlet(np.ones(D), size=H * W), jnp.float32
    )
    g = int(np.prod(GRID))
    prior = float(np.log(GAMMA) - np.log(1 - GAMMA))
    acc0 = jnp.full((g,), prior, jnp.float32)
    geo2 = dict(start=s, end=e, S_planes=S_planes, bbox=jnp.asarray(bbox))
    xla_msgs, xla_scatter, *_ = _xla_sweep(geo2, None, acc0, True)

    n = H * W
    k_msgs, k_scatter, overflow = bp_beam_message_step(
        s, e, jnp.ones((n,), jnp.int32), S_planes,
        jnp.zeros((n, cfg.slots), jnp.float32), acc0,
        jnp.asarray(c, jnp.float32), jnp.asarray(bbox), cfg,
        first_iteration=True, interpret=True,
    )
    assert float(overflow) == 0.0
    _assert_mostly_close(k_scatter, xla_scatter)
    # slots (S*K) != M here: compare zero-padded sorted multisets
    km = np.asarray(k_msgs)
    xm = np.asarray(xla_msgs)
    wmax = max(km.shape[1], xm.shape[1])
    km = np.pad(km, ((0, 0), (0, wmax - km.shape[1])))
    xm = np.pad(xm, ((0, 0), (0, wmax - xm.shape[1])))
    _assert_mostly_close(_sorted_rows(km), _sorted_rows(xm))


def _acceptance_rig(azim, elev, h, w, focal=550.0, radius=16.0):
    Kr = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]])
    c = radius * np.array(
        [np.cos(elev) * np.sin(azim), np.sin(elev),
         -np.cos(elev) * np.cos(azim)]
    )
    z = -c / np.linalg.norm(c)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    return (
        np.linalg.pinv(Kr @ np.hstack([R, -R @ c.reshape(3, 1)])), c
    )


def test_planner_accepts_bench_rig_sweep():
    """The bench's planner_acceptance sweep (azimuths incl. the 45-deg
    diagonals x elevations up to 60 deg, ring/oblique/elevated/mirrored
    DTU-like rigs) must plan exact beam configs at every geometry —
    guards the round-3 acceptance fixes (bbox-miss segment collapse,
    hits-only statistics, sign handling, per-block box classes) on CPU
    at reduced resolution. The diagonal azimuths are the historical
    k-cap/ba-cap failures: dominant-axis-ambiguous viewing needs the
    extended BA buckets and the per-block class split."""
    from raynet_tpu.ops.pallas.bp_beam import plan_bp_classes

    h, w = 128, 160

    rejected = []
    for azim_d in (0, 30, 45, 60, 90, 135, 150, 180, 210, 225, 270,
                   315, 330):
        for elev_d in (0, 25, 55):
            pp, cc = _acceptance_rig(
                np.radians(azim_d), np.radians(elev_d), h, w
            )
            info = plan_bp_classes(
                pp, cc, np.asarray([-3, -3, -3, 3, 3, 3], float),
                (64, 64, 32), h, w, 16, 192, rays=512,
            )
            if info is None:
                rejected.append((azim_d, elev_d))
    assert not rejected, "planner rejected rigs: %r" % (rejected,)


def test_planner_rejects_inside_bbox_camera_cleanly():
    """The documented acceptance bound (docs/performance.md): a WIDE-FOV
    camera inside the scene bbox sees voxels along BOTH signs of the
    dominant axis — the planner must REJECT these cleanly (caller keeps
    the exact XLA path), never return a config that would overflow at
    runtime. Outside-looking-in rigs (every DTU/Restrepo camera) are
    covered by the acceptance sweep above."""
    from raynet_tpu.ops.pallas.bp_beam import (
        plan_bp_classes, plan_bp_config,
    )

    h, w = 128, 160
    # bbox half-extent 3, camera INSIDE at radius 1 with a ~106-deg FOV
    pp, cc = _acceptance_rig(
        np.radians(0), np.radians(20), h, w, focal=60.0, radius=1.0
    )
    info = plan_bp_classes(
        pp, cc, np.asarray([-3, -3, -3, 3, 3, 3], float),
        (64, 64, 32), h, w, 16, 192, rays=512,
    )
    assert info is None
    cfg, reason = plan_bp_config(
        pp, cc, np.asarray([-3, -3, -3, 3, 3, 3], float),
        (64, 64, 32), h, w, 16, 192, rays=512, explain=True,
    )
    assert cfg is None
    assert reason == "mixed-dominant-sign"


def test_planner_quality_bounds_at_canonical_rig():
    """Loose quality bounds at a DTU-like frontal rig (full-res bench
    geometry scaled down): the small class must stay snap-aware-tight
    (rows well under the cover-all worst case) and cover most blocks.
    Catches planner regressions that coarse acceptance tests miss
    (e.g. losing snap-aware needs) without pinning exact bucket
    values."""
    from raynet_tpu.ops.pallas.bp_beam import plan_bp_classes

    h, w = 180, 320
    K = np.array([[1100.0, 0, w / 2], [0, 1100.0, h / 2], [0, 0, 1]])
    c = 16.0 * np.array([np.sin(-0.08), 0.0, -np.cos(-0.08)])
    z = -c / np.linalg.norm(c)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    pp = np.linalg.pinv(K @ np.hstack([R, -R @ c.reshape(3, 1)]))
    info = plan_bp_classes(
        pp, c, np.asarray([-3, -3, -3, 3, 3, 3], float),
        (128, 128, 64), h, w, 32, 384, rays=512,
    )
    assert info is not None
    cl, cs, mask = info["cfg_large"], info["cfg_small"], info["small_mask"]
    # most blocks must run with a TIGHT windowed config: either the
    # cover-all itself is tight (snap-aware needs keep it at ns=1 and
    # few one-hot rows, no split required) or a small class covering
    # >=50% of blocks is
    eff = cs if cs is not None else cl
    if cs is not None:
        assert mask.mean() >= 0.5, float(mask.mean())
    assert eff.rows <= 64, (eff.BA, eff.nstripe, eff.rows)


def test_vmem_model_cost_model_and_rays_candidates():
    """Scoped-VMEM model + rays-per-block candidate selection.

    Calibration anchor: a 2048-ray bench config (S=128, K=3, BA=32,
    ns=2, D=32) the v5e Mosaic compiler measured at 24.62 MiB scoped
    VMEM (OOM against its 16 MiB limit, 2026-08-19); the model must
    land at-or-above that on the conservative side, and the adopted
    1024-ray config must fit the planner's budget."""
    from raynet_tpu.ops.pallas.bp_beam import (
        _SCOPED_VMEM_LIMIT,
        BpBeamConfig,
        est_scoped_vmem,
        plan_cost_ms,
        rays_candidates,
    )

    est = est_scoped_vmem(128, 3, 32, 2, 32, 2048)
    assert 24.62 * 2**20 <= est <= 26.5 * 2**20, est / 2**20
    assert est <= _SCOPED_VMEM_LIMIT  # 2048-ray blocks fit the raised ceiling
    # candidates: largest first, top two, divisibility respected
    assert rays_candidates(61440) == [1024, 512]
    assert rays_candidates(512 * 3) == [512, 256]
    assert rays_candidates(256) == [256]
    # non-multiple-of-256 units fall back to a padded 256 plan instead
    # of silently planning nothing (ADVICE r4)
    assert rays_candidates(1000) == [256]
    assert rays_candidates(100) == []

    def mk(ba, ns, rays):
        return BpBeamConfig(
            (2, 0, 1), 128, 256, 256, 3, ba, ns, 32, 650,
            (0.05, 0.05, 0.05), -2.9, (256, 256, 128), rays=rays,
        )

    # bigger blocks amortize per-block overheads at equal rows (device
    # A/B 2026-08-19: 11.75 / 10.72 / 10.18 ms at 256/512/1024) ...
    assert plan_cost_ms(mk(32, 2, 1024)) < plan_cost_ms(mk(32, 2, 512))
    # ... but a box-bucket jump from the wider footprint overrides it
    assert plan_cost_ms(mk(48, 2, 1024)) > plan_cost_ms(mk(32, 2, 512))


def test_plan_auto_variants(geo):
    """The auto planners pick a viable candidate and respect the unit's
    divisibility; the classes_auto result carries the same contract as
    plan_bp_classes."""
    from raynet_tpu.ops.pallas.bp_beam import (
        classes_cost_ms,
        plan_bp_classes_auto,
        plan_bp_config_auto,
        plan_cost_ms,
    )

    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    c = np.array([0.5, -0.3, -10.0])
    z = -c / np.linalg.norm(c)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    pp = np.linalg.pinv(K @ np.hstack([R, -R @ c.reshape(3, 1)]))
    bbox = np.array([-2, -2, -2, 2, 2, 2], float)

    cfg = plan_bp_config_auto(
        pp, c, bbox, GRID, H, W, D, M, 768, gamma=GAMMA, sample_stride=1
    )
    assert cfg is not None and cfg.rays in (512, 256)
    assert plan_cost_ms(cfg) > 0

    # explain=True changes plan_bp_config's return TYPE; the auto
    # selector must reject it loudly rather than mis-select (ADVICE r4)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="explain"):
        plan_bp_config_auto(
            pp, c, bbox, GRID, H, W, D, M, 768, gamma=GAMMA, explain=True
        )

    info = plan_bp_classes_auto(pp, c, bbox, GRID, H, W, D, M, 1024)
    assert info is not None
    assert info["cfg_large"].rays in (1024, 512)
    assert classes_cost_ms(info) > 0


def test_bp_beam_odd_group_count_serial_fallback(rng):
    """A dominant extent of 8 gives ONE 8-slice group (NG=1), which the
    paired double-buffered RMW schedule cannot cover — the kernel must
    take the serial read/write fallback and still match XLA on a sweep
    WITH a scatter (the paired/serial split lives in pass R2)."""
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    c = np.array([0.5, -0.3, -10.0])
    z = -c / np.linalg.norm(c)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    P_pinv = np.linalg.pinv(K @ np.hstack([R, -R @ c.reshape(3, 1)]))
    bbox = np.array([-2, -2, -2, 2, 2, 2], np.float32)
    grid = (16, 16, 8)  # dominant z extent 8 -> NG = 1 (odd)

    idxs = jnp.arange(H * W, dtype=jnp.int32)
    perm, _ = tile_order(idxs, H)
    idxs = idxs[perm]
    dirs = rays_from_pixel_idxs(
        idxs, jnp.asarray(P_pinv, jnp.float32),
        jnp.asarray(c, jnp.float32), H,
    )
    s, e = rays_entry_exit_bbox(
        dirs, jnp.asarray(c, jnp.float32), jnp.asarray(bbox[:3]),
        jnp.asarray(bbox[3:]),
    )
    S_planes = jnp.asarray(
        rng.dirichlet(np.ones(D), size=H * W), jnp.float32
    )
    cfg = plan_bp_config(
        P_pinv, c, bbox, grid, H, W, D, M, gamma=GAMMA, sample_stride=1
    )
    assert cfg is not None and cfg.S == 8, cfg

    g = int(np.prod(grid))
    prior = float(np.log(GAMMA) - np.log(1 - GAMMA))
    acc0 = jnp.full((g,), prior, jnp.float32)
    geo2 = dict(start=s, end=e, S_planes=S_planes, bbox=jnp.asarray(bbox))
    x_m1, x_s1, *_ = _xla_sweep(geo2, None, acc0, True, grid=grid)

    n = H * W
    valid = jnp.ones((n,), jnp.int32)
    k_m1, k_s1, overflow = bp_beam_message_step(
        s, e, valid, S_planes, jnp.zeros((n, cfg.slots), jnp.float32),
        acc0, jnp.asarray(c, jnp.float32), jnp.asarray(bbox), cfg,
        first_iteration=True, interpret=True,
    )
    assert float(overflow) == 0.0
    _assert_mostly_close(k_s1, x_s1)

    # second sweep: occupancy gather + serial-fallback scatter together
    x_m2, x_s2, *_ = _xla_sweep(geo2, x_m1, x_s1 + prior, False, grid=grid)
    k_m2, k_s2, overflow2 = bp_beam_message_step(
        s, e, valid, S_planes, k_m1, k_s1 + prior,
        jnp.asarray(c, jnp.float32), jnp.asarray(bbox), cfg,
        first_iteration=False, interpret=True,
    )
    assert float(overflow2) == 0.0
    _assert_mostly_close(k_s2, x_s2)
    # slot-space width (S*K=24) != step-space width (M=48) here: pad the
    # narrower with zeros (dead slots/steps are zero on both sides)
    k_pad = np.zeros((H * W, M), np.float32)
    k_pad[:, : cfg.slots] = np.asarray(k_m2)
    _assert_mostly_close(_sorted_rows(k_pad), _sorted_rows(x_m2))


def test_device_planner_matches_native(monkeypatch):
    """The device (XLA) planner march must derive the same beam configs
    as the native/numpy f64 planner: same dom/flip/K and block needs
    within the shared +-2-cell snap budget (here: exactly equal on the
    test rig). Runs the device programs on the CPU backend."""
    from raynet_tpu.ops.pallas import bp_beam as bb

    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]])
    c = np.array([0.5, -0.3, -10.0])
    z = -c / np.linalg.norm(c)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    pp = np.linalg.pinv(K @ np.hstack([R, -R @ c.reshape(3, 1)]))
    bbox = np.array([-2, -2, -2, 2, 2, 2], float)

    monkeypatch.setenv("RAYNET_DEVICE_PLANNER", "1")
    dev_info = bb.plan_bp_classes_auto(
        pp, c, bbox, GRID, H, W, D, M, 1024
    )
    dev_cfg = bb.plan_bp_config_auto(
        pp, c, bbox, GRID, H, W, D, M, 768, gamma=GAMMA, sample_stride=1
    )
    monkeypatch.setenv("RAYNET_DEVICE_PLANNER", "0")
    nat_info = bb.plan_bp_classes_auto(
        pp, c, bbox, GRID, H, W, D, M, 1024
    )
    nat_cfg = bb.plan_bp_config_auto(
        pp, c, bbox, GRID, H, W, D, M, 768, gamma=GAMMA, sample_stride=1
    )

    assert (dev_info is None) == (nat_info is None)
    if dev_info is not None:
        assert dev_info["cfg_large"] == nat_info["cfg_large"]
        assert dev_info["cfg_small"] == nat_info["cfg_small"]
        np.testing.assert_array_equal(
            dev_info["small_mask"], nat_info["small_mask"]
        )
    assert (dev_cfg is None) == (nat_cfg is None)
    if dev_cfg is not None:
        assert dev_cfg == nat_cfg

    # more rigs: flipped dominant sign (+z camera), oblique azimuth,
    # and a GT-filtered ray subset
    rigs = [
        np.array([0.4, 0.2, 10.0]),   # flip path
        np.array([8.0, 2.0, -4.0]),   # oblique azimuth, clear dominant
    ]
    for cc in rigs:
        z2 = -cc / np.linalg.norm(cc)
        x2 = np.cross([0, 1, 0], z2)
        x2 /= np.linalg.norm(x2)
        y2 = np.cross(z2, x2)
        R2 = np.stack([x2, y2, z2])
        pp2 = np.linalg.pinv(K @ np.hstack([R2, -R2 @ cc.reshape(3, 1)]))
        sub = np.arange(0, H * W, 2, dtype=np.int32)  # filtered subset
        for ridx in (None, sub):
            monkeypatch.setenv("RAYNET_DEVICE_PLANNER", "1")
            d = bb.plan_bp_classes_auto(
                pp2, cc, bbox, GRID, H, W, D, M, 1024, ray_idxs=ridx
            )
            monkeypatch.setenv("RAYNET_DEVICE_PLANNER", "0")
            nt = bb.plan_bp_classes_auto(
                pp2, cc, bbox, GRID, H, W, D, M, 1024, ray_idxs=ridx
            )
            assert (d is None) == (nt is None), (cc, ridx is None)
            if d is not None:
                assert d["cfg_large"] == nt["cfg_large"], (cc, ridx is None)
                assert d["cfg_small"] == nt["cfg_small"], (cc, ridx is None)

    # rejection parity on a mixed-dominant-sign rig (inside-bbox camera)
    cc = np.array([0.1, 0.1, -0.5])
    z2 = -cc / np.linalg.norm(cc)
    x2 = np.cross([0, 1, 0], z2)
    x2 /= np.linalg.norm(x2)
    y2 = np.cross(z2, x2)
    R2 = np.stack([x2, y2, z2])
    K2 = np.array([[8.0, 0, W / 2], [0, 8.0, H / 2], [0, 0, 1]])
    pp2 = np.linalg.pinv(K2 @ np.hstack([R2, -R2 @ cc.reshape(3, 1)]))
    monkeypatch.setenv("RAYNET_DEVICE_PLANNER", "1")
    st_dev, reason_dev = bb._plan_prologue(
        pp2, cc, bbox, GRID, H, W, None, 256, 8, sample_stride=1
    )
    monkeypatch.setenv("RAYNET_DEVICE_PLANNER", "0")
    st_nat, reason_nat = bb._plan_prologue(
        pp2, cc, bbox, GRID, H, W, None, 256, 8, sample_stride=1
    )
    assert (st_dev is None) == (st_nat is None)
    assert reason_dev == reason_nat


def test_plan_prefetch_parity(monkeypatch):
    """prefetch_view_plans + the per-view planners must produce exactly
    the configs/specs of direct per-view calls (the prefetcher only
    reorders WHEN the same device programs run and how their results
    come back), and every prefetched entry must be consumed."""
    from raynet_tpu.ops.pallas import bp_beam as bb
    from raynet_tpu.ops.pallas import planesweep as ps
    from raynet_tpu.ops import bp_plan_device as bpd
    from raynet_tpu.ops.plan_prefetch import prefetch_view_plans

    h, w = 90, 120
    grid = (32, 32, 16)
    dpl, mv, unit = 8, 48, 1024
    bbox = np.array([-3, -3, -3, 3, 3, 3], float)

    def rig(i):
        K = np.array([[200.0, 0, w / 2], [0, 200.0, h / 2], [0, 0, 1]])
        ang = (i - 1) * 0.05
        c = np.array([16.0 * np.sin(ang), 0.0, -16.0 * np.cos(ang)])
        z = -c / np.linalg.norm(c)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        P = K @ np.hstack([R, -R @ c.reshape(3, 1)])
        return (
            np.stack([P] * 5).astype(np.float32),
            np.linalg.pinv(P).astype(np.float32),
            c.astype(np.float32),
        )

    monkeypatch.setenv("RAYNET_DEVICE_PLANNER", "1")
    assert len(bb.rays_candidates(unit)) > 1  # the prefetched path

    base_cls, base_bands = [], []
    for i in range(3):
        P, pp, c = rig(i)
        base_cls.append(
            bb.plan_bp_classes_auto(pp, c, bbox, grid, h, w, dpl, mv, unit)
        )
        base_bands.append(
            ps.plan_band_specs(
                P, pp, c, np.asarray(bbox, np.float32), h, w, 11, dpl
            )
        )

    cams = [rig(i) for i in range(3)]
    n = prefetch_view_plans(cams, bbox, grid, h, w, 11, dpl, unit)
    assert n == 3
    assert len(bpd._STATE_PREFETCH) == 3
    assert len(ps._SPANS_PREFETCH) == 3
    for i in range(3):
        P, pp, c = cams[i]
        got = bb.plan_bp_classes_auto(
            pp, c, bbox, grid, h, w, dpl, mv, unit
        )
        bands = ps.plan_band_specs(
            P, pp, c, np.asarray(bbox, np.float32), h, w, 11, dpl
        )
        ref = base_cls[i]
        assert (got is None) == (ref is None)
        if ref is not None:
            assert got["cfg_large"] == ref["cfg_large"]
            assert got["cfg_small"] == ref["cfg_small"]
            np.testing.assert_array_equal(
                got["small_mask"], ref["small_mask"]
            )
        assert bands == base_bands[i]
    # one-shot: everything consumed
    assert not bpd._STATE_PREFETCH
    assert not ps._SPANS_PREFETCH


def test_plan_prefetch_rejection_parity(monkeypatch):
    """A rig the planner rejects (mixed dominant sign: camera inside
    the bbox) must flow through the prefetcher with the same rejection
    the direct path produces — stored once, popped once."""
    from raynet_tpu.ops.pallas import bp_beam as bb
    from raynet_tpu.ops import bp_plan_device as bpd
    from raynet_tpu.ops.plan_prefetch import prefetch_view_plans

    h, w = 64, 64
    grid = (16, 16, 16)
    dpl, mv, unit = 8, 48, 1024
    bbox = np.array([-2, -2, -2, 2, 2, 2], float)
    cc = np.array([0.1, 0.1, -0.5])
    z = -cc / np.linalg.norm(cc)
    x = np.cross([0, 1, 0], z)
    x /= np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])
    K = np.array([[8.0, 0, w / 2], [0, 8.0, h / 2], [0, 0, 1]])
    P = K @ np.hstack([R, -R @ cc.reshape(3, 1)])
    pp = np.linalg.pinv(P).astype(np.float32)
    cams = [(np.stack([P] * 5).astype(np.float32), pp,
             cc.astype(np.float32))]

    monkeypatch.setenv("RAYNET_DEVICE_PLANNER", "1")
    direct = bb.plan_bp_classes_auto(
        pp, cams[0][2], bbox, grid, h, w, dpl, mv, unit
    )
    n = prefetch_view_plans(cams, bbox, grid, h, w, 11, dpl, unit,
                            spans=False)
    assert n == 1
    pre = bb.plan_bp_classes_auto(
        pp, cams[0][2], bbox, grid, h, w, dpl, mv, unit
    )
    assert (direct is None) == (pre is None)
    assert not bpd._STATE_PREFETCH  # consumed even on rejection
