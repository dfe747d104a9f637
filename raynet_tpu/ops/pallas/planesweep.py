"""Pallas TPU kernel: banded plane-sweep similarity scoring.

The reference scores every (ray, depth, view) by gathering a feature row and
accumulating pair dot products (feature_similarities.cu:66-124). On TPU the
XLA gather is instruction-rate bound at ~15 ns/row regardless of row width —
42M rows per image sweep was the round-1 headline gap (0.28x the reference's
plane-sweep throughput).

This kernel exploits two structural facts measured on the workload:
1. The D depth hypotheses of one ray project into a view along a SHORT
   epipolar segment (x-span p50 of 7-25 px on the bench geometry), so a
   128-ray pixel-tile block x view touches a small BAND of the feature map
   (p50 area 128-414 cells). The band is DMA'd to VMEM once per block-view.
2. A gather from a VMEM band can be computed as a ONE-HOT MATMUL: band rows
   pack 4 x-adjacent cells x 32 channels = 128 lanes, so the one-hot
   contraction runs on the MXU at full width (cost ~ band_rows MACs/target
   instead of a ~15 ns serial gather per target).

Layout discipline: TARGETS LIVE IN LANES everywhere (cell ids arrive as
(V, T) lane vectors, gathered features are (32ch, T), accumulators are
(32, T)) — no cross-lane transposes anywhere in the kernel. The one-hot
matmul is expressed as dot_general(band (ctr, 128ch), eqT (ctr, T_tile))
contracting dim 0 with dim 0, which the MXU executes directly.

The kernel fuses the whole per-batch similarity pipeline: band gathers for
all V views, the closed-form pair reduction S = 0.5*(||sum_f||^2 -
sum ||f||^2), and the clamp sentinel (projections outside the image read
feature cell (0,0) — feature_similarities.cu:42-61). Only the (N, D)
pre-softmax scores leave the kernel.

Exactness: identical arithmetic to ops/similarities.compute_similarities up
to f32 summation order (band values in bf16, like the XLA path's bf16
feature gathers); the one-hot selection itself is exact (0/1 weights).
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAYS_PER_BLOCK = 128
TILE_W, TILE_H = 16, 8  # pixel tile (x-extent, y-extent) for ray blocking
_T_TILE = 512  # targets per matmul tile


def _kernel(
    box_specs,
    n_views,
    depth_planes,
    origins_ref,  # scalar prefetch: (NB * V * 2,) int32 (y0, xg0) per b,v
    cell_ref,  # (1, V, T) int32 local packed cell ids (or -1 sentinel)
    f00_ref,  # (32, V_pad) f32 — F[v, 0, 0, :] columns (sentinel values)
    feat_ref,  # (V, Hf, Wg, 128) bf16 in HBM/ANY
    out_ref,  # (1, 1, T) f32 pair sums
    *scratch,
):
    b = pl.program_id(0)
    T = RAYS_PER_BLOCK * depth_planes
    bands = scratch[:n_views]
    sumf_scr, sumsq_scr = scratch[n_views], scratch[n_views + 1]
    sems = scratch[n_views + 2]
    out_scr, out_sem = scratch[n_views + 3], scratch[n_views + 4]

    # Kick off all band DMAs up front; they overlap with compute.
    copies = []
    for v in range(n_views):
        bh, bwg = box_specs[v]
        y0 = origins_ref[b * n_views * 2 + v * 2]
        # the wrapper emits xg0 in 8-group units; tell the compiler
        xg0 = pl.multiple_of(
            origins_ref[b * n_views * 2 + v * 2 + 1], 8
        )
        dma = pltpu.make_async_copy(
            feat_ref.at[v, pl.ds(y0, bh), pl.ds(xg0, bwg)],
            bands[v],
            sems.at[v],
        )
        dma.start()
        copies.append(dma)

    sumf_scr[:] = jnp.zeros_like(sumf_scr)
    sumsq_scr[:] = jnp.zeros_like(sumsq_scr)

    for v in range(n_views):
        bh, bwg = box_specs[v]
        ctr = bh * bwg
        copies[v].wait()
        band = bands[v][:].reshape(ctr, 128)
        f00 = f00_ref[:, v : v + 1]  # (32, 1)
        for ti in range(T // _T_TILE):
            cid = cell_ref[0, v : v + 1, pl.ds(ti * _T_TILE, _T_TILE)]
            row = cid >> 2  # (1, Tt)
            sub = cid & 3
            iota_r = jax.lax.broadcasted_iota(
                jnp.int32, (ctr, _T_TILE), 0
            )
            eqT = (
                iota_r == jnp.broadcast_to(row, (ctr, _T_TILE))
            ).astype(jnp.bfloat16)
            rows_T = jax.lax.dot_general(
                band,
                eqT,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (128, Tt): 4 packed cells x 32 channels, targets in lanes
            fT = jnp.zeros((32, _T_TILE), jnp.float32)
            for s in range(4):
                pick = jax.lax.slice(
                    rows_T, (s * 32, 0), ((s + 1) * 32, _T_TILE)
                )
                fT = fT + jnp.where(sub == s, pick, 0.0)
            fT = jnp.where(cid < 0, jnp.broadcast_to(f00, (32, _T_TILE)), fT)

            sl = pl.ds(ti * _T_TILE, _T_TILE)
            sumf_scr[:, sl] += fT
            sumsq_scr[:, sl] += fT * fT

    sumf = sumf_scr[:]
    pair = 0.5 * (
        (sumf * sumf).sum(axis=0, keepdims=True)
        - sumsq_scr[:].sum(axis=0, keepdims=True)
    )  # (1, T)
    # DMA the result out of a scratch row: with a VMEM out_spec XLA may
    # place the WHOLE (NB, 1, T) result in scoped VMEM (8.4 MB at 65k
    # rays), blowing the 16 MB scoped limit on top of the band boxes.
    out_scr[:] = pair
    cp = pltpu.make_async_copy(out_scr, out_ref.at[b], out_sem)
    cp.start()
    cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("box_specs", "n_views", "depth_planes", "interpret"),
)
def _banded_pair_sums(
    feats_packed,  # (V, Hf, Wg, 128) bf16
    origins,  # (NB * V * 2,) int32
    cellids,  # (NB, V, T) int32
    f00,  # (32, V_pad) f32
    box_specs,
    n_views,
    depth_planes,
    interpret=False,
):
    nb = cellids.shape[0]
    T = RAYS_PER_BLOCK * depth_planes

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (1, n_views, T),
                lambda b, _: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # f00 (full)
            pl.BlockSpec(memory_space=pl.ANY),  # features stay in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((bh, bwg, 128), jnp.bfloat16) for bh, bwg in box_specs
        ]
        + [
            pltpu.VMEM((32, T), jnp.float32),
            pltpu.VMEM((32, T), jnp.float32),
            pltpu.SemaphoreType.DMA((n_views,)),
            pltpu.VMEM((1, T), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        functools.partial(_kernel, box_specs, n_views, depth_planes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 1, T), jnp.float32),
        interpret=interpret,
    )(origins, cellids, f00, feats_packed)


def tile_ids(ray_idxs, height, tile_w=TILE_W, tile_h=TILE_H):
    """Pixel-tile id per ray (column-major pixel convention: x = r // H,
    y = r % H). Works on numpy and jax arrays."""
    x = ray_idxs // height
    y = ray_idxs % height
    return (x // tile_w) * ((height + tile_h - 1) // tile_h) + y // tile_h


def tile_order(ray_idxs, height, tile_w=TILE_W, tile_h=TILE_H):
    """Permutation putting rays into pixel-tile order.
    Returns (perm, inv_perm)."""
    tile = tile_ids(ray_idxs, height, tile_w, tile_h)
    perm = jnp.argsort(tile, stable=True)
    inv = jnp.argsort(perm, stable=True)
    return perm, inv


def compute_band_boxes(fidx, depth_planes):
    """Per (block, view) band boxes from feature indices.

    Arguments
    ---------
        fidx: (N, D, V, 2) int32 TILE-ORDERED feature indices
    Returns
    -------
        mins, maxs: (NB, V, 2) int32 (y, x) over non-sentinel targets
    """
    n, d, v, _ = fidx.shape
    nb = n // RAYS_PER_BLOCK
    fb = fidx.reshape(nb, RAYS_PER_BLOCK * d, v, 2)
    fx, fy = fb[..., 0], fb[..., 1]
    sent = (fx == 0) & (fy == 0)
    big = jnp.int32(1 << 20)
    min_x = jnp.where(sent, big, fx).min(axis=1)
    min_y = jnp.where(sent, big, fy).min(axis=1)
    max_x = jnp.where(sent, -1, fx).max(axis=1)
    max_y = jnp.where(sent, -1, fy).max(axis=1)
    # All-sentinel (b, v): collapse to an empty box at the origin.
    min_x = jnp.minimum(min_x, jnp.maximum(max_x, 0))
    min_y = jnp.minimum(min_y, jnp.maximum(max_y, 0))
    mins = jnp.stack([min_y, min_x], axis=-1)
    maxs = jnp.stack([jnp.maximum(max_y, 0), jnp.maximum(max_x, 0)], axis=-1)
    return mins, maxs


def measure_box_specs(fidx, depth_planes, pad=2):
    """Host-side: smallest (BH, BWg) per view covering ALL blocks, rounded
    to sublane/group multiples. Call once per geometry outside jit."""
    mins, maxs = compute_band_boxes(jnp.asarray(fidx), depth_planes)
    mins, maxs = np.asarray(mins), np.asarray(maxs)
    spans = maxs - mins  # (NB, V, 2)
    specs = []
    for v in range(fidx.shape[2]):
        bh = int(spans[:, v, 0].max()) + 1 + pad
        bw = int(spans[:, v, 1].max()) + 1 + pad
        bh = max(8, -(-bh // 8) * 8)
        # group extent: +8 groups of slack for the 8-group-aligned origin,
        # rounded to the 16-sublane bf16 tile (Mosaic DMA slice alignment)
        bwg = -(-(-(-bw // 4) + 8) // 16) * 16
        # bucket to a coarse ladder: specs are STATIC kernel args, so
        # nearby view geometries must land on the same compilation
        bh = _bucket(bh, (8, 16, 24, 32, 48, 64, 96, 128, 192, 256))
        bwg = _bucket(bwg, (16, 32, 48, 64, 96, 128, 192, 256))
        specs.append((bh, bwg))
    return tuple(specs)


def _bucket(x, ladder):
    for b in ladder:
        if x <= b:
            return b
    return ladder[-1]


def plan_band_specs(
    P, P_pinv, camera_center, bbox, height, width, padding, depth_planes,
    chunk_tiles=512, pad=4, ray_idxs=None,
):
    """Host-side band planning for one reference view set.

    Projects EVERY pixel tile of the image (chunked to bound memory) and
    returns the static per-view box specs that cover the widest block
    (plus margin). Exactness matters: the strict-band callers abort on a
    box overflow instead of falling back, so a sampled plan that misses
    the widest tile is a runtime error, not a slowdown.

    ``ray_idxs``: plan for THIS tile-sorted ray list (a GT-masked subset
    from ``filter_out_rays``) — filtered 128-ray blocks can span several
    pixel tiles, so full-image tile planning under-covers them.
    """
    from ..geometry import rays_from_pixel_idxs, rays_entry_exit_bbox
    from ..sampling import sample_points_along_segments
    from ..similarities import project_to_feature_idx

    n = height * width
    # the kernel tiles RAYS_PER_BLOCK*D targets in 512-wide chunks; a
    # D % 4 != 0 config would silently drop the tail targets
    if (RAYS_PER_BLOCK * depth_planes) % _T_TILE != 0:
        return None
    idxs = jnp.arange(n, dtype=jnp.int32)
    if ray_idxs is not None:
        arr = np.asarray(ray_idxs, np.int32)
        if len(arr) == 0:  # image with no valid rays: no banded kernel
            return None
        # negative-encoded pad entries duplicate the preceding ray
        perm = jnp.asarray(np.where(arr < 0, -arr - 1, arr))
    else:
        perm, _ = tile_order(idxs, height)
    if perm.shape[0] % RAYS_PER_BLOCK:  # pad to whole blocks
        tail = RAYS_PER_BLOCK - perm.shape[0] % RAYS_PER_BLOCK
        perm = jnp.concatenate([perm, jnp.repeat(perm[-1:], tail)])
    n_tiles = perm.shape[0] // RAYS_PER_BLOCK
    perm = np.asarray(perm)

    @jax.jit
    def fidx_of(chunk_idxs, P, P_pinv, center, bbox):
        d = rays_from_pixel_idxs(chunk_idxs, P_pinv, center, height)
        s, e = rays_entry_exit_bbox(d, center, bbox[:3], bbox[3:])
        pts = sample_points_along_segments(s, e, depth_planes)
        # only the projection geometry matters; a dummy feature
        # stack keeps this cheap
        dummy = jnp.zeros(
            (P.shape[0], height + padding + 1, width + padding + 1, 32),
            jnp.bfloat16,
        )
        return project_to_feature_idx(
            dummy, P, pts, padding, height, width
        )

    specs = None
    chunk_rays = chunk_tiles * RAYS_PER_BLOCK
    for t0 in range(0, n_tiles, chunk_tiles):
        sl = perm[t0 * RAYS_PER_BLOCK:(t0 + chunk_tiles) * RAYS_PER_BLOCK]
        if len(sl) < chunk_rays:  # fixed chunk shape: one trace total
            sl = np.concatenate(
                [sl, np.repeat(sl[-1:], chunk_rays - len(sl))]
            )
        fidx = np.asarray(
            fidx_of(jnp.asarray(sl), P, P_pinv, camera_center, bbox)
        )
        chunk_specs = measure_box_specs(fidx, depth_planes, pad=pad)
        if specs is None:
            specs = list(chunk_specs)
        else:
            specs = [
                (max(a[0], b[0]), max(a[1], b[1]))
                for a, b in zip(specs, chunk_specs)
            ]
    if _specs_vmem_bytes(specs, depth_planes) > _VMEM_BUDGET:
        # wide-FOV geometry: the exact band boxes exceed the kernel's
        # scoped VMEM — this view keeps the XLA gather path
        return None
    return tuple(specs)


_VMEM_BUDGET = 14 << 20  # bytes of scoped VMEM the banded kernel may plan


def _specs_vmem_bytes(box_specs, depth_planes):
    """Scoped-VMEM estimate of _banded_pair_sums at these box specs."""
    T = RAYS_PER_BLOCK * depth_planes
    boxes = sum(bh * bwg * 128 * 2 for bh, bwg in box_specs)  # bf16
    fixed = 2 * 32 * T * 4 + (len(box_specs) + 1) * T * 4
    return boxes + fixed


def banded_similarities(
    features,
    fidx,
    box_specs,
    height,
    width,
    depth_planes,
    interpret=False,
):
    """Pair-sum scores via the banded kernel.

    Arguments
    ---------
        features: (V, Hf, Wf, F=32) feature maps (any float dtype; bands
            are gathered in bf16 like the XLA path's bf16 feature gathers)
        fidx: (N, D, V, 2) int32 feature indices in TILE order (from
            ops.similarities.pixel_to_feature_idx); N multiple of 128
        box_specs: static ((BH, BWg) per view) from measure_box_specs
    Returns
    -------
        pair_sum: (N, D) f32 accumulated pair dot products (pre-softmax,
        pre-/n_pairs), rows in the same (tile) order as ``fidx``.
    """
    v, hf, wf, f = features.shape
    assert f == 32, "banded kernel assumes F=32 feature channels"
    n, d = fidx.shape[0], fidx.shape[1]
    assert n % RAYS_PER_BLOCK == 0
    nb = n // RAYS_PER_BLOCK

    # Pack 4 x-adjacent cells per 128-lane row. Pad Wf so group counts and
    # clamped origins stay 8-group aligned, and Hf for box clamping;
    # padded cells are never selected.
    wg = -(-wf // 32) * 8
    hfp = max(hf, -(-hf // 8) * 8 + max(s[0] for s in box_specs))
    wgp = wg + max(s[1] for s in box_specs)  # room for the clamped origin
    feats = features.astype(jnp.bfloat16)
    # Pack BEFORE the big pad: padding the (..., 32)-minor tensor lets
    # XLA's layout assignment pick a V-minor layout for the temp (measured
    # 25.6x = 128/V tile expansion, 12.7 GB at 720p). Pad x to a multiple
    # of 4 (cheap), reshape so the minor dim is the full 128-lane packed
    # row, then pad the OUTER dims in packed space.
    wf4 = -(-wf // 4) * 4
    feats = jnp.pad(feats, ((0, 0), (0, 0), (0, wf4 - wf), (0, 0)))
    feats_packed = feats.reshape(v, hf, wf4 // 4, 128)
    feats_packed = jnp.pad(
        feats_packed,
        ((0, 0), (0, hfp - hf), (0, wgp - wf4 // 4), (0, 0)),
    )

    mins, _ = compute_band_boxes(fidx, d)  # (NB, V, 2)
    bhs = jnp.asarray([s[0] for s in box_specs], jnp.int32)
    bwgs = jnp.asarray([s[1] for s in box_specs], jnp.int32)
    y0 = jnp.clip(mins[..., 0], 0, jnp.maximum(hfp - bhs[None, :], 0))
    # origin in 8-group (32 px) units so DMA offsets stay tile-aligned
    xg0 = jnp.clip(
        (mins[..., 1] // 32) * 8, 0, jnp.maximum(wgp - bwgs[None, :], 0)
    )
    origins = jnp.stack([y0, xg0], axis=-1).reshape(-1).astype(jnp.int32)

    # Local packed cell ids; clamp sentinel (0,0) marks -1.
    fb = fidx.reshape(nb, RAYS_PER_BLOCK * d, v, 2)
    fx, fy = fb[..., 0], fb[..., 1]
    sent = (fx == 0) & (fy == 0)
    ly = fy - y0[:, None, :]
    lrow = ly * bwgs[None, None, :] + (fx // 4 - xg0[:, None, :])
    lcell = lrow * 4 + (fx & 3)
    lcell = jnp.where(sent, -1, lcell)
    cellids = jnp.transpose(lcell, (0, 2, 1))  # (NB, V, T)

    v_pad = -(-v // 8) * 8
    f00 = jnp.zeros((32, v_pad), jnp.float32)
    f00 = f00.at[:, :v].set(features[:, 0, 0, :].T.astype(jnp.float32))

    pair = _banded_pair_sums(
        feats_packed, origins, cellids, f00,
        tuple(box_specs), v, d, interpret=interpret,
    )  # (NB, 1, T); targets ray-major within a block (t = r * D + dd)
    return pair.reshape(nb, RAYS_PER_BLOCK, d).reshape(n, d)
