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

Round 3: targets are DEPTH-MAJOR (t = d*128 + r), so each matmul tile
is a GROUP_D-plane DEPTH GROUP whose projections cluster in a sub-box
smaller than the whole epipolar band. Per-(block, view, depth-group)
DRIFTING origins (the same trick as the beam kernel's 8-slice groups)
shrink the one-hot eq build — proportional to static box rows x
targets — to the sub-box. Boxes stream through per-view
double-buffered DMA slots. Round 4 moved GROUP_D 4 -> 16: the device
A/B showed per-(view, group) iteration overheads dominate sub-box
tightness (see the GROUP_D comment).

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
# Depth planes per target tile (matmul tile = GROUP_D * 128 targets).
# Device A/B (v5e, bench rig, 2026-08-18): per-(v, g) iteration overhead
# beats sub-box tightness — sims front+kernel 18.2 / 14.0 / 12.6 / 12.2
# / 12.3 ms per 65k rays at GROUP_D 2 / 4 / 8 / 16 / 32 despite the
# boxes growing ~50% from 4 to 16. 16 == 32 within tunnel noise; 16
# keeps per-group sub-boxes meaningful on long-epipolar (oblique) rigs
# where one whole-band box risks the VMEM budget.
GROUP_D = 16
_DMA_SLOTS = 4  # in-flight sub-box copies per view (latency hiding)
# Build iteration i+1's one-hot eq operand between iteration i's dot
# issue and its first consumer, hoping the VPU eq stream overlaps the
# MXU matmul. Device A/B (v5e, 2026-08-19, --no_pipeline_eq): NEUTRAL —
# 12.55 vs 12.58 ms strict sims. The additive ~5 ms "dot" + ~6 ms "eq"
# shares are NOT parallel engines idling: the binding resource is the
# single in-order issue/operand-staging pipeline (the "dot" share is
# mostly eqT staging into the MXU), so instruction reordering cannot
# overlap them. Default OFF (natural order); knob kept for re-A/Bs.
_PIPELINE_EQ = False
_DEBUG_NO_DOT = False  # A/B timers only: skip the one-hot MXU dot
_DEBUG_NO_EQ = False  # A/B timers only: constant eq operand (WRONG results)
_DEBUG_NO_PICK = False  # A/B timers only: skip the 4-way sub-lane pick


def _group_d(depth_planes):
    """Effective depth-group size: small-D configs (tests run D=8) tile
    the whole depth range as one group."""
    return min(GROUP_D, int(depth_planes))


def _kernel(
    box_specs,
    n_views,
    depth_planes,
    origins_ref,  # scalar prefetch: (NB*V*G*2,) int32 (y0, xg0) per b,v,g
    cell_ref,  # (1, V, T) int32 local packed cell ids (or -1 sentinel)
    f00_ref,  # (32, V_pad) f32 — F[v, 0, 0, :] columns (sentinel values)
    feat_ref,  # (V, Hf, Wg, 128) bf16 in HBM/ANY
    out_ref,  # (1, 1, T) f32 pair sums
    *scratch,
):
    b = pl.program_id(0)
    T = RAYS_PER_BLOCK * depth_planes
    gd = _group_d(depth_planes)
    t_tile = RAYS_PER_BLOCK * gd
    G = depth_planes // gd
    bands = scratch[:n_views]  # per view: (SLOTS, bh, bwg, 128) DMA slots
    sems = scratch[n_views]  # (V, SLOTS)
    out_scr, out_sem = scratch[n_views + 1], scratch[n_views + 2]

    # group-OUTER order: the 5 views of one depth group accumulate their
    # pair sums in registers (no (32, T) scratch read-modify-writes) and
    # the group's pair row is finalized in place
    seq = [(v, g) for g in range(G) for v in range(n_views)]

    def slot_of(i):
        v, g = seq[i]
        return g % _DMA_SLOTS

    def dma_for(i):
        v, g = seq[i]
        bh, bwg = box_specs[v]
        base = ((b * n_views + v) * G + g) * 2
        y0 = origins_ref[base]
        # the wrapper emits xg0 in 8-group units; tell the compiler
        xg0 = pl.multiple_of(origins_ref[base + 1], 8)
        return pltpu.make_async_copy(
            feat_ref.at[v, pl.ds(y0, bh), pl.ds(xg0, bwg)],
            bands[v].at[slot_of(i)],
            sems.at[v, slot_of(i)],
        )

    def build_eq(i):
        """(eqT, row, sub, cid) for iteration i. Depends ONLY on the
        always-resident cell_ref (not the DMA'd band), so it can be
        built one iteration AHEAD of its dot (see _PIPELINE_EQ).

        One-hot row compare stays int32: v5e Mosaic supports neither
        16-bit iota nor i16 vector compares (both tried 2026-08-19 —
        "16-bit iota not supported by hardware" / "Target does not
        support this comparison"), so the 2-per-lane i16 packing idea
        cannot lower on this generation."""
        v, g = seq[i]
        bh, bwg = box_specs[v]
        ctr = bh * bwg
        cid = cell_ref[0, v : v + 1, pl.ds(g * t_tile, t_tile)]
        row = cid >> 2  # (1, Tt)
        sub = cid & 3
        if _DEBUG_NO_EQ:  # A/B timers only (WRONG results): eq-build share
            # data-dependent (cannot fold) but build-free: one broadcast
            eqT = jnp.broadcast_to(
                row.astype(jnp.bfloat16), (ctr, t_tile)
            )
        else:
            iota_r = jax.lax.broadcasted_iota(jnp.int32, (ctr, t_tile), 0)
            eqT = (
                iota_r == jnp.broadcast_to(row, (ctr, t_tile))
            ).astype(jnp.bfloat16)
        return eqT, row, sub, cid

    # deep DMA pipeline: sub-box copies are small (~64-128 KB) and their
    # ~1 us issue latency exceeds a tile's compute, so keep
    # _DMA_SLOTS - 1 copies in flight ahead of the consumer
    for j in range(min(_DMA_SLOTS - 1, len(seq))):
        dma_for(j).start()
    eq_cur = build_eq(0) if _PIPELINE_EQ else None
    for i, (v, g) in enumerate(seq):
        if i + _DMA_SLOTS - 1 < len(seq):
            dma_for(i + _DMA_SLOTS - 1).start()
        if v == 0:
            sumf = jnp.zeros((32, t_tile), jnp.float32)
            ssq = jnp.zeros((1, t_tile), jnp.float32)
        bh, bwg = box_specs[v]
        ctr = bh * bwg
        dma_for(i).wait()
        band = bands[v][slot_of(i)].reshape(ctr, 128)
        f00 = f00_ref[:, v : v + 1]  # (32, 1)
        if _PIPELINE_EQ:
            eqT, row, sub, cid = eq_cur
        else:
            eqT, row, sub, cid = build_eq(i)
        if _DEBUG_NO_DOT:  # A/B timers only (WRONG results): MXU share
            if ctr >= 128:
                rows_T = jax.lax.slice(
                    eqT, (0, 0), (128, t_tile)
                ).astype(jnp.float32)
            else:
                rows_T = jnp.broadcast_to(
                    eqT[0:1], (128, t_tile)
                ).astype(jnp.float32)
        else:
            rows_T = jax.lax.dot_general(
                band,
                eqT,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (128, Tt): 4 packed cells x 32 ch, targets in lanes
        if _PIPELINE_EQ and i + 1 < len(seq):
            # Build the NEXT iteration's eq operand here — between the
            # dot issue and its first consumer — so the VPU compare/cast
            # stream overlaps the in-flight MXU matmul (the A/B-measured
            # shares were ADDITIVE: ~5 ms dot + ~6 ms eq in a 12.4 ms
            # sims step, i.e. no overlap with the in-order build order).
            eq_cur = build_eq(i + 1)
        if _DEBUG_NO_PICK:  # A/B timers only (WRONG results): pick share
            fT = jax.lax.slice(rows_T, (0, 0), (32, t_tile))
        else:
            # 2-level select tree over the 4 packed cells: 3 (32, Tt)
            # selects instead of 4 masked adds + a zero init (exact —
            # selects pick the same values the adds summed)
            r0, r1, r2, r3 = (
                jax.lax.slice(
                    rows_T, (s * 32, 0), ((s + 1) * 32, t_tile)
                )
                for s in range(4)
            )
            odd = (sub & 1) == 1
            lo = jnp.where(odd, r1, r0)
            hi = jnp.where(odd, r3, r2)
            fT = jnp.where(sub >= 2, hi, lo)
            fT = jnp.where(
                cid < 0, jnp.broadcast_to(f00, (32, t_tile)), fT
            )

        sumf = sumf + fT
        ssq = ssq + (fT * fT).sum(axis=0, keepdims=True)
        if v == n_views - 1:
            pair = 0.5 * ((sumf * sumf).sum(axis=0, keepdims=True) - ssq)
            out_scr[:, pl.ds(g * t_tile, t_tile)] = pair

    # DMA the result out of a scratch row: with a VMEM out_spec XLA may
    # place the WHOLE (NB, 1, T) result in scoped VMEM (8.4 MB at 65k
    # rays), blowing the 16 MB scoped limit on top of the band boxes.
    cp = pltpu.make_async_copy(out_scr, out_ref.at[b], out_sem)
    cp.start()
    cp.wait()


@functools.partial(
    jax.jit,
    static_argnames=("box_specs", "n_views", "depth_planes", "interpret"),
)
def _banded_pair_sums(
    feats_packed,  # (V, Hf, Wg, 128) bf16
    origins,  # (NB * V * G * 2,) int32
    cellids,  # (NB, V, T) int32, depth-major targets (t = d*128 + r)
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
            pltpu.VMEM((_DMA_SLOTS, bh, bwg, 128), jnp.bfloat16)
            for bh, bwg in box_specs
        ]
        + [
            pltpu.SemaphoreType.DMA((n_views, _DMA_SLOTS)),
            pltpu.VMEM((1, T), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        functools.partial(_kernel, box_specs, n_views, depth_planes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, 1, T), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
    )(origins, cellids, f00, feats_packed)


def tile_ids(ray_idxs, height, tile_w=None, tile_h=None):
    """Pixel-tile id per ray (column-major pixel convention: x = r // H,
    y = r % H). Works on numpy and jax arrays. ``tile_w``/``tile_h``
    default to the MODULE globals at call time (A/B overrides and the
    block-size coupling below stay coherent)."""
    tile_w = TILE_W if tile_w is None else tile_w
    tile_h = TILE_H if tile_h is None else tile_h
    x = ray_idxs // height
    y = ray_idxs % height
    return (x // tile_w) * ((height + tile_h - 1) // tile_h) + y // tile_h


def tile_order(ray_idxs, height, tile_w=None, tile_h=None):
    """Permutation putting rays into pixel-tile order.
    Returns (perm, inv_perm)."""
    tile = tile_ids(ray_idxs, height, tile_w, tile_h)
    perm = jnp.argsort(tile, stable=True)
    inv = jnp.argsort(perm, stable=True)
    return perm, inv


def compute_band_boxes(fidx, depth_planes):
    """Per (block, depth-group, view) sub-band boxes from feature indices.

    Middle-axis reductions only: a layout transpose of the (..., V, 2)-
    minor fidx tensor is pathological on TPU (tiny minor dims pad to 128
    lanes; measured ~90 ms per 65k-ray batch).

    Arguments
    ---------
        fidx: (N, D, V, 2) int32 TILE-ORDERED feature indices
    Returns
    -------
        mins, maxs: (NB, G, V, 2) int32 (y, x) over non-sentinel targets
        of each 4-plane depth group
    """
    n, d, v, _ = fidx.shape
    nb = n // RAYS_PER_BLOCK
    gd = _group_d(d)
    g = d // gd
    fb = fidx.reshape(nb, RAYS_PER_BLOCK, g, gd, v, 2)
    fx, fy = fb[..., 0], fb[..., 1]
    sent = (fx == 0) & (fy == 0)
    big = jnp.int32(1 << 20)
    min_x = jnp.where(sent, big, fx).min(axis=(1, 3))
    min_y = jnp.where(sent, big, fy).min(axis=(1, 3))
    max_x = jnp.where(sent, -1, fx).max(axis=(1, 3))
    max_y = jnp.where(sent, -1, fy).max(axis=(1, 3))
    # All-sentinel (b, g, v): collapse to an empty box at the origin.
    min_x = jnp.minimum(min_x, jnp.maximum(max_x, 0))
    min_y = jnp.minimum(min_y, jnp.maximum(max_y, 0))
    mins = jnp.stack([min_y, min_x], axis=-1)
    maxs = jnp.stack([jnp.maximum(max_y, 0), jnp.maximum(max_x, 0)], axis=-1)
    return mins, maxs


def _spec_from_need(bh, bw):
    """Bucket a raw (y-extent, x-extent-px) need into a static
    (BH, BWg) spec. bh is an UNTILED dim (third-from-minor in the band
    scratch, dim 1 of the feature slice): arbitrary extents and origins
    are legal, so the ladder can be fine-grained — the one-hot eq build
    is proportional to bh*bwg rows. bwg stays a multiple of the
    16-sublane bf16 tile with +8 groups of origin-alignment slack
    (Mosaic requires 8-aligned offsets on the tiled dim). Specs are
    STATIC kernel args, so nearby view geometries must land on the same
    compilation."""
    bh = max(8, bh)
    bwg = -(-(-(-bw // 4) + 8) // 16) * 16
    bh = _bucket(
        bh, (8, 10, 12, 14, 16, 20, 24, 28, 32, 40, 48, 64, 96,
             128, 192, 256)
    )
    bwg = _bucket(bwg, (16, 32, 48, 64, 96, 128, 192, 256))
    return bh, bwg


def _specs_from_spans(spans, pad):
    """Per-view specs from (NB, G, V, 2) box spans."""
    specs = []
    for v in range(spans.shape[2]):
        bh = int(spans[:, :, v, 0].max()) + 1 + pad
        bw = int(spans[:, :, v, 1].max()) + 1 + pad
        specs.append(_spec_from_need(bh, bw))
    return tuple(specs)


def measure_box_specs(fidx, depth_planes, pad=2):
    """Host-side: smallest (BH, BWg) per view covering ALL (block,
    depth-group) sub-boxes, rounded to sublane/group multiples. Call once
    per geometry outside jit."""
    mins, maxs = compute_band_boxes(jnp.asarray(fidx), depth_planes)
    spans = np.asarray(maxs) - np.asarray(mins)  # (NB, G, V, 2)
    return _specs_from_spans(spans, pad)


def _bucket(x, ladder):
    for b in ladder:
        if x <= b:
            return b
    return ladder[-1]


def _plan_spans_body(chunk_idxs, P, P_pinv, center, bbox, height, width,
                     padding, depth_planes):
    """Band-plan spans for one ray chunk (trace-time body)."""
    from ..geometry import rays_from_pixel_idxs, rays_entry_exit_bbox
    from ..sampling import sample_points_along_segments
    from ..similarities import project_to_feature_idx

    d = rays_from_pixel_idxs(chunk_idxs, P_pinv, center, height)
    s, e = rays_entry_exit_bbox(d, center, bbox[:3], bbox[3:])
    pts = sample_points_along_segments(s, e, depth_planes)
    # only the projection geometry matters; a dummy feature
    # stack keeps this cheap
    dummy = jnp.zeros(
        (P.shape[0], height + padding + 1, width + padding + 1, 32),
        jnp.bfloat16,
    )
    fidx = project_to_feature_idx(dummy, P, pts, padding, height, width)
    # miss rays (zero-length segments) run as sentinels at runtime
    # (banded_scores_from_segments); exclude them from the plan too
    hit = jnp.any(s != e, axis=1)
    fidx = jnp.where(hit[:, None, None, None], fidx, 0)
    # reduce ON DEVICE: downloading the raw (N, D, V, 2) index tensor
    # costs ~84 MB per chunk over the host link (~3 s/view at DTU scale
    # through the axon tunnel); the spans are ~1000x smaller
    mins, maxs = compute_band_boxes(fidx, depth_planes)
    return maxs - mins


@functools.partial(
    jax.jit, static_argnames=("height", "width", "padding", "depth_planes")
)
def _plan_spans(chunk_idxs, P, P_pinv, center, bbox, height, width,
                padding, depth_planes):
    """Band-plan spans for one ray chunk. MODULE-LEVEL jit: a closure
    jitted inside plan_band_specs is a fresh function object per view,
    so every reference view re-traced (and remotely re-compiled) the
    same program — 49 avoidable compiles per DTU scene."""
    return _plan_spans_body(chunk_idxs, P, P_pinv, center, bbox,
                            height, width, padding, depth_planes)


@functools.partial(
    jax.jit, static_argnames=("height", "width", "padding", "depth_planes")
)
def _plan_spans_max(chunk_idxs, P, P_pinv, center, bbox, height, width,
                    padding, depth_planes):
    """Whole-view band spans in ONE dispatch: ``lax.map`` over
    (n_chunks, chunk_rays) ray chunks bounds device memory to a single
    chunk's projection intermediates, and the (NB, G, V, 2) spans
    reduce to per-view (V, 2) maxima ON DEVICE. The previous per-chunk
    dispatch+sync loop cost ~1.3 s/view at 720p through the axon
    tunnel (15 chunks x ~80 ms dispatch/sync); this is one dispatch
    and an 8-int download."""
    def body(idxs):
        return _plan_spans_body(
            idxs, P, P_pinv, center, bbox, height, width, padding,
            depth_planes,
        )

    spans = jax.lax.map(body, chunk_idxs)  # (n_chunks, NB, G, V, 2)
    return spans.max(axis=(0, 1, 2))


def _band_idx_dev(height, width, chunk_tiles=512):
    """Committed (n_chunks, chunk_rays) unfiltered tile-order ray chunks
    for the whole-view span program, cached per image shape (the stable
    tile argsort costs ~0.2 s per 1.9M rays on the single-core planning
    host; every unfiltered view of an image shape shares one copy)."""
    from ..bp_plan_device import _IDX_CACHE

    chunk_rays = chunk_tiles * RAYS_PER_BLOCK
    full_tiles = -(-(height * width) // RAYS_PER_BLOCK)
    n_chunks = -(-full_tiles // chunk_tiles)
    ck = ("band2d", height, width, n_chunks, chunk_rays)
    if ck not in _IDX_CACHE:
        from ..bp_plan_device import unfiltered_tile_idxs

        perm = unfiltered_tile_idxs(height, width, RAYS_PER_BLOCK)
        if len(perm) < n_chunks * chunk_rays:
            perm = np.concatenate(
                [perm, np.repeat(perm[-1:], n_chunks * chunk_rays - len(perm))]
            )
        _IDX_CACHE[ck] = jax.device_put(
            perm.reshape(n_chunks, chunk_rays)
        )
    return _IDX_CACHE[ck]


# One-shot prefetched whole-view span maxima (ops.plan_prefetch fills,
# plan_band_specs pops): lets every view's span program run while the
# device is busy with other plan programs, with the 8-int downloads
# started async — instead of a dispatch + sync round trip per view.
_SPANS_PREFETCH = {}


def _spans_prefetch_key(P, P_pinv, camera_center, bbox, height, width,
                        padding, depth_planes):
    return (
        np.asarray(P, np.float32).tobytes(),
        np.asarray(P_pinv, np.float32).tobytes(),
        np.asarray(camera_center, np.float32).tobytes(),
        np.asarray(bbox, np.float32).tobytes(),
        int(height), int(width), int(padding), int(depth_planes),
    )


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
    n = height * width
    # the kernel tiles RAYS_PER_BLOCK*D targets in GROUP_D-plane chunks;
    # a D % group config would silently drop the tail targets
    if depth_planes % _group_d(depth_planes) != 0:
        return None
    # Planning is HOST work: the tile order runs in numpy (a jnp
    # arange/argsort here dispatched eagerly to the TPU — ~20 s of
    # remote compiles on first use plus a megabyte-scale permutation
    # download per view through the tunnel).
    from ... import native

    # On an accelerator backend, prefer the DEVICE span program: one
    # dispatch + an 8-int download per view once compiled, vs ~0.2 s/view
    # of single-core host march at 720p (~0.4 s at DTU resolution) — the
    # cold plan phase is host-bound (VERDICT r4 #3). The native planner
    # stays the host-side path (CPU tests, no-remote-compile contexts).
    from ..bp_plan_device import _use_device_spans

    use_native = native.is_available() and not _use_device_spans()
    if ray_idxs is not None:
        arr = np.asarray(ray_idxs, np.int32)
        if len(arr) == 0:  # image with no valid rays: no banded kernel
            return None
        # negative-encoded pad entries duplicate the preceding ray
        perm = np.where(arr < 0, -arr - 1, arr).astype(np.int32)
    elif use_native:
        idxs = np.arange(n, dtype=np.int32)
        # same stable tile sort as tile_order (int keys: np and jnp
        # stable argsorts agree elementwise)
        perm = np.argsort(tile_ids(idxs, height), kind="stable").astype(
            np.int32
        )
    else:
        # device path, unfiltered: the committed tile-order chunks are
        # cached per image shape — skip the per-view 1.9M-element
        # argsort entirely (it was ~40% of the re-primed band cost)
        perm = None
    if perm is not None and perm.shape[0] % RAYS_PER_BLOCK:
        tail = RAYS_PER_BLOCK - perm.shape[0] % RAYS_PER_BLOCK
        perm = np.concatenate([perm, np.repeat(perm[-1:], tail)])
    n_tiles = (
        perm.shape[0] // RAYS_PER_BLOCK
        if perm is not None
        else -(-(height * width) // RAYS_PER_BLOCK)
    )

    if use_native:
        # Native host planning (f64, OpenMP): no remote compile of the
        # span program (30-150 s cold per process), no idx upload, no
        # device round trip per view — pure host work. The f64-vs-f32
        # rounding jitter against the runtime front end is absorbed by
        # the same ``pad`` margin that covers the planner's other
        # f32 deltas (cf. the beam planner's +-2 budget).
        spans_native = native.band_plan_spans(
            perm, np.asarray(P, np.float64),
            np.asarray(P_pinv, np.float64),
            np.asarray(camera_center, np.float64),
            np.asarray(bbox, np.float64), height, width, padding,
            depth_planes, _group_d(depth_planes), RAYS_PER_BLOCK,
        )
        specs = [
            _spec_from_need(
                int(spans_native[v, 0]) + 1 + pad,
                int(spans_native[v, 1]) + 1 + pad,
            )
            for v in range(spans_native.shape[0])
        ]
        if _specs_vmem_bytes(specs, depth_planes) > _VMEM_BUDGET:
            return None
        return tuple(specs)

    chunk_rays = chunk_tiles * RAYS_PER_BLOCK
    # Pad the chunk COUNT to the full-image tile count so every view of
    # an image size compiles ONE _plan_spans_max program (GT-filtered
    # ray lists vary in length per view; a per-length chunk count would
    # re-compile per view at 30-150 s each on the remote compiler).
    # Pad rays repeat the last real ray — duplicates cannot extend a
    # max-reduced span.
    full_tiles = -(-(height * width) // RAYS_PER_BLOCK)
    n_chunks = max(-(-full_tiles // chunk_tiles), -(-n_tiles // chunk_tiles))
    if ray_idxs is None:
        idx_dev = _band_idx_dev(height, width, chunk_tiles)
    else:
        idx2d = np.empty((n_chunks, chunk_rays), np.int32)
        flat = perm
        if len(flat) < n_chunks * chunk_rays:
            flat = np.concatenate(
                [
                    flat,
                    np.repeat(flat[-1:], n_chunks * chunk_rays - len(flat)),
                ]
            )
        idx2d[:] = flat.reshape(n_chunks, chunk_rays)
        idx_dev = jnp.asarray(idx2d)
    spans_max = None
    if ray_idxs is None and _SPANS_PREFETCH:
        pre = _SPANS_PREFETCH.pop(
            _spans_prefetch_key(
                P, P_pinv, camera_center, bbox, height, width, padding,
                depth_planes,
            ),
            None,
        )
        if pre is not None:
            spans_max = np.asarray(pre)
    if spans_max is None:
        spans_max = np.asarray(
            _plan_spans_max(
                idx_dev, P, P_pinv, camera_center, bbox,
                height, width, padding, depth_planes,
            )
        )
    specs = [
        _spec_from_need(
            int(spans_max[v, 0]) + 1 + pad, int(spans_max[v, 1]) + 1 + pad
        )
        for v in range(spans_max.shape[0])
    ]
    if _specs_vmem_bytes(specs, depth_planes) > _VMEM_BUDGET:
        # wide-FOV geometry: the exact band boxes exceed the kernel's
        # scoped VMEM — this view keeps the XLA gather path
        return None
    return tuple(specs)


# Bytes of scoped VMEM the banded kernel may plan. The kernel raises
# Mosaic's 16 MiB default ceiling via CompilerParams(vmem_limit_bytes)
# — a v5e core has 128 MiB — so wide-FOV geometry that used to fall
# back to the XLA gather path now plans banded boxes too; the planner
# budget keeps headroom below the raised ceiling.
_VMEM_LIMIT_BYTES = 64 << 20
_VMEM_BUDGET = 58 << 20


def _specs_vmem_bytes(box_specs, depth_planes):
    """Scoped-VMEM estimate of _banded_pair_sums at these box specs."""
    T = RAYS_PER_BLOCK * depth_planes
    # _DMA_SLOTS in-flight bf16 sub-box copies per view
    boxes = sum(
        _DMA_SLOTS * bh * bwg * 128 * 2 for bh, bwg in box_specs
    )
    fixed = (len(box_specs) + 2) * T * 4
    return boxes + fixed


def _pack_features(features, box_specs):
    """Pack (V, Hf, Wf, F=32) feature maps into the kernel's 128-lane row
    layout with origin-clamp padding. Returns (feats_packed, hfp, wgp)."""
    v, hf, wf, f = features.shape
    wg = -(-wf // 32) * 8
    hfp = max(hf, -(-hf // 8) * 8 + max(s[0] for s in box_specs))
    wgp = wg + max(s[1] for s in box_specs)  # room for the clamped origin
    feats = features.astype(jnp.bfloat16)
    # Pack BEFORE the big pad: padding the (..., 32)-minor tensor lets
    # XLA's layout assignment pick a V-minor layout for the temp (measured
    # 25.6x = 128/V tile expansion, 12.7 GB at 720p).
    wf4 = -(-wf // 4) * 4
    feats = jnp.pad(feats, ((0, 0), (0, 0), (0, wf4 - wf), (0, 0)))
    feats_packed = feats.reshape(v, hf, wf4 // 4, 128)
    feats_packed = jnp.pad(
        feats_packed,
        ((0, 0), (0, hfp - hf), (0, wgp - wf4 // 4), (0, 0)),
    )
    return feats_packed, hfp, wgp


def pack_features_for_bands(features, box_specs):
    """One-time per-image packing for the banded kernel: the 128-lane row
    layout plus the per-view sentinel columns. Scan callers compute this
    OUTSIDE their batch loop — the pad/reshape chain touches the whole
    ~300 MB (at 720p x 5 views) feature stack and costs ~ms per
    evaluation, so running it per ray batch inside a lax.scan body
    dominated the first sweep (measured 35-46 ms/chunk vs ~13 ms of
    actual kernel time)."""
    v = features.shape[0]
    feats_packed, _, _ = _pack_features(features, box_specs)
    v_pad = -(-v // 8) * 8
    f00 = jnp.zeros((32, v_pad), jnp.float32)
    f00 = f00.at[:, :v].set(features[:, 0, 0, :].T.astype(jnp.float32))
    return feats_packed, f00


def banded_front_end(
    P, ray_start, ray_end, depth_planes, padding,
    height, width, box_specs, hfp, wgp, n_views,
):
    """Front end of the banded sweep: lane-major projections, per-group
    drifting origins, packed local cell ids, and the strict-band fit
    check. Split out of :func:`banded_scores_from_segments` so the
    kernel timers can isolate the XLA front-end share; callers trace it
    in the same jit as the kernel, so the split changes nothing.

    Returns (cellids (NB, V, T), origins flat int32, fits scalar bool).
    """
    v = n_views
    n = ray_start.shape[0]
    d = depth_planes
    nb = n // RAYS_PER_BLOCK
    gd = _group_d(d)
    G = d // gd

    def lanes(x):  # (N,) -> (nb, 1, 128)
        return x.reshape(nb, 1, RAYS_PER_BLOCK)

    frac = (
        jnp.arange(d, dtype=jnp.float32) / jnp.float32(d - 1)
    ).reshape(1, d, 1)
    sl = [lanes(ray_start[:, a]) for a in range(3)]  # (nb, 1, 128)
    el = [lanes(ray_end[:, a]) for a in range(3)]

    # bbox-MISS rays (zero-length segments) score as sentinels: their
    # collapsed point projects wherever, and including it would inflate
    # the per-group band boxes past the planned static specs
    miss = lanes(
        jnp.all(ray_start == ray_end, axis=1).astype(jnp.int32)
    ) > 0  # (nb, 1, 128)

    offset = padding - (padding - 1) // 2
    big = jnp.int32(1 << 20)
    cell_rows = []
    origin_rows = []
    fits = None
    for vi in range(v):
        Pv = P[vi]
        # Homogeneous coordinates are AFFINE in the depth fraction, so
        # project the two ENDPOINTS per view ((nb, 1, 128) madds) and
        # lerp u/w/z along depth — one madd per coordinate on the big
        # (nb, d, 128) shape instead of the 3-coordinate point lerp
        # plus a 4-madd projection (device A/B 2026-08-19: strict sims
        # 12.4 -> 11.9 ms). f32 reassociation vs the XLA path's
        # point-then-project order can flip round()-boundary cells on
        # ~1e-6 of targets (same class as the f32-vs-f64 planner
        # jitter the pad margin absorbs).
        us, ue, ws, we, zs, ze = (
            Pv[r, 0] * q[0] + Pv[r, 1] * q[1] + Pv[r, 2] * q[2] + Pv[r, 3]
            for r in range(3)
            for q in (sl, el)
        )
        u = us + frac * (ue - us)  # (nb, d, 128)
        w_ = ws + frac * (we - ws)
        z_ = zs + frac * (ze - zs)
        # true division (not reciprocal-multiply): bitwise parity with
        # geometry.project_points' dehomogenization
        fx = jnp.clip(
            jnp.round(u / z_).astype(jnp.int32) + offset, 0, width
        )
        fy = jnp.clip(
            jnp.round(w_ / z_).astype(jnp.int32) + offset, 0, height
        )
        ez = (fx == 0) | (fy == 0) | miss
        fx = jnp.where(ez, 0, fx)
        fy = jnp.where(ez, 0, fy)

        sent = ez  # (nb, d, 128)
        gx = fx.reshape(nb, G, gd * RAYS_PER_BLOCK)
        gy = fy.reshape(nb, G, gd * RAYS_PER_BLOCK)
        gs = sent.reshape(nb, G, gd * RAYS_PER_BLOCK)
        mnx = jnp.where(gs, big, gx).min(axis=2)  # (nb, G)
        mny = jnp.where(gs, big, gy).min(axis=2)
        mxx = jnp.where(gs, -1, gx).max(axis=2)
        mxy = jnp.where(gs, -1, gy).max(axis=2)
        mnx = jnp.minimum(mnx, jnp.maximum(mxx, 0))
        mny = jnp.minimum(mny, jnp.maximum(mxy, 0))

        bh, bwg = box_specs[vi]
        bw_px = (bwg - 8) * 4 - 3
        fit_v = ((mxy - mny + 1) <= bh).all() & (
            (mxx - mnx + 1) <= bw_px
        ).all()
        fits = fit_v if fits is None else (fits & fit_v)

        y0 = jnp.clip(mny, 0, max(hfp - bh, 0))  # (nb, G)
        xg0 = jnp.clip((mnx // 32) * 8, 0, max(wgp - bwg, 0))
        origin_rows.append(
            jnp.stack([y0, xg0], axis=-1).astype(jnp.int32)  # (nb, G, 2)
        )

        ly = gy - y0[:, :, None]
        lrow = ly * bwg + (gx // 4 - xg0[:, :, None])
        lcell = jnp.where(gs, -1, lrow * 4 + (gx & 3))
        cell_rows.append(lcell.reshape(nb, 1, d * RAYS_PER_BLOCK))

    cellids = jnp.concatenate(cell_rows, axis=1)  # (NB, V, T) depth-major
    origins = jnp.stack(origin_rows, axis=1).reshape(-1)  # (nb, V, G, 2)
    return cellids, origins, fits


def banded_scores_from_segments(
    features, P, ray_start, ray_end, depth_planes, padding,
    height, width, box_specs, interpret=False, packed=None,
):
    """Lane-major banded plane sweep straight from ray segments.

    Sampling, projection, feature-cell mapping, per-depth-group origins
    and packed cell ids all run in (NB, D, 128) layout — RAYS IN LANES.
    The legacy route materialized an (N, D, V, 2) index tensor whose
    2-wide minor dim pads to 128 lanes on TPU (measured ~12 ms per
    65k-ray batch just for the projection chain vs ~1 ms here).

    Returns (pair_sum (N, D) f32 pre-softmax/pre-/n_pairs, fits) where
    ``fits`` is the in-graph strict-band check (False => the static boxes
    do not cover this batch and the scores are garbage).

    Arithmetic parity: same formulas as sample_points_along_segments +
    project_points + pixel_to_feature_idx with the projection lerped in
    HOMOGENEOUS coordinates (affine in the depth fraction — endpoint
    projections once per view, one madd per depth); the f32
    reassociation vs the XLA path's point-then-project order may flip a
    round()-boundary cell on ~1e-6 of targets.
    """
    v = features.shape[0]
    n = ray_start.shape[0]
    d = depth_planes
    nb = n // RAYS_PER_BLOCK

    if packed is None:
        packed = pack_features_for_bands(features, box_specs)
    feats_packed, f00 = packed
    hfp, wgp = feats_packed.shape[1], feats_packed.shape[2]

    cellids, origins, fits = banded_front_end(
        P, ray_start, ray_end, depth_planes, padding, height, width,
        box_specs, hfp, wgp, v,
    )

    pair = _banded_pair_sums(
        feats_packed, origins, cellids, f00,
        tuple(box_specs), v, d, interpret=interpret,
    )
    pair = jnp.transpose(
        pair.reshape(nb, d, RAYS_PER_BLOCK), (0, 2, 1)
    ).reshape(n, d)
    return pair, fits


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

    # one packing implementation: the kernel's DMA-origin clamps must
    # match the padding math exactly (see _pack_features)
    feats_packed, hfp, wgp = _pack_features(features, box_specs)

    mins, _ = compute_band_boxes(fidx, d)  # (NB, G, V, 2)
    bhs = jnp.asarray([s[0] for s in box_specs], jnp.int32)
    bwgs = jnp.asarray([s[1] for s in box_specs], jnp.int32)
    y0 = jnp.clip(
        mins[..., 0], 0, jnp.maximum(hfp - bhs[None, None, :], 0)
    )  # (NB, G, V)
    # origin in 8-group (32 px) units so DMA offsets stay tile-aligned
    xg0 = jnp.clip(
        (mins[..., 1] // 32) * 8,
        0, jnp.maximum(wgp - bwgs[None, None, :], 0),
    )
    # kernel origin layout: [((b*V + v)*G + g)*2]
    origins = jnp.stack(
        [jnp.transpose(y0, (0, 2, 1)), jnp.transpose(xg0, (0, 2, 1))],
        axis=-1,
    ).reshape(-1).astype(jnp.int32)

    # Local packed cell ids per depth group; clamp sentinel (0,0) -> -1.
    # Computed in fidx's own (nb, 128, D, V) layout (no transpose of the
    # tiny-minor-dim tensor), then ONE permute whose OUTPUT minor dim is
    # the 128-ray axis.
    fb = fidx.reshape(nb, RAYS_PER_BLOCK, d, v, 2)
    fx, fy = fb[..., 0], fb[..., 1]  # (nb, 128, D, V)
    sent = (fx == 0) & (fy == 0)
    y0d = jnp.repeat(y0, _group_d(d), axis=1)  # (nb, D, V) per-plane origins
    xg0d = jnp.repeat(xg0, _group_d(d), axis=1)
    ly = fy - y0d[:, None, :, :]
    lrow = ly * bwgs[None, None, None, :] + (fx // 4 - xg0d[:, None, :, :])
    lcell = lrow * 4 + (fx & 3)
    lcell = jnp.where(sent, -1, lcell)
    T = RAYS_PER_BLOCK * d
    cellids = jnp.transpose(lcell, (0, 3, 2, 1)).reshape(
        nb, v, T
    )  # (NB, V, T) depth-major targets (t = d*128 + r)

    v_pad = -(-v // 8) * 8
    f00 = jnp.zeros((32, v_pad), jnp.float32)
    f00 = f00.at[:, :v].set(features[:, 0, 0, :].T.astype(jnp.float32))

    pair = _banded_pair_sums(
        feats_packed, origins, cellids, f00,
        tuple(box_specs), v, d, interpret=interpret,
    )  # (NB, 1, T); targets DEPTH-major within a block (t = dd*128 + r)
    return jnp.transpose(
        pair.reshape(nb, d, RAYS_PER_BLOCK), (0, 2, 1)
    ).reshape(n, d)
