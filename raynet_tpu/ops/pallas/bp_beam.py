"""Pallas TPU kernel: fused RayNet BP sweep over frustum beams.

Round 1 measured the BP grid interaction (a 42M-element XLA gather + a 42M
scatter-add per sweep, ~15-22 ns each) at ~85% of the full message step.
This kernel replaces the whole per-sweep chain — voxel traversal, the
depth->voxel hat mapping, the occupancy gather, the per-ray message
recurrences, and the grid scatter — with ONE program per 256-ray block:

- The grid is viewed SLICE-MAJOR along each image's dominant ray axis
  (wrapper transposes once per call; the transpose is bandwidth-cheap).
  Rays march slice by slice: per slice a ray takes at most K non-dominant
  DDA steps (K planned from the ray geometry), so every path position has
  a STATIC slot (slice * K + k) — no data-dependent addressing anywhere.
- A block's rays form a frustum beam; per slice its footprint fits a
  (NSTRIPE x BA x 128)-cell box. Boxes stream through VMEM one 8-slice
  group at a time (double-buffered DMA), so box size is almost free.
- The occupancy gather and the message scatter are two-level one-hot
  contractions against the per-slice box (row pick on the MXU, lane pick
  by sublane compare) — rays stay in lanes end to end, no transposes.
  PRECISION: Mosaic lowers in-kernel f32 dot_general at DEFAULT
  precision with bf16-TRUNCATED operands (probed bit-exactly on v5e,
  2026-08-19 — see tools/probe_dma_align.py), so the gathered grid
  log-odds and the scattered message deltas carry ~2^-8 relative
  (~0.12 absolute at the ±30 log-odds clip) rounding the XLA reference
  path does not have. Deliberate: the parity tests bound it, the
  on-device depth agreement stays 1.0, and exact values would cost
  2-3x the dot passes (hi/mid/lo bf16 value splits) in the hottest
  kernel. The one-hot operand itself is exact in bf16.
- The scatter accumulates by read-modify-write DMA into an aliased HBM
  grid (Pallas TPU grid steps run sequentially on the core, so there are
  no races); the wrapper gets the accumulated grid back directly.
- The linear-time message recurrences (cumsum/cumprod of mrf.py, i.e.
  mrf_bp.cu:88-167) run in-kernel as per-slice partial products combined
  by a short serial cross-slice chain per 8-slice group.

The march is CLOSED FORM (round 3): the DDA's per-axis crossing times are
arithmetic sequences t_a(n) = t_max_a + n*t_delta_a, so a ray's state at
the entry of ANY slice (lateral cell positions, crossing counts, emission
index) is computable directly — no serial slice-to-slice carry. All
entry-state math runs as (8, RAYS) ops over a whole slice group at once
(the serial formulation issued ~55 (1, RAYS) ops per substep and was
issue-bound). Within a slice, the <=K-1 lateral events are replayed with
the same closed-form times. ops/ray_marching.py, ops/pallas/traversal.py
and tests/oracles.py use the same closed-form arithmetic, so all four
implementations order crossings identically (the reference's incremental
``t += t_delta`` drifts ~1e-5 over hundreds of steps; closed form agrees
with it everywhere except ties closer than f32 rounding).

Slot storage is k-major within each 8-slice group (slot = g*8K + k*8 + u)
— an internal layout of the per-image message arrays; DDA-order message
semantics are preserved exactly by the prefix restructure above.

Wrapper-side planning (host, once per image geometry): dominant axis +
sign check, K bound, per-block beam boxes. Images the planner cannot
guarantee (mixed dominant-axis signs, K over budget, boxes too wide) keep
the XLA path — coverage is never traded (the one numeric divergence
from the XLA path is the documented bf16 value rounding in the
gather/scatter dots above).
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAYS = 256  # rays per block (two 16x8 pixel tiles = a 16x16 block)
# NOTE: a "windowed hat mapping" (walk a planned score window instead of
# all D planes in the hat pass) was built, device-A/B'd in rounds 3-4,
# and REMOVED: three independent v5e runs measured the windowed walk
# ~5-6% SLOWER than the full D-plane loop at bench geometry (9.61 vs
# 9.11, 10.86 vs 10.43, 11.10 vs 10.44 ms) — the 8-snapped dynamic
# sublane offset + runtime coverage guard cost more than the skipped
# planes save. See git history (HAT_WINDOW) if depth_planes ever grows
# far beyond 32, where the trade could flip.
_EPS = 1e-2
_DEBUG_HAT_OFF = False  # A/B timers only: replace the hat D-loop with ts
# 2-tap hat lerp via sublane dynamic gathers instead of the D-iteration
# masked sum (needs D % 8 == 0; exact — same two nonzero terms, same
# association). Module knob for device A/Bs (tools/time_kernels.py).
_HAT_GATHER = True
_FLT_MAX = 3.4028235e38
_CLIP_S = 1e-5
_CLIP_MU = 1e-4
_EPS_T = 1e-4
# Tried and rejected (device A/B 2026-08-19): casting the gather/
# scatter one-hot MXU operands to bf16 measured NEUTRAL (10.29 vs
# 10.18 ms beam kernel at 1024-ray blocks) — Mosaic's f32 dots are not
# multi-pass-bound here, so the cast only risked value precision.


# --------------------------------------------------------------------- #
# planning                                                               #
# --------------------------------------------------------------------- #



def _reject(reason, explain):
    return (None, reason) if explain else None


def _dom_sign_and_fill(s, e, bins, rays):
    """Dominant axis + march direction over rays whose line HITS the bbox.

    Miss rays arrive as zero-length segments (rays_entry_exit_bbox) —
    before this existed their reversed slab garbage flipped the dominant
    sign test and exploded the lateral-K statistics, rejecting every rig
    whose corner rays leave the bbox. For span/K statistics each miss ray
    is replaced by a hit ray from its OWN block (block-local boxes stay
    tight); at runtime miss rays are dead lanes (outside the grid, masked
    from the drifting-origin minima), so the fill never has to cover them.

    Returns (s, e, dom, flip, reason) — flip None when rejected, with
    reason "empty-rays" (nothing hits) or "mixed-dominant-sign"
    (genuinely mixed signs among hitting rays). CONSUMES s/e: the native
    path fills them in place; always use the returned arrays.
    """
    # Native in-place pass when available: the numpy form below costs
    # ~3 s per 720p view on a single-core host (two (N, 3) f64 copies
    # plus gather/where passes). CONTRACT: this function CONSUMES s/e —
    # the native path mutates them in place (the numpy fallback returns
    # fresh arrays); callers must treat their s/e as dead after the call
    # and use only the returned arrays (_plan_prologue passes fresh
    # arrays from host_rays_entry_exit and does exactly that).
    if (
        isinstance(s, np.ndarray)
        and s.dtype == np.float64
        and s.flags.c_contiguous
        and isinstance(e, np.ndarray)
        and e.dtype == np.float64
        and e.flags.c_contiguous
    ):
        from ...native import dom_sign_and_fill, is_available

        if is_available():
            dom, flip, reason = dom_sign_and_fill(
                s, e, rays, np.asarray(bins, np.float64)
            )
            return s, e, dom, flip, reason
    return _dom_sign_and_fill_numpy(s, e, bins, rays)


def _dom_sign_and_fill_numpy(s, e, bins, rays):
    """Pure-numpy fallback / oracle for :func:`_dom_sign_and_fill`."""
    ray = e - s
    hit = np.abs(ray).sum(axis=1) > 0
    if not hit.any():
        return s, e, 0, None, "empty-rays"
    cells = np.abs(ray[hit]) / bins[None]
    dom = int(np.argmax(cells.mean(axis=0)))
    sgn = ray[hit, dom]
    if np.all(sgn > 0):
        flip = False
    elif np.all(sgn < 0):
        flip = True
    else:
        return s, e, dom, None, "mixed-dominant-sign"
    if not hit.all():
        nb = len(s) // rays
        trim = nb * rays
        hb = hit[:trim].reshape(nb, rays)
        first = np.argmax(hb, axis=1)
        has = hb.any(axis=1)
        gsrc = int(np.flatnonzero(hit)[0])
        src = np.where(has, np.arange(nb) * rays + first, gsrc)
        fill = np.repeat(src, rays)
        s = s.copy()
        e = e.copy()
        s[:trim] = np.where(hit[:trim, None], s[:trim], s[fill])
        e[:trim] = np.where(hit[:trim, None], e[:trim], e[fill])
        # the sampled-path tail (partial block) keeps zero-length rows:
        # they contribute no crossings to _exact_k
    return s, e, dom, flip, "ok"


class BpBeamConfig:
    """Static per-image-geometry kernel configuration (hashable)."""

    def __init__(self, perm, S, A, B, K, BA, nstripe, depth_planes,
                 max_voxels, bins, prior, grid_shape, flip=False,
                 rays=RAYS):
        self.perm = perm  # permuted axis order, perm[0] = dominant
        self.flip = flip  # dominant axis mirrored (negative ray sign)
        self.S, self.A, self.B = S, A, B
        self.K, self.BA, self.nstripe = K, BA, nstripe
        self.depth_planes = depth_planes
        self.max_voxels = max_voxels
        self.bins = bins  # per PERMUTED axis, python floats
        self.prior = prior
        self.grid_shape = grid_shape  # original order
        self.rays = rays  # rays per kernel block
        self.slots = S * K
        self.Bg = -(-B // 128)
        self.rows = BA * nstripe  # one-hot rows per slice box

    def _key(self):
        return (self.perm, self.S, self.A, self.B, self.K, self.BA,
                self.nstripe, self.depth_planes, self.max_voxels,
                self.bins, self.prior, self.grid_shape, self.flip,
                self.rays)

    def replace(self, **kw):
        """Copy with named fields overridden — the single construction
        point for derived configs (rebuilding positionally silently
        drops newly added fields)."""
        args = dict(
            perm=self.perm, S=self.S, A=self.A, B=self.B, K=self.K,
            BA=self.BA, nstripe=self.nstripe,
            depth_planes=self.depth_planes, max_voxels=self.max_voxels,
            bins=self.bins, prior=self.prior, grid_shape=self.grid_shape,
            flip=self.flip, rays=self.rays,
        )
        args.update(kw)
        return BpBeamConfig(
            args["perm"], args["S"], args["A"], args["B"], args["K"],
            args["BA"], args["nstripe"], args["depth_planes"],
            args["max_voxels"], args["bins"], args["prior"],
            args["grid_shape"], flip=args["flip"], rays=args["rays"],
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, BpBeamConfig) and self._key() == other._key()

    def __repr__(self):
        return "BpBeamConfig(perm=%s S=%d K=%d BA=%d ns=%d)" % (
            self.perm, self.S, self.K, self.BA, self.nstripe
        )


def _plan_prologue(
    P_pinv, camera_center, bbox, grid_shape, height, width,
    ray_idxs, rays, k_cap, sample_stride=None,
):
    """Shared planner front half: ray-list decode/pad (or tile-ordered
    block sampling when ``sample_stride`` is set and no list is given),
    segments, dominant axis + march direction over bbox-hitting rays,
    exact K, and the S%8/nb gates. Returns (state_dict, "ok") or
    (None, reason)."""
    from .planesweep import tile_ids
    from ..geometry import host_rays_entry_exit

    bbox = np.asarray(bbox, np.float64).reshape(6)
    grid_shape = tuple(int(g) for g in grid_shape)
    n = height * width
    if ray_idxs is not None:
        keep_idxs = np.asarray(ray_idxs, np.int32)
        # negative-encoded pad entries duplicate the preceding ray
        keep_idxs = np.where(keep_idxs < 0, -keep_idxs - 1, keep_idxs)
        if len(keep_idxs) == 0:
            return None, "empty-rays"
        pad = (-len(keep_idxs)) % rays
        if pad:  # runtime pads partial blocks by repeating the last ray
            keep_idxs = np.concatenate(
                [keep_idxs, np.full(pad, keep_idxs[-1], np.int32)]
            )
        idxs = keep_idxs
    elif sample_stride is not None:
        # Sample whole TILE-ORDERED blocks (strided single rays would
        # fake blocks spanning many tiles and blow the box estimates).
        all_idxs = np.arange(n, dtype=np.int32)
        perm_t = np.argsort(
            tile_ids(all_idxs, height), kind="stable"
        ).astype(np.int32)
        nblk = max(n // rays, 1)
        blocks = np.arange(0, nblk, sample_stride)
        keep = (blocks[:, None] * rays + np.arange(rays)[None]).reshape(-1)
        keep = keep[keep < n]
        idxs = perm_t[keep]
    else:
        # walk EVERY block exactly as the runtime forms them
        all_idxs = np.arange(n, dtype=np.int32)
        perm_t = np.argsort(
            tile_ids(all_idxs, height), kind="stable"
        ).astype(np.int32)
        pad = (-n) % rays
        if pad:
            perm_t = np.concatenate([perm_t, np.repeat(perm_t[-1:], pad)])
        idxs = perm_t

    bins = (bbox[3:] - bbox[:3]) / np.asarray(grid_shape, np.float64)
    if _use_device_planner():
        # device march (see _plan_prologue_multi / ops/bp_plan_device)
        from ..bp_plan_device import device_plan_agg, device_plan_state

        st_dev, reason = device_plan_state(
            idxs, P_pinv, camera_center, bbox, grid_shape, height, rays,
            cache_key=(
                ("tile", height, width, rays)
                if ray_idxs is None and sample_stride is None
                else None
            ),
        )
        if st_dev is None:
            return None, reason
        dom, flip = st_dev["dom"], st_dev["flip"]
        others = [a for a in range(3) if a != dom]
        perm = (dom, others[0], others[1])
        S = grid_shape[dom]
        if S % 8:
            return None, "s-mod-8"
        nb = len(idxs) // rays
        if nb == 0:
            return None, "no-blocks"
        block_stats = _needs_from_agg(*device_plan_agg(st_dev, rays), 1)
        k = int(block_stats[0].max())
        if k > k_cap:
            return None, "k-cap"
        return dict(
            s=None, e=None, bins=bins, bbox=bbox, grid_shape=grid_shape,
            perm=perm, others=others, flip=flip, k=k, S=S,
            A=grid_shape[others[0]], B=grid_shape[others[1]],
            nb=nb, block_stats=block_stats,
        ), "ok"

    # Host f64 segments (exact miss-collapse parity with the device op):
    # the planner used to dispatch the f32 segment program and download
    # 22 MB/view through the axon tunnel (~1.4 s at 720p); numpy f64 is
    # ~0.3 s and MORE precise — planner-f64 vs runtime-f32 divergence is
    # already budgeted (+-2 cells) downstream.
    s, e = host_rays_entry_exit(
        idxs, P_pinv, camera_center, bbox, height, dtype=np.float64
    )
    s, e, dom, flip, reason = _dom_sign_and_fill(s, e, bins, rays)
    if flip is None:
        return None, reason
    others = [a for a in range(3) if a != dom]
    perm = (dom, others[0], others[1])

    S = grid_shape[dom]
    if S % 8:
        return None, "s-mod-8"
    nb = len(s) // rays
    if nb == 0:
        return None, "no-blocks"

    # K = 1 (slice-entry voxel) + max lateral DDA steps inside ANY single
    # slice, counted EXACTLY per (ray, slice) with a conservative
    # boundary slack. The old closed-form bound ceil(la)+ceil(lb)+1
    # budgeted a lateral slot per axis per slice even when a ray takes
    # one lateral step every ~10 slices. The native single-pass planner
    # also yields the per-block beam-box spans consumed downstream.
    block_stats = _plan_stats_per_block(
        s, e, bbox, bins, perm, grid_shape, flip, rays
    )
    if block_stats is not None:
        k = int(block_stats[0].max())
    else:
        k = _exact_k(s, e, bbox, bins, perm, grid_shape, flip)
    if k > k_cap:
        return None, "k-cap"

    return dict(
        s=s, e=e, bins=bins, bbox=bbox, grid_shape=grid_shape, perm=perm,
        others=others, flip=flip, k=k, S=S, A=grid_shape[others[0]],
        B=grid_shape[others[1]], nb=nb, block_stats=block_stats,
    ), "ok"


def plan_bp_config(
    P_pinv, camera_center, bbox, grid_shape, height, width,
    depth_planes, max_voxels, gamma=0.05, k_cap=8, ba_cap=128,
    sample_stride=7, ray_idxs=None, rays=RAYS, explain=False,
):
    """Host-side planning. Returns a BpBeamConfig, or None when the kernel
    cannot cover this image exactly (caller keeps the XLA path); with
    ``explain`` returns (cfg_or_None, reason_str) instead.

    ``ray_idxs`` (optional): plan for THIS tile-sorted ray list (e.g. a
    GT-masked subset from ``filter_out_rays``) instead of the full image.
    The planner then walks every 256-ray block exactly as the runtime will
    form them (``sample_stride`` is ignored: filtered blocks can span
    distant tiles, so sampling could miss the widest block)."""
    st, reason = _plan_prologue(
        P_pinv, camera_center, bbox, grid_shape, height, width,
        ray_idxs, rays, k_cap,
        sample_stride=None if ray_idxs is not None else sample_stride,
    )
    if st is None:
        return _reject(reason, explain)
    return _config_from_state(
        st, depth_planes, max_voxels, gamma, ba_cap, rays, explain
    )


def _config_from_state(
    st, depth_planes, max_voxels, gamma, ba_cap, rays, explain
):
    """plan_bp_config's back half: BpBeamConfig (or reject) from a
    prologue state — shared with the fused multi-candidate planner."""
    s, e, bins, bbox = st["s"], st["e"], st["bins"], st["bbox"]
    grid_shape, perm, others = st["grid_shape"], st["perm"], st["others"]
    flip, k, S, A, B, nb = (
        st["flip"], st["k"], st["S"], st["A"], st["B"], st["nb"]
    )

    # Per-(block, 8-slice-group) box spans: the beam origin DRIFTS with the
    # slice group, so the static box only has to cover a group's footprint
    # (tile + divergence + in-group drift), not the whole path's lateral
    # travel — typically 8-16 cells instead of 50-130.
    trim = nb * rays
    ngrp = S // 8
    if st["block_stats"] is not None:
        need_a = int(st["block_stats"][1].max())
        need_b = int(st["block_stats"][2].max())
    else:
        need_a, need_b = _group_spans(
            s[:trim], e[:trim], bbox, bins, perm, S, ngrp, rays=rays,
            flip=flip,
        )

    ba = need_a  # snap-aware box extent (see _group_spans)
    for bucket in _BA_BUCKETS:
        if ba <= bucket:
            ba = bucket
            break
    else:
        return _reject("ba-cap-bucket", explain)
    if ba > ba_cap:
        return _reject("ba-cap", explain)
    nstripe = max(1, -(-need_b // 128))
    if nstripe > 4:
        return _reject("nstripe-cap", explain)
    if est_scoped_vmem(
        S, k, ba, nstripe, int(depth_planes), rays
    ) > _SCOPED_VMEM_LIMIT:
        return _reject("vmem", explain)

    prior = float(np.log(gamma) - np.log(1.0 - gamma))
    cfg = BpBeamConfig(
        perm, S, A, B, k, ba, nstripe, int(depth_planes), int(max_voxels),
        tuple(float(b) for b in bins[list(perm)]), prior, grid_shape,
        flip=flip, rays=rays,
    )
    return (cfg, "ok") if explain else cfg


_BA_BUCKETS = (16, 24, 32, 48, 64, 96, 128, 192, 256)  # multiples of 8
_ROWS_CAP = 512  # ba*nstripe bound: keeps the gather-group VMEM ~4 MB
# Mosaic's DEFAULT scoped-VMEM budget is 16 MiB, but a v5e core has
# 128 MiB of VMEM — bp_beam_call raises its own ceiling via
# CompilerParams(vmem_limit_bytes). The planner guard keeps headroom
# below that ceiling. The estimator was calibrated against a
# compiler-measured 24.62 MiB config (model read 24.97, +1.4%).
_VMEM_LIMIT_BYTES = 64 << 20
_SCOPED_VMEM_LIMIT = 58 << 20


def est_scoped_vmem(S, K, BA, nstripe, depth_planes, rays):
    """Scoped-VMEM bytes of one bp_beam_call program: the four
    (slots, rays) scratches, double-buffered input blocks, output
    blocks, and the rays-independent box buffers (gather double-buffer
    + RMW stage + delta accumulator). Calibrated against a v5e OOM
    (see _SCOPED_VMEM_LIMIT)."""
    slots = S * K
    per_ray = 4 * (4 * slots)  # cell/t/mu/sv scratches
    per_ray += 4 * 2 * (16 + depth_planes + slots)  # inputs, 2x buffered
    per_ray += 4 * (slots + 8)  # outputs
    fixed = 4 * (5 * 8 * nstripe * BA * 128)  # gbuf(2) + dstage(2) + dacc
    # the compiler's measured allocation ran 8% above this structural
    # sum on the calibration config (stack temporaries / alignment; modeled as +9%)
    return int(per_ray * rays * 1.09) + fixed


def plan_cost_ms(cfg):
    """Kernel-time model for choosing among otherwise-valid configs
    (rays-per-block candidates). Calibrated on v5e 65k-ray sweeps
    (2026-08-19 device A/B: 256/512/1024 rays at 64 rows =
    11.75/10.72/10.18 ms): march+hat+recurrences ~4.7 ms, one-hot
    gather/scatter dots ~5.5 ms at 64 rows and proportional to rows,
    and a ~55 us-per-block overhead factor."""
    rows = cfg.BA * cfg.nstripe
    return (4.7 + 5.5 * rows / 64.0) * (1.0 + 55.0 / cfg.rays)


def rays_candidates(unit):
    """Rays-per-block candidates to plan for a per-device batch of
    ``unit`` rays, largest first. 2048 fits the raised scoped-VMEM
    ceiling (~25 MiB, vmem_limit_bytes=64 MiB) but measured NEUTRAL on
    device (10.20 vs 10.01 ms at 1024, v5e 2026-08-19) — the serial
    march is issue-bound, so wider blocks stopped paying past 1024;
    planning the top TWO lets the cost model reject a bigger-rays plan
    whose box bucket jumped (a wider block footprint can need the next
    _BA_BUCKETS step, and rows cost more than blocks save).

    A ``unit`` that no candidate divides (ADVICE r4: silently returning
    [] sent the orchestrator to the ~30x slower XLA path) falls back to
    planning rays=256 — the planners pad partial blocks, and runtime
    callers pad batches to whole blocks — with a one-line stderr note."""
    cands = [r for r in (1024, 512, 256) if unit % r == 0][:2]
    if not cands and unit >= 256:
        print(
            "bp_beam: unit=%d is not a multiple of 256; planning "
            "rays=256 with padding" % (unit,),
            file=sys.stderr,
        )
        cands = [256]
    return cands


def plan_bp_config_auto(P_pinv, camera_center, bbox, grid_shape, height,
                        width, depth_planes, max_voxels, unit, **kw):
    """plan_bp_config over rays_candidates(unit); returns the
    cost-model-cheapest viable plan, or None when nothing plans.

    With ``ray_idxs`` (every block walked — no sampling) the candidates
    share one native march via _plan_prologue_multi; the sampled
    whole-image path stays per-candidate (each samples ~1/stride of the
    blocks, so two sampled runs are cheaper than one full march).

    Extra ``kw`` are forwarded to plan_bp_config on the sampled path and
    IGNORED on the fused-states path (only gamma/ba_cap/k_cap are read
    there). ``explain`` is rejected outright: it changes plan_bp_config's
    return type to a (cfg, reason) tuple, which the cost-model selection
    here cannot consume (ADVICE r4)."""
    if kw.pop("explain", False):
        raise ValueError(
            "plan_bp_config_auto does not support explain=True; call "
            "plan_bp_config(..., explain=True) per candidate instead"
        )
    cands = rays_candidates(unit)
    states = (
        _plan_prologue_multi(
            P_pinv, camera_center, bbox, grid_shape, height, width,
            kw["ray_idxs"], cands, kw.get("k_cap", 8),
        )
        if kw.get("ray_idxs") is not None and len(cands) > 1
        else None
    )
    best = None
    for rays in cands:
        if states is not None:
            st, _reason = states[rays]
            cfg = (
                None
                if st is None
                else _config_from_state(
                    st, depth_planes, max_voxels, kw.get("gamma", 0.05),
                    kw.get("ba_cap", 128), rays, False,
                )
            )
        else:
            cfg = plan_bp_config(
                P_pinv, camera_center, bbox, grid_shape, height, width,
                depth_planes, max_voxels, rays=rays, **kw
            )
        if cfg is not None and (
            best is None or plan_cost_ms(cfg) < plan_cost_ms(best)
        ):
            best = cfg
    return best


def classes_cost_ms(info):
    """Block-weighted cost of a plan_bp_classes result."""
    cl, cs = info["cfg_large"], info["cfg_small"]
    if cs is None:
        return plan_cost_ms(cl)
    f = float(np.mean(info["small_mask"]))
    return f * plan_cost_ms(cs) + (1.0 - f) * plan_cost_ms(cl)


def _needs_from_agg(k_blk, lo_a, hi_a, lo_b, hi_b, factor):
    """Per-COARSE-block (k, need_a, need_b) from fine-block raw planner
    aggregates (native bp_plan_agg): a coarse block is ``factor``
    consecutive fine blocks, its K the max and its group lo/hi the
    elementwise min/max over them; the snap-aware need reduction mirrors
    the C++ form in bp_plan_stats_raw exactly (all values are integer
    floors, so the float arithmetic is exact)."""
    nbf, ngrp = lo_a.shape
    nb = nbf // factor
    trim = nb * factor
    k = k_blk[:trim].reshape(nb, factor).max(1)
    la = lo_a[:trim].reshape(nb, factor, ngrp).min(1)
    ha = hi_a[:trim].reshape(nb, factor, ngrp).max(1)
    lb = lo_b[:trim].reshape(nb, factor, ngrp).min(1)
    hb = hi_b[:trim].reshape(nb, factor, ngrp).max(1)
    a0 = 8.0 * np.floor((la - 3.0) / 8.0)
    bg = 128.0 * np.floor((lb - 3.0) / 128.0)
    sa = (ha + 3.0 - a0).max(1)
    sb = (hb + 3.0 - bg).max(1)
    return (
        k.astype(np.int32), sa.astype(np.int32), sb.astype(np.int32)
    )


def _plan_prologue_multi(P_pinv, camera_center, bbox, grid_shape, height,
                         width, ray_idxs, rays_list, k_cap):
    """One shared planner march serving SEVERAL rays-per-block
    candidates: ray decode/pad (to the coarsest candidate), segments,
    dominant axis/fill and the native per-fine-block aggregates run
    ONCE; each candidate's block stats derive by reduction
    (_needs_from_agg). Returns {rays: (state_or_None, reason)} or None
    when unavailable (no native library / non-nesting candidates) —
    callers then fall back to per-candidate _plan_prologue.

    Walks EVERY block (the classes-planner contract — no sampling).
    Derived plans can differ from a direct coarse _plan_prologue only
    through miss refills: a fully-miss FINE sub-block borrows a global
    hit ray where the coarse refill would use an in-block one, which
    can only WIDEN the derived spans — safe (at worst a boundary block
    buckets up)."""
    fine = min(rays_list)
    coarse = max(rays_list)
    if any(r % fine for r in rays_list):
        return None
    use_device = _use_device_planner()
    if not use_device:
        try:
            from ...native import bp_plan_agg, is_available
        except ImportError:
            return None
        if not is_available():
            return None

    bbox = np.asarray(bbox, np.float64).reshape(6)
    grid_shape = tuple(int(g) for g in grid_shape)
    n = height * width
    if ray_idxs is not None:
        keep = np.asarray(ray_idxs, np.int32)
        keep = np.where(keep < 0, -keep - 1, keep)
        if len(keep) == 0:
            return {r: (None, "empty-rays") for r in rays_list}
        pad = (-len(keep)) % coarse
        if pad:
            keep = np.concatenate(
                [keep, np.full(pad, keep[-1], np.int32)]
            )
        idxs = keep
        idx_cache_key = None
    else:
        from ..bp_plan_device import unfiltered_tile_idxs

        idxs = unfiltered_tile_idxs(height, width, coarse)
        idx_cache_key = ("tile", height, width, coarse)

    bins = (bbox[3:] - bbox[:3]) / np.asarray(grid_shape, np.float64)
    if use_device:
        # DEVICE planner march (the TPU-native bp_plan_agg): the
        # per-ray closed forms vectorize onto the chip; only the
        # per-block aggregates come back (~2 MB/view vs ~0.5-1 s/view
        # of single-core host march, VERDICT r4 #3)
        from ..bp_plan_device import device_plan_agg, device_plan_state

        st_dev, reason = device_plan_state(
            idxs, P_pinv, camera_center, bbox, grid_shape, height, fine,
            cache_key=idx_cache_key,
        )
        if st_dev is None:
            return {r: (None, reason) for r in rays_list}
        dom, flip = st_dev["dom"], st_dev["flip"]
        others = [a for a in range(3) if a != dom]
        perm = (dom, others[0], others[1])
        S = grid_shape[dom]
        if S % 8:
            return {r: (None, "s-mod-8") for r in rays_list}
        agg = device_plan_agg(st_dev, fine)
        s = e = None
        n_rays_total = st_dev["n"]
    else:
        from ..geometry import host_rays_entry_exit

        s, e = host_rays_entry_exit(
            idxs, P_pinv, camera_center, bbox, height, dtype=np.float64
        )
        s, e, dom, flip, reason = _dom_sign_and_fill(s, e, bins, fine)
        if flip is None:
            return {r: (None, reason) for r in rays_list}
        others = [a for a in range(3) if a != dom]
        perm = (dom, others[0], others[1])
        S = grid_shape[dom]
        if S % 8:
            return {r: (None, "s-mod-8") for r in rays_list}
        bmin = np.asarray(bbox[:3], np.float64)
        pb = np.asarray([bins[a] for a in perm], np.float64)
        from ...native import bp_plan_agg

        agg = bp_plan_agg(
            s, e, fine, S, S // 8, pb, perm, flip, bmin, S * pb[0],
            1e-4, _EPS,
        )
        n_rays_total = len(s)
    out = {}
    for r in rays_list:
        nb = n_rays_total // r
        if nb == 0:
            out[r] = (None, "no-blocks")
            continue
        stats = _needs_from_agg(*agg, r // fine)
        k = int(stats[0].max())
        if k > k_cap:
            out[r] = (None, "k-cap")
            continue
        out[r] = (
            dict(
                s=s, e=e, bins=bins, bbox=bbox, grid_shape=grid_shape,
                perm=perm, others=others, flip=flip, k=k, S=S,
                A=grid_shape[others[0]], B=grid_shape[others[1]],
                nb=nb, block_stats=stats,
            ),
            "ok",
        )
    return out


def _use_device_planner():
    """Device planner gate — see ops.bp_plan_device (shared with the
    band-spec span program; RAYNET_DEVICE_PLANNER=0/1 overrides)."""
    from ..bp_plan_device import _use_device_planner as gate

    return gate()


def plan_bp_classes_auto(P_pinv, camera_center, bbox, grid_shape, height,
                         width, depth_planes, max_voxels, unit,
                         gamma=0.05, k_cap=8, ray_idxs=None,
                         min_rows_ratio=2.6, small_quantile=0.75):
    """plan_bp_classes over rays_candidates(unit); returns the
    cost-model-cheapest viable class plan, or None. With the native
    library the candidates share ONE planner march
    (_plan_prologue_multi) — the per-ray K/span pass is the dominant
    cold-plan cost (~3 s per DTU-resolution view, x2 candidates,
    x49 views before the fusion)."""
    cands = rays_candidates(unit)
    states = (
        _plan_prologue_multi(
            P_pinv, camera_center, bbox, grid_shape, height, width,
            ray_idxs, cands, k_cap,
        )
        if len(cands) > 1
        else None
    )
    best = None
    for rays in cands:
        if states is not None:
            st, _reason = states[rays]
            info = (
                None
                if st is None
                else _classes_from_state(
                    st, depth_planes, max_voxels, gamma, rays,
                    min_rows_ratio, small_quantile,
                )
            )
        else:
            info = plan_bp_classes(
                P_pinv, camera_center, bbox, grid_shape, height, width,
                depth_planes, max_voxels, gamma=gamma, k_cap=k_cap,
                ray_idxs=ray_idxs, rays=rays,
                min_rows_ratio=min_rows_ratio,
                small_quantile=small_quantile,
            )
        if info is not None and (
            best is None or classes_cost_ms(info) < classes_cost_ms(best)
        ):
            best = info
    return best


def plan_bp_classes(
    P_pinv, camera_center, bbox, grid_shape, height, width,
    depth_planes, max_voxels, gamma=0.05, k_cap=8,
    ray_idxs=None, rays=RAYS, min_rows_ratio=2.6, small_quantile=0.75,
):
    """Two-class beam planning: per-BLOCK box requirements route each
    block to a SMALL or LARGE static box class (same perm/flip/K/slots,
    different (BA, nstripe)). The worst block no longer sets every
    block's one-hot row count — gather/scatter dots are proportional to
    BA*nstripe, and corner blocks typically need 2-4x the p75 block
    (VERDICT r2 #1/#3).

    Walks EVERY block (``ray_idxs`` or the full tile order), like the
    GT-filtered plan_bp_config path.

    Returns None (keep the XLA path) or a dict:
      cfg_large: BpBeamConfig covering every block
      cfg_small: BpBeamConfig or None (single class)
      small_mask: (nb,) bool — block fits the small class
    """
    st, _reason = _plan_prologue(
        P_pinv, camera_center, bbox, grid_shape, height, width,
        ray_idxs, rays, k_cap,
    )
    if st is None:
        return None
    return _classes_from_state(
        st, depth_planes, max_voxels, gamma, rays, min_rows_ratio,
        small_quantile,
    )


def _classes_from_state(
    st, depth_planes, max_voxels, gamma, rays, min_rows_ratio,
    small_quantile,
):
    """plan_bp_classes' back half: the class split from a prologue
    state — shared with the fused multi-candidate planner."""
    s, e, bins, bbox = st["s"], st["e"], st["bins"], st["bbox"]
    grid_shape, perm = st["grid_shape"], st["perm"]
    flip, k, S, A, B, nb = (
        st["flip"], st["k"], st["S"], st["A"], st["B"], st["nb"]
    )

    if st["block_stats"] is not None:
        need_a, need_b = st["block_stats"][1], st["block_stats"][2]
    else:
        need_a, need_b = _group_spans(
            s, e, bbox, bins, perm, S, S // 8, rays=rays, flip=flip,
            per_block=True,
        )
    # Per-block requirements: the snap-aware needs already carry the
    # +-2-cell f32-vs-f64 jitter budget (the planner measures in f64,
    # _prep_inputs lerps in f32) — class cutoffs sit exactly at bucket
    # boundaries, so that budget is what keeps boundary blocks from
    # overflowing at runtime.
    ba_need = np.asarray(need_a)
    ns_need = np.maximum(1, -(-np.asarray(need_b) // 128))

    def bucketize(x):
        for bkt in _BA_BUCKETS:
            if x <= bkt:
                return bkt
        return None

    ba_large = bucketize(int(ba_need.max()))
    ns_large = int(ns_need.max())
    if (
        ba_large is None
        or ns_large > 8
        or ba_large * ns_large > _ROWS_CAP
        # the small class is never wider than the large, so one check
        or est_scoped_vmem(
            S, k, ba_large, ns_large, int(depth_planes), rays
        ) > _SCOPED_VMEM_LIMIT
    ):
        return None

    prior = float(np.log(gamma) - np.log(1.0 - gamma))

    def make_cfg(ba, ns):
        return BpBeamConfig(
            perm, S, A, B, k, ba, ns, int(depth_planes),
            int(max_voxels),
            tuple(float(b) for b in bins[list(perm)]), prior,
            grid_shape, flip=flip, rays=rays,
        )

    cfg_large = make_cfg(ba_large, ns_large)
    # min_rows_ratio: the split costs one extra dispatch per (image,
    # sweep) plus a second compiled variant; measured on v5e (ring rig,
    # (16,2) small vs (24,2) large, 97% small) a 1.5x row ratio LOSES
    # ~12% scene time — the gather/scatter dots have large fixed costs
    # at these box sizes. Only split when the cover-all box is >2.6x
    # the small class's rows (oblique rigs: (24,2) vs (192,2) = 8x).
    ba_small = bucketize(int(np.quantile(ba_need, small_quantile)))
    ns_small = int(np.quantile(ns_need, small_quantile))
    rows_split = (
        ba_small is not None
        and ba_large * ns_large >= min_rows_ratio * ba_small * ns_small
        and not (ba_small == ba_large and ns_small == ns_large)
    )
    if rows_split:
        box_mask = (ba_need <= ba_small) & (ns_need <= ns_small)
        if box_mask.mean() < 0.25:  # not worth a second compilation
            rows_split = False
    if rows_split:
        return dict(
            cfg_large=cfg_large,
            cfg_small=make_cfg(ba_small, ns_small),
            small_mask=box_mask,
        )
    return dict(cfg_large=cfg_large, cfg_small=None, small_mask=None)




def _plan_stats_per_block(s, e, bbox, bins, perm, grid_shape, flip, rays,
                          slack=1e-4):
    """Per-block (K, need_a, need_b) via the native single-pass planner
    (raynet_host.cpp bp_plan_stats), or None when the native library is
    unavailable — callers fall back to the chunked-numpy _exact_k /
    _group_spans forms, which build (rays x slices) f64 temporaries and
    cost ~20 s per DTU-resolution view against ~1 s native."""
    try:
        from ...native import bp_plan_stats_raw, is_available
    except ImportError:
        return None
    if not is_available():
        return None
    bmin = np.asarray(bbox[:3], np.float64)
    S = grid_shape[perm[0]]
    pb = np.asarray([bins[a] for a in perm], np.float64)
    # permute/flip/shift marshalling happens inside the C++ pass (the
    # numpy fancy-index forms cost ~0.5 s/720p view on one host core)
    return bp_plan_stats_raw(
        np.asarray(s, np.float64), np.asarray(e, np.float64),
        rays, S, S // 8, pb, perm, flip, bmin, S * pb[0], slack, _EPS,
    )


def _exact_k(s, e, bbox, bins, perm, grid_shape, flip, chunk=16384,
             slack=1e-4):
    """Max DDA emissions in any single dominant slice, counted exactly.

    Mirrors the kernel's march arithmetic (eps nudging, crossing-time
    sequences) in float64 with a conservative +-``slack`` on every slice
    boundary, so a crossing landing near a boundary is counted in BOTH
    slices. The slack must cover the kernel's float32 SERIALLY
    ACCUMULATED crossing times (t += t_delta drifts up to ~1e-5 absolute
    over several hundred steps) — an undercounted K is a hard scene
    abort in strict mode, not a fallback. The runtime overflow guard
    remains the backstop.
    """
    bmin = bbox[:3]
    S = grid_shape[perm[0]]
    pb = [bins[a] for a in perm]
    ext = S * pb[0]
    best = 1
    for c0 in range(0, len(s), chunk):
        sl = slice(c0, min(len(s), c0 + chunk))
        st = (s[sl] - bmin[None])[:, list(perm)].astype(np.float64)
        en = (e[sl] - bmin[None])[:, list(perm)].astype(np.float64)
        if flip:
            st[:, 0] = ext - st[:, 0]
            en[:, 0] = ext - en[:, 0]
        ray = en - st
        with np.errstate(divide="ignore", invalid="ignore"):
            stepf = np.where(ray >= 0, 1.0, -1.0)
            startn = st + stepf * np.asarray(pb)[None] * _EPS
            cur = np.floor(startn / np.asarray(pb)[None])
            cc = cur * np.asarray(pb)[None]
            boundary = np.where(
                (stepf < 0) & (cc < startn), cc,
                cc + stepf * np.asarray(pb)[None],
            )
            tmax = np.where(
                ray != 0, (boundary - startn) / ray, np.inf
            )
            tdelta = np.where(
                ray != 0, stepf * np.asarray(pb)[None] / ray, np.inf
            )
        # dominant slice entry times: slice cur0 + j entered at
        # tmax0 + (j-1)*td0; interval of slice cur0 is [0, tmax0)
        j = np.arange(S + 1, dtype=np.float64)
        t_entry = tmax[:, 0:1] + (j[None, :] - 1.0) * tdelta[:, 0:1]
        t_entry[:, 0] = 0.0
        t_entry = np.minimum(t_entry, 1.0)
        tlo = t_entry[:, :-1] - slack  # (N, S) slice starts
        thi = np.minimum(t_entry[:, 1:], 1.0) + slack

        def crossings_below(T, axis):
            with np.errstate(divide="ignore", invalid="ignore"):
                x = (T - tmax[:, axis : axis + 1]) / tdelta[
                    :, axis : axis + 1
                ]
            n = np.floor(x) + 1.0
            return np.clip(np.where(np.isfinite(x), n, 0.0), 0.0, None)

        em = 1.0
        for axis in (1, 2):
            em = em + (
                crossings_below(thi, axis) - crossings_below(tlo, axis)
            )
        best = max(best, int(np.nanmax(em)))
    return best


def _group_positions(s, e, bbox, bins, perm, S, ngrp, flip=False):
    """Lateral cell positions of every ray at every group boundary, clamped
    to the ray's own dominant span. Returns (pa, pb): (N, ngrp+1) arrays.
    ``flip`` mirrors the dominant coordinate exactly like the runtime
    (_prep_inputs) — without it, mirrored views see d1 < d0 and the lerp
    degenerates, crediting the whole lateral travel to one group.

    ``bins`` is ORIGINAL-axis-ORDER and must be indexed through ``perm``
    — the runtime lerps with cfg.bins (permuted). Indexing bins[0..2]
    directly silently distorted the group-boundary reparam on
    ANISOTROPIC grids (256x256x128: the dominant z bin is 2x the
    lateral bins), under-planning some blocks' stripes by whole 128-cell
    units (caught by the native bp_plan_stats parity check)."""
    c0 = s[:, perm[0]] - bbox[perm[0]]
    c1 = e[:, perm[0]] - bbox[perm[0]]
    if flip:
        # mirror the COORDINATE like the runtime (ext - x, then /bin) —
        # same value as S - x/bin but a different rounding path
        ext = S * bins[perm[0]]
        c0 = ext - c0
        c1 = ext - c1
    d0 = c0 / bins[perm[0]]
    d1 = c1 / bins[perm[0]]
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / np.maximum(d1 - d0, 1e-9)
    gb = np.arange(ngrp + 1)[None, :] * 8.0  # group boundaries in slices
    t = np.clip((gb - d0[:, None]) * inv[:, None], 0.0, 1.0)

    def lerp_cells(axis, bin_):
        a0 = (s[:, axis] - bbox[axis]) / bin_
        a1 = (e[:, axis] - bbox[axis]) / bin_
        return a0[:, None] + t * (a1 - a0)[:, None]

    return (
        lerp_cells(perm[1], bins[perm[1]]),
        lerp_cells(perm[2], bins[perm[2]]),
    )


def _group_spans(s, e, bbox, bins, perm, S, ngrp, chunk_blocks=2048,
                 rays=RAYS, flip=False, per_block=False):
    """SNAP-AWARE per-(block, group) box needs in cells (planner side):
    need = (hi + 2) - snap(lo - 3) + 1, where lo/hi are the block-group
    floor-cell extrema of the lateral lerp positions, the snap matches
    the runtime origin (8 cells for the BA axis, 128 for stripes) and
    +-2 budgets planner-f64 vs runtime-f32 jitter. Snap-aware needs are
    typically ~4 cells tighter than the old span+slack formulas (the
    worst case is identical) — the per-block box classes live on that
    margin. Chunked over blocks: exact DTU-scale plans walk ~2M rays
    and the (N, ngrp+1) position arrays would otherwise peak at
    several GB.

    ``per_block``: return (nb,) arrays of per-BLOCK maxima instead of
    the global scalars (the class planner routes each block to the
    smallest static box that covers it)."""
    nb = len(s) // rays

    def need_of(p, nbc, snap):
        lo = np.minimum(p[:, :-1], p[:, 1:])  # (Nc, ngrp)
        hi = np.maximum(p[:, :-1], p[:, 1:])
        lo = np.floor(lo).reshape(nbc, rays, ngrp).min(axis=1)
        hi = np.floor(hi).reshape(nbc, rays, ngrp).max(axis=1)
        origin = snap * np.floor((lo - 3.0) / snap)
        return (hi + 2.0 - origin + 1.0).max(axis=1).astype(np.int64)

    parts_a, parts_b = [], []
    for b0 in range(0, nb, chunk_blocks):
        nbc = min(chunk_blocks, nb - b0)
        sl = slice(b0 * rays, (b0 + nbc) * rays)
        pa, pb = _group_positions(
            s[sl], e[sl], bbox, bins, perm, S, ngrp, flip=flip
        )
        parts_a.append(need_of(pa, nbc, 8.0))
        parts_b.append(need_of(pb, nbc, 128.0))
    need_a = np.concatenate(parts_a)
    need_b = np.concatenate(parts_b)
    if per_block:
        return need_a, need_b
    return int(need_a.max()), int(need_b.max())


# --------------------------------------------------------------------- #
# kernel                                                                 #
# --------------------------------------------------------------------- #


def _ds8(off, size):
    return pl.ds(pl.multiple_of(off, 8), size)


def _bp_kernel(cfg, first_iteration, depth_mode, origins_ref,
               seg_ref, sp_ref, msg_ref, grid_ref, zeros_ref,
               out_msg_ref, out_grid_ref, out_misc_ref,
               cell_scr, t_scr, mu_scr, sv_scr,
               gbuf, dstage, dacc, gsem, dsem):
    S, K, BA, NS, D = cfg.S, cfg.K, cfg.BA, cfg.nstripe, cfg.depth_planes
    RAYS = cfg.rays
    ROWS = cfg.rows
    perm = cfg.perm
    bins = cfg.bins
    # BA need not be a power of two: encode with a multiply; the
    # depth-mode decode recovers the stripe with NS-1 compares.
    b = pl.program_id(0)
    NG = S // 8
    # Crossing precedence (the reference's nested tie-break,
    # ray_tracing.pyx:169-194, is a strict weak order: sort crossings by
    # (t, ORIGINAL axis index DESCENDING)). perm = (dom, lo, hi) with
    # lo < hi, so axis2 always beats axis1 on equal times; whether a
    # lateral crossing at exactly the dominant's time precedes it depends
    # on the original indices:
    le1 = perm[1] > perm[0]  # axis1 vs dominant on equal t
    le2 = perm[2] > perm[0]  # axis2 vs dominant on equal t

    def grp_origin(g):
        base = (b * NG + g) * 2
        return (
            pl.multiple_of(origins_ref[base], 8),
            origins_ref[base + 1],
        )

    del zeros_ref  # aliased to out_grid_ref; only the alias is touched

    def row(i):
        return seg_ref[0, i : i + 1, :]  # (1, RAYS)

    start = [row(0), row(1), row(2)]
    end = [row(3), row(4), row(5)]
    valid_ray = row(6) > 0.5
    cam = [row(8), row(9), row(10)]

    ray = [e - s for s, e in zip(start, end)]
    step = [jnp.where(r >= 0, 1, -1).astype(jnp.int32) for r in ray]
    stepf = [s_.astype(jnp.float32) for s_ in step]
    startn = [s_ + f * bn * _EPS for s_, f, bn in zip(start, stepf, bins)]
    endn = [e - f * bn * _EPS for e, f, bn in zip(end, stepf, bins)]
    cur = [jnp.floor(s_ / bn).astype(jnp.int32)
           for s_, bn in zip(startn, bins)]
    last = [jnp.floor(e / bn).astype(jnp.int32)
            for e, bn in zip(endn, bins)]
    dims = [S, cfg.A, cfg.B]
    inside0 = valid_ray
    for c, g in zip(cur, dims):
        inside0 = inside0 & (c >= 0) & (c < g)

    t_max, t_delta = [], []
    for a in range(3):
        cc = cur[a].astype(jnp.float32) * bins[a]
        boundary = jnp.where(
            (step[a] < 0) & (cc < startn[a]), cc, cc + stepf[a] * bins[a]
        )
        t_max.append(
            jnp.where(ray[a] != 0, (boundary - startn[a]) / ray[a],
                      _FLT_MAX)
        )
        t_delta.append(
            jnp.where(ray[a] != 0, stepf[a] * bins[a] / ray[a], _FLT_MAX)
        )
    inv_td = [1.0 / td for td in t_delta]

    seglen2 = sum((e - s) * (e - s) for s, e in zip(start, end))
    inv_len2 = 1.0 / jnp.maximum(seglen2, 1e-30)

    def t_param(c0, c1, c2):
        acc = None
        for c, s_, e, bn in zip((c0, c1, c2), start, end, bins):
            ctr = (c.astype(jnp.float32) + 0.5) * bn
            term = (ctr - s_) * (e - s_)
            acc = term if acc is None else acc + term
        return acc * inv_len2

    # The t parameter moves by a per-ray CONSTANT when an axis steps one
    # cell (the cell center moves by step*bin).
    t_step = [
        f * bn * (e - s_) * inv_len2
        for f, bn, s_, e in zip(stepf, bins, start, end)
    ]
    tp0 = t_param(cur[0], cur[1], cur[2])  # (1, RAYS) entry-cell t

    # Emission budget: every crossing emits one cell; IF the path reaches
    # the last cell it does so after exactly n_total crossings (per-axis
    # travel is monotone), so slot emission is an INDEX comparison — no
    # serial at_last tracking. But the eps-nudged endpoints can floor
    # ``last`` on the NEAR side of a crossing the path actually takes
    # (~2% of rays at test geometry); the reference march then never
    # satisfies cell==last and walks on until it leaves the grid.
    # ``reach`` decides which case holds: the path reaches ``last`` iff
    # the first EXCESS crossing of every axis orders after every NEEDED
    # crossing of the other axes (same (t, orig-axis desc) precedence).
    tgt = [
        last[0] - cur[0],
        (last[1] - cur[1]) * step[1],
        (last[2] - cur[2]) * step[2],
    ]
    n_total = tgt[0] + tgt[1] + tgt[2]

    def _t_of(a, nn):
        return t_max[a] + nn.astype(jnp.float32) * t_delta[a]

    reach = None
    for a_ in range(3):
        texc_a = _t_of(a_, tgt[a_])
        for b_ in range(3):
            if a_ == b_:
                continue
            tneed_b = _t_of(b_, tgt[b_] - 1)
            # excess crossing of a_ after needed crossing of b_: ties go
            # to the HIGHER original axis index
            if perm[a_] < perm[b_]:
                aft = texc_a >= tneed_b
            else:
                aft = texc_a > tneed_b
            ok = aft | (tgt[b_] < 1)
            reach = ok if reach is None else reach & ok
    limit = jnp.minimum(
        jnp.where(reach, n_total, jnp.int32(1 << 30)),
        cfg.max_voxels - 1,
    )
    live0 = inside0.astype(jnp.int32)

    def local_cell(c1, c2, a0, bg0):
        la = c1 - a0
        lb = c2 - bg0 * 128
        cell = (((lb >> 7) * BA) + la) * 128 + (lb & 127)
        inbox = (la >= 0) & (la < BA) & (lb >= 0) & (lb < NS * 128)
        return jnp.where(inbox, cell, -2)

    su = jax.lax.broadcasted_iota(jnp.int32, (8, RAYS), 0)

    def count_before(a, enter, m, le):
        """Crossings of lateral axis ``a`` taken before the dominant
        crossing at time ``enter``: count n such that t_a(n) = t_max_a +
        n*t_delta_a precedes enter (strict <, or <= when ``le``). The
        reciprocal-multiply estimate is corrected one step each way
        against the actual predicate, making the count exact wrt the
        closed-form f32 times."""
        q = jnp.floor((enter - t_max[a]) * inv_td[a]).astype(jnp.int32)
        n = jnp.maximum(q, 0)
        t_at = t_max[a] + n.astype(jnp.float32) * t_delta[a]
        hit = (t_at <= enter) if le else (t_at < enter)
        n = n + hit.astype(jnp.int32)
        t_prev = t_max[a] + (n - 1).astype(jnp.float32) * t_delta[a]
        ok_prev = (t_prev <= enter) if le else (t_prev < enter)
        n = n - ((~ok_prev) & (n > 0)).astype(jnp.int32)
        return jnp.where(m <= 0, 0, n)

    # ------------------------------------------------------------ march
    # Closed form, vectorized (8, RAYS) over each slice group: entry
    # state per slice from crossing counts, then the <=K-1 within-slice
    # lateral events replayed with the same closed-form times.
    def march_group(g, carry):
        cnt8, ovf8 = carry
        a0_g, bg0_g = grp_origin(g)
        m = (g * 8 + su) - cur[0]  # dominant crossings before this slice
        mf = m.astype(jnp.float32)
        enter = jnp.where(
            m <= 0, 0.0, t_max[0] + (mf - 1.0) * t_delta[0]
        )
        exit_t = t_max[0] + mf * t_delta[0]
        n1 = count_before(1, enter, m, le1)
        n2 = count_before(2, enter, m, le2)
        c1 = cur[1] + step[1] * n1
        c2 = cur[2] + step[2] * n2
        t1c = t_max[1] + n1.astype(jnp.float32) * t_delta[1]
        t2c = t_max[2] + n2.astype(jnp.float32) * t_delta[2]
        eidx = m + n1 + n2
        tp = (
            tp0 + mf * t_step[0]
            + n1.astype(jnp.float32) * t_step[1]
            + n2.astype(jnp.float32) * t_step[2]
        )
        live = (live0 > 0) & (m >= 0)
        for k in range(K):
            if k > 0:
                first12 = t1c < t2c  # ties go to axis2 (higher orig idx)
                p1d = (t1c <= exit_t) if le1 else (t1c < exit_t)
                p2d = (t2c <= exit_t) if le2 else (t2c < exit_t)
                w1 = p1d & first12
                w2 = p2d & ~first12
                n1 = n1 + w1.astype(jnp.int32)
                n2 = n2 + w2.astype(jnp.int32)
                c1 = jnp.where(w1, c1 + step[1], c1)
                c2 = jnp.where(w2, c2 + step[2], c2)
                t1c = jnp.where(
                    w1, t_max[1] + n1.astype(jnp.float32) * t_delta[1], t1c
                )
                t2c = jnp.where(
                    w2, t_max[2] + n2.astype(jnp.float32) * t_delta[2], t2c
                )
                tp = tp + jnp.where(
                    w1, t_step[1], jnp.where(w2, t_step[2], 0.0)
                )
                eidx = eidx + (w1 | w2).astype(jnp.int32)
                live_k = live & (w1 | w2)
            else:
                live_k = live
            inb = (c1 >= 0) & (c1 < cfg.A) & (c2 >= 0) & (c2 < cfg.B)
            emit = live_k & (eidx <= limit) & inb
            cell = local_cell(c1, c2, a0_g, bg0_g)
            ovf8 = ovf8 + (emit & (cell < 0)).astype(jnp.int32)
            cell_scr[_ds8(g * 8 * K + k * 8, 8)] = jnp.where(
                emit, cell, -1
            )
            t_scr[_ds8(g * 8 * K + k * 8, 8)] = jnp.clip(
                tp, _EPS_T, 1.0 - _EPS_T
            )
            cnt8 = cnt8 + emit.astype(jnp.int32)
        # K-overflow: a further lateral event precedes the dominant exit
        # while the ray is still live and short of the last cell.
        first12 = t1c < t2c
        p1d = (t1c <= exit_t) if le1 else (t1c < exit_t)
        p2d = (t2c <= exit_t) if le2 else (t2c < exit_t)
        inb = (c1 >= 0) & (c1 < cfg.A) & (c2 >= 0) & (c2 < cfg.B)
        not_last = (eidx < n_total) | jnp.logical_not(reach)
        pend = live & inb & not_last & (p1d | p2d)
        ovf8 = ovf8 + pend.astype(jnp.int32)
        return cnt8, ovf8

    zero8 = jnp.zeros((8, RAYS), jnp.int32)
    cnt8, ovf8 = jax.lax.fori_loop(
        0, S // 8, march_group, (zero8, zero8)
    )
    count = cnt8.sum(axis=0, keepdims=True)  # (1, RAYS)
    overflow = ovf8.sum(axis=0, keepdims=True)

    # -------------------------------------------------- hat mapping + clip
    sp = sp_ref[0]  # (D, RAYS)
    scale = jnp.float32(D - 1)

    # Pass 1: RAW hat values + their sum. Pass 2: normalize, THEN clip,
    # then renormalize — matching the XLA chain exactly
    # (planes_to_voxels normalizes raw hats; mrf.clip_and_renorm clips
    # the NORMALIZED distribution and renormalizes). Clipping the raw
    # values diverges up to ~total_raw x on low-probability voxels.
    # (A windowed variant that walked a planned score window instead of
    # all D planes was removed after three device A/Bs measured it a
    # ~5% net loss — see the module-header note.)
    def hat_chunk(c, total):
        tt = t_scr[_ds8(c * 8, 8)]
        cc = cell_scr[_ds8(c * 8, 8)]
        ts = tt * scale
        if _DEBUG_HAT_OFF:  # A/B timer knob: D-loop cost isolation
            sv = ts
        elif _HAT_GATHER and D % 8 == 0:
            # The hat is a 2-tap lerp: sum_d sp[d]*max(0, 1-|ts-d|) =
            # sp[i]*(1-f) + sp[i+1]*f with i = floor(ts), f = ts - i
            # (t is clipped to [eps, 1-eps], so i and i+1 stay in
            # [0, D-1]). The taps are per-lane sublane gathers —
            # tpu.dynamic_gather via take_along_axis — which v5e
            # supports only WITHIN an 8-row tile, so walk the D/8
            # tiles and mask (device-verified exact 2026-08-19). ~60
            # VPU ops per chunk vs ~5*D for the full-loop form below.
            i0 = jnp.floor(ts).astype(jnp.int32)
            f = ts - i0.astype(jnp.float32)
            v0 = jnp.zeros((8, RAYS), jnp.float32)
            v1 = jnp.zeros((8, RAYS), jnp.float32)
            for q in range(D // 8):
                spq = sp[q * 8 : (q + 1) * 8]
                loc = i0 - q * 8
                g0 = jnp.take_along_axis(spq, loc & 7, axis=0)
                v0 = v0 + jnp.where((loc >= 0) & (loc < 8), g0, 0.0)
                g1 = jnp.take_along_axis(spq, (loc + 1) & 7, axis=0)
                v1 = v1 + jnp.where((loc >= -1) & (loc < 7), g1, 0.0)
            sv = v0 * (1.0 - f) + v1 * f
        else:
            sv = jnp.zeros((8, RAYS), jnp.float32)
            for d in range(D):
                w = jnp.maximum(0.0, 1.0 - jnp.abs(ts - d))
                sv = sv + jnp.broadcast_to(sp[d : d + 1], (8, RAYS)) * w
        sv = jnp.where(cc >= 0, sv, 0.0)
        sv_scr[_ds8(c * 8, 8)] = sv
        return total + sv.sum(axis=0, keepdims=True)

    total_raw = jax.lax.fori_loop(
        0, cfg.slots // 8, hat_chunk,
        jnp.zeros((1, RAYS), jnp.float32),
    )
    inv_raw = jnp.where(total_raw > 1e-30, 1.0 / total_raw, 0.0)



    # ------------------------------------------------------------ gather
    def grid_dma(g, slot):
        a0_g, bg0_g = grp_origin(g)
        return pltpu.make_async_copy(
            grid_ref.at[
                _ds8(g * 8, 8), pl.ds(bg0_g, NS), pl.ds(a0_g, BA)
            ],
            gbuf.at[slot],
            gsem.at[slot],
        )

    mu_c = cfg.prior
    mu_const = min(
        max(np.exp(mu_c) / (1.0 + np.exp(mu_c)), _CLIP_MU), 1.0 - _CLIP_MU
    )
    if first_iteration:
        def mu_chunk(c, _):
            cc = cell_scr[_ds8(c * 8, 8)]
            mu_scr[_ds8(c * 8, 8)] = jnp.where(cc >= 0, mu_const, 0.0)
            return 0

        jax.lax.fori_loop(0, cfg.slots // 8, mu_chunk, 0)
    else:
        # K-BATCHED lane picks: the per-(u, k) dots are ISSUE-bound, not
        # FLOP-bound (384 small dots/sweep at K=3, each ~free on the
        # MXU), so the K picks of one sublane ride ONE dot with the k
        # blocks concatenated along the ray-lane axis. Per k-column the
        # contraction and the masked row-reduce are the exact same ops
        # in the same order — bit-identical to the per-k form.
        KR = K * RAYS
        iota_rowk = jax.lax.broadcasted_iota(jnp.int32, (ROWS, KR), 0)
        iota_subk = jax.lax.broadcasted_iota(jnp.int32, (128, KR), 0)
        grid_dma(0, 0).start()

        def gather_group(g, _):
            slot = jax.lax.rem(g, 2)

            @pl.when(g + 1 < S // 8)
            def _():
                grid_dma(g + 1, 1 - slot).start()

            grid_dma(g, slot).wait()
            cells = cell_scr[_ds8(g * 8 * K, 8 * K)]
            msgs = msg_ref[0, _ds8(g * 8 * K, 8 * K)]
            val_rows = [None] * (8 * K)
            for u in range(8):
                table = gbuf[slot, u].reshape(ROWS, 128)
                cid = jnp.concatenate(
                    [cells[k * 8 + u : k * 8 + u + 1] for k in range(K)],
                    axis=1,
                )  # (1, K*RAYS), k-major slot layout
                rowid = cid >> 7
                lo = cid & 127
                # lane-pick FIRST (full 128-wide MXU contraction),
                # then the masked reduce runs over ROWS (<=128) rows
                e2 = (iota_subk == jnp.broadcast_to(
                    lo, (128, KR)
                )).astype(jnp.float32)
                cols = jax.lax.dot_general(
                    table, e2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (ROWS, K*RAYS)
                picked = jnp.where(
                    iota_rowk == jnp.broadcast_to(rowid, (ROWS, KR)),
                    cols, 0.0,
                ).sum(axis=0, keepdims=True)  # (1, K*RAYS)
                for k in range(K):
                    val_rows[k * 8 + u] = jax.lax.slice(
                        picked, (0, k * RAYS), (1, (k + 1) * RAYS)
                    )
            # stable sigmoid of (val - msg), VECTORIZED over the whole
            # group (8K wide rows) instead of ~8 serial ops per substep
            val = jnp.concatenate(val_rows, axis=0)  # (8K, RAYS)
            pon = val - msgs
            mx = jnp.maximum(0.0, pon)
            mu = jnp.exp(pon - mx) / (jnp.exp(0.0 - mx) + jnp.exp(pon - mx))
            mu = jnp.clip(mu, _CLIP_MU, 1.0 - _CLIP_MU)
            mu_scr[_ds8(g * 8 * K, 8 * K)] = jnp.where(
                cells >= 0, mu, 0.0
            )
            return 0

        jax.lax.fori_loop(0, S // 8, gather_group, 0)

    # --------------------------------------------- pass R1: total contrib
    ones = jnp.ones((1, RAYS), jnp.float32)

    # R1 also applies the normalized-then-clipped mapping in place
    # (svc = clip(sv_raw / total_raw), XLA's clip_and_renorm order) and
    # accumulates its sum; the second renormalizer divides ONCE at the
    # end — the contribution sum is linear in svc.
    # DDA-order prefix over a k-major layout: per-slice partial products
    # over k ((8, RAYS) ops), then a short serial cross-slice chain —
    # ~3x fewer issue slots than the per-slot serial recurrence.
    def r1_group(g, carry):
        ep, tot, t2 = carry
        base = g * 8 * K
        ps_tot = jnp.zeros((8, RAYS), jnp.float32)
        ps_e = jnp.ones((8, RAYS), jnp.float32)
        for k in range(K):
            cc = cell_scr[_ds8(base + k * 8, 8)]
            mu8 = mu_scr[_ds8(base + k * 8, 8)]
            sv8 = sv_scr[_ds8(base + k * 8, 8)]
            svc = jnp.where(
                cc >= 0,
                jnp.clip(
                    sv8 * jnp.broadcast_to(inv_raw, (8, RAYS)),
                    _CLIP_S, 1.0 - _CLIP_S,
                ),
                0.0,
            )
            sv_scr[_ds8(base + k * 8, 8)] = svc
            t2 = t2 + svc.sum(axis=0, keepdims=True)
            ps_tot = ps_tot + mu8 * ps_e * svc
            ps_e = ps_e * (1.0 - mu8)
        for u in range(8):
            tot = tot + ep * ps_tot[u : u + 1]
            ep = ep * ps_e[u : u + 1]
        return ep, tot, t2

    _, total_r1, total_sv = jax.lax.fori_loop(
        0, S // 8, r1_group,
        (ones, jnp.zeros((1, RAYS), jnp.float32),
         jnp.zeros((1, RAYS), jnp.float32)),
    )
    inv_total = jnp.where(
        (total_sv > 1e-30) & (count > 1), 1.0 / total_sv, 0.0
    )
    total = total_r1 * inv_total

    # ------------------------------- pass R2: messages (+ depth / scatter)
    KR = K * RAYS
    iota_rowk = jax.lax.broadcasted_iota(jnp.int32, (ROWS, KR), 0)
    iota_subk = jax.lax.broadcasted_iota(jnp.int32, (128, KR), 0)

    def out_dma(g, slot, direction):
        a0_g, bg0_g = grp_origin(g)
        region = out_grid_ref.at[
            _ds8(g * 8, 8), pl.ds(bg0_g, NS), pl.ds(a0_g, BA)
        ]
        if direction == "read":
            return pltpu.make_async_copy(
                region, dstage.at[slot], dsem.at[0, slot]
            )
        return pltpu.make_async_copy(
            dstage.at[slot], region, dsem.at[1, slot]
        )

    def r2_group(g, carry, slot=None):
        # DDA-order prefixes over the k-major layout: per-slice partials
        # over k, serial cross-slice EXCLUSIVE prefixes (EPU/CSU rows),
        # then all per-slot message math runs as (8, RAYS) ops per k.
        #
        # ``slot``: static dstage slot under the paired-DMA schedule
        # (the driver below starts this group's RMW read one pair ahead
        # and drains its write one pair behind, so both transfer
        # latencies hide behind another group's message math + dots);
        # None = serial fallback (read started here, write drained
        # in-line) for odd group counts.
        if depth_mode:
            ep, cse, bv8, bc8, bs8, ba8, bb8 = carry
        else:
            ep, cse = carry
        a0_g, bg0_g = grp_origin(g)
        base = g * 8 * K
        cells_k = [cell_scr[_ds8(base + k * 8, 8)] for k in range(K)]
        mu_k = [mu_scr[_ds8(base + k * 8, 8)] for k in range(K)]
        om_k = [1.0 - mu for mu in mu_k]
        Sr_k = [
            sv_scr[_ds8(base + k * 8, 8)]
            * jnp.broadcast_to(inv_total, (8, RAYS))
            for k in range(K)
        ]
        if not depth_mode and slot is None:
            rd = out_dma(g, 0, "read")
            rd.start()
        pe = jnp.ones((8, RAYS), jnp.float32)
        pc = jnp.zeros((8, RAYS), jnp.float32)
        for k in range(K):
            pc = pc + mu_k[k] * pe * Sr_k[k]
            pe = pe * om_k[k]
        ep_rows, cse_rows = [], []
        for u in range(8):
            ep_rows.append(ep)
            cse_rows.append(cse)
            cse = cse + ep * pc[u : u + 1]
            ep = ep * pe[u : u + 1]
        EPK = jnp.concatenate(ep_rows, axis=0)  # (8, RAYS) at slice entry
        CSK = jnp.concatenate(cse_rows, axis=0)
        pon_k = []
        for k in range(K):
            contrib = mu_k[k] * EPK * Sr_k[k]
            if depth_mode:
                better = (cells_k[k] >= 0) & (
                    (contrib > bv8) | (bv8 < 0)
                )
                bv8 = jnp.where(better, jnp.maximum(contrib, 0.0), bv8)
                bc8 = jnp.where(better, cells_k[k], bc8)
                bs8 = jnp.where(better, g * 8 + su, bs8)
                ba8 = jnp.where(better, a0_g, ba8)
                bb8 = jnp.where(better, bg0_g, bb8)
            else:
                pos = CSK + EPK * Sr_k[k]
                neg = CSK + (total - CSK - contrib) / om_k[k]
                p = pos / jnp.maximum(pos + neg, 1e-37)
                p = jnp.clip(p, 1e-37, 1.0 - 1e-7)
                new_pon = jnp.log(p) - jnp.log1p(-p)
                new_pon = jnp.where(
                    (cells_k[k] >= 0) & (count > 1), new_pon, 0.0
                )
                pon_k.append(new_pon)
                out_msg_ref[0, _ds8(base + k * 8, 8)] = new_pon
            CSK = CSK + contrib
            EPK = EPK * om_k[k]
        if not depth_mode:
            # K-BATCHED scatter dots (same issue-count argument as the
            # gather): the K delta dots of one sublane concatenate
            # along the contracted ray axis — one dot computes the sum
            # of all K scatter contributions. A one-hot column touches
            # one (row, lane) cell, so values land k-blocked in the
            # same order the three separate dots added their partials;
            # only multi-hit cells may reassociate at the ulp level
            # (the XLA reference's scatter order differs anyway).
            for u in range(8):
                cid = jnp.concatenate(
                    [cells_k[k][u : u + 1] for k in range(K)], axis=1
                )  # (1, K*RAYS)
                pon = jnp.concatenate(
                    [pon_k[k][u : u + 1] for k in range(K)], axis=1
                )
                rowid = cid >> 7
                lo = cid & 127
                # the VALUE rides the SMALL (ROWS-high) operand and the
                # 128-high lane side stays a binary one-hot — same
                # products in the same order as the valued-X form, with
                # (ROWS + 128) valued/binary build rows instead of
                # (128 + ROWS)
                eqv = jnp.where(
                    iota_rowk == jnp.broadcast_to(rowid, (ROWS, KR)),
                    jnp.broadcast_to(pon, (ROWS, KR)),
                    0.0,
                )
                e2 = (iota_subk == jnp.broadcast_to(
                    lo, (128, KR)
                )).astype(jnp.float32)
                delta = jax.lax.dot_general(
                    eqv, e2, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                dacc[u] = delta.reshape(NS, BA, 128)
            s_ = 0 if slot is None else slot
            out_dma(g, s_, "read").wait()
            dstage[s_] = dstage[s_] + dacc[:]
            wr = out_dma(g, s_, "write")
            wr.start()
            if slot is None:
                wr.wait()
        if depth_mode:
            return ep, cse, bv8, bc8, bs8, ba8, bb8
        return ep, cse

    zero8i = jnp.zeros((8, RAYS), jnp.int32)
    if depth_mode:
        init = (
            ones, jnp.zeros((1, RAYS), jnp.float32),
            jnp.full((8, RAYS), -1.0, jnp.float32),
            zero8i, zero8i, zero8i, zero8i,
        )
        (_, _, bv8, bc8, bs8, ba8, bb8) = jax.lax.fori_loop(
            0, S // 8, r2_group, init
        )
        # Cross-sublane reduce with DDA tie semantics: strictly-greater
        # kept the earliest (group, k) per sublane; across sublanes an
        # exact value tie resolves to the SMALLER slice id.
        best_v = bv8[0:1]
        best_cell = bc8[0:1]
        best_s = bs8[0:1]
        best_a0 = ba8[0:1]
        best_bg0 = bb8[0:1]
        for u in range(1, 8):
            v = bv8[u : u + 1]
            better = (v > best_v) | (
                (v == best_v) & (v >= 0) & (bs8[u : u + 1] < best_s)
            )
            best_v = jnp.where(better, v, best_v)
            best_cell = jnp.where(better, bc8[u : u + 1], best_cell)
            best_s = jnp.where(better, bs8[u : u + 1], best_s)
            best_a0 = jnp.where(better, ba8[u : u + 1], best_a0)
            best_bg0 = jnp.where(better, bb8[u : u + 1], best_bg0)
    else:
        init = (ones, jnp.zeros((1, RAYS), jnp.float32))
        if NG % 2 == 0:
            # Paired double-buffered RMW schedule: group 2j uses dstage
            # slot 0, group 2j+1 slot 1. Reads start one pair ahead and
            # writes drain one pair behind (consecutive groups touch
            # DISJOINT dominant-axis slabs, so only the slot's own
            # buffer reuse orders the transfers); each block drains its
            # last two writes before the next grid step can read the
            # same slabs.
            out_dma(0, 0, "read").start()
            out_dma(1, 1, "read").start()
            carry = r2_group(0, init, slot=0)
            carry = r2_group(1, carry, slot=1)

            def pair_body(j, carry):
                ga = j * 2
                out_dma(ga - 2, 0, "write").wait()
                out_dma(ga, 0, "read").start()
                out_dma(ga - 1, 1, "write").wait()
                out_dma(ga + 1, 1, "read").start()
                carry = r2_group(ga, carry, slot=0)
                return r2_group(ga + 1, carry, slot=1)

            jax.lax.fori_loop(1, NG // 2, pair_body, carry)
            out_dma(NG - 2, 0, "write").wait()
            out_dma(NG - 1, 1, "write").wait()
        else:
            jax.lax.fori_loop(0, NG, r2_group, init)

    # ------------------------------------------------------------- misc
    if depth_mode:
        rowpair = best_cell >> 7
        lo = best_cell & 127
        stripe = jnp.zeros_like(rowpair)
        for si in range(1, NS):
            stripe = stripe + (rowpair >= si * BA).astype(jnp.int32)
        la = rowpair - stripe * BA
        c1 = la + best_a0
        c2 = stripe * 128 + lo + best_bg0 * 128
        w0 = (best_s.astype(jnp.float32) + 0.5) * bins[0]
        w1 = (c1.astype(jnp.float32) + 0.5) * bins[1]
        w2 = (c2.astype(jnp.float32) + 0.5) * bins[2]
        d0, d1, d2 = w0 - cam[0], w1 - cam[1], w2 - cam[2]
        depth = jnp.sqrt(d0 * d0 + d1 * d1 + d2 * d2)
        depth = jnp.where((count > 0) & (best_v >= 0), depth, 0.0)
        out_misc_ref[0, 1:2] = depth
        out_msg_ref[0] = jnp.zeros_like(out_msg_ref[0])
    else:
        out_misc_ref[0, 1:2] = jnp.zeros((1, RAYS), jnp.float32)
    out_misc_ref[0, 0:1] = overflow.astype(jnp.float32)
    out_misc_ref[0, 2:3] = count.astype(jnp.float32)
    out_misc_ref[0, 3:8] = jnp.zeros((5, RAYS), jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "first_iteration", "depth_mode", "interpret"),
)
def bp_beam_call(
    seg,  # (NB, 16, RAYS) f32: rows 0-5 start/end, 6 valid, 8-10 camera
    splanes,  # (NB, D, RAYS) f32
    msgs,  # (NB, SLOTS, RAYS) f32 slot-major messages
    grid_perm,  # (S, Bgp, Ap, 128) f32 stripe-major padded gather grid
    zeros_grid,  # (S, Bgp, Ap, 128) f32 zeros; ALIASED to the delta output
    origins,  # (NB * 2,) int32 (a0, bg0) per block
    cfg,
    first_iteration=False,
    depth_mode=False,
    interpret=False,
):
    nb = seg.shape[0]
    S, K, BA, NS = cfg.S, cfg.K, cfg.BA, cfg.nstripe
    RAYS = cfg.rays
    slots = cfg.slots
    gshape = zeros_grid.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 16, RAYS), lambda b, _: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.depth_planes, RAYS),
                         lambda b, _: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, slots, RAYS), lambda b, _: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, slots, RAYS), lambda b, _: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, RAYS), lambda b, _: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((slots, RAYS), jnp.int32),
            pltpu.VMEM((slots, RAYS), jnp.float32),
            pltpu.VMEM((slots, RAYS), jnp.float32),
            pltpu.VMEM((slots, RAYS), jnp.float32),
            pltpu.VMEM((2, 8, NS, BA, 128), jnp.float32),  # gather groups
            pltpu.VMEM((2, 8, NS, BA, 128), jnp.float32),  # RMW stages
            pltpu.VMEM((8, NS, BA, 128), jnp.float32),  # delta accum
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    return pl.pallas_call(
        functools.partial(_bp_kernel, cfg, first_iteration, depth_mode),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb, slots, RAYS), jnp.float32),
            jax.ShapeDtypeStruct(gshape, jnp.float32),
            jax.ShapeDtypeStruct((nb, 8, RAYS), jnp.float32),
        ),
        input_output_aliases={5: 1},  # zeros grid -> accumulated output
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT_BYTES,
        ),
    )(origins, seg, splanes, msgs, grid_perm, zeros_grid)


# --------------------------------------------------------------------- #
# in-graph wrappers                                                      #
# --------------------------------------------------------------------- #


def _prep_inputs(ray_start, ray_end, valid, S_planes, messages_slot,
                 camera_center, bbox, cfg, native_msgs=False):
    perm = list(cfg.perm)
    n = ray_start.shape[0]
    nb = n // cfg.rays
    bmin = bbox[:3][jnp.asarray(perm)]
    st = (ray_start[:, perm] - bmin[None]).T  # (3, N)
    en = (ray_end[:, perm] - bmin[None]).T
    cam = camera_center[jnp.asarray(perm)] - bmin
    if cfg.flip:
        # mirror the dominant axis: x' = extent - x; distances (and thus
        # the hat parameter and depths) are mirror-invariant
        ext = jnp.float32(cfg.S * cfg.bins[0])
        st = st.at[0].set(ext - st[0])
        en = en.at[0].set(ext - en[0])
        cam = cam.at[0].set(ext - cam[0])

    seg = jnp.zeros((16, n), jnp.float32)
    seg = seg.at[0:3].set(st).at[3:6].set(en)
    seg = seg.at[6].set(valid.astype(jnp.float32))
    seg = seg.at[8:11].set(jnp.broadcast_to(cam[:, None], (3, n)))
    seg = seg.reshape(16, nb, cfg.rays).transpose(1, 0, 2)

    sp = S_planes.reshape(nb, cfg.rays, -1).transpose(0, 2, 1)
    if native_msgs:
        # messages already in the kernel's (nb, slots, RAYS) layout —
        # scanning callers keep the store in this layout so the big
        # per-batch transpose (the dominant prep cost) never happens
        msgs = messages_slot
    else:
        msgs = messages_slot.reshape(
            nb, cfg.rays, cfg.slots
        ).transpose(0, 2, 1)

    # Per-(block, 8-slice group) DRIFTING beam origins: lateral positions
    # of each ray at every group boundary (clamped lerp along the dominant
    # span), then block-group minima.
    bins = jnp.asarray(cfg.bins, jnp.float32)
    ngrp = cfg.S // 8
    d0 = st[0] / bins[0]
    d1 = en[0] / bins[0]
    inv = 1.0 / jnp.maximum(d1 - d0, 1e-9)
    gb = jnp.arange(ngrp + 1, dtype=jnp.float32)[None, :] * 8.0
    t = jnp.clip((gb - d0[:, None]) * inv[:, None], 0.0, 1.0)  # (N, G+1)

    pa0 = st[1] / bins[1]
    pa1 = en[1] / bins[1]
    pa = pa0[:, None] + t * (pa1 - pa0)[:, None]  # (N, G+1)
    pb0 = st[2] / bins[2]
    pb1 = en[2] / bins[2]
    pb = pb0[:, None] + t * (pb1 - pb0)[:, None]

    # Dead lanes (invalid rows, and bbox-MISS rays whose segment collapsed
    # to a zero-length point outside the grid) must not drag the drifting
    # box minima away from the live rays' band — the planner's static
    # (BA, nstripe) only covers live geometry.
    live = (valid > 0) & jnp.any(ray_start != ray_end, axis=1)
    far = jnp.float32(1e9)
    pa = jnp.where(live[:, None], pa, far)
    pb = jnp.where(live[:, None], pb, far)

    def group_min(p):
        lo = jnp.floor(jnp.minimum(p[:, :-1], p[:, 1:])).astype(jnp.int32)
        return lo.reshape(nb, cfg.rays, ngrp).min(axis=1) - 1  # (NB, G)

    a_min = group_min(pa)
    b_min = group_min(pb)
    ap = -(-(cfg.A + cfg.BA) // 8) * 8
    bgp = cfg.Bg + cfg.nstripe
    a0 = jnp.clip((a_min // 8) * 8, 0, ap - cfg.BA)
    bg0 = jnp.clip(b_min // 128, 0, bgp - cfg.nstripe)
    origins = jnp.stack([a0, bg0], axis=-1).reshape(-1).astype(jnp.int32)
    return seg, sp, msgs, origins, (ap, bgp)


def _grid_to_perm(grid_flat, cfg, pads):
    ap, bgp = pads
    g = grid_flat.reshape(cfg.grid_shape).transpose(cfg.perm)
    if cfg.flip:
        g = jnp.flip(g, axis=0)
    g = jnp.pad(
        g, ((0, 0), (0, ap - cfg.A), (0, bgp * 128 - cfg.B))
    )
    return g.reshape(cfg.S, ap, bgp, 128).transpose(0, 2, 1, 3)


def _grid_from_perm(grid_perm, cfg, pads):
    ap, bgp = pads
    g = grid_perm.transpose(0, 2, 1, 3).reshape(cfg.S, ap, bgp * 128)
    g = g[:, : cfg.A, : cfg.B]
    if cfg.flip:
        g = jnp.flip(g, axis=0)
    inv = [cfg.perm.index(a) for a in range(3)]
    return g.transpose(inv).reshape(-1)


def grid_pads(cfg):
    """Padded lateral extents of the PERM-layout grid (see _prep_inputs)."""
    ap = -(-(cfg.A + cfg.BA) // 8) * 8
    bgp = cfg.Bg + cfg.nstripe
    return ap, bgp


def bp_beam_message_step_perm(
    ray_start, ray_end, valid, S_planes, messages_slot, grid_perm,
    scatter_perm, camera_center, bbox, cfg, first_iteration=False,
    interpret=False, native_msgs=False,
):
    """Like :func:`bp_beam_message_step` but the grids stay in the
    kernel's PERM layout: ``grid_perm`` is the read-only accumulator
    (from :func:`grid_to_perm`) and ``scatter_perm`` is accumulated IN
    PLACE via the kernel's aliased RMW scatter — callers scanning over
    many batches convert layouts once per image instead of per batch.

    ``native_msgs``: messages arrive AND return in the kernel's
    (nb, SLOTS, RAYS) layout — scanning callers keep the whole store in
    this layout, eliminating the two big per-batch transposes (the
    dominant prep-glue cost, ~100 MB each way per 65k-ray batch).

    Returns (new_messages (N, SLOTS) or native, scatter_perm, overflow).
    """
    seg, sp, msgs, origins, _ = _prep_inputs(
        ray_start, ray_end, valid, S_planes, messages_slot,
        camera_center, bbox, cfg, native_msgs=native_msgs,
    )
    out_msgs, grid_out, misc = bp_beam_call(
        seg, sp, msgs, grid_perm, scatter_perm, origins, cfg,
        first_iteration=first_iteration, depth_mode=False,
        interpret=interpret,
    )
    if native_msgs:
        new_msgs = out_msgs
    else:
        n = ray_start.shape[0]
        new_msgs = out_msgs.transpose(0, 2, 1).reshape(n, cfg.slots)
    overflow = misc[:, 0].sum()
    return new_msgs, grid_out, overflow


def grid_to_perm(grid_flat, cfg):
    return _grid_to_perm(grid_flat, cfg, grid_pads(cfg))


def grid_from_perm(grid_perm, cfg):
    return _grid_from_perm(grid_perm, cfg, grid_pads(cfg))


def bp_beam_message_step(
    ray_start, ray_end, valid, S_planes, messages_slot, grid_acc_flat,
    camera_center, bbox, cfg, first_iteration=False, interpret=False,
):
    """One fused BP message sweep (traversal + hat mapping + gather +
    recurrences + scatter) for tile-ordered rays.

    Returns (new_messages_slot (N, SLOTS), scatter (G,), overflow scalar).
    """
    seg, sp, msgs, origins, pads = _prep_inputs(
        ray_start, ray_end, valid, S_planes, messages_slot,
        camera_center, bbox, cfg,
    )
    grid_perm = _grid_to_perm(grid_acc_flat, cfg, pads)
    zeros_grid = jnp.zeros_like(grid_perm)
    out_msgs, grid_out, misc = bp_beam_call(
        seg, sp, msgs, grid_perm, zeros_grid, origins, cfg,
        first_iteration=first_iteration, depth_mode=False,
        interpret=interpret,
    )
    n = ray_start.shape[0]
    new_msgs = out_msgs.transpose(0, 2, 1).reshape(n, cfg.slots)
    scatter = _grid_from_perm(grid_out, cfg, pads)
    overflow = misc[:, 0].sum()
    return new_msgs, scatter, overflow


def bp_beam_depth_step_perm(
    ray_start, ray_end, valid, S_planes, messages_slot, grid_perm,
    scratch_perm, camera_center, bbox, cfg, interpret=False,
    native_msgs=False,
):
    """PERM-layout final depth sweep (see bp_beam_message_step_perm).
    ``scratch_perm`` is a dead aliased buffer threaded through scans
    (depth mode never writes the scatter output).

    Returns (depth (N,), scratch_perm, overflow)."""
    seg, sp, msgs, origins, _ = _prep_inputs(
        ray_start, ray_end, valid, S_planes, messages_slot,
        camera_center, bbox, cfg, native_msgs=native_msgs,
    )
    _, scratch_out, misc = bp_beam_call(
        seg, sp, msgs, grid_perm, scratch_perm, origins, cfg,
        first_iteration=False, depth_mode=True, interpret=interpret,
    )
    depth = misc[:, 1].reshape(-1)
    overflow = misc[:, 0].sum()
    return depth, scratch_out, overflow


def bp_beam_depth_step(
    ray_start, ray_end, valid, S_planes, messages_slot, grid_acc_flat,
    camera_center, bbox, cfg, interpret=False,
):
    """Final posterior-depth sweep. Returns (depth (N,), overflow)."""
    seg, sp, msgs, origins, pads = _prep_inputs(
        ray_start, ray_end, valid, S_planes, messages_slot,
        camera_center, bbox, cfg,
    )
    grid_perm = _grid_to_perm(grid_acc_flat, cfg, pads)
    zeros_grid = jnp.zeros_like(grid_perm)
    _, _, misc = bp_beam_call(
        seg, sp, msgs, grid_perm, zeros_grid, origins, cfg,
        first_iteration=False, depth_mode=True, interpret=interpret,
    )
    depth = misc[:, 1].reshape(-1)
    overflow = misc[:, 0].sum()
    return depth, overflow
