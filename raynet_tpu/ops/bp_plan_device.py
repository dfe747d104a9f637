"""Device-side BP beam planner aggregates — the TPU-native bp_plan_agg.

The cold-scene plan phase is dominated by the per-ray planner march:
segments + exact-K + group lateral spans over every ray of every view
(~0.5 s/view at 720p on the single-core planning host, linear in rays —
~47 s extrapolated for a 49-view DTU scene at 1600x1200, VERDICT r4 #3).
The march is embarrassingly parallel and pure arithmetic, so it
vectorizes onto the device: per-ray closed forms (no walk) evaluated as
(N,)-shaped XLA ops, block-reduced on device, with only the per-block
aggregates (k_blk + 4 x (nb, ngrp) floors, ~2 MB/view) downloaded.

Numerics: f32 on device vs the native/n's f64. The t-parameter formulas
here have ~1e-6 relative jitter against f64 while the planner's
boundary slack is 1e-4 (native raynet_host.cpp uses the same slack for
the f64-planner-vs-f32-runtime gap), and the lateral floors carry the
downstream +-2-cell snap budget — the same margins that already absorb
runtime-f32 drift absorb planner-f32 drift. Parity is tested
block-exactly against the native/numpy planner on synthetic rigs
(tests/test_bp_beam.py).

Geometry precision rule (CLAUDE.md): the backprojection runs as scalar
f32 multiply-add chains (ops/geometry.rays_from_pixel_idxs), never an
MXU contraction — default-precision f32 matmuls truncate operands to
bf16 on TPU.

Mirrors: native/raynet_host.cpp::plan_accum_ray (the arithmetic is the
same closed forms, reduction order aside); reference analog is the
planning half of ray_tracing.pyx:64-199.
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp

from .geometry import rays_entry_exit_bbox, rays_from_pixel_idxs


@functools.partial(jax.jit, static_argnames=("height", "fine"))
def _segments_stats(ray_idxs, P_pinv, camera_center, bbox, *, height,
                    fine):
    """Program A: segments + dominant-axis statistics + per-fine-block
    miss-fill sources. Segment endpoints STAY ON DEVICE (s, e); the
    scalar statistics and the (N,) fill map are what the host reads."""
    dirs = rays_from_pixel_idxs(ray_idxs, P_pinv, camera_center, height)
    s, e = rays_entry_exit_bbox(
        dirs, camera_center, bbox[:3], bbox[3:]
    )
    ray = e - s
    hit = jnp.abs(ray).sum(axis=1) > 0
    n_hit = hit.sum()
    # sums (not means): the host divides by bins and n_hit; argmax is
    # invariant to the common factor
    abs_sums = jnp.where(hit[:, None], jnp.abs(ray), 0.0).sum(axis=0)
    n_pos = jnp.where(hit[:, None], ray > 0, False).sum(axis=0)
    n_neg = jnp.where(hit[:, None], ray < 0, False).sum(axis=0)
    # per-fine-block first-hit fill (global first hit as the fallback),
    # mirroring _dom_sign_and_fill_numpy
    nb = ray_idxs.shape[0] // fine
    hb = hit.reshape(nb, fine)
    first = jnp.argmax(hb, axis=1).astype(jnp.int32)
    has = hb.any(axis=1)
    gsrc = jnp.argmax(hit).astype(jnp.int32)
    src = jnp.where(
        has, jnp.arange(nb, dtype=jnp.int32) * fine + first, gsrc
    )
    # HIT rays keep themselves; only misses borrow the block's first hit
    fill = jnp.where(
        hit, jnp.arange(hit.shape[0], dtype=jnp.int32),
        jnp.repeat(src, fine),
    )
    return s, e, fill, abs_sums, n_hit, n_pos, n_neg


@functools.partial(
    jax.jit,
    static_argnames=("perm", "flip", "S", "ngrp", "fine", "slack", "eps"),
)
def _agg_device(s, e, fill, bmin, pb, ext, *, perm, flip, S, ngrp, fine,
                slack=1e-4, eps=1e-2):
    """Program B: per-fine-block (k, group lateral lo/hi floors).

    Closed forms (no cell walk): slice j's t-interval is
    [tmax0+(j-1)*td0, tmax0+j*td0] clamped to [0, 1], and the lateral
    crossings below a time T follow floor((T - tmax_a)/td_a) + 1 — the
    same counting the native planner walks serially per ray."""
    # miss rays borrow a hit ray from their own block (zero-length
    # segments would poison the sign/K statistics — see
    # _dom_sign_and_fill); at runtime they are dead lanes
    s = s[fill]
    e = e[fill]
    sp = [s[:, perm[a]] - bmin[perm[a]] for a in range(3)]
    ep = [e[:, perm[a]] - bmin[perm[a]] for a in range(3)]
    if flip:
        sp[0] = ext - sp[0]
        ep[0] = ext - ep[0]

    inf = jnp.float32(jnp.inf)
    tmax, tdelta = [], []
    for a in range(3):
        ray = ep[a] - sp[a]
        stepf = jnp.where(ray >= 0, 1.0, -1.0)
        startn = sp[a] + stepf * (pb[a] * eps)
        cur = jnp.floor(startn / pb[a])
        cc = cur * pb[a]
        boundary = jnp.where(
            (stepf < 0) & (cc < startn), cc, cc + stepf * pb[a]
        )
        nz = ray != 0
        tmax.append(jnp.where(nz, (boundary - startn) / ray, inf))
        tdelta.append(jnp.where(nz, stepf * pb[a] / ray, inf))

    # The slice loop has NO real carried dependency: the loop formulation
    # carried t_prev, but t_prev(j) is itself closed-form —
    # t_prev(0) = 0 and t_prev(j) = clamp(tmax0 + (j-1)*td0) — so j
    # vectorizes. Chunking j (J_CHUNK slices per step, (N, JC) ops)
    # re-reads the six per-ray inputs S/JC times instead of S times;
    # measured 90 -> ~15 ms per 1.92M-ray view on v5e. Arithmetic per
    # (ray, j) is IDENTICAL to the sequential loop (same expressions,
    # same clamps), keeping block-exact parity with the native planner.
    def k_chunk(j0, kmax, jc):
        j = j0 + jnp.arange(jc, dtype=jnp.float32)[None, :]
        t_next = tmax[0][:, None] + j * tdelta[0][:, None]
        # NaN/inf compare false -> clamp to 1 (native: !(t < 1) -> 1)
        t_next = jnp.where(t_next < 1.0, t_next, 1.0)
        t_prevu = tmax[0][:, None] + (j - 1.0) * tdelta[0][:, None]
        t_prev = jnp.where(t_prevu < 1.0, t_prevu, 1.0)
        t_prev = jnp.where(j == 0.0, 0.0, t_prev)
        tlo = t_prev - slack
        thi = t_next + slack
        em = 1.0
        for a in (1, 2):
            x_hi = (thi - tmax[a][:, None]) / tdelta[a][:, None]
            n_hi = jnp.maximum(
                jnp.where(jnp.isfinite(x_hi), jnp.floor(x_hi) + 1.0, 0.0),
                0.0,
            )
            x_lo = (tlo - tmax[a][:, None]) / tdelta[a][:, None]
            n_lo = jnp.maximum(
                jnp.where(jnp.isfinite(x_lo), jnp.floor(x_lo) + 1.0, 0.0),
                0.0,
            )
            em = em + n_hi - n_lo
        em = jnp.where(jnp.isfinite(em), em, 1.0)
        return jnp.maximum(kmax, em.max(axis=1))

    JC = 8
    kmax = jnp.ones_like(sp[0])
    for j0 in range(0, S, JC):
        kmax = k_chunk(jnp.float32(j0), kmax, min(JC, S - j0))
    nb = sp[0].shape[0] // fine
    k_blk = kmax.reshape(nb, fine).max(axis=1).astype(jnp.int32)

    # group-boundary lateral positions (clamped dominant lerp), reduced
    # to per-block floors group by group — no (N, ngrp) temporaries
    d0 = sp[0] / pb[0]
    d1 = ep[0] / pb[0]
    inv = 1.0 / jnp.maximum(d1 - d0, 1e-9)
    a0 = sp[1] / pb[1]
    da = ep[1] / pb[1] - a0
    b0 = sp[2] / pb[2]
    db = ep[2] / pb[2] - b0
    lo_a, hi_a, lo_b, hi_b = [], [], [], []
    pa_prev = pb_prev = None
    for g in range(ngrp + 1):
        t = jnp.clip((g * 8.0 - d0) * inv, 0.0, 1.0)
        pa = a0 + t * da
        pbv = b0 + t * db
        if g > 0:
            la = jnp.floor(jnp.minimum(pa_prev, pa)).reshape(nb, fine)
            ha = jnp.floor(jnp.maximum(pa_prev, pa)).reshape(nb, fine)
            lb = jnp.floor(jnp.minimum(pb_prev, pbv)).reshape(nb, fine)
            hb = jnp.floor(jnp.maximum(pb_prev, pbv)).reshape(nb, fine)
            lo_a.append(la.min(axis=1))
            hi_a.append(ha.max(axis=1))
            lo_b.append(lb.min(axis=1))
            hi_b.append(hb.max(axis=1))
        pa_prev, pb_prev = pa, pbv
    # ONE packed (nb, 1 + 4*ngrp) f32 output: each np.asarray download
    # pays a ~40 ms tunnel round trip, so five separate aggregate
    # arrays cost more in latency than the whole program's compute
    # (measured 0.14-0.16 s vs 0.09 s per view). k fits f32 exactly
    # (small counts); the floors are f32 already.
    return jnp.concatenate(
        [
            k_blk.astype(jnp.float32)[:, None],
            jnp.stack(lo_a, axis=1),
            jnp.stack(hi_a, axis=1),
            jnp.stack(lo_b, axis=1),
            jnp.stack(hi_b, axis=1),
        ],
        axis=1,
    )


# per-(image-shape) committed tile-order index cache: unfiltered views
# all share one padded tile-sorted ray list — upload it once, not per
# view (~8 MB/view at DTU resolution through the tunnel)
_IDX_CACHE = {}


def unfiltered_tile_idxs(height, width, pad_to):
    """THE padded tile-order ray list (host numpy) every unfiltered plan
    path shares. Single construction point: _plan_prologue_multi, the
    plan prefetcher, and the band planner's chunked variant all derive
    from this — the device-side _IDX_CACHE slots keyed on it assume the
    producers agree byte-for-byte, so don't re-implement it."""
    from .pallas.planesweep import tile_ids

    n = height * width
    idxs = np.arange(n, dtype=np.int32)
    perm_t = np.argsort(
        tile_ids(idxs, height), kind="stable"
    ).astype(np.int32)
    pad = (-n) % pad_to
    if pad:
        perm_t = np.concatenate([perm_t, np.repeat(perm_t[-1:], pad)])
    return perm_t

# One-shot prefetched plan states (ops.plan_prefetch fills it before the
# orchestrator's per-view plan loop; device_plan_state pops): the serial
# per-view plan chain (program A -> scalar sync -> program B -> download)
# stalls the host ~2x the device time per view through the tunnel, so
# the prefetcher enqueues every view's programs group-wise and starts
# the downloads async — by the time the plan loop asks, the answers are
# already on the host.
_STATE_PREFETCH = {}


def _plan_state_key(cache_key, P_pinv, camera_center, bbox, grid_shape,
                    height, fine):
    """Exact-input key for a prefetched plan state. ``cache_key`` is the
    shared-idx identity (unfiltered tile order); geometry is keyed by
    f32 bytes — the precision the device programs consume."""
    return (
        cache_key,
        np.asarray(P_pinv, np.float32).tobytes(),
        np.asarray(camera_center, np.float32).tobytes(),
        np.asarray(bbox, np.float32).tobytes(),
        tuple(int(g) for g in grid_shape),
        int(height), int(fine),
    )


def _decide_dom_flip(abs_sums, n_hit, n_pos, n_neg, bins):
    """Host half of program A: dominant axis + sign decision (shared by
    device_plan_state and the prefetcher)."""
    if n_hit == 0:
        return None, None, "empty-rays"
    dom = int(np.argmax(abs_sums / bins))
    if n_pos[dom] == n_hit:
        return dom, False, "ok"
    if n_neg[dom] == n_hit:
        return dom, True, "ok"
    return None, None, "mixed-dominant-sign"


def _use_device_planner():
    """Device planner gate: on by default on an accelerator backend, off
    on CPU (tests exercise it explicitly; the native/numpy planners stay
    the host fallback). RAYNET_DEVICE_PLANNER=0/1 overrides for A/Bs."""
    import os

    v = os.environ.get("RAYNET_DEVICE_PLANNER")
    if v is not None:
        return v not in ("0", "off", "false")
    try:
        return jax.default_backend() != "cpu"
    except Exception:
        return False


# the band-spec span program shares the same gate (one knob: the cold
# plan phase is host-bound or it is not)
_use_device_spans = _use_device_planner


def device_plan_state(idxs, P_pinv, camera_center, bbox, grid_shape,
                      height, fine, cache_key=None):
    """Run program A + the host dom/flip decision. Returns
    (state, "ok") where state carries the device s/e/fill plus
    (bins, perm, flip, ...), or (None, reason) mirroring
    _dom_sign_and_fill's rejections."""
    bbox = np.asarray(bbox, np.float64).reshape(6)
    grid_shape = tuple(int(g) for g in grid_shape)
    if cache_key is not None and _STATE_PREFETCH:
        pk = _plan_state_key(
            cache_key, P_pinv, camera_center, bbox, grid_shape, height,
            fine,
        )
        hit = _STATE_PREFETCH.pop(pk, None)
        if hit is not None:
            return hit
    if cache_key is not None and cache_key in _IDX_CACHE:
        idxs_dev = _IDX_CACHE[cache_key]
    else:
        idxs_dev = jax.device_put(np.ascontiguousarray(idxs, np.int32))
        if cache_key is not None:
            _IDX_CACHE[cache_key] = idxs_dev
    s, e, fill, abs_sums, n_hit, n_pos, n_neg = _segments_stats(
        idxs_dev,
        jnp.asarray(P_pinv, jnp.float32),
        jnp.asarray(camera_center, jnp.float32),
        jnp.asarray(bbox, jnp.float32),
        height=int(height), fine=int(fine),
    )
    # ONE host sync for all the scalars
    stats = np.asarray(
        jnp.concatenate([
            abs_sums,
            jnp.stack([n_hit.astype(jnp.float32)]),
            n_pos.astype(jnp.float32),
            n_neg.astype(jnp.float32),
        ])
    )
    abs_sums, n_hit = stats[:3], stats[3]
    n_pos, n_neg = stats[4:7], stats[7:10]
    bins = (bbox[3:] - bbox[:3]) / np.asarray(grid_shape, np.float64)
    dom, flip, reason = _decide_dom_flip(
        abs_sums, n_hit, n_pos, n_neg, bins
    )
    if flip is None:
        return None, reason
    return dict(
        s=s, e=e, fill=fill, bins=bins, bbox=bbox, grid_shape=grid_shape,
        dom=dom, flip=flip, n=len(idxs),
    ), "ok"


def device_plan_agg(state, fine):
    """Run program B on a device_plan_state: returns numpy
    (k_blk, lo_a, hi_a, lo_b, hi_b) with the native bp_plan_agg's
    contract (fine-block aggregates, f64 floors)."""
    dom, flip = state["dom"], state["flip"]
    others = [a for a in range(3) if a != dom]
    perm = (dom, others[0], others[1])
    grid_shape, bins, bbox = (
        state["grid_shape"], state["bins"], state["bbox"],
    )
    S = grid_shape[dom]
    pb = np.asarray([bins[a] for a in perm], np.float64)
    ngrp = int(S) // 8
    pre = state.get("packed")
    if pre is not None:
        # prefetched: program B already ran and its (async) download was
        # started while other views' programs occupied the device
        packed = np.asarray(pre)
    else:
        packed = np.asarray(
            _agg_device(
                state["s"], state["e"], state["fill"],
                jnp.asarray(bbox[:3], jnp.float32),
                jnp.asarray(pb, jnp.float32),
                jnp.float32(S * pb[0]),
                perm=perm, flip=bool(flip), S=int(S), ngrp=ngrp,
                fine=int(fine),
            )
        )
    k_blk = packed[:, 0]
    lo_a, hi_a, lo_b, hi_b = (
        packed[:, 1 + i * ngrp: 1 + (i + 1) * ngrp] for i in range(4)
    )
    return (
        k_blk.astype(np.int32),
        lo_a.astype(np.float64), hi_a.astype(np.float64),
        lo_b.astype(np.float64), hi_b.astype(np.float64),
    )
